"""Pure-numpy/python FLAC codec (decode + fixture encoder).

FLAC (the free lossless audio codec, format spec at
xiph.org/flac/format.html — RFC 9639) is the dominant compressed-audio
container in speech/LLM training corpora (LibriSpeech, MLS, people's
speech dumps all ship FLAC), and unlike MPEG Layer III / Vorbis it is
fully ALGORITHMIC: fixed linear predictors with closed-form integer
coefficients, partitioned Rice entropy coding, and CRC-8/16 with known
polynomials — no spec table data to transcribe, so a from-scratch
implementation can be exact. Lossless means the oracle contract is the
strongest possible: decode(encode(x)) == x bit-for-bit.

Decoder scope: STREAMINFO + any metadata blocks, frames with fixed or
variable blocking, UTF-8-coded frame/sample numbers, CRC-8 header and
CRC-16 frame verification (corrupt streams fail loudly), subframe types
CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32), wasted bits, partitioned
Rice residuals (4- and 5-bit parameter variants + escape partitions),
and the four channel assignments (independent, left/side, right/side,
mid/side). Interop caveat: validated structurally (spec layout + CRCs +
lossless roundtrip, tests/test_audio.py); this sandbox has no external
FLAC files or reference binaries to cross-check against.

Encoder scope (fixture generation): 16-bit mono/stereo independent
channels, per-subframe best fixed predictor (order 0-4 by absolute
residual sum) with a single Rice partition, CONSTANT short-circuit,
VERBATIM fallback.

Reference parity anchor: the reference connector has no media path at
all (SURVEY.md §2.1 — 1.3k-line Delta→Pulsar connector); this extends
the multimodal decode matrix the brief requires.
"""

from __future__ import annotations

import numpy as np

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# ---------------------------------------------------------------------------
# CRCs (generated from the polynomials — no tables to transcribe)


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = np.zeros(256, np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        table[b] = r & mask
    return table


_CRC8_TABLE = _crc_table(0x07, 8)  # x^8 + x^2 + x + 1
_CRC16_TABLE = _crc_table(0x8005, 16)  # x^16 + x^15 + x^2 + 1


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC8_TABLE[r ^ b])
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC16_TABLE[((r >> 8) ^ b) & 0xFF]) ^ ((r << 8) & 0xFFFF)
    return r


# ---------------------------------------------------------------------------
# Bit I/O (MSB-first, as FLAC reads)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        out = 0
        while bits > 0:
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(bits, avail)
            cur = self.data[self.byte]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            bits -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return out

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


# ---------------------------------------------------------------------------
# UTF-8-style coded numbers (FLAC frame/sample numbers, up to 36 bits)


def _utf8_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    for nbytes, first_mask in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8), (6, 0xFC), (7, 0xFE)):
        if n < (1 << (6 * (nbytes - 1) + (7 - nbytes))) or nbytes == 7:
            out = bytearray(nbytes)
            for i in range(nbytes - 1, 0, -1):
                out[i] = 0x80 | (n & 0x3F)
                n >>= 6
            out[0] = first_mask | n
            return bytes(out)
    raise ValueError("unencodable number")


def _utf8_decode(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    for i in range(7):
        if not (first >> (7 - i)) & 1:
            nbytes = i
            break
    if nbytes < 2:
        raise ValueError(f"invalid FLAC utf8 lead byte {first:#x}")
    n = first & ((1 << (7 - nbytes)) - 1)
    for _ in range(nbytes - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid FLAC utf8 continuation")
        n = (n << 6) | (c & 0x3F)
    return n


# ---------------------------------------------------------------------------
# Rice coding


def _rice_write(w: _BitWriter, residuals: np.ndarray, param: int) -> None:
    for res in residuals:
        res = int(res)
        u = (res << 1) if res >= 0 else ((-res << 1) - 1)  # zigzag
        w.write_unary(u >> param)
        if param:
            w.write(u & ((1 << param) - 1), param)


def _rice_read(r: _BitReader, n: int, param: int) -> list[int]:
    out = []
    for _ in range(n):
        u = (r.read_unary() << param) | (r.read(param) if param else 0)
        out.append((u >> 1) ^ -(u & 1))  # unzigzag
    return out


def _best_rice_param(residuals: np.ndarray) -> int:
    if not len(residuals):
        return 0
    mean = float(np.abs(residuals.astype(np.float64)).mean())
    p = 0
    while (1 << (p + 1)) < mean * 2 and p < 14:
        p += 1
    return p


# ---------------------------------------------------------------------------
# Encoder (fixture generation)


def _encode_subframe(w: _BitWriter, x: np.ndarray, bps: int) -> None:
    x = x.astype(np.int64)
    if np.all(x == x[0]):
        w.write(0, 1)
        w.write(0b000000, 6)  # CONSTANT
        w.write(0, 1)
        w.write(int(x[0]) & ((1 << bps) - 1), bps)
        return
    # best fixed order by absolute residual sum
    best_order, best_res, best_cost = 0, x, float(np.abs(x).sum())
    res = x
    for order in range(1, 5):
        if len(x) <= order:
            break
        res = np.diff(res)
        cost = float(np.abs(res).sum())
        if cost < best_cost:
            best_order, best_cost = order, cost
    res = x
    for _ in range(best_order):
        res = np.diff(res)
    residuals = res
    param = _best_rice_param(residuals)
    rice_bits = best_order * bps + 2 + 4 + 4 + sum(
        (int(abs(v)) >> max(param - 1, 0)) + 1 + param for v in residuals
    )
    if param > 14 or rice_bits >= len(x) * bps:
        w.write(0, 1)
        w.write(0b000001, 6)  # VERBATIM
        w.write(0, 1)
        for v in x:
            w.write(int(v) & ((1 << bps) - 1), bps)
        return
    w.write(0, 1)
    w.write(0b001000 | best_order, 6)  # FIXED
    w.write(0, 1)  # no wasted bits
    for v in x[:best_order]:
        w.write(int(v) & ((1 << bps) - 1), bps)
    w.write(0b00, 2)  # rice, 4-bit params
    w.write(0, 4)  # partition order 0
    w.write(param, 4)
    _rice_write(w, residuals, param)


def encode_flac(
    samples: np.ndarray, sample_rate: int = 8000, block_size: int = 4096
) -> bytes:
    """Encode int16 samples (shape (n,) mono or (n, ch)) to a FLAC
    stream: STREAMINFO + fixed-blocking frames, independent channels,
    best fixed predictor per subframe, single Rice partition."""
    x = np.asarray(samples, np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    bps = 16
    out = bytearray(b"fLaC")
    info = _BitWriter()
    info.write(1, 1)  # last metadata block
    info.write(0, 7)  # STREAMINFO
    info.write(34, 24)
    info.write(block_size, 16)
    info.write(block_size, 16)
    info.write(0, 24)  # min frame size unknown
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(ch - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    for _ in range(16):
        info.write(0, 8)  # MD5 unset
    out += info.bytes()
    for fi, start in enumerate(range(0, n, block_size)):
        blk = x[start : start + block_size]
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocking
        w.write(0b0111, 4)  # block size: 16-bit value-1 follows
        w.write(0b0000, 4)  # sample rate: from STREAMINFO
        w.write(ch - 1, 4)  # independent channels
        w.write(0b100, 3)  # 16 bps
        w.write(0, 1)  # reserved
        for b in _utf8_encode(fi):
            w.write(b, 8)
        w.write(len(blk) - 1, 16)
        assert w.nbits == 0  # header fields are byte-aligned here
        w.write(crc8(bytes(w.buf)), 8)
        for c in range(ch):
            _encode_subframe(w, blk[:, c], bps)
        w.align()
        w.write(crc16(bytes(w.buf)), 16)
        out += w.bytes()
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder


def _decode_subframe(r: _BitReader, n: int, bps: int) -> np.ndarray:
    if r.read(1) != 0:
        raise ValueError("FLAC subframe: reserved pad bit set")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bps -= wasted
    if t == 0b000000:  # CONSTANT
        x = np.full(n, r.read_signed(bps), np.int64)
    elif t == 0b000001:  # VERBATIM
        x = np.array([r.read_signed(bps) for _ in range(n)], np.int64)
    elif 0b001000 <= t <= 0b001100:  # FIXED order 0-4
        order = t & 0b111
        warm = [r.read_signed(bps) for _ in range(order)]
        resid = _read_residuals(r, n, order)
        x = _predict_fixed(warm, resid, order)
    elif t & 0b100000:  # LPC
        order = (t & 0b011111) + 1
        warm = [r.read_signed(bps) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC LPC: invalid coefficient precision")
        shift = r.read_signed(5)
        coefs = [r.read_signed(prec) for _ in range(order)]
        resid = _read_residuals(r, n, order)
        x = np.empty(n, np.int64)
        x[:order] = warm
        for i in range(order, n):
            pred = sum(c * int(x[i - 1 - j]) for j, c in enumerate(coefs)) >> shift
            x[i] = pred + resid[i - order]
    else:
        raise ValueError(f"FLAC subframe: reserved type {t:#08b}")
    return x << wasted if wasted else x


def _predict_fixed(warm: list[int], resid: list[int], order: int) -> np.ndarray:
    n = order + len(resid)
    x = np.empty(n, np.int64)
    x[:order] = warm
    coefs = _FIXED_COEFFS[order]
    for i in range(order, n):
        pred = sum(c * int(x[i - 1 - j]) for j, c in enumerate(coefs))
        x[i] = pred + resid[i - order]
    return x


def _read_residuals(r: _BitReader, block_size: int, pred_order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"FLAC residual: reserved coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    n_part = 1 << porder
    if block_size % n_part or block_size >> porder <= pred_order:
        raise ValueError("FLAC residual: invalid partition order")
    out: list[int] = []
    for p in range(n_part):
        cnt = (block_size >> porder) - (pred_order if p == 0 else 0)
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            out.extend(r.read_signed(raw) if raw else 0 for _ in range(cnt))
        else:
            out.extend(_rice_read(r, cnt, param))
    return out


_BLOCK_SIZES = {0b0001: 192}
_BLOCK_SIZES.update({c: 576 << (c - 2) for c in range(0b0010, 0b0110)})
_BLOCK_SIZES.update({c: 256 << (c - 8) for c in range(0b1000, 0b10000)})
_SAMPLE_RATES = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}
_SAMPLE_SIZES = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24}


def decode_flac(payload: bytes) -> tuple[int, int, np.ndarray]:
    """FLAC stream → (sample_rate, n_channels, int samples[frame, ch]).
    Verifies header CRC-8 and frame CRC-16 — corrupt streams fail
    loudly, never return wrong samples."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    while True:
        hdr = payload[pos : pos + 4]
        if len(hdr) < 4:
            raise ValueError("FLAC metadata truncated")
        last, btype = hdr[0] >> 7, hdr[0] & 0x7F
        length = int.from_bytes(hdr[1:4], "big")
        if btype == 0:
            b = _BitReader(payload, pos + 4)
            b.read(16), b.read(16), b.read(24), b.read(24)
            rate = b.read(20)
            ch = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
            info = (rate, ch, bps, total)
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, ch, bps, total = info
    chans: list[list[int]] = [[] for _ in range(ch)]
    got = 0
    while pos < len(payload) and (total == 0 or got < total):
        frame_start = pos
        r = _BitReader(payload, pos)
        if r.read(14) != 0b11111111111110:
            raise ValueError("FLAC frame: bad sync code")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)  # reserved
        _utf8_decode(r)  # frame/sample number
        if bs_code == 0b0110:
            blocksize = r.read(8) + 1
        elif bs_code == 0b0111:
            blocksize = r.read(16) + 1
        elif bs_code in _BLOCK_SIZES:
            blocksize = _BLOCK_SIZES[bs_code]
        else:
            raise ValueError(f"FLAC frame: reserved block size code {bs_code:#06b}")
        if sr_code == 0b1100:
            r.read(8)
        elif sr_code in (0b1101, 0b1110):
            r.read(16)
        elif sr_code != 0 and sr_code not in _SAMPLE_RATES:
            raise ValueError(f"FLAC frame: invalid sample rate code {sr_code:#06b}")
        assert r.bit == 0
        if crc8(payload[frame_start : r.byte]) != r.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")
        fbps = bps if ss_code == 0 else _SAMPLE_SIZES[ss_code]
        if ch_code <= 0b0111:
            n_sub, mode = ch_code + 1, "indep"
        elif ch_code == 0b1000:
            n_sub, mode = 2, "left_side"
        elif ch_code == 0b1001:
            n_sub, mode = 2, "right_side"
        elif ch_code == 0b1010:
            n_sub, mode = 2, "mid_side"
        else:
            raise ValueError(f"FLAC frame: reserved channel code {ch_code:#06b}")
        subs = []
        for c in range(n_sub):
            sbps = fbps
            # the difference channel carries one extra bit
            if (mode == "left_side" and c == 1) or (mode == "right_side" and c == 0) \
                    or (mode == "mid_side" and c == 1):
                sbps += 1
            subs.append(_decode_subframe(r, blocksize, sbps))
        r.align()
        crc_calc = crc16(payload[frame_start : r.byte])
        if crc_calc != r.read(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = r.byte
        if mode == "indep":
            out = subs
        elif mode == "left_side":
            left, side = subs
            out = [left, left - side]
        elif mode == "right_side":
            side, right = subs
            out = [side + right, right]
        else:  # mid_side
            mid, side = subs
            # mid dropped side's low bit at encode: restore it, then
            # left = (2*mid|parity + side)/2, right = left - side
            m2 = (mid << 1) | (side & 1)
            out = [(m2 + side) >> 1, (m2 - side) >> 1]
        n_here = min(blocksize, total - got) if total else blocksize
        for c in range(ch):
            chans[c].extend(int(v) for v in out[c][:n_here])
        got += n_here
    return rate, ch, np.array(chans, np.int64).T
