"""Pure-numpy telephony/legacy audio codecs: G.711 (µ-law, A-law) and
IMA ADPCM — the compressed WAV variants a real document corpus actually
contains (voicemail, call-center, game assets), implemented from the
public specs (ITU-T G.711; IMA "DVI4" ADPCM as in RIFF fmt 0x11) so the
audio pipeline stops short only at codecs that genuinely need external
decoders (MP3/AAC).

Decoders are closed-form (G.711) or the spec's integer recurrence
(ADPCM, vectorized ACROSS blocks — every block restarts its predictor
from its own header, so blocks decode in parallel with one numpy loop
over the within-block sample index). Encoders exist so tests and the
registered query can plant fixtures without external tools: G.711
encode is exact nearest-codeword quantization against the decode table
(optimal by construction — round trips of codeword-valued samples are
bit-exact, which is what makes a hash-exact SQL oracle possible);
the ADPCM encoder emits the standard greedy nibble search.

Scale note: like jpeg.py/png.py this is per-payload kernel code inside
Arrow-batched ``mapInPandas`` stages (operators/multimodal.py).
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# G.711 µ-law


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 µ-law codewords → int16 linear PCM (G.711 closed form:
    complement, 3-bit exponent, 4-bit mantissa, bias 0x84)."""
    u = (~np.asarray(codes, dtype=np.uint8)).astype(np.int32) & 0xFF
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 A-law codewords → int16 linear PCM (G.711: invert even
    bits with 0x55, segment expand)."""
    a = (np.asarray(codes, dtype=np.uint8) ^ 0x55).astype(np.int32)
    exp = (a >> 4) & 7
    mag = ((a & 0x0F) << 4) + 8
    mag = np.where(exp >= 1, (mag + 0x100) << np.maximum(exp - 1, 0), mag)
    return np.where(a & 0x80, mag, -mag).astype(np.int16)


def _nearest_codeword_encoder(decode_fn):
    """Exact nearest-codeword G.711 encoder built from the decode
    table: sort the 256 decoded values once, binary-search each sample,
    pick the closer neighbor. Optimal quantization by construction —
    no segment-arithmetic edge cases to get subtly wrong."""
    table = decode_fn(np.arange(256, dtype=np.uint8)).astype(np.int32)
    order = np.argsort(table, kind="stable")
    svals = table[order]

    def encode(samples: np.ndarray) -> np.ndarray:
        x = np.asarray(samples, dtype=np.int32)
        i = np.searchsorted(svals, x)
        lo = np.clip(i - 1, 0, 255)
        hi = np.clip(i, 0, 255)
        pick = np.where(np.abs(svals[hi] - x) < np.abs(x - svals[lo]), hi, lo)
        return order[pick].astype(np.uint8)

    return encode


mulaw_encode = _nearest_codeword_encoder(mulaw_decode)
alaw_encode = _nearest_codeword_encoder(alaw_decode)


# --------------------------------------------------------------------------
# IMA ADPCM (RIFF fmt 0x11, mono)

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)

_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2, dtype=np.int32)


def _ima_header(b: np.ndarray, off: int) -> tuple[np.ndarray, np.ndarray]:
    pred = b[:, off].astype(np.int32) | (b[:, off + 1].astype(np.int32) << 8)
    pred = np.where(pred >= 0x8000, pred - 0x10000, pred)
    idx = np.clip(b[:, off + 2].astype(np.int32), 0, 88)
    return pred, idx


def _ima_decode_channel(pred, idx, nibs, samples_per_block: int) -> np.ndarray:
    """One channel's recurrence, vectorized across blocks: sample 0 is
    the header predictor; each nibble advances (pred, step index)."""
    n = nibs.shape[0]
    out = np.empty((n, samples_per_block), dtype=np.int16)
    out[:, 0] = pred.astype(np.int16)
    for s in range(1, samples_per_block):
        nib = nibs[:, s - 1]
        step = _IMA_STEPS[idx]
        diff = step >> 3
        diff += np.where(nib & 1, step >> 2, 0)
        diff += np.where(nib & 2, step >> 1, 0)
        diff += np.where(nib & 4, step, 0)
        pred = np.clip(pred + np.where(nib & 8, -diff, diff), -32768, 32767)
        idx = np.clip(idx + _IMA_INDEX[nib], 0, 88)
        out[:, s] = pred.astype(np.int16)
    return out


def _nibbles(data: np.ndarray) -> np.ndarray:
    nibs = np.empty((data.shape[0], data.shape[1] * 2), dtype=np.int32)
    nibs[:, 0::2] = data & 0x0F  # low nibble first (spec)
    nibs[:, 1::2] = data >> 4
    return nibs


def ima_adpcm_decode_blocks(
    blocks: np.ndarray, samples_per_block: int, channels: int = 1
) -> np.ndarray:
    """(n_blocks, block_bytes) uint8 IMA ADPCM blocks → (n_blocks,
    samples_per_block * channels) int16, frame-major interleaved.
    Block layout (RIFF fmt 0x11): one 4-byte header per channel (int16
    predictor, uint8 step index, reserved); mono data is a flat nibble
    stream, stereo data alternates 4-byte (8-sample) groups per
    channel. Vectorized across blocks — the recurrence loops only over
    the within-block sample index."""
    b = np.asarray(blocks, dtype=np.uint8)
    if channels == 1:
        pred, idx = _ima_header(b, 0)
        return _ima_decode_channel(pred, idx, _nibbles(b[:, 4:]), samples_per_block)
    if channels != 2:
        raise NotImplementedError(f"IMA ADPCM with {channels} channels")
    n = b.shape[0]
    data = b[:, 8:]
    groups = data.reshape(n, -1, 4)
    out = np.empty((n, samples_per_block, 2), dtype=np.int16)
    for c in range(2):
        pred, idx = _ima_header(b, 4 * c)
        ch_bytes = groups[:, c::2, :].reshape(n, -1)
        out[:, :, c] = _ima_decode_channel(
            pred, idx, _nibbles(ch_bytes), samples_per_block
        )
    return out.reshape(n, samples_per_block * 2)


def ima_adpcm_encode_blocks(samples: np.ndarray, samples_per_block: int) -> np.ndarray:
    """(n_blocks, samples_per_block) int16 → (n_blocks, block_bytes)
    uint8 mono IMA ADPCM (greedy per-nibble search, the standard
    encoder). Vectorized across blocks."""
    x = np.asarray(samples, dtype=np.int32)
    n = x.shape[0]
    pred = x[:, 0].copy()
    idx = np.zeros(n, dtype=np.int32)
    n_nibs = samples_per_block - 1
    nibs = np.zeros((n, n_nibs + (n_nibs & 1)), dtype=np.uint8)
    for s in range(1, samples_per_block):
        step = _IMA_STEPS[idx]
        delta = x[:, s] - pred
        sign = (delta < 0).astype(np.int32)
        mag = np.abs(delta)
        # greedy bits against step, step/2, step/4 (spec encoder)
        b2 = (mag >= step).astype(np.int32)
        mag = mag - b2 * step
        b1 = (mag >= (step >> 1)).astype(np.int32)
        mag = mag - b1 * (step >> 1)
        b0 = (mag >= (step >> 2)).astype(np.int32)
        nib = (sign << 3) | (b2 << 2) | (b1 << 1) | b0
        # reconstruct exactly like the decoder
        diff = (step >> 3) + b0 * (step >> 2) + b1 * (step >> 1) + b2 * step
        pred = np.clip(pred + np.where(sign, -diff, diff), -32768, 32767)
        idx = np.clip(idx + _IMA_INDEX[nib], 0, 88)
        nibs[:, s - 1] = nib.astype(np.uint8)
    header = np.zeros((n, 4), dtype=np.uint8)
    p0 = x[:, 0].astype(np.int32) & 0xFFFF
    header[:, 0] = p0 & 0xFF
    header[:, 1] = p0 >> 8
    header[:, 2] = 0  # initial step index 0 (encoder choice)
    packed = (nibs[:, 0::2] | (nibs[:, 1::2] << 4)).astype(np.uint8)
    return np.concatenate([header, packed], axis=1)
