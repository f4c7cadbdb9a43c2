"""Pure-numpy G.711 (µ-law / A-law) and IMA ADPCM codec tests
(round 9 — operators/audio.py; spec authority ITU-T G.711 and the
public IMA/DVI ADPCM algorithm)."""

import struct

import numpy as np

from pulsar_io_delta_spark.operators.audio import (
    alaw_decode,
    alaw_encode,
    ima_adpcm_decode_blocks,
    ima_adpcm_encode_blocks,
    mulaw_decode,
    mulaw_encode,
)
from pulsar_io_delta_spark.operators.multimodal import _parse_wav_pcm16


def test_g711_anchor_values():
    """Spec anchors: 0xFF / 0x7F are µ-law ±zero; 0x00 / 0x80 are the
    extreme magnitudes (±32124 in 16-bit scaling); A-law spans
    ±32256."""
    assert mulaw_decode(np.array([0xFF]))[0] == 0
    assert mulaw_decode(np.array([0x7F]))[0] == 0
    assert mulaw_decode(np.array([0x00]))[0] == -32124
    assert mulaw_decode(np.array([0x80]))[0] == 32124
    a = alaw_decode(np.arange(256, dtype=np.uint8))
    assert a.min() == -32256 and a.max() == 32256


def test_g711_codeword_round_trip_exact():
    """encode(decode(code)) reproduces every decoded value exactly —
    the property the hash-exact oracle contract leans on."""
    codes = np.arange(256, dtype=np.uint8)
    for dec, enc in ((mulaw_decode, mulaw_encode), (alaw_decode, alaw_encode)):
        vals = dec(codes)
        assert np.array_equal(dec(enc(vals)), vals)


def test_g711_quantization_error_bounded():
    """Nearest-codeword encoding: error is bounded by the overload
    clip (|-32768| - top codeword: µ-law 32124 → 644, A-law 32256 →
    512); interior values stay within half a segment step."""
    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32768, 20000).astype(np.int16)
    assert np.abs(mulaw_decode(mulaw_encode(x)).astype(int) - x).max() <= 644
    assert np.abs(alaw_decode(alaw_encode(x)).astype(int) - x).max() <= 512


def test_adpcm_constant_block_is_exact():
    """Zero nibbles at step index 0 decode to the header predictor
    forever (diff = 7>>3 = 0) — the oracle-exact ADPCM contract."""
    blocks = np.zeros((3, 14), dtype=np.uint8)
    for i, p in enumerate([1000, -20000, 0]):
        blocks[i, 0] = p & 0xFF
        blocks[i, 1] = (p >> 8) & 0xFF
    out = ima_adpcm_decode_blocks(blocks, 18)
    assert out.shape == (3, 18)
    assert np.array_equal(out[:, 0], out[:, 17])
    assert out[0, 0] == 1000 and out[1, 0] == -20000 and out[2, 0] == 0


def test_adpcm_round_trip_tracks_smooth_signal():
    t = np.linspace(0, 4 * np.pi, 505)
    sig = (3000 * np.sin(t)).astype(np.int16)[None, :].repeat(4, 0)
    dec = ima_adpcm_decode_blocks(ima_adpcm_encode_blocks(sig, 505), 505)
    assert np.abs(dec.astype(int) - sig.astype(int)).mean() < 10


def _wav(fmt_body: bytes, data: bytes) -> bytes:
    return (
        b"RIFF" + struct.pack("<I", 20 + len(fmt_body) + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_wav_parser_routes_g711_and_adpcm():
    # µ-law square wave: codeword 40 alternated with its sign flip
    codes = bytes([40, 40 ^ 0x80] * 9)
    fmt7 = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    rate, ch, s = _parse_wav_pcm16(_wav(fmt7, codes))
    assert (rate, ch, len(s)) == (8000, 1, 18)
    m = int(mulaw_decode(np.array([40]))[0])
    assert set(s[:, 0].tolist()) == {m, -m}
    # A-law
    fmt6 = struct.pack("<HHIIHH", 6, 1, 8000, 8000, 1, 8)
    rate, ch, s = _parse_wav_pcm16(_wav(fmt6, codes))
    a = int(alaw_decode(np.array([40]))[0])
    assert set(s[:, 0].tolist()) == {a, -a}
    # ADPCM constant block
    block = bytes([0xD0, 0x07, 0, 0]) + b"\x00" * 10  # predictor 2000
    fmt11 = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 4000, 14, 4, 2, 18)
    rate, ch, s = _parse_wav_pcm16(_wav(fmt11, block))
    assert len(s) == 18 and set(s[:, 0].tolist()) == {2000}
    # MP3-in-WAV stays loud
    import pytest

    fmt55 = struct.pack("<HHIIHH", 0x55, 1, 8000, 8000, 1, 0)
    with pytest.raises(NotImplementedError, match="needs a codec"):
        _parse_wav_pcm16(_wav(fmt55, b"\x00" * 8))


def test_adpcm_stereo_blocks():
    """Stereo IMA ADPCM: one header per channel, data in alternating
    4-byte (8-sample) groups — constant-per-channel blocks decode to
    their own predictors, frame-major interleaved."""
    spb = 9  # 8 nibbles per channel = one 4-byte group each
    block = np.zeros((1, 8 + 8), dtype=np.uint8)
    for c, p in enumerate((1000, -500)):
        block[0, 4 * c] = p & 0xFF
        block[0, 4 * c + 1] = (p >> 8) & 0xFF
    out = ima_adpcm_decode_blocks(block, spb, channels=2)
    assert out.shape == (1, spb * 2)
    frames = out.reshape(spb, 2)
    assert set(frames[:, 0].tolist()) == {1000}
    assert set(frames[:, 1].tolist()) == {-500}
    # WAV routing
    fmt11 = struct.pack("<HHIIHHHH", 0x11, 2, 8000, 8000, 16, 4, 2, spb)
    rate, ch, s = _parse_wav_pcm16(_wav(fmt11, block.tobytes()))
    assert (ch, s.shape) == (2, (spb, 2))
    assert set(s[:, 0].tolist()) == {1000} and set(s[:, 1].tolist()) == {-500}
    import pytest

    with pytest.raises(NotImplementedError, match="channels"):
        ima_adpcm_decode_blocks(block, spb, channels=3)


# ---------------------------------------------------------------------------
# FLAC (round 10): lossless codec, hash-exact by construction


def _flac_stream(frames_payload: bytes, rate=8000, ch=2, bps=16, total=0) -> bytes:
    """Minimal fLaC container: STREAMINFO + raw frame bytes."""
    from pulsar_io_delta_spark.operators.flac import _BitWriter

    w = _BitWriter()
    w.write(1, 1)
    w.write(0, 7)
    w.write(34, 24)
    w.write(16, 16)
    w.write(65535, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(rate, 20)
    w.write(ch - 1, 3)
    w.write(bps - 1, 5)
    w.write(total, 36)
    for _ in range(16):
        w.write(0, 8)
    return b"fLaC" + w.bytes() + frames_payload


def _flac_frame(subframes_bits, blocksize, ch_code) -> bytes:
    """Hand-build one frame: header + callback-written subframes."""
    from pulsar_io_delta_spark.operators.flac import _BitWriter, crc8, crc16

    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(0b0111, 4)  # 16-bit blocksize-1 follows
    w.write(0b0000, 4)  # rate from STREAMINFO
    w.write(ch_code, 4)
    w.write(0b100, 3)  # 16 bps
    w.write(0, 1)
    w.write(0, 8)  # frame number 0 (utf8 single byte)
    w.write(blocksize - 1, 16)
    w.write(crc8(bytes(w.buf)), 8)
    subframes_bits(w)
    w.align()
    w.write(crc16(bytes(w.buf)), 16)
    return w.bytes()


def _verbatim(w, x, bps) -> None:
    w.write(0, 1)
    w.write(0b000001, 6)
    w.write(0, 1)
    for v in x:
        w.write(int(v) & ((1 << bps) - 1), bps)


def test_flac_roundtrip_lossless_mono_stereo():
    import numpy as np

    from pulsar_io_delta_spark.operators.flac import decode_flac, encode_flac

    rng = np.random.RandomState(3)
    x = (2000 * np.sin(np.arange(5000) / 9)).astype(np.int16)
    x += rng.randint(-40, 40, 5000).astype(np.int16)
    rate, ch, y = decode_flac(encode_flac(x, 8000, block_size=576))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(y[:, 0], x.astype(np.int64))
    s = np.stack([x, np.roll(x, 7)], axis=1)
    rate, ch, y = decode_flac(encode_flac(s, 44100, block_size=1024))
    assert (rate, ch) == (44100, 2)
    assert np.array_equal(y, s.astype(np.int64))


def test_flac_crc_corruption_fails_loudly():
    import numpy as np
    import pytest

    from pulsar_io_delta_spark.operators.flac import decode_flac, encode_flac

    blob = bytearray(encode_flac(np.arange(100, dtype=np.int16), 8000))
    blob[-3] ^= 0x40  # flip a bit inside the last frame body — depending
    # on where it lands this is a CRC mismatch or a reader overrun; both
    # must be LOUD ValueErrors, never silently-wrong samples
    with pytest.raises(ValueError, match="FLAC"):
        decode_flac(bytes(blob))
    blob2 = bytearray(encode_flac(np.arange(100, dtype=np.int16), 8000))
    blob2[44] ^= 0x01  # inside the frame header → header CRC-8 catches it
    with pytest.raises(ValueError, match="FLAC"):
        decode_flac(bytes(blob2))


def test_flac_stereo_decorrelation_modes():
    """left/side, right/side and mid/side reconstruction (decode-only
    paths — our fixture encoder writes independent channels). The side
    channel carries one extra bit per spec."""
    import numpy as np

    from pulsar_io_delta_spark.operators.flac import decode_flac

    left = np.array([100, -200, 32767, -32768, 0, 55, -1, 7], np.int64)
    right = np.array([90, -150, 32760, -32768, 1, -55, 1, 7], np.int64)
    side = left - right
    mid = (left + right) >> 1

    frames = {
        0b1000: [(left, 16), (side, 17)],  # left/side
        0b1001: [(side, 17), (right, 16)],  # right/side
        0b1010: [(mid, 16), (side, 17)],  # mid/side
    }
    for code, subs in frames.items():
        def write_subs(w, subs=subs):
            for x, bps in subs:
                _verbatim(w, x, bps)

        payload = _flac_stream(_flac_frame(write_subs, 8, code), total=8)
        rate, ch, y = decode_flac(payload)
        assert ch == 2
        assert np.array_equal(y[:, 0], left), (code, y[:, 0])
        assert np.array_equal(y[:, 1], right), (code, y[:, 1])


def test_flac_lpc_escape_partitions_and_wasted_bits():
    """Decode-only bitstream features: an LPC subframe (order 2,
    shift 1, coefs [3, -1]), a rice residual split into 2 partitions
    where the second uses the escape (raw 5-bit) encoding, and a
    constant subframe with wasted bits."""
    import numpy as np

    from pulsar_io_delta_spark.operators.flac import decode_flac

    warm = [10, 12]
    resid = [1, -2, 3, -4, 0, 5]  # blocksize 8, order 2
    x = list(warm)
    for i, r in enumerate(resid):
        pred = (3 * x[-1] - 1 * x[-2]) >> 1
        x.append(pred + r)

    def write_subs(w):
        # subframe 1: LPC order 2
        w.write(0, 1)
        w.write(0b100000 | 1, 6)  # LPC, order-1 = 1 → order 2
        w.write(0, 1)
        for v in warm:
            w.write(v & 0xFFFF, 16)
        w.write(12 - 1, 4)  # precision 12
        w.write(1, 5)  # shift 1
        w.write(3 & 0xFFF, 12)
        w.write(-1 & 0xFFF, 12)
        w.write(0b00, 2)  # rice 4-bit
        w.write(1, 4)  # partition order 1 → 2 partitions of 4
        w.write(2, 4)  # partition 1: rice param 2 (2 residuals: 1, -2)
        for r in resid[:2]:
            u = (r << 1) if r >= 0 else ((-r << 1) - 1)
            w.write_unary(u >> 2)
            w.write(u & 3, 2)
        w.write(0b1111, 4)  # partition 2: ESCAPE
        w.write(6, 5)  # raw 6-bit residuals
        for r in resid[2:]:
            w.write(r & 0x3F, 6)
        # subframe 2: CONSTANT with 3 wasted bits (value stored >>3)
        w.write(0, 1)
        w.write(0b000000, 6)
        w.write(1, 1)  # wasted-bits flag
        w.write_unary(2)  # unary 2 → wasted = 3
        w.write(5 & 0x1FFF, 13)  # 16-3 bits
    payload = _flac_stream(_flac_frame(write_subs, 8, 0b0001), total=8)
    rate, ch, y = decode_flac(payload)
    assert np.array_equal(y[:, 0], np.array(x, np.int64))
    assert np.array_equal(y[:, 1], np.full(8, 5 << 3, np.int64))


class TestMpegProbe:
    """Frame-header probe (round 11): closed-form metadata extraction;
    decode still gates loudly (entropy tables are not derivable)."""

    def test_roundtrip_matrix(self):
        from pulsar_io_delta_spark.operators.multimodal import (
            build_mpeg_stream,
            probe_mpeg_frames,
        )

        for layer, roman, spf in ((1, "I", 384), (2, "II", 1152), (3, "III", 1152)):
            for bi in (1, 2, 3):
                for si, sr in ((0, 44100), (1, 48000), (2, 32000)):
                    for mono in (True, False):
                        m = probe_mpeg_frames(
                            build_mpeg_stream(layer, bi, si, mono, 6)
                        )
                        assert m["layer"] == roman
                        assert m["sample_rate"] == sr
                        assert m["channels"] == (1 if mono else 2)
                        assert m["n_frames"] == 6
                        assert m["total_samples"] == 6 * spf
                        assert m["duration_ms"] == 6 * spf * 1000 // sr

    def test_id3v2_skip_and_exact_frame_bytes(self):
        from pulsar_io_delta_spark.operators.multimodal import (
            build_mpeg_stream,
            probe_mpeg_frames,
        )

        b = build_mpeg_stream(3, 2, 1, False, 4, id3_bytes=200)
        m = probe_mpeg_frames(b)
        # 40 kbps @ 48000: 144*40000//48000 = 120 bytes/frame
        assert m["frame_bytes"] == 4 * 120 == len(b) - 210
        assert m["bitrate_kbps"] == 40

    def test_desync_and_truncation_refuse_loudly(self):
        import pytest

        from pulsar_io_delta_spark.operators.multimodal import (
            build_mpeg_stream,
            probe_mpeg_frames,
        )

        good = build_mpeg_stream(3, 1, 0, True, 3)
        with pytest.raises(ValueError, match="lost frame sync"):
            probe_mpeg_frames(good + b"\x00garbage")
        corrupt = bytearray(good)
        corrupt[0] = 0x00  # first sync byte gone
        with pytest.raises(ValueError, match="lost frame sync"):
            probe_mpeg_frames(bytes(corrupt))
        with pytest.raises(ValueError, match="no frames"):
            probe_mpeg_frames(b"ID3\x03\x00\x00\x00\x00\x00\x00")

    def test_free_format_and_reserved_gate(self):
        import pytest

        from pulsar_io_delta_spark.operators.multimodal import probe_mpeg_frames

        # free-format: bitrate index 0
        hdr = bytes([0xFF, 0xE0 | (0b11 << 3) | (0b01 << 1) | 1, 0x00, 0x00])
        with pytest.raises(NotImplementedError, match="free-format"):
            probe_mpeg_frames(hdr + bytes(100))
        # reserved version bits (0b01)
        hdr = bytes([0xFF, 0xE0 | (0b01 << 3) | (0b01 << 1) | 1, 0x10, 0x00])
        with pytest.raises(ValueError, match="reserved"):
            probe_mpeg_frames(hdr + bytes(100))

    def test_decode_still_gates_by_layer(self):
        import pytest

        from pulsar_io_delta_spark.operators.multimodal import (
            _parse_audio,
            build_mpeg_stream,
        )

        with pytest.raises(NotImplementedError, match="Layer III"):
            _parse_audio(build_mpeg_stream(3, 1, 0, True, 1))


class TestMpegProbeBatch:
    """Round 12: the batch-vectorized probe (numpy wavefront over a
    concatenated buffer) must be semantics-identical to the scalar
    frame walk — same stats on every valid stream, same error class on
    every corrupt one."""

    def _batch_one(self, payload):
        from pulsar_io_delta_spark.operators.multimodal import _probe_mpeg_batch

        out = _probe_mpeg_batch([payload])
        return {k: (v[0].item() if hasattr(v[0], "item") else v[0])
                for k, v in out.items()}

    def test_matrix_equals_scalar(self):
        from pulsar_io_delta_spark.operators.multimodal import (
            _probe_mpeg_batch,
            build_mpeg_stream,
            probe_mpeg_frames,
        )

        streams = []
        for layer in (1, 2, 3):
            for bi in (1, 5, 9):
                for si in (0, 1, 2):
                    for mono in (True, False):
                        for nf in (1, 4, 7):
                            streams.append(
                                build_mpeg_stream(
                                    layer, bi, si, mono, nf,
                                    id3_bytes=64 if nf == 4 else 0,
                                )
                            )
        want = [probe_mpeg_frames(s) for s in streams]
        got = _probe_mpeg_batch(streams)
        for i, w in enumerate(want):
            for k, v in w.items():
                g = got[k][i]
                assert (g.item() if hasattr(g, "item") else g) == v, (i, k)

    def test_mixed_channel_stream_max_accounting(self):
        # scalar meta logic reports max(channels) across frames when the
        # stream mixes modes; the batch path must agree
        from pulsar_io_delta_spark.operators.multimodal import (
            build_mpeg_stream,
            probe_mpeg_frames,
        )

        mono = build_mpeg_stream(3, 2, 1, True, 2)
        stereo = build_mpeg_stream(3, 2, 1, False, 3)
        mixed = mono + stereo
        w = probe_mpeg_frames(mixed)
        assert w["channels"] == 2 and w["n_frames"] == 5
        assert self._batch_one(mixed) == w

    def test_trailing_junk_under_4_bytes_tolerated_like_scalar(self):
        from pulsar_io_delta_spark.operators.multimodal import (
            build_mpeg_stream,
            probe_mpeg_frames,
        )

        s = build_mpeg_stream(2, 3, 0, False, 3) + b"\x00\x00"
        assert self._batch_one(s) == probe_mpeg_frames(s)

    def test_errors_match_scalar(self):
        import pytest

        from pulsar_io_delta_spark.operators.multimodal import (
            _probe_mpeg_batch,
            build_mpeg_stream,
            probe_mpeg_frames,
        )

        good = build_mpeg_stream(3, 1, 0, True, 3)
        cases = [
            (good + b"\x00garbage", ValueError, "lost frame sync"),
            (good[:-5], ValueError, "truncated final frame"),
            (b"ID3\x03\x00\x00\x00\x00\x00\x00", ValueError, "no frames"),
            (b"ID3\x03\x00\x00\x00\x00\x07\x00" + bytes(20), ValueError,
             "ID3v2 tag promises"),
            (bytes([0xFF, 0xE0 | (0b11 << 3) | (0b01 << 1) | 1, 0x00, 0x00])
             + bytes(100), NotImplementedError, "free-format"),
            (bytes([0xFF, 0xE0 | (0b01 << 3) | (0b01 << 1) | 1, 0x10, 0x00])
             + bytes(100), ValueError, "reserved"),
        ]
        for payload, exc, msg in cases:
            with pytest.raises(exc, match=msg):
                probe_mpeg_frames(payload)
            with pytest.raises(exc, match=msg):
                _probe_mpeg_batch([payload])
            # a bad payload poisons its batch even next to good ones
            with pytest.raises(exc, match=msg):
                _probe_mpeg_batch([good, payload, good])

    def test_truncated_final_frame_refuses(self):
        # ADVICE r11: the scalar walk used to count a final frame whose
        # header promised more bytes than the payload holds
        import pytest

        from pulsar_io_delta_spark.operators.multimodal import (
            build_mpeg_stream,
            probe_mpeg_frames,
        )

        good = build_mpeg_stream(1, 2, 1, False, 2)
        with pytest.raises(ValueError, match="truncated final frame"):
            probe_mpeg_frames(good[:-1])
