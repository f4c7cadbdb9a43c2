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
