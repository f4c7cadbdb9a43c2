"""Multimodal column handling: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the raw bytes as a
``binary`` column next to typed metadata (mime, byte_len, source);
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row by
row, and each batch decodes in a single vectorized pass.

Decode support is layered by what this environment can honestly do:

- **Real decode, from-scratch numpy codecs** — images: binary PPM
  (``P6``) / PGM (``P5``), 24-bit uncompressed BMP, JPEG (baseline +
  progressive + 12-bit, ``operators/jpeg.py``), PNG (depths
  1/2/4/8/16 + Adam7, ``operators/png.py``); audio: PCM-16 / G.711 /
  IMA-ADPCM WAV (``operators/audio.py``) and FLAC
  (``operators/flac.py``, lossless); video: AVI ``00db`` frame demux.
  ``resize_images(fake=False)`` does a real nearest-neighbour
  resample (with re-encode for the lossless formats).
- **Formats needing external codec table data** (arithmetic/
  hierarchical JPEG, MPEG audio layers I/II/III, AAC, H.264) raise
  ``NotImplementedError`` naming the exact variant, unless
  ``fake=True``, in which case a deterministic byte-derived fake
  produces stable outputs for tests.

Either way the Spark-side plumbing — schema, Arrow batching,
partitioning — is identical to a production pipeline's.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("features", ArrayType(DoubleType())),
        StructField("mime", StringType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal record: bytes + typed metadata columns."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.octet_length(F.col(text_col)).cast("long").alias("byte_len"),
        "lang",
        "source",
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a media decoder (no codec libs here)."""
    n = len(payload)
    width = 64 + (n % 512)
    height = 64 + ((n * 7) % 512)
    n_frames = 1 + (n % 4)
    features = [round((payload[i % n] if n else 0) / 255.0, 6) for i in range(8)]
    return width, height, n_frames, features


def _parse_netpbm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) → (h, w, channels) uint8 array.
    Header tokens may be separated by whitespace and '#' comments."""
    toks: list[bytes] = []
    i = 0
    while len(toks) < 4:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        toks.append(payload[i:j])
        i = j
    i += 1  # single whitespace byte after maxval, then raster
    magic, w, h, maxval = toks[0], int(toks[1]), int(toks[2]), int(toks[3])
    if magic not in (b"P6", b"P5") or maxval > 255:
        raise ValueError(f"unsupported netpbm variant {magic!r} maxval={maxval}")
    ch = 3 if magic == b"P6" else 1
    return np.frombuffer(payload, np.uint8, count=w * h * ch, offset=i).reshape(h, w, ch)


def _parse_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → (h, w, 3) uint8 RGB array (handles the
    bottom-up row order, BGR channels, and 4-byte row padding)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h_raw = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"media decode: BMP bpp={bpp} compression={compression} needs PIL"
        )
    h = abs(h_raw)
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.frombuffer(payload, np.uint8, count=h * stride, offset=data_off)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_raw > 0:
        img = img[::-1]  # bottom-up storage
    return img[:, :, ::-1]  # BGR → RGB


def _real_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Numpy-only decode of uncompressed formats: dimensions + 8
    channel-statistics features (means, stds, luma mean, edge proxy)."""
    if payload[:2] in (b"P6", b"P5"):
        arr = _parse_netpbm(payload)
    elif payload[:2] == b"BM":
        arr = _parse_bmp(payload)
    elif payload[:2] == b"\xff\xd8":
        # baseline-sequential or progressive JPEG, pure-numpy codec
        # (operators/jpeg.py); arithmetic/hierarchical fail loudly inside
        from pulsar_io_delta_spark.operators.jpeg import decode_jpeg

        arr = decode_jpeg(payload)
    elif payload[:8] == b"\x89PNG\r\n\x1a\n":
        # PNG: zlib+numpy codec (operators/png.py), lossless-exact
        from pulsar_io_delta_spark.operators.png import decode_png

        arr = decode_png(payload)
    else:
        raise NotImplementedError(
            f"media decode: format with magic {payload[:4]!r} requires "
            "PIL/pyav (PPM/PGM/BMP/baseline-JPEG/PNG decode natively; use "
            "fake=True for the deterministic test decoder)"
        )
    h, w, ch = arr.shape
    rgb = arr if ch == 3 else np.repeat(arr, 3, axis=2)
    flat = rgb.reshape(-1, 3).astype(np.float64) / 255.0
    means, stds = flat.mean(axis=0), flat.std(axis=0)
    luma = flat @ np.array([0.299, 0.587, 0.114])
    grid = luma.reshape(h, w)
    edge = float(np.abs(np.diff(grid, axis=1)).mean()) if w > 1 else 0.0
    feats = [*means, *stds, float(luma.mean()), edge]
    return w, h, 1, [round(float(x), 6) for x in feats]


def decode_image_batch(pdf: pd.DataFrame, fake: bool) -> pd.DataFrame:
    decode = _fake_decode if fake else _real_decode
    decoded = [decode(p) for p in pdf["payload"]]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].values,
            "width": [d[0] for d in decoded],
            "height": [d[1] for d in decoded],
            "n_frames": [d[2] for d in decoded],
            "features": [d[3] for d in decoded],
            "mime": pdf["mime"].values,
        }
    )


def payload_byte_stats(df: DataFrame) -> DataFrame:
    """mapInArrow kernel: per-payload byte statistics computed directly
    on Arrow buffers (no pandas materialization) — the zero-copy path
    for wide binary columns at scale."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches):
        for batch in batches:
            tbl = pa.table(batch)
            payload = tbl.column("payload")
            lengths = pc.binary_length(payload).cast(pa.int64())
            first = pc.binary_slice(payload, 0, 1)
            yield pa.RecordBatch.from_arrays(
                [tbl.column("doc_id").combine_chunks(), lengths.combine_chunks(),
                 first.cast(pa.binary()).combine_chunks()],
                names=["doc_id", "byte_len", "first_byte"],
            )

    return df.mapInArrow(stats, "doc_id long, byte_len long, first_byte binary")


def decode_images(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode stage over (doc_id, payload, mime, ...) rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_image_batch(pdf, fake=fake)

    return df.mapInPandas(run, DECODED_SCHEMA)


def _real_resize(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbour resample of a PPM/PGM/baseline-JPEG payload,
    re-encoded in the same format — a REAL payload-in → payload-out
    media transform with no codec libraries."""
    if payload[:2] == b"\xff\xd8":
        from pulsar_io_delta_spark.operators.jpeg import decode_jpeg, encode_jpeg

        arr = decode_jpeg(payload)
        h, w, _ch = arr.shape
        yi = (np.arange(height) * h) // height
        xi = (np.arange(width) * w) // width
        return encode_jpeg(np.ascontiguousarray(arr[yi][:, xi]))
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from pulsar_io_delta_spark.operators.png import decode_png, encode_png

        arr = decode_png(payload)
        h, w, _ch = arr.shape
        yi = (np.arange(height) * h) // height
        xi = (np.arange(width) * w) // width
        return encode_png(np.ascontiguousarray(arr[yi][:, xi]))
    if payload[:2] not in (b"P6", b"P5"):
        raise NotImplementedError(
            "image resize: PPM/PGM/BMP/baseline-JPEG/PNG resample "
            "natively; other formats need PIL"
        )
    arr = _parse_netpbm(payload)
    h, w, _ch = arr.shape
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    out = np.ascontiguousarray(arr[yi][:, xi])
    header = b"%s\n%d %d\n255\n" % (payload[:2], width, height)
    return header + out.tobytes()


def resize_images(df: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Resize kernel: real nearest-neighbour resample for PPM/PGM
    payloads (``fake=False``); the fake keeps the payload and rewrites
    dimensions deterministically. Either way it demonstrates the shape
    of a per-batch media transform: payload in → payload out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["doc_id", "payload", "mime"]].copy()
            if not fake:
                out["payload"] = [
                    _real_resize(p, width, height) for p in out["payload"]
                ]
            out["width"] = width
            out["height"] = height
            yield out

    return df.mapInPandas(
        run, "doc_id long, payload binary, mime string, width long, height long"
    )


DECODED_AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_channels", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("features", ArrayType(DoubleType())),  # rms, zcr, peak
        StructField("mime", StringType()),
    ]
)


def _parse_wav_pcm16(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE → (sample_rate, n_channels, int16 samples[frame, ch]).
    Walks the chunk list (fmt / data may be preceded by LIST etc.).
    Formats (round 9 extends beyond PCM-16): 1 = PCM-16, 6 = G.711
    A-law, 7 = G.711 µ-law, 0x11 = IMA ADPCM (mono) — the pure-numpy
    codecs in operators/audio.py. Anything else (MP3/AAC inside WAV)
    still fails loudly."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, fmt, data = 12, None, None, None, None, None
    block_align = samples_per_block = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            block_align = int.from_bytes(body[12:14], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt == 0x11:
                # cbSize + wSamplesPerBlock extension (required for ADPCM)
                samples_per_block = int.from_bytes(body[18:20], "little")
            supported = fmt in (1, 6, 7) or (fmt == 0x11 and channels in (1, 2))
            if not supported or (fmt == 1 and bits != 16):
                raise NotImplementedError(
                    f"media decode: WAV fmt={fmt} bits={bits} "
                    f"channels={channels} needs a codec; PCM-16, G.711 "
                    "A-law/µ-law, and mono/stereo IMA ADPCM decode natively"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt == 1:
        samples = np.frombuffer(data, "<i2", count=len(data) // 2)
    elif fmt in (6, 7):
        from pulsar_io_delta_spark.operators.audio import alaw_decode, mulaw_decode

        codes = np.frombuffer(data, np.uint8)
        samples = (alaw_decode if fmt == 6 else mulaw_decode)(codes)
    else:  # 0x11 mono IMA ADPCM
        from pulsar_io_delta_spark.operators.audio import ima_adpcm_decode_blocks

        if not block_align or not samples_per_block:
            raise ValueError("ADPCM WAV missing blockAlign/samplesPerBlock")
        usable = (len(data) // block_align) * block_align
        blocks = np.frombuffer(data, np.uint8, count=usable).reshape(
            -1, block_align
        )
        samples = ima_adpcm_decode_blocks(
            blocks, samples_per_block, channels
        ).reshape(-1)
    return rate, channels, samples.reshape(-1, channels)


def _parse_audio(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Magic dispatch over the audio container matrix: RIFF/WAVE
    (PCM-16 / G.711 / IMA ADPCM), FLAC (operators/flac.py — lossless,
    round 10). MPEG-1 audio frames (Layer I/II/III, the .mp1/.mp2/.mp3
    family) gate loudly BY LAYER — their entropy stage needs spec table
    data (Huffman trees, filterbank windows) that cannot be derived
    in-sandbox, so a from-memory transcription would risk silently
    wrong samples; a loud gate is the honest behavior."""
    if payload[:4] == b"RIFF":
        return _parse_wav_pcm16(payload)
    if payload[:4] == b"fLaC":
        from pulsar_io_delta_spark.operators.flac import decode_flac

        return decode_flac(payload)
    if len(payload) >= 2 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0:
        layer = {0b01: "III", 0b10: "II", 0b11: "I"}.get((payload[1] >> 1) & 0b11)
        raise NotImplementedError(
            f"media decode: MPEG-1 audio Layer {layer or '(reserved)'} needs "
            "external codec tables (Huffman/filterbank spec data); PCM-16, "
            "G.711, IMA ADPCM WAV and FLAC decode natively"
        )
    raise ValueError(f"unsupported audio payload magic {payload[:4]!r}")


def decode_audio(df: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas audio decode: REAL for PCM-16/G.711/ADPCM WAV and
    FLAC (numpy codecs; rms / zero-crossing-rate / peak features);
    MPEG-family codecs raise loudly. ``fake=True`` gives the
    byte-derived deterministic stand-in."""

    def decode(payload: bytes):
        if fake:
            n = len(payload)
            return 16000, 1, max(n // 2, 1), round(n / 32000.0, 6), [
                round((payload[0] if n else 0) / 255.0, 6), 0.0, 1.0]
        rate, channels, frames = _parse_audio(bytes(payload))
        x = frames.astype(np.float64) / 32768.0
        mono = x.mean(axis=1)
        rms = float(np.sqrt((mono**2).mean())) if mono.size else 0.0
        zcr = float((np.diff(np.signbit(mono)) != 0).mean()) if mono.size > 1 else 0.0
        peak = float(np.abs(mono).max()) if mono.size else 0.0
        return (
            rate, channels, frames.shape[0],
            round(frames.shape[0] / rate, 6),
            [round(rms, 6), round(zcr, 6), round(peak, 6)],
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "sample_rate": [d[0] for d in decoded],
                    "n_channels": [d[1] for d in decoded],
                    "n_samples": [d[2] for d in decoded],
                    "duration_s": [d[3] for d in decoded],
                    "features": [d[4] for d in decoded],
                    "mime": pdf["mime"].values,
                }
            )

    return df.mapInPandas(run, DECODED_AUDIO_SCHEMA)


def _iter_riff_chunks(payload: bytes, start: int, end: int):
    """Yield (fourcc, body_start, size) over a RIFF chunk span."""
    pos = start
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)  # word alignment


def _parse_avi_frames(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Uncompressed AVI (RIFF 'AVI ' with '00db' DIB frames) →
    (width, height, frames as raw bottom-up BGR buffers). Real frame
    demux with no codec library; compressed streams ('00dc') raise."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    width = height = None
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        nonlocal width, height
        for cid, body, size in _iter_riff_chunks(payload, start, end):
            if cid == b"LIST":
                walk(body + 4, body + size)  # skip the list-type fourcc
            elif cid == b"avih":
                width = int.from_bytes(payload[body + 32 : body + 36], "little")
                height = int.from_bytes(payload[body + 36 : body + 40], "little")
            elif cid == b"00db":
                frames.append(payload[body : body + size])
            elif cid == b"00dc":
                raise NotImplementedError(
                    "media decode: compressed AVI stream ('00dc') requires pyav"
                )

    walk(12, len(payload))
    if width is None or not frames:
        raise ValueError("AVI missing avih header or frames")
    return width, height, frames


def sample_frames(df: DataFrame, every_n: int = 2, fake: bool = True) -> DataFrame:
    """Frame-sampling fan-out (one row per sampled frame).

    REAL path (``fake=False``): demux uncompressed AVI ('00db' DIB
    frames) via the RIFF chunk walker — no codec library needed;
    compressed streams raise. The fake treats every 64-byte window of
    the payload as a 'frame' for plumbing tests."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if fake:
                    frames = [bytes(payload[i : i + 64]) for i in range(0, len(payload), 64)]
                else:
                    _w, _h, frames = _parse_avi_frames(bytes(payload))
                for idx in range(0, len(frames), every_n):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame"].append(bytes(frames[idx]))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, "doc_id long, frame_idx long, frame binary")


# ---------------------------------------------------------------------------
# MPEG audio frame PROBING (round 11): metadata extraction WITHOUT decode.
#
# A crawl pipeline's first pass over audio is duration/bitrate/layer
# stats, language-budget accounting, and corrupt-file triage — none of
# which needs the entropy stage. The frame HEADER layer of MPEG-1/2/2.5
# audio (ISO 11172-3 / 13818-3) is fully closed-form: sync walk, two
# small public tables (bitrate, sample rate), and an exact frame-length
# formula. Sample DECODE still gates loudly in _parse_audio (the
# Huffman/filterbank constant tables cannot be re-derived in-sandbox).

# bitrate (kbps) by (version_group, layer), header index 1..14;
# index 0 = free-format (gated), 15 = invalid
_MPEG_BITRATE_KBPS = {
    ("1", 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    ("1", 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    ("1", 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    ("2", 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    ("2", 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    ("2", 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MPEG_SAMPLE_RATE = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}
_MPEG_VERSION_BITS = {0b11: "1", 0b10: "2", 0b00: "2.5"}  # 0b01 reserved
_LAYER_BITS = {0b11: 1, 0b10: 2, 0b01: 3}  # 0b00 reserved
_LAYER_ROMAN = {1: "I", 2: "II", 3: "III"}


def _skip_id3v2(payload: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (web MP3s carry them):
    'ID3' + version(2) + flags(1) + syncsafe size(4), then size bytes
    (+10 footer when flag bit 4 is set)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    sz = 0
    for b in payload[6:10]:
        if b & 0x80:
            raise ValueError("corrupt ID3v2 tag: non-syncsafe size byte")
        sz = (sz << 7) | b
    return 10 + sz + (10 if payload[5] & 0x10 else 0)


def probe_mpeg_frames(payload: bytes) -> dict:
    """Walk every MPEG audio frame header in ``payload`` and return
    the stream's metadata: version, layer, bitrate, sample rate,
    channels, frame count, exact sample count, duration (integer ms,
    floor — mirrored by the SQL oracle), and payload bytes consumed by
    frames (ID3 excluded). Free-format bitrate, reserved version/layer
    bits, and mid-stream desync all refuse loudly — a probe that
    guessed would poison corpus stats silently."""
    pos = _skip_id3v2(payload)
    if pos > len(payload):
        raise ValueError(
            f"MPEG probe: ID3v2 tag promises {pos} bytes but payload "
            f"has only {len(payload)}"
        )
    n_frames = 0
    total_samples = 0
    frame_bytes = 0
    meta: tuple | None = None
    while pos + 4 <= len(payload):
        b0, b1, b2, b3 = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(
                f"MPEG probe: lost frame sync at byte {pos} after "
                f"{n_frames} frames"
            )
        vbits = (b1 >> 3) & 0b11
        lbits = (b1 >> 1) & 0b11
        if vbits not in _MPEG_VERSION_BITS or lbits not in _LAYER_BITS:
            raise ValueError("MPEG probe: reserved version/layer bits")
        version = _MPEG_VERSION_BITS[vbits]
        layer = _LAYER_BITS[lbits]
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0b11
        padding = (b2 >> 1) & 1
        if br_idx == 0:
            raise NotImplementedError(
                "MPEG probe: free-format bitrate needs full frame "
                "parsing; only indexed bitrates are probed"
            )
        if br_idx == 15 or sr_idx == 3:
            raise ValueError("MPEG probe: invalid bitrate/sample-rate index")
        vgroup = "1" if version == "1" else "2"
        br_kbps = _MPEG_BITRATE_KBPS[(vgroup, layer)][br_idx - 1]
        sr = _MPEG_SAMPLE_RATE[version][sr_idx]
        channels = 1 if ((b3 >> 6) & 0b11) == 0b11 else 2
        if layer == 1:
            flen = (12 * br_kbps * 1000 // sr + padding) * 4
            spf = 384
        else:
            per = 144 if (layer == 2 or version == "1") else 72
            flen = per * br_kbps * 1000 // sr + padding
            spf = 1152 if (layer == 2 or version == "1") else 576
        cur = (version, layer, br_kbps, sr, channels)
        if meta is None:
            meta = cur
        elif cur != meta:
            # VBR/mixed streams exist; the probe reports the FIRST
            # frame's nominal rate and keeps exact sample accounting
            meta = (meta[0], meta[1], meta[2], meta[3], max(meta[4], channels))
        n_frames += 1
        total_samples += spf
        frame_bytes += flen
        pos += flen
    if pos > len(payload):
        # the final header promised more bytes than the payload holds
        # — counting it would overstate n_frames/duration/frame_bytes
        # on a corrupt stream that the docstring promises refuses
        raise ValueError(
            f"MPEG probe: truncated final frame (header at byte "
            f"{pos - flen} promises {flen} bytes, payload ends "
            f"{pos - len(payload)} bytes short)"
        )
    if meta is None:
        raise ValueError("MPEG probe: no frames found")
    version, layer, br_kbps, sr, channels = meta
    return {
        "mpeg_version": version,
        "layer": _LAYER_ROMAN[layer],
        "bitrate_kbps": br_kbps,
        "sample_rate": sr,
        "channels": channels,
        "n_frames": n_frames,
        "total_samples": total_samples,
        "duration_ms": total_samples * 1000 // sr,
        "frame_bytes": frame_bytes,
    }


# numpy mirrors of the header tables for the batch-vectorized probe:
# codes — version: 0='1', 1='2', 2='2.5', -1 reserved; layer: 1..3,
# -1 reserved; bitrate indexed by (vgroup, layer-1, br_idx-1).
_NP_VERSION = np.array([2, -1, 1, 0], dtype=np.int64)  # by vbits
_NP_LAYER = np.array([-1, 3, 2, 1], dtype=np.int64)  # by lbits
_NP_BITRATE = np.array(
    [
        [_MPEG_BITRATE_KBPS[("1", 1)], _MPEG_BITRATE_KBPS[("1", 2)],
         _MPEG_BITRATE_KBPS[("1", 3)]],
        [_MPEG_BITRATE_KBPS[("2", 1)], _MPEG_BITRATE_KBPS[("2", 2)],
         _MPEG_BITRATE_KBPS[("2", 3)]],
    ],
    dtype=np.int64,
)
_NP_SAMPLE_RATE = np.array(
    [_MPEG_SAMPLE_RATE["1"], _MPEG_SAMPLE_RATE["2"], _MPEG_SAMPLE_RATE["2.5"]],
    dtype=np.int64,
)
_NP_VERSION_STR = np.array(["1", "2", "2.5"])
_NP_LAYER_ROMAN = np.array(["I", "II", "III"])


def _probe_mpeg_batch(payloads: list) -> dict:
    """Batch-vectorized MPEG frame probe (round 12): identical
    semantics — same stats, same error classes and messages — to
    ``probe_mpeg_frames`` applied per payload, but column-at-a-time
    over the WHOLE Arrow batch. All payloads are concatenated into one
    buffer; a wavefront loop then advances every still-active stream
    one frame per iteration with pure numpy gathers and table lookups,
    so the Python-interpreter cost is O(max frames per payload) per
    batch instead of O(total frames) — the r11 per-payload walk was
    the second-slowest sf1 bench entry. Property-tested equal to the
    scalar walk (tests/test_multimodal_probe.py). On a multi-payload
    batch with several invalid streams the FIRST error raised may
    belong to a different payload than sequential iteration would
    pick; per-payload semantics are unchanged."""
    n = len(payloads)
    raw = [bytes(p) for p in payloads]
    lens = np.fromiter((len(p) for p in raw), dtype=np.int64, count=n)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    buf = np.frombuffer(b"".join(raw), dtype=np.uint8)
    # ID3 skip stays scalar (inspects ≤10 bytes per payload); it also
    # carries the corrupt-tag refusals
    pos = offs[:-1].copy()
    for i, p in enumerate(raw):
        sk = _skip_id3v2(p)
        if sk > len(p):
            raise ValueError(
                f"MPEG probe: ID3v2 tag promises {sk} bytes but "
                f"payload has only {len(p)}"
            )
        pos[i] += sk
    end = offs[1:]
    n_frames = np.zeros(n, dtype=np.int64)
    total_samples = np.zeros(n, dtype=np.int64)
    frame_bytes = np.zeros(n, dtype=np.int64)
    first_v = np.zeros(n, dtype=np.int64)
    first_layer = np.ones(n, dtype=np.int64)
    first_br = np.zeros(n, dtype=np.int64)
    first_sr = np.ones(n, dtype=np.int64)
    chan_max = np.zeros(n, dtype=np.int64)
    last_flen = np.zeros(n, dtype=np.int64)
    active = pos + 4 <= end
    while active.any():
        idx = np.nonzero(active)[0]
        p = pos[idx]
        b0 = buf[p].astype(np.int64)
        b1 = buf[p + 1].astype(np.int64)
        b2 = buf[p + 2].astype(np.int64)
        b3 = buf[p + 3].astype(np.int64)
        bad = (b0 != 0xFF) | ((b1 & 0xE0) != 0xE0)
        if bad.any():
            j = int(idx[np.nonzero(bad)[0][0]])
            raise ValueError(
                f"MPEG probe: lost frame sync at byte "
                f"{int(pos[j] - offs[j])} after {int(n_frames[j])} frames"
            )
        vcode = _NP_VERSION[(b1 >> 3) & 0b11]
        layer = _NP_LAYER[(b1 >> 1) & 0b11]
        if (vcode < 0).any() or (layer < 0).any():
            raise ValueError("MPEG probe: reserved version/layer bits")
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0b11
        padding = (b2 >> 1) & 1
        if (br_idx == 0).any():
            raise NotImplementedError(
                "MPEG probe: free-format bitrate needs full frame "
                "parsing; only indexed bitrates are probed"
            )
        if ((br_idx == 15) | (sr_idx == 3)).any():
            raise ValueError("MPEG probe: invalid bitrate/sample-rate index")
        vgroup = (vcode != 0).astype(np.int64)
        br = _NP_BITRATE[vgroup, layer - 1, br_idx - 1]
        sr = _NP_SAMPLE_RATE[vcode, sr_idx]
        ch = np.where(((b3 >> 6) & 0b11) == 0b11, 1, 2)
        is_l1 = layer == 1
        big = (layer == 2) | (vcode == 0)  # 1152-sample / 144-slot group
        spf = np.where(is_l1, 384, np.where(big, 1152, 576))
        flen = np.where(
            is_l1,
            (12 * br * 1000 // sr + padding) * 4,
            np.where(big, 144, 72) * br * 1000 // sr + padding,
        )
        first = n_frames[idx] == 0
        fi = idx[first]
        first_v[fi] = vcode[first]
        first_layer[fi] = layer[first]
        first_br[fi] = br[first]
        first_sr[fi] = sr[first]
        chan_max[idx] = np.maximum(chan_max[idx], ch)
        n_frames[idx] += 1
        total_samples[idx] += spf
        frame_bytes[idx] += flen
        last_flen[idx] = flen
        pos[idx] = p + flen
        active[idx] = pos[idx] + 4 <= end[idx]
    over = pos > end
    if over.any():
        j = int(np.nonzero(over)[0][0])
        flen_j = int(last_flen[j])
        raise ValueError(
            f"MPEG probe: truncated final frame (header at byte "
            f"{int(pos[j] - offs[j]) - flen_j} promises {flen_j} bytes, "
            f"payload ends {int(pos[j] - end[j])} bytes short)"
        )
    if (n_frames == 0).any():
        raise ValueError("MPEG probe: no frames found")
    return {
        "mpeg_version": _NP_VERSION_STR[first_v],
        "layer": _NP_LAYER_ROMAN[first_layer - 1],
        "bitrate_kbps": first_br,
        "sample_rate": first_sr,
        "channels": chan_max,
        "n_frames": n_frames,
        "total_samples": total_samples,
        "duration_ms": total_samples * 1000 // first_sr,
        "frame_bytes": frame_bytes,
    }


def build_mpeg_stream(
    layer: int,
    bitrate_idx: int,
    sr_idx: int,
    mono: bool,
    n_frames: int,
    id3_bytes: int = 0,
) -> bytes:
    """Construct a syntactically valid MPEG-1 audio stream (fixture
    side of the probe contract): correct headers and frame lengths,
    zeroed frame bodies (the probe never reads them). ``id3_bytes`` > 0
    prepends an ID3v2.3 tag of that body size."""
    br_kbps = _MPEG_BITRATE_KBPS[("1", layer)][bitrate_idx - 1]
    sr = _MPEG_SAMPLE_RATE["1"][sr_idx]
    out = bytearray()
    if id3_bytes:
        if id3_bytes >= 1 << 28:
            raise ValueError("ID3v2 size overflow")
        out += b"ID3\x03\x00\x00" + bytes(
            [(id3_bytes >> 21) & 0x7F, (id3_bytes >> 14) & 0x7F,
             (id3_bytes >> 7) & 0x7F, id3_bytes & 0x7F]
        ) + bytes(id3_bytes)
    lbits = {1: 0b11, 2: 0b10, 3: 0b01}[layer]
    hdr = bytes(
        [
            0xFF,
            0xE0 | (0b11 << 3) | (lbits << 1) | 1,  # MPEG1, no CRC
            (bitrate_idx << 4) | (sr_idx << 2),  # no padding
            (0b11 << 6) if mono else 0,  # mono vs stereo
        ]
    )
    flen = (
        (12 * br_kbps * 1000 // sr) * 4
        if layer == 1
        else 144 * br_kbps * 1000 // sr
    )
    for _ in range(n_frames):
        out += hdr + bytes(flen - 4)
    return bytes(out)


MPEG_PROBE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mpeg_version", StringType()),
        StructField("layer", StringType()),
        StructField("bitrate_kbps", LongType()),
        StructField("sample_rate", LongType()),
        StructField("channels", LongType()),
        StructField("n_frames", LongType()),
        StructField("total_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("frame_bytes", LongType()),
    ]
)


def probe_mpeg_audio(df: DataFrame) -> DataFrame:
    """Arrow-batched MPEG frame probe over (doc_id, payload): the
    corpus-stats pass (duration/bitrate/layer/frame accounting) that
    needs no sample decode. Same scale shape as decode_audio — one
    mapInPandas stage, bytes never leave the executor."""
    cols = [f.name for f in MPEG_PROBE_SCHEMA]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = _probe_mpeg_batch(list(pdf["payload"]))
            out["doc_id"] = pdf["doc_id"].to_numpy()
            yield pd.DataFrame(out, columns=cols)

    return df.select("doc_id", "payload").mapInPandas(batches, MPEG_PROBE_SCHEMA)
