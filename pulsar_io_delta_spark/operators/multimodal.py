"""Multimodal column handling: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the raw bytes as a
``binary`` column next to typed metadata (mime, byte_len, source);
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row by
row, and each batch decodes in a single vectorized pass.

The actual media codecs (PIL/libav) are NOT available in this
environment, so the decode kernels are STUBS: ``decode_image_batch``
raises NotImplementedError unless ``fake=True``, in which case a
deterministic byte-derived fake produces stable outputs for tests. The
Spark-side plumbing — schema, batching, partitioning — is real.
"""

from __future__ import annotations

from collections.abc import Iterator

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


def decode_image_batch(pdf: pd.DataFrame, fake: bool) -> pd.DataFrame:
    if not fake:
        # Real path requires PIL / pyav, absent from this environment.
        raise NotImplementedError(
            "media decode requires PIL/pyav; run with fake=True for the "
            "deterministic test decoder"
        )
    decoded = [_fake_decode(p) for p in pdf["payload"]]
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


def resize_images(df: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Resize kernel (STUB): real path needs PIL; the fake keeps the
    payload and rewrites dimensions deterministically. Demonstrates the
    shape of a per-batch media transform: payload in → payload out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("image resize requires PIL")
            out = pdf[["doc_id", "payload", "mime"]].copy()
            out["width"] = width
            out["height"] = height
            yield out

    return df.mapInPandas(
        run, "doc_id long, payload binary, mime string, width long, height long"
    )


def sample_frames(df: DataFrame, every_n: int = 2, fake: bool = True) -> DataFrame:
    """Frame-sampling kernel (STUB): real path needs pyav; the fake
    treats every 64-byte window of the payload as a 'frame' and emits
    every Nth — one row per sampled frame (fan-out transform)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("frame sampling requires pyav")
            rows = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = [payload[i : i + 64] for i in range(0, len(payload), 64)]
                for idx in range(0, len(frames), every_n):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame"].append(bytes(frames[idx]))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, "doc_id long, frame_idx long, frame binary")
