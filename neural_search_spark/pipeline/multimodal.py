"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference's multimodal surface (`processor/TextImageEmbeddingProcessor.java:42`)
sends image bytes to an external model; the decode itself is out of scope
here (no image/audio libs in this container — see :func:`decode_image_stub`).
What IS real and tested is the Spark-side plumbing a 100 TB multimodal
pipeline needs:

- an opaque `binary` column with typed metadata alongside it,
- Arrow-batched `mapInPandas` feature extraction with a stable schema
  (the batch shape a real decoder would slot into),
- declarative frame/offset sampling (`F.sequence` + `explode`, JVM-side).

The deterministic "features" (byte length + md5-prefix checksum) stand in
for real decoded features so the whole path is oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

BINARY_META_SCHEMA = StructType(
    [
        StructField("docID", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("checksum", LongType(), False),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "content", id_col: str = "docID") -> DataFrame:
    """Attach an opaque binary column (utf-8 payload standing in for
    image/audio bytes) plus typed metadata — the multimodal table shape."""
    return df.select(
        F.col(id_col).alias("docID"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def decode_image_stub(payload: bytes) -> "object":
    """REAL image decode would live here (PIL/libvips); the container has
    no image libraries, so this is a clearly-marked stub. The Spark-side
    batch plumbing around it (`extract_binary_features`) is real."""
    raise NotImplementedError(
        "image decode requires an image library not present in this environment; "
        "plug a decoder into extract_binary_features' per-batch loop"
    )


def extract_binary_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    (docID, payload, meta) → (docID, n_bytes, checksum). A real decoder
    replaces the checksum with decoded features; batch shape, schema and
    partitioning are exactly what that decoder would need.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "docID": pdf["docID"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(
                        lambda b: int(hashlib.md5(bytes(b)).hexdigest()[:8], 16)
                    ).astype("int64"),
                }
            )

    return binary_df.select("docID", "payload").mapInPandas(_extract, BINARY_META_SCHEMA)


def frame_sample(
    binary_df: DataFrame, frame_stride: int = 64, max_frames: int = 16
) -> DataFrame:
    """Declarative frame/offset sampling: every `frame_stride` bytes, up
    to `max_frames` offsets per payload — the video-frame-sampling plan
    shape (JVM-side sequence + explode; no Python)."""
    n = F.col("meta.n_bytes")
    n_frames = F.least(
        F.floor((n + frame_stride - 1) / frame_stride), F.lit(max_frames)
    ).cast("int")
    offs = F.when(n_frames > 0, F.sequence(F.lit(0), n_frames - 1)).otherwise(
        F.expr("CAST(array() AS array<int>)")
    )
    return binary_df.select(
        "docID", F.posexplode(offs).alias("frame_idx", "_i")
    ).select(
        "docID",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        (F.col("_i").cast("long") * frame_stride).alias("byte_offset"),
    )
