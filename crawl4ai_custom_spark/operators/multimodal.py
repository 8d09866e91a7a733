"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The engine treats media payloads exactly like html: opaque ``binary`` columns
with a typed metadata struct, flowing through Arrow-batched stages. The
actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the decode
step is STUBBED — ``decode_stub=True`` produces deterministic fake features
(documented, tested); with real codec libs installed the same mapInPandas
plumbing runs unchanged (swap `_decode_image_stub` for a real decoder).

What IS real and tested here:
- schema & plumbing: (media_id, kind, payload binary, meta struct)
- deterministic metadata sniffing (magic bytes -> format) — native exprs
- batch-shaped feature extraction via mapInPandas (Arrow batches in/out)
- frame sampling logic (which offsets to take) — pure arithmetic
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = {
    "png": b"\x89PNG",
    "jpeg": b"\xff\xd8\xff",
    "gif": b"GIF8",
    "riff": b"RIFF",  # wav/avi containers
    "pdf": b"%PDF",
}


def sniff_format(payload: Column) -> Column:
    """Container format from magic bytes — native substring comparisons."""
    head = F.substring(payload, 1, 4)
    expr = F.lit("unknown")
    for name, magic in MAGIC.items():
        expr = F.when(
            F.substring(payload, 1, len(magic)) == F.lit(magic), F.lit(name)
        ).otherwise(expr)
    return expr


def frame_sample_offsets(duration_s: Column, n_frames: int = 8) -> Column:
    """Deterministic frame-sample timestamps: n evenly spaced offsets."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: (duration_s * (i + F.lit(0.5)) / F.lit(float(n_frames))).cast("double"),
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature", ArrayType(DoubleType())),
        StructField("decoder", StringType()),
    ]
)


def _decode_image_stub(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic fake 'embedding': byte-histogram moments. A real
    deployment replaces this with PIL decode + model features; the Spark
    plumbing (batch shape, schema, partitioning) is identical.

    Raises NotImplementedError for payloads that claim real decoding needs
    (kept explicit so nobody mistakes the stub for a codec)."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
    h = hist.astype(np.float64)
    return h / max(1.0, h.sum())


def extract_media_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """media(media_id long, payload binary) -> FEATURE_SCHEMA rows via
    mapInPandas (the real multimodal hot path shape)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image_stub(p, dim).tolist() for p in pdf["payload"]
            ]
            fmts = []
            for p in pdf["payload"]:
                fmt = "unknown"
                if p:
                    for name, magic in MAGIC.items():
                        if bytes(p[: len(magic)]) == magic:
                            fmt = name
                            break
                fmts.append(fmt)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": fmts,
                    "n_bytes": [len(p) if p else 0 for p in pdf["payload"]],
                    "feature": feats,
                    "decoder": "stub-histogram",
                }
            )

    return media.select("media_id", "payload").mapInPandas(fn, FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Test/bench adapter: treat utf-8 text payloads as opaque media blobs."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )
