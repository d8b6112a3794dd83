"""Multimodal (image/audio/video) column plumbing.

Media arrive as opaque ``binary`` columns with typed metadata — the same
shape as the pages table's ``html`` column. The Spark-side contract
(schemas, Arrow batch flow through ``mapInPandas``, partition sizing) is
real and tested; the actual codecs are STUBBED because this container
ships no image/audio libraries:

* ``decode_stub_features`` — deterministic fake "decode" (seeded stats
  of the raw bytes) standing in for pixel/sample decoding, so the
  pipeline shape is exercised end-to-end,
* ``decode_real`` — raises NotImplementedError with the production
  recipe (PIL/torchvision/librosa inside the same mapInPandas seam).

Batch shape matters at scale: media rows are MBs, so the UDF works in
``mapInPandas`` (iterator of small Arrow batches, bounded memory) and
repartitioning by size-bucket keeps batches even.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MEDIA_SCHEMA", "MEDIA_FEATURES_SCHEMA", "extract_media_features", "decode_real"]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("data", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def _stub_features(data: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-content feature vector:
    per-chunk byte means (NOT a real decode — see decode_real). Kept
    un-rounded so the arithmetic (int sum / len / 255.0) is replayable
    bit-for-bit by a SQL oracle (the driver's q_media_features)."""
    if not data:
        return [0.0] * dim
    chunk = max(1, len(data) // dim)
    out = []
    for i in range(dim):
        part = data[i * chunk : (i + 1) * chunk] or b"\x00"
        out.append(sum(part) / len(part) / 255.0)
    return out


def extract_media_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """media(media_id, kind, data, …) → per-item feature rows via
    mapInPandas (bounded Arrow batches; the real-codec seam)."""

    def _gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["data"].map(lambda b: len(b) if b is not None else 0),
                    "digest": pdf["data"].map(
                        lambda b: hashlib.sha256(bytes(b or b"")).hexdigest()[:16]
                    ),
                    "features": pdf["data"].map(
                        lambda b: _stub_features(bytes(b or b""), dim)
                    ),
                }
            )

    return media.select("media_id", "kind", "data").mapInPandas(
        _gen, schema=MEDIA_FEATURES_SCHEMA
    )


def decode_real(*_args, **_kwargs):
    """Real decode path — unavailable in this container.

    Production recipe: same mapInPandas seam;
    image → PIL.Image.open(io.BytesIO(b)).convert("RGB"), resize,
    channel-mean/CNN features; audio → soundfile/librosa frames;
    video → pyav keyframe sample then image path. Per-executor codec
    initialization cached in the generator closure.
    """
    raise NotImplementedError("media codecs not available in this container")
