"""Deterministic hash-based text embeddings.

Stand-in for the reference's SentenceTransformer bi-encoder
(bi_encoder.py:77-127 — CUDA model, not available here; SURVEY.md §2.12
prescribes a deterministic hash embedding for the synthetic corpus).
Each dimension is a scaled xxhash64 of (text, dim_index) — fully
JVM-side, reproducible everywhere, unit-normalizable. The UDF seam for a
real model (iterator-of-batches pandas UDF with a per-executor model
cache) is documented in the docstring of :func:`model_embedding_stub`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from plwordnet_spark.vectors.pooling import l2_normalize_expr

__all__ = ["hash_embedding", "model_embedding_stub"]


def hash_embedding(text_col, dim: int = 32, normalize: bool = True):
    """Column expression: string → array<double> of length ``dim``."""
    comps = [
        (F.xxhash64(text_col, F.lit(i)).cast("double") / F.lit(float(2**63)))
        for i in range(dim)
    ]
    vec = F.array(*comps)
    return l2_normalize_expr(vec) if normalize else vec


def model_embedding_stub(*_args, **_kwargs):
    """Placeholder for a real encoder.

    Production shape (reference parity, bi_encoder.py:56-127): an
    ``Iterator[pd.Series] -> Iterator[pd.Series]`` pandas UDF that loads
    the model once per executor process, encodes each Arrow batch with
    the model's native batching, truncates inputs to 400 chars
    (bi_encoder.py:104-105), and returns ``array<float>`` columns. The
    container ships no torch/sentence-transformers, so this raises.
    """
    raise NotImplementedError(
        "model-backed embeddings require torch/sentence-transformers; "
        "use hash_embedding for deterministic vectors"
    )
