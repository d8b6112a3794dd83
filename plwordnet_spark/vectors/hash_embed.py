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

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from plwordnet_spark.vectors.pooling import l2_normalize_expr

__all__ = ["hash_embedding", "make_encoder_udf", "model_embedding_stub"]

# worker-process-global encoder cache: the model loads ONCE per Python
# worker process (Spark reuses workers via spark.python.worker.reuse),
# not once per Arrow batch — the reference's lazy device-pinned model
# (bi_encoder.py:56-76) translated to executor-side lifetime
_ENCODER_CACHE: dict = {}


def hash_embedding(text_col, dim: int = 32, normalize: bool = True):
    """Column expression: string → array<double> of length ``dim``."""
    comps = [
        (F.xxhash64(text_col, F.lit(i)).cast("double") / F.lit(float(2**63)))
        for i in range(dim)
    ]
    vec = F.array(*comps)
    return l2_normalize_expr(vec) if normalize else vec


def make_encoder_udf(
    encoder_factory: Callable[[], Callable],
    cache_key: str,
    truncate_chars: int = 400,
    dtype: str = "float",
):
    """Model-backed embedding UDF (reference bi_encoder.py:56-127).

    ``encoder_factory``: zero-arg callable returning an encoder
    ``list[str] -> sequence of dim-length vectors`` — e.g.
    ``lambda: SentenceTransformer(path).encode`` in production; any
    deterministic fake in tests. The factory (not the model) rides the
    UDF closure; each Python worker process calls it at most once and
    caches the encoder under ``cache_key`` (per-executor single load).

    Inputs are truncated to ``truncate_chars`` before encoding
    (bi_encoder.py:104-105: max_len=400); nulls encode as "". Batching
    is Arrow's (spark.sql.execution.arrow.maxRecordsPerBatch), so the
    model sees bounded batches regardless of partition size.
    """
    np_dtype = {"float": np.float32, "double": np.float64}[dtype]

    @F.pandas_udf(f"array<{dtype}>")
    def encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # resolve the cache through the worker's module singleton at call
        # time: referencing the module global directly would make
        # cloudpickle capture the dict BY VALUE into the task closure —
        # a fresh empty cache per task, i.e. one model load per task
        from plwordnet_spark.vectors import hash_embed as _mod

        enc = _mod._ENCODER_CACHE.get(cache_key)
        if enc is None:
            enc = encoder_factory()
            _mod._ENCODER_CACHE[cache_key] = enc
        for s in batches:
            texts = s.fillna("").astype(str).str.slice(0, truncate_chars).tolist()
            vecs = np.asarray(enc(texts), dtype=np_dtype)
            yield pd.Series(list(vecs))

    return encode


def model_embedding_stub(*_args, **_kwargs):
    """Placeholder kept for API compatibility: the real seam is
    :func:`make_encoder_udf` (inject your model via ``encoder_factory``).
    This raises because the container ships no torch/sentence-transformers
    to construct a default factory from.
    """
    raise NotImplementedError(
        "no default model available: pass your own encoder to "
        "make_encoder_udf(lambda: SentenceTransformer(...).encode, ...) "
        "or use hash_embedding for deterministic vectors"
    )
