"""Deterministic embedder (X1 shape) — seeded hash random projection.

The reference batches OpenAI calls (embeddings_generator.py:100-132).
The engine keeps the same operator shape — Arrow batches through
``mapInPandas``, quality gate *before* the expensive stage — but the
embedding function is a deterministic local model: token hash → seeded
random projection row → mean-pooled, L2-normalized. No network, fully
reproducible, pluggable (swap ``embed_batch`` for a real client).
"""

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.quality import QUALITY_GATE
from ..kernels.textstats import hash_bytes, tokenize

DIM = 64


from functools import lru_cache


@lru_cache(maxsize=65536)
def _token_vector_cached(tok: str, dim: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(hash_bytes(tok.encode("utf-8"), seed) % (2**32))
    return rng.randn(dim)


def _token_vector(tok: str, dim: int, seed: int) -> np.ndarray:
    # RandomState construction dominates embedding cost; natural-language
    # token distributions are Zipfian, so a vocab cache hits constantly
    return _token_vector_cached(tok, dim, seed)


def embed_text(text: str, dim: int = DIM, seed: int = 42) -> list:
    toks = tokenize((text or "").lower())
    if not toks:
        return [0.0] * dim
    m = np.stack([_token_vector(t, dim, seed) for t in toks])
    v = m.mean(axis=0)
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(float).tolist()


def embed_documents(
    df: DataFrame,
    text_col: str = "content",
    quality_col: str = "quality_score",
    min_score: float = QUALITY_GATE,
    dim: int = DIM,
    seed: int = 42,
) -> DataFrame:
    """P7 gate (score ≥ 3.5 *before* embedding — the filter sits below
    the UDF in the plan, so the expensive stage only sees survivors)
    → embedding column."""
    gated = df.filter(F.col(quality_col) >= min_score) if quality_col in df.columns else df

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in gated.schema.fields)
    schema += ", embedding array<double>"

    def batches(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf["embedding"] = [embed_text(t, dim, seed) for t in pdf[text_col]]
            yield pdf

    return gated.mapInPandas(batches, schema=schema)
