"""Streaming release manifest.

A production crawl releases incrementally: each micro-batch of freshly
curated docs folds into the SAME per-shard integrity manifest the batch
release publishes. The manifest aggregation qualifies as a streaming
complete-mode aggregate by construction — every column's fold is
associative and commutative (count/sum/bit_xor/min/max) and the state
is bounded by ``n_shards`` rows regardless of how much data has flowed,
the same "bounded at any input size" argument the md5 sketches make.

One shared aggregation body (``operators.release.manifest_agg``) serves
batch and stream, so the two surfaces cannot drift; the parity test
pins stream-end results == the batch manifest over the same rows.
"""

from pyspark.sql import DataFrame

from ..operators.release import manifest_agg

__all__ = ["streaming_shard_manifest"]


def streaming_shard_manifest(
    stream_docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple = ("lang", "source", "n_chars"),
) -> DataFrame:
    """Complete-mode manifest over a docs stream: after every
    micro-batch the sink holds the manifest of EVERYTHING ingested so
    far (n_shards rows of state — write it with
    ``outputMode('complete')``)."""
    return manifest_agg(stream_docs, n_shards, id_col, text_col, extra_cols)
