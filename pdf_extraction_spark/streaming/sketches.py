"""Streaming md5-register sketches.

The HLL and CMS sketch aggregations qualify as streaming complete-mode
aggregates by construction — HLL folds max(rank) per register, CMS
folds integer counts per cell, both associative + commutative, and the
state is bounded by the SKETCH size (16^p_hex registers / depth·width
cells) regardless of how much data has flowed: the same "bounded at any
input size" argument the batch module makes for broadcastability. That
is the whole point of sketching a crawl stream — distinct-URL counts
and heavy-hitter tables that update per micro-batch without the state
store ever holding per-key state.

One shared aggregation body (``operators.sketches.hll_sketch`` /
``cms_sketch``) serves batch and stream so the two surfaces cannot
drift; the parity tests pin stream-end state == the batch sketch over
the same rows, through the state store.

Estimation (``hll_estimate`` / ``cms_heavy_hitters``) is a SECOND
aggregate over the sketch, which complete-mode streaming cannot chain —
by design it runs as a batch step over the sink's sketch rows (the
sketch is metadata-sized, so that step costs nothing and can run on
the driver's cadence, not the stream's).
"""

from pyspark.sql import Column, DataFrame

from ..operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_P_HEX,
    cms_sketch,
    hll_sketch,
)

__all__ = ["streaming_hll_sketch", "streaming_cms_sketch"]


def streaming_hll_sketch(
    stream_df: DataFrame, value: Column, p_hex: int = HLL_P_HEX
) -> DataFrame:
    """Complete-mode HLL sketch over a stream: after every micro-batch
    the sink holds the (register, max_rank) sketch of EVERYTHING
    ingested so far — ≤ 16^p_hex rows of state at any stream length.
    Write with ``outputMode('complete')``; estimate with the batch
    ``hll_estimate`` over the sink."""
    return hll_sketch(stream_df, value, p_hex)


def streaming_cms_sketch(
    stream_df: DataFrame,
    value: Column,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Complete-mode Count-Min sketch over a stream: depth·width rows
    of state at any stream length; point queries / heavy-hitter scans
    run the batch helpers over the sink."""
    return cms_sketch(stream_df, value, depth, width)
