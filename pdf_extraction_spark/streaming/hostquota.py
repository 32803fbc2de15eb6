"""Streaming per-host admission quota — the crawl-ingest budget gate
over a live page stream (the streaming sibling of
operators/hostcap.py's batch cap).

Semantics: admit at most ``cap`` pages per host, FIRST-K BY ARRIVAL
KEY — within a micro-batch rows are sorted by the deterministic
(ts_us, url) key, and the admitted count per host persists across
batches as ONE int64 of state. Where the batch host_cap ranks the
whole corpus and keeps the best K, the streaming quota answers the
frontier's question — "may I fetch/ingest this page NOW?" — without
ever buffering per-host history.

In-order contract (the streaming_funnel discipline, documented): for
per-host delivery in non-decreasing (ts_us, url) order across
micro-batches, the admitted SET is exactly the batch first-K — pinned
by the stream-vs-batch parity test. Out-of-order replays should use
the batch operator.

Scale shape: one host-keyed stateful shuffle; state is one int64 per
host (no page buffer); updates stream through applyInPandasWithState
in Arrow batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

QUOTA_STATE_SCHEMA = "n long"
QUOTA_OUTPUT_SCHEMA = "host string, url string, admitted_no long"


def _make_update(cap: int):
    def update(key, pdfs, state: GroupState):
        (host,) = key
        if state.hasTimedOut:  # pragma: no cover - timeout path
            state.remove()
            return
        (n,) = state.get if state.exists else (0,)
        rows = []
        for pdf in pdfs:
            ts_us = (
                pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64")
                // 1000
            )
            ok = pdf["ts"].notna() & pdf["url"].notna()
            rows.extend(zip(ts_us[ok].tolist(), pdf["url"][ok].tolist()))
        rows.sort()
        take = rows[: max(0, cap - n)]
        out = pd.DataFrame(
            {
                "host": [host] * len(take),
                "url": [u for _, u in take],
                "admitted_no": [n + i + 1 for i in range(len(take))],
            }
        )
        state.update((n + len(take),))
        yield out

    return update


def streaming_host_quota(
    pages_stream: DataFrame,
    cap: int,
    host_col: str = "host",
    url_col: str = "url",
    ts_col: str = "ts",
) -> DataFrame:
    """(host, url, admitted_no) per admitted page — at most ``cap``
    admissions per host over the stream's lifetime, first-K by the
    deterministic (ts, url) arrival key."""
    if cap < 0:
        raise ValueError("cap must be >= 0")
    relevant = pages_stream.filter(
        F.col(host_col).isNotNull()
    ).select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("ts"),
    )
    return relevant.groupBy("host").applyInPandasWithState(
        _make_update(cap),
        outputStructType=QUOTA_OUTPUT_SCHEMA,
        stateStructType=QUOTA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_first_k(
    pages: DataFrame,
    cap: int,
    host_col: str = "host",
    url_col: str = "url",
    ts_col: str = "ts",
) -> DataFrame:
    """The batch twin of the streaming quota: first-``cap`` rows per
    host by (ts_us, url) — the frame the parity test compares against
    (bounded buffer via the hostcap slice device, no corpus window)."""
    base = pages.filter(
        F.col(host_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(url_col).isNotNull()
    ).select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
    )
    picked = base.groupBy("host").agg(
        F.slice(
            F.array_sort(
                F.collect_list(F.struct(F.col("ts_us"), F.col("url")))
            ),
            1,
            cap,
        ).alias("take")
    )
    return picked.select(
        "host",
        F.posexplode("take").alias("i", "e"),
    ).select(
        "host",
        F.col("e.url").alias("url"),
        (F.col("i") + 1).cast("long").alias("admitted_no"),
    )
