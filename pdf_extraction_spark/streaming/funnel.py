"""Streaming funnel depths — the windowFunnel operator over a live
event stream (the streaming sibling of operators/funnel.py).

State per user is the SAME int64 accumulator the batch fold uses
(``chain_start_micros·16 + depth`` — depth in the low bits), so the
incremental update IS the batch fold applied to the new events: for
in-order delivery the streaming answer is bit-identical to running the
batch operator over everything seen so far (pinned by the
stream-vs-batch parity test).

Delivery-order contract (documented, the standard caveat for
sequential-fold streaming operators): the greedy chain is
order-sensitive, so events must arrive per-user in non-decreasing
encoded order ACROSS micro-batches (within a batch they are sorted
here). A late event older than the chain's current position cannot
retro-advance the chain — exactly as ClickHouse's windowFunnel behaves
over an append log. Use the batch operator for out-of-order replays.

Scale shape: one user-keyed stateful shuffle; state is ONE int64 per
user (bounded, no event buffer); updates stream through
applyInPandasWithState in Arrow batches.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.funnel import _B, _validate

FUNNEL_STATE_SCHEMA = "acc long"
FUNNEL_OUTPUT_SCHEMA = "user_id long, depth long"


def _fold_encoded(acc: int, encs, win16: int | None) -> int:
    """The batch fold (operators/funnel.py) on plain ints."""
    for x in encs:
        d = acc % _B
        xi = x % _B
        if xi == d + 1 and (
            d == 0 or win16 is None or (x - xi) - (acc - d) <= win16
        ):
            acc = ((x - xi) if d == 0 else (acc - d)) + d + 1
    return acc


def _make_update(steps: Sequence[str], win16: int | None):
    idx = {s: i for i, s in enumerate(steps, start=1)}

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover - timeout path
            state.remove()
            return
        (acc,) = state.get if state.exists else (0,)
        encs = []
        for pdf in pdfs:
            # normalize to ns first: Arrow may hand pandas datetime64[us]
            # (int64 would then be micros and the //1000 wrong)
            ts_us = (
                pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64")
                // 1000
            )
            step = pdf["event_type"].map(idx)
            ok = step.notna() & pdf["ts"].notna()
            encs.extend(
                (ts_us[ok] * _B + step[ok].astype("int64")).tolist()
            )
        encs.sort()
        acc = _fold_encoded(int(acc), encs, win16)
        state.update((acc,))
        yield pd.DataFrame(
            {"user_id": [user_id], "depth": [acc % _B]}
        )

    return update


def streaming_funnel_depths(
    events_stream: DataFrame,
    steps: Sequence[str],
    window_s: float | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(user_id, depth) per update — each user's greedy funnel depth
    maintained across micro-batches with one int64 of state."""
    _validate(steps, window_s)
    win16 = None if window_s is None else int(round(window_s * 1_000_000)) * _B
    relevant = events_stream.filter(
        F.col(type_col).isin(list(steps)) & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("event_type"),
    )
    return relevant.groupBy("user_id").applyInPandasWithState(
        _make_update(steps, win16),
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
