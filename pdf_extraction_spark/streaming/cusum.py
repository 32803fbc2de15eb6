"""Streaming CUSUM change detection — Page's (1954) level-shift
detector over a live per-entity event stream (the streaming sibling of
operators/forensics.py:cusum).

State per entity is the RECURSION'S OWN accumulator — exactly the
tuple (s_plus, s_minus, max_s_plus, max_s_minus, n_alarms,
first_alarm_us, n_events), so the incremental update IS the batch
recursion applied to the new events: for per-entity delivery in
non-decreasing (ts, id) order across micro-batches, the stream's
final report equals the batch operator's row bit-for-bit (pinned by
the parity test through the state store). Out-of-order replays should
use the batch operator (the streaming_funnel delivery contract,
documented there).

Output mode is UPDATE: each micro-batch emits the entity's refreshed
trajectory/alarm summary, so a monitoring sink always holds the
current verdict per host/user. State is one fixed-width tuple per
entity — no event buffer, the hostquota bound.

Scale shape: one entity-keyed stateful shuffle; updates stream through
applyInPandasWithState in Arrow batches; within a batch the rows are
sorted by the deterministic (ts, id) key before the fold.

Contract difference vs the batch operator: the batch cusum treats a
NULL group as a real stream; THIS path drops NULL-group rows up front
(``group_col.isNotNull()``) because applyInPandasWithState keys state
by the group value and a NULL key is not a usable state-store key.
The bit-for-bit parity claim therefore covers non-NULL entities only —
route NULL-entity events to the batch operator (or coalesce them to a
sentinel key before the stream) if that stream matters.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CUSUM_STATE_SCHEMA = (
    "sp long, sm long, msp long, msm long, n_alarms long, "
    "first_us long, n_events long"
)
CUSUM_OUTPUT_SCHEMA = (
    "grp long, n_events long, max_s_plus long, max_s_minus long, "
    "n_alarms long, first_alarm_us long"
)


def _make_update(target: int, allowance: int, threshold: int):
    def update(key, pdfs, state: GroupState):
        (grp,) = key
        if state.hasTimedOut:  # pragma: no cover - timeout path
            state.remove()
            return
        if state.exists:
            sp, sm, msp, msm, n_alarms, first_us, n_events = state.get
        else:
            sp = sm = msp = msm = n_alarms = n_events = 0
            first_us = None
        rows = []
        for pdf in pdfs:
            ts_us = (
                pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64")
                // 1000
            )
            ok = pdf["ts"].notna() & pdf["v"].notna()
            rows.extend(
                zip(
                    ts_us[ok].tolist(),
                    pdf["eid"][ok].tolist(),
                    pdf["v"][ok].astype("int64").tolist(),
                )
            )
        rows.sort()
        for ts_us, _, v in rows:
            sp = max(0, sp + (v - target - allowance))
            sm = max(0, sm + (target - allowance - v))
            msp, msm = max(msp, sp), max(msm, sm)
            n_events += 1
            if threshold > 0 and (sp > threshold or sm > threshold):
                n_alarms += 1
                if first_us is None:
                    first_us = ts_us
        state.update((sp, sm, msp, msm, n_alarms, first_us, n_events))
        yield pd.DataFrame(
            {
                "grp": [grp],
                "n_events": [n_events],
                "max_s_plus": [msp],
                "max_s_minus": [msm],
                "n_alarms": [n_alarms],
                "first_alarm_us": [first_us],
            }
        )

    return update


def streaming_cusum(
    events_stream: DataFrame,
    target: int,
    allowance: int = 0,
    threshold: int = 0,
    value_col: str = "v",
    group_col: str = "grp",
    ts_col: str = "ts",
    id_col: str = "eid",
) -> DataFrame:
    """(grp, n_events, max_s_plus, max_s_minus, n_alarms,
    first_alarm_us) per entity, refreshed every micro-batch."""
    relevant = events_stream.filter(F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("long").alias("v"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("eid"),
    )
    return relevant.groupBy("grp").applyInPandasWithState(
        _make_update(target, allowance, threshold),
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
