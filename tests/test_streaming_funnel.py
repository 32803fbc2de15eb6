"""Streaming funnel (streaming/funnel.py): stream-vs-batch parity over
the events table, incremental multi-batch state via a direct update
replay, and the encoded-fold equivalence."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.funnel import _B, funnel_depths
from pdf_extraction_spark.streaming.funnel import (
    _fold_encoded,
    _make_update,
    streaming_funnel_depths,
)

STEPS = ["view", "click", "signup", "purchase"]
WIN = 7 * 86400.0


class TestStreamBatchParity:
    def test_stream_matches_batch(self, spark, tmp_path):
        events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        stream_dir = str(tmp_path / "ev_funnel")
        events.write.parquet(stream_dir)
        stream = spark.readStream.schema(events.schema).parquet(stream_dir)
        q = (
            streaming_funnel_depths(stream, STEPS, window_s=WIN)
            .writeStream.format("memory")
            .queryName("sfunnel")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r.user_id: r.depth
            for r in spark.sql(
                "SELECT user_id, max(depth) AS depth FROM sfunnel GROUP BY user_id"
            ).collect()
        }
        expect = {
            r["user_id"]: r["depth"]
            for r in funnel_depths(events, STEPS, window_s=WIN).collect()
        }
        assert got == expect and got


class _FakeState:
    """Minimal GroupState stand-in for driving the update fn directly."""

    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)
        self.exists = True

    def remove(self):  # pragma: no cover
        self.exists = False


class TestIncrementalState:
    def test_multi_batch_equals_one_shot(self, spark):
        """Feeding time-ordered micro-batches through the update fn
        must land on the same accumulator as one batch fold — the
        incremental-fold contract."""
        t0 = dt.datetime(2024, 1, 1)
        rows = []
        for i in range(40):
            rows.append(
                (t0 + dt.timedelta(hours=i), STEPS[(i * 3) % 4])
            )
        rows.append((t0 + dt.timedelta(hours=41), "noise"))

        update = _make_update(STEPS, int(WIN * 1_000_000) * _B)

        def run(batches):
            st = _FakeState()
            out = None
            for b in batches:
                pdf = pd.DataFrame(
                    {"ts": [r[0] for r in b], "event_type": [r[1] for r in b]}
                )
                pdf = pdf[pdf["event_type"].isin(STEPS)]
                for out in update((7,), [pdf], st):
                    pass
            return st.get[0], out["depth"].iloc[0]

        one_acc, one_depth = run([rows])
        # three time-ordered micro-batches
        multi_acc, multi_depth = run([rows[:15], rows[15:30], rows[30:]])
        assert one_acc == multi_acc and one_depth == multi_depth

    def test_fold_matches_batch_operator(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0 + dt.timedelta(minutes=7 * i), STEPS[(i * 2) % 4])
            for i in range(30)
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp_ntz, event_type string"
        )
        batch = funnel_depths(df, STEPS, window_s=WIN).collect()[0]["depth"]
        idx = {s: i for i, s in enumerate(STEPS, start=1)}
        encs = sorted(
            int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
            * _B
            + idx[t]
            for (_, ts, t) in rows
            if t in idx
        )
        acc = _fold_encoded(0, encs, int(WIN * 1_000_000) * _B)
        assert acc % _B == batch
