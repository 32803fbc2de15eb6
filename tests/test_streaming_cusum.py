"""Streaming CUSUM (streaming/cusum.py): stream-vs-batch parity over a
real file-source stream (in-order delivery per entity), multi-batch
state replay through the update function, and alarm continuity across
batch boundaries."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.forensics import cusum
from pdf_extraction_spark.streaming.cusum import (
    _make_update,
    streaming_cusum,
)

ARGS = dict(target=50, allowance=10, threshold=300)


def _events(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    return ev.select(
        F.col("user_id").alias("grp"),
        F.col("event_id").alias("eid"),
        F.col("ts"),
        F.when(
            F.col("value").isNotNull()
            & ~F.isnan("value")
            & (F.abs(F.col("value")) < F.lit(1e15)),
            F.round(F.col("value")).cast("long"),
        ).alias("v"),
    )


class TestStreamBatchParity:
    def test_final_state_matches_batch(self, spark, tmp_path):
        ev = _events(spark)
        d = str(tmp_path / "events")
        # one file per entity-ish slice, ordered within: availableNow
        # processes files in order; per-entity rows arrive in ts order
        ev.orderBy("ts", "eid").coalesce(1).write.parquet(d)
        stream = spark.readStream.schema(ev.schema).parquet(d)
        q = (
            streaming_cusum(stream, **ARGS)
            .writeStream.format("memory")
            .queryName("scusum")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # last update per entity is the final verdict
        got = {
            r.grp: (
                r.n_events, r.max_s_plus, r.max_s_minus, r.n_alarms,
                r.first_alarm_us,
            )
            for r in spark.sql(
                "SELECT * FROM (SELECT *, row_number() OVER ("
                "PARTITION BY grp ORDER BY n_events DESC) rn FROM scusum) "
                "WHERE rn = 1"
            ).collect()
        }
        want = {
            r.grp: (
                r.n_events, r.max_s_plus, r.max_s_minus, r.n_alarms,
                None
                if r.first_alarm_ts is None
                else int(r.first_alarm_ts.timestamp() * 1_000_000),
            )
            for r in cusum(
                _events(spark), "v", "grp", "ts", "eid", **ARGS
            ).collect()
        }
        assert got == want and got


class _FakeState:
    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):  # pragma: no cover
        self._v = None


class TestIncrementalState:
    def _pdf(self, rows):
        return pd.DataFrame(
            {
                "ts": pd.to_datetime([t for t, _, _ in rows], unit="s"),
                "eid": [e for _, e, _ in rows],
                "v": [v for _, _, v in rows],
            }
        )

    def test_multi_batch_equals_one_batch(self):
        upd = _make_update(**ARGS)
        rows = [(1000 + i, i, 50 + (120 if 10 <= i < 16 else 0)) for i in range(25)]
        one = _FakeState()
        [out_one] = list(upd((7,), [self._pdf(rows)], one))
        split = _FakeState()
        list(upd((7,), [self._pdf(rows[:8])], split))
        list(upd((7,), [self._pdf(rows[8:17])], split))
        [out_split] = list(upd((7,), [self._pdf(rows[17:])], split))
        assert one.get == split.get
        assert out_one.iloc[-1].tolist() == out_split.iloc[-1].tolist()
        # the injected level shift actually alarmed
        assert one.get[4] > 0

    def test_alarm_first_ts_stable_across_batches(self):
        upd = _make_update(**ARGS)
        shift = [(2000 + i, i, 200) for i in range(10)]
        calm = [(2100 + i, 100 + i, 50) for i in range(5)]
        st = _FakeState()
        list(upd((1,), [self._pdf(shift)], st))
        [out] = list(upd((1,), [self._pdf(calm)], st))
        # first alarm was in batch 1 and must not move
        assert out["first_alarm_us"][0] == st.get[5]
        assert st.get[5] < 2100 * 1_000_000
