"""Streaming per-host admission quota (streaming/hostquota.py):
stream-vs-batch parity over a real file-source stream, multi-batch
state replay through the update function, and cap edge cases."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.streaming.hostquota import (
    batch_first_k,
    streaming_host_quota,
    _make_update,
)

CAP = 3


def _pages(spark):
    # derive a deterministic paged stream from the events table:
    # host = user bucket, url = event id
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    return ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 7).cast("string")).alias("host"),
        F.concat(F.lit("u"), F.col("event_id").cast("string")).alias("url"),
        F.col("ts"),
    )


class TestStreamBatchParity:
    def test_stream_matches_batch_first_k(self, spark, tmp_path):
        pages = _pages(spark)
        d = str(tmp_path / "pages")
        pages.write.parquet(d)
        stream = spark.readStream.schema(pages.schema).parquet(d)
        q = (
            streaming_host_quota(stream, CAP)
            .writeStream.format("memory")
            .queryName("squota")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            tuple(r)
            for r in spark.sql(
                "SELECT host, url, admitted_no FROM squota"
            ).collect()
        )
        expect = sorted(tuple(r) for r in batch_first_k(pages, CAP).collect())
        assert got == expect and got


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
    def _batch(self, rows):
        return pd.DataFrame(
            {
                "host": ["h"] * len(rows),
                "url": [u for _, u in rows],
                "ts": pd.to_datetime([t for t, _ in rows], unit="s"),
            }
        )

    def test_multi_batch_equals_one_shot(self):
        update = _make_update(CAP)
        rows = [(10, "a"), (20, "b"), (30, "c"), (40, "d"), (50, "e")]

        def run(batches):
            st = _FakeState()
            out = []
            for b in batches:
                for df in update(("h",), [self._batch(b)], st):
                    out.extend(df.itertuples(index=False))
            return [(r.url, r.admitted_no) for r in out]

        one = run([rows])
        split = run([rows[:2], rows[2:4], rows[4:]])
        assert one == split == [("a", 1), ("b", 2), ("c", 3)]

    def test_cap_zero_admits_nothing(self):
        update = _make_update(0)
        st = _FakeState()
        out = list(update(("h",), [self._batch([(1, "a")])], st))
        assert sum(len(df) for df in out) == 0

    def test_within_batch_order_is_ts_then_url(self):
        update = _make_update(2)
        st = _FakeState()
        batch = self._batch([(10, "z"), (10, "a"), (5, "m")])
        (df,) = update(("h",), [batch], st)
        assert list(df["url"]) == ["m", "a"]


class TestBatchTwin:
    def test_cap_bounds_and_order(self, spark):
        rows = [("h1", f"u{i}", i) for i in range(5)] + [("h2", "x", 1)]
        df = spark.createDataFrame(rows, "host string, url string, sec long").select(
            "host", "url", F.col("sec").cast("timestamp").alias("ts")
        )
        out = batch_first_k(df, 2).collect()
        byh = {}
        for r in out:
            byh.setdefault(r.host, []).append((r.url, r.admitted_no))
        assert byh["h1"] == [("u0", 1), ("u1", 2)]
        assert byh["h2"] == [("x", 1)]
