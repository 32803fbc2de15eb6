"""Ordered funnel analysis (operators/funnel.py): hand-built event
sequences covering every chain rule (ordering, greedy first-entry,
window expiry, out-of-order steps), the int64 encoding contract, the
conversion table, and partition invariance."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.funnel import (
    funnel_conversion,
    funnel_depths,
)

STEPS = ["view", "click", "buy"]


def _events(spark, rows):
    """rows: (user_id, iso_ts, event_type)"""
    data = [
        (u, datetime.fromisoformat(ts), t) for (u, ts, t) in rows
    ]
    return spark.createDataFrame(
        data, "user_id long, ts timestamp_ntz, event_type string"
    )


class TestDepths:
    def test_full_chain(self, spark):
        e = _events(
            spark,
            [
                (1, "2024-01-01T00:00:00", "view"),
                (1, "2024-01-01T00:01:00", "click"),
                (1, "2024-01-01T00:02:00", "buy"),
            ],
        )
        assert funnel_depths(e, STEPS).collect()[0]["depth"] == 3

    def test_order_matters(self, spark):
        # click before view → chain only reaches view (depth 1)
        e = _events(
            spark,
            [
                (1, "2024-01-01T00:00:00", "click"),
                (1, "2024-01-01T00:01:00", "view"),
            ],
        )
        assert funnel_depths(e, STEPS).collect()[0]["depth"] == 1

    def test_skipping_a_step_blocks(self, spark):
        e = _events(
            spark,
            [
                (1, "2024-01-01T00:00:00", "view"),
                (1, "2024-01-01T00:01:00", "buy"),
            ],
        )
        assert funnel_depths(e, STEPS).collect()[0]["depth"] == 1

    def test_window_expiry(self, spark):
        # click lands 2h after the chain-opening view; 1h window blocks
        rows = [
            (1, "2024-01-01T00:00:00", "view"),
            (1, "2024-01-01T02:00:00", "click"),
        ]
        e = _events(spark, rows)
        assert funnel_depths(e, STEPS, window_s=3600).collect()[0]["depth"] == 1
        assert (
            funnel_depths(e, STEPS, window_s=3 * 3600).collect()[0]["depth"] == 2
        )

    def test_greedy_first_view_caveat(self, spark):
        # the documented ClickHouse caveat: the chain opens at the FIRST
        # view; a later view that would beat the window is not revisited
        e = _events(
            spark,
            [
                (1, "2024-01-01T00:00:00", "view"),
                (1, "2024-01-01T03:00:00", "view"),
                (1, "2024-01-01T03:30:00", "click"),
            ],
        )
        assert funnel_depths(e, STEPS, window_s=3600).collect()[0]["depth"] == 1

    def test_window_anchored_at_step1(self, spark):
        # buy is within 1h of click but 1.5h after the opening view →
        # blocked: the window is anchored at step 1, not the last step
        e = _events(
            spark,
            [
                (1, "2024-01-01T00:00:00", "view"),
                (1, "2024-01-01T00:50:00", "click"),
                (1, "2024-01-01T01:30:00", "buy"),
            ],
        )
        assert funnel_depths(e, STEPS, window_s=3600).collect()[0]["depth"] == 2

    def test_irrelevant_users_absent(self, spark):
        e = _events(spark, [(1, "2024-01-01T00:00:00", "other")])
        assert funnel_depths(e, STEPS).count() == 0

    def test_validation(self, spark):
        e = _events(spark, [(1, "2024-01-01T00:00:00", "view")])
        with pytest.raises(ValueError):
            funnel_depths(e, ["a", "a"])
        with pytest.raises(ValueError):
            funnel_depths(e, ["s%d" % i for i in range(10)])
        with pytest.raises(ValueError):
            funnel_depths(e, STEPS, window_s=0)

    def test_same_timestamp_tiebreak(self, spark):
        # view and click share a microsecond: encoding sorts by step
        # index, so the chain still advances view → click
        e = _events(
            spark,
            [
                (1, "2024-01-01T00:00:00", "click"),
                (1, "2024-01-01T00:00:00", "view"),
            ],
        )
        assert funnel_depths(e, STEPS).collect()[0]["depth"] == 2


class TestConversion:
    def test_table(self, spark):
        e = _events(
            spark,
            [
                (1, "2024-01-01T00:00:00", "view"),
                (1, "2024-01-01T00:01:00", "click"),
                (1, "2024-01-01T00:02:00", "buy"),
                (2, "2024-01-01T00:00:00", "view"),
                (2, "2024-01-01T00:01:00", "click"),
                (3, "2024-01-01T00:00:00", "view"),
                (4, "2024-01-01T00:00:00", "click"),  # never enters
            ],
        )
        rows = {r["step"]: r for r in funnel_conversion(e, STEPS).collect()}
        assert [rows[s]["users"] for s in (1, 2, 3)] == [3, 2, 1]
        assert rows[1]["conv_ppm"] == 1_000_000
        assert rows[2]["conv_ppm"] == 2 * 1_000_000 // 3
        assert rows[3]["conv_ppm"] == 1_000_000 // 3
        assert rows[2]["step_type"] == "click"

    def test_empty_funnel_all_zero(self, spark):
        e = _events(spark, [(1, "2024-01-01T00:00:00", "other")])
        rows = funnel_conversion(e, STEPS).collect()
        assert len(rows) == 3
        assert all(r["users"] == 0 and r["conv_ppm"] == 0 for r in rows)

    def test_partition_invariance(self, spark):
        rows = []
        types = ["view", "click", "buy", "noise"]
        for u in range(25):
            for j in range(8):
                rows.append(
                    (
                        u,
                        "2024-01-%02dT%02d:00:00" % (1 + (u + j) % 27, j),
                        types[(u * 3 + j) % 4],
                    )
                )
        e = _events(spark, rows)
        one = sorted(
            tuple(r)
            for r in funnel_depths(e.coalesce(1), STEPS, window_s=86400).collect()
        )
        many = sorted(
            tuple(r)
            for r in funnel_depths(
                e.repartition(11), STEPS, window_s=86400
            ).collect()
        )
        assert one == many and one
