"""Data forensics (operators/forensics.py): bot timing regularity —
cron-uniform gaps read cv 0, Poisson-ish spread reads cv ≈ 1,
zero-gap bursts undefined — and Benford first-digit exactness with a
hand-checked chi-square term; partition invariance for both."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.forensics import (
    BENFORD_P,
    benford_digits,
    bot_regularity,
)

T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")


class TestBotRegularity:
    def test_uniform_timer_is_bot(self, spark):
        rows = [(1, T0 + dt.timedelta(seconds=60 * i)) for i in range(10)]
        r = bot_regularity(_events(spark, rows)).collect()[0]
        assert r["cv"] == 0.0 and bool(r["is_bot"])
        assert r["n_gaps"] == 9 and r["sum_gap_s"] == 9 * 60

    def test_spread_gaps_not_bot(self, spark):
        gaps = [1, 600, 5, 3000, 30, 1200, 2, 7000, 90]
        t, rows = T0, [(1, T0)]
        for g in gaps:
            t = t + dt.timedelta(seconds=g)
            rows.append((1, t))
        r = bot_regularity(_events(spark, rows)).collect()[0]
        assert not bool(r["is_bot"]) and r["cv"] > 0.5
        # the exact integer identity
        n, s1 = len(gaps), sum(gaps)
        s2 = sum(g * g for g in gaps)
        assert r["cv"] == round(math.sqrt(n * s2 - s1 * s1) / s1, 6)

    def test_same_instant_burst_undefined(self, spark):
        rows = [(1, T0)] * 8
        r = bot_regularity(_events(spark, rows)).collect()[0]
        assert r["cv"] is None and r["is_bot"] is None

    def test_min_events_gate(self, spark):
        rows = [(1, T0 + dt.timedelta(seconds=i)) for i in range(3)]
        assert bot_regularity(_events(spark, rows), min_events=5).count() == 0

    def test_partition_invariance(self, spark):
        rows = [
            (i % 7, T0 + dt.timedelta(seconds=i * 37 + (i % 5) * 11))
            for i in range(200)
        ]
        e = _events(spark, rows)
        one = sorted(tuple(r) for r in bot_regularity(e.coalesce(1)).collect())
        many = sorted(
            tuple(r) for r in bot_regularity(e.repartition(9)).collect()
        )
        assert one == many and one


class TestBenford:
    def _vals(self, spark, vals):
        return spark.createDataFrame([(v,) for v in vals], "n long")

    def test_digits_from_string_exact(self, spark):
        vals = [1, 19, 100, 999, 2, 20, 3000, 9, 90, 0, -5, None]
        rows = {
            r["digit"]: r["n_obs"]
            for r in benford_digits(self._vals(spark, vals), "n").collect()
        }
        assert rows == {1: 3, 2: 2, 3: 1, 9: 3}  # 0/-5/None excluded

    def test_chi2_hand_check(self, spark):
        vals = [1] * 30 + [2] * 18 + [3] * 12  # n = 60
        rows = {
            r["digit"]: r
            for r in benford_digits(self._vals(spark, vals), "n").collect()
        }
        exp1 = 60 * BENFORD_P[0]
        assert rows[1]["chi2_term"] == round((30 - exp1) ** 2 / exp1, 6)
        assert rows[1]["benford_ppm"] == int(BENFORD_P[0] * 1_000_000)
        assert rows[1]["obs_ppm"] == 30 * 1_000_000 // 60

    def test_partition_invariance(self, spark):
        vals = [(i * 37 + 1) % 9973 + 1 for i in range(500)]
        d = self._vals(spark, vals)
        one = sorted(tuple(r) for r in benford_digits(d.coalesce(1), "n").collect())
        many = sorted(
            tuple(r) for r in benford_digits(d.repartition(8), "n").collect()
        )
        assert one == many and one
