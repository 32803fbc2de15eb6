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


class TestKleinbergBursts:
    @staticmethod
    def _replay(ts_us_sorted, s=2, gamma=1):
        import math

        from pdf_extraction_spark.operators.forensics import BURST_SCALE

        gaps = [
            (ts_us_sorted[i] - ts_us_sorted[i - 1]) // 10**6
            for i in range(1, len(ts_us_sorted))
        ]
        n, t = len(gaps), sum(gaps)
        if n < 4 or t < 1:
            return None
        iln = lambda x: round(math.log(x) * BURST_SCALE)  # noqa: E731
        trans = gamma * iln(n)
        c0, b0, c1, b1 = 0, 0, trans, 0
        for g in gaps:
            cost0 = (n * g * 10**6) // t - iln(n) + iln(t)
            cost1 = (s * n * g * 10**6) // t - iln(s) - iln(n) + iln(t)
            n0 = min(c0, c1) + cost0
            nb0 = b0 if c0 <= c1 else b1
            n1 = min(c0 + trans, c1) + cost1
            nb1 = (b1 if c1 <= c0 + trans else b0) + 1
            c0, b0, c1, b1 = n0, nb0, n1, nb1
        return (n, t, b0 if c0 <= c1 else b1, min(c0, c1), 0 if c0 <= c1 else 1)

    @staticmethod
    def _rows():
        import random
        from datetime import datetime, timedelta

        base = datetime(2024, 1, 1)
        rows = []
        rows += [("A", base + timedelta(seconds=60 * i)) for i in range(20)]
        t, bs = 0, []
        for _ in range(8):
            bs.append(t)
            t += 60
        for _ in range(10):
            bs.append(t)
            t += 1
        for _ in range(8):
            bs.append(t)
            t += 60
        rows += [("B", base + timedelta(seconds=x)) for x in bs]
        random.seed(7)
        t = 0
        for _ in range(30):
            rows.append(("C", base + timedelta(seconds=t)))
            t += random.choice([1, 2, 5, 30, 120, 600])
        rows += [("D", base), ("D", base + timedelta(seconds=9))]  # too few
        rows += [("E", base)] * 6  # zero span
        rows += [("F", None)] * 9  # NULL ts only
        return rows

    def test_matches_pure_python_viterbi(self, spark):
        from datetime import timezone

        from pdf_extraction_spark.operators.forensics import kleinberg_bursts

        rows = self._rows()
        df = spark.createDataFrame(rows, "user_id string, ts timestamp")
        got = sorted(tuple(r) for r in kleinberg_bursts(df, min_events=5).collect())
        byu = {}
        for u, t in rows:
            if t is not None:
                byu.setdefault(u, []).append(
                    int(t.replace(tzinfo=timezone.utc).timestamp() * 1e6)
                )
        exp = []
        for u, ts in byu.items():
            r = self._replay(sorted(ts))
            if r:
                exp.append((u,) + r)
        assert got == sorted(exp)

    def test_uniform_user_has_no_bursts_and_burst_user_detected(self, spark):
        from pdf_extraction_spark.operators.forensics import kleinberg_bursts

        df = spark.createDataFrame(self._rows(), "user_id string, ts timestamp")
        by = {r.user_id: r for r in kleinberg_bursts(df, min_events=5).collect()}
        assert by["A"].burst_gaps == 0
        assert by["B"].burst_gaps >= 9  # the 1s-gap storm
        assert set(by) == {"A", "B", "C"}  # D/E/F filtered

    def test_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.forensics import (
            kleinberg_bursts,
            sql_kleinberg_bursts,
        )

        rows = self._rows()
        df = spark.createDataFrame(rows, "user_id string, ts timestamp")
        got = sorted(tuple(r) for r in kleinberg_bursts(df, min_events=5).collect())
        con = duckdb.connect()
        con.register("events", pd.DataFrame(rows, columns=["user_id", "ts"]))
        want = sorted(
            tuple(r)
            for r in con.execute(sql_kleinberg_bursts("events", min_events=5)).fetchall()
        )
        assert got == want


class TestCusum:
    def _replay(self, rows, target, k, h):
        from collections import defaultdict

        streams = defaultdict(list)
        for eid, g, ts, v in rows:
            if v is None or ts is None:
                continue
            streams[g].append((ts, eid, v))
        out = {}
        for g, evs in streams.items():
            evs.sort()
            sp = sm = 0
            msp = msm = 0
            alarms = 0
            first = None
            for ts, _, v in evs:
                sp = max(0, sp + (v - target - k))
                sm = max(0, sm + (target - k - v))
                msp, msm = max(msp, sp), max(msm, sm)
                if h > 0 and (sp > h or sm > h):
                    alarms += 1
                    if first is None:
                        first = ts
            out[g] = (len(evs), msp, msm, alarms, first)
        return out

    ROWS = [
        # user 1: in control around 100
        *[(i, 1, 1000 + i, 100 + (-1) ** i * 3) for i in range(20)],
        # user 2: shifts up to 140 halfway -> S+ alarm
        *[(100 + i, 2, 1000 + i, 100 if i < 10 else 140) for i in range(20)],
        # user 3: shifts down -> S- alarm
        *[(200 + i, 3, 1000 + i, 100 if i < 10 else 55) for i in range(20)],
        (300, 4, None, 100),   # NULL ts dropped
        (301, 4, 1000, None),  # NULL value dropped
        (302, None, 1000, 100),  # NULL group is a real stream
    ]

    def test_replay_and_branches(self, spark):
        from pdf_extraction_spark.operators.forensics import cusum

        df = spark.createDataFrame(
            self.ROWS, "eid long, grp long, ts long, v long"
        )
        got = {
            r.grp: r
            for r in cusum(
                df, "v", "grp", "ts", "eid", target=100, allowance=5,
                threshold=100,
            ).collect()
        }
        want = self._replay(self.ROWS, 100, 5, 100)
        assert set(got) == set(want)
        for g, (n, msp, msm, alarms, first) in want.items():
            r = got[g]
            assert (
                r.n_events, r.max_s_plus, r.max_s_minus, r.n_alarms,
                r.first_alarm_ts,
            ) == (n, msp, msm, alarms, first), g
        assert got[1].n_alarms == 0                    # in control
        assert got[2].n_alarms > 0 and got[2].max_s_plus > 100
        assert got[3].n_alarms > 0 and got[3].max_s_minus > 100
        # user 4 lost both hygiene rows entirely; NULL group survives
        assert 4 not in got and None in got

    def test_alarm_disabled_and_reset_identity(self, spark):
        from pdf_extraction_spark.operators.forensics import cusum

        df = spark.createDataFrame(
            self.ROWS, "eid long, grp long, ts long, v long"
        )
        got = {
            r.grp: r
            for r in cusum(
                df, "v", "grp", "ts", "eid", target=100, allowance=5
            ).collect()
        }
        assert all(r.n_alarms == 0 and r.first_alarm_ts is None for r in got.values())
        # trajectories identical with alarms off
        assert got[2].max_s_plus > 100

    def test_twin_parity_and_partition_invariance(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.forensics import cusum, sql_cusum

        df = spark.createDataFrame(
            self.ROWS, "eid long, grp long, ts long, v long"
        )
        args = dict(target=100, allowance=5, threshold=100)
        got = sorted(
            (tuple(r) for r in cusum(df, "v", "grp", "ts", "eid", **args).collect()),
            key=repr,
        )
        got2 = sorted(
            (
                tuple(r)
                for r in cusum(
                    df.repartition(7), "v", "grp", "ts", "eid", **args
                ).collect()
            ),
            key=repr,
        )
        assert got == got2
        con = duckdb.connect()
        con.register(
            "t", pd.DataFrame(self.ROWS, columns=["eid", "grp", "ts", "v"])
        )
        want = sorted(
            (
                tuple(r)
                for r in con.execute(
                    sql_cusum("t", "v", "grp", "ts", "eid", **args)
                ).fetchall()
            ),
            key=repr,
        )
        assert got == want


class TestRunsTest:
    def _run(self, spark, rows, threshold=50):
        from pdf_extraction_spark.operators.forensics import runs_test

        df = spark.createDataFrame(rows, "eid long, grp long, ts long, v long")
        return {
            r.grp: r
            for r in runs_test(
                df, "v", "grp", "ts", "eid", threshold=threshold
            ).collect()
        }

    def test_extremes_and_replay(self, spark):
        import math

        rows = (
            # user 1: perfect alternation -> max runs, z >> 0
            [(i, 1, 1000 + i, 100 if i % 2 == 0 else 0) for i in range(20)]
            # user 2: two dwelling blocks -> 2 runs, z << 0
            + [(100 + i, 2, 1000 + i, 100 if i < 10 else 0) for i in range(20)]
            # user 3: all above threshold -> degenerate, NULL z
            + [(200 + i, 3, 1000 + i, 100) for i in range(8)]
            + [(300, 4, None, 100), (301, 4, 1000, None)]  # hygiene
        )
        got = self._run(spark, rows)
        assert got[1].n_runs == 20 and got[1].z6 > 3
        assert got[2].n_runs == 2 and got[2].z6 < -3
        assert got[3].z6 is None and got[3].n1 == 8
        assert 4 not in got  # both rows hygiene-dropped
        # exact replay of user 1's z
        n, n1, n2, r = 20.0, 10.0, 10.0, 20.0
        mu = 1.0 + 2.0 * n1 * n2 / n
        var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
        assert got[1].z6 == round((r - mu) / math.sqrt(var), 6) + 0.0

    def test_twin_parity_and_partition_invariance(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.forensics import (
            runs_test,
            sql_runs_test,
        )

        rows = [(i, i % 3, 1000 + i, (i * 7) % 100) for i in range(60)]
        df = spark.createDataFrame(rows, "eid long, grp long, ts long, v long")
        got = sorted(
            (tuple(r) for r in runs_test(df, "v", "grp", "ts", "eid", 50).collect()),
            key=repr,
        )
        got2 = sorted(
            (
                tuple(r)
                for r in runs_test(
                    df.repartition(7), "v", "grp", "ts", "eid", 50
                ).collect()
            ),
            key=repr,
        )
        assert got == got2
        con = duckdb.connect()
        con.register("t", pd.DataFrame(rows, columns=["eid", "grp", "ts", "v"]))
        want = sorted(
            (
                tuple(r)
                for r in con.execute(
                    sql_runs_test("t", "v", "grp", "ts", "eid", 50)
                ).fetchall()
            ),
            key=repr,
        )
        assert got == want
