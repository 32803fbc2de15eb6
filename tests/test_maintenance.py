"""Table-maintenance planners: next-fit compaction invariants, mixture
water-filling vs a pure-Python replay, budget/cap properties. Twin
parity lives in the strict oracle sweep (compaction_plan,
mixture_plan) and the adversarial hostile-input sweep."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.maintenance import (
    compaction_plan,
    mixture_plan,
)


class TestCompaction:
    def _run(self, spark, sizes, target, part=None):
        rows = (
            [(f"f{i:03d}", b) for i, b in enumerate(sizes)]
            if part is None
            else [(p, f"f{i:03d}", b) for i, (p, b) in enumerate(sizes)]
        )
        schema = (
            "file_id string, bytes long"
            if part is None
            else "part string, file_id string, bytes long"
        )
        df = spark.createDataFrame(rows, schema)
        return compaction_plan(df, target, part_col=part).collect()

    def test_next_fit_binning(self, spark):
        # cum-before: 0,5,10,15 with target 12 -> bins 0,0,0,1
        got = {r.file_id: r.bin for r in self._run(spark, [5, 5, 5, 5], 12)}
        assert got == {"f000": 0, "f001": 0, "f002": 0, "f003": 1}

    def test_every_file_assigned_and_bins_contiguous(self, spark):
        sizes = [3, 9, 1, 14, 2, 2, 8, 5, 40, 1]
        out = sorted(self._run(spark, sizes, 10), key=lambda r: r.file_id)
        assert len(out) == len(sizes)
        bins = [r.bin for r in out]
        assert bins == sorted(bins)  # file order never goes back a bin
        cum = 0
        for r, b in zip(out, sizes):
            assert r.bin == cum // 10 and r.bytes == b
            cum += b

    def test_rollups_match_assignment(self, spark):
        out = self._run(spark, [4, 4, 4, 4, 4], 10)
        by_bin = {}
        for r in out:
            by_bin.setdefault(r.bin, []).append(r)
        for b, rs in by_bin.items():
            assert all(r.bin_files == len(rs) for r in rs)
            assert all(r.bin_bytes == sum(x.bytes for x in rs) for r in rs)

    def test_partition_column_scopes_the_packing(self, spark):
        sizes = [("a", 6), ("a", 6), ("b", 6), ("b", 6)]
        out = self._run(spark, sizes, 10, part="part")
        got = {(r.part, r.file_id): r.bin for r in out}
        # each partition restarts its own cumulative sum
        assert got[("a", "f000")] == 0 and got[("a", "f001")] == 0
        assert got[("b", "f002")] == 0 and got[("b", "f003")] == 0


class TestMixture:
    @staticmethod
    def _py_waterfill(avail, weights, budget, rounds=4):
        state = {
            s: {"avail": a, "w": weights.get(s, 0), "alloc": 0, "capped": False}
            for s, a in avail.items()
        }
        for _ in range(rounds):
            w_open = sum(v["w"] for v in state.values() if not v["capped"])
            spent = sum(v["alloc"] for v in state.values() if v["capped"])
            for v in state.values():
                if v["capped"]:
                    continue
                cand = 0 if w_open == 0 else (budget - spent) * v["w"] // w_open
                if cand >= v["avail"]:
                    v["alloc"], v["capped"] = v["avail"], True
                else:
                    v["alloc"] = cand
        return {s: v["alloc"] for s, v in state.items()}

    def _run(self, spark, avail, weights, budget):
        rows = [(s, a) for s, a in avail.items()]
        df = spark.createDataFrame(rows, "source string, token_count long")
        got = {
            r.source: (r.avail_tokens, r.alloc_tokens, r.rate_ppm)
            for r in mixture_plan(df, weights, budget).collect()
        }
        want = self._py_waterfill(avail, weights, budget)
        assert {s: v[1] for s, v in got.items()} == want
        return got

    def test_capped_share_waterfills_the_rest(self, spark):
        avail = {"a": 100, "b": 10_000, "c": 10_000}
        got = self._run(spark, avail, {"a": 500, "b": 300, "c": 200}, 6000)
        # a caps at 100; its unused 2900 re-splits 3:2 over b and c
        assert got["a"] == (100, 100, 1_000_000)
        assert got["b"][1] == (6000 - 100) * 300 // 500
        assert got["c"][1] == (6000 - 100) * 200 // 500

    def test_budget_never_exceeded_and_allocs_bounded(self, spark):
        avail = {f"s{i}": 50 * (i + 1) for i in range(8)}
        weights = {f"s{i}": 100 + i for i in range(8)}
        got = self._run(spark, avail, weights, 700)
        assert sum(v[1] for v in got.values()) <= 700
        assert all(v[1] <= v[0] for v in got.values())

    def test_ample_budget_caps_everything(self, spark):
        avail = {"a": 10, "b": 20}
        got = self._run(spark, avail, {"a": 500, "b": 500}, 10_000)
        assert got["a"][1] == 10 and got["b"][1] == 20

    def test_unweighted_source_allocates_zero(self, spark):
        got = self._run(spark, {"a": 100, "ghost": 500}, {"a": 1000}, 50)
        assert got["ghost"] == (500, 0, 0)

    def test_equal_weights_split_evenly_and_stay_stable(self, spark):
        # the buggy self-referencing update converged to budget/3 here
        got = self._run(spark, {"a": 10_000, "b": 10_000}, {"a": 500, "b": 500}, 100)
        assert got["a"][1] == 50 and got["b"][1] == 50


# ---------------------------------------------------------------------------
# temperature_mix
# ---------------------------------------------------------------------------


class TestTemperatureMix:
    def _run(self, spark, rows, budget, k=1):
        from pdf_extraction_spark.operators.maintenance import temperature_mix

        df = spark.createDataFrame(rows, "source string, token_count long")
        return {r.source: r for r in temperature_mix(df, budget, inv_temp_pow2=k).collect()}

    def test_weights_are_exact_integer_roots(self, spark):
        import math

        rows = [("a", 10_000), ("b", 100), ("c", 2), ("d", 0)]
        for k in (0, 1, 2):
            got = self._run(spark, rows, 1000, k=k)
            for s, n in rows:
                want = n
                for _ in range(k):
                    want = math.isqrt(want)
                assert got[s].weight == want, (k, s)

    def test_alpha_half_upsamples_low_resource(self, spark):
        # published behavior: under α=0.5 the small source's SHARE of the
        # budget exceeds its share of the corpus, the big source's shrinks
        rows = [("big", 1_000_000), ("small", 10_000)]
        got = self._run(spark, rows, 100_000, k=1)
        corpus_share_small = 10_000 / 1_010_000
        alloc_share_small = got["small"].alloc_tokens / 100_000
        assert alloc_share_small > corpus_share_small
        assert got["small"].rate_ppm > got["big"].rate_ppm

    def test_alloc_decomposition_is_exact(self, spark):
        # (B div W)·w + ((B mod W)·w) div W  ==  B·w div W (checked in
        # unbounded Python ints) for awkward W that don't divide B
        rows = [("a", 7), ("b", 13), ("c", 29), ("d", 1)]
        budget = 999_999_999_999
        got = self._run(spark, rows, budget, k=1)
        import math

        W = sum(math.isqrt(n) for _, n in rows)
        for s, n in rows:
            w = math.isqrt(n)
            assert got[s].alloc_tokens == budget * w // W, s

    def test_null_and_negative_inputs(self, spark):
        rows = [("a", None), ("a", -50), ("a", 100), (None, 10_000)]
        got = self._run(spark, rows, 100, k=1)
        assert set(got) == {"a"}          # NULL source dropped
        assert got["a"].avail_tokens == 100  # NULL/negative clamp to 0
        assert got["a"].weight == 10

    def test_rate_over_one_million_means_epochs(self, spark):
        got = self._run(spark, [("tiny", 4)], 100, k=1)
        # all 100 budget tokens land on 4 available -> 25 epochs
        assert got["tiny"].alloc_tokens == 100
        assert got["tiny"].rate_ppm == 25_000_000

    def test_invalid_alpha_rejected(self, spark):
        from pdf_extraction_spark.operators.maintenance import temperature_mix

        df = spark.createDataFrame([("a", 1)], "source string, token_count long")
        with pytest.raises(ValueError):
            temperature_mix(df, 10, inv_temp_pow2=3)

    def test_isqrt_case_boundary_sweep_cross_engine(self, spark):
        """The exact-isqrt CASE is the one device this operator adds:
        pin it against math.isqrt on both engines over every perfect
        square ±1 the tests can reach plus the int64/2^53 knees."""
        import math

        import duckdb

        from pdf_extraction_spark.operators.maintenance import _isqrt_case

        vals = sorted(
            {
                s
                for k in list(range(200)) + [2**26, 2**31, 3037000499]
                for s in (k * k - 1, k * k, k * k + 1)
                if 0 <= s <= 2**63 - 1
            }
            | {2**53 - 1, 2**53, 2**53 + 1, 2**62, 2**63 - 1}
        )
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        df = df.withColumn(
            "c", F.floor(F.sqrt(F.col("x").cast("double"))).cast("long")
        ).withColumn("s", F.expr(_isqrt_case("x", "c", "div")))
        for r in df.collect():
            assert r.s == math.isqrt(r.x), r.x
        con = duckdb.connect()
        con.execute("CREATE TABLE t(x BIGINT)")
        con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
        q = (
            "SELECT x, " + _isqrt_case("x", "c", "//") + " AS s FROM "
            "(SELECT x, CAST(floor(sqrt(CAST(x AS DOUBLE))) AS BIGINT) AS c "
            "FROM t)"
        )
        for x, s in con.execute(q).fetchall():
            assert s == math.isqrt(x), x
