"""Ranking fusion + ranking eval (operators/fusion.py): RRF, nDCG@k,
RBO, MMR — hand-computed examples, pure-Python replays of the exact
fixed-point devices, partition invariance, and the published-property
checks (λ=1 MMR ≡ relevance top-k, duplicate demotion)."""

import math

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.fusion import (
    RBO_SCALE,
    RRF_SCALE,
    _discounts,
    _rbo_suffix_ppb,
    mmr_topk,
    ndcg_at_k,
    rank_from_topk,
    rbo_overlap,
    rrf_fuse,
)


def _ranking(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank long")


# --------------------------------------------------------------------------
# RRF
# --------------------------------------------------------------------------

class TestRRF:
    def test_hand_example(self, spark):
        a = _ranking(spark, [(10, 1), (11, 2)])
        b = _ranking(spark, [(11, 1), (12, 2)])
        rows = {r["doc_id"]: r for r in rrf_fuse([a, b], k0=60, k=10).collect()}
        assert rows[11]["rrf_ppb"] == RRF_SCALE // 61 + RRF_SCALE // 62
        assert rows[10]["rrf_ppb"] == RRF_SCALE // 61
        assert rows[12]["rrf_ppb"] == RRF_SCALE // 62
        assert rows[11]["n_lists"] == 2 and rows[11]["best_rank"] == 1
        # doc in both lists outranks docs in one
        order = [
            r["doc_id"]
            for r in rrf_fuse([a, b], k0=60, k=10)
            .orderBy(F.desc("rrf_ppb"), "doc_id")
            .collect()
        ]
        assert order[0] == 11

    def test_partition_invariance(self, spark):
        a = _ranking(spark, [(i, i + 1) for i in range(30)])
        b = _ranking(spark, [(i + 15, i + 1) for i in range(30)])
        one = sorted(
            tuple(r) for r in rrf_fuse([a.coalesce(1), b.coalesce(1)], k=40).collect()
        )
        many = sorted(
            tuple(r)
            for r in rrf_fuse([a.repartition(7), b.repartition(3)], k=40).collect()
        )
        assert one == many

    def test_needs_input(self):
        with pytest.raises(ValueError):
            rrf_fuse([])


# --------------------------------------------------------------------------
# nDCG@k
# --------------------------------------------------------------------------

def _py_dcg(gains_in_pos_order, k):
    w = _discounts(k)
    acc = 0.0
    for pos, g in enumerate(gains_in_pos_order, start=1):
        acc += float(g) * w[pos - 1]
    return acc


class TestNDCG:
    def test_hand_example(self, spark):
        df = spark.createDataFrame(
            [(1, 10, 0), (2, 9, 3), (3, 8, 1)], "doc_id long, score long, gain long"
        )
        row = ndcg_at_k(df, "score", "gain", k=3).collect()[0]
        dcg = _py_dcg([0, 3, 1], 3)
        idcg = _py_dcg([3, 1, 0], 3)
        assert row["dcg_ppm"] == math.floor(dcg * 1_000_000)
        assert row["idcg_ppm"] == math.floor(idcg * 1_000_000)
        assert row["ndcg_ppm"] == math.floor(dcg / idcg * 1_000_000)

    def test_perfect_ranking_is_one(self, spark):
        df = spark.createDataFrame(
            [(i, 100 - i, 50 - i) for i in range(40)],
            "doc_id long, score long, gain long",
        )
        assert ndcg_at_k(df, "score", "gain", k=10).collect()[0]["ndcg_ppm"] == 1_000_000

    def test_inverted_ranking_below_one(self, spark):
        df = spark.createDataFrame(
            [(i, i, 50 - i) for i in range(40)],
            "doc_id long, score long, gain long",
        )
        assert ndcg_at_k(df, "score", "gain", k=10).collect()[0]["ndcg_ppm"] < 1_000_000

    def test_zero_gains(self, spark):
        df = spark.createDataFrame(
            [(1, 5, 0), (2, 4, 0)], "doc_id long, score long, gain long"
        )
        row = ndcg_at_k(df, "score", "gain", k=2).collect()[0]
        assert row["idcg_ppm"] == 0 and row["ndcg_ppm"] == 0


# --------------------------------------------------------------------------
# RBO
# --------------------------------------------------------------------------

class TestRBO:
    def test_identical_lists(self, spark):
        n, depth, p = 20, 20, 0.9
        a = _ranking(spark, [(i, i + 1) for i in range(n)])
        row = rbo_overlap(a, a, p=p, depth=depth).collect()[0]
        suffix = _rbo_suffix_ppb(p, depth)
        assert row["n_joint"] == n
        assert row["rbo_ppb"] == sum(suffix[m - 1] for m in range(1, n + 1))
        # quantized sum tracks the closed form (1 - p^depth) to ppb·depth
        closed = (1.0 - p**depth) * RBO_SCALE
        assert abs(row["rbo_ppb"] - closed) < depth

    def test_disjoint_lists(self, spark):
        a = _ranking(spark, [(i, i + 1) for i in range(10)])
        b = _ranking(spark, [(100 + i, i + 1) for i in range(10)])
        row = rbo_overlap(a, b, depth=10).collect()[0]
        assert row["n_joint"] == 0 and row["rbo_ppb"] == 0

    def test_entry_position_is_max_rank(self, spark):
        # one joint doc at rank 1 in a, rank 3 in b → contributes S[3]
        a = _ranking(spark, [(7, 1), (8, 2), (9, 3)])
        b = _ranking(spark, [(5, 1), (6, 2), (7, 3)])
        row = rbo_overlap(a, b, p=0.9, depth=5).collect()[0]
        assert row["n_joint"] == 1
        assert row["rbo_ppb"] == _rbo_suffix_ppb(0.9, 5)[2]

    def test_depth_truncates(self, spark):
        a = _ranking(spark, [(i, i + 1) for i in range(30)])
        row = rbo_overlap(a, a, p=0.9, depth=10).collect()[0]
        assert row["n_joint"] == 10


# --------------------------------------------------------------------------
# MMR
# --------------------------------------------------------------------------

def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


class TestMMR:
    def test_lambda_one_is_relevance_topk(self, spark):
        from pdf_extraction_spark.operators.topk import cosine_topk

        rows = [
            (i, [math.sin((i + 1) * (j + 2) * 0.37) for j in range(8)])
            for i in range(12)
        ]
        df = _emb_df(spark, rows)
        q = [math.cos(j * 0.21) for j in range(8)]
        got = [
            r["vec_id"]
            for r in mmr_topk(df, q, lam=1.0, k=4, pool=8).orderBy("rank").collect()
        ]
        want = [
            r["vec_id"]
            for r in cosine_topk(df, q, k=4, round_digits=6).collect()
        ]
        assert got == want

    def test_duplicate_demoted(self, spark):
        # vec 0 and vec 1 are identical copies of the query (rel 1.0,
        # mutual sim 1.0); at λ=0.3 the diversity term dominates, so
        # after picking 0 the exact duplicate must rank below the two
        # diverse lower-relevance docs: dup mmr = 0.3 − 0.7·1.0 = −0.4
        # vs c = 0.24 − 0.7·0.8 = −0.32 and d = 0.18 − 0.7·0.6 = −0.24
        q = [0.8, 0.6, 0.0, 0.0]
        c = [1.0, 0.0, 0.0, 0.0]  # rel 0.8, sim-to-q-copy 0.8
        d = [0.0, 1.0, 0.0, 0.0]  # rel 0.6, sim-to-q-copy 0.6
        df = _emb_df(spark, [(0, q), (1, q), (2, c), (3, d)])
        out = mmr_topk(df, q, lam=0.3, k=3, pool=4)
        picks = [r["vec_id"] for r in out.orderBy("rank").collect()]
        assert picks == [0, 3, 2]  # duplicate 1 excluded entirely

    def test_partition_invariance(self, spark):
        rows = [
            (i, [math.sin((i + 1) * (j + 3) * 0.21) for j in range(16)])
            for i in range(40)
        ]
        q = [math.cos(j * 0.13) for j in range(16)]
        one = [
            tuple(r)
            for r in mmr_topk(_emb_df(spark, rows).coalesce(1), q, k=5, pool=12)
            .orderBy("rank")
            .collect()
        ]
        many = [
            tuple(r)
            for r in mmr_topk(_emb_df(spark, rows).repartition(7), q, k=5, pool=12)
            .orderBy("rank")
            .collect()
        ]
        assert one == many

    def test_rejects_bad_lambda(self, spark):
        df = _emb_df(spark, [(0, [1.0, 0.0])])
        with pytest.raises(ValueError):
            mmr_topk(df, [1.0, 0.0], lam=1.5)

    def test_rank_from_topk(self, spark):
        df = spark.createDataFrame(
            [(3, 5.0), (1, 9.0), (2, 9.0)], "doc_id long, s double"
        )
        got = {r["doc_id"]: r["rank"] for r in rank_from_topk(df, "s", "doc_id").collect()}
        assert got == {1: 1, 2: 2, 3: 3}  # tie broken by id


class TestAvgPrecision:
    ROWS = [(i, 10 - i, 1 if i in (0, 2, 3, 8) else 0) for i in range(10)]

    def test_matches_hand_replay(self, spark):
        from pdf_extraction_spark.operators.fusion import avg_precision_at_k

        df = spark.createDataFrame(self.ROWS, "doc_id long, score long, gain long")
        row = avg_precision_at_k(df, "score", "gain", k=5).collect()[0]
        # relevant at prefix ranks 1, 3, 4; R = 4 (one rel outside k)
        exp = (10**6 // 1 + 2 * 10**6 // 3 + 3 * 10**6 // 4) // 4
        assert tuple(row) == (5, 4, 3, exp)

    def test_perfect_ranking_scores_one(self, spark):
        from pdf_extraction_spark.operators.fusion import avg_precision_at_k

        rows = [(i, 10 - i, 1 if i < 3 else 0) for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, score long, gain long")
        assert avg_precision_at_k(df, "score", "gain", k=5).collect()[0].ap_ppm == 10**6

    def test_no_relevant_scores_zero(self, spark):
        from pdf_extraction_spark.operators.fusion import avg_precision_at_k

        rows = [(i, i, 0) for i in range(5)]
        df = spark.createDataFrame(rows, "doc_id long, score long, gain long")
        assert avg_precision_at_k(df, "score", "gain", k=5).collect()[0].ap_ppm == 0

    def test_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.fusion import (
            avg_precision_at_k,
            sql_avg_precision_at_k,
        )

        df = spark.createDataFrame(self.ROWS, "doc_id long, score long, gain long")
        got = [tuple(r) for r in avg_precision_at_k(df, "score", "gain", k=5).collect()]
        con = duckdb.connect()
        con.register("b", pd.DataFrame(self.ROWS, columns=["doc_id", "score", "gain"]))
        want = [
            tuple(r)
            for r in con.execute(sql_avg_precision_at_k("SELECT * FROM b", 5)).fetchall()
        ]
        assert got == want


class TestCohenKappa:
    def test_known_value(self, spark):
        from pdf_extraction_spark.operators.fusion import cohen_kappa

        rows = (
            [(True, True)] * 40 + [(False, False)] * 40
            + [(True, False)] * 10 + [(False, True)] * 10
        )
        df = spark.createDataFrame(rows, "a boolean, b boolean")
        r = cohen_kappa(df, "a", "b").collect()[0]
        assert abs(r.kappa - 0.6) < 1e-12  # p_o=0.8, p_e=0.5

    def test_both_constant_is_null_single_constant_is_zero(self, spark):
        from pdf_extraction_spark.operators.fusion import cohen_kappa

        both = spark.createDataFrame([(True, True)] * 4, "a boolean, b boolean")
        assert cohen_kappa(both, "a", "b").collect()[0].kappa is None
        one = spark.createDataFrame(
            [(True, True), (True, False)], "a boolean, b boolean"
        )
        assert cohen_kappa(one, "a", "b").collect()[0].kappa == 0.0

    def test_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.fusion import cohen_kappa, sql_cohen_kappa

        rows = [(True, True), (True, False), (False, True), (False, False),
                (None, True), (True, None)]
        df = spark.createDataFrame(rows, "a boolean, b boolean")
        got = [tuple(r) for r in cohen_kappa(df, "a", "b").collect()]
        con = duckdb.connect()
        con.register("k", pd.DataFrame(rows, columns=["a", "b"]))
        want = [tuple(r) for r in con.execute(sql_cohen_kappa("SELECT * FROM k")).fetchall()]
        assert got == want


class TestGateMcnemar:
    def _run(self, spark, rows):
        from pdf_extraction_spark.operators.fusion import gate_mcnemar

        df = spark.createDataFrame(rows, "a boolean, b boolean")
        [r] = gate_mcnemar(df, "a", "b").collect()
        return r

    def test_hand_values(self, spark):
        # classic 2x2: b=10 discordant one way, c=4 the other
        rows = (
            [(True, True)] * 20
            + [(False, False)] * 16
            + [(True, False)] * 10
            + [(False, True)] * 4
        )
        r = self._run(spark, rows)
        assert (r.n, r.n_b, r.n_c) == (50, 10, 4)
        assert r.chi2_milli == (10 - 4) ** 2 * 1000 // 14  # 2571
        assert r.chi2_corr_milli == (6 - 1) ** 2 * 1000 // 14  # 1785

    def test_identical_gates_undefined(self, spark):
        rows = [(True, True)] * 5 + [(False, False)] * 5
        r = self._run(spark, rows)
        assert r.chi2_milli is None and r.chi2_corr_milli is None

    def test_null_verdicts_dropped_and_symmetry(self, spark):
        rows = [(True, False)] * 3 + [(False, True)] * 3 + [(None, True), (True, None)]
        r = self._run(spark, rows)
        assert r.n == 6 and r.chi2_milli == 0  # b == c → statistic 0
        # correction of |b-c|=0 clamps at 0, not (−1)²
        assert r.chi2_corr_milli == 0

    def test_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.fusion import (
            gate_mcnemar,
            sql_gate_mcnemar,
        )

        rows = [(i % 3 == 0, i % 4 == 0) for i in range(37)] + [(None, True)]
        df = spark.createDataFrame(rows, "a boolean, b boolean")
        [got] = gate_mcnemar(df, "a", "b").collect()
        con = duckdb.connect()
        con.register("t", pd.DataFrame(rows, columns=["a", "b"]))
        [want] = con.execute(
            sql_gate_mcnemar("SELECT a, b FROM t")
        ).fetchall()
        assert tuple(got) == want
