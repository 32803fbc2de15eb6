"""IVF ANN tests: full-probe exactness and partial-probe recall.

The driver's ivf_* queries run over COMMITTED fixture centroids so the
whole path gets strict SQL twins; the sampled-TRAINING variant
(train_centroids → assign → probe) is approximate by design and its
quality gate lives here instead: probing every cell must reproduce
brute force exactly, and the default partial probe must keep recall@k
high on the real embeddings table.
"""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.similarity import (
    assign_cells,
    brute_force_topk,
    ivf_topk,
    train_centroids,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


def _query_vec():
    import __spark_entry__ as e

    return e._query_vec()


def test_full_probe_equals_brute_force(spark, emb):
    cents = train_centroids(emb, n_cells=8, iters=3)
    cells = assign_cells(emb, cents)
    full = ivf_topk(cells, cents, _query_vec(), k=10, n_probe=8).select(
        "vec_id", "similarity"
    )
    brute = brute_force_topk(emb, _query_vec(), k=10).select("vec_id", "similarity")
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, brute.collect()))


def test_partial_probe_recall(spark, emb):
    cents = train_centroids(emb, n_cells=8, iters=3)
    cells = assign_cells(emb, cents).persist()
    brute_ids = {r["vec_id"] for r in brute_force_topk(emb, _query_vec(), k=10).collect()}
    ivf_ids = {
        r["vec_id"]
        for r in ivf_topk(cells, cents, _query_vec(), k=10, n_probe=3).collect()
    }
    recall = len(brute_ids & ivf_ids) / len(brute_ids)
    assert recall >= 0.6, f"recall@10 with 3/8 probes = {recall}"
    # probing more cells can only improve recall
    ivf5 = {
        r["vec_id"]
        for r in ivf_topk(cells, cents, _query_vec(), k=10, n_probe=5).collect()
    }
    assert len(brute_ids & ivf5) >= len(brute_ids & ivf_ids)
    cells.unpersist()


def test_scan_pruning(spark, emb):
    """The probe must filter cells BELOW the cosine work — the point of
    IVF at scale is scanning ~n_probe/n_cells of the data."""
    cents = train_centroids(emb, n_cells=8, iters=3)
    cells = assign_cells(emb, cents)
    n_all = cells.count()
    probed = ivf_topk(cells, cents, _query_vec(), k=5, n_probe=2)
    # count rows surviving the cell filter (pre-topk) via the same predicate
    import numpy as np

    from pdf_extraction_spark.operators.similarity import _np_normalize

    cn = _np_normalize(np.asarray(cents))
    q = np.asarray(_query_vec(), dtype=float)
    probe = np.argsort(-(cn @ (q / np.linalg.norm(q))))[:2].tolist()
    n_probed = cells.filter(F.col("cell").isin(probe)).count()
    assert n_probed < n_all
    assert probed.count() == 5


def test_topk_batch_nan_ranks_last(spark):
    """REGRESSION: a NaN-component embedding scores NaN; the bounded
    tree normalizes it to -inf so it ranks LAST — and the DuckDB twin
    applies the same normalization (DuckDB's ORDER BY DESC would
    otherwise rank NaN FIRST, silently inverting the top-k)."""
    from pdf_extraction_spark.operators.similarity import brute_force_topk_batch

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [float("nan"), 1.0, 1.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame([(7, [1.0, 0.0, 0.0, 0.0])], "q_id long, q_vec array<double>")
    got = {r["vec_id"]: r["similarity"] for r in brute_force_topk_batch(df, q, k=3).collect()}
    assert got[1] == 1.0 and got[2] > 0.9
    assert got[3] == float("-inf")  # NaN normalized, ranked last
    order = [r["vec_id"] for r in brute_force_topk_batch(df, q, k=3)
             .orderBy(F.desc("similarity"), "vec_id").collect()]
    assert order == [1, 2, 3]


class TestSemanticDedup:
    """SemDeDup semantics on hand-built clusters (the registered query's
    cross-engine parity is pinned by the strict DuckDB twin; these pin
    the paper's keep rule itself)."""

    CENTS = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]

    def _run(self, spark, rows, threshold=0.9):
        from pdf_extraction_spark.operators.similarity import semantic_dedup

        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = semantic_dedup(df, self.CENTS, threshold=threshold)
        return {r["vec_id"]: r for r in out.collect()}

    def test_least_centroid_similar_survives(self, spark):
        # cluster 0: three near-identical vectors at different angles to
        # the centroid — the FARTHEST from the centroid (lowest
        # cent_sim) must be the survivor, not the first or closest
        rows = [
            (1, [1.0, 0.0, 0.0, 0.0]),        # cent_sim = 1.0
            (2, [0.99, 0.14, 0.0, 0.0]),      # slightly off-axis
            (3, [0.97, 0.24, 0.0, 0.0]),      # farthest off-axis → keep
            (10, [0.1, 1.0, 0.0, 0.0]),        # cluster 1, no dup → keep
        ]
        got = self._run(spark, rows, threshold=0.98)
        assert [got[i]["kept"] for i in (1, 2, 3, 10)] == [False, False, True, True]
        assert got[3]["cent_sim"] < got[2]["cent_sim"] < got[1]["cent_sim"]

    def test_tie_breaks_to_lowest_id(self, spark):
        # identical vectors → identical cent_sim → the lowest id wins
        rows = [(7, [1.0, 0.0, 0.0, 0.0]), (3, [1.0, 0.0, 0.0, 0.0])]
        got = self._run(spark, rows, threshold=0.99)
        assert got[3]["kept"] is True and got[7]["kept"] is False

    def test_cross_cluster_pairs_never_compared(self, spark):
        # two vectors on the 45° diagonal are near-identical (cosine 1)
        # but argmax-assign to DIFFERENT cells (ties go to the lower
        # cell only for exact ties; these are nudged) → both kept:
        # SemDeDup only tests pairs within a cluster, by construction
        rows = [
            (1, [1.0, 0.9, 0.0, 0.0]),   # cell 0
            (2, [0.9, 1.0, 0.0, 0.0]),   # cell 1
        ]
        got = self._run(spark, rows, threshold=0.9)
        assert got[1]["cell"] != got[2]["cell"]
        assert got[1]["kept"] and got[2]["kept"]

    def test_null_embeddings_excluded(self, spark):
        rows = [(1, [1.0, 0.0, 0.0, 0.0]), (2, None)]
        got = self._run(spark, rows, threshold=0.9)
        assert set(got) == {1}

    def test_mega_cell_lsh_path_recall(self, spark):
        # one mega-cluster of 300 tight near-dups + one small cluster;
        # max_cell forces the LSH path for the mega-cell only. The
        # approximate drop set must agree with the exact path on ≥90%
        # of drops, and the small cell must be decided identically.
        import math

        from pdf_extraction_spark.operators.similarity import semantic_dedup

        rows = []
        for i in range(300):  # mega-cluster near centroid 0
            rows.append(
                (i, [1.0 + 0.001 * math.sin(i * 1.7), 0.001 * math.cos(i * 2.3), 0.0, 0.0])
            )
        for i in range(300, 310):  # small cluster near centroid 1
            rows.append((i, [0.01 * (i - 300), 1.0, 0.0, 0.0]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

        exact = {
            r["vec_id"]: r["kept"]
            for r in semantic_dedup(df, self.CENTS, threshold=0.999).collect()
        }
        approx = {
            r["vec_id"]: r["kept"]
            for r in semantic_dedup(
                df, self.CENTS, threshold=0.999, max_cell=100, n_planes=32
            ).collect()
        }
        assert set(exact) == set(approx)
        # small cell (under the cap) stays exact
        assert all(exact[i] == approx[i] for i in range(300, 310))
        ex_drop = {i for i, k in exact.items() if not k and i < 300}
        ap_drop = {i for i, k in approx.items() if not k and i < 300}
        assert ex_drop, "exact path must drop mega-cluster members"
        # no invented drops: LSH candidates are a subset of the exact
        # within-cell pairs and every drop is exact-cosine-verified, so
        # the approximate drop set must be contained in the exact one
        assert ap_drop <= ex_drop
        # recall: ≥90% of the exact drops must survive the LSH thinning
        assert len(ex_drop & ap_drop) / len(ex_drop) >= 0.9

    def test_batch_invariants_random_vectors(self, spark):
        # seeded random batch: output covers every assignable vector
        # exactly once, and every nonempty cell keeps at least one
        # vector (the cell's top-priority member can never be dropped)
        import random

        rng = random.Random(7)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(400)
        ] + [(400, None), (401, [0.0, 0.0, 0.0, 0.0])]
        from pdf_extraction_spark.operators.similarity import semantic_dedup

        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = semantic_dedup(df, self.CENTS, threshold=0.8).collect()
        ids = [r["vec_id"] for r in out]
        assert sorted(ids) == sorted(set(ids))  # one row per vector
        assert set(ids) == set(range(400)) | {401}  # null out, zero-vec in
        by_cell = {}
        for r in out:
            by_cell.setdefault(r["cell"], []).append(r)
        for cell, members in by_cell.items():
            assert any(m["kept"] for m in members), f"cell {cell} kept nothing"
            # the (cent_sim, id)-minimal member is always kept
            top = min(members, key=lambda m: (m["cent_sim"], m["vec_id"]))
            assert top["kept"]


# ---------------------------------------------------------------------------
# int8 quantization
# ---------------------------------------------------------------------------


def test_quantize_known_vectors(spark):
    from pdf_extraction_spark.operators.similarity import quantize_embeddings

    emb = spark.createDataFrame(
        [
            (1, [1.0, -1.0, 0.5, 0.0]),
            (2, [0.0, 0.0, 0.0]),
            (3, [2.0]),
            (4, None),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in quantize_embeddings(emb).collect()}
    assert 4 not in out
    r = out[1]
    # max|x| = 1 -> codes 127, -127, 64 (63.5 half-up), 0
    assert r["codes"] == [127, -127, 64, 0]
    assert r["n_sat"] == 2
    assert r["scale"] == 1.0 / 127.0
    # dequant error bounded by half a quantization step
    assert r["max_err"] <= r["scale"] / 2 + 1e-12
    # all-zero vector short-circuits: no 0/0, everything zero
    z = out[2]
    assert (z["codes"], z["scale"], z["n_sat"], z["max_err"]) == ([0, 0, 0], 0.0, 0, 0.0)
    # single element saturates exactly, zero error
    s = out[3]
    assert s["codes"] == [127] and s["max_err"] == 0.0


def test_quantize_duckdb_parity_hand_rows(spark):
    import duckdb

    from pdf_extraction_spark.operators.similarity import (
        quantize_embeddings,
        sql_quantize_embeddings,
    )

    rows = [
        (1, [0.3, -0.7, 0.001, 0.699999]),
        (2, [-0.25, 0.25, -0.125]),
        (3, [1e-8, -1e-8]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = sorted(
        (r["vec_id"], r["dim"], r["scale"], r["codes"], r["n_sat"], r["max_err"])
        for r in quantize_embeddings(emb).collect()
    )
    vals = ", ".join(
        "(" + str(i) + ", [" + ", ".join(f"CAST({x!r} AS FLOAT)" for x in v) + "])"
        for i, v in rows
    )
    con = duckdb.connect()
    want = sorted(
        tuple(r)
        for r in con.execute(
            sql_quantize_embeddings(
                f"SELECT * FROM (VALUES {vals}) t(vec_id, embedding)"
            )
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------


def _pq_replay(vecs, cb):
    """Pure-Python PQ replay: fold-left IEEE distances (the operator's
    accumulation order), argmin ties to lowest cell."""
    m, k, ds = cb.shape
    out = {}
    for vid, v in vecs:
        codes = []
        for j in range(m):
            best = None
            for c in range(k):
                acc = 0.0
                for t in range(ds):
                    d = float(v[j * ds + t]) - float(cb[j][c][t])
                    acc = acc + d * d
                if best is None or (acc, c) < best:
                    best = (acc, c)
            codes.append(best[1])
        out[vid] = codes
    return out


@pytest.fixture(scope="module")
def pq_setup(spark):
    import numpy as np

    from pdf_extraction_spark.operators.similarity import pq_train_lite

    rng = np.random.RandomState(7)
    mat = rng.randn(40, 16)
    cb = pq_train_lite(mat, m=4, k=4, iters=3, seed=11)
    vecs = [(i, [float(x) for x in mat[i]]) for i in range(len(mat))]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    return mat, cb, vecs, emb


class TestProductQuantization:
    def test_encode_matches_pure_python_replay(self, spark, pq_setup):
        from pdf_extraction_spark.operators.similarity import pq_encode

        mat, cb, vecs, emb = pq_setup
        got = {
            r["vec_id"]: r["codes"]
            for r in pq_encode(emb, cb, dim=16).collect()
        }
        assert got == _pq_replay(vecs, cb)
        assert all(0 <= c < 4 for codes in got.values() for c in codes)
        assert all(len(codes) == 4 for codes in got.values())

    def test_encode_partition_invariance(self, spark, pq_setup):
        from pdf_extraction_spark.operators.similarity import pq_encode

        mat, cb, vecs, emb = pq_setup
        a = sorted(map(tuple, pq_encode(emb, cb, dim=16).collect()))
        b = sorted(map(tuple, pq_encode(emb.repartition(7), cb, dim=16).collect()))
        assert [(i, list(c)) for i, c in a] == [(i, list(c)) for i, c in b]

    def test_adc_matches_replay_and_reconstruction_ranks_first(self, spark, pq_setup):
        from pdf_extraction_spark.operators.similarity import adc_topk, pq_encode

        mat, cb, vecs, emb = pq_setup
        codes = _pq_replay(vecs, cb)
        # query = exact reconstruction of row 5 -> lut entries for its
        # codes are all 0.0 -> adist 0.0, rank 1 (ties broken by id)
        recon = [float(x) for j in range(4) for x in cb[j][codes[5][j]]]
        top = adc_topk(emb, cb, recon, k=40, dim=16).collect()
        assert top[0]["vec_id"] == min(
            vid for vid, cs in codes.items() if cs == codes[5]
        )
        assert top[0]["adist"] == 0.0
        # full ranking matches the pure-Python lut fold
        lut = {
            (j, c): sum(
                (recon[j * 4 + t] - float(cb[j][c][t])) ** 2 for t in range(4)
            )
            for j in range(4)
            for c in range(4)
        }

        def fold(cs):
            acc = 0.0
            for j in range(4):
                acc = acc + lut[(j, cs[j])]
            return acc

        want = sorted((fold(cs), vid) for vid, cs in codes.items())[:40]
        assert [(r["adist"], r["vec_id"]) for r in top] == want

    def test_encode_filters_null_and_wrong_dim(self, spark, pq_setup):
        from pdf_extraction_spark.operators.similarity import pq_encode

        mat, cb, vecs, emb = pq_setup
        bad = spark.createDataFrame(
            [(900, None), (901, [1.0, 2.0])],
            "vec_id long, embedding array<double>",
        )
        got = pq_encode(emb.unionByName(bad), cb, dim=16).collect()
        ids = {r["vec_id"] for r in got}
        assert 900 not in ids and 901 not in ids and len(ids) == 40

    def test_train_rejects_indivisible_dim(self):
        import numpy as np

        from pdf_extraction_spark.operators.similarity import pq_train_lite

        with pytest.raises(ValueError):
            pq_train_lite(np.zeros((4, 10)), m=3, k=2)


class TestDimsum:
    CORPUS = [
        (i, " ".join(
            (["spark"] * 3 + ["shuffle", "join"]) if i % 3 == 0
            else (["spark", "vector", "batch", "batch"]) if i % 3 == 1
            else (["unrelated", "tokens", "entirely"])
        ), "en", "s", 0)
        for i in range(60)
    ]
    SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

    def _exact_cosines(self):
        """Pure-Python exact term-term cosine over the corpus tf matrix."""
        import math
        import re
        from collections import Counter, defaultdict

        cols = defaultdict(Counter)  # term -> {doc: tf}
        for i, t, *_ in self.CORPUS:
            for w in re.split(r"[^0-9a-z]+", t.lower()):
                if w:
                    cols[w][i] += 1
        out = {}
        terms = sorted(cols)
        for a in terms:
            for b in terms:
                if a < b:
                    dot = sum(cols[a][d] * cols[b][d] for d in cols[a])
                    na = math.sqrt(sum(v * v for v in cols[a].values()))
                    nb = math.sqrt(sum(v * v for v in cols[b].values()))
                    if dot:
                        out[(a, b)] = dot / (na * nb)
        return out

    def test_exact_mode_equals_exact_cosine(self, spark):
        """q = 1 everywhere (huge gamma) => DIMSUM IS exact cosine."""
        from pdf_extraction_spark.operators.similarity import dimsum_cosine

        df = spark.createDataFrame(self.CORPUS, self.SCHEMA)
        got = {
            (r.term_a, r.term_b): r.est_cos
            for r in dimsum_cosine(df, sqrt_gamma=1e9).collect()
        }
        exact = self._exact_cosines()
        assert set(got) == set(exact)
        for k, v in exact.items():
            assert abs(got[k] - v) < 1e-6, (k, got[k], v)

    def test_sampled_estimate_tracks_exact(self, spark):
        """Sampled estimates stay near exact for the well-supported
        pairs (the paper's guarantee zone: both norms >= sqrt(gamma))."""
        from pdf_extraction_spark.operators.similarity import dimsum_cosine

        df = spark.createDataFrame(self.CORPUS, self.SCHEMA)
        sg = 6.0
        got = {
            (r.term_a, r.term_b): r.est_cos
            for r in dimsum_cosine(df, sqrt_gamma=sg).collect()
        }
        exact = self._exact_cosines()
        zone = [k for k, v in exact.items() if v >= 0.5]
        assert zone, "test corpus must have strong pairs"
        errs = [abs(got.get(k, 0.0) - exact[k]) for k in zone]
        assert sum(errs) / len(errs) < 0.25, sorted(
            zip(errs, zone), reverse=True
        )[:5]

    def test_strict_twin_parity(self, spark, tmp_path):
        import duckdb

        from pdf_extraction_spark.operators.similarity import (
            dimsum_cosine,
            sql_dimsum_cosine,
        )

        df = spark.createDataFrame(self.CORPUS, self.SCHEMA)
        pq = str(tmp_path / "docs.parquet")
        df.write.mode("overwrite").parquet(pq)
        got = sorted(
            tuple(r)
            for r in dimsum_cosine(
                spark.read.parquet(pq), sqrt_gamma=6.0, min_sim=0.1
            ).collect()
        )
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pq}/*.parquet'")
        want = sorted(
            tuple(r)
            for r in con.execute(
                sql_dimsum_cosine(sqrt_gamma=6.0, min_sim=0.1)
            ).fetchall()
        )
        assert got == want


class TestCentroidClassify:
    ROWS = [
        # two clean clusters on axes 0 / 1 plus an unlabeled probe
        (0, [1.0, 0.1, 0.0], 0),
        (1, [0.9, -0.1, 0.05], 0),
        (2, [1.1, 0.0, -0.05], 0),
        (3, [0.0, 1.0, 0.1], 1),
        (4, [0.1, 0.9, -0.1], 1),
        (5, [-0.05, 1.1, 0.0], 1),
        (6, [0.95, 0.05, 0.0], None),   # unlabeled: scored, not trained
        (7, [0.05, 1.05, 0.0], None),
        (8, None, 0),                     # NULL vector
        (9, [0.0, 0.0, 0.0], 1),          # zero vector
        (10, [1e7, 0.0, 0.0], 0),         # out-of-domain magnitude
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            self.ROWS, "vec_id long, embedding array<double>, label int"
        )

    def test_semantics(self, spark):
        from pdf_extraction_spark.operators.similarity import centroid_classify

        got = {r.vec_id: r for r in centroid_classify(self._df(spark)).collect()}
        assert set(got) == set(range(11))
        for i in (0, 1, 2, 6):
            assert got[i].pred == 0, i
        for i in (3, 4, 5, 7):
            assert got[i].pred == 1, i
        for i in (8, 9, 10):
            assert got[i].pred is None and got[i].cos6 is None, i
        # cluster members sit close to their centroid
        assert got[0].cos6 > 0.9

    def test_replay_exact(self, spark):
        import math

        from pdf_extraction_spark.operators.similarity import centroid_classify

        got = {r.vec_id: r for r in centroid_classify(self._df(spark)).collect()}
        # pure-Python replay of the quantized integer pipeline
        from collections import defaultdict

        qs, sums, cnts = {}, defaultdict(lambda: defaultdict(int)), defaultdict(lambda: defaultdict(int))
        for vid, v, lbl in self.ROWS:
            if v is None:
                continue
            q = [
                int(round(x * 1e6)) if abs(x) < 300.0 else None for x in v
            ]
            qs[vid] = q
            if lbl is not None:
                for j, qq in enumerate(q):
                    if qq is not None:
                        sums[lbl][j] += qq
                        cnts[lbl][j] += 1
        cent = {
            lbl: {
                j: (s // cnts[lbl][j] if s >= 0 else -((-s) // cnts[lbl][j]))
                for j, s in d.items()
            }
            for lbl, d in sums.items()
        }
        for vid, v, _ in self.ROWS:
            if v is None or any(q is None for q in qs.get(vid, [None])):
                continue
            q = qs[vid]
            vn2 = sum(x * x for x in q)
            best = None
            for lbl, c in sorted(cent.items()):
                cn2 = sum(x * x for x in c.values())
                if vn2 == 0 or cn2 == 0:
                    continue
                dot = sum(q[j] * c[j] for j in c)
                cos = round(dot / math.sqrt(float(vn2) * float(cn2)), 6) + 0.0
                if best is None or cos > best[0]:
                    best = (cos, lbl)
            if best:
                assert (got[vid].cos6, got[vid].pred) == best, vid

    def test_separate_train_and_partition_invariance(self, spark):
        from pdf_extraction_spark.operators.similarity import centroid_classify

        df = self._df(spark)
        train = df.filter(F.col("label").isNotNull())
        score = df.select("vec_id", "embedding")
        a = sorted(
            (tuple(r) for r in centroid_classify(
                score.withColumn("label", F.lit(None).cast("int")),
                train_df=train,
            ).collect()),
            key=repr,
        )
        b = sorted(
            (tuple(r) for r in centroid_classify(
                score.repartition(5).withColumn(
                    "label", F.lit(None).cast("int")
                ),
                train_df=train.repartition(3),
            ).collect()),
            key=repr,
        )
        assert a == b and len(a) == 11

    def test_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.similarity import (
            centroid_classify,
            sql_centroid_classify,
        )

        got = sorted(
            (tuple(r) for r in centroid_classify(self._df(spark)).collect()),
            key=repr,
        )
        con = duckdb.connect()
        con.register(
            "embeddings",
            pd.DataFrame(self.ROWS, columns=["vec_id", "embedding", "label"]),
        )
        want = sorted(
            (
                tuple(r)
                for r in con.execute(
                    sql_centroid_classify("embeddings")
                ).fetchall()
            ),
            key=repr,
        )
        assert got == want
