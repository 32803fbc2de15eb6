"""host_cap / quality classifier / bigram-LM scoring: cross-engine
agreement, determinism, and skew-safety semantics."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.hostcap import host_cap, sql_host_cap
from pdf_extraction_spark.operators.mlfilter import (
    score_bigram_lm,
    score_quality,
    sql_score_bigram_lm,
    sql_score_quality,
    train_bigram_lm,
    train_quality_weights,
)


def _ddb_docs(rows):
    con = duckdb.connect()

    def lit(t):
        return "NULL" if t is None else "'" + t.replace("'", "''") + "'"

    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {lit(t)}, {n if n is not None else 'NULL'}, '{s}')"
            for i, t, n, s in rows
        )
        + ") AS t(doc_id, text, n_chars, source)"
    )
    return con


# ---------------------------------------------------------------------------
# host_cap
# ---------------------------------------------------------------------------

def test_host_cap_matches_window_twin(spark):
    rows = []
    # power-law: host h0 has 400 docs, others 3 each; include score ties
    for i in range(400):
        rows.append((i, "t", (i * 7) % 50, "h0"))
    for h in range(1, 10):
        for j in range(3):
            rows.append((1000 + h * 10 + j, "t", j % 2, f"h{h}"))
    rows.append((9999, "t", None, "h1"))  # null score sorts last

    # NaN scores must rank like NULL (-inf) in BOTH engines — DuckDB's
    # ORDER BY would otherwise put NaN above +inf while Spark sorts it
    # last after negation
    score = F.when(F.col("doc_id") == 9998, F.lit(float("nan"))).otherwise(
        F.col("n_chars").cast("double")
    )
    rows_nan = rows + [(9998, "t", 1, "h2")]
    df = spark.createDataFrame(
        rows_nan, "doc_id long, text string, n_chars long, source string"
    )
    got = host_cap(df, score, k=5).orderBy("source", "host_rank").collect()
    con = _ddb_docs(rows_nan)
    exp = con.execute(
        sql_host_cap(
            "CASE WHEN doc_id = 9998 THEN CAST('nan' AS DOUBLE) "
            "ELSE CAST(n_chars AS DOUBLE) END"
        )
        + " ORDER BY source, host_rank"
    ).fetchall()
    assert [(r.source, r.host_rank, r.doc_id, r.score) for r in got] == exp
    # the cap actually caps: h0 contributes exactly 5
    assert sum(1 for r in got if r.source == "h0") == 5


def test_host_cap_mega_host_stays_bounded(spark):
    # mega-host with many more rows than k*salt_buckets — result is the
    # true global top-k, not a per-bucket artifact
    n = 5000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("h").alias("source"),
        (F.col("id") % 997).cast("double").alias("s"),
    )
    got = host_cap(df, F.col("s"), k=3, fan_in=8).collect()
    top = sorted(((i % 997), i) for i in range(n))
    expect = sorted(top, key=lambda t: (-t[0], t[1]))[:3]
    assert sorted((r.host_rank, r.doc_id) for r in got) == [
        (rk + 1, i) for rk, (_, i) in enumerate(expect)
    ]


# ---------------------------------------------------------------------------
# quality classifier
# ---------------------------------------------------------------------------

WEIGHTS_SQL = (
    "(SELECT printf('%03x', i) AS bucket, "
    "((i * 2654435761) % 2001 - 1000) / 1000.0 AS w FROM range(4096) t(i)) w"
)


def _weights_df(spark):
    return spark.range(4096).select(
        F.format_string("%03x", F.col("id")).alias("bucket"),
        (((F.col("id") * 2654435761) % 2001 - 1000) / 1000.0).alias("w"),
    )


def test_score_quality_matches_twin(spark):
    rows = [
        (0, "the quick brown fox", 19, "s"),
        (1, "the the the the", 15, "s"),
        (2, "", 0, "s"),
        (3, None, None, "s"),
        (4, "completely different words here now", 35, "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long, source string")
    got = (
        score_quality(df, _weights_df(spark), bias=0.1)
        .orderBy("doc_id")
        .collect()
    )
    con = _ddb_docs(rows)
    exp = con.execute(
        sql_score_quality(WEIGHTS_SQL, bias=0.1) + " ORDER BY doc_id"
    ).fetchall()
    assert [(r.doc_id, r.logit, r.prob) for r in got] == exp


def test_train_quality_weights_separates_and_is_deterministic(spark):
    good = [f"solid prose sentence number {i} flows well" for i in range(20)]
    bad = [f"zz qq xx jj vv kk ww {i}" for i in range(20)]
    rows = [(t, 1) for t in good] + [(t, 0) for t in bad]
    labeled = spark.createDataFrame(rows, "text string, label int")
    w1, b1 = train_quality_weights(spark, labeled, n_iter=60)
    w2, b2 = train_quality_weights(spark, labeled, n_iter=60)
    assert b1 == b2
    assert sorted(map(tuple, w1.collect())) == sorted(map(tuple, w2.collect()))
    # duplicate texts (incl. a conflicting label) collapse to one doc:
    # training on the duplicated frame equals training on the clean one
    dup_rows = rows + [(good[0], 1), (good[0], 1), (good[0], 0)]
    w3, b3 = train_quality_weights(
        spark, spark.createDataFrame(dup_rows, "text string, label int"), n_iter=60
    )
    assert b3 == b1
    assert sorted(map(tuple, w3.collect())) == sorted(map(tuple, w1.collect()))
    docs = spark.createDataFrame(
        [(0, good[0]), (1, bad[0])], "doc_id long, text string"
    )
    scored = {r.doc_id: r.prob for r in score_quality(docs, w1, b1).collect()}
    assert scored[0] > 0.5 > scored[1]


# ---------------------------------------------------------------------------
# bigram LM
# ---------------------------------------------------------------------------

def test_bigram_lm_matches_twin(spark):
    rows = [
        (0, "the cat sat on the mat", 22, "s"),
        (1, "the cat sat on the hat", 22, "s"),
        (2, "mat the on sat cat the", 22, "s"),
        (3, "completely unseen words", 23, "s"),
        (4, "the", 3, "s"),
        (5, "", 0, "s"),  # no tokens: absent from both outputs
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long, source string")
    lm = train_bigram_lm(df)
    got = score_bigram_lm(df, lm).orderBy("doc_id").collect()
    con = _ddb_docs(rows)
    exp = con.execute(sql_score_bigram_lm() + " ORDER BY doc_id").fetchall()
    assert [(r.doc_id, r.n_scored, r.avg_logprob) for r in got] == exp
    by_id = {r.doc_id: r.avg_logprob for r in got}
    # fluent-order text scores above its own scrambled tokens
    assert by_id[0] > by_id[2]
    assert 5 not in by_id


def test_bigram_lm_scores_unseen_corpus(spark):
    train = spark.createDataFrame(
        [(0, "a b c a b c"), (1, "a b a b")], "doc_id long, text string"
    )
    lm = train_bigram_lm(train)
    test = spark.createDataFrame(
        [(0, "a b c"), (1, "z z z")], "doc_id long, text string"
    )
    got = {r.doc_id: r.avg_logprob for r in score_bigram_lm(test, lm).collect()}
    assert got[0] > got[1]  # in-domain beats fully-unseen


# ---------------------------------------------------------------------------
# Stupid Backoff trigram LM (Brants et al. 2007)
# ---------------------------------------------------------------------------

def _py_stupid_backoff(corpus, alpha=0.4, floor=1e-9):
    """Pure-Python replay of the Brants recipe over tokenized docs."""
    import math
    import re
    from collections import Counter

    tok = lambda t: [w for w in re.split(r"[^0-9a-z]+", (t or "").lower()) if w]
    docs = {i: tok(t) for i, t in corpus}
    uni, bi, tri = Counter(), Counter(), Counter()
    for ws in docs.values():
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
        tri.update(zip(ws, ws[1:], ws[2:]))
    n = float(sum(uni.values()))
    out = {}
    for i, ws in docs.items():
        if not ws:
            continue
        lps = []
        for p, w in enumerate(ws):
            u = uni.get(w, 0) / n if uni.get(w) else floor
            if p == 0:
                pr = u
            elif p == 1:
                pr = (
                    bi[(ws[0], w)] / uni[ws[0]]
                    if bi.get((ws[0], w))
                    else alpha * u
                )
            else:
                v2, v1 = ws[p - 2], ws[p - 1]
                if tri.get((v2, v1, w)) and bi.get((v2, v1)):
                    pr = tri[(v2, v1, w)] / bi[(v2, v1)]
                elif bi.get((v1, w)):
                    pr = alpha * bi[(v1, w)] / uni[v1]
                else:
                    pr = alpha * alpha * u
            lps.append(math.log10(pr))
        acc = 0.0
        for lp in lps:
            acc += lp
        out[i] = (len(lps), round(acc / len(lps), 6))
    return out


def test_stupid_backoff_matches_python_replay_and_twin(spark):
    from pdf_extraction_spark.operators.mlfilter import (
        score_stupid_backoff,
        sql_score_stupid_backoff,
        train_trigram_lm,
    )

    rows = [
        (0, "the cat sat on the mat", 22, "s"),
        (1, "the cat sat on the hat", 22, "s"),
        (2, "mat the on sat cat the", 22, "s"),
        (3, "completely unseen words", 23, "s"),
        (4, "the cat", 7, "s"),
        (5, "the", 3, "s"),
        (6, "", 0, "s"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, n_chars long, source string"
    )
    lm = train_trigram_lm(df)
    got = score_stupid_backoff(df, lm).orderBy("doc_id").collect()
    # 1) exact vs the pure-Python replay (same fold order, same round)
    ref = _py_stupid_backoff([(i, t) for i, t, _, _ in rows])
    assert {r.doc_id: (r.n_scored, r.avg_logprob) for r in got} == ref
    # 2) exact vs the DuckDB twin
    con = _ddb_docs(rows)
    exp = con.execute(
        sql_score_stupid_backoff() + " ORDER BY doc_id"
    ).fetchall()
    assert [(r.doc_id, r.n_scored, r.avg_logprob) for r in got] == exp
    by_id = {r.doc_id: r.avg_logprob for r in got}
    assert 6 not in by_id
    # fluency property needs HELD-OUT scoring (self-training hands the
    # scrambled doc its own count-1 trigrams): train on docs 0-1 only,
    # then fluent word order beats the same tokens scrambled
    train = spark.createDataFrame(
        [r[:2] for r in rows[:2]], "doc_id long, text string"
    )
    held = spark.createDataFrame(
        [(20, "the cat sat on the mat"), (21, "mat the on sat cat the")],
        "doc_id long, text string",
    )
    ho = {
        r.doc_id: r.avg_logprob
        for r in score_stupid_backoff(held, train_trigram_lm(train)).collect()
    }
    assert ho[20] > ho[21]


def test_stupid_backoff_backoff_ladder(spark):
    """Every CASE branch fires: trigram hit, bigram backoff (with and
    without prev2), double backoff to unigram, OOV floor."""
    import math

    from pdf_extraction_spark.operators.mlfilter import (
        score_stupid_backoff,
        train_trigram_lm,
    )

    train = spark.createDataFrame(
        [(0, "a b c d"), (1, "b c x")], "doc_id long, text string"
    )
    lm = train_trigram_lm(train)
    test = spark.createDataFrame(
        [
            (10, "a b c d"),  # trigram path end-to-end
            (11, "d a"),      # bigram miss at pos 1 -> alpha * uni
            (12, "a b z"),    # trigram+bigram miss -> alpha^2 * floorless uni? z OOV -> floor
            (13, "q"),        # pure OOV unigram floor
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.avg_logprob
        for r in score_stupid_backoff(test, lm).collect()
    }
    # doc 13: single OOV token = log10(floor) exactly
    assert got[13] == round(math.log10(1e-9), 6)
    # seen-everything doc scores strictly above every backoff doc
    assert got[10] > max(got[11], got[12], got[13])


class TestPplBuckets:
    """CCNet tercile bucketing semantics (cross-engine parity of the
    registered query is pinned by the strict ppl_buckets twin)."""

    def _bucket(self, spark, rows):
        from pdf_extraction_spark.operators.mlfilter import bucket_by_lm_score

        scored = spark.createDataFrame(
            rows, "doc_id long, lang string, avg_logprob double"
        )
        out = bucket_by_lm_score(scored).collect()
        return {r["doc_id"]: r["bucket"] for r in out}

    def test_terciles_by_rank_descending(self, spark):
        # 9 docs, distinct scores: exactly 3 per bucket, best scores head
        rows = [(i, "en", -1.0 * i) for i in range(9)]  # doc 0 best
        got = self._bucket(spark, rows)
        assert [got[i] for i in range(9)] == (
            ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
        )

    def test_tie_mass_point_lands_in_better_bucket(self, spark):
        # 6 docs, 4 share the boundary score: the cutoff IS that score,
        # so the whole mass point labels head (discrete-quantile rule)
        rows = [(0, "en", -1.0)] + [(i, "en", -2.0) for i in range(1, 5)] + [
            (5, "en", -3.0)
        ]
        got = self._bucket(spark, rows)
        assert got[0] == "head"
        assert all(got[i] == "head" for i in range(1, 5))
        assert got[5] == "tail"

    def test_languages_bucket_independently(self, spark):
        # a score that is head-grade in a weak language is tail-grade in
        # a strong one
        rows = [(i, "en", -1.0 * i) for i in range(9)] + [
            (100 + i, "de", -10.0 - i) for i in range(3)
        ]
        got = self._bucket(spark, rows)
        assert got[100] == "head" and got[102] == "tail"
        assert got[8] == "tail"  # -8 is tail for en despite beating all de

    def test_single_doc_language_is_head(self, spark):
        got = self._bucket(spark, [(1, "fr", -5.0)])
        assert got == {1: "head"}

    def test_null_lang_buckets_among_itself(self, spark):
        # unidentified-language docs must not vanish: they form their
        # own group via the null-safe cutoff lookup
        rows = [(i, "en", -1.0 * i) for i in range(3)] + [
            (100, None, -50.0),
            (101, None, -60.0),
            (102, None, -70.0),
        ]
        got = self._bucket(spark, rows)
        assert len(got) == 6
        assert got[100] == "head" and got[101] == "middle" and got[102] == "tail"

    def test_batch_invariants_random_scores(self, spark):
        # seeded random scores across languages, one job: per language,
        # head must hold at least ceil(n/3) docs and tail at most
        # n - ceil(2n/3) (tie mass points only ever inflate the BETTER
        # bucket), and every input doc appears exactly once
        import math
        import random

        rng = random.Random(13)
        rows = []
        i = 0
        for lang, n in (("en", 97), ("de", 31), ("fr", 7), ("xx", 1)):
            for _ in range(n):
                rows.append((i, lang, round(rng.uniform(-9, -1), 2)))
                i += 1
        from pdf_extraction_spark.operators.mlfilter import bucket_by_lm_score

        scored = spark.createDataFrame(
            rows, "doc_id long, lang string, avg_logprob double"
        )
        got = bucket_by_lm_score(scored).collect()
        assert len(got) == len(rows)
        per_lang = {}
        for r in got:
            per_lang.setdefault(r["lang"], []).append(r["bucket"])
        for lang, buckets in per_lang.items():
            n = len(buckets)
            k1 = math.ceil(n / 3)
            k2 = math.ceil(2 * n / 3)
            heads = buckets.count("head")
            tails = buckets.count("tail")
            assert heads >= k1, (lang, heads, k1)
            assert tails <= n - k2, (lang, tails, n - k2)


# ---------------------------------------------------------------------------
# group_sample
# ---------------------------------------------------------------------------


def _py_group_sample(rows, k, salt="sample"):
    """Pure-Python replay: k smallest md5(id‖salt) ranks per group."""
    import hashlib

    by_grp = {}
    for gid, did in rows:
        r = hashlib.md5((str(did) + salt).encode()).hexdigest()
        by_grp.setdefault(gid, []).append((r, did))
    out = []
    for gid, members in by_grp.items():
        for i, (_, did) in enumerate(sorted(members)[:k], 1):
            out.append((gid, i, did))
    return sorted(out, key=lambda t: (str(t[0]), t[1]))


def test_group_sample_matches_reference_and_twin(spark):
    import duckdb

    from pdf_extraction_spark.operators.hostcap import (
        group_sample,
        sql_group_sample,
    )

    rows = [(f"s{i % 5}", i) for i in range(200)] + [("tiny", 999)]
    df = spark.createDataFrame(
        [(g, d) for g, d in rows], "source string, doc_id long"
    )
    got = sorted(
        (tuple(r) for r in group_sample(df, k=3).collect()),
        key=lambda t: (str(t[0]), t[1]),
    )
    assert got == _py_group_sample(rows, 3)
    # groups smaller than k keep all members
    assert sum(1 for g, _, _ in got if g == "tiny") == 1
    # every big group yields exactly k
    for s in range(5):
        assert sum(1 for g, _, _ in got if g == f"s{s}") == 3
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(source VARCHAR, doc_id BIGINT)")
    for g, d in rows:
        con.execute("INSERT INTO documents VALUES (?, ?)", [g, d])
    orows = sorted(
        map(tuple, con.execute(sql_group_sample(k=3)).fetchall()),
        key=lambda t: (str(t[0]), t[1]),
    )
    assert got == orows


def test_group_sample_partition_invariant_and_uniform(spark):
    from pdf_extraction_spark.operators.hostcap import group_sample

    df = spark.createDataFrame(
        [("g", i) for i in range(1000)], "source string, doc_id long"
    )
    a = sorted(tuple(r) for r in group_sample(df.repartition(1), k=50).collect())
    b = sorted(tuple(r) for r in group_sample(df.repartition(17), k=50).collect())
    assert a == b and len(a) == 50
    # uniformity: the sampled ids are spread over the id range, not a
    # contiguous head (md5 rank is independent of id order)
    ids = sorted(t[2] for t in a)
    assert ids[0] < 100 and ids[-1] > 900
    spread = max(ids[i + 1] - ids[i] for i in range(len(ids) - 1))
    assert spread < 250  # no quarter-range gap in a 50-of-1000 sample


def test_group_sample_null_keys(spark):
    """NULL group is a real group; NULL id ranks via the '' fallback."""
    from pdf_extraction_spark.operators.hostcap import group_sample

    df = spark.createDataFrame(
        [(None, 1), (None, 2), ("a", None), ("a", 3)],
        "source string, doc_id long",
    )
    got = group_sample(df, k=2).collect()
    assert sum(1 for r in got if r.source is None) == 2
    assert sum(1 for r in got if r.source == "a") == 2


# ---------------------------------------------------------------------------
# gate_auc — exact Mann-Whitney ROC-AUC
# ---------------------------------------------------------------------------


class TestGateAuc:
    def _auc(self, spark, rows, group=None):
        from pdf_extraction_spark.operators.mlfilter import gate_auc

        df = spark.createDataFrame(
            rows, "id long, score double, label int, grp string"
        )
        return gate_auc(df, "score", "label", group).collect()

    def test_matches_pairwise_definition(self, spark):
        import random

        rng = random.Random(11)
        rows = [
            (i, rng.choice([0.1, 0.3, 0.3, 0.7, 0.9]), int(rng.random() < 0.5), "g")
            for i in range(300)
        ]
        [r] = self._auc(spark, rows)
        pos = [s for _, s, y, _ in rows if y]
        neg = [s for _, s, y, _ in rows if not y]
        u = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
        assert r.auc_ppm == int(u * 1e6 // (len(pos) * len(neg)))

    def test_perfect_and_inverted_and_random(self, spark):
        rows = [(i, float(i), int(i >= 5), "g") for i in range(10)]
        [r] = self._auc(spark, rows)
        assert r.auc_ppm == 1_000_000  # perfect separation
        rows = [(i, float(-i), int(i >= 5), "g") for i in range(10)]
        [r] = self._auc(spark, rows)
        assert r.auc_ppm == 0  # perfectly inverted
        rows = [(i, 1.0, i % 2, "g") for i in range(10)]
        [r] = self._auc(spark, rows)
        assert r.auc_ppm == 500_000  # all tied = coin flip

    def test_degenerate_groups_null(self, spark):
        rows = [(0, 1.0, 1, "allpos"), (1, 2.0, 1, "allpos"),
                (2, 1.0, 0, "allneg")]
        out = {r.grp: r.auc_ppm for r in self._auc(spark, rows, "grp")}
        assert out == {"allpos": None, "allneg": None}

    def test_null_rows_dropped(self, spark):
        rows = [(0, None, 1, "g"), (1, 1.0, None, "g"),
                (2, 2.0, 1, "g"), (3, 1.0, 0, "g")]
        [r] = self._auc(spark, rows)
        assert (r.n_pos, r.n_neg, r.auc_ppm) == (1, 1, 1_000_000)


class TestGatePrCurve:
    def test_matches_bruteforce_sweep(self, spark):
        import random

        from pdf_extraction_spark.operators.mlfilter import gate_pr_curve

        rng = random.Random(5)
        rows = [
            (i, rng.choice([1.0, 2.0, 3.0, 4.0]), int(rng.random() < 0.3))
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, "id long, score double, label int")
        out = {r.thr: r for r in gate_pr_curve(df, "score", "label").collect()}
        n_pos = sum(y for _, _, y in rows)
        for thr in (1.0, 2.0, 3.0, 4.0):
            tp = sum(1 for _, s, y in rows if s >= thr and y)
            fp = sum(1 for _, s, y in rows if s >= thr and not y)
            r = out[thr]
            assert (r.tp, r.fp) == (tp, fp)
            assert r.fn == n_pos - tp
            assert r.precision_ppm == 10**6 * tp // (tp + fp)
            assert r.recall_ppm == 10**6 * tp // n_pos
        # lowest threshold = predict-everything: recall 100%
        assert out[1.0].recall_ppm == 1_000_000

    def test_monotone_tp_and_no_empty_thresholds(self, spark):
        from pdf_extraction_spark.operators.mlfilter import gate_pr_curve

        rows = [(i, float(i % 7), int(i % 3 == 0)) for i in range(100)]
        df = spark.createDataFrame(rows, "id long, score double, label int")
        out = sorted(
            gate_pr_curve(df, "score", "label").collect(),
            key=lambda r: -r.thr,
        )
        tps = [r.tp for r in out]
        assert tps == sorted(tps)  # tp non-decreasing as thr drops
        assert all(r.tp + r.fp > 0 for r in out)


class TestRankCorr:
    def _rho(self, spark, pts, group=None):
        from pdf_extraction_spark.operators.mlfilter import rank_corr

        df = spark.createDataFrame(
            [(i, x, y, "g") for i, (x, y) in enumerate(pts)],
            "id long, x double, y double, grp string",
        )
        return rank_corr(df, "x", "y", group).collect()

    def test_perfect_monotone_is_one(self, spark):
        [r] = self._rho(spark, [(float(i), float(i * i)) for i in range(20)])
        assert r.rho == 1.0
        [r] = self._rho(spark, [(float(i), float(-i)) for i in range(20)])
        assert r.rho == -1.0

    def test_ties_use_midranks(self, spark):
        # x has heavy ties; compare against the textbook midrank Pearson
        import math

        pts = [(float(i % 3), float(i % 5)) for i in range(30)]
        [r] = self._rho(spark, pts)

        def mid(vals):
            from collections import Counter

            c, out, cb = Counter(vals), {}, 0
            for v in sorted(c):
                out[v] = 2 * cb + c[v] + 1
                cb += c[v]
            return out

        mx, my = mid([p[0] for p in pts]), mid([p[1] for p in pts])
        rx = [mx[p[0]] for p in pts]
        ry = [my[p[1]] for p in pts]
        n = len(pts)
        num = n * sum(a * b for a, b in zip(rx, ry)) - sum(rx) * sum(ry)
        den = math.sqrt(
            (n * sum(a * a for a in rx) - sum(rx) ** 2)
            * (n * sum(b * b for b in ry) - sum(ry) ** 2)
        )
        assert r.rho == round(num / den, 6)

    def test_zero_variance_is_null(self, spark):
        [r] = self._rho(spark, [(1.0, float(i)) for i in range(10)])
        assert r.rho is None


class TestGateCalibration:
    def test_perfectly_calibrated_gate_has_zero_gap(self, spark):
        from pdf_extraction_spark.operators.mlfilter import gate_calibration

        # prob p in {0.25, 0.75}, labels matching exactly p of rows
        rows = []
        i = 0
        for p, n, pos in ((0.25, 40, 10), (0.75, 40, 30)):
            for j in range(n):
                rows.append((i, p, int(j < pos)))
                i += 1
        df = spark.createDataFrame(rows, "id long, prob double, label int")
        out = {r.bin: r for r in gate_calibration(df, "prob", "label").collect()}
        assert out[2].mean_pred_ppm == 250_000 and out[2].observed_ppm == 250_000
        assert out[2].gap_ppm == 0
        assert out[7].gap_ppm == 0 and out[7].n == 40

    def test_clamping_and_top_bin(self, spark):
        from pdf_extraction_spark.operators.mlfilter import gate_calibration

        rows = [(0, -0.5, 0), (1, 1.7, 1), (2, 1.0, 1), (3, 0.999, 0)]
        df = spark.createDataFrame(rows, "id long, prob double, label int")
        out = {r.bin: r for r in gate_calibration(df, "prob", "label").collect()}
        assert set(out) == {0, 9}
        assert out[0].n == 1 and out[0].mean_pred_ppm == 0
        assert out[9].n == 3  # 1.7 and 1.0 clamp into the top bin
        assert out[9].mean_pred_ppm <= 1_000_000

    def test_miscalibrated_gate_shows_signed_gap(self, spark):
        from pdf_extraction_spark.operators.mlfilter import gate_calibration

        # gate claims 0.9 but only 50% are positive: gap negative
        rows = [(i, 0.9, int(i % 2 == 0)) for i in range(20)]
        df = spark.createDataFrame(rows, "id long, prob double, label int")
        [r] = gate_calibration(df, "prob", "label").collect()
        assert r.gap_ppm == 500_000 - 900_000


class TestNaiveBayes:
    ROWS = [
        (0, "buy pills cheap pills buy now", "spam"),
        (1, "cheap pills deal buy deal", "spam"),
        (2, "the garden held morning light", "news"),
        (3, "morning light on the garden path", "news"),
        (4, "buy the garden pills light", None),  # unlabeled: scored, not trained
        (5, "", "news"),
        (6, None, "spam"),
    ]

    def _replay(self, rows):
        import math
        import re
        from collections import Counter

        def toks(t):
            return [
                w
                for w in re.split(r"[ \t\n\x0B\f\r]+", (t or "").lower())
                if w
            ]

        def iln(x):
            return int(round(math.log(x) * 1e9))

        labeled = [(d, t, g) for d, t, g in rows if g is not None]
        cw, ctok, cdoc = Counter(), Counter(), Counter()
        for _, t, g in labeled:
            cdoc[g] += 1
            for w in toks(t):
                cw[(g, w)] += 1
                ctok[g] += 1
        vocab = len(set(w for _, w in cw))
        n_docs = len(labeled)
        preds = {}
        for d, t, _ in rows:
            scores = []
            tf = Counter(toks(t))
            n_d = sum(tf.values())
            for g in cdoc:
                s = iln(cdoc[g]) - iln(n_docs)
                s -= n_d * iln(max(ctok[g] + vocab, 1))
                s += sum(
                    c * iln(cw[(g, w)] + 1) for w, c in tf.items() if (g, w) in cw
                )
                scores.append((s, g))
            scores.sort(key=lambda x: (-x[0], x[1]))
            margin = scores[0][0] - scores[1][0] if len(scores) > 1 else None
            preds[d] = (scores[0][1], scores[0][0], margin)
        return preds

    def test_replay_parity(self, spark):
        from pdf_extraction_spark.operators.mlfilter import naive_bayes_classify

        df = spark.createDataFrame(
            self.ROWS, "doc_id long, text string, source string"
        )
        got = {r.doc_id: r for r in naive_bayes_classify(df).collect()}
        want = self._replay(self.ROWS)
        assert set(got) == set(want)
        for d, (pred, score, margin) in want.items():
            assert got[d].pred == pred, d
            assert got[d].score_nano == score, d
            assert got[d].margin_nano == margin, d

    def test_semantics(self, spark):
        from pdf_extraction_spark.operators.mlfilter import naive_bayes_classify

        df = spark.createDataFrame(
            self.ROWS, "doc_id long, text string, source string"
        )
        got = {r.doc_id: r for r in naive_bayes_classify(df).collect()}
        # spam/news vocab separates cleanly
        assert got[0].pred == "spam" and got[1].pred == "spam"
        assert got[2].pred == "news" and got[3].pred == "news"
        # the unlabeled doc is scored (never trained on) with positive margin
        assert got[4].pred in ("spam", "news") and got[4].margin_nano is not None
        # empty/NULL text scores on priors alone: spam has 3 labeled docs
        # vs news 3 → tie on prior, tie-break to lexicographically first
        assert got[5].pred == got[6].pred

    def test_separate_train_frame(self, spark):
        from pdf_extraction_spark.operators.mlfilter import naive_bayes_classify

        train = spark.createDataFrame(
            [(10, "alpha beta beta", "a"), (11, "gamma delta delta", "b")],
            "doc_id long, text string, source string",
        )
        score = spark.createDataFrame(
            [(0, "beta beta unseen"), (1, "delta gamma")],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r.pred
            for r in naive_bayes_classify(
                score.withColumn("source", F_lit_none()), train_df=train
            ).collect()
        }
        assert got == {0: "a", 1: "b"}

    def test_partition_invariance(self, spark):
        from pdf_extraction_spark.operators.mlfilter import naive_bayes_classify

        df = spark.createDataFrame(
            self.ROWS, "doc_id long, text string, source string"
        )
        a = sorted(map(tuple, naive_bayes_classify(df).collect()), key=repr)
        b = sorted(
            map(tuple, naive_bayes_classify(df.repartition(5)).collect()),
            key=repr,
        )
        assert a == b

    def test_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.mlfilter import (
            naive_bayes_classify,
            sql_naive_bayes,
        )

        df = spark.createDataFrame(
            self.ROWS, "doc_id long, text string, source string"
        )
        got = sorted(
            (tuple(r) for r in naive_bayes_classify(df).collect()), key=repr
        )
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame(self.ROWS, columns=["doc_id", "text", "source"]),
        )
        want = sorted(
            (tuple(r) for r in con.execute(sql_naive_bayes("documents")).fetchall()),
            key=repr,
        )
        assert got == want


def F_lit_none():
    from pyspark.sql import functions as F

    return F.lit(None).cast("string")


class TestKsTest:
    ROWS = (
        [(i, 10 + i % 5, "a") for i in range(20)]          # values 10..14
        + [(100 + i, 30 + i % 5, "b") for i in range(20)]  # disjoint: D = 1
        + [(200 + i, 10 + i % 5, "c") for i in range(10)]  # same dist as a
        + [(300, 12, None), (301, None, "a")]              # NULL stratum / value
    )

    def _replay(self, rows):
        import math
        from collections import Counter, defaultdict

        pts = [(g, v) for _, v, g in rows if v is not None]
        per = defaultdict(Counter)
        for g, v in pts:
            per[g][v] += 1
        allv = sorted({v for _, v in pts})
        n_all = len(pts)
        out = {}
        for g, cnt in per.items():
            n_g = sum(cnt.values())
            n_rest = n_all - n_g
            cg = ca = 0
            best = 0
            cnt_all = Counter(v for _, v in pts)
            for v in allv:
                cg += cnt[v]
                ca += cnt_all[v]
                best = max(best, abs(cg * n_rest - (ca - cg) * n_g))
            d_ppm = best * 10**6 // (n_g * n_rest) if n_g and n_rest else None
            lam = (
                round(
                    (best / (float(n_g) * float(n_rest)))
                    * math.sqrt(float(n_g) * float(n_rest) / float(n_g + n_rest)),
                    6,
                )
                + 0.0
                if n_g and n_rest
                else None
            )
            out[g] = (n_g, n_rest, best, d_ppm, lam)
        return out

    def test_replay_and_semantics(self, spark):
        from pdf_extraction_spark.operators.mlfilter import ks_test

        df = spark.createDataFrame(self.ROWS, "id long, v long, grp string")
        got = {r.grp: r for r in ks_test(df, "v", "grp").collect()}
        want = self._replay(self.ROWS)
        assert set(got) == set(want)
        for g, (n_g, n_rest, d_num, d_ppm, lam) in want.items():
            r = got[g]
            assert (r.n_g, r.n_rest, r.d_num, r.d_ppm) == (n_g, n_rest, d_num, d_ppm), g
            assert r.lambda_6 == lam, g
        # disjoint supports → D = 1 exactly
        assert got["b"].d_ppm == 10**6
        # c is distributed like the (a-dominated) rest → far smaller D
        assert got["c"].d_ppm < got["b"].d_ppm
        # NULL group is a real stratum
        assert None in got

    def test_twin_parity_and_partition_invariance(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.mlfilter import ks_test, sql_ks_test

        df = spark.createDataFrame(self.ROWS, "id long, v long, grp string")
        got = sorted((tuple(r) for r in ks_test(df, "v", "grp").collect()), key=repr)
        got2 = sorted(
            (tuple(r) for r in ks_test(df.repartition(7), "v", "grp").collect()),
            key=repr,
        )
        assert got == got2
        con = duckdb.connect()
        con.register("t", pd.DataFrame(self.ROWS, columns=["id", "v", "grp"]))
        want = sorted(
            (tuple(r) for r in con.execute(sql_ks_test("t", "v", "grp")).fetchall()),
            key=repr,
        )
        assert got == want


class TestJsDivergence:
    ROWS = [
        (0, "alpha beta gamma delta epsilon", "a"),
        (1, "alpha beta gamma delta zeta", "a"),
        (2, "omega psi chi phi upsilon", "b"),      # disjoint vocabulary
        (3, "alpha beta gamma delta epsilon", "c"),  # mirrors source a
        (4, "alpha beta", None),                     # NULL stratum
        (5, "", "a"),
        (6, None, "b"),
    ]

    def _replay(self, rows):
        import math
        from collections import Counter, defaultdict

        def toks(t):
            return (t or "").lower().split()

        per = defaultdict(Counter)
        corpus = Counter()
        for _, t, g in rows:
            for w in toks(t):
                per[g][w] += 1
                corpus[w] += 1
        n_c = sum(corpus.values())

        def iln(x):
            return int(round(math.log(x) * 1e9))

        out = {}
        for g, cnt in per.items():
            if not cnt:
                continue
            n_g = sum(cnt.values())
            s1 = s2 = 0
            for w, b in corpus.items():
                a = cnt.get(w, 0)
                m = a * n_c + b * n_g
                if a:
                    s1 += a * (iln(2 * a * n_c) - iln(m))
                s2 += b * (iln(2 * b * n_g) - iln(m))
            js = (s1 / (n_g * 1e9) + s2 / (n_c * 1e9)) * 0.5
            out[g] = round(js, 6) + 0.0
        return out

    def test_replay_and_bounds(self, spark):
        import math

        from pdf_extraction_spark.operators.textanalysis import js_divergence

        df = spark.createDataFrame(
            self.ROWS, "doc_id long, text string, source string"
        )
        got = {r.source: r for r in js_divergence(df).collect()}
        want = self._replay(self.ROWS)
        assert set(got) == set(want)
        for g, js in want.items():
            assert got[g].js_to_corpus == js, g
            assert -1e-9 <= got[g].js_to_corpus <= math.log(2) + 1e-9
        # the disjoint-vocab source is the clear outlier; the mirror
        # of a dominant source sits closest to the corpus
        assert got["b"].js_to_corpus == max(r.js_to_corpus for r in got.values())
        assert None in got  # NULL stratum is real

    def test_twin_parity_and_partition_invariance(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.textanalysis import (
            js_divergence,
            sql_js_divergence,
        )

        df = spark.createDataFrame(
            self.ROWS, "doc_id long, text string, source string"
        )
        got = sorted((tuple(r) for r in js_divergence(df).collect()), key=repr)
        got2 = sorted(
            (tuple(r) for r in js_divergence(df.repartition(5)).collect()),
            key=repr,
        )
        assert got == got2
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame(self.ROWS, columns=["doc_id", "text", "source"]),
        )
        want = sorted(
            (
                tuple(r)
                for r in con.execute(sql_js_divergence("documents")).fetchall()
            ),
            key=repr,
        )
        assert got == want


class TestCramersV:
    def test_perfect_association_and_independence(self, spark):
        from pdf_extraction_spark.operators.mlfilter import cramers_v

        # perfect: b is a function of a -> V = 1
        rows = [(i, f"a{i % 3}", f"b{i % 3}") for i in range(30)]
        df = spark.createDataFrame(rows, "id long, x string, y string")
        [r] = cramers_v(df, "x", "y").collect()
        assert (r.r, r.c) == (3, 3) and r.v6 == 1.0
        # independent uniform grid -> chi2 == 0 exactly
        rows2 = [(i, f"a{i % 2}", f"b{(i // 2) % 2}") for i in range(40)]
        df2 = spark.createDataFrame(rows2, "id long, x string, y string")
        [r2] = cramers_v(df2, "x", "y").collect()
        assert r2.chi2 == 0.0 and r2.v6 == 0.0

    def test_null_category_and_degenerate(self, spark):
        from pdf_extraction_spark.operators.mlfilter import cramers_v

        rows = [(0, None, "b0"), (1, None, "b1"), (2, "a", "b0"), (3, "a", "b1")]
        df = spark.createDataFrame(rows, "id long, x string, y string")
        [r] = cramers_v(df, "x", "y").collect()
        assert r.r == 2  # NULL is a real category
        # single-category column -> NULL v6
        rows2 = [(i, "only", f"b{i % 3}") for i in range(9)]
        [r2] = cramers_v(
            spark.createDataFrame(rows2, "id long, x string, y string"),
            "x",
            "y",
        ).collect()
        assert r2.v6 is None

    def test_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.mlfilter import (
            cramers_v,
            sql_cramers_v,
        )

        rows = [
            (i, None if i % 7 == 0 else f"a{i % 3}", f"b{(i * 3) % 4}")
            for i in range(50)
        ]
        df = spark.createDataFrame(rows, "id long, x string, y string")
        [got] = cramers_v(df, "x", "y").collect()
        con = duckdb.connect()
        con.register("t", pd.DataFrame(rows, columns=["id", "x", "y"]))
        [want] = con.execute(sql_cramers_v("t", "x", "y")).fetchall()
        assert tuple(got) == want
