"""Crawl-loop continuation operators: snapshot change tracking,
politeness frontier scheduling, HITS hubs/authorities, and Flesch
readability — semantics unit tests plus sf0.001 strict-oracle parity
(the full-suite parity lives in tests/oracle_check.py)."""

import sys

import duckdb
import pytest

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# snapshot_changes
# ---------------------------------------------------------------------------


def _snaps(spark, rows):
    return spark.createDataFrame(rows, "url string, warc_ts long, text string")


def test_snapshot_changes_buckets_and_rates(spark):
    from pdf_extraction_spark.operators.crawl import snapshot_changes

    rows = [
        # hot: changes every snapshot (rate 1.0)
        ("u/hot", 1, "a"), ("u/hot", 2, "b"), ("u/hot", 3, "c"),
        # cold: never changes (rate 0.0)
        ("u/cold", 1, "x"), ("u/cold", 2, "x"), ("u/cold", 3, "x"),
        # warm: 1 change over 4 intervals (rate 0.25)
        ("u/warm", 1, "p"), ("u/warm", 2, "p"), ("u/warm", 3, "q"),
        ("u/warm", 4, "q"), ("u/warm", 5, "q"),
        # new: single snapshot
        ("u/new", 9, "z"),
    ]
    out = {
        r["url"]: r
        for r in snapshot_changes(_snaps(spark, rows), ts_col="warc_ts").collect()
    }
    assert out["u/hot"]["recrawl"] == "hot"
    assert out["u/hot"]["change_rate"] == 1.0
    assert out["u/cold"]["recrawl"] == "cold"
    assert out["u/cold"]["change_rate"] == 0.0
    assert out["u/warm"]["recrawl"] == "warm"
    assert out["u/warm"]["change_rate"] == 0.25
    assert out["u/new"]["recrawl"] == "new"
    assert out["u/new"]["change_rate"] is None
    assert out["u/new"]["n_changes"] == 0
    assert out["u/warm"]["first_ts"] == 1 and out["u/warm"]["last_ts"] == 5


def test_snapshot_changes_null_safe_compare(spark):
    """NULL→'x' is a change; NULL→NULL is not (IS DISTINCT FROM)."""
    from pdf_extraction_spark.operators.crawl import snapshot_changes

    rows = [
        ("u/n1", 1, None), ("u/n1", 2, None), ("u/n1", 3, "x"),
    ]
    r = snapshot_changes(_snaps(spark, rows), ts_col="warc_ts").collect()[0]
    assert r["n_changes"] == 1
    assert r["recrawl"] == "hot"  # 2*1 >= 2


def test_snapshot_half_up_rate(spark):
    """Rate rounding is half-up in the integer domain: 1 change over
    3 intervals = 0.333333 (truncation would read 0.333333 too, so pin
    a genuine half case: 1/8 = 0.125 exactly, and 1/3 at 6dp)."""
    from pdf_extraction_spark.operators.crawl import snapshot_changes

    rows = [("u/t", i, "a" if i < 2 else "b") for i in range(1, 5)]
    r = snapshot_changes(_snaps(spark, rows), ts_col="warc_ts").collect()[0]
    assert r["change_rate"] == 0.333333


# ---------------------------------------------------------------------------
# frontier_schedule
# ---------------------------------------------------------------------------


def test_frontier_waves_interleave_hosts(spark):
    from pdf_extraction_spark.operators.crawl import frontier_schedule

    rows = [
        ("a/1", "a", 10), ("a/2", "a", 30), ("a/3", "a", 20),
        ("b/1", "b", 5),
        ("c/1", None, 7), ("c/2", None, 7),
    ]
    df = spark.createDataFrame(rows, "url string, host string, priority long")
    out = {r["url"]: r["wave"] for r in frontier_schedule(df).collect()}
    # host a ranks by priority desc
    assert out["a/2"] == 1 and out["a/3"] == 2 and out["a/1"] == 3
    # host b has a single candidate
    assert out["b/1"] == 1
    # NULL hosts form ONE politeness bucket; tie on priority → url asc
    assert out["c/1"] == 1 and out["c/2"] == 2


def test_frontier_wave_is_per_host_rank(spark):
    """At most one url per (host, wave) — the politeness invariant."""
    from pdf_extraction_spark.operators.crawl import frontier_schedule
    from pyspark.sql import functions as F

    rows = [(f"h{i % 5}/p{i}", f"h{i % 5}", i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "url string, host string, priority long")
    out = frontier_schedule(df)
    dup = out.groupBy("host", "wave").count().filter(F.col("count") > 1).count()
    assert dup == 0


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------


def test_hits_hub_authority_separation(spark):
    from pdf_extraction_spark.operators.components import hits

    edges = spark.createDataFrame(
        [
            ("h1", "a1"), ("h1", "a2"),
            ("h2", "a1"), ("h2", "a2"),
            ("h3", "a1"),
        ],
        "src string, dst string",
    )
    out = {r["node"]: r for r in hits(edges, n_iter=5).collect()}
    # pure hubs have zero authority; pure authorities zero hub
    for h in ("h1", "h2", "h3"):
        assert out[h]["authority"] == 0.0
    for a in ("a1", "a2"):
        assert out[a]["hub"] == 0.0
    # a1 (3 in-links from hubs) outranks a2 (2)
    assert out["a1"]["authority"] > out["a2"]["authority"] > 0
    # h1 and h2 (2 out-links each, same targets) tie and beat h3
    assert out["h1"]["hub"] == out["h2"]["hub"]
    assert out["h1"]["hub"] > out["h3"]["hub"] > 0


def test_hits_hygiene_and_empty(spark):
    from pdf_extraction_spark.operators.components import hits

    edges = spark.createDataFrame(
        [("x", "x"), ("x", None), (None, "y"), ("x", "y"), ("x", "y")],
        "src string, dst string",
    )
    out = {r["node"]: r for r in hits(edges, n_iter=3).collect()}
    # self-loops / NULLs dropped, parallel edges collapse → one real edge
    assert set(out) == {"x", "y"}
    assert out["x"]["hub"] > 0 and out["y"]["authority"] > 0
    empty = spark.createDataFrame([], "src string, dst string")
    assert hits(empty, n_iter=2).count() == 0


def test_hits_partitioning_invariance(spark):
    """Exact integer arithmetic → identical output under repartition."""
    from pdf_extraction_spark.operators.components import hits

    edges = spark.createDataFrame(
        [(f"s{i % 7}", f"d{(i * i) % 11}") for i in range(60)],
        "src string, dst string",
    )
    a = sorted(map(tuple, hits(edges, n_iter=4).collect()))
    b = sorted(map(tuple, hits(edges.repartition(13), n_iter=4).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# readability
# ---------------------------------------------------------------------------


def test_readability_known_values(spark):
    from pdf_extraction_spark.operators.textanalysis import with_readability

    df = spark.createDataFrame(
        [
            (1, "The cat sat on the mat. It was fat."),
            (2, "Programming"),
            (3, "zzz."),
            (4, ""),
            (5, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in with_readability(df).collect()}
    r1 = out[1]
    assert (r1["rd_words"], r1["rd_sents"], r1["rd_syllables"]) == (9, 2, 9)
    assert r1["flesch"] == 117.6675
    assert r1["fk_grade"] == 0.0  # raw -2.035 clamps at 0
    r2 = out[2]
    assert (r2["rd_words"], r2["rd_sents"], r2["rd_syllables"]) == (1, 1, 3)
    assert r2["flesch"] == 0.0  # raw negative clamps
    assert r2["fk_grade"] == 20.2
    # vowelless token floors at 1 syllable
    assert out[3]["rd_syllables"] == 1
    # zero-word docs: NULL scores
    for d in (4, 5):
        assert out[d]["rd_words"] == 0
        assert out[d]["flesch"] is None and out[d]["fk_grade"] is None


# ---------------------------------------------------------------------------
# parse_sitemap
# ---------------------------------------------------------------------------


def test_sitemap_fields_and_edge_trim(spark):
    from pdf_extraction_spark.operators.crawl import parse_sitemap

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://h/p1</loc></url>"
        "<url><loc>\n  https://h/p2 \n</loc><lastmod>2024-03-01</lastmod></url>"
        "<url><loc>https://h/p3</loc><changefreq>daily</changefreq>"
        "<priority>0.8</priority></url>"
        "<url><lastmod>2024-01-01</lastmod></url>"  # loc-less → dropped
        "<url><loc>https://h/p5</loc><priority>high</priority></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([("h", xml), ("h2", None)], "host string, sitemap_xml string")
    out = {r["loc"]: r for r in parse_sitemap(df).collect()}
    assert set(out) == {"https://h/p1", "https://h/p2", "https://h/p3", "https://h/p5"}
    assert out["https://h/p2"]["lastmod"] == "2024-03-01"
    assert out["https://h/p3"]["changefreq"] == "daily"
    assert out["https://h/p3"]["priority"] == 0.8
    # unparsable priority → NULL, minimal entry → all-NULL fields
    assert out["https://h/p5"]["priority"] is None
    assert out["https://h/p1"]["lastmod"] is None


# ---------------------------------------------------------------------------
# containment_pairs
# ---------------------------------------------------------------------------


def test_containment_asymmetric(spark):
    """A small doc fully inside a big one reads 1.0 in the small→big
    direction; the reverse direction reads the small fraction and is
    gated out — the case symmetric Jaccard can never pair."""
    from pdf_extraction_spark.operators.dedup import containment_pairs

    small = "alpha beta gamma delta epsilon"
    big = small + " " + " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, small), (2, big), (3, "unrelated text entirely different words here")],
        "doc_id long, text string",
    )
    out = {(r["src_id"], r["dst_id"]): r["containment"]
           for r in containment_pairs(df, threshold_pct=50).collect()}
    assert out[(1, 2)] == 1.0
    assert (2, 1) not in out  # big is NOT contained in small
    assert not any(3 in k for k in out)


NEW_QUERIES = [
    "host_hits",
    "readability",
    "snapshot_delta",
    "frontier_sched",
    "containment",
    "sitemap_parse",
    "crawl_plan",
    "domain_parse",
    "template_pages",
    "url_traps",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in ["documents", "embeddings", "events"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_new_query_matches_oracle(spark, oracle_con, name):
    from oracle_check import normalize

    import __spark_entry__ as e

    sdf = e.queries()[name](spark, SF)
    scols = sdf.columns
    srows = [r.asDict() for r in sdf.collect()]
    res = oracle_con.execute(e.oracle_sql()[name])
    ocols = [d[0] for d in res.description]
    orows = [dict(zip(ocols, r)) for r in res.fetchall()]
    assert sorted(scols) == sorted(ocols)
    sn, on = normalize(srows, scols), normalize(orows, ocols)
    assert len(sn) == len(on)
    assert sn == on


# ---------------------------------------------------------------------------
# resolve_redirects
# ---------------------------------------------------------------------------


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_redirects_chain_cycle_and_cap(spark):
    from pdf_extraction_spark.operators.crawl import resolve_redirects

    rows = (
        # a -> b -> c -> T (3 hops from a)
        [("a", "b"), ("b", "c"), ("c", "T")]
        # self-loop
        + [("loop", "loop")]
        # 3-cycle
        + [("p", "q"), ("q", "r"), ("r", "p")]
        # deep chain d1 <- d2 <- ... <- d6, cap at 4
        + [(f"d{i}", f"d{i-1}") for i in range(1, 7)]
    )
    out = {
        r["url"]: r
        for r in resolve_redirects(_edges(spark, rows), max_hops=4).collect()
    }
    assert len(out) == 13
    assert (out["a"]["final_url"], out["a"]["hops"], out["a"]["status"]) == (
        "T", 3, "ok",
    )
    assert (out["c"]["final_url"], out["c"]["hops"]) == ("T", 1)
    for u in ("loop", "p", "q", "r"):
        assert out[u]["status"] == "too_many"
        assert out[u]["final_url"] is None and out[u]["hops"] is None
    # exactly at the cap resolves; one past it gives up
    assert (out["d4"]["status"], out["d4"]["hops"]) == ("ok", 4)
    assert out["d4"]["final_url"] == "d0"
    assert out["d5"]["status"] == "too_many"
    assert out["d6"]["status"] == "too_many"


def test_redirects_min_dst_canonicalization(spark):
    from pdf_extraction_spark.operators.crawl import resolve_redirects

    # a recorded twice with disagreeing targets: min(dst) wins, and the
    # walk follows the canonical edge only
    rows = [("a", "z2"), ("a", "z1"), ("z1", "T")]
    out = {
        r["url"]: r for r in resolve_redirects(_edges(spark, rows)).collect()
    }
    assert (out["a"]["final_url"], out["a"]["hops"]) == ("T", 2)
    assert out["z1"]["final_url"] == "T"


def test_redirects_oracle_parity_sf0001(spark):
    """Strict parity vs the recursive-CTE DuckDB twin on hand rows that
    hit every status path (the sf0.01 registry parity also covers it)."""
    from pdf_extraction_spark.operators.crawl import (
        resolve_redirects,
        sql_resolve_redirects,
    )

    rows = (
        [("a", "b"), ("b", "c"), ("c", "T"), ("s", "s")]
        + [(f"d{i}", f"d{i-1}") for i in range(1, 7)]
        + [("a", "b0")]  # duplicate src — both engines canonicalize to min(dst)
    )
    got = sorted(
        (r["url"], r["final_url"], r["hops"], r["status"])
        for r in resolve_redirects(_edges(spark, rows), max_hops=4).collect()
    )
    con = duckdb.connect()
    vals = ", ".join(f"('{s}', '{d}')" for s, d in rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            sql_resolve_redirects(
                f"SELECT * FROM (VALUES {vals}) t(src, dst)", max_hops=4
            )
        ).fetchall()
    )
    assert got == want
