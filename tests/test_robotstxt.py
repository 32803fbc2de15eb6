"""robots.txt parser + REP admission gate — semantics unit tests plus
sf0.001 strict-oracle parity for the two registered queries."""

import sys

import duckdb
import pytest

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.001"

ROBOTS = """# full-shape example
User-Agent: *
Disallow: /private   # comment after value
Allow:\t/private/ok
Crawl-delay: 10

User-agent: MyBot
User-agent: Helper
DISALLOW: /p/
allow: /p/7
Disallow:
Sitemap: https://h1.example/sitemap.xml
"""


def _rules(spark, pairs):
    df = spark.createDataFrame(pairs, "host string, robots_txt string")
    from pdf_extraction_spark.operators.robotstxt import parse_robots

    return parse_robots(df)


def test_parse_groups_agents_and_rules(spark):
    rows = _rules(spark, [("h1", ROBOTS)]).collect()
    got = {(r["grp"], r["agent"], r["directive"], r["path"]) for r in rows}
    assert got == {
        (1, "*", "disallow", "/private"),
        (1, "*", "allow", "/private/ok"),
        # stacked agents share the group's rules; keys/agents case-fold
        (2, "mybot", "disallow", "/p/"),
        (2, "mybot", "allow", "/p/7"),
        (2, "helper", "disallow", "/p/"),
        (2, "helper", "allow", "/p/7"),
    }
    # empty-path Disallow and unknown directives dropped
    assert all(r["path"] != "" for r in rows)


def test_parse_ignores_headless_rules_and_empty(spark):
    rows = _rules(
        spark,
        [
            ("h2", "Disallow: /orphan\nUser-agent: *\nDisallow: /x"),
            ("h3", ""),
            ("h4", None),
        ],
    ).collect()
    assert {(r["host"], r["path"]) for r in rows} == {("h2", "/x")}


def test_allowed_longest_match_and_tiebreak(spark):
    from pdf_extraction_spark.operators.robotstxt import robots_allowed

    txt = (
        "User-agent: *\n"
        "Disallow: /a\n"
        "Allow: /a/b\n"
        "Disallow: /a/b/c\n"
        "Allow: /tie\n"
        "Disallow: /tie\n"
    )
    rules = _rules(spark, [("h", txt)])
    urls = spark.createDataFrame(
        [
            ("s://h/a/x", "h"),      # /a disallow
            ("s://h/a/b/x", "h"),    # /a/b allow overrides
            ("s://h/a/b/c/x", "h"),  # /a/b/c disallow overrides again
            ("s://h/tie", "h"),      # equal length: allow wins
            ("s://h/free", "h"),     # no rule → allowed
            ("s://h2/a/x", "h2"),    # host without rules → allowed
            ("s://h/nopath", None),  # NULL host → allowed
        ],
        "url string, host string",
    )
    out = {r["url"]: r for r in robots_allowed(urls, rules).collect()}
    assert out["s://h/a/x"]["allowed"] is False
    assert out["s://h/a/b/x"]["allowed"] is True
    assert out["s://h/a/b/c/x"]["allowed"] is False
    assert out["s://h/tie"]["allowed"] is True
    assert out["s://h/free"]["allowed"] is True
    assert out["s://h/free"]["match_path"] is None
    assert out["s://h2/a/x"]["allowed"] is True
    assert out["s://h/nopath"]["allowed"] is True
    assert out["s://h/a/b/c/x"]["match_path"] == "/a/b/c"
    assert out["s://h/a/b/c/x"]["match_directive"] == "disallow"


def test_allowed_agent_group_selection(spark):
    """A host that declares the agent's own group uses ONLY that group;
    other hosts fall back to '*'."""
    from pdf_extraction_spark.operators.robotstxt import robots_allowed

    both = "User-agent: *\nDisallow: /\nUser-agent: bot\nAllow: /\nDisallow: /x\n"
    star_only = "User-agent: *\nDisallow: /y\n"
    rules = _rules(spark, [("h1", both), ("h2", star_only)])
    urls = spark.createDataFrame(
        [("s://h1/ok", "h1"), ("s://h1/x/q", "h1"), ("s://h2/y/q", "h2")],
        "url string, host string",
    )
    out = {r["url"]: r["allowed"] for r in robots_allowed(urls, rules, "Bot").collect()}
    # h1: bot group wins — '/' allow is overridden only under /x
    assert out["s://h1/ok"] is True
    assert out["s://h1/x/q"] is False
    # h2: falls back to '*'
    assert out["s://h2/y/q"] is False


def test_allowed_root_path_default(spark):
    """A url with no path component matches as '/'."""
    from pdf_extraction_spark.operators.robotstxt import robots_allowed

    rules = _rules(spark, [("h", "User-agent: *\nDisallow: /\n")])
    urls = spark.createDataFrame([("https://h", "h")], "url string, host string")
    assert robots_allowed(urls, rules).collect()[0]["allowed"] is False


# -- sf0.001 strict oracle parity -------------------------------------------

NEW_QUERIES = ["robots_rules", "robots_allow"]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in ["documents", "embeddings", "events"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_robots_query_matches_oracle(spark, oracle_con, name):
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
