"""Crawl-scheduling operators: snapshot change tracking → recrawl
priority, and politeness-interleaved frontier ordering.

A Common-Crawl-style corpus carries MANY snapshots of the same url
(one per crawl); the two operators here close the loop from "what we
fetched" back to "what to fetch next":

* :func:`snapshot_changes` — per-url content-change statistics across
  snapshots (the signal recrawl schedulers key on: a url whose content
  changes every crawl should be re-fetched often; a static one almost
  never — Cho & Garcia-Molina 2003's frequency-estimation shape).
* :func:`frontier_schedule` — assign each candidate url a politeness
  WAVE: within a host, urls are ranked by priority, and wave ``k``
  contains every host's ``k``-th url, so executing waves in order
  fetches at most one url per host per wave (the standard frontier
  interleave that keeps a crawler polite without a driver-side queue).

Reference scope: the reference repo processes single-snapshot document
sets (pdf_extraction has no crawl loop); these operators are part of
the web-scale continuation mandated by the north rule (Common-Crawl
input shape: url, warc_ts, payload), same family as the host graph /
PageRank loop in operators/htmlgraph.py.

Scale shape
-----------
``snapshot_changes``: one url-keyed window whose partition size is the
per-url SNAPSHOT count (bounded by the number of crawls, ~monthly — a
few dozen rows even at 10^12 urls), then a url-keyed aggregate that
map-side-combines. No global window, no Python, no float convention:
the change rate is fixed-point int64 (half-up at 10^-6) and the bucket
thresholds are integer cross-multiplications.

``frontier_schedule``: one host-keyed window. A host's partition is
its candidate count, which is UNBOUNDED on mega-hosts — compose AFTER
:func:`..hostcap.host_cap` (which bounds per-host candidates with a
tree of bounded top-K reductions) so the window partition is capped by
construction; the docstring pin in tests/test_crawl.py asserts the
composed plan. Waves are per-host ranks, so downstream execution
``ORDER BY wave`` never needs a global sort — wave membership is the
schedule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "snapshot_changes",
    "sql_snapshot_changes",
    "frontier_schedule",
    "sql_frontier_schedule",
    "parse_sitemap",
    "sql_parse_sitemap",
]


def snapshot_changes(
    snaps: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """(url, n_snaps, n_changes, first_ts, last_ts, change_rate,
    recrawl): per-url change statistics over the snapshot history.

    A snapshot COUNTS AS CHANGED when its text IS DISTINCT FROM the
    previous snapshot's text in ``ts_col`` order (NULL-safe, so a
    NULL→'x' transition is a change and NULL→NULL is not). The change
    rate is n_changes / (n_snaps − 1), half-up fixed-point at 10^-6 —
    NULL for single-snapshot urls. ``recrawl`` buckets the rate with
    integer cross-multiplication (no float compare):

    * ``new``  — one snapshot, no signal yet;
    * ``hot``  — rate ≥ 0.5 (2·changes ≥ snaps−1);
    * ``warm`` — rate ≥ 0.1;
    * ``cold`` — below.

    Snapshot order must be unambiguous: (url, ts) pairs are expected
    unique (one fetch per crawl); ties would make lag() engine-
    dependent, so the synthetic fixtures guarantee distinct ts.
    """
    w = Window.partitionBy(url_col).orderBy(ts_col)
    flagged = snaps.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("ts"),
        F.when(
            F.row_number().over(w) > 1,
            ~F.col(text_col).eqNullSafe(F.lag(text_col).over(w)),
        )
        .otherwise(F.lit(False))
        .cast("long")
        .alias("chg"),
    )
    agg = flagged.groupBy("url").agg(
        F.count("*").alias("n_snaps"),
        F.sum("chg").alias("n_changes"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    return agg.select(
        "url",
        "n_snaps",
        "n_changes",
        "first_ts",
        "last_ts",
        F.expr(
            "CASE WHEN n_snaps > 1 THEN "
            "CAST((1000000L * n_changes + (n_snaps - 1L) div 2L) "
            "div (n_snaps - 1L) AS DOUBLE) / 1e6 END"
        ).alias("change_rate"),
        F.expr(
            "CASE WHEN n_snaps = 1 THEN 'new' "
            "WHEN 2L * n_changes >= n_snaps - 1L THEN 'hot' "
            "WHEN 10L * n_changes >= n_snaps - 1L THEN 'warm' "
            "ELSE 'cold' END"
        ).alias("recrawl"),
    )


def sql_snapshot_changes(snaps_select: str) -> str:
    """DuckDB twin of :func:`snapshot_changes` over a subquery yielding
    (url, ts, text) — same NULL-safe lag compare (IS DISTINCT FROM),
    same integer fixed-point rate and bucket thresholds (all operands
    non-negative, so ``//`` equals Spark's ``div``)."""
    return (
        f"WITH s AS ({snaps_select}), "
        "f AS (SELECT url, ts, CASE WHEN row_number() OVER "
        "(PARTITION BY url ORDER BY ts) > 1 AND text IS DISTINCT FROM "
        "lag(text) OVER (PARTITION BY url ORDER BY ts) "
        "THEN 1 ELSE 0 END AS chg FROM s), "
        "a AS (SELECT url, count(*) AS n_snaps, "
        "CAST(sum(chg) AS BIGINT) AS n_changes, "
        "min(ts) AS first_ts, max(ts) AS last_ts FROM f GROUP BY url) "
        "SELECT url, n_snaps, n_changes, first_ts, last_ts, "
        "CASE WHEN n_snaps > 1 THEN "
        "CAST((1000000 * n_changes + (n_snaps - 1) // 2) "
        "// (n_snaps - 1) AS DOUBLE) / 1e6 END AS change_rate, "
        "CASE WHEN n_snaps = 1 THEN 'new' "
        "WHEN 2 * n_changes >= n_snaps - 1 THEN 'hot' "
        "WHEN 10 * n_changes >= n_snaps - 1 THEN 'warm' "
        "ELSE 'cold' END AS recrawl FROM a"
    )


def frontier_schedule(
    cands: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    priority_col: Column | str = "priority",
) -> DataFrame:
    """(url, host, priority, wave): politeness-interleaved frontier
    ordering. ``wave`` is the url's rank within its host (priority
    descending, url ascending as the deterministic tie-break), so
    executing waves in ascending order fetches at most ONE url per
    host per wave — the polite schedule — while within a wave the
    fetches are freely parallel across hosts.

    NULL hosts schedule as one shared key (a crawler treats unparsable
    hosts as a single politeness bucket). Compose after
    ``host_cap`` when per-host candidate counts are unbounded — the
    window partition here is exactly the per-host candidate count."""
    pr = F.col(priority_col) if isinstance(priority_col, str) else priority_col
    w = Window.partitionBy(F.col(host_col)).orderBy(
        pr.desc(), F.col(url_col).asc()
    )
    return cands.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        pr.alias("priority"),
        F.row_number().over(w).alias("wave"),
    )


def sql_frontier_schedule(cands_select: str) -> str:
    """DuckDB twin of :func:`frontier_schedule` over a subquery
    yielding (url, host, priority). Spark window partitioning groups
    NULL hosts together, as does DuckDB's PARTITION BY; the ORDER BY
    tie-break (priority DESC, url ASC) is total because urls are
    unique per host."""
    return (
        f"WITH c AS ({cands_select}) "
        "SELECT url, host, priority, "
        "CAST(row_number() OVER (PARTITION BY host "
        "ORDER BY priority DESC, url ASC) AS INT) AS wave FROM c"
    )


# ---------------------------------------------------------------------------
# sitemap.xml parsing — the discovery-side complement to robots.txt
# ---------------------------------------------------------------------------

# block/field patterns are RE2∩Java: lazy quantifiers + (?s) only, no
# backreferences, no \s (Java's is ASCII-only and RE2's lacks \x0B —
# XML whitespace is exactly space/tab/CR/LF, spelled literally)
_URL_BLOCK_RE = "(?s)<url>.*?</url>"
_XML_WS = "^[ \\t\\r\\n]+|[ \\t\\r\\n]+$"


def _xml_field(block, tag: str):
    c = F.regexp_extract(block, f"(?s)<{tag}>(.*?)</{tag}>", 1)
    return F.nullif(F.regexp_replace(c, _XML_WS, ""), F.lit(""))


def parse_sitemap(
    df: DataFrame, host_col: str = "host", xml_col: str = "sitemap_xml"
) -> DataFrame:
    """(host, loc, lastmod, changefreq, priority): one row per ``<url>``
    entry of each host's sitemap.xml (sitemaps.org §XML format) —
    entries without a usable ``<loc>`` are dropped; ``lastmod`` /
    ``changefreq`` stay strings (the scheduler downstream decides how
    to parse dates); ``priority`` is a double (unparsable → NULL).
    Fully native: one vectorized block scan + three field extracts per
    entry, zero Python, zero exchanges beyond the explode."""
    blocks = F.regexp_extract_all(
        F.coalesce(F.col(xml_col), F.lit("")), F.lit(_URL_BLOCK_RE), F.lit(0)
    )
    base = df.select(
        F.col(host_col).alias("host"), F.explode(blocks).alias("block")
    )
    return (
        base.select(
            "host",
            _xml_field(F.col("block"), "loc").alias("loc"),
            _xml_field(F.col("block"), "lastmod").alias("lastmod"),
            _xml_field(F.col("block"), "changefreq").alias("changefreq"),
            _xml_field(F.col("block"), "priority")
            .try_cast("double")
            .alias("priority"),
        )
        .filter(F.col("loc").isNotNull())
    )


def sql_parse_sitemap(sitemaps_select: str) -> str:
    """DuckDB twin of :func:`parse_sitemap` over a subquery yielding
    (host, sitemap_xml) — same block scan, edge-trim and field
    extracts; TRY_CAST mirrors the Column side's try_cast (ANSI mode
    would otherwise raise on unparsable priorities in Spark while
    DuckDB's plain CAST raises — NULL-on-unparsable on BOTH sides is
    the one agreeing rule)."""

    def fld(tag: str) -> str:
        return (
            "nullif(regexp_replace(regexp_extract(block, "
            f"'(?s)<{tag}>(.*?)</{tag}>', 1), '{_XML_WS}', '', 'g'), '')"
        )

    return (
        f"WITH src AS ({sitemaps_select}), "
        "b AS (SELECT host, unnest(regexp_extract_all("
        f"coalesce(sitemap_xml, ''), '{_URL_BLOCK_RE}')) AS block FROM src) "
        f"SELECT host, {fld('loc')} AS loc, {fld('lastmod')} AS lastmod, "
        f"{fld('changefreq')} AS changefreq, "
        f"TRY_CAST({fld('priority')} AS DOUBLE) AS priority "
        f"FROM b WHERE {fld('loc')} IS NOT NULL"
    )
