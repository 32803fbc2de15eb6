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
    "resolve_redirects",
    "sql_resolve_redirects",
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


# ---------------------------------------------------------------------------
# redirect-chain resolution — pointer doubling over the 3xx edge set
# ---------------------------------------------------------------------------


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 16,
) -> DataFrame:
    """(url, final_url, hops, status): resolve every redirect SOURCE to
    its final landing url by following the (src → dst) edge set, the
    post-fetch step that canonicalizes a crawl's 3xx responses before
    dedup / graph construction.

    Semantics (both engines):

    * a source whose chain reaches a TERMINAL url (one with no outgoing
      redirect) within ``max_hops`` steps resolves ``ok`` with the
      EXACT hop count;
    * anything else — cycles, self-loops, chains needing more than
      ``max_hops`` redirects — is ``too_many`` with NULL final/hops
      (the crawler's "redirect loop" give-up rule; browsers cap around
      20).

    Sources with several recorded targets (re-fetch disagreement) are
    canonicalized to ``min(dst)`` first, so the walk is a function.

    Scale shape: POINTER DOUBLING, not linear walking — the hop map
    ``m(u) = (node, hops)`` composes with itself ``⌈log2 max_hops⌉+1``
    times, so 16-hop chains cost 5 self-joins instead of 16, every join
    is key-partitioned on the jumped-to node, and nothing is ever
    collected or broadcast (the map is the full edge set; at 10^12
    edges each round is one shuffle). Invariant after round k: hops is
    EXACT and either the node is terminal or hops = 2^k — so cycle
    rows overshoot ``max_hops`` by round ⌈log2 max_hops⌉+1 and are
    flagged without any cycle-detection join. ``localCheckpoint``
    per round cuts the iterative lineage (same discipline as
    components.connected_components).
    """
    import math

    e = (
        edges.groupBy(F.col(src_col).alias("r_src"))
        .agg(F.min(dst_col).alias("r_dst"))
    )
    e.persist()
    m = e.select(
        F.col("r_src").alias("url"),
        F.col("r_dst").alias("node"),
        F.lit(1).cast("long").alias("hops"),
    )
    rounds = max(1, int(math.ceil(math.log2(max(2, max_hops)))) + 1)
    for _ in range(rounds):
        j = m.select(
            F.col("url").alias("j_url"),
            F.col("node").alias("j_node"),
            F.col("hops").alias("j_hops"),
        )
        m = (
            m.join(j, m["node"] == j["j_url"], "left")
            .select(
                "url",
                F.coalesce("j_node", "node").alias("node"),
                (F.col("hops") + F.coalesce("j_hops", F.lit(0))).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
    term = e.select(F.col("r_src").alias("t_src"))
    ok = F.col("t_src").isNull() & (F.col("hops") <= F.lit(max_hops))
    out = m.join(term, m["node"] == term["t_src"], "left").select(
        "url",
        F.when(ok, F.col("node")).alias("final_url"),
        F.when(ok, F.col("hops")).alias("hops"),
        F.when(ok, F.lit("ok")).otherwise(F.lit("too_many")).alias("status"),
    )
    e.unpersist()
    return out


def sql_resolve_redirects(edges_select: str, max_hops: int = 16) -> str:
    """DuckDB twin of :func:`resolve_redirects` over a subquery yielding
    (src, dst) — a recursive-CTE walk with the SAME min(dst)
    canonicalization, terminal test and give-up rule. The recursion
    guard ``hops <= max_hops`` lets a row reach max_hops+1 and stop, so
    cycles terminate and any row whose deepest hop exceeds ``max_hops``
    (or never lands on a terminal) reads too_many, exactly the Spark
    flag; ok rows carry the identical exact hop count."""
    return (
        "WITH RECURSIVE e AS "
        f"(SELECT src, min(dst) AS dst FROM ({edges_select}) GROUP BY src), "
        "walk AS ("
        "SELECT src AS url, dst AS cur, CAST(1 AS BIGINT) AS hops FROM e "
        "UNION ALL "
        "SELECT w.url, e.dst, w.hops + 1 FROM walk w "
        f"JOIN e ON w.cur = e.src WHERE w.hops <= {max_hops}), "
        "last AS (SELECT url, max(hops) AS mh FROM walk GROUP BY url), "
        "fin AS (SELECT w.url, w.cur, w.hops, "
        f"(w.hops <= {max_hops} AND t.src IS NULL) AS ok "
        "FROM walk w JOIN last l ON w.url = l.url AND w.hops = l.mh "
        "LEFT JOIN e t ON w.cur = t.src) "
        "SELECT url, CASE WHEN ok THEN cur END AS final_url, "
        "CASE WHEN ok THEN hops END AS hops, "
        "CASE WHEN ok THEN 'ok' ELSE 'too_many' END AS status FROM fin"
    )
