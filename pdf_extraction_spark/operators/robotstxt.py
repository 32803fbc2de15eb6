"""robots.txt parsing and URL admission — the fetch-side consent gate.

Complements the meta-robots tag gate (operators/htmlmeta.py: consent
signals INSIDE a fetched page) with the crawl-side protocol: parse each
host's ``robots.txt`` body into agent-group rules, then admit or block
candidate urls by the REP longest-match rule (RFC 9309).

Both operators are FULLY NATIVE — line splitting, group attribution and
prefix matching are codegen'd expressions; the only shuffles are one
host-keyed window over a robots file's OWN lines (bounded by file size,
~KBs) and one host-keyed join of candidates against rules (rules per
host are file-size-bounded, so AQE broadcasts the rule side when the
rule table is small).

Group-attribution semantics (RFC 9309 §2.2.1):
  * a group starts at a ``User-agent`` line whose PREVIOUS kept line is
    not itself a ``User-agent`` line — consecutive agent lines share
    one group (both agents get every rule of the group);
  * ``Allow``/``Disallow`` lines attach to the most recent group; rules
    before any group are ignored;
  * comments (``#`` to end of line) and unknown directives (Sitemap,
    Crawl-delay, …) are dropped; keys fold case; agent names fold
    case; PATHS stay case-sensitive;
  * an empty-path rule (``Disallow:``) imposes no restriction and is
    dropped at parse.

Matching semantics (RFC 9309 §2.2.2, prefix subset):
  * the most specific (longest) matching path prefix wins;
  * on a length tie, Allow wins;
  * no matching rule → allowed (crawl-permissive default);
  * agent-group selection: the candidate agent's OWN group when the
    host declares one, else the ``*`` group — per host.

Documented deviation: ``*`` wildcards and ``$`` anchors inside rule
paths match literally (not as wildcards) — the RFC marks wildcard
support optional; literal-prefix matching keeps both engines on one
string primitive (``left(url_path, len(rule)) = rule``) with zero
regex-dialect exposure. A rule path containing ``*`` therefore never
matches (it would need a literal ``*`` in the url path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "parse_robots",
    "sql_parse_robots",
    "robots_allowed",
    "sql_robots_allowed",
]

_LINE_SPLIT = r"\r\n|\r|\n"
# [ \t] spelled literally — identical in Java and RE2, and robots.txt
# field separators are exactly space/tab (RFC 9309 ABNF WS)
_TRIM_EDGE = "^[ \\t]+|[ \\t]+$"
_TRIM_TAIL = "[ \\t]+$"
_TRIM_HEAD = "^[ \\t]+"
# url path: everything from the first '/' after the authority
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/]*(/.*)?$"


def parse_robots(
    df: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, grp, agent, directive, path): one row per (agent × rule)
    pair of each group of each host's robots.txt. ``grp`` is the
    1-based group ordinal within the file (kept so a user can
    reconstruct file structure; the matcher ignores it). NULL/empty
    robots bodies yield no rows (permissive default downstream)."""
    lines = F.split(F.coalesce(F.col(txt_col), F.lit("")), _LINE_SPLIT)
    base = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(lines).alias("i", "raw"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(F.col("raw"), "#.*", ""), _TRIM_EDGE, ""
    )
    kv = base.select("host", "i", clean.alias("line")).select(
        "host",
        "i",
        F.lower(
            F.regexp_replace(
                F.expr("substring(line, 1, instr(line, ':') - 1)"),
                _TRIM_TAIL,
                "",
            )
        ).alias("key"),
        F.regexp_replace(
            F.regexp_replace(
                F.expr("substring(line, instr(line, ':') + 1)"), _TRIM_HEAD, ""
            ),
            _TRIM_TAIL,
            "",
        ).alias("val"),
        F.expr("instr(line, ':') > 0").alias("has_colon"),
    )
    kept = kv.filter(
        F.col("has_colon") & F.col("key").isin("user-agent", "allow", "disallow")
    ).select(
        "host",
        "i",
        F.when(F.col("key") == "user-agent", F.lit("agent"))
        .otherwise(F.lit("rule"))
        .alias("kind"),
        "key",
        "val",
    )
    w = Window.partitionBy("host").orderBy("i")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    start = (
        F.when(
            (F.col("kind") == "agent")
            & ~F.lag("kind").over(w).eqNullSafe(F.lit("agent")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("start")
    )
    flagged = kept.select("host", "i", "kind", "key", "val", start).select(
        "host",
        "kind",
        "key",
        "val",
        F.sum("start").over(wrun).alias("grp"),
    )
    agents = flagged.filter(F.col("kind") == "agent").select(
        "host", "grp", F.lower(F.col("val")).alias("agent")
    )
    rules = flagged.filter(
        (F.col("kind") == "rule") & (F.col("grp") > 0) & (F.col("val") != "")
    ).select(
        "host", "grp", F.col("key").alias("directive"), F.col("val").alias("path")
    )
    return agents.join(rules, ["host", "grp"]).select(
        "host", "grp", "agent", "directive", "path"
    )


def sql_parse_robots(robots_select: str) -> str:
    """DuckDB twin of :func:`parse_robots` over a subquery yielding
    (host, robots_txt) — same line split, comment strip, tab/space
    trim, first-colon key/value split, running-sum group attribution
    and agent × rule join. Window operands are unique (host, line
    index), so both engines' frames agree. Spark's posexplode is
    0-based; the twin's generate_series is 1-based — both only ORDER
    the window, so the twin keeps its native indexing."""
    return (
        f"WITH src AS ({robots_select}), "
        "lv AS (SELECT host, "
        f"string_split_regex(coalesce(robots_txt, ''), '{_LINE_SPLIT}') AS ls "
        "FROM src), "
        "ln AS (SELECT host, unnest(generate_series(1, len(ls))) AS i, ls "
        "FROM lv), "
        "cl AS (SELECT host, i, "
        "regexp_replace(regexp_replace(ls[i], '#.*', ''), "
        f"'{_TRIM_EDGE}', '', 'g') AS line FROM ln), "
        "kv AS (SELECT host, i, "
        f"lower(regexp_replace(line[1:strpos(line, ':') - 1], '{_TRIM_TAIL}', '')) "
        "AS key, "
        "regexp_replace(regexp_replace(line[strpos(line, ':') + 1:], "
        f"'{_TRIM_HEAD}', ''), '{_TRIM_TAIL}', '') AS val "
        "FROM cl WHERE strpos(line, ':') > 0), "
        "kept AS (SELECT host, i, "
        "CASE WHEN key = 'user-agent' THEN 'agent' ELSE 'rule' END AS kind, "
        "key, val FROM kv WHERE key IN ('user-agent', 'allow', 'disallow')), "
        "st AS (SELECT host, i, kind, key, val, "
        "CASE WHEN kind = 'agent' AND lag(kind) OVER "
        "(PARTITION BY host ORDER BY i) IS DISTINCT FROM 'agent' "
        "THEN 1 ELSE 0 END AS start FROM kept), "
        "fl AS (SELECT host, kind, key, val, "
        "sum(start) OVER "
        "(PARTITION BY host ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING "
        "AND CURRENT ROW) AS grp FROM st), "
        "ag AS (SELECT host, grp, lower(val) AS agent FROM fl "
        "WHERE kind = 'agent'), "
        "ru AS (SELECT host, grp, key AS directive, val AS path FROM fl "
        "WHERE kind = 'rule' AND grp > 0 AND val <> '') "
        "SELECT ag.host, CAST(ag.grp AS BIGINT) AS grp, agent, directive, path "
        "FROM ag JOIN ru ON ag.host = ru.host AND ag.grp = ru.grp"
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """(url, host, allowed, match_directive, match_path): admit or
    block each candidate url against the parsed ``rules`` (output of
    :func:`parse_robots`) for ``agent``. Longest matching path prefix
    wins; Allow wins length ties; urls on hosts with no selected rules
    (or NULL hosts) default to allowed. The url path is everything
    from the first ``/`` after the authority (none → ``'/'``)."""
    al = agent.lower()
    pool = rules.filter(F.col("agent").isin(al, "*"))
    # group selection via a host-keyed window (partition = rules per
    # host, file-size-bounded) instead of a groupBy + self-join — the
    # join form re-executes the whole parse subtree for the flag side
    hw = Window.partitionBy("host")
    sel = pool.withColumn(
        "has_exact", F.max((F.col("agent") == al).cast("int")).over(hw)
    ).filter((F.col("agent") == al).cast("int") == F.col("has_exact"))
    cand = urls.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        F.coalesce(
            F.nullif(F.regexp_extract(F.col(url_col), _PATH_RE, 1), F.lit("")),
            F.lit("/"),
        ).alias("upath"),
    )
    matches = (
        cand.join(sel, "host")
        .filter(F.expr("left(upath, length(path)) = path"))
        .groupBy("url", "host")
        .agg(
            F.min(
                F.struct(
                    (-F.length("path")).alias("neg_len"),
                    F.when(F.col("directive") == "allow", F.lit(0))
                    .otherwise(F.lit(1))
                    .alias("rk"),
                    F.col("directive").alias("directive"),
                    F.col("path").alias("path"),
                )
            ).alias("b")
        )
    )
    return (
        cand.select("url", "host")
        .join(matches, ["url", "host"], "left")
        .select(
            "url",
            "host",
            F.coalesce(F.col("b.rk") == 0, F.lit(True)).alias("allowed"),
            F.col("b.directive").alias("match_directive"),
            F.col("b.path").alias("match_path"),
        )
    )


def sql_robots_allowed(urls_select: str, rules_select: str, agent: str = "*") -> str:
    """DuckDB twin of :func:`robots_allowed`: ``urls_select`` yields
    (url, host); ``rules_select`` yields parse_robots' output (inline
    :func:`sql_parse_robots` for the end-to-end twin). Best-match
    selection is a row_number window ordered exactly like the Column
    side's min(struct) — (length DESC, allow-first, path) is total
    because equal-length matching prefixes of one url are equal
    strings."""
    al = agent.lower().replace("'", "''")
    return (
        f"WITH u0 AS ({urls_select}), "
        f"r0 AS ({rules_select}), "
        f"pool AS (SELECT *, max(CASE WHEN agent = '{al}' THEN 1 ELSE 0 END) "
        "OVER (PARTITION BY host) AS has_exact FROM r0 "
        f"WHERE agent IN ('*', '{al}')), "
        "sel AS (SELECT * FROM pool "
        f"WHERE (CASE WHEN agent = '{al}' THEN 1 ELSE 0 END) = has_exact), "
        "cand AS (SELECT url, host, coalesce(nullif(regexp_extract(url, "
        f"'{_PATH_RE}', 1), ''), '/') AS upath FROM u0), "
        "m AS (SELECT url, cand.host AS host, directive, path, row_number() OVER "
        "(PARTITION BY url, cand.host ORDER BY length(path) DESC, "
        "CASE WHEN directive = 'allow' THEN 0 ELSE 1 END, path) AS rn "
        "FROM cand JOIN sel ON cand.host = sel.host "
        "WHERE left(upath, length(path)) = path) "
        "SELECT cand.url, cand.host, "
        "coalesce(b.directive = 'allow', TRUE) AS allowed, "
        "b.directive AS match_directive, b.path AS match_path "
        "FROM cand LEFT JOIN (SELECT * FROM m WHERE rn = 1) b "
        "ON cand.url = b.url AND cand.host = b.host"
    )
