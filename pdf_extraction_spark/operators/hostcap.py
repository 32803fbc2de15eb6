"""Per-host document caps — the crawl-hygiene rule that no single
domain may dominate the corpus (C4 and RefinedWeb both cap per-host
contribution).

Spark-first shape: per-host top-K is usually written as a
``row_number() OVER (PARTITION BY host ...)`` window — but a window
funnels every row of a host through one task, and crawl host
distributions are power-law (one host can hold 10^9 docs at web
scale). ``collect_list``-based "combinable" top-K has the same problem
one level down: its aggregation buffer holds the whole group before
the slice. The cap here is a **tree of bounded top-K reductions** in
which every aggregation buffer has a hard size bound:

1. group by ``(host, spark_partition_id())`` — each group lives inside
   ONE input partition, so every aggregation buffer is bounded by
   partition size (the memory the task already holds). The stage-1
   shuffle still ships each group's struct array once (16-byte
   (score, id) structs only — the corpus-sized shuffle any grouped
   aggregation pays, same bytes the window formulation ships); what
   the slice bounds is every buffer and every stage OUTPUT, so no
   reducer ever materializes a mega-host;
2. group the ≤ P×K survivors by ``(host, hash-salt)`` with ``fan_in``
   buckets — buffer ≤ ~P×K/fan_in;
3. final group by host over ≤ fan_in×K rows — buffer bounded by a
   constant.

Top-K order: score descending (struct field is the negated score —
double negation is exact), id ascending as the deterministic
tie-break; the result is invariant to partitioning because bounded
top-K is associative and commutative. NaN scores are normalized to
-inf alongside NULLs (engines order NaN at opposite extremes). The
DuckDB twin is the plain window formulation — same result, different
physical plan.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .maintenance import _isqrt_case

NEG_INF = float("-inf")


def _topk_merge(df: DataFrame, group_cols, k: int, key_col: str = "e") -> DataFrame:
    """One bounded reduction: top-K structs per group, exploded back."""
    return (
        df.groupBy(*group_cols)
        .agg(F.slice(F.array_sort(F.collect_list(key_col)), 1, k).alias("top"))
        .select(*[c for c in group_cols if c == "host"], F.explode("top").alias(key_col))
    )


def host_cap(
    df: DataFrame,
    score: Column,
    host_col: str = "source",
    id_col: str = "doc_id",
    k: int = 5,
    fan_in: int = 64,
) -> DataFrame:
    """Keep the best ``k`` docs per host: (host, host_rank, doc_id,
    score). NULL and NaN scores sort last (normalized to -inf)."""
    clean = F.coalesce(F.nanvl(score, F.lit(NEG_INF)), F.lit(NEG_INF))
    key = F.struct((-clean).alias("ns"), F.col(id_col).alias("id"))
    base = df.select(
        F.col(host_col).alias("host"),
        F.spark_partition_id().alias("__pid"),
        key.alias("e"),
    )
    local = _topk_merge(base, ["host", "__pid"], k)  # map-side complete
    salted = local.withColumn("__salt", F.pmod(F.xxhash64(F.col("e.id")), F.lit(fan_in)))
    mid = _topk_merge(salted, ["host", "__salt"], k)
    final = mid.groupBy("host").agg(
        F.slice(F.array_sort(F.collect_list("e")), 1, k).alias("top")
    )
    return final.select("host", F.posexplode("top").alias("pos", "e")).select(
        F.col("host").alias(host_col),
        (F.col("pos") + 1).cast("int").alias("host_rank"),
        F.col("e.id").alias(id_col),
        (-F.col("e.ns")).alias("score"),
    )


def host_quality_gate(
    df: DataFrame,
    text_col: str = "text",
    host_col: str = "source",
    id_col: str = "doc_id",
    min_words: int = 30,
    low_avg: int = 4,
    bad_mult: int = 4,
    min_docs: int = 3,
) -> DataFrame:
    """Two-level domain filtering (RefinedWeb/FineWeb-style host
    induction): cheap per-DOC quality verdicts are aggregated per HOST,
    and a host whose bad fraction exceeds the threshold is dropped
    WHOLESALE — including its individually-fine docs. That is the point
    of domain-level induction: a spam/SEO/boilerplate farm is a
    property of the host, and its "good-looking" pages are the ones the
    doc-level gates miss.

    Doc verdict (integer math only, both clauses real Gopher/RefinedWeb
    rules): bad = fewer than ``min_words`` tokens OR mean word length
    below ``low_avg`` chars, spelled as the cross-multiplication
    ``sum_chars < low_avg·n_words`` so no float convention exists to
    diverge cross-engine. Host verdict: flagged when
    ``bad_mult·n_bad > n_docs`` (default: >25% bad) with at least
    ``min_docs`` docs of support (low-support hosts get the benefit of
    the doubt rather than a verdict from one page).

    Scale shape: one host-keyed integer aggregation (#hosts ≪ #docs,
    map-side combined) + one host-keyed join back. The host-stats frame
    is small but corpus-derived and unbounded, so no broadcast hint —
    AQE decides (a planted mega-host would OOM a forced broadcast).
    Skewed hosts cost nothing extra: the agg is combinable and the join
    fans stats OUT to docs. NULL hosts group and join as one key
    (eqNullSafe). Output: one row per input doc with the doc verdict,
    the host evidence, and ``keep = NOT host_flagged``."""
    from .curation import _lower_words

    words = _lower_words(F.coalesce(F.col(text_col), F.lit("")))
    n_words = F.size(words)
    sum_chars = F.length(F.concat_ws("", words))
    doc_bad = (n_words < F.lit(min_words)) | (
        sum_chars < F.lit(low_avg) * n_words
    )
    base = df.select(
        F.col(id_col),
        F.col(host_col).alias("host"),
        doc_bad.alias("doc_bad"),
    )
    stats = base.groupBy("host").agg(
        F.count("*").alias("host_docs"),
        F.sum(F.col("doc_bad").cast("long")).alias("host_bad"),
    )
    verdict = stats.select(
        F.col("host").alias("v_host"),
        "host_docs",
        "host_bad",
        (
            (F.col("host_docs") >= F.lit(min_docs))
            & (F.lit(bad_mult) * F.col("host_bad") > F.col("host_docs"))
        ).alias("host_flagged"),
    )
    return (
        base.join(verdict, base["host"].eqNullSafe(F.col("v_host")), "left")
        .select(
            id_col,
            "host",
            "doc_bad",
            "host_docs",
            "host_bad",
            "host_flagged",
            (~F.col("host_flagged")).alias("keep"),
        )
    )


def sql_host_quality_gate(
    table: str = "documents",
    text_expr: str = "text",
    host_expr: str = "source",
    id_expr: str = "doc_id",
    min_words: int = 30,
    low_avg: int = 4,
    bad_mult: int = 4,
    min_docs: int = 3,
) -> str:
    """DuckDB twin of :func:`host_quality_gate` — same integer
    recursion (DuckDB ``array_to_string([])`` is NULL where Spark
    ``concat_ws`` gives ``''``, hence the coalesce; integer sums cast
    back from HUGEINT)."""
    from .curation import _sql_lower_words

    ws = _sql_lower_words(f"coalesce({text_expr}, '')")
    return (
        f"WITH b AS (SELECT {id_expr} AS doc_id, {host_expr} AS host, "
        f"(len(ws) < {min_words} OR "
        f"coalesce(len(array_to_string(ws, '')), 0) < {low_avg} * len(ws)) "
        f"AS doc_bad FROM (SELECT {id_expr}, {host_expr}, {ws} AS ws "
        f"FROM {table})), "
        "s AS (SELECT host, count(*) AS host_docs, "
        "CAST(sum(CASE WHEN doc_bad THEN 1 ELSE 0 END) AS BIGINT) AS host_bad "
        "FROM b GROUP BY host), "
        f"v AS (SELECT *, (host_docs >= {min_docs} AND "
        f"{bad_mult} * host_bad > host_docs) AS host_flagged FROM s) "
        "SELECT b.doc_id, b.host, b.doc_bad, v.host_docs, v.host_bad, "
        "v.host_flagged, NOT v.host_flagged AS keep "
        "FROM b JOIN v ON b.host IS NOT DISTINCT FROM v.host"
    )


def sql_host_cap(
    score_expr: str,
    host_expr: str = "source",
    id_expr: str = "doc_id",
    k: int = 5,
    table: str = "documents",
) -> str:
    """DuckDB window twin of :func:`host_cap` (NaN → -inf like Spark:
    DuckDB ORDER BY ranks NaN above +inf, Spark's struct sort ranks it
    below everything after negation)."""
    clean = (
        f"coalesce(CASE WHEN isnan({score_expr}) THEN CAST('-inf' AS DOUBLE) "
        f"ELSE {score_expr} END, CAST('-inf' AS DOUBLE))"
    )
    return (
        f"SELECT {host_expr} AS source, CAST(rn AS INT) AS host_rank, "
        f"{id_expr} AS doc_id, score FROM ("
        f"SELECT {host_expr}, {id_expr}, {clean} AS score, "
        f"row_number() OVER (PARTITION BY {host_expr} "
        f"ORDER BY {clean} DESC, {id_expr}) AS rn "
        f"FROM {table}) WHERE rn <= {k}"
    )


def group_sample(
    df: DataFrame,
    k: int = 3,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "sample",
    fan_in: int = 64,
) -> DataFrame:
    """Exactly-``k`` deterministic uniform sample PER GROUP — the
    inspection-sample / eval-subset op (stratified_sample draws a
    FRACTION per stratum; audits and eval sets need a fixed count from
    every stratum regardless of its size).

    Sampling = keep the ``k`` smallest md5(doc_id‖salt) ranks in each
    group: uniform over the group (md5 is a fixed pseudo-random
    permutation of ids), reproducible run-to-run and cluster-to-cluster,
    and engine-portable (hex strings compare identically everywhere).
    Groups smaller than ``k`` keep all members.

    Scale shape: the same tree of bounded top-K reductions as
    :func:`host_cap` — a mega-group never funnels through one task and
    every aggregation buffer is bounded — so a fixed-k sample of a
    power-law crawl costs one corpus shuffle of 50-byte structs.
    Output: (group, sample_rank 1..k, doc_id)."""
    rank = F.md5(
        F.concat(
            F.coalesce(F.col(id_col).cast("string"), F.lit("")),
            F.lit(salt),
        )
    )
    key = F.struct(rank.alias("r"), F.col(id_col).alias("id"))
    base = df.select(
        F.col(group_col).alias("host"),
        F.spark_partition_id().alias("__pid"),
        key.alias("e"),
    )
    local = _topk_merge(base, ["host", "__pid"], k)  # map-side complete
    salted = local.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("e.id")), F.lit(fan_in))
    )
    mid = _topk_merge(salted, ["host", "__salt"], k)
    final = mid.groupBy("host").agg(
        F.slice(F.array_sort(F.collect_list("e")), 1, k).alias("top")
    )
    return final.select("host", F.posexplode("top").alias("pos", "e")).select(
        F.col("host").alias(group_col),
        (F.col("pos") + 1).cast("int").alias("sample_rank"),
        F.col("e.id").alias(id_col),
    )


def sql_group_sample(
    k: int = 3,
    group_expr: str = "source",
    id_expr: str = "doc_id",
    salt: str = "sample",
    table: str = "documents",
) -> str:
    """DuckDB window twin of :func:`group_sample` — same md5 rank, same
    id tie-break, plain row_number formulation."""
    rank = f"md5(coalesce(CAST({id_expr} AS VARCHAR), '') || '{salt}')"
    return (
        f"SELECT {group_expr} AS {group_expr}, CAST(rn AS INT) AS sample_rank, "
        f"{id_expr} AS {id_expr} FROM ("
        f"SELECT {group_expr}, {id_expr}, "
        f"row_number() OVER (PARTITION BY {group_expr} "
        f"ORDER BY {rank}, {id_expr}) AS rn "
        f"FROM {table}) WHERE rn <= {k}"
    )


# ---------------------------------------------------------------------------
# Wilson lower-bound host ranking
# ---------------------------------------------------------------------------
#
# Ranking hosts by raw pass rate over-trusts tiny hosts (1/1 = 100%
# beats 980/1000); the standard fix is the lower bound of the Wilson
# score interval (Wilson 1927; popularized for ranking by E. Miller's
# "How Not To Sort By Average Rating"), which shrinks low-support
# estimates toward zero. At z = 2 (z² = 4, ~97.7% one-sided) the bound
# over n docs with s passes reduces to
#
#   LB = (s + 2 − 2·sqrt(s·(n−s)/n + 1)) / (n + 4)
#
# and everything except the sqrt is integer. We evaluate the sqrt in
# fixed point: R = floor(s·(n−s)·10¹² / n) + 10¹² (computed
# overflow-free as (A div n)·10¹² + ((A mod n)·10¹²) div n with
# A = s·(n−s)), then isqrt(R) ≈ 10⁶·sqrt(·) via the exact-integer-sqrt
# CASE device shared with maintenance.temperature_mix. The result in
# parts-per-million is bit-identical across engines, partitionings and
# cluster sizes. Exact while (A div n)·10¹² < 2⁶³, i.e. hosts up to
# ~3.6·10⁷ docs — beyond that, cap the host first (host_cap) or drop
# the fixed-point scale one decade.


_WILSON_SCALE = 10**12


def _wilson_r_expr(div: str) -> str:
    """Engine-shared fixed-point radicand: floor(A·10¹²/n) + 10¹²."""
    s = _WILSON_SCALE
    return (
        f"((n_pass * (n_docs - n_pass)) {div} n_docs) * {s} "
        f"+ (((n_pass * (n_docs - n_pass)) % n_docs) * {s}) {div} n_docs "
        f"+ {s}"
    )


def host_wilson_rank(
    df: DataFrame,
    text_col: str = "text",
    host_col: str = "source",
    id_col: str = "doc_id",
    min_words: int = 30,
    low_avg: int = 4,
) -> DataFrame:
    """(host, n_docs, n_pass, wilson_lb_ppm): hosts scored by the
    Wilson lower bound of their doc-quality pass rate — the
    support-aware companion to :func:`host_quality_gate`'s hard
    threshold. The per-doc pass verdict is the same integer-only rule
    (≥ ``min_words`` tokens AND mean word length ≥ ``low_avg``, spelled
    cross-multiplied). A 1/1 host lands at 166,666 ppm while a
    980/1000 host keeps ~960,000 ppm — exactly the shrinkage the bound
    exists for.

    Scale shape: one host-keyed integer aggregation (map-side combined,
    #hosts ≪ #docs) followed by per-row integer arithmetic — no second
    shuffle, no window, no Python. NULL hosts are dropped (no
    attributable support)."""
    from .curation import _lower_words

    words = _lower_words(F.coalesce(F.col(text_col), F.lit("")))
    n_words = F.size(words)
    sum_chars = F.length(F.concat_ws("", words))
    doc_pass = (n_words >= F.lit(min_words)) & (
        sum_chars >= F.lit(low_avg) * n_words
    )
    stats = (
        df.filter(F.col(host_col).isNotNull())
        .select(F.col(host_col).alias("host"), doc_pass.cast("long").alias("p"))
        .groupBy("host")
        .agg(F.count("*").alias("n_docs"), F.sum("p").alias("n_pass"))
    )
    return (
        stats.withColumn("R", F.expr(_wilson_r_expr("div")).cast("long"))
        .withColumn("c", F.floor(F.sqrt(F.col("R").cast("double"))).cast("long"))
        .withColumn("sq", F.expr(_isqrt_case("R", "c", "div")).cast("long"))
        .select(
            "host",
            "n_docs",
            "n_pass",
            F.greatest(
                F.lit(0).cast("long"),
                F.expr("(1000000 * (n_pass + 2) - 2 * sq) div (n_docs + 4)"),
            ).alias("wilson_lb_ppm"),
        )
    )


def sql_host_wilson_rank(
    table: str = "documents",
    text_expr: str = "text",
    host_expr: str = "source",
    min_words: int = 30,
    low_avg: int = 4,
) -> str:
    """DuckDB twin of :func:`host_wilson_rank` — identical integer
    recursion (`//` == Spark `div` on the all-non-negative values;
    HUGEINT sums cast back to BIGINT before the products)."""
    from .curation import _sql_lower_words

    ws = _sql_lower_words(f"coalesce({text_expr}, '')")
    return (
        f"WITH b AS (SELECT {host_expr} AS host, "
        f"(len(ws) >= {min_words} AND "
        f"coalesce(len(array_to_string(ws, '')), 0) >= {low_avg} * len(ws)) "
        f"AS p FROM (SELECT {host_expr}, {ws} AS ws FROM {table} "
        f"WHERE {host_expr} IS NOT NULL)), "
        "s AS (SELECT host, count(*) AS n_docs, "
        "CAST(sum(CASE WHEN p THEN 1 ELSE 0 END) AS BIGINT) AS n_pass "
        "FROM b GROUP BY host), "
        f"r AS (SELECT *, CAST({_wilson_r_expr('//')} AS BIGINT) AS R FROM s), "
        "cc AS (SELECT *, CAST(floor(sqrt(CAST(R AS DOUBLE))) AS BIGINT) AS c "
        "FROM r), "
        f"q AS (SELECT *, CAST({_isqrt_case('R', 'c', '//')} AS BIGINT) AS sq "
        "FROM cc) "
        "SELECT host, n_docs, n_pass, CAST(greatest(0, "
        "(1000000 * (n_pass + 2) - 2 * sq) // (n_docs + 4)) AS BIGINT) "
        "AS wilson_lb_ppm FROM q"
    )


# ---------------------------------------------------------------------------
# Gini concentration of corpus mass across hosts / sources
# ---------------------------------------------------------------------------
#
# The Gini coefficient (Gini 1912, via the Lorenz-curve rank form) is
# the standard one-number answer to "how concentrated is the crawl?" —
# 0 when every host contributes equal mass, → 1 when one host owns the
# corpus. Crawl reports (and the per-host cap above) care because a
# high-Gini corpus is a deduplication and diversity liability.
#
# Rank form over masses x_1 ≤ … ≤ x_n (ties broken by group name):
#     G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i)
# All sums are exact int64; the single division floors to ppm. The
# rank window is GROUP-sized (hosts/sources), not corpus-sized — the
# ppl-cutoffs device; the mass aggregation itself is one map-side
# combinable groupBy. Domain bound (documented, same class as the
# 10^12 fixed-point ops): n·total_mass must fit int64 — holds for any
# realistic (groups ≤ 10^6) × (mass ≤ 10^12) report; pre-scale the
# mass column if you exceed it.


def mass_gini(
    df: DataFrame,
    group_col: str = "source",
    mass_col: str = "n_chars",
) -> DataFrame:
    """One row (n_groups, total_mass, gini_ppm): Gini concentration of
    integer ``mass_col`` summed per ``group_col`` (NULL groups and
    NULL masses excluded)."""
    from pyspark.sql.window import Window

    g = (
        df.filter(F.col(group_col).isNotNull() & F.col(mass_col).isNotNull())
        .groupBy(F.col(group_col).alias("grp"))
        .agg(F.sum(F.col(mass_col).cast("long")).alias("mass"))
    )
    w = Window.orderBy("mass", "grp")
    ranked = g.select(
        "mass", F.row_number().over(w).cast("long").alias("i")
    )
    agg = ranked.agg(
        F.count("*").alias("n_groups"),
        F.sum("mass").alias("total_mass"),
        F.sum(F.col("i") * F.col("mass")).alias("s1"),
    )
    # integer DIV, not `/`: float division would round above 2^53 and
    # the floor could then disagree with the twin's exact `//`
    gini = F.expr(
        "(2 * s1 - (n_groups + 1) * total_mass) * 1000000"
        " DIV (n_groups * total_mass)"
    )
    return agg.select(
        "n_groups",
        "total_mass",
        F.when(
            (F.col("n_groups") > 0) & (F.col("total_mass") > 0), gini
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("gini_ppm"),
    )


def sql_mass_gini(
    rel: str = "documents",
    group_expr: str = "source",
    mass_expr: str = "n_chars",
) -> str:
    """DuckDB twin of :func:`mass_gini`."""
    return f"""
WITH g AS (SELECT {group_expr} AS grp, CAST(sum({mass_expr}) AS BIGINT) AS mass
           FROM {rel}
           WHERE {group_expr} IS NOT NULL AND {mass_expr} IS NOT NULL
           GROUP BY {group_expr}),
     r AS (SELECT mass, CAST(row_number() OVER (ORDER BY mass, grp) AS BIGINT) AS i
           FROM g),
     a AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
                  CAST(sum(mass) AS BIGINT) AS total_mass,
                  CAST(sum(i * mass) AS BIGINT) AS s1 FROM r)
SELECT n_groups, total_mass,
       CAST(CASE WHEN n_groups > 0 AND total_mass > 0
            THEN (2 * s1 - (n_groups + 1) * total_mass) * 1000000
                 // (n_groups * total_mass)
            ELSE 0 END AS BIGINT) AS gini_ppm
FROM a
"""
