"""Data-forensics operators: timing-regularity bot detection and
Benford first-digit analysis.

- :func:`bot_regularity` — automated clients fire on timers; humans
  don't. The standard signal is the coefficient of variation of a
  user's inter-event gaps (CV = σ/μ): CV → 0 for cron-like bots,
  ≈ 1 for memoryless (Poisson/human-ish) arrivals. (Timing-regularity
  features are the core of classic bot-detection work, e.g. Gianvecchio
  et al., CCS 2008 "Measurement and classification of humans and bots
  in internet chat".)
- :func:`benford_digits` — Benford's law (Benford 1938; Nigrini's
  fraud-audit methodology): first significant digits of naturally
  occurring numbers follow p(d) = log10(1 + 1/d); strong deviation
  (the chi-square statistic) flags synthetic or manipulated values.

Cross-engine determinism:
- bot CV uses the identity σ/μ = sqrt(n·Σx² − (Σx)²) / Σx — every sum
  is exact int64 over gap SECONDS (gap² in seconds is overflow-safe
  where microseconds would not be), the radicand is one exact integer,
  and the single sqrt/div chain rounds to 6 dp (the dimsum device).
- Benford digits come from the INTEGER column's decimal string (first
  character) — no log10/pow boundary case can disagree; expected
  probabilities are driver-side literals; each digit's chi² term is a
  fixed expression over exact counts.

Scale shape: bot gaps = one user-keyed window (partition bounded by a
user's events — the lm_score contract) + one combinable aggregate;
Benford = one narrow projection + a 9-row groupBy.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

BENFORD_P = [math.log10(1.0 + 1.0 / d) for d in range(1, 10)]


def bot_regularity(
    events: DataFrame,
    min_events: int = 5,
    cv_bot: float = 0.1,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, n_gaps, sum_gap_s, cv, is_bot): per-user inter-event
    gap statistics for users with ≥ ``min_events`` timestamped events —
    ``cv`` = round(sqrt(n·Σg² − (Σg)²) / Σg, 6), ``is_bot`` = cv <
    ``cv_bot`` (sub-second-uniform timers read cv 0). Users whose gaps
    are all zero (same-instant bursts) emit cv NULL (undefined μ=0).

    Overflow bound: gaps are clamped to 10⁸ s (~3.2 years — beyond any
    real inter-event gap; the clamp only fires on corrupt timestamps
    like pre-epoch or far-future rows, which the adversarial sweep
    feeds deliberately). Unclamped, one ≥96-year gap squares past
    int64 and Spark's ANSI multiply throws while DuckDB widens —
    engine-divergent. Clamped, Σg² overflows only past ~922 corrupt
    gaps PER USER (n·10¹⁶ vs 2⁶³), and the cv radicand's (Σg)² stays
    exact while a user's total history span is < ~96 years —
    unreachable for data that means anything; the clamp is applied
    identically in both engines."""
    ev = events.filter(F.col(ts_col).isNotNull()).select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us")
    gaps = (
        ev.withColumn("prev", F.lag("ts_us").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            "user_id",
            # integer DIV: Spark's float `/`+cast truncates while
            # DuckDB's CAST(double) rounds half-away (the ppl_buckets
            # trap) — floor division sidesteps the convention entirely
            F.expr(
                "least((ts_us - prev) DIV 1000000, 100000000L)"
            ).alias("g"),
        )
    )
    agg = gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.sum("g").alias("s1"),
        F.sum(F.col("g") * F.col("g")).alias("s2"),
    ).filter(F.col("n_gaps") >= min_events - 1)
    cv = F.round(
        F.sqrt(
            (F.col("n_gaps") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
                "double"
            )
        )
        / F.col("s1"),
        6,
    )
    return agg.select(
        "user_id",
        "n_gaps",
        F.col("s1").alias("sum_gap_s"),
        F.when(F.col("s1") > 0, cv).alias("cv"),
        F.when(F.col("s1") > 0, cv < F.lit(cv_bot)).alias("is_bot"),
    )


def sql_bot_regularity(
    table: str = "events",
    min_events: int = 5,
    cv_bot: float = 0.1,
    user_expr: str = "user_id",
    ts_expr: str = "ts",
) -> str:
    """DuckDB twin of :func:`bot_regularity`."""
    return f"""
WITH ev AS (SELECT {user_expr} AS user_id,
                   CAST(epoch_us({ts_expr}) AS BIGINT) AS ts_us
            FROM {table} WHERE {ts_expr} IS NOT NULL),
gaps AS (SELECT user_id, least(raw_g, 100000000) AS g
         FROM (SELECT user_id,
                      (ts_us - lag(ts_us) OVER (PARTITION BY user_id
                           ORDER BY ts_us)) // 1000000 AS raw_g
               FROM ev)
         -- filter BEFORE the clamp: least() ignores NULLs in both
         -- engines, so clamping the lag-NULL first row would invent a
         -- phantom max-size gap per user
         WHERE raw_g IS NOT NULL),
a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(g) AS BIGINT) AS s1, CAST(sum(g * g) AS BIGINT) AS s2
      FROM gaps WHERE g IS NOT NULL GROUP BY user_id)
SELECT user_id, n_gaps, s1 AS sum_gap_s,
       CASE WHEN s1 > 0 THEN
         round(sqrt(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)) / s1, 6) END AS cv,
       CASE WHEN s1 > 0 THEN
         round(sqrt(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)) / s1, 6)
           < {cv_bot!r} END AS is_bot
FROM a WHERE n_gaps >= {min_events - 1}
"""


def benford_digits(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """(digit, n_obs, obs_ppm, benford_ppm, chi2_term): first-digit
    distribution of a POSITIVE INTEGER column vs Benford's law — the
    digit comes from the decimal string (exact; no float log10
    boundary), ``chi2_term`` = (obs − n·p)²/(n·p) rounded to 6 dp.
    Σ chi2_term against χ²(8) critical values is the audit statistic.
    Non-positive and NULL values are excluded."""
    v = F.col(value_col)
    digit = F.substring(v.cast("string"), 1, 1).cast("int")
    base = df.filter(v.isNotNull() & (v > 0)).select(digit.alias("digit"))
    counts = base.groupBy("digit").agg(F.count("*").alias("n_obs"))
    total = base.agg(F.count("*").alias("n_total"))
    p_arr = F.array(*[F.lit(p) for p in BENFORD_P])
    j = counts.crossJoin(F.broadcast(total))
    exp = F.col("n_total") * F.element_at(p_arr, F.col("digit"))
    chi = F.round(
        (F.col("n_obs") - exp) * (F.col("n_obs") - exp) / exp, 6
    )
    return j.select(
        F.col("digit").cast("long").alias("digit"),
        "n_obs",
        F.expr("n_obs * 1000000 DIV n_total").alias("obs_ppm"),
        F.floor(F.element_at(p_arr, F.col("digit")) * 1_000_000)
        .cast("long")
        .alias("benford_ppm"),
        chi.alias("chi2_term"),
    )


def sql_benford_digits(rel: str, value_expr: str) -> str:
    """DuckDB twin of :func:`benford_digits`."""
    probs = "[" + ", ".join(f"CAST({p!r} AS DOUBLE)" for p in BENFORD_P) + "]"
    return f"""
WITH base AS (SELECT CAST(substring(CAST({value_expr} AS VARCHAR), 1, 1)
                     AS INT) AS digit
              FROM {rel}
              WHERE {value_expr} IS NOT NULL AND {value_expr} > 0),
counts AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
           FROM base GROUP BY digit),
total AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM base)
SELECT CAST(digit AS BIGINT) AS digit, n_obs,
       CAST(n_obs * 1000000 // n_total AS BIGINT) AS obs_ppm,
       CAST(floor({probs}[digit] * 1000000) AS BIGINT) AS benford_ppm,
       round((n_obs - n_total * {probs}[digit])
             * (n_obs - n_total * {probs}[digit])
             / (n_total * {probs}[digit]), 6) AS chi2_term
FROM counts CROSS JOIN total
"""


# ---------------------------------------------------------------------------
# Kleinberg burst detection (KDD 2002, "Bursty and hierarchical
# structure in streams") — the 2-state automaton
# ---------------------------------------------------------------------------
#
# The classic activity-burst detector: a user's inter-event gaps are
# emissions of a 2-state automaton (q0 = base rate n/T, q1 = burst rate
# s·n/T); entering the burst state costs γ·ln n; the optimal state
# sequence is the Viterbi path. Where bot_regularity scores GLOBAL
# timing regularity, this finds LOCALIZED bursts (flash crowds, retry
# storms, coordinated posting).
#
# Exact-integer Viterbi: every cost is micro-scaled int64 —
#   cost_i(g)·10⁶ = (s_i·n·g·10⁶) DIV T − ilnμ(s_i) − ilnμ(n) + ilnμ(T)
# (the exponential-density negative log-likelihood −ln α + α·g with the
# engine's fixed-point ln device: the ONLY float per distinct count is
# one ln() rounded at 10⁶, after which the DP is exact int64 adds and
# comparisons with SPELLED-OUT tie rules: state 0 prefers coming from
# state 0 on equal cost; state 1 prefers staying). The fold is
# position-ordered (the lm_score contract), so the result is
# bit-identical across engines and partitionings. The start state is
# q0; an immediate burst pays the transition via the init accumulator
# (c1₀ = γ·ilnμ(n)), so no infinity sentinel exists to overflow.
#
# The per-gap DP runs as an ordered HOF fold over the user's gap array
# (Spark `aggregate`, DuckDB `list_reduce` with a prepended init
# element) — one user-keyed shuffle, buffers bounded by a user's event
# count, no Python, no window beyond the doc-bounded sort. Backtracking
# is avoided by folding the burst-gap COUNT along both live paths —
# the standard Viterbi-statistic trick.
#
# Overflow bound (documented): s·n·g·10⁶ must fit int64 → n·g <
# 4.6·10¹² per user (e.g. 10⁵ gaps × a year-long gap is safe); beyond
# that, pre-bucket gaps to coarser units.

BURST_SCALE = 10**6


def kleinberg_bursts(
    events: DataFrame,
    min_events: int = 5,
    s: int = 2,
    gamma: int = 1,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, n_gaps, span_s, burst_gaps, min_cost_micro,
    final_state): per-user optimal 2-state Kleinberg path over the
    inter-event gap sequence (seconds, floor-divided from micros — the
    bot_regularity device). ``burst_gaps`` counts gaps emitted in the
    burst state on the optimal path; users with < ``min_events`` events
    or zero total span are dropped (rate undefined)."""
    iln_s = round(math.log(s) * BURST_SCALE)
    ev = events.filter(F.col(ts_col).isNotNull()).select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
    )
    arr = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list("ts_us")).alias("ts_arr")
    )
    gaps = arr.select(
        "user_id",
        # zip_with over shifted slices, NOT sequence(2, n): Spark's
        # sequence(2, 1) DESCENDS for single-event users and the
        # element_at then reads out of bounds; slice length 0 is safe
        F.expr(
            "zip_with(slice(ts_arr, 2, size(ts_arr) - 1), "
            "slice(ts_arr, 1, size(ts_arr) - 1), "
            "(a, b) -> (a - b) DIV 1000000L)"
        ).alias("gaps"),
    ).filter(F.size("gaps") >= min_events - 1)
    stats = gaps.select(
        "user_id",
        "gaps",
        F.size("gaps").cast("long").alias("n"),
        F.expr("aggregate(gaps, 0L, (a, g) -> a + g)").alias("t"),
    ).filter(F.col("t") >= 1)
    consts = stats.select(
        "user_id",
        "gaps",
        "n",
        "t",
        F.round(F.log(F.col("n").cast("double")) * BURST_SCALE)
        .cast("long")
        .alias("iln_n"),
        F.round(F.log(F.col("t").cast("double")) * BURST_SCALE)
        .cast("long")
        .alias("iln_t"),
    ).withColumn("trans", F.lit(gamma) * F.col("iln_n"))
    folded = consts.select(
        "user_id",
        F.col("n").alias("n_gaps"),
        F.col("t").alias("span_s"),
        F.expr(
            "aggregate(gaps, "
            "struct(0L AS c0, 0L AS b0, trans AS c1, 0L AS b1), "
            "(a, g) -> struct("
            "least(a.c0, a.c1) + ((n * g * 1000000L) DIV t - iln_n + iln_t) AS c0, "
            "IF(a.c0 <= a.c1, a.b0, a.b1) AS b0, "
            f"least(a.c0 + trans, a.c1) + (({s}L * n * g * 1000000L) DIV t "
            f"- {iln_s}L - iln_n + iln_t) AS c1, "
            "IF(a.c1 <= a.c0 + trans, a.b1, a.b0) + 1L AS b1))"
        ).alias("acc"),
    )
    return folded.select(
        "user_id",
        "n_gaps",
        "span_s",
        F.expr("IF(acc.c0 <= acc.c1, acc.b0, acc.b1)").alias("burst_gaps"),
        F.expr("least(acc.c0, acc.c1)").alias("min_cost_micro"),
        F.expr("IF(acc.c0 <= acc.c1, 0, 1)").cast("int").alias("final_state"),
    )


def sql_kleinberg_bursts(
    table: str = "events",
    min_events: int = 5,
    s: int = 2,
    gamma: int = 1,
    user_expr: str = "user_id",
    ts_expr: str = "ts",
) -> str:
    """DuckDB twin of :func:`kleinberg_bursts`: identical gap
    extraction, micro-ln constants and DP tie rules; the fold is
    ``list_reduce`` over [g,0,0,0] 4-lists with the init accumulator
    prepended (list_reduce has no init parameter)."""
    iln_s = round(math.log(s) * BURST_SCALE)
    return f"""
WITH ev AS (SELECT {user_expr} AS user_id,
                   CAST(epoch_us({ts_expr}) AS BIGINT) AS ts_us
            FROM {table} WHERE {ts_expr} IS NOT NULL),
arr AS (SELECT user_id, list(ts_us ORDER BY ts_us) AS l
        FROM ev GROUP BY user_id),
gp AS (SELECT user_id, list_transform(generate_series(2, len(l)),
              i -> (l[i] - l[i - 1]) // 1000000) AS gaps
       FROM arr WHERE len(l) >= {min_events}),
st AS (SELECT user_id, gaps, CAST(len(gaps) AS BIGINT) AS n,
              CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), gaps),
                   (a, g) -> a + g) AS BIGINT) AS t
       FROM gp),
co AS (SELECT user_id, gaps, n, t,
              CAST(round(ln(CAST(n AS DOUBLE)) * {BURST_SCALE}) AS BIGINT)
                AS iln_n,
              CAST(round(ln(CAST(t AS DOUBLE)) * {BURST_SCALE}) AS BIGINT)
                AS iln_t
       FROM st WHERE t >= 1),
fd AS (SELECT user_id, n AS n_gaps, t AS span_s,
              list_reduce(
                list_prepend([CAST(0 AS BIGINT), 0,
                              {gamma} * iln_n, 0],
                             list_transform(gaps, g -> [g, CAST(0 AS BIGINT),
                                                        0, 0])),
                (a, x) -> [
                  least(a[1], a[3]) + ((n * x[1] * 1000000) // t
                    - iln_n + iln_t),
                  CASE WHEN a[1] <= a[3] THEN a[2] ELSE a[4] END,
                  least(a[1] + {gamma} * iln_n, a[3])
                    + (({s} * n * x[1] * 1000000) // t
                       - {iln_s} - iln_n + iln_t),
                  (CASE WHEN a[3] <= a[1] + {gamma} * iln_n
                        THEN a[4] ELSE a[2] END) + 1]) AS acc
       FROM co)
SELECT user_id, n_gaps, span_s,
       CAST(CASE WHEN acc[1] <= acc[3] THEN acc[2] ELSE acc[4] END AS BIGINT)
         AS burst_gaps,
       CAST(least(acc[1], acc[3]) AS BIGINT) AS min_cost_micro,
       CAST(CASE WHEN acc[1] <= acc[3] THEN 0 ELSE 1 END AS INTEGER)
         AS final_state
FROM fd
"""


# ---------------------------------------------------------------------------
# CUSUM change detection (Page 1954, "Continuous Inspection Schemes")
# ---------------------------------------------------------------------------
#
# The classic sequential drift detector over per-entity event streams:
# the recursion S+_t = max(0, S+_{t-1} + (v_t - target - allowance))
# alarms when a stream's level has shifted UP persistently (S-_t
# symmetric for down-shifts) — the ops-monitoring primitive for
# per-host fetch latencies, per-source quality scores, per-user
# activity levels. NOT implemented as a sequential fold: the textbook
# identity S_t = P_t - min_{0<=j<=t} P_j (P = prefix sums of the
# drift increments, P_0 = 0) turns both sides into ONE prefix-sum
# window + ONE running-min window over the same per-entity ordering —
# fully relational in both engines, which also sidesteps the DuckDB
# grouped-list_reduce defect the funnel twin documents. This is the
# no-reset ("decision function") form: n_alarms counts samples above
# threshold rather than resetting S after each alarm (documented
# variant; the reset form needs the sequential fold).
#
# Exact integer end-to-end: values, target, allowance and threshold
# are int64, prefix sums and running mins are exact associative /
# order-fixed-by-key, so every output is bit-identical cross-engine.
# Rows with NULL value or NULL order key are outside the monitored
# universe (the hostile-events window rule). NULL group is a real
# stream. Windows partition per entity, ordered by (ts, id) — stream-
# sized partitions, the lm_score/funnel per-entity acceptance class.


def cusum(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ts_col: str,
    id_col: str,
    target: int,
    allowance: int = 0,
    threshold: int = 0,
) -> DataFrame:
    """(group, n_events, max_s_plus, max_s_minus, n_alarms,
    first_alarm_ts): Page's CUSUM per group over the (ts, id)-ordered
    integer ``value_col`` stream. ``threshold`` <= 0 disables alarms
    (max trajectories still reported, n_alarms 0, NULL first alarm)."""
    from pyspark.sql import Window

    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("long").alias("v"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("eid"),
    ).filter(F.col("v").isNotNull() & F.col("ts").isNotNull())
    w = (
        Window.partitionBy("grp")
        .orderBy("ts", "eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = base.select(
        "grp", "ts", "eid",
        F.sum(F.col("v") - F.lit(target + allowance)).over(w).alias("p"),
        F.sum(F.lit(target - allowance) - F.col("v")).over(w).alias("q"),
    )
    s = pre.select(
        "grp", "ts",
        (F.col("p") - F.least(F.lit(0), F.min("p").over(w))).alias("sp"),
        (F.col("q") - F.least(F.lit(0), F.min("q").over(w))).alias("sm"),
    )
    if threshold > 0:
        alarm = (F.col("sp") > threshold) | (F.col("sm") > threshold)
    else:
        alarm = F.lit(False)
    return s.groupBy(F.col("grp").alias(group_col)).agg(
        F.count("*").alias("n_events"),
        F.max("sp").alias("max_s_plus"),
        F.max("sm").alias("max_s_minus"),
        F.sum(alarm.cast("long")).alias("n_alarms"),
        F.min(F.when(alarm, F.col("ts"))).alias("first_alarm_ts"),
    )


def sql_cusum(
    rel: str,
    value_expr: str,
    group_expr: str,
    ts_expr: str,
    id_expr: str,
    target: int,
    allowance: int = 0,
    threshold: int = 0,
) -> str:
    """DuckDB twin of :func:`cusum` — identical prefix-sum / running-
    min windows and integer algebra."""
    alarm = (
        f"(sp > {threshold} OR sm > {threshold})" if threshold > 0 else "FALSE"
    )
    wspec = (
        "PARTITION BY grp ORDER BY ts, eid "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    return (
        f"WITH base AS (SELECT {group_expr} AS grp, "
        f"CAST({value_expr} AS BIGINT) AS v, {ts_expr} AS ts, "
        f"{id_expr} AS eid FROM {rel} "
        f"WHERE {value_expr} IS NOT NULL AND {ts_expr} IS NOT NULL), "
        "pre AS (SELECT grp, ts, eid, "
        f"CAST(sum(v - {target + allowance}) OVER ({wspec}) AS BIGINT) AS p, "
        f"CAST(sum({target - allowance} - v) OVER ({wspec}) AS BIGINT) AS q "
        "FROM base), "
        "s AS (SELECT grp, ts, "
        f"p - least(0, min(p) OVER ({wspec})) AS sp, "
        f"q - least(0, min(q) OVER ({wspec})) AS sm "
        "FROM pre) "
        f"SELECT grp AS {group_expr}, CAST(count(*) AS BIGINT) AS n_events, "
        "CAST(max(sp) AS BIGINT) AS max_s_plus, "
        "CAST(max(sm) AS BIGINT) AS max_s_minus, "
        f"CAST(sum(CASE WHEN {alarm} THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_alarms, "
        f"min(CASE WHEN {alarm} THEN ts END) AS first_alarm_ts "
        "FROM s GROUP BY grp"
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test (Wald & Wolfowitz 1940) per entity stream
# ---------------------------------------------------------------------------
#
# The randomness audit CUSUM and bot_regularity don't cover: is the
# SEQUENCE of above/below-threshold outcomes random, or does it
# alternate/stick more than chance allows? A scripted client that
# ping-pongs between two request classes produces far too MANY runs
# (z >> 0 after sign convention below); a state-machine bot that
# dwells produces far too FEW (z << 0). R = 1 + #(adjacent sign
# changes) via one lag over the per-entity (ts, id) ordering — exact
# integer; the null moments mu = 1 + 2*n1*n2/n and
# sigma^2 = 2*n1*n2*(2*n1*n2 - n) / (n^2*(n-1)) enter as ONE fixed
# chain of correctly-rounded IEEE ops over exact-integer-valued
# doubles (2*n1*n2 would overflow int64 past ~2e9 events per entity —
# the double form is exact-input and deterministic), z rounded to 6.
# Degenerate streams (n1 = 0 or n2 = 0 or n < 2) emit NULL z.
#
# Scale shape: one per-entity window (lag) + one combinable
# aggregation — stream-sized partitions, the cusum acceptance class.
# NULL value / NULL ts rows are outside the tested universe; NULL
# entity is a real stream.


def runs_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ts_col: str,
    id_col: str,
    threshold: int,
) -> DataFrame:
    """(group, n, n1, n2, n_runs, z6): the runs test of the
    above-``threshold`` indicator sequence per entity."""
    from pyspark.sql import Window

    base = df.select(
        F.col(group_col).alias("grp"),
        (F.col(value_col).cast("long") > threshold).cast("int").alias("b"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("eid"),
    ).filter(F.col(value_col).isNotNull() & F.col("ts").isNotNull())
    w = Window.partitionBy("grp").orderBy("ts", "eid")
    seq = base.withColumn("prev", F.lag("b").over(w))
    agg = seq.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum("b").alias("n1"),
        (F.count("*") - F.sum("b")).alias("n2"),
        (
            F.lit(1)
            + F.sum(
                (F.col("prev").isNotNull() & (F.col("b") != F.col("prev")))
                .cast("long")
            )
        ).alias("n_runs"),
    )
    n, n1, n2, r = (
        F.col("n").cast("double"),
        F.col("n1").cast("double"),
        F.col("n2").cast("double"),
        F.col("n_runs").cast("double"),
    )
    mu = F.lit(1.0) + F.lit(2.0) * n1 * n2 / n
    var = (
        F.lit(2.0)
        * n1
        * n2
        * (F.lit(2.0) * n1 * n2 - n)
        / (n * n * (n - F.lit(1.0)))
    )
    ok = (F.col("n1") > 0) & (F.col("n2") > 0) & (F.col("n") > 1)
    return agg.select(
        F.col("grp").alias(group_col),
        "n",
        "n1",
        "n2",
        "n_runs",
        F.when(ok, F.round((r - mu) / F.sqrt(var), 6) + F.lit(0.0)).alias(
            "z6"
        ),
    )


def sql_runs_test(
    rel: str,
    value_expr: str,
    group_expr: str,
    ts_expr: str,
    id_expr: str,
    threshold: int,
) -> str:
    """DuckDB twin of :func:`runs_test` — identical ordering, lag,
    moments chain and rounding."""
    return (
        f"WITH base AS (SELECT {group_expr} AS grp, "
        f"CASE WHEN CAST({value_expr} AS BIGINT) > {threshold} THEN 1 "
        f"ELSE 0 END AS b, {ts_expr} AS ts, {id_expr} AS eid FROM {rel} "
        f"WHERE {value_expr} IS NOT NULL AND {ts_expr} IS NOT NULL), "
        "seq AS (SELECT grp, b, lag(b) OVER (PARTITION BY grp "
        "ORDER BY ts, eid) AS prev FROM base), "
        "agg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(b) AS BIGINT) AS n1, "
        "CAST(count(*) - sum(b) AS BIGINT) AS n2, "
        "CAST(1 + sum(CASE WHEN prev IS NOT NULL AND b <> prev THEN 1 "
        "ELSE 0 END) AS BIGINT) AS n_runs FROM seq GROUP BY grp) "
        f"SELECT grp AS {group_expr}, n, n1, n2, n_runs, "
        "CASE WHEN n1 > 0 AND n2 > 0 AND n > 1 THEN "
        "round((CAST(n_runs AS DOUBLE) - (1.0 + 2.0 * CAST(n1 AS DOUBLE) "
        "* CAST(n2 AS DOUBLE) / CAST(n AS DOUBLE))) / sqrt(2.0 "
        "* CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * (2.0 "
        "* CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) - CAST(n AS DOUBLE)) "
        "/ (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) "
        "* (CAST(n AS DOUBLE) - 1.0))), 6) + 0.0 END AS z6 FROM agg"
    )
