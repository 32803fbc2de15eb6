"""Ordered funnel analysis over event streams (the windowFunnel /
funnel-conversion operator of the OLAP literature — e.g. ClickHouse's
``windowFunnel``, Amplitude-style conversion funnels).

Given an ordered list of step event-types, compute for each user the
deepest step reached by a greedy earliest-first chain through their
time-ordered events, then the per-step conversion table.

Greedy chain semantics (documented precisely — the cross-engine
contract):
- a user's step-relevant events are processed in ascending
  ``(ts, step_index)`` order (the encoded-int64 order below);
- the chain starts at the FIRST occurrence of step 1 (greedy — a later
  step-1 event is never revisited, the ClickHouse caveat);
- an event advances the chain iff its type is the NEXT step and (when
  a window is set) its timestamp is within ``window_s`` seconds of the
  step-1 event that opened the chain;
- step types must be distinct (validated) — one event matches at most
  one step index.

Scale shape (100 TB):
- non-step events are filtered BEFORE the per-user collect, so state
  per user is bounded by the user's step-relevant event count;
- ONE user-keyed shuffle (groupBy user) builds the sorted event list;
  the chain fold is a position-ordered ``F.aggregate`` over that
  bounded array — the engine's shared sequential-fold device;
- the conversion table aggregates per-user depths with plain
  map-side-combinable sums into ≤ n_steps output rows.

Cross-engine determinism — everything is int64 arithmetic:
- each event is ONE int64 ``ts_micros·16 + step_index`` (fits until
  year 2286; step_index ∈ 1..9);
- the fold accumulator is ONE int64 ``chain_start_micros·16 + depth``
  — depth lives in the LOW bits so both fields are recovered with
  ``%`` and subtraction only (no division, whose float form would lose
  exactness at this magnitude);
- the window test compares in the ×16-scaled space:
  ``(x − x%16) − (acc − acc%16) ≤ window_micros·16``.
Both engines fold the identically-sorted integer list with the same
integer expressions, so per-user depths are bit-identical on any
engine, partitioning or cluster size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = 16  # slots per microsecond: step_index ∈ 1..9 in the low bits
CONV_SCALE = 1_000_000


def _validate(steps: Sequence[str], window_s: float | None) -> None:
    if not 1 <= len(steps) <= 9:
        raise ValueError("funnel supports 1..9 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("step types must be distinct")
    if window_s is not None and window_s <= 0:
        raise ValueError("window_s must be positive")


def funnel_depths(
    events: DataFrame,
    steps: Sequence[str],
    window_s: float | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(user_id, depth): deepest funnel step each user reaches under
    the greedy earliest-first chain. Users with no step-relevant
    events are absent (their depth would be 0)."""
    _validate(steps, window_s)
    idx = F.create_map(
        *[x for i, s in enumerate(steps, start=1) for x in (F.lit(s), F.lit(i))]
    )
    # events tables carry TIMESTAMP_NTZ; the session TZ is pinned UTC
    # (session.py), so casting to TIMESTAMP reads the naive value as
    # UTC — exactly what DuckDB's epoch_us does on a naive timestamp
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    enc = (ts_us * _B + idx[F.col(type_col)].cast("long")).alias("enc")
    relevant = events.filter(
        F.col(type_col).isin(list(steps)) & F.col(ts_col).isNotNull()
    ).select(F.col(user_col).alias("user_id"), enc)

    win16 = None if window_s is None else int(round(window_s * 1_000_000)) * _B

    def fold(acc, x):
        d = acc % _B
        x_idx = x % _B
        in_win = (
            F.lit(True)
            if win16 is None
            else (d == 0) | ((x - x_idx) - (acc - d) <= F.lit(win16))
        )
        adv = (x_idx == d + 1) & in_win
        new_start = F.when(d == 0, x - x_idx).otherwise(acc - d)
        return F.when(adv, new_start + d + 1).otherwise(acc)

    acc = F.aggregate(
        F.array_sort(F.collect_list("enc")), F.lit(0).cast("long"), fold
    )
    return relevant.groupBy("user_id").agg((acc % _B).alias("depth"))


def funnel_conversion(
    events: DataFrame,
    steps: Sequence[str],
    window_s: float | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """The per-step conversion table:
    (step, step_type, users, conv_ppm) for step 1..n — ``users`` =
    users whose greedy depth reached the step, ``conv_ppm`` =
    users·10^6 DIV step-1 users (0 when no user entered)."""
    _validate(steps, window_s)
    depths = funnel_depths(
        events, steps, window_s=window_s, user_col=user_col,
        ts_col=ts_col, type_col=type_col,
    )
    counts = depths.agg(
        *[
            F.sum((F.col("depth") >= s).cast("long")).alias(f"u{s}")
            for s in range(1, len(steps) + 1)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(s).cast("long").alias("step"),
                F.lit(steps[s - 1]).alias("step_type"),
                F.coalesce(F.col(f"u{s}"), F.lit(0)).alias("users"),
            )
            for s in range(1, len(steps) + 1)
        ]
    )
    u1 = F.coalesce(F.col("u1"), F.lit(0))
    out = counts.select(F.explode(rows).alias("r"), u1.alias("u1")).select(
        F.col("r.step").alias("step"),
        F.col("r.step_type").alias("step_type"),
        F.col("r.users").alias("users"),
        F.when(F.col("u1") == 0, F.lit(0).cast("long"))
        .otherwise(F.expr(f"r.users * {CONV_SCALE} DIV u1"))
        .alias("conv_ppm"),
    )
    return out


def sql_funnel_depths(
    steps: Sequence[str],
    window_s: float | None = None,
    table: str = "events",
    user_expr: str = "user_id",
    ts_expr: str = "ts",
    type_expr: str = "event_type",
) -> str:
    """DuckDB twin of :func:`funnel_depths` — deliberately a DIFFERENT
    but provably equivalent shape: the greedy fold's step-k entry point
    is e_k = min{enc : idx = k, enc > e_{k-1}, within window of e_1}
    (induction on the sorted-order fold: depth k is reached exactly at
    the minimal qualifying idx-k event), so the twin is a chain of
    n_steps per-user conditional MINs — no lambda, no fold. Besides
    being structurally independent verification, this dodges a DuckDB
    1.0.0 defect where list_reduce over grouped list() columns returns
    wrong results for some group layouts (reproduced: same lists as
    literals reduce correctly; filtering to one group changes another
    group's answer)."""
    _validate(steps, window_s)
    idx = (
        "CASE "
        + " ".join(
            f"WHEN {type_expr} = '{s}' THEN {i}"
            for i, s in enumerate(steps, start=1)
        )
        + " END"
    )
    types = ", ".join(f"'{s}'" for s in steps)
    win16 = None if window_s is None else int(round(window_s * 1_000_000)) * _B
    parts = [
        f"enc AS (SELECT {user_expr} AS user_id, "
        f"CAST(epoch_us({ts_expr}) * {_B} + ({idx}) AS BIGINT) AS enc "
        f"FROM {table} WHERE {type_expr} IN ({types}) "
        f"AND {ts_expr} IS NOT NULL)",
        f"u1 AS (SELECT user_id, min(CASE WHEN enc % {_B} = 1 THEN enc END) "
        "AS e1 FROM enc GROUP BY user_id)",
    ]
    for k in range(2, len(steps) + 1):
        win_pred = (
            ""
            if win16 is None
            else f" AND (enc - enc % {_B}) - (e1 - e1 % {_B}) <= {win16}"
        )
        carry = ", ".join(
            f"any_value(e{j}) AS e{j}" for j in range(1, k)
        )
        parts.append(
            f"u{k} AS (SELECT enc.user_id, {carry}, "
            f"min(CASE WHEN enc % {_B} = {k} AND enc > e{k - 1}{win_pred} "
            f"THEN enc END) AS e{k} "
            f"FROM enc JOIN u{k - 1} ON enc.user_id IS NOT DISTINCT FROM "
            f"u{k - 1}.user_id GROUP BY enc.user_id)"
        )
    n = len(steps)
    depth = (
        "CASE "
        + " ".join(
            f"WHEN e{k} IS NOT NULL THEN {k}" for k in range(n, 0, -1)
        )
        + " ELSE 0 END"
    )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT user_id, CAST({depth} AS BIGINT) AS depth FROM u{n}"
    )


def sql_funnel_conversion(
    steps: Sequence[str],
    window_s: float | None = None,
    table: str = "events",
    user_expr: str = "user_id",
    ts_expr: str = "ts",
    type_expr: str = "event_type",
) -> str:
    """DuckDB twin of :func:`funnel_conversion`."""
    depths = sql_funnel_depths(
        steps, window_s=window_s, table=table, user_expr=user_expr,
        ts_expr=ts_expr, type_expr=type_expr,
    )
    names = "[" + ", ".join(f"'{s}'" for s in steps) + "]"
    n = len(steps)
    return f"""
WITH d AS ({depths}),
     c AS (SELECT s.step,
                  CAST(coalesce(sum(CASE WHEN d.depth >= s.step THEN 1 END), 0)
                       AS BIGINT) AS users
           FROM (SELECT unnest(range(1, {n + 1})) AS step) s
           LEFT JOIN d ON TRUE
           GROUP BY s.step),
     c1 AS (SELECT users AS u1 FROM c WHERE step = 1)
SELECT CAST(c.step AS BIGINT) AS step,
       {names}[CAST(c.step AS INT)] AS step_type,
       c.users,
       CAST(CASE WHEN c1.u1 = 0 THEN 0
            ELSE c.users * {CONV_SCALE} // c1.u1 END AS BIGINT) AS conv_ppm
FROM c, c1
"""
