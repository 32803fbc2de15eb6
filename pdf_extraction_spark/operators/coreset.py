"""Facility-location greedy coreset selection (Lin & Bilmes, ACL 2011
"A class of submodular functions for document summarization"; Wei,
Iyer & Bilmes, ICML 2015 "Submodularity in data subset selection and
active learning").

Pick k representatives S maximizing the facility-location coverage
    F(S) = Σ_{v ∈ V} max_{s ∈ S} sim(v, s)
— the standard submodular objective for training-data subset
selection: every corpus vector should have SOME nearby representative.
Greedy is the published algorithm (1−1/e guarantee, Nemhauser 1978);
each round picks the candidate with the largest marginal coverage
gain Σ_v max(sim(v,c) − cur(v), 0).

Relational shape (the mmr_topk discipline, lifted from one bounded
pool to corpus-side coverage):
- candidates = a bounded deterministic pool (top-``pool`` by 6-dp
  L2 norm, id tiebreak) — candidate lists are configuration-sized;
- each round broadcasts the remaining candidates as ONE aggregated
  row (collect_list over ≤ pool rows) against V — a narrow map, NOT a
  cartesian: per corpus vector the gains against all candidates are
  computed inside one ``transform`` + ``posexplode`` bounded by pool;
- the coverage state cur(v) is ONE int64 column on V, updated per
  round via a broadcast of the single picked vector and
  localCheckpointed so plan size stays linear in k;
- greedy is inherently k passes over V — the published accelerations
  (lazy greedy, stochastic-greedy) trade the guarantee for fewer
  evaluations; at 10^12 vectors run this per IVF cell (the semdedup
  partitioning) so V is cell-sized.

Cross-engine determinism: similarities quantize ONCE to int64 micro
units — micro = floor(round(cos, 6)·10^6 + 0.5), where round(cos, 6)
is the engine-shared fold device — and every gain/coverage after that
is an exact associative integer sum, so the argmax ordering and the
coverage audit column are bit-identical under any partitioning or
cluster size. (A float gain sum would be partition-order-dependent —
the reason the state is integer, not double.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .topk import cosine_col, sql_fold_cos

SIM_SCALE = 1_000_000


def _micro(c: Column) -> Column:
    """int64 micro units of a similarity: floor(round(c,6)·1e6 + 0.5).
    round(·,6) is the shared cross-engine device; the +0.5/floor pins
    the half-tie in the integer domain."""
    return F.floor(F.round(c, 6) * SIM_SCALE + F.lit(0.5)).cast("long")


def facility_location_select(
    embeddings: DataFrame,
    k: int = 4,
    pool: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(round, vec_id, gain_micro, coverage_micro): the k greedy
    facility-location picks over the norm-top-``pool`` candidate set,
    with each pick's marginal gain and the total corpus coverage
    Σ_v cur(v) after the pick (both exact int64)."""
    if k < 1 or pool < k:
        raise ValueError("need pool >= k >= 1")
    from .topk import finite_vec_pred

    # NaN/±Inf vectors leave the universe like NULLs — a NaN norm would
    # poison the candidate ordering and the micro-quantized gains cast
    # NaN→int64, which DuckDB rejects outright (finite_vec_pred doc)
    vecs = embeddings.filter(finite_vec_pred(F.col(vec_col))).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    )
    norm = F.round(
        F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x)), 6
    )
    cands = (
        vecs.select("vid", "v", norm.alias("nrm"))
        .orderBy(F.desc("nrm"), "vid")
        .limit(pool)
        .select(F.col("vid").alias("cid"), F.col("v").alias("cv"))
        .localCheckpoint()
    )
    state = vecs.select("vid", "v", F.lit(0).cast("long").alias("cur"))
    state = state.localCheckpoint()

    picked: list[DataFrame] = []
    out = None
    for rnd in range(1, k + 1):
        remaining = cands
        for p in picked:
            remaining = remaining.join(
                p.select(F.col("vid").alias("cid")), "cid", "left_anti"
            )
        cand_row = remaining.agg(
            F.collect_list(
                F.struct(F.col("cid"), F.col("cv"))
            ).alias("cs")
        )
        gains = (
            state.crossJoin(F.broadcast(cand_row))
            .select(
                F.posexplode(
                    F.transform(
                        F.col("cs"),
                        lambda c: F.struct(
                            c["cid"].alias("cid"),
                            F.greatest(
                                _micro(cosine_col(F.col("v"), c["cv"]))
                                - F.col("cur"),
                                F.lit(0),
                            ).alias("g"),
                        ),
                    )
                ).alias("i", "e")
            )
            .groupBy(F.col("e.cid").alias("cid"))
            .agg(F.sum("e.g").alias("gain_micro"))
        )
        pick = (
            gains.join(cands, "cid")
            .orderBy(F.desc("gain_micro"), "cid")
            .limit(1)
            .localCheckpoint()
        )
        picked.append(pick.select(F.col("cid").alias("vid")))
        pick_row = pick.select(
            F.col("cid").alias("p_id"), F.col("cv").alias("p_v")
        )
        state = (
            state.crossJoin(F.broadcast(pick_row))
            .select(
                "vid",
                "v",
                F.greatest(
                    F.col("cur"), _micro(cosine_col(F.col("v"), F.col("p_v")))
                ).alias("cur"),
            )
            .localCheckpoint()
        )
        coverage = state.agg(F.sum("cur").alias("coverage_micro"))
        row = (
            pick.crossJoin(F.broadcast(coverage))
            .select(
                F.lit(rnd).cast("long").alias("round"),
                F.col("cid").alias("vec_id"),
                "gain_micro",
                "coverage_micro",
            )
            .localCheckpoint()
        )
        out = row if out is None else out.unionByName(row)
    return out


def sql_facility_location(
    k: int = 4,
    pool: int = 16,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin of :func:`facility_location_select` — the identical
    greedy recursion unrolled, micro-quantized sims, exact integer
    gain/coverage sums."""
    if k < 1 or pool < k:
        raise ValueError("need pool >= k >= 1")
    nrm = (
        "round(sqrt(list_reduce(list_prepend(0.0, "
        "list_transform(v, x -> x * x)), (a, b) -> a + b)), 6)"
    )

    def micro(cos_expr: str) -> str:
        return f"CAST(floor({cos_expr} * {SIM_SCALE} + 0.5) AS BIGINT)"

    sim_vc = micro(sql_fold_cos("v.v", "c.cv", 6))
    sim_vp = micro(sql_fold_cos("v.v", "p.cv", 6))
    from .topk import sql_finite_vec

    parts = [
        f"vecs AS (SELECT {id_col} AS vid, {vec_col} AS v FROM {table} "
        f"WHERE {sql_finite_vec(vec_col)})",
        f"cands AS (SELECT vid AS cid, v AS cv FROM (SELECT vid, v, {nrm} AS nrm "
        f"FROM vecs ORDER BY nrm DESC, vid LIMIT {pool}))",
        "cur0 AS (SELECT vid, v, CAST(0 AS BIGINT) AS cur FROM vecs)",
    ]
    sel_prev = None
    for r in range(1, k + 1):
        rem = (
            "cands"
            if sel_prev is None
            else f"(SELECT * FROM cands WHERE cid NOT IN (SELECT vid FROM {sel_prev}))"
        )
        parts.append(
            f"g{r} AS (SELECT c.cid, CAST(sum(greatest({sim_vc} - v.cur, 0)) "
            f"AS BIGINT) AS gain_micro "
            f"FROM {rem} c, cur{r - 1} v GROUP BY c.cid)"
        )
        parts.append(
            f"p{r} AS (SELECT g{r}.cid AS cid, cands.cv, gain_micro FROM g{r} "
            f"JOIN cands ON g{r}.cid = cands.cid "
            f"ORDER BY gain_micro DESC, g{r}.cid LIMIT 1)"
        )
        parts.append(
            f"cur{r} AS (SELECT v.vid, v.v, greatest(v.cur, {sim_vp}) AS cur "
            f"FROM cur{r - 1} v, p{r} p)"
        )
        parts.append(
            f"sel{r} AS ("
            + (
                f"SELECT cid AS vid FROM p{r}"
                if sel_prev is None
                else f"SELECT vid FROM {sel_prev} UNION ALL SELECT cid FROM p{r}"
            )
            + ")"
        )
        sel_prev = f"sel{r}"
    selects = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, p{r}.cid AS vec_id, "
        f"p{r}.gain_micro, (SELECT CAST(sum(cur) AS BIGINT) FROM cur{r}) "
        f"AS coverage_micro FROM p{r}"
        for r in range(1, k + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + selects
