"""Exact triangle counting + local clustering coefficients over the
host link graph (Cohen, "Graph twiddling in a MapReduce world",
CiSE 2009; the degree-ordered orientation of Schank & Wagner 2005).

Triangles are THE density primitive of web-graph analysis: spam farms
and link exchanges are triangle-dense, organic link neighborhoods are
sparse; the local clustering coefficient c(v) = 2·tri(v) /
(deg(v)·(deg(v)−1)) (Watts & Strogatz 1998) normalizes that signal per
host.

Algorithm (exact, the published shape):
1. canonicalize the edge list: undirected, self-loops dropped, each
   edge kept once as (lo, hi);
2. orient every edge from the LOWER endpoint to the HIGHER under the
   total order (degree, node) — the degree-ordered orientation. Every
   node's out-degree in the oriented graph is bounded by O(sqrt(m))
   on any graph (arboricity bound), so the wedge join below cannot
   blow up on power-law hubs: a celebrity host with 10^7 in-links
   generates wedges only toward HIGHER-degree nodes, of which there
   are few;
3. wedges = oriented ⋈ oriented on the middle node; a wedge (u→v,
   v→w) closes iff (u→w) is also oriented — one more join. Each
   triangle is found exactly once (its vertices appear in increasing
   degree-order).

Scale shape (100 TB): three edge-keyed shuffles (canonicalize, wedge
join, closing join) + one vertex-keyed count — no corpus-scale
all-pairs anywhere; the orientation bound is the flood control.
Everything is exact int64 (counts, degrees, clustering in ppm by
floor division) — bit-identical cross-engine under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CLUST_SCALE = 1_000_000


def _canon_edges(
    edges: DataFrame, src_col: str = "src_host", dst_col: str = "dst_host"
) -> DataFrame:
    """Undirected simple edge set: (lo, hi) with lo < hi, distinct,
    self-loops and NULL endpoints dropped."""
    s, d = F.col(src_col), F.col(dst_col)
    return (
        edges.filter(s.isNotNull() & d.isNotNull() & (s != d))
        .select(F.least(s, d).alias("lo"), F.greatest(s, d).alias("hi"))
        .distinct()
    )


def triangle_stats(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """(host, deg, triangles, clustering_ppm) for every host in the
    canonical undirected graph — exact triangle counts via the
    degree-ordered orientation, clustering_ppm =
    2·tri·10^6 DIV (deg·(deg−1)) (0 for deg < 2)."""
    # e feeds degree counting + the orientation join; deg feeds the
    # orientation twice and the final report; ori feeds three join legs
    # — each persisted once (caches returned for release)
    e = _canon_edges(edges, src_col, dst_col).persist()
    deg = (
        e.select(F.col("lo").alias("host"))
        .unionByName(e.select(F.col("hi").alias("host")))
        .groupBy("host")
        .agg(F.count("*").alias("deg"))
        .persist()
    )
    # orient (lo, hi) by the (deg, host) total order
    dl = deg.select(F.col("host").alias("lo"), F.col("deg").alias("deg_lo"))
    dh = deg.select(F.col("host").alias("hi"), F.col("deg").alias("deg_hi"))
    ed = e.join(dl, "lo").join(dh, "hi")
    fwd = (F.col("deg_lo") < F.col("deg_hi")) | (
        (F.col("deg_lo") == F.col("deg_hi")) & (F.col("lo") < F.col("hi"))
    )
    ori = ed.select(
        F.when(fwd, F.col("lo")).otherwise(F.col("hi")).alias("a"),
        F.when(fwd, F.col("hi")).otherwise(F.col("lo")).alias("b"),
    ).persist()
    # wedges a→b, b→c close iff a→c is oriented too
    w1 = ori.select(F.col("a").alias("u"), F.col("b").alias("v"))
    w2 = ori.select(F.col("a").alias("v"), F.col("b").alias("w"))
    wedges = w1.join(w2, "v")
    closing = ori.select(F.col("a").alias("u"), F.col("b").alias("w"))
    tris = wedges.join(closing, ["u", "w"])
    per_node = (
        tris.select(F.explode(F.array("u", "v", "w")).alias("host"))
        .groupBy("host")
        .agg(F.count("*").alias("triangles"))
    )
    tri0 = F.coalesce(F.col("triangles"), F.lit(0))
    # integer DIV (not `/`, which is double division on longs)
    clust = F.when(
        F.col("deg") >= 2,
        F.expr(
            f"coalesce(triangles, 0) * 2 * {CLUST_SCALE}"
            " DIV (deg * (deg - 1))"
        ),
    ).otherwise(F.lit(0))
    return (
        deg.join(per_node, "host", "left")
        .select(
            "host",
            "deg",
            tri0.alias("triangles"),
            clust.cast("long").alias("clustering_ppm"),
        )
    )


def sql_triangle_stats(edges_sql: str) -> str:
    """DuckDB twin of :func:`triangle_stats`; ``edges_sql`` yields
    (src_host, dst_host)."""
    return f"""
WITH raw AS (SELECT src_host, dst_host FROM ({edges_sql})
             WHERE src_host IS NOT NULL AND dst_host IS NOT NULL
               AND src_host <> dst_host),
     e AS (SELECT DISTINCT least(src_host, dst_host) AS lo,
                  greatest(src_host, dst_host) AS hi FROM raw),
     deg AS (SELECT host, CAST(count(*) AS BIGINT) AS deg FROM (
               SELECT lo AS host FROM e UNION ALL SELECT hi FROM e)
             GROUP BY host),
     ori AS (SELECT CASE WHEN (dl.deg, e.lo) < (dh.deg, e.hi)
                         THEN e.lo ELSE e.hi END AS a,
                    CASE WHEN (dl.deg, e.lo) < (dh.deg, e.hi)
                         THEN e.hi ELSE e.lo END AS b
             FROM e JOIN deg dl ON e.lo = dl.host
                    JOIN deg dh ON e.hi = dh.host),
     tris AS (SELECT w1.a AS u, w1.b AS v, w2.b AS w
              FROM ori w1 JOIN ori w2 ON w1.b = w2.a
              JOIN ori c ON c.a = w1.a AND c.b = w2.b),
     per_node AS (SELECT host, CAST(count(*) AS BIGINT) AS triangles
                  FROM (SELECT u AS host FROM tris
                        UNION ALL SELECT v FROM tris
                        UNION ALL SELECT w FROM tris)
                  GROUP BY host)
SELECT deg.host, deg.deg,
       CAST(coalesce(per_node.triangles, 0) AS BIGINT) AS triangles,
       CAST(CASE WHEN deg.deg >= 2
            THEN coalesce(per_node.triangles, 0) * 2 * {CLUST_SCALE}
                 // (deg.deg * (deg.deg - 1))
            ELSE 0 END AS BIGINT) AS clustering_ppm
FROM deg LEFT JOIN per_node ON deg.host = per_node.host
"""


# ---------------------------------------------------------------------------
# HyperBall: neighbourhood-function estimation via mergeable HLL balls
# (Boldi & Vigna, WWW 2013 "In-core computation of geometric
# centralities with HyperBall"; the HyperANF lineage of Palmer 2002 ANF)
# ---------------------------------------------------------------------------
#
# |B_r(v)| — how many hosts are within r hops of v — is the basis of
# the web-graph distance/centrality toolbox (effective diameter,
# harmonic centrality, spid). Exact balls explode combinatorially;
# HyperBall's insight is that an HLL sketch of a ball is MERGEABLE:
#     sketch(B_{r+1}(v)) = merge(sketch(B_r(v)), sketch(B_r(u)) ∀ v→u)
# so each round is one edge join + one register-max aggregate — the
# register frame is (nodes × ≤ m) rows regardless of ball sizes.
#
# This engine's md5-register HLL makes the sketch itself bit-identical
# cross-engine, so the ORACLE can build the same registers from the
# exact 2-hop member set (two joins at oracle scale) while Spark builds
# them by merging radius-1 sketches along edges — different
# construction, identical registers, because a register set depends
# only on the member set and max is associative (the sketches module's
# merge contract, re-proven by this oracle every run).


def hyperball_r2(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    p_hex: int | None = None,
) -> DataFrame:
    """(host, n_registers, est_ball2): estimated |B_2(v)| over the
    DIRECTED edge set (v's ball follows outlinks; v itself counts).
    One edge join + two register-max aggregates; every frame is
    (node, register)-bounded."""
    from .sketches import HLL_GROUP_P_HEX, hll_estimate_by, hll_sketch_by

    p = HLL_GROUP_P_HEX if p_hex is None else p_hex
    e = (
        edges.select(
            F.col(src_col).alias("node"), F.col(dst_col).alias("member")
        )
        .filter(F.col("node").isNotNull() & F.col("member").isNotNull())
        .distinct()
    )
    nodes = (
        e.select("node")
        .unionByName(e.select(F.col("member").alias("node")))
        .distinct()
    )
    b1 = nodes.select("node", F.col("node").alias("member")).unionByName(e)
    s1 = hll_sketch_by(b1, "node", F.col("member"), p_hex=p).persist()
    # merge successor balls into the origin: (v→u) pulls s1(u) onto v
    pulled = e.join(
        s1.select(
            F.col("node").alias("member"), "register", "max_rank"
        ),
        "member",
    ).select("node", "register", "max_rank")
    s2 = (
        s1.unionByName(pulled)
        .groupBy("node", "register")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    return hll_estimate_by(s2, "node", p_hex=p).withColumnRenamed(
        "node", "host"
    ).withColumnRenamed("est_distinct", "est_ball2")


def sql_hyperball_r2(edges_sql: str, p_hex: int | None = None) -> str:
    """DuckDB twin of :func:`hyperball_r2` — the EXACT 2-hop member set
    (two joins, fine at oracle scale) pushed through the shared
    md5-register HLL, proving the Spark side's sketch-merge path lands
    on identical registers."""
    from .sketches import HLL_GROUP_P_HEX, sql_hll_distinct_by

    p = HLL_GROUP_P_HEX if p_hex is None else p_hex
    members = f"""(
WITH raw AS (SELECT src_host AS node, dst_host AS member FROM ({edges_sql})
             WHERE src_host IS NOT NULL AND dst_host IS NOT NULL),
     e AS (SELECT DISTINCT node, member FROM raw),
     nodes AS (SELECT node FROM e UNION SELECT member FROM e),
     b1 AS (SELECT node, node AS member FROM nodes
            UNION ALL SELECT node, member FROM e)
SELECT h1.node AS node, h2.member AS member
FROM b1 h1 JOIN b1 h2 ON h1.member = h2.node
)"""
    inner = sql_hll_distinct_by(
        "node", "member", members, p_hex=p, key_alias="host"
    )
    return (
        f"SELECT host, n_registers, est_distinct AS est_ball2 FROM ({inner})"
    )


# ---------------------------------------------------------------------------
# k-core decomposition (Seidman 1983; the Batagelj-Zaveršnik peeling)
# ---------------------------------------------------------------------------
#
# The k-core is the maximal subgraph in which every node has degree
# ≥ k — the density primitive complementary to triangles: link farms
# and tightly-knit spam neighbourhoods survive deep cores, organic
# host neighbourhoods peel away early (Fetterly/Gyöngyi-era web-spam
# features key on it).
#
# Algorithm: synchronous peeling — each round computes degrees over
# the CURRENT subgraph and drops every node with deg < k together with
# its incident edges; the fixpoint is exactly the k-core (the peeling
# order is irrelevant to the fixpoint, so the synchronous variant
# returns the same set as the sequential textbook algorithm). The
# round count to converge is the graph's "peeling depth", empirically
# O(log n) on web graphs; ``n_rounds`` bounds the unrolled recursion
# and the ``converged`` output column reports whether one more round
# would have been a no-op (round r+1 removed nothing), so a caller at
# 10^12 docs can re-dispatch the rare unconverged residual instead of
# trusting a silent cap.
#
# Exactness: degrees are int64 COUNTs and membership is semi-join
# logic — no floats anywhere, bit-identical across engines and
# partitionings by construction.
#
# Scale shape per round: one node-keyed count (map-side combinable)
# + two semi-joins keyed on the edge endpoints — no corpus-wide state
# in one task, no window. Each round's edge frame is
# localCheckpoint()ed: it feeds the degree count, both semi-joins and
# the next round, so the logical plan would otherwise double per round
# (the pagerank/hits rule).


def _deg(e: DataFrame) -> DataFrame:
    return (
        e.select(F.col("lo").alias("host"))
        .unionByName(e.select(F.col("hi").alias("host")))
        .groupBy("host")
        .agg(F.count("*").alias("deg"))
    )


def kcore(
    edges: DataFrame,
    k: int = 3,
    n_rounds: int = 4,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """(host, deg, converged): hosts surviving ``n_rounds`` of k-core
    peeling over the canonical undirected graph, with their degree in
    the surviving subgraph. ``converged`` is true iff round
    ``n_rounds`` removed nothing (the survivors ARE the k-core; all
    degrees then ≥ k). Empty graphs and k larger than any core return
    zero rows."""
    if k < 1 or n_rounds < 1:
        raise ValueError("k and n_rounds must be >= 1")
    e = _canon_edges(edges, src_col, dst_col).localCheckpoint()
    e_prev = e
    for _ in range(n_rounds):
        alive = _deg(e).filter(F.col("deg") >= k).select("host")
        e_prev = e
        e = (
            e.join(alive.withColumnRenamed("host", "lo"), "lo", "left_semi")
            .join(alive.withColumnRenamed("host", "hi"), "hi", "left_semi")
            .select("lo", "hi")
        ).localCheckpoint()
    # peeling removes edges monotonically, so equal edge counts on the
    # last round ⇔ the round was a no-op ⇔ fixpoint reached (2 scalar
    # actions total, not 2 per round)
    conv = e_prev.count() == e.count()
    return _deg(e).select(
        "host", "deg", F.lit(conv).alias("converged")
    )


def sql_kcore(edges_sql: str, k: int = 3, n_rounds: int = 4) -> str:
    """DuckDB twin of :func:`kcore`: the identical synchronous peeling
    unrolled one (degree, alive, edges) CTE triple per round — every
    per-round CTE MATERIALIZED (each is read 2-3 times; DuckDB's
    default inlining would otherwise replicate the chain exponentially
    past a few rounds — the hits rule). The converged flag compares the
    last two rounds' edge counts as scalar subqueries (peeling is
    monotone, so equality ⇔ the final round was a no-op)."""
    parts = [
        f"e0 AS MATERIALIZED (SELECT least(src_host, dst_host) AS lo, "
        f"greatest(src_host, dst_host) AS hi FROM ({edges_sql}) "
        "WHERE src_host IS NOT NULL AND dst_host IS NOT NULL "
        "AND src_host <> dst_host GROUP BY 1, 2)"
    ]
    for i in range(n_rounds):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT host, CAST(count(*) AS BIGINT) AS deg "
            f"FROM (SELECT lo AS host FROM e{i} "
            f"UNION ALL SELECT hi FROM e{i}) GROUP BY host)"
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT host FROM d{i} WHERE deg >= {k})"
        )
        parts.append(
            f"e{i + 1} AS MATERIALIZED (SELECT lo, hi FROM e{i} "
            f"WHERE lo IN (SELECT host FROM a{i}) "
            f"AND hi IN (SELECT host FROM a{i}))"
        )
    n = n_rounds
    parts.append(
        f"dfin AS MATERIALIZED (SELECT host, CAST(count(*) AS BIGINT) AS deg "
        f"FROM (SELECT lo AS host FROM e{n} UNION ALL SELECT hi FROM e{n}) "
        "GROUP BY host)"
    )
    parts.append(
        f"conv AS (SELECT (SELECT count(*) FROM e{n - 1}) = "
        f"(SELECT count(*) FROM e{n}) AS converged)"
    )
    return (
        "WITH "
        + ", ".join(parts)
        + " SELECT host, deg, (SELECT converged FROM conv) AS converged FROM dfin"
    )


# ---------------------------------------------------------------------------
# degree assortativity (Newman, PRL 2002)
# ---------------------------------------------------------------------------
#
# The Pearson correlation of degrees across edges — THE scalar mixing
# signal of web-graph structure: organic web graphs are disassortative
# (hubs link to leaves, r < 0) while link farms wire peers to peers
# (r → 1), so a per-partition / per-snapshot assortativity shift is a
# cheap spam-injection tripwire next to spam_mass and the k-core depth.
#
# For an undirected graph the correlation runs over ORDERED edge
# endpoint pairs; by symmetry Σx = Σy and Σx² = Σy², so with
#   M = 2m, S1 = Σx, S2 = Σx², P = Σxy
# Newman's r collapses to  r = (M·P − S1²) / (M·S2 − S1²).
#
# Exactness device (the bot_regularity discipline): every aggregate is
# an exact associative int64 SUM — each canonical edge contributes
# deg(lo)+deg(hi), 2·deg(lo)·deg(hi), deg(lo)²+deg(hi)² computed
# per-row — and the ONLY float arithmetic is the final ratio, evaluated
# from identical int64 inputs with the identical double expression in
# both engines (the numerator/denominator products are formed IN THE
# DOUBLE DOMAIN so a 10^12-edge graph cannot overflow int64; doubles
# lose the same low bits in both engines). Regular graphs (zero degree
# variance) return NULL r — the statistic is undefined there.
#
# Scale shape: one distinct-edge shuffle, one node-keyed degree count,
# two endpoint-keyed joins, one global 4-sum reduce — no window, no
# Python, nothing corpus-sized in one task.


def assortativity(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """One row: (n_pairs, sum_deg, sum_prod, sum_sq, assort) — ordered
    endpoint-pair count M = 2m and the exact int64 moment sums, plus
    Newman's degree assortativity as the one float ratio (NULL for
    degree-regular or empty graphs)."""
    # e feeds the degree count + the moment join; deg joins twice —
    # persisted once each (caches returned for release)
    e = _canon_edges(edges, src_col, dst_col).persist()
    deg = _deg(e).persist()
    ed = e.join(
        deg.select(F.col("host").alias("lo"), F.col("deg").alias("dl")), "lo"
    ).join(deg.select(F.col("host").alias("hi"), F.col("deg").alias("dh")), "hi")
    agg = ed.agg(
        (F.count("*") * 2).alias("n_pairs"),
        F.sum(F.col("dl") + F.col("dh")).alias("sum_deg"),
        F.sum(F.col("dl") * F.col("dh") * 2).alias("sum_prod"),
        F.sum(F.col("dl") * F.col("dl") + F.col("dh") * F.col("dh")).alias(
            "sum_sq"
        ),
    )
    num = (
        F.col("n_pairs").cast("double") * F.col("sum_prod").cast("double")
        - F.col("sum_deg").cast("double") * F.col("sum_deg").cast("double")
    )
    den = (
        F.col("n_pairs").cast("double") * F.col("sum_sq").cast("double")
        - F.col("sum_deg").cast("double") * F.col("sum_deg").cast("double")
    )
    return agg.select(
        F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
        F.coalesce("sum_deg", F.lit(0)).alias("sum_deg"),
        F.coalesce("sum_prod", F.lit(0)).alias("sum_prod"),
        F.coalesce("sum_sq", F.lit(0)).alias("sum_sq"),
        F.when(den > F.lit(0.0), num / den).alias("assort"),
    )


def sql_assortativity(edges_sql: str) -> str:
    """DuckDB twin of :func:`assortativity` — identical canonical edge
    set, per-row int64 moment terms, and the identical double ratio
    (NULLIF-guarded like the Spark when())."""
    return (
        "WITH e AS (SELECT least(src_host, dst_host) AS lo, "
        f"greatest(src_host, dst_host) AS hi FROM ({edges_sql}) "
        "WHERE src_host IS NOT NULL AND dst_host IS NOT NULL "
        "AND src_host <> dst_host GROUP BY 1, 2), "
        "deg AS (SELECT host, CAST(count(*) AS BIGINT) AS deg FROM ("
        "SELECT lo AS host FROM e UNION ALL SELECT hi FROM e) GROUP BY host), "
        "ed AS (SELECT dl.deg AS dl, dh.deg AS dh FROM e "
        "JOIN deg dl ON e.lo = dl.host JOIN deg dh ON e.hi = dh.host), "
        "agg AS (SELECT CAST(count(*) * 2 AS BIGINT) AS n_pairs, "
        "CAST(coalesce(sum(dl + dh), 0) AS BIGINT) AS sum_deg, "
        "CAST(coalesce(sum(dl * dh * 2), 0) AS BIGINT) AS sum_prod, "
        "CAST(coalesce(sum(dl * dl + dh * dh), 0) AS BIGINT) AS sum_sq FROM ed) "
        "SELECT n_pairs, sum_deg, sum_prod, sum_sq, "
        "CASE WHEN CAST(n_pairs AS DOUBLE) * CAST(sum_sq AS DOUBLE) - "
        "CAST(sum_deg AS DOUBLE) * CAST(sum_deg AS DOUBLE) > 0 THEN "
        "(CAST(n_pairs AS DOUBLE) * CAST(sum_prod AS DOUBLE) - "
        "CAST(sum_deg AS DOUBLE) * CAST(sum_deg AS DOUBLE)) / "
        "(CAST(n_pairs AS DOUBLE) * CAST(sum_sq AS DOUBLE) - "
        "CAST(sum_deg AS DOUBLE) * CAST(sum_deg AS DOUBLE)) END AS assort "
        "FROM agg"
    )


# ---------------------------------------------------------------------------
# harmonic centrality via iterated HyperBall (Boldi & Vigna, WWW 2013;
# "Axioms for centrality" IM 2014 — their argument that harmonic is THE
# centrality for web graphs: defined on disconnected graphs, no
# closeness pathology)
# ---------------------------------------------------------------------------
#
#   H(v) = Σ_{u≠v} 1/d(v,u) = Σ_{r≥1} (|B_r(v)| − |B_{r−1}(v)|) / r
#
# — estimated by running the hyperball_r2 sketch-merge round r_max
# times and differencing the per-radius HLL estimates (|B_0| = 1
# exactly). Truncation at r_max is HyperBall's own early-stop shape;
# contributions beyond r_max are bounded by |V|/(r_max+1) per the tail
# and the registered query documents the radius. Balls follow
# OUT-links (pass reversed edges for the in-harmonic used as a
# quality/centrality signal).
#
# Determinism: registers are exact int64 md5 ranks (bit-identical
# cross-engine), every estimate is the shared hll_estimate_by fold, and
# the harmonic sum is ONE fixed left-to-right double expression over
# those estimates, spelled identically in both engines. The oracle
# builds each radius' EXACT member set (r−1 self-joins at oracle scale)
# and pushes it through the same register pipeline — re-proving the
# merge associativity at every radius.
#
# Scale shape: per round one edge join + one register-max aggregate,
# frames bounded by nodes × m registers; each round's sketch is
# localCheckpoint()ed (read by its estimate AND the next round — the
# pagerank static-frame rule).


def harmonic_centrality(
    edges: DataFrame,
    r_max: int = 3,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    p_hex: int | None = None,
) -> DataFrame:
    """(host, est_b1..est_b{r_max}, harmonic): HyperBall-estimated
    out-harmonic centrality truncated at radius ``r_max`` — per-radius
    ball estimates and H = Σ (est_r − est_{r−1})/r with |B_0| = 1,
    rounded to 4 dp."""
    from .sketches import HLL_GROUP_P_HEX, hll_estimate_by, hll_sketch_by

    if r_max < 1:
        raise ValueError("r_max must be >= 1")
    p = HLL_GROUP_P_HEX if p_hex is None else p_hex
    e = (
        edges.select(F.col(src_col).alias("node"), F.col(dst_col).alias("member"))
        .filter(F.col("node").isNotNull() & F.col("member").isNotNull())
        .distinct()
    )
    nodes = (
        e.select("node")
        .unionByName(e.select(F.col("member").alias("node")))
        .distinct()
    )
    b1 = nodes.select("node", F.col("node").alias("member")).unionByName(e)
    s = hll_sketch_by(b1, "node", F.col("member"), p_hex=p).localCheckpoint()
    ests = [
        hll_estimate_by(s, "node", p_hex=p).select(
            "node", F.col("est_distinct").alias("est_b1")
        )
    ]
    for r in range(2, r_max + 1):
        pulled = e.join(
            s.select(F.col("node").alias("member"), "register", "max_rank"),
            "member",
        ).select("node", "register", "max_rank")
        s = (
            s.unionByName(pulled)
            .groupBy("node", "register")
            .agg(F.max("max_rank").alias("max_rank"))
        ).localCheckpoint()
        ests.append(
            hll_estimate_by(s, "node", p_hex=p).select(
                "node", F.col("est_distinct").alias(f"est_b{r}")
            )
        )
    out = ests[0]
    for nxt in ests[1:]:
        out = out.join(nxt, "node")
    terms = ["(est_b1 - 1.0D) / 1.0D"] + [
        f"(est_b{r} - est_b{r - 1}) / {r}.0D" for r in range(2, r_max + 1)
    ]
    return out.select(
        F.col("node").alias("host"),
        *[F.col(f"est_b{r}") for r in range(1, r_max + 1)],
        F.expr("round(" + " + ".join(terms) + ", 4)").alias("harmonic"),
    )


def sql_harmonic_centrality(
    edges_sql: str, r_max: int = 3, p_hex: int | None = None
) -> str:
    """DuckDB twin of :func:`harmonic_centrality` — EXACT member sets
    per radius (self-joins at oracle scale) through the shared
    md5-register HLL, then the identical left-to-right double sum."""
    from .sketches import HLL_GROUP_P_HEX, sql_hll_distinct_by

    p = HLL_GROUP_P_HEX if p_hex is None else p_hex
    base = (
        f"WITH raw AS (SELECT src_host AS node, dst_host AS member "
        f"FROM ({edges_sql}) WHERE src_host IS NOT NULL "
        "AND dst_host IS NOT NULL), "
        "e AS (SELECT DISTINCT node, member FROM raw), "
        "nodes AS (SELECT node FROM e UNION SELECT member FROM e), "
        "b1 AS (SELECT node, node AS member FROM nodes "
        "UNION ALL SELECT node, member FROM e)"
    )
    for r in range(2, r_max + 1):
        base += (
            f", b{r} AS (SELECT h.node AS node, t.member AS member "
            f"FROM b{r - 1} h JOIN b1 t ON h.member = t.node)"
        )
    parts = [base]
    joins = []
    for r in range(1, r_max + 1):
        inner = sql_hll_distinct_by(
            "node",
            "member",
            f"(SELECT node, member FROM b{r})",
            p_hex=p,
            key_alias="host",
        )
        parts.append(
            f"est{r} AS (SELECT host, est_distinct AS est_b{r} FROM ({inner}))"
        )
        if r > 1:
            joins.append(f"JOIN est{r} ON est1.host = est{r}.host")
    terms = ["(est_b1 - 1.0) / 1.0"] + [
        f"(est_b{r} - est_b{r - 1}) / {r}.0" for r in range(2, r_max + 1)
    ]
    cols = ", ".join(f"est_b{r}" for r in range(1, r_max + 1))
    return (
        ", ".join(parts)
        + f" SELECT est1.host AS host, {cols}, "
        + "round(" + " + ".join(terms) + ", 4) AS harmonic "
        + "FROM est1 " + " ".join(joins)
    )


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction (Adamic & Adar, Social Networks 25, 2003;
# the standard common-neighbor predictor of Liben-Nowell & Kleinberg
# CIKM 2003)
# ---------------------------------------------------------------------------
#
#   AA(a, b) = Σ_{z ∈ N(a) ∩ N(b)} 1 / ln(deg(z))
#
# — the classic "which hosts will link next" / "which hosts belong
# together" scorer: common neighbors weighted inversely by how
# promiscuous each shared neighbor is. The missing-link counterpart of
# the co-citation similarity family.
#
# Scale contract (the pair_overlap max_degree device): middles with
# deg > max_degree are EXCLUDED from wedge generation — a hub of
# degree d generates d² pairs while contributing only 1/ln(d) ≈ 0.2
# per pair, so the cap bounds the wedge fan-out at max_degree per
# middle while changing scores by at most n_hubs/ln(max_degree)
# (documented approximation; the cap is part of the operator contract
# and the twin applies the identical cap, so parity is exact).
#
# Exactness: weight_nano(z) = 10¹⁸ DIV iln9(deg z) with iln9 =
# round(ln·10⁹) (the shared fixed-point ln device; deg ≥ 2 so the
# divisor ≥ round(ln 2·10⁹) > 0); scores are exact int64 sums of those
# — bit-identical cross-engine. Predicted pairs already linked are
# removed by an anti-join; top-k orders by (score desc, node_a,
# node_b) — a total order, deterministic limit.


def adamic_adar(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    max_degree: int = 64,
    k: int = 20,
) -> DataFrame:
    """(node_a, node_b, n_common, aa_nano): top-``k`` unlinked pairs by
    Adamic-Adar score over the canonical undirected graph (middles
    capped at ``max_degree``)."""
    e = _canon_edges(edges, src_col, dst_col).persist()
    deg = _deg(e)
    nbrs = e.select(F.col("lo").alias("z"), F.col("hi").alias("n")).unionByName(
        e.select(F.col("hi").alias("z"), F.col("lo").alias("n"))
    )
    mid = deg.filter(
        (F.col("deg") >= 2) & (F.col("deg") <= max_degree)
    ).select(
        F.col("host").alias("z"),
        F.expr(
            "CAST(1000000000000000000L DIV "
            "CAST(round(ln(CAST(deg AS DOUBLE)) * 1e9) AS BIGINT) AS BIGINT)"
        ).alias("w_nano"),
    )
    # both legs of the wedge self-join read this frame — persist once
    # (the triangle_stats ori rule; cache returned for release)
    wn = nbrs.join(mid, "z").persist()
    pairs = (
        wn.alias("x")
        .join(wn.alias("y"), ["z", "w_nano"])
        .filter(F.expr("x.n < y.n"))
        .select(
            F.expr("x.n").alias("node_a"),
            F.expr("y.n").alias("node_b"),
            "w_nano",
        )
    )
    scored = pairs.groupBy("node_a", "node_b").agg(
        F.count("*").alias("n_common"),
        F.sum("w_nano").alias("aa_nano"),
    )
    unlinked = scored.join(
        e.select(F.col("lo").alias("node_a"), F.col("hi").alias("node_b")),
        ["node_a", "node_b"],
        "left_anti",
    )
    return unlinked.orderBy(
        F.col("aa_nano").desc(), "node_a", "node_b"
    ).limit(k)


def sql_adamic_adar(
    edges_sql: str, max_degree: int = 64, k: int = 20
) -> str:
    """DuckDB twin of :func:`adamic_adar` — identical canonical graph,
    degree cap, fixed-point weight, anti-join and total-order top-k."""
    return (
        f"WITH raw AS (SELECT src_host, dst_host FROM ({edges_sql}) "
        "WHERE src_host IS NOT NULL AND dst_host IS NOT NULL "
        "AND src_host <> dst_host), "
        "e AS (SELECT DISTINCT least(src_host, dst_host) AS lo, "
        "greatest(src_host, dst_host) AS hi FROM raw), "
        "deg AS (SELECT host, CAST(count(*) AS BIGINT) AS deg FROM ("
        "SELECT lo AS host FROM e UNION ALL SELECT hi FROM e) GROUP BY host), "
        "nbrs AS (SELECT lo AS z, hi AS n FROM e "
        "UNION ALL SELECT hi, lo FROM e), "
        "mid AS (SELECT host AS z, CAST(1000000000000000000 // "
        "CAST(round(ln(CAST(deg AS DOUBLE)) * 1e9) AS BIGINT) AS BIGINT) "
        f"AS w_nano FROM deg WHERE deg >= 2 AND deg <= {max_degree}), "
        "wn AS (SELECT nbrs.z, nbrs.n, mid.w_nano FROM nbrs "
        "JOIN mid ON nbrs.z = mid.z), "
        "pairs AS (SELECT x.n AS node_a, y.n AS node_b, x.w_nano FROM wn x "
        "JOIN wn y ON x.z = y.z AND x.w_nano = y.w_nano AND x.n < y.n), "
        "scored AS (SELECT node_a, node_b, CAST(count(*) AS BIGINT) "
        "AS n_common, CAST(sum(w_nano) AS BIGINT) AS aa_nano "
        "FROM pairs GROUP BY node_a, node_b), "
        "unlinked AS (SELECT s.* FROM scored s LEFT JOIN e "
        "ON s.node_a = e.lo AND s.node_b = e.hi WHERE e.lo IS NULL) "
        "SELECT node_a, node_b, n_common, aa_nano FROM unlinked "
        f"ORDER BY aa_nano DESC, node_a, node_b LIMIT {k}"
    )


# ---------------------------------------------------------------------------
# Broder bow-tie decomposition (Broder et al., WWW 2000 "Graph
# structure in the web")
# ---------------------------------------------------------------------------
#
# THE iconic macro-analysis of a crawl's directed host graph: a giant
# strongly-connected CORE, the IN set that reaches it, the OUT set it
# reaches, TENDRILS hanging off the weak component, and DISCONNECTED
# islands. The paper computes it exactly this way — forward and
# backward reachability from a node of the giant SCC — and the pivot
# here is the deterministic analogue of their random starts: the
# max-degree host (ties to the smallest name), which lies in the giant
# SCC for any crawl-shaped graph (documented assumption; pass
# ``pivot`` explicitly to override).
#
#   CORE = F ∩ B;  IN = B − CORE;  OUT = F − CORE;
#   TENDRIL = weakly-reachable − (F ∪ B);  DISCONNECTED = the rest
#
# Reachability runs as frontier-free semi-join rounds to the TRUE
# fixpoint (each round: members ∪ successors-of-members, count-stable
# check, localCheckpoint — the connected_components loop shape), so
# the result is exactly what the oracle's recursive CTE computes; a
# ``max_rounds`` cap (default 40 ≫ any web-graph effective diameter)
# raises rather than silently under-reaching.
#
# Scale shape per round: one edge semi-join + distinct union, frames
# node-bounded. Three loops (fwd, bwd, weak). All-set logic — no
# floats anywhere.


def bowtie(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    pivot: str | None = None,
    max_rounds: int = 40,
) -> DataFrame:
    """(host, cls): every host of the directed graph labelled core /
    in_ / out / tendril / disconnected relative to the pivot's SCC.
    Raises RuntimeError if a reachability loop fails to converge in
    ``max_rounds`` (raise the cap for pathological diameters)."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
        .persist()
    )
    if pivot is None:
        deg = (
            e.select(F.col("src").alias("host"))
            .unionByName(e.select(F.col("dst").alias("host")))
            .groupBy("host")
            .agg(F.count("*").alias("deg"))
        )
        row = deg.orderBy(F.col("deg").desc(), F.col("host")).limit(1).collect()
        if not row:
            return nodes.select("host", F.lit("disconnected").alias("cls"))
        pivot = row[0]["host"]

    spark = e.sparkSession

    def _reach(step_edges):
        cur = spark.createDataFrame([(pivot,)], "host string").localCheckpoint()
        n = cur.count()
        for _ in range(max_rounds):
            nxt = (
                cur.unionByName(
                    step_edges.join(
                        cur.withColumnRenamed("host", "src"), "src"
                    ).select(F.col("dst").alias("host"))
                )
                .distinct()
                .localCheckpoint()
            )
            m = nxt.count()
            if m == n:
                return nxt
            cur, n = nxt, m
        raise RuntimeError(f"reachability did not converge in {max_rounds} rounds")

    fwd = _reach(e)
    bwd = _reach(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    weak = _reach(
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    )
    lab = (
        nodes.join(fwd.withColumn("f", F.lit(1)), "host", "left")
        .join(bwd.withColumn("b", F.lit(1)), "host", "left")
        .join(weak.withColumn("w", F.lit(1)), "host", "left")
    )
    return lab.select(
        "host",
        F.expr(
            "CASE WHEN f = 1 AND b = 1 THEN 'core' "
            "WHEN b = 1 THEN 'in_' "
            "WHEN f = 1 THEN 'out' "
            "WHEN w = 1 THEN 'tendril' "
            "ELSE 'disconnected' END"
        ).alias("cls"),
    )


def sql_bowtie(edges_sql: str, pivot_sql: str | None = None) -> str:
    """DuckDB twin of :func:`bowtie`: recursive-CTE reachability to the
    exact fixpoint from the identical deterministic pivot."""
    pivot = pivot_sql or (
        "SELECT host FROM deg ORDER BY deg DESC, host LIMIT 1"
    )
    return (
        "WITH RECURSIVE "
        f"raw AS (SELECT src_host AS src, dst_host AS dst FROM ({edges_sql}) "
        "WHERE src_host IS NOT NULL AND dst_host IS NOT NULL "
        "AND src_host <> dst_host), "
        "e AS (SELECT DISTINCT src, dst FROM raw), "
        # under WITH RECURSIVE DuckDB skips the UNION dedup for CTEs that
        # merely LOOK recursive-shaped — spell DISTINCT explicitly
        "nodes AS (SELECT DISTINCT host FROM (SELECT src AS host FROM e "
        "UNION ALL SELECT dst FROM e)), "
        "deg AS (SELECT host, CAST(count(*) AS BIGINT) AS deg FROM ("
        "SELECT src AS host FROM e UNION ALL SELECT dst FROM e) "
        "GROUP BY host), "
        f"pv AS ({pivot}), "
        "fwd(n) AS (SELECT host FROM pv "
        "UNION SELECT e.dst FROM e JOIN fwd ON e.src = fwd.n), "
        "bwd(n) AS (SELECT host FROM pv "
        "UNION SELECT e.src FROM e JOIN bwd ON e.dst = bwd.n), "
        "ue AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM e "
        "UNION ALL SELECT dst, src FROM e)), "
        "wk(n) AS (SELECT host FROM pv "
        "UNION SELECT ue.dst FROM ue JOIN wk ON ue.src = wk.n), "
        "df AS (SELECT DISTINCT n FROM fwd), "
        "db AS (SELECT DISTINCT n FROM bwd), "
        "dw AS (SELECT DISTINCT n FROM wk) "
        "SELECT nodes.host, CASE "
        "WHEN df.n IS NOT NULL AND db.n IS NOT NULL THEN 'core' "
        "WHEN db.n IS NOT NULL THEN 'in_' "
        "WHEN df.n IS NOT NULL THEN 'out' "
        "WHEN dw.n IS NOT NULL THEN 'tendril' "
        "ELSE 'disconnected' END AS cls "
        "FROM nodes LEFT JOIN df ON nodes.host = df.n "
        "LEFT JOIN db ON nodes.host = db.n "
        "LEFT JOIN dw ON nodes.host = dw.n"
    )


# ---------------------------------------------------------------------------
# Discrete power-law fit of the in-degree tail (Clauset, Shalizi &
# Newman 2009, "Power-law distributions in empirical data")
# ---------------------------------------------------------------------------
#
# The degree-distribution exponent every web-graph paper reports: for
# the tail k >= k_min, the CSN (approximate discrete) MLE is
#     alpha = 1 + n / sum_i ln(k_i / (k_min - 1/2))
# and every ln argument rationalizes to INTEGERS:
#     ln(k / (k_min - 1/2)) = ln(2k) - ln(2*k_min - 1)
# so the whole denominator is an exact int64 sum of I() differences
# over the DEGREE HISTOGRAM (distinct-degree-sized — the good_turing
# N_r shape), and the single final division is one correctly-rounded
# IEEE op. A natural web graph reads alpha ~ 2.1; a rewiring bot farm
# or a template explosion moves it — the one-number crawl-shape audit
# beside host_assort/host_triangles. One row per requested k_min so
# the caller sees the fit stabilize (the CSN k_min-sweep read).
#
# Scale shape: degree table (node-sized groupBy) → degree histogram →
# per-k_min combinable sums. No window, no Python.


def _directed_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Directed simple edge set: distinct (src, dst), self-loops and
    NULL endpoints dropped — the pagerank hygiene (NOT the undirected
    _canon_edges fold, which would halve reciprocity by construction)."""
    s, d = F.col(src), F.col(dst)
    return (
        edges.filter(s.isNotNull() & d.isNotNull() & (s != d))
        .select(s.alias("src"), d.alias("dst"))
        .distinct()
    )


def powerlaw_fit(
    edges: DataFrame,
    k_mins=(1, 2, 5),
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(k_min, n_tail, alpha_6): CSN in-degree tail MLE per requested
    ``k_min``. Degenerate tails (all degrees == the k_min boundary →
    zero denominator, or an empty tail) emit NULL alpha_6."""
    e = _directed_edges(edges, src, dst)
    deg = e.groupBy(F.col("dst").alias("n")).agg(F.count("*").alias("k"))
    hist = deg.groupBy("k").agg(F.count("*").alias("c"))

    def iln(c):
        return F.round(F.log(c.cast("double")) * F.lit(1e9)).cast("long")

    rows = None
    for km in k_mins:
        part = (
            hist.filter(F.col("k") >= km)
            .groupBy()
            .agg(
                F.coalesce(F.sum("c"), F.lit(0)).alias("n_tail"),
                F.coalesce(
                    F.sum(
                        F.col("c")
                        * (
                            iln(F.lit(2) * F.col("k"))
                            # driver-precomputed literal shared with the
                            # twin — engine ln() of the constant could
                            # differ by an ulp and flip the rounding
                            - F.lit(
                                int(
                                    round(
                                        __import__("math").log(2 * km - 1)
                                        * 1e9
                                    )
                                )
                            )
                        )
                    ),
                    F.lit(0),
                ).alias("s"),
            )
            .select(
                F.lit(km).cast("long").alias("k_min"),
                "n_tail",
                F.when(
                    (F.col("n_tail") > 0) & (F.col("s") > 0),
                    F.round(
                        F.lit(1.0)
                        + F.col("n_tail").cast("double")
                        * F.lit(1e9)
                        / F.col("s").cast("double"),
                        6,
                    )
                    + F.lit(0.0),
                ).alias("alpha_6"),
            )
        )
        rows = part if rows is None else rows.unionAll(part)
    return rows


def sql_powerlaw_fit(edges_sql: str, k_mins=(1, 2, 5)) -> str:
    """DuckDB twin of :func:`powerlaw_fit` — identical hygiene,
    histogram, I() terms and final rounding."""
    iln = "CAST(round(ln(CAST({x} AS DOUBLE)) * 1e9) AS BIGINT)"
    parts = []
    for km in k_mins:
        parts.append(
            f"SELECT CAST({km} AS BIGINT) AS k_min, "
            "CAST(coalesce(sum(c), 0) AS BIGINT) AS n_tail, "
            "CASE WHEN coalesce(sum(c), 0) > 0 AND coalesce(sum(c * ("
            + iln.format(x="2 * k")
            + f" - {int(round(__import__('math').log(2 * km - 1) * 1e9))}"
            ")), 0) > 0 THEN round(1.0 + CAST(sum(c) AS DOUBLE) * 1e9 "
            "/ CAST(sum(c * (" + iln.format(x="2 * k")
            + f" - {int(round(__import__('math').log(2 * km - 1) * 1e9))}"
            ")) AS DOUBLE), 6) + 0.0 END AS alpha_6 "
            f"FROM hist WHERE k >= {km}"
        )
    return (
        "WITH e AS (SELECT DISTINCT src, dst FROM (" + edges_sql + ") "
        "WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst), "
        "deg AS (SELECT dst AS n, CAST(count(*) AS BIGINT) AS k FROM e "
        "GROUP BY dst), "
        "hist AS (SELECT k, CAST(count(*) AS BIGINT) AS c FROM deg "
        "GROUP BY k) "
        + " UNION ALL ".join(parts)
    )


# ---------------------------------------------------------------------------
# One-row directed-graph summary card (reciprocity after Garlaschelli
# & Loffredo 2004; density; degree extremes)
# ---------------------------------------------------------------------------
#
# The corpus-card row for the host graph: size, density, how mutual
# the linking is (link exchanges push reciprocity up; pure broadcast
# graphs sit at 0), and the hub extremes. All integer: reciprocity =
# reciprocated-edge count * 1e6 div m (an edge (u,v) is reciprocated
# when (v,u) exists — counted by a semi-join of the edge set against
# its transpose, the nepotism device); density_ppb uses the
# overflow-free split division (exact to ~3e9 nodes). One edge-keyed
# semi-join + node-sized degree aggregates.


def graph_summary(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """One row (n_nodes, n_edges, n_recip, recip_ppm, density_ppb,
    max_in_deg, max_out_deg, mean_out_micro)."""
    e = _directed_edges(edges, src, dst).persist()
    nodes = (
        e.select(F.col("src").alias("n"))
        .union(e.select(F.col("dst").alias("n")))
        .distinct()
    )
    t = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(t, ["src", "dst"], "left_semi")
    ind = e.groupBy("dst").agg(F.count("*").alias("k"))
    outd = e.groupBy("src").agg(F.count("*").alias("k"))
    agg = (
        e.groupBy()
        .agg(F.count("*").alias("m"))
        .crossJoin(F.broadcast(nodes.groupBy().agg(F.count("*").alias("n"))))
        .crossJoin(
            F.broadcast(recip.groupBy().agg(F.count("*").alias("n_recip")))
        )
        .crossJoin(
            F.broadcast(
                ind.groupBy().agg(
                    F.coalesce(F.max("k"), F.lit(0)).alias("max_in")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                outd.groupBy().agg(
                    F.coalesce(F.max("k"), F.lit(0)).alias("max_out")
                )
            )
        )
    )
    return agg.select(
        F.col("n").alias("n_nodes"),
        F.col("m").alias("n_edges"),
        "n_recip",
        F.when(F.col("m") > 0, F.expr("n_recip * 1000000L div m")).alias(
            "recip_ppm"
        ),
        F.when(
            F.col("n") > 1,
            F.expr(
                "(m div (n * (n - 1))) * 1000000000L "
                "+ ((m % (n * (n - 1))) * 1000000000L) div (n * (n - 1))"
            ),
        ).alias("density_ppb"),
        F.col("max_in").alias("max_in_deg"),
        F.col("max_out").alias("max_out_deg"),
        F.when(F.col("n") > 0, F.expr("m * 1000000L div n")).alias(
            "mean_out_micro"
        ),
    )


def sql_graph_summary(edges_sql: str) -> str:
    """DuckDB twin of :func:`graph_summary` — identical hygiene,
    semi-join reciprocity and split-division density."""
    return (
        "WITH e AS (SELECT DISTINCT src, dst FROM (" + edges_sql + ") "
        "WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst), "
        "nodes AS (SELECT src AS n FROM e UNION SELECT dst FROM e), "
        "rc AS (SELECT count(*) AS n_recip FROM e "
        "WHERE EXISTS (SELECT 1 FROM e t WHERE t.src = e.dst "
        "AND t.dst = e.src)), "
        "agg AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n, "
        "(SELECT CAST(count(*) AS BIGINT) FROM e) AS m, "
        "(SELECT CAST(n_recip AS BIGINT) FROM rc) AS n_recip, "
        "(SELECT CAST(coalesce(max(k), 0) AS BIGINT) FROM "
        "(SELECT count(*) AS k FROM e GROUP BY dst)) AS max_in, "
        "(SELECT CAST(coalesce(max(k), 0) AS BIGINT) FROM "
        "(SELECT count(*) AS k FROM e GROUP BY src)) AS max_out) "
        "SELECT n AS n_nodes, m AS n_edges, n_recip, "
        "CASE WHEN m > 0 THEN CAST(n_recip * 1000000 // m AS BIGINT) END "
        "AS recip_ppm, "
        "CASE WHEN n > 1 THEN CAST((m // (n * (n - 1))) * 1000000000 "
        "+ ((m % (n * (n - 1))) * 1000000000) // (n * (n - 1)) AS BIGINT) "
        "END AS density_ppb, "
        "max_in AS max_in_deg, max_out AS max_out_deg, "
        "CASE WHEN n > 0 THEN CAST(m * 1000000 // n AS BIGINT) END "
        "AS mean_out_micro FROM agg"
    )
