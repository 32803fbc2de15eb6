"""Connected components over near-dup pair graphs — iterative min-label
propagation (the missing piece between pairwise dedup candidates and
dedup *clusters*: pairs (a,b),(b,c) must collapse to one cluster {a,b,c}
with a single representative).

Algorithm: large-/small-star-style min-id propagation. Each node starts
labeled with itself; every iteration joins labels across edges and takes
the min; converged when no label changes. Iterations are O(diameter) —
near-dup graphs are shallow (dup clusters are cliques or near-cliques),
so 3–5 rounds close almost everything; the loop is capped and each round
is one shuffle on node id.

Scale notes: edges are the (small) candidate-pair output of LSH, not the
corpus; labels frame is checkpointed every round to cut lineage growth
(iterative plans otherwise replan the whole history each action).
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 40,
) -> DataFrame:
    """(id_a, id_b) edge list → (node, component) with component =
    min node id of the cluster."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    edges.persist()

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )

    for _ in range(max_iterations):
        # candidate label for each node: min over neighbors' labels
        neighbor_labels = (
            edges.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("component").alias("neighbor_min"))
            .withColumnRenamed("src", "node")
        )
        # the previous label rides along as `old` so convergence is a
        # plain aggregate over the checkpointed update — NOT a second
        # labels ⋈ new_labels shuffle join per round
        stepped = (
            labels.join(neighbor_labels, "node", "left")
            .select(
                "node",
                F.col("component").alias("old"),
                F.least(
                    F.col("component"), F.coalesce("neighbor_min", F.col("component"))
                ).alias("component"),
            )
        )
        # pointer jumping: label ← label(label) — collapses chains in
        # O(log diameter) rounds instead of O(diameter)
        parent = stepped.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_comp")
        )
        new_labels = (
            stepped.join(parent, stepped["component"] == parent["p_node"], "left")
            .select(
                "node",
                "old",
                F.least(
                    F.col("component"), F.coalesce("p_comp", F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.agg(
            F.coalesce(
                F.sum((F.col("old") != F.col("component")).cast("long")), F.lit(0)
            )
        ).first()[0]
        labels = new_labels.drop("old")
        if changed == 0:
            break

    edges.unpersist()
    return labels


def sql_dedup_clusters(pairs_select: str) -> str:
    """DuckDB oracle twin of ``dedup_clusters``: connected components
    via a recursive reachability CTE over the same (id_a, id_b) pair
    list (``pairs_select``: a SELECT yielding id_a, id_b), component =
    min reachable node. UNION (not UNION ALL) dedups rows, so the
    recursion terminates on any graph."""
    return (
        f"WITH RECURSIVE pairs AS ({pairs_select}), "
        "edges AS (SELECT id_a AS s, id_b AS d FROM pairs "
        "UNION SELECT id_b, id_a FROM pairs), "
        "reach(n, m) AS (SELECT s, s FROM edges "
        "UNION SELECT e.s, r.m FROM edges e JOIN reach r ON e.d = r.n) "
        "SELECT component, count(*) AS n_members, min(node) AS keep_id FROM ("
        "SELECT n AS node, min(m) AS component FROM reach GROUP BY n) "
        "GROUP BY component"
    )


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Near-dup clusters: (component, n_members, keep_id) — keep_id is
    the min member (the representative every other member collapses to)."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.groupBy("component").agg(
        F.count("*").alias("n_members"),
        F.min("node").alias("keep_id"),
    )


# ---------------------------------------------------------------------------
# fixed-point PageRank (Page et al. 1999) over a host/link graph
# ---------------------------------------------------------------------------
#
# The classic web-scale host-quality signal crawl curation pipelines key
# on (Common-Crawl-style harmonic/centrality host ranks). Fixed
# iteration count, damping + uniform dangling-mass redistribution.
#
# All arithmetic is FIXED-POINT INTEGER: ranks live as int64 scaled by
# ``scale`` (default 10^12), every step is integer multiply / floor
# divide / sum. Integer sums are exact and associative, so a plain
# groupBy().sum() is bit-identical across engines, partitionings and
# cluster sizes — no ordered-fold machinery, no per-group collect_list
# buffer, even for hosts with millions of in-links. Even the final
# 6-decimal rounding happens in the integer domain (half-up on the
# fixed-point quantum), so no engine's float-rounding rule ever runs.
#
# Scale shape per iteration: ranks ⋈ edges on src (shuffle keyed on
# src), one dst-keyed sum (map-side combinable), plus two scalar
# aggregates (node count once, dangling mass per round) broadcast back
# as 1-row frames. Each round's ranks frame is localCheckpoint()ed —
# referencing the prior round twice (dangling mass + contributions)
# would otherwise double the logical plan per round (2^n_iter subtrees;
# same device as connected_components above); the static edge/degree/
# node/dangling frames are persisted for the loop and released before
# return.
#
# Precision bound: the quantum is 1/scale, so rank mass below n/scale
# is truncated — with scale=10^12, ranks stay meaningful up to ~10^9
# hosts (3+ significant digits at the uniform floor); raise ``scale``
# (int64 holds up to ~9·10^18/damping_pct headroom) for bigger graphs.


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping_pct: int = 85,
    scale: int = 10**12,
    src: str = "src",
    dst: str = "dst",
    cache: bool = True,
) -> DataFrame:
    """(node, rank): ``n_iter`` PageRank rounds over the DISTINCT
    (src, dst) edge set (parallel edges collapse; self-loops dropped;
    NULL endpoints dropped). ``damping_pct`` is an integer percentage so
    the whole recursion stays in exact int64 arithmetic. Output rank is
    half-up-rounded to 6 decimals IN THE INTEGER DOMAIN, then divided —
    engines disagree on float half-ties (Spark HALF_UP on the decimal
    repr, Python correct-rounds the binary value), so the tie is
    resolved before any float exists. ``scale`` must be a multiple of
    10^6 (the display quantum).

    Implemented as :func:`trustrank` with every edge endpoint seeded —
    when seeds == all in-graph nodes, the seeded recursion reduces
    TERM-FOR-TERM to classic PageRank (same r0 = scale // n, same
    (1-d) base split over n, same uniform dangling return), so one
    recursion body serves both ranks and cannot drift."""
    e0 = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    seeds = e0.select(F.col("src").alias("node")).union(
        e0.select(F.col("dst").alias("node"))
    )
    return trustrank(
        edges,
        seeds,
        n_iter=n_iter,
        damping_pct=damping_pct,
        scale=scale,
        src=src,
        dst=dst,
        cache=cache,
    )


def sql_pagerank(
    edges_select: str,
    n_iter: int = 5,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> str:
    """DuckDB twin of :func:`pagerank` — :func:`sql_trustrank` with
    every edge endpoint seeded (the same term-for-term reduction as the
    Column side, so the two CTE builders cannot drift). The empty graph
    emits zero rows (the seed count is greatest(n, 1)-guarded)."""
    return sql_trustrank(
        edges_select,
        f"SELECT src AS node FROM ({edges_select}) "
        f"UNION SELECT dst FROM ({edges_select})",
        n_iter=n_iter,
        damping_pct=damping_pct,
        scale=scale,
    )


# ---------------------------------------------------------------------------
# TrustRank (Gyongyi, Garcia-Molina & Pedersen 2004) — seeded PageRank
# ---------------------------------------------------------------------------
#
# The spam-demotion companion to PageRank: the teleport vector is
# uniform over a TRUSTED SEED SET instead of all nodes, so rank mass
# can only originate at seeds and decays with link distance from them —
# hosts unreachable from any seed converge to 0. This is the standard
# personalized-PageRank shape crawl pipelines use to propagate a small
# human-audited whitelist over the full host graph.
#
# Same fixed-point int64 device as :func:`pagerank` (exact associative
# integer sums, integer-domain rounding) with two deltas, both
# faithful to the paper's d·T·t + (1-d)·s iteration:
#   * the (1-damping) base term goes only to seeds, split uniformly;
#   * dangling mass is redistributed uniformly over the SEEDS (not all
#     nodes) — leaked mass re-enters at the trust source, keeping the
#     "mass flows outward from seeds" invariant AND exact conservation.
# Seeds not present in the graph are ignored (they can neither receive
# nor forward mass); with zero in-graph seeds every rank is 0.
#
# Scale shape per round: identical to pagerank — one src-keyed join +
# one dst-keyed map-side-combinable sum; the seed flag rides on the
# persisted nodes frame, so seeding adds no extra shuffle.


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 5,
    damping_pct: int = 85,
    scale: int = 10**12,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    cache: bool = True,
) -> DataFrame:
    """(node, rank): ``n_iter`` TrustRank rounds — PageRank whose
    teleport (and dangling-mass return) is uniform over the in-graph
    rows of ``seeds``. Same hygiene as :func:`pagerank` (distinct
    edges, self-loops and NULL endpoints dropped), same integer
    half-up rounding to 6 decimals before any float exists."""
    if scale % 10**6 != 0:
        raise ValueError("scale must be a multiple of 10^6")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
    )
    s = (
        seeds.select(F.col(seed_col).alias("node"))
        .filter(F.col("node").isNotNull())
        .distinct()
    )
    nodes_plain = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    # seed flag rides on the nodes frame — no per-round seed join
    nodes = nodes_plain.join(
        s.withColumn("is_seed", F.lit(True)), "node", "left"
    ).select("node", F.coalesce("is_seed", F.lit(False)).alias("is_seed"))
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    dangling = nodes.select("node").join(
        deg, F.col("node") == deg["src"], "left_anti"
    )
    if cache:
        e = e.persist()
        nodes = nodes.persist()
        deg = deg.persist()
        dangling = dangling.persist()
    n_seed = nodes.filter("is_seed").count()
    if n_seed == 0:
        out = nodes.select("node", F.lit(0.0).alias("rank"))
        out = out.localCheckpoint()  # materialize before unpersist
        if cache:
            for frame in (e, nodes, deg, dangling):
                frame.unpersist()
        return out
    base = ((100 - damping_pct) * scale) // (100 * n_seed)  # exact int
    ranks = nodes.select(
        "node",
        F.when(F.col("is_seed"), F.lit(scale // n_seed)).otherwise(F.lit(0)).alias("r"),
    )
    for _ in range(n_iter):
        dang = ranks.join(dangling, "node").agg(
            F.coalesce(F.sum("r"), F.lit(0)).alias("dm")
        )
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("r div deg")).alias("cs"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                F.expr(
                    "CASE WHEN is_seed THEN "
                    f"{base}L + ({damping_pct} * (coalesce(cs, 0L) "
                    f"+ dm div {n_seed})) div 100 "
                    f"ELSE ({damping_pct} * coalesce(cs, 0L)) div 100 END"
                ).alias("r"),
            )
        )
        # read twice next round (dangling + contrib): cut the lineage
        ranks = ranks.localCheckpoint()
    q = scale // 10**6
    out = ranks.select(
        "node",
        (
            F.expr(f"(r + {q // 2}L) div {q}L").cast("double") / F.lit(1e6)
        ).alias("rank"),
    )
    if cache:
        for frame in (e, nodes, deg, dangling):
            frame.unpersist()
    return out


def sql_trustrank(
    edges_select: str,
    seeds_select: str,
    n_iter: int = 5,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> str:
    """DuckDB twin of :func:`trustrank`: the identical integer
    recursion unrolled one CTE per round. ``seeds_select`` must yield a
    ``node`` column; in-graph seeds are selected with a semi-join and
    greatest(n, 1) guards the zero-seed case (where every CASE branch
    is already 0, matching Spark's early return)."""
    if scale % 10**6 != 0:
        raise ValueError("scale must be a multiple of 10^6")
    q = scale // 10**6
    parts = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_select}) "
        "WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst)",
        "np AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        f"sd AS (SELECT DISTINCT node FROM ({seeds_select}) "
        "WHERE node IS NOT NULL)",
        "nodes AS (SELECT np.node, sd.node IS NOT NULL AS is_seed "
        "FROM np LEFT JOIN sd ON np.node = sd.node)",
        "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)",
        "dang AS (SELECT node FROM nodes LEFT JOIN deg ON node = deg.src "
        "WHERE deg.src IS NULL)",
        "ns AS (SELECT greatest(count(*), 1) AS n FROM nodes WHERE is_seed)",
        f"r0 AS (SELECT node, CASE WHEN is_seed THEN {scale} // "
        "(SELECT n FROM ns) ELSE 0 END AS r FROM nodes)",
    ]
    base = f"(({100 - damping_pct} * {scale}) // (100 * (SELECT n FROM ns)))"
    for i in range(n_iter):
        prev, cur = f"r{i}", f"r{i + 1}"
        parts.append(
            f"d{i} AS (SELECT coalesce(sum(r), 0) AS dm FROM {prev} "
            "JOIN dang USING (node))"
        )
        parts.append(
            f"c{i} AS (SELECT e.dst AS node, sum({prev}.r // deg.deg) AS cs "
            f"FROM e JOIN {prev} ON e.src = {prev}.node "
            "JOIN deg ON e.src = deg.src GROUP BY e.dst)"
        )
        parts.append(
            f"{cur} AS (SELECT nodes.node, CASE WHEN nodes.is_seed THEN "
            f"{base} + ({damping_pct} * (coalesce(c{i}.cs, 0) + "
            f"(SELECT dm FROM d{i}) // (SELECT n FROM ns))) // 100 "
            f"ELSE ({damping_pct} * coalesce(c{i}.cs, 0)) // 100 END AS r "
            f"FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node)"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT node, CAST((r + {q // 2}) // {q} AS DOUBLE) / 1e6 "
        f"AS rank FROM r{n_iter}"
    )


# ---------------------------------------------------------------------------
# HITS (Kleinberg 1999) — hubs & authorities over the host link graph
# ---------------------------------------------------------------------------
#
# The query-independent companion to PageRank: a node is a good
# AUTHORITY when good hubs link to it, and a good HUB when it links to
# good authorities — the mutual recursion crawl pipelines use to
# separate directory/portal hosts (hubs) from content hosts
# (authorities), where a single PageRank score conflates the two.
#
# Same exact-int64 device as :func:`pagerank`: scores are fixed-point
# integers, every per-node update is a plain map-side-combinable SUM
# (exact, associative → bit-identical across engines, partitionings and
# cluster sizes), and the published L2 normalization is replaced by a
# deterministic L1-style rescale that stays in the integer domain:
#
#   D = max(1, ceil(total / scale));  x' = x div D
#
# so after every half-step the score mass is ~``scale`` and each score
# sits in [0, scale] — the ranking HITS produces is invariant to the
# norm chosen (normalization only keeps the iteration from over/under-
# flowing), and the integer rescale makes the RESULT reproducible where
# a float L2 norm would drift with summation order. Documented
# deviation from the paper's L2 norm; same spirit as the integer
# damping in :func:`pagerank`.
#
# Scale shape per iteration: one src-keyed join + dst-keyed sum
# (authority half-step), one dst-keyed join + src-keyed sum (hub
# half-step), plus two 1-row scalar totals broadcast back. Both
# half-step frames are localCheckpoint()ed — each is read twice (total
# + rescale) and feeds the next round, so the logical plan would
# otherwise double per round. Overflow bound: per-edge contribution
# ≤ scale, so a half-step total fits int64 up to ~9·10^18/scale edges
# (~9·10^9 edges at the default scale); raise/lower ``scale`` to trade
# quantum precision against edge-count headroom.


def hits(
    edges: DataFrame,
    n_iter: int = 5,
    scale: int = 10**9,
    src: str = "src",
    dst: str = "dst",
    cache: bool = True,
) -> DataFrame:
    """(node, hub, authority): ``n_iter`` HITS rounds over the DISTINCT
    (src, dst) edge set (parallel edges collapse; self-loops and NULL
    endpoints dropped — same hygiene as :func:`pagerank`). Scores are
    L1-rescaled to ~``scale`` total per half-step in exact integer
    arithmetic, then half-up-rounded to 6 decimals IN THE INTEGER
    DOMAIN before the only float division, so no engine float-rounding
    rule ever runs. Hub-less sinks read authority from their in-links
    and hub 0; source-less nodes the reverse; the empty graph returns
    zero rows."""
    if scale % 10**6 != 0:
        raise ValueError("scale must be a multiple of 10^6")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if cache:
        e = e.persist()
        nodes = nodes.persist()
    h = nodes.select("node", F.lit(scale).alias("s"))
    a = None
    for _ in range(n_iter):
        # authority half-step: pull hub mass along in-edges
        a_raw = (
            e.join(h, e["src"] == h["node"])
            .groupBy("dst")
            .agg(F.sum("s").alias("raw"))
        )
        a_raw = a_raw.localCheckpoint()  # read twice: total + rescale
        a_tot = a_raw.agg(F.coalesce(F.sum("raw"), F.lit(0)).alias("tot"))
        a = (
            nodes.join(a_raw, nodes["node"] == a_raw["dst"], "left")
            .crossJoin(F.broadcast(a_tot))
            .select(
                "node",
                F.expr(
                    "coalesce(raw, 0L) div "
                    f"greatest((tot + {scale - 1}L) div {scale}L, 1L)"
                ).alias("s"),
            )
        )
        a = a.localCheckpoint()
        # hub half-step: pull authority mass along out-edges
        h_raw = (
            e.join(a, e["dst"] == a["node"])
            .groupBy("src")
            .agg(F.sum("s").alias("raw"))
        )
        h_raw = h_raw.localCheckpoint()
        h_tot = h_raw.agg(F.coalesce(F.sum("raw"), F.lit(0)).alias("tot"))
        h = (
            nodes.join(h_raw, nodes["node"] == h_raw["src"], "left")
            .crossJoin(F.broadcast(h_tot))
            .select(
                "node",
                F.expr(
                    "coalesce(raw, 0L) div "
                    f"greatest((tot + {scale - 1}L) div {scale}L, 1L)"
                ).alias("s"),
            )
        )
        h = h.localCheckpoint()
    q = scale // 10**6
    out = (
        h.select("node", F.col("s").alias("hs"))
        .join(a.select("node", F.col("s").alias("as_")), "node")
        .select(
            "node",
            (F.expr(f"(hs + {q // 2}L) div {q}L").cast("double") / F.lit(1e6)).alias(
                "hub"
            ),
            (F.expr(f"(as_ + {q // 2}L) div {q}L").cast("double") / F.lit(1e6)).alias(
                "authority"
            ),
        )
    )
    if cache:
        e.unpersist()
        nodes.unpersist()
    return out


def sql_hits(
    edges_select: str,
    n_iter: int = 5,
    scale: int = 10**9,
) -> str:
    """DuckDB twin of :func:`hits`: the identical integer mutual
    recursion unrolled two CTEs per round (authority half-step, hub
    half-step), with the same ceil-divisor L1 rescale — every quantity
    is non-negative so DuckDB's floor ``//`` and Spark's ``div`` agree
    term for term. Every per-round CTE is MATERIALIZED: each is
    referenced 2-3 times (total + rescale + next half-step), and
    DuckDB's default CTE inlining would otherwise replicate the chain
    ~6× per round (exponential planning past n_iter≈3) — the exact
    analogue of the Column side's localCheckpoint-per-round."""
    if scale % 10**6 != 0:
        raise ValueError("scale must be a multiple of 10^6")
    q = scale // 10**6
    parts = [
        f"e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_select}) "
        "WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst)",
        "nodes AS MATERIALIZED "
        "(SELECT src AS node FROM e UNION SELECT dst FROM e)",
        f"h0 AS MATERIALIZED (SELECT node, {scale} AS s FROM nodes)",
    ]
    for i in range(n_iter):
        hp, ap, hn = f"h{i}", f"a{i + 1}", f"h{i + 1}"
        parts.append(
            f"ar{i} AS MATERIALIZED (SELECT e.dst AS node, sum({hp}.s) AS raw "
            f"FROM e JOIN {hp} ON e.src = {hp}.node GROUP BY e.dst)"
        )
        parts.append(
            f"at{i} AS MATERIALIZED "
            f"(SELECT coalesce(sum(raw), 0) AS tot FROM ar{i})"
        )
        parts.append(
            f"{ap} AS MATERIALIZED (SELECT nodes.node, coalesce(ar{i}.raw, 0) // "
            f"greatest(((SELECT tot FROM at{i}) + {scale - 1}) // {scale}, 1) "
            f"AS s FROM nodes LEFT JOIN ar{i} ON nodes.node = ar{i}.node)"
        )
        parts.append(
            f"hr{i} AS MATERIALIZED (SELECT e.src AS node, sum({ap}.s) AS raw "
            f"FROM e JOIN {ap} ON e.dst = {ap}.node GROUP BY e.src)"
        )
        parts.append(
            f"ht{i} AS MATERIALIZED "
            f"(SELECT coalesce(sum(raw), 0) AS tot FROM hr{i})"
        )
        parts.append(
            f"{hn} AS MATERIALIZED (SELECT nodes.node, coalesce(hr{i}.raw, 0) // "
            f"greatest(((SELECT tot FROM ht{i}) + {scale - 1}) // {scale}, 1) "
            f"AS s FROM nodes LEFT JOIN hr{i} ON nodes.node = hr{i}.node)"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT h{n_iter}.node, "
        f"CAST((h{n_iter}.s + {q // 2}) // {q} AS DOUBLE) / 1e6 AS hub, "
        f"CAST((a{n_iter}.s + {q // 2}) // {q} AS DOUBLE) / 1e6 AS authority "
        f"FROM h{n_iter} JOIN a{n_iter} ON h{n_iter}.node = a{n_iter}.node"
    )


# ---------------------------------------------------------------------------
# Label propagation (Raghavan, Albert & Kumara 2007) — host communities
# ---------------------------------------------------------------------------
#
# Community detection over the host link graph: each node adopts the
# label carried by the plurality of its neighbors, so densely linked
# host clusters (site networks, link farms, topic hubs) converge onto
# one label while sparse bridges between them do not — the grouping
# connected_components cannot express (components merge ANY connected
# hosts; LPA separates communities inside one giant component, which
# is what a web graph is).
#
# Determinism: the published algorithm breaks plurality ties randomly
# and updates asynchronously — both unreproducible on a cluster. This
# implementation is SYNCHRONOUS with a total-order tie rule (highest
# neighbor count, then lexicographically smallest label), a fixed
# iteration count, and node-id initial labels, so the result is a pure
# function of the edge set: bit-identical across engines, partitionings
# and cluster sizes. Counts are exact integers and labels are strings —
# no float exists anywhere in the operator. (Synchronous updates can
# oscillate 2-cycles on bipartite structure — the known deviation for
# deterministic LPA; a fixed n_iter makes the output well-defined, and
# community quality degrades gracefully.)
#
# Scale shape per round: one nbr-keyed join (labels frame is node-
# sized) feeding a (node, label)-keyed map-side-combinable count, then
# a node-keyed min(struct(-count, label)) argmax — also map-side
# combinable, NO window over corpus-sized partitions. Per-round frames
# are localCheckpoint()ed (plan doubles per round otherwise — the
# connected_components/pagerank device); the undirected edge frame is
# persisted for the loop.


def label_propagation(
    edges: DataFrame,
    n_iter: int = 5,
    src: str = "src",
    dst: str = "dst",
    cache: bool = True,
) -> DataFrame:
    """(node, community): ``n_iter`` synchronous label-propagation
    rounds over the UNDIRECTED distinct edge set (direction dropped —
    community membership is a symmetric relation; self-loops and NULL
    endpoints dropped, same hygiene as :func:`pagerank`). Tie rule:
    plurality count desc, then smallest label; initial label = node id.
    Every node in the output has ≥1 neighbor by construction (nodes
    come from edges); the empty graph returns zero rows."""
    d = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(
            F.col("a").isNotNull()
            & F.col("b").isNotNull()
            & (F.col("a") != F.col("b"))
        )
    )
    u = (
        d.union(d.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
    )
    if cache:
        u = u.persist()
    labels = u.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(n_iter):
        counts = (
            u.join(labels, u["b"] == labels["node"])
            .groupBy("a", "lbl")
            .agg(F.count("*").alias("n"))
        )
        labels = (
            counts.groupBy("a")
            .agg(F.min(F.struct((-F.col("n")).alias("neg"), F.col("lbl").alias("l"))).alias("m"))
            .select(F.col("a").alias("node"), F.col("m.l").alias("lbl"))
        )
        labels = labels.localCheckpoint()
    out = labels.select("node", F.col("lbl").alias("community"))
    if cache:
        u.unpersist()
    return out


def sql_label_propagation(edges_select: str, n_iter: int = 5) -> str:
    """DuckDB twin of :func:`label_propagation`: the identical
    synchronous recursion unrolled one MATERIALIZED CTE per round (the
    HITS lesson — default CTE inlining replicates the chain per
    reference, exponential past a few rounds). The argmax is spelled
    ``row_number() OVER (ORDER BY n DESC, lbl ASC)`` — term-for-term
    the Column side's min(struct(-n, lbl)) on integer counts and
    binary-collated strings."""
    parts = [
        "ud AS MATERIALIZED ("
        f"SELECT DISTINCT a, b FROM (SELECT src AS a, dst AS b FROM ({edges_select}) "
        "UNION ALL "
        f"SELECT dst AS a, src AS b FROM ({edges_select})) "
        "WHERE a IS NOT NULL AND b IS NOT NULL AND a <> b)",
        "l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lbl FROM ud)",
    ]
    for i in range(n_iter):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT ud.a, l{i}.lbl, count(*) AS n "
            f"FROM ud JOIN l{i} ON ud.b = l{i}.node GROUP BY ud.a, l{i}.lbl)"
        )
        parts.append(
            f"l{i + 1} AS MATERIALIZED (SELECT a AS node, lbl FROM "
            f"(SELECT a, lbl, row_number() OVER "
            f"(PARTITION BY a ORDER BY n DESC, lbl ASC) AS rn FROM c{i}) "
            "WHERE rn = 1)"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT node, lbl AS community FROM l{n_iter}"
    )


# ---------------------------------------------------------------------------
# SALSA (Lempel & Moran, WWW 2000 / TOIS 2001)
# ---------------------------------------------------------------------------
#
# The stochastic sibling of HITS: hub/authority scores are the
# stationary distributions of random walks on the bipartite support
# graph (one step back along an in-link, one step forward along an
# out-link). Where HITS's mutual reinforcement is topic-drift- and
# TKC-(tightly-knit-community)-sensitive, SALSA's walk normalizes by
# degree — the reason it became the production link-feature at web
# scale (cf. Twitter's WTF recommender, Gupta et al. WWW 2013).
#
# Closed form instead of iteration (Lempel-Moran §3.2): within an
# irreducible component c of the authority-side chain the stationary
# weight of authority j is d_in(j)/e_c (e_c = links in c), and the
# paper weights components by their share of the authority universe:
#     a(j) = (|c ∩ A| / |A|) · (d_in(j) / e_c)
# (hub side symmetric with out-degrees and |c ∩ H| / |H|). The
# irreducible components are exactly the connected components of the
# bipartite hub/authority graph — which this engine already computes
# distributively (pointer jumping, no driver graph), so SALSA needs
# ZERO new iteration machinery: components + degree counts + two joins.
#
# Exactness device: scores are nano-scaled int64 computed in the FIXED
# op order  ((d · 10⁹) DIV e_c) · |c∩S| DIV |S|  — floor division of
# non-negative ints at every step, identical in Spark (DIV) and DuckDB
# (//); the op order keeps every intermediate ≤ 10⁹·|c| (no overflow
# at any corpus size whose component node count fits int32, documented
# bound). No float ever runs.
#
# Scale shape: the component labelling is the pointer-jumping loop
# (O(log diameter) rounds of edge-keyed joins); everything after is
# one degree count + component-keyed joins + two 1-row broadcast
# scalars. No window, no Python.

SALSA_SCALE = 10**9


def salsa(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    scale: int = SALSA_SCALE,
) -> DataFrame:
    """(node, hub_nano, authority_nano): SALSA stationary scores over
    the DISTINCT (src, dst) link set (self-loops and NULL endpoints
    dropped — the hits hygiene). A node missing from one side scores 0
    there; each side's scores sum to ~``scale`` (floor-division
    shortfall only). Empty graphs return zero rows."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
        .persist()
    )
    pairs = e.select(
        F.concat(F.lit("H:"), F.col("src")).alias("id_a"),
        F.concat(F.lit("A:"), F.col("dst")).alias("id_b"),
    )
    cc = connected_components(pairs).persist()
    comp_a = cc.filter(F.col("node").startswith("A:")).select(
        F.expr("substring(node, 3)").alias("node"), "component"
    )
    comp_h = cc.filter(F.col("node").startswith("H:")).select(
        F.expr("substring(node, 3)").alias("node"), "component"
    )
    # every link lies in exactly one bipartite component — count once
    ec = (
        e.join(comp_a.withColumnRenamed("node", "dst"), "dst")
        .groupBy("component")
        .agg(F.count("*").alias("e_c"))
    )
    ca = comp_a.groupBy("component").agg(F.count("*").alias("c_n"))
    ch = comp_h.groupBy("component").agg(F.count("*").alias("c_n"))
    va = comp_a.agg(F.count("*").alias("v"))
    vh = comp_h.agg(F.count("*").alias("v"))
    din = e.groupBy(F.col("dst").alias("node")).agg(F.count("*").alias("d"))
    dout = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    a_s = (
        din.join(comp_a, "node")
        .join(ec, "component")
        .join(ca, "component")
        .crossJoin(F.broadcast(va))
        .select(
            "node",
            F.expr(f"((d * {scale}L) DIV e_c) * c_n DIV v").alias(
                "authority_nano"
            ),
        )
    )
    h_s = (
        dout.join(comp_h, "node")
        .join(ec, "component")
        .join(ch, "component")
        .crossJoin(F.broadcast(vh))
        .select(
            "node",
            F.expr(f"((d * {scale}L) DIV e_c) * c_n DIV v").alias("hub_nano"),
        )
    )
    out = h_s.join(a_s, "node", "full_outer").select(
        "node",
        F.coalesce("hub_nano", F.lit(0)).alias("hub_nano"),
        F.coalesce("authority_nano", F.lit(0)).alias("authority_nano"),
    )
    return out


def sql_salsa(edges_select: str, scale: int = SALSA_SCALE) -> str:
    """DuckDB twin of :func:`salsa`: components via the recursive
    reachability CTE over the same prefixed bipartite node ids (the
    sql_dedup_clusters device), then the identical fixed-op-order
    integer score arithmetic."""
    return (
        "WITH RECURSIVE "
        f"raw AS (SELECT DISTINCT src, dst FROM ({edges_select}) "
        "WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst), "
        "bip AS (SELECT 'H:' || src AS ia, 'A:' || dst AS ib FROM raw), "
        "bedges AS (SELECT ia AS s, ib AS d FROM bip "
        "UNION SELECT ib, ia FROM bip), "
        "reach(n, m) AS (SELECT s, s FROM bedges "
        "UNION SELECT e.s, r.m FROM bedges e JOIN reach r ON e.d = r.n), "
        "lab AS (SELECT n AS node, min(m) AS component FROM reach GROUP BY n), "
        "comp_a AS (SELECT substring(node, 3) AS node, component FROM lab "
        "WHERE node LIKE 'A:%'), "
        "comp_h AS (SELECT substring(node, 3) AS node, component FROM lab "
        "WHERE node LIKE 'H:%'), "
        "ec AS (SELECT component, CAST(count(*) AS BIGINT) AS e_c FROM raw "
        "JOIN comp_a ON raw.dst = comp_a.node GROUP BY component), "
        "ca AS (SELECT component, CAST(count(*) AS BIGINT) AS c_n "
        "FROM comp_a GROUP BY component), "
        "ch AS (SELECT component, CAST(count(*) AS BIGINT) AS c_n "
        "FROM comp_h GROUP BY component), "
        "va AS (SELECT CAST(count(*) AS BIGINT) AS v FROM comp_a), "
        "vh AS (SELECT CAST(count(*) AS BIGINT) AS v FROM comp_h), "
        "din AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS d "
        "FROM raw GROUP BY dst), "
        "dout AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d "
        "FROM raw GROUP BY src), "
        "a_s AS (SELECT din.node, "
        f"((din.d * {scale}) // ec.e_c) * ca.c_n // (SELECT v FROM va) "
        "AS authority_nano FROM din "
        "JOIN comp_a ON din.node = comp_a.node "
        "JOIN ec ON comp_a.component = ec.component "
        "JOIN ca ON comp_a.component = ca.component), "
        "h_s AS (SELECT dout.node, "
        f"((dout.d * {scale}) // ec.e_c) * ch.c_n // (SELECT v FROM vh) "
        "AS hub_nano FROM dout "
        "JOIN comp_h ON dout.node = comp_h.node "
        "JOIN ec ON comp_h.component = ec.component "
        "JOIN ch ON comp_h.component = ch.component) "
        "SELECT coalesce(h_s.node, a_s.node) AS node, "
        "CAST(coalesce(h_s.hub_nano, 0) AS BIGINT) AS hub_nano, "
        "CAST(coalesce(a_s.authority_nano, 0) AS BIGINT) AS authority_nano "
        "FROM h_s FULL OUTER JOIN a_s ON h_s.node = a_s.node"
    )


# ---------------------------------------------------------------------------
# Newman-Girvan modularity (Newman & Girvan 2004; Newman PNAS 2006) of
# a community partition
# ---------------------------------------------------------------------------
#
# Q = Σ_c [ e_c/m − (d_c/2m)² ] — the standard goodness-of-partition
# score for the label_propagation communities: Q near 0 means the
# partition explains no more edge mass than a random graph with the
# same degrees (the null model), Q ≳ 0.3 means real community
# structure. The per-community report is the QA table a host-graph
# clustering run ships with.
#
# Exactness: e_c (intra-community edges), d_c (community degree mass)
# and m are exact int64 counts; each community's contribution and the
# total are the ONE fixed double expression over those ints (the
# assortativity device). Overflow bound: 4·m·e_c must fit int64 in the
# double domain only — the int columns themselves never multiply.
#
# Scale shape: one edge-keyed join against the node-sized label frame
# (twice, for both endpoints), two combinable aggregates. The labels
# come from any (node, community) frame — label_propagation, connected
# components, or an external assignment.


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(community, n_nodes, intra_edges, degree_mass, contribution):
    per-community modularity contribution over the canonical
    undirected simple graph (self-loops/NULLs dropped, parallel edges
    collapsed); Σ contribution = Q. Nodes missing from ``labels`` are
    excluded from the graph first (documented: the partition defines
    the universe)."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(
            F.col("a").isNotNull()
            & F.col("b").isNotNull()
            & (F.col("a") != F.col("b"))
        )
        .select(
            F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
        )
        .distinct()
    )
    lab = labels.select(
        F.col(labels.columns[0]).alias("node"),
        F.col(labels.columns[1]).alias("community"),
    )
    el = (
        e.join(lab.withColumnRenamed("node", "lo"), "lo")
        .withColumnRenamed("community", "c_lo")
        .join(lab.withColumnRenamed("node", "hi"), "hi")
        .withColumnRenamed("community", "c_hi")
        .persist()
    )
    m_tot = el.count()  # scalar: edges with both endpoints labelled
    intra = (
        el.filter(F.col("c_lo") == F.col("c_hi"))
        .groupBy(F.col("c_lo").alias("community"))
        .agg(F.count("*").alias("intra_edges"))
    )
    deg = (
        el.select(F.col("lo").alias("node"), F.col("c_lo").alias("community"))
        .unionByName(
            el.select(
                F.col("hi").alias("node"), F.col("c_hi").alias("community")
            )
        )
        .groupBy("community")
        .agg(F.count("*").alias("degree_mass"))
    )
    n_nodes = (
        el.select(F.col("lo").alias("node"), F.col("c_lo").alias("community"))
        .unionByName(
            el.select(
                F.col("hi").alias("node"), F.col("c_hi").alias("community")
            )
        )
        .distinct()
        .groupBy("community")
        .agg(F.count("*").alias("n_nodes"))
    )
    out = (
        deg.join(intra, "community", "left")
        .join(n_nodes, "community")
        .select(
            "community",
            "n_nodes",
            F.coalesce("intra_edges", F.lit(0)).alias("intra_edges"),
            "degree_mass",
            F.when(
                F.lit(m_tot) > 0,
                # coalesce HERE too: the aliased column above is not in
                # scope, and a left-join NULL must read as 0 intra edges
                F.coalesce("intra_edges", F.lit(0)).cast("double")
                / F.lit(float(m_tot))
                - (
                    F.col("degree_mass").cast("double")
                    / F.lit(2.0 * m_tot)
                )
                * (
                    F.col("degree_mass").cast("double")
                    / F.lit(2.0 * m_tot)
                ),
            ).alias("contribution"),
        )
    )
    return out


def sql_modularity(edges_select: str, labels_select: str) -> str:
    """DuckDB twin of :func:`modularity`: ``labels_select`` yields
    (node, community); identical edge hygiene, counts and double
    expression (the scalar m enters both engines as a subquery /
    literal of the same exact integer)."""
    return (
        f"WITH raw AS (SELECT src, dst FROM ({edges_select}) "
        "WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst), "
        "e AS (SELECT DISTINCT least(src, dst) AS lo, "
        "greatest(src, dst) AS hi FROM raw), "
        f"lab AS (SELECT * FROM ({labels_select})), "
        "el AS (SELECT e.lo, e.hi, l1.community AS c_lo, "
        "l2.community AS c_hi FROM e "
        "JOIN lab l1 ON e.lo = l1.node JOIN lab l2 ON e.hi = l2.node), "
        "m AS (SELECT CAST(count(*) AS BIGINT) AS m_tot FROM el), "
        "intra AS (SELECT c_lo AS community, CAST(count(*) AS BIGINT) "
        "AS intra_edges FROM el WHERE c_lo = c_hi GROUP BY c_lo), "
        "ends AS (SELECT lo AS node, c_lo AS community FROM el "
        "UNION ALL SELECT hi, c_hi FROM el), "
        "deg AS (SELECT community, CAST(count(*) AS BIGINT) AS degree_mass "
        "FROM ends GROUP BY community), "
        "nn AS (SELECT community, CAST(count(*) AS BIGINT) AS n_nodes FROM ("
        "SELECT DISTINCT node, community FROM ends) GROUP BY community) "
        "SELECT deg.community, nn.n_nodes, "
        "CAST(coalesce(intra.intra_edges, 0) AS BIGINT) AS intra_edges, "
        "deg.degree_mass, "
        "CASE WHEN (SELECT m_tot FROM m) > 0 THEN "
        "CAST(coalesce(intra.intra_edges, 0) AS DOUBLE) / "
        "CAST((SELECT m_tot FROM m) AS DOUBLE) - "
        "(CAST(deg.degree_mass AS DOUBLE) / "
        "(2.0 * CAST((SELECT m_tot FROM m) AS DOUBLE))) * "
        "(CAST(deg.degree_mass AS DOUBLE) / "
        "(2.0 * CAST((SELECT m_tot FROM m) AS DOUBLE))) END AS contribution "
        "FROM deg LEFT JOIN intra ON deg.community = intra.community "
        "JOIN nn ON deg.community = nn.community"
    )


# ---------------------------------------------------------------------------
# Katz centrality (Katz 1953, "A new status index derived from
# sociometric analysis")
# ---------------------------------------------------------------------------
#
# The attenuated-path-count status index: x = sum_{t>=1..n_iter}
# alpha^t * (A^T)^t * 1 + 1, i.e. every walk INTO a node contributes,
# damped by alpha per hop — the rank-family member that, unlike
# PageRank, does NOT normalize by out-degree (a hub with 10^6 outlinks
# endorses each target with full weight, attenuated only by path
# length). The truncated recursion x_{t+1} = 1 + alpha * A^T x_t runs
# in exact fixed point: with alpha = 1 / 2^alpha_shift, each round is
#     x[v] <- scale + (sum_{u -> v} x[u]) >> alpha_shift
# — an integer shift of a non-negative sum is a floor division by
# 2^alpha_shift on both engines, so every round and the final
# katz_micro are bit-identical across engines, partitionings and
# cluster sizes (plain map-side-combinable integer sums; the pagerank
# contract without even the per-edge division).
#
# Convergence / overflow contract: the infinite series needs
# alpha < 1/lambda_max; the truncated integer recursion additionally
# needs (max_in_degree * alpha)^n_iter * scale inside int64. The
# caller picks alpha_shift accordingly (default 1/32 with n_iter=4
# holds to in-degrees ~10^4 at scale 10^12); this is documented, not
# silently clamped — a divergent alpha is a modeling error, not an
# engine one. Per round: one src-keyed join + one dst-keyed sum;
# static edge/nodes frames persisted once; localCheckpoint per round
# keeps the plan linear in n_iter (the pagerank device).


def katz_centrality(
    edges: DataFrame,
    n_iter: int = 4,
    alpha_shift: int = 5,
    scale: int = 10**12,
    src: str = "src",
    dst: str = "dst",
    cache: bool = True,
) -> DataFrame:
    """(node, katz_micro): truncated Katz index with beta = 1 and
    alpha = 1/2**alpha_shift, reported in exact millionths
    (katz_micro = x div 10^6; the baseline no-inlink node reads
    exactly 10^6). Same edge hygiene as :func:`pagerank`: distinct
    (src, dst), self-loops and NULL endpoints dropped."""
    if scale % 10**6 != 0:
        raise ValueError("scale must be a multiple of 10^6")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if cache:
        e = e.persist()
        nodes = nodes.persist()
    x = nodes.select("node", F.lit(scale).cast("long").alias("x"))
    for _ in range(n_iter):
        inc = (
            e.join(x, e["src"] == x["node"])
            .groupBy("dst")
            .agg(F.sum("x").alias("inc"))
        )
        x = (
            nodes.join(inc, nodes["node"] == inc["dst"], "left")
            .select(
                "node",
                (
                    F.lit(scale)
                    + F.shiftright(
                        F.coalesce(F.col("inc"), F.lit(0)), alpha_shift
                    )
                ).cast("long").alias("x"),
            )
        )
        x = x.localCheckpoint()
    out = x.select("node", F.expr("x div 1000000").alias("katz_micro"))
    if cache:
        e.unpersist()
        nodes.unpersist()
    return out


def sql_katz_centrality(
    edges_select: str,
    n_iter: int = 4,
    alpha_shift: int = 5,
    scale: int = 10**12,
) -> str:
    """DuckDB twin of :func:`katz_centrality` — the identical integer
    recursion unrolled one MATERIALIZED CTE per round (`>> shift` ==
    `// 2^shift` on the all-non-negative sums)."""
    div = 1 << alpha_shift
    parts = [
        "WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        f"({edges_select}) WHERE src IS NOT NULL AND dst IS NOT NULL "
        "AND src <> dst), "
        "n AS MATERIALIZED (SELECT src AS node FROM e "
        "UNION SELECT dst FROM e), "
        f"x0 AS (SELECT node, CAST({scale} AS BIGINT) AS x FROM n)"
    ]
    for t in range(n_iter):
        parts.append(
            f", x{t + 1} AS MATERIALIZED (SELECT n.node, "
            f"CAST({scale} + coalesce(c.inc, 0) // {div} AS BIGINT) AS x "
            "FROM n LEFT JOIN (SELECT e.dst, CAST(sum(p.x) AS BIGINT) AS inc "
            f"FROM e JOIN x{t} p ON p.node = e.src GROUP BY e.dst) c "
            "ON c.dst = n.node)"
        )
    parts.append(
        f" SELECT node, CAST(x // 1000000 AS BIGINT) AS katz_micro "
        f"FROM x{n_iter}"
    )
    return "".join(parts)
