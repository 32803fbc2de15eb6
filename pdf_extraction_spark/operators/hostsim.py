"""Host-level set-overlap similarity: co-citation / bibliographic
coupling related hosts, and Bharat-Broder mirror detection.

Three published web-graph operators that share ONE relational core —
Jaccard overlap between the item-sets attached to hosts:

- **co-citation** (Small 1973; Dean & Henzinger, WWW 1999 "Finding
  related pages"): hosts a and b are related when many hosts link to
  BOTH — items = citing hosts, keyed by the cited pair.
- **bibliographic coupling** (Kessler 1963): hosts a and b are related
  when they link OUT to the same hosts — the transpose of co-citation.
- **mirror detection** (Bharat & Broder, WWW 1999 "A study of host
  pairs with replicated content"): hosts a and b mirror each other when
  they serve many identical content fingerprints; resemblance =
  |shared| / |union| over per-host fingerprint sets.

All three reduce to: given a bipartite (key, item) relation, emit item
pairs by the number of shared keys plus the Jaccard of their key-sets.
Co-citation keys on the citing host, coupling on the cited host, mirror
detection on the content fingerprint.

Scale shape (100 TB):
- the ONLY pair-forming step is a key-keyed self-join whose per-key
  fan-out is hard-capped by ``max_degree`` (the hot-shingle anti-prune
  device from operators.dedup): a key attached to more than
  ``max_degree`` distinct items — a portal page linking everywhere, a
  boilerplate fingerprint served by thousands of hosts — carries no
  pairwise signal and is dropped BEFORE the join, so pair work is
  ≤ max_degree² per key, never quadratic in the corpus;
- degrees and shared counts are map-side-combinable integer groupBys;
- the final ranking is ``orderBy().limit(k)`` →
  TakeOrderedAndProject, no global sort.

Cross-engine determinism: every reported number is integer-domain
(shared counts, degrees, and ``jaccard_ppm = shared·10^6 DIV
(deg_a + deg_b − shared)`` by floor division), so results are
bit-identical under any partitioning or cluster size. Degrees are
counted over the SAME pruned universe the pairs form in, so the
Jaccard denominator is consistent with the intersection (documented:
pruned keys leave both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JACCARD_SCALE = 1_000_000


def pair_overlap(
    pairs: DataFrame,
    key_col: str = "key",
    item_col: str = "item",
    max_degree: int = 64,
    min_shared: int = 2,
    k: int = 20,
) -> DataFrame:
    """Item pairs ranked by shared-key count over a bipartite
    (key, item) relation.

    Returns (item_a, item_b, shared, deg_a, deg_b, jaccard_ppm), top
    ``k`` by (shared desc, jaccard_ppm desc, item_a, item_b) — a total
    order, so the limit boundary is deterministic. Keys attached to
    more than ``max_degree`` distinct items are dropped before the
    pair join; degrees are counted over the kept relation.
    """
    p = pairs.select(
        F.col(key_col).alias("key"), F.col(item_col).alias("item")
    ).filter(F.col("key").isNotNull() & F.col("item").isNotNull()).distinct()
    keydeg = p.groupBy("key").agg(F.count("*").alias("kd"))
    # kept feeds THREE branches (degrees + both join sides) — persisted
    # once so the distinct + prune shuffle runs once, not three times
    # (cache returned for release, the pagerank static-frame rule)
    kept = (
        p.join(keydeg.filter(F.col("kd") <= max_degree), "key")
        .select("key", "item")
        .persist()
    )
    deg = kept.groupBy("item").agg(F.count("*").alias("deg"))
    a = kept.select("key", F.col("item").alias("item_a"))
    b = kept.select("key", F.col("item").alias("item_b"))
    shared = (
        a.join(b, "key")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    da = deg.select(F.col("item").alias("item_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("item").alias("item_b"), F.col("deg").alias("deg_b"))
    jac = (F.col("shared") * JACCARD_SCALE).cast("long") / (
        F.col("deg_a") + F.col("deg_b") - F.col("shared")
    )
    return (
        shared.join(da, "item_a")
        .join(db, "item_b")
        .select(
            "item_a",
            "item_b",
            "shared",
            "deg_a",
            "deg_b",
            F.floor(jac).cast("long").alias("jaccard_ppm"),
        )
        .orderBy(
            F.desc("shared"), F.desc("jaccard_ppm"), "item_a", "item_b"
        )
        .limit(k)
    )


def sql_pair_overlap(
    pairs_sql: str,
    max_degree: int = 64,
    min_shared: int = 2,
    k: int = 20,
) -> str:
    """DuckDB twin of :func:`pair_overlap`; ``pairs_sql`` yields
    (key, item)."""
    return f"""
WITH p AS (SELECT DISTINCT key, item FROM ({pairs_sql})
           WHERE key IS NOT NULL AND item IS NOT NULL),
     keydeg AS (SELECT key, count(*) AS kd FROM p GROUP BY key),
     kept AS (SELECT p.key, p.item FROM p JOIN keydeg USING (key)
              WHERE kd <= {max_degree}),
     deg AS (SELECT item, CAST(count(*) AS BIGINT) AS deg FROM kept GROUP BY item),
     shared AS (
       SELECT a.item AS item_a, b.item AS item_b,
              CAST(count(*) AS BIGINT) AS shared
       FROM kept a JOIN kept b ON a.key = b.key AND a.item < b.item
       GROUP BY 1, 2
       HAVING count(*) >= {min_shared})
SELECT item_a, item_b, shared, da.deg AS deg_a, db.deg AS deg_b,
       CAST(shared * {JACCARD_SCALE} // (da.deg + db.deg - shared) AS BIGINT)
         AS jaccard_ppm
FROM shared
JOIN deg da ON item_a = da.item
JOIN deg db ON item_b = db.item
ORDER BY shared DESC, jaccard_ppm DESC, item_a, item_b
LIMIT {k}
"""


def _as_hosts(pairs: DataFrame) -> DataFrame:
    return pairs.withColumnRenamed("item_a", "host_a").withColumnRenamed(
        "item_b", "host_b"
    )


def sql_host_overlap(
    pairs_sql: str,
    max_degree: int = 64,
    min_shared: int = 2,
    k: int = 20,
) -> str:
    """sql_pair_overlap with the host-pair column names."""
    inner = sql_pair_overlap(
        pairs_sql, max_degree=max_degree, min_shared=min_shared, k=k
    )
    return (
        "SELECT item_a AS host_a, item_b AS host_b, shared, deg_a, deg_b, "
        f"jaccard_ppm FROM ({inner})"
    )


def cocitation_hosts(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    max_degree: int = 64,
    min_shared: int = 2,
    k: int = 20,
) -> DataFrame:
    """Co-citation related hosts (Dean & Henzinger 1999): pairs of
    hosts many common hosts link TO. key = citing host, item = cited
    host; ``max_degree`` drops portal hosts whose outlink set is too
    large to carry pairwise signal."""
    return _as_hosts(
        pair_overlap(
            edges.select(
                F.col(src_col).alias("key"), F.col(dst_col).alias("item")
            ),
            max_degree=max_degree,
            min_shared=min_shared,
            k=k,
        )
    )


def coupling_hosts(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    max_degree: int = 64,
    min_shared: int = 2,
    k: int = 20,
) -> DataFrame:
    """Bibliographic coupling (Kessler 1963): pairs of hosts that link
    OUT to the same hosts — the transpose of co-citation. key = cited
    host, item = citing host; ``max_degree`` drops celebrity targets
    (everyone links to them — no signal)."""
    return _as_hosts(
        pair_overlap(
            edges.select(
                F.col(dst_col).alias("key"), F.col(src_col).alias("item")
            ),
            max_degree=max_degree,
            min_shared=min_shared,
            k=k,
        )
    )


def mirror_hosts(
    docs: DataFrame,
    host_col: str = "host",
    fingerprint_col: str = "fingerprint",
    max_dup_hosts: int = 64,
    min_shared: int = 2,
    k: int = 20,
) -> DataFrame:
    """Bharat-Broder mirror candidates: host pairs ranked by shared
    content fingerprints; ``jaccard_ppm`` is the paper's resemblance
    |shared|/|union| in ppm. key = fingerprint, item = host;
    ``max_dup_hosts`` drops boilerplate fingerprints served by more
    hosts than a plausible mirror set."""
    return _as_hosts(
        pair_overlap(
            docs.select(
                F.col(fingerprint_col).alias("key"),
                F.col(host_col).alias("item"),
            ),
            max_degree=max_dup_hosts,
            min_shared=min_shared,
            k=k,
        )
    )
