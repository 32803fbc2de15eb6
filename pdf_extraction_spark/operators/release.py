"""Dataset-release sharding and integrity manifests.

The export side of the pipeline: a curated corpus ships as N shards
plus a manifest a consumer can verify without trusting the producer's
row order. Reference parity: the reference's export step is a single
sorted CSV/JSON dump per company (chunk_filter_categorizer.py's
filtered_results writes, simple_rag.py's load path) — one process, one
file, integrity by eyeball. At 10^12 documents the release needs (a) a
DETERMINISTIC shard assignment (re-running the export on a different
cluster layout must produce byte-identical shard membership) and (b)
an ORDER-INDEPENDENT per-shard digest (two machines can each verify a
shard they downloaded without agreeing on a row order first).

Both come from devices already pinned elsewhere in the repo:

* shard id = first 8 md5 hex chars of the salted doc id, mod
  ``n_shards`` — the md5-bucket predicate from stratified_sample /
  the sketch family: bit-identical in Spark and DuckDB, independent
  of partitioning, cluster size, and input order.
* per-doc digest = first 15 md5 hex chars (60 bits, int64-exact in
  both engines) of a canonical NULL-aware field encoding; the shard
  digest folds them with ``bit_xor`` — associative + commutative, so
  the map-side-combined aggregate is exact on any partitioning and
  two manifests of the same shard always agree. (XOR cancels PAIRS of
  identical rows; doc ids are unique by contract — the digest input
  starts with the id — so no two rows of one corpus ever cancel.)

Scale shape: one scan, narrow projections, ONE map-side-combinable
groupBy keyed on shard — the output is bounded by ``n_shards`` rows
regardless of corpus size, the same "broadcastable at any input size"
shape as the sketches. Manifests are mergeable: sub-corpus manifests
combine by summing counts/bytes, XOR-ing digests, min/max-ing the id
range — the property that lets every executor (or every daily crawl
increment) manifest independently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_shard",
    "manifest_agg",
    "shard_manifest",
    "merge_manifests",
    "sql_shard_manifest",
    "layout_gain",
    "sql_layout_gain",
]

# field separator for the canonical row encoding: a control char that
# the synthetic corpus and any sane doc id never contain; the 'v'/'n'
# value/NULL markers make ('', NULL) and (NULL, '') encode differently
_SEP = 31  # ASCII unit separator


def _enc(col: Column) -> Column:
    """NULL-aware canonical string of one field: 'v'||value or 'n'."""
    return F.when(col.isNull(), F.lit("n")).otherwise(
        F.concat(F.lit("v"), col.cast("string"))
    )


def shard_of(id_col: Column, n_shards: int) -> Column:
    """Deterministic shard id in [0, n_shards): first 8 md5 hex chars
    (32 uniform bits) of the salted id, mod n_shards. One home for the
    hash — the writer and the manifest MUST agree on membership."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("sh:"), id_col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % n_shards
    ).cast("int")


def _row_digest(cols: list) -> Column:
    """60-bit int64 digest of the canonical row encoding (15 md5 hex
    chars — exact in int64 on both engines; 16 would overflow)."""
    canon = F.concat_ws(chr(_SEP), *[_enc(c) for c in cols])
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("sm:"), canon)), 1, 15), 16, 10
    ).cast("long")


def with_shard(
    docs: DataFrame, n_shards: int, id_col: str = "doc_id"
) -> DataFrame:
    """Input plus a deterministic ``shard`` column — the writer path
    (``.write.partitionBy('shard')``). NULL-id rows are unaddressable
    and dropped, mirroring :func:`shard_manifest`."""
    return docs.filter(F.col(id_col).isNotNull()).withColumn(
        "shard", shard_of(F.col(id_col), n_shards)
    )


def manifest_agg(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple = ("lang", "source", "n_chars"),
) -> DataFrame:
    """The unordered manifest aggregation — shared by the batch
    :func:`shard_manifest` and the streaming variant
    (``streaming.manifest.streaming_shard_manifest``), so the two
    surfaces cannot drift. Every aggregate is associative and
    commutative, which is exactly what makes it valid as a streaming
    complete-mode aggregation with state bounded by ``n_shards``."""
    d = docs.filter(F.col(id_col).isNotNull())
    cols = [F.col(id_col), F.col(text_col)] + [F.col(c) for c in extra_cols]
    return (
        d.select(
            shard_of(F.col(id_col), n_shards).alias("shard"),
            _row_digest(cols).alias("dg"),
            F.coalesce(F.octet_length(F.col(text_col)), F.lit(0)).alias("nb"),
            F.col(id_col).alias("id"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nb").alias("n_bytes"),
            F.expr("bit_xor(dg)").alias("xor_digest"),
            F.min("id").alias("min_doc_id"),
            F.max("id").alias("max_doc_id"),
        )
    )


def shard_manifest(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple = ("lang", "source", "n_chars"),
) -> DataFrame:
    """(shard, n_docs, n_bytes, xor_digest, min_doc_id, max_doc_id):
    the release manifest. ``n_bytes`` is the UTF-8 octet length of the
    payload column (NULL payloads contribute 0); ``xor_digest`` folds
    the per-row digests over (id, payload, *extra_cols) so ANY field
    edit, row loss, or row injection flips the shard digest."""
    return manifest_agg(
        docs, n_shards, id_col, text_col, extra_cols
    ).orderBy("shard")


def merge_manifests(parts: DataFrame) -> DataFrame:
    """Fold sub-corpus manifests (a union of :func:`shard_manifest`
    outputs over disjoint doc sets) into the whole-corpus manifest:
    counts/bytes sum, digests XOR, id ranges min/max — exact because
    every column's fold is associative and commutative."""
    return (
        parts.groupBy("shard")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_bytes").alias("n_bytes"),
            F.expr("bit_xor(xor_digest)").alias("xor_digest"),
            F.min("min_doc_id").alias("min_doc_id"),
            F.max("max_doc_id").alias("max_doc_id"),
        )
        .orderBy("shard")
    )


def sql_shard_manifest(
    n_shards: int = 16,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple = ("lang", "source", "n_chars"),
) -> str:
    """DuckDB twin of :func:`shard_manifest` — same salted md5 shard
    hash, same canonical encoding, same 15-hex-char int64 digest, same
    bit_xor fold (integer end-to-end: no float convention anywhere)."""

    def enc(c: str) -> str:
        return (
            f"CASE WHEN {c} IS NULL THEN 'n' "
            f"ELSE 'v' || CAST({c} AS VARCHAR) END"
        )

    canon = f" || chr({_SEP}) || ".join(
        enc(c) for c in [id_col, text_col, *extra_cols]
    )
    return f"""
WITH rows AS (
  SELECT
    CAST((CAST('0x' || substr(md5('sh:' || CAST({id_col} AS VARCHAR)), 1, 8)
          AS BIGINT) % {n_shards}) AS INTEGER) AS shard,
    CAST('0x' || substr(md5('sm:' || ({canon})), 1, 15) AS BIGINT) AS dg,
    COALESCE(octet_length(encode({text_col})), 0) AS nb,
    {id_col} AS id
  FROM {table}
  WHERE {id_col} IS NOT NULL
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nb) AS BIGINT) AS n_bytes,
       CAST(bit_xor(dg) AS BIGINT) AS xor_digest,
       MIN(id) AS min_doc_id,
       MAX(id) AS max_doc_id
FROM rows
GROUP BY shard
ORDER BY shard
"""


# --- similarity-ordered shard layout ------------------------------------------
#
# Parquet/zstd compression of a text corpus depends heavily on ROW ORDER:
# writing near-duplicate documents adjacently lets the encoder's match
# window find the redundancy (the row-reordering trick from the
# column-store literature — Lemire & Kaser 2011's reordering results,
# BtrBlocks' locality observation). At release time the writer controls
# order for free, so the question is only "which order": this operator
# QUANTIFIES the gain of ordering a shard by SimHash signature instead of
# by document id, in exact integers both engines agree on — mean adjacent
# Hamming distance is a standard proxy for match-window locality (lower =
# neighboring rows share more content).
#
# Scale shape at 10^12 docs: shard = the manifest's md5 bucket (shard
# count grows with the corpus, shard SIZE is the bounded release-file
# target), so both window sorts partition by shard — bounded sort runs,
# no corpus-global window, no pair join. Output is n_shards rows.
# Everything is native: lag + bit_count(xor) per ordering, one groupBy.
#
# Columns per shard: n_docs, n_pairs (= n_docs - 1), sum_ham_sim /
# sum_ham_id (total adjacent Hamming bits under simhash order vs doc-id
# order), delta_bits = sum_ham_id - sum_ham_sim (signed; positive means
# the simhash layout wins). No division anywhere — Spark's `div`
# truncates toward zero while DuckDB's `//` floors, so a signed ratio
# would diverge on negative deltas; consumers divide.


def layout_gain(
    sigs: DataFrame,
    n_shards: int = 64,
    salt: str = "release",
    id_col: str = "doc_id",
    sig_col: str = "sig",
) -> DataFrame:
    """Per-shard adjacent-Hamming totals for simhash order vs id order
    over a (doc_id, sig) frame (e.g. dedup.native_simhash output)."""
    from pyspark.sql import Window

    from .curation import sample_bucket_col

    base = sigs.select(
        F.col(id_col).alias("doc_id"),
        F.col(sig_col).cast("long").alias("sig"),
        (sample_bucket_col(F.col(id_col), salt) % n_shards).alias("shard"),
    )
    w_sim = Window.partitionBy("shard").orderBy("sig", "doc_id")
    w_id = Window.partitionBy("shard").orderBy("doc_id")
    ham = lambda prev: F.bit_count(  # noqa: E731 — local spelling
        F.col("sig").bitwiseXOR(prev)
    ).cast("long")
    scored = base.select(
        "shard",
        ham(F.lag("sig").over(w_sim)).alias("ham_sim"),
        ham(F.lag("sig").over(w_id)).alias("ham_id"),
    )
    return scored.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.count("ham_sim").alias("n_pairs"),
        F.coalesce(F.sum("ham_sim"), F.lit(0).cast("long")).alias("sum_ham_sim"),
        F.coalesce(F.sum("ham_id"), F.lit(0).cast("long")).alias("sum_ham_id"),
        (
            F.coalesce(F.sum("ham_id"), F.lit(0).cast("long"))
            - F.coalesce(F.sum("ham_sim"), F.lit(0).cast("long"))
        ).alias("delta_bits"),
    )


def sql_layout_gain(
    sigs_select: str,
    n_shards: int = 64,
    salt: str = "release",
) -> str:
    """DuckDB twin of :func:`layout_gain` over a subquery yielding
    (doc_id, sig) — same md5 shard bucket, same two window orders."""
    from .curation import _sql_md5_bucket

    shard = f"({_sql_md5_bucket('doc_id', salt, 10000)} % {n_shards})"
    return (
        f"WITH s AS (SELECT doc_id, sig, {shard} AS shard "
        f"FROM ({sigs_select})), "
        "p AS (SELECT shard, "
        "bit_count(xor(sig, lag(sig) OVER (PARTITION BY shard "
        "ORDER BY sig, doc_id))) AS ham_sim, "
        "bit_count(xor(sig, lag(sig) OVER (PARTITION BY shard "
        "ORDER BY doc_id))) AS ham_id FROM s) "
        "SELECT shard, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(count(ham_sim) AS BIGINT) AS n_pairs, "
        "CAST(coalesce(sum(ham_sim), 0) AS BIGINT) AS sum_ham_sim, "
        "CAST(coalesce(sum(ham_id), 0) AS BIGINT) AS sum_ham_id, "
        "CAST(coalesce(sum(ham_id), 0) - coalesce(sum(ham_sim), 0) "
        "AS BIGINT) AS delta_bits "
        "FROM p GROUP BY shard"
    )


# ---------------------------------------------------------------------------
# Rendezvous (highest-random-weight) shard assignment
# ---------------------------------------------------------------------------
#
# Thaler & Ravishankar 1996 ("Using name-based mappings to increase hit
# rates") — the consistent-assignment alternative to `shard_of`'s
# mod-N bucket: each doc goes to argmax_shard h(doc, shard). The
# property mod-N cannot give (and the reason every distributed cache /
# object store uses HRW or ring hashing): REMOVING a shard moves ONLY
# the docs that lived on it — every other assignment is unchanged —
# while mod-N reshuffles ~(N−1)/N of the corpus. For a 10^12-doc
# release that gets re-balanced when a storage node retires, that is
# the difference between re-writing one shard and re-writing all of
# them.
#
# Weight = first 15 md5 hex chars (60 bits, int64-exact) of
# "<doc_id>:<shard_name>:<salt>" — the repo's md5-uniform device, so
# assignment is bit-identical in Spark and DuckDB, independent of
# partitioning and input order. The argmax runs over an inlined
# literal shard array (transform + array_max — shard lists are
# configuration, bounded, never data); a weight tie (two 60-bit md5
# collisions on one doc — effectively never) resolves to the
# lexicographically largest shard name in BOTH engines, because both
# compare the (weight, name) struct field-by-field.

HRW_SALT = "hrw-v1"


def hrw_weight(id_col: Column, shard: str, salt: str = HRW_SALT) -> Column:
    """60-bit int64 rendezvous weight of (doc, shard)."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat(
                    id_col.cast("string"), F.lit(":"), F.lit(shard),
                    F.lit(":"), F.lit(salt),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def hrw_assign(
    df: DataFrame,
    shards: list,
    id_col: str = "doc_id",
    salt: str = HRW_SALT,
) -> DataFrame:
    """Input plus ``shard`` = argmax over ``shards`` of the rendezvous
    weight — a pure narrow projection (no shuffle, no UDF)."""
    if not shards or len(set(shards)) != len(shards):
        raise ValueError("shards must be a non-empty list of distinct names")
    idc = F.col(id_col)
    pairs = F.array(
        *[
            F.struct(
                hrw_weight(idc, s, salt).alias("w"), F.lit(s).alias("name")
            )
            for s in sorted(shards)
        ]
    )
    best = F.array_max(pairs)
    return df.withColumn("shard", best["name"])


def hrw_shard_counts(
    df: DataFrame,
    shards: list,
    id_col: str = "doc_id",
    salt: str = HRW_SALT,
) -> DataFrame:
    """(shard, n_docs, min_id, max_id): the HRW load report — one
    map-side-combinable groupBy bounded by the shard list."""
    a = hrw_assign(df, shards, id_col=id_col, salt=salt)
    return a.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.min(F.col(id_col)).alias("min_id"),
        F.max(F.col(id_col)).alias("max_id"),
    )


def sql_hrw_shard_counts(
    shards: list,
    rel: str = "documents",
    id_expr: str = "doc_id",
    salt: str = HRW_SALT,
) -> str:
    """DuckDB twin of :func:`hrw_shard_counts` — same md5 weights,
    same struct-max tie order."""
    if not shards or len(set(shards)) != len(shards):
        raise ValueError("shards must be a non-empty list of distinct names")
    elems = ", ".join(
        "{'w': CAST('0x' || substr(md5(CAST(" + id_expr + " AS VARCHAR) || "
        f"':{s}:{salt}'), 1, 15) AS BIGINT), 'name': '{s}'}}"
        for s in sorted(shards)
    )
    return f"""
WITH a AS (SELECT {id_expr} AS doc_id,
                  list_max([{elems}]).name AS shard
           FROM {rel})
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS min_id, max(doc_id) AS max_id
FROM a GROUP BY shard
"""
