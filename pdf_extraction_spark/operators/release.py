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
       COUNT(*) AS n_docs,
       SUM(nb) AS n_bytes,
       bit_xor(dg) AS xor_digest,
       MIN(id) AS min_doc_id,
       MAX(id) AS max_doc_id
FROM rows
GROUP BY shard
ORDER BY shard
"""
