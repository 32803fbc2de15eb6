"""Mergeable sketches over md5 — HyperLogLog distinct counting and
Count-Min heavy hitters, bit-identical across engines.

Spark ships `approx_count_distinct`, but its HLL++ sketch is an engine
internal: it can never be oracled, and its estimates are not
reproducible outside the JVM. These sketches derive every register from
``md5`` (the repo's cross-engine hash), so the SKETCH ITSELF — not just
the estimate — is bit-identical in Spark and DuckDB, reproducible
across runs and cluster sizes, and mergeable by construction:

* **HLL** (Flajolet et al. 2007): register = first ``p`` hex chars of
  md5(value); rank = leading-zero bits of the next 15 hex chars (60
  uniform bits) + 1, computed with pure STRING ops (TRIM LEADING '0' +
  a 15-way CASE on the first non-zero digit) — no float log2 whose
  boundary rounding could flip a register cross-engine. The sketch is
  one groupBy(register).max(rank): max is associative/commutative, so
  partial aggregation and any merge order give the same registers —
  union of corpora = max of sketches (pinned by test).
* **Estimate**: αm²/Σ2^−M over all m registers. Each 2^−M term is an
  exact dyadic double built by integer shift (no pow()); the Σ is a
  register-ordered fold over the BOUNDED (≤ m = 16^p rows) sketch, so
  the denominator is bit-identical everywhere. The small-range
  linear-counting branch rounds its ln() to 6 digits BEFORE scaling by
  m — the engines' ln() disagree by ~1e-10 (far beyond 1 ulp; measured)
  and m multiplies that drift.
* **Count-Min** (Cormode & Muthukrishnan 2005): d salted md5 rows ×
  w columns of exact integer sums (associative — one groupBy, map-side
  combined); a key's estimate is the min over its d cells. Integer
  end-to-end: parity needs no float convention at all.

Scale shape: both sketches are ONE scan of the input + one groupBy
whose output is bounded by the sketch size (m or d·w rows), never by
the corpus — the canonical "fits in one broadcast at any input size"
aggregation (CMS fans each row into its d cells via a literal-array
explode inside the same scan). At 10^12 docs the shuffle carries at
most sketch-size rows per partial.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_P_HEX = 3  # register address = 3 hex chars -> m = 4096 registers
HLL_RANK_HEX = 15  # 60 uniform bits for the rank field
CMS_DEPTH = 4
CMS_WIDTH = 1024  # cell = first 8 md5 hex chars (32 bits) mod width;
# 2^32 % 1024 == 0, so the mod is exactly uniform
BLOOM_BITS = 1 << 17  # m = 131,072 bit positions (2^32 % m == 0 — uniform)
BLOOM_HASHES = 4


def _hll_alpha_m2(m: int) -> float:
    return (0.7213 / (1.0 + 1.079 / m)) * m * m


def _rank_case(first_digit: Column) -> Column:
    """Extra leading-zero BITS contributed by the first non-zero hex
    digit (1 → 3 bits, 2-3 → 2, 4-7 → 1, 8-f → 0)."""
    return (
        F.when(first_digit == "1", 3)
        .when(first_digit.isin("2", "3"), 2)
        .when(first_digit.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )


def hll_sketch(
    df: DataFrame, value: Column, p_hex: int = HLL_P_HEX
) -> DataFrame:
    """(register, max_rank): the HLL sketch of a value column. NULLs
    are skipped (md5(NULL) is NULL in both engines). Bounded by
    16^p_hex rows; merge two sketches with groupBy(register).max."""
    # staged selects keep one md5 evaluation per row
    base = df.select(value.cast("string").alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    base = base.select(F.md5("__v").alias("h"))
    reg = F.substring(F.col("h"), 1, p_hex)
    tail = F.substring(F.col("h"), p_hex + 1, HLL_RANK_HEX)
    stripped = F.expr(f"trim(LEADING '0' FROM substring(h, {p_hex + 1}, {HLL_RANK_HEX}))")
    nz_hex = F.length(tail) - F.length(stripped)
    rank = F.when(stripped == "", 4 * HLL_RANK_HEX + 1).otherwise(
        4 * nz_hex + _rank_case(F.substring(stripped, 1, 1)) + 1
    )
    return (
        base.select(reg.alias("register"), rank.alias("rank"))
        .groupBy("register")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_estimate(sketch: DataFrame, p_hex: int = HLL_P_HEX) -> DataFrame:
    """One row (n_registers, est_distinct) from a sketch frame.

    The harmonic denominator folds exact dyadic 2^−rank terms in
    register order (the sketch is bounded, so the single-group
    aggregation is legal); absent registers contribute 1.0 each, added
    as one exact product. Small-range linear counting rounds ln() to 6
    digits before scaling by m (see module docstring)."""
    m = 16**p_hex
    terms = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("register"),
                # exact dyadic 2^-rank by integer shift (SQL form: the
                # Python shiftleft() binding takes only literal counts)
                F.expr(
                    "1.0 / cast(shiftleft(1L, max_rank) as double)"
                ).alias("t"),
            )
        )
    )
    agg = sketch.agg(
        F.count("*").alias("present"),
        F.aggregate(
            F.transform(terms, lambda s: s["t"]), F.lit(0.0), lambda a, x: a + x
        ).alias("hsum"),
    )
    est_raw = F.lit(_hll_alpha_m2(m)) / (
        F.col("hsum") + (F.lit(m) - F.col("present")).cast("double")
    )
    zeros = F.lit(m) - F.col("present")
    linear = F.lit(float(m)) * F.round(
        F.log(F.lit(float(m)) / zeros.cast("double")), 6
    )
    est = F.when(
        (est_raw <= F.lit(2.5 * m)) & (zeros > 0), linear
    ).otherwise(est_raw)
    return agg.select(
        F.col("present").alias("n_registers"),
        (F.round(est, 4) + F.lit(0.0)).alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame, value: Column, p_hex: int = HLL_P_HEX
) -> DataFrame:
    """Convenience: sketch + estimate in one call."""
    return hll_estimate(hll_sketch(df, value, p_hex), p_hex)


# -- grouped HLL: one sketch PER KEY ----------------------------------------
#
# The relational form of "approx_count_distinct(x) GROUP BY k" that can
# actually be oracled: per-host distinct URLs, per-source vocabulary
# size, per-language shingle counts. Default p_hex=2 (m=256 registers,
# ~6.5% std error) — the grouped sketch costs m rows PER KEY, so the
# grouped default trades one hex digit of address space for 16× less
# state than the global sketch's 4096. Scale shape: one scan + one
# (key, register) groupBy bounded by n_keys·m rows, then a per-key fold
# over ≤ m collected structs — never corpus-sized in either stage; max
# is associative/commutative so shard sketches merge exactly.

HLL_GROUP_P_HEX = 2


def hll_sketch_by(
    df: DataFrame, key_col: str, value: Column, p_hex: int = HLL_GROUP_P_HEX
) -> DataFrame:
    """(key, register, max_rank): one HLL sketch per key. NULL values
    are skipped; a NULL key groups as its own single key (same rule in
    the twin's GROUP BY). Merge shard sketches with
    groupBy(key, register).max(max_rank)."""
    base = df.select(
        F.col(key_col).alias("__k"), value.cast("string").alias("__v")
    ).filter(F.col("__v").isNotNull())
    base = base.select("__k", F.md5("__v").alias("h"))
    reg = F.substring(F.col("h"), 1, p_hex)
    stripped = F.expr(
        f"trim(LEADING '0' FROM substring(h, {p_hex + 1}, {HLL_RANK_HEX}))"
    )
    tail = F.substring(F.col("h"), p_hex + 1, HLL_RANK_HEX)
    nz_hex = F.length(tail) - F.length(stripped)
    rank = F.when(stripped == "", 4 * HLL_RANK_HEX + 1).otherwise(
        4 * nz_hex + _rank_case(F.substring(stripped, 1, 1)) + 1
    )
    return (
        base.select(
            F.col("__k").alias(key_col),
            reg.alias("register"),
            rank.alias("rank"),
        )
        .groupBy(key_col, "register")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_estimate_by(
    sketch: DataFrame, key_col: str, p_hex: int = HLL_GROUP_P_HEX
) -> DataFrame:
    """(key, n_registers, est_distinct): the per-key estimate — the
    identical fold, branch and rounding points as :func:`hll_estimate`,
    with the single-group agg replaced by groupBy(key). The collected
    term array is ≤ m structs per key by construction."""
    m = 16**p_hex
    terms = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("register"),
                F.expr(
                    "1.0 / cast(shiftleft(1L, max_rank) as double)"
                ).alias("t"),
            )
        )
    )
    agg = sketch.groupBy(key_col).agg(
        F.count("*").alias("present"),
        F.aggregate(
            F.transform(terms, lambda s: s["t"]), F.lit(0.0), lambda a, x: a + x
        ).alias("hsum"),
    )
    est_raw = F.lit(_hll_alpha_m2(m)) / (
        F.col("hsum") + (F.lit(m) - F.col("present")).cast("double")
    )
    zeros = F.lit(m) - F.col("present")
    linear = F.lit(float(m)) * F.round(
        F.log(F.lit(float(m)) / zeros.cast("double")), 6
    )
    est = F.when(
        (est_raw <= F.lit(2.5 * m)) & (zeros > 0), linear
    ).otherwise(est_raw)
    return agg.select(
        key_col,
        F.col("present").alias("n_registers"),
        (F.round(est, 4) + F.lit(0.0)).alias("est_distinct"),
    )


def hll_distinct_by(
    df: DataFrame,
    key_col: str,
    value: Column,
    p_hex: int = HLL_GROUP_P_HEX,
) -> DataFrame:
    """Convenience: per-key sketch + estimate in one call."""
    return hll_estimate_by(hll_sketch_by(df, key_col, value, p_hex), key_col, p_hex)


def sql_hll_distinct_by(
    key_expr: str,
    value_expr: str,
    from_clause: str,
    p_hex: int = HLL_GROUP_P_HEX,
    key_alias: str = "key",
) -> str:
    """DuckDB twin of :func:`hll_distinct_by` — same registers, rank
    string math, per-key register-ordered fold, branch and rounding."""
    m = 16**p_hex
    rk = HLL_RANK_HEX
    return (
        f"WITH v AS (SELECT {key_expr} AS k, "
        f"md5(CAST({value_expr} AS VARCHAR)) AS h "
        f"FROM {from_clause} WHERE {value_expr} IS NOT NULL), "
        f"r AS (SELECT k, substr(h, 1, {p_hex}) AS register, "
        f"CASE WHEN trim(LEADING '0' FROM substr(h, {p_hex + 1}, {rk})) = '' "
        f"THEN {4 * rk + 1} ELSE "
        f"4 * ({rk} - length(trim(LEADING '0' FROM substr(h, {p_hex + 1}, {rk})))) + "
        f"(CASE substr(trim(LEADING '0' FROM substr(h, {p_hex + 1}, {rk})), 1, 1) "
        "WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2 "
        "WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1 "
        "ELSE 0 END) + 1 END AS rank FROM v), "
        "s AS (SELECT k, register, max(rank) AS max_rank FROM r "
        "GROUP BY k, register), "
        "a AS (SELECT k, count(*) AS present, "
        "list_reduce(list_prepend(0.0, list(1.0 / CAST((CAST(1 AS BIGINT) "
        "<< max_rank) AS DOUBLE) ORDER BY register)), (x, y) -> x + y) AS hsum "
        "FROM s GROUP BY k) "
        f"SELECT k AS {key_alias}, CAST(present AS BIGINT) AS n_registers, "
        "(round(CASE WHEN "
        f"{_hll_alpha_m2(m)!r} / (hsum + CAST({m} - present AS DOUBLE)) "
        f"<= {2.5 * m!r} AND {m} - present > 0 "
        f"THEN {float(m)!r} * round(ln({float(m)!r} / "
        f"CAST({m} - present AS DOUBLE)), 6) "
        f"ELSE {_hll_alpha_m2(m)!r} / (hsum + CAST({m} - present AS DOUBLE)) "
        "END, 4) + 0.0) AS est_distinct FROM a"
    )


def sql_hll_distinct(
    value_expr: str, from_clause: str, p_hex: int = HLL_P_HEX
) -> str:
    """DuckDB twin of :func:`hll_distinct` — same registers, same rank
    string math, same register-ordered dyadic fold, same branch and
    rounding points."""
    m = 16**p_hex
    rk = HLL_RANK_HEX
    return (
        f"WITH v AS (SELECT md5(CAST({value_expr} AS VARCHAR)) AS h "
        f"FROM {from_clause} WHERE {value_expr} IS NOT NULL), "
        f"r AS (SELECT substr(h, 1, {p_hex}) AS register, "
        f"CASE WHEN trim(LEADING '0' FROM substr(h, {p_hex + 1}, {rk})) = '' "
        f"THEN {4 * rk + 1} ELSE "
        f"4 * ({rk} - length(trim(LEADING '0' FROM substr(h, {p_hex + 1}, {rk})))) + "
        f"(CASE substr(trim(LEADING '0' FROM substr(h, {p_hex + 1}, {rk})), 1, 1) "
        "WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2 "
        "WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1 "
        "ELSE 0 END) + 1 END AS rank FROM v), "
        "s AS (SELECT register, max(rank) AS max_rank FROM r GROUP BY register), "
        "a AS (SELECT count(*) AS present, "
        "list_reduce(list_prepend(0.0, list(1.0 / CAST((CAST(1 AS BIGINT) "
        "<< max_rank) AS DOUBLE) ORDER BY register)), (x, y) -> x + y) AS hsum "
        "FROM s) "
        "SELECT CAST(present AS BIGINT) AS n_registers, "
        "(round(CASE WHEN "
        f"{_hll_alpha_m2(m)!r} / (hsum + CAST({m} - present AS DOUBLE)) "
        f"<= {2.5 * m!r} AND {m} - present > 0 "
        f"THEN {float(m)!r} * round(ln({float(m)!r} / "
        f"CAST({m} - present AS DOUBLE)), 6) "
        f"ELSE {_hll_alpha_m2(m)!r} / (hsum + CAST({m} - present AS DOUBLE)) "
        "END, 4) + 0.0) AS est_distinct FROM a"
    )


# ---------------------------------------------------------------------------
# Count-Min heavy hitters
# ---------------------------------------------------------------------------

def cms_sketch(
    df: DataFrame,
    value: Column,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(row, col, c): the Count-Min table — one groupBy over d stacked
    salted hash projections, exact integer sums, d·w rows total.
    ONE scan of the input: the d cells per row arrive via an explode of
    a d-element literal array, not d unionAll branches (Spark does not
    share scans across a union — the upstream pipeline would run d
    times)."""
    base = df.select(value.cast("string").alias("key")).filter(
        F.col("key").isNotNull()
    )
    return (
        base.select(F.explode(_cms_cells(F.col("key"), depth, width)).alias("rc"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
        .agg(F.count("*").alias("c"))
    )


def _cms_col(r: int, key: Column, width: int) -> Column:
    """Cell column of ``key`` in salted row ``r``: first 8 hex chars of
    md5('cms{r}:'‖key) — 32 uniform bits — mod width. ONE home for the
    hash so sketch cells and point-query probes can never drift (a
    probe hashing differently from the sketch silently breaks the
    never-undercount guarantee)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cms{r}:"), key)), 1, 8), 16, 10
        ).cast("long")
        % width
    )


def _cms_cells(key: Column, depth: int, width: int) -> Column:
    """[(row, col)] literal-array of a key's d cells."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("row"), _cms_col(r, key, width).alias("col")
            )
            for r in range(depth)
        ]
    )


def _sql_cms_col(r: int, key_expr: str, width: int) -> str:
    """DuckDB twin of :func:`_cms_col`."""
    return (
        f"(CAST('0x' || substr(md5('cms{r}:' || {key_expr}), 1, 8) AS BIGINT) "
        f"% {width})"
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame,
                 depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """(key, est): min-over-rows cell lookup for each key in the
    ``keys`` frame's ``key`` column — the CMS point query (an
    over-estimate, never under). The sketch is bounded (d·w rows) and
    broadcast."""
    k = keys.select(F.col("key").cast("string").alias("key")).filter(
        F.col("key").isNotNull()
    ).distinct()
    probes = k.select(
        "key", F.explode(_cms_cells(F.col("key"), depth, width)).alias("rc")
    ).select("key", F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
    joined = probes.join(F.broadcast(sketch), ["row", "col"], "left")
    return joined.groupBy("key").agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est")
    )


def cms_heavy_hitters(
    df: DataFrame,
    value: Column,
    k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(key, est, exact): top-k keys by CMS estimate (ties by key) with
    the exact count alongside — integer end-to-end, so the oracle twin
    is bit-trivial; est >= exact always (CMS never under-counts).

    The corpus is scanned ONCE into the exact (key, count) table —
    bounded by distinct keys — and the sketch cells, probes, and exact
    column all derive from that persisted frame (summing pre-grouped
    counts into cells is arithmetically identical to counting raw
    rows)."""
    kc = (
        df.select(value.cast("string").alias("key"))
        .filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.count("*").alias("exact"))
        .persist()
    )
    sk = (
        kc.select(
            "exact", F.explode(_cms_cells(F.col("key"), depth, width)).alias("rc")
        )
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
        .agg(F.sum("exact").alias("c"))
    )
    est = cms_estimate(sk, kc.select("key"), depth, width)
    return (
        est.join(kc, "key")
        .orderBy(F.desc("est"), F.asc("key"))
        .limit(k)
    )


def sql_cms_heavy_hitters(
    value_expr: str,
    from_clause: str,
    k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    """DuckDB twin of :func:`cms_heavy_hitters` — same shared cell
    hash (:func:`_sql_cms_col`), same single (key, count) base, same
    integer mins, same tie order."""
    cells = " UNION ALL ".join(
        f"SELECT key, exact, {r} AS row, {_sql_cms_col(r, 'key', width)} AS col "
        "FROM kc"
        for r in range(depth)
    )
    return (
        f"WITH v AS (SELECT CAST({value_expr} AS VARCHAR) AS key "
        f"FROM {from_clause} WHERE {value_expr} IS NOT NULL), "
        "kc AS MATERIALIZED (SELECT key, count(*) AS exact FROM v GROUP BY key), "
        f"cells AS MATERIALIZED ({cells}), "
        "sk AS (SELECT row, col, sum(exact) AS c FROM cells GROUP BY row, col), "
        "est AS (SELECT cells.key, min(coalesce(sk.c, 0)) AS est "
        "FROM cells LEFT JOIN sk USING (row, col) GROUP BY cells.key) "
        "SELECT est.key, CAST(est.est AS BIGINT) AS est, "
        "CAST(kc.exact AS BIGINT) AS exact "
        "FROM est JOIN kc USING (key) "
        f"ORDER BY est DESC, key LIMIT {k}"
    )


# ---------------------------------------------------------------------------
# Bloom filter — the no-false-negative membership prefilter
# ---------------------------------------------------------------------------

def _bloom_pos(r: int, key: Column, m_bits: int) -> Column:
    """Bit position of ``key`` in salted hash row ``r``: first 8 hex
    chars of md5('bf{r}:'‖key) — 32 uniform bits — mod m_bits (a power
    of two, so the mod is exactly uniform). ONE home for the hash, the
    CMS lesson: sketch bits and probe bits must come from the same
    function or the no-false-negative guarantee silently breaks."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"bf{r}:"), key)), 1, 8), 16, 10
        ).cast("long")
        % m_bits
    )


def _bloom_positions(key: Column, n_hashes: int, m_bits: int) -> Column:
    """[pos] literal-array of a key's bit positions."""
    return F.array(*[_bloom_pos(r, key, m_bits) for r in range(n_hashes)])


def bloom_sketch(
    df: DataFrame,
    value: Column,
    n_hashes: int = BLOOM_HASHES,
    m_bits: int = BLOOM_BITS,
) -> DataFrame:
    """(pos): the set bit positions of a Bloom filter over a value
    column (Bloom 1970) — bounded by min(n_hashes·n_keys, m_bits) rows,
    mergeable by union+distinct (bit-OR of filters == union of key
    sets; pinned by test). NULLs are skipped (md5(NULL) is NULL in both
    engines). Integer end-to-end: the sketch is bit-identical
    cross-engine with no float convention anywhere."""
    base = df.select(value.cast("string").alias("key")).filter(
        F.col("key").isNotNull()
    )
    return (
        base.select(
            F.explode(_bloom_positions(F.col("key"), n_hashes, m_bits)).alias(
                "pos"
            )
        )
        .distinct()
    )


def bloom_probe(
    sketch: DataFrame,
    keys: DataFrame,
    n_hashes: int = BLOOM_HASHES,
    m_bits: int = BLOOM_BITS,
) -> DataFrame:
    """(key, maybe): the membership probe — ``maybe`` is true iff ALL
    n_hashes positions of ``key`` are set. Never a false negative;
    false-positive rate ≈ (1 − e^{−kn/m})^k. The sketch is bounded
    (≤ m_bits rows) and broadcast; NULL keys probe false."""
    k = (
        keys.select(F.col("key").cast("string").alias("key"))
        .filter(F.col("key").isNotNull())
        .distinct()
    )
    probes = k.select(
        "key",
        F.explode(_bloom_positions(F.col("key"), n_hashes, m_bits)).alias("pos"),
    )
    hits = probes.join(
        F.broadcast(sketch.withColumn("__set", F.lit(True))), ["pos"], "left"
    )
    return hits.groupBy("key").agg(
        (F.count(F.col("__set")) == F.lit(n_hashes)).alias("maybe")
    )


def bloom_dedup_flags(
    incoming: DataFrame,
    history: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = BLOOM_HASHES,
    m_bits: int = BLOOM_BITS,
) -> DataFrame:
    """(id, maybe_dup, is_dup): the Bloom-prefiltered incremental
    exact-dedup gate — the production shape for "is this crawl doc
    already in the corpus" at 10^12 history docs, where the history
    keys themselves are too big to broadcast but the Bloom BITS
    (≤ m_bits rows) always fit.

    ``maybe_dup`` is the Bloom probe of the incoming doc's text against
    the history sketch; ``is_dup`` is the EXACT verdict, computed by
    joining history keys against ONLY the maybe_dup survivors — no
    false negatives means the recheck set loses nothing, so the result
    is exact while the expensive key join is bounded by true-dup count
    + the FP rate, not the corpus. Rows with NULL text are kept with
    both flags false (a NULL is never a duplicate — the exact-dedup
    convention)."""
    hist_keys = history.select(
        F.col(text_col).cast("string").alias("key")
    ).filter(F.col("key").isNotNull()).distinct()
    sketch = bloom_sketch(hist_keys, F.col("key"), n_hashes, m_bits)
    inc = incoming.select(
        F.col(id_col).alias("__id"), F.col(text_col).cast("string").alias("key")
    )
    probed = (
        inc.join(
            bloom_probe(sketch, inc.select("key"), n_hashes, m_bits),
            ["key"],
            "left",
        )
        .select(
            "__id", "key", F.coalesce("maybe", F.lit(False)).alias("maybe_dup")
        )
        # consumed twice (candidate derivation + final verdict join);
        # persisting costs one corpus-sized cache, recomputing costs a
        # second full probe pass — same tradeoff as cms_heavy_hitters
        .persist()
    )
    # exact recheck bounded to the survivors: history side is semi-joined
    # down to candidate keys before the verdict join
    cand = probed.filter(F.col("maybe_dup")).select("key").distinct()
    true_dups = hist_keys.join(cand, ["key"], "left_semi").withColumn(
        "__dup", F.lit(True)
    )
    return (
        probed.join(true_dups, ["key"], "left")
        .select(
            F.col("__id").alias(id_col),
            "maybe_dup",
            F.coalesce("__dup", F.lit(False)).alias("is_dup"),
        )
    )


def _sql_bloom_pos(r: int, key_expr: str, m_bits: int) -> str:
    """DuckDB twin of :func:`_bloom_pos`."""
    return (
        f"(CAST('0x' || substr(md5('bf{r}:' || {key_expr}), 1, 8) AS BIGINT) "
        f"% {m_bits})"
    )


def sql_bloom_dedup_flags(
    incoming_rel: str,
    history_rel: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    n_hashes: int = BLOOM_HASHES,
    m_bits: int = BLOOM_BITS,
) -> str:
    """DuckDB twin of :func:`bloom_dedup_flags` — same salted position
    hash, same all-k-positions probe, same NULL conventions. The
    relations are SQL fragments selecting (id, text)-shaped rows."""
    hist_pos = " UNION ALL ".join(
        f"SELECT {_sql_bloom_pos(r, 'key', m_bits)} AS pos FROM hkeys"
        for r in range(n_hashes)
    )
    probe_pos = " UNION ALL ".join(
        f"SELECT key, {_sql_bloom_pos(r, 'key', m_bits)} AS pos FROM ikeys"
        for r in range(n_hashes)
    )
    return (
        f"WITH hkeys AS MATERIALIZED (SELECT DISTINCT CAST({text_expr} AS VARCHAR) AS key "
        f"FROM {history_rel} WHERE {text_expr} IS NOT NULL), "
        f"inc AS MATERIALIZED (SELECT {id_expr} AS __id, "
        f"CAST({text_expr} AS VARCHAR) AS key FROM {incoming_rel}), "
        "ikeys AS MATERIALIZED (SELECT DISTINCT key FROM inc WHERE key IS NOT NULL), "
        f"sketch AS MATERIALIZED (SELECT DISTINCT pos FROM ({hist_pos})), "
        f"probes AS (SELECT key, pos FROM ({probe_pos})), "
        "probed AS (SELECT p.key, "
        f"count(s.pos) = {n_hashes} AS maybe FROM probes p "
        "LEFT JOIN sketch s ON p.pos = s.pos GROUP BY p.key) "
        "SELECT inc.__id AS doc_id, "
        "coalesce(probed.maybe, FALSE) AS maybe_dup, "
        "coalesce(probed.maybe, FALSE) AND inc.key IN (SELECT key FROM hkeys) "
        "AS is_dup "
        "FROM inc LEFT JOIN probed USING (key)"
    )


# ---------------------------------------------------------------------------
# HDR histogram quantile sketch
# ---------------------------------------------------------------------------
#
# The fourth mergeable sketch: percentile estimation over non-negative
# integers (doc lengths, token counts, latency-style metrics) with
# HdrHistogram-style base-2 bucketing (Tene, HdrHistogram; the integer
# sibling of DDSketch's log-γ buckets, which need float log and so can
# flip a bucket cross-engine at boundaries). Values < 64 get EXACT
# bins; larger values bin by (binary magnitude, top-6-bits) so relative
# error is bounded by 2^-5 ≈ 3.1%. Everything is integer bit math —
# the bin id, the bin lower bound, the cumulative ranks — so the sketch
# AND every quantile estimate are bit-identical across engines,
# partitionings and cluster sizes with no float convention at all.
#
# Scale shape: one scan + one groupBy bounded by the bin space (64 +
# 64·octaves ≈ a few hundred rows for any realistic value range, never
# corpus-sized). Merging shard sketches = bin-keyed integer sum (exact,
# associative, commutative — pinned by test). The quantile lookup runs
# a running-sum window over the SKETCH, which is metadata-sized by
# construction — the compaction_plan precedent.


# The bin id / lower bound are SQL expr fragments (not Column helpers)
# because pyspark's shiftright/shiftleft function API only takes a
# Python-int bit count — the SQL forms accept a column. Both engines
# get the identical integer bit math.
_HIST_BIN = (
    "CASE WHEN {v} < 64 THEN {v} "
    "ELSE length(bin({v})) * 64 + "
    "shiftright({v}, cast(length(bin({v})) - 6 AS INT)) END"
)
_HIST_LB = (
    "CASE WHEN {b} < 64 THEN {b} "
    "ELSE shiftleft({b} % 64, cast({b} div 64 - 6 AS INT)) END"
)


def histogram_sketch(
    df: DataFrame, value_col: str, bin_col: str = "bin"
) -> DataFrame:
    """(bin, n): the mergeable HDR sketch of a non-negative integer
    column. The bin id is v itself below 64, else (binary_length · 64 +
    top-6-bits) — length(bin(v)) is the exact integer floor(log2 v)+1,
    string-based but branch-free and identical cross-engine (no float
    log2 boundary rounding). NULL and negative values are excluded
    (counted by the caller if needed); merge shard sketches with
    :func:`merge_histograms`."""
    v = F.col(value_col).cast("long")
    return (
        df.filter(v.isNotNull() & (v >= 0))
        .select(v.alias("__hv"))
        .select(F.expr(_HIST_BIN.format(v="__hv")).alias(bin_col))
        .groupBy(bin_col)
        .agg(F.count("*").alias("n"))
    )


def merge_histograms(*sketches: DataFrame) -> DataFrame:
    """Union of corpora == bin-keyed sum of sketches (exact integer —
    any merge order, any shard split)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bin").agg(F.sum("n").alias("n"))


def histogram_quantiles(
    sketch: DataFrame, q_milles: list[int]
) -> DataFrame:
    """(q_mille, est, n_total): per-mille quantile estimates from the
    sketch — est is the LOWER BOUND of the first bin whose cumulative
    count reaches ceil(q·N/1000) (the conservative value form; true
    quantile is within [est, est·(1+2^-5)) for est ≥ 64, exact below).
    Integer end-to-end: rank thresholds by ceil-division
    ((q·N + 999) div 1000), cumulative counts by a running-sum window
    over the bin-ordered SKETCH (bounded rows — the honest window)."""
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        "bin", "n", F.sum("n").over(w).alias("cum"), F.sum("n").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_total"),
    )
    qs = sketch.sparkSession.createDataFrame(
        [(int(q),) for q in q_milles], "q_mille int"
    )
    # `div` (not `/`) keeps the rank threshold in exact int64 — float
    # division would round q·N above 2^53 at real corpus counts.
    rank = F.expr("(cast(q_mille AS BIGINT) * n_total + 999) div 1000")
    hit = (
        qs.crossJoin(F.broadcast(cum))
        .filter(F.col("cum") >= rank)
        .groupBy("q_mille")
        .agg(
            F.min(F.struct(F.col("bin"), F.col("n_total"))).alias("h")
        )
    )
    return hit.select(
        "q_mille",
        F.col("h")["bin"].alias("__hb"),
        F.col("h")["n_total"].alias("n_total"),
    ).select(
        "q_mille",
        F.expr(_HIST_LB.format(b="__hb")).cast("long").alias("est"),
        "n_total",
    )


def sql_histogram_quantiles(
    value_expr: str, table: str, q_milles: list[int]
) -> str:
    """DuckDB twin of histogram_sketch → histogram_quantiles — the
    identical bit math: length(bin(v)) magnitude, >> top-6 bin, << lower
    bound, ceil-division rank, running-sum window over the bounded
    sketch."""
    qlist = ", ".join(f"({int(q)})" for q in q_milles)
    return (
        f"WITH vals AS (SELECT CAST({value_expr} AS BIGINT) AS v FROM {table} "
        f"WHERE {value_expr} IS NOT NULL AND {value_expr} >= 0), "
        "binned AS (SELECT CASE WHEN v < 64 THEN v "
        "ELSE length(bin(v)) * 64 + (v >> (length(bin(v)) - 6)) END AS bin "
        "FROM vals), "
        "sk AS (SELECT bin, count(*) AS n FROM binned GROUP BY bin), "
        "cum AS (SELECT bin, n, "
        "sum(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
        "sum(n) OVER () AS n_total FROM sk), "
        f"qs AS (SELECT * FROM (VALUES {qlist}) t(q_mille)), "
        "hit AS (SELECT q_mille, min(bin) AS bin, min(n_total) AS n_total "
        "FROM qs, cum "
        "WHERE cum >= (CAST(q_mille AS BIGINT) * n_total + 999) // 1000 "
        "GROUP BY q_mille) "
        "SELECT CAST(q_mille AS INT) AS q_mille, "
        "CAST(CASE WHEN bin < 64 THEN bin "
        "ELSE (bin % 64) * (1::BIGINT << CAST(bin // 64 - 6 AS INT)) END AS BIGINT) AS est, "
        "CAST(n_total AS BIGINT) AS n_total FROM hit"
    )


# ---------------------------------------------------------------------------
# AMS F2 sketch (Alon, Matias & Szegedy 1996; the bucketed "fast AMS" /
# Count-Sketch estimator of Thorup & Zhang 2004)
# ---------------------------------------------------------------------------
#
# The second frequency moment F2 = sum_x f(x)^2 — the repetitiveness /
# self-join-size moment (Gini-of-frequencies' quadratic cousin, the
# quantity that prices every frequency-keyed join and detects
# template floods) — estimated from a (depth x width) table of SIGNED
# counter sums: in row r, item x lands in bucket md5('ams{r}:'||x)
# 32-bit prefix mod width with sign +-1 from the NEXT md5 hex digit's
# parity (same hash string, disjoint bits — one md5 per (row, item)).
# Per row Y_r = sum_b S[r][b]^2 is an unbiased F2 estimate with
# Var <= 2*F2^2/width; the output is the lower median over the depth
# rows (exact integer — no float convention anywhere in the operator).
#
# The fourth md5-register sketch, same contracts as HLL/CMS/histogram:
# registers from md5 so the SKETCH is bit-identical cross-engine;
# integer end-to-end; one scan + one groupBy bounded by depth*width
# rows at ANY corpus size; shard sketches merge by plain (row, bucket)
# integer SUM (signed counters are associative/commutative — pinned),
# so 1000 executors sketch independently. The exact F2 rides along
# (one vocabulary-sized groupBy — the Yule-K identity) so the query is
# self-evaluating: est vs exact vs rel_err_ppm in one row.
#
# Overflow: |S[r][b]| <= N (all mass one bucket, worst case) and
# Y_r <= N^2 — exact for corpora to ~3e9 tokens; beyond that the
# expected |S| ~ sqrt(F2/width) keeps real sums far inside int64
# (documented, same class as the entropy-device bound).

AMS_DEPTH = 5  # odd, so the median is a real row estimate
AMS_WIDTH = 64


def _ams_cells(key: Column, depth: int, width: int) -> Column:
    """[(row, bucket, sign)] literal-array of a key's d signed cells."""
    cells = []
    for r in range(depth):
        h = F.md5(F.concat(F.lit(f"ams{r}:"), key))
        bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width
        sign = (
            F.lit(1)
            - F.lit(2) * (F.conv(F.substring(h, 9, 1), 16, 10).cast("long") % 2)
        ).cast("long")
        cells.append(
            F.struct(
                F.lit(r).alias("row"),
                bucket.alias("bucket"),
                sign.alias("sign"),
            )
        )
    return F.array(*cells)


def ams_sketch(
    df: DataFrame,
    value: Column,
    depth: int = AMS_DEPTH,
    width: int = AMS_WIDTH,
) -> DataFrame:
    """(row, bucket, s): the signed-counter table — one groupBy over
    d stacked salted projections of one scan (the cms_sketch explode
    device), at most depth*width rows."""
    base = df.select(value.cast("string").alias("key")).filter(
        F.col("key").isNotNull()
    )
    return (
        base.select(F.explode(_ams_cells(F.col("key"), depth, width)).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.sum("c.sign").alias("s"))
    )


def ams_f2_estimate(sketch: DataFrame, depth: int = AMS_DEPTH) -> DataFrame:
    """(f2_est): lower median over rows of Y_r = sum_b S[r][b]^2 —
    exact integer; NULL when the sketch is empty (no input values)."""
    rows = sketch.groupBy("row").agg(
        F.sum(F.col("s") * F.col("s")).alias("y")
    )
    idx = (depth + 1) // 2
    return rows.groupBy().agg(
        F.try_element_at(
            F.array_sort(F.collect_list("y")), F.lit(idx)
        ).alias("f2_est")
    )


def ams_f2(
    df: DataFrame,
    value: Column,
    depth: int = AMS_DEPTH,
    width: int = AMS_WIDTH,
) -> DataFrame:
    """(depth, width, f2_est, f2_exact, rel_err_ppm): the sketch
    estimate beside the exact moment (one vocabulary-sized groupBy) —
    the self-evaluating form the registered query ships."""
    est = ams_f2_estimate(ams_sketch(df, value, depth, width), depth)
    base = df.select(value.cast("string").alias("key")).filter(
        F.col("key").isNotNull()
    )
    exact = (
        base.groupBy("key")
        .agg(F.count("*").alias("f"))
        .groupBy()
        .agg(F.sum(F.col("f") * F.col("f")).alias("f2_exact"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        F.lit(depth).cast("int").alias("depth"),
        F.lit(width).cast("int").alias("width"),
        "f2_est",
        "f2_exact",
        F.when(
            F.col("f2_exact") > 0,
            # exact integer floor division — the twin's // ; a double
            # division here would round differently above 2^53
            F.expr("abs(f2_est - f2_exact) * 1000000L div f2_exact"),
        )
        .cast("long")
        .alias("rel_err_ppm"),
    )


def sql_ams_f2(
    values_select: str,
    depth: int = AMS_DEPTH,
    width: int = AMS_WIDTH,
) -> str:
    """DuckDB twin of :func:`ams_f2` over ``values_select``, a SELECT
    producing one column ``key`` — identical md5 cells, signed sums,
    row squares, lower-median pick and ppm division."""
    cells = " UNION ALL ".join(
        f"SELECT {r} AS row, "
        f"(CAST('0x' || substr(md5('ams{r}:' || key), 1, 8) AS BIGINT) "
        f"% {width}) AS bucket, "
        f"(1 - 2 * (CAST('0x' || substr(md5('ams{r}:' || key), 9, 1) "
        "AS BIGINT) % 2)) AS sign FROM base"
        for r in range(depth)
    )
    idx = (depth + 1) // 2
    return (
        f"WITH base AS (SELECT CAST(key AS VARCHAR) AS key FROM "
        f"({values_select}) WHERE key IS NOT NULL), "
        f"cells AS ({cells}), "
        "sk AS (SELECT row, bucket, CAST(sum(sign) AS BIGINT) AS s "
        "FROM cells GROUP BY row, bucket), "
        "ys AS (SELECT row, CAST(sum(s * s) AS BIGINT) AS y FROM sk "
        "GROUP BY row), "
        f"est AS (SELECT list_sort(list(y))[{idx}] AS f2_est FROM ys), "
        "ex AS (SELECT CAST(sum(f * f) AS BIGINT) AS f2_exact FROM "
        "(SELECT key, CAST(count(*) AS BIGINT) AS f FROM base GROUP BY key)) "
        f"SELECT CAST({depth} AS INT) AS depth, CAST({width} AS INT) AS width, "
        "CAST(f2_est AS BIGINT) AS f2_est, f2_exact, "
        "CASE WHEN f2_exact > 0 THEN CAST(abs(f2_est - f2_exact) "
        "* 1000000 // f2_exact AS BIGINT) END AS rel_err_ppm "
        "FROM est CROSS JOIN ex"
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch with set-operation estimates
# (Bar-Yossef et al. 2002; the unbiased estimators of Beyer et al.
# SIGMOD 2007)
# ---------------------------------------------------------------------------
#
# The fifth md5-register sketch, and the one capability HLL cannot
# offer: because a KMV sketch IS a uniform sample of the value space
# (the k smallest 52-bit md5 hashes), two groups' sketches support
# INTERSECTION estimates — |A ∩ B| ~ rho * D(A u B) where rho is the
# fraction of the merged k-minimum set present in both sketches — so
# cross-source overlap questions run at sketch cost instead of the
# exact source_overlap join. Distinct estimate: (k-1) * 2^52 div h_(k)
# with h_(k) the kth smallest hash; groups with fewer than k distinct
# values are EXACT (their sketch enumerates them). Everything is
# integer (hashes, counts, floor divisions) — bit-identical
# cross-engine, and the sketches merge by "k smallest of the union"
# (associative/commutative — pinned).
#
# Scale shape: distinct (group, hash) → a two-stage bounded min-k
# reduction (the hostcap buffer argument: stage-1 buffers are bounded
# by partition contents, stage-2 by partitions x k) → ONE k-array row
# per group; every pair estimate is pure array math on a frame bounded
# by the GROUP DIMENSION (the pair join is a broadcast nested loop
# over #groups rows — never corpus-keyed). NULL groups/values are
# outside the universe.

# 52-bit hashes (13 md5 hex chars — the dsir uniform-bits device):
# (k-1) * M must stay inside int64 for the estimator's exact integer
# division (63 * 2^60 would overflow; 63 * 2^52 ~ 2.8e17 never does),
# and 52 bits keep the kth-minimum spacing ~2^52/D well above the
# collision regime for any realistic distinct count (D <= 10^12).
KMV_M = 1 << 52


def _kmv_hash(value: Column) -> Column:
    return F.conv(
        F.substring(F.md5(value.cast("string")), 1, 13), 16, 10
    ).cast("long")


def kmv_group_sketches(
    df: DataFrame, value: Column, group_col: str, k: int = 64
) -> DataFrame:
    """(grp, arr): each group's sorted k smallest distinct 52-bit
    hashes (fewer when the group has < k distinct values — then the
    sketch is the exact enumeration)."""
    base = (
        df.select(F.col(group_col).alias("grp"), _kmv_hash(value).alias("hv"))
        .filter(F.col("grp").isNotNull() & F.col("hv").isNotNull())
        .distinct()
    )
    st1 = (
        base.withColumn("pid", F.spark_partition_id())
        .groupBy("grp", "pid")
        .agg(F.slice(F.array_sort(F.collect_list("hv")), 1, k).alias("part"))
        .select("grp", F.explode("part").alias("hv"))
    )
    return st1.groupBy("grp").agg(
        F.slice(F.array_sort(F.collect_list("hv")), 1, k).alias("arr")
    )


def kmv_pair_overlap(
    sketches: DataFrame, k: int = 64
) -> DataFrame:
    """(src_a, src_b, est_a, est_b, union_est, inter_est): distinct /
    union / intersection estimates for every unordered group pair from
    their KMV sketches — exact integer arithmetic throughout; groups
    with < k distinct values contribute exact counts."""
    a = sketches.select(F.col("grp").alias("src_a"), F.col("arr").alias("aa"))
    b = sketches.select(F.col("grp").alias("src_b"), F.col("arr").alias("bb"))
    pairs = a.join(F.broadcast(b), F.col("src_a") < F.col("src_b"))
    staged = pairs.select(
        "src_a", "src_b", "aa", "bb",
        F.slice(
            F.array_sort(F.array_union(F.col("aa"), F.col("bb"))), 1, k
        ).alias("uu"),
        F.array_intersect(F.col("aa"), F.col("bb")).alias("cc"),
    )
    est_a = F.when(F.size("aa") < k, F.size("aa").cast("long")).otherwise(
        F.expr(f"{k - 1}L * {KMV_M}L div greatest(element_at(aa, {k}), 1L)")
    )
    est_b = F.when(F.size("bb") < k, F.size("bb").cast("long")).otherwise(
        F.expr(f"{k - 1}L * {KMV_M}L div greatest(element_at(bb, {k}), 1L)")
    )
    both_exact = (F.size("aa") < k) & (F.size("bb") < k)
    union_est = F.when(
        both_exact, F.size(F.array_union("aa", "bb")).cast("long")
    ).otherwise(
        F.expr(f"{k - 1}L * {KMV_M}L div greatest(element_at(uu, {k}), 1L)")
    )
    staged = staged.select(
        "src_a", "src_b",
        est_a.alias("est_a"),
        est_b.alias("est_b"),
        union_est.alias("union_est"),
        F.size(F.array_intersect("uu", "cc")).cast("long").alias("rho"),
        F.size("cc").cast("long").alias("n_common"),
        both_exact.alias("ex"),
    )
    return staged.select(
        "src_a", "src_b", "est_a", "est_b", "union_est",
        F.when(F.col("ex"), F.col("n_common"))
        .otherwise(F.expr(f"rho * union_est div {k}"))
        .alias("inter_est"),
    )


def kmv_source_overlap(
    df: DataFrame, value: Column, group_col: str, k: int = 64
) -> DataFrame:
    """Composed: group sketches -> pairwise estimates, ordered."""
    sk = kmv_group_sketches(df, value, group_col, k)
    return kmv_pair_overlap(sk, k).orderBy("src_a", "src_b")


def sql_kmv_overlap(values_select: str, k: int = 64) -> str:
    """DuckDB twin of :func:`kmv_source_overlap` over ``values_select``
    (a SELECT with columns grp, v) — identical hashes, k-minimum sets
    and integer estimators."""
    m = KMV_M
    est = (
        "CASE WHEN len({a}) < {k} THEN len({a}) "
        "ELSE {km1} * {m} // greatest({a}[{k}], 1) END"
    )
    return (
        f"WITH base AS (SELECT DISTINCT grp, CAST('0x' || "
        "substr(md5(CAST(v AS VARCHAR)), 1, 13) AS BIGINT) AS hv "
        f"FROM ({values_select}) WHERE grp IS NOT NULL AND v IS NOT NULL), "
        f"sk AS (SELECT grp, list_sort(list(hv))[1:{k}] AS arr FROM base "
        "GROUP BY grp), "
        "pr AS (SELECT a.grp AS src_a, b.grp AS src_b, a.arr AS aa, "
        "b.arr AS bb, "
        f"list_sort(list_distinct(list_concat(a.arr, b.arr)))[1:{k}] AS uu, "
        "list_intersect(a.arr, b.arr) AS cc "
        "FROM sk a JOIN sk b ON a.grp < b.grp) "
        "SELECT src_a, src_b, "
        f"CAST({est.format(a='aa', k=k, km1=k - 1, m=m)} AS BIGINT) AS est_a, "
        f"CAST({est.format(a='bb', k=k, km1=k - 1, m=m)} AS BIGINT) AS est_b, "
        f"CAST(CASE WHEN len(aa) < {k} AND len(bb) < {k} "
        "THEN len(list_distinct(list_concat(aa, bb))) "
        f"ELSE {k - 1} * {m} // greatest(uu[{k}], 1) END AS BIGINT) "
        "AS union_est, "
        f"CAST(CASE WHEN len(aa) < {k} AND len(bb) < {k} THEN len(cc) "
        "ELSE len(list_intersect(uu, cc)) * (CASE WHEN len(aa) < "
        f"{k} AND len(bb) < {k} THEN len(list_distinct(list_concat(aa, bb))) "
        f"ELSE {k - 1} * {m} // greatest(uu[{k}], 1) END) // {k} END "
        "AS BIGINT) AS inter_est "
        "FROM pr ORDER BY src_a, src_b"
    )
