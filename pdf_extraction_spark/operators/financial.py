"""Financial field extraction (F1–F8) as native regexp expressions.

Each extractor family becomes ``regexp_extract_all`` per pattern →
``flatten``-style union → struct transform with CASE classification —
all Catalyst, codegen'd, no Python in the hot path. Pattern strings are
shared verbatim with the pure kernels (kernels/financial.py); the
DuckDB oracle twins derive from the SAME constants via
kernels.wsre.ascii_i_exact + java_ws_exact — the bare (?i) flag means
different fold tables in Java (ASCII) and RE2 (Unicode simple fold),
so the twin spells the ASCII casing explicitly
(tests/test_fin_regex_parity.py pins the family).

Row shape: rather than arrays of structs (hash-unfriendly across
engines), the query-level operators explode to one row per hit with the
value normalized to double.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..kernels.financial import (
    _EBITDA_PATTERNS,
    _GROWTH_PATTERNS,
    _MARGIN_PATTERNS,
    _REVENUE_PATTERNS,
)

REVENUE_PATTERNS = list(_REVENUE_PATTERNS)
GROWTH_PATTERNS = list(_GROWTH_PATTERNS)
EBITDA_PATTERNS = list(_EBITDA_PATTERNS)
MARGIN_PATTERNS = list(_MARGIN_PATTERNS)
QUARTER_PATTERN = r"\b(Q[1-4])\b"
COMBINED_PATTERN = r"\b(Q[1-4])\s*FY\s*(\d{2,4})\b"
FY_DIRECT_PATTERN = r"\bFY\s*(\d{2,4})\b"
FY_RANGE_PATTERN = r"\b(?:fiscal\s+year\s+)?(\d{4})-(\d{2,4})\b"
URL_QFY_PATTERN = r"Q(\d)_FY(\d{2,4})"


def _hits_array(content: Column, patterns) -> Column:
    """All raw matches (group 0) of the ordered pattern list, pattern
    order preserved (reference appends per-pattern, financial_extractor
    .py:31-34)."""
    return F.flatten(
        F.array(
            *[F.regexp_extract_all(content, F.lit("(?i)" + p), F.lit(0)) for p in patterns]
        )
    )


def _values_array(content: Column, patterns) -> Column:
    return F.flatten(
        F.array(
            *[F.regexp_extract_all(content, F.lit("(?i)" + p), F.lit(1)) for p in patterns]
        )
    )


def amount_currency_col(raw: Column) -> Column:
    """INR iff raw contains 'Rs' or 'INR' (case-sensitive, like the
    reference check ``"Rs" in raw_text``)."""
    return F.when(raw.contains("Rs") | raw.contains("INR"), "INR").otherwise("USD")


def amount_unit_col(raw: Column) -> Column:
    lower = F.lower(raw)
    return (
        F.when(lower.contains("crore") | lower.contains("cr"), "crores")
        .when(lower.contains("million") | lower.contains("mn"), "million")
        .otherwise("billion")
    )


def growth_type_col(raw: Column) -> Column:
    lower = F.lower(raw)
    yoy = lower.contains("year-on-year") | lower.contains("yoy") | lower.contains("y-o-y")
    qoq = lower.contains("quarter-on-quarter") | lower.contains("qoq") | lower.contains("q-o-q")
    return F.when(yoy, "YoY").when(qoq, "QoQ").otherwise("general")


def margin_type_col(raw: Column) -> Column:
    lower = F.lower(raw)
    return (
        F.when(lower.contains("ebitda"), "EBITDA")
        .when(lower.contains("gross"), "gross")
        .when(lower.contains("operating"), "operating")
        .when(lower.contains("net"), "net")
        .otherwise("general")
    )


def _explode_hits(df: DataFrame, content_col: str, patterns, id_cols) -> DataFrame:
    c = F.col(content_col)
    hits = F.arrays_zip(
        _hits_array(c, patterns).alias("raw_text"),
        _values_array(c, patterns).alias("val"),
    )
    return df.select(*id_cols, F.posexplode(hits).alias("hit_pos", "hit")).select(
        *id_cols,
        "hit_pos",
        F.col("hit.raw_text").alias("raw_text"),
        F.regexp_replace("hit.val", ",", "").cast("double").alias("value"),
    )


def extract_amounts(df: DataFrame, content_col: str, patterns, id_cols=("doc_id",)) -> DataFrame:
    """F1/F3 shape: one row per hit with value/currency/unit."""
    out = _explode_hits(df, content_col, patterns, id_cols)
    return out.select(
        *id_cols,
        "hit_pos",
        "raw_text",
        "value",
        amount_currency_col(F.col("raw_text")).alias("currency"),
        amount_unit_col(F.col("raw_text")).alias("unit"),
    )


def extract_growth(df: DataFrame, content_col: str, id_cols=("doc_id",)) -> DataFrame:
    out = _explode_hits(df, content_col, GROWTH_PATTERNS, id_cols)
    return out.select(
        *id_cols,
        "hit_pos",
        "raw_text",
        "value",
        growth_type_col(F.col("raw_text")).alias("growth_type"),
        F.when(F.lower("raw_text").contains("down"), "negative")
        .otherwise("positive")
        .alias("direction"),
    )


def extract_margins(df: DataFrame, content_col: str, id_cols=("doc_id",)) -> DataFrame:
    out = _explode_hits(df, content_col, MARGIN_PATTERNS, id_cols)
    return out.select(
        *id_cols,
        "hit_pos",
        "raw_text",
        "value",
        margin_type_col(F.col("raw_text")).alias("margin_type"),
    )


def quarters_col(content: Column) -> Column:
    """F5 quarters: distinct sorted Q1..Q4 references (dedup normalized
    to sorted — see kernels/financial.py docstring)."""
    return F.array_sort(
        F.array_distinct(F.regexp_extract_all(content, F.lit("(?i)" + QUARTER_PATTERN), F.lit(1)))
    )


def fiscal_years_col(content: Column) -> Column:
    """F5 fiscal years: FY## / FY#### / YYYY-YY forms normalized to FY
    + last-2 (4-digit second group of the range form is kept whole,
    matching the reference's 2-group branch)."""
    fy_direct = F.transform(
        F.regexp_extract_all(content, F.lit("(?i)" + FY_DIRECT_PATTERN), F.lit(1)),
        lambda y: F.when(F.length(y) == 2, F.concat(F.lit("FY"), y)).otherwise(
            F.concat(F.lit("FY"), F.substring(y, -2, 2))
        ),
    )
    fy_range = F.transform(
        F.regexp_extract_all(
            content, F.lit("(?i)" + FY_RANGE_PATTERN), F.lit(2)
        ),
        lambda y: F.concat(F.lit("FY"), y),
    )
    return F.array_sort(F.array_distinct(F.concat(fy_direct, fy_range)))


def combined_quarter_fy_col(content: Column) -> Column:
    q = F.regexp_extract_all(content, F.lit("(?i)" + COMBINED_PATTERN), F.lit(1))
    y = F.regexp_extract_all(content, F.lit("(?i)" + COMBINED_PATTERN), F.lit(2))
    pairs = F.zip_with(
        q,
        y,
        lambda qq, yy: F.concat(
            F.upper(qq),
            F.lit(" FY"),
            F.when(F.length(yy) == 2, yy).otherwise(F.substring(yy, -2, 2)),
        ),
    )
    return F.array_sort(F.array_distinct(pairs))


def with_quarter_info(df: DataFrame, content_col: str = "content") -> DataFrame:
    c = F.col(content_col)
    return (
        df.withColumn("quarters", quarters_col(c))
        .withColumn("fiscal_years", fiscal_years_col(c))
        .withColumn("combined", combined_quarter_fy_col(c))
    )


# --- F7/F8: url/filename date + quarter/FY ---------------------------------

def url_filename_col(url: Column) -> Column:
    """basename without extension (Path(...).stem analogue)."""
    base = F.element_at(F.split(url, "/"), -1)
    # \z not $ (Java $ matches before a trailing line terminator)
    return F.regexp_replace(base, r"\.[^.]*\z", "")


def with_url_date(df: DataFrame, url_col: str = "url", ts_col: str = "warc_ts") -> DataFrame:
    """F7: Mon_YYYY → first-of-month; Q#_FY## → fiscal quarter start;
    bare YYYY → Jan 1. Reference falls back to now() — the engine
    coalesces onto ``warc_ts`` instead (deterministic; SURVEY.md §4.4)."""
    name = url_filename_col(F.col(url_col))

    mon = F.regexp_extract(name, r"([A-Za-z]{3,9})_(\d{4})", 1)
    yr = F.regexp_extract(name, r"([A-Za-z]{3,9})_(\d{4})", 2)
    # try_: an unparseable month name falls through to the next pattern,
    # like the reference's strptime try/except (ANSI mode would throw)
    month_year = F.try_to_timestamp(
        F.concat_ws(" ", F.substring(mon, 1, 3), yr), F.lit("MMM yyyy")
    )

    # try_cast everywhere: unmatched regex groups are '' and ANSI mode
    # (Spark 4 default) hard-fails plain casts on them
    q = F.regexp_extract(name, "(?i)" + URL_QFY_PATTERN, 1).try_cast("int")
    fy_raw = F.regexp_extract(name, "(?i)" + URL_QFY_PATTERN, 2)
    fy_int = fy_raw.try_cast("int")
    fy = F.when(
        F.length(fy_raw) == 2,
        F.when(fy_int < 50, fy_int + 2000).otherwise(fy_int + 1900),
    ).otherwise(fy_int)
    q_month = (
        F.when(q == 1, 4).when(q == 2, 7).when(q == 3, 10).when(q == 4, 1)
    )
    q_year = F.when(q == 4, fy + 1).otherwise(fy)
    quarter_date = F.when(
        q.isNotNull() & (q >= 1) & (q <= 4) & fy.isNotNull(),
        F.make_timestamp(q_year, q_month, F.lit(1), F.lit(0), F.lit(0), F.lit(0)),
    )

    bare_year = F.regexp_extract(name, r"(\d{4})", 1)
    year_date = F.when(
        bare_year != "",
        F.make_timestamp(bare_year.try_cast("int"), F.lit(1), F.lit(1), F.lit(0), F.lit(0), F.lit(0)),
    )

    return df.withColumn(
        "doc_date", F.coalesce(month_year, quarter_date, year_date, F.col(ts_col))
    )


def with_quarter_fy(df: DataFrame, url_col: str = "url", date_col: str = "doc_date") -> DataFrame:
    """F8: quarter/FY from the filename, FY derived from the date when
    absent (April–March fiscal year)."""
    name = F.lower(url_filename_col(F.col(url_col)))
    qm = F.regexp_extract(name, r"q(\d)", 1)
    quarter = F.when(qm != "", F.concat(F.lit("Q"), qm)).otherwise("")

    fym = F.regexp_extract(name, r"fy(\d{2,4})", 1)
    d = F.col(date_col)
    derived = F.when(
        F.month(d) >= 4, F.concat(F.lit("FY"), F.substring((F.year(d) + 1).cast("string"), -2, 2))
    ).otherwise(F.concat(F.lit("FY"), F.substring(F.year(d).cast("string"), -2, 2)))
    fiscal_year = (
        F.when(F.length(fym) == 2, F.concat(F.lit("FY"), fym))
        .when(F.length(fym) > 2, F.concat(F.lit("FY"), F.substring(fym, -2, 2)))
        .otherwise(derived)
    )
    return df.withColumn("quarter", quarter).withColumn("fiscal_year", fiscal_year)
