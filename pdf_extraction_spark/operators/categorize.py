"""Multi-label keyword categorization (C1/C2) — native, zero UDF.

The category table is *data*: ``(category, pattern)`` pairs where pattern
is the same ``\\b(?:kw1|kw2|...)\\b`` alternation the reference compiles
(rag_friendly_categorizer.py:75-79). Two physical strategies:

- :func:`with_categories` — N ``rlike`` columns → filtered array →
  ``explode``; one pass over the data, no join, no shuffle. This is the
  default: category count is small (~10) and constant, so N codegen'd
  regexes beat a broadcast-join fan-out.
- :func:`categorize_by_join` — broadcast join against the category dim +
  post-filter; kept for very large category sets.

Both fall back to ``General`` for chunks matching nothing.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.categories import CATEGORY_KEYWORDS, category_pattern, category_pattern_re2


def patterns_for(keywords_by_category=None):
    kbc = keywords_by_category if keywords_by_category is not None else CATEGORY_KEYWORDS
    return {cat: category_pattern(kws) for cat, kws in kbc.items()}


def categories_array_col(content, keywords_by_category=None):
    """array of matching category names (declaration order), else
    ['General'] — pure Catalyst expressions."""
    pats = patterns_for(keywords_by_category)
    lower = F.lower(content)
    arr = F.array(
        *[
            F.when(lower.rlike("(?i)" + pat), F.lit(cat))
            for cat, pat in pats.items()
        ]
    )
    compact = F.filter(arr, lambda x: x.isNotNull())
    return F.when(F.size(compact) == 0, F.array(F.lit("General"))).otherwise(compact)


def with_categories(df: DataFrame, content_col: str = "content", keywords_by_category=None) -> DataFrame:
    return df.withColumn(
        "categories", categories_array_col(F.col(content_col), keywords_by_category)
    )


def explode_categories(df: DataFrame) -> DataFrame:
    """Multi-label fan-out: one row per (chunk, category)."""
    return df.withColumn("category", F.explode("categories")).drop("categories")


def categorize_by_join(df: DataFrame, content_col: str = "content", keywords_by_category=None) -> DataFrame:
    """Broadcast-join strategy: chunks × categories dim, regexp
    post-filter, General remainder via left_anti union.

    Tradeoff vs :func:`with_categories`: patterns live in DATA (hot-
    swappable without a new plan), but a column-valued regexp can't be
    compiled once per task — measured ~10× slower than the codegen'd
    literal-rlike array path. Use when categories change at runtime;
    default to with_categories otherwise."""
    spark = df.sparkSession
    pats = patterns_for(keywords_by_category)
    dim = spark.createDataFrame(
        [(c, "(?i)" + p) for c, p in pats.items()], ["category", "pattern"]
    )
    matched = df.join(F.broadcast(dim)).filter(
        F.regexp_like(F.lower(F.col(content_col)), F.col("pattern"))
    ).drop("pattern")
    general = df.join(
        matched.select(df.columns).distinct(), on=df.columns, how="left_anti"
    ).withColumn("category", F.lit("General"))
    return matched.unionByName(general)


def sql_categories(content_expr: str, keywords_by_category=None, id_expr: str = "doc_id"):
    """DuckDB oracle twin of with_categories+explode: one SELECT per
    category UNION ALL + General remainder. Patterns go through
    category_pattern_re2 — RE2's ASCII \\b diverges from Java/Python's
    Unicode-aware \\b next to accented letters, so the boundary is
    emulated with consuming non-word-char classes."""
    kbc = keywords_by_category if keywords_by_category is not None else CATEGORY_KEYWORDS
    pats = {cat: category_pattern_re2(kws) for cat, kws in kbc.items()}
    selects = []
    for cat, pat in pats.items():
        p = pat.replace("'", "''")
        selects.append(
            f"SELECT {id_expr} AS doc_id, '{cat}' AS category FROM documents "
            f"WHERE regexp_matches(lower({content_expr}), '{p}')"
        )
    any_match = " OR ".join(
        "regexp_matches(lower({}), '{}')".format(content_expr, p.replace("'", "''"))
        for p in pats.values()
    )
    selects.append(
        # coalesce: NULL content matches nothing, but the General
        # remainder must still fire (Spark's categorizer labels a NULL
        # doc General; bare NOT(NULL) would silently drop the row)
        f"SELECT {id_expr} AS doc_id, 'General' AS category FROM documents "
        f"WHERE NOT coalesce(({any_match}), FALSE)"
    )
    return " UNION ALL ".join(selects)
