"""Structural HTML extraction — heading outline, JSON-LD ``@type``
inventory, table-cell grids.

The head-metadata stage (operators/htmlmeta.py) reads attribute-shaped
metadata; this module reads the document's *structure*: the h1-h6
outline a section-aware chunker keys on, the schema.org entity types a
corpus mixer stratifies by (NewsArticle vs Product vs FAQPage pages),
and ``<table>`` cell grids for tabular payloads (invoice/statement
pages — the web analogue of the reference's per-field PDF table pulls,
reference main.py's field extraction loop).

All three operators follow the htmlmeta discipline: FULLY NATIVE
regexp scans inside one codegen'd projection + an explode — zero
Python, zero exchanges — so at 10^12 documents each is a pure narrow
map. Patterns stay inside the Java∩RE2 intersection (no backreferences,
whitespace spelled as the literal Java ``\\s`` body class); each
operator ships a DuckDB twin built from the SAME pattern strings.

Documented structural limits (deterministic, identical cross-engine):
  * a heading closes at the first ``</hN>`` for ANY N (no backrefs —
    ``<h2>a</h3>`` ends at ``</h3>``);
  * ``@type`` is extracted in scalar string form only; the JSON-array
    form (``"@type": ["A","B"]``) extracts nothing;
  * table extraction reads the FIRST ``<table>`` only and does not
    recurse into nested tables (the inner table's tags are stripped
    with the rest of the cell markup).
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..kernels.wsre import JAVA_WS_BODY

_WS = "[" + JAVA_WS_BODY + "]"

_STRIP_TAGS = "(?s)<[^>]*>"

# -- heading outline ---------------------------------------------------

_HEADING_TAG = f"(?is)<h[1-6](?:{_WS}[^>]*)?>.*?</h[1-6]{_WS}*>"
_HEADING_LEVEL = "(?i)^<h([1-6])"
_HEADING_INNER = "(?is)^<h[1-6][^>]*>(.*?)</h"


def _clean(c: Column) -> Column:
    return F.nullif(F.trim(F.regexp_replace(c, _WS + "+", " ")), F.lit(""))


def _heading_text(tag: Column) -> Column:
    inner = F.regexp_extract(tag, _HEADING_INNER, 1)
    return _clean(F.regexp_replace(inner, _STRIP_TAGS, ""))


def explode_headings(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pos, level, heading) — one row per h1-h6 element in
    document order, inner markup stripped, whitespace collapsed.
    Headings whose text is empty after stripping are dropped BEFORE
    position numbering, so ``pos`` is contiguous over kept headings.
    Narrow map + explode: zero exchanges, zero Python."""
    c = F.coalesce(F.col(html_col), F.lit(""))
    tags = F.filter(
        F.regexp_extract_all(c, F.lit(_HEADING_TAG), F.lit(0)),
        lambda t: _heading_text(t).isNotNull(),
    )
    pos = F.posexplode(tags)
    out = df.select(F.col(id_col).alias("doc_id"), pos.alias("pos", "tag"))
    return out.select(
        "doc_id",
        F.col("pos").cast("int"),
        F.regexp_extract(F.col("tag"), _HEADING_LEVEL, 1)
        .cast("int")
        .alias("level"),
        _heading_text(F.col("tag")).alias("heading"),
    )


def _q(pat: str) -> str:
    return pat.replace("'", "''")


def _sql_clean(expr: str) -> str:
    ws = _q(_WS)
    return f"nullif(trim(regexp_replace({expr}, '{ws}+', ' ', 'g')), '')"


def _sql_heading_text(expr: str) -> str:
    inner = f"regexp_extract({expr}, '{_q(_HEADING_INNER)}', 1)"
    return _sql_clean(f"regexp_replace({inner}, '{_q(_STRIP_TAGS)}', '', 'g')")


def sql_explode_headings(rel: str, html_expr: str = "html") -> str:
    """DuckDB twin of :func:`explode_headings` (same pattern strings)."""
    c = f"coalesce({html_expr}, '')"
    tags = (
        f"list_filter(regexp_extract_all({c}, '{_q(_HEADING_TAG)}'), "
        f"t -> {_sql_heading_text('t')} IS NOT NULL)"
    )
    return (
        f"WITH s AS (SELECT doc_id, {tags} AS tags FROM {rel}), "
        "e AS (SELECT doc_id, unnest(tags) AS tag, "
        "CAST(unnest(generate_series(0, len(tags) - 1)) AS INT) AS pos "
        "FROM s WHERE len(tags) > 0) "
        "SELECT doc_id, pos, "
        f"CAST(regexp_extract(tag, '{_q(_HEADING_LEVEL)}', 1) AS INT) AS level, "
        f"{_sql_heading_text('tag')} AS heading FROM e"
    )


# -- JSON-LD @type inventory -------------------------------------------

_LDJSON_BLOCK = (
    f"(?is)<script{_WS}[^>]*type{_WS}*={_WS}*[\"']?application/ld\\+json"
    f"[\"']?[^>]*>(.*?)</script"
)
_LD_TYPE = f'"@type"{_WS}*:{_WS}*"([^"]*)"'


def _jsonld_type_arr(c: Column) -> Column:
    blocks = F.regexp_extract_all(c, F.lit(_LDJSON_BLOCK), F.lit(1))
    types = F.flatten(
        F.transform(
            blocks, lambda b: F.regexp_extract_all(b, F.lit(_LD_TYPE), F.lit(1))
        )
    )
    return F.filter(types, lambda t: t != F.lit(""))


def jsonld_types(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pos, jsonld_type) — every scalar ``"@type": "X"``
    occurrence across all ``application/ld+json`` script blocks, in
    document order (block order, then occurrence order inside the
    block — nested entities included). The corpus-mixing signal:
    schema.org page type without a JSON parser in the hot path."""
    c = F.coalesce(F.col(html_col), F.lit(""))
    pos = F.posexplode(_jsonld_type_arr(c))
    out = df.select(F.col(id_col).alias("doc_id"), pos.alias("pos", "jsonld_type"))
    return out.withColumn("pos", F.col("pos").cast("int"))


def sql_jsonld_types(rel: str, html_expr: str = "html") -> str:
    """DuckDB twin of :func:`jsonld_types`."""
    c = f"coalesce({html_expr}, '')"
    types = (
        f"list_filter(flatten(list_transform("
        f"regexp_extract_all({c}, '{_q(_LDJSON_BLOCK)}', 1), "
        f"b -> regexp_extract_all(b, '{_q(_LD_TYPE)}', 1))), t -> t <> '')"
    )
    return (
        f"WITH s AS (SELECT doc_id, {types} AS types FROM {rel}) "
        "SELECT doc_id, "
        "CAST(unnest(generate_series(0, len(types) - 1)) AS INT) AS pos, "
        "unnest(types) AS jsonld_type FROM s WHERE len(types) > 0"
    )


# -- first-table cell grid ---------------------------------------------

_TABLE_PAT = f"(?is)<table(?:{_WS}[^>]*)?>(.*?)</table{_WS}*>"
_TR_PAT = f"(?is)<tr(?:{_WS}[^>]*)?>(.*?)</tr{_WS}*>"
_CELL_PAT = f"(?is)<t([dh])(?:{_WS}[^>]*)?>(.*?)</t[dh]{_WS}*>"


def html_table_cells(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, row_no, col_no, is_header, cell) — the FIRST table's
    cell grid: rows in order, cells in order, ``is_header`` = the cell
    is ``<th>``, markup stripped, empty cells kept as NULL (the grid
    position is the contract). Ragged rows are preserved as-is.
    Two chained narrow explodes, zero exchanges, zero Python."""
    c = F.coalesce(F.col(html_col), F.lit(""))
    body = F.regexp_extract(c, _TABLE_PAT, 1)
    rows = F.regexp_extract_all(body, F.lit(_TR_PAT), F.lit(1))
    rpos = F.posexplode(rows)
    rowed = df.select(F.col(id_col).alias("doc_id"), rpos.alias("row_no", "row_html"))
    kinds = F.regexp_extract_all(F.col("row_html"), F.lit(_CELL_PAT), F.lit(1))
    bodies = F.regexp_extract_all(F.col("row_html"), F.lit(_CELL_PAT), F.lit(2))
    cpos = F.posexplode(F.arrays_zip(kinds.alias("kind"), bodies.alias("body")))
    celled = rowed.select("doc_id", "row_no", cpos.alias("col_no", "cell"))
    return celled.select(
        "doc_id",
        F.col("row_no").cast("int"),
        F.col("col_no").cast("int"),
        (F.lower(F.col("cell.kind")) == "h").alias("is_header"),
        _clean(F.regexp_replace(F.col("cell.body"), _STRIP_TAGS, "")).alias("cell"),
    )


def sql_html_table_cells(rel: str, html_expr: str = "html") -> str:
    """DuckDB twin of :func:`html_table_cells` (index-joined parallel
    group extraction instead of arrays_zip; same pattern strings)."""
    c = f"coalesce({html_expr}, '')"
    body = f"regexp_extract({c}, '{_q(_TABLE_PAT)}', 1)"
    cell_clean = _sql_clean(
        f"regexp_replace(cells[col_no + 1], '{_q(_STRIP_TAGS)}', '', 'g')"
    )
    return (
        f"WITH t AS (SELECT doc_id, "
        f"regexp_extract_all({body}, '{_q(_TR_PAT)}', 1) AS trs FROM {rel}), "
        "r AS (SELECT doc_id, unnest(trs) AS row_html, "
        "CAST(unnest(generate_series(0, len(trs) - 1)) AS INT) AS row_no "
        "FROM t WHERE len(trs) > 0), "
        "g AS (SELECT doc_id, row_no, "
        f"regexp_extract_all(row_html, '{_q(_CELL_PAT)}', 1) AS kinds, "
        f"regexp_extract_all(row_html, '{_q(_CELL_PAT)}', 2) AS cells "
        "FROM r), "
        "e AS (SELECT doc_id, row_no, kinds, cells, "
        "CAST(unnest(generate_series(0, len(cells) - 1)) AS INT) AS col_no "
        "FROM g WHERE len(cells) > 0) "
        "SELECT doc_id, row_no, col_no, "
        "lower(kinds[col_no + 1]) = 'h' AS is_header, "
        f"{cell_clean} AS cell FROM e"
    )


# -- image alt-text pairs (multimodal caption mining) --------------------

_IMG_TAG = f"(?is)<img(?:{_WS}[^>]*)?/?>"
_SRC_DQ = f'(?i)src{_WS}*={_WS}*"([^"]*)"'
_SRC_SQ = f"(?i)src{_WS}*={_WS}*'([^']*)'"
_ALT_DQ = f'(?i)alt{_WS}*={_WS}*"([^"]*)"'
_ALT_SQ = f"(?i)alt{_WS}*={_WS}*'([^']*)'"

# caption-worthiness: ≥ this many words of alt text (an icon's
# "logo" / "x" alt is navigation, not a caption)
CAPTION_MIN_WORDS = 3


def img_alt_pairs(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pos, src, alt, n_alt_words, is_data_uri, caption_worthy)
    — every ``<img>`` carrying a non-empty ``src``, in document order:
    the (image-ref, alt-text) pair miner that seeds image-caption
    training sets from a crawl. ``alt`` is whitespace-collapsed (NULL
    when absent/empty); ``caption_worthy`` = alt has ≥ 3 words;
    ``is_data_uri`` marks inline base64 payloads (carried, not
    decoded). Attribute order inside the tag is free (src and alt are
    extracted independently per tag). Narrow map + explode, zero
    Python, zero exchanges."""
    from ..kernels.wsre import PY_WS_SPLIT

    c = F.coalesce(F.col(html_col), F.lit(""))

    def _src(tag: Column) -> Column:
        return F.coalesce(
            F.nullif(F.regexp_extract(tag, _SRC_DQ, 1), F.lit("")),
            F.nullif(F.regexp_extract(tag, _SRC_SQ, 1), F.lit("")),
        )

    tags = F.filter(
        F.regexp_extract_all(c, F.lit(_IMG_TAG), F.lit(0)),
        lambda t: _src(t).isNotNull(),
    )
    pos = F.posexplode(tags)
    out = df.select(F.col(id_col).alias("doc_id"), pos.alias("pos", "tag"))
    alt = F.coalesce(
        _clean(F.regexp_extract(F.col("tag"), _ALT_DQ, 1)),
        _clean(F.regexp_extract(F.col("tag"), _ALT_SQ, 1)),
    )
    n_alt_words = F.when(
        alt.isNotNull(),
        F.size(F.filter(F.split(alt, PY_WS_SPLIT), lambda w: w != F.lit(""))),
    ).otherwise(F.lit(0))
    src = _src(F.col("tag"))
    return out.select(
        "doc_id",
        F.col("pos").cast("int"),
        src.alias("src"),
        alt.alias("alt"),
        n_alt_words.cast("int").alias("n_alt_words"),
        F.lower(src).startswith("data:").alias("is_data_uri"),
        (n_alt_words >= CAPTION_MIN_WORDS).alias("caption_worthy"),
    )


def sql_img_alt_pairs(rel: str, html_expr: str = "html") -> str:
    """DuckDB twin of :func:`img_alt_pairs`."""
    from ..kernels.wsre import PY_WS_SPLIT

    c = f"coalesce({html_expr}, '')"
    ws = PY_WS_SPLIT.replace("'", "''")

    def src_of(e):
        return (
            f"coalesce(nullif(regexp_extract({e}, '{_q(_SRC_DQ)}', 1), ''), "
            f"nullif(regexp_extract({e}, '{_q(_SRC_SQ)}', 1), ''))"
        )

    alt_dq = _sql_clean(f"regexp_extract(tag, '{_q(_ALT_DQ)}', 1)")
    alt_sq = _sql_clean(f"regexp_extract(tag, '{_q(_ALT_SQ)}', 1)")
    alt = f"coalesce({alt_dq}, {alt_sq})"
    tags = (
        f"list_filter(regexp_extract_all({c}, '{_q(_IMG_TAG)}'), "
        f"t -> {src_of('t')} IS NOT NULL)"
    )
    n_words = (
        f"CASE WHEN {alt} IS NOT NULL THEN len(list_filter("
        f"string_split_regex({alt}, '{ws}'), w -> w <> '')) ELSE 0 END"
    )
    return (
        f"WITH s AS (SELECT doc_id, {tags} AS tags FROM {rel}), "
        "e AS (SELECT doc_id, unnest(tags) AS tag, "
        "CAST(unnest(generate_series(0, len(tags) - 1)) AS INT) AS pos "
        "FROM s WHERE len(tags) > 0) "
        f"SELECT doc_id, pos, {src_of('tag')} AS src, {alt} AS alt, "
        f"CAST({n_words} AS INT) AS n_alt_words, "
        f"lower({src_of('tag')}) LIKE 'data:%' AS is_data_uri, "
        f"{n_words} >= {CAPTION_MIN_WORDS} AS caption_worthy FROM e"
    )
