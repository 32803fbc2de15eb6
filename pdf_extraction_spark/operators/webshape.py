"""Page-shape analysis: layout-template detection and crawl-trap URL
flags — the structural (non-text) curation signals.

Mass-generated pages (listing shells, calendar archives, faceted
search results) share an HTML LAYOUT even when their visible text
differs, so text-level dedup never groups them; and crawl traps
(session ids, unbounded calendars, self-similar paths) are visible in
the URL before a byte is fetched. Both operators are fully native:

* :func:`template_pages` — fingerprint each page's tag SEQUENCE (the
  order of element names, attributes and text stripped) with a 128-bit
  md5 key, count pages per fingerprint, flag layouts above a
  replication threshold. One vectorized tag scan per page + one
  map-side-combinable groupBy on the key + one key-equi-join back
  (join, not a window — a mega-template's partition would otherwise
  funnel through one task; AQE splits the skewed key on the join).
* :func:`url_trap_flags` — per-url integer/boolean signals: path
  depth, query-param count, session-id parameters, repeated path
  segments (the self-similar-loop signature), deep calendar paths,
  and the combined ``is_trap`` verdict. Pure projection, zero
  exchanges, zero Python.

Pattern hygiene: every regex is RE2∩Java (character classes + (?i) on
ASCII only, no backreferences, no \\s); md5 is the cross-engine key
device (the same choice as line/paragraph dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "template_pages",
    "sql_template_pages",
    "url_trap_flags",
    "sql_url_trap_flags",
    "soft404_flags",
    "sql_soft404_flags",
]

_TAG_RE = "</?([a-z][a-z0-9]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = "^[^?#]*\\?([^#]*)"
_SESSION_RE = "(?i)(jsessionid|phpsessid|sessionid|session_id|sid)="
_CAL_RE = "/(19|20)[0-9]{2}/[0-9]{1,2}(/|$)"


def template_pages(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    min_count: int = 50,
) -> DataFrame:
    """(doc_id, layout_key, n_tags, n_same_layout, is_template): md5
    of the comma-joined lowercase tag-name sequence; a layout shared
    by ≥ ``min_count`` pages is a template. NULL/tag-less html maps to
    the empty-sequence key (all such docs group together — they are
    indeed the same degenerate layout)."""
    tags = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(html_col), F.lit(""))), F.lit(_TAG_RE), F.lit(1)
    )
    keyed = df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.array_join(tags, ",")).alias("layout_key"),
        F.size(tags).alias("n_tags"),
    )
    counts = keyed.groupBy("layout_key").agg(
        F.count("*").alias("n_same_layout")
    )
    return keyed.join(counts, "layout_key").select(
        "doc_id",
        "layout_key",
        "n_tags",
        "n_same_layout",
        (F.col("n_same_layout") >= F.lit(min_count)).alias("is_template"),
    )


def sql_template_pages(
    pages_select: str, min_count: int = 50
) -> str:
    """DuckDB twin of :func:`template_pages` over a subquery yielding
    (doc_id, html) — same tag scan, same md5 key, same threshold."""
    return (
        f"WITH p AS ({pages_select}), "
        "k AS (SELECT doc_id, "
        f"md5(array_to_string(regexp_extract_all(lower(coalesce(html, '')), "
        f"'{_TAG_RE}', 1), ',')) AS layout_key, "
        f"CAST(len(regexp_extract_all(lower(coalesce(html, '')), '{_TAG_RE}', 1)) "
        "AS INT) AS n_tags FROM p), "
        "c AS (SELECT layout_key, count(*) AS n_same_layout FROM k "
        "GROUP BY layout_key) "
        "SELECT doc_id, k.layout_key, n_tags, n_same_layout, "
        f"n_same_layout >= {min_count} AS is_template "
        "FROM k JOIN c ON k.layout_key = c.layout_key"
    )


def url_trap_flags(
    df: DataFrame, url_col: str = "url", max_depth: int = 8
) -> DataFrame:
    """Adds ``path_depth``, ``n_params``, ``has_session_id``,
    ``repeated_segment`` (any path segment occurring twice — the
    self-similar-loop signature), ``deep_calendar`` (a /YYYY/MM/ pair
    below depth 4) and the combined ``is_trap``. NULL urls flag
    nothing (all-false, depth 0)."""
    u = F.coalesce(F.col(url_col), F.lit(""))
    path = F.regexp_extract(u, _PATH_RE, 1)
    segs = F.filter(F.split(path, "/"), lambda x: x != F.lit(""))
    query = F.regexp_extract(u, _QUERY_RE, 1)
    params = F.filter(F.split(query, "&"), lambda x: x != F.lit(""))
    depth = F.size(segs)
    repeated = F.size(segs) > F.size(F.array_distinct(segs))
    sess = u.rlike(_SESSION_RE) | F.lower(u).contains(";jsessionid=")
    cal = path.rlike(_CAL_RE) & (depth >= F.lit(4))
    out = (
        df.withColumn("path_depth", depth)
        .withColumn("n_params", F.size(params))
        .withColumn("has_session_id", sess)
        .withColumn("repeated_segment", repeated)
        .withColumn("deep_calendar", cal)
    )
    return out.withColumn(
        "is_trap",
        F.col("has_session_id")
        | F.col("repeated_segment")
        | F.col("deep_calendar")
        | (F.col("path_depth") > F.lit(max_depth)),
    )


def sql_url_trap_flags(
    urls_select: str, max_depth: int = 8
) -> str:
    """DuckDB twin of :func:`url_trap_flags` over a subquery yielding
    (url, …passthrough). Split-on-'/' of an empty path yields [''] in
    both engines and the empty-string filter removes it, so depth
    agrees; regexp_matches mirrors rlike (find-anywhere)."""
    return (
        f"WITH u0 AS ({urls_select}), "
        "f AS (SELECT *, "
        f"list_filter(string_split(regexp_extract(coalesce(url, ''), "
        f"'{_PATH_RE}', 1), '/'), x -> x <> '') AS segs, "
        f"list_filter(string_split(regexp_extract(coalesce(url, ''), "
        f"'{_QUERY_RE}', 1), '&'), x -> x <> '') AS params, "
        f"regexp_extract(coalesce(url, ''), '{_PATH_RE}', 1) AS pth FROM u0) "
        "SELECT url, CAST(len(segs) AS INT) AS path_depth, "
        "CAST(len(params) AS INT) AS n_params, "
        f"(regexp_matches(coalesce(url, ''), '{_SESSION_RE}') "
        "OR contains(lower(coalesce(url, '')), ';jsessionid=')) "
        "AS has_session_id, "
        "len(segs) > len(list_distinct(segs)) AS repeated_segment, "
        f"(regexp_matches(pth, '{_CAL_RE}') AND len(segs) >= 4) "
        "AS deep_calendar, "
        f"(regexp_matches(coalesce(url, ''), '{_SESSION_RE}') "
        "OR contains(lower(coalesce(url, '')), ';jsessionid=') "
        "OR len(segs) > len(list_distinct(segs)) "
        f"OR (regexp_matches(pth, '{_CAL_RE}') AND len(segs) >= 4) "
        f"OR len(segs) > {max_depth}) AS is_trap "
        "FROM f"
    )


# --------------------------------------------------------------------------
# Soft-404 detection (error pages served with HTTP 200)
# --------------------------------------------------------------------------

# Content-signature heuristic in the spirit of Bar-Yossef et al. 2004
# ("Sic Transit Gloria Telae"): a page whose text carries an error
# phrase AND is short is almost always an error shell, not content.
# The phrase list is ASCII literal alternation under (?i) — RE2∩Java
# identical, no \b (RE2's is ASCII-only vs Java's Unicode \b; the
# surrounding-space spellings below need no boundary class at all).
SOFT404_PHRASE_RE = (
    "(?i)page not found|file not found|404 not found|error 404|404 error|"
    "http 404|no longer (exists|available)|"
    "has been (removed|deleted|moved|discontinued)|"
    "access denied|not authorized|permission denied|"
    "an error (has )?occurred|temporarily unavailable|service unavailable|"
    "page (you requested|you are looking for) (was|does) not"
)
SOFT404_MAX_WORDS = 60


def soft404_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_words: int = SOFT404_MAX_WORDS,
) -> DataFrame:
    """Appends ``n_words`` (Java-WS token count, the curation-family
    convention), ``has_error_phrase`` and ``is_soft404`` (= phrase AND
    < ``max_words`` words). Pure projection: one rlike + one split,
    zero exchanges, zero Python — a 10^12-row narrow map. NULL text
    counts 0 words and never flags a phrase."""
    from ..kernels.wsre import JAVA_WS_SPLIT

    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(t, JAVA_WS_SPLIT), lambda w: w != F.lit(""))
    n_words = F.size(words)
    phrase = t.rlike(SOFT404_PHRASE_RE)
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("int").alias("n_words"),
        phrase.alias("has_error_phrase"),
        (phrase & (n_words < F.lit(max_words))).alias("is_soft404"),
    )


def sql_soft404_flags(
    rel: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    max_words: int = SOFT404_MAX_WORDS,
) -> str:
    """DuckDB twin of :func:`soft404_flags` (identical pattern text;
    string_split_regex + list_filter mirrors the Spark split-and-drop
    convention on empties)."""
    from ..kernels.wsre import JAVA_WS_SPLIT

    pat = SOFT404_PHRASE_RE.replace("'", "''")
    ws = JAVA_WS_SPLIT.replace("'", "''")
    return (
        f"WITH s AS (SELECT {id_expr} AS doc_id, coalesce({text_expr}, '') AS t "
        f"FROM {rel}), "
        "f AS (SELECT doc_id, CAST(len(list_filter(string_split_regex(t, "
        f"'{ws}'), w -> w <> '')) AS INT) AS n_words, "
        f"regexp_matches(t, '{pat}') AS has_error_phrase FROM s) "
        "SELECT doc_id, n_words, has_error_phrase, "
        f"(has_error_phrase AND n_words < {max_words}) AS is_soft404 FROM f"
    )


# -- page shape: markup density / script mass / login walls --------------
#
# The byte-level complement to the text-side quality gates: a page
# whose markup dwarfs its visible text is a shell (nav skeleton, ad
# frame, SPA bootstrap), and a page fronting a password input is a
# login wall — neither yields training text, and both are cheaper to
# drop from the BYTES than after extraction. Fully native: five
# vectorized regexp scans + exact IEEE ratio divisions, zero Python,
# zero exchanges. The script/style remover closes at the first
# </script or </style (no backreferences in the RE2∩Java set —
# documented, deterministic, identical cross-engine).

from ..kernels.wsre import JAVA_WS_BODY as _JWS

_PS_WS = "[" + _JWS + "]"
_ANY_TAG = "<[A-Za-z!/][^>]*>"
_SCRIPT_BLOCK = (
    f"(?is)<(?:script|style)(?:{_PS_WS}[^>]*)?>.*?</(?:script|style){_PS_WS}*>"
)
_FORM_TAG = f"(?i)<form(?:{_PS_WS}[^>]*)?>"
_INPUT_TAG = f"(?i)<input(?:{_PS_WS}[^>]*)?/?>"
_PASSWORD_INPUT = (
    f"(?is)<input{_PS_WS}[^>]*type{_PS_WS}*={_PS_WS}*[\"']?password"
)


def page_shape(df: DataFrame, html_col: str = "html") -> DataFrame:
    """(doc_id, html_len, n_tags, n_scripts, n_forms, n_inputs,
    visible_len, visible_ratio, tag_density, has_password,
    is_login_wall, is_markup_shell) — byte-level page-shape signals.

    ``visible_len`` = length after removing script/style blocks,
    stripping tags, collapsing whitespace; ``visible_ratio`` = that
    over html_len (NULL on empty pages); ``tag_density`` = tags per
    1000 html chars. ``is_login_wall`` = a password input exists;
    ``is_markup_shell`` = a non-empty page whose visible_ratio < 0.05
    (SPA bootstraps, nav skeletons). Ratios are single exact IEEE
    divisions — bit-identical cross-engine unrounded."""
    c = F.coalesce(F.col(html_col), F.lit(""))
    html_len = F.length(c)

    def n(pat):
        return F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))

    descripted = F.regexp_replace(c, _SCRIPT_BLOCK, " ")
    visible = F.trim(
        F.regexp_replace(
            F.regexp_replace(descripted, "(?s)<[^>]*>", " "),
            _PS_WS + "+",
            " ",
        )
    )
    visible_len = F.length(visible)
    safe = html_len.cast("double")
    return df.select(
        "doc_id",
        html_len.cast("int").alias("html_len"),
        n(_ANY_TAG).cast("int").alias("n_tags"),
        n(_SCRIPT_BLOCK).cast("int").alias("n_scripts"),
        n(_FORM_TAG).cast("int").alias("n_forms"),
        n(_INPUT_TAG).cast("int").alias("n_inputs"),
        visible_len.cast("int").alias("visible_len"),
        F.when(html_len > 0, visible_len.cast("double") / safe).alias(
            "visible_ratio"
        ),
        F.when(html_len > 0, n(_ANY_TAG).cast("double") * 1000.0 / safe).alias(
            "tag_density"
        ),
        (n(_PASSWORD_INPUT) > 0).alias("has_password"),
        (n(_PASSWORD_INPUT) > 0).alias("is_login_wall"),
        (
            (html_len > 0)
            & (visible_len.cast("double") / safe < F.lit(0.05))
        ).alias("is_markup_shell"),
    )


def sql_page_shape(rel: str, html_expr: str = "html") -> str:
    """DuckDB twin of :func:`page_shape` (same patterns, same exact
    IEEE ratio arithmetic)."""
    c = f"coalesce({html_expr}, '')"

    def q(p):
        return p.replace("'", "''")

    def n(pat):
        return f"len(regexp_extract_all({c}, '{q(pat)}'))"

    visible = (
        f"trim(regexp_replace(regexp_replace(regexp_replace({c}, "
        f"'{q(_SCRIPT_BLOCK)}', ' ', 'g'), '(?s)<[^>]*>', ' ', 'g'), "
        f"'{q(_PS_WS)}+', ' ', 'g'))"
    )
    return (
        f"WITH b AS (SELECT doc_id, length({c}) AS html_len, "
        f"CAST({n(_ANY_TAG)} AS INT) AS n_tags, "
        f"CAST({n(_SCRIPT_BLOCK)} AS INT) AS n_scripts, "
        f"CAST({n(_FORM_TAG)} AS INT) AS n_forms, "
        f"CAST({n(_INPUT_TAG)} AS INT) AS n_inputs, "
        f"length({visible}) AS visible_len, "
        f"{n(_PASSWORD_INPUT)} > 0 AS has_password FROM {rel}) "
        "SELECT doc_id, CAST(html_len AS INT) AS html_len, n_tags, "
        "n_scripts, n_forms, n_inputs, CAST(visible_len AS INT) AS visible_len, "
        "CASE WHEN html_len > 0 THEN CAST(visible_len AS DOUBLE) / "
        "CAST(html_len AS DOUBLE) END AS visible_ratio, "
        "CASE WHEN html_len > 0 THEN CAST(n_tags AS DOUBLE) * 1000.0 / "
        "CAST(html_len AS DOUBLE) END AS tag_density, "
        "has_password, has_password AS is_login_wall, "
        "html_len > 0 AND CAST(visible_len AS DOUBLE) / "
        "CAST(html_len AS DOUBLE) < 0.05 AS is_markup_shell FROM b"
    )
