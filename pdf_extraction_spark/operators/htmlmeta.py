"""Native HTML metadata extraction — the head-section complement to the
main-content extractor (kernels/htmlio.py extracts body text through the
block classifier; this stage pulls ``<head>`` metadata: title, meta
description, canonical link, OpenGraph title, document language and
declared charset).

Unlike the body extractor (which needs a real parser and runs as the
pipeline's single mapInPandas crossing), head metadata is regular enough
for anchored regexes — so this stage is FULLY NATIVE: six vectorized JVM
``regexp_extract`` scans inside one codegen'd projection, zero Python,
zero exchanges. At 10^12 documents that matters: metadata extraction is
a pure narrow map over the html column.

Cross-engine parity rules (Java regex on Spark, RE2 on DuckDB):
  * NO backreferences (RE2 has none) — quoted attribute values are
    matched by a double-quote pattern and a single-quote pattern,
    coalesced (first non-empty wins, double quotes preferred);
  * whitespace is the explicit Java ``\\s`` body ``[ \\t\\n\\x0B\\f\\r]``
    (RE2's bare ``\\s`` lacks \\x0B and Java's is ASCII-only, so the
    literal class is the only spelling both engines read identically);
  * ``(?i)``/``(?s)`` on ASCII-only literals fold identically.

Attribute-order rule (documented, deterministic): ``name=``/``rel=``/
``property=`` must precede ``content=``/``href=`` inside the tag — the
dominant real-world order; a reversed-order tag extracts empty, in both
engines alike.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..kernels.wsre import JAVA_WS_BODY

_WS = "[" + JAVA_WS_BODY + "]"


def _dq_sq(prefix: str, dq_val: str, sq_val: str) -> tuple[str, str]:
    """The two quote-variant patterns for ``prefix"val"`` / ``prefix'val'``."""
    return (
        f'{prefix}"({dq_val})"',
        f"{prefix}'({sq_val})'",
    )


def _attr_patterns(tag: str, key_attr: str, key_val: str, val_attr: str):
    """Patterns for <tag ... key_attr=["']key_val["'] ... val_attr="...">
    in both quote styles for the VALUE (the key may use either quote)."""
    prefix = (
        f"(?i)<{tag}{_WS}[^>]*{key_attr}{_WS}*={_WS}*[\"']?{key_val}[\"']?"
        f"[^>]*{val_attr}{_WS}*={_WS}*"
    )
    return _dq_sq(prefix, '[^"]*', "[^']*")


_TITLE_PAT = "(?is)<title[^>]*>(.*?)</title>"
_LANG_PAT = f"(?i)<html{_WS}[^>]*lang{_WS}*={_WS}*[\"']?([A-Za-z0-9_\\-]+)"
_CHARSET_PAT = f"(?i)<meta{_WS}[^>]*charset{_WS}*={_WS}*[\"']?([A-Za-z0-9_\\-]+)"
_DESC_DQ, _DESC_SQ = _attr_patterns("meta", "name", "description", "content")
_OG_DQ, _OG_SQ = _attr_patterns("meta", "property", "og:title", "content")
_CANON_DQ, _CANON_SQ = _attr_patterns("link", "rel", "canonical", "href")


def _x(c: Column, pat: str) -> Column:
    return F.nullif(F.regexp_extract(c, pat, 1), F.lit(""))


def _clean(c: Column) -> Column:
    """Collapse runs of whitespace and trim (titles wrap across lines)."""
    return F.nullif(F.trim(F.regexp_replace(c, _WS + "+", " ")), F.lit(""))


def with_html_meta(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Append ``page_title``, ``meta_description``, ``canonical_url``,
    ``og_title``, ``html_lang``, ``html_charset`` (NULL when absent).
    ``html_col`` is an html STRING column (decode bytes upstream via
    kernels.htmlio.decode_html_payload)."""
    c = F.coalesce(F.col(html_col), F.lit(""))
    return (
        df.withColumn("page_title", _clean(F.regexp_extract(c, _TITLE_PAT, 1)))
        .withColumn(
            "meta_description",
            _clean(F.coalesce(_x(c, _DESC_DQ), _x(c, _DESC_SQ), F.lit(""))),
        )
        .withColumn(
            "canonical_url",
            F.coalesce(_x(c, _CANON_DQ), _x(c, _CANON_SQ)),
        )
        .withColumn(
            "og_title",
            _clean(F.coalesce(_x(c, _OG_DQ), _x(c, _OG_SQ), F.lit(""))),
        )
        .withColumn("html_lang", _x(c, _LANG_PAT))
        .withColumn("html_charset", _x(c, _CHARSET_PAT))
    )


# -- meta-robots gate ---------------------------------------------------
# A page that declares <meta name="robots" content="noindex"> asked to
# stay out of indexes — crawl-derived training corpora honor it (the
# same consent class as robots.txt). Directive matching is token-wise
# over the comma/whitespace-separated content list; "none" implies
# noindex+nofollow per the de-facto standard. `\z` (not `$`) ends the
# token pattern: Java's `$` matches before a final newline, RE2's does
# not — `\z` reads identically in both.

_ROBOTS_DQ, _ROBOTS_SQ = _attr_patterns("meta", "name", "robots", "content")


def _directive_pat(name: str) -> str:
    return f"(?i)(^|[,{JAVA_WS_BODY}]){name}([,{JAVA_WS_BODY}]|\\z)"


def _has_directive(content: Column, name: str) -> Column:
    return F.coalesce(content.rlike(_directive_pat(name)), F.lit(False))


def with_robots_flags(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Append ``robots_content`` (the raw directive list, NULL when the
    tag is absent), ``noindex``, ``nofollow`` and ``indexable`` (= NOT
    noindex — absent tag means indexable, the crawler default). Fully
    native: two regexp scans + token-boundary rlikes, zero exchanges."""
    c = F.coalesce(F.col(html_col), F.lit(""))
    content = F.coalesce(_x(c, _ROBOTS_DQ), _x(c, _ROBOTS_SQ))
    df = df.withColumn("robots_content", content)
    rc = F.col("robots_content")
    noindex = _has_directive(rc, "noindex") | _has_directive(rc, "none")
    nofollow = _has_directive(rc, "nofollow") | _has_directive(rc, "none")
    return (
        df.withColumn("noindex", noindex)
        .withColumn("nofollow", nofollow)
        .withColumn("indexable", ~noindex)
    )


def sql_robots_flags(rel: str, html_expr: str = "html") -> str:
    """DuckDB twin of :func:`with_robots_flags` (doc_id + appended
    columns; identical patterns, `\\z` anchors both sides)."""
    c = f"coalesce({html_expr}, '')"
    content = f"coalesce({_sql_x(c, _ROBOTS_DQ)}, {_sql_x(c, _ROBOTS_SQ)})"

    def has(name):
        p = _directive_pat(name).replace("'", "''")
        return f"coalesce(regexp_matches(rc, '{p}'), FALSE)"

    return (
        f"WITH r AS (SELECT doc_id, {content} AS rc FROM {rel}) "
        "SELECT doc_id, rc AS robots_content, "
        f"({has('noindex')} OR {has('none')}) AS noindex, "
        f"({has('nofollow')} OR {has('none')}) AS nofollow, "
        f"NOT ({has('noindex')} OR {has('none')}) AS indexable FROM r"
    )


def _sql_x(expr: str, pat: str) -> str:
    p = pat.replace("'", "''")
    return f"nullif(regexp_extract({expr}, '{p}', 1), '')"


def _sql_clean(expr: str) -> str:
    ws = _WS.replace("'", "''")
    return f"nullif(trim(regexp_replace({expr}, '{ws}+', ' ', 'g')), '')"


def sql_html_meta(rel: str, html_expr: str = "html") -> str:
    """DuckDB twin of :func:`with_html_meta` (projects doc_id + the
    appended columns; identical pattern strings, RE2-compatible by
    construction)."""
    c = f"coalesce({html_expr}, '')"
    tp = _TITLE_PAT.replace("'", "''")
    title_raw = f"regexp_extract({c}, '{tp}', 1)"
    desc_raw = f"coalesce({_sql_x(c, _DESC_DQ)}, {_sql_x(c, _DESC_SQ)}, '')"
    og_raw = f"coalesce({_sql_x(c, _OG_DQ)}, {_sql_x(c, _OG_SQ)}, '')"
    cols = [
        f"{_sql_clean(title_raw)} AS page_title",
        f"{_sql_clean(desc_raw)} AS meta_description",
        f"coalesce({_sql_x(c, _CANON_DQ)}, {_sql_x(c, _CANON_SQ)}) AS canonical_url",
        f"{_sql_clean(og_raw)} AS og_title",
        f"{_sql_x(c, _LANG_PAT)} AS html_lang",
        f"{_sql_x(c, _CHARSET_PAT)} AS html_charset",
    ]
    return f"SELECT doc_id, {', '.join(cols)} FROM {rel}"


# --------------------------------------------------------------------------
# Publication-date extraction (meta / <time> / JSON-LD / URL path)
# --------------------------------------------------------------------------

# Priority order mirrors how news/article pipelines trust the signals:
# explicit OpenGraph article metadata first, then the HTML5 <time>
# element, then schema.org JSON-LD, then the /YYYY/MM/DD/ URL
# convention. Each source keeps the RE2∩Java discipline of the head
# scanner above (dual quote variants, no backreferences, literal Java
# \s body). The parsed pub_date is the ISO day PREFIX only, via
# try_cast — engine date parsers never see free-form timestamps (zone
# suffixes, 'T' separators), which is where cross-engine parsing
# conventions would diverge; invalid days ('2023-13-99') try_cast to
# NULL in both engines.
_PUB_DQ, _PUB_SQ = _attr_patterns(
    "meta", "property", "article:published_time", "content"
)
_TIME_DT_DQ = f'(?i)<time{_WS}[^>]*datetime{_WS}*={_WS}*"([^"]*)"'
_TIME_DT_SQ = f"(?i)<time{_WS}[^>]*datetime{_WS}*={_WS}*'([^']*)'"
_JSONLD_PUB = f'"datePublished"{_WS}*:{_WS}*"([^"]*)"'
_URL_DATE = r"/([0-9]{4})/([0-9]{2})/([0-9]{2})(/|\z)"
_ISO_DAY = r"^([0-9]{4}-[0-9]{2}-[0-9]{2})"


def with_pub_date(
    df: DataFrame, html_col: str = "html", url_col: str | None = "url"
) -> DataFrame:
    """Append ``pub_date_src`` ('meta' | 'time' | 'jsonld' | 'url' |
    NULL), ``pub_date_raw`` (the matched string; for 'url' the
    constructed YYYY-MM-DD) and ``pub_date`` (DATE, NULL when the raw
    form has no castable ISO-day prefix). Fully native: four regexp
    scans + one coalesce inside one codegen'd projection, zero
    exchanges. Pass ``url_col=None`` when no URL column exists."""
    c = F.coalesce(F.col(html_col), F.lit(""))
    meta = F.coalesce(_x(c, _PUB_DQ), _x(c, _PUB_SQ))
    time_ = F.coalesce(_x(c, _TIME_DT_DQ), _x(c, _TIME_DT_SQ))
    jsonld = _x(c, _JSONLD_PUB)
    if url_col is not None:
        u = F.coalesce(F.col(url_col), F.lit(""))
        y = F.nullif(F.regexp_extract(u, _URL_DATE, 1), F.lit(""))
        url_day = F.when(
            y.isNotNull(),
            F.concat_ws(
                "-",
                y,
                F.regexp_extract(u, _URL_DATE, 2),
                F.regexp_extract(u, _URL_DATE, 3),
            ),
        )
    else:
        url_day = F.lit(None).cast("string")
    raw = F.coalesce(meta, time_, jsonld, url_day)
    src = (
        F.when(meta.isNotNull(), F.lit("meta"))
        .when(time_.isNotNull(), F.lit("time"))
        .when(jsonld.isNotNull(), F.lit("jsonld"))
        .when(url_day.isNotNull(), F.lit("url"))
    )
    df = df.withColumn("pub_date_src", src).withColumn("pub_date_raw", raw)
    return df.withColumn(
        "pub_date",
        F.expr(
            "try_cast(nullif(regexp_extract(pub_date_raw, "
            f"'{_ISO_DAY}', 1), '') AS DATE)"
        ),
    )


def sql_pub_date(rel: str, html_expr: str = "html", url_expr: str = "url") -> str:
    """DuckDB twin of :func:`with_pub_date` (doc_id + appended columns;
    identical pattern strings; try_cast NULLs invalid days in both
    engines). Pass ``url_expr=None`` to mirror ``url_col=None``."""
    c = f"coalesce({html_expr}, '')"
    meta = f"coalesce({_sql_x(c, _PUB_DQ)}, {_sql_x(c, _PUB_SQ)})"
    time_ = f"coalesce({_sql_x(c, _TIME_DT_DQ)}, {_sql_x(c, _TIME_DT_SQ)})"
    jsonld = _sql_x(c, _JSONLD_PUB)
    ud = _URL_DATE.replace("'", "''")
    if url_expr is not None:
        u = f"coalesce({url_expr}, '')"
        url_day = (
            f"CASE WHEN nullif(regexp_extract({u}, '{ud}', 1), '') IS NOT NULL "
            f"THEN concat_ws('-', regexp_extract({u}, '{ud}', 1), "
            f"regexp_extract({u}, '{ud}', 2), regexp_extract({u}, '{ud}', 3)) "
            "END"
        )
    else:
        url_day = "CAST(NULL AS VARCHAR)"
    iso = _ISO_DAY.replace("'", "''")
    return (
        f"WITH p AS (SELECT doc_id, {meta} AS m, {time_} AS tm, "
        f"{jsonld} AS jl, {url_day} AS ud FROM {rel}) "
        "SELECT doc_id, "
        "CASE WHEN m IS NOT NULL THEN 'meta' WHEN tm IS NOT NULL THEN 'time' "
        "WHEN jl IS NOT NULL THEN 'jsonld' WHEN ud IS NOT NULL THEN 'url' END "
        "AS pub_date_src, "
        "coalesce(m, tm, jl, ud) AS pub_date_raw, "
        f"try_cast(nullif(regexp_extract(coalesce(m, tm, jl, ud), '{iso}', 1), '') "
        "AS DATE) AS pub_date FROM p"
    )


# --------------------------------------------------------------------------
# Head-link profile: meta-refresh redirects, feed discovery, AMP alternate
# --------------------------------------------------------------------------

# Meta-refresh shells are the <head>-level cousin of soft-404s: a page
# whose only content is "content=0;url=elsewhere" is a redirect, not a
# document, and crawl pipelines either follow it or drop it. Feed and
# AMP links are per-page crawl-seed signals. All scans keep the
# RE2∩Java discipline (dual quote variants, no backreferences, the
# literal Java \s body, no \b).
_REFRESH_DQ, _REFRESH_SQ = _attr_patterns("meta", "http-equiv", "refresh", "content")
# inside the content value: [delay][;[ ]url=TARGET] — quotes optional
_REFRESH_DELAY = "^[ \\t]*([0-9]+)"
_REFRESH_URL = "(?i);[ \\t]*url[ \\t]*=[ \\t]*['\"]?([^'\" >]+)"
_LINK_TAG = f"(?i)<link[{JAVA_WS_BODY}][^>]*>"
_REL_ALTERNATE = f"(?i)rel{_WS}*={_WS}*[\"']?alternate"
_FEED_TYPE = r"(?i)application/(rss|atom)\+xml"
_REL_AMP = f"(?i)rel{_WS}*={_WS}*[\"']?amphtml"
_HREF_DQ = f'(?i)href{_WS}*={_WS}*"([^"]*)"'
_HREF_SQ = f"(?i)href{_WS}*={_WS}*'([^']*)'"
_HREFLANG = f"(?i)hreflang{_WS}*={_WS}*[\"']?([A-Za-z0-9_\\-]+)"


def _tag_href(tag: Column) -> Column:
    return F.coalesce(_x(tag, _HREF_DQ), _x(tag, _HREF_SQ))


def with_link_profile(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Append ``refresh_delay`` (INT, NULL when no meta refresh or no
    leading number), ``refresh_url``, ``is_meta_redirect`` (a refresh
    with a target — the redirect-shell verdict), ``feed_urls``
    (document-order hrefs of rel=alternate rss/atom links), ``n_feeds``
    and ``amp_url``. One regexp_extract_all tag scan + array HOFs, zero
    exchanges, zero Python."""
    c = F.coalesce(F.col(html_col), F.lit(""))
    content = F.coalesce(_x(c, _REFRESH_DQ), _x(c, _REFRESH_SQ))
    delay = F.expr(
        f"try_cast(nullif(regexp_extract({html_col}_rc, '{_REFRESH_DELAY}', 1), '') AS INT)"
    )
    tags = F.regexp_extract_all(c, F.lit(_LINK_TAG), F.lit(0))
    feed_tags = F.filter(
        tags,
        lambda t: t.rlike(_REL_ALTERNATE) & t.rlike(_FEED_TYPE),
    )
    feeds = F.filter(
        F.transform(feed_tags, _tag_href), lambda u: u.isNotNull()
    )
    amp = F.get(
        F.filter(
            F.transform(
                F.filter(tags, lambda t: t.rlike(_REL_AMP)), _tag_href
            ),
            lambda u: u.isNotNull(),
        ),
        0,
    )
    df = df.withColumn(f"{html_col}_rc", content)
    url = F.nullif(
        F.regexp_extract(F.coalesce(F.col(f"{html_col}_rc"), F.lit("")), _REFRESH_URL, 1),
        F.lit(""),
    )
    return (
        df.withColumn("refresh_delay", delay)
        .withColumn("refresh_url", url)
        .withColumn("is_meta_redirect", url.isNotNull())
        .withColumn("feed_urls", feeds)
        .withColumn("n_feeds", F.size(feeds).cast("int"))
        .withColumn("amp_url", amp)
        .drop(f"{html_col}_rc")
    )


def sql_link_profile(rel: str, html_expr: str = "html") -> str:
    """DuckDB twin of :func:`with_link_profile` (doc_id + appended
    columns; identical pattern text; list indexing [1] mirrors
    F.get(..., 0) — both NULL on empty)."""
    c = f"coalesce({html_expr}, '')"
    content = f"coalesce({_sql_x(c, _REFRESH_DQ)}, {_sql_x(c, _REFRESH_SQ)})"
    dpat = _REFRESH_DELAY.replace("'", "''").replace("\\", "\\")
    upat = _REFRESH_URL.replace("'", "''")
    lt = _LINK_TAG.replace("'", "''")
    ra = _REL_ALTERNATE.replace("'", "''")
    ft = _FEED_TYPE.replace("'", "''")
    ramp = _REL_AMP.replace("'", "''")
    hd = _HREF_DQ.replace("'", "''")
    hs = _HREF_SQ.replace("'", "''")
    href = (
        f"coalesce(nullif(regexp_extract(t, '{hd}', 1), ''), "
        f"nullif(regexp_extract(t, '{hs}', 1), ''))"
    )
    return (
        f"WITH p AS (SELECT doc_id, {content} AS rc, "
        f"regexp_extract_all({c}, '{lt}') AS tags FROM {rel}), "
        "q AS (SELECT doc_id, rc, "
        f"list_filter(list_transform(list_filter(tags, "
        f"t -> regexp_matches(t, '{ra}') AND regexp_matches(t, '{ft}')), "
        f"t -> {href}), u -> u IS NOT NULL) AS feeds, "
        f"list_filter(list_transform(list_filter(tags, "
        f"t -> regexp_matches(t, '{ramp}')), t -> {href}), "
        "u -> u IS NOT NULL) AS amps FROM p) "
        "SELECT doc_id, "
        f"try_cast(nullif(regexp_extract(rc, '{dpat}', 1), '') AS INT) "
        "AS refresh_delay, "
        f"nullif(regexp_extract(coalesce(rc, ''), '{upat}', 1), '') AS refresh_url, "
        f"nullif(regexp_extract(coalesce(rc, ''), '{upat}', 1), '') IS NOT NULL "
        "AS is_meta_redirect, "
        "feeds AS feed_urls, CAST(len(feeds) AS INT) AS n_feeds, "
        "amps[1] AS amp_url FROM q"
    )


def hreflang_alternates(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Exploded (doc_id, hreflang, href) rows from
    ``<link rel="alternate" hreflang=.. href=..>`` tags — the
    multilingual-site map cross-lingual dedup joins on. Tags missing
    either attribute drop; document order is not part of the contract
    (consumers key on (doc_id, hreflang))."""
    c = F.coalesce(F.col(html_col), F.lit(""))
    tags = F.filter(
        F.regexp_extract_all(c, F.lit(_LINK_TAG), F.lit(0)),
        lambda t: t.rlike(_REL_ALTERNATE) & t.rlike(_HREFLANG),
    )
    out = df.select(
        "doc_id", F.explode(tags).alias("tag")
    ).select(
        "doc_id",
        F.nullif(F.regexp_extract(F.col("tag"), _HREFLANG, 1), F.lit("")).alias(
            "hreflang"
        ),
        _tag_href(F.col("tag")).alias("href"),
    )
    return out.filter(F.col("hreflang").isNotNull() & F.col("href").isNotNull())


def sql_hreflang_alternates(rel: str, html_expr: str = "html") -> str:
    """DuckDB twin of :func:`hreflang_alternates`."""
    c = f"coalesce({html_expr}, '')"
    lt = _LINK_TAG.replace("'", "''")
    ra = _REL_ALTERNATE.replace("'", "''")
    hl = _HREFLANG.replace("'", "''")
    hd = _HREF_DQ.replace("'", "''")
    hs = _HREF_SQ.replace("'", "''")
    return (
        f"WITH t AS (SELECT doc_id, unnest(list_filter(regexp_extract_all({c}, "
        f"'{lt}'), t -> regexp_matches(t, '{ra}') AND "
        f"regexp_matches(t, '{hl}'))) AS tag FROM {rel}) "
        "SELECT doc_id, "
        f"nullif(regexp_extract(tag, '{hl}', 1), '') AS hreflang, "
        f"coalesce(nullif(regexp_extract(tag, '{hd}', 1), ''), "
        f"nullif(regexp_extract(tag, '{hs}', 1), '')) AS href "
        f"FROM t WHERE nullif(regexp_extract(tag, '{hl}', 1), '') IS NOT NULL "
        f"AND coalesce(nullif(regexp_extract(tag, '{hd}', 1), ''), "
        f"nullif(regexp_extract(tag, '{hs}', 1), '')) IS NOT NULL"
    )


# --------------------------------------------------------------------------
# Meta keywords + keyword-stuffing verdict
# --------------------------------------------------------------------------

_KW_DQ, _KW_SQ = _attr_patterns("meta", "name", "keywords", "content")
KEYWORD_STUFF_MAX = 25


def with_meta_keywords(
    df: DataFrame, html_col: str = "html", max_keywords: int = KEYWORD_STUFF_MAX
) -> DataFrame:
    """Append ``keywords`` (trimmed, non-empty, document order),
    ``n_keywords``, ``n_dup_keywords`` (case-folded duplicates — the
    classic SEO-stuffing signal) and ``is_keyword_stuffed`` (> max OR
    any duplicate). Absent tag → empty array, 0, 0, false. One regexp
    scan + array HOFs, zero exchanges."""
    c = F.coalesce(F.col(html_col), F.lit(""))
    raw = F.coalesce(_x(c, _KW_DQ), _x(c, _KW_SQ), F.lit(""))
    kws = F.filter(
        F.transform(F.split(raw, ","), lambda k: F.trim(k)),
        lambda k: k != F.lit(""),
    )
    n = F.size(kws)
    ndup = n - F.size(F.array_distinct(F.transform(kws, F.lower)))
    return (
        df.withColumn("keywords", kws)
        .withColumn("n_keywords", n.cast("int"))
        .withColumn("n_dup_keywords", ndup.cast("int"))
        .withColumn(
            "is_keyword_stuffed",
            (n > F.lit(max_keywords)) | (ndup > F.lit(0)),
        )
    )


def sql_meta_keywords(
    rel: str, html_expr: str = "html", max_keywords: int = KEYWORD_STUFF_MAX
) -> str:
    """DuckDB twin of :func:`with_meta_keywords`."""
    c = f"coalesce({html_expr}, '')"
    raw = f"coalesce({_sql_x(c, _KW_DQ)}, {_sql_x(c, _KW_SQ)}, '')"
    return (
        f"WITH k AS (SELECT doc_id, list_filter(list_transform("
        f"string_split({raw}, ','), x -> trim(x)), x -> x <> '') AS kws "
        f"FROM {rel}) "
        "SELECT doc_id, kws AS keywords, CAST(len(kws) AS INT) AS n_keywords, "
        "CAST(len(kws) - len(list_distinct(list_transform(kws, x -> lower(x)))) "
        "AS INT) AS n_dup_keywords, "
        f"(len(kws) > {max_keywords} OR len(kws) > "
        "len(list_distinct(list_transform(kws, x -> lower(x))))) "
        "AS is_keyword_stuffed FROM k"
    )


# --------------------------------------------------------------------------
# OpenGraph / Twitter card
# --------------------------------------------------------------------------
# The share-card protocol block: og:type drives page-type stratification
# (article vs product vs video — the coarse page taxonomy available
# without a content model), og:image/og:url feed multimodal and
# canonicalization joins, twitter:card is the de-facto second namespace.
# Same machinery as the head scanner: dual quote-variant attribute
# patterns, first-non-empty-wins coalesce, fully native projection.

_OGT_DQ, _OGT_SQ = _attr_patterns("meta", "property", "og:type", "content")
_OGI_DQ, _OGI_SQ = _attr_patterns("meta", "property", "og:image", "content")
_OGU_DQ, _OGU_SQ = _attr_patterns("meta", "property", "og:url", "content")
_OGD_DQ, _OGD_SQ = _attr_patterns(
    "meta", "property", "og:description", "content"
)
_OGS_DQ, _OGS_SQ = _attr_patterns(
    "meta", "property", "og:site_name", "content"
)
_TWC_DQ, _TWC_SQ = _attr_patterns("meta", "name", "twitter:card", "content")

_OG_CARD_FIELDS = [
    ("og_type", _OGT_DQ, _OGT_SQ, False),
    ("og_image", _OGI_DQ, _OGI_SQ, False),
    ("og_url", _OGU_DQ, _OGU_SQ, False),
    ("og_description", _OGD_DQ, _OGD_SQ, True),  # prose: ws-collapsed
    ("og_site_name", _OGS_DQ, _OGS_SQ, True),
    ("twitter_card", _TWC_DQ, _TWC_SQ, False),
]


def with_og_card(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Append ``og_type, og_image, og_url, og_description, og_site_name,
    twitter_card`` (NULL when absent) plus ``has_og_card`` (any og:*
    field present). URL-shaped fields keep their raw value; prose
    fields are whitespace-collapsed like title/description."""
    c = F.coalesce(F.col(html_col), F.lit(""))
    out = df
    for name, dq, sq, prose in _OG_CARD_FIELDS:
        v = F.coalesce(_x(c, dq), _x(c, sq))
        if prose:
            v = _clean(F.coalesce(v, F.lit("")))
        out = out.withColumn(name, v)
    has = F.lit(False)
    for name, _, _, _ in _OG_CARD_FIELDS[:-1]:  # og:* only, not twitter
        has = has | F.col(name).isNotNull()
    return out.withColumn("has_og_card", has)


def sql_og_card(rel: str, html_expr: str = "html") -> str:
    """DuckDB twin of :func:`with_og_card`."""
    c = f"coalesce({html_expr}, '')"
    cols = []
    raw = {}
    for name, dq, sq, prose in _OG_CARD_FIELDS:
        v = f"coalesce({_sql_x(c, dq)}, {_sql_x(c, sq)})"
        if prose:
            v = _sql_clean(f"coalesce({v}, '')")
        raw[name] = v
        cols.append(f"{v} AS {name}")
    og_names = [n for n, _, _, _ in _OG_CARD_FIELDS[:-1]]
    has = " OR ".join(f"{raw[n]} IS NOT NULL" for n in og_names)
    cols.append(f"coalesce({has}, FALSE) AS has_og_card")
    return f"SELECT doc_id, {', '.join(cols)} FROM {rel}"
