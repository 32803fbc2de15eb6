"""Corpus term statistics: PMI collocations and TF-IDF key terms.

Two corpus-analysis staples a training-data pipeline runs before
tokenizer/vocabulary decisions and for corpus cards:

* :func:`pmi_collocations` — pointwise mutual information over adjacent
  token pairs (Church & Hanks 1990), the standard collocation /
  multi-word-expression miner ("new york", "machine learning").
* :func:`doc_key_terms` — per-document TF-IDF top-k terms (Sparck
  Jones 1972), the corpus-card "what is this document about" signal.

Both use the engine's fixed-point ln device (see
textanalysis.with_unigram_entropy): the ONLY float op per distinct
count is one ln() rounded to int64 at 10⁹ scale — engines' ln()
disagree by ~1000 ulps, far below half a quantum — after which all
arithmetic is exact associative int64, so scores are bit-identical
across engines, partitionings and cluster sizes with no ordered-fold
machinery.

Scale shapes:
* PMI: tokenize → one doc-keyed window for the adjacent pair (documents
  are length-bounded, so the window partition is too — the lm_score
  contract), then VOCABULARY-keyed count tables and joins; the
  min_count filter prunes the pair table before any join. No unbounded
  window, no Python, no broadcast of corpus-sized state (count tables
  join key-to-key; AQE may broadcast when they fit).
* TF-IDF: two combinable groupBys for tf/df + a term-keyed join; top-k
  per doc via slice(array_sort(collect_list)) whose buffer is bounded
  by the DOCUMENT's distinct-term count (doc-bounded, the hostcap
  local-stage argument), never corpus-sized.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ILN_SQL = "CAST(round(ln(CAST({x} AS DOUBLE)) * 1e9) AS BIGINT)"


def _iln(c: Column) -> Column:
    """I(x) = round(ln(x)·10⁹) as int64 — the shared fixed-point ln."""
    return F.round(F.log(c.cast("double")) * F.lit(1e9)).cast("long")


def _words(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    from .curation import _lower_words

    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            _lower_words(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("pos", "tok"),
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
) -> DataFrame:
    """(w1, w2, n_pair, pmi): PMI of adjacent token pairs occurring ≥
    ``min_count`` times. With B = total bigrams, N = total tokens:
    pmi = ln( (n_pair/B) / ((c1/N)·(c2/N)) )
        = [I(n_pair) − I(B) − I(c1) − I(c2) + 2·I(N)] / 10⁹
    — five rounded ln() calls per surviving pair, combined in exact
    int64, divided once by the 10⁹ quantum (one IEEE op, identical in
    both engines). Result rounded to 6 decimals in the integer domain
    is unnecessary: the division by 1e9 of an int64 is already exact
    parity, so the raw double ships."""
    from pyspark.sql import Window

    pt = _words(df, text_col, id_col)
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        pt.withColumn("w2", F.lead("tok").over(w))
        .filter(F.col("w2").isNotNull())
        .select(F.col("tok").alias("w1"), "w2")
    )
    pair_counts = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    uni = pt.groupBy("tok").agg(F.count("*").alias("c"))
    totals = pt.groupBy().agg(F.count("*").alias("n_tok"))
    pair_total = pairs.groupBy().agg(F.count("*").alias("n_big"))
    j = (
        pair_counts.join(
            uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1")), "w1"
        )
        .join(
            uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2")), "w2"
        )
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(pair_total))
    )
    pmi_nano = (
        _iln(F.col("n_pair"))
        - _iln(F.col("n_big"))
        - _iln(F.col("c1"))
        - _iln(F.col("c2"))
        + F.lit(2) * _iln(F.col("n_tok"))
    )
    return j.select(
        "w1",
        "w2",
        "n_pair",
        (pmi_nano.cast("double") / F.lit(1e9)).alias("pmi"),
    )


def sql_pmi_collocations(
    rel: str = "documents", text_expr: str = "text", min_count: int = 5
) -> str:
    """DuckDB twin of :func:`pmi_collocations` — identical tokenizer,
    pair construction (pos self-join ≡ Spark's doc-keyed lead window),
    fixed-point ln and integer combination."""
    from .curation import _sql_lower_words

    toks = _sql_lower_words(f"coalesce({text_expr}, '')")
    i = _ILN_SQL.format
    return (
        f"WITH t AS (SELECT doc_id, {toks} AS toks FROM {rel}), "
        "pt AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok FROM ("
        "SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t)), "
        "pairs AS (SELECT a.tok AS w1, b.tok AS w2 FROM pt a JOIN pt b "
        "ON a.doc_id = b.doc_id AND b.pos = a.pos + 1), "
        "pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair FROM pairs "
        f"GROUP BY w1, w2 HAVING count(*) >= {min_count}), "
        "uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM pt GROUP BY tok), "
        "tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tok FROM pt), "
        "bt AS (SELECT CAST(count(*) AS BIGINT) AS n_big FROM pairs) "
        "SELECT pc.w1, pc.w2, pc.n_pair, "
        "CAST("
        + i(x="pc.n_pair") + " - " + i(x="bt.n_big") + " - "
        + i(x="u1.c") + " - " + i(x="u2.c") + " + 2 * " + i(x="tot.n_tok")
        + " AS DOUBLE) / 1e9 AS pmi "
        "FROM pc JOIN uni u1 ON pc.w1 = u1.tok "
        "JOIN uni u2 ON pc.w2 = u2.tok CROSS JOIN tot CROSS JOIN bt"
    )


def doc_key_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """(doc_id, term, tf, score): each document's top-``k`` TF-IDF
    terms. score_nano = tf · (I(n_docs) − I(df)) — the classic
    tf·ln(N/df), integer end-to-end (ties broken by term asc, exact in
    both engines because the score IS an integer). Terms appearing in
    every doc score 0 and still rank (deterministically) when nothing
    beats them. n_docs counts docs WITH tokens — both engines derive it
    from the tf table.

    Returned score is the nano-scaled integer divided by 1e9 (exact
    parity, one IEEE division)."""
    words = _words(df, text_col, id_col).select("doc_id", "tok")
    tf = words.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = tf.select("doc_id").distinct().groupBy().agg(
        F.count("*").alias("n_docs")
    )
    scored = tf.join(dfreq, "tok").crossJoin(F.broadcast(n_docs)).select(
        "doc_id",
        F.col("tok").alias("term"),
        "tf",
        (
            F.col("tf") * (_iln(F.col("n_docs")) - _iln(F.col("df")))
        ).alias("score_nano"),
    )
    top = scored.groupBy("doc_id").agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("score_nano")).alias("neg"),
                        F.col("term"),
                        F.col("tf"),
                        F.col("score_nano"),
                    )
                )
            ),
            1,
            k,
        ).alias("top")
    )
    return top.select(
        "doc_id", F.explode("top").alias("e")
    ).select(
        "doc_id",
        F.col("e.term").alias("term"),
        F.col("e.tf").alias("tf"),
        (F.col("e.score_nano").cast("double") / F.lit(1e9)).alias("score"),
    )


def sql_doc_key_terms(
    rel: str = "documents", text_expr: str = "text", k: int = 3
) -> str:
    """DuckDB twin of :func:`doc_key_terms` (window rank at oracle
    scale; same integer score and (score desc, term asc) tie-break)."""
    from .curation import _sql_lower_words

    toks = _sql_lower_words(f"coalesce({text_expr}, '')")
    i = _ILN_SQL.format
    return (
        f"WITH t AS (SELECT doc_id, {toks} AS toks FROM {rel}), "
        "w AS (SELECT doc_id, unnest(toks) AS tok FROM t), "
        "tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf "
        "FROM w GROUP BY doc_id, tok), "
        "dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok), "
        "nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf), "
        "scored AS (SELECT tf.doc_id, tf.tok AS term, tf.tf, "
        "tf.tf * (" + i(x="nd.n_docs") + " - " + i(x="dfreq.df") + ") AS score_nano "
        "FROM tf JOIN dfreq ON tf.tok = dfreq.tok CROSS JOIN nd), "
        "ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
        "ORDER BY score_nano DESC, term) AS rk FROM scored) "
        "SELECT doc_id, term, tf, CAST(score_nano AS DOUBLE) / 1e9 AS score "
        f"FROM ranked WHERE rk <= {k}"
    )


# ---------------------------------------------------------------------------
# TextRank keyphrase terms (Mihalcea & Tarau, EMNLP 2004)
# ---------------------------------------------------------------------------
#
# The graph-based complement to doc_key_terms' TF-IDF: per document,
# build the token co-occurrence graph (window 2 — adjacent tokens,
# undirected, edge weight = co-occurrence count) and rank tokens with
# the weighted PageRank recursion
#     r(v) ← (1−d) + d · Σ_{u∈N(v)} w(u,v)/wdeg(u) · r(u)
# (TextRank keeps the (1−d) constant un-normalized — the paper's
# convention, not PageRank's 1/N split). Top-k tokens per doc are the
# document's keyphrase seeds.
#
# Fixed-point int64 device (the components.pagerank discipline): ranks
# live at 10^12 scale, each edge contributes floor(r(u)·w/wdeg(u)) —
# computed independently per edge, so the dst-keyed sum is exact,
# associative and partitioning-proof — and the damping is integer
# percent: r' = (100−d)·SCALE DIV 100 + d·S DIV 100. The recursion is
# unrolled n_iter times in both engines with identical integer ops, so
# ranks are bit-identical. Final display rank half-up-rounds to the
# micro quantum IN THE INTEGER DOMAIN (the pagerank rule — no float
# half-tie can diverge).
#
# Scale shape: every frame is (doc, token)- or (doc, edge)-keyed —
# the graph NEVER crosses documents, so each round is one narrow join
# + one map-side-combinable sum keyed by (doc, token); the only window
# is the doc-bounded adjacency lead. Isolated tokens (single-token
# docs, or docs whose only pairs are self-pairs) have no edges and are
# excluded — TextRank is undefined on them (documented).


TEXTRANK_SCALE = 10**12


def textrank_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_iter: int = 4,
    damping_pct: int = 85,
) -> DataFrame:
    """(doc_id, term, wdeg, rank_micro): each document's top-``k``
    tokens by TextRank over the adjacency co-occurrence graph —
    ``rank_micro`` is the 10^12-scaled fixed-point rank half-up-rounded
    to micro units (10^6 = rank 1.0); ties break by term asc."""
    words = _words(df, text_col, id_col)
    from pyspark.sql import Window

    wnd = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        words.withColumn("w2", F.lead("tok").over(wnd))
        .filter(F.col("w2").isNotNull() & (F.col("tok") != F.col("w2")))
        .select(
            "doc_id",
            F.least(F.col("tok"), F.col("w2")).alias("lo"),
            F.greatest(F.col("tok"), F.col("w2")).alias("hi"),
        )
    )
    edges = pairs.groupBy("doc_id", "lo", "hi").agg(F.count("*").alias("w"))
    dedges = edges.select(
        "doc_id", F.col("lo").alias("u"), F.col("hi").alias("v"), "w"
    ).unionByName(
        edges.select(
            "doc_id", F.col("hi").alias("u"), F.col("lo").alias("v"), "w"
        )
    )
    deg = dedges.groupBy("doc_id", "u").agg(F.sum("w").alias("wdeg"))
    # persisted ONCE and handed to all n_iter rounds + the final join —
    # an unpersist here would fire before the returned (lazy) frame ever
    # executes and silently re-run the adjacency window per round; the
    # cache is returned for release (the pagerank static-frame rule)
    g = dedges.join(deg, ["doc_id", "u"]).persist()

    base = (100 - damping_pct) * TEXTRANK_SCALE // 100
    ranks = g.select("doc_id", F.col("u").alias("tok")).distinct().select(
        "doc_id", "tok", F.lit(TEXTRANK_SCALE).alias("r")
    )
    for _ in range(n_iter):
        contrib = g.join(
            ranks.select(
                "doc_id", F.col("tok").alias("u"), F.col("r").alias("r_u")
            ),
            ["doc_id", "u"],
        ).select(
            "doc_id",
            F.col("v").alias("tok"),
            F.expr("r_u * w DIV wdeg").alias("c"),
        )
        ranks = contrib.groupBy("doc_id", "tok").agg(
            (
                F.lit(base)
                + F.expr(f"{damping_pct} * sum(c) DIV 100")
            ).alias("r")
        )
    final = ranks.join(
        deg.select("doc_id", F.col("u").alias("tok"), "wdeg"),
        ["doc_id", "tok"],
    ).select(
        "doc_id",
        "tok",
        "wdeg",
        F.expr("(r + 500000) DIV 1000000").alias("rank_micro"),
    )
    top = final.groupBy("doc_id").agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("rank_micro")).alias("neg"),
                        F.col("tok").alias("term"),
                        F.col("wdeg"),
                        F.col("rank_micro"),
                    )
                )
            ),
            1,
            k,
        ).alias("top")
    )
    return top.select("doc_id", F.explode("top").alias("e")).select(
        "doc_id",
        F.col("e.term").alias("term"),
        F.col("e.wdeg").alias("wdeg"),
        F.col("e.rank_micro").alias("rank_micro"),
    )


def sql_textrank_terms(
    rel: str = "documents",
    text_expr: str = "text",
    k: int = 3,
    n_iter: int = 4,
    damping_pct: int = 85,
) -> str:
    """DuckDB twin of :func:`textrank_terms` — identical tokenizer,
    adjacency canonicalization, unrolled integer recursion, and
    (rank desc, term asc) window top-k at oracle scale."""
    from .curation import _sql_lower_words

    toks = _sql_lower_words(f"coalesce({text_expr}, '')")
    base = (100 - damping_pct) * TEXTRANK_SCALE // 100
    parts = [
        f"t AS (SELECT doc_id, {toks} AS toks FROM {rel})",
        "pt AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok FROM ("
        "SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t))",
        "pairs AS (SELECT a.doc_id, least(a.tok, b.tok) AS lo, "
        "greatest(a.tok, b.tok) AS hi FROM pt a JOIN pt b "
        "ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 AND a.tok <> b.tok)",
        "edges AS (SELECT doc_id, lo, hi, CAST(count(*) AS BIGINT) AS w "
        "FROM pairs GROUP BY doc_id, lo, hi)",
        "dedges AS (SELECT doc_id, lo AS u, hi AS v, w FROM edges "
        "UNION ALL SELECT doc_id, hi AS u, lo AS v, w FROM edges)",
        "deg AS (SELECT doc_id, u, CAST(sum(w) AS BIGINT) AS wdeg "
        "FROM dedges GROUP BY doc_id, u)",
        "g AS (SELECT dedges.doc_id, dedges.u, dedges.v, dedges.w, deg.wdeg "
        "FROM dedges JOIN deg ON dedges.doc_id = deg.doc_id AND dedges.u = deg.u)",
        f"r0 AS (SELECT DISTINCT doc_id, u AS tok, CAST({TEXTRANK_SCALE} AS BIGINT) "
        "AS r FROM g)",
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            f"r{i} AS (SELECT g.doc_id, g.v AS tok, "
            f"CAST({base} + {damping_pct} * sum(p.r * g.w // g.wdeg) // 100 "
            "AS BIGINT) AS r "
            f"FROM g JOIN r{i - 1} p ON g.doc_id = p.doc_id AND g.u = p.tok "
            "GROUP BY g.doc_id, g.v)"
        )
    parts.append(
        f"fin AS (SELECT r{n_iter}.doc_id, r{n_iter}.tok AS term, deg.wdeg, "
        f"CAST((r + 500000) // 1000000 AS BIGINT) AS rank_micro "
        f"FROM r{n_iter} JOIN deg ON r{n_iter}.doc_id = deg.doc_id "
        f"AND r{n_iter}.tok = deg.u)"
    )
    parts.append(
        "rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
        "ORDER BY rank_micro DESC, term) AS rn FROM fin)"
    )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT doc_id, term, wdeg, rank_micro FROM rk WHERE rn <= {k}"
    )


# ---------------------------------------------------------------------------
# RAKE keyphrase extraction (Rose, Engel, Cramer & Cowley 2010)
# ---------------------------------------------------------------------------
#
# Rapid Automatic Keyword Extraction — the stopword-delimited
# MULTI-WORD complement to the single-token rankers above
# (doc_key_terms is TF-IDF unigrams, textrank_terms is graph-ranked
# unigrams; RAKE is where "machine learning pipeline" survives as one
# candidate):
#
# 1. candidate phrases = maximal runs of content tokens between
#    phrase delimiters (punctuation / fragment boundaries) and
#    stopwords;
# 2. per doc, word frequency freq(w) = occurrences inside candidates,
#    word degree deg(w) = Σ over those occurrences of the containing
#    phrase's length (the paper's co-occurrence degree, self included);
# 3. word score = deg(w)/freq(w); phrase score = Σ member word scores
#    (each occurrence counts); top-k DISTINCT phrases per doc.
#
# Exactness device: deg and freq are exact int64 counts, so the only
# division is word_score_micro = deg·10⁶ DIV freq — floor division of
# non-negative ints, identical in Spark (DIV) and DuckDB (//) — and the
# phrase score is an exact int64 SUM of those. Bit-identical across
# engines, partitionings and cluster sizes; no float ever runs.
#
# Tokenization (shared contract, spelled so the pattern TEXT parses
# identically in Java and RE2 — the wsre discipline): lowercase, split
# into fragments on any char outside [a-z0-9]+ASCII-whitespace (all
# punctuation, digits-adjacent symbols and non-ASCII are phrase
# delimiters — documented ASCII convention), then whitespace-tokenize
# each fragment with the JAVA_WS class.
#
# Scale shape: both windows (phrase grouping, phrase length) are
# DOC-bounded partitions (the lm_score contract — documents are
# length-bounded, so no partition exceeds one document's token count);
# word stats and the score join are (doc_id, tok)-keyed shuffles; the
# per-doc top-k buffer is bounded by the doc's distinct candidate
# count. Nothing corpus-wide ever sits in one task.

RAKE_SCALE = 10**6

# compact public English function-word stoplist (RAKE's delimiter set;
# the Fox-stoplist role). Sorted so the SQL IN-list is deterministic.
RAKE_STOPWORDS = sorted(
    {
        "a", "about", "above", "after", "against", "all", "also", "an",
        "and", "any", "are", "as", "at", "be", "because", "been", "before",
        "below", "between", "both", "but", "by", "can", "could", "did",
        "do", "does", "during", "each", "for", "from", "had", "has",
        "have", "he", "her", "his", "how", "i", "if", "in", "into", "is",
        "it", "its", "just", "may", "more", "most", "no", "not", "of",
        "on", "only", "or", "other", "our", "over", "she", "should", "so",
        "some", "such", "than", "that", "the", "their", "them", "then",
        "there", "these", "they", "this", "through", "to", "under", "up",
        "was", "we", "were", "what", "when", "where", "which", "while",
        "who", "will", "with", "would", "you", "your",
    }
)

# fragment delimiter: any char not lowercase-ASCII-alnum or Java \s
# (explicit class text parses identically in Java and RE2)
RAKE_FRAG_RE = r"[^a-z0-9 \t\n\x0B\f\r]+"


def rake_phrases(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """(doc_id, phrase, n_words, score_micro): each document's top-``k``
    DISTINCT candidate phrases by RAKE score (10⁶ fixed point), ties by
    phrase asc. Stopword-only / empty / NULL docs return no rows."""
    from pyspark.sql import Window

    from ..kernels.wsre import JAVA_WS_SPLIT

    frags = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(
                F.lower(
                    F.translate(
                        F.coalesce(F.col(text_col), F.lit("")), "İΣ", "iσ"
                    )
                ),
                RAKE_FRAG_RE,
            )
        ).alias("fi", "frag"),
    )
    toks = frags.select(
        "doc_id",
        "fi",
        F.posexplode(
            F.filter(F.split(F.col("frag"), JAVA_WS_SPLIT), lambda w: w != F.lit(""))
        ).alias("pos", "tok"),
    ).withColumn(
        "stop",
        F.col("tok").isin(*RAKE_STOPWORDS).cast("int"),
    )
    # phrase id = running count of stopwords seen in the fragment; both
    # windows below partition by (doc, fragment) — doc-bounded
    wnd = Window.partitionBy("doc_id", "fi").orderBy("pos")
    members = (
        toks.withColumn("grp", F.sum("stop").over(wnd))
        .filter(F.col("stop") == 0)
        .drop("stop")
    )
    plen_wnd = Window.partitionBy("doc_id", "fi", "grp")
    # members feeds the word-stat aggregate AND the phrase join — the
    # persist stops the tokenize/window subtree running twice (the
    # textrank static-frame rule; cache returned for release)
    members = members.withColumn("plen", F.count("*").over(plen_wnd)).persist()
    # per-doc word stats over candidate members only (the paper's rule)
    wstat = members.groupBy("doc_id", "tok").agg(
        F.count("*").alias("freq"),
        F.sum("plen").alias("deg"),
    )
    ws = wstat.select(
        "doc_id",
        "tok",
        F.expr(f"deg * {RAKE_SCALE} DIV freq").alias("ws_micro"),
    )
    phrases = (
        members.join(ws, ["doc_id", "tok"])
        .groupBy("doc_id", "fi", "grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                    ),
                    lambda x: x["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count("*").alias("n_words"),
            F.sum("ws_micro").alias("score_micro"),
        )
        .select("doc_id", "phrase", "n_words", "score_micro")
        .distinct()
    )
    top = phrases.groupBy("doc_id").agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("score_micro")).alias("neg"),
                        F.col("phrase"),
                        F.col("n_words"),
                        F.col("score_micro"),
                    )
                )
            ),
            1,
            k,
        ).alias("top")
    )
    return top.select("doc_id", F.explode("top").alias("e")).select(
        "doc_id",
        F.col("e.phrase").alias("phrase"),
        F.col("e.n_words").alias("n_words"),
        F.col("e.score_micro").alias("score_micro"),
    )


def sql_rake_phrases(
    rel: str = "documents",
    text_expr: str = "text",
    k: int = 3,
) -> str:
    """DuckDB twin of :func:`rake_phrases` — identical fragment/token
    split (same pattern text under RE2), stoplist, integer score and
    (score desc, phrase asc) window top-k at oracle scale."""
    from ..kernels.wsre import JAVA_WS_SPLIT

    stops = ", ".join("'" + w + "'" for w in RAKE_STOPWORDS)
    return (
        "WITH t AS (SELECT doc_id, "
        f"lower(replace(replace(coalesce({text_expr}, ''), 'İ', 'i'), 'Σ', 'σ')) AS tx FROM {rel}), "
        "fr AS (SELECT doc_id, i - 1 AS fi, frags[i] AS frag FROM ("
        f"SELECT doc_id, string_split_regex(tx, '{RAKE_FRAG_RE}') AS frags, "
        "unnest(generate_series(1, len(frags))) AS i FROM t)), "
        "tk AS (SELECT doc_id, fi, j - 1 AS pos, toks[j] AS tok FROM ("
        f"SELECT doc_id, fi, list_filter(string_split_regex(frag, "
        f"'{JAVA_WS_SPLIT}'), x -> x <> '') AS toks, "
        "unnest(generate_series(1, len(toks))) AS j FROM fr)), "
        f"st AS (SELECT *, CASE WHEN tok IN ({stops}) THEN 1 ELSE 0 END "
        "AS stop FROM tk), "
        "mem0 AS (SELECT doc_id, fi, pos, tok, "
        "sum(stop) OVER (PARTITION BY doc_id, fi ORDER BY pos) AS grp, stop "
        "FROM st), "
        "mem AS (SELECT doc_id, fi, pos, tok, grp, "
        "CAST(count(*) OVER (PARTITION BY doc_id, fi, grp) AS BIGINT) AS plen "
        "FROM mem0 WHERE stop = 0), "
        "wstat AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS freq, "
        "CAST(sum(plen) AS BIGINT) AS deg FROM mem GROUP BY doc_id, tok), "
        f"ws AS (SELECT doc_id, tok, deg * {RAKE_SCALE} // freq AS ws_micro "
        "FROM wstat), "
        "phr AS (SELECT DISTINCT mem.doc_id, "
        "string_agg(mem.tok, ' ' ORDER BY mem.pos) AS phrase, "
        "CAST(count(*) AS BIGINT) AS n_words, "
        "CAST(sum(ws.ws_micro) AS BIGINT) AS score_micro "
        "FROM mem JOIN ws ON mem.doc_id = ws.doc_id AND mem.tok = ws.tok "
        "GROUP BY mem.doc_id, mem.fi, mem.grp), "
        "rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
        "ORDER BY score_micro DESC, phrase) AS rn FROM phr) "
        f"SELECT doc_id, phrase, n_words, score_micro FROM rk WHERE rn <= {k}"
    )


# ---------------------------------------------------------------------------
# Turing / Good-Turing frequency re-estimation (Good 1953; the
# Gale & Sampson 1995 presentation) — unsmoothed Turing estimates
# ---------------------------------------------------------------------------
#
# The frequency-of-frequencies table N_r (how many vocabulary types
# occur exactly r times) and the Turing re-estimate
#     r* = (r+1) · N_{r+1} / N_r,     P0 = N_1 / N
# — the foundation of every smoothed LM (Katz backoff discounts with
# exactly these r*; the engine's stupid-backoff LM is the
# non-discounted sibling). This operator ships the EXACT unsmoothed
# table: r*_micro = (r+1)·N_{r+1}·10⁶ DIV N_r is pure int64 (N_r ≥ 1
# on emitted rows), bit-identical cross-engine; ranks with N_{r+1} = 0
# emit r* 0 (the estimate is undefined there — the caller's smoothing
# regression, e.g. the zipf_slope device, takes over; documented).
#
# Scale shape: two map-side-combinable groupBys (term counts →
# frequency-of-frequencies) + one self-join on r+1 keyed by the RANK
# (the table is ≤ max term frequency rows — tiny) + one 1-row total.


def good_turing(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(r, n_r, n_r1, r_star_micro, p_mass_ppm): the frequency-of-
    frequencies table with Turing re-estimates — ``r_star_micro`` =
    (r+1)·N_{r+1}·10⁶ DIV N_r (0 where N_{r+1} = 0) and
    ``p_mass_ppm`` = r·N_r·10⁶ DIV N, the observed probability mass at
    rank r (r = 1's mass is the Good-Turing unseen-mass estimate P0·10⁶
    when read from N_1)."""
    tf = (
        _words(df, text_col, id_col)
        .groupBy("tok")
        .agg(F.count("*").alias("r"))
    )
    nr = tf.groupBy("r").agg(F.count("*").alias("n_r")).persist()
    total = tf.agg(F.sum("r").alias("n_total"))
    nr1 = nr.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1"))
    return (
        nr.join(nr1, "r", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "r",
            "n_r",
            F.coalesce("n_r1", F.lit(0)).alias("n_r1"),
            F.expr(
                "(r + 1) * coalesce(n_r1, 0L) * 1000000L DIV n_r"
            ).alias("r_star_micro"),
            F.expr("r * n_r * 1000000L DIV n_total").alias("p_mass_ppm"),
        )
    )


def sql_good_turing(rel: str = "documents", text_expr: str = "text") -> str:
    """DuckDB twin of :func:`good_turing` — identical tokenizer, count
    tables and integer estimates."""
    from .curation import _sql_lower_words

    toks = _sql_lower_words(f"coalesce({text_expr}, '')")
    return (
        f"WITH tk AS (SELECT doc_id, unnest({toks}) AS tok FROM {rel}), "
        "tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS r FROM tk "
        "GROUP BY tok), "
        "nr AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM tf "
        "GROUP BY r), "
        "tot AS (SELECT CAST(sum(r) AS BIGINT) AS n_total FROM tf) "
        "SELECT nr.r, nr.n_r, "
        "CAST(coalesce(n1.n_r, 0) AS BIGINT) AS n_r1, "
        "CAST((nr.r + 1) * coalesce(n1.n_r, 0) * 1000000 // nr.n_r "
        "AS BIGINT) AS r_star_micro, "
        "CAST(nr.r * nr.n_r * 1000000 // tot.n_total AS BIGINT) "
        "AS p_mass_ppm "
        "FROM nr LEFT JOIN nr n1 ON n1.r = nr.r + 1 CROSS JOIN tot"
    )


# ---------------------------------------------------------------------------
# Dunning log-likelihood keyness (Dunning 1993, "Accurate Methods for
# the Statistics of Surprise and Coincidence") + Pearson chi-square
# ---------------------------------------------------------------------------
#
# Per-(group, term) 2x2 contingency keyness against the rest of the
# corpus — THE standard "what words characterize this slice" report
# (corpus linguistics calls it keyword analysis; data-curation cards
# use it to describe source strata before mixture weights are chosen).
# For term t in group g with
#     a = count(t in g)        b = count(t elsewhere) = tf - a
#     c = other tokens in g    d = other tokens elsewhere
# the log-likelihood ratio statistic in its entropy form is
#     G2 = 2*( S(a)+S(b)+S(c)+S(d)
#              - S(tf) - S(N-tf) - S(n_g) - S(N-n_g) + S(N) )
# with S(x) = x*ln(x), S(0) = 0 — every ln argument is an INTEGER
# count, so the engine's fixed-point device applies exactly: with
# I(x) = round(ln(x)*1e9) as int64, every S-term is exact int64 and
# the full statistic `g2_nano` is bit-identical across engines,
# partitionings and cluster sizes (sums of exact integers). Dunning's
# point — G2 stays valid for the rare events chi-square mangles — is
# why it leads the report; chi2 rides along as the textbook
# cross-check, computed as ONE fixed-order double expression (both
# engines evaluate the identical IEEE op sequence) and rounded to 6.
#
# The over/under-represented direction comes from the same device:
# lr_nano = I(a)+I(N)-I(tf)-I(n_g) is the log relative risk
# ln((a/n_g)/(tf/N))*1e9 as exact int64 — no a*N product, so no int64
# overflow at any corpus size (the naive cross-multiplication a*N >
# tf*n_g overflows past ~3e9 tokens).
#
# Overflow bound (S-terms): S(x) = x·I(x) ≤ N·ln(N)·10⁹, which exceeds
# int64 once the corpus token count N passes ~4.3·10⁸ — the same bound
# class as unigram entropy's Σ c·I(c) (textanalysis.py). Past it Spark
# wraps silently while DuckDB raises, so the bit-identical contract
# holds only for N ≲ 4·10⁸ tokens per keyness run. At web scale run
# keyness per stratum/sample (its report shape anyway), or coarsen the
# quantum (I(x)·10⁶ buys 10³× headroom at micro-nat resolution).
#
# Scale shape: one (group, term) groupBy on the exploded token stream
# (corpus-sized shuffle — the count-table contract), then ALL frames
# are vocabulary-sized: tf via a term-partitioned window (#groups rows
# per partition), n_g via a group-partitioned window (vocab rows per
# partition — the gate_auc distinct-score-window acceptance), N as a
# broadcast 1-row aggregate, top-k per group over the min_count-pruned
# table. No Python stage, no corpus-sized window, no driver state.
# NULL group is a real stratum: window PARTITION BY groups NULLs
# together in both engines (no join, so no eqNullSafe trap to dodge).


def keyness(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    k: int = 10,
) -> DataFrame:
    """(group, tok, tf_group, tf_corpus, g2_nano, lr_nano, chi2): the
    top-``k`` terms per group by Dunning G2 keyness among terms with
    corpus frequency >= ``min_count``. ``g2_nano`` = G2 * 1e9 exact
    int64; ``lr_nano`` = signed log-relative-risk * 1e9 (positive =
    over-represented in the group); ``chi2`` = Pearson chi-square
    rounded to 6 (NULL when a marginal is degenerate)."""
    from pyspark.sql import Window

    from .curation import _lower_words
    from .mlfilter import _round6z

    words = df.select(
        F.col(group_col).alias("grp"),
        F.explode(
            _lower_words(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("tok"),
    )
    # the one corpus-scale aggregation, read by the window chain AND
    # the 1-row total — persisted (plan-audit reuse rule)
    ct = words.groupBy("grp", "tok").agg(F.count("*").alias("a")).persist()
    ct = ct.withColumn("tf", F.sum("a").over(Window.partitionBy("tok"))).withColumn(
        "n_g", F.sum("a").over(Window.partitionBy("grp"))
    )
    total = ct.groupBy().agg(F.sum("a").alias("n_tot"))
    ct = ct.crossJoin(F.broadcast(total)).filter(F.col("tf") >= min_count)

    def s(c: Column) -> Column:
        return F.when(c > 0, c * _iln(c)).otherwise(F.lit(0)).cast("long")

    a, tf, n_g, n = F.col("a"), F.col("tf"), F.col("n_g"), F.col("n_tot")
    b, c_, d = tf - a, n_g - a, n - n_g - (tf - a)
    scored = ct.select(
        F.col("grp").alias(group_col),
        "tok",
        a.alias("tf_group"),
        tf.alias("tf_corpus"),
        (
            F.lit(2)
            * (
                s(a) + s(b) + s(c_) + s(d)
                - s(tf) - s(n - tf) - s(n_g) - s(n - n_g) + s(n)
            )
        ).alias("g2_nano"),
        (_iln(a) + _iln(n) - _iln(tf) - _iln(n_g)).alias("lr_nano"),
        F.when(
            (tf > 0) & (n - tf > 0) & (n_g > 0) & (n - n_g > 0),
            _round6z(
                n.cast("double")
                * (
                    a.cast("double") * d.cast("double")
                    - b.cast("double") * c_.cast("double")
                )
                * (
                    a.cast("double") * d.cast("double")
                    - b.cast("double") * c_.cast("double")
                )
                / (
                    tf.cast("double")
                    * (n - tf).cast("double")
                    * n_g.cast("double")
                    * (n - n_g).cast("double")
                )
            ),
        ).alias("chi2"),
    )
    rk = Window.partitionBy(group_col).orderBy(
        F.col("g2_nano").desc(), F.col("tok")
    )
    return (
        scored.withColumn("rn", F.row_number().over(rk))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def sql_keyness(
    rel: str = "documents",
    group_expr: str = "source",
    text_expr: str = "text",
    min_count: int = 5,
    k: int = 10,
) -> str:
    """DuckDB twin of :func:`keyness` — identical tokenizer, window
    sums, fixed-point S/I terms, chi2 op order and per-group ranking."""
    from .curation import _sql_lower_words
    from .mlfilter import _sql_round6z

    toks = _sql_lower_words(f"coalesce({text_expr}, '')")
    iln = _ILN_SQL
    s = (
        "CAST(CASE WHEN {x} > 0 THEN ({x}) * "
        + iln.format(x="{x}")
        + " ELSE 0 END AS BIGINT)"
    )
    nd = (
        "(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) "
        "- CAST(b AS DOUBLE) * CAST(c AS DOUBLE))"
    )
    chi2 = _sql_round6z(
        f"CAST(n_tot AS DOUBLE) * {nd} * {nd} / (CAST(tf AS DOUBLE) "
        "* CAST(n_tot - tf AS DOUBLE) * CAST(n_g AS DOUBLE) "
        "* CAST(n_tot - n_g AS DOUBLE))"
    )
    terms = " + ".join(
        [s.format(x=x) for x in ["a", "b", "c", "d"]]
    )
    margins = " - ".join(
        [
            s.format(x="tf"),
            s.format(x="n_tot - tf"),
            s.format(x="n_g"),
            s.format(x="n_tot - n_g"),
        ]
    )
    return (
        f"WITH w AS (SELECT {group_expr} AS grp, unnest({toks}) AS tok "
        f"FROM {rel}), "
        "ct0 AS (SELECT grp, tok, CAST(count(*) AS BIGINT) AS a FROM w "
        "GROUP BY grp, tok), "
        "ct AS (SELECT *, CAST(sum(a) OVER (PARTITION BY tok) AS BIGINT) "
        "AS tf, CAST(sum(a) OVER (PARTITION BY grp) AS BIGINT) AS n_g, "
        "CAST(sum(a) OVER () AS BIGINT) AS n_tot FROM ct0), "
        f"cells AS (SELECT *, tf - a AS b, n_g - a AS c, "
        f"n_tot - n_g - (tf - a) AS d FROM ct WHERE tf >= {min_count}), "
        f"scored AS (SELECT grp AS {group_expr}, tok, a AS tf_group, "
        "tf AS tf_corpus, "
        f"CAST(2 * (({terms}) - {margins} + {s.format(x='n_tot')}) "
        "AS BIGINT) AS g2_nano, "
        f"CAST({iln.format(x='a')} + {iln.format(x='n_tot')} "
        f"- {iln.format(x='tf')} - {iln.format(x='n_g')} AS BIGINT) "
        "AS lr_nano, "
        "CASE WHEN tf > 0 AND n_tot - tf > 0 AND n_g > 0 "
        f"AND n_tot - n_g > 0 THEN {chi2} END AS chi2 FROM cells), "
        "rk AS (SELECT *, row_number() OVER "
        f"(PARTITION BY {group_expr} ORDER BY g2_nano DESC, tok) AS rn "
        "FROM scored) "
        f"SELECT {group_expr}, tok, tf_group, tf_corpus, g2_nano, "
        f"lr_nano, chi2 FROM rk WHERE rn <= {k}"
    )


# ---------------------------------------------------------------------------
# Frequent co-occurrence pairs + association rules (Agrawal & Srikant
# VLDB 1994, the A-priori algorithm, 2-itemset level)
# ---------------------------------------------------------------------------
#
# Market-basket mining over documents-as-baskets: which word PAIRS
# co-occur in the same document far beyond independence — the
# set-cooccurrence complement to pmi_collocations' ADJACENT pairs
# (collocations find "new york"; this finds {windows, license} across
# a page). The A-priori prune is the load-bearing scale bound: only
# words that are individually frequent (doc frequency >= min_docs)
# enter the per-document pair join, so the fan-out per doc is its
# FREQUENT-word count squared, never its length squared — the classic
# candidate-generation argument, stated and enforced relationally.
#
# Metrics are exact integer where rational (support and both
# confidences in ppm by floor division) and one correctly-rounded
# double chain for lift (n_ab*N/(n_a*n_b) overflows int64 at corpus
# scale; the double form has exact-integer inputs and a fixed op
# order, then rounds to 6). Top-k by (n_ab desc, w1, w2) compiles to
# TakeOrderedAndProject. N counts documents WITH tokens (the basket
# universe); NULL-text docs have no basket.


def cooccur_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 5,
    k: int = 30,
) -> DataFrame:
    """(w1, w2, n_ab, n_a, n_b, supp_ppm, conf_a_ppm, conf_b_ppm,
    lift6): the top-``k`` frequent pairs with both rule directions'
    confidences and the lift."""
    dw = _words(df, text_col, id_col).select("doc_id", "tok").distinct().persist()
    dfreq = dw.groupBy("tok").agg(F.count("*").alias("n"))
    freq = dfreq.filter(F.col("n") >= min_docs).persist()
    n_docs = dw.select("doc_id").distinct().groupBy().agg(
        F.count("*").alias("n_docs")
    )
    # the frequent-token table is VOCABULARY-sized (bounded above by
    # n_docs·max_doc_len/min_docs, not by a constant) — no broadcast
    # hints here; AQE picks broadcast when the pruned table is actually
    # small and falls back to a shuffle join when a web-scale corpus
    # with a low min_docs makes it big (module discipline: never force
    # a broadcast of corpus-derived state without a constant bound)
    fdw = dw.join(freq.select("tok"), "tok")
    a = fdw.select("doc_id", F.col("tok").alias("w1"))
    b = fdw.select(F.col("doc_id").alias("did2"), F.col("tok").alias("w2"))
    pairs = (
        a.join(b, (F.col("doc_id") == F.col("did2")) & (F.col("w1") < F.col("w2")))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_docs)
    )
    fa = freq.select(F.col("tok").alias("w1"), F.col("n").alias("n_a"))
    fb = freq.select(F.col("tok").alias("w2"), F.col("n").alias("n_b"))
    out = (
        pairs.join(fa, "w1")
        .join(fb, "w2")
        .crossJoin(F.broadcast(n_docs))
    )
    lift = (
        F.col("n_ab").cast("double")
        * F.col("n_docs").cast("double")
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    )
    return (
        out.select(
            "w1", "w2", "n_ab", "n_a", "n_b",
            F.expr("n_ab * 1000000L div n_docs").alias("supp_ppm"),
            F.expr("n_ab * 1000000L div n_a").alias("conf_a_ppm"),
            F.expr("n_ab * 1000000L div n_b").alias("conf_b_ppm"),
            (F.round(lift, 6) + F.lit(0.0)).alias("lift6"),
        )
        .orderBy(F.col("n_ab").desc(), "w1", "w2")
        .limit(k)
    )


def sql_cooccur_rules(
    rel: str = "documents",
    text_expr: str = "text",
    min_docs: int = 5,
    k: int = 30,
) -> str:
    """DuckDB twin of :func:`cooccur_rules` — identical baskets,
    A-priori prune, metrics and top-k order."""
    from .curation import _sql_lower_words

    toks = _sql_lower_words(f"coalesce({text_expr}, '')")
    return (
        f"WITH dw AS (SELECT DISTINCT doc_id, unnest({toks}) AS tok "
        f"FROM {rel}), "
        "dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM dw "
        "GROUP BY tok), "
        f"freq AS (SELECT * FROM dfreq WHERE n >= {min_docs}), "
        "nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs "
        "FROM dw), "
        "fdw AS (SELECT dw.doc_id, dw.tok FROM dw JOIN freq "
        "ON freq.tok = dw.tok), "
        "pairs AS (SELECT a.tok AS w1, b.tok AS w2, "
        "CAST(count(*) AS BIGINT) AS n_ab FROM fdw a JOIN fdw b "
        "ON a.doc_id = b.doc_id AND a.tok < b.tok "
        f"GROUP BY 1, 2 HAVING count(*) >= {min_docs}) "
        "SELECT p.w1, p.w2, p.n_ab, fa.n AS n_a, fb.n AS n_b, "
        "CAST(p.n_ab * 1000000 // nd.n_docs AS BIGINT) AS supp_ppm, "
        "CAST(p.n_ab * 1000000 // fa.n AS BIGINT) AS conf_a_ppm, "
        "CAST(p.n_ab * 1000000 // fb.n AS BIGINT) AS conf_b_ppm, "
        "round(CAST(p.n_ab AS DOUBLE) * CAST(nd.n_docs AS DOUBLE) "
        "/ (CAST(fa.n AS DOUBLE) * CAST(fb.n AS DOUBLE)), 6) + 0.0 "
        "AS lift6 "
        "FROM pairs p JOIN freq fa ON fa.tok = p.w1 "
        "JOIN freq fb ON fb.tok = p.w2 CROSS JOIN nd "
        f"ORDER BY p.n_ab DESC, p.w1, p.w2 LIMIT {k}"
    )
