"""TextTiling topic segmentation (Hearst, Computational Linguistics
23(1), 1997) — subtopic boundary detection by lexical-cohesion valleys.

The subtopic-boundary leg of the chunking family: where
chunk_sliding_window cuts at fixed strides and sentence_chunks at
sentence budgets, TextTiling cuts where the VOCABULARY shifts — the
boundary quality RAG context selection actually wants.

Algorithm (the paper's block-comparison variant):
1. tokenize (the shared retrieval ASCII tokenizer) and group tokens
   into pseudo-sentences of ``w`` tokens;
2. at each gap between pseudo-sentences, cosine similarity between the
   term-frequency vectors of the ``k`` pseudo-sentences before and
   after (clipped at document edges);
3. depth score d(i) = (peak_l − sim_i) + (peak_r − sim_i), where each
   peak is found by climbing while scores strictly increase (the
   paper's hill-climb);
4. boundaries where depth clears Hearst's LC cutoff mean − sd/2.

Exactness devices (all shared with the rest of the engine):
- similarities are micro-fixed-point: sim = (dot·10⁶) DIV isqrt(‖l‖²·‖r‖²)
  with the maintenance._isqrt_case exact integer sqrt — counts are
  int64, so dot and the norms are exact and the ONLY rounding is one
  floor division (bit-identical cross-engine);
- the hill-climb needs no sequential fold: the peak left of gap i is
  sim at j*(i) = max{j ≤ i : j = first OR sim[j−1] ≤ sim[j]} — a
  running window max over a flag column (and mirrored for the right);
- the cutoff compare is all-integer:
  2·n·d(i) ≥ 2·Σd − isqrt(n·Σd² − (Σd)²)  (floor-isqrt convention of
  mean − sd/2, documented).

Overflow bounds (documented): block token count ≤ ~55k (norms product
must fit int64) and gaps per document ≤ ~1,500 (n·Σd² must fit int64)
— i.e. documents up to ~w·1500 tokens at the default w; raise ``w``
for longer documents.

Scale shape: one doc-keyed explode, contribution fan-out bounded by k
per token row, (doc, gap, term)-keyed sums and joins, doc-bounded
windows only. No Python, no corpus-wide state in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .maintenance import _isqrt_case
from .retrieval import _sql_tokens, _tokens_col

TILE_SCALE = 10**6


def texttile(
    docs: DataFrame,
    w: int = 10,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, gap, boundary_tok, sim_micro, depth_micro, is_boundary):
    one row per pseudo-sentence gap (gap i sits before pseudo-sentence
    i; boundary_tok = i·w is the token offset) with the block cosine,
    hill-climb depth and Hearst-cutoff flag. Documents under 2
    pseudo-sentences emit nothing."""
    if w < 1 or k < 1:
        raise ValueError("w and k must be >= 1")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            _tokens_col(F.coalesce(F.col(text_col), F.lit("")), True)
        ).alias("pos", "tok"),
    ).select("doc_id", F.expr(f"pos DIV {w}").alias("s"), "tok")
    nseq = toks.groupBy("doc_id").agg((F.max("s") + 1).alias("n_seq"))
    # counts feeds BOTH block legs, each leg feeds a norm AND the dot —
    # without persists the token-explode subtree replicates ~6× in the
    # physical plan (observed: 139 Exchanges unpersisted vs a handful
    # persisted — the textrank static-frame rule; caches returned for
    # release with the lazy result)
    counts = (
        toks.groupBy("doc_id", "s", "tok")
        .agg(F.count("*").alias("c"))
        .join(nseq, "doc_id")
        .persist()
    )
    # each (doc, s, tok) row contributes to the LEFT block of gaps
    # s+1..s+k and the RIGHT block of gaps s-k+1..s (clipped to 1..S-1);
    # both sequences are ascending by construction (Spark's sequence()
    # DESCENDS when hi < lo — the bursts lesson — hence the s >= 1
    # filter on the right leg)
    left = (
        counts.select(
            "doc_id",
            "tok",
            "c",
            F.explode(F.expr(f"sequence(s + 1, s + {k})")).alias("i"),
            "n_seq",
        )
        .filter((F.col("i") <= F.col("n_seq") - 1))
        .groupBy("doc_id", "i", "tok")
        .agg(F.sum("c").alias("l"))
        .persist()
    )
    right = (
        counts.filter(F.col("s") >= 1)
        .select(
            "doc_id",
            "tok",
            "c",
            F.explode(
                F.expr(f"sequence(greatest(s - {k} + 1, 1), s)")
            ).alias("i"),
        )
        .groupBy("doc_id", "i", "tok")
        .agg(F.sum("c").alias("r"))
        .persist()
    )
    nl = left.groupBy("doc_id", "i").agg(
        F.sum(F.col("l") * F.col("l")).alias("nl")
    )
    nr = right.groupBy("doc_id", "i").agg(
        F.sum(F.col("r") * F.col("r")).alias("nr")
    )
    dot = (
        left.join(right, ["doc_id", "i", "tok"])
        .groupBy("doc_id", "i")
        .agg(F.sum(F.col("l") * F.col("r")).alias("dot"))
    )
    sims = (
        nl.join(nr, ["doc_id", "i"])
        .join(dot, ["doc_id", "i"], "left")
        .select(
            "doc_id",
            "i",
            F.coalesce("dot", F.lit(0)).alias("dot"),
            (F.col("nl") * F.col("nr")).alias("nn"),
        )
        .withColumn(
            "cand", F.floor(F.sqrt(F.col("nn").cast("double"))).cast("long")
        )
        .withColumn("nrm", F.expr(_isqrt_case("nn", "cand", "div")).cast("long"))
        .select(
            "doc_id",
            "i",
            F.expr(f"(dot * {TILE_SCALE}) DIV greatest(nrm, 1)").alias(
                "sim_micro"
            ),
        )
        .persist()  # read by the flag windows AND both peak join legs
    )
    wnd = Window.partitionBy("doc_id").orderBy("i")
    flagged = (
        sims.withColumn("prev", F.lag("sim_micro").over(wnd))
        .withColumn("nxt", F.lead("sim_micro").over(wnd))
        .withColumn(
            "jstar",
            F.max(
                F.when(
                    F.col("prev").isNull()
                    | (F.col("prev") <= F.col("sim_micro")),
                    F.col("i"),
                )
            ).over(wnd.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "kstar",
            F.min(
                F.when(
                    F.col("nxt").isNull()
                    | (F.col("nxt") <= F.col("sim_micro")),
                    F.col("i"),
                )
            ).over(wnd.rowsBetween(0, Window.unboundedFollowing)),
        )
    )
    pl = sims.select(
        "doc_id", F.col("i").alias("jstar"), F.col("sim_micro").alias("pl")
    )
    pr = sims.select(
        "doc_id", F.col("i").alias("kstar"), F.col("sim_micro").alias("pr")
    )
    depths = (
        flagged.join(pl, ["doc_id", "jstar"])
        .join(pr, ["doc_id", "kstar"])
        .select(
            "doc_id",
            "i",
            "sim_micro",
            (
                (F.col("pl") - F.col("sim_micro"))
                + (F.col("pr") - F.col("sim_micro"))
            ).alias("depth_micro"),
        )
        .persist()  # read by the per-doc stats AND the cutoff join
    )
    stats = depths.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        F.sum("depth_micro").alias("sd1"),
        F.sum(F.col("depth_micro") * F.col("depth_micro")).alias("sd2"),
    )
    cut = (
        depths.join(stats, "doc_id")
        .withColumn("rad", F.col("n") * F.col("sd2") - F.col("sd1") * F.col("sd1"))
        .withColumn(
            "cand", F.floor(F.sqrt(F.col("rad").cast("double"))).cast("long")
        )
        .withColumn("sdv", F.expr(_isqrt_case("rad", "cand", "div")).cast("long"))
    )
    return cut.select(
        "doc_id",
        F.col("i").alias("gap"),
        (F.col("i") * w).alias("boundary_tok"),
        "sim_micro",
        "depth_micro",
        (
            2 * F.col("n") * F.col("depth_micro")
            >= 2 * F.col("sd1") - F.col("sdv")
        ).alias("is_boundary"),
    )


def sql_texttile(
    rel: str = "documents",
    w: int = 10,
    k: int = 3,
    text_expr: str = "text",
) -> str:
    """DuckDB twin of :func:`texttile` — identical tokenizer, block
    sums, exact-isqrt cosine, window hill-climb and integer cutoff."""
    toks = _sql_tokens(f"coalesce({text_expr}, '')", True)
    isq_n = _isqrt_case("nn", "cand", "//")
    isq_r = _isqrt_case("rad", "cand", "//")
    return (
        f"WITH t AS (SELECT doc_id, {toks} AS toks FROM {rel}), "
        "tk AS (SELECT doc_id, (i - 1) // "
        f"{w} AS s, toks[i] AS tok FROM ("
        "SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i "
        "FROM t)), "
        "ns AS (SELECT doc_id, max(s) + 1 AS n_seq FROM tk GROUP BY doc_id), "
        "cnt AS (SELECT tk.doc_id, tk.s, tk.tok, "
        "CAST(count(*) AS BIGINT) AS c, any_value(ns.n_seq) AS n_seq FROM tk "
        "JOIN ns ON tk.doc_id = ns.doc_id GROUP BY tk.doc_id, tk.s, tk.tok), "
        "lft AS (SELECT doc_id, i, tok, CAST(sum(c) AS BIGINT) AS l FROM ("
        f"SELECT doc_id, tok, c, n_seq, unnest(generate_series(s + 1, s + {k})) "
        "AS i FROM cnt) WHERE i <= n_seq - 1 GROUP BY doc_id, i, tok), "
        "rgt AS (SELECT doc_id, i, tok, CAST(sum(c) AS BIGINT) AS r FROM ("
        f"SELECT doc_id, tok, c, unnest(generate_series(greatest(s - {k} + 1, 1), s)) "
        "AS i FROM cnt WHERE s >= 1) GROUP BY doc_id, i, tok), "
        "nl AS (SELECT doc_id, i, CAST(sum(l * l) AS BIGINT) AS nl "
        "FROM lft GROUP BY doc_id, i), "
        "nr AS (SELECT doc_id, i, CAST(sum(r * r) AS BIGINT) AS nr "
        "FROM rgt GROUP BY doc_id, i), "
        "dt AS (SELECT lft.doc_id, lft.i, CAST(sum(l * r) AS BIGINT) AS dot "
        "FROM lft JOIN rgt ON lft.doc_id = rgt.doc_id AND lft.i = rgt.i "
        "AND lft.tok = rgt.tok GROUP BY lft.doc_id, lft.i), "
        "sims AS (SELECT doc_id, i, "
        f"(coalesce(dot, 0) * {TILE_SCALE}) // greatest(nrm, 1) AS sim_micro "
        "FROM (SELECT nl.doc_id, nl.i, dt.dot, "
        f"CAST({isq_n} AS BIGINT) AS nrm FROM ("
        "SELECT nl.doc_id, nl.i, nl.nl * nr.nr AS nn, "
        "CAST(floor(sqrt(CAST(nl.nl * nr.nr AS DOUBLE))) AS BIGINT) AS cand "
        "FROM nl JOIN nr ON nl.doc_id = nr.doc_id AND nl.i = nr.i) q "
        "JOIN nl ON q.doc_id = nl.doc_id AND q.i = nl.i "
        "LEFT JOIN dt ON q.doc_id = dt.doc_id AND q.i = dt.i)), "
        "flg AS (SELECT doc_id, i, sim_micro, "
        "max(CASE WHEN prev IS NULL OR prev <= sim_micro THEN i END) "
        "OVER (PARTITION BY doc_id ORDER BY i "
        "ROWS UNBOUNDED PRECEDING) AS jstar, "
        "min(CASE WHEN nxt IS NULL OR nxt <= sim_micro THEN i END) "
        "OVER (PARTITION BY doc_id ORDER BY i "
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS kstar "
        "FROM (SELECT doc_id, i, sim_micro, "
        "lag(sim_micro) OVER (PARTITION BY doc_id ORDER BY i) AS prev, "
        "lead(sim_micro) OVER (PARTITION BY doc_id ORDER BY i) AS nxt "
        "FROM sims)), "
        "dep AS (SELECT flg.doc_id, flg.i, flg.sim_micro, "
        "(pl.sim_micro - flg.sim_micro) + (pr.sim_micro - flg.sim_micro) "
        "AS depth_micro FROM flg "
        "JOIN sims pl ON flg.doc_id = pl.doc_id AND flg.jstar = pl.i "
        "JOIN sims pr ON flg.doc_id = pr.doc_id AND flg.kstar = pr.i), "
        "st AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(depth_micro) AS BIGINT) AS sd1, "
        "CAST(sum(depth_micro * depth_micro) AS BIGINT) AS sd2 "
        "FROM dep GROUP BY doc_id), "
        "ct AS (SELECT dep.*, st.n, st.sd1, "
        f"CAST({isq_r} AS BIGINT) AS sdv FROM ("
        "SELECT dep.doc_id, dep.i, "
        "st.n * st.sd2 - st.sd1 * st.sd1 AS rad, "
        "CAST(floor(sqrt(CAST(st.n * st.sd2 - st.sd1 * st.sd1 AS DOUBLE))) "
        "AS BIGINT) AS cand FROM dep JOIN st ON dep.doc_id = st.doc_id) q "
        "JOIN dep ON q.doc_id = dep.doc_id AND q.i = dep.i "
        "JOIN st ON q.doc_id = st.doc_id) "
        f"SELECT doc_id, i AS gap, i * {w} AS boundary_tok, sim_micro, "
        "depth_micro, "
        "2 * n * depth_micro >= 2 * sd1 - sdv AS is_boundary FROM ct"
    )
