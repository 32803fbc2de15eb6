"""X3: interactive RAG search over the embedded-chunks table.

The reference's chat loop (simple_rag.py:282-365) embeds the question,
scores every stored chunk by cosine, reranks by the weighted
0.7·sim + 0.2·recency + 0.1·quality score, and feeds the top-k into an
LLM. The engine-side pieces — question embedding, similarity, rerank,
company filter, context assembly — are all here on Spark operators; the
LLM call itself is presentation-layer (SURVEY.md §2.10 non-goal): the
REPL prints the assembled context and source listing instead.

The chunks table is any frame with (content, embedding, quality_score,
date[, company, speaker]) — plans.pipeline + operators.embed produce it.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.embed import embed_text
from ..operators.topk import assemble_context, cosine_col, rerank_topk


def rag_search(
    chunks: DataFrame,
    question: str,
    k: int = 5,
    company_filter: str | None = None,
    as_of: str = "2025-05-01",
    id_cols=("chunk_id",),
) -> DataFrame:
    """question → top-k reranked chunks (the reference
    search_documents + weighted rerank, company filter included)."""
    qv = embed_text(question)
    q = F.array(*[F.lit(float(x)) for x in qv])
    scored = chunks.filter(F.col("embedding").isNotNull())
    if company_filter and "company" in chunks.columns:
        scored = scored.filter(F.upper(F.col("company")) == company_filter.upper())
    scored = scored.withColumn(
        "similarity", F.round(cosine_col(F.col("embedding"), q), 6)
    )
    return rerank_topk(scored, as_of, k=k, id_cols=id_cols)


def rag_context(topk: DataFrame, content_col: str = "content") -> str:
    """Top-k → ONE prompt-context string (X2 assembly), driver-side."""
    row = assemble_context(topk, content_col=content_col, id_cols=()).first()
    return row["context"] if row and row["n_contexts"] else ""


def parse_repl_line(line: str):
    """Reference command grammar: 'quit'/'exit'/'q' → quit; 'sources' →
    toggle; 'company:NAME' suffix → filter. Returns
    (action, question, company_filter)."""
    line = line.strip()
    if line.lower() in ("quit", "exit", "q"):
        return ("quit", "", None)
    if line.lower() == "sources":
        return ("sources", "", None)
    if not line:
        return ("empty", "", None)
    company = None
    if "company:" in line.lower():
        idx = line.lower().index("company:")
        company = line[idx + len("company:"):].strip().split()[0] if line[idx + 8:].strip() else None
        line = line[:idx].strip()
    return ("ask", line, company)
