"""Multi-label keyword categorizer (C1/C2).

Ten keyword categories; a chunk receives *every* category whose compiled
word-boundary alternation matches, else ``["General"]``. Keyword lists and
category order ported from the reference categorizer
(rag_friendly_categorizer.py:12-79,116-125).
"""

import re

CATEGORY_KEYWORDS = {
    "Financial Performance": [
        "revenue", "earnings", "margin", "profit", "cash flow", "beat", "miss",
        "ebitda", "sales", "assets", "debt", "loan", "growth", "decline",
        "income", "expenses", "costs", "financial", "performance", "turnover",
        "operating profit", "net profit", "gross margin", "operating margin",
    ],
    "Guidance & Outlook": [
        "outlook", "forecast", "expect", "guidance", "macro", "headwinds",
        "future", "forward", "next quarter", "fy", "projections", "estimates",
        "target", "goal", "anticipate", "predict", "going forward", "ahead",
    ],
    "Operational Updates": [
        "supply chain", "production", "capacity", "market share", "expansion",
        "capex", "operations", "manufacturing", "facility", "plant",
        "efficiency", "utilization", "volume", "capacity utilization",
    ],
    "Risks & Challenges": [
        "risk", "headwind", "challenge", "uncertainty", "volatility",
        "slowdown", "difficulty", "shortages", "compliance", "inflation",
        "geopolitics", "regulatory", "competition", "threat", "pressure",
    ],
    "Capital Allocation": [
        "dividend", "buyback", "repurchase", "acquisition", "investment",
        "capital allocation", "m&a", "merger", "divestiture", "stake",
        "share repurchase", "payout", "capex", "capital expenditure",
    ],
    "Innovation & R&D": [
        "r&d", "innovation", "launch", "entering", "product pipeline",
        "expanding", "development", "research", "new product", "technology",
        "patent", "intellectual property", "product development", "clinical trials",
    ],
    "Healthcare Specific": [
        "fda approval", "api", "drug", "pharmaceutical", "clinical trials",
        "regulatory approval", "medical", "therapy", "treatment", "dosage",
        "medicine", "usfda", "who gmp", "dmf", "anda", "biosimilar",
        "generic", "branded", "chronic", "acute", "respiratory", "oncology",
    ],
    "Market & Competition": [
        "market share", "competition", "competitive", "pricing", "tender",
        "market penetration", "distribution", "channel", "brand", "portfolio",
        "market dynamics", "competitive landscape",
    ],
    "Regulatory & Compliance": [
        "regulatory", "compliance", "fda", "who", "gmp", "inspection",
        "approval", "filing", "submission", "regulatory pathway", "cdsco",
    ],
    "International Business": [
        "us market", "europe", "international", "export", "global",
        "overseas", "foreign", "emerging markets", "developed markets",
        "geography", "regions",
    ],
}


def category_pattern(keywords) -> str:
    r"""``\b(?:kw1|kw2|...)\b`` alternation over escaped keywords
    (reference rag_friendly_categorizer.py:75-79). Also used verbatim as
    the Spark ``rlike`` pattern string (Java-regex compatible)."""
    return r"\b(?:" + "|".join(re.escape(k) for k in keywords) + r")\b"


def category_pattern_re2(keywords) -> str:
    r"""RE2 (DuckDB) twin of :func:`category_pattern`. Java and Python
    ``\b`` are Unicode-aware (a keyword adjacent to ``ü`` is inside a
    word → no match); RE2's ``\b`` is ASCII-only and WOULD match there.
    RE2 has no lookarounds, so each keyword's boundaries are emulated by
    consuming context classes — and ``\b``'s meaning flips with the
    edge character's wordness: a word-char edge needs a non-word/anchor
    neighbor, a NON-word edge (e.g. a keyword starting with ``+``)
    needs a word-char neighbor. Equivalent for existence tests (all the
    twin does)."""
    w = r"[\p{L}\p{N}_]"
    nw = r"[^\p{L}\p{N}_]"

    def bounded(k):
        first_word = bool(re.match(r"\w", k[0])) if k else True
        last_word = bool(re.match(r"\w", k[-1])) if k else True
        pre = rf"(?:^|{nw})" if first_word else w
        suf = rf"(?:{nw}|$)" if last_word else w
        return pre + "(?:" + re.escape(k) + ")" + suf

    return "|".join(bounded(k) for k in keywords)


CATEGORY_PATTERNS = {
    cat: re.compile(category_pattern(kws), re.IGNORECASE)
    for cat, kws in CATEGORY_KEYWORDS.items()
}


def categorize(text: str):
    """All matching categories in declaration order, else ["General"]."""
    lower = text.lower()
    found = [cat for cat, pat in CATEGORY_PATTERNS.items() if pat.search(lower)]
    return found if found else ["General"]
