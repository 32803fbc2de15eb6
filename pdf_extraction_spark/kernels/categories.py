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


CATEGORY_PATTERNS = {
    cat: re.compile(category_pattern(kws), re.IGNORECASE)
    for cat, kws in CATEGORY_KEYWORDS.items()
}


def categorize(text: str):
    """All matching categories in declaration order, else ["General"]."""
    lower = text.lower()
    found = [cat for cat, pat in CATEGORY_PATTERNS.items() if pat.search(lower)]
    return found if found else ["General"]
