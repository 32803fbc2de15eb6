"""Financial field extraction (F1–F6) — regex scalar functions.

Semantics: each extractor runs an *ordered* pattern list with
case-insensitive finditer; hits are appended in pattern order, duplicates
across patterns are kept; currency/unit/type classification happens on the
raw matched text. Ports of the reference field extractor
(pdf-parser/extractor/financial_extractor.py:10-203).

Deviation (documented): ``extract_quarter_info`` returns *sorted* lists for
``quarters`` and ``combined`` where the reference returns ``list(set(...))``
whose order is salted by PYTHONHASHSEED (nondeterministic in the reference
itself). Set membership is identical.
"""

import re

_REVENUE_PATTERNS = [
    r"(?:revenue|income|sales|turnover)\s+(?:of\s+)?(?:Rs\.?|INR)\s*([\d,]+\.?\d*)\s*(?:crores?|cr)",
    r"(?:revenue|income|sales|turnover)\s+(?:of\s+)?(?:\$|USD)\s*([\d,]+\.?\d*)\s*(?:million|mn|billion|bn)",
    r"(?:Rs\.?|INR)\s*([\d,]+\.?\d*)\s*(?:crores?|cr)\s+(?:in\s+)?(?:revenue|income|sales|turnover)",
    r"(?:\$|USD)\s*([\d,]+\.?\d*)\s*(?:million|mn|billion|bn)\s+(?:in\s+)?(?:revenue|income|sales|turnover)",
    r"(?:total\s+)?(?:revenue|income|sales|turnover)[\s\w]*(?:Rs\.?|INR)\s*([\d,]+\.?\d*)\s*(?:crores?|cr)",
]

_GROWTH_PATTERNS = [
    r"([\d]+\.?\d*)\s*%\s+(?:growth|increase|rise)",
    r"(?:grew|increased|rose)\s+(?:by\s+)?([\d]+\.?\d*)\s*%",
    r"(?:growth|increase|rise)\s+(?:of\s+)?([\d]+\.?\d*)\s*%",
    r"(?:year-on-year|YoY|y-o-y)\s+(?:growth\s+)?(?:of\s+)?([\d]+\.?\d*)\s*%",
    r"(?:quarter-on-quarter|QoQ|q-o-q)\s+(?:growth\s+)?(?:of\s+)?([\d]+\.?\d*)\s*%",
    r"(?:up|down)\s+([\d]+\.?\d*)\s*%",
]

_EBITDA_PATTERNS = [
    r"EBITDA\s+(?:of\s+)?(?:Rs\.?|INR)\s*([\d,]+\.?\d*)\s*(?:crores?|cr)",
    r"EBITDA\s+(?:of\s+)?(?:\$|USD)\s*([\d,]+\.?\d*)\s*(?:million|mn|billion|bn)",
    r"EBITDA\s+(?:stands?\s+at|is|was)\s+(?:Rs\.?|INR)\s*([\d,]+\.?\d*)\s*(?:crores?|cr)",
    r"(?:Rs\.?|INR)\s*([\d,]+\.?\d*)\s*(?:crores?|cr)\s+(?:in\s+)?EBITDA",
]

_MARGIN_PATTERNS = [
    r"([\d]+\.?\d*)\s*%\s+(?:EBITDA\s+)?margin",
    r"(?:EBITDA\s+)?margin\s+(?:of\s+)?([\d]+\.?\d*)\s*%",
    r"([\d]+\.?\d*)\s*%\s+to\s+sales",
    r"(?:gross|operating|net|profit)\s+margin\s+(?:of\s+)?([\d]+\.?\d*)\s*%",
    r"margin\s+(?:stands?\s+at|is|was)\s+([\d]+\.?\d*)\s*%",
]

_QUARTER_RE = re.compile(r"\b(Q[1-4])\b", re.IGNORECASE)
_FY_PATTERNS = [
    r"\bFY\s*(\d{2,4})\b",
    r"\bFY(\d{2,4})\b",
    r"\b(?:fiscal\s+year\s+)?(\d{4})-(\d{2,4})\b",
]
_COMBINED_RE = re.compile(r"\b(Q[1-4])\s*FY\s*(\d{2,4})\b", re.IGNORECASE)

_COMPILED = {
    "revenue": [re.compile(p, re.IGNORECASE) for p in _REVENUE_PATTERNS],
    "growth": [re.compile(p, re.IGNORECASE) for p in _GROWTH_PATTERNS],
    "ebitda": [re.compile(p, re.IGNORECASE) for p in _EBITDA_PATTERNS],
    "margin": [re.compile(p, re.IGNORECASE) for p in _MARGIN_PATTERNS],
    "fy": [re.compile(p, re.IGNORECASE) for p in _FY_PATTERNS],
}


def _amount_hits(patterns, text):
    """Shared amount-extraction shape of the revenue/EBITDA extractors
    (reference financial_extractor.py:31-51,99-118)."""
    results = []
    for pattern in patterns:
        for m in pattern.finditer(text):
            raw = m.group(0)
            value = m.group(1).replace(",", "")
            lower = raw.lower()
            currency = "INR" if ("Rs" in raw or "INR" in raw) else "USD"
            unit = (
                "crores"
                if ("crore" in lower or "cr" in lower)
                else ("million" if ("million" in lower or "mn" in lower) else "billion")
            )
            results.append(
                {
                    "raw_text": raw,
                    "value": float(value) if "." in value else int(value),
                    "currency": currency,
                    "unit": unit,
                }
            )
    return results


def extract_revenue(text: str):
    return _amount_hits(_COMPILED["revenue"], text)


def extract_ebitda(text: str):
    return _amount_hits(_COMPILED["ebitda"], text)


def extract_growth_rates(text: str):
    results = []
    for pattern in _COMPILED["growth"]:
        for m in pattern.finditer(text):
            raw = m.group(0)
            lower = raw.lower()
            gtype = (
                "YoY"
                if any(x in lower for x in ("year-on-year", "yoy", "y-o-y"))
                else (
                    "QoQ"
                    if any(x in lower for x in ("quarter-on-quarter", "qoq", "q-o-q"))
                    else "general"
                )
            )
            direction = "negative" if "down" in lower else "positive"
            results.append(
                {
                    "raw_text": raw,
                    "value": float(m.group(1)),
                    "type": gtype,
                    "direction": direction,
                }
            )
    return results


def extract_margins(text: str):
    results = []
    for pattern in _COMPILED["margin"]:
        for m in pattern.finditer(text):
            raw = m.group(0)
            lower = raw.lower()
            mtype = (
                "EBITDA"
                if "ebitda" in lower
                else (
                    "gross"
                    if "gross" in lower
                    else (
                        "operating"
                        if "operating" in lower
                        else ("net" if "net" in lower else "general")
                    )
                )
            )
            results.append({"raw_text": raw, "value": float(m.group(1)), "type": mtype})
    return results


def extract_quarter_info(text: str):
    """Quarter / fiscal-year / combined references (F5), deduped.

    Reference financial_extractor.py:156-203; list order normalized to
    sorted (see module docstring).
    """
    quarters = sorted(set(_QUARTER_RE.findall(text)))

    fiscal_years = set()
    for pattern in _COMPILED["fy"]:
        for m in pattern.finditer(text):
            if len(m.groups()) == 2:
                fiscal_years.add(f"FY{m.group(2)}")
            else:
                year = m.group(1)
                fiscal_years.add(f"FY{year}" if len(year) == 2 else f"FY{year[-2:]}")

    combined = set()
    for m in _COMBINED_RE.finditer(text):
        quarter = m.group(1).upper()
        year = m.group(2)
        combined.add(f"{quarter} FY{year}" if len(year) == 2 else f"{quarter} FY{year[-2:]}")

    return {
        "quarters": quarters,
        "fiscal_years": sorted(fiscal_years),
        "combined": sorted(combined),
    }


def extract_all_metrics(text: str):
    """Bundle F1–F5 (reference financial_extractor.py:10-18)."""
    return {
        "revenue": extract_revenue(text),
        "growth_rates": extract_growth_rates(text),
        "ebitda": extract_ebitda(text),
        "margins": extract_margins(text),
        "quarter_info": extract_quarter_info(text),
    }
