"""Retrieval rerank (W5): 0.7·similarity + 0.2·recency + 0.1·quality.

Port of the reference weighted scorer (simple_rag.py:68-102). The
reference computes recency against ``datetime.now()`` — nondeterministic;
here ``as_of`` is an explicit parameter (documented deviation restoring
determinism; pass any fixed date to reproduce a reference run).
"""

from datetime import datetime

SIM_WEIGHT = 0.7
RECENCY_WEIGHT = 0.2
QUALITY_WEIGHT = 0.1


def recency_weight(days_ago: int) -> float:
    """Bucketed recency: ≤90 d → 1.0, ≤365 → 0.8, ≤730 → 0.6, else 0.4."""
    if days_ago <= 90:
        return 1.0
    elif days_ago <= 365:
        return 0.8
    elif days_ago <= 730:
        return 0.6
    return 0.4


def weighted_score(similarity: float, date_str: str, as_of: datetime, quality: float = None):
    """Returns (weighted_score, recency_weight, days_ago); falls back to
    (similarity, 1.0, 0) on unparseable dates, like the reference."""
    try:
        doc_date = datetime.fromisoformat(date_str.replace("Z", "+00:00"))
        days_ago = (as_of - doc_date).days
        rw = recency_weight(days_ago)
        qw = (quality or 5.0) / 10.0
        return SIM_WEIGHT * similarity + RECENCY_WEIGHT * rw + QUALITY_WEIGHT * qw, rw, days_ago
    except Exception:
        return similarity, 1.0, 0
