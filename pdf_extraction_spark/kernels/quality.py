"""Content quality scorer (P10): deterministic 1–10 business-value score.

Port of the reference scorer (embeddings_generator.py:37-93): base 5.0;
hard 1.0 when ≥2 admin phrases; −3 for one admin phrase; +1/+2/+4 for
≥1/≥3/≥5 business keywords; +1/+2/+3 for >50/>100/>200 words, −2 for <20;
+1.5 for Q&A cues; −2 for a closing phrase under 100 words; clamp [1, 10].
"""

ADMIN_PHRASES = [
    "forward-looking statements",
    "predictions, projections",
    "draw your attention",
    "thank you, chirag",
    "good evening and welcome",
    "disclaimer before we begin",
    "estimates involve several risks",
    "differ materially from what is expressed",
    "publicly update any forward-looking",
    "thank you so much for joining",
    "have a good evening",
]

BUSINESS_INDICATORS = [
    "revenue",
    "growth",
    "margin",
    "ebitda",
    "profit",
    "sales",
    "market",
    "business",
    "quarter",
    "performance",
    "segment",
    "portfolio",
    "strategy",
    "expansion",
    "investment",
    "pipeline",
    "competition",
    "guidance",
    "outlook",
    "forecast",
    "expect",
]

QA_CUES = ["question", "answer", "q:", "a:", "let me"]

CLOSING_PHRASES = ["thank you for joining", "have a good evening", "any follow on questions"]

QUALITY_GATE = 3.5  # embed threshold (reference embeddings_generator.py:95)


def quality_score(content: str) -> float:
    lower = content.lower()
    score = 5.0

    admin_count = sum(1 for p in ADMIN_PHRASES if p in lower)
    if admin_count >= 2:
        return 1.0
    elif admin_count == 1:
        score -= 3.0

    business_mentions = sum(1 for k in BUSINESS_INDICATORS if k in lower)
    if business_mentions >= 5:
        score += 4.0
    elif business_mentions >= 3:
        score += 2.0
    elif business_mentions >= 1:
        score += 1.0

    word_count = len(content.split())
    if word_count > 200:
        score += 3.0
    elif word_count > 100:
        score += 2.0
    elif word_count > 50:
        score += 1.0
    elif word_count < 20:
        score -= 2.0

    if any(p in lower for p in QA_CUES):
        score += 1.5

    if any(p in lower for p in CLOSING_PHRASES) and word_count < 100:
        score -= 2.0

    return max(1.0, min(10.0, score))
