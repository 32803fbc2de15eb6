"""Boilerplate/admin chunk filters (P3–P6) — pure predicates.

Port of the reference filter (filter.py:8-72). Precedence: the
MANAGEMENT allowlist beats everything; then speaker blocklist; then
content rules (admin keyword OR < 10 words)."""

REMOVE_KEYWORDS = [
    "good day and welcome",
    "please signal an operator",
    "press '*' then '0'",
    "this conference is being recorded",
    "thank you and over to you",
    "scrip code",
    "company secretary",
    "corporate identity number",
    "regd. office",
    "phone +91",
    "fax +91",
    "e-mail contactus@",
    "website www.",
]

REMOVE_SPEAKERS = ["Scrip Code", "Company Secretary", "Operator"]

ALWAYS_KEEP_SPEAKERS = ["MANAGEMENT"]

MIN_WORDS = 10


def should_remove_content(content: str) -> bool:
    lower = content.lower()
    if any(k in lower for k in REMOVE_KEYWORDS):
        return True
    return len(content.split()) < MIN_WORDS


def keep_chunk(speaker: str, content: str) -> bool:
    if speaker in ALWAYS_KEEP_SPEAKERS:
        return True
    if speaker in REMOVE_SPEAKERS:
        return False
    return not should_remove_content(content)
