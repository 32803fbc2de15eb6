"""Executive roster parsing (T3) and fuzzy name matching (J1 kernel).

Roster parse: three ordered regex patterns over MANAGEMENT content →
``{clean_name: ROLE}`` with later hits overriding; titles stripped,
whitespace collapsed, only executive roles kept
(reference executive_extractor.py:8-41).

Name match: uppercase + strip punctuation on both sides; full-name, or
last-token, or first+last token equality (reference
executive_extractor.py:81-105).
"""

import re

NAME_PATTERNS = [
    r"(MR\.|MS\.|DR\.)\s*([A-Z][A-Za-z\s\.]+?)\s*[-–]\s*(CEO|CFO|MANAGING DIRECTOR|PRESIDENT|VICE CHAIRMAN|GROUP PRESIDENT)",
    r"([A-Z][A-Za-z\s\.]+?)\s*[-–]\s*(CEO|CFO|MANAGING DIRECTOR|CHIEF EXECUTIVE|CHIEF FINANCIAL)",
    r"(MR\.|MS\.|DR\.)\s*([A-Z][A-Za-z\s\.]+?)\s*[-–]\s*(CHIEF EXECUTIVE|CHIEF FINANCIAL|CHIEF OPERATING)",
]

EXECUTIVE_ROLES = [
    "CEO",
    "CFO",
    "MANAGING DIRECTOR",
    "MD",
    "CHIEF EXECUTIVE",
    "CHIEF FINANCIAL",
    "VICE CHAIRMAN",
    "GROUP PRESIDENT",
]

_COMPILED_NAME_PATTERNS = [re.compile(p, re.IGNORECASE) for p in NAME_PATTERNS]
_TITLE_PREFIX = re.compile(r"^(MR\.|MS\.|DR\.)\s*")
_WS_RUN = re.compile(r"\s+")
_NON_WORD = re.compile(r"[^\w\s]")


def extract_roster(content: str):
    """MANAGEMENT-turn content → {executive_name: ROLE}."""
    executives = {}
    for pattern in _COMPILED_NAME_PATTERNS:
        for match in pattern.findall(content):
            if len(match) == 3:
                title, name, role = match
                clean_name = f"{title} {name}".strip()
            else:
                clean_name, role = match
            clean_name = _TITLE_PREFIX.sub("", clean_name).strip()
            clean_name = _WS_RUN.sub(" ", clean_name)
            if any(er in role.upper() for er in EXECUTIVE_ROLES):
                executives[clean_name] = role.upper()
    return executives


def normalize_name(name: str) -> str:
    """Uppercase, strip punctuation — the match key normalization."""
    return _NON_WORD.sub("", name.upper())


def last_name_key(name: str) -> str:
    """Last whitespace token of the normalized name — the broadcast-join
    equi-key the Spark operator uses (every reference match rule implies
    last-token equality, so joining on it is lossless)."""
    parts = normalize_name(name).split()
    return parts[-1] if parts else ""


def name_matches(speaker: str, executive_name: str) -> bool:
    clean_speaker = normalize_name(speaker)
    clean_exec = normalize_name(executive_name)

    speaker_parts = clean_speaker.split()
    exec_parts = clean_exec.split()

    if clean_speaker == clean_exec:
        return True
    if speaker_parts and exec_parts and speaker_parts[-1] == exec_parts[-1]:
        return True
    if (
        len(speaker_parts) >= 2
        and len(exec_parts) >= 2
        and speaker_parts[0] == exec_parts[0]
        and speaker_parts[-1] == exec_parts[-1]
    ):
        return True
    return False
