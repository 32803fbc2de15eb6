"""Mojibake repair (ftfy-lite): undo UTF-8-bytes-decoded-as-Latin-1.

The single most common Common-Crawl encoding defect is a page whose
UTF-8 bytes were interpreted as Latin-1/cp1252 somewhere in the
pipeline ("café" → "cafÃ©"). The inverse transform is exact when it
applies: re-encode the text as Latin-1 and decode the bytes as UTF-8.

The guard chain makes the repair total and conservative:

1. every code point ≤ 0xFF (otherwise the text cannot be a Latin-1
   view of bytes at all, and Latin-1 re-encoding would be lossy);
2. a mojibake *marker* is present — a char in [\\xC2-\\xF4] (a UTF-8
   lead byte seen as Latin-1) followed by one in [\\x80-\\xBF] (a
   continuation byte). Legit Latin-1 prose almost never pairs these;
3. the Latin-1 re-encoding is *valid UTF-8* in its entirety —
   otherwise decoding would corrupt, so the text is left untouched.

``passes=2`` also unwinds doubly-damaged text (damaged, re-served,
damaged again — common across mirror chains).

This module is the pure-Python contract; the Spark operator
(operators/textanalysis.py:fix_mojibake_col) expresses the identical
chain with *native* expressions (rlike + encode/decode +
is_valid_utf8) — zero Python in the distributed path — and the two are
pinned equal by tests/test_textstats.py and the ``fix_mojibake``
oracle fixture.
"""

import re

# lead byte C2-F4 as a Latin-1 char, then a continuation byte 80-BF
MARKER_PATTERN = "[\u00c2-\u00f4][\u0080-\u00bf]"
MARKER_RE = re.compile(MARKER_PATTERN)
_LATIN1_MAX = 0xFF


def fix_mojibake(text, passes: int = 1):
    """Repair UTF-8-as-Latin-1 mojibake; returns input unchanged when
    any guard fails. None-safe."""
    if text is None:
        return None
    for _ in range(passes):
        if any(ord(ch) > _LATIN1_MAX for ch in text):
            break
        if not MARKER_RE.search(text):
            break
        try:
            repaired = text.encode("latin-1").decode("utf-8", errors="strict")
        except UnicodeDecodeError:
            break
        text = repaired
    return text
