"""Text normalizer (P1).

Semantics of the reference cleaner (text_cleaner.py:3-21 in the reference
repo): an ordered replacement chain. Order is load-bearing — straight
apostrophes are deleted *before* curly quotes are converted to ASCII, so
curly apostrophes survive as ASCII while straight ones vanish.
"""

import re

_TRIPLE_APOS = re.compile(r"'''")
_APOS = re.compile(r"'")
_MULTI_SPACE = re.compile(r" +")
_MULTI_NL = re.compile(r"\n{3,}")
_PAGE_NO = re.compile(r"Page \d+ of \d+", re.IGNORECASE)


def clean_text(text: str) -> str:
    """Normalize extracted text. Byte-exact port of reference
    text_cleaner.clean_text (pdf-parser/cleaner/text_cleaner.py:3-21)."""
    text = _TRIPLE_APOS.sub("", text)
    text = _APOS.sub("", text)

    text = text.replace("‘", "'").replace("’", "'")
    text = text.replace("“", '"').replace("”", '"')
    text = text.replace("–", "-").replace("—", "-")

    text = _MULTI_SPACE.sub(" ", text)
    text = _MULTI_NL.sub("\n\n", text)

    text = _PAGE_NO.sub("", text)

    return text.strip()
