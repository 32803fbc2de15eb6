"""Transcript segmentation (T1/P2).

Line-scan state machine: a line is a turn boundary when it is either a
``Moderator:`` prefix line or matches the TitleCase ``Name:`` header regex
with a valid name (len > 2, not a structural keyword). Continuation lines
accumulate into the current turn; turns flush on the next boundary and at
EOF. Port of the reference parser (pdf-parser/parser/transcript_parser.py:
5-80); semantics preserved exactly, including the fall-through where an
*invalid* speaker-header line becomes continuation text.
"""

import re

_SPEAKER_RE = re.compile(r"^([A-Z][a-zA-Z]+(?:\s+[A-Z][a-zA-Z]+)*)\s*:\s*(.*)$")
_NL_RUN = re.compile(r"\n+")
_INVALID_NAMES = frozenset(["page", "question", "answer", "operator", "company"])
# ord(ch) < 32 except \t (0x09) and \n (0x0a) — C-speed deletion table
# (same char set as the reference's per-character generator)
_CTRL_DELETE = {c: None for c in range(32) if c not in (0x09, 0x0A)}


def clean_dialogue_text(text: str) -> str:
    """Whitespace/control-char normalization for one dialogue turn
    (reference transcript_parser.py:5-19)."""
    text = " ".join(text.split())
    text = text.translate(_CTRL_DELETE)
    if "\n" in text:  # split() above removed all \n; guard keeps generality
        text = _NL_RUN.sub(" ", text)
    return text.strip()


def parse_transcript(text: str):
    """Segment cleaned transcript text into (sorted speaker list, dialogue).

    Returns ``(speakers, dialogue)`` where dialogue is a list of
    ``{"speaker": str, "text": str}`` in document order
    (reference transcript_parser.py:21-80).
    """
    speakers = set()
    dialogue = []
    current_speaker = None
    current_text = []

    def _flush():
        if current_speaker and current_text:
            combined = clean_dialogue_text(" ".join(current_text))
            if combined:
                dialogue.append({"speaker": current_speaker, "text": combined})

    for line in text.split("\n"):
        line = line.strip()
        if not line:
            continue

        if line.startswith("Moderator:"):
            _flush()
            current_speaker = "Moderator"
            speakers.add("Moderator")
            current_text = [line[10:].strip()]
            continue

        m = _SPEAKER_RE.match(line)
        if m:
            name = m.group(1).strip()
            if len(name) > 2 and name.lower() not in _INVALID_NAMES:
                _flush()
                current_speaker = name
                speakers.add(name)
                current_text = [m.group(2).strip()]
                continue

        if current_speaker:
            current_text.append(line)

    _flush()

    return sorted(speakers), dialogue
