"""Porter stemmer (M.F. Porter, "An algorithm for suffix stripping",
Program 14(3), 1980) — the PAPER's rule set, implemented clean-room
from the published step tables (including the paper's step-2 ``abli →
able`` and ``eli → e`` rules, which later porter.c revisions changed).

This is the engine's token-normalization contract for stemmed
retrieval: the Arrow-batched operator in operators/stemming.py applies
THIS function to the corpus vocabulary, and the committed oracle
fixture stores this function's output — so the strict driver compare
proves the distributed path reproduces the kernel byte-for-byte (the
fix_mojibake fixture device).

Only lowercase ASCII words are meaningful inputs (the shared retrieval
tokenizer lowercases and strips everything else); other strings pass
through the same rules unchanged-or-mangled deterministically. Words
of length ≤ 2 are returned unchanged per the paper.
"""

from __future__ import annotations

_VOWELS = set("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in the [C](VC)^m[V] form."""
    m = 0
    prev_v = False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (
        len(w) >= 2
        and w[-1] == w[-2]
        and _is_cons(w, len(w) - 1)
    )


def _cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def _replace(w: str, suffix: str, repl: str, min_m: int) -> str | None:
    """If ``w`` ends with ``suffix`` and the REMAINING stem has
    m > ``min_m``-1 ... (caller passes the paper's condition via
    min_m: condition is m(stem) > min_m − 1, i.e. m ≥ min_m)."""
    if not w.endswith(suffix):
        return None
    stem = w[: len(w) - len(suffix)]
    if _measure(stem) >= min_m:
        return stem + repl
    return w  # suffix matched but condition failed: stop scanning


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        matched = None
        if w.endswith("ed") and _has_vowel(w[:-2]):
            matched = w[:-2]
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            matched = w[:-3]
        if matched is not None:
            w = matched
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w = w + "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2 (longest-match scan per the paper: rules are mutually
    # exclusive on suffix, first match decides)
    for suf, rep in _STEP2:
        out = _replace(w, suf, rep, 1)
        if out is not None:
            w = out
            break

    # step 3
    for suf, rep in _STEP3:
        out = _replace(w, suf, rep, 1)
        if out is not None:
            w = out
            break

    # step 4: delete with m > 1; 'ion' additionally requires stem
    # ending s or t
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and not stem.endswith(("s", "t")):
                    pass
                else:
                    w = stem
            break

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w
