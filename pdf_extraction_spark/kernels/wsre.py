"""Cross-engine whitespace regex classes (measured, not assumed).

Three regex engines meet in this repo — Java (Spark), RE2 (DuckDB
twins), and Python ``re`` / ``str.split()`` (kernels) — and each has a
different ``\\s``:

========  =============================================================
engine    ``\\s`` matches
========  =============================================================
Java      ``[ \\t\\n\\x0B\\f\\r]`` (ASCII six)
RE2       ``[ \\t\\n\\f\\r]`` (ASCII five — NO vertical tab)
Python    Unicode White_Space ∪ ``[\\x1C-\\x1F]`` (29 code points;
          ``str.split()`` uses the same set)
Java(?U)  Unicode White_Space (Python's set minus ``\\x1C-\\x1F``)
========  =============================================================

Any twin that tokenizes with a bare ``\\s`` therefore disagrees with its
Spark or kernel counterpart on vertical tabs / exotic Unicode spaces.
The fix used across the engine: spell the intended set as an explicit
character class whose *text* parses identically in all three engines
(verified by an exhaustive 0..0x3200 code-point sweep in
``tests/test_wsre.py``). Use:

- :data:`JAVA_WS` (+ :data:`JAVA_WS_SPLIT`) when the Spark side uses a
  bare Java ``\\s`` and the twin must agree exactly;
- :data:`PY_WS` (+ :data:`PY_WS_SPLIT`) when the contract side is
  Python ``str.split()`` / ``re`` (kernels) — also the right class for
  a Spark operator that must match such a kernel bit-exactly;
- :data:`WHITE_SPACE_BODY` when the Spark side uses Java ``(?U)\\s``.

Residual (documented, deliberate): regexes that are the *reference's
spec* (kernels/financial.py, kernels/executives.py NAME_PATTERNS) keep
their original ``\\s`` spelling on the kernel side — the pattern text IS
the ported contract. Twins of those kernels route the pattern through
:func:`py_ws_exact` so the DuckDB copy means what Python meant.
"""

# class bodies (no brackets) so they can be unioned into larger classes
JAVA_WS_BODY = r" \t\n\x0B\f\r"
# Java (?U)\s == Unicode White_Space (PropList.txt): tab..CR, space,
# NEL, NBSP, OGHAM, EN QUAD..HAIR SPACE, LS, PS, NNBSP, MMSP, IDSP
WHITE_SPACE_BODY = (
    r"\t-\r \x{85}\x{A0}\x{1680}\x{2000}-\x{200A}\x{2028}\x{2029}"
    r"\x{202F}\x{205F}\x{3000}"
)
# Python str.split() / re \s == White_Space plus the C0 separators
PY_WS_BODY = (
    r"\t-\r\x{1C}-\x{1F} \x{85}\x{A0}\x{1680}\x{2000}-\x{200A}"
    r"\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}"
)

JAVA_WS = "[" + JAVA_WS_BODY + "]"
PY_WS = "[" + PY_WS_BODY + "]"

JAVA_WS_SPLIT = JAVA_WS + "+"
PY_WS_SPLIT = PY_WS + "+"


def _rewrite_ws(pattern: str, body: str) -> str:
    """Rewrite every ``\\s`` in ``pattern`` to the explicit class with
    body ``body``: standalone ``\\s`` becomes ``[body]``, ``\\s`` inside
    a character class becomes the bracketless body. Escapes and class
    state are tracked; ``\\S`` is refused (no call site uses it; a
    silent pass-through would reintroduce the divergence this module
    exists to close)."""
    out = []
    in_class = False
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern):
            nxt = pattern[i + 1]
            if nxt == "s":
                out.append(body if in_class else "[" + body + "]")
            elif nxt == "S":
                raise ValueError(r"ws rewrite: \S unsupported")
            else:
                out.append(ch + nxt)
            i += 2
            continue
        if ch == "[" and not in_class:
            in_class = True
        elif ch == "]" and in_class:
            in_class = False
        out.append(ch)
        i += 1
    return "".join(out)


def py_ws_exact(pattern: str) -> str:
    """For twins of *Python-re* kernels: make ``\\s`` mean what Python
    meant, in any engine."""
    return _rewrite_ws(pattern, PY_WS_BODY)


def java_ws_exact(pattern: str) -> str:
    """For DuckDB twins of *Spark-native* regexes: make ``\\s`` mean
    what Java's default (ASCII-six) ``\\s`` means, vertical tab
    included, in RE2 too."""
    return _rewrite_ws(pattern, JAVA_WS_BODY)


def java_i_twin(pattern: str) -> str:
    """The full twin-derivation chain for a Spark-side ``(?i)+pattern``
    regex: explicit ASCII dual casing, then the explicit Java ``\\s``
    class — ONE shared spelling so the driver oracle
    (``__spark_entry__._fin_pat``) and the parity fuzz
    (tests/test_fin_regex_parity.py) provably run the same rewrite."""
    return java_ws_exact(ascii_i_exact(pattern))


def ascii_i_exact(pattern: str) -> str:
    """Replace the engine-varying ``(?i)`` flag with explicit ASCII
    dual-casing, measured semantics: Java's ``(?i)`` folds ASCII ONLY
    (``ſ``/``K``/``İ`` never match s/k/i, in classes or out), RE2's
    ``(?i)`` folds Unicode simple-fold (ſ and K match, İ doesn't), and
    Python's folds a wider set still (İ matches i). A twin that keeps
    ``(?i)`` therefore extracts more than Spark on non-ASCII case
    variants. This rewriter emits a flag-free pattern that means
    Java-(?i) in every engine: ASCII letters outside classes become
    ``[cC]``; single letters and same-case letter ranges inside classes
    gain their swapped-case counterparts.

    Run this BEFORE :func:`java_ws_exact`/:func:`py_ws_exact` — the
    whitespace bodies contain ``\\x0B`` whose ``B`` must not be
    dual-cased. Input must not itself carry a ``(?i)`` flag."""
    if "(?i" in pattern:
        raise ValueError("ascii_i_exact: pass the bare pattern, not (?i)...")

    def swap_range(lo: str, hi: str) -> str:
        if lo.islower() and hi.islower():
            return lo.upper() + "-" + hi.upper()
        if lo.isupper() and hi.isupper():
            return lo.lower() + "-" + hi.lower()
        # [B-d]-style mixed-case ranges fold non-contiguously under
        # Java (?i); silently skipping the fold would under-match
        raise ValueError(f"ascii_i_exact: mixed-case range {lo}-{hi} unsupported")

    out = []
    in_class = False
    i = 0
    n = len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt in "xupP0":
                # multi-char escapes (\xHH, \uHHHH, \p{..}, octal):
                # consuming only 2 chars would dual-case the trailing
                # hex/property letters — refuse rather than corrupt
                # (also why this rewriter must run BEFORE java_ws_exact,
                # whose output contains \x0B)
                raise ValueError(
                    f"ascii_i_exact: \\{nxt}... escapes unsupported"
                )
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if not in_class:
            if ch == "[":
                in_class = True
                out.append(ch)
            elif ch.isascii() and ch.isalpha():
                out.append("[" + ch + (ch.upper() if ch.islower() else ch.lower()) + "]")
            else:
                out.append(ch)
            i += 1
            continue
        # inside a character class
        if ch == "]":
            in_class = False
            out.append(ch)
            i += 1
            continue
        is_range = (
            i + 2 < n
            and pattern[i + 1] == "-"
            and pattern[i + 2] not in "]\\"
        )
        if is_range:
            lo, hi = ch, pattern[i + 2]
            out.append(lo + "-" + hi)
            if lo.isascii() and lo.isalpha() and hi.isascii() and hi.isalpha():
                out.append(swap_range(lo, hi))
            i += 3
            continue
        out.append(ch)
        if ch.isascii() and ch.isalpha():
            swapped = ch.upper() if ch.islower() else ch.lower()
            if swapped != ch:
                out.append(swapped)
        i += 1
    return "".join(out)
