"""Training-data text analysis kernels: language ID, token counting,
fingerprinting, shingles, MinHash, SimHash.

These back the large-scale pipeline operators (dedup / quality / langid)
that extend the reference's capabilities to web-corpus curation. All
hashes are xxhash-free pure Python (splitmix-style 64-bit mix) so the
Spark side can reproduce them with native ``xxhash64`` only where the
kernel is not the contract; where cross-checked, operators call these
kernels inside pandas UDFs.
"""

import re

_WORD_RE = re.compile(r"\w+(?:'\w+)?|[^\w\s]", re.UNICODE)

# tiny per-language stopword lists for the n-gram/stopword language
# heuristic (public-knowledge function words)
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "on", "as", "are", "was", "at", "this"},
    "es": {"el", "la", "de", "que", "y", "en", "los", "del", "se", "las", "por", "un", "una", "con", "para"},
    "de": {"der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "im", "für", "auf", "des", "ein", "nicht"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "une", "du", "que", "est", "pour", "dans", "qui"},
    "hi": {"के", "है", "में", "की", "से", "का", "और", "को", "पर", "यह", "कि", "एक", "हैं", "था", "नहीं"},
}


def mix64(x: int) -> int:
    """splitmix64 finalizer — a stable 64-bit mixer (public constant set)."""
    x &= 0xFFFFFFFFFFFFFFFF
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
    x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def hash_bytes(data: bytes, seed: int = 0) -> int:
    """Deterministic 64-bit FNV-1a/splitmix combination over bytes."""
    h = (0xCBF29CE484222325 ^ mix64(seed)) & 0xFFFFFFFFFFFFFFFF
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return mix64(h)


def hash_str_fast(s: str) -> int:
    """Deterministic 64-bit string hash at C speed (blake2b digest) —
    used where hashes are consumed in bulk (minhash shingles); the
    python-loop FNV stays for seeds/ids where call counts are small."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
    )


def tokenize(text: str):
    """BPE-ish regex tokenizer: words (with inner apostrophes) +
    punctuation marks as separate tokens."""
    return _WORD_RE.findall(text)


def token_count(text: str) -> int:
    return len(tokenize(text))


def detect_language(text: str) -> str:
    """Stopword-ratio language heuristic; 'und' (undetermined) when no
    language reaches 2 stopword hits."""
    words = [w.lower() for w in text.split()]
    if not words:
        return "und"
    wordset = {}
    for w in words:
        wordset[w] = wordset.get(w, 0) + 1
    best_lang, best_hits = "und", 0
    for lang, stops in _LANG_STOPWORDS.items():
        hits = sum(wordset.get(s, 0) for s in stops)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits >= 2 else "und"


def fingerprint(text: str, window: int = 8) -> int:
    """Document fingerprint: min rolling hash over token windows
    (winnowing-style; Schleimer et al., SIGMOD 2003)."""
    toks = tokenize(text.lower())
    if not toks:
        return 0
    if len(toks) < window:
        return hash_bytes(" ".join(toks).encode("utf-8"))
    return min(
        hash_bytes(" ".join(toks[i : i + window]).encode("utf-8"))
        for i in range(len(toks) - window + 1)
    )


def shingles(text: str, n: int = 3):
    """Word n-gram shingle set (lowercased)."""
    toks = [t.lower() for t in tokenize(text)]
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def minhash_signature(text: str, num_hashes: int = 64, n: int = 3):
    """MinHash signature over word-n-gram shingles: permutation i is
    ``mix64(shingle_hash ^ mix64(i+1))`` with blake2b shingle hashes."""
    sh = shingles(text, n)
    if not sh:
        return [0] * num_hashes
    base = [hash_str_fast(s) for s in sh]
    return [min(mix64(h ^ mix64(i + 1)) for h in base) for i in range(num_hashes)]


def simhash(text: str, bits: int = 64) -> int:
    """Charikar SimHash over tokens (weight = term frequency)."""
    toks = tokenize(text.lower())
    if not toks:
        return 0
    counts = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    acc = [0] * bits
    for t, w in counts.items():
        h = hash_bytes(t.encode("utf-8"))
        for b in range(bits):
            acc[b] += w if (h >> b) & 1 else -w
    out = 0
    for b in range(bits):
        if acc[b] > 0:
            out |= 1 << b
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
