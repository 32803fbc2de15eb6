"""Text-analysis kernel tests: langid, tokenizing, fingerprints,
minhash/simhash properties."""

import random

from pdf_extraction_spark.kernels.textstats import (
    detect_language,
    fingerprint,
    hamming64,
    jaccard,
    minhash_signature,
    shingles,
    simhash,
    token_count,
    tokenize,
)


class TestTokenize:
    def test_words_and_punct(self):
        assert tokenize("don't stop, now!") == ["don't", "stop", ",", "now", "!"]

    def test_count(self):
        assert token_count("a b c.") == 4
        assert token_count("") == 0


class TestLangid:
    def test_en(self):
        assert detect_language("the cat is on the mat and that is that") == "en"

    def test_es(self):
        assert detect_language("el informe de la empresa y los resultados en la región") == "es"

    def test_de(self):
        assert detect_language("der Bericht der Firma und das Ergebnis von den Zahlen") == "de"

    def test_und(self):
        assert detect_language("xyzzy plugh foobar") == "und"
        assert detect_language("") == "und"


class TestFingerprint:
    def test_deterministic_and_shift_invariant_tail(self):
        base = "one two three four five six seven eight nine ten eleven twelve"
        assert fingerprint(base) == fingerprint(base)
        # min over a superset of windows can only stay equal or decrease
        assert fingerprint(base + " " + base) <= fingerprint(base)

    def test_short_doc(self):
        assert fingerprint("tiny doc") != 0


class TestMinhashSimhash:
    def test_minhash_estimates_jaccard(self):
        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(200)]
        a_words = [rng.choice(vocab) for _ in range(300)]
        b_words = list(a_words)
        # mutate ~10% of b
        for i in range(0, 300, 10):
            b_words[i] = rng.choice(vocab)
        a, b = " ".join(a_words), " ".join(b_words)
        sa, sb = minhash_signature(a, 128), minhash_signature(b, 128)
        est = sum(1 for x, y in zip(sa, sb) if x == y) / 128
        true = jaccard(shingles(a), shingles(b))
        assert abs(est - true) < 0.15

    def test_minhash_identical(self):
        s = minhash_signature("same text here for both docs in full")
        assert s == minhash_signature("same text here for both docs in full")

    def test_simhash_near_vs_far(self):
        a = "the quick brown fox jumps over the lazy dog " * 5
        b = a.replace("lazy", "sleepy")
        c = "completely different content about spark aggregation windows"
        assert hamming64(simhash(a), simhash(b)) < hamming64(simhash(a), simhash(c))

    def test_jaccard_edges(self):
        assert jaccard(set(), set()) == 1.0
        assert jaccard({"a"}, set()) == 0.0
        assert jaccard({"a", "b"}, {"b", "c"}) == 1 / 3
