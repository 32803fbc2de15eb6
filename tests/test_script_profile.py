"""Unicode script profile: dominance, the integer mixed-script
(homoglyph) rule, combining-sign handling (fraction must stay <= 1),
tie-break order, and null/empty semantics. Cross-engine twin parity
lives in the strict oracle sweep (script_profile) and the adversarial
sweep."""

from pdf_extraction_spark.operators.textanalysis import with_script_profile


def _profile(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in with_script_profile(df).collect()}


class TestScriptProfile:
    def test_dominance_and_counts(self, spark):
        got = _profile(
            spark,
            [
                (0, "Hello world"),
                (1, "Привет мир"),
                (2, "日本語のテキスト"),
                (3, "مرحبا بالعالم"),
                (4, "한국어"),
                (5, "Ελληνικά"),
            ],
        )
        assert got[0].main_script == "latin" and got[0].n_latin == 10
        assert got[1].main_script == "cyrillic"
        assert got[2].main_script == "kana"  # kana outnumber the CJK
        assert got[2].n_cjk == 3 and got[2].n_kana == 5
        assert got[3].main_script == "arabic"
        assert got[4].main_script == "hangul"
        assert got[5].main_script == "greek"
        assert all(r.main_frac == 1.0 for r in got.values() if r.doc_id != 2)

    def test_homoglyph_flag(self, spark):
        # Cyrillic 'а' planted inside Latin text: >5% off-script fires;
        # a long clean Latin doc with one stray char under 5% does not
        clean = "a" * 100 + " б"  # 1/101 < 5%
        got = _profile(spark, [(0, "pаypаl login"), (1, clean)])
        assert got[0].main_script == "latin" and got[0].mixed_script
        assert got[1].main_script == "latin" and not got[1].mixed_script

    def test_combining_signs_keep_fraction_bounded(self, spark):
        # Devanagari vowel signs are in the script range but not \p{L}:
        # the fraction base is script-classified chars, never letters
        got = _profile(spark, [(0, "हिन्दी पाठ")])
        assert got[0].main_script == "devanagari"
        assert got[0].main_frac == 1.0
        assert got[0].n_devanagari > got[0].n_letters

    def test_tie_breaks_to_earlier_script(self, spark):
        got = _profile(spark, [(0, "ab яю")])  # 2 latin, 2 cyrillic
        assert got[0].main_script == "latin"
        assert got[0].mixed_script  # 50% off-script

    def test_none_other_and_null(self, spark):
        got = _profile(
            spark,
            [(0, ""), (1, None), (2, "1234 !?"), (3, "ไทย")],  # Thai: unlisted
        )
        for i in (0, 1, 2):
            assert got[i].main_script == "none"
            assert got[i].main_frac == 0.0 and not got[i].mixed_script
        assert got[3].main_script == "other"
        assert got[3].n_letters == 3 and got[3].main_frac == 0.0

    def test_digits_counted_separately(self, spark):
        got = _profile(spark, [(0, "abc 123 45")])
        assert got[0].n_digits == 5 and got[0].n_latin == 3
