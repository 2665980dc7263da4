"""Shared lexical analyzer (VERDICT r12 item 1): the three twins —
Spark expression, driver-side Python, DuckDB SQL — must tokenize
bit-identically (a divergent probe term never matches a posting; a
divergent oracle never matches the engine), the stopword/stem hooks
must compose in the documented order, and the config must survive a
meta round-trip."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from industrial_data_pipeline_spark.operators.analyzer import Analyzer

#: zero-width + control + punctuation + unicode + case + empty — the
#: inputs a web corpus actually contains. ​ inside a word must
#: weld it ("me<zw>rge" -> "merge"), \x07 likewise; «»/—/' are
#: non-word chars; 漢字/é are analyzer-dropped by design (ASCII word
#: runs); Kelvin sign K (U+212A) is dropped, never lowercased.
NASTY = [
    "«Me​rge, the BATCHES! a hash-join» rows mass s 1",
    "",
    "   ",
    "dog. dog dogs DOG's",
    "tab\there CR\rLF\nnbsp x",
    "be\x07ll \x1funit\n\nctrl",
    "漢字 café naïve K 100x 3s ss sss osss",
    "customer's order—stream… a the of THE",
    "﻿bom-start zwnj‌weld",
    "a1b2c3 42 s 0s",
]

CASES = [
    Analyzer(),
    Analyzer(stopwords=("the", "a", "of")),
    Analyzer(stem_s=True),
    Analyzer(stopwords=("the", "a"), stem_s=True),
]


@pytest.mark.parametrize("az", CASES,
                         ids=["plain", "stop", "stem", "stop+stem"])
def test_spark_twin_matches_py(spark, az):
    df = spark.createDataFrame([(s,) for s in NASTY], "s string")
    rows = df.select("s", az.spark("s").alias("tk")).collect()
    assert len(rows) == len(NASTY)
    for r in rows:
        assert list(r.tk) == az.py(r.s), r.s


@pytest.mark.parametrize("az", CASES,
                         ids=["plain", "stop", "stem", "stop+stem"])
def test_sql_twin_matches_py(az):
    con = duckdb.connect()
    for s in NASTY:
        got = con.execute(f"SELECT {az.sql('?')}",
                          [s]).fetchone()[0]
        assert got == az.py(s), s


def test_stem_rules_pinned():
    """The documented light-stemmer boundary: plain plurals only."""
    az = Analyzer(stem_s=True)
    assert az.py("rows windows mass batches ss sss s 3s 0s cabs") == [
        "row", "window", "mass", "batche", "ss", "sss", "s", "3s",
        "0s", "cab"]


def test_stopwords_after_lowercase_and_duplicates_kept():
    az = Analyzer(stopwords=("the",))
    assert az.py("THE the The dog dog") == ["dog", "dog"]


def test_stopword_validation():
    with pytest.raises(ValueError):
        Analyzer(stopwords=("The",))  # not lowercase
    with pytest.raises(ValueError):
        Analyzer(stopwords=("two words",))  # not a single token


def test_meta_round_trip():
    az = Analyzer(stopwords=("the", "a"), stem_s=True)
    assert Analyzer.from_meta(az.to_meta()) == az
    assert Analyzer.from_meta(None) is None
    assert Analyzer.from_meta(Analyzer().to_meta()) == Analyzer()


#: the NON-ASCII twin matrix (VERDICT r13 item 3): CJK, Cyrillic,
#: Greek incl. the contextual-final-sigma divergence, Turkish
#: dotted İ (the U+0307 full-lowering divergence), precomposed
#: accents, fullwidth digits, superscripts (No), titlecase ǅ,
#: mixed-script, zero-width welds inside non-ASCII words, and the
#: decomposed-marks boundary (NFD text splits at M*; documented).
UNI_NASTY = [
    "日本語のテキスト 漢字",
    "ПРИВЕТ мир Мир ПРИВЕТ",
    "ΑΣ ΣΟΦΟΣ ΕΛΛΑΣ σοφός",
    "İstanbul ISTANBUL ı I",
    "café CAFÉ naïve NAÏVE",
    "１２３ ４５ x² E=mc²",
    "ǅungla ẞ ß",
    "mixedСкрипт한글latin42",
    "при​вет za‌welded",          # ZWSP / ZWNJ inside words weld
    "étude",                # NFD: é decomposed — splits at the mark
    "«—»…",
    "",
]

UNI_CASES = [
    Analyzer(unicode_words=True),
    Analyzer(unicode_words=True, stopwords=("мир", "the")),
    Analyzer(unicode_words=True, stem_s=True),
]


@pytest.mark.parametrize("az", UNI_CASES,
                         ids=["uni", "uni+stop", "uni+stem"])
def test_unicode_spark_twin_matches_py(spark, az):
    df = spark.createDataFrame([(s,) for s in UNI_NASTY], "s string")
    rows = df.select("s", az.spark("s").alias("tk")).collect()
    assert len(rows) == len(UNI_NASTY)
    for r in rows:
        assert list(r.tk) == az.py(r.s), r.s


@pytest.mark.parametrize("az", UNI_CASES,
                         ids=["uni", "uni+stop", "uni+stem"])
def test_unicode_sql_twin_matches_py(az):
    con = duckdb.connect()
    for s in UNI_NASTY:
        got = con.execute(f"SELECT {az.sql('?')}",
                          [s]).fetchone()[0]
        assert got == az.py(s), s


def test_unicode_semantics_pinned():
    """The folds and boundaries, stated as exact values: final
    sigma folds to σ (both from uppercase Σ context-lowering AND
    literal ς), İ lowers to bare i (U+0307 stripped), CJK passes
    whole, NFD text splits at combining marks, and the ASCII
    analyzer drops all of it."""
    az = Analyzer(unicode_words=True)
    assert az.py("ΕΛΛΑΣ σοφός") == ["ελλασ", "σοφόσ"]
    assert az.py("İstanbul I ı") == ["istanbul", "i", "ı"]
    assert az.py("Дом ДОМ дом") == ["дом", "дом", "дом"]
    assert az.py("étude étude") == ["e", "tude", "étude"]
    assert az.py("日本語 x²") == ["日本語", "x²"]
    # the same corpus through the ASCII analyzer: non-ASCII gone
    assert Analyzer().py("ΕΛΛΑΣ Дом 日本語 étude") == ["tude"]
    # unicode stopwords validate against the analyzer's own folds
    assert Analyzer(unicode_words=True,
                    stopwords=("ελλασ",)).py("ΕΛΛΑΣ x") == ["x"]
    with pytest.raises(ValueError):
        Analyzer(unicode_words=True, stopwords=("ΕΛΛΑΣ",))  # upper
    with pytest.raises(ValueError):
        Analyzer(unicode_words=True, stopwords=("σοφός!",))
    # s-stem stays ASCII-only: Cyrillic token ending in 'с' untouched
    az2 = Analyzer(unicode_words=True, stem_s=True)
    assert az2.py("rows колёса") == ["row", "колёса"]


def test_unicode_meta_round_trip():
    az = Analyzer(unicode_words=True, stopwords=("мир",),
                  stem_s=True)
    assert Analyzer.from_meta(az.to_meta()) == az
    # pre-round-14 meta (no unicode_words key) reads as ASCII
    meta = Analyzer(stopwords=("the",)).to_meta()
    del meta["unicode_words"]
    assert Analyzer.from_meta(meta) == Analyzer(stopwords=("the",))
