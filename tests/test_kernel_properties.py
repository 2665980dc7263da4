"""Property-based checks for the pure-Python kernels (no Spark
session needed — these run on driver-side numpy, which is exactly how
the Arrow workers execute them).

- PNG encode→decode round-trips any 8-bit image (1/2/3/4 channels).
- resize_nearest agrees with an index-arithmetic reference and is
  idempotent at the same size.
- Alternating-star connected components equals union-find ground
  truth on arbitrary random graphs (pure-Python replica of the same
  star rounds the Spark operator runs — the operator itself is
  differential-tested against min-label in test_dedup.py).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from industrial_data_pipeline_spark.operators import multimodal as MM


@st.composite
def images(draw):
    w = draw(st.integers(min_value=1, max_value=24))
    h = draw(st.integers(min_value=1, max_value=24))
    c = draw(st.sampled_from([1, 2, 3, 4]))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, c), dtype=np.uint8)


@given(images())
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(px):
    payload = MM.png_encode(px)
    h, w, c = px.shape
    assert MM.probe_image(payload) == ("png", w, h)
    dw, dh, dc, out = MM.png_decode(payload)
    assert (dw, dh, dc) == (w, h, c)
    assert np.array_equal(out, px)


@given(images(), st.integers(min_value=1, max_value=31),
       st.integers(min_value=1, max_value=31))
@settings(max_examples=40, deadline=None)
def test_resize_nearest_property(px, nw, nh):
    out = MM.resize_nearest(px, nw, nh)
    h, w, c = px.shape
    assert out.shape == (nh, nw, c)
    # spot-check the index map: dst (x,y) takes src (x*w//nw, y*h//nh)
    for y in (0, nh - 1):
        for x in (0, nw - 1):
            assert np.array_equal(out[y, x], px[(y * h) // nh,
                                                (x * w) // nw])
    # idempotent at identical size
    same = MM.resize_nearest(px, w, h)
    assert np.array_equal(same, px)


def _star_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Pure-Python replica of connected_components_star's rounds."""
    from collections import defaultdict

    def sym(pairs):
        out = set()
        for a, b in pairs:
            out.add((a, b))
            out.add((b, a))
        return out

    nodes = {n for e in edges for n in e}
    cur = sym([(a, b) for a, b in edges if a != b])
    prev_quiet = False
    for i in range(200):
        nb = defaultdict(set)
        for u, v in cur:
            nb[u].add(v)
        new = set()
        for u in nb:
            m = min(min(nb[u]), u)
            if i % 2 == 0:
                for v in nb[u]:
                    if v > u:
                        new.add((v, m))
            else:
                for v in nb[u]:
                    if v <= u:
                        new.add((v, m))
                new.add((u, m))
        new = sym({(a, b) for a, b in new if a != b})
        quiet = new == cur
        cur = new
        if quiet and prev_quiet:
            break
        prev_quiet = quiet
    nb = defaultdict(set)
    for u, v in cur:
        nb[u].add(v)
    return {n: (min(min(nb[n]), n) if n in nb else n) for n in nodes}


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=40),
                          st.integers(min_value=0, max_value=40)),
                min_size=0, max_size=80))
@settings(max_examples=150, deadline=None)
def test_star_cc_equals_union_find(edges):
    edges = [(a, b) for a, b in edges if a != b]
    nodes = sorted({n for e in edges for n in e})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {n: find(n) for n in nodes}
    assert _star_labels(edges) == truth


@given(st.integers(min_value=1, max_value=65535),
       st.integers(min_value=1, max_value=65535))
@settings(max_examples=40, deadline=None)
def test_jfif_header_probe_property(w, h):
    payload = MM.jfif_encode_header(w, h)
    assert MM.probe_image(payload) == ("jpeg", w, h)
    # truncation anywhere must return None or the right dims — never
    # raise (the dirty-media-lake contract)
    for cut in (2, 4, len(payload) // 2, len(payload) - 1):
        got = MM.probe_image(payload[:cut])
        assert got is None or got == ("jpeg", w, h)


@given(st.integers(min_value=1, max_value=65535),
       st.integers(min_value=1, max_value=65535))
@settings(max_examples=40, deadline=None)
def test_gif_header_probe_property(w, h):
    assert MM.probe_image(MM.gif_encode_header(w, h)) == ("gif", w, h)


def test_probe_rejects_garbage():
    assert MM.probe_image(None) is None
    assert MM.probe_image(b"") is None
    assert MM.probe_image(b"not an image at all") is None
    # JPEG SOI followed by garbage: walk must terminate, not loop
    assert MM.probe_image(b"\xff\xd8" + b"\x00" * 50) is None


def test_zorder_quota_arithmetic_equals_ntile(spark):
    """q172's integer quota formula must reproduce F.ntile(16) for
    ANY row count, including N < 16 and N % 16 != 0 — the property
    the distributed rewrite must never drift from."""
    from pyspark.sql import Window, functions as F
    for n in (1, 5, 16, 17, 100, 159, 1600):
        df = spark.range(n).select(F.col("id").alias("k"))
        w = Window.orderBy("k")
        want = {r.k: r.t for r in
                df.withColumn("t", F.ntile(16).over(w)).collect()}
        q, rem = n // 16, n % 16
        cut = rem * (q + 1)
        got = {}
        for idx in range(n):
            if idx < cut:
                got[idx] = idx // (q + 1) + 1
            else:
                got[idx] = rem + (idx - cut) // max(q, 1) + 1
        assert got == want, f"N={n}"


# --------------------------- bpe_apply vs unit-level Python reference

def _bpe_reference(text: str, merges: list) -> tuple:
    """Unit-level reference for bpe_apply's defined semantics: rules
    in order, each applied as ONE leftmost-greedy non-overlapping
    simultaneous pass over each word's unit sequence."""
    words = [w for w in text.lower().split() if w]
    n_units = sum(len(w) for w in words)
    n_sub = 0
    for w in words:
        units = list(w)
        for a, b in merges:
            out, i = [], 0
            while i < len(units):
                if (i + 1 < len(units)
                        and units[i] == a and units[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(units[i])
                    i += 1
            units = out
        n_sub += len(units)
    return n_units, n_sub


@given(st.lists(
    st.text(alphabet="abc ", min_size=0, max_size=24), min_size=1,
    max_size=8),
    st.lists(st.tuples(st.sampled_from(["a", "b", "c", "ab", "bc",
                                        "aa", "abc"]),
                       st.sampled_from(["a", "b", "c", "ab", "bc"])),
             min_size=1, max_size=6))
@settings(max_examples=25, deadline=None)
def test_bpe_apply_matches_unit_reference(spark, texts, merges):
    """bpe_apply's separator-wrapped string replaces == the
    unit-level leftmost-greedy reference, on adversarial tiny
    alphabets where suffix-matching and adjacent-merge bugs show."""
    from industrial_data_pipeline_spark.operators.text import bpe_apply
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: (r.n_units, r.n_subwords)
           for r in bpe_apply(docs, merges).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _bpe_reference(t, merges), (
            f"text={t!r} merges={merges}")


def test_bpe_apply_strips_literal_sep(spark):
    """A document containing a literal 0x1F (BPE_SEP) cannot forge
    unit boundaries or corrupt counts: the char is stripped from the
    input before symbol encoding (ADVICE r7)."""
    from industrial_data_pipeline_spark.operators.text import bpe_apply
    docs = spark.createDataFrame(
        [(0, "ta\x1fb cd"), (1, "tab cd")],
        "doc_id long, text string")
    rows = {r.doc_id: (r.n_units, r.n_subwords)
            for r in bpe_apply(
                docs, [("t", "a"), ("ta", "b")]).collect()}
    assert rows[0] == rows[1] == (5, 3)


# ------------------------ normalize_text vs Python reference

def _normalize_reference(t: str):
    import re
    s1 = re.sub("[​‌‍﻿]", "", t)
    s2 = re.sub("[ \t\n\r]", " ", s1)
    s3 = re.sub("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "", s2)
    s4 = re.sub(" {2,}", " ", s3)
    s5 = s4.strip(" ")
    return (len(t), len(t) - len(s1), len(s2) - len(s3),
            len(s3) - len(s4), len(s5), s5)


_DIRTY_ALPHABET = ("ab \t\n ​‍﻿\x07\x1f.!"
                   "  ")  # double space raises collapse frequency


@given(st.lists(st.text(alphabet=_DIRTY_ALPHABET, min_size=0,
                        max_size=40), min_size=1, max_size=8))
@settings(max_examples=25, deadline=None)
def test_normalize_text_matches_reference(spark, texts):
    """normalize_text == the Python re reference on adversarial
    strings mixing zero-width, control, exotic-whitespace and
    multi-space runs (trim in Spark strips spaces only after stage 2
    has already mapped every other whitespace to ' ', so strip(' ')
    is the faithful reference)."""
    import hashlib
    from industrial_data_pipeline_spark.operators.text import (
        normalize_text)
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    got = {r.doc_id: r for r in normalize_text(docs).collect()}
    for i, t in enumerate(texts):
        raw, zw, ctrl, coll, clean_len, clean = _normalize_reference(t)
        r = got[i]
        assert (r.raw_len, r.n_zero_width, r.n_ctrl, r.n_collapsed,
                r.clean_len) == (raw, zw, ctrl, coll, clean_len), t
        assert r.clean_md5 == hashlib.md5(clean.encode()).hexdigest()


@given(st.lists(st.lists(st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]),
    min_size=6, max_size=12), min_size=2, max_size=5),
    st.integers(min_value=0, max_value=10))
@settings(max_examples=15, deadline=None)
def test_incremental_lsh_no_false_negative_on_copy(spark, wordlists,
                                                   pick):
    """MinHash-LSH has NO false negatives for identical shingle
    sets: a batch document byte-equal to a corpus document shares
    every band bucket, so the gate must always report the pair at
    jaccard 1.0 — the property that makes it safe as an exact-dup
    admission gate too."""
    from industrial_data_pipeline_spark.operators.dedup import (
        incremental_minhash_lsh)
    texts = [" ".join(ws) for ws in wordlists]
    corpus = spark.createDataFrame(list(enumerate(texts)),
                                   "doc_id long, text string")
    target = pick % len(texts)
    batch = spark.createDataFrame([(1000, texts[target])],
                                  "doc_id long, text string")
    rows = incremental_minhash_lsh(corpus, batch, "doc_id",
                                   threshold=0.99).collect()
    assert any(r.new_id == 1000 and r.old_id == target
               and r.jaccard_sim == 1.0 for r in rows), texts


# ----------------- quality_classifier vs unit-level Python reference

def _classifier_reference(text: str) -> tuple:
    import hashlib
    import math

    from industrial_data_pipeline_spark.operators.text import (
        classifier_weights)
    w = classifier_weights(64)
    toks = [t for t in text.lower().split() if t]
    grams = list(toks)
    for i in range(len(toks) - 1):
        grams.append(" ".join(toks[i:i + 2]))
    if not grams:
        return 0, None, None
    s = sum(w[int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % 64]
            for g in grams)
    z = -0.1 + (s / len(grams)) / 1000.0
    score = round(1.0 / (1.0 + math.exp(-z)), 6)
    return len(grams), score, score >= 0.44


def test_quality_classifier_matches_reference(spark):
    """quality_classifier (q249): hashed-feature lookup, exact
    integer milli-weight sum, one sigmoid per doc — against an
    independent Python walk, including the empty-doc NULL contract
    and the 1-token contract: exactly ONE feature (its unigram), no
    phantom self-bigram (ADVICE r8 fix, mirrored in the oracles)."""
    from industrial_data_pipeline_spark.operators.text import (
        quality_classifier)
    texts = ["the quick brown fox", "a a a a a", "zzz",
             "  ", "one two", "Punctuation, and CASE!"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: (r.n_features, r.score, r.keep)
           for r in quality_classifier(docs).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _classifier_reference(t), f"text={t!r}"


def test_strip_html_hand_computed(spark):
    """strip_html (q250) by hand: script/style bodies vanish, tags
    become word boundaries, entities decode in order (&amp; last so
    freshly-decoded ampersands can't re-decode), whitespace
    collapses; a markup-free doc passes through with zero counts."""
    import hashlib

    from industrial_data_pipeline_spark.operators.text import (
        strip_html)
    docs = spark.createDataFrame(
        [(0, '<html><script>var x=1;</script><p>a&nbsp;b</p>'
             '<br>c &amp;amp; d</html>'),
         (1, "plain text only"),
         (2, '<script>has <b>markup</b>;</script>z')],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in strip_html(docs).collect()}
    # doc 0: script body fully dropped; '&amp;amp;' decodes ONCE to
    # the literal '&amp;', never twice (order: &amp; is last)
    assert rows[0].n_dropped_blocks == 1
    assert rows[0].n_tags == 5  # <html> <p> </p> <br> </html>
    clean0 = "a b c &amp; d"
    assert rows[0].n_entities == 2  # &nbsp; + one &amp;
    assert rows[0].clean_md5 == hashlib.md5(
        clean0.encode()).hexdigest(), clean0
    r1 = rows[1]
    assert (r1.n_dropped_blocks, r1.n_tags, r1.n_entities) == (0, 0, 0)
    assert r1.clean_md5 == hashlib.md5(b"plain text only").hexdigest()
    # doc 2: script body CONTAINS markup -> outside the regex tier's
    # documented [^<]* limit: not counted as a dropped block, falls
    # through to tag-stripping (body text survives)
    r2 = rows[2]
    assert r2.n_dropped_blocks == 0 and r2.n_tags == 4
    assert r2.clean_md5 == hashlib.md5(
        b"has markup ; z").hexdigest()


def test_rouge_n_clipped_counts_hand_computed(spark):
    """rouge_n (q251) by hand, on the repeated-token case where
    unclipped overlap overcounts: cand='a a a b', ref='a b b c' →
    ROUGE-1 overlap = min(3,1) + min(1,2) = 2 (naive set overlap
    would claim 2 too, but unclipped multiset would claim 4);
    p = 2/4, r = 2/4, f1 = 0.5. ROUGE-2: cand bigrams {a a ×2, a b},
    ref {a b, b b, b c} → overlap 1, p = 1/3, r = 1/3."""
    from industrial_data_pipeline_spark.operators.text import rouge_n
    pairs = spark.createDataFrame(
        [(0, "a a a b", "a b b c"),
         (1, "", "x y"),           # empty candidate: p NULL, r 0
         (2, "same text", "same text")],
        "doc_id long, candidate string, reference string")
    rows = {r.doc_id: r for r in rouge_n(pairs).collect()}
    r0 = rows[0]
    assert (r0.rouge1_p, r0.rouge1_r, r0.rouge1_f1) == (0.5, 0.5, 0.5)
    assert (r0.rouge2_p, r0.rouge2_r) == (round(1 / 3, 6),
                                          round(1 / 3, 6))
    r1 = rows[1]
    assert r1.rouge1_p is None and r1.rouge1_r == 0.0
    r2 = rows[2]
    assert (r2.rouge1_f1, r2.rouge2_f1) == (1.0, 1.0)


def _lcs_reference(a: list, b: list) -> int:
    """Classic O(m·n) table DP — independent of the numpy
    prefix-max formulation under test."""
    m, n = len(a), len(b)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m):
        for j in range(n):
            dp[i + 1][j + 1] = (dp[i][j] + 1 if a[i] == b[j]
                                else max(dp[i][j + 1], dp[i + 1][j]))
    return dp[m][n]


def test_rouge_l_hand_computed_and_vs_reference(spark):
    """rouge_l / lcs_token_len (q255): hand cases the planted oracle
    can't cover — repeats, swaps, case folding, empties — plus a
    pseudo-random sweep against an independent classic DP."""
    import random

    from industrial_data_pipeline_spark.operators.text import rouge_l

    cases = [
        (0, "a b a b a", "b a b a b", 4),    # repeated tokens
        (1, "x y", "y x", 1),                # order matters
        (2, "A b C", "a B c", 3),            # case-insensitive
        (3, "", "a b c", 0),                 # empty candidate
        (4, "a b c", "", 0),                 # empty reference
        (5, "p q r s", "p x q y r z s", 4),  # interleaved
    ]
    rng = random.Random(42)
    rand, base = [], ["t%d" % i for i in range(6)]
    for i in range(20):  # small vocab → dense repeat structure
        a = [rng.choice(base) for _ in range(rng.randint(0, 15))]
        b = [rng.choice(base) for _ in range(rng.randint(0, 15))]
        rand.append((100 + i, " ".join(a), " ".join(b),
                     _lcs_reference(a, b)))
    df = spark.createDataFrame(
        [(i, c, r) for i, c, r, _ in cases + rand],
        "doc_id long, candidate string, reference string")
    got = {r.doc_id: r for r in rouge_l(df).collect()}
    for i, c, ref, want in cases + rand:
        assert got[i].lcs_len == want, (c, ref)
    # metric contracts on the hand cases
    assert got[0].rougeL_p == round(4 / 5, 6)
    assert got[0].rougeL_r == round(4 / 5, 6)
    assert got[0].rougeL_f1 == round(4 / 5, 6)
    # only the 0/0 side is undefined: an empty candidate has NULL
    # precision but a perfectly defined recall of 0 (and vice versa)
    assert (got[3].rougeL_p is None and got[3].rougeL_r == 0.0
            and got[3].rougeL_f1 is None)
    assert (got[4].rougeL_p == 0.0 and got[4].rougeL_r is None
            and got[4].rougeL_f1 is None)
    assert got[1].rougeL_f1 == round(2 * .5 * .5 / 1.0, 6)


def test_rouge_l_tokenization_matches_jvm_split(spark):
    """Review r9: the LCS kernel must split EXACTLY like tokens()'s
    Java \\s+ — Python str.split() also breaks on NBSP/thin-space/
    0x1C-0x1F, which would let LCS exceed the JVM token counts and
    emit precision > 1. An NBSP-joined candidate is ONE token on both
    sides: lcs 0 against a space-split reference, precision 0."""
    from industrial_data_pipeline_spark.operators.text import rouge_l

    df = spark.createDataFrame(
        [(0, "foo\u00a0bar", "foo bar"),
         (1, "foo\x1fbar", "foo bar"),
         (2, "foo\u2009bar", "foo bar"),
         (3, "foo\tbar", "foo bar")],  # real Java \s: splits
        "doc_id long, candidate string, reference string")
    got = {r.doc_id: r for r in rouge_l(df).collect()}
    for i in (0, 1, 2):
        assert got[i].lcs_len == 0 and got[i].rougeL_p == 0.0, i
    assert got[3].lcs_len == 2 and got[3].rougeL_p == 1.0


def test_bleu_hand_computed(spark):
    """bleu (q258) hand cases: identity = 1.0; the Papineni clipping
    example ('the the the the' vs 'the cat' -> p1 clipped to 1/4,
    p2 = 0 -> BLEU 0); a contiguous prefix candidate exercising the
    brevity penalty; candidates too short for 4-grams (BLEU 0 by the
    unsmoothed convention); empty candidate (all NULL)."""
    import math

    from industrial_data_pipeline_spark.operators.text import bleu

    ref = "a b c d e f g h"
    cases = [
        (0, ref, ref),
        (1, "the the the the", "the cat"),
        (2, "a b c d", ref),          # prefix: p_n = 1, bp penalizes
        (3, "a b c", ref),            # no 4-grams -> bleu 0
        (4, "", ref),                 # empty candidate -> NULLs
    ]
    df = spark.createDataFrame(
        cases, "doc_id long, candidate string, reference string")
    got = {r.doc_id: r for r in bleu(df).collect()}
    assert (got[0].p1, got[0].p4, got[0].bp, got[0].bleu) == \
        (1.0, 1.0, 1.0, 1.0)
    assert got[1].p1 == 0.25 and got[1].p2 == 0.0
    assert got[1].bleu == 0.0
    # prefix: all precisions 1, bp = exp(1 - 8/4)
    want_bp = round(math.exp(1.0 - 8.0 / 4.0), 6)
    assert (got[2].p1, got[2].p4) == (1.0, 1.0)
    assert got[2].bp == want_bp and got[2].bleu == want_bp
    assert got[3].p3 == 1.0 and got[3].p4 is None
    assert got[3].bleu == 0.0
    assert got[4].p1 is None and got[4].bp is None \
        and got[4].bleu is None


@given(st.integers(min_value=1, max_value=4095),
       st.integers(min_value=1, max_value=4095),
       st.integers(min_value=0, max_value=10_000_000),
       st.integers(min_value=0, max_value=1_000_000))
@settings(max_examples=40, deadline=None)
def test_mp4_header_probe_property(w, h, dur, nf):
    """probe_video (q261) round-trips mp4_encode_header for any dims/
    duration/frame count, and truncation anywhere returns None or a
    partial-but-consistent probe — never raises (dirty-media-lake
    contract, the probe_image discipline)."""
    payload = MM.mp4_encode_header(w, h, dur, n_frames=nf)
    assert MM.probe_video(payload) == ("mp4", w, h, dur, nf)
    for cut in (3, 11, len(payload) // 3, len(payload) - 1):
        got = MM.probe_video(payload[:cut])
        assert got is None or got[0] == "mp4"


def test_probe_video_rejects_garbage_and_hostile_sizes():
    assert MM.probe_video(None) is None
    assert MM.probe_video(b"") is None
    assert MM.probe_video(b"not a video") is None
    # hostile box size (overruns the buffer) terminates cleanly
    evil = (b"\x00\x00\x00\x14ftypisom\x00\x00\x02\x00isom"
            b"\xff\xff\xff\xffmoov")
    assert MM.probe_video(evil) in (None, ("mp4", 0, 0, 0, 0))


def test_chrf_hand_computed(spark):
    """chrf (q262) by hand: the 'ab' vs 'abc' case worked out on
    paper (P = 1/3, R = 7/36, chrF2 = 7/33), whitespace invariance
    ('a b' == 'ab'), identity on short strings (orders beyond the
    text length contribute 0 to BOTH means), and the empty-side NULL
    contract."""
    from fractions import Fraction as Fr

    from industrial_data_pipeline_spark.operators.text import chrf

    cases = [(0, "ab", "abc"), (1, "a b", "ab"),
             (2, "ab", "ab"), (3, "", "abc")]
    df = spark.createDataFrame(
        cases, "doc_id long, candidate string, reference string")
    got = {r.doc_id: r for r in chrf(df).collect()}
    p = Fr(1, 3)
    r = Fr(7, 36)
    f = (Fr(5) * p * r) / (Fr(4) * p + r)
    assert got[0].chrf_p == round(float(p), 6)
    assert got[0].chrf_r == round(float(r), 6)
    assert got[0].chrf == round(float(f), 6)  # 7/33
    # whitespace stripped: 'a b' scores exactly like 'ab'
    assert (got[1].chrf_p, got[1].chrf_r, got[1].chrf) == \
        (got[2].chrf_p, got[2].chrf_r, got[2].chrf)
    # identity of a 2-char string: orders 1-2 perfect, 3-6 zero
    assert got[2].chrf_p == round(float(Fr(1, 3)), 6)
    assert got[2].chrf == round(float(Fr(1, 3)), 6)
    assert got[3].chrf_p is None and got[3].chrf is None


# ------------- BLEU / chrF vs unit-level Python reference, BOTH
# ------------- engines (VERDICT r9 item 5: denominator hardening)

def _eval_tokens(s: str) -> list:
    import re

    from industrial_data_pipeline_spark.operators.text import CHRF_WS
    return [w for w in re.split(CHRF_WS, s.lower()) if w]


def _bleu_reference(cand: str, ref: str) -> tuple:
    """Unit-level reference for bleu's defined semantics: clipped
    modified precisions p1..p4 (None when the candidate has no
    n-grams of that order), BP = min(1, e^(1-r/c)), unsmoothed BLEU
    (0.0 if any p_n is dead), all None for an empty candidate."""
    import math
    from collections import Counter

    ct, rt = _eval_tokens(cand), _eval_tokens(ref)
    c, r = len(ct), len(rt)
    if c == 0:
        return (None,) * 6

    def grams(toks, n):
        return [" ".join(toks[i:i + n])
                for i in range(len(toks) - n + 1)]

    ps = []
    for n in range(1, 5):
        cg, rg = Counter(grams(ct, n)), Counter(grams(rt, n))
        tc = sum(cg.values())
        ov = sum(min(k, rg[g]) for g, k in cg.items())
        ps.append(ov / float(tc) if tc > 0 else None)
    bp = 1.0 if c >= r else math.exp(1.0 - r / float(c))
    if any(p is None or p == 0.0 for p in ps):
        bleu = 0.0
    else:
        bleu = bp * math.exp(sum(math.log(p) for p in ps) / 4.0)
    return (*ps, bp, bleu)


def _chrf_reference(cand: str, ref: str) -> tuple:
    """Unit-level reference for chrf's defined semantics: per-order
    clipped char-n-gram P/R with the zero-order-contributes-0
    convention (denominator stays 6), β=2 F-score coalesced to 0 on
    a 0/0, NULL metrics when either stripped side is empty."""
    import re
    from collections import Counter

    from industrial_data_pipeline_spark.operators.text import CHRF_WS
    strip = lambda s: re.sub(CHRF_WS, "", s.lower())
    cc, rc = strip(cand), strip(ref)
    if not cc or not rc:
        return (None, None, None)
    psum = rsum = 0.0
    for n in range(1, 7):
        cg = Counter(cc[i:i + n] for i in range(len(cc) - n + 1))
        rg = Counter(rc[i:i + n] for i in range(len(rc) - n + 1))
        ov = sum(min(k, rg[g]) for g, k in cg.items())
        tc, tr = sum(cg.values()), sum(rg.values())
        psum = psum + (ov / float(tc) if tc > 0 else 0.0)
        rsum = rsum + (ov / float(tr) if tr > 0 else 0.0)
    p, r = psum / 6.0, rsum / 6.0
    denom = 4.0 * p + r
    f = (5.0 * p * r / denom) if denom != 0.0 else 0.0
    return (p, r, f)


_EVAL_EDGE_PAIRS = [
    ("", ""), ("", "a"), ("a", ""),            # empty sides
    ("a", "a"), ("a", "b"),                    # 1-char
    (" \t\x0b\f\r\n", "ab"), ("ab", " \x0b "),  # whitespace-only
    ("a b", "a b c d e"),                      # no 4-grams
    ("ab ab ab", "ab"),                        # clipping
    ("a\x0bb", "a b"),                         # pinned \x0B strip
]


def _run_eval_engines(spark, pairs, spark_fn, duck_sql, cols):
    """Run (doc_id, candidate, reference) rows through the Spark
    kernel AND the DuckDB replay chain; returns two dicts keyed by
    doc_id with the metric tuples, for comparison against the
    Python reference. Spark↔DuckDB must agree BYTE-exactly; the
    reference comparison uses a tight tolerance (it does not
    replicate HALF_UP rounding)."""
    import duckdb
    import pandas as pd

    df = spark.createDataFrame(
        pairs, "doc_id long, candidate string, reference string")
    got_s = {r["doc_id"]: tuple(r[c] for c in cols)
             for r in spark_fn(df).collect()}
    con = duckdb.connect()
    con.register("eval_pairs", pd.DataFrame(
        pairs, columns=["doc_id", "candidate", "reference"]))
    got_d = {int(r[0]): tuple(r[1:]) for r in
             con.execute(duck_sql).fetchall()}
    con.close()
    return got_s, got_d


def _assert_eval_close(got, want, ctx):
    assert len(got) == len(want)
    for g, w in zip(got, want):
        if w is None or g is None:
            assert g is None and w is None, (ctx, got, want)
        else:
            # engines round HALF_UP to 6 dp, the reference doesn't:
            # half a unit in the 6th decimal is the exact bound
            assert abs(g - w) <= 5.0000001e-7, (ctx, got, want)


def _duck_bleu_sql() -> str:
    from industrial_data_pipeline_spark.suite_pipeline import (
        bleu_chain_sql)
    ltoks = ("list_filter(string_split_regex(lower({c}),"
             " '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')")
    return bleu_chain_sql(f"""
pairs AS (SELECT doc_id, {ltoks.format(c='candidate')} AS ct,
                 {ltoks.format(c='reference')} AS rt FROM eval_pairs)""")


def _duck_chrf_sql() -> str:
    from industrial_data_pipeline_spark.suite_pipeline import (
        CHRF_WS, chrf_chain_sql)
    return chrf_chain_sql(f"""
base AS (SELECT doc_id,
                regexp_replace(lower(candidate), '{CHRF_WS}', '',
                               'g') AS cc,
                regexp_replace(lower(reference), '{CHRF_WS}', '',
                               'g') AS rc
         FROM eval_pairs)""")


def test_bleu_edge_cases_both_engines(spark):
    """Empty / 1-char / whitespace-only / no-higher-gram candidates:
    Spark == DuckDB byte-exactly and both == the Python reference —
    the brevity-penalty and dead-precision conventions hold on every
    edge in BOTH engines."""
    from industrial_data_pipeline_spark.operators.text import bleu

    pairs = [(i, c, r) for i, (c, r) in enumerate(_EVAL_EDGE_PAIRS)]
    cols = ["p1", "p2", "p3", "p4", "bp", "bleu"]
    got_s, got_d = _run_eval_engines(spark, pairs, bleu,
                                     _duck_bleu_sql(), cols)
    for i, (c, r) in enumerate(_EVAL_EDGE_PAIRS):
        assert got_s[i] == got_d[i], (c, r, got_s[i], got_d[i])
        _assert_eval_close(got_s[i], _bleu_reference(c, r), (c, r))


def test_chrf_edge_cases_both_engines(spark):
    """chrF's zero-order and empty-side conventions — including the
    pinned [ \\t\\n\\x0B\\f\\r] strip class on a \\x0B document —
    hold byte-exactly across engines and match the reference."""
    from industrial_data_pipeline_spark.operators.text import chrf

    pairs = [(i, c, r) for i, (c, r) in enumerate(_EVAL_EDGE_PAIRS)]
    cols = ["chrf_p", "chrf_r", "chrf"]
    got_s, got_d = _run_eval_engines(spark, pairs, chrf,
                                     _duck_chrf_sql(), cols)
    for i, (c, r) in enumerate(_EVAL_EDGE_PAIRS):
        assert got_s[i] == got_d[i], (c, r, got_s[i], got_d[i])
        _assert_eval_close(got_s[i], _chrf_reference(c, r), (c, r))


@given(st.lists(st.tuples(
    st.text(alphabet="ab \t\n\x0b\f\r", max_size=14),
    st.text(alphabet="ab \t\n\x0b\f\r", max_size=14)),
    min_size=1, max_size=5))
@settings(max_examples=15, deadline=None)
def test_chrf_property_matches_reference_both_engines(spark, texts):
    """Property form over a tiny adversarial alphabet (two letters +
    every pinned whitespace char): Spark == DuckDB byte-exactly and
    both match the Python reference."""
    from industrial_data_pipeline_spark.operators.text import chrf

    pairs = [(i, c, r) for i, (c, r) in enumerate(texts)]
    cols = ["chrf_p", "chrf_r", "chrf"]
    got_s, got_d = _run_eval_engines(spark, pairs, chrf,
                                     _duck_chrf_sql(), cols)
    for i, (c, r) in enumerate(texts):
        assert got_s[i] == got_d[i], (c, r, got_s[i], got_d[i])
        _assert_eval_close(got_s[i], _chrf_reference(c, r), (c, r))


@given(st.lists(st.tuples(
    st.text(alphabet="ab \t\n", max_size=20),
    st.text(alphabet="ab \t\n", max_size=20)),
    min_size=1, max_size=5))
@settings(max_examples=15, deadline=None)
def test_bleu_property_matches_reference_both_engines(spark, texts):
    """Property form for BLEU (alphabet excludes \\x0B: the shared
    TOKENIZER intentionally uses each engine's \\s — the pinned
    class is chrf's strip; see ADVICE r9)."""
    from industrial_data_pipeline_spark.operators.text import bleu

    pairs = [(i, c, r) for i, (c, r) in enumerate(texts)]
    cols = ["p1", "p2", "p3", "p4", "bp", "bleu"]
    got_s, got_d = _run_eval_engines(spark, pairs, bleu,
                                     _duck_bleu_sql(), cols)
    for i, (c, r) in enumerate(texts):
        assert got_s[i] == got_d[i], (c, r, got_s[i], got_d[i])
        _assert_eval_close(got_s[i], _bleu_reference(c, r), (c, r))


@given(st.integers(min_value=1, max_value=10**12),
       st.integers(min_value=1, max_value=10**12))
@settings(max_examples=200, deadline=None)
def test_temperature_mix_copy_arithmetic_cross_engine(n, extra):
    """q268's engine-pinned arithmetic claim, tested directly: the
    copy-count chain sqrt(mx/n) → floor → (frac·1e6) → floor is
    composed ONLY of IEEE-754 correctly-rounded operations, so
    DuckDB (C libm) and Python (same libm as the JVM's
    StrictMath-free sqrt — all correctly rounded by the standard)
    produce bit-identical (base, frac_scaled) pairs for ANY domain
    counts up to 1e12. This is the q268 oracle's half of the
    bit-identity; the Spark half is pinned by the byte-exact oracle
    match itself."""
    import math

    import duckdb

    mx = n + extra  # mx >= n, as groupBy-max guarantees
    cop = math.sqrt(float(mx) / float(n))
    py = (math.floor(cop), math.floor((cop - math.floor(cop)) * 1e6))
    got = duckdb.connect().execute(
        "SELECT CAST(floor(cop) AS BIGINT),"
        "       CAST(floor((cop - floor(cop)) * 1000000) AS BIGINT)"
        " FROM (SELECT sqrt(CAST(? AS DOUBLE) / CAST(? AS DOUBLE))"
        "       AS cop)", [mx, n]).fetchone()
    assert tuple(got) == py, (mx, n, got, py)


@given(st.lists(st.floats(min_value=-100.0, max_value=100.0,
                          allow_nan=False), min_size=1, max_size=16),
       st.lists(st.floats(min_value=-100.0, max_value=100.0,
                          allow_nan=False), min_size=1, max_size=16))
@settings(max_examples=150, deadline=None)
def test_pq_scaled_int_arithmetic_cross_engine(a, b):
    """q270/q271/q273's engine-pinned arithmetic, tested directly:
    the quantize → squared-distance / dot chain is floor(x·1e6+0.5)
    (one correctly-rounded multiply + add, exact floor) followed by
    pure int64 math — Python (driver LUTs), DuckDB (oracles) and
    the JVM (in-plan expressions, pinned transitively by the
    byte-exact q270/q271/q273 oracle matches) must agree on every
    input. Lengths are truncated to the shorter list the way
    list_zip/zip_with align."""
    import math

    import duckdb

    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    qa = [math.floor(x * 1_000_000 + 0.5) for x in a]
    qb = [math.floor(x * 1_000_000 + 0.5) for x in b]
    py_d2 = sum((x - y) * (x - y) for x, y in zip(qa, qb))
    py_dot = sum(x * y for x, y in zip(qa, qb))
    got = duckdb.connect().execute(
        "SELECT list_aggregate(list_transform(list_zip(qa, qb),"
        "         p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'),"
        "       list_aggregate(list_transform(list_zip(qa, qb),"
        "         p -> p[1]*p[2]), 'sum')"
        " FROM (SELECT list_transform(?::DOUBLE[],"
        "         x -> CAST(floor(x*1000000 + 0.5) AS BIGINT)) AS qa,"
        "       list_transform(?::DOUBLE[],"
        "         x -> CAST(floor(x*1000000 + 0.5) AS BIGINT)) AS qb)",
        [a, b]).fetchone()
    assert (int(got[0]), int(got[1])) == (py_d2, py_dot), (a, b)


def _lev_classic(a: list, b: list) -> int:
    """Textbook full-matrix Levenshtein — the independent reference
    the vectorized prefix-min kernel is pinned against."""
    m, n = len(a), len(b)
    d = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        d[i][0] = i
    for j in range(n + 1):
        d[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
    return d[m][n]


@given(st.lists(st.sampled_from("abcde"), max_size=12),
       st.lists(st.sampled_from("abcde"), max_size=12))
@settings(max_examples=300, deadline=None)
def test_token_edit_distance_matches_classic_dp(ca, cb):
    """The q274 kernel's vectorized prefix-min DP equals the
    textbook full-matrix Levenshtein on arbitrary token sequences
    over a tiny alphabet (maximizing repeats, transpositions and
    shift traps — the cases where a subsequence/hamming shortcut
    would diverge). Tests the EXACT function the Arrow kernel calls
    per pair (module-level, not a replica that could drift)."""
    from industrial_data_pipeline_spark.operators.text import (
        levenshtein_token_pair)

    got = levenshtein_token_pair(" ".join(ca), " ".join(cb))
    assert got == _lev_classic(ca, cb), (ca, cb, got)


def test_corpus_bleu_hand_computed(spark):
    """corpus_bleu (q278) hand cases pinning its three defining
    behaviors against sentence bleu:

    1. multi-reference CLIP: a candidate matching its SECOND
       reference perfectly scores p_n = 1 (single-ref clipping
       against ref 1 would not);
    2. corpus POOLING: one all-miss candidate dilutes the pooled
       precisions instead of zeroing everything (mean-of-sentence
       -BLEU would average in a hard 0 the same way; the pooled p1
       here is computable by hand as Σov/Σtc);
    3. effective length: the CLOSEST |ref| to |cand| feeds r, ties
       to the SHORTER."""
    import math

    from industrial_data_pipeline_spark.operators.text import (
        corpus_bleu)

    # doc 0: cand == ref B (4 tokens); refs A (6), B (4)
    # doc 1: all-miss cand (4 tokens); refs (4), (4)
    df = spark.createDataFrame(
        [(0, "w x y z", ["a b c d e f", "w x y z"]),
         (1, "q1 q2 q3 q4", ["a b c d", "e f g h"])],
        "doc_id long, candidate string, references array<string>")
    row = corpus_bleu(df).collect()[0]
    assert row.n_pairs == 2
    # pooled p1 = (4 + 0) / (4 + 4); p4 = (1 + 0) / (1 + 1)
    assert row.p1 == 0.5 and row.p4 == 0.5
    # doc 0: |cand|=4, closest ref len = 4; doc 1: both refs len 4
    assert row.c_len == 8 and row.r_len == 8 and row.bp == 1.0
    # bleu = bp * exp(mean ln p_n); p2 = 3/6, p3 = 2/4
    assert row.bleu == round(math.exp(sum(math.log(0.5)
                                          for _ in range(4)) / 4), 6)

    # tie-to-shorter: |cand|=2, refs len 1 and 3 (both |Δ|=1) -> r=1
    df2 = spark.createDataFrame(
        [(0, "a b", ["a", "a b c"])],
        "doc_id long, candidate string, references array<string>")
    r2 = corpus_bleu(df2).collect()[0]
    assert r2.r_len == 1 and r2.bp == 1.0
    # dead higher-n grams (no 4-gram possible) -> bleu 0, p1 intact
    assert r2.bleu == 0.0 and r2.p1 == 1.0

    # empty candidate corpus -> NULL metrics
    df3 = spark.createDataFrame(
        [(0, "   ", ["a b"])],
        "doc_id long, candidate string, references array<string>")
    r3 = corpus_bleu(df3).collect()[0]
    assert r3.c_len == 0 and r3.bleu is None and r3.p1 is None


def test_corpus_bleu_unscoreable_pairs_excluded(spark):
    """Review r11: a pair with an empty (or all-NULL) references
    array is excluded from EVERYTHING — n_pairs, lengths, and the
    pooled gram totals — not just from the length sums (the old
    inner clen-join silently kept its candidate grams in tc_n,
    deflating the pooled precisions its references could never
    credit)."""
    from industrial_data_pipeline_spark.operators.text import (
        corpus_bleu)

    df = spark.createDataFrame(
        [(0, "w x y z", ["a b c d e f", "w x y z"]),
         (1, "q1 q2 q3 q4", [])],
        "doc_id long, candidate string, references array<string>")
    row = corpus_bleu(df).collect()[0]
    # identical to scoring doc 0 alone: perfect multi-ref match
    assert row.n_pairs == 1 and row.c_len == 4 and row.r_len == 4
    assert row.p1 == 1.0 and row.p4 == 1.0 and row.bleu == 1.0

    df2 = spark.createDataFrame(
        [(0, "w x", [None, "w x"])],
        "doc_id long, candidate string, references array<string>")
    r2 = corpus_bleu(df2).collect()[0]
    # NULL entries drop; the remaining real reference scores
    assert r2.n_pairs == 1 and r2.p1 == 1.0 and r2.r_len == 2

    # EVERY pair unscoreable: the pooled sums coalesce to 0 so the
    # empty-corpus (_C == 0) guard fires — NULL metrics, zero
    # lengths, NOT the any_dead bleu = 0.0 branch (ADVICE r11: sum
    # over zero rows is NULL, which used to skip the guard)
    df3 = spark.createDataFrame(
        [(0, "w x", []), (1, "y z", [None])],
        "doc_id long, candidate string, references array<string>")
    r3 = corpus_bleu(df3).collect()[0]
    assert r3.n_pairs == 0 and r3.c_len == 0 and r3.r_len == 0
    assert r3.bleu is None and r3.p1 is None and r3.bp is None


def test_corpus_bleu_matches_python_reference(spark):
    """corpus_bleu vs an INDEPENDENT straightforward Python
    implementation over deterministic pseudo-random small corpora
    (tiny alphabet -> heavy n-gram collisions, empty/short
    candidates, multi-reference clipping and length ties all
    exercised). The reference is written from the Papineni
    definitions, not from the operator's code — a shared bug would
    have to be independently re-invented to pass."""
    import math
    import random
    from collections import Counter

    from industrial_data_pipeline_spark.operators.text import (
        corpus_bleu)

    rng = random.Random(278)
    alphabet = ["a", "b", "c"]

    def sentence():
        return " ".join(rng.choice(alphabet)
                        for _ in range(rng.randint(0, 8)))

    def ref_bleu(pairs):
        def grams(toks, n):
            return Counter(tuple(toks[i:i + n])
                           for i in range(len(toks) - n + 1))
        usable = []
        for _id, cand, refs in pairs:
            refs = [r for r in refs if r is not None]
            if refs:
                usable.append((cand.lower().split(),
                               [r.lower().split() for r in refs]))
        if not usable:
            return None
        C = sum(len(c) for c, _ in usable)
        R = 0
        for c, refs in usable:
            R += min(((abs(len(r) - len(c)), len(r))
                      for r in refs))[1]
        ps = []
        for n in range(1, 5):
            ov = tc = 0
            for c, refs in usable:
                cg = grams(c, n)
                tc += sum(cg.values())
                mx = Counter()
                for r in refs:
                    rg = grams(r, n)
                    for g, k in rg.items():
                        mx[g] = max(mx[g], k)
                ov += sum(min(k, mx[g]) for g, k in cg.items())
            ps.append(ov / tc if tc else None)
        if C == 0:
            return dict(n_pairs=len(usable), c=C, R=R,
                        ps=[None] * 4, bp=None, bleu=None)
        bp = 1.0 if C >= R else math.exp(1.0 - R / C)
        if any(p is None or p == 0.0 for p in ps):
            bleu = 0.0
        else:
            bleu = bp * math.exp(sum(math.log(p) for p in ps) / 4)
        return dict(n_pairs=len(usable), c=C, R=R, ps=ps, bp=bp,
                    bleu=bleu)

    for trial in range(6):
        pairs = []
        for i in range(rng.randint(2, 8)):
            nrefs = rng.randint(0, 3)
            refs = [sentence() for _ in range(nrefs)]
            if nrefs and rng.random() < 0.3:
                refs[0] = None
            pairs.append((i, sentence(), refs))
        want = ref_bleu(pairs)
        df = spark.createDataFrame(
            pairs,
            "doc_id long, candidate string, references array<string>")
        got_rows = corpus_bleu(df).collect()
        if want is None:
            # no scoreable pairs at all: one row with n_pairs 0,
            # ZERO lengths (coalesced pooled sums — ADVICE r11) and
            # NULL metrics, matching the oracle's coalesce chain
            assert got_rows[0].n_pairs == 0
            assert got_rows[0].c_len == 0 and got_rows[0].r_len == 0
            assert got_rows[0].bleu is None
            assert got_rows[0].p1 is None and got_rows[0].bp is None
            continue
        got = got_rows[0]
        assert got.n_pairs == want["n_pairs"], (trial, pairs)
        assert got.c_len == want["c"] and got.r_len == want["R"]
        for n, p in enumerate(want["ps"], 1):
            gp = getattr(got, f"p{n}")
            if p is None or want["c"] == 0:
                pass  # operator NULLs p_n only when c == 0
            else:
                assert gp == round(p, 6), (trial, n, gp, p)
        if want["c"] == 0:
            assert got.bleu is None
        else:
            assert got.bp == round(want["bp"], 6)
            assert got.bleu == round(want["bleu"], 6), (trial, pairs)


def test_corpus_chrf_hand_computed(spark):
    """corpus_chrf (q287) hand cases pinning its defining behaviors:
    multi-reference MAX-CLIP (a candidate matching its second
    reference keeps full credit), corpus POOLING (one all-miss pair
    dilutes instead of zeroing), the unscoreable-pair exclusion, and
    the coalesced empty-corpus guard (NULL metrics, zero chars)."""
    from industrial_data_pipeline_spark.operators.text import (
        corpus_chrf)

    # doc 0 matches ref B exactly; doc 1 all-miss single-char corpus
    df = spark.createDataFrame(
        [(0, "ab", ["xyxy", "ab"]),
         (1, "q", ["z", "z"])],
        "doc_id long, candidate string, references array<string>")
    row = corpus_chrf(df, max_n=2).collect()[0]
    assert row.n_pairs == 2 and row.c_chars == 3
    # order-1: cand grams a,b,q; max-multiset doc0 = {x:2,y:2,a,b},
    # doc1 = {z:1}; ov1 = 2 (a, b). pooled p1 = 2/3
    # order-2: cand grams 'ab' (doc1 has none); ov2 = 1; tc2 = 1
    # chrf_p = (2/3 + 1/1) / 2
    assert row.chrf_p == round((2 / 3 + 1.0) / 2, 6)

    # unscoreable pairs excluded from every pooled quantity
    df2 = spark.createDataFrame(
        [(0, "ab", ["ab"]), (1, "zzzz", []), (2, "yy", [None])],
        "doc_id long, candidate string, references array<string>")
    r2 = corpus_chrf(df2, max_n=2).collect()[0]
    assert r2.n_pairs == 1 and r2.c_chars == 2 and r2.chrf == 1.0

    # ALL pairs unscoreable: coalesced sums -> the empty guard fires
    df3 = spark.createDataFrame(
        [(0, "ab", []), (1, "cd", [None])],
        "doc_id long, candidate string, references array<string>")
    r3 = corpus_chrf(df3).collect()[0]
    assert r3.n_pairs == 0 and r3.c_chars == 0 and r3.r_chars == 0
    assert r3.chrf is None and r3.chrf_p is None and r3.chrf_r is None


def _r6(x: float) -> float:
    """Round-HALF-UP to 6 dp — what Spark's F.round and DuckDB's
    round() both do; Python's round() is banker's (half-even) and
    diverges exactly on decimal ties like 0.1953125."""
    import math
    return math.floor(x * 1_000_000 + 0.5) / 1_000_000


def test_corpus_chrf_matches_python_reference(spark):
    """corpus_chrf vs an INDEPENDENT Python implementation written
    from the documented semantics (max-clip across references,
    max-multiset recall denominator, pooled per-order ratios with
    the zero convention, β=2 F-score) over deterministic
    pseudo-random tiny-alphabet corpora — heavy gram collisions,
    empty candidates/references, 0-3 references per pair."""
    import random
    import re
    from collections import Counter

    from industrial_data_pipeline_spark.operators.text import (
        corpus_chrf)

    ws = re.compile("[ \t\n\x0B\f\r]+")
    rng = random.Random(287)
    alphabet = "aab"

    def sentence():
        return " ".join("".join(rng.choice(alphabet)
                                for _ in range(rng.randint(1, 3)))
                        for _ in range(rng.randint(0, 5)))

    def ref_chrf(pairs, max_n=6):
        def strip(s):
            return ws.sub("", s.lower())

        def grams(s, n):
            return Counter(s[i:i + n]
                           for i in range(len(s) - n + 1))

        usable = []
        for _id, cand, refs in pairs:
            refs = [r for r in refs if r is not None]
            if refs:
                usable.append((strip(cand),
                               [strip(r) for r in refs]))
        if not usable:
            return None
        ov = [0] * (max_n + 1)
        tc = [0] * (max_n + 1)
        tr = [0] * (max_n + 1)
        for cc, rcs in usable:
            for n in range(1, max_n + 1):
                cg = grams(cc, n)
                tc[n] += sum(cg.values())
                mx = Counter()
                for rc in rcs:
                    for g, k in grams(rc, n).items():
                        mx[g] = max(mx[g], k)
                tr[n] += sum(mx.values())
                ov[n] += sum(min(k, mx[g])
                             for g, k in cg.items())
        p = r_ = 0.0
        for n in range(1, max_n + 1):
            p = p + (ov[n] / tc[n] if tc[n] else 0.0)
            r_ = r_ + (ov[n] / tr[n] if tr[n] else 0.0)
        p, r_ = p / float(max_n), r_ / float(max_n)
        den = 4.0 * p + r_
        f = (5.0 * p * r_) / den if den != 0.0 else 0.0
        return dict(n=len(usable), c=tc[1], r=tr[1],
                    p=p, rr=r_, f=f)

    for trial in range(6):
        pairs = []
        for i in range(rng.randint(2, 8)):
            nrefs = rng.randint(0, 3)
            refs = [sentence() for _ in range(nrefs)]
            if nrefs and rng.random() < 0.3:
                refs[0] = None
            pairs.append((i, sentence(), refs))
        want = ref_chrf(pairs)
        got = corpus_chrf(spark.createDataFrame(
            pairs,
            "doc_id long, candidate string,"
            " references array<string>")).collect()[0]
        if want is None:
            assert got.n_pairs == 0 and got.chrf is None
            continue
        assert got.n_pairs == want["n"], (trial, pairs)
        assert got.c_chars == want["c"] and got.r_chars == want["r"]
        assert got.chrf_p == _r6(want["p"]), (trial, pairs)
        assert got.chrf_r == _r6(want["rr"]), (trial, pairs)
        assert got.chrf == _r6(want["f"]), (trial, pairs)


def test_corpus_ter_hand_and_python_reference(spark):
    """corpus_ter (q288): hand cases for best-reference selection
    (min edits, ties to the SHORTER reference), pooling (one ratio
    over summed ints, not a mean of rates), exclusion and the empty
    guard; then randomized corpora against an independent
    best-reference pooling built on the classic full-matrix DP."""
    import random
    import re

    from industrial_data_pipeline_spark.operators.text import (
        corpus_ter)

    ws = re.compile("[ \t\n\x0B\f\r]+")

    def toks(s):
        return [t for t in ws.split(s.lower().strip()) if t]

    # doc 0: best ref is the SECOND (0 edits); doc 1: both refs at
    # 1 edit -> tie to the shorter (rl 2, not 4)
    df = spark.createDataFrame(
        [(0, "a b c", ["x y", "a b c"]),
         (1, "p q", ["p q r s", "p z"])],
        "doc_id long, candidate string, references array<string>")
    row = corpus_ter(df).collect()[0]
    assert (row.n_pairs, row.edits, row.ref_len) == (2, 1, 5)
    assert row.ter == round(1 / 5, 6)

    # exclusion + empty guard
    e = corpus_ter(spark.createDataFrame(
        [(0, "a", []), (1, "b", [None])],
        "doc_id long, candidate string, references array<string>"))
    r0 = e.collect()[0]
    assert (r0.n_pairs, r0.edits, r0.ref_len) == (0, 0, 0)
    assert r0.ter is None

    rng = random.Random(288)
    alphabet = ["a", "b", "c"]

    def sentence():
        return " ".join(rng.choice(alphabet)
                        for _ in range(rng.randint(0, 6)))

    def ref_ter(pairs):
        E = R = n = 0
        for _id, cand, refs in pairs:
            refs = [r for r in refs if r is not None]
            if not refs:
                continue
            n += 1
            best = min((_lev_classic(toks(cand), toks(r)),
                        len(toks(r))) for r in refs)
            E, R = E + best[0], R + best[1]
        if n == 0:
            return None
        return dict(n=n, e=E, r=R,
                    t=(E / float(R) if R else None))

    for trial in range(6):
        pairs = []
        for i in range(rng.randint(2, 8)):
            nrefs = rng.randint(0, 3)
            refs = [sentence() for _ in range(nrefs)]
            if nrefs and rng.random() < 0.3:
                refs[0] = None
            pairs.append((i, sentence(), refs))
        want = ref_ter(pairs)
        got = corpus_ter(spark.createDataFrame(
            pairs,
            "doc_id long, candidate string,"
            " references array<string>")).collect()[0]
        if want is None:
            assert got.n_pairs == 0 and got.ter is None
            continue
        assert (got.n_pairs, got.edits, got.ref_len) == \
            (want["n"], want["e"], want["r"]), (trial, pairs)
        if want["t"] is None:
            assert got.ter is None
        else:
            assert got.ter == _r6(want["t"]), (trial, pairs)
