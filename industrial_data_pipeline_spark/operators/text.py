"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All pure ``pyspark.sql.functions`` expressions — JVM-side, whole-stage
codegen, no Python in the row path — so they hold up on a 100 TB
documents table. Every operator has an exact ANSI-SQL twin runnable in
DuckDB (used by the correctness oracle), built on one portable
primitive:

    hash64(s) = int64(first 15 hex digits of md5(s))

which evaluates identically in Spark (`conv(substr(md5(x),1,15),16,10)`),
DuckDB (`('0x' || substr(md5(x),1,15))::BIGINT`), and Python
(`int(hashlib.md5(x).hexdigest()[:15], 16)`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ------------------------------------------------------------ primitives


def hash64(col: Column | str) -> Column:
    """Portable 60-bit hash (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization. Empty/whitespace-only text yields an
    EMPTY array — a bare split() returns [''] there, and that one
    phantom token would count as a word, bill a packing token, and
    emit a chunk for every empty document."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(F.trim(c), r"\s+"), "")


#: BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# module-level (ADVICE r10): levenshtein_token_pair runs once per row
# pair inside its pandas-UDF loop, so per-call `import re` +
# re.compile was avoidable per-row overhead. One shared compiled copy
# of EXACTLY tokens()'s split class — Java \s, i.e. ASCII
# [ \t\n\x0b\f\r], NOT Python str.split(), whose Unicode whitespace
# would make the Python kernels' token counts exceed the JVM's.
# numpy stays a LAZY module global (review r11): the expression-only
# operators — the module's advertised no-Python surface — must import
# without it; the DP kernels bind it once on first call.
import re as _re  # noqa: E402

_WS_ASCII = _re.compile(r"[ \t\n\x0b\f\r]+")
_np = None  # bound by _numpy() on first kernel call


def _numpy():
    global _np
    if _np is None:
        import numpy
        _np = numpy
    return _np

# tiny stopword lexicons for the lang-id heuristic (public common words)
LANG_LEXICONS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "for", "it"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    "es": ["el", "los", "y", "un", "una", "es", "en", "que", "para", "con"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "den",
           "von"],
}
#: deterministic tie-break priority (first wins on equal score)
LANG_PRIORITY = ["en", "fr", "es", "de"]


# ------------------------------------------------------------- operators


def quality_metrics(df: DataFrame, text_col: str = "text",
                    round_dp: int = 6) -> DataFrame:
    """Quality-scoring columns: length, word count, mean word length,
    punctuation ratio, stopword ratio, digit ratio."""
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_words = F.size(toks)
    en = F.array([F.lit(w) for w in LANG_LEXICONS["en"]])
    stop_hits = F.size(F.filter(toks, lambda x: F.array_contains(en, x)))
    return df.select(
        "*",
        n_chars.alias("n_chars_computed"),
        n_words.alias("n_words"),
        F.round(F.length(F.regexp_replace(t, r"\s", ""))
                / F.nullif(n_words.cast("double"), F.lit(0.0)), round_dp)
        .alias("avg_word_len"),
        F.round(F.regexp_count(t, F.lit(r"[^A-Za-z0-9\s]"))
                / F.nullif(n_chars.cast("double"), F.lit(0.0)), round_dp)
        .alias("punct_ratio"),
        F.round(F.regexp_count(t, F.lit(r"[0-9]"))
                / F.nullif(n_chars.cast("double"), F.lit(0.0)), round_dp)
        .alias("digit_ratio"),
        F.round(stop_hits / F.nullif(n_words.cast("double"), F.lit(0.0)),
                round_dp).alias("stopword_ratio"),
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace words and BPE-ish pieces."""
    t = F.col(text_col)
    return df.select(
        "*",
        F.size(tokens(t)).alias("n_ws_tokens"),
        F.regexp_count(t, F.lit(BPE_ISH_PATTERN)).alias("n_bpe_tokens"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: stopword-lexicon hit counts, deterministic
    priority-ordered argmax (en > fr > es > de; 'und' = undetermined
    when every score is 0)."""
    toks = tokens(F.col(text_col))

    def _score(lex: list[str]) -> Column:
        arr = F.array([F.lit(w) for w in lex])
        # NB: the lambda must take exactly one arg — F.filter inspects
        # arity and would pass the element index as a second parameter
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    scores = {lang: _score(lex) for lang, lex in LANG_LEXICONS.items()}
    out = df
    for lang in LANG_PRIORITY:
        out = out.withColumn(f"score_{lang}", scores[lang])
    all_zero = None
    for lang in LANG_PRIORITY:
        c = F.col(f"score_{lang}") == 0
        all_zero = c if all_zero is None else (all_zero & c)
    # priority-ordered argmax: first language whose score >= the rest
    expr = F.when(all_zero, F.lit("und"))
    for i, lang in enumerate(LANG_PRIORITY):
        rest = [F.col(f"score_{o}") for o in LANG_PRIORITY[i + 1:]]
        cond = None
        for r in rest:
            ge = F.col(f"score_{lang}") >= r
            cond = ge if cond is None else (cond & ge)
        expr = expr.when(F.lit(True) if cond is None else cond, F.lit(lang))
    return out.withColumn("lang_pred", expr)


def fingerprints(df: DataFrame, text_col: str = "text",
                 ngram: int = 3) -> DataFrame:
    """Document fingerprinting: full-text md5, 64-bit content hash, and
    a rolling content fingerprint = min over word-``ngram`` window
    hashes (winnowing-style: stable under small edits far from the
    minimum)."""
    t = F.col(text_col)
    toks = tokens(t)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - ngram, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, ngram)))
    return df.select(
        "*",
        F.md5(t).alias("md5"),
        hash64(t).alias("content_hash"),
        F.array_min(F.transform(grams, lambda g: hash64(g)))
        .alias("rolling_min_hash"),
    )


#: ordered (name, default-threshold) quality rules — Gopher/C4-style
#: repetition-free subset expressible over quality_metrics columns.
QUALITY_RULES: list[tuple[str, str]] = [
    ("too_few_words", "n_words < {min_words}"),
    ("too_many_words", "n_words > {max_words}"),
    ("word_len_out_of_range",
     "avg_word_len < {min_awl} OR avg_word_len > {max_awl}"),
    ("high_punct", "punct_ratio > {max_punct}"),
    ("high_digit", "digit_ratio > {max_digit}"),
    ("low_stopword", "stopword_ratio < {min_stop}"),
]


def quality_filter(df: DataFrame, text_col: str = "text",
                   min_words: int = 20, max_words: int = 5000,
                   min_awl: float = 3.0, max_awl: float = 5.0,
                   max_punct: float = 0.2, max_digit: float = 0.3,
                   min_stop: float = 0.04) -> DataFrame:
    """Gopher-style document quality gate: evaluate the ordered
    QUALITY_RULES over quality_metrics columns; ``keep`` = no rule
    fires, ``reject_reason`` = FIRST firing rule (deterministic).

    One codegen'd projection over the metrics — no shuffle, no UDF;
    at 100 TB this runs at scan speed and the filter pushes into
    downstream plans. Rule expressions are SQL on both engines so the
    oracle shares this exact thresholds dict.
    """
    params = dict(min_words=min_words, max_words=max_words,
                  min_awl=min_awl, max_awl=max_awl, max_punct=max_punct,
                  max_digit=max_digit, min_stop=min_stop)
    m = quality_metrics(df, text_col)
    reason = F.lit(None).cast("string")
    fired = F.lit(False)
    for name, tmpl in QUALITY_RULES:
        cond = F.expr(tmpl.format(**params))
        reason = F.when(~fired & cond, F.lit(name)).otherwise(reason)
        fired = fired | F.coalesce(cond, F.lit(False))
    return m.withColumn("keep", ~fired) \
            .withColumn("reject_reason", reason)


def quality_rules_sql(**overrides) -> list[tuple[str, str]]:
    """The same ordered rules rendered as ANSI SQL predicates (for the
    DuckDB oracle) with quality_filter's default thresholds."""
    params = dict(min_words=20, max_words=5000, min_awl=3.0,
                  max_awl=5.0, max_punct=0.2, max_digit=0.3,
                  min_stop=0.04)
    params.update(overrides)
    return [(name, tmpl.format(**params)) for name, tmpl in QUALITY_RULES]


def token_rarity(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", round_dp: int = 6) -> DataFrame:
    """Corpus-relative rarity profile per document: mean corpus
    frequency of the doc's tokens and the fraction of tokens rarer
    than the vocabulary's mean frequency.

    "Rare" is the integer-exact predicate freq * |V| < total_tokens
    (⟺ freq < mean vocab frequency, with no division) so the result
    is bit-deterministic under any partitioning. Plan: one explode →
    token-count aggregation (the vocabulary, tiny vs the corpus —
    broadcast), then one per-doc aggregation; the final two divisions
    are single exact-int-to-double ops, deterministic across engines.
    """
    tok = df.select(F.col(id_col),
                    F.explode(tokens(F.col(text_col))).alias("_t"))
    freq = tok.groupBy("_t").agg(F.count("*").alias("_f"))
    totals = freq.agg(F.sum("_f").alias("_total"),
                      F.count("*").alias("_vocab"))
    fr = (F.broadcast(freq.crossJoin(F.broadcast(totals)))
          .withColumn("_rare",
                      (F.col("_f") * F.col("_vocab")
                       < F.col("_total")).cast("long")))
    return (tok.join(fr, "_t")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_tokens"),
                 F.sum("_f").alias("_sum_f"),
                 F.sum("_rare").alias("_n_rare"))
            .select(
                id_col, "n_tokens",
                F.round(F.col("_sum_f")
                        / F.col("n_tokens").cast("double"), round_dp)
                .alias("avg_token_freq"),
                F.round(F.col("_n_rare")
                        / F.col("n_tokens").cast("double"), round_dp)
                .alias("rare_token_ratio")))


def repetition_metrics(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       round_dp: int = 6) -> DataFrame:
    """Gopher-style within-document repetition: duplicate-token
    fraction, most-common-token fraction, most-common-bigram fraction.
    All ratios are exact integer counts divided once in double —
    bit-deterministic. Two explode→groupBy aggregations (tokens,
    bigrams), each map-side-combinable; nothing is O(n²)."""
    t = F.col(text_col)
    toks = tokens(t)
    tok = df.select(F.col(id_col), F.explode(toks).alias("_t"))
    per_tok = (tok.groupBy(id_col, "_t").agg(F.count("*").alias("_c"))
               .groupBy(id_col)
               .agg(F.sum("_c").alias("n_tokens"),
                    F.count("*").alias("_distinct"),
                    F.max("_c").alias("_top")))
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)))
    big = (df.where(F.size(toks) >= 2)
           .select(F.col(id_col), F.explode(grams).alias("_g")))
    per_big = (big.groupBy(id_col, "_g").agg(F.count("*").alias("_c"))
               .groupBy(id_col)
               .agg(F.sum("_c").alias("_n_big"),
                    F.max("_c").alias("_top_big")))
    return (per_tok.join(per_big, id_col, "left")
            .select(
                id_col, "n_tokens",
                F.round((F.col("n_tokens") - F.col("_distinct"))
                        / F.col("n_tokens").cast("double"), round_dp)
                .alias("dup_token_ratio"),
                F.round(F.col("_top")
                        / F.col("n_tokens").cast("double"), round_dp)
                .alias("top_token_ratio"),
                F.round(F.col("_top_big")
                        / F.col("_n_big").cast("double"), round_dp)
                .alias("top_bigram_ratio")))


# --------------------------------------------- benchmark contamination


def ngram_contamination(train: DataFrame, benchmark: DataFrame,
                        k: int = 5, id_col: str = "doc_id",
                        text_col: str = "text",
                        round_dp: int = 6) -> DataFrame:
    """Train/test overlap detection — the decontamination pass every
    training-data pipeline runs before a benchmark ships: for each
    training doc, how many of its word ``k``-grams appear anywhere in
    the benchmark corpus.

    Scale shape: the benchmark side collapses to a DISTINCT gram-hash
    set (benchmarks are tiny next to the corpus → broadcast); the
    train side explodes to (doc, gram-hash) — 8-byte hashes, not
    strings — and one partial-aggregable groupBy(doc) counts hits. No
    self-join, no string shuffle. Returns
    (id, n_grams, n_shared, contamination_ratio).
    """
    from industrial_data_pipeline_spark.operators.dedup import \
        word_shingles
    bench_grams = (benchmark
                   .select(F.explode(word_shingles(F.col(text_col), k))
                           .alias("_g"))
                   .select(hash64(F.col("_g")).alias("_h")).distinct())
    tr = (train.select(F.col(id_col),
                       F.explode(word_shingles(F.col(text_col), k))
                       .alias("_g"))
          .select(id_col, hash64(F.col("_g")).alias("_h")))
    hits = tr.join(F.broadcast(bench_grams).withColumn("_hit", F.lit(1)),
                   "_h", "left")
    return (hits.groupBy(id_col)
            .agg(F.count("*").alias("n_grams"),
                 F.sum(F.coalesce("_hit", F.lit(0))).alias("n_shared"))
            .select(id_col, "n_grams", "n_shared",
                    F.round(F.col("n_shared")
                            / F.col("n_grams").cast("double"), round_dp)
                    .alias("contamination_ratio")))


# ------------------------------------------------------ PII redaction


#: pattern → replacement, applied in order. Kept inside the regex
#: subset Java and RE2 share so the DuckDB oracle replays them exactly.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "<IP>"),
]


def redact_pii(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Scrub emails / phone numbers / IPv4 literals, counting each
    kind — pure codegen (`regexp_replace`/`regexp_count`), no Python.
    Order matters: emails first so their host part is never half-eaten
    by the IP rule. Returns (id, n_email, n_phone, n_ip, redacted)."""
    out = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(out, F.lit(pat)).alias(f"n_{name}"))
        out = F.regexp_replace(out, pat, repl)
    return df.select(F.col(id_col), *counts, out.alias("redacted"))


# --------------------------------------------------- sequence packing


def sequence_packing(df: DataFrame, budget: int = 1024,
                     id_col: str = "doc_id", text_col: str = "text",
                     part_col: str = "source") -> DataFrame:
    """Pretraining sequence packing, planning pass: documents are
    concatenated per ``part_col`` stream (ordered by id) and chunked
    into fixed ``budget``-token context windows; a document may
    straddle windows. Emits each doc's placement:
    (id, part, n_tokens, start_pack, end_pack, start_offset).

    One running-sum window per stream partition — the partition key
    keeps the window distributed (no global sort); at 100 TB the
    streams are shards and each fits a task."""
    from pyspark.sql import Window

    n = F.size(tokens(F.col(text_col)))
    w = (Window.partitionBy(part_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(n).over(w)
    before = (cum - n).cast("long")
    return df.select(
        F.col(id_col), F.col(part_col).alias("part"),
        n.cast("long").alias("n_tokens"),
        F.floor(before / budget).alias("start_pack"),
        F.floor((before + n - 1) / budget).alias("end_pack"),
        (before % budget).alias("start_offset"))


def hash_split(df: DataFrame, salt: str = "v1", id_col: str = "doc_id",
               train_pct: int = 80, val_pct: int = 10) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent
    id hash — stable across runs, engines and shard layouts (the
    property random() splits lack). Adds a ``split`` column."""
    bucket = F.pmod(hash64(F.concat(F.col(id_col).cast("string"),
                                    F.lit(":" + salt))), F.lit(100))
    split = (F.when(bucket < train_pct, F.lit("train"))
             .when(bucket < train_pct + val_pct, F.lit("val"))
             .otherwise(F.lit("test")))
    return df.withColumn("split", split)


def bpe_merge_pairs(df: DataFrame, text_col: str = "text",
                    k: int = 20) -> DataFrame:
    """The BPE-training primitive: corpus-wide counts of ADJACENT
    character pairs inside words (lowercased whitespace tokens) — the
    table whose argmax is the next merge in byte-pair-encoding
    tokenizer training. One explode to tokens, one explode to pairs
    (JVM higher-order fns, no Python), one count shuffle with
    map-side partial aggregation — the same shape at 100 TB, where
    each training round is exactly this job with the previous round's
    merges applied. Top-``k`` by count, ties lexicographic."""
    toks = tokens(F.lower(F.col(text_col)))
    t = df.select(F.explode(toks).alias("t")) \
        .where(F.length("t") >= 2)
    pairs = F.transform(F.sequence(F.lit(1), F.length("t") - 1),
                        lambda i: F.col("t").substr(i, F.lit(2)))
    return (t.select(F.explode(pairs).alias("pair"))
            .groupBy("pair").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("pair")).limit(k))


def shard_assignment(df: DataFrame, n_shards: int = 8,
                     salt: str = "shard1", order_salt: str = "ord1",
                     id_col: str = "doc_id") -> DataFrame:
    """Deterministic global shuffle + sharding for a training-data
    export: ``shard`` = portable id hash mod ``n_shards`` (stable
    across runs, engines and input layouts), ``_okey`` = a second
    independent hash giving the within-shard shuffle order (training
    wants documents decorrelated from insertion order; a seeded hash
    IS a reproducible shuffle). The physical write is
    ``repartition(n_shards, "shard").sortWithinPartitions("_okey")``
    — one shuffle, each output file a shard in final order; at 100 TB
    the hash spreads uniformly so shard sizes stay balanced without
    sampling."""
    h = hash64(F.concat(F.col(id_col).cast("string"),
                        F.lit(":" + salt)))
    okey = hash64(F.concat(F.col(id_col).cast("string"),
                           F.lit(":" + order_salt)))
    return (df.withColumn("shard", F.pmod(h, F.lit(n_shards)))
            .withColumn("_okey", okey))


def temperature_mix(df: DataFrame, id_col: str = "doc_id",
                    domain_col: str = "source", alpha: float = 0.5,
                    salt: str = "mix1",
                    frac_scale: int = 1_000_000) -> DataFrame:
    """Temperature-based domain mixing — the data-mixing primitive of
    multilingual/multi-domain pretraining (weights ∝ n^alpha, the
    GPT-3/XLM-R rebalance): every document is emitted
    ``(max_n / n_domain)^alpha`` times, i.e. the largest domain stays
    at 1 copy and smaller domains are UPSAMPLED toward parity, with
    the exponent tempering how far. The q48 stratified sampler is the
    DOWNSAMPLE half of this trade; repetition is the half it cannot
    express (keep-probability caps at 1).

    Fractional copies are realized deterministically: each doc gets
    ``floor(c)`` copies plus one more iff
    ``hash64(id:salt) mod frac_scale < floor(frac(c)·frac_scale)`` —
    the portable md5 hash, so the realized mix is reproducible on any
    engine and any run, and the expected copy count is exact to
    1/frac_scale with no RNG state.

    Engine-pinned arithmetic: with ``alpha=0.5`` the weight is
    computed as ``sqrt(max_n/n)`` — sqrt, like +,-,*,/, is IEEE-754
    correctly rounded, so Java (Spark) and C (DuckDB/any oracle)
    produce BIT-IDENTICAL copy counts. General ``alpha`` uses
    ``pow``, which libms do NOT guarantee correctly rounded — fine
    for production mixing, but cross-engine byte-equality is only
    contractual at 0.5 (the docstring analogue of CHRF_WS: pin the
    definition, not the engine default).

    Plan shape: one count aggregate over |domains| groups, a scalar
    max, the per-domain copy spec broadcast back onto the corpus, and
    an explode of a 0..n_copies-1 sequence — no shuffle of the fact
    table at all (count is partial-aggregated; the explode is
    map-side). At 100 TB the output is written straight through
    shard_assignment: repetition multiplies rows before the shuffle,
    so size the shard count by the POST-mix row count.

    NULL domains: rows whose ``domain_col`` is NULL are dropped (the
    spec join is an equi-join, and a SQL replay's ``JOIN ... USING``
    drops them identically) — coalesce to a sentinel domain upstream
    if null-domain docs must be kept."""
    # alpha < 0 would invert the weighting (copies < 1 for the
    # smaller domains), making _base = 0 — and sequence(0, -1) emits
    # [0, -1], silently DUPLICATING dropped docs (self-review r10).
    # Downsampling is q48's job; this operator only upsamples.
    assert 0.0 <= float(alpha) <= 1.0, alpha
    ratio = (F.col("_mx").cast("double")
             / F.col("_n").cast("double"))
    copies = (F.sqrt(ratio) if float(alpha) == 0.5
              else F.pow(ratio, F.lit(float(alpha))))
    counts = df.groupBy(domain_col).agg(F.count("*").alias("_n"))
    spec = (counts
            .crossJoin(F.broadcast(counts.agg(
                F.max("_n").alias("_mx"))))
            .withColumn("_c", copies)
            .select(domain_col,
                    F.floor(F.col("_c")).cast("long").alias("_base"),
                    F.floor((F.col("_c") - F.floor(F.col("_c")))
                            * F.lit(int(frac_scale)))
                    .cast("long").alias("_fs")))
    h = F.pmod(hash64(F.concat(F.col(id_col).cast("string"),
                               F.lit(":" + salt))),
               F.lit(int(frac_scale)))
    n_copies = (F.col("_base")
                + F.when(h < F.col("_fs"), F.lit(1))
                .otherwise(F.lit(0))).alias("n_copies")
    # _base >= 1 always (max_n/n >= 1 → copies >= 1): the sequence
    # below is never empty, so no document is ever silently dropped
    return (df.join(F.broadcast(spec), domain_col)
            .select(id_col, domain_col, n_copies)
            .select(id_col, domain_col, "n_copies",
                    F.explode(F.sequence(
                        F.lit(0),
                        (F.col("n_copies") - 1).cast("int")))
                    .alias("copy_idx")))


def lm_cross_entropy(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", salt: str = "lm1",
                     train_pct: int = 80, round_dp: int = 6) -> DataFrame:
    """CCNet-style quality scoring: per-document cross-entropy under a
    Laplace-smoothed bigram LM trained on a deterministic hash split
    of the corpus itself (the perplexity-bucket filter of modern
    curation stacks, minus the external KenLM dependency — the LM IS
    the corpus statistics).

    Train side (hash64(id:salt) % 100 < train_pct): bigram counts c2,
    unigram counts c1, vocab size V. Every doc (train AND held-out)
    then scores avg −ln p(w2|w1) with p = (c2+1)/(c1+V); unseen
    history ⇒ 1/V. Two narrow count shuffles + one broadcast scalar;
    the score join is on the bigram key.

    Determinism: each −ln term is quantized to DECIMAL(28,12) before
    the per-doc sum, so the aggregation is partition-merge-order
    independent (the q43 lesson) — natural log parity Spark↔DuckDB is
    the same pairing the TF-IDF oracle (q59) already pins green.
    Docs with <2 tokens carry n_bigrams=0 and a NULL score.
    """
    toks = tokens(F.lower(F.col(text_col)))
    base = df.select(F.col(id_col), toks.alias("_t"),
                     F.pmod(hash64(F.concat(F.col(id_col).cast("string"),
                                            F.lit(":" + salt))),
                            F.lit(100)).alias("_b"))
    n = F.size("_t")
    bi = base.select(
        id_col, "_b",
        F.explode_outer(F.arrays_zip(
            F.slice("_t", 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
            F.slice("_t", 2, F.greatest(n - 1, F.lit(0))).alias("w2")))
        .alias("_p")) \
        .select(id_col, "_b", F.col("_p.w1").alias("w1"),
                F.col("_p.w2").alias("w2"))
    train_bi = bi.where(F.col("_b") < train_pct).where(
        F.col("w1").isNotNull())
    c2 = train_bi.groupBy("w1", "w2").agg(F.count("*").alias("_c2"))
    c1 = train_bi.groupBy("w1").agg(F.count("*").alias("_c1"))
    vocab = (base.where(F.col("_b") < train_pct)
             .select(F.explode("_t").alias("w")).distinct()
             .agg(F.count("*").alias("_v")))
    scored = (bi.where(F.col("w1").isNotNull())
              .join(c2, ["w1", "w2"], "left")
              .join(c1, "w1", "left")
              .crossJoin(F.broadcast(vocab)))
    p = ((F.coalesce("_c2", F.lit(0)) + F.lit(1)).cast("double")
         / (F.coalesce("_c1", F.lit(0)) + F.col("_v")).cast("double"))
    term = (-F.log(p)).cast("decimal(28,12)")
    agg = (scored.groupBy(id_col)
           .agg(F.count("*").alias("n_bigrams"),
                F.sum(term).alias("_s")))
    out = base.select(id_col, (F.col("_b") < train_pct).alias("is_train")) \
        .join(agg, id_col, "left")
    return out.select(
        id_col, "is_train",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        (F.round(F.col("_s").cast("double") / F.col("n_bigrams"),
                 round_dp) + F.lit(0.0)).alias("cross_entropy_nats"))


def chunk_documents(df: DataFrame, window: int = 128, stride: int = 96,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Sliding-window document chunking — the RAG / pretraining
    shard-prep primitive: token windows of ``window`` advancing by
    ``stride`` (overlap = window − stride), each with a stable
    (doc_id, chunk_idx) identity, token offsets, and a portable
    content hash for chunk-level dedup downstream.

    Pure codegen: tokens once per doc, chunk count by integer
    arithmetic, one ``explode(sequence(...))`` — rows are generated
    executor-side, so a 10 kB doc and a 10 MB doc cost their own
    token counts and nothing shuffles until a downstream groupBy.
    Empty docs produce no chunks; the final chunk is the short tail.
    """
    if not (0 < stride <= window):
        raise ValueError(f"need 0 < stride <= window, got "
                         f"{stride}/{window}")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = (F.ceil((F.greatest(n - window, F.lit(0)))
                       / F.lit(stride)).cast("int") + 1)
    base = df.select(F.col(id_col), toks.alias("_t"), n.alias("_n"),
                     n_chunks.alias("_k")).where(F.col("_n") > 0)
    ch = base.select(
        id_col, "_t", "_n",
        F.explode(F.sequence(F.lit(0), F.col("_k") - 1))
        .alias("chunk_idx"))
    start = F.col("chunk_idx") * stride
    piece = F.slice("_t", start + 1,
                    F.least(F.lit(window), F.col("_n") - start))
    return ch.select(
        id_col, "chunk_idx",
        start.cast("long").alias("start_token"),
        F.size(piece).cast("long").alias("n_tokens"),
        hash64(F.concat_ws(" ", piece)).alias("chunk_hash"))


def mixture_weights(df: DataFrame, targets: dict[str, int],
                    source_col: str = "source",
                    text_col: str = "text",
                    round_dp: int = 6) -> DataFrame:
    """Source-mixture reweighting — the data-mixing step of a
    training pipeline: given integer target weights per source,
    compute the downsample-only rates that hit the target token
    proportions at the largest achievable corpus size
    (T = min_s tokens_s · W / w_s; rate_s = w_s · T / (W · tokens_s),
    so the binding source keeps rate 1.0 and everything else thins).

    Exact integer token counts; each rate is a single deterministic
    double expression off broadcast scalars — no data-sized collect,
    and the rates feed the deterministic hash sampler
    (:func:`stratified-hash sample <industrial_data_pipeline_spark.
    operators.events_analytics.stratified_hash_sample>`) unchanged.
    Sources absent from ``targets`` get weight 0 (rate 0).
    """
    w_col: Column = F.lit(0)
    for s, w in sorted(targets.items()):
        w_col = F.when(F.col(source_col) == s, F.lit(int(w))) \
            .otherwise(w_col)
    W = sum(int(w) for w in targets.values())
    per = (df.groupBy(source_col)
           .agg(F.count("*").alias("n_docs"),
                F.sum(F.size(tokens(F.col(text_col))))
                .alias("n_tokens"),
                F.first(w_col).alias("_w")))
    # largest feasible total under downsample-only: binding source
    feasible = per.where(F.col("_w") > 0).agg(
        F.min(F.col("n_tokens").cast("double") * F.lit(float(W))
              / F.col("_w")).alias("_T"))
    out = per.crossJoin(F.broadcast(feasible))
    rate = F.when(
        F.col("_w") > 0,
        F.col("_w") * F.col("_T")
        / (F.lit(float(W)) * F.col("n_tokens"))).otherwise(F.lit(0.0))
    return out.select(
        source_col, "n_docs", F.col("n_tokens").cast("long")
        .alias("n_tokens"),
        (F.round(F.col("_w") / F.lit(float(W)), round_dp) + F.lit(0.0))
        .alias("target_share"),
        (F.round(rate, round_dp) + F.lit(0.0)).alias("sample_rate"))


def tfidf_weights(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  max_df: int = 100) -> tuple[DataFrame, DataFrame]:
    """Stop-term-pruned TF-IDF posting lists + per-doc norms — the
    shared substrate of the sparse similarity join
    (:func:`tfidf_cosine_pairs`) and hybrid retrieval. Weights
    quantize to DECIMAL(18,6) (cross-engine ln() safety, the q141
    pattern); norms are exact decimal sums under an IEEE sqrt.
    Returns (weights(_id, t, w), norms(_id, _n)).

    N (the corpus size) rides a broadcast 1-row crossJoin of the
    count aggregate rather than an eager ``docs.count()`` — fully
    lazy, so constructing the DataFrame launches NO Spark job
    (plan-only callers like explain dumps and window_audit stay
    free; the q171/bm25 pattern)."""
    docs = df.select(F.col(id_col).alias("_id"), text_col)
    n_docs = docs.agg(F.count("*").alias("_N"))
    toks = docs.select(
        "_id", F.explode(tokens(F.lower(F.col(text_col)))).alias("t"))
    tf = toks.groupBy("_id", "t").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("t").agg(F.count("*").alias("df"))
    w = (tf.join(F.broadcast(dfreq.where(F.col("df") <= max_df)), "t")
         .crossJoin(F.broadcast(n_docs))
         .select("_id", "t",
                 (F.col("tf") * F.log(
                     (F.col("_N") + F.lit(1.0))
                     / (F.col("df") + F.lit(1.0))))
                 .cast("decimal(18,6)").alias("w")))
    norm = w.groupBy("_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double"))
        .alias("_n"))
    return w, norm


def tfidf_cosine_pairs(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", max_df: int = 100,
                       threshold: float = 0.5) -> DataFrame:
    """Sparse document-similarity JOIN via inverted index — the
    no-embeddings similarity path: TF-IDF-weighted posting lists per
    term, pairwise partial products summed per doc pair, cosine from
    exact norms. Terms with document frequency > ``max_df`` are
    dropped BEFORE the pair join (stop-term pruning): the join cost
    is Σ df² over surviving terms, so the cap is what turns the
    worst-case-quadratic term join into a bounded one — the standard
    trick in every production similarity join. Cosine is therefore
    defined in the pruned term space on both engine and oracle.

    Determinism: weights quantize to DECIMAL(18,6) (absorbing any
    sub-ulp ln() difference between engines, the q141 pattern); the
    pair dot and the squared norms are exact decimal sums; the final
    sqrt/division are correctly-rounded IEEE double ops on identical
    inputs — so the emitted cosine is bit-stable and needs no
    rounding."""
    w, norm = tfidf_weights(df, id_col, text_col, max_df)
    a = w.select(F.col("_id").alias("id_a"), "t",
                 F.col("w").alias("_wa"))
    b = w.select(F.col("_id").alias("id_b"), "t",
                 F.col("w").alias("_wb"))
    dots = (a.join(b, "t").where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.sum(F.col("_wa") * F.col("_wb")).cast("double")
                 .alias("_dot")))
    na = norm.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na"))
    nb = norm.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb"))
    cos = F.col("_dot") / (F.col("_na") * F.col("_nb"))
    return (dots.join(na, "id_a").join(nb, "id_b")
            .withColumn("cosine_sim", cos + F.lit(0.0))
            .where(F.col("cosine_sim") >= threshold)
            .select("id_a", "id_b", "cosine_sim"))


def trigram_like_search(df: DataFrame, pattern: str,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Index-accelerated substring search — the 100 TB answer to the
    reference's full-scan ``LIKE '%pattern%'`` lookup (database.py
    lookup path, P6/q03): a character-trigram inverted index turns
    the contains-query into a posting-list intersection (a doc is a
    candidate only if it contains EVERY trigram of the pattern),
    then an exact LIKE verifies the few survivors — same results as
    the scan, index-lookup cost. The posting build is the write-once
    indexed asset; the per-query cost is |pattern| posting lists.

    Emits (id, n_candidates): the candidate count rides along so the
    pruning claim itself is part of the checked result."""
    if len(pattern) < 3 or any(ch in pattern for ch in "%_\\"):
        # '%'/'_' are LIKE wildcards and '\\' is the LIKE escape —
        # the trigram filter treats all three literally, so candidates
        # would silently miss true matches (or the LIKE would throw)
        raise ValueError(
            "pattern must be a plain substring of length >= 3 "
            "(no %/_ wildcards, no backslash)")
    qgrams = sorted({pattern[i:i + 3]
                     for i in range(len(pattern) - 2)})
    t = F.col(text_col)
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.length(t) - 2),
        lambda i: t.substr(i, F.lit(3))))
    posting = (df.select(F.col(id_col).alias("_id"),
                         F.explode(grams).alias("tg"))
               .where(F.col("tg").isin(qgrams)))
    # the candidate count rides along as a broadcast 1-row crossJoin
    # of the count aggregate: fully lazy (no Spark job at
    # DataFrame-construction time — plan-only callers like explain
    # dumps and window_audit stay free), no empty-partition window
    # (which would ship every candidate to a single partition), and
    # no retained checkpoint blocks. The posting intersection still
    # evaluates twice per action (count subtree + verify join) — a
    # deliberate trade: it is the cheap indexed path, and the verify
    # join dominates anyway.
    cand_ids = (posting.groupBy("_id")
                .agg(F.count_distinct("tg").alias("_n"))
                .where(F.col("_n") == len(qgrams))
                .select("_id"))
    n_cand = cand_ids.agg(
        F.count("*").alias("n_candidates"))
    cand = cand_ids.crossJoin(F.broadcast(n_cand))
    return (df.join(cand, df[id_col] == cand._id)
            .where(t.like(f"%{pattern}%"))
            .select(id_col, "n_candidates"))


def bm25_topk(df: DataFrame, queries: dict[int, str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text",
              round_dp: int = 6, analyzer=None) -> DataFrame:
    """BM25 (Okapi) top-``k`` retrieval — the lexical ranking function
    behind decontamination sweeps, eval-set mining and the sparse leg
    of hybrid RAG retrieval (complements q167's TF-IDF/RRF fusion
    with the saturating-tf model every production retriever actually
    ships). The reference's only text search is a full-scan LIKE
    (database.py lookup path); this is its corpus-scale ranked
    counterpart.

    ``queries`` maps query_id → free-text query string (tokenized the
    same way as documents). Returns (query_id, doc_id, bm25, rank),
    rank 1..k per query, ties broken by doc_id. ``analyzer`` (an
    :class:`~.analyzer.Analyzer`) swaps the default lower()+
    whitespace tokenization for the shared normalize→extract→
    stopword→stem pipeline on BOTH documents (Spark twin) and query
    strings (driver twin) — VERDICT r12 item 1; None keeps the
    legacy tokenizer byte-for-byte.

    Scale shape: the posting explode is FILTERED to the union of
    query terms immediately (the probe touches |query terms| posting
    lists, never the full index); query terms and the (N, avgdl)
    scalar are broadcast; the only shuffles are the (doc,term) tf
    count and the per-(query,doc) score sum — both narrow, both
    map-side-combined. No all-pairs stage, no global window (the
    rank window partitions by query_id; |queries| partitions).

    Determinism: per-term contributions round to ``round_dp`` BEFORE
    the sum, and the rank orders on the ROUNDED sum — so the oracle's
    decimal math lands on identical quantized values and rank flips
    on last-ulp ln/division noise cannot occur (sums of 1e-6
    multiples sit half a quantum away from every rounding boundary).
    """
    qterms = sorted({(qid, t)
                     for qid, qs in queries.items()
                     for t in (analyzer.py(qs) if analyzer
                               else qs.lower().split())})
    if not qterms:
        raise ValueError("queries must contain at least one "
                         "analyzable term")
    vocab = sorted({t for _, t in qterms})
    toks = (analyzer.spark(F.col(text_col)) if analyzer
            else tokens(F.lower(F.col(text_col))))
    docs = df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
    # scalar stats ride a broadcast 1-row crossJoin (lazy; no job at
    # construction time). dl counts ALL tokens, not just query terms.
    stats = docs.agg(
        F.count("*").alias("_n_docs"),
        F.avg(F.size("_toks")).alias("_avgdl"))
    posting = (docs.select("_id", F.size("_toks").alias("_dl"),
                           F.explode("_toks").alias("_t"))
               .where(F.col("_t").isin(vocab))
               .groupBy("_id", "_t", "_dl")
               .agg(F.count("*").alias("_tf")))
    dfreq = posting.groupBy("_t").agg(F.count("*").alias("_df"))
    # explicit DDL schema: inference would raise on edge-shaped input
    # and would type query_id from the first row only
    qdf = posting.sparkSession.createDataFrame(
        qterms, "query_id long, _t string")
    idf = F.log(F.lit(1.0)
                + (F.col("_n_docs") - F.col("_df") + F.lit(0.5))
                / (F.col("_df") + F.lit(0.5)))
    contrib = F.round(
        idf * (F.col("_tf") * F.lit(k1 + 1.0))
        / (F.col("_tf")
           + F.lit(k1) * (F.lit(1.0 - b)
                          + F.lit(b) * F.col("_dl") / F.col("_avgdl"))),
        round_dp)
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(
        F.desc("bm25"), F.col("doc_id"))
    return (posting
            .join(F.broadcast(qdf), "_t")
            .join(F.broadcast(dfreq), "_t")
            .crossJoin(F.broadcast(stats))
            .groupBy("query_id", F.col("_id").alias("doc_id"))
            .agg(F.round(F.sum(contrib), round_dp).alias("bm25"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


#: Unit separator used by :func:`bpe_apply`'s symbol encoding —
#: ASCII 0x1F. NOT guaranteed absent from arbitrary text (0x1F is a
#: control char, not whitespace), so :func:`bpe_apply` strips it from
#: the input before encoding — the same disposition
#: :func:`normalize_text` applies (its ctrl class removes 0x1F), so
#: normalized corpora are unaffected and un-normalized ones can't
#: corrupt unit counts or merge boundaries.
BPE_SEP = "\x1f"


def bpe_apply(df: DataFrame, merges: list[tuple[str, str]],
              id_col: str = "doc_id", text_col: str = "text",
              round_dp: int = 6) -> DataFrame:
    """Apply a FIXED BPE merge table to tokenize a corpus — the step
    q156 (merge-pair counting) stops short of: q156 LEARNS the next
    merge, this APPLIES a learned list, producing the subword
    statistics a token-budgeted pipeline bills against (pairs with
    q128 packing and q141 perplexity). The reference has no
    tokenizer at all; every LLM-data pipeline runs this over the
    full corpus once per tokenizer version.

    Semantics (deterministic, engine-portable): words are whitespace
    tokens of ``lower(text)``; each word is encoded with every unit
    WRAPPED in ``BPE_SEP`` (``SEP c SEP`` per char, so adjacent
    units are separated by a DOUBLED separator); merge rules apply
    in list order as a left-to-right non-overlapping string replace
    of ``SEP a SEP SEP b SEP -> SEP ab SEP``. The wrapping is what
    makes the replace unit-aware: a pattern can never match a
    suffix/prefix of a longer unit (no separator precedes mid-unit
    chars), and adjacent matches share no boundary characters, so
    one replace pass == the exhaustive leftmost-greedy application
    of that rule. (Rank-priority iterative BPE and the in-order
    exhaustive form coincide when, as in any standard learned
    table, a rule's output symbols are produced only by earlier
    rules; the in-order form is what both engines run as a pure
    string pipeline, so it is the DEFINED semantics and the oracle
    replays it verbatim.) Merges never cross word boundaries: the
    space between words breaks every pattern.

    Scale shape: the whole operator is a per-row projection — one
    transform building the symbol string, ``len(merges)`` chained
    ``replace`` calls, and arithmetic on separator counts. No
    shuffle, no explode, no Python; cost is O(|text| · |merges|)
    per document, embarrassingly parallel, and the filter/column
    pruning of the underlying scan is untouched.

    Emits (id, n_units, n_subwords, merged_units, bpe_ratio): initial
    character units, post-merge subword count, units absorbed by
    merges, and the compression ratio (NULL for empty docs).
    """
    if not merges:
        raise ValueError("merges must contain at least one pair")
    sep = BPE_SEP
    # strip any literal 0x1F from the input first: it's a control
    # char (not whitespace), so a document containing it would
    # otherwise forge unit boundaries (see BPE_SEP note)
    word_syms = F.transform(
        tokens(F.replace(F.lower(F.col(text_col)),
                         F.lit(sep), F.lit(""))),
        lambda w: F.regexp_replace(w, "(.)", sep + "$1" + sep))
    sym = F.array_join(word_syms, " ")

    def seps(c):  # each unit carries TWO separators
        return ((F.length(c)
                 - F.length(F.replace(c, F.lit(sep), F.lit(""))))
                / F.lit(2)).cast("bigint")

    out = df.select(F.col(id_col), sym.alias("_sym"))
    out = out.withColumn("n_units", seps(F.col("_sym")))
    merged = F.col("_sym")
    for a, b in merges:
        merged = F.replace(merged,
                           F.lit(sep + a + sep + sep + b + sep),
                           F.lit(sep + a + b + sep))
    out = out.withColumn("_m", merged)
    return out.select(
        id_col, "n_units",
        seps(F.col("_m")).alias("n_subwords"),
        (F.col("n_units") - seps(F.col("_m"))).alias("merged_units"),
        (F.round(F.col("n_units")
                 / F.nullif(seps(F.col("_m")).cast("double"),
                            F.lit(0.0)), round_dp) + F.lit(0.0))
        .alias("bpe_ratio"))


def normalize_text(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Corpus text normalization — the cleaning pass every pipeline
    (C4, Gopher, RefinedWeb) runs before tokenizing, shingling or
    quality-scoring, in a fixed stage order so the counts are
    well-defined:

    1. strip zero-width characters (ZWSP/ZWNJ/ZWJ/BOM) —
       ``n_zero_width`` removed;
    2. map exotic whitespace (NBSP, tab, CR, LF) to plain space
       (length-preserving);
    3. strip remaining C0 control characters + DEL — ``n_ctrl``;
    4. collapse space runs to one — ``n_collapsed`` characters
       absorbed; then trim.

    Pure JVM regexp projections (patterns restricted to the
    Java-regex ∩ RE2 common syntax: literal chars and ``\\xHH``
    classes, so the DuckDB oracle runs the IDENTICAL patterns) — no
    shuffle, no Python; scan-speed at any corpus size. Emits the
    cleaned text's md5 so content equality itself is hash-checked,
    plus raw/clean lengths, per-stage counts, and ``changed``.
    """
    zw = "[\u200b\u200c\u200d\ufeff]"
    ws = "[\u00a0\t\n\r]"
    ctrl = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
    t = F.col(text_col)
    s1 = F.regexp_replace(t, zw, "")
    s2 = F.regexp_replace(s1, ws, " ")
    s3 = F.regexp_replace(s2, ctrl, "")
    s4 = F.regexp_replace(s3, " {2,}", " ")
    s5 = F.trim(s4)
    out = df.select(
        F.col(id_col),
        F.length(t).alias("raw_len"),
        (F.length(t) - F.length(s1)).alias("n_zero_width"),
        (F.length(s2) - F.length(s3)).alias("n_ctrl"),
        (F.length(s3) - F.length(s4)).alias("n_collapsed"),
        F.length(s5).alias("clean_len"),
        (s5 != t).alias("changed"),
        F.md5(s5).alias("clean_md5"))
    return out


def classifier_weights(n_buckets: int = 64) -> list[int]:
    """Deterministic md5-derived integer milli-weights in
    [-1000, 1000] for :func:`quality_classifier` — public-recipe
    constants any engine can reproduce (the repo's minhash_coeffs
    pattern)."""
    import hashlib

    return [int(hashlib.md5(f"qc:w:{b}".encode()).hexdigest()[:8],
                16) % 2001 - 1000 for b in range(n_buckets)]


def quality_classifier(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n_buckets: int = 64,
                       bias: float = -0.1, keep_threshold: float = 0.44,
                       round_dp: int = 6) -> DataFrame:
    """fastText-style linear document-quality classifier: hash
    unigram + bigram features into ``n_buckets``, average the
    buckets' learned weights, squash with a sigmoid — the shape of
    the model-based quality filters production pipelines run after
    the rule-based gates (CCNet/LLaMA's fastText wiki classifier;
    q19's heuristics are the rule tier, this is the model tier).
    Weights here are fixed md5-derived constants so the whole model
    is engine-replayable; swapping in really-learned weights changes
    only the constant array.

    Determinism across engines: weights are INTEGER milli-units and
    the per-doc aggregation sums integers (exact, order-free); the
    single float division + sigmoid happen once per doc on identical
    inputs, and the score is rounded. No float is ever summed.

    Scale shape: explode → one narrow (id, bucket-weight) shuffle →
    map-side-combinable sum/count per doc; the weight table is a
    64-entry array literal folded into codegen — no join, no UDF,
    no driver state. Emits (id, n_features, score, label); empty
    docs get NULL score/label (no features to judge).

    ``keep_threshold`` is the calibrated decision boundary — as with
    any deployed classifier it is set on a validation sample (here
    0.44, near the synthetic corpus's score median 0.438 / std
    0.016, so the gate genuinely discriminates; the raw sigmoid
    midpoint 0.5 would reject this corpus wholesale).
    """
    toks = tokens(F.lower(F.col(text_col)))
    # guarded like rouge_n's grams(): a 1-token doc has NO bigrams —
    # the unguarded sequence(0, greatest(size-2, 0)) emitted index
    # [0] even then, double-counting the lone unigram as a phantom
    # bigram (ADVICE r8; the q249/q253 oracles mirror this CASE)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(0), F.size(toks) - 2),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)))
    ).otherwise(F.array().cast("array<string>"))
    grams = F.filter(F.concat(toks, bigrams), lambda g: g != "")
    w_arr = F.array(*[F.lit(w) for w in classifier_weights(n_buckets)])
    ex = df.select(F.col(id_col),
                   F.explode(grams).alias("_g"))
    feat = ex.select(
        id_col,
        F.element_at(w_arr,
                     (hash64(F.col("_g")) % n_buckets + 1)
                     .cast("int")).alias("_w"))
    agg = (feat.groupBy(id_col)
           .agg(F.count("*").alias("n_features"),
                F.sum("_w").alias("_s")))
    z = F.lit(bias) + (F.col("_s") / F.col("n_features")) / F.lit(1000.0)
    scored = agg.select(
        id_col, "n_features",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), round_dp)
        .alias("score"))
    return (df.select(id_col)
            .join(scored, id_col, "left")
            .select(id_col,
                    F.coalesce("n_features", F.lit(0))
                    .alias("n_features"),
                    "score",
                    (F.col("score") >= keep_threshold)
                    .alias("keep")))


#: HTML entity decodes applied by :func:`strip_html`, in order.
#: Literal-only patterns (no class syntax divergence risk); &amp;
#: LAST so freshly-decoded ampersands can't re-combine with following
#: text into a second round of decoding.
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
]


def strip_html(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Markup removal — the FIRST pass of every web-corpus pipeline
    (trafilatura/jusText run structural extraction; this is the
    regex tier that follows or substitutes at scale), in a fixed
    stage order so counts are well-defined:

    1. drop non-content subtrees entirely: ``<script>``/``<style>``
       elements including their text — ``n_dropped_blocks``;
    2. strip remaining tags ``<...>`` (replaced by a space so
       ``a<br>b`` keeps its word boundary) — ``n_tags``;
    3. decode the common entities (HTML_ENTITIES, literal patterns,
       ``&amp;`` last) — ``n_entities``;
    4. collapse whitespace runs + trim.

    All JVM regexps restricted to the Java∩RE2 common syntax (the
    normalize_text discipline) so the DuckDB oracle runs IDENTICAL
    patterns. Emits raw/clean lengths, per-stage counts, and the
    cleaned text's md5 — extraction is hash-checked, not asserted.

    Scale shape: a shuffle-free projection; scan-speed at any corpus
    size, and the cleaned column feeds tokens()/shingles directly.
    """
    t = F.col(text_col)
    # regex-tier limit, documented: script/style bodies without
    # nested markup ([^<]*) — structural extractors handle the rest
    block = ("<script[^>]*>[^<]*</script>"
             "|<style[^>]*>[^<]*</style>")
    s1 = F.regexp_replace(t, block, " ")
    # count the blocks ACTUALLY dropped (the full pattern), not
    # opening tags — a script body containing '<' falls through to
    # the tag-strip stage and must not inflate this count
    n_blocks = F.regexp_count(t, F.lit(block))
    s2 = F.regexp_replace(s1, "<[^>]*>", " ")
    n_tags = F.regexp_count(s1, F.lit("<[^>]*>"))
    s3 = s2
    ent_counts = []
    for pat, rep in HTML_ENTITIES:
        ent_counts.append(F.regexp_count(s3, F.lit(pat)))
        s3 = F.replace(s3, F.lit(pat), F.lit(rep))
    n_entities = ent_counts[0]
    for c in ent_counts[1:]:
        n_entities = n_entities + c
    s4 = F.trim(F.regexp_replace(s3, r"\s+", " "))
    return df.select(
        F.col(id_col),
        F.length(t).alias("raw_len"),
        n_blocks.cast("bigint").alias("n_dropped_blocks"),
        n_tags.cast("bigint").alias("n_tags"),
        n_entities.cast("bigint").alias("n_entities"),
        F.length(s4).alias("clean_len"),
        F.md5(s4).alias("clean_md5"))


def _token_ngrams(col: Column, n: int) -> Column:
    """THE n-gram builder shared by ROUGE-N, sentence BLEU and
    corpus BLEU (review r11 — previously triplicated function-local,
    where a tokenization or guard fix could drift one metric's gram
    definition from the others'): space-joined n-grams over
    ``tokens(lower(col))``; candidates shorter than ``n`` yield an
    EMPTY array (not NULL — a NULL would vanish from explode-based
    counts but also from size() totals inconsistently)."""
    toks = tokens(F.lower(col))
    if n == 1:
        return toks
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.concat_ws(
                        " ", F.slice(toks, i + 1, n)))
    ).otherwise(F.array().cast("array<string>"))


def rouge_n(pairs: DataFrame, id_col: str = "doc_id",
            cand_col: str = "candidate", ref_col: str = "reference",
            round_dp: int = 6) -> DataFrame:
    """ROUGE-1 / ROUGE-2 overlap between a candidate and a reference
    text per row — the standard n-gram summary/eval metric (Lin
    2004), with proper CLIPPED counts: each candidate n-gram credits
    at most its reference multiplicity (multiset intersection), the
    detail naive set-intersection implementations get wrong on
    repeated tokens. Emits precision/recall/F1 per n ∈ {1, 2}.

    Engine determinism: overlaps and totals are integer sums; the
    three float divisions per metric happen once per doc on
    identical operands and round last.

    Scale shape: explode → one (id, gram) count shuffle per side and
    per n, an inner join on (id, gram) — overlap rows only — and a
    per-id sum; no windows, no UDFs, no cross-doc state: eval cost
    is linear in Σ|tokens| however many docs are scored."""
    grams = _token_ngrams

    out = pairs.select(id_col)
    for n in (1, 2):
        def side(col_name: str, alias: str) -> DataFrame:
            return (pairs.select(
                F.col(id_col),
                F.explode_outer(grams(F.col(col_name), n))
                .alias("_g"))
                .groupBy(id_col, "_g")
                .agg(F.count("_g").alias(alias)))

        c = side(cand_col, "_nc")
        r = side(ref_col, "_nr")
        ov = (c.join(r, [id_col, "_g"])
              .groupBy(id_col)
              .agg(F.sum(F.least("_nc", "_nr")).alias("_ov")))
        tot = (pairs.select(
            F.col(id_col),
            F.size(grams(F.col(cand_col), n)).alias("_tc"),
            F.size(grams(F.col(ref_col), n)).alias("_tr")))
        p = F.col("_ov") / F.nullif(F.col("_tc").cast("double"),
                                    F.lit(0.0))
        rr = F.col("_ov") / F.nullif(F.col("_tr").cast("double"),
                                     F.lit(0.0))
        m = (tot.join(ov, id_col, "left")
             .select(id_col,
                     F.coalesce("_ov", F.lit(0)).alias("_ov"),
                     "_tc", "_tr")
             .select(id_col,
                     F.round(p, round_dp).alias(f"rouge{n}_p"),
                     F.round(rr, round_dp).alias(f"rouge{n}_r"),
                     F.round(F.lit(2.0) * p * rr
                             / F.nullif(p + rr, F.lit(0.0)),
                             round_dp).alias(f"rouge{n}_f1")))
        out = out.join(m, id_col)
    return out


def lcs_token_len(cand_col: Column, ref_col: Column) -> Column:
    """Token-level longest-common-subsequence LENGTH between two
    texts (tokens = :func:`tokens` of ``lower(text)``, the rouge_n
    discipline) — the combinatorial core of ROUGE-L, exposed
    separately because its output is an exact INTEGER: engines can't
    diverge on it, so the float metrics built on it can divide once
    per row and round last.

    Why a pandas UDF, against the repo's JVM-first rule: LCS is an
    O(m·n) dynamic program with a loop-carried dependency — no
    built-in higher-order function expresses it, and a SQL recursive
    CTE would materialize the whole DP table as rows. Arrow-batched
    with the inner DP row vectorized in numpy (the standard
    prefix-max formulation: cur = running-max of
    (match ? prev[j-1]+1 : prev[j])), so Python-level work is O(m)
    steps per pair, each an O(n) vector op — same envelope as the
    hyperplane-signature matmul kernel."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # EXACTLY tokens()'s split class (review r9) — the shared
    # module-level compile; see _WS_ASCII
    _ws = _WS_ASCII

    def _lcs_pair(a: str, b: str) -> int:
        ta = [t for t in _ws.split((a or "").lower()) if t]
        tb = [t for t in _ws.split((b or "").lower()) if t]
        if not ta or not tb:
            return 0
        # ints, not strings, inside the DP hot loop
        vocab: dict[str, int] = {}
        ai = np.fromiter((vocab.setdefault(t, len(vocab)) for t in ta),
                         dtype=np.int64, count=len(ta))
        bi = np.fromiter((vocab.get(t, -1) for t in tb),
                         dtype=np.int64, count=len(tb))
        prev = np.zeros(len(tb) + 1, dtype=np.int64)
        for x in ai:
            # tmp[j] = prev[j-1]+1 where match else prev[j]; the
            # running max completes cur[j] = max(tmp[j], cur[j-1])
            tmp = np.where(bi == x, prev[:-1] + 1, prev[1:])
            prev[1:] = np.maximum.accumulate(tmp)
        return int(prev[-1])

    def _lcs(cand: pd.Series, ref: pd.Series) -> pd.Series:
        return pd.Series([_lcs_pair(a, b)
                          for a, b in zip(cand, ref)])

    _lcs.__annotations__ = {"cand": pd.Series, "ref": pd.Series,
                            "return": pd.Series}
    return pandas_udf(_lcs, "long")(cand_col, ref_col)


def rouge_l(pairs: DataFrame, id_col: str = "doc_id",
            cand_col: str = "candidate", ref_col: str = "reference",
            round_dp: int = 6) -> DataFrame:
    """ROUGE-L (Lin 2004 §3): LCS-based candidate/reference overlap —
    the eval metric summarization pipelines reach for first, next to
    the n-gram ROUGE-1/2 of :func:`rouge_n` (VERDICT r8 item 7).
    P = LCS/|cand|, R = LCS/|ref|, F1 harmonic; empty sides get NULL
    metrics (0/0 is undefined, same contract as rouge_n).

    Engine determinism: LCS and the token counts are exact integers
    (:func:`lcs_token_len`); the divisions happen once per row in
    JVM expressions (F.round last) so an oracle replays them
    verbatim — the oracle's job reduces to knowing the LCS, which
    q255 arranges by construction (planted pair families with
    closed-form LCS).

    Scale shape: a shuffle-free projection — one Arrow kernel pass
    over the pair rows plus JVM arithmetic; eval cost is linear in
    Σ(m·n) across pairs with no cross-pair state."""
    m = F.size(tokens(F.lower(F.col(cand_col)))).cast("double")
    n = F.size(tokens(F.lower(F.col(ref_col)))).cast("double")
    lcs = lcs_token_len(F.col(cand_col), F.col(ref_col))
    p = F.col("lcs_len") / F.nullif(F.col("_m"), F.lit(0.0))
    r = F.col("lcs_len") / F.nullif(F.col("_n"), F.lit(0.0))
    return (pairs.select(F.col(id_col), lcs.alias("lcs_len"),
                         m.alias("_m"), n.alias("_n"))
            .select(id_col, "lcs_len",
                    F.round(p, round_dp).alias("rougeL_p"),
                    F.round(r, round_dp).alias("rougeL_r"),
                    F.round(F.lit(2.0) * p * r
                            / F.nullif(p + r, F.lit(0.0)),
                            round_dp).alias("rougeL_f1")))


def levenshtein_token_pair(a: str, b: str) -> int:
    """One (candidate, reference) token-Levenshtein — module-level so
    the Arrow kernel and the property tests share ONE copy of the
    vectorized DP (tests pin it against a textbook full-matrix DP
    over tiny-alphabet sequences; a drifted replica could not).
    The compiled whitespace class lives at module level
    (``_WS_ASCII``) and numpy binds once via the lazy ``_numpy()``
    global — this function runs once per ROW PAIR inside the Arrow
    kernel's loop, so per-call import/compile was measurable
    overhead (ADVICE r10)."""
    np = _numpy()
    ta = [t for t in _WS_ASCII.split((a or "").lower()) if t]
    tb = [t for t in _WS_ASCII.split((b or "").lower()) if t]
    if not ta or not tb:
        return max(len(ta), len(tb))
    vocab: dict[str, int] = {}
    ai = np.fromiter((vocab.setdefault(t, len(vocab)) for t in ta),
                     dtype=np.int64, count=len(ta))
    bi = np.fromiter((vocab.get(t, -1) for t in tb),
                     dtype=np.int64, count=len(tb))
    n = len(tb)
    idx = np.arange(n + 1, dtype=np.int64)
    prev = idx.copy()  # row 0: distance to empty candidate
    for x in ai:
        cost = (bi != x).astype(np.int64)
        # delete (prev[j]+1) / substitute (prev[j-1]+cost) halves
        t = np.minimum(prev[1:] + 1, prev[:-1] + cost)
        base = np.concatenate(([prev[0] + 1], t))
        # fold the insert chain via prefix-min (see docstring)
        prev = np.minimum.accumulate(base - idx) + idx
    return int(prev[-1])


def token_edit_distance(cand_col: Column, ref_col: Column) -> Column:
    """Token-level Levenshtein distance (insert/delete/substitute,
    unit costs) between two texts — the combinatorial core of TER
    (translation edit rate) and the exact-verify refinement of fuzzy
    dedup. Same tokenization discipline as :func:`lcs_token_len`
    (lower + the Java ``\\s`` ASCII class), same reason for an Arrow
    kernel (an O(m·n) loop-carried DP no built-in expresses), and
    the same exact-INTEGER output so engines cannot diverge and the
    float metric divides once per row.

    The inner DP row is fully vectorized: the delete/substitute half
    is elementwise over the previous row; the loop-carried INSERT
    chain ``cur[j] = min(t[j], cur[j-1]+1)`` folds into a prefix-min
    — ``cur = min.accumulate(t - j) + j`` — so Python does O(m)
    steps of O(n) numpy ops per pair, the lcs_token_len envelope."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _lev(cand: pd.Series, ref: pd.Series) -> pd.Series:
        return pd.Series([levenshtein_token_pair(a, b)
                          for a, b in zip(cand, ref)])

    _lev.__annotations__ = {"cand": pd.Series, "ref": pd.Series,
                            "return": pd.Series}
    return pandas_udf(_lev, "long")(cand_col, ref_col)


def ter(pairs: DataFrame, id_col: str = "doc_id",
        cand_col: str = "candidate", ref_col: str = "reference",
        round_dp: int = 6) -> DataFrame:
    """TER — translation edit rate (Snover 2006, minus the shift op:
    plain token edit distance over reference length, the widely
    reported simplification): the generation-eval metric where LOWER
    is better, completing the family (ROUGE-1/2/L, BLEU-4, chrF,
    nDCG, MRR, recall). Empty references get NULL (0/0 undefined,
    the rouge contract); an empty candidate against a non-empty
    reference scores edits = |ref| (all deletions), TER = 1.

    Engine determinism: edits and the reference token count are
    exact integers; ONE division per row, rounded last — the oracle
    only needs to KNOW the edit count, which q274 arranges with
    planted closed-form families (identity = 0; subsequence-drop =
    dropped count, since Levenshtein = |ref| − |cand| when cand is a
    subsequence; disjoint = max(|cand|, |ref|), since distance ≥
    max − LCS and LCS = 0). Adversarial unplanted cases (repeats,
    transpositions, empties) are pinned against a classic
    full-matrix DP in tests."""
    n = F.size(tokens(F.lower(F.col(ref_col)))).cast("double")
    ed = token_edit_distance(F.col(cand_col), F.col(ref_col))
    return (pairs.select(F.col(id_col), ed.alias("edits"),
                         n.alias("_n"))
            .select(id_col, "edits",
                    F.round(F.col("edits")
                            / F.nullif(F.col("_n"), F.lit(0.0)),
                            round_dp).alias("ter")))


def hashed_bow_embedding(text_col: Column, dim: int = 16) -> Column:
    """Deterministic hashed bag-of-words document embedding
    (``array<double>``, length ``dim``): component ``d`` is the sum
    over tokens of an md5-derived integer milli-weight for
    (token, d), divided by 1000 once — the feature-hashing trick
    (Weinberger 2009) with fixed weights, so the whole featurizer is
    engine-replayable the way :func:`classifier_weights` is. Swap in
    a real encoder's vectors and every consumer keeps working; this
    stands in where a pipeline needs text→vector WITHOUT an external
    model (e.g. the q256 embedding admission gate).

    Properties the gate relies on: token-ORDER-invariant (an integer
    sum — a reversed or shuffled document maps to the IDENTICAL
    vector, exactly the near-dup class shingle-based MinHash misses)
    and exact across engines (integer sums, one float division per
    component). Empty docs map to the zero vector, whose cosine is
    NULL under the _usable_norm guard — never a spurious match.

    Scale shape: a shuffle-free projection (nested higher-order
    functions, JVM-side md5); cost O(dim·|tokens|) per doc at scan
    speed."""
    toks = tokens(F.lower(text_col))
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.aggregate(
            toks, F.lit(0).cast("long"),
            lambda acc, t: acc + (hash64(F.concat(t, F.lit(":"),
                                                  d.cast("string")))
                                  % 2001 - 1000)
        ).cast("double") / F.lit(1000.0))


def bleu(pairs: DataFrame, id_col: str = "doc_id",
         cand_col: str = "candidate", ref_col: str = "reference",
         max_n: int = 4, round_dp: int = 6) -> DataFrame:
    """Sentence BLEU-``max_n`` (Papineni 2002) per candidate/reference
    row: modified (CLIPPED) n-gram precisions p1..p4 — each candidate
    n-gram credits at most its reference multiplicity, the same
    multiset discipline as :func:`rouge_n` — brevity penalty
    BP = min(1, e^(1 − r/c)), and BLEU = BP · exp(Σ ln(p_n)/max_n).
    The standard unsmoothed convention: any p_n that is zero or
    undefined (candidate shorter than n) makes BLEU 0.0; an EMPTY
    candidate yields all-NULL metrics (nothing to score). Completes
    the eval family next to ROUGE-1/2 (q251) and ROUGE-L (q255).

    Engine determinism: overlaps and gram counts are exact integers;
    the per-row float chain (4 divisions, ln/exp, one multiply) runs
    once per doc on identical operands in both engines and rounds
    last — the q141/q249 ln/exp-parity precedent.

    Scale shape: per n, two (id, gram) count shuffles + an inner
    overlap join (rouge_n's shape ×4); no windows, no UDFs, no
    cross-doc state — linear in Σ|tokens|."""
    grams = _token_ngrams

    lens = pairs.select(
        F.col(id_col),
        F.size(tokens(F.lower(F.col(cand_col)))).alias("_c"),
        F.size(tokens(F.lower(F.col(ref_col)))).alias("_r"))
    out = lens
    for n in range(1, max_n + 1):
        def side(col_name: str, alias: str) -> DataFrame:
            return (pairs.select(
                F.col(id_col),
                F.explode_outer(grams(F.col(col_name), n))
                .alias("_g"))
                .groupBy(id_col, "_g")
                .agg(F.count("_g").alias(alias)))

        ov = (side(cand_col, "_nc").join(side(ref_col, "_nr"),
                                         [id_col, "_g"])
              .groupBy(id_col)
              .agg(F.sum(F.least("_nc", "_nr")).alias(f"_ov{n}")))
        tot = pairs.select(
            F.col(id_col),
            F.size(grams(F.col(cand_col), n)).alias(f"_tc{n}"))
        out = (out.join(tot, id_col)
               .join(ov, id_col, "left")
               .withColumn(f"_ov{n}",
                           F.coalesce(f"_ov{n}", F.lit(0))))
    ps = [F.col(f"_ov{n}")
          / F.nullif(F.col(f"_tc{n}").cast("double"), F.lit(0.0))
          for n in range(1, max_n + 1)]
    bp = F.when(F.col("_c") >= F.col("_r"), F.lit(1.0)).otherwise(
        F.exp(F.lit(1.0) - F.col("_r") / F.col("_c").cast("double")))
    any_dead = F.lit(False)
    logsum = F.lit(0.0)
    for p in ps:
        any_dead = any_dead | p.isNull() | (p == 0.0)
        logsum = logsum + F.log(p)
    score = F.when(F.col("_c") == 0, F.lit(None).cast("double")) \
        .when(any_dead, F.lit(0.0)) \
        .otherwise(bp * F.exp(logsum / F.lit(float(max_n))))
    cols = [F.col(id_col)]
    cols += [F.round(F.when(F.col("_c") == 0, F.lit(None)
                            .cast("double")).otherwise(p),
                     round_dp).alias(f"p{n}")
             for n, p in enumerate(ps, 1)]
    cols += [F.round(F.when(F.col("_c") == 0,
                            F.lit(None).cast("double")).otherwise(bp),
                     round_dp).alias("bp"),
             F.round(score, round_dp).alias("bleu")]
    return out.select(*cols)


def _pooled_clip_totals(base: DataFrame, refs_ex: DataFrame,
                        cand_grams, ref_grams,
                        max_n: int) -> DataFrame:
    """Corpus-pooled multi-reference clipped totals for ALL orders in
    ONE pass (VERDICT r12 item 3 — the round-10 :func:`chrf` fold
    applied to the corpus metrics): returns ONE row with columns
    ``_ov{n}/_tc{n}/_tr{n}`` for n ∈ 1..``max_n`` —

    - _tc: pooled candidate gram total,
    - _tr: pooled max-over-references multiset total,
    - _ov: pooled clipped overlap Σ least(cand count, max ref count).

    ``cand_grams(n)`` / ``ref_grams(n)`` are array<string> gram
    expressions over ``base`` (_id, …) / ``refs_ex`` (_id, _ri, …).

    Shape: ONE explode emitting (n, g) structs for every order of
    both sides (candidate rows ride _ri = −1) → one
    (_id, n, g, _ri) count shuffle → one (_id, n, g) fold (sum the
    candidate counts, MAX the per-reference counts — the
    multi-reference clip) → one GLOBAL conditional aggregate
    (map-side-combined, no keyed shuffle) pooling every order at
    once. Replaces the previous per-order loop's 3·max_n gram
    shuffles + max_n overlap joins; gram strings shuffle once.
    Byte-identical pooled integers by construction: a gram on one
    side only contributes least(x, 0) = 0, exactly the old
    inner-join-then-clip; every quantity stays int64 until the
    caller's final float chain."""
    def tag(n: int):
        # single-arg lambda ON PURPOSE (the chrf lesson): a 2-arg
        # transform lambda gets (element, INDEX) and the index would
        # shadow the order
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))

    cstructs = F.flatten(F.array(
        *[F.transform(cand_grams(n), tag(n))
          for n in range(1, max_n + 1)]))
    rstructs = F.flatten(F.array(
        *[F.transform(ref_grams(n), tag(n))
          for n in range(1, max_n + 1)]))
    rows = (base.select("_id", F.lit(-1).alias("_ri"),
                        F.lit(1).alias("_c"),
                        F.explode(cstructs).alias("_e"))
            .unionByName(
                refs_ex.select("_id", "_ri",
                               F.lit(0).alias("_c"),
                               F.explode(rstructs).alias("_e")))
            .select("_id", "_ri", "_c", "_e.n", "_e.g"))
    lvl1 = (rows.groupBy("_id", "n", "g", "_ri")
            .agg(F.sum("_c").alias("_ncj"),
                 F.sum(1 - F.col("_c")).alias("_nrj")))
    lvl2 = (lvl1.groupBy("_id", "n", "g")
            .agg(F.sum("_ncj").alias("_nc"),
                 F.max("_nrj").alias("_nr")))
    aggs = []
    for n in range(1, max_n + 1):
        cond = F.col("n") == n
        aggs += [
            F.coalesce(F.sum(F.when(cond, F.least("_nc", "_nr"))),
                       F.lit(0)).alias(f"_ov{n}"),
            F.coalesce(F.sum(F.when(cond, F.col("_nc"))),
                       F.lit(0)).alias(f"_tc{n}"),
            F.coalesce(F.sum(F.when(cond, F.col("_nr"))),
                       F.lit(0)).alias(f"_tr{n}")]
    return lvl2.agg(*aggs)


def corpus_bleu(pairs: DataFrame, id_col: str = "doc_id",
                cand_col: str = "candidate",
                refs_col: str = "references",
                max_n: int = 4, round_dp: int = 6) -> DataFrame:
    """Corpus-level MULTI-REFERENCE BLEU-``max_n`` (Papineni 2002 as
    WMT reports it — VERDICT r10 item 6), completing :func:`bleu`:

    - **multi-reference clip**: each candidate n-gram credits at
      most the MAX of its multiplicities across the ``refs_col``
      array's references (sentence bleu clips against its one
      reference);
    - **corpus pooling**: clipped overlaps and candidate gram
      totals SUM ACROSS THE CORPUS before the precision ratio —
      p_n = Σov_n / Σtc_n, NOT a mean of per-sentence ratios (the
      difference is exactly why one all-miss candidate dilutes
      corpus BLEU instead of zeroing its row);
    - **corpus brevity**: c = Σ|cand|, r = Σ per-candidate
      EFFECTIVE reference length — the closest |ref| to |cand|,
      ties to the SHORTER (the sacrebleu convention);
      BP = min(1, e^(1−r/c));
    - the standard unsmoothed convention: any pooled p_n = 0 ⇒
      BLEU 0.0; an empty corpus candidate side (c = 0) ⇒ NULL
      metrics;
    - a pair with NO usable reference (empty ``refs_col`` array,
      or only NULL entries) is EXCLUDED from the corpus entirely —
      n_pairs, lengths, overlaps AND candidate-gram totals (review
      r11: an unscoreable candidate must not deflate the pooled
      precisions its references can never credit).

    Returns ONE row: (n_pairs, c_len, r_len, p1..p_max_n, bp, bleu).

    Engine determinism: every pooled quantity is an exact int64 sum
    (counts and lengths — no float accumulates across rows, so
    partition merge order cannot flip a bit); the float chain (4
    divisions, ln/exp, one multiply) runs ONCE on the final scalars
    and rounds last — replayed generically in SQL (q278).

    Scale shape (round 13, VERDICT r12 item 3): ONE explode emitting
    (n, gram) structs for all ``max_n`` orders of both sides →
    :func:`_pooled_clip_totals`'s two count shuffles + one global
    conditional aggregate — replacing the previous per-order loop
    (2·max_n gram shuffles + max_n overlap joins); the single-row
    tails join as 1×1 cross joins (the q268 scalar pattern). No
    windows except the per-id effective-length argmin, expressed as
    min(struct) — also combinable. Linear in
    Σ|tokens|·|references|."""
    grams = _token_ngrams

    # drop NULL references, then EXCLUDE pairs left with none — so
    # every sum below (lengths, overlaps, gram totals) ranges over
    # exactly the scoreable pairs (review r11; the clen↔eff inner
    # join previously dropped such pairs from the lengths while
    # their grams still inflated tc_n)
    base = (pairs.select(F.col(id_col).alias("_id"),
                         F.col(cand_col).alias("_cand"),
                         F.filter(F.col(refs_col),
                                  lambda r: r.isNotNull())
                         .alias("_refs"))
            .where(F.size("_refs") > 0))
    clen = base.select(
        "_id", F.size(tokens(F.lower(F.col("_cand")))).alias("_c"))
    refs_ex = base.select(
        "_id", F.posexplode("_refs").alias("_ri", "_rt"))
    rlen = refs_ex.select(
        "_id", F.size(tokens(F.lower(F.col("_rt")))).alias("_rl"))
    # closest-|ref| effective length, ties to the shorter:
    # lexicographic struct-min = (smallest |Δ|, then smallest len)
    eff = (rlen.join(clen, "_id")
           .groupBy("_id")
           .agg(F.min(F.struct(
               F.abs(F.col("_rl") - F.col("_c")).alias("_d"),
               F.col("_rl").alias("_l"))).alias("_m"))
           .select("_id", F.col("_m._l").alias("_r")))
    # coalesce the pooled length sums: on a corpus with NO scoreable
    # pair, sum over zero rows is NULL and the `empty` (_C == 0)
    # guard would never fire — the any_dead branch would then emit
    # bleu = 0.0 with NULL lengths while the oracle's
    # coalesce(sum(c), 0) chain returns NULL metrics (ADVICE r11)
    out = (clen.join(eff, "_id")
           .agg(F.count("*").alias("n_pairs"),
                F.coalesce(F.sum("_c"), F.lit(0)).alias("_C"),
                F.coalesce(F.sum("_r"), F.lit(0)).alias("_R")))
    out = out.crossJoin(_pooled_clip_totals(
        base, refs_ex,
        lambda n: grams(F.col("_cand"), n),
        lambda n: grams(F.col("_rt"), n), max_n))
    ps = [F.col(f"_ov{n}").cast("double")
          / F.nullif(F.col(f"_tc{n}").cast("double"), F.lit(0.0))
          for n in range(1, max_n + 1)]
    bp = F.when(F.col("_C") >= F.col("_R"), F.lit(1.0)).otherwise(
        F.exp(F.lit(1.0)
              - F.col("_R") / F.col("_C").cast("double")))
    any_dead = F.lit(False)
    logsum = F.lit(0.0)
    for p in ps:
        any_dead = any_dead | p.isNull() | (p == 0.0)
        logsum = logsum + F.log(p)
    empty = F.col("_C") == 0
    score = F.when(empty, F.lit(None).cast("double")) \
        .when(any_dead, F.lit(0.0)) \
        .otherwise(bp * F.exp(logsum / F.lit(float(max_n))))
    cols = [F.col("n_pairs"), F.col("_C").alias("c_len"),
            F.col("_R").alias("r_len")]
    cols += [F.round(F.when(empty, F.lit(None).cast("double"))
                     .otherwise(p), round_dp).alias(f"p{n}")
             for n, p in enumerate(ps, 1)]
    cols += [F.round(F.when(empty, F.lit(None).cast("double"))
                     .otherwise(bp), round_dp).alias("bp"),
             F.round(score, round_dp).alias("bleu")]
    return out.select(*cols)


def corpus_chrf(pairs: DataFrame, id_col: str = "doc_id",
                cand_col: str = "candidate",
                refs_col: str = "references",
                max_n: int = 6, beta: float = 2.0,
                round_dp: int = 6) -> DataFrame:
    """Corpus-level MULTI-REFERENCE chrF (VERDICT r11 item 3),
    completing :func:`chrf` the way :func:`corpus_bleu` completed
    :func:`bleu` — WMT reports chrF pooled over the corpus, not a
    mean of sentence scores:

    - **multi-reference clip**: each candidate character n-gram
      credits at most the MAX of its multiplicities across the
      ``refs_col`` array (the corpus_bleu max-clip discipline);
      the recall denominator is the same MAX-MULTISET's size — the
      union-of-references multiset the clip already defines, so
      precision and recall read off one consistent reference side
      (documented choice; implementations vary here);
    - **corpus pooling**: clipped overlaps, candidate totals and
      max-multiset totals SUM ACROSS THE CORPUS before the per-order
      ratios — chrP/chrR are means over orders of POOLED ratios, a
      zero-gram order contributing 0 with the denominator staying
      ``max_n`` (the :func:`chrf` convention, applied corpus-wide);
    - chrF = (1+β²)·P·R / (β²·P + R), β = 2, 0 when both sides die;
    - a pair with NO usable reference (empty array or only NULLs)
      is EXCLUDED from every pooled quantity (the corpus_bleu
      exclusion rule); a corpus with NO scoreable pair emits
      n_pairs 0, zero char totals and NULL metrics (the pooled sums
      are coalesced to 0 so the empty guard actually fires —
      the ADVICE r11 corpus_bleu lesson, applied from birth).

    Returns ONE row: (n_pairs, c_chars, r_chars, chrf_p, chrf_r,
    chrf) — c_chars/r_chars are the pooled order-1 totals (exact
    char counts of the stripped candidate / max-multiset sides).

    Engine determinism: every pooled quantity is an exact int64 sum;
    the float chain (2·max_n divisions, two means, one F-beta) runs
    ONCE on the final scalars and rounds last — generically
    SQL-replayable (q287).

    Scale shape (round 13, VERDICT r12 item 3): ONE explode emitting
    (n, gram) structs for all ``max_n`` orders of both sides →
    :func:`_pooled_clip_totals`'s two count shuffles + one global
    conditional aggregate — replacing the previous per-order loop
    (3·max_n gram shuffles + max_n overlap joins); single-row tails
    join as 1×1 cross joins. Linear in Σ chars·|references|·max_n,
    the gram strings shuffled once."""
    def strip(col: Column) -> Column:
        return F.regexp_replace(F.lower(col), CHRF_WS, "")

    def grams(src: str, n: int) -> Column:
        return F.when(
            F.length(F.col(src)) >= n,
            F.expr(f"transform(sequence(1, length({src}) - {n - 1}),"
                   f" i -> substring({src}, i, {n}))")
        ).otherwise(F.array().cast("array<string>"))

    base = (pairs.select(F.col(id_col).alias("_id"),
                         strip(F.col(cand_col)).alias("_cc"),
                         F.filter(F.col(refs_col),
                                  lambda r: r.isNotNull())
                         .alias("_refs"))
            .where(F.size("_refs") > 0))
    refs_ex = (base.select(
        "_id", F.posexplode("_refs").alias("_ri", "_rt"))
        .select("_id", "_ri", strip(F.col("_rt")).alias("_rc")))
    out = (base.agg(F.count("*").alias("n_pairs"))
           .crossJoin(_pooled_clip_totals(
               base, refs_ex,
               lambda n: grams("_cc", n),
               lambda n: grams("_rc", n), max_n)))
    psum, rsum = F.lit(0.0), F.lit(0.0)
    for n in range(1, max_n + 1):
        psum = psum + F.when(
            F.col(f"_tc{n}") > 0,
            F.col(f"_ov{n}") / F.col(f"_tc{n}").cast("double")
        ).otherwise(F.lit(0.0))
        rsum = rsum + F.when(
            F.col(f"_tr{n}") > 0,
            F.col(f"_ov{n}") / F.col(f"_tr{n}").cast("double")
        ).otherwise(F.lit(0.0))
    p = psum / F.lit(float(max_n))
    r = rsum / F.lit(float(max_n))
    b2 = beta * beta
    f_ = F.coalesce(F.lit(1.0 + b2) * p * r
                    / F.nullif(F.lit(b2) * p + r, F.lit(0.0)),
                    F.lit(0.0))
    empty = F.col("n_pairs") == 0
    return out.select(
        "n_pairs",
        F.col("_tc1").alias("c_chars"),
        F.col("_tr1").alias("r_chars"),
        F.round(F.when(empty, F.lit(None).cast("double"))
                .otherwise(p), round_dp).alias("chrf_p"),
        F.round(F.when(empty, F.lit(None).cast("double"))
                .otherwise(r), round_dp).alias("chrf_r"),
        F.round(F.when(empty, F.lit(None).cast("double"))
                .otherwise(f_), round_dp).alias("chrf"))


def corpus_ter(pairs: DataFrame, id_col: str = "doc_id",
               cand_col: str = "candidate",
               refs_col: str = "references",
               round_dp: int = 6) -> DataFrame:
    """Corpus-level MULTI-REFERENCE TER (VERDICT r11 item 3),
    completing :func:`ter` the way :func:`corpus_bleu` completed
    :func:`bleu` — tercom pools edit counts over the corpus:

    - **best reference**: per pair, the reference minimizing the
      token edit distance is chosen; ties go to the SHORTER
      reference (one lexicographic struct-min on exact ints — the
      corpus_bleu effective-length discipline);
    - **corpus pooling**: TER = Σ edits / Σ chosen-reference
      lengths — both exact int64 sums, ONE division at the end
      (NOT a mean of per-pair rates: a long segment weighs more,
      which is the point of corpus TER);
    - a pair with NO usable reference is EXCLUDED from n_pairs and
      both sums (the corpus_bleu rule); Σ ref-length = 0 (empty
      corpus, or every chosen reference empty) ⇒ NULL ter (0/0),
      with the pooled sums coalesced so the output row always
      exists.

    Returns ONE row: (n_pairs, edits, ref_len, ter).

    The kernel is the general O(m·n) Arrow-vectorized DP
    (:func:`token_edit_distance`) — it cannot see any planting; the
    q288 oracle knows its planted families' edit counts in closed
    form (the q274 pattern), and unplanted adversarial cases pin
    against a classic full-matrix DP in tests."""
    base = (pairs.select(F.col(id_col).alias("_id"),
                         F.col(cand_col).alias("_cand"),
                         F.filter(F.col(refs_col),
                                  lambda r: r.isNotNull())
                         .alias("_refs"))
            .where(F.size("_refs") > 0))
    per_ref = (base.select(
        "_id", "_cand", F.posexplode("_refs").alias("_ri", "_rt"))
        .select("_id",
                token_edit_distance(F.col("_cand"), F.col("_rt"))
                .alias("_e"),
                F.size(tokens(F.lower(F.col("_rt")))).alias("_rl")))
    best = (per_ref.groupBy("_id")
            .agg(F.min(F.struct(F.col("_e").alias("e"),
                                F.col("_rl").alias("l")))
                 .alias("_m"))
            .select("_id", F.col("_m.e").alias("_e"),
                    F.col("_m.l").alias("_rl")))
    return (best.agg(F.count("*").alias("n_pairs"),
                     F.coalesce(F.sum("_e"), F.lit(0))
                     .alias("edits"),
                     F.coalesce(F.sum("_rl"), F.lit(0))
                     .alias("ref_len"))
            .select("n_pairs", "edits", "ref_len",
                    F.round(F.col("edits")
                            / F.nullif(F.col("ref_len")
                                       .cast("double"), F.lit(0.0)),
                            round_dp).alias("ter")))


#: chrF's whitespace STRIP SET, pinned to one explicit class shared
#: by the Spark kernel, the DuckDB oracle builder
#: (suite_pipeline.chrf_chain_sql callers) and the engine-parity
#: tests — Java's ``\s`` includes vertical tab while RE2's does not,
#: so the class must be a single constant, never re-typed (ADVICE r9
#: + self-review r10). The same escape syntax parses identically in
#: Java regex, RE2 and Python ``re``.
CHRF_WS = "[ \\t\\n\\x0B\\f\\r]+"


def chrf(pairs: DataFrame, id_col: str = "doc_id",
         cand_col: str = "candidate", ref_col: str = "reference",
         max_n: int = 6, beta: float = 2.0,
         round_dp: int = 6) -> DataFrame:
    """chrF (Popović 2015): character n-gram F-score — the
    tokenization-free eval metric that complements BLEU (q258) and
    ROUGE (q251/q255); robust to morphology and whitespace choices
    because it scores CHARACTERS of the whitespace-stripped lowered
    text. Per order n ∈ 1..``max_n``: clipped multiset overlap of
    character n-grams (the rouge_n/bleu discipline); chrP/chrR are
    the MEANS of the per-order precisions/recalls, and
    chrF = (1+β²)·P·R / (β²·P + R) with β = 2 (recall-weighted).

    Defined semantics (engine-replayable, documented where
    implementations vary): an order whose candidate (resp.
    reference) has ZERO n-grams contributes precision (resp. recall)
    0 to the mean — the denominator stays ``max_n``; a pair whose
    candidate or reference is EMPTY gets NULL metrics. Integer
    overlaps/totals throughout; the float chain (2·max_n divisions,
    two means, one F-beta) runs once per row and rounds last. The
    whitespace STRIP SET is pinned to the explicit class
    ``[ \\t\\n\\x0B\\f\\r]`` on both engines (ADVICE r9): Java's
    ``\\s`` includes vertical tab while RE2's does not, so a bare
    ``\\s+`` would diverge on a document containing ``\\x0B``.

    Scale shape (round 10, VERDICT r9 item 4): ONE explode emitting
    (id, n, gram, side) for all ``max_n`` orders of both sides →
    one (id, n, gram) count shuffle → one (id, n) fold → one (id)
    conditional-aggregation pivot joined back to the lengths —
    replacing the previous 12 per-order gram shuffles + 12 re-joins;
    grams are ≤ ``max_n``-char strings, so shuffle bytes ≈
    2·max_n × the text itself, paid once."""
    def chars(col: Column) -> Column:
        return F.regexp_replace(F.lower(col), CHRF_WS, "")

    # named intermediates: the expr-based gram builder needs columns
    base = pairs.select(
        F.col(id_col), chars(F.col(cand_col)).alias("_cc"),
        chars(F.col(ref_col)).alias("_rc"))

    def tag(n: int, flag: int):
        # single-arg lambda ON PURPOSE: a 2-arg transform lambda gets
        # (element, INDEX) and the index would shadow the order
        return lambda g: F.struct(F.lit(n).alias("n"),
                                  g.alias("g"),
                                  F.lit(flag).alias("c"))

    def side_structs(src: str, flag: int) -> list[Column]:
        out = []
        for n in range(1, max_n + 1):
            grams = F.when(
                F.length(F.col(src)) >= n,
                F.expr(f"transform(sequence(1,"
                       f" length({src}) - {n - 1}),"
                       f" i -> substring({src}, i, {n}))")
            ).otherwise(F.array().cast("array<string>"))
            out.append(F.transform(grams, tag(n, flag)))
        return out

    allg = F.flatten(F.array(*(side_structs("_cc", 1)
                               + side_structs("_rc", 0))))
    counts = (base.select(F.col(id_col), F.explode(allg).alias("_e"))
              .select(id_col, "_e.n", "_e.g", "_e.c")
              .groupBy(id_col, "n", "g")
              .agg(F.sum("c").alias("_nc"),
                   F.sum(1 - F.col("c")).alias("_nr")))
    # clipped overlap per gram = min(cand count, ref count); a gram
    # on one side only contributes least(x, 0) = 0 — identical to
    # the inner-join-then-clip formulation, without the join
    per_order = (counts.groupBy(id_col, "n")
                 .agg(F.sum("_nc").alias("_tc"),
                      F.sum("_nr").alias("_tr"),
                      F.sum(F.least("_nc", "_nr")).alias("_ov")))
    wide_cols = []
    for n in range(1, max_n + 1):
        for src in ("_ov", "_tc", "_tr"):
            wide_cols.append(F.coalesce(
                F.max(F.when(F.col("n") == n, F.col(src))),
                F.lit(0)).alias(f"{src}{n}"))
    wide = per_order.groupBy(id_col).agg(*wide_cols)
    lens = base.select(id_col,
                       F.length("_cc").alias("_lc"),
                       F.length("_rc").alias("_lr"))
    out = lens.join(wide, id_col, "left")
    for n in range(1, max_n + 1):
        for src in ("_ov", "_tc", "_tr"):
            out = out.withColumn(f"{src}{n}",
                                 F.coalesce(f"{src}{n}", F.lit(0)))
    # per-order P/R with the zero convention; means over max_n
    psum = F.lit(0.0)
    rsum = F.lit(0.0)
    for n in range(1, max_n + 1):
        psum = psum + F.when(
            F.col(f"_tc{n}") > 0,
            F.col(f"_ov{n}") / F.col(f"_tc{n}").cast("double")
        ).otherwise(F.lit(0.0))
        rsum = rsum + F.when(
            F.col(f"_tr{n}") > 0,
            F.col(f"_ov{n}") / F.col(f"_tr{n}").cast("double")
        ).otherwise(F.lit(0.0))
    p = psum / F.lit(float(max_n))
    r = rsum / F.lit(float(max_n))
    b2 = beta * beta
    f_ = F.lit(1.0 + b2) * p * r \
        / F.nullif(F.lit(b2) * p + r, F.lit(0.0))
    empty = (F.col("_lc") == 0) | (F.col("_lr") == 0)
    return out.select(
        F.col(id_col),
        F.round(F.when(~empty, p), round_dp).alias("chrf_p"),
        F.round(F.when(~empty, r), round_dp).alias("chrf_r"),
        F.round(F.when(~empty, F.coalesce(f_, F.lit(0.0))),
                round_dp).alias("chrf"))
