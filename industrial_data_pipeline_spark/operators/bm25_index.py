"""Persisted BM25 (Okapi) lexical index — the STORED-asset
counterpart of :func:`~.text.bm25_topk`, completing the stored
retrieval family (text MinHash-LSH bands, embedding signatures, IVF
cells) with the sparse leg every production hybrid-RAG retriever
ships. q233 computes BM25 in-plan per run (the whole corpus
re-tokenizes on every probe); this persists the posting lists once
and probes them pruned, the q242/q248/q259 promotion applied to
lexical retrieval.

Layout under ``root/``::

    _bm25_meta.json    {id_col, text_col, n_buckets, k1, b,
                        max_records_per_file}
    postings/_epoch=<e>/_tb=<b>/   (parquet) term string,
                        doc_id long, tf long, dl long,
                        pos array<int> (0-based token positions,
                        sorted — read ONLY by phrase_probe; BM25
                        probes column-prune it away) —
                        files (term, doc_id)-sorted
    doclen/_epoch=<e>/ (parquet) doc_id long, dl long —
                        doc_id-sorted

Pruning: probe terms are driver-known strings, so their bucket ids
compute DRIVER-SIDE through the same md5-based portable hash the
write path uses — the postings scan lists only the probed buckets'
partition directories (file-level pruning, the IVF-cell discipline
on a hashed key) and pushes the term IN-list into row groups of the
term-sorted files. ``dl`` is DENORMALIZED into the posting rows
(the classic impact-postings trade: ~8 bytes/posting buys scoring
that never joins the doclen asset); doclen exists for the (N,
avgdl) scalar aggregate — one map-side-combinable pass over 2-long
rows — and for retraction symmetry.

Lifecycle contract shared with the other three index classes:
``append(epoch_id=N)`` is exactly-once under micro-batch retries
(dynamic overwrite of the epoch's partitions), ``probe`` takes
``exclude_epoch`` (in-flight retry hygiene) and ``as_of_epoch``
(time-travel via the ``_epoch <= N`` partition filter), and
``compact``/``retract`` rewrite BOTH assets through the ONE shared
:func:`~.lsh_index.rewrite_under_lease` fenced-swap protocol.

Stats semantics, stated: N, avgdl and per-term df are computed over
the SCANNED corpus at probe time (all epochs the filters admit) —
append moves them exactly as re-running q233 over the grown corpus
would, so a stored probe is byte-identical to
:func:`~.text.bm25_topk` over the CONCATENATION of the scanned
epochs' batches (q293 pins it by reusing q233's oracle SQL shape).
That parity holds even for a doc_id re-appended in a later epoch
(ADVICE r12): the probe re-aggregates postings by (term, doc_id,
dl) summing tf across epochs BEFORE df and saturation, exactly as
bm25_topk's (_id, _t, _dl) grouping merges the duplicated rows —
tf merges when dl is equal, stays split when the re-appended text
changed dl, and N/avgdl count the doc once per appended row on
both sides. (De-duplicating the doc itself remains the ingest
pipeline's job, the per-epoch-dedup contract every asset shares.)

Tokenization: pass an :class:`~.analyzer.Analyzer` to compose the
normalize→extract→stopword→stem pipeline into build, probe AND the
driver-side query tokenization (one shared function, VERDICT r12
item 1); ``analyzer=None`` keeps the legacy lower()+whitespace
tokenizer byte-for-byte. The choice persists in the index meta so
``open()`` can never probe with a different tokenization than the
build wrote.

Reference parity note: the reference's only text search is a
full-scan LIKE (database.py lookup path); this is its corpus-scale
ranked counterpart with a persisted index.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from industrial_data_pipeline_spark.operators.analyzer import Analyzer
from industrial_data_pipeline_spark.operators.lsh_index import (
    _count_parquet_files, rewrite_under_lease)
from industrial_data_pipeline_spark.operators.text import (
    hash64, tokens)


def py_hash64(s: str) -> int:
    """Driver-side twin of :func:`~.text.hash64` (portable 60-bit
    md5 prefix) — MUST stay bit-identical to the Spark expression
    (``conv(substring(md5(c), 1, 15), 16, 10)``) or probe-side
    bucket pruning would silently look in the wrong partitions
    (results would NOT be wrong — the term IN-list still filters —
    they would be EMPTY, which is worse than slow). Pinned against
    the Spark expression in tests."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


class StoredBm25Index:
    """See module docstring."""

    #: base schemas; doc-level metadata columns (``extra_schema``)
    #: are DENORMALIZED into both assets — the dl trade again: a few
    #: dictionary-encoded bytes per posting buy a filtered probe
    #: whose label equality pushes into the parquet scan with no
    #: join (the StoredIvfIndex extra_schema discipline)
    POSTINGS_SCHEMA = ("term string, doc_id long, tf long, dl long,"
                       " pos array<int>, _epoch int, _tb int")
    DOCLEN_SCHEMA = "doc_id long, dl long, _epoch int"

    #: storage schema generation this code WRITES: 2 = positional
    #: postings (the ``pos`` column). Version 1 (pre-positions
    #: indexes, whose meta has no ``schema_version`` key) still
    #: opens and BM25-probes fine — but :meth:`phrase_probe` REFUSES
    #: it (ADVICE r13: the missing pos column reads as NULL,
    #: collect_list skips NULLs, and every doc yields an empty
    #: position array — a silent all-miss indistinguishable from a
    #: genuine no-match).
    SCHEMA_VERSION = 2

    def __init__(self, spark: SparkSession, root: str,
                 id_col: str = "doc_id", text_col: str = "text",
                 n_buckets: int = 16, k1: float = 1.2,
                 b: float = 0.75,
                 max_records_per_file: int | None = None,
                 analyzer: Analyzer | None = None,
                 extra_schema: str | None = None,
                 schema_version: int | None = None):
        self.spark = spark
        self.root = root
        self.id_col = id_col
        self.text_col = text_col
        self.n_buckets = int(n_buckets)
        self.k1 = float(k1)
        self.b = float(b)
        self.max_records_per_file = max_records_per_file
        self.analyzer = analyzer
        self.extra_schema = extra_schema
        self.schema_version = (self.SCHEMA_VERSION
                               if schema_version is None
                               else int(schema_version))
        self._postings_path = os.path.join(root, "postings")
        self._doclen_path = os.path.join(root, "doclen")
        #: observability: the pruned postings scan of the LAST probe
        #: (BEFORE joins consume it) — tests assert its
        #: PartitionFilters/PushedFilters carry the bucket + term
        #: pruning this class exists for
        self.last_postings_scan: DataFrame | None = None

    def _extra_entries(self) -> list[str]:
        """``extra_schema`` split into "name type" entries (top-level
        comma split — the StoredIvfIndex.extra_cols rule, safe for
        nested types)."""
        if not self.extra_schema:
            return []
        out, depth, cur = [], 0, []
        for ch in self.extra_schema:
            if ch == "," and depth == 0:
                out.append("".join(cur))
                cur = []
                continue
            if ch in "<(":
                depth += 1
            elif ch in ">)":
                depth -= 1
            cur.append(ch)
        out.append("".join(cur))
        return [c.strip() for c in out if c.strip()]

    @property
    def extra_cols(self) -> list[str]:
        return [e.split()[0] for e in self._extra_entries()]

    def _extra_type(self, col: str) -> str:
        for e in self._extra_entries():
            name, typ = e.split(None, 1)
            if name == col:
                return typ
        raise ValueError(f"filter_col {col!r} not among stored "
                         f"extra_schema columns {self.extra_cols}")

    def _schemas(self) -> tuple[str, str]:
        """(postings, doclen) read schemas with the extra columns
        spliced in before the partition columns."""
        extra = f", {self.extra_schema}" if self.extra_schema else ""
        p = self.POSTINGS_SCHEMA.replace(
            ", _epoch int", f"{extra}, _epoch int")
        d = self.DOCLEN_SCHEMA.replace(
            ", _epoch int", f"{extra}, _epoch int")
        return p, d

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.root, "_bm25_meta.json")

    def _write_meta(self) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"id_col": self.id_col,
                       "text_col": self.text_col,
                       "n_buckets": self.n_buckets,
                       "k1": self.k1, "b": self.b,
                       "max_records_per_file":
                           self.max_records_per_file,
                       "analyzer":
                           (self.analyzer.to_meta()
                            if self.analyzer else None),
                       "extra_schema": self.extra_schema,
                       "schema_version": self.schema_version}, fh)
        os.replace(tmp, self._meta_path)

    @classmethod
    def open(cls, spark: SparkSession,
             root: str) -> "StoredBm25Index":
        with open(f"{root}/_bm25_meta.json") as fh:
            meta = json.load(fh)
        return cls(spark, root, id_col=meta["id_col"],
                   text_col=meta["text_col"],
                   n_buckets=meta["n_buckets"], k1=meta["k1"],
                   b=meta["b"],
                   max_records_per_file=meta.get(
                       "max_records_per_file"),
                   analyzer=Analyzer.from_meta(
                       meta.get("analyzer")),
                   extra_schema=meta.get("extra_schema"),
                   # absent key = a pre-positions (v1) index: BM25
                   # probes unaffected, phrase probes refused
                   schema_version=meta.get("schema_version", 1))

    # ---------------------------------------------------- lifecycle

    def _tokenize(self, col) -> "F.Column":
        """The ONE tokenization expression — build and probe_frames
        MUST share it (a probe analyzed differently from the build
        silently retrieves nothing)."""
        if self.analyzer is not None:
            return self.analyzer.spark(col)
        return tokens(F.lower(F.col(col) if isinstance(col, str)
                              else col))

    def _tokenize_py(self, s: str) -> list[str]:
        """Driver-side twin of :meth:`_tokenize` for probe query
        strings (the py_hash64 discipline, applied to terms)."""
        if self.analyzer is not None:
            return self.analyzer.py(s)
        return s.lower().split()

    def _frames(self, corpus: DataFrame,
                durable: bool = False) -> tuple:
        """(postings, doclen) of a document batch — postings carry
        the denormalized dl; the term bucket is the portable hash
        mod n_buckets (pmod unnecessary: hash64 is a non-negative
        60-bit value).

        The tokenized frame is MATERIALIZED (eager localCheckpoint)
        before the two asset writes derive from it (optimization r14,
        guide §1.2/§2.4): un-materialized, the tokenization ran THREE
        times per build — once inside the postings write's groupBy
        map stage, and twice for the doclen write (the
        repartitionByRange boundary-sampling job executes the full
        child plan, and doclen has no shuffle below the range
        exchange to reuse) — and twice more per append. One pass is
        fundamental; the checkpoint costs one batch/corpus-sized
        local-disk materialization, the same magnitude as the shuffle
        the write performs anyway, and every downstream job (both
        writes AND their sampling passes) re-reads local blocks
        instead of re-tokenizing. Measured: q304's bm25
        build+2-append lifecycle 6.9 s → see OPTIMIZATION_r14.md.

        ``durable`` (optimization r15, VERDICT r14 item 3): build
        passes True — the corpus-sized frame is a DISK_ONLY persist
        with lineage kept (executor loss recomputes; the caller
        unpersists) — while micro-batch appends keep the cheaper
        localCheckpoint per the materialize policy."""
        from industrial_data_pipeline_spark.operators.lsh_index import (
            materialize)

        toks = self._tokenize(self.text_col)
        extra = self.extra_cols
        docs = materialize(corpus.select(
            F.col(self.id_col).cast("long").alias("doc_id"),
            toks.alias("_toks"), *extra), durable=durable)
        doclen = docs.select("doc_id",
                             F.size("_toks").alias("dl"), *extra)
        postings = (docs
                    .select("doc_id", F.size("_toks").alias("dl"),
                            *extra,
                            F.posexplode("_toks")
                            .alias("_p", "term"))
                    .groupBy("term", "doc_id", "dl", *extra)
                    .agg(F.count("*").alias("tf"),
                         # POSITIONAL postings (VERDICT r12 stretch):
                         # 0-based token positions, sort_array
                         # canonicalizes collect_list's partition
                         # order so the stored bytes are
                         # deterministic. BM25 probes never read
                         # this column (column pruning drops it at
                         # the scan) — only phrase_probe pays for it.
                         F.sort_array(F.collect_list(
                             F.col("_p").cast("int"))).alias("pos"))
                    .withColumn("_tb",
                                (hash64(F.col("term"))
                                 % F.lit(self.n_buckets))
                                .cast("int")))
        return postings, doclen, docs

    def _write(self, postings: DataFrame, doclen: DataFrame,
               epoch: int, overwrite_all: bool) -> None:
        pw = (postings.withColumn("_epoch", F.lit(epoch))
              .repartitionByRange("_tb", "term", "doc_id")
              .sortWithinPartitions("_tb", "term", "doc_id")
              .write.partitionBy("_epoch", "_tb"))
        dw = (doclen.withColumn("_epoch", F.lit(epoch))
              .repartitionByRange("doc_id")
              .sortWithinPartitions("doc_id")
              .write.partitionBy("_epoch"))
        if self.max_records_per_file:
            pw = pw.option("maxRecordsPerFile",
                           self.max_records_per_file)
            dw = dw.option("maxRecordsPerFile",
                           self.max_records_per_file)
        # the two assets are independent targets — overlap their
        # write jobs (optimization r14, guide §2.6; both read the
        # one materialized tokenized frame)
        from industrial_data_pipeline_spark.operators.lsh_index import (
            run_writes_concurrently)

        if overwrite_all:
            run_writes_concurrently(
                lambda: pw.mode("overwrite")
                .parquet(self._postings_path),
                lambda: dw.mode("overwrite").parquet(self._doclen_path))
        else:
            # exactly-once: dynamically overwrite ONLY this epoch's
            # partitions, so a retried micro-batch replaces instead
            # of double-appending (the StoredLshIndex discipline)
            run_writes_concurrently(
                *[lambda w=w, path=path:
                  (w.mode("overwrite")
                   .option("partitionOverwriteMode", "dynamic")
                   .parquet(path))
                  for w, path in ((pw, self._postings_path),
                                  (dw, self._doclen_path))])

    def build(self, corpus: DataFrame) -> None:
        self._write_meta()
        postings, doclen, docs = self._frames(corpus, durable=True)
        try:
            self._write(postings, doclen, epoch=-1,
                        overwrite_all=True)
        finally:
            docs.unpersist()

    def append(self, batch: DataFrame,
               epoch_id: int | None = None) -> None:
        postings, doclen, _ = self._frames(batch)
        if epoch_id is None:
            from industrial_data_pipeline_spark.operators.lsh_index \
                import run_writes_concurrently
            pw = postings.withColumn("_epoch", F.lit(-1)) \
                .coalesce(1).sortWithinPartitions("_tb", "term",
                                                  "doc_id") \
                .write.partitionBy("_epoch", "_tb").mode("append")
            dw = doclen.withColumn("_epoch", F.lit(-1)) \
                .coalesce(1).sortWithinPartitions("doc_id") \
                .write.partitionBy("_epoch").mode("append")
            run_writes_concurrently(
                lambda: pw.parquet(self._postings_path),
                lambda: dw.parquet(self._doclen_path))
        else:
            self._write(postings, doclen, epoch=int(epoch_id),
                        overwrite_all=False)

    # -------------------------------------------------------- probe

    def _scan(self, path: str, schema: str,
              exclude_epoch: int | None,
              as_of_epoch) -> DataFrame:
        """Every disk read funnels through here, so ``as_of_epoch``
        may also be a :class:`~..catalog.snapshot.Snapshot` — it
        resolves (and VALIDATES: covered asset, epochs unmoved)
        against this index's root at plan-build time (VERDICT r13
        item 4)."""
        from industrial_data_pipeline_spark.catalog.snapshot import (
            resolve_as_of)

        as_of_epoch = resolve_as_of(as_of_epoch, self.root)
        scan = self.spark.read.schema(schema).parquet(path)
        if exclude_epoch is not None:
            scan = scan.where(F.col("_epoch") != int(exclude_epoch))
        if as_of_epoch is not None:
            scan = scan.where(F.col("_epoch") <= int(as_of_epoch))
        return scan

    def probe(self, queries: dict[int, str], k: int = 10,
              round_dp: int = 6,
              exclude_epoch: int | None = None,
              as_of_epoch: int | None = None,
              filter_col: str | None = None,
              query_filters: dict | None = None) -> DataFrame:
        """BM25 top-``k`` per query over the persisted postings —
        byte-identical to :func:`~.text.bm25_topk` (with the same
        ``analyzer``) over the concatenation of the scanned epochs'
        batches (q293): identical idf/saturation formula, identical
        round-before-sum determinism discipline, identical
        (query_id, doc_id, bm25, rank) contract with doc_id
        tie-break. Query strings tokenize through the index's OWN
        analyzer twin — the build-time tokenization persisted in
        meta, never a caller-supplied one.

        Scale shape: the postings scan lists ONLY the probed terms'
        bucket directories (driver-computed portable-hash buckets —
        file-level pruning ∝ distinct probe buckets, not index
        size) and pushes the term IN-list into the term-sorted row
        groups; df comes from the same pruned scan; (N, avgdl) is
        one combinable aggregate over the 2-long doclen rows; the
        only shuffles are the cross-epoch posting re-aggregation +
        per-(query, doc) score sum (candidate-sized, ∝ probed
        terms' postings) and the per-query rank window.

        ``filter_col`` + ``query_filters`` (query_id → label) run the
        probe METADATA-FILTERED with PER-STRATUM statistics — BM25
        within the tenant's/language's own corpus (the q151/q280
        pre-filter contract on the lexical asset): the label equality
        pushes into BOTH pruned scans (the extra column is
        denormalized into postings like dl, so no join materializes
        non-stratum candidates), and N/avgdl/df are computed per
        label over exactly the stratum a query retrieves from —
        scoring as if each stratum were its own index, without
        storing one index per stratum."""
        filters = {}
        if filter_col is not None:
            self._extra_type(filter_col)  # validates
            if query_filters is None or \
                    set(query_filters) != set(queries):
                raise ValueError("query_filters must map every "
                                 "query_id to its label")
            filters = query_filters
        qterms = sorted({(qid, t)
                         for qid, qs in queries.items()
                         for t in self._tokenize_py(qs)})
        if not qterms:
            raise ValueError("queries must contain at least one "
                             "analyzable term")
        vocab = sorted({t for _, t in qterms})
        if filter_col is None:
            qdf = self.spark.createDataFrame(
                qterms, "query_id long, term string")
            labels = None
        else:
            qdf = self.spark.createDataFrame(
                [(qid, t, filters[qid]) for qid, t in qterms],
                f"query_id long, term string,"
                f" _qf {self._extra_type(filter_col)}")
            labels = sorted({v for v in filters.values()})
        return self._score(F.broadcast(qdf), vocab, k, round_dp,
                           exclude_epoch, as_of_epoch,
                           filter_col=filter_col, labels=labels)

    def probe_frames(self, queries: DataFrame, k: int = 10,
                     round_dp: int = 6,
                     exclude_epoch: int | None = None,
                     as_of_epoch: int | None = None,
                     id_col: str = "query_id",
                     text_col: str = "query_text",
                     filter_col: str | None = None,
                     query_filter_col: str | None = None) -> DataFrame:
        """:meth:`probe` for a DataFrame of queries — the
        ``probe_batch`` symmetry the IVF side already has (VERDICT
        r12 item 5: a 100k-query eval batch shouldn't live in a
        driver dict). Query text tokenizes IN-PLAN through the same
        :meth:`_tokenize` expression the build wrote (and
        :meth:`probe`'s driver twin replays), so the three paths
        can never diverge; the driver collects only the DISTINCT
        analyzed terms and (when filtering) labels (bounded like the
        ANN probe keys — needed to compute the bucket list and push
        the term/label IN-lists), never the query rows. Output is
        byte-identical to :meth:`probe` over the dict form of the
        same queries (q300 shares q293's oracle verbatim).
        ``filter_col`` + ``query_filter_col`` (a label column on the
        QUERY frame; defaults to ``filter_col``) run the
        per-stratum-statistics filtered probe — :meth:`probe`'s
        contract with the labels riding the query frame.

        Scale envelope, stated (ADVICE r13): the broadcast pair
        frame is |queries| × |terms-per-query| rows of (long,
        short-string[, label]) — a 100k-query eval batch at ~5
        analyzed terms/query is ~500k pairs, single-digit MB and
        comfortably broadcastable; far beyond that, the right move
        is batching the eval frame, not a shuffle join (the scoring
        join NEEDS the pair side small — it fans candidate postings
        by query). The degenerate corner is VOCABULARY, not count:
        a batch whose distinct analyzed terms cover most buckets
        degrades the IN-list toward a full postings scan — correct
        (a probe touching every bucket IS a scan), and the
        ``last_postings_scan`` hook makes it observable."""
        sel = [F.col(id_col).cast("long").alias("query_id"),
               F.explode(self._tokenize(text_col)).alias("term")]
        if filter_col is not None:
            self._extra_type(filter_col)  # validates
            qfc = query_filter_col or filter_col
            sel.append(F.col(qfc).alias("_qf"))
        qpairs = (queries.select(*sel)
                  .distinct()
                  .localCheckpoint(eager=True))
        # ONE driver collect feeds both the term vocabulary and the
        # label set (optimization r15 — previously two jobs over the
        # same materialized batch-sized frame)
        _qrows = qpairs.collect()
        vocab = sorted({r["term"] for r in _qrows})
        if not vocab:
            raise ValueError("queries must contain at least one "
                             "analyzable term")
        labels = None
        if filter_col is not None:
            labels = sorted({r["_qf"] for r in _qrows})
        return self._score(F.broadcast(qpairs), vocab, k, round_dp,
                           exclude_epoch, as_of_epoch,
                           filter_col=filter_col, labels=labels)

    def phrase_probe(self, queries: dict[int, str], k: int = 10,
                     exclude_epoch: int | None = None,
                     as_of_epoch: int | None = None,
                     filter_col: str | None = None,
                     query_filters: dict | None = None) -> DataFrame:
        """EXACT-PHRASE retrieval over the positional postings
        (VERDICT r12 stretch — the lexical feature a RAG user hits
        right after analyzers): a document matches when the phrase's
        tokens appear at CONSECUTIVE positions, in order. Returns
        (query_id, doc_id, n_occ, rank) — n_occ the number of
        phrase occurrences, rank 1.. by (n_occ desc, doc_id),
        matches only (n_occ ≥ 1), capped at ``k``.

        Mechanics (the classic anchor trick, fully relational so the
        oracle replays it in SQL): phrase token i at doc position p
        votes for anchor a = p − i; an anchor with ALL phrase
        indices voting (count distinct i = phrase length — distinct,
        so a repeated token like 'a b a' can't double-vote one slot)
        is one occurrence starting at a. The scan is the SAME
        bucket-partition + term-IN-list pruned postings scan as
        :meth:`probe` — positions ride the already-pruned rows, the
        one extra column only phrase probes ever read (measured at
        a 16× corpus: pos = 0.298 of postings bytes on disk, BM25
        probes decode 0 of it — tools/positions_overhead_result.json
        + the ReadSchema plan assert). Positions
        from multiple epochs of a re-appended doc_id are
        distinct-merged per (doc_id) before anchoring (the stored
        corpus is a set of (doc, position, term) facts; exact dedup
        of re-appends stays the ingest pipeline's job).

        ``filter_col`` + ``query_filters`` (query_id → label) run
        the probe TENANT-SCOPED — :meth:`probe`'s pre-filter
        contract on the phrase path (VERDICT r13 item 2): the
        batch's label IN-list pushes into the pruned postings scan
        next to the term IN-list, and each query anchors only
        within its own stratum's documents. (Phrase matching has no
        corpus statistics, so per-stratum scoping IS the whole
        per-stratum semantics here.)

        Refuses a schema-version-1 (pre-positions) index with a
        ValueError rather than silently returning zero matches
        (ADVICE r13: the absent pos column would read as all-NULL
        and every anchor vote would vanish)."""
        filters, labels = self._phrase_filters(
            filter_col, query_filters, set(queries))
        qterms = [(qid, i, t)
                  for qid, qs in sorted(queries.items())
                  for i, t in enumerate(self._tokenize_py(qs))]
        if not qterms:
            raise ValueError("queries must contain at least one "
                             "analyzable term")
        vocab = sorted({t for _, _, t in qterms})
        if filter_col is None:
            qdf = self.spark.createDataFrame(
                qterms, "query_id long, _idx int, term string")
        else:
            qdf = self.spark.createDataFrame(
                [(qid, i, t, filters[qid]) for qid, i, t in qterms],
                f"query_id long, _idx int, term string,"
                f" _qf {self._extra_type(filter_col)}")
        mdf = self.spark.createDataFrame(
            [(qid, len({i for q2, i, _ in qterms if q2 == qid}))
             for qid in sorted({q2 for q2, _, _ in qterms})],
            "query_id long, _m long")
        return self._phrase_rank(qdf, mdf, vocab, k, exclude_epoch,
                                 as_of_epoch, filter_col, labels)

    def phrase_probe_frames(self, queries: DataFrame, k: int = 10,
                            exclude_epoch: int | None = None,
                            as_of_epoch: int | None = None,
                            id_col: str = "query_id",
                            text_col: str = "query_text",
                            filter_col: str | None = None,
                            query_filter_col: str | None = None,
                            ) -> DataFrame:
        """:meth:`phrase_probe` for a DataFrame of queries — the
        :meth:`probe_frames` symmetry on the phrase path (VERDICT
        r13 item 2): phrase text tokenizes IN-PLAN through the same
        :meth:`_tokenize` expression the build wrote, positions
        exploding per (query, term, index) via ``posexplode`` so the
        token INDEX — the anchor offset — comes from the plan, not a
        driver loop. The driver collects only the DISTINCT analyzed
        terms and (when filtering) labels (the bounded ANN-probe-keys
        envelope — needed for the bucket list and the pushed
        IN-lists), never the query rows; the per-query phrase length
        ``_m`` is an in-plan count-distinct over the exploded pairs.
        Output is byte-identical to :meth:`phrase_probe` over the
        dict form of the same queries. ``filter_col`` +
        ``query_filter_col`` (label column on the QUERY frame;
        defaults to ``filter_col``) scope per-tenant exactly as in
        :meth:`phrase_probe`."""
        self._require_positions()
        sel = [F.col(id_col).cast("long").alias("query_id"),
               F.posexplode(self._tokenize(text_col))
               .alias("_idx", "term")]
        if filter_col is not None:
            self._extra_type(filter_col)  # validates
            qfc = query_filter_col or filter_col
            sel.append(F.col(qfc).alias("_qf"))
        qpairs = (queries.select(*sel)
                  .withColumn("_idx", F.col("_idx").cast("int"))
                  .localCheckpoint(eager=True))
        # ONE driver collect feeds both the term vocabulary and the
        # label set (optimization r15 — previously two jobs over the
        # same materialized batch-sized frame)
        _qrows = qpairs.collect()
        vocab = sorted({r["term"] for r in _qrows})
        if not vocab:
            raise ValueError("queries must contain at least one "
                             "analyzable term")
        labels = None
        if filter_col is not None:
            labels = sorted({r["_qf"] for r in _qrows})
        mdf = (qpairs.groupBy("query_id")
               .agg(F.count_distinct("_idx").alias("_m")))
        return self._phrase_rank(qpairs, mdf, vocab, k,
                                 exclude_epoch, as_of_epoch,
                                 filter_col, labels)

    def overlap_probe_frames(self, docs: DataFrame,
                             min_overlap: float = 0.9,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             exclude_epoch: int | None = None,
                             as_of_epoch=None) -> DataFrame:
        """Term-overlap NOVELTY gate over the persisted postings
        (VERDICT r13 stretch — the lexical fourth gate of the
        multi-gate admission stream): for each candidate document,
        find every indexed document sharing ≥ ``min_overlap`` of
        the candidate's DISTINCT analyzed terms. Returns
        (new_id, old_id, n_shared, n_terms) pairs at/above the
        threshold — a non-empty row set means "not novel". Term
        sets are ORDER-INVARIANT, so this gate catches the
        reordered near-copies the positional trigram-shingle LSH
        gate is blind to (the lexical analogue of the q256
        embedding gate's value-add), and it rides the SAME pruned
        scan as every probe: bucket PartitionFilters + term IN-list
        from the batch's vocabulary (the probe_frames envelope —
        driver collects only distinct analyzed terms; a batch
        covering most buckets degrades toward a scan, the correct
        degenerate). The overlap test is one double multiply +
        compare (``n_shared >= min_overlap * n_terms``) on exact
        integer counts — engine-replayable.

        ``exclude_epoch`` is the exactly-once half (the
        StoredLshIndex.probe_frames discipline): a retried
        foreachBatch epoch must not match the crashed attempt's own
        appended postings. Candidates with zero analyzable terms
        yield no pairs (vacuously novel — the classifier gate, not
        this one, judges empty docs)."""
        toks = (docs.select(
            F.col(id_col).cast("long").alias("new_id"),
            F.explode(F.array_distinct(self._tokenize(text_col)))
            .alias("term"))
            .localCheckpoint(eager=True))
        vocab = sorted({r["term"] for r in
                        toks.select("term").distinct().collect()})
        if not vocab:
            return self.spark.createDataFrame(
                [], "new_id long, old_id long, n_shared long,"
                    " n_terms long")
        nt = toks.groupBy("new_id").agg(F.count("*").alias("_nt"))
        pschema, _ = self._schemas()
        buckets = sorted({py_hash64(t) % self.n_buckets
                          for t in vocab})
        post = (self._scan(self._postings_path, pschema,
                           exclude_epoch, as_of_epoch)
                .where(F.col("_tb").isin(buckets))
                .where(F.col("term").isin(vocab)))
        self.last_postings_scan = post
        old = (post.select("term", F.col("doc_id").alias("old_id"))
               .distinct())
        # toks is distinct per (new_id, term) and old per (term,
        # old_id), so the join emits unique triples — count(*) IS
        # the shared-distinct-term count
        shared = (old.join(F.broadcast(toks), "term")
                  .groupBy("new_id", "old_id")
                  .agg(F.count("*").alias("n_shared")))
        return (shared.join(F.broadcast(nt), "new_id")
                .where(F.col("n_shared")
                       >= F.lit(float(min_overlap)) * F.col("_nt"))
                .select("new_id", "old_id", "n_shared",
                        F.col("_nt").alias("n_terms")))

    def _require_positions(self) -> None:
        if self.schema_version < 2:
            raise ValueError(
                f"phrase probes need positional postings (schema "
                f"version >= 2); this index was persisted at "
                f"version {self.schema_version} — rebuild it with "
                f"the current writer to store positions")

    def _phrase_filters(self, filter_col: str | None,
                        query_filters: dict | None,
                        qids: set) -> tuple[dict, list | None]:
        """Validate the dict-form tenant-scoping args (the
        :meth:`probe` contract) and refuse pre-positions indexes."""
        self._require_positions()
        if filter_col is None:
            return {}, None
        self._extra_type(filter_col)  # validates
        if query_filters is None or set(query_filters) != qids:
            raise ValueError("query_filters must map every "
                             "query_id to its label")
        return query_filters, sorted(set(query_filters.values()))

    def _phrase_rank(self, qdf: DataFrame, mdf: DataFrame,
                     vocab: list[str], k: int,
                     exclude_epoch: int | None,
                     as_of_epoch: int | None,
                     filter_col: str | None,
                     labels: list | None) -> DataFrame:
        """Shared anchor-trick tail of both phrase forms. ``qdf`` is
        the (query_id, _idx, term[, _qf]) token frame, ``mdf`` the
        per-query distinct-index count (phrase length) — both
        broadcast (query-batch-sized). Positions from multiple
        epochs distinct-merge per (term, doc_id[, label]) before
        anchoring; with ``filter_col`` the label IN-list pushes into
        the pruned scan and each query anchors only in its own
        stratum."""
        from pyspark.sql import Window

        buckets = sorted({py_hash64(t) % self.n_buckets
                          for t in vocab})
        post = (self._scan(self._postings_path,
                           self._schemas()[0],
                           exclude_epoch, as_of_epoch)
                .where(F.col("_tb").isin(buckets))
                .where(F.col("term").isin(vocab)))
        if filter_col:
            post = post.where(F.col(filter_col).isin(labels))
        self.last_postings_scan = post
        strat = [filter_col] if filter_col else []
        merged = (post.groupBy("term", "doc_id", *strat)
                  .agg(F.array_distinct(F.sort_array(F.flatten(
                      F.collect_list("pos")))).alias("_pos")))
        anchors = merged.join(F.broadcast(qdf), "term")
        if filter_col:
            # per-query stratum equality (the IN-list above already
            # narrowed to the batch's labels; this pins each query
            # to ITS label)
            anchors = anchors.where(
                F.col(filter_col) == F.col("_qf"))
        anchors = (anchors
                   .select("query_id", "doc_id", "_idx",
                           F.explode("_pos").alias("_p"))
                   .select("query_id", "doc_id",
                           (F.col("_p") - F.col("_idx")).alias("_a"),
                           "_idx")
                   .groupBy("query_id", "doc_id", "_a")
                   .agg(F.count_distinct("_idx").alias("_nn")))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("n_occ"), F.col("doc_id"))
        return (anchors
                .join(F.broadcast(mdf), "query_id")
                .where(F.col("_nn") == F.col("_m"))
                .groupBy("query_id", "doc_id")
                .agg(F.count("*").alias("n_occ"))
                .withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k))

    def _score(self, qdf: DataFrame, vocab: list[str], k: int,
               round_dp: int, exclude_epoch: int | None,
               as_of_epoch: int | None,
               filter_col: str | None = None,
               labels: list | None = None) -> DataFrame:
        """Shared scoring tail of both probe forms: pruned postings
        scan → cross-epoch re-aggregation → df/stats → saturated
        contribution sum → per-query rank. ``qdf`` is the
        (query_id, term[, _qf]) pair frame, already broadcast-marked.
        With ``filter_col``: the batch's label IN-list pushes into
        BOTH scans (the denormalized column — no join materializes
        non-stratum rows), df counts per (term, label), and (N,
        avgdl) aggregate per label (|labels| rows, broadcast), so
        every query scores against exactly its stratum's statistics."""
        from pyspark.sql import Window

        pschema, dschema = self._schemas()
        buckets = sorted({py_hash64(t) % self.n_buckets
                          for t in vocab})
        post = (self._scan(self._postings_path, pschema,
                           exclude_epoch, as_of_epoch)
                .where(F.col("_tb").isin(buckets))
                .where(F.col("term").isin(vocab)))
        if filter_col:
            post = post.where(F.col(filter_col).isin(labels))
        self.last_postings_scan = post
        # ADVICE r12: a doc_id re-appended in a later epoch keeps
        # per-epoch posting rows on disk — re-aggregate by (term,
        # doc_id, dl) summing tf BEFORE df and saturation so the
        # score matches bm25_topk's (_id, _t, _dl) grouping over the
        # concatenated corpus (tf merges before saturating when dl
        # is equal; a changed-dl re-append stays split on both
        # sides). Candidate-sized shuffle: only the probed terms'
        # postings reach it.
        strat = [filter_col] if filter_col else []
        post = (post.groupBy("term", "doc_id", "dl", *strat)
                .agg(F.sum("tf").alias("tf")))
        dfreq = (post.groupBy("term", *strat)
                 .agg(F.count("*").alias("_df")))
        dscan = self._scan(self._doclen_path, dschema,
                           exclude_epoch, as_of_epoch)
        if filter_col:
            stats = (dscan.where(F.col(filter_col).isin(labels))
                     .groupBy(filter_col)
                     .agg(F.count("*").alias("_n_docs"),
                          F.avg("dl").alias("_avgdl")))
        else:
            stats = dscan.agg(F.count("*").alias("_n_docs"),
                              F.avg("dl").alias("_avgdl"))
        idf = F.log(F.lit(1.0)
                    + (F.col("_n_docs") - F.col("_df") + F.lit(0.5))
                    / (F.col("_df") + F.lit(0.5)))
        contrib = F.round(
            idf * (F.col("tf") * F.lit(self.k1 + 1.0))
            / (F.col("tf")
               + F.lit(self.k1)
               * (F.lit(1.0 - self.b)
                  + F.lit(self.b) * F.col("dl")
                  / F.col("_avgdl"))),
            round_dp)
        w = Window.partitionBy("query_id").orderBy(
            F.desc("bm25"), F.col("doc_id"))
        out = post.join(qdf, "term")
        if filter_col:
            # per-query stratum equality (the broadcast join above
            # already narrowed to the batch's labels; this pins each
            # query to ITS label)
            out = out.where(F.col(filter_col) == F.col("_qf"))
        out = out.join(F.broadcast(dfreq), ["term", *strat])
        out = (out.join(F.broadcast(stats), strat) if filter_col
               else out.crossJoin(F.broadcast(stats)))
        return (out
                .groupBy("query_id", "doc_id")
                .agg(F.round(F.sum(contrib), round_dp)
                     .alias("bm25"))
                .withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k))

    # -------------------------------------------------- maintenance

    def file_count(self) -> int:
        return (_count_parquet_files(self._postings_path)
                + _count_parquet_files(self._doclen_path))

    def _rewrite(self, keep, fold: bool,
                 lease_timeout_s: float) -> dict:
        prepare = ((lambda df: df.withColumn("_epoch", F.lit(-1)))
                   if fold else None)
        # the EXTENDED schemas: a rewrite reading the base schema on
        # an extra_schema index would silently drop the metadata
        # columns from the swapped-in files
        pschema, dschema = self._schemas()
        return rewrite_under_lease(
            self.spark, self.root,
            ((self._postings_path, ("_tb", "term", "doc_id"),
              ("_epoch", "_tb"), pschema,
              self.max_records_per_file),
             (self._doclen_path, ("doc_id",), ("_epoch",),
              dschema, self.max_records_per_file)),
            keep=keep, prepare=prepare,
            lease_timeout_s=lease_timeout_s)

    def compact(self, lease_timeout_s: float = 30.0,
                in_flight_epoch: int | None = None) -> dict:
        """Fold per-append small files on both assets — the shared
        crash-recoverable fenced swap; ``in_flight_epoch`` drops the
        current epoch's crashed-attempt leftovers instead of folding
        them into history (the StoredLshIndex.compact discipline)."""
        keep = (None if in_flight_epoch is None
                else F.col("_epoch") < int(in_flight_epoch))
        return self._rewrite(keep, fold=True,
                             lease_timeout_s=lease_timeout_s)

    def retract(self, doc_ids: list,
                lease_timeout_s: float = 30.0) -> dict:
        """Takedown: remove documents from BOTH assets atomically —
        their postings stop scoring and they leave N/avgdl/df
        exactly as if never ingested (df shrinks with the postings
        scan; the stats shrink with doclen)."""
        ids = sorted({int(i) for i in doc_ids})
        return self._rewrite(~F.col("doc_id").isin(ids),
                             fold=False,
                             lease_timeout_s=lease_timeout_s)
