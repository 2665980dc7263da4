"""First-class hybrid retrieval — reciprocal-rank fusion and the
two-leg stored retriever (VERDICT r13 item 1: the RRF fusion was
pasted inline in three suite queries — q294/q298/q303 — and existed
nowhere under ``operators/``; a real user gets registry queries, not
an API. This module is the API: the suites now register THROUGH it).

Two public pieces:

* :func:`rrf_fuse` — the fusion kernel: fixed-order two-term
  reciprocal-rank sum Σ 1/(rrf_k + rank) over a full outer join of
  the two legs' (query_id, cand_id, rank) frames, ranked per query
  with cand_id tie-break. Fixed order + coalesced doubles keep the
  float chain replayable bit-for-bit in SQL (the suite oracles
  replay it verbatim — see `spark-oracle-determinism`).
* :class:`HybridRetriever` — composes a
  :class:`~.bm25_index.StoredBm25Index` lexical leg and a
  :class:`~.similarity.StoredIvfIndex` dense leg over ONE pair of
  shared persisted assets, passing ``filter_col`` /
  ``query_filters`` / ``as_of_epoch`` / ``min_results`` through to
  BOTH legs so tenant scoping, snapshot pinning and guaranteed-k
  compose with the fusion instead of living as per-query glue.

Scale shape: the fusion itself adds one candidate-sized shuffle
(the full join on (query_id, cand_id) — both legs are already
top-``leg_k`` per query, so ≤ 2·|queries|·leg_k rows) and one
per-query rank window. Everything expensive stays inside the legs,
which keep their own pruned-scan contracts (bucket/term-IN pruning
on the postings, cell-partition pruning on the vectors).

Reference parity note: the reference has no ranked retrieval at all
— its only text search is a full-scan LIKE (database.py lookup
path); this is the retrieval layer its corpus-scale counterpart
(StoredBm25Index + StoredIvfIndex) composes over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: canonical RRF constant (Cormack et al. 2009's k=60).
DEFAULT_RRF_K = 60


def rrf_fuse(lex: DataFrame, dense: DataFrame, k: int = 10,
             rrf_k: int = DEFAULT_RRF_K,
             flags: tuple[str, str] = ("in_lexical", "in_dense"),
             ) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval legs.

    Each leg is a ``(query_id, cand_id, rank)`` frame — ranks 1..n
    per query, already truncated to the leg's own top-k. Returns
    ``(query_id, cand_id, rrf_rank, rrf_score, <flags[0]>,
    <flags[1]>)``: score = the FIXED-ORDER two-term sum
    ``coalesce(1/(rrf_k + rank_lex), 0) + coalesce(1/(rrf_k +
    rank_dense), 0)`` (order matters for float determinism — the
    oracle replays the same association), rrf_rank 1..``k`` per
    query by (score desc, cand_id), and one membership flag per leg
    (rank non-null). Candidates absent from both legs don't exist
    (full outer join), so a score is never 0.

    The two flag columns default to the hybrid (lexical, dense)
    naming; pass e.g. ``("in_lexical", "in_fuzzy")`` for other leg
    pairs."""
    fl, fd = flags
    lhs = lex.select("query_id", "cand_id",
                     F.col("rank").alias("_rl"))
    rhs = dense.select("query_id", "cand_id",
                       F.col("rank").alias("_rf"))
    u = (lhs.join(rhs, ["query_id", "cand_id"], "full")
         .select("query_id", "cand_id",
                 (F.coalesce(1.0 / (F.lit(rrf_k) + F.col("_rl")),
                             F.lit(0.0))
                  + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("_rf")),
                               F.lit(0.0))).alias("_score"),
                 F.col("_rl").isNotNull().alias(fl),
                 F.col("_rf").isNotNull().alias(fd)))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_score"), F.col("cand_id"))
    return (u.withColumn("rrf_rank", F.row_number().over(w))
            .where(F.col("rrf_rank") <= k)
            .select("query_id", "cand_id", "rrf_rank",
                    (F.col("_score") + F.lit(0.0))
                    .alias("rrf_score"),
                    fl, fd))


class HybridRetriever:
    """One shared BM25 asset + one shared IVF asset, probed as a
    single retriever: lexical leg = ``bm25.probe`` (per-stratum
    statistics when filtered), dense leg = ``ivf.probe_batch`` (or
    the ADC / SQ compressed tiers), fused by :func:`rrf_fuse`.

    Every cross-cutting knob passes through to BOTH legs so the
    compositions stay consistent by construction instead of by
    caller discipline:

    * ``filter_col`` + ``query_filters`` — tenant/stratum scoping
      (q303's contract: label pushed into both pruned scans; the
      dict also feeds the dense leg by attaching ``_qf`` to the
      query-vector frame, so one dict scopes both legs).
    * ``as_of_epoch`` — snapshot pinning on both stored assets
      (q298's contract; see also the store-level Snapshot manifest).
    * ``min_results`` — guaranteed-k escalation on the dense leg
      (the lexical leg's supply is its postings; BM25 retrieval is
      exhaustive over probed terms so it has no routing to escalate).
    """

    #: dense probe tiers: method name on StoredIvfIndex + whether
    #: the tier takes a ``rerank`` shortlist size.
    _DENSE = {"exact": ("probe_batch", False),
              "adc": ("probe_batch_adc", True),
              "sq": ("probe_batch_sq", True)}

    def __init__(self, bm25, ivf, rrf_k: int = DEFAULT_RRF_K):
        self.bm25 = bm25
        self.ivf = ivf
        self.rrf_k = int(rrf_k)

    def retrieve(self, queries: dict[int, str],
                 query_vecs: DataFrame, k: int = 10,
                 leg_k: int = 10, nprobe: int = 4,
                 id_col: str | None = None,
                 vec_col: str | None = None,
                 filter_col: str | None = None,
                 query_filters: dict | None = None,
                 as_of_epoch: int | None = None,
                 min_results: int | None = None,
                 dense_tier: str = "exact", rerank: int = 50,
                 brute_force_threshold: int = 4096) -> DataFrame:
        """Hybrid top-``k`` per query. ``queries`` (query_id →
        query string) feeds the lexical leg through the index's own
        persisted analyzer; ``query_vecs`` (``id_col``, ``vec_col``)
        feeds the dense leg — the ids must agree (one logical query,
        two encodings). ``leg_k`` is each leg's own top-k before
        fusion (the RRF literature's per-system depth); ``k`` the
        fused depth. ``dense_tier`` picks the dense probe:
        ``"exact"`` (raw vectors), ``"adc"`` (IVF-ADC two-stage,
        requires a pq_m build) or ``"sq"`` (int8 SQ), the latter two
        taking ``rerank``. Returns :func:`rrf_fuse`'s contract:
        (query_id, cand_id, rrf_rank, rrf_score, in_lexical,
        in_dense)."""
        if dense_tier not in self._DENSE:
            raise ValueError(f"dense_tier must be one of "
                             f"{sorted(self._DENSE)}, "
                             f"got {dense_tier!r}")
        qv = query_vecs
        query_filter_col = None
        if filter_col is not None:
            if query_filters is None:
                raise ValueError("filter_col requires query_filters")
            # one dict scopes both legs: attach each query's label
            # to its vector row (broadcast map over |queries| keys)
            idc = id_col or self.ivf.id_col
            mapping = F.create_map(
                *[x for qid, lbl in sorted(query_filters.items())
                  for x in (F.lit(int(qid)).cast("long"),
                            F.lit(lbl))])
            qv = qv.withColumn(
                "_qf", mapping[F.col(idc).cast("long")]
                .cast(self.bm25._extra_type(filter_col)))
            query_filter_col = "_qf"
        method, takes_rerank = self._DENSE[dense_tier]
        kwargs = dict(k=leg_k, nprobe=nprobe, id_col=id_col,
                      vec_col=vec_col, as_of_epoch=as_of_epoch,
                      filter_col=filter_col,
                      query_filter_col=query_filter_col,
                      min_results=min_results,
                      brute_force_threshold=brute_force_threshold)
        if takes_rerank:
            kwargs["rerank"] = rerank
        # the two legs' probe CONSTRUCTION is eager work (query-term
        # and routing collects, pruning-key collects, escalation
        # decisions) against two independent assets — overlapped
        # (optimization r15, guide §2.6); the returned frames stay
        # lazy and fuse below as before
        from industrial_data_pipeline_spark.operators.lsh_index import (
            run_writes_concurrently)

        lex, den = run_writes_concurrently(
            lambda: (self.bm25.probe(queries, k=leg_k,
                                     as_of_epoch=as_of_epoch,
                                     filter_col=filter_col,
                                     query_filters=query_filters)
                     .select("query_id",
                             F.col("doc_id").alias("cand_id"),
                             "rank")),
            lambda: (getattr(self.ivf, method)(qv, **kwargs)
                     .select("query_id",
                             F.col("vec_id").alias("cand_id"),
                             F.col("rk").alias("rank"))))
        return rrf_fuse(lex, den, k=k, rrf_k=self.rrf_k)

    def retrieve_frames(self, queries: DataFrame, k: int = 10,
                        leg_k: int = 10, nprobe: int = 4,
                        id_col: str = "query_id",
                        text_col: str = "query_text",
                        vec_col: str = "query_vec",
                        filter_col: str | None = None,
                        query_filter_col: str | None = None,
                        as_of_epoch: int | None = None,
                        min_results: int | None = None,
                        dense_tier: str = "exact",
                        rerank: int = 50,
                        brute_force_threshold: int = 4096,
                        ) -> DataFrame:
        """:meth:`retrieve` for ONE DataFrame of queries carrying
        id + text + vector (+ optional label column) — the q300
        probe_frames lesson applied to the hybrid operator: a 100k
        eval batch shouldn't live in a driver dict, and the two
        legs shouldn't need two differently-shaped inputs. The
        lexical leg rides ``bm25.probe_frames`` (text tokenizes
        IN-PLAN through the index's persisted analyzer), the dense
        leg the chosen probe tier; ``filter_col`` +
        ``query_filter_col`` (label column on the query frame,
        default the filter column's name) scope both legs;
        ``as_of_epoch`` (int or Snapshot) pins both. Output is
        byte-identical to :meth:`retrieve` over the dict form of
        the same queries."""
        if dense_tier not in self._DENSE:
            raise ValueError(f"dense_tier must be one of "
                             f"{sorted(self._DENSE)}, "
                             f"got {dense_tier!r}")
        method, takes_rerank = self._DENSE[dense_tier]
        kwargs = dict(k=leg_k, nprobe=nprobe, id_col=id_col,
                      vec_col=vec_col, as_of_epoch=as_of_epoch,
                      filter_col=filter_col,
                      query_filter_col=query_filter_col,
                      min_results=min_results,
                      brute_force_threshold=brute_force_threshold)
        if takes_rerank:
            kwargs["rerank"] = rerank
        # overlap the two legs' eager probe construction against
        # their independent assets (optimization r15, guide §2.6 —
        # same as :meth:`retrieve`)
        from industrial_data_pipeline_spark.operators.lsh_index import (
            run_writes_concurrently)

        lex, den = run_writes_concurrently(
            lambda: (self.bm25.probe_frames(
                queries, k=leg_k, id_col=id_col, text_col=text_col,
                as_of_epoch=as_of_epoch, filter_col=filter_col,
                query_filter_col=query_filter_col)
                .select("query_id",
                        F.col("doc_id").alias("cand_id"), "rank")),
            lambda: (getattr(self.ivf, method)(queries, **kwargs)
                     .select("query_id",
                             F.col("vec_id").alias("cand_id"),
                             F.col("rk").alias("rank"))))
        return rrf_fuse(lex, den, k=k, rrf_k=self.rrf_k)
