"""Regenerate EXPLAINS.md: formatted physical plans for representative
suite queries, with the scale property each plan is meant to prove.
Run: python tools/explain_dump.py  (writes /root/repo/EXPLAINS.md)
"""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

#: (query name, what the plan must show)
PICKS = [
    ("q01_export_long",
     "Flagship export: attribute IN-list + both time bounds appear in "
     "PushedFilters on the archive scan; both dims join as "
     "BroadcastHashJoin; no SortMergeJoin anywhere."),
    ("q02_export_pivot",
     "Wide export: same pushdown, then ONE shuffle (the pivot "
     "groupBy) — pivot values are enumerated at plan time from the "
     "dim, so no second pass over the fact."),
    ("q24_minhash_lsh_pairs",
     "MinHash LSH: signatures/bands are pure projections (no Python); "
     "the only shuffles are the band-bucket join and the final "
     "candidate-verify join — both on bare (id, bucket) pairs, the "
     "wide shingle arrays join back only for surviving candidates."),
    ("q49_shipping_priority",
     "TPC-H Q3 shape: date filters pushed to both fact scans, "
     "customer dim broadcast, orders⋈lineitem is the one "
     "SortMergeJoin on the orderkey, TakeOrderedAndProject (not a "
     "global sort) for the top-10."),
    ("q64_interval_join",
     "Binned range join: executes as an equi-join on the bin key "
     "(BroadcastHashJoin/SortMergeJoin) with the exact containment "
     "as a residual filter — NOT BroadcastNestedLoopJoin, which is "
     "what a raw theta join degenerates to."),
    ("q87_basket_pairs",
     "Basket self-join: the (order, part) set is deduped BEFORE the "
     "self-join (HashAggregate below the join), pair counting is "
     "map-side combinable, item frequencies re-join broadcast. The "
     "one BroadcastNestedLoopJoin is the 1-row basket-count scalar "
     "cross join — O(n)·1, the intended scalar-broadcast pattern, "
     "not a pairwise theta join."),
    ("q91_pagerank",
     "PageRank (one iteration shown in-plan; the loop "
     "localCheckpoints): contributions shuffle on dst only; the "
     "checkpointed edge list scans from memory, not the lineitem "
     "self-join."),
    ("q92_sql_revenue",
     "Raw spark.sql text: the SQL door yields the same pushed-down "
     "scan — all three predicates in PushedFilters, single "
     "partial/final HashAggregate pair, full WholeStageCodegen."),
    ("q125_bucketed_join_revenue",
     "Bucketed co-located join (shown with broadcast disabled, the "
     "at-scale regime): both scans report Bucketed: true / "
     "SelectedBucketsCount: 8 out of 8 and the SortMergeJoin has NO "
     "Exchange under it — the repeated fact⋈fact join costs zero "
     "network. At this SF the planner would broadcast instead "
     "(also correct); tests/test_plans.py pins the forced shape."),
    ("q126_contamination",
     "Decontamination: the benchmark side collapses to a DISTINCT "
     "hash set UNDER a BroadcastExchange; the corpus side is one "
     "explode + partial-aggable count — 8-byte gram hashes shuffle, "
     "never gram strings, and there is no self-join anywhere."),
    ("q136_real_image_resize",
     "Real PNG kernel chain: three Arrow mapInPandas stages "
     "(encode → resize → verify) pipeline WITHOUT any Exchange "
     "between them — the per-partition media flow never shuffles, "
     "so payload bytes cross the Python boundary in Arrow batches "
     "but never the network."),
    ("q137_dup_clusters_star",
     "Alternating-star CC (final labels plan): every star round was "
     "localCheckpoint-ed, so the finished plan is ONE join of the "
     "node list against the in-memory star edges — lineage stays "
     "flat at any iteration count, the property that keeps "
     "iterative graph algorithms alive at 100 TB."),
    ("q141_lm_cross_entropy",
     "Bigram-LM scoring: the two count tables shuffle on narrow "
     "(w1[,w2]) keys with partial aggregation below the Exchange; "
     "the vocab scalar enters as a 1-row BroadcastExchange; the "
     "score join is a SortMergeJoin on the bigram key — no "
     "data-sized collect anywhere in the train→score pipeline."),
    ("q142_cusum_alarms",
     "CUSUM closed form: ONE Exchange + ONE Sort on the tag key feed "
     "two stacked Window passes (running sums, then running extrema "
     "of those sums) with no re-shuffle or re-sort between them — "
     "the whole drift recurrence costs one shuffle + one per-key "
     "sort, no recursion, no UDF."),
    ("q95_zipf_slope",
     "Zipf fit after the round-4 fix: the vocabulary ranking is a "
     "distributed TakeOrderedAndProject (top-1000), NOT a global "
     "row_number window — the plan contains no WindowExec at all; "
     "ranks for the 1000 survivors come from a single bounded-task "
     "sort + sequential id."),
    ("q172_zorder_layout",
     "Exact ntile(16) without a global sort (round-4 fix): the only "
     "Window is the within-bucket row_number partitioned on the "
     "z-high-bits bucket key; tile quotas are integer arithmetic on "
     "offsets collected from the <=64-row bucket-count table."),
    ("q202_boilerplate_ngrams",
     "Boilerplate shingles: the 5-gram expansion is a JVM-side "
     "transform+explode (no Python); doc-frequency thresholding "
     "happens BEFORE the hit-join, so only boilerplate grams "
     "shuffle back against the corpus (semi-join reduction)."),
    ("q225_interval_join",
     "Half-open range join through the shared binned operator: NO "
     "BroadcastNestedLoopJoin / CartesianProduct anywhere — the "
     "interval side explodes onto hour bins and the join is a plain "
     "equi-join on the bin key, exact containment filtered after."),
    ("q227_set_similarity_join",
     "Exact AllPairs set-similarity join: every join is an equi-join "
     "(prefix item, then (id, item) verify) — no theta join, no "
     "all-pairs stage; per-set ranks are doc_id-partitioned windows, "
     "never a global sort."),
    ("q220_weighted_median",
     "Round-5 de-windowed weighted median: the fact feeds only "
     "map-side-combinable HashAggregates (dollar buckets, then "
     "exact prices within ONE crossing bucket); the windows run "
     "over dimension-sized aggregate outputs, partitioned on the "
     "group key; totals/crossing tables broadcast. The fact is "
     "never sorted — the tie-break columns of the old fact-wide "
     "window do not appear anywhere in the plan."),
    ("q221_equidepth_histogram",
     "Equi-depth boundaries: ONE exact percentile aggregate "
     "(distinct-bounded counts-map state) broadcast into the "
     "bucketing projection; no Sort, no Window, one combinable "
     "groupBy for the per-bucket stats."),
    ("q231_dup_spans",
     "Duplicate-span report: positional shingles explode JVM-side "
     "(Generate over transform, no Python); the shared-gram set is "
     "one distinct+groupBy and the hit filter a LeftSemi join on the "
     "gram; the only window (island merge) is partitioned on doc_id "
     "— state bounded by doc length, nothing global."),
    ("q232_cdc_apply",
     "CDC apply: the merge is one LeftAnti join on the key (touched "
     "rows leave) + one Union (I/U images enter) — no window over "
     "the snapshot; the one-entry-per-key guard window runs over the "
     "delta-sized changelog only, partitioned on the key."),
    # ---- top-20-expensive coverage (VERDICT r6 item 7): the plan
    # property that justifies each query's cost at scale. For
    # store/streaming flows the dump RUNS the flow at sf0.001 and
    # shows the final read-back plan; the load-bearing property of
    # the mutation path itself is stated (and where marked, pinned
    # by tests/test_plans.py or tools/window_audit.py instead).
    ("q123_tree_reload",
     "Tree reload (the reference's scariest flow): the dumped plan "
     "is the post-reload catalog⋈archive-extents read — dims "
     "broadcast, extents one partial-aggable min/max groupBy over "
     "the archive scan. The reload itself assigns preorder ids "
     "driver-side from a catalog-sized collect (NO global window — "
     "the round-4 fix window_audit pins) and remaps archive ids "
     "via a broadcast old→new map join, one partition-scoped "
     "rewrite."),
    ("q229_stream_derived_chain",
     "Stream→cleanse→upsert→derived chain: the dumped plan is the "
     "derived-history read-back after three real offset-advancing "
     "micro-batches — a plain partitioned store scan with the "
     "attribute filter pushed down. The per-batch cost property "
     "(upsert + recompute touch only the batch's affected "
     "(date, timestamp) partitions, independent of history size) "
     "is measured in SCALE_NOTES, not visible in the final scan."),
    ("q158_stream_stream_join",
     "Stream-stream view→purchase attribution: the dumped batch "
     "read of the append sink proves the run completed; the scale "
     "property lives in the streaming plan — both sides "
     "watermarked 1 h and the join range-bounded on BOTH event-time "
     "columns, so state per key is ≤ (watermark + range) of events, "
     "O(events/hour), never O(stream)."),
    ("q132_cluster_representatives",
     "Cluster representatives: survivor pick is one partial-aggable "
     "max_by((len, -id)) HashAggregate per cluster — NO window over "
     "the corpus; the LSH pair set is the localCheckpoint-ed "
     "session-shared asset (its cost shows here and is reused by "
     "q61/q137), so the finished plan joins the corpus against "
     "in-memory cluster labels."),
    ("q121_derived_maintenance_stream",
     "Derived-attribute maintenance (trigger replacement): dumped "
     "plan is the derived-history read-back; the foreachBatch body "
     "recomputes ONLY timestamps present in the arriving batch "
     "(semi-join on the batch's ts set) with sibling values from a "
     "pivot on those same partitions — per-batch cost tracks batch "
     "size, not archive size."),
    ("q115_update_attribute",
     "Formula update (D6): read-back of the recomputed derived "
     "history — the store scan prunes to the one attribute id; the "
     "update path deletes old rows and recomputes via the pivoted "
     "formula join on the affected partitions only (the dims enter "
     "broadcast; no fact-wide window)."),
    ("q114_insert_attribute_backfill",
     "Attribute insert + backfill (D5): same shape as q115 — "
     "catalog-sized id allocation, first-wins backfill over the "
     "seeded hourly archive via the pivot join, read-back scan "
     "pruned to the new id."),
    ("q113_insert_element",
     "Element insert (D4): id = max+1 from a catalog-sized scalar "
     "aggregate, dim overwrite, read back from disk — the dumped "
     "plan is a dimension scan; nothing fact-sized moves."),
    ("q187_personalized_pagerank",
     "Personalized PageRank: each iteration localCheckpoints, so "
     "the dumped final plan joins the (in-memory) rank vector "
     "against the checkpointed edge list — contributions shuffle "
     "on dst only; the teleport/restart vector is a broadcast "
     "2-row table; lineage stays flat at any iteration count."),
    ("q168_watermark_drops",
     "Watermark drop accounting: the dumped sink read proves the "
     "availableNow run; the streaming plan's property is the "
     "watermarked windowed agg — state is |open windows × keys|, "
     "late rows beyond the watermark are dropped and ACCOUNTED "
     "(the emitted ledger is the checked result)."),
    ("q119_ingest_recovery",
     "Ingest recovery ledger (T1+T2+T3): per-tag minute-grid "
     "fetches are bounded by the density breaker; recovery "
     "re-pulls in 59-min blocks — every Spark job in the flow is "
     "bounded by (tags × blocks), and the dumped ledger plan is "
     "catalog-sized."),
    ("q160_triangles",
     "Exact triangles: edges are degree-ordered BEFORE the wedge "
     "join (orientation), so every wedge is generated once and the "
     "two joins are equi-joins on (lo, hi) node keys — no theta "
     "join; the quadratic naive 3-way join exists only as the "
     "DuckDB oracle."),
    ("q138_pi_datasource",
     "Custom DataSource (S2/T4): the scan shows the pi_batch "
     "source with tag-range input partitions — per-task batched "
     "pulls replace the reference's thread pool; cleansing is the "
     "same JVM-side projection chain as q118 on top of the scan."),
    ("q140_semantic_dedup",
     "SemDeDup: k-means cell assignment is two broadcast-centroid "
     "projections; the candidate pair join is scoped WITHIN cells "
     "(shuffle key = cluster id, Σ|cell|² work) — never an "
     "all-pairs join over the corpus."),
    ("q27_simhash_pairs",
     "SimHash near-dup pairs: 64-bit signatures are JVM bit math; "
     "the pigeonhole block join buckets on 16-bit bands (equi-join "
     "on the band value), Hamming verify only on bucket "
     "collisions — no all-pairs XOR stage."),
    ("q198_curation_funnel",
     "Curation funnel: each stage is a semi/anti-join reduction of "
     "the previous stage's survivors (quality gate → exact-dup "
     "anti-join → decontamination gram semi-join → split hash "
     "filter); stage counts union into 5 rows — the plan shows the "
     "stacked joins with the benchmark gram set entering broadcast."),
    ("q70_approx_profile",
     "Sketch profile: HLL++ distinct and GK percentiles are "
     "fixed-size partial-aggable sketch states per event_type — "
     "ONE combinable HashAggregate pair over the fact, no distinct "
     "expansion, no sort; the in-plan exact comparison (the "
     "accuracy booleans) is what costs the second aggregate."),
    ("q84_neighbor_confusion",
     "Exact top-1 neighbor confusion: the 5% deterministic query "
     "sample joins the corpus — cost is |sample|×|corpus| dot "
     "products, a deliberate exact baseline fenced by "
     "_guard_quadratic; the argmax is max_by, not a window; the "
     "confusion matrix is a dimension-sized groupBy."),
    ("q105_stream_dedup_counts",
     "Streaming dedup: dropDuplicatesWithinWatermark keys state by "
     "(user_id, event_type) and expires it with the watermark — "
     "state tracks the ACTIVE key set, not stream length; the "
     "dumped plan is the batch count over the append sink."),
    ("q205_compact_archive",
     "Small-file compaction: a driver loop bounded by |dates| "
     "issues one bounded job per oversized partition (sort + "
     "single-file rewrite); the dumped plan is the post-compaction "
     "read-back whose row count is part of the hash-checked "
     "result — no global shuffle, cost class of TTL partition "
     "maintenance."),
    ("q233_bm25_topk",
     "BM25 top-k: the posting explode is filtered to the query-term "
     "vocabulary IN-list immediately (the probe never materializes "
     "the full index); query terms, df stats and the (N, avgdl) "
     "scalar all enter as BroadcastExchanges; the only shuffles are "
     "the (doc,term) tf count and the per-(query,doc) score sum, "
     "both partial-aggregated; the rank window partitions by "
     "query_id — |queries| partitions, never global."),
    ("q234_k_anonymity",
     "k-anonymity audit: ONE map-side-combined HashAggregate over "
     "the quasi-identifier key (count + distinct-count in the same "
     "aggregate) plus a 1-row broadcast total for the percentage — "
     "no window, no second fact pass; output is bounded by the "
     "quasi-identifier domain product."),
    ("q235_bpe_apply",
     "BPE apply: the ENTIRE operator is a stacked projection chain "
     "directly over the scan — symbol encoding, the chained "
     "unit-aware replaces and the separator-count arithmetic add "
     "ZERO shuffles, Python stages or explodes; the one Exchange "
     "in the plan is _load_docs' round-robin spread of the "
     "single-file test corpus (input balancing, present before the "
     "operator and absent on a properly-split production table)."),
    ("q239_dup_span_excise",
     "Span excision: the token anti-join is an equi-join on doc_id "
     "with the span range as a residual filter (no theta join); the "
     "rebuild is one doc-partitioned sort-aggregate; the span "
     "subtree reuses q231's hashed-posting shape (8-byte keys, "
     "doc-partitioned island window) — nothing global."),
    ("q236_incremental_lsh",
     "Incremental LSH ingest gate: every join is an equi-join — the "
     "probe on (band, bucket), the verifies on bare ids — and the "
     "batch side only ever meets the corpus INDEX, never the corpus "
     "rows (no batch-vs-batch or corpus-vs-corpus pairing "
     "anywhere); exact verify re-shingles only collision survivors. "
     "The corpus signature subtree appearing under multiple joins "
     "is the documented in-plan-index trade — stored band/shingle "
     "columns replace it in production."),
    ("q241_incremental_clusters",
     "Incremental cluster maintenance: the final labels plan joins "
     "checkpointed frames only (every propagation round "
     "localCheckpoints, so lineage stays flat); the label-star "
     "reduction means the joins run over |labels| + |delta| edges — "
     "the historical pair graph appears nowhere in the plan."),
    ("q240_streaming_lsh_gate",
     "Streaming admission gate: the dumped plan is the ledger "
     "read-back after two REAL offset-advancing micro-batches (the "
     "run happens during the dump); each batch's in-flight plan is "
     "q236's broadcast-verify shape, and the cross-batch property "
     "(batch 2 rejected against batch 1's admissions) is pinned by "
     "tests/test_streaming.py, not by this final scan."),
    ("q242_stored_lsh_gate",
     "Stored-index LSH gate (the q236 production shape, round 8): "
     "the registered query localCheckpoints its result before "
     "deleting the temp assets, so the dump below is the result "
     "read-back. The PROBE plan itself — two parquet scans of the "
     "persisted band/shingle tables, batch-only signing (≤32 "
     "partial_min aggregates), broadcast candidate/batch sides, no "
     "corpus signature subtree — is asserted structurally in "
     "tests/test_plans.py::test_stored_lsh_gate_probe_plan. Its "
     "per-batch cost measured FLAT (0.86×) at a 16× corpus."),
    ("q244_dup_span_excise_stored",
     "Stored-span excision (the q239 production shape): dump is the "
     "checkpointed result read-back (temp asset deleted); the "
     "excision-marginal plan — parquet span scan, NO xxhash64 "
     "posting substrate, token posexplode + doc_id equi-join with "
     "range residual + doc-partitioned rebuild — is asserted in "
     "tests/test_plans.py::test_stored_span_excise_plan_reads_"
     "parquet_spans, and the XL probe measured it at 3.3% of the "
     "full pass."),
    ("q245_ivf_maintained_recall",
     "Maintained-IVF recall audit: the index side is base "
     "assignment UNION the batch routed through frozen centroids "
     "(one Arrow map stage, no rebuild); the probe prunes to the "
     "per-query top-4 cells BEFORE any corpus distance math "
     "(broadcast probe-cell join), and the only corpus-wide scan "
     "is the brute-force ground truth the audit exists to "
     "compare against."),
    ("q246_jpeg_phash_dedup",
     "JPEG pHash dedup: encode → REAL baseline-JPEG entropy decode "
     "→ pHash all live in two Arrow mapInPandas stages (bounded "
     "per-image Python, no per-row serde); the pair search is the "
     "pigeonhole block join on 8-byte keys — the lossy codec adds "
     "zero joins, the plan is q144's with JPEG wire bytes."),
    ("q248_stored_ann_gate",
     "Stored EMBEDDING admission gate: dump is the checkpointed "
     "result read-back (temp index deleted); the probe shape — "
     "parquet scan of the persisted (vec_id, table, sig) index, "
     "batch signed by one Arrow matmul, (table, sig) equi-join, "
     "broadcast batch-sized cosine verify — mirrors q242's and is "
     "pinned by tests/test_similarity.py::"
     "test_ann_gate_batch_vs_index_only."),
    ("q249_quality_classifier",
     "Hashed n-gram quality classifier: one explode, one narrow "
     "(id, int-weight) shuffle with map-side combine, the 64-entry "
     "weight array folded as a literal into codegen — no join, no "
     "UDF, no float ever summed (integer milli-weights; the single "
     "float division + sigmoid happen once per doc)."),
    ("q252_hard_negatives",
     "Hard-negative mining: the 5-row query batch broadcasts into a "
     "nested-loop join on label inequality (the documented "
     "brute-force envelope — one corpus scan × |queries| distance "
     "computations); the rank window partitions on query_id. "
     "Corpus-scale query sets route through the ANN index instead "
     "(operator docstring)."),
    ("q253_curation_stream",
     "Full curation admission stream: the dump is the ledger "
     "read-back after two REAL micro-batches (classifier + "
     "stored-index probe + admit-append run during the dump); "
     "per-batch plan = q249's shuffle-narrow classifier + q242's "
     "stored-index probe shape (tests/test_plans.py), and the "
     "composition properties (quality-passing dups rejected, "
     "rejects never poison the index) are pinned by "
     "tests/test_streaming.py::test_curation_stream_composition."),
    ("q254_ann_hard_negatives",
     "Stored-route hard negatives: the dump is the checkpointed "
     "result (the probe collects then prunes); the live plan's "
     "load-bearing shapes — (table, sig) IN-lists pushed into the "
     "partitioned signature scan, candidate ids pushed into the "
     "corpus verify, batch-sized broadcasts — are the q248 machinery "
     "asserted in tests/test_plans.py, and the route's equality with "
     "brute force on the planted overlap is pinned by "
     "tests/test_similarity.py and the in_brute_topk column the "
     "oracle recomputes in SQL."),
    ("q255_rouge_l",
     "ROUGE-L: a shuffle-free projection — ONE ArrowEvalPython "
     "(the LCS kernel, integer output) over the pair rows plus "
     "JVM-side division/round; no join, no window, no cross-pair "
     "state — eval cost is Σ(m·n) with nothing to re-shuffle."),
    ("q256_multigate_stream",
     "Multi-gate curation stream: ledger read-back after two REAL "
     "micro-batches through quality + stored text-LSH + stored "
     "embedding gates (all three ran during the dump, advancing "
     "both index assets, with in-stream compaction before batch 2 "
     "and every per-batch write epoch-partitioned for exactly-once "
     "retries); per-batch plan = q249's classifier + q242's pruned "
     "band probe + q248's pruned signature probe "
     "(tests/test_plans.py), and the gate-attribution invariants "
     "(reversed-token dups caught ONLY by the embedding gate, "
     "cross-batch index advance, reject no-poison) are pinned by "
     "tests/test_streaming.py::test_multigate_stream_gate_attribution."),
    ("q258_bleu_eval",
     "BLEU-4: four (id, gram) count-shuffle + overlap-join rounds "
     "(rouge_n's shape) feeding one per-row ln/exp chain — integer "
     "clipped counts throughout, floats once per doc, no windows, "
     "no UDFs, no cross-doc state."),
    ("q262_chrf_eval",
     "chrF (round-10 single-shuffle form): ONE explode emits "
     "(id, n, gram, side) for all six orders of both sides, ONE "
     "(id, n, gram) count shuffle, one per-order fold, one "
     "conditional-aggregation pivot joined to the lengths — the "
     "previous 12 per-order gram shuffles + 12 re-joins collapsed; "
     "grams are <= 6-char strings so the one gram shuffle carries "
     "~2x6x the text, paid once; floats once per row, no windows, "
     "no UDFs; strip set engine-pinned to [ \\t\\n\\x0B\\f\\r]."),
    ("q259_stored_ivf_recall",
     "Stored-IVF recall loop: the dump is the checkpointed result "
     "(build + append + 10 probes ran during it); the load-bearing "
     "plan shape — the cell IN-list in PartitionFilters, so probes "
     "list ONLY the probed cells' directories (measured 0.24x files "
     "/ 0.23x bytes at nprobe=4/16, tools/ivf_prune_result.json) — "
     "is asserted in tests/test_plans.py::"
     "test_stored_ivf_probe_partition_prunes."),
    ("q260_retracted_gate",
     "Index retraction: checkpointed probe result after a filtered "
     "atomic rewrite removed doc 0-9's rows under the writer lease; "
     "byte-equality with the gate over documents>=10 (the shared "
     "oracle) is the proof — the probe plan itself is q242's pruned "
     "shape, unchanged by retraction."),
    ("q261_video_metadata",
     "Video metadata probe: one mapInPandas over (media_id, data) — "
     "generate wire-shaped MP4 payloads, walk box headers, emit "
     "scalar metadata columns; no shuffle, no bytes beyond headers "
     "read (mdat never touched), corrupt payloads yield NULLs "
     "in-plan rather than exceptions."),
    ("q263_sig_retracted_gate",
     "Embedding-index retraction: checkpointed probe result after "
     "StoredSignatureIndex.retract removed vec 0-9's rows from BOTH "
     "assets (filtered atomic rewrite under the lease + fencing "
     "check); byte-equality with the gate over documents>=10 is the "
     "proof — the probe plan is q248's pruned signature shape, "
     "unchanged by retraction (tests/test_plans.py)."),
    ("q264_ivf_retracted_recall",
     "IVF retraction + batch probe: checkpointed recall audit after "
     "StoredIvfIndex.retract(140-149) — centroids stay frozen, the "
     "probe is q265's single pruned scan, and the shared-with-q245 "
     "oracle over the filtered corpus proves exactly the requested "
     "vectors vanished from the probed cells."),
    ("q265_ivf_batch_probe",
     "Batch IVF probe: the dump is the checkpointed result; the "
     "live probe plan — ONE parquet scan partition-pruned to the "
     "union of the batch's probed cells, broadcast (query, cell) "
     "routing pairs + query vectors, per-query rank window, no "
     "sort-merge join — is asserted in tests/test_plans.py::"
     "test_ivf_probe_batch_single_pruned_scan; plan size is "
     "constant in |batch| (q259's per-query scan union retired)."),
    ("q266_instream_retraction",
     "In-stream retraction: ledger read-back after two REAL "
     "micro-batches with a takedown applied BETWEEN them from the "
     "stream's own foreachBatch (retract under the writer lease it "
     "holds as single admitting writer, idempotent under epoch "
     "retries); per-batch plan is q243's pruned stored-gate shape, "
     "and the oracle swaps the corpus at exactly the takedown "
     "boundary."),
    ("q267_asof_gate",
     "Time-travel probe: as_of_epoch=0 becomes a `_epoch <= 0` "
     "PartitionFilter on BOTH stored scans — epoch-1's partitions "
     "are pruned out of the listing, not read-and-dropped; the rest "
     "of the plan is the standard pruned stored-gate shape "
     "(band/bucket IN-lists, batch-sized broadcasts). The dump is "
     "the checkpointed probe; the pruning is asserted in "
     "tests/test_plans.py::test_asof_probe_prunes_newer_epochs."),
    ("q268_temperature_mix",
     "Temperature mixing: ONE partial-agg count over |langs| "
     "groups, a scalar max cross-joined broadcast, the copy spec "
     "broadcast-joined back onto the corpus, and a map-side "
     "explode of the 1..n_copies sequence — the fact table is "
     "never shuffled, no window, no sort; output rows = the "
     "upsampled mix, ready to feed q152's shard shuffle."),
    ("q269_sig_asof_gate",
     "As-of on the embedding asset: same `_epoch <= 0` partition "
     "predicate on the signature AND vector scans, composed with "
     "the (table, sig) key IN-lists — snapshot reads cost the same "
     "pruned probe I/O as current reads; epoch-1's twin vectors "
     "are invisible exactly as if the probe ran before they "
     "committed."),
    ("q270_pq_recall",
     "Product quantization audit: all m subspace Lloyd codebooks "
     "train as ONE distributed job (subspace is a grouping column); "
     "encode is a broadcast-codebook argmin aggregate; ADC ranks "
     "via a broadcast LUT join over the codes — the original "
     "vectors are touched only by the exact ground truth and the "
     "top-50 re-rank. Scaled-int/DECIMAL arithmetic throughout, so "
     "the SQL oracle replays every stage bit-for-bit."),
    ("q271_ivf_adc_probe",
     "Stored IVF-ADC two-stage probe: stage 1's scan reads ONLY "
     "vec_id+codes+vnorm2 (ReadSchema drops the 64-double vector — "
     "asserted in tests/test_plans.py::"
     "test_ivf_adc_probe_plans_prune_columns_and_ids) with the "
     "probed cells as PartitionFilters; stage 2 re-reads vectors "
     "for the In(vec_id)-pushed shortlist only. Column bytes "
     "measured 0.081x of the vector column at the regenerated "
     "64-cell/256-row-file layout (0.032x at the r10 16-cell "
     "layout; tools/ivf_adc_probe_result.json)."),
    ("q272_mixed_shard_manifest",
     "Epoch-plan export: the mix's broadcast copy-spec join + "
     "map-side explode feed the manifest's ONE groupBy shuffle — "
     "no window sort (first/last via partial-aggable "
     "min_by/max_by), no fact-table shuffle before the shard "
     "aggregation, shard/order keys are portable hashes of "
     "(doc_id, copy_idx)."),
    ("q273_pq_drift_audit",
     "Codebook staleness audit: one pass over the stored asset "
     "(audit, not probe), broadcast codebook join, exact scaled-int "
     "distances, per-epoch DECIMAL error sums with one double cast "
     "— the dump is the checkpointed 3-row report; the 280x error "
     "jump on the shifted epoch is the retrain trigger."),
    ("q274_ter_eval",
     "TER eval: a shuffle-free projection — one Arrow kernel pass "
     "(vectorized Levenshtein, prefix-min insert fold) over the "
     "pair rows plus a single JVM division per row; eval cost "
     "linear in sum(m*n) across pairs, no cross-pair state (the "
     "q255 LCS envelope)."),
    ("q275_ivf_residual_probe",
     "Stored RESIDUAL IVF-PQ probe (round 11): SAME plan shape as "
     "q271 — stage 1 reads only the code columns with the probed "
     "cells as PartitionFilters, stage 2 re-reads vectors for the "
     "In(vec_id) shortlist — the residual numerator's coarse term "
     "rides the broadcast routing pairs as one extra int64 column "
     "(_cdot), so IVF-PQ-proper accuracy costs nothing at probe "
     "time."),
    ("q278_corpus_bleu",
     "Corpus multi-reference BLEU: per n the clip's count shuffles "
     "+ one max-over-references fold, then map-side-combinable "
     "global int64 sums; the single-row tails compose as 1x1 cross "
     "joins (the q268 scalar pattern) and the only float math is "
     "one final chain on scalars — no window over data, no "
     "fact-table re-shuffle across n."),
    ("q279_ivf_sq_probe",
     "int8 SQ tier probe: stage 1's ReadSchema carries "
     "vec_id+q8+q8n2 only (the vector column dropped — measured "
     "4.75x fewer column bytes); ranking inputs are exact int64 "
     "dots/norms (the per-vector scale cancels in the cosine); "
     "stage 2 is the shared In(vec_id)-pushed exact re-rank."),
    ("q280_filtered_ivf_probe",
     "Filtered stored-ANN probe: the label equality evaluates on "
     "the ALREADY cell-pruned scan right after the broadcast "
     "routing/query joins — a pre-filter (full k per query short "
     "of the stratum) adding zero shuffles and zero extra passes; "
     "the only shuffle remains the per-query rank window."),
    ("q282_instream_ivf_rebuild",
     "In-stream IVF lifecycle: per-epoch exactly-once appends from "
     "foreachBatch + rebuild() between batches from the admitting "
     "process; the dumped plan is the POST-REBUILD batch probe — "
     "one pruned cell scan + broadcast routing pairs over the "
     "retrained-and-folded asset, indistinguishable in shape from "
     "a never-rebuilt index (the cutover cost stays in the "
     "maintenance verb, not the probe)."),
    ("q283_residual_drift_audit",
     "Residual staleness audit: one column-pruned pass + ONE extra "
     "broadcast join vs q273 (the n_cells quantized-centroid frame "
     "to form residuals); per-epoch DECIMAL error sums with one "
     "double cast — same audit envelope, measuring the quantity "
     "residual codes actually describe."),
    ("q284_probe_coverage",
     "Probe-coverage audit: the coverage half reads NO vectors — "
     "per-cell counts off the partition column (map-side "
     "combinable) joined to broadcast routing pairs; the top-1 "
     "half is the one exact ground-truth pass the audit exists to "
     "pay; single-row total cross-joins in (the scalar pattern)."),
    ("q285_guaranteed_k_probe",
     "Guaranteed-k filtered ANN, brute-the-stratum path: the "
     "candidate-mass counting pass runs driver-side BEFORE this "
     "plan exists (a column-pruned (_cell, label) count), so the "
     "probe itself is still ONE scan — partition-pruned to exactly "
     "the cells CONTAINING the rare stratum (asserted in "
     "tests/test_plans.py::"
     "test_escalated_probe_reads_only_escalation_cells), label "
     "pre-filter on the pruned scan, per-query rank window."),
    ("q286_escalated_prefix_probe",
     "Guaranteed-k filtered ANN, prefix-escalation path: routing "
     "widens past nprobe by the cumulative-mass prefix rule "
     "(driver-side, no vectors read) and drops zero-mass prefix "
     "cells — the plan is the same single pruned scan with a wider "
     "cell IN-list; the escalation contract itself is byte-pinned "
     "by the q286 oracle's cumulative-sum window replay."),
    ("q287_corpus_chrf",
     "Corpus multi-reference chrF: per order, (id, gram) count "
     "shuffles + a max-over-references fold collapsing into "
     "map-side-combinable global int64 sums; single-row tails "
     "compose as 1x1 cross joins (the q278 scalar pattern); ONE "
     "float chain on the final scalars — no window over data, no "
     "fact re-shuffle across orders."),
    ("q288_corpus_ter",
     "Corpus multi-reference TER: one Arrow Levenshtein pass over "
     "the exploded (pair, reference) rows, a per-pair struct-min "
     "aggregate (best reference — min edits, ties shorter), then "
     "ONE global int64 sum pair and a single division; no window, "
     "no cross-pair state, cost linear in sum(m*n) across "
     "pair-reference combinations."),
    ("q289_drift_policy_stream",
     "Closed-loop drift→rebuild: the dumped plan is the final probe "
     "after the POLICY-fired mid-stream rebuild — the same pruned "
     "cell scan + broadcast routing shape as any probe; the policy "
     "cost (one O(asset) drift audit per batch here, per N batches "
     "in production) and the retry-safe batch-boundary placement "
     "live in the maintenance path, invisible to probes by design."),
    ("q290_sq_rerank0_recall",
     "int8-only fast path A/B: the rerank=0 side never reads the "
     "vector column (stage-1 ReadSchema is vec_id+q8+q8n2 — the "
     "only I/O the fast path pays); the exact side is the standard "
     "probe; the A/B joins two batch-probe outputs and aggregates "
     "per query — dimension-sized, no extra corpus pass."),
    ("q291_cell_balance",
     "Cell-balance audit: per-cell counts off the partition column "
     "only (map-side combinable, no vector bytes), LEFT-joined "
     "against the broadcast full cell range so empty cells count; "
     "one global aggregate row, one float division."),
    ("q292_recall_curve",
     "Recall-vs-nprobe curve: one exact all-cells baseline probe + "
     "one pruned probe per curve point, each the standard "
     "single-scan batch-probe shape; hits fold via LeftSemi joins "
     "into per-nprobe scalar rows — no per-query loops."),
    ("q293_stored_bm25_probe",
     "Persisted BM25 probe: the postings scan carries the probed "
     "terms' BUCKET list as PartitionFilters (file-level pruning on "
     "the portable-hash bucket key) and In(term) in PushedFilters "
     "(row-group pruning in term-sorted files); dl rides the "
     "posting rows so scoring never joins doclen — doclen serves "
     "one 2-column (N, avgdl) aggregate; query terms/df/stats all "
     "broadcast; the only shuffles are the per-(query, doc) score "
     "sum and the per-query rank window."),
    ("q294_hybrid_stored_retrieval",
     "Hybrid stored retrieval: BOTH legs are pruned stored-asset "
     "probes (bucket+term-pruned postings; cell-pruned IVF over "
     "hashed-BoW embeddings); the RRF fusion is a full-outer join "
     "of two k-sized rank lists + one fixed-order two-term double "
     "sum — candidate-sized, nothing corpus-sized after the legs."),
    ("q295_bm25_asof_probe",
     "BM25 as-of: the `_epoch <= -1` predicate prunes the appended "
     "epoch's partitions out of BOTH asset listings (postings AND "
     "doclen), composed with the bucket/term pruning — snapshot "
     "statistics (N, avgdl, df) cost the same pruned I/O as "
     "current-state reads."),
    ("q296_guaranteed_k_adc",
     "Guaranteed-k on the ADC tier: the escalated routing feeds the "
     "SAME code-column stage-1 scan as q271 (vec_id+codes+vnorm2 "
     "ReadSchema, stratum cells as PartitionFilters) — the "
     "guarantee changes which cells are listed, never the two-stage "
     "I/O shape; rerank ≥ stratum makes the exact re-rank cover the "
     "whole stratum."),
    ("q297_analyzer_bm25_probe",
     "Analyzer-composed BM25: the analyzed token expression "
     "(zero-width/control strip + regexp_extract_all word runs + "
     "lowercase/stopword/stem transforms) is a pure projection "
     "chain folded into the build's corpus pass; the probe plan is "
     "q293's shape unchanged — bucket PartitionFilters + In(term) "
     "pushdown — because queries analyze DRIVER-side through the "
     "bit-identical Python twin before any plan exists."),
    ("q299_unfiltered_guaranteed_k",
     "Unfiltered guaranteed-k: the probe scan lists exactly the "
     "escalation's surviving cells as PartitionFilters (the "
     "retraction-emptied cells are dropped); the mass-count "
     "decision pass happens driver-side BEFORE this plan exists, "
     "on a scan whose ReadSchema is struct<> — counts come from "
     "partition listing + parquet footers, no data columns "
     "(tests/test_plans.py pins both)."),
    ("q301_bm25_phrase_probe",
     "Positional phrase probe: SAME bucket+term-pruned postings "
     "scan as q293, now reading the pos column (the one consumer "
     "of it — BM25 probes column-prune it away, measured 0.298 of "
     "postings bytes); anchors are a projection (pos − idx), "
     "occurrences one (query, doc, anchor) count + one (query, "
     "doc) fold — candidate-sized shuffles, no positional join "
     "explosion."),
    ("q302_filtered_bm25_probe",
     "Metadata-filtered BM25: the label IN-list appears in the "
     "postings scan's PushedFilters NEXT TO In(term) — the "
     "denormalized metadata column filters at the scan, so no join "
     "materializes non-stratum candidates; stats become a per-label "
     "groupBy over doclen (|labels| rows, broadcast) and df counts "
     "per (term, label) — per-stratum statistics at the same "
     "pruned-I/O shape as the unfiltered probe."),
    ("q303_tenant_hybrid_retrieval",
     "Tenant-scoped hybrid: both legs keep their pruned shapes with "
     "the label composed in — postings scan with In(term) AND the "
     "label IN-list pushed, cell scan with the label equality on "
     "the pruned partitions; the RRF fusion stays candidate-sized. "
     "One shared index pair serves every tenant."),
    ("q298_hybrid_asof_retrieval",
     "Snapshot-consistent hybrid as-of (the round-13 headline scale "
     "claim): BOTH legs' scans carry the `_epoch <= 0` pin as "
     "PartitionFilters NEXT TO their own pruning — the postings "
     "scan stacks it on the bucket filter + In(term) pushdown, the "
     "cell scan on the probed-cell partitions — so epoch 1's "
     "partitions on both assets are pruned at FILE-LISTING time: "
     "yesterday's probe costs exactly yesterday's pruned I/O, and "
     "the retraction rewrite already removed the taken-down rows "
     "from every epoch it touched."),
    ("q300_bm25_probe_frames",
     "DataFrame-of-queries BM25 probe: the query frame tokenizes "
     "IN-PLAN through the same projection chain the build wrote "
     "(regexp extract + transforms — no UDF), and the exploded "
     "(query_id, term) pair frame BROADCASTS into the scoring "
     "join; the postings scan is q293's shape — bucket "
     "PartitionFilters + In(term) built from the driver-collected "
     "DISTINCT analyzed terms (bounded by query vocabulary, never "
     "by query count)."),
    ("q304_tenant_asof_hybrid",
     "Tenant + as-of through the FIRST-CLASS HybridRetriever "
     "(round 14): q303's label pushdown AND q298's `_epoch <= 0` "
     "pin compose on BOTH legs' scans from one retrieve() call — "
     "postings: bucket PartitionFilters stacked with the epoch pin, "
     "In(term) + In(lbl) side by side in PushedFilters; cells: "
     "probed partitions ∩ epoch pin with the label equality on the "
     "pruned rows. The fusion (operators/retrieval.py) adds one "
     "candidate-sized full join + per-query rank window."),
    ("q305_tenant_phrase_probe",
     "Tenant-scoped phrase probe, frames form (round 14): phrase "
     "text tokenizes in-plan with posexplode supplying the anchor "
     "offsets; the postings scan keeps q301's bucket + In(term) "
     "pruning with the label IN-list pushed beside it, reads the "
     "pos column (phrase probes are its only consumer), and the "
     "anchor vote is a (query, doc, anchor) count + (query, doc) "
     "fold — candidate-sized shuffles, per-stratum by the scan "
     "filter + per-query label equality."),
    ("q306_unicode_analyzer_probe",
     "Unicode analyzer probe (round 14): the [\\p{L}\\p{N}]+ "
     "extraction + lowercase-fold transforms are a pure projection "
     "chain in the build's corpus pass (no UDF — regexp + "
     "higher-order transforms); the probe plan is q293's shape "
     "unchanged (bucket PartitionFilters + In(term)) because "
     "queries analyze driver-side through the bit-identical Python "
     "twin; multilingual terms hash into the same bucket scheme."),
    ("q307_snapshot_hybrid_retrieval",
     "Snapshot-manifest hybrid (round 14): the plans are q298's — "
     "the manifest resolves to each asset's epoch pin DRIVER-side "
     "(a filesystem walk validating the epoch layout) before any "
     "plan exists, so both legs' scans show the same "
     "`_epoch <= 0` PartitionFilters; one published id replaces "
     "two caller-paired ints at zero plan cost."),
    ("q308_tenant_sq_hybrid",
     "Tenant capstone on the compressed tier (round 14): the dense "
     "leg's stage-1 scan reads ONLY (vec_id, q8, q8n2, lbl) — the "
     "vector column never enters ReadSchema — over the "
     "escalation's stratum cells as PartitionFilters; stage 2 "
     "exact-reranks the 3-row shortlist through a vec_id-IN-pruned "
     "read; the lexical leg is q302's per-stratum shape; the "
     "guarantee (min_results = stratum size) decides routing "
     "driver-side from footer counts before the plan exists."),
    ("q309_lexical_gate_stream",
     "Streaming lexical gate (round 14): per micro-batch, ONE "
     "bucket/term-pruned postings scan feeds the order-invariant "
     "term-overlap novelty gate (exact integer counts; "
     "exclude_epoch keeps a retried batch blind to its own crashed "
     "attempt), and admitted docs' postings append to the SAME "
     "stored asset with per-epoch dynamic overwrite; the in-stream "
     "compaction folds the asset between batches under the writer "
     "lease. Checkpointed stages show the pruned scan + the "
     "batch-sized gate joins."),
    ("q310_tenant_hybrid_frames",
     "Frames form of the fused operator: ONE query frame drives "
     "both legs — the lexical leg's tokenization is an in-plan "
     "projection (no driver dict anywhere), the pair frame "
     "broadcasts into the scoring join, and the label pushdown + "
     "pruning shapes are q303's unchanged (byte-identical output, "
     "same oracle)."),
    ("q311_multilingual_phrase_probe",
     "Multilingual tenant phrase probe: the unicode analyzer's "
     "extraction+fold transforms tokenize the phrase frame "
     "in-plan; the postings scan stacks bucket PartitionFilters "
     "with In(term) over NON-LATIN terms and the label IN-list; "
     "positions decode only on the pruned stratum rows and the "
     "anchor vote stays candidate-sized."),
]

#: conf overrides applied while dumping a pick (restored after) —
#: used to show the at-scale plan where the tiny test SF would let
#: the planner pick a size-degenerate (still correct) strategy.
PICK_CONF = {
    "q125_bucketed_join_revenue": {
        "spark.sql.autoBroadcastJoinThreshold": "-1"},
}


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().rstrip()


class _CheckpointSpy:
    """Capture the plan of every DataFrame at the moment it
    localCheckpoints (VERDICT r11 item 2): checkpointed suite
    queries otherwise dump only `Scan ExistingRDD` — the constituent
    stage plans (the pruned cell scans, code-column ReadSchemas,
    shortlist windows the prose talks about) live BEFORE the
    checkpoint barrier. The spy explains each frame, then delegates
    to the real localCheckpoint; per pick the LAST few captures are
    the result-side stages (early captures are usually tiny query
    frames)."""

    def __init__(self):
        self.plans: list[str] = []
        self._orig = None
        self._cls = None

    def __enter__(self):
        # patch the CLASSIC DataFrame (Spark 4 splits classic /
        # connect; suite queries run classic here)
        try:
            from pyspark.sql.classic.dataframe import DataFrame
        except ImportError:  # older layouts
            from pyspark.sql.dataframe import DataFrame
        self._cls = DataFrame
        self._orig = DataFrame.localCheckpoint
        spy = self

        def wrapped(df, *a, **kw):
            try:
                spy.plans.append(_formatted_plan(df))
            except Exception:  # noqa: BLE001 — never break the run
                pass
            return spy._orig(df, *a, **kw)

        DataFrame.localCheckpoint = wrapped
        return self

    def __exit__(self, *exc):
        self._cls.localCheckpoint = self._orig
        return False


def main() -> None:
    from industrial_data_pipeline_spark.session import get_spark
    from industrial_data_pipeline_spark.suite import REGISTRY

    spark = get_spark("idp-explain", cores=8)
    out = [
        "# EXPLAINS — physical-plan evidence",
        "",
        "Generated by `python tools/explain_dump.py` at sf0.001 "
        "(plan shapes are SF-independent; AQE may further coalesce "
        "at runtime). Each section states the scale property the "
        "plan is expected to exhibit; `tests/test_plans.py` asserts "
        "the load-bearing ones so refactors can't silently regress "
        "them.",
        "",
    ]
    from industrial_data_pipeline_spark.streaming.queries import (
        LAST_STREAM_PLANS)

    for name, why in PICKS:
        fn, _ = REGISTRY[name]
        overrides = PICK_CONF.get(name, {})
        saved = {k: spark.conf.get(k) for k in overrides}
        for k, v in overrides.items():
            spark.conf.set(k, v)
        # ADVICE r13: snapshot key→plan (not just the key set) so a
        # pick that RE-RUNS a streaming flow whose sink name was
        # already captured still dumps its refreshed executed plan
        stream_before = dict(LAST_STREAM_PLANS)
        try:
            with _CheckpointSpy() as spy:
                df = fn(spark, SF)
                plan = _formatted_plan(df)
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)
        out += [f"## {name}", "", why, "", "```", plan, "```", ""]
        # memory-sink streaming flows dump only the batch read-back of
        # the sink — append the EXECUTED micro-batch plan captured at
        # awaitTermination (VERDICT r12 item 7: the stream-stream join
        # / watermark operators live there, nowhere else)
        for key in sorted(k for k, v in LAST_STREAM_PLANS.items()
                          if stream_before.get(k) != v):
            out += [f"### {name} — executed micro-batch plan "
                    f"(last batch, sink `{key}`)", "",
                    "```", LAST_STREAM_PLANS[key].rstrip(), "```",
                    ""]
        # a checkpointed result dumps as `Scan ExistingRDD` — show
        # the real constituent stage plans captured at each
        # localCheckpoint instead (last 3 = the result-side stages;
        # streams checkpoint per batch, so the tail is the final
        # batch's shape)
        if "ExistingRDD" in plan and spy.plans:
            shown = spy.plans[-3:]
            skipped = len(spy.plans) - len(shown)
            note = (f"Constituent stage plans captured at "
                    f"localCheckpoint (last {len(shown)}"
                    + (f" of {len(spy.plans)}" if skipped else "")
                    + "):")
            out += [note, ""]
            for i, p in enumerate(shown, 1):
                out += [f"### {name} — stage checkpoint "
                        f"{skipped + i}/{len(spy.plans)}", "",
                        "```", p, "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "EXPLAINS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote EXPLAINS.md")


if __name__ == "__main__":
    main()
