"""Streaming derived-attribute maintenance (T5): micro-batch recompute
must reach the same final state as the reference's per-row triggers."""

import os
from datetime import datetime

import pytest

from industrial_data_pipeline_spark.api import Pipeline
from industrial_data_pipeline_spark.streaming.derived import (
    DerivedMaintenance,
)

from tests.fixtures import write_tree

T = datetime


@pytest.fixture()
def pipe(spark, tmp_path):
    p = Pipeline(spark, str(tmp_path / "wh"))
    p.create_database("plant")
    p.load_tree("plant", write_tree(tmp_path))
    # derived: mean of attrs 1 (FanA|Temperature) and 2 (FanA|Pressure);
    # no history yet → backfill no-ops, maintenance does the work
    p.insert_attribute("plant", element_id=3, name="AvgTP",
                       formula="($1 + $2) / 2")
    return p


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "attribute_id long, timestamp timestamp, value double")


def test_batchwise_trigger_semantics(spark, pipe):
    m = DerivedMaintenance(spark, pipe.store, "plant")
    t0, t1 = T(2025, 1, 1, 0, 0), T(2025, 1, 1, 0, 1)

    # batch 1: only attr 1 arrives → guard holds, no derived row
    m.process_batch(_batch(spark, [(1, t0, 10.0), (1, t1, 12.0)]))
    arch = pipe.store.archive_values("plant")
    assert arch.where("attribute_id = 4").count() == 0

    # batch 2: attr 2 arrives at t0 only → derived appears at t0 only,
    # using the sibling value stored by batch 1 (cross-batch alignment)
    m.process_batch(_batch(spark, [(2, t0, 20.0)]))
    arch = pipe.store.archive_values("plant")
    got = arch.where("attribute_id = 4").collect()
    assert [(r.timestamp, r.value) for r in got] == [(t0, 15.0)]

    # batch 3: re-send attr 1 at t0 with a new value → trigger is
    # ON CONFLICT DO UPDATE (last-wins): derived recomputed
    m.process_batch(_batch(spark, [(1, t0, 30.0)]))
    arch = pipe.store.archive_values("plant")
    assert arch.where("attribute_id = 4").first().value == 25.0
    # source row itself also updated last-wins
    assert arch.where("attribute_id = 1 AND timestamp = "
                      f"'{t0}'").first().value == 30.0


def test_streaming_end_to_end(spark, pipe, tmp_path):
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(staging)
    m = DerivedMaintenance(spark, pipe.store, "plant")
    q = m.attach_staging_dir(staging, ckpt)
    try:
        t0 = T(2025, 1, 1, 0, 0)
        _batch(spark, [(1, t0, 10.0)]).write.mode("append").parquet(staging)
        q.processAllAvailable()
        _batch(spark, [(2, t0, 20.0)]).write.mode("append").parquet(staging)
        q.processAllAvailable()
    finally:
        q.stop()
    arch = pipe.store.archive_values("plant")
    rows = {(r.attribute_id, r.timestamp, r.value) for r in arch.collect()}
    assert rows == {(1, t0, 10.0), (2, t0, 20.0), (4, t0, 15.0)}


def test_two_derived_formulas_one_batch(spark, pipe):
    """Regression: with TWO derived formulas over intersecting
    sources, the first formula's upsert rewrites the affected
    partitions; the second must read a FRESH archive frame — a frame
    built before the loop scans the deleted file listing and dies
    with FileNotFoundException."""
    pipe.insert_attribute("plant", element_id=3, name="DiffTP",
                          formula="$1 - $2")
    m = DerivedMaintenance(spark, pipe.store, "plant")
    t0 = T(2025, 1, 1, 0, 0)
    m.process_batch(_batch(spark, [(1, t0, 10.0), (2, t0, 4.0)]))
    vals = {r.attribute_id: r.value for r in
            pipe.store.archive_values("plant").collect()}
    # AvgTP = (10+4)/2 = 7, DiffTP = 10-4 = 6 (derived ids allocated
    # in insert order after the sources)
    derived = sorted(v for k, v in vals.items() if k not in (1, 2))
    assert derived == [6.0, 7.0]


def test_session_merge_never_regresses_open_end():
    """Cross-batch late event: within-batch sort does not order events
    against the STATE-carried open session, so an event earlier than
    the carried end must widen the span (min/max), not overwrite it —
    a regressed end makes the next gap test split a live session."""
    from industrial_data_pipeline_spark.streaming.queries import (
        _merge_session_events)
    mn = 60_000_000  # one minute in µs
    gap = 30 * mn
    # carried open session: 09:30–10:00 (2 events)
    cur = [570 * mn, 600 * mn, 2, 0]
    # batch 2: late 09:45, then 10:25 (25 min after the true end)
    done, cur = _merge_session_events(cur, [585 * mn, 625 * mn],
                                      [0, 0], gap)
    assert done == []              # buggy end-regression would split
    assert cur == [570 * mn, 625 * mn, 4, 0]
    # a late event can also extend the span BACKWARDS
    done, cur = _merge_session_events(cur, [560 * mn], [0], gap)
    assert done == [] and cur[0] == 560 * mn and cur[1] == 625 * mn
    # and a genuine gap still splits
    done, cur = _merge_session_events(cur, [700 * mn], [7], gap)
    assert len(done) == 1 and cur == [700 * mn, 700 * mn, 1, 7]


def test_streaming_lsh_gate_cross_batch_state(spark):
    """q240's load-bearing property: batch 2's near-dup mutants of
    batch 1's ADMITTED documents are rejected — possible only if
    batch 1's admissions really advanced the corpus between
    micro-batches (cross-batch state through the store, not
    intra-batch luck)."""
    from industrial_data_pipeline_spark.suite_llm import (
        q_streaming_lsh_gate)
    out = {r.doc_id: r for r in
           q_streaming_lsh_gate(spark,
                                "/root/testdata/sf0.001").collect()}
    # batch-1 mutants of corpus docs: rejected against the base corpus
    assert all(not out[700000 + i].admitted for i in range(5))
    # batch-1 fresh (token-reversed) docs: admitted
    assert all(out[710100 + i].admitted for i in range(5))
    # batch-2 mutants of the batch-1 ADMISSIONS: rejected (the
    # cross-batch proof — their only possible match is a 710xxx doc)
    assert all(not out[720100 + i].admitted
               and out[720100 + i].n_matches >= 1 for i in range(5))
    # batch-2 fresh docs: admitted
    assert all(out[730105 + i].admitted for i in range(5))
