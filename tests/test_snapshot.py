"""catalog/snapshot.py (VERDICT r13 item 4): one published id must
pin BOTH assets of a hybrid store, resolve to each asset's epoch
bound with validation, and fail LOUDLY — never silently mix
snapshots — when the store moved under the pin (compaction folding
the pinned epochs away, a retraction emptying one, an asset the
manifest never covered)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from industrial_data_pipeline_spark.catalog.snapshot import (
    Snapshot, SnapshotStore, disk_epochs, resolve_as_of)


def _docs(spark, n=30):
    return spark.createDataFrame(
        [(i, f"spark merge batch row{i % 5} alpha") for i in range(n)],
        "doc_id long, text string")


def _bm25(spark, tmp_path, name="b"):
    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)
    docs = _docs(spark)
    idx = StoredBm25Index(spark, str(tmp_path / name), n_buckets=4)
    idx.build(docs.where("doc_id < 10"))
    idx.append(docs.where("doc_id >= 10 and doc_id < 20"),
               epoch_id=0)
    return idx, docs


def test_publish_open_resolve_round_trip(spark, tmp_path):
    idx, _ = _bm25(spark, tmp_path)
    store = SnapshotStore(str(tmp_path / "snaps"))
    snap = store.publish("eval-1", [idx.root])
    root = os.path.abspath(idx.root)
    assert snap.assets[root] == (0, (-1, 0))
    assert disk_epochs(idx.root) == (-1, 0)
    assert snap.resolve(idx.root) == 0
    reopened = store.open("eval-1")
    assert reopened.resolve(idx.root) == 0
    assert store.list_ids() == ["eval-1"]
    # ids are immutable history
    with pytest.raises(ValueError, match="immutable"):
        store.publish("eval-1", [idx.root])
    with pytest.raises(ValueError, match="invalid snapshot id"):
        store.publish("../escape", [idx.root])
    with pytest.raises(ValueError, match="no _epoch"):
        store.publish("eval-2", [str(tmp_path / "nothing")])
    # resolve_as_of passthrough + type contract
    assert resolve_as_of(None, idx.root) is None
    assert resolve_as_of(-1, idx.root) == -1
    with pytest.raises(TypeError):
        resolve_as_of("eval-1", idx.root)


def test_snapshot_probe_equals_int_probe_and_appends_ok(
        spark, tmp_path):
    """A Snapshot in as_of_epoch must probe byte-identically to the
    raw int it pins — on the BM25 index, the IVF index, and through
    HybridRetriever — and epochs appended AFTER publish never
    invalidate it (they prune away)."""
    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)
    from industrial_data_pipeline_spark.operators.retrieval import (
        HybridRetriever)
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)
    from industrial_data_pipeline_spark.operators.text import (
        hashed_bow_embedding)

    docs = _docs(spark)
    emb = docs.select(
        "doc_id", hashed_bow_embedding(F.col("text"), 8).alias("_v"))
    bidx = StoredBm25Index(spark, str(tmp_path / "b"), n_buckets=4)
    bidx.build(docs.where("doc_id < 10"))
    bidx.append(docs.where("doc_id >= 10 and doc_id < 20"),
                epoch_id=0)
    vidx = StoredIvfIndex(spark, str(tmp_path / "v"),
                          id_col="doc_id", vec_col="_v", n_cells=4)
    vidx.build(emb.where("doc_id < 10"))
    vidx.append(emb.where("doc_id >= 10 and doc_id < 20"),
                epoch_id=0)
    snap = SnapshotStore(str(tmp_path / "s")).publish(
        "pin", [bidx.root, vidx.root])
    # the store moves on: epoch 1 on both
    bidx.append(docs.where("doc_id >= 20"), epoch_id=1)
    vidx.append(emb.where("doc_id >= 20"), epoch_id=1)

    q = {100: "spark merge", 101: "alpha batch"}
    qv = (spark.createDataFrame(sorted(q.items()),
                                "qid long, qtext string")
          .select("qid", hashed_bow_embedding(F.col("qtext"), 8)
                  .alias("_qv")))

    assert sorted(map(tuple,
                      bidx.probe(q, k=5, as_of_epoch=snap)
                      .collect())) == \
        sorted(map(tuple,
                   bidx.probe(q, k=5, as_of_epoch=0).collect()))
    assert sorted(map(tuple,
                      vidx.probe_batch(qv, k=5, nprobe=2,
                                       id_col="qid", vec_col="_qv",
                                       as_of_epoch=snap)
                      .collect())) == \
        sorted(map(tuple,
                   vidx.probe_batch(qv, k=5, nprobe=2,
                                    id_col="qid", vec_col="_qv",
                                    as_of_epoch=0).collect()))
    hyb = HybridRetriever(bidx, vidx)
    assert sorted(map(tuple,
                      hyb.retrieve(q, qv, k=5, leg_k=5, nprobe=2,
                                   id_col="qid", vec_col="_qv",
                                   as_of_epoch=snap).collect())) == \
        sorted(map(tuple,
                   hyb.retrieve(q, qv, k=5, leg_k=5, nprobe=2,
                                id_col="qid", vec_col="_qv",
                                as_of_epoch=0).collect()))
    # phrase + frames forms accept the manifest too
    assert sorted(map(tuple,
                      bidx.phrase_probe({0: "spark merge"},
                                        as_of_epoch=snap)
                      .collect())) == \
        sorted(map(tuple,
                   bidx.phrase_probe({0: "spark merge"},
                                     as_of_epoch=0).collect()))


def test_compacted_away_epoch_fails_loudly(spark, tmp_path):
    """The acceptance test of the whole module: compact() folds
    every epoch into _epoch=-1, so a pre-compaction manifest MUST
    refuse to probe (an _epoch <= pin filter over the folded asset
    would silently include post-snapshot rows)."""
    idx, docs = _bm25(spark, tmp_path)
    snap = SnapshotStore(str(tmp_path / "s")).publish(
        "pin", [idx.root])
    idx.append(docs.where("doc_id >= 20"), epoch_id=1)
    idx.compact()
    assert disk_epochs(idx.root) == (-1,)
    with pytest.raises(ValueError, match="compacted"):
        idx.probe({0: "spark"}, as_of_epoch=snap)
    # the raw-int probe demonstrates the silent mixing the manifest
    # refuses: epoch 1's docs (folded into -1) now pass _epoch <= 0
    leaked = {r.doc_id for r in
              idx.probe({0: "spark"}, k=50, as_of_epoch=0)
              .collect()}
    assert any(d >= 20 for d in leaked)


def test_emptied_epoch_fails_loudly(spark, tmp_path):
    """A retraction that wipes out EVERY row of a pinned epoch
    removes its partitions — the manifest notices the moved layout
    and refuses rather than answering from a shape the snapshot
    never saw. (Partial retractions keep all epoch dirs and stay
    valid — the q298 takedown semantics, pinned by q307.)"""
    idx, docs = _bm25(spark, tmp_path)
    snap = SnapshotStore(str(tmp_path / "s")).publish(
        "pin", [idx.root])
    # partial retraction: epoch 0 keeps other docs — still valid
    idx.retract([10, 11])
    assert idx.probe({0: "spark"}, k=3, as_of_epoch=snap).count() > 0
    # now empty epoch 0 entirely (docs 10..19)
    idx.retract(list(range(10, 20)))
    assert disk_epochs(idx.root) == (-1,)
    with pytest.raises(ValueError, match="changed"):
        idx.probe({0: "spark"}, as_of_epoch=snap)


def test_uncovered_asset_fails_loudly(spark, tmp_path):
    idx, _ = _bm25(spark, tmp_path, "b1")
    other, _ = _bm25(spark, tmp_path, "b2")
    snap = SnapshotStore(str(tmp_path / "s")).publish(
        "pin", [idx.root])
    with pytest.raises(ValueError, match="does not cover"):
        other.probe({0: "spark"}, as_of_epoch=snap)


def test_snapshot_is_immutable_mapping():
    s = Snapshot("x", {"/a": (0, (-1, 0))})
    with pytest.raises(ValueError, match="does not cover"):
        s.resolve("/elsewhere")
