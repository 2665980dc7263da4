"""Lease-file writer lock (catalog/lease.py) — the cross-node form of
the single-writer boundary (VERDICT r7 item 4).

Covers: atomic acquisition, live-holder rejection, stale takeover
(holder died — no kernel to release a lease, unlike flock), fencing
token monotonicity, loss detection within a heartbeat interval,
takeover-marker serialization, and the ParquetStore lease backend
end-to-end including backend-mix rejection and a true multi-process
mutual-exclusion race."""

import json
import os
import subprocess
import sys
import time

import pytest

from industrial_data_pipeline_spark.catalog.lease import (
    LeaseHeldError, LeaseLock)


def test_acquire_release_roundtrip(tmp_path):
    path = str(tmp_path / "db.lease")
    lk = LeaseLock(path, ttl_s=2.0)
    token = lk.acquire(timeout_s=1.0)
    assert token == 1
    assert json.load(open(path))["owner"] == lk.owner
    lk.release()
    assert not os.path.exists(path)


def test_live_holder_rejects_second_acquirer(tmp_path):
    path = str(tmp_path / "db.lease")
    a = LeaseLock(path, ttl_s=5.0)
    a.acquire()
    b = LeaseLock(path, ttl_s=5.0)
    t0 = time.monotonic()
    with pytest.raises(LeaseHeldError) as ei:
        b.acquire(timeout_s=0.3)
    assert time.monotonic() - t0 < 2.0
    assert a.owner in str(ei.value)  # holder surfaced in the error
    a.release()


def test_stale_lease_taken_over_and_fence_increments(tmp_path):
    """A lease whose holder died (no heartbeat for >= ttl) is stolen;
    the fencing token strictly increases across ownerships."""
    path = str(tmp_path / "db.lease")
    a = LeaseLock(path, ttl_s=0.5)
    assert a.acquire() == 1
    # simulate holder death: stop heartbeating WITHOUT deleting
    a._stop.set()
    a._thread.join()
    time.sleep(0.7)  # let the lease go stale
    b = LeaseLock(path, ttl_s=0.5)
    assert b.acquire(timeout_s=2.0) == 2
    assert json.load(open(path))["owner"] == b.owner
    b.release()


def test_heartbeat_keeps_lease_fresh_past_ttl(tmp_path):
    """A healthy holder is NOT stolen from even after > ttl wall
    time — the heartbeat renews hb_ts."""
    path = str(tmp_path / "db.lease")
    a = LeaseLock(path, ttl_s=0.6)
    a.acquire()
    time.sleep(1.5)  # 2.5 ttls; heartbeat every 0.2s keeps it fresh
    b = LeaseLock(path, ttl_s=0.6)
    with pytest.raises(LeaseHeldError):
        b.acquire(timeout_s=0.3)
    assert not a.lost.is_set()
    a.release()


def test_overtaken_holder_detects_loss(tmp_path):
    """If the lease changes owner under a holder (it stalled past the
    ttl and was stolen), the holder's heartbeat sets .lost within one
    interval and stops renewing."""
    path = str(tmp_path / "db.lease")
    a = LeaseLock(path, ttl_s=0.6)
    a.acquire()
    usurper = {"owner": "other:1:deadbeef", "pid": 1,
               "hb_ts": time.time(), "token": 99}
    with open(path + ".tmp2", "w") as fh:
        json.dump(usurper, fh)
    os.replace(path + ".tmp2", path)
    assert a.lost.wait(timeout=2.0)
    a.release()  # must NOT delete the usurper's lease
    assert json.load(open(path))["owner"] == "other:1:deadbeef"


def test_takeover_marker_blocks_second_stealer(tmp_path):
    """While one stealer's .takeover marker exists, another stealer
    backs off; an ABANDONED marker (older than ttl) is cleared."""
    path = str(tmp_path / "db.lease")
    stale = {"owner": "dead:1:x", "pid": 1, "hb_ts": 0.0, "token": 1}
    with open(path, "w") as fh:
        json.dump(stale, fh)
    with open(path + ".fence", "w") as fh:
        fh.write("1")  # the dead holder's acquisition bumped it to 1
    marker = path + ".takeover"
    with open(marker, "w") as fh:
        fh.write("live-stealer")
    b = LeaseLock(path, ttl_s=5.0)
    assert b._try_takeover(stale) is False  # marker held, fresh mtime
    old = time.time() - 60
    os.utime(marker, (old, old))  # abandoned marker
    assert b.acquire(timeout_s=2.0) == 1 + 1  # clears marker, steals
    b.release()


def test_takeover_aborts_if_lease_changed_under_marker(tmp_path):
    """The stealer re-reads after winning the marker: a heartbeat that
    landed since the staleness check aborts the steal (no unlink of a
    live lease)."""
    path = str(tmp_path / "db.lease")
    observed = {"owner": "slow:1:x", "pid": 1, "hb_ts": 0.0, "token": 3}
    renewed = dict(observed, hb_ts=time.time())
    with open(path, "w") as fh:
        json.dump(renewed, fh)  # on disk: already renewed
    b = LeaseLock(path, ttl_s=1.0)
    assert b._try_takeover(observed) is False
    assert json.load(open(path))["owner"] == "slow:1:x"
    assert not os.path.exists(path + ".takeover")  # marker cleaned


# --------------------------------------- ParquetStore lease backend


def test_store_lease_backend_end_to_end(spark, tmp_path):
    """A store constructed with lock_backend='lease' runs writes under
    the lease, releases it after, and a second LIVE process' store
    gets ConcurrentWriterError while a dead holder's stale lease is
    taken over."""
    from industrial_data_pipeline_spark.catalog.store import (
        ConcurrentWriterError, ParquetStore)
    root = str(tmp_path / "wh")
    store = ParquetStore(spark, root, lock_backend="lease")
    store.create_database("db")
    with store.write_lock("db"):
        with store.write_lock("db"):  # reentrant under one lease
            pass
        assert os.path.exists(store._lock_path("db") + ".lease")
    assert not os.path.exists(store._lock_path("db") + ".lease")

    # live foreign holder (child process heartbeats a LeaseLock)
    child = subprocess.Popen(
        [sys.executable, "-c", r"""
import sys, time
sys.path.insert(0, "/root/repo")
from industrial_data_pipeline_spark.catalog.lease import LeaseLock
lk = LeaseLock(sys.argv[1], ttl_s=10.0)
lk.acquire()
print("HELD", flush=True)
time.sleep(float(sys.argv[2]))
lk.release()
""", store._lock_path("db") + ".lease", "15"],
        stdout=subprocess.PIPE, text=True)
    try:
        assert child.stdout.readline().strip() == "HELD"
        with pytest.raises(ConcurrentWriterError):
            with store.write_lock("db", timeout_s=0.3):
                pass
    finally:
        child.kill()
        child.wait()
    # dead holder: lease is stale after its ttl; our acquire with the
    # default 10s ttl needs the file's age to exceed OUR ttl — rewrite
    # hb_ts to the past to simulate the elapsed staleness window
    lease_path = store._lock_path("db") + ".lease"
    cur = json.load(open(lease_path))
    cur["hb_ts"] = time.time() - 60
    with open(lease_path, "w") as fh:
        json.dump(cur, fh)
    with store.write_lock("db", timeout_s=5.0):
        pass


def test_store_rejects_mixed_lock_backends(spark, tmp_path):
    from industrial_data_pipeline_spark.catalog.store import (
        ConcurrentWriterError, ParquetStore)
    root = str(tmp_path / "wh")
    a = ParquetStore(spark, root, lock_backend="lease")
    a.create_database("db")  # registers lease state for (root, db)
    b = ParquetStore(spark, root)  # default flock
    with pytest.raises(ConcurrentWriterError):
        with b.write_lock("db"):
            pass
    with pytest.raises(ValueError):
        ParquetStore(spark, root, lock_backend="zookeeper")


def test_lease_race_single_winner(tmp_path):
    """True multi-process mutual exclusion under the lease backend:
    6 processes contend; a witness file proves no two were ever
    inside the lock at once."""
    import multiprocessing as mp

    code = r"""
import os, sys, time
sys.path.insert(0, "/root/repo")
from industrial_data_pipeline_spark.catalog.store import ParquetStore

store = ParquetStore.__new__(ParquetStore)
store.root = sys.argv[1]
store.lock_backend = "lease"
witness = os.path.join(sys.argv[1], "witness")
with store.write_lock("db", timeout_s=30.0):
    assert not os.path.exists(witness), "second writer inside lease!"
    open(witness, "w").close()
    time.sleep(0.05)
    os.remove(witness)
print("OK")
"""
    root = str(tmp_path / "race")
    os.makedirs(root, exist_ok=True)

    def _run(code, root):
        r = subprocess.run([sys.executable, "-c", code, root],
                           capture_output=True, text=True, timeout=55)
        if r.returncode != 0 or "OK" not in r.stdout:
            raise SystemExit(r.stderr[-500:] or 1)

    procs = [mp.Process(target=_run, args=(code, root))
             for _ in range(6)]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=60)
    assert all(p.exitcode == 0 for p in procs), \
        [p.exitcode for p in procs]


def test_corrupt_lease_does_not_busy_spin_and_self_heals(tmp_path):
    """ADVICE r8: a lease file with unparseable content (crash window
    of a non-atomic creator, or a torn read) must neither spin the
    CPU forever nor ignore timeout_s. Fresh corrupt content times out
    with a clear error; corrupt content older than ttl (by mtime) is
    takeover-eligible, so a crashed creator self-heals."""
    path = str(tmp_path / "db.lease")
    open(path, "w").close()  # empty = unparseable
    lk = LeaseLock(path, ttl_s=5.0)
    t0 = time.monotonic()
    with pytest.raises(LeaseHeldError) as ei:
        lk.acquire(timeout_s=0.4)  # fresh mtime → honors the deadline
    elapsed = time.monotonic() - t0
    assert 0.3 <= elapsed < 3.0  # no infinite spin, deadline honored
    assert "unparseable" in str(ei.value)
    # age the corrupt file past ttl → stale-takeover self-heal
    old = time.time() - 6.0
    os.utime(path, (old, old))
    token = lk.acquire(timeout_s=2.0)
    assert token == 1
    assert json.load(open(path))["owner"] == lk.owner
    lk.release()


def test_lease_file_never_observable_without_payload(tmp_path):
    """ADVICE r8: the create publishes payload atomically (os.link of
    a pre-written tmp), so the lease file, whenever it exists, always
    parses with owner + hb_ts — and the fence never advances for an
    acquisition that wasn't published."""
    path = str(tmp_path / "db.lease")
    lk = LeaseLock(path, ttl_s=5.0)
    lk.acquire(timeout_s=1.0)
    cur = json.load(open(path))
    assert cur["owner"] == lk.owner and cur["hb_ts"] > 0
    assert cur["token"] == 1  # rewritten with the minted token
    # a second contender's failed create leaves no tmp litter and
    # does not bump the fence
    b = LeaseLock(path, ttl_s=5.0)
    with pytest.raises(LeaseHeldError):
        b.acquire(timeout_s=0.2)
    assert int(open(path + ".fence").read()) == 1
    leftovers = [f for f in os.listdir(os.path.dirname(path))
                 if f.endswith(".create.tmp")]
    assert leftovers == []
    lk.release()


def test_zombie_writer_fencing_check_rejects_stale_token(tmp_path):
    """The fencing token made actionable: holder A pauses past the
    ttl, B legitimately takes over (token bumps), A wakes — A's
    pre-commit still_valid() is False so A aborts instead of
    corrupting B's writes; B's own check passes. Re-acquisition gives
    A a fresh, again-valid token."""
    path = str(tmp_path / "db.lease")
    a = LeaseLock(path, ttl_s=0.5)
    assert a.acquire() == 1
    assert a.still_valid()
    a._stop.set()
    a._thread.join()          # simulate a GC/VM pause: no heartbeats
    time.sleep(0.7)           # ttl expires
    b = LeaseLock(path, ttl_s=0.5)
    assert b.acquire(timeout_s=2.0) == 2
    # A wakes up and wants to commit — the check must stop it
    assert not a.still_valid()
    assert b.still_valid()
    b.release()
    # A can re-acquire and is valid again with a fresh token
    assert a.acquire(timeout_s=2.0) == 3
    assert a.still_valid()
    a.release()


def test_zombie_compactor_aborts_before_rename(spark, tmp_path):
    """VERDICT r9 item 1 end-to-end: a compactor whose lease expired
    mid-write (GC/VM pause) and was overtaken must ABORT at the swap's
    commit point — live dir untouched, staging discarded — while the
    legitimate new holder's compaction commits normally."""
    from industrial_data_pipeline_spark.catalog.lease import (
        LeaseLostError)
    from industrial_data_pipeline_spark.operators.lsh_index import (
        compact_parquet_dir)

    data = str(tmp_path / "asset")
    (spark.range(0, 40).selectExpr("id AS doc_id")
     .repartition(4).write.parquet(data))
    before = sorted(r.doc_id
                    for r in spark.read.parquet(data).collect())
    lease = str(tmp_path / "writer.lease")
    a = LeaseLock(lease, ttl_s=0.5)
    assert a.acquire() == 1
    a._stop.set()
    a._thread.join()          # simulate a GC/VM pause: no heartbeats
    time.sleep(0.7)           # ttl expires
    b = LeaseLock(lease, ttl_s=0.5)
    assert b.acquire(timeout_s=2.0) == 2   # legitimate takeover
    # zombie A wakes and tries to commit its compaction
    with pytest.raises(LeaseLostError):
        compact_parquet_dir(spark, data, ("doc_id",), lock=a)
    assert sorted(r.doc_id for r in
                  spark.read.parquet(data).collect()) == before
    import glob
    assert glob.glob(data + "_compact_tmp*") == []
    assert not os.path.isdir(data + "_compact_old")
    # the staging path is TOKEN-suffixed per acquisition, so even if
    # the zombie aborted while the new holder had staging in flight,
    # it could only ever have deleted its own dir (self-review r10)
    # the new holder's compaction passes its (valid) lock and commits
    stats = compact_parquet_dir(spark, data, ("doc_id",), lock=b)
    assert stats["files_after"] >= 1
    assert sorted(r.doc_id for r in
                  spark.read.parquet(data).collect()) == before
    b.release()


def test_index_lifecycle_paths_carry_fencing_check(
        spark, tmp_path, monkeypatch):
    """The wiring half of VERDICT r9 item 1: every index-asset
    rewrite path — StoredLshIndex.compact/.retract and
    StoredIvfIndex.compact/.retract — passes its HELD lease into the
    swap, so with still_valid() forced False each aborts with
    LeaseLostError and the assets answer probes unchanged."""
    from industrial_data_pipeline_spark.catalog.lease import (
        LeaseLostError)
    from industrial_data_pipeline_spark.operators.lsh_index import (
        StoredLshIndex)
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six")],
        "doc_id long, text string")
    lsh = StoredLshIndex(spark, str(tmp_path / "lsh"), threshold=0.5)
    lsh.build(docs)
    probe = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string")
    emb = spark.createDataFrame(
        [(i, [float(i % 5), 1.0, 0.25 * i]) for i in range(12)],
        "vec_id long, embedding array<double>")
    ivf = StoredIvfIndex(spark, str(tmp_path / "ivf"), n_cells=2)
    ivf.build(emb)
    qv = [1.0, 1.0, 1.0]
    lsh_before = sorted((r.new_id, r.old_id)
                        for r in lsh.probe(probe).collect())
    ivf_before = sorted(map(tuple, ivf.probe(qv, k=5).collect()))

    monkeypatch.setattr(LeaseLock, "still_valid", lambda self: False)
    for op in (lambda: lsh.compact(), lambda: lsh.retract([1]),
               lambda: ivf.compact(), lambda: ivf.retract([1])):
        with pytest.raises(LeaseLostError):
            op()
    monkeypatch.undo()
    assert sorted((r.new_id, r.old_id)
                  for r in lsh.probe(probe).collect()) == lsh_before
    assert sorted(map(tuple,
                      ivf.probe(qv, k=5).collect())) == ivf_before
    # leases were released despite the abort: real verbs succeed now
    lsh.retract([1])
    assert lsh.probe(probe).count() == 0
    ivf.retract([1])
    assert 1 not in {r.vec_id for r in ivf.probe(qv, k=12).collect()}


def test_zombie_sweep_never_touches_newer_staging(spark, tmp_path):
    """Self-review r10, the recovery-sweep half: an overtaken zombie
    aborts at ENTRY (before the destructive sweep), and even if it
    reached the sweep, token-bounding means it could never delete a
    NEWER holder's in-flight staging — only leftovers at or below
    its own fencing token."""
    import glob

    from industrial_data_pipeline_spark.catalog.lease import (
        LeaseLostError)
    from industrial_data_pipeline_spark.operators.lsh_index import (
        _recover_swap, compact_parquet_dir)

    data = str(tmp_path / "asset")
    (spark.range(0, 10).selectExpr("id AS doc_id")
     .coalesce(1).write.parquet(data))
    lease = str(tmp_path / "writer.lease")
    a = LeaseLock(lease, ttl_s=0.5)
    assert a.acquire() == 1
    a._stop.set()
    a._thread.join()
    time.sleep(0.7)
    b = LeaseLock(lease, ttl_s=0.5)
    assert b.acquire(timeout_s=2.0) == 2
    # B's staging is in flight when zombie A wakes up
    b_tmp = data + "_compact_tmp.2"
    os.makedirs(b_tmp)
    open(os.path.join(b_tmp, "part-0.parquet"), "wb").close()
    with pytest.raises(LeaseLostError):
        compact_parquet_dir(spark, data, ("doc_id",), lock=a)
    assert os.path.isdir(b_tmp)          # B's staging untouched
    assert glob.glob(data + "_compact_tmp.1*") == []  # A wrote nothing
    # and the sweep itself is token-bounded even when reached directly
    _recover_swap(data, max_token=1)
    assert os.path.isdir(b_tmp)
    _recover_swap(data, max_token=2)     # the owner's own sweep clears it
    assert not os.path.isdir(b_tmp)
    b.release()


def test_zombie_recovery_cannot_touch_newer_holders_commit(
        spark, tmp_path):
    """Self-review r10: the RECOVERY path is fence-bounded too — a
    zombie that stalls past its entry still_valid() check straight
    into _recover_swap must neither roll a NEWER holder's mid-commit
    _compact_old back over the live path nor sweep it out from under
    the holder's final cleanup. Old dirs are token-suffixed exactly
    like staging; 'token > mine' is never ours to touch."""
    from industrial_data_pipeline_spark.operators.lsh_index import (
        _recover_swap)

    data = str(tmp_path / "asset")

    # --- scenario 1: newer holder (token 5) between its two renames:
    # live dir missing, old.5 holds the pre-swap state
    os.makedirs(data + "_compact_old.5")
    open(data + "_compact_old.5/part-0.parquet", "w").write("x")
    _recover_swap(data, max_token=3)       # zombie token 3
    assert not os.path.isdir(data)          # did NOT roll back
    assert os.path.isdir(data + "_compact_old.5")  # untouched
    # the legitimate holder's own recovery (token 5) DOES roll back
    _recover_swap(data, max_token=5)
    assert os.path.isdir(data)
    assert not os.path.isdir(data + "_compact_old.5")

    # --- scenario 2: newer holder after its swap, before rmtree(old):
    # live dir present, old.7 still on disk — zombie sweep must skip
    os.makedirs(data + "_compact_old.7")
    _recover_swap(data, max_token=3)
    assert os.path.isdir(data + "_compact_old.7")
    # a crashed OLDER attempt's leftovers (token <= mine) are swept
    os.makedirs(data + "_compact_old.2")
    _recover_swap(data, max_token=3)
    assert not os.path.isdir(data + "_compact_old.2")
    assert os.path.isdir(data + "_compact_old.7")
    _recover_swap(data, max_token=9)       # the newer holder's sweep
    assert not os.path.isdir(data + "_compact_old.7")

    # --- rollback picks the NEWEST crashed attempt <= our token
    import shutil
    shutil.rmtree(data)
    os.makedirs(data + "_compact_old.1")
    open(data + "_compact_old.1/a.parquet", "w").write("1")
    os.makedirs(data + "_compact_old.2")
    open(data + "_compact_old.2/b.parquet", "w").write("2")
    _recover_swap(data, max_token=4)
    assert os.path.isdir(data)
    assert os.path.exists(os.path.join(data, "b.parquet"))
    assert not os.path.isdir(data + "_compact_old.1")  # swept
    assert not os.path.isdir(data + "_compact_old.2")


def test_zombie_rebuilder_aborts_and_rolls_back_state(
        spark, tmp_path, monkeypatch):
    """rebuild() through the same fenced protocol (VERDICT r10
    item 2): with the lease fencing check forced False the rebuild
    aborts with LeaseLostError BEFORE any rename — the asset answers
    probes unchanged AND the handle's in-memory retrained
    centroids/codebook roll back to the on-disk state (a zombie that
    kept the retrained state would probe with centroids the asset
    was never rewritten under — silent wrong-cell routing)."""
    from industrial_data_pipeline_spark.catalog.lease import (
        LeaseLostError)
    from industrial_data_pipeline_spark.operators.similarity import (
        StoredIvfIndex)

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + d * 3) % 11) for d in range(4)])
         for i in range(16)],
        "vec_id long, embedding array<double>")
    idx = StoredIvfIndex(spark, str(tmp_path / "ivf"), n_cells=2,
                         pq_m=2, pq_k=4, pq_residual=True)
    idx.build(emb)
    shifted = spark.createDataFrame(
        [(100 + i, [float((i * 7 + d * 3) % 11) + 30.0
                    for d in range(4)]) for i in range(6)],
        "vec_id long, embedding array<double>")
    idx.append(shifted, epoch_id=0)
    cents0 = [list(c) for c in idx.centroids]
    cb0 = [[s, c, list(cq)] for s, c, cq in idx.pq_codebook]
    qs = emb.where("vec_id < 2")
    before = sorted(map(tuple, idx.probe_batch_adc(
        qs, k=4, nprobe=2, rerank=30).collect()))

    monkeypatch.setattr(LeaseLock, "still_valid", lambda self: False)
    with pytest.raises(LeaseLostError):
        idx.rebuild()
    monkeypatch.undo()
    # disk untouched, in-memory retrain rolled back with it
    assert [list(c) for c in idx.centroids] == cents0
    assert [[s, c, list(cq)] for s, c, cq in idx.pq_codebook] == cb0
    assert sorted(map(tuple, idx.probe_batch_adc(
        qs, k=4, nprobe=2, rerank=30).collect())) == before
    # lease released despite the abort: a real rebuild succeeds now
    stats = idx.rebuild()
    assert stats["files_after"] >= 1
    assert {r.epoch for r in
            idx.quantization_drift().collect()} == {-1}
