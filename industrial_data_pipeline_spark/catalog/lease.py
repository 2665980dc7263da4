"""Lease-file writer lock — the cross-node form of the store's
single-writer boundary.

The default ``flock`` backend (catalog/store.py::write_lock) is exact
on one node: the kernel releases a dead holder's lock instantly and
there is no stale state. But at 100 TB the store root lives on object
storage or a shared filesystem where no kernel spans the writers —
flock either doesn't exist (S3/GCS) or silently degrades (NFS without
a lock manager). This module provides the standard replacement: a
LEASE protocol built from three primitives every target offers —

  atomic create-if-absent   (POSIX ``link`` of a pre-written tmp —
                             payload published atomically WITH the
                             create; S3/GCS conditional PUT
                             ``If-None-Match: *``, same property)
  atomic replace            (POSIX ``rename``; object-store PUT)
  read                      (read/GET)

Protocol:

- **Acquire**: create the lease file exclusively, payload
  ``{owner, pid, hb_ts, token}``. If it exists and its heartbeat is
  fresh (age < ttl) → the database has a live writer → fail loudly
  after the caller's timeout. If STALE (age ≥ ttl) → takeover.
- **Heartbeat**: a daemon thread atomically rewrites the lease every
  ttl/3 with a new ``hb_ts``; it first re-reads the file and, if the
  owner is no longer us, sets :attr:`LeaseLock.lost` and stops —
  loss is detected within one heartbeat interval.
- **Takeover**: serialized by a ``.takeover`` marker created
  exclusively (one stealer at a time; a marker older than ttl is
  itself considered abandoned and removed). The winner re-reads the
  lease, aborts if it changed since the staleness check, then
  unlinks + recreates it.
- **Fencing token**: a monotonic counter in ``<lease>.fence``,
  incremented by each successful acquisition (only the unique winner
  writes it). Downstream commit protocols can persist the token with
  each write and reject writes carrying a stale token — the standard
  mitigation for the inherent lease weakness below.

Honest limits (documented, tested where testable): a holder paused
longer than the ttl (GC, VM freeze) can be overtaken and may overlap
the new holder for up to one heartbeat interval before noticing —
leases bound, but cannot eliminate, that window; that is exactly what
the fencing token is for. Clock skew between writers shifts staleness
judgement by the skew; keep ttl ≫ max skew. A real deployment can
swap this file-level protocol for a catalog service or an
Iceberg/Delta commit protocol without touching callers — the store's
``write_lock`` interface is the seam.
"""

from __future__ import annotations

import contextlib
import json
import os
import socket
import threading
import time
import uuid


class LeaseHeldError(RuntimeError):
    """The lease is held by a live (fresh-heartbeat) foreign owner."""


class LeaseLostError(RuntimeError):
    """Raised by a commit path whose pre-commit
    :meth:`LeaseLock.still_valid` check failed: the holder was paused
    past the ttl and overtaken, so committing would overwrite the new
    owner's work. The aborted work is left un-published (staging only)
    and the caller re-runs recovery / retries under a fresh lease."""


class LeaseLock:
    """A single writer lease over ``path``. Not reentrant — callers
    needing reentrancy wrap it (ParquetStore's depth counter does)."""

    def __init__(self, path: str, ttl_s: float = 10.0,
                 heartbeat_s: float | None = None,
                 owner: str | None = None):
        self.path = path
        self.ttl_s = ttl_s
        self.heartbeat_s = heartbeat_s or ttl_s / 3.0
        self.owner = owner or (f"{socket.gethostname()}:{os.getpid()}:"
                               f"{uuid.uuid4().hex[:8]}")
        self.token: int | None = None
        #: set by the heartbeat thread when it finds the lease no
        #: longer ours — the holder learns it was overtaken within
        #: one heartbeat interval
        self.lost = threading.Event()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------ file IO

    def _read(self) -> dict | None:
        try:
            with open(self.path) as fh:
                return json.loads(fh.read())
        except (FileNotFoundError, json.JSONDecodeError):
            # mid-replace torn read on non-POSIX stores decodes as
            # None → caller retries
            return None

    def _payload(self) -> bytes:
        return json.dumps({"owner": self.owner, "pid": os.getpid(),
                           "hb_ts": time.time(),
                           "token": self.token}).encode()

    def _replace(self) -> None:
        tmp = f"{self.path}.{self.owner.rsplit(':', 1)[-1]}.tmp"
        with open(tmp, "wb") as fh:
            fh.write(self._payload())
        os.replace(tmp, self.path)  # atomic publish

    def _try_create(self) -> bool:
        """Atomic create-if-absent WITH payload; bumps the fence
        counter on success (only the unique winner writes it).

        The payload is written to a tmp file first and published by
        ``os.link`` (create-if-absent + content in ONE step; the
        object-store analogue is a conditional PUT, whose body is
        atomic by nature) — so no reader can ever observe an existing
        lease with empty/unparseable content, the state that
        previously required the corrupt-lease takeover below. The
        fence bump stays AFTER the publish: only the unique link
        winner runs it, so fence updates remain serialized by lease
        ownership (a lock-free read-bump-replace before publishing
        could regress the counter under a create race and mint
        duplicate tokens). A crash between link and bump leaves a
        valid owned lease whose eventual stale-takeover does the bump
        — tokens stay unique and monotonic, never duplicated."""
        tmp = f"{self.path}.{self.owner.rsplit(':', 1)[-1]}.create.tmp"
        self.token = None
        with open(tmp, "wb") as fh:
            fh.write(self._payload())
        try:
            os.link(tmp, self.path)
        except FileExistsError:
            return False
        except OSError:
            # filesystem without hard links (FAT/exFAT, some FUSE or
            # SMB mounts): fall back to the O_EXCL create + write —
            # it reopens the tiny empty-content window, but the
            # corrupt-lease takeover path below self-heals it, and
            # losing atomic-payload publish beats losing the lock
            try:
                fd = os.open(self.path,
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                             0o644)
            except FileExistsError:
                return False
            os.write(fd, self._payload())
            os.close(fd)
        finally:
            with contextlib.suppress(OSError):
                os.unlink(tmp)
        fence_path = self.path + ".fence"
        try:
            with open(fence_path) as fh:
                fence = int(fh.read().strip() or 0)
        except (FileNotFoundError, ValueError):
            fence = 0
        self.token = fence + 1
        with open(fence_path + ".tmp", "w") as fh:
            fh.write(str(self.token))
        os.replace(fence_path + ".tmp", fence_path)
        # rewrite the lease with the token for observability; owner +
        # hb_ts (all any reader decides on) were valid from the start
        self._replace()
        return True

    # ----------------------------------------------------------- takeover

    def _try_takeover(self, observed: dict | None) -> bool:
        """Steal a stale lease; serialized by an exclusive marker.
        ``observed`` is the stale payload the caller saw — or None
        for a corrupt lease (unparseable past ttl by mtime): the
        steal then proceeds only if, under the marker, the content is
        STILL unparseable AND the file's mtime is STILL past ttl — a
        torn read of a freshly-published valid lease also decodes as
        None, but its mtime is new, so the age re-check is what keeps
        a live writer's lease from being stolen (review r9)."""
        marker = self.path + ".takeover"
        try:
            fd = os.open(marker,
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except FileExistsError:
            # another stealer is mid-takeover; clear an abandoned
            # marker (stealer died) so the system can't wedge
            with contextlib.suppress(OSError):
                if time.time() - os.path.getmtime(marker) > self.ttl_s:
                    os.unlink(marker)
            return False
        try:
            os.write(fd, self.owner.encode())
            os.close(fd)
            current = self._read()
            if current != observed:
                # the holder heartbeated between our staleness check
                # and the marker — it is alive; abort the steal
                return False
            if observed is None:
                # corrupt-lease path: None == None passes the check
                # above even when a NEW valid lease tore mid-read —
                # only steal if the file is REALLY still old
                try:
                    age = time.time() - os.path.getmtime(self.path)
                except OSError:
                    age = self.ttl_s  # vanished: create race below
                if age < self.ttl_s:
                    return False
            with contextlib.suppress(FileNotFoundError):
                os.unlink(self.path)
            return self._try_create()
        finally:
            with contextlib.suppress(OSError):
                os.unlink(marker)

    # ---------------------------------------------------------------- API

    def acquire(self, timeout_s: float = 10.0) -> int:
        """Acquire the lease; returns the fencing token. Raises
        :class:`LeaseHeldError` after ``timeout_s`` if a live owner
        holds it."""
        deadline = time.monotonic() + timeout_s
        holder = "unknown"
        while True:
            if self._try_create():
                break
            cur = self._read()
            if cur is None:
                # vanished (released/stolen under us) → retry now;
                # but a file that EXISTS with unparseable content is
                # a torn read or a crashed creator — never spin on it:
                # past ttl (by mtime) treat it as stale and steal it
                # (self-heal), otherwise honor the deadline and sleep
                # like the live-holder branch does.
                try:
                    age = time.time() - os.path.getmtime(self.path)
                except OSError:
                    continue  # vanished — retry immediately
                holder = "unparseable lease content"
                if age >= self.ttl_s:
                    if self._try_takeover(None):
                        break
                    continue  # lost the steal race — re-examine
                if time.monotonic() >= deadline:
                    raise LeaseHeldError(
                        f"lease {self.path} exists with {holder} "
                        f"younger than ttl {self.ttl_s}s — possible "
                        f"torn write; retry or raise timeout_s")
                time.sleep(0.05)
                continue
            holder = f"{cur.get('owner')} (pid {cur.get('pid')})"
            if time.time() - float(cur.get("hb_ts", 0)) >= self.ttl_s:
                if self._try_takeover(cur):
                    break
                continue  # lost the steal race — re-examine
            if time.monotonic() >= deadline:
                raise LeaseHeldError(
                    f"lease {self.path} is held by {holder} with a "
                    f"fresh heartbeat (ttl {self.ttl_s}s)")
            time.sleep(0.05)
        self.lost.clear()
        self._stop.clear()
        self._thread = threading.Thread(target=self._heartbeat_loop,
                                        daemon=True,
                                        name=f"lease-hb:{self.path}")
        self._thread.start()
        return self.token

    def _heartbeat_loop(self) -> None:
        while not self._stop.wait(self.heartbeat_s):
            cur = self._read()
            if cur is None or cur.get("owner") != self.owner:
                # overtaken (we stalled past the ttl) — surface it
                # and stop renewing; the fencing token is what keeps
                # the overlap window from corrupting committed state
                self.lost.set()
                return
            with contextlib.suppress(OSError):
                self._replace()

    def still_valid(self) -> bool:
        """Pre-commit fencing check for the holder: True iff this
        lock's token is still the fence's latest AND the lease file
        still names us. A holder paused past the ttl (GC, VM freeze)
        and overtaken sees False and must ABORT its write — the
        actionable form of the fencing token the module docstring
        promises. Honest limit, stated: the check and the commit are
        two steps, so a pause BETWEEN them can still slip one write
        through; that window is bounded by one filesystem op (vs the
        unbounded zombie window without the check), and a commit
        protocol that persists the token with the data (and readers
        that take the max-token version) closes it completely."""
        if self.lost.is_set() or self.token is None:
            return False
        cur = self._read()
        if cur is None or cur.get("owner") != self.owner:
            return False
        try:
            with open(self.path + ".fence") as fh:
                return int(fh.read().strip() or 0) == self.token
        except (FileNotFoundError, ValueError):
            return False

    def release(self) -> None:
        """Stop heartbeating and delete the lease iff still ours."""
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.ttl_s)
            self._thread = None
        cur = self._read()
        if cur is not None and cur.get("owner") == self.owner:
            with contextlib.suppress(FileNotFoundError):
                os.unlink(self.path)

    def __enter__(self) -> "LeaseLock":
        self.acquire()
        return self

    def __exit__(self, *exc) -> None:
        self.release()
