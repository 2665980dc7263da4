"""Cross-asset snapshot manifest (VERDICT r13 item 4): one published
id → {asset_root: pinned epoch}, so a reproducible eval pins BOTH
halves of a hybrid store with one token instead of two raw
``as_of_epoch`` ints whose consistency holds only by caller
convention (the q298 gap: nothing prevented probing BM25@epoch0 with
IVF@epoch1 — silently mixed snapshots).

Mechanics, all filesystem-level (no Spark dependency — the manifest
is catalog metadata, not data):

* :meth:`SnapshotStore.publish` walks each asset root at publish
  time, records the max ``_epoch=N`` partition value as the pin AND
  the full epoch set at-or-below it, and writes one immutable JSON
  per snapshot id (atomic tmp+rename; re-publishing an existing id
  refuses — snapshots are append-only history).
* :meth:`Snapshot.resolve` turns the manifest into the probe's
  ``_epoch <= pin`` bound for ONE asset — and FAILS LOUDLY when the
  store has moved under the pin: an asset missing from the manifest,
  or a pinned epoch whose partitions were folded away by
  :meth:`compact` (folded epochs all land in ``_epoch=-1``, so an
  ``<=`` filter would silently return post-snapshot rows — the
  silent mixing this module exists to prevent). Appends AFTER
  publish are fine (newer epochs prune away); retractions are fine
  by design (takedowns override time travel — the q298 legal
  contract) unless they empty a pinned epoch entirely, which also
  fails loudly.

Both stored indexes accept a :class:`Snapshot` anywhere they accept
``as_of_epoch`` (resolution happens inside the one scan helper each
class funnels every read through), and so does
:class:`~..operators.retrieval.HybridRetriever` — one token, both
legs, validated per asset at probe time.

Reference parity note: the reference has no index assets at all;
this is the snapshot layer of their corpus-scale counterpart
(cf. Iceberg/Delta snapshot ids, reduced to the epoch-partitioned
asset layout these indexes already use).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass
from types import MappingProxyType
from typing import Mapping

_EPOCH_RE = re.compile(r"^_epoch=(-?\d+)$")
_ID_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")


def disk_epochs(asset_root: str) -> tuple[int, ...]:
    """All distinct ``_epoch=N`` partition values present anywhere
    under ``asset_root`` (covers multi-asset roots like BM25's
    postings + doclen pair with one walk)."""
    found: set[int] = set()
    for _dirpath, dirnames, _files in os.walk(asset_root):
        for d in dirnames:
            m = _EPOCH_RE.match(d)
            if m:
                found.add(int(m.group(1)))
    return tuple(sorted(found))


@dataclass(frozen=True)
class Snapshot:
    """An immutable published manifest: asset root (absolute) →
    (pinned epoch, epoch set at-or-below the pin at publish time)."""

    snapshot_id: str
    assets: Mapping[str, tuple[int, tuple[int, ...]]]

    def resolve(self, asset_root: str) -> int:
        """The ``as_of_epoch`` int for ONE asset — validated against
        the CURRENT on-disk epoch layout so a moved store can never
        silently answer with mixed-snapshot rows."""
        root = os.path.abspath(asset_root)
        if root not in self.assets:
            raise ValueError(
                f"snapshot {self.snapshot_id!r} does not cover "
                f"asset {root!r} (covered: "
                f"{sorted(self.assets)}) — probing an uncovered "
                f"asset would silently mix snapshots")
        pin, recorded = self.assets[root]
        now = tuple(e for e in disk_epochs(root) if e <= pin)
        if now != tuple(recorded):
            raise ValueError(
                f"snapshot {self.snapshot_id!r} pinned epoch {pin} "
                f"of {root!r}, but its epoch partitions changed "
                f"from {list(recorded)} to {list(now)} (compacted "
                f"away / emptied) — an _epoch <= {pin} scan would "
                f"silently return post-snapshot rows; rebuild the "
                f"probe from a fresh snapshot")
        return pin


def resolve_as_of(as_of_epoch, asset_root: str) -> int | None:
    """Normalize a probe's ``as_of_epoch`` argument: ints and None
    pass through; a :class:`Snapshot` resolves (with validation)
    against this asset's root. The one hook both stored indexes
    call from their scan helpers."""
    if as_of_epoch is None or isinstance(as_of_epoch, int):
        return as_of_epoch
    if isinstance(as_of_epoch, Snapshot):
        return as_of_epoch.resolve(asset_root)
    raise TypeError(f"as_of_epoch must be int, None or Snapshot, "
                    f"got {type(as_of_epoch).__name__}")


class SnapshotStore:
    """A directory of immutable snapshot manifests — one JSON per
    published id."""

    def __init__(self, root: str):
        self.root = root

    def _path(self, snapshot_id: str) -> str:
        if not _ID_RE.match(snapshot_id):
            raise ValueError(f"invalid snapshot id "
                             f"{snapshot_id!r} (want "
                             f"[A-Za-z0-9][A-Za-z0-9._-]*)")
        return os.path.join(self.root, f"{snapshot_id}.json")

    def publish(self, snapshot_id: str,
                asset_roots: list[str]) -> Snapshot:
        """Record each asset's CURRENT epoch layout under one id.
        Refuses an already-published id (snapshots are immutable
        history — republishing would retroactively change what an
        eval pinned) and an asset with no epoch partitions yet
        (nothing to pin)."""
        path = self._path(snapshot_id)
        if os.path.exists(path):
            raise ValueError(f"snapshot {snapshot_id!r} already "
                             f"published — ids are immutable")
        assets = {}
        for r in asset_roots:
            root = os.path.abspath(r)
            epochs = disk_epochs(root)
            if not epochs:
                raise ValueError(f"asset {root!r} has no _epoch "
                                 f"partitions to snapshot")
            assets[root] = (max(epochs), epochs)
        os.makedirs(self.root, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"snapshot_id": snapshot_id,
                       "assets": {r: {"pin": pin,
                                      "epochs": list(eps)}
                                  for r, (pin, eps)
                                  in assets.items()}}, fh)
        os.replace(tmp, path)
        return Snapshot(snapshot_id,
                        MappingProxyType(dict(assets)))

    def open(self, snapshot_id: str) -> Snapshot:
        with open(self._path(snapshot_id)) as fh:
            doc = json.load(fh)
        return Snapshot(
            doc["snapshot_id"],
            MappingProxyType({
                r: (int(a["pin"]), tuple(a["epochs"]))
                for r, a in doc["assets"].items()}))

    def list_ids(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(f[:-5] for f in os.listdir(self.root)
                      if f.endswith(".json"))
