"""Index backup / restore — the Solr replication-handler analog.

The reference delegates index durability to its Solr tier (snapshots /
replication of the Lucene commit point); here the index root IS a
directory tree of immutable parquet segments (sources, deltas,
tombstones, stats), so a consistent snapshot is a file-level copy of
one commit point:

- ``backup_index(index_dir, backups_root)`` — copy the tree into a
  tmp dir and atomically rename to ``snap-<fingerprint>`` with a
  ``_backup.json`` manifest (file listing + sizes, engine version,
  source fingerprint). Segments are immutable, so a file already
  present in the PREVIOUS snapshot with the same (size, mtime_ns) is
  HARDLINKED instead of copied — Lucene-style incremental backup:
  cost ∝ new segments, not index size.
- ``restore_index(snap_dir, dest)`` — verify the manifest against the
  snapshot's files, copy out to tmp, atomic-rename into place.
- ``verify_backup(snap_dir)`` — fsck for snapshots: every manifest
  entry present with the recorded size, no stray files.

Scale shape: the driver only LISTS files (metadata walk); the byte
copies fan out as Ray tasks over per-file work items (the same
shared-filesystem assumption the hive index layout itself makes).
Snapshots are point-in-time: a backup taken mid-upsert sees the last
committed sources (stage writes are atomic tmp+rename, lineage.py).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import ray

BACKUP_MANIFEST = "_backup.json"
_COPY_BATCH = 64  # files per copy task


def _walk_files(root: str) -> list[tuple[str, int, int]]:
    """(relpath, size, mtime_ns) for every file under root."""
    out = []
    for r, _d, files in sorted(os.walk(root)):
        for f in sorted(files):
            fp = os.path.join(r, f)
            st = os.stat(fp)
            out.append(
                (os.path.relpath(fp, root), st.st_size, st.st_mtime_ns)
            )
    return out


@ray.remote(num_cpus=0.5)
def _copy_batch(src_root: str, dst_root: str, items: list) -> int:
    n = 0
    for rel, link_src in items:
        dst = os.path.join(dst_root, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        if link_src is not None:
            try:
                os.link(link_src, dst)
                n += 1
                continue
            except OSError:
                pass  # cross-device / fs without hardlinks: fall through
        shutil.copy2(os.path.join(src_root, rel), dst)
        n += 1
    return n


def _latest_snapshot(backups_root: str) -> str | None:
    if not os.path.isdir(backups_root):
        return None
    snaps = sorted(
        d
        for d in os.listdir(backups_root)
        if d.startswith("snap-")
        and os.path.isfile(
            os.path.join(backups_root, d, BACKUP_MANIFEST)
        )
    )
    if not snaps:
        return None
    # manifests carry a monotonically increasing taken_at
    def taken(d):
        with open(os.path.join(backups_root, d, BACKUP_MANIFEST)) as f:
            return json.load(f)["taken_at"]

    return os.path.join(backups_root, max(snaps, key=taken))


def backup_index(index_dir: str, backups_root: str) -> str:
    """Snapshot ``index_dir`` under ``backups_root``; returns the
    snapshot path. Idempotent: an existing snapshot of the same
    fingerprint is returned as-is."""
    from harvester_ray.state.lineage import ENGINE_VERSION, dir_fingerprint

    fp = dir_fingerprint(index_dir)
    snap = os.path.join(backups_root, f"snap-{fp}")
    if os.path.isfile(os.path.join(snap, BACKUP_MANIFEST)):
        return snap

    files = _walk_files(index_dir)
    prev = _latest_snapshot(backups_root)
    prev_files: dict[str, tuple[int, int]] = {}
    if prev:
        with open(os.path.join(prev, BACKUP_MANIFEST)) as f:
            prev_files = {
                e["rel"]: (e["size"], e["mtime_ns"])
                for e in json.load(f)["files"]
            }

    os.makedirs(backups_root, exist_ok=True)
    tmp = snap + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)

    items = []
    linked = 0
    for rel, size, mt in files:
        link_src = None
        if prev and prev_files.get(rel) == (size, mt):
            link_src = os.path.join(prev, rel)
            linked += 1
        items.append((rel, link_src))
    refs = [
        _copy_batch.remote(index_dir, tmp, items[i : i + _COPY_BATCH])
        for i in range(0, len(items), _COPY_BATCH)
    ]
    copied = sum(ray.get(refs))
    assert copied == len(files)

    manifest = {
        "fingerprint": fp,
        "engine_version": ENGINE_VERSION,
        "taken_at": time.time(),
        "source": os.path.abspath(index_dir),
        "n_files": len(files),
        "n_hardlinked": linked,
        "files": [
            {"rel": r, "size": s, "mtime_ns": m} for r, s, m in files
        ],
    }
    with open(os.path.join(tmp, BACKUP_MANIFEST), "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, snap)
    return snap


def verify_backup(snap_dir: str) -> dict:
    """fsck a snapshot: returns {'ok': bool, 'missing': [...],
    'size_mismatch': [...], 'stray': [...]}."""
    with open(os.path.join(snap_dir, BACKUP_MANIFEST)) as f:
        manifest = json.load(f)
    want = {e["rel"]: e["size"] for e in manifest["files"]}
    have = {
        rel: size
        for rel, size, _mt in _walk_files(snap_dir)
        if rel != BACKUP_MANIFEST
    }
    missing = sorted(set(want) - set(have))
    stray = sorted(set(have) - set(want))
    mismatch = sorted(
        r for r in set(want) & set(have) if want[r] != have[r]
    )
    return {
        "ok": not (missing or stray or mismatch),
        "missing": missing,
        "size_mismatch": mismatch,
        "stray": stray,
    }


def restore_index(snap_dir: str, dest: str) -> str:
    """Restore a snapshot into ``dest`` (must not exist). Verifies the
    manifest first; copy fans out as Ray tasks; the final rename is
    atomic so a crashed restore never leaves a half-index at dest."""
    if os.path.exists(dest):
        raise FileExistsError(dest)
    chk = verify_backup(snap_dir)
    if not chk["ok"]:
        raise RuntimeError(f"snapshot failed verification: {chk}")
    with open(os.path.join(snap_dir, BACKUP_MANIFEST)) as f:
        manifest = json.load(f)
    tmp = dest + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    items = [(e["rel"], None) for e in manifest["files"]]
    refs = [
        _copy_batch.remote(snap_dir, tmp, items[i : i + _COPY_BATCH])
        for i in range(0, len(items), _COPY_BATCH)
    ]
    ray.get(refs)
    os.rename(tmp, dest)
    return dest
