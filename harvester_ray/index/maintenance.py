"""Index maintenance: tombstone deletions + incremental add (deltas).

The reference's index maintenance surface (harvester/solr_updater.py):

- delete by item id / by collection query (:793-817) → **tombstones**:
  a small parquet table of doc_ids next to the segments. The query
  engine filters tombstoned docs at scoring time (Lucene-style: global
  stats N/avgdl/df stay as built until compaction — scores of
  surviving docs are unchanged, which keeps rank stability).
- the `_changes`-feed incremental ADD/upsert path (:875-962, cursor at
  :776-791) → **delta segments**: ``add_docs`` builds a self-contained
  delta index under ``deltas/delta-NNN`` with the same build pipeline;
  the query engine merges base+delta dictionaries/stats EXACTLY (sum
  df/cf/N/token counts), so add-then-query is rank- AND score-identical
  to a full rebuild over the union (tests/test_incremental.py).

Tombstones are **sequence-scoped** (LSM-style): each tombstone file
records the number of sources (base + deltas) that existed when it was
written and covers only those — so ``upsert_docs`` (tombstone old
version, add new) leaves the re-added doc live. A doc_id lives in at
most one live source.

``compact`` = rebuild from the filtered source — with per-stage lineage
the rebuild re-runs only stages whose inputs changed.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from harvester_ray.index.build import IndexPaths

_DELTA_RE = re.compile(r"^delta-(\d+)$")
_TOMB_RE = re.compile(r"^del-(?:s(\d+)-)?[0-9a-f]+\.parquet$")


def _tombstone_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones")


def _deltas_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "deltas")


def delta_dirs(index_dir: str) -> list[str]:
    """Committed delta index dirs, in add order (delta-000, ...)."""
    root = _deltas_dir(index_dir)
    if not os.path.isdir(root):
        return []
    out = []
    for d in sorted(os.listdir(root)):
        m = _DELTA_RE.match(d)
        p = os.path.join(root, d)
        # committed = its stats.json exists (build_index writes it last)
        if m and os.path.exists(os.path.join(p, "stats.json")):
            out.append(p)
    return out


def source_dirs(index_dir: str) -> list[str]:
    """All live index sources: base first, then deltas in add order.
    Source i's postings are covered by tombstones with seq > i."""
    return [index_dir] + delta_dirs(index_dir)


def delete_docs(index_dir: str, doc_ids) -> int:
    """Tombstone the given doc_ids (idempotent: content-hash file name,
    atomic replace — the same side-write discipline as build stages).
    The tombstone is stamped with the current source count, covering
    every source that exists NOW (docs added later with the same id are
    NOT affected — the upsert contract). Returns the number of ids."""
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    if len(ids) == 0:
        return 0
    seq = len(source_dirs(index_dir))
    d = _tombstone_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    key = hashlib.blake2b(ids.tobytes(), digest_size=8).hexdigest()
    final = os.path.join(d, f"del-s{seq}-{key}.parquet")
    tmp = f"{final}.tmp-{os.getpid()}"
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64())}), tmp)
    os.replace(tmp, final)
    return len(ids)


def delete_where(index_dir: str, docs_ds, predicate) -> int:
    """Delete-by-query (the reference's delete-by-collection analog):
    ``predicate`` is a pyarrow-batch -> boolean-mask callable applied to
    the doc source; matching doc_ids are tombstoned."""
    import pyarrow.compute as pc  # noqa: F401

    ids: list[int] = []
    for batch in docs_ds.iter_batches(batch_format="pyarrow"):
        mask = predicate(batch)
        ids.extend(batch["doc_id"].filter(mask).to_pylist())
    return delete_docs(index_dir, ids)


def load_tombstones_scoped(index_dir: str) -> list[tuple[int, np.ndarray]]:
    """[(seq, sorted ids)] per tombstone file. A tombstone covers
    sources with index < seq. Legacy unstamped files (round-1 format,
    written when only the base existed) get seq=1 (covers the base)."""
    d = _tombstone_dir(index_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for f in sorted(os.listdir(d)):
        m = _TOMB_RE.match(f)
        if not m:
            continue
        seq = int(m.group(1)) if m.group(1) is not None else 1
        ids = pq.read_table(
            os.path.join(d, f), columns=["doc_id"]
        )["doc_id"].to_numpy()
        out.append((seq, np.unique(ids)))
    return out


def deleted_for_source(index_dir: str, source_idx: int) -> np.ndarray:
    """Sorted unique doc_ids tombstoned for source ``source_idx``."""
    parts = [
        ids for seq, ids in load_tombstones_scoped(index_dir)
        if seq > source_idx
    ]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


def load_tombstones(index_dir: str) -> np.ndarray:
    """Sorted unique tombstoned doc_ids across all scopes (the
    compaction filter; per-source scoping is applied at query time)."""
    parts = [ids for _seq, ids in load_tombstones_scoped(index_dir)]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


def clear_tombstones(index_dir: str) -> None:
    import shutil

    shutil.rmtree(_tombstone_dir(index_dir), ignore_errors=True)


def live_doc_ids(index_dir: str) -> np.ndarray:
    """Sorted doc_ids currently served (per-source tombstones applied).
    Driver-sized read of the doc tables (2 ints/doc); at 10^10+ docs
    swap the callers' disjointness check for a Ray anti-join."""
    parts = []
    for i, src in enumerate(source_dirs(index_dir)):
        dt_dir = IndexPaths(src).doc_table
        if not os.path.isdir(dt_dir):
            continue
        ids = pq.read_table(dt_dir, columns=["doc_id"])["doc_id"].to_numpy()
        dead = deleted_for_source(index_dir, i)
        if len(dead):
            ids = ids[~np.isin(ids, dead)]
        parts.append(ids)
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


def add_docs(
    index_dir: str,
    docs_ds,
    cfg=None,
    n_docs: int | None = None,
    _skip_disjoint_check: bool = False,
) -> IndexPaths:
    """Incremental ADD — the `_changes` add path of the reference
    (harvester/solr_updater.py:875-962) as a delta segment: build a
    self-contained index over the new docs under ``deltas/delta-NNN``
    (the full SPIMI → dictionary → segments pipeline, resumable like
    any build), atomically committed by its stats.json write. The query
    engine merges base+delta dictionaries and stats exactly, so
    add-then-query ranks AND scores identically to a full rebuild over
    the union.

    New doc_ids must be disjoint from live ones — use ``upsert_docs``
    for replace semantics. The delta's own internal avgdl only shapes
    its stored WAND block maxima; the query engine rescales those
    bounds to the merged avgdl at load, so pruning stays admissible.

    Doc-sharded serving (index/sharded.py) requires every source to be
    built with the SAME ``segment_doc_chunks``: pass the base's cfg
    here, or shard loading will reject the mismatched delta with a
    clear error.
    """
    from harvester_ray.config import DEFAULT_INDEX_CONFIG
    from harvester_ray.index.build import build_index

    if not _skip_disjoint_check:
        import ray

        live = live_doc_ids(index_dir)
        live_ref = ray.put(live)

        def check(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            clash = np.isin(ids, ray.get(live_ref))
            if clash.any():
                raise ValueError(
                    f"add_docs: {int(clash.sum())} doc_ids already live "
                    f"in the index (e.g. {int(ids[clash][0])}); use "
                    "upsert_docs for replace semantics"
                )
            return t

        docs_ds = docs_ds.map_batches(check, batch_format="pyarrow")

    k = len(delta_dirs(index_dir))
    out = os.path.join(_deltas_dir(index_dir), f"delta-{k:03d}")
    return build_index(
        docs_ds, out, cfg or DEFAULT_INDEX_CONFIG, n_docs=n_docs
    )


def upsert_docs(index_dir: str, docs_ds, cfg=None) -> IndexPaths:
    """Replace-or-add — the reference's `_changes` upsert semantics:
    tombstone any incoming doc_id that is currently live (scoped to the
    sources existing NOW), then add all incoming docs as a delta. The
    incoming ids are collected driver-side (an upsert feed is
    change-log-sized, not corpus-sized — the reference reads the same
    feed row by row, solr_updater.py:905-947)."""
    incoming = docs_ds.unique("doc_id")
    live = live_doc_ids(index_dir)
    overlap = np.asarray(sorted(set(incoming)), dtype=np.int64)
    overlap = overlap[np.isin(overlap, live)]
    if len(overlap):
        delete_docs(index_dir, overlap)
    return add_docs(index_dir, docs_ds, cfg, _skip_disjoint_check=True)


def compact(docs_ds, index_dir: str, cfg=None) -> IndexPaths:
    """Rebuild the index from a source with the tombstoned docs removed
    (a full-fidelity delete: stats recomputed). The caller passes the
    original doc source; tombstones are applied as a filter.

    Delete-only workflows only: after ``upsert_docs`` the upserted ids
    appear in (scoped) tombstones, so this unscoped filter would drop
    their re-added versions — compact an upserted index by running
    ``build_index`` directly over the current corpus instead."""
    import pyarrow.compute as pc
    import ray

    from harvester_ray.config import DEFAULT_INDEX_CONFIG
    from harvester_ray.index.build import build_index

    dead = load_tombstones(index_dir)
    dead_ref = ray.put(dead)

    def drop(t: pa.Table) -> pa.Table:
        mask = ~np.isin(
            t["doc_id"].to_numpy(zero_copy_only=False), ray.get(dead_ref)
        )
        return t.filter(pa.array(mask))

    filtered = docs_ds.map_batches(drop, batch_format="pyarrow")
    out = os.path.join(index_dir, "compacted")
    paths = build_index(filtered, out, cfg or DEFAULT_INDEX_CONFIG)
    return paths
