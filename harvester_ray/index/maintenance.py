"""Index maintenance: tombstone deletions + incremental helpers.

The reference deletes documents from its index two ways — by item id
and by whole collection query (harvester/solr_updater.py:793-817), and
its `_changes`-feed sync turns deletions into Solr deletes via an id
lookup (:914-924). Here deletions are **tombstones**: a small parquet
table of doc_ids next to the segments. The query engine filters
tombstoned docs at scoring time (Lucene-style: global stats N/avgdl/df
stay as built until a compaction rebuild — scores of surviving docs are
unchanged, which keeps rank stability for the survivors).

``compact`` = rebuild from the filtered source — with per-stage lineage
the rebuild re-runs only stages whose inputs changed.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from harvester_ray.index.build import IndexPaths


def _tombstone_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones")


def delete_docs(index_dir: str, doc_ids) -> int:
    """Tombstone the given doc_ids (idempotent: content-hash file name,
    atomic replace — the same side-write discipline as build stages).
    Returns the number of ids recorded."""
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    if len(ids) == 0:
        return 0
    d = _tombstone_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    key = hashlib.blake2b(ids.tobytes(), digest_size=8).hexdigest()
    final = os.path.join(d, f"del-{key}.parquet")
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


def load_tombstones(index_dir: str) -> np.ndarray:
    """Sorted unique tombstoned doc_ids (empty array when none)."""
    d = _tombstone_dir(index_dir)
    if not os.path.isdir(d):
        return np.empty(0, dtype=np.int64)
    parts = [
        pq.read_table(os.path.join(d, f), columns=["doc_id"])["doc_id"].to_numpy()
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


def clear_tombstones(index_dir: str) -> None:
    import shutil

    shutil.rmtree(_tombstone_dir(index_dir), ignore_errors=True)


def compact(docs_ds, index_dir: str, cfg=None) -> IndexPaths:
    """Rebuild the index from a source with the tombstoned docs removed
    (a full-fidelity delete: stats recomputed). The caller passes the
    original doc source; tombstones are applied as a filter."""
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
