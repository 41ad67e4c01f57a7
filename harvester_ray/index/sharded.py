"""Doc-sharded query serving: scatter-gather over shard actors.

The scale story the round-1 docstring promised, now with code behind
it: at 10^12 docs one process cannot hold the slots array / decoded
postings, so the serving tier is S Ray actors, each owning doc_id
chunk c of S (InvertedIndex(shard=(c, S)) — 1/S of the doc table and
segment files; chunks are the bucket strategy's doc_id-range chunks,
so shard files are disjoint by construction). Global stats and df come
whole-corpus from stats.json + the dictionary, so per-shard scores
equal unsharded scores exactly, and the top-k merge (same round-6
DESC, doc_id ASC rule) is rank-identical to a single-process index
(tests/test_sharded.py).

The reference analog is the Solr query tier the harvester delegates
ranking to (SURVEY.md §2.7 top-k row); scatter-gather over shards is
the standard distributed-search shape (one actor per shard, k results
per shard, driver-side merge of S*k candidates).
"""

from __future__ import annotations

import numpy as np
import ray

from harvester_ray.index.query import InvertedIndex


@ray.remote
class ShardQueryActor:
    """One doc_id shard's query server: loads its 1/S of the index
    once in __init__ (stateful-stage rule), serves search calls."""

    def __init__(
        self, index_dir: str, shard_idx: int, n_shards: int,
        preload: bool = True,
    ):
        self.index = InvertedIndex(
            index_dir, preload=preload, shard=(shard_idx, n_shards)
        )

    def search(
        self, query: str, k: int, mode: str, algorithm: str
    ) -> list[tuple[int, float]]:
        return self.index.search(query, k=k, mode=mode, algorithm=algorithm)

    def n_docs_local(self) -> int:
        return int(len(self.index._slots)) if self.index._slots is not None else 0


class ShardedIndex:
    """Scatter-gather facade over S ShardQueryActors.

    ``n_shards`` must equal the ``segment_doc_chunks`` the index was
    built with (validated by every shard actor)."""

    def __init__(self, index_dir: str, n_shards: int, preload: bool = True):
        self.n_shards = n_shards
        self.actors = [
            ShardQueryActor.remote(index_dir, c, n_shards, preload)
            for c in range(n_shards)
        ]

    def search(
        self,
        query: str,
        k: int = 10,
        mode: str = "or",
        algorithm: str = "auto",
    ) -> list[tuple[int, float]]:
        """Top-k across shards: each shard returns its local top-k
        under the shared ranking rule; the merged candidate set (<=
        S*k rows) is re-ranked by the same rule — lossless because
        chunks partition doc space (every global winner is some
        shard's local winner)."""
        parts = ray.get(
            [a.search.remote(query, k, mode, algorithm) for a in self.actors]
        )
        cand = [hit for p in parts for hit in p]
        if not cand:
            return []
        ids = np.array([d for d, _ in cand], dtype=np.int64)
        scores = np.array([s for _, s in cand], dtype=np.float64)
        order = np.lexsort((ids, -np.round(scores, 6)))[:k]
        return [(int(ids[i]), float(scores[i])) for i in order]

    def total_docs(self) -> int:
        return sum(ray.get([a.n_docs_local.remote() for a in self.actors]))

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
