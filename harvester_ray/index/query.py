"""BM25 query engine over the compressed segments.

Query-time posting-list intersection is "our join" (SURVEY.md §2.5):
k per-term posting lists joined on doc_id inside the query actor —
never a Ray-level shuffle. Three execution paths, all rank-identical:

- ``exhaustive``  decode + score every posting of every query term
  (the oracle path; OR = k-way union, AND = k-way sorted intersection)
- ``wand``        Block-Max WAND: document-at-a-time with per-term and
  per-block score upper bounds; skips blocks that cannot enter the
  top-k (the north-star pruning algorithm)
- batch evaluation: ``QueryActor`` as a ``map_batches`` callable class
  over a query table (stateful actor-pool stage — the analog of the
  reference's per-run Solr connection, harvester/solr_updater.py:838).

Ranking rule (shared with the DuckDB oracle SQL): order by
round(score, 6) DESC, doc_id ASC, take k. Rounding makes
mathematically-tied scores compare equal despite float summation-order
differences across engines; doc_id breaks the tie deterministically
(SURVEY.md §7 hard part (c)).
"""

from __future__ import annotations

import heapq
import json
import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from harvester_ray.functions.codec import varint_decode
from harvester_ray.functions.text import tokenize
from harvester_ray.index.build import bm25_score


class _TermPostings:
    """Decoded, globally doc_id-sorted postings of one term."""

    __slots__ = ("doc_ids", "tfs", "doc_lens", "df")

    def __init__(self, doc_ids, tfs, doc_lens, df):
        self.doc_ids = doc_ids
        self.tfs = tfs
        self.doc_lens = doc_lens
        self.df = df


class _TermBlocks:
    """Undecoded block metadata of one term, sorted by first_doc_id.

    Salt buckets are disjoint ordered doc_id ranges (build.make_salter),
    so sorting all of a term's blocks by first_doc_id yields a globally
    sorted list regardless of how many sub-groups encoded it.
    """

    __slots__ = ("df", "first", "last", "bmax", "deltas", "tfs", "lens", "ub")

    def __init__(self, rows: pd.DataFrame):
        rows = rows.sort_values("first_doc_id", kind="stable")
        self.df = int(rows["df"].iloc[0])
        self.first = rows["first_doc_id"].to_numpy(np.int64)
        self.last = rows["last_doc_id"].to_numpy(np.int64)
        self.bmax = rows["block_max_score"].to_numpy(np.float64)
        self.deltas = rows["doc_id_deltas"].tolist()
        self.tfs = rows["tfs"].tolist()
        self.lens = rows["doc_lens"].tolist()
        self.ub = float(self.bmax.max()) if len(self.bmax) else 0.0

    def decode_block(self, i: int):
        ids = varint_decode(self.deltas[i]).view(np.int64).cumsum() + self.first[i]
        tf = varint_decode(self.tfs[i]).astype(np.int64)
        dl = varint_decode(self.lens[i]).astype(np.int64)
        return ids, tf, dl

    def decode_all(self):
        parts = [self.decode_block(i) for i in range(len(self.first))]
        if not parts:
            z = np.empty(0, np.int64)
            return z, z.copy(), z.copy()
        return tuple(np.concatenate([p[j] for p in parts]) for j in range(3))


class InvertedIndex:
    """Loads dictionary + stats eagerly, segment blocks lazily (with an
    in-process cache) or fully in memory (``preload=True`` for bench).

    At 100 TB scale the segments directory is hash-partitioned parquet;
    per-term block fetch is a predicate-pushdown read of only that
    term_id's row groups — a query actor never reads the whole index.
    """

    def __init__(self, index_dir: str, preload: bool = False):
        from harvester_ray.index.build import IndexPaths

        self.paths = IndexPaths(index_dir)
        with open(self.paths.stats) as f:
            self.stats = json.load(f)
        self.n_docs = float(self.stats["n_docs"])
        self.avgdl = float(self.stats["avgdl"])
        self.k1 = float(self.stats["k1"])
        self.b = float(self.stats["b"])
        d = pq.read_table(self.paths.dictionary).to_pandas()
        self.dictionary = {
            t: (int(i), int(df), int(cf))
            for t, i, df, cf in zip(d["term"], d["term_id"], d["df"], d["cf"])
        }
        self._seg_ds = pads.dataset(self.paths.segments)
        self._block_cache: dict[int, _TermBlocks] = {}
        if preload:
            seg = self._seg_ds.to_table().to_pandas()
            for tid, rows in seg.groupby("term_id"):
                self._block_cache[int(tid)] = _TermBlocks(rows)
            self._preloaded = True
        else:
            self._preloaded = False

    # -- posting access -------------------------------------------------
    def term_blocks(self, term: str) -> _TermBlocks | None:
        meta = self.dictionary.get(term)
        if meta is None:
            return None
        tid = meta[0]
        blocks = self._block_cache.get(tid)
        if blocks is None:
            if self._preloaded:
                return None
            tbl = self._seg_ds.to_table(
                filter=pads.field("term_id") == tid
            ).to_pandas()
            if not len(tbl):
                return None
            blocks = _TermBlocks(tbl)
            self._block_cache[tid] = blocks
        return blocks

    def postings(self, term: str) -> _TermPostings | None:
        blocks = self.term_blocks(term)
        if blocks is None:
            return None
        ids, tf, dl = blocks.decode_all()
        return _TermPostings(ids, tf, dl, blocks.df)

    def idf(self, df: int) -> float:
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def _score(self, tf, dl, df) -> np.ndarray:
        return bm25_score(tf, dl, df, self.n_docs, self.avgdl, self.k1, self.b)

    # -- search ---------------------------------------------------------
    def search(
        self,
        query: str,
        k: int = 10,
        mode: str = "or",
        algorithm: str = "auto",
    ) -> list[tuple[int, float]]:
        """Top-k (doc_id, score). Duplicate query terms are collapsed
        (set semantics); terms are processed in sorted order so float
        accumulation order is deterministic."""
        terms = sorted(set(tokenize(query)))
        if not terms:
            return []
        if mode == "and":
            return self._search_and(terms, k)
        if algorithm == "wand" or (algorithm == "auto" and k < 1000):
            return self._search_wand(terms, k)
        return self._search_or(terms, k)

    @staticmethod
    def _topk(doc_ids: np.ndarray, scores: np.ndarray, k: int):
        if len(doc_ids) == 0:
            return []
        rounded = np.round(scores, 6)
        order = np.lexsort((doc_ids, -rounded))[:k]
        return [(int(doc_ids[i]), float(scores[i])) for i in order]

    def _search_or(self, terms: list[str], k: int):
        id_parts, score_parts = [], []
        for t in terms:
            p = self.postings(t)
            if p is None:
                continue
            id_parts.append(p.doc_ids)
            score_parts.append(self._score(p.tfs, p.doc_lens, p.df))
        if not id_parts:
            return []
        all_ids = np.concatenate(id_parts)
        all_scores = np.concatenate(score_parts)
        uniq, inv = np.unique(all_ids, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(sums, inv, all_scores)
        return self._topk(uniq, sums, k)

    def _search_and(self, terms: list[str], k: int):
        plists = []
        for t in terms:
            p = self.postings(t)
            if p is None:
                return []  # conjunctive + missing term -> empty
            plists.append(p)
        common = plists[0].doc_ids
        for p in plists[1:]:
            common = np.intersect1d(common, p.doc_ids, assume_unique=True)
            if len(common) == 0:
                return []
        sums = np.zeros(len(common), dtype=np.float64)
        for p in plists:  # sorted-term order -> deterministic accumulation
            pos = np.searchsorted(p.doc_ids, common)
            sums += self._score(p.tfs[pos], p.doc_lens[pos], p.df)
        return self._topk(common, sums, k)

    # -- Block-Max WAND --------------------------------------------------
    def _search_wand(self, terms: list[str], k: int):
        """Block-Max WAND (Ding & Suel 2011) for disjunctive top-k.

        Heap threshold uses ROUNDED scores (matching the ranking rule)
        minus an epsilon so candidates that round equal to the current
        k-th score are still evaluated and doc_id tie-breaking stays
        exact vs the exhaustive path.
        """
        cursors = []
        for t in terms:
            blocks = self.term_blocks(t)
            if blocks is not None and len(blocks.first):
                cursors.append(_WandCursor(blocks))
        if not cursors:
            return []
        # heap of (rounded_score, -doc_id) so the weakest entry pops first
        heap: list[tuple[float, int]] = []
        eps = 1e-6
        while True:
            live = [c for c in cursors if not c.done]
            if not live:
                break
            live.sort(key=lambda c: c.doc)
            theta = (heap[0][0] - eps) if len(heap) >= k else -math.inf
            # find pivot: smallest prefix whose summed term UBs exceed theta
            acc = 0.0
            pivot_idx = -1
            for i, c in enumerate(live):
                acc += c.ub
                if acc > theta:
                    pivot_idx = i
                    break
            if pivot_idx < 0:
                break  # even all terms together can't beat theta
            pivot_doc = live[pivot_idx].doc
            if live[0].doc == pivot_doc:
                # block-max refinement: tighter UB from current blocks
                block_ub = 0.0
                for c in live:
                    if c.doc > pivot_doc:
                        break
                    c.seek_block(pivot_doc)
                    block_ub += c.current_block_max(pivot_doc)
                if block_ub > theta:
                    score = 0.0
                    for c in live:
                        if c.doc == pivot_doc:
                            score += c.score_current(self)
                    entry = (round(score, 6), -pivot_doc, score)
                    if len(heap) < k:
                        heapq.heappush(heap, entry)
                    elif entry[:2] > heap[0][:2]:
                        heapq.heapreplace(heap, entry)
                for c in live:
                    if c.doc == pivot_doc:
                        c.advance()
            else:
                # advance the earliest cursor before the pivot to >= pivot_doc
                for i in range(pivot_idx):
                    if live[i].doc < pivot_doc:
                        live[i].seek(pivot_doc)
                        break
        out = sorted(heap, key=lambda e: (-e[0], -e[1]))
        return [(-neg_doc, score) for _rounded, neg_doc, score in out][:k]


class _WandCursor:
    """Per-term cursor over undecoded blocks with lazy block decode."""

    __slots__ = ("blocks", "bi", "pos", "ids", "tf", "dl", "done", "ub")

    def __init__(self, blocks: _TermBlocks):
        self.blocks = blocks
        self.bi = 0
        self.ub = blocks.ub
        self.done = False
        self._load_block()

    def _load_block(self):
        if self.bi >= len(self.blocks.first):
            self.done = True
            self.ids = None
            return
        self.ids, self.tf, self.dl = self.blocks.decode_block(self.bi)
        self.pos = 0

    @property
    def doc(self) -> int:
        return int(self.ids[self.pos]) if not self.done else 2**63 - 1

    def advance(self):
        self.pos += 1
        if self.pos >= len(self.ids):
            self.bi += 1
            self._load_block()

    def seek(self, target: int):
        """Move to the first posting with doc_id >= target."""
        while not self.done and self.blocks.last[self.bi] < target:
            self.bi += 1
            self._load_block()
        if self.done:
            return
        self.pos = int(np.searchsorted(self.ids, target, side="left"))
        if self.pos >= len(self.ids):
            self.bi += 1
            self._load_block()

    def seek_block(self, target: int):
        """Advance whole blocks (without decoding) past those ending
        before ``target``; used for the block-max check."""
        while not self.done and self.blocks.last[self.bi] < target:
            self.bi += 1
            self._load_block()

    def current_block_max(self, _doc: int) -> float:
        return float(self.blocks.bmax[self.bi]) if not self.done else 0.0

    def score_current(self, index: InvertedIndex) -> float:
        tf = np.array([self.tf[self.pos]])
        dl = np.array([self.dl[self.pos]])
        return float(index._score(tf, dl, self.blocks.df)[0])


class QueryActor:
    """Actor-pool batch query evaluation:
    ``queries_ds.map_batches(QueryActor, fn_constructor_args=(index_dir,),
    concurrency=N, batch_format="pyarrow")``.
    The index loads ONCE per actor in __init__ (stateful-stage rule)."""

    def __init__(self, index_dir: str, k: int = 10, preload: bool = True):
        self.index = InvertedIndex(index_dir, preload=preload)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, doc_ids, scores = [], [], [], []
        modes = (
            batch["mode"].to_pylist()
            if "mode" in batch.column_names
            else ["or"] * len(batch)
        )
        for qid, q, mode in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist(), modes
        ):
            for rank, (doc_id, score) in enumerate(
                self.index.search(q, k=self.k, mode=mode), start=1
            ):
                qids.append(qid)
                ranks.append(rank)
                doc_ids.append(doc_id)
                scores.append(score)
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int32()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "score": pa.array(scores, pa.float64()),
            }
        )
