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

    Salt buckets / sort-strategy runs are disjoint ordered doc_id
    ranges, so sorting all of a term's blocks by first_doc_id yields a
    globally sorted list regardless of how many sub-groups encoded it.

    ``bmax`` holds the idf-free norm maxima (build.bm25_norm); callers
    multiply by the term's idf for score upper bounds.
    """

    __slots__ = ("first", "last", "bmax", "deltas", "tfs", "lens", "ub_norm")

    def __init__(self, rows: pd.DataFrame):
        rows = rows.sort_values("first_doc_id", kind="stable")
        self.first = rows["first_doc_id"].to_numpy(np.int64)
        self.last = rows["last_doc_id"].to_numpy(np.int64)
        self.bmax = rows["block_max_norm"].to_numpy(np.float64)
        self.deltas = rows["doc_id_deltas"].tolist()
        self.tfs = rows["tfs"].tolist()
        self.lens = rows["doc_lens"].tolist()
        self.ub_norm = float(self.bmax.max()) if len(self.bmax) else 0.0

    def decode_block(self, i: int):
        ids = varint_decode(self.deltas[i]).view(np.int64).cumsum() + self.first[i]
        tf = varint_decode(self.tfs[i]).astype(np.int64)
        dl = varint_decode(self.lens[i]).astype(np.int64)
        return ids, tf, dl

    def decode_all(self):
        """Bulk decode: ONE varint decode per column across all blocks,
        ids reconstructed with a single prefix sum (no per-block loop)."""
        if not len(self.first):
            z = np.empty(0, np.int64)
            return z, z.copy(), z.copy()
        gaps = varint_decode(b"".join(self.deltas)).view(np.int64)
        tf = varint_decode(b"".join(self.tfs)).astype(np.int64)
        dl = varint_decode(b"".join(self.lens)).astype(np.int64)
        n = len(gaps)
        # doc_ids are strictly increasing within a block, so in-block
        # gaps are >= 1 and gap == 0 appears exactly at block starts
        starts_idx = np.nonzero(gaps == 0)[0]
        assert len(starts_idx) == len(self.first), "corrupt block stream"
        cs = np.cumsum(gaps)
        base = np.concatenate(([0], cs[starts_idx[1:] - 1]))
        sizes = np.diff(np.concatenate((starts_idx, [n])))
        ids = cs - np.repeat(base, sizes) + np.repeat(self.first, sizes)
        return ids, tf, dl


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
        self._postings_cache: dict[int, _TermPostings] = {}
        # dense scoring state (single-shard path): sorted doc_id slots +
        # per-term (positions, precomputed BM25 scores). At 10^12-doc
        # scale a query actor owns one doc_id shard and this array is
        # that shard's doc table, not the whole corpus.
        self._slots: np.ndarray | None = None
        self._dense_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        try:
            dt = pq.read_table(self.paths.doc_table, columns=["doc_id"])
            self._slots = np.sort(dt["doc_id"].to_numpy())
        except Exception:
            self._slots = None
        # tombstoned docs (index/maintenance.py) are filtered at query
        # time; global stats stay as built (Lucene-style deletes)
        from harvester_ray.index.maintenance import load_tombstones

        self._deleted = load_tombstones(index_dir)
        self._deleted_set = set(self._deleted.tolist()) if len(self._deleted) else None
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
        meta = self.dictionary.get(term)
        if meta is None:
            return None
        cached = self._postings_cache.get(meta[0])
        if cached is not None:
            return cached
        blocks = self.term_blocks(term)
        if blocks is None:
            return None
        ids, tf, dl = blocks.decode_all()
        p = _TermPostings(ids, tf, dl, meta[1])  # df from the dictionary
        self._postings_cache[meta[0]] = p
        return p

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
        if algorithm == "wand":
            return self._search_wand(terms, k)
        # auto -> vectorized exhaustive: numpy decode+score is ~20 ns per
        # posting, while the Python document-at-a-time WAND loop costs
        # ~10 us per visited doc — block-max pruning only wins when it
        # skips >99% of postings (very selective queries over huge df),
        # which a caller opts into with algorithm="wand".
        return self._search_or(terms, k)

    @staticmethod
    def _topk(doc_ids: np.ndarray, scores: np.ndarray, k: int):
        if len(doc_ids) == 0:
            return []
        rounded = np.round(scores, 6)
        order = np.lexsort((doc_ids, -rounded))[:k]
        return [(int(doc_ids[i]), float(scores[i])) for i in order]

    def _term_dense(self, term: str) -> tuple[np.ndarray, np.ndarray] | None:
        """(slot positions, precomputed per-posting BM25 scores) — BM25
        contributions are query-independent, so they are computed once
        per term and cached (impact-style scoring)."""
        meta = self.dictionary.get(term)
        if meta is None:
            return None
        cached = self._dense_cache.get(meta[0])
        if cached is not None:
            return cached
        p = self.postings(term)
        if p is None:
            return None
        pos = np.searchsorted(self._slots, p.doc_ids).astype(np.int64)
        scores = self._score(p.tfs, p.doc_lens, p.df)
        self._dense_cache[meta[0]] = (pos, scores)
        return pos, scores

    def _topk_dense(self, acc: np.ndarray, mask: np.ndarray, k: int):
        """Top-k from a dense score accumulator: kth-value partition,
        then exact (round-6 DESC, doc_id ASC) ordering of the boundary
        candidates only."""
        if self._deleted_set is not None:
            pos = np.searchsorted(self._slots, self._deleted)
            in_range = pos < len(self._slots)
            pos = pos[in_range]
            present = self._slots[pos] == self._deleted[in_range]
            mask = mask.copy()
            mask[pos[present]] = False
        cand = np.nonzero(mask)[0]
        if len(cand) == 0:
            return []
        scores = acc[cand]
        rounded = np.round(scores, 6)
        if len(cand) > k:
            kth = np.partition(rounded, len(rounded) - k)[len(rounded) - k]
            keep = rounded >= kth
            cand, scores, rounded = cand[keep], scores[keep], rounded[keep]
        order = np.lexsort((cand, -rounded))[:k]  # slots ascend with doc_id
        ids = self._slots[cand[order]]
        return [(int(d), float(s)) for d, s in zip(ids, scores[order])]

    def _search_or(self, terms: list[str], k: int):
        if self._slots is not None:
            n = len(self._slots)
            acc = np.zeros(n, dtype=np.float64)
            hit = np.zeros(n, dtype=bool)
            found = False
            for t in terms:  # sorted order -> deterministic accumulation
                d = self._term_dense(t)
                if d is None:
                    continue
                found = True
                pos, scores = d
                acc += np.bincount(pos, weights=scores, minlength=n)
                hit[pos] = True
            if not found:
                return []
            return self._topk_dense(acc, hit, k)
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
        if self._deleted_set is not None:
            keep = ~np.isin(uniq, self._deleted)
            uniq, sums = uniq[keep], sums[keep]
        return self._topk(uniq, sums, k)

    def _search_and(self, terms: list[str], k: int):
        if self._slots is not None:
            n = len(self._slots)
            acc = np.zeros(n, dtype=np.float64)
            cnt = np.zeros(n, dtype=np.int32)
            for t in terms:  # sorted order -> deterministic accumulation
                d = self._term_dense(t)
                if d is None:
                    return []  # conjunctive + missing term -> empty
                pos, scores = d
                acc += np.bincount(pos, weights=scores, minlength=n)
                cnt[pos] += 1
            return self._topk_dense(acc, cnt == len(terms), k)
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
        if self._deleted_set is not None:
            common = common[~np.isin(common, self._deleted)]
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
            meta = self.dictionary.get(t)
            if blocks is not None and meta is not None and len(blocks.first):
                cursors.append(_WandCursor(blocks, meta[1], self.idf(meta[1])))
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
            if self._deleted_set is not None and pivot_doc in self._deleted_set:
                for c in live:
                    if c.doc == pivot_doc:
                        c.advance()
                continue
            if live[0].doc == pivot_doc:
                # block-max refinement: tighter UB from current blocks
                block_ub = 0.0
                at_pivot = []
                for c in live:
                    if c.doc > pivot_doc:
                        break
                    c.seek_block(pivot_doc)
                    block_ub += c.current_block_max(pivot_doc)
                    at_pivot.append(c)
                if block_ub > theta:
                    score = 0.0
                    for c in at_pivot:
                        score += c.score_current(self)
                    entry = (round(score, 6), -pivot_doc, score)
                    if len(heap) < k:
                        heapq.heappush(heap, entry)
                    elif entry[:2] > heap[0][:2]:
                        heapq.heapreplace(heap, entry)
                    for c in at_pivot:
                        c.advance()
                else:
                    # NextShallow (Ding & Suel 2011): every doc up to the
                    # earliest current-block end shares these block maxima
                    # and cannot beat theta — jump all pivot cursors past
                    # it without decoding. Capped at the next cursor's
                    # doc: beyond it another term could lift the bound.
                    d_next = min(c.current_block_last() for c in at_pivot) + 1
                    if len(at_pivot) < len(live):
                        d_next = min(d_next, live[len(at_pivot)].doc)
                    for c in at_pivot:
                        c.seek(max(d_next, pivot_doc + 1))
            else:
                # advance the earliest cursor before the pivot to >= pivot_doc
                for i in range(pivot_idx):
                    if live[i].doc < pivot_doc:
                        live[i].seek(pivot_doc)
                        break
        out = sorted(heap, key=lambda e: (-e[0], -e[1]))
        return [(-neg_doc, score) for _rounded, neg_doc, score in out][:k]


class _WandCursor:
    """Per-term cursor with LAZY block decode: block position moves by
    metadata (first/last doc_id per block); a block's postings are
    decoded only when the cursor must report an exact doc or score.
    This is what makes Block-Max WAND actually skip decode work.
    Upper bounds = term idf × stored idf-free block-max norms."""

    __slots__ = (
        "blocks", "df", "idf", "bi", "pos", "ids", "tf", "dl", "done",
        "ub", "_pending_target",
    )

    def __init__(self, blocks: _TermBlocks, df: int, idf: float):
        self.blocks = blocks
        self.df = df
        self.idf = idf
        self.bi = 0
        self.pos = 0
        self.ids = None  # undecoded
        self.tf = None
        self.dl = None
        self.ub = idf * blocks.ub_norm
        self.done = len(blocks.first) == 0
        # when set, the cursor is logically at the first doc >= target
        # within block bi, but the block is not decoded yet
        self._pending_target: int | None = None

    def _ensure_decoded(self):
        if self.ids is None and not self.done:
            self.ids, self.tf, self.dl = self.blocks.decode_block(self.bi)
            if self._pending_target is not None:
                self.pos = int(
                    np.searchsorted(self.ids, self._pending_target, side="left")
                )
                self._pending_target = None
                if self.pos >= len(self.ids):  # defensive; last >= target
                    self._next_block()

    def _next_block(self):
        self.bi += 1
        self.pos = 0
        self.ids = None
        self._pending_target = None
        if self.bi >= len(self.blocks.first):
            self.done = True

    @property
    def doc(self) -> int:
        """Exact current doc — decodes the block on first access; while
        undecoded with no pending target, the block's first_doc_id IS
        the current doc (pos 0)."""
        if self.done:
            return 2**63 - 1
        if self.ids is None and self._pending_target is None:
            return int(self.blocks.first[self.bi])
        self._ensure_decoded()
        return int(self.ids[self.pos]) if not self.done else 2**63 - 1

    def advance(self):
        self._ensure_decoded()
        self.pos += 1
        if self.pos >= len(self.ids):
            self._next_block()

    def seek(self, target: int):
        """Move to the first posting with doc_id >= target — skipping
        whole blocks by metadata, WITHOUT decoding them."""
        while not self.done and self.blocks.last[self.bi] < target:
            self._next_block()
        if self.done:
            return
        if self.ids is not None:
            self.pos = int(np.searchsorted(self.ids, target, side="left"))
            if self.pos >= len(self.ids):
                self._next_block()
        elif target > int(self.blocks.first[self.bi]):
            self._pending_target = target
        # else: block start already >= target; stay undecoded at pos 0

    def seek_block(self, target: int):
        """Advance whole blocks (metadata only) past those ending before
        ``target``; never decodes."""
        while not self.done and self.blocks.last[self.bi] < target:
            self._next_block()

    def current_block_last(self) -> int:
        return int(self.blocks.last[self.bi]) if not self.done else 2**63 - 1

    def current_block_max(self, _doc: int) -> float:
        return self.idf * float(self.blocks.bmax[self.bi]) if not self.done else 0.0

    def score_current(self, index: InvertedIndex) -> float:
        self._ensure_decoded()
        tf = np.array([self.tf[self.pos]])
        dl = np.array([self.dl[self.pos]])
        return float(index._score(tf, dl, self.df)[0])


class QueryActor:
    """Actor-pool batch query evaluation:
    ``queries_ds.map_batches(QueryActor, fn_constructor_args=(index_dir,),
    concurrency=N, batch_format="pyarrow")``.
    The index loads ONCE per actor in __init__ (stateful-stage rule)."""

    def __init__(
        self,
        index_dir: str,
        k: int = 10,
        preload: bool = True,
        algorithm: str = "auto",
    ):
        self.index = InvertedIndex(index_dir, preload=preload)
        self.k = k
        self.algorithm = algorithm

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
                self.index.search(
                    q, k=self.k, mode=mode, algorithm=self.algorithm
                ),
                start=1,
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
