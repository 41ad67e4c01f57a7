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


@ray.remote(max_restarts=3, max_task_retries=3)
class ShardQueryActor:
    """One doc_id shard's query server: loads its 1/S of the index
    once in __init__ (stateful-stage rule), serves search calls.

    Fault tolerance: actor state is derived entirely from the
    IMMUTABLE index files (constructor args are plain values), so a
    crashed/preempted shard restarts and reloads safely; in-flight
    calls retry transparently (max_restarts/max_task_retries) — on a
    real cluster a lost node degrades to a reload, never a wrong or
    partial result (Solr shards.tolerant=false semantics)."""

    def __init__(
        self, index_dir: str, shard_idx: int, n_shards: int,
        preload: bool = True,
    ):
        self.index = InvertedIndex(
            index_dir, preload=preload, shard=(shard_idx, n_shards)
        )
        self._match_cache: dict = {}
        self._facet_maps: dict = {}

    def search(
        self, query: str, k: int, mode: str, algorithm: str, after=None
    ) -> list[tuple[int, float]]:
        return self.index.search(
            query, k=k, mode=mode, algorithm=algorithm, after=after
        )

    def n_docs_local(self) -> int:
        return int(len(self.index._slots)) if self.index._slots is not None else 0

    # ---- distributed faceting (Solr facet.overrequest + facet.refine
    # analog: /root/reference/harvester/solr_updater.py delegates all
    # faceted search to the Solr tier; this is that tier's two-phase
    # protocol over doc shards) -------------------------------------

    def _match_docs(self, query: str, mode: str) -> np.ndarray:
        """This shard's FULL match set (sorted doc_ids) for the query —
        cached per (query, mode): postings live here, so the match set
        never leaves the shard; only bucket partials do."""
        key = (query, mode)
        hit = self._match_cache.get(key)
        if hit is not None:
            return hit
        from harvester_ray.functions.text import tokenize

        terms = sorted(set(tokenize(query)))
        parts = []
        for tm in terms:
            p = self.index.postings(tm)
            if p is not None:
                parts.append(p.doc_ids)
        if mode == "and":
            if len(parts) < len(terms):
                out = np.empty(0, np.int64)
            else:
                out = parts[0]
                for q in parts[1:]:
                    out = np.intersect1d(out, q, assume_unique=False)
        else:
            out = (
                np.unique(np.concatenate(parts))
                if parts
                else np.empty(0, np.int64)
            )
        if len(self._match_cache) >= 32:
            self._match_cache.pop(next(iter(self._match_cache)))
        self._match_cache[key] = out
        return out

    def _facet_map(self, facet_parquet: str, facet_col: str):
        """(sorted doc_ids, codes, dictionary) for this shard's doc
        range — loaded ONCE per actor per facet column. Doc chunks are
        contiguous doc_id ranges (build's bucket strategy), so the read
        is row-group-pruned to this shard's range: per-actor memory is
        |corpus|/S ids + int32 codes, the same budget as the shard's
        slots array."""
        key = (facet_parquet, facet_col)
        hit = self._facet_maps.get(key)
        if hit is not None:
            return hit
        import pyarrow.dataset as pads
        import pyarrow.parquet  # noqa: F401

        slots = self.index._slots
        if slots is None or len(slots) == 0:
            hit = (np.empty(0, np.int64), np.empty(0, np.int32), [])
            self._facet_maps[key] = hit
            return hit
        lo, hi = int(slots[0]), int(slots[-1])
        flt = (pads.field("doc_id") >= lo) & (pads.field("doc_id") <= hi)
        t = pads.dataset(facet_parquet).to_table(
            columns=["doc_id", facet_col], filter=flt
        )
        import pyarrow.compute as pc

        idx = pc.sort_indices(t["doc_id"])
        dids = t["doc_id"].take(idx).to_numpy(zero_copy_only=False).astype(np.int64)
        enc = t[facet_col].take(idx).combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int32)
        vocab = enc.dictionary.to_pylist()
        hit = (dids, codes, vocab)
        self._facet_maps[key] = hit
        return hit

    def _local_bucket_counts(
        self, query: str, mode: str, facet_parquet: str, facet_col: str
    ) -> dict:
        m = self._match_docs(query, mode)
        dids, codes, vocab = self._facet_map(facet_parquet, facet_col)
        if len(m) == 0 or len(dids) == 0:
            return {}
        pos = np.searchsorted(dids, m)
        ok = (pos < len(dids)) & (dids[np.minimum(pos, len(dids) - 1)] == m)
        cnt = np.bincount(codes[pos[ok]], minlength=len(vocab))
        return {vocab[i]: int(c) for i, c in enumerate(cnt) if c > 0}

    def facet_phase1(
        self,
        query: str,
        mode: str,
        facet_parquet: str,
        facet_col: str,
        limit: int,
    ) -> tuple[list[tuple[str, int]], bool]:
        """Phase 1: this shard's top-``limit`` facet buckets by local
        count (ties value asc) + a truncated flag (True when buckets
        beyond the limit were cut — the router uses it to decide
        whether candidate MEMBERSHIP is provably complete)."""
        counts = self._local_bucket_counts(query, mode, facet_parquet, facet_col)
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:limit], len(ranked) > limit

    def facet_refine(
        self,
        query: str,
        mode: str,
        facet_parquet: str,
        facet_col: str,
        buckets: list[str],
    ) -> list[int]:
        """Phase 2: exact local counts for the router's candidate
        buckets this shard did not report (match set + facet map are
        cached, so refinement is a dict lookup per bucket)."""
        counts = self._local_bucket_counts(query, mode, facet_parquet, facet_col)
        return [int(counts.get(b, 0)) for b in buckets]


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
        after=None,
    ) -> list[tuple[int, float]]:
        """Top-k across shards: each shard returns its local top-k
        under the shared ranking rule; the merged candidate set (<=
        S*k rows) is re-ranked by the same rule — lossless because
        chunks partition doc space (every global winner is some
        shard's local winner). A search-after cursor applies locally
        on every shard (a global post-cursor winner is some shard's
        local post-cursor winner), so deep paging is lossless too."""
        parts = ray.get(
            [
                a.search.remote(query, k, mode, algorithm, after)
                for a in self.actors
            ]
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

    def facet_search(
        self,
        query: str,
        facet_parquet: str,
        facet_col: str,
        k: int = 10,
        mode: str = "or",
        overrequest: int = 4,
    ) -> tuple[list[tuple[str, int]], bool]:
        """Exact-refined distributed faceting (Solr's two-phase
        facet.overrequest + facet.refine protocol): every shard
        returns its local top-(k*overrequest) buckets over its FULL
        match set; the router unions the bucket keys and asks each
        shard for exact counts of candidates it did not report, so
        every candidate's global count is exact. Only bucket partials
        cross the network — S * k*overrequest rows, never the match
        set.

        Returns (top-k [(value, count)] by count desc / value asc,
        exact) where ``exact`` is True when no shard truncated its
        phase-1 list — then candidate membership is provably complete
        and the result equals the unsharded full facet count. When a
        shard truncated, counts are still exact per candidate but a
        globally-heavy-yet-everywhere-just-below-the-local-limit
        bucket can be missed — the same documented approximation Solr
        ships; raise ``overrequest`` to shrink it."""
        limit = max(1, k * overrequest)
        phase1 = ray.get(
            [
                a.facet_phase1.remote(
                    query, mode, facet_parquet, facet_col, limit
                )
                for a in self.actors
            ]
        )
        cand = sorted({v for ranked, _tr in phase1 for v, _c in ranked})
        exact = not any(tr for _ranked, tr in phase1)
        totals = {v: 0 for v in cand}
        refine_refs, refine_missing = [], []
        for (ranked, _tr), actor in zip(phase1, self.actors):
            got = dict(ranked)
            for v, c in got.items():
                totals[v] += c
            missing = [v for v in cand if v not in got]
            if missing:
                refine_refs.append(
                    actor.facet_refine.remote(
                        query, mode, facet_parquet, facet_col, missing
                    )
                )
                refine_missing.append(missing)
        for missing, counts in zip(refine_missing, ray.get(refine_refs)):
            for v, c in zip(missing, counts):
                totals[v] += c
        ranked = sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k], exact

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []


def _rank_from_scored_postings(
    terms: list[str], got: dict, k: int, mode: str, after=None
) -> list[tuple[int, float]]:
    """The router-side merge shared by the term-sharded and grid
    tiers: given {term: (sorted doc_ids, scores)} for the query terms
    found in the index, reproduce InvertedIndex's non-dense exhaustive
    paths exactly (sorted-term accumulation order → bit-identical
    scores)."""
    if mode == "and":
        # replicate InvertedIndex._search_and (non-dense path)
        if any(t not in got for t in terms):
            return []  # conjunctive + missing term -> empty
        common = got[terms[0]][0]
        for t in terms[1:]:
            common = np.intersect1d(common, got[t][0], assume_unique=True)
            if len(common) == 0:
                return []
        sums = np.zeros(len(common), dtype=np.float64)
        for t in terms:  # sorted-term order -> deterministic sums
            ids, scores = got[t]
            pos = np.searchsorted(ids, common)
            sums += scores[pos]
        return InvertedIndex._topk(common, sums, k, after)
    # replicate InvertedIndex._search_or (non-dense path)
    id_parts, score_parts = [], []
    for t in terms:  # sorted-term order -> deterministic sums
        if t not in got:
            continue
        id_parts.append(got[t][0])
        score_parts.append(got[t][1])
    if not id_parts:
        return []
    all_ids = np.concatenate(id_parts)
    all_scores = np.concatenate(score_parts)
    uniq, inv = np.unique(all_ids, return_inverse=True)
    sums = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(sums, inv, all_scores)
    return InvertedIndex._topk(uniq, sums, k, after)


@ray.remote(max_restarts=3, max_task_retries=3)
class TermShardQueryActor:
    """One VOCABULARY shard's server: loads only the dictionary parts
    and segment files of its term buckets (bucket % T == s) once in
    __init__ — memory ∝ vocab/T + its postings slice, independent of
    corpus size (the 10⁹⁺-term tier: a full dictionary cannot load
    into one actor). Serves per-term scored postings; the router owns
    the cross-term merge.

    ``doc_shard=(c, S)`` additionally restricts the cell to doc chunk
    c — the (term × doc) grid cell for corpora where BOTH vocab and
    doc space exceed one node (GridShardedIndex)."""

    def __init__(
        self, index_dir: str, shard_idx: int, n_shards: int,
        preload: bool = True,
        doc_shard: "tuple[int, int] | None" = None,
    ):
        self.index = InvertedIndex(
            index_dir, preload=preload,
            term_shard=(shard_idx, n_shards), shard=doc_shard,
        )

    def scored_postings(self, terms: list[str]) -> dict:
        """{term: (doc_ids, scores)} for the requested terms found in
        this shard's dictionary slice."""
        out = {}
        for t in terms:
            sp = self.index.scored_postings(t)
            if sp is not None:
                out[t] = sp
        return out

    def vocab_size_local(self) -> int:
        return len(self.index.dictionary)

    def n_segment_files_local(self) -> int:
        return sum(len(ds.files) for ds in self.index._seg_ds)


class TermShardedIndex:
    """Scatter-gather facade over T TermShardQueryActors — the
    vocabulary-partitioned serving tier (term-partitioned distributed
    index; the reference analog is the sharded Solr collection the
    harvester delegates search to, SURVEY.md §2.7).

    Routing: a query term's bucket is ``hash64(term) (as uint64) %
    num_term_buckets`` (the SAME assignment the build's partitioned
    side-write uses, index/build.py make_spimi_with_sides); shard s
    owns buckets with ``bucket % T == s``. Each shard returns per-term
    (doc_ids, scores); the router accumulates in global sorted-term
    order — exactly the single-process accumulation order — so results
    are rank- AND score-identical to one process (tests/
    test_term_sharded.py). Trade-off vs the doc-sharded tier: term
    routing touches only the shards owning query terms (k fan-out, not
    T), but ships per-term posting contributions instead of k-row
    top-ks — the classic term- vs document-partitioning bandwidth
    trade; pair with the doc tier as a (term × doc) grid when both
    vocab and corpus exceed one node.
    """

    def __init__(self, index_dir: str, n_shards: int, preload: bool = True):
        import json
        import os

        from harvester_ray.functions.text import get_analyzer, hash64
        from harvester_ray.index.build import IndexPaths
        from harvester_ray.index.maintenance import source_dirs

        self.n_shards = n_shards
        self._hash64 = hash64
        nbs = set()
        analyzer_name = "default"
        for src in source_dirs(index_dir):
            with open(IndexPaths(src).stats) as f:
                st = json.load(f)
            nbs.add(st.get("num_term_buckets"))
            analyzer_name = st.get("analyzer", "default")
        if len(nbs) != 1 or None in nbs:
            raise ValueError(
                "term-sharded serving needs a consistent num_term_buckets "
                f"recorded in every source's stats.json (got {nbs}); "
                "rebuild/merge with the current engine"
            )
        self.num_term_buckets = nbs.pop()
        self.analyzer = get_analyzer(analyzer_name)
        self.actors = [
            TermShardQueryActor.remote(index_dir, s, n_shards, preload)
            for s in range(n_shards)
        ]

    def shard_of(self, term: str) -> int:
        b = (self._hash64(term) & 0xFFFFFFFFFFFFFFFF) % self.num_term_buckets
        return b % self.n_shards

    def _gather(self, terms: list[str]) -> dict:
        by_shard: dict[int, list[str]] = {}
        for t in terms:
            by_shard.setdefault(self.shard_of(t), []).append(t)
        refs = [
            self.actors[s].scored_postings.remote(ts)
            for s, ts in by_shard.items()
        ]
        merged: dict = {}
        for part in ray.get(refs):
            merged.update(part)
        return merged

    def search(
        self, query: str, k: int = 10, mode: str = "or", after=None
    ) -> list[tuple[int, float]]:
        """Top-k (doc_id, score) — the exhaustive OR/AND semantics of
        InvertedIndex.search (WAND is a document-at-a-time algorithm;
        under term partitioning its pruning would need cross-shard
        round trips per pivot, so this tier serves the vectorized
        exhaustive paths). ``after`` pages exactly like
        InvertedIndex.search (the cursor masks the fused candidate
        set before top-k)."""
        terms = sorted(set(self.analyzer.tokenize(query)))
        if not terms:
            return []
        return _rank_from_scored_postings(
            terms, self._gather(terms), k, mode, after
        )

    def total_vocab(self) -> int:
        return sum(
            ray.get([a.vocab_size_local.remote() for a in self.actors])
        )

    def vocab_sizes(self) -> list[int]:
        return ray.get([a.vocab_size_local.remote() for a in self.actors])

    def segment_file_counts(self) -> list[int]:
        return ray.get(
            [a.n_segment_files_local.remote() for a in self.actors]
        )

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []


class GridShardedIndex:
    """(term × doc) grid serving tier: T×S TermShardQueryActor cells,
    cell (ts, c) loading the INTERSECTION of term buckets ``% T == ts``
    and doc chunk ``c`` — the shape for corpora where vocabulary AND
    doc space each exceed one node (10⁹⁺ terms × 10¹²⁺ docs): cell
    memory ∝ (vocab/T) + (postings/(T·S)).

    Routing: a query term goes to term-row ``bucket % T``; all S cells
    of that row return the term's chunk-local scored postings; chunks
    are ORDERED disjoint doc_id ranges, so concatenating them in chunk
    order yields the term's doc_id-sorted postings — then the same
    sorted-term router merge as the term tier (bit-identical scores to
    a single process)."""

    def __init__(
        self,
        index_dir: str,
        n_term_shards: int,
        n_doc_shards: int,
        preload: bool = True,
    ):
        import json

        from harvester_ray.functions.text import get_analyzer, hash64
        from harvester_ray.index.build import IndexPaths
        from harvester_ray.index.maintenance import source_dirs

        self.n_term_shards = n_term_shards
        self.n_doc_shards = n_doc_shards
        self._hash64 = hash64
        nbs = set()
        analyzer_name = "default"
        for src in source_dirs(index_dir):
            with open(IndexPaths(src).stats) as f:
                st = json.load(f)
            nbs.add(st.get("num_term_buckets"))
            analyzer_name = st.get("analyzer", "default")
        if len(nbs) != 1 or None in nbs:
            raise ValueError(
                "grid serving needs a consistent num_term_buckets in "
                f"every source's stats.json (got {nbs})"
            )
        self.num_term_buckets = nbs.pop()
        self.analyzer = get_analyzer(analyzer_name)
        self.cells = [
            [
                TermShardQueryActor.remote(
                    index_dir, ts, n_term_shards, preload,
                    doc_shard=(c, n_doc_shards),
                )
                for c in range(n_doc_shards)
            ]
            for ts in range(n_term_shards)
        ]

    def shard_of(self, term: str) -> int:
        b = (self._hash64(term) & 0xFFFFFFFFFFFFFFFF) % self.num_term_buckets
        return b % self.n_term_shards

    def _gather(self, terms: list[str]) -> dict:
        by_row: dict[int, list[str]] = {}
        for t in terms:
            by_row.setdefault(self.shard_of(t), []).append(t)
        # fan out each term row's terms to ALL its doc cells (chunk
        # order preserved so per-term concatenation is doc_id-sorted)
        plan = [
            (ts, c, self.cells[ts][c].scored_postings.remote(ts_terms))
            for ts, ts_terms in by_row.items()
            for c in range(self.n_doc_shards)
        ]
        parts = ray.get([r for _, _, r in plan])
        per_term: dict[str, list] = {}
        for (_ts, _c, _r), part in zip(plan, parts):
            for t, (ids, scores) in part.items():
                per_term.setdefault(t, []).append((ids, scores))
        merged: dict = {}
        for t, chunks in per_term.items():
            ids = np.concatenate([i for i, _ in chunks])
            scores = np.concatenate([s for _, s in chunks])
            merged[t] = (ids, scores)
        return merged

    def search(
        self, query: str, k: int = 10, mode: str = "or", after=None
    ) -> list[tuple[int, float]]:
        terms = sorted(set(self.analyzer.tokenize(query)))
        if not terms:
            return []
        return _rank_from_scored_postings(
            terms, self._gather(terms), k, mode, after
        )

    def cell_segment_file_counts(self) -> list[list[int]]:
        return [
            ray.get([c.n_segment_files_local.remote() for c in row])
            for row in self.cells
        ]

    def shutdown(self) -> None:
        for row in self.cells:
            for c in row:
                ray.kill(c)
        self.cells = []
