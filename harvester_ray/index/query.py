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

from harvester_ray.functions.codec import (
    bitpack_decode,
    pfor_decode,
    varint_decode,
)

# per-block decoders for the self-delimiting codecs; "varint" also has
# a bulk whole-column path in decode_all
_BLOCK_DECODERS = {
    "varint": varint_decode,
    "for": bitpack_decode,
    "pfor": pfor_decode,
}
from harvester_ray.functions.text import get_analyzer, tokenize
from harvester_ray.index.build import bm25_score

import re

# per-term-bucket artifact names (bucket strategy): dictionary parts
# and (bucket, chunk) segment parts — the term-shard tier selects
# files by parsing the bucket id out of these
_DICT_PART_RE = re.compile(r"^part-bucket(\d+)\.parquet$")
_SEG_PART_RE = re.compile(r"^part-bucket(\d+)c(\d+)\.parquet$")


def tfidf_score(
    tf: np.ndarray,
    doc_len: np.ndarray,
    df: float,
    n_docs: float,
    avgdl: float,
    k1: float,
    b: float,
) -> np.ndarray:
    """SMART-style cosine TF-IDF: (1 + ln tf) · ln((N+1)/(df+1)) / √dl.

    Same signature as bm25_score so it plugs into the SURVEY §2.10
    scorer injection point; k1/b/avgdl are unused by this weighting.
    Shared verbatim (as SQL) with the DuckDB oracle."""
    return (
        (1.0 + np.log(tf.astype(np.float64)))
        * math.log((n_docs + 1.0) / (df + 1.0))
        / np.sqrt(doc_len.astype(np.float64))
    )


# named scorers for actor construction: map_batches actor ctor args must
# be picklable/stable, so QueryActor takes a NAME here rather than a
# callable (None = the default BM25 fast paths, incl. WAND block maxima)
SCORERS: dict[str, "object"] = {"bm25": None, "tfidf": tfidf_score}


class _TermPostings:
    """Decoded, globally doc_id-sorted postings of one term."""

    __slots__ = ("doc_ids", "tfs", "doc_lens", "df")

    def __init__(self, doc_ids, tfs, doc_lens, df):
        self.doc_ids = doc_ids
        self.tfs = tfs
        self.doc_lens = doc_lens
        self.df = df


class _TermBlocks:
    """Undecoded block metadata of one term WITHIN ONE SOURCE (base or
    one delta), sorted by first_doc_id.

    Salt buckets / sort-strategy runs are disjoint ordered doc_id
    ranges, so sorting one source's blocks by first_doc_id yields a
    sorted list regardless of how many sub-groups encoded it. Across
    sources doc ranges may interleave — the engine keeps per-source
    block lists and merges at decode (postings) or runs per-source
    cursors (WAND).

    ``bmax`` holds the idf-free norm maxima (build.bm25_norm) times
    ``scale``: a source built with avgdl_src stores maxima valid for
    avgdl_src, and norm grows monotonically with avgdl, so serving
    under a larger merged avgdl multiplies the bound by at most
    avgdl_merged/avgdl_src — ``scale = max(1, that ratio)`` keeps WAND
    pruning admissible after incremental adds. Callers multiply by the
    term's idf for score upper bounds.
    """

    __slots__ = (
        "first", "last", "bmax", "deltas", "tfs", "lens", "ub_norm", "codec",
    )

    def __init__(
        self, rows: pd.DataFrame, scale: float = 1.0, codec: str = "varint"
    ):
        rows = rows.sort_values("first_doc_id", kind="stable")
        self._init_sorted(
            rows["first_doc_id"].to_numpy(np.int64),
            rows["last_doc_id"].to_numpy(np.int64),
            rows["block_max_norm"].to_numpy(np.float64) * scale,
            rows["doc_id_deltas"].tolist(),
            rows["tfs"].tolist(),
            rows["doc_lens"].tolist(),
            codec,
        )

    @classmethod
    def from_sorted_arrays(
        cls, first, last, bmax, deltas, tfs, lens, codec="varint"
    ) -> "_TermBlocks":
        """Fast path: already first_doc_id-sorted numpy columns +
        zero-copy pa.BinaryArray slices (the bulk index-load path —
        the pandas groupby constructor cost ~10 s on 1.6 M block rows
        at 2 M docs)."""
        self = cls.__new__(cls)
        self._init_sorted(first, last, bmax, deltas, tfs, lens, codec)
        return self

    def _init_sorted(self, first, last, bmax, deltas, tfs, lens, codec):
        self.codec = codec
        self.first = first
        self.last = last
        self.bmax = bmax
        self.deltas = deltas  # list[bytes] OR pa.BinaryArray slice
        self.tfs = tfs
        self.lens = lens
        self.ub_norm = float(self.bmax.max()) if len(self.bmax) else 0.0

    @staticmethod
    def _buf(col, i: int) -> bytes:
        return col[i] if isinstance(col, list) else col[i].as_py()

    @staticmethod
    def _joined(col) -> bytes:
        """All block buffers concatenated: list join, or (zero-copy
        range + one copy) straight off the BinaryArray values buffer —
        blocks are contiguous in the sorted array, so the joined bytes
        ARE a slice of the underlying buffer."""
        if isinstance(col, list):
            return b"".join(col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        bufs = col.buffers()
        off_dtype = (
            np.int64 if pa.types.is_large_binary(col.type) else np.int32
        )
        off = np.frombuffer(bufs[1], dtype=off_dtype)
        lo = int(off[col.offset])
        hi = int(off[col.offset + len(col)])
        return bufs[2].slice(lo, hi - lo).to_pybytes()

    def decode_block(self, i: int):
        dec = _BLOCK_DECODERS[self.codec]
        ids = dec(self._buf(self.deltas, i)).view(np.int64).cumsum() + self.first[i]
        tf = dec(self._buf(self.tfs, i)).astype(np.int64)
        dl = dec(self._buf(self.lens, i)).astype(np.int64)
        return ids, tf, dl

    def decode_all(self):
        """Bulk decode. varint: ONE decode per column across all blocks
        (buffers concatenate), ids reconstructed with a single prefix
        sum. FOR bitpack buffers are self-delimiting per block, so that
        codec decodes per block and concatenates."""
        if not len(self.first):
            z = np.empty(0, np.int64)
            return z, z.copy(), z.copy()
        if self.codec in ("for", "pfor"):
            id_parts, tf_parts, dl_parts = [], [], []
            for i in range(len(self.first)):
                ids, tf, dl = self.decode_block(i)
                id_parts.append(ids)
                tf_parts.append(tf)
                dl_parts.append(dl)
            return (
                np.concatenate(id_parts),
                np.concatenate(tf_parts),
                np.concatenate(dl_parts),
            )
        gaps = varint_decode(self._joined(self.deltas)).view(np.int64)
        tf = varint_decode(self._joined(self.tfs)).astype(np.int64)
        dl = varint_decode(self._joined(self.lens)).astype(np.int64)
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

    Serves the base index PLUS any delta sources added by
    ``maintenance.add_docs``/``upsert_docs``: dictionaries and global
    stats are merged exactly (sum df/cf/N/token counts), so
    add-then-query is rank- and score-identical to a full rebuild of
    the union. Per-source tombstones are applied at posting decode
    (exhaustive paths) or at pivot scoring (WAND).

    At 100 TB scale the segments directory is hash-partitioned parquet;
    per-term block fetch is a predicate-pushdown read of only that
    term_id's row groups — a query actor never reads the whole index.
    """

    def __init__(
        self,
        index_dir: str,
        preload: bool = False,
        analyzer=None,
        scorer=None,
        shard: "tuple[int, int] | None" = None,
        term_shard: "tuple[int, int] | None" = None,
        as_of: "int | None" = None,
    ):
        """``analyzer``: override the analyzer recorded in stats.json
        (functions.text.Analyzer). ``scorer``: SURVEY §2.10 scorer plug
        point — a callable ``(tf, dl, df, n_docs, avgdl, k1, b) ->
        scores`` replacing BM25 on the exhaustive/dense paths; WAND
        block maxima are BM25-specific, so algorithm="wand" silently
        falls back to the exhaustive path under a custom scorer.

        ``shard=(c, S)``: load ONLY doc_id-chunk ``c`` of ``S`` — the
        shard-serving mode (index/sharded.py): the index must be built
        with the bucket strategy and ``segment_doc_chunks == S``, so
        chunk c's postings live in the ``...c{c}.parquet`` segment
        files and this actor's slots array is 1/S of the doc table.
        Global stats/df stay whole-corpus (stats.json + dictionary), so
        per-shard scores equal the unsharded scores exactly; chunks
        partition doc space, so scatter-gather top-k merge is lossless.
        The dictionary is replicated per shard (doc-sharded tier);
        ``term_shard`` is the orthogonal vocabulary tier.

        ``term_shard=(s, T)``: load ONLY the vocabulary slice whose
        term buckets satisfy ``bucket % T == s`` — dictionary parts AND
        segment files are per-term-bucket artifacts of the bucket
        strategy, so a term-shard actor opens ~1/T of the dictionary
        and ~1/T of the segment files (memory ∝ vocab/T: at a 10⁹+
        vocabulary a single actor cannot hold the whole dict — this is
        the tier the doc-shard docstring used to only name). The doc
        table / slots array is NOT loaded (term-shard actors serve
        per-term scored postings to a router, index/sharded.py
        TermShardedIndex, which owns the cross-term merge); global
        stats N/avgdl and per-term df stay whole-corpus, so shard
        scores equal unsharded scores exactly. Composable with
        ``shard`` (a (term × doc) grid actor loads bucket-and-chunk
        filtered files).
        """
        from harvester_ray.index.build import IndexPaths
        from harvester_ray.index.maintenance import (
            deleted_for_source,
            source_dirs,
        )

        self.index_dir = index_dir
        src_dirs = source_dirs(index_dir)
        # as_of=k: time-travel to source k-1's commit point (Lucene
        # commit-point read): serve sources [0..k) and only tombstones
        # stamped before source k existed — an LSM snapshot is fully
        # determined by its source prefix + stamp-scoped tombstones,
        # so no data is copied or rewritten to read history. The extra
        # point as_of=n_sources+1 is the snapshot AFTER any trailing
        # delete-only commits (all sources + all tombstones == the
        # live view; a tombstone written when n sources existed is
        # stamped seq=n, which as_of=n excludes by design).
        if as_of is not None:
            if not (1 <= as_of <= len(src_dirs) + 1):
                raise ValueError(
                    f"as_of must be in [1, {len(src_dirs) + 1}]: {as_of}"
                )
            src_dirs = src_dirs[:as_of]
        self.as_of = as_of
        self.paths = IndexPaths(index_dir)  # base source (back-compat)
        self._src_paths = [IndexPaths(d) for d in src_dirs]
        stats_list = []
        for p in self._src_paths:
            with open(p.stats) as f:
                stats_list.append(json.load(f))
        self.stats = dict(stats_list[0])
        self.stats["n_docs"] = sum(s["n_docs"] for s in stats_list)
        self.stats["total_tokens"] = sum(s["total_tokens"] for s in stats_list)
        self.stats["avgdl"] = (
            self.stats["total_tokens"] / self.stats["n_docs"]
            if self.stats["n_docs"]
            else 0.0
        )
        self.n_docs = float(self.stats["n_docs"])
        self.avgdl = float(self.stats["avgdl"])
        self.k1 = float(self.stats["k1"])
        self.b = float(self.stats["b"])
        self.analyzer = analyzer or get_analyzer(
            self.stats.get("analyzer", "default")
        )
        self.scorer = scorer
        self.shard = shard
        self._chunk_bounds = None
        if shard is not None:
            c, S = shard
            if S < 1 or (S & (S - 1)) or not (0 <= c < S):
                raise ValueError(f"shard must be (c, power-of-two S): {shard}")
            from harvester_ray.index.build import legacy_chunk_bounds

            # absent bounds (pre-round-5 sources) NORMALIZE to the
            # legacy top-bit edges before comparison — a legacy base
            # plus a delta that add_docs aligned to those same edges
            # must load, not spuriously "disagree"
            legacy = (
                tuple(int(x) for x in legacy_chunk_bounds(S))
                if S > 1
                else None
            )
            bounds_seen = set()
            for s, p in zip(stats_list, self._src_paths):
                if (
                    s.get("segment_strategy") != "bucket"
                    or s.get("segment_doc_chunks") != S
                ):
                    raise ValueError(
                        f"source {p.root} was not built with the bucket "
                        f"strategy at segment_doc_chunks={S}; rebuild "
                        "with IndexConfig(segment_doc_chunks=S) to serve "
                        "doc-sharded"
                    )
                b = s.get("chunk_bounds")
                bounds_seen.add(
                    tuple(int(x) for x in b) if b else legacy
                )
            if len(bounds_seen) > 1:
                raise ValueError(
                    "sources disagree on chunk_bounds; delta sources "
                    "must be built with the base's persisted bounds "
                    "(maintenance.add_docs passes them through)"
                )
            if S > 1:
                self._chunk_bounds = np.asarray(
                    bounds_seen.pop(), dtype=np.int64
                )
        self.term_shard = term_shard
        if term_shard is not None:
            ts, T = term_shard
            if T < 1 or not (0 <= ts < T):
                raise ValueError(
                    f"term_shard must be (s, T) with 0 <= s < T: {term_shard}"
                )
            nbs = set()
            for s, p in zip(stats_list, self._src_paths):
                if s.get("segment_strategy") != "bucket":
                    raise ValueError(
                        f"source {p.root} was not built with the bucket "
                        "strategy; term-sharded serving selects "
                        "per-term-bucket dictionary/segment files"
                    )
                nbs.add(s.get("num_term_buckets"))
            if len(nbs) > 1:
                raise ValueError(
                    f"sources disagree on num_term_buckets: {nbs}; "
                    "merge or rebuild with one config before term-"
                    "sharded serving"
                )
            nb = nbs.pop()
            if nb is not None and T > nb:
                raise ValueError(
                    f"n_term_shards={T} exceeds num_term_buckets={nb}; "
                    "shards beyond the bucket count would be empty"
                )
        self._codecs = [s.get("codec", "varint") for s in stats_list]
        # admissible WAND-bound rescale per source (see _TermBlocks)
        self._bmax_scale = [
            max(1.0, self.avgdl / s["avgdl"]) if s["avgdl"] > 0 else 1.0
            for s in stats_list
        ]
        # merged dictionary: term -> (term_id, sum df, sum cf) — df/cf
        # count tombstoned postings until compaction (Lucene-style)
        dict_tbls = [self._read_dictionary(p) for p in self._src_paths]
        if len(dict_tbls) == 1:
            d = dict_tbls[0].to_pandas()
            self.dictionary = {
                t: (int(i), int(df), int(cf))
                for t, i, df, cf in zip(
                    d["term"], d["term_id"], d["df"], d["cf"]
                )
            }
        else:
            merged = (
                pa.concat_tables(dict_tbls)
                .group_by(["term", "term_id"])
                .aggregate([("df", "sum"), ("cf", "sum")])
            )
            self.dictionary = {
                t: (int(i), int(df), int(cf))
                for t, i, df, cf in zip(
                    merged["term"].to_pylist(),
                    merged["term_id"].to_pylist(),
                    merged["df_sum"].to_pylist(),
                    merged["cf_sum"].to_pylist(),
                )
            }
        if shard is None and term_shard is None:
            self._seg_ds = [pads.dataset(p.segments) for p in self._src_paths]
        else:
            # chunk c's postings live in the ...c{c}.parquet files (doc
            # shard opens 1/S of every source's segment files); bucket
            # b's postings live in the part-bucket{b}... files (term
            # shard opens ~1/T). A (term × doc) grid actor applies both.
            suffix = (
                f"c{shard[0]:02d}.parquet" if shard is not None else None
            )

            def _owned(f: str) -> bool:
                if not f.endswith(".parquet"):
                    return False
                if suffix is not None and not f.endswith(suffix):
                    return False
                if term_shard is not None:
                    m = _SEG_PART_RE.match(f)
                    if m is None:
                        return False
                    ts, T = term_shard
                    if int(m.group(1)) % T != ts:
                        return False
                return True

            self._seg_ds = [
                pads.dataset(
                    [
                        os.path.join(p.segments, f)
                        for f in sorted(os.listdir(p.segments))
                        if _owned(f)
                    ],
                    format="parquet",
                )
                for p in self._src_paths
            ]
        # per-source tombstone sets (arrays for isin, sets for WAND)
        self._dead = [
            deleted_for_source(index_dir, i, as_of=as_of)
            for i in range(len(src_dirs))
        ]
        self._dead_sets = [
            set(d.tolist()) if len(d) else None for d in self._dead
        ]
        self._block_cache: dict[int, list[_TermBlocks | None]] = {}
        self._postings_cache: dict[int, _TermPostings] = {}
        # dense scoring state (single-shard path): sorted doc_id slots +
        # per-term (positions, precomputed BM25 scores). At 10^12-doc
        # scale a query actor owns one doc_id shard and this array is
        # that shard's doc table, not the whole corpus.
        self._slots: np.ndarray | None = None
        self._dense_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        if term_shard is not None:
            # a term-shard actor never loads the doc table: it serves
            # per-term scored postings to the router (TermShardedIndex),
            # which owns the cross-term accumulation — actor memory is
            # vocab/T + its segment slice, independent of corpus size
            self._preloaded = False
            if preload:
                self._preload_segments()
            return
        try:
            id_parts = [
                pq.read_table(p.doc_table, columns=["doc_id"])[
                    "doc_id"
                ].to_numpy()
                for p in self._src_paths
            ]
            self._slots = np.unique(np.concatenate(id_parts))
            if shard is not None and self._chunk_bounds is not None:
                from harvester_ray.index.build import chunk_of_ids

                chunk_of = chunk_of_ids(self._slots, self._chunk_bounds)
                self._slots = self._slots[chunk_of == shard[0]]
        except Exception:
            self._slots = None
        if preload:
            self._preload_segments()
        else:
            self._preloaded = False

    def _preload_segments(self) -> None:
        """Bulk load: ONE lexsort + take per source, then zero-copy
        binary slices per term run — the pandas-groupby constructor
        cost ~10 s on 1.6 M block rows at 2 M docs. Block-buffer
        columns are cast to LARGE (int64-offset) binary first: past
        ~2 GB per column per source (hit at the 20 M-doc soak) the
        int32-offset take/combine would overflow while concatenating."""
        for si, ds in enumerate(self._seg_ds):
            seg = ds.to_table()
            if "term_id" not in seg.column_names or len(seg) == 0:
                continue
            for name in ("doc_id_deltas", "tfs", "doc_lens"):
                i = seg.column_names.index(name)
                seg = seg.set_column(
                    i,
                    name,
                    seg[name].cast(pa.large_binary()),
                )
            tid = seg["term_id"].to_numpy(zero_copy_only=False)
            first = seg["first_doc_id"].to_numpy(zero_copy_only=False)
            order = np.lexsort((first, tid))
            seg = seg.take(pa.array(order))
            tid, first = tid[order], first[order]
            last = seg["last_doc_id"].to_numpy(zero_copy_only=False)
            bmax = (
                seg["block_max_norm"]
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
                * self._bmax_scale[si]
            )
            deltas = seg["doc_id_deltas"].combine_chunks()
            tfs = seg["tfs"].combine_chunks()
            lens = seg["doc_lens"].combine_chunks()
            change = np.nonzero(np.diff(tid))[0] + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(tid)]))
            codec = self._codecs[si]
            for s_, e_ in zip(starts, ends):
                per_src = self._block_cache.setdefault(
                    int(tid[s_]), [None] * len(self._src_paths)
                )
                per_src[si] = _TermBlocks.from_sorted_arrays(
                    first[s_:e_],
                    last[s_:e_],
                    bmax[s_:e_],
                    deltas.slice(s_, e_ - s_),
                    tfs.slice(s_, e_ - s_),
                    lens.slice(s_, e_ - s_),
                    codec,
                )
        self._preloaded = True

    def _read_dictionary(self, p) -> pa.Table:
        """One source's dictionary — term-sharded loads ONLY the owned
        per-bucket parts (bucket % T == s), so actor dict memory is
        ∝ vocab/T; unsharded reads the whole directory as before."""
        d = p.dictionary
        if self.term_shard is None or not os.path.isdir(d):
            return pq.read_table(d)
        ts, T = self.term_shard
        files = []
        for f in sorted(os.listdir(d)):
            m = _DICT_PART_RE.match(f)
            if m is not None and int(m.group(1)) % T == ts:
                files.append(os.path.join(d, f))
        if not files:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "term_id": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "cf": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables([pq.read_table(f) for f in files])

    @property
    def n_sources(self) -> int:
        return len(self._src_paths)

    # -- posting access -------------------------------------------------
    def term_blocks_per_source(
        self, term: str
    ) -> "list[_TermBlocks | None] | None":
        """One _TermBlocks (or None) per source for this term."""
        meta = self.dictionary.get(term)
        if meta is None:
            return None
        tid = meta[0]
        blocks = self._block_cache.get(tid)
        if blocks is None:
            if self._preloaded:
                return None
            blocks = []
            for si, ds in enumerate(self._seg_ds):
                if not ds.files:  # empty shard/source
                    blocks.append(None)
                    continue
                tbl = ds.to_table(filter=pads.field("term_id") == tid)
                if len(tbl) == 0:
                    blocks.append(None)
                    continue
                first = tbl["first_doc_id"].to_numpy(zero_copy_only=False)
                order = np.argsort(first, kind="stable")
                tbl = tbl.take(pa.array(order))
                blocks.append(
                    _TermBlocks.from_sorted_arrays(
                        first[order],
                        tbl["last_doc_id"].to_numpy(zero_copy_only=False),
                        tbl["block_max_norm"]
                        .to_numpy(zero_copy_only=False)
                        .astype(np.float64)
                        * self._bmax_scale[si],
                        tbl["doc_id_deltas"].combine_chunks(),
                        tbl["tfs"].combine_chunks(),
                        tbl["doc_lens"].combine_chunks(),
                        self._codecs[si],
                    )
                )
            if not any(b is not None for b in blocks):
                return None
            self._block_cache[tid] = blocks
        return blocks

    def term_blocks(self, term: str) -> _TermBlocks | None:
        """Single-source accessor (back-compat; base index only)."""
        blocks = self.term_blocks_per_source(term)
        return blocks[0] if blocks else None

    def postings(self, term: str) -> _TermPostings | None:
        """Merged, tombstone-filtered, doc_id-sorted postings across
        all sources. df comes from the merged dictionary (counts
        tombstoned postings until compaction, Lucene-style)."""
        meta = self.dictionary.get(term)
        if meta is None:
            return None
        cached = self._postings_cache.get(meta[0])
        if cached is not None:
            return cached
        blocks = self.term_blocks_per_source(term)
        if blocks is None:
            return None
        id_parts, tf_parts, dl_parts = [], [], []
        for si, blk in enumerate(blocks):
            if blk is None:
                continue
            ids, tf, dl = blk.decode_all()
            dead = self._dead[si]
            if len(dead):
                keep = ~np.isin(ids, dead)
                ids, tf, dl = ids[keep], tf[keep], dl[keep]
            id_parts.append(ids)
            tf_parts.append(tf)
            dl_parts.append(dl)
        if not id_parts:
            return None
        if len(id_parts) == 1:
            ids, tf, dl = id_parts[0], tf_parts[0], dl_parts[0]
        else:
            ids = np.concatenate(id_parts)
            tf = np.concatenate(tf_parts)
            dl = np.concatenate(dl_parts)
            order = np.argsort(ids, kind="stable")
            ids, tf, dl = ids[order], tf[order], dl[order]
        p = _TermPostings(ids, tf, dl, meta[1])  # df from the dictionary
        self._postings_cache[meta[0]] = p
        return p

    def scored_postings(
        self, term: str
    ) -> "tuple[np.ndarray, np.ndarray] | None":
        """(doc_ids, per-posting BM25 scores) for one term, or None if
        the term is absent from this (shard's) dictionary — the unit a
        term-shard actor ships to the TermShardedIndex router. Scores
        use the same ``_score`` as the local search paths, so the
        router's sorted-term accumulation reproduces single-process
        scores bit for bit."""
        p = self.postings(term)
        if p is None:
            return None
        return p.doc_ids, self._score(p.tfs, p.doc_lens, p.df)

    def idf(self, df: int) -> float:
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def _score(self, tf, dl, df) -> np.ndarray:
        if self.scorer is not None:
            return self.scorer(
                tf, dl, df, self.n_docs, self.avgdl, self.k1, self.b
            )
        return bm25_score(tf, dl, df, self.n_docs, self.avgdl, self.k1, self.b)

    # -- search ---------------------------------------------------------
    def search(
        self,
        query: str,
        k: int = 10,
        mode: str = "or",
        algorithm: str = "auto",
        exclude: "str | None" = None,
        after: "tuple[float, int] | None" = None,
    ) -> list[tuple[int, float]]:
        """Top-k (doc_id, score). Duplicate query terms are collapsed
        (set semantics); terms are processed in sorted order so float
        accumulation order is deterministic.

        ``exclude``: boolean NOT — docs containing ANY excluded term
        are dropped BEFORE top-k (so the k results are all eligible).
        Exclusion composes with both modes; the WAND paths have no
        valid block maxima under exclusion, so they fall back to the
        exhaustive paths (same rule as a custom scorer).

        ``after``: search-after cursor (score, doc_id) of the LAST hit
        of the previous page — only results strictly after it in the
        rank order (round-6 score DESC, doc_id ASC) are eligible, so
        page n+1 costs the same as page 1 (no deep-offset re-ranking).
        The reference pages exactly this way through Solr's cursorMark
        (harvester/fetcher/solr_fetcher.py:41-44,124-125). WAND's
        threshold invariant doesn't hold under a cursor, so the
        exhaustive paths serve paged queries."""
        terms = sorted(set(self.analyzer.tokenize(query)))
        if not terms:
            return []
        neg = (
            sorted(set(self.analyzer.tokenize(exclude)) - set(terms))
            if exclude
            else []
        )
        if mode == "and":
            if (
                algorithm == "wand"
                and self.scorer is None
                and not neg
                and after is None
            ):
                return self._search_and_bm(terms, k)
            return self._search_and(terms, k, neg, after)
        if (
            algorithm == "wand"
            and self.scorer is None
            and not neg
            and after is None
        ):
            return self._search_wand(terms, k)
        # auto -> vectorized exhaustive: numpy decode+score is ~20 ns per
        # posting, while the Python document-at-a-time WAND loop costs
        # ~10 us per visited doc — block-max pruning only wins when it
        # skips >99% of postings (very selective queries over huge df),
        # which a caller opts into with algorithm="wand".
        return self._search_or(terms, k, neg, after)

    def explain(self, query: str, doc_id: int) -> dict:
        """Per-term score breakdown for one (query, doc) pair — Lucene
        `explain` parity: for every query term present in the doc,
        (tf, df, doc_len, contribution); `total` is the disjunctive
        score and equals search()'s score for the doc bit-for-bit
        (contributions are summed in the same sorted-term order).
        `idf` is the BM25 inverse document frequency — reported as
        None under an injected custom scorer (whose contribution may
        not factor through idf at all)."""
        terms = sorted(set(self.analyzer.tokenize(query)))
        parts = []
        total = 0.0
        for t in terms:
            p = self.postings(t)
            if p is None:
                continue
            i = int(np.searchsorted(p.doc_ids, doc_id))
            if i >= len(p.doc_ids) or int(p.doc_ids[i]) != doc_id:
                continue
            contrib = float(
                self._score(
                    p.tfs[i : i + 1], p.doc_lens[i : i + 1], p.df
                )[0]
            )
            total += contrib
            parts.append(
                {
                    "term": t,
                    "tf": int(p.tfs[i]),
                    "df": int(p.df),
                    "doc_len": int(p.doc_lens[i]),
                    "idf": None if self.scorer is not None
                    else self.idf(p.df),
                    "contribution": contrib,
                }
            )
        return {"doc_id": int(doc_id), "total": total, "terms": parts}

    def _excluded_docs(self, neg: list[str]) -> "np.ndarray | None":
        """Union of doc_ids containing any excluded term (sorted), or
        None when no excluded term exists in this dictionary."""
        parts = []
        for t in neg:
            p = self.postings(t)
            if p is not None:
                parts.append(p.doc_ids)
        if not parts:
            return None
        return np.unique(np.concatenate(parts))

    @staticmethod
    def _topk(doc_ids: np.ndarray, scores: np.ndarray, k: int, after=None):
        if len(doc_ids) == 0:
            return []
        rounded = np.round(scores, 6)
        if after is not None:
            cs, cd = float(np.round(after[0], 6)), int(after[1])
            elig = (rounded < cs) | ((rounded == cs) & (doc_ids > cd))
            doc_ids, scores, rounded = (
                doc_ids[elig], scores[elig], rounded[elig]
            )
            if len(doc_ids) == 0:
                return []
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

    def _topk_dense(self, acc: np.ndarray, mask: np.ndarray, k: int, after=None):
        """Top-k from a dense score accumulator: kth-value partition,
        then exact (round-6 DESC, doc_id ASC) ordering of the boundary
        candidates only. Tombstoned postings were already filtered at
        decode (postings()), so fully-deleted docs never set the mask."""
        cand = np.nonzero(mask)[0]
        if len(cand) == 0:
            return []
        scores = acc[cand]
        rounded = np.round(scores, 6)
        if after is not None:
            cs, cd = float(np.round(after[0], 6)), int(after[1])
            ids_all = self._slots[cand]
            elig = (rounded < cs) | ((rounded == cs) & (ids_all > cd))
            cand, scores, rounded = cand[elig], scores[elig], rounded[elig]
            if len(cand) == 0:
                return []
        if len(cand) > k:
            kth = np.partition(rounded, len(rounded) - k)[len(rounded) - k]
            keep = rounded >= kth
            cand, scores, rounded = cand[keep], scores[keep], rounded[keep]
        order = np.lexsort((cand, -rounded))[:k]  # slots ascend with doc_id
        ids = self._slots[cand[order]]
        return [(int(d), float(s)) for d, s in zip(ids, scores[order])]

    def _search_or(
        self, terms: list[str], k: int, neg: "list[str]" = (), after=None
    ):
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
            if neg:
                ex = self._excluded_docs(list(neg))
                if ex is not None:
                    hit[np.searchsorted(self._slots, ex)] = False
            return self._topk_dense(acc, hit, k, after)
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
        if neg:
            ex = self._excluded_docs(list(neg))
            if ex is not None:
                keep = ~np.isin(uniq, ex, assume_unique=True)
                uniq, sums = uniq[keep], sums[keep]
        return self._topk(uniq, sums, k, after)

    def _search_and(
        self, terms: list[str], k: int, neg: "list[str]" = (), after=None
    ):
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
            mask = cnt == len(terms)
            if neg:
                ex = self._excluded_docs(list(neg))
                if ex is not None:
                    mask[np.searchsorted(self._slots, ex)] = False
            return self._topk_dense(acc, mask, k, after)
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
        if neg:
            ex = self._excluded_docs(list(neg))
            if ex is not None:
                common = common[~np.isin(common, ex, assume_unique=True)]
                if len(common) == 0:
                    return []
        sums = np.zeros(len(common), dtype=np.float64)
        for p in plists:  # sorted-term order -> deterministic accumulation
            pos = np.searchsorted(p.doc_ids, common)
            sums += self._score(p.tfs[pos], p.doc_lens[pos], p.df)
        return self._topk(common, sums, k, after)

    # -- Block-Max AND (conjunctive leapfrog with block-max pruning) -----
    def _search_and_bm(self, terms: list[str], k: int):
        """Conjunctive top-k with block skipping: leapfrog
        intersection driven by candidate alignment, plus the block-max
        prune — once the heap holds k results, a candidate whose
        summed per-term current-block maxima cannot beat the threshold
        is skipped WITHOUT decoding, jumping to the earliest current
        block boundary (the bounds hold until some term's block
        changes). Rank- and score-identical to the dense AND path
        (same sorted-term accumulation order).

        Incremental sources: one cursor per (term, source) grouped per
        term; a doc matches a term if ANY source holds a live
        (non-tombstoned) posting for it."""
        INF = 2**63 - 1
        groups: list[list[_WandCursor]] = []
        for t in terms:
            blocks_per_src = self.term_blocks_per_source(t)
            meta = self.dictionary.get(t)
            if blocks_per_src is None or meta is None:
                return []  # conjunctive + missing term -> empty
            subs = [
                _WandCursor(b, meta[1], self.idf(meta[1]), self._dead_sets[si])
                for si, b in enumerate(blocks_per_src)
                if b is not None and len(b.first)
            ]
            if not subs:
                return []
            groups.append(subs)
        heap: list[tuple[float, int, float]] = []
        eps = 1e-6

        def gdoc(subs):
            return min((s.doc for s in subs if not s.done), default=INF)

        candidate = max(gdoc(subs) for subs in groups)
        while candidate < INF:
            for subs in groups:
                for s in subs:
                    if not s.done and s.doc < candidate:
                        s.seek(candidate)
            docs = [gdoc(subs) for subs in groups]
            m = max(docs)
            if m == INF:
                break
            if m != candidate or any(d != candidate for d in docs):
                candidate = m
                continue
            theta = (heap[0][0] - eps) if len(heap) >= k else -math.inf
            ub = 0.0
            for subs in groups:
                for s in subs:
                    s.seek_block(candidate)
                ub += max(
                    (
                        s.current_block_max(candidate)
                        for s in subs
                        if not s.done
                    ),
                    default=0.0,
                )
            if ub > theta:
                score = 0.0
                matched = True
                for subs in groups:  # sorted-term order (groups order)
                    contrib = 0.0
                    live = False
                    for s in subs:
                        if s.done or s.doc != candidate:
                            continue
                        if s.dead is not None and candidate in s.dead:
                            continue
                        contrib += s.score_current(self)
                        live = True
                    if not live:
                        matched = False
                        break
                    score += contrib
                if matched:
                    entry = (round(score, 6), -candidate, score)
                    if len(heap) < k:
                        heapq.heappush(heap, entry)
                    elif entry[:2] > heap[0][:2]:
                        heapq.heapreplace(heap, entry)
                candidate += 1
            else:
                # shared-block skip: every doc up to the earliest
                # current-block end has the same per-term bounds
                d_next = min(
                    s.current_block_last()
                    for subs in groups
                    for s in subs
                    if not s.done
                )
                candidate = max(candidate + 1, d_next + 1)
        out = sorted(heap, key=lambda e: (-e[0], -e[1]))
        return [(-neg_doc, score) for _r, neg_doc, score in out][:k]

    # -- Block-Max WAND --------------------------------------------------
    def _search_wand(self, terms: list[str], k: int):
        """Block-Max WAND (Ding & Suel 2011) for disjunctive top-k.

        Heap threshold uses ROUNDED scores (matching the ranking rule)
        minus an epsilon so candidates that round equal to the current
        k-th score are still evaluated and doc_id tie-breaking stays
        exact vs the exhaustive path.

        Incremental sources: ONE cursor per (term, source). A doc's
        postings for a term live in exactly one source, so the summed
        per-cursor upper bounds remain a valid doc score bound, and the
        at-pivot sum collects the doc's real contributions; per-source
        tombstones exclude a dead source's contribution at scoring
        while the same doc_id re-added in a later source still counts.
        """
        cursors = []
        for t in terms:
            blocks_per_src = self.term_blocks_per_source(t)
            meta = self.dictionary.get(t)
            if blocks_per_src is None or meta is None:
                continue
            for si, blocks in enumerate(blocks_per_src):
                if blocks is not None and len(blocks.first):
                    cursors.append(
                        _WandCursor(
                            blocks, meta[1], self.idf(meta[1]),
                            self._dead_sets[si],
                        )
                    )
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
                at_pivot = []
                for c in live:
                    if c.doc > pivot_doc:
                        break
                    c.seek_block(pivot_doc)
                    block_ub += c.current_block_max(pivot_doc)
                    at_pivot.append(c)
                if block_ub > theta:
                    score = 0.0
                    any_live = False
                    for c in at_pivot:
                        # per-source tombstone: skip a dead source's
                        # contribution; other sources still count
                        if c.dead is not None and pivot_doc in c.dead:
                            continue
                        score += c.score_current(self)
                        any_live = True
                    if any_live:
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
        "ub", "_pending_target", "dead",
    )

    def __init__(
        self,
        blocks: _TermBlocks,
        df: int,
        idf: float,
        dead: "set | None" = None,
    ):
        self.blocks = blocks
        self.df = df
        self.idf = idf
        self.dead = dead  # this SOURCE's tombstoned doc_ids
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
        scorer: "str | None" = None,
        as_of: "int | None" = None,
    ):
        self.index = InvertedIndex(
            index_dir,
            preload=preload,
            scorer=SCORERS[scorer] if scorer else None,
            as_of=as_of,
        )
        self.k = k
        self.algorithm = algorithm

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, doc_ids, scores = [], [], [], []
        modes = (
            batch["mode"].to_pylist()
            if "mode" in batch.column_names
            else ["or"] * len(batch)
        )
        excludes = (
            batch["exclude"].to_pylist()
            if "exclude" in batch.column_names
            else [None] * len(batch)
        )
        afters = (
            [
                None if s is None else (float(s), int(d))
                for s, d in zip(
                    batch["after_score"].to_pylist(),
                    batch["after_doc"].to_pylist(),
                )
            ]
            if "after_score" in batch.column_names
            else [None] * len(batch)
        )
        for qid, q, mode, excl, aft in zip(
            batch["query_id"].to_pylist(),
            batch["query"].to_pylist(),
            modes,
            excludes,
            afters,
        ):
            for rank, (doc_id, score) in enumerate(
                self.index.search(
                    q,
                    k=self.k,
                    mode=mode,
                    algorithm=self.algorithm,
                    exclude=excl,
                    after=aft,
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
