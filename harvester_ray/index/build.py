"""Inverted-index build: SPIMI partials → {dictionary ∥ doc table ∥
salted/sorted term shuffle → varint/block-max segments}.

This is the Ray-Data-native re-expression of the reference's
couch→solr index sync (``sync_couch_collection_to_solr``,
harvester/solr_updater.py:831-872: validate → map → index-write) with
Solr replaced by our own segment format. Pipeline shape (SURVEY.md §7):

    read_parquet(docs)
      → map_batches(spimi_postings_batch)          # stateless combiner
      → write_parquet(postings/)                   # stage checkpoint
    then, CONCURRENTLY off that one checkpoint:
      dictionary/  partial agg → groupby(term).sum
      doc_table/   per-batch distinct → tiny doc_id groupby
      segments/    sort(term_id, doc_id) → run-split block encode

Key design points for 100 TB scale:

- Segments store the *idf-free* BM25 normalization part
  ``(tf·(k1+1))/(tf + k1·(1−b+b·dl/avgdl))`` and its block max; idf is
  a per-term constant applied at query time from the dictionary. This
  removes any df dependency from segment encoding, so the big shuffle
  needs NO pre-built dictionary and the three post-SPIMI stages run
  concurrently.
- The only all-to-all exchanges are the term shuffle (sort- or
  hash-partitioned; see IndexConfig.segment_strategy) and the (small,
  pre-combined) dictionary/doc-table groupbys.
- Head-term skew: the default "sort" strategy spreads a hot term's
  postings across range partitions (sampled boundaries) — no posting
  group ever has to fit one worker; the alternative "salted_groupby"
  strategy salts head terms (df ≥ threshold, taken from the dictionary)
  into ordered, disjoint doc_id-range sub-groups.
- ``doc_id``/``term_id`` are stable blake2b hashes (functions/text.py),
  so two runs or two cluster sizes produce identical ids
  (SURVEY.md §7 hard part (d)).
- Every stage checkpoint goes through ``state.lineage.run_stage``
  (atomic write + lineage record + skip-if-unchanged resume).
"""

from __future__ import annotations

import hashlib
import json
import math
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from harvester_ray.config import DEFAULT_INDEX_CONFIG, IndexConfig
from harvester_ray.functions.codec import (
    bitpack_encode,
    pfor_encode,
    varint_encode_offsets,
)
from harvester_ray.functions.text import (
    DEFAULT_ANALYZER,
    flatten_tokens,
    get_analyzer,
    hash64_array,
)

ENGINE_VERSION = 4  # v4: stats.json records num_term_buckets (term-shard tier)

# Map signed int64 order onto unsigned order (flip the sign bit), so
# salt buckets are *ordered, disjoint* doc_id ranges in signed order.
_SIGN_FLIP = np.uint64(1) << np.uint64(63)
# driver-side merge guard: tables under this land on the driver, larger
# ones take the distributed path (doc-table validation, chunk bounds)
_DRIVER_MERGE_BYTES = 256 * 1024 * 1024


@dataclass(frozen=True)
class IndexPaths:
    """Layout: stage 1 ("spimi") writes postings plus two side outputs
    (doc table, dictionary partials) in ONE pass; dictionary and
    segments are separate resumable stages."""

    root: str

    @property
    def spimi(self) -> str:
        return os.path.join(self.root, "spimi")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "spimi", "postings")

    @property
    def doc_table(self) -> str:
        return os.path.join(self.root, "spimi", "doc_table")

    @property
    def dict_partials(self) -> str:
        return os.path.join(self.root, "spimi", "dict_partials")

    @property
    def dictionary(self) -> str:
        return os.path.join(self.root, "dictionary")

    @property
    def segments(self) -> str:
        return os.path.join(self.root, "segments")

    @property
    def stats(self) -> str:
        return os.path.join(self.root, "stats.json")


class _SpimiBatch:
    """Fused per-batch SPIMI state: postings + doc table + dictionary
    partials derived from ONE sorted key array (no Arrow group_by —
    the string-key hash aggregate was the measured hot spot at ~0.5 s
    per 8 k-doc batch; the int64-key sort is ~10x cheaper).

    ``doc_len`` rides along on every posting row so scoring needs no
    doc-table join at query time (impact-style layout).
    """

    __slots__ = (
        "dictionary", "uniq_hashes", "term_idx", "doc_row", "tf",
        "doc_ids_all", "doc_len_per_row", "n_rows",
    )

    def __init__(self, batch: pa.Table, analyzer=DEFAULT_ANALYZER):
        toks = analyzer.tokenize_column(batch["text"])
        flat, parent = flatten_tokens(toks)
        self.n_rows = len(batch)
        self.doc_ids_all = (
            batch["doc_id"].combine_chunks()
            if isinstance(batch["doc_id"], pa.ChunkedArray)
            else batch["doc_id"]
        ).to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            self.dictionary = pa.array([], pa.string())
            self.uniq_hashes = np.empty(0, np.int64)
            self.term_idx = np.empty(0, np.int64)
            self.doc_row = np.empty(0, np.int64)
            self.tf = np.empty(0, np.int32)
            self.doc_len_per_row = np.zeros(self.n_rows, np.int32)
            return
        # unique terms once per batch (vocabulary-bounded Python hash)
        denc = pc.dictionary_encode(flat)
        self.dictionary = denc.dictionary
        self.uniq_hashes = hash64_array(self.dictionary)
        tidx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        par = parent.to_numpy(zero_copy_only=False).astype(np.int64)
        # (doc row, term) pair aggregation: one int64 key sort + run-length
        key = np.sort((par << np.int64(32)) | tidx)
        change = np.nonzero(np.diff(key))[0] + 1
        starts = np.concatenate(([0], change))
        self.tf = np.diff(np.concatenate((starts, [len(key)]))).astype(np.int32)
        heads = key[starts]
        self.doc_row = (heads >> np.int64(32)).astype(np.int64)
        self.term_idx = (heads & np.int64(0xFFFFFFFF)).astype(np.int64)
        self.doc_len_per_row = np.bincount(
            par, minlength=self.n_rows
        ).astype(np.int32)

    def postings_table(self, order: np.ndarray | None = None) -> pa.Table:
        """(term, term_id, doc_id, tf, doc_len) rows, optionally in a
        given permutation (bucket order) — the permutation is applied
        to numpy columns and dictionary indices BEFORE string take."""
        ti = self.term_idx if order is None else self.term_idx[order]
        dr = self.doc_row if order is None else self.doc_row[order]
        tf = self.tf if order is None else self.tf[order]
        return pa.table(
            {
                "term": pc.take(self.dictionary, pa.array(ti)),
                "term_id": pa.array(self.uniq_hashes[ti], pa.int64()),
                "doc_id": pa.array(self.doc_ids_all[dr], pa.int64()),
                "tf": pa.array(tf, pa.int32()),
                "doc_len": pa.array(self.doc_len_per_row[dr], pa.int32()),
            }
        )

    def doc_table(self) -> pa.Table:
        """One (doc_id, doc_len) row per doc with >= 1 token."""
        nz = np.nonzero(self.doc_len_per_row)[0]
        return pa.table(
            {
                "doc_id": pa.array(self.doc_ids_all[nz], pa.int64()),
                "doc_len": pa.array(self.doc_len_per_row[nz], pa.int32()),
            }
        )

    def dictionary_partial(self) -> pa.Table:
        """One row per unique term of the batch with partial df
        (posting count) and cf (sum of tf)."""
        n_uniq = len(self.dictionary)
        df = np.bincount(self.term_idx, minlength=n_uniq).astype(np.int64)
        cf = np.bincount(
            self.term_idx, weights=self.tf, minlength=n_uniq
        ).astype(np.int64)
        return pa.table(
            {
                "term": self.dictionary,
                "term_id": pa.array(self.uniq_hashes, pa.int64()),
                "df_part": pa.array(df, pa.int64()),
                "cf_part": pa.array(cf, pa.int64()),
            }
        )


def spimi_postings_batch(
    batch: pa.Table, analyzer=DEFAULT_ANALYZER
) -> pa.Table:
    """SPIMI combiner: a batch of (doc_id, text) → (term, term_id,
    doc_id, tf, doc_len) posting rows, aggregated within the batch."""
    return _SpimiBatch(batch, analyzer).postings_table()


def bm25_norm(
    tf: np.ndarray, doc_len: np.ndarray, avgdl: float, k1: float, b: float
) -> np.ndarray:
    """The idf-free BM25 term: (tf·(k1+1))/(tf + k1·(1−b+b·dl/avgdl)).
    Segments store this (and its block max); score = idf(df) · norm."""
    tf = tf.astype(np.float64)
    dl = doc_len.astype(np.float64)
    return (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def bm25_idf(df: float, n_docs: float) -> float:
    """Lucene-style non-negative idf: ln(1 + (N − df + 0.5)/(df + 0.5))."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_score(
    tf: np.ndarray,
    doc_len: np.ndarray,
    df: float,
    n_docs: float,
    avgdl: float,
    k1: float,
    b: float,
) -> np.ndarray:
    """Full vectorized BM25 — the single scoring definition shared by
    the query engine, the pure-Python oracle and the DuckDB oracle SQL."""
    return bm25_idf(df, n_docs) * bm25_norm(tf, doc_len, avgdl, k1, b)


def make_salter(
    head_ref: "ray.ObjectRef | None",
    n_buckets: int,
    bounds: "np.ndarray | None" = None,
):
    """Returns a map_batches fn adding a ``salt`` column
    (salted_groupby strategy).

    Head terms (term_id in the broadcast set) are salted into ordered
    disjoint doc_id ranges — ``bounds`` (data-derived quantile edges,
    same contract as chunk_bounds) when given, else the legacy top
    log2(n_buckets) bits of sign-flipped doc_id (which degenerate for
    sequential ids: every doc salts identically and head terms don't
    split); tail terms get salt 0. ``head_ref`` is a ray.put ObjectRef
    (broadcast once, fetched once per worker process).
    """
    shift = np.uint64(64 - int(math.log2(n_buckets)))

    def add_salt(batch: pa.Table) -> pa.Table:
        if head_ref is None:
            salt = np.zeros(len(batch), dtype=np.int32)
        else:
            head_ids = _get_broadcast(head_ref)
            tid = batch["term_id"].to_numpy(zero_copy_only=False)
            did = batch["doc_id"].to_numpy(zero_copy_only=False)
            if bounds is not None:
                bucket = chunk_of_ids(did, bounds).astype(np.int32)
            else:
                bucket = (
                    (did.view(np.uint64) ^ _SIGN_FLIP) >> shift
                ).astype(np.int32)
            salt = np.where(np.isin(tid, head_ids), bucket, 0).astype(np.int32)
        return batch.append_column("salt", pa.array(salt, pa.int32()))

    return add_salt


_BROADCAST_CACHE: dict = {}


def _get_broadcast(ref):
    """Fetch a broadcast ObjectRef once per worker process."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _BROADCAST_CACHE:
        _BROADCAST_CACHE[key] = ray.get(ref)
    return _BROADCAST_CACHE[key]


_EMPTY_SEGMENT_TABLE = pa.table(
    {
        "term": pa.array([], pa.string()),
        "term_id": pa.array([], pa.int64()),
        "salt": pa.array([], pa.int32()),
        "block_id": pa.array([], pa.int32()),
        "first_doc_id": pa.array([], pa.int64()),
        "last_doc_id": pa.array([], pa.int64()),
        "n": pa.array([], pa.int32()),
        "doc_id_deltas": pa.array([], pa.binary()),
        "tfs": pa.array([], pa.binary()),
        "doc_lens": pa.array([], pa.binary()),
        "block_max_norm": pa.array([], pa.float32()),
    }
)


def _encode_sorted_runs(
    terms_per_run: pa.Array,
    run_starts: np.ndarray,
    run_ends: np.ndarray,
    tid_s: np.ndarray,
    did_s: np.ndarray,
    tf_s: np.ndarray,
    dl_s: np.ndarray,
    salt: int,
    avgdl: float,
    k1: float,
    b: float,
    bs: int,
    codec: str = "varint",
) -> pa.Table:
    """Encode MANY (term_id, doc_id)-sorted posting runs into block rows
    (FIXTURES.md §3 layout, block_max = idf-free norm max) in ONE
    vectorized pass: per-run block boundaries are computed with
    repeat/cumsum arithmetic, then ONE varint encode per column over
    the whole sorted slab is sliced into per-block buffers — no
    per-run numpy work, no per-run table concat (the per-run encode
    loop was ~40% of segment-task time at 1.5 k runs/bucket)."""
    n = len(did_s)
    if n == 0:
        return _EMPTY_SEGMENT_TABLE
    norms = bm25_norm(tf_s, dl_s, avgdl, k1, b)
    run_lens = run_ends - run_starts
    nb_per_run = (run_lens + bs - 1) // bs
    total_blocks = int(nb_per_run.sum())
    first_block_of_run = np.concatenate(([0], np.cumsum(nb_per_run)[:-1]))
    within = np.arange(total_blocks) - np.repeat(first_block_of_run, nb_per_run)
    starts = np.repeat(run_starts, nb_per_run) + within * bs
    ends = np.minimum(starts + bs, np.repeat(run_ends, nb_per_run))
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = 0
    np.subtract(did_s[1:], did_s[:-1], out=gaps[1:], casting="unsafe")
    gaps[starts] = 0  # gap[0] of each block is relative to first_doc_id
    if codec == "varint":
        gap_buf, gap_ends = varint_encode_offsets(gaps)
        tf_buf, tf_ends = varint_encode_offsets(tf_s)
        dl_buf, dl_ends = varint_encode_offsets(dl_s)

        def slices(buf: bytes, value_ends: np.ndarray) -> list[bytes]:
            byte_lo = np.concatenate(([0], value_ends[ends[:-1] - 1]))
            byte_hi = value_ends[ends - 1]
            return [buf[a:b_] for a, b_ in zip(byte_lo, byte_hi)]

        gap_col = slices(gap_buf, gap_ends)
        tf_col = slices(tf_buf, tf_ends)
        dl_col = slices(dl_buf, dl_ends)
    elif codec == "for":
        # FOR bit-packed option (the "varint/PForDelta" alternative of
        # the north star): tighter blocks, per-block Python encode loop
        # — pick for storage-bound deployments, varint for build speed
        gap_col = [bitpack_encode(gaps[a:b_]) for a, b_ in zip(starts, ends)]
        tf_col = [bitpack_encode(tf_s[a:b_]) for a, b_ in zip(starts, ends)]
        dl_col = [bitpack_encode(dl_s[a:b_]) for a, b_ in zip(starts, ends)]
    elif codec == "pfor":
        # PForDelta with patched exceptions (codec.pfor_encode): FOR's
        # tight widths without outlier blow-up — the smallest segments
        # of the three; per-block Python encode loop like "for"
        gap_col = [pfor_encode(gaps[a:b_]) for a, b_ in zip(starts, ends)]
        tf_col = [pfor_encode(tf_s[a:b_]) for a, b_ in zip(starts, ends)]
        dl_col = [pfor_encode(dl_s[a:b_]) for a, b_ in zip(starts, ends)]
    else:
        raise ValueError(f"unknown codec {codec!r}")

    block_max = np.maximum.reduceat(norms, starts).astype(np.float32)
    run_of_block = np.repeat(
        np.arange(len(run_starts), dtype=np.int64), nb_per_run
    )
    term_col = pa.DictionaryArray.from_arrays(
        pa.array(run_of_block, pa.int64()),
        terms_per_run.cast(pa.string()),
    ).cast(pa.string())
    return pa.table(
        {
            "term": term_col,
            "term_id": pa.array(tid_s[starts], pa.int64()),
            "salt": pa.array(np.full(total_blocks, salt, np.int32)),
            "block_id": pa.array(within.astype(np.int32)),
            "first_doc_id": pa.array(did_s[starts], pa.int64()),
            "last_doc_id": pa.array(did_s[ends - 1], pa.int64()),
            "n": pa.array((ends - starts).astype(np.int32)),
            "doc_id_deltas": pa.array(gap_col, pa.binary()),
            "tfs": pa.array(tf_col, pa.binary()),
            "doc_lens": pa.array(dl_col, pa.binary()),
            "block_max_norm": pa.array(block_max, pa.float32()),
        }
    )


def _encode_run(
    term: str,
    term_id: int,
    salt: int,
    doc_id: np.ndarray,
    tf: np.ndarray,
    dl: np.ndarray,
    avgdl: float,
    k1: float,
    b: float,
    bs: int,
    codec: str = "varint",
) -> pa.Table:
    """Encode one doc_id-sorted posting run (single-run wrapper around
    the vectorized multi-run encoder; used by the salted_groupby
    strategy where each map_groups group IS one run)."""
    n = len(doc_id)
    return _encode_sorted_runs(
        pa.array([term], pa.string()),
        np.array([0], dtype=np.int64),
        np.array([n], dtype=np.int64),
        np.full(n, term_id, np.int64),
        doc_id, tf, dl, salt, avgdl, k1, b, bs, codec,
    )


def make_term_group_encoder(avgdl: float, cfg: IndexConfig):
    """map_groups fn for the salted_groupby strategy: encode one
    (term_id, salt) group into block rows."""
    k1, b, bs = cfg.bm25.k1, cfg.bm25.b, cfg.block_size
    codec = cfg.codec

    def encode(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _EMPTY_SEGMENT_TABLE
        doc_id = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(doc_id, kind="stable")
        doc_id = doc_id[order]
        tf = group["tf"].to_numpy(zero_copy_only=False)[order]
        dl = group["doc_len"].to_numpy(zero_copy_only=False)[order]
        term = group["term"][0].as_py()
        term_id = group["term_id"][0].as_py()
        salt = group["salt"][0].as_py() if "salt" in group.column_names else 0
        return _encode_run(
            term, term_id, salt, doc_id, tf, dl, avgdl, k1, b, bs, codec
        )

    return encode


def make_sorted_batch_encoder(avgdl: float, cfg: IndexConfig):
    """Encoder for the "sort" segment strategy: batches arrive sorted by
    (term_id, doc_id); each batch splits into term runs and encodes
    each run independently.

    A term whose postings span several batches (or range partitions)
    yields several disjoint, ordered run encodings — the segment format
    and the query loader merge them by first_doc_id, so no post-merge
    is needed.
    """
    k1, b_, bs = cfg.bm25.k1, cfg.bm25.b, cfg.block_size
    codec = cfg.codec

    def encode_batch(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _EMPTY_SEGMENT_TABLE
        tids = batch["term_id"].to_numpy(zero_copy_only=False)
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        tf = batch["tf"].to_numpy(zero_copy_only=False)
        dl = batch["doc_len"].to_numpy(zero_copy_only=False)
        change = np.nonzero(np.diff(tids))[0] + 1
        run_starts = np.concatenate(([0], change))
        run_ends = np.concatenate((change, [len(tids)]))
        terms_per_run = pc.take(
            batch["term"].combine_chunks(), pa.array(run_starts, pa.int64())
        )
        return _encode_sorted_runs(
            terms_per_run, run_starts, run_ends,
            tids, doc_id, tf, dl, 0, avgdl, k1, b_, bs, codec,
        )

    return encode_batch


def _present_buckets(post_root: str) -> list[int]:
    """Bucket ids that actually exist under the hive-partitioned
    postings root (``bucket=N`` dirs), sorted. Per-bucket stages fan
    out over these instead of range(num_term_buckets): a small corpus
    fills a fraction of the hash space, and launching a Ray task per
    EMPTY bucket is pure fixed cost. At corpus scale every bucket
    exists and this equals range(num_term_buckets)."""
    try:
        entries = os.listdir(post_root)
    except OSError:
        return []
    out = []
    for e in entries:
        if e.startswith("bucket="):
            try:
                out.append(int(e.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(out)


def _atomic_side_write(
    tbl: pa.Table, out_dir: str, key: str, row_group_size: int | None = None
) -> None:
    """Idempotent side-output write from inside a map_batches task:
    deterministic content-derived file name + atomic rename, so task
    retries overwrite rather than duplicate (the side-output pattern;
    same shared-storage assumption as write_parquet itself).

    ``row_group_size``: set small when the rows are sorted on a column
    downstream tasks range-filter on (doc_id chunk reads) — row-group
    min/max statistics then prune the read to ~1/chunks of the file."""
    import pyarrow.parquet as pq

    final = os.path.join(out_dir, f"part-{key}.parquet")
    tmp = f"{final}.tmp-{os.getpid()}"
    pq.write_table(tbl, tmp, row_group_size=row_group_size)
    os.replace(tmp, final)


# --- doc-chunk boundaries -------------------------------------------------
# A doc chunk is a CONTIGUOUS signed doc_id range: that property is
# load-bearing (per-term runs from different chunks are disjoint
# ordered ranges that merge at query load, and chunk membership is a
# parquet range filter that row-group statistics prune). Boundaries
# are DATA-DERIVED near-equal-count quantiles of the corpus's actual
# doc_ids, persisted in stats.json as ``chunk_bounds`` (the inclusive
# upper doc_id edge of chunks 0..S-2) — fixed top-bit ranges of the
# int64 space degenerate completely for sequential ids 0..N (every doc
# lands in ONE chunk, found by the 20 M-doc soak). Indexes built
# before ``chunk_bounds`` fall back to the legacy top-bit edges, which
# reproduce the old assignment bit for bit.

_INT64_MIN = -(1 << 63)
_INT64_MAX = (1 << 63) - 1


def legacy_chunk_bounds(n_chunks: int) -> np.ndarray:
    """The pre-round-5 fixed edges: chunk = top log2(S) bits of
    sign-flipped doc_id, expressed as inclusive upper bounds."""
    shift = np.uint64(64 - int(math.log2(n_chunks)))
    u = (
        np.arange(1, n_chunks, dtype=np.uint64) << shift
    ) - np.uint64(1)
    return (u ^ _SIGN_FLIP).view(np.int64)


def chunk_of_ids(ids: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    """Chunk index per doc_id under inclusive-upper-edge bounds."""
    return np.searchsorted(
        bounds, np.asarray(ids, dtype=np.int64), side="left"
    ).astype(np.int64)


def _chunk_signed_range(chunk: int, bounds: np.ndarray) -> tuple[int, int]:
    """Inclusive signed-doc_id range of doc chunk ``chunk`` under
    ``bounds`` (len S-1 inclusive upper edges)."""
    lo = _INT64_MIN if chunk == 0 else int(bounds[chunk - 1]) + 1
    hi = _INT64_MAX if chunk >= len(bounds) else int(bounds[chunk])
    return lo, hi


def compute_chunk_bounds(doc_table_dir: str, n_chunks: int) -> list[int]:
    """Near-equal-count doc-chunk boundaries from the written doc
    table. Deterministic and order-independent. Under the driver merge
    guard: exact rank quantiles of the (unique) doc_ids. Beyond it: a
    distributed equal-width histogram — 65 536 cells spanning the
    observed [min, max] — folded by a (cell)-keyed groupby, so at most
    65 536 rows ever reach the driver; boundaries land on cell edges
    (balance within cell granularity, correctness unconditional: ANY
    consistent bounds give a valid index layout)."""
    import pyarrow.parquet as pq

    files = [
        f for f in sorted(os.listdir(doc_table_dir))
        if f.endswith(".parquet")
    ]
    if not files:
        return [int(b) for b in legacy_chunk_bounds(n_chunks)]
    total_bytes = sum(
        os.path.getsize(os.path.join(doc_table_dir, f)) for f in files
    )
    if total_bytes <= _DRIVER_MERGE_BYTES:
        ids = np.sort(
            pq.read_table(doc_table_dir, columns=["doc_id"])[
                "doc_id"
            ].to_numpy()
        )
        n = len(ids)
        if n < n_chunks:
            return [int(b) for b in legacy_chunk_bounds(n_chunks)]
        bounds = [
            int(ids[(c + 1) * n // n_chunks - 1])
            for c in range(n_chunks - 1)
        ]
    else:
        from ray.data.aggregate import Max, Min, Sum

        ds = ray.data.read_parquet(doc_table_dir, columns=["doc_id"])
        mm = ds.aggregate(
            Min("doc_id", alias_name="lo"), Max("doc_id", alias_name="hi")
        )
        lo, hi = int(mm["lo"]), int(mm["hi"])
        # all arithmetic in the sign-flipped UNSIGNED id space: a
        # signed (d - lo) wraps int64 when ids span more than half the
        # domain (hash-spread ids do)
        lo_u = lo + (1 << 63)  # the sign-flip map as plain arithmetic
        hi_u = hi + (1 << 63)
        n_cells = 1 << 16
        width = max(1, (hi_u - lo_u) // n_cells + 1)
        lo_u64, w_u64 = np.uint64(lo_u), np.uint64(width)

        def cells(t: pa.Table) -> pa.Table:
            d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            du = d.view(np.uint64) ^ _SIGN_FLIP
            c = ((du - lo_u64) // w_u64).astype(np.int64)
            uc, cnt = np.unique(c, return_counts=True)
            return pa.table(
                {
                    "cell": pa.array(uc, pa.int64()),
                    "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )

        rows = (
            ds.map_batches(cells, batch_format="pyarrow")
            .groupby("cell")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .take_all()
        )
        rows.sort(key=lambda r: int(r["cell"]))
        cell_ids = np.array([int(r["cell"]) for r in rows], np.int64)
        cum = np.cumsum([int(r["cnt"]) for r in rows])
        n = int(cum[-1]) if len(cum) else 0
        if n < n_chunks:
            return [int(b) for b in legacy_chunk_bounds(n_chunks)]
        bounds = []
        for c in range(n_chunks - 1):
            target = (c + 1) * n // n_chunks
            i = int(np.searchsorted(cum, target, side="left"))
            i = min(i, len(cell_ids) - 1)
            # inclusive upper edge of the cut cell, back to signed
            b_u = min(
                lo_u + (int(cell_ids[i]) + 1) * width - 1, (1 << 64) - 1
            )
            bounds.append(b_u - (1 << 63))  # back to signed
    out: list[int] = []
    prev = None
    for b in bounds:  # strictly increasing (empty chunks are legal)
        if prev is not None and b <= prev:
            b = prev + 1
        out.append(min(b, _INT64_MAX - 1))
        prev = out[-1]
    return out


def make_spimi_with_sides(
    doc_dir: str,
    dict_dir: str,
    n_buckets: int | None = None,
    post_dir: str | None = None,
    analyzer=DEFAULT_ANALYZER,
    doc_chunks: int = 1,
):
    """SPIMI batch fn that emits the doc table, dictionary partials and
    (bucket strategy) the term-bucketed postings as idempotent side
    outputs — one pass over the corpus feeds all three
    downstream artifacts, instead of three full postings re-reads.

    Each input row is one doc, so per-batch (doc_id, doc_len) rows are
    globally exact with no dedup shuffle; dictionary partials shrink
    the dictionary groupby input from |postings| to |batches|x|vocab|.

    With ``n_buckets``/``post_dir`` set (the "bucket" strategy)
    postings land hive-partitioned by ``hash(term_id) % n_buckets`` —
    the partitioned side write IS the index shuffle (map-side
    partitioning, merged by the per-bucket segment tasks) — and the
    Dataset output degrades to per-batch row counts (the pipeline is
    consumed with a sum). Other strategies return the posting rows for
    a normal write_parquet.
    """

    def fn(batch: pa.Table) -> pa.Table:
        pa.set_cpu_count(1)  # see encode_bucket: avoid Arrow pool thrash
        # duplicate doc_ids would encode a 0 doc_id gap that only fails
        # later as an opaque decode assert — fail clearly at build time
        ids_in = batch["doc_id"].to_numpy(zero_copy_only=False)
        if len(np.unique(ids_in)) != len(ids_in):
            raise ValueError(
                "build_index input has duplicate doc_id values within a "
                "batch; doc_id must be unique per document (dedup or "
                "re-derive ids with functions.text.hash64)"
            )
        sb = _SpimiBatch(batch, analyzer)
        if len(sb.term_idx) == 0:
            return (
                sb.postings_table()
                if n_buckets is None
                else pa.table({"rows": pa.array([0], pa.int64())})
            )
        doc_tbl = sb.doc_table()
        min_id = int(doc_tbl["doc_id"].to_numpy().min())
        key = f"{min_id & 0xFFFFFFFFFFFFFFFF:016x}"
        _atomic_side_write(doc_tbl, doc_dir, key)
        if n_buckets is None:
            # non-bucket strategies: dictionary partials shrink the
            # dictionary groupby input from |postings| to
            # |batches| x |vocab|
            _atomic_side_write(sb.dictionary_partial(), dict_dir, key)
            return sb.postings_table()
        # bucket strategy: the map task writes its postings split by
        # term bucket DIRECTLY (hive layout), so the stage is one fully
        # streaming pass — no repartition barrier, no second write pass.
        # Bucket assignment is computed per UNIQUE term and scattered;
        # the permutation is applied to numpy columns + dictionary
        # indices before the string take (Table.take on a string column
        # was measured ~1 s per 6 M rows).
        assert post_dir is not None
        bucket_of_uniq = (
            sb.uniq_hashes.view(np.uint64) % np.uint64(n_buckets)
        ).astype(np.int32)
        b = bucket_of_uniq[sb.term_idx]
        # when the config fans segment encoding out over doc chunks,
        # rows land doc_id-SORTED within each bucket and in small row
        # groups — the chunk tasks' range filters then prune the read
        # to ~1/chunks of each file instead of re-reading the whole
        # bucket per chunk (the ×S read amplification fix). At
        # doc_chunks=1 the cheaper bucket-only sort keeps the SPIMI
        # hot path free of the extra int64 lexsort key.
        if doc_chunks > 1:
            did_rows = sb.doc_ids_all[sb.doc_row]
            order = np.lexsort((did_rows, b))
        else:
            order = np.argsort(b, kind="stable")
        out_sorted = sb.postings_table(order)
        bs = b[order]
        bounds = np.nonzero(np.diff(bs))[0] + 1
        lo = 0
        for hi in list(bounds) + [len(bs)]:
            part = out_sorted.slice(lo, hi - lo)
            bdir = os.path.join(post_dir, f"bucket={bs[lo]}")
            os.makedirs(bdir, exist_ok=True)
            rgs = (
                max(1024, -(-len(part) // (4 * doc_chunks)))
                if doc_chunks > 1
                else None
            )
            _atomic_side_write(part, bdir, key, row_group_size=rgs)
            lo = hi
        return pa.table({"rows": pa.array([len(out_sorted)], pa.int64())})

    return fn


def build_index(
    docs: "ray.data.Dataset",
    out_dir: str,
    cfg: IndexConfig = DEFAULT_INDEX_CONFIG,
    n_docs: int | None = None,
    input_fingerprint: str | None = None,
    chunk_bounds: "list[int] | None" = None,
) -> IndexPaths:
    """Run the full build. ``docs`` must have columns (doc_id, text).

    ``chunk_bounds`` (segment_doc_chunks > 1 only): inclusive upper
    doc_id edges of chunks 0..S-2. Pass the BASE index's persisted
    bounds when building a delta source so chunk files align across
    sources (maintenance.add_docs does); omitted, bounds are derived
    from this corpus's doc_ids (compute_chunk_bounds).

    ``n_docs`` (corpus size incl. zero-token docs — it feeds idf and
    avgdl) can be passed when the caller already knows it; otherwise a
    metadata-cheap ``docs.count()`` runs first.

    Every stage goes through ``state.lineage.run_stage``: output is
    written atomically with a ``_lineage.json`` record, and a re-run
    with an unchanged ``input_fingerprint`` (pass the fingerprint of
    the source parquet, e.g. ``lineage.dir_fingerprint(src)``) resumes
    — completed stages are skipped. With ``input_fingerprint=None`` the
    postings stage always re-runs (unknown provenance) but downstream
    stages still resume off its content fingerprint.
    """
    import concurrent.futures

    import pyarrow.parquet as pq

    from harvester_ray.state.lineage import dir_fingerprint, run_stage

    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    if n_docs is None:
        n_docs = docs.count()

    bucketed = cfg.segment_strategy == "bucket"

    # Stage 1 (one pass over the corpus): SPIMI postings checkpoint
    # + doc table + dictionary partials as idempotent side outputs.
    # Bucket strategy: postings land hive-partitioned by term bucket —
    # the partitioned write IS the index shuffle.
    def write_spimi(tmp: str) -> None:
        post_dir = os.path.join(tmp, "postings")
        doc_dir = os.path.join(tmp, "doc_table")
        dict_dir = os.path.join(tmp, "dict_partials")
        os.makedirs(doc_dir, exist_ok=True)
        if not bucketed:
            os.makedirs(dict_dir, exist_ok=True)
        ds = docs.map_batches(
            make_spimi_with_sides(
                doc_dir,
                dict_dir,
                cfg.num_term_buckets if bucketed else None,
                post_dir if bucketed else None,
                # resolved on the DRIVER and shipped by cloudpickle, so
                # custom analyzers need no worker-side registration for
                # the build (query actors resolve by name from stats)
                analyzer=get_analyzer(cfg.analyzer_name),
                doc_chunks=max(1, cfg.segment_doc_chunks),
            ),
            batch_format="pyarrow",
            # bucket strategy: large batches — the side writes (one
            # file per bucket per batch) are the per-batch fixed cost,
            # so fewer, larger batches win
            batch_size=cfg.spimi_batch_size if bucketed else cfg.tokenize_batch_size,
            zero_copy_batch=True,
        )
        if bucketed:
            # postings were side-written per bucket inside the map
            # tasks; consume the count rows to drive the streaming pass
            os.makedirs(post_dir, exist_ok=True)
            ds.sum("rows")
        else:
            ds.write_parquet(post_dir)

    run_stage(
        "spimi",
        paths.spimi,
        input_fingerprint or f"unfingerprinted-{os.getpid()}-{id(docs)}",
        write_spimi,
        params=f"tokenizer=v{ENGINE_VERSION},analyzer={cfg.analyzer_name}",
    )
    postings_fp = dir_fingerprint(paths.spimi)

    # Cross-batch doc_id uniqueness + total token count in ONE read:
    # every doc-table row is one doc of one batch, so a doc_id
    # appearing in two batches shows up as duplicate rows here.
    # Driver-side under the merge guard (the doc table is 2 ints +
    # 1 int32/doc); beyond it the cheap count invariant (rows <=
    # n_docs) plus a Ray aggregate run instead.
    doc_bytes = sum(
        os.path.getsize(os.path.join(paths.doc_table, f))
        for f in os.listdir(paths.doc_table)
    )
    if doc_bytes <= _DRIVER_MERGE_BYTES:
        dt = pq.read_table(paths.doc_table, columns=["doc_id", "doc_len"])
        dt_ids = dt["doc_id"].to_numpy()
        if len(np.unique(dt_ids)) != len(dt_ids):
            raise ValueError(
                "build_index input has duplicate doc_id values across "
                "batches; doc_id must be globally unique per document"
            )
        n_with_tokens = len(dt_ids)
        total_tokens = int(pc.sum(dt["doc_len"]).as_py() or 0)
        del dt, dt_ids
    else:
        n_with_tokens = sum(
            pq.ParquetFile(os.path.join(paths.doc_table, f)).metadata.num_rows
            for f in os.listdir(paths.doc_table)
            if f.endswith(".parquet")
        )
        total_tokens = int(
            ray.data.read_parquet(paths.doc_table).sum("doc_len") or 0
        )
    if n_with_tokens > n_docs:
        raise ValueError(
            f"doc table has {n_with_tokens} rows but n_docs={n_docs}; "
            "duplicate doc_ids or an understated n_docs"
        )
    avgdl = (total_tokens / n_docs) if n_docs else 0.0

    # doc-chunk boundaries: caller-supplied (delta sources align to
    # their base) or derived from this corpus's actual doc_ids. Only
    # the bucket strategy consumes them (chunked segment files +
    # sharded serving); other strategies skip the derivation scan.
    n_chunks_cfg = max(1, cfg.segment_doc_chunks)
    if n_chunks_cfg > 1 and not bucketed:
        n_chunks_cfg = 1
    if n_chunks_cfg > 1:
        bounds_arr = np.asarray(
            chunk_bounds
            if chunk_bounds is not None
            else compute_chunk_bounds(paths.doc_table, n_chunks_cfg),
            dtype=np.int64,
        )
        if len(bounds_arr) != n_chunks_cfg - 1:
            raise ValueError(
                f"chunk_bounds must have {n_chunks_cfg - 1} edges, "
                f"got {len(bounds_arr)}"
            )
    else:
        bounds_arr = None

    # Stage 2a: dictionary. Bucket strategy: one independent task per
    # term bucket aggregates df/cf straight off that bucket's hive
    # partition (postings rows ARE (term, doc) pairs: df = rows per
    # term, cf = sum tf) — parallel, co-partitioned with the segments,
    # no driver-side merge. Other strategies: merge of the pre-combined
    # per-batch dictionary partials (|batches| x |vocab| rows), driver
    # Arrow group_by under the size guard, Ray groupby beyond.
    post_root = paths.postings

    def write_dictionary_bucketed(tmp: str) -> None:
        @ray.remote(num_cpus=1)
        def dict_bucket(bk: int) -> int:
            pa.set_cpu_count(1)
            d = os.path.join(post_root, f"bucket={bk}")
            if not os.path.isdir(d):
                return 0
            t = pq.read_table(
                d, columns=["term", "term_id", "tf"], use_threads=False
            )
            if len(t) == 0:
                return 0
            agg = t.group_by(["term", "term_id"]).aggregate(
                [("term", "count"), ("tf", "sum")]
            )
            out = pa.table(
                {
                    "term": agg["term"],
                    "term_id": agg["term_id"],
                    "df": agg["term_count"].cast(pa.int64()),
                    "cf": agg["tf_sum"].cast(pa.int64()),
                }
            )
            _atomic_side_write(out, tmp, f"bucket{bk:05d}")
            return len(out)

        os.makedirs(tmp, exist_ok=True)
        # launch only buckets that exist on disk: a small corpus fills
        # a fraction of the 128 hash buckets and the per-task fixed
        # cost (~20 ms) dominates empty launches; at scale all exist
        ray.get([dict_bucket.remote(b) for b in _present_buckets(post_root)])

    def write_dictionary(tmp: str) -> None:
        if bucketed:
            return write_dictionary_bucketed(tmp)
        size = sum(
            os.path.getsize(os.path.join(paths.dict_partials, f))
            for f in os.listdir(paths.dict_partials)
        )
        if size <= _DRIVER_MERGE_BYTES:
            parts = pq.read_table(paths.dict_partials)
            agg = parts.group_by(["term", "term_id"]).aggregate(
                [("df_part", "sum"), ("cf_part", "sum")]
            )
            final = pa.table(
                {
                    "term": agg["term"],
                    "term_id": agg["term_id"],
                    "df": agg["df_part_sum"].cast(pa.int64()),
                    "cf": agg["cf_part_sum"].cast(pa.int64()),
                }
            )
            os.makedirs(tmp, exist_ok=True)
            pq.write_table(final, os.path.join(tmp, "dictionary.parquet"))
        else:
            (
                ray.data.read_parquet(paths.dict_partials)
                .groupby(["term", "term_id"])
                .aggregate(
                    Sum("df_part", alias_name="df"), Sum("cf_part", alias_name="cf")
                )
                .write_parquet(tmp)
            )

    # Stage 2b: segments — THE wide shuffle. Needs no dictionary
    # (block max stores the idf-free norm), so it runs concurrently.
    def write_segments_sort(tmp: str) -> None:
        (
            ray.data.read_parquet(paths.postings)
            .sort(["term_id", "doc_id"])
            .map_batches(
                make_sorted_batch_encoder(avgdl, cfg),
                batch_format="pyarrow",
                batch_size=None,  # whole sorted blocks
                zero_copy_batch=True,
            )
            .write_parquet(tmp)
        )

    def write_segments_bucket(tmp: str) -> None:
        """Default strategy: one independent task per (term bucket,
        doc_id-range chunk) — read the bucket's hive partition, keep
        the chunk's doc range, lexsort by (term_id, doc_id), run-split
        encode. No Ray sort/groupby machinery; deterministic block
        layout (the lexsort key is a total order, chunk ranges are
        fixed contiguous doc_id ranges under the persisted bounds).

        The chunk fan-out keeps parallelism = buckets x chunks even
        when the vocabulary is tiny or one term is enormous (per-term
        runs from different chunks are disjoint ordered doc ranges and
        merge at query load). Memory per task is bounded by the chunk,
        not the bucket."""
        post_root = paths.postings
        n_chunks = n_chunks_cfg
        k1, b_, bs = cfg.bm25.k1, cfg.bm25.b, cfg.block_size
        codec = cfg.codec

        # Raw Ray tasks (not a Dataset op) on purpose: the fan-out unit
        # is a CONTROL row (bucket id), and Ray Data bundles tiny
        # control blocks into one task, serializing the whole stage.
        # Each task reads its bucket partition and writes its own
        # segment part atomically. The permutation is applied to numpy
        # columns only (an Arrow Table.take would re-copy the term
        # string column per row — measured ~1 s per 6M rows); the one
        # term string per run is looked up individually.
        @ray.remote(num_cpus=1)
        def encode_bucket_chunk(b: int, chunk: int) -> int:
            # cap THIS worker's Arrow pool: concurrent tasks otherwise
            # spin up hardware_concurrency threads each and thrash
            pa.set_cpu_count(1)
            d = os.path.join(post_root, f"bucket={b}")
            if not os.path.isdir(d):
                return 0
            if bounds_arr is not None:
                # chunk membership is a contiguous signed doc_id range
                # (see _chunk_signed_range); the SPIMI side-writes are
                # doc_id-sorted with sized row groups, so this filter
                # PRUNES the read by row-group statistics — each chunk
                # task reads ~1/chunks of the bucket, not all of it
                lo, hi = _chunk_signed_range(chunk, bounds_arr)
                t = pq.read_table(
                    d,
                    columns=["term", "term_id", "doc_id", "tf", "doc_len"],
                    use_threads=False,  # the task owns 1 CPU
                    filters=[("doc_id", ">=", lo), ("doc_id", "<=", hi)],
                )
            else:
                t = pq.read_table(
                    d,
                    columns=["term", "term_id", "doc_id", "tf", "doc_len"],
                    use_threads=False,
                )
            if len(t) == 0:
                return 0
            tid = t["term_id"].to_numpy(zero_copy_only=False)
            did = t["doc_id"].to_numpy(zero_copy_only=False)
            tf = t["tf"].to_numpy(zero_copy_only=False)
            dl = t["doc_len"].to_numpy(zero_copy_only=False)
            order = np.lexsort((did, tid))
            tid_s, did_s = tid[order], did[order]
            tf_s, dl_s = tf[order], dl[order]
            change = np.nonzero(np.diff(tid_s))[0] + 1
            run_starts = np.concatenate(([0], change))
            run_ends = np.concatenate((change, [len(tid_s)]))
            terms_per_run = pc.take(
                t["term"].combine_chunks(), pa.array(order[run_starts])
            )
            seg = _encode_sorted_runs(
                terms_per_run, run_starts, run_ends,
                tid_s, did_s, tf_s, dl_s, 0, avgdl, k1, b_, bs, codec,
            )
            _atomic_side_write(seg, tmp, f"bucket{b:05d}c{chunk:02d}")
            return len(seg)

        os.makedirs(tmp, exist_ok=True)
        ray.get(
            [
                encode_bucket_chunk.remote(b, c)
                for b in _present_buckets(post_root)
                for c in range(n_chunks)
            ]
        )

    def write_segments_salted(tmp: str) -> None:
        # head terms (df >= threshold) need the dictionary — this path
        # therefore waits for it (strategy tradeoff documented in
        # IndexConfig); the salter broadcast is a ray.put done once.
        d = pq.read_table(paths.dictionary, columns=["term_id", "df"])
        head_mask = d["df"].to_numpy() >= cfg.salt_df_threshold
        head_ref = (
            ray.put(d["term_id"].to_numpy()[head_mask]) if head_mask.any() else None
        )
        # data-derived salt ranges so head terms split for ANY id
        # distribution (sequential ids degenerate under top-bit salt)
        salt_bounds = (
            np.asarray(
                compute_chunk_bounds(paths.doc_table, cfg.salt_buckets),
                dtype=np.int64,
            )
            if head_ref is not None
            else None
        )
        salted = ray.data.read_parquet(paths.postings).map_batches(
            make_salter(head_ref, cfg.salt_buckets, salt_bounds),
            batch_format="pyarrow",
        )
        (
            salted.groupby(["term_id", "salt"])
            .map_groups(
                make_term_group_encoder(avgdl, cfg),
                batch_format="pyarrow",
            )
            .write_parquet(tmp)
        )

    bounds_tag = (
        hashlib.md5(bounds_arr.tobytes()).hexdigest()[:12]
        if bounds_arr is not None
        else "none"
    )
    seg_params = (
        f"strategy={cfg.segment_strategy},bs={cfg.block_size},"
        f"thr={cfg.salt_df_threshold},buckets={cfg.salt_buckets},"
        f"tbuckets={cfg.num_term_buckets},chunks={cfg.segment_doc_chunks},"
        f"bounds={bounds_tag},codec={cfg.codec},"
        f"k1={cfg.bm25.k1},b={cfg.bm25.b},avgdl={avgdl!r}"
    )

    # Sequential staging: the dictionary merge is driver-cheap at
    # combiner scale, and concurrent Dataset executions were measured
    # to contend destructively with the segment stage.
    run_stage("dictionary", paths.dictionary, postings_fp, write_dictionary)
    write_segments = {
        "bucket": write_segments_bucket,
        "sort": write_segments_sort,
        "salted_groupby": write_segments_salted,
    }[cfg.segment_strategy]
    run_stage(
        "segments", paths.segments, postings_fp, write_segments, seg_params
    )

    # term_id collision check (vocabulary-scale, driver-side; a
    # blake2b-64 collision would silently merge two terms' postings —
    # not expected below ~2^30 terms; swap to a Ray aggregate beyond).
    tid = pq.read_table(paths.dictionary, columns=["term_id"])["term_id"].to_numpy()
    n_terms = len(tid)
    if len(np.unique(tid)) != n_terms:
        raise RuntimeError(
            f"term_id hash collision among {n_terms} terms; rehash with a salt"
        )

    with open(paths.stats, "w") as f:
        json.dump(
            {
                "n_docs": int(n_docs),
                "total_tokens": total_tokens,
                "avgdl": avgdl,
                "n_terms": int(n_terms),
                "k1": cfg.bm25.k1,
                "b": cfg.bm25.b,
                "block_size": cfg.block_size,
                "analyzer": cfg.analyzer_name,
                "segment_strategy": cfg.segment_strategy,
                "segment_doc_chunks": cfg.segment_doc_chunks,
                # data-derived doc-chunk edges (see compute_chunk_bounds);
                # absent on chunks=1 and on pre-round-5 indexes (legacy
                # top-bit edges apply there)
                "chunk_bounds": (
                    [int(x) for x in bounds_arr]
                    if bounds_arr is not None
                    else None
                ),
                # serving tiers need the bucket count: doc shards select
                # segment files by chunk suffix, term shards by bucket
                # prefix (index/sharded.py routes a query term to shard
                # (hash(term_id) % num_term_buckets) % n_term_shards)
                "num_term_buckets": (
                    cfg.num_term_buckets if bucketed else None
                ),
                "codec": cfg.codec,
                "engine_version": ENGINE_VERSION,
            },
            f,
        )
    return paths
