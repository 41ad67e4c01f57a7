"""Inverted-index build: SPIMI partials → dictionary → salted term
groupby → varint/block-max segments.

This is the Ray-Data-native re-expression of the reference's
couch→solr index sync (``sync_couch_collection_to_solr``,
harvester/solr_updater.py:831-872: validate → map → index-write) with
Solr replaced by our own segment format. Pipeline shape (SURVEY.md §7):

    read_parquet(docs)
      → map_batches(spimi_postings_batch)          # stateless combiner
      → write_parquet(postings/)                   # stage checkpoint
    read(postings) → partial agg → groupby(term).sum → dictionary/
    read(postings) → salt head terms → groupby(term_id, salt)
      → map_groups(encode_term_group)              # THE wide shuffle
      → write_parquet(segments/)

Scale design:
- The only all-to-all exchange is the term_id groupby. Its input is
  already combined (one row per (term, doc) per batch), and head terms
  (global df ≥ ``salt_df_threshold``) are salted into ordered,
  disjoint doc_id-range sub-groups so no group exceeds worker memory;
  sub-group blocks concatenate into a globally doc_id-sorted posting
  list without a re-merge (SURVEY.md §4 "queue priority / skew" row).
- The dictionary build pre-aggregates per batch before its groupby, so
  the shuffle moves one row per (term, batch), not one per posting.
- The head-term df map is broadcast via ``ray.put`` once and read once
  per worker — never shipped per batch.
- ``doc_id``/``term_id`` are stable blake2b hashes (functions/text.py),
  so two runs or two cluster sizes produce identical segments
  (SURVEY.md §7 hard part (d)).
"""

from __future__ import annotations

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
from harvester_ray.functions.codec import varint_encode_offsets
from harvester_ray.functions.text import flatten_tokens, hash64_array, tokenize_column

ENGINE_VERSION = 1

# Map signed int64 order onto unsigned order (flip the sign bit), so
# salt buckets are *ordered, disjoint* doc_id ranges in signed order.
_SIGN_FLIP = np.uint64(1) << np.uint64(63)


@dataclass(frozen=True)
class IndexPaths:
    root: str

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def dictionary(self) -> str:
        return os.path.join(self.root, "dictionary")

    @property
    def doc_table(self) -> str:
        return os.path.join(self.root, "doc_table")

    @property
    def segments(self) -> str:
        return os.path.join(self.root, "segments")

    @property
    def stats(self) -> str:
        return os.path.join(self.root, "stats.json")


def spimi_postings_batch(batch: pa.Table) -> pa.Table:
    """SPIMI combiner: a batch of (doc_id, text) → (term, term_id,
    doc_id, tf, doc_len) posting rows, aggregated within the batch.

    All-Arrow: utf8_lower + regex split + list_flatten + group_by; the
    only Python loop is hashing the batch's *unique* terms (vocabulary-
    bounded). ``doc_len`` rides along on every posting row so scoring
    needs no doc-table join at query time (impact-style layout).
    """
    toks = tokenize_column(batch["text"])
    flat, parent = flatten_tokens(toks)
    doc_ids = pc.take(
        batch["doc_id"].combine_chunks()
        if isinstance(batch["doc_id"], pa.ChunkedArray)
        else batch["doc_id"],
        parent,
    )
    if len(flat) == 0:
        return pa.table(
            {
                "term": pa.array([], pa.string()),
                "term_id": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "tf": pa.array([], pa.int32()),
                "doc_len": pa.array([], pa.int32()),
            }
        )
    pairs = pa.table({"term": flat, "doc_id": doc_ids})
    agg = pairs.group_by(["term", "doc_id"]).aggregate([("term", "count")])
    tf = agg["term_count"].cast(pa.int32())
    # doc_len = total tokens per doc in this batch (docs never span batches)
    lens = pairs.group_by(["doc_id"]).aggregate([("term", "count")])
    len_ids = lens["doc_id"].to_numpy(zero_copy_only=False)
    len_vals = lens["term_count"].to_numpy(zero_copy_only=False).astype(np.int32)
    order = np.argsort(len_ids, kind="stable")
    len_ids, len_vals = len_ids[order], len_vals[order]
    agg_doc = agg["doc_id"].to_numpy(zero_copy_only=False)
    doc_len = len_vals[np.searchsorted(len_ids, agg_doc)]
    # hash only unique terms, then scatter via dictionary indices
    dict_arr = pc.dictionary_encode(agg["term"].combine_chunks())
    uniq_hashes = hash64_array(dict_arr.dictionary)
    term_id = uniq_hashes[dict_arr.indices.to_numpy(zero_copy_only=False)]
    return pa.table(
        {
            "term": agg["term"],
            "term_id": pa.array(term_id, pa.int64()),
            "doc_id": agg["doc_id"],
            "tf": tf,
            "doc_len": pa.array(doc_len, pa.int32()),
        }
    )


def _dictionary_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner for the dictionary groupby: one row per term
    per batch with partial df (posting count) and cf (sum of tf)."""
    agg = batch.group_by(["term", "term_id"]).aggregate(
        [("doc_id", "count"), ("tf", "sum")]
    )
    return pa.table(
        {
            "term": agg["term"],
            "term_id": agg["term_id"],
            "df_part": agg["doc_id_count"].cast(pa.int64()),
            "cf_part": agg["tf_sum"].cast(pa.int64()),
        }
    )


def bm25_score(
    tf: np.ndarray,
    doc_len: np.ndarray,
    df: float,
    n_docs: float,
    avgdl: float,
    k1: float,
    b: float,
) -> np.ndarray:
    """Vectorized BM25 (Lucene-style non-negative idf):
    idf = ln(1 + (N - df + 0.5)/(df + 0.5)).
    The single scoring definition shared by build (block maxes), query
    engine, the pure-Python oracle, and the DuckDB oracle SQL."""
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    tf = tf.astype(np.float64)
    dl = doc_len.astype(np.float64)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def make_salter(head_ref: "ray.ObjectRef | None", n_buckets: int):
    """Returns a map_batches fn adding a ``salt`` column.

    Head terms (term_id in the broadcast set) are salted by the top 6
    bits of sign-flipped doc_id → ordered disjoint ranges; tail terms
    get salt 0. ``head_ref`` is a ray.put ObjectRef (broadcast once,
    fetched once per worker process via a module-level cache).
    """
    shift = np.uint64(64 - int(math.log2(n_buckets)))

    def add_salt(batch: pa.Table) -> pa.Table:
        if head_ref is None:
            salt = np.zeros(len(batch), dtype=np.int32)
        else:
            head_ids = _get_broadcast(head_ref)
            tid = batch["term_id"].to_numpy(zero_copy_only=False)
            did = batch["doc_id"].to_numpy(zero_copy_only=False)
            bucket = ((did.view(np.uint64) ^ _SIGN_FLIP) >> shift).astype(np.int32)
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


def make_term_group_encoder(
    n_docs: float,
    avgdl: float,
    cfg: IndexConfig,
    head_df_ref: "ray.ObjectRef | None" = None,
):
    """Returns the map_groups fn encoding one (term_id, salt) group into
    compressed block rows.

    Block layout per FIXTURES.md §3: postings sorted by doc_id, split
    into ``cfg.block_size`` runs; per block store first/last doc_id,
    varint doc_id gaps (gap[0] = 0 relative to first_doc_id), varint
    tfs, varint doc_lens, and the true max BM25 score of the block
    (block-max metadata for Block-Max WAND).
    """
    k1, b = cfg.bm25.k1, cfg.bm25.b
    bs = cfg.block_size

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
        n = len(doc_id)
        if salt == 0 and head_df_ref is None:
            df = n
        else:
            head_df = _get_broadcast(head_df_ref) if head_df_ref is not None else {}
            df = int(head_df.get(term_id, n))
        return _encode_run(
            term, term_id, salt, doc_id, tf, dl, df, n_docs, avgdl, k1, b, bs
        )

    return encode


_EMPTY_SEGMENT_TABLE = pa.table(
    {
        "term": pa.array([], pa.string()),
        "term_id": pa.array([], pa.int64()),
        "df": pa.array([], pa.int64()),
        "salt": pa.array([], pa.int32()),
        "block_id": pa.array([], pa.int32()),
        "first_doc_id": pa.array([], pa.int64()),
        "last_doc_id": pa.array([], pa.int64()),
        "n": pa.array([], pa.int32()),
        "doc_id_deltas": pa.array([], pa.binary()),
        "tfs": pa.array([], pa.binary()),
        "doc_lens": pa.array([], pa.binary()),
        "block_max_score": pa.array([], pa.float32()),
    }
)


def _encode_run(
    term: str,
    term_id: int,
    salt: int,
    doc_id: np.ndarray,
    tf: np.ndarray,
    dl: np.ndarray,
    df: int,
    n_docs: float,
    avgdl: float,
    k1: float,
    b: float,
    bs: int,
) -> pa.Table:
    """Encode one doc_id-sorted posting run into block rows.

    Vectorized whole-run encode: block boundaries first, then ONE varint
    encode per column with per-value byte offsets, sliced into per-block
    buffers (no per-block numpy work).
    """
    n = len(doc_id)
    scores = bm25_score(tf, dl, df, n_docs, avgdl, k1, b)
    starts = np.arange(0, n, bs, dtype=np.int64)
    ends = np.minimum(starts + bs, n)
    n_blocks = len(starts)
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = 0
    np.subtract(doc_id[1:], doc_id[:-1], out=gaps[1:], casting="unsafe")
    gaps[starts] = 0  # gap[0] of each block is relative to first_doc_id
    gap_buf, gap_ends = varint_encode_offsets(gaps)
    tf_buf, tf_ends = varint_encode_offsets(tf)
    dl_buf, dl_ends = varint_encode_offsets(dl)

    def slices(buf: bytes, value_ends: np.ndarray) -> list[bytes]:
        byte_lo = np.concatenate(([0], value_ends[ends[:-1] - 1]))
        byte_hi = value_ends[ends - 1]
        return [buf[a:b_] for a, b_ in zip(byte_lo, byte_hi)]

    block_max = np.maximum.reduceat(scores, starts).astype(np.float32)
    return pa.table(
        {
            "term": pa.array([term] * n_blocks, pa.string()),
            "term_id": pa.array(np.full(n_blocks, term_id, np.int64)),
            "df": pa.array(np.full(n_blocks, df, np.int64)),
            "salt": pa.array(np.full(n_blocks, salt, np.int32)),
            "block_id": pa.array(np.arange(n_blocks, dtype=np.int32)),
            "first_doc_id": pa.array(doc_id[starts], pa.int64()),
            "last_doc_id": pa.array(doc_id[ends - 1], pa.int64()),
            "n": pa.array((ends - starts).astype(np.int32)),
            "doc_id_deltas": pa.array(slices(gap_buf, gap_ends), pa.binary()),
            "tfs": pa.array(slices(tf_buf, tf_ends), pa.binary()),
            "doc_lens": pa.array(slices(dl_buf, dl_ends), pa.binary()),
            "block_max_score": pa.array(block_max, pa.float32()),
        }
    )


def make_sorted_batch_encoder(
    n_docs: float, avgdl: float, cfg: IndexConfig, df_ref: "ray.ObjectRef"
):
    """Encoder for the "sort" segment strategy: batches arrive sorted by
    (term_id, doc_id); each batch splits into term runs and encodes
    each run independently.

    A term whose postings span several batches (or range partitions)
    yields several disjoint, ordered run encodings — the segment format
    and the query loader merge them by first_doc_id, so no post-merge
    is needed. Global df comes from the broadcast dictionary arrays
    (sorted term_id + df, searchsorted lookup; ray.put once, fetched
    once per worker, plasma-shared zero-copy per node).
    """
    k1, b_, bs = cfg.bm25.k1, cfg.bm25.b, cfg.block_size

    def encode_batch(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _EMPTY_SEGMENT_TABLE
        tid_sorted, df_sorted = _get_broadcast(df_ref)
        tids = batch["term_id"].to_numpy(zero_copy_only=False)
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        tf = batch["tf"].to_numpy(zero_copy_only=False)
        dl = batch["doc_len"].to_numpy(zero_copy_only=False)
        terms = batch["term"]
        change = np.nonzero(np.diff(tids))[0] + 1
        run_starts = np.concatenate(([0], change))
        run_ends = np.concatenate((change, [len(tids)]))
        dfs = df_sorted[np.searchsorted(tid_sorted, tids[run_starts])]
        out = []
        for s, e, df in zip(run_starts, run_ends, dfs):
            out.append(
                _encode_run(
                    terms[s].as_py(), int(tids[s]), 0,
                    doc_id[s:e], tf[s:e], dl[s:e], int(df),
                    n_docs, avgdl, k1, b_, bs,
                )
            )
        return pa.concat_tables(out)

    return encode_batch


def _doc_table_batch(batch: pa.Table) -> pa.Table:
    """Per-batch distinct (doc_id, doc_len). Docs never span tokenize
    batches, and postings parquet preserves that row locality, so a
    global groupby would only dedupe rows split across parquet row-group
    boundaries — handled by the final small groupby in build_index."""
    agg = batch.group_by(["doc_id"]).aggregate([("doc_len", "max")])
    return pa.table(
        {"doc_id": agg["doc_id"], "doc_len": agg["doc_len_max"].cast(pa.int32())}
    )


def build_index(
    docs: "ray.data.Dataset",
    out_dir: str,
    cfg: IndexConfig = DEFAULT_INDEX_CONFIG,
    n_docs: int | None = None,
    input_fingerprint: str | None = None,
) -> IndexPaths:
    """Run the full build. ``docs`` must have columns (doc_id, text).

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
    from harvester_ray.state.lineage import dir_fingerprint, run_stage

    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    if n_docs is None:
        n_docs = docs.count()

    # Stage 1: SPIMI partial postings (stateless tasks) → checkpoint.
    def write_postings(tmp: str) -> None:
        docs.map_batches(
            spimi_postings_batch,
            batch_format="pyarrow",
            batch_size=cfg.tokenize_batch_size,
            zero_copy_batch=True,
        ).write_parquet(tmp)

    run_stage(
        "postings",
        paths.postings,
        input_fingerprint or f"unfingerprinted-{os.getpid()}-{id(docs)}",
        write_postings,
        params=f"tokenizer=v{ENGINE_VERSION}",
    )
    postings_fp = dir_fingerprint(paths.postings)

    # Global stats from the checkpoint (column-pruned read of tf only).
    total_tokens = ray.data.read_parquet(paths.postings, columns=["tf"]).sum("tf")
    total_tokens = int(total_tokens or 0)
    avgdl = (total_tokens / n_docs) if n_docs else 0.0

    # Stage 2: dictionary — partial agg per batch, then the (small)
    # term groupby over combined rows.
    def write_dictionary(tmp: str) -> None:
        (
            ray.data.read_parquet(paths.postings)
            .map_batches(_dictionary_partial, batch_format="pyarrow")
            .groupby(["term", "term_id"])
            .aggregate(Sum("df_part", alias_name="df"), Sum("cf_part", alias_name="cf"))
            .write_parquet(tmp)
        )

    run_stage("dictionary", paths.dictionary, postings_fp, write_dictionary)

    # term_id collision check (vocabulary-scale, cheap): a blake2b-64
    # collision would silently merge two terms' postings.
    dict_tbl = ray.data.read_parquet(paths.dictionary, columns=["term_id"])
    n_terms = dict_tbl.count()
    n_ids = dict_tbl.unique("term_id")
    if len(n_ids) != n_terms:
        raise RuntimeError(
            f"term_id hash collision: {n_terms} terms -> {len(n_ids)} ids; "
            "rehash with a salt (not expected below ~2^30 terms)"
        )

    # Stage 3: doc table (no shuffle — per-batch distinct + tiny final dedupe).
    def write_doc_table(tmp: str) -> None:
        (
            ray.data.read_parquet(paths.postings, columns=["doc_id", "doc_len"])
            .map_batches(_doc_table_batch, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(ray.data.aggregate.Max("doc_len", alias_name="doc_len"))
            .write_parquet(tmp)
        )

    run_stage("doc_table", paths.doc_table, postings_fp, write_doc_table)

    # Stage 4: segments — THE wide shuffle.
    def write_segments_sort(tmp: str) -> None:
        """Default strategy: range-partitioned sort by (term_id, doc_id)
        + run-splitting batch encoder. Head-term skew spreads across
        range partitions; per-run df from the broadcast dictionary."""
        import pyarrow.parquet as pq

        dict_tbl = pq.read_table(
            paths.dictionary, columns=["term_id", "df"]
        )
        tid = dict_tbl["term_id"].to_numpy()
        dfv = dict_tbl["df"].to_numpy()
        order = np.argsort(tid)
        df_ref = ray.put((tid[order], dfv[order]))
        (
            ray.data.read_parquet(paths.postings)
            .sort(["term_id", "doc_id"])
            .map_batches(
                make_sorted_batch_encoder(float(n_docs), avgdl, cfg, df_ref),
                batch_format="pyarrow",
                batch_size=None,  # whole sorted blocks
                zero_copy_batch=True,
            )
            .write_parquet(tmp)
        )

    def write_segments_salted(tmp: str) -> None:
        head = (
            ray.data.read_parquet(paths.dictionary)
            .map_batches(
                lambda t: t.filter(pc.greater_equal(t["df"], cfg.salt_df_threshold)),
                batch_format="pyarrow",
            )
            .to_pandas()
        )
        head_ref = None
        head_df_ref = None
        if len(head):
            head_ref = ray.put(head["term_id"].to_numpy())
            head_df_ref = ray.put(dict(zip(head["term_id"], head["df"].astype(int))))

        salted = ray.data.read_parquet(paths.postings).map_batches(
            make_salter(head_ref, cfg.salt_buckets), batch_format="pyarrow"
        )
        (
            salted.groupby(["term_id", "salt"])
            .map_groups(
                make_term_group_encoder(float(n_docs), avgdl, cfg, head_df_ref),
                batch_format="pyarrow",
            )
            .write_parquet(tmp)
        )

    seg_params = (
        f"strategy={cfg.segment_strategy},bs={cfg.block_size},"
        f"thr={cfg.salt_df_threshold},buckets={cfg.salt_buckets},"
        f"k1={cfg.bm25.k1},b={cfg.bm25.b},n={n_docs},avgdl={avgdl!r}"
    )
    write_segments = (
        write_segments_salted
        if cfg.segment_strategy == "salted_groupby"
        else write_segments_sort
    )
    run_stage(
        "segments", paths.segments, postings_fp, write_segments, params=seg_params
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
                "engine_version": ENGINE_VERSION,
            },
            f,
        )
    return paths
