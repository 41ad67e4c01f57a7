"""Row-group-pruned doc-chunk reads (segment_doc_chunks > 1):

- the SPIMI bucket side-writes are doc_id-sorted with sized row
  groups, and each chunk task's range filter prunes its read to a
  fraction of the bucket's row groups (the ×S read-amplification fix),
- the filtered read is EXACTLY equivalent to the old read-everything-
  then-mask logic (segments identical table-for-table),
- a chunked build serves postings/queries identical to an unchunked
  build of the same corpus.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from harvester_ray.config import IndexConfig
from harvester_ray.corpus import generate_zipf_docs
from harvester_ray.index.build import (
    IndexPaths,
    _SIGN_FLIP,
    _chunk_signed_range,
    build_index,
)
from harvester_ray.index.query import InvertedIndex

N_CHUNKS = 4
N_DOCS = 2000


def _scattered_docs(seed=11):
    docs = generate_zipf_docs(N_DOCS, vocab_size=500, mean_len=60, seed=seed)
    rng = np.random.default_rng(7)
    # ids uniform over the FULL signed 64-bit range (hash-like), so
    # every chunk holds ~1/N_CHUNKS of the rows
    u = rng.choice(2**62, size=N_DOCS, replace=False).astype(
        np.uint64
    ) * np.uint64(4)
    ids = (u ^ np.uint64(1 << 63)).view(np.int64)
    return docs.set_column(0, "doc_id", pa.array(ids, pa.int64()))


@pytest.fixture(scope="module")
def chunked_build(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("chunkprune")
    docs = _scattered_docs()
    out = str(root / "idx4")
    cfg = IndexConfig(num_term_buckets=4, segment_doc_chunks=N_CHUNKS)
    build_index(ray.data.from_arrow(docs), out, cfg, n_docs=N_DOCS)
    out1 = str(root / "idx1")
    cfg1 = IndexConfig(num_term_buckets=4, segment_doc_chunks=1)
    build_index(ray.data.from_arrow(docs), out1, cfg1, n_docs=N_DOCS)
    return out, out1


def _overlapping_row_groups(bucket_dir: str, lo: int, hi: int):
    """(overlapping, total) row groups across the bucket's files for
    the inclusive doc_id range [lo, hi] — what a statistics-pruned
    read actually touches."""
    overlap = total = 0
    for f in sorted(os.listdir(bucket_dir)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(bucket_dir, f)).metadata
        ci = next(
            i
            for i in range(md.row_group(0).num_columns)
            if md.row_group(0).column(i).path_in_schema == "doc_id"
        )
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ci).statistics
            total += 1
            if st is None or not st.has_min_max:
                overlap += 1
            elif st.min <= hi and st.max >= lo:
                overlap += 1
    return overlap, total


def test_chunk_reads_are_row_group_pruned(chunked_build, ray_session):
    out, _ = chunked_build
    post_root = IndexPaths(out).postings
    buckets = [
        d for d in os.listdir(post_root) if d.startswith("bucket=")
    ]
    assert buckets
    checked = 0
    for bd in buckets:
        bdir = os.path.join(post_root, bd)
        _, total = _overlapping_row_groups(bdir, -(2**63), 2**63 - 1)
        if total < 2 * N_CHUNKS:
            continue  # too few row groups for pruning to show
        for chunk in range(N_CHUNKS):
            lo, hi = _chunk_signed_range(chunk, N_CHUNKS)
            overlap, total = _overlapping_row_groups(bdir, lo, hi)
            # a chunk touches ~1/N_CHUNKS of the row groups (+1 file
            # boundary group); well under half the bucket
            assert overlap <= total / 2, (bd, chunk, overlap, total)
            checked += 1
    assert checked > 0, "no bucket had enough row groups to exercise pruning"


def test_filtered_read_equals_mask_logic(chunked_build, ray_session):
    """The range filter used by encode_bucket_chunk returns exactly the
    rows the old read-all-then-mask logic kept (same rows, any order)."""
    out, _ = chunked_build
    post_root = IndexPaths(out).postings
    shift = np.uint64(64 - int(np.log2(N_CHUNKS)))
    for bd in sorted(os.listdir(post_root)):
        if not bd.startswith("bucket="):
            continue
        bdir = os.path.join(post_root, bd)
        full = pq.read_table(bdir, columns=["doc_id"])
        did = full["doc_id"].to_numpy(zero_copy_only=False)
        for chunk in range(N_CHUNKS):
            lo, hi = _chunk_signed_range(chunk, N_CHUNKS)
            filt = pq.read_table(
                bdir,
                columns=["doc_id"],
                filters=[("doc_id", ">=", lo), ("doc_id", "<=", hi)],
            )["doc_id"].to_numpy(zero_copy_only=False)
            mask = (
                (did.view(np.uint64) ^ _SIGN_FLIP) >> shift
            ) == np.uint64(chunk)
            assert sorted(filt.tolist()) == sorted(did[mask].tolist())


def test_chunked_index_identical_to_unchunked(chunked_build, ray_session):
    out4, out1 = chunked_build
    i4 = InvertedIndex(out4, preload=True)
    i1 = InvertedIndex(out1, preload=True)
    assert i4.dictionary == i1.dictionary
    # per-term postings decode to the same (doc_id, tf, dl) streams
    for term in list(i1.dictionary)[:50]:
        p4, p1 = i4.postings(term), i1.postings(term)
        np.testing.assert_array_equal(p4.doc_ids, p1.doc_ids)
        np.testing.assert_array_equal(p4.tfs, p1.tfs)
        np.testing.assert_array_equal(p4.doc_lens, p1.doc_lens)
    for q in ("w0 w1", "w3 w17 w120", "w12 w120"):
        for mode in ("or", "and"):
            assert i4.search(q, k=10, mode=mode) == i1.search(
                q, k=10, mode=mode
            )
