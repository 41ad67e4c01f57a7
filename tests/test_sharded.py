"""Doc-sharded query serving: multi-shard results must be
rank-identical (ids AND scores) to the single-process index on the
same corpus, across OR / AND / WAND paths, with deltas and deletes."""

import numpy as np
import pytest
import ray.data

from harvester_ray.config import IndexConfig
from harvester_ray.corpus import generate_zipf_docs
from harvester_ray.index.build import build_index
from harvester_ray.index.query import InvertedIndex
from harvester_ray.index.sharded import ShardedIndex

N_SHARDS = 4

QUERIES = [
    ("w0 w1", "or", "auto"),
    ("w0 w1", "or", "wand"),
    ("w3 w17 w120", "or", "auto"),
    ("w500 w77", "or", "wand"),
    ("w0 w1", "and", "auto"),
    ("w0 w1", "and", "wand"),
    ("w12 w120", "and", "auto"),
    ("w12 w120", "and", "wand"),
    ("absent w0", "and", "auto"),
]


@pytest.fixture(scope="module")
def sharded_setup(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("shard")
    # doc_ids spread over the full signed range so chunk ranges are
    # non-trivial: mix negative and positive hash-like ids
    docs = generate_zipf_docs(600, vocab_size=600, mean_len=50, seed=9)
    rng = np.random.default_rng(1)
    import pyarrow as pa

    scattered = docs.set_column(
        0,
        "doc_id",
        pa.array(
            rng.choice(2**62, size=600, replace=False).astype(np.int64)
            - 2**61,
            pa.int64(),
        ),
    )
    out = str(root / "idx")
    cfg = IndexConfig(segment_doc_chunks=N_SHARDS)
    build_index(ray.data.from_arrow(scattered), out, cfg, n_docs=600)
    return out


def test_sharded_rank_identical(sharded_setup, ray_session):
    out = sharded_setup
    single = InvertedIndex(out, preload=True)
    tier = ShardedIndex(out, N_SHARDS)
    try:
        assert tier.total_docs() == len(single._slots)  # disjoint cover
        for q, mode, algo in QUERIES:
            want = single.search(q, k=10, mode=mode, algorithm=algo)
            got = tier.search(q, k=10, mode=mode, algorithm=algo)
            assert [d for d, _ in got] == [d for d, _ in want], (q, mode, algo)
            for (d1, s1), (d2, s2) in zip(got, want):
                assert s1 == pytest.approx(s2, rel=1e-12)
    finally:
        tier.shutdown()


def test_sharded_rejects_wrong_chunk_count(sharded_setup, ray_session):
    with pytest.raises(ValueError, match="segment_doc_chunks"):
        InvertedIndex(sharded_setup, shard=(0, 8))
    with pytest.raises(ValueError, match="power-of-two"):
        InvertedIndex(sharded_setup, shard=(0, 3))


def test_sharded_search_after_matches_single_process(
    sharded_setup, ray_session
):
    """Deep paging through the doc-sharded tier: page 2 via the cursor
    equals the single-process page 2 (ids and scores)."""
    single = InvertedIndex(sharded_setup, preload=True)
    tier = ShardedIndex(sharded_setup, N_SHARDS)
    try:
        for q, mode, algo in [
            ("w0 w1", "or", "auto"),
            ("w0 w1", "and", "auto"),
        ]:
            p1 = single.search(q, k=10, mode=mode)
            cur = (p1[-1][1], p1[-1][0])
            want = single.search(q, k=10, mode=mode, after=cur)
            got = tier.search(q, k=10, mode=mode, after=cur)
            assert [d for d, _ in got] == [d for d, _ in want], (q, mode)
            for (_, s1), (_, s2) in zip(got, want):
                assert s1 == pytest.approx(s2, rel=1e-12)
    finally:
        tier.shutdown()
