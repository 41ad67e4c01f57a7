"""Golden-value tests for the dedup operator family: every vectorized
hot path is checked against an independent pure-Python oracle, and the
distributed Jaccard verifier against brute force on a crafted corpus
with known duplicates (the VERDICT round-1 ask: hard checks for the
rows-only driver entries)."""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from harvester_ray.functions.text import tokenize
from harvester_ray.stages import dedup
from harvester_ray.stages.dedup import (
    _band_keys,
    _bucket_pairs,
    _perm_params,
    _signatures_batch,
    shingle_hashes,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",   # near dup of 0
    "the quick brown fox jumps over the lazy dog",   # exact dup of 0
    "completely different content about ray data pipelines",
    "",                                              # empty
    "tiny doc",                                      # < k tokens
]


def _py_token_hash(tok: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"
    )


def _py_shingles(text: str, k: int = dedup.SHINGLE_K) -> set[int]:
    """Independent oracle: explicit per-window polynomial loop."""
    toks = tokenize(text)
    P = int(dedup._POLY)
    M = 1 << 64
    hs = [_py_token_hash(t) for t in toks]
    out = set()
    if len(hs) >= k:
        for i in range(len(hs) - k + 1):
            h = 0
            for j in range(k):
                h = (h * P + hs[i + j]) % M
            out.add(h)
    elif hs:
        h = 0
        for x in hs:
            h = (h * P + x) % M
        out.add(h)
    return out


def test_shingles_match_python_oracle():
    for text in TEXTS:
        got = set(shingle_hashes(text).tolist())
        assert got == _py_shingles(text), text[:30]


def test_signatures_match_python_oracle():
    a, b = _perm_params()
    sigs = _signatures_batch(pa.array(TEXTS, pa.string()), len(TEXTS), a, b)
    M = int(dedup._MERSENNE)
    for i, text in enumerate(TEXTS):
        sh = _py_shingles(text)
        if not sh:
            assert (sigs[i] == np.iinfo(np.uint64).max).all()
            continue
        for p in range(0, dedup.NUM_PERMS, 17):  # spot-check perms
            want = min(
                (h * int(a[p]) + int(b[p])) % (1 << 64) % M for h in sh
            )
            # vectorized path wraps at 2^64 before the mersenne mod —
            # replicate exactly
            want = min(((h * int(a[p]) + int(b[p])) % (1 << 64)) % M for h in sh)
            assert int(sigs[i][p]) == want, (i, p)
    # identical docs -> identical signatures; near dups mostly agree
    assert (sigs[0] == sigs[2]).all()
    frac = (sigs[0] == sigs[1]).mean()
    assert 0.3 < frac <= 1.0


def test_band_keys_shape_and_determinism():
    a, b = _perm_params()
    sigs = _signatures_batch(pa.array(TEXTS, pa.string()), len(TEXTS), a, b)
    k1 = _band_keys(sigs)
    k2 = _band_keys(sigs.copy())
    assert k1.shape == (len(TEXTS), dedup.NUM_BANDS)
    assert (k1 == k2).all()
    assert (k1[0] == k1[2]).all()  # exact dups share every band


def test_bucket_pairs_identical_signatures_linear():
    """10^3 identical docs in one bucket must produce |bucket|-1
    representative pairs, not O(n^2)."""
    import pandas as pd

    sig = np.arange(dedup.NUM_PERMS, dtype=np.uint64).tobytes()
    n = 1000
    g = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "signature": [sig] * n,
        }
    )
    out = _bucket_pairs(g)
    assert len(out) == n - 1
    assert (out["doc_a"] == 0).all()  # min-doc_id representative
    assert (out["est_jaccard"] == 1.0).all()


def test_bucket_pairs_cap_logged(monkeypatch, caplog):
    import logging

    import pandas as pd

    monkeypatch.setattr(dedup, "MAX_BUCKET_REPS", 10)
    rng = np.random.default_rng(7)
    n = 25
    g = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "signature": [
                rng.integers(0, 2**63, dedup.NUM_PERMS, dtype=np.uint64).tobytes()
                for _ in range(n)
            ],
        }
    )
    with caplog.at_level(logging.WARNING, logger="harvester_ray.stages.dedup"):
        out = _bucket_pairs(g)
    assert len(out) == 10 * 9 // 2  # capped pairwise
    assert any("capped" in r.message for r in caplog.records)


@pytest.fixture()
def dup_corpus(tmp_path):
    """documents.parquet with engineered exact + near duplicates."""
    rng = np.random.default_rng(3)
    vocab = [f"tok{i}" for i in range(200)]
    texts, ids = [], []
    base_docs = []
    for i in range(40):
        words = [vocab[j] for j in rng.integers(0, len(vocab), 30)]
        base_docs.append(words)
        ids.append(i)
        texts.append(" ".join(words))
    # exact dup of doc 0 and a 1-token-changed near dup of doc 1
    ids.append(100)
    texts.append(texts[0])
    near = list(base_docs[1])
    near[5] = "CHANGED"
    ids.append(101)
    texts.append(" ".join(near))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path), ids, texts


def _brute_jaccard_pairs(ids, texts, threshold):
    out = {}
    sets = {i: _py_shingles(t) for i, t in zip(ids, texts)}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            sa, sb = sets[a], sets[b]
            union = len(sa | sb)
            j = (len(sa & sb) / union) if union else 1.0
            if j >= threshold:
                out[(min(a, b), max(a, b))] = round(j, 6)
    return out


def test_minhash_and_jaccard_end_to_end(dup_corpus, ray_session):
    sf_dir, ids, texts = dup_corpus
    pairs = dedup.minhash_near_dup(sf_dir, threshold=0.5).to_pandas()
    found = {
        (min(a, b), max(a, b)) for a, b in zip(pairs["doc_a"], pairs["doc_b"])
    }
    assert (0, 100) in found  # exact dup always caught
    est = dict(
        (((min(a, b), max(a, b))), e)
        for a, b, e in zip(pairs["doc_a"], pairs["doc_b"], pairs["est_jaccard"])
    )
    assert est[(0, 100)] == 1.0

    # distributed exact verification == brute force on the same corpus
    got = dedup.ngram_jaccard_dups(sf_dir, threshold=0.5).to_pandas()
    got_pairs = {
        (min(a, b), max(a, b)): j
        for a, b, j in zip(got["doc_a"], got["doc_b"], got["jaccard"])
    }
    want = _brute_jaccard_pairs(ids, texts, 0.5)
    # every verified pair must carry the exact brute-force jaccard
    for pair, j in got_pairs.items():
        assert pair in want and j == pytest.approx(want[pair], abs=1e-6), pair
    # the engineered dups are found
    assert (0, 100) in got_pairs and got_pairs[(0, 100)] == 1.0
    assert (1, 101) in got_pairs


def test_simhash_matches_python_oracle(ray_session):
    batch = pa.table(
        {
            "doc_id": pa.array(list(range(len(TEXTS))), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
        }
    )
    got = dedup.SimHasher()(batch)["simhash"].to_pylist()
    for i, text in enumerate(TEXTS):
        votes = np.zeros(64)
        from collections import Counter

        for term, tf in Counter(tokenize(text)).items():
            h = _py_token_hash(term)
            for k in range(64):
                votes[k] += tf * (1 if (h >> k) & 1 else -1)
        sim = 0
        for k in range(64):
            if votes[k] > 0:
                sim |= 1 << k
        assert got[i] == sim - (1 << 63), i
    # exact dups identical, near dups close in Hamming space
    h0, h1, h2 = got[0], got[1], got[2]
    assert h0 == h2
    assert bin((h0 ^ h1) & ((1 << 64) - 1)).count("1") <= 16


def test_simhash_near_dup_finds_pairs(dup_corpus, ray_session):
    sf_dir, ids, texts = dup_corpus
    pairs = dedup.simhash_near_dup(sf_dir, max_hamming=3).to_pandas()
    found = {
        (min(a, b), max(a, b)) for a, b in zip(pairs["doc_a"], pairs["doc_b"])
    }
    assert (0, 100) in found
    ham = {
        (min(a, b), max(a, b)): h
        for a, b, h in zip(pairs["doc_a"], pairs["doc_b"], pairs["hamming"])
    }
    assert ham[(0, 100)] == 0


# -- embedding-cosine near-dup --------------------------------------------
@pytest.fixture()
def emb_corpus(tmp_path):
    """embeddings.parquet with planted near-duplicate vector pairs:
    30 random base vectors, 10 of which get a lightly-noised twin
    (cosine >= ~0.99) — the regime the LSH path is built for."""
    rng = np.random.default_rng(7)
    dim = 32
    base = rng.standard_normal((30, dim))
    vecs, ids = [], []
    for i, v in enumerate(base):
        ids.append(i)
        vecs.append(v)
    for j in range(10):
        twin = base[j] + 0.02 * rng.standard_normal(dim)
        ids.append(100 + j)
        vecs.append(twin)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [v.astype(np.float32).tolist() for v in vecs],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    return str(tmp_path), ids, np.stack(vecs)


def _brute_cosine_pairs(ids, V, tau):
    n = np.linalg.norm(V, axis=1)
    S = (V @ V.T) / (n[:, None] * n[None, :])
    out = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            s = int(np.floor(S[x, y] * 1_000_000 + 0.5))
            if s >= int(round(tau * 1_000_000)):
                a, b = sorted((ids[x], ids[y]))
                out[(a, b)] = s
    return out


def test_embedding_cosine_dups_match_brute_force(emb_corpus, ray_session):
    sf_dir, ids, V = emb_corpus
    tau = 0.9
    got = dedup.embedding_cosine_dups(sf_dir, tau=tau).to_pandas()
    found = {
        (int(a), int(b)): int(s)
        for a, b, s in zip(got.vec_id_a, got.vec_id_b, got.sim_r6)
    }
    want = _brute_cosine_pairs(ids, V.astype(np.float32).astype(np.float64), tau)
    assert set(found) == set(want)
    for k in want:
        assert abs(found[k] - want[k]) <= 1  # last-ulp rounding slack


def test_embedding_lsh_recall_and_precision(emb_corpus, ray_session):
    """On genuinely near-dup pairs (cos >= 0.9) the multi-table LSH
    candidate stage must reach ~certain recall, and in-bucket exact
    verification makes precision 1.0 by construction."""
    sf_dir, ids, V = emb_corpus
    tau = 0.9
    exact = _brute_cosine_pairs(ids, V.astype(np.float32).astype(np.float64), tau)
    got = dedup.embedding_lsh_dups(sf_dir, tau=tau).to_pandas()
    found = {
        (int(a), int(b)): int(s)
        for a, b, s in zip(got.vec_id_a, got.vec_id_b, got.sim_r6)
    }
    assert set(found) <= set(exact)          # precision 1.0
    assert len(exact) >= 10                  # the planted twins qualify
    recall = len(set(found) & set(exact)) / len(exact)
    assert recall >= 0.95, f"recall {recall}: {set(exact) - set(found)}"


def test_embedding_lsh_subset_of_exact_on_testdata(ray_session):
    sf = "/root/testdata/sf0.001"
    exact = dedup.embedding_cosine_dups(sf).to_pandas()
    lsh = dedup.embedding_lsh_dups(sf).to_pandas()
    ex = set(zip(exact.vec_id_a.astype(int), exact.vec_id_b.astype(int)))
    ls = set(zip(lsh.vec_id_a.astype(int), lsh.vec_id_b.astype(int)))
    assert ls <= ex
