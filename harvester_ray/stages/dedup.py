"""Corpus-level deduplication operators.

Extends the reference's only corpus dedup (md5-keyed exact dedup of
downloaded objects, harvester/image_harvest.py:238-257) to the family a
training-data pipeline needs:

- exact dedup          pipelines/relational.dedup_exact (md5 groupby)
- MinHash + LSH        shingle → minhash signature → band → bucket
                       groupby → candidate pairs (this module)
- SimHash              64-bit weighted-bit fingerprints
- n-gram Jaccard       exact verification of LSH candidate pairs

Scale design: the only shuffle is the (band_id, band_hash) groupby of
band rows — b rows per doc, pre-hashed to fixed-size keys, no skew
(hash keys are uniform). Pair verification happens inside the bucket
groups using the signatures themselves (no second pass over text); the
exact-Jaccard verifier pulls shingle sets only for the (small) verified
candidate set.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from harvester_ray.functions.text import tokenize

NUM_PERMS = 64
NUM_BANDS = 16          # 16 bands x 4 rows
ROWS_PER_BAND = NUM_PERMS // NUM_BANDS
SHINGLE_K = 3
_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, NUM_PERMS, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, NUM_PERMS, dtype=np.uint64)
    return a, b


def shingle_hashes(text: str, k: int = SHINGLE_K) -> np.ndarray:
    """k-token shingles -> uint64 hashes (blake2b-8 of the joined text)."""
    toks = tokenize(text)
    if len(toks) < k:
        joined = [" ".join(toks)] if toks else []
    else:
        joined = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    out = np.empty(len(joined), dtype=np.uint64)
    for i, s in enumerate(joined):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"
        )
    return np.unique(out)


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*h + b) mod 2^61-1 universal hashing, min over shingles.
    Vectorized (n_shingles x NUM_PERMS) product per doc."""
    if len(sh) == 0:
        return np.full(NUM_PERMS, np.iinfo(np.uint64).max, dtype=np.uint64)
    # modmul in python ints is exact; keep vectorized with uint64 wrap-around
    # (wrap-around is fine for hashing purposes: it is deterministic)
    prod = sh[:, None] * a[None, :] + b[None, :]
    return (prod % _MERSENNE).min(axis=0)


class MinHasher:
    """Actor-pool stage: permutation params built once per actor."""

    def __init__(self):
        self.a, self.b = _perm_params()

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, bands, hashes = [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            sig = minhash_signature(shingle_hashes(text or ""), self.a, self.b)
            for band in range(NUM_BANDS):
                chunk = sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
                h = int.from_bytes(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "big"
                ) - (1 << 63)
                doc_ids.append(doc_id)
                bands.append(band)
                hashes.append(h)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band_id": pa.array(bands, pa.int32()),
                "band_hash": pa.array(hashes, pa.int64()),
            }
        )


class SignatureMinHasher(MinHasher):
    """Variant that also emits the full signature (for in-bucket
    similarity estimation)."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        doc_ids, bands, hashes, sigs = [], [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            sig = minhash_signature(shingle_hashes(text or ""), self.a, self.b)
            sig_bytes = sig.tobytes()
            for band in range(NUM_BANDS):
                chunk = sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
                h = int.from_bytes(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "big"
                ) - (1 << 63)
                doc_ids.append(doc_id)
                bands.append(band)
                hashes.append(h)
                sigs.append(sig_bytes)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band_id": pa.array(bands, pa.int32()),
                "band_hash": pa.array(hashes, pa.int64()),
                "signature": pa.array(sigs, pa.binary()),
            }
        )


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs within one LSH bucket, similarity estimated from
    the minhash signatures (fraction of agreeing permutations)."""
    if len(g) < 2:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype=np.int64),
             "doc_b": pd.Series([], dtype=np.int64),
             "est_jaccard": pd.Series([], dtype=np.float64)}
        )
    g = g.sort_values("doc_id", kind="stable").drop_duplicates("doc_id")
    ids = g["doc_id"].to_numpy(np.int64)
    sigs = np.stack(
        [np.frombuffer(s, dtype=np.uint64) for s in g["signature"]]
    )
    rows_a, rows_b, est = [], [], []
    for i in range(len(ids)):
        eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
        for j_off, e in enumerate(eq):
            rows_a.append(ids[i])
            rows_b.append(ids[i + 1 + j_off])
            est.append(round(float(e), 6))
    return pd.DataFrame(
        {"doc_a": np.array(rows_a, np.int64),
         "doc_b": np.array(rows_b, np.int64),
         "est_jaccard": np.array(est, np.float64)}
    )


def minhash_near_dup(
    sf_dir: str, threshold: float = 0.5
) -> "ray.data.Dataset":
    """MinHash-LSH near-duplicate candidate pairs:
    (doc_a, doc_b, est_jaccard) with doc_a < doc_b, est >= threshold.
    Pairs found in several bands are deduped by a final groupby."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    bands = docs.map_batches(
        SignatureMinHasher, batch_format="pyarrow", batch_size=1024, concurrency=2
    )
    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )
    pairs = pairs.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["est_jaccard"], threshold)),
        batch_format="pyarrow",
    )
    return (
        pairs.groupby(["doc_a", "doc_b"])
        .aggregate(ray.data.aggregate.Max("est_jaccard", alias_name="est_jaccard"))
    )


# -- SimHash -------------------------------------------------------------
class SimHasher:
    """64-bit SimHash over term frequencies (weighted bit votes)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        out_ids, out_hashes = [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            counts = Counter(tokenize(text or ""))
            votes = np.zeros(64, dtype=np.float64)
            shifts = np.arange(64, dtype=np.uint64)
            for term, tf in counts.items():
                h = np.uint64(int.from_bytes(
                    hashlib.blake2b(term.encode(), digest_size=8).digest(), "big"
                ))
                bits = ((h >> shifts) & np.uint64(1)).astype(np.float64)
                votes += tf * (2.0 * bits - 1.0)
            sim = 0
            for k in range(64):
                if votes[k] > 0:
                    sim |= 1 << k
            out_ids.append(doc_id)
            out_hashes.append(sim - (1 << 63))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "simhash": pa.array(out_hashes, pa.int64()),
            }
        )


def simhash_fingerprints(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, simhash) — near-dup docs land within small Hamming
    distance; bucketing by bit-bands would follow the MinHash pattern."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return docs.map_batches(
        SimHasher, batch_format="pyarrow", batch_size=1024, concurrency=2
    )


# -- exact n-gram Jaccard verification ------------------------------------
def ngram_jaccard_dups(
    sf_dir: str, threshold: float = 0.5
) -> pd.DataFrame:
    """Exact n-gram Jaccard over the LSH candidate pairs:
    (doc_a, doc_b, jaccard). The candidate set is LSH-pruned and small
    relative to the corpus, so exact verification pulls only candidate
    docs' shingle sets (broadcast-scale), never all pairs."""
    cands = minhash_near_dup(sf_dir, threshold=0.0).to_pandas()
    if not len(cands):
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype=np.int64),
             "doc_b": pd.Series([], dtype=np.int64),
             "jaccard": pd.Series([], dtype=np.float64)}
        )
    need = set(cands["doc_a"]) | set(cands["doc_b"])
    need_ref = ray.put(np.fromiter(need, dtype=np.int64))

    def collect(t: pa.Table) -> pa.Table:
        mask = np.isin(
            t["doc_id"].to_numpy(zero_copy_only=False), ray.get(need_ref)
        )
        return t.filter(pa.array(mask))

    docs = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        .map_batches(collect, batch_format="pyarrow")
        .to_pandas()
    )
    sets = {
        int(d): set(shingle_hashes(t or "").tolist())
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    rows = []
    for a, b_ in zip(cands["doc_a"], cands["doc_b"]):
        sa, sb = sets[int(a)], sets[int(b_)]
        union = len(sa | sb)
        j = (len(sa & sb) / union) if union else 1.0
        if j >= threshold:
            rows.append((int(a), int(b_), round(j, 6)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"]).astype(
        {"doc_a": np.int64, "doc_b": np.int64, "jaccard": np.float64}
    )
