"""Similarity search over the embedding column.

- Brute-force cosine top-k (exact baseline, DuckDB-oracled):
  pipelines/relational.ann_cosine_topk — per-batch numpy matmul
  against a broadcast query vector.
- LSH-bucketed ANN (this module, the scale path): sign-random-
  projection buckets; the query probes its own bucket plus all
  Hamming-1 neighbors, so only ~(1+H)/2^H of the corpus is scanned.
  At 100 TB the bucket id becomes the parquet partition key and a
  probe is a predicate-pushdown read of ~17/256 partitions.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

LSH_BITS = 8
LSH_SEED = 42
ANN_QUERY_VEC_ID = 0
ANN_TOP_K = 20


def _hyperplanes(dim: int) -> np.ndarray:
    rng = np.random.default_rng(LSH_SEED)
    return rng.standard_normal((LSH_BITS, dim))


def _bucket_of(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (vecs @ planes.T) > 0
    return (bits * (1 << np.arange(LSH_BITS))).sum(axis=1).astype(np.int64)


class LshBucketer:
    """Actor-pool stage: hyperplanes drawn once per actor (seeded)."""

    def __init__(self, dim: int):
        self.planes = _hyperplanes(dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        E = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        return batch.append_column(
            "bucket", pa.array(_bucket_of(E, self.planes), pa.int64())
        )


def ann_lsh_topk(sf_dir: str, k: int = ANN_TOP_K) -> pd.DataFrame:
    """(rank, vec_id, sim) approximate top-k for the fixed query vector.
    Probes the query's bucket + Hamming-1 neighbors."""
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qtbl = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    qrow = qtbl.filter(pc.equal(qtbl["vec_id"], ANN_QUERY_VEC_ID))
    q = np.asarray(qrow["embedding"][0].as_py(), dtype=np.float64)
    dim = len(q)
    planes = _hyperplanes(dim)
    qb = int(_bucket_of(q[None, :], planes)[0])
    probe = {qb} | {qb ^ (1 << i) for i in range(LSH_BITS)}
    probe_ref = ray.put(np.fromiter(probe, dtype=np.int64))
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    def score_probed(t: pa.Table) -> pa.Table:
        mask = np.isin(
            t["bucket"].to_numpy(zero_copy_only=False), ray.get(probe_ref)
        )
        t = t.filter(pa.array(mask))
        if len(t) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "sim_r": pa.array([], pa.float64())}
            )
        E = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(E, axis=1)
        norms[norms == 0] = 1.0
        sims = (E @ ray.get(q_ref)) / norms
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "sim_r": pa.array(np.round(sims, 6), pa.float64()),
            }
        )

    top = (
        ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])
        .map_batches(
            LshBucketer,
            fn_constructor_args=(dim,),
            batch_format="pyarrow",
            concurrency=2,
        )
        .map_batches(score_probed, batch_format="pyarrow")
        .sort(["sim_r", "vec_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    top.insert(0, "rank", np.arange(1, len(top) + 1, dtype=np.int64))
    return top[["rank", "vec_id", "sim_r"]]
