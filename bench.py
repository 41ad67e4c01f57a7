"""Benchmark harness (driver contract).

Headline: the full inverted-index build (tokenize → SPIMI → dictionary
→ salted term groupby → varint/block-max segments) over a corpus
replicated from ``$GRAFT_SF_DIR/documents.parquet`` to ``BENCH_DOCS``
documents, plus warm BM25 top-10 latency over the reference query set.

Prints ONE JSON line:
  {"metric": "...", "value": build_sec, "unit": "sec",
   "queries": {...per-pipeline secs...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ..., "n_docs": ...}

``--scaling``: runs the same job in fresh processes at num_cpus=8 and
num_cpus=32 on the same input (sandbox proxy for N vs 4N nodes) and
prints both throughputs + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("BENCH_DOCS", "600000"))


def _scratch_root() -> str:
    """tmpfs when available: bench numbers should measure compute and
    shuffle, not this VM's (noisy, shared) disk."""
    shm = "/dev/shm"
    try:
        if os.path.isdir(shm):
            st = os.statvfs(shm)
            if st.f_bavail * st.f_frsize > 20 * 1024**3:
                return os.path.join(shm, "harvester_ray_bench")
    except OSError:
        pass
    return "/tmp/harvester_ray_bench"


SCRATCH = _scratch_root()


def _replicated_corpus(sf_dir: str, target_docs: int) -> str:
    """Replicate documents.parquet to ~target_docs rows with distinct
    doc_ids (deterministic), cached on disk across bench runs."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "documents.parquet")
    base = pq.read_table(src, columns=["doc_id", "text"])
    factor = max(1, target_docs // len(base))
    out_dir = os.path.join(
        SCRATCH, f"corpus_{os.path.basename(os.path.abspath(sf_dir))}_{factor}x"
    )
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    # 32 files so every CPU has read parallelism at both bench levels
    n_files = 32
    per_file = max(1, factor // n_files)
    k = 0
    for fi in range(n_files):
        parts = []
        for _ in range(per_file):
            shifted = pc.add(base["doc_id"], pa.scalar((k + 1) * 10_000_000, pa.int64()))
            parts.append(pa.table({"doc_id": shifted, "text": base["text"]}))
            k += 1
        pq.write_table(
            pa.concat_tables(parts), os.path.join(out_dir, f"part-{fi:05d}.parquet")
        )
    with open(marker, "w") as f:
        f.write(str(k * len(base)))
    return out_dir


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data

    from harvester_ray.config import IndexConfig
    from harvester_ray.index.build import build_index
    from harvester_ray.index.query import InvertedIndex
    from harvester_ray.pipelines.fulltext import QUERY_SET

    corpus_dir = _replicated_corpus(SF_DIR, BENCH_DOCS)
    # warm-up (untimed): OS page cache + the Ray worker pool, so the
    # timed section measures steady-state compute+shuffle, not cold
    # worker spawn/imports (a long-lived cluster is always warm)
    ray.data.read_parquet(corpus_dir).count()

    @ray.remote(num_cpus=1)
    def _warm(i: int) -> int:
        import numpy  # noqa: F401
        import pyarrow  # noqa: F401

        import harvester_ray.index.build  # noqa: F401

        return i

    ray.get([_warm.remote(i) for i in range(NUM_CPUS)])

    out_dir = os.path.join(SCRATCH, f"idx_{NUM_CPUS}_{os.getpid()}")
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = ray.data.read_parquet(corpus_dir)
    n_docs = docs.count()

    t0 = time.time()
    cfg = IndexConfig(salt_df_threshold=50_000, salt_buckets=16)
    paths = build_index(docs, out_dir, cfg, n_docs=n_docs)
    build_sec = time.time() - t0

    # warm query latency, preloaded segments (bench contract: warm index)
    t0 = time.time()
    idx = InvertedIndex(paths.root, preload=True)
    load_sec = time.time() - t0
    lat = []
    for _rep in range(3):
        for _qid, q, mode in QUERY_SET:
            t0 = time.time()
            idx.search(q, k=10, mode=mode)
            lat.append(time.time() - t0)
    lat.sort()
    p50 = statistics.median(lat)
    p95 = lat[int(0.95 * len(lat)) - 1]

    # a couple of secondary pipeline timings at the raw sf dir
    from harvester_ray.pipelines import relational

    t0 = time.time()
    relational.q1_pricing(SF_DIR).to_pandas()
    q1_sec = time.time() - t0
    t0 = time.time()
    relational.dedup_exact(SF_DIR).count()
    dedup_sec = time.time() - t0

    shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "metric": "index-build wall time (replicated corpus) + BM25 top-10 latency",
        "value": round(build_sec, 3),
        "unit": "sec",
        "queries": {
            "index_build": round(build_sec, 3),
            "index_load": round(load_sec, 3),
            "bm25_p50": round(p50, 6),
            "bm25_p95": round(p95, 6),
            "q1_pricing": round(q1_sec, 3),
            "dedup_exact": round(dedup_sec, 3),
        },
        "sf": os.path.basename(os.path.abspath(SF_DIR)),
        "num_cpus": NUM_CPUS,
        "n_docs": int(n_docs),
        "docs_per_sec": round(n_docs / build_sec, 1),
    }


def run_scaling() -> dict:
    """Same job, fresh processes, 8 vs 32 CPUs on the same input.
    Best of 2 runs per level: this sandbox VM has noisy neighbors and
    the min is the standard noise-robust wall-clock estimator."""

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def hardware_ceiling(lo: int, hi: int) -> float:
        """This VM does not deliver 32 independent cores (SMT +
        hypervisor throttling): measure the actual aggregate compute
        ratio between `hi` and `lo` busy processes — the ceiling any
        CPU-bound job can reach on this box."""
        import multiprocessing as mp

        def agg(procs: int) -> float:
            with mp.Pool(procs) as p:
                return sum(p.map(_spin, [0.0] * procs))

        agg(lo)  # warm the pool machinery
        return (agg(hi) / agg(lo)) / (hi / lo)

    lo, hi = 8, 32
    ceiling = hardware_ceiling(lo, hi)
    # interleaved (hi, lo, hi, lo) so both levels sample the same
    # hypervisor-credit states; min per level = noise-robust estimate
    runs = [one(hi), one(lo), one(hi), one(lo)]
    r_hi = min((r for r in runs if r["num_cpus"] == hi), key=lambda r: r["value"])
    r_lo = min((r for r in runs if r["num_cpus"] == lo), key=lambda r: r["value"])
    tp_lo = r_lo["docs_per_sec"]
    tp_hi = r_hi["docs_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    return {
        "metric": "scaling efficiency (docs/sec at 8 vs 32 CPUs, fresh processes)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "docs_per_sec_8": tp_lo,
        "docs_per_sec_32": tp_hi,
        "n_docs": r_lo["n_docs"],
        "scaling_efficiency": round(eff, 3),
        # what a perfectly-scaling job could reach on THIS machine
        "hardware_ceiling_efficiency": round(ceiling, 3),
        "normalized_efficiency": round(min(1.0, eff / ceiling), 3),
    }


def _spin(_: float) -> int:
    import time as _t

    t0 = _t.time()
    x = 0
    while _t.time() - t0 < 2.0:
        x += 1
    return x


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        result = run_bench()
        print(json.dumps(result))
        import ray

        ray.shutdown()
