"""Per-partition lineage: an interrupted pages build re-extracts only
the missing partitions (north-rule resume at partition granularity)."""

import glob
import os
import shutil

import pytest
import ray.data

from harvester_ray.corpus import write_corpus
from harvester_ray.index.query import InvertedIndex
from harvester_ray.pipelines.pages import build_pages_index
from harvester_ray.state.lineage import read_lineage
from harvester_ray.state.partitioned import partition_outputs, run_partitioned_stage


def test_run_partitioned_stage_resume(tmp_path):
    ins = []
    for i in range(3):
        p = str(tmp_path / f"in-{i}.txt")
        with open(p, "w") as f:
            f.write(f"data-{i}")
        ins.append(p)
    calls = []

    def fn(src, tmp):
        os.makedirs(tmp, exist_ok=True)
        with open(os.path.join(tmp, "out.parquet"), "wb") as f:
            import pyarrow as pa
            import pyarrow.parquet as pq

            pq.write_table(pa.table({"src": [src]}), f)
        calls.append(src)

    out = str(tmp_path / "stage")
    recs = run_partitioned_stage("s", ins, out, fn, max_concurrent=1)
    assert len(calls) == 3 and not any(r["skipped"] for r in recs)
    assert len(partition_outputs(out)) == 3

    # full re-run: all partitions skip
    recs = run_partitioned_stage("s", ins, out, fn, max_concurrent=1)
    assert len(calls) == 3 and all(r["skipped"] for r in recs)

    # one partition lost -> only it re-runs
    shutil.rmtree(partition_outputs(out)[1])
    recs = run_partitioned_stage("s", ins, out, fn, max_concurrent=1)
    assert len(calls) == 4
    assert sum(1 for r in recs if not r["skipped"]) == 1

    # one input changed -> only it re-runs
    with open(ins[0], "w") as f:
        f.write("data-0-changed!")
    recs = run_partitioned_stage("s", ins, out, fn, max_concurrent=1)
    assert len(calls) == 5
    assert sum(1 for r in recs if not r["skipped"]) == 1


def test_pages_build_partition_resume(tmp_path, ray_session):
    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, 300, n_files=4)
    out = str(tmp_path / "out")
    paths = build_pages_index(corpus, out)
    idx1 = InvertedIndex(paths.root, preload=True)
    top1 = idx1.search("w0 w1", k=10)

    parts = partition_outputs(os.path.join(out, "extracted"))
    assert len(parts) == 4
    keys_before = {p: read_lineage(p)["key"] for p in parts}

    # interrupted: one extraction partition lost -> only it re-runs,
    # final index identical
    shutil.rmtree(parts[2])
    paths = build_pages_index(corpus, out)
    for p in parts:
        assert read_lineage(p)["key"] == keys_before[p]
    idx2 = InvertedIndex(paths.root, preload=True)
    assert idx2.search("w0 w1", k=10) == top1
    assert set(idx2.dictionary) == set(idx1.dictionary)


def test_stale_crash_tmp_not_listed_as_output(tmp_path):
    """A crash mid-write leaves 'part-<key>.tmp-<deadpid>'; it must not
    be globbed as a completed partition, and a resumed run cleans it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "in-0.txt")
    with open(src, "w") as f:
        f.write("data")

    def fn(path, tmp):
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(pa.table({"src": [path]}), os.path.join(tmp, "o.parquet"))

    out = str(tmp_path / "stage")
    run_partitioned_stage("s", [src], out, fn, max_concurrent=1)
    (done,) = partition_outputs(out)

    # simulate a crashed writer from a dead pid
    stale = f"{done}.tmp-4242"
    os.makedirs(stale)
    pq.write_table(pa.table({"src": ["PARTIAL"]}), os.path.join(stale, "o.parquet"))

    assert partition_outputs(out) == [done]  # stale tmp excluded
    run_partitioned_stage("s", [src], out, fn, max_concurrent=1)
    assert not os.path.exists(stale)  # resumed run cleaned it
    assert partition_outputs(out) == [done]
