"""Tombstone deletions + sources interop tests."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from harvester_ray.index.maintenance import (
    clear_tombstones,
    compact,
    delete_docs,
    delete_where,
    load_tombstones,
)
from harvester_ray.index.oracle import OracleIndex
from harvester_ray.index.query import InvertedIndex

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _fresh_index(tmp_path):
    from harvester_ray.index.build import build_index

    docs = ray.data.read_parquet(DOCS, columns=["doc_id", "text"])
    return build_index(docs, str(tmp_path / "idx"))


def test_tombstone_filtering_all_paths(tmp_path, ray_session):
    paths = _fresh_index(tmp_path)
    idx = InvertedIndex(paths.root, preload=True)
    top = idx.search("scan join", k=5, mode="or")
    dead = [top[0][0], top[2][0]]
    assert delete_docs(paths.root, dead) == 2
    assert delete_docs(paths.root, dead) == 2  # idempotent rewrite
    assert set(load_tombstones(paths.root)) == set(dead)

    idx2 = InvertedIndex(paths.root, preload=True)
    for mode in ("or", "and"):
        got = idx2.search("scan join", k=10, mode=mode)
        assert all(d not in dead for d, _ in got), mode
    wand = idx2.search("scan join", k=10, mode="or", algorithm="wand")
    exh = idx2.search("scan join", k=10, mode="or", algorithm="exhaustive")
    assert [d for d, _ in wand] == [d for d, _ in exh]
    # survivors keep their relative order and scores
    before = [(d, s) for d, s in idx.search("scan join", k=12) if d not in dead]
    after = idx2.search("scan join", k=10)
    assert [d for d, _ in after] == [d for d, _ in before][:10]
    for (d1, s1), (d2, s2) in zip(after, before):
        assert s1 == pytest.approx(s2)


def test_delete_where_and_compact(tmp_path, ray_session):
    paths = _fresh_index(tmp_path)
    docs = ray.data.read_parquet(DOCS, columns=["doc_id", "text"])
    import pyarrow.compute as pc

    n = delete_where(
        paths.root, docs, lambda t: pc.match_substring(t["text"], "dup")
    )
    assert n > 0
    idx = InvertedIndex(paths.root, preload=True)
    assert idx.search("dup", k=10, mode="or") == []  # every 'dup' doc gone

    # compaction: rebuild without the deleted docs; stats recomputed
    docs = ray.data.read_parquet(DOCS, columns=["doc_id", "text"])
    cpaths = compact(docs, paths.root)
    cidx = InvertedIndex(cpaths.root, preload=True)
    assert "dup" not in cidx.dictionary
    assert cidx.n_docs == idx.n_docs - n
    # compacted index agrees with an oracle over the filtered corpus
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{DOCS}' WHERE NOT contains(text, 'dup')"
    ).fetchall()
    oracle = OracleIndex(rows)
    for q, m in (("scan join", "or"), ("merge sort", "and")):
        got = cidx.search(q, k=10, mode=m)
        want = oracle.search(q, k=10, mode=m)
        assert [d for d, _ in got] == [d for d, _ in want], (q, m)

    clear_tombstones(paths.root)
    assert len(load_tombstones(paths.root)) == 0


def test_jsonl_pages_roundtrip(tmp_path, ray_session):
    from harvester_ray.corpus import generate_pages
    from harvester_ray.sources import read_jsonl_pages, write_jsonl_pages

    pages, _ = generate_pages(60)
    ds = ray.data.from_arrow(pages)
    out = str(tmp_path / "jsonl")
    write_jsonl_pages(ds, out)
    back = read_jsonl_pages(out).to_pandas().sort_values("url").reset_index(drop=True)
    orig = pages.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(back["url"]) == list(orig["url"])
    assert list(back["html"]) == list(orig["html"])
    assert list(back["lang"]) == list(orig["lang"])
    assert [str(a) for a in back["warc_ts"]] == [str(a) for a in orig["warc_ts"]]


def test_verify_index_healthy(built_index):
    from harvester_ray.index.maintenance import verify_index

    report = verify_index(built_index.root)
    assert report["ok"], report["violations"]
    assert report["terms_checked"] > 0
    assert report["sources"] == 1


def test_verify_index_detects_corruption(tmp_path, ray_session):
    """Corrupt one dictionary df -> fsck reports it and exits unhealthy."""
    import glob
    import shutil

    import pyarrow.parquet as pq
    import ray.data

    from harvester_ray.index.build import build_index
    from harvester_ray.index.maintenance import verify_index

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )
    paths = build_index(docs, str(tmp_path / "idx"))
    f = sorted(glob.glob(str(tmp_path / "idx" / "dictionary" / "*.parquet")))[0]
    t = pq.read_table(f)
    import pyarrow as pa
    import pyarrow.compute as pc

    df_col = pc.add(t["df"], 1)
    t = t.set_column(t.column_names.index("df"), "df", df_col)
    pq.write_table(t, f)
    report = verify_index(str(tmp_path / "idx"))
    assert not report["ok"]
    assert any("df" in v for v in report["violations"])


def test_verify_index_detects_stats_corruption(tmp_path, ray_session):
    """Corrupt stats.json avgdl (a BM25 scoring input) -> fsck fails."""
    import json

    import ray.data

    from harvester_ray.index.build import build_index
    from harvester_ray.index.maintenance import verify_index

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )
    paths = build_index(docs, str(tmp_path / "idx"))
    with open(paths.stats) as f:
        st = json.load(f)
    st["avgdl"] = st["avgdl"] * 2
    with open(paths.stats, "w") as f:
        json.dump(st, f)
    report = verify_index(str(tmp_path / "idx"))
    assert not report["ok"]
    assert any("avgdl" in v for v in report["violations"])


def test_as_of_time_travel(ray_session):
    """as_of=1 on the upserted fixture reproduces the pristine index
    bit-for-bit (ranks AND scores); as_of=n_sources equals the default
    full view; out-of-range as_of raises."""
    import pytest

    from harvester_ray.index.query import InvertedIndex
    from harvester_ray.pipelines.fulltext import (
        index_for,
        index_for_atomic,
        queries_for_mode,
    )

    sf = "/root/testdata/sf0.001"
    atomic = index_for_atomic(sf)
    pristine = InvertedIndex(index_for(sf).root)
    snap1 = InvertedIndex(atomic.root, as_of=1)
    full_default = InvertedIndex(atomic.root)
    n_src = full_default.n_sources
    assert n_src >= 2
    snap_full = InvertedIndex(atomic.root, as_of=n_src)
    for _, q in queries_for_mode("or"):
        want = pristine.search(q, k=10)
        assert snap1.search(q, k=10) == want
        assert snap_full.search(q, k=10) == full_default.search(q, k=10)
    # the upsert is visible at full view: at least one query differs
    assert any(
        snap_full.search(q, k=10) != pristine.search(q, k=10)
        or full_default.stats["n_docs"] != pristine.stats["n_docs"]
        for _, q in queries_for_mode("or")
    )
    # snapshot stats are the stats at that commit
    assert snap1.stats["n_docs"] == pristine.stats["n_docs"]
    with pytest.raises(ValueError):
        InvertedIndex(atomic.root, as_of=0)
    with pytest.raises(ValueError):
        InvertedIndex(atomic.root, as_of=n_src + 2)


def test_as_of_after_delete_only_commit(ray_session, tmp_path):
    """A delete-only commit after the last source add is addressable:
    as_of=n_sources still shows the pre-delete view (the tombstone is
    stamped seq=n and excluded), while as_of=n_sources+1 equals the
    live view including it."""
    import shutil

    from harvester_ray.index.maintenance import delete_docs
    from harvester_ray.index.query import InvertedIndex
    from harvester_ray.pipelines.fulltext import (
        index_for_atomic,
        queries_for_mode,
    )

    sf = "/root/testdata/sf0.001"
    root = str(tmp_path / "idx")
    shutil.copytree(index_for_atomic(sf).root, root)
    pre = InvertedIndex(root)
    n_src = pre.n_sources
    # tombstone the current top doc of the first OR query (a live doc)
    _, q0 = queries_for_mode("or")[0]
    victim = pre.search(q0, k=1)[0][0]
    assert delete_docs(root, [victim]) == 1

    live = InvertedIndex(root)
    snap_pre = InvertedIndex(root, as_of=n_src)
    snap_live = InvertedIndex(root, as_of=n_src + 1)
    assert victim not in {d for d, _ in live.search(q0, k=10)}
    assert snap_pre.search(q0, k=10) == pre.search(q0, k=10)
    assert victim in {d for d, _ in snap_pre.search(q0, k=10)}
    for _, q in queries_for_mode("or"):
        assert snap_live.search(q, k=10) == live.search(q, k=10)
