"""Distributed prefix-scan rank path (stages/scan.py) and its two
past-guard consumers: the scan twin must be row-identical to the
driver-cumsum broadcast path it replaces."""

import numpy as np
import pyarrow as pa
import pytest

from tests.conftest import SF_SMOKE


def _offsets_table(ds):
    df = ds.to_pandas()
    return {tuple(r[:-1]): r[-1] for r in df.itertuples(index=False)}


def test_keyed_prefix_offsets_matches_numpy(ray_session):
    import ray.data

    from harvester_ray.stages.scan import keyed_prefix_offsets

    rng = np.random.RandomState(7)
    keys = rng.permutation(np.arange(500, dtype=np.int64))
    weights = rng.randint(1, 20, size=500).astype(np.int64)
    counts = ray.data.from_arrow(
        pa.table({"k": keys, "w": weights})
    ).repartition(13)

    for descending in (False, True):
        got = (
            keyed_prefix_offsets(
                counts, "k", "w", descending=descending
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        order = np.argsort(-keys if descending else keys)
        excl = np.zeros(500, dtype=np.int64)
        excl[order] = np.concatenate(
            ([0], np.cumsum(weights[order])[:-1])
        )
        assert (got["k"].to_numpy() == np.arange(500)).all()
        want = excl[np.argsort(keys)]
        assert (got["offset"].to_numpy() == want).all(), descending


def test_keyed_prefix_offsets_string_keys(ray_session):
    import ray.data

    from harvester_ray.stages.scan import keyed_prefix_offsets

    keys = [f"h{i:03d}" for i in range(40)]
    counts = ray.data.from_arrow(
        pa.table(
            {"k": keys[::-1], "w": np.ones(40, np.int64)}
        )
    ).repartition(5)
    got = (
        keyed_prefix_offsets(counts, "k", "w")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # weight-1 prefix sum over sorted string keys == dense rank
    assert list(got["offset"]) == list(range(40))


def test_export_sorted_scan_twin_identical(ray_session):
    from harvester_ray.pipelines import fulltext

    base = (
        fulltext.export_sorted(SF_SMOKE)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    old = fulltext._EXPORT_OFFSET_KEYS_GUARD
    fulltext._EXPORT_OFFSET_KEYS_GUARD = 0
    try:
        scan = (
            fulltext.export_sorted(SF_SMOKE)
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
    finally:
        fulltext._EXPORT_OFFSET_KEYS_GUARD = old
    assert len(base) > 0
    assert base[["rank", "doc_id", "source", "n_chars"]].equals(
        scan[["rank", "doc_id", "source", "n_chars"]]
    )


def test_crawl_frontier_scan_twin_identical(ray_session):
    from harvester_ray.pipelines import weburls

    base = (
        weburls.crawl_frontier(SF_SMOKE)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    old = weburls._FRONTIER_HOSTS_GUARD
    weburls._FRONTIER_HOSTS_GUARD = 0
    try:
        scan = (
            weburls.crawl_frontier(SF_SMOKE)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    finally:
        weburls._FRONTIER_HOSTS_GUARD = old
    assert len(base) > 0
    assert base[["doc_id", "host", "wave", "slot"]].equals(
        scan[["doc_id", "host", "wave", "slot"]]
    )
