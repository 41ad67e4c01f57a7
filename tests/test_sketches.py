"""Sketch operators: exactness of the verified outputs (the oracle
gate's job, replicated at sf0.001 by test_oracle_gate) plus the
properties the gate cannot see — estimator quality, merge invariance,
candidate-superset guarantee."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_hll_estimate_within_bound(ray_session):
    """m=256 registers over the test corpus land in the linear-counting
    regime; the estimate must sit within 15% of the exact distinct
    count (1.04/sqrt(256) = 6.5% standard error)."""
    import duckdb

    from harvester_ray.stages.sketches import hll_estimate, hll_registers

    est = hll_estimate(hll_registers(SF))
    exact = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.15, (est, exact)


def test_hll_registers_merge_invariant(ray_session):
    """Register tables merge by elementwise max: computing over two
    halves of the stream and max-merging equals the one-shot result."""
    import pyarrow.parquet as pq

    from harvester_ray.stages.sketches import HLL_M, _hll_parts

    x = pq.read_table(f"{SF}/events.parquet", columns=["user_id"])[
        "user_id"
    ].to_numpy()

    def regs(arr):
        r = np.zeros(HLL_M, np.int64)
        if len(arr):
            b, k = _hll_parts(arr.astype(np.int64))
            np.maximum.at(r, b, k)
        return r

    whole = regs(x)
    merged = np.maximum(regs(x[: len(x) // 2]), regs(x[len(x) // 2 :]))
    assert (whole == merged).all()


def test_hll_grouped_matches_per_group_filter(ray_session):
    """The grouped sketch equals hll_registers run on each group's
    events in isolation (per-group registers are independent), and
    each per-group estimate sits within the single-key error bound of
    the exact per-group distinct count."""
    import duckdb

    from harvester_ray.stages.sketches import (
        hll_estimate,
        hll_registers_by_group,
    )

    t = pa.Table.from_pylist(hll_registers_by_group(SF).take_all())
    groups = set(t["event_type"].to_pylist())
    assert len(groups) > 1
    for g in sorted(groups):
        mask = pa.compute.equal(t["event_type"], g)
        sub = t.filter(mask).select(["bucket", "rank"])
        est = hll_estimate(sub)
        exact = duckdb.sql(
            f"""SELECT count(DISTINCT user_id) FROM '{SF}/events.parquet'
            WHERE event_type = '{g}'"""
        ).fetchone()[0]
        assert abs(est - exact) / exact < 0.20, (g, est, exact)


def test_heavy_hitters_candidate_superset(ray_session):
    """Pigeonhole: every term at or above the global threshold must
    appear in the phase-1 candidate union no matter how the corpus is
    batched (checked by brute force on the raw token stream)."""
    import duckdb

    from harvester_ray.stages.sketches import HH_D, heavy_hitters

    out = heavy_hitters(SF)
    got = dict(zip(out["term"].to_pylist(), out["n"].to_pylist()))
    rows = duckdb.sql(
        f"""WITH toks AS (SELECT unnest(regexp_extract_all(lower(text),
            '[a-z0-9]+')) AS term FROM '{SF}/documents.parquet'),
        tot AS (SELECT count(*) AS n FROM toks)
        SELECT term, count(*) AS n FROM toks GROUP BY term
        HAVING count(*) >= ((SELECT n FROM tot) + {HH_D - 1}) // {HH_D}"""
    ).fetchall()
    assert got == {t: n for t, n in rows}
    assert len(got) > 0


def test_cms_never_underestimates_and_is_tight_for_heavy_keys(ray_session):
    """CMS point estimates >= exact counts for EVERY observed key;
    for the heaviest key the estimate is within eps*total of exact
    (eps = e/W at 4 rows => far tighter than the observed corpus)."""
    import collections

    import pyarrow.parquet as pq

    from harvester_ray.stages.sketches import cms_estimate, cms_registers

    sf = "/root/testdata/sf0.001"
    regs = cms_registers(sf).to_arrow_refs()
    import ray as _ray

    regs = pa.concat_tables([_ray.get(r) for r in regs])
    users = pq.read_table(sf + "/events.parquet", columns=["user_id"])[
        "user_id"
    ].to_pylist()
    exact = collections.Counter(users)
    total = sum(exact.values())
    for k, n in exact.items():
        est = cms_estimate(regs, int(k))
        assert est >= n, (k, est, n)
    heavy, n_heavy = exact.most_common(1)[0]
    est = cms_estimate(regs, int(heavy))
    assert est - n_heavy <= (3 * total) // 512  # ~e/W * total


def test_cms_registers_merge_invariant(ray_session):
    """Register tables from different batch splits merge by SUM to the
    same table (the mergeable-sketch contract)."""
    import numpy as np

    from harvester_ray.stages.sketches import CMS_D, CMS_W, _cms_bucket

    rng_keys = np.arange(1, 5001, dtype=np.int64) * 17 % 997

    def build(keys: np.ndarray) -> np.ndarray:
        regs = np.zeros((CMS_D, CMS_W), np.int64)
        for r in range(CMS_D):
            np.add.at(regs[r], _cms_bucket(keys, r), 1)
        return regs

    whole = build(rng_keys)
    split = build(rng_keys[:1234]) + build(rng_keys[1234:4000]) + build(
        rng_keys[4000:]
    )
    assert (whole == split).all()


def test_histogram_quantiles_rank_error_and_merge(ray_session):
    """The histogram quantile sketch: every reported edge's true rank
    must be within one cell's mass of its target, and the sketch must
    be mergeable (cell counts of A ∪ B = elementwise sums)."""
    import numpy as np
    import pyarrow.parquet as pq

    from harvester_ray.stages.sketches import (
        HQ_CELLS,
        HQ_PERMILLE,
        histogram_quantiles,
    )

    sf = "/root/testdata/sf0.001"
    t = histogram_quantiles(sf)
    got = dict(
        zip(t["q_permille"].to_pylist(), t["value_r4_edge"].to_pylist())
    )
    v = pq.read_table(sf + "/events.parquet", columns=["value"])[
        "value"
    ].to_numpy(zero_copy_only=False)
    vfp = np.sort(np.floor(v * 10000.0 + 0.5).astype(np.int64))
    n = len(vfp)
    lo, hi = int(vfp[0]), int(vfp[-1])
    width = max(1, (hi - lo) // HQ_CELLS + 1)
    for q in HQ_PERMILLE:
        target = -(-q * n // 1000)
        edge = got[q]
        # rank of the edge must reach the target, and overshoot by at
        # most the mass of the edge's own cell
        rank = int(np.searchsorted(vfp, edge, side="right"))
        assert rank >= target, (q, rank, target)
        cell_lo = edge - width + 1
        cell_mass = rank - int(np.searchsorted(vfp, cell_lo, side="left"))
        assert rank - cell_mass < target, (q, rank, cell_mass, target)
        # the edge itself is a cell boundary of the shared grid
        assert (edge - lo + 1) % width == 0

    # mergeability: histogram of the union == summed histograms
    h_all = np.bincount((vfp - lo) // width, minlength=HQ_CELLS)
    a, b = vfp[::2], vfp[1::2]
    h_a = np.bincount((a - lo) // width, minlength=HQ_CELLS)
    h_b = np.bincount((b - lo) // width, minlength=HQ_CELLS)
    assert (h_all == h_a + h_b).all()
