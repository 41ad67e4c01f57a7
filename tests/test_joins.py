"""asof_join semantics on a crafted case: backward match, tie-break to
the greatest tiebreak value, unmatched-left dropped, key isolation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from harvester_ray.stages.joins import asof_join


def test_asof_join_crafted(ray_session):
    left = pa.table(
        {
            "eid": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "k": pa.array([10, 10, 10, 20, 30], pa.int64()),
            "t": pa.array([5, 15, 2, 50, 7], pa.int64()),
        }
    )
    right = pa.table(
        {
            "rk": pa.array([10, 10, 10, 20, 20], pa.int64()),
            "rt": pa.array([3, 10, 10, 50, 60], pa.int64()),
            "val": pa.array([100, 200, 300, 400, 500], pa.int64()),
        }
    )
    out = (
        asof_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            left_on="k",
            right_on="rk",
            left_ts="t",
            right_ts="rt",
            right_values=["val"],
            right_tiebreak="val",
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    # eid=1 (k=10,t=5): only rt=3 qualifies -> 100
    # eid=2 (t=15): rt=10 tie -> greatest val 300
    # eid=3 (t=2): nothing <= 2 -> dropped
    # eid=4 (k=20,t=50): rt=50 (<=) -> 400
    # eid=5 (k=30): no right rows -> dropped
    want = pd.DataFrame(
        {"eid": [1, 2, 4], "k": [10, 10, 20], "t": [5, 15, 50],
         "val": [100, 300, 400]}
    )
    pd.testing.assert_frame_equal(
        out.astype(np.int64), want.astype(np.int64)
    )


def test_partitioned_join_tiny_and_empty_blocks(ray_session):
    """The empty-partition regime that crashes Ray's Dataset.join
    (zero-column tables from partitions that received no rows): a
    3-key join across 16 partitions, string + int keys, inner and
    left_outer, plus zero-column empty blocks on the input (the shape
    groupby aggregates emit)."""
    from ray.data.aggregate import Sum

    from harvester_ray.stages.joins import partitioned_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(["a", "b", "c"], pa.string()),
                "lv": pa.array([1, 2, 3], pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(["a", "c", "d"], pa.string()),
                "rv": pa.array([10, 30, 40], pa.int64()),
            }
        )
    )
    inner = partitioned_join(left, right, on=("k",), num_partitions=16)
    rows = sorted(map(tuple, inner.to_pandas().values.tolist()))
    assert rows == [("a", 1, 10), ("c", 3, 30)]

    lo = partitioned_join(
        left, right, on=("k",), how="left_outer", num_partitions=16
    ).to_pandas()
    got = sorted(zip(lo.k, lo.lv, lo.rv.fillna(-1).astype(int)))
    assert got == [("a", 1, 10), ("b", 2, -1), ("c", 3, 30)]

    # through a groupby aggregate (the zero-column empty-block source)
    agg = (
        ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array(["a", "a", "c"], pa.string()),
                    "n": pa.array([1, 1, 5], pa.int64()),
                }
            )
        )
        .groupby("k")
        .aggregate(Sum("n", alias_name="rv"))
    )
    j = partitioned_join(left, agg, on=("k",), num_partitions=16)
    rows = sorted(map(tuple, j.to_pandas().values.tolist()))
    assert rows == [("a", 1, 2), ("c", 3, 5)]

    # int keys
    li = ray.data.from_arrow(
        pa.table({"i": pa.array([1, 2], pa.int64()),
                  "lv": pa.array([7, 8], pa.int64())})
    )
    ri = ray.data.from_arrow(
        pa.table({"i": pa.array([2, 3], pa.int64()),
                  "rv": pa.array([20, 30], pa.int64())})
    )
    rows = sorted(map(tuple, partitioned_join(
        li, ri, on=("i",), num_partitions=16
    ).to_pandas().values.tolist()))
    assert rows == [(2, 8, 20)]
