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
