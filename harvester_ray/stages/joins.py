"""Custom join operators Ray Data lacks: as-of join (+ the grouped
top-k combiner pattern used by its pipeline twin).

The reference joins registry metadata onto records by exact key
(harvester/run_ingest.py controller enrich step); an as-of join is the
time-series generalization a training-data pipeline needs (match each
event to the most recent state row at or before its timestamp).

Implementation (no Dataset.join variant exists for inequality keys):
tag-and-union both sides, hash-repartition by the equality key with
ONE groupby, and resolve the time predicate inside the group with a
vectorized searchsorted — the classic MapReduce merge-join-in-reducer.
Partitioning assumption: one key's rows fit in one group task (same
contract as any groupby); salt hot keys by time range if a key's
history outgrows a task.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    right_tiebreak: str,
) -> "ray.data.Dataset":
    """Backward as-of join: for each left row, the right row with the
    same key and the greatest ``right_ts`` <= ``left_ts`` (ties broken
    by the greatest ``right_tiebreak``). Unmatched left rows are
    dropped (inner as-of). Left columns pass through; ``right_values``
    are appended. Left/right column names must be disjoint."""
    l_schema = left.schema()
    l_cols = list(l_schema.names)
    overlap = set(l_cols) & set(right_values)
    if overlap:
        raise ValueError(f"column collision: {sorted(overlap)}")
    take_cols = [right_tiebreak] + [
        c for c in right_values if c != right_tiebreak
    ]

    l_types = dict(zip(l_schema.names, l_schema.types))
    r_schema = right.schema()
    r_types = dict(zip(r_schema.names, r_schema.types))

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {
            "__key": t[left_on].cast(pa.int64()),
            "__ts": t[left_ts],
            "__side": pa.array(np.zeros(len(t), np.int8)),
        }
        for c in l_cols:
            cols[c] = t[c]
        for c in take_cols:
            cols[c] = pa.nulls(len(t), r_types[c])
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {
            "__key": t[right_on].cast(pa.int64()),
            "__ts": t[right_ts],
            "__side": pa.array(np.ones(len(t), np.int8)),
        }
        for c in l_cols:
            cols[c] = pa.nulls(len(t), l_types[c])
        for c in take_cols:
            cols[c] = t[c]
        return pa.table(cols)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.select_columns(
            list(dict.fromkeys([right_on, right_ts, *take_cols]))
        ).map_batches(tag_right, batch_format="pyarrow")
    )

    def resolve(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = g["__side"].to_numpy(zero_copy_only=False)
        out_cols = l_cols + take_cols
        lefts = g.filter(pa.array(side == 0))
        rights = g.filter(pa.array(side == 1))
        if lefts.num_rows == 0 or rights.num_rows == 0:
            return g.select(out_cols).slice(0, 0)
        rights = rights.take(
            pc.sort_indices(
                rights,
                sort_keys=[
                    ("__ts", "ascending"),
                    (right_tiebreak, "ascending"),
                ],
            )
        )
        rts = rights["__ts"].to_numpy(zero_copy_only=False)
        lts = lefts["__ts"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(rts, lts, side="right") - 1
        matched = idx >= 0
        lefts = lefts.filter(pa.array(matched))
        take_idx = pa.array(idx[matched].astype(np.int64))
        cols = {c: lefts[c] for c in l_cols}
        for c in take_cols:
            cols[c] = rights[c].take(take_idx)
        return pa.table(cols)

    return tagged.groupby("__key").map_groups(resolve, batch_format="pyarrow")
