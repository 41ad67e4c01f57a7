"""Distributed prefix-scan over a keyed weight table.

The range-partition prefix-scan rank path that `export_sorted`
(pipelines/fulltext.py) and `crawl_frontier` (pipelines/weburls.py)
promise past their driver-cumsum guards: given one row per DISTINCT
key with a weight, compute each key's EXCLUSIVE prefix sum of weights
in key order without ever collecting the key table to the driver.

Shape (the textbook two-level scan, with Ray's own sort as the range
partitioner):
  1. `Dataset.sort(key)` range-partitions the distinct-key table into
     globally ordered blocks (Ray samples boundaries internally);
  2. one map emits ONE partial row per block (the block's first key in
     scan order + its weight sum); the driver exclusive-scans those
     B partials — O(blocks), bounded by the shuffle partition count,
     NOT the key count;
  3. a second per-block map local-cumsums and adds the block's base.
Keys are unique (the input is a groupby result), so no key straddles
a sort boundary and each block's base is well defined.

The output `(key, offset)` table stays distributed; consumers join it
onto their row stream (one light hash join) instead of broadcasting a
driver-side dict.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def keyed_prefix_offsets(
    counts: "ray.data.Dataset",
    key: str,
    weight: str,
    *,
    descending: bool = False,
    offset_name: str = "offset",
) -> "ray.data.Dataset":
    """(key, offset) for every row of `counts`, where offset is the
    exclusive prefix sum of `weight` over keys sorted ascending (or
    descending). `counts` must hold one row per distinct key (a
    groupby-aggregate result). The result is a distributed Dataset
    with the same row count; only O(num-blocks) rows touch the driver.
    """
    order = "descending" if descending else "ascending"
    ranged = counts.sort(key, descending=descending).materialize()

    def block_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"first_key": pa.array([], t[key].type),
                 "block_sum": pa.array([], pa.int64())}
            )
        idx = pc.sort_indices(t, sort_keys=[(key, order)])
        first = t[key].take(idx[:1])
        s = pc.sum(t[weight]).as_py() or 0
        return pa.table(
            {
                "first_key": first,
                "block_sum": pa.array([int(s)], pa.int64()),
            }
        )

    partials = ranged.map_batches(
        block_partial, batch_format="pyarrow", batch_size=None
    ).take_all()
    partials.sort(key=lambda r: r["first_key"], reverse=descending)
    base: dict = {}
    acc = 0
    for row in partials:
        base[row["first_key"]] = acc
        acc += int(row["block_sum"])

    def block_scan(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {key: pa.array([], t[key].type),
                 offset_name: pa.array([], pa.int64())}
            )
        idx = pc.sort_indices(t, sort_keys=[(key, order)])
        t = t.take(idx)
        w = t[weight].to_numpy(zero_copy_only=False).astype(np.int64)
        excl = np.concatenate(([0], np.cumsum(w)[:-1]))
        first = t[key][0].as_py()
        return pa.table(
            {
                key: t[key],
                offset_name: pa.array(excl + base[first], pa.int64()),
            }
        )

    return ranged.map_batches(
        block_scan, batch_format="pyarrow", batch_size=None
    )
