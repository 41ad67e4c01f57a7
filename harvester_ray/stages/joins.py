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
import pyarrow.compute as pc
import ray.data

_GOLD = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci-hash multiplier


def _key_hash(tbl: pa.Table, keys: list[str]) -> np.ndarray:
    """uint64 hash of the key tuple per row (int keys mix directly;
    string keys pay one Python blake2b per UNIQUE batch value via
    dictionary encode). Key columns must be non-null."""
    from harvester_ray.functions.text import hash64_array

    h = np.zeros(tbl.num_rows, np.uint64)
    for k in keys:
        col = tbl[k]
        if pa.types.is_integer(col.type):
            v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            enc = pc.dictionary_encode(col.combine_chunks())
            v = hash64_array(enc.dictionary).view(np.uint64)[
                enc.indices.to_numpy(zero_copy_only=False)
            ]
        with np.errstate(over="ignore"):
            h = (h ^ v) * _GOLD
    return h


def partitioned_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: list[str] | tuple[str, ...],
    how: str = "inner",
    num_partitions: int | None = None,
    schemas: tuple[pa.Schema, pa.Schema] | None = None,
) -> "ray.data.Dataset":
    """Hash join that tolerates empty shuffle partitions and empty
    blocks, which Ray's ``Dataset.join`` does not: a partition that
    receives no rows finalizes a ZERO-COLUMN table
    (ArrowBlockBuilder().build()) that Acero rejects with "No match
    ... for key field", and groupby aggregates upstream emit
    zero-column empty blocks with the same effect — both bite any
    small or skewed input. Same cost shape as the native join: ONE
    all-to-all of both sides tagged into a shared stream keyed by the
    key-tuple hash, then an in-partition Acero join per group.

    Contract: key columns share names on both sides and are non-null;
    payload (non-key) column names are disjoint across sides; payload
    types must be Acero-joinable (no list columns).

    ``schemas``: pass (left pa.Schema, right pa.Schema) when known —
    Dataset.schema() on a lazy groupby/join chain EXECUTES that chain
    once just to learn the schema and then again for real, doubling
    every upstream shuffle. All hot callsites pass schemas.
    """
    from harvester_ray.config import shuffle_partitions

    keys = list(on)
    parts = num_partitions or shuffle_partitions()
    lsch, rsch = schemas if schemas is not None else (None, None)
    if lsch is None:
        lsch = left.schema().base_schema
    if rsch is None:
        rsch = right.schema().base_schema
    lpay = [c for c in lsch.names if c not in keys]
    rpay = [c for c in rsch.names if c not in keys]
    overlap = set(lpay) & set(rpay)
    if overlap:
        raise ValueError(f"payload columns not disjoint: {sorted(overlap)}")
    fields = (
        [(k, lsch.field(k).type) for k in keys]
        + [(c, lsch.field(c).type) for c in lpay]
        + [(c, rsch.field(c).type) for c in rpay]
    )
    empty = pa.table(
        {n: pa.array([], t) for n, t in fields}
        | {
            "_side": pa.array([], pa.int8()),
            "_part": pa.array([], pa.int64()),
        }
    )

    def mapper(side: int):
        own = lpay if side == 0 else rpay
        other = rpay if side == 0 else lpay
        types = dict(fields)

        def fn(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:  # zero-column empty block upstream
                return empty
            part = (
                (_key_hash(t, keys) >> np.uint64(32)) % np.uint64(parts)
            ).astype(np.int64)
            cols = {k: t[k].cast(types[k]) for k in keys}
            for c in own:
                cols[c] = t[c].cast(types[c])
            for c in other:
                cols[c] = pa.nulls(t.num_rows, types[c])
            cols["_side"] = pa.array(
                np.full(t.num_rows, side, np.int8), pa.int8()
            )
            cols["_part"] = pa.array(part, pa.int64())
            return pa.table(cols).select(empty.column_names)

        return fn

    # Bound the sort width: groupby's sort-shuffle uses the INPUT block
    # count as its partition count, and a union inherits the sum of
    # both sides' block lists — iterative callers (the CC relabel loop)
    # would otherwise compound block counts ×3 per round, turning each
    # round's shuffle quadratically wider (observed: 4→13→40→121→364
    # blocks for 200 rows, 23 s/round). One shuffle-free coalesce pins
    # every call's shuffle at `parts` map and reduce tasks.
    stream = (
        left.map_batches(mapper(0), batch_format="pyarrow")
        .union(right.map_batches(mapper(1), batch_format="pyarrow"))
        .repartition(parts)
    )
    arrow_how = {"inner": "inner", "left_outer": "left outer"}[how]
    out_cols = keys + lpay + rpay

    def join_part(g: pa.Table) -> pa.Table:
        ls = pc.equal(g["_side"], 0)
        lt = g.filter(ls).select(keys + lpay)
        rt = g.filter(pc.invert(ls)).select(keys + rpay)
        return lt.join(
            rt, keys=keys, join_type=arrow_how
        ).select(out_cols)

    return stream.groupby("_part").map_groups(
        join_part, batch_format="pyarrow"
    )


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


# Parquet side tables beneath this on-disk size broadcast (ray.put once,
# Acero-joined inside each left batch); past it they stream through the
# task-based all-to-all. 256 MiB is well under a worker heap at the
# default object-store slice and still covers any metadata projection a
# single node should hold.
_SIDE_BYTES_GUARD = 256 << 20


def _parquet_bytes(path: str) -> int | None:
    """Total parquet bytes under ``path`` (file or directory) when it is
    locally stat-able; None for remote/unknown paths (callers then take
    the streaming join path — never guess a remote side is small)."""
    import os

    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith((".parquet", ".pq")):
                    total += os.path.getsize(os.path.join(root, f))
        return total or None
    except OSError:
        return None


def join_parquet_side(
    left: "ray.data.Dataset",
    path: str,
    columns: list[str],
    on: list[str] | tuple[str, ...],
    how: str = "inner",
    filter=None,
    guard_bytes: int = _SIDE_BYTES_GUARD,
    left_schema: pa.Schema | None = None,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Equi-join ``left`` against a parquet side table, physical plan
    picked by the side's ON-DISK size (known before any execution):

    - beneath ``guard_bytes``: broadcast hash join — the pruned side is
      read once on the driver, ``ray.put`` once, and Acero-joined inside
      each left batch. ZERO shuffles, one Dataset execution. This is the
      right plan whenever the side is a bounded metadata projection.
    - past the guard (or a non-local path): ``partitioned_join`` — one
      task-based all-to-all; same hash-shuffle shape as Ray's native
      join without its per-execution aggregator-actor pool spin-up
      (measured multi-second fixed cost per join at small scale).

    ``filter`` is a pyarrow.dataset expression applied at the side read
    on BOTH plans (row-group pruned). Key/payload names must be disjoint
    from ``left``'s columns except the key columns themselves."""
    keys = list(on)
    size = _parquet_bytes(path)
    if size is not None and size <= guard_bytes:
        import pyarrow.dataset as pads

        side = pads.dataset(path).to_table(columns=columns, filter=filter)
        side = side.combine_chunks()
        if left_schema is None:
            try:  # free for materialized/parquet lefts; None for lazy
                left_schema = left.schema(
                    fetch_if_missing=False
                ).base_schema
            except AttributeError:
                left_schema = None
        arrow_how = {"inner": "inner", "left_outer": "left outer"}[how]
        spay = [c for c in side.column_names if c not in keys]
        # typed empty for zero-column blocks (groupby-derived lefts emit
        # them); lefts with unknowable lazy schemas never do — map chains
        # over reads preserve their blocks' columns
        empty_out = (
            pa.table(
                {f.name: pa.array([], f.type) for f in left_schema}
                | {
                    c: pa.array([], side.schema.field(c).type)
                    for c in spay
                }
            )
            if left_schema is not None
            else None
        )
        side_ref = ray.put(side)

        def bj(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:  # zero-column empty block upstream
                if empty_out is None:
                    raise ValueError(
                        "join_parquet_side: zero-column empty block from "
                        "a left whose schema is unknown — pass left_schema"
                    )
                return empty_out
            s = ray.get(side_ref)
            return t.join(s, keys=keys, join_type=arrow_how).select(
                list(t.column_names)
                + [c for c in s.column_names if c not in keys]
            )

        return left.map_batches(bj, batch_format="pyarrow")

    right = ray.data.read_parquet(path, columns=columns, filter=filter)
    rsch = pa.schema(
        [right.schema().base_schema.field(c) for c in columns]
    )
    # left_schema=None lets partitioned_join fetch it (executes lazy
    # chains once — hot callsites with lazy lefts pass it explicitly)
    return partitioned_join(
        left,
        right,
        on=keys,
        how=how,
        num_partitions=num_partitions,
        schemas=(left_schema, rsch),
    )


def ds_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: tuple[str, ...] | list[str],
    right_on: tuple[str, ...] | list[str] | None = None,
    join_type: str = "inner",
    num_partitions: int | None = None,
    schemas: tuple[pa.Schema, pa.Schema] | None = None,
) -> "ray.data.Dataset":
    """Drop-in for ``Dataset.join`` routed through ``partitioned_join``
    (task-based all-to-all, empty-partition-safe, no per-execution
    shuffle-actor pool). Falls back to the native operator when the
    contract doesn't fit (unsupported join type, or a lazy input whose
    schema isn't already known and no ``schemas`` override — deriving it
    would execute the chain twice)."""
    keys = list(on)
    rkeys = list(right_on) if right_on else keys
    how = {"inner": "inner", "left_outer": "left_outer"}.get(join_type)
    lsch, rsch = schemas if schemas is not None else (None, None)
    if how is not None:
        try:
            if lsch is None:
                lsch = left.schema(fetch_if_missing=False).base_schema
            if rsch is None:
                rsch = right.schema(fetch_if_missing=False).base_schema
        except AttributeError:
            lsch = rsch = None
    if how is None or lsch is None or rsch is None:
        from harvester_ray.config import shuffle_partitions

        return left.join(
            right,
            join_type=join_type,
            num_partitions=num_partitions or shuffle_partitions(),
            on=tuple(keys),
            right_on=tuple(rkeys) if right_on else None,
        )
    if rkeys != keys:
        ren = dict(zip(rkeys, keys))
        names = [ren.get(c, c) for c in rsch.names]
        right = right.map_batches(
            lambda t, _n=names: t.rename_columns(_n),
            batch_format="pyarrow",
        )
        rsch = pa.schema(
            [pa.field(n, f.type) for n, f in zip(names, rsch)]
        )
    return partitioned_join(
        left,
        right,
        on=keys,
        how=how,
        num_partitions=num_partitions,
        schemas=(lsch, rsch),
    )


def bounded_side_table(
    ds: "object", guard_bytes: int, label: str
) -> list[dict]:
    """Materialize a SMALL side table for driver broadcast — size is
    checked BEFORE take_all() so an over-guard table never lands on
    the driver (the guard must prevent the blow-up, not post-date it).
    Callers document their past-guard twin (partitioned_join / hash
    anti-join) in the NotImplementedError they surface."""
    mat = ds.materialize()
    size = mat.size_bytes() or 0
    if size > guard_bytes:
        raise NotImplementedError(
            f"{label}: side table ~{size >> 20} MiB exceeds the "
            f"{guard_bytes >> 20} MiB broadcast guard; use the "
            "partitioned/hash-join twin for this input"
        )
    return mat.take_all()
