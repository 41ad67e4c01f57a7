"""Distributed sketch operators.

Two sketch shapes a 100-TB engine needs, each built so the DRIVER GATE
can verify it exactly (no "trust the approximation" escape hatch):

- ``heavy_hitters``: frequent-item detection as the two-pass
  candidates-then-exact-verify pattern. Phase 1 prunes by pigeonhole:
  a term with global frequency >= N/D must have local frequency
  >= batch_tokens/D in AT LEAST ONE batch, so the per-batch local
  filter yields a guaranteed candidate SUPERSET (the Misra-Gries
  guarantee without its merge-order sensitivity). Phase 2 exact-counts
  ONLY the candidates (broadcast set, change-log-sized) and applies
  the exact integer threshold — output counts are EXACT, so the entry
  is DuckDB-oracled with a plain GROUP BY ... HAVING.
- ``hll_registers``: HyperLogLog whose REGISTERS are the verified
  contract. The hash is modular arithmetic over the Mersenne prime
  2^31-1 (products fit BIGINT on both engines — DuckDB has no wrapping
  64-bit multiply, so splitmix-style hashes cannot be mirrored in
  SQL); bucket/rank extraction uses only integer div/mod and
  ceil(log2(v+1)) (exact in float64 for v < 2^31 on both sides). The
  distributed shape is the canonical sketch merge: per-batch partial
  registers (<= m rows per batch regardless of batch size) ->
  groupby(bucket).max(rank). The cardinality ESTIMATE (bias-corrected
  + linear-counting small-range rule) is a driver-side fold over the
  m-row result, error-bound-pinned in tests.

Reference analog: the reference counts collections by brute Solr
facet queries (scripts/report_harvested_to_solr.py) — at 100 TB both
of these replace full shuffles with bounded-size summaries.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data

from harvester_ray.functions.text import DEFAULT_ANALYZER, flatten_tokens

# heavy hitters: report terms with count >= ceil(total_tokens / HH_D)
HH_D = 200

# HLL: 2^HLL_P buckets; 31-bit modular hash splits into bucket + value.
# The hash is TWO QUADRATIC rounds mod the Mersenne prime — affine
# rounds compose to affine and map sequential keys injectively into
# buckets (measured: 150 sequential ids -> 150 buckets, linear
# counting off by 50%); the quadratic rounds restore avalanche
# (measured occupancy matches the Poisson expectation and estimate
# error is 0.6-5.6% at n = 150/1500/15000). Every product of two
# sub-2^31 values fits BIGINT, so DuckDB mirrors it term for term.
HLL_P = 8
HLL_M = 1 << HLL_P
_MERSENNE = (1 << 31) - 1  # 2147483647
_HASH_A = 1103515245
_HASH_B = 12345
_HASH_A2 = 69069
_HASH_B2 = 362437
_V_BITS = 31 - HLL_P  # value field width -> max rank _V_BITS + 1


def _docs_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def heavy_hitters(sf_dir: str) -> "ray.data.Dataset":
    """(term, n) for every term with n >= ceil(total_tokens / HH_D),
    exact counts. Two passes over `documents`:

    1. candidate scan — per batch, value-count tokens and keep terms
       with local count >= local_tokens / HH_D (pigeonhole superset;
       emits a few rows per batch, unioned + deduped on the driver —
       candidate sets are sketch-sized, bounded by HH_D per batch);
    2. exact verify — stream again, count ONLY candidate terms
       (broadcast membership filter), global integer sum, threshold
       at ceil(N / HH_D) with N summed in the same pass.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    analyzer = DEFAULT_ANALYZER

    def local_candidates(t: pa.Table) -> pa.Table:
        toks = analyzer.tokenize_column(t["text"])
        flat, _ = flatten_tokens(toks)
        n_local = len(flat)
        if n_local == 0:
            return pa.table({"term": pa.array([], pa.string())})
        vc = pc.value_counts(flat)
        terms, counts = vc.field(0), vc.field(1)
        keep = pc.greater_equal(
            pc.multiply(counts.cast(pa.int64()), HH_D),
            pa.scalar(n_local, pa.int64()),
        )
        return pa.table({"term": terms.filter(keep).cast(pa.string())})

    src = ray.data.read_parquet(_docs_path(sf_dir), columns=["text"])
    cands = sorted(
        src.map_batches(local_candidates, batch_format="pyarrow")
        .unique("term")
    )
    cand_ref = ray.put(pa.array(cands, pa.string()))

    def count_candidates(t: pa.Table) -> pa.Table:
        toks = analyzer.tokenize_column(t["text"])
        flat, _ = flatten_tokens(toks)
        n_local = len(flat)
        hit = flat.filter(pc.is_in(flat, ray.get(cand_ref)))
        vc = pc.value_counts(hit)
        terms = vc.field(0).cast(pa.string()).to_pylist()
        counts = vc.field(1).cast(pa.int64()).to_pylist()
        # one sentinel row per batch carries the batch's token total so
        # N rides the same aggregation (empty term never tokenizes)
        return pa.table(
            {
                "term": pa.array(terms + [""], pa.string()),
                "n": pa.array(counts + [n_local], pa.int64()),
            }
        )

    sums = (
        src.map_batches(count_candidates, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
    )

    # sums is candidate-sized (bounded by ~HH_D rows per batch before
    # dedup), not corpus-sized — a driver fold is the right cost
    rows = sums.take_all()
    total = next(r["n"] for r in rows if r["term"] == "")
    thresh = -(-total // HH_D)  # ceil
    out = [
        (r["term"], r["n"])
        for r in rows
        if r["term"] != "" and r["n"] >= thresh
    ]
    out.sort()
    return pa.table(
        {
            "term": pa.array([t for t, _ in out], pa.string()),
            "n": pa.array([n for _, n in out], pa.int64()),
        }
    )


def _hll_parts(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rank) of int64 keys under the shared modular hash —
    every op exact in int64/float64 and mirrored verbatim in SQL."""
    xm = np.mod(x, _MERSENNE)
    r1 = np.mod(xm * xm + _HASH_A * xm + _HASH_B, _MERSENNE)
    h = np.mod(r1 * r1 + _HASH_A2 * r1 + _HASH_B2, _MERSENNE)
    bucket = np.mod(h, HLL_M)
    v = h // HLL_M  # < 2^_V_BITS
    bl = np.ceil(np.log2(v.astype(np.float64) + 1.0)).astype(np.int64)
    rank = np.where(v == 0, _V_BITS + 1, _V_BITS + 1 - bl)
    return bucket, rank


def hll_registers(sf_dir: str) -> "ray.data.Dataset":
    """(bucket, rank) HyperLogLog registers over events.user_id —
    observed buckets only, rank = max over the bucket's hashes. The
    canonical mergeable-sketch shape: per-batch partial registers
    (<= HLL_M rows per batch) -> groupby(bucket).max(rank); register
    tables merge by elementwise max at any tree depth, so the result
    is independent of batching and block order."""

    def partial(t: pa.Table) -> pa.Table:
        x = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x) == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        bucket, rank = _hll_parts(x)
        regs = np.zeros(HLL_M, np.int64)
        np.maximum.at(regs, bucket, rank)
        nz = np.nonzero(regs)[0]
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64), pa.int64()),
                "rank": pa.array(regs[nz], pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .max("rank")
        .map_batches(
            lambda t: pa.table(
                {
                    "bucket": t["bucket"].cast(pa.int64()),
                    "rank": t["max(rank)"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def hll_estimate(registers: "pa.Table | object") -> float:
    """Cardinality estimate from an (observed bucket, rank) table:
    classic HLL bias-corrected harmonic mean with the linear-counting
    small-range rule (the regime the fixed test corpus lands in)."""
    if hasattr(registers, "to_arrow_refs") or hasattr(registers, "take_all"):
        rows = registers.take_all()
        ranks = {int(r["bucket"]): int(r["rank"]) for r in rows}
    else:
        t = registers
        ranks = dict(
            zip(t["bucket"].to_pylist(), t["rank"].to_pylist())
        )
    m = HLL_M
    regs = np.zeros(m, np.float64)
    for b, r in ranks.items():
        regs[b] = r
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs))
    zeros = m - len(ranks)
    if est <= 2.5 * m and zeros > 0:
        return float(m * np.log(m / zeros))
    return float(est)


def hll_registers_by_group(sf_dir: str) -> "ray.data.Dataset":
    """(event_type, bucket, rank) — the grouped form of
    ``hll_registers`` (distinct users per event type in one pass):
    per-batch partial registers PER GROUP (<= groups x HLL_M rows per
    batch), then groupby(group, bucket).max(rank). Sketch
    composability is the point: per-group register tables still merge
    by elementwise max, so group cardinalities come from one shuffle
    whose volume is bounded by groups x m, not by rows."""

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        x = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x) == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "bucket": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        bucket, rank = _hll_parts(x)
        et = t["event_type"]
        codes = pc.dictionary_encode(et.combine_chunks())
        idx = (
            codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        )
        n_groups = len(codes.dictionary)
        regs = np.zeros((n_groups, HLL_M), np.int64)
        np.maximum.at(regs, (idx, bucket), rank)
        g_nz, b_nz = np.nonzero(regs)
        return pa.table(
            {
                "event_type": codes.dictionary.take(
                    pa.array(g_nz, pa.int64())
                ).cast(pa.string()),
                "bucket": pa.array(b_nz.astype(np.int64), pa.int64()),
                "rank": pa.array(regs[g_nz, b_nz], pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "user_id"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .max("rank")
        .map_batches(
            lambda t: pa.table(
                {
                    "event_type": t["event_type"].cast(pa.string()),
                    "bucket": t["bucket"].cast(pa.int64()),
                    "rank": t["max(rank)"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


# Count-Min: CMS_D independent rows of CMS_W counters. Each row's hash
# is the shared double-quadratic Mersenne family with a row-dependent
# additive salt BEFORE the quadratic rounds (salting after would only
# rotate buckets within a row). Point estimate = min over rows — an
# OVERESTIMATE by construction, within eps*total with prob 1-delta
# (eps = e/W, delta = e^-D; Cormode & Muthukrishnan 2005).
CMS_D = 4
CMS_W = 512
_CMS_SALT = 7919


def _cms_bucket(x: np.ndarray, row: int) -> np.ndarray:
    """Row ``row``'s counter index for int64 keys — every op exact in
    int64 and mirrored verbatim in SQL (CMS_REGISTERS)."""
    xm = np.mod(np.mod(x, _MERSENNE) + row * _CMS_SALT, _MERSENNE)
    r1 = np.mod(xm * xm + _HASH_A * xm + _HASH_B, _MERSENNE)
    h = np.mod(r1 * r1 + _HASH_A2 * r1 + _HASH_B2, _MERSENNE)
    return np.mod(h, CMS_W)


def cms_registers(sf_dir: str) -> "ray.data.Dataset":
    """(row, bucket, total) Count-Min registers over events.user_id
    occurrence counts — the frequency-sketch complement of
    hll_registers (distinct counts) and heavy_hitters (exact top
    set). The same canonical mergeable shape: per-batch partial
    register matrices (<= CMS_D * CMS_W rows per batch regardless of
    batch size) -> groupby(row, bucket).sum — register tables merge by
    elementwise SUM at any tree depth, so the result is independent of
    batching and block order, and a 100-TB frequency profile moves
    d*w counters per partition instead of a row per event."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        x = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x) == 0:
            return pa.table(
                {
                    "row": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                    "total": pa.array([], pa.int64()),
                }
            )
        regs = np.zeros((CMS_D, CMS_W), np.int64)
        for r in range(CMS_D):
            np.add.at(regs[r], _cms_bucket(x, r), 1)
        rr, bb = np.nonzero(regs)
        return pa.table(
            {
                "row": pa.array(rr.astype(np.int64), pa.int64()),
                "bucket": pa.array(bb.astype(np.int64), pa.int64()),
                "total": pa.array(regs[rr, bb], pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["row", "bucket"])
        .aggregate(Sum("total", alias_name="total"))
        .map_batches(
            lambda t: pa.table(
                {
                    "row": t["row"].cast(pa.int64()),
                    "bucket": t["bucket"].cast(pa.int64()),
                    "total": t["total"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def cms_estimate(registers: "pa.Table | object", key: int) -> int:
    """Point frequency estimate for ``key`` from a (row, bucket, total)
    register table: min over rows of the key's counter. Never
    underestimates the true count."""
    if hasattr(registers, "take_all"):
        rows = registers.take_all()
        regs = {(int(r["row"]), int(r["bucket"])): int(r["total"]) for r in rows}
    else:
        t = registers
        regs = {
            (int(a), int(b)): int(c)
            for a, b, c in zip(
                t["row"].to_pylist(),
                t["bucket"].to_pylist(),
                t["total"].to_pylist(),
            )
        }
    x = np.array([key], dtype=np.int64)
    return min(
        regs.get((r, int(_cms_bucket(x, r)[0])), 0) for r in range(CMS_D)
    )


# --- mergeable histogram quantile sketch ------------------------------------
# Completes the classic sketch trio (cardinality = HLL, frequency =
# CMS, quantiles = this): a FIXED-SIZE equal-width histogram over the
# observed value domain. Unlike KLL/t-digest it is fully deterministic
# and order-independent (cell counts are commutative sums), so the
# whole sketch — probe, cells, rank cuts — has an exact DuckDB twin
# and sits under the value-hash gate. Rank error is bounded by the
# largest cell's mass (<= n for pathological single-cell domains,
# ~n/2^16 for spread ones); the merged sketch of two corpora is the
# elementwise sum of their cell counts.
HQ_CELLS = 1 << 16
HQ_PERMILLE = (10, 100, 250, 500, 750, 900, 990)


def histogram_quantiles(sf_dir: str) -> pa.Table:
    """(q_permille, value_r4_edge): approximate quantiles of
    events.value at r4 fixed point — the inclusive upper edge of the
    first histogram cell whose cumulative count reaches
    ceil(q * n / 1000). Two streaming passes: a (min, max, n) probe
    and a (cell)-keyed count fold; at most HQ_CELLS rows ever reach
    the driver. Integer-exact end to end (floored divisions on
    non-negative offsets), so the DuckDB twin matches bit for bit."""
    from ray.data.aggregate import Max, Min, Sum

    path = os.path.join(sf_dir, "events.parquet")

    def to_fp(t: pa.Table) -> pa.Table:
        v = t["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
        vfp = np.floor(v * 10000.0 + 0.5).astype(np.int64)
        return pa.table({"vfp": pa.array(vfp, pa.int64())})

    fp_ds = ray.data.read_parquet(path, columns=["value"]).map_batches(
        to_fp, batch_format="pyarrow"
    )
    mm = fp_ds.aggregate(
        Min("vfp", alias_name="lo"), Max("vfp", alias_name="hi")
    ) or {}
    lo, hi = int(mm.get("lo") or 0), int(mm.get("hi") or 0)
    width = max(1, (hi - lo) // HQ_CELLS + 1)

    def cells(t: pa.Table) -> pa.Table:
        vfp = t["vfp"].to_numpy(zero_copy_only=False)
        c = (vfp - lo) // width  # offsets are non-negative: exact
        uc, cnt = np.unique(c, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(uc, pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    rows = (
        fp_ds.map_batches(cells, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )
    rows.sort(key=lambda r: int(r["cell"]))
    cell_ids = [int(r["cell"]) for r in rows]
    cum = np.cumsum([int(r["cnt"]) for r in rows]).astype(np.int64)
    n = int(cum[-1]) if len(cum) else 0
    edges = []
    for q in HQ_PERMILLE:
        target = -(-q * n // 1000)  # ceil
        i = int(np.searchsorted(cum, target, side="left"))
        i = min(i, max(len(cell_ids) - 1, 0))
        edge = lo + (cell_ids[i] + 1) * width - 1 if cell_ids else 0
        edges.append(int(edge))
    return pa.table(
        {
            "q_permille": pa.array(list(HQ_PERMILLE), pa.int64()),
            "value_r4_edge": pa.array(edges, pa.int64()),
        }
    )
