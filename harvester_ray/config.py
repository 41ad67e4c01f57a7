"""Pipeline configuration.

Replaces the reference's registry-API Collection lookup + akara.ini env
config (harvester/collection_registry_client.py:86-169,
harvester/config.py:25-78) with a plain dataclass; every knob that
matters at 100 TB scale is explicit here.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BM25Params:
    k1: float = 1.2
    b: float = 0.75


@dataclass(frozen=True)
class IndexConfig:
    """Knobs for the index build.

    Scale notes (sized for a 256-node cluster streaming ~100 TB):

    - ``block_size``: postings per compressed block; 128 is the classic
      Block-Max WAND granularity.
    - ``salt_df_threshold``: terms with global df >= threshold are
      "head" terms whose postings groups are salted into
      ``salt_buckets`` doc_id-range sub-groups before the term groupby,
      so no single group exceeds worker memory (SURVEY.md §4 skew row).
      Buckets are *ordered* by doc_id high bits, so concatenating
      sub-group blocks preserves global doc_id order.
    - ``tokenize_batch_size``: rows per tokenize batch. Text rows are
      ~KBs; 4096 rows ≈ a few MB per batch.
    - ``extract_batch_size``: rows per HTML-extraction batch. HTML rows
      can be MBs, keep small (FIXTURES/SURVEY hard part (f)).
    """

    bm25: BM25Params = field(default_factory=BM25Params)
    block_size: int = 128
    # "bucket" (default): map-side partition — SPIMI writes postings
    #   hive-partitioned by hash(term_id) % num_term_buckets; the
    #   segments stage is one independent task per bucket (read →
    #   numpy lexsort → run encode). The shuffle is the partitioned
    #   write itself (the classic MapReduce index shape); fully
    #   deterministic block layout. Giant buckets are encoded in
    #   doc_id-range chunks, so memory stays bounded under skew.
    # "sort": Ray range-partitioned sort by (term_id, doc_id) +
    #   run-splitting batch encoder — head-term skew is spread across
    #   range partitions by the sort's boundary sampling.
    # "salted_groupby": hash groupby on (term_id, salt) with explicit
    #   doc_id-range salting of head terms.
    segment_strategy: str = "bucket"
    # 128 (was 32): encode tasks = buckets × chunks, and with buckets
    # == CPUs the stage ran as ONE wave whose wall time was its most
    # skewed bucket (salted head terms still concentrate postings).
    # 4 waves per 32 CPUs let the scheduler balance skew: measured
    # interleaved at sf0.1/2M docs the segments stage fell 38-42 s →
    # 7.4 s (5×) and the whole build 64-82 s → 34 s. At cluster scale
    # buckets should stay a few × total cores for the same reason.
    num_term_buckets: int = 128
    # per-bucket doc_id-range fan-out for the bucket strategy: encode
    # tasks = buckets x chunks, so a hot term cannot pin one task's
    # memory/runtime; per-term runs from different chunks are disjoint
    # ordered doc ranges and merge at query load (same invariant the
    # salted strategy relies on). Chunk membership is a contiguous
    # signed doc_id range and the SPIMI bucket files are doc_id-sorted
    # with sized row groups, so each chunk task's range filter prunes
    # its read to ~1/chunks of the bucket by row-group statistics —
    # no read amplification. Doc-sharded serving requires
    # segment_doc_chunks == n_shards (power of two).
    segment_doc_chunks: int = 1
    salt_df_threshold: int = 100_000
    salt_buckets: int = 64
    tokenize_batch_size: int = 8192
    # bucket-strategy SPIMI batch: the per-batch fixed cost is the side
    # writes (one file per term bucket per batch), so batches are much
    # larger than tokenize_batch_size; ~32k docs x ~1KB text ≈ 32 MB in
    # flight per task. Lower it for wide rows (multi-MB html).
    spimi_batch_size: int = 32768
    extract_batch_size: int = 128
    # autoscaling (min, max) actor pool: min=1 so concurrent stage
    # executions can never deadlock waiting for a full fixed pool
    extract_concurrency: int | tuple[int, int] = (1, 4)
    # columns pruned at the read for the build (prune-at-the-read rule)
    doc_columns: tuple[str, ...] = ("doc_id", "text")
    # injectable analyzer (SURVEY.md §2.10): resolved via
    # functions.text.get_analyzer at use sites; the NAME (not the
    # callable) travels through config/params/stats so resume keys and
    # serialized stats stay stable
    analyzer_name: str = "default"
    # posting-block codec: "varint" (LEB128, fastest encode/bulk
    # decode — default), "for" (FOR bit-packing: tighter uniform
    # blocks, slower per-block encode) or "pfor" (PForDelta with
    # patched exceptions: smallest segments, outlier-immune)
    codec: str = "varint"
    # auto-compaction policy for the incremental pages loop: fold the
    # delta chain into one source (maintenance.merge_sources) once it
    # reaches this length — bounds per-query multi-source overhead
    merge_after_deltas: int = 8


DEFAULT_INDEX_CONFIG = IndexConfig()


def stage_concurrency(
    divisor: int = 4, lo: int = 1, hi: int | None = None
) -> tuple[int, int]:
    """Autoscaling actor-pool bounds derived from the cluster CPU count
    (never hard-code pool sizes: a fixed (2, 8) that fits a laptop
    starves a 32-CPU node and any real cluster). ``divisor`` is the
    fraction of cluster CPUs the stage may claim at peak."""
    try:
        import ray

        cpus = (
            int(ray.cluster_resources().get("CPU", 0))
            if ray.is_initialized()
            else 0
        )
    except Exception:
        cpus = 0
    top = max(2, (cpus or 8) // divisor)
    if hi is not None:
        top = min(top, hi)
    return (lo, max(lo, top))


def cluster_cpus(default: int = 8) -> int:
    """Cluster CPU count (or ``default`` before ray.init)."""
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 0)) or default
    except Exception:
        pass
    return default


def shuffle_partitions(mult: int = 2, lo: int = 8) -> int:
    """Partition count for hash-partitioned grouped stages and joins —
    derived from cluster size, never hard-coded. Used to turn
    "groupby(key) with millions of tiny groups" into "groupby(part)
    with O(cluster) composite groups processed vectorized"."""
    return max(lo, cluster_cpus() * mult)
