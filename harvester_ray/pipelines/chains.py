"""Declarative named-stage curation chains.

The reference runs a PER-COLLECTION, registry-configured enrichment
list — a non-programmer edits an ordered list of named steps and the
harvester applies them in sequence
(harvester/collection_registry_client.py:123-140 builds the per-
collection ``enrichments_item`` chain; run_ingest.py executes it).
This module is that surface for the engine: a JSON/dict config lists
stage NAMES (+ params); ``compose_chain`` resolves them from
``STAGE_REGISTRY`` and threads the corpus through.

Stage contract — every stage is a pure id-set transform::

    stage(kept: Dataset[(doc_id,)], sf_dir: str, params: dict)
        -> Dataset[(doc_id,)]

so the composition is doc_id-keyed hash semi/anti-joins of
id-projected streams (exactly how curate_corpus hand-composes its
legs): no stage materializes on the driver, nothing broadcasts past
the guarded side-table plan, and a chain edit is a config edit.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

import numpy as np
import pyarrow as pa
import ray.data

STAGE_REGISTRY: dict[str, Callable] = {}


def register_stage(name: str):
    """Decorator: add a stage under ``name`` (config-visible)."""

    def deco(fn):
        STAGE_REGISTRY[name] = fn
        return fn

    return deco


_ID_SCHEMA = pa.schema([("doc_id", pa.int64())])


def _ids_only(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"].cast(pa.int64())}),
        batch_format="pyarrow",
    )


def _semi_join(kept, other):
    from harvester_ray.stages.joins import ds_join

    return ds_join(
        kept, other, on=("doc_id",), schemas=(_ID_SCHEMA, _ID_SCHEMA)
    )


@register_stage("gopher_filter")
def _stage_gopher(kept, sf_dir, params):
    """Keep docs passing the Gopher quality gate (textstats)."""
    from harvester_ray.stages.textstats import gopher_filter

    def keep_ids(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = t["keep"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": pa.array(d[k == 1], pa.int64())})

    ok = gopher_filter(sf_dir).map_batches(keep_ids, batch_format="pyarrow")
    return _semi_join(kept, ok)


@register_stage("dedup_exact")
def _stage_dedup_exact(kept, sf_dir, params):
    """Keep only each exact-dup cluster's canonical (min doc_id per
    md5(text))."""
    from harvester_ray.pipelines.relational import dedup_exact

    return _semi_join(kept, _ids_only(dedup_exact(sf_dir)))


@register_stage("eval_holdout")
def _stage_eval_holdout(kept, sf_dir, params):
    """Drop the held-out eval subset (the decontamination benchmark:
    doc_id % DECON_BENCH_MOD == DECON_BENCH_REM, stages/dedup.py)."""
    from harvester_ray.stages.dedup import (
        DECON_BENCH_MOD,
        DECON_BENCH_REM,
    )

    mod = int(params.get("mod", DECON_BENCH_MOD))
    rem = int(params.get("rem", DECON_BENCH_REM))

    def drop_bench(t: pa.Table) -> pa.Table:
        # numpy floored % — the exact expression curate_corpus and the
        # decontaminate benchmark share (stages/dedup.py)
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(d[d % mod != rem], pa.int64())}
        )

    return kept.map_batches(drop_bench, batch_format="pyarrow")


@register_stage("decontaminate")
def _stage_decontaminate(kept, sf_dir, params):
    """Drop docs sharing an 8-gram with the eval benchmark (hash
    anti-join; stages/dedup.decontaminate)."""
    from harvester_ray.stages.dedup import (
        anti_join_doc_ids,
        decontaminate,
    )

    return anti_join_doc_ids(kept, _ids_only(decontaminate(sf_dir)))


@register_stage("dedup_near")
def _stage_dedup_near(kept, sf_dir, params):
    """Drop non-canonical near-dup cluster members (n-gram-Jaccard CC
    sweep, stages/dedup.dedup_keep semantics)."""
    from harvester_ray.stages.dedup import dedup_keep

    thr = float(params.get("threshold", 0.5))
    return _semi_join(kept, dedup_keep(sf_dir, threshold=thr))


@register_stage("lang_filter")
def _stage_lang(kept, sf_dir, params):
    """Keep docs whose lang column is in params['langs']."""
    langs = set(params.get("langs", ["en"]))

    def keep_ids(t: pa.Table) -> pa.Table:
        mask = pa.array(
            [(x in langs) for x in t["lang"].to_pylist()], pa.bool_()
        )
        return pa.table(
            {"doc_id": t.filter(mask)["doc_id"].cast(pa.int64())}
        )

    ok = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang"],
    ).map_batches(keep_ids, batch_format="pyarrow")
    return _semi_join(kept, ok)


@register_stage("min_chars")
def _stage_min_chars(kept, sf_dir, params):
    """Keep docs with n_chars >= params['n'] (metadata predicate,
    pruned at the read)."""
    n = int(params.get("n", 1))

    def keep_ids(t: pa.Table) -> pa.Table:
        c = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": pa.array(d[c >= n], pa.int64())})

    ok = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"],
    ).map_batches(keep_ids, batch_format="pyarrow")
    return _semi_join(kept, ok)


def normalize_chain(chain) -> list[tuple[str, dict]]:
    """Accept ["name", {"stage": "name", ...params}] mixes; validate
    against the registry with a typed error naming valid stages."""
    out = []
    for item in chain:
        if isinstance(item, str):
            name, params = item, {}
        elif isinstance(item, dict):
            item = dict(item)
            name = item.pop("stage")
            params = item
        else:
            raise TypeError(f"chain item {item!r} is not str/dict")
        if name not in STAGE_REGISTRY:
            raise KeyError(
                f"unknown stage {name!r}; registered: "
                f"{sorted(STAGE_REGISTRY)}"
            )
        out.append((name, params))
    return out


def compose_chain(
    sf_dir: str,
    chain,
    columns: tuple = ("doc_id", "source", "n_chars"),
) -> "ray.data.Dataset":
    """Thread the documents corpus through the named stages in order;
    returns the surviving docs joined back to ``columns`` via the
    size-aware side plan (same output contract as curate_corpus)."""
    from harvester_ray.stages.joins import join_parquet_side

    kept = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    kept = _ids_only(kept)
    for name, params in normalize_chain(chain):
        kept = STAGE_REGISTRY[name](kept, sf_dir, params)
    return join_parquet_side(
        kept,
        os.path.join(sf_dir, "documents.parquet"),
        list(columns),
        on=("doc_id",),
        left_schema=_ID_SCHEMA,
    )


# the reference-thresholds default chain: the declarative twin of
# textstats.curate_corpus (same four legs, same composition joins)
CURATE_CHAIN = [
    "gopher_filter",
    "dedup_exact",
    "eval_holdout",
    "decontaminate",
]


def load_chain_config(path: str) -> list:
    """Read a chain config: JSON list, or object {"chain": [...]}."""
    with open(path) as f:
        cfg = json.load(f)
    if isinstance(cfg, dict):
        cfg = cfg["chain"]
    if not isinstance(cfg, list):
        raise TypeError("chain config must be a list or {'chain': [...]}")
    return cfg


def curate_chain(sf_dir: str) -> "ray.data.Dataset":
    """Gate entry: the DEFAULT declarative chain — must equal the
    hand-composed curate_corpus bit for bit (same oracle SQL)."""
    return compose_chain(sf_dir, CURATE_CHAIN)
