"""URL-axis webtext operators over the documents table: canonical
forms, canonical-url snapshot dedup, and per-domain corpus profiles.

The input_hint's page table is keyed by (url, warc_ts); the reference
likewise keys every harvested record by a url-derived id (couchdb
``_id`` per record — /root/reference/harvester/fetcher.py). Url
canonicalization is the step before EVERY url-keyed operation at
Common-Crawl scale, so it is gated here end to end: messy urls are
synthesized deterministically per document (functions/urls.synth_urls),
the GENERAL vectorized canonicalizer runs over them, and the SQL twin
rebuilds both the messy string and its closed-form canonical from the
same integer arithmetic — any parser drift breaks the value hash.

All three entries are map-only or one light groupby over
(url_canon)-sized rows; the text column never moves.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from harvester_ray.functions.urls import (
    canonicalize_urls,
    host_of,
    registrable_domain,
    synth_snap_ts,
    synth_urls,
)


def _docs(sf_dir: str, columns: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


def _with_urls(t: pa.Table) -> pa.Table:
    url = synth_urls(t["doc_id"].combine_chunks(), t["source"].combine_chunks())
    return t.append_column("url", url)


def url_canonical(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, url, url_canon) for every document — the canonical-form
    kernel as a map-only stage (zero shuffle at any corpus size)."""

    def canon(t: pa.Table) -> pa.Table:
        t = _with_urls(t)
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "url": t["url"],
                "url_canon": canonicalize_urls(t["url"]),
            }
        )

    return _docs(sf_dir, ["doc_id", "source"]).map_batches(
        canon, batch_format="pyarrow"
    )


def url_dedup_latest(sf_dir: str) -> "ray.data.Dataset":
    """Canonical-url snapshot dedup: of all docs sharing a canonical
    url, keep the latest snapshot (max synthetic snap_ts, doc_id as the
    deterministic tie-break) and report the snapshot count. Combiner
    shape: each batch forwards ONE candidate row per local url plus its
    local count, the groupby reduces candidates — the shuffle moves
    O(distinct urls), never the corpus. Output
    (url_canon, doc_id, snap_ts, n_snapshots)."""

    def local_best(t: pa.Table) -> pa.Table:
        t = _with_urls(t)
        tbl = pa.table(
            {
                "url_canon": canonicalize_urls(t["url"]),
                "doc_id": t["doc_id"].cast(pa.int64()),
                "snap_ts": synth_snap_ts(t["doc_id"].combine_chunks()),
            }
        )
        # latest-first within url: one pass keeps each url's first row
        tbl = tbl.sort_by(
            [
                ("url_canon", "ascending"),
                ("snap_ts", "descending"),
                ("doc_id", "descending"),
            ]
        )
        u = tbl["url_canon"].to_numpy(zero_copy_only=False)
        if len(u) == 0:
            return tbl.append_column("n_snapshots", pa.array([], pa.int64()))
        change = np.r_[True, u[1:] != u[:-1]]
        starts = np.flatnonzero(change)
        counts = np.diff(np.r_[starts, len(u)])
        return tbl.take(pa.array(starts)).append_column(
            "n_snapshots", pa.array(counts, pa.int64())
        )

    def finalize(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g,
            sort_keys=[("snap_ts", "descending"), ("doc_id", "descending")],
        )
        best = g.take(idx[:1])
        return pa.table(
            {
                "url_canon": best["url_canon"],
                "doc_id": best["doc_id"],
                "snap_ts": best["snap_ts"],
                "n_snapshots": pa.array(
                    [pc.sum(g["n_snapshots"]).as_py()], pa.int64()
                ),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "source"])
        .map_batches(local_best, batch_format="pyarrow")
        .groupby("url_canon")
        .map_groups(finalize, batch_format="pyarrow")
    )


def domain_profile(sf_dir: str) -> "ray.data.Dataset":
    """Per registrable-domain corpus profile: distinct hosts, doc count,
    total chars — the domain histogram a curation pipeline consults for
    per-domain caps and blocklists. Two-level combiner: per-batch
    (domain, host) partials, one groupby on (domain, host) collapses
    duplicates, then a (domain) groupby folds hosts — every shuffled row
    is a (domain, host) partial, never a document. Output
    (domain, n_hosts, n_docs, total_chars)."""
    from ray.data.aggregate import Count, Sum

    def partials(t: pa.Table) -> pa.Table:
        t = _with_urls(t)
        host = host_of(t["url"])
        dom = registrable_domain(host)
        tbl = pa.table(
            {
                "domain": dom,
                "host": host,
                "n_docs": pa.array(
                    np.ones(t.num_rows, dtype=np.int64), pa.int64()
                ),
                "total_chars": t["n_chars"].cast(pa.int64()),
            }
        )
        return tbl.group_by(["domain", "host"]).aggregate(
            [("n_docs", "sum"), ("total_chars", "sum")]
        ).rename_columns(["domain", "host", "n_docs", "total_chars"])

    per_host = (
        _docs(sf_dir, ["doc_id", "source", "n_chars"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["domain", "host"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_chars", alias_name="total_chars"),
        )
    )
    out = per_host.groupby("domain").aggregate(
        Count(alias_name="n_hosts"),
        Sum("n_docs", alias_name="n_docs"),
        Sum("total_chars", alias_name="total_chars"),
    )

    def typed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "domain": t["domain"].cast(pa.string()),
                "n_hosts": t["n_hosts"].cast(pa.int64()),
                "n_docs": t["n_docs"].cast(pa.int64()),
                "total_chars": t["total_chars"].cast(pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pyarrow")
