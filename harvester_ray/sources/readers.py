"""Sources & sinks.

The reference's 17 paginated-HTTP fetchers (SURVEY.md §2.1) all
collapse to table scans here — the engine's one true source is Parquet
(`read_pages` / `read_documents`, column-pruned at the read). The
reference's *staging* format between fetch and enrich is JSONL page
files (`page-{n}.jsonl`, harvester/fetcher/controller.py:76-77,126-146)
— `read_jsonl_pages` / `write_jsonl_pages` give interop with that
layout so a user of the reference can feed existing staged pages in.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Common-Crawl-style pages table (input_hint schema)."""
    return ray.data.read_parquet(path, columns=columns)


def read_documents(
    sf_dir: str, columns: list[str] | None = None
) -> "ray.data.Dataset":
    """Pre-extracted documents table from a driver testdata dir."""
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


def read_jsonl_pages(path: str) -> "ray.data.Dataset":
    """Read reference-style JSONL page files (one JSON object per line;
    binary html is base64 in a ``html_b64`` field, datetimes ISO-8601 —
    matching the reference's jsonl serializer,
    harvester/fetcher/controller.py:116-136)."""
    ds = ray.data.read_json(path)

    def decode(t: pa.Table) -> pa.Table:
        import base64

        html = [
            base64.b64decode(h) if h else b""
            for h in t["html_b64"].to_pylist()
        ]
        cols = {
            "url": t["url"],
            "warc_ts": t["warc_ts"].cast(pa.timestamp("us")),
            "html": pa.array(html, pa.binary()),
            "text": t["text"],
            "lang": t["lang"],
        }
        return pa.table(cols)

    return ds.map_batches(decode, batch_format="pyarrow")


def write_jsonl_pages(ds: "ray.data.Dataset", out_dir: str) -> None:
    """Write pages as reference-style JSONL (base64 html, ISO dates)."""

    def encode(t: pa.Table) -> pa.Table:
        import base64

        html64 = [
            base64.b64encode(h or b"").decode("ascii")
            for h in t["html"].to_pylist()
        ]
        return pa.table(
            {
                "url": t["url"],
                "warc_ts": pa.array(
                    [x.isoformat() if x is not None else None
                     for x in t["warc_ts"].to_pylist()],
                    pa.string(),
                ),
                "html_b64": pa.array(html64, pa.string()),
                "text": t["text"],
                "lang": t["lang"],
            }
        )

    ds.map_batches(encode, batch_format="pyarrow").write_json(out_dir)
