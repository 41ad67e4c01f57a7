"""Multimodal column plumbing.

The reference never stores binary media on the record — images are
fetched, md5-keyed and stashed to S3 with only (object md5, dimensions)
written back (harvester/image_harvest.py:106-165,222-232). This module
reproduces that shape for a training-data pipeline: media as an opaque
``binary`` column + typed metadata, processed by an actor-pool decode /
feature-extract stage with small batches (binary rows are large).

The actual image/audio decode libraries are NOT in this container, so
``RealDecoder`` is an explicitly marked stub (NotImplementedError); the
Ray-side plumbing — schema, batch sizing, actor signature, output
layout — is real and tested with ``FakeDecoder`` (a deterministic
byte-statistics "decoder").
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import ray.data

from harvester_ray.config import stage_concurrency


def synthesize_payloads(sf_dir: str) -> "ray.data.Dataset":
    """Derive a deterministic opaque binary payload column from the
    documents table (no external data): payload = utf-8 bytes of text;
    media_type round-robins by doc_id."""
    types = ("image/fake", "audio/fake", "video/fake")

    def make(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = [(s or "").encode("utf-8") for s in t["text"].to_pylist()]
        mt = [types[int(i) % 3] for i in ids]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "media_type": pa.array(mt, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(make, batch_format="pyarrow")


class RealDecoder:
    """The production decode stage — requires PIL/ffmpeg-class libs that
    are not installed here. Kept as the documented extension point."""

    def __init__(self):
        raise NotImplementedError(
            "media decode libraries are not available in this environment; "
            "use FakeDecoder for the pipeline plumbing"
        )


class FakeDecoder:
    """Deterministic stand-in decoder: emits byte-statistics 'features'
    with the same output schema the real decoder would produce.
    Actor-pool stage — state (the 'model') loads once per actor."""

    def __init__(self, feature_dim: int = 8):
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        dims_w, dims_h, feats, hashes = [], [], [], []
        for payload in batch["payload"].to_pylist():
            payload = payload or b""
            digest = hashlib.blake2b(payload, digest_size=8).digest()
            h = int.from_bytes(digest, "big")
            dims_w.append(64 + h % 512)           # fake "width"
            dims_h.append(64 + (h >> 16) % 512)   # fake "height"
            arr = np.frombuffer(payload, dtype=np.uint8)
            if len(arr) == 0:
                arr = np.zeros(1, dtype=np.uint8)
            chunks = np.array_split(arr, self.feature_dim)
            feats.append([round(float(c.mean()), 6) if len(c) else 0.0 for c in chunks])
            hashes.append(h - (1 << 63))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_type": batch["media_type"],
                "n_bytes": pa.array(
                    [len(p or b"") for p in batch["payload"].to_pylist()],
                    pa.int64(),
                ),
                "payload_hash": pa.array(hashes, pa.int64()),
                "width": pa.array(dims_w, pa.int64()),
                "height": pa.array(dims_h, pa.int64()),
                "features": pa.array(feats, pa.list_(pa.float64())),
            }
        )


def multimodal_features(sf_dir: str) -> "ray.data.Dataset":
    """The end-to-end multimodal plumbing pipeline: synthesize payloads
    → actor-pool decode (small batches: binary rows are wide) →
    feature rows. Rows-only correctness (no SQL analog)."""
    payloads = synthesize_payloads(sf_dir)
    return payloads.map_batches(
        FakeDecoder,
        batch_format="pyarrow",
        batch_size=64,       # wide binary rows -> small batches
        concurrency=stage_concurrency(),
    )
