"""Multimodal column plumbing.

The reference never stores binary media on the record — images are
fetched, md5-keyed and stashed to S3 with only (object md5, dimensions)
written back (harvester/image_harvest.py:106-165,222-232). This module
reproduces that shape for a training-data pipeline: media as an opaque
``binary`` column + typed metadata, processed by an actor-pool decode /
feature-extract stage with small batches (binary rows are large).

``RealDecoder`` decodes images through PIL when it is importable
(optional dependency); in this container the libs are absent, so
``default_decoder()`` auto-selects ``FakeDecoder`` (a deterministic
byte-statistics "decoder" sharing the exact output schema). The
Ray-side plumbing — schema, batch sizing, actor signature, output
layout — is identical either way and tested with the fake.
"""

from __future__ import annotations

import hashlib
import io
import os

import numpy as np
import pyarrow as pa
import ray.data

from harvester_ray.config import stage_concurrency

try:  # optional dependency: real image decode path
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - absent in this container
    _PILImage = None


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


def _byte_features(payload: bytes, dim: int) -> tuple[int, int, int, list]:
    """Deterministic byte-statistics fallback: (payload_hash, width,
    height, features) derived from the raw bytes alone."""
    digest = hashlib.blake2b(payload, digest_size=8).digest()
    h = int.from_bytes(digest, "big")
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) == 0:
        arr = np.zeros(1, dtype=np.uint8)
    chunks = np.array_split(arr, dim)
    feats = [round(float(c.mean()), 6) if len(c) else 0.0 for c in chunks]
    return h - (1 << 63), 64 + h % 512, 64 + (h >> 16) % 512, feats


class FakeDecoder:
    """Deterministic stand-in decoder: emits byte-statistics 'features'
    with the same output schema the real decoder would produce.
    Actor-pool stage — state (the 'model') loads once per actor."""

    def __init__(self, feature_dim: int = 8):
        self.feature_dim = feature_dim

    def _decode_one(self, media_type: str, payload: bytes):
        return _byte_features(payload, self.feature_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        dims_w, dims_h, feats, hashes, sizes = [], [], [], [], []
        for mt, payload in zip(
            batch["media_type"].to_pylist(), batch["payload"].to_pylist()
        ):
            payload = payload or b""
            h, w, ht, f = self._decode_one(mt or "", payload)
            hashes.append(h)
            dims_w.append(w)
            dims_h.append(ht)
            feats.append(f)
            sizes.append(len(payload))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_type": batch["media_type"],
                "n_bytes": pa.array(sizes, pa.int64()),
                "payload_hash": pa.array(hashes, pa.int64()),
                "width": pa.array(dims_w, pa.int64()),
                "height": pa.array(dims_h, pa.int64()),
                "features": pa.array(feats, pa.list_(pa.float64())),
            }
        )


class RealDecoder(FakeDecoder):
    """The production decode stage: images decode through PIL (width,
    height, grayscale grid-mean features); non-image media and
    undecodable payloads fall back to the byte-statistics features so
    the output schema never changes. Requires the optional PIL
    dependency — ``default_decoder()`` auto-selects."""

    def __init__(self, feature_dim: int = 8):
        if _PILImage is None:
            raise NotImplementedError(
                "PIL is not available in this environment; "
                "default_decoder() falls back to FakeDecoder"
            )
        super().__init__(feature_dim)

    def _decode_one(self, media_type: str, payload: bytes):
        if not media_type.startswith("image/"):
            return _byte_features(payload, self.feature_dim)
        try:
            img = _PILImage.open(io.BytesIO(payload))
            w, h = img.size
            gray = np.asarray(
                img.convert("L").resize((self.feature_dim, 1)),
                dtype=np.float64,
            ).reshape(-1)
        except Exception:
            return _byte_features(payload, self.feature_dim)
        digest = hashlib.blake2b(payload, digest_size=8).digest()
        ph = int.from_bytes(digest, "big") - (1 << 63)
        feats = [round(float(v) / 255.0, 6) for v in gray]
        return ph, int(w), int(h), feats


def default_decoder() -> type:
    """RealDecoder when PIL is importable, FakeDecoder otherwise —
    same constructor signature and output schema either way."""
    return FakeDecoder if _PILImage is None else RealDecoder


def multimodal_features(sf_dir: str) -> "ray.data.Dataset":
    """The end-to-end multimodal plumbing pipeline: synthesize payloads
    → actor-pool decode (small batches: binary rows are wide) →
    feature rows. Rows-only correctness (no SQL analog)."""
    payloads = synthesize_payloads(sf_dir)
    return payloads.map_batches(
        default_decoder(),
        batch_format="pyarrow",
        batch_size=64,       # wide binary rows -> small batches
        concurrency=stage_concurrency(),
    )


def multimodal_meta(sf_dir: str) -> "ray.data.Dataset":
    """The DuckDB-oracled twin of ``multimodal_features``: the SAME
    synthesize → actor-pool decode pipeline, projected to the columns
    with an exact SQL analog (media type routing + payload byte size —
    the (md5, dimensions) metadata shape image_harvest.py writes back,
    harvester/image_harvest.py:106-165). Proves the actor plumbing
    (constructor state, batch size, schema) under the value-hash gate;
    the hash/feature columns stay rows-only in multimodal_features."""
    return multimodal_features(sf_dir).map_batches(
        lambda t: t.select(["doc_id", "media_type", "n_bytes"]),
        batch_format="pyarrow",
    )


# video frame-sampling parameters: FRAME_BYTES bytes per synthetic
# frame, keep every FRAME_STRIDE-th frame (fps downsample)
FRAME_BYTES = 32
FRAME_STRIDE = 3


class FrameSampler:
    """Frame-sampling actor stage for video payloads: split the opaque
    payload into fixed-size frames, keep every ``stride``-th one, emit
    one row per sampled frame — the 1→N explode a video pipeline runs
    before per-frame feature extraction. The "decode" is the
    deterministic fixed-window rule (no video libs in this container)
    but the plumbing — actor state in __init__, small wide-row batches,
    explode output layout — is the production shape.
    """

    def __init__(self, frame_bytes: int = FRAME_BYTES,
                 stride: int = FRAME_STRIDE):
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, totals, md5s = [], [], [], []
        fb = self.frame_bytes
        for did, mt, payload in zip(
            batch["doc_id"].to_pylist(),
            batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if not (mt or "").startswith("video/") or not payload:
                continue
            n_frames = (len(payload) + fb - 1) // fb
            for i in range(0, n_frames, self.stride):
                ids.append(did)
                idxs.append(i)
                totals.append(n_frames)
                # fingerprint = md5 of the frame's UPPERCASE HEX: hex
                # is injective, so this pins the exact frame BYTES
                # while staying SQL-expressible for any payload
                # (DuckDB md5 takes VARCHAR only — raw-blob md5 would
                # silently force an ascii-text assumption on the twin)
                md5s.append(
                    hashlib.md5(
                        payload[i * fb:(i + 1) * fb].hex().upper().encode()
                    ).hexdigest()
                )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int64()),
                "n_frames": pa.array(totals, pa.int64()),
                "frame_md5": pa.array(md5s, pa.string()),
            }
        )


def frame_sample(sf_dir: str) -> "ray.data.Dataset":
    """Sampled-frame rows for every video-typed payload:
    (doc_id, frame_idx, n_frames, frame_md5). Actor-pool explode with
    small batches (wide binary rows); frame content is pinned by
    md5-of-hex so the window/stride arithmetic AND the sliced bytes sit
    under the value-hash gate for ANY payload bytes (the SQL twin
    slices to_hex(encode(text)) — exact byte windows even when a frame
    boundary splits a multi-byte character)."""
    return synthesize_payloads(sf_dir).map_batches(
        FrameSampler,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=stage_concurrency(),
    )
