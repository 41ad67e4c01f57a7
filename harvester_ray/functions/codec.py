"""Vectorized varint (LEB128) codec for posting blocks.

The segment format (FIXTURES.md §3) stores per-block ``doc_id_deltas``,
``tfs`` and ``doc_lens`` as unsigned-varint byte strings. Both encode
and decode are numpy-vectorized: the only Python-level loop is over the
byte *width* (≤ 10 for uint64), never over values — this is the hot
path of segment encode (build) and posting decode (query).

Encoding: standard LEB128 — 7 value bits per byte, high bit = continue.
"""

from __future__ import annotations

import numpy as np

_U7 = np.uint64(7)
_U127 = np.uint64(0x7F)


def varint_encode_offsets(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode a uint64-castable ndarray as concatenated LEB128 varints.

    Returns ``(buffer, ends)`` where ``ends[i]`` is the byte offset just
    past value ``i`` — callers can slice the buffer into sub-ranges
    (e.g. per posting block) without re-encoding.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b"", np.empty(0, dtype=np.int64)
    # bytes needed per value
    nb = np.ones(n, dtype=np.int64)
    tmp = v >> _U7
    while tmp.any():
        nb += (tmp > 0).astype(np.int64)
        tmp >>= _U7
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    cur = v.copy()
    k = 0
    while True:
        mask = nb > k
        if not mask.any():
            break
        byte = (cur[mask] & _U127).astype(np.uint8)
        cont = (nb[mask] - 1) > k
        out[starts[mask] + k] = byte | (cont.astype(np.uint8) << 7)
        cur >>= _U7
        k += 1
    return out.tobytes(), ends


def varint_encode(values: np.ndarray) -> bytes:
    """Encode a uint64-castable ndarray as concatenated LEB128 varints."""
    return varint_encode_offsets(values)[0]


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode concatenated LEB128 varints -> uint64 ndarray."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.nonzero((b & 0x80) == 0)[0]
    starts = np.empty(len(ends), dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(len(ends), dtype=np.uint64)
    for k in range(int(lengths.max())):
        m = lengths > k
        vals[m] |= (b[starts[m] + k].astype(np.uint64) & _U127) << np.uint64(7 * k)
    return vals
