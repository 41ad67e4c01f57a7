import numpy as np
import pytest

from harvester_ray.functions.codec import varint_decode, varint_encode


def test_roundtrip_small():
    vals = np.array([0, 1, 127, 128, 129, 300, 2**14 - 1, 2**14, 2**21], np.uint64)
    assert list(varint_decode(varint_encode(vals))) == list(vals)


def test_roundtrip_empty():
    assert varint_encode(np.empty(0, np.uint64)) == b""
    assert len(varint_decode(b"")) == 0


def test_roundtrip_u64_extremes():
    vals = np.array([2**63, 2**64 - 1, 0, 2**32, 2**63 - 1], np.uint64)
    assert list(varint_decode(varint_encode(vals))) == list(vals)


def test_roundtrip_random():
    rng = np.random.default_rng(42)
    for scale in (1 << 7, 1 << 20, 1 << 40, 1 << 63):
        vals = rng.integers(0, scale, size=5000, dtype=np.uint64)
        out = varint_decode(varint_encode(vals))
        np.testing.assert_array_equal(out, vals)


def test_known_encoding():
    # LEB128: 300 = 0b100101100 -> AC 02
    assert varint_encode(np.array([300], np.uint64)) == b"\xac\x02"
    assert varint_encode(np.array([1], np.uint64)) == b"\x01"


def test_signed_deltas_roundtrip_via_view():
    ids = np.sort(np.random.default_rng(7).integers(-(2**62), 2**62, 100, np.int64))
    gaps = np.empty(len(ids), np.uint64)
    gaps[0] = 0
    np.subtract(ids[1:], ids[:-1], out=gaps[1:], casting="unsafe")
    back = varint_decode(varint_encode(gaps)).view(np.int64).cumsum() + ids[0]
    np.testing.assert_array_equal(back, ids)
