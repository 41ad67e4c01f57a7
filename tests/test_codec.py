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


def test_bitpack_roundtrip():
    import numpy as np

    from harvester_ray.functions.codec import bitpack_decode, bitpack_encode

    rng = np.random.default_rng(0)
    cases = [
        np.array([], dtype=np.uint64),
        np.zeros(7, dtype=np.uint64),
        np.array([1], dtype=np.uint64),
        rng.integers(0, 2**7, 128).astype(np.uint64),
        rng.integers(0, 2**33, 128).astype(np.uint64),
        np.array([0, 2**63, 2**64 - 1], dtype=np.uint64),
    ]
    for v in cases:
        buf = bitpack_encode(v)
        assert np.array_equal(bitpack_decode(buf), v)
    # FOR packing is tighter than varint on uniform-width blocks
    from harvester_ray.functions.codec import varint_encode

    wide = rng.integers(2**20, 2**21, 128).astype(np.uint64)
    assert len(bitpack_encode(wide)) < len(varint_encode(wide))


def test_for_codec_index_rank_identical(tmp_path, ray_session):
    """An index built with the FOR bit-packed codec serves results
    rank+score-identical to the varint index on the same corpus,
    across dense OR / AND / WAND paths."""
    import ray.data

    from harvester_ray.config import IndexConfig
    from harvester_ray.corpus import generate_zipf_docs
    from harvester_ray.index.build import build_index
    from harvester_ray.index.query import InvertedIndex

    docs = generate_zipf_docs(300, vocab_size=400, mean_len=40, seed=13)
    idx = {}
    for codec in ("varint", "for", "pfor"):
        out = str(tmp_path / f"idx_{codec}")
        build_index(
            ray.data.from_arrow(docs), out,
            IndexConfig(codec=codec), n_docs=len(docs),
        )
        idx[codec] = InvertedIndex(out, preload=True)
    assert idx["for"].stats["codec"] == "for"
    assert idx["pfor"].stats["codec"] == "pfor"
    for q, mode, algo in [
        ("w0 w1", "or", "auto"),
        ("w0 w1", "or", "wand"),
        ("w5 w55", "and", "auto"),
        ("w3 w33 w333", "or", "wand"),
    ]:
        a = idx["varint"].search(q, k=10, mode=mode, algorithm=algo)
        b = idx["for"].search(q, k=10, mode=mode, algorithm=algo)
        c = idx["pfor"].search(q, k=10, mode=mode, algorithm=algo)
        assert a == b == c, (q, mode, algo)


def test_codec_property_roundtrips():
    """Hypothesis: arbitrary uint64 arrays round-trip through BOTH
    codecs, and varint offsets slice-decode consistently."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from harvester_ray.functions.codec import (
        bitpack_decode,
        bitpack_encode,
        varint_decode,
        varint_encode_offsets,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=2**64 - 1), max_size=300
        )
    )
    def check(vals):
        v = np.array(vals, dtype=np.uint64)
        buf, ends = varint_encode_offsets(v)
        assert np.array_equal(varint_decode(buf), v)
        if len(v):
            assert int(ends[-1]) == len(buf)
            # any prefix slices out the prefix values
            k = len(v) // 2
            if k:
                assert np.array_equal(
                    varint_decode(buf[: ends[k - 1]]), v[:k]
                )
        assert np.array_equal(bitpack_decode(bitpack_encode(v)), v)

    check()


def test_pfor_property_roundtrip():
    """Hypothesis: arbitrary uint64 arrays round-trip through pfor, and
    pfor beats plain FOR on outlier-skewed blocks."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from harvester_ray.functions.codec import (
        bitpack_encode,
        pfor_decode,
        pfor_encode,
    )

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=2**64 - 1),
            min_size=0,
            max_size=300,
        )
    )
    def check(xs):
        v = np.array(xs, dtype=np.uint64)
        assert np.array_equal(pfor_decode(pfor_encode(v)), v)

    check()

    rng = np.random.default_rng(11)
    skewed = np.concatenate(
        [rng.integers(0, 16, 120), rng.integers(1 << 40, 1 << 50, 8)]
    ).astype(np.uint64)
    assert len(pfor_encode(skewed)) < len(bitpack_encode(skewed))
