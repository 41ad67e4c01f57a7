"""Cross-engine hash parity: the numpy kernels and the DuckDB SQL
expressions that share a hash must agree on EVERY int64 input — the
property the oracle gate samples only at the fixed corpus ids."""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

ids64 = st.integers(min_value=-(2**62), max_value=2**62)


@settings(max_examples=200, deadline=None)
@given(st.lists(ids64, min_size=1, max_size=50))
def test_seeded_shuffle_hash_parity(xs):
    from harvester_ray.pipelines.relational import (
        _SHUF_A,
        _SHUF_A2,
        _SHUF_B,
        _SHUF_B2,
        _SHUF_P,
        SHUFFLE_SEED,
        _seeded_hash,
    )

    got = _seeded_hash(np.asarray(xs, dtype=np.int64), SHUFFLE_SEED)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(int(x),) for x in xs])
    xm = f"((abs(x) + {SHUFFLE_SEED}) % {_SHUF_P})"
    want = con.execute(
        f"""WITH r1 AS (SELECT ({xm} * {xm} + {_SHUF_A} * {xm}
              + {_SHUF_B}) % {_SHUF_P} AS r FROM t)
        SELECT (r * r + {_SHUF_A2} * r + {_SHUF_B2}) % {_SHUF_P}
        FROM r1"""
    ).fetchnumpy()
    assert (got == list(want.values())[0].astype(np.int64)).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1,
                max_size=50))
def test_hll_hash_parity(xs):
    """user_id >= 0 is the documented domain (np.mod and SQL % differ
    on negatives); bucket AND rank must agree."""
    from harvester_ray.stages.sketches import (
        HLL_M,
        _HASH_A,
        _HASH_A2,
        _HASH_B,
        _HASH_B2,
        _MERSENNE,
        _V_BITS,
        _hll_parts,
    )

    b, r = _hll_parts(np.asarray(xs, dtype=np.int64))
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(int(x),) for x in xs])
    rows = con.execute(
        f"""WITH r1 AS (SELECT ((x % {_MERSENNE}) * (x % {_MERSENNE})
                 + {_HASH_A} * (x % {_MERSENNE}) + {_HASH_B})
                 % {_MERSENNE} AS r FROM t),
        h AS (SELECT (r * r + {_HASH_A2} * r + {_HASH_B2})
                 % {_MERSENNE} AS h FROM r1)
        SELECT h % {HLL_M},
               CASE WHEN h // {HLL_M} = 0 THEN {_V_BITS + 1}
                    ELSE {_V_BITS + 1} - CAST(ceil(log2(h // {HLL_M} + 1))
                                              AS BIGINT) END
        FROM h"""
    ).fetchall()
    wb = np.array([a for a, _ in rows], dtype=np.int64)
    wr = np.array([c for _, c in rows], dtype=np.int64)
    assert (b == wb).all() and (r == wr).all()
