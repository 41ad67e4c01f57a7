"""In-process replica of the driver's correctness gate at sf0.001:
every oracle-checked queries() entry must match its DuckDB oracle on
row count, column names and order-insensitive values. (The driver runs
the same comparison at sf0.01; scripts/check_correctness.py runs it
standalone.)"""

import os

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c


def _oracle_items():
    import __ray_entry__ as e

    sqls = e.oracle_sql()
    return sorted(sqls.keys())


@pytest.mark.parametrize("name", _oracle_items())
def test_query_matches_oracle(name, con, ray_session):
    import __ray_entry__ as e

    mine = _canon(_to_pandas(e.queries()[name](SF)))
    want = _canon(con.execute(e.oracle_sql()[name]).fetchdf())
    assert list(mine.columns) == list(want.columns), (
        f"{name}: columns {list(mine.columns)} != {list(want.columns)}"
    )
    assert len(mine) == len(want), f"{name}: rows {len(mine)} != {len(want)}"
    pd.testing.assert_frame_equal(mine, want, check_dtype=False, atol=1e-9)


def test_rows_only_entries_return_rows(ray_session):
    """Smoke every non-oracled entry (the driver's weaker check)."""
    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    for name, fn in qs.items():
        if name in sqls or name == "pages_flagship":
            continue  # oracled above; flagship covered by its own test
        df = _to_pandas(fn(SF))
        assert df is not None and len(df) >= 0, name


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    df = _to_pandas(e.entry())
    assert len(df) > 0
    assert set(df.columns) == {"query_id", "rank", "doc_id"}


def test_q3_join_fallback_matches_broadcast(ray_session, monkeypatch):
    """q3's guarded broadcast semi-join and its Dataset.join fallback
    must produce identical results (the guard only changes the
    physical plan)."""
    import pandas as pd

    from harvester_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    via_broadcast = (
        relational.q3_top_orders(sf).to_pandas().reset_index(drop=True)
    )
    monkeypatch.setattr(relational, "_BROADCAST_KEYS_GUARD", 0)
    via_join = relational.q3_top_orders(sf).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(via_broadcast, via_join)


def test_sample_documents_negative_ids_match_oracle(tmp_path, ray_session):
    """Regression: numpy %% is floored (non-negative) while SQL %% takes
    the dividend's sign — signed doc_ids hashed differently on the two
    sides until both abs() first. Crafted corpus with negative ids."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from harvester_ray.pipelines import oracles
    from harvester_ray.pipelines.relational import sample_documents

    rng = np.random.RandomState(7)
    ids = rng.randint(-(2**62), 2**62, size=4000, dtype=np.int64)
    ids = np.unique(ids)
    assert (ids < 0).any() and (ids > 0).any()
    path = tmp_path / "documents.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids),
                "lang": pa.array(["en"] * len(ids)),
                "n_chars": pa.array(np.abs(ids) % 1000),
            }
        ),
        str(path),
    )
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    mine = _canon(sample_documents(str(tmp_path)).to_pandas())
    want = _canon(c.execute(oracles.SAMPLE_DOCUMENTS).fetchdf())
    assert len(mine) > 0, "crafted sample should be non-empty"
    assert (mine["doc_id"] < 0).any(), "negative ids must be sampleable"
    pd.testing.assert_frame_equal(mine, want, check_dtype=False)


def test_driver_window_spans_families():
    """The driver records correctness for the FIRST 50 queries() keys
    only.  That window must (a) match the curated per-family list, (b)
    hold exactly one designated rows-only representative (the
    incremental re-crawl family has no SQL analog), and (c) past the
    window, keep every oracled entry BEFORE the rows-only tail so a
    slow rows-only entry can never starve a hash-gated one (the
    round-2 driver run stopped mid-list)."""
    import __ray_entry__ as e

    names = list(e.queries().keys())
    oracled = set(e.oracle_sql().keys())

    window = names[: len(e._DRIVER_WINDOW)]
    assert window == e._DRIVER_WINDOW
    assert len(window) == 50, len(window)
    rows_only_in_window = [n for n in window if n not in oracled]
    assert rows_only_in_window == ["pages_recrawl_sync"], rows_only_in_window

    tail = names[len(window):]
    first_rows_only = next(
        (i for i, n in enumerate(tail) if n not in oracled), len(tail)
    )
    late_oracled = [n for n in tail[first_rows_only:] if n in oracled]
    assert late_oracled == [], (
        f"oracled entries after the rows-only family: {late_oracled}"
    )


def test_value_outliers_wide_domain_matches_hugeint_twin(
    tmp_path, ray_session
):
    """A value domain whose r4 fixed-point sums overflow int64 used to
    raise NotImplementedError; value_outliers now falls back to exact
    arbitrary-precision arithmetic per batch and must stay
    bit-identical to the DuckDB HUGEINT oracle (round-4 VERDICT task
    4). The crafted domain trips BOTH wide paths: the per-batch sumsq
    AND the per-row |vfp*n - s| product."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from harvester_ray.pipelines.oracles import VALUE_OUTLIERS
    from harvester_ray.pipelines.relational import value_outliers

    rng = np.random.RandomState(5)
    n = 100
    vals = rng.uniform(0.9e10, 1.1e10, size=n)
    vals[7] = 5.0e12  # the outlier; vfp*n ~ 5e18 > 2^62
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "value": pa.array(vals, pa.float64()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = _canon(value_outliers(str(tmp_path)).to_pandas())
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    want = _canon(c.execute(VALUE_OUTLIERS).fetchdf())
    assert len(got) >= 1  # the planted outlier is flagged
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
