"""Golden-value tests for the reference-parity scalar operators —
mirrors the reference's unit-test style (test/test_solr_updater.py
field sweeps; SURVEY.md §5 pattern 1)."""

from datetime import datetime, timezone

from harvester_ray.functions.reference_ops import (
    dedupe_list,
    find_ark,
    fix_repeated_date,
    get_facet_decades,
    getprop,
    json_field,
    make_datetime,
    setprop,
)


def test_make_datetime():
    assert make_datetime("1999") == datetime(1999, 1, 1, tzinfo=timezone.utc)
    assert make_datetime("1999-03-04") == datetime(1999, 3, 4, tzinfo=timezone.utc)
    assert make_datetime("not a date") is None
    assert make_datetime("") is None
    assert make_datetime(None) is None
    assert make_datetime(" 2001 ") == datetime(2001, 1, 1, tzinfo=timezone.utc)


def test_facet_decades():
    assert get_facet_decades("1905") == {"1900s"}
    assert get_facet_decades("1899-1911") == {"1890s", "1900s", "1910s"}
    assert get_facet_decades("circa 1941") == {"1940s"}
    assert get_facet_decades("no year here") == {"unknown"}
    assert get_facet_decades(None) == {"unknown"}
    assert get_facet_decades("12 of 1950") == {"1950s"}


def test_find_ark():
    ids = ["local-9", "ark:/13030/kt8290fj3q", "ark:/99999/other"]
    assert find_ark(ids) == "ark:/13030/kt8290fj3q"
    assert find_ark(["nope"]) is None
    assert find_ark([]) is None
    assert find_ark(None) is None
    # ark must stop at / | or whitespace
    assert find_ark(["http://x/ark:/13030/abc/extra"]) == "ark:/13030/abc"


def test_fix_repeated_date():
    assert fix_repeated_date("1885-1885") == "1885"
    assert fix_repeated_date("1885-1886") == "1885-1886"
    assert fix_repeated_date("about 1900-1900 maybe") == "about 1900 maybe"
    assert fix_repeated_date(None) is None
    assert fix_repeated_date("") == ""


def test_dedupe_list():
    assert dedupe_list(["a", "b", "a", "c", "b"]) == ["a", "b", "c"]
    assert dedupe_list([{"name": "x"}, {"name": "x"}, {"name": "y"}]) == [
        {"name": "x"},
        {"name": "y"},
    ]
    assert dedupe_list([]) == []
    assert dedupe_list(None) == []


def test_json_field():
    assert json_field('{"k": 69}', "k") == 69
    assert json_field('{"k": {"n": 1}}', "k") == {"n": 1}
    assert json_field("not json", "k") is None
    assert json_field(None, "k") is None
    assert json_field("[1,2]", "k") is None


def test_get_set_prop():
    d = {"a": {"b": {"c": 1}}}
    assert getprop(d, "a/b/c") == 1
    assert getprop(d, "a/x", "dflt") == "dflt"
    setprop(d, "a/b/d", 2)
    assert d["a"]["b"]["d"] == 2
    setprop(d, "new/path", 3)
    assert d["new"]["path"] == 3


def test_dejson_recursive():
    from harvester_ray.functions.reference_ops import dejson, unpack_if_json

    # reference semantics, solr_updater.py:137-180
    assert dejson('{"name": "flat"}') == "flat"
    assert dejson('{"other": 1}') == '{"other": 1}'  # no name key
    assert dejson({"item": "i", "name": "n"}) == "i"  # item wins
    assert dejson({"name": "n", "text": "t"}) == "n"  # then name
    assert dejson({"text": "t"}) == "t"
    assert dejson({"x": 1}) == {"x": 1}  # nothing to flatten
    assert dejson(["a", '{"name": "b"}', {"text": "c"}]) == ["a", "b", "c"]
    assert dejson([["nested", {"name": "d"}]]) == [["nested", "d"]]
    assert dejson("") == ""
    assert dejson(None) is None
    assert unpack_if_json("not json") == "not json"
    assert unpack_if_json("[1, 2]") == "[1, 2]"  # json but not dict


def test_unpack_date_and_map_date():
    from datetime import datetime, timezone

    from harvester_ray.functions.reference_ops import map_date, unpack_date

    # solr_updater.py:228-299 semantics
    assert unpack_date(None) == (None, None, None)
    assert unpack_date([]) == (None, None, None)
    d, s, e = unpack_date({"displayDate": "1905", "begin": "1905", "end": "1906"})
    assert d == ["1905"]
    assert s == [datetime(1905, 1, 1, tzinfo=timezone.utc)]
    assert e == [datetime(1906, 1, 1, tzinfo=timezone.utc)]
    d, s, e = unpack_date(["1999", {"displayDate": "c. 2000", "begin": "2000-05-01"}])
    assert d == ["1999", "c. 2000"]
    assert s == [datetime(2000, 5, 1, tzinfo=timezone.utc)] and e == []

    assert map_date({}) == {}
    m = map_date({"date": [{"displayDate": "x", "begin": "1930"},
                           {"displayDate": "y", "begin": "1920", "end": "1925"}]})
    assert m["date"] == ["x", "y"]
    # earliest start wins; end backfilled from the sorted ends
    assert m["sort_date_start"] == datetime(1920, 1, 1, tzinfo=timezone.utc)
    assert m["sort_date_end"] == datetime(1925, 1, 1, tzinfo=timezone.utc)
    m = map_date({"date": {"displayDate": "z", "end": "1940"}})
    # only end -> start backfilled from end
    assert m["sort_date_start"] == m["sort_date_end"]


def test_normalize_type():
    from harvester_ray.functions.reference_ops import normalize_type

    # solr_updater.py:388-418
    assert normalize_type("text") == "text"
    assert normalize_type("Physical Object thing") == "physical object"
    assert normalize_type("MOVING picture") == "moving image"
    assert normalize_type("weird") == "weird"  # kept for facets
    assert normalize_type(["text", "physicalness"]) == ["text", "physical object"]
    assert normalize_type(None) is None


def test_map_registry_data():
    import pytest as _pytest

    from harvester_ray.functions.reference_ops import (
        OldCollectionException,
        map_registry_data,
    )

    coll = {
        "@id": "https://registry/api/v1/collection/1",
        "name": "The Test Collection",
        "campus": [{"@id": "https://registry/campus/UCX", "name": "UCX"}],
        "repository": [
            {"@id": "https://registry/repo/9", "name": "Repo Nine",
             "campus": [{"name": "UCX"}]},
        ],
    }
    out = map_registry_data([coll])
    assert out["collection_url"] == ["https://registry/api/v1/collection/1/"]
    assert out["collection_data"] == [
        "https://registry/api/v1/collection/1/::The Test Collection"
    ]
    # single-colon join, article dropped by the sort normalizer
    assert out["sort_collection_data"] == [
        "test collection:The Test Collection:https://registry/api/v1/collection/1/"
    ]
    assert out["repository_data"] == [
        "https://registry/repo/9/::Repo Nine::UCX"
    ]
    assert out["campus_url"] == ["https://registry/campus/UCX/"]
    with _pytest.raises(OldCollectionException):
        map_registry_data([{"@id": "x", "name": "n"}])
    # no campus key when absent
    out2 = map_registry_data(
        [{"@id": "x", "name": "n", "repository": [{"@id": "r", "name": "rn"}]}]
    )
    assert "campus_url" not in out2


def test_setprop_replace():
    import pytest as _pytest

    from harvester_ray.functions.reference_ops import setprop_replace

    d = {"a": {"b": ["x-1", "x-2"]}}
    setprop_replace(d, "a/b", "y", "x")
    assert d["a"]["b"] == ["y-1", "y-2"]
    d = {"a": {"b": "hello x"}}
    setprop_replace(d, "a/b", "world", "x")
    assert d["a"]["b"] == "hello world"
    d = {"a": {"b": "v"}}
    setprop_replace(d, "a/b", "new", None)
    assert d["a"]["b"] == "new"
    with _pytest.raises(KeyError):
        setprop_replace({}, "missing", "v", None)
    assert setprop_replace({}, "missing", "v", None, key_error_as_none=True) is None


def test_q5_matches_duckdb(ray_session):
    """Q5 five-way join vs DuckDB on sf0.001 (value-exact, fixed-point
    revenue)."""
    import duckdb

    from harvester_ray.pipelines.oracles import Q5_REVENUE
    from harvester_ray.pipelines.relational import q5_revenue

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "supplier", "nation",
              "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    want = {
        (r[0], r[1]) for r in con.execute(Q5_REVENUE).fetchall()
    }
    got = {
        (r["n_name"], r["revenue"]) for r in q5_revenue(sf).take_all()
    }
    assert got == want and len(got) > 0


def test_q5_join_fallback_past_guard(ray_session, monkeypatch):
    """With the broadcast guard forced to 0, both dim legs route
    through the hash ds_join path and the result is identical."""
    from harvester_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    want = {
        (r["n_name"], r["revenue"])
        for r in relational.q5_revenue(sf).take_all()
    }
    monkeypatch.setattr(relational, "_BROADCAST_KEYS_GUARD", 0)
    got = {
        (r["n_name"], r["revenue"])
        for r in relational.q5_revenue(sf).take_all()
    }
    assert got == want and len(got) > 0


def test_events_running_total_monotone(ray_session):
    """running_n is 1..k per user in ts order and the final cumsum per
    user equals the user's total fixed-point value."""
    import numpy as np

    from harvester_ray.pipelines.relational import events_running_total

    sf = "/root/testdata/sf0.001"
    df = events_running_total(sf).to_pandas()
    assert df["event_id"].is_unique
    for _, g in df.groupby("user_id"):
        n = np.sort(g["running_n"].to_numpy())
        assert (n == np.arange(1, len(g) + 1)).all()
        assert g["running_value_r4"].max() == g.loc[
            g["running_n"].idxmax(), "running_value_r4"
        ]


def test_orders_rollup_levels_consistent(ray_session):
    """Fine counts fold exactly into the year level and grand total."""
    from harvester_ray.pipelines.relational import orders_rollup

    df = orders_rollup("/root/testdata/sf0.001").to_pandas()
    fine = df[(df["o_year"] != "ALL") & (df["o_orderpriority"] != "ALL")]
    years = df[(df["o_year"] != "ALL") & (df["o_orderpriority"] == "ALL")]
    total = df[(df["o_year"] == "ALL") & (df["o_orderpriority"] == "ALL")]
    assert len(total) == 1
    assert total["n_orders"].iloc[0] == fine["n_orders"].sum()
    for _, r in years.iterrows():
        assert (
            r["n_orders"]
            == fine.loc[fine["o_year"] == r["o_year"], "n_orders"].sum()
        )


def test_events_interarrival_one_first_per_user(ray_session):
    from harvester_ray.pipelines.relational import events_interarrival

    df = events_interarrival("/root/testdata/sf0.001").to_pandas()
    assert df["event_id"].is_unique
    firsts = df[df["gap_us"] == -1]
    assert len(firsts) == df["user_id"].nunique()
    assert (df.loc[df["gap_us"] != -1, "gap_us"] >= 0).all()


def test_funnel_monotone_and_retention_covers_users(ray_session):
    """Funnel stage counts are non-increasing with stage; retention's
    offset-0 cell of each cohort counts every user of that cohort
    exactly once across cohorts (each user belongs to one cohort)."""
    import duckdb

    from harvester_ray.pipelines.relational import (
        funnel_counts,
        retention_cohorts,
    )

    sf = "/root/testdata/sf0.001"
    f = funnel_counts(sf).to_pandas().sort_values("stage")
    assert (f["n_users"].diff().dropna() <= 0).all()
    r = retention_cohorts(sf).to_pandas()
    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{sf}/events.parquet'"
    ).fetchone()[0]
    zero = r[r.offset_days == 0]
    assert int(zero["n_users"].sum()) == n_users
    assert (r["n_users"] > 0).all()


def test_ed_le1_kernel():
    """The vectorized edit-distance<=1 verify: exact on equal strings,
    substitutions, end/middle deletions, and rejects distance-2."""
    import numpy as np

    from harvester_ray.pipelines.relational import _char_matrix, _ed_le1

    pairs = [
        ("cold widget", "cold widget", True),   # equal
        ("cold widget", "cold widgex", True),   # subst last
        ("xold widget", "cold widget", True),   # subst first
        ("old widget", "cold widget", True),    # delete first
        ("cold widge", "cold widget", True),    # delete last
        ("cold idget", "cold widget", True),    # delete middle
        ("cold widget", "cold gadget", False),  # distance 2
        ("co widget", "cold widget", False),    # delete 2
        ("dold widgex", "cold widget", False),  # subst 2
        ("", "x", True),
        ("", "xy", False),
    ]
    a, la = _char_matrix([p[0] for p in pairs])
    b, lb = _char_matrix([p[1] for p in pairs])
    L = max(a.shape[1], b.shape[1])
    a = np.pad(a, ((0, 0), (0, L - a.shape[1])))
    b = np.pad(b, ((0, 0), (0, L - b.shape[1])))
    got = _ed_le1(a, b, la, lb)
    assert got.tolist() == [p[2] for p in pairs]
