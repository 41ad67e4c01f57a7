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
