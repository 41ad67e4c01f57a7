"""Query-language parser + boolean executor: equivalence to the
primitive search paths (which are themselves DuckDB-oracled) and
brute-force checks for the mixed clauses."""

import duckdb
import numpy as np
import pytest

from harvester_ray.functions.text import tokenize
from harvester_ray.index.query import InvertedIndex
from harvester_ray.index.queryparse import parse_query, search_boolean

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_parse_clause_classification():
    p = parse_query('+scan -merge "key value" join table')
    assert p.must == ["scan"]
    assert p.must_not == ["merge"]
    assert p.phrases == ["key value"]
    assert p.should == ["join", "table"]


def test_parse_negated_phrase_rejected():
    with pytest.raises(ValueError):
        parse_query('-"scan join"')


def test_parse_empty():
    p = parse_query("")
    assert not (p.should or p.must or p.must_not or p.phrases)


@pytest.mark.parametrize("preload", [True, False])
def test_should_only_equals_or(built_index, preload):
    idx = InvertedIndex(built_index.root, preload=preload)
    got = search_boolean(idx, parse_query("scan join"), k=10)
    want = idx.search("scan join", k=10, mode="or")
    assert got == want


@pytest.mark.parametrize("preload", [True, False])
def test_must_only_equals_and(built_index, preload):
    idx = InvertedIndex(built_index.root, preload=preload)
    got = search_boolean(idx, parse_query("+scan +join"), k=10)
    want = idx.search("scan join", k=10, mode="and")
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)


def test_not_equals_exclude(built_index):
    idx = InvertedIndex(built_index.root, preload=True)
    got = search_boolean(idx, parse_query("scan join -merge"), k=10)
    want = idx.search("scan join", k=10, mode="or", exclude="merge")
    assert got == want


def test_mixed_must_should_matches_brute_force(built_index):
    """+scan dup: docs must contain 'scan'; score sums scan+dup
    contributions. Brute-force from the raw corpus."""
    idx = InvertedIndex(built_index.root, preload=True)
    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{DOCS}'"
    ).fetchall()
    with_scan = {d for d, t in rows if "scan" in tokenize(t)}
    base = idx.search("dup scan", k=len(rows), mode="or")
    want = [(d, s) for d, s in base if d in with_scan][:10]
    got = search_boolean(idx, parse_query("+scan dup"), k=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)


def test_allowed_set_masks(built_index):
    idx = InvertedIndex(built_index.root, preload=True)
    base = idx.search("scan join", k=100, mode="or")
    allowed = np.array(sorted(d for d, _ in base[::2]), dtype=np.int64)
    got = search_boolean(
        idx, parse_query("scan join"), k=100, allowed=allowed
    )
    assert {d for d, _ in got} <= set(allowed.tolist())
    assert [d for d, _ in got] == [
        d for d, _ in base if d in set(allowed.tolist())
    ][:100]
    # empty allowed set -> no hits
    assert (
        search_boolean(
            idx,
            parse_query("scan join"),
            k=10,
            allowed=np.array([], dtype=np.int64),
        )
        == []
    )


def test_oov_must_empty(built_index):
    idx = InvertedIndex(built_index.root, preload=True)
    assert search_boolean(idx, parse_query("the a +zzzq"), k=10) == []


def test_dense_sparse_agree_mixed(built_index):
    dense = InvertedIndex(built_index.root, preload=True)
    sparse = InvertedIndex(built_index.root, preload=False)
    for q in ["+scan dup -merge", "scan join", "+dup +sort the"]:
        p = parse_query(q)
        assert [d for d, _ in search_boolean(dense, p, k=10)] == [
            d for d, _ in search_boolean(sparse, p, k=10)
        ]


def test_dense_sparse_agree_with_cursor(built_index):
    """The search-after cursor applies on BOTH executor paths (the
    sparse path used to drop it)."""
    dense = InvertedIndex(built_index.root, preload=True)
    sparse = InvertedIndex(built_index.root, preload=False)
    p = parse_query("+scan dup")
    last = search_boolean(dense, p, k=5)[-1]
    cur = (last[1], last[0])
    got_d = search_boolean(dense, p, k=5, after=cur)
    got_s = search_boolean(sparse, p, k=5, after=cur)
    assert got_d, "expected a second page"
    assert [d for d, _ in got_d] == [d for d, _ in got_s]
    assert last[0] not in {d for d, _ in got_d}


# ── round-4 grammar extensions: groups, boosts, field filters ────────


def test_parse_groups_and_boosts():
    p = parse_query('+(scan merge) (a OR b) c^2 -d')
    assert p.must_groups == [["scan", "merge"]]
    assert p.should == ["a", "b", "c"]   # unsigned group flattens
    assert p.must_not == ["d"]
    assert p.boosts == {"c": 2.0}


def test_parse_negated_group_flattens():
    p = parse_query("-(a b) c")
    assert p.must_not == ["a", "b"]
    assert p.should == ["c"]
    assert p.must_groups == []


def test_parse_field_clauses():
    p = parse_query("scan lang:en -source:src3 n_chars:[150 TO 350]")
    assert p.should == ["scan"]
    eq, neq, rng = p.filters
    assert (eq.field, eq.lo, eq.hi, eq.negated) == ("lang", "en", None, False)
    assert (neq.field, neq.lo, neq.negated) == ("source", "src3", True)
    assert (rng.field, rng.lo, rng.hi) == ("n_chars", "150", "350")
    assert rng.is_range and rng.is_numeric and not eq.is_numeric


def test_parse_group_errors():
    with pytest.raises(ValueError, match="nested group"):
        parse_query("((a b) c)")
    with pytest.raises(ValueError, match="bare words only"):
        parse_query("(+a b)")
    with pytest.raises(ValueError, match="bare words only"):
        parse_query('(lang:en b)')
    with pytest.raises(ValueError, match="without a value"):
        parse_query("lang:")
    # OR as separator and empty group are no-ops
    p = parse_query("a OR b ()")
    assert p.should == ["a", "b"]


def test_must_group_requires_one_member(built_index):
    idx = InvertedIndex(built_index.root, preload=True)
    got = search_boolean(idx, parse_query("+(scan merge) the"), k=50)
    # every hit contains scan or merge
    sc = {d for d, _ in search_boolean(idx, parse_query("scan"), k=10**6)}
    mg = {d for d, _ in search_boolean(idx, parse_query("merge"), k=10**6)}
    assert got and all(d in (sc | mg) for d, _ in got)
    # an all-OOV group matches nothing
    assert search_boolean(idx, parse_query("+(zzzq yyyq) the"), k=10) == []


@pytest.mark.parametrize("preload", [True, False])
def test_boost_reorders_toward_boosted_term(built_index, preload):
    idx = InvertedIndex(built_index.root, preload=preload)
    plain = search_boolean(idx, parse_query("scan merge"), k=10**6)
    boosted = search_boolean(idx, parse_query("scan^3 merge"), k=10**6)
    assert {d for d, _ in plain} == {d for d, _ in boosted}
    sc = {d for d, _ in search_boolean(idx, parse_query("scan"), k=10**6)}
    ps = dict(plain)
    for d, s in boosted:
        if d in sc:
            assert s > ps[d]  # boosted contribution strictly grew
        else:
            assert s == pytest.approx(ps[d])


def test_group_boost_dense_sparse_agree(built_index):
    dense = InvertedIndex(built_index.root, preload=True)
    sparse = InvertedIndex(built_index.root, preload=False)
    for q in ["+(scan merge) the", "scan^2 merge", "(scan OR dup) -merge"]:
        p = parse_query(q)
        assert [d for d, _ in search_boolean(dense, p, k=20)] == [
            d for d, _ in search_boolean(sparse, p, k=20)
        ], q


def test_sub_one_boost_downweights(built_index):
    """A boost below 1.0 must actually downweight (the max-with-1.0
    seeding bug silently clamped it)."""
    idx = InvertedIndex(built_index.root, preload=True)
    plain = dict(search_boolean(idx, parse_query("scan merge"), k=10**6))
    down = dict(search_boolean(idx, parse_query("scan^0.5 merge"), k=10**6))
    sc = {d for d, _ in search_boolean(idx, parse_query("scan"), k=10**6)}
    assert down.keys() == plain.keys()
    hit = [d for d in down if d in sc]
    assert hit and all(down[d] < plain[d] for d in hit)
    assert all(down[d] == pytest.approx(plain[d]) for d in down if d not in sc)


def test_negated_boosted_term_strips_boost():
    """'-scan^2' negates 'scan' — the '^2' must not leak a spurious
    negated token '2'."""
    p = parse_query("join -scan^2")
    assert p.must_not == ["scan"]
    assert p.boosts == {}
    assert p.should == ["join"]


def test_empty_token_group_matches_nothing(built_index):
    """A must-group whose words tokenize to nothing can never be
    satisfied — no hits on either executor path (the SQL compiler
    mirrors this by emitting no rows for such a query)."""
    for preload in (True, False):
        idx = InvertedIndex(built_index.root, preload=preload)
        assert search_boolean(idx, parse_query("+(???) scan"), k=10) == []
