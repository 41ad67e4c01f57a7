import duckdb
import pyarrow as pa
import pytest

from harvester_ray.functions.text import (
    flatten_tokens,
    hash64,
    hash64_array,
    normalize_sort_text,
    tokenize,
    tokenize_column,
)

CASES = [
    "Hello, World 42!",
    "",
    "   ",
    "the-quick.brown_fox",
    "CJK 中文 mixed emoji \U0001f600 end",
    "a",
    "...!!!",
    "MiXeD CaSe 007 and tabs\tand\nnewlines",
    "café touché Über",
]


def test_tokenize_python_vs_arrow():
    col = pa.array(CASES, pa.string())
    flat, parent = flatten_tokens(tokenize_column(col))
    arrow_per_row = [[] for _ in CASES]
    for tok, p in zip(flat.to_pylist(), parent.to_pylist()):
        arrow_per_row[p].append(tok)
    for s, got in zip(CASES, arrow_per_row):
        assert got == tokenize(s), s


def test_tokenize_python_vs_duckdb():
    con = duckdb.connect()
    for s in CASES:
        (got,) = con.execute(
            "SELECT regexp_extract_all(lower(?), '[a-z0-9]+')", [s]
        ).fetchone()
        assert got == tokenize(s), s


def test_tokenize_parity_on_testdata():
    """Full-corpus parity: Arrow tokenizer vs DuckDB on the real table."""
    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') "
        "FROM '/root/testdata/sf0.001/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    col = pa.array([r[1] for r in rows], pa.string())
    flat, parent = flatten_tokens(tokenize_column(col))
    per_row = [[] for _ in rows]
    for tok, p in zip(flat.to_pylist(), parent.to_pylist()):
        per_row[p].append(tok)
    for (doc_id, text, duck_tokens), mine in zip(rows, per_row):
        assert mine == duck_tokens, doc_id
        assert mine == tokenize(text), doc_id


def test_hash64_stable():
    assert hash64("scan") == hash64("scan")
    assert hash64("scan") != hash64("join")
    got = hash64_array(pa.array(["scan", "join", ""]))
    assert got[0] == hash64("scan")
    assert got[1] == hash64("join")
    assert got[2] == hash64("")


def test_normalize_sort_text():
    # reference parity: harvester/solr_updater.py:561-573 semantics
    assert normalize_sort_text("The  Quick, Brown Fox!") == "quick brown fox"
    assert normalize_sort_text("A Day at the Races") == "day at the races"
    assert normalize_sort_text("An apple") == "apple"
    assert normalize_sort_text("") == "~title unknown"
    assert normalize_sort_text(None) == "~title unknown"
    assert normalize_sort_text("!!!") == "~title unknown"
    assert normalize_sort_text("another day") == "another day"


def test_normalize_sort_text_reference_edges():
    # bare article (no trailing text) maps to the missing sentinel, as
    # in the reference's word-split article drop (solr_updater.py:567-570)
    assert normalize_sort_text("the") == "~title unknown"
    assert normalize_sort_text("A") == "~title unknown"
    assert normalize_sort_text("An!") == "~title unknown"
    # missing_equivalents: 'title unknown' (after normalization) maps
    # to the sentinel (solr_updater.py:571-572)
    assert normalize_sort_text("Title Unknown") == "~title unknown"
    assert normalize_sort_text("The Title Unknown") == "~title unknown"
    # article is a word prefix only, not a substring prefix
    assert normalize_sort_text("theory class") == "theory class"
    assert normalize_sort_text("anchor") == "anchor"


def test_apply_over_unique_preserves_legit_none_mapping():
    """fn mapping a NON-null input to None must yield null at exactly
    those positions — fn(None)'s sentinel fills only input-null rows
    (regression: blanket fill_null overwrote both)."""
    from harvester_ray.functions.text import apply_over_unique

    col = pa.array(["keep", "drop", None, "drop", "keep"])
    fn = lambda v: "SENTINEL" if v is None else (None if v == "drop" else v)
    out = apply_over_unique(col, fn)
    assert out.to_pylist() == ["keep", None, "SENTINEL", None, "keep"]


def test_apply_over_unique_null_through_fn():
    from harvester_ray.functions.text import apply_over_unique

    col = pa.array(["a", None, "b"])
    out = apply_over_unique(col, lambda v: (v or "?") + "!")
    assert out.to_pylist() == ["a!", "?!", "b!"]
    # fn(None) -> None stays None
    out2 = apply_over_unique(col, lambda v: v and v.upper())
    assert out2.to_pylist() == ["A", None, "B"]


def test_lift_fp_exact_fast_and_fallback_agree():
    """_lift_fp_exact: the int64 fast path and the Python-int fallback
    compute the same floor divisions; at magnitudes where the raw int64
    product would wrap, the fallback stays exact (oracle-HUGEINT twin)."""
    import numpy as np

    from harvester_ray.pipelines.fulltext import _SIG_FP, _lift_fp_exact

    # moderate magnitudes -> fast path; verify against pure Python
    df_fg = np.array([1, 7, 250, 10_000], dtype=np.int64)
    df = np.array([3, 7, 1_000, 40_000], dtype=np.int64)
    m = np.array([10, 20, 5_000, 90_000], dtype=np.int64)
    n = 1_000_000
    want = [
        (int(f) * n * _SIG_FP) // (int(d) * int(mm))
        for f, d, mm in zip(df_fg, df, m)
    ]
    assert _lift_fp_exact(df_fg, df, m, n).tolist() == want

    # big corpus: df_fg*n_docs*FP >> 2^63 -> int64 would wrap silently
    n_big = 3_000_000_000  # 3e9 docs
    df_fg = np.array([2_500_000_000], dtype=np.int64)  # common term
    df = np.array([2_900_000_000], dtype=np.int64)
    m = np.array([2_600_000_000], dtype=np.int64)
    assert int(df_fg[0]) * n_big * _SIG_FP > 2**63  # wraps if int64
    got = _lift_fp_exact(df_fg, df, m, n_big)
    assert got.tolist() == [
        (2_500_000_000 * n_big * _SIG_FP) // (2_900_000_000 * 2_600_000_000)
    ]
    assert got[0] > 0
