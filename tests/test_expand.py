"""Dictionary-expansion operators (index/expand.py): vectorized edit-
distance kernels vs a pure-Python reference, and the prefix / fuzzy /
suggestion pipelines over a hand-built corpus."""

import numpy as np
import pyarrow as pa
import ray.data

from harvester_ray.index.build import build_index
from harvester_ray.index.expand import (
    _padded_matrix,
    best_suggestions,
    fuzzy_expansions,
    levenshtein_batch,
    prefix_expansions,
    within_edit1_mask,
)


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def test_edit_kernels_match_reference():
    import random

    rng = random.Random(11)
    words = sorted(
        {
            "".join(rng.choice("ab0") for _ in range(rng.randint(1, 6)))
            for _ in range(400)
        }
    )
    mat, lens = _padded_matrix(words)
    for q in ["a", "ab", "ab0", "abab", "0b0b0", "zzz", "b"]:
        ref = np.array([_lev(w, q) for w in words])
        assert (levenshtein_batch(mat, lens, q) == ref).all()
        assert (within_edit1_mask(mat, lens, q) == (ref <= 1)).all()


DOCS = pa.table(
    {
        "doc_id": [1, 2, 3, 4],
        "text": [
            "scan scan join",
            "scant scab merge",
            "join order",
            "scan order merge",
        ],
    }
)


def _dict_ds(tmp_path, ray_session):
    out = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(DOCS), out, n_docs=4)
    from harvester_ray.index.build import IndexPaths

    return ray.data.read_parquet(
        IndexPaths(out).dictionary, columns=["term", "df", "cf"]
    )


def test_prefix_expansions_cap_and_order(tmp_path, ray_session):
    dict_ds = _dict_ds(tmp_path, ray_session)
    exp = prefix_expansions(dict_ds, [(0, "sca"), (1, "j"), (2, "zz")], cap=2)
    by_q = exp.groupby("query_id")["term"].apply(sorted).to_dict()
    # sca* = scan(df2) scant(df1) scab(df1): cap 2 keeps df-desc,
    # term-asc -> scan, scab
    assert by_q[0] == ["scab", "scan"]
    assert by_q[1] == ["join"]
    assert 2 not in by_q  # OOV prefix expands to nothing


def test_fuzzy_expansions_union(tmp_path, ray_session):
    dict_ds = _dict_ds(tmp_path, ray_session)
    exp = fuzzy_expansions(dict_ds, [(0, "scan ordr"), (1, "scanx"), (2, "qq")])
    by_q = exp.groupby("query_id")["term"].apply(sorted).to_dict()
    # scan: scan (0), scant/scab (1); ordr: order (1)
    assert by_q[0] == ["order", "scab", "scan", "scant"]
    assert by_q[1] == ["scan", "scant"]  # scanx: ins-1 of scan, sub of scant
    assert 2 not in by_q


def test_best_suggestions(tmp_path, ray_session):
    dict_ds = _dict_ds(tmp_path, ray_session)
    out = best_suggestions(
        dict_ds, [(0, "scam"), (1, "merg"), (2, "zzzzz")], max_dist=2
    ).to_pylist()
    by_q = {r["query_id"]: r for r in out}
    # scam: scan/scab both dist 1 -> cf breaks the tie (scan cf=3)
    assert by_q[0]["suggestion"] == "scan" and by_q[0]["dist"] == 1
    assert by_q[1]["suggestion"] == "merge" and by_q[1]["dist"] == 1
    assert 2 not in by_q
