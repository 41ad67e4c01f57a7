"""URL kernel + weburls pipeline pins (semantics the value-hash oracle
doesn't state explicitly)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from harvester_ray.functions.urls import (
    canonicalize_urls,
    host_of,
    registrable_domain,
    synth_urls,
)

SF = "/root/testdata/sf0.001"


CANON_VECTORS = [
    # case-fold scheme+host, strip default port, drop fragment,
    # drop utm_*, sort params, strip trailing slash
    (
        "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&z=1&a=2#frag",
        "http://www.example.com/a/b?a=2&z=1",
    ),
    ("https://Host.Org:443/", "https://host.org/"),
    ("https://h.org:8443/x?b=2&a=1", "https://h.org:8443/x?a=1&b=2"),
    ("http://h.net", "http://h.net/"),  # empty path -> '/'
    ("http://h.net/p///", "http://h.net/p"),
    ("http://h.net/p?utm_a=1&utm_b=2", "http://h.net/p"),  # all dropped
    ("http://h.net/p?", "http://h.net/p"),  # empty query drops '?'
    # non-default port on http kept; params already sorted stay put
    ("http://h.net:8080/p?a=1&b=2", "http://h.net:8080/p?a=1&b=2"),
    # https with http's default port: 80 is NOT default for https
    ("https://h.net:80/p", "https://h.net:80/p"),
]


def test_canonicalize_vectors():
    got = canonicalize_urls(
        pa.array([m for m, _ in CANON_VECTORS])
    ).to_pylist()
    assert got == [c for _, c in CANON_VECTORS]


def test_canonicalize_idempotent():
    canon = pa.array([c for _, c in CANON_VECTORS])
    again = canonicalize_urls(canon).to_pylist()
    assert again == canon.to_pylist()


def test_non_url_rows_become_null():
    out = canonicalize_urls(pa.array(["not a url", "", "ftp:/x"]))
    assert out.to_pylist() == [None, None, None]


def test_host_and_domain():
    urls = pa.array(
        ["HTTP://WWW.A.B.Example.COM:8080/x", "https://solo/x"]
    )
    hosts = host_of(urls)
    assert hosts.to_pylist() == ["www.a.b.example.com", "solo"]
    assert registrable_domain(hosts).to_pylist() == ["example.com", "solo"]


def test_synth_urls_deterministic_and_messy():
    d = pa.array(list(range(100)), pa.int64())
    s = pa.array(["src%d" % (i % 20) for i in range(100)])
    u1 = synth_urls(d, s).to_pylist()
    u2 = synth_urls(d, s).to_pylist()
    assert u1 == u2
    # every canonical-rule clause is exercised somewhere in the stream
    assert any(":80/" in u or ":443/" in u for u in u1)  # default ports
    assert any(":8080/" in u for u in u1)  # non-default port
    assert any("utm_source=" in u for u in u1)
    assert any("#section-2" in u for u in u1)
    assert any("/?" in u for u in u1)  # trailing slash before query
    assert any(c.isupper() for u in u1 for c in u)


def test_url_dedup_latest_properties(ray_session):
    from harvester_ray.pipelines import weburls

    dd = weburls.url_dedup_latest(SF).to_pandas()
    cc = weburls.url_canonical(SF).to_pandas()
    # snapshot counts cover the corpus exactly once
    assert int(dd.n_snapshots.sum()) == len(cc)
    # every winner doc maps to its own canonical url
    m = dict(zip(cc.doc_id, cc.url_canon))
    assert all(m[r.doc_id] == r.url_canon for r in dd.itertuples())


def test_domain_profile_folds_hosts(ray_session):
    from harvester_ray.pipelines import weburls

    dp = weburls.domain_profile(SF).to_pandas()
    assert (dp.n_hosts >= 1).all() and (dp.n_hosts <= 4).all()
    assert dp.n_docs.sum() == len(
        weburls.url_canonical(SF).to_pandas()
    )


def test_pagerank_conserves_and_favors_indegree(ray_session):
    """Rank mass stays ~FP (floor-division leakage only: each doc
    loses <3 units at the split and <100 at the damping) and every
    rank is at least the teleport floor."""
    from harvester_ray.pipelines.weburls import PR_FP, pagerank_fixed

    t = pagerank_fixed(SF).to_pandas()
    n = len(t)
    assert n == 500
    assert t["doc_id"].is_unique
    base = (15 * PR_FP) // (100 * n)
    assert (t["rank_fp"] >= base).all()
    total = t["rank_fp"].sum()
    # per-doc floor losses bound the leakage from FP
    assert PR_FP * 0.9 < total <= PR_FP


def test_anchor_text_counts(ray_session):
    """n_inlinks sums to the number of anchored edges (3 per doc with
    a nonempty first token) and the top anchor never exceeds its doc's
    inlink count."""
    from harvester_ray.pipelines.weburls import anchor_text_topk

    t = anchor_text_topk(SF).to_pandas()
    assert t["doc_id"].is_unique
    assert int(t["n_inlinks"].sum()) == 3 * 500  # every sf0.001 doc tokenizes
    assert (t["top_anchor_n"] >= 1).all()
    assert (t["top_anchor_n"] <= t["n_inlinks"]).all()
    assert (t["top_anchor"].str.len() > 0).all()


def test_crawl_frontier_politeness(ray_session):
    """Slots are a bijection onto the dispatch order; within a host
    waves are 0..k-1 and slot order respects wave order; no two urls
    of one host share a wave (the politeness contract)."""
    from harvester_ray.pipelines.weburls import crawl_frontier

    t = crawl_frontier(SF).to_pandas()
    assert len(t) == 500
    assert t["slot"].is_unique
    n_hosts = t["host"].nunique()
    assert (t["slot"] == t["wave"] * n_hosts + t["slot"] % n_hosts).all()
    for _, g in t.groupby("host"):
        waves = np.sort(g["wave"].to_numpy())
        assert (waves == np.arange(len(g))).all()


def test_hits_matches_pure_python_golden(ray_session):
    """Exact integer HITS replicated in numpy on the same graph: both
    half-steps, both normalizations, iteration for iteration."""
    import pyarrow.parquet as pq

    from harvester_ray.pipelines.weburls import (
        HITS_FP,
        HITS_ITERS,
        PR_EDGE_MULTS,
        hits_scores,
    )

    n = pq.ParquetFile(SF + "/documents.parquet").metadata.num_rows
    ids = np.arange(n, dtype=np.int64)
    h = np.full(n, HITS_FP // n, dtype=np.int64)
    a = h
    for _ in range(HITS_ITERS):
        a_raw = np.zeros(n, dtype=np.int64)
        for m, b in PR_EDGE_MULTS:
            np.add.at(a_raw, (ids * m + b) % n, h)
        a = a_raw * HITS_FP // a_raw.sum()
        h_raw = np.zeros(n, dtype=np.int64)
        for m, b in PR_EDGE_MULTS:
            h_raw += a[(ids * m + b) % n]
        h = h_raw * HITS_FP // h_raw.sum()

    t = hits_scores(SF).to_pandas().sort_values("doc_id")
    assert len(t) == n and t["doc_id"].is_unique
    assert np.array_equal(t["auth_fp"].to_numpy(), a)
    assert np.array_equal(t["hub_fp"].to_numpy(), h)
    # L1 mass conserved up to per-doc floor loss
    assert HITS_FP * 0.9 < t["auth_fp"].sum() <= HITS_FP
    assert HITS_FP * 0.9 < t["hub_fp"].sum() <= HITS_FP


def test_triangle_count_matches_bruteforce(ray_session):
    """Per-doc triangle participation equals a pure-Python adjacency
    brute force over the same synthesized edge family, and total
    participation is divisible by 3 (each triangle names 3 docs)."""
    import collections

    from harvester_ray.pipelines.weburls import (
        TRI_EDGE_MULTS,
        _n_docs,
        triangle_count,
    )

    sf = "/root/testdata/sf0.001"
    n = _n_docs(sf)
    adj = collections.defaultdict(set)
    for d in range(n):
        for a, b in TRI_EDGE_MULTS:
            t = (d * a + b) % n
            if t != d:
                adj[min(d, t)].add(max(d, t))
    expect = collections.Counter()
    for u, nbrs in adj.items():
        for v in nbrs:
            for w in nbrs:
                if v < w and w in adj.get(v, ()):
                    expect[u] += 1
                    expect[v] += 1
                    expect[w] += 1
    got = {
        int(r["doc_id"]): int(r["n_triangles"])
        for r in triangle_count(sf).take_all()
    }
    assert got == dict(expect)
    assert sum(got.values()) % 3 == 0 and sum(got.values()) > 0


def test_bfs_layers_matches_python_bfs(ray_session):
    """Distances equal a textbook BFS (depth-capped) over the same
    directed edge family; the seed is at dist 0 and every dist <=
    BFS_ITERS."""
    import collections

    from harvester_ray.pipelines.weburls import (
        BFS_ITERS,
        BFS_SEED,
        TRI_EDGE_MULTS,
        _n_docs,
        bfs_layers,
    )

    sf = "/root/testdata/sf0.001"
    n = _n_docs(sf)
    dist = {BFS_SEED: 0}
    frontier = collections.deque([BFS_SEED])
    while frontier:
        u = frontier.popleft()
        if dist[u] == BFS_ITERS:
            continue
        for a, b in TRI_EDGE_MULTS:
            t = (u * a + b) % n
            if t not in dist:
                dist[t] = dist[u] + 1
                frontier.append(t)
    got = {
        int(r["doc_id"]): int(r["dist"]) for r in bfs_layers(sf).take_all()
    }
    assert got == dist
    assert got[BFS_SEED] == 0 and max(got.values()) <= BFS_ITERS


def test_clustering_coef_invariants(ray_session):
    """Every doc with an edge appears exactly once; lcc is in [0, FP];
    docs with degree < 2 score exactly 0; triangle participation
    matches triangle_count."""
    from harvester_ray.pipelines.weburls import (
        LCC_FP,
        clustering_coef,
        triangle_count,
    )

    sf = "/root/testdata/sf0.001"
    rows = clustering_coef(sf).take_all()
    by_doc = {int(r["doc_id"]): r for r in rows}
    assert len(by_doc) == len(rows)  # one row per doc
    tri = {
        int(r["doc_id"]): int(r["n_triangles"])
        for r in triangle_count(sf).take_all()
    }
    for d, r in by_doc.items():
        assert 0 <= r["lcc_fp"] <= LCC_FP
        if r["degree"] < 2:
            assert r["lcc_fp"] == 0
        assert r["n_triangles"] == tri.get(d, 0)


def test_domain_rank_conserves_rank_mass(ray_session):
    """Host rollup conserves total PageRank mass and doc count."""
    from harvester_ray.pipelines.weburls import (
        _n_docs,
        domain_rank,
        pagerank_fixed,
    )

    sf = "/root/testdata/sf0.001"
    per_doc = pagerank_fixed(sf).to_pandas()
    per_host = domain_rank(sf).to_pandas()
    assert per_host["rank_fp"].sum() == per_doc["rank_fp"].sum()
    assert per_host["n_docs"].sum() == _n_docs(sf)
    assert (per_host["n_docs"] > 0).all()


def test_kcore_converges_and_matches_unbounded_peel(ray_session):
    """KCORE_ROUNDS bounds convergence on this graph: the engine's
    bounded peel equals an UNBOUNDED pure-Python peel (so round
    KCORE_ROUNDS is a fixed point), and every surviving vertex has
    core degree >= KCORE_K."""
    import collections

    from harvester_ray.pipelines.weburls import (
        KCORE_K,
        TRI_EDGE_MULTS,
        _n_docs,
        kcore_membership,
    )

    sf = "/root/testdata/sf0.001"
    n = _n_docs(sf)
    edges = set()
    for d in range(n):
        for a, b in TRI_EDGE_MULTS:
            t = (d * a + b) % n
            if t != d:
                edges.add((min(d, t), max(d, t)))
    while True:
        deg = collections.Counter()
        for u, v in edges:
            deg[u] += 1
            deg[v] += 1
        kept = {x for x, c in deg.items() if c >= KCORE_K}
        nxt = {(u, v) for u, v in edges if u in kept and v in kept}
        if nxt == edges:
            break
        edges = nxt
    deg = collections.Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    got = {
        int(r["doc_id"]): int(r["core_degree"])
        for r in kcore_membership(sf).take_all()
    }
    assert got == dict(deg)
    assert all(c >= KCORE_K for c in got.values())
    assert got, "3-core is empty at this sf"


def test_geo_radius_topk_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from harvester_ray.pipelines import weburls

    got = (
        weburls.geo_radius_topk(SF)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )

    ids = (
        pq.read_table(SF + "/documents.parquet", columns=["doc_id"])["doc_id"]
        .to_numpy()
        .astype(np.int64)
    )
    lat, lon = weburls._geo_coords(ids)
    # coordinates must actually spread over the box (the multiplier
    # wraps even a tiny dense id space)
    assert lat.min() < -45_000_000 < 45_000_000 < lat.max()
    assert lon.min() < -90_000_000 < 90_000_000 < lon.max()

    for qid, qlat, qlon in weburls.GEO_QUERY_POINTS:
        d2 = (lat - qlat) ** 2 + (lon - qlon) ** 2
        m = d2 <= weburls.GEO_RADIUS2
        order = np.lexsort((ids[m], d2[m]))[: weburls.GEO_TOP_K]
        want_ids = ids[m][order].tolist()
        want_d2 = d2[m][order].tolist()
        sub = got[got.query_id == qid]
        assert sub.doc_id.tolist() == want_ids
        assert sub.dist2.tolist() == want_d2
        assert sub["rank"].tolist() == list(range(1, len(want_ids) + 1))


def test_geo_bbox_stats_membership(ray_session):
    import pyarrow.parquet as pq

    from harvester_ray.pipelines import weburls

    got = (
        weburls.geo_bbox_stats(SF)
        .to_pandas()
        .set_index("query_id")
        .sort_index()
    )
    t = pq.read_table(
        SF + "/documents.parquet", columns=["doc_id", "n_chars"]
    )
    ids = t["doc_id"].to_numpy().astype(np.int64)
    nch = t["n_chars"].to_numpy().astype(np.int64)
    lat, lon = weburls._geo_coords(ids)
    for qid, lat_lo, lat_hi, lon_lo, lon_hi in weburls.GEO_BBOXES:
        m = (
            (lat >= lat_lo)
            & (lat <= lat_hi)
            & (lon >= lon_lo)
            & (lon <= lon_hi)
        )
        assert got.loc[qid, "n_docs"] == int(m.sum())
        assert got.loc[qid, "sum_chars"] == int(nch[m].sum())


def test_hits_wide_doc_count_autoscales(monkeypatch, ray_session):
    """When the doc count reaches the L1 scale, hits_scores derives a
    wider power-of-10 scale instead of raising (round-4 VERDICT task
    4); the result must be bit-identical to the DuckDB twin built with
    the SAME derived constant."""
    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    from harvester_ray.pipelines import weburls
    from harvester_ray.pipelines.oracles import _hits_sql

    n = pq.ParquetFile(SF + "/documents.parquet").metadata.num_rows
    monkeypatch.setattr(weburls, "HITS_FP", 100)  # << n = 500
    derived = weburls._hits_fp(n)
    assert derived > 100 and derived // n > 0

    got = (
        weburls.hits_scores(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = (
        con.execute(_hits_sql(derived))
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hits_fp_overflow_guard():
    """The derived L1 scale must refuse loudly past the int64 product
    bound instead of wrapping silently (round-5 review finding)."""
    import pytest

    from harvester_ray.pipelines.weburls import _hits_fp

    assert _hits_fp(500) == 1_000_000
    with pytest.raises(NotImplementedError):
        _hits_fp(10**10)
