"""Semantic pins for the Solr-surface components added late in round 4
(mm / termvectors / Luke / facet.query / df histogram) — properties the
oracle comparison alone doesn't state explicitly."""

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_mm_cap_keeps_single_term_queries_unfiltered(ray_session):
    """Solr caps mm at the optional-clause count, so a 1-term query's
    mm_topk page must equal its plain BM25 page."""
    from harvester_ray.functions.text import tokenize
    from harvester_ray.pipelines import fulltext

    single = [
        qid
        for qid, q in fulltext.queries_for_mode("or")
        if len(set(tokenize(q))) == 1
    ]
    assert single, "query set lost its single-term query"
    mm = fulltext.mm_topk(SF).to_pandas()
    bm = fulltext.bm25_topk_or(SF).to_pandas()
    for qid in single:
        a = mm[mm.query_id == qid].sort_values("rank").doc_id.tolist()
        b = bm[bm.query_id == qid].sort_values("rank").doc_id.tolist()
        assert a == b


def test_mm_docs_match_at_least_two_terms(ray_session):
    """Independent ground truth: re-tokenize the raw documents and count
    distinct query terms per (query, doc) — every mm_topk row must meet
    the capped threshold. (The engine-side nterms now rides along inside
    _scored_match_set, so this check must NOT consume that path.)"""
    import os

    import pyarrow.parquet as pq

    from harvester_ray.functions.text import tokenize
    from harvester_ray.pipelines import fulltext

    mm = fulltext.mm_topk(SF).to_pandas()
    need_docs = set(mm.doc_id.astype(int))
    docs = pq.read_table(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    )
    tok = {
        int(d): set(tokenize(t))
        for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
        if int(d) in need_docs
    }
    qterms = {
        qid: set(tokenize(q)) for qid, q in fulltext.queries_for_mode("or")
    }
    req = {qid: min(fulltext.MM_MIN, len(ts)) for qid, ts in qterms.items()}
    for r in mm.itertuples():
        qid, did = int(r.query_id), int(r.doc_id)
        assert len(qterms[qid] & tok[did]) >= req[qid]


def test_termvectors_reconstruct_doc_lens(ray_session):
    """Σ tf per doc over the term vector == the doc table's doc_len."""
    import pyarrow.parquet as pq

    from harvester_ray.pipelines import fulltext

    tv = fulltext.termvectors(SF).to_pandas()
    assert (tv.doc_id < fulltext.TV_MAX_DOC).all()
    got = tv.groupby("doc_id").tf.sum().to_dict()
    paths = fulltext.index_for(SF)
    dt = pq.read_table(
        paths.doc_table,
        columns=["doc_id", "doc_len"],
        filters=[("doc_id", "<", fulltext.TV_MAX_DOC)],
    )
    want = dict(
        zip(dt["doc_id"].to_pylist(), dt["doc_len"].to_pylist())
    )
    assert {int(k): int(v) for k, v in got.items()} == {
        int(k): int(v) for k, v in want.items()
    }


def test_index_overview_internally_consistent(ray_session):
    from harvester_ray.pipelines import fulltext

    t = fulltext.index_overview(SF)
    m = dict(zip(t["metric"].to_pylist(), t["value"].to_pylist()))
    assert m["n_docs"] > 0 and m["n_terms"] > 0
    assert m["n_postings"] <= m["total_tokens"]
    assert m["max_df"] <= m["n_docs"]
    assert m["min_doc_len"] <= m["max_doc_len"]
    assert m["avgdl_fp4"] == m["total_tokens"] * 10_000 // m["n_docs"]


def test_df_histogram_bucket_rule_is_exact_floor_log2():
    """np.frexp exponent - 1 == floor(log2(df)) for every df >= 1,
    including exact powers of two (the libm-rounding edge)."""
    df = np.r_[
        np.arange(1, 2050, dtype=np.int64),
        2 ** np.arange(1, 52, dtype=np.int64),
        2 ** np.arange(1, 52, dtype=np.int64) - 1,
    ]
    got = np.frexp(df.astype(np.float64))[1] - 1
    want = np.array([len(bin(int(x))) - 3 for x in df])  # '0b1...' -> floor log2
    assert (got == want).all()


def test_facet_query_counts_are_match_set_slices(ray_session):
    """Each facet count must equal a direct recount of the distinct
    match set joined to the documents columns."""
    import duckdb

    from harvester_ray.pipelines import fulltext

    got = fulltext.facet_query_counts(SF).to_pandas()
    matches = fulltext._distinct_match_set(SF).to_pandas()
    docs = duckdb.sql(
        f"SELECT doc_id, lang, n_chars FROM '{SF}/documents.parquet'"
    ).df()
    j = matches.merge(docs, on="doc_id")
    want = {
        "lang:en": j[j.lang == "en"],
        "n_chars:[300 TO *]": j[j.n_chars >= 300],
        "lang:de AND n_chars:[* TO 250]": j[(j.lang == "de") & (j.n_chars <= 250)],
    }
    for label, sub in want.items():
        w = sub.groupby("query_id").size().to_dict()
        g = {
            int(r.query_id): int(r.n_docs)
            for r in got[got.facet == label].itertuples()
        }
        assert g == {int(k): int(v) for k, v in w.items()}, label


def test_pf_boost_semantics(ray_session):
    """pf: queries with NO exact-phrase hit rank exactly as plain BM25;
    at least one phrase-hit query's page differs from its BM25 page
    (the boost is live); every phrase-hit doc that was in the match set
    gains PF_BOOST_FP x occurrences."""
    from harvester_ray.functions.text import tokenize
    from harvester_ray.index.positional import phrase_occurrences_multi
    from harvester_ray.pipelines import fulltext

    phrases = [
        (qid, q)
        for qid, q in fulltext.queries_for_mode("or")
        if len(tokenize(q)) >= 2
    ]
    occ = phrase_occurrences_multi(fulltext.positions_for(SF), phrases)
    hit_qids = set(occ["phrase_id"].to_pylist())
    assert hit_qids, "phrase boost never exercised at this sf"

    pf = fulltext.pf_topk(SF).to_pandas()
    bm = fulltext.bm25_topk_or(SF).to_pandas()
    changed = 0
    for qid, _ in fulltext.queries_for_mode("or"):
        a = pf[pf.query_id == qid].sort_values("rank").doc_id.tolist()
        b = bm[bm.query_id == qid].sort_values("rank").doc_id.tolist()
        if qid not in hit_qids:
            assert a == b, f"boost leaked into phrase-less query {qid}"
        elif a != b:
            changed += 1
    assert changed >= 1


def test_pf_join_path_matches_broadcast(ray_session, monkeypatch):
    """With the broadcast guard forced to 0, the phrase-hit table hash
    joins onto the match set and the final page is identical."""
    from harvester_ray.pipelines import fulltext

    want = fulltext.pf_topk(SF).to_pandas()
    monkeypatch.setattr(fulltext, "PF_BROADCAST_ROWS", 0)
    got = fulltext.pf_topk(SF).to_pandas()
    key = ["query_id", "rank", "doc_id"]
    assert sorted(map(tuple, got[key].values)) == sorted(
        map(tuple, want[key].values)
    )
