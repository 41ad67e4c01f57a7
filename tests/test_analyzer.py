"""SURVEY §2.10 extension surface: injectable Analyzer + scorer plug
point, and the JSONL staging-format round trip."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from harvester_ray.config import IndexConfig
from harvester_ray.functions.text import (
    Analyzer,
    get_analyzer,
    register_analyzer,
)
from harvester_ray.index.build import build_index
from harvester_ray.index.query import InvertedIndex

# a case-SENSITIVE whitespace analyzer — distinguishable from the
# default casefolding one on mixed-case corpora
register_analyzer(
    Analyzer(
        "ws-case",
        lambda s: (s or "").split(),
        lambda col: pc.utf8_split_whitespace(pc.fill_null(col, "")),
    )
)

DOCS = pa.table(
    {
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(
            ["The Cat sat", "the cat sat", "Dog! dog."], pa.string()
        ),
    }
)


def test_analyzer_registry_errors():
    with pytest.raises(KeyError, match="unknown analyzer"):
        get_analyzer("nope")
    assert get_analyzer("ws-case").name == "ws-case"


def test_custom_analyzer_threads_through_build_and_query(tmp_path, ray_session):
    out = str(tmp_path / "idx")
    cfg = IndexConfig(analyzer_name="ws-case")
    build_index(ray.data.from_arrow(DOCS), out, cfg, n_docs=3)
    idx = InvertedIndex(out, preload=True)
    # the index remembers its analyzer via stats.json
    assert idx.stats["analyzer"] == "ws-case"
    assert idx.analyzer.name == "ws-case"
    # case preserved, punctuation kept: 'The' != 'the'; 'Dog!' a term
    assert "The" in idx.dictionary and "the" in idx.dictionary
    assert idx.dictionary["The"][1] == 1 and idx.dictionary["the"][1] == 1
    assert "Dog!" in idx.dictionary
    # queries tokenize with the SAME analyzer
    assert [d for d, _ in idx.search("The", k=10)] == [1]
    assert [d for d, _ in idx.search("the", k=10)] == [2]
    # default analyzer on the same corpus folds case
    out2 = str(tmp_path / "idx2")
    build_index(ray.data.from_arrow(DOCS), out2, IndexConfig(), n_docs=3)
    idx2 = InvertedIndex(out2, preload=True)
    assert "The" not in idx2.dictionary
    assert idx2.dictionary["the"][1] == 2


def test_scorer_plug_point(tmp_path, ray_session):
    out = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(DOCS), out, n_docs=3)

    def tf_only(tf, dl, df, n_docs, avgdl, k1, b):
        return tf.astype(np.float64)

    idx = InvertedIndex(out, preload=True, scorer=tf_only)
    # doc 3 is 'dog dog' under the default analyzer -> tf 2
    hits = idx.search("dog", k=10)
    assert hits == [(3, 2.0)]
    # wand falls back to the exhaustive path (custom scorer has no
    # valid block maxima) and still ranks by the custom scorer
    assert idx.search("dog", k=10, algorithm="wand") == [(3, 2.0)]
    # AND mode scores with the custom scorer too
    assert idx.search("cat sat", k=10, mode="and") == [
        (1, 2.0),
        (2, 2.0),
    ]


def test_named_tfidf_scorer(tmp_path, ray_session):
    """QueryActor(scorer="tfidf") ranks by query.tfidf_score — the
    named-scorer registry used by pipelines.fulltext.tfidf_topk."""
    import math

    from harvester_ray.index.query import QueryActor, tfidf_score

    out = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(DOCS), out, n_docs=3)
    actor = QueryActor(out, k=10, scorer="tfidf")
    batch = pa.table(
        {"query_id": [0], "query": ["dog"], "mode": ["or"]}
    )
    res = actor(batch)
    idx = actor.index
    df = float(idx.dictionary["dog"][1])
    # doc 3 = 'dog dog' (tf=2, dl=2); expected per the shared formula
    expect = float(
        tfidf_score(
            np.array([2]), np.array([2]), df, idx.n_docs, idx.avgdl, 0, 0
        )[0]
    )
    top = res.to_pylist()[0]
    assert top["doc_id"] == 3
    assert math.isclose(top["score"], expect, rel_tol=1e-12)


def test_jsonl_pages_round_trip(tmp_path, ray_session):
    from harvester_ray.corpus import generate_pages
    from harvester_ray.sources.readers import (
        read_jsonl_pages,
        write_jsonl_pages,
    )

    pages, _ = generate_pages(60)
    out = str(tmp_path / "jsonl")
    write_jsonl_pages(ray.data.from_arrow(pages), out)
    back = (
        read_jsonl_pages(out)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    orig = pages.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(back) == len(orig)
    assert list(back["url"]) == list(orig["url"])
    # html bytes survive the base64 round trip byte-identically
    assert all(a == b for a, b in zip(back["html"], orig["html"]))
    assert list(back["warc_ts"]) == list(orig["warc_ts"])
    assert list(back["lang"]) == list(orig["lang"])
    # nullable text column: None stays None, strings stay byte-equal
    assert all(
        (a is None and b is None) or a == b
        for a, b in zip(back["text"], orig["text"])
    )


# ── porter_en: the second REAL analyzer through the registry ────────


def test_porter_stem_canonical_vectors():
    """Spot-check the Porter 1980 spec's published example pairs
    (including the author's bli→ble / logi→log departures)."""
    from harvester_ray.functions.text import porter_stem

    vectors = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "cats": "cat", "feed": "feed", "agreed": "agre",
        "motoring": "motor", "hopping": "hop", "happy": "happi",
        "sky": "sky", "relational": "relat", "conditional": "condit",
        "rational": "ration", "digitizer": "digit",
        "conformabli": "conform", "analogousli": "analog",
        "vietnamization": "vietnam", "operator": "oper",
        "feudalism": "feudal", "decisiveness": "decis",
        "hopefulness": "hope", "formaliti": "formal",
        "sensibiliti": "sensibl", "triplicate": "triplic",
        "formative": "form", "electriciti": "electr",
        "electrical": "electr", "hopeful": "hope", "goodness": "good",
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "adjustable": "adjust", "replacement": "replac",
        "adoption": "adopt", "communism": "commun",
        "activate": "activ", "effective": "effect", "rate": "rate",
        "cease": "ceas", "controll": "control", "roll": "roll",
    }
    for w, want in vectors.items():
        assert porter_stem(w) == want, w


def test_porter_column_matches_python():
    """The Arrow column tokenizer's non-empty pieces must equal the
    Python tokenizer per row — the analyzer contract every index
    relies on (stopwords map to empty pieces)."""
    from harvester_ray.functions.text import (
        get_analyzer,
        flatten_tokens,
    )

    az = get_analyzer("porter_en")
    texts = [
        "The cats are hopping over the fences",
        "a an and",                      # all stopwords -> no tokens
        "Relational databases, joined!",  # punctuation + case
        "",
        None,
    ]
    col = pa.array(texts, pa.string())
    flat, parent = flatten_tokens(az.tokenize_column(col))
    got: dict[int, list[str]] = {}
    for t, p in zip(flat.to_pylist(), parent.to_pylist()):
        got.setdefault(p, []).append(t)
    for i, text in enumerate(texts):
        assert got.get(i, []) == az.tokenize(text), text


def test_porter_build_query_agreement(tmp_path, ray_session):
    """Build + query with porter_en end-to-end: inflected query forms
    hit the stemmed postings, stopwords never enter the dictionary,
    and the index resolves its analyzer from stats.json."""
    from harvester_ray.config import IndexConfig

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "the cat was hopping and jumping",
                    "a dog jumped over the fence",
                    "relational joins are effective",
                ],
                pa.string(),
            ),
        }
    )
    out = str(tmp_path / "pidx")
    build_index(
        ray.data.from_arrow(docs), out,
        IndexConfig(analyzer_name="porter_en"), n_docs=3,
    )
    idx = InvertedIndex(out, preload=True)
    assert idx.stats["analyzer"] == "porter_en"
    assert "hop" in idx.dictionary and "jump" in idx.dictionary
    assert "the" not in idx.dictionary and "was" not in idx.dictionary
    # inflected query forms stem to the same terms at query time
    assert [d for d, _ in idx.search("hopped", k=10)] == [1]
    assert {d for d, _ in idx.search("jumps", k=10)} == {1, 2}
    assert [d for d, _ in idx.search("join effectively", k=10)] == [3]
    # stopword-only query matches nothing
    assert idx.search("the and a", k=10) == []
    # analyzer-mismatch guard: an unregistered name still errors
    with pytest.raises(KeyError, match="unknown analyzer"):
        get_analyzer("porter_en_v2")
