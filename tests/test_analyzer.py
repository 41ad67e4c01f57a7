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
