"""Pure-Python exhaustive BM25 oracle.

Independent of the engine (dicts + math only, no Arrow/numpy in the
scoring path): builds in-memory postings from raw (doc_id, text) rows
and scores every matching document exhaustively. Mirrors the
reference's golden-value test strategy (SURVEY.md §5: fixture in,
exact values out, test/test_solr_updater.py:147-248) — the engine's
top-k must be rank-identical to this under the shared ranking rule
(round(score, 6) DESC, doc_id ASC).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from harvester_ray.functions.text import tokenize


class OracleIndex:
    def __init__(self, rows: list[tuple[int, str]], k1: float = 1.2, b: float = 0.75):
        self.k1, self.b = k1, b
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)
        self.doc_len: dict[int, int] = {}
        for doc_id, text in rows:
            toks = tokenize(text)
            self.doc_len[doc_id] = len(toks)
            for term, tf in Counter(toks).items():
                self.postings[term][doc_id] = tf
        self.n_docs = len(self.doc_len)
        total = sum(self.doc_len.values())
        self.avgdl = total / self.n_docs if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score_one(self, term: str, doc_id: int) -> float:
        tf = self.postings[term][doc_id]
        dl = self.doc_len[doc_id]
        k1, b = self.k1, self.b
        norm = tf + k1 * (1.0 - b + b * dl / self.avgdl)
        return self.idf(term) * (tf * (k1 + 1.0)) / norm

    def search(self, query: str, k: int = 10, mode: str = "or"):
        terms = sorted(set(tokenize(query)))
        if not terms:
            return []
        scores: dict[int, float] = defaultdict(float)
        if mode == "and":
            cands: set[int] | None = None
            for t in terms:
                docs = set(self.postings.get(t, {}))
                cands = docs if cands is None else (cands & docs)
                if not cands:
                    return []
            for t in terms:  # sorted-term order: deterministic accumulation
                for d in cands:
                    scores[d] += self.score_one(t, d)
        else:
            for t in terms:
                for d in self.postings.get(t, {}):
                    scores[d] += self.score_one(t, d)
        ranked = sorted(
            scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0])
        )
        return [(d, s) for d, s in ranked[:k]]
