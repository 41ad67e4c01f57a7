"""Query-language surface: a Lucene-style boolean query string parsed
and executed against the engine's own primitives.

Grammar (the subset the reference's users type into the Solr search box
the harvester delegates to — SURVEY §2.7 "search is delegated"):

    query   := clause+
    clause  := '+' atom   (MUST)
             | '-' atom   (MUST_NOT; terms only)
             | atom       (SHOULD; a bare phrase is a MUST)
    atom    := '"' word+ '"' | word

Semantics (documented, oracle-matched):
- positive terms = SHOULD ∪ MUST ∪ all phrase terms; score = BM25 sum
  over the positive terms present in the doc (Lucene's sum-of-matching-
  clauses, with phrase terms contributing their term scores);
- a doc is eligible iff it contains ALL MUST terms, matches ALL
  phrases, contains NO MUST_NOT term, and (when there is no MUST/phrase
  clause) contains at least one SHOULD term. A term that is BOTH
  positive and negated ("scan -scan") keeps its positive occurrence
  and the negation is ignored — the engine-wide NOT rule
  (query.search(exclude=...), NOT_SET's overlap case) shared with the
  SQL oracle;
- ranking: round-6 score DESC, doc_id ASC — the engine-wide rule.

Phrase doc sets come from the positional tier
(positional.phrase_occurrences_multi) and are intersected into a
per-query allowed set BEFORE ranking. At 10^12 docs that allowed set is
bounded by the rarest phrase term's df (the positional read is pruned
to the phrase's term buckets); pushing the intersection fully into the
positional tier is the same partitioning assumption phrase_match
documents.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_CLAUSE_RE = re.compile(r'([+-]?)("[^"]*"|\S+)')


class ParsedQuery:
    __slots__ = ("should", "must", "must_not", "phrases")

    def __init__(self, should, must, must_not, phrases):
        self.should = should
        self.must = must
        self.must_not = must_not
        self.phrases = phrases


def parse_query(s: str) -> ParsedQuery:
    """Parse a boolean query string. Raw words are kept verbatim; the
    executor runs them through the index analyzer (a word may expand to
    several index terms, each inheriting the clause's occurrence).
    ``-"phrase"`` is rejected (out of the supported subset)."""
    if (s or "").count('"') % 2:
        raise ValueError("unbalanced quotes in query")
    should, must, must_not, phrases = [], [], [], []
    for sign, body in _CLAUSE_RE.findall(s or ""):
        if body.startswith('"'):
            if sign == "-":
                raise ValueError("negated phrases are not supported")
            ph = body.strip('"').strip()
            if ph:  # '""' is a no-op, not a match-nothing constraint
                phrases.append(ph)
        elif sign == "+":
            must.append(body)
        elif sign == "-":
            must_not.append(body)
        else:
            should.append(body)
    return ParsedQuery(should, must, must_not, phrases)


def search_boolean(
    index,
    parsed: ParsedQuery,
    k: int = 10,
    allowed: "np.ndarray | None" = None,
    after=None,
) -> list[tuple[int, float]]:
    """Execute a ParsedQuery against an InvertedIndex. ``allowed`` is
    the (sorted, unique) doc_id set satisfying the query's phrase
    clauses — pass None when the query has no phrases; an empty array
    means a phrase matched nothing (result: no hits)."""
    tok = index.analyzer.tokenize
    should = sorted({t for w in parsed.should for t in tok(w)})
    must = sorted({t for w in parsed.must for t in tok(w)})
    pos = sorted(
        set(should)
        | set(must)
        | {t for p in parsed.phrases for t in tok(p)}
    )
    neg = sorted(
        {t for w in parsed.must_not for t in tok(w)} - set(pos)
    )
    if not pos:
        return []
    if allowed is not None and len(allowed) == 0:
        return []

    if index._slots is not None:
        n = len(index._slots)
        acc = np.zeros(n, dtype=np.float64)
        hit = np.zeros(n, dtype=bool)
        for t in pos:  # sorted order -> deterministic accumulation
            d = index._term_dense(t)
            if d is None:
                if t in must:
                    return []  # a MUST term absent from the corpus
                continue
            p, scores = d
            acc += np.bincount(p, weights=scores, minlength=n)
            hit[p] = True
        mask = hit
        if must:
            cnt = np.zeros(n, dtype=np.int32)
            for t in must:
                d = index._term_dense(t)
                cnt[d[0]] += 1
            mask = mask & (cnt == len(must))
        if allowed is not None:
            ok = np.zeros(n, dtype=bool)
            sl = np.searchsorted(index._slots, allowed)
            # `allowed` is sorted, so positions == n (values above the
            # slot range) form a suffix — dropping them keeps sl
            # aligned with allowed[:len(sl)]
            sl = sl[sl < n]
            ok[sl[index._slots[sl] == allowed[: len(sl)]]] = True
            mask = mask & ok
        if neg:
            ex = index._excluded_docs(list(neg))
            if ex is not None:
                mask[np.searchsorted(index._slots, ex)] = False
        return index._topk_dense(acc, mask, k, after)

    # sparse path (lazy-load index): accumulate per-term postings
    id_parts, score_parts = [], []
    must_sets = []
    for t in pos:
        p = index.postings(t)
        if p is None:
            if t in must:
                return []
            continue
        id_parts.append(p.doc_ids)
        score_parts.append(index._score(p.tfs, p.doc_lens, p.df))
        if t in must:
            must_sets.append(p.doc_ids)
    if not id_parts:
        return []
    all_ids = np.concatenate(id_parts)
    all_scores = np.concatenate(score_parts)
    uniq, inv = np.unique(all_ids, return_inverse=True)
    sums = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(sums, inv, all_scores)
    keep = np.ones(len(uniq), dtype=bool)
    for ms in must_sets:
        keep &= np.isin(uniq, ms, assume_unique=True)
    if allowed is not None:
        keep &= np.isin(uniq, allowed, assume_unique=True)
    if neg:
        ex = index._excluded_docs(list(neg))
        if ex is not None:
            keep &= ~np.isin(uniq, ex, assume_unique=True)
    uniq, sums = uniq[keep], sums[keep]
    return index._topk(uniq, sums, k, after)


class BooleanQueryActor:
    """Actor-pool evaluation of parsed boolean queries: batch columns
    (query_id, query, allowed_docs: list<int64> | null). The index
    loads ONCE per actor (stateful-stage rule); parsing is per row
    (micro-cost). Emits (query_id, rank, doc_id, score)."""

    def __init__(self, index_dir: str, k: int = 10):
        from harvester_ray.index.query import InvertedIndex

        self.index = InvertedIndex(index_dir, preload=True)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, doc_ids, scores = [], [], [], []
        allowed_col = (
            batch["allowed_docs"].to_pylist()
            if "allowed_docs" in batch.column_names
            else [None] * len(batch)
        )
        for qid, q, al in zip(
            batch["query_id"].to_pylist(),
            batch["query"].to_pylist(),
            allowed_col,
        ):
            parsed = parse_query(q)
            allowed = (
                None
                if al is None
                else np.asarray(sorted(set(al)), dtype=np.int64)
            )
            for rank, (doc_id, score) in enumerate(
                search_boolean(self.index, parsed, k=self.k, allowed=allowed),
                start=1,
            ):
                qids.append(qid)
                ranks.append(rank)
                doc_ids.append(doc_id)
                scores.append(score)
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "score": pa.array(scores, pa.float64()),
            }
        )
