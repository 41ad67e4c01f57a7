"""Query-language surface: a Lucene-style boolean query string parsed
and executed against the engine's own primitives.

Grammar (the subset the reference's users type into the Solr search box
the harvester delegates to — SURVEY §2.7 "search is delegated";
fielded/range/boost syntax per the fq/facet queries of
/root/reference/scripts/report_harvested_to_solr.py:55-67):

    query   := clause+
    clause  := '+' atom   (MUST)
             | '-' atom   (MUST_NOT / negated filter)
             | atom       (SHOULD; a bare phrase is a MUST)
    atom    := '"' word+ '"'                      phrase
             | '(' word (OR? word)* ')'           group (bare words only)
             | name ':' value                     field equality filter
             | name ':' '[' lo TO hi ']'          field range filter
             | word ('^' number)?                 term, optional boost
    The token OR (or '||') is a separator: SHOULD is already the
    default connective, so `a OR b` == `a b` (documented no-op).

Semantics (documented, oracle-matched):
- positive terms = SHOULD ∪ MUST ∪ group ∪ all phrase terms; score =
  BM25 sum over the positive terms present in the doc (Lucene's
  sum-of-matching-clauses), each term's per-posting score multiplied
  by its boost (a term named by several clauses takes the MAX boost);
- groups hold bare words only (one nesting level — with only words
  inside, deeper nesting adds no expressive power and is rejected).
  An unsigned group flattens to SHOULD clauses; `+(a b)` requires the
  doc to match AT LEAST ONE group member (Lucene's must-clause on a
  SHOULD subquery); `-(a b)` flattens to MUST_NOT a, MUST_NOT b
  (exactly equivalent);
- field clauses are FILTERS (Solr fq semantics — they restrict, never
  score): `lang:en` keeps docs whose metadata column equals the value,
  `n_chars:[120 TO 200]` keeps docs inside the closed range, and a
  `-` prefix negates the clause. The executor receives them resolved
  into the `allowed` doc set (same mechanism as phrase clauses);
- a doc is eligible iff it contains ALL MUST terms, at least one
  member of EVERY must-group, matches ALL phrases and field filters,
  contains NO MUST_NOT term, and (when there is no MUST/phrase
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

_CLAUSE_RE = re.compile(
    r'([+-]?)("[^"]*"|\([^()]*\)|[A-Za-z_][A-Za-z0-9_]*:(?:\[[^\]]*\]|[^\s()]+)|[^\s()]+)'
    r"|([()])"  # a stray paren here means an unterminated/nested group
)
_BOOST_RE = re.compile(r"^(.*?)\^(\d+(?:\.\d+)?)$")
_RANGE_RE = re.compile(r"^\[\s*(\S+)\s+TO\s+(\S+)\s*\]$")
_NUM_RE = re.compile(r"^-?\d+(?:\.\d+)?$")


class FieldClause:
    """One metadata filter clause: equality (``hi is None``) or a
    closed range. ``lo``/``hi`` stay strings; consumers type them
    against the column (``is_numeric``)."""

    __slots__ = ("field", "lo", "hi", "negated")

    def __init__(self, field, lo, hi=None, negated=False):
        self.field = field
        self.lo = lo
        self.hi = hi
        self.negated = negated

    @property
    def is_range(self) -> bool:
        return self.hi is not None

    @property
    def is_numeric(self) -> bool:
        return bool(_NUM_RE.match(self.lo)) and (
            self.hi is None or bool(_NUM_RE.match(self.hi))
        )

    def __repr__(self):
        body = (
            f"[{self.lo} TO {self.hi}]" if self.is_range else self.lo
        )
        return f"{'-' if self.negated else ''}{self.field}:{body}"


class ParsedQuery:
    __slots__ = (
        "should", "must", "must_not", "phrases",
        "must_groups", "filters", "boosts",
    )

    def __init__(
        self, should, must, must_not, phrases,
        must_groups=None, filters=None, boosts=None,
    ):
        self.should = should
        self.must = must
        self.must_not = must_not
        self.phrases = phrases
        self.must_groups = must_groups or []
        self.filters = filters or []
        self.boosts = boosts or {}


def _group_words(body: str) -> list[str]:
    words = [w for w in body.strip("()").split() if w not in ("OR", "||")]
    for w in words:
        if w[:1] in "+-" or '"' in w or ":" in w or "^" in w:
            raise ValueError(
                f"groups hold bare words only (got {w!r})"
            )
    return words


def parse_query(s: str) -> ParsedQuery:
    """Parse a boolean query string. Raw words are kept verbatim; the
    executor runs them through the index analyzer (a word may expand to
    several index terms, each inheriting the clause's occurrence and
    boost). ``-"phrase"`` is rejected (out of the supported subset),
    as are nested/unbalanced groups."""
    s = s or ""
    if s.count('"') % 2:
        raise ValueError("unbalanced quotes in query")
    should, must, must_not, phrases = [], [], [], []
    groups: list[list[str]] = []
    filters: list[FieldClause] = []
    boosts: dict[str, float] = {}

    def word_clause(body: str, dest: list) -> None:
        m = _BOOST_RE.match(body)
        if m:
            body, bval = m.group(1), float(m.group(2))
            if not body:
                raise ValueError("boost without a term")
            boosts[body] = max(boosts.get(body, 0.0), bval)
        dest.append(body)

    for sign, body, stray in _CLAUSE_RE.findall(s):
        if stray:
            raise ValueError("unbalanced or nested group parentheses")
        if body.startswith('"'):
            if sign == "-":
                raise ValueError("negated phrases are not supported")
            ph = body.strip('"').strip()
            if ph:  # '""' is a no-op, not a match-nothing constraint
                phrases.append(ph)
        elif body.startswith("("):
            words = _group_words(body)
            if not words:
                continue  # '()' is a no-op
            if sign == "+":
                groups.append(words)
            elif sign == "-":
                must_not.extend(words)
            else:
                should.extend(words)  # SHOULD group flattens exactly
        elif ":" in body and re.match(r"^[A-Za-z_][A-Za-z0-9_]*:", body):
            field, _, val = body.partition(":")
            rm = _RANGE_RE.match(val)
            if rm:
                filters.append(
                    FieldClause(field, rm.group(1), rm.group(2), sign == "-")
                )
            elif val:
                filters.append(FieldClause(field, val, None, sign == "-"))
            else:
                raise ValueError(f"field clause without a value: {body!r}")
        elif body in ("OR", "||"):
            continue  # SHOULD is the default connective
        elif sign == "+":
            word_clause(body, must)
        elif sign == "-":
            # strip (and ignore) a boost suffix on a negated term —
            # '-scan^2' negates 'scan'; boosts never apply to NOTs
            m = _BOOST_RE.match(body)
            must_not.append(m.group(1) if m and m.group(1) else body)
        else:
            word_clause(body, should)
    return ParsedQuery(
        should, must, must_not, phrases, groups, filters, boosts
    )


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
    group_toks = [
        sorted({t for w in g for t in tok(w)}) for g in parsed.must_groups
    ]
    pos = sorted(
        set(should)
        | set(must)
        | {t for g in group_toks for t in g}
        | {t for p in parsed.phrases for t in tok(p)}
    )
    neg = sorted(
        {t for w in parsed.must_not for t in tok(w)} - set(pos)
    )
    # word-level boosts expand to index terms; a term produced by
    # several boosted words keeps the MAX boost across its BOOSTED
    # clauses (sub-1.0 boosts downweight as documented — do not seed
    # the max with the 1.0 default)
    tboost: dict[str, float] = {}
    for w, bv in parsed.boosts.items():
        for t in tok(w):
            tboost[t] = max(tboost[t], bv) if t in tboost else bv
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
            bv = tboost.get(t, 1.0)
            acc += np.bincount(
                p, weights=scores * bv if bv != 1.0 else scores,
                minlength=n,
            )
            hit[p] = True
        mask = hit
        if must:
            cnt = np.zeros(n, dtype=np.int32)
            for t in must:
                d = index._term_dense(t)
                cnt[d[0]] += 1
            mask = mask & (cnt == len(must))
        for g in group_toks:  # at least one member of EVERY group
            gok = np.zeros(n, dtype=bool)
            for t in g:
                d = index._term_dense(t)
                if d is not None:
                    gok[d[0]] = True
            mask = mask & gok
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
    term_docs: dict[str, np.ndarray] = {}
    for t in pos:
        p = index.postings(t)
        if p is None:
            if t in must:
                return []
            continue
        s = index._score(p.tfs, p.doc_lens, p.df)
        bv = tboost.get(t, 1.0)
        id_parts.append(p.doc_ids)
        score_parts.append(s * bv if bv != 1.0 else s)
        term_docs[t] = p.doc_ids
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
    for g in group_toks:  # at least one member of EVERY group
        present = [term_docs[t] for t in g if t in term_docs]
        if not present:
            return []
        gd = (
            present[0]
            if len(present) == 1
            else np.unique(np.concatenate(present))
        )
        keep &= np.isin(uniq, gd, assume_unique=True)
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
