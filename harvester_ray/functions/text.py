"""Text normalization, tokenization and stable hashing.

The analyzer contract — ONE definition used by every engine component
and by the DuckDB oracle SQL, so postings / BM25 ranks are comparable
across all three:

    tokens(text) == re.findall('[a-z0-9]+', text.lower())
                 == DuckDB regexp_extract_all(lower(text), '[a-z0-9]+')
                 == non-empty pieces of
                    pyarrow.compute.split_pattern_regex(utf8_lower(text),
                                                        '[^a-z0-9]+')

This is the new-engine analog of the reference's text normalizer
``normalize_sort_field`` (casefold + punctuation strip,
harvester/solr_updater.py:561-573 — RE_ALPHANUMSPACE at :30), promoted
from a sort-key helper to the index analyzer.

``hash64`` is the stable document/term id derivation — the analog of
the reference's md5-of-id fallback for stable unique ids
(``get_solr_id``, harvester/solr_updater.py:380-384). blake2b is
seedless and process-independent, so two runs / two cluster sizes
assign identical ids (SURVEY.md §7 hard part (d)).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Python-side tokenizer (queries, oracles, tests).
TOKEN_RE = re.compile(r"[a-z0-9]+")
# The same pattern as embedded in DuckDB oracle SQL.
TOKEN_SQL_RE = "[a-z0-9]+"
# Arrow split pattern: the complement (split on runs of non-token chars).
_SPLIT_PATTERN = "[^a-z0-9]+"

_ARTICLES = ("the", "a", "an")
_RE_ALPHANUMSPACE = re.compile(r"[^0-9A-Za-z\s]+")


def tokenize(text: str | None) -> list[str]:
    """Tokenize one string (query side / oracle side)."""
    if not text:
        return []
    return TOKEN_RE.findall(text.lower())


def tokenize_column(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Vectorized tokenizer: string column -> list<string> of tokens.

    Pure Arrow kernels (utf8_lower + split_pattern_regex); empty pieces
    produced by leading/trailing separators are kept here — callers
    filter them after flattening (cheaper than per-list filtering).
    """
    lowered = pc.utf8_lower(pc.fill_null(col, ""))
    return pc.split_pattern_regex(lowered, _SPLIT_PATTERN)


def flatten_tokens(
    tokens: pa.ChunkedArray | pa.Array,
) -> tuple[pa.Array, pa.Array]:
    """list<string> tokens -> (flat non-empty tokens, parent row indices)."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    flat = pc.list_flatten(tokens)
    parent = pc.list_parent_indices(tokens)
    keep = pc.not_equal(flat, "")
    return flat.filter(keep), parent.filter(keep)


class Analyzer:
    """Injectable analyzer — SURVEY.md §2.10's extension surface (the
    analog of the reference's pluggable enrichment chain,
    harvester/collection_registry_client.py:123-140).

    An analyzer is a NAME plus two consistent tokenizers: the Python
    one (queries, oracles) and the Arrow column one (the build hot
    path); ``text.tokenize(s) == column tokenizer's non-empty pieces``
    is the contract every index relies on. The name is persisted in
    stage params and stats.json, so an index remembers its analyzer
    and resumes/queries resolve it from the registry — register custom
    analyzers at module import time (workers import the same module).
    """

    __slots__ = ("name", "tokenize", "tokenize_column")

    def __init__(self, name, tokenize_fn, tokenize_column_fn):
        self.name = name
        self.tokenize = tokenize_fn
        self.tokenize_column = tokenize_column_fn


DEFAULT_ANALYZER = Analyzer("default", tokenize, tokenize_column)
_ANALYZERS: dict[str, Analyzer] = {"default": DEFAULT_ANALYZER}


def register_analyzer(analyzer: Analyzer) -> Analyzer:
    _ANALYZERS[analyzer.name] = analyzer
    return analyzer


def get_analyzer(name: str) -> Analyzer:
    try:
        return _ANALYZERS[name]
    except KeyError:
        raise KeyError(
            f"unknown analyzer {name!r}; register it with "
            "functions.text.register_analyzer in a module your workers "
            f"import (registered: {sorted(_ANALYZERS)})"
        ) from None


def normalize_sort_text(
    text: str | None,
    default_missing: str = "~title unknown",
    missing_equivalents: tuple[str, ...] = ("title unknown",),
) -> str:
    """Reference-parity sort-key normalizer.

    Mirrors ``normalize_sort_field`` (harvester/solr_updater.py:561-573)
    exactly: lowercase, strip non-alphanumeric-non-space, drop a leading
    English article by WORD comparison (so a bare 'the'/'a'/'an' maps to
    empty → the sentinel); whitespace collapses only via the
    article-drop rejoin, as in the reference; empty results and
    ``missing_equivalents`` values map to ``default_missing`` (sorts
    after everything alphabetical).
    """
    if not text:
        return default_missing
    s = _RE_ALPHANUMSPACE.sub("", text.lower())
    words = s.split()
    if words and words[0] in _ARTICLES:
        s = " ".join(words[1:])
    if not s or s in missing_equivalents:
        return default_missing
    return s


def hash64_bytes(data: bytes) -> int:
    """Stable 64-bit signed hash of bytes (blake2b-8, big-endian)."""
    h = hashlib.blake2b(data, digest_size=8).digest()
    return int.from_bytes(h, "big", signed=True)


def hash64(text: str) -> int:
    """Stable 64-bit signed hash of a unicode string (utf-8)."""
    return hash64_bytes(text.encode("utf-8"))


def hash64_array(strings: pa.Array | pa.ChunkedArray | list[str]) -> np.ndarray:
    """hash64 over a string column -> int64 ndarray.

    Hot-path note: callers hash only *unique* values per batch
    (dictionary-encode first); per-unique-value Python cost is then
    bounded by vocabulary size, not row count.
    """
    if isinstance(strings, (pa.Array, pa.ChunkedArray)):
        strings = strings.to_pylist()
    out = np.empty(len(strings), dtype=np.int64)
    blake2b = hashlib.blake2b
    from_bytes = int.from_bytes
    for i, s in enumerate(strings):
        d = blake2b((s or "").encode("utf-8"), digest_size=8).digest()
        out[i] = from_bytes(d, "big", signed=True)
    return out


def apply_over_unique(
    col: pa.Array | pa.ChunkedArray,
    fn,
    out_type: pa.DataType = None,
) -> pa.Array:
    """Apply a Python scalar function to a column in O(unique values):
    dictionary-encode, run ``fn`` once per dictionary entry, take by
    index. The scale pattern for bounded-vocabulary scalar UDFs
    (normalize_type-style remaps: millions of rows, dozens of distinct
    inputs) — per-row cost collapses to one int take."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    denc = col.dictionary_encode()
    mapped = pa.array(
        [fn(v) for v in denc.dictionary.to_pylist()],
        out_type or pa.string(),
    )
    out = mapped.take(denc.indices)
    if col.null_count:
        # parity with a per-row loop: nulls go THROUGH fn, they don't
        # short-circuit (fn(None) may map to a sentinel). Fill ONLY the
        # positions where the INPUT was null — a non-null input that fn
        # legitimately mapped to None must stay None (blanket fill_null
        # would overwrite it too).
        null_mapped = fn(None)
        if null_mapped is not None:
            out = pc.if_else(
                pc.is_null(col), pa.scalar(null_mapped, out.type), out
            )
    return out


# ── "porter_en" analyzer: English stopwords + Porter (1980) stemming ─
#
# The reference delegates stop/stem analysis to its Solr schema side
# (SURVEY §2.10 — the index schema ships stop/stem filters); this is
# the engine-owned second analyzer through the same registry plug
# point. The stemmer is a faithful implementation of M. Porter, "An
# algorithm for suffix stripping", Program 14(3) 1980 — including the
# author's two published departures (bli→ble, logi→log).

# Lucene/Solr classic English stopword set (the 33-word public list)
ENGLISH_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on "
    "or such that the their then there these they this to was will "
    "with".split()
)


class _Porter:
    """Porter 1980, ported from the reference implementation's
    b/k/j state machine."""

    __slots__ = ("b", "k", "j")

    def _cons(self, i: int) -> bool:
        ch = self.b[i]
        if ch in "aeiou":
            return False
        if ch == "y":
            return True if i == 0 else not self._cons(i - 1)
        return True

    def _m(self) -> int:
        n = i = 0
        j = self.j
        while True:
            if i > j:
                return n
            if not self._cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if self._cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not self._cons(i):
                    break
                i += 1
            i += 1

    def _vowelinstem(self) -> bool:
        return any(not self._cons(i) for i in range(self.j + 1))

    def _doublec(self, j: int) -> bool:
        return j >= 1 and self.b[j] == self.b[j - 1] and self._cons(j)

    def _cvc(self, i: int) -> bool:
        if (
            i < 2
            or not self._cons(i)
            or self._cons(i - 1)
            or not self._cons(i - 2)
        ):
            return False
        return self.b[i] not in "wxy"

    def _ends(self, s: str) -> bool:
        length = len(s)
        if length > self.k + 1:
            return False
        if self.b[self.k - length + 1 : self.k + 1] != s:
            return False
        self.j = self.k - length
        return True

    def _setto(self, s: str) -> None:
        self.b = self.b[: self.j + 1] + s
        self.k = len(self.b) - 1

    def _r(self, s: str) -> None:
        if self._m() > 0:
            self._setto(s)

    def _step1ab(self) -> None:
        if self.b[self.k] == "s":
            if self._ends("sses"):
                self.k -= 2
            elif self._ends("ies"):
                self._setto("i")
            elif self.b[self.k - 1] != "s":
                self.k -= 1
        if self._ends("eed"):
            if self._m() > 0:
                self.k -= 1
        elif (self._ends("ed") or self._ends("ing")) and self._vowelinstem():
            self.k = self.j
            if self._ends("at"):
                self._setto("ate")
            elif self._ends("bl"):
                self._setto("ble")
            elif self._ends("iz"):
                self._setto("ize")
            elif self._doublec(self.k):
                self.k -= 1
                if self.b[self.k] in "lsz":
                    self.k += 1
            elif self._m() == 1 and self._cvc(self.k):
                self._setto("e")

    def _step1c(self) -> None:
        if self._ends("y") and self._vowelinstem():
            self.b = self.b[: self.k] + "i" + self.b[self.k + 1 :]

    def _step2(self) -> None:
        if self.k == 0:
            return
        ch = self.b[self.k - 1]
        if ch == "a":
            if self._ends("ational"):
                self._r("ate")
            elif self._ends("tional"):
                self._r("tion")
        elif ch == "c":
            if self._ends("enci"):
                self._r("ence")
            elif self._ends("anci"):
                self._r("ance")
        elif ch == "e":
            if self._ends("izer"):
                self._r("ize")
        elif ch == "l":
            if self._ends("bli"):
                self._r("ble")
            elif self._ends("alli"):
                self._r("al")
            elif self._ends("entli"):
                self._r("ent")
            elif self._ends("eli"):
                self._r("e")
            elif self._ends("ousli"):
                self._r("ous")
        elif ch == "o":
            if self._ends("ization"):
                self._r("ize")
            elif self._ends("ation"):
                self._r("ate")
            elif self._ends("ator"):
                self._r("ate")
        elif ch == "s":
            if self._ends("alism"):
                self._r("al")
            elif self._ends("iveness"):
                self._r("ive")
            elif self._ends("fulness"):
                self._r("ful")
            elif self._ends("ousness"):
                self._r("ous")
        elif ch == "t":
            if self._ends("aliti"):
                self._r("al")
            elif self._ends("iviti"):
                self._r("ive")
            elif self._ends("biliti"):
                self._r("ble")
        elif ch == "g":
            if self._ends("logi"):
                self._r("log")

    def _step3(self) -> None:
        ch = self.b[self.k]
        if ch == "e":
            if self._ends("icate"):
                self._r("ic")
            elif self._ends("ative"):
                self._r("")
            elif self._ends("alize"):
                self._r("al")
        elif ch == "i":
            if self._ends("iciti"):
                self._r("ic")
        elif ch == "l":
            if self._ends("ical"):
                self._r("ic")
            elif self._ends("ful"):
                self._r("")
        elif ch == "s":
            if self._ends("ness"):
                self._r("")

    def _step4(self) -> None:
        if self.k == 0:
            return
        ch = self.b[self.k - 1]
        if ch == "a":
            if not self._ends("al"):
                return
        elif ch == "c":
            if not (self._ends("ance") or self._ends("ence")):
                return
        elif ch == "e":
            if not self._ends("er"):
                return
        elif ch == "i":
            if not self._ends("ic"):
                return
        elif ch == "l":
            if not (self._ends("able") or self._ends("ible")):
                return
        elif ch == "n":
            if not (
                self._ends("ant")
                or self._ends("ement")
                or self._ends("ment")
                or self._ends("ent")
            ):
                return
        elif ch == "o":
            if self._ends("ion") and self.j >= 0 and self.b[self.j] in "st":
                pass
            elif self._ends("ou"):
                pass
            else:
                return
        elif ch == "s":
            if not self._ends("ism"):
                return
        elif ch == "t":
            if not (self._ends("ate") or self._ends("iti")):
                return
        elif ch == "u":
            if not self._ends("ous"):
                return
        elif ch == "v":
            if not self._ends("ive"):
                return
        elif ch == "z":
            if not self._ends("ize"):
                return
        else:
            return
        if self._m() > 1:
            self.k = self.j

    def _step5(self) -> None:
        self.j = self.k
        if self.b[self.k] == "e":
            a = self._m()
            if a > 1 or (a == 1 and not self._cvc(self.k - 1)):
                self.k -= 1
        if (
            self.b[self.k] == "l"
            and self._doublec(self.k)
            and self._m() > 1
        ):
            self.k -= 1

    def stem(self, w: str) -> str:
        if len(w) <= 2:
            return w
        self.b, self.k, self.j = w, len(w) - 1, 0
        self._step1ab()
        self._step1c()
        self._step2()
        self._step3()
        self._step4()
        self._step5()
        return self.b[: self.k + 1]


def porter_stem(word: str) -> str:
    """Stem one (already-lowercased) token."""
    return _Porter().stem(word)


def tokenize_porter(text: str | None) -> list[str]:
    """porter_en analyzer, Python side: base tokens → drop English
    stopwords → Porter stem."""
    return [
        porter_stem(t) for t in tokenize(text) if t not in ENGLISH_STOPWORDS
    ]


def tokenize_column_porter(
    col: pa.ChunkedArray | pa.Array,
) -> pa.Array:
    """porter_en analyzer, Arrow side: the stem/stop map runs once per
    UNIQUE token of the batch (dictionary encode), then a take rebuilds
    the flat token values under the original list offsets. Stopwords
    map to "" — the analyzer contract says callers drop empty pieces
    after flattening."""
    lists = tokenize_column(col)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = pc.list_flatten(lists)
    enc = flat.dictionary_encode()
    stemmer = _Porter()
    mapped = pa.array(
        [
            ""
            if (not u) or u in ENGLISH_STOPWORDS
            else stemmer.stem(u)
            for u in enc.dictionary.to_pylist()
        ],
        pa.string(),
    )
    new_flat = mapped.take(enc.indices)
    return pa.ListArray.from_arrays(lists.offsets, new_flat)


register_analyzer(Analyzer("porter_en", tokenize_porter, tokenize_column_porter))
