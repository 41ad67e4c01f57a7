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
