"""URL kernels for the webtext axis: canonicalization, host/domain
extraction, and the deterministic messy-URL synthesis the oracle gate
mirrors in closed form.

Every Common-Crawl-scale curation pipeline canonicalizes URLs before
url-level dedup (the reference harvests by url identity too — its
couchdb doc ids are `<collection>--<url-ish id>`, built once per
harvested record, /root/reference/harvester/fetcher.py's build of
couchdb `_id`s). The kernels here are fully vectorized Arrow/numpy —
regex parse via ``pc.extract_regex``, query-param sort via one numpy
lexsort over the flattened param stream, re-joined with
``pc.binary_join`` — so a 10^12-row url column canonicalizes as a
map-only stage with zero Python-per-row work.

Canonical form (the documented rule, shared with the SQL twins):

1. scheme and host lowercased;
2. default ports stripped (``:80`` for http, ``:443`` for https);
   any other explicit port kept;
3. fragment dropped;
4. ``utm_*`` tracking params dropped; remaining query params sorted
   by UTF-8 byte order and re-joined with ``&`` (empty result drops
   the ``?``);
5. trailing slashes stripped from the path; an empty path becomes
   ``/``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# scheme://netloc path ?query #fragment — anchored, fragment discarded
# at the parse. Rows that do not look like absolute URLs come back
# null from extract_regex; canonicalize_urls surfaces them as nulls.
_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
    r"(?P<netloc>[^/?#]*)"
    r"(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?"
    r"(?:#.*)?$"
)
_NETLOC_RE = r"^(?P<host>[^:]*)(?::(?P<port>[0-9]+))?$"


def _sorted_query(query: pa.Array) -> pa.Array:
    """Per-row: drop empty/utm_* params, byte-sort the rest, re-join
    with '&'. Vectorized: one split, one flattened lexsort, one
    binary_join — no per-row Python."""
    query = pc.fill_null(query, "")
    parts = pc.split_pattern(query, "&")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    vals = parts.flatten()
    offs = parts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(parts)
    counts = offs[1:] - offs[:-1]
    parents = np.repeat(np.arange(n, dtype=np.int64), counts)
    sval = vals.to_numpy(zero_copy_only=False).astype(str)
    keep = (sval != "") & ~np.char.startswith(sval, "utm_")
    parents = parents[keep]
    sval = sval[keep]
    # numpy unicode compare is by codepoint, which equals UTF-8 byte
    # order (UTF-8 is order-preserving) — matches DuckDB list_sort
    order = np.lexsort((sval, parents))
    parents = parents[order]
    sval = sval[order]
    new_counts = np.bincount(parents, minlength=n)
    new_offs = np.concatenate([[0], np.cumsum(new_counts)]).astype(np.int32)
    lst = pa.ListArray.from_arrays(
        pa.array(new_offs), pa.array(sval, pa.string())
    )
    return pc.binary_join(lst, "&")


def canonicalize_urls(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized canonical form of an absolute-URL string column (see
    module docstring for the rule). Non-URL rows canonicalize to null."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    parsed = pc.extract_regex(urls, _URL_RE)
    scheme = pc.utf8_lower(pc.struct_field(parsed, "scheme"))
    netloc = pc.struct_field(parsed, "netloc")
    nl = pc.extract_regex(netloc, _NETLOC_RE)
    host = pc.utf8_lower(pc.struct_field(nl, "host"))
    port = pc.struct_field(nl, "port")
    path = pc.struct_field(parsed, "path")
    query = pc.struct_field(parsed, "query")

    # extract_regex yields "" (not null) for unmatched optional groups
    port = pc.fill_null(port, "")
    has_port = pc.not_equal(port, "")
    default_port = pc.or_(
        pc.and_(pc.equal(scheme, "http"), pc.equal(port, "80")),
        pc.and_(pc.equal(scheme, "https"), pc.equal(port, "443")),
    )
    port_part = pc.if_else(
        pc.and_(has_port, pc.invert(pc.fill_null(default_port, False))),
        pc.binary_join_element_wise(":", port, ""),
        "",
    )

    path = pc.fill_null(path, "")
    path = pc.replace_substring_regex(path, "/+$", "")
    path = pc.if_else(pc.equal(path, ""), "/", path)

    q = _sorted_query(query)
    q_part = pc.if_else(
        pc.equal(q, ""),
        "",
        pc.binary_join_element_wise("?", q, ""),
    )

    out = pc.binary_join_element_wise(
        scheme, "://", host, port_part, path, q_part, ""
    )
    # propagate parse failure as null (binary_join_element_wise with a
    # null scheme already yields null; make it explicit for readers)
    return pc.if_else(pc.is_valid(scheme), out, pa.scalar(None, pa.string()))


def host_of(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Lowercased host (no port) of an absolute-URL column."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    parsed = pc.extract_regex(urls, _URL_RE)
    nl = pc.extract_regex(pc.struct_field(parsed, "netloc"), _NETLOC_RE)
    return pc.utf8_lower(pc.struct_field(nl, "host"))


def registrable_domain(hosts: pa.Array) -> pa.Array:
    """Last two dot-labels of the host ('www.a.example.com' ->
    'example.com'). A deliberate simplification of the public-suffix
    list (not shipped in this sandbox); single-label hosts pass
    through unchanged."""
    return pc.replace_substring_regex(
        hosts, r"^.*?([^.]+\.[^.]+)$", r"\1"
    )


# ---------------------------------------------------------------------------
# Deterministic messy-URL synthesis over the documents table. The SQL
# oracles rebuild BOTH the messy string and its closed-form canonical
# from the same (doc_id, source) arithmetic, so the general parser
# above is gated end to end by the value hash. ASCII only.

SNAP_TS_MULT = 2654435761  # Knuth multiplicative hash constant
SNAP_TS_MOD = 100_000_000


def synth_urls(doc_id: pa.Array, source: pa.Array) -> pa.Array:
    """Messy absolute URL per document: mixed-case scheme/host, www
    subdomains, default and non-default explicit ports, trailing
    slashes, unsorted query params with utm_ tracking noise, and
    fragments — every clause of the canonical rule exercised."""
    d = doc_id.to_numpy(zero_copy_only=False).astype(np.int64)
    src = source.to_numpy(zero_copy_only=False).astype(str)

    m3 = d % 3
    scheme = np.where(m3 == 0, "HTTP", np.where(m3 == 1, "https", "http"))
    # (d // 7) % 4, not d % 4: the testdata assigns source = doc_id
    # mod #sources, so any pure doc_id % k with k | #sources would be
    # CONSTANT within a source and every domain would have one host
    m4 = (d // 7) % 4
    sub = np.where(
        m4 == 0, "www.", np.where(m4 == 2, "m.", np.where(m4 == 3, "blog.", ""))
    )
    name = np.where(d % 2 == 0, np.char.upper(src), src)
    # registrable domain = <source>.com, so domain_profile folds the
    # per-source subdomain/case variants back onto one domain row
    host = np.char.add(np.char.add(sub, name), ".COM")
    default_port = np.where(m3 == 1, ":443", ":80")  # https iff m3==1
    port = np.where(
        d % 5 == 0, default_port, np.where(d % 7 == 0, ":8080", "")
    )
    path = np.char.add(
        "/articles/", (d % 97).astype(str)
    )
    path = np.char.add(path, np.where(d % 6 == 0, "/", ""))
    utm = np.where(d % 2 == 0, "utm_source=feed&", "")
    ref = np.where(d % 3 == 0, "ref=home&", "")
    q = np.char.add(
        "?", np.char.add(np.char.add(utm, ref), np.char.add("id=", (d % 13).astype(str)))
    )
    frag = np.where(d % 4 == 1, "#section-2", "")

    out = np.char.add(scheme, "://")
    for part in (host, port, path, q, frag):
        out = np.char.add(out, part)
    return pa.array(out.tolist(), pa.string())


def synth_snap_ts(doc_id: pa.Array) -> pa.Array:
    """Deterministic pseudo-snapshot timestamp (integer, exactly
    mirrored by the SQL twin): (doc_id * Knuth) % 1e8."""
    d = doc_id.to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.array((d * SNAP_TS_MULT) % SNAP_TS_MOD, pa.int64())
