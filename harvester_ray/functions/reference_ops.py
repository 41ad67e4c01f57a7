"""Reference-parity scalar operators (SURVEY.md §2.3, §2.8).

Each function re-implements, from its documented semantics, one of the
reference's per-record scalar transforms; unit tests assert the same
input→output behavior the reference's tests pin down. These are the
building blocks behind several oracle-checked queries() entries
(orders_year_counts, orders_decade_facets, events_props_sum,
part_sort_names).
"""

from __future__ import annotations

import json
import re
from datetime import datetime, timezone

# ark finder — harvester/solr_updater.py:29 (RE_ARK_FINDER)
RE_ARK_FINDER = re.compile(r"(ark:/\d\d\d\d\d/[^/|\s]*)")

# year-range collapse — harvester/post_processing/fix_repeated_displayDate.py:5-19
_RE_YEAR_RANGE = re.compile(r"\b(\d{4})\s*-\s*(\d{4})\b")


def make_datetime(value: str | None) -> datetime | None:
    """Parse 'YYYY' or 'YYYY-MM-DD' into a tz-aware UTC datetime, else
    None — the reference's date parser (harvester/solr_updater.py:197-225)."""
    if not value:
        return None
    value = value.strip()
    for fmt in ("%Y-%m-%d", "%Y"):
        try:
            return datetime.strptime(value, fmt).replace(tzinfo=timezone.utc)
        except ValueError:
            continue
    return None


def get_facet_decades(display_date: str | None) -> set[str]:
    """displayDate string → set of decade buckets, 'unknown' on miss —
    the reference's decade facet (harvester/solr_updater.py:547-558,
    625-654): every 4-digit year in [1000, current] contributes its
    decade; a YYYY-YYYY range fills the decades between."""
    if not display_date:
        return {"unknown"}
    years = [int(y) for y in re.findall(r"\b(\d{4})\b", display_date)]
    years = [y for y in years if 1000 <= y <= 2100]
    if not years:
        return {"unknown"}
    lo, hi = min(years), max(years)
    return {f"{d}s" for d in range((lo // 10) * 10, (hi // 10) * 10 + 1, 10)}


def find_ark(identifiers: list[str] | None) -> str | None:
    """First ark-shaped identifier in a list — the reference's
    ``find_ark_in_identifiers`` (harvester/solr_updater.py:302-309)."""
    for ident in identifiers or []:
        m = RE_ARK_FINDER.search(ident or "")
        if m:
            return m.group(1)
    return None


def fix_repeated_date(display_date: str | None) -> str | None:
    """Rewrite 'YYYY-YYYY' with equal years to 'YYYY' — the reference's
    ``fix_repeated_date``
    (harvester/post_processing/fix_repeated_displayDate.py:5-19)."""
    if not display_date:
        return display_date

    def collapse(m: re.Match) -> str:
        return m.group(1) if m.group(1) == m.group(2) else m.group(0)

    return _RE_YEAR_RANGE.sub(collapse, display_date)


def dedupe_list(values: list) -> list:
    """Order-preserving exact dedup of a list, dict-safe — the
    reference's per-record list dedup
    (harvester/post_processing/dedupe_sourceresource.py:4-17)."""
    seen: list = []
    for v in values or []:
        if v not in seen:
            seen.append(v)
    return seen


def json_field(value: str | None, key: str):
    """Extract one field from a JSON-encoded string, None on any
    mismatch — the scalar core of the reference's ``dejson`` /
    ``unpack_if_json`` (harvester/solr_updater.py:137-180)."""
    if not value:
        return None
    try:
        obj = json.loads(value)
    except (ValueError, TypeError):
        return None
    if isinstance(obj, dict):
        return obj.get(key)
    return None


def unpack_if_json(data):
    """If ``data`` is a JSON-encoded string of a dict, flatten to its
    'name' value; otherwise return unchanged — the reference's
    ``unpack_if_json`` (harvester/solr_updater.py:146-158)."""
    try:
        obj = json.loads(data)
    except (ValueError, TypeError):
        return data
    if isinstance(obj, dict):
        return obj.get("name", data)
    return data


def dejson(data):
    """Recursive de-jsonification — the reference's ``dejson``
    (harvester/solr_updater.py:161-180): lists flatten element-wise,
    dicts flatten to their first of 'item'/'name'/'text', strings that
    parse as JSON dicts flatten to 'name'; everything else passes
    through. Falsy input returns unchanged."""
    if not data:
        return data
    if isinstance(data, list):
        return [dejson(d) for d in data]
    if isinstance(data, dict):
        flat = data.get("item", data.get("name", data.get("text", None)))
        return flat if flat else data
    return unpack_if_json(data)


def get_dates_from_date_obj(date_obj):
    """One date object → (displayDate, start datetime, end datetime) —
    the reference's ``get_dates_from_date_obj``
    (harvester/solr_updater.py:228-239): dicts unpack
    {displayDate, begin, end}; bare strings are display-only."""
    if isinstance(date_obj, dict):
        return (
            date_obj.get("displayDate", None),
            make_datetime(date_obj.get("begin", None)),
            make_datetime(date_obj.get("end", None)),
        )
    if isinstance(date_obj, str):
        return date_obj, None, None
    return None, None, None


def unpack_date(date_obj):
    """Polymorphic date object(s) → (displayDates, start datetimes,
    end datetimes) — the reference's ``unpack_date``
    (harvester/solr_updater.py:241-268): accepts one dict, a string,
    or a list of either; empty input → (None, None, None)."""
    if not date_obj or not len(date_obj):
        return None, None, None
    dates, starts, ends = [], [], []
    objs = [date_obj] if isinstance(date_obj, (dict, str)) else date_obj
    for dt in objs:
        display, s, e = get_dates_from_date_obj(dt)
        dates.append(display)
        if s:
            starts.append(s)
        if e:
            ends.append(e)
    return dates, starts, ends


def map_date(record: dict) -> dict:
    """record['date'] → {date, sort_date_start, sort_date_end} — the
    reference's ``map_date`` (harvester/solr_updater.py:271-299):
    earliest start/end win; a missing start/end is backfilled from the
    other."""
    date_source = record.get("date", None)
    if not date_source:
        return {}
    dates, starts, ends = unpack_date(date_source)
    out = {"date": dates}
    start = sorted(starts)[0] if starts else None
    end = sorted(ends)[0] if ends else None
    start = end if not start else start
    end = start if not end else end
    if start:
        out["sort_date_start"] = start
        out["sort_date_end"] = end
    return out


DCMI_TYPES = (
    "collection", "dataset", "event", "image", "interactive resource",
    "moving image", "service", "software", "sound", "text",
    "physical object",
)


def normalize_type(value):
    """DCMI type normalization with substring fallbacks — the
    reference's ``normalize_type`` (harvester/solr_updater.py:388-418):
    non-DCMI values containing 'physical'/'moving' map to their DCMI
    term; anything else passes through (facet visibility). Lists map
    element-wise."""

    def norm(d: str) -> str:
        if d not in DCMI_TYPES:
            if "physical" in d.lower():
                return "physical object"
            if "moving" in d.lower():
                return "moving image"
        return d

    if value is None:
        return None
    if isinstance(value, list):
        return [norm(d) for d in value]
    return norm(value)


def add_slash(url: str) -> str:
    """Trailing slash if missing (harvester/solr_updater.py:476-478)."""
    return url if url.endswith("/") else url + "/"


def get_sort_collection_data_string(collection: dict) -> str:
    """'sortname:name:url/' string (harvester/solr_updater.py:576-587;
    note the reference joins with a SINGLE colon despite its docstring)."""
    from harvester_ray.functions.text import normalize_sort_text

    sort_name = normalize_sort_text(
        collection["name"],
        default_missing="~collection unknown",
        missing_equivalents=(),
    )
    return ":".join(
        (sort_name, collection["name"], add_slash(collection["@id"]))
    )


class OldCollectionException(Exception):
    """Collection without a repository (harvester/solr_updater.py:481)."""


def map_registry_data(collections: list[dict]) -> dict:
    """Struct-list → parallel url/name/'url::name' column projection —
    the reference's ``map_registry_data``
    (harvester/solr_updater.py:485-544). Campus keys appear only when
    some collection carries a campus; a collection without a
    repository raises OldCollectionException."""
    collection_urls, collection_names = [], []
    collection_datas, collection_sort_datas = [], []
    repository_urls, repository_names, repository_datas = [], [], []
    campus_urls = campus_names = campus_datas = None
    for collection in collections:
        collection_urls.append(add_slash(collection["@id"]))
        collection_names.append(collection["name"])
        collection_datas.append(
            "::".join((add_slash(collection["@id"]), collection["name"]))
        )
        collection_sort_datas.append(
            get_sort_collection_data_string(collection)
        )
        if "campus" in collection:
            campus_urls, campus_names, campus_datas = [], [], []
            campuses = collection["campus"]
            campus_urls.extend(add_slash(c["@id"]) for c in campuses)
            campus_names.extend(c["name"] for c in campuses)
            campus_datas.extend(
                "::".join((add_slash(c["@id"]), c["name"])) for c in campuses
            )
        try:
            repositories = collection["repository"]
        except KeyError:
            raise OldCollectionException
        repository_urls.extend(add_slash(r["@id"]) for r in repositories)
        repository_names.extend(r["name"] for r in repositories)
        for repo in repositories:
            data = "::".join((add_slash(repo["@id"]), repo["name"]))
            if "campus" in repo and len(repo["campus"]):
                data = "::".join(
                    (add_slash(repo["@id"]), repo["name"],
                     repo["campus"][0]["name"])
                )
            repository_datas.append(data)
    out = dict(
        collection_url=collection_urls,
        collection_name=collection_names,
        collection_data=collection_datas,
        sort_collection_data=collection_sort_datas,
        repository_url=repository_urls,
        repository_name=repository_names,
        repository_data=repository_datas,
    )
    if campus_urls:
        out.update(
            campus_url=campus_urls,
            campus_name=campus_names,
            campus_data=campus_datas,
        )
    return out


def getprop(obj, path: str, default=None):
    """'/'-delimited nested get — the reference's path accessor
    (harvester/post_processing/batch_update_couchdb_by_collection.py:11-48)."""
    cur = obj
    for part in path.split("/"):
        if isinstance(cur, dict) and part in cur:
            cur = cur[part]
        else:
            return default
    return cur


def setprop(obj: dict, path: str, value) -> dict:
    """'/'-delimited nested set (creates intermediate dicts) — the
    write half of the reference's path accessor (same citation)."""
    parts = path.split("/")
    cur = obj
    for part in parts[:-1]:
        cur = cur.setdefault(part, {})
    cur[parts[-1]] = value
    return obj


def setprop_replace(
    obj, path: str, val, substring=None, key_error_as_none: bool = False
):
    """Reference-exact ``setprop`` with substring-replace semantics
    (harvester/post_processing/batch_update_couchdb_by_collection.py:
    11-48): at the leaf, a list is rewritten element-wise; with
    ``substring`` set, occurrences of it are replaced by ``val``
    instead of overwriting; missing path raises KeyError unless
    ``key_error_as_none``. Intermediate lists descend into their first
    element, as in the reference."""
    if "/" not in path:
        if path not in obj:
            if not key_error_as_none:
                raise KeyError(f"Path not found in object: {path}")
            return None
        if isinstance(obj[path], list):
            obj[path] = [
                (t.replace(substring, val) if substring else val)
                for t in obj[path]
            ]
            return None
        obj[path] = (
            obj[path].replace(substring, val) if substring else val
        )
        return None
    if isinstance(obj, list):
        obj = obj[0]
    head, rest = path.lstrip("/").split("/", 1)
    if head not in obj:
        if not key_error_as_none:
            raise KeyError(f"Path not found in object: {path} ({head})")
        return None
    return setprop_replace(obj[head], rest, val, substring, key_error_as_none)
