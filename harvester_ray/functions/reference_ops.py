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
