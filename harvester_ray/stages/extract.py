"""HTML→text extraction: the stateful actor-pool stage.

The new-engine analog of the reference's record→document transform
(``map_couch_to_solr_doc``, harvester/solr_updater.py:688-745) plus its
validation gate (``has_required_fields``, :445-473) with per-reason
reject counting (:841-861). Contract (BASELINE.json input_hint):
**byte-identical extracted text per url** — rows arriving with
non-null ``text`` pass through verbatim (cheap path); null ``text``
rows are parsed from ``html``.

Extraction spec: text content of <title>, <h1> and <p> elements in
document order, entities unescaped, joined by "\\n"; <script>/<style>
content dropped. corpus.generate_pages emits HTML whose expected text
follows exactly this spec, giving the golden byte-equality tests.

Ray shape: ``pages.map_batches(HtmlExtractor, batch_format="pyarrow",
batch_size=cfg.extract_batch_size, concurrency=cfg.extract_concurrency)``
— HTML rows are potentially MBs, so batches stay small and blocks stay
zero-copy Arrow (SURVEY.md §7 hard parts (a),(f)).
"""

from __future__ import annotations

from html.parser import HTMLParser

import numpy as np
import pyarrow as pa

from harvester_ray.functions.text import hash64

REJECT_EMPTY_TEXT = "empty_text"
REJECT_MISSING_LANG = "missing_lang"

_CAPTURE_TAGS = frozenset({"title", "h1", "p"})
_SKIP_TAGS = frozenset({"script", "style"})


class _TextExtractor(HTMLParser):
    """Single-pass extractor; reset + feed per document (parser instance
    reused across the actor's lifetime)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.tags: list[str] = []
        self._buf: list[str] | None = None
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif tag in _CAPTURE_TAGS and self._skip == 0:
            self._buf = []

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
        elif tag in _CAPTURE_TAGS and self._buf is not None:
            self.parts.append("".join(self._buf))
            self.tags.append(tag)
            self._buf = None

    def handle_data(self, data):
        if self._buf is not None and self._skip == 0:
            self._buf.append(data)

    def extract(self, html_bytes: bytes) -> str:
        self.reset()
        self.parts = []
        self.tags = []
        self._buf = None
        self._skip = 0
        self.feed(html_bytes.decode("utf-8", errors="replace"))
        self.close()
        return "\n".join(self.parts)

    def extract_fielded(self, html_bytes: bytes) -> tuple[str, str]:
        """(title, body): <title> element contents vs everything else
        captured (<h1>/<p>), each joined by "\\n" in document order —
        the REAL multi-field index document of the reference
        (map_couch_to_solr_doc's title field,
        harvester/solr_updater.py:64-134). Token multisets satisfy
        tokens(extract()) == tokens(title) ⊎ tokens(body), so the
        single-field index over extract() text is the exact
        whole-document idf source for BM25F over these fields."""
        self.extract(html_bytes)
        title = "\n".join(
            p for p, t in zip(self.parts, self.tags) if t == "title"
        )
        body = "\n".join(
            p for p, t in zip(self.parts, self.tags) if t != "title"
        )
        return title, body


class HtmlExtractor:
    """Actor-pool extraction stage (the reference's ImageHarvester role:
    heavy per-row fallible work with shared per-worker state,
    harvester/image_harvest.py:168-211). Parser built once per actor.

    Output schema (FIXTURES.md §3 `extracted`):
    (doc_id, url, text, lang, n_chars, reject_reason[null=valid]).
    """

    def __init__(self, require_lang: bool = True):
        self.parser = _TextExtractor()
        self.require_lang = require_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        htmls = batch["html"].to_pylist()
        langs = batch["lang"].to_pylist()
        out_text: list[str] = []
        rejects: list[str | None] = []
        for text, html, lang in zip(texts, htmls, langs):
            if text is None:
                text = self.parser.extract(html or b"")
            reason = None
            if not text:
                reason = REJECT_EMPTY_TEXT
            elif self.require_lang and not lang:
                reason = REJECT_MISSING_LANG
            out_text.append(text)
            rejects.append(reason)
        doc_ids = np.fromiter((hash64(u) for u in urls), np.int64, len(urls))
        n_chars = np.fromiter((len(t) for t in out_text), np.int64, len(out_text))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "url": pa.array(urls, pa.string()),
                "text": pa.array(out_text, pa.large_string()),
                "lang": pa.array(langs, pa.string()),
                "n_chars": pa.array(n_chars, pa.int64()),
                "reject_reason": pa.array(rejects, pa.string()),
            }
        )


def extract_pages(
    pages: "ray.data.Dataset",
    batch_size: int = 128,
    concurrency=4,
) -> "ray.data.Dataset":
    """pages (url, warc_ts, html, text, lang) → extracted table."""
    import ray.data  # noqa: F401

    return pages.map_batches(
        HtmlExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def split_valid(extracted: "ray.data.Dataset"):
    """(valid rows, reject-reason counts Dataset) — the reference's
    typed-exception report (harvester/solr_updater.py:841-861) as a
    grouped count. Count-reconciliation invariant:
    rows_in == valid + sum(reject counts)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    valid = extracted.map_batches(
        lambda t: t.filter(pc.is_null(t["reject_reason"])),
        batch_format="pyarrow",
    )
    rejects = (
        extracted.map_batches(
            lambda t: t.filter(pc.is_valid(t["reject_reason"])),
            batch_format="pyarrow",
        )
        .groupby("reject_reason")
        .aggregate(Count(alias_name="n"))
    )
    return valid, rejects


class FieldedHtmlExtractor:
    """Actor-pool MULTI-FIELD extraction: (doc_id, url, title, body,
    lang, reject_reason) — the engine-side analog of the reference's
    many-field index document (title/description fields of
    map_couch_to_solr_doc, harvester/solr_updater.py:64-134). Rows
    arriving with pre-extracted ``text`` have no structure left, so
    they fall back to title="" / body=text (the reference's
    fill_in_title 'Title unknown' default, :611-622)."""

    def __init__(self, require_lang: bool = True):
        self.parser = _TextExtractor()
        self.require_lang = require_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        htmls = batch["html"].to_pylist()
        langs = batch["lang"].to_pylist()
        out_title: list[str] = []
        out_body: list[str] = []
        rejects: list[str | None] = []
        for text, html, lang in zip(texts, htmls, langs):
            if text is None:
                title, body = self.parser.extract_fielded(html or b"")
            else:
                title, body = "", text
            reason = None
            if not title and not body:
                reason = REJECT_EMPTY_TEXT
            elif self.require_lang and not lang:
                reason = REJECT_MISSING_LANG
            out_title.append(title)
            out_body.append(body)
            rejects.append(reason)
        doc_ids = np.fromiter((hash64(u) for u in urls), np.int64, len(urls))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "url": pa.array(urls, pa.string()),
                "title": pa.array(out_title, pa.large_string()),
                "body": pa.array(out_body, pa.large_string()),
                "lang": pa.array(langs, pa.string()),
                "reject_reason": pa.array(rejects, pa.string()),
            }
        )
