"""Deterministic synthetic web-page corpus (FIXTURES.md §1-2).

Generates the Common-Crawl-style pages table mandated by the
BASELINE.json input_hint — (url:string, warc_ts:timestamp[us],
html:binary, text:string nullable, lang:string) — plus the reference
query set, with a *computable golden contract*: for every row the
expected extracted text is produced alongside the HTML, so extraction
tests assert byte equality (the reference's golden-field test pattern,
test/test_solr_updater.py:104-145; SURVEY.md §5).

Everything is seeded (seed=42 default); paragraphs draw from a
Zipf-distributed vocabulary (s≈1.1, ~5000 terms) so head-term skew is
real; 5% of rows are edge cases (empty body, non-ASCII, nested tags,
duplicate paragraphs, entities).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

VOCAB_SIZE = 5000
ZIPF_S = 1.1
SEED = 42

_EDGE_EVERY = 20  # 5% of rows


def vocabulary(size: int = VOCAB_SIZE) -> list[str]:
    return [f"w{i}" for i in range(size)]


def _zipf_weights(size: int, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, size + 1, dtype=np.float64)
    w = ranks ** (-s)
    return w / w.sum()


def _para(rng: np.random.Generator, vocab: list[str], p: np.ndarray, n: int) -> str:
    idx = rng.choice(len(vocab), size=n, p=p)
    return " ".join(vocab[i] for i in idx)


def expected_text(title: str, h1: str, paras: list[str]) -> str:
    """The extraction contract: title, h1 and paragraph text contents in
    document order, entity-unescaped, joined by newlines."""
    parts = [title, h1] + [p for p in paras]
    return "\n".join(parts)


def generate_pages(
    n_rows: int, seed: int = SEED
) -> tuple[pa.Table, list[str]]:
    """Returns (pages table, expected extracted text per row)."""
    rng = np.random.default_rng(seed)
    vocab = vocabulary()
    p = _zipf_weights(len(vocab))
    urls, tss, htmls, texts, langs, expected = [], [], [], [], [], []
    langs_pool = ["en"] * 9 + ["de", "fr", "zh", ""]
    base_ts = np.datetime64("2024-01-01T00:00:00", "us")
    for i in range(n_rows):
        title = f"Page {i} " + _para(rng, vocab, p, 3)
        h1 = title
        edge = i % _EDGE_EVERY == _EDGE_EVERY - 1
        variant = i % 5
        if edge and variant == 0:
            paras: list[str] = []  # empty body
            body = ""
        elif edge and variant == 1:
            paras = ["CJK 中文 emoji \U0001f600 combining é " + _para(rng, vocab, p, 5)]
            body = f"<p>{paras[0]}</p>"
        elif edge and variant == 2:
            inner = _para(rng, vocab, p, 4)
            tail = _para(rng, vocab, p, 4)
            paras = [f"{inner} bolded {tail}"]
            body = f"<p>{inner} <b>bolded</b> {tail}</p>"
        elif edge and variant == 3:
            dup = _para(rng, vocab, p, 6)
            paras = [dup, dup]
            body = f"<p>{dup}</p><p>{dup}</p>"
        elif edge and variant == 4:
            raw = _para(rng, vocab, p, 4)
            paras = [f"{raw} & <tag> \"quoted\""]
            body = (
                f"<p>{raw} &amp; &lt;tag&gt; &quot;quoted&quot;</p>"
            )
        else:
            p1 = _para(rng, vocab, p, int(rng.integers(8, 40)))
            p2 = _para(rng, vocab, p, int(rng.integers(8, 40)))
            paras = [p1, p2]
            body = f"<p>{p1}</p><script>junk();var x=1;</script><p>{p2}</p>"
        exp = expected_text(title, h1, paras)
        html = (
            f"<html><head><title>{title}</title>"
            f'<meta charset="utf-8"></head>'
            f"<body><h1>{h1}</h1>{body}</body></html>"
        )
        lang = langs_pool[int(rng.integers(0, len(langs_pool)))]
        urls.append(f"https://site{i % 97}.example.org/page/{i}")
        tss.append(base_ts + np.timedelta64(i, "m"))
        htmls.append(html.encode("utf-8"))
        # 50%: pass-through text (must stay byte-identical); 50%: null
        texts.append(exp if i % 2 == 0 else None)
        langs.append(lang)
        expected.append(exp)
    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    return table, expected


def generate_zipf_docs(
    n_docs: int,
    vocab_size: int = 50_000,
    mean_len: int = 120,
    seed: int = SEED,
    doc_id_offset: int = 0,
    s: float = ZIPF_S,
) -> pa.Table:
    """Deterministic (doc_id, text) table with a realistic web-scale
    token distribution: Zipf(s) over ``vocab_size`` terms, lognormal
    doc lengths around ``mean_len``.

    Fully vectorized — token ids by inverse-CDF sampling, strings via a
    DictionaryArray cast, per-doc join via pc.binary_join — so corpora
    of millions of docs generate in seconds (bench/scaling input;
    the 31-term driver `documents` table caps term-bucket parallelism
    and is adversarially un-web-like, BASELINE.md §3).
    """
    rng = np.random.default_rng(seed)
    lens = np.clip(
        rng.lognormal(np.log(mean_len), 0.6, n_docs).astype(np.int64),
        8,
        mean_len * 8,
    )
    total = int(lens.sum())
    cdf = np.cumsum(_zipf_weights(vocab_size, s))
    tok = np.searchsorted(cdf, rng.random(total), side="right").astype(np.int32)
    np.minimum(tok, vocab_size - 1, out=tok)
    vocab_arr = pa.array([f"w{i}" for i in range(vocab_size)], pa.string())
    flat = pa.DictionaryArray.from_arrays(pa.array(tok), vocab_arr).cast(
        pa.string()
    )
    offsets = np.empty(n_docs + 1, dtype=np.int64)
    offsets[0] = 0
    np.cumsum(lens, out=offsets[1:])
    lst = pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()), flat.cast(pa.large_string())
    )
    text = pc.binary_join(lst, pa.scalar(" ", pa.large_string()))
    doc_id = pa.array(
        np.arange(doc_id_offset, doc_id_offset + n_docs, dtype=np.int64)
    )
    return pa.table({"doc_id": doc_id, "text": text})


def write_zipf_corpus(
    out_dir: str,
    n_docs: int,
    n_files: int = 32,
    vocab_size: int = 50_000,
    mean_len: int = 120,
    seed: int = SEED,
) -> str:
    """Sharded deterministic Zipf corpus: file i holds docs
    [i*per, ...) generated from seed ``seed*7919+i`` — identical layout
    regardless of who generates it or at what parallelism."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    per = (n_docs + n_files - 1) // n_files
    for i in range(n_files):
        lo = i * per
        cnt = min(per, n_docs - lo)
        if cnt <= 0:
            break
        tbl = generate_zipf_docs(
            cnt, vocab_size, mean_len, seed * 7919 + i, doc_id_offset=lo
        )
        pq.write_table(tbl, os.path.join(out_dir, f"zipf-{i:05d}.parquet"))
    return out_dir


def generate_queries(n_queries: int = 200, seed: int = SEED) -> pa.Table:
    """Reference query set over the synthetic vocabulary
    (FIXTURES.md §2): 40% head / 40% mid / 10% rare / 10% with one OOV
    term; AND / OR 50-50."""
    rng = np.random.default_rng(seed + 1)
    vocab = vocabulary()
    qids, qs, modes = [], [], []
    for qid in range(n_queries):
        n_terms = int(rng.integers(1, 5))
        bucket = rng.random()
        if bucket < 0.4:
            pool = vocab[:50]
        elif bucket < 0.8:
            pool = vocab[50:1000]
        elif bucket < 0.9:
            pool = vocab[1000:]
        else:
            pool = vocab[:1000]
        terms = [pool[int(i)] for i in rng.integers(0, len(pool), n_terms)]
        if bucket >= 0.9:
            terms[0] = f"oov{qid}"
        qids.append(qid)
        qs.append(" ".join(terms))
        modes.append("and" if rng.random() < 0.5 else "or")
    return pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "query": pa.array(qs, pa.string()),
            "mode": pa.array(modes, pa.string()),
        }
    )


def write_corpus(
    out_dir: str, n_rows: int, seed: int = SEED, n_files: int = 1
) -> str:
    """Write pages (1 or ``n_files`` shards, the partitioned-input
    layout) + queries.parquet under out_dir."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    pages, _ = generate_pages(n_rows, seed)
    if n_files <= 1:
        pq.write_table(pages, os.path.join(out_dir, "pages.parquet"))
    else:
        pages_dir = os.path.join(out_dir, "pages")
        os.makedirs(pages_dir, exist_ok=True)
        per = (n_rows + n_files - 1) // n_files
        for i in range(n_files):
            shard = pages.slice(i * per, per)
            if len(shard):
                pq.write_table(
                    shard, os.path.join(pages_dir, f"pages-{i:05d}.parquet")
                )
    pq.write_table(generate_queries(), os.path.join(out_dir, "queries.parquet"))
    return out_dir
