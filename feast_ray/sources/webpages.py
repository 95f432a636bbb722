"""Deterministic synthetic Common-Crawl-style web-page table.

BASELINE.json#input_hint fixes the input shape:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
No external data exists in the sandbox, so this module derives that
table *deterministically* from the driver-generated ``documents``
parquet (doc_id, text, lang, source, n_chars): every document becomes a
synthetic HTML page; a fixed subset of URLs gets a second, later crawl
(identical or edited) to exercise latest-per-key dedup — the analog of
the reference's PIT/dedup invariant (SURVEY.md §2.2).

Skew is built in on purpose: every third page lands on one hot domain
(``big-portal.example.com``) so per-domain aggregations exercise the
salted two-phase path (SURVEY.md §7.4).

The HTML template and the extractor in ``feast_ray.functions.extract``
are designed as an exact inverse pair: ``extract_text(make_html(text))
== text`` byte-for-byte — the per-row invariant the north rule demands.
"""

from __future__ import annotations

import html as _html
import os
from datetime import datetime, timedelta

import pyarrow as pa
import ray.data

_EPOCH = datetime(2024, 3, 1)
_WORDS_PER_PARA = 12
HOT_DOMAIN = "big-portal.example.com"

# every RECRAWL_EVERY-th doc gets a second crawl; every EDIT_EVERY-th
# doc's second crawl carries edited text (so dedup-latest is observable)
RECRAWL_EVERY = 5
EDIT_EVERY = 10
EDIT_SUFFIX = " updated edition"

_CONSONANTS = "zqxvkjwfbgdh"


def decorate_text(doc_id: int, text: str) -> str:
    """Deterministic content mix per FIXTURES.md F1: planted PII,
    gibberish (high-perplexity), symbol spam, and repeated n-grams on
    fixed doc_id residues — so the scrub and every quality rule fire on
    real inputs, not only in unit fixtures."""
    d = int(doc_id)
    if d % 13 == 0:
        text += (
            f" contact user{d}@example-mail.com or call 555-{100 + d % 900}-{1000 + d % 9000}"
            f" ssn {100 + d % 900:03d}-{10 + d % 90:02d}-{1000 + d % 9000:04d}"
        )
    if d % 11 == 0:
        h = d * 2654435761 % (1 << 32)
        gib = " ".join(
            "".join(_CONSONANTS[(h >> (4 * j + k)) % len(_CONSONANTS)] for k in range(5))
            for j in range(6)
        )
        text += " " + gib
    if d % 17 == 0:
        text += " " + "$$$ ###!!! @@@ %%%" * 4
    if d % 19 == 0:
        text += " buy now" * 30
    return text


def page_domain(doc_id: int, source: str) -> str:
    if doc_id % 3 == 0:
        return HOT_DOMAIN
    return f"{source}.example.com"


def page_url(doc_id: int, source: str) -> str:
    return f"https://{page_domain(doc_id, source)}/{source}/page-{doc_id}"


def page_ts(doc_id: int) -> datetime:
    return _EPOCH + timedelta(seconds=(int(doc_id) * 137) % (86400 * 30))


def make_html(doc_id: int, source: str, text: str) -> bytes:
    """Wrap extracted text into boilerplate HTML. Paragraphs are runs of
    _WORDS_PER_PARA whitespace-separated tokens; the extractor joins
    them back with single spaces, so the round trip is byte-exact for
    single-space-separated text."""
    words = text.split(" ")
    paras = [
        " ".join(words[i : i + _WORDS_PER_PARA])
        for i in range(0, len(words), _WORDS_PER_PARA)
    ]
    body = "\n".join(f"<p>{_html.escape(p)}</p>" for p in paras)
    domain = page_domain(doc_id, source)
    page = (
        f"<html><head><title>Doc {doc_id} — {_html.escape(source)}</title>"
        '<meta charset="utf-8"/></head>\n<body>\n'
        '<nav><ul><li><a href="/">Home</a></li>'
        '<li><a href="/about">About</a></li></ul></nav>\n'
        f"<article>\n{body}\n</article>\n"
        f"<footer><div>© 2024 {domain} — all rights reserved</div></footer>\n"
        "</body></html>"
    )
    return page.encode("utf-8")


def pages_from_documents(batch: pa.Table, replicate: int = 1) -> pa.Table:
    """map_batches kernel: documents batch → web-pages batch (with the
    deterministic recrawl rows appended). ``replicate`` > 1 emits that
    many distinct-url variants per document (benchmark corpora only —
    correctness fixtures use 1)."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    sources = batch["source"].to_pylist()
    urls, tss, htmls, out_texts, out_langs = [], [], [], [], []
    for d0, raw_t0, l, s in zip(doc_ids, texts, langs, sources):
        t0 = decorate_text(d0, raw_t0)
        for j in range(replicate):
            d = d0 if j == 0 else d0 * 1_000_003 + j
            t = t0 if j == 0 else f"{t0} variant {j}"
            urls.append(page_url(d, s))
            tss.append(page_ts(d))
            htmls.append(make_html(d, s, t))
            out_texts.append(t)
            out_langs.append(l)
            if d % RECRAWL_EVERY == 0:
                t2 = t + EDIT_SUFFIX if d % EDIT_EVERY == 0 else t
                urls.append(page_url(d, s))
                tss.append(page_ts(d) + timedelta(hours=6))
                htmls.append(make_html(d, s, t2))
                out_texts.append(t2)
                out_langs.append(l)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(out_langs, pa.string()),
        }
    )


def synth_webpages(sf_dir: str, replicate: int = 1) -> ray.data.Dataset:
    """Lazy Dataset of synthetic web pages for one scale factor."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    return ds.map_batches(
        pages_from_documents, batch_format="pyarrow",
        fn_kwargs={"replicate": replicate},
    )


def webpages_table(sf_dir: str) -> pa.Table:
    """Driver-side (test/oracle) variant: full table in memory."""
    import pyarrow.parquet as pq

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    return pages_from_documents(docs)


def webpages_parquet_dir(
    sf_dir: str, cache_root: str = "/tmp/feast_ray_cache", replicate: int = 1
) -> str:
    """Materialize the synthetic pages as a parquet directory (cached),
    so benchmarks exercise the real ``read_parquet`` path."""
    import shutil

    base = os.path.basename(os.path.normpath(sf_dir))
    suffix = f"_x{replicate}" if replicate != 1 else ""
    out = os.path.join(cache_root, f"webpages_{base}{suffix}")
    marker = os.path.join(out, "_SUCCESS")
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    # fingerprint ties the cache to the source content; the rmtree
    # guards against an interrupted earlier build leaving partial
    # files next to the new ones (duplicated corpus rows)
    fingerprint = f"{os.path.abspath(sf_dir)}|{st.st_size}|{int(st.st_mtime)}|{replicate}"
    if not (os.path.exists(marker) and open(marker).read() == fingerprint):
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        synth_webpages(sf_dir, replicate=replicate).write_parquet(out)
        with open(marker, "w") as f:
            f.write(fingerprint)
    return out
