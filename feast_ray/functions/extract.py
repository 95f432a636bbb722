"""HTML → text extraction, byte-stable.

The north rule's per-row invariant (BASELINE.json): extracted text per
url must be byte-identical to the reference extractor. This module IS
the pinned extractor implementation: a fixed, versioned parse of the
synthetic page layout produced by ``feast_ray.sources.webpages`` —
``<article>`` body paragraphs, entity-unescaped, joined with single
spaces; nav/footer boilerplate dropped. The pandas oracle in tests
re-implements it independently.

Stays on Arrow batches end to end (no pandas round trip — pandas
mangles binary/large-string columns; the reference hit exactly this,
dask.py:55-58).

EXTRACTOR_VERSION is recorded in lineage metadata so a version bump
invalidates downstream checkpoints (the reference pins extractor
behavior the same way its registry pins materialization intervals).
"""

from __future__ import annotations

import html as _html
import re

import pyarrow as pa

EXTRACTOR_VERSION = "1.0.0"

_ARTICLE_RE = re.compile(r"<article>(.*?)</article>", re.S)
_PARA_RE = re.compile(r"<p>(.*?)</p>", re.S)


def extract_text(html_bytes: bytes) -> str:
    """Extract body text from one page. Deterministic, versioned."""
    page = html_bytes.decode("utf-8", errors="replace")
    m = _ARTICLE_RE.search(page)
    if m is None:
        return ""
    paras = _PARA_RE.findall(m.group(1))
    return " ".join(_html.unescape(p) for p in paras)


def _extract_rows(tbl: pa.Table, html_col: str, out_col: str) -> pa.Table:
    """Row-at-a-time reference path (also the oracle for the fast path)."""
    texts = [extract_text(h) for h in tbl[html_col].to_pylist()]
    return tbl.append_column(out_col, pa.array(texts, pa.string()))


# html.escape's exact output entities; &amp; must be undone LAST so
# escaped literals like "&amp;lt;" round-trip to "&lt;", not "<"
_UNESCAPE = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#x27;", "'"), ("&amp;", "&")]


def extract_batch(tbl: pa.Table, html_col: str = "html", out_col: str = "extracted_text") -> pa.Table:
    """map_batches kernel (pyarrow in/out): html binary → extracted text.

    Vectorized fast path (RE2 / C++ substring kernels, no Python loop):
    pages matching the crawl template ``<article>\\n<p>…</p>\\n…\\n</article>``
    are extracted with extract_regex + replace_substring + an entity
    unescape chain that is the exact inverse of ``html.escape``. Rows
    that don't match the strict template, carry entities beyond
    html.escape's five, or aren't valid UTF-8 fall back to the
    row-at-a-time :func:`extract_text`, so the output is
    byte-identical to the reference path for EVERY input."""
    import numpy as np
    import pyarrow.compute as pc

    if len(tbl) == 0:
        return tbl.append_column(out_col, pa.array([], pa.string()))
    try:
        s = pc.cast(tbl[html_col], pa.string())
    except pa.ArrowInvalid:
        return _extract_rows(tbl, html_col, out_col)
    body = pc.struct_field(
        pc.extract_regex(s, r"(?s)<article>(?P<body>.*?)</article>"), "body"
    )
    fast = pc.match_substring_regex(body, r"(?s)^\n<p>.*</p>\n$")
    r = pc.replace_substring(body, "</p>\n<p>", " ")
    r = pc.replace_substring_regex(r, r"^\n<p>", "")
    r = pc.replace_substring_regex(r, r"</p>\n$", "")
    # any residual tag/newline means non-template paragraph separators
    clean = pc.invert(
        pc.or_(pc.match_substring(r, "<p>"),
               pc.or_(pc.match_substring(r, "</p>"), pc.match_substring(r, "\n")))
    )
    # the unescape chain inverts EXACTLY html.escape's five entities.
    # html.unescape also decodes OTHER entities — including
    # semicolon-less ones like "&lt" — so the fast path may only run
    # when EVERY "&" in the body starts one of the five known
    # entities; anything else (foreign entities, bare ampersands)
    # takes the html.unescape fallback. (Bare "&" would be unchanged
    # by both paths, but proving that per-form is fragile — fallback
    # is correct and only costs speed on non-template-escaped rows.)
    amp_total = pc.count_substring(r, "&")
    known_total = pc.count_substring(r, "&amp;")
    for lit in ("&lt;", "&gt;", "&quot;", "&#x27;"):
        known_total = pc.add(known_total, pc.count_substring(r, lit))
    clean = pc.and_(clean, pc.equal(amp_total, known_total))
    for ent, ch in _UNESCAPE:
        r = pc.replace_substring(r, ent, ch)
    ok = pc.and_(pc.fill_null(fast, False), pc.fill_null(clean, False))
    no_article = pc.is_null(body)
    out = pc.if_else(ok, r, pa.scalar("", pa.string()))
    ok_np = ok.to_numpy(zero_copy_only=False)
    fb = ~(ok_np | no_article.to_numpy(zero_copy_only=False))
    if fb.any():
        idx = np.flatnonzero(fb)
        vals = out.to_pylist()
        htmls = tbl[html_col].take(pa.array(idx)).to_pylist()
        for i, h in zip(idx, htmls):
            vals[i] = extract_text(h)
        out = pa.array(vals, pa.string())
    return tbl.append_column(out_col, out)
