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


def extract_batch(tbl: pa.Table, html_col: str = "html", out_col: str = "extracted_text") -> pa.Table:
    """map_batches kernel (pyarrow in/out): html binary → extracted text."""
    texts = [extract_text(h) for h in tbl[html_col].to_pylist()]
    return tbl.append_column(out_col, pa.array(texts, pa.string()))
