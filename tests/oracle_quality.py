"""Independent record-at-a-time oracle for the quality-filter pipeline.

Mirrors the reference's test strategy: the expected output is
re-derived per record in plain Python/pandas, independently of the
engine's vectorized/distributed implementation
(reference: sdk/python/tests/utils/feature_records.py:50-380
`get_expected_training_df` — same idea, different domain).

Only thresholds and the embedded model definitions are shared with the
engine (they ARE the spec); all parsing/counting logic here is written
separately, row by row.
"""

from __future__ import annotations

import html
import re

import pandas as pd

from feast_ray.functions.langid import LangIdModel
from feast_ray.functions.perplexity import PerplexityModel
from feast_ray.functions.scrub import Scrubber
from feast_ray.functions.textstats import (
    MAX_DIGIT_FRAC,
    MAX_DUP_2GRAM_FRAC,
    MAX_MEAN_WORD_LEN,
    MAX_SYMBOL_FRAC,
    MAX_WORDS,
    MIN_MEAN_WORD_LEN,
    MIN_STOPWORDS,
    MIN_WORDS,
)
from feast_ray.pipelines.quality_filter import MAX_PPL

_STOPWORDS = {"the", "a", "and", "of", "to", "in", "is", "it"}


def oracle_extract(html_bytes: bytes) -> str:
    """Independent extractor: char-by-char scan for article paragraphs."""
    page = html_bytes.decode("utf-8", errors="replace")
    try:
        start = page.index("<article>") + len("<article>")
        end = page.index("</article>")
    except ValueError:
        return ""
    body = page[start:end]
    paras = []
    pos = 0
    while True:
        p0 = body.find("<p>", pos)
        if p0 == -1:
            break
        p1 = body.find("</p>", p0)
        if p1 == -1:
            break
        paras.append(html.unescape(body[p0 + 3 : p1]))
        pos = p1 + 4
    return " ".join(paras)


def oracle_decide(text: str) -> tuple[bool, str | None]:
    """Record-at-a-time keep/drop with the spec's rule priority."""
    words = [w for w in re.split(r"\s+", text) if w]
    n_words = len(words)
    n_chars = len(text)
    nonws = sum(len(w) for w in words)
    mean_wl = nonws / max(1, n_words)
    digits = sum(1 for c in text if c.isdigit() and ord(c) < 128)
    digit_frac = digits / max(1, n_chars)
    symbols = len(re.findall(r"[^0-9A-Za-z\s]", text))
    symbol_frac = symbols / max(1, n_chars)
    stop = len(re.findall(r"\b(the|a|and|of|to|in|is|it)\b", text.lower()))
    if n_words < MIN_WORDS:
        return False, "too_short"
    if n_words > MAX_WORDS:
        return False, "too_long"
    if mean_wl < MIN_MEAN_WORD_LEN or mean_wl > MAX_MEAN_WORD_LEN:
        return False, "word_len"
    if stop < MIN_STOPWORDS:
        return False, "no_stopwords"
    if digit_frac > MAX_DIGIT_FRAC:
        return False, "too_many_digits"
    if symbol_frac > MAX_SYMBOL_FRAC:
        return False, "too_many_symbols"
    lang, _conf = LangIdModel().predict(text)
    if lang == "und":
        return False, "lang_unknown"
    if PerplexityModel().score(text) > MAX_PPL:
        return False, "high_perplexity"
    if n_words >= 2:
        grams = list(zip(words[:-1], words[1:]))
        if 1.0 - len(set(grams)) / len(grams) > MAX_DUP_2GRAM_FRAC:
            return False, "repetition"
    return True, None


def oracle_quality_filter(pages: pd.DataFrame) -> pd.DataFrame:
    """Full oracle: latest crawl per url → extract → decide → scrub."""
    latest = (
        pages.sort_values("warc_ts", kind="stable")
        .drop_duplicates("url", keep="last")
        .reset_index(drop=True)
    )
    scrubber = Scrubber()
    rows = []
    for _, r in latest.iterrows():
        text = oracle_extract(r["html"])
        keep, reason = oracle_decide(text)
        rows.append(
            {
                "url": r["url"],
                "warc_ts": r["warc_ts"],
                "extracted_text": text,
                "keep": keep,
                "drop_reason": reason,
                "text_scrubbed": scrubber.scrub(text) if keep else None,
            }
        )
    return pd.DataFrame(rows)
