"""Vectorized per-document text statistics + quality-rule decisions.

The Gopher/C4-style heuristic rules of the north rule, computed with
``pyarrow.compute`` RE2 kernels only — no Python loop over rows. Every
stat here has an exact DuckDB-SQL equivalent (both engines use RE2),
which is what the driver's oracle compares against.

This is the quality-filter analog of the reference's on-demand feature
transformations (on_demand_feature_view.py:116-210): derived columns
computed from raw features at read time, fixed declared schema.

Rules (priority order decides ``drop_reason``):
  too_short      n_words < 20
  too_long       n_words > 5000
  word_len       mean_word_len outside [2.5, 8]
  no_stopwords   stop_count < 2
  too_many_digits digit_frac > 0.2
  too_many_symbols symbol_frac > 0.1
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

STOPWORD_PATTERN = r"\b(the|a|and|of|to|in|is|it)\b"

MIN_WORDS = 20
MAX_WORDS = 5000
MIN_MEAN_WORD_LEN = 2.5
MAX_MEAN_WORD_LEN = 8.0
MIN_STOPWORDS = 2
MAX_DIGIT_FRAC = 0.2
MAX_SYMBOL_FRAC = 0.1


def compute_textstats(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_chars, n_words, mean_word_len, digit_frac, symbol_frac,
    stop_count columns. All pyarrow.compute — zero Python per row."""
    text = tbl[text_col]
    n_chars = pc.utf8_length(text)
    n_words = pc.count_substring_regex(text, r"\S+")
    n_nonws = pc.count_substring_regex(text, r"\S")
    n_digit = pc.count_substring_regex(text, "[0-9]")
    n_sym = pc.count_substring_regex(text, r"[^0-9A-Za-z\s]")
    stop_count = pc.count_substring_regex(pc.utf8_lower(text), STOPWORD_PATTERN)

    nw = pc.cast(n_words, pa.float64())
    nc = pc.cast(n_chars, pa.float64())
    safe_nw = pc.if_else(pc.equal(n_words, 0), pa.scalar(1.0), nw)
    safe_nc = pc.if_else(pc.equal(n_chars, 0), pa.scalar(1.0), nc)
    mean_word_len = pc.divide(pc.cast(n_nonws, pa.float64()), safe_nw)
    digit_frac = pc.divide(pc.cast(n_digit, pa.float64()), safe_nc)
    symbol_frac = pc.divide(pc.cast(n_sym, pa.float64()), safe_nc)

    for name, col in [
        ("n_chars", pc.cast(n_chars, pa.int64())),
        ("n_words", pc.cast(n_words, pa.int64())),
        ("mean_word_len", mean_word_len),
        ("digit_frac", digit_frac),
        ("symbol_frac", symbol_frac),
        ("stop_count", pc.cast(stop_count, pa.int64())),
    ]:
        tbl = tbl.append_column(name, col)
    return tbl


def apply_quality_rules(tbl: pa.Table) -> pa.Table:
    """Append keep (bool) + drop_reason (string, null when kept) from
    the stat columns. Rule priority fixed; mirrored in oracle SQL."""
    n_words = tbl["n_words"]
    mwl = tbl["mean_word_len"]
    rules = [
        ("too_short", pc.less(n_words, MIN_WORDS)),
        ("too_long", pc.greater(n_words, MAX_WORDS)),
        (
            "word_len",
            pc.or_(pc.less(mwl, MIN_MEAN_WORD_LEN), pc.greater(mwl, MAX_MEAN_WORD_LEN)),
        ),
        ("no_stopwords", pc.less(tbl["stop_count"], MIN_STOPWORDS)),
        ("too_many_digits", pc.greater(tbl["digit_frac"], MAX_DIGIT_FRAC)),
        ("too_many_symbols", pc.greater(tbl["symbol_frac"], MAX_SYMBOL_FRAC)),
    ]
    reason = pa.nulls(len(tbl), pa.string())
    # apply in reverse so earlier rules take priority
    for name, mask in reversed(rules):
        reason = pc.if_else(mask, pa.scalar(name), reason)
    keep = pc.is_null(reason)
    tbl = tbl.append_column("keep", keep)
    tbl = tbl.append_column("drop_reason", reason)
    return tbl


MAX_DUP_2GRAM_FRAC = 0.4  # Gopher-style repetition cutoff (model rule)


def repetition_stats(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc repetition metrics (Gopher-style): duplicate word-2gram
    fraction and top-word fraction.

    Vectorized across the WHOLE batch: one Arrow split over all docs,
    integer word codes (pandas factorize), then run-length counting
    over lexsorted (doc, code) / (doc, code, next_code) keys — the
    distinct/max counts are exact integers, so the resulting fractions
    are bit-identical to the old per-doc set/np.unique loop (which
    cost ~50 µs/doc in Python; this is one numpy pass per batch)."""
    import pandas as pd
    import pyarrow.compute as pc

    n = len(texts)
    dup2 = np.zeros(n)
    topw = np.zeros(n)
    if n == 0:
        return dup2, topw
    # str.split() semantics: split on whitespace runs, no empty tokens
    la = pc.split_pattern(
        pc.utf8_trim_whitespace(
            pc.replace_substring_regex(pa.array(texts, pa.string()), r"\s+", " ")
        ),
        " ",
    )
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    flat = la.flatten().to_pandas().to_numpy(dtype=object)
    offs = la.offsets.to_numpy().astype(np.int64)
    lens = np.diff(offs)
    # an empty/whitespace-only doc yields one "" token; docs with < 2
    # tokens contribute nothing (same skip as the per-doc loop)
    if len(flat) == 0:
        return dup2, topw
    codes, _ = pd.factorize(flat)
    codes = codes.astype(np.int64)
    doc = np.repeat(np.arange(n, dtype=np.int64), lens)

    # ---- top-word fraction: max multiplicity of a (doc, word) pair
    order = np.lexsort((codes, doc))
    d_s, c_s = doc[order], codes[order]
    new_pair = np.empty(len(d_s), dtype=bool)
    new_pair[0] = True
    new_pair[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
    starts = np.flatnonzero(new_pair)
    pair_counts = np.diff(np.append(starts, len(d_s)))
    pair_doc = d_s[starts]
    # per-doc max over contiguous pair_doc runs
    doc_starts = np.flatnonzero(
        np.concatenate([[True], pair_doc[1:] != pair_doc[:-1]])
    )
    max_counts = np.maximum.reduceat(pair_counts, doc_starts)
    eligible = lens >= 2
    sel = eligible[pair_doc[doc_starts]]
    tgt = pair_doc[doc_starts][sel]
    topw[tgt] = max_counts[sel] / lens[tgt]

    # ---- duplicate-2gram fraction: distinct (doc, w, w_next) runs
    valid = doc[:-1] == doc[1:]
    if valid.any():
        g_doc = doc[:-1][valid]
        g1 = codes[:-1][valid]
        g2 = codes[1:][valid]
        order = np.lexsort((g2, g1, g_doc))
        gd, a, b = g_doc[order], g1[order], g2[order]
        new_g = np.empty(len(gd), dtype=bool)
        new_g[0] = True
        new_g[1:] = (gd[1:] != gd[:-1]) | (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        # distinct grams per doc = sum of new_g over the doc's run
        gstarts = np.flatnonzero(
            np.concatenate([[True], gd[1:] != gd[:-1]])
        )
        distinct = np.add.reduceat(new_g.astype(np.int64), gstarts)
        gdoc = gd[gstarts]
        total = lens[gdoc] - 1
        dup2[gdoc] = 1.0 - distinct / total
    return dup2, topw


def add_repetition_stats(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    dup2, topw = repetition_stats(tbl[text_col].to_pylist())
    tbl = tbl.append_column("dup_2gram_frac", pa.array(dup2))
    return tbl.append_column("top_word_frac", pa.array(topw))
