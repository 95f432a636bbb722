"""Vectorized per-document text statistics + quality-rule decisions.

The Gopher/C4-style heuristic rules of the north rule. Two engines
compute the same stats:

- a **byte-classification fast path** (numpy over the Arrow string
  array's raw byte buffer — one classification pass, per-doc counts by
  cumsum-diff at the offsets) used whenever the column has no nulls;
  counts are exact for ANY valid UTF-8 input (codepoint starts are the
  non-continuation bytes; RE2's ``\\s``/``\\w`` classes are ASCII-only,
  verified: ``\\s`` = {TAB LF FF CR SP}), except the stopword count,
  where RE2's Unicode case-folding can diverge — non-ASCII docs get
  their stop_count patched from the RE2 reference path;
- the original ``pyarrow.compute`` RE2 path, kept as the reference and
  the fallback (nulls / unusual column types).

Both produce bit-identical columns — the float math uses the same IEEE
divisions in the same order — so the driver's DuckDB oracle (which
shares RE2) keeps matching by value hash.

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
_STOPWORDS = (b"the", b"a", b"and", b"of", b"to", b"in", b"is", b"it")

MIN_WORDS = 20
MAX_WORDS = 5000
MIN_MEAN_WORD_LEN = 2.5
MAX_MEAN_WORD_LEN = 8.0
MIN_STOPWORDS = 2
MAX_DIGIT_FRAC = 0.2
MAX_SYMBOL_FRAC = 0.1

# byte lookup tables mirroring RE2's ASCII character classes
_WS_LUT = np.zeros(256, np.bool_)
_WS_LUT[[9, 10, 12, 13, 32]] = True  # RE2 \s — NO \v (0x0b), verified
_DIGIT_LUT = np.zeros(256, np.bool_)
_DIGIT_LUT[48:58] = True
_ALNUM_LUT = _DIGIT_LUT.copy()
_ALNUM_LUT[65:91] = True
_ALNUM_LUT[97:123] = True
_WORD_LUT = _ALNUM_LUT.copy()
_WORD_LUT[95] = True  # \w = [0-9A-Za-z_]
_LOWER = np.arange(256, dtype=np.uint8)
_LOWER[65:91] += 32


def _string_view(arr: pa.Array):
    """(byte buffer, per-doc offsets rebased to 0) for a null-free
    string/large_string array, honoring array slices. None when the
    byte fast path can't apply."""
    if arr.null_count:
        return None
    if arr.type == pa.string():
        odt = np.int32
    elif arr.type == pa.large_string():
        odt = np.int64
    else:
        return None
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], odt)[arr.offset : arr.offset + len(arr) + 1]
    offs = offs.astype(np.int64)
    buf = np.frombuffer(bufs[2], np.uint8)
    base = offs[0]
    if base or offs[-1] != len(buf):
        buf = buf[base : offs[-1]]
        offs = offs - base
    return buf, offs


def _segsum(x: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Per-doc sums of a per-byte array via cumsum-diff (empty-doc
    safe, unlike np.add.reduceat)."""
    c = np.zeros(len(x) + 1, np.int64)
    np.cumsum(x, dtype=np.int64, out=c[1:])
    return c[offs[1:]] - c[offs[:-1]]


def _byte_counts(buf: np.ndarray, offs: np.ndarray):
    """(n_chars, n_nonws, n_digit, n_sym, n_words) per doc, one pass.
    Exact for valid UTF-8: every codepoint's start byte is counted
    once; non-ASCII codepoints are neither \\s, [0-9A-Za-z] nor [0-9],
    so they count as symbols — exactly RE2's view."""
    cp = (buf & 0xC0) != 0x80  # codepoint start bytes
    ws = _WS_LUT[buf]
    n_chars = _segsum(cp, offs)
    n_ws = _segsum(ws, offs)
    n_digit = _segsum(_DIGIT_LUT[buf], offs)
    n_alnum = _segsum(_ALNUM_LUT[buf], offs)
    N = len(buf)
    if N:
        nonws = cp & ~ws
        prev_ws = np.empty(N, np.bool_)
        prev_ws[0] = True
        prev_ws[1:] = ws[:-1]
        ds = offs[:-1]
        prev_ws[ds[ds < N]] = True  # doc start = word boundary
        n_words = _segsum(nonws & prev_ws, offs)
    else:
        n_words = np.zeros(len(offs) - 1, np.int64)
    return n_chars, n_chars - n_ws, n_digit, n_chars - n_ws - n_alnum, n_words


def pack_word(w: bytes) -> int:
    """Injective uint64 packing of a word of ≤ 8 bytes (little-endian,
    zero-padded — unambiguous because \\w+ runs never contain NUL)."""
    v = 0
    for j, b in enumerate(w[:8]):
        v |= b << (8 * j)
    return v


def is_pure_word(w: bytes) -> bool:
    """True when every byte is an RE2 \\w char — i.e. ``\\b(w)\\b``
    matches exactly where a maximal \\w+ run equals ``w``."""
    return len(w) <= 8 and all(_WORD_LUT[b] for b in w)


_RUN_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)  # 0xFF can't be a \w byte


def word_run_keys(buf: np.ndarray, offs: np.ndarray):
    """(doc id, packed lowercase uint64 key) of every maximal \\w+ run.

    A ``\\b(word)\\b`` match of a pure-\\w word is EXACTLY a maximal
    \\w+ run equal to it (the boundaries force non-word chars on both
    sides), so dictionary-word counting — stopwords, language
    function-word profiles — reduces to packed-key equality against
    these runs. Runs longer than 8 bytes get a sentinel that matches
    no dictionary word. Doc boundaries split runs (RE2 matches are
    per-string). ASCII-exact; callers patch non-ASCII docs via RE2."""
    N = len(buf)
    if N == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.uint64))
    word = _WORD_LUT[buf]
    start = word.copy()
    start[1:] &= ~word[:-1]
    ds = offs[:-1]
    ds = ds[ds < N]
    start[ds] = word[ds]  # doc start begins a run when it's a \w byte
    end = word.copy()
    end[:-1] &= ~word[1:]
    de = offs[1:][offs[1:] > offs[:-1]] - 1
    end[de] = word[de]  # doc end terminates a run
    rs = np.flatnonzero(start)
    re_ = np.flatnonzero(end)
    rlen = re_ - rs + 1
    low = _LOWER[buf]
    keys = np.zeros(len(rs), np.uint64)
    for j in range(8):
        m = rlen > j
        keys[m] |= low[rs[m] + j].astype(np.uint64) << np.uint64(8 * j)
    keys[rlen > 8] = _RUN_SENTINEL
    run_doc = np.searchsorted(offs, rs, side="right") - 1
    return run_doc, keys


def count_dict_words(
    run_doc: np.ndarray, keys: np.ndarray, sorted_keys: np.ndarray, n: int
) -> np.ndarray:
    """Per-doc count of runs whose packed key is in ``sorted_keys``."""
    if len(sorted_keys) == 0 or len(keys) == 0:
        return np.zeros(n, np.int64)
    idx = np.searchsorted(sorted_keys, keys)
    idx_c = np.minimum(idx, len(sorted_keys) - 1)
    return np.bincount(run_doc[sorted_keys[idx_c] == keys], minlength=n).astype(
        np.int64
    )


# packed stopword keys: count_substring_regex(lower(text), \b(...)\b)
# becomes a dictionary count over \w+ runs (all stopwords are pure-\w).
# Exact for ASCII text; non-ASCII docs are patched via RE2 (which
# case-folds Unicode; the byte path can't).
_STOP_KEYS = np.sort(np.array([pack_word(w) for w in _STOPWORDS], np.uint64))


def _stats_columns(n_chars, n_words, n_nonws, n_digit, n_sym, stop_count):
    """Derived float columns — IEEE ops identical between both paths."""
    nw = n_words.astype(np.float64)
    nc = n_chars.astype(np.float64)
    safe_nw = np.where(n_words == 0, 1.0, nw)
    safe_nc = np.where(n_chars == 0, 1.0, nc)
    return [
        ("n_chars", pa.array(n_chars, pa.int64())),
        ("n_words", pa.array(n_words, pa.int64())),
        ("mean_word_len", pa.array(n_nonws.astype(np.float64) / safe_nw)),
        ("digit_frac", pa.array(n_digit.astype(np.float64) / safe_nc)),
        ("symbol_frac", pa.array(n_sym.astype(np.float64) / safe_nc)),
        ("stop_count", pa.array(stop_count, pa.int64())),
    ]


class ByteText:
    """Shared per-batch byte-path context: the string view plus lazily
    cached byte counts and \\w+ run keys. Fused pipelines (the
    QualityScorer) build ONE of these per batch so textstats, stopword
    counting, and langid classify the byte buffer once instead of
    once per stage. ``view`` is None when the fast path can't apply
    (nulls / non-string column) — consumers fall back to RE2."""

    def __init__(self, text):
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        self.text = text
        self.view = _string_view(text)
        self._counts = None
        self._runs = None

    @property
    def counts(self):
        """(n_chars, n_nonws, n_digit, n_sym, n_words) per doc."""
        if self._counts is None:
            self._counts = _byte_counts(*self.view)
        return self._counts

    @property
    def runs(self):
        """(run_doc, packed keys) of every \\w+ run."""
        if self._runs is None:
            self._runs = word_run_keys(*self.view)
        return self._runs


def compute_textstats(
    tbl: pa.Table, text_col: str = "text", ctx: "ByteText | None" = None
) -> pa.Table:
    """Append n_chars, n_words, mean_word_len, digit_frac, symbol_frac,
    stop_count columns. Byte fast path when the column is null-free;
    RE2 reference path otherwise. Outputs bit-identical either way."""
    if ctx is None:
        ctx = ByteText(tbl[text_col])
    text = ctx.text
    view = ctx.view
    if view is None:
        return _compute_textstats_re2(tbl, text_col)
    buf, offs = view
    n = len(text)
    n_chars, n_nonws, n_digit, n_sym, n_words = ctx.counts
    run_doc, keys = ctx.runs
    stop = count_dict_words(run_doc, keys, _STOP_KEYS, n)
    # RE2 (?i) does Unicode case-folding that ASCII lowering can't
    # reproduce (e.g. Kelvin sign → k): patch non-ASCII docs from the
    # reference kernel. byte_len == n_chars ⇔ pure ASCII.
    impure = np.flatnonzero(np.diff(offs) != n_chars)
    if len(impure):
        sub = text.take(pa.array(impure, pa.int64()))
        ref = pc.count_substring_regex(pc.utf8_lower(sub), STOPWORD_PATTERN)
        stop[impure] = ref.to_numpy(zero_copy_only=False).astype(np.int64)
    for name, col in _stats_columns(n_chars, n_words, n_nonws, n_digit, n_sym, stop):
        tbl = tbl.append_column(name, col)
    return tbl


def _compute_textstats_re2(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    """Reference path: pyarrow.compute RE2 kernels, zero Python per
    row. Kept verbatim — the fast path is parity-tested against it."""
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


def _rep_from_codes(codes, doc, lens, n):
    """Counting core shared by both repetition paths: given integer
    word codes, their doc ids, and per-doc token counts, compute
    (dup_2gram_frac, top_word_frac). Grouping runs on a SINGLE
    composite int64 key sorted by value (np.sort, no permutation
    gathers) when the key fits 62 bits; exact lexsort fallback
    otherwise. Docs with < 2 tokens contribute nothing."""
    dup2 = np.zeros(n)
    topw = np.zeros(n)
    if len(codes) == 0:
        return dup2, topw
    K = int(codes.max()) + 1

    # ---- top-word fraction: max multiplicity of a (doc, word) pair
    if n * K < 1 << 62:
        ks = np.sort(doc * K + codes)
        new_pair = np.empty(len(ks), dtype=bool)
        new_pair[0] = True
        new_pair[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(new_pair)
        pair_doc = ks[starts] // K
    else:
        order = np.lexsort((codes, doc))
        d_s, c_s = doc[order], codes[order]
        new_pair = np.empty(len(d_s), dtype=bool)
        new_pair[0] = True
        new_pair[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
        starts = np.flatnonzero(new_pair)
        pair_doc = d_s[starts]
    pair_counts = np.diff(np.append(starts, len(codes)))
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
        if n * K * K < 1 << 62:
            k2 = np.sort((g_doc * K + g1) * K + g2)
            gd = k2 // (K * K)
            new_g = np.empty(len(k2), dtype=bool)
            new_g[0] = True
            new_g[1:] = k2[1:] != k2[:-1]
        else:
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


def repetition_stats(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc repetition metrics (Gopher-style): duplicate word-2gram
    fraction and top-word fraction — reference path over Python
    strings (Arrow split + pandas factorize). Kept as the fallback and
    the parity target for the byte fast path below."""
    import pandas as pd

    n = len(texts)
    if n == 0:
        return np.zeros(0), np.zeros(0)
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
        return np.zeros(n), np.zeros(n)
    codes, _ = pd.factorize(flat)
    codes = codes.astype(np.int64)
    doc = np.repeat(np.arange(n, dtype=np.int64), lens)
    return _rep_from_codes(codes, doc, lens, n)


_POW_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _powers(base: int, upto: int) -> np.ndarray:
    """[base^0 .. base^(upto-1)] mod 2^64 (natural uint64 wrap)."""
    cur = _POW_CACHE.get((base, 0))
    if cur is None or len(cur) < upto:
        size = max(upto, 256)
        p = np.full(size, np.uint64(base), np.uint64)
        p[0] = 1
        np.multiply.accumulate(p, out=p)
        _POW_CACHE[(base, 0)] = cur = p
    return cur


def _repetition_fast(text: pa.Array, view) -> tuple[np.ndarray, np.ndarray]:
    """Byte-path repetition stats: tokenize \\S+ runs straight off the
    byte buffer (no Python string objects), double-64-bit polynomial
    hash per token, hash-factorize by lexsort, then the shared
    counting core. Tokens are byte-identical to the reference path for
    pure-ASCII docs without VT (0x0b, which utf8_trim_whitespace would
    strip at doc edges); other docs are patched from the reference."""
    buf, offs = view
    n = len(text)
    N = len(buf)
    if N == 0:
        return np.zeros(n), np.zeros(n)
    ws = _WS_LUT[buf]
    nonws = ~ws
    prev_ws = np.empty(N, np.bool_)
    prev_ws[0] = True
    prev_ws[1:] = ws[:-1]
    ds = offs[:-1]
    prev_ws[ds[ds < N]] = True
    next_ws = np.empty(N, np.bool_)
    next_ws[-1] = True
    next_ws[:-1] = ws[1:]
    de = offs[1:][offs[1:] > offs[:-1]] - 1
    next_ws[de] = True  # doc end terminates a token
    tok_start = nonws & prev_ws
    tok_end = nonws & next_ws
    s_idx = np.flatnonzero(tok_start)
    if len(s_idx) == 0:
        return np.zeros(n), np.zeros(n)
    e_idx = np.flatnonzero(tok_end)
    tlen = e_idx - s_idx + 1

    # compact token bytes = every non-ws byte, in order
    compact = buf[nonws].astype(np.uint64)
    cstart = np.zeros(len(tlen), np.int64)
    np.cumsum(tlen[:-1], out=cstart[1:])
    pos = np.arange(len(compact), dtype=np.int64) - np.repeat(cstart, tlen)
    mx = int(tlen.max())
    h = []
    for base in (1099511628211, 0x100000001B3 ^ 0x9E3779B9):
        pw = _powers(base, mx)
        c = np.zeros(len(compact) + 1, np.uint64)
        np.cumsum(compact * pw[pos], out=c[1:])
        hh = c[cstart + tlen] - c[cstart]
        h.append(hh * np.uint64(1000003) + tlen.astype(np.uint64))
    h1, h2 = h

    # hash-factorize (h1, h2) → dense int codes
    order = np.lexsort((h2, h1))
    new = np.empty(len(order), bool)
    new[0] = True
    h1s, h2s = h1[order], h2[order]
    new[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
    codes = np.empty(len(order), np.int64)
    codes[order] = np.cumsum(new) - 1

    lens = _segsum(tok_start, offs)  # tokens per doc
    doc = np.repeat(np.arange(n, dtype=np.int64), lens)
    dup2, topw = _rep_from_codes(codes, doc, lens, n)

    # patch docs the byte tokenizer can't reproduce exactly
    impure = _segsum((buf >= 0x80) | (buf == 0x0B), offs) > 0
    idx = np.flatnonzero(impure)
    if len(idx):
        sub = text.take(pa.array(idx, pa.int64())).to_pylist()
        d2, tw = repetition_stats(sub)
        dup2[idx] = d2
        topw[idx] = tw
    return dup2, topw


def add_repetition_stats(
    tbl: pa.Table, text_col: str = "text", ctx: "ByteText | None" = None
) -> pa.Table:
    if ctx is None:
        ctx = ByteText(tbl[text_col])
    text, view = ctx.text, ctx.view
    if view is None:
        dup2, topw = repetition_stats(text.to_pylist())
    else:
        dup2, topw = _repetition_fast(text, view)
    tbl = tbl.append_column("dup_2gram_frac", pa.array(dup2))
    return tbl.append_column("top_word_frac", pa.array(topw))
