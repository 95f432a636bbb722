"""Compression-ratio quality signal (the Dolma / web-pipeline
"compressibility" heuristic: highly zlib-compressible text is
boilerplate or repetition; incompressible text is noise/binary).

Reference parity surface: the reference treats quality signals as
on-demand feature views over document rows
(/root/reference/sdk/python/feast/on_demand_feature_view.py:1);
here the signal is one vectorized-dispatch ``map_batches`` stage.

``zlib.compress`` is a pure per-document function of the UTF-8
bytes, so the distributed scores are bit-identical to a sequential
recompute under ANY partitioning — the q80/q94 oracle doctrine
(sequential reference recompute dumped to parquet, SQL re-derives
the buckets and aggregation from it) applies with no float anywhere:
both lengths are exact integers and the bucket rule compares the
integer ratio cross-multiplied (comp * 100 < raw * T)."""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

#: bucket thresholds in percent (ratio = comp_len / raw_len):
#: < 40% -> "repetitive", < 60% -> "mixed", else "normal"
REPETITIVE_PCT = 40
MIXED_PCT = 60

#: zlib level is part of the operator contract (dump must match)
ZLIB_LEVEL = 6


def compress_lengths(texts: "list[str]") -> "tuple[np.ndarray, np.ndarray]":
    """(raw_len, comp_len) int64 arrays — raw UTF-8 byte length and
    the zlib level-6 compressed length per document."""
    raw = np.empty(len(texts), np.int64)
    comp = np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        b = (t or "").encode("utf-8")
        raw[i] = len(b)
        comp[i] = len(zlib.compress(b, ZLIB_LEVEL))
    return raw, comp


def compressibility_bucket(raw: np.ndarray, comp: np.ndarray) -> np.ndarray:
    """Integer-exact bucket rule: cross-multiplied percent compare,
    empty docs are their own bucket (comp of b"" is 8 bytes of zlib
    header — a ratio of infinity otherwise)."""
    out = np.where(
        raw == 0,
        "empty",
        np.where(
            comp * 100 < raw * REPETITIVE_PCT,
            "repetitive",
            np.where(comp * 100 < raw * MIXED_PCT, "mixed", "normal"),
        ),
    )
    return out


def compress_stats(tbl: pa.Table, col: str = "text") -> pa.Table:
    """map_batches stage: append (raw_len, comp_len, comp_bucket)."""
    texts = tbl[col].to_pylist()
    raw, comp = compress_lengths(texts)
    return (
        tbl.append_column("raw_len", pa.array(raw, pa.int64()))
        .append_column("comp_len", pa.array(comp, pa.int64()))
        .append_column(
            "comp_bucket",
            pa.array(compressibility_bucket(raw, comp), pa.string()),
        )
    )
