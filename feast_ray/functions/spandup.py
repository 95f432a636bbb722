"""Exact duplicate-span removal (Lee-et-al-2021-style, n-gram
approximation).

"Deduplicating Training Data Makes Language Models Better" removes
repeated SUBSTRINGS, not just whole near-duplicate documents — the
boilerplate tail (cookie banners, license headers, navigation chrome)
that survives document-level dedup because the surrounding text
differs. The exact method is a corpus-wide suffix array; the standard
scalable approximation (used here) is span marking via duplicated word
n-grams:

* a span is *duplicated* when its word ``n``-gram occurs in ≥
  ``min_docs`` DISTINCT documents;
* the lowest ``id_col`` containing a gram is its *survivor* — that doc
  keeps the span (keep-first, the paper's "remove all but one");
* every other doc drops all tokens covered by any such gram
  occurrence; remaining tokens are rejoined with single spaces
  (whitespace is normalized as a side effect, exactly like the SQL
  oracle's ``\\S+`` tokenization).

Scale design — two thin passes, same doctrine as ``linedup.py``:

* pass A ships only per-block DISTINCT (gram, n_docs_partial,
  min_doc) rows (a doc's text lives in one row = one block, so
  distinct-doc counts sum across blocks); the wide step is ONE
  vectorized ``bucketed_group_reduce`` over the gram;
* the surviving dup-gram table (gram → survivor) broadcasts via
  ``ray.put`` as SORTED numpy arrays probed with ``searchsorted``
  (the dedup.py:223 doctrine — no per-task set deserialization);
* pass B is block-local: positional gram formation over the flat
  token buffer (ngrams.py's shape), one searchsorted, interval
  marking by a +1/-1 diff + cumsum, one grouped join per block.

Partitioning assumption: the dup-gram table fits the object store
(boilerplate vocabularies grow sublinearly in corpus size — the spans
are duplicated by definition). ``max_broadcast_rows`` guards the
assumption; past it, co-partition grams and docs by gram hash and run
pass B as a shuffle join instead (the join.py size-gating doctrine).

Matching is on exact n-gram STRINGS (FP-free, SQL-oracle-checkable —
q63), same policy as decontam.py; swap in 64-bit gram hashes at
extreme corpus sizes. Reference has no analog (SURVEY.md §2 extension
surface).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _tokenize_block(tbl: pa.Table, text_col: str):
    """flat token buffer + list offsets, ngrams.py's normalization
    (trim + collapse + single-space split ≡ SQL ``\\S+`` extraction,
    modulo the single empty token an empty doc produces — which can
    never join a gram and rejoins to '')."""
    txt = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(tbl[text_col], r"\s+", " ")
    )
    la = pc.split_pattern(txt, " ").combine_chunks()
    flat = la.flatten().to_pandas().to_numpy(dtype=object)
    offs = la.offsets.to_numpy()
    return flat, offs


def _gram_starts(flat: np.ndarray, offs: np.ndarray, n: int) -> np.ndarray:
    """Token positions where an n-gram fits inside its own doc."""
    lens = np.diff(offs)
    ends = np.repeat(offs[1:], lens)
    idx = np.arange(len(flat))
    return idx[idx + (n - 1) < ends]


def _gram_strings(flat: np.ndarray, start: np.ndarray, n: int) -> np.ndarray:
    grams = flat[start]
    for j in range(1, n):
        grams = grams + " "
        grams = grams + flat[start + j]
    return grams


def remove_duplicate_spans(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 4,
    min_docs: int = 2,
    out_col: str = "text_despanned",
    num_buckets: int = 64,
    max_broadcast_rows: int = 50_000_000,
) -> ray.data.Dataset:
    """Append ``out_col``: the text with cross-document duplicated
    n-gram spans removed everywhere except the lowest-``id_col``
    containing doc. Triggers execution of pass A (the dup-gram
    reduce) at call time; pass B streams."""
    from feast_ray.stages.dedup import bucketed_group_reduce

    def _partial(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "gram": pa.array([], pa.string()),
                "nd": pa.array([], pa.int64()),
                "md": pa.array([], pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        flat, offs = _tokenize_block(tbl, text_col)
        start = _gram_starts(flat, offs, n)
        if len(start) == 0:
            return empty
        lens = np.diff(offs)
        owner = np.repeat(tbl[id_col].to_numpy(), lens)[start]
        df = pd.DataFrame(
            {"gram": _gram_strings(flat, start, n), "doc": owner}
        ).drop_duplicates()
        agg = df.groupby("gram", sort=False)["doc"].agg(["size", "min"])
        return pa.table(
            {
                "gram": pa.array(agg.index.to_numpy(dtype=object), pa.string()),
                "nd": pa.array(agg["size"].to_numpy(), pa.int64()),
                "md": pa.array(agg["min"].to_numpy(), pa.int64()),
            }
        )

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "gram" not in df.columns:
            return pd.DataFrame({"gram": [], "nd": [], "md": []})
        g = df.groupby("gram", as_index=False, sort=False).agg(
            nd=("nd", "sum"), md=("md", "min")
        )
        return g[g["nd"] >= min_docs]

    dup = bucketed_group_reduce(
        ds.map_batches(_partial, batch_format="pyarrow"),
        ["gram"],
        _merge,
        num_buckets=num_buckets,
    )
    ddf = dup.to_pandas()  # the reduced dup-gram table only
    if "gram" not in ddf.columns:  # gram-free corpus (all docs < n tokens)
        ddf = pd.DataFrame({"gram": [], "md": []})
    if len(ddf) > max_broadcast_rows:
        raise ValueError(
            f"{len(ddf)} duplicated grams exceeds the broadcast cap; "
            "co-partition grams and docs by gram hash (join.py doctrine)"
        )
    order = np.argsort(ddf["gram"].to_numpy(dtype=object))
    grams_ref = ray.put(ddf["gram"].to_numpy(dtype=object)[order])
    surv_ref = ray.put(ddf["md"].to_numpy(dtype=np.int64)[order])

    def _strip(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return tbl.append_column(out_col, pa.array([], pa.string()))
        G = ray.get(grams_ref)
        S = ray.get(surv_ref)
        flat, offs = _tokenize_block(tbl, text_col)
        lens = np.diff(offs)
        start = _gram_starts(flat, offs, n)
        covered = np.zeros(len(flat), dtype=bool)
        if len(start) and len(G):
            grams = _gram_strings(flat, start, n)
            ix = np.searchsorted(G, grams)
            ix_c = np.minimum(ix, len(G) - 1)
            owner = np.repeat(tbl[id_col].to_numpy(), lens)[start]
            hit = (G[ix_c] == grams) & (S[ix_c] != owner)
            s_sel = start[hit]
            if len(s_sel):
                diff = np.zeros(len(flat) + 1, dtype=np.int64)
                np.add.at(diff, s_sel, 1)
                np.add.at(diff, s_sel + n, -1)
                covered = np.cumsum(diff[:-1]) > 0
        keep = ~covered
        owner_row = np.repeat(np.arange(len(tbl)), lens)[keep]
        joined = (
            pd.Series(flat[keep]).groupby(owner_row, sort=True).agg(" ".join)
        )
        out = (
            joined.reindex(np.arange(len(tbl)))
            .fillna("")
            .to_numpy(dtype=object)
        )
        return tbl.append_column(out_col, pa.array(out, pa.string()))

    return ds.map_batches(_strip, batch_format="pyarrow")
