"""Per-document tf-idf keyword extraction.

The corpus-relevance primitive (keyword tagging, topic sampling,
quality-aware retrieval pre-filters): score every (doc, term) by
``tf * ln(N / df)`` and keep each doc's top-k terms. The reference
has no analog (SURVEY.md §2 extension surface).

Scale design — two passes, one thin shuffle, one broadcast:

* **pass A (df)**: each block explodes its docs to DISTINCT
  (term, doc) presence pairs and pre-counts per term, so the shuffle
  carries (term, partial_df) rows bounded by the block vocabulary;
  the merge is ONE vectorized sum per hash bucket
  (``bucketed_group_reduce``). Corpus size N is a count aggregate on
  the same pass.
* **pass B (score)**: the (term → df) map is vocab-sized — broadcast
  ONCE via ``ray.put`` (size-gated: above ``broadcast_max_terms`` the
  operator raises and the caller must pre-prune the vocabulary, e.g.
  df ≥ 2 or a stopword cut — documented, not silently driver-bound);
  each block recomputes its docs' tf in-block (a doc's text is one
  row, so tf never crosses blocks), maps df with a pandas lookup, and
  keeps the per-doc top-k — all before anything leaves the block.

idf uses ``math.log`` per DISTINCT df value (libm, bit-identical to
DuckDB's ``ln``), never numpy's SIMD log which can differ by an ulp
and flip rank order vs the SQL oracle.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _doc_terms(tbl: pa.Table, id_col: str, text_col: str) -> pd.DataFrame:
    """Explode a block to (doc_id, term, tf) — lowercased whitespace
    tokens, positional numpy over the flat token buffer."""
    txt = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(pc.utf8_lower(tbl[text_col]), r"\s+", " ")
    )
    la = pc.split_pattern(txt, " ").combine_chunks()
    flat = la.flatten().to_pandas().to_numpy(dtype=object)
    lens = np.diff(la.offsets.to_numpy())
    ids = np.repeat(tbl[id_col].to_numpy(zero_copy_only=False), lens)
    df = pd.DataFrame({"doc_id": ids, "term": flat})
    df = df[df["term"] != ""]
    return df.groupby(["doc_id", "term"], as_index=False, sort=False).size().rename(
        columns={"size": "tf"}
    )


def tfidf_top_terms(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    *,
    num_buckets: int = 64,
    broadcast_max_terms: int = 50_000_000,
) -> ray.data.Dataset:
    """Each doc's top-``k`` terms by tf-idf (tie-break term asc).
    Output: (doc_id, term, tf, df) — integer columns so the result is
    hash-stable across engines; the float score only orders."""
    from feast_ray.stages.dedup import bucketed_group_reduce

    mat = ds.materialize()  # read once, reuse for both passes
    n_docs = mat.count()

    def _block_df(tbl: pa.Table) -> pa.Table:
        d = _doc_terms(tbl, id_col, text_col)
        vc = d.groupby("term", sort=False).size()
        return pa.table(
            {
                "term": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                "df": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    partial = mat.map_batches(_block_df, batch_format="pyarrow")
    df_ds = bucketed_group_reduce(
        partial,
        ["term"],
        lambda d: d.groupby("term", as_index=False, sort=False)["df"].sum(),
        num_buckets=num_buckets,
    ).materialize()
    n_terms = df_ds.count()
    if n_terms > broadcast_max_terms:
        raise ValueError(
            f"vocabulary has {n_terms} terms > broadcast_max_terms="
            f"{broadcast_max_terms}; prune the vocabulary (df >= 2 cut, "
            "stopword filter) before tfidf_top_terms"
        )
    df_pdf = df_ds.to_pandas()
    df_ref = ray.put(
        pd.Series(df_pdf["df"].to_numpy(), index=df_pdf["term"]).sort_index()
    )

    def _score(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                }
            )
        dfs = ray.get(df_ref)
        d = _doc_terms(tbl, id_col, text_col)
        d["df"] = dfs.reindex(d["term"]).to_numpy()
        # libm log per DISTINCT df value (see module docstring)
        idf = {v: math.log(n_docs / v) for v in pd.unique(d["df"])}
        d["score"] = d["tf"].to_numpy() * d["df"].map(idf).to_numpy()
        d = d.sort_values(
            ["doc_id", "score", "term"],
            ascending=[True, False, True],
            kind="stable",
        )
        d = d[d.groupby("doc_id", sort=False).cumcount() < k]
        return pa.Table.from_pandas(
            d[["doc_id", "term", "tf", "df"]].astype(
                {"tf": "int64", "df": "int64"}
            ),
            preserve_index=False,
        ).replace_schema_metadata(None)

    return mat.map_batches(_score, batch_format="pyarrow")
