"""Benchmark decontamination — flag/drop training documents that share
word n-grams with an evaluation/benchmark set.

The standard LLM-training hygiene step (PaLM/GPT-3-style 8-gram to
13-gram overlap rules): the benchmark corpus is SMALL by definition, so
its distinct n-gram set is built once and broadcast (``ray.put``);
each batch intersects its documents' n-gram sets against it — no
shuffle. Matching is on exact word n-gram STRINGS (not hashes), which
keeps the operator SQL-oracle-checkable (q48) and false-positive-free;
swap in hashed n-grams at extreme benchmark sizes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def ngram_strings(text: str, n: int) -> set[str]:
    """Distinct word n-grams of ``text`` (whitespace tokens)."""
    w = text.split()
    if len(w) < n:
        return set()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def benchmark_ngrams(texts, n: int = 8) -> set[str]:
    """The union of distinct n-grams over the benchmark texts."""
    out: set[str] = set()
    for t in texts:
        out |= ngram_strings(t, n)
    return out


def decontaminate(
    docs: ray.data.Dataset,
    benchmark_texts,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
    mode: str = "annotate",
) -> ray.data.Dataset:
    """Annotate (or drop) documents overlapping the benchmark set.

    ``mode="annotate"``: adds ``n_hits`` (distinct contaminated
    n-grams) and ``contaminated`` columns. ``mode="drop"``: filters
    contaminated docs out. ``benchmark_texts`` is a list of strings, a
    pandas DataFrame with ``text_col``, or a small Dataset.
    """
    import pandas as pd

    if isinstance(benchmark_texts, ray.data.Dataset):
        benchmark_texts = benchmark_texts.to_pandas()[text_col].tolist()
    elif isinstance(benchmark_texts, pd.DataFrame):
        benchmark_texts = benchmark_texts[text_col].tolist()
    grams = benchmark_ngrams(benchmark_texts, n)
    ref = ray.put(grams)

    def _annot(tbl: pa.Table) -> pa.Table:
        g: set[str] = ray.get(ref)
        hits = np.fromiter(
            (len(ngram_strings(t, n) & g) for t in tbl[text_col].to_pylist()),
            dtype=np.int64,
            count=len(tbl),
        )
        tbl = tbl.append_column("n_hits", pa.array(hits))
        return tbl.append_column("contaminated", pa.array(hits >= min_hits))

    out = docs.map_batches(_annot, batch_format="pyarrow")
    if mode == "drop":
        import pyarrow.compute as pc

        return out.map_batches(
            lambda t: t.filter(pc.invert(t["contaminated"])).drop_columns(
                ["n_hits", "contaminated"]
            ),
            batch_format="pyarrow",
        )
    return out
