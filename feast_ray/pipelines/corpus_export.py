"""Corpus export: the CCNet-style end product — kept documents
partitioned by (language, quality bucket) so training jobs can select
"en/head" or "de/head+middle" by directory.

Quality buckets follow the CCNet convention: per-language perplexity
terciles over the KEPT documents (head = most fluent). Cut points are
computed with the engine's own mergeable quantile sketch (one pass),
then applied in a vectorized stage; the write is worker-parallel
partitioned Parquet.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from feast_ray.functions.sketches import approx_quantiles


def bucket_by_quality(
    kept: ray.data.Dataset,
    lang_col: str = "lang_pred",
    ppl_col: str = "ppl",
) -> ray.data.Dataset:
    """Append ``quality_bucket`` (head/middle/tail) from per-language
    perplexity terciles (lower ppl = more fluent = head)."""
    cuts = approx_quantiles(kept, [lang_col], ppl_col, [1 / 3, 2 / 3]).to_pandas()
    cut_map = {
        r[lang_col]: (r["q_0_3333333333333333"], r["q_0_6666666666666666"])
        for _, r in cuts.iterrows()
    }
    import ray as _ray

    ref = _ray.put(cut_map)

    def _bucket(tbl: pa.Table) -> pa.Table:
        m = _ray.get(ref)
        langs = tbl[lang_col].to_pylist()
        ppl = tbl[ppl_col].to_numpy(zero_copy_only=False)
        out = np.empty(len(langs), dtype=object)
        for i, (l, p) in enumerate(zip(langs, ppl)):
            lo, hi = m.get(l, (np.inf, np.inf))
            out[i] = "head" if p <= lo else ("middle" if p <= hi else "tail")
        return tbl.append_column("quality_bucket", pa.array(out, pa.string()))

    return kept.map_batches(_bucket, batch_format="pyarrow")


def export_corpus(
    result: ray.data.Dataset,
    out_dir: str,
    lang_col: str = "lang_pred",
) -> dict:
    """Write kept docs partitioned by (language, quality bucket);
    returns per-partition row counts from the parquet footers."""
    import os

    import shutil

    # materialize ONCE: the quantile cut points and the partitioned
    # write both consume `kept` — without this the whole upstream
    # pipeline (extract/langid/perplexity/scrub) executes twice
    kept = result.map_batches(
        lambda t: t.filter(t["keep"]), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    bucketed = bucket_by_quality(kept, lang_col=lang_col)
    # fresh export: stale files from a previous run must not mix into
    # (and double-count in) the new corpus
    shutil.rmtree(out_dir, ignore_errors=True)
    bucketed.write_parquet(out_dir, partition_cols=[lang_col, "quality_bucket"])

    import pyarrow.parquet as pq

    counts: dict[str, int] = {}
    for root, _dirs, files in os.walk(out_dir):
        n = sum(
            pq.read_metadata(os.path.join(root, f)).num_rows
            for f in files
            if f.endswith(".parquet")
        )
        if n:
            counts[os.path.relpath(root, out_dir)] = n
    return counts
