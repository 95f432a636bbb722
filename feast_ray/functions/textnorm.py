"""Unicode text normalization — the canonicalization step that runs
before exact/fuzzy dedup and n-gram statistics in webtext pipelines
(CCNet/C4-style): NFC-compose combining sequences, lowercase, collapse
whitespace runs, trim. Lower/collapse/trim are Arrow kernels; NFC uses
the scrub.py doctrine — a vectorized non-ASCII prescan (utf8 char
count < byte count) and `unicodedata.normalize` ONLY on the flagged
rows, so ASCII-dominated webtext batches never touch Python per row.
(This build's `pc.utf8_normalize` does not canonically COMPOSE
combining sequences — verified e+U+0301 stays decomposed — so it
cannot implement NFC here.)

Reference analog: none (the reference normalizes timestamps/entity
keys, not text; SURVEY.md §2 extension surface). Kept byte-compatible
with DuckDB's `nfc_normalize`/`lower`/`regexp_replace(\\s+)`/`trim`
chain so the q57 oracle checks it value-exactly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def normalize_text_table(
    tbl: pa.Table,
    col: str,
    out_col: str,
    *,
    form: str = "NFC",
    lower: bool = True,
    collapse_ws: bool = True,
    trim: bool = True,
) -> pa.Table:
    """Single-batch kernel (exposed for reuse inside fused stages)."""
    import unicodedata

    arr = tbl[col]
    if form:
        # non-ASCII prescan: utf8 char count < byte count flags the
        # only rows where normalization can change anything
        dirty = pc.not_equal(pc.utf8_length(arr), pc.binary_length(arr))
        if pc.any(dirty).as_py():
            import numpy as np

            idx = np.flatnonzero(dirty.combine_chunks().to_numpy(
                zero_copy_only=False
            ))
            py = arr.to_pylist()
            for i in idx:
                if py[i] is not None:
                    py[i] = unicodedata.normalize(form, py[i])
            arr = pa.array(py, pa.string())
    if lower:
        arr = pc.utf8_lower(arr)
    if collapse_ws:
        arr = pc.replace_substring_regex(arr, r"\s+", " ")
    if trim:
        arr = pc.utf8_trim_whitespace(arr)
    return tbl.append_column(out_col, arr)


def normalize_text(
    ds: ray.data.Dataset,
    col: str,
    out_col: str | None = None,
    *,
    form: str = "NFC",
    lower: bool = True,
    collapse_ws: bool = True,
    trim: bool = True,
) -> ray.data.Dataset:
    """Append ``out_col`` (default: replace ``col``) with the
    normalized text. Pure map — streams, no shuffle, no state."""
    replace = out_col is None or out_col == col
    target = col if replace else out_col

    def _norm(tbl: pa.Table) -> pa.Table:
        out = normalize_text_table(
            tbl, col, "__norm", form=form, lower=lower,
            collapse_ws=collapse_ws, trim=trim,
        )
        arr = out["__norm"]
        out = out.drop_columns(["__norm"])
        if replace:
            out = out.set_column(out.schema.get_field_index(col), col, arr)
        else:
            out = out.append_column(target, arr)
        return out

    return ds.map_batches(_norm, batch_format="pyarrow")
