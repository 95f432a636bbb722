"""Per-batch utility operators (SURVEY.md §2.4).

Semantics reproduced:
- ``safe_batch`` ≈ the reference's error-swallowing batch decorator
  `safe_batch_processor` (ray/utils.py:183-215): empty-batch guard +
  optional swallow-and-return-empty on failure.
- ``normalize_timestamps`` ≈ tz/unit normalization to UTC microseconds
  (ray_shared_utils.py:213-283, utils.py:158 make_df_tzaware).
- ``prefix_columns`` ≈ full-feature-name prefixing ``view__feature``
  (ray_shared_utils.py:456-461).
"""

from __future__ import annotations

import functools
import logging
from typing import Callable

import pyarrow as pa

logger = logging.getLogger(__name__)


def safe_batch(fn: Callable[[pa.Table], pa.Table], swallow: bool = False):
    """Wrap a batch UDF: pass empty batches through untouched; when
    ``swallow``, log-and-return-empty instead of failing the task."""

    @functools.wraps(fn)
    def _wrapped(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return tbl
        try:
            return fn(tbl)
        except Exception:  # noqa: BLE001
            if not swallow:
                raise
            logger.exception("batch processor failed; dropping batch of %d rows", len(tbl))
            return tbl.slice(0, 0)

    return _wrapped


def normalize_timestamps(tbl: pa.Table, cols: list[str]) -> pa.Table:
    """Cast timestamp columns to timestamp[us] (tz-naive, the engine's
    canonical unit — DuckDB's too)."""
    for c in cols:
        idx = tbl.schema.get_field_index(c)
        typ = tbl.schema.field(idx).type
        if pa.types.is_timestamp(typ) and (typ.unit != "us" or typ.tz is not None):
            tbl = tbl.set_column(idx, c, tbl[c].cast(pa.timestamp("us")))
    return tbl


def prefix_columns(tbl: pa.Table, prefix: str, exclude: list[str]) -> pa.Table:
    """Rename feature columns to ``prefix__name`` (join keys/timestamps
    excluded) — the reference's full-feature-name mode."""
    return tbl.rename_columns(
        [c if c in exclude else f"{prefix}__{c}" for c in tbl.column_names]
    )


def json_extract_fields(
    ds,
    col: str,
    fields: "dict[str, tuple[str, str]]",
    keep: "list[str] | None" = None,
):
    """Extract top-level scalar fields from a JSON string column:
    ``fields`` maps output name -> (json key, dtype in
    {'int64','float64','string'}). Reference parity:
    feast's field_mapping + JSON-payload stream sources
    (`spark_kafka_processor.py` json path).

    Fast path — one C++ ``extract_regex`` kernel per field (flat
    scalar keys only, the overwhelmingly common telemetry shape);
    rows whose payload is missing the key (or malformed) yield NULL,
    matching SQL json_extract semantics. Nested/array extraction is a
    declared boundary (a simdjson-class vectorized parser is the
    scale path; Python json.loads per row is not acceptable in a hot
    stage).
    """
    import numpy as np
    import pyarrow.compute as pc

    import ray.data  # noqa: F401

    def _pat(key: str, dtype: str) -> str:
        if dtype == "int64":
            return rf'"{key}"\s*:\s*(?P<v>-?\d+)'
        if dtype == "float64":
            return rf'"{key}"\s*:\s*(?P<v>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)'
        return rf'"{key}"\s*:\s*"(?P<v>[^"]*)"'

    pats = {name: _pat(key, dtype)
            for name, (key, dtype) in fields.items()}

    def _extract(tbl: pa.Table) -> pa.Table:
        cols = {c: tbl[c] for c in (keep or tbl.column_names) if c != col}
        src = tbl[col]
        for name, (key, dtype) in fields.items():
            st = pc.extract_regex(src, pats[name])
            v = pc.struct_field(st, "v")
            if dtype == "int64":
                v = pc.cast(v, pa.int64())
            elif dtype == "float64":
                v = pc.cast(v, pa.float64())
            cols[name] = v
        return pa.table(cols)

    return ds.map_batches(_extract, batch_format="pyarrow")
