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
