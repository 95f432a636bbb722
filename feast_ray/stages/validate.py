"""Validation stage: per-batch schema assertion + sampled JSON check.

Semantics reproduced: the reference's Validate node — missing column →
error, type mismatch → warn with Arrow compat rules, JSON
well-formedness on a sampled batch (ray/nodes.py:926-1047,
local/nodes.py:236-352).
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data

from feast_ray.schema import Schema, validate_table


def validate_stage(
    ds: ray.data.Dataset,
    schema: Schema,
    strict: bool = True,
) -> ray.data.Dataset:
    """Pass-through stage asserting every batch against ``schema``.
    The check is O(#columns) per batch — negligible."""

    def _check(tbl: pa.Table) -> pa.Table:
        validate_table(tbl, schema, strict=strict)
        return tbl

    return ds.map_batches(_check, batch_format="pyarrow", zero_copy_batch=True)


def validate_json_column(ds: ray.data.Dataset, col: str, sample: int = 1000) -> bool:
    """Sampled JSON well-formedness check (ray/nodes.py:1003-1043):
    takes one small batch from the stream, returns True if every
    non-null value parses."""
    batch = ds.take_batch(sample, batch_format="pyarrow")
    for v in batch[col].to_pylist():
        if v is None:
            continue
        try:
            json.loads(v)
        except (TypeError, ValueError):
            return False
    return True
