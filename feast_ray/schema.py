"""Declared-schema layer over pyarrow.

Semantics reproduced (see SURVEY.md §1.2): the reference's user-level
typed-Field/Schema model (feast/field.py:30-80, feast/types.py:368-436,
FEAST_TYPES_TO_PYARROW_TYPES) and its runtime schema-validation nodes
with Arrow compatibility groups (string≈large_string, any-unit
timestamps, list≈large_list; feast/infra/compute_engines/ray/nodes.py:946-1047).

We keep it thin: a ``Schema`` is a list of named pyarrow types plus a
``validate_table`` check applied per-block (cheap — first block or
sampled) rather than a parallel type universe.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa


@dataclass(frozen=True)
class Field:
    name: str
    dtype: pa.DataType
    nullable: bool = True
    tags: dict = field(default_factory=dict, compare=False)


class Schema:
    def __init__(self, fields: list[Field | tuple[str, pa.DataType]]):
        self.fields = [
            f if isinstance(f, Field) else Field(f[0], f[1]) for f in fields
        ]

    @property
    def names(self) -> list[str]:
        return [f.name for f in self.fields]

    def arrow(self) -> pa.Schema:
        return pa.schema([pa.field(f.name, f.dtype, f.nullable) for f in self.fields])

    def __repr__(self) -> str:
        return f"Schema({[(f.name, str(f.dtype)) for f in self.fields]})"


def _compatible(declared: pa.DataType, actual: pa.DataType) -> bool:
    """Arrow type compatibility, mirroring the reference's compat rules
    (ray/nodes.py:975-1001: map≈struct≈list, json≈string, ts any unit)."""
    if declared.equals(actual):
        return True
    string_like = (pa.types.is_string, pa.types.is_large_string)
    if any(p(declared) for p in string_like) and any(p(actual) for p in string_like):
        return True
    binary_like = (pa.types.is_binary, pa.types.is_large_binary)
    if any(p(declared) for p in binary_like) and any(p(actual) for p in binary_like):
        return True
    if pa.types.is_timestamp(declared) and pa.types.is_timestamp(actual):
        return True
    list_like = (pa.types.is_list, pa.types.is_large_list, pa.types.is_fixed_size_list)
    if any(p(declared) for p in list_like) and any(p(actual) for p in list_like):
        return _compatible(declared.value_type, actual.value_type)
    if pa.types.is_struct(declared) and pa.types.is_struct(actual):
        return True
    numeric = (pa.types.is_integer, pa.types.is_floating)
    if any(p(declared) for p in numeric) and any(p(actual) for p in numeric):
        # same family only: int≈int, float≈float (width-tolerant)
        return (
            pa.types.is_integer(declared) == pa.types.is_integer(actual)
        )
    return False


class SchemaValidationError(ValueError):
    pass


def validate_table(tbl: pa.Table, schema: Schema, strict: bool = True) -> list[str]:
    """Check an Arrow table against a declared Schema.

    Missing columns are errors; type mismatches are errors when
    ``strict`` else returned as warnings (reference: missing→error,
    mismatch→warn, local/nodes.py:254-352).
    Returns the list of warning strings.
    """
    warnings: list[str] = []
    actual = {f.name: f.type for f in tbl.schema}
    missing = [f.name for f in schema.fields if f.name not in actual]
    if missing:
        raise SchemaValidationError(f"missing columns: {missing}")
    for f in schema.fields:
        if not _compatible(f.dtype, actual[f.name]):
            msg = f"column {f.name!r}: declared {f.dtype} incompatible with actual {actual[f.name]}"
            if strict:
                raise SchemaValidationError(msg)
            warnings.append(msg)
    return warnings


# Declared stage-boundary schemas for the quality-filter pipeline
# (input shape per BASELINE.json#input_hint).
WEBPAGE_SCHEMA = Schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)
