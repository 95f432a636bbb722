"""User-level type system → Arrow mapping.

Semantics reproduced (SURVEY.md §1.2): the reference's two-level type
universe — proto-level ``ValueType`` and user-level ``FeastType`` with
its Arrow mapping table (feast/value_type.py:35, feast/types.py:75-138
primitives incl. Bytes/PdfBytes/ImageBytes/Json, :182-319 complex
Array/Map/Struct, FEAST_TYPES_TO_PYARROW_TYPES :368-436) plus the
reverse inference ``pa_to_feast_value_type`` (feast/type_map.py:1593).

Kept deliberately thin: one enum-ish namespace of constructors over
pyarrow types, both directions tested against the reference's matrix.
"""

from __future__ import annotations

import pyarrow as pa


class FType:
    """Engine type constants/constructors (FeastType equivalent)."""

    Bytes = pa.binary()
    ImageBytes = pa.binary()   # media payloads: same physical type, tagged use
    PdfBytes = pa.binary()
    String = pa.string()
    Json = pa.large_string()
    Bool = pa.bool_()
    Int32 = pa.int32()
    Int64 = pa.int64()
    Float32 = pa.float32()
    Float64 = pa.float64()
    UnixTimestamp = pa.timestamp("us")

    @staticmethod
    def Array(base: pa.DataType) -> pa.DataType:
        return pa.list_(base)

    @staticmethod
    def Map(key: pa.DataType = pa.string(), value: pa.DataType = pa.string()) -> pa.DataType:
        return pa.map_(key, value)

    @staticmethod
    def Struct(fields: dict[str, pa.DataType]) -> pa.DataType:
        return pa.struct(list(fields.items()))

    @staticmethod
    def Embedding(dim: int, base: pa.DataType = pa.float32()) -> pa.DataType:
        """vector_index-style fixed-length embedding column."""
        return pa.list_(base, dim)


def infer_ftype(arrow_type: pa.DataType) -> str:
    """Reverse inference (pa_to_feast_value_type analog): arrow type →
    canonical engine type name."""
    if pa.types.is_binary(arrow_type) or pa.types.is_large_binary(arrow_type):
        return "Bytes"
    if pa.types.is_large_string(arrow_type):
        return "Json"
    if pa.types.is_string(arrow_type):
        return "String"
    if pa.types.is_boolean(arrow_type):
        return "Bool"
    if pa.types.is_integer(arrow_type):
        return "Int64" if arrow_type.bit_width > 32 else "Int32"
    if pa.types.is_floating(arrow_type):
        return "Float64" if arrow_type.bit_width > 32 else "Float32"
    if pa.types.is_timestamp(arrow_type):
        return "UnixTimestamp"
    if pa.types.is_map(arrow_type):
        return "Map"
    if pa.types.is_struct(arrow_type):
        return "Struct"
    if (
        pa.types.is_list(arrow_type)
        or pa.types.is_large_list(arrow_type)
        or pa.types.is_fixed_size_list(arrow_type)
    ):
        return f"Array({infer_ftype(arrow_type.value_type)})"
    return str(arrow_type)


def infer_schema(tbl: pa.Table) -> dict[str, str]:
    """Schema inference from a source sample (feast/inference.py:103)."""
    return {f.name: infer_ftype(f.type) for f in tbl.schema}
