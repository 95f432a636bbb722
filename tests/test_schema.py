import pyarrow as pa
import pytest

from feast_ray.schema import Field, Schema, SchemaValidationError, validate_table


def test_validate_ok():
    tbl = pa.table({"a": pa.array([1, 2], pa.int64()), "b": pa.array(["x", "y"])})
    s = Schema([("a", pa.int64()), ("b", pa.string())])
    assert validate_table(tbl, s) == []


def test_missing_column_errors():
    tbl = pa.table({"a": pa.array([1])})
    s = Schema([("a", pa.int64()), ("b", pa.string())])
    with pytest.raises(SchemaValidationError):
        validate_table(tbl, s)


def test_compat_groups():
    tbl = pa.table(
        {
            "s": pa.array(["x"], pa.large_string()),
            "t": pa.array([1], pa.timestamp("ms")),
            "i": pa.array([1], pa.int32()),
        }
    )
    s = Schema([("s", pa.string()), ("t", pa.timestamp("us")), ("i", pa.int64())])
    assert validate_table(tbl, s) == []


def test_incompatible_types():
    tbl = pa.table({"a": pa.array(["x"])})
    s = Schema([Field("a", pa.int64())])
    with pytest.raises(SchemaValidationError):
        validate_table(tbl, s, strict=True)
    warns = validate_table(tbl, s, strict=False)
    assert len(warns) == 1
