import logging

import pyarrow as pa
import pytest

from feast_ray.stages.utils import normalize_timestamps, prefix_columns, safe_batch


def test_safe_batch_empty_passthrough():
    calls = []

    @safe_batch
    def fn(tbl):
        calls.append(len(tbl))
        return tbl

    empty = pa.table({"a": pa.array([], pa.int64())})
    assert len(fn(empty)) == 0
    assert calls == []


def test_safe_batch_swallow(caplog):
    def bad(tbl):
        raise ValueError("boom")

    wrapped = safe_batch(bad, swallow=True)
    tbl = pa.table({"a": [1, 2]})
    with caplog.at_level(logging.ERROR):
        out = wrapped(tbl)
    assert len(out) == 0

    strict = safe_batch(bad, swallow=False)
    with pytest.raises(ValueError):
        strict(tbl)


def test_normalize_timestamps():
    tbl = pa.table(
        {
            "a": pa.array([1000], pa.timestamp("ns")),
            "b": pa.array([1], pa.timestamp("s", tz="UTC")),
        }
    )
    out = normalize_timestamps(tbl, ["a", "b"])
    assert out.schema.field("a").type == pa.timestamp("us")
    assert out.schema.field("b").type == pa.timestamp("us")


def test_prefix_columns():
    tbl = pa.table({"user_id": [1], "value": [2.0]})
    out = prefix_columns(tbl, "myview", exclude=["user_id"])
    assert out.column_names == ["user_id", "myview__value"]
