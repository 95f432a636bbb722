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


def test_entity_key_encoding_stable_and_roundtrips():
    from feast_ray.functions.entity_key import (
        deserialize_entity_key,
        serialize_entity_key,
    )

    k = {"user_id": 42, "region": "eu", "score": 1.5, "flag": True}
    enc = serialize_entity_key(k)
    # key order must not matter (sorted stable layout)
    enc2 = serialize_entity_key(dict(reversed(list(k.items()))))
    assert enc == enc2
    assert deserialize_entity_key(enc) == k
    # distinct keys -> distinct encodings
    assert serialize_entity_key({"user_id": 43}) != serialize_entity_key({"user_id": 42})


def test_read_table_csv_json(tmp_path):
    import pandas as pd
    import pytest as _pytest

    from feast_ray.sources import read_table

    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    df.to_csv(tmp_path / "t.csv", index=False)
    df.to_json(tmp_path / "t.json", orient="records", lines=True)
    got_csv = read_table(str(tmp_path), "t", fmt="csv").to_pandas()
    got_json = read_table(str(tmp_path), "t", fmt="json").to_pandas()
    pd.testing.assert_frame_equal(got_csv, df)
    pd.testing.assert_frame_equal(got_json, df)
    with _pytest.raises(ValueError):
        read_table(str(tmp_path), "t", fmt="xml")


def test_top_frequencies(sf_small, duck):
    from feast_ray.sources import read_table
    from feast_ray.stages.relational import top_frequencies

    ev = read_table(sf_small, "events", columns=["event_type"])
    got = top_frequencies(ev, "event_type", 3).to_pandas()
    exp = duck.execute(
        """select event_type, count(*) n from events group by 1
           order by n desc, event_type limit 3"""
    ).fetchdf()
    assert got["event_type"].tolist() == exp["event_type"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()
