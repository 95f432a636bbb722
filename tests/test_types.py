"""Type-conversion matrix (reference §5.6 analog): every FType maps to
Arrow and round-trips through a parquet write + reverse inference."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from feast_ray.types import FType, infer_ftype, infer_schema

MATRIX = [
    ("b", FType.Bytes, [b"x", None], "Bytes"),
    ("s", FType.String, ["x", None], "String"),
    ("j", FType.Json, ['{"k":1}', None], "Json"),
    ("bool", FType.Bool, [True, None], "Bool"),
    ("i32", FType.Int32, [1, None], "Int32"),
    ("i64", FType.Int64, [1, None], "Int64"),
    ("f32", FType.Float32, [1.5, None], "Float32"),
    ("f64", FType.Float64, [1.5, None], "Float64"),
    ("ts", FType.UnixTimestamp, [1_700_000_000_000_000, None], "UnixTimestamp"),
    ("arr", FType.Array(FType.Int64), [[1, 2], None], "Array(Int64)"),
    ("emb", FType.Embedding(4), [[1.0, 2.0, 3.0, 4.0], [0.0, 0.0, 0.0, 0.0]], "Array(Float32)"),
    ("mp", FType.Map(), [[("a", "b")], None], "Map"),
    ("st", FType.Struct({"x": FType.Int64}), [{"x": 1}, None], "Struct"),
]


@pytest.mark.parametrize("name,typ,values,expected", MATRIX, ids=[m[0] for m in MATRIX])
def test_roundtrip_and_inference(tmp_path, name, typ, values, expected):
    tbl = pa.table({name: pa.array(values, typ)})
    path = str(tmp_path / f"{name}.parquet")
    pq.write_table(tbl, path)
    back = pq.read_table(path)
    assert infer_ftype(back.schema.field(name).type) == expected


def test_infer_schema_on_testdata(sf_small):
    tbl = pq.read_table(f"{sf_small}/events.parquet")
    inferred = infer_schema(tbl)
    assert inferred["event_id"] == "Int64"
    assert inferred["ts"] == "UnixTimestamp"
    assert inferred["event_type"] == "String"
    assert inferred["value"] == "Float64"
