"""Delta Lake source + read_sql escape hatch (SURVEY §2.3)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from feast_ray.sources import (
    delta_file_uris,
    duckdb_factory,
    read_delta,
    read_sql,
    read_table,
    write_delta,
)


@pytest.fixture()
def events_tbl(sf_small):
    return pq.read_table(f"{sf_small}/events.parquet")


def test_delta_roundtrip(tmp_path, events_tbl):
    path = str(tmp_path / "events_delta")
    v = write_delta(events_tbl, path)
    assert v == 0
    out = read_delta(path).to_pandas().sort_values("event_id").reset_index(drop=True)
    exp = events_tbl.to_pandas().sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_delta_append_and_overwrite_and_time_travel(tmp_path):
    path = str(tmp_path / "t")
    t1 = pa.table({"k": [1, 2], "v": ["a", "b"]})
    t2 = pa.table({"k": [3], "v": ["c"]})
    assert write_delta(t1, path) == 0
    assert write_delta(t2, path, mode="append") == 1
    got = read_delta(path).to_pandas().sort_values("k")
    assert list(got["k"]) == [1, 2, 3]
    # time travel to v0
    got0 = read_delta(path, version=0).to_pandas().sort_values("k")
    assert list(got0["k"]) == [1, 2]
    # overwrite removes prior files in the same commit
    t3 = pa.table({"k": [9], "v": ["z"]})
    assert write_delta(t3, path, mode="overwrite") == 2
    got2 = read_delta(path).to_pandas()
    assert list(got2["k"]) == [9]
    assert len(delta_file_uris(path)) == 1
    assert len(delta_file_uris(path, version=1)) == 2


def test_delta_column_pruning(tmp_path, events_tbl):
    path = str(tmp_path / "d")
    write_delta(events_tbl, path)
    out = read_delta(path, columns=["event_id", "value"])
    assert set(out.schema().names) == {"event_id", "value"}


def test_read_table_delta_fmt(tmp_path, events_tbl):
    write_delta(events_tbl, str(tmp_path / "events"))
    ds = read_table(str(tmp_path), "events", fmt="delta",
                    columns=["event_id", "user_id"])
    assert ds.count() == events_tbl.num_rows


def test_delta_rejects_checkpoint(tmp_path, events_tbl):
    path = str(tmp_path / "cp")
    write_delta(events_tbl, path)
    open(os.path.join(path, "_delta_log", "00000000000000000001.checkpoint.parquet"), "wb").close()
    with pytest.raises(NotImplementedError):
        read_delta(path)


def test_read_sql_duckdb(sf_small):
    fac = duckdb_factory(("orders", f"{sf_small}/orders.parquet"))
    ds = read_sql(
        "select o_orderkey, o_totalprice from orders where o_totalprice > 100000",
        fac,
    )
    df = ds.to_pandas()
    import duckdb

    exp = duckdb.connect().execute(
        f"select count(*) from read_parquet('{sf_small}/orders.parquet') "
        "where o_totalprice > 100000"
    ).fetchone()[0]
    assert len(df) == exp and set(df.columns) == {"o_orderkey", "o_totalprice"}


def test_unify_evolved_schemas_rules():
    import pyarrow as pa
    import pytest

    from feast_ray.sources import unify_evolved_schemas

    s1 = pa.schema([("id", pa.int32()), ("a", pa.int64())])
    s2 = pa.schema([("id", pa.int64()), ("b", pa.string()),
                    ("a", pa.float32())])
    u = unify_evolved_schemas([s1, s2])
    # first-appearance order; int widths -> int64; int+float -> float64
    assert [f.name for f in u] == ["id", "a", "b"]
    assert u.field("id").type == pa.int64()
    assert u.field("a").type == pa.float64()
    assert u.field("b").type == pa.string()
    with pytest.raises(ValueError, match="cannot reconcile"):
        unify_evolved_schemas([pa.schema([("x", pa.string())]),
                               pa.schema([("x", pa.int64())])])


def test_read_parquet_evolved_roundtrip(tmp_path, ray_session):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from feast_ray.sources import read_parquet_evolved

    pq.write_table(pa.table({"id": pa.array([1, 2], pa.int64()),
                             "v": pa.array([10, 20], pa.int64())}),
                   str(tmp_path / "gen0.parquet"))
    pq.write_table(pa.table({"id": pa.array([3], pa.int64()),
                             "v": pa.array([30.5], pa.float64()),
                             "w": pa.array(["x"], pa.string())}),
                   str(tmp_path / "gen1.parquet"))
    ds = read_parquet_evolved(str(tmp_path))
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(df.columns) == ["id", "v", "w"]
    assert df["v"].dtype == np.float64
    assert df["v"].tolist() == [10.0, 20.0, 30.5]
    assert df["w"].tolist()[:2] == [None, None] and df["w"][2] == "x"
    # column pruning still plans footer-only and aligns
    dv = read_parquet_evolved(str(tmp_path), columns=["v"]).to_pandas()
    assert sorted(dv["v"].tolist()) == [10.0, 20.0, 30.5]
