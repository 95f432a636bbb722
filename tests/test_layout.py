"""Z-order interleave + zone-map pruning (functions/layout.py)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from feast_ray.functions.layout import (
    build_zone_map,
    normalize_to_grid,
    prune_partitions,
    zvalue,
    zvalue_sql,
)


def _zvalue_slow(xs, ys, bits=16):
    out = []
    for x, y in zip(xs, ys):
        z = 0
        for b in range(bits):
            z |= ((int(x) >> b) & 1) << (2 * b)
            z |= ((int(y) >> b) & 1) << (2 * b + 1)
        out.append(z)
    return out


def test_zvalue_matches_slow_reference():
    rng = np.random.RandomState(7)
    x = rng.randint(0, 1 << 16, 200).astype(np.int64)
    y = rng.randint(0, 1 << 16, 200).astype(np.int64)
    got = zvalue([x, y])
    assert got.tolist() == _zvalue_slow(x, y)
    # corners
    assert zvalue([np.array([0]), np.array([0])])[0] == 0
    full = zvalue([np.array([65535]), np.array([65535])])[0]
    assert full == (1 << 32) - 1


def test_zvalue_locality_monotone_per_dim():
    # fixing one dim, z is strictly increasing in the other
    y = np.full(100, 123, np.int64)
    x = np.arange(100, dtype=np.int64)
    z = zvalue([x, y])
    assert (np.diff(z) > 0).all()


def test_zvalue_sql_matches_numpy():
    import duckdb

    rng = np.random.RandomState(11)
    x = rng.randint(0, 1 << 16, 100).astype(np.int64)
    y = rng.randint(0, 1 << 16, 100).astype(np.int64)
    con = duckdb.connect()
    con.register("t", pa.table({"nx": pa.array(x), "ny": pa.array(y)}))
    expr = zvalue_sql(["nx", "ny"])
    got = con.execute(f"select {expr} as z from t").df()["z"].to_numpy()
    assert got.tolist() == zvalue([x, y]).tolist()


def test_normalize_to_grid():
    v = np.array([0, 50, 100], np.int64)
    n = normalize_to_grid(v, 0, 100)
    assert n[0] == 0 and n[2] == 65535 and 0 < n[1] < 65535
    # degenerate span -> all zeros
    assert normalize_to_grid(v, 5, 5).tolist() == [0, 0, 0]
    with pytest.raises(ValueError, match="overflow"):
        normalize_to_grid(np.array([0], np.int64), 0, 1 << 60)


def test_zvalue_guards():
    with pytest.raises(ValueError, match="exceeds int64"):
        zvalue([np.array([0])] * 4, bits=16)
    with pytest.raises(ValueError, match="outside"):
        zvalue([np.array([1 << 16]), np.array([0])])


def test_zone_map_build_and_prune(tmp_path):
    # three hive partitions with known envelopes, one split in 2 files
    for part, chunks in {
        "pid=0": [[0, 10], [5, 20]],
        "pid=1": [[30, 40]],
        "pid=2": [[100, 200]],
    }.items():
        d = tmp_path / part
        d.mkdir()
        for i, (lo, hi) in enumerate(chunks):
            pq.write_table(
                pa.table({"c": pa.array([lo, hi], pa.int64())}),
                str(d / f"f{i}.parquet"))
    zm = build_zone_map(str(tmp_path), ["c"])
    env = {r["part"]: (r["vmin"], r["vmax"])
           for r in zm.to_pylist()}
    assert env == {"pid=0": (0, 20), "pid=1": (30, 40), "pid=2": (100, 200)}
    keep, total = prune_partitions(zm, "c", 15, 35)
    assert total == 3 and keep == ["pid=0", "pid=1"]
    keep, _ = prune_partitions(zm, "c", 500, 600)
    assert keep == []
    # boundary-touching envelope survives (closed intervals)
    keep, _ = prune_partitions(zm, "c", 200, 300)
    assert keep == ["pid=2"]
