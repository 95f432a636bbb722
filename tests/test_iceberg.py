"""Iceberg-shaped table-format source + Avro OCF container tests.

Covers the full commit/plan/read lifecycle: append snapshots, identity
partition pruning at PLAN time (file counts, not row filters), time
travel by snapshot id and timestamp, overwrite semantics (current
snapshot replaced, history still readable), and the Avro object
container file framing underneath the manifests (null + deflate
codecs, sync-marker verification).
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from feast_ray.functions.avro import read_container, write_container
from feast_ray.sources.iceberg import IcebergTable, read_iceberg


# ------------------------------------------------------------ avro OCF

_REC_SCHEMA = {
    "type": "record", "name": "r", "fields": [
        {"name": "k", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "opt", "type": ["null", "string"]},
    ],
}


def _recs(n):
    return [{"k": f"key{i}", "n": i * 7 - 3,
             "opt": None if i % 3 == 0 else f"v{i}"}
            for i in range(n)]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_roundtrip(tmp_path, codec):
    path = str(tmp_path / f"t_{codec}.avro")
    recs = _recs(2500)  # > records_per_block -> multiple blocks
    write_container(path, recs, _REC_SCHEMA, codec=codec)
    got, schema = read_container(path)
    assert got == recs
    assert schema == _REC_SCHEMA


def test_ocf_deflate_smaller(tmp_path):
    p0 = str(tmp_path / "a.avro")
    p1 = str(tmp_path / "b.avro")
    recs = [{"k": "same" * 20, "n": 1, "opt": None}] * 500
    write_container(p0, recs, _REC_SCHEMA, codec="null")
    write_container(p1, recs, _REC_SCHEMA, codec="deflate")
    assert os.path.getsize(p1) < os.path.getsize(p0) / 5


def test_ocf_sync_corruption_detected(tmp_path):
    path = str(tmp_path / "t.avro")
    write_container(path, _recs(10), _REC_SCHEMA)
    buf = bytearray(open(path, "rb").read())
    buf[-1] ^= 0xFF  # clobber the trailing sync marker
    open(path, "wb").write(bytes(buf))
    with pytest.raises(ValueError, match="sync"):
        read_container(path)


def test_ocf_bad_magic(tmp_path):
    path = str(tmp_path / "t.avro")
    open(path, "wb").write(b"PAR1not-avro")
    with pytest.raises(ValueError, match="not an avro container"):
        read_container(path)


# ------------------------------------------------------------- iceberg

def _events(n=60):
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "etype": pa.array(["click", "view", "purchase"][i % 3]
                          for i in range(n)),
        "value": pa.array([float(i) for i in range(n)]),
    })


def test_commit_append_and_read(tmp_path):
    d = str(tmp_path / "tbl")
    t = IcebergTable(d)
    tbl = _events()
    s1 = t.commit(tbl.slice(0, 30), partition_by=["etype"],
                  timestamp_ms=1000)
    s2 = t.commit(tbl.slice(30), partition_by=["etype"],
                  timestamp_ms=2000)
    assert (s1, s2) == (1, 2)
    got = read_iceberg(d).take_all()
    assert sorted(r["event_id"] for r in got) == list(range(60))


def test_partition_pruning_at_plan_time(tmp_path):
    d = str(tmp_path / "tbl")
    t = IcebergTable(d)
    t.commit(_events(), partition_by=["etype"], timestamp_ms=1000)
    all_files = t.plan_files()
    pruned = t.plan_files(partition_filter={"etype": "purchase"})
    assert len(all_files) == 3 and len(pruned) == 1
    ds = read_iceberg(d, partition_filter={"etype": "purchase"},
                      columns=["event_id", "etype"])
    rows = ds.take_all()
    assert {r["etype"] for r in rows} == {"purchase"}
    assert len(rows) == 20
    assert set(rows[0].keys()) == {"event_id", "etype"}


def test_time_travel(tmp_path):
    d = str(tmp_path / "tbl")
    t = IcebergTable(d)
    tbl = _events()
    t.commit(tbl.slice(0, 30), partition_by=["etype"], timestamp_ms=1000)
    t.commit(tbl.slice(30), partition_by=["etype"], timestamp_ms=2000)
    assert read_iceberg(d, snapshot_id=1).count() == 30
    assert read_iceberg(d, asof_ms=1500).count() == 30
    assert read_iceberg(d, asof_ms=2500).count() == 60
    with pytest.raises(KeyError):
        t.plan_files(asof_ms=500)
    with pytest.raises(KeyError):
        t.plan_files(snapshot_id=99)


def test_overwrite_replaces_but_history_survives(tmp_path):
    d = str(tmp_path / "tbl")
    t = IcebergTable(d)
    tbl = _events()
    t.commit(tbl, partition_by=["etype"], timestamp_ms=1000)
    keep = tbl.filter(pc.equal(tbl["etype"], "purchase"))
    t.commit(keep, partition_by=["etype"], operation="overwrite",
             timestamp_ms=2000)
    assert read_iceberg(d).count() == 20          # current = overwrite
    assert read_iceberg(d, snapshot_id=1).count() == 60  # history intact


def test_partition_spec_change_rejected(tmp_path):
    d = str(tmp_path / "tbl")
    t = IcebergTable(d)
    t.commit(_events(), partition_by=["etype"], timestamp_ms=1000)
    with pytest.raises(ValueError, match="spec"):
        t.commit(_events(), partition_by=["event_id"], timestamp_ms=2000)


def test_unpartitioned_commit(tmp_path):
    d = str(tmp_path / "tbl")
    t = IcebergTable(d)
    t.commit(_events(12), timestamp_ms=1000)
    assert len(t.plan_files()) == 1
    assert read_iceberg(d).count() == 12


def test_planning_is_metadata_only(tmp_path):
    """plan_files must never open a parquet file — delete the data
    dir and planning still works (the read would fail, the plan not)."""
    import shutil

    d = str(tmp_path / "tbl")
    t = IcebergTable(d)
    t.commit(_events(), partition_by=["etype"], timestamp_ms=1000)
    shutil.rmtree(os.path.join(d, "data"))
    assert len(t.plan_files()) == 3
