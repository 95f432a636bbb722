"""Iceberg-shaped table-format source (spec subset, first-party).

Apache Iceberg's table layout implemented from the PUBLIC spec
(https://iceberg.apache.org/spec/) with the pieces a batch reader
actually needs — no Iceberg library exists in this sandbox, so the
writer here pins the reader the same way the repo's media codecs are
pinned by first-party encoders:

- ``metadata/v<N>.metadata.json`` — table metadata: schema id,
  identity partition spec, snapshot log, current snapshot pointer;
  ``metadata/version-hint.text`` holds N (the HadoopCatalog
  convention).
- manifest list — one Avro OCF per snapshot (``snap-<id>.avro``):
  one record per manifest with added/existing/deleted counts.
- manifest — Avro OCF: one ``manifest_entry`` per data file with
  status (1 = ADDED, 0 = EXISTING, 2 = DELETED), a typed
  ``partition`` record of identity-transform values, record count
  and byte size. Data files are plain parquet under ``data/``.

Reader features: snapshot selection (current / by id / time travel by
timestamp), PARTITION PRUNING from manifest entries (planning reads
metadata + avro manifests only — never a parquet footer or data
page), column pruning pushed into ``read_parquet``. Commit model:
``append`` (prior manifests carry forward) and ``overwrite``
(replaces the file set; prior files become unreachable from the new
snapshot but remain readable by time travel).

Declared boundary (loud errors, never silent): identity partition
transforms only (no bucket/truncate/day), no column-stats pruning, no
format-v2 row-level delete files, single-writer commits (no
optimistic-concurrency retry loop).

Reference analog: none in Feast (its offline stores delegate table
formats to the warehouse; the repo's Delta source covers the
txn-log-replay family) — SURVEY §2.3 extension.

Scale notes: planning is O(manifests + entries) driver-side metadata
(exactly Iceberg's design point — file listing never touches object
storage listings); the read is one file-parallel ``read_parquet``
over surviving files. Partition pruning happens at PLAN time, so a
pruned partition costs zero tasks.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from feast_ray.functions.avro import read_container, write_container

_MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_data_files_count", "type": "int"},
        {"name": "existing_data_files_count", "type": "int"},
        {"name": "deleted_data_files_count", "type": "int"},
    ],
}


def _manifest_schema(part_fields: "list[tuple[str, str]]") -> dict:
    part = {
        "type": "record", "name": "r102", "fields": [
            {"name": n, "type": ["null", t]} for n, t in part_fields],
    }
    return {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": "long"},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2", "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "partition", "type": part},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ]}},
        ],
    }


def _avro_part_type(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "long"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    raise NotImplementedError(
        f"identity partition over {t} not supported (string/int only)")


class IcebergTable:
    """Handle over a table directory; all state lives on disk."""

    def __init__(self, table_dir: str):
        self.dir = table_dir
        self.meta_dir = os.path.join(table_dir, "metadata")
        self.data_dir = os.path.join(table_dir, "data")

    # ------------------------------------------------------ metadata

    def _version(self) -> int:
        hint = os.path.join(self.meta_dir, "version-hint.text")
        if not os.path.exists(hint):
            return 0
        return int(open(hint).read().strip())

    def _load_meta(self) -> dict:
        v = self._version()
        if v == 0:
            raise FileNotFoundError(f"no iceberg metadata under {self.dir}")
        return json.load(
            open(os.path.join(self.meta_dir, f"v{v}.metadata.json")))

    def snapshots(self) -> "list[dict]":
        return self._load_meta()["snapshots"]

    # -------------------------------------------------------- commit

    def commit(
        self,
        table: pa.Table,
        *,
        partition_by: "list[str] | None" = None,
        operation: str = "append",
        timestamp_ms: "int | None" = None,
    ) -> int:
        """Write one snapshot: split ``table`` by identity partition
        values (one parquet file per distinct tuple), one manifest of
        ADDED entries, a manifest list carrying prior manifests
        forward (append) or not (overwrite), and the next
        ``v<N>.metadata.json``. Returns the snapshot id (= N)."""
        if operation not in ("append", "overwrite"):
            raise NotImplementedError(f"operation {operation!r}")
        os.makedirs(self.meta_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)
        v = self._version()
        partition_by = partition_by or []
        part_fields = [(c, _avro_part_type(table.schema.field(c).type))
                       for c in partition_by]
        prev_meta = self._load_meta() if v else None
        if prev_meta is not None:
            prev_pf = prev_meta["partition_fields"]
            if [list(x) for x in part_fields] != prev_pf:
                raise ValueError(
                    f"partition spec change {prev_pf} -> {part_fields}: "
                    "spec evolution not supported")
        snap_id = v + 1

        # data files: one per distinct partition tuple
        import pyarrow.compute as pc

        entries = []
        if partition_by:
            keys = table.select(partition_by)
            combos = keys.group_by(partition_by).aggregate([]).to_pylist()
            combos.sort(key=lambda d: tuple(str(d[c]) for c in partition_by))
        else:
            combos = [{}]
        for i, combo in enumerate(combos):
            part = table
            for c, val in combo.items():
                part = part.filter(pc.equal(pc.field(c), pa.scalar(val)))
            fn = f"snap{snap_id:05d}-{i:04d}.parquet"
            fpath = os.path.join(self.data_dir, fn)
            pq.write_table(part, fpath)
            entries.append({
                "status": 1, "snapshot_id": snap_id,
                "data_file": {
                    "file_path": os.path.join("data", fn),
                    "file_format": "PARQUET",
                    "partition": {c: combo.get(c) for c, _ in part_fields},
                    "record_count": part.num_rows,
                    "file_size_in_bytes": os.path.getsize(fpath),
                }})

        mname = f"manifest-{snap_id:05d}.avro"
        mpath = os.path.join(self.meta_dir, mname)
        write_container(mpath, entries, _manifest_schema(part_fields))
        mlist = [{
            "manifest_path": os.path.join("metadata", mname),
            "manifest_length": os.path.getsize(mpath),
            "partition_spec_id": 0,
            "added_snapshot_id": snap_id,
            "added_data_files_count": len(entries),
            "existing_data_files_count": 0,
            "deleted_data_files_count": 0,
        }]
        if operation == "append" and prev_meta is not None:
            cur = next(s for s in prev_meta["snapshots"]
                       if s["snapshot-id"] == prev_meta["current-snapshot-id"])
            prior, _ = read_container(
                os.path.join(self.dir, cur["manifest-list"]))
            mlist = prior + mlist
        lname = f"snap-{snap_id:05d}.avro"
        write_container(os.path.join(self.meta_dir, lname), mlist,
                        _MANIFEST_LIST_SCHEMA)

        ts = int(time.time() * 1000) if timestamp_ms is None else timestamp_ms
        snaps = (prev_meta["snapshots"] if prev_meta else []) + [{
            "snapshot-id": snap_id,
            "timestamp-ms": ts,
            "manifest-list": os.path.join("metadata", lname),
            "summary": {"operation": operation},
        }]
        meta = {
            "format-version": 1,
            "location": self.dir,
            "last-updated-ms": ts,
            "partition_fields": [list(x) for x in part_fields],
            "current-snapshot-id": snap_id,
            "snapshots": snaps,
        }
        json.dump(meta, open(
            os.path.join(self.meta_dir, f"v{snap_id}.metadata.json"), "w"))
        with open(os.path.join(self.meta_dir, "version-hint.text"), "w") as f:
            f.write(str(snap_id))
        return snap_id

    # ---------------------------------------------------------- plan

    def plan_files(
        self,
        *,
        snapshot_id: "int | None" = None,
        asof_ms: "int | None" = None,
        partition_filter: "dict | None" = None,
    ) -> "list[dict]":
        """Metadata-only scan planning: resolve the snapshot, walk its
        manifest list + manifests, drop DELETED entries, prune by
        identity partition values. Returns data_file dicts."""
        meta = self._load_meta()
        snaps = meta["snapshots"]
        if snapshot_id is not None:
            snap = next((s for s in snaps
                         if s["snapshot-id"] == snapshot_id), None)
            if snap is None:
                raise KeyError(f"snapshot {snapshot_id} not found")
        elif asof_ms is not None:
            older = [s for s in snaps if s["timestamp-ms"] <= asof_ms]
            if not older:
                raise KeyError(f"no snapshot at or before {asof_ms}")
            snap = max(older, key=lambda s: s["timestamp-ms"])
        else:
            snap = next(s for s in snaps
                        if s["snapshot-id"] == meta["current-snapshot-id"])
        mlist, _ = read_container(os.path.join(self.dir,
                                               snap["manifest-list"]))
        files = []
        for mf in mlist:
            entries, _ = read_container(
                os.path.join(self.dir, mf["manifest_path"]))
            for e in entries:
                if e["status"] == 2:  # DELETED
                    continue
                df = e["data_file"]
                if partition_filter:
                    part = df["partition"]
                    if any(part.get(k) != v
                           for k, v in partition_filter.items()):
                        continue
                files.append(df)
        return files


def read_iceberg(
    table_dir: str,
    *,
    snapshot_id: "int | None" = None,
    asof_ms: "int | None" = None,
    columns: "list[str] | None" = None,
    partition_filter: "dict | None" = None,
) -> ray.data.Dataset:
    """Read an Iceberg-shaped table as a Ray Dataset: plan from
    metadata only (snapshot selection, partition pruning), then one
    file-parallel pruned ``read_parquet`` over surviving files."""
    t = IcebergTable(table_dir)
    files = t.plan_files(snapshot_id=snapshot_id, asof_ms=asof_ms,
                         partition_filter=partition_filter)
    if not files:
        raise ValueError("iceberg scan planned zero files "
                         "(empty snapshot or over-pruned filter)")
    paths = [os.path.join(table_dir, f["file_path"]) for f in files]
    return ray.data.read_parquet(paths, columns=columns)
