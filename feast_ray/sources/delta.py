"""Delta Lake source (and a minimal writer for fixtures/round-trips).

Semantics reproduced: the reference reads DeltaFormat file sources by
resolving the table's active file set and scanning those parquet files
(infra/offline_stores/file_source.py:178,236-243 — DeltaFormat →
``DeltaTable(...).file_uris()``). The ``deltalake`` package is not in
this sandbox, so the transaction-log replay is implemented directly
against the open Delta protocol: ``_delta_log/<version>.json`` commit
files containing ``add`` / ``remove`` actions (JSON-lines). Supported:
JSON commits, optional version pinning (time travel), partition-free
and directory-partitioned adds. Not supported (documented): parquet
checkpoints, deletion vectors, column mapping — commits after an
unreadable checkpoint raise rather than silently mis-read.

Scale notes: log replay touches only the (small) JSON log; the data
scan is a plain ``ray.data.read_parquet`` over the active files, so
column pruning / predicate pushdown work exactly as for raw parquet.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from datetime import datetime
from urllib.parse import unquote

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

_LOG_DIR = "_delta_log"
_COMMIT_RE = re.compile(r"^(\d{20})\.json$")


def _commit_files(path: str) -> list[tuple[int, str]]:
    log = os.path.join(path, _LOG_DIR)
    if not os.path.isdir(log):
        raise FileNotFoundError(f"not a Delta table (no {_LOG_DIR}): {path}")
    out = []
    for f in os.listdir(log):
        m = _COMMIT_RE.match(f)
        if m:
            out.append((int(m.group(1)), os.path.join(log, f)))
        elif ".checkpoint." in f or f == "_last_checkpoint":
            # covers single-part AND multi-part checkpoint names — a
            # vacuumed log replayed without its checkpoint would
            # silently yield a wrong active-file set
            raise NotImplementedError(
                "Delta parquet checkpoints are not supported by this reader"
            )
    return sorted(out)


def delta_file_uris(path: str, version: int | None = None) -> list[str]:
    """Active data files of a Delta table at ``version`` (default:
    latest) — the log replay the reference delegates to
    ``DeltaTable.file_uris()``."""
    active: dict[str, str] = {}
    for v, commit in _commit_files(path):
        if version is not None and v > version:
            break
        with open(commit) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action:
                    rel = action["add"]["path"]
                    # the protocol percent-encodes paths (partition
                    # values with spaces etc.)
                    active[rel] = os.path.join(path, unquote(rel))
                elif "remove" in action:
                    active.pop(action["remove"]["path"], None)
    return [active[k] for k in sorted(active)]


def read_delta(
    path: str,
    *,
    version: int | None = None,
    columns: list[str] | None = None,
    filter_expr=None,
    **read_kwargs,
) -> ray.data.Dataset:
    """A Delta table as a lazy Ray Dataset (column pruning + predicate
    pushdown forwarded to the parquet scan)."""
    files = delta_file_uris(path, version)
    if not files:
        # empty table: synthesize the declared schema from metaData so
        # downstream select/validate still see the right columns
        schema = _read_meta_schema(path)
        if columns is not None:
            schema = pa.schema([schema.field(c) for c in columns])
        return ray.data.from_arrow(schema.empty_table())
    kwargs = dict(read_kwargs)
    if filter_expr is not None:
        kwargs["filter"] = filter_expr
    return ray.data.read_parquet(files, columns=columns, **kwargs)


_DELTA_TO_ARROW = {
    "long": pa.int64(), "integer": pa.int32(), "double": pa.float64(),
    "float": pa.float32(), "boolean": pa.bool_(), "timestamp": pa.timestamp("us"),
    "date": pa.date32(), "binary": pa.binary(), "string": pa.string(),
}


def _read_meta_schema(path: str) -> pa.Schema:
    """Arrow schema from the table's metaData schemaString (the inverse
    of :func:`_schema_string` for the types this writer emits)."""
    for _, commit in _commit_files(path):
        with open(commit) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "metaData" in action:
                    spec = json.loads(action["metaData"]["schemaString"])
                    fields = []
                    for f in spec.get("fields", []):
                        t = f["type"]
                        if isinstance(t, dict) and t.get("type") == "array":
                            at = pa.list_(
                                _DELTA_TO_ARROW.get(t.get("elementType"), pa.string())
                            )
                        else:
                            at = _DELTA_TO_ARROW.get(t, pa.string())
                        fields.append(pa.field(f["name"], at))
                    return pa.schema(fields)
    return pa.schema([])


def _schema_string(schema: pa.Schema) -> str:
    """Arrow schema → Delta (Spark-style) schemaString JSON."""

    def _typ(t: pa.DataType) -> object:
        if pa.types.is_int64(t) or pa.types.is_uint64(t):
            return "long"
        if pa.types.is_integer(t):
            return "integer"
        if pa.types.is_float64(t):
            return "double"
        if pa.types.is_floating(t):
            return "float"
        if pa.types.is_boolean(t):
            return "boolean"
        if pa.types.is_timestamp(t):
            return "timestamp"
        if pa.types.is_date(t):
            return "date"
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return "binary"
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            return {"type": "array", "elementType": _typ(t.value_type),
                    "containsNull": True}
        return "string"

    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": f.name, "type": _typ(f.type), "nullable": True,
                 "metadata": {}}
                for f in schema
            ],
        }
    )


def write_delta(data, path: str, *, mode: str = "overwrite") -> int:
    """Write a pa.Table / pandas DataFrame / Dataset as a Delta table
    (one commit). ``mode="overwrite"`` removes prior active files in
    the same commit; ``"append"`` only adds. Returns the new version.

    Fixture-grade writer: single-commit JSON log in the open protocol
    layout so any Delta reader (including this module's) can scan it.
    """
    import pandas as pd

    if isinstance(data, ray.data.Dataset):
        tbl = pa.Table.from_pandas(
            data.to_pandas(), preserve_index=False
        ).replace_schema_metadata(None)
    elif isinstance(data, pd.DataFrame):
        tbl = pa.Table.from_pandas(data, preserve_index=False).replace_schema_metadata(None)
    else:
        tbl = data
    os.makedirs(os.path.join(path, _LOG_DIR), exist_ok=True)
    existing = _commit_files(path)
    version = existing[-1][0] + 1 if existing else 0
    now_ms = int(datetime.now().timestamp() * 1000)
    actions: list[dict] = []
    if version == 0:
        actions.append({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
        actions.append(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": _schema_string(tbl.schema),
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": now_ms,
                }
            }
        )
    if mode == "overwrite" and version > 0:
        for rel in [os.path.relpath(p, path) for p in delta_file_uris(path)]:
            actions.append(
                {"remove": {"path": rel, "deletionTimestamp": now_ms,
                            "dataChange": True}}
            )
    fname = f"part-{version:05d}-{uuid.uuid4().hex[:12]}.snappy.parquet"
    fpath = os.path.join(path, fname)
    pq.write_table(tbl, fpath)
    actions.append(
        {
            "add": {
                "path": fname,
                "size": os.path.getsize(fpath),
                "partitionValues": {},
                "modificationTime": now_ms,
                "dataChange": True,
            }
        }
    )
    commit = os.path.join(path, _LOG_DIR, f"{version:020d}.json")
    with open(commit + ".tmp", "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    os.replace(commit + ".tmp", commit)
    return version
