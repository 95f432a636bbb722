"""Parquet source with pruning, predicate pushdown, field mapping.

Semantics reproduced: the reference's SourceReadNode — select
join/feature/ts columns, time-range filter, ``field_mapping`` renames
(local/nodes.py:26-57, ray/nodes.py:40-101,
feast/infra/offline_stores/file_source.py:32).

Scale notes: column pruning and the time-range predicate are pushed into
``ray.data.read_parquet`` so only the needed columns / row groups leave
storage; renames run zero-copy on Arrow batches.
"""

from __future__ import annotations

import os
from datetime import datetime

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def read_table(
    path: str,
    table: str | None = None,
    *,
    columns: list[str] | None = None,
    filter_expr: "pc.Expression | None" = None,
    ts_col: str | None = None,
    ts_range: tuple[datetime | None, datetime | None] | None = None,
    field_mapping: dict[str, str] | None = None,
    override_num_blocks: int | None = None,
    fmt: str = "parquet",
) -> ray.data.Dataset:
    """Read a source table as a Ray Dataset.

    ``path`` is a file, directory, or sf_dir when ``table`` is given
    (resolves ``{path}/{table}.{fmt}``). ``ts_range=(start, end)``
    filters ``start <= ts_col < end`` — a pushed-down predicate for
    parquet, a post-read vectorized filter for csv/json.
    ``field_mapping`` renames source→logical columns (applied after the
    read; ``columns``/``ts_col`` refer to source names). ``fmt`` is
    one of parquet/csv/json/delta (FileSource format parity incl.
    DeltaFormat, SURVEY §2.3; file_source.py:178,236-243).
    """
    if table is not None:
        path = os.path.join(path, table if fmt == "delta" else f"{table}.{fmt}")
    expr = filter_expr
    if ts_range is not None:
        if ts_col is None:
            raise ValueError("ts_range requires ts_col")
        start, end = ts_range
        if start is not None:
            e = pc.field(ts_col) >= pa.scalar(start, pa.timestamp("us"))
            expr = e if expr is None else expr & e
        if end is not None:
            e = pc.field(ts_col) < pa.scalar(end, pa.timestamp("us"))
            expr = e if expr is None else expr & e
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    if fmt == "parquet":
        if expr is not None:
            kwargs["filter"] = expr
        ds = ray.data.read_parquet(path, columns=columns, **kwargs)
    elif fmt == "delta":
        from feast_ray.sources.delta import read_delta

        ds = read_delta(path, columns=columns, filter_expr=expr, **kwargs)
    elif fmt in ("csv", "json"):
        reader = ray.data.read_csv if fmt == "csv" else ray.data.read_json
        ds = reader(path, **kwargs)
        if expr is not None:
            ds = ds.filter(expr=expr)
        if columns is not None:
            ds = ds.select_columns(columns)
    else:
        raise ValueError(f"unsupported source format {fmt!r}")
    mapping = dict(field_mapping) if field_mapping else None

    def _post(tbl: pa.Table) -> pa.Table:
        # Strip schema metadata: pandas-written parquet embeds a
        # b'pandas' metadata dict that makes pa.Schema unhashable, so
        # every downstream block concat in Ray falls back to the slow
        # unify-schemas path (transform_pyarrow.py:176-181 "Failed to
        # hash the schemas"). Zero-copy.
        tbl = tbl.replace_schema_metadata(None)
        if mapping:
            tbl = tbl.rename_columns(
                [mapping.get(c, c) for c in tbl.column_names]
            )
        return tbl

    return ds.map_batches(_post, batch_format="pyarrow", zero_copy_batch=True)
