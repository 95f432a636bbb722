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


# --- schema evolution on read -----------------------------------------


def unify_evolved_schemas(schemas: "list[pa.Schema]") -> pa.Schema:
    """Union-by-name across evolved file schemas: field position is
    fixed by first appearance; a name seen with different types is
    promoted within the numeric family (any int width → int64; int
    mixed with float → float64); anything else (e.g. string vs int)
    is a loud error — silent coercion would corrupt data. The
    planning input is FOOTER schemas only (no data pages)."""
    order: list[str] = []
    types: dict[str, pa.DataType] = {}
    for sch in schemas:
        for f in sch:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = f.type
                continue
            a, b = types[f.name], f.type
            if a.equals(b):
                continue
            num = lambda t: (pa.types.is_integer(t), pa.types.is_floating(t))
            ai, af = num(a)
            bi, bf = num(b)
            if ai and bi:
                types[f.name] = pa.int64()
            elif (ai or af) and (bi or bf):
                types[f.name] = pa.float64()
            else:
                raise ValueError(
                    f"schema evolution cannot reconcile column "
                    f"{f.name!r}: {a} vs {b}")
    return pa.schema([pa.field(n, types[n]) for n in order])


def read_parquet_evolved(
    path: str, *, columns: "list[str] | None" = None
) -> ray.data.Dataset:
    """Read a directory of parquet files whose schemas EVOLVED over
    time (columns added, int widened to float) as one Dataset with
    the unified schema — missing columns become nulls, narrower
    numerics are cast up. Ray's ``read_parquet`` requires one
    schema; warehouse tables accrete columns for years.

    Scale shape: planning touches footer schemas only; files are
    grouped by their EXACT schema (k distinct historical versions →
    k ``read_parquet`` calls, each file-parallel as usual) and each
    group aligns to the unified schema with one zero-copy-where-
    possible batch kernel before a metadata-only ``union``. The
    align cost is per batch, never a shuffle."""
    import glob as _glob

    import pyarrow.parquet as _pq

    files = sorted(
        f for f in _glob.glob(os.path.join(path, "**", "*.parquet"),
                              recursive=True))
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    schemas = [_pq.read_schema(f) for f in files]
    unified = unify_evolved_schemas(schemas)
    if columns is not None:
        unified = pa.schema([unified.field(c) for c in columns])

    groups: dict[tuple, list[str]] = {}
    for f, sch in zip(files, schemas):
        key = tuple((fl.name, str(fl.type)) for fl in sch)
        groups.setdefault(key, []).append(f)

    def _align(tbl: pa.Table) -> pa.Table:
        cols = []
        for fl in unified:
            if fl.name in tbl.column_names:
                c = tbl[fl.name]
                if not c.type.equals(fl.type):
                    c = pc.cast(c, fl.type)
                cols.append(c)
            else:
                cols.append(pa.nulls(tbl.num_rows, fl.type))
        return pa.Table.from_arrays(cols, schema=unified)

    parts = []
    for key, fs in groups.items():
        have = {n for n, _ in key}
        want = [c for c in (columns or [f.name for f in unified])
                if c in have]
        parts.append(
            ray.data.read_parquet(fs, columns=want or None)
            .map_batches(_align, batch_format="pyarrow"))
    return parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
