"""Transform stage: UDF over batches, stateless or actor-pool.

Semantics reproduced: the reference's Transform node and its UDF modes
(ray/nodes.py:657-766, transformation/ray_transformation.py:14-180,
transformation/pandas_transformation.py:93-100). The reference ships
dill-serialized UDFs to workers; Ray Data does that natively
(cloudpickle), so this wrapper only normalizes the two execution
flavors:

- plain function → stateless Ray tasks (cheap, elastic);
- callable class → actor pool, state built once per actor in
  ``__init__`` (model load / regex compile), per the reference's own
  documented pattern (transformation/ray_transformation.py:30-74).
"""

from __future__ import annotations

import inspect
from typing import Any

import ray.data


def transform(
    ds: ray.data.Dataset,
    fn: Any,
    *,
    batch_format: str = "pyarrow",
    batch_size: int | None = None,
    concurrency: int | tuple[int, int] | None = None,
    num_cpus: float | None = None,
    fn_constructor_args: tuple = (),
    zero_copy_batch: bool = True,
    **kwargs,
) -> ray.data.Dataset:
    from feast_ray.plugins import resolve_udf

    fn = resolve_udf(fn)
    opts: dict[str, Any] = dict(batch_format=batch_format, **kwargs)
    if batch_size is not None:
        opts["batch_size"] = batch_size
    if num_cpus is not None:
        opts["num_cpus"] = num_cpus
    if inspect.isclass(fn):
        opts["concurrency"] = concurrency or (1, 4)
        if fn_constructor_args:
            opts["fn_constructor_args"] = fn_constructor_args
    else:
        opts["zero_copy_batch"] = zero_copy_batch
        if concurrency is not None:
            opts["concurrency"] = concurrency
    return ds.map_batches(fn, **opts)


class SqlBatchTransform:
    """SQL transformation mode (the reference's
    transformation/sql_transformation.py + mode.py TransformationMode.SQL):
    the UDF is a SQL statement over a relation named ``batch``, executed
    per Arrow batch by an embedded DuckDB session held once per worker
    (zero-copy Arrow in/out). Example::

        transform(ds, SqlBatchTransform,
                  fn_constructor_args=("select *, a + b as c from batch",))

    Distribution-correct only for ROW-LOCAL SQL (projections, scalar
    expressions, filters) — a per-batch aggregate would aggregate each
    batch independently; use the Aggregate stage for those.
    """

    def __init__(self, sql: str):
        import duckdb

        self.sql = sql
        self.con = duckdb.connect()

    def __call__(self, batch):
        import pyarrow as pa

        self.con.register("batch", batch)
        out = self.con.execute(self.sql).fetch_arrow_table()
        self.con.unregister("batch")
        # duckdb emits its own chunking; normalize to one combined table
        return out.combine_chunks() if isinstance(out, pa.Table) else out


def sql_transform(
    ds: ray.data.Dataset,
    sql: str,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = None,
) -> ray.data.Dataset:
    """Apply a SQL-mode transform (see :class:`SqlBatchTransform`)."""
    return transform(
        ds,
        SqlBatchTransform,
        fn_constructor_args=(sql,),
        concurrency=concurrency,
        batch_size=batch_size,
    )


def substrait_eval(tbl, plan: bytes):
    """Evaluate a serialized Substrait ExtendedExpression over one
    Arrow table: every named expression in the plan becomes an output
    column appended to the input columns. Plans are produced with
    ``pyarrow.substrait.serialize_expressions`` (or any Substrait
    producer) against the input schema — the portable-expression
    interchange the reference exposes as the ODFV "substrait" mode
    (feast/on_demand_feature_view.py:116-210 / transformation/
    substrait_transformation.py)."""
    import pyarrow.dataset as pads
    import pyarrow.substrait as ps

    bound = ps.deserialize_expressions(plan)
    # Substrait field references are POSITIONAL against the plan's
    # embedded input schema — project the batch to that schema by NAME
    # (and cast) before evaluating, so a batch with extra/reordered
    # columns (the retrieval result) still binds correctly
    sub = tbl.select(bound.schema.names).cast(bound.schema)
    out = pads.dataset(sub).to_table(columns=dict(bound.expressions))
    for name in out.column_names:
        tbl = tbl.append_column(name, out[name])
    return tbl


def substrait_transform(
    ds: ray.data.Dataset,
    plan: bytes,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = None,
) -> ray.data.Dataset:
    """Distributed Substrait expression transform: the (tiny) plan is
    captured by value in the task closure; evaluation is Arrow-native
    C++ per batch (no pandas round-trip)."""
    return ds.map_batches(
        lambda t, p=plan: substrait_eval(t, p),
        batch_format="pyarrow",
        **({"concurrency": concurrency} if concurrency else {}),
        **({"batch_size": batch_size} if batch_size else {}),
    )
