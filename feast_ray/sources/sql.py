"""``read_sql`` escape hatch — the warehouse-source family.

The reference ships ~20 warehouse offline stores (BigQuery, Snowflake,
Redshift, Trino, …) that all reduce to "run a SQL query, get a table"
(e.g. infra/offline_stores/bigquery.py, snowflake.py). SURVEY §2.3
scopes those connectors out and promises ONE generic DBAPI hatch
instead; this is it, built on ``ray.data.read_sql`` (parallel reads via
``shard_keys`` when the backend supports MOD/MD5 sharding).

Any DBAPI2 connection factory works; the in-sandbox test backend is
DuckDB (which also stands in for the warehouses' SQL dialects).
"""

from __future__ import annotations

from typing import Any, Callable

import ray.data


def read_sql(
    sql: str,
    connection_factory: Callable[[], Any],
    *,
    shard_keys: list[str] | None = None,
    override_num_blocks: int | None = None,
    **kwargs,
) -> ray.data.Dataset:
    """Run ``sql`` against a DBAPI connection and return a Dataset.

    Without ``shard_keys`` the query runs as a single task (exactly the
    reference's one-shot warehouse pull); with ``shard_keys`` (+
    ``override_num_blocks``) the read is split into per-shard queries
    executed in parallel — the backend must support the sharding
    functions ``ray.data.read_sql`` emits.
    """
    kw: dict[str, Any] = dict(kwargs)
    if shard_keys is not None:
        kw["shard_keys"] = shard_keys
    if override_num_blocks is not None:
        kw["override_num_blocks"] = override_num_blocks
    return ray.data.read_sql(sql, connection_factory, **kw)


def duckdb_factory(*views_parquet: tuple[str, str], database: str = ":memory:"):
    """Connection factory for DuckDB over parquet files: each
    ``(name, path)`` pair is registered as a view. Returns a callable
    suitable for :func:`read_sql` (fresh connection per call — worker
    processes cannot share one handle)."""

    def _connect():
        import duckdb

        con = duckdb.connect(database)
        for name, path in views_parquet:
            con.execute(
                f"create or replace view {name} as select * from read_parquet('{path}')"
            )
        return con

    return _connect
