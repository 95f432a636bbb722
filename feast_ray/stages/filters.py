"""Filter stages: vectorized predicate + TTL window filter.

Semantics reproduced: the reference's Filter node — TTL window keep
``entity_ts - ttl <= feature_ts <= entity_ts`` (ttl=0 / None ⇒ upper
bound only) plus optional user predicate (local/nodes.py:117-157,
ray/nodes.py:214-315, dask.py:1167-1200 `_filter_ttl`).

Both run as boolean-mask ``map_batches`` over Arrow batches — never a
per-row ``ds.filter(fn)``.
"""

from __future__ import annotations

from datetime import timedelta
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def filter_mask(
    ds: ray.data.Dataset,
    mask_fn: Callable[[pa.Table], "pa.ChunkedArray | pa.Array"],
) -> ray.data.Dataset:
    """Keep rows where ``mask_fn(batch)`` is true (vectorized)."""

    def _apply(tbl: pa.Table) -> pa.Table:
        return tbl.filter(mask_fn(tbl))

    return ds.map_batches(_apply, batch_format="pyarrow", zero_copy_batch=True)


def ttl_filter(
    ds: ray.data.Dataset,
    feature_ts: str,
    entity_ts: "str | pa.Scalar | object",
    ttl: timedelta | None = None,
    keep_null_ts: bool = True,
) -> ray.data.Dataset:
    """TTL window filter. ``entity_ts`` is a column name (row-wise bound)
    or a constant timestamp. Keeps rows with
    ``entity_ts - ttl <= feature_ts <= entity_ts``; with ``ttl`` None
    OR zero (the Feast convention for "no expiry", feature_view.py ttl
    semantics), only the upper bound applies (dask.py:1167-1200)."""

    def _mask(tbl: pa.Table):
        fts = tbl[feature_ts]
        upper = tbl[entity_ts] if isinstance(entity_ts, str) and entity_ts in tbl.column_names else entity_ts
        mask = pc.less_equal(fts, upper)
        if ttl:  # None and timedelta(0) both mean "no lower bound"
            lower = pc.subtract(upper, pa.scalar(ttl))
            mask = pc.and_(mask, pc.greater_equal(fts, lower))
        if keep_null_ts:
            mask = pc.or_kleene(mask, pc.is_null(fts))
        else:
            mask = pc.fill_null(mask, False)
        return mask

    return filter_mask(ds, _mask)
