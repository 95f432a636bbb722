"""Dedup stage: keep the newest row per key.

Semantics reproduced: the reference's DedupNode — argmax by
``(event_ts, created_ts)`` per key, nulls sorting first / losing ties
(dask.py:1229-1270 `_drop_duplicates`; ray/nodes.py:559-654, whose
comments at :560-576 and :601-630 spell out the streaming-vs-shuffle
trade-off we mirror with ``mode``):

- ``mode="global"`` — exact: per-block combiner (argmax per key within
  each batch — shrinks the shuffle to ≤ one row per key per block) then
  a hash-shuffle ``groupby(keys).map_groups`` picking the final argmax.
- ``mode="block"`` — streaming-safe cheap variant: per-block argmax
  only; cross-block duplicates are left for an idempotent last-write-
  wins sink, exactly the reference's materialization strategy.

Scale note: the combiner bounds shuffle volume by (#distinct keys per
block), so a hot key costs one row per block, not its full row count —
skew-resistant without explicit salting.
"""

from __future__ import annotations

import pandas as pd
import ray.data


def _argmax_reducer(order_by: list[str]):
    def _keep_last(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) <= 1:
            return df
        df = df.sort_values(order_by, kind="stable", na_position="first")
        return df.tail(1)

    return _keep_last


def _block_combiner(keys: list[str], order_by: list[str]):
    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) <= 1:
            return df
        df = df.sort_values(order_by, kind="stable", na_position="first")
        return df.drop_duplicates(subset=keys, keep="last")

    return _combine


def keep_latest(
    ds: ray.data.Dataset,
    keys: list[str],
    event_ts: str,
    created_ts: str | None = None,
    mode: str = "global",
) -> ray.data.Dataset:
    order_by = [event_ts] + ([created_ts] if created_ts else [])
    combined = ds.map_batches(
        _block_combiner(keys, order_by), batch_format="pandas"
    )
    if mode == "block":
        return combined
    return combined.groupby(keys).map_groups(
        _argmax_reducer(order_by), batch_format="pandas"
    )
