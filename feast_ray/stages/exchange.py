"""Raw-Ray bucketed exchange — the shuffle primitive under
``hash_join`` and ``bucketed_group_reduce``.

Ray Data's ``groupby(bucket).map_groups`` shuffle is SORT-based: it
pays a full range-partition sort for an ordering hash-bucketed
reducers never need (measured ~1 s of compute inside q02's ~5 s wall,
the rest being the sort-exchange constant). Partitioning alone
suffices, so this module drops to raw Ray tasks — the documented
last-resort rule (SURVEY custom-operator rule (c)), same shape as
``stages/dedup.py``'s ``keep_latest_exchange`` which measured 2×
over the sort path at 1.5 M rows:

* **map side**: one task per materialized block → stable-sort the
  block by its small-int bucket column → ``num_returns=B`` zero-copy
  slices (Arrow ``Table.slice``), one per bucket.
* **reduce side**: one task per bucket concatenates its ≤ M slices
  (M = map-task count) and applies the caller's per-bucket function.

Scale shape: classic MapReduce shuffle — B × M small objects through
the object store, no global order, no barrier beyond the one every
all-to-all already has. Skew lives in the caller's bucket assignment
(hash_join salts hot keys BEFORE the bucket column is computed, so a
salted key's rows still spread here). Partitioning assumption
unchanged: one bucket (all sides) fits in a worker's heap — scale
``num_buckets`` with data size.

Every exchange here (like ``keep_latest_exchange``) materializes its
upstream into the object store at BUILD time (``to_arrow_refs``) —
the same materialization the sort shuffle performs, surfaced eagerly;
the returned Dataset is lazy from the reduce outputs onward.

``FEAST_RAY_EXCHANGE=sort`` flips both consumers back to the
Ray-Data-native sort shuffle (kept as the parity/fallback path and
exercised by tests both ways).
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

import numpy as np
import pyarrow as pa
import ray
import ray.data


def raw_exchange_default() -> bool:
    """True when the raw exchange is the process-wide default."""
    return os.environ.get("FEAST_RAY_EXCHANGE", "raw") != "sort"


#: target bytes per bucket for auto-sized exchanges — the documented
#: one-bucket-fits-heap invariant made a derived quantity instead of a
#: constant sprinkled through pipelines (VERDICT r3 #7): a reducer
#: concatenates one bucket (~this many bytes) plus its merge output,
#: comfortably inside a worker heap at the default 2 GiB/CPU.
TARGET_BUCKET_BYTES = 128 << 20


def auto_num_buckets(
    total_bytes: int,
    *,
    target_bytes: "int | None" = None,
    min_buckets: int = 8,
    max_buckets: int = 4096,
) -> int:
    """Bucket count from input size: ``ceil(total / target)`` clamped
    to [min, max]. ``total_bytes=0`` (unknown size — e.g. object-store
    metadata unavailable) degrades to ``min_buckets``, which is still
    correct, just coarser-grained."""
    tgt = TARGET_BUCKET_BYTES if target_bytes is None else target_bytes
    b = -(-max(int(total_bytes), 1) // tgt)
    return max(min_buckets, min(max_buckets, b))


def refs_total_bytes(refs) -> int:
    """Total object-store bytes of materialized block refs — free
    metadata (no fetch). Returns 0 when sizes are unavailable."""
    try:
        locs = ray.experimental.get_object_locations(refs, timeout_ms=2000)
        return sum(int(v.get("object_size") or 0) for v in locs.values())
    except Exception:  # noqa: BLE001 — degrade to the coarse default
        return 0


def _split_remote(bucket_col: str, n_out: int, key_fn, drop_cols: Sequence[str]):
    """Build the map-side task: block → ``n_out`` per-bucket slices.

    ``key_fn(tbl) -> np.ndarray[int64]`` maps each row to its output
    index in [0, n_out) (identity on the bucket column for one-sided
    exchanges; side-composited for joins)."""

    @ray.remote(num_returns=n_out)
    def _split(tbl):
        # to_arrow_refs passes pandas-backed blocks through UNconverted
        # (despite the name) — normalize to Arrow here
        if not isinstance(tbl, pa.Table):
            tbl = pa.Table.from_pandas(tbl, preserve_index=False).replace_schema_metadata(None)
        key = key_fn(tbl)
        order = np.argsort(key, kind="stable")
        tbl = tbl.take(pa.array(order))
        key = key[order]
        bounds = np.searchsorted(key, np.arange(n_out + 1))
        drop = [c for c in drop_cols if c in tbl.column_names]
        tbl = tbl.drop_columns(drop)
        if n_out == 1:
            return tbl
        return tuple(
            tbl.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n_out)
        )

    return _split


def bucket_exchange(
    ds: ray.data.Dataset,
    bucket_col: str,
    num_buckets: "int | None",
    reduce_fn: Callable[[list[pa.Table]], pa.Table],
    *,
    fallback: Callable[[], ray.data.Dataset] | None = None,
    premodded: bool = True,
) -> ray.data.Dataset:
    """One-sided raw exchange: partition ``ds`` on its precomputed
    int ``bucket_col`` and run ``reduce_fn(parts)`` once per bucket
    (``parts`` are that bucket's per-map-task Arrow slices, the bucket
    column already dropped; EVERY bucket gets a reduce call, possibly
    with all-empty typed parts — reducers must tolerate empty input).

    ``fallback`` builds the sort-shuffle equivalent; it is used when
    the input materializes to zero blocks (no schema to exchange).

    ``num_buckets=None`` AUTO-SIZES the bucket count from the
    materialized input's object-store bytes (``auto_num_buckets``) —
    possible here because the exchange materializes at build time, so
    the size is known before any slice moves. Requires
    ``premodded=False``: ``bucket_col`` then carries the RAW uint64
    key hash (stored as int64) and each map task mods it by the
    derived count."""
    def _key(tbl: pa.Table) -> np.ndarray:
        # Ray Data emits 0-row map_batches outputs as SCHEMA-LESS empty
        # blocks (no columns at all) — route them to bucket 0; they
        # carry no rows
        if bucket_col not in tbl.column_names:
            return np.zeros(len(tbl), dtype=np.int64)
        v = tbl[bucket_col].to_numpy(zero_copy_only=False)
        if premodded:
            return v.astype(np.int64)
        return (v.astype(np.int64).view(np.uint64) % np.uint64(B)).astype(
            np.int64
        )

    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    if not refs:
        if fallback is not None:
            return fallback()
        raise ValueError("bucket_exchange on a zero-block Dataset")
    if num_buckets is None:
        if premodded:
            raise ValueError("num_buckets=None requires premodded=False")
        # size from the materialized dataset's own block metadata —
        # free and reliable; the object-location query is only a
        # fallback (it can time out under load)
        size = mat.size_bytes() or 0
        B = auto_num_buckets(size if size > 0 else refs_total_bytes(refs))
    else:
        B = num_buckets
    _split = _split_remote(bucket_col, B, _key, [bucket_col])

    # slice refs ride INSIDE a list argument (not as task args): Ray
    # then never runs dependency resolution/inlining over thousands of
    # tiny slice objects — a path where Ray 2.49's reference counter
    # can fatally race (reference_count.cc:581 check failure, observed
    # once under heavy co-tenant load) — and the reduce task fetches
    # its bucket's slices itself
    @ray.remote
    def _reduce(part_refs):
        return reduce_fn(list(ray.get(list(part_refs))))

    split_refs = [_split.remote(r) for r in refs]
    if B == 1:
        out = [_reduce.remote(split_refs)]
    else:
        out = [_reduce.remote([sr[b] for sr in split_refs]) for b in range(B)]
    return ray.data.from_arrow_refs(out)


def two_sided_exchange(
    both: ray.data.Dataset,
    bucket_col: str,
    side_col: str,
    right_tag: str,
    num_buckets: int,
    join_fn: Callable[[list[pa.Table], list[pa.Table]], pa.Table],
    *,
    fallback: Callable[[], ray.data.Dataset] | None = None,
    premodded: bool = True,
) -> ray.data.Dataset:
    """Two-sided raw exchange for joins: ``both`` is the tagged UNION
    of the two sides (one streaming execution, so the sides still run
    concurrently); each map task splits its block into 2·B slices
    keyed by (side, bucket) and reducer ``b`` receives bucket ``b``'s
    left slices and right slices separately — ``join_fn(lparts,
    rparts)`` joins them (parts may be empty / schema-drifted per
    block; the caller casts each part to its captured side schema).

    ``premodded=False``: ``bucket_col`` carries the RAW uint64 key
    hash (stored as int64; hash_join's deferred auto-sizing mode) and
    each map task mods it by ``num_buckets`` here."""
    B = num_buckets

    def _key(tbl: pa.Table) -> np.ndarray:
        if bucket_col not in tbl.column_names:  # schema-less empty block
            return np.zeros(len(tbl), dtype=np.int64)
        b = tbl[bucket_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not premodded:
            b = (b.view(np.uint64) % np.uint64(B)).astype(np.int64)
        is_r = np.asarray(tbl[side_col].to_numpy(zero_copy_only=False) == right_tag)
        return b + is_r.astype(np.int64) * B

    refs = both.to_arrow_refs()
    if not refs:
        if fallback is not None:
            return fallback()
        raise ValueError("two_sided_exchange on a zero-block Dataset")
    _split = _split_remote(bucket_col, 2 * B, _key, [bucket_col, side_col])

    # refs inside list args — see bucket_exchange for why (Ray 2.49
    # arg-inlining race under thousands of tiny multi-return objects)
    @ray.remote
    def _reduce(l_refs, r_refs):
        return join_fn(list(ray.get(list(l_refs))), list(ray.get(list(r_refs))))

    split_refs = [_split.remote(r) for r in refs]
    out = [
        _reduce.remote(
            [sr[b] for sr in split_refs],
            [sr[B + b] for sr in split_refs],
        )
        for b in range(B)
    ]
    return ray.data.from_arrow_refs(out)
