"""Data-layout operators: Z-order clustering + zone-map pruning.

The two halves of the "prune at the read" story at 100 TB:

- **Z-order clustering** (``zvalue``): interleave the bits of k
  normalized integer columns so that range-partitioning the single
  z-value co-locates rows that are close in EVERY clustered dimension
  (the Delta Lake ``OPTIMIZE ZORDER BY`` layout op; Morton order).
  A file sorted this way has tight min/max envelopes on ALL clustered
  columns at once, which is what makes the zone map below effective
  for more than one predicate column.
- **Zone maps** (``build_zone_map`` / ``prune_partitions``): a
  partition-level min/max secondary index built from parquet FOOTER
  metadata only — planning never reads data pages. A predicate
  ``lo <= col <= hi`` skips every partition whose envelope misses the
  interval; surviving partitions still get the row filter pushed into
  ``read_parquet`` for row-group-level pruning below the file level.

Reference analog: none (Feast's offline stores read whole sources and
rely on the warehouse to prune); this belongs to the engine's
scale-out surface (SURVEY §2 extension). Everything here is
deterministic integer arithmetic so a SQL oracle can restate both the
z-values and the exact set of partitions a predicate must scan.

Scale notes: normalization bounds are one tiny min/max aggregate;
bit interleaving is vectorized numpy over Arrow batches; the layout
sort is the sample-sort range exchange (``global_rank_int``) — never
a full payload sort shuffle; the zone map is O(partitions) rows and
broadcasts to the planner (driver) only.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ZBITS = 16  # per-dimension resolution of the z-value grid


def normalize_to_grid(v: np.ndarray, lo: int, hi: int, bits: int = ZBITS) -> np.ndarray:
    """Exact integer normalization of int64 values in [lo, hi] onto
    ``[0, 2**bits)``: ``((v - lo) * (2**bits - 1)) // (hi - lo)``.
    Pure int64 arithmetic — bit-reproducible in SQL — with a loud
    overflow guard on the intermediate product."""
    v = np.asarray(v, dtype=np.int64)
    if hi <= lo:
        return np.zeros(len(v), np.int64)
    span = int(hi) - int(lo)
    scale = (1 << bits) - 1
    if span > (1 << 62) // scale:
        raise ValueError(
            f"normalize_to_grid overflow: span {span} * {scale} exceeds int64; "
            "pre-scale the column (e.g. divide to coarser units) first")
    return (v - np.int64(lo)) * np.int64(scale) // np.int64(span)


def zvalue(cols: "list[np.ndarray]", bits: int = ZBITS) -> np.ndarray:
    """Morton (Z-order) interleave of k grid coordinates, each in
    ``[0, 2**bits)``: output bit ``k*b + j`` is bit ``b`` of column
    ``j``. Vectorized across rows (one shift/mask pass per bit per
    column, 2k·bits numpy ops total); k·bits must fit in 63 bits."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds int64 z-value")
    z = np.zeros(len(cols[0]), np.int64)
    for j, c in enumerate(cols):
        c = np.asarray(c, dtype=np.int64)
        if len(c) and (c.min() < 0 or c.max() >= (1 << bits)):
            raise ValueError(f"zvalue column {j} outside [0, 2**{bits})")
        for b in range(bits):
            z |= ((c >> b) & 1) << (k * b + j)
    return z


def zvalue_sql(col_exprs: "list[str]", bits: int = ZBITS) -> str:
    """The unrolled SQL expression computing :func:`zvalue` over the
    given (already grid-normalized, bigint) column expressions —
    the oracle restates the exact interleave, not per-case answers."""
    k = len(col_exprs)
    terms = []
    for j, e in enumerate(col_exprs):
        for b in range(bits):
            terms.append(f"(((({e}) >> {b}) & 1) << {k * b + j})")
    return "(" + " | ".join(terms) + ")"


def build_zone_map(data_dir: str, cols: "list[str]") -> pa.Table:
    """Partition-level zone map from parquet footer statistics only.

    ``data_dir`` holds hive-style ``<part>=<val>/`` partition
    directories (the engine's partitioned-write layout). For each
    partition and each requested column, the envelope is the min of
    row-group stat minima / max of maxima across every file in the
    partition — no data page is read. Returns one row per
    (partition, column): ``part`` (directory name), ``col``,
    ``vmin``, ``vmax``, ``n_rows``.
    """
    parts, colv, vmin, vmax, nrows = [], [], [], [], []
    for entry in sorted(os.listdir(data_dir)):
        pdir = os.path.join(data_dir, entry)
        if not os.path.isdir(pdir) or "=" not in entry:
            continue
        env: dict[str, list] = {c: [None, None, 0] for c in cols}
        for fn in sorted(os.listdir(pdir)):
            if not fn.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(pdir, fn)).metadata
            name_to_idx = {md.schema.column(i).name: i
                           for i in range(md.num_columns)}
            for c in cols:
                ci = name_to_idx[c]
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        raise ValueError(
                            f"no min/max stats for {c} in {pdir}/{fn}")
                    lo, hi, _ = env[c]
                    env[c][0] = st.min if lo is None else min(lo, st.min)
                    env[c][1] = st.max if hi is None else max(hi, st.max)
                env[c][2] += md.num_rows
        for c in cols:
            lo, hi, n = env[c]
            parts.append(entry)
            colv.append(c)
            vmin.append(lo)
            vmax.append(hi)
            nrows.append(n)
    return pa.table({
        "part": pa.array(parts, pa.string()),
        "col": pa.array(colv, pa.string()),
        "vmin": pa.array(vmin),
        "vmax": pa.array(vmax),
        "n_rows": pa.array(nrows, pa.int64()),
    })


def prune_partitions(
    zone_map: pa.Table, col: str, lo, hi
) -> "tuple[list[str], int]":
    """Partitions a closed-interval predicate ``lo <= col <= hi`` must
    scan: those whose [vmin, vmax] envelope intersects [lo, hi].
    Returns (sorted surviving partition names, total partitions)."""
    zm = zone_map.to_pandas()
    zm = zm[zm["col"] == col]
    total = len(zm)
    keep = zm[(zm["vmin"] <= hi) & (zm["vmax"] >= lo)]
    return sorted(keep["part"].tolist()), total
