"""Apache ORC source/sink over ``pyarrow.orc``.

Ray Data 2.49 ships no ``read_orc``; warehouses that standardized on
Hive/ORC need one to feed this engine (reference surface: the offline
stores' format plurality, e.g. feast's file/spark sources accepting
non-parquet data). Planner shape mirrors ``read_parquet``'s: the
driver lists files and reads only FOOTERS (stripe counts — the
metadata cost every planner pays), then each (file, stripe) becomes
one read task via ``map_batches`` with ``batch_size=1``, so stripe
reads stream in parallel with downstream stages and column pruning
happens INSIDE the ORC reader (``read_stripe(columns=...)``) — only
requested columns leave storage.

Scale note: parallelism = total stripes (the ORC row-group analog);
writers control stripe size, so a 100 TB lake reads wide. A single
giant un-striped file degrades to one task — re-stripe at write time
(``write_orc`` uses the pyarrow default ~64 Mi rows per stripe
unless told otherwise).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.orc as paorc
import ray.data


def write_orc(table: "pa.Table", path: str, *,
              stripe_size: "int | None" = None) -> None:
    """Write one ORC file (pyarrow.orc). ``stripe_size`` in bytes."""
    kw = {}
    if stripe_size is not None:
        kw["stripe_size"] = stripe_size
    paorc.write_table(table, path, **kw)


def _list_orc_files(paths: "str | list[str]") -> list[str]:
    paths = [paths] if isinstance(paths, str) else list(paths)
    out = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(
                os.path.join(p, f)
                for f in sorted(os.listdir(p))
                if f.endswith(".orc")
            )
        elif os.path.isfile(p):
            out.append(p)
        else:
            raise FileNotFoundError(f"ORC path does not exist: {p!r}")
    if not out:
        raise FileNotFoundError(f"no ORC files under {paths!r}")
    return out


def read_orc(
    paths: "str | list[str]",
    *,
    columns: "list[str] | None" = None,
) -> ray.data.Dataset:
    """ORC files/dirs -> Dataset, one task per stripe, columns pruned
    at the reader. See module docstring for the planner shape."""
    files = _list_orc_files(paths)
    items = []
    for f in files:
        nstripes = paorc.ORCFile(f).nstripes  # footer-only read
        items.extend({"path": f, "stripe": s} for s in range(nstripes))

    def _read(batch: "pa.Table") -> pa.Table:
        tabs = []
        for path, stripe in zip(
            batch["path"].to_pylist(), batch["stripe"].to_pylist()
        ):
            of = paorc.ORCFile(path)
            rb = of.read_stripe(stripe, columns=columns)  # RecordBatch
            tabs.append(pa.Table.from_batches([rb]))
        return pa.concat_tables(tabs)

    return ray.data.from_items(items).map_batches(
        _read, batch_format="pyarrow", batch_size=1
    )
