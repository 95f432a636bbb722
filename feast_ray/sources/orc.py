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


def write_ipc(table: "pa.Table", path: str,
              *, max_chunksize: "int | None" = None) -> None:
    """Write one Arrow IPC (Feather V2) file; ``max_chunksize`` splits
    the table into multiple record batches (the IPC parallelism
    unit)."""
    import pyarrow.ipc as paipc

    with paipc.new_file(path, table.schema) as w:
        if max_chunksize:
            for b in table.to_batches(max_chunksize=max_chunksize):
                w.write_batch(b)
        else:
            w.write_table(table)


def read_ipc(
    paths: "str | list[str]",
    *,
    columns: "list[str] | None" = None,
) -> ray.data.Dataset:
    """Arrow IPC / Feather-V2 files/dirs -> Dataset, one task per
    RECORD BATCH (the IPC row-group analog; the footer indexes batch
    offsets so the planner reads metadata only), columns pruned at
    the reader. Same planner shape as :func:`read_orc`."""
    import pyarrow.ipc as paipc

    paths = [paths] if isinstance(paths, str) else list(paths)
    files = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f)
                for f in sorted(os.listdir(p))
                if f.endswith((".arrow", ".feather", ".ipc"))
            )
        elif os.path.isfile(p):
            files.append(p)
        else:
            raise FileNotFoundError(f"IPC path does not exist: {p!r}")
    if not files:
        raise FileNotFoundError(f"no IPC files under {paths!r}")
    items = []
    for f in files:
        with paipc.open_file(f) as r:  # footer-only
            items.extend({"path": f, "batch": b}
                         for b in range(r.num_record_batches))

    def _read(batch: "pa.Table") -> pa.Table:
        tabs = []
        for path, bi in zip(batch["path"].to_pylist(),
                            batch["batch"].to_pylist()):
            with paipc.open_file(path) as r:
                rb = r.get_batch(bi)
            t = pa.Table.from_batches([rb])
            if columns is not None:
                t = t.select(columns)
            tabs.append(t)
        return pa.concat_tables(tabs)

    return ray.data.from_items(items).map_batches(
        _read, batch_format="pyarrow", batch_size=1
    )
