"""Distributed PageRank over a link graph — integer fixed-point.

The web-pipeline use: rank hosts/pages of a crawl by link structure
(the classic crawl-prioritization / quality prior — Page et al. 1999;
Common Crawl publishes exactly this as its host-level ranking). The
reference has no graph operator; this is part of the engine's
beyond-reference LLM-data surface (SURVEY §2 extension tier), shaped
like ``connected_components``: a SIZE-GATED driver fixpoint for small
graphs and a distributed iterated join+aggregate for graphs whose
rank vector cannot sit on one machine.

Determinism doctrine (q92/q93/q97): all rank arithmetic is int64
fixed point — rank starts at ``scale // n``, each edge contributes
``rank // out_degree`` (integer division), and the damping update is
``base + (damping_pct * sum) // 100``. Addition of integers is
order-free, so the driver path, the distributed path, and a SQL
restatement agree BIT-EXACTLY — no float summation-order drift.

Scale shape of the distributed path: per iteration one partitioned
``hash_join`` (edges ⋈ ranks on src — auto-sized buckets) and one
combiner-shape ``grouped_agg`` sum by dst, then a left join back to
the node set. 100-TB honesty: both the edge list and the rank vector
stream; nothing node-sized ever materializes on the driver above the
gate. (A production refinement would pin edges and ranks to ONE
shared hash partitioning across iterations to skip re-exchanging the
static edge side — documented, not needed at bench scale.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from feast_ray.stages.aggregate import AggSpec, grouped_agg
from feast_ray.stages.join import hash_join

#: graphs with at most this many nodes run the driver fixpoint
DRIVER_GATE_NODES = 2_000_000


def _driver_pagerank(
    src: np.ndarray, dst: np.ndarray, deg: np.ndarray, n: int,
    iters: int, scale: int, damping_pct: int,
) -> np.ndarray:
    r = np.full(n, scale // n, dtype=np.int64)
    base = (100 - damping_pct) * (scale // n) // 100
    for _ in range(iters):
        contrib = r[src] // deg[src]
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, dst, contrib)
        r = base + (damping_pct * s) // 100
    return r


def pagerank(
    edges: ray.data.Dataset,
    n_nodes: int,
    *,
    iters: int = 5,
    scale: int = 10**12,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
    out_degree: int | None = None,
    mode: str = "auto",
) -> ray.data.Dataset:
    """→ (node, in_deg, rank_q) for nodes 0..n_nodes−1.

    ``out_degree``: pass the constant fan-out when the graph has one
    (skips the degree join); None computes per-src degrees. Nodes with
    no outgoing edges contribute nothing (their mass damps away — the
    simple dangling convention, stated so the SQL oracle matches).
    ``mode``: "driver" / "distributed" / "auto" (gate at
    ``DRIVER_GATE_NODES``). Both paths are bit-identical (integer
    arithmetic throughout).
    """
    if mode not in ("auto", "driver", "distributed"):
        raise ValueError(mode)
    use_driver = mode == "driver" or (
        mode == "auto" and n_nodes <= DRIVER_GATE_NODES)
    base = (100 - damping_pct) * (scale // n_nodes) // 100

    if use_driver:
        df = edges.select_columns([src_col, dst_col]).to_pandas()
        src = df[src_col].to_numpy(dtype=np.int64)
        dst = df[dst_col].to_numpy(dtype=np.int64)
        if out_degree is None:
            deg = np.bincount(src, minlength=n_nodes).astype(np.int64)
            deg[deg == 0] = 1
        else:
            deg = np.full(n_nodes, out_degree, dtype=np.int64)
        r = _driver_pagerank(src, dst, deg, n_nodes, iters, scale, damping_pct)
        ind = np.bincount(dst, minlength=n_nodes).astype(np.int64)
        tbl = pa.table({
            "node": pa.array(np.arange(n_nodes, dtype=np.int64)),
            "in_deg": pa.array(ind),
            "rank_q": pa.array(r),
        })
        return ray.data.from_arrow(tbl)

    # ---- distributed path: iterated partitioned join + combiner sum
    nodes = ray.data.range(n_nodes).map_batches(
        lambda t: pa.table({"node": t["id"].cast(pa.int64())}),
        batch_format="pyarrow",
    ).materialize()

    if out_degree is None:
        degs = grouped_agg(
            edges.map_batches(
                lambda t: pa.table({"node": t[src_col].cast(pa.int64())}),
                batch_format="pyarrow"),
            ["node"], [AggSpec(None, "count", "deg")],
        ).materialize()
    else:
        degs = None

    r0 = scale // n_nodes
    ranks = nodes.map_batches(
        lambda t: t.append_column(
            "r", pa.array(np.full(len(t), r0, dtype=np.int64))),
        batch_format="pyarrow",
    ).materialize()

    edges2 = edges.map_batches(
        lambda t: pa.table({
            src_col: t[src_col].cast(pa.int64()),
            dst_col: t[dst_col].cast(pa.int64()),
        }),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        rsrc = ranks.map_batches(
            lambda t: pa.table({src_col: t["node"], "r": t["r"]}),
            batch_format="pyarrow")
        if degs is not None:
            dsrc = degs.map_batches(
                lambda t: pa.table({src_col: t["node"], "deg": t["deg"]}),
                batch_format="pyarrow")
            rsrc = hash_join(rsrc, dsrc, on=src_col)
        joined = hash_join(edges2, rsrc, on=src_col)

        def _contrib(t: pa.Table, _od=out_degree) -> pa.Table:
            r = t["r"].to_numpy(zero_copy_only=False)
            d = (np.full(len(t), _od, dtype=np.int64) if _od is not None
                 else t["deg"].to_numpy(zero_copy_only=False))
            return pa.table({
                "node": t[dst_col],
                "c": pa.array(r // d),
            })

        sums = grouped_agg(
            joined.map_batches(_contrib, batch_format="pyarrow"),
            ["node"], [AggSpec("c", "sum", "s")])
        merged = hash_join(nodes, sums, on="node", how="left")

        def _update(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            s = pc.fill_null(t["s"], 0).cast(pa.int64()).to_numpy(
                zero_copy_only=False).astype(np.int64)
            return pa.table({
                "node": t["node"],
                "r": pa.array(base + (damping_pct * s) // 100),
            })

        ranks = merged.map_batches(_update, batch_format="pyarrow").materialize()

    ind = grouped_agg(
        edges2.map_batches(
            lambda t: pa.table({"node": t[dst_col]}), batch_format="pyarrow"),
        ["node"], [AggSpec(None, "count", "in_deg")])
    out = hash_join(nodes, ind, on="node", how="left")
    final = hash_join(out, ranks, on="node")

    def _final(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ind_ = pc.fill_null(t["in_deg"], 0).cast(pa.int64())
        return pa.table({
            "node": t["node"],
            "in_deg": ind_,
            "rank_q": t["r"],
        })

    return final.map_batches(_final, batch_format="pyarrow")
