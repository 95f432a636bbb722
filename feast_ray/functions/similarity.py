"""Similarity search over an embedding column (list<float>).

The reference exposes ANN retrieval over ``vector_index`` fields
(feature_store.py:4044/4149 `retrieve_online_documents(_v2)`,
passthrough_provider.py:300-348) backed by vector stores; here the
same capability is a Ray Data pipeline:

- **brute-force cosine top-k** (the exact baseline): the query matrix
  is broadcast once via ``ray.put``; every batch does one float64
  matmul against it and emits its local top-k per query; a final tiny
  reduce merges per-block candidates. Exact → DuckDB-oracle-checkable.
- **IVF (scale path)**: deterministic k-means centroids (fixed seed,
  driver-side fit on a bounded sample), assignment inside
  ``map_batches``, search restricted to the ``nprobe`` nearest cells.
- **embedding-cosine near-dup**: exact all-pairs ≥ threshold via the
  same broadcast-matmul shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _normalize(mat: np.ndarray) -> np.ndarray:
    mat = mat.astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _batch_matrix(tbl: pa.Table, col: str) -> np.ndarray:
    arr = tbl[col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0)
    if isinstance(arr, (pa.ListArray, pa.LargeListArray, pa.FixedSizeListArray)):
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(len(tbl), -1)
    # Ray tensor-extension array (from_pandas of ndarray cells) or
    # anything else exposing a 2-D to_numpy
    mat = arr.to_numpy(zero_copy_only=False)
    if mat.dtype == object:
        mat = np.stack(mat)
    return np.asarray(mat, dtype=np.float64)


def ann_topk_bruteforce(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: np.ndarray | None = None,
    round_to: int | None = 4,
) -> ray.data.Dataset:
    """Exact cosine top-k per query. Output columns:
    (query_id, {id_col}, score). Scores are float64 cosine, optionally
    rounded for cross-engine comparability."""
    qn = _normalize(np.asarray(queries))
    qids = np.arange(len(qn)) if query_ids is None else np.asarray(query_ids)
    ref = ray.put((qn, qids))

    def _block_topk(tbl: pa.Table) -> pa.Table:
        q, qi = ray.get(ref)
        mat = _normalize(_batch_matrix(tbl, vec_col))
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        sims = mat @ q.T  # (n, nq)
        kk = min(k, sims.shape[0])
        out_q, out_id, out_s = [], [], []
        for j in range(sims.shape[1]):
            col = sims[:, j]
            idx = np.argpartition(-col, kk - 1)[:kk]
            out_q.append(np.full(kk, qi[j]))
            out_id.append(ids[idx])
            out_s.append(col[idx])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    candidates = ds.map_batches(_block_topk, batch_format="pyarrow")

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "score", id_col], ascending=[True, False, True],
                            kind="stable")
        df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
        if round_to is not None:
            df["score"] = df["score"].round(round_to)
        return df

    return candidates.repartition(1).map_batches(_final, batch_format="pandas")


class IVFIndex:
    """Deterministic IVF index: k-means centroids fit once (fixed seed,
    bounded sample), lookup = nprobe nearest cells."""

    def __init__(self, sample: np.ndarray, n_cells: int = 16, iters: int = 10):
        x = _normalize(sample)
        rng = np.random.RandomState(42)
        idx = rng.choice(len(x), size=min(n_cells, len(x)), replace=False)
        cent = x[np.sort(idx)].copy()
        for _ in range(iters):
            assign = np.argmax(x @ cent.T, axis=1)
            for c in range(len(cent)):
                members = x[assign == c]
                if len(members):
                    v = members.mean(axis=0)
                    n = np.linalg.norm(v)
                    if n > 0:
                        cent[c] = v / n
        self.centroids = cent

    def cells_for(self, vecs: np.ndarray, nprobe: int = 4) -> np.ndarray:
        sims = _normalize(vecs) @ self.centroids.T
        return np.argsort(-sims, axis=1)[:, :nprobe]


def ann_topk_ivf(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 4,
    sample_size: int = 2048,
) -> ray.data.Dataset:
    """Approximate top-k: restrict scoring to vectors whose nearest
    centroid is among each query's nprobe cells. Same output schema as
    the brute-force baseline."""
    sample_tbl = ds.limit(sample_size).to_pandas()
    sample = np.stack(sample_tbl[vec_col].to_numpy())
    index = IVFIndex(sample, n_cells=n_cells)
    qn = _normalize(np.asarray(queries))
    q_cells = index.cells_for(qn, nprobe)  # (nq, nprobe)
    ref = ray.put((qn, q_cells, index.centroids))

    def _block(tbl: pa.Table) -> pa.Table:
        q, qc, cent = ray.get(ref)
        mat = _normalize(_batch_matrix(tbl, vec_col))
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        cells = np.argmax(mat @ cent.T, axis=1)
        out_q, out_id, out_s = [], [], []
        for j in range(len(q)):
            mask = np.isin(cells, qc[j])
            if not mask.any():
                continue
            sub = mat[mask]
            sub_ids = ids[mask]
            sims = sub @ q[j]
            kk = min(k, len(sims))
            idx = np.argpartition(-sims, kk - 1)[:kk]
            out_q.append(np.full(kk, j))
            out_id.append(sub_ids[idx])
            out_s.append(sims[idx])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    candidates = ds.map_batches(_block, batch_format="pyarrow")

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "score", id_col], ascending=[True, False, True],
                            kind="stable")
        return df.groupby("query_id", sort=True).head(k).reset_index(drop=True)

    return candidates.repartition(1).map_batches(_final, batch_format="pandas")


def cosine_neardup_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 4,
) -> ray.data.Dataset:
    """Exact embedding near-dup pairs (id_a < id_b, cosine ≥ threshold).
    The full (normalized) matrix is broadcast once; each batch matmuls
    against it — O(n²) exact baseline for the oracle. The LSH-bucketed
    scale path is ``simhash_dups`` / IVF-cell blocking."""
    pdf = ds.select_columns([id_col, vec_col]).to_pandas().sort_values(id_col)
    all_ids = pdf[id_col].to_numpy()
    all_mat = _normalize(np.stack(pdf[vec_col].to_numpy()))
    ref = ray.put((all_ids, all_mat))

    def _pairs(tbl: pa.Table) -> pa.Table:
        ids_r, mat_r = ray.get(ref)
        mat = _normalize(_batch_matrix(tbl, vec_col))
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        sims = mat @ mat_r.T
        ia, ib, ss = [], [], []
        for i in range(len(ids)):
            mask = (sims[i] >= threshold) & (ids_r > ids[i])
            if mask.any():
                ia.extend([ids[i]] * int(mask.sum()))
                ib.extend(ids_r[mask].tolist())
                ss.extend(sims[i][mask].tolist())
        ss = np.array(ss, dtype=np.float64)
        if round_to is not None:
            ss = ss.round(round_to)
        return pa.table(
            {
                "id_a": pa.array(np.array(ia, dtype=np.int64)),
                "id_b": pa.array(np.array(ib, dtype=np.int64)),
                "cosine": pa.array(ss),
            }
        )

    return ds.map_batches(_pairs, batch_format="pyarrow")
