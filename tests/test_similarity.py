"""ANN / similarity tests against a numpy brute-force oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from feast_ray.functions.similarity import (
    ann_topk_bruteforce,
    ann_topk_ivf,
    cosine_neardup_pairs,
)


@pytest.fixture(scope="module")
def emb(sf_small):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_small}/embeddings.parquet")
    return t.to_pandas()


def _oracle_topk(mat, ids, queries, k):
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = matn @ qn.T
    out = {}
    for j in range(qn.shape[0]):
        order = np.lexsort((ids, -sims[:, j]))[:k]
        out[j] = [(int(ids[i]), float(sims[i, j])) for i in order]
    return out


def test_bruteforce_matches_numpy_oracle(emb):
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    queries = mat[:3]
    ds = ray.data.from_pandas(emb[["vec_id", "embedding"]])
    got = ann_topk_bruteforce(ds, queries, k=5, round_to=None).to_pandas()
    oracle = _oracle_topk(mat, ids, queries, 5)
    for qid, expected in oracle.items():
        sub = got[got.query_id == qid].sort_values("score", ascending=False)
        assert sub["vec_id"].tolist() == [e[0] for e in expected]
        np.testing.assert_allclose(sub["score"].to_numpy(), [e[1] for e in expected], rtol=1e-12)


def test_ivf_recall_reasonable(emb):
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    queries = mat[:5]
    ds = ray.data.from_pandas(emb[["vec_id", "embedding"]])
    got = ann_topk_ivf(ds, queries, k=10, n_cells=8, nprobe=4).to_pandas()
    oracle = _oracle_topk(mat, ids, queries, 10)
    recalls = []
    for qid, expected in oracle.items():
        exp_ids = {e[0] for e in expected}
        got_ids = set(got[got.query_id == qid]["vec_id"])
        recalls.append(len(exp_ids & got_ids) / len(exp_ids))
    assert np.mean(recalls) >= 0.6  # approximate by design; nprobe=4 of 8 cells


def test_cosine_neardup_pairs_exact(emb):
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = matn @ matn.T
    thr = 0.4
    expected = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(len(ids))
        if ids[j] > ids[i] and sims[i, j] >= thr
    }
    ds = ray.data.from_pandas(emb[["vec_id", "embedding"]])
    got = cosine_neardup_pairs(ds, threshold=thr).to_pandas()
    assert {tuple(r) for r in got[["id_a", "id_b"]].itertuples(index=False)} == expected
