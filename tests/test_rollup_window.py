"""Rollup + window-function operators: parity with pandas references,
NULL-key conventions, dtype stability, empty buckets."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from feast_ray.stages.aggregate import AggSpec, rollup_agg
from feast_ray.stages.relational import window_row_funcs


def _docs():
    rng = np.random.default_rng(0)
    n = 400
    return pa.table({
        "source": pa.array(rng.choice(["a", "b", "c"], n)),
        "lang": pa.array(rng.choice(["en", "de"], n)),
        "n_chars": pa.array(rng.integers(1, 1000, n), pa.int64()),
    })


def test_rollup_levels_match_pandas():
    tbl = _docs()
    out = rollup_agg(
        rd.from_arrow(tbl).repartition(5), ["source", "lang"],
        [AggSpec(None, "count", "n_docs"), AggSpec("n_chars", "sum", "s")],
    ).to_pandas()
    df = tbl.to_pandas()
    finest = df.groupby(["source", "lang"]).agg(
        n_docs=("n_chars", "size"), s=("n_chars", "sum")).reset_index()
    lvl1 = df.groupby("source").agg(
        n_docs=("n_chars", "size"), s=("n_chars", "sum")).reset_index()
    assert len(out) == len(finest) + len(lvl1) + 1
    got_f = (out[out.lang.notna()].sort_values(["source", "lang"])
             .reset_index(drop=True))
    assert got_f[["source", "lang", "n_docs", "s"]].equals(
        finest.sort_values(["source", "lang"]).reset_index(drop=True))
    got_1 = (out[out.lang.isna() & out.source.notna()]
             .sort_values("source").reset_index(drop=True))
    assert list(got_1["n_docs"]) == list(lvl1["n_docs"])
    assert list(got_1["s"]) == list(lvl1["s"])
    total = out[out.source.isna()]
    assert len(total) == 1
    assert total.iloc[0]["n_docs"] == len(df)
    assert total.iloc[0]["s"] == df["n_chars"].sum()
    assert out["n_docs"].dtype == np.int64


def test_rollup_rejects_non_algebraic():
    with pytest.raises(ValueError):
        rollup_agg(rd.from_arrow(_docs()), ["source"],
                   [AggSpec("n_chars", "mean", "m")])


def test_window_funcs_match_pandas():
    rng = np.random.default_rng(1)
    n = 600
    tbl = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "k": pa.array(rng.integers(0, 25, n), pa.int64()),
        "o": pa.array(rng.integers(0, 50, n), pa.int64()),
        "v": pa.array(rng.integers(-10, 10, n), pa.int64()),
    })
    out = window_row_funcs(
        rd.from_arrow(tbl).repartition(6), ["k"], ["o", "id"],
        rank_as="rn", lag_cols={"v": "lag_v"}, cumsum_cols={"v": "cum_v"},
    ).to_pandas().sort_values("id").reset_index(drop=True)
    ref = (tbl.to_pandas().sort_values(["k", "o", "id"], kind="stable")
           .reset_index(drop=True))
    g = ref.groupby("k", sort=False)
    ref["rn"] = (g.cumcount() + 1).astype("int64")
    ref["lag_v"] = g["v"].shift()
    ref["cum_v"] = g["v"].cumsum()
    ref = ref.sort_values("id").reset_index(drop=True)
    for c in ("rn", "cum_v"):
        assert np.array_equal(out[c].to_numpy(), ref[c].to_numpy()), c
    a, b = out["lag_v"].to_numpy(float), ref["lag_v"].to_numpy(float)
    assert ((a == b) | (np.isnan(a) & np.isnan(b))).all()
    # first row of every key has no lag
    firsts = out[out.rn == 1]
    assert firsts["lag_v"].isna().all() and len(firsts) == 25
