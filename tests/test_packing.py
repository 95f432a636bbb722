"""Sequence packing (concat-and-chop context-window assignment)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from feast_ray.functions.packing import pack_sequences


def test_pack_sequences_matches_prefix_reference():
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "src": rng.integers(0, 4, 300).astype(str),
            "doc_id": np.arange(300),
            "n_tokens": rng.integers(1, 900, 300),
        }
    )
    ds = ray.data.from_pandas(df).repartition(6)
    out = (
        pack_sequences(ds, "src", "doc_id", "n_tokens", budget=1000)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["src", "doc_id"]).copy()
    prefix = ref.groupby("src")["n_tokens"].cumsum() - ref["n_tokens"]
    ref["bin_id"] = prefix // 1000
    ref["bin_offset"] = prefix % 1000
    ref = ref.sort_values("doc_id").reset_index(drop=True)
    for c in ["bin_id", "bin_offset"]:
        assert (out[c].to_numpy() == ref[c].to_numpy()).all(), c
    # windows are gap-free per stream: bin ids are contiguous from 0
    for src, g in out.groupby("src"):
        bins = sorted(g["bin_id"].unique())
        assert bins == list(range(len(bins)))


def test_pack_sequences_rejects_bad_budget():
    ds = ray.data.from_pandas(pd.DataFrame({"s": ["a"], "i": [1], "t": [5]}))
    with pytest.raises(ValueError):
        pack_sequences(ds, "s", "i", "t", budget=0)


def test_pack_ffd_valid_and_partition_invariant():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from feast_ray.functions.packing import pack_ffd

    rng = np.random.default_rng(7)
    n = 600
    df = pd.DataFrame({
        "g": rng.integers(0, 4, n).astype(np.int64).astype(str),
        "id": np.arange(n, dtype=np.int64),
        "t": rng.integers(1, 300, n).astype(np.int64),
    })
    budget = 512
    outs = []
    for parts in (1, 7):
        out = (pack_ffd(rd.from_pandas(df).repartition(parts),
                        "g", "id", "t", budget)
               .to_pandas().sort_values("id").reset_index(drop=True))
        outs.append(out)
        # validity: every bin's load fits the budget
        load = out.groupby(["g", "bin_id"])["t"].sum()
        assert (load <= budget).all()
        # every item assigned exactly once
        assert len(out) == n and out["id"].is_unique
    # partition invariance: identical assignment
    assert outs[0].equals(outs[1])
    # FFD uses no more bins than naive one-per-item, and at least
    # ceil(total/budget)
    for g, gg in outs[0].groupby("g"):
        nb = gg["bin_id"].nunique()
        assert nb >= -(-int(gg["t"].sum()) // budget)
        assert nb <= len(gg)


def test_pack_ffd_oversize_raises():
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from feast_ray.functions.packing import pack_ffd

    df = pd.DataFrame({"g": ["a"], "id": np.array([1], np.int64),
                       "t": np.array([600], np.int64)})
    with pytest.raises(Exception, match="exceeds budget"):
        pack_ffd(rd.from_pandas(df), "g", "id", "t", 512).to_pandas()
