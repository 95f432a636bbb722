"""Temperature resampling with repetition (functions/sampling.py)."""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from feast_ray.functions.neardup import word_hashes64
from feast_ray.functions.sampling import temperature_resample


def _docs(counts: dict):
    rows, i = [], 0
    for g, n in counts.items():
        for _ in range(n):
            rows.append({"doc_id": i, "source": g})
            i += 1
    return ray.data.from_items(rows).repartition(3)


def _keyed(ds):
    import pyarrow as pa
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t: t.append_column(
            "k", pc.binary_join_element_wise(
                t["source"], pc.cast(t["doc_id"], pa.string()), ":")),
        batch_format="pyarrow",
    )


def test_alpha_one_is_identity():
    ds = _keyed(_docs({"a": 40, "b": 10}))
    out, tgt = temperature_resample(ds, "source", "k", alpha=1.0)
    df = out.to_pandas()
    assert len(df) == 50
    assert (df["epoch"] == 0).all()
    assert tgt.set_index("g")["target"].to_dict() == {"a": 40, "b": 10}


def test_upsampling_repeats_rare_group():
    ds = _keyed(_docs({"big": 90, "rare": 10}))
    out, tgt = temperature_resample(ds, "source", "k", alpha=0.0)
    df = out.to_pandas()
    t = tgt.set_index("g")["target"].to_dict()
    assert t == {"big": 50, "rare": 50}   # uniform shares
    rare = df[df["source"] == "rare"]
    # every rare doc appears full 5 epochs (target 50 over 10 docs)
    assert rare.groupby("doc_id").size().min() == 5
    assert set(rare["epoch"]) == {0, 1, 2, 3, 4}
    big = df[df["source"] == "big"]
    assert big.groupby("doc_id").size().max() == 1
    assert len(big) < 90


def test_expansion_matches_python_reference():
    counts = {"a": 30, "b": 8, "c": 2}
    ds = _keyed(_docs(counts))
    out, tgt = temperature_resample(ds, "source", "k", alpha=0.5, salt="s")
    df = out.to_pandas().sort_values(["doc_id", "epoch"]).reset_index(drop=True)

    # reference: same targets, same digest rule, row by row
    t = tgt.set_index("g")
    rows = []
    src = _keyed(_docs(counts)).to_pandas()
    for r in src.itertuples():
        c, target = int(t.loc[r.source, "c"]), int(t.loc[r.source, "target"])
        full_e = target // c
        thr = np.uint64(min(((target % c) << 64) // c, 2**64 - 1))
        h = word_hashes64([r.k + "s"])[0]
        reps = full_e + int(h < thr)
        for e in range(reps):
            rows.append((r.doc_id, r.source, e))
    ref = pd.DataFrame(rows, columns=["doc_id", "source", "epoch"]) \
        .sort_values(["doc_id", "epoch"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        df[["doc_id", "source", "epoch"]], ref, check_dtype=False)


def test_deterministic_across_partitionings():
    a = temperature_resample(
        _keyed(_docs({"a": 25, "b": 5})), "source", "k", alpha=0.3
    )[0].to_pandas().sort_values(["doc_id", "epoch"]).reset_index(drop=True)
    ds2 = _keyed(_docs({"a": 25, "b": 5})).repartition(11)
    b = temperature_resample(ds2, "source", "k", alpha=0.3)[0] \
        .to_pandas().sort_values(["doc_id", "epoch"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_total_override_and_empty_error():
    out, tgt = temperature_resample(
        _keyed(_docs({"a": 10})), "source", "k", alpha=1.0, total=30)
    assert tgt.loc[0, "target"] == 30
    df = out.to_pandas()
    assert len(df) == 30 and set(df["epoch"]) == {0, 1, 2}
    with pytest.raises(ValueError):
        temperature_resample(
            ray.data.from_items([{"source": "x", "k": "y"}]).filter(
                lambda r: False),
            "source", "k")
