import logging

import pyarrow as pa
import pytest

from feast_ray.stages.utils import normalize_timestamps, prefix_columns, safe_batch


def test_safe_batch_empty_passthrough():
    calls = []

    @safe_batch
    def fn(tbl):
        calls.append(len(tbl))
        return tbl

    empty = pa.table({"a": pa.array([], pa.int64())})
    assert len(fn(empty)) == 0
    assert calls == []


def test_safe_batch_swallow(caplog):
    def bad(tbl):
        raise ValueError("boom")

    wrapped = safe_batch(bad, swallow=True)
    tbl = pa.table({"a": [1, 2]})
    with caplog.at_level(logging.ERROR):
        out = wrapped(tbl)
    assert len(out) == 0

    strict = safe_batch(bad, swallow=False)
    with pytest.raises(ValueError):
        strict(tbl)


def test_normalize_timestamps():
    tbl = pa.table(
        {
            "a": pa.array([1000], pa.timestamp("ns")),
            "b": pa.array([1], pa.timestamp("s", tz="UTC")),
        }
    )
    out = normalize_timestamps(tbl, ["a", "b"])
    assert out.schema.field("a").type == pa.timestamp("us")
    assert out.schema.field("b").type == pa.timestamp("us")


def test_prefix_columns():
    tbl = pa.table({"user_id": [1], "value": [2.0]})
    out = prefix_columns(tbl, "myview", exclude=["user_id"])
    assert out.column_names == ["user_id", "myview__value"]


def test_entity_key_encoding_stable_and_roundtrips():
    from feast_ray.functions.entity_key import (
        deserialize_entity_key,
        serialize_entity_key,
    )

    k = {"user_id": 42, "region": "eu", "score": 1.5, "flag": True}
    enc = serialize_entity_key(k)
    # key order must not matter (sorted stable layout)
    enc2 = serialize_entity_key(dict(reversed(list(k.items()))))
    assert enc == enc2
    assert deserialize_entity_key(enc) == k
    # distinct keys -> distinct encodings
    assert serialize_entity_key({"user_id": 43}) != serialize_entity_key({"user_id": 42})


def test_read_table_csv_json(tmp_path):
    import pandas as pd
    import pytest as _pytest

    from feast_ray.sources import read_table

    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    df.to_csv(tmp_path / "t.csv", index=False)
    df.to_json(tmp_path / "t.json", orient="records", lines=True)
    got_csv = (read_table(str(tmp_path), "t", fmt="csv")
               .to_pandas().sort_values("a").reset_index(drop=True))
    got_json = (read_table(str(tmp_path), "t", fmt="json")
                .to_pandas().sort_values("a").reset_index(drop=True))
    # row ORDER is not part of the contract: Ray byte-range-splits
    # even tiny csv/json files, so blocks can land in any order
    pd.testing.assert_frame_equal(got_csv, df)
    pd.testing.assert_frame_equal(got_json, df)
    with _pytest.raises(ValueError):
        read_table(str(tmp_path), "t", fmt="xml")


def test_top_frequencies(sf_small, duck):
    from feast_ray.sources import read_table
    from feast_ray.stages.relational import top_frequencies

    ev = read_table(sf_small, "events", columns=["event_type"])
    got = top_frequencies(ev, "event_type", 3).to_pandas()
    exp = duck.execute(
        """select event_type, count(*) n from events group by 1
           order by n desc, event_type limit 3"""
    ).fetchdf()
    assert got["event_type"].tolist() == exp["event_type"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()


def test_json_extract_fields_types_and_nulls():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from feast_ray.stages.utils import json_extract_fields

    df = pd.DataFrame({
        "id": np.arange(6, dtype=np.int64),
        "j": ['{"k": 7, "name": "ab", "x": -1.5}',
              '{"k": -3, "name": ""}',
              '{"name": "only"}',          # k missing -> null
              'not json at all',           # -> null
              '{"k": 12, "x": 2e3}',
              '{ "k" :  99 }'],            # whitespace tolerated
    })
    out = json_extract_fields(
        rd.from_pandas(df).repartition(2), "j",
        {"k": ("k", "int64"), "name": ("name", "string"),
         "x": ("x", "float64")},
        keep=["id"],
    ).to_pandas().sort_values("id").reset_index(drop=True)
    assert list(out["k"].fillna(-999)) == [7, -3, -999, -999, 12, 99]
    assert out["name"].tolist()[:3] == ["ab", "", "only"]
    assert out.loc[0, "x"] == -1.5 and out.loc[4, "x"] == 2e3
    # arrow-side dtype is int64 (pandas shows float64 because of the
    # nulls — expected nullable-int behavior)
    assert out["k"].dropna().apply(float.is_integer).all()


def test_drift_psi_matches_closed_form():
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from feast_ray.dqm import drift_psi

    rng = np.random.default_rng(13)
    n = 4000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], n),
        "base": rng.random(n) < 0.5,
        # group b drifts: base uniform, current skewed
        "bin": np.where(
            rng.random(n) < 0.5, rng.integers(0, 8, n),
            rng.integers(0, 8, n) // 2),
    })
    out = drift_psi(rd.from_pandas(df).repartition(3), ["g"],
                    "bin", "base", 8).to_pandas().set_index("g")
    for gk, g in df.groupby("g"):
        ca = g[g.base]["bin"].value_counts().reindex(range(8), fill_value=0)
        cb = g[~g.base]["bin"].value_counts().reindex(range(8), fill_value=0)
        na, nb = ca.sum(), cb.sum()
        psi = 0
        for i in range(8):
            p = (ca[i] + 1) / float(na + 8)
            q = (cb[i] + 1) / float(nb + 8)
            psi += int(math.floor((p - q) * math.log(p / q) * 1e9 + 0.5))
        assert out.loc[gk, "psi_n"] == psi
    # identical distributions -> PSI ~ 0 (laplace noise only)
    same = pd.DataFrame({"g": ["x"] * 2000,
                         "base": [True] * 1000 + [False] * 1000,
                         "bin": list(range(8)) * 250})
    r = drift_psi(rd.from_pandas(same), ["g"], "bin", "base", 8).to_pandas()
    assert abs(int(r["psi_n"].iloc[0])) < 10**6
