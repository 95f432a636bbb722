import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from feast_ray.dqm import (
    load_profile,
    profile_dataset,
    save_profile,
    validate_against_profile,
)
from feast_ray.functions.chunker import HashEmbedder, chunk_batch, chunk_text


def test_chunk_text_edges():
    assert chunk_text("short", 200, 150) == ["short"]
    t = "x" * 300
    chunks = chunk_text(t, 200, 150)
    assert [len(c) for c in chunks] == [200, 150]
    assert chunks[0][150:] == chunks[1][:50]  # overlap
    t2 = "y" * 351
    assert len(chunk_text(t2, 200, 150)) == 3


def test_chunk_batch_explodes():
    tbl = pa.table({"doc_id": [1, 2], "text": ["a" * 300, "b"]})
    out = chunk_batch(tbl)
    assert out["doc_id"].to_pylist() == [1, 1, 2]
    assert out["chunk_id"].to_pylist() == [0, 1, 0]


def test_hash_embedder_deterministic_unit():
    e = HashEmbedder(dim=16)
    v1 = e.embed("hello world foo")
    v2 = e.embed("hello world foo")
    np.testing.assert_array_equal(v1, v2)
    assert np.linalg.norm(v1) == 1.0 or np.linalg.norm(v1) == 0.0


def test_profile_and_validate(tmp_path, sf_small, duck):
    ds = ray.data.read_parquet(f"{sf_small}/events.parquet")
    prof = profile_dataset(ds, columns=["value", "user_id"])
    exp = duck.execute(
        "select count(*), avg(value), min(value), max(value) from events"
    ).fetchone()
    assert prof["row_count"] == exp[0]
    assert prof["columns"]["value"]["mean"] == np.float64(exp[1]) or abs(
        prof["columns"]["value"]["mean"] - exp[1]
    ) < 1e-9
    assert prof["columns"]["value"]["min"] == exp[2]
    assert prof["columns"]["value"]["max"] == exp[3]

    path = str(tmp_path / "profile.json")
    save_profile(prof, path)
    prof2 = load_profile(path)

    # same data validates clean
    assert validate_against_profile(ds, prof2) == []

    # skewed data trips the mean expectation
    skewed = ds.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("value"), "value",
            pa.compute.multiply(t["value"], pa.scalar(10.0)),
        ),
        batch_format="pyarrow",
    )
    problems = validate_against_profile(skewed, prof2)
    assert any("mean" in p for p in problems)
