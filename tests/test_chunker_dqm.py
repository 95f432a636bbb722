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


def test_expectation_suite_vocabulary():
    """Row-level kinds evaluate in one pass with GE element_count
    semantics (nulls excluded except not_null); aggregate kinds ride
    grouped_agg / the quantile sketch; mostly is the success knob."""
    import pandas as pd
    import ray.data

    from feast_ray.dqm import Expectation, run_expectations

    df = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 4],
            "cat": ["a", "b", "a", None, "z"],
            "v": [1.0, 2.0, 3.0, 100.0, None],
        }
    )
    out = run_expectations(
        ray.data.from_pandas(df).repartition(2),
        [
            Expectation("in_set", "cat", (["a", "b"],), mostly=0.75),
            Expectation("not_null", "cat"),
            Expectation("between", "v", (0.0, 10.0), mostly=0.7),
            Expectation("match_regex", "cat", (r"^[ab]$",), mostly=0.75),
            Expectation("unique", "id"),
            Expectation("mean_between", "v", (0.0, 50.0)),
            Expectation("quantile_between", "v", (0.5, 1.0, 3.0)),
        ],
    ).set_index("exp_id")
    # in_set: 4 nonnull, 1 bad ('z') -> 1 <= 0.25*4 OK
    assert (out.loc["cat:in_set", ["n", "bad"]] == [4, 1]).all()
    assert bool(out.loc["cat:in_set", "success"])
    # not_null: 5 rows, 1 null -> fail at mostly=1.0
    assert (out.loc["cat:not_null", ["n", "bad"]] == [5, 1]).all()
    assert not bool(out.loc["cat:not_null", "success"])
    # between: 4 nonnull, 1 outside -> 1 <= 0.3*4 OK
    assert (out.loc["v:between", ["n", "bad"]] == [4, 1]).all()
    assert bool(out.loc["v:between", "success"])
    # regex mirrors in_set here
    assert (out.loc["cat:match_regex", ["n", "bad"]] == [4, 1]).all()
    # unique: id 4 duplicated -> bad=1, fail
    assert (out.loc["id:unique", ["n", "bad"]] == [5, 1]).all()
    assert not bool(out.loc["id:unique", "success"])
    # mean = 26.5 in [0, 50]
    assert bool(out.loc["v:mean_between", "success"])
    # median of (1,2,3,100) = 2.5 in [1, 3]
    assert bool(out.loc["v:quantile_between", "success"])


def test_mini_transformer_embedder_invariants():
    """Real-compute embedder: unit norms, run-to-run determinism,
    locality (near-identical texts closer than unrelated ones)."""
    import numpy as np

    from feast_ray.functions.chunker import MiniTransformerEmbedder

    m = MiniTransformerEmbedder()
    texts = ["the quick brown fox jumps over the lazy dog",
             "the quick brown fox jumps over the lazy cat",
             "quarterly revenue grew despite supply constraints",
             ""]
    v = m.embed_batch(texts)
    np.testing.assert_allclose(np.linalg.norm(v[:3], axis=1), 1.0, rtol=1e-5)
    assert float(v[0] @ v[1]) > float(v[0] @ v[2])
    v2 = MiniTransformerEmbedder().embed_batch(texts)
    assert np.array_equal(v, v2)


def test_mini_transformer_loads_once_per_actor(tmp_path):
    """VERDICT r3 #8 'load measured once per worker': drive many
    batches through a bounded actor pool and count weight builds via
    the audit file — builds == actors, not batches."""
    import os

    import ray.data

    from feast_ray.functions.chunker import MiniTransformerEmbedder

    audit = str(tmp_path / "loads")
    n = 512
    ds = ray.data.from_items(
        [{"chunk_text": f"sample text number {i} with several words"} for i in range(n)]
    )
    out = ds.map_batches(
        MiniTransformerEmbedder,
        fn_constructor_kwargs={"text_col": "chunk_text", "load_audit": audit},
        batch_format="pyarrow", batch_size=32, concurrency=2,
    )
    assert out.count() == n  # 16 batches through 2 actors
    loads = os.path.getsize(audit)
    assert 1 <= loads <= 2, f"expected <=2 weight builds (one per actor), got {loads}"


def test_embed_norm_summary_matches_sql_chain(duck):
    """q80 oracle doctrine: the engine's sequential float64 norm chain
    must be BIT-exact vs DuckDB's left-assoc ``sqrt(c0*c0 + ...)``."""
    import numpy as np
    import pyarrow as pa

    from feast_ray.pipelines.queries import _embed_norm_summary

    rng = np.random.RandomState(7)
    mat = rng.standard_normal((50, 64)).astype(np.float32)
    t = pa.table({
        "doc_id": pa.array(np.arange(50)),
        "chunk_id": pa.array(np.zeros(50, np.int64)),
        "embedding": pa.array(list(mat), pa.list_(pa.float32(), 64)),
    })
    got = _embed_norm_summary(t).to_pandas()

    cols = {f"c{j}": mat[:, j].astype(np.float64) for j in range(64)}
    duck.register("coords", pa.table(cols))
    chain = " + ".join(f"c{j}*c{j}" for j in range(64))
    exp = duck.execute(f"select sqrt({chain}) as norm from coords").fetchdf()
    assert np.array_equal(got["norm"].to_numpy(), exp["norm"].to_numpy())
    assert np.array_equal(got["e0"].to_numpy(), mat[:, 0].astype(np.float64))
