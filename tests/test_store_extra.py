"""Coverage for less-travelled Store/view paths: keyless (dummy-entity)
views, windowed aggregation views, JSON validation, missing-key online
lookups."""

from datetime import timedelta

import numpy as np
import pandas as pd
import pytest

from feast_ray.stages.aggregate import AggSpec
from feast_ray.stages.validate import validate_json_column
from feast_ray.store import Store
from feast_ray.views import Entity, TableSource, View

USER = Entity("user", "user_id")
EVENTS = TableSource(name="events", table="events", timestamp_field="ts")


def test_keyless_global_view(tmp_path, sf_small, duck):
    """Dummy-entity analog (feature_view.py:96-98): no join keys →
    single-group global aggregate, cross-joined at retrieval."""
    s = Store(str(tmp_path / "repo"), sf_small)
    s.apply(
        [
            View(
                name="global_stats",
                source=EVENTS,
                entities=[],
                aggregations=[
                    AggSpec("value", "sum", "grand_total"),
                    AggSpec(None, "count", "n_total"),
                ],
                features=["grand_total", "n_total"],
            )
        ]
    )
    got = s.build_view_ds(s.views["global_stats"]).to_pandas()
    exp = duck.execute("select sum(value), count(*) from events").fetchone()
    assert len(got) == 1
    assert got["grand_total"][0] == pytest.approx(exp[0])
    assert got["n_total"][0] == exp[1]

    # retrieval: global row cross-joined onto every entity row
    entity_df = pd.DataFrame(
        {"user_id": [1, 2], "event_timestamp": pd.to_datetime(["2024-01-20"] * 2)}
    )
    out = s.get_historical_features(entity_df, ["global_stats:grand_total"]).to_pandas()
    assert len(out) == 2
    assert (out["grand_total"] == got["grand_total"][0]).all()


def test_windowed_view_through_store(tmp_path, sf_small, duck):
    s = Store(str(tmp_path / "repo"), sf_small)
    s.apply(
        [
            View(
                name="hourly",
                source=EVENTS,
                entities=[USER],
                aggregations=[AggSpec(None, "count", "n")],
                window=timedelta(hours=1),
                features=["n"],
            )
        ]
    )
    got = (
        s.build_view_ds(s.views["hourly"])
        .to_pandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    exp = duck.execute(
        """select user_id, time_bucket(interval '1 hour', ts) ws, count(*) n
           from events group by 1, 2 order by 1, 2"""
    ).fetchdf()
    assert len(got) == len(exp)
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()


def test_validate_json_column(sf_small):
    from feast_ray.sources import read_table

    ev = read_table(sf_small, "events", columns=["props"])
    assert validate_json_column(ev, "props") is True

    import ray.data

    bad = ray.data.from_pandas(pd.DataFrame({"props": ['{"k": 1}', "{not json"]}))
    assert validate_json_column(bad, "props") is False


def test_online_lookup_missing_key(tmp_path, sf_small):
    s = Store(str(tmp_path / "repo"), sf_small)
    s.apply(
        [
            View(name="user_values", source=EVENTS, entities=[USER],
                 ttl=timedelta(days=2), features=["value"])
        ]
    )
    s.materialize()
    out = s.get_online_features(
        ["user_values:value"], [{"user_id": 999999}, {"user_id": 0}]
    )
    assert np.isnan(out["value"][0])
    assert not np.isnan(out["value"][1])


def test_windowed_view_materialize_keeps_all_windows(tmp_path, sf_small, duck):
    """Windowed views upsert keyed by (entities, window_start): one
    online row per window, not collapsed to one per user."""
    s = Store(str(tmp_path / "repo"), sf_small)
    s.apply(
        [
            View(
                name="hourly2",
                source=EVENTS,
                entities=[USER],
                aggregations=[AggSpec(None, "count", "n")],
                window=timedelta(hours=1),
                features=["n"],
            )
        ]
    )
    s.materialize(views=["hourly2"])
    got = s.online.read("hourly2").to_pandas()
    exp_rows = duck.execute(
        """select count(*) from (select user_id, time_bucket(interval '1 hour', ts)
           from events group by 1, 2)"""
    ).fetchone()[0]
    assert len(got) == exp_rows


def test_plan_and_teardown(tmp_path, sf_small):
    s = Store(str(tmp_path / "repo"), sf_small)
    v = View(name="user_values", source=EVENTS, entities=[USER], features=["value"])
    diff = s.plan([v])
    assert diff["to_add"] == ["user_values"]
    s.apply([v])
    diff2 = s.plan([v])
    assert diff2["unchanged"] == ["user_values"] and diff2["to_add"] == []
    s.materialize()
    assert s.online.read("user_values").num_rows > 0
    s.teardown()
    import os as _os

    assert not _os.path.exists(s.registry_path)


def test_retrieve_online_documents(tmp_path, sf_small):
    import numpy as np
    import pyarrow.parquet as pq

    s = Store(str(tmp_path / "repo"), sf_small)
    s.apply(
        [
            View(
                name="doc_vectors",
                source=TableSource(name="embeddings", table="embeddings"),
                entities=[Entity("vec", "vec_id")],
                features=["embedding", "label"],
            )
        ]
    )
    s.materialize(views=["doc_vectors"])
    emb = pq.read_table(f"{sf_small}/embeddings.parquet").to_pandas()
    q = np.array(emb.loc[emb.vec_id == 0, "embedding"].iloc[0], dtype=float)
    res = s.retrieve_online_documents("doc_vectors", list(q), top_k=3)
    # the query vector itself must be its own nearest neighbor
    assert res.iloc[0]["vec_id"] == 0
    assert res.iloc[0]["score"] == pytest.approx(1.0)
    assert len(res) == 3


def test_offline_write_back_and_read(tmp_path, sf_small, duck):
    s = Store(str(tmp_path / "repo"), sf_small)
    s.apply(
        [View(name="user_values", source=EVENTS, entities=[USER], features=["value"])]
    )
    s.materialize(views=["user_values"], offline=True)
    log = s.read_offline("user_values").to_pandas()
    n_events = duck.execute("select count(*) from events").fetchone()[0]
    assert len(log) == n_events
    # append a pushed batch: log grows, file-level append only
    s.write_to_offline_store(
        "user_values",
        pd.DataFrame(
            {"event_id": [1], "ts": [pd.Timestamp("2030-01-01")], "user_id": [1],
             "event_type": ["x"], "value": [9.9], "props": ["{}"]}
        ),
    )
    assert len(s.read_offline("user_values").to_pandas()) == n_events + 1


def test_upsert_empty_dataset_is_noop(tmp_path, sf_small):
    """Incremental materialize with no new rows must return 0, not
    crash (code-review r2: KeyError 'rows' on empty stats frame)."""
    from datetime import datetime, timedelta

    from feast_ray.store import Store
    from feast_ray.views import Entity, TableSource, View

    s = Store(str(tmp_path / "repo"), sf_small)
    v = View(
        name="uv",
        source=TableSource(name="events", table="events", timestamp_field="ts"),
        entities=[Entity("user", "user_id")],
        features=["value"],
    )
    s.apply([v])
    # a window with no data
    out = s.materialize(datetime(1990, 1, 1), datetime(1990, 1, 2))
    assert out["uv"] == 0


def test_windowed_view_online_lookup(tmp_path, sf_small):
    """Windowed views upsert one row per (key, window); point lookup
    must return the LATEST window per key (code-review r2: wrong
    buckets probed → all NaN)."""
    from datetime import timedelta

    from feast_ray.stages.aggregate import AggSpec
    from feast_ray.store import Store
    from feast_ray.views import Entity, TableSource, View

    s = Store(str(tmp_path / "repo"), sf_small)
    v = View(
        name="hourly",
        source=TableSource(name="events", table="events", timestamp_field="ts"),
        entities=[Entity("user", "user_id")],
        aggregations=[AggSpec("value", "sum", "v_sum")],
        window=timedelta(days=7),
        features=["v_sum"],
    )
    s.apply([v])
    s.materialize()
    out = s.get_online_features(["hourly:v_sum"], [{"user_id": 1}, {"user_id": 2}])
    assert len(out) == 2
    assert out["v_sum"].notna().all()


def test_ttl_zero_means_no_expiry(sf_small):
    from datetime import timedelta

    import pandas as pd

    from feast_ray.sources import read_table
    from feast_ray.stages.filters import ttl_filter

    ev = read_table(sf_small, "events")
    bound = pd.Timestamp("2024-01-20")
    none_out = ttl_filter(ev, "ts", bound, ttl=None).count()
    zero_out = ttl_filter(ev, "ts", bound, ttl=timedelta(0)).count()
    assert zero_out == none_out > 0


def test_sample_by_hash_frac_one(sf_small):
    from feast_ray.functions.sampling import sample_by_hash
    from feast_ray.sources import read_table

    docs = read_table(sf_small, "documents", columns=["doc_id"])
    assert sample_by_hash(docs, "doc_id", 1.0).count() == docs.count()


def test_stream_replay_no_duplicate_log_rows(tmp_path, sf_small):
    """Redelivery after a crash-before-commit must not duplicate
    offline-log rows (offset-named file overwrites)."""
    import os

    from feast_ray.store import Store
    from feast_ray.stream import MicroBatchProcessor
    from feast_ray.views import Entity, TableSource, View

    s = Store(str(tmp_path / "repo"), sf_small)
    v = View(
        name="clicks",
        source=TableSource(name="events", table="events", timestamp_field="ts"),
        entities=[Entity("user", "user_id")],
        features=["value"],
    )
    s.apply([v])
    proc = MicroBatchProcessor(s, "clicks")
    df = pd.DataFrame(
        {"user_id": [1], "ts": pd.to_datetime(["2024-03-01"]), "value": [1.0]}
    )
    proc.process_batch(df, offset=0)
    # simulate crash-before-commit: reset the offset, redeliver
    reg = s._load_registry()
    reg["stream_offsets"]["clicks"] = -1
    s._write_registry(reg)
    proc.process_batch(df, offset=0)
    files = [f for f in os.listdir(proc.offline_log_dir) if f.endswith(".parquet")]
    assert files == ["batch_0.parquet"]
