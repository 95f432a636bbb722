"""Micro-batch stream ingestion, saved datasets, feature logging,
non-entity historical retrieval."""

from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pytest

from feast_ray.stages.aggregate import AggSpec
from feast_ray.store import Store
from feast_ray.stream import MicroBatchProcessor
from feast_ray.views import Entity, TableSource, View

USER = Entity("user", "user_id")


@pytest.fixture()
def store(tmp_path, sf_small):
    s = Store(str(tmp_path / "repo"), sf_small)
    s.apply(
        [
            View(
                name="user_values",
                source=TableSource(name="events", table="events", timestamp_field="ts"),
                entities=[USER],
                ttl=timedelta(days=2),
                features=["value"],
            )
        ]
    )
    return s


def _batch(offset, rows):
    return offset, pd.DataFrame(rows)


def test_stream_microbatches_latest_wins(store):
    proc = MicroBatchProcessor(store, "user_values")
    batches = [
        _batch(0, [
            {"event_id": 1, "ts": pd.Timestamp("2024-05-01 10:00"), "user_id": 7,
             "event_type": "s", "value": 1.0, "props": "{}"},
            {"event_id": 2, "ts": pd.Timestamp("2024-05-01 11:00"), "user_id": 7,
             "event_type": "s", "value": 2.0, "props": "{}"},
        ]),
        _batch(1, [
            {"event_id": 3, "ts": pd.Timestamp("2024-05-01 09:00"), "user_id": 7,
             "event_type": "s", "value": 0.5, "props": "{}"},  # late event
        ]),
    ]
    n = proc.run(batches)
    assert n == 2  # batch0's 2 rows reduce to latest-per-key = 1, + batch1's 1
    out = store.get_online_features(["user_values:value"], [{"user_id": 7}])
    # last-write-wins by event time: late 09:00 event must NOT beat 11:00
    assert out["value"][0] == pytest.approx(2.0)


def test_stream_offset_idempotent(store):
    proc = MicroBatchProcessor(store, "user_values")
    b = _batch(0, [
        {"event_id": 1, "ts": pd.Timestamp("2024-05-01 10:00"), "user_id": 9,
         "event_type": "s", "value": 5.0, "props": "{}"},
    ])
    assert proc.process_batch(b[1], b[0]) == 1
    assert proc.process_batch(b[1], b[0]) == 0  # redelivery skipped


def test_stream_preprocess_fn(store):
    proc = MicroBatchProcessor(
        store, "user_values", preprocess_fn=lambda df: df.assign(value=df.value * 10)
    )
    proc.process_batch(
        pd.DataFrame(
            [{"event_id": 1, "ts": pd.Timestamp("2024-05-01 10:00"), "user_id": 11,
              "event_type": "s", "value": 1.5, "props": "{}"}]
        ),
        0,
    )
    out = store.get_online_features(["user_values:value"], [{"user_id": 11}])
    assert out["value"][0] == pytest.approx(15.0)


def test_saved_dataset_roundtrip(store):
    entity_df = pd.DataFrame(
        {"user_id": [1, 2], "event_timestamp": pd.to_datetime(["2024-01-20", "2024-01-21"])}
    )
    res = store.get_historical_features(entity_df, ["user_values:value"])
    path = store.create_saved_dataset(res, "training_v1")
    back = store.get_saved_dataset("training_v1").to_pandas()
    assert len(back) == 2
    assert "value" in back.columns


def test_feature_logging_partitioned(store, tmp_path):
    import os

    import ray.data

    df = pd.DataFrame({"user_id": [1, 2], "value": [1.0, 2.0], "day": ["a", "b"]})
    path = store.log_features(ray.data.from_pandas(df), "serving", partition_col="day")
    assert sorted(d for d in os.listdir(path) if d.startswith("day=")) == ["day=a", "day=b"]


def test_non_entity_mode(store, sf_small):
    import pyarrow.parquet as pq

    events = pq.read_table(f"{sf_small}/events.parquet").to_pandas()
    end = datetime(2024, 2, 1)
    out = store.get_historical_features(
        None, ["user_values:value"], end=end
    ).to_pandas()
    # one row per distinct user, stamped with `end`
    assert len(out) == events.user_id.nunique()
    assert (out["event_timestamp"] == pd.Timestamp(end)).all()
    # spot-check one user's value = latest within ttl of end
    u = int(out["user_id"].iloc[0])
    sub = events[(events.user_id == u) & (events.ts <= end)
                 & (events.ts >= end - timedelta(days=2))]
    exp = sub.sort_values("ts").iloc[-1]["value"] if len(sub) else np.nan
    got = out[out.user_id == u]["value"].iloc[0]
    if pd.isna(exp):
        assert pd.isna(got)
    else:
        assert got == pytest.approx(exp)
