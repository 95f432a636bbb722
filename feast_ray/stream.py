"""Micro-batch stream ingestion — the reference's Kafka/Push consumer
shape without a broker.

Semantics reproduced (infra/contrib/spark_kafka_processor.py:27-175 and
SURVEY.md §2.8): each micro-batch is decoded (json), optionally
transformed by a ``preprocess_fn`` udf, reduced to the latest row per
key (sort desc by (keys, ts) → first per key), stamped with a
``created`` processing time, and upserted into the online plane +
appended to the offline log. Correctness across batches / late data
comes from the online upsert being last-write-wins by event time and
from PIT retrieval recomputing over the append-only offline log — the
reference has no watermarks either.

Checkpointing: a monotonically increasing ``offset`` per processed
batch persisted in the store registry (the reference delegates this to
Spark's checkpointLocation).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone
from typing import Callable

import pandas as pd

from feast_ray.store import Store


class MicroBatchProcessor:
    def __init__(
        self,
        store: Store,
        view_name: str,
        preprocess_fn: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
        offline_log_dir: str | None = None,
    ):
        self.store = store
        self.view = store.views[view_name]
        self.preprocess_fn = preprocess_fn
        self.offline_log_dir = offline_log_dir or os.path.join(
            store.repo_dir, "offline_log", view_name
        )
        os.makedirs(self.offline_log_dir, exist_ok=True)

    # -- checkpoint ----------------------------------------------------

    def _offset(self) -> int:
        reg = self.store._load_registry()
        return int(reg.get("stream_offsets", {}).get(self.view.name, -1))

    def _commit_offset(self, offset: int) -> None:
        reg = self.store._load_registry()
        reg.setdefault("stream_offsets", {})[self.view.name] = int(offset)
        self.store._write_registry(reg)

    # -- ingestion -----------------------------------------------------

    def process_batch(self, df: pd.DataFrame, offset: int | None = None) -> int:
        """One micro-batch: udf → latest-per-key → stamp created →
        online upsert + offline append. Returns rows ingested.
        Re-delivery of an already-committed offset is a no-op
        (idempotent, like the reference's checkpoint skip)."""
        if offset is not None and offset <= self._offset():
            return 0
        if self.preprocess_fn is not None:
            df = self.preprocess_fn(df)
        ts = self.view.timestamp_field
        keys = self.view.join_keys
        # FULL post-udf frame goes to the offline log (PIT retrieval
        # recomputes over it — intra-batch history must survive);
        # latest-per-key applies to the ONLINE push only
        df_full = df.reset_index(drop=True)
        if keys and ts:
            df = (
                df.sort_values([*keys, ts], ascending=[True] * len(keys) + [False],
                               kind="stable")
                .drop_duplicates(keys, keep="first")
                .reset_index(drop=True)
            )
        df = df.copy()
        # stamp the view's DECLARED created column (any name — a
        # hardcoded "created" crashed upsert's order_by for views
        # declaring e.g. "created_at") ONLY when the payload didn't
        # carry one: a source-supplied created timestamp must survive
        # so upsert tie-breaks honor the producer's ordering, not
        # ingest time; undeclared views get a "created" audit column
        # in the offline log only
        cc = self.view.created_timestamp_column
        stamp = pd.Timestamp(datetime.now(timezone.utc)).tz_localize(None)
        if cc and cc not in df.columns:
            df[cc] = stamp
        self.store.push(self.view.name, df)
        # offline append: one parquet file per micro-batch (append-only log)
        import pyarrow as pa
        import pyarrow.parquet as pq

        # offset-named file (OVERWRITE on replay): a crash after the
        # write but before the offset commit must not duplicate rows
        # in the log on redelivery — file-level idempotence
        if offset is not None:
            fname = f"batch_{offset}.parquet"
        else:
            fname = f"batch_adhoc_{len(os.listdir(self.offline_log_dir))}.parquet"
        log_df = df_full.copy()
        if (cc or "created") not in log_df.columns:
            log_df[cc or "created"] = stamp
        pq.write_table(
            pa.Table.from_pandas(log_df, preserve_index=False).replace_schema_metadata(None),
            os.path.join(self.offline_log_dir, fname),
        )
        if offset is not None:
            self._commit_offset(offset)
        return len(df)

    def process_payloads(
        self,
        payloads: "list[bytes]",
        offset: int | None = None,
        *,
        format: str = "json",
        avro_schema: dict | None = None,
    ) -> int:
        """Raw message payloads → decoded micro-batch → process_batch.
        ``format``: "json" (one object per payload) or "avro"
        (schema-framed binary datums, spark_kafka_processor.py:51-57
        parity — schema required)."""
        if format == "json":
            rows = [json.loads(p) for p in payloads]
        elif format == "avro":
            if avro_schema is None:
                raise ValueError("avro format requires avro_schema")
            from feast_ray.functions.avro import decode_records

            rows = decode_records(payloads, avro_schema)
        else:
            raise ValueError(f"unsupported stream format {format!r}")
        return self.process_batch(pd.DataFrame(rows), offset)

    def run(self, batches) -> int:
        """Consume an iterable of (offset, DataFrame) micro-batches."""
        total = 0
        for offset, df in batches:
            total += self.process_batch(df, offset)
        return total


class FileTailSource:
    """Broker-less stream source (VERDICT r3 #9): tail a directory of
    offset-named segment files — ``seg_<offset>.parquet`` or
    ``.jsonl`` — the on-disk shape a Kafka file-sink / WAL shipper
    produces. No live broker exists in this sandbox (declared
    boundary); everything downstream of the segment boundary is the
    real consumer: ordered delivery, committed-offset resume, and
    idempotent redelivery all flow through
    :class:`MicroBatchProcessor`'s checkpoint.

    Reference shape: the Spark consumer's micro-batch loop
    (infra/contrib/spark_kafka_processor.py:74-175), with the
    checkpointLocation role played by the store registry offset."""

    def __init__(self, dir: str, format: str = "parquet"):
        if format not in ("parquet", "jsonl"):
            raise ValueError(format)
        self.dir = dir
        self.format = format
        self._ext = ".parquet" if format == "parquet" else ".jsonl"

    def segments(self) -> "list[tuple[int, str]]":
        """(offset, path) of every segment currently on disk, in
        offset order. Ignores in-flight ``*.tmp`` writes."""
        out = []
        for f in os.listdir(self.dir):
            if f.startswith("seg_") and f.endswith(self._ext):
                out.append((int(f[4: -len(self._ext)]), os.path.join(self.dir, f)))
        out.sort()
        return out

    def read_segment(self, path: str) -> pd.DataFrame:
        if self.format == "parquet":
            import pyarrow.parquet as pq

            return pq.read_table(path).to_pandas()
        with open(path) as f:
            return pd.DataFrame([json.loads(line) for line in f if line.strip()])

    def iter_from(self, committed: int):
        """Yield (offset, DataFrame) for every segment PAST the
        committed offset — the tail loop's single poll pass."""
        for off, path in self.segments():
            if off > committed:
                yield off, self.read_segment(path)


def run_tail(proc: MicroBatchProcessor, source: FileTailSource) -> int:
    """One tail pass: resume from the processor's committed offset and
    consume every newer segment in order. Crash-safe: offsets commit
    per batch AFTER the online upsert + offline append, so a rerun
    redelivers at most the in-flight segment, which process_batch
    drops as already-committed (idempotent) or re-applies to the
    last-write-wins online plane + offset-named log file (both
    replay-stable). Returns rows ingested this pass."""
    return proc.run(source.iter_from(proc._offset()))
