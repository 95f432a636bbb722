"""Empty-input and degenerate-shape behavior of the core operators —
streaming pipelines see empty blocks routinely."""

from datetime import timedelta

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from feast_ray.stages import (
    AggSpec,
    asof_join,
    distinct,
    grouped_agg,
    keep_latest,
    topk,
    windowed_agg,
)
from feast_ray.stages.join import semi_join


def _empty_events():
    tbl = pa.table(
        {
            "k": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "v": pa.array([], pa.float64()),
        }
    )
    return ray.data.from_arrow(tbl)


def test_grouped_agg_empty():
    out = grouped_agg(_empty_events(), ["k"], [AggSpec("v", "sum", "s")]).to_pandas()
    assert len(out) == 0


def test_keep_latest_empty():
    assert keep_latest(_empty_events(), ["k"], "ts").count() == 0


def test_distinct_and_topk_empty():
    assert distinct(_empty_events(), ["k"]).count() == 0
    assert topk(_empty_events(), "v", 5).count() == 0


def test_windowed_agg_empty():
    out = windowed_agg(
        _empty_events(), ["k"], "ts", timedelta(hours=1), [AggSpec(None, "count", "n")]
    )
    assert out.count() == 0


def test_asof_join_empty_right():
    left = ray.data.from_pandas(
        pd.DataFrame({"k": [1], "ts": pd.to_datetime(["2024-01-01"])})
    )
    right = pd.DataFrame(
        {"k": pd.Series([], dtype="int64"),
         "fts": pd.Series([], dtype="datetime64[ns]"),
         "v": pd.Series([], dtype="float64")}
    )
    out = asof_join(left, right, left_ts="ts", right_ts="fts", by="k").to_pandas()
    assert len(out) == 1
    assert out["v"].isna().all()


def test_semi_join_empty_keyset():
    left = ray.data.from_pandas(pd.DataFrame({"k": [1, 2]}))
    assert semi_join(left, [], on="k").count() == 0
    assert semi_join(left, [], on="k", anti=True).count() == 2


def test_single_row_pipeline(sf_small):
    from feast_ray.pipelines.quality_filter import quality_filter
    from feast_ray.sources.webpages import pages_from_documents

    one = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array([
                "the quick brown fox jumps over the lazy dog while the data "
                "engine sorts filters joins and aggregates rows of tables in "
                "parallel across many worker processes with streaming output"
            ]),
            "lang": pa.array(["en"]),
            "source": pa.array(["s"]),
            "n_chars": pa.array([100], pa.int64()),
        }
    )
    pages = ray.data.from_arrow(pages_from_documents(one))
    out = quality_filter(pages).to_pandas()
    assert len(out) == 1
    assert out["keep"].iloc[0]
