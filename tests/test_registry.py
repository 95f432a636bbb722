"""Resumable materialization: manifest watermarks, partition skip,
idempotent partition rewrite (reference semantics:
feature_view.py:482-491 apply_materialization,
feature_store.py:2546-2630 materialize_incremental)."""

import os

import pyarrow.parquet as pq

from feast_ray.pipelines import quality_filter
from feast_ray.sources import synth_webpages
from feast_ray.state import Registry, materialize_resumable


def _build(ds):
    return quality_filter(ds, validate_input=False)


def test_resume_skips_and_stays_idempotent(tmp_path, sf_small):
    out = str(tmp_path / "mat")
    r1 = materialize_resumable(
        _build, synth_webpages(sf_small), out, num_partitions=4, version="v1"
    )
    assert r1["written"] == [0, 1, 2, 3]
    r2 = materialize_resumable(
        _build, synth_webpages(sf_small), out, num_partitions=4, version="v1"
    )
    assert r2["written"] == [] and r2["skipped"] == [0, 1, 2, 3]

    # partial completion: only parts 0,1 committed → rerun writes 2,3
    reg = Registry(out)
    m = reg.load()
    m["completed_partitions"] = [0, 1]
    reg.save(m)
    r3 = materialize_resumable(
        _build, synth_webpages(sf_small), out, num_partitions=4, version="v1"
    )
    assert r3["written"] == [2, 3] and r3["skipped"] == [0, 1]

    tbl = pq.read_table(os.path.join(out, "data"))
    urls = tbl["url"].to_pylist()
    assert len(urls) == len(set(urls)) == 500  # no duplicate rows ever

    # version bump invalidates the checkpoint entirely
    r4 = materialize_resumable(
        _build, synth_webpages(sf_small), out, num_partitions=4, version="v2"
    )
    assert r4["written"] == [0, 1, 2, 3]


def test_metrics_sink(tmp_path, sf_small):
    import pandas as pd

    reg = Registry(str(tmp_path / "reg"))
    path = reg.append_metrics(pd.DataFrame({"stage": ["extract"], "rows": [10]}))
    assert len(os.listdir(path)) == 1
