"""Multimodal plumbing: schema, batch sizing, actor signature and
output layout are real; decode itself is a deterministic stub."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from feast_ray.functions.multimodal import FEATURE_DIM, MediaDecoder, decode_media


def _media_ds(n=20):
    payloads = [bytes([i % 251] * (100 + i)) for i in range(n)]
    tbl = pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image/fake"] * n, pa.string()),
        }
    )
    return ray.data.from_arrow(tbl)


def test_fake_decode_layout():
    out = decode_media(_media_ds(), mode="fake", batch_size=8).to_pandas()
    assert list(out.columns) == ["media_id", "media_type", "width", "height", "n_bytes", "feature"]
    assert len(out) == 20
    assert (out["n_bytes"].to_numpy() == np.arange(100, 120)).all()
    feats = np.stack(out["feature"].to_numpy())
    assert feats.shape == (20, FEATURE_DIM)
    np.testing.assert_allclose(feats.sum(axis=1), 1.0)


def test_fake_decode_deterministic():
    d = MediaDecoder(mode="fake")
    tbl = pa.table(
        {"media_id": [1], "payload": [b"abc123"], "media_type": ["image/fake"]}
    )
    a = d(tbl).to_pandas()
    b = d(tbl).to_pandas()
    assert a["width"][0] == b["width"][0]
    np.testing.assert_array_equal(np.stack(a["feature"]), np.stack(b["feature"]))


def test_real_mode_is_stubbed():
    d = MediaDecoder(mode="real")
    tbl = pa.table(
        {"media_id": [1], "payload": [b"x"], "media_type": ["image/fake"]}
    )
    with pytest.raises(NotImplementedError):
        d(tbl)
