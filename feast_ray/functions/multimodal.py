"""Multimodal (image/audio/video) column plumbing.

The reference models media as typed bytes columns
(feast/types.py:75-138: ``Bytes``, ``ImageBytes``, ``PdfBytes``) and
runs embedders over them in model-holding stages
(feast/embedder.py:232 `MultiModalEmbedder`). This module provides the
Ray-side plumbing for the same shape: opaque ``binary`` payload column
+ typed metadata, decoded / featurized by an actor-pool ``map_batches``
stage with a small batch size (payloads are fat — SURVEY.md §7.5).

The image/audio codec libraries are NOT in this container, so the
actual decode is STUBBED: ``mode="real"`` raises NotImplementedError;
``mode="fake"`` produces a deterministic fake decode (seeded by a
content digest) so the schema, batch sizing, actor signature and output
layout are real and testable end to end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = [
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),
]

FEATURE_DIM = 16


class MediaDecoder:
    """Actor-pool stage: binary payload → (width, height, n_bytes,
    feature list<float>[16]).

    ``mode="real"`` would decode with PIL/ffmpeg — unavailable here:
    raises NotImplementedError by design. ``mode="fake"`` derives
    deterministic pseudo-decode outputs from a blake2b digest of the
    payload, exercising the full distributed path.
    """

    def __init__(self, mode: str = "fake", payload_col: str = "payload"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        self.payload_col = payload_col

    def _decode_fake(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        # dims from the engine's SQL-expressible content digest
        # (poly+splitmix64, see neardup.word_hashes64) so the fake
        # decode is oracle-checkable end to end (q30); round 1 used
        # blake2b, which SQL cannot reproduce
        from feast_ray.functions.neardup import word_hashes64

        h = int(word_hashes64([payload])[0])
        width = 64 + h % 192
        height = 64 + (h >> 8) % 192
        # 16-bin byte histogram of the payload, L1-normalized — a
        # deterministic stand-in for a decoded-pixel feature vector
        arr = np.frombuffer(payload, dtype=np.uint8)
        if len(arr) == 0:
            feat = np.zeros(FEATURE_DIM)
        else:
            feat = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype(np.float64)
            feat /= feat.sum()
        return width, height, feat

    def __call__(self, tbl: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg, not available in this environment"
            )
        payloads = tbl[self.payload_col].to_pylist()
        widths = np.empty(len(payloads), dtype=np.int32)
        heights = np.empty(len(payloads), dtype=np.int32)
        nbytes = np.empty(len(payloads), dtype=np.int64)
        feats = np.empty((len(payloads), FEATURE_DIM), dtype=np.float64)
        for i, p in enumerate(payloads):
            w, h, f = self._decode_fake(p)
            widths[i], heights[i], nbytes[i] = w, h, len(p)
            feats[i] = f
        tbl = tbl.drop_columns([self.payload_col])  # decoded → payload is spent
        tbl = tbl.append_column("width", pa.array(widths))
        tbl = tbl.append_column("height", pa.array(heights))
        tbl = tbl.append_column("n_bytes", pa.array(nbytes))
        tbl = tbl.append_column(
            "feature", pa.FixedSizeListArray.from_arrays(pa.array(feats.ravel()), FEATURE_DIM)
        )
        return tbl


def decode_media(
    ds: ray.data.Dataset,
    *,
    mode: str = "fake",
    payload_col: str = "payload",
    batch_size: int = 64,
    concurrency: tuple[int, int] = (1, 8),
    num_cpus: float = 1,
) -> ray.data.Dataset:
    """Run the decode stage with fat-payload-appropriate sizing: small
    ``batch_size`` so batch × concurrency stays inside worker heaps."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"mode": mode, "payload_col": payload_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
