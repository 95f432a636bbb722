"""Multimodal (image/audio/video) column plumbing.

The reference models media as typed bytes columns
(feast/types.py:75-138: ``Bytes``, ``ImageBytes``, ``PdfBytes``) and
runs embedders over them in model-holding stages
(feast/embedder.py:232 `MultiModalEmbedder`). This module provides the
Ray-side plumbing for the same shape: opaque ``binary`` payload column
+ typed metadata, decoded / featurized by an actor-pool ``map_batches``
stage with a small batch size (payloads are fat — SURVEY.md §7.5).

Codec status (honest capability boundary): the compressed-format
libraries (PIL/ffmpeg) are NOT in this container, so ``mode="real"``
decodes the CONTAINER-FREE formats natively — uncompressed 24-bit BMP
(struct header + one numpy reshape) and PCM WAV (stdlib ``wave`` +
numpy) — and raises NotImplementedError for anything else (JPEG, PNG,
MP4…). ``mode="fake"`` (default) produces a deterministic pseudo
decode seeded by a content digest, so the schema, batch sizing, actor
signature and output layout are exercised end to end either way (the
fake path is additionally SQL-oracle-checked — q30).
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

    ``mode="real"`` decodes uncompressed 24-bit BMP (width/height from
    the header, feature = L1-normalized 16-bin luminance histogram of
    the actual pixels) and PCM WAV (width = sample rate, height =
    channel count, feature = 16-bin amplitude histogram over [-1, 1)),
    sniffed by magic bytes; other formats raise NotImplementedError
    (PIL/ffmpeg unavailable — module docstring). ``mode="fake"``
    derives deterministic pseudo-decode outputs from a content digest,
    exercising the full distributed path.
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

    @staticmethod
    def _decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
        """Uncompressed 24-bit BI_RGB BMP → (w, h, luminance histogram)."""
        import struct

        data_off = struct.unpack_from("<I", payload, 10)[0]
        w = struct.unpack_from("<i", payload, 18)[0]
        h = struct.unpack_from("<i", payload, 22)[0]
        bpp = struct.unpack_from("<H", payload, 28)[0]
        comp = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or comp != 0:
            raise NotImplementedError(
                f"BMP decode supports uncompressed 24-bit only (bpp={bpp}, compression={comp})"
            )
        H = abs(h)
        row_size = (w * 3 + 3) // 4 * 4  # rows pad to 4-byte boundaries
        px = (
            np.frombuffer(payload, np.uint8, count=row_size * H, offset=data_off)
            .reshape(H, row_size)[:, : w * 3]
            .reshape(H, w, 3)
        )
        if h > 0:  # bottom-up storage (the default)
            px = px[::-1]
        # BGR byte order → ITU-R 601 luminance
        lum = px @ np.array([0.114, 0.587, 0.299])
        feat = np.bincount(
            (lum.astype(np.uint8) >> 4).ravel(), minlength=FEATURE_DIM
        ).astype(np.float64)
        s = feat.sum()
        return w, H, (feat / s if s else feat)

    @staticmethod
    def _decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
        """PCM WAV → (sample_rate, n_channels, amplitude histogram)."""
        import io
        import wave

        with wave.open(io.BytesIO(payload)) as f:
            nch, sw, rate, n = (
                f.getnchannels(), f.getsampwidth(), f.getframerate(), f.getnframes(),
            )
            raw = f.readframes(n)
        if sw == 2:
            arr = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
        elif sw == 1:
            arr = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
        else:
            raise NotImplementedError(f"WAV decode supports 8/16-bit PCM (got {8 * sw}-bit)")
        feat = np.histogram(arr, bins=FEATURE_DIM, range=(-1.0, 1.0))[0].astype(np.float64)
        s = feat.sum()
        return rate, nch, (feat / s if s else feat)

    def _decode_real(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        if payload[:2] == b"BM":
            return self._decode_bmp(payload)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return self._decode_wav(payload)
        raise NotImplementedError(
            "real decode supports uncompressed BMP and PCM WAV natively; "
            "compressed formats (JPEG/PNG/MP4/...) need PIL/ffmpeg, "
            "not available in this environment"
        )

    def __call__(self, tbl: pa.Table) -> pa.Table:
        decode = self._decode_real if self.mode == "real" else self._decode_fake
        payloads = tbl[self.payload_col].to_pylist()
        widths = np.empty(len(payloads), dtype=np.int32)
        heights = np.empty(len(payloads), dtype=np.int32)
        nbytes = np.empty(len(payloads), dtype=np.int64)
        feats = np.empty((len(payloads), FEATURE_DIM), dtype=np.float64)
        for i, p in enumerate(payloads):
            w, h, f = decode(p)
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
