"""VP8L (WebP lossless) codec — decoder pinned by the configurable
first-party encoder (functions/webp.py)."""

import numpy as np
import pytest

from feast_ray.functions.webp import decode_webp, encode_webp


def _rt(px, **kw):
    got = decode_webp(encode_webp(px, **kw))
    ch = px.shape[2]
    assert np.array_equal(got[..., :ch], px), kw
    if ch == 3:
        assert (got[..., 3] == 255).all()


def test_plain_and_transforms():
    rng = np.random.RandomState(6)
    px = rng.randint(0, 256, (21, 19, 3)).astype(np.uint8)
    _rt(px)
    _rt(rng.randint(0, 256, (9, 11, 4)).astype(np.uint8))
    for kw in (dict(subtract_green=True),
               dict(predictor_bits=3),            # cycle: all 14 modes
               dict(predictor_bits=2, predictor_mode=11),
               dict(predictor_bits=2, predictor_mode=12),
               dict(predictor_bits=2, predictor_mode=13),
               dict(subtract_green=True, predictor_bits=4),
               dict(color_bits=3),
               dict(color_bits=2, color_cte=(255, 1, 128)),  # negative int8
               dict(subtract_green=True, color_bits=4, predictor_bits=3)):
        _rt(px, **kw)


def test_cache_lz77_meta():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (30, 41, 3)).astype(np.uint8)
    rep = np.tile(rng.randint(0, 256, (3, 5, 3)).astype(np.uint8), (8, 6, 1))
    for kw in (dict(cache_bits=6), dict(lz77=True),
               dict(lz77=True, use2d=True),
               dict(lz77=True, cache_bits=8),
               dict(meta_bits=3), dict(meta_bits=2, cache_bits=4),
               dict(meta_bits=4, lz77=True)):
        _rt(px, **kw)
        _rt(rep, **kw)
    # lz77 really helps on the repetitive corpus
    assert len(encode_webp(rep, lz77=True)) < len(encode_webp(rep)) // 2


def test_palette_and_edges():
    rng = np.random.RandomState(8)
    for n_colors, dims in ((2, (9, 26)), (3, (7, 15)), (4, (11, 13)),
                           (16, (8, 21)), (17, (6, 9)), (250, (30, 30))):
        vals = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
        img = vals[rng.randint(0, n_colors, dims)]
        _rt(img, palette=True)
    solid = np.full((6, 10, 3), 77, np.uint8)
    for kw in ({}, dict(lz77=True), dict(palette=True)):
        _rt(solid, **kw)
    _rt(np.array([[[1, 2, 3]]], np.uint8))            # 1x1
    _rt(rng.randint(0, 256, (1, 40, 3)).astype(np.uint8), predictor_bits=2)
    _rt(rng.randint(0, 256, (40, 1, 3)).astype(np.uint8), predictor_bits=2)


def test_fuzz_round_trip():
    """120 randomized (image, options) pairs across every feature."""
    rng = np.random.RandomState(123)
    for trial in range(120):
        h = int(rng.randint(1, 24))
        w = int(rng.randint(1, 24))
        kind = trial % 3
        if kind == 0:
            px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        elif kind == 1:  # few colors, repetitive
            vals = rng.randint(0, 256, (3, 3)).astype(np.uint8)
            px = vals[rng.randint(0, 3, (h, w))]
        else:
            px = rng.randint(0, 256, (h, w, 4)).astype(np.uint8)
        kw = {}
        if rng.rand() < 0.4:
            kw["subtract_green"] = True
        if rng.rand() < 0.4:
            kw["predictor_bits"] = int(rng.randint(2, 6))
        if rng.rand() < 0.3:
            kw["color_bits"] = int(rng.randint(2, 6))
            kw["color_cte"] = tuple(int(v) for v in rng.randint(0, 256, 3))
        if rng.rand() < 0.4:
            kw["cache_bits"] = int(rng.randint(1, 11))
        if rng.rand() < 0.5:
            kw["lz77"] = True
            kw["use2d"] = bool(rng.rand() < 0.5)
        if rng.rand() < 0.3 and min(h, w) > 4:
            kw["meta_bits"] = int(rng.randint(2, 5))
        _rt(px, **kw)


def test_errors_and_dispatch():
    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, (5, 7, 3)).astype(np.uint8)
    t = bytearray(encode_webp(px))
    with pytest.raises(ValueError):
        decode_webp(b"RIFX" + bytes(t[4:]))
    with pytest.raises(ValueError):
        decode_webp(bytes(t[: len(t) - 4]))  # truncated bitstream
    bad = bytearray(t)
    i = bad.find(b"VP8L") + 8
    bad[i] = 0x2E  # wrong signature byte
    with pytest.raises(ValueError):
        decode_webp(bytes(bad))
    # lossy VP8 chunk is the declared boundary
    lossy = t[:12] + b"VP8 \x04\x00\x00\x00abcd"
    with pytest.raises(NotImplementedError):
        decode_webp(bytes(lossy))

    # MediaDecoder dispatch + luminance feature
    from feast_ray.functions.multimodal import MediaDecoder

    dec = MediaDecoder()
    w, h, feat = dec._decode_real(encode_webp(px))
    assert (w, h) == (7, 5)
    assert abs(feat.sum() - 1.0) < 1e-12
