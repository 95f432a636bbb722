"""FLAC codec suite: lossless round trips across every subframe type,
channel assignment, bit depth and residual layout the decoder claims,
the closed-form n_bytes q113's oracle relies on, CRC tamper detection,
and a randomized fuzz."""

import numpy as np
import pyarrow as pa
import pytest

from feast_ray.functions.flac import (
    decode_flac,
    encode_flac,
    flac_const_n_bytes,
    flac_ms_const_n_bytes,
    flac_ramp_n_bytes,
)


def _rt(s, **kw):
    bits = kw.get("bits", 16)
    p = encode_flac(s, kw.pop("rate", 44100), **kw)
    rate, nch, n, arr = decode_flac(p)
    s2 = np.asarray(s)
    if s2.ndim == 1:
        s2 = s2.reshape(-1, 1)
    lin = np.round(arr * (1 << (bits - 1))).astype(np.int64)
    assert (n, nch) == (len(s2), s2.shape[1])
    assert np.array_equal(lin, s2)
    return p


def test_constant_closed_form():
    p = _rt(np.full(60, -1234, np.int64))
    assert len(p) == flac_const_n_bytes()
    # size is n-independent: one CONSTANT subframe regardless of length
    assert len(_rt(np.full(124, 31000, np.int64))) == flac_const_n_bytes()


def test_ramp_fixed2_closed_form_and_auto_choice():
    for n in (48, 97, 124):
        s = (-500 + 3 * np.arange(n)).astype(np.int64)
        p = _rt(s, mode="fixed")
        assert len(p) == flac_ramp_n_bytes(n)
        assert _rt(s) == p  # auto picks FIXED order 2, Rice k=0


def test_mid_side_constant_closed_form():
    st = np.stack([np.full(80, 1000), np.full(80, -2000)], axis=1)
    p = _rt(st, stereo="mid_side")
    assert len(p) == flac_ms_const_n_bytes()
    # extreme values exercise the 17-bit side subframe
    st = np.stack([np.full(50, -32768), np.full(50, 32767)], axis=1)
    assert len(_rt(st, stereo="mid_side")) == flac_ms_const_n_bytes()


@pytest.mark.parametrize("stereo", ["indep", "left_side", "right_side",
                                    "mid_side"])
@pytest.mark.parametrize("mode", ["verbatim", "fixed"])
def test_stereo_modes_multiframe(stereo, mode):
    rng = np.random.default_rng(hash((stereo, mode)) % 2**32)
    s = rng.integers(-32768, 32768, (700, 2))
    _rt(s, mode=mode, stereo=stereo, block_size=192,
        partition_order=2 if mode == "fixed" else 0)


def test_lpc_escape_wasted_and_depths():
    rng = np.random.default_rng(7)
    s = np.cumsum(rng.integers(-50, 51, 500)).astype(np.int64)
    _rt(s, mode="lpc", qlp=([60, -30], 5))
    _rt(s, mode="lpc", qlp=([120, -80, 25], 6), partition_order=1,
        block_size=250)
    _rt(s[:200], mode="fixed", escape_bits=18)
    _rt((rng.integers(-2000, 2000, 300) << 3).astype(np.int64),
        mode="fixed", wasted_bits=3)
    _rt(rng.integers(-128, 128, 100), bits=8)
    _rt(rng.integers(-(1 << 23), 1 << 23, 100), bits=24)


def test_crc_tamper_detected():
    p = bytearray(encode_flac(np.arange(100, dtype=np.int64), 8000))
    p[-3] ^= 0x40  # flip a bit inside the last frame's payload
    with pytest.raises(ValueError):
        decode_flac(bytes(p))


def test_fuzz_roundtrip():
    rng = np.random.default_rng(42)
    for trial in range(40):
        n = int(rng.integers(1, 400))
        nch = int(rng.integers(1, 3))
        s = rng.integers(-32768, 32768, (n, nch))
        kw = {}
        if nch == 2 and trial % 3:
            kw["stereo"] = ["left_side", "right_side", "mid_side"][trial % 3 - 1]
        mode = ["auto", "verbatim", "fixed"][trial % 3]
        bs = int(rng.integers(16, 300))
        _rt(s, mode=mode, block_size=bs, **kw)


def test_audio_decoder_sniffs_flac():
    from feast_ray.functions.wavcodec import AudioDecoder

    s = np.full((64, 1), 8192, np.int64)
    tbl = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([encode_flac(s, 22050)], pa.binary()),
    })
    out = AudioDecoder()(tbl)
    assert out["sample_rate"].to_pylist() == [22050]
    assert out["n_samples"].to_pylist() == [64]
    feats = out["feature"].to_pylist()
    assert feats[0][10] == 1.0  # +0.25 -> bin 10
