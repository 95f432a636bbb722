"""WAV/RIFF codec suite: G.711 exhaustive round trips, PCM/float
container round trips, IMA ADPCM recurrence parity vs a scalar
reference, stereo interleave, fact-chunk truncation, extensible fmt,
and the closed-form n_bytes the q103 oracle relies on."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from feast_ray.functions.wavcodec import (
    AudioDecoder,
    _IMA_INDEX_ADJ,
    _IMA_STEPS,
    alaw_decode_int,
    decode_wav,
    encode_wav,
    g711_encode,
    ima_adpcm_decode,
    ima_adpcm_encode,
    mulaw_decode_int,
    wav_n_bytes,
)


def test_g711_exhaustive_roundtrip():
    codes = np.arange(256, dtype=np.int64)
    # A-law: every code survives encode(decode(b)) == b
    assert np.array_equal(g711_encode(alaw_decode_int(codes), "alaw"), codes)
    # mu-law: same except -0 (0x7F) canonicalizes to +0 (0xFF)
    back = g711_encode(mulaw_decode_int(codes), "mulaw")
    mism = codes[back != codes]
    assert list(mism) == [0x7F] and back[0x7F] == 0xFF


def test_g711_decode_ranges_and_quantization():
    codes = np.arange(256, dtype=np.int64)
    assert mulaw_decode_int(codes).max() == 32124
    assert mulaw_decode_int(codes).min() == -32124
    assert alaw_decode_int(codes).max() == 32256
    rng = np.random.default_rng(7)
    s = rng.integers(-32000, 32000, 5000)
    for law, dec in (("mulaw", mulaw_decode_int), ("alaw", alaw_decode_int)):
        err = np.abs(dec(g711_encode(s, law).astype(np.int64)) - s)
        # largest top-segment step is 1024 (mu) / 1024 (A) -> half-step bound
        assert err.max() <= 512, (law, err.max())


@pytest.mark.parametrize("codec,nch", [
    ("pcm16", 1), ("pcm16", 2), ("pcm24", 2), ("pcm32", 1), ("float32", 2),
])
def test_pcm_float_container_roundtrip(codec, nch):
    rng = np.random.default_rng(3)
    n = 157
    if codec == "float32":
        s = rng.random((n, nch)) * 2 - 1
        expect = s.astype(np.float32).astype(np.float64)
    else:
        bits = int(codec[3:])
        s = rng.integers(-(1 << (bits - 1)), 1 << (bits - 1), (n, nch))
        expect = s.astype(np.float64) / float(1 << (bits - 1))
    p = encode_wav(s, 22050, codec)
    rate, c, k, arr = decode_wav(p)
    assert (rate, c, k) == (22050, nch, n)
    assert np.array_equal(arr, expect)
    assert len(p) == wav_n_bytes(codec, n, nch)


def test_pcm8_quantization_and_odd_pad():
    s = np.arange(-32768, 32768, 997).reshape(-1, 1)  # odd count -> pad byte
    p = encode_wav(s, 8000, "pcm8")
    assert len(p) == wav_n_bytes("pcm8", len(s), 1) and len(p) % 2 == 0
    _, _, k, arr = decode_wav(p)
    assert k == len(s)
    assert np.abs(arr.ravel() * 32768 - s.ravel()).max() < 256


def _scalar_ima_decode(data: bytes, block_align: int) -> list[int]:
    """Independent scalar-Python IMA decoder (mono) for parity."""
    out = []
    for b0 in range(0, len(data), block_align):
        blk = data[b0:b0 + block_align]
        pred = struct.unpack_from("<h", blk, 0)[0]
        idx = blk[2]
        out.append(pred)
        for byte in blk[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                step = int(_IMA_STEPS[idx])
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                pred = pred - diff if nib & 8 else pred + diff
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + int(_IMA_INDEX_ADJ[nib & 7])))
                out.append(pred)
    return out


def test_ima_adpcm_vector_vs_scalar_parity():
    rng = np.random.default_rng(11)
    s = np.cumsum(rng.integers(-800, 800, 2020)).clip(-32768, 32767)
    data, spb = ima_adpcm_encode(s, 256, 1)
    vec = ima_adpcm_decode(data, 256, 1)[:, 0]
    ref = np.array(_scalar_ima_decode(data, 256))
    assert np.array_equal(vec, ref[: len(vec)])
    # tracking: reconstruction follows the signal within a few steps
    err = np.abs(vec[:2020] - s)
    assert np.median(err) < 200 and err.max() < 4000


def test_ima_adpcm_stereo_and_fact_truncation():
    rng = np.random.default_rng(5)
    n = 700  # not a multiple of samples-per-block -> partial final block
    ch0 = np.cumsum(rng.integers(-300, 300, n)).clip(-32768, 32767)
    ch1 = np.full(n, 1234)
    s = np.stack([ch0, ch1], axis=1)
    p = encode_wav(s, 16000, "ima_adpcm", block_align=256)
    rate, c, k, arr = decode_wav(p)
    assert (rate, c, k) == (16000, 2, n)
    assert len(p) == wav_n_bytes("ima_adpcm", n, 2)
    lin = arr * 32768
    # constant channel stays near-constant; moving channel tracks ch0
    assert np.abs(lin[5:, 1] - 1234).max() < 64
    assert np.abs(lin[:, 0] - ch0).max() < 4000


def test_extensible_fmt_wrapping_pcm16():
    s = np.arange(-500, 500, 10, dtype=np.int64).reshape(-1, 1)
    base = encode_wav(s, 48000, "pcm16")
    # rewrite the fmt chunk as WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE,
    # cbSize 22, SubFormat GUID leading with the wrapped tag)
    fmt = struct.pack(
        "<HHIIHHHHI", 0xFFFE, 1, 48000, 96000, 2, 16, 22, 16, 0x3
    ) + struct.pack("<H", 1) + b"\x00" * 14
    data = base[44:]
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack(
        "<I", len(data)) + data
    p = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate, c, k, arr = decode_wav(p)
    assert (rate, c, k) == (48000, 1, len(s))
    assert np.array_equal(arr.ravel() * 32768, s.ravel().astype(np.float64))


def test_unknown_tag_raises():
    fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 8000, 1, 16)  # MP3 tag
    body = b"fmt " + struct.pack("<I", 16) + fmt + b"data" + struct.pack("<I", 2) + b"\x00\x00"
    p = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(NotImplementedError):
        decode_wav(p)


def test_g711_through_container_and_nbytes_sweep():
    rng = np.random.default_rng(9)
    for codec in ("mulaw", "alaw"):
        for n, nch in ((33, 1), (64, 2)):
            s = rng.integers(-30000, 30000, (n, nch))
            p = encode_wav(s, 8000, codec)
            rate, c, k, arr = decode_wav(p)
            assert (rate, c, k) == (8000, nch, n)
            assert len(p) == wav_n_bytes(codec, n, nch)
            assert np.abs(arr * 32768 - s).max() <= 512


def test_audio_decoder_stage_batch():
    s = np.full((100, 1), 16384, np.int64)
    tbl = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array(
            [encode_wav(s, 8000, "pcm16"), encode_wav(s, 16000, "mulaw")],
            pa.binary()),
    })
    out = AudioDecoder()(tbl)
    assert out["sample_rate"].to_pylist() == [8000, 16000]
    assert out["n_samples"].to_pylist() == [100, 100]
    feats = out["feature"].to_pylist()
    # constant +0.5 signal -> one-hot at bin 12
    assert feats[0][12] == 1.0 and sum(feats[0]) == 1.0
    # mu-law quantizes 16384 to its nearest level, still in bin 12
    assert feats[1][12] == 1.0


def test_media_decoder_real_wav_path():
    from feast_ray.functions.multimodal import MediaDecoder

    s = np.full((64, 2), -32768, np.int64)
    p = encode_wav(s, 44100, "alaw")
    w, h, f = MediaDecoder(mode="real")._decode_real(p)
    assert (w, h) == (44100, 2)
    assert f[0] == 1.0  # -1.0 amplitude -> bin 0


# --------------------------------------------------------------------------
# AIFF / AU (q112)
# --------------------------------------------------------------------------

def test_f80_sample_rate_roundtrip():
    from feast_ray.functions.wavcodec import _f80_decode, _f80_encode

    for rate in (1, 8000, 11025, 22050, 44100, 48000, 96000, 192000, 2**31):
        assert _f80_decode(_f80_encode(rate)) == rate
    with pytest.raises(ValueError):
        _f80_encode(0)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("nch", [1, 2])
def test_aiff_roundtrip(bits, nch):
    from feast_ray.functions.wavcodec import aiff_n_bytes, decode_aiff, encode_aiff

    rng = np.random.default_rng(bits * 10 + nch)
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    s = rng.integers(lo, hi + 1, (57, nch))
    p = encode_aiff(s, 44100, bits=bits)
    assert len(p) == aiff_n_bytes(bits, 57, nch)
    rate, c, n, arr = decode_aiff(p)
    assert (rate, c, n) == (44100, nch, 57)
    assert np.array_equal(arr * float(1 << (bits - 1)), s.astype(np.float64))


def test_aiff_ssnd_offset_and_odd_pad():
    from feast_ray.functions.wavcodec import decode_aiff, encode_aiff

    # odd data size (8-bit, 33 mono samples) forces the chunk pad byte
    s = np.arange(-16, 17).reshape(-1, 1)
    p = encode_aiff(s, 8000, bits=8)
    assert len(p) % 2 == 0
    rate, c, n, arr = decode_aiff(p)
    assert n == 33 and np.array_equal(arr.ravel() * 128, s.ravel().astype(np.float64))


@pytest.mark.parametrize("codec,tol", [("mulaw", 512), ("pcm8", 256),
                                       ("pcm16", 0), ("float32", 0)])
def test_au_roundtrip(codec, tol):
    from feast_ray.functions.wavcodec import au_n_bytes, decode_au, encode_au

    rng = np.random.default_rng(hash(codec) % 2**32)
    if codec == "pcm8":
        s = rng.integers(-128, 128, (41, 2))
        scale = 128.0
    elif codec == "float32":
        s = (rng.integers(-1500, 1501, (41, 2))) / 2048.0
        scale = 1.0
    else:
        s = rng.integers(-30000, 30001, (41, 2))
        scale = 32768.0
    p = encode_au(s, 16000, codec)
    assert len(p) == au_n_bytes(codec, 41, 2)
    rate, c, n, arr = decode_au(p)
    assert (rate, c, n) == (16000, 2, 41)
    if codec == "pcm8":
        assert np.array_equal(arr * scale, s.astype(np.float64))
    elif tol == 0:
        assert np.array_equal(arr * scale, s.astype(np.float64))
    else:
        assert np.abs(arr * scale - s).max() <= tol


def test_decode_audio_any_sniffing_and_stage():
    from feast_ray.functions.wavcodec import (
        decode_audio_any, encode_aiff, encode_au)

    s = np.full((50, 1), 8192, np.int64)
    for p in (encode_wav(s, 8000, "pcm16"), encode_aiff(s, 8000, 16),
              encode_au(s, 8000, "pcm16")):
        rate, c, n, arr = decode_audio_any(p)
        assert (rate, c, n) == (8000, 1, 50)
        assert np.all(arr == 8192 / 32768.0)
    with pytest.raises(NotImplementedError):
        decode_audio_any(b"\x00\x01\x02\x03junk")
    # the actor-pool stage dispatches per-row on magic
    tbl = pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array(
            [encode_wav(s, 8000, "pcm16"), encode_aiff(s, 11000, 16),
             encode_au(s, 9000, "mulaw")], pa.binary()),
    })
    out = AudioDecoder()(tbl)
    assert out["sample_rate"].to_pylist() == [8000, 11000, 9000]
    assert out["n_samples"].to_pylist() == [50, 50, 50]
