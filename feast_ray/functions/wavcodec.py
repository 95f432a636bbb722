"""WAV / RIFF audio codec — native decode + pinning encoders.

The reference models media as opaque typed bytes columns
(``/root/reference/sdk/python/feast/types.py:75-138``) and leaves
decoding to model-holding stages (``feast/embedder.py:232``). This
module is the audio half of that surface for a Ray-Data engine: a
from-scratch RIFF/WAVE parser covering the formats that actually
occur in crawled web audio —

- PCM 8 / 16 / 24 / 32-bit integer (``wFormatTag=1``)
- IEEE float32 (``wFormatTag=3``)
- G.711 A-law / µ-law (``wFormatTag=6`` / ``7``) — the telephony
  companders, pure integer expansion so the decode is SQL-restatable
- IMA / DVI ADPCM (``wFormatTag=0x11``) — block-structured 4-bit
  predictive coding, decoded with the recurrence vectorized ACROSS
  blocks (one numpy pass per nibble position, not per sample)
- ``WAVE_FORMAT_EXTENSIBLE`` (``0xFFFE``) wrapping any of the above

plus first-party encoders for every format so tests and oracles pin
the decoder against independently-constructed payloads (the same
doctrine as the image codecs in ``multimodal.py``). No third-party
audio library exists in this container; everything here is struct +
numpy over the public format specs (RIFF/WAVE, G.711, IMA ADPCM).

Normalization contract (shared with ``MediaDecoder._decode_wav``):
samples are returned as float64 in [-1, 1) — int domains divide by
their two's-complement magnitude (2^7 / 2^15 / 2^23 / 2^31), the
G.711 expansions divide by 32768 after integer expansion, float32
passes through.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray.data

# --------------------------------------------------------------------------
# G.711 companding — integer expansion formulas (SQL-restatable)
# --------------------------------------------------------------------------

_MULAW_BIAS = 0x84


def mulaw_decode_int(codes: np.ndarray) -> np.ndarray:
    """µ-law byte → linear int16-range value (±32124), pure integers.

    u = ~b; mag = (((u & 0xF) << 3) + 0x84) << ((u >> 4) & 7) − 0x84;
    sign from bit 7. This exact chain is restated in the q103 SQL
    oracle, so keep it integer-only.
    """
    u = (~codes.astype(np.int64)) & 0xFF
    mant = u & 0x0F
    exp = (u >> 4) & 0x07
    mag = (((mant << 3) + _MULAW_BIAS) << exp) - _MULAW_BIAS
    return np.where(u & 0x80, -mag, mag)


def alaw_decode_int(codes: np.ndarray) -> np.ndarray:
    """A-law byte → linear value (±32256), pure integers.

    a = b ^ 0x55; seg = (a >> 4) & 7; mant = a & 0xF;
    seg 0 → (mant << 4) + 8; seg 1 → (mant << 4) + 0x108;
    seg ≥ 2 → ((mant << 4) + 0x108) << (seg − 1); bit 7 SET = positive.
    """
    a = codes.astype(np.int64) ^ 0x55
    mant = (a & 0x0F) << 4
    seg = (a >> 4) & 0x07
    t = np.where(
        seg == 0, mant + 8,
        np.where(seg == 1, mant + 0x108, (mant + 0x108) << np.maximum(seg - 1, 0)),
    )
    return np.where(a & 0x80, t, -t)


def _g711_tables(law: str) -> tuple[np.ndarray, np.ndarray]:
    """(levels sorted asc, code-for-level) for the nearest-level encoder."""
    codes = np.arange(256, dtype=np.int64)
    lv = mulaw_decode_int(codes) if law == "mulaw" else alaw_decode_int(codes)
    if law == "mulaw":
        # µ-law has +0 (0xFF) and −0 (0x7F): drop −0 so the level set is
        # strictly increasing and encode(0) canonicalizes to 0xFF.
        keep = codes != 0x7F
        codes, lv = codes[keep], lv[keep]
    order = np.argsort(lv, kind="stable")
    return lv[order], codes[order]


_G711_ENC = {law: _g711_tables(law) for law in ("mulaw", "alaw")}


def g711_encode(samples: np.ndarray, law: str) -> np.ndarray:
    """int16-domain samples → nearest-level G.711 code bytes.

    Nearest-decoded-level quantization: exact on every decodable level,
    so ``encode(decode(b)) == b`` for all codes (µ-law −0 canonicalizes
    to +0). Ties round toward the lower level.
    """
    levels, codes = _G711_ENC[law]
    s = samples.astype(np.int64)
    idx = np.searchsorted(levels, s)
    idx = np.clip(idx, 1, len(levels) - 1)
    lo, hi = levels[idx - 1], levels[idx]
    pick = np.where((s - lo) <= (hi - s), idx - 1, idx)
    return codes[pick].astype(np.uint8)


# --------------------------------------------------------------------------
# IMA / DVI ADPCM — standard step + index tables (public spec constants)
# --------------------------------------------------------------------------

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)

_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_step_all(pred: np.ndarray, index: np.ndarray, nib: np.ndarray):
    """One IMA ADPCM update, vectorized across blocks.

    diff = (step>>3) + (n&1)*(step) … the standard bit expansion; the
    result is the canonical integer-arithmetic variant
    (step>>3 + step&4?step>>2 … summed), sign from bit 3.
    """
    step = _IMA_STEPS[index]
    diff = step >> 3
    diff = diff + np.where(nib & 1, step >> 2, 0)
    diff = diff + np.where(nib & 2, step >> 1, 0)
    diff = diff + np.where(nib & 4, step, 0)
    pred = np.where(nib & 8, pred - diff, pred + diff)
    pred = np.clip(pred, -32768, 32767)
    index = np.clip(index + _IMA_INDEX_ADJ[nib & 7], 0, 88)
    return pred, index


def ima_adpcm_decode(
    data: bytes, block_align: int, n_channels: int, n_samples: int | None = None
) -> np.ndarray:
    """IMA ADPCM data chunk → interleaved int16-domain samples.

    Block layout (per the public IMA/DVI spec): per channel a 4-byte
    header (int16 sample 0, uint8 step index, reserved), then the
    nibble stream — mono: low nibble first within each byte; stereo:
    alternating 4-byte words per channel, 8 samples per word. The
    recurrence is vectorized ACROSS blocks (loop length = nibbles per
    block, each iteration a numpy pass over all blocks): at 100-TB
    corpus scale the per-payload loop is O(samples_per_block), not
    O(total samples).
    """
    if block_align % 4 or block_align < 4 * n_channels:
        raise ValueError(f"bad IMA block_align {block_align}")
    if n_channels == 2 and block_align % 8:
        raise ValueError("stereo IMA needs 8-byte-aligned blocks")
    raw = np.frombuffer(data, np.uint8)
    if len(raw) % block_align:
        raise ValueError("IMA data not a whole number of blocks")
    nblk = len(raw) // block_align
    blocks = raw.reshape(nblk, block_align)
    spb = (block_align - 4 * n_channels) * 2 // n_channels + 1
    out = np.empty((nblk, spb, n_channels), dtype=np.int64)
    preds = np.empty((nblk, n_channels), dtype=np.int64)
    idxs = np.empty((nblk, n_channels), dtype=np.int64)
    for c in range(n_channels):
        hdr = blocks[:, 4 * c:4 * c + 4]
        preds[:, c] = hdr[:, 0].astype(np.int64) | (
            hdr[:, 1].astype(np.int64) << 8)
        preds[:, c] = np.where(preds[:, c] >= 32768, preds[:, c] - 65536,
                               preds[:, c])
        idxs[:, c] = np.clip(hdr[:, 2].astype(np.int64), 0, 88)
        out[:, 0, c] = preds[:, c]
    body = blocks[:, 4 * n_channels:]
    if n_channels == 1:
        nibs = np.empty((nblk, body.shape[1] * 2), dtype=np.uint8)
        nibs[:, 0::2] = body & 0x0F
        nibs[:, 1::2] = body >> 4
    else:
        # words of 4 bytes alternate channels: reshape to (nblk, words, ch, 4)
        nwords = body.shape[1] // (4 * n_channels)
        w = body.reshape(nblk, nwords, n_channels, 4)
        nibs = np.empty((nblk, nwords * 8, n_channels), dtype=np.uint8)
        by = w.transpose(0, 1, 3, 2).reshape(nblk, nwords * 4, n_channels)
        nibs[:, 0::2, :] = by & 0x0F
        nibs[:, 1::2, :] = by >> 4
    for s in range(1, spb):
        for c in range(n_channels):
            nib = (nibs[:, s - 1] if n_channels == 1
                   else nibs[:, s - 1, c]).astype(np.int64)
            preds[:, c], idxs[:, c] = _ima_step_all(preds[:, c], idxs[:, c], nib)
            out[:, s, c] = preds[:, c]
    flat = out.reshape(nblk * spb, n_channels)
    if n_samples is not None:
        flat = flat[:n_samples]
    return flat


def ima_adpcm_encode(
    samples: np.ndarray, block_align: int, n_channels: int
) -> tuple[bytes, int]:
    """int16 samples (n, ch) → (data bytes, samples_per_block).

    Standard greedy encoder: nibble = the 4-bit code whose decode step
    lands nearest the target, computed by trial expansion (vectorized
    across blocks, loop over sample positions like the decoder). The
    final partial block is zero-padded in the SAMPLE domain (encoder
    repeats the last sample), with the true count carried by the fact
    chunk. Returns the encoded stream; ``decode(encode(x))`` equals the
    encoder's own reconstruction bit-exactly (asserted in tests).
    """
    samples = np.asarray(samples, dtype=np.int64).reshape(-1, n_channels)
    spb = (block_align - 4 * n_channels) * 2 // n_channels + 1
    n = len(samples)
    nblk = (n + spb - 1) // spb
    padded = np.empty((nblk * spb, n_channels), dtype=np.int64)
    padded[:n] = samples
    if nblk * spb > n:
        padded[n:] = samples[-1] if n else 0
    cube = padded.reshape(nblk, spb, n_channels)
    blocks = np.zeros((nblk, block_align), dtype=np.uint8)
    preds = cube[:, 0, :].copy()
    idxs = np.zeros((nblk, n_channels), dtype=np.int64)
    for c in range(n_channels):
        u = preds[:, c] & 0xFFFF
        blocks[:, 4 * c] = u & 0xFF
        blocks[:, 4 * c + 1] = u >> 8
        blocks[:, 4 * c + 2] = idxs[:, c]
    nibseq = np.zeros((nblk, spb - 1, n_channels), dtype=np.uint8)
    for s in range(1, spb):
        for c in range(n_channels):
            target = cube[:, s, c]
            step = _IMA_STEPS[idxs[:, c]]
            diff = target - preds[:, c]
            sign = (diff < 0).astype(np.int64) << 3
            mag = np.abs(diff)
            # standard successive-approximation nibble fit
            code = np.zeros(nblk, dtype=np.int64)
            rem = mag.copy()
            code |= np.where(rem >= step, 4, 0)
            rem = np.where(rem >= step, rem - step, rem)
            half = step >> 1
            code |= np.where(rem >= half, 2, 0)
            rem = np.where(rem >= half, rem - half, rem)
            quarter = step >> 2
            code |= np.where(rem >= quarter, 1, 0)
            nib = (sign | code).astype(np.int64)
            preds[:, c], idxs[:, c] = _ima_step_all(preds[:, c], idxs[:, c], nib)
            nibseq[:, s - 1, c] = nib
    body = np.zeros((nblk, block_align - 4 * n_channels), dtype=np.uint8)
    if n_channels == 1:
        nf = nibseq[:, :, 0]
        body[:] = (nf[:, 0::2] | (nf[:, 1::2] << 4))
    else:
        nwords = (spb - 1) // 8
        by = np.zeros((nblk, nwords * 4, n_channels), dtype=np.uint8)
        by[:] = nibseq[:, 0::2, :] | (nibseq[:, 1::2, :] << 4)
        body[:] = by.reshape(nblk, nwords, 4, n_channels).transpose(
            0, 1, 3, 2).reshape(nblk, -1)
    blocks[:, 4 * n_channels:] = body
    return blocks.tobytes(), spb


# --------------------------------------------------------------------------
# RIFF container
# --------------------------------------------------------------------------

_TAG_PCM, _TAG_FLOAT, _TAG_ALAW, _TAG_MULAW, _TAG_IMA = 1, 3, 6, 7, 0x11
_TAG_EXTENSIBLE = 0xFFFE

CODEC_TAGS = {
    "pcm8": _TAG_PCM, "pcm16": _TAG_PCM, "pcm24": _TAG_PCM, "pcm32": _TAG_PCM,
    "float32": _TAG_FLOAT, "alaw": _TAG_ALAW, "mulaw": _TAG_MULAW,
    "ima_adpcm": _TAG_IMA,
}


def _riff_chunks(payload: bytes) -> dict[bytes, bytes]:
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    chunks: dict[bytes, bytes] = {}
    pos = 12
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        chunks.setdefault(cid, payload[pos + 8:pos + 8 + size])
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    return chunks


def decode_wav(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """RIFF/WAVE → (sample_rate, n_channels, n_samples, float64 samples).

    Samples come back interleaved-flattened to shape (n_samples, nch)
    in [-1, 1) per the module normalization contract. Formats: PCM
    8/16/24/32, float32, A-law, µ-law, IMA ADPCM, plus
    WAVE_FORMAT_EXTENSIBLE wrapping any of them; anything else raises
    NotImplementedError (the declared audio boundary — MP3/AAC/FLAC
    need entropy coders out of scope for this round).
    """
    chunks = _riff_chunks(payload)
    fmt = chunks.get(b"fmt ")
    data = chunks.get(b"data")
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt/data chunk")
    tag, nch, rate, _brate, balign, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag == _TAG_EXTENSIBLE:
        if len(fmt) < 40:
            raise ValueError("extensible fmt too short")
        # SubFormat GUID: first 2 bytes are the wrapped format tag
        tag = struct.unpack_from("<H", fmt, 24)[0]
    fact_n = None
    if b"fact" in chunks and len(chunks[b"fact"]) >= 4:
        fact_n = struct.unpack_from("<I", chunks[b"fact"], 0)[0]

    if tag == _TAG_PCM:
        if bits == 8:
            arr = np.frombuffer(data, np.uint8).astype(np.float64)
            arr = (arr - 128.0) / 128.0
        elif bits == 16:
            arr = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, np.uint8).reshape(-1, 3).astype(np.int64)
            v = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            arr = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            arr = np.frombuffer(data, "<i4").astype(np.float64) / float(1 << 31)
        else:
            raise NotImplementedError(f"PCM {bits}-bit")
    elif tag == _TAG_FLOAT:
        if bits != 32:
            raise NotImplementedError(f"float {bits}-bit")
        arr = np.frombuffer(data, "<f4").astype(np.float64)
    elif tag in (_TAG_ALAW, _TAG_MULAW):
        codes = np.frombuffer(data, np.uint8)
        lin = alaw_decode_int(codes) if tag == _TAG_ALAW else mulaw_decode_int(codes)
        arr = lin.astype(np.float64) / 32768.0
    elif tag == _TAG_IMA:
        lin = ima_adpcm_decode(data, balign, nch, fact_n)
        return rate, nch, len(lin), lin.astype(np.float64) / 32768.0
    else:
        raise NotImplementedError(
            f"WAV format tag 0x{tag:X} (MP3/AAC/FLAC are the declared "
            "audio codec boundary)")
    if nch > 1:
        arr = arr[: (len(arr) // nch) * nch].reshape(-1, nch)
    else:
        arr = arr.reshape(-1, 1)
    if fact_n is not None:
        arr = arr[:fact_n]
    return rate, nch, len(arr), arr


def encode_wav(
    samples: np.ndarray,
    sample_rate: int,
    codec: str = "pcm16",
    *,
    block_align: int = 256,
) -> bytes:
    """Encode int16-domain samples (n,) or (n, nch) — float64 in
    [-1, 1) for ``codec="float32"`` — into a canonical WAVE payload.

    Canonical layout (pinned so oracles get a closed-form n_bytes):
    12-byte RIFF/WAVE + fmt (16-byte payload for PCM, 18 with cbSize=0
    otherwise) + a fact chunk (12 bytes) for every non-PCM codec +
    data (+1 pad byte when odd). So: PCM → 44 + data; non-PCM →
    58 + data (+pad).
    """
    if codec not in CODEC_TAGS:
        raise ValueError(codec)
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s.reshape(-1, 1)
    n, nch = s.shape
    tag = CODEC_TAGS[codec]
    if codec == "pcm8":
        data = ((s.astype(np.int64) + 32768) >> 8).astype(np.uint8).tobytes()
        bits, balign = 8, nch
    elif codec == "pcm16":
        data = s.astype("<i2").tobytes()
        bits, balign = 16, 2 * nch
    elif codec == "pcm24":
        v = s.astype(np.int64) & 0xFFFFFF
        raw = np.empty((n, nch, 3), dtype=np.uint8)
        raw[..., 0], raw[..., 1], raw[..., 2] = v & 0xFF, (v >> 8) & 0xFF, v >> 16
        data = raw.tobytes()
        bits, balign = 24, 3 * nch
    elif codec == "pcm32":
        data = s.astype("<i4").tobytes()
        bits, balign = 32, 4 * nch
    elif codec == "float32":
        data = s.astype("<f4").tobytes()
        bits, balign = 32, 4 * nch
    elif codec in ("mulaw", "alaw"):
        data = g711_encode(s.ravel(), codec).tobytes()
        bits, balign = 8, nch
    else:  # ima_adpcm
        data, spb = ima_adpcm_encode(s, block_align, nch)
        bits, balign = 4, block_align
    pad = b"\x00" if len(data) & 1 else b""

    if tag == _TAG_PCM:
        fmt = struct.pack("<HHIIHH", tag, nch, sample_rate,
                          sample_rate * balign, balign, bits)
        fact = b""
    else:
        fmt = struct.pack("<HHIIHHH", tag, nch, sample_rate,
                          sample_rate * balign if codec != "ima_adpcm"
                          else (sample_rate * block_align // max(
                              1, (block_align - 4 * nch) * 2 // nch + 1)),
                          balign, bits, 0)
        fact = b"fact" + struct.pack("<I", 4) + struct.pack("<I", n)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt + fact
            + b"data" + struct.pack("<I", len(data)) + data + pad)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def wav_n_bytes(codec: str, n_samples: int, n_channels: int,
                block_align: int = 256) -> int:
    """Closed-form payload size of :func:`encode_wav` (oracle helper)."""
    if codec == "pcm8":
        data = n_samples * n_channels
    elif codec == "pcm16":
        data = 2 * n_samples * n_channels
    elif codec == "pcm24":
        data = 3 * n_samples * n_channels
    elif codec in ("pcm32", "float32"):
        data = 4 * n_samples * n_channels
    elif codec in ("mulaw", "alaw"):
        data = n_samples * n_channels
    elif codec == "ima_adpcm":
        spb = (block_align - 4 * n_channels) * 2 // n_channels + 1
        data = ((n_samples + spb - 1) // spb) * block_align
    else:
        raise ValueError(codec)
    base = 44 if codec.startswith("pcm") else 58
    return base + data + (data & 1)


# --------------------------------------------------------------------------
# Actor-pool decode stage (audio twin of multimodal.decode_media)
# --------------------------------------------------------------------------

AUDIO_FEATURE_DIM = 16


class AudioDecoder:
    """Actor-pool stage: WAVE payload → (sample_rate, n_channels,
    n_samples, n_bytes, feature list<float>[16]) where feature is the
    L1-normalized 16-bin amplitude histogram over [-1, 1) — the same
    feature contract as ``MediaDecoder``'s WAV path, plus the decoded
    sample count the generic path cannot carry.
    """

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payloads = tbl[self.payload_col].to_pylist()
        k = len(payloads)
        rate = np.empty(k, np.int32)
        nch = np.empty(k, np.int32)
        nsamp = np.empty(k, np.int64)
        nbytes = np.empty(k, np.int64)
        feats = np.empty((k, AUDIO_FEATURE_DIM), np.float64)
        for i, p in enumerate(payloads):
            r, c, n, arr = decode_audio_any(p)
            rate[i], nch[i], nsamp[i], nbytes[i] = r, c, n, len(p)
            f = np.histogram(arr.ravel(), bins=AUDIO_FEATURE_DIM,
                             range=(-1.0, 1.0))[0].astype(np.float64)
            s = f.sum()
            feats[i] = f / s if s else f
        tbl = tbl.drop_columns([self.payload_col])
        tbl = tbl.append_column("sample_rate", pa.array(rate))
        tbl = tbl.append_column("n_channels", pa.array(nch))
        tbl = tbl.append_column("n_samples", pa.array(nsamp))
        tbl = tbl.append_column("n_bytes", pa.array(nbytes))
        tbl = tbl.append_column(
            "feature",
            pa.FixedSizeListArray.from_arrays(pa.array(feats.ravel()),
                                              AUDIO_FEATURE_DIM))
        return tbl


def decode_audio(
    ds: ray.data.Dataset,
    *,
    payload_col: str = "payload",
    batch_size: int = 64,
    concurrency: tuple[int, int] = (1, 8),
    num_cpus: float = 1,
) -> ray.data.Dataset:
    """Audio twin of ``decode_media``: small batches (payloads are
    fat), actor pool so any per-format state is built once."""
    return ds.map_batches(
        AudioDecoder,
        fn_constructor_kwargs={"payload_col": payload_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


# --------------------------------------------------------------------------
# AIFF (big-endian PCM, 80-bit extended sample rate) and AU (Sun/NeXT)
# --------------------------------------------------------------------------

def _f80_encode(rate: int) -> bytes:
    """Sample rate → IEEE 754 80-bit extended, big-endian (AIFF COMM).
    Positive integers only (sample rates): exponent 16383+k with the
    explicit integer bit set."""
    if rate <= 0:
        raise ValueError(rate)
    k = rate.bit_length() - 1
    mant = rate << (63 - k)  # integer bit at position 63
    return struct.pack(">HQ", 16383 + k, mant)


def _f80_decode(b: bytes) -> int:
    exp, mant = struct.unpack(">HQ", b[:10])
    if exp & 0x8000:
        raise ValueError("negative AIFF sample rate")
    e = exp - 16383 - 63
    return int(mant * (2.0 ** e)) if e < 0 else mant << e


def decode_aiff(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """AIFF → (rate, nch, n_samples, float64 (n, nch) in [-1, 1)).
    Big-endian signed PCM 8/16/24/32 per the public AIFF-1.3 spec."""
    if payload[:4] != b"FORM" or payload[8:12] != b"AIFF":
        raise ValueError("not an AIFF payload")
    pos, end = 12, min(len(payload), 8 + struct.unpack_from(">I", payload, 4)[0])
    comm = ssnd = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        size = struct.unpack_from(">I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        pos += 8 + size + (size & 1)
    if comm is None or ssnd is None:
        raise ValueError("AIFF missing COMM/SSND")
    nch, nframes, bits = struct.unpack_from(">hIh", comm, 0)
    rate = _f80_decode(comm[8:18])
    off, _blk = struct.unpack_from(">II", ssnd, 0)
    data = ssnd[8 + off:]
    if bits == 8:
        arr = np.frombuffer(data, np.int8).astype(np.float64) / 128.0
    elif bits == 16:
        arr = np.frombuffer(data, ">i2").astype(np.float64) / 32768.0
    elif bits == 24:
        raw = np.frombuffer(data, np.uint8).reshape(-1, 3).astype(np.int64)
        v = (raw[:, 0] << 16) | (raw[:, 1] << 8) | raw[:, 2]
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        arr = v.astype(np.float64) / float(1 << 23)
    elif bits == 32:
        arr = np.frombuffer(data, ">i4").astype(np.float64) / float(1 << 31)
    else:
        raise NotImplementedError(f"AIFF {bits}-bit")
    arr = arr[: nframes * nch].reshape(-1, nch)
    return rate, nch, len(arr), arr


def encode_aiff(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """int-domain samples (n,) or (n, nch) → canonical AIFF payload:
    12-byte FORM/AIFF + COMM (8+18) + SSND (8+8+data+pad) = 54 + data
    (+pad) — the closed form q112's oracle uses."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s.reshape(-1, 1)
    n, nch = s.shape
    if bits == 8:
        data = s.astype(np.int8).tobytes()
    elif bits == 16:
        data = s.astype(">i2").tobytes()
    elif bits == 24:
        v = s.astype(np.int64) & 0xFFFFFF
        raw = np.empty((n, nch, 3), dtype=np.uint8)
        raw[..., 0], raw[..., 1], raw[..., 2] = v >> 16, (v >> 8) & 0xFF, v & 0xFF
        data = raw.tobytes()
    elif bits == 32:
        data = s.astype(">i4").tobytes()
    else:
        raise ValueError(bits)
    pad = b"\x00" if len(data) & 1 else b""
    comm = struct.pack(">hIh", nch, n, bits) + _f80_encode(sample_rate)
    ssnd = struct.pack(">II", 0, 0) + data
    body = (b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd + pad)
    return b"FORM" + struct.pack(">I", 4 + len(body)) + b"AIFF" + body


def aiff_n_bytes(bits: int, n_samples: int, n_channels: int) -> int:
    data = (bits // 8) * n_samples * n_channels
    return 54 + data + (data & 1)


_AU_ENCODINGS = {1: "mulaw", 2: "pcm8", 3: "pcm16", 6: "float32"}
_AU_CODES = {v: k for k, v in _AU_ENCODINGS.items()}


def decode_au(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Sun/NeXT .au → (rate, nch, n_samples, float64 (n, nch)).
    Encodings: 1 µ-law, 2 signed PCM8, 3 PCM16 BE, 6 float32 BE."""
    if payload[:4] != b".snd":
        raise ValueError("not an AU payload")
    off, size, enc, rate, nch = struct.unpack_from(">IIIII", payload, 4)
    data = payload[off:off + size] if size != 0xFFFFFFFF else payload[off:]
    if enc == 1:
        lin = mulaw_decode_int(np.frombuffer(data, np.uint8))
        arr = lin.astype(np.float64) / 32768.0
    elif enc == 2:
        arr = np.frombuffer(data, np.int8).astype(np.float64) / 128.0
    elif enc == 3:
        arr = np.frombuffer(data, ">i2").astype(np.float64) / 32768.0
    elif enc == 6:
        arr = np.frombuffer(data, ">f4").astype(np.float64)
    else:
        raise NotImplementedError(f"AU encoding {enc}")
    arr = arr[: (len(arr) // nch) * nch].reshape(-1, nch)
    return rate, nch, len(arr), arr


def encode_au(samples: np.ndarray, sample_rate: int,
              codec: str = "pcm16") -> bytes:
    """Canonical AU payload: 24-byte header + data (no padding) —
    n_bytes = 24 + data, the q112 closed form."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s.reshape(-1, 1)
    n, nch = s.shape
    if codec == "mulaw":
        data = g711_encode(s.ravel(), "mulaw").tobytes()
    elif codec == "pcm8":
        data = s.astype(np.int8).tobytes()
    elif codec == "pcm16":
        data = s.astype(">i2").tobytes()
    elif codec == "float32":
        data = s.astype(">f4").tobytes()
    else:
        raise ValueError(codec)
    hdr = b".snd" + struct.pack(">IIIII", 24, len(data),
                                _AU_CODES[codec], sample_rate, nch)
    return hdr + data


def au_n_bytes(codec: str, n_samples: int, n_channels: int) -> int:
    per = {"mulaw": 1, "pcm8": 1, "pcm16": 2, "float32": 4}[codec]
    return 24 + per * n_samples * n_channels


def decode_audio_any(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Magic-sniffed audio decode: RIFF/WAVE, FORM/AIFF, .snd (AU),
    fLaC (the lossless compressed format, `functions/flac.py`)."""
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    if payload[:4] == b"FORM":
        return decode_aiff(payload)
    if payload[:4] == b".snd":
        return decode_au(payload)
    if payload[:4] == b"fLaC":
        from feast_ray.functions.flac import decode_flac

        return decode_flac(payload)
    raise NotImplementedError("unknown audio container")
