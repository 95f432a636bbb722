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
