"""KenLM-style n-gram perplexity — stateful actor-pool stage.

KenLM itself is not in the sandbox; the stand-in is a byte-trigram
language model with add-one smoothing trained once per actor on a
fixed, embedded English seed corpus — deterministic across processes
and rounds. Scoring is fully vectorized: UTF-8 bytes → uint32 trigram
ids → log-prob lookup via a dense (sorted-key searchsorted) table, so
the hot loop is numpy, not Python.

Execution shape = the reference's model-holding batch transform
(feast/embedder.py:49-120, ray_transformation.py:30-74): build in
``__init__``, score in ``__call__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SEED_CORPUS = (
    "the quick brown fox jumps over the lazy dog and the small stream runs "
    "down to the wide river where the old mill stands by the stone bridge "
    "data systems read and write large tables of rows and columns while the "
    "query engine sorts filters joins and aggregates the values in each "
    "partition of the distributed store the workers scan blocks in parallel "
    "and merge partial results into a final answer that the user can read "
    "a good sentence has common words like the and of to in is it that for "
    "language models assign high probability to fluent text and low "
    "probability to random strings of rare symbols or repeated noise "
    "the pipeline keeps documents whose text looks like natural language "
    "and drops pages full of markup fragments numbers or gibberish tokens"
)


class PerplexityModel:
    """Callable actor class: appends a ``ppl`` float column (byte-level
    perplexity; lower = more fluent relative to the seed corpus)."""

    def __init__(self, text_col: str = "text", corpus: str = _SEED_CORPUS, add_k: float = 1.0):
        self.text_col = text_col
        data = np.frombuffer(corpus.encode("utf-8"), dtype=np.uint8).astype(np.uint32)
        tri = (data[:-2] << 16) | (data[1:-1] << 8) | data[2:]
        bi = (data[:-1] << 8) | data[1:]
        tri_keys, tri_counts = np.unique(tri, return_counts=True)
        bi_keys, bi_counts = np.unique(bi, return_counts=True)
        self.V = 256.0
        self.add_k = add_k
        self.tri_keys, self.tri_counts = tri_keys, tri_counts.astype(np.float64)
        self.bi_keys, self.bi_counts = bi_keys, bi_counts.astype(np.float64)
        # dense O(1) log-prob table, built once per actor: the trigram
        # id's PRECOMPUTED logp — log((c_tri + k) / (c_bi + k·V)) where
        # the bigram prefix is tri >> 8 — as 2^24 float64 (128 MiB).
        # One gather + segment-mean is the whole hot path; the per-batch
        # add/div/log chain over the concatenated byte stream (the r2
        # shape) was ~40% of the fused scorer's CPU. float64 table so
        # the values are BIT-IDENTICAL to computing the chain per batch
        # (same float64 ratio + same libm log) — the q24/q28 oracles
        # compare keep decisions at the MAX_PPL threshold, so a float32
        # table's rounding could flip borderline docs.
        # dense PRECOMPUTED log-prob table: logp_dense[t] =
        # log((c_tri[t]+k)/(c_bi[t>>8]+k·V)) as 2^24 float64 (128 MiB
        # per worker — "the model in memory", amortized by worker-
        # process reuse exactly like an actor pool). Built from the
        # seed model's SPARSITY: all but ~7e2 ids share their
        # bigram-prefix value, so one 2^16 log + one repeat writes the
        # table in a single streaming pass (a full 2^24
        # gather/div/log chain measured ~4 s on this box), then the
        # seed trigrams are patched with the identical elementwise
        # formula. Every entry is bit-equal to computing the add/div/
        # log chain per batch (same float64 inputs, same libm), so the
        # q24/q28 oracles — which compare keep decisions at the
        # MAX_PPL threshold — stay exact. Hot path becomes ONE gather
        # (measured 3× over the per-batch chain, 6× over the two-level
        # cache-resident variant whose seed-override searchsorted
        # dominated).
        # built ONCE PER NODE and memory-mapped by every worker (the
        # page cache is the shared copy — N workers cold-starting in
        # parallel would otherwise serialize on N×128 MiB of writes):
        # atomic tmp+rename publish, content-keyed filename, parallel
        # builders are idempotent (deterministic bytes, last rename
        # wins). This is the 100 TB shape for node-local model state.
        import hashlib
        import os
        import tempfile

        key = hashlib.blake2b(
            f"{corpus}|{add_k}".encode(), digest_size=10
        ).hexdigest()
        cache = os.path.join(
            tempfile.gettempdir(), f"feast_ray_ppl_logp_{key}.npy"
        )
        if not os.path.exists(cache):
            bi_dense = np.zeros(1 << 16, dtype=np.float64)
            bi_dense[bi_keys] = bi_counts
            logp = np.repeat(
                np.log((0.0 + add_k) / (bi_dense + add_k * self.V)), 256
            )
            logp[tri_keys] = np.log(
                (tri_counts + add_k)
                / (bi_dense[tri_keys >> np.uint32(8)] + add_k * self.V)
            )
            fd, tmp = tempfile.mkstemp(
                dir=tempfile.gettempdir(), suffix=".npy.tmp"
            )
            with os.fdopen(fd, "wb") as f:
                np.save(f, logp)  # file OBJECT: no .npy suffix appended
            os.replace(tmp, cache)
        self.logp_dense = np.load(cache, mmap_mode="r")

    def _lookup(self, keys: np.ndarray, table_keys: np.ndarray, table_vals: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(table_keys, keys)
        idx = np.clip(idx, 0, len(table_keys) - 1)
        hit = table_keys[idx] == keys
        return np.where(hit, table_vals[idx], 0.0)

    def score(self, text: str) -> float:
        b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint32)
        if len(b) < 3:
            return float(self.V)
        tri = (b[:-2] << 16) | (b[1:-1] << 8) | b[2:]
        bi = (b[:-2] << 8) | b[1:-1]
        c_tri = self._lookup(tri, self.tri_keys, self.tri_counts)
        c_bi = self._lookup(bi, self.bi_keys, self.bi_counts)
        logp = np.log((c_tri + self.add_k) / (c_bi + self.add_k * self.V))
        return float(np.exp(-logp.mean()))

    def score_batch(self, texts: list[str]) -> np.ndarray:
        """Vectorized scoring: ONE trigram/bigram lookup over the
        concatenated byte stream of the whole batch, then per-document
        segment means via add.reduceat — no per-doc numpy call chain."""
        encoded = [t.encode("utf-8") for t in texts]
        lens = np.array([len(b) for b in encoded], dtype=np.int64)
        out = np.full(len(texts), float(self.V))
        valid = lens >= 3
        if not valid.any():
            return out
        blob = np.frombuffer(b"".join(encoded), dtype=np.uint8).astype(np.uint32)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        tri = (blob[:-2] << 16) | (blob[1:-1] << 8) | blob[2:]
        logp = self.logp_dense[tri]  # one gather — the add/div/log
        # chain is baked into the table (bit-identical, see __init__)
        # zero out the 2 cross-document boundary trigrams per doc, then
        # segment-sum: doc i's trigrams live at [starts[i], starts[i]+len-2)
        csum = np.concatenate([[0.0], np.cumsum(logp)])
        for i in np.flatnonzero(valid):
            s = starts[i]
            e = s + lens[i] - 2
            out[i] = float(np.exp(-(csum[e] - csum[s]) / (lens[i] - 2)))
        return out

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        # Arrow in / Arrow out (see langid.py note)
        ppl = self.score_batch(batch[self.text_col].to_pylist())
        return batch.append_column("ppl", pa.array(ppl))
