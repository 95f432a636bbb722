"""Distributed Bloom filter: incremental dedup against an existing
corpus without a join.

The operation a 100 TB pipeline actually runs when a NEW crawl arrives:
"drop every document whose key we already ingested" — an anti-join
whose right side is the entire historical corpus. A shuffle anti-join
would move the full key set of both corpora; a Bloom filter moves a
fixed-size bit array instead. Build once over the corpus (mergeable
per-block partials — the sketch doctrine of ``sketches.py``), broadcast
via ``ray.put``, and every filter task answers membership locally.
False positives (old-looking new docs get dropped) at the standard
rate ``(1 - e^{-kn/m})^k``; false negatives never.

Scale design:

* **build** never moves raw keys: each block hashes its keys, expands
  to the k bit positions, dedupes in-block, and ships DISTINCT
  positions only (8 B each, ≤ k per distinct key). The wide step packs
  positions into disjoint dense segments — one vectorized
  ``bitwise_or.at`` per segment via ``bucketed_group_reduce`` — and
  the driver concatenates ``num_segments`` byte strings. Nothing
  driver-side ever sees a key.
* **probe** is a broadcast read: the packed filter is ``ray.put`` once
  and gathered zero-copy by every ``map_batches`` task; the check is
  three numpy gathers per batch.
* **limits**: one filter must fit the object store / worker heap
  (m ≤ 2^32 bits = 512 MB here). Beyond that — e.g. 10^10 keys at
  1% FP needs ~12 GB — hash-partition the keys into P independent
  filters and co-partition the probe side the same way (the same
  size-gating doctrine as join.py); this module is the per-partition
  primitive.

Hash family: ONE ``word_hashes64`` digest per key (Horner+splitmix64,
process-stable and SQL-reconstructable — q62's oracle re-derives
membership bit-exactly, false positives included) expanded to k
positions by Kirsch–Mitzenmacher double hashing::

    h1 = h mod m,  h2 = (h >> 33) * 2 + 1   (odd)
    pos_i = (h1 + i * h2) mod m             i = 0..k-1

Reference has no analog (SURVEY.md §2 extension surface; nearest is
the exact-dedup path, neardup.py:44).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from feast_ray.functions.neardup import word_hashes64


def bloom_positions(keys: "list[str]", m: int, k: int) -> np.ndarray:
    """(n, k) int64 bit positions for each key."""
    h = word_hashes64(keys)
    h1 = (h % np.uint64(m)).astype(np.int64)
    h2 = (((h >> np.uint64(33)) << np.uint64(1)) + np.uint64(1)).astype(
        np.int64
    )
    i = np.arange(k, dtype=np.int64)[None, :]
    return (h1[:, None] + i * h2[:, None]) % m


def _pack(rel: np.ndarray, nbits: int) -> np.ndarray:
    """Dense uint64 bitset of ``nbits`` with ``rel`` positions set."""
    arr = np.zeros(nbits // 64, dtype=np.uint64)
    np.bitwise_or.at(
        arr, rel >> 6, np.uint64(1) << (rel & 63).astype(np.uint64)
    )
    return arr


@dataclass
class BloomFilter:
    """Packed filter + its hash-family parameters."""

    m: int
    k: int
    bits: np.ndarray  # uint64[m // 64]

    def contains(self, keys: "list[str]") -> np.ndarray:
        """bool[n]: True = possibly present (all k bits set)."""
        if not keys:
            return np.zeros(0, dtype=bool)
        pos = bloom_positions(keys, self.m, self.k)
        word = self.bits[pos >> 6]
        hit = (word >> (pos & 63).astype(np.uint64)) & np.uint64(1)
        return hit.all(axis=1)

    @property
    def fill_ratio(self) -> float:
        return float(
            sum(int(w).bit_count() for w in self.bits.tolist())
        ) / self.m


def bloom_build(
    ds: ray.data.Dataset,
    key_col: str,
    *,
    m_bits: int = 1 << 22,
    k: int = 4,
    num_segments: int = 32,
) -> BloomFilter:
    """Build a Bloom filter over ``ds[key_col]`` distributed: in-block
    position dedup → segment shuffle (distinct positions only) → one
    vectorized pack per segment → driver concat of ``num_segments``
    byte payloads (total m/8 bytes — the only driver materialization).

    ``m_bits`` must be a multiple of 64 × num_segments and ≤ 2^32
    (single-filter regime; partition keys into multiple filters past
    that — see module docstring)."""
    if m_bits % (64 * num_segments):
        raise ValueError("m_bits must be a multiple of 64*num_segments")
    if m_bits > 1 << 32:
        raise ValueError("single filter capped at 2^32 bits; partition keys")
    seg_bits = m_bits // num_segments

    def _partial(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table({"pos": pa.array([], pa.int64())})
        keys = tbl[key_col].to_pylist()
        pos = np.unique(bloom_positions(keys, m_bits, k))
        return pa.table({"pos": pa.array(pos, pa.int64())})

    def _pack_segment(df: pd.DataFrame) -> pd.DataFrame:
        pos = np.unique(df["pos"].to_numpy(dtype=np.int64))
        seg = int(pos[0]) // seg_bits
        arr = _pack(pos - seg * seg_bits, seg_bits)
        return pd.DataFrame({"seg": [seg], "bits": [arr.tobytes()]})

    from feast_ray.stages.dedup import bucketed_group_reduce

    parts = ds.map_batches(_partial, batch_format="pyarrow").map_batches(
        # segment id doubles as the shuffle bucket: positions of one
        # segment land together, so each pack sees a contiguous range
        lambda t: t.append_column(
            "seg", pa.array(t["pos"].to_numpy() // seg_bits, pa.int64())
        ),
        batch_format="pyarrow",
    )
    segs = parts.groupby("seg").map_groups(
        lambda g: _pack_segment(g.drop(columns="seg")),
        batch_format="pandas",
    )
    bits = np.zeros(m_bits // 64, dtype=np.uint64)
    words = seg_bits // 64
    for row in segs.take_all():
        s = int(row["seg"])
        bits[s * words : (s + 1) * words] = np.frombuffer(
            row["bits"], dtype=np.uint64
        )
    return BloomFilter(m=m_bits, k=k, bits=bits)


def bloom_filter_new(
    ds: ray.data.Dataset,
    bloom: BloomFilter,
    key_col: str,
    *,
    member_col: str | None = None,
) -> ray.data.Dataset:
    """Probe side: keep only rows whose key is definitely NOT in the
    filter (the incremental-ingest semantics — members, including
    false positives, are dropped). With ``member_col`` set, instead
    append the boolean membership flag and keep every row (audit
    mode). The packed filter is ``ray.put`` once; tasks gather it
    zero-copy."""
    bits_ref = ray.put(bloom.bits)
    m, k = bloom.m, bloom.k

    def _probe(tbl: pa.Table) -> pa.Table:
        bf = BloomFilter(m=m, k=k, bits=ray.get(bits_ref))
        member = bf.contains(tbl[key_col].to_pylist())
        if member_col is not None:
            return tbl.append_column(member_col, pa.array(member))
        return tbl.filter(pa.array(~member))

    return ds.map_batches(_probe, batch_format="pyarrow")
