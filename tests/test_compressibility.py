"""Compression-ratio quality signal (functions/compressibility.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from feast_ray.functions.compressibility import (
    ZLIB_LEVEL,
    compress_lengths,
    compress_stats,
    compressibility_bucket,
)


def test_lengths_match_zlib_and_buckets():
    import zlib

    import base64

    texts = ["", "a" * 500, "the quick brown fox " * 3,
             base64.b64encode(np.random.RandomState(0).bytes(300)).decode()]
    raw, comp = compress_lengths(texts)
    for t, r, c in zip(texts, raw, comp):
        b = t.encode("utf-8")
        assert r == len(b)
        assert c == len(zlib.compress(b, ZLIB_LEVEL))
    buckets = compressibility_bucket(raw, comp)
    assert buckets[0] == "empty"
    assert buckets[1] == "repetitive"  # 500x'a' compresses massively
    assert buckets[3] == "normal"      # pseudo-random stays large

    # cross-multiplied rule has no float: exact at the boundary
    assert compressibility_bucket(
        np.array([100]), np.array([40]))[0] == "mixed"   # 40*100 == 100*40
    assert compressibility_bucket(
        np.array([100]), np.array([39]))[0] == "repetitive"


def test_partition_invariance():
    """zlib is per-doc pure: the stage output is identical at 1 vs 5
    blocks, and the grouped sums match a driver recompute."""
    rng = np.random.RandomState(3)
    texts = [("word%d " % rng.randint(20)) * rng.randint(1, 60)
             for _ in range(200)]
    tbl = pa.table({"doc_id": pa.array(np.arange(200), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    outs = []
    for nb in (1, 5):
        ds = ray.data.from_arrow(tbl).repartition(nb)
        got = (ds.map_batches(lambda t: compress_stats(t, "text"),
                              batch_format="pyarrow")
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        outs.append(got[["doc_id", "raw_len", "comp_len", "comp_bucket"]])
    assert outs[0].equals(outs[1])
    raw, comp = compress_lengths(texts)
    assert np.array_equal(outs[0]["raw_len"].to_numpy(), raw)
    assert np.array_equal(outs[0]["comp_len"].to_numpy(), comp)
