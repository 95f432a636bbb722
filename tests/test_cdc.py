"""Content-defined chunking suite: cover/contiguity invariants,
batch-vs-single purity (partition invariance), insertion resistance
vs fixed-size chunking, size bounds, empty/short docs, md5 parity
with DuckDB's substring semantics."""

import hashlib

import duckdb
import numpy as np
import pyarrow as pa

from feast_ray.functions.cdc import cdc_chunk_spans, cdc_chunks


def _texts():
    rng = np.random.default_rng(0)
    return ["".join(chr(97 + int(x)) for x in rng.integers(0, 26, ln))
            for ln in (0, 5, 300, 1200, 5000)]


def test_cover_contiguity_and_bounds():
    texts = _texts()
    for t, sp in zip(texts, cdc_chunk_spans(texts)):
        pos = 0
        for st, ln in sp:
            assert st == pos and 0 <= ln <= 1024
            pos += ln
        assert pos == len(t)
    # empty doc -> one empty chunk (md5('') well-defined both sides)
    assert cdc_chunk_spans([""]) == [[(0, 0)]]


def test_batch_invariance():
    texts = _texts()
    batched = cdc_chunk_spans(texts)
    for i, t in enumerate(texts):
        assert cdc_chunk_spans([t])[0] == batched[i]


def test_insertion_resistance_vs_fixed_size():
    t = _texts()[-1]
    t2 = t[:10] + "X" + t[10:]

    def hset(x):
        return {hashlib.md5(x[st:st + ln].encode()).hexdigest()
                for st, ln in cdc_chunk_spans([x])[0]}

    shared = len(hset(t) & hset(t2))
    assert shared >= len(hset(t)) - 2  # only the touched chunk changes
    fixed = lambda x: {hashlib.md5(x[i:i + 256].encode()).hexdigest()  # noqa: E731
                       for i in range(0, len(x), 256)}
    assert len(fixed(t) & fixed(t2)) == 0


def test_min_size_respected_between_candidates():
    for sp in cdc_chunk_spans(_texts()[2:]):
        # every non-final chunk must be >= min_size
        assert all(ln >= 32 for _st, ln in sp[:-1])


def test_kernel_and_duckdb_md5_parity_nonascii():
    text = "héllo wörld — ünïcode content defined chunking " * 40
    tbl = pa.table({"doc_id": pa.array([1], pa.int64()),
                    "text": pa.array([text])})
    out = cdc_chunks(tbl)
    con = duckdb.connect()
    for st, ln, h in zip(out["start"].to_pylist(), out["length"].to_pylist(),
                         out["chunk_hash"].to_pylist()):
        sql_h = con.execute(
            "select md5(substring(?, ?, ?))", [text, st + 1, ln]
        ).fetchone()[0]
        assert sql_h == h
