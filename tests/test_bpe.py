"""BPE tokenizer (functions/bpe.py): merge learning determinism,
greedy encode correctness, distributed == sequential parity for the
fit, the per-doc counts and the global token table."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray.data

from feast_ray.functions.bpe import (
    BpeEncoder,
    bpe_encode_counts,
    bpe_fit,
    bpe_token_stats,
    bpe_train,
    bpe_word_counts,
    encode_word,
)


def _corpus(n=60):
    base = "low lower lowest newer newest wider wide news"
    return [
        {"doc_id": i, "text": (base + " extra%d" % (i % 5)) * (1 + i % 3)}
        for i in range(n)
    ]


def test_train_deterministic_and_classic():
    wc = pd.DataFrame({
        "word": ["hug", "pug", "pun", "bun", "hugs"],
        "n": [10, 5, 12, 4, 5],
    })
    m1 = bpe_train(wc, 3)
    m2 = bpe_train(wc.sample(frac=1.0, random_state=7), 3)
    assert m1 == m2  # input row order cannot matter
    # classic example: u+g = 20 (hug,pug,hugs) beats p+u 17 and u+n 16;
    # then u+n 16 beats h+ug 15; then h+ug
    assert m1 == [("u", "g"), ("u", "n"), ("h", "ug")]


def test_encode_word_greedy_rank_order():
    # rank 0 applies before rank 1 even when rank 1 appears first
    ranks = {("a", "b"): 1, ("b", "c"): 0}
    assert encode_word("abc", ranks) == ["a", "bc"]
    ranks2 = {("a", "b"): 0, ("ab", "c"): 1}
    assert encode_word("abc", ranks2) == ["abc"]
    assert encode_word("xyz", {}) == ["x", "y", "z"]
    assert encode_word("a", ranks) == ["a"]


def test_fit_matches_sequential_counter():
    docs = _corpus()
    ds = ray.data.from_items(docs).repartition(7)
    cnt = Counter()
    for d in docs:
        cnt.update(d["text"].split())
    ref_wc = pd.DataFrame({"word": list(cnt.keys()), "n": list(cnt.values())})
    ref = bpe_train(ref_wc, 20)
    got = bpe_fit(ds, 20, max_words=10_000)
    assert got == ref
    # word counts themselves are exact
    wc = bpe_word_counts(ds).to_pandas()
    assert dict(zip(wc["word"], wc["n"])) == dict(cnt)


def test_distributed_counts_and_stats_parity():
    docs = _corpus()
    ds = ray.data.from_items(docs).repartition(5)
    merges = bpe_fit(ds, 10, max_words=10_000)
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    enc = bpe_encode_counts(ds, merges).to_pandas().set_index("doc_id")
    for d in docs[:10]:
        words = d["text"].split()
        n_tok = sum(len(encode_word(w, ranks)) for w in words)
        assert enc.loc[d["doc_id"], "n_tokens"] == n_tok
        assert enc.loc[d["doc_id"], "n_words"] == len(words)

    cnt = Counter()
    for d in docs:
        cnt.update(d["text"].split())
    tok_ref: Counter = Counter()
    for w, c in cnt.items():
        for t in encode_word(w, ranks):
            tok_ref[t] += c
    stats = bpe_token_stats(ds, merges).to_pandas()
    assert dict(zip(stats["token"], stats["n"])) == dict(tok_ref)


def test_max_words_cap_matches_sorted_head():
    docs = _corpus()
    ds = ray.data.from_items(docs).repartition(3)
    # cap below the vocabulary size: the engine's distributed top-k cap
    # must select exactly the rows bpe_train's sorted head would
    cnt = Counter()
    for d in docs:
        cnt.update(d["text"].split())
    ref_wc = pd.DataFrame({"word": list(cnt.keys()), "n": list(cnt.values())})
    assert bpe_fit(ds, 8, max_words=5) == bpe_train(ref_wc, 8, max_words=5)


def test_encoder_empty_and_whitespace_docs():
    ds = ray.data.from_items(
        [{"doc_id": 0, "text": ""}, {"doc_id": 1, "text": "   "},
         {"doc_id": 2, "text": "ab ab"}]
    )
    merges = [("a", "b")]
    out = bpe_encode_counts(ds, merges).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_tokens"] == 0 and out.loc[1, "n_tokens"] == 0
    assert out.loc[2, "n_tokens"] == 2 and out.loc[2, "n_words"] == 2


def test_encoder_cache_consistency():
    merges = [("a", "b"), ("ab", "c")]
    enc = BpeEncoder(merges)
    import pyarrow as pa

    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["abc abc", "abc"], pa.string())})
    first = enc(t)
    second = enc(t)  # cache hit path
    assert first.equals(second)
    assert first["n_tokens"].to_pylist() == [2, 1]


def test_encoder_passthrough_columns():
    ds = ray.data.from_items(
        [{"doc_id": 0, "source": "s1", "text": "ab ab"},
         {"doc_id": 1, "source": "s2", "text": "a b c"}]
    )
    out = bpe_encode_counts(
        ds, [("a", "b")], passthrough=("source",)
    ).to_pandas().set_index("doc_id")
    assert out.loc[0, "source"] == "s1" and out.loc[0, "n_tokens"] == 2
    assert out.loc[1, "source"] == "s2" and out.loc[1, "n_tokens"] == 3
