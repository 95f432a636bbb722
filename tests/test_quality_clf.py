"""Trainable fastText-shape quality classifier
(functions/quality_clf.py): partition-invariant training, planted
separation recovery, heuristic distillation F1, and exact quantized
scoring."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from feast_ray.functions.quality_clf import (
    _batch_scores,
    clf_features,
    clf_fit,
    clf_quantize,
    clf_score,
)

BUCKETS = 1024


def _toy_corpus(n=600, seed=0):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        y = i % 2
        core = ["the", "quick", "brown", "fox"] if y else ["buy", "spam", "zzz", "pills"]
        filler = ["w%d" % rng.randint(40) for _ in range(8)]
        rows.append({
            "doc_id": i,
            "text": " ".join(core * 2 + filler),
            "label": y,
        })
    return rows


def test_fit_partition_invariant_bit_exact():
    rows = _toy_corpus()
    a = clf_features(ray.data.from_items(rows).repartition(2), buckets=BUCKETS)
    b = clf_features(ray.data.from_items(rows).repartition(11), buckets=BUCKETS)
    wa, ba = clf_fit(a, buckets=BUCKETS, iters=8, lr=2.0)
    wb, bb = clf_fit(b, buckets=BUCKETS, iters=8, lr=2.0)
    assert np.array_equal(wa, wb)
    assert ba == bb


def test_learns_planted_separation():
    rows = _toy_corpus()
    ds = ray.data.from_items(rows).repartition(4)
    feats = clf_features(ds, buckets=BUCKETS)
    w, b = clf_fit(feats, buckets=BUCKETS, iters=20, lr=2.0)
    lam, beta = clf_quantize(w, b)
    out = clf_score(ds, lam, beta).to_pandas()
    pred = (out["clf_score"].to_numpy() > 0).astype(int)
    y = (out["doc_id"].to_numpy() % 2).astype(int)
    tp = int(((pred == 1) & (y == 1)).sum())
    fp = int(((pred == 1) & (y == 0)).sum())
    fn = int(((pred == 0) & (y == 1)).sum())
    f1 = 2 * tp / max(2 * tp + fp + fn, 1)
    assert f1 >= 0.99  # the north-rule keep/drop bar
    assert out["clf_keep"].to_numpy().sum() == pred.sum()


def test_quantized_scores_match_float_margins():
    rows = _toy_corpus(n=200)
    ds = ray.data.from_items(rows).repartition(3)
    feats = clf_features(ds, buckets=BUCKETS)
    w, b = clf_fit(feats, buckets=BUCKETS, iters=6, lr=2.0)
    lam, beta = clf_quantize(w, b)
    scored = clf_score(ds, lam, beta).to_pandas().set_index("doc_id")
    ftab = feats.to_pandas()
    tbl = pa.Table.from_pandas(ftab)
    m = _batch_scores(tbl, w, b)
    # fixed-point scores approximate 2^20 × float margin to within the
    # rounding budget: one gram instance contributes ≤ 0.5 ulp each
    n_inst = np.array([len(x) and int(np.sum(x)) for x in ftab["fc"]])
    got = scored.loc[ftab["doc_id"].to_numpy(), "clf_score"].to_numpy()
    err = np.abs(got - (1 << 20) * m)
    assert np.all(err <= 0.5 * (n_inst + 1) + 1)


def test_distills_heuristic_labels(sf_small):
    from feast_ray.functions.textstats import apply_quality_rules, compute_textstats
    from feast_ray.sources.parquet import read_table

    docs = read_table(sf_small, "documents", columns=["doc_id", "text"])
    labeled = docs.map_batches(
        lambda t: compute_textstats(t, "text"), batch_format="pyarrow"
    ).map_batches(apply_quality_rules, batch_format="pyarrow")
    labeled = labeled.map_batches(
        lambda t: t.select(["doc_id", "text"]).append_column(
            "label", t["keep"].cast(pa.int8())
        ),
        batch_format="pyarrow",
    )
    y = labeled.to_pandas().set_index("doc_id")["label"]
    feats = clf_features(labeled, buckets=4096)
    w, b = clf_fit(feats, buckets=4096, iters=40, lr=4.0)
    lam, beta = clf_quantize(w, b)
    out = clf_score(docs, lam, beta).to_pandas().set_index("doc_id")
    pred = (out["clf_score"] > 0).astype(int)
    acc = float((pred == y.loc[pred.index]).mean())
    assert acc >= 0.95  # distillation of the q16 heuristic


def test_empty_and_degenerate_inputs():
    ds = ray.data.from_items(
        [{"doc_id": 0, "text": "   ", "label": 1},
         {"doc_id": 1, "text": "", "label": 0}]
    )
    feats = clf_features(ds, buckets=64)
    w, b = clf_fit(feats, buckets=64, iters=4, lr=1.0)
    assert np.all(w == 0.0)  # no grams → only the bias moves
    lam, beta = clf_quantize(w, b)
    out = clf_score(ds, lam, beta).to_pandas()
    assert (out["clf_score"] == beta).all()


def test_all_same_label_converges_to_bias():
    ds = ray.data.from_items(
        [{"doc_id": i, "text": "hello world", "label": 1} for i in range(20)]
    )
    feats = clf_features(ds, buckets=64)
    w, b = clf_fit(feats, buckets=64, iters=40, lr=2.0)
    lam, beta = clf_quantize(w, b)
    out = clf_score(ds, lam, beta).to_pandas()
    assert (out["clf_keep"]).all()
