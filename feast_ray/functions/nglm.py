"""Corpus-trained Kneser–Ney n-gram language model + CCNet-style
perplexity bucketing (Heafield 2011 "KenLM"; Wenzek et al. 2020
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data").

The north-star pipeline scores web pages with a *corpus-trained*
n-gram LM ("KenLM-style perplexity") and CCNet keeps/weights documents
by per-language head/middle/tail perplexity terciles. The static
seed-corpus model in ``perplexity.py`` covers the model-holding actor
shape; this module adds the trainable path end to end. (Reference
analog: the model-holding batch transform shape of
``sdk/python/feast/embedder.py:49-120`` — the LM itself is
extension-surface per SURVEY.md §2.)

Design — every piece reuses an existing doctrine:

* **Counting** (two distributed passes): unigram counts reuse
  ``bpe.bpe_word_counts`` (per-block ``value_counts`` partials →
  two-phase grouped sum — exact ints); bigram counts map every token
  to its vocab id (OOV → ``<unk>``) *inside* ``map_batches`` before
  counting, so the driver only ever sees the bounded (id, id, n)
  table, pruned to a deterministic top-M by (n desc, key asc) via the
  distributed ``topk`` when it could exceed the cap.
* **Smoothing** (interpolated KN, driver-side, deterministic): all
  inputs are exact integer counts; D = 0.75 is exact in binary; the
  float ratio/log10 chain is elementwise IEEE-754 double — the same
  model bytes from any partitioning (partition-invariance is
  unit-tested 2 vs 11 blocks).
* **Scoring** (the SQL-oracled part, q93's integer doctrine): log10
  probabilities quantize ONCE at train time to int64
  (``floor(2^20 · log10 p)``); a token's score is then a pure integer
  table lookup —

      first token of a doc      → cont_q[w]
      seen bigram (w1, w2)      → big_q[w1·V + w2]
      unseen w2, seen context   → back_q[w1] + cont_q[w2]
      unseen context            → cont_q[w2]

  and a document's ``lp_sum`` is an exact int64 segment sum
  (np.add.reduceat), with ``avg_nlp_q = (-lp_sum)·1000 // n_tokens``.
  DuckDB restates the whole chain verbatim from the dumped vocab /
  context / bigram tables — bit-equal, no float drift possible.
* **Bucketing** (CCNet head/middle/tail): per-language terciles of
  ``avg_nlp_q`` computed on a DETERMINISTIC hash sample
  (splitmix64(doc_id) % sample_mod == 0 — CCNet itself fits its
  quantiles on a sample, not the full crawl), dumped as a thresholds
  table the oracle applies with plain integer comparisons.

Scale shape: the model is built from two combiner-shape count passes
(the sample scoring pass reads only the sampled fraction), broadcast
once via ``ray.put`` and read once per actor in ``__init__``; corpus
scoring streams — no stage materializes the corpus. The bounded sides
are the vocab (top-V), the bigram table (top-M) and the threshold
sample (1/sample_mod of the corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from feast_ray.functions.bpe import _batch_words, bpe_word_counts
from feast_ray.functions.neardup import _splitmix64

_Q_SCALE = float(1 << 20)
UNK = "<unk>"


# ------------------------------------------------------------- training


def kn_vocab(word_counts: "pa.Table | pd.DataFrame", max_vocab: int) -> list[str]:
    """Top-``max_vocab`` words by (count desc, word asc) + ``<unk>``
    appended last. Ids are list positions."""
    if isinstance(word_counts, pa.Table):
        word_counts = word_counts.to_pandas()
    wc = word_counts.sort_values(
        ["n", "word"], ascending=[False, True], kind="stable"
    ).head(max_vocab)
    words = [w for w in wc["word"] if w != UNK]
    return words + [UNK]


def bigram_id_counts(
    ds: ray.data.Dataset,
    vocab: "list[str] | ray.ObjectRef",
    *,
    text_col: str = "text",
    max_bigrams: "int | None" = 262144,
) -> pa.Table:
    """Distributed (w1_id, w2_id, n) adjacent-pair counts with OOV →
    unk mapped inside each block (so rare-word blowup never leaves the
    map task). Bounded: pruned to ``max_bigrams`` by (n desc, w1 asc,
    w2 asc) through the distributed topk before the driver pull."""
    from feast_ray.stages.aggregate import AggSpec, grouped_agg
    from feast_ray.stages.relational import topk

    vref = ray.put(vocab) if not isinstance(vocab, ray.ObjectRef) else vocab

    class _Pairs:
        def __init__(self):
            v = ray.get(vref)
            self.word2id = {w: i for i, w in enumerate(v)}
            self.unk = len(v) - 1

        def __call__(self, tbl: pa.Table) -> pa.Table:
            empty = pa.table({
                "w1": pa.array([], pa.int64()),
                "w2": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
            if len(tbl) == 0:
                return empty
            words, _, doc_of = _batch_words(tbl, text_col)
            if len(words) < 2:
                return empty
            uniq, inv = np.unique(words, return_inverse=True)
            uid = np.fromiter(
                (self.word2id.get(w, self.unk) for w in uniq),
                np.int64, len(uniq),
            )
            ids = uid[inv]
            same = doc_of[1:] == doc_of[:-1]
            w1, w2 = ids[:-1][same], ids[1:][same]
            if len(w1) == 0:
                return empty
            key = w1 * np.int64(len(self.word2id) + 1) + w2
            vc = pd.Series(key).value_counts()
            k = vc.index.to_numpy(np.int64)
            V = np.int64(len(self.word2id) + 1)
            return pa.table({
                "w1": pa.array(k // V), "w2": pa.array(k % V),
                "n": pa.array(vc.to_numpy(np.int64)),
            })

    counts = grouped_agg(
        ds.map_batches(_Pairs, batch_format="pyarrow", concurrency=(1, 8)),
        ["w1", "w2"], [AggSpec("n", "sum", "n")],
    )
    if max_bigrams is not None:
        counts = topk(counts, ["n", "w1", "w2"], max_bigrams,
                      descending=[True, False, False])
    tbl = pa.concat_tables(
        ray.get(counts.to_arrow_refs()), promote_options="default"
    )
    return tbl.select(["w1", "w2", "n"])


def kn_train(
    vocab: list[str],
    bigrams: "pa.Table | pd.DataFrame",
    *,
    discount: float = 0.75,
) -> dict:
    """Interpolated Kneser–Ney bigram model from exact integer counts,
    quantized to the int64 score tables the scorer and the SQL oracle
    share. Deterministic: elementwise IEEE double ratio/log chain over
    sorted integer inputs."""
    if isinstance(bigrams, pa.Table):
        bigrams = bigrams.to_pandas()
    V = len(vocab)
    bg = bigrams.sort_values(["w1", "w2"], kind="stable")
    w1 = bg["w1"].to_numpy(np.int64)
    w2 = bg["w2"].to_numpy(np.int64)
    c12 = bg["n"].to_numpy(np.int64)

    c1 = np.zeros(V, np.int64)
    np.add.at(c1, w1, c12)
    n1p_fwd = np.zeros(V, np.int64)      # distinct continuations of w1
    np.add.at(n1p_fwd, w1, 1)
    n1p_bwd = np.zeros(V, np.int64)      # distinct contexts of w2
    np.add.at(n1p_bwd, w2, 1)
    n_types = len(bg)

    # continuation unigram, add-one over the vocab so every word
    # (incl. <unk>) has p > 0
    pc = (n1p_bwd + 1.0) / float(n_types + V)
    cont_q = np.floor(np.log10(pc) * _Q_SCALE).astype(np.int64)

    has_ctx = c1 > 0
    lam = np.zeros(V, np.float64)
    lam[has_ctx] = discount * n1p_fwd[has_ctx] / c1[has_ctx]
    back_q = np.zeros(V, np.int64)
    back_q[has_ctx] = np.floor(
        np.log10(lam[has_ctx]) * _Q_SCALE
    ).astype(np.int64)

    p12 = (c12 - discount) / c1[w1].astype(np.float64) + lam[w1] * pc[w2]
    big_q = np.floor(np.log10(p12) * _Q_SCALE).astype(np.int64)
    big_keys = w1 * np.int64(V) + w2
    order = np.argsort(big_keys, kind="stable")

    return {
        "vocab": list(vocab),
        "word2id": {w: i for i, w in enumerate(vocab)},
        "unk_id": V - 1,
        "V": V,
        "cont_q": cont_q,
        "has_ctx": has_ctx,
        "back_q": back_q,
        "big_keys": big_keys[order],
        "big_q": big_q[order],
    }


def kn_fit(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    max_vocab: int = 4096,
    max_bigrams: "int | None" = 262144,
    discount: float = 0.75,
) -> dict:
    """Two distributed count passes + the driver-side KN closure."""
    wc = pa.concat_tables(
        ray.get(bpe_word_counts(ds, text_col=text_col).to_arrow_refs()),
        promote_options="default",
    )
    vocab = kn_vocab(wc, max_vocab)
    bg = bigram_id_counts(ds, vocab, text_col=text_col,
                          max_bigrams=max_bigrams)
    return kn_train(vocab, bg, discount=discount)


# -------------------------------------------------------------- scoring


class KnScorer:
    """Callable actor class: per-document exact integer LM scores.
    Model tables load once per actor from the broadcast ref."""

    def __init__(self, model: "dict | ray.ObjectRef",
                 text_col: str = "text", id_col: str = "doc_id",
                 passthrough: "tuple[str, ...]" = ()):
        if isinstance(model, ray.ObjectRef):
            model = ray.get(model)
        self.word2id = model["word2id"]
        self.unk = model["unk_id"]
        self.V = model["V"]
        self.cont_q = model["cont_q"]
        self.has_ctx = model["has_ctx"]
        self.back_q = model["back_q"]
        self.big_keys = model["big_keys"]
        self.big_q = model["big_q"]
        self.text_col = text_col
        self.id_col = id_col
        self.passthrough = tuple(passthrough)

    def _token_scores(self, ids: np.ndarray, first: np.ndarray) -> np.ndarray:
        q = self.cont_q[ids].copy()
        mid = ~first
        if not mid.any():
            return q
        prev = np.empty_like(ids)
        prev[1:] = ids[:-1]
        pm, im = prev[mid], ids[mid]
        qm = self.cont_q[im].copy()
        ctx = self.has_ctx[pm]
        qm[ctx] += self.back_q[pm[ctx]]
        nk = len(self.big_keys)
        if nk:
            keys = pm * np.int64(self.V) + im
            pos = np.searchsorted(self.big_keys, keys)
            safe = np.minimum(pos, nk - 1)
            hit = self.big_keys[safe] == keys
            qm[hit] = self.big_q[safe[hit]]
        q[mid] = qm
        return q

    def __call__(self, tbl: pa.Table) -> pa.Table:
        n = len(tbl)
        lp = np.zeros(n, np.int64)
        n_words = np.zeros(n, np.int64)
        if n:
            words, _, doc_of = _batch_words(tbl, self.text_col)
            if len(words):
                np.add.at(n_words, doc_of, 1)
                uniq, inv = np.unique(words, return_inverse=True)
                uid = np.fromiter(
                    (self.word2id.get(w, self.unk) for w in uniq),
                    np.int64, len(uniq),
                )
                ids = uid[inv]
                first = np.ones(len(ids), bool)
                first[1:] = doc_of[1:] != doc_of[:-1]
                q = self._token_scores(ids, first)
                starts = np.flatnonzero(first)
                lp[doc_of[starts]] = np.add.reduceat(q, starts)
        avg = np.zeros(n, np.int64)
        nz = n_words > 0
        avg[nz] = (-lp[nz]) * 1000 // n_words[nz]
        idc = tbl[self.id_col]
        if pa.types.is_integer(idc.type):
            idc = idc.cast(pa.int64())
        return pa.table({
            self.id_col: idc,
            **{c: tbl[c] for c in self.passthrough},
            "n_tokens": pa.array(n_words),
            "lp_sum": pa.array(lp),
            "avg_nlp_q": pa.array(avg),
        })


def kn_score(
    ds: ray.data.Dataset,
    model: "dict | ray.ObjectRef",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    passthrough: "tuple[str, ...]" = (),
    concurrency: "int | tuple" = (1, 8),
) -> ray.data.Dataset:
    mref = model if isinstance(model, ray.ObjectRef) else ray.put(model)
    return ds.map_batches(
        KnScorer,
        fn_constructor_kwargs={
            "model": mref, "text_col": text_col, "id_col": id_col,
            "passthrough": tuple(passthrough),
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# ----------------------------------------------------------- bucketing


def sample_mask(doc_ids: np.ndarray, sample_mod: int) -> np.ndarray:
    """Deterministic CCNet threshold sample: splitmix64(doc_id) %
    sample_mod == 0. At crawl scale sample_mod ~ 1000 bounds the
    threshold fit to a driver-safe slice; tests use 2."""
    h = _splitmix64(doc_ids.astype(np.int64).view(np.uint64))
    return (h % np.uint64(sample_mod)) == 0


def kn_thresholds(
    sample: pd.DataFrame,
    langs: "list[str]",
    *,
    lang_col: str = "lang",
    score_col: str = "avg_nlp_q",
) -> pd.DataFrame:
    """Per-language tercile thresholds (t1, t2) of the sampled integer
    scores — ascending sort, t_i = v[ceil(i·k/3) − 1] — with a global
    fallback for languages the sample missed. Zero-token docs are
    excluded from the fit (they bucket 'head' by rule)."""
    sample = sample[sample["n_tokens"] > 0]

    def _terc(v: np.ndarray) -> "tuple[int, int]":
        v = np.sort(v.astype(np.int64))
        k = len(v)
        t1 = int(v[(k + 2) // 3 - 1])
        t2 = int(v[(2 * k + 2) // 3 - 1])
        return t1, t2

    g1, g2 = _terc(sample[score_col].to_numpy()) if len(sample) else (0, 0)
    rows = []
    for lang in sorted(set(langs)):
        sub = sample.loc[sample[lang_col] == lang, score_col].to_numpy()
        t1, t2 = _terc(sub) if len(sub) else (g1, g2)
        rows.append({"lang": lang, "t1": t1, "t2": t2})
    return pd.DataFrame(rows)


def ppl_bucket(
    scored: ray.data.Dataset,
    thresholds: pd.DataFrame,
    *,
    lang_col: str = "lang",
    score_col: str = "avg_nlp_q",
    out_col: str = "ppl_bucket",
) -> ray.data.Dataset:
    """head / middle / tail by the dumped integer thresholds
    (n_tokens == 0 → head)."""
    t1 = dict(zip(thresholds["lang"], thresholds["t1"].astype(np.int64)))
    t2 = dict(zip(thresholds["lang"], thresholds["t2"].astype(np.int64)))

    def _bucket(tbl: pa.Table) -> pa.Table:
        langs = tbl[lang_col].to_pandas().to_numpy(dtype=object)
        v = tbl[score_col].to_numpy()
        nt = tbl["n_tokens"].to_numpy()
        a1 = np.array([t1[x] for x in langs], np.int64)
        a2 = np.array([t2[x] for x in langs], np.int64)
        out = np.where(
            (nt == 0) | (v <= a1), "head",
            np.where(v <= a2, "middle", "tail"),
        )
        return tbl.append_column(out_col, pa.array(out, pa.string()))

    return scored.map_batches(_bucket, batch_format="pyarrow")
