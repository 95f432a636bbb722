"""Byte-pair-encoding tokenizer (Sennrich et al. 2016; the GPT-2-style
word-internal merge variant without an end-of-word marker), trained
distributed and applied streaming.

The reference counts tokens with a whitespace heuristic (SURVEY.md
§2.4); a real LLM-data pipeline needs the learned-subword version: a
BPE vocabulary fit on the corpus and exact per-document token counts
under it (sequence packing, budget sampling and mixture weights all
consume them). No reference implementation exists — this is
extension surface, composed from existing doctrines:

* **Word counts** (the training input) are the classic combiner shape:
  per-block `value_counts` partials → `grouped_agg` sum — one small
  row per distinct word per block crosses the network, never the
  corpus. At web scale the driver-side table is capped to the
  top-`max_words` words by count (`topk`, the bounded side — standard
  BPE practice; rare singleton words cannot win a merge anyway, they
  only truncate tail coverage).
* **Merge learning** is driver-side over that bounded word-frequency
  table (pair-count dict refresh per merge; `n_merges` ≤ a few
  thousand). Deterministic tie-break: count desc, then lexicographic
  pair asc — bit-reproducible regardless of dict iteration order.
* **Encoding** streams through a stateful actor-pool stage
  (`BpeEncoder`): merge ranks are built once per actor in
  ``__init__``; per batch, only the batch's *unique* words are
  encoded (greedy lowest-rank-first merging, the GPT-2 algorithm) and
  an unbounded per-actor cache amortizes the word loop across batches
  — web text's word distribution is Zipfian, so the cache hit rate
  approaches 1 quickly.
* **Token stats** reuse the combiner shape on (token, count) partials.

Distributed == sequential parity is the q80 oracle doctrine: a
single-process reference recompute (collections.Counter → the same
trainer → per-word encode) is dumped to parquet and the engine's
distributed path must reproduce it exactly for any block layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _batch_words(tbl: pa.Table, text_col: str) -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
    """(flat word array, per-doc offsets, doc index of each word) —
    whitespace tokenization mirroring the ngrams/dsir doctrine
    (collapse ``\\s+`` → split; '' phantoms filtered)."""
    txt = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(tbl[text_col], r"\s+", " ")
    )
    la = pc.split_pattern(txt, " ").combine_chunks()
    flat = la.flatten().to_pandas().to_numpy(dtype=object)
    offs = la.offsets.to_numpy()
    lens = np.diff(offs)
    doc_of = np.repeat(np.arange(len(tbl)), lens)
    keep = flat != ""
    return flat[keep], offs, doc_of[keep]


def bpe_word_counts(
    ds: ray.data.Dataset, *, text_col: str = "text"
) -> ray.data.Dataset:
    """Distributed (word, n) counts: per-block partial counts, merged
    by the two-phase grouped sum."""
    from feast_ray.stages.aggregate import AggSpec, grouped_agg

    def _part(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        words, _, _ = _batch_words(tbl, text_col)
        vc = pd.Series(words).value_counts()
        return pa.table({
            "word": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
            "n": pa.array(vc.to_numpy(np.int64)),
        })

    return grouped_agg(
        ds.map_batches(_part, batch_format="pyarrow"),
        ["word"], [AggSpec("n", "sum", "n")],
    )


def bpe_train(
    word_counts: "pa.Table | pd.DataFrame",
    n_merges: int,
    *,
    max_words: int = 65536,
) -> "list[tuple[str, str]]":
    """Classic BPE merge learning over a bounded word-frequency table.
    Returns the ordered merge list. Deterministic: pairs are ranked by
    (count desc, pair lexicographic asc)."""
    if isinstance(word_counts, pa.Table):
        word_counts = word_counts.to_pandas()
    wc = word_counts.sort_values(
        ["n", "word"], ascending=[False, True], kind="stable"
    ).head(max_words)
    words: list[list[str]] = [list(w) for w in wc["word"]]
    counts = wc["n"].to_numpy(np.int64)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_n: dict = {}
        for sym, c in zip(words, counts):
            for a, b in zip(sym, sym[1:]):
                pair_n[(a, b)] = pair_n.get((a, b), 0) + int(c)
        if not pair_n:
            break
        best = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for sym in words:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == a and sym[i + 1] == b:
                    sym[i : i + 2] = [ab]
                else:
                    i += 1
    return merges


def encode_word(word: str, ranks: "dict[tuple[str, str], int]") -> "list[str]":
    """Greedy lowest-rank-first BPE encode of one word (the GPT-2
    algorithm): repeatedly merge the present pair with the smallest
    rank until none remains."""
    sym = list(word)
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


class BpeEncoder:
    """Actor-pool stage: per-doc token counts under a learned merge
    list. Ranks built once per actor; a per-actor word→n_tokens cache
    amortizes the merge loop across batches (Zipfian hit rate)."""

    def __init__(self, merges: "list[tuple[str, str]] | ray.ObjectRef",
                 text_col: str = "text", id_col: str = "doc_id",
                 passthrough: "tuple[str, ...]" = ()):
        if isinstance(merges, ray.ObjectRef):
            merges = ray.get(merges)
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.text_col = text_col
        self.id_col = id_col
        self.passthrough = tuple(passthrough)
        self._cache: dict[str, int] = {}

    def _n_tokens(self, word: str) -> int:
        n = self._cache.get(word)
        if n is None:
            n = len(encode_word(word, self.ranks))
            self._cache[word] = n
        return n

    def __call__(self, tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table({
                self.id_col: pa.array([], pa.int64()),
                **{c: tbl[c] for c in self.passthrough},
                "n_words": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
            })
        words, _, doc_of = _batch_words(tbl, self.text_col)
        uniq, inv = np.unique(words, return_inverse=True)
        per_uniq = np.fromiter(
            (self._n_tokens(w) for w in uniq), np.int64, count=len(uniq)
        )
        tok_of_word = per_uniq[inv]
        n_docs = len(tbl)
        n_words = np.bincount(doc_of, minlength=n_docs).astype(np.int64)
        n_tokens = np.bincount(
            doc_of, weights=tok_of_word, minlength=n_docs
        ).astype(np.int64)
        return pa.table({
            self.id_col: tbl[self.id_col].cast(pa.int64()),
            **{c: tbl[c] for c in self.passthrough},
            "n_words": pa.array(n_words),
            "n_tokens": pa.array(n_tokens),
        })


class BpeTokenCounter(BpeEncoder):
    """Actor-pool stage emitting sparse per-block (token, n) partials
    for the global token-frequency table (combiner shape — merged by
    grouped_agg downstream)."""

    def __init__(self, merges, text_col: str = "text"):
        super().__init__(merges, text_col=text_col)
        self._tok_cache: dict[str, list[str]] = {}

    def _tokens(self, word: str) -> "list[str]":
        t = self._tok_cache.get(word)
        if t is None:
            t = encode_word(word, self.ranks)
            self._tok_cache[word] = t
        return t

    def __call__(self, tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        words, _, _ = _batch_words(tbl, self.text_col)
        uniq, cnt = np.unique(words, return_counts=True)
        agg: dict[str, int] = {}
        for w, c in zip(uniq, cnt):
            for t in self._tokens(w):
                agg[t] = agg.get(t, 0) + int(c)
        toks = sorted(agg)
        return pa.table({
            "token": pa.array(toks, pa.string()),
            "n": pa.array([agg[t] for t in toks], pa.int64()),
        })


def bpe_fit(
    ds: ray.data.Dataset,
    n_merges: int,
    *,
    text_col: str = "text",
    max_words: int = 65536,
) -> "list[tuple[str, str]]":
    """Distributed word counts (bounded by a per-block-partial top-k
    merge to ``max_words``) → driver-side merge learning."""
    from feast_ray.stages.relational import topk

    wc = bpe_word_counts(ds, text_col=text_col)
    bounded = topk(wc, ["n", "word"], max_words, descending=[True, False])
    return bpe_train(bounded.to_pandas(), n_merges, max_words=max_words)


def bpe_token_stats(
    ds: ray.data.Dataset,
    merges: "list[tuple[str, str]]",
    *,
    text_col: str = "text",
    concurrency: "int | tuple" = (1, 4),
) -> ray.data.Dataset:
    """Global (token, n) frequency table under the learned merges."""
    from feast_ray.stages.aggregate import AggSpec, grouped_agg

    mref = ray.put(merges)
    parts = ds.map_batches(
        BpeTokenCounter,
        fn_constructor_kwargs={"merges": mref, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    return grouped_agg(parts, ["token"], [AggSpec("n", "sum", "n")])


def bpe_encode_counts(
    ds: ray.data.Dataset,
    merges: "list[tuple[str, str]]",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    passthrough: "tuple[str, ...]" = (),
    concurrency: "int | tuple" = (1, 4),
) -> ray.data.Dataset:
    """Per-document (n_words, n_tokens) under the learned merges —
    the streaming scoring pass."""
    mref = ray.put(merges)
    return ds.map_batches(
        BpeEncoder,
        fn_constructor_kwargs={
            "merges": mref, "text_col": text_col, "id_col": id_col,
            "passthrough": tuple(passthrough),
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
