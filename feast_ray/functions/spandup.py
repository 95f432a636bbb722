"""Exact duplicate-span removal (Lee-et-al-2021-style, n-gram
approximation).

"Deduplicating Training Data Makes Language Models Better" removes
repeated SUBSTRINGS, not just whole near-duplicate documents — the
boilerplate tail (cookie banners, license headers, navigation chrome)
that survives document-level dedup because the surrounding text
differs. The exact method is a corpus-wide suffix array; the standard
scalable approximation (used here) is span marking via duplicated word
n-grams:

* a span is *duplicated* when its word ``n``-gram occurs in ≥
  ``min_docs`` DISTINCT documents;
* the lowest ``id_col`` containing a gram is its *survivor* — that doc
  keeps the span (keep-first, the paper's "remove all but one");
* every other doc drops all tokens covered by any such gram
  occurrence; remaining tokens are rejoined with single spaces
  (whitespace is normalized as a side effect, exactly like the SQL
  oracle's ``\\S+`` tokenization).

Scale design — two thin passes, same doctrine as ``linedup.py``:

* pass A ships only per-block DISTINCT (gram, n_docs_partial,
  min_doc) rows (a doc's text lives in one row = one block, so
  distinct-doc counts sum across blocks); the wide step is ONE
  vectorized ``bucketed_group_reduce`` over the gram;
* the surviving dup-gram table (gram → survivor) broadcasts via
  ``ray.put`` as SORTED numpy arrays probed with ``searchsorted``
  (the dedup.py:223 doctrine — no per-task set deserialization);
* pass B is block-local: positional gram formation over the flat
  token buffer (ngrams.py's shape), one searchsorted, interval
  marking by a +1/-1 diff + cumsum, one grouped join per block.

Partitioning assumption (``mode="broadcast"``): the dup-gram table
fits the object store (boilerplate vocabularies grow sublinearly in
corpus size — the spans are duplicated by definition);
``max_broadcast_rows`` guards it. Past the cap, ``mode="copartition"``
keeps the dup table distributed: occurrences are Bloom-prefiltered
in-block (bits broadcast, not strings) and verified by an exact
partitioned hash join — see :func:`_strip_copartitioned`.

Matching: pass A and broadcast-mode pass B are exact n-gram STRINGS
(FP-free, SQL-oracle-checkable — q63); copartition-mode pass B keys
its exchange on 64-bit gram digests (collision odds ~(#grams)²/2^64 —
see :func:`remove_duplicate_spans`). Reference has no analog
(SURVEY.md §2 extension surface).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _tokenize_block(tbl: pa.Table, text_col: str):
    """flat token buffer + list offsets, ngrams.py's normalization
    (trim + collapse + single-space split ≡ SQL ``\\S+`` extraction,
    modulo the single empty token an empty doc produces — which can
    never join a gram and rejoins to '')."""
    txt = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(tbl[text_col], r"\s+", " ")
    )
    la = pc.split_pattern(txt, " ").combine_chunks()
    flat = la.flatten().to_pandas().to_numpy(dtype=object)
    offs = la.offsets.to_numpy()
    return flat, offs


def _gram_starts(flat: np.ndarray, offs: np.ndarray, n: int) -> np.ndarray:
    """Token positions where an n-gram fits inside its own doc."""
    lens = np.diff(offs)
    ends = np.repeat(offs[1:], lens)
    idx = np.arange(len(flat))
    return idx[idx + (n - 1) < ends]


def _gram_strings(flat: np.ndarray, start: np.ndarray, n: int) -> np.ndarray:
    grams = flat[start]
    for j in range(1, n):
        grams = grams + " "
        grams = grams + flat[start + j]
    return grams


def remove_duplicate_spans(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 4,
    min_docs: int = 2,
    out_col: str = "text_despanned",
    num_buckets: int = 64,
    max_broadcast_rows: int = 50_000_000,
    mode: str = "broadcast",
    bloom_bits: int = 1 << 24,
) -> ray.data.Dataset:
    """Append ``out_col``: the text with cross-document duplicated
    n-gram spans removed everywhere except the lowest-``id_col``
    containing doc. Triggers execution of pass A (the dup-gram
    reduce) at call time; pass B streams.

    ``mode="broadcast"`` (default): the dup-gram table collects to
    sorted arrays and broadcasts — right up to ``max_broadcast_rows``.
    ``mode="copartition"``: the beyond-broadcast regime. The dup table
    stays a distributed Dataset; pass B emits gram occurrences keyed
    by their 64-bit DIGEST (~4× fewer bytes than gram strings),
    prefiltered in-block by a Bloom filter built over the dup-gram
    digests (bits broadcast, not strings — false positives only add
    join rows, the partitioned digest join removes them), joins them
    with the dup table, reduces to per-doc cut lists, and joins those
    back to the docs. Three extra exchanges, none carrying document
    text more than once. Digest-collision caveat: two distinct grams
    sharing a 64-bit digest merge decisions (odds ~(#grams)²/2^64);
    broadcast mode stays string-exact (parity-tested on dup-bearing
    corpora)."""
    from feast_ray.stages.dedup import bucketed_group_reduce

    if n < 2:
        # the single empty token an empty doc produces would become a
        # phantom '' unigram (ngrams.py caveat); spans need n >= 2
        raise ValueError(f"span n-gram size must be >= 2, got {n}")

    def _partial(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "gram": pa.array([], pa.string()),
                "nd": pa.array([], pa.int64()),
                "md": pa.array([], pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        flat, offs = _tokenize_block(tbl, text_col)
        start = _gram_starts(flat, offs, n)
        if len(start) == 0:
            return empty
        lens = np.diff(offs)
        owner = np.repeat(tbl[id_col].to_numpy(), lens)[start]
        df = pd.DataFrame(
            {"gram": _gram_strings(flat, start, n), "doc": owner}
        ).drop_duplicates()
        agg = df.groupby("gram", sort=False)["doc"].agg(["size", "min"])
        return pa.table(
            {
                "gram": pa.array(agg.index.to_numpy(dtype=object), pa.string()),
                "nd": pa.array(agg["size"].to_numpy(), pa.int64()),
                "md": pa.array(agg["min"].to_numpy(), pa.int64()),
            }
        )

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "gram" not in df.columns:
            return pd.DataFrame({"gram": [], "nd": [], "md": []})
        g = df.groupby("gram", as_index=False, sort=False).agg(
            nd=("nd", "sum"), md=("md", "min")
        )
        return g[g["nd"] >= min_docs]

    dup = bucketed_group_reduce(
        ds.map_batches(_partial, batch_format="pyarrow"),
        ["gram"],
        _merge,
        num_buckets=num_buckets,
    )
    if mode == "copartition":
        return _strip_copartitioned(
            ds, dup, id_col, text_col, n, out_col, num_buckets, bloom_bits
        )
    ddf = dup.to_pandas()  # the reduced dup-gram table only
    if "gram" not in ddf.columns:  # gram-free corpus (all docs < n tokens)
        ddf = pd.DataFrame({"gram": [], "md": []})
    if len(ddf) > max_broadcast_rows:
        raise ValueError(
            f"{len(ddf)} duplicated grams exceeds the broadcast cap; "
            "co-partition grams and docs by gram hash (join.py doctrine)"
        )
    order = np.argsort(ddf["gram"].to_numpy(dtype=object))
    grams_ref = ray.put(ddf["gram"].to_numpy(dtype=object)[order])
    surv_ref = ray.put(ddf["md"].to_numpy(dtype=np.int64)[order])

    def _strip(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return tbl.append_column(out_col, pa.array([], pa.string()))
        G = ray.get(grams_ref)
        S = ray.get(surv_ref)
        flat, offs = _tokenize_block(tbl, text_col)
        lens = np.diff(offs)
        start = _gram_starts(flat, offs, n)
        s_sel = np.zeros(0, dtype=np.int64)
        if len(start) and len(G):
            grams = _gram_strings(flat, start, n)
            ix = np.searchsorted(G, grams)
            ix_c = np.minimum(ix, len(G) - 1)
            owner = np.repeat(tbl[id_col].to_numpy(), lens)[start]
            hit = (G[ix_c] == grams) & (S[ix_c] != owner)
            s_sel = start[hit]
        return _mark_and_rejoin(tbl, text_col, out_col, n, flat, offs, s_sel)

    return ds.map_batches(_strip, batch_format="pyarrow")


def _mark_and_rejoin(
    tbl: pa.Table,
    text_col: str,
    out_col: str,
    n: int,
    flat: np.ndarray,
    offs: np.ndarray,
    s_sel: np.ndarray,
) -> pa.Table:
    """Shared pass-B tail: mark [s, s+n) intervals over the flat token
    buffer (absolute token positions) and rejoin kept tokens per row."""
    lens = np.diff(offs)
    covered = np.zeros(len(flat), dtype=bool)
    if len(s_sel):
        diff = np.zeros(len(flat) + 1, dtype=np.int64)
        np.add.at(diff, s_sel, 1)
        np.add.at(diff, np.minimum(s_sel + n, len(flat)), -1)
        covered = np.cumsum(diff[:-1]) > 0
    keep = ~covered
    owner_row = np.repeat(np.arange(len(tbl)), lens)[keep]
    joined = pd.Series(flat[keep]).groupby(owner_row, sort=True).agg(" ".join)
    out = joined.reindex(np.arange(len(tbl))).fillna("").to_numpy(dtype=object)
    return tbl.append_column(out_col, pa.array(out, pa.string()))


def _strip_copartitioned(
    ds: ray.data.Dataset,
    dup: ray.data.Dataset,
    id_col: str,
    text_col: str,
    n: int,
    out_col: str,
    num_buckets: int,
    bloom_bits: int,
) -> ray.data.Dataset:
    """Pass B without broadcasting the dup-gram table — see
    :func:`remove_duplicate_spans` (mode="copartition")."""
    from feast_ray.functions.bloom import bloom_build
    from feast_ray.stages.dedup import bucketed_group_reduce
    from feast_ray.stages.join import hash_join

    dup_m = dup.materialize()  # consumed twice: bloom build + the join
    from feast_ray.functions.neardup import word_hashes64

    # the exchange is keyed on the 64-bit gram DIGEST, not the gram
    # string — ~4× fewer bytes per occurrence row through both the
    # prefilter and the join. Collision cost: two distinct grams
    # sharing a digest merge their dup/survivor decisions; odds
    # ~(#grams)²/2^64 (≈1e-8 even at 10^9 distinct grams) —
    # broadcast mode stays string-exact for the oracle-checked path.
    def _gh_col(t: pa.Table) -> pa.Table:
        if "gram" not in t.column_names:  # dup-free corpus: empty block
            return pa.schema(
                [("gh", pa.uint64()), ("md", pa.int64())]
            ).empty_table()
        gh = word_hashes64(t["gram"].to_pylist())
        return pa.table(
            {"gh": pa.array(gh, pa.uint64()), "md": t["md"]}
        )

    dup_sel = dup_m.map_batches(_gh_col, batch_format="pyarrow")
    bf = bloom_build(
        dup_sel, "gh", m_bits=bloom_bits, k=4, prehashed=True,
        # honor any power-of-two bloom_bits ≥ 64 without surfacing
        # bloom_build's m_bits % (64*segments) == 0 constraint
        num_segments=max(1, min(32, bloom_bits // 64)),
    )
    bits_ref = ray.put(bf.bits)
    bm, bk = bf.m, bf.k

    def _occ(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "gh": pa.array([], pa.uint64()),
                "doc": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        flat, offs = _tokenize_block(tbl, text_col)
        start = _gram_starts(flat, offs, n)
        if len(start) == 0:
            return empty
        lens = np.diff(offs)
        owner = np.repeat(tbl[id_col].to_numpy(), lens)[start]
        # WITHIN-doc token index so cut positions survive re-tokenizing
        rel = start - np.repeat(offs[:-1], lens)[start]
        gh = word_hashes64(list(_gram_strings(flat, start, n)))
        # in-block Bloom prefilter on the digests: only probable dup
        # occurrences enter the exchange
        from feast_ray.functions.bloom import BloomFilter

        keep = BloomFilter(
            m=bm, k=bk, bits=ray.get(bits_ref)
        ).contains_hashes(gh)
        return pa.table(
            {
                "gh": pa.array(gh[keep], pa.uint64()),
                "doc": pa.array(owner[keep], pa.int64()),
                "s": pa.array(rel[keep], pa.int64()),
            }
        )

    occ = ds.map_batches(_occ, batch_format="pyarrow")
    hits = hash_join(
        occ,
        dup_sel,
        on="gh",
        num_buckets=num_buckets,
        left_schema=pa.schema(
            [("gh", pa.uint64()), ("doc", pa.int64()), ("s", pa.int64())]
        ),
        right_schema=pa.schema([("gh", pa.uint64()), ("md", pa.int64())]),
    )
    cuts = hits.map_batches(
        lambda t: t.filter(
            pc.invert(pc.equal(t["doc"], t["md"]))
        ).select(["doc", "s"]),
        batch_format="pyarrow",
    )

    def _enc(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "doc" not in df.columns:
            return pd.DataFrame({id_col: pd.array([], dtype="int64"),
                                 "__cuts": pd.array([], dtype=object)})
        g = df.groupby("doc", sort=False)["s"].agg(
            lambda x: ",".join(map(str, sorted(set(x))))
        )
        return pd.DataFrame({id_col: g.index.to_numpy(dtype=np.int64),
                             "__cuts": g.to_numpy(dtype=object)})

    cuts_enc = bucketed_group_reduce(
        cuts.map_batches(
            lambda t: t.rename_columns(["doc", "s"]), batch_format="pyarrow"
        ),
        ["doc"],
        _enc,
        num_buckets=num_buckets,
    )
    joined = hash_join(
        ds,
        cuts_enc,
        on=id_col,
        how="left",
        num_buckets=num_buckets,
        right_schema=pa.schema([(id_col, pa.int64()), ("__cuts", pa.string())]),
    )

    def _strip(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            t = tbl.append_column(out_col, pa.array([], pa.string()))
            return t.drop_columns(["__cuts"])
        flat, offs = _tokenize_block(tbl, text_col)
        cuts_col = tbl["__cuts"].to_pylist()
        sel = []
        for i, c in enumerate(cuts_col):
            if c:
                sel.append(
                    np.array(c.split(","), dtype=np.int64) + offs[i]
                )
        s_sel = (
            np.concatenate(sel) if sel else np.zeros(0, dtype=np.int64)
        )
        out = _mark_and_rejoin(tbl, text_col, out_col, n, flat, offs, s_sel)
        return out.drop_columns(["__cuts"])

    return joined.map_batches(_strip, batch_format="pyarrow")
