"""Sequence packing: assign documents to fixed token-budget training
bins (context windows).

LLM pretraining consumes documents as a concatenated token stream
chopped into fixed-size context windows ("concat-and-chop" packing —
the standard GPT-style data layout). The operator that prepares this
layout at corpus scale tags every document with the window its first
token falls into, given a deterministic document order within each
stream partition:

    prefix  = sum(n_tokens of earlier docs in the partition)
    bin_id  = prefix // budget        # which context window it starts in
    offset  = prefix %  budget        # where inside that window

The reference has no analog — this is part of the LLM-training-data
surface this engine adds on top of the reference's operator set
(SURVEY.md §2 extension), alongside dedup/quality/decontamination.

Scale design: a per-group running sum cannot pre-reduce per block (the
prefix needs every earlier row), so the whole group must co-locate —
ONE hash(group) % num_buckets shuffle, then one vectorized pandas
sort + grouped cumsum per bucket (``bucketed_group_reduce``, never a
Python call per group). Partitioning assumption: one stream
partition's (doc_id, n_tokens) rows fit in a worker's heap — these
are thin rows (text stays behind; join it back by id at write time),
so even a billion-doc stream partition is ~16 GB and real corpora
shard streams far smaller. Greedy first-fit/best-fit packers trade
determinism for less padding; concat-and-chop has zero padding by
construction, which is why production pretraining pipelines use it.
"""

from __future__ import annotations

import pandas as pd
import ray.data


def pack_sequences(
    ds: ray.data.Dataset,
    group_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
    *,
    num_buckets: int = 64,
    bin_col: str = "bin_id",
    offset_col: str = "bin_offset",
) -> ray.data.Dataset:
    """Tag every row with its concat-and-chop context-window id and
    in-window offset. ``ds`` must carry (group, order, token-count)
    columns; rows are packed independently per ``group_col`` stream in
    ``order_col`` order (make it a total order within every group)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    from feast_ray.stages.dedup import bucketed_group_reduce

    def _pack(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_col, order_col], kind="stable")
        csum = df.groupby(group_col, sort=False)[tokens_col].cumsum()
        prefix = (csum - df[tokens_col]).astype("int64")
        df = df.copy()
        df[bin_col] = prefix // budget
        df[offset_col] = prefix % budget
        return df

    return bucketed_group_reduce(ds, [group_col], _pack, num_buckets=num_buckets)
