"""Property-based invariants (hypothesis) for the core reducers —
beyond the fixed oracles: for ANY generated frame, the distributed
operator must equal the single-process pandas re-derivation."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from feast_ray.functions.neardup import estimated_jaccard, minhash_signature


@st.composite
def keyed_frames(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    keys = draw(st.lists(st.integers(min_value=0, max_value=5), min_size=n, max_size=n))
    ts = draw(st.lists(st.integers(min_value=0, max_value=10), min_size=n, max_size=n))
    vals = list(range(n))
    return pd.DataFrame(
        {
            "k": keys,
            "event_ts": pd.to_datetime(ts, unit="h", origin="2024-01-01"),
            "v": vals,
        }
    )


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(keyed_frames())
def test_keep_latest_matches_pandas(df):
    import ray.data

    from feast_ray.stages.dedup import keep_latest

    ds = ray.data.from_pandas(df)
    got = (
        keep_latest(ds, ["k"], "event_ts", created_ts="v", num_buckets=4)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values(["event_ts", "v"], kind="stable")
        .drop_duplicates("k", keep="last")
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "v"]], exp[["k", "v"]])


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(keyed_frames())
def test_grouped_agg_matches_pandas(df):
    import ray.data

    from feast_ray.stages.aggregate import AggSpec, grouped_agg

    ds = ray.data.from_pandas(df)
    got = (
        grouped_agg(ds, ["k"], [AggSpec("v", "sum", "s"), AggSpec(None, "count", "n")])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        df.groupby("k")
        .agg(s=("v", "sum"), n=("v", "size"))
        .reset_index()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert (got["k"].to_numpy() == exp["k"].to_numpy()).all()
    assert (got["s"].to_numpy() == exp["s"].to_numpy()).all()
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.sampled_from("abcdefgh"), min_size=10, max_size=60),
    st.integers(min_value=0, max_value=8),
)
def test_minhash_estimate_tracks_true_jaccard(words, n_swap):
    """Estimated Jaccard from signatures stays within 0.35 of the true
    shingle-set Jaccard (64 permutations ⇒ se ≈ 0.06; 0.35 is a
    >5-sigma bound, deterministic permutations)."""
    a = " ".join(words)
    b_words = list(words)
    for i in range(min(n_swap, len(b_words))):
        b_words[i * max(1, len(b_words) // (n_swap + 1))] = "zzz"
    b = " ".join(b_words)

    def shingles(text):
        w = text.split()
        return {" ".join(w[i : i + 3]) for i in range(max(1, len(w) - 2))}

    sa, sb = shingles(a), shingles(b)
    true_j = len(sa & sb) / len(sa | sb)
    est = estimated_jaccard(minhash_signature(a), minhash_signature(b))
    assert abs(est - true_j) <= 0.35
