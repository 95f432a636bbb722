"""Duplicate-span removal (cross-doc n-gram spans, keep-first)."""

import pandas as pd
import ray.data

from feast_ray.functions.spandup import remove_duplicate_spans


def _run(df, **kw):
    out = (
        remove_duplicate_spans(
            ray.data.from_pandas(df), "doc_id", "text", **kw
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    return out["text_despanned"].tolist()


def test_shared_span_kept_only_in_lowest_doc():
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma delta unique one",
                "other words here alpha beta gamma delta tail",
                "fully distinct text with no overlap at all",
            ],
        }
    )
    got = _run(df, n=4)
    assert got[0] == "alpha beta gamma delta unique one"  # survivor intact
    assert got[1] == "other words here tail"  # span cut
    assert got[2] == "fully distinct text with no overlap at all"


def test_overlapping_grams_cut_as_one_interval():
    # a 6-token shared run = three overlapping 4-grams -> one clean cut
    shared = "s1 s2 s3 s4 s5 s6"
    df = pd.DataFrame(
        {
            "doc_id": [10, 20],
            "text": [f"head {shared} mid", f"pre {shared} post"],
        }
    )
    got = _run(df, n=4)
    assert got == [f"head {shared} mid", "pre post"]


def test_short_docs_and_empty_are_untouched():
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["too short", "", "   "],
        }
    )
    assert _run(df, n=4) == ["too short", "", ""]


def test_min_docs_threshold_and_whitespace_normalization():
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a  b\tc   d x",  # messy whitespace, normalized on rebuild
                "y a b c d",
                "z a b c d",
            ],
        }
    )
    # min_docs=4: nothing is duplicated enough -> only normalization
    assert _run(df, n=4, min_docs=4) == [
        "a b c d x",
        "y a b c d",
        "z a b c d",
    ]
    got = _run(df, n=4, min_docs=3)
    assert got == ["a b c d x", "y", "z"]


def test_distributed_blocks_match_single_block():
    rows = []
    for i in range(40):
        boiler = f"subscribe to channel {i % 3} now today please"
        # per-doc-unique tokens around the boilerplate so no 4-gram
        # crosses the span boundary
        rows.append(
            {"doc_id": i, "text": f"w{i}a w{i}b w{i}c {boiler} t{i}x t{i}y"}
        )
    df = pd.DataFrame(rows)
    one = _run(df, n=4)
    many = (
        remove_duplicate_spans(
            ray.data.from_pandas(df).repartition(8), "doc_id", "text", n=4
        )
        .to_pandas()
        .sort_values("doc_id")["text_despanned"]
        .tolist()
    )
    assert one == many
    # survivors are exactly doc_ids 0,1,2 (lowest per boilerplate variant)
    for i, t in enumerate(one):
        if i in (0, 1, 2):
            assert "subscribe to channel" in t
        else:
            assert "subscribe" not in t


def test_copartition_mode_matches_broadcast():
    import ray.data

    rows = []
    for i in range(60):
        boiler = f"subscribe to channel {i % 3} now today please"
        rows.append(
            {"doc_id": i, "text": f"w{i}a w{i}b w{i}c {boiler} t{i}x t{i}y"}
        )
    rows.append({"doc_id": 60, "text": ""})          # empty doc
    rows.append({"doc_id": 61, "text": "too short"})  # sub-n doc
    df = pd.DataFrame(rows)
    ds = ray.data.from_pandas(df).repartition(8)
    a = (
        remove_duplicate_spans(ds, "doc_id", "text", n=4)
        .to_pandas().sort_values("doc_id")["text_despanned"].tolist()
    )
    b = (
        remove_duplicate_spans(
            ds, "doc_id", "text", n=4, mode="copartition",
            num_buckets=8, bloom_bits=1 << 12,
        )
        .to_pandas().sort_values("doc_id")["text_despanned"].tolist()
    )
    assert a == b


def test_copartition_mode_no_dups_corpus():
    import ray.data

    df = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["only one doc here", "something else x"]}
    )
    out = (
        remove_duplicate_spans(
            ray.data.from_pandas(df), "doc_id", "text", n=4,
            mode="copartition", num_buckets=4,
        )
        .to_pandas().sort_values("doc_id")
    )
    assert out["text_despanned"].tolist() == [
        "only one doc here", "something else x"
    ]
