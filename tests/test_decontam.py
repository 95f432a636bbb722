"""Benchmark decontamination operator."""

import pandas as pd
import ray.data

from feast_ray.functions.decontam import benchmark_ngrams, decontaminate, ngram_strings


def test_ngram_strings():
    assert ngram_strings("a b c d", 3) == {"a b c", "b c d"}
    assert ngram_strings("a b", 3) == set()


def test_decontaminate_flags_planted_overlap():
    bench = ["the quick brown fox jumps over the lazy dog tonight"]
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "prefix words the quick brown fox jumps over the lazy dog tonight suffix",
                "completely unrelated text about distributed query engines and arrow",
                "the quick brown fox jumps over something else entirely different here",
            ],
        }
    )
    ds = ray.data.from_pandas(docs)
    out = (
        decontaminate(ds, bench, n=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert bool(out.loc[0, "contaminated"]) is True
    assert bool(out.loc[1, "contaminated"]) is False
    assert bool(out.loc[2, "contaminated"]) is False  # only 7-gram prefix shared

    dropped = decontaminate(ds, bench, n=8, mode="drop").to_pandas()
    assert sorted(dropped["doc_id"]) == [2, 3]
    assert "contaminated" not in dropped.columns


def test_decontaminate_min_hits():
    bench = ["one two three four five six seven eight nine ten eleven twelve"]
    doc = "one two three four five six seven eight nine ten eleven twelve"
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [1], "text": [doc]}))
    out = decontaminate(ds, bench, n=8, min_hits=6).to_pandas()
    assert int(out.loc[0, "n_hits"]) == 5  # 12 words -> 5 distinct 8-grams
    assert bool(out.loc[0, "contaminated"]) is False
