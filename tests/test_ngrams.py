"""Corpus n-gram statistics."""

import pandas as pd
import ray.data

from feast_ray.functions.ngrams import ngram_top


def test_ngram_top_counts_and_tiebreak():
    df = pd.DataFrame(
        {
            "text": [
                "a b c a b c",     # "a b c" x2, "b c a" x1, "c a b" x1
                "  a b c  ",       # +1 "a b c" (whitespace noise)
                "x y",             # too short for trigrams
                "",                # empty
            ]
        }
    )
    out = (
        ngram_top(ray.data.from_pandas(df).repartition(3), "text", n=3, k=3)
        .to_pandas()
    )
    got = list(zip(out["gram"], out["n"]))
    assert got[0] == ("a b c", 3)
    # ties broken ascending by gram
    assert got[1:] == [("b c a", 1), ("c a b", 1)]


def test_ngram_top_bigrams():
    df = pd.DataFrame({"text": ["w w w", "w w"]})
    out = ngram_top(ray.data.from_pandas(df), "text", n=2, k=5).to_pandas()
    assert list(zip(out["gram"], out["n"])) == [("w w", 3)]
