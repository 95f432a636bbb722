"""Unicode normalization operator."""

import pandas as pd
import ray.data

from feast_ray.functions.textnorm import normalize_text


def test_normalize_text_composes_and_collapses():
    df = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "t": ["Café  Du\tMonde ", "ALL  ASCII   here", None],
        }
    )
    out = (
        normalize_text(ray.data.from_pandas(df), "t", "t_norm")
        .to_pandas()
        .sort_values("id")
    )
    vals = out["t_norm"].tolist()
    assert vals[0] == "café du monde"  # NFC-composed single char
    assert vals[1] == "all ascii here"
    assert vals[2] is None or pd.isna(vals[2])


def test_normalize_text_in_place():
    df = pd.DataFrame({"id": [1], "t": ["  A  B  "]})
    out = normalize_text(ray.data.from_pandas(df), "t").to_pandas()
    assert out["t"].tolist() == ["a b"]
