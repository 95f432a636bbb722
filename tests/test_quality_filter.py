"""Flagship-pipeline correctness: golden-oracle comparison + the north
rule's two invariants (byte-identical extracted text per url; keep/drop
F1 ≥ 0.99 vs reference labels)."""

import numpy as np
import pandas as pd
import pytest

from feast_ray.pipelines import quality_filter, quality_metrics
from feast_ray.sources import synth_webpages
from feast_ray.sources.webpages import webpages_table
from tests.oracle_quality import oracle_quality_filter


@pytest.fixture(scope="module")
def result_and_oracle(sf_small):
    pages = synth_webpages(sf_small)
    got = quality_filter(pages).to_pandas().sort_values("url").reset_index(drop=True)
    exp = (
        oracle_quality_filter(webpages_table(sf_small).to_pandas())
        .sort_values("url")
        .reset_index(drop=True)
    )
    return got, exp


def test_one_row_per_url_latest(result_and_oracle, sf_small):
    got, exp = result_and_oracle
    assert got["url"].is_unique
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(
        got["warc_ts"], exp["warc_ts"], check_names=False, check_dtype=False
    )


def test_keep_drop_f1(result_and_oracle):
    got, exp = result_and_oracle
    y_true = exp["keep"].to_numpy(dtype=bool)
    y_pred = got["keep"].to_numpy(dtype=bool)
    tp = (y_true & y_pred).sum()
    fp = (~y_true & y_pred).sum()
    fn = (y_true & ~y_pred).sum()
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f"F1={f1}: disagreements={np.flatnonzero(y_true != y_pred)[:10]}"
    # and drop reasons agree exactly
    assert (
        got["drop_reason"].fillna("kept") == exp["drop_reason"].fillna("kept")
    ).all()


def test_scrubbed_text_byte_identical(result_and_oracle):
    got, exp = result_and_oracle
    kept = exp["keep"].to_numpy(dtype=bool)
    assert (got.loc[kept, "text_scrubbed"] == exp.loc[kept, "text_scrubbed"]).all()
    assert got.loc[~kept, "text_scrubbed"].isna().all()


def test_extraction_byte_identity_roundtrip(sf_small):
    """extract(make_html(text)) == text, byte for byte, for every doc
    — checked against the INDEPENDENT oracle extractor too."""
    from feast_ray.functions.extract import extract_text
    from tests.oracle_quality import oracle_extract

    wt = webpages_table(sf_small).to_pandas()
    for h, t in zip(wt["html"], wt["text"]):
        e1 = extract_text(h)
        e2 = oracle_extract(h)
        assert e1 == t
        assert e2 == t


def test_scrubber_patterns():
    from feast_ray.functions.scrub import Scrubber

    s = Scrubber()
    assert s.scrub("mail me at bob.smith+x@foo-bar.example.com now") == "mail me at <EMAIL> now"
    assert s.scrub("call +1-555-123-4567 ok") == "call <PHONE> ok"
    assert s.scrub("host 192.168.10.1 up") == "host <IP> up"
    assert s.scrub("ssn 123-45-6789 .") == "ssn <SSN> ."
    assert s.scrub("card 4111111111111111 x") == "card <NUM> x"
    assert s.scrub("you badword1 person") == "you <TOX> person"


def test_metrics(sf_small):
    pages = synth_webpages(sf_small)
    res = quality_filter(pages)
    m = quality_metrics(res).to_pandas()
    assert {"domain", "drop_reason", "n_docs", "total_words", "avg_ppl"} <= set(m.columns)
    # hot domain must be present (skew fixture) and totals must add up
    assert (m["domain"] == "big-portal.example.com").any()
    assert m["n_docs"].sum() == res.count()


def test_dedup_picks_edited_recrawl(sf_small):
    """Urls with an edited second crawl must surface the edited text."""
    got = quality_filter(synth_webpages(sf_small)).to_pandas()
    wt = webpages_table(sf_small).to_pandas()
    edited_urls = wt[wt["text"].str.endswith("updated edition")]["url"].unique()
    assert len(edited_urls) > 0
    sub = got[got["url"].isin(edited_urls) & got["keep"]]
    assert sub["text_scrubbed"].str.endswith("updated edition").all()


def test_sketch_dedup_equivalent(sf_small):
    """keep_latest_sketch (light two-pass, 16B/row shuffle) must
    produce exactly the global full-row-shuffle result."""
    import pandas as pd

    a = (
        quality_filter(synth_webpages(sf_small), dedup_mode="sketch")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    b = (
        quality_filter(synth_webpages(sf_small), dedup_mode="global")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_exchange_dedup_equivalent(sf_small):
    """The raw-Ray exchange dedup must produce exactly the groupby
    result (the flagship's default path)."""
    import pandas as pd

    a = (
        quality_filter(synth_webpages(sf_small), dedup_mode="exchange")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    b = (
        quality_filter(synth_webpages(sf_small), dedup_mode="global")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_corpus_export_partitions(tmp_path, sf_small):
    """CCNet-style export: kept docs land in lang/quality-bucket
    directories; per-language bucket sizes are tercile-balanced."""
    from feast_ray.pipelines.corpus_export import export_corpus

    res = quality_filter(synth_webpages(sf_small))
    counts = export_corpus(res, str(tmp_path / "corpus"))
    assert counts, "no partitions written"
    # every partition path is lang_pred=X/quality_bucket=Y
    for k in counts:
        assert "lang_pred=" in k and "quality_bucket=" in k, k
    total = sum(counts.values())
    kept = res.to_pandas()["keep"].sum()
    assert total == kept
    # en buckets within a reasonable tercile balance
    en = {k: v for k, v in counts.items() if "lang_pred=en" in k}
    if len(en) == 3:
        vals = sorted(en.values())
        assert vals[0] >= vals[-1] * 0.5  # no degenerate bucketing


def test_extract_fast_path_byte_identical():
    """The vectorized extractor must be byte-identical to the
    row-at-a-time reference path on template pages, escaped-entity
    round-trips, and every non-template fallback shape."""
    import pyarrow as pa

    from feast_ray.functions.extract import extract_batch, extract_text
    from feast_ray.sources.webpages import make_html

    texts = [
        "hello world", "", "a &amp; b &lt;tag&gt;",
        "it's a \"quote\" & <x>", "x " * 500,
        "&copy; &lt; &amp;lt; &#x27;", "multi  space   runs",
        "newline\nin text",
    ]
    cases = [make_html(i, "src", t) for i, t in enumerate(texts)]
    cases += [
        b"<article>\n<p>caf&eacute; &#39;x&#39; &nbsp;gap</p>\n</article>",
        b"<article>\n<p>AT&T and R&D; &amp;eacute; roundtrip</p>\n</article>",
        b"<html>no article</html>",
        b"<article><p>a</p><p>b</p></article>",
        b"<article>\njunk<p>a</p>\n</article>",
        b"\xff\xfebad utf8 <article>\n<p>x</p>\n</article>",
        b"<article>\n<p>a</p>\nstray\n<p>b</p>\n</article>",
    ]
    tbl = pa.table({"html": pa.array(cases, pa.binary())})
    fast = extract_batch(tbl, "html", "out")["out"].to_pylist()
    for f, h in zip(fast, cases):
        assert f == extract_text(h)
