"""URL canonicalization rules."""

import pandas as pd
import pyarrow as pa
import ray.data

from feast_ray.functions.urltools import canonicalize_url_series, canonicalize_urls


def test_canonicalize_rules():
    cases = {
        "HtTp://ExAmple.COM:80/Path/Q?utm_source=x&b=2&a=1#frag":
            "http://example.com/Path/Q?a=1&b=2",
        "https://Example.com:443/a?b=2&utm_campaign=z": "https://example.com/a?b=2",
        "https://example.com/a?utm_source=x": "https://example.com/a",
        "http://example.com:8080/a": "http://example.com:8080/a",
        "ftp://Other.Host:80/x": "ftp://other.host:80/x",
        "no-scheme/path?z=1&a=2": "no-scheme/path?a=2&z=1",
        "https://h.com/p?a=1&a=0": "https://h.com/p?a=0&a=1",
        "": "",
        "https://h.com/p#only-frag": "https://h.com/p",
        "https://h.com/p?": "https://h.com/p",
        "https://h.com/p?gclid=123&x=1": "https://h.com/p?x=1",
    }
    got = canonicalize_url_series(pd.Series(list(cases)))
    for raw, want, g in zip(cases, cases.values(), got):
        assert g == want, f"{raw!r}: {g!r} != {want!r}"


def test_canonicalize_path_case_preserved():
    # only scheme+host are case-folded, never path or query values
    s = canonicalize_url_series(pd.Series(["https://H.com/CaseD/Path?Key=Val"]))
    assert s[0] == "https://h.com/CaseD/Path?Key=Val"


def test_canonicalize_dataset_replaces_and_appends():
    ds = ray.data.from_arrow(
        pa.table({"url": ["HTTP://A.com:80/x?utm_source=1&b=2"], "k": [1]})
    )
    rep = canonicalize_urls(ds, "url").take_batch(1, batch_format="pyarrow")
    assert rep["url"][0].as_py() == "http://a.com/x?b=2"
    app = canonicalize_urls(ds, "url", out_col="url_canon").take_batch(
        1, batch_format="pyarrow"
    )
    assert app["url"][0].as_py().startswith("HTTP://")
    assert app["url_canon"][0].as_py() == "http://a.com/x?b=2"


def test_block_domains_suffix_semantics():
    import pandas as pd
    import ray.data

    from feast_ray.functions.urltools import block_domains

    df = pd.DataFrame(
        {
            "id": range(9),
            "url": [
                "http://bad.com/x",            # exact -> blocked
                "http://a.bad.com/x",          # subdomain -> blocked
                "http://notbad.com/x",         # no label boundary -> kept
                "http://BAD.COM:8080/x",       # case+port -> blocked
                "http://u@deep.a.b.bad.com/x", # deep subdomain+user -> blocked
                "http://good.com/bad.com",     # path only -> kept
                "not a url",                   # no authority -> kept
                "http://bad.company/x",        # different TLD -> kept
                "http://" + ".".join("abcdefghijkl") + ".bad.com/",  # 14 labels -> blocked
            ],
        }
    )
    kept = block_domains(
        ray.data.from_pandas(df), ["bad.com"], "url"
    ).to_pandas()
    assert sorted(kept["id"]) == [2, 5, 6, 7]  # deep host (id 8) blocked
    ann = block_domains(
        ray.data.from_pandas(df), ["bad.com"], "url", mode="annotate"
    ).to_pandas()
    assert ann["blocked"].sum() == 5 and len(ann) == 9


def test_registrable_domain_rules():
    from feast_ray.functions.urltools import registrable_domain_series

    cases = {
        # longest match: "co.uk" beats "uk"
        "Sub.Example.CO.UK": "example.co.uk",
        "a.b.c.example.com.au": "example.com.au",
        # one-label suffix with a label left of it
        "example.uk": "example.uk",
        "www.site.COM": "site.com",
        "site.com": "site.com",
        # private-registry entry
        "blog.GitHub.IO": "blog.github.io",
        "deep.blog.github.io": "blog.github.io",
        # bare suffixes: no label left -> no registrable domain
        "co.uk": None,
        "uk": None,
        "github.io": None,
        "com": None,
        # unlisted TLD -> no match
        "internal.local": None,
        "host": None,
    }
    got = registrable_domain_series(pd.Series(list(cases)))
    for raw, want, g in zip(cases, cases.values(), got):
        if want is None:
            assert pd.isna(g), f"{raw!r}: {g!r} != NA"
        else:
            assert g == want, f"{raw!r}: {g!r} != {want!r}"


def test_registrable_domain_custom_suffixes_and_empty():
    from feast_ray.functions.urltools import registrable_domain_series

    got = registrable_domain_series(
        pd.Series(["x.a.b.c", "a.b.c", "b.c", "q.z"]),
        suffixes=["b.c", "a.b.c"],
    )
    # 4-label host: longest listed suffix is a.b.c -> x.a.b.c
    assert got[0] == "x.a.b.c"
    # host EQUAL to the longest suffix IS a public suffix — the
    # shorter b.c match must NOT rescue it (PSL longest-match)
    assert pd.isna(got[1])
    assert pd.isna(got[2])
    assert pd.isna(got[3])
    # empty input
    out = registrable_domain_series(pd.Series([], dtype="string"))
    assert len(out) == 0
