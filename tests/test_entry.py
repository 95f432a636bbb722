"""Driver-contract smoke: entry() runs, queries()/oracle_sql() are
consistent, and a representative oracle pair matches DuckDB here too
(the full sweep lives in scripts/check_correctness.py)."""

import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod


def test_entry_runs():
    res = entrymod.entry()
    import ray.data

    assert isinstance(res, ray.data.Dataset)
    assert res.count() >= 0


def test_every_oracle_key_has_a_query():
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs, name
    assert len(qs) >= 30


def test_representative_oracle_pair(sf_small, duck):
    from scripts.check_correctness import compare, to_pandas

    qs = entrymod.queries()
    sql = entrymod.oracle_sql()
    for name in ["q01_pricing_summary", "q07_latest_event_per_user", "q16_quality_filter_docs"]:
        got = to_pandas(qs[name](sf_small))
        exp = duck.execute(sql[name]).fetchdf()
        assert compare(name, got, exp) == [], name
