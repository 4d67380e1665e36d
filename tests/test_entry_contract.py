"""Contract tests: entry() smoke, queries()/oracle_sql() key alignment."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_queries_oracle_alignment():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert q, "queries() must not be empty"
    # every oracle key must have a query; queries without oracle are
    # allowed (rows-only check) but should be rare
    assert set(o) <= set(q)


def test_all_queries_run_smoke(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name} returned no columns"
        df.limit(1).collect()
