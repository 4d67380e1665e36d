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
    # allowed (rows-only check) but must be EXPLICITLY allowlisted so
    # a forgotten oracle fails loudly instead of silently degrading
    # the gate to a rows-only check
    assert set(o) <= set(q)
    rows_only_allowed = {"ivf_topk", "lsh_topk", "sketch_profile"}
    assert set(q) - set(o) == rows_only_allowed


def test_all_queries_run_smoke(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name} returned no columns"
        df.limit(1).collect()
