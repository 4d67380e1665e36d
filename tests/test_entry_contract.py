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
    rows_only_allowed = {
        "ivf_topk",
        "lsh_topk",
        "sketch_profile",
        # full NFKC on NFKC-only noise classes — DuckDB has NFC only;
        # the hash-gated normalize_text_nfkc_agree twin pins the same
        # path's values on the subset-equivalence domain
        "normalize_text_nfkc",
    }
    assert set(q) - set(o) == rows_only_allowed


def test_normalize_text_nfkc_gate_noise(spark, sf_dir):
    """The rows-only NFKC gate's expected values, pinned here since no
    SQL oracle can express NFKC (DuckDB has NFC only): the injected
    NFKC-ONLY noise classes (㎒ ½ Ⅻ ²) must come out expanded on
    EVERY row ("mhz", "1⁄2", "xii ...2" after casefold), and the
    hash-gated agree twin must equal the subset chain row-for-row on
    its subset-class-only input (the equivalence-domain contract the
    driver then hash-checks against the fold-table SQL)."""
    q = entrymod.queries()
    rows = q["normalize_text_nfkc"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["text_norm"].startswith("mhz1⁄2 "), r["text_norm"]
        assert r["text_norm"].endswith(" xii2"), r["text_norm"]
    from pyspark.sql import functions as F

    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import normalize_text
    from etl_based_real_time_air_quality_monitoring_system_spark.sources.readers import load_table

    noisy = F.concat(
        F.lit(entrymod._NORM_NOISE_PREFIX),
        F.col("text"),
        F.lit(entrymod._NORM_NOISE_SUFFIX),
    )
    subset = {
        r["doc_id"]: r["t"]
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", normalize_text(noisy).alias("t"))
        .collect()
    }
    agree = {
        r["doc_id"]: r["text_norm"]
        for r in q["normalize_text_nfkc_agree"](spark, sf_dir).collect()
    }
    assert agree == subset


def test_all_queries_run_smoke(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name} returned no columns"
        df.limit(1).collect()


def test_entry_idempotent_on_one_session(spark):
    """entry() twice on one session (the driver may re-invoke):
    session.prepare() must be idempotent and the result stable."""
    a = entrymod.entry(spark)
    b = entrymod.entry(spark)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_query_at_bogus_sf_dir_raises_cleanly(spark):
    """A query pointed at a nonexistent sf_dir must surface Spark's
    own AnalysisException (PATH_NOT_FOUND), not an engine-invented
    error or a silent empty frame."""
    import pytest
    from pyspark.errors import AnalysisException

    q = entrymod.queries()["flagship"]
    with pytest.raises(AnalysisException, match="PATH_NOT_FOUND"):
        q(spark, "/root/testdata/sf_does_not_exist").limit(1).collect()
