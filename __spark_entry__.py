"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (SURVEY.md §7 Phase 1) on
sf0.001.  ``queries()`` exposes every implemented operator from
SURVEY.md §2 as a named (spark, sf_dir) -> DataFrame callable;
``oracle_sql()`` carries the DuckDB-ANSI twin for the driver's
differential gate.  Column names are aliased identically on both sides
(the driver hashes values under name-sorted columns).

Implementation lives in ``etl_based_real_time_air_quality_monitoring_system_spark/`` — this module only wires
the library to the driver contract.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from etl_based_real_time_air_quality_monitoring_system_spark.functions.banding import (
    AQI_BANDS,
    AQI_ELSE,
    TEMP_BANDS,
    TEMP_ELSE,
    band,
    band_case_sql,
)
from etl_based_real_time_air_quality_monitoring_system_spark.functions.scoring import weighted_score
from etl_based_real_time_air_quality_monitoring_system_spark.operators.aggregates import (
    count_distinct,
    freq_distribution,
    global_means,
    grouped_stats,
    multikey_summary,
    histogram,
    range_aggregate,
    session_window_agg,
    time_bucketed,
)
from etl_based_real_time_air_quality_monitoring_system_spark.operators.cleaning import (
    drop_null_rows,
    exact_dedup,
)
from etl_based_real_time_air_quality_monitoring_system_spark.operators.dedup import (
    SIMHASH_BITS,
    exact_text_dedup,
    levenshtein_near_pairs,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from etl_based_real_time_air_quality_monitoring_system_spark.operators.joins import (
    anti_join,
    asof_join,
    broadcast_join,
    full_outer_diff,
    range_join,
    salted_join,
    semi_join,
    star_join,
)
from etl_based_real_time_air_quality_monitoring_system_spark.operators.graph import (
    connected_components,
)
from etl_based_real_time_air_quality_monitoring_system_spark.operators.timeseries import (
    gap_fill_locf,
)
from etl_based_real_time_air_quality_monitoring_system_spark.operators.reshape import (
    cube_agg,
    except_all_rows,
    except_rows,
    grouping_sets_agg,
    intersect_all_rows,
    intersect_rows,
    pivot_agg,
    rollup_agg,
    union_distinct,
    unpivot,
)
from etl_based_real_time_air_quality_monitoring_system_spark.operators.similarity import (
    brute_force_topk,
    cosine_near_dup_gemm,
    cosine_near_dup_pairs,
    ivf_topk,
    knn_join,
    lsh_topk,
    nn_label_confusion,
)
from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import (
    STOPWORDS,
    bpe_ish_token_count,
    char_count,
    distinct_token_count,
    lang_id,
    quality_score,
    rolling_fingerprint,
    stopword_count,
    token_count,
)
from etl_based_real_time_air_quality_monitoring_system_spark.operators.windows import (
    lag_delta,
    moving_frame_sum,
    running_total,
    sessionize,
    top_n_per_key,
    trailing_range_count,
)
from etl_based_real_time_air_quality_monitoring_system_spark.operators.topk import (
    latest_per_key,
    top_k,
)
from etl_based_real_time_air_quality_monitoring_system_spark.plans.flagship import (
    flagship_pipeline,
)
from etl_based_real_time_air_quality_monitoring_system_spark.session import prepare
from etl_based_real_time_air_quality_monitoring_system_spark.sources.readers import load_table

# ---------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    prepare(spark)
    return flagship_pipeline(spark, "/root/testdata/sf0.001")


# ------------------------------------------------------------- helpers

_AQI_CASE = band_case_sql("value", AQI_BANDS, AQI_ELSE, inclusive=True)
_TEMP_CASE = band_case_sql("value", TEMP_BANDS, TEMP_ELSE, inclusive=False)
#: DuckDB reads events.ts as TIMESTAMP_NS; cast to micros to match the
#: engine's nanosAsLong -> timestamp_micros read path (sources.readers).
_TS = "CAST(ts AS TIMESTAMP)"

_SCORE_WEIGHTS = {
    "l_quantity": 0.3,
    "l_extendedprice": 0.25,
    "l_discount": 0.2,
    "l_tax": 0.15,
    "l_linenumber": 0.05,
    "l_suppkey": 0.05,
}
_SCORE_SQL = " + ".join(f"{c} * {w}" for c, w in _SCORE_WEIGHTS.items())


# ------------------------------------------------------------- queries

def _q_grouped_stats(spark: SparkSession, sf: str) -> DataFrame:
    # A1 (spark_processor.py:157-163): per-key avg/min/max/count
    return grouped_stats(load_table(spark, sf, "lineitem"), "l_returnflag", "l_quantity")


def _q_band_distribution(spark: SparkSession, sf: str) -> DataFrame:
    # A2+F1 (spark_processor.py:167-170, :91-95): AQI-band frequency
    events = load_table(spark, sf, "events")
    return freq_distribution(events, band("value", AQI_BANDS, AQI_ELSE), alias="band")


def _q_global_means(spark: SparkSession, sf: str) -> DataFrame:
    # A3 (spark_processor.py:174-180): grand averages, one pass
    return global_means(
        load_table(spark, sf, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


def _q_hourly_activity(spark: SparkSession, sf: str) -> DataFrame:
    # A4 (spark_processor.py:184-189): hour-bucketed count + avg
    return time_bucketed(load_table(spark, sf, "events"), "ts", ["value"], bucket="hour")


def _q_multikey_summary(spark: SparkSession, sf: str) -> DataFrame:
    # A5 (spark_processor.py:210-217): persisted summary aggregate
    return multikey_summary(
        load_table(spark, sf, "lineitem"),
        ["l_returnflag", "l_linestatus"],
        ["l_quantity", "l_extendedprice", "l_discount"],
    )


def _q_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    # A7 (dashboard.py:181): exact distinct count
    return count_distinct(load_table(spark, sf, "customer"), "c_mktsegment")


def _q_acctbal_range(spark: SparkSession, sf: str) -> DataFrame:
    # A9 (dashboard.py:334): max-min spread
    return range_aggregate(load_table(spark, sf, "customer"), "c_acctbal")


def _q_priority_counts(spark: SparkSession, sf: str) -> DataFrame:
    # A10 (dashboard.py:281): value_counts
    return freq_distribution(load_table(spark, sf, "orders"), "o_orderpriority")


def _q_latest_event_per_type(spark: SparkSession, sf: str) -> DataFrame:
    # A11 (dashboard.py:266): latest reading per key via row_number()=1
    latest = latest_per_key(
        load_table(spark, sf, "events"), "event_type", "ts", tie_break="event_id"
    )
    return latest.select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("event_time_us"),
        "value",
        "event_id",
    )


def _q_top_orders(spark: SparkSession, sf: str) -> DataFrame:
    # O5 (dashboard.py:343-357): deterministic top-k -> TakeOrderedAndProject
    top = top_k(
        load_table(spark, sf, "orders"), ["o_totalprice"], 50, tie_break="o_orderkey"
    )
    return top.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")


def _q_price_bands(spark: SparkSession, sf: str) -> DataFrame:
    # F1-style inclusive CASE chain on a different column/threshold set
    orders = load_table(spark, sf, "orders")
    bands = ((50_000, "low"), (150_000, "mid"), (300_000, "high"))
    return freq_distribution(
        orders, band("o_totalprice", bands, "extreme", inclusive=True), alias="price_band"
    )


def _q_value_temp_bands(spark: SparkSession, sf: str) -> DataFrame:
    # F2 exclusive < chain (spark_processor.py:99-102), boundaries exact
    events = load_table(spark, sf, "events")
    return freq_distribution(
        events, band("value", TEMP_BANDS, TEMP_ELSE, inclusive=False), alias="temp_band"
    )


def _q_calendar_parts(spark: SparkSession, sf: str) -> DataFrame:
    # F5 (spark_processor.py:107-119): calendar decomposition + count
    li = load_table(spark, sf, "lineitem")
    return (
        li.groupBy(
            F.year("l_shipdate").alias("year"),
            F.month("l_shipdate").alias("month"),
        )
        .agg(F.count("*").alias("record_count"))
    )


def _q_weighted_score(spark: SparkSession, sf: str) -> DataFrame:
    # F6+F7 (spark_processor.py:121-132): weighted linear score
    li = load_table(spark, sf, "lineitem").withColumn(
        "score", weighted_score(_SCORE_WEIGHTS, scale=2)
    )
    return li.groupBy("l_returnflag").agg(
        F.round(F.avg("score"), 2).alias("avg_score"),
        F.round(F.max("score"), 2).alias("max_score"),
        F.count("*").alias("record_count"),
    )


def _q_props_k_stats(spark: SparkSession, sf: str) -> DataFrame:
    # F9+P6 (producer.py:73-89): JSON field extraction, then aggregate
    events = load_table(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 2).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count("*").alias("record_count"),
        )
    )


def _q_high_value_events(spark: SparkSession, sf: str) -> DataFrame:
    # P3 projection + pushed-down predicate
    events = load_table(spark, sf, "events")
    return events.filter(F.col("value") > 200).select("event_id", "event_type", "value")


def _q_member_filter(spark: SparkSession, sf: str) -> DataFrame:
    # P8 (dashboard.py:349-352): membership predicate then counts
    events = load_table(spark, sf, "events")
    return (
        events.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.count("*").alias("record_count"))
    )


def _q_distinct_user_event(spark: SparkSession, sf: str) -> DataFrame:
    # P1 subset dedup (spark_processor.py:83, scale variant)
    events = load_table(spark, sf, "events")
    return exact_dedup(events.select("user_id", "event_type"))


def _q_notnull_count(spark: SparkSession, sf: str) -> DataFrame:
    # P2 (spark_processor.py:84-86): not-null conjunction
    events = load_table(spark, sf, "events")
    clean = drop_null_rows(events, ["event_type", "ts", "value"])
    return clean.agg(F.count("*").alias("clean_rows"))


def _q_join_revenue_by_segment(spark: SparkSession, sf: str) -> DataFrame:
    # broadcast dim join: customer is small -> fact side never shuffles
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    joined = broadcast_join(
        orders, customer, orders.o_custkey == customer.c_custkey
    )
    return joined.groupBy("c_mktsegment").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        F.count("*").alias("order_count"),
    )


def _q_salted_revenue_by_segment(spark: SparkSession, sf: str) -> DataFrame:
    # the skew-salting path IN the gate: same aggregate as
    # join_revenue_by_segment but routed through salted_join (hot keys
    # spread over 8 shuffle partitions).  Decimal sums because the salt
    # changes summation order — float totals would drift a ulp from the
    # oracle's sequential sum.
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    joined = salted_join(
        orders, customer, "o_custkey", "c_custkey",
        salt_from="o_orderkey", n_salts=8,
    )
    return joined.groupBy("c_mktsegment").agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(20,6)")), 2)
        .cast("double")
        .alias("total_revenue"),
        F.count("*").alias("order_count"),
    )


def _q_join_star_region(spark: SparkSession, sf: str) -> DataFrame:
    # star join: chained broadcast dims, fact scanned once
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    joined = star_join(
        orders,
        [
            (customer, orders.o_custkey == customer.c_custkey),
            (nation, customer.c_nationkey == nation.n_nationkey),
            (region, nation.n_regionkey == region.r_regionkey),
        ],
    )
    return joined.groupBy("r_name").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        F.count("*").alias("order_count"),
    )


def _q_customers_with_orders(spark: SparkSession, sf: str) -> DataFrame:
    # left-semi join = EXISTS
    customer = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    hits = semi_join(customer, orders, customer.c_custkey == orders.o_custkey)
    return hits.agg(F.count("*").alias("customer_count"))


def _q_customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    # left-anti join = NOT EXISTS
    customer = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    misses = anti_join(customer, orders, customer.c_custkey == orders.o_custkey)
    return misses.groupBy("c_mktsegment").agg(F.count("*").alias("customer_count"))


def _q_running_user_value(spark: SparkSession, sf: str) -> DataFrame:
    # window: cumulative sum per key in event order
    events = load_table(spark, sf, "events")
    out = running_total(events, "user_id", ["ts", "event_id"], "value")
    return out.select(
        "event_id", "user_id", F.round("running_total", 2).alias("running_value")
    )


def _q_top3_per_type(spark: SparkSession, sf: str) -> DataFrame:
    # window: top-N per key via row_number <= n
    events = load_table(spark, sf, "events")
    return top_n_per_key(events, "event_type", "value", 3, tie_break="event_id").select(
        "event_type", "event_id", "value"
    )


def _q_value_delta_per_user(spark: SparkSession, sf: str) -> DataFrame:
    # window: lag delta (change since previous reading)
    events = load_table(spark, sf, "events")
    out = lag_delta(events, "user_id", "event_id", "value")
    return out.select("event_id", "user_id", F.round("delta", 2).alias("value_delta"))


def _q_users_click_and_purchase(spark: SparkSession, sf: str) -> DataFrame:
    # set op: INTERSECT
    events = load_table(spark, sf, "events")
    clicks = events.filter(F.col("event_type") == "click").select("user_id")
    buys = events.filter(F.col("event_type") == "purchase").select("user_id")
    return intersect_rows(clicks, buys)


def _q_users_click_not_purchase(spark: SparkSession, sf: str) -> DataFrame:
    # set op: EXCEPT
    events = load_table(spark, sf, "events")
    clicks = events.filter(F.col("event_type") == "click").select("user_id")
    buys = events.filter(F.col("event_type") == "purchase").select("user_id")
    return except_rows(clicks, buys)


def _q_union_hot_or_error(spark: SparkSession, sf: str) -> DataFrame:
    # set op: UNION (distinct)
    events = load_table(spark, sf, "events")
    hot = events.filter(F.col("value") > 250).select("user_id", "event_type")
    errs = events.filter(F.col("event_type") == "error").select("user_id", "event_type")
    return union_distinct(hot, errs)


def _q_pivot_qty_by_status(spark: SparkSession, sf: str) -> DataFrame:
    # pivot with explicit values (no discovery scan)
    li = load_table(spark, sf, "lineitem")
    out = pivot_agg(li, "l_returnflag", "l_linestatus", ["O", "F"], "l_quantity", "sum")
    return out.select(
        "l_returnflag",
        F.round("sum_l_quantity_O", 2).alias("sum_l_quantity_O"),
        F.round("sum_l_quantity_F", 2).alias("sum_l_quantity_F"),
    )


def _q_rollup_flag_status(spark: SparkSession, sf: str) -> DataFrame:
    # ROLLUP: subtotals + grand total in one shuffle
    li = load_table(spark, sf, "lineitem")
    return rollup_agg(li, ["l_returnflag", "l_linestatus"], "l_quantity")


def _q_cube_flag_status(spark: SparkSession, sf: str) -> DataFrame:
    # CUBE: all grouping-set combinations
    li = load_table(spark, sf, "lineitem")
    return cube_agg(li, ["l_returnflag", "l_linestatus"], "l_quantity")


def _q_unpivot_means(spark: SparkSession, sf: str) -> DataFrame:
    # wide -> long (melt) over the one-row global means
    wide = global_means(
        load_table(spark, sf, "lineitem"), ["l_quantity", "l_extendedprice", "l_discount"]
    )
    return unpivot(wide, [], ["avg_l_quantity", "avg_l_extendedprice", "avg_l_discount"])


def _q_asof_purchase_attribution(spark: SparkSession, sf: str) -> DataFrame:
    # as-of join (operator Spark lacks; DuckDB ASOF JOIN is the oracle):
    # each purchase attributed to the user's most recent prior click
    events = load_table(spark, sf, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    # unique per (user, time) so the as-of winner is engine-independent
    clicks = latest_per_key(clicks, ["user_id", "click_ts"], "click_id")
    joined = asof_join(
        purchases, clicks, "user_id", "ts", "click_ts", ["click_id", "click_ts"]
    )
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    c_us = F.unix_micros(F.col("click_ts").cast("timestamp"))
    return joined.select(
        "purchase_id",
        "user_id",
        t_us.alias("purchase_time_us"),
        "click_id",
        c_us.alias("click_time_us"),
        (t_us - c_us).alias("gap_us"),
    )


def _q_user_sessions(spark: SparkSession, sf: str) -> DataFrame:
    # gap-based sessionization (4 h), rolled up to per-user stats
    events = load_table(spark, sf, "events")
    s = sessionize(events, "user_id", "ts", 4 * 3600, order_tie_break="event_id")
    per_session = s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events")
    )
    # half-up via floor: avg of small-int counts lands exactly on .xx5
    # (e.g. 17/8), where Spark HALF_UP vs DuckDB HALF_EVEN round()
    # disagree — floor(x*100 + 0.5)/100 is identical IEEE math in both
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("session_count"),
        (F.floor(F.avg("n_events") * 100 + F.lit(0.5)) / 100).alias(
            "avg_session_events"
        ),
        F.max("n_events").alias("max_session_events"),
    )


def _q_pii_redaction(spark: SparkSession, sf: str) -> DataFrame:
    # pre-training PII scrub: deterministic synthetic PII (email per
    # doc, phone every 3rd, IPv4 every 5th) is injected into the real
    # corpus text, then masked by the regex chain — the oracle rebuilds
    # the same injection and redaction in SQL, so the output text is
    # compared byte-for-byte
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import redact_pii

    docs = load_table(spark, sf, "documents")
    sid = F.col("doc_id").cast("string")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), sid, F.lit("@mail.example.com"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit(" call 555-010-"), F.lpad(sid, 4, "0")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.lit(" from 192.168."), (F.col("doc_id") % 256).cast("string"), F.lit(".1")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return redact_pii(injected, "text").select("doc_id", "redacted")


def _q_repetition_stats(spark: SparkSession, sf: str) -> DataFrame:
    # Gopher-style quality rule: fraction of a doc's bigrams taken by
    # its most common bigram
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import repetition_stats

    return repetition_stats(load_table(spark, sf, "documents"), "doc_id", "text", n=2)


def _q_sequence_packing(spark: SparkSession, sf: str) -> DataFrame:
    # concat-then-chunk packing of the corpus into 512-token training
    # sequences, per language shard
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import pack_sequences

    return pack_sequences(
        load_table(spark, sf, "documents"), "doc_id", "text", capacity=512,
        partition_cols=("lang",),
    )


def _q_cdc_merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    # CDC MERGE: a deterministic update batch derived from orders —
    # every 7th key updated (price +1000, status 'U', every 13th of
    # those a tombstone), every 17th key re-inserted under a new key —
    # applied onto the snapshot, then rolled up per status so any
    # merge mistake (lost update, surviving tombstone, dropped insert)
    # shifts the counts/sums
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.cdc import merge_upsert

    orders = load_table(spark, sf, "orders")
    base = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    upd = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
        (F.col("o_orderkey") % 13 == 0).alias("_deleted"),
    )
    ins = orders.filter(F.col("o_orderkey") % 17 == 0).select(
        (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        F.lit(42.0).alias("o_totalprice"),
        F.lit(False).alias("_deleted"),
    )
    merged = merge_upsert(
        base, upd.unionByName(ins), "o_orderkey", delete_col="_deleted",
        broadcast_updates=True,
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(20,6)")), 2)
        .cast("double")
        .alias("total_price"),
    )


def _q_scd2_user_history(spark: SparkSession, sf: str) -> DataFrame:
    # SCD type-2: each (user, event_type) version becomes a validity
    # interval [ts, next ts), open-ended + current on the last version
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.cdc import scd2_history

    ev = load_table(spark, sf, "events").filter(F.col("user_id") < 50)
    hist = scd2_history(ev, ["user_id", "event_type"], "ts", tie_break="event_id")
    return hist.select(
        "user_id", "event_type", "event_id", "valid_from", "valid_to", "is_current"
    )


def _q_point_in_time_features(spark: SparkSession, sf: str) -> DataFrame:
    # feature-store discipline: each purchase joined to the click
    # VERSION that was valid at purchase time (SCD2 intervals from the
    # click stream + key-equality hash join with a residual range
    # predicate — never an interval nested loop).  Semantically the
    # interval-join formulation of as-of attribution, so it
    # cross-validates asof_purchase_attribution through a different
    # plan shape.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.cdc import (
        point_in_time_join,
        scd2_history,
    )

    events = load_table(spark, sf, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    hist = scd2_history(clicks, "user_id", "ts", tie_break="click_id").select(
        "user_id", "click_id", "valid_from", "valid_to"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    joined = point_in_time_join(purchases, hist, "user_id", "ts")
    return joined.select("purchase_id", "user_id", "click_id")


def _q_event_transitions(spark: SparkSession, sf: str) -> DataFrame:
    # first-order behavior graph: counts of (previous event -> event)
    # transitions within each user's time-ordered stream — one lag
    # window on the same (user_id) partitioning every per-user query
    # uses, then a tiny pair rollup
    from pyspark.sql import Window

    events = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("prev_type", F.lag("event_type", 1).over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("transition_count"))
    )


def _q_corpus_datacard(spark: SparkSession, sf: str) -> DataFrame:
    # the per-source "data card" a corpus release ships: volume, token
    # mass, language spread, quality profile — one aggregation over the
    # tokenize-once projection
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.balance import (
        spread_small_input,
    )
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import (
        quality_score,
        token_count,
    )

    docs = load_table(spark, sf, "documents")
    prof = spread_small_input(docs.select("source", "lang", "text")).select(
        "source",
        "lang",
        token_count("text").alias("_nt"),
        quality_score("text").alias("_q"),
    )
    n = F.count("*")
    return prof.groupBy("source").agg(
        n.alias("n_docs"),
        F.sum("_nt").alias("total_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        (
            F.floor(
                (F.sum(F.col("_q").cast("decimal(18,4)")).cast("double") / n)
                * F.lit(10000.0)
                + F.lit(0.5)
            )
            / F.lit(10000.0)
        ).alias("avg_quality"),
        F.min("_nt").alias("min_tokens"),
        F.max("_nt").alias("max_tokens"),
    )


def _q_mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    # robust per-type outlier counts: |x - median| > 3 * MAD
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.aggregates import mad_outliers

    return mad_outliers(load_table(spark, sf, "events"), "event_type", "value")


def _q_funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    # ordered conversion funnel signup -> click -> purchase: a stage
    # counts only if its event happens at-or-after the user's entry
    # into the previous stage (chained conditional window minimums,
    # ONE user-shuffle for the whole funnel)
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.funnel import funnel_stages

    events = load_table(spark, sf, "events")
    return funnel_stages(
        events, "user_id", "ts", "event_type", ["signup", "click", "purchase"]
    )


def _q_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    # first-seen epoch-week cohort x week-offset activity matrix
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.funnel import retention_cohorts

    return retention_cohorts(load_table(spark, sf, "events"), "user_id", "ts")


def _q_benchmark_contamination(spark: SparkSession, sf: str) -> DataFrame:
    # decontamination pass: which training docs share word-3-grams with
    # the (deterministic) held-out eval slice — the n-gram-overlap test
    # every corpus runs before shipping.  Eval shingles broadcast; the
    # train side never shuffles for the probe.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.dedup import contamination_check

    docs = load_table(spark, sf, "documents")
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return contamination_check(train, eval_df, "doc_id", "text", n=3)


def _q_air_quality_summary(spark: SparkSession, sf: str) -> DataFrame:
    # EP1 headline pipeline (spark_processor.py:231-270): the reference's
    # batch ETL — dedup -> not-null filter -> band/score derivation ->
    # persisted summary (spark_processor.py:210-217) — oracle-checked
    # end-to-end over the deterministic air-quality fixture (the fixture
    # is pure column arithmetic over range(n), so DuckDB regenerates it
    # bit-identically; `sf` is unused by design).
    from etl_based_real_time_air_quality_monitoring_system_spark.plans.air_quality import (
        clean_and_transform,
        summary_table,
        synthesize_air_quality,
    )

    prepare(spark)
    return summary_table(clean_and_transform(synthesize_air_quality(spark, 1000)))


def _q_value_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    # exact interpolated percentiles per key (quantile_cont semantics)
    events = load_table(spark, sf, "events")
    return events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.25)), 4).alias("p25_value"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50_value"),
        F.round(F.percentile("value", F.lit(0.75)), 4).alias("p75_value"),
        F.count("*").alias("record_count"),
    )


_VALUE_BANDS = (
    ("low", -1e12, 50.0),
    ("mid", 50.0, 150.0),
    ("high", 150.0, 300.0),
    ("extreme", 300.0, 1e12),
)


def _q_range_band_join(spark: SparkSession, sf: str) -> DataFrame:
    # interval join against a broadcast band table (vs the CASE chain)
    events = load_table(spark, sf, "events")
    bands = spark.createDataFrame(
        list(_VALUE_BANDS), "band string, lo double, hi double"
    )
    joined = range_join(events, bands, "value")
    return joined.groupBy("band").agg(
        F.count("*").alias("record_count"),
        F.round(F.avg("value"), 2).alias("avg_value"),
    )


def _q_tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q1-style pricing summary: pushed date filter + 8 aggregates
    # in one partial+final hash aggregation
    li = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


def _q_tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q3-style shipping priority: filtered 3-way join (dim side
    # broadcast, fact-fact on the order key) + grouped revenue + top-10
    cutoff = F.lit("1997-01-01").cast("timestamp")
    c = load_table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf, "lineitem").filter(F.col("l_shipdate") > cutoff)
    joined = li.join(o, li.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        joined.groupBy("l_orderkey", "o_orderpriority")
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.col("l_orderkey"))
        .limit(10)
    )


def _q_tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q5-style local-supplier volume: 5-way star join — nation and
    # region broadcast, customer/supplier co-filtered on nationkey, the
    # two fact tables shuffle only on the order key
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        joined.groupBy("n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


def _q_tpch_q6(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q6-style forecast revenue: all three predicates push to the
    # parquet scan (row-group stats skip), single partial+final agg —
    # the canonical scan-bound query at 100 TB
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


def _q_part_type_revenue(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q14-flavored revenue share by part type: fact scan with a
    # pushed date filter, broadcast part dim, decimal sums (exact and
    # associative -> bit-identical across engines), then a global
    # window over the 6-row aggregate for the share
    from pyspark.sql import Window

    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf, "part")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(20,6)"
    )
    agged = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type")
        .agg(
            F.round(F.sum(disc), 2).cast("double").alias("revenue"),
            F.count("*").alias("line_count"),
        )
    )
    # denominator as a one-row broadcast (never a global window, which
    # would single-partition the whole table at scale); the 2-decimal
    # revenues sum exactly as decimals, so the total is order-free
    total = agged.agg(
        F.sum(F.col("revenue").cast("decimal(20,2)")).cast("double").alias("_tot")
    )
    return (
        agged.join(F.broadcast(total))
        .withColumn(
            "revenue_share_pct", F.round(100 * F.col("revenue") / F.col("_tot"), 4)
        )
        .drop("_tot")
    )


def _events_file_stream(spark: SparkSession, sf: str) -> DataFrame:
    """Structured-Streaming file source over the events table (file
    streaming sources require a DIRECTORY; expose the single parquet
    file through a symlink dir — zero copy)."""
    import os as _os
    import tempfile as _tempfile

    from etl_based_real_time_air_quality_monitoring_system_spark.session import prepare

    prepare(spark)
    path = _os.path.join(sf, "events.parquet")
    batch = spark.read.parquet(path)  # schema only (footer read)
    stream_dir = _os.path.join(
        _tempfile.gettempdir(), "spark_graft_stream_" + sf.strip("/").replace("/", "_")
    )
    _os.makedirs(stream_dir, exist_ok=True)
    link = _os.path.join(stream_dir, "events.parquet")
    if not _os.path.islink(link):
        _os.symlink(path, link)
    stream = spark.readStream.schema(batch.schema).parquet(stream_dir)
    if isinstance(stream.schema["ts"].dataType, T.LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def _q_streaming_hourly_counts(spark: SparkSession, sf: str) -> DataFrame:
    # an ACTUAL Structured Streaming run inside the correctness gate:
    # file-source stream over events.parquet -> tumbling 1 h window per
    # event_type -> complete-mode memory sink, availableNow trigger.
    # In complete mode the result is independent of micro-batch split
    # and lateness, so it equals the batch date_trunc aggregation and
    # is DuckDB-oracle-checked like any batch query.
    from etl_based_real_time_air_quality_monitoring_system_spark.streaming.pipeline import (
        windowed_aggregate,
    )

    stream = _events_file_stream(spark, sf)
    # decimal sum, not float avg: float sums are order-sensitive and the
    # per-window groups are tiny (2-4 rows), so rounding boundaries flip
    # between engines; decimal arithmetic is exact and associative
    agg = windowed_aggregate(
        stream,
        key="event_type",
        value="value",
        ts_col="ts",
        window="1 hour",
        aggs=[
            F.count("*").alias("record_count"),
            F.round(F.sum(F.col("value").cast("decimal(20,6)")), 2)
            .cast("double")
            .alias("value_sum"),
        ],
    )
    sink = "streaming_hourly_counts_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


def _q_streaming_stateful_stats(spark: SparkSession, sf: str) -> DataFrame:
    # a CUSTOM stateful streaming operator (applyInPandasWithState)
    # inside the correctness gate: per-key running (count, sum) kept in
    # the state store.  The value is pre-quantized to integer micros in
    # the JVM (double->long cast truncates toward zero — same IEEE op
    # as DuckDB's trunc()), so the state totals are exact integers and
    # the final emission per key equals the batch aggregate in ANY
    # micro-batch split — this is what lets an arbitrary-state Python
    # operator be value-checked against a SQL oracle, not just counted.
    from etl_based_real_time_air_quality_monitoring_system_spark.streaming.pipeline import (
        stateful_running_sum_exact,
    )

    stream = _events_file_stream(spark, sf).withColumn(
        "value_micros", (F.col("value") * 1_000_000).cast("long")
    )
    stats = stateful_running_sum_exact(stream, key="event_type")
    sink = "streaming_stateful_stats_sink"
    q = (
        stats.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # recover the FINAL state per key from the update-mode emission
    # stream: record_count is monotone unconditionally (it only ever
    # increments), so max_by picks the last emission's sum — unlike
    # max(value_sum_micros), which would pick an intermediate sum if
    # values were negative and the source split into many micro-batches
    return (
        spark.table(sink)
        .groupBy("key")
        .agg(
            F.max("record_count").alias("record_count"),
            F.max_by("value_sum_micros", "record_count").alias("value_sum_micros"),
        )
    )


def _q_streaming_enriched_counts(spark: SparkSession, sf: str) -> DataFrame:
    # stream-STATIC dimension enrichment (the reference consumer's
    # per-record enrichment, consumer.py:86-115, done right): the
    # static dim broadcasts to every micro-batch task, so the stream
    # never shuffles for the join; complete-mode aggregation over the
    # enriched category is split-invariant (counts + exact integer
    # micros), hence batch-oracle-checkable
    dim = spark.createDataFrame(
        [
            ("click", "engagement"),
            ("view", "engagement"),
            ("purchase", "conversion"),
            ("signup", "conversion"),
            ("error", "ops"),
        ],
        "event_type string, category string",
    )
    stream = _events_file_stream(spark, sf).withColumn(
        "value_micros", (F.col("value") * 1_000_000).cast("long")
    )
    enriched = stream.join(F.broadcast(dim), "event_type", "left").fillna(
        {"category": "other"}
    )
    agg = enriched.groupBy("category").agg(
        F.count("*").alias("record_count"),
        F.sum("value_micros").alias("value_sum_micros"),
    )
    sink = "streaming_enriched_counts_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


def _q_streaming_dedup_keys(spark: SparkSession, sf: str) -> DataFrame:
    # streaming stateful dedup (T7) inside the correctness gate: the
    # keys-only projection makes the surviving-row nondeterminism
    # invisible, so append-mode output == batch SELECT DISTINCT and the
    # query is fully oracle-checked.  (Unwatermarked dropDuplicates
    # keeps all key state forever — correct here; the production path
    # at scale is dropDuplicatesWithinWatermark, exercised in
    # tests/test_streaming.py where lateness semantics matter.)
    stream = _events_file_stream(spark, sf)
    deduped = stream.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    sink = "streaming_dedup_keys_sink"
    q = (
        deduped.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


def _q_streaming_session_stats(spark: SparkSession, sf: str) -> DataFrame:
    # session windows over an ACTUAL stream (MergingSessions with
    # streaming state): complete-mode output is independent of
    # micro-batch split, so it equals the batch session_window
    # aggregation and shares its island-SQL oracle.
    stream = _events_file_stream(spark, sf)
    agg = session_window_agg(
        stream,
        key="user_id",
        ts="ts",
        gap="30 minutes",
        aggs=[
            F.count("*").alias("event_count"),
            F.round(F.sum(F.col("value").cast("decimal(20,6)")), 2)
            .cast("double")
            .alias("value_sum"),
        ],
    )
    sink = "streaming_session_stats_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


def _q_streaming_click_purchase(spark: SparkSession, sf: str) -> DataFrame:
    # stream-stream time-range equi-join inside the correctness gate:
    # two branches of one file-source stream (clicks / purchases per
    # user), watermarked, purchase bounded to [click, click + 30 min].
    # Inner stream-stream joins emit each match exactly once as it
    # arrives (watermarks bound STATE, not emission), and availableNow
    # over one file is a single micro-batch — so append-mode output
    # equals the batch join and the query is fully oracle-checked.
    from etl_based_real_time_air_quality_monitoring_system_spark.streaming.pipeline import (
        stream_stream_join,
    )

    stream = _events_file_stream(spark, sf)
    clicks = stream.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    joined = stream_stream_join(
        clicks,
        purchases,
        key="user_id",
        watermark="10 minutes",
        max_delay="30 minutes",
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.click_id").alias("click_id"),
        F.col("r.purchase_id").alias("purchase_id"),
    )
    sink = "streaming_click_purchase_sink"
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


def _q_session_window_stats(spark: SparkSession, sf: str) -> DataFrame:
    # native session windows (F.session_window): gap-merged per-user
    # activity bursts in ONE MergingSessions pass — the operator-level
    # analog of the two-window sessionize composition, oracle-checked
    # against the ANSI lag-boundary island SQL.  Touching intervals
    # merge (verified: events exactly `gap` apart share a session).
    events = load_table(spark, sf, "events")
    return session_window_agg(
        events,
        key="user_id",
        ts="ts",
        gap="30 minutes",
        aggs=[
            F.count("*").alias("event_count"),
            F.round(F.sum(F.col("value").cast("decimal(20,6)")), 2)
            .cast("double")
            .alias("value_sum"),
        ],
    )


def _q_above_avg_customers(spark: SparkSession, sf: str) -> DataFrame:
    # plain-SQL surface + correlated scalar subquery: customers above
    # their own nation's average balance.  Catalyst decorrelates the
    # subquery into an aggregate + join (no per-row re-execution) —
    # pinned in tests/test_plan_shapes.py.
    from etl_based_real_time_air_quality_monitoring_system_spark.sources.readers import register_views

    register_views(spark, sf, names=("customer",))
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
        FROM customer c
        WHERE c.c_acctbal > (
            SELECT avg(c2.c_acctbal) FROM customer c2
            WHERE c2.c_nationkey = c.c_nationkey
        )
        """
    )


# ---------------------------------------- LLM-data-pipeline extensions

def _q_serving_tiles(spark: SparkSession, sf: str) -> DataFrame:
    # EP3 serving tiles: every dashboard stat in ONE aggregation pass
    # (vs the reference's full-table toPandas, dashboard.py:59)
    from etl_based_real_time_air_quality_monitoring_system_spark.plans.serving import dashboard_tiles

    events = load_table(spark, sf, "events")
    return dashboard_tiles(events, key="event_type", metrics=["value"])


def _q_text_stats(spark: SparkSession, sf: str) -> DataFrame:
    # token counting / text profiling, all JVM-side array functions
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        char_count("text").alias("n_chars_measured"),
        token_count("text").alias("n_tokens"),
        bpe_ish_token_count("text").alias("n_tokens_bpe"),
        distinct_token_count("text").alias("n_distinct_tokens"),
        stopword_count("text").alias("n_stopwords"),
    )


def _q_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    # heuristic quality score (length + diversity + content density)
    docs = load_table(spark, sf, "documents")
    return docs.select("doc_id", quality_score("text").alias("quality"))


def _q_doc_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    # exact dedup on normalized-text md5 fingerprint
    docs = load_table(spark, sf, "documents")
    return exact_text_dedup(docs, "doc_id", "text")


def _q_rolling_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    # order-sensitive polynomial rolling hash per document (vs the
    # order-insensitive md5 fingerprint of doc_fingerprints)
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id", rolling_fingerprint("text").alias("rolling_fp")
    )


def _q_multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    # multimodal plumbing end-to-end on the deterministic synthetic
    # corpus (no driver table carries binaries): mapInPandas feature
    # extraction -> per-modality profile.  FULLY oracle-checked even
    # though the features come out of a pandas UDF: the fake features
    # are md5-derived u4/2^32 doubles, so multiplying back by 2^32
    # yields exact integers and the checksum is engine-independent.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.multimodal import (
        extract_features,
        synthesize_assets,
    )

    assets = synthesize_assets(spark, 48, "image").unionByName(
        synthesize_assets(spark, 16, "audio")
    )
    feats = extract_features(assets)
    return feats.groupBy("modality").agg(
        F.count("*").alias("asset_count"),
        F.round(F.avg("payload_bytes"), 2).alias("avg_payload_bytes"),
        F.sum((F.element_at("features", 1) * F.lit(2.0**32)).cast("long")).alias(
            "f0_checksum"
        ),
    )


_GATE_SINK_ROOT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "spark-warehouse", "gate_sinks"
)


def _sf_tag(sf: str) -> str:
    """Filesystem-safe tag for a scale-factor dir — gate sink paths and
    bucketed-table names are keyed by it so concurrent runs at
    different SFs (a sweep + a bench) never clobber each other's
    write→read-back round trips."""
    return os.path.basename(os.path.normpath(sf)).replace(".", "_")


def _gate_sink(sf: str, name: str) -> str:
    return os.path.join(_GATE_SINK_ROOT, f"{name}_{_sf_tag(sf)}")


def _cdc_update_schema(with_value: bool = True) -> T.StructType:
    """The versioned-update record shape shared by every CDC gate query
    (single declaration — the three queries and their oracles must all
    read the same fields or they silently read nulls)."""
    fields = [
        T.StructField("user_id", T.LongType()),
        T.StructField("version", T.LongType()),
    ]
    if with_value:
        fields.append(T.StructField("value", T.DoubleType()))
    fields.append(T.StructField("_deleted", T.BooleanType()))
    return T.StructType(fields)


def _q_sink_sharded_export(spark: SparkSession, sf: str) -> DataFrame:
    # training-shard export round trip: deterministic shard membership
    # (content-hash bucket) proven by per-shard count + id checksum +
    # char total against an oracle recomputing the same bucket rule;
    # within-shard ORDER is pinned separately in pytest (parquet
    # read-back order is split-dependent, so the gate checks the
    # order-insensitive invariants)
    from etl_based_real_time_air_quality_monitoring_system_spark.sources.writers import (
        write_training_shards,
    )

    docs = load_table(spark, sf, "documents")
    path = _gate_sink(sf, "training_shards")
    write_training_shards(docs, path, "doc_id", n_shards=8)
    back = spark.read.parquet(path)
    return back.groupBy("shard").agg(
        F.count("*").alias("doc_count"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
        F.sum("n_chars").cast("long").alias("char_total"),
    )


def _q_sink_partitioned_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    # S10 in the gate as a REAL write->read round trip: partitioned
    # parquet sink, then a read-back whose partition filter prunes
    # directories (plan-pinned in test_plan_shapes), aggregated and
    # compared against an oracle over the ORIGINAL table — proving the
    # sink loses nothing and the partition layout answers predicates
    from etl_based_real_time_air_quality_monitoring_system_spark.sources.writers import (
        write_partitioned_parquet,
    )

    events = load_table(spark, sf, "events").select("event_id", "event_type", "value")
    path = _gate_sink(sf, "events_by_type")
    write_partitioned_parquet(events, path, partition_cols=("event_type",))
    back = spark.read.parquet(path).filter(
        F.col("event_type").isin("click", "purchase")
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("record_count"),
        F.sum(F.col("value").cast("decimal(20,6)"))
        .cast("double")
        .alias("value_sum"),
    )


def _q_sink_bucketed_join(spark: SparkSession, sf: str) -> DataFrame:
    # the bucketed-table lifecycle in the gate: pay the shuffle once at
    # write time (bucketBy on the join key), then join the two bucketed
    # tables and aggregate — results must equal a plain join over the
    # source tables.  The exchange-free join plan itself is pinned in
    # test_plan_shapes.py::test_bucketed_join_has_no_exchange.
    from etl_based_real_time_air_quality_monitoring_system_spark.sources.writers import (
        write_bucketed_table,
    )

    orders = load_table(spark, sf, "orders").select("o_custkey", "o_totalprice")
    customer = load_table(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    otab = f"gate_orders_bucketed_{_sf_tag(sf)}"
    ctab = f"gate_customer_bucketed_{_sf_tag(sf)}"
    write_bucketed_table(
        orders,
        otab,
        ("o_custkey",),
        num_buckets=8,
        path=_gate_sink(sf, "orders_bucketed"),
    )
    write_bucketed_table(
        customer,
        ctab,
        ("c_custkey",),
        num_buckets=8,
        path=_gate_sink(sf, "customer_bucketed"),
    )
    o = spark.table(otab)
    c = spark.table(ctab)
    joined = o.join(c, o.o_custkey == c.c_custkey)
    total = F.sum(F.col("o_totalprice").cast("decimal(20,6)")).cast("double")
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        (F.floor(total * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)).alias(
            "total_price"
        ),
    )


def _q_sink_csv_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    # S11 single-file CSV summary sink round trip: coalesce(1) write
    # with header, schema-enforced read-back.  Integer/string columns
    # only, so the text round trip is exact by construction.
    from etl_based_real_time_air_quality_monitoring_system_spark.sources.writers import (
        write_single_csv,
    )

    summary = (
        load_table(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
    )
    path = _gate_sink(sf, "status_summary_csv")
    write_single_csv(summary, path)
    return spark.read.option("header", "true").schema(
        "o_orderstatus string, n_orders long"
    ).csv(path)


def _q_ingest_metrics_passthrough(spark: SparkSession, sf: str) -> DataFrame:
    # A12 in the gate, both halves: (1) the observe() instrumentation
    # is a pure passthrough — metrics ride the query, rows are
    # untouched — so the per-type aggregate equals the plain
    # source-table oracle; (2) the observed counters THEMSELVES are
    # value-checked: an Observation captures (records,
    # null_first_col) from a first action, and they come back as a
    # '__observed__' row the oracle re-derives with count(*) /
    # count(value).  `value` is selected first so null_first_col
    # counts exactly the rows count(value) excludes.
    from pyspark.sql import Observation

    from etl_based_real_time_air_quality_monitoring_system_spark.streaming.pipeline import (
        with_ingest_metrics,
    )

    obs = Observation()
    events = with_ingest_metrics(
        load_table(spark, sf, "events").select("value", "event_type"), name=obs
    )
    per_type = events.groupBy("event_type").agg(
        F.count("*").alias("record_count"),
        F.count("value").alias("value_present"),
    )
    # ONE action fires the observation; the per-type rows it already
    # computed (bounded by #event types — a tiny-result collect) come
    # back as literals, so the events scan executes exactly once and
    # nothing stays cached in the session
    rows = [
        (r["event_type"], r["record_count"], r["value_present"])
        for r in per_type.collect()
    ]
    m = obs.get
    rows.append(
        ("__observed__", int(m["records"]), int(m["records"]) - int(m["null_first_col"]))
    )
    return spark.createDataFrame(
        rows, "event_type string, record_count long, value_present long"
    )


def _q_json_scan_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    # S7 + S9 in the gate: orders summary written as JSON lines, then
    # read back BOTH ways — schema-enforced (the production path) and
    # inference-fallback (the secondary path) — each branch aggregated
    # and union-stacked, so the two scan modes are proven equivalent
    # to each other AND to the source-table oracle
    from etl_based_real_time_air_quality_monitoring_system_spark.sources.readers import (
        read_json_enforced,
        read_json_inferred,
    )

    rows = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    path = _gate_sink(sf, "orders_json")
    rows.write.mode("overwrite").json(path)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), True),
            T.StructField("o_orderstatus", T.StringType(), True),
            T.StructField("o_orderpriority", T.StringType(), True),
        ]
    )

    def agg(df: DataFrame, branch: str) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count("*").alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
        ).withColumn("branch", F.lit(branch))

    return agg(
        read_json_enforced(spark, path, schema, multiline=False), "enforced"
    ).unionByName(agg(read_json_inferred(spark, path), "inferred"))


def _q_cache_fanout(spark: SparkSession, sf: str) -> DataFrame:
    # C1 in the gate: one cleaned intermediate cached, N downstream
    # aggregates fan out from it (the reference caches its transformed
    # frame before writing summary + partitioned output,
    # spark_processor.py:160+); both fan-out branches are value-checked
    # via a stacked union
    events = (
        load_table(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .cache()
    )
    vsum = F.sum(F.col("value").cast("decimal(20,6)")).cast("double")
    by_type = events.groupBy(F.col("event_type").alias("key")).agg(
        F.count("*").alias("record_count"), vsum.alias("value_sum")
    )
    by_hour = events.groupBy(
        F.hour(F.col("ts").cast("timestamp")).cast("string").alias("key")
    ).agg(F.count("*").alias("record_count"), vsum.alias("value_sum"))
    out = by_type.withColumn("branch", F.lit("type")).unionByName(
        by_hour.withColumn("branch", F.lit("hour"))
    )
    # the fan-out result is ~|event_types| + 24 rows: materialize it
    # eagerly so the cached intermediate can be RELEASED — .cache() is
    # catalog-pinned (not GC-reclaimed like broadcasts), so a lazy
    # return would pin another copy of the filtered table per gate/
    # bench invocation for the session lifetime
    try:
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        events.unpersist()


def _q_dead_letter_split(spark: SparkSession, sf: str) -> DataFrame:
    # T9 in the gate: permissive-parse dead-letter routing over a
    # deterministic payload corpus built with JVM expressions (every
    # 11th payload is corrupt JSON).  Good rows flatten and aggregate
    # per kind; the dead-letter branch contributes an accounting row —
    # so BOTH sides of the split are value-checked, mirroring the
    # reference consumer's try/except routing (consumer.py:149-166).
    from etl_based_real_time_air_quality_monitoring_system_spark.streaming.pipeline import (
        dead_letter_split,
    )

    i = F.col("id")
    payloads = spark.range(300).select(
        F.when(i % 11 == 0, F.lit('{"broken'))
        .otherwise(
            F.concat(
                F.lit('{"event_id": '),
                i.cast("string"),
                F.lit(', "kind": "k'),
                (i % 3).cast("string"),
                F.lit('"}'),
            )
        )
        .alias("payload")
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("kind", T.StringType(), True),
        ]
    )
    good, bad = dead_letter_split(payloads, "payload", schema)
    good_agg = good.groupBy("kind").agg(
        F.count("*").alias("record_count"),
        F.sum("event_id").alias("id_sum"),
    )
    bad_agg = bad.agg(
        F.lit("dead_letter").alias("kind"),
        F.count("*").alias("record_count"),
        F.lit(None).cast("long").alias("id_sum"),
    )
    return good_agg.unionByName(bad_agg)


def _q_streaming_to_table_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    # T8 in the gate: a REAL checkpointed foreachBatch parquet sink —
    # availableNow stream over the events file source, partitioned
    # append, then a batch read-back aggregated against the batch
    # oracle.  The checkpoint makes a COMPLETED re-run a no-op; a crash
    # BETWEEN the parquet append and the epoch commit would replay the
    # epoch and append twice — plain foreachBatch+append is
    # at-least-once, and a production sink gets exactly-once by writing
    # epoch-id-named files (or a transactional table format) so replays
    # overwrite instead of duplicate.
    from etl_based_real_time_air_quality_monitoring_system_spark.streaming.pipeline import (
        run_to_partitioned_parquet,
    )

    # key the sink + checkpoint by the SOURCE FILE's identity, not just
    # the sf path: the file-stream source tracks processed files by
    # name, so a regenerated events.parquet under the same path would
    # otherwise be skipped and the read-back would serve stale rows.
    # Same file -> same dir -> idempotent re-run; new file -> fresh dir.
    st = os.stat(os.path.join(sf, "events.parquet"))
    tag = f"{sf.strip('/').replace('/', '_')}_{st.st_size}_{st.st_mtime_ns}"
    out = os.path.join(_GATE_SINK_ROOT, f"stream_events_{tag}")
    ck = out + "_ck"
    stream = _events_file_stream(spark, sf).select("event_id", "event_type", "value")
    q = run_to_partitioned_parquet(
        stream, out, ck, partition_cols=("event_type",), available_now=True
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    return back.groupBy("event_type").agg(
        F.count("*").alias("record_count"),
        F.sum(F.col("value").cast("decimal(20,6)")).cast("double").alias("value_sum"),
    )


def _q_streaming_cdc_apply(spark: SparkSession, sf: str) -> DataFrame:
    # the T-family x CDC composition in the gate: a REAL availableNow
    # stream of versioned keyed updates (events re-cast as a CDC log,
    # 'error' = tombstone), applied per micro-batch onto a
    # generation-sequenced parquet snapshot via foreachBatch.  The
    # merge carries a VERSION GUARD and retains tombstones, so the
    # final snapshot is identical for ANY micro-batch composition or
    # delivery order — and a re-run over rewritten source files
    # converges to the same answer (equal versions never replace).
    # Oracle: the max-version row per user, minus users whose latest
    # event is a tombstone.
    from etl_based_real_time_air_quality_monitoring_system_spark.streaming.pipeline import (
        read_cdc_snapshot,
        run_cdc_apply,
        stream_json_records,
    )

    events = load_table(spark, sf, "events")
    updates = events.select(
        "user_id",
        F.col("event_id").alias("version"),
        "value",
        (F.col("event_type") == "error").alias("_deleted"),
    )
    st = os.stat(os.path.join(sf, "events.parquet"))
    tag = f"{sf.strip('/').replace('/', '_')}_{st.st_size}_{st.st_mtime_ns}"
    src = _gate_sink(sf, f"cdc_updates_{tag}")
    snap = _gate_sink(sf, f"cdc_snapshot_{tag}")
    ck = snap + "_ck"
    # 4 json files -> 4 micro-batches at maxFilesPerTrigger=1; hash
    # repartitioning scatters versions across batches, exercising the
    # out-of-order path every run
    updates.repartition(4).write.mode("overwrite").json(src)
    schema = _cdc_update_schema()
    stream = stream_json_records(spark, src, schema, max_files_per_trigger=1)
    q = run_cdc_apply(stream, snap, ck, key="user_id", version_col="version")
    q.awaitTermination()
    return read_cdc_snapshot(spark, snap, delete_col="_deleted")


def _q_streaming_late_data_drop(spark: SparkSession, sf: str) -> DataFrame:
    # T5's actual late-data-DROP semantic in the gate, through the
    # operator that genuinely enforces it on this engine:
    # dropDuplicatesWithinWatermark filters input rows older than the
    # propagated watermark (probed: windowed AGGREGATION on Spark
    # 4.1.2 exercises the documented "may be dropped" latitude and
    # never drops — it reopens and re-emits the closed window — and
    # the stateful operator's filter watermark lags the reported one
    # by a batch, hence three mtime-ordered micro-batches here: batch
    # 1 establishes the 11:49:24 watermark, batch 2 rides inside it,
    # batch 3 delivers rows two hours older, which MUST be dropped).
    # Every row is a pure function of an index i, so the oracle
    # re-derives the survivors term-for-term; if the watermark stopped
    # dropping, the hour-9 rows would surface and fail rows+hash.
    import datetime as _dt
    import json as _json
    import shutil as _shutil

    from etl_based_real_time_air_quality_monitoring_system_spark.streaming.pipeline import (
        dedup_within_watermark,
        stream_json_records,
    )

    root = _gate_sink(sf, "late_drop")
    _shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(root, "src")
    os.makedirs(src)

    def row(i: int, base_h: int, off_s: int) -> str:
        ts = _dt.datetime(2024, 1, 1, base_h) + _dt.timedelta(seconds=off_s)
        return _json.dumps(
            {
                "event_id": i,
                "ts": ts.strftime("%Y-%m-%d %H:%M:%S"),
                "event_type": f"type_{i % 3}",
                "value": float(i),
            }
        )

    files = {
        # batch 1 (on-time): 10:00:00..11:59:24 -> watermark 11:49:24
        "a_warmup.json": [row(i, 10, i * 36) for i in range(200)],
        # batch 2 (on-time, watermark now propagated): 11:50:00..11:50:49
        "b_inside.json": [row(i, 11, 3000 + (i - 200)) for i in range(200, 250)],
        # batch 3: even i -> hour 9, two hours BELOW the watermark
        # (must drop); odd i -> hour 12 (must pass)
        "c_late.json": [
            row(i, 9 if i % 2 == 0 else 12, i - 250) for i in range(250, 350)
        ],
    }
    for k, (name, lines) in enumerate(files.items()):
        p = os.path.join(src, name)
        with open(p, "w") as fh:
            fh.write("\n".join(lines))
        t0 = os.path.getmtime(os.path.join(src, "a_warmup.json"))
        os.utime(p, (t0 + 10 * k, t0 + 10 * k))

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = stream_json_records(spark, src, schema, max_files_per_trigger=1)
    # unique per-row key: nothing is a duplicate, so the ONLY thing the
    # operator can remove is watermark-late input
    deduped = dedup_within_watermark(
        stream, ["event_id"], ts_col="ts", watermark="10 minutes"
    )
    name = f"late_drop_{_sf_tag(sf)}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy(
            F.hour("ts").alias("event_hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("record_count"),
            F.sum(F.col("value").cast("long")).alias("value_sum"),
        )
    )


def _q_cdc_time_travel(spark: SparkSession, sf: str) -> DataFrame:
    # lakehouse TIME TRAVEL over the CDC snapshot machinery: four
    # mtime-ordered micro-batches (batch b = updates with version%4 ==
    # b, so batch membership is SQL-derivable), generations retained
    # with their epoch ids.  read_cdc_snapshot(asof_epoch=1) must equal
    # replaying only the updates of epochs 0-1 through the
    # version-guarded merge — the oracle re-derives BOTH the latest
    # and the historical snapshot from the version rule, live rows
    # value-for-value.
    import glob as _glob
    import shutil as _shutil

    from etl_based_real_time_air_quality_monitoring_system_spark.streaming.pipeline import (
        read_cdc_snapshot,
        run_cdc_apply,
        stream_json_records,
    )

    events = load_table(spark, sf, "events")
    updates = events.select(
        "user_id",
        F.col("event_id").alias("version"),
        "value",
        (F.col("event_type") == "error").alias("_deleted"),
    )
    root = _gate_sink(sf, "cdc_tt")
    _shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(root, "src")
    os.makedirs(src)
    for b in range(4):
        part_dir = os.path.join(root, f"part{b}")
        (
            updates.filter(F.col("version") % 4 == b)
            .coalesce(1)
            .write.mode("overwrite")
            .json(part_dir)
        )
        (part_file,) = _glob.glob(os.path.join(part_dir, "part-*.json"))
        dst = os.path.join(src, f"b{b}.json")
        os.replace(part_file, dst)
        t0 = os.path.getmtime(os.path.join(src, "b0.json"))
        os.utime(dst, (t0 + 10 * b, t0 + 10 * b))
    schema = _cdc_update_schema()
    stream = stream_json_records(spark, src, schema, max_files_per_trigger=1)
    q = run_cdc_apply(
        stream,
        os.path.join(root, "snap"),
        os.path.join(root, "ck"),
        key="user_id",
        version_col="version",
        keep_generations=4,
    )
    q.awaitTermination()
    latest = read_cdc_snapshot(spark, os.path.join(root, "snap"), "_deleted")
    asof = read_cdc_snapshot(
        spark, os.path.join(root, "snap"), "_deleted", asof_epoch=1
    )
    return latest.select(
        F.lit("latest").alias("snap"), "user_id", "version", "value"
    ).unionByName(
        asof.select(F.lit("asof_epoch_1").alias("snap"), "user_id", "version", "value")
    )


def _q_cdc_vacuum(spark: SparkSession, sf: str) -> DataFrame:
    # explicit VACUUM over the CDC snapshot history: build the same
    # 4-generation snapshot as cdc_time_travel (keep_generations=4),
    # read latest + asof_commit=3 and MATERIALIZE the rows BEFORE
    # vacuum, prune retention to the newest 2 generations, read both
    # again AFTER.  The oracle
    # emits each snapshot twice (pre/post), so the gate proves
    # in-retention time travel is byte-identical across the vacuum —
    # a marker-truncation bug (wrong slice kept, re-resolution
    # drifting to another generation) changes the post rows and fails
    # rows+hash.  The fail-fast path for out-of-retention reads is
    # pytest-pinned (vacuum_cdc_snapshots tests).
    import glob as _glob
    import shutil as _shutil

    from etl_based_real_time_air_quality_monitoring_system_spark.streaming.pipeline import (
        read_cdc_snapshot,
        run_cdc_apply,
        stream_json_records,
        vacuum_cdc_snapshots,
    )

    events = load_table(spark, sf, "events")
    updates = events.select(
        "user_id",
        F.col("event_id").alias("version"),
        "value",
        (F.col("event_type") == "error").alias("_deleted"),
    )
    root = _gate_sink(sf, "cdc_vac")
    _shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(root, "src")
    os.makedirs(src)
    for b in range(4):
        part_dir = os.path.join(root, f"part{b}")
        (
            updates.filter(F.col("version") % 4 == b)
            .coalesce(1)
            .write.mode("overwrite")
            .json(part_dir)
        )
        (part_file,) = _glob.glob(os.path.join(part_dir, "part-*.json"))
        dst = os.path.join(src, f"b{b}.json")
        os.replace(part_file, dst)
        t0 = os.path.getmtime(os.path.join(src, "b0.json"))
        os.utime(dst, (t0 + 10 * b, t0 + 10 * b))
    schema = _cdc_update_schema()
    stream = stream_json_records(spark, src, schema, max_files_per_trigger=1)
    snap = os.path.join(root, "snap")
    q = run_cdc_apply(
        stream,
        snap,
        os.path.join(root, "ck"),
        key="user_id",
        version_col="version",
        keep_generations=4,
    )
    q.awaitTermination()

    def reads(phase: str) -> DataFrame:
        latest = read_cdc_snapshot(spark, snap, "_deleted")
        asof = read_cdc_snapshot(spark, snap, "_deleted", asof_commit=3)
        return latest.select(
            F.lit(phase).alias("phase"),
            F.lit("latest").alias("snap"),
            "user_id",
            "version",
            "value",
        ).unionByName(
            asof.select(
                F.lit(phase).alias("phase"),
                F.lit("asof_commit_3").alias("snap"),
                "user_id",
                "version",
                "value",
            )
        )

    # MATERIALIZE the pre-vacuum reads before pruning (eager
    # localCheckpoint): the generations they happen to resolve to
    # (gen-4, gen-3) survive this particular vacuum, but a lazy `pre`
    # would silently become a read-after-delete trap for anyone
    # widening the prune — the checkpoint pins actual pre-vacuum DATA,
    # not just pre-vacuum resolution
    pre = reads("pre_vacuum").localCheckpoint()
    pruned = vacuum_cdc_snapshots(snap, keep_generations=2)
    assert pruned == ["gen-000002", "gen-000001"], pruned
    return pre.unionByName(reads("post_vacuum"))


def _q_funnel_over_cdc(spark: SparkSession, sf: str) -> DataFrame:
    # the interaction matrix, not operators in isolation: an ordered
    # funnel computed over a CDC-MAINTAINED snapshot.  The event log
    # doubles as a mutation stream (latest version per user decides
    # live vs tombstoned); run_cdc_apply materializes the snapshot
    # through real micro-batches, then funnel_stages runs per snapshot
    # segment.  The oracle re-derives the version-resolved segments
    # AND the three chained stage minimums — a composition bug in
    # either family (or in their join) breaks rows+hash.
    import shutil as _shutil

    from etl_based_real_time_air_quality_monitoring_system_spark.operators.funnel import funnel_stages
    from etl_based_real_time_air_quality_monitoring_system_spark.streaming.pipeline import (
        read_cdc_snapshot,
        run_cdc_apply,
        stream_json_records,
    )

    events = load_table(spark, sf, "events")
    updates = events.select(
        "user_id",
        F.col("event_id").alias("version"),
        (F.col("event_type") == "error").alias("_deleted"),
    )
    root = _gate_sink(sf, "funnel_cdc")
    _shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(root, "src")
    # order-independent by design (version guard), so a plain hash
    # scatter into 4 files / 4 micro-batches suffices here
    updates.repartition(4).write.mode("overwrite").json(src)
    schema = _cdc_update_schema(with_value=False)
    stream = stream_json_records(spark, src, schema, max_files_per_trigger=1)
    q = run_cdc_apply(
        stream,
        os.path.join(root, "snap"),
        os.path.join(root, "ck"),
        key="user_id",
        version_col="version",
    )
    q.awaitTermination()
    snap = read_cdc_snapshot(spark, os.path.join(root, "snap"))
    seg = snap.select(
        "user_id",
        F.when(F.coalesce(F.col("_deleted"), F.lit(False)), F.lit("deleted"))
        .otherwise(F.lit("live"))
        .alias("segment"),
    )
    out = None
    for s in ("live", "deleted"):
        members = seg.filter(F.col("segment") == s).select("user_id")
        piece = funnel_stages(
            events.join(F.broadcast(members), "user_id", "left_semi"),
            "user_id",
            "ts",
            "event_type",
            ["signup", "click", "purchase"],
        ).select(F.lit(s).alias("segment"), "stage", "users")
        out = piece if out is None else out.unionByName(piece)
    return out


def _q_http_ingest_simulated(spark: SparkSession, sf: str) -> DataFrame:
    # the S1->P5->P6->P7 ingest path in the gate: deterministic
    # WeatherAPI payload simulation (md5-derived fields — DuckDB
    # re-derives every value term-for-term), engine-side from_json
    # flatten, error-envelope drop, missing-pollutant zero-defaulting.
    # This is the reference producer's whole parse pipeline
    # (producer.py:35-89) value-checked, not just smoke-tested.
    from etl_based_real_time_air_quality_monitoring_system_spark.sources.http import (
        ingest_payloads,
        simulate_weather_docs,
    )

    flat = ingest_payloads(spark, simulate_weather_docs(210))
    n = F.count("*")
    temp_sum = F.sum(F.col("temp_c").cast("decimal(20,10)")).cast("double")
    return flat.groupBy("location").agg(
        n.alias("record_count"),
        F.sum("humidity").cast("long").alias("humidity_sum"),
        (F.floor(temp_sum / n * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)).alias(
            "avg_temp_c"
        ),
        F.sum((F.col("pm2_5") == 0.0).cast("long")).alias("zero_pm_docs"),
    )


def _q_multimodal_decode(spark: SparkSession, sf: str) -> DataFrame:
    # REAL header decode in the gate: the corpus is valid BMP /
    # PCM-WAV / PNG / GIF / JPEG / TIFF (both byte orders) / FLAC
    # bytes whose dimensions are pure arithmetic over the asset id, so
    # the struct.unpack parsers (multimodal.decode_header, incl. the
    # JPEG marker walk, the TIFF IFD walk and the FLAC STREAMINFO
    # bit-unpack) are checked field-for-field against an oracle that
    # re-derives each dimension from the id — a genuine encode->decode
    # round trip across seven container formats
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.multimodal import (
        decode_assets,
        synthesize_media_assets,
    )

    assets = synthesize_media_assets(
        spark, 48, 16, n_png=24, n_gif=24, n_jpeg=24, n_tiff=24, n_flac=24
    )
    decoded = decode_assets(assets)
    return decoded.select(
        "asset_id",
        "modality",
        "format",
        F.coalesce("width", F.lit(0)).cast("int").alias("width"),
        F.coalesce("height", F.lit(0)).cast("int").alias("height"),
        F.coalesce("sample_rate", F.lit(0)).cast("int").alias("sample_rate"),
        F.coalesce("channels", F.lit(0)).cast("int").alias("channels"),
        F.coalesce("n_frames", F.lit(0)).cast("int").alias("n_frames"),
    )


def _q_train_test_split(spark: SparkSession, sf: str) -> DataFrame:
    # deterministic content-hash split (md5-bucket, no RNG): stable
    # under repartitioning and bit-identical in any engine — the split
    # counts per source are therefore exactly oracle-checkable
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.sampling import train_test_split

    docs = load_table(spark, sf, "documents")
    tagged = train_test_split(docs, "doc_id", test_pct=10)
    return tagged.groupBy("source", "split").agg(
        F.count("*").alias("doc_count")
    )


def _q_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    # corpus mixing: deterministic per-stratum downsampling (keep 60%
    # of src0/src1, 20% of src2/src3, drop the rest) via md5-bucket
    # thresholds — no RNG, repartition-stable, exactly reproduced by
    # the oracle.  Aggregated per source so the gate compares the
    # actual sampling decisions compactly.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf, "documents")
    kept = stratified_sample(
        docs,
        "source",
        "doc_id",
        rates={"src0": 0.6, "src1": 0.6, "src2": 0.2, "src3": 0.2},
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("kept_docs"),
        F.sum("n_chars").alias("kept_chars"),
    )


def _q_group_split(spark: SparkSession, sf: str) -> DataFrame:
    # leakage-safe split: bucket on the GROUP key (source), so every
    # row of a group lands on one side; the per-(source, split) matrix
    # makes any leak a row-count mismatch
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.sampling import group_split

    docs = load_table(spark, sf, "documents")
    tagged = group_split(docs, "source", test_pct=25)
    return tagged.groupBy("source", "split").agg(
        F.count("*").alias("doc_count"),
        F.sum("n_chars").alias("char_count"),
    )


def _q_retrieval_ndcg(spark: SparkSession, sf: str) -> DataFrame:
    # embedding-retrieval quality eval: NDCG@10 under binary label
    # relevance for 20 query vectors.  Discounts are pre-quantized
    # integer micros shared between the plan and the oracle, so DCG /
    # IDCG / NDCG are all exact integer arithmetic — the ranking
    # itself uses the repo's rounded-cosine + id total order.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.similarity import (
        retrieval_ndcg,
    )

    emb = load_table(spark, sf, "embeddings")
    return retrieval_ndcg(
        emb, emb.filter(F.col("vec_id") < 20), "vec_id", "embedding", "label", k=10
    )


def _q_pps_sample(spark: SparkSession, sf: str) -> DataFrame:
    # deterministic systematic PPS sampling (Madow 1949): ~50 docs
    # drawn proportional to n_chars on the salted-hash line; selection
    # is pure integer math ((cum*n) DIV total boundary crossings), so
    # the oracle re-derives the exact member set + boundary ranks
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.sampling import (
        pps_systematic_sample,
    )

    docs = load_table(spark, sf, "documents")
    out = pps_systematic_sample(docs, "doc_id", "n_chars", 50)
    return out.select("doc_id", "n_chars", "sample_rank")


def _q_mixture_sample(spark: SparkSession, sf: str) -> DataFrame:
    # target-mixture corpus assembly (60/30/10 across three sources,
    # budget set by the scarcest): all-integer quota math + hash-rank
    # membership, so both the per-source counts AND the exact kept set
    # (sum of ids) are engine-portable and oracle-pinned
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.sampling import mixture_sample

    docs = load_table(spark, sf, "documents")
    mixed = mixture_sample(docs, "source", "doc_id", {"src0": 6, "src1": 3, "src2": 1})
    return mixed.groupBy("source").agg(
        F.count("*").alias("doc_count"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
    )


def _q_token_budget_prefix(spark: SparkSession, sf: str) -> DataFrame:
    # "assemble exactly N tokens": hash-ordered prefix under a global
    # token budget, computed with the scale-safe coarse-bucket +
    # prefix-offset formulation (never a single-partition global
    # window); the oracle recomputes the same prefix with one flat
    # SQL running sum — counts, token total, and exact membership
    # (id checksum) must all agree
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.sampling import (
        token_budget_prefix,
    )
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import token_count

    docs = load_table(spark, sf, "documents")
    kept = token_budget_prefix(docs, "doc_id", token_count("text"), budget=2000)
    return kept.agg(
        F.count("*").alias("kept_docs"),
        F.sum(token_count("text")).cast("long").alias("total_tokens"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
    )


def _q_stratified_quota_sample(spark: SparkSession, sf: str) -> DataFrame:
    # EXACT per-stratum quotas (budgeted corpus mixing): membership is
    # a deterministic hash ranking, so sum(doc_id) pins the exact kept
    # set, not just its size
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.sampling import (
        stratified_quota_sample,
    )

    docs = load_table(spark, sf, "documents")
    kept = stratified_quota_sample(
        docs, "source", "doc_id", {"src0": 40, "src1": 15}, default_quota=5
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("kept_docs"),
        F.sum("doc_id").alias("id_sum"),
    )


def _q_doc_chunks(spark: SparkSession, sf: str) -> DataFrame:
    # pretraining chunk prep: slice every document's token stream into
    # 16-token windows every 12 tokens (overlap 4), drop a trailing
    # window that adds no new tokens.  Pure in-scan expansion —
    # sequence + posexplode + slice, no shuffle until the gate's
    # per-source accounting agg; chunk identity checked via md5 of the
    # joined window.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import chunk_documents

    docs = load_table(spark, sf, "documents")
    chunks = chunk_documents(docs, "text", "doc_id", 16, 12)
    return chunks.groupBy("chunk_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("chunk_tokens").alias("total_tokens"),
        F.count_distinct("chunk_hash").alias("distinct_chunks"),
    ).orderBy("chunk_id")


def _q_tfidf_terms(spark: SparkSession, sf: str) -> DataFrame:
    # top-3 characteristic terms per document by tf-idf with the
    # RATIONAL idf (tf * N/df — no ln(), whose last-ulp differs
    # between libm and the JVM and would break exact comparison).
    # Corpus rows move once (tokenize->tf), the vocabulary twice.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import tfidf_terms

    docs = load_table(spark, sf, "documents")
    return tfidf_terms(docs, "text", "doc_id", k=3, ids_unique=True)


def _q_zscore_outliers(spark: SparkSession, sf: str) -> DataFrame:
    # feature scaling + outlier detection: per-event-type z-score
    # (decimal sums -> one double collapse -> identical IEEE op chain
    # on both engines, no rounding), keep |z| > 3.  The per-key stats
    # broadcast back onto the scan — at 100 TB the stats table is
    # #keys-sized.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.aggregates import zscore

    events = load_table(spark, sf, "events")
    scored = zscore(events, "event_type", "value")
    return scored.filter(F.abs(F.col("z")) > 3.0).select(
        "event_id", "event_type", "value", "z"
    )


def _q_top_tokens(spark: SparkSession, sf: str) -> DataFrame:
    # the canonical wordcount shape: explode tokens -> partial+final
    # count -> TakeOrderedAndProject(50).  The generator runs inside
    # the scan stage (no pre-shuffle materialization); only (token,
    # partial count) rows shuffle.  r13: the spread_small_input that
    # used to sit on the scan was this query's inverse-scaling cause
    # (r12 verdict item: 32-core/8-core ratio 0.41) AND a net loss at
    # every measured core count — the round-robin exchange moves the
    # full text (plus its sort-before-repartition) to parallelize a
    # projection cheap enough that the partial count already bounds
    # the stage (isolated warm at sf0.1: 0.54 s spread vs 0.18 s
    # plain at 32 cores, 0.29 vs 0.21 at 8).  At 100 TB the scan has
    # thousands of partitions and the spread was a no-op anyway.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import tokens

    docs = load_table(spark, sf, "documents")
    return (
        docs.select("text")
        .select(F.explode(tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("occurrences"))
        .orderBy(F.desc("occurrences"), F.asc("token"))
        .limit(50)
    )


def _q_corpus_filter(spark: SparkSession, sf: str) -> DataFrame:
    # the canonical pretraining-corpus filter: quality score + lang-ID
    # + token-count bounds composed in ONE scan — tokenized ONCE per
    # casing (the _of family), not once per metric
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import (
        lang_id_of,
        quality_score_of,
        token_count_of,
        tokens,
    )

    docs = load_table(spark, sf, "documents")
    tokenized = docs.select(
        "doc_id",
        "source",
        tokens("text").alias("_toks"),
        tokens(F.lower(F.col("text"))).alias("_ltoks"),
    )
    profiled = tokenized.select(
        "doc_id",
        "source",
        quality_score_of(F.col("_toks")).alias("quality"),
        lang_id_of(F.col("_ltoks")).alias("lang_pred"),
        token_count_of(F.col("_toks")).alias("n_tokens"),
    )
    kept = profiled.filter(
        (F.col("quality") >= 0.5)
        & (F.col("lang_pred") == "en")
        & F.col("n_tokens").between(20, 2000)
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("kept_docs"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
        F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
    )


def _q_corpus_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    # the capstone composition: exact dedup (deterministic min-id
    # survivor) -> quality/lang/token filter -> per-source accounting
    from etl_based_real_time_air_quality_monitoring_system_spark.plans.corpus import (
        corpus_report,
        prepare_corpus,
    )

    docs = load_table(spark, sf, "documents")
    return corpus_report(prepare_corpus(docs))


def _q_corpus_assembly(spark: SparkSession, sf: str) -> DataFrame:
    # the end-to-end assembly capstone: exact dedup + quality/lang
    # filter -> 50/30/20 source mixture -> 1200-token budget prefix ->
    # deterministic shards; every stage hash-driven, so the oracle
    # re-derives the exact final shard contents (counts, id checksums,
    # token totals) through the same CTE chain
    from etl_based_real_time_air_quality_monitoring_system_spark.plans.corpus import assemble_corpus

    docs = load_table(spark, sf, "documents")
    out = assemble_corpus(
        docs, {"src0": 5, "src1": 3, "src2": 2}, token_budget=1200, n_shards=4
    )
    return out.groupBy("source", "shard").agg(
        F.count("*").alias("doc_count"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
        F.sum("n_tokens").cast("long").alias("token_total"),
    )


def _q_embedding_gram(spark: SparkSession, sf: str) -> DataFrame:
    # the distributed second-moment pass of PCA/covariance: per-batch
    # integer GEMM partials (quantized half-up to micros) combined by
    # an associative integer sum — bit-identical on any partitioning,
    # so the full upper-triangle Gram matrix is oracle-checkable
    # value-for-value
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.similarity import gram_matrix_micros

    emb = load_table(spark, sf, "embeddings")
    return gram_matrix_micros(emb, "embedding")


def _q_zorder_cells(spark: SparkSession, sf: str) -> DataFrame:
    # the Z-order layout engine's VALUE computation in the gate:
    # min/max rank-scaling onto the 4096-grid (deterministic IEEE-754
    # (x-lo)*k with k precomputed once) + 24-bit Morton interleave,
    # aggregated into the top-6-bit cells — the oracle re-derives
    # every z-value term-for-term, pinning both the scaling and the
    # bit arithmetic that decide the physical sort order
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.layout import zorder_value

    events = load_table(spark, sf, "events")
    z = zorder_value(events, ["user_id", "value"], bits=12)
    return (
        events.select(z.alias("z"))
        .groupBy(F.shiftright(F.col("z"), 18).alias("cell"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("z").cast("long").alias("z_sum"),
        )
    )


def _q_zorder_pruning(spark: SparkSession, sf: str) -> DataFrame:
    # the Z-order layout's BENEFIT gate: the same events written
    # linear-sorted (range-partitioned on user_id alone) and z-ordered
    # (user_id, value) are read back through one two-predicate box
    # filter — the layouts MUST agree row-for-row (layout can only
    # change physical performance, never the answer).  The actual
    # row-group skipping advantage (z-ordered scans intersect strictly
    # fewer row-group stat boxes) is pinned in pytest via parquet
    # footer metadata, where the inequality is layout-deterministic.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.layout import write_zordered

    ev = load_table(spark, sf, "events").select("event_id", "user_id", "value")
    b = ev.agg(
        F.min("user_id").alias("lu"),
        F.max("user_id").alias("hu"),
        F.min("value").alias("lv"),
        F.max("value").alias("hv"),
    ).collect()[0]
    # box bounds derived from global min/max with exact integer // and
    # IEEE double arithmetic — DuckDB re-derives them bit-for-bit
    ulo = b["lu"] + (b["hu"] - b["lu"]) * 2 // 5
    uhi = b["lu"] + (b["hu"] - b["lu"]) * 9 // 20
    vlo = b["lv"] + (b["hv"] - b["lv"]) * 0.4
    vhi = b["lv"] + (b["hv"] - b["lv"]) * 0.45
    lin, zo = _gate_sink(sf, "zorder_lin"), _gate_sink(sf, "zorder_zo")
    (
        ev.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lin)
    )
    # the box-bounds aggregate above already holds each column's global
    # min/max — pass them through so write_zordered skips its two
    # per-column statistics jobs (one shared stats pass, three uses)
    write_zordered(
        ev,
        zo,
        ["user_id", "value"],
        bits=12,
        n_files=8,
        bounds={
            "user_id": (float(b["lu"]), float(b["hu"])),
            "value": (float(b["lv"]), float(b["hv"])),
        },
    )
    parts = []
    for name, path in (("linear", lin), ("zorder", zo)):
        parts.append(
            spark.read.parquet(path)
            .filter(
                F.col("user_id").between(ulo, uhi)
                & F.col("value").between(vlo, vhi)
            )
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("event_id").cast("long").alias("id_checksum"),
            )
            .select(F.lit(name).alias("layout"), "n_rows", "id_checksum")
        )
    return parts[0].unionByName(parts[1])


def _q_hourly_ohlc(spark: SparkSession, sf: str) -> DataFrame:
    # per-user hourly OHLC bars in ONE hash aggregate: open/close via
    # min/max over struct(ts, value) — total lexicographic order makes
    # boundary ties engine-exact, no window anywhere
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.timeseries import resample_ohlc

    events = load_table(spark, sf, "events")
    return resample_ohlc(events, "user_id", "ts", "value", unit="hour")


def _q_lang_pred_counts(spark: SparkSession, sf: str) -> DataFrame:
    # marker-based language-ID heuristic, distribution of predictions
    docs = load_table(spark, sf, "documents")
    return (
        docs.select(lang_id("text").alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count("*").alias("doc_count"))
    )


def _q_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    # near-dup pairs by word-3-gram Jaccard similarity
    docs = load_table(spark, sf, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.1)


def _q_ngram_jaccard_capped(spark: SparkSession, sf: str) -> DataFrame:
    # the SCALE path of the inverted index: max_shingle_docs df-cut
    # drops shingles shared by more than K docs before pair expansion
    # (a shingle in d docs costs d^2 pair rows — the cap is what keeps
    # 100 TB tractable).  Jaccard is defined within the capped
    # vocabulary, so per-doc set sizes are recomputed post-cut
    # (operators/dedup.py:127-156); this query pins that recompute +
    # join-back logic against a DuckDB twin applying the same HAVING
    # df-cut — the branch "you ALWAYS set at scale" is now
    # oracle-verified, not just pytest-verified
    docs = load_table(spark, sf, "documents")
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.05, max_shingle_docs=4
    )


def _q_minhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    # MinHash(16) + LSH(4 bands of 4) candidate pairs — md5 hash family
    # keeps this bit-identical to the SQL oracle
    docs = load_table(spark, sf, "documents")
    return minhash_lsh_candidates(docs, "doc_id", "text", n=3, k=16, bands=4)


def _q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    # duplicate-cluster resolution: MinHash/LSH candidate pairs ->
    # connected components (iterative hash-to-min + pointer jumping,
    # operators/graph.py) -> (doc_id, cluster_id) with cluster_id =
    # min doc_id of the cluster.  The canonical keep-one-per-cluster
    # step of a pretraining dedup pipeline; exactly oracle-checked
    # against a recursive-CTE transitive closure.
    docs = load_table(spark, sf, "documents")
    pairs = minhash_lsh_candidates(docs, "doc_id", "text", n=3, k=16, bands=4)
    cc = connected_components(pairs, "doc_a", "doc_b")
    return cc.select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def _q_fuzzy_dedup_corpus(spark: SparkSession, sf: str) -> DataFrame:
    # the full fuzzy-dedup pipeline end-to-end: MinHash/LSH pairs ->
    # connected components -> keep ONE canonical doc per cluster (the
    # min doc_id, i.e. cluster_id == doc_id) -> per-source survivor
    # accounting.  Non-candidate docs never enter the pair graph and
    # survive by the anti-join; only the loser set (cluster members
    # that aren't the canonical doc) is dropped.
    docs = load_table(spark, sf, "documents")
    pairs = minhash_lsh_candidates(docs, "doc_id", "text", n=3, k=16, bands=4)
    cc = connected_components(pairs, "doc_a", "doc_b")
    losers = cc.filter(F.col("vertex") != F.col("component")).select(
        F.col("vertex").alias("doc_id")
    )
    kept = docs.join(losers, "doc_id", "left_anti")
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("kept_docs"),
            F.sum("n_chars").alias("kept_chars"),
        )
        .orderBy("source")
    )


def _q_simhash(spark: SparkSession, sf: str) -> DataFrame:
    # 60-bit SimHash fingerprints from per-token md5 bits
    docs = load_table(spark, sf, "documents")
    return simhash(docs, "doc_id", "text")


def _q_simhash_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    # near-dup pairs by SimHash hamming distance, prefix-blocked so the
    # pair join is per-block (bit_count/xor are cross-engine exact)
    docs = load_table(spark, sf, "documents")
    return simhash_near_pairs(docs, "doc_id", "text", max_hamming=16, prefix_bits=8)


def _get_query_vec(spark: SparkSession, sf: str, vec_id: int = 0) -> list[float]:
    row = (
        load_table(spark, sf, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .head()
    )
    return [float(x) for x in row["embedding"]]


def _q_embedding_topk(spark: SparkSession, sf: str) -> DataFrame:
    # brute-force cosine top-10 (exact ANN baseline)
    emb = load_table(spark, sf, "embeddings")
    return brute_force_topk(emb, "vec_id", "embedding", _get_query_vec(spark, sf), k=10)


def _q_knn_join(spark: SparkSession, sf: str) -> DataFrame:
    # batched kNN: top-5 corpus neighbors for each of 3 query vectors
    emb = load_table(spark, sf, "embeddings")
    qs = emb.filter(F.col("vec_id") < 3)
    return knn_join(emb, qs, "vec_id", "embedding", "vec_id", "embedding", k=5)


def _q_nn_label_confusion(spark: SparkSession, sf: str) -> DataFrame:
    # embedding-space dataset diagnostic: 1-NN label confusion (label-
    # noise audit) — exact all-pairs baseline; the 100 TB path swaps in
    # ANN candidates and reuses the same confusion aggregate
    emb = load_table(spark, sf, "embeddings")
    return nn_label_confusion(emb, "vec_id", "embedding", "label")


def _q_embedding_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    # embedding-cosine near-dup pairs, exact baseline (the scale path,
    # cosine_near_dup_lsh, is recall-tested against this in tests)
    emb = load_table(spark, sf, "embeddings")
    return cosine_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.35)


def _q_embedding_near_dup_gemm(spark: SparkSession, sf: str) -> DataFrame:
    # same exact pairs via the Arrow/BLAS blocked-GEMM seam (~50x the
    # JVM fold at sf0.1) — the vectorized-pandas-UDF scale path,
    # verified against the same SQL oracle
    emb = load_table(spark, sf, "embeddings")
    return cosine_near_dup_gemm(emb, "vec_id", "embedding", threshold=0.35)


def _q_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    # IVF-Flat approximate top-k (no SQL oracle — centroid assignment
    # is engine-internal; recall asserted in tests vs brute force)
    emb = load_table(spark, sf, "embeddings")
    return ivf_topk(
        emb, "vec_id", "embedding", _get_query_vec(spark, sf),
        k=10, n_centroids=8, n_probe=4,
    )


def _q_ivf_topk_exhaustive(spark: SparkSession, sf: str) -> DataFrame:
    # the IVF code path probed exhaustively (n_probe = n_centroids)
    # equals exact brute force, so THIS variant is oracle-checked in
    # the gate itself; the approximate n_probe<n variant above stays
    # rows-only with recall asserted in tests
    emb = load_table(spark, sf, "embeddings")
    return ivf_topk(
        emb, "vec_id", "embedding", _get_query_vec(spark, sf),
        k=10, n_centroids=8, n_probe=8,
    )


def _q_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    # approximate top-k via random-hyperplane LSH (no SQL oracle — the
    # hyperplanes are seeded NumPy; recall is asserted in tests vs the
    # brute-force baseline)
    emb = load_table(spark, sf, "embeddings")
    return lsh_topk(
        emb, "vec_id", "embedding", _get_query_vec(spark, sf), k=10, max_hamming=6
    )


def _q_ivf_topk_recall(spark: SparkSession, sf: str) -> DataFrame:
    # the ANN QUALITY metric itself under the gate: IVF-Flat top-10
    # for five query vectors vs the exact brute-force top-10, reduced
    # to one row (n_queries, n_hits, recall_micros).  The oracle
    # re-derives the WHOLE approximate pipeline in SQL — deterministic
    # centroids (first 8 by id), per-query probe ranking, per-vector
    # assignment argmax with Spark's tie rule (array_max over
    # struct(sim, cid) keeps the HIGHEST cid), rounded-cosine rank —
    # so the recall number is hash-checked, not trusted.
    #
    # Cross-engine exactness: components are quantized to integer
    # micros FIRST (floor(x*1e6+0.5) — a scalar op, bit-identical in
    # both engines).  Every dot product / squared norm then sums
    # integers bounded by 64 * (0.6e6)^2 < 2^53, so the reductions are
    # EXACT in any summation order (numpy pairwise, Spark fold, DuckDB
    # sequential all agree bit-for-bit), and the ranking keys —
    # dot/sqrt(n2) ratios — are scalar IEEE ops on identical inputs.
    # Without this, sub-ulp summation drift could flip a probe or
    # candidate ranking between engines (the reason ivf_topk itself
    # stays rows-only).
    # r12: batched one-scan form (the lsh_topk_recall shape, measured
    # 3.6x there): the r11 body unioned 5 ivf_topk + 5 brute_force_topk
    # BRANCHES — 10 corpus scans, 10 TakeOrdered jobs, 5 joins, and the
    # 8-centroid assignment expression re-evaluated per branch.  Here
    # the scan runs ONCE: cluster assignment once per row, every
    # query's rounded cosine in the same projection, explode to skinny
    # (qid, vec_id) triples, one window for the probe-filtered IVF rank
    # and one for the brute-force rank.  Search-equivalent by
    # construction: probes come from the SAME driver-side rule
    # (ivf_probes — extracted from ivf_topk, not copied), the cosine /
    # rounding expressions are identical, and row_number over
    # (cos desc, vec_id) is the same total order TakeOrdered(10) used —
    # so both top-10 sets, hence n_hits, are unchanged (oracle-pinned).
    from pyspark.sql import Window

    from etl_based_real_time_air_quality_monitoring_system_spark.operators.similarity import (
        cosine,
        ivf_assign,
        ivf_centroids,
        ivf_probes,
        vec_lit,
    )

    emb = load_table(spark, sf, "embeddings").select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * F.lit(1000000.0) + F.lit(0.5)).cast("double"),
        ).alias("embedding"),
    )
    qrows = (
        emb.filter(F.col("vec_id") < 5)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .orderBy("vec_id")
        .collect()
    )
    cents = ivf_centroids(emb, "vec_id", "embedding", 8)
    structs = []
    for r in qrows:
        qv = list(r["e"])
        probes = ivf_probes(cents, qv, n_probe=4)
        structs.append(
            F.struct(
                F.lit(int(r["vec_id"])).alias("qid"),
                F.round(cosine(F.col("_e"), vec_lit(qv)), 6).alias("_cos"),
                F.col("cluster_id").isin(probes).alias("_inp"),
            )
        )
    assigned = ivf_assign(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("_e")),
        "_e",
        cents,
    )
    stacked = assigned.select(
        "vec_id", F.explode(F.array(*structs)).alias("_q")
    ).select("vec_id", "_q.qid", "_q._cos", "_q._inp")
    w = Window.partitionBy("qid").orderBy(F.desc("_cos"), F.col("vec_id"))
    ivf10 = (
        stacked.filter(F.col("_inp"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 10)
        .select("qid", "vec_id")
    )
    bf10 = (
        stacked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 10)
        .select("qid", "vec_id")
    )
    return _recall_row(ivf10, bf10, len(qrows))


#: LSH recall-gate geometry: 12 hyperplanes over the 64-dim embedding
#: space, quantized to integer micros so every signature bit is an
#: exact integer dot-product sign in ANY engine (the planes are
#: seeded-Gaussian, hence deterministic, and the SAME integer literals
#: are interpolated into the SQL oracle — precompute-the-constants
#: rule, no transcendental ever enters a compared value)
_LSH_GATE_PLANES = 12
_LSH_GATE_HAMMING = 6


def _lsh_gate_planes() -> "np.ndarray":
    import numpy as np

    from etl_based_real_time_air_quality_monitoring_system_spark.operators.similarity import hyperplanes

    return np.floor(hyperplanes(64, _LSH_GATE_PLANES, seed=42) * 1e6 + 0.5)


def _lsh_sig_sql(ref: str) -> str:
    """The packed LSH signature as DuckDB SQL over a micros-vector
    column ``ref`` — bit i = sign of an exact integer dot product
    against the SAME plane-micros literals the Spark plan carries."""
    terms = []
    for i, p in enumerate(_lsh_gate_planes()):
        lit = "[" + ", ".join(f"{int(v)}.0" for v in p) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({ref}, {lit}) > 0"
            f" THEN {1 << i} ELSE 0 END)"
        )
    joined = "\n                     + ".join(terms)
    return f"CAST({joined} AS BIGINT)"


def _q_lsh_topk_recall(spark: SparkSession, sf: str) -> DataFrame:
    # the LAST float-ranked ANN path's quality metric under the gate
    # (closing the ivf_topk_recall / pq_recall / ivfpq_recall family):
    # hyperplane-LSH top-10 for five query vectors vs the exact
    # brute-force cosine top-10, one hash-checked row.  Exactness
    # recipe = ivf_topk_recall's: embeddings AND hyperplanes quantized
    # to integer micros first, so the signature bits (sign of an
    # integer dot < 2^53), the hamming prefilter, and the
    # rounded-cosine rank are all deterministic mirrors of the SQL
    # oracle — a banding/threshold regression moves recall and fails
    # the hash.
    # Batched one-scan form (the pq_adc_knn shape; measured 3.6x over
    # 5 lsh_topk + 5 brute_force_topk branches, which scan the corpus
    # 10x and recompute the 12-plane signature 5x): signatures once,
    # every query's (hamming, rounded cosine) in the same projection,
    # explode to (qid, vec_id) triples, one window for the LSH rank
    # (hamming-prefiltered) and one for the brute-force rank — the
    # exact plan the SQL oracle mirrors.  lsh_topk itself (rows-only,
    # the production single-query path) is exercised by the lsh_topk
    # gate entry and its recall-floor pytest.
    import numpy as np
    from pyspark.sql import Window

    from etl_based_real_time_air_quality_monitoring_system_spark.operators.similarity import (
        cosine,
        lsh_signature,
        vec_lit,
    )

    emb = _pq_micros_emb(spark, sf)
    planes = _lsh_gate_planes()
    queries = _pq_gate_queries(emb)
    # the 64-dim plane table is interpolated into the SQL oracle — a
    # dimension drift would silently zero signature bits Spark-side
    # (zip_with pads with null) while the oracle errors; fail loudly
    # (ValueError, not assert: the guard must survive python -O)
    if not queries:
        raise ValueError("lsh_topk_recall: empty query set (no vec_id < 5)")
    if len(queries[0][1]) != planes.shape[1]:
        raise ValueError(
            f"lsh_topk_recall: embedding dim {len(queries[0][1])} != "
            f"plane dim {planes.shape[1]}"
        )
    structs = []
    for qid, qv in queries:
        qsig = int(
            sum(
                1 << i
                for i, p in enumerate(planes)
                if float(p @ np.asarray(qv, dtype=float)) > 0
            )
        )
        structs.append(
            F.struct(
                F.lit(int(qid)).alias("qid"),
                F.bit_count(F.col("_sig").bitwiseXOR(F.lit(qsig))).alias("_ham"),
                F.round(cosine(F.col("_e"), vec_lit(qv)), 6).alias("_cos"),
            )
        )
    stacked = (
        emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("_e")
        )
        .withColumn("_sig", lsh_signature(F.col("_e"), planes))
        .select("vec_id", F.explode(F.array(*structs)).alias("_q"))
        .select("vec_id", "_q.qid", "_q._ham", "_q._cos")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("_cos"), F.col("vec_id"))
    lsh10 = (
        stacked.filter(F.col("_ham") <= _LSH_GATE_HAMMING)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 10)
        .select("qid", "vec_id")
    )
    bf10 = (
        stacked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 10)
        .select("qid", "vec_id")
    )
    return _recall_row(lsh10, bf10, len(queries))


def _q_dq_report(spark: SparkSession, sf: str) -> DataFrame:
    # the reference's promised-but-unbuilt "Automated Data Quality
    # Checks" (README.md:46-53) as a one-pass operator: every check is
    # a conditional sum in ONE aggregation over ONE scan
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.dq import (
        dq_report,
        in_range_check,
        in_set_check,
        not_null_check,
    )

    events = load_table(spark, sf, "events")
    return dq_report(
        events,
        checks={
            "user_id_null": not_null_check("user_id"),
            "ts_null": not_null_check("ts"),
            "value_out_of_range": in_range_check("value", 0.0, 250.0),
            "event_type_unknown": in_set_check(
                "event_type", ["click", "view", "purchase", "error"]
            ),
        },
        unique_keys=["event_id"],
    )


def _q_latest_value_max_by(spark: SparkSession, sf: str) -> DataFrame:
    # A11 (latest reading) as a single max_by/arg_max aggregate — no
    # window, no self-join: one partial+final hash aggregation.
    # Deterministic because (event_type, ts) is unique in the data.
    events = load_table(spark, sf, "events")
    return events.groupBy("event_type").agg(
        F.max_by("value", "ts").alias("latest_value"),
        F.max("ts").alias("latest_ts"),
    )


def _q_value_histogram(spark: SparkSession, sf: str) -> DataFrame:
    # fixed-width histogram of event values: one aggregation, exact
    # integer counts, IEEE-deterministic bucket arithmetic
    events = load_table(spark, sf, "events")
    return histogram(events, "value", width=25.0)


def _q_priority_except_all(spark: SparkSession, sf: str) -> DataFrame:
    # EXCEPT ALL (multiset difference): order priorities of 1995-H1
    # minus 1995-H2, multiplicities preserved
    orders = load_table(spark, sf, "orders")
    h1 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    ).select("o_orderpriority")
    h2 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select("o_orderpriority")
    return except_all_rows(h1, h2)


def _q_priority_intersect_all(spark: SparkSession, sf: str) -> DataFrame:
    # INTERSECT ALL (multiset min of multiplicities), same halves
    orders = load_table(spark, sf, "orders")
    h1 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    ).select("o_orderpriority")
    h2 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select("o_orderpriority")
    return intersect_all_rows(h1, h2)


def _q_tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q18 (large-volume customer): self-aggregated HAVING filter
    # on the fact table, then the tiny qualifying set drives BROADCAST
    # joins back to orders/customer — one lineitem shuffle total, the
    # orders/customer sides never shuffle.  l_quantity is integral, so
    # the double sums are exact across engines.
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def _q_tpch_q10(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q10 (returned-item reporting): one quarter of orders,
    # returned lineitems only, revenue per customer with nation name.
    # lineitem is the only shuffled side — orders is date-filtered then
    # broadcast, customer and nation broadcast; top-20 compiles to
    # TakeOrderedAndProject.  Decimal revenue for cross-engine
    # exactness.
    li = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(20,6)"
    )
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def _q_gapfill_hourly_locf(spark: SparkSession, sf: str) -> DataFrame:
    # time-series regularization (the reference's charts connect dots
    # across sensor gaps, dashboard.py:98-105 — this materializes the
    # gaps instead): dense hourly grid per event_type, LOCF-filled
    # bucket averages.  One fact-sized agg; spine + LOCF run on the
    # aggregate (operators/timeseries.py).
    events = load_table(spark, sf, "events")
    return gap_fill_locf(events, "event_type", "ts", "value", unit="hour")


def _q_order_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    # CDC-style snapshot diff: per-customer 1997 vs 1998 order
    # count/spend, FULL OUTER joined and classified added / removed /
    # changed / unchanged.  Both sides fact-derived aggregates —
    # sort-merge on the key at scale, no broadcast.
    o = load_table(spark, sf, "orders")

    def year_agg(y: int) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (
                    F.col("o_orderdate")
                    < F.lit(f"{y + 1}-01-01").cast("timestamp")
                )
            )
            .groupBy("o_custkey")
            .agg(
                F.count("*").alias("order_cnt"),
                F.round(
                    F.sum(F.col("o_totalprice").cast("decimal(20,6)")), 2
                )
                .cast("double")
                .alias("spend"),
            )
        )

    return full_outer_diff(
        year_agg(1997), year_agg(1998), ["o_custkey"], ["order_cnt", "spend"]
    )


def _q_tpch_q4(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q4 (order-priority checking), adapted: the testdata schema
    # has no l_commitdate/l_receiptdate, so the EXISTS predicate is
    # "some lineitem shipped after the order date".  Shape is the
    # point: LEFT SEMI join with a compound (equi + inequality)
    # condition — the non-equi part rides along on the equi sort-merge
    # and never expands rows, then a tiny grouped count.
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    # transitive bound Catalyst can't derive across the non-equi
    # condition: l_shipdate > o_orderdate >= 1996-01-01 — pushing it
    # onto the scan prunes row groups before the semi-join shuffle
    li = (
        load_table(spark, sf, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp"))
        .select("l_orderkey", "l_shipdate")
    )
    shipped = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        shipped.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def _q_tpch_q7(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q7 (volume shipping): bidirectional nation-pair trade flow.
    # Both nation dims are pre-filtered to the two names so the
    # broadcast joins drop ~92% of lineitem before the single
    # fact-fact shuffle on the order key; the pair filter runs after
    # both nations are attached.  Decimal revenue for exactness.
    two = ["NATION_1", "NATION_2"]
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = load_table(spark, sf, "supplier")
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    n1 = (
        load_table(spark, sf, "nation")
        .filter(F.col("n_name").isin(two))
        .select(
            F.col("n_nationkey").alias("s_nkey"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = (
        load_table(spark, sf, "nation")
        .filter(F.col("n_name").isin(two))
        .select(
            F.col("n_nationkey").alias("c_nkey"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(20,6)"
    )
    joined = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def _q_tpch_q8(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q8 (national market share): 7-way star — part/supplier/
    # customer/nation/region all broadcast, orders⋈lineitem is the only
    # shuffle.  Share = exact decimal conditional sum / exact decimal
    # total, divided as doubles (bit-identical across engines, no
    # rounding needed).
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf, "supplier")
    c = load_table(spark, sf, "customer")
    n1 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_regionkey").alias("c_rkey"),
    )
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nkey"),
        F.col("n_name").alias("supp_nation"),
    )
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "AMERICA")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(20,6)"
    )
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == r.r_regionkey)
    )
    zero = F.lit(0).cast("decimal(20,6)")
    agged = joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(zero))
        .alias("nation_vol"),
        F.sum(rev).alias("total_vol"),
    )
    return agged.select(
        "o_year",
        (
            F.col("nation_vol").cast("double")
            / F.col("total_vol").cast("double")
        ).alias("mkt_share"),
    ).orderBy("o_year")


def _q_tpch_q15(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q15 (top supplier): quarterly revenue per supplier, keep
    # the max.  The agg output is tiny, so the "= (SELECT max(...))"
    # correlation is a global-window max over the aggregate (one extra
    # single-partition exchange of ~10k rows, never fact rows), and the
    # winner row broadcasts back to the supplier dim.  Revenue equality
    # is compared in exact decimal — safe across engines.
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(20,6)"
    )
    from pyspark.sql import Window

    per_supp = li.groupBy("l_suppkey").agg(F.sum(rev).alias("total_rev"))
    # the max is a one-row broadcast back onto the per-supplier table —
    # a global window here would funnel every supplier through one task
    # at scale; decimal sums make the max exact, so semantics match the
    # oracle's scalar subquery bit-for-bit
    mx = per_supp.agg(F.max("total_rev").alias("_max_rev"))
    top = (
        per_supp.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("_max_rev"))
        .drop("_max_rev")
    )
    s = load_table(spark, sf, "supplier")
    return (
        s.join(F.broadcast(top), s.s_suppkey == top.l_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev"), 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def _q_tpch_q17(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q17 (small-quantity-order revenue), adapted to the reduced
    # part schema (no p_container — brand filter only).  The correlated
    # per-part average-quantity subquery becomes a broadcast of the
    # brand-restricted per-part aggregate back onto the same filtered
    # fact subset: the fact table is scanned once for the averages and
    # once for the probe, both scans pruned by the broadcast part dim.
    # l_quantity is integral so double avg is exact in any sum order.
    p = (
        load_table(spark, sf, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = load_table(spark, sf, "lineitem")
    brand_li = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    part_avg = brand_li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    probe = brand_li.join(
        F.broadcast(part_avg), F.col("l_partkey") == F.col("pk")
    ).filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    return probe.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(20,6)")).cast("double")
            / 7.0,
            2,
        ).alias("avg_yearly")
    )


def _q_tpch_q22(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q22 (global sales opportunity), adapted: c_mktsegment
    # stands in for the phone country code, and (because every
    # synthetic customer has ordered at least once) the NOT EXISTS
    # window is "no order since 1999-01-01" — lapsed high-balance
    # customers.  Above-average positive balance via an exact-decimal
    # scalar aggregate broadcast onto the customer scan, then LEFT
    # ANTI join against date-filtered orders (keys-only projection),
    # then a tiny grouped count/sum.
    c = load_table(spark, sf, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(20,6)")).cast("double")
            / F.count("*")
        ).alias("avg_bal")
    )
    rich = c.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    o_keys = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    never = rich.join(o_keys, rich.c_custkey == o_keys.o_custkey, "left_anti")
    return (
        never.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(20,6)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("segment")
    )


def _q_tpch_q13(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q13 (customer order-count distribution): LEFT OUTER join
    # with an extra ON-clause predicate (priority filter rides on the
    # join, NOT on customer), then a two-level aggregation.  The
    # groupBy(c_custkey) reuses the join's hash partitioning on the
    # customer key — one real shuffle; the distribution agg is tiny.
    c = load_table(spark, sf, "customer").select("c_custkey")
    o = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def _q_tpch_q14(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q14 (promotion effect): month-windowed lineitem scan (the
    # date filter pushes to parquet) x broadcast part dim; BOTH sums
    # ride one aggregation pass (conditional decimal sum), and the
    # single-row ratio needs no second shuffle — decimal sums keep the
    # percentage bit-stable under any merge order
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf, "part").select("p_partkey", "p_type")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(20,6)"
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(20,6)")
    )
    agg = joined.agg(F.sum(promo).alias("_p"), F.sum(rev).alias("_t"))
    pct = F.lit(100.0) * F.col("_p").cast("double") / F.col("_t").cast("double")
    return agg.select(
        (F.floor(pct * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)).alias(
            "promo_revenue_pct"
        )
    )


def _q_tpch_q16(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q16 (parts/supplier relationship), adapted: the schema has
    # no partsupp, so the part-supplier pairs come from lineitem; the
    # "customer complaints" exclusion becomes negative-balance
    # suppliers.  Both dims broadcast (part filter + NOT-IN as a
    # broadcast LEFT ANTI); the only shuffle is the count-distinct.
    p = (
        load_table(spark, sf, "part")
        .filter(
            (F.col("p_brand") != "Brand#45")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        load_table(spark, sf, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    pairs = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).join(
        F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti"
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def _q_tpch_q19(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q19 (discounted revenue): OR-of-ANDs over part attributes
    # and lineitem quantity.  Catalyst won't factor the disjunct hull
    # out of the OR, so the common bounds (brand IN, p_size <= 15,
    # quantity in [1,30]) are pushed onto both scans by hand — at
    # 100 TB that's the difference between scanning 3 brands' row
    # groups and scanning every part.
    p = (
        load_table(spark, sf, "part")
        .filter(
            F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
            & (F.col("p_size") >= 1)
            & (F.col("p_size") <= 15)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = (
        load_table(spark, sf, "lineitem")
        .filter((F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30))
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    branch = lambda brand, size_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("p_size") <= size_hi)
        & (F.col("l_quantity") >= q_lo)
        & (F.col("l_quantity") <= q_hi)
    )
    return (
        j.filter(
            branch("Brand#12", 5, 1, 11)
            | branch("Brand#23", 10, 10, 20)
            | branch("Brand#34", 15, 20, 30)
        ).agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .cast("decimal(20,6)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


def _q_tpch_q2(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q2 (minimum-cost supplier), adapted: no partsupp, so the
    # candidate part-supplier pairs are the DISTINCT (partkey, suppkey)
    # pairs observed in lineitem, and "min supplycost" becomes min
    # supplier balance within the region.  The correlated-min subquery
    # is decorrelated the Spark way: aggregate min per part, broadcast
    # it back onto the candidate set.  Only the pair-dedup shuffles.
    p = (
        load_table(spark, sf, "part")
        .filter((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15))
        .select("p_partkey", "p_name")
    )
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    nr = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    s = load_table(spark, sf, "supplier").join(
        F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    pairs = (
        load_table(spark, sf, "lineitem")
        .select("l_partkey", "l_suppkey")
        .dropDuplicates(["l_partkey", "l_suppkey"])
    )
    cand = pairs.join(F.broadcast(p), pairs.l_partkey == p.p_partkey).join(
        F.broadcast(s), pairs.l_suppkey == s.s_suppkey
    )
    min_bal = cand.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        cand.join(
            F.broadcast(min_bal),
            (cand.p_partkey == min_bal.mk)
            & (cand.s_acctbal == min_bal.min_bal),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def _q_tpch_q9(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q9 (product-type profit), adapted: profit = revenue minus
    # a retail-price-based cost proxy (no ps_supplycost).  part is
    # name-filtered and broadcast, supplier+nation broadcast; the one
    # big shuffle is lineitem-orders on the order key.  The per-row
    # amount is computed in double (identically on both engines), then
    # decimal-summed so group totals are order-insensitive.
    p = (
        load_table(spark, sf, "part")
        .filter(F.col("p_name").contains("bolt"))
        .select("p_partkey", "p_retailprice")
    )
    sn = load_table(spark, sf, "supplier").join(
        F.broadcast(load_table(spark, sf, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(20,6)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def _q_tpch_q11(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q11 (important stock), adapted: "stock value" per part =
    # sum(l_extendedprice * l_quantity) over lineitems shipped by one
    # nation's suppliers; keep parts above 2x the average part value
    # (the original's fixed fraction doesn't scale across SFs).
    # Scalar-aggregate HAVING via a broadcast cross join; both sides
    # of the comparison collapse decimal sums to double identically.
    supp = load_table(spark, sf, "supplier").join(
        F.broadcast(
            load_table(spark, sf, "nation").filter(
                F.col("n_name") == "NATION_3"
            )
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    li = load_table(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    value = (F.col("l_extendedprice") * F.col("l_quantity")).cast(
        "decimal(20,6)"
    )
    per_part = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(value).alias("v"))
    )
    threshold = per_part.agg(
        (
            2.0 * F.sum("v").cast("double") / F.count("*")
        ).alias("thr")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("v").cast("double") > F.col("thr"))
        .select(
            "ps_partkey",
            F.round("v", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "ps_partkey")
    )


def _q_tpch_q12(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q12 (shipping-mode priority), adapted: l_linestatus stands
    # in for l_shipmode and the receipt-date window becomes a shipdate
    # year.  Conditional CASE-sums split urgent vs non-urgent orders;
    # the single shuffle is the fact-fact join on the order key (the
    # date filter prunes lineitem to ~1/5 before it).
    li = (
        load_table(spark, sf, "lineitem")
        .filter(
            (F.col("l_returnflag") == "R")
            & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_linestatus")
    )
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def _q_tpch_q20(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q20 (potential part promotion), adapted: suppliers who
    # shipped "excess" volume (> 1.2x the per-part average across
    # suppliers) of any 'red%' part in 1997, from one region.  The
    # nested-IN chain decorrelates to: per-(supplier,part) shipped
    # qty -> per-part average broadcast back -> excess pairs -> LEFT
    # SEMI onto supplier.  Quantities are integral doubles, so sums
    # and averages are exact in any order on both engines.
    shipped = (
        load_table(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    red = (
        load_table(spark, sf, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    shipped_red = shipped.join(
        F.broadcast(red), shipped.l_partkey == red.p_partkey
    )
    # per-part average via a KEYED window, not agg + broadcast-back:
    # one partkey shuffle replaces the regroup + a broadcast whose size
    # scales with the part dimension (not broadcastable at 100 TB).
    # avg of integral-double sums is exact, so the window and a regroup
    # agree bit-for-bit.
    from pyspark.sql import Window as _W

    excess_supp = (
        shipped_red.withColumn(
            "avg_qty", F.avg("qty").over(_W.partitionBy("l_partkey"))
        )
        .filter(F.col("qty") > 1.2 * F.col("avg_qty"))
        .select("l_suppkey")
    )
    nr = load_table(spark, sf, "nation").join(
        F.broadcast(
            load_table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
        ),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey")
    return (
        load_table(spark, sf, "supplier")
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            excess_supp,
            F.col("s_suppkey") == excess_supp.l_suppkey,
            "left_semi",
        )
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


def _q_tpch_q21(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q21 (suppliers who kept orders waiting), adapted: "late" =
    # shipped more than 60 days after the order date (no receipt or
    # commit dates in the schema).  The EXISTS + NOT-EXISTS pair
    # decorrelates into ONE window over the order key: collect the
    # distinct suppliers and distinct *late* suppliers per order, keep
    # late rows of multi-supplier orders whose only late supplier is
    # this one.  One shuffle on the order key replaces two correlated
    # re-scans of lineitem — the 100 TB-correct plan.
    from pyspark.sql import Window

    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "late",
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    w = Window.partitionBy("l_orderkey")
    ann = j.withColumn(
        "supps", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "late_supps",
        F.size(
            F.collect_set(
                F.when(F.col("late"), F.col("l_suppkey"))
            ).over(w)
        ),
    )
    waiting = ann.filter(
        F.col("late") & (F.col("supps") >= 2) & (F.col("late_supps") == 1)
    )
    sn = load_table(spark, sf, "supplier").join(
        F.broadcast(
            load_table(spark, sf, "nation").filter(
                F.col("n_name") == "NATION_8"
            )
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(sn), waiting.l_suppkey == sn.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


def _q_sliding_window_counts(spark: SparkSession, sf: str) -> DataFrame:
    # overlapping (sliding) event-time windows: 2 h width, 1 h slide —
    # each event lands in exactly two windows.  Spark expands the
    # window assignment inline (no self-join); decimal sums keep the
    # values bit-identical across engines.
    events = load_table(spark, sf, "events")
    return (
        events.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("win"), "event_type"
        )
        .agg(
            F.count("*").alias("record_count"),
            F.round(F.sum(F.col("value").cast("decimal(20,6)")), 2)
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type", "record_count", "value_sum",
        )
    )


def _q_value_rankings(spark: SparkSession, sf: str) -> DataFrame:
    # the full ranking-function family in ONE window (one shuffle on
    # event_type, one sort): rank / dense_rank / ntile / percent_rank.
    # (value, event_id) ordering is unique -> every function is
    # deterministic; percent_rank is an exact ratio of small ints so
    # the doubles are bit-identical across engines.
    from pyspark.sql import Window

    events = load_table(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return events.select(
        "event_type",
        "event_id",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("dense_rnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


def _q_moving_sum_user_value(spark: SparkSession, sf: str) -> DataFrame:
    # ROWS-frame sliding aggregate: trailing 4-row sum per user in
    # (ts, event_id) order — decimal so the tiny frame sums don't hit
    # float association differences between engines
    events = load_table(spark, sf, "events")
    out = moving_frame_sum(
        events,
        "user_id",
        ["ts", "event_id"],
        F.col("value").cast("decimal(20,6)"),
        preceding=3,
        alias="trailing_sum",
        count_alias="frame_count",
    )
    return out.select(
        "user_id",
        "event_id",
        F.col("trailing_sum").cast("double").alias("trailing_sum"),
        "frame_count",
    )


def _q_trailing_hour_count(spark: SparkSession, sf: str) -> DataFrame:
    # RANGE-frame trailing count: events by the same user within the
    # preceding hour (inclusive) of each event — integer-exact
    events = load_table(spark, sf, "events")
    out = trailing_range_count(events, "user_id", "ts", 3600)
    return out.select("user_id", "event_id", "trailing_count")


def _q_levenshtein_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    # edit-distance near-dup over the DISTINCT name domain, blocked by
    # the last token — the O(n^2) pair work runs on the (tiny) value
    # vocabulary, never the fact rows
    part = load_table(spark, sf, "part")
    return levenshtein_near_pairs(part, "p_name", max_dist=3)


def _q_grouping_sets_qty(spark: SparkSession, sf: str) -> DataFrame:
    # explicit GROUPING SETS (sparse subset of the cube): one Expand +
    # one shuffle; grouping() indicator columns disambiguate subtotal
    # rows from genuine NULLs
    li = load_table(spark, sf, "lineitem")
    out = grouping_sets_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        F.col("l_quantity").cast("decimal(20,6)"),
    )
    return out.withColumn("value_sum", F.col("value_sum").cast("double"))


def _q_gopher_quality(spark: SparkSession, sf: str) -> DataFrame:
    # Gopher-rule heuristic quality filter (Rae et al. 2021 §A1.1):
    # word-count / mean-word-length / alpha-fraction / required-stopword
    # rules as one narrow JVM projection, 0/1 keep decision per doc
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import gopher_quality_flags

    docs = load_table(spark, sf, "documents")
    return gopher_quality_flags(docs)


def _q_token_cooccurrence(spark: SparkSession, sf: str) -> DataFrame:
    # document-level token co-occurrence: df-cut vocabulary -> postings
    # self-join on doc -> pair counts -> exact top-50 (count desc, pair
    # asc total order)
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import token_cooccurrence

    docs = load_table(spark, sf, "documents")
    return token_cooccurrence(docs, min_df=5, top_n=50)


def _q_passage_dedup(spark: SparkSession, sf: str) -> DataFrame:
    # inter-document passage duplication (RefinedWeb line-dedup analog):
    # non-overlapping 8-token passages, md5-hashed, shared-with-another-
    # doc counted per document
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.dedup import passage_dup_stats

    docs = load_table(spark, sf, "documents")
    return passage_dup_stats(docs, k=8)


def _q_source_overlap(spark: SparkSession, sf: str) -> DataFrame:
    # cross-source provenance matrix: distinct shared 8-token passages
    # per source pair — the "which feeds mirror each other" report run
    # before mixture weighting; oracle re-derives it with a passage
    # self-join (same pairs by construction)
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.dedup import (
        source_overlap_matrix,
    )

    docs = load_table(spark, sf, "documents")
    return source_overlap_matrix(docs, "source", "text", k=8)


def _q_target_affinity(spark: SparkSession, sf: str) -> DataFrame:
    # DSIR-style data selection (Xie et al. 2023): hashed
    # unigram+bigram target-vs-raw count-ratio score per doc, exact
    # BIGINT arithmetic (no float logs — see target_affinity
    # docstring for the deliberate log->ratio divergence); target
    # domain = the src0 feed
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import (
        target_affinity,
    )

    docs = load_table(spark, sf, "documents")
    return target_affinity(
        docs, docs.filter(F.col("source") == "src0"), n_buckets=1024
    )


def _q_curation_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    # round-5 composition capstone — the new curation ops chained the
    # way a real selection run uses them: exact dedup (keep min id per
    # fingerprint) -> DSIR-style target_affinity over the SURVIVORS
    # (both corpus df and target distributions shift after dedup — the
    # oracle must re-derive the whole chain, not the pieces) ->
    # deterministic PPS sample of 50 docs weighted by affinity
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.dedup import (
        exact_text_dedup,
    )
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.sampling import (
        pps_systematic_sample,
    )
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import (
        target_affinity,
    )

    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    survivors = docs.join(
        exact_text_dedup(docs, "doc_id", "text").select(
            F.col("survivor_id").alias("doc_id")
        ),
        "doc_id",
        "left_semi",
    )
    scored = target_affinity(
        survivors,
        survivors.filter(F.col("source") == "src0"),
        n_buckets=1024,
    )
    return pps_systematic_sample(scored, "doc_id", F.col("affinity_micros"), 50)


def _q_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    # SemDeDup (Abbas et al. 2023): embedding-space near-dups no
    # lexical hash can see — cluster on deterministic centroids, then
    # within-cluster cosine keep-min; integer-micros quantization keeps
    # every similarity bit-identical to the SQL twin
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = load_table(spark, sf, "embeddings")
    return semantic_dedup(
        emb, "vec_id", "embedding", n_clusters=8, threshold=0.35
    )


def _q_bigram_lm(spark: SparkSession, sf: str) -> DataFrame:
    # CCNet-style LM fluency screen: add-one-smoothed bigram
    # probabilities trained on the src0 reference slice, floor-mean
    # per doc in integer micros — the log-free exact cousin of
    # perplexity (see operators/text.py:bigram_lm_score)
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import (
        bigram_lm_score,
    )

    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    return bigram_lm_score(docs, docs.filter(F.col("source") == "src0"))


def _q_bpe_merges(spark: SparkSession, sf: str) -> DataFrame:
    # tokenizer-vocabulary induction (BPE merge learning at word
    # granularity, Sennrich et al. 2016): three rounds of
    # most-frequent-adjacent-pair fusion, each round's argmax + merged
    # corpus re-derived by the oracle as unrolled CTEs (the
    # pagerank_micros sequential-fold recipe).  All counts and string
    # compares — no floats — and the output carries its own
    # application invariant (tokens drop by exactly pair_count).
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import bpe_word_merges

    docs = load_table(spark, sf, "documents")
    return bpe_word_merges(docs, "text", n_merges=3)


def _q_bpe_encode(spark: SparkSession, sf: str) -> DataFrame:
    # the tokenize step a pretraining pipeline runs PER DOCUMENT with
    # the learned vocabulary: learn 3 merge rules (bpe_merges'
    # trajectory — the oracle re-derives it through the SAME
    # _bpe_round_ctes chain, carry="doc_id, "), replay them in rank
    # order as in-scan folds, then assign frequency-ranked 0-based
    # token ids over the closed vocab.  Output is the token STREAM
    # (doc_id, pos, token, token_id) — one row per corpus token, so
    # the hash pins every document's exact tokenization end-to-end.
    # Like bpe_merges/corpus_assembly, the learning fold runs at
    # DataFrame-BUILD time (3 argmax collects, each 1 row).
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import (
        bpe_encode,
        bpe_word_merges,
    )

    docs = load_table(spark, sf, "documents")
    learned = [
        (r["merge_left"], r["merge_right"])
        for r in bpe_word_merges(docs, "text", n_merges=3)
        .orderBy("merge_round")
        .collect()
    ]
    return bpe_encode(docs, learned)


def _q_bpe_subword_encode(spark: SparkSession, sf: str) -> DataFrame:
    # CHARACTER-level BPE (Sennrich et al. 2016 proper — the r7
    # bpe_encode operates at word granularity): learn 3 within-word
    # character-pair merges under the </w> end-of-word marker over
    # the word-TYPE table (frequency-weighted pair counts), replay
    # them per word, join encoded types back onto the (doc, word)
    # stream, and assign frequency-ranked 0-based subword ids.  The
    # oracle re-derives the whole trajectory through the
    # _bpe_sub_round_ctes chain (the _bpe_round_ctes recipe with
    # freq-weighted counts and no separator byte).  Like
    # bpe_merges/bpe_encode, the learning fold runs at DataFrame-
    # BUILD time (3 argmax collects, each 1 row).
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import (
        bpe_subword_encode,
        bpe_subword_merges,
    )

    docs = load_table(spark, sf, "documents")
    learned = [
        (r["merge_left"], r["merge_right"])
        for r in bpe_subword_merges(docs, "text", n_merges=3)
        .orderBy("merge_round")
        .collect()
    ]
    return bpe_subword_encode(docs, learned)


#: closed-vocabulary size for the byte-fallback gate: small enough
#: that real OOV symbols exist at every SF (distinct chars + merges
#: exceed 24), large enough that '</w>' — the most frequent symbol —
#: is always inside.  Both sides derive the vocab from this one int.
_BPE_TOTAL_VOCAB = 24


def _q_bpe_subword_total(spark: SparkSession, sf: str) -> DataFrame:
    # TOTAL-coverage tokenizer shipping shape: same 3 learned
    # character-level merges as bpe_subword_encode, but the
    # vocabulary is FROZEN to the top-24 frequency-ranked symbols
    # and every out-of-vocabulary symbol falls back to UTF-8 byte
    # tokens <0xNN> with reserved ids len(vocab)+byte (GPT-2 /
    # SentencePiece byte fallback), the eow marker re-emitted from
    # the vocab so word boundaries survive.  decode(encode(x)) == x
    # is test-pinned; the gate hash-checks the full (pos, token,
    # token_id, is_byte) stream against the oracle's replay.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import (
        bpe_subword_encode_total,
        bpe_subword_merges,
        bpe_subword_vocab,
    )

    docs = load_table(spark, sf, "documents")
    learned = [
        (r["merge_left"], r["merge_right"])
        for r in bpe_subword_merges(docs, "text", n_merges=3)
        .orderBy("merge_round")
        .collect()
    ]
    # r13: the frozen top-k vocabulary comes from bpe_subword_vocab —
    # the SAME (token, token_id) table bpe_subword_encode joins onto
    # its stream (every vocab token occurs >= 1, so distinct (token,
    # token_id) over the encode output IS the vocab table), computed
    # type-table-sized instead of executing the full positioned
    # encode at build time
    vocab = [
        r["token"]
        for r in bpe_subword_vocab(docs, learned)
        .filter(F.col("token_id") < _BPE_TOTAL_VOCAB)
        .orderBy("token_id")
        .collect()
    ]
    # the oracle hardcodes byte-fallback ids as _BPE_TOTAL_VOCAB +
    # byte while the operator derives them from len(vocab) — if a
    # future SF ever yields fewer than _BPE_TOTAL_VOCAB distinct
    # subword symbols the two drift by an id offset; fail loudly at
    # the source instead of as a confusing hash mismatch
    if len(vocab) != _BPE_TOTAL_VOCAB:
        raise AssertionError(
            f"bpe_subword_total gate: corpus yielded {len(vocab)} distinct "
            f"subword symbols, expected exactly _BPE_TOTAL_VOCAB="
            f"{_BPE_TOTAL_VOCAB}; the oracle's hardcoded byte-id offset no "
            "longer matches — adjust _BPE_TOTAL_VOCAB for this SF (an "
            "under-count means the corpus is too small for the frozen "
            "vocabulary; an over-count means the token_id cap above changed)"
        )
    return bpe_subword_encode_total(docs, learned, vocab)


def _q_bpe_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    # The shipping-tokenizer CONTRACT, gated end-to-end at corpus
    # scale: encode under the frozen top-24 vocabulary with byte
    # fallback, decode the stream back, and the oracle is simply the
    # whitespace-normalized ORIGINAL corpus — if any symbol, byte
    # split, marker, or position is wrong anywhere, some document's
    # rebuilt text hash-mismatches.  (decode: percent-encode pieces,
    # one url_decode per doc; '+' carries the word boundary.)
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import bpe_subword_decode

    return bpe_subword_decode(_q_bpe_subword_total(spark, sf))


def _qcls_gate_weights(n_buckets: int = 256) -> list[int]:
    """The gate's stand-in TRAINED weight table: one integer-micros
    weight per hash bucket, derived from md5 so it is reproducible
    without an RNG and identical in the Spark literal and the SQL
    oracle.  (A real deployment plugs in offline-trained weights; the
    gate checks the inference plumbing, which is weight-agnostic.)"""
    import hashlib

    return [
        int(hashlib.md5(f"qclsw:v1:{b}".encode()).hexdigest()[:6], 16)
        % 1_000_001
        for b in range(n_buckets)
    ]


def _q_quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    # fastText-style linear quality-classifier INFERENCE (Joulin et
    # al. 2016) — the third public quality screen after Gopher rules
    # (gopher_quality) and the CCNet bigram LM (lm_fluency): hashed
    # unigram+bigram features, literal integer-micros weight table,
    # floor-mean score, threshold keep/drop.  Pure map over the
    # corpus — no shuffle, no join, no Python — so the plan is a
    # single scan at any scale.  Exact BIGINT math end to end makes
    # the score hash-checkable; the oracle re-derives it via
    # explode + weight-table join (same sum, different plan shape).
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import (
        quality_classifier_score,
    )

    docs = load_table(spark, sf, "documents")
    return quality_classifier_score(
        docs, _qcls_gate_weights(), threshold_micros=500_000
    )


#: the lang_id gate's language inventory — SORTED, because sorted
#: order is the operator's deterministic tie-break order and the
#: oracle's CASE order (both sides derive from this one tuple)
_LANGID_GATE_LANGS: tuple[str, ...] = ("de", "en", "es", "fr")


def _langid_gate_weights(lang: str, n_buckets: int = 256) -> list[int]:
    """Per-language stand-in trained weight tables for the lang_id
    gate, md5-derived like :func:`_qcls_gate_weights` so the Spark
    literal and the SQL oracle interpolate the SAME table.  (A real
    deployment plugs in offline-trained fastText weights; the gate
    checks the multi-class inference plumbing, which is
    weight-agnostic.)"""
    import hashlib

    return [
        int(hashlib.md5(f"langw:v1:{lang}:{b}".encode()).hexdigest()[:6], 16)
        % 1_000_001
        for b in range(n_buckets)
    ]


def _q_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    # fastText-style MULTI-CLASS language identification (Joulin et
    # al. 2016) — the classifier CCNet/C4-style curation actually
    # runs, past the lang_pred_counts heuristic screen: hashed
    # unigram+bigram features (one in-scan array, shared featurizer
    # with quality_classifier/DSIR), one integer-micros weight table
    # per language, per-language floor-mean score, argmax with ties
    # to the lexicographically-first language.  At gate size (4 x 256
    # buckets) every dot product is an in-scan literal fold — a pure
    # map over the corpus, zero shuffle/join; production tables
    # auto-switch to ONE wide broadcast-LUT join (never K joins).
    # The oracle re-derives all four sums via explode + weight join.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import lang_id_scores

    docs = load_table(spark, sf, "documents")
    return lang_id_scores(
        docs, {lg: _langid_gate_weights(lg) for lg in _LANGID_GATE_LANGS}
    )


def _q_lang_id_joined(spark: SparkSession, sf: str) -> DataFrame:
    # the PRODUCTION branch of lang_id: 4 langs x 512 buckets = 2048
    # crosses QCLS_LITERAL_MAX_BUCKETS (1024), so lang_id_scores
    # auto-switches to the broadcast-LUT form a real fastText table
    # (1e5-2e6 buckets) takes — ONE explode + ONE broadcast join
    # against a WIDE (bucket, w_de..w_fr) table + one
    # map-side-combinable groupBy carrying (id, 4 sums), never K
    # joins (r9 verdict ask: this branch was only test-pinned
    # bit-identical to the literal form; the blocklist_filter_df
    # precedent says gate it).  The oracle mirrors the same shape
    # with a LEFT JOIN back onto the doc set, so the NULL-lang
    # totality path is oracled too.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import lang_id_scores

    docs = load_table(spark, sf, "documents")
    return lang_id_scores(
        docs,
        {
            lg: _langid_gate_weights(lg, n_buckets=512)
            for lg in _LANGID_GATE_LANGS
        },
    )


#: unicode noise injected around every document by the normalize_text
#: gate so each normalization class (Cf strip, Cc blank, space folds,
#: fullwidth, quotes, dashes, ligatures, ellipsis, casefold, run
#: collapse) is exercised on EVERY row even though the synthetic
#: corpus is ASCII — both sides interpolate these same literals
_NORM_NOISE_PREFIX = " “ＦＵＬＬｗｉdth”\x07\t "
_NORM_NOISE_SUFFIX = (
    " — co­operate… ﬁnal　‘Q’  end​."
)


def _q_normalize_text(spark: SparkSession, sf: str) -> DataFrame:
    # pre-tokenize text normalization (the CCNet/C4 stage Spark has
    # no NFKC built-in for): documented compatibility-subset folds as
    # one in-scan built-in chain — format-char strip, control-char
    # blank, ONE translate for the 1:1 folds, a replace chain for
    # ligature/ellipsis expansions, lower, single-space collapse.
    # Spark expression and DuckDB oracle are both generated from the
    # SAME fold tables (operators.text.NORMALIZE_CHAR_FOLDS /
    # NORMALIZE_EXPANSIONS) so they can never drift; deterministic
    # unicode noise is injected around each doc so every fold class
    # is live on every row.  Idempotence (normalize∘normalize ==
    # normalize) is property-pinned in tests.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import (
        normalize_text,
        tokens,
    )

    docs = load_table(spark, sf, "documents")
    noisy = F.concat(
        F.lit(_NORM_NOISE_PREFIX), F.col("text"), F.lit(_NORM_NOISE_SUFFIX)
    )
    return (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", normalize_text(noisy).alias("text_norm"))
        .select(
            "doc_id",
            "text_norm",
            F.size(tokens("text_norm")).alias("n_tokens"),
        )
    )


#: NFKC-ONLY unicode noise (compatibility classes the subset fold
#: tables deliberately do NOT cover: squared units, vulgar fractions,
#: Roman numerals, superscripts) — exercised by the rows-only
#: ``normalize_text_nfkc`` gate.  DuckDB has NFC only, so this path is
#: NOT oracle-expressible; the expected expansions ("mhz", "1⁄2",
#: "xii", "2") are pinned in pytest instead
#: (tests/test_pipeline_ops.py::test_normalize_text_nfkc_gate_noise).
_NFKC_NOISE_PREFIX = "㎒½ "
_NFKC_NOISE_SUFFIX = " Ⅻ²"


def _q_normalize_text_nfkc(spark: SparkSession, sf: str) -> DataFrame:
    # the FULL-NFKC big brother of normalize_text (arrow-seam
    # unicodedata.normalize, the multimodal-decode discipline): same
    # output shape as the normalize_text gate but with NFKC-ONLY
    # compatibility noise (㎒ ½ Ⅻ ²) injected alongside the subset
    # noise, so the Python seam demonstrably does work the subset
    # can't.  ROWS-ONLY by design — DuckDB has NFC only, so no oracle
    # can re-derive the values; the hash-gated agreement twin
    # (normalize_text_nfkc_agree) pins the full path's values on
    # subset-class inputs, and pytest pins the NFKC-only expansions.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import (
        normalize_text_nfkc,
        tokens,
    )

    docs = load_table(spark, sf, "documents")
    noisy = F.concat(
        F.lit(_NFKC_NOISE_PREFIX + _NORM_NOISE_PREFIX),
        F.col("text"),
        F.lit(_NORM_NOISE_SUFFIX + _NFKC_NOISE_SUFFIX),
    )
    return (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", normalize_text_nfkc(noisy).alias("text_norm"))
        .select(
            "doc_id",
            "text_norm",
            F.size(tokens("text_norm")).alias("n_tokens"),
        )
    )


def _q_normalize_text_nfkc_agree(spark: SparkSession, sf: str) -> DataFrame:
    # the HASH-GATED agreement twin: normalize_text_nfkc run on
    # subset-class-only input (the normalize_text gate's exact noisy
    # recipe — ASCII corpus + _NORM_NOISE_* covers ASCII ∪ the fold
    # tables ∪ Cc/Cf, the documented equivalence domain), checked
    # against the normalize_text ORACLE verbatim.  Green means the
    # whole Python seam (pre-fold -> ArrowEvalPython NFKC -> subset
    # chain) is value-for-value what the oracle-generated fold SQL
    # computes — the strongest check available for a path DuckDB
    # cannot express directly.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import (
        normalize_text_nfkc,
        tokens,
    )

    docs = load_table(spark, sf, "documents")
    noisy = F.concat(
        F.lit(_NORM_NOISE_PREFIX), F.col("text"), F.lit(_NORM_NOISE_SUFFIX)
    )
    return (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", normalize_text_nfkc(noisy).alias("text_norm"))
        .select(
            "doc_id",
            "text_norm",
            F.size(tokens("text_norm")).alias("n_tokens"),
        )
    )


def _q_corpus_pipeline_normalized(spark: SparkSession, sf: str) -> DataFrame:
    # the normalized capstone: prepare_corpus(normalize=True) — the
    # CCNet/C4 stage ORDER (normalize -> dedup fingerprint -> filter)
    # where normalization changes the dedup survivors and every
    # profile metric sees normalized text.  The normalize_text gate's
    # unicode noise is injected around each doc first so every fold
    # class is live inside the chain; the oracle re-derives the whole
    # thing through _CORPUS_KEPT_CTES generated over the SAME fold
    # tables (_normalize_sql), so a drift in stage order (e.g.
    # fingerprinting raw text instead of normalized) flips survivors
    # and hash-mismatches.  The report mirrors corpus_report but takes
    # the quality mean in EXACT integer 1e-4 units (quality is
    # floor(q*1e4+0.5)/1e4 by construction, so the integer recovers
    # exactly; half-up integer division replaces round(avg(double)))
    # — corpus_report's round(avg(quality),4) sat exactly 1e-4 apart
    # between the engines on the normalized values at sf0.001:
    # float-sum order put the mean on a rounding-tie boundary, the
    # drift class the integer-micros ANN gates were designed around.
    from etl_based_real_time_air_quality_monitoring_system_spark.plans.corpus import prepare_corpus

    docs = load_table(spark, sf, "documents").withColumn(
        "text",
        F.concat(
            F.lit(_NORM_NOISE_PREFIX), F.col("text"), F.lit(_NORM_NOISE_SUFFIX)
        ),
    )
    kept = prepare_corpus(docs, normalize=True).withColumn(
        "_q4", F.floor(F.col("quality") * 10000 + F.lit(0.5)).cast("long")
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("kept_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.expr("(2 * sum(_q4) + count(*)) div (2 * count(*))").alias(
            "avg_quality_q4"
        ),
    )


def _gate_url_expr() -> Column:
    """The curation gates' synthesized URL column — one per doc from
    md5(doc_id) (the http_ingest_simulated recipe: every derived
    field is bit-identical in the oracle's ``_URL_DOM_CTES`` chain):
    ~50 sites x 6 TLD shapes x 3 subdomain prefixes.  Shared by
    domain_rollup / domain_capped_sample / blocklist_filter_df so
    the three gates and their oracles can never drift."""
    h = F.md5(
        F.concat(F.lit("url:v1:"), F.col("doc_id").cast("string")).cast(
            "binary"
        )
    )
    n1 = F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % 50
    n2 = (F.conv(F.substring(h, 7, 6), 16, 10).cast("long") % 6).cast("int")
    n3 = F.conv(F.substring(h, 13, 6), 16, 10).cast("long") % 3
    tlds = ["com", "org", "co.uk", "github.io", "net", "ac.jp"]
    sub = (
        F.when(n3 == 0, F.lit("www."))
        .when(n3 == 1, F.lit("cdn.edge."))
        .otherwise(F.lit(""))
    )
    return F.concat(
        F.lit("https://"),
        sub,
        F.lit("site"),
        n1.cast("string"),
        F.lit("."),
        F.element_at(F.lit(tlds), n2 + 1),
        F.lit("/d/"),
        F.col("doc_id").cast("string"),
    )


def _q_domain_rollup(spark: SparkSession, sf: str) -> DataFrame:
    # URL/domain curation (the C4/RefinedWeb provenance stage): per
    # REGISTERED domain (public-suffix rules — subdomains of co.uk /
    # github.io collapse correctly) doc, distinct-host and exact
    # token accounting, plus the blocklist membership flag the
    # curation run filters on.  The documents table has no URL
    # column, so the gate synthesizes one per doc from md5(doc_id)
    # (the http_ingest_simulated recipe: every derived field is
    # bit-identical in the oracle): ~50 sites x 6 TLD shapes x 3
    # subdomain prefixes.  The operator itself takes any URL column.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.web import domain_rollup

    docs = load_table(spark, sf, "documents")
    rolled = domain_rollup(
        docs.withColumn("url", _gate_url_expr()), "url", "text"
    )
    blocked = ["site7.com", "site13.co.uk"]
    return rolled.select(
        "domain",
        "n_docs",
        "n_hosts",
        "n_tokens",
        F.coalesce(
            F.col("domain").isin(blocked).cast("int"), F.lit(0)
        ).alias("blocked"),
    )


def _q_domain_capped_sample(spark: SparkSession, sf: str) -> DataFrame:
    # per-domain cap ENFORCEMENT — the action a C4/RefinedWeb run
    # takes from domain_rollup's report: no registered domain
    # contributes more than `cap` docs, membership 100% deterministic
    # (salted-hash rank within domain, the stratified_quota_sample
    # recipe), kept SET pinned (not counts — the
    # cluster_balanced_sample precedent).  Same md5-synthesized URLs
    # as domain_rollup; the oracle shares the _URL_DOM_CTES chain
    # verbatim, then re-derives rank + cap.  domain_key re-derived on
    # the kept rows so the output also pins the grouping unit
    # (registered domain, else host).
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.web import (
        domain_capped_sample,
        host_of,
        registered_domain_of,
        suffix_of,
    )

    docs = load_table(spark, sf, "documents")
    kept = domain_capped_sample(
        docs.withColumn("url", _gate_url_expr()), cap=2
    )
    # host AND suffix fold materialized under aliases FIRST (the
    # no-CSE rule: the domain CASE references the host ~6 times and
    # the fold 3 times; inlined they re-run per reference per row)
    return (
        kept.withColumn("_h", host_of("url"))
        .withColumn("_s", suffix_of(F.col("_h")))
        .select(
            "doc_id",
            F.coalesce(
                registered_domain_of(F.col("_h"), suffix=F.col("_s")),
                F.col("_h"),
            ).alias("domain_key"),
        )
    )


def _q_blocklist_filter_df(spark: SparkSession, sf: str) -> DataFrame:
    # the DataFrame-blocklist form of blocklist_filter (a real
    # blocklist is 1e5+ rows — a broadcast LEFT ANTI join, not an
    # isin literal; the literal form is domain_rollup's gate).  The
    # kept set value-checks against a DuckDB anti-join oracle over
    # the shared _URL_DOM_CTES chain; plan shape (broadcast
    # anti-join) is pinned in test_plan_shapes.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.web import blocklist_filter

    docs = load_table(spark, sf, "documents")
    bl = spark.createDataFrame(
        [("site7.com",), ("site13.co.uk",), ("site21.github.io",)],
        ["domain"],
    )
    kept = blocklist_filter(
        docs.withColumn("url", _gate_url_expr()), bl
    )
    return kept.select("doc_id")


#: the bm25_search gate's fixed query set — lowercase terms so they
#: match the lowercased whitespace tokenization; terms absent from a
#: given SF's corpus simply contribute nothing (OR semantics)
_BM25_GATE_QUERIES: tuple[tuple[str, str], ...] = (
    ("q_exec", "hash"),
    ("q_exec", "join"),
    ("q_exec", "shuffle"),
    ("q_scan", "scan"),
    ("q_scan", "filter"),
    ("q_scan", "parquet"),
    ("q_stream", "stream"),
    ("q_stream", "window"),
    ("q_stream", "state"),
)


def _q_bm25_search(spark: SparkSession, sf: str) -> DataFrame:
    # lexical retrieval (Okapi BM25, log-free RSJ idf — the
    # tfidf_terms exactness recipe): top-10 documents for each of
    # three keyword queries.  Every per-term contribution is floored
    # to integer micros BEFORE the per-doc sum, so score_micros is an
    # order-independent BIGINT the oracle reproduces bit-for-bit; the
    # oracle re-derives stats/df/saturation through its own CTE chain
    # with the identical double parenthesization.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.retrieval import bm25_topk

    docs = load_table(spark, sf, "documents")
    qmap: dict[str, list[str]] = {}
    for qid, term in _BM25_GATE_QUERIES:
        qmap.setdefault(qid, []).append(term)
    return bm25_topk(docs, qmap, k=10)


def _q_line_dedup(spark: SparkSession, sf: str) -> DataFrame:
    # C4-style corpus-wide repeated-line removal WITH document
    # rewrite (the ACTION beside passage_dup_stats' report): every
    # line occurring >= 2 times keeps only its globally-first
    # occurrence (min (doc_id, pos)); documents reassemble from
    # surviving lines in order.  The synthetic corpus is single-line,
    # so the gate synthesizes "lines" as non-overlapping 5-token
    # chunks (~5% of chunks repeat at sf0.01 — non-degenerate both
    # ways) — the chunk recipe is the SHARED text.fixed_token_chunks
    # helper (one definition for the gate and its scale probe, so the
    # two can never measure different plans); _toks is a materialized
    # alias (the helper's no-CSE precondition).
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.dedup import line_dedup
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import (
        fixed_token_chunks,
        tokens,
    )

    docs = load_table(spark, sf, "documents")
    chunked = docs.select(
        "doc_id", tokens("text").alias("_toks")
    ).select(
        "doc_id",
        fixed_token_chunks(F.col("_toks"), 5).alias("_chunks"),
    )
    return line_dedup(
        chunked, id_col="doc_id", lines_col="_chunks", join_sep=" "
    )


def _q_substring_rewrite(spark: SparkSession, sf: str) -> DataFrame:
    # the ExactSubstr ACTION (Lee et al. 2022) whose coverage
    # substring_dup_spans reports: duplicated 8-token spans are cut
    # from every document except their globally-first occurrence
    # (min (doc_id, pos)), text reassembled from surviving tokens.
    # The oracle re-derives keeper/count via windows over the literal
    # gram strings (the Spark side shuffles md5 hashes — the
    # dup_spans oracle precedent) and rebuilds with an order-filtered
    # string_agg.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.dedup import (
        substring_dedup_rewrite,
    )

    docs = load_table(spark, sf, "documents")
    return substring_dedup_rewrite(docs, k=8, min_count=2)


def _pq_micros_emb(spark: SparkSession, sf: str) -> DataFrame:
    # shared PQ input: embeddings quantized to integer micros FIRST
    # (micros_vec — the repo's single floor-half-up recipe) so every
    # squared-L2 below is an exact integer sum < 2^53 — bit-identical
    # across numpy, Spark and DuckDB in any summation order
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.similarity import (
        micros_vec,
    )

    return load_table(spark, sf, "embeddings").select(
        "vec_id", micros_vec("embedding").alias("embedding")
    )


def _q_pq_codes(spark: SparkSession, sf: str) -> DataFrame:
    # product quantization (Jegou et al. 2011) encode step: 8
    # subspaces x 16 codes from deterministic sampled-init codebooks;
    # per-subspace argmin is an in-scan JVM expression (zero shuffle).
    # Long form (vec_id, subspace, code) so the oracle hash pins every
    # single code assignment, not an aggregate of them.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )

    emb = _pq_micros_emb(spark, sf)
    cb = pq_codebooks(emb, "vec_id", "embedding", n_subspaces=8, n_codes=16)
    # posexplode_outer + null filter (see dedup._pair_intersections;
    # PQ code arrays have no NULL elements, so the rewrite's
    # no-NULL-elements precondition holds — array_compact certifies
    # it at type level): keeps the in-scan argmin encode chain out of
    # the inferred filter
    return (
        pq_encode(emb, "vec_id", "embedding", cb)
        .select(
            "vec_id",
            F.posexplode_outer(F.array_compact("codes")).alias(
                "subspace", "code"
            ),
        )
        .filter(F.col("code").isNotNull())
    )


def _pq_gate_queries(emb: DataFrame) -> list[tuple[int, list[float]]]:
    qrows = (
        emb.filter(F.col("vec_id") < 5)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    return [(int(r["vec_id"]), list(r["embedding"])) for r in qrows]


def _q_pq_topk_adc(spark: SparkSession, sf: str) -> DataFrame:
    # PQ asymmetric-distance top-10 for five query vectors: distance =
    # sum_j LUT[j][code_j], m integer lookups per row — and because
    # codes + LUT are deterministic integer math, the APPROXIMATE
    # result itself is exact-oracle-checkable (unlike float-ranked
    # ivf_topk/lsh_topk, which stay rows-only).  Batched knn form:
    # one scan encodes once and ranks all five queries (per-query
    # TakeOrdered branches would replan+recompile the encode tree 5x)
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.similarity import (
        pq_adc_knn,
        pq_codebooks,
    )

    emb = _pq_micros_emb(spark, sf)
    cb = pq_codebooks(emb, "vec_id", "embedding", n_subspaces=8, n_codes=16)
    return pq_adc_knn(emb, "vec_id", "embedding", _pq_gate_queries(emb), cb, k=10)


def _q_pq_recall(spark: SparkSession, sf: str) -> DataFrame:
    # the PQ QUALITY metric under the gate: ADC top-10 vs the exact
    # squared-L2 top-10 (PQ approximates L2, so L2 — not cosine — is
    # the fair ground truth), reduced to one hash-checked row
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.similarity import (
        pq_adc_knn,
        pq_codebooks,
    )

    emb = _pq_micros_emb(spark, sf)
    cb = pq_codebooks(emb, "vec_id", "embedding", n_subspaces=8, n_codes=16)
    queries = _pq_gate_queries(emb)
    adc = pq_adc_knn(emb, "vec_id", "embedding", queries, cb, k=10).select(
        "qid", "vec_id"
    )
    return _recall_row(adc, _exact_l2_top10(emb, queries), len(queries))


def _q_streaming_pq_index(spark: SparkSession, sf: str) -> DataFrame:
    # the T-family x ANN composition: PQ index MAINTENANCE as a
    # stream.  Embeddings arrive as a 3-micro-batch availableNow
    # stream; each batch is encoded with FIXED codebooks (first-16 by
    # vec_id — a pure function of the table, so stream split cannot
    # move them) and appended to a parquet index via foreachBatch.
    # Because pq_encode is a row-local in-scan expression, the final
    # index must equal the one-shot batch encode for ANY micro-batch
    # composition — so this shares pq_codes' exact SQL oracle, and a
    # batch-dependence bug (codebooks drifting with arrival order,
    # double- or zero-encoded batches) fails rows+hash.
    import shutil as _shutil

    from etl_based_real_time_air_quality_monitoring_system_spark.operators.similarity import (
        micros_vec,
        pq_codebooks,
        pq_encode,
    )
    from etl_based_real_time_air_quality_monitoring_system_spark.streaming.pipeline import (
        stream_json_records,
    )

    emb = _pq_micros_emb(spark, sf)
    cb = pq_codebooks(emb, "vec_id", "embedding", n_subspaces=8, n_codes=16)

    src = _gate_sink(sf, "pq_index_src")
    idx = _gate_sink(sf, "pq_index_out")
    ck = idx + "_ck"
    for p in (src, idx, ck):
        _shutil.rmtree(p, ignore_errors=True)
    # raw vectors stream in (doubles roundtrip exactly through JSON);
    # quantization + encode happen per micro-batch engine-side
    load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).repartition(3).write.mode("overwrite").json(src)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    stream = stream_json_records(spark, src, schema, max_files_per_trigger=1)

    def encode_batch(batch: DataFrame, epoch_id: int) -> None:
        # replay guard: each epoch OVERWRITES its own partition
        # directory (epoch=<id>), so a micro-batch retried after a
        # failure between the write and the checkpoint commit rewrites
        # identical content instead of double-encoding its rows (a
        # bare mode('append') would append a second copy and fail the
        # shared pq_codes oracle spuriously — the run_cdc_apply replay
        # discipline, parquet-partition edition)
        micros = batch.select(
            "vec_id", micros_vec("embedding").alias("embedding")
        )
        pq_encode(micros, "vec_id", "embedding", cb).select(
            "vec_id", "codes"
        ).write.mode("overwrite").parquet(os.path.join(idx, f"epoch={epoch_id}"))

    q = (
        stream.writeStream.foreachBatch(encode_batch)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(idx).select(
        "vec_id", F.posexplode("codes").alias("subspace", "code")
    )


def _q_ivfpq_topk(spark: SparkSession, sf: str) -> DataFrame:
    # IVF-PQ (IVFADC): coarse inverted lists by exact squared-L2,
    # product quantization of the RESIDUALS, five-query probe-and-ADC
    # search — the canonical billion-scale ANN index, and because
    # every stage is integer-micros math (assignment, residuals,
    # codes, LUTs, probe ranking) the whole approximate pipeline is
    # exact-oracle-checkable end to end
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.similarity import (
        ivfpq_adc_knn,
        ivfpq_codebooks,
    )

    emb = _pq_micros_emb(spark, sf)
    coarse, cb = ivfpq_codebooks(
        emb, "vec_id", "embedding", n_coarse=8, n_subspaces=8, n_codes=16
    )
    return ivfpq_adc_knn(
        emb, "vec_id", "embedding", _pq_gate_queries(emb), coarse, cb,
        k=10, n_probe=4,
    )


def _exact_l2_top10(emb: DataFrame, queries: list) -> DataFrame:
    # exact squared-L2 top-10 per query, batched: all queries' rank
    # keys in one generated projection — d2 = q.q - 2 q.x + x.x, and
    # within a query's partition q.q is the constant term, so the key
    # is x.x - 2 q.x (x.x computed ONCE as a shared column); explode,
    # one window — integers < 2^53, exact in any engine.  The fair
    # ground truth for both PQ recall gates (PQ approximates L2).
    from pyspark.sql import Window

    structs = []
    for qid, qv in queries:
        dot = " + ".join(f"_pqe[{i}] * {int(qv[i])}D" for i in range(len(qv)))
        structs.append(
            f"named_struct('qid', {qid}L, 'd2', _mm - 2.0D * ({dot}))"
        )
    dim = len(queries[0][1])
    mm = " + ".join(f"_pqe[{i}] * _pqe[{i}]" for i in range(dim))
    stacked = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("_pqe")
    ).select(
        "vec_id",
        F.expr(mm).alias("_mm"),
        F.col("_pqe"),
    ).select(
        "vec_id", F.expr(f"explode(array({', '.join(structs)}))").alias("_q")
    )
    w = Window.partitionBy("_q.qid").orderBy(F.asc("_q.d2"), F.asc("vec_id"))
    return (
        stacked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 10)
        .select(F.col("_q.qid").alias("qid"), "vec_id")
    )


def _recall_row(adc: DataFrame, exact: DataFrame, n_q: int) -> DataFrame:
    hits = adc.join(exact, ["qid", "vec_id"], "inner")
    return hits.agg(F.count("*").alias("n_hits")).select(
        F.lit(n_q).alias("n_queries"),
        "n_hits",
        F.expr(f"(n_hits * 1000000) div {10 * n_q}").alias("recall_micros"),
    )


def _q_ivfpq_recall(spark: SparkSession, sf: str) -> DataFrame:
    # the IVF-PQ QUALITY metric under the gate (the pq_recall /
    # ivf_topk_recall pattern): probe-and-ADC top-10 vs the exact
    # squared-L2 top-10, one hash-checked row — a degenerate-codebook
    # or probe-selection regression moves recall and fails the hash
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.similarity import (
        ivfpq_adc_knn,
        ivfpq_codebooks,
    )

    emb = _pq_micros_emb(spark, sf)
    coarse, cb = ivfpq_codebooks(
        emb, "vec_id", "embedding", n_coarse=8, n_subspaces=8, n_codes=16
    )
    queries = _pq_gate_queries(emb)
    adc = ivfpq_adc_knn(
        emb, "vec_id", "embedding", queries, coarse, cb, k=10, n_probe=4
    ).select("qid", "vec_id")
    return _recall_row(adc, _exact_l2_top10(emb, queries), len(queries))


def _q_nn_confusion_ivfpq(spark: SparkSession, sf: str) -> DataFrame:
    # the documented ANN-candidate swap EXERCISED under the gate:
    # nn_label_confusion's 100 TB path — 1-NN label confusion where
    # the exact all-pairs scorer is replaced by IVF-PQ candidate
    # lists (nn_confusion_over_candidates over ivfpq_adc_knn, k=2 so
    # the best non-self neighbor is always present).  Sixteen query
    # vectors; the oracle re-derives candidates via the shared
    # _IVFPQ_CTES chain (n_queries parameterized) + the same
    # exclude-self/rank-1/label-rollup tail, so a drift in EITHER the
    # candidate generator or the confusion tail fails rows+hash.
    #
    # Known-benign codegen note: 16 queries x 4-probe CASE LUTs plus
    # the encode expression push the fused stage past janino's 64 KB
    # method limit — Spark logs a CodeGenerator ERROR and falls back
    # to interpreted eval (execution and results are unaffected; the
    # pq_codes precedent: fixed plan cost dominates at gate scale and
    # sec/Mrow still falls with volume).  At production query volumes
    # the candidate lists come from the STORED cluster-partitioned
    # index, not an in-scan encode, so the expression never grows
    # with the query set there.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.similarity import (
        ivfpq_adc_knn,
        ivfpq_codebooks,
        nn_confusion_over_candidates,
    )

    emb = _pq_micros_emb(spark, sf)
    labels = load_table(spark, sf, "embeddings").select("vec_id", "label")
    coarse, cb = ivfpq_codebooks(
        emb, "vec_id", "embedding", n_coarse=8, n_subspaces=8, n_codes=16
    )
    qrows = (
        emb.filter(F.col("vec_id") < 16)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    queries = [(int(r["vec_id"]), list(r["embedding"])) for r in qrows]
    cand = ivfpq_adc_knn(
        emb, "vec_id", "embedding", queries, coarse, cb, k=2, n_probe=4
    )
    return nn_confusion_over_candidates(cand, labels, "vec_id", "label")


def _q_nn_confusion_ivfpq_stored(spark: SparkSession, sf: str) -> DataFrame:
    # the PRODUCTION IVF-PQ shape under the gate (closing the r6
    # codegen note): the encoded index is WRITTEN partitioned by
    # cluster_id, and the same 16-query confusion runs as a
    # partition-pruned read of the stored codes — probes become
    # directory skips (plan-pinned in test_plan_shapes), the raw
    # embedding column is never rescanned, and without the in-scan
    # encode the generated stage stays under janino's 64 KB limit
    # (pinned by test with spark.sql.codegen.fallback=false).
    # Search-equivalent to nn_confusion_ivfpq by construction, so it
    # shares that oracle verbatim.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.similarity import (
        ivfpq_adc_knn_stored,
        ivfpq_codebooks,
        ivfpq_write_index,
        nn_confusion_over_candidates,
    )

    emb = _pq_micros_emb(spark, sf)
    labels = load_table(spark, sf, "embeddings").select("vec_id", "label")
    coarse, cb = ivfpq_codebooks(
        emb, "vec_id", "embedding", n_coarse=8, n_subspaces=8, n_codes=16
    )
    qrows = (
        emb.filter(F.col("vec_id") < 16)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    queries = [(int(r["vec_id"]), list(r["embedding"])) for r in qrows]
    path = _gate_sink(sf, "ivfpq_index")
    ivfpq_write_index(emb, "vec_id", "embedding", coarse, cb, path)
    cand = ivfpq_adc_knn_stored(
        spark, path, queries, coarse, cb, id_col="vec_id", k=2, n_probe=4
    )
    return nn_confusion_over_candidates(cand, labels, "vec_id", "label")


def _q_streaming_ivfpq_index(spark: SparkSession, sf: str) -> DataFrame:
    # STREAMING maintenance of the stored (production) IVF-PQ index —
    # the T-family composition over ivfpq_write_index's cluster-
    # partitioned layout: raw vectors arrive as a 3-micro-batch
    # availableNow stream; each batch is encoded with FIXED
    # coarse/codebooks (pure functions of the table, so stream split
    # cannot move them) and written under its own replay-guard
    # epoch=<id> partition (partitionBy cluster_id beneath it — the
    # index is searchable while accreting); ivfpq_compact_index then
    # collapses the epoch accretion into the canonical one-dir-per-
    # cluster layout.  Because encode is row-local, the compacted
    # index must equal the ONE-SHOT batch index for any micro-batch
    # composition — so the same 16-query stored search runs over it
    # and this shares nn_confusion_ivfpq's oracle verbatim.  Any
    # batch-dependence bug (codebooks drifting with arrival order,
    # double-/zero-encoded epochs, compaction dropping a cluster)
    # fails rows+hash.
    import shutil as _shutil

    from etl_based_real_time_air_quality_monitoring_system_spark.operators.similarity import (
        ivfpq_adc_knn_stored,
        ivfpq_codebooks,
        ivfpq_compact_index,
        ivfpq_encode,
        micros_vec,
        nn_confusion_over_candidates,
    )
    from etl_based_real_time_air_quality_monitoring_system_spark.streaming.pipeline import (
        stream_json_records,
    )

    emb = _pq_micros_emb(spark, sf)
    labels = load_table(spark, sf, "embeddings").select("vec_id", "label")
    coarse, cb = ivfpq_codebooks(
        emb, "vec_id", "embedding", n_coarse=8, n_subspaces=8, n_codes=16
    )
    qrows = (
        emb.filter(F.col("vec_id") < 16)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    queries = [(int(r["vec_id"]), list(r["embedding"])) for r in qrows]

    src = _gate_sink(sf, "ivfpq_stream_src")
    raw = _gate_sink(sf, "ivfpq_stream_raw")
    idx = _gate_sink(sf, "ivfpq_stream_idx")
    ck = raw + "_ck"
    for p in (src, raw, idx, ck):
        _shutil.rmtree(p, ignore_errors=True)
    load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).repartition(3).write.mode("overwrite").json(src)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    stream = stream_json_records(spark, src, schema, max_files_per_trigger=1)

    def encode_batch(batch: DataFrame, epoch_id: int) -> None:
        micros = batch.select(
            "vec_id", micros_vec("embedding").alias("embedding")
        )
        ivfpq_encode(micros, "vec_id", "embedding", coarse, cb).write.mode(
            "overwrite"
        ).partitionBy("cluster_id").parquet(
            os.path.join(raw, f"epoch={epoch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(encode_batch)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ivfpq_compact_index(spark, raw, idx)
    cand = ivfpq_adc_knn_stored(
        spark, idx, queries, coarse, cb, id_col="vec_id", k=2, n_probe=4
    )
    return nn_confusion_over_candidates(cand, labels, "vec_id", "label")


def _q_cluster_balanced_sample(spark: SparkSession, sf: str) -> DataFrame:
    # embedding-space diversification (D4 / SSL-prototype pruning):
    # nearest-centroid assignment in exact integer-micros squared L2
    # (the shared _l2_assign_expr / IVFPQ "assign" recipe, ties to
    # the lowest cid), then an EXACT md5-ranked quota of 25 per
    # cluster — caps any one region of embedding space in the final
    # mixture, the axis per-source quotas can't see.  Assignment is
    # in-scan (zero shuffle); the rank is one cluster_id shuffle with
    # a literal bound, so WindowGroupLimit caps what reaches the
    # exchange.  The kept SET is engine-exact, so the oracle pins
    # membership, not just counts.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.similarity import (
        cluster_balanced_sample,
    )

    emb = _pq_micros_emb(spark, sf)
    return cluster_balanced_sample(
        emb, "vec_id", "embedding", n_clusters=8, quota=25, salt="cbal:v1"
    )


def _q_dup_graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    # iterative-join capability under the gate: PageRank over the
    # MinHash/LSH candidate graph in EXACT integer micros — three
    # synchronous updates unrolled as CTEs on the oracle side (the
    # incremental_neardup sequential-fold precedent).  On a dup graph
    # this ranks template hubs (boilerplate near-matching thousands
    # of docs) orders of magnitude above organic near-dups.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.graph import (
        pagerank_micros,
    )

    docs = load_table(spark, sf, "documents")
    pairs = minhash_lsh_candidates(docs, "doc_id", "text", n=3, k=16, bands=4)
    pr = pagerank_micros(pairs, "doc_a", "doc_b", iters=3)
    return pr.select(F.col("vertex").alias("doc_id"), "pr_micros")


def _q_incremental_neardup(spark: SparkSession, sf: str) -> DataFrame:
    # MinHash-LSH near-dup screen at ingest, folded over three arrival
    # batches (doc_id % 3): each batch is screened against the
    # ACCEPTED history's band buckets plus smaller-id same-batch
    # collisions; rejects never enter the index.  Production runs one
    # batch per invocation against a persisted bucket index (see the
    # foreachBatch streaming test) — the 3-step unroll here exists so
    # the sequential fold is oracle-expressible in plain SQL.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.dedup import (
        incremental_neardup,
    )

    from etl_based_real_time_air_quality_monitoring_system_spark.operators.dedup import (
        minhash_band_rows,
    )

    docs = load_table(spark, sf, "documents")
    b = F.col("doc_id") % 3

    def accepted_bands(acc: DataFrame) -> DataFrame:
        return minhash_band_rows(
            docs.join(acc.select("doc_id"), "doc_id", "left_semi"),
            "doc_id",
            "text",
        ).select("band", "bucket")

    # the fold carries the compact (band, bucket) index forward —
    # exactly the production per-batch shape — so each step shingles
    # only ITS accepted docs once, never the whole history again; the
    # localCheckpoints are the iterative-query lineage cut (the
    # dedup_clusters pattern): without them step i's plan re-embeds
    # every prior step's MinHash pipeline and recomputes exponentially
    acc0 = incremental_neardup(docs.limit(0), docs.filter(b == 0)).localCheckpoint()
    idx1 = accepted_bands(acc0).localCheckpoint()
    acc1 = incremental_neardup(
        None, docs.filter(b == 1), known_bands=idx1
    ).localCheckpoint()
    idx2 = idx1.unionByName(accepted_bands(acc1)).localCheckpoint()
    acc2 = incremental_neardup(None, docs.filter(b == 2), known_bands=idx2)
    return (
        acc0.withColumn("batch", F.lit(0))
        .unionByName(acc1.withColumn("batch", F.lit(1)))
        .unionByName(acc2.withColumn("batch", F.lit(2)))
    )


def _q_substring_dup_spans(spark: SparkSession, sf: str) -> DataFrame:
    # exact duplicated-substring coverage (ExactSubstr-dedup analog,
    # Lee et al. 2022): overlapping 8-token windows shared across docs,
    # per-doc interval-UNION token coverage — the sliding-window +
    # union-length semantics the oracle re-derives term for term
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.dedup import (
        substring_dup_spans,
    )

    docs = load_table(spark, sf, "documents")
    return substring_dup_spans(docs, k=8)


def _q_dedup_keep_best(spark: SparkSession, sf: str) -> DataFrame:
    # canonicalization after fuzzy dedup: LSH pairs -> connected
    # components -> keep the highest-quality doc per cluster (ties ->
    # smallest doc_id); the "which survivor do we train on" step
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.dedup import keep_best_per_cluster

    docs = load_table(spark, sf, "documents")
    pairs = minhash_lsh_candidates(docs, "doc_id", "text", n=3, k=16, bands=4)
    cc = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    scored = docs.select("doc_id", quality_score("text").alias("quality"))
    return keep_best_per_cluster(cc, scored)


def _q_drift_report(spark: SparkSession, sf: str) -> DataFrame:
    # PSI-style distribution drift: time-midpoint split into ref/cur
    # halves, fixed-width value bins, per-bin counts + rounded rate
    # deltas — two scan passes, no wide shuffle
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.aggregates import drift_bin_report

    ev = load_table(spark, sf, "events")
    return drift_bin_report(ev, "ts", "value", bin_width=50.0, n_bins=10)


def _q_equi_depth_bins(spark: SparkSession, sf: str) -> DataFrame:
    # exact equi-depth deciles via ntile over a (value, event_id) total
    # order; integer-micros sums keep the summary engine-exact
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.aggregates import equi_depth_bins

    ev = load_table(spark, sf, "events")
    return equi_depth_bins(ev, "value", "event_id", n_bins=10)


def _q_ngram_containment(spark: SparkSession, sf: str) -> DataFrame:
    # asymmetric near-subset detection: |A∩B|/|A| (and /|B|) over the
    # same one-pass inverted index as ngram_jaccard — catches fragment/
    # superset dups whose symmetric Jaccard tends to zero
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    docs = load_table(spark, sf, "documents")
    return ngram_containment_pairs(docs, "doc_id", "text", n=3, threshold=0.5)


def _q_key_skew_report(spark: SparkSession, sf: str) -> DataFrame:
    # shuffle-key skew diagnostic over the event stream's user key —
    # the measurement that drives salting / AQE skew thresholds
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.aggregates import key_skew_report

    ev = load_table(spark, sf, "events")
    return key_skew_report(ev, "user_id", top_n=10)


def _q_sink_orc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    # ORC sink lifecycle in the gate: write the event fact table as
    # ORC, read it back, aggregate — must equal the same aggregate
    # over the source parquet (sink loses nothing; both columnar
    # formats share the pushdown/row-group-stats contract)
    from etl_based_real_time_air_quality_monitoring_system_spark.sources.writers import write_orc

    events = load_table(spark, sf, "events").select(
        "event_id", "event_type", "value"
    )
    path = _gate_sink(sf, "events_orc")
    write_orc(events, path)
    back = spark.read.orc(path)
    return back.groupBy("event_type").agg(
        F.count("*").alias("record_count"),
        F.sum(F.col("value").cast("decimal(20,6)"))
        .cast("double")
        .alias("value_sum"),
    )


def _q_schema_evolution_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    # lake-schema evolution: two parquet batches with DIFFERENT schemas
    # (a column added later), read back under mergeSchema — early rows
    # surface the new column as NULL; aggregation must equal a direct
    # oracle over the source with the same parity split
    events = load_table(spark, sf, "events").select(
        "event_id", "event_type", "value", "user_id"
    )
    root = _gate_sink(sf, "events_evolved")
    old_batch = events.filter(F.col("event_id") % 2 == 0).drop("user_id")
    new_batch = events.filter(F.col("event_id") % 2 == 1)
    old_batch.write.mode("overwrite").parquet(os.path.join(root, "b1"))
    new_batch.write.mode("overwrite").parquet(os.path.join(root, "b2"))
    back = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "b1"), os.path.join(root, "b2")
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("record_count"),
        F.count("user_id").alias("rows_with_user"),
        F.sum(F.col("value").cast("decimal(20,6)"))
        .cast("double")
        .alias("value_sum"),
    )


def _q_cluster_safe_split(spark: SparkSession, sf: str) -> DataFrame:
    # near-dup-aware split: LSH+CC clusters are the split unit, so a
    # near-duplicate pair never straddles train/test (the leakage an
    # entity-key group split can't see).  Summary per (source, split).
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.sampling import (
        cluster_safe_split,
    )

    docs = load_table(spark, sf, "documents")
    pairs = minhash_lsh_candidates(docs, "doc_id", "text", n=3, k=16, bands=4)
    cc = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    tagged = cluster_safe_split(docs, cc)
    return tagged.groupBy("source", "split").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("_unit").alias("n_units"),
    )


def _q_incremental_dedup(spark: SparkSession, sf: str) -> DataFrame:
    # nightly-ingest dedup: hash-split the corpus into "historical"
    # (80%) and "incoming" (20%), dedupe incoming within-batch, then
    # anti-join against historical fingerprints — only novel docs land
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.dedup import (
        incremental_dedup,
    )
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf, "documents")
    bucket = hash_bucket("doc_id", 100, "ingest:v1")
    corpus = docs.filter(bucket >= 20)
    incoming = docs.filter(bucket < 20)
    return incremental_dedup(corpus, incoming)


def _q_range_band_join_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    # the SCALE formulation of the interval join (for interval sets too
    # big to broadcast): explode intervals to grid buckets, hash
    # equi-join on the bucket, residual-filter the exact predicate.
    # Shares range_band_join's oracle — the two plans must agree
    # row-for-row.
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.joins import (
        range_join_bucketed,
    )

    events = load_table(spark, sf, "events")
    bands = spark.createDataFrame(
        list(_VALUE_BANDS), "band string, lo double, hi double"
    )
    joined = range_join_bucketed(
        events, bands, "value", bucket_width=50.0, clamp_lo=0.0, clamp_hi=1000.0
    )
    return joined.groupBy("band").agg(
        F.count("*").alias("record_count"),
        F.round(F.avg("value"), 2).alias("avg_value"),
    )


def _q_oov_rate(spark: SparkSession, sf: str) -> DataFrame:
    # out-of-vocabulary rate vs the corpus's own top-20 tokens — the
    # exact, log-free unigram-LM screen (vocab deterministic under a
    # total order, membership broadcast, corpus never shuffles)
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import oov_rate

    docs = load_table(spark, sf, "documents")
    return oov_rate(docs, vocab_size=20)


def _q_dedup_graph_stats(spark: SparkSession, sf: str) -> DataFrame:
    # structural health check of the LSH candidate graph before CC:
    # vertex/edge counts, max degree, exact triangle count (ordered-
    # edge join, each triangle once)
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.graph import graph_stats

    docs = load_table(spark, sf, "documents")
    pairs = minhash_lsh_candidates(docs, "doc_id", "text", n=3, k=16, bands=4)
    return graph_stats(pairs, "doc_a", "doc_b")


def _q_grouped_deciles(spark: SparkSession, sf: str) -> DataFrame:
    # per-event-type equi-depth deciles: ntile over a KEYED window (no
    # offset machinery, no single-partition risk — the keyed variant
    # of equi_depth_bins)
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.aggregates import (
        grouped_equi_depth_bins,
    )

    ev = load_table(spark, sf, "events")
    return grouped_equi_depth_bins(ev, "event_type", "value", "event_id")


def _q_running_distinct_types(spark: SparkSession, sf: str) -> DataFrame:
    # cumulative distinct event types per user stream via first-seen
    # flags + running sum (both windows key-partitioned, one bit of
    # state per row — never a carried set)
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.windows import (
        running_distinct_count,
    )

    ev = load_table(spark, sf, "events")
    out = running_distinct_count(ev, "user_id", "ts", "event_type", "event_id")
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "distinct_so_far",
    )


def _q_multimodal_frames(spark: SparkSession, sf: str) -> DataFrame:
    # JVM-side frame sampling over binary payloads (substr + posexplode,
    # zero Python): the oracle re-derives every frame length from the
    # asset id (container sizes are pure arithmetic — BMP row padding,
    # WAV data-chunk size), so the slicing plumbing is value-checked
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.multimodal import (
        frame_sample,
        synthesize_media_assets,
    )

    assets = synthesize_media_assets(spark, 48, 16)
    frames = frame_sample(assets, n_frames=4)
    return frames.select(
        "asset_id",
        "modality",
        "frame_index",
        F.length("frame_payload").alias("frame_len"),
    )


def _q_multimodal_resized(spark: SparkSession, sf: str) -> DataFrame:
    # the mapInPandas resize seam's SHAPE CONTRACT in the gate: output
    # payload is exactly width*height bytes per asset with rewritten
    # dimensions (content equality is pinned in tests; no codec ships
    # in this container)
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.multimodal import (
        resize_images,
        synthesize_media_assets,
    )

    images = synthesize_media_assets(spark, 48, 0)
    out = resize_images(images, width=8, height=4)
    return out.select(
        "asset_id",
        "modality",
        F.length("payload").alias("payload_len"),
        "width",
        "height",
    )


def _q_label_centroids(spark: SparkSession, sf: str) -> DataFrame:
    # the k-means E-step as an exact distributed vector aggregate:
    # per-(label, dim) integer-micros component sums + member counts
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.similarity import (
        label_centroids_exact,
    )

    emb = load_table(spark, sf, "embeddings")
    return label_centroids_exact(emb)


def _q_corpus_pipeline_fuzzy(spark: SparkSession, sf: str) -> DataFrame:
    # the full pretraining-corpus pipeline in ONE query: MinHash/LSH
    # candidates -> connected components -> keep the highest-quality
    # survivor per duplicate cluster -> Gopher quality filter -> per-
    # source data card (docs kept/dropped by stage + kept token mass).
    # Every stage is the already-gated operator; this pins their
    # COMPOSITION (the pipeline a 100 TB corpus actually runs).
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.dedup import (
        keep_best_per_cluster,
    )
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import gopher_quality_flags

    docs = load_table(spark, sf, "documents")
    pairs = minhash_lsh_candidates(docs, "doc_id", "text", n=3, k=16, bands=4)
    cc = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    scored = docs.select("doc_id", quality_score("text").alias("quality"))
    winners = keep_best_per_cluster(cc, scored).select(
        F.col("keep_id").alias("doc_id")
    )
    # survivors: cluster winners + every doc outside any cluster
    survivors = docs.join(cc.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id", "source", "text"
    ).unionByName(
        docs.join(winners, "doc_id", "left_semi").select(
            "doc_id", "source", "text"
        )
    )
    flags = gopher_quality_flags(survivors).select("doc_id", "n_words", "keep")
    tagged = survivors.select("doc_id", "source").join(flags, "doc_id")
    per_source = tagged.groupBy("source").agg(
        F.count("*").alias("n_survivors"),
        F.sum((F.col("keep") == 0).cast("long")).alias("n_quality_dropped"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum(
            F.when(F.col("keep") == 1, F.col("n_words").cast("long"))
            .otherwise(F.lit(0))
        ).alias("tokens_kept"),
    )
    dup_dropped = (
        docs.join(cc.select("doc_id"), "doc_id", "left_semi")
        .join(winners, "doc_id", "left_anti")
        .groupBy("source")
        .agg(F.count("*").alias("n_dup_dropped"))
    )
    return (
        per_source.join(dup_dropped, "source", "left")
        .select(
            "source",
            "n_survivors",
            F.coalesce("n_dup_dropped", F.lit(0)).alias("n_dup_dropped"),
            "n_quality_dropped",
            "n_kept",
            "tokens_kept",
        )
    )


def _q_asof_time_to_convert(spark: SparkSession, sf: str) -> DataFrame:
    # FORWARD as-of join: each click matched to the user's NEXT
    # purchase at-or-after it (time-to-convert), the mirror of the
    # backward attribution query — same single-shuffle union-window
    # plan, window direction flipped.  DuckDB ASOF JOIN with <= is
    # the oracle.
    events = load_table(spark, sf, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    # unique per (user, time) so the as-of winner is engine-independent
    purchases = latest_per_key(
        purchases, ["user_id", "purchase_ts"], "purchase_id"
    )
    joined = asof_join(
        clicks,
        purchases,
        "user_id",
        "ts",
        "purchase_ts",
        ["purchase_id", "purchase_ts"],
        direction="forward",
    )
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    p_us = F.unix_micros(F.col("purchase_ts").cast("timestamp"))
    return joined.select(
        "click_id",
        "user_id",
        t_us.alias("click_time_us"),
        "purchase_id",
        p_us.alias("purchase_time_us"),
        (p_us - t_us).alias("wait_us"),
    )


def _q_path_trigrams(spark: SparkSession, sf: str) -> DataFrame:
    # journey mining: top 3-step event-type sequences per user stream
    # (one user shuffle for both lead windows, then a trigram wordcount)
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.funnel import path_trigrams

    ev = load_table(spark, sf, "events")
    return path_trigrams(ev, top_n=20)


def _q_streaming_sliding_counts(spark: SparkSession, sf: str) -> DataFrame:
    # SLIDING-window streaming aggregation in the gate: 2 h window
    # advancing every 1 h, so each event lands in exactly two windows
    # (state x2 vs tumbling — the cost the docstring warns about).
    # Complete mode => split/lateness-independent => batch-oracle-able:
    # DuckDB reproduces the two aligned windows per row via an
    # unnest([0,1]) hour-offset cross join.
    from etl_based_real_time_air_quality_monitoring_system_spark.streaming.pipeline import (
        windowed_aggregate,
    )

    stream = _events_file_stream(spark, sf)
    agg = windowed_aggregate(
        stream,
        key="event_type",
        value="value",
        ts_col="ts",
        window="2 hours",
        slide="1 hour",
        aggs=[
            F.count("*").alias("record_count"),
            F.round(F.sum(F.col("value").cast("decimal(20,6)")), 2)
            .cast("double")
            .alias("value_sum"),
        ],
    )
    sink = "streaming_sliding_counts_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


def _q_lsh_rescore_tfidf(spark: SparkSession, sf: str) -> DataFrame:
    # the standard two-stage similarity shape: LSH candidate pairs
    # (cheap, banded) -> EXACT integer-micros TF-IDF dot rescoring
    # (never quadratic: bounded by the candidate count)
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import rescore_pairs_tfidf

    docs = load_table(spark, sf, "documents")
    pairs = minhash_lsh_candidates(docs, "doc_id", "text", n=3, k=16, bands=4)
    return rescore_pairs_tfidf(pairs, docs)


def _q_table_profile(spark: SparkSession, sf: str) -> DataFrame:
    # Deequ-style column profile of the event stream: rows / nulls /
    # exact distincts per column in one aggregation pass
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.dq import table_profile

    ev = load_table(spark, sf, "events")
    return table_profile(ev, ["event_id", "user_id", "event_type", "value"])


def _q_sketch_profile(spark: SparkSession, sf: str) -> DataFrame:
    # sketch-based profiling: HLL distinct + approx percentiles per
    # event_type — THE 100 TB substitute for exact count_distinct /
    # ntile paths (count_distinct and equi_depth_bins are this query's
    # exact oracle twins).  Approximate by construction -> rows-only
    # gate entry; tests bound the error vs the exact twins.
    ev = load_table(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("value", 0.95, 10000).alias("p95_approx"),
    )


def _q_sketch_bounds(spark: SparkSession, sf: str) -> DataFrame:
    # sketch_profile's ERROR BOUNDS under the gate (the recall-gate
    # recipe applied to sketches): per (event_type, metric) one row of
    # (exact_val, within_bound) — the exact side is re-derived by the
    # oracle, and the oracle asserts within_bound = 1, so an HLL or
    # quantile-sketch regression that breaks the advertised bound
    # fails rows+hash rather than hiding behind "approximate".
    #
    # Bounds checked: |approx_count_distinct - exact| <= max(1,
    # 15% of exact).  NOTE the asymmetry between the two bound
    # families: HLL++'s 5% rsd is a STANDARD error, not a hard
    # guarantee, so 15% (3 sigma) is a probabilistic envelope — on
    # the pinned test datasets it holds deterministically (verified
    # at sf0.001/0.01/0.1 and hash-frozen by the gate), but a NEW
    # dataset or scale factor can legitimately land a group outside
    # 3 sigma; a distinct_users failure on fresh data is therefore
    # triaged as a probe artifact (re-pin the bound), not a sketch
    # regression.  The percentile rows, by contrast, check
    # percentile_approx's DOCUMENTED deterministic rank-error
    # guarantee and must hold on any dataset; percentile_approx at
    # accuracy 10000 must land between the values at ranks
    # ceil(q*n) -/+ (ceil(n/10000) + 1) — the sketch's documented
    # rank-error guarantee with one rank of slack.  exact_val pins the
    # exact side in the hash (count for distincts, floor-half-up
    # micros of the rank-ceil(q*n) value for percentiles); determinism
    # holds because value-at-rank depends only on the group's value
    # multiset.  The rank windows partition on event_type (tiny
    # cardinality) — fine for a diagnostic/verification query; the
    # production sketch path (sketch_profile) never sorts, and at
    # 100 TB the exact twin would use the coarse-bucket histogram
    # formulation (equi_depth_bins) instead of a per-group sort.
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    du = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_val"),
        F.approx_count_distinct("user_id").alias("_approx"),
    )
    distinct_rows = du.select(
        "event_type",
        F.lit("distinct_users").alias("metric"),
        F.col("exact_val").cast("long").alias("exact_val"),
        (
            F.abs(F.col("_approx") - F.col("exact_val"))
            <= F.greatest(
                F.lit(1).cast("long"),
                F.floor(F.col("exact_val") * F.lit(0.15)).cast("long"),
            )
        )
        .cast("int")
        .alias("within_bound"),
    )
    vals = ev.filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = vals.select(
        "event_type", "value", F.row_number().over(w).alias("_rn")
    )
    appx = vals.groupBy("event_type").agg(
        F.count("*").alias("_n"),
        F.percentile_approx("value", 0.5, 10000).alias("_a50"),
        F.percentile_approx("value", 0.95, 10000).alias("_a95"),
    )
    slack = F.ceil(F.col("_n") / F.lit(10000.0)).cast("long") + F.lit(1)
    targets = appx.select(
        "event_type",
        "_n",
        slack.alias("_slack"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("p50").alias("metric"),
                    F.ceil(F.lit(0.5) * F.col("_n")).cast("long").alias("_rt"),
                    F.col("_a50").alias("_approx"),
                ),
                F.struct(
                    F.lit("p95").alias("metric"),
                    F.ceil(F.lit(0.95) * F.col("_n")).cast("long").alias("_rt"),
                    F.col("_a95").alias("_approx"),
                ),
            )
        ).alias("_m"),
    ).select(
        F.col("event_type").alias("_et"),
        F.col("_m.metric").alias("metric"),
        F.col("_m._rt").alias("_rt"),
        F.greatest(F.lit(1).cast("long"), F.col("_m._rt") - F.col("_slack")).alias("_lo"),
        F.least(F.col("_n"), F.col("_m._rt") + F.col("_slack")).alias("_hi"),
        F.col("_m._approx").alias("_approx"),
    )
    picked = (
        ranked.join(
            F.broadcast(targets),
            on=(F.col("event_type") == F.col("_et"))
            & (
                (F.col("_rn") == F.col("_rt"))
                | (F.col("_rn") == F.col("_lo"))
                | (F.col("_rn") == F.col("_hi"))
            ),
        )
        .groupBy("event_type", "metric")
        .agg(
            F.max(F.when(F.col("_rn") == F.col("_rt"), F.col("value"))).alias("_vt"),
            F.min(F.when(F.col("_rn") == F.col("_lo"), F.col("value"))).alias("_vlo"),
            F.max(F.when(F.col("_rn") == F.col("_hi"), F.col("value"))).alias("_vhi"),
            F.first("_approx").alias("_approx"),
        )
    )
    pct_rows = picked.select(
        "event_type",
        "metric",
        F.floor(F.col("_vt") * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("exact_val"),
        (
            (F.col("_approx") >= F.col("_vlo")) & (F.col("_approx") <= F.col("_vhi"))
        )
        .cast("int")
        .alias("within_bound"),
    )
    return distinct_rows.unionByName(pct_rows)


#: The driver's correctness gate samples the FIRST 50 queries()
#: entries, so the window is an explicit, auditable list (r10) —
#: risk-ordered: (1) the two gate queries NEW this round
#: (normalize_text; lang_id_joined, the broadcast-LUT production
#: branch), never driver-gated; (2) the direct exercisers of the one
#: seam whose code changed this round — the BPE position-window
#: narrowing (word-level base-offset sum + type join-back replacing
#: the token-stream row_number sort) touches bpe_subword_encode and
#: bpe_subword_encode_total, so all three stream gates re-gate on
#: CURRENT plans (values oracle-pinned unchanged); (3) standing
#: policy (r9 verdict item 6): at least one watermark/window
#: streaming entry re-gates EVERY round, because a Spark upgrade can
#: change streaming semantics while batch oracles stay green; (4) the
#: promised _R10_QUEUE in full — all 26 r5-stale entries, which
#: EMPTIES the r5 backlog; (5) 18 r6-stale picks in the r9 verdict's
#: priority order.
#:
#: Rotation arithmetic the policy must respect (r10 verdict
#: discussion): with 216 registry entries and a 50-row window, full
#: coverage takes ceil(216/50) = 5 rounds, so under a strict
#: least-recently-gated rotation the OLDEST gate evidence is always
#: ~4 rounds old and `tools/staleness.py --max-age 3` can never reach
#: zero — the steady-state floor is 216 - 3*50 = 66 entries.  The
#: discipline that keeps this honest: (a) strict LRU rotation with
#: the pins above (new / changed-seam / streaming) taking <= 6 slots,
#: (b) registry growth capped at +2 per round, (c) the per-round
#: 3-SF local oracle sweep on final code (ORACLE_SWEEP.md) covering
#: ALL entries as the alternate evidence for the rotation tail.
#: `python tools/staleness.py --plan` emits the next LRU window
#: mechanically.
_R11_WINDOW: tuple[str, ...] = (
    # new in round 11 (+3 — DELIBERATELY one over the usual +2 cap:
    # r10 verdict items 2 and 3 jointly require these three entries;
    # the pins still take <= 6 slots per the standing policy)
    "normalize_text_nfkc",
    "normalize_text_nfkc_agree",
    "corpus_pipeline_normalized",
    # the full 29-entry r6-stale queue (the r10-promised _R11_QUEUE)
    # — this EMPTIES the r6 staleness backlog
    "union_hot_or_error",
    "pivot_qty_by_status",
    "rollup_flag_status",
    "unpivot_means",
    "value_temp_bands",
    "high_value_events",
    "notnull_count",
    "acctbal_range",
    "count_distinct",
    "global_means",
    "salted_revenue_by_segment",
    "order_snapshot_diff",
    "range_band_join",
    "pii_redaction",
    "funnel_conversion",
    "retention_cohorts",
    "event_transitions",
    "doc_fingerprints",
    "rolling_fingerprints",
    "levenshtein_near_dup",
    "embedding_near_dup",
    "ivf_topk_exhaustive",
    "text_stats",
    "text_quality",
    "lang_pred_counts",
    "train_test_split",
    "zscore_outliers",
    "trailing_hour_count",
    "latest_event_per_type",
    # 18 r7-stale LRU picks (tools/staleness.py --plan order; the r10
    # verdict's "21 oldest r7" assumed zero new entries — the 3 pins
    # above displace the 3 freshest of those 21, which lead
    # _R12_QUEUE).  streaming_stateful_stats doubles as the standing
    # per-round watermark/stateful streaming re-gate (r9 policy).
    "nn_confusion_ivfpq_stored",
    "cluster_balanced_sample",
    "nn_confusion_ivfpq",
    "cdc_vacuum",
    "bpe_merges",
    "flagship",
    "cube_flag_status",
    "asof_purchase_attribution",
    "user_sessions",
    "value_percentiles",
    "session_window_stats",
    "cdc_merge_upsert",
    "repetition_stats",
    "sequence_packing",
    "benchmark_contamination",
    "corpus_datacard",
    "streaming_stateful_stats",
    "multimodal_features",
)

#: the 29 r7-stale entries that did not fit the r11 window —
#: positions 51-79 so local sweeps cover them, and FIRST IN LINE for
#: the r12 window (each is untouched code, green in every 3-SF sweep
#: since r7).  r12 window = these 29 + ~21 r8-stale LRU picks
#: (`tools/staleness.py --plan` emits the exact list), which empties
#: the r7 backlog.
_R12_QUEUE: tuple[str, ...] = (
    "corpus_pipeline",
    "serving_tiles",
    "tpch_q2",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q9",
    "tpch_q10",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "http_ingest_simulated",
    "json_scan_roundtrip",
    "cache_fanout",
    "dead_letter_split",
    "streaming_to_table_roundtrip",
    "sink_partitioned_roundtrip",
    "sink_bucketed_join",
    "target_affinity",
    "streaming_cdc_apply",
)



def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    ORDER MATTERS: the driver's correctness gate samples the first 50
    entries (CORRECTNESS_r05/r06 confirmed exactly 50).  The order is
    defined by the explicit ``_R11_WINDOW`` (the gate window) then
    ``_R12_QUEUE`` (next round's first-in-line), then every remaining
    entry in the literal's declaration order (roughly
    least-recently-gated first among the rest; the freshly-gated
    entries displaced by this rotation sit wherever the literal
    declares them — their evidence is the newest on file).
    """
    base = {
        # === DECLARATION order only — gate order lives in _R11_WINDOW
        # === / _R12_QUEUE above (historical grouping comments kept
        # === where they still aid navigation) =========================
        # --- new in round 11 (+3, r10 verdict items 2-3) --------------
        "normalize_text_nfkc": _q_normalize_text_nfkc,
        "normalize_text_nfkc_agree": _q_normalize_text_nfkc_agree,
        "corpus_pipeline_normalized": _q_corpus_pipeline_normalized,
        # --- new in round 10 (+2, the growth cap the r9 verdict set) -
        "normalize_text": _q_normalize_text,
        "lang_id_joined": _q_lang_id_joined,
        # --- new in round 9 ------------------------------------------
        "lang_id": _q_lang_id,
        "bpe_subword_total": _q_bpe_subword_total,
        "bpe_roundtrip": _q_bpe_roundtrip,
        # --- new in round 8 ------------------------------------------
        "bpe_subword_encode": _q_bpe_subword_encode,
        "domain_capped_sample": _q_domain_capped_sample,
        "blocklist_filter_df": _q_blocklist_filter_df,
        "streaming_ivfpq_index": _q_streaming_ivfpq_index,
        "bm25_search": _q_bm25_search,
        "line_dedup": _q_line_dedup,
        "substring_rewrite": _q_substring_rewrite,
        # --- new or code-changed in round 7 ---------------------------
        "bpe_encode": _q_bpe_encode,
        "quality_classifier": _q_quality_classifier,
        "domain_rollup": _q_domain_rollup,
        "nn_confusion_ivfpq_stored": _q_nn_confusion_ivfpq_stored,
        "cluster_balanced_sample": _q_cluster_balanced_sample,
        # --- new or code-changed this round (round 6): five new gates
        # --- plus the two r5-gated entries whose code the advice fixes
        # --- touched (epoch replay guard / left label join) -----------
        "lsh_topk_recall": _q_lsh_topk_recall,
        "sketch_bounds": _q_sketch_bounds,
        "nn_confusion_ivfpq": _q_nn_confusion_ivfpq,
        "cdc_vacuum": _q_cdc_vacuum,
        "bpe_merges": _q_bpe_merges,
        "streaming_pq_index": _q_streaming_pq_index,
        "retrieval_ndcg": _q_retrieval_ndcg,
        # --- least-recently-gated: the r1 cohort (latest driver row
        # --- is CORRECTNESS_r01; re-gated here on current code) -------
        "union_hot_or_error": _q_union_hot_or_error,
        "pivot_qty_by_status": _q_pivot_qty_by_status,
        "rollup_flag_status": _q_rollup_flag_status,
        "unpivot_means": _q_unpivot_means,
        "tpch_q1": _q_tpch_q1,
        "tpch_q4": _q_tpch_q4,
        "tpch_q7": _q_tpch_q7,
        "tpch_q8": _q_tpch_q8,
        "value_temp_bands": _q_value_temp_bands,
        "high_value_events": _q_high_value_events,
        "notnull_count": _q_notnull_count,
        "acctbal_range": _q_acctbal_range,
        "count_distinct": _q_count_distinct,
        "global_means": _q_global_means,
        "salted_revenue_by_segment": _q_salted_revenue_by_segment,
        "order_snapshot_diff": _q_order_snapshot_diff,
        "gapfill_hourly_locf": _q_gapfill_hourly_locf,
        "range_band_join": _q_range_band_join,
        # --- the r2 cohort (next-oldest driver gate rows; ivf_topk and
        # --- lsh_topk are rows-only BY DESIGN — their quality twins
        # --- ivf_topk_recall/lsh_topk_recall carry the hash checks) ---
        "pii_redaction": _q_pii_redaction,
        "funnel_conversion": _q_funnel_conversion,
        "retention_cohorts": _q_retention_cohorts,
        "event_transitions": _q_event_transitions,
        "doc_fingerprints": _q_doc_fingerprints,
        "rolling_fingerprints": _q_rolling_fingerprints,
        "levenshtein_near_dup": _q_levenshtein_near_dup,
        "simhash": _q_simhash,
        "embedding_topk": _q_embedding_topk,
        "knn_join": _q_knn_join,
        "embedding_near_dup": _q_embedding_near_dup,
        "ivf_topk": _q_ivf_topk,
        "ivf_topk_exhaustive": _q_ivf_topk_exhaustive,
        "lsh_topk": _q_lsh_topk,
        "text_stats": _q_text_stats,
        "text_quality": _q_text_quality,
        "lang_pred_counts": _q_lang_pred_counts,
        "train_test_split": _q_train_test_split,
        "tfidf_terms": _q_tfidf_terms,
        "zscore_outliers": _q_zscore_outliers,
        "top_tokens": _q_top_tokens,
        "trailing_hour_count": _q_trailing_hour_count,
        "latest_event_per_type": _q_latest_event_per_type,
        "scd2_user_history": _q_scd2_user_history,
        "point_in_time_features": _q_point_in_time_features,
        # ==== end of the 50-entry gate window =========================
        # --- r1/r2 stragglers that yielded their slots to the five new
        # --- r6 gates + two changed-code re-gates: each has FRESH
        # --- independent evidence — flagship is smoke-run by entry()
        # --- every round and judge-re-run in r5;
        # --- asof_purchase_attribution, user_sessions, value_percentiles
        # --- and session_window_stats were each independently re-run by
        # --- the r5 judge (VERDICT.md), and all five are green in this
        # --- round's full 3-SF local sweep; FIRST IN LINE for the r7
        # --- window ---------------------------------------------------
        "flagship": flagship_pipeline,
        # --- cube_flag_status yielded its window slot to bpe_merges:
        # --- it shares reshape.py with in-window rollup_flag_status
        # --- and r4-green grouping_sets_qty (the r5 rationale, renewed)
        "cube_flag_status": _q_cube_flag_status,
        "asof_purchase_attribution": _q_asof_purchase_attribution,
        "user_sessions": _q_user_sessions,
        "value_percentiles": _q_value_percentiles,
        "session_window_stats": _q_session_window_stats,
        # --- gated r3 (oldest-gate-first so wider local sweeps hit
        # --- the next-stalest entries) --------------------------------
        "cdc_merge_upsert": _q_cdc_merge_upsert,
        "repetition_stats": _q_repetition_stats,
        "sequence_packing": _q_sequence_packing,
        "benchmark_contamination": _q_benchmark_contamination,
        "mad_outliers": _q_mad_outliers,
        "corpus_datacard": _q_corpus_datacard,
        "streaming_stateful_stats": _q_streaming_stateful_stats,
        "streaming_enriched_counts": _q_streaming_enriched_counts,
        "fuzzy_dedup_corpus": _q_fuzzy_dedup_corpus,
        "stratified_sample": _q_stratified_sample,
        "multimodal_features": _q_multimodal_features,
        "doc_chunks": _q_doc_chunks,
        "corpus_filter": _q_corpus_filter,
        "corpus_pipeline": _q_corpus_pipeline,
        "serving_tiles": _q_serving_tiles,
        "value_rankings": _q_value_rankings,
        "moving_sum_user_value": _q_moving_sum_user_value,
        "sliding_window_counts": _q_sliding_window_counts,
        "above_avg_customers": _q_above_avg_customers,
        "part_type_revenue": _q_part_type_revenue,
        "tpch_q2": _q_tpch_q2,
        "tpch_q3": _q_tpch_q3,
        "tpch_q5": _q_tpch_q5,
        "tpch_q6": _q_tpch_q6,
        "tpch_q9": _q_tpch_q9,
        "tpch_q10": _q_tpch_q10,
        "tpch_q11": _q_tpch_q11,
        "tpch_q12": _q_tpch_q12,
        "tpch_q13": _q_tpch_q13,
        "tpch_q15": _q_tpch_q15,
        "tpch_q16": _q_tpch_q16,
        "tpch_q17": _q_tpch_q17,
        "tpch_q18": _q_tpch_q18,
        "tpch_q19": _q_tpch_q19,
        "tpch_q20": _q_tpch_q20,
        "tpch_q21": _q_tpch_q21,
        "tpch_q22": _q_tpch_q22,
        "nn_label_confusion": _q_nn_label_confusion,
        "tpch_q14": _q_tpch_q14,
        "http_ingest_simulated": _q_http_ingest_simulated,
        "json_scan_roundtrip": _q_json_scan_roundtrip,
        "group_split": _q_group_split,
        "stratified_quota_sample": _q_stratified_quota_sample,
        "cache_fanout": _q_cache_fanout,
        "dead_letter_split": _q_dead_letter_split,
        "streaming_to_table_roundtrip": _q_streaming_to_table_roundtrip,
        "sink_partitioned_roundtrip": _q_sink_partitioned_roundtrip,
        "sink_bucketed_join": _q_sink_bucketed_join,
        # --- gated r4 (oldest-gate-first so wider local sweeps hit
        # --- the next-stalest entries) --------------------------------
        "gopher_quality": _q_gopher_quality,
        "token_cooccurrence": _q_token_cooccurrence,
        "passage_dedup": _q_passage_dedup,
        "dedup_keep_best": _q_dedup_keep_best,
        "drift_report": _q_drift_report,
        "equi_depth_bins": _q_equi_depth_bins,
        "sketch_profile": _q_sketch_profile,
        "ngram_containment": _q_ngram_containment,
        "key_skew_report": _q_key_skew_report,
        "sink_orc_roundtrip": _q_sink_orc_roundtrip,
        "lsh_rescore_tfidf": _q_lsh_rescore_tfidf,
        "table_profile": _q_table_profile,
        "streaming_sliding_counts": _q_streaming_sliding_counts,
        "path_trigrams": _q_path_trigrams,
        "asof_time_to_convert": _q_asof_time_to_convert,
        "corpus_pipeline_fuzzy": _q_corpus_pipeline_fuzzy,
        "label_centroids": _q_label_centroids,
        "multimodal_frames": _q_multimodal_frames,
        "multimodal_resized": _q_multimodal_resized,
        "grouped_deciles": _q_grouped_deciles,
        "running_distinct_types": _q_running_distinct_types,
        "dedup_graph_stats": _q_dedup_graph_stats,
        "oov_rate": _q_oov_rate,
        "range_band_join_bucketed": _q_range_band_join_bucketed,
        "incremental_dedup": _q_incremental_dedup,
        "cluster_safe_split": _q_cluster_safe_split,
        "schema_evolution_roundtrip": _q_schema_evolution_roundtrip,
        "ingest_metrics_passthrough": _q_ingest_metrics_passthrough,
        "sink_csv_roundtrip": _q_sink_csv_roundtrip,
        "ngram_jaccard_capped": _q_ngram_jaccard_capped,
        "mixture_sample": _q_mixture_sample,
        "token_budget_prefix": _q_token_budget_prefix,
        "sink_sharded_export": _q_sink_sharded_export,
        "embedding_gram": _q_embedding_gram,
        "hourly_ohlc": _q_hourly_ohlc,
        "zorder_cells": _q_zorder_cells,
        "embedding_near_dup_gemm": _q_embedding_near_dup_gemm,
        "grouping_sets_qty": _q_grouping_sets_qty,
        "simhash_near_dup": _q_simhash_near_dup,
        "streaming_hourly_counts": _q_streaming_hourly_counts,
        "streaming_dedup_keys": _q_streaming_dedup_keys,
        "streaming_click_purchase": _q_streaming_click_purchase,
        "streaming_session_stats": _q_streaming_session_stats,
        "air_quality_summary": _q_air_quality_summary,
        "ngram_jaccard": _q_ngram_jaccard,
        "minhash_pairs": _q_minhash_pairs,
        "dedup_clusters": _q_dedup_clusters,
        # --- gated r5 (oldest-gate-first so wider local sweeps hit
        # --- the next-stalest entries) --------------------------------
        "substring_dup_spans": _q_substring_dup_spans,
        "source_overlap": _q_source_overlap,
        "target_affinity": _q_target_affinity,
        "incremental_neardup": _q_incremental_neardup,
        "semantic_dedup": _q_semantic_dedup,
        "curation_pipeline": _q_curation_pipeline,
        "bigram_lm": _q_bigram_lm,
        "pq_codes": _q_pq_codes,
        "pq_topk_adc": _q_pq_topk_adc,
        "pq_recall": _q_pq_recall,
        "ivfpq_topk": _q_ivfpq_topk,
        "ivfpq_recall": _q_ivfpq_recall,
        "dup_graph_pagerank": _q_dup_graph_pagerank,
        "pps_sample": _q_pps_sample,
        "zorder_pruning": _q_zorder_pruning,
        "streaming_late_data_drop": _q_streaming_late_data_drop,
        "cdc_time_travel": _q_cdc_time_travel,
        "ivf_topk_recall": _q_ivf_topk_recall,
        "funnel_over_cdc": _q_funnel_over_cdc,
        "multimodal_decode": _q_multimodal_decode,
        "streaming_cdc_apply": _q_streaming_cdc_apply,
        "corpus_assembly": _q_corpus_assembly,
        "grouped_stats": _q_grouped_stats,
        "band_distribution": _q_band_distribution,
        "hourly_activity": _q_hourly_activity,
        "multikey_summary": _q_multikey_summary,
        "priority_counts": _q_priority_counts,
        "dq_report": _q_dq_report,
        "latest_value_max_by": _q_latest_value_max_by,
        "value_histogram": _q_value_histogram,
        "priority_except_all": _q_priority_except_all,
        "priority_intersect_all": _q_priority_intersect_all,
        "top_orders": _q_top_orders,
        "price_bands": _q_price_bands,
        "calendar_parts": _q_calendar_parts,
        "weighted_score": _q_weighted_score,
        "props_k_stats": _q_props_k_stats,
        "member_filter": _q_member_filter,
        "distinct_user_event": _q_distinct_user_event,
        "join_revenue_by_segment": _q_join_revenue_by_segment,
        "join_star_region": _q_join_star_region,
        "customers_with_orders": _q_customers_with_orders,
        "customers_without_orders": _q_customers_without_orders,
        "running_user_value": _q_running_user_value,
        "top3_per_type": _q_top3_per_type,
        "value_delta_per_user": _q_value_delta_per_user,
        "users_click_and_purchase": _q_users_click_and_purchase,
        "users_click_not_purchase": _q_users_click_not_purchase,
    }
    ordered = {n: base[n] for n in _R11_WINDOW}
    for n in _R12_QUEUE:
        ordered[n] = base[n]
    for n, f in base.items():
        if n not in ordered:
            ordered[n] = f
    return ordered


# --- generated oracle fragments for the hash-based dedup family -------

_TOKS = r"string_split_regex(trim(text), '\s+')"


def _sql_str(s: str) -> str:
    """A DuckDB single-quoted string literal (doubled inner quotes;
    raw unicode/control characters embed as-is — both engines read
    the same UTF-8 bytes, so no escape-syntax drift)."""
    return "'" + s.replace("'", "''") + "'"


def _normalize_sql(expr: str) -> str:
    """DuckDB expression for ``operators.text.normalize_text`` over
    ``expr`` — generated from the SAME fold tables as the Spark
    expression (one source of truth; see the operator docstring for
    the stage order rationale)."""
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.text import (
        NORMALIZE_EXPANSIONS,
        _NORM_FROM,
        _NORM_TO,
    )

    x = f"regexp_replace({expr}, '\\p{{Cf}}', '', 'g')"
    x = f"regexp_replace({x}, '\\p{{Cc}}', ' ', 'g')"
    x = f"translate({x}, {_sql_str(_NORM_FROM)}, {_sql_str(_NORM_TO)})"
    for src, dst in NORMALIZE_EXPANSIONS:
        x = f"replace({x}, {_sql_str(src)}, {_sql_str(dst)})"
    return f"trim(regexp_replace(lower({x}), ' +', ' ', 'g'))"
_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
#: Gopher required-stopword list as a DuckDB list literal (mirrors
#: operators.text.GOPHER_STOPWORDS)
_GOPHER_SQL = "['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']"

#: 24-bit Morton interleave of two 12-bit cells (mirrors
#: operators.layout.interleave_bits: bit j of col i -> position j*2+i)
_Z_INTERLEAVE = "\n                   + ".join(
    f"(((a >> {j}) & 1) * {1 << (2 * j)}) + (((b >> {j}) & 1) * {1 << (2 * j + 1)})"
    for j in range(12)
)

#: per-column profile rows for the table_profile oracle (mirrors
#: operators.dq.table_profile over the events columns in the query)
_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name,
               count(*) AS n_rows,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nulls,
               count(DISTINCT {c}) AS n_distinct
        FROM events"""
    for c in ("event_id", "user_id", "event_type", "value")
)

_SHINGLE_CTES = rf"""
    toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
    )"""

#: Kirsch–Mitzenmacher double hashing, mirroring
#: dedup.minhash_signatures: h_i = h1 + i*h2 (h1 60 bits, h2 28 bits)
_MH_H1 = "('0x' || substr(md5(shingle), 1, 15))::BIGINT"
_MH_H2 = "('0x' || substr(md5('salt:' || shingle), 1, 7))::BIGINT"
_MINHASH_AGGS = ",\n                   ".join(
    f"min({_MH_H1} + {i} * {_MH_H2}) AS h{i}" for i in range(16)
)
_BAND_SELECTS = "\n            UNION ALL\n            ".join(
    "SELECT doc_id, {b} AS band, md5(concat_ws('|', {cols})) AS bucket FROM sig".format(
        b=b, cols=", ".join(f"h{b * 4 + j}" for j in range(4))
    )
    for b in range(4)
)

#: PageRank iterations unrolled as CTEs (mirrors graph.pagerank_micros:
#: pr'(v) = 150000 + (850000 * sum(pr(u) // deg(u))) // 1e6, all BIGINT)
_PR_CTES = ",\n            ".join(
    f"""pr{i + 1} AS (
                SELECT s.b AS v,
                       CAST(150000 + (850000 * sum(p.pr // d.dg)) // 1000000
                            AS BIGINT) AS pr
                FROM sym s JOIN pr{i} p ON p.v = s.a
                JOIN deg d ON d.a = s.a
                GROUP BY s.b
            )"""
    for i in range(3)
)

def _bpe_round_ctes(n_rounds: int = 3, carry: str = "") -> str:
    """BPE merge rounds unrolled as CTEs (the _PR_CTES sequential-fold
    recipe): per round, pair counts (self-pairs excluded, mirroring
    the operator's order-independence restriction), the (count DESC,
    l, r) argmax, and the merged token arrays.  Generated by loop so
    the per-round SQL can never drift between rounds.  ``carry``
    (e.g. ``"doc_id, "``) threads identity columns through the merged
    arrays so bpe_encode's oracle shares the SAME learn+apply chain
    as bpe_merges' — the two can't drift apart."""
    parts = []
    for k in range(1, n_rounds + 1):
        prev = f"t{k - 1}"
        parts.append(f"""
            p{k} AS (
                SELECT t[i] AS l, t[i + 1] AS r
                FROM {prev}, UNNEST(range(1, greatest(len(t), 1))) AS u(i)
                WHERE t[i] != t[i + 1]
            ),
            m{k} AS (
                SELECT l, r, c FROM (
                    SELECT l, r, count(*) AS c, row_number() OVER (
                        ORDER BY count(*) DESC, l, r
                    ) AS rn
                    FROM p{k} GROUP BY l, r
                ) WHERE rn = 1
            ),
            t{k} AS (
                -- LEFT JOIN ON TRUE: when fewer than {k} merges are
                -- learnable (m{k} empty) the corpus passes through
                -- unchanged — matching the operator, which stops
                -- merging when no pair remains (a plain cross join
                -- would zero out the corpus and every later round)
                SELECT {carry}list_filter(
                    list_transform(range(1, len(t) + 1), i ->
                        CASE WHEN i < len(t) AND t[i] = m.l
                                  AND t[i + 1] = m.r
                                 THEN t[i] || chr(1) || t[i + 1]
                             WHEN i > 1 AND t[i - 1] = m.l AND t[i] = m.r
                                 THEN NULL
                             ELSE t[i] END),
                    x -> x IS NOT NULL) AS t
                FROM {prev} LEFT JOIN m{k} m ON TRUE
            )""")
    return ",".join(parts)


#: shared URL/domain oracle chain for the curation gates
#: (domain_rollup, domain_capped_sample, blocklist_filter_df): the
#: md5-synthesized URLs, the exact host regex (bracketed-IPv6
#: alternative included), the public-suffix semantics (IP-host
#: guard; longest proper-suffix rule via a length-ranked rules
#: join; bare-suffix -> NULL; last-two-labels fallback).  One
#: definition so the three gates can never drift apart.  Ends at
#: the ``dom`` CTE: (doc_id, host, text, domain).
_URL_DOM_CTES = r"""
            u AS (
                SELECT doc_id, text,
                       md5('url:v1:' || CAST(doc_id AS VARCHAR)) AS h
                FROM documents
            ),
            urls AS (
                SELECT doc_id, text,
                       'https://'
                       || CASE ('0x' || substr(h, 13, 6))::BIGINT % 3
                              WHEN 0 THEN 'www.'
                              WHEN 1 THEN 'cdn.edge.'
                              ELSE '' END
                       || 'site'
                       || CAST(('0x' || substr(h, 1, 6))::BIGINT % 50
                               AS VARCHAR)
                       || '.'
                       || (['com','org','co.uk','github.io','net','ac.jp'])
                          [CAST(('0x' || substr(h, 7, 6))::BIGINT % 6
                                AS INTEGER) + 1]
                       || '/d/' || CAST(doc_id AS VARCHAR) AS url
                FROM u
            ),
            hosts AS (
                SELECT doc_id, text,
                       lower(regexp_extract(url,
                           '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?(\[[^\]/?#]+\]|[^/:?#@]+)',
                           1)) AS host
                FROM urls
            ),
            rules AS (
                SELECT unnest(['com','org','net','edu','gov','io','dev',
                               'app','uk','co.uk','ac.uk','jp','co.jp',
                               'ac.jp','au','com.au','github.io']) AS r
            ),
            best AS (
                SELECT doc_id, r FROM (
                    SELECT h.doc_id, r.r, row_number() OVER (
                               PARTITION BY h.doc_id
                               ORDER BY length(r.r) DESC
                           ) AS rn
                    FROM hosts h JOIN rules r ON h.host LIKE '%.' || r.r
                ) WHERE rn = 1
            ),
            dom AS (
                SELECT h.doc_id, h.host, h.text,
                       CASE WHEN regexp_matches(h.host, '^(\[.*|[0-9.]+)$')
                                 THEN NULL
                            WHEN h.host IN (SELECT r FROM rules) THEN NULL
                            WHEN b.r IS NULL THEN
                                CASE WHEN len(string_split(h.host, '.')) >= 2
                                     THEN string_split(h.host, '.')[-2]
                                          || '.'
                                          || string_split(h.host, '.')[-1]
                                     ELSE NULL END
                            ELSE string_split(
                                     substr(h.host, 1,
                                            length(h.host) - length(b.r) - 1),
                                     '.')[-1] || '.' || b.r
                       END AS domain
                FROM hosts h LEFT JOIN best b USING (doc_id)
            )
"""


def _bpe_sub_round_ctes(n_rounds: int = 3) -> str:
    """Character-level BPE rounds unrolled as CTEs — the
    ``_bpe_round_ctes`` recipe over the word-TYPE symbol table
    (w, f, t): pair counts are FREQUENCY-WEIGHTED sums, the fused
    symbol is the plain concatenation (no separator byte — subword
    symbols are character strings), and the LEFT JOIN ON TRUE keeps
    sub-``n_rounds``-learnable corpora flowing through unchanged
    (the empty-round pass-through lesson)."""
    parts = []
    for k in range(1, n_rounds + 1):
        prev = f"s{k - 1}"
        parts.append(f"""
            p{k} AS (
                SELECT t[i] AS l, t[i + 1] AS r, f
                FROM {prev}, UNNEST(range(1, greatest(len(t), 1))) AS u(i)
                WHERE t[i] != t[i + 1]
            ),
            m{k} AS (
                SELECT l, r, c FROM (
                    SELECT l, r, CAST(sum(f) AS BIGINT) AS c,
                           row_number() OVER (
                               ORDER BY sum(f) DESC, l, r
                           ) AS rn
                    FROM p{k} GROUP BY l, r
                ) WHERE rn = 1
            ),
            s{k} AS (
                SELECT w, f, list_filter(
                    list_transform(range(1, len(t) + 1), i ->
                        CASE WHEN i < len(t) AND t[i] = m.l
                                  AND t[i + 1] = m.r
                                 THEN t[i] || t[i + 1]
                             WHEN i > 1 AND t[i - 1] = m.l AND t[i] = m.r
                                 THEN NULL
                             ELSE t[i] END),
                    x -> x IS NOT NULL) AS t
                FROM {prev} LEFT JOIN m{k} m ON TRUE
            )""")
    return ",".join(parts)


#: shared IVF-PQ oracle chain (micros -> coarse assign -> residual
#: codebook [skipping the zero-residual centroid rows] -> encode ->
#: probes -> LUTs -> per-(query, vec) ADC distance); ivfpq_topk,
#: ivfpq_recall and nn_confusion_ivfpq all build on it so the three
#: can never drift apart.  The template's only free parameter is the
#: query-set size (vec_id < {n_queries}).
_IVFPQ_CTES_TEMPLATE = """
            WITH mq AS (
                SELECT vec_id, list_transform(embedding::DOUBLE[],
                           x -> floor(x * 1000000.0 + 0.5)) AS me
                FROM embeddings
            ),
            cc AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                       me AS ce
                FROM (SELECT * FROM mq ORDER BY vec_id LIMIT 8)
            ),
            -- coarse assign: argmin squared L2 (dot identity; the x.x
            -- term is constant across centroids), ties -> LOWEST cid;
            -- residual = x - centroid, exact integer components
            assign AS (
                SELECT vec_id, cid, re FROM (
                    SELECT m.vec_id, c.cid,
                           list_transform(range(1, len(m.me) + 1),
                               i -> m.me[i] - c.ce[i]) AS re,
                           row_number() OVER (
                               PARTITION BY m.vec_id ORDER BY
                                   list_dot_product(c.ce, c.ce)
                                   - 2 * list_dot_product(m.me, c.ce) ASC,
                                   c.cid ASC
                           ) AS rn
                    FROM mq m CROSS JOIN cc c
                ) WHERE rn = 1
            ),
            -- residual codebook SKIPS the first 8 rows: they ARE the
            -- coarse centroids, so their residuals are exactly zero
            -- and would waste half the code budget on one point
            rcb AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code,
                       re AS ce
                FROM (SELECT vec_id, re FROM assign
                      ORDER BY vec_id LIMIT 16 OFFSET 8)
            ),
            rsubs AS (
                SELECT vec_id, j, list_slice(re, j*8 + 1, j*8 + 8) AS sv
                FROM assign, UNNEST(range(0, 8)) AS u(j)
            ),
            csubs AS (
                SELECT code, j, list_slice(ce, j*8 + 1, j*8 + 8) AS cv
                FROM rcb, UNNEST(range(0, 8)) AS u(j)
            ),
            enc AS (
                SELECT vec_id, j, code FROM (
                    SELECT s.vec_id, s.j, c.code, row_number() OVER (
                        PARTITION BY s.vec_id, s.j ORDER BY
                            list_dot_product(s.sv, s.sv)
                            - 2 * list_dot_product(s.sv, c.cv)
                            + list_dot_product(c.cv, c.cv) ASC,
                            c.code ASC
                    ) AS rn
                    FROM rsubs s JOIN csubs c ON s.j = c.j
                ) WHERE rn = 1
            ),
            q AS (SELECT vec_id AS qid, me AS qe FROM mq
                  WHERE vec_id < {n_queries}),
            probes AS (
                SELECT qid, cid, ce FROM (
                    SELECT q.qid, c.cid, c.ce, row_number() OVER (
                        PARTITION BY q.qid ORDER BY
                            list_dot_product(c.ce, c.ce)
                            - 2 * list_dot_product(q.qe, c.ce) ASC,
                            c.cid ASC
                    ) AS rn
                    FROM q CROSS JOIN cc c
                ) WHERE rn <= 4
            ),
            qsubs AS (
                SELECT p.qid, p.cid, j,
                       list_slice(list_transform(range(1, len(q.qe) + 1),
                           i -> q.qe[i] - p.ce[i]), j*8 + 1, j*8 + 8) AS qv
                FROM probes p JOIN q USING (qid), UNNEST(range(0, 8)) AS u(j)
            ),
            lut AS (
                SELECT qs.qid, qs.cid, cs.j, cs.code,
                       list_dot_product(qs.qv, qs.qv)
                       - 2 * list_dot_product(qs.qv, cs.cv)
                       + list_dot_product(cs.cv, cs.cv) AS d2
                FROM qsubs qs JOIN csubs cs ON qs.j = cs.j
            ),
            adc AS (
                SELECT l.qid, a.vec_id, CAST(sum(l.d2) AS BIGINT) AS adc_dist
                FROM assign a
                JOIN enc e ON e.vec_id = a.vec_id
                JOIN lut l ON l.cid = a.cid AND l.j = e.j AND l.code = e.code
                GROUP BY l.qid, a.vec_id
            )
"""


#: confusion tail shared by nn_confusion_ivfpq AND its stored-index
#: twin: best NON-SELF candidate per query by (adc_dist, vec_id),
#: label pairs rolled up.  (Spark takes k=2 then excludes self; at
#: most one self row exists per query, so rank-1-of-non-self over all
#: candidates is the identical set.)
_NN_CONFUSION_TAIL = """
            , nn AS (
                SELECT qid, vec_id FROM (
                    SELECT qid, vec_id, row_number() OVER (
                        PARTITION BY qid ORDER BY adc_dist ASC, vec_id ASC
                    ) AS rn
                    FROM adc WHERE vec_id != qid
                ) WHERE rn = 1
            )
            SELECT lq.label AS label, ln.label AS nn_label,
                   count(*) AS pair_count
            FROM nn
            JOIN embeddings lq ON lq.vec_id = nn.qid
            JOIN embeddings ln ON ln.vec_id = nn.vec_id
            GROUP BY 1, 2
        """


def _ivfpq_ctes(n_queries: int = 5) -> str:
    return _IVFPQ_CTES_TEMPLATE.format(n_queries=n_queries)


#: the 5-query instantiation the topk/recall gates use
_IVFPQ_CTES = _ivfpq_ctes()

_SIMHASH_BIT_AGGS = ",\n                   ".join(
    f"sum(CASE WHEN (h & (1::BIGINT << {j})) != 0 THEN 1 ELSE -1 END) AS b{j}"
    for j in range(SIMHASH_BITS)
)
_SIMHASH_ASSEMBLE = "\n                 + ".join(
    f"(CASE WHEN b{j} > 0 THEN (1::BIGINT << {j}) ELSE 0::BIGINT END)"
    for j in range(SIMHASH_BITS)
)

#: language-ID argmax as a CASE chain — provably equivalent to the
#: engine's first-max fold (earlier language wins ties)
_LANG_SCORES = ",\n                   ".join(
    "len(list_filter(toks, x -> x IN ({words}))) AS s_{lang}".format(
        lang=lang, words=", ".join(f"'{w}'" for w in words)
    )
    for lang, words in (
        ("en", ("the", "and", "of", "to", "a")),
        ("es", ("el", "la", "de", "que", "y")),
        ("de", ("der", "die", "und", "das", "ist")),
        ("fr", ("le", "la", "et", "les", "des")),
    )
)


#: the shared dedup -> profile -> quality/lang/token-bound filter CTE
#: chain (mirrors plans.corpus.prepare_corpus) — factored so the
#: corpus_pipeline / corpus_assembly / corpus_pipeline_normalized
#: oracles can never drift apart.  ``doc_src`` is the relation the
#: chain reads (``documents`` raw, or a normalizing stage-0 CTE for
#: the prepare_corpus(normalize=True) twin — the CCNet/C4 stage order
#: means normalization happens BEFORE the dedup fingerprint).
def _corpus_kept_ctes(doc_src: str = "documents") -> str:
    return rf"""fp AS (
                SELECT doc_id, source, text,
                       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
                FROM {doc_src}
            ),
            surv AS (
                SELECT doc_id, source, text FROM (
                    SELECT *, row_number() OVER (PARTITION BY f ORDER BY doc_id) AS rn
                    FROM fp
                ) WHERE rn = 1
            ),
            t AS (
                SELECT doc_id, source, {_TOKS} AS toks,
                       string_split_regex(trim(lower(text)), '\s+') AS ltoks
                FROM surv
            ),
            profiled AS (
                SELECT doc_id, source,
                       floor((
                           0.4::DOUBLE * least(len(toks)::DOUBLE / 100.0::DOUBLE, 1.0::DOUBLE)
                         + 0.3::DOUBLE * (len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE)
                         + 0.3::DOUBLE * (1.0::DOUBLE
                               - len(list_filter(toks, x -> x IN {_STOP_SQL}))::DOUBLE
                                 / len(toks)::DOUBLE)
                           ) * 10000.0 + 0.5) / 10000.0 AS quality,
                       CAST(len(toks) AS INTEGER) AS n_tokens,
                       len(list_filter(ltoks, x -> x IN ('the','and','of','to','a'))) AS s_en,
                       len(list_filter(ltoks, x -> x IN ('el','la','de','que','y'))) AS s_es,
                       len(list_filter(ltoks, x -> x IN ('der','die','und','das','ist'))) AS s_de,
                       len(list_filter(ltoks, x -> x IN ('le','la','et','les','des'))) AS s_fr
                FROM t
            ),
            kept AS (
                SELECT * FROM profiled
                WHERE quality >= 0.5
                  AND n_tokens BETWEEN 20 AND 2000
                  AND (CASE
                        WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en > 0
                            THEN 'en'
                        WHEN s_es >= s_de AND s_es >= s_fr AND s_es > 0 THEN 'es'
                        WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
                        WHEN s_fr > 0 THEN 'fr'
                        ELSE 'und' END) = 'en'
            )"""


_CORPUS_KEPT_CTES = _corpus_kept_ctes()

#: the prepare_corpus(normalize=True) chain: a stage-0 CTE normalizes
#: the noise-injected text through the fold-table SQL (generated from
#: the SAME NORMALIZE_CHAR_FOLDS / NORMALIZE_EXPANSIONS tables as the
#: Spark expression via _normalize_sql), then the SAME kept-chain runs
#: over it — so the dedup fingerprint, every profile metric, and the
#: keep filters all see normalized text, exactly the Spark stage order
_CORPUS_KEPT_CTES_NORM = (
    f"""normdocs AS (
                SELECT doc_id, source,
                       {_normalize_sql(
                           _sql_str(_NORM_NOISE_PREFIX)
                           + " || text || "
                           + _sql_str(_NORM_NOISE_SUFFIX)
                       )} AS text
                FROM documents
            ),
            """
    + _corpus_kept_ctes("normdocs")
)


def oracle_sql() -> dict[str, str]:
    """DuckDB-ANSI twins, column-name-aligned with ``queries()``."""
    out = _oracle_sql_literal()
    # the streaming session-window run is batch-equivalent in complete
    # mode, so it shares the batch island-SQL oracle verbatim
    out["streaming_session_stats"] = out["session_window_stats"]
    # the bucketized interval join must agree with the BNLJ plan
    # row-for-row, so it shares the same oracle verbatim
    out["range_band_join_bucketed"] = out["range_band_join"]
    # the streamed PQ index must equal the one-shot batch encode for
    # any micro-batch composition, so it shares pq_codes' oracle
    out["streaming_pq_index"] = out["pq_codes"]
    # the full-NFKC path on subset-class-only input (ASCII corpus +
    # _NORM_NOISE_*) must equal the subset fold chain character for
    # character (the documented equivalence contract), so the
    # agreement twin shares normalize_text's fold-SQL oracle verbatim
    # — hash-gating an ArrowEvalPython path DuckDB cannot express.
    # (normalize_text_nfkc itself, with NFKC-ONLY noise, is rows-only
    # by design: DuckDB has NFC only.)
    out["normalize_text_nfkc_agree"] = out["normalize_text"]
    return out


def _oracle_sql_literal() -> dict[str, str]:
    from etl_based_real_time_air_quality_monitoring_system_spark.operators.similarity import (
        ndcg_position_weights_micros,
    )

    # the SAME integer-micros NDCG discounts the Spark plan embeds —
    # generated once, interpolated into the oracle as literals
    _ndcg_w = ndcg_position_weights_micros(10)
    _ndcg_wts = ", ".join(f"({p}, {w})" for p, w in enumerate(_ndcg_w, 1))
    _ndcg_pre = ", ".join(
        f"({r}, {s})"
        for r, s in enumerate(
            [sum(_ndcg_w[:i]) for i in range(1, 11)], 1
        )
    )
    return {
        "gopher_quality": rf"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            m AS (
                SELECT doc_id,
                       len(toks) AS n_words,
                       floor(list_aggregate(list_transform(toks, x -> length(x)), 'sum')::DOUBLE
                             / len(toks)::DOUBLE * 10000.0 + 0.5) / 10000.0 AS mean_word_len,
                       floor(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                             / len(toks)::DOUBLE * 10000.0 + 0.5) / 10000.0 AS alpha_frac,
                       len(list_filter({_GOPHER_SQL}, s -> list_contains(toks, s))) AS stop_hits
                FROM t
            )
            SELECT doc_id,
                   CAST(n_words AS INTEGER) AS n_words,
                   mean_word_len,
                   alpha_frac,
                   CAST(stop_hits AS INTEGER) AS stop_hits,
                   CAST(CASE WHEN n_words BETWEEN 5 AND 100000
                              AND mean_word_len BETWEEN 3.0 AND 10.0
                              AND alpha_frac >= 0.8
                              AND stop_hits >= 2
                        THEN 1 ELSE 0 END AS INTEGER) AS keep
            FROM m
        """,
        "token_cooccurrence": rf"""
            WITH e AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
            td AS (SELECT DISTINCT doc_id, tok FROM e),
            vocab AS (SELECT tok FROM td GROUP BY tok HAVING count(*) >= 5),
            p AS (
                SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_docs
                FROM td a JOIN td b ON a.doc_id = b.doc_id AND a.tok < b.tok
                WHERE a.tok IN (SELECT tok FROM vocab)
                  AND b.tok IN (SELECT tok FROM vocab)
                GROUP BY 1, 2
            )
            SELECT tok_a, tok_b, n_docs
            FROM p ORDER BY n_docs DESC, tok_a, tok_b LIMIT 50
        """,
        "passage_dedup": rf"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            base AS (
                SELECT doc_id, toks,
                       CAST(len(toks) // 8 AS INTEGER) AS n_passages
                FROM t
            ),
            p AS (
                SELECT doc_id,
                       md5(array_to_string(toks[(i*8+1):(i*8+8)], ' ')) AS ph
                FROM base, UNNEST(range(0, n_passages)) AS u(i)
            ),
            shared AS (
                SELECT ph FROM p GROUP BY ph HAVING count(DISTINCT doc_id) >= 2
            ),
            d AS (
                SELECT doc_id, count(*) AS n_dup FROM p
                WHERE ph IN (SELECT ph FROM shared) GROUP BY doc_id
            )
            SELECT b.doc_id, b.n_passages,
                   CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup_passages,
                   CASE WHEN b.n_passages > 0
                        THEN floor(coalesce(d.n_dup, 0)::DOUBLE
                                   / b.n_passages::DOUBLE * 10000.0 + 0.5) / 10000.0
                        ELSE 0.0 END AS dup_frac
            FROM base b LEFT JOIN d ON b.doc_id = d.doc_id
        """,
        "source_overlap": rf"""
            WITH t AS (
                SELECT doc_id, source, {_TOKS} AS toks FROM documents
            ),
            base AS (
                SELECT source, toks,
                       CAST(len(toks) // 8 AS INTEGER) AS n_passages
                FROM t
            ),
            p AS (
                SELECT DISTINCT source,
                       md5(array_to_string(toks[(i*8+1):(i*8+8)], ' ')) AS ph
                FROM base, UNNEST(range(0, n_passages)) AS u(i)
            )
            SELECT a.source AS src_a, b.source AS src_b,
                   CAST(count(*) AS BIGINT) AS shared_passages
            FROM p a JOIN p b ON a.ph = b.ph AND a.source < b.source
            GROUP BY 1, 2
        """,
        "curation_pipeline": rf"""
            WITH fp AS (
                SELECT doc_id, source, text,
                       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
                           AS f
                FROM documents WHERE text IS NOT NULL
            ),
            keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
            surv AS (
                SELECT fp.doc_id, fp.source, fp.text
                FROM fp JOIN keep USING (doc_id)
            ),
            t AS (
                SELECT doc_id, source, {_TOKS} AS toks FROM surv
            ),
            feats AS (
                SELECT doc_id, source,
                       ('0x' || substr(md5('dsir:v1' || feat), 1, 7))::BIGINT
                           % 1024 AS b
                FROM (
                    SELECT doc_id, source, tt FROM t, UNNEST(toks) AS u(tt)
                    UNION ALL
                    SELECT doc_id, source, toks[i+1] || ' ' || toks[i+2]
                    FROM t, UNNEST(range(0, len(toks) - 1)) AS u(i)
                ) ff(doc_id, source, feat)
            ),
            craw AS (SELECT b, count(*) AS c FROM feats GROUP BY b),
            ctgt AS (
                SELECT b, count(*) AS c FROM feats
                WHERE source = 'src0' GROUP BY b
            ),
            w AS (
                SELECT craw.b,
                       (coalesce(ctgt.c, 0) * 1000000) // craw.c AS w
                FROM craw LEFT JOIN ctgt ON craw.b = ctgt.b
            ),
            scored AS (
                SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
                       CAST(sum(w.w) // count(*) AS BIGINT)
                           AS affinity_micros
                FROM feats f JOIN w ON f.b = w.b
                GROUP BY f.doc_id
            ),
            wts AS (
                SELECT doc_id, n_feats, affinity_micros,
                       md5('pps:v1' || CAST(doc_id AS VARCHAR)) AS h
                FROM scored
                WHERE doc_id IS NOT NULL AND affinity_micros > 0
            ),
            cc AS (
                SELECT doc_id, n_feats, affinity_micros,
                       sum(affinity_micros) OVER (ORDER BY h, doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
                FROM wts
            ),
            tot AS (SELECT sum(affinity_micros) AS total FROM wts)
            SELECT doc_id, n_feats, affinity_micros,
                   CAST((cum * 50) // total AS BIGINT) AS sample_rank
            FROM cc, tot
            WHERE (cum * 50) // total
                  > ((cum - affinity_micros) * 50) // total
        """,
        "semantic_dedup": """
            WITH m AS (
                SELECT vec_id, list_transform(embedding::DOUBLE[],
                           x -> floor(x * 1000000.0 + 0.5)) AS me
                FROM embeddings
            ),
            c AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                       me AS ce
                FROM (SELECT * FROM m ORDER BY vec_id LIMIT 8)
            ),
            -- ivf_assign mirror: argmax by cosine, ties -> HIGHEST cid
            assign AS (
                SELECT vec_id, me, cid FROM (
                    SELECT m.vec_id, m.me, c.cid, row_number() OVER (
                        PARTITION BY m.vec_id ORDER BY
                            list_dot_product(m.me, c.ce)
                            / (sqrt(list_dot_product(m.me, m.me))
                               * sqrt(list_dot_product(c.ce, c.ce)))
                            DESC, c.cid DESC
                    ) AS rn
                    FROM m CROSS JOIN c
                ) WHERE rn = 1
            ),
            -- floor-half-up integer micros, never round(): Spark
            -- HALF_UP vs DuckDB's float-multiply round can flip a doc
            -- sitting exactly on the threshold boundary
            hits AS (
                SELECT DISTINCT b.vec_id FROM assign a JOIN assign b
                  ON a.cid = b.cid AND a.vec_id < b.vec_id
                WHERE floor(list_dot_product(a.me, b.me)
                            / (sqrt(list_dot_product(a.me, a.me))
                               * sqrt(list_dot_product(b.me, b.me)))
                            * 1000000.0 + 0.5)
                      >= 350000
            )
            SELECT a.vec_id, CAST(a.cid AS INTEGER) AS cluster_id,
                   CASE WHEN h.vec_id IS NULL THEN 1 ELSE 0 END AS keep
            FROM assign a LEFT JOIN hits h ON a.vec_id = h.vec_id
        """,
        "bigram_lm": rf"""
            WITH t AS (
                SELECT doc_id, source, {_TOKS} AS toks
                FROM documents WHERE text IS NOT NULL
            ),
            big AS (
                SELECT doc_id, source,
                       toks[i+1] AS w1, toks[i+2] AS w2
                FROM t, UNNEST(range(0, len(toks) - 1)) AS u(i)
            ),
            c12 AS (
                SELECT w1, w2, count(*) AS c12 FROM big
                WHERE source = 'src0' GROUP BY w1, w2
            ),
            c1 AS (
                SELECT w1, count(*) AS c1 FROM big
                WHERE source = 'src0' GROUP BY w1
            ),
            v AS (
                SELECT count(DISTINCT tt) AS v
                FROM t, UNNEST(toks) AS u(tt)
                WHERE source = 'src0'
            )
            SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                   CAST(sum(((coalesce(c12.c12, 0) + 1) * 1000000)
                            // (coalesce(c1.c1, 0) + v.v))
                        // count(*) AS BIGINT) AS lm_score_micros
            FROM big b
            LEFT JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
            LEFT JOIN c1 ON b.w1 = c1.w1
            CROSS JOIN v
            GROUP BY b.doc_id
        """,
        # bpe_merges: three merge rounds unrolled as CTEs (argmax pair
        # per round, merged corpus carried forward); each output row
        # pins the learned rule, its frequency, and the applied
        # corpus's token total
        "bpe_merges": rf"""
            WITH t0 AS (
                SELECT {_TOKS} AS t
                FROM documents WHERE text IS NOT NULL
            ),
            {_bpe_round_ctes(3)}
            SELECT 1 AS merge_round, m1.l AS merge_left,
                   m1.r AS merge_right, m1.c AS pair_count,
                   (SELECT CAST(sum(len(t)) AS BIGINT) FROM t1)
                       AS corpus_tokens_after
            FROM m1
            UNION ALL
            SELECT 2, m2.l, m2.r, m2.c,
                   (SELECT CAST(sum(len(t)) AS BIGINT) FROM t2)
            FROM m2
            UNION ALL
            SELECT 3, m3.l, m3.r, m3.c,
                   (SELECT CAST(sum(len(t)) AS BIGINT) FROM t3)
            FROM m3
        """,
        # bpe_encode: the SAME learn chain (carry="doc_id, " threads
        # identity through the merged arrays), then the apply tail —
        # explode t3 to the token stream and rank the closed vocab by
        # (count DESC, token ASC), 0-based.  Binary collation makes
        # the tie order engine-exact (the bpe_merges argmax rule).
        "bpe_encode": rf"""
            WITH t0 AS (
                SELECT doc_id, {_TOKS} AS t
                FROM documents WHERE text IS NOT NULL
            ),
            {_bpe_round_ctes(3, carry="doc_id, ")},
            ex AS (
                SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, t[i] AS token
                FROM t3, UNNEST(range(1, len(t) + 1)) AS u(i)
            ),
            v AS (
                SELECT token, CAST(row_number() OVER (
                           ORDER BY count(*) DESC, token
                       ) - 1 AS INTEGER) AS token_id
                FROM ex GROUP BY token
            )
            SELECT e.doc_id, e.pos, e.token, v.token_id
            FROM ex e JOIN v USING (token)
        """,
        # bpe_subword_encode: character-level learn chain over word
        # TYPES (frequency-weighted pair argmax per round, no
        # separator byte), then the apply tail — encoded types join
        # back onto the (doc, word) stream, per-doc positions by
        # (word pos, symbol pos), ids by (count DESC, token ASC).
        # string_split(w, '') on '' yields [''] in DuckDB but [] in
        # Spark — the CASE aligns the empty-word edge.
        "bpe_subword_encode": rf"""
            WITH wt AS (
                SELECT w, CAST(count(*) AS BIGINT) AS f FROM (
                    SELECT unnest({_TOKS}) AS w
                    FROM documents WHERE text IS NOT NULL
                ) GROUP BY w
            ),
            s0 AS (
                SELECT w, f, list_concat(
                    CASE WHEN w = '' THEN []::VARCHAR[]
                         ELSE string_split(w, '') END,
                    ['</w>']) AS t
                FROM wt
            ),
            {_bpe_sub_round_ctes(3)},
            dw AS (
                SELECT doc_id, CAST(i AS INTEGER) AS wpos, t[i] AS w
                FROM (SELECT doc_id, {_TOKS} AS t
                      FROM documents WHERE text IS NOT NULL) dt,
                     UNNEST(range(1, len(t) + 1)) AS u(i)
            ),
            sub AS (
                SELECT d.doc_id, d.wpos, CAST(j AS INTEGER) AS spos,
                       s.t[j] AS token
                FROM dw d JOIN s3 s USING (w),
                     UNNEST(range(1, len(s.t) + 1)) AS u(j)
            ),
            st AS (
                SELECT doc_id,
                       CAST(row_number() OVER (
                           PARTITION BY doc_id ORDER BY wpos, spos
                       ) - 1 AS INTEGER) AS pos, token
                FROM sub
            ),
            v AS (
                SELECT token, CAST(row_number() OVER (
                           ORDER BY count(*) DESC, token
                       ) - 1 AS INTEGER) AS token_id
                FROM st GROUP BY token
            )
            SELECT s.doc_id, s.pos, s.token, v.token_id
            FROM st s JOIN v USING (token)
        """,
        # bpe_subword_total: same learn chain, vocabulary FROZEN to
        # the top-{_BPE_TOTAL_VOCAB} frequency-ranked symbols, then
        # the byte-fallback expansion — OOV symbols emit hex(UTF-8)
        # byte tokens with ids vocab_size+byte, a word-final OOV
        # symbol re-emits the in-vocab '</w>' marker after its
        # content bytes; global positions by (wpos, spos, byte pos)
        "bpe_subword_total": rf"""
            WITH wt AS (
                SELECT w, CAST(count(*) AS BIGINT) AS f FROM (
                    SELECT unnest({_TOKS}) AS w
                    FROM documents WHERE text IS NOT NULL
                ) GROUP BY w
            ),
            s0 AS (
                SELECT w, f, list_concat(
                    CASE WHEN w = '' THEN []::VARCHAR[]
                         ELSE string_split(w, '') END,
                    ['</w>']) AS t
                FROM wt
            ),
            {_bpe_sub_round_ctes(3)},
            dw AS (
                SELECT doc_id, CAST(i AS INTEGER) AS wpos, t[i] AS w
                FROM (SELECT doc_id, {_TOKS} AS t
                      FROM documents WHERE text IS NOT NULL) dt,
                     UNNEST(range(1, len(t) + 1)) AS u(i)
            ),
            sub AS (
                SELECT d.doc_id, d.wpos, CAST(j AS INTEGER) AS spos,
                       s.t[j] AS token
                FROM dw d JOIN s3 s USING (w),
                     UNNEST(range(1, len(s.t) + 1)) AS u(j)
            ),
            v AS (
                SELECT token, tid FROM (
                    SELECT token, CAST(row_number() OVER (
                               ORDER BY count(*) DESC, token
                           ) - 1 AS INTEGER) AS tid
                    FROM sub GROUP BY token
                ) WHERE tid < {_BPE_TOTAL_VOCAB}
            ),
            subh AS (
                SELECT s.doc_id, s.wpos, s.spos, s.token, v.tid,
                       hex(encode(CASE
                           WHEN s.token <> '</w>'
                                AND ends_with(s.token, '</w>')
                           THEN substr(s.token, 1, length(s.token) - 4)
                           ELSE s.token END)) AS hx
                FROM sub s LEFT JOIN v USING (token)
            ),
            expd AS (
                SELECT doc_id, wpos, spos, CAST(i AS INTEGER) AS bpos,
                       lst[i].token AS token,
                       lst[i].token_id AS token_id,
                       lst[i].is_byte AS is_byte
                FROM (
                    SELECT doc_id, wpos, spos,
                        CASE WHEN tid IS NOT NULL THEN
                            [struct_pack(token := token,
                                         token_id := tid,
                                         is_byte := 0)]
                        ELSE list_concat(
                            list_transform(
                                range(1, CAST(length(hx) / 2 AS INTEGER)
                                         + 1),
                                j -> struct_pack(
                                    token := '<0x' ||
                                        substr(hx, (j - 1) * 2 + 1, 2)
                                        || '>',
                                    token_id := {_BPE_TOTAL_VOCAB} +
                                        CAST(('0x' || substr(
                                            hx, (j - 1) * 2 + 1, 2)
                                        )::BIGINT AS INTEGER),
                                    is_byte := 1)),
                            CASE WHEN ends_with(token, '</w>') THEN
                                [struct_pack(
                                    token := '</w>',
                                    token_id := (SELECT tid FROM v
                                                 WHERE token = '</w>'),
                                    is_byte := 0)]
                            ELSE [] END)
                        END AS lst
                    FROM subh
                ), UNNEST(range(1, len(lst) + 1)) u(i)
            )
            SELECT doc_id,
                   CAST(row_number() OVER (
                       PARTITION BY doc_id ORDER BY wpos, spos, bpos
                   ) - 1 AS INTEGER) AS pos,
                   token,
                   CAST(token_id AS INTEGER) AS token_id,
                   CAST(is_byte AS INTEGER) AS is_byte
            FROM expd
        """,
        # bpe_roundtrip: the tokenizer contract itself — encode under
        # the frozen vocab with byte fallback, decode back; the oracle
        # is the whitespace-normalized ORIGINAL corpus, no replay of
        # the pipeline at all (any wrong symbol/byte/position anywhere
        # hash-mismatches some document)
        "bpe_roundtrip": f"""
            SELECT doc_id,
                   array_to_string({_TOKS}, ' ') AS text_rebuilt
            FROM documents WHERE text IS NOT NULL
        """,
        # lang_id: re-derive all four per-language floor-mean scores
        # via ONE explode + wide weight-table join (deliberately
        # different plan shape from the in-scan literal folds), then
        # the same argmax/tie discipline: CASE in sorted-language
        # order, first class equal to the greatest wins.  Weights
        # interpolated from the same _langid_gate_weights literals.
        # NOTE: this oracle's inner feature join would DROP a doc
        # whose feature list is empty, while the operator keeps such
        # rows with NULL lang (totality) — unreachable today only
        # because tokens('') returns [''] so every non-NULL-text doc
        # has >= 1 feature; if tokenization ever changes, add the
        # LEFT JOIN back onto the doc set (the lang_id_joined oracle
        # below does exactly that).
        "lang_id": f"""
            WITH toks AS (
                SELECT doc_id, {_TOKS} AS t
                FROM documents WHERE text IS NOT NULL
            ),
            feats AS (
                SELECT doc_id, unnest(list_concat(
                    t, list_transform(range(1, len(t)),
                                      i -> t[i] || ' ' || t[i + 1])
                )) AS f
                FROM toks
            ),
            fb AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5('langid:v1' || f), 1, 7))
                            ::BIGINT % 256 AS INTEGER) AS b
                FROM feats
            ),
            w AS (
                SELECT CAST(unnest(range(0, 256)) AS INTEGER) AS b,
                       {", ".join(
                           "unnest(["
                           + ",".join(str(w) for w in _langid_gate_weights(lg))
                           + f"]) AS w{i}"
                           for i, lg in enumerate(_LANGID_GATE_LANGS)
                       )}
            ),
            agg AS (
                SELECT fb.doc_id,
                       count(*) AS n,
                       {", ".join(
                           f"CAST(sum(w{i}) AS BIGINT) // count(*) AS s{i}"
                           for i in range(len(_LANGID_GATE_LANGS))
                       )}
                FROM fb JOIN w USING (b)
                GROUP BY fb.doc_id
            )
            SELECT doc_id,
                   CAST(n AS INTEGER) AS n_feats,
                   CASE {" ".join(
                       f"WHEN s{i} = greatest(s0, s1, s2, s3) THEN '{lg}'"
                       for i, lg in enumerate(_LANGID_GATE_LANGS)
                   )} END AS lang,
                   CAST(greatest(s0, s1, s2, s3) AS BIGINT)
                       AS score_micros
            FROM agg
        """,
        # lang_id_joined: the PRODUCTION broadcast-LUT branch (4 x 512
        # buckets crosses the literal cap).  Same explode + wide
        # weight-join + argmax/tie chain as lang_id at 512 buckets,
        # but LEFT-JOINed back onto the non-NULL-text doc set so the
        # operator's NULL-lang totality path (empty feature array ->
        # n_feats 0, NULL scores, NULL lang) is oracled rather than
        # relying on tokens('') == [''] (r9 advice).
        "lang_id_joined": f"""
            WITH toks AS (
                SELECT doc_id, {_TOKS} AS t
                FROM documents WHERE text IS NOT NULL
            ),
            feats AS (
                SELECT doc_id, unnest(list_concat(
                    t, list_transform(range(1, len(t)),
                                      i -> t[i] || ' ' || t[i + 1])
                )) AS f
                FROM toks
            ),
            fb AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5('langid:v1' || f), 1, 7))
                            ::BIGINT % 512 AS INTEGER) AS b
                FROM feats
            ),
            w AS (
                SELECT CAST(unnest(range(0, 512)) AS INTEGER) AS b,
                       {", ".join(
                           "unnest(["
                           + ",".join(
                               str(w)
                               for w in _langid_gate_weights(lg, 512)
                           )
                           + f"]) AS w{i}"
                           for i, lg in enumerate(_LANGID_GATE_LANGS)
                       )}
            ),
            agg AS (
                SELECT fb.doc_id,
                       count(*) AS n,
                       {", ".join(
                           f"CAST(sum(w{i}) AS BIGINT) // count(*) AS s{i}"
                           for i in range(len(_LANGID_GATE_LANGS))
                       )}
                FROM fb JOIN w USING (b)
                GROUP BY fb.doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(agg.n, 0) AS INTEGER) AS n_feats,
                   CASE {" ".join(
                       f"WHEN s{i} = greatest(s0, s1, s2, s3) THEN '{lg}'"
                       for i, lg in enumerate(_LANGID_GATE_LANGS)
                   )} END AS lang,
                   CAST(greatest(s0, s1, s2, s3) AS BIGINT)
                       AS score_micros
            FROM (SELECT doc_id FROM documents
                  WHERE text IS NOT NULL) d
            LEFT JOIN agg USING (doc_id)
        """,
        # normalize_text: the whole fold chain re-generated for DuckDB
        # from the SAME tables the Spark expression is built from
        # (operators.text.NORMALIZE_CHAR_FOLDS / NORMALIZE_EXPANSIONS
        # via _normalize_sql) — translate/replace/lower/regexp are
        # character-identical across the engines, so any drift in the
        # fold tables or stage order hash-mismatches every row
        "normalize_text": f"""
            WITH n AS (
                SELECT doc_id,
                       {_normalize_sql(
                           _sql_str(_NORM_NOISE_PREFIX)
                           + " || text || "
                           + _sql_str(_NORM_NOISE_SUFFIX)
                       )} AS text_norm
                FROM documents WHERE text IS NOT NULL
            )
            SELECT doc_id,
                   text_norm,
                   CAST(len(string_split_regex(trim(text_norm), '\\s+'))
                        AS INTEGER) AS n_tokens
            FROM n
        """,
        # quality_classifier: re-derive the in-scan dot product as
        # explode + weight-table join (same exact BIGINT sum, a
        # deliberately different plan shape); weights interpolated
        # from the same _qcls_gate_weights literal as the Spark side
        "quality_classifier": f"""
            WITH toks AS (
                SELECT doc_id, {_TOKS} AS t
                FROM documents WHERE text IS NOT NULL
            ),
            feats AS (
                SELECT doc_id, unnest(list_concat(
                    t, list_transform(range(1, len(t)),
                                      i -> t[i] || ' ' || t[i + 1])
                )) AS f
                FROM toks
            ),
            fb AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5('qcls:v1' || f), 1, 7))
                            ::BIGINT % 256 AS INTEGER) AS b
                FROM feats
            ),
            w AS (
                SELECT CAST(unnest(range(0, 256)) AS INTEGER) AS b,
                       unnest([{",".join(str(w) for w in _qcls_gate_weights())}]) AS wt
            )
            SELECT fb.doc_id,
                   CAST(count(*) AS INTEGER) AS n_feats,
                   CAST(CAST(sum(wt) AS BIGINT) // count(*) AS BIGINT)
                       AS score_micros,
                   CAST(CASE WHEN CAST(sum(wt) AS BIGINT) // count(*)
                                  >= 500000
                             THEN 1 ELSE 0 END AS INTEGER) AS keep
            FROM fb JOIN w USING (b)
            GROUP BY fb.doc_id
        """,
        # cluster_balanced_sample: the IVFPQ "assign" recipe (integer
        # squared-L2 argmin via the dot identity, ties lowest cid)
        # then an md5-ranked exact quota of 25 per cluster — membership
        # pinned, not just counts
        "cluster_balanced_sample": """
            WITH mq AS (
                SELECT vec_id, list_transform(embedding::DOUBLE[],
                           x -> floor(x * 1000000.0 + 0.5)) AS me
                FROM embeddings
            ),
            cc AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                       me AS ce
                FROM (SELECT * FROM mq ORDER BY vec_id LIMIT 8)
            ),
            assign AS (
                SELECT vec_id, cid FROM (
                    SELECT m.vec_id, c.cid, row_number() OVER (
                        PARTITION BY m.vec_id ORDER BY
                            list_dot_product(c.ce, c.ce)
                            - 2 * list_dot_product(m.me, c.ce) ASC,
                            c.cid ASC
                    ) AS rn
                    FROM mq m CROSS JOIN cc c
                ) WHERE rn = 1
            ),
            ranked AS (
                SELECT vec_id, cid, row_number() OVER (
                    PARTITION BY cid
                    ORDER BY md5('cbal:v1' || CAST(vec_id AS VARCHAR)),
                             vec_id
                ) AS r
                FROM assign
            )
            SELECT vec_id, CAST(cid AS INTEGER) AS cluster_id
            FROM ranked WHERE r <= 25
        """,
        # domain_rollup: same md5-synthesized URLs, host regex, and
        # public-suffix semantics (longest proper-suffix rule via a
        # rules join + length-ranked window; bare-suffix -> NULL;
        # last-two-labels fallback), then the per-domain accounting
        "domain_rollup": f"""
            WITH {_URL_DOM_CTES}
            SELECT domain,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
                   CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens,
                   CAST(CASE WHEN domain IN ('site7.com', 'site13.co.uk')
                             THEN 1 ELSE 0 END AS INTEGER) AS blocked
            FROM dom GROUP BY domain
        """,
        # domain_capped_sample: same chain, then the enforcement —
        # per-(registered domain, else host) deterministic hash rank,
        # first cap kept; membership (the doc_id set) is the check
        "domain_capped_sample": f"""
            WITH {_URL_DOM_CTES},
            grp AS (
                SELECT doc_id, coalesce(domain, host) AS g
                FROM dom WHERE host IS NOT NULL
            ),
            ranked AS (
                SELECT doc_id, g, row_number() OVER (
                           PARTITION BY g
                           ORDER BY md5('domcap:v1' || doc_id::VARCHAR),
                                    doc_id
                       ) AS rn
                FROM grp
            )
            SELECT doc_id, g AS domain_key FROM ranked WHERE rn <= 2
        """,
        # blocklist_filter_df: same chain, DataFrame-blocklist form —
        # the kept set is an ANTI JOIN on the registered domain
        # (unresolved rows drop, the conservative default)
        "blocklist_filter_df": f"""
            WITH {_URL_DOM_CTES}
            SELECT d.doc_id
            FROM dom d
            WHERE d.domain IS NOT NULL
              AND d.domain NOT IN ('site7.com', 'site13.co.uk',
                                   'site21.github.io')
        """,
        # bm25_search: log-free Okapi BM25 (RSJ idf argument without
        # the ln — the tfidf_terms exactness recipe).  Every double
        # expression below keeps the Spark side's exact
        # parenthesization (same exact-integer inputs -> same
        # correctly-rounded bits), and per-term contributions floor
        # to integer micros BEFORE the per-doc sum so score_micros is
        # an order-independent BIGINT.  Constants: k1=1.2, b=0.75 ->
        # C_num=2200 (=1000*(k1+1)), C_lin=300 (=1000*k1*(1-b)),
        # C_quad=900 (=1000*k1*b).  The query VALUES interpolate from
        # _BM25_GATE_QUERIES so the two sides can never drift.
        "bm25_search": f"""
            WITH dt AS (
                SELECT doc_id,
                       string_split_regex(trim(lower(text)), '\\s+') AS toks
                FROM documents
            ),
            stats AS (
                SELECT CAST(count(*) AS DOUBLE) AS nd,
                       CAST(SUM(len(toks)) AS DOUBLE) AS td
                FROM dt
            ),
            qt(query_id, term) AS (VALUES {", ".join(
                f"('{q}', '{t}')" for q, t in _BM25_GATE_QUERIES
            )}),
            posts AS (
                SELECT doc_id, len(toks) AS dl, unnest(toks) AS term
                FROM dt
            ),
            tf AS (
                SELECT doc_id, term,
                       CAST(count(*) AS BIGINT) AS tf,
                       max(dl) AS dl
                FROM posts
                WHERE term IN (SELECT DISTINCT term FROM qt)
                GROUP BY doc_id, term
            ),
            dfreq AS (
                SELECT term, CAST(count(*) AS DOUBLE) AS dfd
                FROM tf GROUP BY term
            ),
            contrib AS (
                SELECT q.query_id, t.doc_id,
                    CAST(FLOOR(
                        (((((2.0 * s.nd) - (2.0 * d.dfd) + 1.0)
                           / ((2.0 * d.dfd) + 1.0))
                          * (((CAST(t.tf AS DOUBLE) * 2200.0) * s.td)
                             / (((1000.0 * s.td) * CAST(t.tf AS DOUBLE))
                                + (300.0 * s.td)
                                + ((900.0 * CAST(t.dl AS DOUBLE)) * s.nd))))
                         * 1000000.0) + 0.5
                    ) AS BIGINT) AS c
                FROM tf t
                JOIN qt q USING (term)
                JOIN dfreq d USING (term)
                CROSS JOIN stats s
            ),
            scored AS (
                SELECT query_id, doc_id,
                       CAST(SUM(c) AS BIGINT) AS score_micros
                FROM contrib GROUP BY query_id, doc_id
            ),
            ranked AS (
                SELECT query_id, doc_id, score_micros,
                       CAST(row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY score_micros DESC, doc_id
                       ) AS INTEGER) AS rnk
                FROM scored
            )
            SELECT query_id, doc_id, score_micros, rnk
            FROM ranked WHERE rnk <= 10
        """,
        # line_dedup: C4-style repeated-line removal with rewrite.
        # Lines = non-overlapping 5-token chunks (the gate synthesis;
        # Spark transform/sequence/slice == DuckDB list_transform/
        # range/list_slice with identical 1-based inclusive clamped
        # bounds).  Keep rule re-derived via windows (count over line,
        # row_number by (doc_id, pos)) — the Spark side aggregates
        # (count, min(struct)) instead; same values.  Every doc comes
        # back (LEFT JOIN; all-lines-cut docs get '' / 0).
        "line_dedup": """
            WITH dt AS (
                SELECT doc_id,
                       string_split_regex(trim(text), '\\s+') AS toks
                FROM documents
            ),
            ln AS (
                SELECT doc_id, CAST(i AS INT) AS pos,
                       array_to_string(
                           list_slice(toks, i*5 + 1, i*5 + 5), ' '
                       ) AS line
                FROM dt,
                     UNNEST(range(0, CAST(ceil(len(toks) / 5.0) AS BIGINT)))
                         AS u(i)
            ),
            mk AS (
                SELECT doc_id, pos, line,
                       count(*) OVER (PARTITION BY line) AS cnt,
                       row_number() OVER (
                           PARTITION BY line ORDER BY doc_id, pos
                       ) AS rn
                FROM ln
            ),
            kept AS (
                SELECT doc_id, pos, line FROM mk
                WHERE cnt < 2 OR rn = 1
            ),
            re AS (
                SELECT doc_id,
                       string_agg(line, ' ' ORDER BY pos) AS text_clean,
                       CAST(count(*) AS BIGINT) AS n_kept
                FROM kept GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(re.text_clean, '') AS text_clean,
                   CAST(ceil(len(d.toks) / 5.0) AS INT) AS n_lines,
                   CAST(COALESCE(re.n_kept, 0) AS BIGINT) AS n_kept
            FROM dt d LEFT JOIN re USING (doc_id)
        """,
        # substring_rewrite: the ExactSubstr ACTION.  Keep rule
        # (count >= 2 occurrences, keeper = first (doc_id, pos))
        # re-derived via windows over the LITERAL gram strings (the
        # Spark side windows over md5 hashes — the dup_spans oracle
        # precedent); cut token positions are each non-keeper
        # occurrence's k-token interval, DISTINCT; rebuild via an
        # order-preserving string_agg that skips cut tokens (string_agg
        # ignores NULL inputs).  Every doc has >= 1 token (split of ''
        # is ['']) so the GROUP BY is total.
        "substring_rewrite": """
            WITH dt AS (
                SELECT doc_id,
                       string_split_regex(trim(text), '\\s+') AS toks
                FROM documents
            ),
            gr AS (
                SELECT doc_id, CAST(i AS INT) AS pos,
                       array_to_string(
                           list_slice(toks, i + 1, i + 8), ' '
                       ) AS gram
                FROM dt,
                     UNNEST(range(0,
                         CAST(greatest(len(toks) - 7, 0) AS BIGINT)))
                         AS u(i)
            ),
            mk AS (
                SELECT doc_id, pos,
                       count(*) OVER (PARTITION BY gram) AS cnt,
                       row_number() OVER (
                           PARTITION BY gram ORDER BY doc_id, pos
                       ) AS rn
                FROM gr
            ),
            cut AS (
                SELECT DISTINCT doc_id, CAST(pos + j AS INT) AS tpos
                FROM mk, UNNEST(range(0, 8)) AS u(j)
                WHERE cnt >= 2 AND rn > 1
            ),
            tk AS (
                SELECT doc_id, CAST(i - 1 AS INT) AS tpos, toks[i] AS tok
                FROM dt,
                     UNNEST(range(1, CAST(len(toks) + 1 AS BIGINT)))
                         AS u(i)
            )
            SELECT t.doc_id,
                   COALESCE(string_agg(
                       CASE WHEN c.tpos IS NULL THEN t.tok END,
                       ' ' ORDER BY t.tpos
                   ), '') AS text_clean,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN c.tpos IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_kept
            FROM tk t
            LEFT JOIN cut c
              ON t.doc_id = c.doc_id AND t.tpos = c.tpos
            GROUP BY t.doc_id
        """,
        "pq_codes": """
            WITH mq AS (
                SELECT vec_id, list_transform(embedding::DOUBLE[],
                           x -> floor(x * 1000000.0 + 0.5)) AS me
                FROM embeddings
            ),
            cb AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code,
                       me AS ce
                FROM (SELECT * FROM mq ORDER BY vec_id LIMIT 16)
            ),
            subs AS (
                SELECT vec_id, j, list_slice(me, j*8 + 1, j*8 + 8) AS sv
                FROM mq, UNNEST(range(0, 8)) AS u(j)
            ),
            csubs AS (
                SELECT code, j, list_slice(ce, j*8 + 1, j*8 + 8) AS cv
                FROM cb, UNNEST(range(0, 8)) AS u(j)
            )
            -- pq_encode mirror: argmin squared L2, ties -> LOWEST code
            -- (array_min over (dist, code) structs); the dot-identity
            -- form equals Spark's zip_with sum-of-squares exactly
            -- because every intermediate is an integer < 2^53
            SELECT vec_id, CAST(j AS INTEGER) AS subspace, code FROM (
                SELECT s.vec_id, s.j, CAST(c.code AS INTEGER) AS code,
                       row_number() OVER (
                           PARTITION BY s.vec_id, s.j ORDER BY
                               list_dot_product(s.sv, s.sv)
                               - 2 * list_dot_product(s.sv, c.cv)
                               + list_dot_product(c.cv, c.cv) ASC,
                               c.code ASC
                       ) AS rn
                FROM subs s JOIN csubs c ON s.j = c.j
            ) WHERE rn = 1
        """,
        "pq_topk_adc": """
            WITH mq AS (
                SELECT vec_id, list_transform(embedding::DOUBLE[],
                           x -> floor(x * 1000000.0 + 0.5)) AS me
                FROM embeddings
            ),
            cb AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code,
                       me AS ce
                FROM (SELECT * FROM mq ORDER BY vec_id LIMIT 16)
            ),
            subs AS (
                SELECT vec_id, j, list_slice(me, j*8 + 1, j*8 + 8) AS sv
                FROM mq, UNNEST(range(0, 8)) AS u(j)
            ),
            csubs AS (
                SELECT code, j, list_slice(ce, j*8 + 1, j*8 + 8) AS cv
                FROM cb, UNNEST(range(0, 8)) AS u(j)
            ),
            enc AS (
                SELECT vec_id, j, code FROM (
                    SELECT s.vec_id, s.j, c.code, row_number() OVER (
                        PARTITION BY s.vec_id, s.j ORDER BY
                            list_dot_product(s.sv, s.sv)
                            - 2 * list_dot_product(s.sv, c.cv)
                            + list_dot_product(c.cv, c.cv) ASC,
                            c.code ASC
                    ) AS rn
                    FROM subs s JOIN csubs c ON s.j = c.j
                ) WHERE rn = 1
            ),
            q AS (
                SELECT vec_id AS qid, j, sv AS qv FROM subs
                WHERE vec_id < 5
            ),
            lut AS (
                SELECT q.qid, c.j, c.code,
                       list_dot_product(q.qv, q.qv)
                       - 2 * list_dot_product(q.qv, c.cv)
                       + list_dot_product(c.cv, c.cv) AS d2
                FROM q JOIN csubs c ON q.j = c.j
            ),
            adc AS (
                SELECT l.qid, e.vec_id, CAST(sum(l.d2) AS BIGINT) AS adc_dist
                FROM enc e JOIN lut l ON l.j = e.j AND l.code = e.code
                GROUP BY l.qid, e.vec_id
            )
            SELECT qid, vec_id, adc_dist FROM (
                SELECT qid, vec_id, adc_dist, row_number() OVER (
                    PARTITION BY qid ORDER BY adc_dist ASC, vec_id ASC
                ) AS rn
                FROM adc
            ) WHERE rn <= 10
        """,
        "pq_recall": """
            WITH mq AS (
                SELECT vec_id, list_transform(embedding::DOUBLE[],
                           x -> floor(x * 1000000.0 + 0.5)) AS me
                FROM embeddings
            ),
            cb AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code,
                       me AS ce
                FROM (SELECT * FROM mq ORDER BY vec_id LIMIT 16)
            ),
            subs AS (
                SELECT vec_id, j, list_slice(me, j*8 + 1, j*8 + 8) AS sv
                FROM mq, UNNEST(range(0, 8)) AS u(j)
            ),
            csubs AS (
                SELECT code, j, list_slice(ce, j*8 + 1, j*8 + 8) AS cv
                FROM cb, UNNEST(range(0, 8)) AS u(j)
            ),
            enc AS (
                SELECT vec_id, j, code FROM (
                    SELECT s.vec_id, s.j, c.code, row_number() OVER (
                        PARTITION BY s.vec_id, s.j ORDER BY
                            list_dot_product(s.sv, s.sv)
                            - 2 * list_dot_product(s.sv, c.cv)
                            + list_dot_product(c.cv, c.cv) ASC,
                            c.code ASC
                    ) AS rn
                    FROM subs s JOIN csubs c ON s.j = c.j
                ) WHERE rn = 1
            ),
            qs AS (
                SELECT vec_id AS qid, j, sv AS qv FROM subs
                WHERE vec_id < 5
            ),
            qfull AS (SELECT vec_id AS qid, me AS qe FROM mq WHERE vec_id < 5),
            lut AS (
                SELECT q.qid, c.j, c.code,
                       list_dot_product(q.qv, q.qv)
                       - 2 * list_dot_product(q.qv, c.cv)
                       + list_dot_product(c.cv, c.cv) AS d2
                FROM qs q JOIN csubs c ON q.j = c.j
            ),
            adc AS (
                SELECT qid, vec_id FROM (
                    SELECT l.qid, e.vec_id, row_number() OVER (
                        PARTITION BY l.qid
                        ORDER BY sum(l.d2) ASC, e.vec_id ASC
                    ) AS rn
                    FROM enc e JOIN lut l ON l.j = e.j AND l.code = e.code
                    GROUP BY l.qid, e.vec_id
                ) WHERE rn <= 10
            ),
            -- exact squared-L2 top-10: the fair ground truth (PQ
            -- approximates L2, not cosine)
            bf AS (
                SELECT qid, vec_id FROM (
                    SELECT q.qid, e.vec_id, row_number() OVER (
                        PARTITION BY q.qid ORDER BY
                            list_dot_product(e.me, e.me)
                            - 2 * list_dot_product(e.me, q.qe)
                            + list_dot_product(q.qe, q.qe) ASC,
                            e.vec_id ASC
                    ) AS rn
                    FROM qfull q CROSS JOIN mq e
                ) WHERE rn <= 10
            ),
            h AS (
                SELECT count(*) AS n_hits
                FROM adc JOIN bf USING (qid, vec_id)
            )
            SELECT (SELECT count(DISTINCT qid) FROM qfull) AS n_queries,
                   h.n_hits,
                   (h.n_hits * 1000000)
                       // ((SELECT count(DISTINCT qid) FROM qfull) * 10)
                       AS recall_micros
            FROM h
        """,
        "dup_graph_pagerank": rf"""
            WITH {_SHINGLE_CTES},
            sig AS (
                SELECT doc_id,
                   {_MINHASH_AGGS}
                FROM sh GROUP BY doc_id
            ),
            bands AS (
            {_BAND_SELECTS}
            ),
            pairs AS (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.bucket = b.bucket
                 AND a.doc_id < b.doc_id
            ),
            sym AS (
                SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION
                SELECT doc_b, doc_a FROM pairs
            ),
            deg AS (SELECT a, count(*) AS dg FROM sym GROUP BY a),
            pr0 AS (SELECT a AS v, CAST(1000000 AS BIGINT) AS pr FROM deg),
            {_PR_CTES}
            SELECT v AS doc_id, pr AS pr_micros FROM pr3
        """,
        "ivfpq_topk": _IVFPQ_CTES + """
            SELECT qid, vec_id, adc_dist FROM (
                SELECT qid, vec_id, adc_dist, row_number() OVER (
                    PARTITION BY qid ORDER BY adc_dist ASC, vec_id ASC
                ) AS rn
                FROM adc
            ) WHERE rn <= 10
        """,
        "ivfpq_recall": _IVFPQ_CTES + """
            , ivfpq AS (
                SELECT qid, vec_id FROM (
                    SELECT qid, vec_id, row_number() OVER (
                        PARTITION BY qid ORDER BY adc_dist ASC, vec_id ASC
                    ) AS rn
                    FROM adc
                ) WHERE rn <= 10
            ),
            -- exact squared-L2 top-10: the fair ground truth (PQ
            -- approximates L2, not cosine)
            qfull AS (SELECT vec_id AS qid, me AS qe FROM mq WHERE vec_id < 5),
            bf AS (
                SELECT qid, vec_id FROM (
                    SELECT qf.qid, e.vec_id, row_number() OVER (
                        PARTITION BY qf.qid ORDER BY
                            list_dot_product(e.me, e.me)
                            - 2 * list_dot_product(e.me, qf.qe)
                            + list_dot_product(qf.qe, qf.qe) ASC,
                            e.vec_id ASC
                    ) AS rn
                    FROM qfull qf CROSS JOIN mq e
                ) WHERE rn <= 10
            ),
            h AS (
                SELECT count(*) AS n_hits
                FROM ivfpq JOIN bf USING (qid, vec_id)
            )
            SELECT (SELECT count(DISTINCT qid) FROM qfull) AS n_queries,
                   h.n_hits,
                   (h.n_hits * 1000000)
                       // ((SELECT count(DISTINCT qid) FROM qfull) * 10)
                       AS recall_micros
            FROM h
        """,
        # nn_confusion_ivfpq: the shared IVF-PQ chain at n_queries=16,
        # then the confusion tail — best NON-SELF candidate per query
        # by (adc_dist, vec_id), label pairs rolled up.  (Spark takes
        # k=2 then excludes self; at most one self row exists per
        # query, so rank-1-of-non-self over all candidates is the
        # identical set.)
        "nn_confusion_ivfpq": _ivfpq_ctes(16) + _NN_CONFUSION_TAIL,
        # nn_confusion_ivfpq_stored: the STORED-index production shape
        # must be search-equivalent to the in-scan form, so it shares
        # the oracle VERBATIM — any divergence between the two Spark
        # paths (or either path and the chain) fails rows+hash
        "nn_confusion_ivfpq_stored": _ivfpq_ctes(16) + _NN_CONFUSION_TAIL,
        # streaming_ivfpq_index: encode is row-local, so the streamed
        # + compacted index searches identically to the one-shot
        # batch index — same oracle verbatim (the streaming_pq_index
        # rationale, stored-layout edition)
        "streaming_ivfpq_index": _ivfpq_ctes(16) + _NN_CONFUSION_TAIL,
        "incremental_neardup": rf"""
            WITH toks AS (
                SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS batch,
                       {_TOKS} AS t
                FROM documents WHERE text IS NOT NULL
            ),
            sh AS (
                SELECT DISTINCT doc_id,
                       t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
                FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
            ),
            sig AS (
                SELECT doc_id,
                   {_MINHASH_AGGS}
                FROM sh GROUP BY doc_id
            ),
            bands AS (
            {_BAND_SELECTS}
            ),
            bb AS (
                SELECT bands.*, CAST(doc_id % 3 AS INTEGER) AS batch
                FROM bands
            ),
            hit0 AS (
                SELECT DISTINCT a.doc_id FROM bb a JOIN bb c
                  ON c.band = a.band AND c.bucket = a.bucket
                 AND c.doc_id < a.doc_id
                WHERE a.batch = 0 AND c.batch = 0
            ),
            acc0 AS (
                SELECT doc_id FROM toks WHERE batch = 0
                  AND doc_id NOT IN (SELECT doc_id FROM hit0)
            ),
            idx1 AS (
                SELECT DISTINCT band, bucket FROM bb
                JOIN acc0 USING (doc_id)
            ),
            hit1 AS (
                SELECT DISTINCT a.doc_id FROM bb a
                WHERE a.batch = 1 AND (
                    EXISTS (SELECT 1 FROM idx1 i
                            WHERE i.band = a.band AND i.bucket = a.bucket)
                    OR EXISTS (SELECT 1 FROM bb c
                               WHERE c.batch = 1 AND c.band = a.band
                                 AND c.bucket = a.bucket
                                 AND c.doc_id < a.doc_id))
            ),
            acc1 AS (
                SELECT doc_id FROM toks WHERE batch = 1
                  AND doc_id NOT IN (SELECT doc_id FROM hit1)
            ),
            idx2 AS (
                SELECT band, bucket FROM idx1
                UNION
                SELECT band, bucket FROM bb JOIN acc1 USING (doc_id)
            ),
            hit2 AS (
                SELECT DISTINCT a.doc_id FROM bb a
                WHERE a.batch = 2 AND (
                    EXISTS (SELECT 1 FROM idx2 i
                            WHERE i.band = a.band AND i.bucket = a.bucket)
                    OR EXISTS (SELECT 1 FROM bb c
                               WHERE c.batch = 2 AND c.band = a.band
                                 AND c.bucket = a.bucket
                                 AND c.doc_id < a.doc_id))
            ),
            acc2 AS (
                SELECT doc_id FROM toks WHERE batch = 2
                  AND doc_id NOT IN (SELECT doc_id FROM hit2)
            )
            SELECT doc_id, CAST(0 AS INTEGER) AS batch FROM acc0
            UNION ALL
            SELECT doc_id, CAST(1 AS INTEGER) AS batch FROM acc1
            UNION ALL
            SELECT doc_id, CAST(2 AS INTEGER) AS batch FROM acc2
        """,
        "target_affinity": rf"""
            WITH t AS (
                SELECT doc_id, source, {_TOKS} AS toks FROM documents
            ),
            feats AS (
                SELECT doc_id, source,
                       ('0x' || substr(md5('dsir:v1' || feat), 1, 7))::BIGINT
                           % 1024 AS b
                FROM (
                    SELECT doc_id, source, t FROM t, UNNEST(toks) AS u(t)
                    UNION ALL
                    SELECT doc_id, source, toks[i+1] || ' ' || toks[i+2]
                    FROM t, UNNEST(range(0, len(toks) - 1)) AS u(i)
                ) f(doc_id, source, feat)
            ),
            craw AS (SELECT b, count(*) AS c FROM feats GROUP BY b),
            ctgt AS (
                SELECT b, count(*) AS c FROM feats
                WHERE source = 'src0' GROUP BY b
            ),
            w AS (
                SELECT craw.b,
                       (coalesce(ctgt.c, 0) * 1000000) // craw.c AS w
                FROM craw LEFT JOIN ctgt ON craw.b = ctgt.b
            )
            SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
                   CAST(sum(w.w) // count(*) AS BIGINT) AS affinity_micros
            FROM feats f JOIN w ON f.b = w.b
            GROUP BY f.doc_id
        """,
        "substring_dup_spans": rf"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            base AS (
                SELECT doc_id,
                       CAST(len(toks) AS BIGINT) AS n_tokens,
                       CAST(greatest(len(toks) - 7, 0) AS BIGINT) AS n_grams,
                       toks
                FROM t
            ),
            g AS (
                SELECT doc_id, i AS pos,
                       md5(array_to_string(toks[(i+1):(i+8)], ' ')) AS gh
                FROM base, UNNEST(range(0, n_grams)) AS u(i)
            ),
            shared AS (
                SELECT gh FROM g GROUP BY gh
                HAVING count(DISTINCT doc_id) >= 2
            ),
            -- interval union of [pos, pos+7]: consecutive dup positions
            -- < 8 apart overlap, so each contributes min(8, next - pos)
            dp AS (
                SELECT doc_id, pos,
                       least(8, coalesce(lead(pos) OVER (
                           PARTITION BY doc_id ORDER BY pos) - pos, 8)) AS span
                FROM g WHERE gh IN (SELECT gh FROM shared)
            ),
            d AS (
                SELECT doc_id, count(*) AS dup_grams,
                       sum(span) AS covered
                FROM dp GROUP BY doc_id
            )
            SELECT b.doc_id, b.n_tokens, b.n_grams,
                   CAST(coalesce(d.dup_grams, 0) AS BIGINT) AS dup_grams,
                   CAST(coalesce(d.covered, 0) AS BIGINT) AS covered_tokens,
                   CAST(CASE WHEN b.n_tokens > 0
                        THEN floor(coalesce(d.covered, 0)::DOUBLE
                                   / b.n_tokens::DOUBLE * 1000000.0 + 0.5)
                        ELSE 0 END AS BIGINT) AS dup_cover_micros
            FROM base b LEFT JOIN d ON b.doc_id = d.doc_id
        """,
        "dedup_keep_best": rf"""
            WITH RECURSIVE {_SHINGLE_CTES},
            sig AS (
                SELECT doc_id,
                   {_MINHASH_AGGS}
                FROM sh GROUP BY doc_id
            ),
            bands AS (
            {_BAND_SELECTS}
            ),
            pairs AS (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.bucket = b.bucket
                 AND a.doc_id < b.doc_id
            ),
            sym AS (
                SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION
                SELECT doc_b, doc_a FROM pairs
            ),
            reach(v, r) AS (
                SELECT a, b FROM sym
                UNION
                SELECT reach.v, sym.b FROM reach JOIN sym ON reach.r = sym.a
            ),
            cc AS (
                SELECT v AS doc_id, least(v, min(r)) AS cluster_id
                FROM reach GROUP BY v
            ),
            q AS (
                SELECT doc_id, floor((
                    0.4::DOUBLE * least(len(t)::DOUBLE / 100.0::DOUBLE, 1.0::DOUBLE)
                  + 0.3::DOUBLE * (len(list_distinct(t))::DOUBLE / len(t)::DOUBLE)
                  + 0.3::DOUBLE * (1.0::DOUBLE
                        - len(list_filter(t, x -> x IN {_STOP_SQL}))::DOUBLE
                          / len(t)::DOUBLE)
                  ) * 10000.0 + 0.5) / 10000.0 AS quality
                FROM toks
            ),
            j AS (
                SELECT cc.cluster_id, cc.doc_id, q.quality
                FROM cc JOIN q ON cc.doc_id = q.doc_id
            ),
            r AS (
                SELECT *, row_number() OVER (
                    PARTITION BY cluster_id ORDER BY quality DESC, doc_id
                ) AS rn FROM j
            ),
            s AS (SELECT cluster_id, count(*) AS n_members FROM j GROUP BY cluster_id)
            SELECT r.cluster_id, r.doc_id AS keep_id, r.quality AS keep_score,
                   s.n_members, s.n_members - 1 AS n_dropped
            FROM r JOIN s ON r.cluster_id = s.cluster_id
            WHERE r.rn = 1
        """,
        "drift_report": rf"""
            WITH b AS (
                SELECT CAST((epoch_us(min({_TS})) + epoch_us(max({_TS}))) // 2 AS BIGINT) AS mid
                FROM events
            ),
            binned AS (
                SELECT greatest(least(CAST(floor(value / 50.0) AS INTEGER), 9), 0) AS bin,
                       epoch_us({_TS}) < (SELECT mid FROM b) AS is_ref
                FROM events
            ),
            c AS (
                SELECT bin,
                       CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
                       CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
                FROM binned GROUP BY bin
            ),
            tot AS (
                SELECT CAST(sum(n_ref) AS BIGINT) AS tr,
                       CAST(sum(n_cur) AS BIGINT) AS tc FROM c
            ),
            m AS (
                SELECT bin, n_ref, n_cur,
                       CAST(floor(n_ref::DOUBLE / greatest(tr, 1)::DOUBLE
                                  * 1000000.0 + 0.5) AS BIGINT) AS rm,
                       CAST(floor(n_cur::DOUBLE / greatest(tc, 1)::DOUBLE
                                  * 1000000.0 + 0.5) AS BIGINT) AS cm
                FROM c, tot
            )
            SELECT bin, n_ref, n_cur,
                   rm / 1000000.0 AS rate_ref,
                   cm / 1000000.0 AS rate_cur,
                   abs(rm - cm) / 1000000.0 AS rate_abs_diff
            FROM m
        """,
        "equi_depth_bins": rf"""
            WITH t AS (
                SELECT value, event_id,
                       ntile(10) OVER (ORDER BY value, event_id) AS bin
                FROM events
            )
            SELECT CAST(bin AS INTEGER) AS bin,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   min(value) AS min_value,
                   max(value) AS max_value,
                   CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
                       AS value_sum_micros
            FROM t GROUP BY bin
        """,
        "flagship": f"""
            WITH deduped AS (SELECT DISTINCT * FROM events),
            clean AS (
                SELECT * FROM deduped
                WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
            ),
            banded AS (SELECT event_type, {_AQI_CASE} AS band, value FROM clean)
            SELECT event_type, band,
                   round(sum(value::DECIMAL(20,6))::DOUBLE / count(*), 2)
                       AS avg_value,
                   round(min(value), 2) AS min_value,
                   round(max(value), 2) AS max_value,
                   count(*) AS record_count
            FROM banded GROUP BY event_type, band
        """,
        "grouped_stats": """
            SELECT l_returnflag,
                   round(avg(l_quantity), 2) AS avg_l_quantity,
                   round(min(l_quantity), 2) AS min_l_quantity,
                   round(max(l_quantity), 2) AS max_l_quantity,
                   count(*) AS record_count
            FROM lineitem GROUP BY l_returnflag
        """,
        "band_distribution": f"""
            SELECT {_AQI_CASE} AS band, count(*) AS "count"
            FROM events GROUP BY 1
        """,
        "global_means": """
            SELECT round(avg(l_quantity), 2) AS avg_l_quantity,
                   round(avg(l_extendedprice), 2) AS avg_l_extendedprice,
                   round(avg(l_discount), 2) AS avg_l_discount,
                   round(avg(l_tax), 2) AS avg_l_tax
            FROM lineitem
        """,
        "hourly_activity": f"""
            SELECT hour({_TS}) AS hour,
                   count(*) AS record_count,
                   round(avg(value), 2) AS avg_value
            FROM events GROUP BY 1
        """,
        "multikey_summary": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS record_count,
                   round(avg(l_quantity), 2) AS avg_l_quantity,
                   round(avg(l_extendedprice), 2) AS avg_l_extendedprice,
                   round(avg(l_discount), 2) AS avg_l_discount
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "count_distinct": """
            SELECT count(DISTINCT c_mktsegment) AS distinct_c_mktsegment FROM customer
        """,
        "acctbal_range": """
            SELECT max(c_acctbal) - min(c_acctbal) AS range_c_acctbal,
                   max(c_acctbal) AS max_c_acctbal,
                   min(c_acctbal) AS min_c_acctbal
            FROM customer
        """,
        "priority_counts": """
            SELECT o_orderpriority, count(*) AS "count"
            FROM orders GROUP BY o_orderpriority
        """,
        "latest_event_per_type": f"""
            SELECT event_type, epoch_us({_TS}) AS event_time_us, value, event_id
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY event_type ORDER BY ts DESC, event_id DESC
                ) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "top_orders": """
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50
        """,
        "price_bands": """
            SELECT CASE WHEN o_totalprice <= 50000 THEN 'low'
                        WHEN o_totalprice <= 150000 THEN 'mid'
                        WHEN o_totalprice <= 300000 THEN 'high'
                        ELSE 'extreme' END AS price_band,
                   count(*) AS "count"
            FROM orders GROUP BY 1
        """,
        "value_temp_bands": f"""
            SELECT {_TEMP_CASE} AS temp_band, count(*) AS "count"
            FROM events GROUP BY 1
        """,
        "calendar_parts": """
            SELECT year(l_shipdate) AS year, month(l_shipdate) AS month,
                   count(*) AS record_count
            FROM lineitem GROUP BY 1, 2
        """,
        "weighted_score": f"""
            WITH scored AS (
                SELECT l_returnflag, round({_SCORE_SQL}, 2) AS score FROM lineitem
            )
            SELECT l_returnflag,
                   round(avg(score), 2) AS avg_score,
                   round(max(score), 2) AS max_score,
                   count(*) AS record_count
            FROM scored GROUP BY l_returnflag
        """,
        "props_k_stats": """
            SELECT event_type,
                   round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 2) AS avg_k,
                   max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
                   count(*) AS record_count
            FROM events GROUP BY event_type
        """,
        "high_value_events": """
            SELECT event_id, event_type, value FROM events WHERE value > 200
        """,
        "member_filter": """
            SELECT event_type, count(*) AS record_count
            FROM events WHERE event_type IN ('click', 'purchase')
            GROUP BY event_type
        """,
        "distinct_user_event": """
            SELECT DISTINCT user_id, event_type FROM events
        """,
        "notnull_count": """
            SELECT count(*) AS clean_rows FROM events
            WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
        """,
        "join_revenue_by_segment": """
            SELECT c_mktsegment,
                   round(sum(o_totalprice), 2) AS total_revenue,
                   count(*) AS order_count
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "salted_revenue_by_segment": """
            SELECT c_mktsegment,
                   round(sum(o_totalprice::DECIMAL(20,6)), 2)::DOUBLE
                       AS total_revenue,
                   count(*) AS order_count
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "join_star_region": """
            SELECT r_name,
                   round(sum(o_totalprice), 2) AS total_revenue,
                   count(*) AS order_count
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "customers_with_orders": """
            SELECT count(*) AS customer_count FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
        """,
        "customers_without_orders": """
            SELECT c_mktsegment, count(*) AS customer_count FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
            GROUP BY c_mktsegment
        """,
        "running_user_value": """
            SELECT event_id, user_id,
                   round(sum(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ), 2) AS running_value
            FROM events
        """,
        "top3_per_type": """
            SELECT event_type, event_id, value FROM (
                SELECT event_type, event_id, value, row_number() OVER (
                    PARTITION BY event_type ORDER BY value DESC, event_id ASC
                ) AS rn
                FROM events
            ) WHERE rn <= 3
        """,
        "value_delta_per_user": """
            SELECT event_id, user_id,
                   round(value - lag(value, 1) OVER (
                       PARTITION BY user_id ORDER BY event_id
                   ), 2) AS value_delta
            FROM events
        """,
        "users_click_and_purchase": """
            SELECT user_id FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'purchase'
        """,
        "users_click_not_purchase": """
            SELECT user_id FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT user_id FROM events WHERE event_type = 'purchase'
        """,
        "union_hot_or_error": """
            SELECT user_id, event_type FROM events WHERE value > 250
            UNION
            SELECT user_id, event_type FROM events WHERE event_type = 'error'
        """,
        "pivot_qty_by_status": """
            SELECT l_returnflag,
                   round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2)
                       AS sum_l_quantity_O,
                   round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2)
                       AS sum_l_quantity_F
            FROM lineitem GROUP BY l_returnflag
        """,
        "rollup_flag_status": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS record_count,
                   round(sum(l_quantity), 2) AS sum_l_quantity,
                   CAST(GROUPING(l_returnflag) + GROUPING(l_linestatus) AS INTEGER)
                       AS grouping_level
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "cube_flag_status": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS record_count,
                   round(sum(l_quantity), 2) AS sum_l_quantity,
                   CAST(GROUPING(l_returnflag) + GROUPING(l_linestatus) AS INTEGER)
                       AS grouping_level
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "serving_tiles": """
            SELECT count(*) AS record_count,
                   count(DISTINCT event_type) AS distinct_event_type,
                   round(avg(value), 2) AS avg_value,
                   max(value) - min(value) AS range_value
            FROM events
        """,
        "text_stats": rf"""
            SELECT doc_id,
                   CAST(length(text) AS INTEGER) AS n_chars_measured,
                   CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
                   CAST(len(regexp_extract_all(text, '(\w+|[^\w\s])')) AS INTEGER)
                       AS n_tokens_bpe,
                   CAST(len(list_distinct({_TOKS})) AS INTEGER) AS n_distinct_tokens,
                   CAST(len(list_filter({_TOKS}, x -> x IN {_STOP_SQL})) AS INTEGER)
                       AS n_stopwords
            FROM documents
        """,
        "text_quality": rf"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
            SELECT doc_id, floor((
                0.4::DOUBLE * least(len(toks)::DOUBLE / 100.0::DOUBLE, 1.0::DOUBLE)
              + 0.3::DOUBLE * (len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE)
              + 0.3::DOUBLE * (1.0::DOUBLE
                    - len(list_filter(toks, x -> x IN {_STOP_SQL}))::DOUBLE
                      / len(toks)::DOUBLE)
              ) * 10000.0 + 0.5) / 10000.0 AS quality
            FROM t
        """,
        "doc_fingerprints": r"""
            SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
                       AS fingerprint,
                   min(doc_id) AS survivor_id,
                   count(*) AS dup_count
            FROM documents GROUP BY 1
        """,
        "corpus_filter": rf"""
            WITH t AS (
                SELECT doc_id, source, {_TOKS} AS toks,
                       string_split_regex(trim(lower(text)), '\s+') AS ltoks
                FROM documents
            ),
            profiled AS (
                SELECT doc_id, source,
                       floor((
                           0.4::DOUBLE * least(len(toks)::DOUBLE / 100.0::DOUBLE, 1.0::DOUBLE)
                         + 0.3::DOUBLE * (len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE)
                         + 0.3::DOUBLE * (1.0::DOUBLE
                               - len(list_filter(toks, x -> x IN {_STOP_SQL}))::DOUBLE
                                 / len(toks)::DOUBLE)
                           ) * 10000.0 + 0.5) / 10000.0 AS quality,
                       CAST(len(toks) AS INTEGER) AS n_tokens,
                       len(list_filter(ltoks, x -> x IN ('the','and','of','to','a'))) AS s_en,
                       len(list_filter(ltoks, x -> x IN ('el','la','de','que','y'))) AS s_es,
                       len(list_filter(ltoks, x -> x IN ('der','die','und','das','ist'))) AS s_de,
                       len(list_filter(ltoks, x -> x IN ('le','la','et','les','des'))) AS s_fr
                FROM t
            ),
            kept AS (
                SELECT * FROM profiled
                WHERE quality >= 0.5
                  AND n_tokens BETWEEN 20 AND 2000
                  AND (CASE
                        WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en > 0
                            THEN 'en'
                        WHEN s_es >= s_de AND s_es >= s_fr AND s_es > 0 THEN 'es'
                        WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
                        WHEN s_fr > 0 THEN 'fr'
                        ELSE 'und' END) = 'en'
            )
            SELECT source, count(*) AS kept_docs,
                   round(avg(quality), 4) AS avg_quality,
                   round(avg(n_tokens), 2) AS avg_tokens
            FROM kept GROUP BY source
        """,
        "train_test_split": """
            SELECT source,
                   CASE WHEN ('0x' || substr(
                            md5('split:v1' || doc_id::VARCHAR), 1, 7)
                        )::BIGINT % 100 < 10
                        THEN 'test' ELSE 'train' END AS split,
                   count(*) AS doc_count
            FROM documents
            GROUP BY 1, 2
        """,
        "stratified_sample": """
            SELECT source, count(*) AS kept_docs,
                   CAST(sum(n_chars) AS BIGINT) AS kept_chars
            FROM documents
            WHERE ('0x' || substr(
                       md5('strat:v1' || doc_id::VARCHAR), 1, 7)
                  )::BIGINT % 1000
                  < CASE WHEN source IN ('src0', 'src1') THEN 600
                         WHEN source IN ('src2', 'src3') THEN 200
                         ELSE 0 END
            GROUP BY source
        """,
        "group_split": """
            SELECT source,
                   CASE WHEN ('0x' || substr(
                            md5('gsplit:v1' || source), 1, 7)
                        )::BIGINT % 100 < 25
                        THEN 'test' ELSE 'train' END AS split,
                   count(*) AS doc_count,
                   CAST(sum(n_chars) AS BIGINT) AS char_count
            FROM documents
            GROUP BY 1, 2
        """,
        "zorder_pruning": """
            WITH b AS (
                SELECT min(user_id) + ((max(user_id) - min(user_id)) * 2) // 5 AS ulo,
                       min(user_id) + ((max(user_id) - min(user_id)) * 9) // 20 AS uhi,
                       min(value) + (max(value) - min(value)) * 0.4 AS vlo,
                       min(value) + (max(value) - min(value)) * 0.45 AS vhi
                FROM events
            ),
            m AS (
                SELECT count(*) AS n_rows,
                       CAST(sum(event_id) AS BIGINT) AS id_checksum
                FROM events, b
                WHERE user_id BETWEEN b.ulo AND b.uhi
                  AND value BETWEEN b.vlo AND b.vhi
            )
            SELECT l.layout, m.n_rows, m.id_checksum
            FROM (VALUES ('linear'), ('zorder')) AS l(layout), m
        """,
        "zorder_cells": f"""
            WITH mm AS (
                SELECT min(CAST(user_id AS DOUBLE)) AS alo,
                       max(CAST(user_id AS DOUBLE)) AS ahi,
                       min(value) AS blo, max(value) AS bhi
                FROM events
            ),
            scaled AS (
                SELECT COALESCE(CAST(floor((CAST(user_id AS DOUBLE) - alo)
                                 * (4095.0 / (ahi - alo))) AS BIGINT), 0) AS a,
                       COALESCE(CAST(floor((value - blo)
                                 * (4095.0 / (bhi - blo))) AS BIGINT), 0) AS b
                FROM events, mm
            ),
            zv AS (
                SELECT {_Z_INTERLEAVE} AS z FROM scaled
            )
            SELECT z >> 18 AS cell, count(*) AS n_rows,
                   CAST(sum(z) AS BIGINT) AS z_sum
            FROM zv GROUP BY 1
        """,
        # cdc_vacuum: latest + asof_commit=3 re-derived from the
        # version rule (commit 3 = the first three mtime-ordered
        # batches, i.e. version%4 <= 2), each emitted for both phases
        # — in-retention reads must be identical across the vacuum
        "cdc_vacuum": """
            WITH u AS (
                SELECT user_id, event_id AS version, value, event_type
                FROM events
            ),
            l AS (
                SELECT user_id, version, value, event_type,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY version DESC
                       ) AS rn
                FROM u
            ),
            c3 AS (
                SELECT user_id, version, value, event_type,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY version DESC
                       ) AS rn
                FROM u WHERE version % 4 <= 2
            ),
            snaps AS (
                SELECT 'latest' AS snap, user_id, version, value
                FROM l WHERE rn = 1 AND event_type <> 'error'
                UNION ALL
                SELECT 'asof_commit_3', user_id, version, value
                FROM c3 WHERE rn = 1 AND event_type <> 'error'
            )
            SELECT p.phase, s.snap, s.user_id, s.version, s.value
            FROM snaps s
            CROSS JOIN (VALUES ('pre_vacuum'), ('post_vacuum')) p(phase)
        """,
        "cdc_time_travel": """
            WITH u AS (
                SELECT user_id, event_id AS version, value, event_type
                FROM events
            ),
            l AS (
                SELECT user_id, version, value, event_type,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY version DESC
                       ) AS rn
                FROM u
            ),
            a AS (
                SELECT user_id, version, value, event_type,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY version DESC
                       ) AS rn
                FROM u WHERE version % 4 <= 1
            )
            SELECT 'latest' AS snap, user_id, version, value
            FROM l WHERE rn = 1 AND event_type <> 'error'
            UNION ALL
            SELECT 'asof_epoch_1', user_id, version, value
            FROM a WHERE rn = 1 AND event_type <> 'error'
        """,
        "streaming_cdc_apply": """
            WITH latest AS (
                SELECT user_id, event_id AS version, value, event_type,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY event_id DESC
                       ) AS rn
                FROM events
            )
            SELECT user_id, version, value
            FROM latest WHERE rn = 1 AND event_type <> 'error'
        """,
        "hourly_ohlc": f"""
            SELECT user_id, date_trunc('hour', {_TS}) AS bucket,
                   min(struct_pack(t := {_TS}, v := value)).v AS open,
                   max(value) AS high,
                   min(value) AS low,
                   max(struct_pack(t := {_TS}, v := value)).v AS close,
                   count(value) AS n_obs
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        """,
        "embedding_gram": """
            WITH q AS (
                SELECT vec_id, CAST(u.i - 1 AS INTEGER) AS dim,
                       CAST(floor(CAST(embedding[u.i] AS DOUBLE)
                                  * 1000000.0 + 0.5) AS BIGINT) AS qv
                FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
            )
            SELECT a.dim AS i, b.dim AS j,
                   CAST(sum(a.qv * b.qv) AS BIGINT) AS gram_sum_q2
            FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.dim <= b.dim
            GROUP BY 1, 2
        """,
        "sink_sharded_export": """
            SELECT CAST(('0x' || substr(
                       md5('shard:v1' || doc_id::VARCHAR), 1, 7)
                   )::BIGINT % 8 AS INTEGER) AS shard,
                   count(*) AS doc_count,
                   CAST(sum(doc_id) AS BIGINT) AS id_checksum,
                   CAST(sum(n_chars) AS BIGINT) AS char_total
            FROM documents
            GROUP BY 1
        """,
        "token_budget_prefix": r"""
            WITH t AS (
                SELECT doc_id,
                       len(string_split_regex(trim(text), '\s+')) AS n_tok,
                       md5('budget:v1' || doc_id::VARCHAR) AS h
                FROM documents
            ),
            c AS (
                SELECT *,
                       sum(n_tok) OVER (ORDER BY h, doc_id
                                        ROWS UNBOUNDED PRECEDING) AS cum
                FROM t
            )
            SELECT count(*) AS kept_docs,
                   CAST(sum(n_tok) AS BIGINT) AS total_tokens,
                   CAST(sum(doc_id) AS BIGINT) AS id_checksum
            FROM c WHERE cum <= 2000
        """,
        "retrieval_ndcg": f"""
            WITH q AS (
                SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe,
                       label AS qlabel
                FROM embeddings WHERE vec_id < 20
            ),
            e AS (
                SELECT vec_id, embedding::DOUBLE[] AS ee, label
                FROM embeddings
            ),
            ranked AS (
                SELECT query_id, qlabel, clabel,
                       row_number() OVER (
                           PARTITION BY query_id ORDER BY sim DESC, corpus_id
                       ) AS rn
                FROM (
                    SELECT q.query_id, q.qlabel, e.vec_id AS corpus_id,
                           e.label AS clabel,
                           round(list_cosine_similarity(e.ee, q.qe), 6) AS sim
                    FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
                )
            ),
            wts(pos, wm) AS (VALUES {_ndcg_wts}),
            pre(r, s) AS (VALUES {_ndcg_pre}),
            topk AS (
                SELECT query_id, qlabel AS label,
                       CAST(sum(CASE WHEN clabel = qlabel THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_relevant_at_k,
                       CAST(sum(CASE WHEN clabel = qlabel THEN w.wm ELSE 0 END)
                            AS BIGINT) AS dcg_micros
                FROM ranked JOIN wts w ON w.pos = ranked.rn
                WHERE rn <= 10
                GROUP BY 1, 2
            ),
            ln AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1)
            SELECT t.query_id, t.label, t.n_relevant_at_k, t.dcg_micros,
                   CAST(COALESCE(p.s, 0) AS BIGINT) AS idcg_micros,
                   CAST(CASE WHEN COALESCE(p.s, 0) > 0
                        THEN (t.dcg_micros * 1000000) // p.s
                        ELSE 0 END AS BIGINT) AS ndcg_micros
            FROM topk t
            JOIN ln ON ln.label = t.label
            LEFT JOIN pre p ON p.r = least(10, ln.n - 1)
        """,
        "pps_sample": """
            WITH w AS (
                SELECT doc_id, n_chars,
                       md5('pps:v1' || CAST(doc_id AS VARCHAR)) AS h
                FROM documents
                WHERE doc_id IS NOT NULL AND n_chars > 0
            ),
            c AS (
                SELECT doc_id, n_chars,
                       sum(n_chars) OVER (ORDER BY h, doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
                FROM w
            ),
            t AS (SELECT sum(n_chars) AS total FROM w)
            -- systematic PPS: select the row containing each of the 50
            -- equal-spaced boundaries on the cumulative-weight line
            SELECT doc_id, n_chars,
                   CAST((cum * 50) // total AS BIGINT) AS sample_rank
            FROM c, t
            WHERE (cum * 50) // total > ((cum - n_chars) * 50) // total
        """,
        "mixture_sample": """
            WITH n AS (
                SELECT source, count(*) AS cnt FROM documents
                WHERE source IN ('src0', 'src1', 'src2') GROUP BY source
            ),
            w(source, wt) AS (VALUES ('src0', 6), ('src1', 3), ('src2', 1)),
            t AS (
                SELECT min((COALESCE(n.cnt, 0) * 10) // w.wt) AS t_max
                FROM w LEFT JOIN n USING (source)
            ),
            q AS (SELECT w.source, (w.wt * t.t_max) // 10 AS quota FROM w, t),
            ranked AS (
                SELECT source, doc_id,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY md5('mix:v1' || doc_id::VARCHAR), doc_id
                       ) AS rn
                FROM documents WHERE source IN ('src0', 'src1', 'src2')
            )
            SELECT r.source, count(*) AS doc_count,
                   CAST(sum(r.doc_id) AS BIGINT) AS id_checksum
            FROM ranked r JOIN q ON r.source = q.source
            WHERE r.rn <= q.quota
            GROUP BY r.source
        """,
        "stratified_quota_sample": """
            WITH ranked AS (
                SELECT source, doc_id,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY md5('quota:v1' || doc_id::VARCHAR), doc_id
                       ) AS rn
                FROM documents
            )
            SELECT source, count(*) AS kept_docs,
                   CAST(sum(doc_id) AS BIGINT) AS id_sum
            FROM ranked
            WHERE rn <= CASE WHEN source = 'src0' THEN 40
                             WHEN source = 'src1' THEN 15
                             ELSE 5 END
            GROUP BY source
        """,
        "doc_chunks": r"""
            WITH toks AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                FROM documents
            ),
            chunks AS (
                SELECT doc_id,
                       s // 12 AS chunk_id,
                       s AS start,
                       t[s + 1 : s + 16] AS chunk
                FROM toks,
                     UNNEST(range(0, greatest(len(t), 1), 12)) AS u(s)
                WHERE len(t) > 0
                  AND (s = 0 OR s - 12 + 16 < len(t))
            )
            SELECT chunk_id,
                   count(*) AS n_chunks,
                   CAST(sum(len(chunk)) AS BIGINT) AS total_tokens,
                   count(DISTINCT md5(array_to_string(chunk, ' ')))
                       AS distinct_chunks
            FROM chunks
            GROUP BY 1
            ORDER BY 1
        """,
        "tfidf_terms": r"""
            WITH tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM (
                    SELECT doc_id,
                           unnest(string_split_regex(trim(text), '\s+'))
                               AS term
                    FROM documents
                )
                GROUP BY doc_id, term
            ),
            df AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
            n AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n_docs
                  FROM documents)
            SELECT doc_id, term, tf, doc_freq,
                   tf::DOUBLE * (n_docs / doc_freq::DOUBLE) AS score, rk
            FROM (
                SELECT tf.doc_id, tf.term, tf.tf, df.doc_freq, n.n_docs,
                       row_number() OVER (
                           PARTITION BY tf.doc_id
                           ORDER BY tf::DOUBLE
                                    * (n_docs / doc_freq::DOUBLE) DESC,
                                    tf.term ASC
                       ) AS rk
                FROM tf JOIN df USING (term) CROSS JOIN n
            )
            WHERE rk <= 3
        """,
        "zscore_outliers": """
            WITH stats AS (
                SELECT event_type,
                       sum((value::DECIMAL(10,6)
                            * 1000000::DECIMAL(7,0))::DECIMAL(18,0))
                           AS s_raw,
                       sum((value::DECIMAL(10,6)
                            * 1000000::DECIMAL(7,0))::DECIMAL(18,0)
                           * (value::DECIMAL(10,6)
                              * 1000000::DECIMAL(7,0))::DECIMAL(18,0))
                           AS ss_raw,
                       count(*) AS n
                FROM events
                GROUP BY event_type
            ),
            sd AS (
                SELECT event_type,
                       (s_raw::DECIMAL(19,0))::DOUBLE / n / 1000000.0
                           AS mean,
                       sqrt((n::DECIMAL(7,0) * ss_raw::DECIMAL(24,0)
                             - s_raw::DECIMAL(19,0) * s_raw::DECIMAL(19,0)
                            )::DOUBLE
                            / ((n * (n - 1))::DOUBLE)) / 1000000.0 AS sd
                FROM stats
            )
            SELECT event_id, events.event_type, value,
                   (value - mean) / sd AS z
            FROM events JOIN sd ON events.event_type = sd.event_type
            WHERE abs((value - mean) / sd) > 3.0
        """,
        "top_tokens": r"""
            SELECT token, count(*) AS occurrences
            FROM (
                SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
                           AS token
                FROM documents
            )
            GROUP BY token
            ORDER BY occurrences DESC, token ASC
            LIMIT 50
        """,
        "lang_pred_counts": rf"""
            WITH t AS (
                SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
                FROM documents
            ),
            scored AS (
                SELECT doc_id,
                   {_LANG_SCORES}
                FROM t
            ),
            pred AS (
                SELECT CASE
                    WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en > 0
                        THEN 'en'
                    WHEN s_es >= s_de AND s_es >= s_fr AND s_es > 0 THEN 'es'
                    WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
                    WHEN s_fr > 0 THEN 'fr'
                    ELSE 'und' END AS lang_pred
                FROM scored
            )
            SELECT lang_pred, count(*) AS doc_count FROM pred GROUP BY lang_pred
        """,
        "ngram_jaccard": rf"""
            WITH {_SHINGLE_CTES},
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            pairs AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b, common,
                   round(common / (sa.n + sb.n - common), 4) AS jaccard
            FROM pairs
            JOIN sizes sa ON doc_a = sa.doc_id
            JOIN sizes sb ON doc_b = sb.doc_id
            WHERE round(common / (sa.n + sb.n - common), 4) >= 0.1
        """,
        "ngram_jaccard_capped": rf"""
            WITH {_SHINGLE_CTES},
            freq AS (
                SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 4
            ),
            kept AS (
                SELECT sh.doc_id, sh.shingle FROM sh JOIN freq USING (shingle)
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
            pairs AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
                FROM kept a JOIN kept b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b, common,
                   round(common / (sa.n + sb.n - common), 4) AS jaccard
            FROM pairs
            JOIN sizes sa ON doc_a = sa.doc_id
            JOIN sizes sb ON doc_b = sb.doc_id
            WHERE round(common / (sa.n + sb.n - common), 4) >= 0.05
        """,
        "minhash_pairs": rf"""
            WITH {_SHINGLE_CTES},
            sig AS (
                SELECT doc_id,
                   {_MINHASH_AGGS}
                FROM sh GROUP BY doc_id
            ),
            bands AS (
            {_BAND_SELECTS}
            )
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        """,
        "dedup_clusters": rf"""
            WITH RECURSIVE {_SHINGLE_CTES},
            sig AS (
                SELECT doc_id,
                   {_MINHASH_AGGS}
                FROM sh GROUP BY doc_id
            ),
            bands AS (
            {_BAND_SELECTS}
            ),
            pairs AS (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.bucket = b.bucket
                 AND a.doc_id < b.doc_id
            ),
            sym AS (
                SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION
                SELECT doc_b, doc_a FROM pairs
            ),
            reach(v, r) AS (
                SELECT a, b FROM sym
                UNION
                SELECT reach.v, sym.b FROM reach JOIN sym ON reach.r = sym.a
            )
            SELECT v AS doc_id, least(v, min(r)) AS cluster_id
            FROM reach GROUP BY v
        """,
        "fuzzy_dedup_corpus": rf"""
            WITH RECURSIVE {_SHINGLE_CTES},
            sig AS (
                SELECT doc_id,
                   {_MINHASH_AGGS}
                FROM sh GROUP BY doc_id
            ),
            bands AS (
            {_BAND_SELECTS}
            ),
            pairs AS (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.bucket = b.bucket
                 AND a.doc_id < b.doc_id
            ),
            sym AS (
                SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION
                SELECT doc_b, doc_a FROM pairs
            ),
            reach(v, r) AS (
                SELECT a, b FROM sym
                UNION
                SELECT reach.v, sym.b FROM reach JOIN sym ON reach.r = sym.a
            ),
            losers AS (
                SELECT v AS doc_id FROM reach
                GROUP BY v HAVING least(v, min(r)) != v
            )
            SELECT source, count(*) AS kept_docs,
                   CAST(sum(n_chars) AS BIGINT) AS kept_chars
            FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM losers)
            GROUP BY source
            ORDER BY source
        """,
        "simhash": rf"""
            WITH tok AS (
                SELECT doc_id, unnest({_TOKS}) AS token FROM documents
            ),
            h AS (
                SELECT doc_id,
                       ('0x' || substr(md5(token), 1, 15))::BIGINT AS h
                FROM tok
            ),
            bits AS (
                SELECT doc_id,
                   {_SIMHASH_BIT_AGGS}
                FROM h GROUP BY doc_id
            )
            SELECT doc_id,
                   {_SIMHASH_ASSEMBLE} AS simhash
            FROM bits
        """,
        "simhash_near_dup": rf"""
            WITH tok AS (
                SELECT doc_id, unnest({_TOKS}) AS token FROM documents
            ),
            h AS (
                SELECT doc_id,
                       ('0x' || substr(md5(token), 1, 15))::BIGINT AS h
                FROM tok
            ),
            bits AS (
                SELECT doc_id,
                   {_SIMHASH_BIT_AGGS}
                FROM h GROUP BY doc_id
            ),
            sig AS (
                SELECT doc_id,
                       {_SIMHASH_ASSEMBLE} AS simhash
                FROM bits
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER)
                       AS hamming
            FROM sig a JOIN sig b
              ON (a.simhash >> 52) = (b.simhash >> 52)
             AND a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 16
        """,
        "embedding_topk": """
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                       (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)),
                       6) AS cosine_sim
            FROM embeddings
            ORDER BY cosine_sim DESC, vec_id ASC
            LIMIT 10
        """,
        "ivf_topk_recall": """
            -- integer-micros quantization (floor(x*1e6+0.5), scalar op)
            -- makes every dot/norm an EXACT integer sum < 2^53: numpy,
            -- Spark and DuckDB agree bit-for-bit regardless of
            -- summation order, so the rankings below are deterministic
            -- mirrors, not drift-prone float re-derivations
            WITH mq AS (
                SELECT vec_id,
                       list_transform(embedding::DOUBLE[],
                           x -> floor(x * 1000000.0 + 0.5)) AS me
                FROM embeddings
            ),
            q AS (
                SELECT vec_id AS qid, me AS qe FROM mq WHERE vec_id < 5
            ),
            c AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                       me AS ce
                FROM (SELECT * FROM mq ORDER BY vec_id LIMIT 8)
            ),
            e AS (SELECT vec_id, me AS ee FROM mq),
            -- numpy probe ranking mirror: +1e-12 in the denominator
            probes AS (
                SELECT qid, cid FROM (
                    SELECT q.qid, c.cid, row_number() OVER (
                        PARTITION BY q.qid ORDER BY
                            list_dot_product(c.ce, q.qe)
                            / (sqrt(list_dot_product(c.ce, c.ce))
                               * sqrt(list_dot_product(q.qe, q.qe)) + 1e-12)
                            DESC, c.cid ASC
                    ) AS rn
                    FROM q CROSS JOIN c
                ) WHERE rn <= 4
            ),
            -- ivf_assign mirror: argmax by cosine, ties -> HIGHEST cid
            assign AS (
                SELECT vec_id, cid FROM (
                    SELECT e.vec_id, c.cid, row_number() OVER (
                        PARTITION BY e.vec_id ORDER BY
                            list_dot_product(e.ee, c.ce)
                            / (sqrt(list_dot_product(e.ee, e.ee))
                               * sqrt(list_dot_product(c.ce, c.ce)))
                            DESC, c.cid DESC
                    ) AS rn
                    FROM e CROSS JOIN c
                ) WHERE rn = 1
            ),
            ivf AS (
                SELECT qid, vec_id FROM (
                    SELECT q.qid, e.vec_id, row_number() OVER (
                        PARTITION BY q.qid ORDER BY
                            round(list_dot_product(e.ee, q.qe)
                                  / (sqrt(list_dot_product(e.ee, e.ee))
                                     * sqrt(list_dot_product(q.qe, q.qe))), 6)
                            DESC, e.vec_id ASC
                    ) AS rn
                    FROM q
                    JOIN probes p ON p.qid = q.qid
                    JOIN assign a ON a.cid = p.cid
                    JOIN e ON e.vec_id = a.vec_id
                ) WHERE rn <= 10
            ),
            bf AS (
                SELECT qid, vec_id FROM (
                    SELECT q.qid, e.vec_id, row_number() OVER (
                        PARTITION BY q.qid ORDER BY
                            round(list_dot_product(e.ee, q.qe)
                                  / (sqrt(list_dot_product(e.ee, e.ee))
                                     * sqrt(list_dot_product(q.qe, q.qe))), 6)
                            DESC, e.vec_id ASC
                    ) AS rn
                    FROM q CROSS JOIN e
                ) WHERE rn <= 10
            ),
            h AS (
                SELECT count(*) AS n_hits
                FROM ivf JOIN bf USING (qid, vec_id)
            )
            SELECT (SELECT count(*) FROM q) AS n_queries,
                   h.n_hits,
                   (h.n_hits * 1000000) // ((SELECT count(*) FROM q) * 10)
                       AS recall_micros
            FROM h
        """,
        # lsh_topk_recall: the whole approximate pipeline re-derived —
        # signature bits are signs of EXACT integer dot products
        # (micros embeddings x micros plane literals, the same integers
        # the Spark plan carries), the hamming prefilter is xor +
        # bit_count on the packed BIGINT, and candidates rank by the
        # same rounded cosine as the brute-force mirror
        "lsh_topk_recall": f"""
            WITH mq AS (
                SELECT vec_id, list_transform(embedding::DOUBLE[],
                           x -> floor(x * 1000000.0 + 0.5)) AS me
                FROM embeddings
            ),
            q AS (SELECT vec_id AS qid, me AS qe FROM mq WHERE vec_id < 5),
            sigs AS (
                SELECT vec_id, me, {_lsh_sig_sql("me")} AS sig FROM mq
            ),
            qsigs AS (
                SELECT qid, qe, {_lsh_sig_sql("qe")} AS sig FROM q
            ),
            cand AS (
                SELECT qs.qid, s.vec_id,
                       round(list_dot_product(s.me, qs.qe)
                             / (sqrt(list_dot_product(s.me, s.me))
                                * sqrt(list_dot_product(qs.qe, qs.qe))), 6)
                           AS sim
                FROM qsigs qs JOIN sigs s
                  ON bit_count(xor(s.sig, qs.sig)) <= {_LSH_GATE_HAMMING}
            ),
            lsh AS (
                SELECT qid, vec_id FROM (
                    SELECT qid, vec_id, row_number() OVER (
                        PARTITION BY qid ORDER BY sim DESC, vec_id ASC
                    ) AS rn
                    FROM cand
                ) WHERE rn <= 10
            ),
            bf AS (
                SELECT qid, vec_id FROM (
                    SELECT q.qid, e.vec_id, row_number() OVER (
                        PARTITION BY q.qid ORDER BY
                            round(list_dot_product(e.me, q.qe)
                                  / (sqrt(list_dot_product(e.me, e.me))
                                     * sqrt(list_dot_product(q.qe, q.qe))), 6)
                            DESC, e.vec_id ASC
                    ) AS rn
                    FROM q CROSS JOIN mq e
                ) WHERE rn <= 10
            ),
            h AS (
                SELECT count(*) AS n_hits FROM lsh JOIN bf USING (qid, vec_id)
            )
            SELECT (SELECT count(*) FROM q) AS n_queries,
                   h.n_hits,
                   (h.n_hits * 1000000) // ((SELECT count(*) FROM q) * 10)
                       AS recall_micros
            FROM h
        """,
        "ivf_topk_exhaustive": """
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                       (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)),
                       6) AS cosine_sim
            FROM embeddings
            ORDER BY cosine_sim DESC, vec_id ASC
            LIMIT 10
        """,
        "knn_join": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
                FROM embeddings WHERE vec_id < 3
            ),
            scored AS (
                SELECT q.query_id, e.vec_id AS corpus_id,
                       round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6)
                           AS cosine_sim
                FROM embeddings e CROSS JOIN q
            ),
            ranked AS (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cosine_sim DESC, corpus_id ASC
                ) AS rn
                FROM scored
            )
            SELECT query_id, corpus_id, cosine_sim FROM ranked WHERE rn <= 5
        """,
        "asof_purchase_attribution": f"""
            WITH p AS (
                SELECT event_id AS purchase_id, user_id, {_TS} AS pts
                FROM events WHERE event_type = 'purchase'
            ),
            c AS (
                SELECT event_id AS click_id, user_id, {_TS} AS cts
                FROM events WHERE event_type = 'click'
                QUALIFY row_number() OVER (
                    PARTITION BY user_id, ts ORDER BY event_id DESC
                ) = 1
            )
            SELECT purchase_id, p.user_id,
                   epoch_us(pts) AS purchase_time_us,
                   click_id,
                   epoch_us(cts) AS click_time_us,
                   epoch_us(pts) - epoch_us(cts) AS gap_us
            FROM p ASOF JOIN c
              ON p.user_id = c.user_id AND p.pts >= c.cts
        """,
        "user_sessions": f"""
            WITH e AS (
                SELECT user_id, event_id, epoch_us({_TS}) AS tus FROM events
            ),
            m AS (
                SELECT user_id, event_id, tus,
                       CASE WHEN lag(tus) OVER w IS NULL
                                 OR tus - lag(tus) OVER w > 14400000000
                            THEN 1 ELSE 0 END AS is_new
                FROM e
                WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
            ),
            s AS (
                SELECT user_id,
                       sum(is_new) OVER (
                           PARTITION BY user_id ORDER BY tus, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS session_id
                FROM m
            ),
            ps AS (
                SELECT user_id, session_id, count(*) AS n_events
                FROM s GROUP BY 1, 2
            )
            SELECT user_id,
                   count(*) AS session_count,
                   floor(avg(n_events) * 100 + 0.5) / 100
                       AS avg_session_events,
                   max(n_events) AS max_session_events
            FROM ps GROUP BY user_id
        """,
        "value_percentiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.25), 4) AS p25_value,
                   round(quantile_cont(value, 0.5), 4) AS p50_value,
                   round(quantile_cont(value, 0.75), 4) AS p75_value,
                   count(*) AS record_count
            FROM events GROUP BY event_type
        """,
        "range_band_join": """
            WITH bands(band, lo, hi) AS (VALUES
                ('low', -1e12, 50.0), ('mid', 50.0, 150.0),
                ('high', 150.0, 300.0), ('extreme', 300.0, 1e12))
            SELECT band, count(*) AS record_count,
                   round(avg(value), 2) AS avg_value
            FROM events JOIN bands ON value >= lo AND value < hi
            GROUP BY band
        """,
        "dq_report": """
            WITH wide AS (
                SELECT
                    count(*) FILTER (WHERE user_id IS NULL) AS user_id_null,
                    count(*) FILTER (WHERE ts IS NULL) AS ts_null,
                    count(*) FILTER (WHERE value IS NOT NULL
                        AND value NOT BETWEEN 0.0 AND 250.0)
                        AS value_out_of_range,
                    count(*) FILTER (WHERE event_type IS NOT NULL
                        AND event_type NOT IN
                            ('click','view','purchase','error'))
                        AS event_type_unknown,
                    count(*) - count(DISTINCT event_id) AS event_id_dup,
                    count(*) AS total_rows
                FROM events
            )
            SELECT 'user_id_null' AS check_name,
                   user_id_null AS violations, total_rows FROM wide
            UNION ALL
            SELECT 'ts_null', ts_null, total_rows FROM wide
            UNION ALL
            SELECT 'value_out_of_range', value_out_of_range, total_rows
            FROM wide
            UNION ALL
            SELECT 'event_type_unknown', event_type_unknown, total_rows
            FROM wide
            UNION ALL
            SELECT 'event_id_dup', event_id_dup, total_rows FROM wide
        """,
        "latest_value_max_by": f"""
            SELECT event_type,
                   max_by(value, ts) AS latest_value,
                   max({_TS}) AS latest_ts
            FROM events
            GROUP BY event_type
        """,
        "value_histogram": """
            SELECT floor(value / 25.0)::INT AS bucket,
                   count(*) AS record_count,
                   floor(value / 25.0)::INT * 25.0 AS bucket_lo
            FROM events
            GROUP BY 1
        """,
        "priority_except_all": """
            SELECT o_orderpriority FROM orders
            WHERE o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1995-07-01'
            EXCEPT ALL
            SELECT o_orderpriority FROM orders
            WHERE o_orderdate >= TIMESTAMP '1995-07-01'
              AND o_orderdate < TIMESTAMP '1996-01-01'
        """,
        "priority_intersect_all": """
            SELECT o_orderpriority FROM orders
            WHERE o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1995-07-01'
            INTERSECT ALL
            SELECT o_orderpriority FROM orders
            WHERE o_orderdate >= TIMESTAMP '1995-07-01'
              AND o_orderdate < TIMESTAMP '1996-01-01'
        """,
        "tpch_q10": """
            SELECT c_custkey, c_name, c_acctbal, n_name,
                   round(sum((l_extendedprice * (1 - l_discount))
                             ::DECIMAL(20,6)), 2)::DOUBLE AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1995-10-01'
              AND o_orderdate < TIMESTAMP '1996-01-01'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        """,
        "gapfill_hourly_locf": """
            WITH hourly AS (
                SELECT event_type,
                       date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket_ts,
                       sum(value::DECIMAL(20,6)) AS s,
                       count(value) AS c
                FROM events
                GROUP BY 1, 2
            ), bounds AS (
                SELECT min(bucket_ts) AS lo, max(bucket_ts) AS hi FROM hourly
            ), spine AS (
                SELECT event_type,
                       unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                           AS bucket_ts
                FROM (SELECT DISTINCT event_type FROM events), bounds
            )
            SELECT sp.event_type, sp.bucket_ts,
                   (last_value(h.s IGNORE NULLS) OVER w)::DOUBLE
                       / (last_value(h.c IGNORE NULLS) OVER w) AS value_locf,
                   (h.s IS NULL)::INT AS was_filled
            FROM spine sp LEFT JOIN hourly h
              ON sp.event_type = h.event_type
             AND sp.bucket_ts = h.bucket_ts
            WINDOW w AS (
                PARTITION BY sp.event_type ORDER BY sp.bucket_ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            )
        """,
        "order_snapshot_diff": """
            WITH y97 AS (
                SELECT o_custkey, count(*) AS cnt,
                       round(sum(o_totalprice::DECIMAL(20,6)), 2)::DOUBLE
                           AS spend
                FROM orders
                WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                  AND o_orderdate < TIMESTAMP '1998-01-01'
                GROUP BY o_custkey
            ), y98 AS (
                SELECT o_custkey, count(*) AS cnt,
                       round(sum(o_totalprice::DECIMAL(20,6)), 2)::DOUBLE
                           AS spend
                FROM orders
                WHERE o_orderdate >= TIMESTAMP '1998-01-01'
                  AND o_orderdate < TIMESTAMP '1999-01-01'
                GROUP BY o_custkey
            )
            SELECT coalesce(y97.o_custkey, y98.o_custkey) AS o_custkey,
                   y97.cnt AS old_order_cnt, y97.spend AS old_spend,
                   y98.cnt AS new_order_cnt, y98.spend AS new_spend,
                   CASE WHEN y97.o_custkey IS NULL THEN 'added'
                        WHEN y98.o_custkey IS NULL THEN 'removed'
                        WHEN y97.cnt IS DISTINCT FROM y98.cnt
                             OR y97.spend IS DISTINCT FROM y98.spend
                            THEN 'changed'
                        ELSE 'unchanged' END AS diff_status
            FROM y97 FULL OUTER JOIN y98 ON y97.o_custkey = y98.o_custkey
        """,
        "tpch_q4": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
              AND EXISTS (
                  SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate
              )
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "tpch_q7": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate)::INT AS l_year,
                   round(sum((l_extendedprice * (1 - l_discount))
                             ::DECIMAL(20,6)), 2)::DOUBLE AS revenue
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY supp_nation, cust_nation, l_year
            ORDER BY supp_nation, cust_nation, l_year
        """,
        "tpch_q8": """
            SELECT year(o_orderdate)::INT AS o_year,
                   (sum(CASE WHEN n2.n_name = 'NATION_3'
                             THEN (l_extendedprice * (1 - l_discount))
                                  ::DECIMAL(20,6)
                             ELSE 0::DECIMAL(20,6) END))::DOUBLE
                   / (sum((l_extendedprice * (1 - l_discount))
                          ::DECIMAL(20,6)))::DOUBLE AS mkt_share
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            WHERE r_name = 'AMERICA'
              AND p_type = 'ECONOMY'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY o_year
            ORDER BY o_year
        """,
        "tpch_q15": """
            WITH revenue AS (
                SELECT l_suppkey AS supplier_no,
                       sum((l_extendedprice * (1 - l_discount))
                           ::DECIMAL(20,6)) AS total_rev
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name,
                   round(total_rev, 2)::DOUBLE AS total_revenue
            FROM supplier JOIN revenue ON s_suppkey = supplier_no
            WHERE total_rev = (SELECT max(total_rev) FROM revenue)
            ORDER BY s_suppkey
        """,
        "tpch_q17": """
            SELECT round((sum(l_extendedprice::DECIMAL(20,6)))::DOUBLE
                         / 7.0, 2) AS avg_yearly
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#23'
              AND l_quantity < (
                  SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                  WHERE l2.l_partkey = lineitem.l_partkey
              )
        """,
        "tpch_q22": """
            SELECT c_mktsegment AS segment, count(*) AS numcust,
                   round(sum(c_acctbal::DECIMAL(20,6)), 2)::DOUBLE
                       AS totacctbal
            FROM customer
            WHERE c_acctbal > (
                  SELECT (sum(c_acctbal::DECIMAL(20,6)))::DOUBLE / count(*)
                  FROM customer WHERE c_acctbal > 0.0
              )
              AND NOT EXISTS (
                  SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01'
              )
            GROUP BY segment
            ORDER BY segment
        """,
        "tpch_q13": """
            SELECT c_count, count(*) AS custdist
            FROM (
                SELECT c_custkey, count(o_orderkey) AS c_count
                FROM customer LEFT OUTER JOIN orders
                  ON c_custkey = o_custkey
                 AND o_orderpriority <> '1-URGENT'
                GROUP BY c_custkey
            ) t
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "tpch_q16": """
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_brand <> 'Brand#45'
              AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
              AND l_suppkey NOT IN (
                  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
              )
            GROUP BY p_brand, p_type, p_size
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "tpch_q19": """
            SELECT round((sum((l_extendedprice * (1 - l_discount))
                              ::DECIMAL(20,6)))::DOUBLE, 2) AS revenue
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "tpch_q2": """
            WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
            SELECT s_acctbal, s_name, n_name, p_partkey, p_name
            FROM ps
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE p_type = 'STANDARD' AND p_size <= 15
              AND r_name = 'EUROPE'
              AND s_acctbal = (
                  SELECT min(s2.s_acctbal)
                  FROM ps ps2
                  JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
                  JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                  WHERE ps2.l_partkey = ps.l_partkey
                    AND r2.r_name = 'EUROPE'
              )
            ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
            LIMIT 100
        """,
        "tpch_q9": """
            SELECT n_name AS nation, year(o_orderdate)::INT AS o_year,
                   round((sum((l_extendedprice * (1 - l_discount)
                               - 0.5 * p_retailprice * l_quantity)
                              ::DECIMAL(20,6)))::DOUBLE, 2) AS sum_profit
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN orders ON o_orderkey = l_orderkey
            WHERE p_name LIKE '%bolt%'
            GROUP BY n_name, o_year
            ORDER BY nation, o_year DESC
        """,
        "tpch_q11": """
            WITH per_part AS (
                SELECT l_partkey AS ps_partkey,
                       sum((l_extendedprice * l_quantity)::DECIMAL(20,6))
                           AS v
                FROM lineitem
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                WHERE n_name = 'NATION_3'
                GROUP BY l_partkey
            )
            SELECT ps_partkey, round(v, 2)::DOUBLE AS part_value
            FROM per_part
            WHERE v::DOUBLE > (
                SELECT 2.0 * (sum(v))::DOUBLE / count(*) FROM per_part
            )
            ORDER BY part_value DESC, ps_partkey
        """,
        "tpch_q14": """
            SELECT floor(100.0
                       * (sum(CASE WHEN p_type = 'PROMO'
                              THEN (l_extendedprice * (1 - l_discount))
                                   ::DECIMAL(20,6)
                              ELSE 0::DECIMAL(20,6) END))::DOUBLE
                       / (sum((l_extendedprice * (1 - l_discount))
                              ::DECIMAL(20,6)))::DOUBLE
                       * 10000.0 + 0.5) / 10000.0 AS promo_revenue_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-09-01'
              AND l_shipdate < TIMESTAMP '1997-10-01'
        """,
        "tpch_q12": """
            SELECT l_linestatus,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE l_returnflag = 'R'
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l_linestatus
            ORDER BY l_linestatus
        """,
        "tpch_q20": """
            WITH shipped AS (
                SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l_shipdate < TIMESTAMP '1998-01-01'
                GROUP BY l_suppkey, l_partkey
            )
            SELECT s_name, round(s_acctbal, 2) AS s_acctbal
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
              AND s_suppkey IN (
                  SELECT l_suppkey
                  FROM shipped
                  JOIN part ON p_partkey = l_partkey
                  WHERE p_name LIKE 'red%'
                    AND qty > 1.2 * (
                        SELECT avg(s2.qty) FROM shipped s2
                        JOIN part p2 ON p2.p_partkey = s2.l_partkey
                        WHERE s2.l_partkey = shipped.l_partkey
                          AND p2.p_name LIKE 'red%'
                    )
              )
            ORDER BY s_name
        """,
        "tpch_q21": """
            SELECT s_name, count(*) AS numwait
            FROM lineitem l1
            JOIN orders ON o_orderkey = l1.l_orderkey
            JOIN supplier ON s_suppkey = l1.l_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE o_orderstatus = 'F'
              AND n_name = 'NATION_8'
              AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
              AND EXISTS (
                  SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey
              )
              AND NOT EXISTS (
                  SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
              )
            GROUP BY s_name
            ORDER BY numwait DESC, s_name
            LIMIT 100
        """,
        "tpch_q18": """
            SELECT c_name, c_custkey, o_orderkey, o_orderdate,
                   o_totalprice, sum_qty
            FROM orders
            JOIN (
                SELECT l_orderkey, sum(l_quantity) AS sum_qty
                FROM lineitem
                GROUP BY l_orderkey
                HAVING sum(l_quantity) > 300
            ) big ON o_orderkey = big.l_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 100
        """,
        "sliding_window_counts": """
            WITH buckets AS (
                SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))
                           AS b,
                       event_type, value
                FROM events
            ), expanded AS (
                SELECT b AS window_start, event_type, value FROM buckets
                UNION ALL
                SELECT b - INTERVAL 1 HOUR, event_type, value FROM buckets
            )
            SELECT window_start, event_type,
                   count(*) AS record_count,
                   round(sum(value::DECIMAL(20,6)), 2)::DOUBLE AS value_sum
            FROM expanded
            GROUP BY window_start, event_type
        """,
        "value_rankings": """
            SELECT event_type, event_id,
                   rank() OVER w AS rnk,
                   dense_rank() OVER w AS dense_rnk,
                   ntile(4) OVER w AS quartile,
                   percent_rank() OVER w AS pct_rank
            FROM events
            WINDOW w AS (
                PARTITION BY event_type ORDER BY value DESC, event_id ASC
            )
        """,
        "moving_sum_user_value": """
            SELECT user_id, event_id,
                   (sum(value::DECIMAL(20,6)) OVER w)::DOUBLE
                       AS trailing_sum,
                   count(*) OVER w AS frame_count
            FROM events
            WINDOW w AS (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
            )
        """,
        "trailing_hour_count": """
            SELECT user_id, event_id,
                   count(*) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP)
                       RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                             AND CURRENT ROW
                   ) AS trailing_count
            FROM events
        """,
        "streaming_stateful_stats": """
            SELECT event_type AS key, count(*) AS record_count,
                   CAST(sum(trunc(value * 1000000)::BIGINT) AS BIGINT)
                       AS value_sum_micros
            FROM events GROUP BY event_type
        """,
        "streaming_enriched_counts": """
            WITH dim(event_type, category) AS (
                VALUES ('click', 'engagement'), ('view', 'engagement'),
                       ('purchase', 'conversion'), ('signup', 'conversion'),
                       ('error', 'ops')
            )
            SELECT coalesce(d.category, 'other') AS category,
                   count(*) AS record_count,
                   CAST(sum(trunc(e.value * 1000000)::BIGINT) AS BIGINT)
                       AS value_sum_micros
            FROM events e LEFT JOIN dim d USING (event_type)
            GROUP BY 1
        """,
        "cdc_merge_upsert": """
            WITH base AS (
                SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
            ), upd AS (
                SELECT o_orderkey, 'U' AS o_orderstatus,
                       o_totalprice + 1000 AS o_totalprice,
                       (o_orderkey % 13 = 0) AS _deleted
                FROM orders WHERE o_orderkey % 7 = 0
                UNION ALL
                SELECT o_orderkey + 100000000, 'N', 42.0, FALSE
                FROM orders WHERE o_orderkey % 17 = 0
            ), merged AS (
                SELECT b.* FROM base b
                ANTI JOIN upd u ON b.o_orderkey = u.o_orderkey
                UNION ALL
                SELECT o_orderkey, o_orderstatus, o_totalprice
                FROM upd WHERE NOT coalesce(_deleted, FALSE)
            )
            SELECT o_orderstatus, count(*) AS n_orders,
                   round(sum(o_totalprice::DECIMAL(20,6)), 2)::DOUBLE
                       AS total_price
            FROM merged GROUP BY o_orderstatus
        """,
        "scd2_user_history": """
            SELECT user_id, event_type, event_id,
                   ts AS valid_from,
                   lead(ts) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id
                   ) AS valid_to,
                   lead(ts) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id
                   ) IS NULL AS is_current
            FROM events WHERE user_id < 50
        """,
        "event_transitions": """
            WITH seq AS (
                SELECT user_id, event_type,
                       lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev_type
                FROM events
            )
            SELECT prev_type, event_type AS next_type,
                   count(*) AS transition_count
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY 1, 2
        """,
        "corpus_datacard": rf"""
            WITH t AS (
                SELECT source, lang, {_TOKS} AS toks FROM documents
            ), prof AS (
                SELECT source, lang,
                       len(toks)::BIGINT AS nt,
                       floor((
                           0.4::DOUBLE * least(len(toks)::DOUBLE / 100.0::DOUBLE, 1.0::DOUBLE)
                         + 0.3::DOUBLE * (len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE)
                         + 0.3::DOUBLE * (1.0::DOUBLE
                               - len(list_filter(toks, x -> x IN {_STOP_SQL}))::DOUBLE
                                 / len(toks)::DOUBLE)
                           ) * 10000.0 + 0.5) / 10000.0 AS q
                FROM t
            )
            SELECT source,
                   count(*) AS n_docs,
                   CAST(sum(nt) AS BIGINT) AS total_tokens,
                   count(DISTINCT lang) AS n_langs,
                   floor(sum(q::DECIMAL(18,4))::DOUBLE / count(*)
                         * 10000.0 + 0.5) / 10000.0 AS avg_quality,
                   min(nt) AS min_tokens,
                   max(nt) AS max_tokens
            FROM prof GROUP BY source
        """,
        "mad_outliers": """
            WITH med AS (
                SELECT event_type, quantile_cont(value, 0.5) AS med
                FROM events GROUP BY 1
            ), d AS (
                SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
                FROM events e JOIN med m USING (event_type)
            ), mad AS (
                SELECT event_type, quantile_cont(adev, 0.5) AS mad
                FROM d GROUP BY 1
            )
            SELECT d.event_type,
                   count(*) AS record_count,
                   CAST(sum(CASE WHEN d.adev > 3.0 * mad.mad
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_outliers,
                   round(max(d.med), 4) AS median_value,
                   round(max(mad.mad), 4) AS mad_value
            FROM d JOIN mad USING (event_type) GROUP BY d.event_type
        """,
        "funnel_over_cdc": """
            WITH seg AS (
                SELECT user_id,
                       CASE WHEN event_type = 'error' THEN 'deleted'
                            ELSE 'live' END AS segment
                FROM (
                    SELECT user_id, event_type, row_number() OVER (
                        PARTITION BY user_id ORDER BY event_id DESC
                    ) AS rn
                    FROM events
                ) WHERE rn = 1
            ),
            ev AS (
                SELECT e.user_id, e.ts, e.event_type, s.segment
                FROM events e JOIN seg s USING (user_id)
            ),
            m0 AS (
                SELECT segment, user_id,
                       min(CASE WHEN event_type = 'signup' THEN ts END) AS t0
                FROM ev GROUP BY 1, 2
            ),
            m1 AS (
                SELECT e.segment, e.user_id, m0.t0,
                       min(CASE WHEN e.event_type = 'click'
                                 AND e.ts >= m0.t0 THEN e.ts END) AS t1
                FROM ev e JOIN m0 ON e.user_id = m0.user_id
                GROUP BY 1, 2, 3
            ),
            m2 AS (
                SELECT e.segment, e.user_id, m1.t0, m1.t1,
                       min(CASE WHEN e.event_type = 'purchase'
                                 AND e.ts >= m1.t1 THEN e.ts END) AS t2
                FROM ev e JOIN m1 ON e.user_id = m1.user_id
                GROUP BY 1, 2, 3, 4
            )
            , counts AS (
                SELECT segment, 'stage0_signup' AS stage, count(t0) AS users
                FROM m2 GROUP BY 1
                UNION ALL
                SELECT segment, 'stage1_click', count(t1) FROM m2 GROUP BY 1
                UNION ALL
                SELECT segment, 'stage2_purchase', count(t2) FROM m2 GROUP BY 1
            )
            -- segments x stages spine: an EMPTY segment still yields its
            -- three stage rows with users=0, mirroring funnel_stages'
            -- global aggregate on an empty frame (data-independent shape)
            SELECT s.segment, st.stage,
                   CAST(COALESCE(c.users, 0) AS BIGINT) AS users
            FROM (VALUES ('live'), ('deleted')) AS s(segment)
            CROSS JOIN (VALUES ('stage0_signup'), ('stage1_click'),
                               ('stage2_purchase')) AS st(stage)
            LEFT JOIN counts c
              ON c.segment = s.segment AND c.stage = st.stage
        """,
        "funnel_conversion": """
            WITH m0 AS (
                SELECT user_id,
                       min(CASE WHEN event_type = 'signup' THEN ts END) AS t0
                FROM events GROUP BY user_id
            ), m1 AS (
                SELECT e.user_id, m0.t0,
                       min(CASE WHEN e.event_type = 'click'
                                 AND e.ts >= m0.t0 THEN e.ts END) AS t1
                FROM events e JOIN m0 USING (user_id)
                GROUP BY e.user_id, m0.t0
            ), m2 AS (
                SELECT e.user_id, m1.t0, m1.t1,
                       min(CASE WHEN e.event_type = 'purchase'
                                 AND e.ts >= m1.t1 THEN e.ts END) AS t2
                FROM events e JOIN m1 USING (user_id)
                GROUP BY e.user_id, m1.t0, m1.t1
            )
            SELECT 'stage0_signup' AS stage, count(t0) AS users FROM m2
            UNION ALL
            SELECT 'stage1_click', count(t1) FROM m2
            UNION ALL
            SELECT 'stage2_purchase', count(t2) FROM m2
        """,
        "retention_cohorts": """
            WITH f AS (
                SELECT user_id, ts,
                       min(ts) OVER (PARTITION BY user_id) AS first_ts
                FROM events
            ), m AS (
                SELECT user_id,
                       floor(epoch(first_ts))::BIGINT // 604800 AS cohort_week,
                       (floor(epoch(ts))::BIGINT
                        - floor(epoch(first_ts))::BIGINT) // 604800
                           AS week_offset
                FROM f
            )
            SELECT cohort_week, week_offset,
                   count(DISTINCT user_id) AS active_users
            FROM m GROUP BY 1, 2
        """,
        "benchmark_contamination": r"""
            WITH toks AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
                FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
            ), eval_sh AS (
                SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
            ), train_sh AS (
                SELECT doc_id, shingle FROM sh WHERE doc_id % 97 != 0
            ), per_doc AS (
                SELECT t.doc_id, count(*) AS n_shingles,
                       CAST(sum(CASE WHEN e.shingle IS NOT NULL
                                     THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_overlap
                FROM train_sh t LEFT JOIN eval_sh e USING (shingle)
                GROUP BY t.doc_id
            )
            SELECT doc_id, n_shingles, n_overlap,
                   round(n_overlap / n_shingles, 4) AS overlap_ratio
            FROM per_doc WHERE n_overlap > 0
        """,
        "point_in_time_features": """
            WITH hist AS (
                SELECT user_id, event_id AS click_id, ts AS valid_from,
                       lead(ts) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS valid_to
                FROM events WHERE event_type = 'click'
            ), p AS (
                SELECT user_id, event_id AS purchase_id, ts
                FROM events WHERE event_type = 'purchase'
            )
            SELECT p.purchase_id, p.user_id, h.click_id
            FROM p JOIN hist h
              ON p.user_id = h.user_id
             AND p.ts >= h.valid_from
             AND (h.valid_to IS NULL OR p.ts < h.valid_to)
        """,
        "pii_redaction": r"""
            WITH injected AS (
                SELECT doc_id,
                       text || ' contact user' || doc_id::VARCHAR
                            || '@mail.example.com'
                            || CASE WHEN doc_id % 3 = 0
                                    THEN ' call 555-010-' || lpad(doc_id::VARCHAR, 4, '0')
                                    ELSE '' END
                            || CASE WHEN doc_id % 5 = 0
                                    THEN ' from 192.168.' || (doc_id % 256)::VARCHAR || '.1'
                                    ELSE '' END AS text
                FROM documents
            )
            SELECT doc_id,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(
                               text,
                               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                               '<EMAIL>', 'g'),
                           '\+?[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                       '<IP>', 'g') AS redacted
            FROM injected
        """,
        "repetition_stats": r"""
            WITH toks AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                FROM documents
            ), grams AS (
                SELECT doc_id, t[i] || ' ' || t[i+1] AS g
                FROM toks, UNNEST(range(1, greatest(len(t), 1))) AS u(i)
            ), per_gram AS (
                SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2
            )
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS total_ngrams,
                   max(c) AS top_ngram_count,
                   round(max(c) / sum(c), 4) AS repetition_ratio
            FROM per_gram GROUP BY doc_id
        """,
        "sequence_packing": r"""
            WITH toks AS (
                SELECT lang, doc_id,
                       len(string_split_regex(trim(text), '\s+')) AS n_tok
                FROM documents
            ), c AS (
                SELECT *, sum(n_tok) OVER (
                    PARTITION BY lang ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING
                ) AS cum FROM toks
            ), s AS (
                SELECT lang, doc_id, n_tok,
                       floor((cum - 1) / 512)::BIGINT AS seq_id
                FROM c
            )
            SELECT lang, seq_id, count(*) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                   min(doc_id) AS first_doc, max(doc_id) AS last_doc
            FROM s GROUP BY 1, 2
        """,
        # the fixture is deterministic column arithmetic over range(n),
        # re-derived here term-for-term (same IEEE expression order) so
        # DuckDB rebuilds the exact rows Spark synthesizes
        "air_quality_summary": """
            WITH base AS (
                SELECT i,
                    (['London','Paris','Delhi','Lima','Oslo'])[(i % 5 + 1)::int]
                        AS location,
                    CASE WHEN i % 11 = 0
                         THEN ([0.0, 10.0, 20.0, 30.0])[(i % 4 + 1)::int]
                         ELSE (i % 650) / 10.0 - 20.0 END AS temp_c,
                    (i % 101)::int AS humidity,
                    make_timestamp(
                        (1704067200 + (i % 1000) * 3600 + i % 60) * 1000000
                    ) AS ts,
                    CASE WHEN i % 13 = 0 THEN 0.0
                         ELSE (i % 400) / 1.7 END AS co,
                    (i % 300) / 2.3 AS no2,
                    (i % 200) / 1.9 AS o3,
                    (i % 100) / 3.1 AS so2,
                    CASE WHEN i % 7 = 0
                         THEN ([12.0, 35.0, 55.0, 150.0, 250.0])[(i % 5 + 1)::int]
                         WHEN i % 13 = 0 THEN 0.0
                         ELSE (i % 4000) / 10.0 END AS pm2_5,
                    (i % 500) / 1.3 AS pm10
                FROM range(1000) t(i)
            ), withnulls AS (
                SELECT i,
                    CASE WHEN i % 97 = 0 THEN NULL ELSE location END AS location,
                    CASE WHEN i % 89 = 0 THEN NULL ELSE temp_c END AS temp_c,
                    CASE WHEN i % 83 = 0 THEN NULL ELSE ts END AS ts,
                    humidity, co, no2, o3, so2, pm2_5, pm10
                FROM base
            ), unioned AS (
                SELECT * EXCLUDE (i) FROM withnulls
                UNION ALL SELECT * EXCLUDE (i) FROM withnulls WHERE i = 1
                UNION ALL SELECT * EXCLUDE (i) FROM withnulls WHERE i = 1
            ), cleaned AS (
                SELECT DISTINCT * FROM unioned
            ), filtered AS (
                SELECT * FROM cleaned
                WHERE location IS NOT NULL AND temp_c IS NOT NULL
                  AND ts IS NOT NULL
            ), transformed AS (
                SELECT *,
                    CASE WHEN pm2_5 <= 12 THEN 'Good'
                         WHEN pm2_5 <= 35 THEN 'Moderate'
                         WHEN pm2_5 <= 55 THEN 'Unhealthy for Sensitive Groups'
                         WHEN pm2_5 <= 150 THEN 'Unhealthy'
                         WHEN pm2_5 <= 250 THEN 'Very Unhealthy'
                         ELSE 'Hazardous' END AS air_quality_index,
                    round(pm2_5 * 0.3 + pm10 * 0.25 + no2 * 0.2
                          + o3 * 0.15 + co * 0.05 + so2 * 0.05, 2)
                        AS pollution_score
                FROM filtered
            )
            SELECT location, air_quality_index,
                   count(*) AS record_count,
                   floor(sum(temp_c::DECIMAL(20,10))::DOUBLE / count(*)
                         * 100.0 + 0.5) / 100.0 AS avg_temp_c,
                   floor(sum(humidity::DECIMAL(20,10))::DOUBLE / count(*)
                         * 100.0 + 0.5) / 100.0 AS avg_humidity,
                   floor(sum(pm2_5::DECIMAL(20,10))::DOUBLE / count(*)
                         * 100.0 + 0.5) / 100.0 AS avg_pm2_5,
                   floor(sum(pollution_score::DECIMAL(20,10))::DOUBLE / count(*)
                         * 100.0 + 0.5) / 100.0 AS avg_pollution_score
            FROM transformed GROUP BY 1, 2
        """,
        "levenshtein_near_dup": r"""
            WITH names AS (
                SELECT DISTINCT p_name AS name FROM part
                WHERE p_name IS NOT NULL
            ), blocked AS (
                SELECT name,
                       string_split_regex(trim(name), '\s+')[-1] AS block
                FROM names
            )
            SELECT a.name AS name_a, b.name AS name_b,
                   levenshtein(a.name, b.name) AS distance
            FROM blocked a JOIN blocked b
              ON a.block = b.block AND a.name < b.name
            WHERE levenshtein(a.name, b.name) <= 3
        """,
        "grouping_sets_qty": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS record_count,
                   (sum(l_quantity::DECIMAL(20,6)))::DOUBLE AS value_sum,
                   grouping(l_returnflag)::INT AS grp_l_returnflag,
                   grouping(l_linestatus)::INT AS grp_l_linestatus
            FROM lineitem
            GROUP BY GROUPING SETS (
                (l_returnflag, l_linestatus), (l_returnflag), ()
            )
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                       AS sum_charge,
                   round(avg(l_quantity), 2) AS avg_qty,
                   round(avg(l_extendedprice), 2) AS avg_price,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q3": """
            SELECT l_orderkey, o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1997-01-01'
              AND l_shipdate > TIMESTAMP '1997-01-01'
            GROUP BY l_orderkey, o_orderpriority
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "part_type_revenue": """
            WITH t AS (
                SELECT p_type,
                       round(sum((l_extendedprice * (1 - l_discount))
                                 ::DECIMAL(20,6)), 2)::DOUBLE AS revenue,
                       count(*) AS line_count
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1997-01-01'
                GROUP BY p_type
            )
            SELECT p_type, revenue, line_count,
                   round(100 * revenue /
                         (SELECT sum(revenue::DECIMAL(20,2))::DOUBLE FROM t), 4)
                       AS revenue_share_pct
            FROM t
        """,
        "streaming_dedup_keys": """
            SELECT DISTINCT user_id, event_type FROM events
        """,
        "streaming_click_purchase": """
            SELECT c.user_id, c.event_id AS click_id,
                   p.event_id AS purchase_id
            FROM events c JOIN events p
              ON c.user_id = p.user_id
             AND c.event_type = 'click' AND p.event_type = 'purchase'
             AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
             AND CAST(p.ts AS TIMESTAMP)
                 <= CAST(c.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
        """,
        "session_window_stats": """
            WITH flagged AS (
                SELECT user_id, ts, value,
                       CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER win IS NULL
                                 OR CAST(ts AS TIMESTAMP)
                                    - lag(CAST(ts AS TIMESTAMP)) OVER win
                                    > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS boundary
                FROM events
                WINDOW win AS (PARTITION BY user_id ORDER BY ts)
            ), numbered AS (
                SELECT *, sum(boundary) OVER (
                    PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS sid
                FROM flagged
            )
            SELECT min(CAST(ts AS TIMESTAMP)) AS session_start,
                   max(CAST(ts AS TIMESTAMP)) + INTERVAL 30 MINUTE
                       AS session_end,
                   user_id,
                   count(*) AS event_count,
                   round(sum(value::DECIMAL(20,6)), 2)::DOUBLE AS value_sum
            FROM numbered
            GROUP BY user_id, sid
        """,
        "above_avg_customers": """
            SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
            FROM customer c
            WHERE c.c_acctbal > (
                SELECT avg(c2.c_acctbal) FROM customer c2
                WHERE c2.c_nationkey = c.c_nationkey
            )
        """,
        "schema_evolution_roundtrip": """
            SELECT event_type,
                   count(*) AS record_count,
                   CAST(sum(CASE WHEN event_id % 2 = 1
                                   AND user_id IS NOT NULL
                              THEN 1 ELSE 0 END)
                        AS BIGINT) AS rows_with_user,
                   (sum(value::DECIMAL(20,6)))::DOUBLE AS value_sum
            FROM events GROUP BY event_type
        """,
        "cluster_safe_split": rf"""
            WITH RECURSIVE {_SHINGLE_CTES},
            sig AS (
                SELECT doc_id,
                   {_MINHASH_AGGS}
                FROM sh GROUP BY doc_id
            ),
            bands AS (
            {_BAND_SELECTS}
            ),
            pairs AS (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.bucket = b.bucket
                 AND a.doc_id < b.doc_id
            ),
            sym AS (
                SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION
                SELECT doc_b, doc_a FROM pairs
            ),
            reach(v, r) AS (
                SELECT a, b FROM sym
                UNION
                SELECT reach.v, sym.b FROM reach JOIN sym ON reach.r = sym.a
            ),
            cc AS (
                SELECT v AS doc_id, least(v, min(r)) AS cluster_id
                FROM reach GROUP BY v
            ),
            tagged AS (
                SELECT d.source,
                       coalesce(cc.cluster_id, d.doc_id) AS unit
                FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
            )
            SELECT source,
                   CASE WHEN ('0x' || substr(
                            md5('cluster-split:v1' || unit::VARCHAR), 1, 7)
                        )::BIGINT % 100 < 10
                        THEN 'test' ELSE 'train' END AS split,
                   count(*) AS n_docs,
                   count(DISTINCT unit) AS n_units
            FROM tagged GROUP BY 1, 2
        """,
        "incremental_dedup": r"""
            WITH tagged AS (
                SELECT doc_id,
                       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
                           AS fp,
                       ('0x' || substr(
                            md5('ingest:v1' || doc_id::VARCHAR), 1, 7)
                       )::BIGINT % 100 AS bkt
                FROM documents WHERE text IS NOT NULL
            ),
            survivors AS (
                SELECT fp AS fingerprint, min(doc_id) AS doc_id
                FROM tagged WHERE bkt < 20 GROUP BY fp
            )
            SELECT doc_id, fingerprint FROM survivors
            WHERE fingerprint NOT IN (
                SELECT fp FROM tagged WHERE bkt >= 20
            )
        """,
        "oov_rate": rf"""
            WITH wc AS (
                SELECT tok, count(*) AS cnt
                FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
                GROUP BY tok
            ),
            v AS (
                SELECT list(tok) AS vl FROM (
                    SELECT tok FROM wc ORDER BY cnt DESC, tok LIMIT 20
                )
            ),
            t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
            SELECT doc_id,
                   CAST(len(toks) AS INTEGER) AS n_tokens,
                   CAST(len(list_filter(toks, x -> NOT list_contains(vl, x)))
                        AS INTEGER) AS n_oov,
                   floor(len(list_filter(toks, x -> NOT list_contains(vl, x)))::DOUBLE
                         / len(toks)::DOUBLE * 10000.0 + 0.5) / 10000.0
                       AS oov_frac
            FROM t, v
        """,
        "dedup_graph_stats": rf"""
            WITH {_SHINGLE_CTES},
            sig AS (
                SELECT doc_id,
                   {_MINHASH_AGGS}
                FROM sh GROUP BY doc_id
            ),
            bands AS (
            {_BAND_SELECTS}
            ),
            e AS (
                SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.bucket = b.bucket
                 AND a.doc_id < b.doc_id
            ),
            deg AS (
                SELECT v, count(*) AS deg FROM (
                    SELECT a AS v FROM e UNION ALL SELECT b FROM e
                ) GROUP BY v
            ),
            tri AS (
                SELECT count(*) AS n_triangles
                FROM e ab
                JOIN e bc ON ab.b = bc.a
                JOIN e ac ON ac.a = ab.a AND ac.b = bc.b
            )
            SELECT (SELECT count(*) FROM deg) AS n_vertices,
                   (SELECT count(*) FROM e) AS n_edges,
                   (SELECT max(deg) FROM deg) AS max_degree,
                   n_triangles
            FROM tri
        """,
        "grouped_deciles": """
            WITH t AS (
                SELECT event_type, value,
                       ntile(10) OVER (
                           PARTITION BY event_type ORDER BY value, event_id
                       ) AS bin
                FROM events
            )
            SELECT event_type, CAST(bin AS INTEGER) AS bin,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   min(value) AS min_value,
                   max(value) AS max_value,
                   CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
                        AS BIGINT) AS value_sum_micros
            FROM t GROUP BY 1, 2
        """,
        "running_distinct_types": f"""
            WITH f AS (
                SELECT event_id, user_id, {_TS} AS tsx,
                       CASE WHEN row_number() OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts, event_id
                       ) = 1 THEN 1 ELSE 0 END AS first_seen
                FROM events
            )
            SELECT event_id, user_id,
                   epoch_us(tsx) AS ts_us,
                   CAST(sum(first_seen) OVER (
                       PARTITION BY user_id ORDER BY tsx, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS distinct_so_far
            FROM f
        """,
        "multimodal_frames": """
            WITH ids AS (
                SELECT range AS asset_id, 'image' AS modality,
                       54 + ((16 + range % 17 + 3) // 4 * 4)
                            * (8 + range % 11) AS total
                FROM range(48)
                UNION ALL
                SELECT range, 'audio',
                       44 + (100 + range * 7)
                            * (CASE WHEN range % 2 = 0 THEN 1 ELSE 4 END)
                FROM range(16)
            ),
            f AS (
                SELECT asset_id, modality, i AS frame_index,
                       least(greatest(total // 4, 1),
                             greatest(total - i * greatest(total // 4, 1), 0))
                           AS frame_len
                FROM ids, UNNEST([0, 1, 2, 3]) AS u(i)
            )
            SELECT asset_id, modality,
                   CAST(frame_index AS INTEGER) AS frame_index,
                   CAST(frame_len AS INTEGER) AS frame_len
            FROM f WHERE frame_len > 0
        """,
        "multimodal_resized": """
            SELECT range AS asset_id, 'image' AS modality,
                   CAST(32 AS INTEGER) AS payload_len,
                   CAST(8 AS INTEGER) AS width,
                   CAST(4 AS INTEGER) AS height
            FROM range(48)
        """,
        "label_centroids": """
            SELECT label,
                   CAST(i - 1 AS INTEGER) AS dim,
                   count(*) AS n_vectors,
                   CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                                 AS BIGINT))
                        AS BIGINT) AS component_sum_micros
            FROM embeddings,
                 UNNEST(range(1, len(embedding) + 1)) AS u(i)
            GROUP BY 1, 2
        """,
        "corpus_pipeline_fuzzy": rf"""
            WITH RECURSIVE {_SHINGLE_CTES},
            sig AS (
                SELECT doc_id,
                   {_MINHASH_AGGS}
                FROM sh GROUP BY doc_id
            ),
            bands AS (
            {_BAND_SELECTS}
            ),
            pairs AS (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.bucket = b.bucket
                 AND a.doc_id < b.doc_id
            ),
            sym AS (
                SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION
                SELECT doc_b, doc_a FROM pairs
            ),
            reach(v, r) AS (
                SELECT a, b FROM sym
                UNION
                SELECT reach.v, sym.b FROM reach JOIN sym ON reach.r = sym.a
            ),
            cc AS (
                SELECT v AS doc_id, least(v, min(r)) AS cluster_id
                FROM reach GROUP BY v
            ),
            q AS (
                SELECT doc_id, floor((
                    0.4::DOUBLE * least(len(t)::DOUBLE / 100.0::DOUBLE, 1.0::DOUBLE)
                  + 0.3::DOUBLE * (len(list_distinct(t))::DOUBLE / len(t)::DOUBLE)
                  + 0.3::DOUBLE * (1.0::DOUBLE
                        - len(list_filter(t, x -> x IN {_STOP_SQL}))::DOUBLE
                          / len(t)::DOUBLE)
                  ) * 10000.0 + 0.5) / 10000.0 AS quality
                FROM toks
            ),
            j AS (
                SELECT cc.cluster_id, cc.doc_id, q.quality
                FROM cc JOIN q ON cc.doc_id = q.doc_id
            ),
            winners AS (
                SELECT doc_id FROM (
                    SELECT doc_id, row_number() OVER (
                        PARTITION BY cluster_id ORDER BY quality DESC, doc_id
                    ) AS rn FROM j
                ) WHERE rn = 1
            ),
            surv AS (
                SELECT d.doc_id, d.source FROM documents d
                WHERE d.doc_id NOT IN (SELECT doc_id FROM cc)
                   OR d.doc_id IN (SELECT doc_id FROM winners)
            ),
            g AS (
                SELECT doc_id,
                       len(t) AS n_words,
                       floor(list_aggregate(list_transform(t, x -> length(x)), 'sum')::DOUBLE
                             / len(t)::DOUBLE * 10000.0 + 0.5) / 10000.0 AS mean_word_len,
                       floor(len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                             / len(t)::DOUBLE * 10000.0 + 0.5) / 10000.0 AS alpha_frac,
                       len(list_filter({_GOPHER_SQL}, s -> list_contains(t, s))) AS stop_hits
                FROM toks
            ),
            gg AS (
                SELECT doc_id, n_words,
                       CASE WHEN n_words BETWEEN 5 AND 100000
                             AND mean_word_len BETWEEN 3.0 AND 10.0
                             AND alpha_frac >= 0.8
                             AND stop_hits >= 2
                       THEN 1 ELSE 0 END AS keep
                FROM g
            ),
            tagged AS (
                SELECT s.source, gg.n_words, gg.keep
                FROM surv s JOIN gg ON s.doc_id = gg.doc_id
            ),
            per_source AS (
                SELECT source,
                       count(*) AS n_survivors,
                       CAST(sum(CASE WHEN keep = 0 THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_quality_dropped,
                       CAST(sum(keep) AS BIGINT) AS n_kept,
                       CAST(sum(CASE WHEN keep = 1 THEN n_words ELSE 0 END) AS BIGINT)
                           AS tokens_kept
                FROM tagged GROUP BY source
            ),
            dd AS (
                SELECT d.source, count(*) AS n_dup_dropped
                FROM documents d
                WHERE d.doc_id IN (SELECT doc_id FROM cc)
                  AND d.doc_id NOT IN (SELECT doc_id FROM winners)
                GROUP BY d.source
            )
            SELECT p.source, p.n_survivors,
                   CAST(coalesce(dd.n_dup_dropped, 0) AS BIGINT) AS n_dup_dropped,
                   p.n_quality_dropped, p.n_kept, p.tokens_kept
            FROM per_source p LEFT JOIN dd ON p.source = dd.source
        """,
        "asof_time_to_convert": f"""
            WITH c AS (
                SELECT event_id AS click_id, user_id, {_TS} AS cts
                FROM events WHERE event_type = 'click'
            ),
            p AS (
                SELECT event_id AS purchase_id, user_id, {_TS} AS pts
                FROM events WHERE event_type = 'purchase'
                QUALIFY row_number() OVER (
                    PARTITION BY user_id, ts ORDER BY event_id DESC
                ) = 1
            )
            SELECT click_id, c.user_id,
                   epoch_us(cts) AS click_time_us,
                   purchase_id,
                   epoch_us(pts) AS purchase_time_us,
                   epoch_us(pts) - epoch_us(cts) AS wait_us
            FROM c ASOF JOIN p
              ON c.user_id = p.user_id AND c.cts <= p.pts
        """,
        "path_trigrams": """
            WITH t AS (
                SELECT event_type AS e1,
                       lead(event_type, 1) OVER w AS e2,
                       lead(event_type, 2) OVER w AS e3
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT e1, e2, e3, count(*) AS n_paths
            FROM t WHERE e3 IS NOT NULL
            GROUP BY 1, 2, 3
            ORDER BY n_paths DESC, e1, e2, e3 LIMIT 20
        """,
        "streaming_sliding_counts": """
            WITH w AS (
                SELECT event_type, value,
                       date_trunc('hour', ts) - o * INTERVAL 1 HOUR
                           AS window_start
                FROM events, UNNEST([0, 1]) AS u(o)
            )
            SELECT window_start,
                   window_start + INTERVAL 2 HOUR AS window_end,
                   event_type,
                   count(*) AS record_count,
                   round(sum(value::DECIMAL(20,6)), 2)::DOUBLE AS value_sum
            FROM w GROUP BY 1, 2, 3
        """,
        "streaming_late_data_drop": """
            WITH src AS (
                -- batch 1: 10:00:00 + i*36s, i in [0, 200)
                SELECT range AS i,
                       TIMESTAMP '2024-01-01 10:00:00'
                           + (range * 36) * INTERVAL 1 SECOND AS ts
                FROM range(200)
                UNION ALL
                -- batch 2: 11:50:00 + (i-200)s, i in [200, 250)
                SELECT range,
                       TIMESTAMP '2024-01-01 11:50:00'
                           + (range - 200) * INTERVAL 1 SECOND
                FROM range(200, 250)
                UNION ALL
                -- batch 3 survivors: only odd i (hour 12); the even-i
                -- hour-9 rows are watermark-dropped by the engine
                SELECT range,
                       TIMESTAMP '2024-01-01 12:00:00'
                           + (range - 250) * INTERVAL 1 SECOND
                FROM range(250, 350) WHERE range % 2 = 1
            )
            SELECT hour(ts) AS event_hour,
                   'type_' || (i % 3) AS event_type,
                   count(*) AS record_count,
                   CAST(sum(i) AS BIGINT) AS value_sum
            FROM src GROUP BY 1, 2
        """,
        "streaming_hourly_counts": """
            SELECT date_trunc('hour', ts) AS window_start,
                   date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
                   event_type,
                   count(*) AS record_count,
                   round(sum(value::DECIMAL(20,6)), 2)::DOUBLE AS value_sum
            FROM events GROUP BY 1, 2, 3
        """,
        "multimodal_features": """
            WITH assets AS (
                SELECT range AS asset_id, 'image' AS modality,
                       repeat(md5(range::VARCHAR), 8) AS payload
                FROM range(48)
                UNION ALL
                SELECT range, 'audio', repeat(md5(range::VARCHAR), 8)
                FROM range(16)
            ),
            f AS (
                SELECT modality, length(payload) AS payload_bytes,
                       ('0x' || substr(md5(payload), 7, 2)
                             || substr(md5(payload), 5, 2)
                             || substr(md5(payload), 3, 2)
                             || substr(md5(payload), 1, 2))::BIGINT AS f0_u4
                FROM assets
            )
            SELECT modality, count(*) AS asset_count,
                   round(avg(payload_bytes), 2) AS avg_payload_bytes,
                   CAST(sum(f0_u4) AS BIGINT) AS f0_checksum
            FROM f GROUP BY modality
        """,
        "ingest_metrics_passthrough": """
            SELECT event_type, count(*) AS record_count,
                   count(value) AS value_present
            FROM events GROUP BY event_type
            UNION ALL
            SELECT '__observed__', count(*), count(value) FROM events
        """,
        "json_scan_roundtrip": """
            WITH agg AS (
                SELECT o_orderstatus, count(*) AS n_orders,
                       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
                FROM orders GROUP BY o_orderstatus
            )
            SELECT *, 'enforced' AS branch FROM agg
            UNION ALL
            SELECT *, 'inferred' FROM agg
        """,
        "cache_fanout": f"""
            WITH clean AS (SELECT * FROM events WHERE value IS NOT NULL)
            SELECT event_type AS key, count(*) AS record_count,
                   (sum(value::DECIMAL(20,6)))::DOUBLE AS value_sum,
                   'type' AS branch
            FROM clean GROUP BY event_type
            UNION ALL
            SELECT hour({_TS})::VARCHAR, count(*),
                   (sum(value::DECIMAL(20,6)))::DOUBLE, 'hour'
            FROM clean GROUP BY 1
        """,
        "dead_letter_split": """
            WITH r AS (SELECT range AS i FROM range(300))
            SELECT 'k' || (i % 3)::VARCHAR AS kind,
                   count(*) AS record_count,
                   CAST(sum(i) AS BIGINT) AS id_sum
            FROM r WHERE i % 11 != 0 GROUP BY 1
            UNION ALL
            SELECT 'dead_letter', count(*), NULL
            FROM r WHERE i % 11 = 0
        """,
        "streaming_to_table_roundtrip": """
            SELECT event_type, count(*) AS record_count,
                   (sum(value::DECIMAL(20,6)))::DOUBLE AS value_sum
            FROM events GROUP BY event_type
        """,
        "http_ingest_simulated": """
            WITH r AS (
                SELECT range AS i,
                       ('0x' || substr(md5(range::VARCHAR), 1, 6))::BIGINT AS h
                FROM range(210) WHERE range % 7 != 0
            )
            SELECT 'City' || (i % 5)::VARCHAR AS location,
                   count(*) AS record_count,
                   CAST(sum(h % 101) AS BIGINT) AS humidity_sum,
                   floor(sum(((h % 650) / 10.0 - 20.0)::DECIMAL(20,10))::DOUBLE
                         / count(*) * 100.0 + 0.5) / 100.0 AS avg_temp_c,
                   CAST(sum(CASE WHEN i % 5 = 0 THEN 1
                                 WHEN h % 4000 = 0 THEN 1
                                 ELSE 0 END) AS BIGINT) AS zero_pm_docs
            FROM r GROUP BY 1
        """,
        "ngram_containment": rf"""
            WITH {_SHINGLE_CTES},
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            pairs AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            scored AS (
                SELECT doc_a, doc_b, common,
                       floor(common::DOUBLE / sa.n::DOUBLE * 10000.0 + 0.5)
                           / 10000.0 AS containment_a,
                       floor(common::DOUBLE / sb.n::DOUBLE * 10000.0 + 0.5)
                           / 10000.0 AS containment_b
                FROM pairs
                JOIN sizes sa ON doc_a = sa.doc_id
                JOIN sizes sb ON doc_b = sb.doc_id
            )
            SELECT * FROM scored
            WHERE containment_a >= 0.5 OR containment_b >= 0.5
        """,
        "lsh_rescore_tfidf": rf"""
            WITH {_SHINGLE_CTES},
            sig AS (
                SELECT doc_id,
                   {_MINHASH_AGGS}
                FROM sh GROUP BY doc_id
            ),
            bands AS (
            {_BAND_SELECTS}
            ),
            cand AS (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.bucket = b.bucket
                 AND a.doc_id < b.doc_id
            ),
            tk AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY 1, 2),
            dfq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
            nd AS (SELECT count(doc_id) AS n_docs FROM documents)
            SELECT c.doc_a, c.doc_b,
                   CAST(sum((a.tf * b.tf * n_docs * n_docs * 1000000)
                            // (doc_freq * doc_freq)) AS BIGINT)
                       AS score_micros,
                   count(*) AS shared_terms
            FROM cand c
            JOIN tf a ON a.doc_id = c.doc_a
            JOIN tf b ON b.doc_id = c.doc_b AND b.term = a.term
            JOIN dfq ON dfq.term = a.term
            CROSS JOIN nd
            GROUP BY 1, 2
        """,
        "table_profile": rf"""
            {_PROFILE_SQL}
        """,
        # sketch_bounds: the oracle re-derives the EXACT side (distinct
        # counts; value at rank ceil(q*n) per group) and asserts
        # within_bound = 1 — if a Spark sketch ever violates its
        # advertised error bound, the Spark side emits 0 there and the
        # hash fails.  value-at-rank is deterministic because it
        # depends only on the group's value multiset (row_number tie
        # order can't change which value sits at a rank).
        "sketch_bounds": """
            WITH du AS (
                SELECT event_type,
                       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_val
                FROM events GROUP BY event_type
            ),
            nn AS (
                SELECT event_type, count(*) AS n
                FROM events WHERE value IS NOT NULL GROUP BY event_type
            ),
            ranked AS (
                SELECT event_type, value, row_number() OVER (
                    PARTITION BY event_type ORDER BY value
                ) AS rn
                FROM events WHERE value IS NOT NULL
            ),
            pct AS (
                SELECT n.event_type, m.metric, r.value
                FROM nn n
                JOIN (VALUES ('p50', 0.5), ('p95', 0.95)) m(metric, q)
                  ON true
                JOIN ranked r
                  ON r.event_type = n.event_type
                 AND r.rn = CAST(ceil(m.q * n.n) AS BIGINT)
            )
            SELECT event_type, 'distinct_users' AS metric, exact_val,
                   1 AS within_bound
            FROM du
            UNION ALL
            SELECT event_type, metric,
                   CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)
                       AS exact_val,
                   1 AS within_bound
            FROM pct
        """,
        "key_skew_report": """
            WITH counts AS (
                SELECT user_id AS key, count(*) AS cnt
                FROM events GROUP BY user_id
            ),
            tot AS (
                SELECT CAST(sum(cnt) AS BIGINT) AS t,
                       CAST(count(*) AS BIGINT) AS nk FROM counts
            )
            SELECT key, cnt,
                   CAST(floor(cnt::DOUBLE / t::DOUBLE * 1000000.0 + 0.5)
                        AS BIGINT) AS share_micros,
                   CAST(floor(cnt::DOUBLE * nk::DOUBLE / t::DOUBLE
                              * 1000000.0 + 0.5) AS BIGINT)
                       AS skew_ratio_micros
            FROM counts, tot
            ORDER BY cnt DESC, key LIMIT 10
        """,
        "sink_orc_roundtrip": """
            SELECT event_type, count(*) AS record_count,
                   (sum(value::DECIMAL(20,6)))::DOUBLE AS value_sum
            FROM events GROUP BY event_type
        """,
        "sink_partitioned_roundtrip": """
            SELECT event_type, count(*) AS record_count,
                   (sum(value::DECIMAL(20,6)))::DOUBLE AS value_sum
            FROM events
            WHERE event_type IN ('click', 'purchase')
            GROUP BY event_type
        """,
        "sink_bucketed_join": """
            SELECT c_mktsegment, count(*) AS n_orders,
                   floor((sum(o_totalprice::DECIMAL(20,6)))::DOUBLE
                         * 100.0 + 0.5) / 100.0 AS total_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "sink_csv_roundtrip": """
            SELECT o_orderstatus, count(*) AS n_orders
            FROM orders GROUP BY o_orderstatus
        """,
        "multimodal_decode": """
            SELECT range AS asset_id, 'image' AS modality, 'bmp' AS format,
                   (16 + range % 17)::INTEGER AS width,
                   (8 + range % 11)::INTEGER AS height,
                   0::INTEGER AS sample_rate,
                   0::INTEGER AS channels,
                   0::INTEGER AS n_frames
            FROM range(48)
            UNION ALL
            SELECT range, 'audio', 'wav', 0, 0,
                   (8000 + 1000 * (range % 5))::INTEGER,
                   (1 + range % 2)::INTEGER,
                   (100 + range * 7)::INTEGER
            FROM range(16)
            UNION ALL
            SELECT range + 1000000, 'image', 'png',
                   (32 + range % 13)::INTEGER,
                   (16 + range % 7)::INTEGER,
                   0, 3, 0
            FROM range(24)
            UNION ALL
            SELECT range + 2000000, 'image', 'gif',
                   (10 + range % 21)::INTEGER,
                   (5 + range % 9)::INTEGER,
                   0, 0, 0
            FROM range(24)
            UNION ALL
            SELECT range + 3000000, 'image', 'jpeg',
                   (100 + range % 31)::INTEGER,
                   (50 + range % 17)::INTEGER,
                   0, 3, 0
            FROM range(24)
            UNION ALL
            SELECT range + 4000000, 'image', 'tiff',
                   (20 + range % 29)::INTEGER,
                   (12 + range % 15)::INTEGER,
                   0, 0, 0
            FROM range(24)
            UNION ALL
            SELECT range + 5000000, 'audio', 'flac', 0, 0,
                   (8000 + 441 * (range % 9))::INTEGER,
                   (1 + range % 2)::INTEGER,
                   (50 + 3 * range)::INTEGER
            FROM range(24)
        """,
        "corpus_pipeline": rf"""
            WITH {_CORPUS_KEPT_CTES}
            SELECT source, count(*) AS kept_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                   round(avg(quality), 4) AS avg_quality
            FROM kept GROUP BY source
        """,
        # prepare_corpus(normalize=True): the SAME kept-chain over a
        # stage-0 normalizing CTE (fold-table SQL generated from the
        # same tables as the Spark expression) — normalization runs
        # BEFORE the dedup fingerprint, so survivors themselves differ
        # from corpus_pipeline's and any stage-order drift flips them.
        # Quality mean in exact integer 1e-4 units (half-up integer
        # division), see the Spark twin's comment on the round(avg)
        # tie-boundary drift this replaces.
        "corpus_pipeline_normalized": rf"""
            WITH {_CORPUS_KEPT_CTES_NORM}
            SELECT source, count(*) AS kept_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                   CAST((2 * sum(CAST(floor(quality * 10000 + 0.5) AS BIGINT))
                         + count(*)) // (2 * count(*)) AS BIGINT)
                       AS avg_quality_q4
            FROM kept GROUP BY source
        """,
        "corpus_assembly": rf"""
            WITH {_CORPUS_KEPT_CTES},
            n AS (
                SELECT source, count(*) AS cnt FROM kept
                WHERE source IN ('src0', 'src1', 'src2') GROUP BY source
            ),
            w(source, wt) AS (VALUES ('src0', 5), ('src1', 3), ('src2', 2)),
            tt AS (
                SELECT min((COALESCE(n.cnt, 0) * 10) // w.wt) AS t_max
                FROM w LEFT JOIN n USING (source)
            ),
            q AS (SELECT w.source, (w.wt * tt.t_max) // 10 AS quota FROM w, tt),
            rankedm AS (
                SELECT k.doc_id, k.source, k.n_tokens,
                       row_number() OVER (
                           PARTITION BY k.source
                           ORDER BY md5('mix:v1' || k.doc_id::VARCHAR), k.doc_id
                       ) AS rn
                FROM kept k WHERE k.source IN ('src0', 'src1', 'src2')
            ),
            mixed AS (
                SELECT r.doc_id, r.source, r.n_tokens
                FROM rankedm r JOIN q USING (source) WHERE r.rn <= q.quota
            ),
            budget AS (
                SELECT *,
                       sum(n_tokens) OVER (ORDER BY md5('budget:v1' || doc_id::VARCHAR),
                                           doc_id ROWS UNBOUNDED PRECEDING) AS cum
                FROM mixed
            ),
            fitted AS (SELECT * FROM budget WHERE cum <= 1200)
            SELECT source,
                   CAST(('0x' || substr(
                       md5('shard:v1' || doc_id::VARCHAR), 1, 7)
                   )::BIGINT % 4 AS INTEGER) AS shard,
                   count(*) AS doc_count,
                   CAST(sum(doc_id) AS BIGINT) AS id_checksum,
                   CAST(sum(n_tokens) AS BIGINT) AS token_total
            FROM fitted GROUP BY 1, 2
        """,
        "tpch_q5": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
                         AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
            ORDER BY revenue DESC
        """,
        "tpch_q6": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "rolling_fingerprints": rf"""
            SELECT doc_id,
                   list_reduce(
                       list_prepend(0::BIGINT, list_transform({_TOKS},
                           t -> ('0x' || substr(md5(t), 1, 7))::BIGINT)),
                       (a, b) -> (a * 31 + b) % 1000000007
                   ) AS rolling_fp
            FROM documents
        """,
        "nn_label_confusion": """
            WITH scored AS (
                SELECT a.vec_id AS qid, a.label AS label,
                       b.vec_id AS cid, b.label AS nn_label,
                       floor(list_cosine_similarity(
                           a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                           * 1000000.0 + 0.5) / 1000000.0 AS sim
                FROM embeddings a JOIN embeddings b
                  ON a.vec_id != b.vec_id
            ),
            nn AS (
                SELECT label, nn_label, row_number() OVER (
                    PARTITION BY qid ORDER BY sim DESC, cid ASC
                ) AS rn
                FROM scored
            )
            SELECT label, nn_label, count(*) AS pair_count
            FROM nn WHERE rn = 1 GROUP BY label, nn_label
        """,
        "embedding_near_dup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(
                       a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
                       AS cosine_sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(
                      a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.35
        """,
        "embedding_near_dup_gemm": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(
                       a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
                       AS cosine_sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(
                      a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.35
        """,
        "unpivot_means": """
            WITH wide AS (
                SELECT round(avg(l_quantity), 2) AS avg_l_quantity,
                       round(avg(l_extendedprice), 2) AS avg_l_extendedprice,
                       round(avg(l_discount), 2) AS avg_l_discount
                FROM lineitem
            )
            SELECT 'avg_l_quantity' AS metric, avg_l_quantity AS value FROM wide
            UNION ALL
            SELECT 'avg_l_extendedprice', avg_l_extendedprice FROM wide
            UNION ALL
            SELECT 'avg_l_discount', avg_l_discount FROM wide
        """,
    }
