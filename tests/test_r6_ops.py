"""Round-6 regression tests: advice-driven hardening (asof atomic pick,
scratch-path isolation, bucketed qualified names, stateful late counters)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_asof_join_pick_is_row_atomic_under_null_values(spark):
    """ADVICE r5: with independent per-column last(ignorenulls), a NULL
    attribute value made nearest_val fall back to an OLDER row while
    nearest_ts came from the newer one. The struct-packed pick must keep
    the chosen row atomic: the latest row's NULL stays NULL."""
    from minerva_etl_46_spark.operators.asof import asof_join

    attrs = spark.createDataFrame(
        [
            (1, 100, "v-old", 100),
            (1, 200, None, 200),     # newest row has a NULL value
        ],
        "user_id int, a_ts bigint, aval string, a_us bigint",
    )
    facts = spark.createDataFrame(
        [(10, 1, 300)], "event_id int, user_id int, f_ts bigint"
    )
    row = asof_join(
        facts, attrs, on="user_id", fact_ts="f_ts", attr_ts="a_ts",
        value_cols=["aval", "a_us"],
    ).collect()[0]
    # atomic: both columns come from the ts=200 row
    assert row.a_us == 200
    assert row.aval is None  # NOT "v-old"


def test_asof_join_no_prior_row_still_all_null(spark):
    from minerva_etl_46_spark.operators.asof import asof_join

    attrs = spark.createDataFrame(
        [(1, 500, "late", 500)],
        "user_id int, a_ts bigint, aval string, a_us bigint",
    )
    facts = spark.createDataFrame(
        [(10, 1, 300)], "event_id int, user_id int, f_ts bigint"
    )
    row = asof_join(
        facts, attrs, on="user_id", fact_ts="f_ts", attr_ts="a_ts",
        value_cols=["aval", "a_us"],
    ).collect()[0]
    assert row.aval is None and row.a_us is None


def test_stateful_funnel_counts_cross_batch_late_events(spark, tmp_path):
    """ADVICE r5: a stage event arriving in a later micro-batch with an
    event-time BELOW the per-user high-water mark was silently dropped.
    It must now surface in the late_events counter."""
    import os

    from minerva_etl_46_spark.streaming.stateful import run_funnel

    src = os.path.join(str(tmp_path), "late_src")
    schema = "user_id long, ts_us long, event_type string"
    b1 = spark.createDataFrame(
        [(1, 100, "signup"), (1, 300, "purchase")], schema
    )
    # ts=200 'purchase' arrives AFTER state advanced past ts=300 → late
    b2 = spark.createDataFrame([(1, 200, "purchase")], schema)
    import time

    b1.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # FileStreamSource orders batches by mtime: b1 first
    b2.coalesce(1).write.mode("append").parquet(src)

    updates = run_funnel(spark, src, schema).toPandas()
    final = updates.groupby("user_id").max()
    # batch 2's purchase@200 sits below the batch-1 high-water mark (300)
    # and cannot advance the walk → exactly one late drop
    assert int(final.loc[1, "late_events"]) == 1
    assert int(final.loc[1, "reached"]) == 2


def test_stateful_funnel_in_order_feed_has_zero_late(spark, tmp_path):
    import os

    from minerva_etl_46_spark.streaming.stateful import run_funnel

    src = os.path.join(str(tmp_path), "inorder_src")
    schema = "user_id long, ts_us long, event_type string"
    spark.createDataFrame(
        [(1, 100, "signup"), (1, 300, "purchase"), (1, 500, "error")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    updates = run_funnel(spark, src, schema).toPandas()
    final = updates.groupby("user_id").max()
    assert int(final.loc[1, "late_events"]) == 0
    assert int(final.loc[1, "reached"]) == 3
