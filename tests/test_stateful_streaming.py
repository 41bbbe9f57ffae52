"""applyInPandasWithState: per-entity state must carry across micro-batches
and converge to the batch ground truth."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from minerva_etl_46_spark.streaming.stateful import run_running_totals

SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def test_running_totals_converge_to_batch(spark, tmp_path):
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    events = df.select("event_id", "ts", "user_id", "value").filter(
        F.col("user_id") < 10
    )
    src = os.path.join(str(tmp_path), "stream_src")
    # three files → three micro-batches → state must persist between them
    for i in range(3):
        events.filter(F.col("event_id") % 3 == i).coalesce(1) \
            .write.mode("append").parquet(src)

    updates = run_running_totals(spark, src, SCHEMA).toPandas()
    assert len(updates) > 0
    # a user seen in several batches produced several update rows
    assert updates.groupby("user_id").size().max() > 1

    # final (largest-n) update per user == batch totals
    final = updates.sort_values("n").groupby("user_id").tail(1) \
        .set_index("user_id")
    want = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .toPandas().set_index("user_id")
    )
    assert set(final.index) == set(want.index)
    for uid in want.index:
        assert final.loc[uid, "n"] == want.loc[uid, "n"]
        assert abs(final.loc[uid, "total"] - want.loc[uid, "total"]) < 1e-6


def test_tws_twin_matches_groupstate_and_batch(spark, tmp_path):
    """transformWithStateInPandas twin (Spark 4 StatefulProcessor +
    RocksDB state store): same per-user final state as the GroupState
    implementation AND the batch ground truth."""
    import pytest

    from minerva_etl_46_spark.streaming.stateful import (
        HAS_TWS,
        run_running_totals_tws,
    )

    if not HAS_TWS:
        pytest.skip("transformWithState runtime deps absent (needs the python protobuf package for the TWS driver worker)")

    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    events = df.select("event_id", "ts", "user_id", "value").filter(
        F.col("user_id") < 10
    )
    src = os.path.join(str(tmp_path), "tws_src")
    for i in range(3):
        events.filter(F.col("event_id") % 3 == i).coalesce(1) \
            .write.mode("append").parquet(src)

    updates = run_running_totals_tws(spark, src, SCHEMA).toPandas()
    assert updates.groupby("user_id").size().max() > 1, \
        "state did not carry across micro-batches"
    final = updates.sort_values("n").groupby("user_id").tail(1) \
        .set_index("user_id")
    want = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .toPandas().set_index("user_id")
    )
    assert set(final.index) == set(want.index)
    for uid in want.index:
        assert final.loc[uid, "n"] == want.loc[uid, "n"]
        assert abs(final.loc[uid, "total"] - want.loc[uid, "total"]) < 1e-6


def test_stateful_funnel_converges_to_batch_walk(spark, tmp_path):
    """Feed the real events fixture in three TIME-ORDERED micro-batches
    (the operator's documented arrival contract) and require the final
    per-user state to equal the batch win_funnel reference."""
    from minerva_etl_46_spark.queries import QUERIES
    from minerva_etl_46_spark.streaming.stateful import run_funnel

    sf = "/root/testdata/sf0.001"
    df = spark.read.parquet(f"{sf}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    ev = df.select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
    )
    lo, hi = ev.agg(F.min("ts_us"), F.max("ts_us")).first()
    src = os.path.join(str(tmp_path), "funnel_src")
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    # time-range splits → per-entity event-time-ordered arrival
    for pred in (F.col("ts_us") <= cut1,
                 (F.col("ts_us") > cut1) & (F.col("ts_us") <= cut2),
                 F.col("ts_us") > cut2):
        ev.filter(pred).coalesce(1).write.mode("append").parquet(src)

    updates = run_funnel(
        spark, src, "user_id long, ts_us long, event_type string"
    ).toPandas()
    assert len(updates) > 0
    # converged row per user = column-wise max (reached monotone; each
    # stage ts moves exactly once, -1 -> final)
    final = updates.groupby("user_id").max()

    want = QUERIES["win_funnel"](spark, sf).toPandas().set_index("user_id")
    assert set(final.index) == set(want.index)
    for uid in want.index:
        for col in ("reached", "s1_us", "s2_us", "s3_us"):
            assert final.loc[uid, col] == want.loc[uid, col], (uid, col)
