"""Unit coverage for every declared aggregation function the rollup
engine supports (catalog D5 → operators/rollup._agg_column)."""

from __future__ import annotations

from pyspark.sql import functions as F

from minerva_etl_46_spark.catalog import Trend
from minerva_etl_46_spark.functions.timestamps import G_1H
from minerva_etl_46_spark.operators.rollup import entity_rollup, time_rollup

H0 = 1704067200


def _frame(spark):
    rows = [
        # entity 1, hour 0: values in time order 10, 20, 30 with samples 1, 3, 0
        (1, H0 + 60, 10.0, 1.0),
        (1, H0 + 120, 20.0, 3.0),
        (1, H0 + 180, 30.0, 0.0),
        # entity 2, hour 0: single row
        (2, H0 + 60, 7.0, 2.0),
    ]
    return spark.createDataFrame(
        rows, schema="entity long, epoch long, v double, w double"
    ).select("entity", F.timestamp_seconds("epoch").alias("ts"), "v", "w")


def test_every_declared_aggregation_function(spark):
    df = _frame(spark)
    trends = {
        "t_sum": Trend("t_sum", time_aggregation="sum"),
        "t_avg": Trend("t_avg", time_aggregation="avg"),
        "t_min": Trend("t_min", time_aggregation="min"),
        "t_max": Trend("t_max", time_aggregation="max"),
        "t_cnt": Trend("t_cnt", time_aggregation="count"),
        "t_first": Trend("t_first", time_aggregation="first"),
        "t_last": Trend("t_last", time_aggregation="last"),
        "t_wavg": Trend("t_wavg", time_aggregation="samples_weighted_avg",
                        samples_column="w"),
    }
    src = df.select(
        "entity", "ts", "w",
        *[F.col("v").alias(name) for name in trends],
    )
    out = {r["entity"]: r for r in
           time_rollup(src, "entity", "ts", G_1H, trends).collect()}
    e1 = out[1]
    assert e1["t_sum"] == 60.0
    assert e1["t_avg"] == 20.0
    assert e1["t_min"] == 10.0 and e1["t_max"] == 30.0
    assert e1["t_cnt"] == 3
    assert e1["t_first"] == 10.0   # earliest by ts — deterministic min_by
    assert e1["t_last"] == 30.0    # latest by ts — deterministic max_by
    # weighted: (10*1 + 20*3 + 30*0) / (1+3+0) = 70/4
    assert e1["t_wavg"] == 70.0 / 4
    e2 = out[2]
    assert e2["t_wavg"] == 7.0 and e2["t_first"] == e2["t_last"] == 7.0


def test_weighted_avg_zero_total_weight_is_null(spark):
    df = spark.createDataFrame(
        [(1, H0 + 60, 5.0, 0.0)], schema="entity long, epoch long, v double, w double"
    ).select("entity", F.timestamp_seconds("epoch").alias("ts"),
             F.col("v").alias("t_wavg"), "w")
    trends = {"t_wavg": Trend("t_wavg", time_aggregation="samples_weighted_avg",
                              samples_column="w")}
    row = time_rollup(df, "entity", "ts", G_1H, trends).collect()[0]
    assert row["t_wavg"] is None  # NULL, not a division error


def test_time_and_entity_aggregation_can_differ(spark):
    # a gauge that AVERAGES over time but SUMS over entities
    df = _frame(spark)
    trend = Trend("g", time_aggregation="avg", entity_aggregation="sum")
    hourly = time_rollup(
        df.select("entity", "ts", F.col("v").alias("g")),
        "entity", "ts", G_1H, {"g": trend},
    )
    rel = spark.createDataFrame([(1, 9), (2, 9)], "source_id long, target_id long")
    rolled = entity_rollup(hourly, rel, entity_col="entity",
                           bucket_col="bucket", trends={"g": trend})
    row = rolled.collect()[0]
    assert row["entity"] == 9
    assert row["g"] == 20.0 + 7.0  # avg over time (20, 7) then SUM over entities


def test_calendar_end_label_rollup_local_tz_across_dst(spark):
    """Round-2: END-labeled daily rollup in instance-local time. The
    Amsterdam spring-forward day (2024-03-31, 23h long) must produce ONE
    bucket at the local midnight that CLOSES it (22:00 UTC), and a row
    exactly on a local midnight closes its own day (ceil convention)."""
    from minerva_etl_46_spark.functions.timestamps import G_1D

    mar31_start = 1711839600        # 2024-03-30 23:00 UTC = 3/31 00:00 local
    mar31_end = mar31_start + 23 * 3600  # 3/31 22:00 UTC = 4/1 00:00 local
    rows = [
        (1, mar31_start + 1, 10.0),      # just inside the DST day
        (1, mar31_end - 1, 20.0),        # late in the DST day
        (1, mar31_start, 5.0),           # ON local midnight → closes PREV day
    ]
    df = spark.createDataFrame(
        rows, schema="entity long, epoch long, v double"
    ).select("entity", F.timestamp_seconds("epoch").alias("ts"),
             F.col("v").alias("t_sum"))
    trends = {"t_sum": Trend("t_sum", time_aggregation="sum")}
    out = {r["bucket"]: r["t_sum"]
           for r in time_rollup(df, "entity", "ts", G_1D, trends,
                                label="end", tz="Europe/Amsterdam").collect()}
    assert out[mar31_end] == 30.0        # both in-day rows close at 4/1 local
    assert out[mar31_start] == 5.0       # on-grid row closes its own (prev) day


def test_bitmap_distinct_reaggregates_across_granularities(spark):
    """Round-4 A10 claim: stored per-DAY bitmap partials OR-merge to
    coarser granularities (month) and still count EXACTLY — the
    reaggregation path never touches raw rows. Overlapping user sets
    across days must not double-count."""
    rows = []
    # day 0: users 0..9; day 1: users 5..14 (overlap 5..9); day 40 (next
    # month): users 0..4 — month-1 distinct = 15, month-2 distinct = 5
    for u in range(10):
        rows.append((1704067200 + u, u))
    for u in range(5, 15):
        rows.append((1704067200 + 86400 + u, u))
    for u in range(5):
        rows.append((1704067200 + 40 * 86400 + u, u))
    df = spark.createDataFrame(rows, schema="epoch long, user_id long").select(
        F.timestamp_seconds("epoch").alias("ts"), "user_id"
    )
    day = F.date_trunc("day", "ts").alias("day")
    per_day = (
        df.groupBy(day, F.bitmap_bucket_number("user_id").alias("bkt"))
        .agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
    )
    # the stored-partial rollup: OR the day bitmaps up to month, then count
    month = F.date_trunc("month", "day").alias("month")
    rolled = (
        per_day.groupBy(month, "bkt")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .groupBy("month")
        .agg(F.sum(F.bitmap_count("bm")).alias("n_users"))
    )
    got = {str(r["month"])[:7]: r["n_users"] for r in rolled.collect()}
    direct = {
        str(r["month"])[:7]: r["n"]
        for r in df.groupBy(F.date_trunc("month", "ts").alias("month"))
        .agg(F.count_distinct("user_id").alias("n")).collect()
    }
    assert got == direct == {"2024-01": 15, "2024-02": 5}
