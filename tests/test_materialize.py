"""Materialization engine tests (SURVEY.md §5.4): incremental equivalence —
materializing period-by-period with late out-of-order batches must equal a
one-shot batch over the full range. THE Minerva-semantics test (T2/T3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minerva_etl_46_spark.catalog import Trend
from minerva_etl_46_spark.functions.timestamps import G_1H
from minerva_etl_46_spark.operators.rollup import time_rollup
from minerva_etl_46_spark.plans.materialize import (
    MaterializationEngine,
    MaterializationSpec,
)
from minerva_etl_46_spark.sources.trendstore import TrendStorePartStorage

SF = "/root/testdata/sf0.001"

TRENDS = {
    "n": Trend("n", time_aggregation="count"),
    "sum_value": Trend("sum_value", time_aggregation="sum"),
}


def load_events(spark):
    """First ~6 hours only: each materialized window is its own Spark job,
    so the window count (not row count) dominates test wall-clock."""
    df = spark.read.parquet(f"{SF}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return (
        df.select("event_id", "ts", "user_id", "value")
        .filter(F.col("ts") < F.lit("2024-01-01 06:00:00").cast("timestamp"))
        .localCheckpoint(eager=True)
    )


def rollup_src(raw: TrendStorePartStorage):
    def src_fn(spark, w_start, w_end):
        rows = raw.read_window(spark, w_start, w_end).filter(
            (F.col("ts").cast("long") >= w_start) & (F.col("ts").cast("long") < w_end)
        )
        src = rows.select(
            "user_id", "ts",
            F.col("value").alias("n"), F.col("value").alias("sum_value"),
        )
        return time_rollup(src, "user_id", "ts", G_1H, TRENDS, bucket_col="bucket")

    return src_fn


@pytest.fixture()
def stores(tmp_path):
    raw = TrendStorePartStorage(str(tmp_path), "raw_events", partition_size_s=3600)
    target = TrendStorePartStorage(str(tmp_path), "events_1h", partition_size_s=3600)
    return raw, target


def make_spec(raw, target, **kw):
    return MaterializationSpec(
        name="events_1h", granularity=G_1H, target=target,
        src_fn=rollup_src(raw), sources=[raw], ts_col="bucket", **kw,
    )


def test_incremental_equals_oneshot_with_late_batches(spark, stores):
    raw, target = stores
    events = load_events(spark)
    engine = MaterializationEngine(raw.base_dir)
    # 'now' is a synthetic far-future instant: the horizon must be wide
    # enough that late batches still fall inside reprocessing_period
    spec = make_spec(raw, target, reprocessing_period_s=10**12)

    # three out-of-order batches; batch 3 is "late" data for early hours
    b1 = events.filter(F.col("event_id") % 3 == 0)
    b2 = events.filter(F.col("event_id") % 3 == 1)
    b3 = events.filter(F.col("event_id") % 3 == 2)
    far_future = 4e9  # all delays satisfied
    for b in (b1, b2, b3):
        raw.upsert(b, keys=["event_id"], version_cols=["event_id"], ts_col="ts")
        engine.tick(spark, spec, now=far_future)

    got = target.read(spark).drop("p_bucket").toPandas()
    src = events.select(
        "user_id", "ts", F.col("value").alias("n"), F.col("value").alias("sum_value")
    )
    want = time_rollup(src, "user_id", "ts", G_1H, TRENDS, bucket_col="bucket").toPandas()
    key = ["user_id", "bucket"]
    got = got.sort_values(key).reset_index(drop=True)[want.columns.tolist()]
    want = want.sort_values(key).reset_index(drop=True)
    assert got.equals(want), "incremental materialization != one-shot batch"


def test_fingerprint_skips_unchanged_windows(spark, stores):
    raw, target = stores
    events = load_events(spark)
    engine = MaterializationEngine(raw.base_dir)
    spec = make_spec(raw, target, reprocessing_period_s=10**12)
    raw.upsert(events, keys=["event_id"], version_cols=["event_id"], ts_col="ts")

    first = engine.tick(spark, spec, now=4e9)
    assert len(first) > 0
    second = engine.tick(spark, spec, now=4e9 + 10)
    assert second == [], "unchanged fingerprints must not reprocess"


def test_stability_and_processing_delay_gate(spark, stores):
    raw, target = stores
    events = load_events(spark)
    engine = MaterializationEngine(raw.base_dir)
    spec = make_spec(raw, target, stability_delay_s=10_000_000_000)
    raw.upsert(events, keys=["event_id"], version_cols=["event_id"], ts_col="ts")
    # sources are never "quiet" under an absurd stability delay
    assert engine.tick(spark, spec, now=4e9) == []


def test_reprocessing_horizon_drops_ancient_late_data(spark, stores):
    raw, target = stores
    events = load_events(spark)
    engine = MaterializationEngine(raw.base_dir)
    spec = make_spec(raw, target, reprocessing_period_s=3600)

    b1 = events.filter(F.col("event_id") % 2 == 0)
    raw.upsert(b1, keys=["event_id"], version_cols=["event_id"], ts_col="ts")
    done1 = engine.tick(spark, spec, now=4e9)
    assert done1
    # late data arrives, but 'now' is far past window end + horizon: already-
    # processed windows must NOT re-run (never-seen windows still may — the
    # horizon gates REprocessing only, matching the reference semantics)
    b2 = events.filter(F.col("event_id") % 2 == 1)
    raw.upsert(b2, keys=["event_id"], version_cols=["event_id"], ts_col="ts")
    done2 = engine.tick(spark, spec, now=4e9 + 1_000_000)
    assert set(done1).isdisjoint(done2), "late data outside reprocessing_period re-ran"
    # and the system quiesces: nothing left to do
    assert engine.tick(spark, spec, now=4e9 + 1_000_001) == []


def test_calendar_daily_materialization_equals_oneshot(spark, tmp_path):
    """Calendar (G_1D) windows materialize end-to-end — the capability the
    round-1 advisor flagged as TypeError'ing (granularity.seconds is None)."""
    from minerva_etl_46_spark.functions.timestamps import G_1D

    raw = TrendStorePartStorage(str(tmp_path), "raw_events", partition_size_s=86400)
    target = TrendStorePartStorage(str(tmp_path), "events_1d", partition_size_s=86400)
    events = load_events(spark)
    engine = MaterializationEngine(str(tmp_path))

    def src_fn(sp, w_start, w_end):
        rows = raw.read_window(sp, w_start, w_end).filter(
            (F.col("ts").cast("long") >= w_start) & (F.col("ts").cast("long") < w_end)
        )
        src = rows.select(
            "user_id", "ts",
            F.col("value").alias("n"), F.col("value").alias("sum_value"),
        )
        return time_rollup(src, "user_id", "ts", G_1D, TRENDS, bucket_col="bucket")

    spec = MaterializationSpec(
        name="events_1d", granularity=G_1D, target=target, src_fn=src_fn,
        sources=[raw], ts_col="bucket", reprocessing_period_s=10**12,
    )
    raw.upsert(events, keys=["event_id"], version_cols=["event_id"], ts_col="ts")
    done = engine.tick(spark, spec, now=4e9)
    assert done, "no calendar windows materialized"
    got = target.read(spark).drop("p_bucket").toPandas()
    src = events.select(
        "user_id", "ts", F.col("value").alias("n"), F.col("value").alias("sum_value")
    )
    want = time_rollup(src, "user_id", "ts", G_1D, TRENDS, bucket_col="bucket").toPandas()
    key = ["user_id", "bucket"]
    got = got.sort_values(key).reset_index(drop=True)[want.columns.tolist()]
    want = want.sort_values(key).reset_index(drop=True)
    assert got.equals(want), "calendar materialization != one-shot batch"
    # unchanged fingerprints quiesce for calendar windows too
    assert engine.tick(spark, spec, now=4e9 + 10) == []


def test_calendar_window_math_across_dst():
    """Driver-side local-calendar boundary math mirrors align_floor/align_end
    across DST (no Spark needed)."""
    from minerva_etl_46_spark.plans.materialize import _cal_floor, _cal_next

    TZ = "Europe/Amsterdam"
    # local midnight 2024-03-31 = 23:00 UTC 03-30 (offset +1, epoch 1711839600)
    mar31_local_midnight = 1711839600
    assert _cal_floor(mar31_local_midnight + 3600, "day", TZ) == mar31_local_midnight
    # spring-forward: the local day is 23h — next boundary is 22:00 UTC 03-31
    assert _cal_next(mar31_local_midnight, "day", TZ) == mar31_local_midnight + 23 * 3600
    # month: March Amsterdam = Feb 29 23:00 UTC → Mar 31 22:00 UTC (30d23h)
    mar_start = _cal_floor(mar31_local_midnight, "month", TZ)
    assert _cal_next(mar_start, "month", TZ) - mar_start == 30 * 86400 + 23 * 3600
    # UTC days stay plain 86400s
    assert _cal_next(1704067200, "day", "UTC") == 1704067200 + 86400


def test_calendar_tiling_guard(spark, tmp_path):
    """Non-UTC local midnights (22/23:00 UTC) don't tile 86400s partitions —
    must refuse instead of clobbering sibling windows' partitions."""
    from minerva_etl_46_spark.functions.timestamps import G_1D

    raw = TrendStorePartStorage(str(tmp_path), "raw", partition_size_s=86400)
    bad = TrendStorePartStorage(str(tmp_path), "bad", partition_size_s=86400)
    engine = MaterializationEngine(str(tmp_path))
    spec = MaterializationSpec(
        name="bad_1d", granularity=G_1D, target=bad,
        src_fn=lambda sp, a, b: None, sources=[raw],
        tz="Europe/Amsterdam",
    )
    with pytest.raises(ValueError, match="tile"):
        engine.run_window(spark, spec, 1711839600, "fp")


def test_partition_tiling_guard(spark, stores):
    raw, _ = stores
    bad_target = TrendStorePartStorage(raw.base_dir, "bad", partition_size_s=7200)
    engine = MaterializationEngine(raw.base_dir)
    spec = make_spec(raw, bad_target)
    with pytest.raises(ValueError, match="tile"):
        engine.run_window(spark, spec, 0, "fp")
