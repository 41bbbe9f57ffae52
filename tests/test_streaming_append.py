"""Append-mode watermark streaming == batch oracle (T1 production shape).

The complete-mode memory-sink job (streaming/jobs.py::tumbling_counts) is
the synchronous correctness-gate harness; this test proves the variant a
cluster would actually run — bounded state (withWatermark), append output,
foreachBatch keyed upsert into the partitioned trend store — produces the
same finalized windows as the batch rollup.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from minerva_etl_46_spark.sources.trendstore import TrendStorePartStorage
from minerva_etl_46_spark.streaming.jobs import tumbling_rollup_append

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
SENTINEL_TS = "2024-01-02 00:00:00"


def _events(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return (
        df.select("event_id", "ts", "user_id", "event_type", "value")
        .filter(F.col("ts") < F.lit("2024-01-01 04:00:00").cast("timestamp"))
    )


def _write_chunk(df, src_dir: str, mtime: float) -> None:
    """Append a chunk file with a controlled mtime: FileStreamSource orders
    files by modification time, and the watermark test needs time-ordered
    arrival (out-of-order ARRIVAL past the delay is legitimately dropped —
    that's the semantics, not the thing under test)."""
    before = set(glob.glob(os.path.join(src_dir, "*.parquet")))
    df.coalesce(1).write.mode("append").parquet(src_dir)
    for f in set(glob.glob(os.path.join(src_dir, "*.parquet"))) - before:
        os.utime(f, (mtime, mtime))


def test_append_mode_tumbling_equals_batch_oracle(spark, tmp_path):
    events = _events(spark).localCheckpoint(eager=True)
    src_dir = os.path.join(str(tmp_path), "incoming")

    # two time-ordered 2h chunks, then a far-future sentinel row whose only
    # job is to advance the watermark past every real window so append mode
    # flushes them (its own window stays unfinalized and is excluded below)
    h2 = F.lit("2024-01-01 02:00:00").cast("timestamp")
    _write_chunk(events.filter(F.col("ts") < h2), src_dir, 1000)
    _write_chunk(events.filter(F.col("ts") >= h2), src_dir, 2000)
    sentinel = spark.createDataFrame(
        [(10**9, SENTINEL_TS, 0, "__flush__", 0.0)],
        schema="event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    _write_chunk(sentinel, src_dir, 3000)

    target = TrendStorePartStorage(str(tmp_path), "events_1h_stream",
                                   partition_size_s=3600)
    ckpt = os.path.join(str(tmp_path), "ckpt")
    tumbling_rollup_append(spark, src_dir, SCHEMA, target, ckpt)

    got = (
        target.read(spark)
        .filter(F.col("event_type") != "__flush__")
        .select("event_type", "bucket", "n", "sum_value")
        .toPandas()
    )
    want = (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast("decimal(38,4)")).cast("double").alias("sum_value"))
        .select("event_type", F.col("win.start").cast("long").alias("bucket"),
                "n", "sum_value")
        .toPandas()
    )
    key = ["event_type", "bucket"]
    got = got.sort_values(key).reset_index(drop=True)[want.columns.tolist()]
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want) and got.equals(want), \
        "append-mode streaming output != batch rollup"

    # checkpoint resume with no new files emits nothing new
    log_before = target.modified_log(spark).count()
    tumbling_rollup_append(spark, src_dir, SCHEMA, target, ckpt)
    assert target.modified_log(spark).count() == log_before


def test_append_mode_session_equals_batch_oracle(spark, tmp_path):
    """T5b production twin: watermarked session_window in append mode +
    foreachBatch keyed upsert must equal the batch session aggregation —
    including sessions that OPEN in one arriving chunk and close in the
    next (the state-store merge path)."""
    from minerva_etl_46_spark.streaming.jobs import session_rollup_append

    events = _events(spark).localCheckpoint(eager=True)
    src_dir = os.path.join(str(tmp_path), "incoming")
    h2 = F.lit("2024-01-01 02:00:00").cast("timestamp")
    _write_chunk(events.filter(F.col("ts") < h2), src_dir, 1000)
    _write_chunk(events.filter(F.col("ts") >= h2), src_dir, 2000)
    sentinel = spark.createDataFrame(
        [(10**9, SENTINEL_TS, -1, "__flush__", 0.0)],
        schema="event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    _write_chunk(sentinel, src_dir, 3000)

    target = TrendStorePartStorage(str(tmp_path), "sessions_stream",
                                   partition_size_s=86400)
    ckpt = os.path.join(str(tmp_path), "ckpt_sessions")
    session_rollup_append(spark, src_dir, SCHEMA, target, ckpt)

    cols = ["user_id", "session_start_us", "session_end_us", "n", "sum_value"]
    got = (
        target.read(spark)
        .filter(F.col("user_id") >= 0)
        .select(*cols)
        .toPandas()
    )
    want = (
        events.groupBy(F.session_window("ts", "30 minutes").alias("win"),
                       "user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast("decimal(38,4)"))
             .cast("double").alias("sum_value"))
        .select("user_id",
                F.unix_micros(F.col("win.start")).alias("session_start_us"),
                F.unix_micros(F.col("win.end")).alias("session_end_us"),
                "n", "sum_value")
        .toPandas()
    )
    key = ["user_id", "session_start_us"]
    got = got.sort_values(key).reset_index(drop=True)[want.columns.tolist()]
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want) and got.equals(want), \
        "append-mode session stream != batch session aggregation"


def test_late_beyond_watermark_dropped_then_batch_recovered(spark, tmp_path):
    """VERDICT r02 item 6: the T2/T3 division of labor, proven end-to-end
    on ONE late batch. (a) Rows arriving beyond the watermark are dropped
    from the append stream's store; (b) the same rows, landed in the raw
    store, flip the window's source fingerprint and the batch materializer
    (plans/materialize.py) recovers them — the reference's daemon split."""
    from minerva_etl_46_spark.catalog import Trend
    from minerva_etl_46_spark.functions.timestamps import G_1H
    from minerva_etl_46_spark.operators.rollup import time_rollup
    from minerva_etl_46_spark.plans.materialize import (
        MaterializationEngine,
        MaterializationSpec,
    )

    events = _events(spark).localCheckpoint(eager=True)
    h1 = F.lit("2024-01-01 01:00:00").cast("timestamp")
    late = events.filter(
        (F.col("ts") < h1) & (F.col("event_id") % 5 == 0)
    ).localCheckpoint(eager=True)
    on_time = events.join(
        late.select("event_id"), "event_id", "left_anti"
    ).localCheckpoint(eager=True)
    assert late.count() > 0

    def rollup(df):
        out = (
            df.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(38,4)"))
                 .cast("double").alias("sum_value"))
            .select("event_type", F.col("win.start").cast("long").alias("bucket"),
                    "n", "sum_value")
            .toPandas()
        )
        key = ["event_type", "bucket"]
        return out.sort_values(key).reset_index(drop=True)

    # ---- (a) stream: the late chunk arrives AFTER the sentinel pushed the
    # watermark a day ahead — its hour-0 windows are finalized and evicted,
    # so Spark must drop the rows entirely
    src_dir = os.path.join(str(tmp_path), "incoming")
    _write_chunk(on_time, src_dir, 1000)
    sentinel = spark.createDataFrame(
        [(10**9, SENTINEL_TS, 0, "__flush__", 0.0)],
        schema="event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    _write_chunk(sentinel, src_dir, 2000)
    _write_chunk(late, src_dir, 3000)

    stream_store = TrendStorePartStorage(str(tmp_path), "stream_1h",
                                         partition_size_s=3600)
    tumbling_rollup_append(spark, src_dir, SCHEMA, stream_store,
                           os.path.join(str(tmp_path), "ckpt"))
    got_stream = (
        stream_store.read(spark)
        .filter(F.col("event_type") != "__flush__")
        .select("event_type", "bucket", "n", "sum_value")
        .toPandas().sort_values(["event_type", "bucket"]).reset_index(drop=True)
    )
    want_on_time = rollup(on_time)
    assert got_stream[want_on_time.columns.tolist()].equals(want_on_time), \
        "stream output should equal the on-time rollup exactly (late dropped)"

    # ---- (b) batch: land the SAME late batch in the raw store; the
    # modified-log fingerprint flips and the affected windows re-materialize
    trends = {"n": Trend("n", time_aggregation="count"),
              "sum_value": Trend("sum_value", time_aggregation="sum")}
    raw = TrendStorePartStorage(str(tmp_path), "raw", partition_size_s=3600)
    target = TrendStorePartStorage(str(tmp_path), "batch_1h", partition_size_s=3600)
    engine = MaterializationEngine(str(tmp_path))

    def src_fn(spark_, w_start, w_end):
        rows = raw.read_window(spark_, w_start, w_end).filter(
            (F.col("ts").cast("long") >= w_start) & (F.col("ts").cast("long") < w_end)
        )
        src = rows.select("event_type", "ts", F.col("value").alias("n"),
                          F.col("value").alias("sum_value"))
        return time_rollup(src, "event_type", "ts", G_1H, trends,
                           bucket_col="bucket")

    spec = MaterializationSpec(
        name="batch_1h", granularity=G_1H, target=target, src_fn=src_fn,
        sources=[raw], ts_col="bucket", reprocessing_period_s=10**12,
    )
    raw.upsert(on_time, keys=["event_id"], version_cols=["event_id"])
    for w, fp in engine.candidates(spark, spec, now=4e9):
        engine.run_window(spark, spec, w, fp, now=4e9)
    first = target.read(spark).drop("p_bucket").toPandas()
    first = first.sort_values(["event_type", "bucket"]).reset_index(drop=True)
    assert first[want_on_time.columns.tolist()].equals(want_on_time)

    raw.upsert(late, keys=["event_id"], version_cols=["event_id"])
    dirty = engine.candidates(spark, spec, now=4e9)
    assert dirty, "late rows must dirty their windows via the fingerprint"
    # only the hour the late rows touch (plus the boundary-extension
    # neighbor) may re-run — not the whole day
    assert {w for w, _ in dirty} <= {1704063600, 1704067200}
    for w, fp in dirty:
        engine.run_window(spark, spec, w, fp, now=4e9)
    want_full = rollup(events)
    got_batch = target.read(spark).drop("p_bucket").toPandas()
    got_batch = got_batch.sort_values(["event_type", "bucket"]).reset_index(drop=True)
    assert got_batch[want_full.columns.tolist()].equals(want_full), \
        "batch reprocessing must recover the late rows the stream dropped"


def test_stream_stream_interval_join_equals_batch(spark):
    """T6: the stream-stream interval self-join (purchases x same-user
    errors in the trailing hour, bounded state via two watermarks) must
    produce exactly the batch join's pair set."""
    from minerva_etl_46_spark.streaming.jobs import interval_join_pairs

    got = interval_join_pairs(spark, "/root/testdata/sf0.001")

    # batch reference ts goes through the SAME normalizer as the stream
    # source, so a future fixture-precision change can't split the paths
    from minerva_etl_46_spark.functions.timestamps import normalize_ts_columns

    e = normalize_ts_columns(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"),
        ["ts"], table="events",
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    r = e.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    ref = (
        p.join(
            r,
            F.expr(
                "p_user = e_user AND e_ts >= p_ts - interval 3600 seconds"
                " AND e_ts <= p_ts"
            ),
        )
        .select(
            "p_id",
            F.col("p_user").alias("user_id"),
            F.unix_micros("p_ts").alias("p_us"),
            F.unix_micros("e_ts").alias("e_us"),
        )
    )
    got_rows = sorted(map(tuple, got.collect()))
    ref_rows = sorted(map(tuple, ref.collect()))
    assert len(got_rows) > 0
    assert got_rows == ref_rows


def test_restart_mid_window_carries_state(spark, tmp_path):
    """Checkpoint RECOVERY, not just idempotence: stop the query with a
    window half-aggregated (the watermark hasn't passed it, so its
    partial counts live only in checkpointed state), restart against the
    same checkpoint with the window's second half arriving, and require
    the finalized window to carry BOTH halves. This is the crash/deploy
    restart path a cluster run takes daily — if state didn't survive,
    the window would flush with only the post-restart rows."""
    events = _events(spark).localCheckpoint(eager=True)
    src_dir = os.path.join(str(tmp_path), "incoming")
    target = TrendStorePartStorage(str(tmp_path), "events_restart",
                                   partition_size_s=3600)
    ckpt = os.path.join(str(tmp_path), "ckpt_restart")

    # run 1: only the FIRST HALF of hour 0 (00:00-00:30) — no window can
    # finalize (watermark = max ts − 2h is far before the window end)
    h = F.lit("2024-01-01 00:30:00").cast("timestamp")
    _write_chunk(events.filter(F.col("ts") < h), src_dir, 1000)
    tumbling_rollup_append(spark, src_dir, SCHEMA, target, ckpt)
    # nothing finalized pre-restart: the store has no data files yet
    # (an empty store won't even resolve a schema)
    from pyspark.errors import AnalysisException
    try:
        n_pre = target.read(spark).count()
    except AnalysisException:
        n_pre = 0
    assert n_pre == 0

    # run 2 (fresh query object, SAME checkpoint): second half + the
    # flush sentinel; hour-0 windows must finalize with run-1 rows in
    _write_chunk(events.filter(F.col("ts") >= h), src_dir, 2000)
    sentinel = spark.createDataFrame(
        [(10**9, SENTINEL_TS, 0, "__flush__", 0.0)],
        schema="event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    _write_chunk(sentinel, src_dir, 3000)
    tumbling_rollup_append(spark, src_dir, SCHEMA, target, ckpt)

    got = (
        target.read(spark)
        .filter(F.col("event_type") != "__flush__")
        .select("event_type", "bucket", "n", "sum_value")
        .toPandas()
    )
    want = (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast("decimal(38,4)")).cast("double")
             .alias("sum_value"))
        .select("event_type", F.col("win.start").cast("long").alias("bucket"),
                "n", "sum_value")
        .toPandas()
    )
    key = ["event_type", "bucket"]
    got = got.sort_values(key).reset_index(drop=True)[want.columns.tolist()]
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want) and got.equals(want), \
        "restarted query lost pre-restart window state"
