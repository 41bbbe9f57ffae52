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
