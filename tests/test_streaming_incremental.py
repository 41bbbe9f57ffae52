"""Streaming availableNow ingest+materialize == one-shot batch (T3 under
Structured Streaming). Also proves checkpoint-resume skips drained files."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from minerva_etl_46_spark.catalog import Trend
from minerva_etl_46_spark.functions.timestamps import G_1H
from minerva_etl_46_spark.operators.rollup import time_rollup
from minerva_etl_46_spark.plans.materialize import (
    MaterializationEngine,
    MaterializationSpec,
)
from minerva_etl_46_spark.sources.trendstore import TrendStorePartStorage
from minerva_etl_46_spark.streaming.incremental import ingest_available_now

TRENDS = {
    "n": Trend("n", time_aggregation="count"),
    "sum_value": Trend("sum_value", time_aggregation="sum"),
}
SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def _events(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return (
        df.select("event_id", "ts", "user_id", "value")
        .filter(F.col("ts") < F.lit("2024-01-01 04:00:00").cast("timestamp"))
    )


def test_stream_ingest_materialize_equals_batch(spark, tmp_path):
    events = _events(spark)
    src_dir = os.path.join(str(tmp_path), "incoming")
    # two "arriving files" with interleaved (out-of-order) data
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "append").parquet(src_dir)
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append").parquet(src_dir)

    raw = TrendStorePartStorage(str(tmp_path), "raw", partition_size_s=3600)
    target = TrendStorePartStorage(str(tmp_path), "hourly", partition_size_s=3600)
    engine = MaterializationEngine(str(tmp_path))

    def src_fn(spark_, w_start, w_end):
        rows = raw.read_window(spark_, w_start, w_end).filter(
            (F.col("ts").cast("long") >= w_start) & (F.col("ts").cast("long") < w_end)
        )
        src = rows.select("user_id", "ts", F.col("value").alias("n"),
                          F.col("value").alias("sum_value"))
        return time_rollup(src, "user_id", "ts", G_1H, TRENDS, bucket_col="bucket")

    spec = MaterializationSpec(
        name="hourly", granularity=G_1H, target=target, src_fn=src_fn,
        sources=[raw], ts_col="bucket", reprocessing_period_s=10**12,
    )
    ckpt = os.path.join(str(tmp_path), "ckpt")
    done = ingest_available_now(
        spark, src_dir, SCHEMA, raw, engine, spec,
        keys=["event_id"], version_cols=["event_id"],
        checkpoint_dir=ckpt, now=4e9,
    )
    assert done  # windows materialized across micro-batches

    got = target.read(spark).drop("p_bucket").toPandas()
    src = events.select("user_id", "ts", F.col("value").alias("n"),
                        F.col("value").alias("sum_value"))
    want = time_rollup(src, "user_id", "ts", G_1H, TRENDS,
                       bucket_col="bucket").toPandas()
    cols = ["user_id", "bucket"]
    got = got.sort_values(cols).reset_index(drop=True)[want.columns.tolist()]
    want = want.sort_values(cols).reset_index(drop=True)
    assert got.equals(want)

    # resume from checkpoint: nothing new → no windows re-materialized
    done2 = ingest_available_now(
        spark, src_dir, SCHEMA, raw, engine, spec,
        keys=["event_id"], version_cols=["event_id"],
        checkpoint_dir=ckpt, now=4e9 + 100,
    )
    assert done2 == []
