"""Streaming ingestion + incremental materialization (SURVEY.md §2.9 T3,
§7 step 9): Structured Streaming `availableNow` replaces the reference's
daemon loop, with `foreachBatch` reusing the exact batch builders.

Each micro-batch: upsert staged rows into the raw trend store (bounded by
touched partitions) → one engine tick materializes the windows whose
fingerprints changed. Late/out-of-order data re-materializes inside the
spec's reprocessing horizon — identical semantics to the batch loop,
because it IS the batch loop driven by a stream.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession

from minerva_etl_46_spark.plans.materialize import (
    MaterializationEngine,
    MaterializationSpec,
)
from minerva_etl_46_spark.session import tune
from minerva_etl_46_spark.sources.trendstore import TrendStorePartStorage
from minerva_etl_46_spark.streaming.jobs import record_progress


def ingest_available_now(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    raw: TrendStorePartStorage,
    engine: MaterializationEngine,
    spec: MaterializationSpec,
    keys: list[str],
    version_cols: list[str],
    ts_col: str = "ts",
    checkpoint_dir: str | None = None,
    path_glob: str | None = None,
    now: float | None = None,
) -> list[int]:
    """Drain everything currently in source_dir through ingest+materialize
    and stop (availableNow). Returns all windows materialized.

    In production the same call with a non-terminating trigger is the
    always-on pipeline; availableNow makes it a deterministic batch for
    tests and backfills."""
    tune(spark)
    done: list[int] = []

    def handle(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        raw.upsert(batch, keys=keys, version_cols=version_cols, ts_col=ts_col)
        done.extend(
            engine.tick(spark, spec, now=time.time() if now is None else now)
        )

    reader = spark.readStream.format("parquet").schema(schema)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    stream = reader.option("maxFilesPerTrigger", "1").load(source_dir)
    # named so record_progress files the snapshot under a usable key
    # (unnamed queries record under None); the uuid suffix keeps
    # CONCURRENT ingests of the same spec from colliding on Spark's
    # active-query-name uniqueness check (a backfill overlapping a
    # scheduled drain) — consumers match on the ingest_<spec> prefix
    import uuid

    writer = (stream.writeStream.foreachBatch(handle)
              .queryName(f"ingest_{spec.name}_{uuid.uuid4().hex[:8]}")
              .trigger(availableNow=True))
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    record_progress(q)
    return done
