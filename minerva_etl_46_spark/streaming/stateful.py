"""Custom stateful streaming operator (SURVEY.md §2.9/§2.10):
``applyInPandasWithState`` running per-entity counters across micro-batches
— the escape hatch for operators Spark's built-in windowed aggs can't
express (here: a running cumulative total that must survive batch
boundaries and emit an update per batch).

State is per-key (count, total), Arrow-batched in and out. At cluster
scale state lives in the state store (RocksDB/HDFS-backed), partitioned by
the grouping key — the same key discipline as every other operator here.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from minerva_etl_46_spark.session import tune

OUTPUT_SCHEMA = "user_id long, n long, total double"
STATE_SCHEMA = "n long, total double"


def _update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame([{"user_id": user_id, "n": n, "total": total}])


def running_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame in → per-batch updated running totals out."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_running_totals(spark: SparkSession, source_dir: str, schema: str,
                       name: str = "stateful_totals") -> DataFrame:
    """Drive the stateful operator over everything in source_dir
    (one file per micro-batch so state genuinely carries across batches)
    and return the memory-sink table of per-batch updates."""
    tune(spark)
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    src = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(source_dir)
    )
    out = running_totals(src.select("user_id", "value"))
    q = (
        out.writeStream.outputMode("update").format("memory")
        .queryName(name).trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.table(name)
