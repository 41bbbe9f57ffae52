"""Attribute-store storage (SURVEY.md §1 D6): per-entity slowly-changing
attribute history with hash-suppressed appends, ``_curr`` and ``_at(ts)``
views [ref: attribute_directory schema + compaction — UNVERIFIED [H]].

History rows: (entity_id, ts, modified, hash, a1..aN), append-only parquet
partitioned by ingest month. The reference suppresses inserts whose hash
equals the entity's current hash; here the same rule runs batch-wise on
append (compare against stored latest) and a ``compact()`` pass removes
consecutive duplicates retroactively — together they keep history minimal
under replays.

Scale: the attribute store is dimension-sized (entities × change-rate);
every view below is one window over entity — cheap next to fact scans.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minerva_etl_46_spark.functions.hashing import row_hash
from minerva_etl_46_spark.operators.asof import asof_join
from minerva_etl_46_spark.operators.attributes import (
    latest_per_entity,
    suppress_unchanged,
)


@dataclass
class AttributeStoreStorage:
    base_dir: str
    name: str
    attr_cols: tuple[str, ...]

    @property
    def path(self) -> str:
        return os.path.join(self.base_dir, f"attr_{self.name}")

    def _exists(self, spark: SparkSession) -> bool:
        return os.path.isdir(self.path) and any(
            not e.startswith("_") for e in os.listdir(self.path)
        )

    def append(self, batch: DataFrame, entity_col: str = "entity_id",
               ts_col: str = "ts") -> int:
        """Hash-suppressed append: a batch row is stored only if its
        attribute hash differs from the entity's latest stored hash at an
        earlier timestamp (the reference's insert rule). Returns rows
        written."""
        spark = batch.sparkSession
        hashed = batch.withColumn("__h", row_hash(*self.attr_cols)).withColumn(
            "modified", F.lit(time.time()).cast("double")
        )
        if self._exists(spark):
            cur = latest_per_entity(
                self.read_history(spark), entity_col, ts_col
            ).select(
                F.col(entity_col).alias("__e"),
                F.col("__h").alias("__cur_h"),
                F.col(ts_col).alias("__cur_ts"),
            )
            # plain join, NOT a forced broadcast: `cur` is the full
            # latest-per-entity snapshot — dimension-sized, unbounded
            # with total entity count. Spark broadcasts it while it fits
            # autoBroadcastJoinThreshold and falls back to a shuffle
            # join past that; a F.broadcast hint here would OOM the
            # driver at tens of millions of entities (r10 review).
            hashed = (
                hashed.join(cur, hashed[entity_col] == F.col("__e"), "left")
                .filter(
                    F.col("__cur_h").isNull()
                    | (F.col("__h") != F.col("__cur_h"))
                    # STRICT <: an earlier-ts row is a genuine backfill
                    # (hash-vs-latest is meaningless for it), but an
                    # EQUAL-ts equal-hash row is an at-least-once replay
                    # and must be suppressed — `<=` re-appended the
                    # whole batch on every redelivery (r10 review)
                    | (F.col(ts_col) < F.col("__cur_ts"))
                )
                .drop("__e", "__cur_h", "__cur_ts")
            )
        hashed = hashed.localCheckpoint(eager=True)
        n = hashed.count()
        if n:
            hashed.write.mode("append").parquet(self.path)
        return n

    def read_history(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def curr(self, spark: SparkSession, entity_col: str = "entity_id",
             ts_col: str = "ts") -> DataFrame:
        """The ``_curr`` view: latest attribute row per entity."""
        return latest_per_entity(
            self.read_history(spark), entity_col, ts_col, tiebreak=["modified"]
        ).drop("__h", "modified")

    def at(self, spark: SparkSession, facts: DataFrame, fact_ts: str,
           entity_col: str = "entity_id", ts_col: str = "ts") -> DataFrame:
        """The ``_at(entity, ts)`` lookup: as-of join facts against history."""
        hist = self.read_history(spark).drop("__h", "modified")
        return asof_join(
            facts, hist, on=entity_col, fact_ts=fact_ts, attr_ts=ts_col,
            value_cols=list(self.attr_cols),
        )

    def compact(self, spark: SparkSession, entity_col: str = "entity_id",
                ts_col: str = "ts") -> int:
        """Drop history rows whose hash equals the previous row's (replay
        artifacts); rewrites the dataset. Returns surviving row count."""
        hist = self.read_history(spark)
        kept = suppress_unchanged(
            hist.drop("__h"), entity_col, ts_col, list(self.attr_cols),
            tiebreak=["modified"],
        ).withColumn("__h", row_hash(*self.attr_cols))
        kept = kept.localCheckpoint(eager=True)
        n = kept.count()
        kept.write.mode("overwrite").parquet(self.path)
        return n
