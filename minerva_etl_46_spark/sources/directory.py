"""Entity directory (SURVEY.md §1 D1/D2, §2.2 P4): entities, entity types,
tags and entity sets [ref: directory schema (entity, entity_type, tag,
entity_set) — UNVERIFIED [H]].

Entities are created on first sight during harvesting (create-on-miss with
content-addressed ids — sources/harvest.py); the directory stores them
append-only with dedup on id. Tags power P4 entity filtering: restricting a
trend query to a tagged set is a broadcast LEFT SEMI join — never a filter
pushed through a collected id list.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class EntityDirectory:
    base_dir: str

    @property
    def entities_path(self) -> str:
        return os.path.join(self.base_dir, "_directory", "entities")

    @property
    def tags_path(self) -> str:
        return os.path.join(self.base_dir, "_directory", "tags")

    def entities(self, spark: SparkSession) -> DataFrame:
        if not os.path.isdir(self.entities_path):
            return spark.createDataFrame(
                [], schema="entity_id long, name string, entity_type string"
            )
        # dedup on id: append-only storage + latest-wins is unnecessary
        # here because ids are content-addressed (same name ⇒ same id)
        return spark.read.parquet(self.entities_path).dropDuplicates(["entity_id"])

    def register(self, new_entities: DataFrame) -> None:
        """Append newly-sighted entities (id, name, entity_type)."""
        new_entities.write.mode("append").parquet(self.entities_path)

    def tag(self, spark: SparkSession, entity_ids: list[int], tag: str) -> None:
        # driver-side bookkeeping append (bounded by the tag list);
        # see sources/paio.py for why this bypasses createDataFrame
        import pyarrow as pa

        from minerva_etl_46_spark.sources.paio import append_table

        append_table(self.tags_path, pa.table({
            "entity_id": pa.array([int(e) for e in entity_ids], pa.int64()),
            "tag": pa.array([tag] * len(entity_ids), pa.string()),
        }))

    def tagged(self, spark: SparkSession, tag: str) -> DataFrame:
        if not os.path.isdir(self.tags_path):
            return spark.createDataFrame([], schema="entity_id long")
        return (
            spark.read.parquet(self.tags_path)
            .filter(F.col("tag") == tag)
            .select("entity_id")
            .distinct()
        )

    def relations_path(self, name: str) -> str:
        return os.path.join(self.base_dir, "_directory", "relations", name)

    def add_relation(self, name: str, edges: DataFrame) -> None:
        """Append (source_id, target_id) edges for a named relation
        (D8: e.g. Cell→Site). Append-only with read-side dedup, like
        entities — re-registering an edge is harmless."""
        edges.select("source_id", "target_id").write.mode("append").parquet(
            self.relations_path(name))

    def relation(self, spark: SparkSession, name: str) -> DataFrame:
        if not os.path.isdir(self.relations_path(name)):
            return spark.createDataFrame(
                [], schema="source_id long, target_id long")
        return spark.read.parquet(self.relations_path(name)).dropDuplicates(
            ["source_id", "target_id"])

    def restrict_to_tag(self, spark: SparkSession, df: DataFrame, tag: str,
                        entity_col: str = "entity_id") -> DataFrame:
        """P4: trend rows for tagged entities only — broadcast semi-join
        (the tag set is directory-sized; the fact side never shuffles)."""
        members = self.tagged(spark, tag)
        return df.join(
            F.broadcast(members),
            df[entity_col] == members["entity_id"],
            "left_semi",
        )
