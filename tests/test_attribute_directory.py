"""Attribute-store storage (hash-suppressed append, curr/at, compaction)
and the entity directory (tags, semi-join restriction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from minerva_etl_46_spark.sources.attributestore import AttributeStoreStorage
from minerva_etl_46_spark.sources.directory import EntityDirectory


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, schema="entity_id long, ts string, plan string, region string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_attribute_store_scd2(spark, tmp_path):
    st = AttributeStoreStorage(str(tmp_path), "cellcfg", ("plan", "region"))

    n = st.append(_batch(spark, [
        (1, "2024-01-01 00:00:00", "gold", "north"),
        (2, "2024-01-01 00:00:00", "basic", "south"),
    ]))
    assert n == 2
    # unchanged values at a later ts → suppressed; a real change → stored
    n = st.append(_batch(spark, [
        (1, "2024-02-01 00:00:00", "gold", "north"),     # no change
        (2, "2024-02-01 00:00:00", "premium", "south"),  # plan changed
    ]))
    assert n == 1
    assert st.read_history(spark).count() == 3

    cur = {r["entity_id"]: r["plan"] for r in st.curr(spark).collect()}
    assert cur == {1: "gold", 2: "premium"}

    # as-of: facts in January see the January attributes
    facts = spark.createDataFrame(
        [(10, 1, "2024-01-15 12:00:00"), (11, 2, "2024-01-15 12:00:00"),
         (12, 2, "2024-03-01 12:00:00")],
        schema="fact_id long, entity_id long, fts string",
    ).withColumn("fts", F.to_timestamp("fts"))
    at = {r["fact_id"]: r["plan"]
          for r in st.at(spark, facts, fact_ts="fts").collect()}
    assert at == {10: "gold", 11: "basic", 12: "premium"}

    # replayed history (e.g. re-harvest) piles up equal rows out of order;
    # compact() restores minimal history
    st.append(_batch(spark, [(1, "2023-12-01 00:00:00", "gold", "north")]))
    assert st.read_history(spark).count() == 4
    survivors = st.compact(spark)
    assert survivors == 3  # 2023-12 row becomes the head; 2024-01 dup dies


def test_entity_directory_tags(spark, tmp_path):
    d = EntityDirectory(str(tmp_path))
    assert d.entities(spark).count() == 0
    d.register(spark.createDataFrame(
        [(1, "Cell=A", "Cell"), (2, "Cell=B", "Cell"), (3, "Site=S", "Site")],
        schema="entity_id long, name string, entity_type string",
    ))
    assert d.entities(spark).count() == 3

    d.tag(spark, [1, 3], "maintenance")
    trend = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], schema="entity_id long, v double"
    )
    got = {r["v"] for r in
           d.restrict_to_tag(spark, trend, "maintenance").collect()}
    assert got == {10.0, 30.0}
    # unknown tag → empty restriction, not an error
    assert d.restrict_to_tag(spark, trend, "nope").count() == 0
