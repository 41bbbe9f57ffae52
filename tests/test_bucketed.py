"""Bucketed co-located joins: the plan must contain ZERO Exchange
operators when both sides share bucket spec — the write-once-join-often
trade for recurring KPI/rollup joins (sources/bucketed.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minerva_etl_46_spark.sources.bucketed import colocated_join, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    a = spark.range(50000).select(
        F.col("id").alias("entity_id"), (F.col("id") % 97).alias("kpi_a")
    )
    b = spark.range(30000).select(
        F.col("id").alias("entity_id"), (F.col("id") % 13).alias("kpi_b")
    )
    write_bucketed(a, "t_bucket_a", "entity_id", 8)
    write_bucketed(b, "t_bucket_b", "entity_id", 8)

    j = colocated_join(spark, "t_bucket_a", "t_bucket_b", "entity_id")
    plan = _executed_plan(j)
    assert "Exchange " not in plan, plan
    assert "SortMergeJoin" in plan

    # identical join over plain (unbucketed) parquet shuffles BOTH sides —
    # the cost bucketing removes
    import tempfile

    d = tempfile.mkdtemp(prefix="bucket_contrast_")
    a.write.mode("overwrite").parquet(f"{d}/a")
    b.write.mode("overwrite").parquet(f"{d}/b")
    j2 = spark.read.parquet(f"{d}/a").join(
        spark.read.parquet(f"{d}/b"), "entity_id"
    )
    assert _executed_plan(j2).count("Exchange ") >= 2

    # correctness: same result either way
    assert sorted(r.entity_id for r in j.collect()) == sorted(
        r.entity_id for r in j2.collect()
    )


def test_bucketed_join_values_match_plain(spark, no_broadcast):
    e = spark.range(20000).select(
        F.col("id").alias("entity_id"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    f = spark.range(20000, 35000).union(spark.range(5000)).select(
        F.col("id").alias("entity_id"), (F.col("id") % 3).alias("w")
    )
    write_bucketed(e, "t_bucket_e", "entity_id", 4)
    write_bucketed(f, "t_bucket_f", "entity_id", 4)
    got = (
        colocated_join(spark, "t_bucket_e", "t_bucket_f", "entity_id", "left")
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw"))
        .first()
    )
    want = (
        e.join(f, "entity_id", "left")
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw"))
        .first()
    )
    assert (got.n, got.sw) == (want.n, want.sw)
