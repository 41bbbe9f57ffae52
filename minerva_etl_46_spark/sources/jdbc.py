"""JDBC source (SURVEY.md §2.1 S7) — the reference's entire dataset lives
in PostgreSQL; migrating users read it straight into this engine.

Thin, predicate-pushing wrapper over spark.read.jdbc. Partitioned reads
split on a numeric column so a 100 TB-adjacent PG table fans out over
executors instead of serializing through one connection. No JDBC driver
jar ships in this container — calls raise a clear error until one is on
the classpath (import-gated per the environment contract)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
