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
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires explicit lower_bound AND "
                "upper_bound — Spark would otherwise receive the literal "
                "string 'None' and fail with an opaque JVM "
                "NumberFormatException deep in the JDBC relation")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    **options: str,
) -> None:
    """JDBC sink — the reference's write-back path (notifications,
    attribute snapshots, report tables land in PostgreSQL for the
    surrounding tooling). Each Spark partition opens one connection and
    inserts in ``batchsize`` batches; cap fan-in with
    ``num_partitions`` (a 1000-task write would open 1000 connections —
    cap at what the database can take). The cap is a ``repartition``,
    not ``coalesce``: coalesce has no shuffle barrier, so it would
    propagate UPSTREAM and collapse the producing stage's parallelism
    onto num_partitions cores — an expensive pipeline serialized to 8
    tasks to spare 8 connections (r10 review). The one extra shuffle
    moves only the final rows. ``mode="append"`` is the
    idempotence-unsafe raw insert; keyed upserts should land in the
    engine's own stores and only FINISHED results go to JDBC."""
    if num_partitions is not None:
        df = df.repartition(num_partitions)
    writer = (
        df.write.format("jdbc").mode(mode)
        .option("url", url).option("dbtable", table)
        .option("batchsize", str(batchsize))
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
