"""Bucketed trend-store tables: shuffle-free co-located joins
(SURVEY.md §4 join strategy; the "bucketing for co-located joins" leg of
the 100 TB design).

The partitioned-parquet trend store (sources/trendstore.py) prunes on
TIME; bucketing adds the ENTITY axis: writing both sides of a recurring
join bucketed by the join key into the same bucket count lets Spark plan
the join with ZERO Exchange operators — each task reads matching bucket
files from both tables. For the reference workload that's the multi-part
KPI join (J3: trend parts joined on (entity_id, timestamp) every
materialization tick) and the relation-rollup join (J2): the shuffle
those joins would otherwise pay at every tick is paid ONCE at write time.

Catalog scope: `bucketBy` requires `saveAsTable` (bucket metadata lives
in the table catalog, not the parquet files). On a cluster the
Hive/Glue/Unity metastore persists it; a plain local session uses the
in-memory catalog, so table metadata is session-scoped — the parquet
files survive in the warehouse dir but re-registration is needed per
session. The parity test therefore runs write+join in one session and
asserts the plan shape, which is exactly what holds on a cluster.

Sizing at 100 TB: pick n_buckets so one bucket of the LARGER table is
~128-256 MB (e.g. 275 GB/day of trend rows → 1024-2048 buckets). Both
sides MUST use the same n_buckets; readers get bucket-pruning on
equality filters over the bucket column for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _ensure_absent(spark: SparkSession, table: str) -> None:
    """Drop `table` from the catalog AND remove its warehouse location.
    With the in-memory catalog (plain local session) a managed-table
    location can survive a previous session whose catalog entry died —
    `saveAsTable` then fails with LOCATION_ALREADY_EXISTS even in
    overwrite mode. Hive/Glue-backed clusters don't hit this (the entry
    persists and overwrite works), but the cleanup is harmless there."""
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"drop table if exists {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    if wh:
        # Managed-table layout: default db → {wh}/{tbl} (Spark stores
        # default-db tables at the warehouse ROOT — 'default.t' and 't'
        # are the SAME location, verified on this Spark; the r10 review
        # caught the qualified-default form mapping to a nonexistent
        # {wh}/default.db/{tbl} and LOCATION_ALREADY_EXISTS returning);
        # other dbs → {wh}/{db}.db/{tbl} (ADVICE r5).
        parts = table.lower().split(".")
        if len(parts) == 1 or parts[0] == "default":
            loc = f"{wh}/{parts[-1]}"
        elif len(parts) == 2:
            loc = f"{wh}/{parts[0]}.db/{parts[1]}"
        else:
            raise ValueError(f"unsupported table name: {table!r}")
        shutil.rmtree(loc, ignore_errors=True)


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int) -> None:
    """Write df as a bucketed+sorted table. Sorting within buckets makes
    the downstream sort-merge join skip its per-task sort as well."""
    _ensure_absent(df.sparkSession, table)
    (
        df.write.bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .mode("overwrite")
        .saveAsTable(table)
    )


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   on, how: str = "inner") -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. With both
    sides bucketed, Catalyst's EnsureRequirements sees matching
    HashPartitioning(bucket) output partitioning and plans NO Exchange;
    with both sides also sorted, no per-task Sort either.

    ``on`` is anything DataFrame.join accepts: a column name,
    list[str], a Column join expression, or list[Column] (join_bucketed
    passes an equality Column because the two bucket columns are named
    differently)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
