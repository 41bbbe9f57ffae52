"""Keep-latest upsert — the trend-store write path (SURVEY.md §2.1 S4,
§2.5 W3, §2.7 U1).

The reference COPYs into a staging table then INSERT … ON CONFLICT (entity,
timestamp) DO UPDATE [ref: trend_directory.transfer_staged — UNVERIFIED
[M]]. Spark has no in-place update on Parquet, so upsert is expressed as
union + keep-latest-per-key:

    unionByName(existing, staged) → row_number() over (keys ORDER BY
    version DESC) → keep rn=1

One shuffle (the window's partitionBy). At 100 TB this runs per affected
*time partition*, not over the whole store — the caller overwrites only the
partitions staged data touches (dynamic partition overwrite,
plans/materialize.py), so the window's key space is bounded by one
partition_size of data regardless of total store size. Delta-Lake MERGE is
the drop-in replacement when the runtime has it (import-gated, not in this
image).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_latest(
    existing: DataFrame | None,
    staged: DataFrame,
    keys: list[str],
    version_cols: list[str],
) -> DataFrame:
    """Last-write-wins per key; idempotent (upsert(upsert(x)) == upsert(x)).

    version_cols: descending priority order (e.g. job_id) — the greatest
    version wins; ties broken by preferring staged rows (matching ON
    CONFLICT DO UPDATE, where the incoming row replaces the stored one).
    """
    staged = staged.withColumn("__src", F.lit(1))
    if existing is None:
        both = staged
    else:
        both = existing.withColumn("__src", F.lit(0)).unionByName(
            staged, allowMissingColumns=True
        )
    order = [F.col(c).desc_nulls_last() for c in version_cols] + [F.col("__src").desc()]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        both.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def upsert_with_tombstones(
    existing: DataFrame | None,
    staged: DataFrame,
    keys: list[str],
    version_cols: list[str],
    op_col: str = "op",
    delete_marker: str = "D",
) -> DataFrame:
    """S4 with DELETE markers: staged rows whose ``op_col`` equals
    ``delete_marker`` remove the key instead of updating it — the CDC
    merge shape (Debezium/DMS-style op streams, or the reference's
    attribute deletes) on the same ONE-shuffle keep-latest window.

    The tombstone must WIN the version race first (so a delete that is
    newest actually deletes, and a later re-insert resurrects the key),
    then winning tombstone rows drop out of the output. Same partition-
    bounded cost discipline as upsert_latest; the op column is removed
    from the result."""
    merged = upsert_latest(existing, staged, keys, version_cols)
    return merged.filter(
        F.col(op_col).isNull() | (F.col(op_col) != delete_marker)
    ).drop(op_col)
