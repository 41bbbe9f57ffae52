"""Attribute-store (SCD-2) suite (SURVEY.md §1 D6, §2.5 W1/W2/W4, §2.3 J4).

The reference keeps per-entity attribute history rows
(entity_id, timestamp, modified, hash, a1..aN) with a ``_curr`` view
(latest row per entity), ``_at(ts)`` as-of lookup functions, and
hash-based change suppression
[ref: attribute_directory schema + functions — UNVERIFIED [H]].

All four shapes are single-shuffle window plans over (entity) — at 100 TB
the attribute store is dimension-sized (rows ∝ entities × change-rate, not
∝ fact volume), so these windows are cheap relative to fact scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from minerva_etl_46_spark.functions.hashing import row_hash


def _reserve(df: DataFrame, *names: str) -> None:
    """These operators add-and-drop internal columns; an input frame that
    already carries one would have it silently OVERWRITTEN and then
    DELETED from the output (r10 review: the attribute-history schema
    itself stores __h, and compact() only works because it remembers to
    drop it first) — collide loudly instead."""
    clash = [n for n in names if n in df.columns]
    if clash:
        raise ValueError(
            f"input frame already has internal column(s) {clash} — drop or "
            "rename them before calling (they would be overwritten and "
            "removed from the output)")


def latest_per_entity(
    df: DataFrame, entity_col: str, ts_col: str, tiebreak: list[str] | None = None
) -> DataFrame:
    """W1: the ``_curr`` view — newest attribute row per entity."""
    _reserve(df, "__rn")
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in (tiebreak or [])]
    w = Window.partitionBy(entity_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def validity_intervals(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    start_col: str = "valid_from",
    end_col: str = "valid_to",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """W2: history rows → [valid_from, valid_to) ranges; open end = NULL.

    This is the bridge from Minerva's point-in-time history to interval
    semantics (feeds the as-of join's interval variant).
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(entity_col).orderBy(*order)
    return df.withColumn(start_col, F.col(ts_col)).withColumn(
        end_col, F.lead(ts_col).over(w)
    )


def suppress_unchanged(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """W4/F5: drop history rows whose attribute hash equals the previous
    row's — the reference's insert-time change detection, as a batch op."""
    _reserve(df, "__h", "__prev")
    hashed = df.withColumn("__h", row_hash(*attr_cols))
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(entity_col).orderBy(*order)
    return (
        hashed.withColumn("__prev", F.lag("__h").over(w))
        .filter(F.col("__prev").isNull() | (F.col("__h") != F.col("__prev")))
        .drop("__h", "__prev")
    )
