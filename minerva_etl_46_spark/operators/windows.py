"""Generic analytic-window operators (SURVEY.md §2.5 W5–W7, §2.6 O3).

Counter deltas, ranking, moving averages, top-k per group — the shapes
inside Minerva KPI/report SQL [ref: generated KPI views — UNVERIFIED
[M/L]]. Each is one shuffle-sort on its partition key; Catalyst rewrites
rank<=k into a per-partition top-k (no full sort of every partition's
contents at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def delta(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    out_col: str = "delta",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """W5: v - lag(v) per entity in time order — cumulative-counter deltas.

    PM counters are often cumulative; rollups want the per-period delta.
    First row per entity → NULL (unknown base), matching SQL LAG.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(entity_col).orderBy(*order)
    return df.withColumn(out_col, F.col(value_col) - F.lag(value_col).over(w))


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak: list[str] | None = None,
    rank_col: str = "rn",
) -> DataFrame:
    """O3/W6: k best rows per group, deterministic via tiebreak columns."""
    first = F.col(order_col).desc() if descending else F.col(order_col).asc()
    order = [first] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def moving_avg(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    periods: int,
    out_col: str = "mavg",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """W7: trailing average over the last `periods` rows (inclusive)."""
    if periods < 1:
        # periods=0 builds an inverted frame (lower bound 1 > upper 0 →
        # opaque analysis error); negative silently averages LEADING
        # rows under a trailing-average name (r10 review)
        raise ValueError(f"periods must be >= 1, got {periods}")
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(entity_col).orderBy(*order).rowsBetween(-(periods - 1), 0)
    return df.withColumn(out_col, F.avg(value_col).over(w))
