"""As-of join (SURVEY.md §2.3 J4) — attribute value in effect at a fact
timestamp, the reference's ``<store>_at(entity, ts)`` lookup
[ref: attribute_directory at-functions — UNVERIFIED [H]].

Spark has no native as-of join. Two scalable strategies; default is the
union-tag trick because it is ONE shuffle-sort and never builds a range
cross-product:

  union-tag:  tag attribute rows (is_attr=1) and fact rows (is_attr=0),
              union, then last(attr_value, ignorenulls) over
              (PARTITION BY entity ORDER BY ts, is_attr DESC ROWS UNBOUNDED
              PRECEDING..CURRENT) — each fact row picks up the most recent
              attribute row at-or-before its timestamp. The DESC on the
              tag is what makes equal timestamps work: attr (1) sorts
              BEFORE fact (0) at the same ts, so an attribute change AT
              the fact timestamp is visible (PostgreSQL ``<= ts``
              semantics, matching the reference's at-functions). An
              ASCENDING tag would put the fact first and silently give
              strictly-less-than semantics — keep this prose and the
              window order in asof_join in lockstep.

  At 100 TB: cost == one sort-shuffle of facts+attrs on entity — the same
  exchange a plain fact/dim shuffle join would need; no skew beyond the
  fact table's own entity skew (AQE skew-join handles the tail).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    facts: DataFrame,
    attrs: DataFrame,
    on: str,
    fact_ts: str,
    attr_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """For each fact row, attach the latest attrs row with
    attr_ts <= fact_ts (per `on` key). Facts with no prior attribute row
    get NULLs (left-join semantics).

    All value columns are packed into ONE struct before the window pass,
    so the pick is row-atomic: a NULL in one attribute column can never
    cause that column to fall back to an OLDER attribute row while its
    siblings come from the newer one (the struct itself is non-null for
    every attribute row, so ``last(struct, ignorenulls)`` always lands on
    the single latest row and NULL fields stay NULL)."""
    f = facts.withColumn("__is_attr", F.lit(0)).withColumn("__ats", F.col(fact_ts))
    # NULL-keyed attribute rows are excluded: Window.partitionBy groups
    # NULLs TOGETHER (unlike join equality, where NULL = NULL is never
    # true), so a NULL-keyed fact would otherwise inherit values from
    # NULL-keyed attr rows — fabricated attributes for keyless rows in a
    # dirty feed. With them gone, NULL-keyed facts partition alone and
    # get NULLs, the left-join semantics promised above (r10 review).
    a = attrs.filter(F.col(on).isNotNull()).select(
        F.col(on),
        F.col(attr_ts).alias("__ats"),
        F.lit(1).alias("__is_attr"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__vrow"),
    )
    fact_cols = facts.columns
    both = f.unionByName(a, allowMissingColumns=True)
    # attribute row sorts BEFORE fact row at equal ts (desc on __is_attr
    # ⇒ attr=1 first) so `<=` semantics hold.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ats").asc(), F.col("__is_attr").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = both.withColumn(
        "__last_row", F.last("__vrow", ignorenulls=True).over(w)
    )
    return out.filter(F.col("__is_attr") == 0).select(
        *[F.col(c) for c in fact_cols],
        *[F.col(f"__last_row.{c}").alias(c) for c in value_cols],
    )
