"""KPI views from SQL expression strings (SURVEY.md §2.10, §0 "Derive
KPIs"; [ref: generated KPI views — UNVERIFIED [H]]).

The reference's instance YAML declares KPIs as SQL expressions over trend
columns and generates PostgreSQL views from them. Here the expression
strings pass straight through ``F.expr`` onto a DataFrame — no codegen, no
parser; Catalyst folds the expressions into the rollup scan. The
definitions stay data (catalog-able, diffable) exactly like the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kpi_view(df: DataFrame, kpis: dict[str, str], keep: list[str]) -> DataFrame:
    """Project keep-columns + one aliased F.expr per KPI definition."""
    return df.select(
        *[F.col(c) for c in keep],
        *[F.expr(sql).alias(name) for name, sql in kpis.items()],
    )
