"""Table profiling — the ingest-QA pass behind the `agg_profile` /
`agg_skew_report` driver keys, generalized to any frame (the keys pin
fixed column sets so their DuckDB oracles stay literal; these builders
derive the column set from the schema for the CLI `profile` / `skew`
admin verbs).

Both profile ALL requested columns in ONE scan — never a per-column
query fan-out — and keep every statistic exact integers until the final
element-wise expression. profile_table computes min/max on the NATIVE
column type (numeric columns order numerically — '9' < '10'; r8 fix of
the lexicographic-on-string trap) and casts to string only in the
output row, so one uniform schema covers mixed-type tables. Non-
orderable columns (maps) fall back to string-form ordering, flagged by
the docs below. skew_report keys travel as strings (bigint→string is
canonical cross-engine and grouping is order-free)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sql_ident(c: str) -> str:
    """Backtick-quote a column name for interpolation into a SQL
    string; embedded backticks double per the Spark identifier
    grammar, so names like ``a`b`` survive the round-trip."""
    return "`" + c.replace("`", "``") + "`"


def _sql_label(c: str) -> str:
    """Single-quote a column name as a SQL string literal; embedded
    backslashes double FIRST (Spark string literals process backslash
    escapes by default — undoubled, a trailing backslash eats the
    closing quote and interior ones silently collapse, mislabeling
    col_name), then embedded quotes double, so the stack() label is
    the exact column name."""
    return "'" + c.replace("\\", "\\\\").replace("'", "''") + "'"


def _stack(df: DataFrame, cols: list[str], value_alias: str) -> DataFrame:
    pairs = ", ".join(
        f"{_sql_label(c)}, cast({_sql_ident(c)} as string)" for c in cols)
    return df.select(F.expr(
        f"stack({len(cols)}, {pairs}) as (col_name, {value_alias})"))


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column row/null/exact-distinct/min/max in ONE scan: every
    column's five aggregates ride a single agg() (the multi-distinct
    plans as one Expand pass — same single-scan cost as an unpivot),
    min/max on the NATIVE type (numeric order for numerics, temporal
    for timestamps), cast to string only in the output row. Map-typed
    columns are not orderable in Spark; they fall back to min/max on
    the string form. The aggregated 1-row frame unpivots JVM-side via
    stack() — no driver round-trip. Swap countDistinct for
    approx_count_distinct at 100 TB if a sketch suffices (same shape
    minus the distinct expansion)."""
    from pyspark.sql.types import MapType

    cols = cols or [f.name for f in df.schema.fields]
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    aggs = []
    for c in cols:
        # F.col on the backtick-quoted form, not df[c]: Dataset.apply
        # parses the raw name and rejects names containing a backtick
        v = F.col(_sql_ident(c))
        ordv = v.cast("string") if isinstance(dtypes[c], MapType) else v
        aggs.append(F.struct(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(v.isNull(), F.lit(1)).otherwise(F.lit(0)))
            .cast("long").alias("n_null"),
            F.countDistinct(v).alias("n_distinct"),
            F.min(ordv).cast("string").alias("min_val"),
            F.max(ordv).cast("string").alias("max_val"),
        ).alias(c))
    wide = df.agg(*aggs)
    pairs = ", ".join(f"{_sql_label(c)}, {_sql_ident(c)}" for c in cols)
    return (
        wide.select(F.expr(
            f"stack({len(cols)}, {pairs}) as (col_name, s)"))
        .select("col_name", "s.n", "s.n_null", "s.n_distinct",
                "s.min_val", "s.max_val")
    )


def skew_report(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Per key column: distinct count, hottest key (ties pinned by
    (count desc, key asc)) and the max-vs-uniform skew ratio — the
    audit that decides between plain hash join, salting
    (operators/skew.py) and AQE skew handling BEFORE the shuffle."""
    u = _stack(df, key_cols, "key")
    c = u.groupBy("col_name", "key").agg(F.count(F.lit(1)).alias("cnt"))
    r = c.groupBy("col_name").agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("max_cnt"),
    )
    wk = Window.partitionBy("col_name").orderBy(F.desc("cnt"), F.asc("key"))
    h = (c.withColumn("rk", F.row_number().over(wk))
         .filter(F.col("rk") == 1)
         .select("col_name", F.col("key").alias("hot_key")))
    return r.join(h, "col_name").select(
        "col_name", "n_rows", "n_distinct", "max_cnt", "hot_key",
        (F.col("max_cnt").cast("double") * F.col("n_distinct").cast("double")
         / F.col("n_rows").cast("double")).alias("skew_ratio"),
    )
