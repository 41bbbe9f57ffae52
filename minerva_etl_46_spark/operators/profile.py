"""Table profiling — the ingest-QA pass behind the `agg_profile` /
`agg_skew_report` driver keys, generalized to any frame (the keys pin
fixed column sets so their DuckDB oracles stay literal; these builders
derive the column set from the schema for the CLI `profile` / `skew`
admin verbs).

Both profile ALL requested columns in ONE scan via a stack() unpivot —
never a per-column query fan-out — and keep every statistic exact
integers until the final element-wise expression. Values travel as
strings (bigint→string is canonical cross-engine; min/max are
lexicographic on the string form, stated)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _stack(df: DataFrame, cols: list[str], value_alias: str) -> DataFrame:
    pairs = ", ".join(f"'{c}', cast(`{c}` as string)" for c in cols)
    return df.select(F.expr(
        f"stack({len(cols)}, {pairs}) as (col_name, {value_alias})"))


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column row/null/exact-distinct/min/max. One scan + one
    hash-agg chain for every column; swap countDistinct for
    approx_count_distinct at 100 TB if a sketch suffices (same shape
    minus the distinct expansion)."""
    cols = cols or [f.name for f in df.schema.fields]
    u = _stack(df, cols, "val")
    return u.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("val").isNull(), F.lit(1)).otherwise(F.lit(0)))
        .cast("long").alias("n_null"),
        F.countDistinct("val").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
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
