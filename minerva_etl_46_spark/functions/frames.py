"""Small driver-side frame builders.

``spark.createDataFrame(python_list)`` routes through a pickled
LocalTableScan — a Python-worker round-trip per call (~1.9 s cold /
0.4 s warm for 30 rows on this image). For SMALL literal lists the
range + literal-array form stays entirely in the JVM (~0.1 s); past
``LITERAL_LIMIT`` elements the literal expression tree bloats analysis/
codegen, so the pickled path (which amortizes fine at that size) takes
over. One helper so every call site shares the same crossover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: crossover between the JVM literal-array form and createDataFrame
LITERAL_LIMIT = 1000


def small_literal_frame(spark: SparkSession, values: list, col: str,
                        dtype: str) -> DataFrame:
    """One-column DataFrame from a driver-side list, JVM-side when small.

    ``dtype`` is the Spark SQL type name for the column (``string``,
    ``long``, ...). Order of ``values`` is preserved.
    """
    if len(values) <= LITERAL_LIMIT:
        if not values:
            # typed NULL literal, not a cast of the bigint id: bigint
            # doesn't cast to date/array/struct dtypes, so the empty
            # branch previously FAILED analysis for dtypes the non-empty
            # branch handles fine (r10 review)
            return spark.range(0).select(
                F.lit(None).cast(dtype).alias(col))
        return spark.range(len(values)).select(
            F.element_at(F.array(*[F.lit(v) for v in values]),
                         (F.col("id") + 1).cast("int"))
            .cast(dtype).alias(col))
    return spark.createDataFrame([(v,) for v in values],
                                 schema=f"{col} {dtype}")
