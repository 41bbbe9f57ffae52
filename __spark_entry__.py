"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Implementations live in ``minerva_etl_46_spark.queries``
(one registered builder + colocated oracle per SURVEY.md §2 test key).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from minerva_etl_46_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: Minerva-shaped tumbling
    time rollup of the events stream (SURVEY.md §7 step 1)."""
    return _q.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key. Since r5 EVERY key has an
    oracle (non-SQL-expressible ops carry invariant/stub-replay oracles
    instead of the weaker rows-only check)."""
    return dict(_q.ORACLES)
