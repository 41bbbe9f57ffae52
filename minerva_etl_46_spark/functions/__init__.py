"""Scalar function library (SURVEY.md §2.8 F1–F10).

Everything here is built from pyspark.sql.functions (JVM-side, codegen'd);
no Python UDFs in this package.
"""

from minerva_etl_46_spark.functions.kpi import safe_divide, dsum, davg, dsum_expr
from minerva_etl_46_spark.functions.timestamps import Granularity, align_floor, align_end, bucket_epoch
from minerva_etl_46_spark.functions.hashing import row_hash
from minerva_etl_46_spark.functions.strings import dn_parts, dn_part, parent_dn

__all__ = [
    "safe_divide", "dsum", "davg", "dsum_expr",
    "Granularity", "align_floor", "align_end", "bucket_epoch",
    "row_hash",
    "dn_parts", "dn_part", "parent_dn",
]
