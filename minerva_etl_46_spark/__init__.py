"""minerva_etl_46_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of Minerva ETL (hendrikx-itc/minerva-etl-46).

Brand-new implementation, Spark-first: DataFrame/SQL declarative plans,
Catalyst optimization, partitioned Parquet storage, incremental batch
materialization, Structured Streaming for streams.

NOTE on reference citations: /root/reference/ was empty when this was
written (verified in SURVEY.md §"VERIFICATION NOTE"); reference loci in
docstrings are public-knowledge module paths of the open-source Minerva
repos, tagged UNVERIFIED per SURVEY.md conventions.
"""

__version__ = "0.1.0"
