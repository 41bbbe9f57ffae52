"""Catalog: the declarative data model (SURVEY.md §1 D1–D11).

Minerva's directory schema (trend stores, parts, trends with per-column
aggregation functions, attribute stores, relations, materializations) is
re-expressed as plain dataclasses; an instance definition (YAML/JSON in the
reference [ref: crates/minerva/src/instance.rs — UNVERIFIED [M]]) maps to a
`Instance` of these structs. No SQL codegen: builders in
`minerva_etl_46_spark.operators` consume these specs directly and emit
DataFrame plans for Catalyst to optimize.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from minerva_etl_46_spark.functions.timestamps import GRANULARITIES, Granularity

# Aggregation functions Minerva declares per trend column
# [ref: trend_directory.table_trend time_aggregation/entity_aggregation —
#  UNVERIFIED [H], SURVEY.md §2.4]
AGG_FUNCTIONS = {"sum", "avg", "min", "max", "count", "first", "last", "samples_weighted_avg"}

_PG_TO_SPARK = {
    "smallint": T.ShortType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "real": T.FloatType(),
    "double precision": T.DoubleType(),
    "numeric": T.DecimalType(38, 18),
    "text": T.StringType(),
    "timestamp with time zone": T.TimestampType(),
    "jsonb": T.StringType(),
    # common Minerva/PG declarations previously missing (r10 review):
    "boolean": T.BooleanType(),
    "varchar": T.StringType(),
    "character varying": T.StringType(),
    "timestamp": T.TimestampType(),
}


def pg_type_to_spark(pg: str) -> T.DataType:
    """Minerva (PostgreSQL) declared type → Spark type (SURVEY.md §1.2).

    Unknown declarations raise a ValueError NAMING the type and the
    supported set — a bare KeyError surfaced deep inside instance
    application with no hint the type map was the cause (r10 review)."""
    if pg.endswith("[]"):
        return T.ArrayType(pg_type_to_spark(pg[:-2]))
    try:
        return _PG_TO_SPARK[pg]
    except KeyError:
        raise ValueError(
            f"unsupported PostgreSQL type {pg!r} in a trend/attribute "
            f"declaration; supported: {sorted(_PG_TO_SPARK)}") from None


@dataclass(frozen=True)
class Trend:
    """One counter column of a trend store part (D5)."""

    name: str
    data_type: str = "double precision"
    time_aggregation: str = "sum"
    entity_aggregation: str = "sum"
    samples_column: str | None = None  # for samples_weighted_avg
    # hash=False: a frozen dataclass is hashable BY CONTRACT, but a dict
    # field made hash(Trend(...)) raise TypeError (r10 review); equality
    # still compares extra_data
    extra_data: dict = field(default_factory=dict, hash=False)

    def spark_field(self) -> T.StructField:
        return T.StructField(self.name, pg_type_to_spark(self.data_type), True)


@dataclass(frozen=True)
class TrendStorePart:
    """A named group of trends stored as one wide dataset (D4).

    The reference splits wide stores into row-oriented physical parts to
    keep PG tables narrow; on Parquet, column pruning makes one wide
    dataset per part the natural layout.
    """

    name: str
    trends: tuple[Trend, ...]

    def agg_spec(self) -> dict[str, Trend]:
        # (r10 review: the former `kind` parameter was ignored — time and
        # entity callers get the same mapping and pick the aggregation
        # field themselves via operators/rollup._agg_column)
        return {t.name: t for t in self.trends}


@dataclass(frozen=True)
class EntityAggregationDecl:
    """One declared entity rollup (D8/J2): roll this store's parts up
    `relation` (edges in the entity directory) into a sibling store
    suffixed `suffix` (Cell→Site: relation=cell_site, suffix=site)."""

    relation: str
    suffix: str


@dataclass(frozen=True)
class TrendStore:
    """(data_source, entity_type, granularity) container (D3)."""

    data_source: str
    entity_type: str
    granularity: str  # key into GRANULARITIES
    parts: tuple[TrendStorePart, ...]
    partition_size_seconds: int = 86400
    retention_days: int | None = None
    #: declared derived granularities (the reference's aggregation blocks):
    #: each entry generates a time-rollup materialization for every part
    #: via plans/aggregation.specs_from_instance — declare "1h"/"1d" in
    #: the instance YAML and the 15m→1h→1d ladder exists without code
    time_aggregations: tuple[str, ...] = ()
    #: declared entity rollups, same mechanism along the other axis
    entity_aggregations: tuple[EntityAggregationDecl, ...] = ()

    @property
    def gran(self) -> Granularity:
        return GRANULARITIES[self.granularity]


@dataclass(frozen=True)
class AttributeStore:
    """Per-entity slowly-changing attributes, SCD-2 style (D6)."""

    data_source: str
    entity_type: str
    attributes: tuple[Trend, ...]


@dataclass(frozen=True)
class Relation:
    """Directed entity→entity mapping for entity rollups (D8)."""

    name: str
    source_entity_type: str
    target_entity_type: str


@dataclass(frozen=True)
class Materialization:
    """Derived dataset + scheduling params (D9).

    src_fn is a callable (spark, window_start, window_end) -> DataFrame
    registered in code — the analogue of the reference's generated source
    view [ref: trend_directory.materialization — UNVERIFIED [H]].
    """

    target_part: str
    processing_delay_s: int
    stability_delay_s: int
    reprocessing_period_s: int
    src_fn: object = None


@dataclass(frozen=True)
class TriggerRule:
    """Threshold rule → weighted notifications (D10)."""

    name: str
    predicate_sql: str   # boolean SQL over the KPI frame, via F.expr
    weight_sql: str      # int expression
    details_cols: tuple[str, ...] = ()  # packed into a JSON details column


@dataclass(frozen=True)
class Instance:
    """A whole instance definition (D11): everything the CLI would apply."""

    trend_stores: tuple[TrendStore, ...] = ()
    attribute_stores: tuple[AttributeStore, ...] = ()
    relations: tuple[Relation, ...] = ()
    materializations: tuple[Materialization, ...] = ()
    triggers: tuple[TriggerRule, ...] = ()
