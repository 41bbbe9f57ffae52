"""The aggregation generator: instance declaration → generated time and
entity rollup materializations (the reference's codegen role, minus SQL)."""

from __future__ import annotations

from pyspark.sql import functions as F

from minerva_etl_46_spark.instance import instance_from_yaml
from minerva_etl_46_spark.plans.aggregation import (
    generate_entity_rollup,
    generate_time_rollup,
)
from minerva_etl_46_spark.plans.materialize import MaterializationEngine
from minerva_etl_46_spark.sources.trendstore import TrendStorePartStorage

YAML = """
trend_stores:
  - data_source: pm
    entity_type: Cell
    granularity: 15m
    partition_size_seconds: 900
    parts:
      - name: traffic
        trends:
          - {name: calls, time_aggregation: sum, entity_aggregation: sum}
          - {name: peak,  time_aggregation: max, entity_aggregation: max}
"""

H0 = 1704067200  # 2024-01-01T00:00Z


def _seed_raw(spark, base_dir):
    raw = TrendStorePartStorage(base_dir, "traffic_15m", partition_size_s=900)
    # period-END 15m grid points across one hour, two cells
    rows = [(cell, H0 + 900 * (i + 1), float(10 * cell + i), float(i))
            for cell in (1, 2) for i in range(4)]
    df = spark.createDataFrame(
        rows, schema="entity_id long, epoch long, calls double, peak double"
    ).select("entity_id", F.timestamp_seconds("epoch").alias("ts"), "calls", "peak")
    raw.write(df, ts_col="ts")
    return raw


def test_generated_time_rollup(spark, tmp_path):
    inst = instance_from_yaml(YAML)
    store = inst.trend_stores[0]
    _seed_raw(spark, str(tmp_path))
    spec = generate_time_rollup(
        str(tmp_path), store, "traffic", "1h", reprocessing_period_s=10**12
    )
    engine = MaterializationEngine(str(tmp_path))
    done = engine.tick(spark, spec, now=4e9)
    # the H0 window carries all data; boundary/adjacent candidates run empty
    assert H0 in done

    got = {r["entity_id"]: (r["calls"], r["peak"])
           for r in spec.target.read(spark).collect()}
    # calls: declared sum (10c+0..3 → 4*10c+6); peak: declared max (3)
    assert got == {1: (46.0, 3.0), 2: (86.0, 3.0)}


def test_generated_entity_rollup(spark, tmp_path):
    inst = instance_from_yaml(YAML)
    store = inst.trend_stores[0]
    _seed_raw(spark, str(tmp_path))

    def rel(spark_):
        # cells 1,2 → site 77
        return spark_.createDataFrame(
            [(1, 77), (2, 77)], schema="source_id long, target_id long"
        )

    spec = generate_entity_rollup(
        str(tmp_path), store, "traffic", rel, "site",
        reprocessing_period_s=10**12,
    )
    engine = MaterializationEngine(str(tmp_path))
    done = engine.tick(spark, spec, now=4e9)
    # each grid point's data lands in the window ENDING at it (period-END):
    # windows H0..H0+2700 carry rows; boundary candidates may run empty
    assert {H0, H0 + 900, H0 + 1800, H0 + 2700} <= set(done)

    out = spec.target.read(spark)
    rows = {(r["entity_id"], r["bucket"]): (r["calls"], r["peak"])
            for r in out.collect()}
    # per 15m point: site 77 sums cells' calls, maxes peaks
    assert rows[(77, H0 + 900)] == (10.0 + 20.0, 0.0)
    assert rows[(77, H0 + 3600)] == (13.0 + 23.0, 3.0)
