"""End-to-end Minerva lifecycle (SURVEY.md §3): instance definition →
harvest (CSV w/ entity resolution) → trend store upsert → materialization
tick → trigger evaluation → notification store. One test, the whole story."""

from __future__ import annotations

from pyspark.sql import functions as F

from minerva_etl_46_spark.catalog import Trend
from minerva_etl_46_spark.functions.timestamps import G_1H
from minerva_etl_46_spark.instance import (
    AddTrend,
    AddTrendStore,
    ModifyTrend,
    diff_instances,
    instance_from_yaml,
)
from minerva_etl_46_spark.operators.rollup import time_rollup
from minerva_etl_46_spark.plans.materialize import (
    MaterializationEngine,
    MaterializationSpec,
)
from minerva_etl_46_spark.plans.triggers import evaluate_rules
from minerva_etl_46_spark.sources.harvest import (
    align_package,
    read_csv_harvest,
    resolve_entities,
)
from minerva_etl_46_spark.sources.trendstore import TrendStorePartStorage

INSTANCE_YAML = """
trend_stores:
  - data_source: pm
    entity_type: Cell
    granularity: 15m
    partition_size_seconds: 3600
    parts:
      - name: traffic
        trends:
          - {name: calls, data_type: integer, time_aggregation: sum}
          - {name: drops, data_type: integer, time_aggregation: sum}
triggers:
  - name: high_drop_rate
    predicate: "drop_rate > 0.2 and calls >= 2"
    weight: "cast(drop_rate * 100 as int)"
    details: [drop_rate, calls]
"""


def test_yaml_instance_and_diff():
    inst = instance_from_yaml(INSTANCE_YAML)
    assert inst.trend_stores[0].gran.seconds == 900
    assert inst.triggers[0].name == "high_drop_rate"
    # diff: desired adds a trend and changes an aggregation
    desired = instance_from_yaml(INSTANCE_YAML.replace(
        "- {name: drops, data_type: integer, time_aggregation: sum}",
        "- {name: drops, data_type: integer, time_aggregation: max}\n"
        "          - {name: congestion, data_type: real}",
    ))
    changes = diff_instances(inst, desired)
    assert AddTrend("pm/Cell/15m", "traffic", "congestion") in changes
    assert any(isinstance(c, ModifyTrend) and c.trend == "drops" and c.new == "max"
               for c in changes)
    # empty → current yields pure adds (store + trigger)
    from minerva_etl_46_spark.catalog import Instance
    from minerva_etl_46_spark.instance import AddTrigger

    adds = diff_instances(Instance(), inst)
    assert AddTrendStore("pm/Cell/15m") in adds
    assert AddTrigger("high_drop_rate") in adds
    assert len(adds) == 2


def test_full_lifecycle(spark, tmp_path):
    # 1. instance definition
    inst = instance_from_yaml(INSTANCE_YAML)
    store_def = inst.trend_stores[0]

    # 2. harvest: vendor CSV → entity resolution → grid alignment
    csv = tmp_path / "pm.csv"
    csv.write_text(
        "dn,ts,calls,drops\n"
        '"Net=1,Cell=A",2024-01-01 00:03:00,10,1\n'
        '"Net=1,Cell=A",2024-01-01 00:07:00,4,3\n'
        '"Net=1,Cell=B",2024-01-01 00:11:00,8,0\n'
        '"Net=1,Cell=A",2024-01-01 00:21:00,5,2\n'
    )
    pkg = read_csv_harvest(
        spark, str(csv), schema="dn string, ts timestamp, calls int, drops int"
    )
    entities = spark.createDataFrame(
        [(1, "Net=1,Cell=A")], schema="entity_id long, name string"
    )
    resolved, new_ents = resolve_entities(pkg, entities)
    assert new_ents.count() == 1  # Cell=B minted
    # keep the raw record time: after grid alignment it versions keep-latest
    resolved = resolved.withColumn("raw_ts", F.col("ts"))
    aligned = align_package(resolved, "ts", store_def.gran)  # period-END grid

    # 3. upsert into the raw trend store part (partitioned storage)
    raw = TrendStorePartStorage(str(tmp_path), "traffic_15m",
                                partition_size_s=store_def.partition_size_seconds)
    raw.upsert(
        aligned.select("entity_id", "ts", "raw_ts", "calls", "drops"),
        keys=["entity_id", "ts"], version_cols=["raw_ts"], ts_col="ts",
    )
    # 00:03 and 00:07 collapse onto the same 00:15 grid point → keep-latest
    assert raw.read(spark).count() == 3

    # 4. materialize: 15m → 1h rollup driven by the modified log
    target = TrendStorePartStorage(str(tmp_path), "traffic_1h", partition_size_s=3600)
    trends = {
        "calls": Trend("calls", time_aggregation="sum"),
        "drops": Trend("drops", time_aggregation="sum"),
    }

    def src_fn(spark_, w_start, w_end):
        rows = raw.read_window(spark_, w_start, w_end + 1).filter(
            (F.col("ts").cast("long") > w_start) & (F.col("ts").cast("long") <= w_end)
        )  # period-END timestamps: (start, end] per Minerva convention
        return time_rollup(rows, "entity_id", "ts", G_1H, trends, bucket_col="bucket")

    spec = MaterializationSpec(
        name="traffic_1h", granularity=G_1H, target=target, src_fn=src_fn,
        sources=[raw], ts_col="bucket", reprocessing_period_s=10**12,
    )
    engine = MaterializationEngine(str(tmp_path))
    done = engine.tick(spark, spec, now=4e9)
    assert done

    hourly = target.read(spark)
    got = {(r["entity_id"], r["calls"], r["drops"]) for r in hourly.collect()}
    cell_b = [t for t in got if t[1] == 8]
    assert cell_b and cell_b[0][2] == 0
    # Cell=A: 00:15 grid point kept latest (4 calls, 3 drops), + 00:30 (5, 2)
    assert (1, 9, 5) in got

    # 5. trigger evaluation over the rollup → notification store
    kpi = hourly.select(
        "entity_id",
        F.timestamp_seconds("bucket").alias("ts"),
        "calls", "drops",
        (F.col("drops") / F.col("calls")).alias("drop_rate"),
    )
    notes = evaluate_rules(kpi, list(inst.triggers))
    nstore = TrendStorePartStorage(str(tmp_path), "notifications", partition_size_s=3600)
    nstore.write(notes, ts_col="ts")
    stored = nstore.read(spark).collect()
    assert len(stored) == 1  # only Cell=A breaches drop_rate 0.2 with calls>=2
    n = stored[0]
    assert n["rule"] == "high_drop_rate" and n["entity_id"] == 1
    assert n["weight"] == int(5 / 9 * 100)
    assert '"calls":9' in n["details"]


def test_diff_attribute_stores_and_triggers():
    from minerva_etl_46_spark.instance import (
        AddAttribute,
        AddAttributeStore,
        ModifyTrigger,
        RemoveTrigger,
    )

    cur = instance_from_yaml("""
attribute_stores:
  - data_source: inv
    entity_type: Cell
    attributes:
      - {name: plan}
triggers:
  - {name: a, predicate: "x > 1", weight: "1"}
  - {name: gone, predicate: "y > 1", weight: "1"}
""")
    want = instance_from_yaml("""
attribute_stores:
  - data_source: inv
    entity_type: Cell
    attributes:
      - {name: plan}
      - {name: region}
  - data_source: inv
    entity_type: Site
    attributes: []
triggers:
  - {name: a, predicate: "x > 2", weight: "1"}
""")
    changes = diff_instances(cur, want)
    assert AddAttributeStore("inv/Site") in changes
    assert AddAttribute("inv/Cell", "region") in changes
    assert RemoveTrigger("gone") in changes
    assert any(isinstance(c, ModifyTrigger) and c.name == "a"
               and c.new == "x > 2" for c in changes)


def test_apply_then_rediff_is_empty(tmp_path):
    """VERDICT r5 ask #4: the diff-AND-apply admin loop. Apply a desired
    instance to an empty root, re-diff → empty; evolve it (new trend,
    aggregation change), apply again → re-diff empty again."""
    from minerva_etl_46_spark.instance import (
        apply_instance,
        diff_instances,
        load_live,
    )

    root = str(tmp_path / "live")
    inst = instance_from_yaml(INSTANCE_YAML)
    changes = apply_instance(root, inst)
    assert AddTrendStore("pm/Cell/15m") in changes
    assert diff_instances(load_live(root), inst) == []
    # store dir materialized
    import os
    assert os.path.isdir(os.path.join(root, "pm", "Cell", "15m"))

    evolved = instance_from_yaml(INSTANCE_YAML.replace(
        "- {name: drops, data_type: integer, time_aggregation: sum}",
        "- {name: drops, data_type: integer, time_aggregation: max}\n"
        "          - {name: congestion, data_type: real}",
    ))
    changes2 = apply_instance(root, evolved)
    assert AddTrend("pm/Cell/15m", "traffic", "congestion") in changes2
    assert any(isinstance(c, ModifyTrend) for c in changes2)
    assert diff_instances(load_live(root), evolved) == []
    # idempotent: a third apply executes nothing
    assert apply_instance(root, evolved) == []


def test_apply_schema_evolution_is_zero_rewrite(spark, tmp_path):
    """AddTrend after data exists: read_part surfaces the new column as a
    typed NULL without touching the files; ModifyTrend(data_type) casts
    at read time."""
    from datetime import datetime

    from minerva_etl_46_spark.instance import (
        apply_instance,
        instance_from_yaml,
        load_live,
        part_storage,
        read_part,
    )

    root = str(tmp_path / "live")
    inst = instance_from_yaml(INSTANCE_YAML)
    apply_instance(root, inst)
    store = load_live(root).trend_stores[0]
    storage = part_storage(root, store, "traffic")
    storage.write(spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 0), 10, 2)],
        "entity_id long, ts timestamp, calls int, drops int",
    ))

    evolved = instance_from_yaml(INSTANCE_YAML.replace(
        "- {name: drops, data_type: integer, time_aggregation: sum}",
        "- {name: drops, data_type: bigint, time_aggregation: sum}\n"
        "          - {name: congestion, data_type: real}",
    ))
    apply_instance(root, evolved)
    df = read_part(spark, root, load_live(root).trend_stores[0], "traffic")
    types = dict(df.dtypes)
    assert types["congestion"] == "float"   # new column, typed NULL
    assert types["drops"] == "bigint"       # re-typed at read time
    row = df.collect()[0]
    assert row.congestion is None and row.drops == 2 and row.calls == 10


def test_yaml_declared_aggregation_ladder(spark, tmp_path):
    """r6: the reference's aggregation blocks — declare
    time_aggregations: [1h] in YAML, apply, write 15m raw, tick the
    engine: the 1h store materializes with each trend rolled by its
    declared time_aggregation; diff detects ladder edits."""
    from minerva_etl_46_spark.instance import (
        ChangeTimeAggregations,
        apply_instance,
        diff_instances,
        load_live,
        part_storage,
    )
    from minerva_etl_46_spark.plans.aggregation import specs_from_instance
    from minerva_etl_46_spark.plans.materialize import MaterializationEngine

    yaml_v = INSTANCE_YAML.replace(
        "granularity: 15m\n",
        "granularity: 15m\n    time_aggregations: [1h]\n",
    )
    root = str(tmp_path / "live")
    inst = instance_from_yaml(yaml_v)
    apply_instance(root, inst)
    live = load_live(root)
    assert live.trend_stores[0].time_aggregations == ("1h",)
    assert diff_instances(live, inst) == []
    # ladder edit is a typed change
    inst2 = instance_from_yaml(yaml_v.replace("[1h]", "[1h, 1d]"))
    assert any(isinstance(c, ChangeTimeAggregations)
               for c in diff_instances(live, inst2))

    # write raw 15m data under the generator's naming ({part}_{gran})
    store = live.trend_stores[0]
    raw = part_storage(root, store, "traffic_15m")
    day = spark.createDataFrame(
        [(1 + i % 2, 1704067200 + 900 * (i + 1), i, i % 3)
         for i in range(16)],  # ts = period END stamps over 4 hours
        "entity_id long, epoch long, calls int, drops int",
    ).select("entity_id", F.timestamp_seconds("epoch").alias("ts"),
             "calls", "drops")
    raw.write(day, ts_col="ts")

    (spec,) = specs_from_instance(root, live,
                                  reprocessing_period_s=10**12)
    done = MaterializationEngine(raw.base_dir).tick(spark, spec, now=4e9)
    assert done, "no windows materialized"
    rolled = spec.target.read(spark)
    # sums per (entity, hour): trends declared time_aggregation=sum
    got = {(r.entity_id, r.bucket): (r.calls, r.drops)
           for r in rolled.collect()}
    import collections
    want = collections.defaultdict(lambda: [0, 0])
    for i in range(16):
        ts = 1704067200 + 900 * (i + 1)
        b = ((ts - 1) // 3600) * 3600 + 3600  # period-END hour label
        k = (1 + i % 2, b)
        want[k][0] += i
        want[k][1] += i % 3
    assert got == {k: tuple(v) for k, v in want.items()}


def test_yaml_declared_entity_rollup(spark, tmp_path):
    """r6: entity_aggregations blocks — declare a Cell→Site rollup in
    YAML, register the relation edges in the entity directory, tick:
    the _site store materializes with per-site sums."""
    from minerva_etl_46_spark.instance import (
        apply_instance,
        instance_from_yaml,
        load_live,
        part_storage,
    )
    from minerva_etl_46_spark.plans.aggregation import specs_from_instance
    from minerva_etl_46_spark.plans.materialize import MaterializationEngine
    from minerva_etl_46_spark.sources.directory import EntityDirectory

    yaml_v = INSTANCE_YAML.replace(
        "granularity: 15m\n",
        "granularity: 15m\n"
        "    entity_aggregations:\n"
        "      - {relation: cell_site, suffix: site}\n",
    )
    root = str(tmp_path / "live")
    inst = instance_from_yaml(yaml_v)
    apply_instance(root, inst)
    live = load_live(root)
    (ea,) = live.trend_stores[0].entity_aggregations
    assert (ea.relation, ea.suffix) == ("cell_site", "site")

    # cells 1,2 → site 100; cell 3 → site 200
    EntityDirectory(root).add_relation("cell_site", spark.createDataFrame(
        [(1, 100), (2, 100), (3, 200)], "source_id long, target_id long"))

    store = live.trend_stores[0]
    raw = part_storage(root, store, "traffic_15m")
    raw.write(spark.createDataFrame(
        [(c, 1704067200 + 900, 10 * c, c) for c in (1, 2, 3)],
        "entity_id long, epoch long, calls int, drops int",
    ).select("entity_id", F.timestamp_seconds("epoch").alias("ts"),
             "calls", "drops"), ts_col="ts")

    (spec,) = specs_from_instance(root, live,
                                  reprocessing_period_s=10**12)
    assert MaterializationEngine(raw.base_dir).tick(spark, spec, now=4e9)
    got = {(r.entity_id, r.bucket): (r.calls, r.drops)
           for r in spec.target.read(spark).collect()}
    assert got == {(100, 1704068100): (30, 3), (200, 1704068100): (30, 3)}
