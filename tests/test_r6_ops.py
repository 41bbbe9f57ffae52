"""Round-6 regression tests: advice-driven hardening (asof atomic pick,
scratch-path isolation, bucketed qualified names, stateful late counters)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_asof_join_pick_is_row_atomic_under_null_values(spark):
    """ADVICE r5: with independent per-column last(ignorenulls), a NULL
    attribute value made nearest_val fall back to an OLDER row while
    nearest_ts came from the newer one. The struct-packed pick must keep
    the chosen row atomic: the latest row's NULL stays NULL."""
    from minerva_etl_46_spark.operators.asof import asof_join

    attrs = spark.createDataFrame(
        [
            (1, 100, "v-old", 100),
            (1, 200, None, 200),     # newest row has a NULL value
        ],
        "user_id int, a_ts bigint, aval string, a_us bigint",
    )
    facts = spark.createDataFrame(
        [(10, 1, 300)], "event_id int, user_id int, f_ts bigint"
    )
    row = asof_join(
        facts, attrs, on="user_id", fact_ts="f_ts", attr_ts="a_ts",
        value_cols=["aval", "a_us"],
    ).collect()[0]
    # atomic: both columns come from the ts=200 row
    assert row.a_us == 200
    assert row.aval is None  # NOT "v-old"


def test_asof_join_no_prior_row_still_all_null(spark):
    from minerva_etl_46_spark.operators.asof import asof_join

    attrs = spark.createDataFrame(
        [(1, 500, "late", 500)],
        "user_id int, a_ts bigint, aval string, a_us bigint",
    )
    facts = spark.createDataFrame(
        [(10, 1, 300)], "event_id int, user_id int, f_ts bigint"
    )
    row = asof_join(
        facts, attrs, on="user_id", fact_ts="f_ts", attr_ts="a_ts",
        value_cols=["aval", "a_us"],
    ).collect()[0]
    assert row.aval is None and row.a_us is None


def test_stateful_funnel_counts_cross_batch_late_events(spark, tmp_path):
    """ADVICE r5: a stage event arriving in a later micro-batch with an
    event-time BELOW the per-user high-water mark was silently dropped.
    It must now surface in the late_events counter."""
    import os

    from minerva_etl_46_spark.streaming.stateful import run_funnel

    src = os.path.join(str(tmp_path), "late_src")
    schema = "user_id long, ts_us long, event_type string"
    b1 = spark.createDataFrame(
        [(1, 100, "signup"), (1, 300, "purchase")], schema
    )
    # ts=200 'purchase' arrives AFTER state advanced past ts=300 → late
    b2 = spark.createDataFrame([(1, 200, "purchase")], schema)
    import time

    b1.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # FileStreamSource orders batches by mtime: b1 first
    b2.coalesce(1).write.mode("append").parquet(src)

    updates = run_funnel(spark, src, schema).toPandas()
    final = updates.groupby("user_id").max()
    # batch 2's purchase@200 sits below the batch-1 high-water mark (300)
    # and cannot advance the walk → exactly one late drop
    assert int(final.loc[1, "late_events"]) == 1
    assert int(final.loc[1, "reached"]) == 2


def test_stateful_funnel_in_order_feed_has_zero_late(spark, tmp_path):
    import os

    from minerva_etl_46_spark.streaming.stateful import run_funnel

    src = os.path.join(str(tmp_path), "inorder_src")
    schema = "user_id long, ts_us long, event_type string"
    spark.createDataFrame(
        [(1, 100, "signup"), (1, 300, "purchase"), (1, 500, "error")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    updates = run_funnel(spark, src, schema).toPandas()
    final = updates.groupby("user_id").max()
    assert int(final.loc[1, "late_events"]) == 0
    assert int(final.loc[1, "reached"]) == 3


# ---------------------------------------------------------------------------
# Property tests for the r6 operators (pure-Python references)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

samples_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),        # entity
        st.integers(0, 30),       # bucket index (hour slots, sparse)
        st.floats(-50, 50, allow_nan=False, width=32),
    ),
    min_size=1, max_size=25, unique_by=lambda t: (t[0], t[1]),
)


@SLOW
@given(samples=samples_strategy)
def test_win_interp_matches_python_reference(spark, samples):
    """The HOF segment walk must equal a straight per-entity Python
    linear interpolation over the observed [min, max] hourly grid."""
    from minerva_etl_46_spark.queries import win_interp

    base = 1704067200
    rows = [(e, base + 3600 * b, float(v)) for e, b, v in samples]
    # monkey-fixture: run the operator body on an in-memory frame by
    # writing a scratch events.parquet the key's loader expects
    import os
    import tempfile

    scratch = tempfile.mkdtemp(prefix="interp_prop_")
    spark.createDataFrame(
        [(i, r[1], r[0], "x", r[2], "{}") for i, r in enumerate(rows)],
        "event_id long, epoch long, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.timestamp_seconds(F.col("epoch"))).drop("epoch") \
     .select("event_id", "ts", "user_id", "event_type", "value", "props") \
     .write.mode("overwrite").parquet(os.path.join(scratch, "events.parquet"))

    got = {(r.user_id, r.bucket): r
           for r in win_interp(spark, scratch).collect()}

    # python reference — the key's hourly rollup routes through a
    # DECIMAL(38,4) accumulator (HALF_UP), so quantize observed values
    # the same way (Decimal(repr(v)) mirrors BigDecimal.valueOf)
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    def dec4(v: float) -> float:
        return float(Decimal(repr(float(v)))
                     .quantize(Decimal("0.0001"), ROUND_HALF_UP))

    obs = defaultdict(dict)
    for e, b, v in samples:
        obs[e][base + 3600 * b] = dec4(v)  # one sample per bucket (unique_by)
    want = {}
    for e, d in obs.items():
        ks = sorted(d)
        for bucket in range(ks[0], ks[-1] + 1, 3600):
            if bucket in d:
                want[(e, bucket)] = (1, d[bucket], False)
            else:
                p = max(k for k in ks if k < bucket)
                q = min(k for k in ks if k > bucket)
                v = d[p] + (d[q] - d[p]) * ((bucket - p) / (q - p))
                want[(e, bucket)] = (0, v, True)
    assert set(got) == set(want)
    for key, (n, v, gap) in want.items():
        r = got[key]
        assert r.n == n and r.was_gap == gap, key
        assert abs(r.v_interp - v) < 1e-9, (key, r.v_interp, v)


@SLOW
@given(samples=st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 7200),
              st.floats(-50, 50, allow_nan=False, width=32)),
    min_size=1, max_size=30))
def test_agg_ohlc_matches_python_reference(spark, samples):
    from minerva_etl_46_spark.queries import agg_ohlc

    base = 1704067200
    import os
    import tempfile

    scratch = tempfile.mkdtemp(prefix="ohlc_prop_")
    spark.createDataFrame(
        [(i, base + off, e, "x", float(v), "{}")
         for i, (e, off, v) in enumerate(samples)],
        "event_id long, epoch long, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.timestamp_seconds(F.col("epoch"))).drop("epoch") \
     .select("event_id", "ts", "user_id", "event_type", "value", "props") \
     .write.mode("overwrite").parquet(os.path.join(scratch, "events.parquet"))

    got = {(r.user_id, r.bucket): r
           for r in agg_ohlc(spark, scratch).collect()}

    from collections import defaultdict
    cells = defaultdict(list)  # (e, bucket) -> [(ts, event_id, v)]
    for i, (e, off, v) in enumerate(samples):
        ts = base + off
        cells[(e, (ts // 3600) * 3600)].append((ts, i, float(v)))
    assert set(got) == set(cells)
    for key, rows in cells.items():
        rows.sort()
        r = got[key]
        assert r.open == rows[0][2] and r.close == rows[-1][2], key
        vals = [v for _, _, v in rows]
        assert r.high == max(vals) and r.low == min(vals)
        assert r.n == len(rows)


def test_hist_quantile_daily_partials_merge_consistent(spark, tmp_path):
    """The mergeability invariant A24 exists for: weekly quantiles read
    off SUMMED daily histograms must equal quantiles computed from a
    single direct weekly histogram (same bins, same counts — the partial
    is lossless under merge, unlike a trimmed sketch)."""
    import os

    from minerva_etl_46_spark.queries import agg_hist_quantile

    base = 1704067200
    rows = [(i, base + (i * 2311) % (14 * 86400), i % 3,
             "t" + str(i % 2), float((i * 37) % 500) / 3.0, "{}")
            for i in range(2000)]
    scratch = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, epoch long, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.timestamp_seconds(F.col("epoch"))).drop("epoch") \
     .select("event_id", "ts", "user_id", "event_type", "value", "props") \
     .write.mode("overwrite").parquet(os.path.join(scratch, "events.parquet"))

    got = {(r.event_type, r.week_bucket): (r.n, r.p50_lo, r.p90_lo)
           for r in agg_hist_quantile(spark, scratch).collect()}

    # direct weekly histogram (no daily intermediate)
    e = spark.read.parquet(os.path.join(scratch, "events.parquet"))
    direct = (
        e.groupBy(
            "event_type",
            (F.floor(F.col("ts").cast("long") / 604800) * 604800)
            .cast("long").alias("week_bucket"),
            F.floor(F.col("value") / 5.0).cast("long").alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window as W
    wc = W.partitionBy("event_type", "week_bucket").orderBy("bin") \
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    wt = W.partitionBy("event_type", "week_bucket")
    t = direct.select(
        "event_type", "week_bucket", "bin", "n",
        F.sum("n").over(wc).alias("cum"), F.sum("n").over(wt).alias("total"))
    want = {(r.event_type, r.week_bucket): (r.n, r.p50_lo, r.p90_lo)
            for r in t.groupBy("event_type", "week_bucket").agg(
                F.max("total").alias("n"),
                (F.min(F.when(F.col("cum") * 2 >= F.col("total"),
                              F.col("bin"))) * 5.0).alias("p50_lo"),
                (F.min(F.when(F.col("cum") * 10 >= F.col("total") * 9,
                              F.col("bin"))) * 5.0).alias("p90_lo"),
            ).collect()}
    assert got == want and len(got) > 2


def test_upsert_tombstone_semantics(spark):
    """Delete wins when newest; a LATER re-insert resurrects the key;
    a STALE delete (older version) loses to the stored row."""
    from minerva_etl_46_spark.operators.upsert import upsert_with_tombstones

    base = spark.createDataFrame(
        [(1, 10.0, 1), (2, 20.0, 1), (3, 30.0, 1)],
        "k long, v double, ver long")
    staged = spark.createDataFrame(
        [(1, None, 2, "D"),      # newest delete → k=1 gone
         (2, 99.0, 2, "U"),      # update → k=2 rewritten
         (3, None, 0, "D")],     # STALE delete → k=3 survives as stored
        "k long, v double, ver long, op string")
    out = {r.k: (r.v, r.ver) for r in upsert_with_tombstones(
        base, staged, keys=["k"], version_cols=["ver"]).collect()}
    assert out == {2: (99.0, 2), 3: (30.0, 1)}

    # resurrection: delete at ver2, re-insert at ver3
    staged2 = spark.createDataFrame(
        [(1, None, 2, "D"), (1, 11.0, 3, "U")],
        "k long, v double, ver long, op string")
    out2 = {r.k: (r.v, r.ver) for r in upsert_with_tombstones(
        base.filter("k = 1"), staged2, keys=["k"],
        version_cols=["ver"]).collect()}
    assert out2 == {1: (11.0, 3)}


def test_sizing_plan_matches_runbook_example():
    """SCALE.md's worked example: 100 TB/year, 1000×4-core/16-GiB —
    ~275 GB/day, ~2200 scan files/day, 1024–2048 buckets, shuffle
    partitions ≈ 400/day-of-data (AQE coalesces below the static)."""
    from minerva_etl_46_spark.plans.sizing import ClusterShape, size_plan

    p = size_plan(total_tb=100)
    assert 260 <= p.daily_gb <= 290
    assert 2100 <= p.files_per_day <= 2300
    assert p.n_buckets in (1024, 2048)
    # bytes-derived count (~375) is under one-per-core, so the core
    # floor (4000) wins — utilization beats the per-day byte estimate
    assert p.shuffle_partitions_per_day == 4000
    assert p.shuffle_partitions_static == p.shuffle_partitions_per_day * 10
    assert p.max_partition_bytes == 128 * 1024 * 1024
    assert p.gib_per_core == 4.0 and not p.warnings
    confs = p.spark_confs()
    assert confs["spark.sql.adaptive.enabled"] == "true"

    # small-memory cluster degrades gracefully
    tight = size_plan(total_tb=100, cluster=ClusterShape(
        executors=100, cores_per_executor=8, mem_gib_per_executor=8))
    assert tight.max_partition_bytes == 64 * 1024 * 1024
    assert tight.warnings  # 1 GiB/core → spill warning

    # huge entity cardinality warns about broadcast budgets
    wide = size_plan(total_tb=100, entities=100_000_000)
    assert any("broadcast" in w for w in wide.warnings)


def test_cms_merge_equals_full_build_and_never_undercounts(spark):
    """The mergeable-partial contract (same as HLL/histogram partials):
    cell-wise-summed daily grids == the grid of the union; estimates
    never undercount, on both hash families."""
    from minerva_etl_46_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    a = spark.createDataFrame([(i % 7,) for i in range(300)], "k long")
    b = spark.createDataFrame([(i % 11,) for i in range(500)], "k long")
    for hash_fn in ("xxhash64", "md5"):
        merged = cms_merge(cms_build(a, "k", hash_fn=hash_fn),
                           cms_build(b, "k", hash_fn=hash_fn))
        full = cms_build(a.unionByName(b), "k", hash_fn=hash_fn)
        m = {(r.seed, r.bucket): r.cnt for r in merged.collect()}
        f = {(r.seed, r.bucket): r.cnt for r in full.collect()}
        assert m == f, hash_fn

        truth = (a.unionByName(b).groupBy("k")
                 .agg(F.count(F.lit(1)).alias("true_n")))
        est = cms_estimate(full, truth, "k", hash_fn=hash_fn)
        rows = est.collect()
        assert len(rows) == 11
        assert all(r.est_n >= r.true_n for r in rows), hash_fn


def test_cms_estimate_unseen_key_yields_zero_not_silence(spark):
    """ADVICE r6: a probed key absent from the sketched corpus must come
    back est_n=0 (min over cells including the empty ones), not vanish
    from the output, and a key with only SOME cells present must not
    inflate past the CMS bound by min-ing only surviving cells."""
    from minerva_etl_46_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    corpus = spark.createDataFrame([(i % 3,) for i in range(90)], "k long")
    sketch = cms_build(corpus, "k", d=4, w=256)
    probes = spark.createDataFrame(
        [(0,), (1,), (2,), (999_999,)], "k long")
    rows = {r.k: r.est_n for r in
            cms_estimate(sketch, probes, "k", d=4, w=256).collect()}
    assert set(rows) == {0, 1, 2, 999_999}  # nothing vanished
    assert rows[999_999] == 0  # w=256, 3 occupied cells/row → no collision
    for k in (0, 1, 2):
        assert rows[k] >= 30
