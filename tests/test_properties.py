"""Property-based tests (SURVEY.md §5.3): upsert idempotence, rollup
additivity (15m sums compose into 1h sums), as-of join equivalence with
pandas merge_asof. Small example counts — each example is a Spark job."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from minerva_etl_46_spark.catalog import Trend
from minerva_etl_46_spark.functions.timestamps import G_15M, G_1H
from minerva_etl_46_spark.operators.asof import asof_join
from minerva_etl_46_spark.operators.rollup import time_rollup
from minerva_etl_46_spark.operators.upsert import upsert_latest

SLOW = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 4),                  # key
        st.integers(1, 3),                  # version
        st.floats(-100, 100, allow_nan=False, width=32),
    ),
    min_size=0, max_size=25,
)

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),                        # entity
        st.integers(0, 2 * 3600),                 # ts offset seconds
        st.floats(-100, 100, allow_nan=False, width=32),
    ),
    min_size=1, max_size=40,
)


@SLOW
@given(rows=rows_strategy)
def test_upsert_idempotent(spark, rows):
    df = spark.createDataFrame(
        [(k, v, x) for k, v, x in rows] or [(0, 1, 0.0)],
        schema="k long, ver long, x double",
    )
    once = upsert_latest(None, df, keys=["k"], version_cols=["ver"])
    twice = upsert_latest(once, once, keys=["k"], version_cols=["ver"])
    a = once.toPandas().sort_values(["k"]).reset_index(drop=True)
    b = twice.toPandas().sort_values(["k"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])
    # exactly one row per key
    assert a["k"].is_unique


@SLOW
@given(events=events_strategy)
def test_rollup_additivity_15m_compose_1h(spark, events):
    base = 1704067200  # 2024-01-01T00:00Z
    df = spark.createDataFrame(
        [(e, base + off, float(v)) for e, off, v in events],
        schema="entity long, epoch long, v double",
    ).withColumn("ts", F.timestamp_seconds("epoch"))
    trends = {"v": Trend("v", time_aggregation="sum")}
    src = df.select("entity", "ts", "v")
    fine = time_rollup(src, "entity", "ts", G_15M, trends)
    refined = fine.select(
        "entity", F.timestamp_seconds("bucket").alias("ts"), "v"
    )
    composed = time_rollup(refined, "entity", "ts", G_1H, trends)
    direct = time_rollup(src, "entity", "ts", G_1H, trends)
    a = composed.toPandas().sort_values(["entity", "bucket"]).reset_index(drop=True)
    b = direct.toPandas().sort_values(["entity", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


@SLOW
@given(
    facts=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 1000)),
                   min_size=1, max_size=15),
    attrs=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 1000),
                             st.integers(0, 99)),
                   min_size=1, max_size=10, unique_by=lambda t: (t[0], t[1])),
)
def test_asof_join_matches_pandas_merge_asof(spark, facts, attrs):
    fdf = spark.createDataFrame(
        [(i, e, base_ts(t)) for i, (e, t) in enumerate(facts)],
        schema="fid long, entity long, epoch long",
    ).withColumn("ts", F.timestamp_seconds("epoch")).drop("epoch")
    adf = spark.createDataFrame(
        [(e, base_ts(t), float(v)) for e, t, v in attrs],
        schema="entity long, epoch long, val double",
    ).withColumn("ts", F.timestamp_seconds("epoch")).drop("epoch")
    got = (
        asof_join(fdf, adf, on="entity", fact_ts="ts", attr_ts="ts",
                  value_cols=["val"])
        .toPandas().sort_values("fid").reset_index(drop=True)
    )
    fp = fdf.toPandas().sort_values("ts", kind="mergesort")
    ap = adf.toPandas().sort_values("ts", kind="mergesort")
    want = pd.merge_asof(fp, ap, on="ts", by="entity", direction="backward")
    want = want.sort_values("fid").reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["val"], want["val"], check_names=False
    )


def base_ts(offset: int) -> int:
    return 1704067200 + offset


@SLOW
@given(
    lefts=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 7200)),
                   min_size=1, max_size=20),
    rights=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 7200)),
                    min_size=1, max_size=20),
)
def test_bucketed_range_join_matches_naive(spark, lefts, rights):
    """The bucketed range join must equal the naive conditional join on
    arbitrary (key, ts) data — including boundary timestamps."""
    from pyspark.sql import functions as F

    from minerva_etl_46_spark.operators.rangejoin import bucketed_range_join

    l = spark.createDataFrame(
        [(i, k, base_ts(t)) for i, (k, t) in enumerate(lefts)],
        schema="lid long, k long, le long",
    ).select("lid", "k", F.timestamp_seconds("le").alias("lts"))
    r = spark.createDataFrame(
        [(j, k, base_ts(t)) for j, (k, t) in enumerate(rights)],
        schema="rid long, k long, re long",
    ).select("rid", F.col("k").alias("rk"), F.timestamp_seconds("re").alias("rts"))

    got = bucketed_range_join(
        l, r.withColumnRenamed("rk", "k"), key="k",
        left_ts="lts", right_ts="rts", lower_s=-3600, upper_s=0,
    ).select("lid", "rid").collect()
    naive = l.join(
        r,
        (l.k == r.rk)
        & (r.rts > l.lts - F.expr("INTERVAL 3600 SECONDS"))
        & (r.rts <= l.lts),
        "inner",
    ).select("lid", "rid").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, naive))


@SLOW
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 7200),
                  st.integers(0, 5400)),
        min_size=1, max_size=15,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 7200),
                  st.integers(0, 5400)),
        min_size=1, max_size=15,
    ),
)
def test_interval_overlap_join_matches_naive(spark, lefts, rights):
    """interval_overlap_join must equal the naive conditional overlap join
    on arbitrary (key, start, duration) half-open intervals — including
    DURATION-ZERO (empty) intervals, which intersect nothing, plus
    bucket-boundary starts/ends and intervals spanning many buckets (the
    bucket-ownership dedup must emit each pair exactly once). The naive
    reference uses the exact max(start) < min(end) intersection test,
    which is what the operator must implement for all inputs."""
    from pyspark.sql import functions as F

    from minerva_etl_46_spark.operators.rangejoin import interval_overlap_join

    l = spark.createDataFrame(
        [(i, k, base_ts(t), base_ts(t + d)) for i, (k, t, d) in enumerate(lefts)],
        schema="lid long, k long, ls long, le long",
    ).select("lid", "k", F.timestamp_seconds("ls").alias("lstart"),
             F.timestamp_seconds("le").alias("lend"))
    r = spark.createDataFrame(
        [(j, k, base_ts(t), base_ts(t + d)) for j, (k, t, d) in enumerate(rights)],
        schema="rid long, rk long, rs long, re long",
    ).select("rid", F.col("rk").alias("k"),
             F.timestamp_seconds("rs").alias("rstart"),
             F.timestamp_seconds("re").alias("rend"))

    got = interval_overlap_join(
        l, r, key="k", l_start="lstart", l_end="lend",
        r_start="rstart", r_end="rend", bucket_s=900,
    ).select("lid", "rid").collect()
    naive = l.join(
        r.withColumnRenamed("k", "rk"),
        (l.k == F.col("rk"))
        & (F.greatest(F.col("lstart"), F.col("rstart"))
           < F.least(F.col("lend"), F.col("rend"))),
        "inner",
    ).select("lid", "rid").collect()
    got_s, naive_s = sorted(map(tuple, got)), sorted(map(tuple, naive))
    assert got_s == naive_s
    assert len(got_s) == len(set(got_s)), "bucket-ownership emitted a dup"


@SLOW
@given(
    facts=st.lists(st.integers(0, 5), min_size=1, max_size=30),
    dims=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)),
                  min_size=0, max_size=12),
)
def test_salted_join_matches_plain_join(spark, facts, dims):
    """salted_join must be result-identical to the plain equi-join on
    arbitrary data — including duplicate build-side keys (multiset join
    semantics: each fact row must meet each matching dim row exactly once,
    across every salt replica)."""
    from pyspark.sql import functions as F

    from minerva_etl_46_spark.operators.skew import salted_join

    f = spark.createDataFrame(
        [(i, k) for i, k in enumerate(facts)], schema="fid long, k long")
    d = spark.createDataFrame(
        dims or [(99, 0)], schema="k long, v long")
    got = salted_join(f, d, on="k", salt=F.xxhash64("fid"), n_salt=4)
    want = f.join(d, "k", "inner")
    g = sorted(map(tuple, got.select("fid", "k", "v").collect()))
    w = sorted(map(tuple, want.select("fid", "k", "v").collect()))
    assert g == w


ts_strategy = st.lists(
    st.integers(1577836800, 1735689600),  # 2020..2025 epoch range
    min_size=1, max_size=20,
)


@SLOW
@given(epochs=ts_strategy)
def test_alignment_invariants(spark, epochs):
    """align_floor/align_end grid laws for arbitrary timestamps (guards the
    round-2 on-grid fix): floor ≤ ts ≤ end, both on-grid, end − floor is
    one period for off-grid inputs, and on-grid inputs are fixed points of
    BOTH (floor: own period start; end: closes own period)."""
    from minerva_etl_46_spark.functions.timestamps import (
        G_15M,
        align_end,
        align_floor,
    )

    g = G_15M.seconds
    df = spark.createDataFrame([(e,) for e in epochs], "epoch long").select(
        F.timestamp_seconds("epoch").alias("ts"), "epoch"
    )
    out = df.select(
        "epoch",
        align_floor("ts", G_15M).cast("long").alias("lo"),
        align_end("ts", G_15M).cast("long").alias("hi"),
    ).collect()
    for r in out:
        e, lo, hi = r["epoch"], r["lo"], r["hi"]
        assert lo % g == 0 and hi % g == 0, "alignment off-grid"
        assert lo <= e <= hi, f"ts {e} outside [{lo}, {hi}]"
        if e % g == 0:
            assert lo == e, "on-grid ts must be its own period start (floor)"
            assert hi == e, "on-grid ts must close its own period (end)"
        else:
            assert hi - lo == g, "off-grid period must be exactly one granule"


@SLOW
@given(epochs=ts_strategy)
def test_bucket_helpers_invariant_across_fixture_shapes(spark, epochs):
    """The test fixtures have shipped ``ts`` as ns-long, ns-timestamp, and
    µs TIMESTAMP_NTZ across regenerations (the round-3 breakage class).
    normalize_ts_columns + the bucket helpers must yield IDENTICAL buckets
    from every shape: ns-since-epoch BIGINT, µs TIMESTAMP_NTZ, TIMESTAMP."""
    from minerva_etl_46_spark.functions.timestamps import (
        G_1H,
        bucket_epoch,
        bucket_epoch_end,
        normalize_ts_columns,
    )

    base = spark.createDataFrame([(e,) for e in epochs], "epoch long")
    shapes = {
        "ltz": base.select(F.timestamp_seconds("epoch").alias("ts")),
        "ntz": base.select(
            F.timestamp_seconds("epoch").cast("timestamp_ntz").alias("ts")
        ),
        "ns_long": base.select(
            (F.col("epoch") * F.lit(1_000_000_000)).alias("ts")
        ),
    }
    got = {}
    for shape, df in shapes.items():
        norm = normalize_ts_columns(df, ["ts"], table=shape)
        assert dict(norm.dtypes)["ts"] == "timestamp", shape
        got[shape] = sorted(
            (r["lo"], r["hi"])
            for r in norm.select(
                bucket_epoch("ts", G_1H).alias("lo"),
                bucket_epoch_end("ts", G_1H).alias("hi"),
            ).collect()
        )
    assert got["ltz"] == got["ntz"] == got["ns_long"]


def test_normalize_ts_rejects_non_ns_scale_longs(spark):
    """A regenerated fixture that ships epoch-µs (or ms/s) longs instead
    of ns must fail LOUDLY, not be misread by 10³–10⁹ (ADVICE r4): the
    bigint path asserts ns-magnitude (1995–2100) executor-side."""
    import pytest

    from minerva_etl_46_spark.functions.timestamps import normalize_ts_columns

    us_longs = spark.createDataFrame(
        [(1704067200 * 1_000_000,)], "ts long"  # 2024-01-01 in µs, not ns
    )
    norm = normalize_ts_columns(us_longs, ["ts"], table="events")
    with pytest.raises(Exception, match="not plausible ns-since-epoch"):
        norm.collect()
    # and the in-range ns shape still converts (guard is a no-op filter)
    ns_longs = spark.createDataFrame([(1704067200 * 1_000_000_000,)], "ts long")
    ok = normalize_ts_columns(ns_longs, ["ts"], table="events").collect()
    assert str(ok[0]["ts"]).startswith("2024-01-01")


@SLOW
@given(
    old_rows=st.lists(
        st.tuples(st.one_of(st.none(), st.integers(0, 5)),
                  st.one_of(st.none(), st.floats(-10, 10, allow_nan=False,
                                                 width=32))),
        min_size=0, max_size=12, unique_by=lambda t: t[0],
    ),
    new_rows=st.lists(
        st.tuples(st.one_of(st.none(), st.integers(0, 5)),
                  st.one_of(st.none(), st.floats(-10, 10, allow_nan=False,
                                                 width=32))),
        min_size=0, max_size=12, unique_by=lambda t: t[0],
    ),
)
def test_keyed_diff_matches_naive_dict_diff(spark, old_rows, new_rows):
    """keyed_diff must classify arbitrary snapshots — including NULL keys
    and NULL values — exactly like the naive dict-based reference:
    matched keys with equal values are silent, value changes are U,
    one-sided keys are D/I, and null keys never match (each side's
    null-keyed row reports independently as D or I)."""
    from minerva_etl_46_spark.operators.diff import keyed_diff

    old = spark.createDataFrame(old_rows, "id long, v double") \
        if old_rows else spark.createDataFrame([], "id long, v double")
    new = spark.createDataFrame(new_rows, "id long, v double") \
        if new_rows else spark.createDataFrame([], "id long, v double")
    got = {
        (r["op"], r["id"], r["old_v"], r["new_v"])
        for r in keyed_diff(old, new, keys=["id"],
                            compare_cols=["v"]).collect()
    }

    o = {k: v for k, v in old_rows if k is not None}
    n = {k: v for k, v in new_rows if k is not None}
    want = set()
    for k in o.keys() - n.keys():
        want.add(("D", k, o[k], None))
    for k in n.keys() - o.keys():
        want.add(("I", k, None, n[k]))
    for k in o.keys() & n.keys():
        if o[k] != n[k] and not (o[k] is None and n[k] is None):
            want.add(("U", k, o[k], n[k]))
    # null keys never equi-match: each side reports independently
    for k, v in old_rows:
        if k is None:
            want.add(("D", None, v, None))
    for k, v in new_rows:
        if k is None:
            want.add(("I", None, None, v))
    assert got == want
