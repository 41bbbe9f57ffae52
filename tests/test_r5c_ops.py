"""Unit/property tests for the r5-C operators: fixed-width harvest,
winnowing fingerprints, SCD2 point-in-time join, deterministic mode,
ORC round-trip. Parity vs DuckDB is covered by test_oracle_parity; these
pin the operator-level semantics on adversarial synthetic frames."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from minerva_etl_46_spark.operators.textstats import (
    winnow_fingerprints,
    winnow_select,
)
from minerva_etl_46_spark.sources.harvest import read_fixed_width_harvest


# ---------------------------------------------------------------------------
# fixed-width harvest
# ---------------------------------------------------------------------------

def _write_lines(lines: list[str]) -> str:
    d = tempfile.mkdtemp(prefix="fw_test_")
    with open(os.path.join(d, "part-0.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return d


def test_fixed_width_basic(spark):
    path = _write_lines([
        "42        alpha team          7   ",
        "7         beta                99  ",
    ])
    df = read_fixed_width_harvest(
        spark, path,
        fields=[("id", 10, "bigint"), ("name", 20, "string"),
                ("n", 4, "int")],
    )
    rows = {r.id: r for r in df.collect()}
    assert rows[42].name == "alpha team" and rows[42].n == 7
    assert rows[7].name == "beta" and rows[7].n == 99


def test_fixed_width_short_line_nulls_tail(spark):
    # a truncated record yields NULLs for missing tail columns, never a
    # column shift or a crash
    path = _write_lines(["13        only-name"])
    df = read_fixed_width_harvest(
        spark, path,
        fields=[("id", 10, "bigint"), ("name", 20, "string"),
                ("n", 4, "int")],
    )
    r = df.collect()[0]
    assert r.id == 13 and r.name == "only-name" and r.n is None


def test_fixed_width_bad_type_is_null_not_shifted(spark):
    # a non-numeric slice under an int column casts to NULL (fail-visible)
    # while neighbors parse normally
    path = _write_lines(["xx        okname              5   "])
    df = read_fixed_width_harvest(
        spark, path,
        fields=[("id", 10, "bigint"), ("name", 20, "string"),
                ("n", 4, "int")],
    )
    r = df.collect()[0]
    assert r.id is None and r.name == "okname" and r.n == 5


# ---------------------------------------------------------------------------
# winnowing
# ---------------------------------------------------------------------------

def _doc(words: list[str]) -> str:
    return " ".join(words)


def test_winnow_guarantee_shared_fingerprint(spark):
    # the paper's guarantee: any shared token run of length >= w + k - 1
    # (= 8 for k=4, w=5) produces at least one shared fingerprint hash
    common = [f"c{i}" for i in range(10)]  # 10-token shared run
    a = _doc([f"a{i}" for i in range(30)] + common + [f"x{i}" for i in range(20)])
    b = _doc([f"b{i}" for i in range(15)] + common + [f"y{i}" for i in range(25)])
    df = spark.createDataFrame([("A", a), ("B", b)], "doc_id string, text string")
    sel = winnow_select(df, "doc_id", "text", k=4, w=5)
    hashes = (
        sel.groupBy("h").agg(F.collect_set("doc").alias("docs"))
        .filter(F.size("docs") == 2)
    )
    assert hashes.count() >= 1


def test_winnow_density_and_bounds(spark):
    # deterministic pseudo-random doc: density lands near the expected
    # 2/(w+1) ≈ 0.333 and every doc yields >= 1 fingerprint
    words = [f"w{(i * 2654435761) % 997}" for i in range(500)]
    df = spark.createDataFrame(
        [("L", _doc(words)), ("S", _doc(words[:5])), ("T", "a b c")],
        "doc_id string, text string",
    )
    out = {r.doc_id: r for r in
           winnow_fingerprints(df, "doc_id", "text", k=4, w=5).collect()}
    # T has 3 tokens < k ⇒ no shingles ⇒ absent
    assert set(out) == {"L", "S"}
    assert out["S"].n_fingerprints >= 1
    dens = out["L"].density
    assert 0.2 < dens < 0.5, dens
    # fingerprints never exceed shingles
    assert out["L"].n_fingerprints <= out["L"].n_shingles


def test_winnow_positions_are_window_minima(spark):
    # brute-force reference on one small doc
    import hashlib

    words = [f"t{(i * 7) % 13}" for i in range(40)]
    k, w = 4, 5
    hs = [hashlib.md5(" ".join(words[i:i + k]).encode()).hexdigest()
          for i in range(len(words) - k + 1)]
    expected = set()
    for s in range(len(hs) - w + 1):
        win = hs[s:s + w]
        m = min(win)
        # rightmost occurrence of the min
        off = max(i for i, h in enumerate(win) if h == m)
        expected.add(s + off)
    df = spark.createDataFrame([("D", _doc(words))], "doc_id string, text string")
    got = {r.sel_pos for r in
           winnow_select(df, "doc_id", "text", k=k, w=w).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# SCD2 point-in-time join / deterministic mode / ORC round-trip
# ---------------------------------------------------------------------------

def test_join_scd2_semantics(spark):
    from datetime import datetime

    from minerva_etl_46_spark.operators.asof import asof_join
    from minerva_etl_46_spark.operators.attributes import suppress_unchanged

    T = datetime
    hist = spark.createDataFrame(
        [
            (1, T(2024, 1, 1), "bronze"),
            (1, T(2024, 2, 1), "bronze"),   # no-change row → compressed out
            (1, T(2024, 3, 1), "gold"),
        ],
        "user_id int, ts timestamp, tier string",
    )
    scd = suppress_unchanged(hist, "user_id", "ts", ["tier"]).select(
        "user_id", "ts", F.col("tier").alias("tier_at")
    )
    facts = spark.createDataFrame(
        [
            (10, 1, T(2023, 12, 1)),  # before first version → NULL
            (11, 1, T(2024, 2, 15)),  # inside first period
            (12, 1, T(2024, 3, 1)),   # exactly AT the change → new value
            (13, 1, T(2024, 9, 9)),   # open end → latest
        ],
        "event_id int, user_id int, ts timestamp",
    )
    out = {r.event_id: r.tier_at for r in asof_join(
        facts, scd, on="user_id", fact_ts="ts", attr_ts="ts",
        value_cols=["tier_at"],
    ).collect()}
    assert out == {10: None, 11: "bronze", 12: "gold", 13: "gold"}


def test_agg_mode_tiebreak_is_alphabetic(spark):
    from pyspark.sql import Window

    e = spark.createDataFrame(
        [(1, "zeta"), (1, "alpha"), (1, "zeta"), (1, "alpha"), (2, "mid")],
        "user_id int, event_type string",
    )
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    out = {r.user_id: r.event_type for r in
           counts.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") == 1).collect()}
    assert out == {1: "alpha", 2: "mid"}  # 2-2 tie → alphabetic min


def test_orc_round_trip_exact(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, float("nan")), (3, "c", None)],
        "id bigint, s string, v double",
    )
    p = str(tmp_path / "orc_rt")
    df.write.mode("overwrite").orc(p)
    back = spark.read.orc(p)
    assert back.schema == df.schema
    import math

    a = sorted([tuple(r) for r in df.collect()], key=lambda t: t[0])
    b = sorted([tuple(r) for r in back.collect()], key=lambda t: t[0])
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and math.isnan(va):
                assert isinstance(vb, float) and math.isnan(vb)
            else:
                assert va == vb
