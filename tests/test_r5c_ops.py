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


# ---------------------------------------------------------------------------
# r5-D: counter-reset delta, funnel progression, CDC chunking, novelty
# ---------------------------------------------------------------------------

def test_counter_reset_semantics(spark):
    from pyspark.sql import Window
    from datetime import datetime as T

    e = spark.createDataFrame(
        [
            (1, 1, T(2024, 1, 1, 0), 100.0),
            (2, 1, T(2024, 1, 1, 1), 150.0),   # +50
            (3, 1, T(2024, 1, 1, 2), 20.0),    # reset → delta = 20
            (4, 1, T(2024, 1, 1, 3), 45.0),    # +25
        ],
        "event_id int, user_id int, ts timestamp, value double",
    )
    from pyspark.sql import functions as FF

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = e.withColumn("raw_delta", FF.col("value") - FF.lag("value").over(w))
    out = {r.event_id: (r.raw_delta,
                        None if r.raw_delta is None
                        else (r.value if r.raw_delta < 0 else r.raw_delta))
           for r in d.collect()}
    assert out[1] == (None, None)
    assert out[2] == (50.0, 50.0)
    assert out[3] == (-130.0, 20.0)
    assert out[4] == (25.0, 25.0)


def test_funnel_hof_walk_matches_reference(spark):
    # adversarial orderings: stage events out of order, same-ts pairs,
    # repeated stages — the HOF walk must equal the declarative
    # min-after-previous-stage reference computed in Python
    from datetime import datetime as T
    import itertools

    rows = [
        # user 1: full funnel
        (1, T(2024, 1, 1), "signup"), (1, T(2024, 1, 2), "purchase"),
        (1, T(2024, 1, 3), "error"),
        # user 2: error BEFORE purchase → stuck at 2? no: error precedes
        # purchase so stage3 never fires after stage2
        (2, T(2024, 1, 1), "signup"), (2, T(2024, 1, 3), "purchase"),
        (2, T(2024, 1, 2), "error"),
        # user 3: purchase at the SAME ts as signup (strictly-after ⇒ no)
        (3, T(2024, 1, 1), "signup"), (3, T(2024, 1, 1), "purchase"),
        # user 4: never signed up
        (4, T(2024, 1, 1), "purchase"), (4, T(2024, 1, 2), "error"),
        # user 5: second signup later + purchase between them (counts:
        # strictly after the FIRST signup)
        (5, T(2024, 1, 1), "signup"), (5, T(2024, 1, 2), "purchase"),
        (5, T(2024, 1, 5), "signup"),
    ]

    def reference(evts):
        s1 = min((t for t, e in evts if e == "signup"), default=None)
        s2 = (min((t for t, e in evts if e == "purchase" and t > s1),
                  default=None) if s1 else None)
        s3 = (min((t for t, e in evts if e == "error" and t > s2),
                  default=None) if s2 else None)
        return 3 if s3 else 2 if s2 else 1 if s1 else 0

    expected = {
        u: reference([(t, e) for uu, t, e in rows if uu == u])
        for u in {r[0] for r in rows}
    }
    from minerva_etl_46_spark.queries import QUERIES
    import tempfile, os

    # drive through the registered builder by writing a scratch events
    # fixture shaped like the real one
    import pyspark.sql.functions as FF

    df = spark.createDataFrame(
        [(i, u, t, et, 1.0, "{}") for i, (u, t, et) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp_ntz, event_type string,"
        " value double, props string",
    )
    d = tempfile.mkdtemp(prefix="funnel_fix_")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {r.user_id: r.reached
           for r in QUERIES["win_funnel"](spark, d).collect()}
    assert out == expected, (out, expected)


def test_cdc_chunk_boundary_stability_under_edit(spark):
    # the CDC property: a one-token edit changes chunking only locally —
    # chunk boundary POSITIONS before the edit's chunk stay identical
    words = [f"w{(i * 2654435761) % 997}" for i in range(300)]
    edited = words[:]
    edited[150] = "EDITED"
    df = spark.createDataFrame(
        [("A", " ".join(words)), ("B", " ".join(edited))],
        "doc_id string, text string",
    )
    from pyspark.sql import functions as FF

    tk = FF.split(FF.col("text"), " ")
    p = df.select(
        "doc_id",
        FF.posexplode(
            FF.transform(
                FF.sequence(FF.lit(1), FF.size(tk) - FF.lit(3)),
                lambda i: FF.md5(FF.array_join(FF.slice(tk, i, 4), " ")),
            )
        ).alias("pos0", "h"),
    ).filter((FF.col("pos0") == 0) | (FF.substring("h", 1, 1) == "0"))
    bounds = {
        doc: sorted(r.pos0 for r in grp)
        for doc, grp in __import__("itertools").groupby(
            sorted(p.collect(), key=lambda r: (r.doc_id, r.pos0)),
            key=lambda r: r.doc_id,
        )
    }
    pre_a = [b for b in bounds["A"] if b < 147]   # edit touches pos >= 147
    pre_b = [b for b in bounds["B"] if b < 147]
    assert pre_a == pre_b and len(pre_a) >= 3
    post_a = [b for b in bounds["A"] if b > 150]
    post_b = [b for b in bounds["B"] if b > 150]
    assert post_a == post_b  # boundaries resync right after the edit window


def test_novelty_first_doc_is_fully_novel(spark):
    docs = [
        (1, "a b c d e f g h"),        # first doc: all grams novel
        (2, "a b c d e f g h"),        # exact dup: zero novel
        (3, "x y z a b c d e"),        # partial overlap
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from pyspark.sql import functions as FF

    tk = FF.split(FF.col("text"), " ")
    grams = (
        df.filter(FF.size(tk) >= 5)
        .select("doc_id", FF.explode(FF.transform(
            FF.sequence(FF.lit(1), FF.size(tk) - FF.lit(4)),
            lambda i: FF.array_join(FF.slice(tk, i, 5), " "),
        )).alias("gram")).distinct()
    )
    firstg = grams.groupBy("gram").agg(FF.min("doc_id").alias("fd"))
    j = grams.join(firstg, "gram")
    nov = {r.doc_id: (r.n, r.k) for r in
           j.groupBy("doc_id").agg(
               FF.count(FF.lit(1)).alias("n"),
               FF.sum(FF.when(FF.col("fd") == FF.col("doc_id"), 1)
                      .otherwise(0)).alias("k")).collect()}
    assert nov[1] == (4, 4)      # 8 tokens → 4 distinct 5-grams, all novel
    assert nov[2] == (4, 0)      # exact dup of doc 1
    assert nov[3][1] < nov[3][0]  # partial overlap → some non-novel


# ---------------------------------------------------------------------------
# r5-F: EWMA recursion and nearest-join tie logic vs Python references
# ---------------------------------------------------------------------------

def test_ewma_hof_matches_python_recursion(spark):
    import random

    rng = random.Random(42)
    rows = []
    for u in range(50):
        n = rng.randint(1, 40)
        t0 = 1_700_000_000_000_000
        for i in range(n):
            rows.append((u * 1000 + i, u, t0 + i * rng.randint(1, 10**7),
                         round(rng.uniform(-100, 100), 2)))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, value double")

    from pyspark.sql import functions as FF

    seq = df.groupBy("user_id").agg(
        FF.array_sort(FF.collect_list(FF.struct(
            FF.col("ts_us"), FF.col("event_id").alias("eid"),
            FF.col("value").alias("v")))).alias("s"))
    walk = FF.aggregate(
        "s", FF.lit(None).cast("double"),
        lambda acc, x: FF.when(acc.isNull(), x.v)
        .otherwise(acc * FF.lit(0.5) + x.v * FF.lit(0.5)))
    got = {r.user_id: r.e for r in seq.select("user_id", walk.alias("e")).collect()}

    import collections
    by_user = collections.defaultdict(list)
    for eid, u, ts, v in rows:
        by_user[u].append((ts, eid, v))
    for u, evs in by_user.items():
        acc = None
        for ts, eid, v in sorted(evs):
            acc = v if acc is None else acc * 0.5 + v * 0.5
        assert got[u] == acc, u  # bit-identical: dyadic alpha


def test_join_nearest_matches_python_reference(spark):
    # adversarial: exact ties both directions, facts before/after all
    # attrs, users with no attrs, duplicate attr ts
    attrs = [  # (user, a_us, val)
        (1, 100, "a"), (1, 200, "b"),
        (2, 500, "c"),
        (4, 100, "d"), (4, 100, "e"),  # duplicate ts -> dedup rule
    ]
    facts = [  # (event_id, user, f_us)
        (10, 1, 150),   # exact tie 50/50 -> earlier (100, "a")
        (11, 1, 149),   # nearer backward
        (12, 1, 151),   # nearer forward
        (13, 1, 50),    # before all -> forward ("a")
        (14, 1, 999),   # after all -> backward ("b")
        (15, 2, 500),   # exact hit
        (16, 3, 123),   # no attrs -> NULL
        (17, 4, 400),   # duplicate-ts attrs
    ]

    def ref(u, f):
        cand = [(abs(a - f), a, v) for uu, a, v in attrs if uu == u]
        if not cand:
            return None, -1
        # dedup equal-ts attrs: keep the LAST in input order (max event_id
        # stand-in: here later tuple wins, matching row_number desc rule)
        best = {}
        for uu, a, v in attrs:
            if uu == u:
                best[a] = v
        cand = sorted((abs(a - f), a, v) for a, v in best.items())
        _, a, v = cand[0]
        return v, a

    from pyspark.sql import functions as FF
    from minerva_etl_46_spark.operators.asof import asof_join

    a_df = spark.createDataFrame(attrs, "user_id long, a_us long, aval string")
    # replicate the registered builder's dedup: keep last per (user, ts)
    from pyspark.sql import Window as W

    a_df = (a_df.withColumn("ord", FF.monotonically_increasing_id())
            .withColumn("rn", FF.row_number().over(
                W.partitionBy("user_id", "a_us").orderBy(FF.col("ord").desc())))
            .filter(FF.col("rn") == 1).select("user_id", "a_us", "aval"))
    f_df = spark.createDataFrame(facts, "event_id long, user_id long, f_us long")

    back = asof_join(
        f_df, a_df.select("user_id", FF.col("a_us").alias("__ats_src"),
                          "aval", "a_us"),
        on="user_id", fact_ts="f_us", attr_ts="__ats_src",
        value_cols=["aval", "a_us"],
    ).withColumnRenamed("aval", "b_val").withColumnRenamed("a_us", "b_us")
    neg = a_df.select("user_id", (-FF.col("a_us")).alias("__ats_src"),
                      "aval", "a_us")
    fwd = asof_join(
        back.withColumn("__neg_f", -FF.col("f_us")), neg,
        on="user_id", fact_ts="__neg_f", attr_ts="__ats_src",
        value_cols=["aval", "a_us"],
    ).withColumnRenamed("aval", "f_val").withColumnRenamed("a_us", "fw_us")
    db = FF.abs(FF.col("b_us") - FF.col("f_us"))
    df_ = FF.abs(FF.col("fw_us") - FF.col("f_us"))
    pick_back = FF.col("fw_us").isNull() | (
        FF.col("b_us").isNotNull() & (db <= df_))
    out = {r.event_id: (r.v, r.t) for r in fwd.select(
        "event_id",
        FF.when(pick_back, FF.col("b_val")).otherwise(FF.col("f_val")).alias("v"),
        FF.coalesce(FF.when(pick_back, FF.col("b_us"))
                    .otherwise(FF.col("fw_us")), FF.lit(-1)).alias("t"),
    ).collect()}

    for eid, u, f in facts:
        v, a = ref(u, f)
        assert out[eid] == (v, a if v is not None else -1), (eid, out[eid], (v, a))
