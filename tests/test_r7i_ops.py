"""r7 batch-14/15 operators property-tested against independent Python
references — oracle SQL proves cross-engine parity; these prove the MATH
(a shared misreading of the PageRank update or the triangle orientation
would pass parity) and the scale-shape contracts."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from minerva_etl_46_spark.operators.graph import pagerank_ppb, triangles_per_node
from minerva_etl_46_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _pagerank_py(directed, iterations=3):
    """Independent integer-ppb PageRank (pure dict walk)."""
    outdeg: dict[int, int] = {}
    for s, _ in directed:
        outdeg[s] = outdeg.get(s, 0) + 1
    nodes = sorted(outdeg)
    n = len(nodes)
    rank = {v: 1_000_000_000 // n for v in nodes}
    for _ in range(iterations):
        s: dict[int, int] = {}
        for src, dst in directed:
            s[dst] = s.get(dst, 0) + rank[src] // outdeg[src]
        rank = {v: 150_000_000 // n + (85 * s.get(v, 0)) // 100
                for v in nodes}
    return rank


def test_pagerank_matches_python_reference(spark):
    # star (hub 0 ↔ leaves 1..5) plus a 3-cycle (10,11,12): asymmetric
    # degrees AND a sink-free cycle in one graph.
    und = [(0, i) for i in range(1, 6)] + [(10, 11), (11, 12), (12, 10)]
    directed = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(directed, "src long, dst long")
    got = {r.node: r.rank_ppb for r in pagerank_ppb(df, 3).collect()}
    assert got == _pagerank_py(directed, 3)
    # hub of the star must outrank every leaf
    assert all(got[0] > got[i] for i in range(1, 6))


def test_pagerank_mass_is_conserved_up_to_floor_leak(spark):
    und = [(0, i) for i in range(1, 6)] + [(10, 11), (11, 12), (12, 10)]
    directed = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(directed, "src long, dst long")
    total = (pagerank_ppb(df, 3)
             .agg(F.sum("rank_ppb").alias("t")).collect()[0].t)
    n_nodes = len({v for e in directed for v in e})
    n_edges = len(directed)
    # every div floors: ≤1 ppb lost per node per term, per iteration
    leak_bound = 3 * (n_nodes + n_edges + 1) * 2
    assert 1_000_000_000 - leak_bound <= total <= 1_000_000_000


def _pagerank_py_dangling(directed, iterations=3):
    """Independent reference WITH sink handling: nodes = union(src,dst),
    dangling mass redistributed uniformly each step (mirrors the r8
    operator contract)."""
    outdeg: dict[int, int] = {}
    nodes_s: set[int] = set()
    for s, d in directed:
        outdeg[s] = outdeg.get(s, 0) + 1
        nodes_s |= {s, d}
    nodes = sorted(nodes_s)
    n = len(nodes)
    rank = {v: 1_000_000_000 // n for v in nodes}
    for _ in range(iterations):
        dm = sum(rank[v] for v in nodes if outdeg.get(v, 0) == 0)
        s: dict[int, int] = {}
        for src, dst in directed:
            s[dst] = s.get(dst, 0) + rank[src] // outdeg[src]
        rank = {v: 150_000_000 // n
                + (85 * (s.get(v, 0) + dm // n)) // 100
                for v in nodes}
    return rank


def test_pagerank_handles_sink_nodes(spark):
    # ordinary DIRECTED graph with sinks: 1→2→3, 1→3, 4→3 — node 3 is a
    # pure sink (dst-only). Pre-r8 the operator silently dropped node 3
    # and its inflow mass; now it ranks highest (all paths lead to it)
    # and the dangling correction recycles its mass.
    directed = [(1, 2), (2, 3), (1, 3), (4, 3)]
    df = spark.createDataFrame(directed, "src long, dst long")
    got = {r.node: r.rank_ppb for r in pagerank_ppb(df, 3).collect()}
    assert got == _pagerank_py_dangling(directed, 3)
    assert set(got) == {1, 2, 3, 4}          # sink 3 has a rank row
    assert got[3] == max(got.values())       # and wins the ranking
    # sink-free graph: the dangling term is identically 0, so the
    # update must reduce to the plain reference bit-for-bit
    und = [(0, i) for i in range(1, 6)] + [(10, 11), (11, 12), (12, 10)]
    sym = und + [(b, a) for a, b in und]
    df2 = spark.createDataFrame(sym, "src long, dst long")
    got2 = {r.node: r.rank_ppb for r in pagerank_ppb(df2, 3).collect()}
    assert got2 == _pagerank_py(sym, 3)


def test_triangles_match_brute_force(spark):
    # K4 on {1,2,3,4} (4 triangles, each node in 3) + pendant 5 + a
    # separate triangle {6,7,8}
    edges = (list(combinations([1, 2, 3, 4], 2))
             + [(4, 5)] + list(combinations([6, 7, 8], 2)))
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r.n_tri for r in triangles_per_node(df).collect()}
    eset = set(edges)
    expect: dict[int, int] = {}
    nodes = sorted({v for e in edges for v in e})
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= eset:
            for v in (a, b, c):
                expect[v] = expect.get(v, 0) + 1
    assert got == expect
    assert 5 not in got  # pendant node participates in no triangle


def test_theil_sen_is_outlier_robust(spark):
    # exact line y = 7x: every pairwise slope is 7; corrupting ONE point
    # must not move the median slope (the statistic's whole claim).
    pts = [(1, m, 7.0 * m) for m in range(12)]
    corrupted = pts[:6] + [(1, 6, 1e6)] + pts[7:]

    def slope(rows):
        df = spark.createDataFrame(rows, "nation long, mi long, rev double")
        a, b = df.alias("a"), df.alias("b")
        p = a.join(b, (F.col("a.nation") == F.col("b.nation"))
                   & (F.col("a.mi") < F.col("b.mi"))).select(
            ((F.col("b.rev") - F.col("a.rev"))
             / (F.col("b.mi") - F.col("a.mi"))).alias("s"))
        return p.agg(F.median("s").alias("m")).collect()[0].m

    assert slope(pts) == 7.0
    assert abs(slope(corrupted) - 7.0) < 1e-9


def test_boxplot_fences_flag_planted_outliers(spark):
    rows = ([("a", float(v)) for v in range(1, 101)]
            + [("a", 1e5), ("a", -1e5), ("b", 5.0)])
    df = spark.createDataFrame(
        rows, "event_type string, value double"
    ).selectExpr(
        "monotonically_increasing_id() as event_id",
        "timestamp'2024-01-01 00:00:00' as ts",
        "cast(1 as bigint) as user_id", "event_type", "value",
        "'{}' as props",
    )
    q = QUERIES["agg_boxplot"]
    # drive the registered builder through a temp parquet fixture
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {r.event_type: r for r in q(spark, d).collect()}
    a = out["a"]
    assert (a.n_low, a.n_high) == (1, 1)
    assert a.q1 < a.med < a.q3
    b = out["b"]
    assert (b.n_low, b.n_high) == (0, 0) and b.iqr == 0.0


def test_partitioned_sink_read_back_prunes(spark):
    """The read side of sink_parquet_partitioned must push the day
    predicate into PartitionFilters — a scan that reads all day dirs
    for a 1/7 filter is the bug the key exists to prevent."""
    df = QUERIES["sink_parquet_partitioned"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the day predicate must appear inside PartitionFilters, not as a
    # post-scan Filter on the data columns
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "day" in pf and "% 7" in pf, pf
    # and the written layout must be one file per day (the repartition
    # contract), not tasks×days small files
    import glob
    import os

    from minerva_etl_46_spark.queries import _scratch

    root = _scratch(SF, "events_daily_parquet")
    days = [d for d in os.listdir(root) if d.startswith("day=")]
    assert days, root
    for d in days:
        files = glob.glob(os.path.join(root, d, "*.parquet"))
        assert len(files) == 1, (d, files)


def test_bloom_prefilter_has_no_false_negatives(spark):
    """The Bloom contract: false positives allowed, false NEGATIVES never
    — every exact duplicate must pass the filter."""
    out = QUERIES["llm_bloom_prefilter"](spark, SF).collect()
    assert out
    for r in out:
        if r.exact_dup == 1:
            assert r.bloom_hit == 1, r
        assert r.false_positive == (1 if r.bloom_hit and not r.exact_dup
                                    else 0), r


def test_kendall_matches_python_reference(spark):
    rows = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(spark.read.parquet(f"{SF}/customer.parquet"),
              F.col("o_custkey") == F.col("c_custkey"))
        .selectExpr("c_nationkey as nation",
                    "year(cast(o_orderdate as timestamp)) * 12"
                    " + month(cast(o_orderdate as timestamp)) - 1 as mi",
                    "cast(o_totalprice as decimal(38,4)) as rev")
        .collect()
    )  # bounded-by: sf0.001 fixture
    from collections import defaultdict
    from decimal import Decimal

    series: dict[int, dict[int, list]] = defaultdict(
        lambda: defaultdict(lambda: [Decimal(0), 0]))
    for r in rows:
        cell = series[r.nation][r.mi]
        cell[0] += r.rev
        cell[1] += 1
    expect = {}
    for nation, months in series.items():
        ms = sorted(months)
        conc = disc = pairs = 0
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                (xa, ya), (xb, yb) = months[ms[i]], months[ms[j]]
                pairs += 1
                s = ((xb > xa) - (xb < xa)) * ((yb > ya) - (yb < ya))
                conc += s > 0
                disc += s < 0
        expect[nation] = (pairs, conc, disc)
    got = {r.nation: (r.n_pairs, r.concordant, r.discordant)
           for r in QUERIES["agg_kendall"](spark, SF).collect()}
    assert got == expect


def test_mann_whitney_matches_python_reference(spark):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type").isin("click", "error"))
        .select("event_type", "value").collect()
    )  # bounded-by: sf0.001 fixture
    xs = sorted((r.value, r.event_type) for r in rows)
    n = len(xs)
    # tie-averaged ranks, computed independently
    ranks: list[float] = [0.0] * n
    i = 0
    while i < n:
        j = i
        while j < n and xs[j][0] == xs[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0
        for k in range(i, j):
            ranks[k] = avg
        i = j
    n1 = sum(1 for _, t in xs if t == "click")
    n2 = n - n1
    r1 = sum(rk for rk, (_, t) in zip(ranks, xs) if t == "click")
    u1 = r1 - n1 * (n1 + 1) / 2.0
    got = QUERIES["agg_mann_whitney"](spark, SF).collect()[0]
    assert (got.n1, got.n2) == (n1, n2)
    assert abs(got.u1 - u1) < 1e-9
    # z magnitude should be sane for same-distribution fixture groups
    assert abs(got.z) < 10


def test_ab_test_z_matches_formula(spark):
    import math

    out = {r.variant: r for r in QUERIES["agg_ab_test"](spark, SF).collect()}
    assert set(out) == {"view", "signup", "purchase", "error"}
    for r in out.values():
        p_pool = (r.conv_a + r.conv_b) / (r.n_a + r.n_b)
        se = math.sqrt(p_pool * (1 - p_pool) * (1 / r.n_a + 1 / r.n_b))
        assert abs(r.z - (r.p_a - r.p_b) / se) < 1e-12


def test_profile_counts_are_exact(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    total = o.count()
    out = {r.col_name: r for r in QUERIES["agg_profile"](spark, SF).collect()}
    assert set(out) == {"o_orderkey", "o_custkey", "o_orderstatus",
                        "o_orderpriority"}
    for r in out.values():
        assert r.n == total
    assert out["o_orderkey"].n_distinct == total  # primary key
    assert out["o_orderstatus"].n_distinct <= 3
    assert out["o_orderpriority"].min_val == "1-URGENT"
    assert out["o_orderpriority"].max_val == "5-LOW"


def test_overwrite_partition_touches_only_the_revised_day(spark):
    """Dynamic overwrite's whole contract: the revision write must leave
    every other day's files byte-identical (same names, sizes, mtimes)."""
    import os

    from minerva_etl_46_spark.queries import _scratch
    from minerva_etl_46_spark.sources.trendstore import TrendStorePartStorage

    store = TrendStorePartStorage(
        base_dir=_scratch(SF, "events_dpo_isolation"), name="events_v")
    e = (spark.read.parquet(f"{SF}/events.parquet")
         .selectExpr("event_id", "cast(ts as timestamp) as ts",
                     "user_id", "event_type", "value"))
    store.write(e, ts_col="ts")

    def snapshot():
        snap = {}
        for d in os.listdir(store.path):
            if not d.startswith("p_bucket="):
                continue
            for f in os.listdir(os.path.join(store.path, d)):
                p = os.path.join(store.path, d, f)
                st = os.stat(p)
                snap[p] = (st.st_size, st.st_mtime_ns)
        return snap

    before = snapshot()
    b0 = min(int(d.split("=")[1]) for d in os.listdir(store.path)
             if d.startswith("p_bucket="))
    target = b0 + 3 * 86400
    from pyspark.sql import functions as SF_

    rev = (e.filter(SF_.expr("(unix_micros(ts) div 86400000000) * 86400")
                    == target)
           .withColumn("value", SF_.col("value") + 1000.0))
    assert rev.count() > 0
    store.write(rev, ts_col="ts")
    after = snapshot()
    changed_dirs = set()
    for p in set(before) | set(after):
        if before.get(p) != after.get(p):
            changed_dirs.add(p.split("p_bucket=")[1].split("/")[0])
    assert changed_dirs == {str(target)}, changed_dirs


def test_skew_report_flags_a_planted_hot_key(spark):
    import tempfile

    rows = [(i % 1000, i % 100, i % 10) for i in range(10_000)]
    rows += [(7, 7, 7)] * 5_000  # hot key on every column
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_suppkey long")
    with tempfile.TemporaryDirectory() as d:
        df.selectExpr("l_orderkey", "l_partkey", "l_suppkey",
                      "timestamp'2024-01-01' as l_shipdate") \
          .write.parquet(f"{d}/lineitem.parquet")
        out = {r.col_name: r
               for r in QUERIES["agg_skew_report"](spark, d).collect()}
    for col, n_distinct in (("l_orderkey", 1000), ("l_partkey", 100),
                            ("l_suppkey", 10)):
        r = out[col]
        assert r.hot_key == 7
        assert r.n_rows == 15_000 and r.n_distinct == n_distinct
        uniform = r.n_rows / r.n_distinct
        assert abs(r.skew_ratio - r.max_cnt / uniform) < 1e-12
        assert r.skew_ratio > 3  # the planted skew is flagged


def test_zorder_is_a_bijective_interleave(spark):
    """Morton code contract: z is a bijection of (x, y) on the 10-bit
    grid, and matches the python bit-interleave reference."""
    pts = [(x, y) for x in (0, 1, 5, 511, 1023) for y in (0, 2, 7, 1023)]
    df = spark.createDataFrame(pts, "x long, y long")
    z_expr = F.expr(
        "aggregate(sequence(0, 9), cast(0 as bigint), (acc, i) -> "
        "acc + shiftleft((x >> i) & 1, 2 * i) "
        "+ shiftleft((y >> i) & 1, 2 * i + 1))")
    got = {(r.x, r.y): r.z for r in df.select("x", "y",
                                              z_expr.alias("z")).collect()}

    def morton(x, y):
        z = 0
        for i in range(10):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y)
    assert len(set(got.values())) == len(got)  # bijective on the sample


def test_records_match_brute_force(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "event_id", "user_id", "value",
        "unix_micros(cast(ts as timestamp)) as ts_us").collect()
    # bounded-by: sf0.001 fixture
    from collections import defaultdict

    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    expect = {}
    for rs in by_user.values():
        best = None
        for r in sorted(rs, key=lambda r: (r.ts_us, r.event_id)):
            rec = 1 if best is None or r.value > best else 0
            best = r.value if rec else best
            expect[r.event_id] = rec
    got = {r.event_id: r.is_record
           for r in QUERIES["win_records"](spark, SF).collect()}
    assert got == expect


def test_embed_outlier_finds_a_planted_flipped_vector(spark):
    """Negating one vector of a tight cluster must make it that label's
    rank-1 outlier (cosine to centroid ≈ −1)."""
    import tempfile

    base = [0.1 * (i % 7) + 0.3 for i in range(64)]
    rows = []
    for v in range(20):
        vec = [x + 0.001 * v for x in base]
        rows.append((v, vec, 0))
    rows.append((99, [-x for x in base], 0))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/embeddings.parquet")
        out = QUERIES["llm_embed_outliers"](spark, d).collect()
    r1 = [r for r in out if r.rk == 1][0]
    assert r1.vec_id == 99
    assert r1.cos_centroid < -0.5


def test_revenue_bridge_identity_holds_exactly(spark):
    """Delta(total revenue) must equal new - churned + expansion -
    contraction for every month after the first — the waterfall's
    defining identity, exact to the cent."""
    rows = QUERIES["agg_revenue_bridge"](spark, SF).collect()
    o = spark.read.parquet(f"{SF}/orders.parquet").selectExpr(
        "year(cast(o_orderdate as timestamp)) * 12"
        " + month(cast(o_orderdate as timestamp)) - 1 as mi",
        "cast(o_totalprice as decimal(38,4)) as rev")
    totals = {r.mi: float(r.t) for r in
              o.groupBy("mi").agg(F.sum("rev").alias("t")).collect()}
    months = sorted(totals)
    by_mi = {r.mi: r for r in rows}
    for prev, cur in zip(months, months[1:]):
        if cur != prev + 1:
            continue  # bridge rows only decompose adjacent months
        r = by_mi[cur]
        delta = totals[cur] - totals[prev]
        decomp = r.new_rev - r.churned_rev + r.expansion - r.contraction
        assert abs(delta - decomp) < 1e-6, (cur, delta, decomp)


def test_target_encode_matches_brute_force(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "event_type", "value").collect()
    # bounded-by: sf0.001 fixture
    from collections import defaultdict

    sums = defaultdict(float)
    ns = defaultdict(int)
    for r in rows:
        sums[r.event_type] += r.value
        ns[r.event_type] += 1
    got = {r.event_id: r for r in
           QUERIES["agg_target_encode"](spark, SF).collect()}
    assert len(got) == len(rows)
    for r in rows:
        g = got[r.event_id]
        if ns[r.event_type] > 1:
            expect = (sums[r.event_type] - r.value) / (ns[r.event_type] - 1)
            assert abs(g.loo_mean - expect) < 1e-6
        else:
            assert g.loo_mean is None


def test_drift_tv_bounds_and_identical_distributions(spark):
    """TV is 0 for identical distributions, 1 for disjoint ones, and the
    registered key must match a brute-force python TV on the fixture."""
    import tempfile
    from collections import Counter

    def run(rows):
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, "
                  "value double, week long"
        ).selectExpr(
            "event_id",
            "timestamp_seconds(week * 7 * 86400 + 1) as ts",
            "user_id", "event_type", "value", "'{}' as props")
        with tempfile.TemporaryDirectory() as d:
            df.write.parquet(f"{d}/events.parquet")
            return {r.event_type: r
                    for r in QUERIES["agg_drift_tv"](spark, d).collect()}

    same = [(i, 1, "a", float(i % 5), i % 2) for i in range(200)]
    out = run(same)
    assert abs(out["a"].tv_distance) < 1e-12

    disjoint = ([(i, 1, "b", 0.0, 0) for i in range(100)]
                + [(100 + i, 1, "b", 100.0, 1) for i in range(100)])
    out = run(disjoint)
    assert abs(out["b"].tv_distance - 1.0) < 1e-12

    # fixture brute force
    rows = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "event_type",
        "cast(floor(unix_micros(cast(ts as timestamp))"
        " / (86400000000 * 7)) as long) % 2 as grp",
        "cast(floor(value / 20) as long) as bucket").collect()
    a, b = Counter(), Counter()
    na, nb = Counter(), Counter()
    for r in rows:
        (a if r.grp == 0 else b)[(r.event_type, r.bucket)] += 1
        (na if r.grp == 0 else nb)[r.event_type] += 1
    got = {r.event_type: r for r in QUERIES["agg_drift_tv"](spark, SF).collect()}
    for et in na:
        buckets = {k[1] for k in list(a) + list(b) if k[0] == et}
        tv = sum(abs(a[(et, bk)] / na[et] - b[(et, bk)] / nb[et])
                 for bk in buckets) / 2
        assert abs(got[et].tv_distance - tv) < 1e-9


def test_unit_parse_known_values(spark):
    out = {r.size_str: r.n_bytes
           for r in QUERIES["fn_unit_parse"](spark, SF).collect()}
    for s, n in out.items():
        num = int("".join(ch for ch in s if ch.isdigit()))
        u = s.replace(str(num), "").strip().upper()
        mult = {"B": 1, "KB": 1000, "MB": 10**6, "GIB": 2**30,
                "MIB": 2**20, "KIB": 2**10}[u]
        assert n == num * mult, (s, n)


def test_freshness_anchor_is_data_max_not_wallclock(spark):
    rows = QUERIES["agg_freshness"](spark, SF).collect()
    assert min(r.lag_us for r in rows) == 0  # the newest feed lags zero
    for r in rows:
        assert r.lag_hours == r.lag_us // 3600000000
        expect = ("fresh" if r.lag_us < 3600000000
                  else "stale" if r.lag_us < 86400000000 else "dead")
        assert r.status == expect


def test_decay_score_halves_per_day(spark):
    """A sample k days old must contribute value/2^k exactly."""
    import tempfile

    rows = [(i, 1, "a", 100.0, i) for i in range(5)]  # day 0..4, val 100
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "value double, day long"
    ).selectExpr("event_id", "timestamp_seconds(day * 86400) as ts",
                 "user_id", "event_type", "value", "'{}' as props")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = QUERIES["agg_decay_score"](spark, d).collect()[0]
    # anchor = day 4; ages 4..0 → weights 1/16..1
    expect = sum(100.0 / 2 ** age for age in range(5))
    assert abs(out.decayed_score - expect) < 1e-9
    assert out.raw_sum == 500.0


def test_interval_merge_matches_brute_force(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "user_id", "event_id",
        "unix_micros(cast(ts as timestamp)) as s").collect()
    # bounded-by: sf0.001 fixture
    W = 1_800_000_000
    from collections import defaultdict

    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.s, r.event_id))
    expect = {}
    for u, iv in by_user.items():
        iv.sort()
        islands = []
        for s, _ in iv:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], s + W)
                islands[-1][2] += 1
            else:
                islands.append([s, s + W, 1])
        expect[u] = [(a, b, n) for a, b, n in islands]
    got = defaultdict(list)
    for r in sorted(QUERIES["win_interval_merge"](spark, SF).collect(),
                    key=lambda r: (r.user_id, r.island)):
        got[r.user_id].append(
            (r.island_start_us, r.island_end_us, r.n_events))
        assert r.duration_us == r.island_end_us - r.island_start_us
    assert dict(got) == expect


def test_ri_audit_flags_planted_orphans(spark):
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        for t in ("orders", "part", "supplier", "customer"):
            spark.read.parquet(f"{SF}/{t}.parquet").write.parquet(
                f"{d}/{t}.parquet")
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        # corrupt 3 rows' partkey to an id no dimension carries
        bad = li.limit(3).withColumn("l_partkey",
                                     F.lit(99_999_999).cast("long"))
        li.unionByName(bad).write.parquet(f"{d}/lineitem.parquet")
        out = {r.fk: r for r in QUERIES["agg_ri_audit"](spark, d).collect()}
    assert out["l_partkey->part"].n_orphans == 3
    assert out["l_orderkey->orders"].n_orphans == 0
    assert abs(out["l_partkey->part"].orphan_rate
               - 3 / out["l_partkey->part"].n_rows) < 1e-15


def test_calendar_spine_is_dense_and_flags_weekends(spark):
    rows = sorted(QUERIES["fn_calendar_spine"](spark, SF).collect(),
                  key=lambda r: r.day)
    days = [r.day for r in rows]
    assert days == list(range(days[0], days[-1] + 1))  # no holes
    import datetime

    for r in rows[:30]:
        d = datetime.date(1970, 1, 1) + datetime.timedelta(days=r.day)
        # dow contract: (day+4) % 7 with 0 = Sunday
        assert r.dow == (d.weekday() + 1) % 7
        assert r.is_workday == (0 if r.dow in (0, 6) else 1)


def test_dq_checks_count_planted_violations(spark):
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        bad = (li.limit(2)
               .withColumn("l_quantity", F.lit(-5.0))
               .withColumn("l_returnflag", F.lit("X")))
        li.unionByName(bad).write.parquet(f"{d}/lineitem.parquet")
        out = {r.rule: r for r in QUERIES["agg_dq_checks"](spark, d).collect()}
    assert out["quantity_positive"].n_violations == 2
    assert out["flag_in_domain"].n_violations == 2
    assert out["discount_in_range"].n_violations == 0


def test_twr_matches_python_chain(spark):
    """TWR must equal the chained product of daily relative changes,
    and be invariant to WHEN a doubling happens (the metric's claim)."""
    import tempfile

    def run(levels):
        rows = [(i, 1, "a", float(v), i) for i, v in enumerate(levels)]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, "
                  "value double, day long"
        ).selectExpr("event_id", "timestamp_seconds(day * 86400) as ts",
                     "user_id", "event_type", "value", "'{}' as props")
        with tempfile.TemporaryDirectory() as d:
            df.write.parquet(f"{d}/events.parquet")
            return QUERIES["win_twr"](spark, d).collect()[0].twr

    assert abs(run([100, 200, 200, 200]) - 1.0) < 1e-12  # early doubling
    assert abs(run([100, 100, 100, 200]) - 1.0) < 1e-12  # late doubling
    levels = [100, 150, 120, 240, 180]
    expect = 1.0
    for a, b in zip(levels, levels[1:]):
        expect *= 1.0 + (b - a) / a
    assert abs(run(levels) - (expect - 1.0)) < 1e-12


def test_stream_topk_ranks_every_window(spark):
    out = QUERIES["stream_topk"](spark, SF).collect()
    by_bucket: dict[int, list] = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert by_bucket
    for bucket, rows in by_bucket.items():
        rks = sorted(r.rk for r in rows)
        assert rks == list(range(1, len(rks) + 1)), (bucket, rks)
        assert len(rks) <= 3
        ordered = sorted(rows, key=lambda r: (-r.n, r.event_type))
        assert [r.rk for r in ordered] == rks, (bucket, ordered)


def test_profile_handles_quoted_and_backticked_column_names(spark):
    """Column names carrying a single quote or a backtick must survive
    the stack() SQL interpolation (r9 escaping fix): the label is the
    exact name and the identifier resolves — no parse error, no
    mislabeled col_name."""
    from minerva_etl_46_spark.operators.profile import (
        profile_table, skew_report)

    df = (spark.range(10)
          .selectExpr("id as c1", "id % 3 as c2", "id % 3 as c3")
          .withColumnRenamed("c1", "it's")    # raw names, no SQL parse
          .withColumnRenamed("c2", "a`b")
          .withColumnRenamed("c3", "a\\b"))
    prof = {r.col_name: r for r in profile_table(df).collect()}
    # backslash names: trailing-\ would eat the literal's closing quote
    # and interior \ silently collapses without doubling (r9 escape fix)
    assert set(prof) == {"it's", "a`b", "a\\b"}
    assert prof["it's"].n == 10 and prof["it's"].n_distinct == 10
    assert prof["a`b"].n_distinct == 3
    assert prof["a\\b"].n_distinct == 3
    df2 = spark.range(4).toDF("tail\\")
    assert [r.col_name for r in profile_table(df2).collect()] == ["tail\\"]
    sk = {r.col_name: r
          for r in skew_report(df, ["it's", "a`b", "a\\b"]).collect()}
    assert sk["a`b"].n_distinct == 3 and sk["it's"].n_rows == 10
    assert sk["a\\b"].n_distinct == 3


def test_paio_append_is_staged_and_spark_readable(spark):
    """append_table must leave NO temp residue (it stages via a dotted
    .tmp and os.replace — the r9 crash-safety fix) and the directory
    must read back through spark.read.parquet; a leftover dotted file
    from a simulated crash is ignored by the reader as hidden."""
    import os
    import tempfile

    import pyarrow as pa

    from minerva_etl_46_spark.sources.paio import append_table

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "log")
        append_table(p, pa.table({"a": [1, 2], "b": ["x", "y"]}))
        append_table(p, pa.table({"a": [3], "b": ["z"]}))
        names = sorted(os.listdir(p))
        assert all(n.startswith("part-") and n.endswith(".parquet")
                   for n in names), names
        # simulate a crashed writer: truncated dotted temp left behind
        with open(os.path.join(p, ".part-dead.parquet.tmp"), "wb") as f:
            f.write(b"\x00garbage")
        got = sorted((r.a, r.b) for r in spark.read.parquet(p).collect())
        assert got == [(1, "x"), (2, "y"), (3, "z")]
