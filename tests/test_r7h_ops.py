"""r7 batch-11 operators property-tested against independent Python
references — oracle SQL proves cross-engine parity; these prove the MATH
and the PLAN (a shared misreading of conversion/growth semantics, or a
snowflake that shuffles a dimension, would pass parity)."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

from minerva_etl_46_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_time_to_convert_matches_brute_force(spark):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr("user_id", "event_type",
                    "unix_micros(cast(ts as timestamp)) as ts_us")
        .collect()
    )  # bounded-by: sf0.001 fixture
    signup = {}
    for r in rows:
        if r.event_type == "signup":
            signup[r.user_id] = min(signup.get(r.user_id, r.ts_us),
                                    r.ts_us)
    delay = {}
    for r in rows:
        if (r.event_type == "purchase" and r.user_id in signup
                and r.ts_us >= signup[r.user_id]):
            d = r.ts_us - signup[r.user_id]
            best = delay.get(r.user_id)
            delay[r.user_id] = d if best is None else min(best, d)

    got = {r.user_id: r for r in
           QUERIES["agg_time_to_convert"](spark, SF).collect()}
    assert set(got) == set(delay)
    assert delay  # the fixture has converters
    ranked = sorted(delay.items(), key=lambda kv: (kv[1], kv[0]))
    for i, (u, d) in enumerate(ranked, start=1):
        r = got[u]
        assert r.delay_us == d
        assert r.rnk == i
        assert r.n_conv == len(ranked)
        assert r.pct_rank == pytest.approx(i / len(ranked), rel=1e-12)
        assert r.above_median == (0 if 2 * i <= len(ranked) else 1)


def test_user_growth_matches_brute_force(spark):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr("user_id",
                    "unix_micros(cast(ts as timestamp)) "
                    "div 86400000000 as d").collect()
    )  # bounded-by: sf0.001 fixture
    days = defaultdict(set)
    first = {}
    for r in rows:
        days[r.d].add(r.user_id)
        first[r.user_id] = min(first.get(r.user_id, r.d), r.d)

    got = {r.d_idx: r for r in
           QUERIES["agg_user_growth"](spark, SF).collect()}
    assert set(got) == set(days)
    cum = 0
    for d in sorted(days):
        new = sum(1 for u in days[d] if first[u] == d)
        cum += new
        r = got[d]
        assert r.dau == len(days[d])
        assert r.new_users == new
        assert r.returning_users == len(days[d]) - new
        assert r.cum_users == cum
        assert r.returning_frac == pytest.approx(
            (len(days[d]) - new) / len(days[d]), rel=1e-12)
    # the final cumulative count is the total distinct-user population
    assert cum == len(first)


def test_snowflake_matches_brute_force_and_broadcasts(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    o = {r.o_orderkey: r.o_custkey for r in
         spark.read.parquet(f"{SF}/orders.parquet").collect()}
    c = {r.c_custkey: r.c_nationkey for r in
         spark.read.parquet(f"{SF}/customer.parquet").collect()}
    nat = {r.n_nationkey: (r.n_name, r.n_regionkey) for r in
           spark.read.parquet(f"{SF}/nation.parquet").collect()}
    reg = {r.r_regionkey: r.r_name for r in
           spark.read.parquet(f"{SF}/region.parquet").collect()}
    exp_n = Counter()
    exp_rev = defaultdict(float)
    for r in li:
        cust = o.get(r.l_orderkey)
        if cust is None or cust not in c:
            continue
        nname, rkey = nat[c[cust]]
        key = (reg[rkey], nname, r.l_returnflag)
        exp_n[key] += 1
        exp_rev[key] += round(r.l_extendedprice, 2)

    df = QUERIES["join_snowflake"](spark, SF)
    got = {(r.region, r.nation, r.rf): r for r in df.collect()}
    assert set(got) == set(exp_n)
    for k, r in got.items():
        assert r.n == exp_n[k]
        assert r.revenue == pytest.approx(exp_rev[k], abs=1e-6)
    # the plan must carry three BroadcastHashJoins (dimension hops)
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("BroadcastHashJoin") >= 3


def test_percent_rank_identities(spark):
    rows = QUERIES["win_percent_rank"](spark, SF).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    for u, rs in by_user.items():
        n = len(rs)
        assert all(r.n == n for r in rs)
        for r in rs:
            if n == 1:
                assert r.pct_rank == 0.0
            else:
                assert r.pct_rank == pytest.approx(
                    (r.rnk - 1) / (n - 1), rel=1e-12)
        # rank() semantics: equal values share a rank; min rank is 1
        assert min(r.rnk for r in rs) == 1
        assert max(r.pct_rank for r in rs) <= 1.0


def test_slugify_contract(spark):
    import re

    names = {r.p_partkey: r.p_name for r in (
        spark.read.parquet(f"{SF}/part.parquet")
        .select("p_partkey", "p_name").collect())}
    rows = QUERIES["fn_slugify"](spark, SF).collect()
    assert len(rows) == len(names)
    for r in rows:
        expected = re.sub(r"-+", "-",
                          re.sub(r"[^a-z0-9]+", "-",
                                 names[r.p_partkey].lower())).strip("-")
        assert r.slug == expected
        assert r.slug_len == len(expected)
        assert re.fullmatch(r"[a-z0-9]+(-[a-z0-9]+)*", r.slug)
