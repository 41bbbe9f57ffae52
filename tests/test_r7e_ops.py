"""r7 batch-7 operators property-tested against independent Python
references — oracle SQL proves cross-engine parity; these prove the MATH
(a shared misreading of Luhn/lift/YoY semantics would pass parity)."""

from __future__ import annotations

import base64 as b64mod
from collections import defaultdict

import pytest

from minerva_etl_46_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_luhn_check_digits_validate(spark):
    """Minted account numbers pass an independent textbook Luhn check."""

    def luhn_ok(number: str) -> bool:
        total = 0
        for pos, ch in enumerate(reversed(number)):
            d = int(ch)
            if pos % 2 == 1:  # every second digit from the right
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    rows = QUERIES["fn_luhn"](spark, SF).collect()
    assert rows
    for r in rows:
        assert len(r.account_no) == 10
        assert r.account_no[:9] == str(r.o_custkey).zfill(9)
        assert luhn_ok(r.account_no), r.account_no
        assert r.check_digit == int(r.account_no[-1])


def test_base64_matches_python(spark):
    names = {r.p_partkey: r.p_name for r in (
        spark.read.parquet(f"{SF}/part.parquet")
        .select("p_partkey", "p_name").collect()
    )}  # bounded-by: sf0.001 fixture
    rows = QUERIES["fn_base64"](spark, SF).collect()
    assert len(rows) == len(names)
    for r in rows:
        expected = b64mod.b64encode(
            names[r.p_partkey].encode()).decode()
        assert r.b64 == expected
        assert r.b64_len == len(expected)
        assert r.roundtrip_ok == 1


def test_decile_lift_matches_brute_force(spark):
    rows = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey", "o_totalprice", "o_orderstatus").collect()
    )  # bounded-by: sf0.001 fixture
    spend = defaultdict(float)
    resp = defaultdict(int)
    for r in rows:
        spend[r.o_custkey] += round(r.o_totalprice, 2)
        if r.o_orderstatus == "F":
            resp[r.o_custkey] = 1
    ranked = sorted(spend, key=lambda c: (-spend[c], c))
    n = len(ranked)
    got = {r.decile: r for r in
           QUERIES["agg_decile_lift"](spark, SF).collect()}
    assert set(got) == set(range(1, 11))
    # ntile sizes: first (n mod 10) deciles get one extra
    base, extra = divmod(n, 10)
    start = 0
    tot_resp = sum(resp.get(c, 0) for c in ranked)
    cum = 0
    for dec in range(1, 11):
        size = base + (1 if dec <= extra else 0)
        members = ranked[start:start + size]
        start += size
        r_cnt = sum(resp.get(c, 0) for c in members)
        cum += r_cnt
        row = got[dec]
        assert row.n == size
        assert row.resp == r_cnt
        assert row.resp_rate == pytest.approx(r_cnt / size, rel=1e-12)
        assert row.lift == pytest.approx(
            (r_cnt * n) / (size * tot_resp), rel=1e-12)
        assert row.cum_gain == pytest.approx(cum / tot_resp, rel=1e-12)
    # gains must be monotone and end at 1.0
    assert got[10].cum_gain == pytest.approx(1.0, rel=1e-12)


def test_graph_degree_matches_brute_force(spark):
    li = (spark.read.parquet(f"{SF}/lineitem.parquet")
          .select("l_orderkey", "l_suppkey").collect())
    od = {r.o_orderkey: r.o_custkey for r in (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", "o_custkey").collect())}
    edges = {(od[r.l_orderkey], r.l_suppkey)
             for r in li if r.l_orderkey in od}
    cd = defaultdict(int)
    sd = defaultdict(int)
    for c, s in edges:
        cd[c] += 1
        sd[s] += 1
    exp = defaultdict(int)
    for deg in cd.values():
        exp[("cust", deg)] += 1
    for deg in sd.values():
        exp[("supp", deg)] += 1

    got = {(r.side, r.degree): r.n_nodes
           for r in QUERIES["graph_degree"](spark, SF).collect()}
    assert got == dict(exp)
    # handshake identity: sum(degree * n_nodes) equal on both sides
    cust_stubs = sum(d * n for (s, d), n in got.items() if s == "cust")
    supp_stubs = sum(d * n for (s, d), n in got.items() if s == "supp")
    assert cust_stubs == supp_stubs == len(edges)


def test_yoy_matches_brute_force(spark):
    rows = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .selectExpr("l_partkey",
                    "year(cast(l_shipdate as timestamp)) * 12 "
                    "+ month(cast(l_shipdate as timestamp)) - 1 as m",
                    "l_extendedprice").collect()
    )  # bounded-by: sf0.001 fixture
    rev = defaultdict(float)
    for r in rows:
        rev[(r.l_partkey, r.m)] += round(r.l_extendedprice, 2)

    got = {(r.l_partkey, r.m_idx): r
           for r in QUERIES["win_yoy"](spark, SF).collect()}
    assert set(got) == set(rev)
    checked_with_prev = 0
    for (part, m), v in rev.items():
        row = got[(part, m)]
        assert row.rev == pytest.approx(v, abs=1e-6)
        prev = rev.get((part, m - 12))
        if prev is None:
            assert row.prev_rev is None and row.yoy is None
        else:
            checked_with_prev += 1
            assert row.prev_rev == pytest.approx(prev, abs=1e-6)
            assert row.yoy == pytest.approx((v - prev) / prev, rel=1e-9)
    # lineitem spans multiple years: the matched branch must be exercised
    assert checked_with_prev > 0


def test_seasonality_identity(spark):
    rows = QUERIES["agg_seasonality_dow"](spark, SF).collect()
    assert len(rows) == 7  # a month of events covers every weekday slot
    tot_n = sum(r.n for r in rows)
    tot_v = sum(r.sum_v for r in rows)
    for r in rows:
        assert r.dow_avg == pytest.approx(r.sum_v / r.n, rel=1e-12)
        assert r.seasonality_idx == pytest.approx(
            (r.sum_v / r.n) / (tot_v / tot_n), rel=1e-9)
    # weighted mean of the index over rows is 1 by construction
    w = sum(r.n * r.seasonality_idx for r in rows) / tot_n
    assert w == pytest.approx(1.0, rel=1e-9)
