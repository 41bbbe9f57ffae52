"""r7 batch-3 operators property-tested against independent Python
references — oracle SQL proves cross-engine parity; these prove the MATH
(a shared misreading of lift/median/gap semantics would pass parity)."""

from __future__ import annotations

from itertools import combinations

import pytest

from minerva_etl_46_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_basket_pairs_match_brute_force_lift(spark):
    """Pair support and lift recomputed from raw baskets in plain Python."""
    rows = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_partkey").collect()
    )  # bounded-by: sf0.001 fixture
    baskets: dict = {}
    for r in rows:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    item = {}
    pair = {}
    for b in baskets.values():
        for p in b:
            item[p] = item.get(p, 0) + 1
        for p1, p2 in combinations(sorted(b), 2):
            pair[(p1, p2)] = pair.get((p1, p2), 0) + 1
    n = len(baskets)
    exp = {
        k: (c, item[k[0]], item[k[1]], (c * n) / (item[k[0]] * item[k[1]]))
        for k, c in pair.items() if c >= 2
    }

    got = {(r.p1, r.p2): (r.pair_cnt, r.c1, r.c2, r.lift)
           for r in QUERIES["agg_basket_pairs"](spark, SF).collect()}
    assert set(got) == set(exp)
    for k, (c, c1, c2, lift) in exp.items():
        gc, g1, g2, gl = got[k]
        assert (gc, g1, g2) == (c, c1, c2), k
        assert gl == pytest.approx(lift, rel=1e-12), k
        # lift of a pair seen together ≥ once is strictly positive
        assert gl > 0


def test_paths_match_brute_force_trigrams(spark):
    """Trigram path counts recomputed from per-user ordered streams."""
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type").collect()
    )  # bounded-by: sf0.001 fixture (1000 events)
    streams: dict = {}
    for r in rows:
        streams.setdefault(r.user_id, []).append(
            (r.ts, r.event_id, r.event_type))
    exp: dict = {}
    for s in streams.values():
        s.sort()
        types = [t for _, _, t in s]
        for i in range(len(types) - 2):
            k = (types[i], types[i + 1], types[i + 2])
            exp[k] = exp.get(k, 0) + 1
    total = sum(exp.values())

    got = {(r.e1, r.e2, r.e3): (r.cnt, r.share)
           for r in QUERIES["agg_paths"](spark, SF).collect()}
    assert set(got) == set(exp)
    for k, c in exp.items():
        assert got[k][0] == c, k
        assert got[k][1] == pytest.approx(c / total, rel=1e-12), k
    assert sum(c for c, _ in got.values()) == total


def test_rolling_median_matches_sorted_window_pick(spark):
    """Lower median over each trailing 5-bucket frame, from scratch."""
    from decimal import Decimal

    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts", "value").collect()
    )  # bounded-by: sf0.001 fixture
    hourly: dict = {}
    for r in rows:
        b = (int(r.ts.timestamp() * 1_000_000) // 3_600_000_000) * 3600
        key = (r.user_id, b)
        hourly[key] = hourly.get(key, Decimal(0)) + \
            Decimal(str(r.value)).quantize(Decimal("0.0001"))
    series: dict = {}
    for (u, b), v in sorted(hourly.items()):
        series.setdefault(u, []).append((b, v))
    exp = {}
    for u, pts in series.items():
        for i, (b, v) in enumerate(pts):
            win = sorted(x for _, x in pts[max(0, i - 4): i + 1])
            exp[(u, b)] = (float(v), float(win[(len(win) + 1) // 2 - 1]),
                           len(win))

    got = {(r.user_id, r.bucket): (r.v, r.rmed, r.n_window)
           for r in QUERIES["win_rolling_median"](spark, SF).collect()}
    assert set(got) == set(exp)
    for k, (v, med, n) in exp.items():
        gv, gm, gn = got[k]
        assert gn == n, k
        assert gv == pytest.approx(v, rel=1e-9), k
        assert gm == pytest.approx(med, rel=1e-9), k


def test_entropy_bits_formula_and_bounds(spark):
    """Integer-bits entropy recomputed from raw counts; bounds hold."""
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_type").collect()
    )  # bounded-by: sf0.001 fixture
    cnt: dict = {}
    for r in rows:
        cnt[(r.user_id, r.event_type)] = cnt.get(
            (r.user_id, r.event_type), 0) + 1
    tot: dict = {}
    for (u, _), c in cnt.items():
        tot[u] = tot.get(u, 0) + c
    exp: dict = {}
    for (u, _), c in cnt.items():
        bits = len(bin(tot[u])) - len(bin(c))
        s, n, sb = exp.get(u, (0, 0, 0))
        exp[u] = (s + c, n + 1, sb + c * bits)

    got = {r.user_id: r
           for r in QUERIES["agg_entropy"](spark, SF).collect()}
    assert set(got) == set(exp)
    for u, (s, n, sb) in exp.items():
        r = got[u]
        assert (r.n_events, r.n_types, r.sum_bits) == (s, n, sb), u
        assert r.entropy_bits == pytest.approx(sb / s, rel=1e-12), u
        # a single-type user has zero surprisal; bits are never negative
        assert r.entropy_bits >= 0.0
        if r.n_types == 1:
            assert r.sum_bits == 0


def test_gaps_match_set_difference(spark):
    """Two-level gap union == set-difference over the filtered keyspace."""
    keys = sorted(
        r.o_orderkey
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .filter("o_orderstatus = 'F'").select("o_orderkey").collect()
    )  # bounded-by: sf0.001 fixture
    present = set(keys)
    exp = []
    run = None
    for k in range(keys[0], keys[-1] + 1):
        if k not in present:
            if run is None:
                run = k
        elif run is not None:
            exp.append((run, k - 1, k - run))
            run = None
    got = sorted(
        (r.gap_start, r.gap_end, r.gap_len)
        for r in QUERIES["agg_gaps"](spark, SF).collect())
    assert got == sorted(exp)
    # gaps tile: every reported range is wholly absent, flanked by keys
    for s, e, ln in got:
        assert ln == e - s + 1
        assert (s - 1) in present and (e + 1) in present
        assert all(x not in present for x in range(s, e + 1))


def test_rfm_quintiles_match_ntile_definition(spark):
    """R/F/M scores recomputed with the standard ntile split (first
    size%5 buckets get the extra row) over (metric, custkey) order."""
    rows = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey", "o_orderdate", "o_totalprice").collect()
    )  # bounded-by: sf0.001 fixture
    from decimal import Decimal

    base: dict = {}
    for r in rows:
        day = int(r.o_orderdate.timestamp() * 1_000_000) // 86_400_000_000
        rd, fc, ms = base.get(r.o_custkey, (-1, 0, Decimal(0)))
        base[r.o_custkey] = (
            max(rd, day), fc + 1,
            ms + Decimal(str(r.o_totalprice)).quantize(Decimal("0.01")))

    def ntile5(order):
        n = len(order)
        lo, extra = n // 5, n % 5
        out, i = {}, 0
        for b in range(1, 6):
            size = lo + (1 if b <= extra else 0)
            for k in order[i:i + size]:
                out[k] = b
            i += size
        return out

    custs = list(base)
    r_sc = ntile5(sorted(custs, key=lambda c: (base[c][0], c)))
    f_sc = ntile5(sorted(custs, key=lambda c: (base[c][1], c)))
    m_sc = ntile5(sorted(custs, key=lambda c: (base[c][2], c)))

    got = {r.o_custkey: r for r in QUERIES["agg_rfm"](spark, SF).collect()}
    assert set(got) == set(custs)
    for c in custs:
        g = got[c]
        assert (g.r_day, g.f_cnt) == (base[c][0], base[c][1]), c
        assert g.m_sum == pytest.approx(float(base[c][2]), rel=1e-12)
        assert (g.r, g.f, g.m) == (r_sc[c], f_sc[c], m_sc[c]), c
        assert g.segment == f"{g.r}{g.f}{g.m}"


def test_abc_classes_match_cumulative_share(spark):
    """Class boundaries recomputed with exact Decimal cumulative sums."""
    from decimal import Decimal

    rows = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_partkey", "l_extendedprice").collect()
    )  # bounded-by: sf0.001 fixture
    rev: dict = {}
    for r in rows:
        rev[r.l_partkey] = rev.get(r.l_partkey, Decimal(0)) + \
            Decimal(str(r.l_extendedprice)).quantize(Decimal("0.01"))
    order = sorted(rev, key=lambda k: (-rev[k], k))
    tot = sum(rev.values())
    exp, cum = {}, Decimal(0)
    for i, k in enumerate(order, 1):
        cum += rev[k]
        cls = "A" if 100 * cum <= 80 * tot else (
            "B" if 100 * cum <= 95 * tot else "C")
        exp[k] = (i, cls)

    got = {r.l_partkey: r for r in QUERIES["agg_abc"](spark, SF).collect()}
    assert set(got) == set(exp)
    for k, (rnk, cls) in exp.items():
        assert (got[k].rnk, got[k].abc_class) == (rnk, cls), k
        assert got[k].rev == pytest.approx(float(rev[k]), rel=1e-12)
    # every A part outranks every B part outranks every C part
    ranks = {c: [r.rnk for r in got.values() if r.abc_class == c]
             for c in "ABC"}
    assert max(ranks["A"], default=0) < min(ranks["B"], default=10**9)
    assert max(ranks["B"], default=0) < min(ranks["C"], default=10**9)


def test_workdays_match_datetime_weekday_loop(spark):
    """Closed-form weekday count == the brute per-day weekday() walk."""
    import datetime as dt

    got = QUERIES["fn_workdays"](spark, SF).collect()
    assert len(got) > 0
    epoch = dt.date(1970, 1, 1)
    for r in got[:500]:
        a = epoch + dt.timedelta(days=min(r.d_order, r.d_ship))
        b = epoch + dt.timedelta(days=max(r.d_order, r.d_ship))
        brute = sum(
            1 for i in range((b - a).days + 1)
            if (a + dt.timedelta(days=i)).weekday() < 5)
        assert r.work_days == brute, (r.l_orderkey, r.l_linenumber)
        assert r.cal_days == r.d_ship - r.d_order
        assert r.ships_before_order == (1 if r.d_ship < r.d_order else 0)


def test_scan_evolved_union_shape(spark):
    """mergeSchema read = narrow rows with sentinel + wide rows intact."""
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    exp_wide = {(r.n_nationkey, r.n_name, r.n_regionkey)
                for r in nation.collect()}
    got = QUERIES["scan_evolved"](spark, SF).collect()
    assert len(got) == 2 * len(exp_wide)
    narrow = {(r.n_nationkey, r.n_name, r.n_regionkey)
              for r in got if r.n_regionkey == -1}
    wide = {(r.n_nationkey, r.n_name, r.n_regionkey)
            for r in got if r.n_regionkey != -1}
    assert wide == exp_wide
    assert narrow == {(k, n, -1) for k, n, _ in exp_wide}
