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
