"""r7 batch-9 operators property-tested against independent Python
references — oracle SQL proves cross-engine parity; these prove the MATH
(a shared misreading of attribution/UUID/latency semantics would pass
parity)."""

from __future__ import annotations

import uuid as uuidlib
from collections import Counter, defaultdict

import pytest

from minerva_etl_46_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_attribution_matches_brute_force(spark):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr("user_id", "event_id", "event_type",
                    "unix_micros(cast(ts as timestamp)) as ts_us")
        .collect()
    )  # bounded-by: sf0.001 fixture
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append((r.ts_us, r.event_id, r.event_type))
    exp = Counter()
    for evs in per_user.values():
        evs.sort()
        last_src = None  # (ts, type) of last non-t0 event
        for ts, _, et in evs:
            if et == "purchase":
                if last_src and ts - last_src[0] <= 3_600_000_000:
                    exp[last_src[1]] += 1
                else:
                    exp["direct"] += 1
            else:
                last_src = (ts, et)

    got = {r.channel: r for r in
           QUERIES["agg_attribution"](spark, SF).collect()}
    assert {k: r.n_conversions for k, r in got.items()} == dict(exp)
    tot = sum(exp.values())
    for k, r in got.items():
        assert r.share == pytest.approx(exp[k] / tot, rel=1e-12)
    assert "direct" in got  # lookback misses exist in the fixture


def test_latency_histogram_matches_brute_force(spark):
    orders = {r.o_orderkey: r.d for r in (
        spark.read.parquet(f"{SF}/orders.parquet")
        .selectExpr("o_orderkey",
                    "unix_micros(cast(o_orderdate as timestamp)) "
                    "div 86400000000 as d").collect())}
    lats = Counter()
    for r in (spark.read.parquet(f"{SF}/lineitem.parquet")
              .selectExpr("l_orderkey",
                          "unix_micros(cast(l_shipdate as timestamp)) "
                          "div 86400000000 as d").collect()):
        if r.l_orderkey in orders:
            lats[r.d - orders[r.l_orderkey]] += 1

    got = {r.lat_days: r for r in
           QUERIES["agg_latency_histogram"](spark, SF).collect()}
    assert {k: r.n for k, r in got.items()} == dict(lats)
    tot = sum(lats.values())
    cum = 0
    for d in sorted(lats):
        cum += lats[d]
        assert got[d].share == pytest.approx(lats[d] / tot, rel=1e-12)
        assert got[d].cum_share == pytest.approx(cum / tot, rel=1e-12)
    # NOTE: the synthetic fixture's dates are independent draws, so
    # negative latencies exist — the operator reports them honestly
    assert any(d < 0 for d in lats) or min(lats) >= 0


def test_lang_mix_identities(spark):
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("source", "lang").collect())
    grid = Counter((r.source, r.lang) for r in docs)
    src_tot = Counter(r.source for r in docs)

    got = {(r.source, r.lang): r for r in
           QUERIES["llm_lang_mix"](spark, SF).collect()}
    assert set(got) == set(grid)
    by_src_bits = defaultdict(int)
    for (s, l), n in grid.items():
        bits = src_tot[s].bit_length() - n.bit_length()
        by_src_bits[s] += n * bits
    for (s, l), r in got.items():
        assert r.n == grid[(s, l)]
        assert r.src_tot == src_tot[s]
        assert r.share == pytest.approx(grid[(s, l)] / src_tot[s],
                                        rel=1e-12)
        assert r.src_sum_bits == by_src_bits[s]
        assert r.src_entropy_bits == pytest.approx(
            by_src_bits[s] / src_tot[s], rel=1e-12)
    # mixed-language sources exist in the fixture
    assert any(r.src_entropy_bits > 0 for r in got.values())


def test_positional_template_matches_brute_force(spark):
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("text").collect())
    per_pos = defaultdict(Counter)
    for r in docs:
        for i, tok in enumerate(r.text.split(" ")[:20], start=1):
            per_pos[i][tok] += 1

    got = {r.pos: r for r in
           QUERIES["llm_positional_template"](spark, SF).collect()}
    assert set(got) == set(per_pos)
    for pos, cnt in per_pos.items():
        top_tok, top_n = sorted(cnt.items(),
                                key=lambda kv: (-kv[1], kv[0]))[0]
        r = got[pos]
        assert (r.top_tok, r.n) == (top_tok, top_n), pos
        assert r.dominance == pytest.approx(
            top_n / sum(cnt.values()), rel=1e-12)


def test_uuid3_matches_python_uuid_layout(spark):
    rows = QUERIES["fn_uuid3"](spark, SF).collect()
    assert rows
    for r in rows:
        name = f"minerva:supplier:{r.s_suppkey}"
        # python's uuid3 hashes namespace BYTES + name; our engine form
        # hashes the composed string directly, so compare layout and
        # md5-derived content independently
        import hashlib

        hx = hashlib.md5(name.encode()).hexdigest()
        u = r.uuid3
        assert len(u) == 36 and u.count("-") == 4
        assert u[14] == "3"  # version nibble
        assert u[19] in "89ab"  # RFC 4122 variant
        assert u.replace("-", "")[:12] == hx[:12]
        assert u.replace("-", "")[20:] == hx[20:]
        # the whole string round-trips through the stdlib parser
        parsed = uuidlib.UUID(u)
        assert parsed.version == 3


def test_sink_jsonl_writes_real_files(spark):
    import glob
    import json
    import os

    from minerva_etl_46_spark.queries import _scratch

    part = {r.p_partkey: r for r in (
        spark.read.parquet(f"{SF}/part.parquet").collect())}
    rows = QUERIES["sink_jsonl"](spark, SF).collect()
    assert {r.p_partkey for r in rows} == set(part)
    for r in rows:
        src = part[r.p_partkey]
        assert r.p_name == src.p_name
        assert r.p_brand == src.p_brand
        assert r.p_size == src.p_size
        assert r.retailprice == pytest.approx(
            round(src.p_retailprice, 2), abs=1e-9)
    files = glob.glob(os.path.join(_scratch(SF, "part_jsonl"), "*.json"))
    assert files
    with open(files[0]) as f:
        rec = json.loads(f.readline())
    assert {"p_partkey", "p_name", "p_brand", "p_size",
            "retailprice"} <= set(rec)
