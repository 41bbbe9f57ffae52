"""r7 batch-8 operators property-tested against independent Python
references — oracle SQL proves cross-engine parity; these prove the MATH
and the FILES (a shared misreading of runs-test/stoplist semantics, or a
sink that never actually wrote, would pass parity)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pytest

from minerva_etl_46_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_runs_test_matches_brute_force(spark):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr("user_id",
                    "unix_micros(cast(ts as timestamp)) "
                    "div 3600000000 as bucket", "value").collect()
    )  # bounded-by: sf0.001 fixture
    hourly = defaultdict(float)
    for r in rows:
        hourly[(r.user_id, r.bucket)] += round(r.value, 4)
    series = defaultdict(list)
    for (u, b), v in sorted(hourly.items()):
        series[u].append(v)
    exp = {}
    for u, vs in series.items():
        signs = [1 if b > a else -1 for a, b in zip(vs, vs[1:]) if b != a]
        if not signs:
            continue
        n1 = signs.count(1)
        n2 = signs.count(-1)
        runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        exp[u] = (n1, n2, runs)

    got = {r.user_id: r for r in
           QUERIES["win_runs_test"](spark, SF).collect()}
    assert set(got) == set(exp)
    z_seen = 0
    for u, (n1, n2, runs) in exp.items():
        r = got[u]
        assert (r.n1, r.n2, r.runs) == (n1, n2, runs), u
        n = n1 + n2
        assert r.e_runs == pytest.approx(1 + 2 * n1 * n2 / n, rel=1e-12)
        if n1 == 0 or n2 == 0 or n < 2 or 2 * n1 * n2 == n:
            assert r.z is None
        else:
            z_seen += 1
            var = (2 * n1 * n2 * (2 * n1 * n2 - n)) / (n * n * (n - 1))
            assert r.z == pytest.approx(
                (runs - (1 + 2 * n1 * n2 / n)) / math.sqrt(var), rel=1e-9)
    assert z_seen > 0


def test_stopword_profile_matches_brute_force(spark):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text").collect()
    )  # bounded-by: sf0.001 fixture (500 docs)
    cnt = Counter()
    for r in docs:
        cnt.update(r.text.split(" "))
    stop = {t for t, _ in sorted(cnt.items(),
                                 key=lambda kv: (-kv[1], kv[0]))[:100]}
    got = {r.doc_id: r for r in
           QUERIES["llm_stopword_profile"](spark, SF).collect()}
    assert set(got) == {r.doc_id for r in docs}
    for r in docs:
        toks = r.text.split(" ")
        n_stop = sum(1 for t in toks if t in stop)
        row = got[r.doc_id]
        assert row.n_tokens == len(toks)
        assert row.n_stop == n_stop
        assert row.stop_ratio == pytest.approx(
            n_stop / len(toks), rel=1e-12)
    # the shared-vocabulary fixture has real function words
    assert any(got[r.doc_id].n_stop > 0 for r in docs)


def test_scan_binary_digests_real_files(spark):
    nation = {r.n_nationkey: r.n_name for r in (
        spark.read.parquet(f"{SF}/nation.parquet")
        .select("n_nationkey", "n_name").collect())}
    rows = QUERIES["scan_binary"](spark, SF).collect()
    assert {r.file_key for r in rows} == set(nation)
    for r in rows:
        payload = nation[r.file_key].encode()
        assert r.n_bytes == len(payload)
        # digest contract: md5 over UPPERCASE hex of the payload
        assert r.content_md5 == hashlib.md5(
            payload.hex().upper().encode()).hexdigest()


def test_sink_csv_roundtrip_writes_real_files(spark):
    import glob
    import os

    from minerva_etl_46_spark.queries import _scratch

    cust = {r.c_custkey: r for r in (
        spark.read.parquet(f"{SF}/customer.parquet").collect())}
    rows = QUERIES["sink_csv"](spark, SF).collect()
    assert {r.c_custkey for r in rows} == set(cust)
    for r in rows:
        src = cust[r.c_custkey]
        assert r.c_name == src.c_name
        assert r.c_nationkey == src.c_nationkey
        assert r.acctbal == pytest.approx(round(src.c_acctbal, 2),
                                          abs=1e-9)
    # the sink actually wrote CSV part files with headers
    files = glob.glob(os.path.join(_scratch(SF, "customer_csv"), "*.csv"))
    assert files
    with open(files[0]) as f:
        assert f.readline().startswith("c_custkey,")


def test_calendar_heatmap_shares(spark):
    rows = QUERIES["agg_calendar_heatmap"](spark, SF).collect()
    tot = sum(r.n for r in rows)
    assert sum(r.share for r in rows) == pytest.approx(1.0, rel=1e-9)
    for r in rows:
        assert 0 <= r.dow_idx <= 6
        assert 0 <= r.hh <= 23
        assert r.share == pytest.approx(r.n / tot, rel=1e-12)


def test_format_bytes_identity(spark):
    rows = QUERIES["fn_format_bytes"](spark, SF).collect()
    labels = ["B", "KiB", "MiB", "GiB", "TiB"]
    assert rows
    seen_units = set()
    for r in rows:
        unit = max(0, (r.n_bytes.bit_length() - 1) // 10)
        seen_units.add(unit)
        assert r.unit == unit
        assert r.unit_label == labels[unit]
        assert r.scaled == pytest.approx(r.n_bytes / (1 << (10 * unit)),
                                         rel=0)
        assert 1.0 <= r.scaled < 1024.0
    assert len(seen_units) > 1  # fixture prices span multiple units
