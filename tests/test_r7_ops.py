"""r7 operators property-tested against independent Python references —
the oracle SQL proves cross-engine parity; these prove the MATH is right
(a shared misreading of KM/skyline/Benford semantics would pass parity)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from minerva_etl_46_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_survival_matches_hand_rolled_km(spark):
    """Kaplan–Meier recomputed from raw events in plain Python."""
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts").collect()
    )  # bounded-by: sf0.001 fixture (1000 events)
    spans: dict = {}
    for r in rows:
        day = int(r.ts.timestamp() * 1_000_000) // 86_400_000_000
        lo, hi = spans.get(r.user_id, (day, day))
        spans[r.user_id] = (min(lo, day), max(hi, day))
    horizon = max(hi for _, hi in spans.values())
    durs = [(hi - lo, hi == horizon) for lo, hi in spans.values()]
    ts = sorted({t for t, _ in durs})
    exp = {}
    surv, n_left = 1.0, len(durs)
    for t in ts:
        d = sum(1 for x, c in durs if x == t and not c)
        c = sum(1 for x, cen in durs if x == t and cen)
        surv = surv * (1.0 - d / n_left)
        exp[t] = (n_left, d, c, surv)
        n_left -= d + c

    got = {r.t_days: r for r in QUERIES["agg_survival"](spark, SF).collect()}
    assert set(got) == set(exp)
    for t, (n, d, c, s) in exp.items():
        r = got[t]
        assert (r.n_risk, r.d_events, r.c_censored) == (n, d, c), t
        assert r.survival == pytest.approx(s, rel=1e-12), t
        assert r.hazard == pytest.approx(d / n, rel=1e-12), t
    # KM invariants: survival non-increasing, in (0, 1]
    ordered = [got[t].survival for t in ts]
    assert all(a >= b for a, b in zip(ordered, ordered[1:]))
    assert all(0.0 <= s <= 1.0 for s in ordered)


def test_skyline_matches_brute_force_dominance(spark):
    """Frontier == the O(n²) dominance definition, checked exactly."""
    parts = (
        spark.read.parquet(f"{SF}/part.parquet")
        .select("p_brand", "p_size", "p_retailprice").collect()
    )  # bounded-by: part dimension (200 rows at sf0.001)
    by_brand: dict = {}
    for r in parts:
        by_brand.setdefault(r.p_brand, set()).add(
            (r.p_size, r.p_retailprice))
    exp = set()
    for brand, pts in by_brand.items():
        for (sz, pr) in pts:
            dominated = any(
                (osz >= sz and opr <= pr and (osz > sz or opr < pr))
                for (osz, opr) in pts)
            if not dominated:
                exp.add((brand, sz, pr))

    got = {(r.p_brand, r.p_size, r.p_retailprice)
           for r in QUERIES["agg_skyline"](spark, SF).collect()}
    assert got == exp


def test_benford_math_and_ppm_constants(spark):
    """ppm literals are exactly round(1e6·log10(1+1/d)) and sum to 1e6;
    dev/mad recompute from raw counts."""
    from minerva_etl_46_spark.queries import _BENFORD_PPM

    assert sum(_BENFORD_PPM.values()) == 1_000_000
    for d, ppm in _BENFORD_PPM.items():
        assert ppm == round(1_000_000 * math.log10(1 + 1 / d)), d

    rows = QUERIES["agg_benford"](spark, SF).collect()
    by_flag: dict = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append(r)
    for flag, rs in by_flag.items():
        n_group = sum(r.n_obs for r in rs)
        assert all(r.n_group == n_group for r in rs), flag
        mad = sum(abs(r.n_obs * 1_000_000 - n_group * r.exp_ppm)
                  for r in rs)
        assert all(r.mad_n == mad for r in rs), flag
        for r in rs:
            assert r.exp_ppm == _BENFORD_PPM[int(r.digit)]
            assert r.dev_n == abs(
                r.n_obs * 1_000_000 - n_group * r.exp_ppm)


def test_corr_pairs_matches_numpy(spark):
    import numpy as np

    hourly = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000")
            .alias("bucket"),
            "event_type", "value")
        .groupBy("bucket", "event_type")
        .agg(F.sum(F.col("value").cast("decimal(38,4)"))
             .cast("double").alias("x"))
        .collect()
    )  # bounded-by: hours × types frame at sf0.001
    series: dict = {}
    for r in hourly:
        series.setdefault(r.event_type, {})[r.bucket] = r.x
    types = sorted(series)
    exp = {}
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            common = sorted(set(series[a]) & set(series[b]))
            if len(common) < 2:
                continue
            xs = np.array([series[a][t] for t in common])
            ys = np.array([series[b][t] for t in common])
            if xs.std() == 0 or ys.std() == 0:
                continue
            exp[(a, b)] = (len(common),
                           float(np.corrcoef(xs, ys)[0, 1]))

    got = {(r.type_a, r.type_b): (r.n_hours, r.r)
           for r in QUERIES["agg_corr_pairs"](spark, SF).collect()}
    assert set(got) == set(exp)
    for k, (n, rv) in exp.items():
        assert got[k][0] == n, k
        assert got[k][1] == pytest.approx(rv, rel=1e-9), k
        assert -1.0 <= got[k][1] <= 1.0


def test_tfidf_ranks_and_counts(spark):
    """tf/df recomputed in Python; per-doc rank respects the
    (bits desc, token asc) order and caps at 5."""
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text").collect()
    )  # bounded-by: 500-doc fixture
    tf: dict = {}
    df: dict = {}
    for r in docs:
        toks = r.text.lower().split(" ")
        for t in toks:
            tf[(r.doc_id, t)] = tf.get((r.doc_id, t), 0) + 1
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    n_docs = len(docs)

    rows = QUERIES["llm_tfidf"](spark, SF).collect()
    per_doc: dict = {}
    for r in rows:
        assert r.tf == tf[(r.doc_id, r.token)]
        assert r.df == df[r.token]
        bits = len(bin(n_docs)) - len(bin(r.df))
        assert r.tfidf_bits == r.tf * bits
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in per_doc.items():
        assert len(rs) <= 5
        rs.sort(key=lambda r: r.rk)
        keys = [(-r.tfidf_bits, r.token) for r in rs]
        assert keys == sorted(keys), doc


def test_collocations_lift_definition(spark):
    """Lift recomputed from raw bigram/unigram counts for the top rows."""
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("text").collect()
    )
    uni: dict = {}
    big: dict = {}
    n_tok = 0
    for r in docs:
        toks = r.text.lower().split(" ")
        n_tok += len(toks)
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    n_pairs = sum(big.values())

    rows = QUERIES["llm_collocations"](spark, SF).collect()
    assert 0 < len(rows) <= 200
    for r in rows:
        assert r.c_ab == big[(r.w1, r.w2)]
        assert r.c_ab >= 5
        expect = (r.c_ab * n_tok * n_tok) / (n_pairs * uni[r.w1]
                                             * uni[r.w2])
        assert r.lift == pytest.approx(expect, rel=1e-12)


def test_scd2_build_tiles_time_per_entity(spark):
    """Intervals tile each entity's history: ordered, non-overlapping,
    adjacent (valid_to == next valid_from), exactly one open current."""
    rows = QUERIES["upsert_scd2_build"](spark, SF).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r.valid_from_us)
        assert sum(1 for r in rs if r.is_current) == 1, uid
        assert rs[-1].is_current and rs[-1].valid_to_us == -1, uid
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to_us == b.valid_from_us, uid
            assert not a.is_current, uid
            # consecutive intervals must carry DIFFERENT values
            # (suppress_unchanged contract)
            assert a.event_type != b.event_type, uid


def test_bollinger_bands_recompute(spark):
    """Bands recomputed from the hourly series in Python."""
    hourly = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            "user_id",
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000")
            .alias("h"),
            "value")
        .groupBy("user_id", "h")
        .agg(F.sum(F.col("value").cast("decimal(38,4)"))
             .cast("double").alias("s"))
        .collect()
    )
    series: dict = {}
    for r in hourly:
        series.setdefault(r.user_id, {})[r.h * 3600] = r.s

    got = QUERIES["win_bollinger"](spark, SF).collect()
    assert got, "bollinger produced no rows at sf0.001"
    for r in got[:200]:
        hs = sorted(series[r.user_id])
        i = hs.index(r.bucket)
        window = [series[r.user_id][h] for h in hs[max(0, i - 24):i]]
        assert len(window) >= 12
        n = len(window)
        mean = sum(window) / n
        var = sum((x - mean) ** 2 for x in window) / (n - 1)
        sd = math.sqrt(var)
        assert r.mid == pytest.approx(mean, rel=1e-9)
        assert r.upper == pytest.approx(mean + 2 * sd, rel=1e-9)
        assert r.lower == pytest.approx(mean - 2 * sd, rel=1e-9)
        assert r.breach == (r.sum_value > r.upper
                            or r.sum_value < r.lower)


def test_weighted_median_matches_python(spark):
    rows = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
    )  # bounded-by: sf0.001 lineitem
    by_flag: dict = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append(
            (r.l_extendedprice, r.l_quantity))
    exp = {}
    for flag, vals in by_flag.items():
        vals.sort()
        tot = sum(q for _, q in vals)
        cum = 0.0
        for price, q in vals:
            cum += q
            if 2 * cum >= tot:
                exp[flag] = (price, tot)
                break
    got = {r.l_returnflag: (r.wmedian_price, r.total_weight)
           for r in QUERIES["agg_weighted_median"](spark, SF).collect()}
    assert set(got) == set(exp)
    for flag, (price, tot) in exp.items():
        assert got[flag][0] == price, flag
        assert got[flag][1] == pytest.approx(tot, rel=1e-9), flag


def test_drawdown_matches_python(spark):
    hourly = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            "user_id",
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000")
            .alias("h"),
            "value")
        .groupBy("user_id", "h")
        .agg(F.sum(F.col("value").cast("decimal(38,4)"))
             .cast("double").alias("v"))
        .collect()
    )
    series: dict = {}
    for r in hourly:
        series.setdefault(r.user_id, []).append((r.h * 3600, r.v))
    exp = {}
    for uid, pts in series.items():
        pts.sort()
        peak, best, best_at = float("-inf"), float("-inf"), None
        for bucket, v in pts:
            peak = max(peak, v)
            gap = peak - v
            if gap > best:
                best, best_at = gap, bucket
        exp[uid] = (best, best_at)
    got = {r.user_id: (r.max_drawdown, r.at_bucket)
           for r in QUERIES["win_drawdown"](spark, SF).collect()}
    assert set(got) == set(exp)
    for uid, (dd, at) in exp.items():
        assert got[uid][0] == pytest.approx(dd, rel=1e-9), uid
        assert got[uid][1] == at, uid
        assert got[uid][0] >= 0


def test_peak_concurrency_matches_sweep(spark):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_type",
                F.expr("unix_micros(cast(ts as timestamp))").alias("t"))
        .collect()
    )
    pts: dict = {}
    for r in rows:
        pts.setdefault(r.event_type, []).append((r.t, 1))
        pts[r.event_type].append((r.t + 300_000_000, -1))
    exp = {}
    for et, ps in pts.items():
        ps.sort()  # (t, delta): -1 sorts before +1 at equal t
        run, peak, at = 0, float("-inf"), None
        for t, d in ps:
            run += d
            if run > peak:
                peak, at = run, t
        exp[et] = (peak, at)
    got = {r.event_type: (r.peak, r.at_us)
           for r in QUERIES["agg_peak_concurrency"](spark, SF).collect()}
    assert got == exp
    # sanity: every interval alone gives ≥1, peak ≥ 1
    assert all(p >= 1 for p, _ in got.values())


@pytest.fixture(scope="module")
def tie_sf_dir(tmp_path_factory):
    """Adversarial fixture for the r7 tie rules: a weighted-median group
    whose half-weight threshold lands INSIDE a run of equal values, and
    a concurrency stream where one interval ends at the exact instant
    another starts (the half-open boundary)."""
    import os
    import shutil

    import duckdb

    d = tmp_path_factory.mktemp("tie_sf")
    con = duckdb.connect()
    # flag X: values 1,1,1,2 weights 1 each → cum hits 2/4 inside the
    #   run of 1s → wmedian must be 1 in BOTH engines regardless of
    #   which equal-value row crosses the threshold
    # flag Y: single row (degenerate)
    con.execute(f"""
        copy (
          select t.*, timestamp '2024-01-01 00:00:00' as l_shipdate
          from (values
            ('X', 1.0, 1.0), ('X', 1.0, 1.0), ('X', 1.0, 1.0),
            ('X', 2.0, 1.0), ('Y', 7.5, 3.0)
          ) t(l_returnflag, l_extendedprice, l_quantity)
        ) to '{d}/lineitem.parquet' (format parquet)
    """)
    # events: user 1 emits at t0 and t0+300s exactly (end == next start:
    # the -1 sorts before the +1 at that instant → peak must stay 1);
    # user 2 overlaps for real (peak 2). A third type 'c' nests 3 deep.
    con.execute(f"""
        copy (
          select * from (values
            (1, timestamp '2024-01-01 00:00:00', 1, 'a', 1.0, '{{}}'),
            (2, timestamp '2024-01-01 00:05:00', 1, 'a', 1.0, '{{}}'),
            (3, timestamp '2024-01-01 00:00:00', 2, 'b', 1.0, '{{}}'),
            (4, timestamp '2024-01-01 00:02:00', 2, 'b', 1.0, '{{}}'),
            (5, timestamp '2024-01-01 00:00:00', 3, 'c', 1.0, '{{}}'),
            (6, timestamp '2024-01-01 00:01:00', 3, 'c', 1.0, '{{}}'),
            (7, timestamp '2024-01-01 00:02:00', 3, 'c', 1.0, '{{}}')
          ) t(event_id, ts, user_id, event_type, value, props)
        ) to '{d}/events.parquet' (format parquet)
    """)
    con.close()
    from tests.conftest import SF_SMOKE

    for f in os.listdir(SF_SMOKE):
        if f.endswith(".parquet") and f not in ("lineitem.parquet",
                                                "events.parquet"):
            os.symlink(os.path.join(SF_SMOKE, f), os.path.join(d, f))
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


def test_weighted_median_threshold_inside_equal_run(spark, tie_sf_dir):
    from __spark_entry__ import oracle_sql

    from tests.parity import compare, duck_connection

    got = {r.l_returnflag: r.wmedian_price
           for r in QUERIES["agg_weighted_median"](
               spark, tie_sf_dir).collect()}
    assert got == {"X": 1.0, "Y": 7.5}
    con = duck_connection(tie_sf_dir)
    try:
        du = con.execute(oracle_sql()["agg_weighted_median"]).df()
    finally:
        con.close()
    sp = QUERIES["agg_weighted_median"](spark, tie_sf_dir).toPandas()
    assert not compare(sp, du, "agg_weighted_median[tie]")


def test_peak_concurrency_half_open_boundary(spark, tie_sf_dir):
    from __spark_entry__ import oracle_sql

    from tests.parity import compare, duck_connection

    got = {r.event_type: (r.peak, r.at_us)
           for r in QUERIES["agg_peak_concurrency"](
               spark, tie_sf_dir).collect()}
    base = 1704067200 * 1_000_000
    # 'a': second interval starts the µs the first ends → never 2 live
    assert got["a"][0] == 1 and got["a"][1] == base
    # 'b': genuine overlap at +2min → 2
    assert got["b"] == (2, base + 120_000_000)
    # 'c': three nested → 3 at +2min
    assert got["c"] == (3, base + 120_000_000)
    con = duck_connection(tie_sf_dir)
    try:
        du = con.execute(oracle_sql()["agg_peak_concurrency"]).df()
    finally:
        con.close()
    sp = QUERIES["agg_peak_concurrency"](spark, tie_sf_dir).toPandas()
    assert not compare(sp, du, "agg_peak_concurrency[boundary]")


def test_drawdown_monotone_series_is_zero(spark, tie_sf_dir):
    """user 1/2/3 series here are single-window or rising — max drawdown
    must be exactly 0.0 with at_bucket = the first bucket."""
    rows = QUERIES["win_drawdown"](spark, tie_sf_dir).collect()
    for r in rows:
        assert r.max_drawdown == 0.0, r


def test_fuzzy_join_matches_brute_force(spark):
    """Best match per probe recomputed with Python's full O(n·m)
    levenshtein over ALL dim rows (no blocking) — proves the block
    key never cost a better in-block match on this corpus, and that
    every probe whose true best is ≤2 appears."""
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    parts = (
        spark.read.parquet(f"{SF}/part.parquet")
        .select("p_partkey", "p_name").collect()
    )  # bounded-by: 200-row part dimension at sf0.001
    dim = [(r.p_partkey, r.p_name) for r in parts]
    exp = {}
    for k, name in dim:
        if k % 5 != 0:
            continue
        pos = len(name) - 2
        if k % 2 == 0:
            probe = name[:pos - 1] + name[pos:]
        else:
            probe = name[:pos - 1] + "x" + name[pos:]
        best = min(((lev(probe, n), pk) for pk, n in dim
                    if n[:4] == probe[:4]), default=None)
        if best and best[0] <= 2:
            exp[k + 1000000] = (best[1], best[0])
        # blocking recall check: the unblocked best is never better
        # than the in-block best on this corpus (corruption at the end)
        full = min((lev(probe, n), pk) for pk, n in dim)
        assert best is not None and full[0] == best[0], k

    got = {r.probe_id: (r.p_partkey, r.lev)
           for r in QUERIES["join_fuzzy"](spark, SF).collect()}
    assert got == exp
