"""r6 continuation operators vs independent Python references
(SURVEY.md §5.3 model: every nontrivial operator gets a property test
against a reference implementation that shares NO code with the
operator — the oracle SQL proves cross-engine agreement, these prove
the semantics are the intended ones)."""

from __future__ import annotations

import os
import tempfile
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

BASE = 1704067200  # 2024-01-01 UTC


def _events_scratch(spark, rows):
    """rows: (user, epoch_s, value) → a scratch dir holding an
    events.parquet in the fixture shape the loaders expect."""
    scratch = tempfile.mkdtemp(prefix="r6b_prop_")
    spark.createDataFrame(
        [(i, r[1], r[0], "x", float(r[2]), "{}")
         for i, r in enumerate(rows)],
        "event_id long, epoch long, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.timestamp_seconds(F.col("epoch"))).drop("epoch") \
     .select("event_id", "ts", "user_id", "event_type", "value", "props") \
     .write.mode("overwrite").parquet(os.path.join(scratch, "events.parquet"))
    return scratch


streak_samples = st.lists(
    st.tuples(
        st.integers(0, 3),      # user
        st.integers(0, 25),     # day index
        st.integers(0, 23),     # hour within day (bucketing must erase it)
    ),
    min_size=1, max_size=60,
)


@SLOW
@given(samples=streak_samples)
def test_win_streak_matches_python_reference(spark, samples):
    from minerva_etl_46_spark.queries import win_streak

    rows = [(u, BASE + d * 86400 + h * 3600, 0.0) for u, d, h in samples]
    scratch = _events_scratch(spark, rows)
    got = {r.user_id: r for r in win_streak(spark, scratch).collect()}

    days = defaultdict(set)
    for u, d, _h in samples:
        days[u].add(d)
    for u, ds in days.items():
        ds = sorted(ds)
        runs = []  # (length, start_day)
        start = prev = ds[0]
        for d in ds[1:]:
            if d == prev + 1:
                prev = d
            else:
                runs.append((prev - start + 1, start))
                start = prev = d
        runs.append((prev - start + 1, start))
        best = max(runs, key=lambda r: (r[0], -r[1]))
        r = got[u]
        assert r.longest_streak_days == best[0], (u, runs)
        assert r.streak_start_epoch == BASE + best[1] * 86400, (u, runs)
        assert r.n_active_days == len(ds)
    assert set(got) == set(days)


series_strategy = st.lists(
    st.tuples(
        st.integers(0, 1),  # user
        st.lists(
            st.floats(-100, 100, allow_nan=False).map(lambda v: round(v, 2)),
            min_size=12, max_size=30,
        ),
    ),
    min_size=1, max_size=2, unique_by=lambda t: t[0],
)


@SLOW
@given(series=series_strategy)
def test_win_autocorr_matches_numpy(spark, series):
    import numpy as np

    from minerva_etl_46_spark.queries import win_autocorr

    rows = []
    for u, vals in series:
        for i, v in enumerate(vals):
            rows.append((u, BASE + i * 60, v))
    scratch = _events_scratch(spark, rows)
    got = {r.user_id: r for r in win_autocorr(spark, scratch).collect()}

    for u, vals in series:
        x = np.array(vals[:-1], dtype=np.float64)
        y = np.array(vals[1:], dtype=np.float64)
        if x.std() == 0 or y.std() == 0:
            assert u not in got  # zero-variance series are filtered
            continue
        want = float(np.corrcoef(x, y)[0, 1])
        r = got[u]
        assert r.n_pairs == len(x)
        assert abs(r.lag1_corr - want) < 1e-9, (u, r.lag1_corr, want)


docs_strategy = st.lists(
    st.lists(st.sampled_from("aa bb cc dd ee ff".split()),
             min_size=1, max_size=12),
    min_size=1, max_size=10,
)


@SLOW
@given(docs=docs_strategy)
def test_llm_surprisal_matches_python_reference(spark, docs):
    from minerva_etl_46_spark.queries import llm_surprisal

    scratch = tempfile.mkdtemp(prefix="r6b_surp_")
    spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(
        os.path.join(scratch, "documents.parquet"))
    got = {r.doc_id: r for r in llm_surprisal(spark, scratch).collect()}

    freq: dict[str, int] = defaultdict(int)
    for toks in docs:
        for t in toks:
            freq[t] += 1
    n_total = sum(freq.values())
    for i, toks in enumerate(docs):
        bits = [n_total.bit_length() - freq[t].bit_length() for t in toks]
        r = got[i]
        assert r.n_tok == len(toks)
        assert r.sum_bits == sum(bits)
        assert r.max_bits == max(bits)
        assert r.avg_bits == sum(bits) / len(toks)  # one IEEE division,
        # exact same operands — bitwise equality is the contract


def test_fn_ip_cidr_parse_inverts_derivation(spark):
    """The parse path must invert the derivation: numeric form decomposes
    back to the octets, the /24 key is the address minus its host octet,
    and every derived 10.x address is RFC-1918 private."""
    from minerva_etl_46_spark.queries import fn_ip_cidr

    out = fn_ip_cidr(spark, "/root/testdata/sf0.001").collect()
    assert out
    for r in out:
        o = [int(p) for p in r.addr.split(".")]
        assert r.ip_num == (o[0] << 24) + (o[1] << 16) + (o[2] << 8) + o[3]
        assert r.subnet24 == f"{o[0]}.{o[1]}.{o[2]}.0/24"
        assert r.addr.startswith(r.subnet24.rsplit(".", 1)[0] + ".")
        assert r.is_private  # derivation pins o1 = 10
        assert all(0 <= x <= 255 for x in o)


@SLOW
@given(series=series_strategy)
def test_win_holt_matches_python_recursion(spark, series):
    """Holt level/trend must equal a pure-Python replay of the coupled
    recursion (identical literal constants and op order → bitwise)."""
    from minerva_etl_46_spark.queries import win_holt

    rows = []
    for u, vals in series:
        for i, v in enumerate(vals):
            rows.append((u, BASE + i * 60, v))
    scratch = _events_scratch(spark, rows)
    got = {r.user_id: r for r in win_holt(spark, scratch).collect()}

    for u, vals in series:
        l, b = float(vals[0]), 0.0
        for v in vals[1:]:
            nl = 0.3 * v + 0.7 * (l + b)
            nb = 0.1 * (nl - l) + 0.9 * b
            l, b = nl, nb
        r = got[u]
        assert r.n == len(vals)
        assert r.level == l, (u, r.level, l)
        assert r.trend == b, (u, r.trend, b)


spatial_ids = st.lists(st.integers(0, 5000), min_size=1, max_size=80,
                       unique=True)


@SLOW
@given(event_ids=spatial_ids, site_keys=st.lists(
    st.integers(1, 400), min_size=1, max_size=40, unique=True))
def test_join_spatial_matches_bruteforce(spark, event_ids, site_keys):
    """The grid-bucketed candidate join must return EXACTLY the pairs a
    brute-force O(points×sites) scan finds — grid + 3×3 neighbor
    replication may not miss a within-radius site at a cell border."""
    from minerva_etl_46_spark.queries import join_spatial

    scratch = _events_scratch(
        spark, [(0, BASE + i, 0.0) for i in range(len(event_ids))])
    # overwrite events with controlled event_ids; write supplier dim
    spark.createDataFrame(
        [(e, BASE, 0, "x", 0.0, "{}") for e in event_ids],
        "event_id long, epoch long, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr("event_id", "timestamp_seconds(epoch) as ts", "user_id",
                 "event_type", "value", "props") \
     .write.mode("overwrite").parquet(f"{scratch}/events.parquet")
    spark.createDataFrame(
        [(s,) for s in site_keys], "s_suppkey long"
    ).write.mode("overwrite").parquet(f"{scratch}/supplier.parquet")

    got = {r.event_id: r for r in join_spatial(spark, scratch).collect()}

    want = {}
    for e in event_ids:
        x, y = (e * 7919) % 1000, (e * 104729) % 1000
        hits = []
        for s in site_keys:
            sx, sy = (s * 7919) % 1000, (s * 104729) % 1000
            d2 = (x - sx) ** 2 + (y - sy) ** 2
            if d2 <= 900:
                hits.append((d2, s))
        if hits:
            best = min(d2 * 1_000_000 + s for d2, s in hits)
            want[e] = (len(hits), best % 1_000_000, best // 1_000_000)
    assert set(got) == set(want)
    for e, (n, site, d2) in want.items():
        r = got[e]
        assert (r.n_sites, r.nearest_site, r.d2) == (n, site, d2)


docs_rich = st.lists(
    st.lists(st.sampled_from("aa bb cc dd".split()), min_size=1, max_size=20),
    min_size=1, max_size=15,
)


@SLOW
@given(docs=docs_rich)
def test_llm_postings_matches_python_reference(spark, docs):
    """Postings must be the exact top-8 docs per token by (tf desc,
    doc_id asc) — including the tie-break — in rank order."""
    from minerva_etl_46_spark.queries import llm_postings

    scratch = tempfile.mkdtemp(prefix="r6b_post_")
    spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(
        os.path.join(scratch, "documents.parquet"))
    got = {r.token: r for r in llm_postings(spark, scratch).collect()}

    tf: dict[str, dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for i, toks in enumerate(docs):
        for t in toks:
            tf[t][i] += 1
    for tok, per_doc in tf.items():
        ranked = sorted(per_doc.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
        r = got[tok]
        assert r.n_top == len(ranked)
        assert r.top_docs == ",".join(str(d) for d, _ in ranked)
        assert r.top_tfs == ",".join(str(n) for _, n in ranked)
    assert set(got) == set(tf)


journeys = st.lists(
    st.tuples(st.integers(0, 2),
              st.lists(st.sampled_from(["a", "b", "c"]),
                       min_size=1, max_size=15)),
    min_size=1, max_size=3, unique_by=lambda t: t[0],
)


@SLOW
@given(series=journeys)
def test_agg_transitions_matches_python_reference(spark, series):
    """The transition matrix must count exactly the consecutive
    (per-user, time-ordered) pairs, with row shares summing to 1."""
    from minerva_etl_46_spark.queries import agg_transitions

    rows, counts = [], defaultdict(int)
    for u, types in series:
        for i, t in enumerate(types):
            rows.append((u, BASE + i * 60, 0.0, t))
        for p, n in zip(types, types[1:]):
            counts[(p, n)] += 1
    scratch = tempfile.mkdtemp(prefix="r6b_trans_")
    spark.createDataFrame(
        [(i, r[1], r[0], r[3], r[2], "{}") for i, r in enumerate(rows)],
        "event_id long, epoch long, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr("event_id", "timestamp_seconds(epoch) as ts", "user_id",
                 "event_type", "value", "props") \
     .write.mode("overwrite").parquet(os.path.join(scratch, "events.parquet"))

    got = {(r.prev_type, r.next_type): r
           for r in agg_transitions(spark, scratch).collect()}
    assert set(got) == set(counts)
    row_tot = defaultdict(int)
    for (p, _n), c in counts.items():
        row_tot[p] += c
    for (p, n), c in counts.items():
        r = got[(p, n)]
        assert r.n == c
        assert r.share == c / row_tot[p]


@SLOW
@given(series=st.lists(
    st.floats(-50, 50, allow_nan=False).map(lambda v: round(v, 2)),
    min_size=12, max_size=40))
def test_agg_ttest_matches_numpy_welch(spark, series):
    """Welch t vs an independent numpy computation (1e-9 tolerance —
    numpy accumulates in float64, the operator in exact decimal)."""
    import numpy as np

    from minerva_etl_46_spark.queries import agg_ttest

    # alternate samples between the two classes for one user
    rows = [(0, BASE + i * 60, v, "purchase" if i % 2 == 0 else "error")
            for i, v in enumerate(series)]
    scratch = tempfile.mkdtemp(prefix="r6b_tt_")
    spark.createDataFrame(
        [(i, r[1], r[0], r[3], r[2], "{}") for i, r in enumerate(rows)],
        "event_id long, epoch long, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr("event_id", "timestamp_seconds(epoch) as ts", "user_id",
                 "event_type", "value", "props") \
     .write.mode("overwrite").parquet(os.path.join(scratch, "events.parquet"))

    x = np.array(series[0::2], dtype=np.float64)
    y = np.array(series[1::2], dtype=np.float64)
    out = agg_ttest(spark, scratch).collect()
    if len(x) < 5 or len(y) < 5 or x.var(ddof=1) == 0 or y.var(ddof=1) == 0:
        assert out == []
        return
    want = (x.mean() - y.mean()) / np.sqrt(
        x.var(ddof=1) / len(x) + y.var(ddof=1) / len(y))
    (r,) = out
    assert (r.nx, r.ny) == (len(x), len(y))
    assert abs(r.t_welch - want) < 1e-9
