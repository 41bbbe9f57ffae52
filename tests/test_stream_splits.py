"""Split-invariance properties for the stateful streaming ops (SURVEY.md
§5.3 / §2.9): the converged result must not depend on WHERE the
micro-batch boundaries fall — the fixed 3-way splits in
test_stateful_streaming.py become hypothesis-randomized here.

- running_totals: commutative per-entity state, so ANY row→batch
  assignment (not just time-ranged) must converge to the batch groupBy.
- scd2_intervals: the ingest contract is time-ranged batches
  (streaming/stateful.py::_scd2_update docstring), so the property
  randomizes the NUMBER and POSITION of the time cuts and checks the
  converged intervals against a pure-python SCD2 walk.

Each example starts a real availableNow streaming query over one file
per batch (mtime-ordered, the FileStreamSource oldest-first contract) —
examples are few and small."""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile
import time

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from minerva_etl_46_spark.streaming.stateful import (
    run_records,
    run_running_totals,
    run_scd2,
)

SLOW = settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_uniq = itertools.count()


def _write_batches(spark, batches, schema):
    """One parquet file per non-empty batch, mtimes strictly ascending in
    batch order (maxFilesPerTrigger=1 + oldest-first ⇒ one micro-batch
    per file, in this order)."""
    src = tempfile.mkdtemp(prefix="stream_split_prop_")
    now = int(time.time()) - 3600
    n_written = 0
    for i, rows in enumerate(batches):
        if not rows:
            continue
        staged = os.path.join(src, f"_stage{i}")
        spark.createDataFrame(rows, schema=schema).coalesce(1) \
            .write.mode("overwrite").parquet(staged)
        (part,) = [f for f in os.listdir(staged)
                   if f.startswith("part-") and f.endswith(".parquet")]
        dst = os.path.join(src, f"b{i}.parquet")
        os.rename(os.path.join(staged, part), dst)
        shutil.rmtree(staged)
        os.utime(dst, (now + i, now + i))
        n_written += 1
    return src, n_written


def _run_and_drop(spark, runner, src, schema, prefix):
    """Collect the runner's memory-sink output, then DROP the sink view —
    each hypothesis example otherwise leaves one prop_*_N table behind in
    the shared session, ~30 per file (ADVICE r10: resource growth)."""
    name = f"{prefix}_{next(_uniq)}"
    try:
        return runner(spark, src, schema, name=name).toPandas()
    finally:
        shutil.rmtree(src, ignore_errors=True)
        spark.catalog.dropTempView(name)


def _split_into_batches(assign, rows):
    """Draw a random row→micro-batch assignment (1–4 batches), preserving
    arrival order within each batch."""
    n_batches = assign.draw(st.integers(1, 4))
    batch_of = assign.draw(st.lists(
        st.integers(0, n_batches - 1),
        min_size=len(rows), max_size=len(rows)))
    batches: list[list] = [[] for _ in range(n_batches)]
    for row, b in zip(rows, batch_of):
        batches[b].append(row)
    return batches


_total_rows = st.lists(
    st.tuples(
        st.integers(0, 3),      # user_id
        st.integers(0, 50),     # ts (seconds; uniqueness not required)
        st.integers(-10, 10),   # value (int-valued double: exact sums)
    ),
    min_size=1, max_size=25,
)


@SLOW
@given(rows=_total_rows, assign=st.data())
def test_running_totals_invariant_to_arbitrary_splits(spark, rows, assign):
    batches = [
        [(eid, ts * 1_000_000, u, float(v))
         for eid, (u, ts, v) in enumerate(b)]
        for b in _split_into_batches(assign, rows)
    ]
    schema = "event_id long, ts_us long, user_id long, value double"
    src, _ = _write_batches(spark, batches, schema)
    updates = _run_and_drop(spark, run_running_totals, src, schema,
                            "prop_totals")
    final = (updates.sort_values("n").groupby("user_id").tail(1)
             .set_index("user_id"))
    expect: dict[int, tuple[int, float]] = {}
    for u, _ts, v in rows:
        n, t = expect.get(u, (0, 0.0))
        expect[u] = (n + 1, t + v)
    assert set(final.index) == set(expect)
    for u, (n, t) in expect.items():
        assert int(final.loc[u, "n"]) == n
        assert abs(float(final.loc[u, "total"]) - t) < 1e-9


_scd2_rows = st.lists(
    st.tuples(
        st.integers(0, 2),                    # user_id
        st.integers(0, 40),                   # ts (globally unique below)
        st.sampled_from(["a", "b", "c"]),     # event_type
    ),
    min_size=1, max_size=20,
    unique_by=lambda r: r[1],  # globally unique ts ⇒ unambiguous cuts
)


def _scd2_model(rows):
    """Pure-python SCD2 walk: per user in ts order, suppress unchanged,
    close each interval at the next change; open end −1, is_current."""
    by_user: dict[int, list] = {}
    for u, ts, et in rows:
        by_user.setdefault(u, []).append((ts * 1_000_000, et))
    out = set()
    for u, items in by_user.items():
        items.sort()
        cur_type, cur_from = None, -1
        for ts_us, et in items:
            if cur_type is None:
                cur_type, cur_from = et, ts_us
            elif et != cur_type:
                out.add((u, cur_type, cur_from, ts_us, False))
                cur_type, cur_from = et, ts_us
        out.add((u, cur_type, cur_from, -1, True))
    return out


@SLOW
@given(rows=_scd2_rows, cuts=st.data())
def test_scd2_invariant_to_time_ranged_splits(spark, rows, cuts):
    ts_sorted = sorted(r[1] for r in rows)
    n_cuts = cuts.draw(st.integers(0, min(3, len(rows) - 1)))
    cut_at = sorted(cuts.draw(st.lists(
        st.sampled_from(ts_sorted), min_size=n_cuts, max_size=n_cuts,
        unique=True)))
    bounds = [*cut_at, float("inf")]
    batches: list[list] = [[] for _ in bounds]
    for eid, (u, ts, et) in enumerate(sorted(rows, key=lambda r: r[1])):
        for b, hi in enumerate(bounds):
            if ts < hi:
                batches[b].append((u, ts * 1_000_000, eid, et))
                break
    schema = "user_id long, ts_us long, event_id long, event_type string"
    src, _ = _write_batches(spark, batches, schema)
    emitted = _run_and_drop(spark, run_scd2, src, schema, "prop_scd2")
    # converge per the run_scd2 docstring: max valid_to per
    # (entity, valid_from); closed (positive) supersedes open (−1)
    conv = (emitted.groupby(["user_id", "valid_from_us", "event_type"])
            ["valid_to_us"].max().reset_index())
    got = {
        (int(r.user_id), r.event_type, int(r.valid_from_us),
         int(r.valid_to_us), int(r.valid_to_us) == -1)
        for r in conv.itertuples()
    }
    assert got == _scd2_model(rows)


_rec_rows = st.lists(
    st.tuples(
        st.integers(0, 2),                              # user_id
        st.integers(0, 40),                             # ts (globally unique)
        st.one_of(st.none(), st.integers(-5, 5)),       # value (None → NULL)
    ),
    min_size=1, max_size=20,
    unique_by=lambda r: r[1],
)


def _records_model(rows):
    """Python twin of the record walk incl. the r10 NULL rule: a NULL
    (NaN by Arrow conflation) is NEVER a record and leaves the running
    max untouched — including when it arrives FIRST (the poisoning bug's
    exact trigger position)."""
    by_user: dict[int, list] = {}
    for eid, (u, ts, v) in enumerate(sorted(rows, key=lambda r: r[1])):
        by_user.setdefault(u, []).append((ts, eid, v))
    out = set()
    for u, items in by_user.items():
        mx, n_rec = None, 0
        for _ts, eid, v in items:  # already ts-sorted
            if v is None:
                rec = 0
            else:
                rec = 1 if (mx is None or v > mx) else 0
            if rec:
                mx, n_rec = v, n_rec + 1
            out.add((u, eid, rec, n_rec))
    return out


@SLOW
@given(rows=_rec_rows, cuts=st.data())
def test_records_nulls_and_splits_match_python_model(spark, rows, cuts):
    ts_sorted = sorted(r[1] for r in rows)
    n_cuts = cuts.draw(st.integers(0, min(3, len(rows) - 1)))
    cut_at = sorted(cuts.draw(st.lists(
        st.sampled_from(ts_sorted), min_size=n_cuts, max_size=n_cuts,
        unique=True)))
    bounds = [*cut_at, float("inf")]
    batches: list[list] = [[] for _ in bounds]
    for eid, (u, ts, v) in enumerate(sorted(rows, key=lambda r: r[1])):
        for b, hi in enumerate(bounds):
            if ts < hi:
                batches[b].append(
                    (u, ts * 1_000_000, eid,
                     float(v) if v is not None else None))
                break
    schema = "user_id long, ts_us long, event_id long, value double"
    src, _ = _write_batches(spark, batches, schema)
    emitted = _run_and_drop(spark, run_records, src, schema, "prop_records")
    got = {
        (int(r.user_id), int(r.event_id), int(r.is_record), int(r.record_no))
        for r in emitted.itertuples()
    }
    assert got == _records_model(rows)


_funnel_rows = st.lists(
    st.tuples(
        st.integers(0, 2),                                    # user_id
        st.integers(0, 40),                                   # ts (unique)
        st.sampled_from(["signup", "purchase", "error", "view"]),
    ),
    min_size=1, max_size=20,
    unique_by=lambda r: r[1],
)


def _funnel_model(batches):
    """Exact arrival-order replay of _funnel_update: batches in mtime
    order, rows ts-sorted within each — so ARBITRARY (even disordered)
    row→batch assignments are modelable, and the late_events counter's
    contract (any stage-relevant event below the high-water mark counts,
    including one that advances the walk) is pinned, not just the
    in-order happy path."""
    state: dict[int, list] = {}
    for batch in batches:
        for u, ts_us, et in sorted(batch, key=lambda r: r[1]):
            stage, s1, s2, s3, hwm, late = state.get(
                u, (0, -1, -1, -1, -1, 0))
            if stage == 0 and et == "signup":
                stage, s1 = 1, ts_us
            elif stage == 1 and et == "purchase" and ts_us > s1:
                stage, s2 = 2, ts_us
            elif stage == 2 and et == "error" and ts_us > s2:
                stage, s3 = 3, ts_us
            if et in ("signup", "purchase", "error") and ts_us < hwm:
                late += 1
            hwm = max(hwm, ts_us)
            state[u] = (stage, s1, s2, s3, hwm, late)
    return {u: (s[0], s[1], s[2], s[3], s[5]) for u, s in state.items()}


@SLOW
@given(rows=_funnel_rows, assign=st.data())
def test_funnel_arbitrary_splits_match_arrival_order_model(
        spark, rows, assign):
    from minerva_etl_46_spark.streaming.stateful import run_funnel

    batches = [
        [(u, ts * 1_000_000, et) for u, ts, et in b]
        for b in _split_into_batches(assign, rows)
    ]
    schema = "user_id long, ts_us long, event_type string"
    src, _ = _write_batches(spark, batches, schema)
    updates = _run_and_drop(spark, run_funnel, src, schema, "prop_funnel")
    # converge per the run_funnel docstring: column-wise max per user
    # (reached and late_events are monotone; each s*_us moves once)
    conv = updates.groupby("user_id")[
        ["reached", "s1_us", "s2_us", "s3_us", "late_events"]].max()
    got = {int(u): tuple(int(x) for x in r)
           for u, r in conv.iterrows()}
    assert got == _funnel_model([b for b in batches if b])


_attr_rows = st.lists(
    st.tuples(
        st.integers(0, 2),                                    # user_id
        st.integers(0, 12),                                   # ts (unique)
        st.sampled_from(["email", "ad", "search", "purchase"]),
    ),
    min_size=1, max_size=16,
    unique_by=lambda r: r[1],
)

#: 30-minute ts steps: consecutive events sit inside the 1-hour lookback,
#: a 2-step gap lands EXACTLY on it (<= keeps it attributed — boundary
#: pinned), 3+ steps expire to 'direct'
_ATTR_STEP_US = 1_800_000_000


def _attr_model(rows):
    by_user: dict[int, list] = {}
    for eid, (u, ts, et) in enumerate(sorted(rows, key=lambda r: r[1])):
        by_user.setdefault(u, []).append((ts * _ATTR_STEP_US, eid, et))
    out = set()
    for u, items in by_user.items():
        src_type, src_us = None, -1
        for ts_us, _eid, et in items:  # ts-sorted
            if et == "purchase":
                inside = (src_type is not None
                          and ts_us - src_us <= 3_600_000_000)
                out.add((u, ts_us, src_type if inside else "direct"))
            else:
                src_type, src_us = et, ts_us
    return out


@SLOW
@given(rows=_attr_rows, cuts=st.data())
def test_attribution_time_ranged_splits_match_python_model(
        spark, rows, cuts):
    from minerva_etl_46_spark.streaming.stateful import run_attribution

    ts_sorted = sorted(r[1] for r in rows)
    n_cuts = cuts.draw(st.integers(0, min(3, len(rows) - 1)))
    cut_at = sorted(cuts.draw(st.lists(
        st.sampled_from(ts_sorted), min_size=n_cuts, max_size=n_cuts,
        unique=True)))
    bounds = [*cut_at, float("inf")]
    batches: list[list] = [[] for _ in bounds]
    for eid, (u, ts, et) in enumerate(sorted(rows, key=lambda r: r[1])):
        for b, hi in enumerate(bounds):
            if ts < hi:
                batches[b].append((u, ts * _ATTR_STEP_US, eid, et))
                break
    schema = "user_id long, ts_us long, event_id long, event_type string"
    src, _ = _write_batches(spark, batches, schema)
    emitted = _run_and_drop(spark, run_attribution, src, schema, "prop_attr")
    got = {(int(r.user_id), int(r.conv_us), r.channel)
           for r in emitted.itertuples()}
    assert got == _attr_model(rows)


# ---------------------------------------------------------------------------
# r11: split-invariance for the remaining streaming jobs (VERDICT r10 item
# 5) — windowed_topk, interval_join_pairs, dedup_within_watermark. These are
# engine-stateful (windowed agg / stream-stream join / dedup state), not
# applyInPandasWithState walks, so the property drives the SAME streaming
# frame shape as streaming/jobs.py over randomized batch boundaries and
# checks convergence against a pure-python model. Event times stay far
# inside the watermark horizon, so no row is ever eligible for state
# eviction — invariance must be exact.
# ---------------------------------------------------------------------------

import datetime as _dt

from pyspark.sql import functions as F

from minerva_etl_46_spark.streaming.jobs import (
    dedup_events_frame,
    hourly_type_counts,
    purchase_error_interval_join,
    rank_topk,
    state_partitions,
)

_BASE = _dt.datetime(2024, 1, 1)
_BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def _run_stream_and_drop(spark, src, schema, build, name_prefix,
                         mode="complete"):
    """Drive build(readStream) to completion into a memory sink, collect,
    drop the sink view (same session-hygiene rule as _run_and_drop).
    Names are _uniq-suffixed, so no pre-start collision scan is needed."""
    name = f"{name_prefix}_{next(_uniq)}"
    raw = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    out = build(raw)
    try:
        with state_partitions(spark, 4):
            q = (out.writeStream.outputMode(mode).format("memory")
                 .queryName(name).start())
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            q.awaitTermination(30)
        return spark.table(name).toPandas()
    finally:
        shutil.rmtree(src, ignore_errors=True)
        spark.catalog.dropTempView(name)


_topk_rows = st.lists(
    st.tuples(
        st.integers(0, 299),                      # minutes offset → 5 buckets
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    min_size=1, max_size=25,
)


@SLOW
@given(rows=_topk_rows, assign=st.data())
def test_windowed_topk_invariant_to_arbitrary_splits(spark, rows, assign):
    """jobs.windowed_topk, driven through the PRODUCTION builders
    (hourly_type_counts + rank_topk — r11 review: an inline DAG copy
    would drift): converged counts AND the ranked board must equal the
    python model under any row→batch assignment."""
    batches = [
        [(_BASE + _dt.timedelta(minutes=m), et) for m, et in b]
        for b in _split_into_batches(assign, rows)
    ]
    schema = "ts timestamp, event_type string"
    src, _ = _write_batches(spark, batches, schema)
    counts = _run_stream_and_drop(spark, src, schema, hourly_type_counts,
                                  "prop_topk")

    expect: dict[tuple[int, str], int] = {}
    for m, et in rows:
        bucket = _BASE_EPOCH + (m // 60) * 3600
        expect[(bucket, et)] = expect.get((bucket, et), 0) + 1
    got = {(int(r.bucket), r.event_type): int(r.n)
           for r in counts.itertuples()}
    assert got == expect

    # the job's rank projection (rank_topk, the exact production code)
    # over the converged counts vs the python model
    cdf = spark.createDataFrame(
        [(b, et, n) for (b, et), n in got.items()] or
        [(0, "x", 0)], "bucket long, event_type string, n long",
    ).filter(F.col("n") > 0)
    board = {
        (int(r.bucket), int(r.rk), r.event_type)
        for r in rank_topk(cdf, 3).collect()
    }
    model_board = set()
    buckets = {b for b, _ in expect}
    for b in buckets:
        ranked = sorted(((n, et) for (bb, et), n in expect.items() if bb == b),
                        key=lambda x: (-x[0], x[1]))
        for rk, (_n, et) in enumerate(ranked[:3], 1):
            model_board.add((b, rk, et))
    assert board == model_board


_ij_rows = st.lists(
    st.tuples(
        st.integers(0, 2),                        # user_id
        st.integers(0, 240),                      # seconds offset
        st.sampled_from(["purchase", "error"]),
    ),
    min_size=1, max_size=20,
)


@SLOW
@given(rows=_ij_rows, assign=st.data())
def test_interval_join_invariant_to_arbitrary_splits(spark, rows, assign):
    """jobs.interval_join_pairs shape: stream-stream inner interval
    self-join with two-sided watermarks. All event times sit ~2 minutes
    apart under a 2-hour watermark, so nothing evicts and the emitted
    pair multiset must equal the batch interval join under any split."""
    from collections import Counter

    lookback_s = 120
    tagged = [(i, u, s, et) for i, (u, s, et) in enumerate(rows)]
    batches = [
        [(eid, u, _BASE + _dt.timedelta(seconds=s), et)
         for eid, u, s, et in b]
        for b in _split_into_batches(assign, tagged)
    ]
    schema = "event_id long, user_id long, ts timestamp, event_type string"

    def build(raw):
        # second reader for the other side — the production two-source
        # shape; the join DAG itself is the PRODUCTION builder (r11
        # review: an inline copy of the condition would drift)
        other = (spark.readStream.format("parquet").schema(schema)
                 .option("maxFilesPerTrigger", 1).load(src))
        return purchase_error_interval_join(raw, other, lookback_s)

    src, _ = _write_batches(spark, batches, schema)
    emitted = _run_stream_and_drop(spark, src, schema, build, "prop_ij",
                                   mode="append")

    model: Counter = Counter()
    for pid, pu, ps, pet in tagged:
        if pet != "purchase":
            continue
        for _eid, eu, es, eet in tagged:
            if eet == "error" and eu == pu and ps - lookback_s <= es <= ps:
                p_us = (_BASE_EPOCH + ps) * 1_000_000
                e_us = (_BASE_EPOCH + es) * 1_000_000
                model[(pid, pu, p_us, e_us)] += 1
    got = Counter((int(r.p_id), int(r.user_id), int(r.p_us), int(r.e_us))
                  for r in emitted.itertuples())
    assert got == model


_dedup_rows = st.lists(
    st.tuples(
        st.integers(0, 15),                       # event_id (repeats = dups)
        st.integers(0, 100),                      # seconds offset
    ),
    min_size=1, max_size=25,
)


@SLOW
@given(rows=_dedup_rows, assign=st.data())
def test_dedup_within_watermark_invariant_to_arbitrary_splits(
        spark, rows, assign):
    """jobs.dedup_within_watermark, driven through the PRODUCTION builder
    (dedup_events_frame — r11 review: an inline copy of the dedup key /
    watermark would drift). Payload is a pure function of the key (the
    production harness's unobservability argument), so under any split
    the output must be exactly one row per distinct key with the right
    payload — duplicates landing in the SAME batch, later batches, or
    with different event times must all collapse."""
    batches = [
        [(eid, _BASE + _dt.timedelta(seconds=s), eid % 3,
          f"t{eid % 2}", eid * 1.5)
         for eid, s in b]
        for b in _split_into_batches(assign, rows)
    ]
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double")

    src, _ = _write_batches(spark, batches, schema)
    out = _run_stream_and_drop(spark, src, schema, dedup_events_frame,
                               "prop_dedup", mode="append")
    got = {(int(r.event_id), int(r.user_id), r.event_type, float(r.value))
           for r in out.itertuples()}
    assert len(out) == len(got), "duplicate rows emitted"
    assert got == {(eid, eid % 3, f"t{eid % 2}", eid * 1.5)
                   for eid, _s in rows}


_sess_rows = st.lists(
    st.tuples(
        st.integers(0, 2),                        # user_id
        st.integers(0, 240),                      # minutes offset
        st.integers(-5, 5),                       # value (int-valued double)
    ),
    min_size=1, max_size=20,
)


@SLOW
@given(rows=_sess_rows, assign=st.data())
def test_session_windows_invariant_to_arbitrary_splits(spark, rows, assign):
    """jobs.session_counts, driven through the PRODUCTION builder
    (session_counts_frame): gap-merged session windows in the state store
    must converge to the batch gaps-and-islands result under any
    row→batch assignment. The deep case this generates: an event landing
    in a LATER micro-batch between two existing sessions bridges them —
    the state store must MERGE previously-emitted sessions, not append a
    third. Session rule (the builder's docstring, corrected r12 when
    hypothesis found the exact-gap example): an event exactly gap-after
    the previous one EXTENDS the session — session_window merges
    touching windows; end = last + gap."""
    from minerva_etl_46_spark.streaming.jobs import session_counts_frame

    gap_min = 30
    batches = [
        [(u, _BASE + _dt.timedelta(minutes=m), float(v)) for u, m, v in b]
        for b in _split_into_batches(assign, rows)
    ]
    schema = "user_id long, ts timestamp, value double"
    src, _ = _write_batches(spark, batches, schema)
    out = _run_stream_and_drop(
        spark, src, schema, lambda raw: session_counts_frame(raw),
        "prop_session")

    # complete mode rewrites the whole aggregate each trigger; the final
    # table IS the converged session set
    got = {
        (int(r.user_id), int(r.session_start_us), int(r.session_end_us),
         int(r.n), float(r.sum_value))
        for r in out.itertuples()
    }

    model = set()
    by_user: dict[int, list] = {}
    for u, m, v in rows:
        by_user.setdefault(u, []).append((m * 60 * 1_000_000, v))
    gap_us = gap_min * 60 * 1_000_000
    for u, evs in by_user.items():
        evs.sort(key=lambda e: e[0])
        cur = [evs[0]]
        sessions = []
        for e in evs[1:]:
            if e[0] - cur[-1][0] > gap_us:   # exactly gap ⇒ EXTENDS (r12)
                sessions.append(cur)
                cur = [e]
            else:
                cur.append(e)
        sessions.append(cur)
        for s in sessions:
            start = _BASE_EPOCH * 1_000_000 + s[0][0]
            end = _BASE_EPOCH * 1_000_000 + s[-1][0] + gap_us
            model.add((u, start, end, len(s),
                       float(sum(v for _ts, v in s))))
    assert got == model
