"""Custom stateful streaming operator (SURVEY.md §2.9/§2.10):
``applyInPandasWithState`` running per-entity counters across micro-batches
— the escape hatch for operators Spark's built-in windowed aggs can't
express (here: a running cumulative total that must survive batch
boundaries and emit an update per batch).

State is per-key (count, total), Arrow-batched in and out. At cluster
scale state lives in the state store (RocksDB/HDFS-backed), partitioned by
the grouping key — the same key discipline as every other operator here.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from minerva_etl_46_spark.session import tune
from minerva_etl_46_spark.streaming.jobs import record_progress

OUTPUT_SCHEMA = "user_id long, n long, total double"
STATE_SCHEMA = "n long, total double"


def _update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame([{"user_id": user_id, "n": n, "total": total}])


def running_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame in → per-batch updated running totals out.

    NULL contract: pandas ``.sum()`` skips NaN, and Arrow delivers SQL
    NULLs as NaN — so NULL rows are ignored exactly like the batch
    ``F.sum``. A true NaN diverges (batch sum propagates it); same
    stated Arrow-conflation trade as _records_update."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_running_totals(spark: SparkSession, source_dir: str, schema: str,
                       name: str = "stateful_totals") -> DataFrame:
    """Drive the stateful operator over everything in source_dir
    (one file per micro-batch so state genuinely carries across batches)
    and return the memory-sink table of per-batch updates."""
    tune(spark)
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    src = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(source_dir)
    )
    out = running_totals(src.select("user_id", "value"))
    q = (
        out.writeStream.outputMode("update").format("memory")
        .queryName(name).trigger(availableNow=True).start()
    )
    q.awaitTermination()
    record_progress(q)
    return spark.table(name)


# ---------------------------------------------------------------------------
# transformWithStateInPandas twin (Spark 4 StatefulProcessor API)
# ---------------------------------------------------------------------------
# Same operator as running_totals, on the modern state API: typed named
# state variables (ValueState/ListState/MapState), timers, TTL, and a
# RocksDB-only state store — the long-term home for custom stateful ops.
# Kept alongside applyInPandasWithState because the two APIs have different
# cluster requirements (transformWithState REQUIRES the RocksDB provider;
# the GroupState API runs on the default HDFS-backed store too). The test
# suite asserts both converge to the identical batch ground truth.

try:  # pragma: no cover - import shape varies across 4.x point releases
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    # the TWS driver worker speaks protobuf to the JVM; without the Python
    # protobuf package the query crashes at state-schema validation
    # (measured: STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE from
    # StateMessage_pb2), so gate on BOTH imports
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAS_TWS = True
except ImportError:  # pragma: no cover
    StatefulProcessor = object
    StatefulProcessorHandle = None
    HAS_TWS = False

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user running (n, total) in a named ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame([{"user_id": key[0], "n": n, "total": total}])

    def close(self) -> None:
        pass


def running_totals_tws(events: DataFrame) -> DataFrame:
    """running_totals on transformWithStateInPandas. The session must run
    the RocksDB state store provider (ROCKSDB_PROVIDER) — set it before
    starting the query; local sessions default to HDFS-backed and Spark
    rejects transformWithState on it."""
    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def run_running_totals_tws(spark: SparkSession, source_dir: str, schema: str,
                           name: str = "stateful_totals_tws") -> DataFrame:
    """Drive the transformWithState twin like run_running_totals (one file
    per micro-batch; memory sink of per-batch updates)."""
    tune(spark)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                   ROCKSDB_PROVIDER)
    try:
        for q in spark.streams.active:
            if q.name == name:
                q.stop()
        src = (
            spark.readStream.format("parquet").schema(schema)
            .option("maxFilesPerTrigger", "1")
            .load(source_dir)
        )
        out = running_totals_tws(src.select("user_id", "value"))
        q = (
            out.writeStream.outputMode("update").format("memory")
            .queryName(name).trigger(availableNow=True).start()
        )
        q.awaitTermination()
        record_progress(q)
        return spark.table(name)
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


# ---------------------------------------------------------------------------
# Stateful funnel progression (streaming twin of queries.win_funnel)
# ---------------------------------------------------------------------------

FUNNEL_OUTPUT_SCHEMA = (
    "user_id long, reached int, s1_us long, s2_us long, s3_us long, "
    "late_events long"
)
FUNNEL_STATE_SCHEMA = "stage int, s1 long, s2 long, s3 long, hwm long, late long"
FUNNEL_STAGES = ("signup", "purchase", "error")


def _funnel_update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    """Per-user funnel state across micro-batches. Each batch's rows sort
    by ts before the walk, so bounded disorder WITHIN a batch is fine;
    cross-batch the operator assumes per-entity arrival in event-time
    order (the upstream ingest contract). ADVICE r5: violations of that
    contract must be OBSERVABLE, not silent — the state carries a
    per-user event-time high-water mark, and any stage-relevant event
    that arrives below it increments ``late_events`` in the emitted row
    — INCLUDING one that happens to advance the walk (r10 review: a
    late-arriving earlier stage that advances is the worst disorder —
    the walk has already consumed later events, so the funnel result
    differs from the in-order replay and the alert MUST fire). A
    monitoring stream alert on late_events > 0 is the deployment
    contract check."""
    (user_id,) = key
    stage, s1, s2, s3, hwm, late = (
        state.get if state.exists else (0, -1, -1, -1, -1, 0)
    )
    # concat the batch's Arrow chunks BEFORE sorting (ADVICE r10: a
    # per-chunk sort only realizes "each batch's rows sort by ts" while
    # every group fits one chunk — the scd2/records walks already concat).
    # Stable mergesort: equal-ts events keep arrival order, like a
    # single in-order chunk. No event_id on this stream (the walk is
    # (ts, type)-driven), so ts is the whole sort key.
    frames = [p for p in pdfs if len(p)]  # drop empty batches: concat of empty/all-NA frames is a pandas dtype trap (FutureWarning)
    for pdf in (
        [pd.concat(frames).sort_values("ts_us", kind="mergesort")]
        if frames else []
    ):
        for ts_us, et in zip(pdf["ts_us"], pdf["event_type"]):
            ts_us = int(ts_us)
            if stage == 0 and et == FUNNEL_STAGES[0]:
                stage, s1 = 1, ts_us
            elif stage == 1 and et == FUNNEL_STAGES[1] and ts_us > s1:
                stage, s2 = 2, ts_us
            elif stage == 2 and et == FUNNEL_STAGES[2] and ts_us > s2:
                stage, s3 = 3, ts_us
            if et in FUNNEL_STAGES and ts_us < hwm:
                # cross-batch disorder: this event-time already passed.
                # Counted whether or not the event advanced the walk —
                # an advancing late event means the in-order replay
                # would differ (the advance is still applied; the
                # counter makes the contract violation observable, it
                # does not rewrite history)
                late += 1
            hwm = max(hwm, ts_us)
    state.update((stage, s1, s2, s3, hwm, late))
    yield pd.DataFrame([{
        "user_id": user_id, "reached": stage,
        "s1_us": s1, "s2_us": s2, "s3_us": s3, "late_events": late,
    }])


def funnel_progress(events: DataFrame) -> DataFrame:
    """Streaming funnel: events(user_id, ts_us, event_type) in →
    per-batch updated (reached, stage timestamps) out. State is one
    4-field struct per user — constant size per entity at any scale,
    partitioned by the grouping key in the state store."""
    return events.groupBy("user_id").applyInPandasWithState(
        _funnel_update,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_funnel(spark: SparkSession, source_dir: str, schema: str,
               name: str = "stateful_funnel",
               n_state_partitions: int = 8) -> DataFrame:
    """Drive funnel_progress over source_dir (one file per micro-batch)
    and return the memory-sink table of per-batch updates. The converged
    per-user row is the column-wise max: `reached` is monotone and each
    stage timestamp moves exactly once, -1 → final value. State store
    partition count is pinned via jobs.state_partitions (frozen into a
    checkpoint at first start — size to keyspace, see its docstring)."""
    from minerva_etl_46_spark.streaming.jobs import state_partitions

    tune(spark)
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    src = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(source_dir)
    )
    out = funnel_progress(src.select("user_id", "ts_us", "event_type"))
    with state_partitions(spark, n_state_partitions):
        q = (
            out.writeStream.outputMode("update").format("memory")
            .queryName(name).trigger(availableNow=True).start()
        )
        q.awaitTermination()
        record_progress(q)
    return spark.table(name)


# ---------------------------------------------------------------------------
# T9 (r7): streaming SCD2 maintenance — upsert_scd2_build's streaming twin
# ---------------------------------------------------------------------------

SCD2_OUTPUT_SCHEMA = ("user_id long, event_type string, valid_from_us long, "
                      "valid_to_us long, is_current boolean")
SCD2_STATE_SCHEMA = "cur_type string, cur_from long"


def _scd2_update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    """Per-entity SCD2 walk across micro-batches: state is the OPEN
    interval (current value + its start); each observed value change
    emits the closed interval and re-opens. Within a batch, rows sort by
    (ts, event_id) and collapse to last-per-ts (the batch builder's tie
    canonicalization); cross-batch the harness/ingest contract delivers
    time-ranged batches, so an equal-ts tie never spans a boundary and
    replacement-of-an-emitted-interval can never be needed. Unchanged
    values are suppressed by the et != cur_type guard — the W4 trick,
    streamed. Every update call re-emits the open interval (valid_to
    sentinel −1, is_current) so the sink converges by max(valid_to)
    per (entity, valid_from).

    Domain: ts_us > −1 (epoch-forward microseconds). −1 is reserved
    twice — as valid_to's OPEN_END sentinel and as cur_from's NO-STATE
    sentinel — so a genuine event at ts_us == −1 (1 µs before epoch)
    would read as "no open interval" on the next micro-batch and its
    final open emission would be suppressed. The load boundary already
    drops NULL-ts rows and the trend-store domain is epoch-forward; a
    pre-epoch feed would need an explicit has_state boolean in
    SCD2_STATE_SCHEMA instead of the overloaded sentinel."""
    (user_id,) = key
    cur_type, cur_from = state.get if state.exists else (None, -1)
    out = []
    frames = [p for p in pdfs if len(p)]  # drop empty batches: concat of empty/all-NA frames is a pandas dtype trap (FutureWarning)
    if frames:
        pdf = pd.concat(frames)
        pdf = (pdf.sort_values(["ts_us", "event_id"])
               .drop_duplicates("ts_us", keep="last"))
        for ts_us, et in zip(pdf["ts_us"], pdf["event_type"]):
            ts_us = int(ts_us)
            # pandas surfaces a NULL string cell as NaN; canonicalize to
            # None so the null-safe compare below is well-defined
            if et is not None and not isinstance(et, str):
                et = None
            # cur_from == -1 is the NO-STATE sentinel, NOT cur_type is
            # None: a NULL event_type is a VALUE under the engine's
            # change detection (IS DISTINCT FROM — the r11 batch rule),
            # so it must be holdable as the open interval; the old
            # None-as-seed test re-seeded on every NULL and could never
            # close or open a NULL interval (r12b adversarial-events:
            # the stream emitted one fewer interval than the oracle)
            if cur_from == -1:
                cur_type, cur_from = et, ts_us
            elif et != cur_type and not (et is None and cur_type is None):
                out.append({
                    "user_id": user_id, "event_type": cur_type,
                    "valid_from_us": cur_from, "valid_to_us": ts_us,
                    "is_current": False,
                })
                cur_type, cur_from = et, ts_us
    state.update((cur_type, cur_from))
    if cur_from != -1:
        out.append({
            "user_id": user_id, "event_type": cur_type,
            "valid_from_us": cur_from, "valid_to_us": -1,
            "is_current": True,
        })
    yield pd.DataFrame(out)


def scd2_intervals(events: DataFrame) -> DataFrame:
    """Streaming events(user_id, ts_us, event_id, event_type) in →
    per-batch SCD2 interval emissions out. State is one (value, start)
    struct per entity — constant size at any scale, partitioned by the
    grouping key in the state store; closed intervals leave the operator
    the batch they close, so no history accumulates anywhere."""
    return events.groupBy("user_id").applyInPandasWithState(
        _scd2_update,
        outputStructType=SCD2_OUTPUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_scd2(spark: SparkSession, source_dir: str, schema: str,
             name: str = "stateful_scd2",
             n_state_partitions: int = 8) -> DataFrame:
    """Drive scd2_intervals over source_dir (one file per micro-batch)
    and return the memory-sink table of per-batch emissions. Converge
    with max-valid_to per (entity, valid_from): a closed interval's row
    (valid_to > 0) supersedes the open emission (−1) it replaces."""
    from minerva_etl_46_spark.streaming.jobs import state_partitions

    tune(spark)
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    src = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(source_dir)
    )
    out = scd2_intervals(
        src.select("user_id", "ts_us", "event_id", "event_type"))
    with state_partitions(spark, n_state_partitions):
        q = (
            out.writeStream.outputMode("update").format("memory")
            .queryName(name).trigger(availableNow=True).start()
        )
        q.awaitTermination()
        record_progress(q)
    return spark.table(name)


# ---------------------------------------------------------------------------
# T11 (r7): streaming last-touch attribution — agg_attribution's twin
# ---------------------------------------------------------------------------

ATTR_OUTPUT_SCHEMA = "user_id long, conv_us long, channel string"
ATTR_STATE_SCHEMA = "src_type string, src_us long"

#: last-touch lookback, µs (must match agg_attribution's 1-hour window)
ATTR_LOOKBACK_US = 3_600_000_000


def _attribution_update(key, pdfs: Iterable[pd.DataFrame],
                        state: GroupState):
    """Per-entity last-touch walk across micro-batches: state is the
    most recent NON-conversion event (type + µs). Each 'purchase' row
    emits one attribution record — credited to the stored source when
    it falls inside the 1-hour lookback, else 'direct' — and conversion
    rows never overwrite the source state (a purchase is not a
    channel). Within a batch, rows sort by (ts_us, event_id) — the
    batch window's exact order; cross-batch the harness delivers
    time-ranged files, so order is global (the stream_funnel/scd2
    in-order-arrival contract). Emissions are immutable facts (one row
    per conversion), so update-mode convergence is trivial — no
    re-emission, no max-fold needed."""
    (user_id,) = key
    src_type, src_us = state.get if state.exists else (None, -1)
    out = []
    frames = [p for p in pdfs if len(p)]  # drop empty batches: concat of empty/all-NA frames is a pandas dtype trap (FutureWarning)
    if frames:
        pdf = pd.concat(frames).sort_values(["ts_us", "event_id"])
        for ts_us, et in zip(pdf["ts_us"], pdf["event_type"]):
            ts_us = int(ts_us)
            if et == "purchase":
                if (src_type is not None
                        and ts_us - src_us <= ATTR_LOOKBACK_US):
                    channel = src_type
                else:
                    channel = "direct"
                out.append({"user_id": user_id, "conv_us": ts_us,
                            "channel": channel})
            else:
                src_type, src_us = et, ts_us
    state.update((src_type, src_us))
    if out:
        yield pd.DataFrame(out)


def attribution_stream(events: DataFrame) -> DataFrame:
    """Streaming attribution: events(user_id, ts_us, event_id,
    event_type) in → one immutable (user, conv_ts, channel) row per
    conversion out. State is ONE (type, µs) pair per user — constant
    per entity at any scale, partitioned by the grouping key."""
    return events.groupBy("user_id").applyInPandasWithState(
        _attribution_update,
        outputStructType=ATTR_OUTPUT_SCHEMA,
        stateStructType=ATTR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_attribution(spark: SparkSession, source_dir: str, schema: str,
                    name: str = "stateful_attribution",
                    n_state_partitions: int = 8) -> DataFrame:
    """Drive attribution_stream over source_dir (one file per
    micro-batch) and return the memory-sink table of per-conversion
    emissions (immutable rows — no convergence fold needed)."""
    from minerva_etl_46_spark.streaming.jobs import state_partitions

    tune(spark)
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    src = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(source_dir)
    )
    out = attribution_stream(
        src.select("user_id", "ts_us", "event_id", "event_type"))
    with state_partitions(spark, n_state_partitions):
        q = (
            out.writeStream.outputMode("update").format("memory")
            .queryName(name).trigger(availableNow=True).start()
        )
        q.awaitTermination()
        record_progress(q)
    return spark.table(name)


RECORDS_OUTPUT_SCHEMA = ("user_id long, event_id long, value double, "
                         "is_record long, record_no long")
RECORDS_STATE_SCHEMA = "max_val double, n_records long"


def _records_update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    """Per-entity record-high walk across micro-batches: state is the
    running maximum plus the record count so far — two scalars,
    constant per entity at any history length. Each arriving sample
    emits one immutable row (is_record, record_no) the micro-batch it
    lands; strict inequality pinned (equalling the record is not
    breaking it), the entity's first-ever sample is record #1. Order
    contract as stream_attribution: within a batch rows sort by
    (ts_us, event_id); the harness delivers time-ranged files so the
    walk order equals the batch window's (ts, event_id) order.

    NULL/NaN contract (r10 review): Arrow conflates SQL NULL with NaN
    in float columns, so inside this walk the two are indistinguishable
    — both are handled per the batch twin's NULL semantics (win_records:
    ``value > max(prev)`` is NULL → never a record; ``F.max`` ignores
    NULLs → the running max is untouched). Before the guard, a NaN
    arriving FIRST took the ``max_val is None`` branch: flagged as a
    record and poisoning the max (every later ``value > NaN`` is
    False → no entity record ever again, silently). A true NaN (which
    Spark's double total order ranks GREATEST, i.e. batch would call it
    a record) therefore diverges here — stated trade: the conflation
    makes batch-NaN parity unreachable from pandas, and never-a-record
    is the non-poisoning choice."""
    import math

    (user_id,) = key
    max_val, n_records = state.get if state.exists else (None, 0)
    out = []
    frames = [p for p in pdfs if len(p)]  # drop empty batches: concat of empty/all-NA frames is a pandas dtype trap (FutureWarning)
    if frames:
        pdf = pd.concat(frames).sort_values(["ts_us", "event_id"])
        for event_id, value in zip(pdf["event_id"], pdf["value"]):
            value = float(value)
            if math.isnan(value):
                rec = 0
            else:
                rec = 1 if (max_val is None or value > max_val) else 0
            if rec:
                max_val = value
                n_records += 1
            out.append({"user_id": user_id, "event_id": int(event_id),
                        "value": value, "is_record": rec,
                        "record_no": n_records})
    state.update((max_val, n_records))
    if out:
        yield pd.DataFrame(out)


def records_stream(events: DataFrame) -> DataFrame:
    """Streaming record detection: events(user_id, ts_us, event_id,
    value) in → one immutable flagged row per sample out."""
    return events.groupBy("user_id").applyInPandasWithState(
        _records_update,
        outputStructType=RECORDS_OUTPUT_SCHEMA,
        stateStructType=RECORDS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_records(spark: SparkSession, source_dir: str, schema: str,
                name: str = "stateful_records",
                n_state_partitions: int = 8) -> DataFrame:
    """Drive records_stream over source_dir (one file per micro-batch)
    and return the memory-sink table of per-sample emissions."""
    from minerva_etl_46_spark.streaming.jobs import state_partitions

    tune(spark)
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    src = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(source_dir)
    )
    out = records_stream(
        src.select("user_id", "ts_us", "event_id", "value"))
    with state_partitions(spark, n_state_partitions):
        q = (
            out.writeStream.outputMode("update").format("memory")
            .queryName(name).trigger(availableNow=True).start()
        )
        q.awaitTermination()
        record_progress(q)
    return spark.table(name)
