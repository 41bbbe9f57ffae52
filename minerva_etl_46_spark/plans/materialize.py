"""Materialization engine (SURVEY.md §3.2, §2.9 T2/T3).

Re-implements the reference's materialization daemon semantics
[ref: crates/minerva/src/materialize.rs — UNVERIFIED [M]]:

  loop:
    candidates   = modified-log windows joined against materialization state
    stability    = no source write for `stability_delay` AND now past
                   window end + `processing_delay`
    fingerprint  = digest of source state for the window; skip if equal to
                   the fingerprint already processed
    run          = execute the registered source pipeline for that window
    write        = dynamic-partition overwrite of the target window
    reprocess    = late data changes the fingerprint → window re-runs, but
                   only within `reprocessing_period` of the window end

Spark mapping: each tick is a bounded batch job per dirty window; the write
overwrites exactly the target partitions the window covers. State and
modified-log are tiny bookkeeping Parquet datasets (driver-side pandas —
scheduling metadata, never fact data; at 1000-executor scale this remains
kilobytes per part).

The same loop runs under Structured Streaming `availableNow` by pointing
`foreachBatch` at `run_window` — the builders are identical (SURVEY §2.9).

Crash/concurrency contract (r14, pinned by tests/test_r14_materialize_crash.py):

- **Crash-converge.** The state fingerprint is saved AFTER the target write
  (staged rename), so a kill anywhere inside ``run_window`` leaves the OLD
  fingerprint on disk and the next ``tick`` re-runs the window; for a
  deterministic ``src_fn`` the dynamic-partition overwrite makes the replay
  idempotent. Stale-partition deletes are LOGGED BEFORE they are executed
  (log-ahead): a kill mid-delete can lose the rmtree but never the
  modified-log entry, so a replay finishes the delete and chained
  materializations always see the buckets dirty (at-least-once logging;
  a duplicate entry only causes an idempotent downstream re-run).
- **Single daemon per spec, enforced per host.** ``tick`` serializes on an
  exclusive ``flock`` over ``{STATE_DIR}/{spec.name}.lock``: a concurrent
  tick (thread or process on the same host) blocks until the first
  finishes, then sees the recorded fingerprints and quiesces — convergence
  by serialization + idempotence, instead of the silent last-wins
  ``os.replace`` race on the state file. flock is advisory and host-local:
  multi-host deployments must run ONE daemon per spec (the reference's
  deployment shape) — a shared-filesystem lock is out of scope here.
  Direct ``run_window`` callers (the streaming ``foreachBatch`` walk,
  which is single-threaded per query) must serialize externally.
- **Reader visibility.** A window replacement is partition-atomic, not
  window-atomic: a concurrent reader (e.g. the HTTP data service) can
  observe a mid-reprocess mix of new and old partitions, or a partition
  mid-delete. Same visibility a one-shot dynamic overwrite gives; readers
  needing a consistent window must gate on the recorded fingerprint.
"""

from __future__ import annotations

import fcntl
import hashlib
import os
import time
from collections.abc import Callable
from contextlib import contextmanager
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from zoneinfo import ZoneInfo

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minerva_etl_46_spark.functions.timestamps import Granularity
from minerva_etl_46_spark.sources.trendstore import TrendStorePartStorage

STATE_DIR = "_materialization_state"


def _cal_floor(epoch: int, unit: str, tz: str) -> int:
    """Epoch of the local-calendar period start containing ``epoch`` —
    driver-side mirror of functions.timestamps.align_floor (same
    local-midnight / Monday-week / month-start semantics, incl. DST).

    Supported-zone assumption (shared with the whole-hour-offset caveat at
    the window/partition tiling check below): DST transitions must not cross
    local midnight / the period boundary. ``naive.replace(tzinfo=zone)``
    resolves ambiguous/nonexistent local times with Python's fold=0
    (earlier offset), which matches Spark's to_utc_timestamp for zones like
    Europe/Amsterdam whose transitions happen at 02:00/03:00 — but a zone
    whose transition crosses midnight (e.g. America/Santiago, 24:00→23:00)
    can disagree and break the driver-mirror invariant. Such zones are out
    of scope for calendar materialization; run_window's tiling check
    catches the resulting off-grid boundaries loudly."""
    zone = ZoneInfo(tz)
    local = datetime.fromtimestamp(epoch, zone)
    if unit == "day":
        naive = datetime(local.year, local.month, local.day)
    elif unit == "week":
        monday = local.date() - timedelta(days=local.weekday())
        naive = datetime(monday.year, monday.month, monday.day)
    elif unit == "month":
        naive = datetime(local.year, local.month, 1)
    else:
        raise ValueError(f"unsupported calendar unit {unit!r}")
    return int(naive.replace(tzinfo=zone).timestamp())


def _cal_next(window_start: int, unit: str, tz: str) -> int:
    """Next local-calendar boundary after a boundary epoch. Calendar
    arithmetic on the naive local wall clock, then re-localized — so the
    next 'day' boundary is the next local midnight even across a 23h/25h
    DST day, where +86400s would land mid-period."""
    zone = ZoneInfo(tz)
    local = datetime.fromtimestamp(window_start, zone).replace(tzinfo=None)
    if unit == "day":
        nxt = local + timedelta(days=1)
    elif unit == "week":
        nxt = local + timedelta(days=7)
    elif unit == "month":
        nxt = datetime(local.year + (local.month == 12), local.month % 12 + 1, 1)
    else:
        raise ValueError(f"unsupported calendar unit {unit!r}")
    return int(nxt.replace(tzinfo=zone).timestamp())


@dataclass
class MaterializationSpec:
    """D9: declarative derived dataset + scheduling params."""

    name: str
    granularity: Granularity
    target: TrendStorePartStorage
    #: (spark, window_start_epoch, window_end_epoch) -> DataFrame with a
    #: ts column aligned inside the window
    src_fn: Callable[[SparkSession, int, int], DataFrame]
    #: storages whose modified-logs gate this materialization
    sources: list[TrendStorePartStorage] = field(default_factory=list)
    processing_delay_s: int = 0
    stability_delay_s: int = 0
    reprocessing_period_s: int = 7 * 86400
    ts_col: str = "ts"
    #: local timezone for calendar (day/week/month) window alignment
    tz: str = "UTC"


class MaterializationEngine:
    """Finds dirty (materialization, window) pairs and runs them."""

    def __init__(self, base_dir: str):
        self.base_dir = base_dir
        os.makedirs(os.path.join(base_dir, STATE_DIR), exist_ok=True)

    # ---- state bookkeeping (tiny; pandas parquet) ----

    def _state_path(self, spec: MaterializationSpec) -> str:
        return os.path.join(self.base_dir, STATE_DIR, f"{spec.name}.parquet")

    def _lock_path(self, spec: MaterializationSpec) -> str:
        return os.path.join(self.base_dir, STATE_DIR, f"{spec.name}.lock")

    @contextmanager
    def _spec_lock(self, spec: MaterializationSpec):
        """Exclusive per-spec daemon lock (see module docstring). flock,
        not O_EXCL: the kernel releases it when the fd closes — including
        on a hard kill — so a crashed tick can never wedge the spec
        behind a stale lock file. Two fds on one file conflict even
        within a single process (flock is per-open-file-description), so
        threaded concurrent ticks serialize too."""
        fd = os.open(self._lock_path(spec), os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            os.close(fd)  # closing the fd releases the flock

    def load_state(self, spec: MaterializationSpec) -> pd.DataFrame:
        p = self._state_path(spec)
        if os.path.exists(p):
            state = pd.read_parquet(p)
            if "partitions" not in state.columns:  # pre-r10 state file
                state["partitions"] = pd.Series(dtype="string")
            return state
        return pd.DataFrame(
            columns=["window_start", "fingerprint", "processed_at",
                     "partitions"]
        ).astype({"window_start": "int64", "fingerprint": "string",
                  "processed_at": "float64", "partitions": "string"})

    def _save_state(self, spec: MaterializationSpec, state: pd.DataFrame) -> None:
        # staged-rename, same reason as sources/paio.py: an in-place
        # to_parquet killed mid-write leaves a truncated file that wedges
        # every later load_state/tick for this spec (r10 review)
        p = self._state_path(spec)
        tmp = p + ".tmp"
        state.to_parquet(tmp, index=False)
        os.replace(tmp, p)

    # ---- candidate discovery ----

    def _window_of_bucket(self, spec: MaterializationSpec, bucket: int,
                          partition_size_s: int) -> list[int]:
        """All granularity windows whose data can live in one storage
        partition [bucket, bucket+partition_size).

        Extends ONE granularity backwards: under Minerva's period-END
        convention a row with ts == bucket (exactly on the partition
        boundary) belongs to the window (bucket-g, bucket], whose start is
        bucket-g — without the extension that window is never a candidate
        and boundary rows silently never materialize (bug found by the
        aggregation-generator tests when partition_size == granularity).
        The extra window costs one fingerprint check, usually a no-op.

        Calendar granularities (day/week/month) iterate local-tz-aligned
        boundaries instead of fixed-second steps; windows are variable
        length (23h/25h DST days, 28–31-day months)."""
        if spec.granularity.is_calendar:
            unit, tz = spec.granularity.unit, spec.tz
            w = _cal_floor(_cal_floor(bucket, unit, tz) - 1, unit, tz)
            out = []
            while w < bucket + partition_size_s:
                w_end = _cal_next(w, unit, tz)
                if w_end >= bucket:
                    out.append(w)
                w = w_end
            return out
        g = spec.granularity.seconds
        start = (bucket // g) * g - g
        out = []
        w = start
        while w < bucket + partition_size_s:
            if w + g >= bucket:
                out.append(w)
            w += g
        return out

    def _window_end(self, spec: MaterializationSpec, window_start: int) -> int:
        if spec.granularity.is_calendar:
            return _cal_next(window_start, spec.granularity.unit, spec.tz)
        return window_start + spec.granularity.seconds

    def candidates(self, spark: SparkSession, spec: MaterializationSpec,
                   now: float | None = None) -> list[tuple[int, str]]:
        """(window_start, fingerprint) pairs that need (re)processing."""
        now = time.time() if now is None else now
        # gather modified windows + per-window source digests
        win_info: dict[int, list[str]] = {}
        win_last_mod: dict[int, float] = {}
        for src in spec.sources:
            log = src.modified_log(spark)
            if log is None:
                continue
            rows = (
                log.groupBy("p_bucket")
                .agg(F.max("modified_at").alias("m"), F.count(F.lit(1)).alias("n"))
                .collect()  # bounded-by: touched buckets within the retention window
            )
            for r in rows:
                for w in self._window_of_bucket(spec, r["p_bucket"], src.partition_size_s):
                    win_info.setdefault(w, []).append(f"{src.name}:{r['p_bucket']}:{r['n']}:{r['m']}")
                    win_last_mod[w] = max(win_last_mod.get(w, 0.0), r["m"])
        state = self.load_state(spec).set_index("window_start")
        out: list[tuple[int, str]] = []
        for w, parts in sorted(win_info.items()):
            w_end = self._window_end(spec, w)
            # T2 stability gate: quiet sources + past processing delay
            if now < w_end + spec.processing_delay_s:
                continue
            if now - win_last_mod[w] < spec.stability_delay_s:
                continue
            fp = hashlib.md5("|".join(sorted(parts)).encode()).hexdigest()
            if w in state.index:
                prev = state.loc[w]
                if prev["fingerprint"] == fp:
                    continue  # already processed this exact source state
                # T3 reprocessing horizon: late data outside the window is dropped
                if now > w_end + spec.reprocessing_period_s:
                    continue
            out.append((w, fp))
        return out

    # ---- execution ----

    def run_window(self, spark: SparkSession, spec: MaterializationSpec,
                   window_start: int, fingerprint: str, now: float | None = None) -> int:
        """Materialize one window: run the registered pipeline, overwrite
        the target's partitions for that window, record the fingerprint."""
        w_end = self._window_end(spec, window_start)
        # Dynamic partition overwrite replaces WHOLE partitions: the target's
        # partition size must tile the window exactly, or this write would
        # clobber sibling windows sharing a partition (the reference instead
        # DELETEs at the timestamp — same invariant, different mechanism).
        ps = spec.target.partition_size_s
        if spec.granularity.is_calendar:
            # variable-length windows: both boundaries must sit on the
            # partition grid (holds when ps divides the tz's UTC-offset
            # step — e.g. ps ≤ 3600 for whole-hour-offset zones)
            if window_start % ps != 0 or w_end % ps != 0:
                raise ValueError(
                    f"materialization {spec.name}: calendar window "
                    f"[{window_start}, {w_end}) does not tile "
                    f"partition_size_s={ps}; pick a partition size that "
                    f"divides the local-boundary epoch offsets"
                )
        elif ps > (g := spec.granularity.seconds) or g % ps != 0:
            raise ValueError(
                f"materialization {spec.name}: target partition_size_s={ps} "
                f"must evenly tile the {g}s granularity window"
            )
        # checkpoint before write: TrendStorePartStorage.write runs TWO
        # actions (touched-bucket collect, then the parquet write) — an
        # un-checkpointed rollup would execute its whole pipeline twice
        # per window on the materialization hot path (r10 review; the
        # upsert path already checkpoints for the same reason, plus it
        # pins the touched-list/written-data consistency for any
        # nondeterministic source)
        df = spec.src_fn(spark, window_start, w_end).localCheckpoint(eager=True)
        state = self.load_state(spec)
        prev = state[state["window_start"] == window_start]
        touched = set(spec.target.write(df, ts_col=spec.ts_col))
        # Dynamic partition overwrite cannot DELETE: a reprocess whose new
        # output no longer reaches some partition it previously wrote
        # (late corrections moved/removed all its rows — or the whole
        # window is now empty) must clear the stale partition, or the
        # target permanently disagrees with a one-shot batch while the
        # fingerprint records the window as processed. The reference
        # DELETEs at the timestamp; this is that delete, scoped to the
        # partitions THIS window's previous run recorded in the state —
        # convention-agnostic (output labels may sit at period END, i.e.
        # outside [window_start, w_end) on the partition grid, so a
        # grid-derived range would delete a NEIGHBOR window's output)
        # (r10 review + the ladder regression that fix caught).
        import shutil

        prev_parts: list[int] = []
        if len(prev) and pd.notna(prev["partitions"].iloc[0]):
            prev_parts = [int(x) for x in
                          str(prev["partitions"].iloc[0]).split(",") if x]
        to_remove = []
        for b in prev_parts:
            if b in touched:
                continue
            pdir = os.path.join(spec.target.path, f"p_bucket={b}")
            if os.path.isdir(pdir):
                to_remove.append(b)
        if to_remove:
            # a delete is a modification: downstream materializations
            # chained off this target must see these buckets dirty.
            # LOG-AHEAD (r14): the log entry lands BEFORE the rmtree —
            # a kill mid-delete can lose the rmtree (the replay finishes
            # it: fingerprint unsaved ⇒ window re-runs) but never the
            # dirty mark. The old order logged only AFTER the whole
            # loop, so a crash between rmtree and log silently lost the
            # deletion for every chained materialization, forever. A
            # crash between log and rmtree just re-logs on replay —
            # at-least-once, idempotent downstream.
            spec.target._log_modified(spark, to_remove, job_id=None)
        for b in to_remove:
            shutil.rmtree(os.path.join(spec.target.path, f"p_bucket={b}"))
        state = state[state["window_start"] != window_start]
        state = pd.concat([
            state,
            pd.DataFrame([{
                "window_start": window_start,
                "fingerprint": fingerprint,
                "processed_at": time.time() if now is None else now,
                "partitions": ",".join(str(b) for b in sorted(touched)),
            }]),
        ], ignore_index=True)
        self._save_state(spec, state)
        return window_start

    def tick(self, spark: SparkSession, spec: MaterializationSpec,
             now: float | None = None) -> list[int]:
        """One daemon iteration: process every dirty window. Returns the
        windows materialized.

        Holds the per-spec flock for the whole iteration (candidates are
        computed INSIDE the lock): a concurrent tick blocks, then reads
        the state the first tick saved, sees matching fingerprints, and
        quiesces — each dirty window runs exactly once across both."""
        with self._spec_lock(spec):
            done = []
            for w, fp in self.candidates(spark, spec, now=now):
                self.run_window(spark, spec, w, fp, now=now)
                done.append(w)
            return done
