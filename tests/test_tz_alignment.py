"""SURVEY.md §1.2 / §7 hard-part (a): day-and-coarser granularities align
in the INSTANCE-LOCAL timezone, including across DST transitions — the
top documented source of Minerva timestamp bugs."""

from __future__ import annotations

from pyspark.sql import functions as F

from minerva_etl_46_spark.functions.timestamps import (
    G_1D,
    G_1MONTH,
    align_end,
    align_floor,
)

TZ = "Europe/Amsterdam"


def _align(spark, utc_ts: str, g, tz, fn=align_floor):
    df = spark.createDataFrame([(utc_ts,)], schema="s string").select(
        F.to_timestamp("s").alias("ts")
    )
    return str(df.select(fn("ts", g, tz).alias("a")).collect()[0]["a"])


def test_day_alignment_is_local_midnight_across_spring_dst(spark):
    # 2024-03-31: Amsterdam springs forward (CET+1 → CEST+2).
    # 23:30 UTC on 3/30 is already 00:30 LOCAL on 3/31 → local day 3/31,
    # whose local midnight is 23:00 UTC on 3/30.
    assert _align(spark, "2024-03-30 23:30:00", G_1D, TZ) == "2024-03-30 23:00:00"
    # 22:30 UTC on 3/31 is 00:30 LOCAL on 4/1 (offset now +2) → day 4/1,
    # local midnight = 22:00 UTC — the DST day is 23 hours long.
    assert _align(spark, "2024-03-31 22:30:00", G_1D, TZ) == "2024-03-31 22:00:00"
    # UTC alignment (default) is plain UTC midnight — different day!
    assert _align(spark, "2024-03-30 23:30:00", G_1D, "UTC") == "2024-03-30 00:00:00"


def test_day_alignment_across_fall_back(spark):
    # 2024-10-27: clocks fall back (CEST+2 → CET+1); the local day is 25h.
    # 22:30 UTC on 10/26 = 00:30 LOCAL on 10/27; local midnight = 22:00 UTC.
    assert _align(spark, "2024-10-26 22:30:00", G_1D, TZ) == "2024-10-26 22:00:00"
    # 23:30 UTC on 10/27 = 00:30 LOCAL on 10/28 (offset +1 now);
    # local midnight of 10/28 = 23:00 UTC on 10/27.
    assert _align(spark, "2024-10-27 23:30:00", G_1D, TZ) == "2024-10-27 23:00:00"


def test_month_alignment_and_period_end(spark):
    # March in Amsterdam starts at 23:00 UTC Feb 29 (offset +1)
    assert _align(spark, "2024-03-15 12:00:00", G_1MONTH, TZ) == "2024-02-29 23:00:00"
    # and ENDS at 22:00 UTC Mar 31 (offset +2 after spring-forward):
    # the month period is 30d23h in UTC terms — calendar-interval
    # arithmetic in the local zone gets this right, fixed-seconds math
    # cannot.
    assert _align(spark, "2024-03-15 12:00:00", G_1MONTH, TZ, align_end) \
        == "2024-03-31 22:00:00"


def test_on_grid_timestamp_closes_its_own_period_seconds(spark):
    """A ts exactly on the grid is a period END and must map to itself
    (ceil convention, matching bucket_epoch_end) — the 3GPP harvest emits
    exact granPeriod endTime values, which must not shift a period late."""
    from minerva_etl_46_spark.functions.timestamps import G_15M, G_1H

    assert _align(spark, "2024-03-15 12:00:00", G_1H, "UTC", align_end) \
        == "2024-03-15 12:00:00"
    assert _align(spark, "2024-03-15 12:15:00", G_15M, "UTC", align_end) \
        == "2024-03-15 12:15:00"
    # mid-period still rounds up to the closing grid point
    assert _align(spark, "2024-03-15 12:00:01", G_1H, "UTC", align_end) \
        == "2024-03-15 13:00:00"


def test_on_grid_timestamp_closes_its_own_period_calendar(spark):
    # Local midnight in Amsterdam (23:00 UTC, offset +1) is a day boundary:
    # align_end must return it unchanged, not the next local midnight.
    assert _align(spark, "2024-03-14 23:00:00", G_1D, TZ, align_end) \
        == "2024-03-14 23:00:00"
    # Local month start (Feb 29 23:00 UTC = Mar 1 00:00 local) maps to itself.
    assert _align(spark, "2024-02-29 23:00:00", G_1MONTH, TZ, align_end) \
        == "2024-02-29 23:00:00"
    # One second past local midnight closes at the NEXT local midnight
    # (22:00 UTC after spring-forward on the DST day).
    assert _align(spark, "2024-03-30 23:00:01", G_1D, TZ, align_end) \
        == "2024-03-31 22:00:00"


def test_fifteen_minute_alignment_is_tz_free(spark):
    from minerva_etl_46_spark.functions.timestamps import G_15M

    assert _align(spark, "2024-03-31 00:52:11", G_15M, TZ) == "2024-03-31 00:45:00"
    assert _align(spark, "2024-03-31 00:52:11", G_15M, "UTC") == "2024-03-31 00:45:00"


def test_dst_driver_keys_produce_the_23h_and_25h_days(spark):
    # The two DST driver keys (agg_time_dst / agg_time_dst_fall) slide the
    # events fixture onto the 2024 Amsterdam transitions. The local-day
    # bucket sequence must then contain exactly one short/long day:
    # spring-forward 2024-03-31 is 23 h, fall-back 2024-10-27 is 25 h.
    from minerva_etl_46_spark.queries import QUERIES
    from tests.conftest import SF_SMOKE

    for key, day_utc_start, width_h in (
        ("agg_time_dst", "2024-03-30 23:00:00", 23),
        ("agg_time_dst_fall", "2024-10-26 22:00:00", 25),
    ):
        rows = sorted(
            r["day_epoch"]
            for r in QUERIES[key](spark, SF_SMOKE).collect()
        )
        widths = {b - a for a, b in zip(rows, rows[1:])}
        # every interior day is 24 h except the single transition day
        assert widths == {24 * 3600, width_h * 3600}, (key, widths)
        start = [b - a for a, b in zip(rows, rows[1:])].index(width_h * 3600)
        import datetime as dt

        assert dt.datetime.fromtimestamp(
            rows[start], dt.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S") == day_utc_start, key
