#!/usr/bin/env python
"""Runnable PM-monitoring flow: the daily report pack a NOC would run over
a trend store (SURVEY §2.4 A13–A15, §2.5 W12, D10).

    python examples/pm_monitoring.py [sf_dir]

One scan of the event feed fans into the four r5-B monitoring reports plus
threshold notifications, each a registered query-builder — the same code
the correctness gate hash-checks:

1. availability  — per (entity, day): hourly sample buckets present / 24
                   (feed-completeness; gaps mean a harvester is behind);
2. busy hour     — per (entity, day): the peak-traffic hour (capacity
                   planning input);
3. z-score       — samples deviating >3σ from the entity's OWN trailing
                   behaviour (anomalies a fixed threshold can't see);
4. trend slope   — per-entity least-squares value-vs-time slope (which
                   counters are degrading fastest);
5. notifications — D10 trigger rules over the hourly KPI rollup;
6. MAD outliers  — robust |value − median| > 5·MAD flags (W16);
7. counter resets — reboot/wrap detection in cumulative counters (W12);
8. day-over-day  — steepest same-hour traffic drops (W14);
9. mix diversity — Gini impurity of each entity's event mix (A19).

Everything is one JVM-side DataFrame plan per report; the priciest is one
window sort (z-score). SCALE.md's r5b probe measures these shapes at 20M
events.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minerva_etl_46_spark.queries import QUERIES
from minerva_etl_46_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="pm-monitoring")
    spark.sparkContext.setLogLevel("ERROR")

    avail = QUERIES["agg_availability"](spark, sf_dir)
    worst = (
        avail.orderBy(F.asc("avail_pct"), F.asc("user_id"), F.asc("day_epoch"))
        .limit(5).collect()
    )
    print("feed completeness — 5 worst (entity, day) cells:")
    for r in worst:
        print(f"  entity {r.user_id:6d}  day@{r.day_epoch}  "
              f"{r.n_present:2d}/24 hourly buckets ({r.avail_pct:.0%})")

    busy = QUERIES["agg_busy_hour"](spark, sf_dir)
    dist = (busy.groupBy("busy_hour").count()
            .orderBy(F.desc("count")).limit(3).collect())
    print("busy-hour distribution — top 3 peak hours across entity-days:")
    for r in dist:
        print(f"  {r.busy_hour:02d}:00  ({r['count']} entity-days)")

    z = QUERIES["win_zscore"](spark, sf_dir)
    # one execution of the priciest plan: collect the (small) anomaly set,
    # then count and rank locally rather than re-running the window sort
    anomalies = z.filter(F.abs(F.col("zscore")) > 3).collect()
    print(f"anomalies (|z| > 3 vs trailing 20 samples): {len(anomalies)}")
    for r in sorted(anomalies, key=lambda r: -abs(r.zscore))[:3]:
        print(f"  event {r.event_id} entity {r.user_id}: value {r.value:.2f}, "
              f"z = {r.zscore:+.1f}")

    slope = QUERIES["agg_regr_slope"](spark, sf_dir)
    degrading = slope.orderBy(F.asc("slope_per_sec")).limit(3).collect()
    print("fastest-degrading entities (value/sec trend):")
    for r in degrading:
        print(f"  entity {r.user_id:6d}  slope {r.slope_per_sec:+.3e}/s "
              f"over n={r.n}")

    notif = QUERIES["trigger_notify"](spark, sf_dir)
    print(f"threshold notifications raised: {notif.count()}")

    # r5-D/G additions to the pack: robust outliers, smoothing baseline,
    # counter hygiene, period-over-period, mix diversity
    mad = QUERIES["win_outlier_mad"](spark, sf_dir)
    n_mad = mad.filter(F.col("is_outlier") == 1).count()
    print(f"robust outliers (|value − median| > 5·MAD): {n_mad}")

    resets = QUERIES["win_counter_reset"](spark, sf_dir)
    n_resets = resets.filter(F.col("is_reset") == 1).count()
    print(f"counter resets detected (reboot/wrap): {n_resets}")

    dod = QUERIES["win_dod_change"](spark, sf_dir)
    drops = (dod.filter(F.col("change") < -0.5)
             .orderBy(F.asc("change"), F.asc("user_id"), F.asc("bucket"))
             .limit(3).collect())
    print("steepest day-over-day traffic drops (>50%):")
    for r in drops:
        print(f"  entity {r.user_id:6d}  bucket@{r.bucket}  "
              f"{r.change:+.0%} vs same hour yesterday")

    gini = QUERIES["agg_gini"](spark, sf_dir)
    mono = gini.orderBy(F.asc("gini"), F.asc("user_id")).limit(3).collect()
    print("least-diverse event mixes (possible stuck reporters):")
    for r in mono:
        print(f"  entity {r.user_id:6d}  gini {r.gini:.3f} "
              f"over {r.n_events} events / {r.n_types} types")

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
