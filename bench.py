#!/usr/bin/env python
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {key: sec}, "sf": ...}.

Each query is materialized through the noop sink (full execution, no
driver-side collect cost in the measurement)."""

from __future__ import annotations

import json
import os
import sys
import time

from minerva_etl_46_spark.queries import QUERIES
from minerva_etl_46_spark.session import get_spark


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="minerva-bench")
    timings: dict[str, float] = {}
    # warm the JVM/IO once on the flagship shape so per-query numbers
    # aren't dominated by first-job startup
    materialize(QUERIES["agg_time"](spark, sf_dir))
    for key in sorted(QUERIES):
        t0 = time.perf_counter()
        try:
            materialize(QUERIES[key](spark, sf_dir))
            timings[key] = round(time.perf_counter() - t0, 3)
        except Exception as ex:  # a broken query must not hide the rest
            timings[key] = -1.0
            print(f"bench: {key} FAILED: {ex}", file=sys.stderr)
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(json.dumps({
        "metric": "total_query_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
