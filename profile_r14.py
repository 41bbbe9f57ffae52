#!/usr/bin/env python
"""Round-14 optimization probe: time selected keys in isolation through the
noop sink (guide §1.4) and dump their .explain("formatted") plans.

Usage:
  python profile_r14.py --keys llm_dedup_near,graph_triangles --repeat 3
  python profile_r14.py --keys llm_dedup_near --plan-dir plans/r14 --suffix before

Honors $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py (same session
construction, same noop-sink methodology), so numbers here are directly
comparable to bench.py per-key seconds."""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
import time

from minerva_etl_46_spark.queries import QUERIES
from minerva_etl_46_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", required=True,
                    help="comma-separated registry keys")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--plan-dir", default=None,
                    help="also write <key>_<suffix>.txt explain(formatted)")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()
    keys = [k.strip() for k in args.keys.split(",") if k.strip()]
    missing = [k for k in keys if k not in QUERIES]
    if missing:
        sys.exit(f"unknown keys: {missing}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile-r14")
    # same warmup as bench.py so first-key numbers aren't JVM bootstrap
    import bench
    bench.warmup(spark, sf_dir)
    for key in keys:
        spark.sparkContext.setJobDescription(f"r14-profile: {key}")
        times = []
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            QUERIES[key](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{key:28s} {' '.join(f'{t:7.3f}' for t in times)}  "
              f"min={min(times):.3f}", flush=True)
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                QUERIES[key](spark, sf_dir).explain("formatted")
            path = os.path.join(args.plan_dir, f"{key}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"  plan -> {path}", flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
