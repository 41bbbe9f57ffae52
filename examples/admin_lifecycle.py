#!/usr/bin/env python
"""Runnable admin lifecycle: the reference operator's day-one loop
(SURVEY §0 "Administer", D11) end to end against a scratch root.

    python examples/admin_lifecycle.py [root_dir]

1. apply      — desired instance YAML → live root ({root}/instance.yaml
                + store dirs); re-apply is a no-op (idempotent).
2. load       — write a day of 15-minute counters into the declared part
                (partitioned parquet, modified-log side effect).
3. evolve     — edit the desired YAML (new trend + type widen), apply the
                diff; the earlier files are NOT rewritten — read_part
                surfaces the new column as typed NULLs and casts the
                widened one (zero-rewrite schema evolution).
4. query      — the data-service pager over the store, then the same page
                over HTTP (ephemeral port), proving the wire face sees
                the evolved schema too.

Every step is the same code the test suite drives
(tests/test_instance_lifecycle.py, tests/test_service.py); this script
exists so an operator can watch the loop run in one command.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minerva_etl_46_spark.instance import (
    apply_instance,
    instance_from_yaml,
    load_live,
    part_storage,
    read_part,
)
from minerva_etl_46_spark.service_http import make_server
from minerva_etl_46_spark.session import get_spark

DESIRED_V1 = """
trend_stores:
  - data_source: pm
    entity_type: Cell
    granularity: 15m
    partition_size_seconds: 3600
    parts:
      - name: traffic
        trends:
          - {name: calls, data_type: integer, time_aggregation: sum}
"""

DESIRED_V2 = DESIRED_V1.replace(
    "- {name: calls, data_type: integer, time_aggregation: sum}",
    "- {name: calls, data_type: bigint, time_aggregation: sum}\n"
    "          - {name: drops, data_type: real}",
)


def main(root: str) -> None:
    spark = get_spark(app_name="admin-lifecycle")

    print("== 1. apply v1 ==")
    for c in apply_instance(root, instance_from_yaml(DESIRED_V1)):
        print("  ", type(c).__name__, c)
    assert apply_instance(root, instance_from_yaml(DESIRED_V1)) == []
    print("   re-apply: converged (no changes)")

    print("== 2. load a day of counters ==")
    store = load_live(root).trend_stores[0]
    storage = part_storage(root, store, "traffic")
    day = spark.range(96).select(
        (F.col("id") % 4 + 1).alias("entity_id"),
        F.timestamp_seconds(1704067200 + F.col("id") * 900).alias("ts"),
        (F.col("id") % 50).cast("int").alias("calls"),
    )
    buckets = storage.write(day, ts_col="ts")
    print(f"   wrote 96 rows across {len(buckets)} hourly partitions")

    print("== 3. evolve: widen calls, add drops ==")
    for c in apply_instance(root, instance_from_yaml(DESIRED_V2)):
        print("  ", type(c).__name__, c)
    evolved = load_live(root).trend_stores[0]
    df = read_part(spark, root, evolved, "traffic")
    print("   evolved read schema:", dict(df.dtypes))
    assert dict(df.dtypes)["calls"] == "bigint"
    assert dict(df.dtypes)["drops"] == "float"

    print("== 4. serve and query over HTTP ==")
    srv = make_server(spark, storage.base_dir, partition_size_s=3600)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = (f"http://127.0.0.1:{port}/query?part=traffic"
               f"&start=1704067200&end=1704074400&page_size=5")
        with urllib.request.urlopen(url, timeout=120) as resp:
            body = json.loads(resp.read())
        print(f"   first page: {len(body['rows'])} rows, "
              f"cursor={body['next_after']}")
        assert len(body["rows"]) == 5 and body["next_after"] is not None
    finally:
        srv.shutdown()
    print("lifecycle complete")


if __name__ == "__main__":
    import tempfile

    main(sys.argv[1] if len(sys.argv) > 1
         else tempfile.mkdtemp(prefix="minerva_admin_"))
