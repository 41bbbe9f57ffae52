#!/usr/bin/env python
"""Runnable end-to-end training-corpus build over the fixture documents.

    python examples/build_training_corpus.py [sf_dir] [out_dir]

Composes the §2.11 pipeline (exact dedup → LSH near-dup groups →
benchmark decontamination → quality gates → deterministic split/shard →
partitioned parquet) via plans/corpus.py and prints the per-stage
survivor counts a pipeline owner watches.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minerva_etl_46_spark.plans.corpus import build_training_corpus
from minerva_etl_46_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="training_corpus_")
    spark = get_spark(app_name="build-training-corpus")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    final, stats = build_training_corpus(
        docs, bench_pred=F.col("doc_id") % 97 == 0, out_dir=out_dir,
    )
    per_split = {
        r["split"]: r["n"]
        for r in final.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(json.dumps({"stages": stats.counts, "splits": per_split,
                      "out_dir": out_dir}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
