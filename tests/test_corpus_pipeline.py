"""End-to-end training-corpus pipeline (plans/corpus.py): stage monotonic
shrinkage, planted dups/contamination actually removed, determinism."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from minerva_etl_46_spark.plans.corpus import CorpusConfig, build_training_corpus

SF = "/root/testdata/sf0.001"


def _docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text")
    # plant: 5 exact dups (ids 10000+i copy doc i) and one heavily
    # repeated doc that must fail the quality gate
    dups = base.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text")
    junk = spark.createDataFrame(
        [(20000, " ".join(["spam"] * 50))], "doc_id long, text string")
    return base.unionByName(dups).unionByName(junk) \
        .localCheckpoint(eager=True)


def test_pipeline_stages_and_planted_removals(spark, tmp_path):
    docs = _docs(spark)
    out_dir = os.path.join(str(tmp_path), "corpus")
    final, stats = build_training_corpus(
        docs, bench_pred=F.col("doc_id") % 97 == 0, out_dir=out_dir,
    )
    c = stats.counts
    assert c["input"] > c["after_exact_dedup"], "planted exact dups survived"
    assert c["after_exact_dedup"] >= c["after_near_dedup"]
    assert c["after_near_dedup"] >= c["after_decontamination"]
    assert c["after_decontamination"] > c["after_quality"], \
        "planted all-repetition doc survived the quality gate"

    got = final.select("doc_id").toPandas()["doc_id"]
    assert not set(range(10000, 10005)) & set(got), "exact dup ids kept"
    assert 20000 not in set(got), "junk doc kept"
    # benchmark docs are excluded from the training corpus
    assert not [i for i in got if i % 97 == 0]

    # the written layout is partitioned by split and shard
    out = spark.read.parquet(out_dir)
    assert {"split", "shard"} <= set(out.columns)
    assert out.count() == c["after_quality"]
    assert set(r["split"] for r in out.select("split").distinct().collect()) \
        <= {"train", "eval"}


def test_pipeline_deterministic(spark):
    docs = _docs(spark)
    a, _ = build_training_corpus(docs, bench_pred=F.col("doc_id") % 97 == 0)
    b, _ = build_training_corpus(docs, bench_pred=F.col("doc_id") % 97 == 0)
    pa = a.sort("doc_id").toPandas()
    pb = b.sort("doc_id").toPandas()
    assert pa.equals(pb), "pipeline output must be deterministic in input bytes"
