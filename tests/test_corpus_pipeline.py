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


def test_corpus_pipeline_survives_hostile_docs(spark, tmp_path):
    """r11: the FULL training-corpus composition over hostile documents —
    NULL text, empty text, whitespace runs, a duplicate pair, a 1-token
    doc. The pipeline must neither crash nor silently lose accountable
    docs: every input doc is either in the final corpus or attributed to
    a stage drop, and the null/empty docs go out at the QUALITY stage
    (repetition_stats keeps them as zero-count rows now — the r11 fix —
    so the min-token filter drops them explicitly)."""
    from pyspark.sql import functions as F

    from minerva_etl_46_spark.plans.corpus import build_training_corpus

    base = " ".join(f"tok{i}" for i in range(40))
    rows = [
        (0, base, "en", "web", len(base)),
        (1, base, "en", "web", len(base)),              # exact duplicate
        (2, base + " extra tail tokens here", "en", "web", 0),  # near-dup
        (3, None, "en", "web", 0),                       # NULL text
        (4, "", "en", "web", 0),                         # empty
        (5, "solo", "en", "web", 4),                     # 1 token
        (6, " ".join(f"w{i}" for i in range(60)), "en", "web", 0),
        (7, " ".join(f"v{i}" for i in range(60)), "en", "web", 0),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    final, stats = build_training_corpus(
        docs, bench_pred=F.lit(False), out_dir=str(tmp_path / "out"))
    kept = {r["doc_id"] for r in final.select("doc_id").collect()}
    # duplicates collapse to the canonical id 0; 2 is a near-dup of 0
    assert 1 not in kept and 2 not in kept
    # null/empty/1-token docs fail the quality gate, explicitly
    assert not ({3, 4, 5} & kept)
    # the real docs survive
    assert {0, 6, 7} <= kept
    # accounting: every stage count is consistent (no silent losses)
    assert stats.counts["input"] == len(rows)
    assert stats.counts["after_quality"] == len(kept)
