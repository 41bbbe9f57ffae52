"""End-to-end training-corpus build: the composition a 100 TB pipeline
actually runs, wiring the §2.11 operators in their production order.

    raw docs
      → exact dedup       (md5 keep-canonical; removes byte-dups first so
                           nothing downstream pays for them)
      → near-dup groups   (MinHash→LSH→Jaccard verify→connected components;
                           keep the min-id doc per group)
      → decontamination   (5-gram overlap vs the benchmark set; drop docs
                           over the contamination threshold)
      → quality filters   (repetition ratio + token-count floor)
      → split/shard       (md5-deterministic train/eval + shard id)
      → write             (parquet partitioned by split, shard — the file
                           layout a trainer streams)

Every stage is the already-tested operator; this module only owns the
composition and the stage-count bookkeeping. Everything is deterministic
in the input bytes: rerunning on the same corpus yields byte-identical
output (asserted in tests/test_corpus_pipeline.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from minerva_etl_46_spark.operators.dedup import (
    connected_components,
    contamination_scores,
    exact_dedup,
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_signature,
)
from minerva_etl_46_spark.operators.export import shard_assign
from minerva_etl_46_spark.operators.textstats import repetition_stats


@dataclass
class CorpusConfig:
    gram_n: int = 5
    contamination_max: float = 0.2
    repetition_max: float = 0.6
    min_tokens: int = 5
    jaccard_threshold: float = 0.5
    lsh_bands: int = 16
    minhash_k: int = 32
    max_bucket_size: int | None = 2000
    n_shards: int = 16
    train_pct: int = 90


@dataclass
class CorpusStats:
    """Per-stage survivor counts — the run report a pipeline owner reads."""
    input: int = 0
    after_exact_dedup: int = 0
    after_near_dedup: int = 0
    after_decontamination: int = 0
    after_quality: int = 0
    counts: dict = field(default_factory=dict)


def build_training_corpus(
    docs: DataFrame,
    bench_pred: Column,
    out_dir: str | None = None,
    cfg: CorpusConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, CorpusStats]:
    """Returns (final corpus frame with split/shard columns, stage stats).
    When ``out_dir`` is given, also writes parquet partitioned by
    (split, shard). Benchmark docs themselves are excluded from the
    training corpus (they ARE the eval suite)."""
    cfg = cfg or CorpusConfig()
    stats = CorpusStats()
    stats.input = docs.count()

    # 1. exact dedup — keep each content group's canonical (min-id) doc
    groups = exact_dedup(docs, id_col, text_col)
    docs1 = docs.join(
        groups.select(F.col("canonical_id").alias(id_col)), id_col, "semi"
    ).localCheckpoint(eager=False)  # feeds signature + verify + final join
    stats.after_exact_dedup = docs1.count()

    # 2. near-dup groups — min-id doc per connected component survives
    sig = minhash_signature(docs1, id_col, text_col, k=cfg.minhash_k)
    cands = lsh_candidate_pairs(sig, id_col, k=cfg.minhash_k,
                                bands=cfg.lsh_bands,
                                max_bucket_size=cfg.max_bucket_size)
    verified = jaccard_verify(docs1, cands, id_col, text_col,
                              threshold=cfg.jaccard_threshold)
    comp = connected_components(verified.select("a_id", "b_id"))
    losers = comp.filter(F.col("node") != F.col("group_id")) \
                 .select(F.col("node").alias(id_col))
    docs2 = docs1.join(losers, id_col, "anti").localCheckpoint(eager=False)
    stats.after_near_dedup = docs2.count()

    # 3. decontamination — drop flagged docs and the benchmark docs
    # themselves. Anti-join on the FLAGGED set, not semi-join on the
    # clean set: contamination_scores omits docs with < gram_n tokens
    # (no grams → can't leak), and a semi-join silently dropped those
    # from the corpus as if contaminated (r10 review — masked only while
    # min_tokens coincided with gram_n).
    scores = contamination_scores(docs2, id_col, text_col, bench_pred,
                                  gram_n=cfg.gram_n,
                                  flag_threshold=cfg.contamination_max)
    flagged = scores.filter(F.col("contaminated")).select(id_col)
    docs3 = docs2.filter(~bench_pred).join(flagged, id_col, "anti")
    stats.after_decontamination = docs3.count()

    # 4. quality — repetition ceiling + token floor
    rep = repetition_stats(docs3, id_col, text_col)
    keep = rep.filter(
        (F.col("repetition") <= cfg.repetition_max)
        & (F.col("n_tok") >= cfg.min_tokens)
    ).select(id_col)
    docs4 = docs3.join(keep, id_col, "semi")
    stats.after_quality = docs4.count()

    # 5. deterministic split + shard
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10) \
        .cast("long")
    final = shard_assign(docs4, id_col, cfg.n_shards).withColumn(
        "split",
        F.when(h % 100 < cfg.train_pct, "train").otherwise("eval"),
    )
    if out_dir is not None:
        final.write.mode("overwrite").partitionBy("split", "shard") \
            .parquet(out_dir)

    stats.counts = {
        "input": stats.input,
        "after_exact_dedup": stats.after_exact_dedup,
        "after_near_dedup": stats.after_near_dedup,
        "after_decontamination": stats.after_decontamination,
        "after_quality": stats.after_quality,
    }
    return final, stats
