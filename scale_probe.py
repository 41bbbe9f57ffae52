#!/usr/bin/env python
"""Scale probe: run the engine's core operator shapes on synthetic data
~200x the sf0.1 fixtures (default 20M events, 100k entities) and print one
JSON line per shape: wall-clock + shuffle (exchange) count.

Purpose (SURVEY.md §6 / BASELINE scale target): measured evidence that the
partition/shuffle strategy holds as data grows — rollups stay one-exchange,
upsert work is bounded by touched partitions, the range join stays linear
under a hot key. SCALE.md records results + extrapolation.

SCALE_PROBE_ROWS=2000000 python scale_probe.py   # quicker variant
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from minerva_etl_46_spark.catalog import Trend
from minerva_etl_46_spark.functions.timestamps import G_1H
from minerva_etl_46_spark.operators.asof import asof_join
from minerva_etl_46_spark.operators.rangejoin import bucketed_range_join
from minerva_etl_46_spark.operators.rollup import time_rollup
from minerva_etl_46_spark.operators.upsert import upsert_latest
from minerva_etl_46_spark.operators.windows import topk_per_group
from minerva_etl_46_spark.session import get_spark

N = int(os.environ.get("SCALE_PROBE_ROWS", 20_000_000))
USERS = max(1000, N // 200)
SPAN_S = 30 * 86400
BASE = 1704067200


def synth_events(spark, n=N, hot_user_fraction=0.0):
    e = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(BASE + (F.col("id") * 997) % SPAN_S).alias("ts"),
        (F.xxhash64("id") % USERS).alias("user_id"),
        ((F.col("id") % 100000) / 7.0).alias("value"),
    )
    if hot_user_fraction > 0:
        # route a fraction of all rows onto one hot entity (skew stressor)
        e = e.withColumn(
            "user_id",
            F.when(F.col("event_id") % int(1 / hot_user_fraction) == 0, F.lit(7))
            .otherwise(F.col("user_id")),
        )
    return e


def timed(label, df, results):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = round(time.perf_counter() - t0, 2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    results[label] = {
        "sec": dt,
        "exchanges": plan.count("Exchange "),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
    }
    print(json.dumps({"shape": label, **results[label]}), flush=True)


def synth_docs(spark, n_docs):
    """Corpus with PLANTED near-duplicates: every id ≡ 1 (mod 10) is a copy
    of id−1 with 2 of 30 words mutated (3-gram shingle Jaccard ≈ 0.65, so
    every planted pair truly exceeds the 0.5 dedup threshold). Unrelated
    docs share no tokens (hash vocabulary) — ground truth IS the planted
    set, checkable at any scale without an all-pairs pass."""
    d = spark.range(n_docs)
    is_dup = F.col("id") % 10 == 1
    base = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
    words = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda i: F.concat(
            F.lit("w"),
            F.when(is_dup & ((i == 4) | (i == 14)),
                   F.xxhash64(F.col("id"), i, F.lit(1)))
            .otherwise(F.xxhash64(base, i, F.lit(0))).cast("string"),
        ),
    )
    return d.select(F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text"))


def dedup_pipeline_probe(spark, res, n_docs):
    """VERDICT r1 item 6: the production dedup composition — LSH candidates
    → exact-Jaccard verify → connected components — end-to-end at probe
    scale, with recall measured against the planted ground truth."""
    from minerva_etl_46_spark.operators.dedup import (
        connected_components,
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signature,
    )

    docs = synth_docs(spark, n_docs).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    sig = minhash_signature(docs, "doc_id", "text", k=32)
    # bands=16 (r=2, s50=0.25) matches the 0.5 Jaccard threshold: expected
    # recall 1-(1-s^2)^16 ≈ 0.9998 at s=0.65. bands=8 (r=4, s50=0.595)
    # measures 0.79 on the same corpus — band width must track threshold.
    cands = lsh_candidate_pairs(sig, "doc_id", k=32, bands=16)
    verified = jaccard_verify(docs, cands, "doc_id", "text", threshold=0.5)
    verified = verified.localCheckpoint(eager=True)  # consumed twice below
    groups = connected_components(verified)
    n_nodes = groups.count()
    dt = round(time.perf_counter() - t0, 2)

    planted = (
        spark.range(n_docs).filter(F.col("id") % 10 == 1)
        .select((F.col("id") - 1).alias("a_id"), F.col("id").alias("b_id"))
    )
    truth_cnt = planted.count()
    found = verified.join(planted, ["a_id", "b_id"]).count()
    recall = round(found / truth_cnt, 4) if truth_cnt else 1.0
    res["dedup_pipeline_lsh"] = {
        "sec": dt, "docs": n_docs, "truth_pairs": truth_cnt,
        "verified_pairs": found, "recall": recall, "grouped_nodes": n_nodes,
    }
    print(json.dumps({"shape": "dedup_pipeline_lsh", **res["dedup_pipeline_lsh"]}),
          flush=True)


def incremental_dedup_probe(spark, res, n_docs, batch_frac=100):
    """Round-4 X2f: asymmetric LSH ingest — a new batch (n_docs/batch_frac
    mutated copies) probes STORED corpus signatures. The claim under test:
    per-batch wall-clock is batch-bounded, i.e. a small fraction of the
    full self-join pass (dedup_pipeline_probe) on the same corpus, because
    neither the corpus text (verify is candidate-restricted) nor a corpus
    self-join is touched — only the one-off signature build (excluded:
    production stores it at ingest) scans the corpus."""
    from minerva_etl_46_spark.operators.dedup import (
        incremental_near_dup,
        minhash_signature,
    )

    docs = synth_docs(spark, n_docs).localCheckpoint(eager=True)
    sig = minhash_signature(docs, "doc_id", "text", k=32)
    sig = sig.localCheckpoint(eager=True)  # the stored signature table
    # batch: mutated copies of every batch_frac-th doc (2 of 30 words →
    # Jaccard ≈ 0.65, same planted recipe as synth_docs)
    src = synth_docs(spark, n_docs).filter(F.col("doc_id") % batch_frac == 0)
    batch = src.select(
        (F.col("doc_id") + n_docs).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail mutation token")).alias("text"),
    ).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    verified = incremental_near_dup(docs, batch, "doc_id", "text", k=32,
                                    bands=16, corpus_sig=sig)
    verified = verified.localCheckpoint(eager=True)
    dt = round(time.perf_counter() - t0, 2)
    truth = batch.count()
    found = (
        verified.filter(F.col("b_id") == F.col("a_id") - n_docs).count()
    )
    res["incremental_dedup_lsh"] = {
        "sec": dt, "docs": n_docs, "batch": truth,
        "matched_to_source": found,
        "recall": round(found / truth, 4) if truth else 1.0,
    }
    print(json.dumps({"shape": "incremental_dedup_lsh",
                      **res["incremental_dedup_lsh"]}), flush=True)


def export_probe(spark, res, n_docs):
    """Round-3 ops at probe scale: sequence packing (one shard-key
    exchange + per-shard sequential state), benchmark decontamination
    (corpus gram explode vs broadcast bench grams), IVF ANN (one
    assignment pass; candidates ∝ corpus × n_probe/n_cells)."""
    from minerva_etl_46_spark.operators.dedup import contamination_scores
    from minerva_etl_46_spark.operators.export import pack_sequences
    from minerva_etl_46_spark.operators.similarity import cosine_topk_ivf

    docs = synth_docs(spark, n_docs).localCheckpoint(eager=True)
    timed(f"pack_sequences_{n_docs}",
          pack_sequences(docs, "doc_id", "text", n_shards=64,
                         max_tokens=512), res)
    timed(f"decontaminate_{n_docs}",
          contamination_scores(docs, "doc_id", "text",
                               bench_pred=F.col("doc_id") % 1000 == 0,
                               gram_n=5), res)
    emb = spark.range(n_docs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: ((F.xxhash64(F.col("id"), j) % 1000) / 500.0 - 1.0)
            .cast("float"),
        ).alias("embedding"),
    ).localCheckpoint(eager=True)
    timed(f"ivf_topk_{n_docs}",
          cosine_topk_ivf(emb, query_mod=max(1, n_docs // 10), k=5,
                          n_cells=64, n_probe=8), res)


def embed_neardup_probe(spark, res, n_vec):
    """Round-5 probe: the banded embedding near-dup path
    (cosine_near_dup_pairs — since r5 the llm_dedup_embed production
    route) at a scale where the all-pairs alternative is impossible:
    n_vec=1M → 5·10¹¹ candidate pairs all-pairs, vs bands×n_vec band
    rows here. Embeddings are synthetic 64-dim; every id ≡ 1 (mod 20)
    is a copy of id−1 with 2 of 64 dims perturbed (cos ≈ 0.997), so
    ground truth is the planted set and recall is checkable without any
    exact pass. Production tuning for a high-similarity threshold:
    nbits=64, bands=4 → r=16, because BUCKET COUNT is the binding
    constraint at scale: a band has 2^r distinct buckets, so r must
    satisfy corpus/2^r ≈ target bucket size (r=4 → 16 buckets/band →
    at 100k vectors EVERY bucket exceeds any sane cap and recall
    collapses — measured 0.13 before this tuning; r=16 → 65k
    buckets/band → recall 0.9998 measured). Wide signatures route
    srp_signature's Arrow/numpy path automatically (the 4096-literal
    codegen alternative takes minutes to compile)."""
    from minerva_etl_46_spark.operators.similarity import cosine_near_dup_pairs

    is_dup = F.col("id") % 20 == 1
    base = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
    emb = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: (
                ((F.xxhash64(base, j) % 1000) / 500.0 - 1.0)
                + F.when(is_dup & (j < 2),
                         (F.xxhash64(F.col("id"), j, F.lit(1)) % 100) / 500.0)
                .otherwise(F.lit(0.0))
            ).cast("float"),
        ).alias("embedding"),
    ).localCheckpoint(eager=True)
    # exact=False: the production double-fold verify. The decimal twin is
    # for the oracle-keyed fixture path only — at this probe's candidate
    # volume (~corpus × bucket_size pairs × 64 dims) interpreted
    # BigDecimal arithmetic ran >30 min where double finishes in minutes.
    pairs = cosine_near_dup_pairs(emb, threshold=0.9, nbits=64, bands=4,
                                  max_bucket_size=2000, exact=False)
    # persist so the recall count below reuses the timed materialization
    # instead of re-running the whole signature+join+verify pipeline
    pairs = pairs.persist()
    timed(f"cosine_near_dup_{n_vec}", pairs, res)
    n_planted = n_vec // 20
    n_planted_found = pairs.filter(
        (F.col("b_id") == F.col("a_id") + 1) & (F.col("b_id") % 20 == 1)
    ).count()
    res[f"cosine_near_dup_{n_vec}"]["planted_recall"] = round(
        n_planted_found / n_planted, 4
    )
    print(json.dumps({"shape": f"cosine_near_dup_{n_vec}",
                      "planted": n_planted, "found": n_planted_found}),
          flush=True)
    pairs.unpersist()


def monitoring_probe(spark, res, n_events, n_docs):
    """r5-B shapes at probe scale: the PM monitoring reports (availability,
    busy-hour, trailing z-score, trend slope) on the 20M-event frame and
    the corpus search/caps (BM25, domain cap) on the 1M-doc corpus —
    evidence the new keys keep their PLANS.md shapes when data grows 200×
    past the fixtures."""
    from pyspark.sql import Window

    e = synth_events(spark, n_events)
    day = (F.unix_seconds("ts") / 86400).cast("long") * 86400
    hour = (F.unix_seconds("ts") / 3600).cast("long") * 3600

    avail = (
        e.select("user_id", day.alias("day_epoch"), hour.alias("hour_epoch"))
        .groupBy("user_id", "day_epoch")
        .agg(F.count_distinct("hour_epoch").alias("n_present"))
    )
    timed("availability_report", avail, res)

    hourly = (
        e.select("user_id", day.alias("day_epoch"), hour.alias("hour_epoch"),
                 "value")
        .groupBy("user_id", "day_epoch", "hour_epoch")
        .agg(F.sum("value").alias("traffic"))
    )
    wbh = Window.partitionBy("user_id", "day_epoch").orderBy(
        F.desc("traffic"), F.asc("hour_epoch"))
    timed("busy_hour",
          hourly.withColumn("rn", F.row_number().over(wbh))
          .filter(F.col("rn") == 1).drop("rn"), res)

    dec = F.col("value").cast("decimal(18,6)")
    wz = (Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-20, -1))
    stats = e.select(
        "event_id", "user_id", "value",
        F.count("value").over(wz).alias("n"),
        F.sum(dec).over(wz).cast("double").alias("s1"),
        F.sum(dec * dec).over(wz).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("n").cast("double") * mean * mean) / (F.col("n") - 1)
    timed("zscore_window",
          stats.filter((F.col("n") >= 10) & (var > 0))
          .select("event_id", ((F.col("value") - mean) / F.sqrt(var))
                  .alias("z")), res)

    x = F.unix_seconds("ts").cast("decimal(12,0)")
    timed("regr_slope",
          e.select("user_id", x.alias("x"), dec.alias("y"))
          .groupBy("user_id")
          .agg(F.count(F.lit(1)).alias("n"),
               F.sum("x").cast("double").alias("sx"),
               F.sum("y").cast("double").alias("sy"),
               F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
               F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx")),
          res)

    d = synth_docs(spark, n_docs)
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("dl").alias("total_len"))
    qterms = (toks.distinct().groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
              .orderBy(F.desc("df"), F.asc("tok")).limit(3))
    tf = (toks.join(F.broadcast(qterms), "tok")
          .groupBy("doc_id", "tok", "df").agg(F.count(F.lit(1)).alias("tf")))
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    score = ((F.col("n_docs").cast("double") - F.col("df") + 0.5)
             / (F.col("df") + 0.5) * (F.col("tf") * 2.2)
             / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / avgdl)))
    timed("bm25_top20",
          tf.join(dl, "doc_id").crossJoin(F.broadcast(corpus))
          .select("doc_id", score.cast("decimal(38,6)").alias("s"))
          .groupBy("doc_id").agg(F.sum("s").cast("double").alias("bm25"))
          .orderBy(F.desc("bm25"), F.asc("doc_id")).limit(20), res)

    dom = d.withColumn("domain", (F.col("doc_id") % 1000).cast("string"))
    wd = Window.partitionBy("domain").orderBy(
        F.desc(F.length("text")), F.asc("doc_id"))
    timed("domain_cap",
          dom.withColumn("rnk", F.row_number().over(wd))
          .filter(F.col("rnk") <= 20).select("doc_id", "domain", "rnk"), res)

    from minerva_etl_46_spark.operators.multimodal import (
        perceptual_hash,
        phash_near_dup_pairs,
        wrap_as_media,
    )

    media = wrap_as_media(d, id_col="doc_id", text_col="text")
    timed("phash_neardup",
          phash_near_dup_pairs(perceptual_hash(media), max_hamming=10), res)


def text_signals_probe(spark, res, n_events, n_docs):
    """r5-C/D shapes at probe scale: winnowing fingerprints, CDC chunking
    and n-gram novelty on the 1M-doc corpus (each linear with a small
    constant — w× membership, 1× position, gram-frequency-bounded join),
    plus the funnel HOF walk and time-weighted average on the 20M-event
    frame (ONE exchange each)."""
    from pyspark.sql import Window

    from minerva_etl_46_spark.operators.textstats import winnow_fingerprints

    d = synth_docs(spark, n_docs).localCheckpoint(eager=True)
    timed(f"winnow_{n_docs}",
          winnow_fingerprints(d, "doc_id", "text", k=4, w=5), res)

    tk = F.split(F.col("text"), " ")
    p = d.filter(F.size(tk) >= 4).select(
        "doc_id",
        F.posexplode(F.transform(
            F.sequence(F.lit(1), F.size(tk) - F.lit(3)),
            lambda i: F.md5(F.array_join(F.slice(tk, i, 4), " ")),
        )).alias("pos0", "h"),
    ).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"),
        F.when((F.col("pos0") == 0) | (F.substring("h", 1, 1) == "0"),
               F.lit(1)).otherwise(F.lit(0)).alias("boundary"),
    )
    wc = (Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    chunks = (p.withColumn("chunk_id", F.sum("boundary").over(wc))
              .groupBy("doc_id", "chunk_id").agg(F.count(F.lit(1)).alias("len")))
    timed(f"cdc_chunk_{n_docs}",
          chunks.groupBy("doc_id").agg(
              F.count(F.lit(1)).alias("n_chunks"),
              F.max("len").alias("max_len")), res)

    grams = (
        d.filter(F.size(tk) >= 5).select(
            "doc_id",
            F.explode(F.transform(
                F.sequence(F.lit(1), F.size(tk) - F.lit(4)),
                lambda i: F.array_join(F.slice(tk, i, 5), " "),
            )).alias("gram")).distinct()
    )
    firstg = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    nov = grams.join(firstg, "gram").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
        .alias("n_novel"))
    timed(f"novelty_{n_docs}", nov, res)
    # the planted dup recipe doubles as ground truth here too: every
    # id ≡ 1 (mod 10) is a near-copy of id−1, so its novelty must be low
    planted_mean = (nov.filter(F.col("doc_id") % 10 == 1)
                    .agg(F.avg(F.col("n_novel") / F.col("n_grams"))).first()[0])
    fresh_mean = (nov.filter(F.col("doc_id") % 10 != 1)
                  .agg(F.avg(F.col("n_novel") / F.col("n_grams"))).first()[0])
    res[f"novelty_{n_docs}"]["planted_dup_novelty"] = round(planted_mean, 4)
    res[f"novelty_{n_docs}"]["fresh_doc_novelty"] = round(fresh_mean, 4)
    print(json.dumps({"shape": f"novelty_{n_docs}",
                      "planted_dup_novelty": res[f"novelty_{n_docs}"]["planted_dup_novelty"],
                      "fresh_doc_novelty": res[f"novelty_{n_docs}"]["fresh_doc_novelty"]}),
          flush=True)

    e = synth_events(spark, n_events)
    et = F.element_at(
        F.array(F.lit("view"), F.lit("click"), F.lit("signup"),
                F.lit("purchase"), F.lit("error")),
        (F.pmod(F.xxhash64("event_id", F.lit(3)), F.lit(5)) + 1).cast("int"))
    ev = e.withColumn("event_type", et)
    seq = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct(
            F.unix_micros("ts").alias("ts_us"),
            F.col("event_type").alias("et")))).alias("seq"))
    init = F.struct(F.lit(0).alias("stage"),
                    F.lit(-1).cast("bigint").alias("s1"),
                    F.lit(-1).cast("bigint").alias("s2"),
                    F.lit(-1).cast("bigint").alias("s3"))

    def step(acc, x):
        adv1 = (acc.stage == 0) & (x.et == F.lit("signup"))
        adv2 = (acc.stage == 1) & (x.et == F.lit("purchase")) & (x.ts_us > acc.s1)
        adv3 = (acc.stage == 2) & (x.et == F.lit("error")) & (x.ts_us > acc.s2)
        return (F.when(adv1, F.struct(F.lit(1).alias("stage"), x.ts_us.alias("s1"),
                                      acc.s2.alias("s2"), acc.s3.alias("s3")))
                .when(adv2, F.struct(F.lit(2).alias("stage"), acc.s1.alias("s1"),
                                     x.ts_us.alias("s2"), acc.s3.alias("s3")))
                .when(adv3, F.struct(F.lit(3).alias("stage"), acc.s1.alias("s1"),
                                     acc.s2.alias("s2"), x.ts_us.alias("s3")))
                .otherwise(acc))

    timed(f"funnel_walk_{n_events}",
          seq.select("user_id", F.aggregate("seq", init, step).alias("st"))
          .select("user_id", F.col("st.stage").alias("reached")), res)

    wt = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dtw = (e.select("user_id", "value", "event_id", "ts",
                    F.unix_micros("ts").alias("ts_us"))
           .withColumn("next_us", F.lead("ts_us").over(wt))
           .filter(F.col("next_us").isNotNull())
           .withColumn("w", F.floor((F.col("next_us") - F.col("ts_us"))
                                    / F.lit(1000000.0))))
    num = F.sum((F.col("value") * F.col("w")).cast("decimal(38,4)")).cast("double")
    den = F.sum(F.col("w").cast("decimal(38,4)")).cast("double")
    timed(f"time_weighted_avg_{n_events}",
          dtw.groupBy("user_id").agg(
              F.when(den != 0, num / den).alias("twa")), res)


def robust_stats_probe(spark, res, n_events):
    """r5-G shapes at probe scale: exact-percentile MAD outliers (the
    grouped percentile sorts inside the agg buffer — per-entity rows,
    not global), Gini (two chained hash-aggs), cohort retention
    (distinct → min → join back)."""
    from pyspark.sql import Window

    e = synth_events(spark, n_events)
    w = Window.partitionBy("user_id")
    d = e.select("event_id", "user_id", "value",
                 F.percentile("value", 0.5).over(w).alias("med"))
    m = d.withColumn(
        "mad", F.percentile(F.abs(F.col("value") - F.col("med")), 0.5).over(w))
    timed(f"mad_outliers_{n_events}",
          m.select(
              "event_id",
              F.when((F.col("mad") > 0)
                     & (F.abs(F.col("value") - F.col("med")) > 5 * F.col("mad")),
                     F.lit(1)).otherwise(F.lit(0)).alias("is_outlier")), res)

    c = e.withColumn(
        "etype", (F.pmod(F.xxhash64("event_id"), F.lit(5))).cast("int")
    ).groupBy("user_id", "etype").agg(F.count(F.lit(1)).alias("n"))
    tot = F.sum("n").cast("double")
    timed(f"gini_{n_events}",
          c.groupBy("user_id").agg(
              (F.lit(1.0) - F.sum(F.col("n") * F.col("n")).cast("double")
               / (tot * tot)).alias("gini")), res)

    week = F.floor(F.unix_seconds("ts") / F.lit(86400 * 7)).cast("bigint")
    weekly = e.select("user_id", week.alias("week")).distinct()
    cohort = weekly.groupBy("user_id").agg(F.min("week").alias("cw"))
    timed(f"retention_{n_events}",
          weekly.join(cohort, "user_id")
          .groupBy("cw", (F.col("week") - F.col("cw")).alias("off"))
          .agg(F.countDistinct("user_id").alias("n_active")), res)


def r6_probe(spark, res, n_events, n_docs):
    """r6 additions at 200× fixture scale, through the REAL registered
    builders (synth frames written as a scratch fixture dir so the probe
    exercises queries.py's code, not a re-implementation): the rewritten
    2-exchange llm_novelty at 1M docs, win_interp over 20M events, and
    agg_ohlc's SortAggregate-with-map-side-partials claim."""
    import os
    import tempfile

    from minerva_etl_46_spark.queries import QUERIES

    scratch = os.path.join(tempfile.gettempdir(),
                           f"r6_probe_{os.getpid()}")
    (synth_docs(spark, n_docs)
     .withColumn("lang", F.concat(F.lit("l"), (F.col("doc_id") % 40).cast("string")))
     .withColumn("source", F.concat(F.lit("s"), (F.col("doc_id") % 20).cast("string")))
     .write.mode("overwrite").parquet(f"{scratch}/documents.parquet"))
    (synth_events(spark, n_events)
     .withColumn("event_type", F.lit("x")).withColumn("props", F.lit("{}"))
     .write.mode("overwrite").parquet(f"{scratch}/events.parquet"))
    timed("novelty_2exchange_1M_docs",
          QUERIES["llm_novelty"](spark, scratch), res)
    timed("win_interp_20M", QUERIES["win_interp"](spark, scratch), res)
    timed("win_gap_fill_20M", QUERIES["win_gap_fill"](spark, scratch), res)
    timed("agg_ohlc_20M", QUERIES["agg_ohlc"](spark, scratch), res)
    timed("llm_dedup_url_1M", QUERIES["llm_dedup_url"](spark, scratch), res)
    timed("agg_hist_quantile_20M",
          QUERIES["agg_hist_quantile"](spark, scratch), res)
    timed("agg_heavy_hitters_cms_20M",
          QUERIES["agg_heavy_hitters_cms"](spark, scratch), res)
    timed("upsert_tombstone_20M",
          QUERIES["upsert_tombstone"](spark, scratch), res)


def r6b_probe(spark, res, n_events, n_docs):
    """r6 continuation batch at 200× fixture scale, through the REAL
    registered builders: surprisal's 2-data-shuffle window-attach at 1M
    docs, the one-exchange autocorr/streak chains at 20M events, and the
    projection-only IP kit (the zero-exchange floor: scan + codegen)."""
    import os
    import tempfile

    from minerva_etl_46_spark.queries import QUERIES

    scratch = os.path.join(tempfile.gettempdir(),
                           f"r6b_probe_{os.getpid()}")
    (synth_docs(spark, n_docs)
     .withColumn("lang", F.concat(F.lit("l"), (F.col("doc_id") % 40).cast("string")))
     .withColumn("source", F.concat(F.lit("s"), (F.col("doc_id") % 20).cast("string")))
     .write.mode("overwrite").parquet(f"{scratch}/documents.parquet"))
    (synth_events(spark, n_events)
     .withColumn("event_type", F.lit("x")).withColumn("props", F.lit("{}"))
     .write.mode("overwrite").parquet(f"{scratch}/events.parquet"))
    timed("llm_surprisal_1M_docs", QUERIES["llm_surprisal"](spark, scratch), res)
    timed("win_autocorr_20M", QUERIES["win_autocorr"](spark, scratch), res)
    timed("win_streak_20M", QUERIES["win_streak"](spark, scratch), res)
    timed("fn_ip_cidr_20M", QUERIES["fn_ip_cidr"](spark, scratch), res)
    timed("win_holt_20M", QUERIES["win_holt"](spark, scratch), res)
    # ttest needs mixed event classes; its own scratch keeps the shared
    # frame (all-"x") comparable with earlier probe rounds
    ab = scratch + "_ab"
    (synth_events(spark, n_events)
     .withColumn("event_type",
                 F.when(F.col("event_id") % 2 == 0, "purchase")
                 .otherwise("error"))
     .withColumn("props", F.lit("{}"))
     .write.mode("overwrite").parquet(f"{ab}/events.parquet"))
    timed("agg_ttest_20M", QUERIES["agg_ttest"](spark, ab), res)
    timed("llm_postings_1M_docs_30M_vocab",
          QUERIES["llm_postings"](spark, scratch), res)
    # join_spatial needs a supplier dim in the scratch fixture
    (spark.range(10_000).select(
        (F.col("id") + 1).alias("s_suppkey"))
     .write.mode("overwrite").parquet(f"{scratch}/supplier.parquet"))
    timed("join_spatial_20M_pts_10k_sites",
          QUERIES["join_spatial"](spark, scratch), res)


def r7_probe(spark, res, n_events, n_docs):
    """r7 additions at 200× fixture scale through the REAL registered
    builders: IR statistics on the 1M-doc corpus (tfidf's tf⋈df join,
    collocations' in-row bigram zip), the one-exchange SCD2 build /
     2-exchange Bollinger/corr chains over 20M events with a 5-type mix,
    Benford over a synthesized 20M-row lineitem, skyline over 10M parts,
    and the KM fold whose late frames stay duration-table-sized."""
    import os
    import tempfile

    from minerva_etl_46_spark.queries import QUERIES

    scratch = os.path.join(tempfile.gettempdir(),
                           f"r7_probe_{os.getpid()}")
    (synth_docs(spark, n_docs)
     .write.mode("overwrite").parquet(f"{scratch}/documents.parquet"))
    # 5-type event mix so change detection / correlation have structure
    (synth_events(spark, n_events)
     .withColumn("event_type",
                 F.concat(F.lit("t"), (F.xxhash64("event_id") % 5)
                          .cast("string")))
     .withColumn("props", F.lit("{}"))
     .write.mode("overwrite").parquet(f"{scratch}/events.parquet"))
    timed("llm_tfidf_docs", QUERIES["llm_tfidf"](spark, scratch), res)
    timed("llm_collocations_docs",
          QUERIES["llm_collocations"](spark, scratch), res)
    timed("upsert_scd2_build_events",
          QUERIES["upsert_scd2_build"](spark, scratch), res)
    timed("win_bollinger_events",
          QUERIES["win_bollinger"](spark, scratch), res)
    timed("agg_corr_pairs_events",
          QUERIES["agg_corr_pairs"](spark, scratch), res)
    timed("agg_survival_events",
          QUERIES["agg_survival"](spark, scratch), res)
    (spark.range(n_events).select(
        F.element_at(F.array(F.lit("A"), F.lit("N"), F.lit("R")),
                     (F.abs(F.xxhash64("id", F.lit(1))) % 3 + 1)
                     .cast("int")).alias("l_returnflag"),
        ((F.abs(F.xxhash64("id")) % 99990000) / 100.0 + 0.01)
        .alias("l_extendedprice"),
        # loader normalizes this column; constant ok
        F.timestamp_seconds(F.lit(BASE)).alias("l_shipdate"))
     .write.mode("overwrite").parquet(f"{scratch}/lineitem.parquet"))
    timed("agg_benford_lineitem",
          QUERIES["agg_benford"](spark, scratch), res)
    (spark.range(max(1_000_000, n_events // 2)).select(
        F.concat(F.lit("b"), (F.col("id") % 25).cast("string"))
        .alias("p_brand"),
        (F.abs(F.xxhash64("id")) % 50 + 1).cast("int").alias("p_size"),
        ((F.abs(F.xxhash64("id", F.lit(2))) % 200000) / 100.0)
        .alias("p_retailprice"))
     .write.mode("overwrite").parquet(f"{scratch}/part.parquet"))
    timed("agg_skyline_parts", QUERIES["agg_skyline"](spark, scratch), res)
    # batch-2 r7 keys: weighted median over the synthetic lineitem
    # (needs l_quantity), drawdown + peak concurrency over events
    import pyspark.sql.functions as _F
    (spark.read.parquet(f"{scratch}/lineitem.parquet")
     .withColumn("l_quantity",
                 (_F.abs(_F.xxhash64("l_extendedprice")) % 50 + 1)
                 .cast("double"))
     .write.mode("overwrite").parquet(f"{scratch}/lineitem2.parquet"))
    import shutil as _sh
    _sh.rmtree(f"{scratch}/lineitem.parquet")
    _sh.move(f"{scratch}/lineitem2.parquet", f"{scratch}/lineitem.parquet")
    timed("agg_weighted_median_lineitem",
          QUERIES["agg_weighted_median"](spark, scratch), res)
    timed("win_drawdown_events", QUERIES["win_drawdown"](spark, scratch), res)
    timed("agg_peak_concurrency_events",
          QUERIES["agg_peak_concurrency"](spark, scratch), res)


def r7b_probe(spark, res, n_events):
    """r7 batch-3/4 at 200× fixture scale through the REAL registered
    builders: basket self-join whose work is Σ basket² (6-item baskets,
    1M-part catalog), the one-exchange entropy/trigram chains, the
    two-level gap detector (no global sort on the 20M keyspace), the
    rolling-median O(5)-state frame, and the dimension-bounded
    RFM/ABC global walks fed by fact-sized hash-aggs."""
    import os
    import tempfile

    from minerva_etl_46_spark.queries import QUERIES

    scratch = os.path.join(tempfile.gettempdir(),
                           f"r7b_probe_{os.getpid()}")
    (synth_events(spark, n_events)
     .withColumn("event_type",
                 F.concat(F.lit("t"), (F.xxhash64("event_id") % 5)
                          .cast("string")))
     .withColumn("props", F.lit("{}"))
     .write.mode("overwrite").parquet(f"{scratch}/events.parquet"))
    # orders: n_events orders over 100k customers; ⅓ finalized ('F') so
    # the gap detector has ~⅔ of the keyspace missing, in runs
    (spark.range(n_events).select(
        F.col("id").alias("o_orderkey"),
        (F.abs(F.xxhash64("id")) % 100_000).alias("o_custkey"),
        F.element_at(F.array(F.lit("F"), F.lit("O"), F.lit("P")),
                     (F.abs(F.xxhash64("id", F.lit(3))) % 3 + 1)
                     .cast("int")).alias("o_orderstatus"),
        ((F.abs(F.xxhash64("id", F.lit(4))) % 50000000) / 100.0)
        .alias("o_totalprice"),
        F.timestamp_seconds(BASE + (F.col("id") * 1009) % SPAN_S)
        .alias("o_orderdate"))
     .write.mode("overwrite").parquet(f"{scratch}/orders.parquet"))
    # lineitem: 6-item baskets, 1M-part catalog; orderkeys ⊂ orders'
    (spark.range(n_events).select(
        F.expr("id div 6").alias("l_orderkey"),
        (F.col("id") % 6 + 1).cast("int").alias("l_linenumber"),
        (F.abs(F.xxhash64("id", F.lit(5))) % 1_000_000).alias("l_partkey"),
        ((F.abs(F.xxhash64("id", F.lit(6))) % 10000000) / 100.0)
        .alias("l_extendedprice"),
        F.timestamp_seconds(BASE + (F.col("id") * 1013) % SPAN_S)
        .alias("l_shipdate"))
     .write.mode("overwrite").parquet(f"{scratch}/lineitem.parquet"))
    timed("agg_basket_pairs_20M_items",
          QUERIES["agg_basket_pairs"](spark, scratch), res)
    timed("agg_paths_events", QUERIES["agg_paths"](spark, scratch), res)
    timed("win_rolling_median_events",
          QUERIES["win_rolling_median"](spark, scratch), res)
    timed("agg_entropy_events", QUERIES["agg_entropy"](spark, scratch), res)
    timed("agg_gaps_20M_keyspace", QUERIES["agg_gaps"](spark, scratch), res)
    timed("agg_rfm_orders_100k_cust",
          QUERIES["agg_rfm"](spark, scratch), res)
    timed("agg_abc_1M_parts", QUERIES["agg_abc"](spark, scratch), res)
    timed("fn_workdays_join", QUERIES["fn_workdays"](spark, scratch), res)


def r7c_probe(spark, res, n_events, n_docs):
    """r7 batch-5/6 at 200× fixture scale through the REAL registered
    builders: the one-exchange running-VWAP window, subset-rule-fused
    churn/cohort chains, the two-distinct stickiness, the scrambled
    arrival watermark replay, the Expand-based grouping sets, and the
    text trio (boilerplate 5-gram window, bigram LM, integer-bits Zipf)
    over a 1M-doc / 30-word corpus with a 50k shared vocabulary."""
    import os
    import tempfile

    from minerva_etl_46_spark.queries import QUERIES

    scratch = os.path.join(tempfile.gettempdir(),
                           f"r7c_probe_{os.getpid()}")
    (synth_events(spark, n_events)
     .withColumn("event_type",
                 F.concat(F.lit("t"), (F.xxhash64("event_id") % 5)
                          .cast("string")))
     .withColumn("props", F.lit("{}"))
     .write.mode("overwrite").parquet(f"{scratch}/events.parquet"))
    (spark.range(n_events).select(
        F.expr("id div 6").alias("l_orderkey"),
        (F.col("id") % 6 + 1).cast("int").alias("l_linenumber"),
        (F.abs(F.xxhash64("id", F.lit(5))) % 1_000_000).alias("l_partkey"),
        ((F.abs(F.xxhash64("id", F.lit(6))) % 10000000) / 100.0)
        .alias("l_extendedprice"),
        ((F.abs(F.xxhash64("id", F.lit(7))) % 5000) / 100.0)
        .alias("l_quantity"),
        F.element_at(F.array(F.lit("A"), F.lit("N"), F.lit("R")),
                     (F.abs(F.xxhash64("id", F.lit(8))) % 3 + 1)
                     .cast("int")).alias("l_returnflag"),
        F.element_at(F.array(F.lit("F"), F.lit("O")),
                     (F.abs(F.xxhash64("id", F.lit(9))) % 2 + 1)
                     .cast("int")).alias("l_linestatus"),
        F.timestamp_seconds(BASE + (F.col("id") * 1013) % SPAN_S)
        .alias("l_shipdate"))
     .write.mode("overwrite").parquet(f"{scratch}/lineitem.parquet"))
    (spark.range(n_events).select(
        F.col("id").alias("o_orderkey"),
        (F.abs(F.xxhash64("id")) % 100_000).alias("o_custkey"),
        F.lit("O").alias("o_orderstatus"),
        ((F.abs(F.xxhash64("id", F.lit(4))) % 50000000) / 100.0)
        .alias("o_totalprice"),
        F.timestamp_seconds(BASE + (F.col("id") * 1009) % SPAN_S)
        .alias("o_orderdate"))
     .write.mode("overwrite").parquet(f"{scratch}/orders.parquet"))
    # 30-word docs over a 50k shared vocabulary: 5-grams genuinely
    # repeat across docs (the boilerplate hot path is exercised, not
    # just the empty branch) and the bigram/Zipf frames stay
    # vocab-bounded the way a natural-language corpus is
    words = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda i: F.concat(
            F.lit("w"),
            (F.abs(F.xxhash64(F.col("id"), i)) % 50_000).cast("string")))
    (spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", words).alias("text"))
     .write.mode("overwrite").parquet(f"{scratch}/documents.parquet"))

    timed("win_vwap_20M_items", QUERIES["win_vwap"](spark, scratch), res)
    timed("agg_grouping_sets_20M",
          QUERIES["agg_grouping_sets"](spark, scratch), res)
    timed("agg_cohort_matrix_100k_cust",
          QUERIES["agg_cohort_matrix"](spark, scratch), res)
    timed("agg_churn_events", QUERIES["agg_churn"](spark, scratch), res)
    timed("agg_stickiness_events",
          QUERIES["agg_stickiness"](spark, scratch), res)
    timed("win_late_arrivals_events",
          QUERIES["win_late_arrivals"](spark, scratch), res)
    timed("win_stochastic_events",
          QUERIES["win_stochastic"](spark, scratch), res)
    timed("win_rsi_events", QUERIES["win_rsi"](spark, scratch), res)
    timed("agg_chisq_events", QUERIES["agg_chisq"](spark, scratch), res)
    timed("llm_code_detect_docs",
          QUERIES["llm_code_detect"](spark, scratch), res)
    timed("llm_boilerplate_docs",
          QUERIES["llm_boilerplate"](spark, scratch), res)
    timed("llm_ngram_lm_docs", QUERIES["llm_ngram_lm"](spark, scratch), res)
    timed("llm_zipf_docs", QUERIES["llm_zipf"](spark, scratch), res)


def r7d_probe(spark, res, n_events, n_docs):
    """r7 batch-7..13 at 200× fixture scale through the REAL registered
    builders: the stack-unpivoted degree join, association rules
    (Σ basket² self-join + direction union), the snowflake broadcast
    chain, attribution's one-window fact pass, conversion-delay and
    growth fusions, the 20M-line CLF text parse, and the tile-grid
    generator over 1M media records."""
    import os
    import tempfile

    from minerva_etl_46_spark.queries import QUERIES

    scratch = os.path.join(tempfile.gettempdir(),
                           f"r7d_probe_{os.getpid()}")
    (synth_events(spark, n_events)
     .withColumn("event_type",
                 F.element_at(
                     F.array(F.lit("click"), F.lit("view"),
                             F.lit("signup"), F.lit("purchase"),
                             F.lit("error")),
                     (F.abs(F.xxhash64("event_id")) % 5 + 1)
                     .cast("int")))
     .withColumn("props", F.lit("{}"))
     .write.mode("overwrite").parquet(f"{scratch}/events.parquet"))
    (spark.range(n_events).select(
        F.col("id").alias("o_orderkey"),
        (F.abs(F.xxhash64("id")) % 100_000).alias("o_custkey"),
        F.element_at(F.array(F.lit("F"), F.lit("O"), F.lit("P")),
                     (F.abs(F.xxhash64("id", F.lit(3))) % 3 + 1)
                     .cast("int")).alias("o_orderstatus"),
        ((F.abs(F.xxhash64("id", F.lit(4))) % 50000000) / 100.0)
        .alias("o_totalprice"),
        F.timestamp_seconds(BASE + (F.col("id") * 1009) % SPAN_S)
        .alias("o_orderdate"))
     .write.mode("overwrite").parquet(f"{scratch}/orders.parquet"))
    (spark.range(n_events).select(
        F.expr("id div 6").alias("l_orderkey"),
        (F.col("id") % 6 + 1).cast("int").alias("l_linenumber"),
        (F.abs(F.xxhash64("id", F.lit(5))) % 1_000_000).alias("l_partkey"),
        ((F.abs(F.xxhash64("id", F.lit(6))) % 10000000) / 100.0)
        .alias("l_extendedprice"),
        F.element_at(F.array(F.lit("A"), F.lit("N"), F.lit("R")),
                     (F.abs(F.xxhash64("id", F.lit(8))) % 3 + 1)
                     .cast("int")).alias("l_returnflag"),
        F.timestamp_seconds(BASE + (F.col("id") * 1013) % SPAN_S)
        .alias("l_shipdate"))
     .write.mode("overwrite").parquet(f"{scratch}/lineitem.parquet"))
    # dims for the snowflake chain (100k customers / 25 nations / 5 regions)
    (spark.range(100_000).select(
        F.col("id").alias("c_custkey"),
        (F.col("id") % 25).alias("c_nationkey"))
     .write.mode("overwrite").parquet(f"{scratch}/customer.parquet"))
    (spark.range(25).select(
        F.col("id").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id").cast("string"))
        .alias("n_name"),
        (F.col("id") % 5).alias("n_regionkey"))
     .write.mode("overwrite").parquet(f"{scratch}/nation.parquet"))
    (spark.range(5).select(
        F.col("id").alias("r_regionkey"),
        F.concat(F.lit("REGION_"), F.col("id").cast("string"))
        .alias("r_name"))
     .write.mode("overwrite").parquet(f"{scratch}/region.parquet"))
    (spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text"))
     .write.mode("overwrite").parquet(f"{scratch}/documents.parquet"))

    timed("graph_degree_events", QUERIES["graph_degree"](spark, scratch),
          res)
    timed("agg_basket_rules_20M_items",
          QUERIES["agg_basket_rules"](spark, scratch), res)
    timed("join_snowflake_20M", QUERIES["join_snowflake"](spark, scratch),
          res)
    timed("agg_attribution_events",
          QUERIES["agg_attribution"](spark, scratch), res)
    timed("agg_time_to_convert_events",
          QUERIES["agg_time_to_convert"](spark, scratch), res)
    timed("agg_user_growth_events",
          QUERIES["agg_user_growth"](spark, scratch), res)
    timed("win_percent_rank_events",
          QUERIES["win_percent_rank"](spark, scratch), res)
    timed("agg_decile_lift_orders",
          QUERIES["agg_decile_lift"](spark, scratch), res)
    timed("scan_httplog_20M_lines",
          QUERIES["scan_httplog"](spark, scratch), res)
    timed("mm_tile_grid_1M_media",
          QUERIES["mm_tile_grid"](spark, scratch), res)


def r7e_probe(spark, res, n_events, n_docs):
    """r7 batch-14..17 at 200× fixture scale through the REAL registered
    builders: integer-ppb PageRank over a ~20M-edge bipartite trade
    graph, support-sparsified triangle counting, the month-contracted
    robust stats (Theil–Sen, Kendall), one-exchange boxplot fences over
    20M values, the day-partitioned parquet sink write+pruned-read, and
    the Bloom prefilter over 1M docs."""
    import os
    import tempfile

    from minerva_etl_46_spark.queries import QUERIES

    scratch = os.path.join(tempfile.gettempdir(),
                           f"r7e_probe_{os.getpid()}")
    (synth_events(spark, n_events)
     .withColumn("event_type",
                 F.element_at(
                     F.array(F.lit("click"), F.lit("view"),
                             F.lit("signup"), F.lit("purchase"),
                             F.lit("error")),
                     (F.abs(F.xxhash64("event_id")) % 5 + 1)
                     .cast("int")))
     .withColumn("props", F.lit("{}"))
     .write.mode("overwrite").parquet(f"{scratch}/events.parquet"))
    (spark.range(n_events).select(
        F.col("id").alias("o_orderkey"),
        (F.abs(F.xxhash64("id")) % 100_000).alias("o_custkey"),
        ((F.abs(F.xxhash64("id", F.lit(4))) % 50000000) / 100.0)
        .alias("o_totalprice"),
        F.timestamp_seconds(BASE + (F.col("id") * 1009) % SPAN_S)
        .alias("o_orderdate"))
     .write.mode("overwrite").parquet(f"{scratch}/orders.parquet"))
    # lineitem with partsupp-like structure: 4 suppliers per part, so the
    # co-supplier expansion stays bounded per part (the production shape)
    (spark.range(n_events).select(
        F.expr("id div 6").alias("l_orderkey"),
        (F.abs(F.xxhash64("id", F.lit(5))) % 1_000_000).alias("l_partkey"),
        F.timestamp_seconds(BASE + (F.col("id") * 1013) % SPAN_S)
        .alias("l_shipdate"))
     .select(
        "l_orderkey", "l_partkey", "l_shipdate",
        ((F.col("l_partkey") * 7
          + F.abs(F.xxhash64("l_orderkey", "l_partkey")) % 4) % 10_000)
        .alias("l_suppkey"))
     .write.mode("overwrite").parquet(f"{scratch}/lineitem.parquet"))
    (spark.range(100_000).select(
        F.col("id").alias("c_custkey"),
        (F.col("id") % 25).alias("c_nationkey"))
     .write.mode("overwrite").parquet(f"{scratch}/customer.parquet"))
    (spark.range(10_000).select(F.col("id").alias("s_suppkey"))
     .write.mode("overwrite").parquet(f"{scratch}/supplier.parquet"))
    # ~1% of docs are exact dups of an earlier doc (cross-split members)
    (spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "),
                 (F.col("id") % int(n_docs * 0.99)).cast("string"))
        .alias("text"))
     .write.mode("overwrite").parquet(f"{scratch}/documents.parquet"))

    timed("graph_pagerank_20M_edges",
          QUERIES["graph_pagerank"](spark, scratch), res)
    timed("graph_triangles_1M_parts",
          QUERIES["graph_triangles"](spark, scratch), res)
    timed("agg_theil_sen_20M_orders",
          QUERIES["agg_theil_sen"](spark, scratch), res)
    timed("agg_kendall_20M_orders",
          QUERIES["agg_kendall"](spark, scratch), res)
    timed("agg_boxplot_20M_events",
          QUERIES["agg_boxplot"](spark, scratch), res)
    # the partitioned WRITE runs eagerly inside the builder — time it
    # separately from the pruned read-back that timed() measures
    t0 = time.perf_counter()
    sink_df = QUERIES["sink_parquet_partitioned"](spark, scratch)
    write_sec = round(time.perf_counter() - t0, 2)
    timed("sink_parquet_partitioned_20M", sink_df, res)
    res["sink_parquet_partitioned_20M"]["write_sec"] = write_sec
    timed("llm_bloom_prefilter_1M_docs",
          QUERIES["llm_bloom_prefilter"](spark, scratch), res)


def r7f_probe(spark, res, n_events, n_vec):
    """r7 batch-19..21 at 200× fixture scale through the REAL registered
    builders: dynamic-partition-overwrite (full write + one-day
    revision), the three-key skew audit over 20M lineitem rows, Morton
    encoding as pure codegen, record detection windows, centroid
    outliers over 1M 64-dim vectors, the month-contracted revenue
    bridge, and LOO target encoding's one-exchange window pass."""
    import os
    import tempfile

    from minerva_etl_46_spark.queries import QUERIES

    scratch = os.path.join(tempfile.gettempdir(),
                           f"r7f_probe_{os.getpid()}")
    (synth_events(spark, n_events)
     .withColumn("event_type",
                 F.element_at(
                     F.array(F.lit("click"), F.lit("view"),
                             F.lit("signup"), F.lit("purchase"),
                             F.lit("error")),
                     (F.abs(F.xxhash64("event_id")) % 5 + 1)
                     .cast("int")))
     .withColumn("props", F.lit("{}"))
     .write.mode("overwrite").parquet(f"{scratch}/events.parquet"))
    (spark.range(n_events).select(
        F.col("id").alias("o_orderkey"),
        (F.abs(F.xxhash64("id")) % 100_000).alias("o_custkey"),
        ((F.abs(F.xxhash64("id", F.lit(4))) % 50000000) / 100.0)
        .alias("o_totalprice"),
        F.timestamp_seconds(BASE + (F.col("id") * 1009) % SPAN_S)
        .alias("o_orderdate"))
     .write.mode("overwrite").parquet(f"{scratch}/orders.parquet"))
    (spark.range(n_events).select(
        F.expr("id div 6").alias("l_orderkey"),
        (F.abs(F.xxhash64("id", F.lit(5))) % 1_000_000).alias("l_partkey"),
        (F.abs(F.xxhash64("id", F.lit(6))) % 10_000).alias("l_suppkey"),
        F.timestamp_seconds(BASE + (F.col("id") * 1013) % SPAN_S)
        .alias("l_shipdate"))
     .write.mode("overwrite").parquet(f"{scratch}/lineitem.parquet"))
    (spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(1, 64), i -> "
               "cast((xxhash64(id, i) % 1000) / 1000.0 as float))")
        .alias("embedding"),
        (F.col("id") % 10).cast("int").alias("label"))
     .write.mode("overwrite").parquet(f"{scratch}/embeddings.parquet"))

    timed("agg_skew_report_20M_x3cols",
          QUERIES["agg_skew_report"](spark, scratch), res)
    timed("fn_zorder_20M", QUERIES["fn_zorder"](spark, scratch), res)
    timed("win_records_20M", QUERIES["win_records"](spark, scratch), res)
    timed("agg_revenue_bridge_20M_orders",
          QUERIES["agg_revenue_bridge"](spark, scratch), res)
    timed("agg_target_encode_20M",
          QUERIES["agg_target_encode"](spark, scratch), res)
    timed("llm_embed_outliers_1M_vec",
          QUERIES["llm_embed_outliers"](spark, scratch), res)
    # the two partitioned writes run eagerly inside the builder
    t0 = time.perf_counter()
    dpo = QUERIES["sink_overwrite_partition"](spark, scratch)
    write_sec = round(time.perf_counter() - t0, 2)
    timed("sink_overwrite_partition_20M", dpo, res)
    res["sink_overwrite_partition_20M"]["write_sec"] = write_sec


def r7g_probe(spark, res, n_events):
    """r7 batch-22..25 at 200× fixture scale through the REAL registered
    builders: exact-integer TV drift, the freshness/decay anchored
    aggs, interval coalescing windows, the broadcast RI audit, fused
    DQ rules, streaming record detection excluded (micro-batch fixed
    cost, probed at fixture scale)."""
    import os
    import tempfile

    from minerva_etl_46_spark.queries import QUERIES

    scratch = os.path.join(tempfile.gettempdir(),
                           f"r7g_probe_{os.getpid()}")
    (synth_events(spark, n_events)
     .withColumn("event_type",
                 F.element_at(
                     F.array(F.lit("click"), F.lit("view"),
                             F.lit("signup"), F.lit("purchase"),
                             F.lit("error")),
                     (F.abs(F.xxhash64("event_id")) % 5 + 1)
                     .cast("int")))
     .withColumn("props", F.lit("{}"))
     .write.mode("overwrite").parquet(f"{scratch}/events.parquet"))
    (spark.range(n_events).select(
        F.expr("id div 6").alias("l_orderkey"),
        (F.abs(F.xxhash64("id", F.lit(5))) % 1_000_000).alias("l_partkey"),
        (F.abs(F.xxhash64("id", F.lit(6))) % 10_000).alias("l_suppkey"),
        ((F.col("id") % 50) + 1.0).alias("l_quantity"),
        ((F.abs(F.xxhash64("id", F.lit(7))) % 10) / 100.0)
        .alias("l_discount"),
        ((F.abs(F.xxhash64("id", F.lit(8))) % 10000000) / 100.0)
        .alias("l_extendedprice"),
        F.element_at(F.array(F.lit("A"), F.lit("N"), F.lit("R")),
                     (F.abs(F.xxhash64("id", F.lit(9))) % 3 + 1)
                     .cast("int")).alias("l_returnflag"),
        F.timestamp_seconds(BASE + (F.col("id") * 1013) % SPAN_S)
        .alias("l_shipdate"))
     .write.mode("overwrite").parquet(f"{scratch}/lineitem.parquet"))
    (spark.range(n_events).select(
        F.col("id").alias("o_orderkey"),
        (F.abs(F.xxhash64("id")) % 100_000).alias("o_custkey"),
        F.timestamp_seconds(BASE + (F.col("id") * 1009) % SPAN_S)
        .alias("o_orderdate"))
     .write.mode("overwrite").parquet(f"{scratch}/orders.parquet"))
    (spark.range(1_000_000).select(F.col("id").alias("p_partkey"),
                                   (F.col("id") % 50 + 1).cast("int")
                                   .alias("p_size"))
     .write.mode("overwrite").parquet(f"{scratch}/part.parquet"))
    (spark.range(10_000).select(F.col("id").alias("s_suppkey"))
     .write.mode("overwrite").parquet(f"{scratch}/supplier.parquet"))
    (spark.range(100_000).select(F.col("id").alias("c_custkey"))
     .write.mode("overwrite").parquet(f"{scratch}/customer.parquet"))

    timed("agg_drift_tv_20M", QUERIES["agg_drift_tv"](spark, scratch), res)
    timed("agg_freshness_20M", QUERIES["agg_freshness"](spark, scratch),
          res)
    timed("agg_decay_score_20M",
          QUERIES["agg_decay_score"](spark, scratch), res)
    timed("win_interval_merge_20M",
          QUERIES["win_interval_merge"](spark, scratch), res)
    timed("agg_ri_audit_20M", QUERIES["agg_ri_audit"](spark, scratch),
          res)
    timed("agg_dq_checks_20M", QUERIES["agg_dq_checks"](spark, scratch),
          res)
    timed("fn_unit_parse_1M_parts",
          QUERIES["fn_unit_parse"](spark, scratch), res)
    timed("fn_calendar_spine", QUERIES["fn_calendar_spine"](spark, scratch),
          res)


def r8_probe(spark, res, n_base):
    """r8: join_fuzzy growth laws through the REAL registered builder.
    Two levers, probed separately:
    (a) rows grow 1M→5M with a FIXED 50k name vocabulary (the TPC-H
        shape) — the distinct-name dedupe bounds verify work by vocab,
        so wall-clock must stay near-flat (growth = the linear dedup
        scan + row re-attach, never pairs);
    (b) vocabulary grows WITH rows 1M→5M (names near-unique, prefix
        space expanding like a real name corpus) — the compound
        (prefix4, length-band) blocking keeps verify pairs ∝ names,
        so wall-clock must grow ~linearly (5×), not ~quadratically
        (25×)."""
    import os
    import tempfile

    from minerva_etl_46_spark.queries import QUERIES

    # v → name: 4-letter word + ' ' + 3-letter word + 0..4 'x' padding.
    # Bijective in v up to 26^7 — prefix4 cardinality grows with the
    # vocabulary (up to 26^4 = 457k), lengths spread over 5 bands.
    name = (
        "concat("
        "char(97 + (v % 26)), char(97 + ((v div 26) % 26)),"
        "char(97 + ((v div 676) % 26)), char(97 + ((v div 17576) % 26)),"
        "' ',"
        "char(97 + ((v div 456976) % 26)),"
        "char(97 + ((v div 11881376) % 26)),"
        "char(97 + ((v div 308915776) % 26)),"
        "repeat('x', cast(v % 5 as int)))"
    )

    def write_part(n_rows, vocab, tag):
        scratch = os.path.join(tempfile.gettempdir(),
                               f"r8_fuzzy_{os.getpid()}_{tag}")
        (spark.range(n_rows)
         .select(F.col("id").alias("p_partkey"),
                 F.expr(f"abs(xxhash64(id)) % {vocab}").alias("v"))
         .select("p_partkey", F.expr(name).alias("p_name"))
         .write.mode("overwrite").parquet(f"{scratch}/part.parquet"))
        return scratch

    # untimed warmup: absorb session JIT/codegen so shape 1 isn't cold
    warm = write_part(100_000, 10_000, "warm")
    QUERIES["join_fuzzy"](spark, warm).write.format("noop") \
        .mode("overwrite").save()
    for n in (n_base, 5 * n_base):
        sc = write_part(n, 50_000, f"rows{n}")
        timed(f"join_fuzzy_rows_{n // 1_000_000}M_vocab50k",
              QUERIES["join_fuzzy"](spark, sc), res)
    for n in (n_base, 5 * n_base):
        sc = write_part(n, n, f"names{n}")
        timed(f"join_fuzzy_names_{n // 1_000_000}M",
              QUERIES["join_fuzzy"](spark, sc), res)


def r8b_probe(spark, res, n_events):
    """r8b: the trend-store WRITE path at 200× fixture scale after the
    r8 fixes (explicit-numPartitions repartition before partitionBy;
    pyarrow modified-log append): full 30-day dynamic-overwrite write,
    a one-bucket revision write, and the one-job compaction of a store
    with appended small files."""
    import os
    import shutil
    import tempfile
    import time as _t

    from minerva_etl_46_spark.sources.trendstore import (
        TrendStorePartStorage,
        compact_partitions,
    )

    base = os.path.join(tempfile.gettempdir(), f"r8b_store_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    st = TrendStorePartStorage(base, "events_v")
    e = synth_events(spark, n_events).select(
        "event_id", "ts", "user_id", "value")
    e.write.format("noop").mode("overwrite").save()  # warm the scan
    t0 = _t.perf_counter()
    touched = st.write(e, ts_col="ts")
    res["trendstore_write_20M_30buckets"] = {
        "sec": round(_t.perf_counter() - t0, 2), "buckets": len(touched)}
    rev = e.filter(
        F.col("ts").cast("long") < touched[0] + 86400)
    t0 = _t.perf_counter()
    st.write(rev, ts_col="ts")
    res["trendstore_revision_1bucket"] = {
        "sec": round(_t.perf_counter() - t0, 2)}
    # simulate incremental small files: 3 appends into one partition
    # (last touched bucket — index-safe for tiny SCALE_PROBE_ROWS runs
    # whose span fits one bucket)
    pdir = os.path.join(st.path, f"p_bucket={touched[-1]}")
    one = spark.read.parquet(pdir)
    for _ in range(3):
        one.coalesce(1).write.mode("append").parquet(pdir)
    t0 = _t.perf_counter()
    n = compact_partitions(st, spark)
    res["trendstore_compact_onejob"] = {
        "sec": round(_t.perf_counter() - t0, 2), "partitions": n}
    shutil.rmtree(base, ignore_errors=True)


def r8c_probe(spark, res, n_events):
    """r8c: the r7 batch-9/10 keys never scale-probed, at 200× fixture
    scale through the REAL registered builders — last-touch attribution
    (one hash(user) window over the fact), order-to-ship latency
    histogram (one fact×fact equi-join collapsing to a day frame),
    Wald–Wolfowitz runs test (hourly rollup + shared hash(user)
    windows), per-source language mix (|sources|×|langs| grid)."""
    import os
    import tempfile

    from minerva_etl_46_spark.queries import QUERIES

    scratch = os.path.join(tempfile.gettempdir(),
                           f"r8c_probe_{os.getpid()}")
    (synth_events(spark, n_events)
     .withColumn("event_type",
                 F.element_at(
                     F.array(F.lit("click"), F.lit("view"),
                             F.lit("signup"), F.lit("purchase"),
                             F.lit("error")),
                     (F.abs(F.xxhash64("event_id")) % 5 + 1)
                     .cast("int")))
     .write.mode("overwrite").parquet(f"{scratch}/events.parquet"))
    (spark.range(n_events).select(
        F.expr("id div 6").alias("l_orderkey"),
        F.timestamp_seconds(BASE + (F.col("id") * 1013) % SPAN_S)
        .alias("l_shipdate"))
     .write.mode("overwrite").parquet(f"{scratch}/lineitem.parquet"))
    (spark.range(n_events // 6).select(
        F.col("id").alias("o_orderkey"),
        F.timestamp_seconds(BASE + (F.col("id") * 1009) % SPAN_S)
        .alias("o_orderdate"))
     .write.mode("overwrite").parquet(f"{scratch}/orders.parquet"))
    (spark.range(max(100_000, n_events // 20)).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"),
                 (F.abs(F.xxhash64("id")) % 200).cast("string"))
        .alias("source"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("nl"),
                    F.lit("es")),
            (F.abs(F.xxhash64("id", F.lit(2))) % 5 + 1).cast("int"))
        .alias("lang"))
     .write.mode("overwrite").parquet(f"{scratch}/documents.parquet"))

    timed("agg_attribution_20M", QUERIES["agg_attribution"](spark, scratch),
          res)
    timed("agg_latency_histogram_20M",
          QUERIES["agg_latency_histogram"](spark, scratch), res)
    timed("win_runs_test_20M", QUERIES["win_runs_test"](spark, scratch),
          res)
    timed("llm_lang_mix_1M_docs", QUERIES["llm_lang_mix"](spark, scratch),
          res)


def r9_probe(spark, res, n_events):
    """r9: the §3 admin loop END-TO-END at 200× fixture scale — the
    lifecycle integration test's exact shape (harvest-load → raw trend
    store → materialization tick → trigger eval → notification store),
    but on a 20M-row / 30-day store. The contract under test is
    incremental recompute: a tick's latency must be proportional to the
    TOUCHED windows (via the modified log), never to store size —
    measured as (a) full-backlog tick over 30 daily windows, (b) a
    late one-day revision batch re-ticking exactly ONE window at
    roughly 1/30 the cost, and (c) a no-op tick (fingerprints equal)
    that runs zero Spark jobs over fact data."""
    import os
    import shutil
    import tempfile
    import time as _t

    from minerva_etl_46_spark.catalog import Trend, TriggerRule
    from minerva_etl_46_spark.functions.timestamps import G_1D
    from minerva_etl_46_spark.plans.materialize import (
        MaterializationEngine,
        MaterializationSpec,
    )
    from minerva_etl_46_spark.plans.triggers import evaluate_rules
    from minerva_etl_46_spark.sources.trendstore import TrendStorePartStorage

    base = os.path.join(tempfile.gettempdir(), f"r9_loop_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)

    # 1. harvest load: 20M events over 30 days into the raw store
    raw = TrendStorePartStorage(base, "events_raw")
    e = synth_events(spark, n_events).select(
        "event_id", "ts", "user_id", "value")
    e.write.format("noop").mode("overwrite").save()  # warm the scan
    t0 = _t.perf_counter()
    touched = raw.write(e, ts_col="ts")
    res["r9_harvest_write_30d"] = {
        "sec": round(_t.perf_counter() - t0, 2), "buckets": len(touched)}

    # 2. materialization spec: raw events -> per-user daily rollup
    target = TrendStorePartStorage(base, "user_daily")
    trends = {"value": Trend("value", time_aggregation="sum")}

    def src_fn(spark_, w_start, w_end):
        rows = raw.read_window(spark_, w_start, w_end).filter(
            (F.col("ts").cast("long") >= w_start)
            & (F.col("ts").cast("long") < w_end))
        return time_rollup(rows, "user_id", "ts", G_1D, trends,
                           bucket_col="bucket")

    spec = MaterializationSpec(
        name="user_daily", granularity=G_1D, target=target, src_fn=src_fn,
        sources=[raw], ts_col="bucket", reprocessing_period_s=10**12,
    )
    engine = MaterializationEngine(base)
    # modified_at in the log is REAL wall-clock; now must sit beyond it
    # (and beyond every window end) for the stability gate to open
    now = 4e9

    # 3a. full-backlog tick: every daily window is dirty
    t0 = _t.perf_counter()
    done = engine.tick(spark, spec, now=now)
    full_sec = _t.perf_counter() - t0
    res["r9_tick_full_backlog"] = {
        "sec": round(full_sec, 2), "windows": len(done)}

    # 3b. late one-day revision batch -> re-tick touches ONE window
    rev = e.filter(F.col("ts").cast("long") < touched[0] + 86400) \
           .withColumn("value", F.col("value") + 1.0)
    raw.write(rev, ts_col="ts")
    t0 = _t.perf_counter()
    done = engine.tick(spark, spec, now=now + 3600)
    one_sec = _t.perf_counter() - t0
    res["r9_tick_late_one_window"] = {
        "sec": round(one_sec, 2), "windows": len(done),
        "vs_full": round(one_sec / max(full_sec, 1e-9), 3)}

    # 3c. no-op tick: fingerprints unchanged -> zero windows, zero
    # fact-data jobs (modified-log scan + state compare only)
    t0 = _t.perf_counter()
    done = engine.tick(spark, spec, now=now + 7200)
    res["r9_tick_noop"] = {
        "sec": round(_t.perf_counter() - t0, 2), "windows": len(done)}

    # 4. trigger eval over the materialized rollup -> notification store
    rules = [TriggerRule(name="daily_value_surge",
                         predicate_sql="value > 1200.0",
                         weight_sql="10", details_cols=("value",))]
    kpi = target.read(spark).select(
        F.col("user_id").alias("entity_id"),
        F.timestamp_seconds("bucket").alias("ts"),
        F.col("value").cast("double").alias("value"))
    notes = evaluate_rules(kpi, rules)
    nstore = TrendStorePartStorage(base, "notifications")
    t0 = _t.perf_counter()
    nstore.write(notes, ts_col="ts")
    res["r9_trigger_eval_and_store"] = {
        "sec": round(_t.perf_counter() - t0, 2),
        "notifications": nstore.read(spark).count()}
    shutil.rmtree(base, ignore_errors=True)


def r9b_probe(spark, res, n_names):
    """r9b: cost of the blocked_fuzzy_join prefix∪suffix block union
    (block_suffix=True, the r9 recall extension) at a 1M near-unique
    name vocabulary — the worst shape for blocking (r8b showed fixed
    vocab is flat). Expectation: each side emits 2 block keys instead
    of 1, so candidate pairs at most double and wall should land
    around 2× prefix-only, never more.

    The generator is END-ENTROPIC by construction: front-4 and back-4
    chars hash independently (26⁴ cardinality EACH), with the length
    padding in the MIDDLE. The r8 generator's trailing padding made
    every suffix one of ~a dozen keys — a quadratic hot block that
    measured 5.7× at just 20k names; that shape is the documented
    low-entropy-tail hazard (fuzzyjoin.py docstring), not a fair cost
    measurement of the union on a healthy vocabulary."""
    from minerva_etl_46_spark.operators.fuzzyjoin import blocked_fuzzy_join

    name = (
        "concat("
        "char(97 + (v1 % 26)), char(97 + ((v1 div 26) % 26)),"
        "char(97 + ((v1 div 676) % 26)), char(97 + ((v1 div 17576) % 26)),"
        "' ', repeat('x', cast(v1 % 5 as int)), ' ',"
        "char(97 + (v2 % 26)), char(97 + ((v2 div 26) % 26)),"
        "char(97 + ((v2 div 676) % 26)), char(97 + ((v2 div 17576) % 26)))"
    )
    dim = (spark.range(n_names)
           .select(F.col("id").alias("key"),
                   F.expr("abs(xxhash64(id)) % 456976").alias("v1"),
                   F.expr("abs(xxhash64(id, 7)) % 456976").alias("v2"))
           .select("key", F.expr(name).alias("name"))
           .localCheckpoint())  # freeze: both variants verify the same frame
    # probes: the dim names with a suffix-side corruption (append 'q'),
    # so every probe needs a real lev=1 verify, never a trivial 0
    probes = dim.select(F.col("key").alias("probe_id"),
                        F.concat("name", F.lit("q")).alias("probe_name")) \
                .localCheckpoint()
    # untimed warmup: absorb JIT/codegen so the first timed variant
    # isn't cold (the r8 probe's lesson)
    blocked_fuzzy_join(probes.limit(50_000), dim.limit(50_000),
                       "probe_name", "name", "key", max_distance=2,
                       prefix_len=4).write.format("noop") \
        .mode("overwrite").save()
    # two interleaved passes, keep the min per variant: position in the
    # run order is worth more than the work delta here (first timed job
    # pays shuffle-file/page-cache warmup — measured 5.3 vs 3.4 s with
    # the MORE expensive variant second), so a single-pass comparison
    # is pure ordering noise
    # exact-name probes = the worst case for the union: every candidate
    # pair shares BOTH ends, so it forms under both tags (exactly 2×
    # verify rows) before collapsing at the winner window
    probes_worst = dim.select(F.col("key").alias("probe_id"),
                              F.col("name").alias("probe_name")) \
                      .localCheckpoint()
    cases = (
        ("prefix_only", probes, False),
        ("prefix_or_suffix", probes, True),
        ("worstcase_prefix_only", probes_worst, False),
        ("worstcase_union_2x_pairs", probes_worst, True),
    )
    for _pass in range(2):
        for tag, p, flag in cases:
            out = blocked_fuzzy_join(
                p, dim, "probe_name", "name", "key",
                max_distance=2, prefix_len=4, block_suffix=flag)
            tmp: dict = {}
            timed(f"fuzzy_1M_names_{tag}", out, tmp)
            got = tmp[f"fuzzy_1M_names_{tag}"]
            prev = res.get(f"fuzzy_1M_names_{tag}")
            if prev is None or got["sec"] < prev["sec"]:
                res[f"fuzzy_1M_names_{tag}"] = got


def r9c_probe(spark, res, n_rows):
    """r9c: the pure-Python avro decode path (scan_avro / S20) at 1M
    rows — where does the no-DataSource reader stand vs the formats it
    feeds? 32 .avro files (one per core at probe scale; a file is one
    task) vs the same rows as parquet. The decode IS the slow path —
    row-major python decode vs columnar JVM scan — which is exactly
    the operator's documented contract: avro is an INGEST format; the
    first pass converts to parquet and everything downstream scans
    columnar. The probe quantifies the conversion toll."""
    import os
    import shutil
    import tempfile

    from minerva_etl_46_spark.sources.avro import encode_ocf, read_avro

    d = os.path.join(tempfile.gettempdir(), f"r9c_avro_{os.getpid()}")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    schema_json = (
        '{"type":"record","name":"customer","fields":['
        '{"name":"c_custkey","type":"long"},'
        '{"name":"name","type":["null","string"]},'
        '{"name":"c_nationkey","type":"long"},'
        '{"name":"acctbal","type":"double"}]}')
    n_files = 32
    per = n_rows // n_files
    for i in range(n_files):
        rows = [{"c_custkey": i * per + j,
                 "name": None if (i * per + j) % 97 == 0
                 else f"Customer#{i * per + j:012d}",
                 "c_nationkey": (i * per + j) % 25,
                 "acctbal": ((i * per + j) % 999999) / 100.0}
                for j in range(per)]
        with open(os.path.join(d, f"b{i}.avro"), "wb") as fh:
            fh.write(encode_ocf(schema_json, rows, codec="deflate"))
    av = read_avro(
        spark, d, "c_custkey long, name string, c_nationkey long, "
                  "acctbal double")
    timed(f"avro_decode_{n_rows // 1_000_000}M_32files", av, res)
    av.write.mode("overwrite").parquet(f"{d}/pq")  # the convert pass
    timed(f"parquet_rescan_{n_rows // 1_000_000}M",
          spark.read.parquet(f"{d}/pq"), res)
    res["avro_mb"] = round(sum(
        os.path.getsize(os.path.join(d, f))
        for f in os.listdir(d) if f.endswith(".avro")) / 1e6, 1)
    shutil.rmtree(d, ignore_errors=True)


def r10_probe(spark, res, n_rows):
    """r10: widen the avro decoder's scale evidence past r9c's narrow
    4-column record (the r9 verdict item 3). Two shapes the landing
    zone actually receives:

    - WIDE: a 54-column Minerva PM-style record (entity, ts, 52 double
      counters) — decode cost ∝ total field count, the common trend
      feed shape.
    - NESTED: array- and map-heavy records (24-element double array +
      4-entry string map per row) — the chunked-collection decode loop.

    Each at 32 files = one per core; single-core driver decode of one
    file is also timed so the per-core rows/s band in SCALE.md (and
    the tripwire in tests/test_avro.py) has a noise-free anchor."""
    import os
    import shutil
    import tempfile
    import time as _t

    from minerva_etl_46_spark.sources.avro import (
        decode_ocf,
        encode_ocf,
        read_avro,
    )

    d = os.path.join(tempfile.gettempdir(), f"r10_avro_{os.getpid()}")
    shutil.rmtree(d, ignore_errors=True)
    n_files = 32

    wide_fields = ([{"name": "entity_id", "type": "long"},
                    {"name": "ts", "type": "long"}]
                   + [{"name": f"c{i:02d}", "type": "double"}
                      for i in range(52)])
    wide_schema = json.dumps(
        {"type": "record", "name": "pm", "fields": wide_fields})

    def wide_row(k):
        r = {"entity_id": k % 10_000, "ts": 1704067200 + k}
        r.update({f"c{i:02d}": float((k * 31 + i) % 100_000) / 100.0
                  for i in range(52)})
        return r

    nested_schema = json.dumps(
        {"type": "record", "name": "nest", "fields": [
            {"name": "id", "type": "long"},
            {"name": "vals", "type": {"type": "array", "items": "double"}},
            {"name": "tags", "type": {"type": "map", "values": "string"}},
        ]})

    def nested_row(k):
        return {"id": k,
                "vals": [float((k + i) % 1000) / 10.0 for i in range(24)],
                "tags": {f"t{i}": f"v{(k + i) % 50}" for i in range(4)}}

    for tag, schema_json, mk, ddl in (
        ("wide54", wide_schema, wide_row,
         "entity_id long, ts long, "
         + ", ".join(f"c{i:02d} double" for i in range(52))),
        ("nested", nested_schema, nested_row,
         "id long, vals array<double>, tags map<string,string>"),
    ):
        sub = os.path.join(d, tag)
        os.makedirs(sub)
        per = n_rows // n_files
        for i in range(n_files):
            rows = [mk(i * per + j) for j in range(per)]
            with open(os.path.join(sub, f"b{i}.avro"), "wb") as fh:
                fh.write(encode_ocf(schema_json, rows, codec="deflate"))
        # noise-free single-core anchor: decode ONE file on the driver
        buf = open(os.path.join(sub, "b0.avro"), "rb").read()
        t0 = _t.perf_counter()
        _, recs = decode_ocf(buf)
        dt1 = _t.perf_counter() - t0
        res[f"avro_{tag}_1core_rows_s"] = round(len(recs) / dt1)
        timed(f"avro_{tag}_{n_rows // 1000}k_32files",
              read_avro(spark, sub, ddl), res)
        agg = res[f"avro_{tag}_{n_rows // 1000}k_32files"]["sec"]
        res[f"avro_{tag}_agg_rows_s"] = round(n_rows / agg)
    shutil.rmtree(d, ignore_errors=True)


def r10c_probe(spark, res, n_rows):
    """r10c: the applyInPandasWithState per-GROUP-CALL overhead law,
    through the REAL run_records path (the round's vectorization
    negative result, measured as a scale rule).

    Same row count, two entity cardinalities: the state op invokes the
    Python walk once per (entity, micro-batch), so a feed with FEW rows
    per entity pays Python call + pandas concat + mini-frame overhead
    per handful of rows, while a many-rows-per-entity feed amortizes
    it. This is the sizing rule for custom stateful ops at 100 TB:
    throughput is set by groups/sec × rows-per-group, NOT rows/sec
    alone — entity cardinality, not volume, is what to capacity-plan
    against (and why vectorizing the walk body cannot help the
    many-tiny-groups shape: setup cost moves INTO numpy, it doesn't
    leave the group call)."""
    import os
    import shutil
    import tempfile
    import time as _t

    from minerva_etl_46_spark.streaming.stateful import run_records

    base = os.path.join(tempfile.gettempdir(), f"r10c_state_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    schema = "user_id long, ts_us long, event_id long, value double"
    for tag, n_entities in (("tiny_groups", 50_000),
                            ("big_groups", 1_000)):
        df = spark.range(n_rows).select(
            (F.col("id") % n_entities).alias("user_id"),
            (F.lit(1704067200_000_000) + F.col("id")).alias("ts_us"),
            F.col("id").alias("event_id"),
            ((F.col("id") * 2654435761) % 100_000).cast("double")
            .alias("value"),
        )
        # three time-ranged files → three micro-batches, every entity in
        # each (the harness contract run_records documents)
        src = os.path.join(base, tag)
        staged = src + "_staged"
        cut = n_rows // 3
        (df.withColumn("batch",
                       F.when(F.col("event_id") < cut, 0)
                       .when(F.col("event_id") < 2 * cut, 1).otherwise(2))
         .repartition("batch")
         .write.partitionBy("batch").mode("overwrite").parquet(staged))
        os.makedirs(src)
        import glob as _g
        now = int(_t.time())
        for b in (0, 1, 2):
            (part,) = _g.glob(os.path.join(staged, f"batch={b}",
                                           "part-*.parquet"))
            dst = os.path.join(src, f"b{b}.parquet")
            shutil.move(part, dst)
            os.utime(dst, (now + b, now + b))
        shutil.rmtree(staged)

        t0 = _t.perf_counter()
        out_n = run_records(spark, src, schema,
                            name=f"r10c_{tag}").count()
        dt = _t.perf_counter() - t0
        assert out_n == n_rows
        res[f"state_{tag}_sec"] = round(dt, 2)
        res[f"state_{tag}_rows_s"] = round(n_rows / dt)
        res[f"state_{tag}_group_calls"] = n_entities * 3
        res[f"state_{tag}_rows_per_call"] = round(n_rows / (n_entities * 3))
    shutil.rmtree(base, ignore_errors=True)


def r10d_probe(spark, res, n_events):
    """r10d: re-measure the SCD2 build at 20M AFTER the r10 row-hash
    pre-image change (per-column md5 components replacing the ambiguous
    concat_ws single digest — 2 md5 calls/row here instead of 1), and
    isolate the pre-image delta itself so the SCALE.md r7 row
    (upsert_scd2_build_events 4.5/9.6 s, 1 exchange) stays comparable.
    The isolated A/B hashes 3 attr columns (the wide-attr shape: 4 md5s
    vs 1) to bound the worst practical case, through one identical
    hash-agg consumer so codegen treats both sides alike."""
    import os
    import shutil
    import tempfile

    from minerva_etl_46_spark.functions.hashing import row_hash
    from minerva_etl_46_spark.queries import QUERIES

    scratch = os.path.join(tempfile.gettempdir(),
                           f"r10d_probe_{os.getpid()}")
    (synth_events(spark, n_events)
     .withColumn("event_type",
                 F.concat(F.lit("t"), (F.xxhash64("event_id") % 5)
                          .cast("string")))
     .withColumn("props", F.lit("{}"))
     .write.mode("overwrite").parquet(f"{scratch}/events.parquet"))
    timed("upsert_scd2_build_events_cold",
          QUERIES["upsert_scd2_build"](spark, scratch), res)
    timed("upsert_scd2_build_events_warm",
          QUERIES["upsert_scd2_build"](spark, scratch), res)

    # isolated pre-image A/B: 3 string attr columns, 20M rows
    attrs = spark.range(n_events).select(
        F.concat(F.lit("a"), (F.col("id") % 1000).cast("string")).alias("a1"),
        F.when(F.col("id") % 97 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("b"), (F.col("id") % 50).cast("string")))
        .alias("a2"),
        (F.col("id") % 7).cast("string").alias("a3"),
    )
    old_h = F.md5(F.concat_ws(
        "|", F.coalesce(F.col("a1"), F.lit("\x00")),
        F.coalesce(F.col("a2"), F.lit("\x00")),
        F.coalesce(F.col("a3"), F.lit("\x00"))))
    timed("row_hash_pre_r10_concat_ws_3col",
          attrs.select(old_h.alias("h")).groupBy().agg(
              F.count(F.when(F.substring("h", 1, 1) == "0", 1)).alias("n")),
          res)
    timed("row_hash_r10_per_column_3col",
          attrs.select(row_hash("a1", "a2", "a3").alias("h"))
          .groupBy().agg(
              F.count(F.when(F.substring("h", 1, 1) == "0", 1)).alias("n")),
          res)
    shutil.rmtree(scratch, ignore_errors=True)


def r10e_probe(spark, res, n_docs):
    """r10e: the WHOLE training-corpus composition (plans/corpus.py —
    exact dedup → LSH near-dup → decontamination → quality → split/shard
    → partitioned write) wall-clocked end-to-end at 1M docs. The stages
    were probed individually in r2/r3; this measures the composition a
    pipeline owner actually runs, including the stage-count actions and
    the final (split, shard)-partitioned write, against the planted-dup
    synth corpus (10% planted near-dups, ground truth by construction).
    Every planted pair shares a base doc ≡ 0 (mod 10); benchmark docs
    are picked ≡ 3 (mod 97) so they never collide with a planted dup's
    canonical (planted-dup recall stays checkable)."""
    import os
    import shutil
    import tempfile
    import time as _t

    from minerva_etl_46_spark.plans.corpus import build_training_corpus

    docs = synth_docs(spark, n_docs).localCheckpoint()  # exclude synth cost
    out_dir = os.path.join(tempfile.gettempdir(),
                           f"r10e_corpus_{os.getpid()}")
    t0 = _t.perf_counter()
    final, stats = build_training_corpus(
        docs, bench_pred=F.col("doc_id") % 97 == 3, out_dir=out_dir)
    dt = round(_t.perf_counter() - t0, 2)
    res["corpus_e2e_sec"] = dt
    res["corpus_docs_per_sec"] = round(n_docs / dt)
    res.update({f"corpus_{k}": v for k, v in stats.counts.items()})
    # survivors after near-dedup must shed ~the planted 10% (minus the
    # planted copies that were already byte-equal — none by construction)
    planted = n_docs // 10
    removed = stats.counts["after_exact_dedup"] - stats.counts["after_near_dedup"]
    res["corpus_planted_dups"] = planted
    res["corpus_neardup_removed"] = removed
    # self-verifying recall (ADVICE r10): the 99.99% headline must fail
    # the probe on regression, not rely on a manual read of the numbers.
    # ≥99% of planted near-dups removed, and never more than planted
    # (over-removal would mean false-positive dedup of unrelated docs).
    recall = removed / planted if planted else 1.0
    res["corpus_neardup_recall"] = round(recall, 6)
    if not (0.99 <= recall <= 1.0):
        print(json.dumps({"shape": "corpus_e2e", "RECALL_REGRESSION": True,
                          **res}), flush=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        sys.exit(3)
    shutil.rmtree(out_dir, ignore_errors=True)
    print(json.dumps({"shape": "corpus_e2e", **res}), flush=True)


def r11_probe(spark, res, n_rows):
    """r11 (VERDICT r10 item 6): the r10-touched WRITE paths at probe
    scale — daily materialization over ``n_rows`` events / 10 days, then
    two late revisions of day 5: (A) half the day's rows drop below the
    rollup's quality filter (output partition REWRITTEN smaller), (B) the
    rest drop too (window output EMPTY → the r10 stale-partition DELETE
    in plans/materialize.py::run_window must fire, and the delete must
    land in the target's modified log). After EACH reprocess, every
    output partition outside the dirty windows' buckets must be
    BYTE-identical (md5 name-for-name over the parquet files) — reprocess
    cost and write churn ∝ the dirty window, never the history. Ground
    truth at every step: target == one-shot batch over the revised raw.

    Deliberately exercises the END-label grid travel the r10 _part_meta
    work documented: day-window (d_k, d_{k+1}] labels its output at
    period END, so its rows land in partition p_bucket = d_{k+1} — the
    stale DELETE must use the state's recorded partitions, not a
    window-grid guess."""
    import glob as _g
    import hashlib as _hl
    import os
    import shutil
    import tempfile
    import time as _t

    from minerva_etl_46_spark.catalog import Trend
    from minerva_etl_46_spark.functions.timestamps import G_1D
    from minerva_etl_46_spark.operators.rollup import time_rollup
    from minerva_etl_46_spark.plans.materialize import (
        MaterializationEngine,
        MaterializationSpec,
    )
    from minerva_etl_46_spark.sources.trendstore import TrendStorePartStorage

    DAY = 86400
    DAY0 = 1704067200  # 2024-01-01 UTC
    base = os.path.join(tempfile.gettempdir(), f"r11_probe_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    raw = TrendStorePartStorage(base, "raw", partition_size_s=DAY)
    target = TrendStorePartStorage(base, "daily", partition_size_s=DAY)
    trends = {"n": Trend("n", time_aggregation="count"),
              "sum_value": Trend("sum_value", time_aggregation="sum")}

    def synth(ids):
        return ids.select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(
                F.lit(DAY0) + (F.col("id") * 9973) % (10 * DAY)).alias("ts"),
            (F.col("id") % 10_000).alias("user_id"),
            ((F.col("id") * 2654435761) % 1000).cast("double").alias("value"),
            F.lit(0).alias("ver"),
        )

    def _trend_cols(rows):
        return rows.select(
            "user_id", "ts",
            F.col("value").alias("n"), F.col("value").alias("sum_value"))

    def src_fn(sp, w_start, w_end):
        # END-labeled window (w_start, w_end]: the boundary row at exactly
        # w_end lives in raw partition p_bucket == w_end, which an
        # end-EXCLUSIVE read_window(w_start, w_end) would prune away —
        # shift the prune range by +1s (smoke-debugged at 200k rows:
        # every day-boundary row silently vanished from the rollup)
        rows = (raw.read_window(sp, w_start + 1, w_end + 1)
                .filter((F.col("ts").cast("long") > w_start)
                        & (F.col("ts").cast("long") <= w_end))
                .filter(F.col("value") >= 0))
        return time_rollup(_trend_cols(rows), "user_id", "ts", G_1D, trends,
                           bucket_col="bucket", label="end")

    spec = MaterializationSpec(
        name="daily", granularity=G_1D, target=target, src_fn=src_fn,
        sources=[raw], ts_col="bucket", reprocessing_period_s=10**12)
    engine = MaterializationEngine(base)
    NOW = 4e9

    t0 = _t.perf_counter()
    raw.write(synth(spark.range(n_rows)).localCheckpoint(), ts_col="ts")
    res["ingest_sec"] = round(_t.perf_counter() - t0, 2)

    t0 = _t.perf_counter()
    done = engine.tick(spark, spec, now=NOW)
    res["tick_initial_sec"] = round(_t.perf_counter() - t0, 2)
    res["tick_initial_windows"] = len(done)

    def snapshot():
        out = {}
        for pdir in _g.glob(os.path.join(target.path, "p_bucket=*")):
            b = int(pdir.rsplit("=", 1)[1])
            out[b] = {
                os.path.basename(f): _hl.md5(open(f, "rb").read()).hexdigest()
                for f in _g.glob(os.path.join(pdir, "*.parquet"))
            }
        return out

    def assert_untouched_identical(before, after, dirty_buckets, tag):
        for b, files in before.items():
            if b in dirty_buckets:
                continue
            assert after.get(b) == files, (
                f"{tag}: partition p_bucket={b} changed but no dirty "
                f"window wrote it (before={files}, after={after.get(b)})")
        # two-sided (r11 review): a reprocess that SPRAYS a new partition
        # outside the dirty windows must fail too, not just one that
        # rewrites an existing one
        sprayed = set(after) - set(before) - dirty_buckets
        assert not sprayed, (
            f"{tag}: reprocess created partitions outside the dirty "
            f"windows: {sorted(sprayed)}")

    def oneshot():
        rows = raw.read(spark).filter(F.col("value") >= 0)
        return (time_rollup(_trend_cols(rows), "user_id", "ts", G_1D, trends,
                            bucket_col="bucket", label="end")
                .groupBy().agg(F.count(F.lit(1)).alias("n"),
                               F.sum("n").alias("sn"),
                               F.sum(F.col("sum_value")
                                     .cast("decimal(38,6)")).alias("sv"))
                .collect()[0])

    def materialized():
        return (target.read(spark)
                .groupBy().agg(F.count(F.lit(1)).alias("n"),
                               F.sum("n").alias("sn"),
                               F.sum(F.col("sum_value")
                                     .cast("decimal(38,6)")).alias("sv"))
                .collect()[0])

    assert materialized() == oneshot(), "initial tick != one-shot batch"
    snap0 = snapshot()
    d5, d6 = DAY0 + 5 * DAY, DAY0 + 6 * DAY

    # revision A: WINDOW (d5,d6]'s rows for EVEN users drop below the
    # quality filter. Window-aligned (ts > d5, ts <= d6), NOT day-aligned:
    # under the END-label convention the boundary row at exactly d6 lives
    # in raw partition d6 but belongs to THIS window — a [d5,d6) revision
    # would leave it alive and the window could never empty (the first
    # smoke run tripped exactly this).
    def day5_rev(ver):
        return (synth(spark.range(n_rows))
                .filter((F.col("ts").cast("long") > d5)
                        & (F.col("ts").cast("long") <= d6))
                .withColumn("value", F.lit(-1.0))
                .withColumn("ver", F.lit(ver)))

    rev_a = day5_rev(1).filter(F.col("user_id") % 2 == 0)
    n_rev_a = rev_a.count()
    t0 = _t.perf_counter()
    raw.upsert(rev_a, keys=["event_id"], version_cols=["ver"], ts_col="ts")
    res["upsert_revA_sec"] = round(_t.perf_counter() - t0, 2)
    t0 = _t.perf_counter()
    done_a = engine.tick(spark, spec, now=NOW + 10)
    res["tick_revA_sec"] = round(_t.perf_counter() - t0, 2)
    res["tick_revA_windows"] = len(done_a)
    # raw buckets d5+d6 dirtied → windows (d4,d5], (d5,d6], (d6,d7]
    # re-fingerprint (the two neighbors rewrite identical content);
    # their output buckets are d5, d6, d7
    assert set(done_a) <= {d5 - DAY, d5, d6}, done_a
    snap_a = snapshot()
    assert_untouched_identical(snap0, snap_a, {d5, d6, d6 + DAY}, "revA")
    assert materialized() == oneshot(), "revA reprocess != one-shot batch"
    shrunk = target.read(spark).filter(F.col("p_bucket") == d6).count()
    assert 0 < shrunk <= 5_000, f"day-5 output should shrink to odd users, got {shrunk}"

    # revision B: the window's REMAINING (odd-user) rows drop → output
    # EMPTY → the stale-partition DELETE must fire
    rev_b = day5_rev(2).filter(F.col("user_id") % 2 == 1)
    n_rev_b = rev_b.count()
    # d6 log entries BEFORE the delete (initial write + revA rewrite):
    # the delete must INCREMENT this — an absolute >=2 would already be
    # satisfied without the delete landing in the log (r11 review)
    mlog_d6_before = target.modified_log(spark).filter(
        F.col("p_bucket") == d6).count()
    raw.upsert(rev_b, keys=["event_id"], version_cols=["ver"], ts_col="ts")
    t0 = _t.perf_counter()
    done_b = engine.tick(spark, spec, now=NOW + 20)
    res["tick_revB_sec"] = round(_t.perf_counter() - t0, 2)
    res["tick_revB_windows"] = len(done_b)
    snap_b = snapshot()
    assert not os.path.isdir(os.path.join(target.path, f"p_bucket={d6}")), \
        "stale partition p_bucket=d6 must be DELETED when the window empties"
    dirty_b = {d5, d6, d6 + DAY}
    assert_untouched_identical(snap_a, snap_b, dirty_b, "revB")
    assert materialized() == oneshot(), "revB reprocess != one-shot batch"
    # the delete is a modification: downstream chains must see d6 dirty
    mlog_d6_after = target.modified_log(spark).filter(
        F.col("p_bucket") == d6).count()
    assert mlog_d6_after > mlog_d6_before, \
        "stale-partition delete missing from the target's modified log"
    res["rev_rows"] = n_rev_a + n_rev_b
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"shape": "materialize_shrink_delete", **res}),
          flush=True)


def r11b_probe(spark, res, n_docs):
    """r11b: llm_bpe_pairs' scale claim, measured — the pair pass is
    VOCAB-bounded, not corpus-bounded. Over a 50k-shared-vocabulary
    corpus (the r7c natural-language shape) at n/10 and n docs:
    - e2e (scan → vocab agg → pair agg) scales with the corpus;
    - the pair stage ALONE (bpe_pairs_from_vocab over the materialized
      vocab) must cost the SAME at both corpus sizes, because both
      saturate the same 50k vocabulary. This is the number that holds
      at 100 TB: the merge-loop input is |vocab| × avg_word_len rows
      regardless of corpus bytes."""
    from minerva_etl_46_spark.operators.textstats import (
        bpe_pair_counts,
        bpe_pairs_from_vocab,
        bpe_vocab,
    )

    words = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda i: F.concat(
            F.lit("w"),
            (F.abs(F.xxhash64(F.col("id"), i)) % 50_000).cast("string")))
    # absorb first-run JIT/codegen on a tiny frame so the small-vs-large
    # comparison measures data, not whichever runs first
    warm = spark.range(100).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text"))
    bpe_pair_counts(warm, "text").write.format("noop") \
        .mode("overwrite").save()
    for tag, n in (("small", n_docs // 10), ("large", n_docs)):
        docs = (spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", words).alias("text"))
            .localCheckpoint(eager=True))  # exclude synth cost
        timed(f"bpe_e2e_{tag}", bpe_pair_counts(docs, "text"), res)
        vocab = bpe_vocab(docs, "text").localCheckpoint(eager=True)
        res[f"bpe_vocab_{tag}"] = vocab.count()
        timed(f"bpe_pairstage_{tag}", bpe_pairs_from_vocab(vocab), res)
        docs.unpersist()
    # self-verifying: the pair stage must NOT scale with the corpus
    # (same vocab at both sizes ⇒ same work); 3× headroom for host noise
    ratio = res["bpe_pairstage_large"]["sec"] / max(
        res["bpe_pairstage_small"]["sec"], 1e-3)
    res["bpe_pairstage_ratio"] = round(ratio, 2)
    assert ratio < 3.0, (
        f"pair stage scaled with the corpus (ratio {ratio}) — the "
        "vocab-bounded claim is broken")
    print(json.dumps({"shape": "bpe_stage_scaling", **res}), flush=True)


def r12_probe(spark, res, n_docs):
    """r12: llm_bpe_tokenize's scale claim, measured — the ENTIRE merge
    loop (N iterations of pair agg + argmax + merge application) is
    VOCAB-bounded. Same harness as r11b (50k shared vocabulary at n/10
    and n docs): the tokenize stage over the materialized vocab must
    cost the same at both corpus sizes. This is the apply-half number
    that holds at 100 TB: after bpe_vocab's one corpus pass, iteration
    cost is |vocab| × avg_word_len per merge regardless of corpus
    bytes."""
    from minerva_etl_46_spark.operators.textstats import (
        bpe_tokenize_vocab,
        bpe_vocab,
    )

    words = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda i: F.concat(
            F.lit("w"),
            (F.abs(F.xxhash64(F.col("id"), i)) % 50_000).cast("string")))
    warm = spark.range(100).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text"))
    bpe_tokenize_vocab(bpe_vocab(warm, "text"), 4).write.format("noop") \
        .mode("overwrite").save()
    for tag, n in (("small", n_docs // 10), ("large", n_docs)):
        docs = (spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", words).alias("text"))
            .localCheckpoint(eager=True))  # exclude synth cost
        vocab = bpe_vocab(docs, "text").localCheckpoint(eager=True)
        res[f"tok_vocab_{tag}"] = vocab.count()
        timed(f"bpe_tokenize_{tag}", bpe_tokenize_vocab(vocab, 4), res)
        docs.unpersist()
    ratio = res["bpe_tokenize_large"]["sec"] / max(
        res["bpe_tokenize_small"]["sec"], 1e-3)
    res["bpe_tokenize_ratio"] = round(ratio, 2)
    # Record, don't assert (r12 ADVICE): a loaded host can flake a
    # wall-clock ratio even when the vocab-bounded claim holds, and an
    # aborted probe loses the whole JSON artifact. --strict restores the
    # hard gate for quiet-host certification runs.
    res["bpe_tokenize_ratio_ok"] = ratio < 3.0
    if not res["bpe_tokenize_ratio_ok"]:
        msg = (f"WARNING: tokenize large/small wall-clock ratio {ratio} "
               "≥ 3.0 — vocab-bounded claim suspect (or host noise); "
               "re-run on a quiet host or with --strict")
        print(msg, file=sys.stderr, flush=True)
        if "--strict" in sys.argv:
            raise AssertionError(msg)
    print(json.dumps({"shape": "bpe_tokenize_scaling", **res}), flush=True)


def r13_probe(spark, res, n_entities):
    """Restart-recovery cost law for the applyInPandasWithState walks
    (tests/test_r13_restart.py is the correctness gate; this measures
    the cost): recovering a checkpoint loads the state store's LATEST
    version, so restart wall-clock must track LIVE STATE SIZE (distinct
    entities) and stay INDEPENDENT of HISTORY LENGTH (how many
    micro-batches the query already processed). A walk whose restart
    replays history would be unusable after a month of production —
    this pins that it doesn't. Measured with scd2_intervals (one
    (value, start) struct per entity — the constant-per-entity state
    shape all six walks share) on BOTH providers: the default
    HDFS-backed store restores snapshot+deltas; RocksDB restores its
    own checkpoint. Every batch flips every entity's value, so each
    batch rewrites ALL n state rows — the worst case for a
    history-replaying implementation.

    Emits per-config restart seconds plus two ratios:
    - history_ratio_{provider}: restart after 8 batches / after 2
      batches, same entity count — the law says ~1.0;
    - state_ratio_{provider}: restart with 4x the entities, same
      history — the law allows ~4x (state is the thing recovered),
      sub-linear in practice because per-batch overhead dominates.
    Ratios are RECORDED, never asserted (the r12 ADVICE rule: a loaded
    host must still produce the artifact)."""
    import shutil as _shutil
    import tempfile

    from minerva_etl_46_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        scd2_intervals,
    )

    schema = "user_id long, ts_us long, event_id long, event_type string"
    conf_key = "spark.sql.streaming.stateStore.providerClass"

    def write_batch(src, i, n):
        # batch i flips every entity to value chr('a'+i%2): full-state
        # churn per batch
        staged = os.path.join(src, f"_stage{i}")
        (spark.range(n).selectExpr(
            "id as user_id",
            f"cast({i} * 1000000 + id % 997 as long) as ts_us",
            f"cast({i} * 10000000 + id as long) as event_id",
            f"chr(ascii('a') + {i % 2}) as event_type",
        ).coalesce(1).write.mode("overwrite").parquet(staged))
        (part,) = [f for f in os.listdir(staged)
                   if f.startswith("part-") and f.endswith(".parquet")]
        dst = os.path.join(src, f"b{i:03d}.parquet")
        os.rename(os.path.join(staged, part), dst)
        _shutil.rmtree(staged)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    def one_run(src, ckpt):
        raw = (spark.readStream.format("parquet").schema(schema)
               .option("maxFilesPerTrigger", "1").load(src))
        q = (scd2_intervals(raw).writeStream
             .foreachBatch(lambda df, _e: df.write.format("noop")
                           .mode("overwrite").save())
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    for provider in ("default", "rocksdb"):
        prev = spark.conf.get(conf_key, None)
        if provider == "rocksdb":
            spark.conf.set(conf_key, ROCKSDB_PROVIDER)
        try:
            for tag, n, history in (
                ("h2", n_entities, 2),
                ("h8", n_entities, 8),
                ("small_h2", n_entities // 4, 2),
            ):
                base = tempfile.mkdtemp(prefix=f"r13probe_{provider}_{tag}_")
                src = os.path.join(base, "src")
                os.makedirs(src)
                ckpt = os.path.join(base, "ck")
                for i in range(history):
                    write_batch(src, i, n)
                one_run(src, ckpt)             # the "month of production"
                write_batch(src, history, n)   # one new batch arrives
                t0 = time.perf_counter()
                one_run(src, ckpt)             # restart: restore + 1 batch
                dt = round(time.perf_counter() - t0, 2)
                res[f"restart_{provider}_{tag}"] = {
                    "sec": dt, "entities": n, "history_batches": history}
                print(json.dumps(
                    {"shape": f"restart_{provider}_{tag}",
                     **res[f"restart_{provider}_{tag}"]}), flush=True)
                _shutil.rmtree(base, ignore_errors=True)
        finally:
            if prev is not None:
                spark.conf.set(conf_key, prev)
            else:
                spark.conf.unset(conf_key)
        res[f"history_ratio_{provider}"] = round(
            res[f"restart_{provider}_h8"]["sec"]
            / max(res[f"restart_{provider}_h2"]["sec"], 1e-3), 2)
        res[f"state_ratio_{provider}"] = round(
            res[f"restart_{provider}_h2"]["sec"]
            / max(res[f"restart_{provider}_small_h2"]["sec"], 1e-3), 2)
        print(json.dumps({
            "shape": f"restart_law_{provider}",
            "history_ratio": res[f"history_ratio_{provider}"],
            "state_ratio": res[f"state_ratio_{provider}"]}), flush=True)


def r14_probe(spark, res, n_rows_per_window):
    """Tick/recovery cost law for the BATCH materialization daemon
    (tests/test_r14_materialize_crash.py is the correctness gate; this
    measures the cost): a tick's wall-clock must track the DIRTY windows
    it actually runs, never the windows the daemon has ALREADY
    materialized. The state file and modified-log both grow with history
    (O(windows-in-retention) bookkeeping), so a daemon that is slower
    after a month of production would be unusable — this pins that the
    bookkeeping stays negligible against one window's run.

    Shapes, on a 1h rollup spec (the §3.2 shape) at two history depths:
    - seed_h{H}: catch-up tick materializing H one-hour windows
      (context; ∝ H by design — each window is one bounded batch job);
    - tick1_h{H}: ONE new dirty window arrives after H windows of
      history → tick seconds. history_ratio = tick1_big/tick1_small,
      the law says ~1.0;
    - noop_h{H}: nothing dirty → candidate-scan cost alone (the
      daemon's idle heartbeat; O(log buckets) Spark scan + driver
      bookkeeping, bounded by the modified-log retention window);
    - replay_h{H}: crash-sim at the (a) seam of the r14 gate — the
      state file is rolled back to its pre-tick copy, exactly what a
      kill between ``spec.target.write`` and ``_save_state`` leaves —
      then the re-tick converges by re-running the one unsaved window.
      replay_ratio = replay/tick1 ~ 1.0: recovery costs one window,
      independent of history.
    Ratios are RECORDED, never asserted (the r12 ADVICE rule)."""
    import shutil as _shutil
    import tempfile

    from minerva_etl_46_spark.plans.materialize import (
        MaterializationEngine,
        MaterializationSpec,
    )
    from minerva_etl_46_spark.sources.trendstore import TrendStorePartStorage

    far = 4e9  # synthetic far-future 'now': all delays satisfied
    keys = 1000

    def window_rows(w_start, n):
        # n raw rows spread inside [w_start, w_start+3600), 1000 entities
        return spark.range(n).select(
            (F.col("id") % keys).alias("k"),
            F.timestamp_seconds(w_start + (F.col("id") * 7) % 3600).alias("ts"),
            ((F.col("id") % 1000) / 3.0).alias("v"),
        )

    def build(history):
        base = tempfile.mkdtemp(prefix=f"r14probe_h{history}_")
        raw = TrendStorePartStorage(base, "raw_c", partition_size_s=3600)
        target = TrendStorePartStorage(base, "c_1h", partition_size_s=3600)
        trends = {"n": Trend("n", time_aggregation="count"),
                  "sum_value": Trend("sum_value", time_aggregation="sum")}

        def src_fn(sprk, ws, we):
            rows = raw.read_window(sprk, ws, we).filter(
                (F.col("ts").cast("long") >= ws)
                & (F.col("ts").cast("long") < we))
            return time_rollup(
                rows.select("k", "ts", F.col("v").alias("n"),
                            F.col("v").alias("sum_value")),
                "k", "ts", G_1H, trends, bucket_col="bucket")

        spec = MaterializationSpec(
            name="c_1h", granularity=G_1H, target=target, src_fn=src_fn,
            sources=[raw], ts_col="bucket", reprocessing_period_s=10**12)
        engine = MaterializationEngine(base)
        for h in range(history):
            raw.write(window_rows(BASE + h * 3600, n_rows_per_window))
        return base, raw, spec, engine

    for tag, history in (("h8", 8), ("h32", 32)):
        base, raw, spec, engine = build(history)
        t0 = time.perf_counter()
        done = engine.tick(spark, spec, now=far)
        res[f"seed_{tag}"] = {
            "sec": round(time.perf_counter() - t0, 2),
            "windows": len(done), "rows_per_window": n_rows_per_window}

        # one new dirty window after `history` windows of history
        raw.write(window_rows(BASE + history * 3600, n_rows_per_window))
        t0 = time.perf_counter()
        done = engine.tick(spark, spec, now=far + 10)
        res[f"tick1_{tag}"] = {
            "sec": round(time.perf_counter() - t0, 2), "windows": len(done)}

        t0 = time.perf_counter()
        done = engine.tick(spark, spec, now=far + 20)
        res[f"noop_{tag}"] = {
            "sec": round(time.perf_counter() - t0, 2), "windows": len(done)}

        # crash-sim: snapshot state, run one more window, roll the state
        # file back (= kill between target.write and _save_state), re-tick
        state_path = engine._state_path(spec)
        snap = state_path + ".probe_snap"
        _shutil.copyfile(state_path, snap)
        raw.write(window_rows(BASE + (history + 1) * 3600,
                              n_rows_per_window))
        engine.tick(spark, spec, now=far + 30)
        os.replace(snap, state_path)  # the crash lost the fingerprint save
        t0 = time.perf_counter()
        done = engine.tick(spark, spec, now=far + 40)
        res[f"replay_{tag}"] = {
            "sec": round(time.perf_counter() - t0, 2), "windows": len(done)}
        for shape in ("seed", "tick1", "noop", "replay"):
            print(json.dumps({"shape": f"{shape}_{tag}",
                              **res[f"{shape}_{tag}"]}), flush=True)
        _shutil.rmtree(base, ignore_errors=True)

    res["history_ratio"] = round(
        res["tick1_h32"]["sec"] / max(res["tick1_h8"]["sec"], 1e-3), 2)
    res["noop_ratio"] = round(
        res["noop_h32"]["sec"] / max(res["noop_h8"]["sec"], 1e-3), 2)
    res["replay_ratio"] = round(
        res["replay_h32"]["sec"] / max(res["tick1_h32"]["sec"], 1e-3), 2)
    print(json.dumps({"shape": "tick_law",
                      "history_ratio": res["history_ratio"],
                      "noop_ratio": res["noop_ratio"],
                      "replay_ratio": res["replay_ratio"]}), flush=True)


def main():
    spark = get_spark(app_name="scale-probe")
    res: dict = {}

    if len(sys.argv) > 1 and sys.argv[1] == "r14":
        n = int(os.environ.get("SCALE_PROBE_MAT_ROWS", 200_000))
        r14_probe(spark, res, n_rows_per_window=n)
        print(json.dumps({"metric": "scale_probe_r14",
                          "rows_per_window": n, "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r13":
        n = int(os.environ.get("SCALE_PROBE_ENTITIES", 20_000))
        r13_probe(spark, res, n_entities=n)
        print(json.dumps({"metric": "scale_probe_r13", "entities": n,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r12":
        n = min(N, 1_000_000)
        r12_probe(spark, res, n_docs=n)
        print(json.dumps({"metric": "scale_probe_r12", "rows": n,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r11b":
        n = min(N, 1_000_000)
        r11b_probe(spark, res, n_docs=n)
        print(json.dumps({"metric": "scale_probe_r11b", "rows": n,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r11":
        n = min(N, 20_000_000)
        r11_probe(spark, res, n_rows=n)
        print(json.dumps({"metric": "scale_probe_r11", "rows": n,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r10e":
        n = min(N, 1_000_000)
        r10e_probe(spark, res, n_docs=n)
        print(json.dumps({"metric": "scale_probe_r10e", "rows": n,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r10d":
        r10d_probe(spark, res, n_events=N)
        print(json.dumps({"metric": "scale_probe_r10d", "rows": N,
                          "shapes": res}))
        spark.stop()
        return

    if len(sys.argv) > 1 and sys.argv[1] == "r10c":
        n = min(N, 2_000_000)
        r10c_probe(spark, res, n_rows=n)
        print(json.dumps({"metric": "scale_probe_r10c", "rows": n,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r10":
        n = min(N, 320_000)
        r10_probe(spark, res, n_rows=n)
        print(json.dumps({"metric": "scale_probe_r10", "rows": n,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r9c":
        n = min(N, 1_000_000)
        r9c_probe(spark, res, n_rows=n)
        print(json.dumps({"metric": "scale_probe_r9c", "rows": n,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r9b":
        n_names = min(N, 1_000_000)
        r9b_probe(spark, res, n_names=n_names)
        print(json.dumps({"metric": "scale_probe_r9b", "rows": n_names,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r9":
        r9_probe(spark, res, n_events=N)
        print(json.dumps({"metric": "scale_probe_r9", "rows": N,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r8c":
        r8c_probe(spark, res, n_events=N)
        print(json.dumps({"metric": "scale_probe_r8c", "rows": N,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r8b":
        r8b_probe(spark, res, n_events=N)
        print(json.dumps({"metric": "scale_probe_r8b", "rows": N,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r8":
        n_base = min(N, 1_000_000)
        r8_probe(spark, res, n_base=n_base)
        print(json.dumps({"metric": "scale_probe_r8", "rows": n_base,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r7g":
        r7g_probe(spark, res, n_events=N)
        print(json.dumps({"metric": "scale_probe_r7g", "rows": N,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r7f":
        r7f_probe(spark, res, n_events=N, n_vec=max(100_000, N // 20))
        print(json.dumps({"metric": "scale_probe_r7f", "rows": N,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r7e":
        r7e_probe(spark, res, n_events=N, n_docs=max(100_000, N // 20))
        print(json.dumps({"metric": "scale_probe_r7e", "rows": N,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r7d":
        r7d_probe(spark, res, n_events=N, n_docs=max(100_000, N // 20))
        print(json.dumps({"metric": "scale_probe_r7d", "rows": N,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r7c":
        r7c_probe(spark, res, n_events=N, n_docs=max(100_000, N // 20))
        print(json.dumps({"metric": "scale_probe_r7c", "rows": N,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r7b":
        r7b_probe(spark, res, n_events=N)
        print(json.dumps({"metric": "scale_probe_r7b", "rows": N,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r7":
        r7_probe(spark, res, n_events=N, n_docs=max(100_000, N // 20))
        print(json.dumps({"metric": "scale_probe_r7", "rows": N,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r6":
        r6_probe(spark, res, n_events=N, n_docs=max(100_000, N // 20))
        print(json.dumps({"metric": "scale_probe_r6", "rows": N,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r6b":
        r6b_probe(spark, res, n_events=N, n_docs=max(100_000, N // 20))
        print(json.dumps({"metric": "scale_probe_r6b", "rows": N,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r5g":
        robust_stats_probe(spark, res, n_events=N)
        print(json.dumps({"metric": "scale_probe_r5g", "rows": N,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r5d":
        text_signals_probe(spark, res, n_events=N, n_docs=max(100_000, N // 20))
        print(json.dumps({"metric": "scale_probe_r5d", "rows": N,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r5b":
        monitoring_probe(spark, res, n_events=N, n_docs=max(100_000, N // 20))
        print(json.dumps({"metric": "scale_probe_r5b", "rows": N,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r5":
        embed_neardup_probe(spark, res, n_vec=max(100_000, N // 20))
        print(json.dumps({"metric": "scale_probe_r5", "rows": N,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r3":
        export_probe(spark, res, n_docs=max(100_000, N // 20))
        print(json.dumps({"metric": "scale_probe_r3", "rows": N,
                          "shapes": res}))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r4":
        n_docs = max(100_000, N // 20)
        dedup_pipeline_probe(spark, res, n_docs)       # full pass, same corpus
        incremental_dedup_probe(spark, res, n_docs)    # batch-bounded twin
        print(json.dumps({"metric": "scale_probe_r4", "rows": N,
                          "shapes": res}))
        spark.stop()
        return
    e = synth_events(spark)

    trends = {
        "n": Trend("n", time_aggregation="count"),
        "sum_value": Trend("sum_value", time_aggregation="sum"),
    }
    src = e.select("user_id", "ts", F.col("value").alias("n"),
                   F.col("value").alias("sum_value"))
    timed("agg_time_rollup", time_rollup(src, "user_id", "ts", G_1H, trends), res)

    staged = e.filter(F.col("event_id") % 100 == 0).withColumn(
        "value", F.col("value") + 1.0)
    timed("upsert_keep_latest",
          upsert_latest(e, staged, keys=["event_id"], version_cols=["value"]), res)

    attrs = (
        spark.range(USERS * 10)
        .select(
            (F.col("id") % USERS).alias("user_id"),
            F.timestamp_seconds(BASE + (F.col("id") * 8887) % SPAN_S).alias("ats"),
            (F.col("id") % 5).cast("double").alias("segment"),
        )
        .dropDuplicates(["user_id", "ats"])
    )
    timed("asof_join",
          asof_join(e.select("event_id", "user_id", "ts"), attrs,
                    on="user_id", fact_ts="ts", attr_ts="ats",
                    value_cols=["segment"]), res)

    hourly = time_rollup(src, "user_id", "ts", G_1H, trends)
    timed("topk_per_bucket",
          topk_per_group(hourly, ["bucket"], "sum_value", 5,
                         tiebreak=["user_id"]), res)

    p = e.filter(F.col("event_id") % 50 == 0).select(
        "event_id", "user_id", F.col("ts").alias("p_ts"))
    err = e.filter(F.col("event_id") % 50 == 1).select(
        "user_id", F.col("ts").alias("e_ts"))
    timed("bucketed_range_join",
          bucketed_range_join(p, err, key="user_id", left_ts="p_ts",
                              right_ts="e_ts", lower_s=-3600, upper_s=0), res)

    # hot-key stress: 10% of ALL rows on one user — the shape naive range
    # joins die on
    eh = synth_events(spark, hot_user_fraction=0.10)
    ph = eh.filter(F.col("event_id") % 50 == 0).select(
        "event_id", "user_id", F.col("ts").alias("p_ts"))
    errh = eh.filter(F.col("event_id") % 50 == 1).select(
        "user_id", F.col("ts").alias("e_ts"))
    timed("bucketed_range_join_hotkey",
          bucketed_range_join(ph, errh, key="user_id", left_ts="p_ts",
                              right_ts="e_ts", lower_s=-3600, upper_s=0), res)

    dedup_pipeline_probe(spark, res, n_docs=max(100_000, N // 20))

    print(json.dumps({"metric": "scale_probe", "rows": N, "users": USERS,
                      "shapes": res}))
    spark.stop()


if __name__ == "__main__":
    main()
