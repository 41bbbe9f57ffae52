#!/usr/bin/env python
"""Runnable incremental-ingest flow: the day-N sibling of
build_training_corpus.py.

    python examples/incremental_ingest.py [sf_dir] [store_dir]

Day 0 builds the corpus signature store once (work ∝ corpus). Every later
batch then runs near-dup admission WITHOUT re-reading the corpus:

1. signatures for the batch come from the content-hash-keyed
   SignatureStore — unseen content only (re-ingested copies hit the cache);
2. the batch's band rows probe the STORED corpus signatures
   (operators/dedup.lsh_candidates_against) — never a corpus self-join;
3. exact-Jaccard verify touches only docs appearing in candidate pairs;
4. docs whose best match clears the threshold are rejected, the rest are
   admitted (and their signatures are already cached for the next batch).

SCALE.md's 1M-doc probe measures this at 8.1 s per 10k-doc batch vs
69.7 s for the full pairwise pass — per-batch cost is batch-bounded.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minerva_etl_46_spark.operators.dedup import (
    jaccard_verify,
    lsh_candidates_against,
)
from minerva_etl_46_spark.session import get_spark
from minerva_etl_46_spark.sources.sigstore import SignatureStore


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    store_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="ingest_store_")
    spark = get_spark(app_name="incremental-ingest")
    store = SignatureStore(store_dir, k=32)

    corpus = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )
    # ---- day 0: seed the signature store (one-off, work ∝ corpus)
    corpus_sig = store.signatures(corpus, "doc_id", "text")
    n_corpus = corpus_sig.count()

    # ---- day 1: a batch arrives — some genuinely new docs, some mutated
    # near-copies of corpus docs (the thing admission must catch)
    batch = (
        corpus.filter(F.col("doc_id") % 13 == 0)
        .select(
            (F.col("doc_id") + 5_000_000).alias("doc_id"),
            F.concat("text", F.lit(" ingest mutation token")).alias("text"),
        )
        .unionByName(
            corpus.filter(F.col("doc_id") % 13 == 5).select(
                (F.col("doc_id") + 6_000_000).alias("doc_id"),
                F.reverse(F.col("text")).alias("text"),  # unrelated content
            )
        )
    )
    n_batch = batch.count()

    # batch signatures: cache-aware (re-ingested content costs nothing)
    batch_sig = store.signatures(batch, "doc_id", "text")
    # max_bucket_size: production guard — one template/boilerplate band
    # bucket in the STORED signatures would otherwise fan every matching
    # batch doc out against the whole bucket, every single day
    cand = lsh_candidates_against(batch_sig, corpus_sig, id_col="doc_id",
                                  k=32, bands=16, max_bucket_size=1000)
    pairs = cand.select(F.col("q_id").alias("a_id"),
                        F.col("i_id").alias("b_id"))
    ids = (pairs.select(F.col("a_id").alias("doc_id"))
           .unionByName(pairs.select(F.col("b_id").alias("doc_id")))
           .distinct())
    relevant = corpus.unionByName(batch).join(ids, "doc_id", "left_semi")
    dups = jaccard_verify(relevant, pairs, "doc_id", "text", threshold=0.5)

    rejected = dups.select(F.col("a_id").alias("doc_id")).distinct()
    admitted = batch.join(rejected, "doc_id", "left_anti")
    stats = {
        "corpus_docs_with_signatures": n_corpus,
        "batch_docs": n_batch,
        "candidate_pairs": cand.count(),
        "near_dup_rejected": rejected.count(),
        "admitted": admitted.count(),
    }
    for k, v in stats.items():
        print(f"{k:32s} {v}")
    # the mutated near-copies must be caught; the reversed docs admitted
    assert stats["near_dup_rejected"] > 0
    assert stats["admitted"] > 0
    assert stats["near_dup_rejected"] + stats["admitted"] == n_batch
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
