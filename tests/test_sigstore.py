"""Signature store: cache hit ∝ unchanged content, signatures identical to
the direct pass (SCALE.md amortization item)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from minerva_etl_46_spark.operators.dedup import minhash_signature
from minerva_etl_46_spark.sources.sigstore import SignatureStore

SF = "/root/testdata/sf0.001"


def _docs(spark, n=200):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < n)
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )


def test_store_matches_direct_and_amortizes(spark, tmp_path):
    docs = _docs(spark)
    store = SignatureStore(str(tmp_path), k=16)

    got = store.signatures(docs, "doc_id", "text").toPandas()
    want = minhash_signature(docs, "doc_id", "text", k=16).toPandas()
    key = "doc_id"
    got = got.sort_values(key).reset_index(drop=True)[want.columns.tolist()]
    want = want.sort_values(key).reset_index(drop=True)
    assert got.equals(want), "cached signatures != direct minhash pass"

    # store holds one row per distinct content
    n_distinct = docs.select(F.md5("text")).distinct().count()
    stored = spark.read.parquet(store.path)
    assert stored.count() == n_distinct

    # second run over corpus + new docs appends ONLY the new content
    more = _docs(spark, n=250)
    out2 = store.signatures(more, "doc_id", "text")
    assert out2.count() == more.count()
    n_distinct2 = more.select(F.md5("text")).distinct().count()
    stored2 = spark.read.parquet(store.path).dropDuplicates(["content_hash"])
    assert stored2.count() == n_distinct2
    # run-1 docs still resolve through the (append-only) store
    assert out2.join(docs.select("doc_id"), "doc_id").count() == docs.count()


def test_unchanged_rerun_appends_nothing(spark, tmp_path):
    docs = _docs(spark)
    store = SignatureStore(str(tmp_path), k=16)
    store.signatures(docs, "doc_id", "text").count()
    files1 = set(os.listdir(store.path))
    store.signatures(docs, "doc_id", "text").count()
    assert set(os.listdir(store.path)) == files1, "rerun appended despite full cache hit"


def test_fresh_store_empty_input_returns_empty(spark, tmp_path):
    """ADVICE r02: fresh store + nothing to write must not raise — it
    returns an empty frame with the signature schema."""
    docs = _docs(spark).filter(F.lit(False))
    store = SignatureStore(str(tmp_path), k=16)
    out = store.signatures(docs, "doc_id", "text")
    assert out.count() == 0
    assert "mh0" in out.columns and "doc_id" in out.columns


def test_shingle_less_docs_absent_not_crashing(spark, tmp_path):
    """Docs shorter than shingle_n tokens have no shingles: documented to
    be absent from the output (fresh store, nothing cached)."""
    short = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
    store = SignatureStore(str(tmp_path), k=16, shingle_n=3)
    out = store.signatures(short, "doc_id", "text")
    assert out.count() == 0


def test_bucketed_store_matches_and_cache_side_never_shuffles(spark):
    """r6: the bucketed cache variant — same signatures as the direct
    pass, and the map-back join's plan must show NO Exchange on the
    cache (table-scan) side: only the batch side exchanges into the
    bucket partitioning."""
    from minerva_etl_46_spark.sources.sigstore import BucketedSignatureStore

    docs = _docs(spark)
    spark.sql("drop table if exists sig_bucketed_test")
    import shutil
    from urllib.parse import urlparse
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/sig_bucketed_test", ignore_errors=True)

    store = BucketedSignatureStore(table="sig_bucketed_test", n_buckets=8,
                                   k=16)
    got = store.signatures(docs, "doc_id", "text").toPandas()
    want = minhash_signature(docs, "doc_id", "text", k=16).toPandas()
    got = got.sort_values("doc_id").reset_index(drop=True)[want.columns.tolist()]
    want = want.sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want)

    # second run: pure cache hit, and the join plan keeps the cache side
    # exchange-free (disable broadcast so the join strategy is the one a
    # corpus-sized cache would get)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df2 = store.signatures(docs, "doc_id", "text")
        plan = df2._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan[:2000]
        # exactly the probe-side exchanges may appear; the FileScan of the
        # bucketed table must not sit under an Exchange. Heuristic: the
        # plan mentions SelectedBucketsCount and at most 2 Exchanges
        # (batch side of anti-join + batch side of map-back join).
        assert plan.count("Exchange hashpartitioning") <= 2, plan[:3000]
        n = df2.count()
        assert n == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("drop table if exists sig_bucketed_test")
