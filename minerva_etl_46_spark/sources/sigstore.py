"""Persisted MinHash signature store (SCALE.md round-1 "known costs" item).

A 100 TB dedup sweep re-runs daily over a corpus that grows by a small
fraction; recomputing every document's shingle+minhash pass each run wastes
almost all of the pipeline's cost. This store caches signatures in parquet
KEYED BY CONTENT HASH, so a run computes signatures only for content it has
never seen — work ∝ new bytes, not corpus bytes:

- the cache key is md5(text), not doc_id: re-ingested or re-numbered copies
  of the same content hit the cache, and two docs with identical text share
  one signature row (they are exact dups anyway — the exact-dedup pass
  upstream already groups them).
- appends are blind (no read-modify-write): duplicate cache rows from
  concurrent runs are harmless because signatures are deterministic in the
  content hash — readers drop duplicates.
- the store is parameter-scoped (k, shingle_n): different signature shapes
  never mix.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minerva_etl_46_spark.operators.dedup import minhash_signature


@dataclass
class SignatureStore:
    base_dir: str
    k: int = 32
    shingle_n: int = 3

    @property
    def path(self) -> str:
        return os.path.join(self.base_dir, "_signatures",
                            f"k{self.k}_n{self.shingle_n}")

    def _cached(self, spark) -> DataFrame | None:
        if not os.path.isdir(self.path):
            return None
        # blind concurrent appends may duplicate a content hash; signatures
        # are deterministic in the hash, so keep any one row
        return spark.read.parquet(self.path).dropDuplicates(["content_hash"])

    def signatures(self, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
        """(id, mh0..mh{k-1}) for every doc that HAS shingles, computing only
        unseen content.  Docs with fewer than ``shingle_n`` tokens yield no
        shingles, hence no signature row: they cannot participate in MinHash
        LSH and are deliberately absent from the output (the exact-dedup pass
        upstream is the right tool for them).

        Plan shape: one hash per doc (narrow), an anti-join against the
        cache to find missing content, the minhash pass over ONLY missing
        docs (persisted so the emptiness probe and the append write share one
        computation), a blind append, then one equi-join to map signatures
        back to ids. The cache side carries just (content_hash, k longs)."""
        spark = docs.sparkSession
        hashed = docs.select(
            F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"),
            F.col(text_col),
        )
        cached = self._cached(spark)
        missing = hashed.dropDuplicates(["content_hash"])
        if cached is not None:
            missing = missing.join(cached.select("content_hash"),
                                   "content_hash", "left_anti")
        new_sigs = minhash_signature(
            missing, "content_hash", text_col, k=self.k, shingle_n=self.shingle_n
        ).persist()
        try:
            if new_sigs.count() > 0:
                new_sigs.write.mode("append").parquet(self.path)
            all_sigs = self._cached(spark)
            if all_sigs is None:
                # fresh store AND nothing new to write (empty input, or every
                # doc shorter than shingle_n tokens): no parquet exists yet.
                # new_sigs is an empty frame with the right schema.
                all_sigs = new_sigs
            return hashed.select(id_col, "content_hash").join(
                all_sigs, "content_hash"
            ).drop("content_hash")
        finally:
            new_sigs.unpersist(blocking=False)


@dataclass
class BucketedSignatureStore:
    """Metastore-backed sibling of SignatureStore (r6): the cache lives
    in a table BUCKETED BY content_hash, so the two per-run probes that
    touch it — the unseen-content anti-join and the signature map-back
    equi-join — never shuffle the corpus-sized cache side. Only the
    day's batch exchanges into the bucket partitioning: the asymmetric
    cost story (work ∝ batch) extended to shuffle bytes.

    Needs a persistent catalog (Hive/Glue/Unity) for the bucket metadata
    to survive sessions; on the local in-memory catalog the table is
    session-scoped (same caveat as sources/bucketed.py, and why the
    parquet SignatureStore remains the default). Appends MUST repeat the
    same bucket spec — enforced by bucketBy on every write.

    The default table name is parameter-scoped (``…_k{k}_n{shingle_n}``,
    mirroring SignatureStore's path scoping): different signature shapes
    must never share one cache — same-k different-shingle_n signatures
    are schema-identical, so an unscoped shared table would silently
    serve 3-shingle signatures to a 5-shingle run (r10 review). A caller
    passing an explicit ``table`` owns that consistency.
    """

    table: str | None = None
    n_buckets: int = 64
    k: int = 32
    shingle_n: int = 3

    def __post_init__(self):
        if self.table is None:
            self.table = f"minerva_signatures_k{self.k}_n{self.shingle_n}"

    def _cached(self, spark) -> DataFrame | None:
        if not spark.catalog.tableExists(self.table):
            return None
        # bucketed on content_hash ⇒ this dedup agg needs NO exchange
        return spark.table(self.table).dropDuplicates(["content_hash"])

    def signatures(self, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
        """Same contract and flow as SignatureStore.signatures; only the
        cache's physical layout differs (see class docstring)."""
        spark = docs.sparkSession
        hashed = docs.select(
            F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"),
            F.col(text_col),
        )
        cached = self._cached(spark)
        missing = hashed.dropDuplicates(["content_hash"])
        if cached is not None:
            missing = missing.join(cached.select("content_hash"),
                                   "content_hash", "left_anti")
        new_sigs = minhash_signature(
            missing, "content_hash", text_col, k=self.k, shingle_n=self.shingle_n
        ).persist()
        try:
            if new_sigs.count() > 0:
                (new_sigs.write
                 .bucketBy(self.n_buckets, "content_hash")
                 .sortBy("content_hash")
                 .mode("append")
                 .format("parquet")
                 .saveAsTable(self.table))
            all_sigs = self._cached(spark)
            if all_sigs is None:
                all_sigs = new_sigs
            return hashed.select(id_col, "content_hash").join(
                all_sigs, "content_hash"
            ).drop("content_hash")
        finally:
            new_sigs.unpersist(blocking=False)
