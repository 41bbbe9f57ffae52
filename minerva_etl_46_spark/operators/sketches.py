"""Mergeable frequency sketches (SURVEY.md §2.4 A25): count–min over
DataFrames — build, merge, estimate — for key spaces too large to count
exactly at 100 TB (per-URL/per-shingle/per-user frequencies feeding
heavy-hitter caps and mixture weights).

The sketch is a (seed, bucket) → count grid of d hash rows × w buckets:
- build is ONE hash-agg over a d×-seed-exploded scan; map-side partial
  aggregation collapses mapper output to ≤ d·w rows before the exchange,
  so the shuffle ships the GRID, never the key space;
- grids from different days/partitions MERGE by cell-wise count sum
  (same contract as the HLL partials and histogram bins —
  tests prove merge(build(A), build(B)) == build(A ∪ B) exactly);
- a key's estimate is the MIN over its d cells: never an undercount,
  overcount bounded by collisions (≈ N/w per row, Pr[all d collide]
  shrinks geometrically in d).

Hashing is pluggable: ``hash_fn="xxhash64"`` (default — JVM codegen,
production) or ``"md5"`` (hex-prefix arithmetic DuckDB replays exactly —
the oracle-keyed variant, same swap note as the dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bucket(key_col, seed_col, w: int, hash_fn: str):
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(key_col.cast("string"),
                                 seed_col.cast("string")), F.lit(w))
    if hash_fn == "md5":
        return F.conv(
            F.substring(
                F.md5(F.concat_ws(
                    ":", key_col.cast("string"), seed_col.cast("string"))),
                1, 8),
            16, 10,
        ).cast("long") % w
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def cms_build(df: DataFrame, key: str, d: int = 4, w: int = 256,
              hash_fn: str = "xxhash64") -> DataFrame:
    """(seed, bucket, cnt) grid over df[key]. One hash-agg; the exchange
    carries ≤ d·w rows.

    NULL keys are MISSING DATA, not sketchable values: the hash
    pre-image (key || ':' || seed) is undefined for them — the md5
    family yields a NULL bucket here and a cast error in the DuckDB
    replay — so they are excluded like every null observation in this
    engine (the similarity/dedup rule; r12b adversarial-events)."""
    seeds = F.array(*[F.lit(i) for i in range(d)])
    return (
        df.where(F.col(key).isNotNull())
        .select(F.col(key).alias("__k"), F.explode(seeds).alias("seed"))
        .select("seed",
                _bucket(F.col("__k"), F.col("seed"), w, hash_fn)
                .alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum — the mergeable-partial contract. All inputs must
    share (d, w, hash_fn); cells absent from a sketch contribute 0."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("seed", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(sketch: DataFrame, keys: DataFrame, key: str,
                 d: int = 4, w: int = 256,
                 hash_fn: str = "xxhash64") -> DataFrame:
    """Attach ``est_n`` (min over the key's d cells) to each row of
    `keys`. The sketch is grid-sized — broadcast into the probe join."""
    seeds = F.array(*[F.lit(i) for i in range(d)])
    probes = keys.select(
        "*", F.explode(seeds).alias("seed")
    ).withColumn("bucket",
                 _bucket(F.col(key), F.col("seed"), w, hash_fn))
    others = [c for c in keys.columns]
    # LEFT join + coalesce(0): a probed key whose (seed, bucket) cell is
    # absent from the grid was never counted — its cell count is 0, so the
    # key must still yield a row with est_n from min-over-d including that
    # 0 (an inner join would drop the key entirely, and a partial match
    # would inflate min over only the surviving cells past the CMS bound).
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
        .groupBy(*others)
        .agg(F.min("cnt").alias("est_n"))
    )
