"""Bucketed range join (SURVEY.md §2.3 J8 — the scale path).

Semantics: match (l, r) where l.key == r.key AND
r.ts ∈ (l.ts + lower_s, l.ts + upper_s].

A naive conditional join shuffles on the key alone, so one hot key degrades
to a per-key cross product (quadratic in that key's rows). Bucketizing adds
the TIME BUCKET to the join key: each right row lives in exactly one bucket
of width B = upper_s − lower_s; each left row's window overlaps at most two
buckets, so the left side explodes ×2 and the equi-join runs on
(key, bucket). Per-task pair counts are bounded by rows-per-(key, bucket) —
time-uniform data stays linear no matter how hot the key. The exact range
predicate filters inside the bucket match (no duplicates possible: a right
row's bucket is unique).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
) -> DataFrame:
    """Inner bucketed range join; returns left columns + right columns.
    Requires lower_s < upper_s. right_ts ∈ (left_ts+lower_s, left_ts+upper_s]."""
    if not lower_s < upper_s:
        raise ValueError("lower_s must be < upper_s")
    bsize = upper_s - lower_s
    # TIMESTAMP hop first: Spark 4 refuses NTZ→numeric, and NTZ→LTZ is an
    # identity under the engine's pinned UTC session timezone
    l_epoch = F.col(left_ts).cast("timestamp").cast("long")
    r_epoch = F.col(right_ts).cast("timestamp").cast("long")

    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor((l_epoch + lower_s) / bsize),
                F.floor((l_epoch + upper_s) / bsize),
            )
        ),
    )
    rb = right.withColumn("__bucket", F.floor(r_epoch / bsize))
    # exact predicate on the RAW timestamps (µs precision): the second-cast
    # is only safe for bucket assignment (an integer multiple of B can never
    # fall inside the sub-second truncation gap), not for the boundary test
    lo = F.col(left_ts) + F.expr(f"INTERVAL {lower_s} SECONDS")
    hi = F.col(left_ts) + F.expr(f"INTERVAL {upper_s} SECONDS")
    joined = lb.join(rb, [key, "__bucket"], "inner").filter(
        (F.col(right_ts) > lo) & (F.col(right_ts) <= hi)
    )
    return joined.drop("__bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_s: int,
) -> DataFrame:
    """Inner overlap join of half-open intervals: pairs (l, r) sharing
    ``key`` where [l_start, l_end) ∩ [r_start, r_end) ≠ ∅.

    Scale shape: each interval explodes onto the time buckets it spans
    and the join runs on (key, bucket) — per-task pair counts bounded by
    intervals-per-(key, bucket), like the range join. An interval pair
    can share MANY buckets; instead of a corpus-scale ``distinct`` to
    dedup the multi-bucket matches, each pair is emitted exactly once by
    BUCKET OWNERSHIP: only the bucket containing max(l_start, r_start)
    emits. That instant lies inside both intervals whenever they overlap,
    so both sides exploded its bucket — one emission, no dedup pass, no
    second shuffle.

    ``bucket_s`` trades explode fan-out (long intervals → many buckets)
    against bucket population; size it near the typical interval length.
    Timestamps are compared at µs precision; inputs may be TIMESTAMP,
    TIMESTAMP_NTZ, or epoch-second longs (normalized via the TIMESTAMP
    hop, see functions/timestamps.ensure_timestamp).

    Degenerate intervals: an EMPTY half-open interval [t, t) intersects
    nothing — [a,b)∩[c,d)≠∅ ⟺ max(a,c) < min(b,d), and the simplified
    two-comparison predicate used after the bucket join assumes non-empty
    operands (an empty [t,t) would otherwise phantom-match any interval
    spanning t). Inverted intervals (end < start) would additionally make
    the bucket F.sequence descend and explode garbage buckets. Both are
    filtered out up front, making the operator's semantics exactly
    max(start) < min(end) for every input."""
    bus = bucket_s * 1_000_000  # bucket width in µs

    def us(col: str):
        return F.unix_micros(F.col(col).cast("timestamp"))

    # empty/inverted intervals overlap nothing; drop before the explode
    left = left.filter(us(l_start) < us(l_end))
    right = right.filter(us(r_start) < us(r_end))

    lb = left.withColumn(
        "__bucket",
        F.explode(
            # half-open end: the bucket of (end − 1µs) is the last spanned
            F.sequence(F.floor(us(l_start) / bus),
                       F.floor((us(l_end) - 1) / bus))
        ),
    )
    rb = right.withColumn("__bucket", F.explode(
        F.sequence(F.floor(us(r_start) / bus),
                   F.floor((us(r_end) - 1) / bus))
    ))
    overlap = (us(l_start) < us(r_end)) & (us(r_start) < us(l_end))
    owner = F.floor(F.greatest(us(l_start), us(r_start)) / bus)
    return (
        lb.join(rb, [key, "__bucket"], "inner")
        .filter(overlap & (F.col("__bucket") == owner))
        .drop("__bucket")
    )
