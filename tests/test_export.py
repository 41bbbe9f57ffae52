"""Training-export verbs: packing edge cases the oracle parity run can't
isolate (oversized docs, bin-boundary exactness, determinism across
partitionings)."""

from __future__ import annotations

from pyspark.sql import functions as F

from minerva_etl_46_spark.operators.export import pack_sequences, shard_assign


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_greedy_boundaries(spark):
    # one shard (n_shards=1); token counts: 3, 4, 2, 10, 1 with limit 6:
    # [3] -> fill 3; +4 > 6 -> bin1 fill 4; +2 = 6 (NOT > limit) stays bin1;
    # +10 > 6 -> bin2 alone (oversized doc occupies its own bin); +1 > 6
    # (fill 10) -> bin3.
    rows = [(1, "a a a"), (2, "b b b b"), (3, "c c"),
            (4, " ".join(["d"] * 10)), (5, "e")]
    out = pack_sequences(_docs(spark, rows), "doc_id", "text",
                         n_shards=1, max_tokens=6).toPandas()
    got = out.sort_values("bin")[["bin", "n_docs", "total_tokens"]].values.tolist()
    assert got == [[0, 1, 3], [1, 2, 6], [2, 1, 10], [3, 1, 1]]


def test_pack_deterministic_across_partitionings(spark):
    rows = [(i, " ".join(["w"] * (i % 17 + 1))) for i in range(200)]
    d1 = _docs(spark, rows).repartition(1)
    d2 = _docs(spark, rows).repartition(16)
    a = pack_sequences(d1, "doc_id", "text").toPandas() \
        .sort_values(["shard", "bin"]).reset_index(drop=True)
    b = pack_sequences(d2, "doc_id", "text").toPandas() \
        .sort_values(["shard", "bin"]).reset_index(drop=True)
    assert a.equals(b), "packing must not depend on input partitioning"


def test_shard_assign_stable_and_bounded(spark):
    d = shard_assign(_docs(spark, [(i, "x") for i in range(100)]),
                     "doc_id", n_shards=16)
    vals = [r["shard"] for r in d.select("shard").collect()]
    assert all(0 <= v < 16 for v in vals)
    again = [r["shard"] for r in d.select("shard").collect()]
    assert vals == again


# ---- pure greedy-walk properties (no Spark) ----

from hypothesis import given, strategies as st

from minerva_etl_46_spark.operators.export import greedy_bins


@given(st.lists(st.integers(min_value=1, max_value=100), max_size=200),
       st.integers(min_value=1, max_value=64))
def test_greedy_bins_invariants(tokens, limit):
    bins = greedy_bins(tokens, limit)
    assert len(bins) == len(tokens)
    if not tokens:
        return
    # bins are 0-based, contiguous, non-decreasing
    assert bins[0] == 0
    assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
    # a bin's total exceeds the limit ONLY when it is a single oversized doc
    from collections import defaultdict
    totals, sizes = defaultdict(int), defaultdict(int)
    for t, b in zip(tokens, bins):
        totals[b] += t
        sizes[b] += 1
    for b, tot in totals.items():
        assert tot <= limit or sizes[b] == 1
    # no unnecessary bin break: consecutive bins can't be merged
    starts = {b: i for i, b in reversed(list(enumerate(bins)))}
    for b in range(1, max(bins) + 1):
        assert totals[b - 1] + tokens[starts[b]] > limit
