"""Operator library (SURVEY.md §2) — DataFrame-plan builders.

Every operator returns a lazily-planned DataFrame; Catalyst owns physical
strategy. Shuffle discipline at 100 TB: rollups are single-shuffle
hash-aggregations with map-side partial agg; dimension/relation joins are
explicit broadcasts; as-of joins are one shuffle-sort, never a range
cross-product.
"""
