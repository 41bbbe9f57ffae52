"""Skew-resilient equi-join (SURVEY.md §2.3 hot-key hardening).

Spark's own answers to key skew — broadcast the small side, or AQE's
runtime skew-join splitting — cover most cases; ``salted_join`` is the
explicit fallback for the remainder: the build side is too big to
broadcast, AND the skew is known a priori (AQE only splits after
materializing the skewed shuffle blocks) or the job needs a deterministic
partitioning (e.g. a stage feeding a stateful sink where re-planned
partitioning would break checkpoint alignment).

Mechanics: probe-side rows scatter across ``n_salt`` sub-keys; the build
side replicates n_salt×. A key holding p% of all rows caps any single
task at p/n_salt of the data — the classic salting trade: n_salt× more
build-side shuffle volume buys an n_salt× cap reduction on the hottest
task. Pick n_salt ≈ (hot-key share) / (acceptable per-task share).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    salt: Column,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left ⋈ right`` on ``on`` with ``n_salt``-way key
    salting. ``salt`` is a DETERMINISTIC integer expression over LEFT's
    columns (e.g. ``F.xxhash64("row_id")``) — never ``rand()``: a task
    retry that re-rolls the salt would route rows to a different
    replica and double- or zero-count them under speculative execution.
    The salt never appears in the output; results are identical to the
    unsalted join (property-tested in tests/test_properties.py).

    Probe-sided join types only: each LEFT row carries exactly one salt,
    so inner/left/left_semi/left_anti semantics are preserved. right/full
    outer would emit every unmatched BUILD row once per salt replica —
    rejected (swap the sides instead)."""
    if n_salt < 1:
        # sequence(0, n_salt-1) would DESCEND for n_salt <= 0, silently
        # replicating the build side under negative phantom salts
        raise ValueError(f"salted_join: n_salt must be >= 1, got {n_salt}")
    if how not in ("inner", "left", "leftouter", "left_outer",
                   "semi", "left_semi", "leftsemi",
                   "anti", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join: join type {how!r} would duplicate unmatched "
            "build-side rows across salt replicas; use a probe-sided type "
            "or swap the inputs"
        )
    keys = [on] if isinstance(on, str) else list(on)
    l = left.withColumn("__salt", F.pmod(salt, F.lit(n_salt)).cast("int"))
    # generators can't nest inside expressions (no cast around explode):
    # explode first, align the dtype in a second projection
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return l.join(r, [*keys, "__salt"], how).drop("__salt")
