"""Keyed snapshot diff (SURVEY.md §2.7 — the `minerva diff` data
comparison at row granularity [ref: src/commands/diff.rs — UNVERIFIED
[L]]).

``set_except`` answers "which whole rows differ"; reconciliation needs
more: WHICH keys were inserted / updated / deleted, with old and new
values side by side — the shape a store-repair job or a sync audit
consumes.

Scale shape: ONE full-outer shuffle join on the key set (inherent — both
sides must meet; co-locate with bucketing on the key to make it
shuffle-free for stored snapshots), then a null-safe column comparison in
the join filter. No window, no sort, no second pass.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def keyed_diff(old: DataFrame, new: DataFrame, keys: list[str],
               compare_cols: list[str]) -> DataFrame:
    """Classify every key present in either snapshot:

    - ``I`` (insert): key only in ``new``
    - ``D`` (delete): key only in ``old``
    - ``U`` (update): key in both, any compare col differs (null-safe)

    Unchanged keys are filtered out in the join output — the result is
    change-sized, not snapshot-sized. Returns keys + ``op`` +
    ``old_<c>`` / ``new_<c>`` for each compare column.

    NULL key columns: equi-join semantics — a null key never matches
    (SQL standard), so a null-keyed old row reports as ``D`` and a
    null-keyed new row as ``I``; they are never paired into a ``U``.
    Row presence is tracked via explicit flag columns, NOT key
    null-ness, so this classification stays correct for null keys."""
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("__o_present"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("__n_present"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [o[f"__ok_{k}"] == n[f"__nk_{k}"] for k in keys],
    )
    j = o.join(n, cond, "full_outer")
    in_old = o["__o_present"].isNotNull()
    in_new = n["__n_present"].isNotNull()
    changed = reduce(
        lambda a, b: a | b,
        [~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
         for c in compare_cols],
    )
    op = (
        F.when(~in_old, F.lit("I"))
        .when(~in_new, F.lit("D"))
        .otherwise(F.lit("U"))
    )
    out_keys = [
        F.coalesce(o[f"__ok_{k}"], n[f"__nk_{k}"]).alias(k) for k in keys
    ]
    return (
        j.filter(~in_old | ~in_new | changed)
        .select(*out_keys, op.alias("op"),
                *[F.col(f"old_{c}") for c in compare_cols],
                *[F.col(f"new_{c}") for c in compare_cols])
    )
