"""Row hashing for attribute change detection (SURVEY.md §2.8 F5).

Minerva stores an md5 hash of the textual concatenation of an attribute
row's values and skips history inserts when the hash is unchanged
[ref: attribute_directory hash column — UNVERIFIED [H], SURVEY.md §2.5 W4].

md5 is used (not xxhash64) wherever a hash value crosses the engine
boundary into the DuckDB oracle — md5 over identical pre-image strings
is bit-identical in both engines. xxhash64 stays internal (LSH banding)
where only *equality within Spark* matters.

Pre-image construction (r10 review — the old ``concat_ws('|', …)`` was
AMBIGUOUS: ('a|b','c') and ('a','b|c') concatenated identically, and a
NULL collided with the literal sentinel string, so genuine attribute
changes could be silently suppressed by the SCD store):

    component_i = md5( nullflag_i || coalesce(cast(c_i as string), '') )
    row_hash    = md5( concat_ws('|', component_1, …, component_n) )

where nullflag is '0' for NULL and '1' otherwise. Components are fixed
32-hex strings, so no value separator can leak between columns, and the
flag distinguishes NULL from every real string including ''.

Cross-engine caveat: the parity claim holds for integer / string /
decimal columns (identical cast-to-string in Spark and DuckDB). DOUBLE
columns may format differently between engines (Spark '1.0E-7' vs
DuckDB '1e-07') — hash doubles only after an explicit round-trip-stable
cast (e.g. decimal) on BOTH sides.

Migration note: this pre-image supersedes the pre-r10 one, so stored
``__h`` values from an older deployment all read as "changed" on the
first append after an upgrade — one redundant history row per entity,
then steady state (compact() removes them).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _component(c: Column) -> Column:
    flag = F.when(c.isNull(), F.lit("0")).otherwise(F.lit("1"))
    return F.md5(F.concat(flag, F.coalesce(c.cast("string"), F.lit(""))))


def row_hash(*cols: Column | str) -> Column:
    """md5 over the unambiguous per-column-hashed pre-image above.

    Oracle SQL equivalent: sql_row_hash (keep the two in LOCKSTEP — the
    driver gate compares their outputs value-for-value)."""
    parts = [_component(F.col(c) if isinstance(c, str) else c) for c in cols]
    return F.md5(F.concat_ws("|", *parts))


def sql_row_hash(*exprs: str) -> str:
    inner = ", ".join(
        "md5(concat(case when {e} is null then '0' else '1' end, "
        "coalesce(cast({e} as varchar), '')))".format(e=e)
        for e in exprs
    )
    return f"md5(concat_ws('|', {inner}))"
