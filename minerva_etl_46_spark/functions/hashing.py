"""Row hashing for attribute change detection (SURVEY.md §2.8 F5).

Minerva stores an md5 hash of the textual concatenation of an attribute
row's values and skips history inserts when the hash is unchanged
[ref: attribute_directory hash column — UNVERIFIED [H], SURVEY.md §2.5 W4].

md5 is used (not xxhash64) wherever a hash value crosses the engine
boundary into the DuckDB oracle — md5(concat_ws(...)) is bit-identical in
both engines. xxhash64 stays internal (LSH banding) where only *equality
within Spark* matters.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NULL_SENTINEL = "\x01"  # distinguishes NULL from empty string in the concat
# (\x01 not \x00: DuckDB varchars reject NUL bytes, and the oracle must
# build the identical pre-image — see sql_row_hash)


def row_hash(*cols: Column | str, sep: str = "|") -> Column:
    """md5 over the null-safe concatenation of the given columns.

    Oracle SQL equivalent:
      md5(concat_ws('|', coalesce(cast(c1 as varchar), chr(0)), ...))
    """
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(NULL_SENTINEL))
        for c in cols
    ]
    return F.md5(F.concat_ws(sep, *parts))


def sql_row_hash(*exprs: str, sep: str = "|") -> str:
    inner = ", ".join(f"coalesce(cast({e} as varchar), chr(1))" for e in exprs)
    return f"md5(concat_ws('{sep}', {inner}))"
