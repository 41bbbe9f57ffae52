"""KPI arithmetic helpers (SURVEY.md §2.8 F1, F7, F8).

Minerva KPI views lean on a null-safe division function so a zero or NULL
denominator yields NULL instead of an error
[ref: minerva schema fn safe_division — UNVERIFIED [H], SURVEY.md §2.8 F1].

Cross-engine determinism (oracle parity, FIXTURES.md "Oracle-parity notes"):
double summation order differs between Spark partitions and DuckDB, and
ROUND(double) has engine-dependent boundary behavior, so the rule is:

  1. snap each element to DECIMAL(38,s) at the input (deterministic
     nearest-rounding of a double; exact ties are measure-zero for real
     data),
  2. SUM the decimals — exact, order-insensitive in both engines,
  3. cast the exact total back to double (correctly-rounded, identical),
  4. any further arithmetic is element-wise double ops on identical
     operands — deterministic. NEVER a final ROUND on a double.

This defines the engine's aggregate semantics (sums at fixed decimal
resolution) — matching the reference, whose counters are integers/numerics
in PostgreSQL anyway [SURVEY.md §1.2].
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Value snap scale: 4 decimal places covers the fixtures' money-like and
# gauge doubles; products (v*w) get the same scale after multiplication.
DEC = "decimal(38,4)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def safe_divide(numerator: Column | str, denominator: Column | str) -> Column:
    """NULL when denominator is 0 or NULL — PostgreSQL-error-free KPI math.

    Works identically under ANSI on/off because the zero case is guarded
    before the division executes.
    """
    num, den = _col(numerator), _col(denominator)
    return F.when(den.isNotNull() & (den != 0), num / den)


def dsum(c: Column | str | Column) -> Column:
    """Deterministic (order-insensitive, cross-engine exact) sum of doubles.

    Oracle SQL mirror: sql_dsum().
    """
    return F.sum(_col(c).cast(DEC)).cast("double")


def davg(c: Column | str) -> Column:
    """Deterministic average: exact decimal sum / count, divided in double.

    Oracle SQL mirror: sql_davg().
    """
    col = _col(c)
    return F.sum(col.cast(DEC)).cast("double") / F.count(col)


def dsum_expr(expr: Column) -> Column:
    """Deterministic sum of a per-row double *expression* (e.g. v*w).

    The per-row expression evaluates in double (deterministic per row),
    snaps to decimal, then sums exactly.
    """
    return F.sum(expr.cast(DEC)).cast("double")


def weighted_avg(value: Column | str, weight: Column | str) -> Column:
    """sum(v*w)/sum(w), each sum exact-decimal; NULL if total weight is 0."""
    v, w = _col(value), _col(weight)
    num = F.sum((v * w).cast(DEC)).cast("double")
    den = F.sum(w.cast(DEC)).cast("double")
    return F.when(den != 0, num / den)


# ---- Oracle-side templates mirroring the above — keep in one place so a
# query and its oracle can never drift apart.

def sql_dsum(expr: str) -> str:
    return f"cast(sum(cast(({expr}) as decimal(38,4))) as double)"


def sql_davg(expr: str) -> str:
    return f"cast(sum(cast(({expr}) as decimal(38,4))) as double) / count({expr})"


def sql_weighted_avg(value: str, weight: str) -> str:
    num = f"cast(sum(cast((({value}) * ({weight})) as decimal(38,4))) as double)"
    den = f"cast(sum(cast(({weight}) as decimal(38,4))) as double)"
    return f"case when {den} <> 0 then {num} / {den} end"


def sql_safe_div(num: str, den: str) -> str:
    return f"case when ({den}) is not null and ({den}) <> 0 then ({num}) / ({den}) end"
