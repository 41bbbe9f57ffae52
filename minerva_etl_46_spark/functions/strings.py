"""Distinguished-name parsing (SURVEY.md §2.8 F4) + JSON helpers (F6).

Minerva resolves vendor distinguished names like
``Network=NL,Node=RNC01,Cell=123`` into entity hierarchies
[ref: directory dn handling — UNVERIFIED [M], SURVEY.md §2.8 F4].
All built-ins — split/regexp stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dn_parts(dn: Column | str, sep: str = ",") -> Column:
    """Split a DN into its component array."""
    return F.split(_col(dn), sep)


def dn_part(dn: Column | str, index: int, sep: str = ",") -> Column:
    """1-based component access (element_at semantics; negative = from end)."""
    return F.element_at(F.split(_col(dn), sep), index)


def parent_dn(dn: Column | str, sep: str = ",") -> Column:
    """DN minus its last component — the parent entity's DN."""
    parts = F.split(_col(dn), sep)
    return F.array_join(F.slice(parts, 1, F.greatest(F.size(parts) - 1, F.lit(0))), sep)


def json_get(col: Column | str, key: str) -> Column:
    """Extract a top-level key from a JSON text column (Minerva jsonb
    ``extra_data``/``details`` analogue, SURVEY.md §2.8 F6)."""
    return F.get_json_object(_col(col), f"$.{key}")
