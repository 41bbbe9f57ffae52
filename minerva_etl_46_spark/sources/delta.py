"""Delta Lake upgrade path (import-gated; the jar is not in this image).

With Delta on the classpath, two engine pieces upgrade in place:
- `TrendStorePartStorage.upsert` → `MERGE INTO` keyed on
  (entity_id, ts) — no read-merge-write, ACID under concurrent writers.
- retention → `VACUUM` + `DELETE WHERE`, keeping time travel.

The parquet implementations remain the fallback and the semantics
reference (keep-latest == MERGE whenUpdate/whenInsert)."""

from __future__ import annotations

try:  # pragma: no cover - jar not present in the test image
    from delta.tables import DeltaTable  # type: ignore

    HAS_DELTA = True
except ImportError:
    DeltaTable = None
    HAS_DELTA = False


def merge_upsert(spark, target_path: str, staged, keys: list[str],
                 version_cols: list[str] | None = None) -> None:
    """MERGE-based upsert; raises with guidance when Delta is absent.

    ``version_cols`` mirrors operators.upsert.upsert_latest's ordering
    exactly (greater version wins, non-null beats null, full tie → staged
    row wins — ON CONFLICT DO UPDATE semantics): without the matched-update
    condition, MERGE would overwrite with STALE staged rows and diverge
    from the parquet keep-latest path (tests/test_delta_upsert.py asserts
    the parity wherever the jar exists). The staged side must already be
    one row per key (run upsert_latest(None, staged, ...) first); MERGE
    rejects duplicate source matches."""
    if not HAS_DELTA:
        raise ImportError(
            "delta-spark is not on the classpath; use "
            "TrendStorePartStorage.upsert (parquet keep-latest) instead, or "
            "add the delta-spark package + spark.sql.extensions config"
        )
    cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)  # pragma: no cover
    merge = (DeltaTable.forPath(spark, target_path).alias("t")  # pragma: no cover
             .merge(staged.alias("s"), cond))
    if version_cols:  # pragma: no cover
        # lexicographic "staged >= stored" on the version tuple, matching
        # desc_nulls_last + staged-wins-ties in the window ordering
        clauses, ties = [], []
        for v in version_cols:
            newer = f"(s.{v} > t.{v} OR (s.{v} IS NOT NULL AND t.{v} IS NULL))"
            prefix = " AND ".join(ties)
            clauses.append(f"({prefix} AND {newer})" if prefix else newer)
            ties.append(f"s.{v} <=> t.{v}")
        clauses.append(" AND ".join(ties))  # full tie: staged row replaces
        merge = merge.whenMatchedUpdateAll(condition=" OR ".join(clauses))
    else:  # pragma: no cover
        merge = merge.whenMatchedUpdateAll()
    merge.whenNotMatchedInsertAll().execute()  # pragma: no cover
