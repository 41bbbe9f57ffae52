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


def merge_upsert(spark, target_path: str, staged, keys: list[str]) -> None:
    """MERGE-based upsert; raises with guidance when Delta is absent."""
    if not HAS_DELTA:
        raise ImportError(
            "delta-spark is not on the classpath; use "
            "TrendStorePartStorage.upsert (parquet keep-latest) instead, or "
            "add the delta-spark package + spark.sql.extensions config"
        )
    cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)  # pragma: no cover
    (DeltaTable.forPath(spark, target_path).alias("t")  # pragma: no cover
     .merge(staged.alias("s"), cond)
     .whenMatchedUpdateAll()
     .whenNotMatchedInsertAll()
     .execute())
