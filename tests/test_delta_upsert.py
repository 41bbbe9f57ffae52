"""Delta MERGE upsert parity (VERDICT r02 item 5).

`sources/delta.py` gates a MERGE INTO upgrade for the S4 upsert path behind
a delta-spark import. This test proves the two implementations agree on the
same staged batch: parquet keep-latest (`upsert_latest`) == Delta MERGE
keyed on (entity_id, ts). Runs only when delta-spark is importable; this
image ships without the jar, so the skip prints the reason loudly.

MERGE precondition mirrored from the engine: the staged side must be
deduped to one row per key first (MERGE rejects duplicate source matches),
which is exactly `upsert_latest(None, staged, ...)` — the engine's own
keep-latest pass.
"""

from __future__ import annotations

import pytest

from minerva_etl_46_spark.operators.upsert import upsert_latest
from minerva_etl_46_spark.sources.delta import HAS_DELTA, merge_upsert

KEYS = ["entity_id", "ts"]


def _frames(spark):
    existing = spark.createDataFrame(
        [(1, 100, 10.0, 1), (1, 200, 11.0, 1), (2, 100, 20.0, 1)],
        "entity_id long, ts long, value double, job_id long",
    )
    staged = spark.createDataFrame(
        [
            (1, 200, 11.5, 2),   # update: newer job wins
            (2, 100, 19.0, 0),   # stale: older job loses
            (3, 100, 30.0, 2),   # insert
            (3, 100, 31.0, 3),   # same-key duplicate in batch: latest wins
        ],
        "entity_id long, ts long, value double, job_id long",
    )
    return existing, staged


def test_merge_upsert_guides_when_delta_absent(spark):
    if HAS_DELTA:
        pytest.skip("delta-spark present; the absence guidance is untestable")
    existing, staged = _frames(spark)
    with pytest.raises(ImportError, match="delta-spark"):
        merge_upsert(spark, "/tmp/nowhere", staged, KEYS)


@pytest.mark.skipif(
    not HAS_DELTA,
    reason="delta-spark not importable in this image; MERGE parity runs "
    "wherever the jar + spark.sql.extensions are configured",
)
def test_delta_merge_matches_parquet_keep_latest(spark, tmp_path):
    existing, staged = _frames(spark)
    want = (
        upsert_latest(existing, staged, KEYS, version_cols=["job_id"])
        .sort(*KEYS)
        .toPandas()
    )

    target = str(tmp_path / "delta_upsert")
    existing.write.format("delta").save(target)
    # MERGE requires one source row per key: run the engine's keep-latest
    # over the staged batch alone first (the same pre-pass cli.py does
    # before any store write)
    staged_latest = upsert_latest(None, staged, KEYS, version_cols=["job_id"])
    merge_upsert(spark, target, staged_latest, KEYS, version_cols=["job_id"])
    got = (
        spark.read.format("delta").load(target)
        .select(*want.columns).sort(*KEYS).toPandas()
    )
    assert got.equals(want), "Delta MERGE diverged from parquet keep-latest"
