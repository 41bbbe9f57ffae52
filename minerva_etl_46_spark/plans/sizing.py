"""Capacity arithmetic as code (SCALE.md "Deploying at 100 TB"): the
runbook's sizing rules, executable — so a deployment starts from the
measured trade-offs instead of re-deriving them. `minerva plan` prints
the result; tests pin the worked example the runbook states.

Every rule here mirrors a measured probe shape (SCALE.md):
- scan tasks sized so one task's working set stays ≈1 GiB under the
  widest operator (the per-entity window sorts);
- shuffle partition count sized off POST-COMBINE rollup bytes (map-side
  partial agg caps mapper output at |entities|×|buckets| rows, not raw
  rows) with AQE coalescing below the static ceiling;
- bucket counts sized so one bucket of the larger join side lands in
  the 128–256 MB band.
"""

from __future__ import annotations

import math
from dataclasses import asdict, dataclass

MB = 1024 * 1024
GB = 1024 * MB
TB = 1024 * GB

#: post-combine rollup row width (entity_id + bucket + a few decimal
#: accumulators), the shuffle payload unit of the rollup family
ROLLUP_ROW_BYTES = 100
#: target bytes per shuffle partition (SCALE.md: 64 MB keeps reducer
#: working sets comfortable under the window sorts)
SHUFFLE_TARGET = 64 * MB
#: parquet file / scan split target
FILE_TARGET = 128 * MB


@dataclass(frozen=True)
class ClusterShape:
    executors: int = 1000
    cores_per_executor: int = 4
    mem_gib_per_executor: int = 16


@dataclass(frozen=True)
class SizingPlan:
    daily_gb: float
    files_per_day: int
    n_buckets: int                    # bucketed recurring-join tables
    shuffle_partitions_per_day: int   # AQE coalesces below this
    shuffle_partitions_static: int    # set high for multi-day backfills
    max_partition_bytes: int
    total_cores: int
    gib_per_core: float
    warnings: tuple[str, ...] = ()

    def spark_confs(self) -> dict[str, str]:
        return {
            "spark.sql.shuffle.partitions":
                str(self.shuffle_partitions_static),
            "spark.sql.files.maxPartitionBytes":
                str(self.max_partition_bytes),
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
        }

    def to_dict(self) -> dict:
        d = asdict(self)
        d["spark_confs"] = self.spark_confs()
        return d


def _pow2_in_band(total_bytes: float, hi: int = 256 * MB) -> int:
    """Smallest power of two with per-bucket size ≤ hi. Halving from hi
    can only land in [hi/2, hi], so the result sits in the 128–256 MB
    band whenever total_bytes ≥ hi; below that (tiny deployments) the
    answer is 1 bucket and size_plan emits a small-deployment warning."""
    n = 1
    while total_bytes / n > hi:
        n *= 2
    return n


def size_plan(
    total_tb: float,
    retention_days: int = 365,
    entities: int = 10_000_000,
    buckets_per_day: int = 24,
    cluster: ClusterShape = ClusterShape(),
) -> SizingPlan:
    """The runbook arithmetic for a trend-store deployment: `total_tb`
    compressed over `retention_days`, rolled up per (entity, bucket)."""
    daily_bytes = total_tb * TB / retention_days
    files_per_day = max(1, math.ceil(daily_bytes / FILE_TARGET))
    n_buckets = _pow2_in_band(daily_bytes)

    post_combine = entities * buckets_per_day * ROLLUP_ROW_BYTES
    # floor at one partition per core (cluster utilization), else sized
    # by post-combine shuffle bytes; AQE coalesces under-filled ones
    total_cores = cluster.executors * cluster.cores_per_executor
    per_day = max(total_cores, math.ceil(post_combine / SHUFFLE_TARGET))
    static = per_day * 10  # multi-day backfill headroom; AQE shrinks

    gib_per_core = cluster.mem_gib_per_executor / cluster.cores_per_executor
    max_pb = FILE_TARGET if gib_per_core >= 4 else 64 * MB

    warnings = []
    if daily_bytes < 128 * MB:
        warnings.append(
            f"daily volume {daily_bytes / MB:.0f} MB is below the 128 MB "
            "bucket floor — 1 bucket; bucketing buys nothing at this size")
    if gib_per_core < 2:
        warnings.append(
            f"{gib_per_core:.1f} GiB/core is below the 2 GiB floor the "
            "window-sort working sets assume; expect spill")
    if entities > 50_000_000:
        warnings.append(
            "entity-sized frames (retention cohorts, MAD medians) exceed "
            "any broadcast budget at this cardinality — they are unhinted "
            "by design; verify AQE plans shuffle joins for them")
    return SizingPlan(
        daily_gb=round(daily_bytes / GB, 1),
        files_per_day=files_per_day,
        n_buckets=n_buckets,
        shuffle_partitions_per_day=per_day,
        shuffle_partitions_static=static,
        max_partition_bytes=max_pb,
        total_cores=cluster.executors * cluster.cores_per_executor,
        gib_per_core=round(gib_per_core, 2),
        warnings=tuple(warnings),
    )
