"""SparkSession builders tuned for the CDC workload.

Scale stance (SURVEY.md §4): at 10^10 events on a real cluster the
same confs apply — AQE on (runtime re-plan + skew-join splitting),
Arrow exchange on (all Python UDFs are vectorized), shuffle
partitions sized to the parallelism level.  In the sandbox we run
local[N]; N is also used to size shuffle partitions so the scaling
benchmark (local[8] vs local[32]) exercises real parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "dipper_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # 2x cores: enough waves for AQE coalescing to matter without
        # tiny-task overhead at sandbox scale. On a 1000-executor
        # cluster this would be O(2 * total cores).
        shuffle_partitions = max(2 * cores, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # keep post-shuffle partitions small enough that Arrow-UDF stages
        # retain parallelism (default 64m coalesces small stages onto
        # 1-2 cores, serializing the Python workers)
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        # split parquet scans below one-file granularity (WAL chunk files
        # carry multiple row groups)
        .config("spark.sql.files.maxPartitionBytes", "16m")
        # Round 6: the default 4 MB open-cost floors split size at 4 MB,
        # so a table smaller than cores x 4 MB scans on a handful of
        # tasks — CPU-heavy per-row work over small-ish files (the
        # embeddings cosine kernel) then serializes.  1 MB still
        # penalizes tiny-file packing (guide §6) while letting small
        # hot tables use the full parallelism; parameterised like every
        # scale-dependent knob here.
        .config("spark.sql.files.openCostInBytes",
                os.environ.get("DIPPER_OPEN_COST_BYTES", str(1 << 20)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # parquet scans: vectorized reader on (default, pinned explicitly)
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        # local mode runs everything in one JVM: size the heap for
        # `cores` concurrent tasks' shuffle/agg buffers (8g with 32
        # threads measured GC-bound: 2x slower merges)
        .config("spark.driver.memory", os.environ.get("DIPPER_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def get_or_create(spark: SparkSession | None = None) -> SparkSession:
    return spark if spark is not None else build_session()
