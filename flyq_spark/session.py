"""SparkSession factory tuned for this engine.

Local mode is the test target; the configs are chosen so the same plans
scale to a real cluster: AQE for runtime re-plans (skew joins, partition
coalescing), shuffle partitions sized to cores not the 200 default, Arrow
for the few Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flyq_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    # The GEMM-backed operators run numpy inside one Python worker PER
    # CORE; letting BLAS also spawn a thread pool per worker
    # oversubscribes cores^2 and thrashes nondeterministically (observed
    # 3s -> 30s on the blocked-GEMM near-dup join). One BLAS thread per
    # worker is the correct parallelism: Spark owns the core fan-out.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # explicit (it defaults on under AQE): the corpus-frequency
        # equi-joins (duplicate_spans, rare_token_stats, surprisal) rely
        # on skew-split to spread Zipfian head keys across reducers
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # INT96 (the default) has no usable footer min/max stats; retention
        # and stats-pruning need real timestamp statistics.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
