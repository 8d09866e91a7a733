"""SparkSession factory tuned for the crawl-and-extract workload.

Scale notes (100 TB / 1000-executor design intent):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting
  (mega-host frontier skew), and dynamic join-strategy switches.
- Arrow on: every Python stage in this engine is a vectorized pandas UDF /
  mapInPandas; Arrow batch transfer is mandatory for throughput.
- shuffle.partitions is a local-mode default; on a real cluster set it to
  ~2-3x total cores or rely on AQE coalescing from a high initial value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crawl4ai-custom-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master.startswith("local[") is False and master != "local" and cpus:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # ParallelGC: ~2x on wide-row Arrow pipelines vs default G1 in
        # local mode (high allocation rate from 10-100KB string columns)
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def spread_scan(df, bytes_per_task: int = 256 * 1024,
                max_parallelism: int | None = None):
    """Repartition a scan whose physical layout under-feeds the CPU-bound
    stage it drives (optimization guide §2.5, "input skew: one huge
    unsplittable file ... repartition immediately after the read").

    Single-ROW-GROUP parquet is the unsplittable case that actually bites
    this engine: Spark plans splits by byte range but assigns each row
    group to the split holding its midpoint, so a 50k-row table written as
    one row group feeds exactly ONE task no matter what
    maxPartitionBytes says — and every per-row-expensive stage downstream
    (mapInPandas kernels, HOF cosine folds, tokenize+explode chains) runs
    on one core.

    Target = min(cores, size_bytes / bytes_per_task), from Catalyst's own
    file-scan statistics (one JVM call, no job): tiny frames keep their
    single partition instead of paying a 32-way shuffle, mid-size tables
    spread proportionally, and inputs that already carry enough partitions
    are returned unchanged. Non-file-backed plans (huge/sentinel
    estimates) fall back to the actual pre-AQE partition count."""
    spark = df.sparkSession
    cores = max_parallelism or spark.sparkContext.defaultParallelism
    try:
        size_bytes = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        size_bytes = None
    if size_bytes is not None and size_bytes < (1 << 60):
        target = min(cores, max(1, size_bytes // bytes_per_task))
    else:
        target = cores
    if target <= 1:
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def local_df(spark: SparkSession, rows: list, ddl: str):
    """Small driver-side literal tables via the Arrow fast path.

    ``createDataFrame(list_of_tuples)`` round-trips through
    ``parallelize`` + a Python-worker deserialization stage — seconds of
    worker-spinup for a handful of rows. Routing the same data through a
    pandas DataFrame uses Arrow straight into the JVM (no Python workers),
    ~10x faster for the tiny state/stat tables this engine materializes.
    An empty ``rows`` builds a zero-row relation JVM-side.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL(ddl) if isinstance(ddl, str) else ddl
    if not rows:
        return spark.range(0).select(*[
            F.lit(None).cast(f.dataType).alias(f.name) for f in schema.fields
        ])
    pdf = pd.DataFrame(rows, columns=[f.name for f in schema.fields])
    return spark.createDataFrame(pdf.astype("object"), schema=schema)
