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
