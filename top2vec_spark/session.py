"""SparkSession construction helpers.

Local-mode sessions sized per the sandbox (local[N] threads, single
JVM); on a real cluster the same code runs unchanged under
spark-submit --py-files because nothing here assumes local mode —
these configs are safe cluster-side too.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    parallelism: int | None = None,
    app_name: str = "top2vec_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    parallelism None -> respect an already-running session or
    local[*]. Explicit N -> local[N] (used by the two-cluster-size
    scaling proxy, BASELINE.md).
    """
    cpus = parallelism or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cpus}]" if cpus else "local[*]"
    shuffle = shuffle_partitions or cpus or 32
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # v2 committer: task outputs move to the destination at task
        # commit instead of a serial driver-side rename pass at job
        # commit — the v1 rename loop is a hidden Amdahl term that
        # caps multi-core scaling of write-heavy stages
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    )
    # shuffle/spill on tmpfs when available — the single-box analogue
    # of per-node SSD scratch (disk ext4 serializes at high core counts)
    if os.path.isdir("/dev/shm"):
        builder = builder.config("spark.local.dir", "/dev/shm/spark-local")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
