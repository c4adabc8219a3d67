"""SparkSession factory with the engine's recommended configuration.

Tuned for the translate-enrich-route workload: Arrow-batched pandas UDFs,
AQE with skew-join splitting, partition sizing that holds at large scale
(SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "logstash-filter-translate-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", "local[*]")
    cpus = os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(max(cpus, 8)))
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime re-plan, shuffle coalescing, skew-join splitting
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for every pandas UDF hop; batch size sized for wide
        # html:binary rows (≈ a few MB per batch, not GB)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # scans: 128 MB split targets hold at 100 TB (≈ 800k tasks, fine for
        # a 1000-executor cluster); local runs simply produce fewer tasks
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # ParallelGC: the workload is throughput-bound codegen stages with
        # heavy short-lived allocation (strings/arrays) and no pause-time
        # requirement — beats the G1 default by 10-33% on every interleaved
        # A/B (see BENCH/BASELINE.md). Overridable via extra_conf.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UseParallelGC -XX:ParallelGCThreads="
            + str(min(16, max(4, cpus))),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
