"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[N]``; the configuration is chosen so the
same logical plans scale to a real multi-executor cluster: AQE on (runtime
coalesce + skew-join handling), Arrow enabled for the pandas-UDF inference
path, UTC session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(
    app_name: str = "meetingcoach-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default ``*``).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark has no nanos
        # timestamp type — read as bigint nanos and convert (queries._events)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # many distinct codegen'd plans in one session (bench/correctness
        # suites) exhaust the default JVM code cache, stalling JIT/Janino —
        # first big query of each family then pays minutes, not seconds
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def cluster_scale_conf(
    target_tb: float = 100.0,
    executors: int = 1000,
    executor_cores: int = 4,
    executor_mem_gb: int = 16,
) -> dict[str, str]:
    """The documented knob set for running this engine's plans against a
    real cluster at ``target_tb`` — the sizing rationale the local
    configuration in :func:`get_spark` is a miniature of. Returns a conf
    dict to pass as ``extra_conf`` (or feed to spark-submit).

    Sizing rules (each keyed to a failure mode at scale):

    - ``shuffle.partitions``: target ~128-200 MB of shuffle input per
      task AFTER column pruning (~1/4 of scan bytes): too few -> spill
      and stragglers; too many -> scheduler overhead and tiny files.
      AQE coalescing trims the excess at runtime, so err high.
    - ``files.maxPartitionBytes`` 256m: scan tasks sized so a pruned
      read still amortizes task launch, without single-task skew.
    - ``advisoryPartitionSizeInBytes`` 128m / skew thresholds: AQE's
      split targets — a skewed LSH bucket or hot join key splits into
      ~128 MB chunks instead of one 30-minute task.
    - ``autoBroadcastJoinThreshold`` 64m: dims (nation/region/supplier,
      query-term sets, centroid tables, tier maps) broadcast; anything
      larger flows to the shuffle joins these plans already declare.
    - shuffle compression + zstd: shuffle bytes dominate cost at this
      scale; zstd trades ~5% CPU for ~30% fewer bytes over lz4.
    """
    shuffle_bytes = target_tb * (1024**4) / 4  # post-pruning estimate
    n_shuffle = max(2 * executors * executor_cores,
                    int(shuffle_bytes / (160 * 1024**2)))
    return {
        "spark.sql.shuffle.partitions": str(n_shuffle),
        "spark.sql.files.maxPartitionBytes": str(256 * 1024**2),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(128 * 1024**2),
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "3",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(
            256 * 1024**2
        ),
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024**2),
        "spark.io.compression.codec": "zstd",
        "spark.shuffle.compress": "true",
        "spark.executor.instances": str(executors),
        "spark.executor.cores": str(executor_cores),
        "spark.executor.memory": f"{executor_mem_gb}g",
        # streaming state + checkpoints must survive executor loss
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
    }
