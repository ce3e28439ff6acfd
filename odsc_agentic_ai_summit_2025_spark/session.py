"""SparkSession factory.

Local testing runs on ``local[N]`` but every config default is chosen
for the scale-out case (AQE on, shuffle partitions sized, Arrow on for
the pandas-UDF slow path, UTC session tz for timestamp parity with the
reference's tz normalization at build_graph.py:181-187).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "odsc_spark_engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    On a real cluster, ``master``/memory come from spark-submit; local
    runs default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Size-targeted AQE coalescing with a SMALL advisory (guide
        # §2.2: let AQE coalesce, derive partitioning from data, not
        # a constant). The first r13 probe rejected parallelismFirst=
        # false at the guide's 64 MB advisory because that collapsed
        # byte-small but CPU-DENSE post-shuffle stages onto one core
        # (q63 4.9 s → 19.4 s). The flag was not the problem — the
        # advisory was: at 1 MB, CPU-dense stages keep multi-task
        # parallelism while the ~cpus-task scheduling tax on every
        # tiny shuffle stage (~0.2-0.4 s of wall per stage measured
        # on 200-row graph/dedup frames) disappears. Measured across
        # 44 inventory queries r13: wins up to −1.6 s (q38), −1.0
        # (q78), −0.7 (q100), −0.6 (q97), one +0.3 (q82), rest flat
        # or better. At production scale the INITIAL shuffle
        # partition count (spark.sql.shuffle.partitions, env-tunable
        # below) still sizes real partitions in the 100 MB-1 GB
        # range; a 1 MB advisory only merges crumb partitions and
        # can never split, so the cluster plan shape is unchanged.
        # SPARK_GRAFT_ADVISORY_MB=64 restores the guide baseline for
        # cluster profiles where reduce-side crumbs are impossible.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            "false",
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_MB", "1") + "m",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Fresh python worker per task: with reuse on, Spark 4.1's
        # idle-worker pool intermittently hands later Arrow stages a
        # stale worker whose handshake stalls the whole stage 10-30 s
        # (measured: a kNN query after an IVF query went 5 s → 15-36 s;
        # reuse=false removes the stall for a ~100 ms/task fork cost,
        # noise for the seconds-long kernel tasks this engine runs).
        .config("spark.python.worker.reuse", "false")
    )
    # With reuse=false every task forks a fresh worker; the dominant
    # fork cost is importing numpy/pandas/pyarrow (~300 ms). Forking
    # from a daemon that PRELOADED them (copy-on-write) keeps the
    # fresh-worker semantics at ~10 ms/task. Guarded: only set when
    # this interpreter can import the module (workers share the
    # interpreter/path in local mode; on a cluster ship the package).
    import importlib.util

    if importlib.util.find_spec(
        "odsc_agentic_ai_summit_2025_spark.daemon_preload"
    ):
        builder = builder.config(
            "spark.python.daemon.module",
            "odsc_agentic_ai_summit_2025_spark.daemon_preload",
        )
    builder = (
        builder
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
