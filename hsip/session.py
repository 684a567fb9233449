"""SparkSession factory with the configs the pipeline assumes.

Scale posture (SURVEY.md §4): AQE on (skew-join split + partition
coalescing), Arrow on (every Python crossing is columnar), UTC session
timezone (oracle comparability), shuffle partitions sized to parallelism
and rescaled by the bench harness for the N→4N scaling runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hsip-dedup",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # Under spark-submit the gateway JVM is already up (PythonRunner
    # exports PYSPARK_GATEWAY_PORT) and spark.master / --conf flags live
    # in its conf. Forcing local[*] here would silently override
    # `spark-submit --master yarn` — the exact deployment shape the spec
    # requires (BASELINE.json: "runs via spark-submit --py-files on
    # multi-executor clusters") — so in that mode the builder inherits
    # the submitted master and get_spark only FILLS GAPS: shuffle
    # partitions are derived from the cluster's real parallelism after
    # startup, and only when no --conf pinned them.
    submitted = (
        master is None
        and "HSIP_MASTER" not in os.environ
        and "PYSPARK_GATEWAY_PORT" in os.environ
    )
    master = master or os.environ.get("HSIP_MASTER", "local[*]")
    if shuffle_partitions is None and not submitted:
        # derive from parallelism: 2x cores is a good local-mode default;
        # on a real cluster this is set to ~2-3x total executor cores.
        cores = os.cpu_count() or 8
        if master.startswith("local[") and master[6:-1].isdigit():
            cores = int(master[6:-1])
        elif master.startswith("local-cluster["):
            # local-cluster[nWorkers,coresPerWorker,memMB] — total cores,
            # so the N vs 4N executor runs get proportional partitioning
            # exactly like a real cluster would
            n, c = master[len("local-cluster["):-1].split(",")[:2]
            cores = int(n) * int(c)
        shuffle_partitions = max(8, 2 * cores)

    builder = (
        SparkSession.builder
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # the pipeline submits the three candidate channels as CONCURRENT
        # jobs from separate threads (hsip/pipeline.py); FAIR scheduling
        # lets their many short shuffle stages interleave and backfill
        # idle task slots instead of queueing whole jobs FIFO — the main
        # lever against last-wave straggler idle at small executor counts
        # (BENCH/BASELINE.md decomposition of the 0.60 scaling number)
        .config("spark.scheduler.mode", "FAIR")
    )
    if not submitted:
        builder = builder.master(master)
        # driver memory is a pre-JVM-launch setting: meaningful only when
        # this process starts the JVM; under spark-submit use
        # --driver-memory instead.
        builder = builder.config(
            "spark.driver.memory", os.environ.get("HSIP_DRIVER_MEM", "24g")
        )
        if shuffle_partitions is not None:
            builder = builder.config(
                "spark.sql.shuffle.partitions", str(shuffle_partitions)
            )
    elif shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    if not submitted and master.startswith(("local", "local-cluster")):
        # Don't hold task slots hostage to cache locality: the pipeline is
        # many short shuffle stages over cached frames, and the 3s default
        # locality wait leaves executors idle for whole task waves
        # (event-log measured: ~8 stages x 6-10s wall at ~0.2s max task
        # time on local-cluster[4,1]). On local masters "remote" reads are
        # loopback, so this is pure win; on REAL clusters (YARN/K8s over
        # HDFS) node-local scheduling matters, so the default is kept
        # there — set spark.locality.wait via extra_conf to tune it.
        builder = builder.config("spark.locality.wait", "0s")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    sc = spark.sparkContext
    if (
        submitted
        and shuffle_partitions is None
        and not sc.getConf().contains("spark.sql.shuffle.partitions")
    ):
        # no --conf pinned it: size to the cluster actually granted
        # (defaultParallelism = total executor cores once registered)
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(8, 2 * sc.defaultParallelism)),
        )
    sc.setLogLevel("WARN")
    return spark
