"""SparkSession factory with the engine's required configuration.

Spec: BASELINE.json:6 — "explicit salting + AQE skew handling",
"vectorized Arrow/pandas UDFs"; SURVEY.md §4 config table.

All knobs are set here once so tests, jobs, bench, and the driver
harness share identical semantics. Designed for a multi-executor
cluster; in this sandbox we run local[N] and scale
``spark.sql.shuffle.partitions`` to the core count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _core_count(master: str | None) -> int:
    if master and master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or 8
        try:
            return int(inner)
        except ValueError:
            return os.cpu_count() or 8
    return os.cpu_count() or 8


def configure(builder: SparkSession.Builder, cores: int) -> SparkSession.Builder:
    """Apply engine configs to an existing builder (used by bench/jobs)."""
    return (
        builder
        # Shuffle sized to parallelism: at cluster scale this would be
        # ~2-3x total cores; AQE coalesces small partitions back down.
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
        # AQE on with skew-join splitting — required by BASELINE.json:6.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow everywhere: pandas UDF transfer + toPandas.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Deterministic timestamp behaviour for replay determinism.
        .config("spark.sql.session.timeZone", "UTC")
        # Broadcast small dims automatically (10MB default is fine, be
        # explicit so the plan is stable across Spark versions).
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        # Don't let tiny local runs create thousands of output files.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("MERLIN_DRIVER_MEM", "8g"))
    )


def get_spark(
    app_name: str = "merlin-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default all
    cores) in the sandbox; on a real cluster the job is launched via
    ``spark-submit --py-files`` and master comes from the submit command
    (BASELINE.json:14), in which case pass ``master=None`` and we do not
    override it.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
    cores = _core_count(master)
    builder = configure(builder, cores)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def prewarm_python_workers(spark: SparkSession, n: int | None = None) -> None:
    """Fork one Python worker per slot and pay its heavy imports
    (pyarrow, pandas) BEFORE a timed section: the first Python-backed
    job of a session otherwise spends ~10 s of fleet-wide worker
    startup inside the measurement window. Same class of warmup as the
    JVM JIT — call it right before benchmarked replays."""

    def _warm(_it):
        import pandas  # noqa: F401
        import pyarrow.parquet  # noqa: F401

        yield 0

    sc = spark.sparkContext
    k = (n or sc.defaultParallelism) * 2
    sc.parallelize(range(k), k).mapPartitions(_warm).count()
