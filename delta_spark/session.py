"""SparkSession builder with the engine's recommended local-mode
config. On a real cluster most of these come from spark-submit conf;
the ones that matter for the CDC replay shape:

  * shuffle partitions ≈ cores (a micro-batch's collapse shuffle has no
    business creating 200 tiny partitions locally)
  * files.maxPartitionBytes small enough that the changelog scan
    parallelizes (default 128m coalesces a few-hundred-MB replay into
    ~2 map tasks — measured 2x end-to-end cost)
  * AQE on (runtime coalescing + skew splitting)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _export_package_path() -> None:
    """Make ``delta_spark`` importable to EVERY python worker the JVM
    spawns, however the package was shipped. ``spark-submit
    --py-files delta_spark.zip`` puts the zip on the DRIVER's sys.path
    and ships it to executor task workers, but the driver-side
    streaming PLANNING worker (python_streaming_source_runner, used by
    the deltaspark DataSource's stream reader) receives no python
    includes from the JVM — it falls back to the PYTHONPATH it
    inherited. The Python driver launches the JVM, so exporting the
    package's own location into PYTHONPATH BEFORE session creation
    reaches every descendant worker. No-op when the JVM already exists
    (in-process test sessions import from the checkout anyway)."""
    import delta_spark

    root = os.path.dirname(os.path.dirname(os.path.abspath(delta_spark.__file__)))
    # zipimport: __file__ is "<...>/delta_spark.zip/delta_spark/__init__.py"
    # and the dirname chain lands on the zip itself — exactly what
    # PYTHONPATH needs in that case too.
    existing = os.environ.get("PYTHONPATH", "")
    if root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{root}{os.pathsep}{existing}" if existing else root
        )


def build_session(
    cpus: int | None = None,
    app_name: str = "delta_spark",
    driver_mem: str | None = None,
    max_partition_bytes: str | None = None,
    extra: dict | None = None,
) -> SparkSession:
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    _export_package_path()
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Size shuffle partitions by DATA, not cores: start high and let
        # AQE coalesce down (it can merge small partitions but can never
        # split an oversized one). With the static max(cpus, 8) the
        # 16M-event replay's per-task aggregation state outgrew its
        # share of the unified memory pool exactly when tasks ran
        # concurrently — measured 2.6x end-to-end (393 s -> 154 s at
        # local[4]) from this one setting. At cluster scale this is the
        # difference between spilling reducers and right-sized ones.
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "1024")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE coalesce INSIDE cached plans too: with the default
        # (false), any .persist() subtree compiles without AQE and its
        # shuffles run at the full initialPartitionNum — every action
        # over the cache then pays ~1024-task scheduling for
        # kilobyte-sized control-plane frames (matview advance folds,
        # recompute refills). The flag only lets a cached plan's output
        # partitioning differ from the uncached one, which nothing in
        # this engine relies on.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
        )
        .config(
            "spark.sql.files.maxPartitionBytes",
            max_partition_bytes
            or os.environ.get("BENCH_MAX_PARTITION_BYTES", "16m"),
        )
        .config("spark.driver.memory", driver_mem or os.environ.get("BENCH_DRIVER_MEM", "48g"))
        # G1 (the JVM default) collapses under this workload's
        # allocation pattern on the sandbox VM: measured 6x slower
        # end-to-end than ParallelGC on an identical replay (and wildly
        # erratic). Throughput GC is the right choice for batch anyway.
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.sql.session.timeZone", "UTC")
        # micros-annotated int64 timestamps (not legacy INT96): INT96
        # carries no parquet min/max statistics, which would blind the
        # manifest column-bounds stats + row-group skipping on ts
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # the deltaspark Python DataSource (lake/datasource.py) prunes
        # partitions/files from pushed filters; Spark refuses a reader
        # that defines pushFilters unless this is on
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    return s
