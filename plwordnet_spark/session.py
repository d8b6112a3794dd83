"""SparkSession factory with scale-oriented defaults.

Local mode is a correctness harness; the configs are chosen so the same
logical plans behave well on a multi-executor cluster:

* AQE on (runtime coalesce, skew-join splitting) — the backup for the
  explicit salting the graph jobs do themselves,
* Arrow on — every Python touchpoint is an Arrow batch, never a row
  (BASELINE.json input_hint: "no per-row Python"),
* shuffle partitions sized to the parallelism level instead of the 200
  default, parameterized via env for the local[8]-vs-local[32] scaling
  runs.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]

_PACKAGE_DIR = os.path.dirname(os.path.abspath(__file__))


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executors — the local-mode equivalent of
    ``spark-submit --py-files`` (north rule launch mode). Without it,
    pandas-UDF workers started from another CWD can't unpickle functions
    defined in this package.

    The zip name carries a content token (package path + newest .py
    mtime), not just the pid: a pid-only name let a pid-recycled process
    from a different checkout (or an edited tree) reuse a stale zip and
    silently ship OLD worker code — observed as a cross-version
    KeyError in the CSR gather during r6 A/B measurement."""
    import hashlib

    newest = 0.0
    for root, _dirs, files in os.walk(_PACKAGE_DIR):
        for name in files:
            if name.endswith(".py"):
                try:
                    newest = max(newest, os.path.getmtime(os.path.join(root, name)))
                except OSError:
                    pass
    token = hashlib.sha256(f"{_PACKAGE_DIR}:{newest}".encode()).hexdigest()[:12]
    zip_path = os.path.join(
        tempfile.gettempdir(), f"plwordnet_spark_pyfiles_{os.getpid()}_{token}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(_PACKAGE_DIR):
                for name in files:
                    if not name.endswith(".py"):
                        continue
                    full = os.path.join(root, name)
                    rel = os.path.join(
                        "plwordnet_spark", os.path.relpath(full, _PACKAGE_DIR)
                    )
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)


def get_spark(
    app_name: str = "plwordnet-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the core count — on a real cluster
    this would be ~2-3x total cores; matching cores avoids tiny-partition
    overhead at local scale while AQE coalesces further at runtime.
    """
    if master is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = _parallelism_of(master)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark


def stop_spark() -> None:
    """Stop the active session if any (used between scaling runs)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()


def _parallelism_of(master: str) -> int:
    """Parse N out of local[N]; fall back to 32."""
    if master.startswith("local[") and master.endswith("]"):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or 32
        try:
            return int(inner)
        except ValueError:
            pass
    return 32
