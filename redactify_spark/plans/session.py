"""SparkSession factory with the configuration this engine assumes.

Tuned for the sandbox (local[N], single JVM) but every setting is the
one we'd ship to a 1000-executor cluster: AQE on (coalesce + skew-join),
Arrow enabled for all pandas UDF traffic, and shuffle partitions sized
to cores locally (on a real cluster leave it to AQE's coalescing from a
higher initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app_name: str = "redactify-spark",
                  master: str | None = None,
                  shuffle_partitions: int | None = None,
                  extra_conf: dict | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # Make the package importable on executor python workers regardless of
    # the caller's cwd.  On a real cluster this is `spark-submit --py-files
    # redactify_spark.zip`; locally we extend PYTHONPATH (inherited by the
    # forked workers) and set executorEnv for completeness.
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else ""))
    if shuffle_partitions is None:
        # local mode: match cores; cluster mode: start high, AQE coalesces
        n = master[master.find("[") + 1:master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if not n.isdigit() else int(n)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_WAREHOUSE_DIR",
                               "/tmp/redactify_spark_warehouse"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
