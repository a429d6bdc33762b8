"""SparkSession factory.

Successor to the reference's ad-hoc ``SparkContext`` setup
(``/root/reference/train.py:12-27``, ``/root/reference/utils/misc.py:16-33``)
with a config surface designed for both local testing and a large cluster:

- AQE on (runtime coalescing, skew-join splitting, dynamic join strategy) —
  replaces the reference's manual 10 MiB partition sizing
  (``/root/reference/utils/misc.py:6,35-39``).
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE coalesces from an intentionally-high initial number.
- Arrow enabled for the few pandas-UDF boundaries.
- Session timezone pinned to UTC so results are reproducible across
  engines (the DuckDB oracle is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "yelp_recommender_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On ``local[N]`` one JVM hosts everything and ``spark.driver.memory``
    is the only memory knob; on a cluster the same code runs unchanged —
    all scale decisions live in the conf, not the operators.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local: ~cores. A cluster deployment would set this higher (or
        # rely on AQE initialPartitionNum) via extra_conf.
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
