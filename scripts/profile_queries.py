"""Per-query phase profile: Python-side plan-construction wall,
collect wall, and the number of Spark jobs each invocation triggers
(driver-side actions embedded in query construction are pure per-rep
overhead at bench time).

Usage: python scripts/profile_queries.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_histogram_spark.queries import (  # noqa: E402
    BENCH_VARIANTS,
    QUERIES,
    get_tables,
)
from dask_histogram_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or bench.BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dhs-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tables = get_tables(spark, sf_dir)
    for name in ("lineitem", "orders", "customer", "events", "documents",
                 "embeddings"):
        tables[name] = tables[name].cache()
        tables[name].count()

    tracker = sc.statusTracker()

    def njobs() -> int:
        return len(tracker.getJobIdsForGroup(None) or [])

    print(f"{'query':30s} {'build_s':>8s} {'collect_s':>10s} "
          f"{'jobs_build':>10s} {'jobs_collect':>12s}")
    for name in names:
        fn = BENCH_VARIANTS.get(name, QUERIES[name])
        fn(spark, sf_dir).collect()  # warmup
        j0 = njobs()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        j1 = njobs()
        df.collect()
        t2 = time.perf_counter()
        j2 = njobs()
        print(f"{name:30s} {t1 - t0:8.3f} {t2 - t1:10.3f} "
              f"{j1 - j0:10d} {j2 - j1:12d}")
    spark.stop()


if __name__ == "__main__":
    main()
