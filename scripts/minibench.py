"""Bench a SUBSET of the headline queries with bench.py's exact
methodology (cached tables, per-query warmup, median of N collect
reps) — the iteration instrument for optimization work, so a change's
effect is measured like the driver will measure it without paying for
the full 23-row run.

Usage: python scripts/minibench.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_REPS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_histogram_spark.queries import (  # noqa: E402
    BENCH_EXTRAS,
    BENCH_VARIANTS,
    QUERIES,
    get_tables,
)
from dask_histogram_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: minibench.py <query> [query ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_spark("dhs-minibench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    tables = get_tables(spark, sf_dir)
    for name in ("lineitem", "orders", "customer", "events", "documents",
                 "embeddings"):
        tables[name] = tables[name].cache()
        tables[name].count()

    # SPARK_GRAFT_BENCH_COLD=1: clear probe/plan memos before every
    # timed rep (bench.py's cold-invocation audit mode)
    cold = os.environ.get("SPARK_GRAFT_BENCH_COLD", "") == "1"
    from dask_histogram_spark.queries import clear_bench_memos

    timings, spreads = {}, {}
    for name in names:
        fn = BENCH_EXTRAS.get(name) or BENCH_VARIANTS.get(name,
                                                          QUERIES[name])
        fn(spark, sf_dir).collect()
        runs = []
        for _ in range(reps):
            if cold:
                clear_bench_memos()
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(round(time.perf_counter() - t0, 4))
        runs.sort()
        timings[name] = runs[len(runs) // 2]
        spreads[name] = runs
    print(json.dumps({"queries": timings, "spread": spreads,
                      "reps": reps, "cold": cold}))
    spark.stop()


if __name__ == "__main__":
    main()
