"""Dump .explain("formatted") for every bench query (or a named
subset) to plans/r16/<query>_<tag>.txt.

Usage: python scripts/capture_plans.py <tag> [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_histogram_spark.queries import (  # noqa: E402
    BENCH_VARIANTS,
    QUERIES,
    get_tables,
)
from dask_histogram_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or bench.BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", os.environ.get("DHS_PLANS_ROUND", "r16"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dhs-plans")
    spark.sparkContext.setLogLevel("ERROR")
    tables = get_tables(spark, sf_dir)
    for name in ("lineitem", "orders", "customer", "events", "documents",
                 "embeddings"):
        tables[name] = tables[name].cache()
        tables[name].count()
    for name in names:
        fn = BENCH_VARIANTS.get(name, QUERIES[name])
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
