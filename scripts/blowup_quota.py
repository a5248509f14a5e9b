"""Scale-blowup protocol for quota_sample (BASELINE.md "quota blowup"
table): a head-heavy synthetic corpus — one mega-domain holding half
the rows, a Zipf-ish head, and a long uniform tail — capped at
N=1000 docs per domain by BOTH plans:

- method='window'  (naive row_number over the full input: everything
  shuffles, the mega-domain sorts in one task)
- method='auto'    (broadcast counts + Chernoff threshold prefilter:
  only ~groups x (N+margin) survivor rows reach the window exchange)

Both must select the IDENTICAL rows (asserted via a symmetric-
difference count, not wall-clock luck), so the table is a pure
plan-cost comparison.  Generation is distributed and deterministic
(domain from a doc_id split, no RNG state, no driver-side data).

Usage: python scripts/blowup_quota.py [n_rows ...]
Defaults to 1M and 10M.  Write output to a /tmp log when running
long points in the background.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from dask_histogram_spark.operators import quota_sample  # noqa: E402
from dask_histogram_spark.session import get_spark  # noqa: E402

N_PER_GROUP = 1000
TAIL_GROUPS = 10_000


def synth_corpus(spark: SparkSession, n_rows: int) -> DataFrame:
    """Head-heavy domain layout over ids 0..n-1:

    - ids < n/2                 -> 'mega' (one domain, half the corpus)
    - n/2 <= id < 3n/4          -> 'head<k>', k = id % 50 (50 domains,
                                   ~n/200 rows each)
    - else                      -> 'tail<k>', k = id % TAIL_GROUPS
                                   (~n/40000 rows each, most under cap)
    """
    ids = spark.range(n_rows).withColumnRenamed("id", "doc_id")
    return ids.withColumn(
        "source",
        F.when(F.col("doc_id") < n_rows // 2, F.lit("mega"))
        .when(F.col("doc_id") < 3 * n_rows // 4,
              F.concat(F.lit("head"), (F.col("doc_id") % 50)))
        .otherwise(F.concat(F.lit("tail"), (F.col("doc_id") % TAIL_GROUPS))),
    )


def run_point(spark: SparkSession, n_rows: int) -> None:
    df = synth_corpus(spark, n_rows)

    t0 = time.perf_counter()
    win = quota_sample(df, N_PER_GROUP, group_col="source", seed=13,
                       method="window")
    n_win = win.count()
    t_win = time.perf_counter() - t0

    t0 = time.perf_counter()
    auto = quota_sample(df, N_PER_GROUP, group_col="source", seed=13,
                        validate=False)
    n_auto = auto.count()
    t_auto = time.perf_counter() - t0

    t0 = time.perf_counter()
    quota_sample(df, N_PER_GROUP, group_col="source", seed=13)
    t_validate = time.perf_counter() - t0  # guard pass only (lazy result)

    diff = (win.select("doc_id").exceptAll(auto.select("doc_id")).count()
            + auto.select("doc_id").exceptAll(win.select("doc_id")).count())
    print(
        f"n={n_rows:>10,}  kept window={n_win:,} auto={n_auto:,} "
        f"symdiff={diff}  wall window={t_win:6.1f}s  auto={t_auto:6.1f}s "
        f"(x{t_win / t_auto:.1f})  auto+guard={t_validate:6.1f}s",
        flush=True,
    )
    assert diff == 0, "plans disagree"


def main() -> None:
    points = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    spark = get_spark("blowup_quota", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    print(f"cap N={N_PER_GROUP}/group, tail groups={TAIL_GROUPS}")
    for n in points:
        run_point(spark, n)


if __name__ == "__main__":
    main()
