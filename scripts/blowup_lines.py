"""Scale-blowup protocol for LINE-granularity dedup (round-9; the
RefinedWeb/Dolma form): synthetic corpus of L unique lines per doc
(line text derived from doc_id, so zero organic duplication), a
shared footer LINE planted on every 5th doc.  n=1 keep_first removal
must delete exactly one line from every planted doc but the globally
first; policy='all' from every planted doc.  Broadcast and join plans
asserted EQUAL (removed-line count + summed crc32 of cleaned text).

Usage: python scripts/blowup_lines.py [n_docs ...]   (default 1M)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from dask_histogram_spark.operators import (  # noqa: E402
    dup_span_stats,
    remove_duplicate_spans,
)
from dask_histogram_spark.session import get_spark  # noqa: E402

FOOTER = "copyright footer all rights reserved contact admin"
LINES = 8


def synth(spark: SparkSession, n_docs: int) -> DataFrame:
    ids = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    # each line: "line w<unique> body" — unique corpus-wide
    text = F.concat_ws(
        "\n", *[F.concat(F.lit("line w"),
                         (F.col("doc_id") * LINES + k),
                         F.lit(" body")) for k in range(LINES)])
    text = F.when(F.col("doc_id") % 5 == 0,
                  F.concat(text, F.lit("\n" + FOOTER))).otherwise(text)
    return ids.withColumn("text", text)


def run_point(spark: SparkSession, n_docs: int) -> None:
    print(f"=== n_docs={n_docs} ===", flush=True)
    est = n_docs * (LINES + 1)
    df = synth(spark, n_docs)
    planted = (n_docs + 4) // 5

    t0 = time.perf_counter()
    s = dup_span_stats(df, n=1, min_df=2, granularity="line",
                       est_windows=est)
    n_dup_docs = s.filter("n_dup_windows > 0").count()
    t_stats = time.perf_counter() - t0
    assert n_dup_docs == planted, (n_dup_docs, planted)

    def removal(plan: str, policy: str = "keep_first"):
        t0 = time.perf_counter()
        r = remove_duplicate_spans(df, n=1, min_df=2, policy=policy,
                                   plan=plan, granularity="line",
                                   est_windows=est)
        agg = r.agg(
            F.sum("n_removed_words").alias("rm"),
            F.sum(F.crc32(F.col("clean_text"))).alias("ck")).first()
        return time.perf_counter() - t0, int(agg["rm"]), int(agg["ck"])

    t_bc, rm_bc, ck_bc = removal("broadcast")
    t_jn, rm_jn, ck_jn = removal("join")
    assert rm_bc == rm_jn == planted - 1, (rm_bc, rm_jn, planted)
    assert ck_bc == ck_jn
    t_all, rm_all, _ = removal("broadcast", policy="all")
    assert rm_all == planted, (rm_all, planted)
    print(f"line-dedup: stats {t_stats:.2f} s ({n_dup_docs} dup docs) "
          f"| keep_first broadcast {t_bc:.2f} s / join {t_jn:.2f} s "
          f"(equal: {rm_bc} lines, ck match) | all {t_all:.2f} s",
          flush=True)


def main() -> None:
    points = [int(a) for a in sys.argv[1:]] or [1_000_000]
    spark = get_spark("blowup-lines")  # cpus: SPARK_GRAFT_CPUS default
    spark.sparkContext.setLogLevel("ERROR")
    for n in points:
        run_point(spark, n)


if __name__ == "__main__":
    main()
