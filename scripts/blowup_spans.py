"""Scale-blowup protocol for span-level dedup (BASELINE.md "span
blowup" table): two planted workloads over a deterministic synthetic
corpus of 16 unique words per doc (words derived from doc_id, so ZERO
organic duplication and every expected count is exact arithmetic):

1. BOILERPLATE: a shared 12-word suffix planted on every 5th doc.
   The dup-window set is 7 grams regardless of corpus size — the
   broadcast plan's home turf (zero-exchange rebuild scan).  Expected
   removals are exact: keep_first deletes 12 words from every planted
   doc but the globally first; policy='all' from every planted doc.

2. PAIR-DUP: every doc in the second half is a verbatim copy of its
   first-half twin (min_df=2, strict dedup).  The dup set is
   ~n/2 x 11 grams — far beyond any broadcast — so this exercises the
   JOIN plan at scale: removable positions shuffle back and the text
   meets them in one sort-merge join.  keep_first empties exactly the
   second half (16 words each).

Both plans are asserted EQUAL on the boilerplate workload (total
removed words + summed crc32 of the cleaned text), so the table is a
plan-cost comparison, not wall-clock luck.

Usage: python scripts/blowup_spans.py [n_docs ...]   (default 1M)
SPAN_SKIP_PAIR=1 runs the boilerplate workload only (the pair-dup
leg's dup set is ~5.5 grams/doc — at 100M docs that is a 550M-gram
join-plan stress with no new information over the 10M point).
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

BOILER = ("all rights reserved contact the site admin team "
          "for removal requests today")  # 12 words
WORDS = 16
N = 6


def synth(spark: SparkSession, n_docs: int, plant_boiler: bool,
          pair_dup: bool) -> DataFrame:
    ids = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    base = F.col("doc_id") % (n_docs // 2) if pair_dup else F.col("doc_id")
    text = F.concat_ws(
        " ", *[F.concat(F.lit("w"), (base * WORDS + k))
               for k in range(WORDS)])
    if plant_boiler:
        text = F.when(F.col("doc_id") % 5 == 0,
                      F.concat(text, F.lit(" " + BOILER))).otherwise(text)
    return ids.withColumn("text", text)


def run_point(spark: SparkSession, n_docs: int) -> None:
    print(f"=== n_docs={n_docs} ===", flush=True)
    # NO script-side shuffle sizing (round-9): the ~8M-groups/task
    # spill-aware sizing that rescued the first 100M attempt now
    # lives INSIDE the operators (_dup_grams est_windows) — this
    # script passes the rows estimate like any 100 TB caller would
    # and the session's shuffle partitions stay at their default.
    est = n_docs * (WORDS + 1)

    # --- workload 1: boilerplate (broadcast plan) ---
    df = synth(spark, n_docs, plant_boiler=True, pair_dup=False)
    t0 = time.perf_counter()
    s = dup_span_stats(df, n=N, min_df=2, est_windows=est)
    n_dup_docs = s.filter("n_dup_windows > 0").count()
    t_stats = time.perf_counter() - t0
    planted = (n_docs + 4) // 5
    assert n_dup_docs == planted, (n_dup_docs, planted)

    def removal(plan: str, policy: str = "keep_first"):
        t0 = time.perf_counter()
        r = remove_duplicate_spans(df, n=N, min_df=2, policy=policy,
                                   plan=plan, est_windows=est)
        agg = r.agg(
            F.sum("n_removed_words").alias("rm"),
            F.sum(F.crc32(F.col("clean_text"))).alias("ck")).first()
        return time.perf_counter() - t0, int(agg["rm"]), int(agg["ck"])

    t_bc, rm_bc, ck_bc = removal("broadcast")
    t_jn, rm_jn, ck_jn = removal("join")
    assert rm_bc == rm_jn == 12 * (planted - 1), (rm_bc, rm_jn, planted)
    assert ck_bc == ck_jn
    t_all, rm_all, _ = removal("broadcast", policy="all")
    assert rm_all == 12 * planted, (rm_all, planted)
    print(f"boiler: stats {t_stats:.2f} s ({n_dup_docs} dup docs) | "
          f"keep_first broadcast {t_bc:.2f} s / join {t_jn:.2f} s "
          f"(equal: {rm_bc} words, ck match) | all {t_all:.2f} s",
          flush=True)

    if os.environ.get("SPAN_SKIP_PAIR"):
        return

    # --- workload 2: pair-dup (join plan at a corpus-sized dup set) ---
    # base = doc_id % (n//2) maps n - n//2 docs onto the first half;
    # with odd n one original gains two copies — expected counts below
    # use (n - half) so any point size is exact
    df2 = synth(spark, n_docs, plant_boiler=False, pair_dup=True)
    t0 = time.perf_counter()
    r2 = remove_duplicate_spans(df2, n=N, min_df=2, policy="keep_first",
                                plan="join", est_windows=est)
    agg = r2.agg(
        F.sum("n_removed_words").alias("rm"),
        F.sum(F.when(F.col("clean_text") == "", 1).otherwise(0))
         .alias("emptied")).first()
    t_pair = time.perf_counter() - t0
    half = n_docs // 2
    copies = n_docs - half
    assert int(agg["rm"]) == WORDS * copies, agg
    assert int(agg["emptied"]) == copies, agg
    print(f"pair-dup: join {t_pair:.2f} s — emptied exactly the "
          f"copies ({copies} docs, {WORDS * copies} words), "
          f"dup set ~{half * (WORDS - N + 1)} grams", flush=True)


def main() -> None:
    points = [int(a) for a in sys.argv[1:]] or [1_000_000]
    if any(p < 2 for p in points):
        raise SystemExit("points must be >= 2 (pair-dup halves the corpus)")
    spark = get_spark("blowup-spans", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    for n in points:
        run_point(spark, n)


if __name__ == "__main__":
    main()
