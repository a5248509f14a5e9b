"""Scale ladder for cross-run incremental span dedup (BASELINE.md
"span incremental" table): the seen corpus's window-gram count table
is persisted ONCE (write_span_gram_table, bucketed on h), then a
nightly 10k batch probes it — 5,000 exact re-crawls of seen docs
(every word must strip: the corpus holds the first occurrence),
2,500 half-overlap revisions (the copied 8-word prefix strips, the
fresh 8-word tail survives: with n=6 the 3 pure-prefix windows are
corpus-duplicated, covering exactly words 0..7), and 2,500 fresh
docs (nothing strips).  Expected removals are exact arithmetic,
asserted per class.

The claim under test: batch wall is FLAT in seen-corpus size (the
probe joins the bucketed table with no seen-side exchange and the
dup set is batch-bounded), while the one-time table build scales
with the corpus.

Usage: python scripts/blowup_span_incremental.py [seen_sizes ...]
Defaults to 100k and 1M.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from dask_histogram_spark.operators import (  # noqa: E402
    remove_duplicate_spans_incremental,
    write_span_gram_table,
)
from dask_histogram_spark.session import get_spark  # noqa: E402

WORDS = 16
N = 6
BATCH = 10_000


def seen_corpus(spark: SparkSession, n_docs: int) -> DataFrame:
    ids = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    text = F.concat_ws(
        " ", *[F.concat(F.lit("w"), (F.col("doc_id") * WORDS + k))
               for k in range(WORDS)])
    return ids.withColumn("text", text)


def batch_corpus(spark: SparkSession, n_seen: int) -> DataFrame:
    """10k batch over DISJOINT ids >= 10^10: re-crawls copy seen doc
    (i % n_seen)'s words; revisions copy its first 8 words + 8 fresh;
    fresh docs use words no seen doc has."""
    b = spark.range(BATCH).withColumnRenamed("id", "k")
    base = (F.col("k") % n_seen) * WORDS
    fresh = F.lit(10_000_000_000) + F.col("k") * WORDS
    cls = F.col("k") % 4  # 0,1 -> recrawl; 2 -> revision; 3 -> fresh
    words = [
        F.when(cls <= 1, F.concat(F.lit("w"), base + k))
        .when((cls == 2) & F.lit(k < 8), F.concat(F.lit("w"), base + k))
        .otherwise(F.concat(F.lit("w"), fresh + k))
        for k in range(WORDS)
    ]
    return b.select(
        (F.lit(10_000_000_000) + F.col("k")).alias("doc_id"),
        F.concat_ws(" ", *words).alias("text"),
        cls.alias("cls"))


def run_point(spark: SparkSession, n_seen: int) -> None:
    print(f"=== seen={n_seen} ===", flush=True)
    shuffle_parts = max(32, (n_seen * (WORDS + 1)) // 8_000_000)
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
    tbl = f"spanline_{n_seen}"
    tmp = tempfile.mkdtemp(prefix="dhs_spaninc_")
    t0 = time.perf_counter()
    write_span_gram_table(seen_corpus(spark, n_seen), tbl, n=N,
                          path=os.path.join(tmp, "t"))
    t_build = time.perf_counter() - t0

    batch = batch_corpus(spark, n_seen).localCheckpoint()
    t0 = time.perf_counter()
    out = remove_duplicate_spans_incremental(batch, tbl)
    per_cls = {r["cls"]: (r["rm"], r["docs"]) for r in
               out.groupBy("cls").agg(
                   F.sum("n_removed_words").alias("rm"),
                   F.count("*").alias("docs")).collect()}
    t_probe = time.perf_counter() - t0

    n_rec = per_cls[0][1] + per_cls[1][1]
    n_rev, n_fresh = per_cls[2][1], per_cls[3][1]
    # re-crawls strip all 16 words; revisions exactly their 8-word
    # copied prefix (pure-prefix windows cover words 0..7); fresh 0
    assert per_cls[0][0] + per_cls[1][0] == 16 * n_rec, per_cls
    assert per_cls[2][0] == 8 * n_rev, per_cls
    assert per_cls[3][0] == 0, per_cls
    print(f"build (once) {t_build:.1f} s | probe 10k batch "
          f"{t_probe:.2f} s — re-crawls {n_rec} stripped whole, "
          f"revisions {n_rev} stripped exactly their copied prefix, "
          f"fresh {n_fresh} untouched", flush=True)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}__params")
    # external tables: DROP removes catalog entries only — reclaim
    # the parquet data too or each ladder point leaks its gram table
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    points = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark("blowup-span-inc", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    for n in points:
        run_point(spark, n)


if __name__ == "__main__":
    main()
