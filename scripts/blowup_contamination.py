"""Scale ladder for contamination_check: deterministic synthetic
training corpora (same generator as blowup_pipeline) against a fixed
2,000-doc "benchmark", with verbatim benchmark copies planted at 1% of
the corpus CAPPED at the benchmark size (so the 1M point plants 2,000
= 0.2%; the printed flagged count is the ground truth).  Each point:
one warmup rep, then a steady-state rep.

Usage: python scripts/blowup_contamination.py [n_docs ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from blowup_pipeline import synth_corpus  # noqa: E402
from dask_histogram_spark.operators import contamination_check  # noqa: E402
from dask_histogram_spark.session import get_spark  # noqa: E402

BENCH_DOCS = 2_000


def main() -> None:
    points = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark("blowup-contam", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    # benchmark = a fixed small corpus from a DISJOINT id range —
    # shifted BEFORE text generation (word choice hashes the id), so
    # the only shared grams are the planted verbatim copies below
    bench = synth_corpus(spark, BENCH_DOCS, dup_rate=0.0,
                         id_offset=10_000_000).cache()
    bench.count()
    for n in points:
        train = synth_corpus(spark, n, dup_rate=0.0)
        # plant verbatim benchmark copies: 1% of the corpus, capped at
        # the benchmark size (2,000) — so the 1M-doc point plants 0.2%,
        # not 1%; the printed flagged count is the ground truth
        n_plant = min(max(n // 100, 1), BENCH_DOCS)
        planted = bench.limit(n_plant).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
        corpus = train.unionByName(planted).localCheckpoint()
        for tag in ("warm", "steady"):
            t0 = time.perf_counter()
            agg = (
                contamination_check(corpus, bench, n=3, threshold=0.5)
                .agg(F.count(F.lit(1)).alias("docs"),
                     F.sum("contaminated").alias("flagged"),
                     F.sum("n_hits").alias("hits"))
                .collect()[0]
            )
            wall = time.perf_counter() - t0
            print(f"{n} docs [{tag}]: {wall:.2f}s  scanned={agg.docs} "
                  f"flagged={agg.flagged} hits={agg.hits} "
                  f"({agg.docs / wall / 1000:.1f}k docs/s)")
        corpus.unpersist()


if __name__ == "__main__":
    main()
