"""Scale check for mix_corpora (BASELINE.md "mix blowup"): the
docstring claims the token mixture hits the target weights in
EXPECTATION with ~1/sqrt(docs) concentration — measure the achieved
proportions at corpus scale instead of trusting the claim.

Three synthetic sources with unequal sizes and doc lengths (so rates
differ and token mass, not row count, is what must land): deterministic
generation, no RNG state.

Usage: python scripts/blowup_mix.py [n_docs_base ...]   (default 10M)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from dask_histogram_spark.operators import mix_corpora  # noqa: E402
from dask_histogram_spark.session import get_spark  # noqa: E402

WEIGHTS = {"web": 0.5, "code": 0.25, "books": 0.25}
# sizes x mean doc length chosen so 'code' binds (smallest T/w)
SHAPE = {"web": (1.0, 40), "code": (0.3, 25), "books": (0.5, 120)}


def src(spark: SparkSession, name: str, n_base: int):
    frac, mean_len = SHAPE[name]
    n = int(n_base * frac)
    return (spark.range(n).withColumnRenamed("id", "doc_id")
            # deterministic per-doc length around the mean
            .withColumn("n_tokens",
                        (F.pmod(F.xxhash64("doc_id", F.lit(name)),
                                F.lit(mean_len)) + mean_len // 2 + 1)
                        .cast("long")))


def run_point(spark: SparkSession, n_base: int) -> None:
    srcs = {name: src(spark, name, n_base) for name in WEIGHTS}
    t0 = time.perf_counter()
    mixed = mix_corpora(srcs, WEIGHTS, seed=41)
    got = {r["mix_source"]: r["tok"] for r in
           mixed.groupBy("mix_source")
           .agg(F.sum("n_tokens").alias("tok")).collect()}
    wall = time.perf_counter() - t0
    total = sum(got.values())
    rels = {s: abs(got[s] / total - WEIGHTS[s]) / WEIGHTS[s]
            for s in WEIGHTS}
    print(
        f"n_base={n_base:>10,}  total_tokens={total:,}  wall={wall:5.1f}s  "
        + "  ".join(f"{s}={got[s]/total:.5f} (rel_err {rels[s]:.2e})"
                    for s in WEIGHTS),
        flush=True,
    )


def main() -> None:
    points = [int(a) for a in sys.argv[1:]] or [10_000_000]
    spark = get_spark("blowup_mix", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    print(f"weights={WEIGHTS} shape={SHAPE}")
    for n in points:
        run_point(spark, n)


if __name__ == "__main__":
    main()
