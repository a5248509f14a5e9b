"""Benchmark harness (driver contract): headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Methodology: one warmup action to absorb JVM/session startup, then
each query timed as plan-build + collect (results are sparse bin
tables / small row sets, so collect is the honest cost).  Each query
reports the MEDIAN of 3 timed runs taken immediately after its own
warmup run: single-shot timings at sf0.1 sit on Spark's ~0.2-0.3 s
per-job scheduling floor with +/-0.1-0.2 s scheduler/GC noise, and
the round-3/4 drift analysis (BASELINE.md) traced every apparent
sub-second "regression" to that noise.  The median kills the outlier
without hiding a real regression (a true slowdown moves all three
reps).  Per-run spreads are reported under "spread" for audit.

Reading round-over-round numbers: whole-RUN totals additionally swing
+/-30% with machine state (documented in BASELINE.md's round-6
steady-state check — an immediate identical re-run moved every
floor-bound entry 25-40%).  The protocol is: never conclude a
regression from ONE run's delta; re-run first, and only investigate a
slowdown that survives the re-run AND moves a specific query's all
three reps.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dask_histogram_spark.queries import (  # noqa: E402
    BENCH_EXTRAS,
    BENCH_VARIANTS,
    QUERIES,
    get_tables,
)
from dask_histogram_spark.session import get_spark  # noqa: E402

# Headline queries: histogram family core + each extension pillar.
BENCH_QUERIES = [
    "hist1d_double",
    "hist1d_weight",
    "hist1d_variable",
    "hist2d",
    "hist3d",
    "hist_strcat",
    "hist_mean",
    "hist_weighted_mean",
    "hist_multifill",
    "hist_arith",
    "hist_events_daily",
    "dedup_exact_stats",
    # cross-run dedup, both granularities (exact anti-join + the
    # persisted-signature-table LSH leg); the one-off signature-table
    # build is paid in the warmup rep, so the timed reps measure the
    # recurring nightly-batch cost
    "dedup_incremental",
    "text_stats",
    "text_language_id",
    "similarity_topk",
    "pipeline_prepare_corpus",
    # broadcast-gram contamination scan: one narrow pass over the
    # training side (the 100 TB-shaped plan — no join, no shuffle)
    "contamination_check",
    "similarity_ivf_topk",
    # The two heavy joins go LAST so their GC/cache aftermath cannot
    # inflate the sub-second queries (same reasoning as the per-query
    # interleaved warmup above).
    # max_df is the scale-honest jaccard configuration: without the
    # stopword cut the hottest shingle at sf0.1 appears in 77% of docs
    # and the inverted-index intermediate explodes quadratically
    # (221M candidate rows even after the cut; see BASELINE.md)
    "ngram_jaccard_maxdf",
    # stats twin, not the raw candidate set: the band join runs in full
    # but the 4M-row pair set stays distributed (collecting it would
    # time driver serialization, not the operator)
    "minhash_lsh_stats",
    # the flagship chained near-dup pipeline (LSH candidates -> exact
    # verify -> iterative connected components): measures the one pillar
    # the per-operator entries miss — clustering's iteration count x
    # shuffle cost on a duplicate-heavy corpus
    "dedup_pipeline",
    # same shape on the embedding modality: hyperplane-LSH pairs ->
    # connected components (~3.8 s steady at sf0.1).  BATCH legs only
    # (BENCH_VARIANTS): the correctness row's kind='stream' leg is a
    # real writeStream replay whose ~6-7 s fixed machinery cost made
    # the r9->r10 trend line non-comparable (round-10 VERDICT #3); it
    # is timed separately under "extras" below, outside the headline
    # total.
    "embedding_dedup_pipeline",
]


def _cpu_pressure_avg10() -> float | None:
    """Linux PSI cpu 'some avg10' — host-contention context baked into
    the bench artifact, so a noisy total carries its own evidence
    (bench totals on this host swing 35-57 s on identical code; the
    round-12/13 BASELINE drift notes).  None off-Linux/PSI-less."""
    try:
        with open("/proc/pressure/cpu") as f:
            line = f.readline()
        return float(line.split("avg10=")[1].split()[0])
    except Exception:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    pressure_start = _cpu_pressure_avg10()
    spark = get_spark("dhs-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: cache the bench tables and materialize once.  This mirrors
    # the eager single-process baseline (BASELINE.md), which loads the
    # parquet into RAM once and then times pure compute; and it absorbs
    # JVM/codegen warmup.  (At real scale you wouldn't cache 100 TB —
    # but you also wouldn't re-scan per sub-second query.)
    tables = get_tables(spark, sf_dir)
    for name in ("lineitem", "orders", "customer", "events", "documents",
                 "embeddings"):
        tables[name] = tables[name].cache()
        tables[name].count()

    # Per-query warmup immediately before each timed run (codegen/JIT
    # compile, broadcast exchange init) — the steady-state number that
    # scales with data volume, not the one-time process warmup the
    # driver's eager baseline also excludes by loading into RAM first.
    # Interleaving warmup+timing per query (rather than a full warmup
    # pass then a full timed pass) keeps a heavy query's GC/cache
    # aftermath out of the next query's timing: measured at sf0.1, the
    # 221M-row jaccard join inflated every later sub-second query 5-10x
    # under the two-pass scheme.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    def time_one(fn):
        fn(spark, sf_dir).collect()
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(round(time.perf_counter() - t0, 4))
        runs.sort()
        return runs[len(runs) // 2], runs

    for name in BENCH_QUERIES:
        timings[name], spreads[name] = time_one(
            BENCH_VARIANTS.get(name, QUERIES[name]))

    # fixed-cost legs (streaming replays) timed OUTSIDE the headline
    # total so the trend line stays like-for-like across rounds
    extras: dict[str, float] = {}
    for name, fn in BENCH_EXTRAS.items():
        extras[name], spreads[name] = time_one(fn)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_wall_seconds_headline_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extras": extras,
                "spread": spreads,
                "reps": reps,
                "sf": sf,
                "cpus": cpus,
                "host": {"cpu_pressure_avg10_start": pressure_start,
                         "cpu_pressure_avg10_end": _cpu_pressure_avg10(),
                         "load_avg_end": None if not hasattr(os, "getloadavg")
                         else round(os.getloadavg()[0], 2)},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
