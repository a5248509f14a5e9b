"""Embedding incremental dedup ladder (BASELINE.md round-7): a seen
corpus of N synthetic vectors persisted once as the bucketed
hyperplane signature table (write_embedding_signature_table), then a
10k-vector nightly batch gated through embedding_dedup_incremental.

Beyond the build/batch walls (which must track batch size, not seen
size), the batch plants PERTURBED re-ingests at several noise levels —
true cosine from ~0.9999 down to ~0.90, straddling the verify
threshold — and compares observed recall per level against the exact
hyperplane-LSH theory: P(one plane agrees) = 1 - theta/pi, so
P(candidate) = 1 - (1 - p^planes)^repetitions, and a candidate passes
iff its exact cosine clears the threshold.  The prediction is the
per-pair mean of that expression over the MEASURED cosines, so the
ladder validates the signature statistics, not just the wiring.

Usage: python scripts/blowup_emb_incremental.py [n_seen ...]
Defaults to 100k / 1M.  Run from /root/repo.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

from pyspark.sql import functions as F  # noqa: E402

from dask_histogram_spark.operators import (  # noqa: E402
    cosine_expr,
    embedding_dedup_incremental,
    write_embedding_signature_table,
)
from dask_histogram_spark.session import get_spark  # noqa: E402

DIM = 64
BATCH = 10_000
PLANES = 16
REPS = 2
THRESHOLD = 0.97
# (n perturbed components, per-component delta, id offset); (0, 0)
# is the exact re-ingest control.  Deltas chosen to land true cosines
# around 0.9999 / 0.999 / 0.995 / 0.98 / 0.90 — the last is BELOW the
# verify threshold, the designed-miss control.
LEVELS = [(0, 0.0, 10_000_000), (1, 0.066, 11_000_000),
          (1, 0.21, 12_000_000), (4, 0.23, 13_000_000),
          (8, 0.33, 14_000_000), (16, 0.75, 15_000_000)]
GROUP = (BATCH // 2) // len(LEVELS)
FRESH_OFF = 20_000_000


def base_component(vec_id, j: int):
    return (
        (F.pmod(F.xxhash64(vec_id, F.lit(j)), F.lit(2001)) - 1000)
        .cast("float") / 1000.0
    )


def synth_vectors(spark, n: int, id_offset: int = 0):
    comp = F.array(*[base_component(F.col("vec_id"), j)
                     for j in range(DIM)])
    return spark.range(n).select(
        (F.col("id") + id_offset).alias("vec_id")
    ).select("vec_id", comp.alias("embedding")).repartition(64)


def perturbed_reingest(spark, n: int, d: int, delta: float, offset: int):
    """Re-ingests of seen vectors 0..n-1 with a deterministic
    +-delta nudge on the LAST ``d`` components (sign from a hash, so
    the perturbation has no systematic direction)."""
    cols = []
    for j in range(DIM):
        c = base_component(F.col("base_id"), j)
        if j >= DIM - d:
            sign = (F.pmod(F.xxhash64(F.col("base_id") + 555_000 + d,
                                      F.lit(j)), F.lit(2)) * 2 - 1)
            c = (c + sign.cast("float") * F.lit(float(delta))).cast("float")
        cols.append(c)
    return spark.range(n).select(F.col("id").alias("base_id")).select(
        (F.col("base_id") + offset).alias("vec_id"),
        F.array(*cols).alias("embedding"),
        F.col("base_id"),
    )


def predicted_pass(cos: float, threshold: float = THRESHOLD,
                   planes: int = PLANES, reps: int = REPS) -> float:
    if cos < threshold:
        return 0.0
    theta = float(np.arccos(np.clip(cos, -1.0, 1.0)))
    p = 1.0 - theta / np.pi
    return 1.0 - (1.0 - p ** planes) ** reps


def run_point(spark, n_seen: int, workdir: str) -> None:
    seen = synth_vectors(spark, n_seen)
    tbl = f"dhs_embinc_ladder_{n_seen}"
    t0 = time.perf_counter()
    write_embedding_signature_table(
        seen, tbl, planes=PLANES, repetitions=REPS, max_bucket=256,
        n_buckets=64, path=os.path.join(workdir, tbl))
    build = time.perf_counter() - t0
    try:
        planted = [perturbed_reingest(spark, GROUP, d, delta, off)
                   for d, delta, off in LEVELS]
        fresh = synth_vectors(spark, BATCH // 2, id_offset=FRESH_OFF)
        batch = planted[0].drop("base_id")
        for p in planted[1:]:
            batch = batch.unionByName(p.drop("base_id"))
        batch = batch.unionByName(fresh)

        # true cosine of every planted (new, base) pair
        base = synth_vectors(spark, GROUP).select(
            F.col("vec_id").alias("base_id"),
            F.col("embedding").alias("base_vec"))
        cos = {}
        for p in planted:
            rows = p.join(base, "base_id").select(
                "vec_id",
                cosine_expr(F.col("embedding"),
                            F.col("base_vec")).alias("c")).collect()
            cos.update({r.vec_id: r.c for r in rows})

        t0 = time.perf_counter()
        out = embedding_dedup_incremental(batch, tbl,
                                          threshold=THRESHOLD)
        rows = out.collect()
        wall = time.perf_counter() - t0
        matched = {r.vec_id for r in rows if r.n_matched_seen > 0}
        fresh_ids = {FRESH_OFF + i for i in range(BATCH // 2)}
        fp = len(matched & fresh_ids)
        print(f"n_seen={n_seen:>9,}  build={build:6.1f}s  "
              f"batch({BATCH//1000}k)={wall:6.2f}s  false_pos={fp}")
        for d, delta, off in LEVELS:
            ids = [off + i for i in range(GROUP)]
            obs = sum(1 for i in ids if i in matched) / GROUP
            cs = [cos.get(i, 1.0) for i in ids]
            pred = float(np.mean([predicted_pass(c) for c in cs]))
            print(f"    d={d:>2} delta={delta:<5} mean_cos="
                  f"{np.mean(cs):.5f}  recall={obs:.4f}  "
                  f"predicted={pred:.4f}")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__params")


def main() -> None:
    import shutil
    import tempfile

    sizes = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark("dhs-embinc-blowup", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="dhs_embinc_ladder_")
    try:
        for n in sizes:
            run_point(spark, n, workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
