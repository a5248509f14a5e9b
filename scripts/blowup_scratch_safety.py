"""Second corroborating point for SHUFFLE_SCRATCH_SAFETY (round-12
VERDICT #5): the 2x sort-spill constant in operators/sizing.py rested
on ONE measurement (the round-11 10M ladder: a ~48 GB band exchange
filled a ~79 GB volume to the 97% kill line).  This script runs the
SAME in-query band self-join at a different (n, dim, repetitions)
operating point and measures the TRUE PEAK scratch footprint (a
background sampler thread, 0.5 s cadence, over the session's spark
scratch dirs — tighter than the ladder's end-of-phase du) against the
preflight's modeled exchange bytes 2*n*reps*(elem*dim + 40).

The artifact is one BASELINE table row: (n, dim, reps, modeled
exchange GiB, peak scratch GiB, peak/exchange ratio).  Adjust the
constant only if the measured ratio exceeds 2.0.

Usage: python scripts/blowup_scratch_safety.py [n] [dim] [reps]
Defaults: 2,000,000 x dim128 float32 x reps=4 (~8.2 GiB modeled
exchange — mid-size: big enough that shuffle files dominate the du,
small enough to finish in minutes and fit the container volume).
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dask_histogram_spark.operators import (  # noqa: E402
    embedding_near_dup_pairs,
)
from dask_histogram_spark.operators.similarity import (  # noqa: E402
    _BAND_ROW_OVERHEAD_BYTES,
)
from dask_histogram_spark.session import get_spark  # noqa: E402

DUP_RATE = 0.10


def _scratch_roots() -> list[str]:
    """Spark's local-dir resolution order (the same one
    sizing.scratch_budget probes): SPARK_LOCAL_DIRS env overrides
    spark.local.dir, else java.io.tmpdir — measuring /tmp while Spark
    spills elsewhere would record a bogus ~0 peak (round-13 review)."""
    dirs = os.environ.get("SPARK_LOCAL_DIRS") or "/tmp"
    return [d for d in dirs.split(",") if d]


def scratch_kib() -> int:
    total = 0
    for root in _scratch_roots():
        for d in (glob.glob(os.path.join(root, "spark-*"))
                  + glob.glob(os.path.join(root, "blockmgr-*"))):
            try:
                out = subprocess.run(["du", "-sk", d],
                                     capture_output=True,
                                     text=True, timeout=120)
                total += int(out.stdout.split()[0])
            except Exception:
                pass
    return total


class PeakSampler(threading.Thread):
    """Background du sampler: records the max observed scratch."""

    def __init__(self, base_kib: int) -> None:
        super().__init__(daemon=True)
        self.base = base_kib
        self.peak = 0
        self._halt = threading.Event()

    def run(self) -> None:
        while not self._halt.is_set():
            self.peak = max(self.peak, scratch_kib() - self.base)
            self._halt.wait(0.5)

    def stop(self) -> float:
        self._halt.set()
        self.join()
        self.peak = max(self.peak, scratch_kib() - self.base)
        return self.peak / 2 ** 20  # GiB


def synth(spark, n: int, dim: int):
    """blowup_embedding_10m's deterministic corpus at parametric dim:
    component j of vector i = unit-scaled xxhash64(i, j); dups nudge
    one component by 1e-3 (cosine ~1) at ids >= n_base."""
    n_dup = int(n * DUP_RATE)
    n_base = n - n_dup
    comp = F.array(*[
        (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(j)), F.lit(2001)) - 1000)
        .cast("float") / 1000.0
        for j in range(dim)
    ])
    base = spark.range(n_base).select(
        F.col("id").alias("vec_id")).select("vec_id",
                                            comp.alias("embedding"))
    dups = base.filter(F.col("vec_id") < n_dup).select(
        (F.col("vec_id") + n_base).alias("vec_id"),
        F.concat(
            F.slice("embedding", 1, dim - 1),
            F.array((F.element_at("embedding", dim) + F.lit(0.001))
                    .cast("float")),
        ).alias("embedding"),
    )
    return base.unionByName(dups).repartition(64)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dhs-scratch", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    vecs = synth(spark, n, dim).persist()
    vecs.count()

    exchange = 2 * n * reps * (4 * dim + _BAND_ROW_OVERHEAD_BYTES)
    print(f"n={n:,} dim={dim} reps={reps}  modeled exchange "
          f"{exchange / 2**30:.2f} GiB", flush=True)

    sampler = PeakSampler(scratch_kib())
    sampler.start()
    t0 = time.perf_counter()
    pairs = embedding_near_dup_pairs(vecs, threshold=0.99, planes=16,
                                     repetitions=reps)
    n_pairs = pairs.count()
    wall = time.perf_counter() - t0
    n_dup = int(n * DUP_RATE)
    print(f"wall {wall:.1f}s  pairs={n_pairs:,} (planted {n_dup:,}; "
          f"recall {min(n_pairs, n_dup) / n_dup:.4f} lower-bound)",
          flush=True)
    peak = sampler.stop()
    print(f"PEAK scratch {peak:.2f} GiB / exchange "
          f"{exchange / 2**30:.2f} GiB = ratio "
          f"{peak / (exchange / 2**30):.2f}  "
          f"(SHUFFLE_SCRATCH_SAFETY=2.0)", flush=True)
    vecs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
