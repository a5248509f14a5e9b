"""Multi-probe LSH ladder (BASELINE.md round-7): the persisted-index
SIZE lever.  The embedding signature table stores corpus x repetitions
x dim floats, so repetitions are the expensive recall knob at 100 TB;
multi-probe (query-side lowest-margin bit flips,
``embedding_dedup_incremental(probes=...)``) buys the recall back
against a HALF-SIZED table.

Protocol: same synthetic corpus + perturbed-re-ingest levels as
scripts/blowup_emb_incremental.py, but the point is a CONFIG sweep at
fixed n_seen — (reps=2, probes=0) the table-doubling baseline vs
(reps=1, probes=0/1/2) — reporting the table's band-row count, build
wall, batch wall, false positives and per-level recall, with the
analytic repetition curves (P = 1 - (1 - p^planes)^reps over measured
cosines) as reference lines: margin-ranked probing at q probes should
land reps-1 recall between the reps-1 and reps-2 predictions and
approach reps-2 as q grows, at half the stored rows.

Usage: python scripts/blowup_multiprobe.py [n_seen ...]
Defaults to 1M.  Run from /root/repo.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from pyspark.sql import functions as F  # noqa: E402

from blowup_emb_incremental import (  # noqa: E402
    BATCH, FRESH_OFF, GROUP, LEVELS, PLANES, THRESHOLD,
    perturbed_reingest, predicted_pass, synth_vectors,
)
from dask_histogram_spark.operators import (  # noqa: E402
    cosine_expr,
    embedding_dedup_incremental,
    write_embedding_signature_table,
)
from dask_histogram_spark.session import get_spark  # noqa: E402

# (repetitions, [probe settings sharing that table]) — probes are
# query-side only, so each distinct reps value builds ITS table once
CONFIGS = [(2, [0]), (1, [0, 1, 2])]


def run_point(spark, n_seen: int, workdir: str) -> None:
    seen = synth_vectors(spark, n_seen)
    planted = [perturbed_reingest(spark, GROUP, d, delta, off)
               for d, delta, off in LEVELS]
    fresh = synth_vectors(spark, BATCH // 2, id_offset=FRESH_OFF)
    batch = planted[0].drop("base_id")
    for p in planted[1:]:
        batch = batch.unionByName(p.drop("base_id"))
    batch = batch.unionByName(fresh)
    base = synth_vectors(spark, GROUP).select(
        F.col("vec_id").alias("base_id"),
        F.col("embedding").alias("base_vec"))
    cos = {}
    for p in planted:
        rows = p.join(base, "base_id").select(
            "vec_id", cosine_expr(F.col("embedding"),
                                  F.col("base_vec")).alias("c")).collect()
        cos.update({r.vec_id: r.c for r in rows})
    fresh_ids = {FRESH_OFF + i for i in range(BATCH // 2)}

    for reps, probe_settings in CONFIGS:
        tbl = f"dhs_mprobe_{n_seen}_{reps}"
        t0 = time.perf_counter()
        write_embedding_signature_table(
            seen, tbl, planes=PLANES, repetitions=reps, max_bucket=256,
            n_buckets=64, path=os.path.join(workdir, tbl))
        build = time.perf_counter() - t0
        try:
            nrows = spark.table(tbl).count()
            print(f"n_seen={n_seen:>9,} reps={reps}  "
                  f"table_rows={nrows:>9,}  build={build:6.1f}s")
            for probes in probe_settings:
                t0 = time.perf_counter()
                out = embedding_dedup_incremental(batch, tbl,
                                                  threshold=THRESHOLD,
                                                  probes=probes)
                rows = out.collect()
                wall = time.perf_counter() - t0
                matched = {r.vec_id for r in rows if r.n_matched_seen > 0}
                fp = len(matched & fresh_ids)
                print(f"  probes={probes}  "
                      f"batch({BATCH // 1000}k)={wall:6.2f}s  fp={fp}")
                for d, delta, off in LEVELS:
                    ids = [off + i for i in range(GROUP)]
                    obs = sum(1 for i in ids if i in matched) / GROUP
                    cs = [cos.get(i, 1.0) for i in ids]
                    p1 = float(np.mean([predicted_pass(c, reps=1)
                                        for c in cs]))
                    p2 = float(np.mean([predicted_pass(c, reps=2)
                                        for c in cs]))
                    print(f"    d={d:>2} delta={delta:<5} "
                          f"mean_cos={np.mean(cs):.5f}  recall={obs:.4f}"
                          f"  pred_r1={p1:.4f}  pred_r2={p2:.4f}")
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            spark.sql(f"DROP TABLE IF EXISTS {tbl}__params")


def main() -> None:
    import shutil
    import tempfile

    sizes = [int(float(a)) for a in sys.argv[1:]] or [1_000_000]
    spark = get_spark("dhs-mprobe-blowup", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="dhs_mprobe_")
    try:
        for n in sizes:
            run_point(spark, n, workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
