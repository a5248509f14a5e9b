"""Attribute the dedup_incremental bench spread (round-13 VERDICT #3).

BENCH_r13 recorded spread [6.5, 18.6] s (2.9x intra-run) for the
dedup_incremental row while its paired ratio held at 0.52x — so the
outlier is a fixed/rare cost, not a plan change.  This probe runs the
row N reps and, per rep, records:

  * wall seconds for the FULL row (the bench's unit),
  * wall seconds for each LEG run separately (exact anti-join / LSH
    table probe / span-gram incremental) — names WHICH leg carries an
    outlier,
  * the JVM's cumulative GC time delta across the rep (all collector
    beans via ManagementFactory) — separates GC stalls from scheduling,
  * executor/driver peak memory proxy: live heap after the rep.

Usage: python scripts/probe_incremental_spread.py [sf_dir] [reps]
Prints ONE JSON line; eyeball the markdown on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import dask_histogram_spark.queries as q  # noqa: E402
from dask_histogram_spark.queries import QUERIES, get_tables  # noqa: E402
from dask_histogram_spark.session import get_spark  # noqa: E402


def _gc_millis(spark) -> int:
    """Sum of collectionTime over all JVM GC beans (driver == executor
    JVM in local mode)."""
    beans = (spark._jvm.java.lang.management.ManagementFactory
             .getGarbageCollectorMXBeans())
    return sum(beans.get(i).getCollectionTime()
               for i in range(beans.size()))


def _heap_used(spark) -> int:
    rt = spark._jvm.java.lang.Runtime.getRuntime()
    return int(rt.totalMemory() - rt.freeMemory())


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dhs-inc-spread", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    tables = get_tables(spark, sf_dir)
    for name in ("documents",):
        tables[name] = tables[name].cache()
        tables[name].count()

    # leg bodies — the same construction as _q_dedup_incremental,
    # split so each leg collects alone
    from dask_histogram_spark.operators import (
        dedup_incremental,
        dedup_incremental_lsh,
        remove_duplicate_spans_incremental,
    )

    def mk_new(seen):
        return seen.select(
            (F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text"
        ).unionByName(seen.select(
            (F.col("doc_id") + 2_000_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" (rev2)")).alias("text")))

    seen = get_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    new = mk_new(seen)
    full = QUERIES["dedup_incremental"]
    full(spark, sf_dir).collect()  # warmup: builds the session tables
    key = (spark.sparkContext.applicationId, sf_dir)
    sig_tbl = q._INC_SIG_CACHE[key][0] if isinstance(
        q._INC_SIG_CACHE[key], tuple) else q._INC_SIG_CACHE[key]
    span_tbl = q._INC_SPAN_CACHE[key][0] if isinstance(
        q._INC_SPAN_CACHE[key], tuple) else q._INC_SPAN_CACHE[key]

    legs = {
        "exact": lambda: dedup_incremental(new, seen).collect(),
        "lsh": lambda: dedup_incremental_lsh(
            new, sig_tbl, min_sig_matches=24).collect(),
        "span": lambda: remove_duplicate_spans_incremental(
            new, span_tbl, min_df=q._SPAN_MIN_DF).collect(),
    }
    for fn in legs.values():
        fn()  # leg warmup

    rows = []
    for i in range(reps):
        rec = {"rep": i}
        gc0, t0 = _gc_millis(spark), time.perf_counter()
        full(spark, sf_dir).collect()
        rec["full_s"] = round(time.perf_counter() - t0, 3)
        rec["full_gc_ms"] = _gc_millis(spark) - gc0
        for leg, fn in legs.items():
            gc0, t0 = _gc_millis(spark), time.perf_counter()
            fn()
            rec[f"{leg}_s"] = round(time.perf_counter() - t0, 3)
            rec[f"{leg}_gc_ms"] = _gc_millis(spark) - gc0
        rec["heap_used_gib"] = round(_heap_used(spark) / 2**30, 2)
        rows.append(rec)
        print(rec, file=sys.stderr)

    print(json.dumps({"rows": rows, "sf_dir": sf_dir, "reps": reps,
                      "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
