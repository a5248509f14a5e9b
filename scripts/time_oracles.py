"""PAIRED re-pair protocol (round-9 VERDICT #5): time each query's
ENGINE and ORACLE interleaved in ONE session, median-of-5 each.

The 2x-gate ratio was being re-litigated from mismatched sessions —
dedup_exact_stats' oracle halved between rounds on identical SQL,
swinging the ratio 1.4x -> 3.2x with zero engine change.  This script
removes both failure modes: numerator and denominator run in the SAME
process minutes apart, alternating E-O-E-O so host drift hits both
sides equally, and the median of 5 kills scheduler outliers.

Usage: python scripts/time_oracles.py [sf_dir] [query ...]
  default queries: BENCH_QUERIES that have an oracle.
Prints ONE JSON line {"paired": {name: {engine, oracle, ratio}}, ...}
and a ready-to-paste markdown table on stderr.  Run on an idle host
(check /proc/pressure/cpu first) — the round's BASELINE table records
the output verbatim.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402
from dask_histogram_spark.queries import ORACLES, QUERIES, get_tables  # noqa: E402
from dask_histogram_spark.session import get_spark  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
REPS = int(os.environ.get("SPARK_GRAFT_PAIR_REPS", "5"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or [q for q in BENCH_QUERIES if q in ORACLES]

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            # in-RAM table: the eager single-process baseline's
            # posture, mirroring the bench's Spark-side table cache
            con.execute(
                f"CREATE TABLE {t} AS SELECT * FROM read_parquet('{path}')")

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dhs-pair", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    tables = get_tables(spark, sf_dir)
    for name in ("lineitem", "orders", "customer", "events", "documents",
                 "embeddings"):
        tables[name] = tables[name].cache()
        tables[name].count()

    paired: dict[str, dict] = {}
    for name in names:
        fn, sql = QUERIES[name], ORACLES[name]
        fn(spark, sf_dir).collect()          # engine warm (codegen,
        con.execute(sql).fetchall()          # one-off sidecars) + oracle
        es, os_ = [], []
        for _ in range(REPS):                # strict E-O alternation:
            t0 = time.perf_counter()         # host drift lands on both
            fn(spark, sf_dir).collect()      # sides of the ratio
            es.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            os_.append(time.perf_counter() - t0)
        e, o = statistics.median(es), statistics.median(os_)
        paired[name] = {
            "engine": round(e, 4), "oracle": round(o, 4),
            "ratio": round(e / o, 2) if o else None,
            "engine_reps": [round(x, 4) for x in es],
            "oracle_reps": [round(x, 4) for x in os_],
        }
        print(f"{name}: engine {e:.3f}s oracle {o:.3f}s "
              f"ratio {e / o:.2f}x", file=sys.stderr)

    print("\n| query | engine (s) | oracle (s) | ratio |",
          file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for name, p in paired.items():
        print(f"| {name} | {p['engine']:.2f} | {p['oracle']:.2f} | "
              f"{p['ratio']:.2f}x |", file=sys.stderr)

    print(json.dumps({"paired": paired, "sf_dir": sf_dir,
                      "reps": REPS, "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
