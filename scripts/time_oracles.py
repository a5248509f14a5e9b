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

DISK-HEAVY rows (round-13 VERDICT #2): similarity_ivf_topk builds and
reads two on-disk indexes per rep, and its in-table ratio smeared 1.5x
(29.1x vs 19.45x isolated) when it ran late in a ~1,300-stage session
— BOTH sides' spreads inflated by accumulated session/disk state, so
the committed table needed an out-of-band correction footnote.  Rows
in ISOLATE_ROWS now run in their OWN fresh subprocess session (this
script re-invokes itself with the single row; disable with
SPARK_GRAFT_PAIR_ISOLATE=""), and the in-session remainder keeps the
bench order.  The merged artifact marks isolated rows.
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
# rows that build/read on-disk artifacts every rep — isolated in a
# fresh subprocess session by default (see module docstring).
# embedding_dedup_pipeline joined the set in round 14: its stream leg
# writes batch files + streaming checkpoints per rep, and at the END
# of the first r14 full run (~1,500 accumulated stages) its reps read
# 36-82 s vs the 12-16 s its own leg pairing composes to — the same
# accumulated-session smear class as the ivf row.
ISOLATE_ROWS = tuple(
    r for r in os.environ.get(
        "SPARK_GRAFT_PAIR_ISOLATE",
        "similarity_ivf_topk,embedding_dedup_pipeline").split(",") if r)
# internal marker: set in the child so the isolated row runs in-session
_CHILD_ENV = "_SPARK_GRAFT_PAIR_CHILD"


def _run_isolated(sf_dir: str, name: str) -> dict:
    """Re-invoke this script in a fresh subprocess for one row; return
    its parsed per-row pairing dict."""
    import subprocess

    env = dict(os.environ, **{_CHILD_ENV: "1"})
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), sf_dir, name],
        capture_output=True, text=True, env=env, check=True)
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    row = payload["paired"][name]
    row["isolated"] = True
    return row


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or [q for q in BENCH_QUERIES if q in ORACLES]
    child = bool(os.environ.get(_CHILD_ENV))
    isolated: dict[str, dict] = {}
    if not child:
        for name in [n for n in names if n in ISOLATE_ROWS]:
            print(f"[isolating {name} in a fresh session]",
                  file=sys.stderr)
            isolated[name] = _run_isolated(sf_dir, name)
            print(f"{name}: engine {isolated[name]['engine']:.3f}s "
                  f"oracle {isolated[name]['oracle']:.3f}s "
                  f"ratio {isolated[name]['ratio']:.2f}x (isolated)",
                  file=sys.stderr)
        names = [n for n in names if n not in ISOLATE_ROWS]

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

    paired.update(isolated)
    print("\n| query | engine (s) | oracle (s) | ratio |",
          file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for name, p in paired.items():
        iso = " (isolated)" if p.get("isolated") else ""
        print(f"| {name} | {p['engine']:.2f} | {p['oracle']:.2f} | "
              f"{p['ratio']:.2f}x{iso} |", file=sys.stderr)

    print(json.dumps({"paired": paired, "sf_dir": sf_dir,
                      "reps": REPS, "cpus": cpus,
                      "isolated_rows": sorted(isolated)}))
    spark.stop()


if __name__ == "__main__":
    main()
