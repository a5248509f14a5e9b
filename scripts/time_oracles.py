"""Time each bench query's DuckDB oracle at a given SF (warm,
median of 3) — the eager single-process baseline the 2x gate compares
against (BASELINE.md).

Usage: python scripts/time_oracles.py [sf_dir] [query ...]
Prints one JSON line: {"oracle_seconds": {...}, "sf_dir": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402
from dask_histogram_spark.queries import ORACLES  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or [q for q in BENCH_QUERIES if q in ORACLES]
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            # load into RAM (the eager baseline's posture; mirrors the
            # bench's table cache)
            con.execute(
                f"CREATE TABLE {t} AS SELECT * FROM read_parquet('{path}')")
    out: dict[str, float] = {}
    for name in names:
        sql = ORACLES[name]
        con.execute(sql).fetchall()  # warm
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(round(time.perf_counter() - t0, 4))
        runs.sort()
        out[name] = runs[1]
        print(f"{name}: {runs}", file=sys.stderr)
    print(json.dumps({"oracle_seconds": out, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
