"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The real registry lives in ``dask_histogram_spark.queries``; both the
Spark side and the DuckDB oracle of every SQL-expressible operator are
generated from one spec so the arithmetic matches textually.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dask_histogram_spark.queries import ORACLES, QUERIES, flagship  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 1D weighted histogram
    of lineitem.l_extendedprice (Weight storage) — the minimum
    end-to-end slice through spec/binning/fill/aggregation."""
    return flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    LLM-data extension operators."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query.
    Rows-only queries (hash-/UDF-/window-based) are intentionally
    absent (weaker check, per the driver contract)."""
    return dict(ORACLES)
