"""Axis -> bin-index expression generation.

Two generators per axis kind, guaranteed consistent because both are
derived from the same spec and the same closed-form arithmetic:

* :func:`bin_column` — a PySpark ``Column`` (pure built-in functions,
  stays inside whole-stage codegen; no Python UDF in the hot path).
* :func:`bin_sql` — the equivalent ANSI-SQL text (DuckDB-compatible),
  used to build differential-test oracles.

Semantics (boost-histogram axis contract, SURVEY.md §1.2):
  * Regular/Variable: half-open bins [e_i, e_{i+1}); x < lo -> underflow
    (index -1); x >= hi, NULL and NaN -> overflow (index n).
  * Category axes group on the raw value; with ``growth`` the bin space
    is discovered by the aggregation itself.

The floating-point expression is written identically on both sides
(``floor((x - lo) * scale)`` with ``scale`` precomputed in Python) so
Spark and the SQL oracle produce bit-identical bin indices.
"""

from __future__ import annotations

from functools import reduce
from typing import Union

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from .spec import (
    Axis,
    Boolean,
    Integer,
    IntCategory,
    Regular,
    StrCategory,
    Variable,
    _CategoryAxis,
)

__all__ = ["bin_column", "bin_sql", "CATEGORY_OVERFLOW"]

# Sentinel bin value for out-of-set values on a pinned (growth=False)
# category axis: SQL NULL.  NULL cannot collide with any real category
# (boost category axes reject missing values), groupBy collapses all
# out-of-set rows into ONE sparse row (bounded state even when the
# out-of-set value space is huge), and dense materialization routes it
# to the axis's single overflow slot (result.py).
CATEGORY_OVERFLOW = None

# Variable axes beyond this many bins switch from a chained-CASE Column
# expression (O(n) per row, codegen) to an Arrow-batched numpy
# searchsorted pandas_udf (O(log n), vectorized).
VARIABLE_UDF_THRESHOLD = 512


def _variable_bin_searchsorted(x: Column, edges: tuple) -> Column:
    """Large-edge-list Variable binning: vectorized np.searchsorted over
    Arrow batches.  Identical semantics to the Column form: half-open
    [e_i, e_{i+1}) bins, x < e_0 -> -1, x >= e_last / NaN / NULL -> n."""
    from pyspark.sql import types as T

    e = np.asarray(edges, dtype=np.float64)
    n = len(e) - 1

    @F.pandas_udf(T.LongType())
    def bin_udf(s: pd.Series) -> pd.Series:
        v = s.to_numpy(dtype=np.float64, na_value=np.nan)
        idx = np.searchsorted(e, v, side="right").astype(np.int64) - 1
        idx[v < e[0]] = -1
        idx[(v >= e[-1]) | np.isnan(v)] = n
        return pd.Series(idx)

    return bin_udf(x)


def _dbl(col: Column) -> Column:
    return col.cast("double")


def bin_column(axis: Axis, col: Column) -> Column:
    """Return the bin-index Column (LongType; category axes: raw value)."""
    if isinstance(axis, Regular):
        x = _dbl(col)
        n, lo, hi = axis.n, float(axis.lo), float(axis.hi)
        scale = n / (hi - lo)
        idx = F.floor((x - F.lit(lo)) * F.lit(scale)).cast("long")
        return (
            F.when(col.isNull() | F.isnan(x), F.lit(n).cast("long"))
            .when(x < F.lit(lo), F.lit(-1).cast("long"))
            .when(x >= F.lit(hi), F.lit(n).cast("long"))
            .otherwise(F.least(idx, F.lit(n - 1).cast("long")))
        )
    if isinstance(axis, Variable):
        x = _dbl(col)
        edges = axis.edge_list
        n = axis.nbins
        if n > VARIABLE_UDF_THRESHOLD:
            return _variable_bin_searchsorted(x, edges)
        # Chained half-open comparisons; <= ~hundreds of edges this stays
        # in codegen.  Beyond VARIABLE_UDF_THRESHOLD the expression tree
        # (O(n) per row) loses to the Arrow searchsorted fallback above
        # (O(log n) vectorized).
        expr = F.lit(n - 1).cast("long")  # last in-range bin
        for i in range(n - 1, -1, -1):
            expr = F.when(x < F.lit(float(edges[i + 1])), F.lit(i).cast("long")).otherwise(expr)
        expr = F.when(x < F.lit(float(edges[0])), F.lit(-1).cast("long")).otherwise(expr)
        return (
            F.when(col.isNull() | F.isnan(x), F.lit(n).cast("long"))
            .when(x >= F.lit(float(edges[-1])), F.lit(n).cast("long"))
            .otherwise(expr)
        )
    if isinstance(axis, Integer):
        x = _dbl(col)
        lo, hi = axis.lo, axis.hi
        n = axis.nbins
        return (
            F.when(col.isNull() | F.isnan(x), F.lit(n).cast("long"))
            .when(x < F.lit(float(lo)), F.lit(-1).cast("long"))
            .when(x >= F.lit(float(hi)), F.lit(n).cast("long"))
            .otherwise(F.floor(x).cast("long") - F.lit(lo))
        )
    if isinstance(axis, Boolean):
        return F.when(col.cast("boolean"), F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
    if isinstance(axis, _CategoryAxis):
        # Group on the raw value; growth falls out of groupBy for free.
        v = col.cast("long") if isinstance(axis, IntCategory) else col.cast("string")
        if not axis.growth and axis.categories:
            # pinned axis: out-of-set values fold to the NULL overflow
            # sentinel (single overflow slot, boost semantics)
            return F.when(v.isin(*axis.categories), v).otherwise(
                F.lit(CATEGORY_OVERFLOW)
            )
        return v
    raise TypeError(f"unsupported axis type: {type(axis).__name__}")


def bin_sql(axis: Axis, col: str) -> str:
    """ANSI-SQL (DuckDB-compatible) twin of :func:`bin_column`."""
    if isinstance(axis, Regular):
        n, lo, hi = axis.n, float(axis.lo), float(axis.hi)
        scale = n / (hi - lo)
        x = f"CAST({col} AS DOUBLE)"
        return (
            f"CASE WHEN {col} IS NULL OR isnan({x}) THEN {n} "
            f"WHEN {x} < {lo!r} THEN -1 "
            f"WHEN {x} >= {hi!r} THEN {n} "
            f"ELSE LEAST(CAST(FLOOR(({x} - {lo!r}) * {scale!r}) AS BIGINT), {n - 1}) END"
        )
    if isinstance(axis, Variable):
        edges = axis.edge_list
        n = axis.nbins
        x = f"CAST({col} AS DOUBLE)"
        whens = " ".join(
            f"WHEN {x} < {float(edges[i + 1])!r} THEN {i}" for i in range(n)
        )
        return (
            f"CASE WHEN {col} IS NULL OR isnan({x}) THEN {n} "
            f"WHEN {x} >= {float(edges[-1])!r} THEN {n} "
            f"WHEN {x} < {float(edges[0])!r} THEN -1 "
            f"{whens} ELSE {n - 1} END"
        )
    if isinstance(axis, Integer):
        n, lo, hi = axis.nbins, axis.lo, axis.hi
        x = f"CAST({col} AS DOUBLE)"
        return (
            f"CASE WHEN {col} IS NULL OR isnan({x}) THEN {n} "
            f"WHEN {x} < {float(lo)!r} THEN -1 "
            f"WHEN {x} >= {float(hi)!r} THEN {n} "
            f"ELSE CAST(FLOOR({x}) AS BIGINT) - {lo} END"
        )
    if isinstance(axis, Boolean):
        return f"CASE WHEN CAST({col} AS BOOLEAN) THEN 1 ELSE 0 END"
    if isinstance(axis, (IntCategory, StrCategory)):
        cast = "BIGINT" if isinstance(axis, IntCategory) else "VARCHAR"
        v = f"CAST({col} AS {cast})"
        if not axis.growth and axis.categories:
            if isinstance(axis, IntCategory):
                in_list = ", ".join(str(int(c)) for c in axis.categories)
            else:
                in_list = ", ".join(
                    "'" + str(c).replace("'", "''") + "'" for c in axis.categories
                )
            return f"CASE WHEN {v} IN ({in_list}) THEN {v} ELSE NULL END"
        return v
    raise TypeError(f"unsupported axis type: {type(axis).__name__}")
