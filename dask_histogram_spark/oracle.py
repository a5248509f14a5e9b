"""Significant-digit rounding, generated identically for Spark Columns
and DuckDB SQL.

Why not ROUND(x, 6): aggregate sums differ between engines only by
summation-order ULP noise, which is *relative* (~1e-15 of the
magnitude).  A fixed decimal place can't absorb that for large sums
(sum of squares of prices ~1e13 has absolute noise ~1e-2), while
destroying nothing for small ones.  Rounding to N significant digits
absorbs relative noise at every magnitude.

Mechanics: granularity g = 10^(floor(log10|x|) - (sig-1));
result = round(x/g) * g.  x/g lands in [10^(sig-1), 10^sig) where
half-up rounding is exact; 0/NULL/NaN pass through.  The same closed
form is emitted on both sides so they agree bit-for-bit except when
the true value sits within noise of a rounding boundary (~1e-9
probability per value).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["sig_round_col", "sig_round_sql", "sig_rounded"]

DEFAULT_SIG = 9


def sig_round_col(c: Column, sig: int = DEFAULT_SIG) -> Column:
    g = F.pow(F.lit(10.0), F.floor(F.log10(F.abs(c))) - F.lit(sig - 1))
    return (
        F.when(c.isNull() | (c == 0) | F.isnan(c), c)
        .otherwise(F.round(c / g, 0) * g)
    )


def sig_round_sql(expr: str, sig: int = DEFAULT_SIG) -> str:
    g = f"POWER(10.0, FLOOR(LOG10(ABS({expr}))) - {sig - 1})"
    return (
        f"CASE WHEN {expr} IS NULL OR {expr} = 0 OR isnan(CAST({expr} AS DOUBLE)) "
        f"THEN {expr} "
        f"ELSE ROUND(({expr}) / {g}, 0) * {g} END"
    )


def sig_rounded(df: DataFrame, sig: int = DEFAULT_SIG) -> DataFrame:
    """Apply sig_round to every floating-point column of ``df``."""
    out = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            out.append(sig_round_col(F.col(f.name).cast("double"), sig).alias(f.name))
        else:
            out.append(F.col(f.name))
    return df.select(*out)
