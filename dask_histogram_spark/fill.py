"""Fill: the core dataflow operator — partitioned histogram aggregation.

Reference parity map (SURVEY.md §2.1):

* ``fill``               -> reference ``factory`` (core.py:1190-1310):
  the whole partitioned-fill + tree-reduce pipeline collapses into one
  declarative ``df.select(binExprs).groupBy(bins).agg(storageAggs)``.
  Spark's hash aggregate runs the per-partition partial phase (the
  reference's ``_blocked_*`` kernels, core.py:63-257) and the exchange +
  final phase (the reference's ``_reduction`` tree, core.py:856-885)
  natively; the shuffle payload is <= nbins rows per partition.
* ``fill_multi``         -> ``_partitioned_histogram_multifill``
  (core.py:978-1005): staged fills become a ``unionByName`` of per-fill
  bin projections ahead of a single aggregation, preserving the
  one-pass-per-partition property.
* ``fill_partitioned``   -> ``partitioned_factory`` (core.py:1313-1344):
  keeps ``spark_partition_id()`` as an extra group key.
* ``collapse``           -> ``PartitionedHistogram.collapse``
  (core.py:841-843): re-aggregates partials over the bin keys.

Everything is built-in Column expressions — no Python UDFs — so the
whole fill stays inside whole-stage codegen and Catalyst is free to
push filters/pruning into the scan.
"""

from __future__ import annotations

from dataclasses import dataclass
from numbers import Number
from typing import Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .binning import bin_column, bin_sql
from .spec import HistogramSpec, Storage

__all__ = ["fill", "fill_multi", "fill_partitioned", "collapse",
           "FillSpec", "fill_sql", "factory", "partitioned_factory",
           "PartitionedHistogram", "sparse_schema"]

ColumnLike = Union[str, Column]
WeightLike = Union[str, Column, float, int, None]


def _as_col(c: ColumnLike) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _weight_col(weight: WeightLike) -> Column:
    """Normalize weight argument; scalars broadcast to all rows
    (reference: tests/test_core.py:350-359)."""
    if weight is None:
        return F.lit(1.0)
    if isinstance(weight, Number):
        return F.lit(float(weight))
    return _as_col(weight).cast("double")


def _storage_aggs(spec: HistogramSpec, weighted: bool) -> list[Column]:
    """Aggregation expressions per storage type (SURVEY.md §2.4)."""
    st = spec.storage
    w = F.col("__w")
    s = F.col("__s")
    if st is Storage.DOUBLE:
        if weighted:
            return [F.sum(w).alias("value")]
        return [F.count(F.lit(1)).cast("double").alias("value")]
    if st in (Storage.INT64, Storage.ATOMIC_INT64):
        return [F.count(F.lit(1)).alias("value")]
    if st is Storage.WEIGHT:
        if weighted:
            return [F.sum(w).alias("value"), F.sum(w * w).alias("sumw2")]
        return [
            F.count(F.lit(1)).cast("double").alias("value"),
            F.count(F.lit(1)).cast("double").alias("sumw2"),
        ]
    if st is Storage.MEAN:
        return [
            F.count(F.lit(1)).alias("count"),
            F.sum(s).alias("sum_s"),
            F.sum(s * s).alias("sum_s2"),
        ]
    if st is Storage.WEIGHTED_MEAN:
        return [
            F.sum(w).alias("sum_w"),
            F.sum(w * w).alias("sum_w2"),
            F.sum(w * s).alias("sum_ws"),
            F.sum(w * s * s).alias("sum_ws2"),
        ]
    raise AssertionError(st)


def _merge_aggs(spec: HistogramSpec) -> list[Column]:
    """Re-aggregation of already-partial accumulators (the monoid merge,
    reference ``hist_safe_sum`` core.py:37-38): every accumulator column
    is summed."""
    return [F.sum(F.col(c)).alias(c) for c in spec.value_cols]


@dataclass(frozen=True)
class FillSpec:
    """One staged fill: data columns (one per axis) + weight/sample."""

    df: DataFrame
    cols: tuple
    weight: WeightLike = None
    sample: ColumnLike | None = None


def _projection(spec: HistogramSpec, f: FillSpec) -> DataFrame:
    if len(f.cols) != spec.ndim:
        raise ValueError(
            f"fill needs one column per axis ({spec.ndim}); got {len(f.cols)}"
        )
    if spec.storage.needs_sample and f.sample is None:
        raise ValueError(f"storage {spec.storage.value} requires a sample")
    proj = [
        bin_column(ax, _as_col(c)).alias(name)
        for ax, c, name in zip(spec.axes, f.cols, spec.bin_cols)
    ]
    proj.append(_weight_col(f.weight).alias("__w"))
    proj.append(_sample_col(spec, f.sample).alias("__s"))
    return f.df.select(*proj)


def _sample_col(spec: HistogramSpec, sample: ColumnLike | None) -> Column:
    """Sample accumulator input, with the spec's stability shift applied
    (moments sum (s - K); see HistogramSpec.sample_shift)."""
    if sample is None:
        return F.lit(None).cast("double")
    s = _as_col(sample).cast("double")
    if spec.sample_shift:
        s = s - F.lit(float(spec.sample_shift))
    return s


def fill(
    df: DataFrame,
    cols: Sequence[ColumnLike],
    spec: HistogramSpec,
    weight: WeightLike = None,
    sample: ColumnLike | None = None,
) -> DataFrame:
    """Fill a histogram: returns the sparse aggregated DataFrame
    ``(bin_0..bin_{k-1}, <accumulators>)``.

    The plan is a single scan -> project(bin exprs) -> hash aggregate;
    partial aggregation per input partition and the final merge are
    Spark's native two-phase agg (SURVEY.md §3, lifecycle A).

    Examples
    --------
    >>> from dask_histogram_spark.session import get_spark
    >>> import dask_histogram_spark as dhs
    >>> spark = get_spark("doctest", cpus=2)
    >>> df = spark.createDataFrame([(0.5,), (1.5,), (1.7,), (3.5,)], "x double")
    >>> spec = dhs.HistogramSpec(axes=(dhs.Regular(4, 0.0, 4.0),),
    ...                          storage=dhs.Storage.DOUBLE)
    >>> h = dhs.AggHistogram(dhs.fill(df, ["x"], spec), spec)
    >>> h.values().tolist()
    [1.0, 2.0, 0.0, 1.0]
    """
    return fill_multi([FillSpec(df, tuple(cols), weight, sample)], spec)


def _fill_struct(spec: HistogramSpec, f: FillSpec) -> Column:
    """One fill's projection as a struct (for single-scan multifill)."""
    fields = [
        bin_column(ax, _as_col(c)).alias(name)
        for ax, c, name in zip(spec.axes, f.cols, spec.bin_cols)
    ]
    fields.append(_weight_col(f.weight).alias("__w"))
    fields.append(_sample_col(spec, f.sample).alias("__s"))
    return F.struct(*fields)


def fill_multi(fills: Sequence[FillSpec], spec: HistogramSpec) -> DataFrame:
    """Multiple staged fills -> one aggregation (reference multifill,
    core.py:978-1005).

    Fills that share a source DataFrame are fused into ONE scan:
    each row explodes into one struct per fill (the Spark equivalent of
    the reference's touch-each-partition-once multifill property —
    a plain union of N projections of the same table would scan it N
    times, 25 staged fills = 25x the IO at 100 TB).  Distinct sources
    are unioned as usual ahead of the single aggregation.
    """
    if not fills:
        raise ValueError("need at least one fill")
    for f in fills:
        if len(f.cols) != spec.ndim:
            raise ValueError(
                f"fill needs one column per axis ({spec.ndim}); got {len(f.cols)}"
            )
        if spec.storage.needs_sample and f.sample is None:
            raise ValueError(f"storage {spec.storage.value} requires a sample")
    weighted = any(f.weight is not None for f in fills) or spec.storage.needs_weight

    # group staged fills by identical source DataFrame (object identity —
    # the staged-fill pattern refills the same df)
    groups: list[tuple[DataFrame, list[FillSpec]]] = []
    for f in fills:
        for df, fs in groups:
            if df is f.df:
                fs.append(f)
                break
        else:
            groups.append((f.df, [f]))

    parts = []
    for df, fs in groups:
        if len(fs) == 1:
            parts.append(_projection(spec, fs[0]))
        else:
            exploded = df.select(
                F.explode(F.array(*[_fill_struct(spec, f) for f in fs])).alias("__f")
            )
            parts.append(exploded.select("__f.*"))
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    return unioned.groupBy(*[F.col(c) for c in spec.bin_cols]).agg(
        *_storage_aggs(spec, weighted)
    )


def fill_partitioned(
    df: DataFrame,
    cols: Sequence[ColumnLike],
    spec: HistogramSpec,
    weight: WeightLike = None,
    sample: ColumnLike | None = None,
) -> DataFrame:
    """Explicit partitioned form: one partial histogram per input
    partition, keyed by ``part_id`` (reference ``partitioned_factory``,
    core.py:1313-1344).  ``collapse`` re-aggregates to the final form."""
    f = FillSpec(df, tuple(cols), weight, sample)
    weighted = weight is not None or spec.storage.needs_weight
    proj = _projection(spec, f).withColumn("part_id", F.spark_partition_id())
    return proj.groupBy("part_id", *spec.bin_cols).agg(
        *_storage_aggs(spec, weighted)
    )


def collapse(partials: DataFrame, spec: HistogramSpec) -> DataFrame:
    """Merge partial histograms into the final aggregate (reference
    ``collapse``/``_reduction``, core.py:841-885).  ``split_every`` has
    no analog: the exchange distributes the merge by bin key."""
    return partials.groupBy(*spec.bin_cols).agg(*_merge_aggs(spec))


def sparse_schema(spec: HistogramSpec):
    """Spark schema of the sparse fill result for ``spec`` — what
    :func:`fill` produces.  Used to build the zero-row DataFrame behind
    an EMPTY histogram's compute (reference parity: an unfilled
    histogram computes to all zeros, boost.py:85-102)."""
    from pyspark.sql import types as T

    from .spec import StrCategory

    fields = []
    for ax, name in zip(spec.axes, spec.bin_cols):
        dt = T.StringType() if isinstance(ax, StrCategory) else T.LongType()
        fields.append(T.StructField(name, dt))
    for c in spec.value_cols:
        int_col = c == "count" or spec.storage.int_valued
        fields.append(
            T.StructField(c, T.LongType() if int_col else T.DoubleType())
        )
    return T.StructType(fields)


# ---------------------------------------------------------------------------
# SQL twin (oracle generation)
# ---------------------------------------------------------------------------

def _storage_aggs_sql(spec: HistogramSpec, weighted: bool) -> list[str]:
    st = spec.storage
    if st is Storage.DOUBLE:
        if weighted:
            return ["SUM(__w) AS value"]
        return ["CAST(COUNT(*) AS DOUBLE) AS value"]
    if st in (Storage.INT64, Storage.ATOMIC_INT64):
        return ["COUNT(*) AS value"]
    if st is Storage.WEIGHT:
        if weighted:
            return ["SUM(__w) AS value", "SUM(__w * __w) AS sumw2"]
        return [
            "CAST(COUNT(*) AS DOUBLE) AS value",
            "CAST(COUNT(*) AS DOUBLE) AS sumw2",
        ]
    if st is Storage.MEAN:
        return [
            "COUNT(*) AS count",
            "SUM(__s) AS sum_s",
            "SUM(__s * __s) AS sum_s2",
        ]
    if st is Storage.WEIGHTED_MEAN:
        return [
            "SUM(__w) AS sum_w",
            "SUM(__w * __w) AS sum_w2",
            "SUM(__w * __s) AS sum_ws",
            "SUM(__w * __s * __s) AS sum_ws2",
        ]
    raise AssertionError(st)


def fill_sql(
    table: str,
    cols: Sequence[str],
    spec: HistogramSpec,
    weight_sql: str | None = None,
    sample_sql: str | None = None,
    where: str | None = None,
    round_digits: int | None = 9,
) -> str:
    """DuckDB-compatible SQL computing the same sparse histogram as
    :func:`fill` — generated from the same spec so binning arithmetic is
    textually identical.  Float accumulators are rounded to significant
    digits (oracle.py) to absorb summation-order ULP differences; pair
    with :func:`dask_histogram_spark.oracle.sig_rounded` on the Spark
    side.  ``round_digits=None`` disables rounding.
    """
    from .oracle import sig_round_sql

    weighted = weight_sql is not None or spec.storage.needs_weight
    binexprs = [
        f"{bin_sql(ax, c)} AS {name}"
        for ax, c, name in zip(spec.axes, cols, spec.bin_cols)
    ]
    inner_cols = list(binexprs)
    inner_cols.append(f"CAST({weight_sql or '1.0'} AS DOUBLE) AS __w")
    if sample_sql is not None:
        s = f"CAST({sample_sql} AS DOUBLE)"
        if spec.sample_shift:
            # textually identical shift subtraction to the Spark side
            s = f"({s} - {float(spec.sample_shift)!r})"
        inner_cols.append(f"{s} AS __s")
    else:
        inner_cols.append("CAST(NULL AS DOUBLE) AS __s")
    inner = f"SELECT {', '.join(inner_cols)} FROM {table}"
    if where:
        inner += f" WHERE {where}"
    aggs = _storage_aggs_sql(spec, weighted)
    if round_digits is not None:
        rounded = []
        for a in aggs:
            expr, alias = a.rsplit(" AS ", 1)
            if alias == "count" or spec.storage.int_valued:
                rounded.append(a)
            else:
                # significant-digit rounding (see oracle.py) so engine
                # and oracle agree despite summation-order ULP noise
                rounded.append(f"{sig_round_sql(expr)} AS {alias}")
        aggs = rounded
    keys = ", ".join(spec.bin_cols)
    return f"SELECT {keys}, {', '.join(aggs)} FROM ({inner}) GROUP BY {keys}"


# ---------------------------------------------------------------------------
# Reference-parity entry points (factory / partitioned_factory)
# ---------------------------------------------------------------------------

class PartitionedHistogram:
    """Partial histograms keyed by input partition — reference
    ``PartitionedHistogram`` (core.py:744-853).  ``collapse()`` merges
    to the final :class:`~.result.AggHistogram`."""

    def __init__(self, partials: DataFrame, spec: HistogramSpec) -> None:
        self.df = partials
        self.spec = spec

    def to_sparse(self) -> DataFrame:
        return self.df

    def collapse(self, split_every: int | None = None):
        """Merge partials (reference core.py:841-843).  ``split_every``
        is accepted for API parity; the exchange distributes the merge,
        so fan-in tuning has no Spark analog."""
        from .result import AggHistogram

        return AggHistogram(collapse(self.df, self.spec), self.spec)

    def __repr__(self) -> str:
        return (f"PartitionedHistogram(ndim={self.spec.ndim}, "
                f"storage={self.spec.storage.value}, lazy-spark-plan)")


def _coerce_spec(spec) -> HistogramSpec:
    """Accept a :class:`HistogramSpec` OR the reference's picklable
    ``histref`` tuple form ``(axes, storage[, metadata])`` (reference
    core.py:66-72; pickle contract tests/test_boost.py:559-571).  Axis
    entries may be axis-shim instances (axis.py) and the storage a
    storage-shim (storage.py) — ``HistogramSpec`` coerces the latter."""
    if isinstance(spec, HistogramSpec):
        return spec
    if isinstance(spec, tuple) and len(spec) in (2, 3):
        axes, storage = spec[0], spec[1]
        metadata = spec[2] if len(spec) == 3 else None
        return HistogramSpec(axes=tuple(axes), storage=storage,
                             metadata=metadata)
    raise TypeError(
        "spec must be a HistogramSpec or an (axes, storage[, metadata]) "
        f"histref tuple; got {spec!r}"
    )


def factory(df: DataFrame, cols: Sequence[ColumnLike], spec,
            weights: WeightLike = None, sample: ColumnLike | None = None,
            split_every: int | None = None,
            keep_partitioned: bool = False):
    """Reference ``factory`` (core.py:1190-1310), Spark-native
    signature: returns a lazy :class:`~.result.AggHistogram`, or a
    :class:`PartitionedHistogram` with ``keep_partitioned=True``
    (reference core.py:1240-1247).  ``split_every`` accepted-and-
    ignored (tree fan-in has no analog; the exchange merges).  ``spec``
    also accepts the reference's ``histref`` tuple spelling
    (:func:`_coerce_spec`)."""
    from .result import AggHistogram

    spec = _coerce_spec(spec)
    if keep_partitioned:
        return PartitionedHistogram(
            fill_partitioned(df, cols, spec, weight=weights, sample=sample),
            spec,
        )
    return AggHistogram(fill(df, cols, spec, weight=weights, sample=sample),
                        spec)


def partitioned_factory(df: DataFrame, cols: Sequence[ColumnLike],
                        spec: HistogramSpec, weights: WeightLike = None,
                        sample: ColumnLike | None = None) -> PartitionedHistogram:
    """Reference ``partitioned_factory`` (core.py:1313-1344)."""
    return factory(df, cols, spec, weights=weights, sample=sample,
                   keep_partitioned=True)
