"""NumPy-style entry points: ``histogram``, ``histogram2d``, ``histogramdd``.

Reference parity: ``routines.py:29-128`` (histogram), ``:131-253``
(histogram2d), ``:256-463`` (histogramdd), with the same argument
contract: ``normed`` is rejected (routines.py:413-416), ``threads`` is
accepted-and-ignored with a warning (routines.py:422-426), integer bins
require an explicit range because data is lazy (routines.py:299-307).

Spark-native signature difference (by design, SURVEY.md §1.1): instead
of dask collections the inputs are a ``pyspark.sql.DataFrame`` plus
column names/Columns — co-partitioning constraints of the reference
(core.py:901-918) disappear because all participating columns live in
one DataFrame.

All three return a lazy :class:`AggHistogram`; ``.to_numpy()`` yields
the eager ``(counts, edges...)`` form.
"""

from __future__ import annotations

import warnings
from typing import Any, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame

from .bins import normalize_bins_range
from .fill import ColumnLike, WeightLike, fill
from .result import AggHistogram
from .spec import HistogramSpec, Regular, Storage, Variable

__all__ = ["histogram", "histogram2d", "histogramdd", "axes_from_bins_range"]


def axes_from_bins_range(ndim: int, bins: Any, range: Any) -> tuple:
    """bins/range -> axis objects (reference routines.py:444-450)."""
    bins_pd, range_pd = normalize_bins_range(ndim, bins, range)
    axes = []
    for b, r in zip(bins_pd, range_pd):
        if isinstance(b, (int, np.integer)):
            if r is None:
                raise ValueError(
                    "integer bins requires range to be defined (data is "
                    "lazy; ranges are not inferred from min/max)"
                )
            axes.append(Regular(int(b), float(r[0]), float(r[1])))
        else:
            axes.append(Variable(np.asarray(b, dtype=np.float64)))
    return tuple(axes)


def _common_checks(normed: Any, threads: Any) -> None:
    if normed is not None:
        raise KeyError(
            "normed is not supported; use density (reference parity: "
            "routines.py:413-416)"
        )
    if threads is not None:
        warnings.warn(
            "threads is ignored: parallelism is governed by Spark "
            "(reference parity: routines.py:422-426)",
            stacklevel=3,
        )


def histogramdd(
    df: DataFrame,
    cols: Sequence[ColumnLike],
    bins: Any = 10,
    range: Any = None,
    normed: Any = None,
    weights: WeightLike = None,
    density: bool = False,
    *,
    histogram: Any = None,
    sample: ColumnLike | None = None,
    sample_shift: float = 0.0,
    storage: Storage | None = None,
    threads: Any = None,
) -> Any:
    """N-dimensional histogram over DataFrame columns.

    ``histogram=Histogram`` (the :mod:`.object_api` class) switches to
    object-based output: the return is a *staged, uncomputed*
    :class:`~.object_api.Histogram` whose single fill is already queued
    — reference ``boost.histogramdd(histogram=dhb.Histogram)``
    (boost.py:446-656, staged-return at :652-656).  Any other value
    keeps the array-style :class:`AggHistogram` return.  ``density``
    with object output raises (reference boost.py:622-626).
    """
    _common_checks(normed, threads)
    if density and histogram is not None:
        raise KeyError(
            "density is not supported when returning a Histogram object "
            "(reference parity: boost.py:622-626)"
        )
    cols = list(cols)
    if storage is None:
        if weights is not None and sample is not None:
            storage = Storage.WEIGHTED_MEAN
        elif sample is not None:
            storage = Storage.MEAN
        elif weights is not None:
            storage = Storage.WEIGHT
        else:
            storage = Storage.DOUBLE
    axes = axes_from_bins_range(len(cols), bins, range)
    from .object_api import Histogram as _ObjHistogram

    if histogram is not None and histogram == _ObjHistogram:
        return _ObjHistogram(*axes, storage=storage,
                             sample_shift=sample_shift).fill(
            df, *cols, weight=weights, sample=sample
        )
    spec = HistogramSpec(axes=axes, storage=storage,
                         sample_shift=sample_shift)
    sparse = fill(df, cols, spec, weight=weights, sample=sample)
    h = AggHistogram(sparse, spec)
    h._density_requested = bool(density)  # honored by AggHistogram.to_numpy
    return h


def histogram(
    df: DataFrame,
    col: ColumnLike,
    bins: Any = 10,
    range: Any = None,
    normed: Any = None,
    weights: WeightLike = None,
    density: bool = False,
    **kwargs: Any,
) -> AggHistogram:
    """1D histogram (np.histogram-style; reference routines.py:29-128).

    Examples
    --------
    >>> from dask_histogram_spark.session import get_spark
    >>> import dask_histogram_spark as dhs
    >>> spark = get_spark("doctest", cpus=2)
    >>> df = spark.createDataFrame([(0.5,), (1.5,), (1.7,), (3.5,)], "x double")
    >>> counts, edges = dhs.histogram(df, "x", bins=4, range=(0.0, 4.0)).to_numpy()
    >>> counts.tolist()
    [1.0, 2.0, 0.0, 1.0]
    >>> edges[0].tolist()
    [0.0, 1.0, 2.0, 3.0, 4.0]
    """
    return histogramdd(df, [col], bins=bins, range=range, normed=normed,
                       weights=weights, density=density, **kwargs)


def histogram2d(
    df: DataFrame,
    x: ColumnLike,
    y: ColumnLike,
    bins: Any = 10,
    range: Any = None,
    normed: Any = None,
    weights: WeightLike = None,
    density: bool = False,
    **kwargs: Any,
) -> AggHistogram:
    """2D histogram (reference routines.py:131-253)."""
    return histogramdd(df, [x, y], bins=bins, range=range, normed=normed,
                       weights=weights, density=density, **kwargs)
