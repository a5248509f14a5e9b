"""Histogram specification: axes, storages, and the HistogramSpec carrier.

Spark-native re-expression of the reference's axis/storage data model
(reference: ``src/dask_histogram/core.py:41-60`` ``histref`` clone /
``boost.py:104-110`` picklable axis tuples).  In the reference the schema
travels as an *empty boost_histogram.Histogram*; here it is a plain
dataclass from which aggregation expressions are generated (the Spark
analog of "clone per task" is that every query derives its agg exprs
from the spec).

Storage accumulator semantics per SURVEY.md §2.4:

=============  ==============================  ==========  ==============
Storage        accumulates per bin             values()    variances()
=============  ==============================  ==========  ==============
DOUBLE         sum of weights (1.0 each)       sum w       n/a
INT64          integer count                   count       n/a
WEIGHT         (sum w, sum w^2)                sum w       sum w^2
MEAN           (n, sum s, sum s^2)             mean        ssd/(n-1)
WEIGHTED_MEAN  (sum w, sum w^2, sum ws, ws^2)  w-mean      w-sample-var
=============  ==============================  ==========  ==============
"""

from __future__ import annotations

import enum
import math
from dataclasses import dataclass, field
from typing import Any, Sequence, Union

import numpy as np

__all__ = [
    "Axis",
    "Regular",
    "Variable",
    "IntCategory",
    "StrCategory",
    "Boolean",
    "Integer",
    "Storage",
    "HistogramSpec",
]


class Storage(enum.Enum):
    """Per-bin accumulator type (reference: boost_histogram.storage.*)."""

    DOUBLE = "double"
    INT64 = "int64"
    ATOMIC_INT64 = "atomic_int64"  # same semantics as INT64 in this engine
    WEIGHT = "weight"
    MEAN = "mean"
    WEIGHTED_MEAN = "weighted_mean"

    @property
    def needs_weight(self) -> bool:
        return self in (Storage.WEIGHT, Storage.WEIGHTED_MEAN)

    @property
    def needs_sample(self) -> bool:
        return self in (Storage.MEAN, Storage.WEIGHTED_MEAN)

    @property
    def has_variance(self) -> bool:
        return self in (Storage.WEIGHT, Storage.MEAN, Storage.WEIGHTED_MEAN)

    @property
    def int_valued(self) -> bool:
        """Dense output dtype is integer (reference: core.py:1138-1142)."""
        return self in (Storage.INT64, Storage.ATOMIC_INT64)


class Axis:
    """Base class for axis (bin-space) definitions.

    Subclasses define ``nbins`` (in-range bins), whether the axis carries
    underflow/overflow flow bins, and the dense-output ``edges``.
    """

    has_flow: bool = True
    growth: bool = False

    @property
    def nbins(self) -> int:  # pragma: no cover - abstract
        raise NotImplementedError

    @property
    def nbins_with_flow(self) -> int:
        return self.nbins + (2 if self.has_flow else 0)

    def edges(self) -> np.ndarray:  # pragma: no cover - abstract
        raise NotImplementedError

    def widths(self) -> np.ndarray:
        e = self.edges()
        return np.diff(e)


@dataclass(frozen=True)
class Regular(Axis):
    """Uniform binning: ``n`` bins on the half-open interval [lo, hi).

    Values with x == hi (and NaN/NULL) land in overflow; x < lo in
    underflow — boost-histogram Regular-axis semantics, which the
    reference's tests compare on via ``counts(flow=True)``
    (reference: tests/test_core.py:44).
    """

    n: int
    lo: float
    hi: float
    name: str | None = None

    def __post_init__(self) -> None:
        if self.n <= 0:
            raise ValueError(f"number of bins must be positive, got {self.n}")
        if not (self.lo < self.hi):
            raise ValueError(f"axis range must satisfy lo < hi, got ({self.lo}, {self.hi})")
        if math.isnan(self.lo) or math.isnan(self.hi):
            raise ValueError("axis range must be finite")

    @property
    def nbins(self) -> int:
        return self.n

    def edges(self) -> np.ndarray:
        return np.linspace(self.lo, self.hi, self.n + 1)


@dataclass(frozen=True)
class Variable(Axis):
    """Explicit monotonically-increasing bin edges (nbins = len(edges)-1)."""

    edge_list: tuple[float, ...]
    name: str | None = None

    def __init__(self, edges: Sequence[float], name: str | None = None) -> None:
        edges = tuple(float(e) for e in edges)
        if len(edges) < 2:
            raise ValueError("Variable axis needs at least two edges")
        if any(b <= a for a, b in zip(edges, edges[1:])):
            raise ValueError("Variable axis edges must be strictly increasing")
        object.__setattr__(self, "edge_list", edges)
        object.__setattr__(self, "name", name)

    @property
    def nbins(self) -> int:
        return len(self.edge_list) - 1

    def edges(self) -> np.ndarray:
        return np.asarray(self.edge_list, dtype=np.float64)


@dataclass(frozen=True)
class Integer(Axis):
    """One bin per integer in [lo, hi) — sugar over Regular with unit bins."""

    lo: int
    hi: int
    name: str | None = None

    @property
    def nbins(self) -> int:
        return self.hi - self.lo

    def edges(self) -> np.ndarray:
        return np.arange(self.lo, self.hi + 1, dtype=np.float64)


@dataclass(frozen=True)
class Boolean(Axis):
    """Two bins: False, True. No flow."""

    name: str | None = None
    has_flow = False

    @property
    def nbins(self) -> int:
        return 2

    def edges(self) -> np.ndarray:
        return np.array([0.0, 1.0, 2.0])


@dataclass(frozen=True)
class _CategoryAxis(Axis):
    """Category axis: group directly on the raw column value.

    ``growth=True`` categories are discovered from the data — Spark's
    groupBy "grows" naturally (reference: tests/test_boost.py:114-154).
    With pinned categories (growth=False) out-of-set values land in a
    single overflow slot.
    """

    categories: tuple = ()
    growth: bool = True
    name: str | None = None
    has_flow = False

    @property
    def nbins(self) -> int:
        return len(self.categories)

    def edges(self) -> np.ndarray:
        # Dense output positions 0..ncat-1; edges are ordinal.
        return np.arange(len(self.categories) + 1, dtype=np.float64)


@dataclass(frozen=True)
class IntCategory(_CategoryAxis):
    def __init__(self, categories: Sequence[int] = (), growth: bool = True,
                 name: str | None = None) -> None:
        object.__setattr__(self, "categories", tuple(int(c) for c in categories))
        object.__setattr__(self, "growth", bool(growth))
        object.__setattr__(self, "name", name)


@dataclass(frozen=True)
class StrCategory(_CategoryAxis):
    def __init__(self, categories: Sequence[str] = (), growth: bool = True,
                 name: str | None = None) -> None:
        object.__setattr__(self, "categories", tuple(str(c) for c in categories))
        object.__setattr__(self, "growth", bool(growth))
        object.__setattr__(self, "name", name)


AxisLike = Union[Regular, Variable, Integer, Boolean, IntCategory, StrCategory]


@dataclass(frozen=True)
class HistogramSpec:
    """Driver-side schema/metadata carrier — the engine's ``histref``.

    Reference parity: core.py:41-60 (clone), boost.py:104-110 (picklable
    tuple form).  Pure metadata; all Spark agg expressions derive from it.
    """

    axes: tuple[AxisLike, ...]
    storage: Storage = Storage.DOUBLE
    metadata: Any = None
    # Numerical-stability shift for moment storages (MEAN /
    # WEIGHTED_MEAN): accumulators sum (s - K) and (s - K)^2 instead of
    # s and s^2.  The sample variance is shift-invariant, and the mean
    # is reconstructed as K + sum/count at materialization, so any K
    # near the data's magnitude kills the catastrophic cancellation of
    # sum(s^2) - sum(s)^2/n at large mean / small variance (measured:
    # 130x relative error at mean 1e6, sigma 1e-3 unshifted; exact to
    # float ulp shifted).  K is part of the spec, so every partial fill
    # and the SQL oracle twin share it and the plain-sum monoid
    # (collapse/project/merge) is preserved.  Default 0.0 = unshifted.
    sample_shift: float = 0.0

    def __post_init__(self) -> None:
        if not self.axes:
            raise ValueError("HistogramSpec needs at least one axis")
        if not isinstance(self.storage, Storage):
            # accept boost-style storage shims (storage.Weight() etc.,
            # reference-parity spelling) via their `enum` attribute
            e = getattr(self.storage, "enum", None)
            if not isinstance(e, Storage):
                raise TypeError(
                    f"storage must be a Storage enum or a storage.* shim; "
                    f"got {self.storage!r}"
                )
            object.__setattr__(self, "storage", e)

    @property
    def ndim(self) -> int:
        return len(self.axes)

    @property
    def bin_cols(self) -> tuple[str, ...]:
        """Names of the bin-index columns in the sparse result DataFrame."""
        return tuple(f"bin_{i}" for i in range(self.ndim))

    @property
    def value_cols(self) -> tuple[str, ...]:
        """Accumulator column names in the sparse result DataFrame."""
        if self.storage in (Storage.DOUBLE, Storage.INT64, Storage.ATOMIC_INT64):
            return ("value",)
        if self.storage is Storage.WEIGHT:
            return ("value", "sumw2")
        if self.storage is Storage.MEAN:
            return ("count", "sum_s", "sum_s2")
        if self.storage is Storage.WEIGHTED_MEAN:
            return ("sum_w", "sum_w2", "sum_ws", "sum_ws2")
        raise AssertionError(self.storage)

    def dense_shape(self, flow: bool = True) -> tuple[int, ...]:
        return tuple(
            (ax.nbins_with_flow if flow else ax.nbins) for ax in self.axes
        )
