"""``storage`` namespace alias — reference parity.

The reference re-exports ``boost_histogram.storage`` (reference
``__init__.py:20-23``) so user code writes
``storage=dh.storage.Weight()``.  These shims are accepted anywhere a
:class:`~.spec.Storage` enum is (``HistogramSpec`` coerces via the
``enum`` attribute), so reference call sites port verbatim.
"""

from __future__ import annotations

from .spec import Storage

__all__ = ["Double", "Int64", "AtomicInt64", "Weight", "Mean",
           "WeightedMean"]


class _StorageShim:
    enum: Storage

    def __repr__(self) -> str:  # boost-style repr: Weight()
        return f"{type(self).__name__}()"

    def __eq__(self, other: object) -> bool:
        return (isinstance(other, _StorageShim) and other.enum is self.enum) \
            or other is self.enum

    def __hash__(self) -> int:
        return hash(self.enum)


class Double(_StorageShim):
    enum = Storage.DOUBLE


class Int64(_StorageShim):
    enum = Storage.INT64


class AtomicInt64(_StorageShim):
    enum = Storage.ATOMIC_INT64


class Weight(_StorageShim):
    enum = Storage.WEIGHT


class Mean(_StorageShim):
    enum = Storage.MEAN


class WeightedMean(_StorageShim):
    enum = Storage.WEIGHTED_MEAN
