"""Normalization of NumPy-style ``bins``/``range`` arguments.

Re-implements the argument contract of the reference's ``bins.py``
(``bins_style`` bins.py:33-89, ``bins_range_styles`` bins.py:92-157,
``normalize_bins_range`` bins.py:160-205): classify the many accepted
forms of ``bins`` and ``range`` and broadcast them to one
``(bins, range)`` pair per dimension.  Pure driver-side Python — no
Spark involvement.

Accepted forms (D = number of dimensions):
  * bins=int                          -> same bin count every dim (range required per dim)
  * bins=[int, int, ...] (len D)      -> per-dim counts (range required per dim)
  * bins=array of edges               -> single dim, explicit edges
  * bins=[array, array, ...] (len D)  -> per-dim explicit edges
  * range=(lo, hi)                    -> broadcast to every dim
  * range=[(lo, hi), ...] (len D)     -> per-dim ranges
"""

from __future__ import annotations

import enum
from typing import Any, Sequence

import numpy as np

__all__ = ["BinsStyle", "RangeStyle", "bins_style", "normalize_bins_range"]


class BinsStyle(enum.Enum):
    SingleScalar = enum.auto()
    MultiScalar = enum.auto()
    SingleSequence = enum.auto()
    MultiSequence = enum.auto()


class RangeStyle(enum.Enum):
    IsNone = enum.auto()
    SinglePair = enum.auto()
    MultiPair = enum.auto()


def _is_scalar_int(b: Any) -> bool:
    return isinstance(b, (int, np.integer)) and not isinstance(b, bool)


def bins_style(ndim: int, bins: Any) -> BinsStyle:
    """Classify the ``bins`` argument (reference: bins.py:33-89)."""
    if _is_scalar_int(bins):
        return BinsStyle.SingleScalar
    if isinstance(bins, (list, tuple, np.ndarray)):
        seq = list(bins)
        if len(seq) == 0:
            raise ValueError("bins sequence cannot be empty")
        if all(_is_scalar_int(b) for b in seq):
            # A flat sequence of ints: per-dim counts if len==D, else (for
            # 1D) it is a (tiny) edges array.
            if len(seq) == ndim and ndim > 1:
                return BinsStyle.MultiScalar
            if ndim == 1:
                return BinsStyle.SingleSequence
            raise ValueError(
                f"bins must have length equal to the number of dimensions "
                f"({ndim}); got {len(seq)}"
            )
        if all(
            isinstance(b, (list, tuple, np.ndarray)) or _is_scalar_int(b)
            for b in seq
        ):
            # sequences (or a numpy-style mix of per-dim counts and edge
            # arrays), one entry per dimension
            if len(seq) != ndim:
                raise ValueError(
                    f"bins must have length equal to the number of dimensions "
                    f"({ndim}); got {len(seq)}"
                )
            return BinsStyle.MultiSequence
        if ndim == 1:
            return BinsStyle.SingleSequence
        raise ValueError(f"Could not interpret bins argument: {bins!r}")
    raise ValueError(f"Could not interpret bins argument: {bins!r}")


def _range_style(ndim: int, range: Any) -> RangeStyle:
    if range is None:
        return RangeStyle.IsNone
    seq = list(range)
    if len(seq) == 2 and all(isinstance(r, (int, float, np.floating, np.integer)) for r in seq):
        return RangeStyle.SinglePair
    if all(
        r is None or (isinstance(r, (list, tuple, np.ndarray)) and len(list(r)) == 2)
        for r in seq
    ):
        if len(seq) != ndim:
            raise ValueError(
                f"range must have one (lo, hi) pair per dimension ({ndim}); "
                f"got {len(seq)}"
            )
        return RangeStyle.MultiPair
    raise ValueError(f"Could not interpret range argument: {range!r}")


def normalize_bins_range(
    ndim: int, bins: Any, range: Any
) -> tuple[tuple[Any, ...], tuple[Any, ...]]:
    """Broadcast ``bins``/``range`` to per-dimension tuples.

    Returns ``(bins_per_dim, range_per_dim)`` where each entry of
    ``bins_per_dim`` is either an int (count; paired with a (lo, hi)
    range) or an ndarray of edges (paired with ``None``).

    Reference semantics: bins.py:160-205.
    """
    bstyle = bins_style(ndim, bins)
    rstyle = _range_style(ndim, range)

    if bstyle is BinsStyle.SingleScalar:
        bins_pd: tuple[Any, ...] = (int(bins),) * ndim
    elif bstyle is BinsStyle.MultiScalar:
        bins_pd = tuple(int(b) for b in bins)
    elif bstyle is BinsStyle.SingleSequence:
        if ndim != 1:
            raise ValueError(
                "a single edges sequence is only valid for 1D histograms"
            )
        bins_pd = (np.asarray(bins, dtype=np.float64),)
    else:  # MultiSequence (possibly mixed int/edges per dim)
        bins_pd = tuple(
            int(b) if _is_scalar_int(b) else np.asarray(b, dtype=np.float64)
            for b in bins
        )

    scalar_bins = any(isinstance(b, int) for b in bins_pd)

    if rstyle is RangeStyle.IsNone:
        if scalar_bins:
            raise ValueError(
                "integer bins requires range to be defined (data is lazy; "
                "ranges are not inferred from min/max)"
            )
        range_pd: tuple[Any, ...] = (None,) * ndim
    elif rstyle is RangeStyle.SinglePair:
        if not scalar_bins:
            range_pd = (None,) * ndim
        else:
            range_pd = ((float(range[0]), float(range[1])),) * ndim
    else:  # MultiPair
        range_pd = tuple(
            None if r is None else (float(r[0]), float(r[1])) for r in range
        )

    return bins_pd, range_pd
