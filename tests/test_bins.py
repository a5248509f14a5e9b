"""Bins/range normalization contract (reference: tests/test_bins.py).

Pure driver-side unit tests — no Spark session needed.
"""

from __future__ import annotations

import numpy as np
import pytest

from dask_histogram_spark.bins import BinsStyle, bins_style, normalize_bins_range
from dask_histogram_spark.routines import axes_from_bins_range
from dask_histogram_spark.spec import Regular, Variable


def test_single_scalar():
    assert bins_style(1, 10) is BinsStyle.SingleScalar
    assert bins_style(3, 10) is BinsStyle.SingleScalar


def test_multi_scalar():
    assert bins_style(2, [4, 5]) is BinsStyle.MultiScalar
    assert bins_style(3, (4, 5, 6)) is BinsStyle.MultiScalar


def test_single_sequence_1d():
    assert bins_style(1, [1.0, 2.0, 3.0]) is BinsStyle.SingleSequence
    # ints in 1D are edges too
    assert bins_style(1, [1, 2, 3]) is BinsStyle.SingleSequence


def test_multi_sequence():
    assert bins_style(2, [[1, 2], [3, 4, 5]]) is BinsStyle.MultiSequence


def test_bins_length_mismatch_raises():
    with pytest.raises(ValueError, match="number of dimensions"):
        bins_style(3, [4, 5])
    with pytest.raises(ValueError, match="number of dimensions"):
        bins_style(2, [[1, 2], [3, 4], [5, 6]])


def test_normalize_broadcast():
    bins_pd, range_pd = normalize_bins_range(3, 10, (0, 1))
    assert bins_pd == (10, 10, 10)
    assert range_pd == ((0.0, 1.0),) * 3


def test_normalize_per_dim():
    bins_pd, range_pd = normalize_bins_range(2, [4, 5], [(0, 1), (2, 3)])
    assert bins_pd == (4, 5)
    assert range_pd == ((0.0, 1.0), (2.0, 3.0))


def test_normalize_edges_ignore_range():
    bins_pd, range_pd = normalize_bins_range(1, [0.0, 0.5, 1.0], None)
    np.testing.assert_array_equal(bins_pd[0], [0.0, 0.5, 1.0])
    assert range_pd == (None,)


def test_scalar_bins_need_range():
    with pytest.raises(ValueError, match="range"):
        normalize_bins_range(1, 10, None)


def test_range_pair_count_mismatch():
    with pytest.raises(ValueError, match="per dimension"):
        normalize_bins_range(3, 4, [(0, 1), (0, 1)])


def test_axes_construction():
    axes = axes_from_bins_range(2, [4, [0.0, 1.0, 2.0]], ((0, 1), None))
    assert axes[0] == Regular(4, 0.0, 1.0)
    assert isinstance(axes[1], Variable)
    assert axes[1].nbins == 2


def test_regular_validation():
    with pytest.raises(ValueError):
        Regular(0, 0, 1)
    with pytest.raises(ValueError):
        Regular(5, 1, 1)
