"""boost_histogram interop shim (reference core.py:677-683 returns a
real ``bh.Histogram``; boost.py:139-146 post-computes into
``_in_memory_type``).  The package is optional — the roundtrip tests
skip when absent, and the absence contract (helpful error) is always
tested."""

from __future__ import annotations

import importlib.util

import numpy as np
import pytest

import dask_histogram_spark as dhs

HAS_BH = importlib.util.find_spec("boost_histogram") is not None


@pytest.mark.skipif(HAS_BH, reason="boost_histogram installed")
def test_to_boost_absent_raises_with_guidance(spark, gauss1d):
    df, _ = gauss1d
    h = dhs.histogram(df, "x", bins=5, range=(-3, 3))
    with pytest.raises(ModuleNotFoundError, match="boost_histogram"):
        h.to_boost()


@pytest.mark.skipif(not HAS_BH, reason="boost_histogram not installed")
def test_to_boost_weight_roundtrip(spark, gauss1d):
    """Mirrors reference tests/test_boost.py:536-556: contents, axis
    name (as metadata) and histogram metadata propagate."""
    import boost_histogram as bh

    df, pdf = gauss1d
    spec = dhs.HistogramSpec(
        axes=(dhs.Regular(7, -3, 3, name="x"),),
        storage=dhs.Storage.WEIGHT,
        metadata={"src": "gauss1d"},
    )
    h = dhs.AggHistogram(dhs.fill(df, ["x"], spec, weight="w"), spec)
    b = h.to_boost()
    assert isinstance(b, bh.Histogram)
    np.testing.assert_allclose(b.view(flow=True)["value"],
                               h.values(flow=True))
    np.testing.assert_allclose(b.view(flow=True)["variance"],
                               h.variances(flow=True))
    assert b.axes[0].metadata == "x"
    assert b.metadata == {"src": "gauss1d"}
    # oracle twin: eager boost fill of the same collected data
    ref = bh.Histogram(bh.axis.Regular(7, -3, 3),
                       storage=bh.storage.Weight())
    ref.fill(pdf["x"], weight=pdf["w"])
    np.testing.assert_allclose(b.view(flow=True)["value"],
                               ref.view(flow=True)["value"])
    np.testing.assert_allclose(b.view(flow=True)["variance"],
                               ref.view(flow=True)["variance"])


@pytest.mark.skipif(not HAS_BH, reason="boost_histogram not installed")
def test_to_boost_mean_storage(spark, gauss1d):
    import boost_histogram as bh

    df, pdf = gauss1d
    h = dhs.histogramdd(df, ["x"], bins=5, range=((-3, 3),), sample="s",
                        storage=dhs.Storage.MEAN)
    b = h.to_boost()
    ref = bh.Histogram(bh.axis.Regular(5, -3, 3), storage=bh.storage.Mean())
    ref.fill(pdf["x"], sample=pdf["s"])
    np.testing.assert_allclose(b.view(flow=True)["count"],
                               ref.view(flow=True)["count"])
    np.testing.assert_allclose(b.view(flow=True)["value"],
                               ref.view(flow=True)["value"], rtol=1e-10)


def test_object_api_to_boost_passthrough(spark, gauss1d):
    df, _ = gauss1d
    h = dhs.Histogram(dhs.Regular(5, -3, 3))
    h.fill(df, "x")
    if HAS_BH:
        import boost_histogram as bh

        assert isinstance(h.to_boost(), bh.Histogram)
    else:
        with pytest.raises(ModuleNotFoundError, match="boost_histogram"):
            h.to_boost()
