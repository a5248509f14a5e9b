"""Reference top-level-API parity: a user of the reference can port
code with the same spellings (reference __init__.py exports:
AggHistogram, PartitionedHistogram, factory, partitioned_factory,
axis, storage, histogram*, __version__)."""

from __future__ import annotations

import numpy as np

import dask_histogram_spark as dhs


def test_axis_and_storage_namespaces(spark, gauss1d):
    df, pdf = gauss1d
    h = dhs.Histogram(
        dhs.axis.Regular(10, -3, 3),
        storage=dhs.storage.Weight(),
    ).fill(df, "x", weight="w")
    assert h.spec.storage is dhs.Storage.WEIGHT  # shim coerced
    assert h.variances() is not None
    assert repr(dhs.storage.Weight()) == "Weight()"
    assert dhs.storage.Weight() == dhs.storage.Weight()
    assert dhs.__version__


def test_factory_and_partitioned_factory(spark, gauss1d):
    df, pdf = gauss1d
    spec = dhs.HistogramSpec(axes=(dhs.Regular(10, -3, 3),),
                             storage=dhs.storage.Weight())
    h = dhs.factory(df, ["x"], spec, weights="w")
    assert isinstance(h, dhs.AggHistogram)
    ph = dhs.partitioned_factory(df, ["x"], spec, weights="w")
    assert isinstance(ph, dhs.PartitionedHistogram)
    assert "part_id" in ph.to_sparse().columns
    merged = ph.collapse(split_every=4)  # parity no-op knob
    np.testing.assert_allclose(merged.values(flow=True),
                               h.values(flow=True))
    kp = dhs.factory(df, ["x"], spec, weights="w", keep_partitioned=True)
    assert isinstance(kp, dhs.PartitionedHistogram)
