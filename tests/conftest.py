from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("dhs-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def gauss1d(spark):
    """FIXTURES.md F1: x ~ N(0,1), w ~ U(0.5,0.75), s ~ U(2,8); 2000 rows."""
    rng = np.random.default_rng(42)
    pdf = pd.DataFrame(
        {
            "x": rng.normal(0, 1, 2000),
            "w": rng.uniform(0.5, 0.75, 2000),
            "s": rng.uniform(2, 8, 2000),
        }
    )
    return spark.createDataFrame(pdf).repartition(8), pdf


@pytest.fixture(scope="session")
def gauss_nd(spark):
    """FIXTURES.md F2: c0..c3 ~ N(0,1), w ~ U(0.1,0.75), s ~ U(3,9)."""
    rng = np.random.default_rng(7)
    n = 3000
    pdf = pd.DataFrame({f"c{i}": rng.normal(0, 1, n) for i in range(4)})
    pdf["w"] = rng.uniform(0.1, 0.75, n)
    pdf["s"] = rng.uniform(3, 9, n)
    return spark.createDataFrame(pdf).repartition(5), pdf
