"""Shared Spark fixture for the test suite (session-scoped, local mode)."""

from __future__ import annotations

import os

import pytest

from slow_tortoise_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="slow_tortoise_tests", master="local[4]",
                  shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def cube_path(tmp_path_factory):
    """Small synthetic datacube parquet shared by the pipeline e2e tests
    (regions, coords, one qualifier, two features)."""
    import datetime as dt

    import pandas as pd

    def _ms(y, m, d):
        return int(
            dt.datetime(y, m, d, tzinfo=dt.timezone.utc).timestamp() * 1000
        )

    rows = []
    for i in range(40):
        rows.append(
            {
                "timestamp": _ms(2020, 1 + i % 4, 1 + i % 25),
                "country": "Ethiopia" if i % 2 else "Kenya",
                "admin1": f"adm{i % 3}",
                "admin2": None,
                "admin3": None,
                "lat": 10.0 + (i % 7) * 0.01,
                "lng": 40.0 + (i % 5) * 0.01,
                "feature": "rainfall" if i % 3 else "temp",
                "value": float(i + 1),
                "qual1": "qa" if i % 2 else "qb",
            }
        )
    path = str(tmp_path_factory.mktemp("cube") / "cube.parquet")
    pd.DataFrame(rows).to_parquet(path)
    return path
