"""Shared fixtures: one SparkSession per test run; a small generated site."""

from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


@pytest.fixture(scope="session")
def spark():
    from crawl4ai_custom_spark.session import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def site_dir(tmp_path_factory):
    """Small deterministic crawl site (pages/seeds/robots parquet)."""
    from crawl4ai_custom_spark.sources.datagen import write_dataset

    d = str(tmp_path_factory.mktemp("site"))
    write_dataset(d, n_pages=120, n_domains=4)
    return d


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
