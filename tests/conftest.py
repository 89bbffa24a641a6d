from __future__ import annotations

import os

import pytest

os.environ.setdefault("SWINGSTREAM_DRIVER_MEM", "6g")


@pytest.fixture(scope="session")
def spark():
    from swingstream.session import get_spark

    s = get_spark(master=os.environ.get("SWINGSTREAM_TEST_MASTER", "local[8]"),
                  app_name="swingstream-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SWINGSTREAM_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def pages_df():
    """Small deterministic pages fixture shared across Spark tests."""
    from swingstream.fixtures import PagesSpec, gen_pages

    return gen_pages(PagesSpec(n_hosts=4, n_buckets=30, base_docs_per_bucket=4))
