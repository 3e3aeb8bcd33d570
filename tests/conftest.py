from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from merlin_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("merlin-tests", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def sf_dir_stats():
    """Larger corpus for statistical assertions (stratified-rate and
    split-fraction tolerances need ~500 docs): the sf0.01 sibling of
    the configured sf_dir when present, else sf_dir itself — never a
    hardcoded absolute path (ADVICE r4 #3)."""
    sibling = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01")
    return sibling if os.path.isdir(sibling) else SF_DIR
