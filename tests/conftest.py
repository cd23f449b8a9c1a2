from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mnemo_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("MNEMO_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # MNEMO_TEST_CPUS: tools/partest.py runs N pytest processes with
    # local[4] each — 8x4 saturates the box better than one local[8]
    # session walking the suite serially
    s = get_spark("mnemo_tests", cpus=int(os.environ.get("MNEMO_TEST_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
