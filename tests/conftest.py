from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multithreaded_map_reduce_library_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
# Oracle-parity suite defaults to the DRIVER'S scale (sf0.01) so CI always
# exercises exactly what the round driver checks; override with
# MTMRL_TEST_SF_DIR=/root/testdata/sf0.001 for a quick iteration loop.
SF_ORACLE = os.environ.get("MTMRL_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mtmrl-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
