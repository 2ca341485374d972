"""Shared fixtures: one local SparkSession + the sf0.001 fixture lake.

Mirrors the reference's MiniCluster ITCase pattern (SURVEY §5.1): a single
shared local cluster per test session, tiny data, collect+assert.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SHE_TEST_SF_DIR", "/root/testdata/sf0.001")

# small shuffle fan-out: sf0.001 fits in a handful of partitions and the
# test suite is latency-bound on task scheduling, not data.
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from streamline_hybrid_engine_spark.session import get_session

    s = get_session("she-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    from tools.parity import duck_con

    return duck_con(SF_DIR)
