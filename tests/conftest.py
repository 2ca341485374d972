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


def _patch_collect_socket_close() -> None:
    """Close the collect()-result socket deterministically (r8 verdict
    task 8 — the 'unclosed socket' PytestUnraisableExceptionWarning).

    Instrumented root cause (socket-creation stacks matched to the
    warning's laddr): pyspark.util._load_from_socket opens the local
    result socket for every collect()/toPandas() and — per its own
    comment — leaves BOTH the buffered file and the raw socket 'to be
    automatically closed when garbage-collected'. CPython then emits the
    ResourceWarning from socket.__del__ (the socket is still OPEN at
    collection), and pytest's unraisable hook turns it into a warning in
    whichever test happens to trigger that GC. (The py4j thread-local
    connection deque was investigated and exonerated: all its
    connections end up closed or parked in the deque.)

    Fix at the choke point: wrap _create_local_socket (looked up via
    pyspark.util module globals at call time, so every bound importer of
    _load_from_socket inherits it) and attach weakref.finalize(sockfile,
    sock.close). The finalize closure keeps the raw socket alive until
    the buffered file is collected, then CLOSES it — so by the time
    socket.__del__ runs, the socket is closed and no warning fires.
    Ordering is guaranteed: sock cannot be collected before the callback
    that references it has run. The suite now runs clean with no
    ``filterwarnings`` entries at all."""
    import weakref

    import pyspark.util as pu

    if getattr(pu, "_she_collect_socket_patch", False):
        return
    orig = pu._create_local_socket

    def _create_local_socket(sock_info):
        sockfile, sock = pu.local_connect_and_auth(sock_info[0], sock_info[1])
        # mirrors the original: RDD materialization time is unpredictable,
        # never time out the read side (SPARK-18281)
        sock.settimeout(None)
        weakref.finalize(sockfile, sock.close)
        return sockfile

    _create_local_socket._she_orig = orig
    pu._create_local_socket = _create_local_socket
    pu._she_collect_socket_patch = True


_patch_collect_socket_close()

# small shuffle fan-out: sf0.001 fits in a handful of partitions and the
# test suite is latency-bound on task scheduling, not data.
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from streamline_hybrid_engine_spark.session import get_session

    s = get_session("she-tests")
    yield s
    # grab the gateway BEFORE stop() (stop clears the active context) and
    # shut it down explicitly: py4j's client sockets otherwise linger
    # until CPython GC notices them mid-collection, which surfaces as a
    # PytestUnraisableExceptionWarning in whichever test happens to
    # trigger the collection (r8 verdict hygiene item: close the socket,
    # don't widen the filter)
    gw = getattr(s.sparkContext, "_gateway", None)
    s.stop()
    if gw is not None:
        gw.shutdown()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    from tools.parity import duck_con

    return duck_con(SF_DIR)
