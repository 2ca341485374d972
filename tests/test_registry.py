"""Registry contract invariants — what the driver relies on."""

from __future__ import annotations

import subprocess
import sys

from streamline_hybrid_engine_spark.registry import all_queries


def test_registry_loads_and_is_nonempty():
    qs = all_queries()
    assert len(qs) >= 70


def test_query_names_are_wellformed():
    for name in all_queries():
        assert name.replace("_", "").isalnum() and name == name.lower()


def test_most_queries_have_oracles():
    """Streaming/approx ops may be rows-only; everything else needs an oracle."""
    qs = all_queries()
    no_oracle = {n for n, q in qs.items() if q.oracle is None}
    for name in no_oracle:
        assert any(
            t in ("streaming", "approx") for t in qs[name].tags
        ), f"{name} lacks an oracle but is not tagged streaming/approx"
    assert len(no_oracle) <= len(qs) * 0.2


def test_entry_module_importable_without_spark_session():
    """The driver may call queries()/oracle_sql() before any session exists.

    Run in a clean interpreter: importing the whole registry (incl. pandas
    UDF modules) must not require an active SparkContext.
    """
    code = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "import __spark_entry__ as e;"
        "q = e.queries(); o = e.oracle_sql();"
        "assert len(q) >= 70 and set(o) <= set(q);"
        "print(len(q))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert out.returncode == 0, out.stderr[-2000:]


def test_docstrings_present():
    for name, q in all_queries().items():
        assert q.doc.strip(), f"{name} has no docstring"
