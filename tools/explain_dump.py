#!/usr/bin/env python
"""Dump .explain("formatted") for registry queries to plans/r12/.

Usage: python tools/explain_dump.py <suffix> id1 id2 ...
       python tools/explain_dump.py before llm_knn_ivf graph_modularity

Writes plans/r12/<id>_<suffix>.txt with the formatted physical plan of the
DataFrame the registry callable returns, at $SPARK_GRAFT_SF_DIR. Queries
whose callable runs internal driver actions (iterative loops, scalar
collects) show the FINAL plan only — loop-internal round plans are pinned
by tests/test_plans.py instead; that caveat is noted in the file header.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    from streamline_hybrid_engine_spark.registry import all_queries
    from streamline_hybrid_engine_spark.session import default_sf_dir, get_session

    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = default_sf_dir()
    spark = get_session("explain-dump")
    qs = all_queries()
    out_dir = os.path.join(_REPO, "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name].fn(spark, sf_dir)
        # noqa: internal API — same accessor spark uses for .explain(), but
        # returning the string instead of printing
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {name} — explain('formatted') of the returned DataFrame\n"
                f"# sf_dir={sf_dir}\n"
                "# NOTE: iterative queries run loop rounds as separate jobs\n"
                "# inside the callable; this file shows the final/returned\n"
                "# plan. Loop-round plan shapes are pinned in tests/test_plans.py.\n\n"
            )
            f.write(plan + "\n")
        print(path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
