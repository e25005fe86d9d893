"""Capture .explain('formatted') for every bench HEADLINE query into
plans/<tag>/<query>_<suffix>.txt — the before/after evidence files for
optimization rounds. Usage:

    python tools/capture_plans.py <tag> <suffix> [query ...]

e.g.  python tools/capture_plans.py r12 before
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])

    import bench
    import __spark_entry__ as entry_mod
    from flyq_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan_capture")
    qs = entry_mod.queries()
    names = [n for n, _ in bench.HEADLINE if not only or n in only]
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 - record, keep going
            plan = f"PLAN CAPTURE FAILED: {e!r}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan + "\n")
        print(name, "ok" if "FAILED" not in plan[:40] else "FAILED")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
