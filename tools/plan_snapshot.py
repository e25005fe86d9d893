"""Physical-plan snapshot: per gate query, the plan-shape metrics that
define its scale behavior — exchange (shuffle) count, join operator
census, aggregate count, cartesian presence.

Writes ``plans_baseline.json`` at the repo root. The companion test
(tests/test_plan_audit.py::test_plan_shapes_match_baseline) fails when
a query's plan gains a shuffle or changes join strategy unexpectedly —
the regression net for "a refactor quietly made this quadratic /
added an exchange". Regenerate deliberately after intended plan
changes:

    python tools/plan_snapshot.py
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans_baseline.json")

JOIN_OPS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def plan_shape(plan: str) -> dict:
    """Extract the scale-defining metrics from an executed-plan string."""
    shape = {
        # Exchange covers shuffle exchanges; broadcast exchanges counted apart
        "shuffles": len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan)),
        "broadcasts": plan.count("BroadcastExchange"),
        "aggregates": plan.count("HashAggregate") + plan.count("SortAggregate")
        + plan.count("ObjectHashAggregate"),
        "windows": len(re.findall(r"\bWindow\b", plan)),
    }
    joins = {op: plan.count(op) for op in JOIN_OPS if plan.count(op)}
    if joins:
        shape["joins"] = joins
    return shape


def snapshot(entry_mod, spark) -> dict[str, dict]:
    out = {}
    for name, fn in sorted(entry_mod.queries().items()):
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        out[name] = plan_shape(plan)
    return out


def main() -> None:
    import importlib.util

    from flyq_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "spark_entry_for_snapshot",
        os.path.join(os.path.dirname(OUT), "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    spark = get_spark("plan_snapshot", shuffle_partitions=8)
    shapes = snapshot(mod, spark)
    with open(OUT, "w") as f:
        json.dump(shapes, f, indent=1, sort_keys=True)
    print(f"wrote {OUT}: {len(shapes)} plans")
    spark.stop()


if __name__ == "__main__":
    main()
