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


def window_specs(plan: str) -> list[str]:
    """Each windowspecdefinition(...) argument list in an executed-plan
    string, paren-balanced (specs nest function calls in their keys)."""
    out = []
    needle = "windowspecdefinition("
    i = 0
    while True:
        j = plan.find(needle, i)
        if j < 0:
            break
        k = j + len(needle)
        depth = 1
        start = k
        while k < len(plan) and depth:
            if plan[k] == "(":
                depth += 1
            elif plan[k] == ")":
                depth -= 1
            k += 1
        out.append(plan[start : k - 1])
        i = k
    return out


def _first_arg(spec: str) -> str:
    depth = 0
    for i, c in enumerate(spec):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            return spec[:i].strip()
    return spec.strip()


def partitionless_specs(plan: str) -> list[str]:
    """Window specs with NO partition columns — the first spec argument
    is already an ORDER column (carries an ASC/DESC marker) or directly
    the frame. These compile to Exchange SinglePartition + one sort
    task holding the window's whole input: fatal when that input is
    data-sized, fine when it is bounded by configuration (a ≤P
    shard-offset table, a post-limit top-k). Returns the first ordering
    column of each offending spec."""
    bad = []
    for spec in window_specs(plan):
        fa = _first_arg(spec)
        if " ASC" in fa or " DESC" in fa or fa.startswith("specifiedwindowframe"):
            bad.append(fa)
    return bad


def _top_level_args(spec: str) -> list[str]:
    args, depth, cur = [], 0, []
    for ch in spec:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    args.append("".join(cur).strip())
    return args


def window_partition_keys(spec: str) -> list[str]:
    """The PARTITION BY attributes of a windowspecdefinition argument
    list: the leading args before the first ordering column (carries an
    ASC/DESC marker) or the frame."""
    keys = []
    for a in _top_level_args(spec):
        if " ASC" in a or " DESC" in a or a.startswith("specifiedwindowframe"):
            break
        keys.append(a)
    return keys


def lowcard_window_specs(plan: str, lowcard_cols) -> list[str]:
    """Window specs whose EVERY partition key is a declared
    constant-cardinality column (event_type ≈ 5 values, source, lang) —
    the one-level-down variant of the partition-less disease: at 10⁹
    rows a rank/NTILE/cumsum window keyed only by a ~5-value column is
    5 tasks each sorting N/5 rows. Fine when the window's input is
    BOUNDED (a date-aggregated series, a sketch table); fatal over
    data-sized input — the grouped primitives in operators/ranking.py
    are the scalable form. Returns 'col1,col2' key-name strings of each
    offending spec."""
    bad = []
    for spec in window_specs(plan):
        keys = window_partition_keys(spec)
        names = [k.split("#")[0] for k in keys]
        if names and all(n in lowcard_cols for n in names):
            bad.append(",".join(names))
    return bad


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
