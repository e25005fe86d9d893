"""Repo-wide physical-plan audit: no gate query may compile to a
corpus-sized cartesian/nested-loop join. Queries that intentionally
cross-join a ONE-ROW broadcast aggregate (a scalar subquery in
DataFrame form: O(n) work, not O(n^2)) are allowlisted explicitly so a
new accidental cross join fails loudly.

This is the regression net behind the per-operator plan assertions:
every new queries() entry is audited automatically just by existing.
"""

from __future__ import annotations

import importlib.util

import pytest

SF_DIR = "/root/testdata/sf0.001"

# cross joins against a broadcast 1-row aggregate (scalar subquery form)
SCALAR_BROADCAST_OK = {
    "stream_from_offset",  # leo = max(offset)+1, 1 row
    "retention_time",  # max(ts), 1 row
    "q22_idle_customers",  # (n_pos, sum_pos) threshold, 1 row
    "bm25_top10",  # (N, avgdl) corpus stats, 1 row
    "q11_important_parts",  # sum(value_c) grand total, 1 row
    "q15_top_supplier",  # max(total_revenue_c4), 1 row
    "unigram_surprisal",  # ln(total tokens) corpus normalizer, 1 row
    "heavy_hitter_tokens",  # total-token threshold scalar, 1 row
    "source_overlap",  # |sources|-row HLL sketch table, inequality self-pair
    "fk_integrity",  # per-relation 1-row totals x 1-row orphan counters
    "kmv_overlap",  # |sources|-row sketch-stat self-pair, like source_overlap
    "collocations",  # (total_pairs, total_tokens) corpus stats, 1 row
    "ks_value_drift",  # (n_a, n_b) cohort totals, 1 row
    "ks_drift_matrix",  # pooled row-count total, 1 row
    "temperature_mix",  # 1-row weight-total scalar against |sources| rows
    "cosine_pairs",  # 1-row candidate-bound guard (raise_error regime gate)
    "dsir_resample",  # 1-row total-mass scalar (W, offset) for the ring
    "lm_backoff",  # 1-row train-token total T, the ln T normalizer
    "mixture_build",  # temperature_mix's 1-row weight-total scalar
    "manual_mixture",  # same 1-row weight-total scalar over recipe rows
    "epoch_plan",  # same weight-total scalar via mixture_build
    "epoch_schedule",  # same scalar x3 epochs via mixture_build
    "ppl_select",  # lm_backoff's 1-row train-token total T
    "preference_pairs",  # same 1-row train-token total T (same scorer)
    "ppl_buckets",  # same 1-row train-token total T (same scorer)
}


# Queries whose plans legitimately contain a partition-less window —
# each one's window input is BOUNDED by configuration or a literal,
# never by data volume. Windows whose only ordering key is a
# shard/range-partition marker (_gpid, _shard) are the offset-table
# class (≤ num_partitions rows by construction, operators/ranking.py)
# and are auto-allowed without listing.
GLOBAL_WINDOW_OK = {
    "bm25_top10",  # rank stamp AFTER orderBy().limit(k): window input ≤ k rows
    "top_paths",  # same: rank over the 50 rows TakeOrderedAndProject kept
    "domain_affinity",  # target-profile rank over ≤ dim (4096) hashed buckets
    "collocations",  # rank stamp AFTER orderBy().limit(k): window input ≤ k rows
    "temperature_mix",  # remainder rank over the |sources|-row quota table
    "dsir_resample",  # domain_affinity's profile rank over ≤ 4096 buckets
    "mixture_build",  # temperature_mix's remainder rank over |sources| rows
    "manual_mixture",  # remainder rank over the |recipe|-row quota table
    "epoch_plan",  # same |sources|-row remainder rank via mixture_build
    "epoch_schedule",  # same |sources|-row remainder rank, once per epoch
}
# ordering-marker columns whose windows run over ≤P-row offset tables
_OFFSET_MARKERS = ("_gpid#", "_shard#")

# Columns declared CONSTANT-CARDINALITY: a window whose only partition
# keys come from this set divides the data into a handful of sort
# tasks — the r8-flagged quantile_normalize/winsorize family, one level
# down from the partition-less disease. `_g` is the conventional local
# alias gates give such a column; the grouped primitives in
# operators/ranking.py are the scalable replacement (their offset-table
# windows key on _gg_* marker copies, which are NOT in this set).
LOW_CARD_COLS = {
    "event_type", "source", "lang", "_g", "event_date", "priority",
    "segment", "country",
}

# Gates whose low-card-keyed windows run over BOUNDED input — already
# aggregated to (group, day)-grain series or sketch rows, so the
# window's whole input is calendar- or K-sized, never data-sized.
LOW_CARD_WINDOW_OK = {
    "activity_trend",  # lag over per-(event_type, day) aggregate series
    "cusum_alarms",  # CUSUM scan over per-(event_type, day) series
    "gap_fill_locf",  # LOCF over the (event_type × calendar-day) grid
    "seasonal_naive",  # seasonal lag over per-(event_type, day) series
    "series_dtw",  # windows over per-(event_type, day) series
    "series_similarity",  # z-norm windows over per-(event_type, day) series
    "histogram_quantiles",  # CDF over ≤(groups × buckets) histogram state
    "kmv_overlap",  # rank over ≤(groups × K) sketch rows
    "ppl_buckets",  # CDF over the ≤(lang × 1001)-bin permille histogram
}


@pytest.fixture(scope="module")
def entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_for_audit", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_no_gate_query_has_unexpected_cartesian_or_nlj(spark, entry):
    flagged = {}
    for name, fn in entry.queries().items():
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        hits = [
            op
            for op in ("CartesianProduct", "BroadcastNestedLoopJoin")
            if op in plan
        ]
        if hits and name not in SCALAR_BROADCAST_OK:
            flagged[name] = hits
    assert flagged == {}, f"unexpected quadratic join shapes: {flagged}"


def test_allowlist_entries_still_use_scalar_broadcast(spark, entry):
    """The allowlist must stay honest: each listed query's plan contains
    a broadcast exchange (the 1-row side) — if one is refactored away
    from the scalar-broadcast pattern, prune the allowlist."""
    qs = entry.queries()
    for name in SCALAR_BROADCAST_OK:
        plan = qs[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan, name


def _unbounded_globals(plan: str) -> list[str]:
    from tools.plan_snapshot import partitionless_specs

    # first ordering column like `_gpid#123 ASC NULLS FIRST` → marker
    # prefix `_gpid#` → offset-table class, auto-allowed
    return [
        fa
        for fa in partitionless_specs(plan)
        if not fa.startswith(_OFFSET_MARKERS)
    ]


def test_no_gate_query_has_unbounded_global_window(spark, entry):
    """No gate plan may rank/tile through a partition-less window over
    data-sized input — that is Exchange SinglePartition + ONE sort task
    holding everything (the r7-flagged bm25/rfm/ntile family). Bounded
    exceptions are the explicit allowlist (post-limit top-k stamps,
    literal-dim profiles) plus the auto-allowed _gpid/_shard
    offset-table class from operators/ranking.py."""
    flagged = {}
    for name, fn in entry.queries().items():
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        hits = _unbounded_globals(plan)
        if hits and name not in GLOBAL_WINDOW_OK:
            flagged[name] = sorted({h[:80] for h in hits})
    assert flagged == {}, f"unbounded partition-less windows: {flagged}"


def test_global_window_allowlist_stays_honest(spark, entry):
    """Each GLOBAL_WINDOW_OK entry must still contain a partition-less
    window — when one is refactored away, prune the allowlist so it
    cannot silently shelter a future regression."""
    from tools.plan_snapshot import partitionless_specs

    qs = entry.queries()
    for name in GLOBAL_WINDOW_OK:
        plan = qs[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert partitionless_specs(plan), f"{name}: prune from GLOBAL_WINDOW_OK"


def test_no_gate_query_windows_on_constant_cardinality_keys(spark, entry):
    """No gate plan may rank/tile/cumsum through a window whose only
    partition keys are declared constant-cardinality columns over
    data-sized input — N/|groups| rows in one sort task is the same
    straggler as the partition-less shape divided by a small constant.
    Bounded exceptions (windows over day-grain series or sketch state)
    are allowlisted explicitly."""
    from tools.plan_snapshot import lowcard_window_specs

    flagged = {}
    for name, fn in entry.queries().items():
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        hits = lowcard_window_specs(plan, LOW_CARD_COLS)
        if hits and name not in LOW_CARD_WINDOW_OK:
            flagged[name] = sorted(set(hits))
    assert flagged == {}, f"constant-cardinality group windows: {flagged}"


def test_lowcard_window_allowlist_stays_honest(spark, entry):
    """Each LOW_CARD_WINDOW_OK entry must still contain a low-card-keyed
    window — when one is refactored onto the grouped primitives, prune
    the allowlist so it cannot shelter a future regression."""
    from tools.plan_snapshot import lowcard_window_specs

    qs = entry.queries()
    for name in LOW_CARD_WINDOW_OK:
        plan = qs[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert lowcard_window_specs(plan, LOW_CARD_COLS), (
            f"{name}: prune from LOW_CARD_WINDOW_OK"
        )


def test_streaming_sinks_stay_off_ranking_primitives():
    """The ranking/prefix-sum primitives localCheckpoint per call and
    never unpersist — acceptable for bounded batch sessions, an
    executor-storage leak if a foreachBatch sink calls them once per
    micro-batch forever (operators/ranking.py lifecycle note). Pin the
    contract: no streaming module may import or call the ranking
    module. Source-level, so it catches the refactor BEFORE a
    long-lived stream ships it."""
    import os
    import re

    streaming_dir = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "flyq_spark", "streaming"
    )
    banned = re.compile(
        r"operators\.ranking|operators import ranking|"
        r"grouped_prefix_|global_prefix_|grouped_row_number|"
        r"grouped_ntile|ntile_exact|global_row_number"
    )
    hits = []
    for fname in sorted(os.listdir(streaming_dir)):
        if not fname.endswith(".py"):
            continue
        with open(os.path.join(streaming_dir, fname)) as f:
            for i, line in enumerate(f, 1):
                if banned.search(line):
                    hits.append(f"{fname}:{i}: {line.strip()}")
    assert hits == [], (
        "streaming module references the per-call-checkpointing ranking "
        f"primitives — per-batch leak risk: {hits}"
    )


def test_plan_shapes_match_baseline(spark, entry):
    """Every gate query's plan-shape metrics (shuffle count, join
    strategy census, aggregate/window counts) must equal the committed
    baseline — the regression net for 'a refactor quietly added an
    exchange / degraded a join'. After an INTENDED plan change,
    regenerate deliberately: python tools/plan_snapshot.py"""
    import json
    import os

    from tools.plan_snapshot import SF_DIR, plan_shape

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "plans_baseline.json")
    baseline = json.load(open(path))
    qs = entry.queries()
    assert set(baseline) == set(qs), "baseline stale: query set changed"
    diffs = {}
    for name, fn in qs.items():
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        got = plan_shape(plan)
        if got != baseline[name]:
            diffs[name] = {"baseline": baseline[name], "got": got}
    assert diffs == {}, f"plan shapes drifted: {json.dumps(diffs, indent=1)}"


# ------------------------------------------------------------------ #
# NULL-group-join audit (source-level, AST)
# ------------------------------------------------------------------ #

def _null_unsafe_param_joins(tree, src_lines, param_stack=None, fn=None):
    """Yield (lineno, snippet) for every .join(...) whose `on` argument
    references an enclosing function PARAMETER (a caller-supplied
    group/source/key column name) without eqNullSafe and without a
    `# null-keys-impossible:` justification on the call line or the
    two lines above it. groupBy keeps a NULL key as a real group; an
    on-name join silently drops it — the bug class that shipped three
    times in rounds 9-10 (impute group stats, winsorize, mixture_build).

    Conditions built in a LOCAL VARIABLE first (``cond = ...;
    df.join(x, on=cond)``) are resolved one assignment-graph hop at a
    time (depth-bounded): the union of every expression ever assigned
    to the name inside the enclosing function stands in for the name,
    so a loop-built ``cond = cond & df[c] == other[m]`` over parameter
    keys is audited exactly like the inline form."""
    import ast

    hits = []

    def fn_assignments(fnode):
        """name -> [value exprs] for every assignment in the function
        body (including reassignments — union semantics)."""
        out: dict = {}
        for sub in ast.walk(fnode):
            if isinstance(sub, ast.Assign):
                for tgt in sub.targets:
                    if isinstance(tgt, ast.Name):
                        out.setdefault(tgt.id, []).append(sub.value)
            elif isinstance(sub, ast.AugAssign) and isinstance(
                sub.target, ast.Name
            ):
                out.setdefault(sub.target.id, []).append(sub.value)
        return out

    def condition_shaped(value):
        """True for expressions that ARE a join condition (not a
        DataFrame pipeline): comparisons, &/| combinations, and
        lists/comprehensions of those. Keeps the expansion from
        chasing DataFrame variables whose select/where chains would
        drag unrelated parameter names into the hit set."""
        if isinstance(value, (ast.Compare, ast.BoolOp)):
            return True
        if isinstance(value, ast.BinOp) and isinstance(
            value.op, (ast.BitAnd, ast.BitOr, ast.BitXor)
        ):
            return True
        if isinstance(value, ast.List):
            return any(condition_shaped(e) for e in value.elts)
        if isinstance(value, (ast.ListComp, ast.GeneratorExp)):
            return condition_shaped(value.elt)
        return False

    def expand(expr, assigns, depth=3):
        """(names, attrs) referenced by expr, following local-variable
        assignments up to `depth` hops — only through assignments that
        are themselves condition-shaped."""
        names = {n.id for n in ast.walk(expr) if isinstance(n, ast.Name)}
        attrs = {n.attr for n in ast.walk(expr) if isinstance(n, ast.Attribute)}
        if depth <= 0:
            return names, attrs
        for nm in list(names):
            for val in assigns.get(nm, []):
                if not condition_shaped(val):
                    continue
                sub_n, sub_a = expand(val, assigns, depth - 1)
                names |= sub_n
                attrs |= sub_a
        return names, attrs

    def walk(node, params, assigns):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            a = node.args
            names = {
                p.arg
                for p in (
                    list(a.posonlyargs) + list(a.args) + list(a.kwonlyargs)
                )
            }
            params = params | names
            assigns = fn_assignments(node)
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "join"
            # not os.path.join / posixpath.join
            and not (
                isinstance(node.func.value, ast.Attribute)
                and node.func.value.attr == "path"
            )
        ):
            on_expr = None
            for kw in node.keywords:
                if kw.arg == "on":
                    on_expr = kw.value
            if on_expr is None and len(node.args) >= 2:
                on_expr = node.args[1]
            if on_expr is not None:
                sub_names, sub_attrs = expand(on_expr, assigns)
                if (sub_names & params) and "eqNullSafe" not in sub_attrs:
                    # justification may sit 1-2 lines above the call or
                    # anywhere inside its (possibly multi-line) span
                    lo = max(0, node.lineno - 3)
                    hi = node.end_lineno or node.lineno
                    ctx = "".join(src_lines[lo:hi])
                    if "null-keys-impossible:" not in ctx:
                        hits.append(
                            (node.lineno, src_lines[node.lineno - 1].strip())
                        )
        for child in ast.iter_child_nodes(node):
            walk(child, params, assigns)

    walk(tree, set(), {})
    return hits


def test_param_keyed_joins_are_null_safe():
    """Structural net for the NULL-group-join bug class: any
    `.join(..., on=<param>)` anywhere in flyq_spark/ where the key is a
    caller-supplied column parameter must either use eqNullSafe or
    carry a `# null-keys-impossible: <reason>` comment within the two
    lines above the call (row-identity joins, inner-equi-join-faithful
    skew splits). Source-level so the NEXT operator that joins a
    grouped result back on a caller's group column fails this test at
    commit time, not at a judge's counterexample."""
    import ast
    import os

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "flyq_spark",
    )
    bad = []
    for dirpath, _dirs, files in os.walk(pkg):
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            with open(path) as f:
                src = f.read()
            hits = _null_unsafe_param_joins(
                ast.parse(src), src.splitlines(keepends=True)
            )
            rel = os.path.relpath(path, pkg)
            bad.extend(f"{rel}:{ln}: {snip}" for ln, snip in hits)
    assert bad == [], (
        "caller-supplied join keys must be null-safe (eqNullSafe) or "
        "carry a '# null-keys-impossible:' justification — a NULL group "
        f"key is a real group and an on-name join drops it: {bad}"
    )


def test_param_keyed_join_net_catches_the_mixture_build_bug():
    """RED-case proof: the net must flag mixture_build's original
    on-name join (the r10 wrong answer) if it ever comes back, and
    must pass its eqNullSafe replacement."""
    import ast

    old = (
        "def mixture_build(df, source_col='source'):\n"
        "    return ranked.join(F.broadcast(mix), on=source_col)\n"
    )
    hits = _null_unsafe_param_joins(
        ast.parse(old), old.splitlines(keepends=True)
    )
    assert len(hits) == 1 and hits[0][0] == 2, hits

    fixed = (
        "def mixture_build(df, source_col='source'):\n"
        "    return ranked.join(\n"
        "        F.broadcast(mix_m),\n"
        "        on=F.col(source_col).eqNullSafe(F.col('_mb_src')),\n"
        "    )\n"
    )
    assert (
        _null_unsafe_param_joins(
            ast.parse(fixed), fixed.splitlines(keepends=True)
        )
        == []
    )

    justified = (
        "def f(df, id_col='doc_id'):\n"
        "    # null-keys-impossible: id_col is the row identity\n"
        "    return df.join(survivors, on=id_col, how='left_semi')\n"
    )
    assert (
        _null_unsafe_param_joins(
            ast.parse(justified), justified.splitlines(keepends=True)
        )
        == []
    )

    # the LOCAL-VARIABLE form of the same bug must also be caught: a
    # plain == condition built in `cond` first, then join(on=cond)
    laundered = (
        "def f(df, group_col='g'):\n"
        "    cond = F.col(group_col) == F.col('_rg')\n"
        "    return df.join(fences, on=cond)\n"
    )
    hits = _null_unsafe_param_joins(
        ast.parse(laundered), laundered.splitlines(keepends=True)
    )
    assert len(hits) == 1 and hits[0][0] == 3, hits

    # ...and the eqNullSafe version of the local-variable form passes,
    # including the loop-accumulated `cond = cond & ...` shape
    laundered_safe = (
        "def f(df, keys=('g',)):\n"
        "    cond = F.col('a') == F.col('_b')\n"
        "    for k in keys:\n"
        "        cond = cond & df[k].eqNullSafe(F.col('_m'))\n"
        "    return df.join(other, on=cond)\n"
    )
    assert (
        _null_unsafe_param_joins(
            ast.parse(laundered_safe), laundered_safe.splitlines(keepends=True)
        )
        == []
    )
