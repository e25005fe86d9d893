"""Exact table profiling [EXT] — the data-quality pass a pipeline runs
before trusting a new drop of data.

``DataFrame.summary()`` exists but is not engine-replayable (approximate
percentiles, float formatting); this is the exact, oracle-checkable
form: per column — row count, null count, exact distinct count, min and
max — emitted in long format (one row per column).

Scale shape: ONE aggregation pass computes every column's stats
(Catalyst expands multi-distinct into one Expand + two-stage aggregate —
still a single scan of the data, map-side partial everything), then a
zero-shuffle ``stack`` unpivots the 1-row wide result. Nothing is ever
per-column re-scanned. Callers pass profile-SAFE expressions (integers
or strings): cast timestamps to epoch micros and money to integer cents
upstream so min/max stringify identically on every engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def table_profile(df: DataFrame, cols: dict[str, Column]) -> DataFrame:
    """Profile the given named expressions. Output: (col_name, n_rows,
    n_nulls, n_distinct, min_v, max_v) with min/max as strings."""
    proj = df.select(*[expr.alias(name) for name, expr in cols.items()])
    aggs = []
    for name in cols:
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"{name}__rows"),
            F.sum(F.col(name).isNull().cast("long")).cast("long").alias(f"{name}__nulls"),
            F.count_distinct(F.col(name)).cast("long").alias(f"{name}__distinct"),
            F.min(F.col(name)).cast("string").alias(f"{name}__min"),
            F.max(F.col(name)).cast("string").alias(f"{name}__max"),
        ]
    wide = proj.agg(*aggs)
    stack_expr = ", ".join(
        f"'{name}', {name}__rows, {name}__nulls, {name}__distinct, "
        f"{name}__min, {name}__max"
        for name in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_expr}) AS "
            "(col_name, n_rows, n_nulls, n_distinct, min_v, max_v)"
        )
    )


def profile_drift(
    old: DataFrame, new: DataFrame, cols: dict[str, "Column"]
) -> DataFrame:
    """Per-column drift report between two snapshots (the check a
    pipeline runs when a new data drop arrives: did null rates spike,
    did cardinality collapse, did the value range shift?). Both sides
    run ``table_profile`` (one aggregation pass each), joined on the
    column name — integer-exact: null rates are parts-per-million via
    integer div, range movement is a boolean on the stringified
    min/max. Output per column:
    (col_name, rows_old, rows_new, null_ppm_old, null_ppm_new,
    distinct_old, distinct_new, range_changed)."""
    po = table_profile(old, cols)
    pn = table_profile(new, cols)

    def ppm(nulls, rows):
        return F.when(rows > 0, F.call_function(
            "div", nulls * F.lit(1_000_000).cast("long"), rows
        )).otherwise(F.lit(0).cast("long"))

    o, n = po.alias("o"), pn.alias("n")
    return o.join(n, F.col("o.col_name") == F.col("n.col_name")).select(
        F.col("o.col_name").alias("col_name"),
        F.col("o.n_rows").alias("rows_old"),
        F.col("n.n_rows").alias("rows_new"),
        ppm(F.col("o.n_nulls"), F.col("o.n_rows")).alias("null_ppm_old"),
        ppm(F.col("n.n_nulls"), F.col("n.n_rows")).alias("null_ppm_new"),
        F.col("o.n_distinct").alias("distinct_old"),
        F.col("n.n_distinct").alias("distinct_new"),
        (
            ~F.col("o.min_v").eqNullSafe(F.col("n.min_v"))
            | ~F.col("o.max_v").eqNullSafe(F.col("n.max_v"))
        ).alias("range_changed"),
    )


def robust_outliers(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Tukey-fence outlier detection per group, EXACT end-to-end: Q1/Q3
    are inverted-CDF rank selections (corpus.length_percentiles — pure
    integer ranks), the 1.5×IQR fences use integer ``div`` (3·IQR div 2,
    no float ever appears), and the counts are conditional aggregates.
    The robust-statistics screen a pipeline runs on metric columns
    (values in integer units — cents, bytes, micros) where mean/stddev
    screens are wrecked by the very outliers they hunt.

    Plan: quartiles via length_percentiles' counted-distinct rank
    selection (per-group distributed prefix sums — no group-keyed sort
    task even for a single giant group), fences broadcast back
    (group-cardinality rows), one conditional re-aggregation.
    Output: (group, n_rows, lo, hi, n_low, n_high)."""
    from flyq_spark.operators.corpus import length_percentiles

    q = length_percentiles(
        df.select(group_col, value_col), group_col, value_col, (0.25, 0.75)
    )
    iqr = F.col("p75") - F.col("p25")
    half3 = F.call_function(
        "div", F.lit(3).cast("long") * iqr, F.lit(2).cast("long")
    )
    # null-SAFE fence join: a NULL group key is a real group (the
    # quartile selection above planned it fences) and a plain on-name
    # join would silently drop its entire outlier report.
    fences = q.select(
        F.col(group_col).alias("_rg"),
        F.col("n_docs").alias("n_rows"),
        (F.col("p25") - half3).alias("lo"),
        (F.col("p75") + half3).alias("hi"),
    )
    return (
        df.select(group_col, value_col)
        .join(
            F.broadcast(fences),
            on=F.col(group_col).eqNullSafe(F.col("_rg")),
        )
        .drop("_rg")
        .groupBy(group_col)
        .agg(
            F.max("n_rows").cast("long").alias("n_rows"),
            F.max("lo").cast("long").alias("lo"),
            F.max("hi").cast("long").alias("hi"),
            F.count(F.when(F.col(value_col) < F.col("lo"), 1))
            .cast("long")
            .alias("n_low"),
            F.count(F.when(F.col(value_col) > F.col("hi"), 1))
            .cast("long")
            .alias("n_high"),
        )
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k_tenths: int = 30,
) -> DataFrame:
    """Median/MAD robust z-score screen per group — the
    breakdown-point-0.5 counterpart of :func:`robust_outliers`'s Tukey
    fences (quartiles break down at 25% contamination; median/MAD
    survives until half the data is garbage — the screen to trust when
    a feed is MOSTLY wrong). All-integer, exact:

    - med = exact LOWER median per group, MAD = exact lower median of
      |x − med| per group — both via the counted-distinct rank
      selection (impute.group_statistic → per-group distributed prefix
      sums; no group-keyed sort task at any group cardinality);
    - outlier iff 10·|x − med| > k_tenths·MAD (k_tenths=30 ≈ the
      classic 3σ with MAD≈σ·0.6745 left to the caller's k) — scaled
      integer comparison, no float ratio ever materializes. NULL
      values are excluded throughout (nothing to screen); a NULL
      group KEY is a real group (null-safe joins, same discipline as
      winsorize/rank_normalize).

    Plan — ONE data-sized pass total: the source reduces once to the
    DISTINCT (group, value, count) table (checkpointed inside the
    prefix-sum primitive); the deviation median's counted table is
    DERIVED from it (|x − med| merges value pairs equidistant from the
    median — a distinct-sized groupBy, never a second scan of the
    data), and both the row count (Σ counts = the primitive's group
    total) and the outlier count (Σ counts where 10·dv > k·MAD) read
    off the same distinct-sized frame. Everything after the first
    groupBy is bounded by |distinct values|, not rows. Output:
    (group, n_rows, med, mad, n_outliers) one row per group."""
    from flyq_spark.operators.ranking import grouped_prefix_sums

    def covers(target: Column) -> Column:
        return (F.col("_cum") - F.col("_c") < target) & (target <= F.col("_cum"))

    lower_median_target = F.call_function(
        "div", F.col("_n") + F.lit(1).cast("long"), F.lit(2).cast("long")
    )
    counted = (
        df.select(group_col, value_col)
        .where(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    # materialize=True (r13, guide §1.2): repartitionByRange SAMPLES its
    # child with a full execution before the exchange re-executes it —
    # materialize=False made the counted aggregation (a full data scan +
    # groupBy) run TWICE per call. The lazy input checkpoint computes it
    # once; measured 1.00 s -> 0.67 s per call at sf0.1, and one whole
    # scan+aggregation pass saved at scale.
    cums = grouped_prefix_sums(
        counted,
        [group_col],
        [F.col(value_col).asc()],
        {"_cum": F.col("_c")},
        totals={"_cum": "_n"},
    )
    med = (
        cums.where(covers(lower_median_target))
        .groupBy(group_col)
        .agg(F.min(value_col).alias("_med"))
        .select(F.col(group_col).alias("_mg"), "_med")
    )
    # no (group, dv) re-aggregation before the second pass: prefix sums
    # are well-defined over duplicate order keys (two values equidistant
    # from the median), and every row covering the target rank carries
    # the same dv — one shuffle saved.
    dev_counted = (
        cums.select(group_col, value_col, "_c")
        .join(F.broadcast(med), F.col(group_col).eqNullSafe(F.col("_mg")))
        .select(
            F.col(group_col),
            F.abs(F.col(value_col) - F.col("_med")).alias("_dv"),
            F.col("_c"),
        )
    )
    # materialize=True here too: the deviation table derives from the
    # first pass's checkpoint through a broadcast join — without the
    # input checkpoint the sampler and the exchange each replay that
    # derivation (two reads of the pass-1 checkpoint per call)
    dev_cums = grouped_prefix_sums(
        dev_counted,
        [group_col],
        [F.col("_dv").asc()],
        {"_cum": F.col("_c")},
        totals={"_cum": "_n"},
    )
    # MAD row also carries the group total (n_rows) for free; the
    # outlier count is n − (cum at the largest dv inside the fence), so
    # the whole result assembles from two group-sized rank selections —
    # no m-row re-aggregation after the second pass.
    mad = (
        dev_cums.where(covers(lower_median_target))
        .groupBy(group_col)
        .agg(
            F.min("_dv").alias("_mad"),
            F.max("_n").cast("long").alias("n_rows"),
        )
        .select(F.col(group_col).alias("_ag"), "_mad", "n_rows")
    )
    inside = (
        dev_cums.select(group_col, "_dv", "_cum")
        .join(F.broadcast(mad), F.col(group_col).eqNullSafe(F.col("_ag")))
        .where(F.lit(10) * F.col("_dv") <= F.lit(int(k_tenths)) * F.col("_mad"))
        .groupBy(group_col)
        .agg(F.max("_cum").cast("long").alias("_n_inside"))
        .select(F.col(group_col).alias("_ig"), "_n_inside")
    )
    return (
        mad.join(
            F.broadcast(med), F.col("_ag").eqNullSafe(F.col("_mg")), "left"
        )
        .join(F.broadcast(inside), F.col("_ag").eqNullSafe(F.col("_ig")), "left")
        .select(
            F.col("_ag").alias(group_col),
            F.col("n_rows"),
            F.col("_med").cast("long").alias("med"),
            F.col("_mad").cast("long").alias("mad"),
            (F.col("n_rows") - F.coalesce(F.col("_n_inside"), F.lit(0)))
            .cast("long")
            .alias("n_outliers"),
        )
    )


def check_constraints(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Declarative data-quality constraints (the Deequ/expectations
    shape): evaluate every rule in ONE aggregation pass and report exact
    violation counts. Output: (rule, column, violations, n_rows) — one
    row per rule, integer-exact, oracle-replayable.

    Rule dicts: {"name", "column", "kind", ...} with kinds
      - ``not_null``                 violations = NULL rows
      - ``unique``                   violations = rows beyond the first
                                     occurrence of each value (exact:
                                     count(col) − count_distinct(col))
      - ``min`` / ``max`` (+value)   violations = rows strictly below /
                                     above the bound (NULLs don't count
                                     — pair with not_null to forbid)
      - ``in_set`` (+values)         violations = non-NULL rows outside
                                     the allowed set
      - ``regex`` (+pattern)         violations = non-NULL rows with NO
                                     match (Java regex, rlike = partial
                                     find — anchor with ^...$ to demand
                                     a full match)

    Scale shape: one scan; conditional counts are map-side partials and
    the ``unique`` distincts ride the same Expand + two-stage aggregate
    the profiler uses; the 1-row wide result unpivots with a
    zero-shuffle ``stack``. Adding rules widens the aggregate, never
    adds a pass."""
    import re

    kinds = {"not_null", "unique", "min", "max", "in_set", "regex"}
    # rule/column names are interpolated into the stack() SQL literal —
    # reject anything that could escape the quote, with a clear error
    # instead of a Catalyst ParseException deep in execution
    name_ok = re.compile(r"^[A-Za-z0-9_ .:/-]+$")
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for i, r in enumerate(rules):
        kind = r["kind"]
        if kind not in kinds:
            raise ValueError(f"unknown constraint kind {kind!r} (rule {r})")
        for field in ("name", "column"):
            if not name_ok.match(r[field]):
                raise ValueError(
                    f"rule {field} {r[field]!r} may only contain letters, "
                    "digits, and '_ .:/-'"
                )
        c = F.col(r["column"])
        if kind == "not_null":
            expr = F.count(F.when(c.isNull(), 1))
        elif kind == "unique":
            expr = F.count(c) - F.count_distinct(c)
        elif kind == "min":
            expr = F.count(F.when(c < F.lit(r["value"]), 1))
        elif kind == "max":
            expr = F.count(F.when(c > F.lit(r["value"]), 1))
        elif kind == "in_set":
            expr = F.count(F.when(c.isNotNull() & ~c.isin(*r["values"]), 1))
        else:  # regex
            expr = F.count(F.when(c.isNotNull() & ~c.rlike(r["pattern"]), 1))
        aggs.append(expr.cast("long").alias(f"_v{i}"))
    wide = df.agg(*aggs)
    stack_expr = ", ".join(
        f"'{r['name']}', '{r['column']}', _v{i}" for i, r in enumerate(rules)
    )
    return wide.select(
        F.expr(
            f"stack({len(rules)}, {stack_expr}) AS (rule, column, violations)"
        ),
        F.col("_n").alias("n_rows"),
    )


def value_histogram(
    df: DataFrame,
    col: Column,
    bin_width: int,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Exact fixed-width histogram of an INTEGER expression (scale money
    to cents upstream): one row per (keys, bin_start) with the exact
    count — the engine-replayable form of ``width_bucket`` profiling.
    NULL values are excluded (they have no bin). ``bin_start`` is a
    true FLOOR multiple of ``bin_width`` at any sign (Spark's ``div``
    truncates toward zero; the remainder correction keeps negative
    values in the bucket BELOW them, matching the time_bucket fix).

    One partial-aggregated groupBy — the histogram is bins-sized,
    independent of row count; at 100 TB this is the cheapest shape a
    distribution summary can have."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    from flyq_spark.operators.util import floor_div

    wide = F.lit(int(bin_width)).cast("long")
    v = col.cast("long")
    floor_q = floor_div(v, wide)
    return (
        df.where(v.isNotNull())
        .select(*keys, (floor_q * wide).alias("bin_start"))
        .groupBy(*keys, "bin_start")
        .agg(F.count("*").alias("n"))
    )


def k_anonymity_check(
    df: DataFrame,
    quasi_cols: tuple[str, ...],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: every
    equivalence class with FEWER than ``k`` rows (the re-identifiable
    groups a release must suppress or generalize). Returns the failing
    classes with their counts; an empty result certifies the dataset
    k-anonymous for these columns. NULLs form their own class (a NULL
    zip code is still a linkable value).

    One partial-aggregated groupBy + a count filter — class-cardinality
    output, the cheapest possible shape; at 100 TB the risk surface is
    the number of RARE classes, which is exactly what survives the
    filter."""
    if k < 2:
        raise ValueError(f"k must be >= 2 for a meaningful check, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").alias("n"))
        .where(F.col("n") < F.lit(k))
    )


def histogram_quantiles(
    hist: DataFrame,
    quantiles: tuple[int, ...] = (500, 950, 990),
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Quantiles from a :func:`value_histogram` frame — the mergeable-
    state quantile pattern: histograms add across batches/partitions
    (unlike exact rank state), and any quantile then reads off the
    cumulative counts at bin resolution. ``quantiles`` are per-mille
    (500 = median) to keep the whole computation integer-exact; the
    answer is the ``bin_start`` of the first bin whose cumulative count
    reaches ceil(q‰ · total) — exact for the binned distribution,
    approximate for the raw values by at most one bin width (the
    documented trade of the histogram representation).

    One cumulative window + one aggregate over the BIN-sized frame —
    the fact table was already reduced by value_histogram."""
    if not quantiles or any(not 0 < q < 1000 for q in quantiles):
        raise ValueError(f"quantiles must be per-mille in (0,1000): {quantiles}")
    part = list(keys) if keys else [F.lit(1)]
    w = Window.partitionBy(*part).orderBy("bin_start").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy(*part)
    cum = hist.withColumn("_cum", F.sum("n").over(w)).withColumn(
        "_tot", F.sum("n").over(wt)
    )
    from flyq_spark.operators.util import exact_ceil_frac

    aggs = []
    for q in quantiles:
        # target rank = ceil(q‰ · total), via the shared exact helper
        target = exact_ceil_frac(F.col("_tot"), q / 1000)
        aggs.append(
            F.min(
                F.when(F.col("_cum") >= target, F.col("bin_start"))
            ).alias(f"p{q}_bin")
        )
    return cum.groupBy(*keys).agg(*aggs)


def referential_check(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    relation: str,
) -> DataFrame:
    """Cross-table referential-integrity audit (the FK side Deequ calls
    ``isContainedIn`` against another table): counts of child rows whose
    key has no parent. Output is ONE labelled row —
    ``(relation, n_rows, n_null_fk, n_orphans, n_orphan_keys)`` — so
    audits over many relations union into one report.

    Plan: a full-count aggregate on the child key column only, plus a
    left-anti equi-join of the child's DISTINCT keys against the
    parent's distinct keys joined back for row counts — both sides are
    key-column scans, map-side combined to distinct-key size before any
    shuffle; the parent side broadcasts when dimension-sized. NULL FKs
    are reported separately (SQL FK semantics: NULL participates in no
    relationship, it is not an orphan)."""
    ck = F.col(child_col)
    totals = child.select(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(ck.isNull(), 1)).alias("n_null_fk"),
    )
    child_keys = (
        child.where(ck.isNotNull())
        .groupBy(ck.alias("_k"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    parent_keys = parent.where(F.col(parent_col).isNotNull()).select(
        F.col(parent_col).alias("_k")
    ).distinct()
    orphans = child_keys.join(parent_keys, on="_k", how="left_anti").select(
        F.coalesce(F.sum("_n"), F.lit(0)).alias("n_orphans"),
        F.count(F.lit(1)).alias("n_orphan_keys"),
    )
    return totals.crossJoin(orphans).select(
        F.lit(relation).alias("relation"),
        "n_rows",
        "n_null_fk",
        "n_orphans",
        "n_orphan_keys",
    )


def l_diversity_check(
    df: DataFrame,
    quasi_cols: tuple[str, ...],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """l-diversity audit — the refinement of k-anonymity: a class can
    be large (k-anonymous) yet still leak if every member shares the
    same SENSITIVE value. Returns quasi-identifier classes whose
    sensitive attribute takes fewer than ``l`` distinct values,
    with ``(quasi..., n_rows, n_sensitive)``; empty result certifies
    distinct-l-diversity. NULL sensitive values count as one value
    (a class of all-NULL diagnoses is exactly as disclosive as a
    uniform one).

    One groupBy with count + count(DISTINCT) — Catalyst plans the
    distinct as a two-stage Expand aggregate, still a single scan,
    partial-aggregated on the class key."""
    if l < 2:
        raise ValueError(f"l must be >= 2 for a meaningful check, got {l}")
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    s = F.col(sensitive_col)
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.countDistinct(s) + F.max(s.isNull()).cast("long")).alias(
                "n_sensitive"
            ),
        )
        .where(F.col("n_sensitive") < F.lit(l))
    )


def exact_global_quantiles(
    df: DataFrame,
    value_col: Column | str,
    quantiles_permille: tuple[int, ...] = (500, 950, 990),
    branch: int = 1024,
    max_passes: int | None = None,
) -> list[tuple[int, int]]:
    """EXACT global quantiles of an integer column by distributed
    iterative selection — the scale path where ``length_percentiles``'s
    per-group rank window cannot go: a GLOBAL exact rank would funnel
    the whole table through one sort partition, while this narrows the
    candidate range by ~``branch``× per pass with only a bounded
    histogram (``branch`` counters) ever reaching the driver.

    Definition matches the repo's inverted-CDF convention: the value at
    1-based rank ceil(q‰ · n) ascending. Each pass: bucket the current
    [lo, hi] range into ``branch`` equal integer strips — the offset
    and division run in DECIMAL(38,0) because ``v − lo`` over a range
    wider than 2^63 overflows int64 (ANSI would raise; non-ANSI would
    silently bucket into wrong strips) — count per strip
    (map-side-combined groupBy), walk the cumulative to the strip
    holding the target rank, recurse into it. Terminates when the strip
    is a single value; an int64 range needs at most
    ceil(64 / log2(branch)) = 7 passes at the default branch.

    Returns driver-side ``[(q_permille, value), ...]`` (model-sized
    scalars, like k-means centroids); callers wanting a DataFrame wrap
    it with ``spark.createDataFrame``. NULLs are excluded (rank over
    present values, the SQL percentile convention). Raises on an empty
    input or if ``max_passes`` is exhausted (cannot happen with sane
    branch; the guard surfaces a logic error rather than looping)."""
    if not quantiles_permille or any(
        not 0 < q < 1000 for q in quantiles_permille
    ):
        raise ValueError(
            f"quantiles must be per-mille in (0,1000): {quantiles_permille}"
        )
    if branch < 2:
        raise ValueError(f"branch must be >= 2: {branch}")
    if max_passes is None:
        # worst case: full int64 range narrowed ~branch-fold per pass
        # (ceil width loses at most one doubling — +2 slack covers it)
        import math

        max_passes = math.ceil(64 / math.log2(branch)) + 2
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).alias("_v")
    vals = df.select(v).where(F.col("_v").isNotNull()).persist()
    stats = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("_v").alias("lo"),
        F.max("_v").alias("hi"),
    ).collect()[0]
    n, glo, ghi = stats["n"], stats["lo"], stats["hi"]
    try:
        if n == 0:
            raise ValueError("exact_global_quantiles: no non-null values")
        out = []
        for q in quantiles_permille:
            # exact integer ceil(q·n/1000)
            rank = (q * n + 999) // 1000
            lo, hi = glo, ghi
            for _ in range(max_passes):
                if lo == hi:
                    break
                span = hi - lo + 1  # Python int: never overflows
                width = -(-span // branch)  # ceil: strips cover the range
                # offset + division in DECIMAL(38,0): `v - lo` over a
                # range wider than 2^63 overflows int64 (v >= lo after
                # the range filter, so the plain div IS the floor)
                dec = "decimal(38,0)"
                strip = F.call_function(
                    "div",
                    F.col("_v").cast(dec) - F.lit(lo).cast(dec),
                    F.lit(width).cast(dec),
                ).cast("long")
                counts = dict(
                    (r["_s"], r["_c"])
                    for r in vals.where(
                        (F.col("_v") >= lo) & (F.col("_v") <= hi)
                    )
                    .groupBy(strip.alias("_s"))
                    .agg(F.count(F.lit(1)).alias("_c"))
                    .collect()
                )
                cum = 0
                found = None
                for s in sorted(counts):
                    if cum + counts[s] >= rank:
                        found = s
                        rank -= cum
                        break
                    cum += counts[s]
                if found is None:  # pragma: no cover - rank <= total invariant
                    raise RuntimeError("rank exceeded strip totals")
                lo2 = lo + found * width
                hi2 = min(hi, lo2 + width - 1)
                lo, hi = lo2, hi2
            else:
                raise RuntimeError(
                    f"exact_global_quantiles did not converge in {max_passes} passes"
                )
            out.append((q, int(lo)))
        return out
    finally:
        # exception-safe: a failed pass must not pin the cache forever
        vals.unpersist()


def dataset_digest(
    df: DataFrame, cols: dict[str, Column], buckets: int = 64
) -> DataFrame:
    """Order-independent, MERGEABLE content digest of a table — the
    one-pass answer to "are these two 100 TB copies identical?" after a
    migration, mirror, or engine swap (the check ``mirror_topic`` and
    ``import_flyq_dir`` callers want without a sort or a join).

    Each row is canonicalized (caller-supplied engine-portable
    expressions: integers/strings; NULL → a reserved sentinel) and
    hashed to a 60-bit md5 integer; rows land in ``pmod(h, buckets)``
    buckets; per bucket the digest keeps (n_rows, bit_xor of hashes,
    sum of hashes mod 1e9+7). XOR and modular sum are commutative and
    associative, so the digest is partition-order-independent and two
    digests merge by XOR/adding bucket-wise — compare corpora shard by
    shard without co-locating them. The modular sum rides in
    DECIMAL(38,0) so no row count can overflow it (1e29 rows/bucket).

    A multiset difference of even one row flips the XOR of its bucket
    with probability 1 (single change) and colliding a *k*-row
    difference requires simultaneous 60-bit collisions — detection is
    certain for any single-row drift and ~2^-60 blind per further row.

    Output: (bucket, n_rows, xor_h, sum_mod), ``buckets`` rows max.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1: {buckets}")
    parts = [
        F.coalesce(expr.cast("string"), F.lit("\x00NULL")) for expr in cols.values()
    ]
    canon = F.concat_ws("\x1f", *parts)
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    p = F.lit(1_000_000_007).cast("long")
    return (
        df.select(
            F.pmod(h, F.lit(buckets)).cast("long").alias("bucket"),
            h.alias("_h"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.expr("bit_xor(_h)").cast("long").alias("xor_h"),
            (F.sum((F.col("_h") % p).cast("decimal(38,0)")) % p)
            .cast("long")
            .alias("sum_mod"),
        )
    )


def corr_components(df: DataFrame, cols: dict[str, Column]) -> DataFrame:
    """Pairwise Pearson-correlation COMPONENTS over integer-valued
    expressions, exact end-to-end — the profiling matrix float
    ``corr()`` cannot hash-check (double sums are partition-order-
    dependent; these integer sums are associative, so the result is
    THE answer, not an answer).

    For every column pair (x, y), x < y lexicographically:
    ``cov_num  = n·Σxy − Σx·Σy``  (covariance numerator · n)
    ``var_x_num = n·Σx² − (Σx)²``, ``var_y_num`` likewise —
    Pearson r = cov_num / sqrt(var_x_num · var_y_num), a client-side
    division of exact integers. Rows with a NULL in ANY profiled
    column are excluded (pairwise-complete-on-the-same-n, so the
    matrix is internally consistent).

    Scale shape: ONE full-scan aggregation computes every sum and
    cross-moment (map-side combined, k(k+3)/2 counters), then a
    zero-shuffle explode unpivots the 1-row result into pair rows.
    Arithmetic is ANSI long — magnitudes must satisfy
    n·Σx·y < 2^63; pre-scale inputs down (not up) accordingly, or the
    overflow raises loudly rather than wrapping.
    """
    names = list(cols)
    if len(names) < 2:
        raise ValueError("corr_components needs at least two columns")
    proj = df.select(*[expr.cast("long").alias(n) for n, expr in cols.items()])
    cond = None
    for n in names:
        nn = F.col(n).isNotNull()
        cond = nn if cond is None else (cond & nn)
    proj = proj.where(cond)
    # internal state aliases are INDEX-based: name-based composites like
    # "__q_{a}_{b}" collide for underscore-bearing names (("x","y_z")
    # and ("x_y","z") both yield __q_x_y_z)
    idx = {a: i for i, a in enumerate(names)}
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, a in enumerate(names):
        aggs.append(F.sum(F.col(a)).alias(f"__s_{i}"))
        for j in range(i, len(names)):
            aggs.append(
                F.sum(F.col(a) * F.col(names[j])).alias(f"__q_{i}_{j}")
            )
    wide = proj.agg(*aggs)
    n = F.col("__n")

    def q(i: int, j: int):
        return F.col(f"__q_{min(i, j)}_{max(i, j)}")

    pair_structs = []
    for a in names:
        for b in names[idx[a] + 1 :]:
            x, y = (a, b) if a < b else (b, a)
            ix, iy = idx[x], idx[y]
            sx, sy = F.col(f"__s_{ix}"), F.col(f"__s_{iy}")
            pair_structs.append(
                F.struct(
                    F.lit(x).alias("col_x"),
                    F.lit(y).alias("col_y"),
                    n.alias("n"),
                    sx.alias("sum_x"),
                    sy.alias("sum_y"),
                    (n * q(ix, iy) - sx * sy).alias("cov_num"),
                    (n * q(ix, ix) - sx * sx).alias("var_x_num"),
                    (n * q(iy, iy) - sy * sy).alias("var_y_num"),
                )
            )
    return wide.select(
        F.explode(F.array(*pair_structs)).alias("_p")
    ).select("_p.*")


def digest_divergent_rows(
    a: DataFrame,
    b: DataFrame,
    cols: dict[str, Column],
    buckets: int = 1024,
) -> DataFrame:
    """Anti-entropy DRILL-DOWN: given two copies of a table, return
    the exact rows (as multisets) on which they differ — the repair
    step after ``dataset_digest`` says two copies diverge.

    Three stages, each honest about what it touches:
    1. digest both sides (one full scan each, ``buckets`` rows out);
    2. full-outer-compare the digests → the DIVERGENT bucket set
       (bounded by ``buckets`` — model-sized, broadcastable);
    3. re-scan both sides but SHUFFLE ONLY rows hashing into divergent
       buckets (the semi-join filter runs map-side before any
       exchange), group each side to (row-values → count), and
       null-safe full-outer the two count tables. Healthy data never
       crosses the wire: with b divergent buckets of B total, the
       exchanged volume is ≈ (b/B)·|table|, the multiset-diff cost of
       just the damage.

    Output: one row per distinct differing row-value — the profiled
    columns plus ``n_a``/``n_b`` multiplicities (0 = absent on that
    side) and the bucket. Equal copies → empty result.
    """
    names = list(cols)

    def side(df: DataFrame) -> DataFrame:
        parts = [
            F.coalesce(expr.cast("string"), F.lit("\x00NULL"))
            for expr in cols.values()
        ]
        h = F.conv(
            F.substring(F.md5(F.concat_ws("\x1f", *parts)), 1, 15), 16, 10
        ).cast("long")
        return df.select(
            *[expr.alias(n) for n, expr in cols.items()],
            F.pmod(h, F.lit(buckets)).cast("long").alias("bucket"),
        )

    dig_a = dataset_digest(a, cols, buckets=buckets).alias("da")
    dig_b = dataset_digest(b, cols, buckets=buckets).alias("db")
    joined = dig_a.join(
        dig_b, F.col("da.bucket") == F.col("db.bucket"), "full_outer"
    )
    diverged = (
        F.col("da.bucket").isNull()
        | F.col("db.bucket").isNull()
        | (F.col("da.n_rows") != F.col("db.n_rows"))
        | (F.col("da.xor_h") != F.col("db.xor_h"))
        | (F.col("da.sum_mod") != F.col("db.sum_mod"))
    )
    bad = joined.where(diverged).select(
        F.coalesce(F.col("da.bucket"), F.col("db.bucket")).alias("bucket")
    ).persist()  # two consumers (the a/b semi-joins); without this each
    # join re-derives the bucket set and the digests run TWICE per side

    ga = (
        side(a)
        .join(F.broadcast(bad), on="bucket", how="left_semi")
        .groupBy("bucket", *names)
        .agg(F.count(F.lit(1)).cast("long").alias("n_a"))
        .alias("ra")
    )
    gb = (
        side(b)
        .join(F.broadcast(bad), on="bucket", how="left_semi")
        .groupBy("bucket", *names)
        .agg(F.count(F.lit(1)).cast("long").alias("n_b"))
        .alias("rb")
    )
    cond = F.col("ra.bucket") == F.col("rb.bucket")
    for n in names:
        cond = cond & F.col(f"ra.{n}").eqNullSafe(F.col(f"rb.{n}"))
    out = ga.join(gb, cond, "full_outer").select(
        F.coalesce(F.col("ra.bucket"), F.col("rb.bucket")).alias("bucket"),
        *[
            F.coalesce(F.col(f"ra.{n}"), F.col(f"rb.{n}")).alias(n)
            for n in names
        ],
        F.coalesce(F.col("ra.n_a"), F.lit(0).cast("long")).alias("n_a"),
        F.coalesce(F.col("rb.n_b"), F.lit(0).cast("long")).alias("n_b"),
    )
    return out.where(F.col("n_a") != F.col("n_b"))


def weighted_quantiles(
    df: DataFrame,
    key_cols: tuple[str, ...],
    value_col: Column | str,
    weight_col: Column | str,
    probs_permille: list[int],
) -> DataFrame:
    """Exact WEIGHTED quantiles per key over integer values and
    non-negative integer weights — "the median document length, where
    each document counts its token weight" (mixture design over
    weighted corpora; the unweighted form is corpus.length_percentiles).

    Definition (weighted inverted CDF): the p‰ quantile is the
    smallest value whose cumulative weight reaches ceil(p·W/1000) of
    the key's total weight W. The reach test is pure integer cross-
    multiplication — ``1000·cum ≥ p·W`` ⟺ cum ≥ ceil(p·W/1000) —
    so no float and no rounding-mode trap anywhere, and the oracle
    replays it verbatim.

    Scale shape: weights pre-aggregate to one row per (key, DISTINCT
    value) map-side; the cumulative and total windows share the one
    key shuffle and its sort; a final per-key aggregation extracts
    every requested quantile at once via min(value WHERE reached).
    Cost is one shuffle over |distinct (key, value)| rows — bounded by
    value cardinality, not row count.
    """
    if not probs_permille:
        raise ValueError("probs_permille must be non-empty")
    for p in probs_permille:
        if not 0 < p <= 1000:
            raise ValueError(f"probs_permille entries must be in (0, 1000]: {p}")
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    wt = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    keys = list(key_cols)
    # a NEGATIVE weight silently corrupting a quantile is the classic
    # quiet failure — raise per-row instead of filtering it away
    # (zero weights legitimately drop: they cannot be reached)
    w_checked = F.when(
        wt.cast("long") < 0,
        F.raise_error(F.lit("weighted_quantiles: negative weight")),
    ).otherwise(wt.cast("long"))
    g = (
        df.select(*keys, v.cast("long").alias("_v"), w_checked.alias("_w"))
        .where(F.col("_v").isNotNull() & (F.col("_w") > 0))
        .groupBy(*keys, "_v")
        .agg(F.sum("_w").alias("_w"))
    )
    wk = Window.partitionBy(*keys)
    cum = (
        g.withColumn("_cum", F.sum("_w").over(wk.orderBy("_v")))
        .withColumn("_tot", F.sum("_w").over(wk))
    )
    aggs = []
    for p in probs_permille:
        reached = F.lit(1000).cast("long") * F.col("_cum") >= F.lit(p).cast(
            "long"
        ) * F.col("_tot")
        aggs.append(
            F.min(F.when(reached, F.col("_v"))).alias(f"p{p}")
        )
    aggs.append(F.max("_tot").alias("total_weight"))
    return cum.groupBy(*keys).agg(*aggs)


def subject_access_report(
    tables: dict[str, tuple[DataFrame, Column, dict[str, Column]]],
    keys: DataFrame,
    key_col: str = "k",
) -> DataFrame:
    """Data-subject access report (the GDPR/CCPA EXPORT complement of
    the erasure path): for every requested subject key and every
    registered table, the subject's row count and an order-independent
    content digest of exactly their rows — the auditable "what do we
    hold about this person" answer, one row per (table, key) including
    explicit zero rows for keys a table does not contain (absence is
    part of the report).

    ``tables`` maps name → (df, subject_key_expr, canon_cols) where
    canon_cols are engine-portable column expressions (the
    ``dataset_digest`` contract: integers/strings, NULL → sentinel).

    Scale shape: deletion/export requests are human-scale, so the key
    set BROADCASTS to every table — each table costs one scan with the
    join filter applied (at real scale, compose with
    ``bloom_index_lookup_many`` file pruning so the scan opens only
    files that might hold a subject, exactly like the erasure
    planner). Per-key digests aggregate with map-side combine; the
    union is |tables| × |keys| rows. No shuffle carries subject data
    — only (key, partial-digest) rows.

    The digest is the same (n_rows, bit_xor, modular sum) triple as
    ``dataset_digest``, so a post-erasure re-run proves deletion:
    every erased subject's row collapses to (0, 0, 0).
    """
    p = F.lit(1_000_000_007).cast("long")
    outs = []
    for name, (df, subj, cols) in tables.items():
        parts = [
            F.coalesce(expr.cast("string"), F.lit("\x00NULL"))
            for expr in cols.values()
        ]
        h = F.conv(
            F.substring(F.md5(F.concat_ws("\x1f", *parts)), 1, 15), 16, 10
        ).cast("long")
        matched = (
            df.select(subj.cast("long").alias("_subj"), h.alias("_h"))
            .join(
                F.broadcast(keys.select(F.col(key_col).cast("long").alias("_subj"))),
                on="_subj",
            )
            .groupBy("_subj")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.expr("bit_xor(_h)").cast("long").alias("xor_h"),
                (F.sum((F.col("_h") % p).cast("decimal(38,0)")) % p)
                .cast("long")
                .alias("sum_mod"),
            )
        )
        outs.append(
            keys.select(F.col(key_col).cast("long").alias("_subj"))
            .join(matched, on="_subj", how="left")
            .select(
                F.lit(name).alias("table_name"),
                F.col("_subj").alias("subject_key"),
                F.coalesce("n_rows", F.lit(0)).cast("long").alias("n_rows"),
                F.coalesce("xor_h", F.lit(0)).cast("long").alias("xor_h"),
                F.coalesce("sum_mod", F.lit(0)).cast("long").alias("sum_mod"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out

def ks_drift(
    a: DataFrame,
    b: DataFrame,
    value: Column,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance between integer
    value distributions — the DISTRIBUTIONAL drift test that
    mean/null-rate profiles (profile_drift) cannot see (a variance
    doubling with the same mean sails through a moment check).

    All-integer: KS = max_v |cdf_a(v) - cdf_b(v)| is computed as the
    exact rational ks_num / (n_a * n_b) with
    ks_num = max_v |cum_a(v) * n_b - cum_b(v) * n_a| — no floats, so
    the statistic is hash-exact on any engine; callers compare
    ks_num * threshold_den vs threshold_num * n_a * n_b in integers.

    Scale shape: tag + union the two sides, ONE value-key groupBy to
    per-value (d_a, d_b) deltas, then the distributed prefix-sum
    primitive (operators/ranking.py global_prefix_sums: range
    exchange + P local cumsums + broadcast ≤P-row offset table) walks
    the CDFs in value order, and one final max aggregation. No
    partition-less window over data-sized input anywhere; contrast
    with the textbook SUM() OVER (ORDER BY v) formulation, which is
    exactly the single-partition sort the plan audit bans.

    Output: 1 row — (n_a, n_b, ks_num, ks_den, at_value) where
    at_value is the SMALLEST value attaining the max (deterministic).
    """
    tagged = a.select(value.cast("long").alias("v"), F.lit(1).alias("_s")).unionByName(
        b.select(value.cast("long").alias("v"), F.lit(0).alias("_s"))
    ).where(F.col("v").isNotNull())
    deltas = tagged.groupBy("v").agg(
        F.sum("_s").cast("long").alias("d_a"),
        F.sum(1 - F.col("_s")).cast("long").alias("d_b"),
    )
    return _ks_from_deltas(deltas, num_partitions)


def ks_drift_counted(
    a: DataFrame,
    b: DataFrame,
    value_col: str = "v",
    count_col: str = "cnt",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact two-sample KS from PRE-AGGREGATED (value, count)
    histograms — the read-side of STREAMING drift detection: a
    per-value count table is exactly the state
    ``streaming.sink.aggregate_view_sink`` maintains when keyed by the
    value column (n_rows per key), so composing the two gives
    bounded-state drift monitoring over an unbounded stream — the
    state is |distinct values| rows, never the stream. Identical
    output to :func:`ks_drift` over the raw rows by construction
    (the per-value deltas ARE these counts; pytest pins
    stream-vs-batch parity including batch replay). Rows with NULL
    value or count are ignored; counts must be non-negative."""
    z = F.lit(0).cast("long")
    tagged = a.select(
        F.col(value_col).cast("long").alias("v"),
        F.col(count_col).cast("long").alias("_ca"),
        z.alias("_cb"),
    ).unionByName(
        b.select(
            F.col(value_col).cast("long").alias("v"),
            z.alias("_ca"),
            F.col(count_col).cast("long").alias("_cb"),
        )
    ).where(F.col("v").isNotNull())
    deltas = tagged.groupBy("v").agg(
        F.sum("_ca").cast("long").alias("d_a"),
        F.sum("_cb").cast("long").alias("d_b"),
    )
    return _ks_from_deltas(deltas, num_partitions)


def _ks_from_deltas(deltas: DataFrame, num_partitions: int | None) -> DataFrame:
    """Shared KS tail over a per-value (d_a, d_b) delta table."""
    from flyq_spark.operators.ranking import global_prefix_sums

    # checkpoint the delta table ONCE at this level (r13, guide §1.2):
    # it has two consumers — the prefix-sum primitive AND the totals
    # aggregate below. Passing it raw let each consumer (plus the range
    # sampler) recompute the union+groupBy from the source tables; with
    # the shared lazy checkpoint that computes once and the primitive
    # is told the input is already materialized (materialize=False).
    deltas = deltas.localCheckpoint(eager=False)
    cums = global_prefix_sums(
        deltas,
        [F.col("v").asc()],
        {"cum_a": F.col("d_a"), "cum_b": F.col("d_b")},
        num_partitions=num_partitions,
        materialize=False,
    )
    # n_a/n_b are the final cumulative values = scalar totals; take them
    # from a 1-row aggregate of the deltas (cheap, reuses nothing big)
    totals = deltas.agg(
        F.sum("d_a").cast("long").alias("n_a"),
        F.sum("d_b").cast("long").alias("n_b"),
    )
    gap = cums.crossJoin(F.broadcast(totals)).select(
        "n_a",
        "n_b",
        "v",
        F.abs(
            F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
        ).alias("_gap"),
    )
    return (
        gap.groupBy("n_a", "n_b")
        .agg(
            F.max("_gap").cast("long").alias("ks_num"),
            F.min(F.struct((-F.col("_gap")).alias("_ng"), F.col("v")))
            .getField("v")
            .alias("at_value"),
        )
        .select(
            "n_a",
            "n_b",
            "ks_num",
            (F.col("n_a") * F.col("n_b")).cast("long").alias("ks_den"),
            F.col("at_value").cast("long"),
        )
    )


def ks_by_group(
    df: DataFrame,
    group_col: str,
    value: Column,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-cohort drift matrix: for EVERY group, the exact integer KS
    distance between the group's value distribution and its COMPLEMENT
    (everything else) — the one-pass answer to "which source/segment
    drifted", where :func:`ks_drift` answers a single A/B question.

    Exact semantics: KS must be evaluated at every POOLED value (a
    group's CDF is flat between its own points while the complement's
    rises), so each distinct value is replicated to every group (a
    broadcast of the ≤|groups|-row group list), the group CDFs run
    through the per-group distributed prefix-sum primitive
    (operators/ranking.py — a window PARTITIONED by the group column
    would put each group's whole grid slice in ONE sort task, the
    straggler this gate exists to avoid), and the pooled CDF rides the
    same primitive globally, broadcast-joined back. Complement CDF =
    pooled − group. All-integer outputs: ks_num = max_v |cum_g·n_rest −
    cum_rest·n_g|, ks_den = n_g·n_rest.

    Cost: one (v,g) groupBy + one v groupBy + |distinct v| × |groups|
    grid through one range exchange — linear in distinct values, NEVER
    in row count, with |groups| expected human-scale (sources, event
    types, cohorts). Output: one row per group
    (group, n_g, n_rest, ks_num, ks_den, at_value)."""
    from flyq_spark.operators.ranking import global_prefix_sums, grouped_prefix_sums

    src = df.select(
        F.col(group_col).alias("_g"), value.cast("long").alias("_v")
    ).where(F.col("_v").isNotNull() & F.col("_g").isNotNull())
    # checkpoint the two counted tables ONCE (r13, guide §1.2): gv has
    # FOUR consumers (dv, groups, n_tot, grid) and dv has two (the
    # pooled prefix sums + the grid's value spine) — raw, each consumer
    # replayed the data-sized scan+groupBy; checkpointed, the scan and
    # both aggregations run exactly once.
    gv = (
        src.groupBy("_g", "_v")
        .agg(F.count(F.lit(1)).cast("long").alias("_d"))
        .localCheckpoint(eager=False)
    )
    dv = (
        gv.groupBy("_v")
        .agg(F.sum("_d").cast("long").alias("_dt"))
        .localCheckpoint(eager=False)
    )
    cum_tot = global_prefix_sums(
        dv,
        [F.col("_v").asc()],
        {"_ct": F.col("_dt")},
        num_partitions=num_partitions,
        materialize=False,
    ).select("_v", "_ct")
    groups = gv.groupBy("_g").agg(F.sum("_d").cast("long").alias("_ng"))
    n_tot = F.broadcast(
        gv.agg(F.sum("_d").cast("long").alias("_nt"))
    )
    grid = (
        dv.select("_v")
        .crossJoin(F.broadcast(groups))
        .join(gv, on=["_g", "_v"], how="left")
        .withColumn("_d", F.coalesce("_d", F.lit(0)))
    )
    cums = (
        grouped_prefix_sums(
            grid,
            ["_g"],
            [F.col("_v").asc()],
            {"_cg": F.col("_d")},
            num_partitions=num_partitions,
        )
        .join(cum_tot, on="_v")
        .crossJoin(n_tot)
    )
    gap = cums.select(
        "_g",
        "_v",
        "_ng",
        (F.col("_nt") - F.col("_ng")).alias("_nr"),
        F.abs(
            F.col("_cg") * (F.col("_nt") - F.col("_ng"))
            - (F.col("_ct") - F.col("_cg")) * F.col("_ng")
        ).alias("_gap"),
    )
    return (
        gap.groupBy("_g", "_ng", "_nr")
        .agg(
            F.max("_gap").cast("long").alias("ks_num"),
            F.min(F.struct((-F.col("_gap")).alias("_n"), F.col("_v")))
            .getField("_v")
            .cast("long")
            .alias("at_value"),
        )
        .select(
            F.col("_g").alias(group_col),
            F.col("_ng").alias("n_g"),
            F.col("_nr").alias("n_rest"),
            "ks_num",
            (F.col("_ng") * F.col("_nr")).cast("long").alias("ks_den"),
            "at_value",
        )
    )
