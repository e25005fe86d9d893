"""Scale point for the r12 `mixture_build_epochs` fusion (VERDICT r12
next-round #5): fused multi-epoch mixture vs the per-alpha
`mixture_build` union it replaced, on synthetic corpora big enough that
the data-sized range exchange — not scheduling overhead — is the cost.

The r12 trade under test: at sf0.1 the fused form measured ~0.3 s
SLOWER (the union's three independent subtrees overlapped across idle
cores), while the plan does a THIRD of the ranking/exchange work (1
range exchange + 2 corpus scans vs 3 + 6). The claim is that at real
data volume the fused form wins; this tool measures exactly that, plus
row-identity between the two forms at the smallest size.

Input mirrors tools/bench_epoch_scale.py: spark.range with a Zipf-ish
23-source skew (no fixture dependency). Both forms run to the noop sink
(guide §1.4). Results belong in OPTIMIZATION_r13.md / SCALE.md.

Usage: python tools/bench_mixture_scale.py [n_rows ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


ALPHAS = (1000, 500, 250)


def union_form(df, budget):
    """The pre-r12 shape: one full mixture_build per alpha, epoch-tagged
    and unioned — re-ranks the corpus once per epoch."""
    from flyq_spark.operators.corpus import mixture_build

    parts = [
        mixture_build(df, "source", alpha_permille=a, budget=budget)
        .withColumn("epoch", F.lit(e).cast("long"))
        .select("epoch", "id", "source", "sample_rank", "n_copies")
        for e, a in enumerate(ALPHAS)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def fused_form(df, budget):
    from flyq_spark.operators.corpus import mixture_build_epochs

    return mixture_build_epochs(
        df, "source", alpha_permilles=ALPHAS, budget=budget, id_col="id"
    )


def main() -> None:
    from flyq_spark.session import get_spark

    sizes = [int(float(a)) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    parts = int(os.environ.get("EPOCH_SCALE_PARTITIONS", "32"))
    spark = get_spark("mixture_scale", shuffle_partitions=parts)

    def corpus(n):
        return spark.range(n).select(
            F.col("id"),
            F.concat(
                F.lit("src"), ((F.col("id") * F.col("id")) % 23).cast("string")
            ).alias("source"),
        )

    def run(tag, fn, df, budget):
        spark.sparkContext.setJobDescription(f"mixture_scale {tag}")
        t0 = time.time()
        fn(df, budget).write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        return dt

    # row-identity check at the smallest size (cheap): fused must be
    # row-for-row the union form
    n0 = min(sizes[0], 200_000)
    small = corpus(n0)
    b0 = max(n0 // 10, 1)
    diff = (
        fused_form(small, b0)
        .exceptAll(union_form(small, b0))
        .unionByName(union_form(small, b0).exceptAll(fused_form(small, b0)))
        .count()
    )
    print(f"row-identity at n={n0}: exceptAll-diff rows = {diff}")
    assert diff == 0, "fused and union forms disagree"

    for n in sizes:
        df = corpus(n).localCheckpoint()  # shared, pre-materialized input
        budget = max(n // 10, 1)
        results = {}
        # alternate order to be fair to caches/JIT; report min of 2
        for tag, fn in (("fused", fused_form), ("union", union_form)):
            results[tag] = min(run(tag, fn, df, budget) for _ in range(2))
        ratio = results["union"] / results["fused"]
        print(
            f"n={n:>11,}  budget={budget:>10,}  "
            f"fused={results['fused']:7.2f}s  union={results['union']:7.2f}s  "
            f"union/fused={ratio:.2f}x"
        )
    spark.stop()


if __name__ == "__main__":
    main()
