"""Measured scale curve for train_bpe_exact (r12, re-measured r13 with
the Arrow round kernel): synthetic distinct-word vocabularies of
10^5 / 10^6 / 10^7 entries through the distributed BPE merge loop on
local[32]. The claim under test: each merge round costs one Arrow
``mapInPandas`` pass (rewrite + per-task pair partials, see
bpe._bpe_round_kernel) + one bounded JVM partials aggregation + one
localCheckpoint materialization over |vocab| rows, so per-round
wall-time scales ~linearly in vocab size and is FLAT across rounds
(the merge rewrite never grows the table — it shrinks symbol counts),
with no driver state beyond the merge list.

r13 A/B at 10^6 vocab (same host, same session): the r12 all-Catalyst
HOF round (interpreted aggregate-fold rewrite + transform pair
projection) ran 2.2 s/round; the Arrow kernel round runs 0.8 s/round —
2.7x — with an identical merge sequence.

Input is spark.range (no fixture dependency): each id becomes a
pseudo-random 3-12 char word from the md5 hex alphabet (16 symbols, so
pair statistics stay dense and merges keep finding work at every
size), with a Zipf-flavored frequency 1 + (id mod 997). The words
table stands in for _bpe_vocab's output — the corpus scan itself is
word_frequencies' one groupBy, already measured elsewhere; this
isolates the loop.

Usage: python tools/bench_bpe_scale.py [n_vocab ...] [--merges N]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from flyq_spark.operators.bpe import (
        END,
        _BPE_ROUND_SCHEMA,
        _bpe_round_kernel,
    )
    from flyq_spark.session import get_spark

    argv = sys.argv[1:]
    n_merges = 10
    if "--merges" in argv:
        i = argv.index("--merges")
        n_merges = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    argv = [a for a in argv if a != "--no-unpersist"]
    sizes = [int(float(a)) for a in argv] or [100_000, 1_000_000, 10_000_000]

    spark = get_spark("bpe_scale", shuffle_partitions=32)

    # pay the one-time Python-worker import storm outside the timers
    def _warm(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        for b in batches:
            yield b

    (
        spark.range(64)
        .repartition(32)
        .mapInPandas(_warm, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    for n in sizes:
        # 3-12 char md5-hex words (16-symbol alphabet keeps pair
        # statistics dense at every size); freq 1 + id mod 997
        vocab = spark.range(n).select(
            F.substring(
                F.md5(F.col("id").cast("string")),
                1,
                (F.col("id") % 10 + 3).cast("int"),
            ).alias("word"),
            (F.col("id") % 997 + 1).cast("long").alias("f"),
        )
        syms = F.concat(
            F.array_remove(F.split(F.col("word"), "(?!^)"), ""),
            F.array(F.lit(END)),
        )
        state = vocab.withColumn("syms", syms).select("f", "syms")

        # the train_bpe_exact loop body, verbatim (kernel + bounded
        # partials argmax + lazy checkpoint ladder)
        combined = state.mapInPandas(
            _bpe_round_kernel(None), schema=_BPE_ROUND_SCHEMA
        ).localCheckpoint(eager=False)
        pending = None
        per_round = []
        merges = []
        for rank in range(1, n_merges + 1):
            t0 = time.time()
            top = (
                combined.where(F.col("_pl").isNotNull())
                .groupBy("_pl", "_pr")
                .agg(F.sum("_pc").cast("long").alias("pair_count"))
                .orderBy(
                    F.col("pair_count").desc(),
                    F.col("_pl").asc(),
                    F.col("_pr").asc(),
                )
                .limit(1)
                .collect()
            )
            if pending is not None and "--no-unpersist" not in sys.argv:
                pending.unpersist()
            pending = None
            if not top:
                break
            a, b = top[0]["_pl"], top[0]["_pr"]
            merges.append((a, b, top[0]["pair_count"]))
            if rank == n_merges:
                per_round.append(time.time() - t0)
                break
            pending = combined
            combined = (
                combined.where(F.col("_pl").isNull())
                .select("f", "syms")
                .mapInPandas(
                    _bpe_round_kernel((a, b, a + b)), schema=_BPE_ROUND_SCHEMA
                )
                .localCheckpoint(eager=False)
            )
            per_round.append(time.time() - t0)

        rounds = " ".join(f"{t:.1f}" for t in per_round)
        print(
            f"n_vocab={n}: {len(per_round)} rounds, total "
            f"{sum(per_round):.1f}s, per-round [{rounds}]s, "
            f"first merge {merges[0] if merges else None}",
            flush=True,
        )
        combined.unpersist()
        if pending is not None:
            pending.unpersist()


if __name__ == "__main__":
    main()
