"""Measured scale curve for train_bpe_exact (r12): synthetic distinct-word
vocabularies of 10^5 / 10^6 / 10^7 entries through the distributed BPE
merge loop on local[32]. The claim under test: each merge round costs
one map-side-combined pair aggregation + one localCheckpoint
materialization over |vocab| rows, so per-round wall-time scales
~linearly in vocab size and is FLAT across rounds (the merge rewrite
never grows the table — it shrinks symbol counts), with no driver
state beyond the merge list.

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
    from flyq_spark.operators.bpe import END, _bpe_pairs_from_vocab
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
        v = vocab.withColumn("syms", syms).localCheckpoint()

        per_round = []
        merges = []
        for rank in range(1, n_merges + 1):
            t0 = time.time()
            top = (
                _bpe_pairs_from_vocab(v)
                .orderBy(
                    F.col("pair_count").desc(),
                    F.col("left_sym").asc(),
                    F.col("right_sym").asc(),
                )
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b = top[0]["left_sym"], top[0]["right_sym"]
            merges.append((a, b, top[0]["pair_count"]))
            withnext = F.transform(
                F.col("syms"),
                lambda x, i: F.struct(
                    x.alias("s"), F.get(F.col("syms"), i + 1).alias("n")
                ),
            )
            merged = F.aggregate(
                withnext,
                F.struct(
                    F.array().cast("array<string>").alias("acc"),
                    F.lit(False).alias("skip"),
                ),
                lambda st, x: (
                    F.when(
                        st["skip"],
                        F.struct(
                            st["acc"].alias("acc"), F.lit(False).alias("skip")
                        ),
                    )
                    .when(
                        (x["s"] == F.lit(a)) & (x["n"].eqNullSafe(F.lit(b))),
                        F.struct(
                            F.concat(st["acc"], F.array(F.lit(a + b))).alias(
                                "acc"
                            ),
                            F.lit(True).alias("skip"),
                        ),
                    )
                    .otherwise(
                        F.struct(
                            F.concat(st["acc"], F.array(x["s"])).alias("acc"),
                            F.lit(False).alias("skip"),
                        )
                    )
                ),
                lambda st: st["acc"],
            )
            prev = v
            v = v.withColumn("syms", merged).localCheckpoint()
            if "--no-unpersist" not in sys.argv:
                prev.unpersist()
            per_round.append(time.time() - t0)

        rounds = " ".join(f"{t:.1f}" for t in per_round)
        print(
            f"n_vocab={n}: {len(per_round)} rounds, total "
            f"{sum(per_round):.1f}s, per-round [{rounds}]s, "
            f"first merge {merges[0] if merges else None}",
            flush=True,
        )
        v.unpersist()


if __name__ == "__main__":
    main()
