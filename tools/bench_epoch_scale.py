"""Measured scale curve for the composed epoch-assembly path (r11):
synthetic 10^6 vs 10^7/10^8 documents through temperature_mix ->
mixture_build -> copy replication -> pack_documents on local[32].
The claim under test: the composition inherits each stage's scale
shape — one groupBy to |sources| quota rows, ONE grouped row_number
range exchange over the corpus, a broadcast quota join, the explode,
and pack_documents' 16-shard ring window — so wall-time scales
~linearly with corpus size and the budget-sized epoch (NOT the
corpus) is what crosses the pack window.

Input is spark.range (no fixture dependency): 23 sources with a
Zipf-ish skew (source = id % 23 biased by squaring), text = 5..16
synthetic tokens. Checks Sigma n_copies = budget exactly at every
size (the end-to-end theorem). Results are recorded in SCALE.md.

Usage: python tools/bench_epoch_scale.py [n_rows ...]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    import os as _os

    sys.path.insert(
        0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    )
    from flyq_spark.operators.corpus import mixture_build, pack_documents
    from flyq_spark.session import get_spark

    import os

    sizes = [int(float(a)) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    # Partition count is THE memory knob at 10^8 on one box: the ring
    # rank checkpoints (id, source, md5-hex) rows, and 10^8/32
    # partitions = ~1 GB of deserialized strings per block x 32
    # concurrent tasks OOMs a 16g heap. A cluster runs thousands of
    # shuffle partitions; mirror that here (EPOCH_SCALE_PARTITIONS).
    parts = int(os.environ.get("EPOCH_SCALE_PARTITIONS", "32"))
    # pack-ring width (SCALE.md r11): 1 digit = 16 shards caps the pack
    # window at 16 sort tasks; 3 digits = 4096 keeps groups epoch/4096
    digits = int(os.environ.get("EPOCH_SCALE_PACK_DIGITS", "1"))
    spark = get_spark("epoch_scale", shuffle_partitions=parts)
    for n in sizes:
        budget = max(n // 10, 1)
        df = spark.range(n).select(
            F.col("id"),
            # Zipf-ish source skew: squaring biases toward low ids
            F.concat(
                F.lit("src"), ((F.col("id") * F.col("id")) % 23).cast("string")
            ).alias("source"),
            F.concat(
                F.lit("tok "),
                F.repeat(F.lit("w "), (F.col("id") % 12).cast("int") + 4),
            ).alias("text"),
        )

        t0 = time.time()
        drawn = mixture_build(
            df, "source", alpha_permille=500, budget=budget, id_col="id"
        )
        reps = (
            drawn.join(df.select("id", "text"), "id")
            .select(
                "id",
                "text",
                F.explode(
                    F.sequence(F.lit(1).cast("long"), F.col("n_copies"))
                ).alias("_copy"),
            )
            .drop("_copy")
        )
        packed = pack_documents(
            reps, token_budget=2048, id_col="id", shard_digits=digits
        )
        r = packed.agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.max("pack_id") + 1).alias("max_packs_per_shard"),
        ).collect()[0]
        t_epoch = time.time() - t0
        assert r["n_seqs"] == budget, r

        print(
            f"n={n}: epoch_plan(budget={budget})={t_epoch:.1f}s "
            f"(packed {r['n_seqs']} seqs, {r['total_tokens']} tokens, "
            f"<= {r['max_packs_per_shard']} packs/shard)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
