"""Measured scale curve for the decontamination shingle join (r11):
synthetic 10^6 vs 10^7 documents through contamination_report on
local[32]. The claim under test: both sides dedup with map-side
partial aggregation BEFORE the join and the join key is the 60-bit
hashed shingle (8 bytes), so cost scales with |distinct shingles| —
never corpus x corpus and never string-keyed shuffle bytes.

Input is spark.range (no fixture dependency): ~9-14-token texts drawn
from a 10k-word vocabulary with overlapping windows, so train/eval
shingle overlap is real (leakage > 0 at every size, asserted).

Usage: python tools/bench_contamination_scale.py [n_rows ...]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from flyq_spark.operators.corpus import contamination_report
    from flyq_spark.session import get_spark

    sizes = [int(float(a)) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    parts = int(os.environ.get("CONTAM_SCALE_PARTITIONS", "32"))
    spark = get_spark("contam_scale", shuffle_partitions=parts)
    for n in sizes:
        # overlapping vocab windows -> adjacent ids share most shingles
        start = (F.col("id") * 7) % 10_000
        words = F.transform(
            F.sequence(F.lit(0), (F.col("id") % 6).cast("int") + F.lit(8)),
            lambda i: F.concat(F.lit("w"), ((start + i) % 10_000).cast("string")),
        )
        df = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.array_join(words, " ").alias("text"),
        )
        t0 = time.time()
        rows = {
            r["split"]: r
            for r in contamination_report(df, n=8).collect()
        }
        dt = time.time() - t0
        total_docs = sum(r["n_docs"] for r in rows.values())
        total_hits = sum(r["n_hits"] for r in rows.values())
        assert set(rows) == {"test", "val"}, rows
        assert total_hits > 0, "no leakage exercised"
        print(
            f"n={n}: contamination_report={dt:.1f}s "
            f"(eval_docs={total_docs}, "
            f"ngrams={sum(r['n_ngrams'] for r in rows.values())}, "
            f"hits={total_hits})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
