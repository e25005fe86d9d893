"""Driver-contract smoke tests: entry() under a vanilla session (the
driver builds its own SparkSession without our factory's confs), and
queries()/oracle_sql() consistency."""

from __future__ import annotations


def test_queries_and_oracles_consistent():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs), "oracle without a query"
    assert len(qs) >= 30
    # the documented rows-only set is exactly the non-oracle remainder
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "unigram_surprisal",
        "mmr_topk",
        "bpe_merges",
        "bpe_encode_stats",
        "minhash_pairs",
        "simhash_neardup",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "kmeans_centroids",
        "bm25_top10",
        "pq_topk",
        "multimodal_features",
        "sketch_stats",
        "semdedup",
        "pagerank_neardup",
        "phash_neardup",
        "source_overlap",
        "lsh_tuning",
        "ivf_tuning",
    }


def test_entry_runs_on_vanilla_session(spark):
    """entry() must work with whatever session the driver provides —
    read_table pins the confs it needs at runtime."""
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    cols = set(df.columns)
    assert {"part_id", "lag", "severity"} <= cols
