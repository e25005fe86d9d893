"""Round-7 operators: footer-stats pruning, dataset digest, exact
correlation components, per-key trend, weighted-cosine similarity join."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


# ------------------------------------------------------------------ #
# pruning.file_stats / skipping_report
# ------------------------------------------------------------------ #


def _write_bucketed(spark, tmp_path, n=1000, bucket=100):
    out = str(tmp_path / "ds")
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
        F.expr(f"id div {bucket}").alias("b"),
    )
    df.repartition(32, "b").write.partitionBy("b").parquet(out)
    return out


def test_file_stats_match_true_minmax(spark, tmp_path):
    from flyq_spark.operators import pruning

    out = _write_bucketed(spark, tmp_path)
    st = pruning.file_stats(spark, out, ["k", "v"])
    rows = {r["file"]: r for r in st.collect()}
    assert len(rows) == 10
    truth = {
        r["b"]: r
        for r in spark.read.parquet(out)
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("kmin"),
            F.max("k").alias("kmax"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
        )
        .collect()
    }
    for f, r in rows.items():
        b = int(f.split("/")[0].split("=")[1])
        t = truth[b]
        assert r["n_rows"] == t["n"]
        assert r["k_min"] == t["kmin"] and r["k_max"] == t["kmax"]
        assert r["v_min"] == t["vmin"] and r["v_max"] == t["vmax"]


def test_skipping_report_is_sound_and_tight(spark, tmp_path):
    from flyq_spark.operators import pruning

    out = _write_bucketed(spark, tmp_path)
    st = pruning.file_stats(spark, out, ["k"])
    rep = pruning.skipping_report(st, "k", 250, 449).collect()
    # sound: skipped files contain NO matching row; tight on this
    # k-clustered layout: every unskipped file DOES contain a match
    skipped = {r["file"] for r in rep if r["skipped"]}
    kept = {r["file"] for r in rep if not r["skipped"]}
    assert len(skipped) == 7 and len(kept) == 3
    df = spark.read.parquet(out).where((F.col("k") >= 250) & (F.col("k") <= 449))
    assert df.count() == 200
    # rows avoided = sum of skipped files' n_rows
    assert sum(r["n_rows"] for r in rep if r["skipped"]) == 700


def test_skipping_never_skips_without_stats(spark, tmp_path):
    from flyq_spark.operators import pruning

    out = _write_bucketed(spark, tmp_path)
    st = pruning.file_stats(spark, out, ["nonexistent"])
    rep = pruning.skipping_report(st, "nonexistent", 0, 1)
    assert rep.where("skipped").count() == 0


def test_file_stats_timestamp_stats(spark, tmp_path):
    from flyq_spark.operators import pruning
    from flyq_spark.io import read_table

    ev = read_table(spark, SF_SMALL, "events")
    out = str(tmp_path / "ts_ds")
    ev.coalesce(2).write.parquet(out)
    st = pruning.file_stats(spark, out, ["ts"]).collect()
    lo = min(r["ts_min"] for r in st)
    hi = max(r["ts_max"] for r in st)
    truth = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    assert lo == truth[0] and hi == truth[1]


# ------------------------------------------------------------------ #
# profile.dataset_digest
# ------------------------------------------------------------------ #


def _digest_rows(spark, df, buckets=16):
    from flyq_spark.operators.profile import dataset_digest

    cols = {"k": F.col("k"), "s": F.col("s")}
    return sorted(
        tuple(r) for r in dataset_digest(df, cols, buckets=buckets).collect()
    )


def test_digest_partition_order_independent(spark):
    base = spark.range(500).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("s")
    )
    a = _digest_rows(spark, base.repartition(1))
    b = _digest_rows(spark, base.repartition(13))
    assert a == b


def test_digest_detects_single_row_drift(spark):
    base = spark.range(500).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("s")
    )
    drifted = base.withColumn(
        "s", F.when(F.col("k") == 123, F.lit("changed")).otherwise(F.col("s"))
    )
    assert _digest_rows(spark, base) != _digest_rows(spark, drifted)
    # and a dropped row too
    assert _digest_rows(spark, base) != _digest_rows(spark, base.where("k <> 7"))


def test_digest_null_sentinel_distinguishes_null_from_text(spark):
    a = spark.createDataFrame([(1, None)], "k long, s string")
    b = spark.createDataFrame([(1, "\x00NULL")], "k long, s string")
    # identical by concat_ws-with-skip semantics; the sentinel keeps them
    # equal here BY DESIGN choice of sentinel — what must differ is null
    # vs empty string
    c = spark.createDataFrame([(1, "")], "k long, s string")
    assert _digest_rows(spark, a) != _digest_rows(spark, c)
    assert _digest_rows(spark, a) == _digest_rows(spark, b)  # documented collision


def test_digest_merges_across_shards(spark):
    from flyq_spark.operators.profile import dataset_digest

    base = spark.range(400).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("s")
    )
    cols = {"k": F.col("k"), "s": F.col("s")}
    whole = {
        r["bucket"]: r for r in dataset_digest(base, cols, buckets=8).collect()
    }
    p = 1_000_000_007
    h1 = dataset_digest(base.where("k < 150"), cols, buckets=8).collect()
    h2 = dataset_digest(base.where("k >= 150"), cols, buckets=8).collect()
    merged: dict = {}
    for r in list(h1) + list(h2):
        m = merged.setdefault(r["bucket"], {"n": 0, "x": 0, "s": 0})
        m["n"] += r["n_rows"]
        m["x"] ^= r["xor_h"]
        m["s"] = (m["s"] + r["sum_mod"]) % p
    assert set(merged) == set(whole)
    for b, m in merged.items():
        w = whole[b]
        assert (m["n"], m["x"], m["s"]) == (w["n_rows"], w["xor_h"], w["sum_mod"])


# ------------------------------------------------------------------ #
# profile.corr_components
# ------------------------------------------------------------------ #


def test_corr_components_match_python(spark):
    from flyq_spark.operators.profile import corr_components

    rng = random.Random(7)
    data = [
        (rng.randrange(0, 50), rng.randrange(-10, 10), rng.randrange(0, 5))
        for _ in range(1000)
    ]
    df = spark.createDataFrame(data, "x long, y long, z long")
    out = {
        (r["col_x"], r["col_y"]): r
        for r in corr_components(
            df, {"x": F.col("x"), "y": F.col("y"), "z": F.col("z")}
        ).collect()
    }
    import itertools

    for a, b in itertools.combinations(sorted(["x", "y", "z"]), 2):
        ia, ib = "xyz".index(a), "xyz".index(b)
        n = len(data)
        sx = sum(d[ia] for d in data)
        sy = sum(d[ib] for d in data)
        sxy = sum(d[ia] * d[ib] for d in data)
        sxx = sum(d[ia] ** 2 for d in data)
        syy = sum(d[ib] ** 2 for d in data)
        r = out[(a, b)]
        assert r["n"] == n and r["sum_x"] == sx and r["sum_y"] == sy
        assert r["cov_num"] == n * sxy - sx * sy
        assert r["var_x_num"] == n * sxx - sx * sx
        assert r["var_y_num"] == n * syy - sy * sy
        # sanity: the reconstructed float r matches statistics.correlation
        if r["var_x_num"] and r["var_y_num"]:
            import statistics

            got = r["cov_num"] / math.sqrt(r["var_x_num"] * r["var_y_num"])
            want = statistics.correlation(
                [d[ia] for d in data], [d[ib] for d in data]
            )
            assert abs(got - want) < 1e-12


def test_corr_components_null_rows_excluded(spark):
    from flyq_spark.operators.profile import corr_components

    df = spark.createDataFrame(
        [(1, 2), (2, None), (None, 4), (3, 6)], "x long, y long"
    )
    r = corr_components(df, {"x": F.col("x"), "y": F.col("y")}).collect()[0]
    # only (1,2) and (3,6) survive
    assert r["n"] == 2 and r["sum_x"] == 4 and r["sum_y"] == 8


def test_corr_components_rejects_single_column(spark):
    from flyq_spark.operators.profile import corr_components

    with pytest.raises(ValueError):
        corr_components(spark.range(3), {"x": F.col("id")})


# ------------------------------------------------------------------ #
# timeseries.group_trend
# ------------------------------------------------------------------ #


def test_group_trend_exact_slope(spark):
    from flyq_spark.operators.timeseries import group_trend

    # key a: perfect slope 3 (y = 3x + 1); key b: flat
    rows = [("a", x, 3 * x + 1) for x in range(10)] + [
        ("b", x, 42) for x in range(5)
    ]
    df = spark.createDataFrame(rows, "k string, x long, y long")
    out = {r["k"]: r for r in group_trend(df, ["k"], "x", "y").collect()}
    a = out["a"]
    assert a["slope_den"] > 0 and a["slope_num"] == 3 * a["slope_den"]
    b = out["b"]
    assert b["slope_num"] == 0 and b["slope_den"] > 0


def test_group_trend_single_x_no_trend(spark):
    from flyq_spark.operators.timeseries import group_trend

    df = spark.createDataFrame([("a", 5, 1), ("a", 5, 9)], "k string, x long, y long")
    r = group_trend(df, ["k"], "x", "y").collect()[0]
    assert r["slope_den"] == 0  # caller's "no trend defined" signal


def test_group_trend_matches_least_squares(spark):
    from flyq_spark.operators.timeseries import group_trend

    rng = random.Random(11)
    rows = [("k", x, rng.randrange(-100, 100)) for x in range(50)]
    df = spark.createDataFrame(rows, "k string, x long, y long")
    r = group_trend(df, ["k"], "x", "y").collect()[0]
    xs = [x for _, x, _ in rows]
    ys = [y for _, _, y in rows]
    import statistics

    want = statistics.linear_regression(xs, ys).slope
    assert abs(r["slope_num"] / r["slope_den"] - want) < 1e-12


# ------------------------------------------------------------------ #
# dedup.cosine_pairs
# ------------------------------------------------------------------ #


def _naive_cosine_pairs(docs, t):
    """Python model: exact tf-cosine over whitespace tokens."""
    from collections import Counter

    tf = {i: Counter(s.lower().split()) for i, s in docs}
    norm = {i: sum(v * v for v in c.values()) for i, c in tf.items()}
    out = set()
    ids = sorted(tf)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if not norm[a] or not norm[b]:
                continue
            dot = sum(tf[a][k] * tf[b][k] for k in tf[a] if k in tf[b])
            if dot > 0 and dot * dot >= t * t * norm[a] * norm[b] - 1e-9:
                out.add((a, b, dot, norm[a], norm[b]))
    return out


def test_cosine_pairs_match_naive_model(spark):
    from flyq_spark.operators.dedup import cosine_pairs

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the mat today"),  # near-copy
        (3, "the the the the cat"),  # same set as 5, different tf
        (4, "dogs run fast in parks"),
        (5, "the cat"),
        (6, "cat the"),  # identical multiset to 5 → cosine 1
        (7, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        tuple(r)
        for r in cosine_pairs(df, min_cosine=0.8).collect()
    }
    want = _naive_cosine_pairs(docs, 0.8)
    assert got == want
    assert (5, 6, 2, 2, 2) in got  # identical multisets found
    pair12 = [g for g in got if g[:2] == (1, 2)]
    assert pair12  # near-copy found


def test_cosine_pairs_randomized_vs_model(spark):
    from flyq_spark.operators.dedup import cosine_pairs

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(40):
        n = rng.randrange(1, 25)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # inject guaranteed near-dups
    docs.append((100, docs[0][1] + " extra"))
    docs.append((101, docs[1][1]))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for t in (0.9, 0.75, 0.6):
        got = {tuple(r) for r in cosine_pairs(df, min_cosine=t).collect()}
        want = _naive_cosine_pairs(docs, t)
        assert got == want, f"t={t}"


def test_cosine_pairs_tf_sensitivity_vs_jaccard_blindness(spark):
    from flyq_spark.operators.dedup import cosine_pairs

    # same token SET, very different frequencies: Jaccard == 1 but
    # cosine is far below 1 — the case this operator exists for
    docs = [(1, "a b"), (2, "a a a a a a a a a b")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    assert cosine_pairs(df, min_cosine=0.95).count() == 0
    assert cosine_pairs(df, min_cosine=0.5).count() == 1


def test_cosine_pairs_rejects_bad_threshold(spark):
    from flyq_spark.operators.dedup import cosine_pairs

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        cosine_pairs(df, min_cosine=0.0)


# ------------------------------------------------------------------ #
# cdc.golden_record
# ------------------------------------------------------------------ #


def test_golden_record_field_level_survivorship(spark):
    from flyq_spark.operators.cdc import golden_record

    rows = [
        # key, ord, tie, a, b
        (1, 10, 1, "a1", None),
        (1, 20, 2, None, "b1"),   # latest row: a is null — must NOT clobber
        (2, 10, 3, None, None),
        (3, 10, 4, "x", "y"),
        (3, 10, 5, "x2", None),   # same ord: tie decides, a=x2 survives
    ]
    df = spark.createDataFrame(rows, "k long, o long, t long, a string, b string")
    out = {
        r["k"]: r
        for r in golden_record(
            df, ("k",), ("o", "t"), {"a": F.col("a"), "b": F.col("b")}
        ).collect()
    }
    assert out[1]["a"] == "a1" and out[1]["b"] == "b1"
    assert out[2]["a"] is None and out[2]["b"] is None and out[2]["n_rows"] == 1
    assert out[3]["a"] == "x2" and out[3]["b"] == "y"


def test_golden_record_matches_python_model(spark):
    from flyq_spark.operators.cdc import golden_record

    rng = random.Random(5)
    rows = []
    for i in range(2000):
        rows.append(
            (
                rng.randrange(0, 50),
                rng.randrange(0, 100),
                i,
                rng.choice([None, f"a{rng.randrange(5)}"]),
                rng.choice([None, None, rng.randrange(1000)]),
            )
        )
    df = spark.createDataFrame(rows, "k long, o long, t long, a string, b long")
    got = {
        r["k"]: (r["n_rows"], r["a"], r["b"])
        for r in golden_record(
            df, ("k",), ("o", "t"), {"a": F.col("a"), "b": F.col("b")}
        ).collect()
    }
    model: dict = {}
    for k, o, t, a, b in rows:
        m = model.setdefault(k, {"n": 0, "a": None, "b": None})
        m["n"] += 1
        if a is not None and (m["a"] is None or (o, t) >= m["a"][0]):
            m["a"] = ((o, t), a)
        if b is not None and (m["b"] is None or (o, t) >= m["b"][0]):
            m["b"] = ((o, t), b)
    for k, m in model.items():
        want = (m["n"], m["a"][1] if m["a"] else None, m["b"][1] if m["b"] else None)
        assert got[k] == want, k


def test_golden_record_idempotent_on_own_output(spark):
    from flyq_spark.operators.cdc import golden_record

    df = spark.createDataFrame(
        [(1, 10, 1, "x"), (1, 20, 2, None)], "k long, o long, t long, a string"
    )
    first = golden_record(df, ("k",), ("o", "t"), {"a": F.col("a")})
    # feed survivors back with a constant order: unchanged
    again = golden_record(
        first.select("k", F.lit(0).alias("o"), F.lit(0).alias("t"), "a"),
        ("k",),
        ("o", "t"),
        {"a": F.col("a")},
    )
    assert [tuple(r) for r in first.select("k", "a").collect()] == [
        tuple(r) for r in again.select("k", "a").collect()
    ]


def test_golden_record_rejects_no_fields(spark):
    from flyq_spark.operators.cdc import golden_record

    with pytest.raises(ValueError):
        golden_record(spark.range(1), ("id",), ("id",), {})


def test_cosine_pairs_ngram_matches_model(spark):
    from collections import Counter

    from flyq_spark.operators.dedup import cosine_pairs

    docs = [
        (1, "a b c d e f"),
        (2, "a b c d e f g"),
        (3, "f e d c b a"),  # same unigrams, DIFFERENT bigrams
        (4, "x"),            # shorter than the gram: empty vector
        (5, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {tuple(r) for r in cosine_pairs(df, min_cosine=0.6, ngram=2).collect()}

    def grams(s):
        w = s.lower().split()
        return Counter(" ".join(w[i : i + 2]) for i in range(len(w) - 1))

    tf = {i: grams(s) for i, s in docs}
    norm = {i: sum(v * v for v in c.values()) for i, c in tf.items()}
    want = set()
    ids = sorted(tf)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if not norm[a] or not norm[b]:
                continue
            dot = sum(tf[a][k] * tf[b][k] for k in tf[a] if k in tf[b])
            if dot > 0 and dot * dot * 25 >= 9 * norm[a] * norm[b]:
                want.add((a, b, dot, norm[a], norm[b]))
    assert got == want
    # reversed doc shares unigrams with 1 but NO bigram: must be absent
    assert not any(g[:2] == (1, 3) for g in got)
    with pytest.raises(ValueError):
        cosine_pairs(df, ngram=0)


# ------------------------------------------------------------------ #
# profile.digest_divergent_rows
# ------------------------------------------------------------------ #


def _ddr(spark, a, b, buckets=32):
    from flyq_spark.operators.profile import digest_divergent_rows

    cols = {"k": F.col("k"), "s": F.col("s")}
    return digest_divergent_rows(a, b, cols, buckets=buckets)


def test_divergent_rows_equal_copies_empty(spark):
    base = spark.range(300).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("s")
    )
    assert _ddr(spark, base, base.repartition(7)).count() == 0


def test_divergent_rows_finds_exact_damage(spark):
    base = spark.range(300).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("s")
    )
    b = base.where("k <> 17").withColumn(
        "s", F.when(F.col("k") == 42, F.lit("corrupt")).otherwise(F.col("s"))
    )
    got = {(r["k"], r["s"]): (r["n_a"], r["n_b"]) for r in _ddr(spark, base, b).collect()}
    import hashlib

    s17 = hashlib.md5(b"17").hexdigest()
    s42 = hashlib.md5(b"42").hexdigest()
    assert got == {
        (17, s17): (1, 0),       # dropped row
        (42, s42): (1, 0),       # original of the corrupted row
        (42, "corrupt"): (0, 1),  # its replacement
    }


def test_divergent_rows_multiset_counts(spark):
    a = spark.createDataFrame([(1, "x"), (1, "x"), (2, "y")], "k long, s string")
    b = spark.createDataFrame([(1, "x"), (2, "y"), (2, "y")], "k long, s string")
    got = {(r["k"], r["s"]): (r["n_a"], r["n_b"]) for r in _ddr(spark, a, b).collect()}
    assert got == {(1, "x"): (2, 1), (2, "y"): (1, 2)}


def test_divergent_rows_null_values_match_null_safe(spark):
    a = spark.createDataFrame([(1, None), (2, "v")], "k long, s string")
    b = spark.createDataFrame([(1, None), (2, None)], "k long, s string")
    got = {(r["k"], r["s"]): (r["n_a"], r["n_b"]) for r in _ddr(spark, a, b).collect()}
    # (1, NULL) matches itself (null-safe) and does NOT appear
    assert got == {(2, "v"): (1, 0), (2, None): (0, 1)}


# ------------------------------------------------------------------ #
# pruning.file_sizes / compaction_plan
# ------------------------------------------------------------------ #


def _ffd_model(files, target):
    """Python reference: first-fit-decreasing, >=target files solo."""
    order = sorted(files, key=lambda fs: (-fs[1], fs[0]))
    bins, out = [], {}
    for f, size in order:
        placed = None
        if size < target:
            for i, tot in enumerate(bins):
                if tot + size <= target:
                    placed = i
                    break
        if placed is None:
            bins.append(0)
            placed = len(bins) - 1
        bins[placed] += size
        out[f] = placed
    return out


def test_compaction_plan_matches_ffd_model(spark):
    from flyq_spark.operators.pruning import compaction_plan

    rng = random.Random(9)
    rows = [("d1", f"f{i:03d}", rng.randrange(1, 150)) for i in range(40)] + [
        ("d2", f"g{i:03d}", rng.randrange(50, 400)) for i in range(20)
    ]
    sizes = spark.createDataFrame(rows, "dir string, file string, bytes long")
    plan = compaction_plan(sizes, target_bytes=256).collect()
    for d in ("d1", "d2"):
        model = _ffd_model([(f, s) for dd, f, s in rows if dd == d], 256)
        got = {r["file"]: r["bin_id"] for r in plan if r["dir"] == d}
        assert got == model, d
    # bin_bytes/bin_files are consistent
    for r in plan:
        same_bin = [
            x for x in plan if x["dir"] == r["dir"] and x["bin_id"] == r["bin_id"]
        ]
        assert r["bin_bytes"] == sum(x["bytes"] for x in same_bin)
        assert r["bin_files"] == len(same_bin)


def test_compaction_plan_oversize_files_stay_solo(spark):
    from flyq_spark.operators.pruning import compaction_plan

    sizes = spark.createDataFrame(
        [("", "big", 1000), ("", "a", 10), ("", "b", 10)],
        "dir string, file string, bytes long",
    )
    plan = {r["file"]: r for r in compaction_plan(sizes, 100).collect()}
    assert plan["big"]["bin_files"] == 1
    assert plan["a"]["bin_id"] == plan["b"]["bin_id"]


def test_compaction_plan_deterministic_and_dir_scoped(spark):
    from flyq_spark.operators.pruning import compaction_plan

    rows = [(f"d{i%3}", f"f{i:02d}", (i * 37) % 90 + 1) for i in range(30)]
    sizes = spark.createDataFrame(rows, "dir string, file string, bytes long")
    a = sorted(tuple(r) for r in compaction_plan(sizes, 128).collect())
    b = sorted(
        tuple(r) for r in compaction_plan(sizes.repartition(11), 128).collect()
    )
    assert a == b
    with pytest.raises(ValueError):
        compaction_plan(sizes, 0)


def test_file_sizes_match_os_stat(spark, tmp_path):
    import os

    from flyq_spark.operators.pruning import file_sizes

    out = _write_bucketed(spark, tmp_path)
    got = {(r["dir"], r["file"]): r["bytes"] for r in file_sizes(spark, out).collect()}
    assert len(got) == 10
    for (d, f), size in got.items():
        assert size == os.path.getsize(os.path.join(out, d, f))


def test_digest_maintained_incrementally_over_stream(engine, spark, tmp_path):
    """A running dataset digest is STREAM-maintainable: fold each
    micro-batch's digest into the base with the (add, xor, modular
    add) merge rule and the result equals the one-shot digest of the
    whole topic — the streaming form of the migration-equality check
    (per-batch cost is one summarize of the batch, never a rescan)."""
    from flyq_spark.operators.profile import dataset_digest
    from flyq_spark.streaming.source import read_stream
    from tests.conftest import make_messages

    engine.produce("dg", make_messages(40, key=b"k"))
    cols = lambda: {  # noqa: E731
        "offset": F.col("offset"),
        "value": F.col("value").cast("string"),
    }
    p = 1_000_000_007
    state: dict = {}

    def fold(batch_df, batch_id):
        for r in dataset_digest(batch_df, cols(), buckets=8).collect():
            m = state.setdefault(r["bucket"], [0, 0, 0])
            m[0] += r["n_rows"]
            m[1] ^= r["xor_h"]
            m[2] = (m[2] + r["sum_mod"]) % p

    stream = read_stream(spark, engine.base_dir, "dg")
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # second tranche arrives; resume from the checkpoint
    engine.produce("dg", make_messages(25, key=b"k2", ts0=1_700_000_100_000))
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    log = engine.log("dg")
    whole = {
        r["bucket"]: (r["n_rows"], r["xor_h"], r["sum_mod"])
        for r in dataset_digest(log, cols(), buckets=8).collect()
    }
    assert {b: tuple(m) for b, m in state.items()} == whole


# ------------------------------------------------------------------ #
# layout.morton_code_n / zorder_repartition_n
# ------------------------------------------------------------------ #


def test_morton_n_reproduces_2d(spark):
    from flyq_spark.operators.layout import morton_code, morton_code_n

    df = spark.range(200).select(
        (F.col("id") % 13).alias("x"), (F.col("id") % 7).alias("y")
    )
    got = df.select(
        morton_code(F.col("x"), F.col("y"), 16).alias("a"),
        morton_code_n([F.col("x"), F.col("y")], 16).alias("b"),
    )
    assert got.where("a <> b").count() == 0


def test_morton_n_matches_python_reference(spark):
    from flyq_spark.operators.layout import morton_code_n

    def ref(vals, bits):
        code = 0
        k = len(vals)
        for i in range(bits):
            for j, v in enumerate(vals):
                code |= ((v >> i) & 1) << (i * k + j)
        return code

    rows = [(i, (i * 7) % 32, (i * 13) % 32, (i * 29) % 32) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, x long, y long, z long")
    got = {
        r["id"]: r["c"]
        for r in df.select(
            "id", morton_code_n([F.col("x"), F.col("y"), F.col("z")], 5).alias("c")
        ).collect()
    }
    for i, x, y, z in rows:
        assert got[i] == ref([x, y, z], 5)


def test_morton_n_validation(spark):
    from flyq_spark.operators.layout import morton_code_n

    with pytest.raises(ValueError):
        morton_code_n([F.col("x")])
    with pytest.raises(ValueError):
        morton_code_n([F.col("x"), F.col("y"), F.col("z")], bits=22)  # 66 bits


def test_zorder_n_prunes_on_all_three_dims(spark, tmp_path):
    from flyq_spark.operators import pruning
    from flyq_spark.operators.layout import zorder_repartition_n

    n = 8192
    df = spark.range(n).select(
        (F.col("id") % 64).alias("x"),
        (F.expr("id div 64") % 64).alias("y"),
        (((F.col("id") * 2654435761) % 4294967296) % 64).alias("z"),
    )
    zdir = str(tmp_path / "z3")
    zorder_repartition_n(df, ["x", "y", "z"], n_files=16, bits=6).write.parquet(zdir)
    xdir = str(tmp_path / "xsort")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(xdir)

    def pruned(path, col):
        st = pruning.file_stats(spark, path, [col])
        rep = pruning.skipping_report(st, col, 0, 15)  # lowest quarter
        rows = rep.collect()
        return sum(r["skipped"] for r in rows), len(rows)

    for c in ("x", "y", "z"):
        skipped, total = pruned(zdir, c)
        assert skipped > 0, f"z-ordered layout should prune on {c}"
    # the single-column sort prunes on x but NOT on y
    sx, _ = pruned(xdir, "x")
    sy, _ = pruned(xdir, "y")
    assert sx > 0 and sy == 0


# ------------------------------------------------------------------ #
# profile.weighted_quantiles
# ------------------------------------------------------------------ #


def _wq_model(rows, probs):
    """Python reference: weighted inverted CDF per key."""
    from collections import defaultdict

    agg = defaultdict(lambda: defaultdict(int))
    for k, v, w in rows:
        if w > 0:
            agg[k][v] += w
    out = {}
    for k, vw in agg.items():
        tot = sum(vw.values())
        res = {}
        for p in probs:
            target = -(-p * tot // 1000)  # ceil
            cum = 0
            for v in sorted(vw):
                cum += vw[v]
                if cum >= target:
                    res[p] = v
                    break
        out[k] = (res, tot)
    return out


def test_weighted_quantiles_match_model(spark):
    from flyq_spark.operators.profile import weighted_quantiles

    rng = random.Random(13)
    rows = [
        (f"k{i%4}", rng.randrange(-50, 50), rng.randrange(0, 9))
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "k string, v long, w long")
    probs = [250, 500, 900, 1000]
    got = {
        r["k"]: r
        for r in weighted_quantiles(df, ("k",), "v", "w", probs).collect()
    }
    model = _wq_model(rows, probs)
    for k, (res, tot) in model.items():
        r = got[k]
        assert r["total_weight"] == tot
        for p in probs:
            assert r[f"p{p}"] == res[p], (k, p)


def test_weighted_quantiles_unit_weights_are_plain_percentiles(spark):
    from flyq_spark.operators.profile import weighted_quantiles

    vals = list(range(1, 101))  # 1..100, uniform weight
    df = spark.createDataFrame([("a", v, 1) for v in vals], "k string, v long, w long")
    r = weighted_quantiles(df, ("k",), "v", "w", [500, 990]).collect()[0]
    assert r["p500"] == 50 and r["p990"] == 99


def test_weighted_quantiles_weight_shifts_the_median(spark):
    from flyq_spark.operators.profile import weighted_quantiles

    # values 1..10 but value 10 carries 90% of the weight
    rows = [("a", v, 1) for v in range(1, 10)] + [("a", 10, 81)]
    df = spark.createDataFrame(rows, "k string, v long, w long")
    r = weighted_quantiles(df, ("k",), "v", "w", [500]).collect()[0]
    assert r["p500"] == 10


def test_weighted_quantiles_validation(spark):
    from flyq_spark.operators.profile import weighted_quantiles

    df = spark.createDataFrame([("a", 1, 1)], "k string, v long, w long")
    with pytest.raises(ValueError):
        weighted_quantiles(df, ("k",), "v", "w", [])
    with pytest.raises(ValueError):
        weighted_quantiles(df, ("k",), "v", "w", [0])


def test_cli_files_and_compact_plan(engine, spark, tmp_path):
    """`flyq files` prints footer envelopes (+skip verdicts) and
    `flyq compact-plan` prints the FFD merge plan, both metadata-only."""
    from flyq_spark.cli import build_parser, run

    out = _write_bucketed(spark, tmp_path)
    ap = build_parser()
    base = ["--base-dir", engine.base_dir]
    rep = run(
        ap.parse_args(
            base + ["files", out, "--column", "k", "--lo", "250", "--hi", "449"]
        ),
        engine,
    )
    assert len(rep["files"]) == 10
    assert sum(1 for r in rep["files"] if r["skipped"]) == 7
    assert all("k_min" in r and "n_rows" in r for r in rep["files"])

    # packing is per DIRECTORY: the hive layout above has one file per
    # dir (10 singleton bins); a flat dir of small files actually merges
    flat = str(tmp_path / "flat")
    spark.range(1000).repartition(10).write.parquet(flat)
    plan = run(
        ap.parse_args(base + ["compact-plan", flat, "--target-bytes", "1000000"]),
        engine,
    )
    assert plan["n_files"] == 10
    assert plan["n_bins"] < plan["n_files"]


def test_weighted_quantiles_negative_weight_raises(spark):
    from flyq_spark.operators.profile import weighted_quantiles

    df = spark.createDataFrame([("a", 1, 1), ("a", 2, -3)], "k string, v long, w long")
    with pytest.raises(Exception, match="negative weight"):
        weighted_quantiles(df, ("k",), "v", "w", [500]).collect()


def test_corr_components_underscore_names_do_not_collide(spark):
    from flyq_spark.operators.profile import corr_components

    df = spark.createDataFrame(
        [(1, 2, 3, 4)], "x long, y_z long, x_y long, z long"
    )
    out = corr_components(
        df,
        {
            "x": F.col("x"),
            "y_z": F.col("y_z"),
            "x_y": F.col("x_y"),
            "z": F.col("z"),
        },
    ).collect()
    assert len(out) == 6  # 4 choose 2 — would crash/misbind on collision


# ------------------------------------------------------------------ #
# joinaudit.join_size_estimate
# ------------------------------------------------------------------ #


def test_join_size_estimate_den1_is_exact(spark):
    from flyq_spark.operators.joinaudit import join_size_estimate

    rng = random.Random(21)
    left = spark.createDataFrame(
        [(rng.randrange(0, 40),) for _ in range(500)], "k long"
    )
    right = spark.createDataFrame(
        [(rng.randrange(0, 40),) for _ in range(300)], "k long"
    )
    est = join_size_estimate(left, right, "k", sample_den=1).collect()[0]
    exact = left.join(right, on="k").count()
    assert est["est_pairs"] == est["sampled_pairs"] == exact


def test_join_size_estimate_sampled_is_scaled_subjoin(spark):
    from flyq_spark.operators.joinaudit import join_size_estimate

    left = spark.createDataFrame([(i % 200,) for i in range(2000)], "k long")
    right = spark.createDataFrame([(i % 200,) for i in range(1000)], "k long")
    est = join_size_estimate(left, right, "k", sample_den=8).collect()[0]
    # uniform 200 keys at 1/8 inclusion: the estimate must be in the
    # right ballpark of the exact 2000*1000/200*... = 10 * 1000 pairs
    exact = left.join(right, on="k").count()
    assert est["sample_den"] == 8
    assert 0 < est["n_sampled_keys"] < 200
    assert est["est_pairs"] == 8 * est["sampled_pairs"]
    assert exact / 4 <= est["est_pairs"] <= exact * 4
    with pytest.raises(ValueError):
        join_size_estimate(left, right, "k", sample_den=0)


def test_join_size_estimate_empty_sample_is_zero(spark):
    from flyq_spark.operators.joinaudit import join_size_estimate

    left = spark.createDataFrame([(1,)], "k long")
    right = spark.createDataFrame([(2,)], "k long")
    est = join_size_estimate(left, right, "k", sample_den=1).collect()[0]
    assert est["sampled_pairs"] == 0 and est["est_pairs"] == 0


# ------------------------------------------------------------------ #
# impute.rank_normalize
# ------------------------------------------------------------------ #


def test_rank_normalize_model(spark):
    from flyq_spark.operators.impute import rank_normalize

    rows = [("a", 10), ("a", 20), ("a", 20), ("a", 40), ("b", 5), ("c", None)]
    df = spark.createDataFrame(rows, "g string, v int")
    got = {
        (r["g"], r["v"], i): r["rank_ppm"]
        for i, r in enumerate(
            rank_normalize(df, ("g",), "v").orderBy("g", "v").collect()
        )
    }
    vals = sorted(v for (g, v, _), _ in got.items() if g == "a")
    out = rank_normalize(df, ("g",), "v").collect()
    by = {}
    for r in out:
        by.setdefault(r["g"], []).append((r["v"], r["rank_ppm"]))
    a = dict((v, p) for v, p in by["a"])
    # n=4: ranks 1,2,2,4 -> ppm 0, 333333, 333333, 1000000
    assert a[10] == 0 and a[20] == 333333 and a[40] == 1000000
    assert by["b"] == [(5, 0)]  # single-row group pins to 0
    assert by["c"] == [(None, None)]  # NULL passes through


def test_rank_normalize_nulls_do_not_shift_ranks(spark):
    from flyq_spark.operators.impute import rank_normalize

    df = spark.createDataFrame(
        [("a", None), ("a", 1), ("a", 2)], "g string, v int"
    )
    out = {r["v"]: r["rank_ppm"] for r in rank_normalize(df, ("g",), "v").collect()}
    assert out[1] == 0 and out[2] == 1_000_000 and out[None] is None


# ------------------------------------------------------------------ #
# sessions.debounce_events
# ------------------------------------------------------------------ #


def test_debounce_collapses_bursts(spark):
    import datetime

    from flyq_spark.operators.sessions import debounce_events

    t0 = datetime.datetime(2024, 1, 1)

    def at(s):
        return t0 + datetime.timedelta(seconds=s)

    rows = [
        (1, at(0), 1),    # kept (first)
        (1, at(2), 2),    # dropped (<5s after previous)
        (1, at(4), 3),    # dropped (<5s after #2 — window form measures
                          # to the previous EVENT, kept or not)
        (1, at(9), 4),    # kept (5s after #3)
        (1, at(9), 5),    # dropped (same ts, tie order)
        (2, at(0), 6),    # kept (other key)
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, id long")
    kept = sorted(
        r["id"] for r in debounce_events(df, ("u",), "ts", "id", 5).collect()
    )
    assert kept == [1, 4, 6]
    with pytest.raises(ValueError):
        debounce_events(df, ("u",), "ts", "id", 0)


def test_debounce_boundary_gap_is_kept(spark):
    import datetime

    from flyq_spark.operators.sessions import debounce_events

    t0 = datetime.datetime(2024, 1, 1)
    rows = [(1, t0, 1), (1, t0 + datetime.timedelta(seconds=5), 2)]
    df = spark.createDataFrame(rows, "u long, ts timestamp, id long")
    assert debounce_events(df, ("u",), "ts", "id", 5).count() == 2


# ------------------------------------------------------------------ #
# streaming golden-record view
# ------------------------------------------------------------------ #


def test_golden_record_sink_view(spark, tmp_path):
    """Streaming field-level survivorship: per-batch state deltas fold
    to the same answer as batch golden_record over the whole history;
    replays overwrite (no double-count); compaction into a marker-
    gated base changes nothing."""
    from flyq_spark.operators.cdc import golden_record
    from flyq_spark.streaming.sink import (
        golden_record_sink,
        read_golden_record_view,
    )

    fields = {"a": F.col("a"), "b": F.col("b")}
    view = str(tmp_path / "gr_view")
    sink = golden_record_sink(view, ("k",), ("o", "t"), fields, compact_every=2)

    b0 = spark.createDataFrame(
        [(1, 10, 1, "a0", None), (2, 10, 2, None, 20)],
        "k long, o long, t long, a string, b long",
    )
    b1 = spark.createDataFrame(
        [(1, 20, 3, None, 99), (3, 5, 4, "x", None)],
        "k long, o long, t long, a string, b long",
    )
    b2 = spark.createDataFrame(
        [(1, 30, 5, "a2", None), (2, 5, 6, "late", 7)],  # late row for 2
        "k long, o long, t long, a string, b long",
    )

    def snapshot():
        return {
            r["k"]: (r["n_rows"], r["a"], r["b"])
            for r in read_golden_record_view(
                spark, view, ("k",), ["a", "b"]
            ).collect()
        }

    def expected(frames):
        whole = frames[0]
        for f in frames[1:]:
            whole = whole.unionByName(f)
        return {
            r["k"]: (r["n_rows"], r["a"], r["b"])
            for r in golden_record(whole, ("k",), ("o", "t"), fields).collect()
        }

    sink(b0, 0)
    sink(b1, 1)  # triggers compaction (compact_every=2)
    import os

    assert any(d.startswith("base_upto_") for d in os.listdir(view))
    assert snapshot() == expected([b0, b1])

    sink(b1, 1)  # at-least-once replay of an already-compacted batch
    assert snapshot() == expected([b0, b1])

    sink(b2, 2)
    got = snapshot()
    assert got == expected([b0, b1, b2])
    # field-level semantics across batches: key 1's newest 'b' came
    # from batch 1 even though batch 2 delivered a newer row (b NULL)
    assert got[1] == (3, "a2", 99)
    # the late row for key 2 (older order) must NOT clobber
    assert got[2][1] == "late" and got[2][2] == 20


# ------------------------------------------------------------------ #
# graph.label_propagation / timeseries.ohlc_bars
# ------------------------------------------------------------------ #


def _lpa_model(edges, n_iter):
    """Synchronous LPA: most frequent neighbor label, ties smallest."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    lab = {n: n for n in adj}
    for _ in range(n_iter):
        nxt = {}
        for n in adj:
            c = Counter(lab[m] for m in adj[n])
            best = min(((-cnt, l) for l, cnt in c.items()))
            nxt[n] = best[1]
        lab = nxt
    return lab


def test_label_propagation_matches_model_and_splits_cliques(spark):
    from flyq_spark.operators.graph import label_propagation

    # two 4-cliques + one bridge: components would merge them; LPA
    # must keep two communities
    cl = lambda ns: [(a, b) for a in ns for b in ns if a < b]  # noqa: E731
    edges = cl([1, 2, 3, 4]) + cl([10, 11, 12, 13]) + [(4, 10)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, n_iter=10).collect()
    }
    assert got == _lpa_model(edges, 10)
    comm_a = {got[n] for n in (1, 2, 3)}
    comm_b = {got[n] for n in (11, 12, 13)}
    assert len(comm_a) == 1 and len(comm_b) == 1 and comm_a != comm_b


def test_label_propagation_random_graph_matches_model(spark):
    from flyq_spark.operators.graph import label_propagation

    rng = random.Random(31)
    edges = list({(rng.randrange(0, 30), rng.randrange(0, 30)) for _ in range(80)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    for it in (1, 3, 7):
        got = {
            r["node"]: r["community"]
            for r in label_propagation(df, n_iter=it).collect()
        }
        assert got == _lpa_model(edges, it), it
    got_repart = {
        r["node"]: r["community"]
        for r in label_propagation(df.repartition(7), n_iter=3).collect()
    }
    assert got_repart == _lpa_model(edges, 3)
    with pytest.raises(ValueError):
        label_propagation(df, n_iter=0)


def test_ohlc_bars_model(spark):
    import datetime

    from flyq_spark.operators.timeseries import ohlc_bars

    t0 = datetime.datetime(2024, 1, 1)

    def at(s):
        return t0 + datetime.timedelta(seconds=s)

    rows = [
        ("k", at(0), 1, 100),
        ("k", at(30), 2, 50),   # low of bucket 0
        ("k", at(59), 3, 120),  # close of bucket 0, also high
        ("k", at(60), 4, 10),   # bucket 1 alone
        ("k", at(0), 5, 999),   # same ts as id 1 — tie: open stays id 1
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, v long")
    got = {
        r["bucket_start_us"]: r
        for r in ohlc_bars(df, ("k",), "ts", "id", "v", 60).collect()
    }
    b0 = got[int(t0.timestamp()) * 1_000_000]
    assert (b0["open"], b0["high"], b0["low"], b0["close"], b0["n_obs"]) == (
        100,
        999,
        50,
        120,
        4,
    )
    b1 = got[(int(t0.timestamp()) + 60) * 1_000_000]
    assert (b1["open"], b1["high"], b1["low"], b1["close"], b1["n_obs"]) == (
        10,
        10,
        10,
        10,
        1,
    )
    with pytest.raises(ValueError):
        ohlc_bars(df, ("k",), "ts", "id", "v", 0)


# ------------------------------------------------------------------ #
# similarity.topk_ivfpq
# ------------------------------------------------------------------ #


@pytest.fixture(scope="module")
def emb7(spark):
    from flyq_spark.io import read_table

    return read_table(spark, SF_SMALL, "embeddings").select(
        "vec_id", "embedding"
    )


def test_ivfpq_full_probe_equals_plain_pq(spark, emb7):
    """Probing EVERY cell degenerates IVF-PQ to exactly topk_pq — the
    composition adds cell restriction and nothing else."""
    from flyq_spark.operators.similarity import (
        pq_encode,
        topk_ivfpq,
        topk_pq,
        train_pq,
    )

    books, _ = train_pq(emb7, n_subspaces=4, n_codes=16)
    queries = emb7.where(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n_pivots = 8
    full = topk_ivfpq(
        emb7, queries, books, k=5, n_pivots=n_pivots, nprobe=n_pivots
    )
    plain = topk_pq(pq_encode(emb7, books), queries, books, k=5)
    a = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in full.collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in plain.collect()
    )
    assert a == b


def test_ivfpq_candidates_stay_in_probed_cells(spark, emb7):
    from flyq_spark.operators.similarity import (
        _deterministic_pivots,
        assign_cells,
        topk_ivfpq,
        train_pq,
    )

    books, _ = train_pq(emb7, n_subspaces=4, n_codes=16)
    queries = emb7.where(F.col("vec_id") % 60 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = topk_ivfpq(emb7, queries, books, k=5, n_pivots=16, nprobe=2)
    cents = _deterministic_pivots(
        emb7.select("vec_id", "embedding"), 16, "vec_id", ("vec_id", "embedding")
    )
    cell_of = {
        r["vec_id"]: r["cell"]
        for r in assign_cells(emb7, cents, "vec_id", "embedding", nprobe=1).collect()
    }
    probes = {}
    for r in assign_cells(
        queries, cents, id_col="query_id", vec_col="embedding", nprobe=2
    ).collect():
        probes.setdefault(r["query_id"], set()).add(r["cell"])
    rows = out.collect()
    assert rows
    for r in rows:
        assert cell_of[r["neighbor_id"]] in probes[r["query_id"]], r


def test_ivfpq_recall_above_chance_and_deterministic(spark, emb7):
    from flyq_spark.operators.similarity import (
        topk_bruteforce,
        topk_ivfpq,
        train_pq,
    )

    books, _ = train_pq(emb7, n_subspaces=4, n_codes=16)
    queries = emb7.where(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = topk_ivfpq(emb7, queries, books, k=5, n_pivots=16, nprobe=4)
    exact = topk_bruteforce(emb7, queries, k=5)
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    recall = len(a & e) / len(e)
    chance = 5 / emb7.count()
    assert recall > 10 * chance, (recall, chance)
    again = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in topk_ivfpq(
            emb7, queries, books, k=5, n_pivots=16, nprobe=4
        ).collect()
    }
    first = {
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in approx.collect()
    }
    assert first == again


# ------------------------------------------------------------------ #
# pruning.bloom_file_index / bloom_index_lookup
# ------------------------------------------------------------------ #


def test_bloom_index_no_false_negatives_and_prunes(spark):
    from flyq_spark.operators.pruning import bloom_file_index, bloom_index_lookup

    # 8 "files" of 50 disjoint keys each
    rows = [(f"f{i//50}", i) for i in range(400)]
    df = spark.createDataFrame(rows, "file string, k long")
    idx = bloom_file_index(df, "file", F.col("k"), num_bits=1024, num_hashes=3)
    idx = idx.persist()
    truth = {f: {k for ff, k in rows if ff == f} for f in {r[0] for r in rows}}
    fp = 0
    for probe in (0, 137, 399, 555):
        got = {
            r["file"]: r["may_contain"]
            for r in bloom_index_lookup(idx, probe, 1024, 3).collect()
        }
        for f, keys in truth.items():
            if probe in keys:
                assert got[f], (probe, f)  # soundness: never a false negative
            elif got[f]:
                fp += 1
    # 1024 bits / 50 keys: false positives must be rare across 32 checks
    assert fp <= 4, fp
    idx.unpersist()


def test_bloom_positions_py_matches_column_expr(spark):
    from flyq_spark.operators.pruning import (
        _bloom_positions_md5,
        bloom_positions_py,
    )

    df = spark.createDataFrame([(v,) for v in (0, 7, 123456789)], "k long")
    pos = _bloom_positions_md5(F.col("k"), 512, 4)
    got = {
        r["k"]: list(r["p"])
        for r in df.select("k", F.array(*pos).alias("p")).collect()
    }
    for v, ps in got.items():
        assert ps == bloom_positions_py(v, 512, 4), v


def test_bloom_index_validation(spark):
    from flyq_spark.operators.pruning import bloom_file_index

    df = spark.createDataFrame([("f", 1)], "file string, k long")
    with pytest.raises(ValueError):
        bloom_file_index(df, "file", F.col("k"), num_bits=10)


def test_bloom_lookup_many_erasure_planning(spark):
    """Set-probe: every truly-present (file, key) pair is returned
    (soundness), absent keys return nothing beyond rare false
    positives, and aggregating per file gives the rewrite work list."""
    from flyq_spark.operators.pruning import (
        bloom_file_index,
        bloom_index_lookup_many,
    )

    rows = [(f"f{i//50}", i) for i in range(400)]  # 8 files, disjoint keys
    df = spark.createDataFrame(rows, "file string, k long")
    idx = bloom_file_index(df, "file", F.col("k"), num_bits=2048, num_hashes=3)
    probes = [7, 63, 199, 350, 9999, 12345]
    keys = spark.createDataFrame([(p,) for p in probes], "k long")
    got = {
        (r["file"], r["key"])
        for r in bloom_index_lookup_many(idx, keys, "k", 2048, 3).collect()
    }
    truth = {(f"f{p//50}", p) for p in probes if p < 400}
    assert truth <= got  # no false negatives, ever
    assert len(got - truth) <= 2  # fp budget across 6 keys x 8 files
    # per-file rewrite list covers exactly the files holding real keys
    files_hit = {f for f, _ in got}
    assert {"f0", "f1", "f3", "f7"} <= files_hit


def test_cosine_pairs_low_rarity_guard_raises(spark):
    """The all-pairs regime guard (r10): a templated corpus with a
    tiny shared vocabulary (every unigram a de-facto stopword) makes
    the L2 prefix filter degenerate — the candidate bound Σ df(prefix
    terms) crosses max_candidates and the plan must raise_error with
    the MinHash recommendation instead of silently running an
    ~quadratic join. The same corpus under a loose cap (or cap=None)
    still computes."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from flyq_spark.operators.dedup import cosine_pairs

    # 60 docs over a 3-word vocabulary: df ≈ n for every term, prefix
    # join bound ≈ docs × df ≈ thousands on sixty docs
    docs = [
        (i, " ".join(["alpha", "beta", "gamma"][(i + j) % 3] for j in range(8)))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    with pytest.raises(
        (SparkRuntimeException, Py4JJavaError), match="minhash|MinHash"
    ):
        cosine_pairs(df, min_cosine=0.9, max_candidates=100).collect()
    # loose cap: same corpus computes (and the guard costs one scalar)
    assert cosine_pairs(df, min_cosine=0.99, max_candidates=10**9).count() >= 0
    # cap=None disables the guard entirely
    assert cosine_pairs(df, min_cosine=0.99, max_candidates=None).count() >= 0
