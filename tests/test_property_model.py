"""Property-style randomized differential test (SURVEY §5 strategy #3):
seeded random produce/commit/consume/watermark sequences executed against
both the engine and a ~40-line pure-Python model of the FlyQ log. Any
divergence in offsets, watermarks, lag, or read-back values fails."""

from __future__ import annotations

import random

import pytest


class LogModel:
    """The reference semantics, in-memory: dense offsets per partition,
    hw = last offset, lag = max(0, hw - committed) (log_engine.rs:209)."""

    def __init__(self, partitions: int):
        self.partitions = partitions
        self.logs: dict[int, list[bytes]] = {p: [] for p in range(partitions)}
        self.committed: dict[tuple[str, int], int] = {}
        self.rr = 0

    def produce_keyless(self, values: list[bytes]) -> list[tuple[int, int]]:
        acks = []
        for i, v in enumerate(values):
            p = (self.rr + i) % self.partitions
            self.logs[p].append(v)
            acks.append((p, len(self.logs[p]) - 1))
        self.rr = (self.rr + len(values)) % self.partitions
        return acks

    def watermark(self, p: int) -> tuple[int, int, int]:
        n = len(self.logs[p])
        return (0, n - 1 if n else 0, n)

    def commit(self, group: str, p: int, offset: int) -> None:
        self.committed[(group, p)] = offset

    def lag(self, group: str) -> int:
        total = 0
        for p in range(self.partitions):
            _, hw, _ = self.watermark(p)
            total += max(0, hw - self.committed.get((group, p), 0))
        return total

    def read(self, p: int, offset: int) -> list[bytes]:
        return self.logs[p][offset:]


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_random_op_sequences_match_model(engine, seed):
    rng = random.Random(seed)
    n_parts = rng.choice([1, 2, 3])
    engine.create_topic("prop", partitions=n_parts)
    model = LogModel(n_parts)
    groups = ["g-a", "g-b"]
    counter = 0

    for step in range(12):
        op = rng.choice(["produce", "produce", "commit", "check_wm", "check_read"])
        if op == "produce":
            k = rng.randint(1, 6)
            values = [f"v-{seed}-{counter + i}".encode() for i in range(k)]
            counter += k
            acks = engine.produce(
                "prop",
                [
                    {"key": None, "value": v, "timestamp": 1_700_000_000_000 + counter + i}
                    for i, v in enumerate(values)
                ],
            )
            assert acks == model.produce_keyless(values), f"step {step}"
        elif op == "commit":
            g = rng.choice(groups)
            p = rng.randrange(n_parts)
            _, _, leo = model.watermark(p)
            off = rng.randint(0, max(leo, 1))
            engine.commit_offset(g, "prop", p, off)
            model.commit(g, p, off)
            assert engine.get_consumer_lag(g, "prop")["total_lag"] == model.lag(g)
        elif op == "check_wm":
            for p in range(n_parts):
                assert engine.get_watermark("prop", p) == model.watermark(p), f"step {step}"
        else:
            p = rng.randrange(n_parts)
            _, _, leo = model.watermark(p)
            off = rng.randint(0, max(leo, 1))
            got = [bytes(r["value"]) for r in engine.read_from_offset("prop", p, off)]
            assert got == model.read(p, off), f"step {step} p={p} off={off}"

    # final full consistency sweep
    for p in range(n_parts):
        assert engine.get_watermark("prop", p) == model.watermark(p)
        got = [bytes(r["value"]) for r in engine.read_from_offset("prop", p, 0)]
        assert got == model.read(p, 0)
    for g in groups:
        assert engine.get_consumer_lag(g, "prop")["total_lag"] == model.lag(g)


def test_salted_agg_equals_direct(spark):
    from pyspark.sql import functions as F

    from flyq_spark.io import read_table
    from flyq_spark.operators.skew import salted_agg

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    direct = {
        (r["event_type"],): (r["cnt"], r["total"], r["mx"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("user_id").alias("total"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["event_type"],): (r["cnt"], r["total"], r["mx"])
        for r in salted_agg(
            ev,
            ["event_type"],
            {"cnt": ("count", "*"), "total": ("sum", "user_id"), "mx": ("max", "value")},
            salt_from="event_id",
            n_salts=8,
        ).collect()
    }
    assert direct == salted


@pytest.mark.parametrize("seed", [3, 99, 2024])
def test_duplicate_spans_random_corpora_match_model(spark, seed):
    """Seeded random small-vocab corpora: duplicate_spans must equal the
    pure-Python model (global counting, islands merge) on every one."""
    from flyq_spark.operators.dedup import duplicate_spans

    rng = random.Random(seed)
    k = rng.choice([2, 3, 4])
    vocab = [f"w{i}" for i in range(rng.choice([5, 8, 15]))]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
        for i in range(40)
    ]

    from collections import Counter

    counts: Counter = Counter()
    for _, text in docs:
        w = text.split(" ")
        for i in range(len(w) - k + 1):
            counts[" ".join(w[i : i + k])] += 1
    expected = set()
    for doc_id, text in docs:
        w = text.split(" ")
        ps = [
            i + 1
            for i in range(len(w) - k + 1)
            if counts[" ".join(w[i : i + k])] > 1
        ]
        spans: list = []
        for p in ps:
            if spans and p <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + k - 1))
            else:
                spans.append((p, p + k - 1))
        expected |= {(doc_id, s, e, e - s + 1) for s, e in spans}

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicate_spans(df, k=k).collect()
    }
    assert got == expected


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_apply_changes_random_batches_match_dict_model(spark, seed):
    """Randomized CDC sequences: applying R random change batches via
    apply_changes (folding each batch into the running snapshot) must
    equal a trivial Python dict model that replays ALL changes in
    (ts, batch-order) — including deletes, re-inserts after delete,
    stale updates, and same-ts redelivery."""
    from flyq_spark.operators.cdc import apply_changes

    rng = random.Random(seed)
    keys = list(range(8))
    model: dict[int, tuple[str, int]] = {}
    snapshot = spark.createDataFrame([], "k long, v string, ts long")
    ts = 0
    for _ in range(4):  # batches
        batch = []
        for _ in range(rng.randint(1, 10)):
            k = rng.choice(keys)
            ts += rng.randint(0, 2)  # allow ts ties within a batch
            op = "d" if rng.random() < 0.25 else "u"
            batch.append((k, f"v{ts}_{k}", ts, op))
        chg = spark.createDataFrame(batch, "k long, v string, ts long, op string")
        snapshot = apply_changes(snapshot, chg, ("k",), "ts")
        # model: replay this batch — later ts wins; on a ts tie the
        # change beats the snapshot, and within the batch the winner is
        # the LAST row in batch order among max-ts rows for the key
        per_key: dict[int, tuple[str, int, str]] = {}
        for k, v, t, op in batch:
            cur = per_key.get(k)
            if cur is None or t >= cur[1]:
                per_key[k] = (v, t, op)
        for k, (v, t, op) in per_key.items():
            cur = model.get(k)
            if cur is None or t >= cur[1]:
                if op == "d":
                    model.pop(k, None)
                else:
                    model[k] = (v, t)
        got = {r["k"]: (r["v"], r["ts"]) for r in snapshot.collect()}
        assert got == model, f"diverged at ts={ts}"


def test_chunk_documents_random_invariants(spark):
    """Randomized chunking invariants: chunk c is exactly
    words[c*stride : c*stride + chunk]; chunk count matches the closed
    form; concatenating chunks with the overlap removed reproduces the
    document; short docs yield themselves."""
    from flyq_spark.operators.corpus import chunk_documents

    rng = random.Random(2024)
    cases = []
    for i in range(30):
        n = rng.randint(1, 200)
        cases.append((i, " ".join(f"w{j}" for j in range(n)), n))
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in cases], "doc_id long, text string"
    )
    for chunk, overlap in ((16, 4), (7, 0), (50, 25)):
        stride = chunk - overlap
        rows = chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"]
        for i, text, n in cases:
            words = text.split()
            want_chunks = 1 + max(0, -(-(n - chunk) // stride)) if n > chunk else 1
            got = by_doc[i]
            assert len(got) == want_chunks, (chunk, overlap, n)
            assert sorted(got) == list(range(want_chunks))
            rebuilt = got[0].split()
            for c in range(want_chunks):
                assert got[c].split() == words[c * stride : c * stride + chunk]
                if c > 0:
                    rebuilt += got[c].split()[overlap:]
            assert rebuilt == words, (chunk, overlap, n)


def test_interval_overlap_random_equals_naive(spark):
    """Randomized bucket-replicated interval overlap == the naive n²
    inequality join, across widths smaller/larger than typical
    interval lengths."""
    import itertools

    from flyq_spark.operators.rangejoin import interval_overlap_pairs

    rng = random.Random(99)
    rows = []
    for i in range(120):
        s = rng.randint(0, 500)
        e = s + rng.randint(0, 80)
        rows.append((i, s, e))
    want = {}
    for (i1, s1, e1), (i2, s2, e2) in itertools.combinations(rows, 2):
        ov = min(e1, e2) - max(s1, s2)
        if ov >= 0:
            want[(i1, i2)] = ov
    df = spark.createDataFrame(rows, "iid long, s long, e long")
    for width in (5, 40, 300):
        got = {
            (r["id_a"], r["id_b"]): r["overlap"]
            for r in interval_overlap_pairs(
                df, "iid", "s", "e", bucket_width=width
            ).collect()
        }
        assert got == want, width


def test_winnowing_random_matches_python_reference(spark):
    """Randomized winnowing: the fingerprint set equals the direct
    Python robust-winnowing reference on random small-vocab texts
    (small vocabulary forces repeated grams and min ties)."""
    import hashlib

    from flyq_spark.operators.corpus import winnowing_fingerprints

    rng = random.Random(5)
    k, w = 3, 5
    texts = {
        i: " ".join(rng.choice("abcdef") for _ in range(rng.randint(1, 60)))
        for i in range(25)
    }

    def ref(text):
        words = text.split(" ")
        hs = [
            int(
                hashlib.md5(" ".join(words[i : i + k]).encode()).hexdigest()[:9],
                16,
            )
            for i in range(len(words) - k + 1)
        ]
        out = set()
        for t in range(w - 1, len(hs)):
            win = hs[t - w + 1 : t + 1]
            m = min(win)
            off = max(j for j, h in enumerate(win) if h == m)
            out.add((t - w + 1 + off + 1, m))
        return out

    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {}
    for r in winnowing_fingerprints(df, k=k, window=w).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["gram_hash"]))
    for i, t in texts.items():
        assert got.get(i, set()) == ref(t), i


def test_diff_snapshots_roundtrip_random(spark):
    """apply_changes(old, diff_snapshots(old, new)) == new on randomized
    snapshot pairs with adds / deletes / value changes / ts bumps and
    NULLs in value columns; unchanged keys emit no change row."""
    from flyq_spark.operators.cdc import apply_changes, diff_snapshots

    rng = random.Random(31)
    schema = "k long, v string, x long, ts long"
    for trial in range(5):
        old_rows, new_rows = [], []
        for k in range(40):
            v = rng.choice(["a", "b", None])
            x = rng.randint(0, 5)
            ts = rng.randint(0, 100)
            present_old = rng.random() < 0.8
            if present_old:
                old_rows.append((k, v, x, ts))
            if rng.random() < 0.8:  # present in new
                if present_old and rng.random() < 0.5:
                    new_rows.append((k, v, x, ts))  # unchanged
                else:
                    new_rows.append(
                        (k, rng.choice(["a", "c", None]), rng.randint(0, 5),
                         ts + rng.randint(0, 10))
                    )
        old = spark.createDataFrame(old_rows, schema)
        new = spark.createDataFrame(new_rows, schema)
        diff = diff_snapshots(old, new, ("k",), "ts")
        merged = apply_changes(old, diff, ("k",), "ts")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, new.collect())
        ), trial
        # no change rows for untouched keys
        changed_keys = {r["k"] for r in diff.collect()}
        old_map = {r[0]: r for r in old_rows}
        new_map = {r[0]: r for r in new_rows}
        for k in set(old_map) & set(new_map):
            if old_map[k] == new_map[k]:
                assert k not in changed_keys


def test_corpus_shuffle_seed_epochs(spark):
    """Seeded shuffles are reproducible, permutations of 1..n, differ
    between epochs, and seed=None preserves the historical order."""
    from flyq_spark.operators.corpus import corpus_shuffle

    df = spark.createDataFrame(
        [(i, f"d{i}") for i in range(300)], "doc_id long, text string"
    )
    base = {r["doc_id"]: r["shuffle_rank"] for r in corpus_shuffle(df).collect()}
    e1 = {
        r["doc_id"]: r["shuffle_rank"]
        for r in corpus_shuffle(df, seed=1).collect()
    }
    e1b = {
        r["doc_id"]: r["shuffle_rank"]
        for r in corpus_shuffle(df, seed=1).collect()
    }
    e2 = {
        r["doc_id"]: r["shuffle_rank"]
        for r in corpus_shuffle(df, seed=2).collect()
    }
    for m in (base, e1, e2):
        assert sorted(m.values()) == list(range(1, 301))
    assert e1 == e1b
    assert e1 != e2 and e1 != base


def test_diff_snapshots_null_keys(spark):
    """NULL keys are legal (the join is null-safe): an unchanged
    NULL-key row emits nothing, a changed one emits 'u', a vanished one
    emits 'd' — presence must come from markers, not key nullness."""
    from flyq_spark.operators.cdc import apply_changes, diff_snapshots

    schema = "k long, v string, ts long"
    # unchanged NULL-key row
    old = spark.createDataFrame([(None, "a", 1), (1, "x", 1)], schema)
    new = spark.createDataFrame([(None, "a", 1), (1, "y", 2)], schema)
    diff = diff_snapshots(old, new, ("k",), "ts").collect()
    assert len(diff) == 1 and diff[0]["k"] == 1 and diff[0]["op"] == "u"
    # vanished NULL-key row
    old2 = spark.createDataFrame([(None, "a", 1)], schema)
    new2 = spark.createDataFrame([], schema)
    d2 = diff_snapshots(old2, new2, ("k",), "ts").collect()
    assert len(d2) == 1 and d2[0]["k"] is None and d2[0]["op"] == "d"
    # roundtrip with NULL keys present
    merged = apply_changes(
        old, diff_snapshots(old, new, ("k",), "ts"), ("k",), "ts"
    )
    assert sorted(map(tuple, merged.collect()), key=str) == sorted(
        map(tuple, new.collect()), key=str
    )


def test_chunk_documents_rejects_negative_overlap(spark):
    import pytest as _pt

    from flyq_spark.operators.corpus import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pt.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=-1)


def test_importance_resample_random_weights_match_model(spark):
    """Randomized differential: seeded random (weights, k, seed)
    configurations vs an exact-arithmetic Python replay, including the
    DECIMAL regime (weights ~1e15, so P*k overflows int64 and only the
    decimal(38,0) products keep the floor divisions exact)."""
    import hashlib

    from flyq_spark.operators.corpus import importance_resample

    rng = random.Random(0xD51A)
    for trial, (wmax, k) in enumerate(
        [(13, 29), (1000, 257), (10**15, 1_000_003)]
    ):
        rows = [(i, rng.randrange(0, wmax)) for i in range(1, 120)]
        if sum(w for _, w in rows) == 0:
            rows[0] = (1, 1)
        seed = f"prop{trial}"
        df = spark.createDataFrame(rows, "doc_id long, w long")
        got = {
            r["doc_id"]: r["n_copies"]
            for r in importance_resample(df, "w", k, seed=seed).collect()
        }
        ring = sorted(
            rows,
            key=lambda r: (
                hashlib.md5(f"{seed}:{r[0]}".encode()).hexdigest(),
                r[0],
            ),
        )
        mass = sum(w for _, w in rows)
        off = (
            int(
                hashlib.md5(
                    f"resample-offset:{seed}".encode()
                ).hexdigest()[:15],
                16,
            )
            % mass
        )
        p = 0
        exp = {}
        for i, w in ring:
            lo, hi = p, p + w
            p = hi
            n = (hi * k - off - 1 + mass) // mass - (
                lo * k - off - 1 + mass
            ) // mass
            if n >= 1:
                exp[i] = n
        assert sum(exp.values()) == k
        assert got == exp, (trial, wmax, k)


def test_stupid_backoff_random_corpora_match_model(spark):
    """Randomized differential: seeded random train/score corpora over
    a small vocabulary (dense bigram collisions, guaranteed OOV via a
    score-only token) vs an exact Python replay of the regime counts
    AND the float mean-logscore."""
    import math
    from collections import Counter

    from flyq_spark.operators.text import stupid_backoff_score

    rng = random.Random(0xBAC0FF)
    vocab = ["a", "b", "c", "dd", "ee"]
    for trial in range(3):
        train_rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
            for i in range(1, 8)
        ]
        score_rows = [
            (
                100 + i,
                " ".join(
                    rng.choice(vocab + ["zz"])  # zz never in train
                    for _ in range(rng.randint(0, 10))
                ),
            )
            for i in range(1, 10)
        ]
        train = spark.createDataFrame(train_rows, "doc_id long, text string")
        df = spark.createDataFrame(score_rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r.asDict()
            for r in stupid_backoff_score(df, train, 400).collect()
        }
        uni: Counter = Counter()
        bi: Counter = Counter()
        for _, t in train_rows:
            ws = t.split()
            uni.update(ws)
            bi.update(zip(ws, ws[1:]))
        total = sum(uni.values())
        exp = {}
        for i, t in score_rows:
            ws = t.split()
            ps = list(zip(ws, ws[1:]))
            if not ps:
                continue
            s = 0.0
            nh = nb = no = 0
            for p in ps:
                if p in bi:
                    nh += 1
                    s += math.log(bi[p] / uni[p[0]])
                elif p[1] in uni:
                    nb += 1
                    s += math.log(0.4 * uni[p[1]] / total)
                else:
                    no += 1
                    s += math.log(0.4 / total)
            exp[i] = (len(ps), nh, nb, no, s / len(ps))
        assert set(got) == set(exp), trial
        for i, (np_, nh, nb, no, m) in exp.items():
            g = got[i]
            assert (
                g["n_pairs"],
                g["n_bigram_hits"],
                g["n_unigram_backoffs"],
                g["n_oov"],
            ) == (np_, nh, nb, no), (trial, i)
            assert abs(g["mean_logscore"] - m) < 1e-9, (trial, i)
