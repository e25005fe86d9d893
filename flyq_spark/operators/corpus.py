"""Training-corpus preparation [EXT]: deterministic split / shuffle /
sequence packing.

Driver-mandated LLM-pipeline extensions (no reference counterpart).
Everything here is DETERMINISTIC-BY-HASH rather than RNG-based: a
train/test membership or a corpus order that changes between runs (or
between engines) is a reproducibility bug in a training pipeline, so
the primitives key off ``md5`` of the stable document id — the same
bytes on any engine, any partitioning, any run. All three are pure
projections / single-window plans: no RNG state, no driver loops.

- ``train_test_split``: membership by hex-prefix threshold. md5 is
  uniform, so prefix < '0d' keeps ≈ 13/256 ≈ 5.1%. Zero shuffles —
  a codegen'd projection the scan absorbs.
- ``corpus_shuffle``: a reproducible global permutation — rank in
  (md5(id), id) order, computed shard-parallel (hash-digit shards +
  broadcast offsets), never through a single-partition global window.
- ``pack_documents``: token-budget packing per hash shard: documents
  land in a shard (first md5 hex digit), are ordered by hash within
  it, and a running token sum floor-divided by the budget yields pack
  ids. One shuffle (the shard window); packs never cross shards, so
  packing parallelism is constant in corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _id_hash(id_col: str) -> Column:
    return F.md5(F.col(id_col).cast("string"))


def train_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    test_prefix_below: str = "0d",
) -> DataFrame:
    """Append a deterministic ``split`` column ('test' iff the md5 hex
    prefix of the id sorts below ``test_prefix_below``, else 'train').
    Membership is a pure function of the id: stable across runs,
    engines, partitionings, and corpus growth (a document never flips
    split when other documents are added)."""
    return df.withColumn(
        "split",
        F.when(
            F.substring(_id_hash(id_col), 1, len(test_prefix_below))
            < F.lit(test_prefix_below),
            F.lit("test"),
        ).otherwise(F.lit("train")),
    )


def corpus_shuffle(
    df: DataFrame, id_col: str = "doc_id", seed: str | int | None = None
) -> DataFrame:
    """Reproducible global permutation: ``shuffle_rank`` = position in
    (md5(id), id) order. The hash destroys any source ordering
    (time/site locality) exactly once, identically on every engine.
    ``seed`` folds into the hash (md5("seed:id")) for EPOCH RESHUFFLING
    — training wants a different, equally reproducible order each
    epoch (seed=epoch number); ``None`` keeps the historical md5(id)
    permutation.

    Scale shape: a naive global ORDER BY window funnels every row into
    ONE partition. Instead rows are ranked within their first-3-hex-
    digit shard (4096-way parallel window — each sort task holds
    N/4096 rows, so no shard becomes a straggler until the corpus
    passes ~10^12 rows), and the global rank is recovered by adding
    the tiny per-shard offset table (≤4096 rows, broadcast) — valid
    because the shard digits are a PREFIX of the sort key, so
    shard-major order IS global (md5, id) order. The shard width is
    invisible in the result (any prefix width yields the same global
    rank), so widening it further is a one-character change."""
    if seed is None:
        h = _id_hash(id_col)
    else:
        h = F.md5(
            F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
        )
    shard = F.substring(h, 1, 3)
    w = Window.partitionBy("_shard").orderBy(h, F.col(id_col))
    ranked = df.withColumn("_shard", shard).withColumn(
        "_local_rank", F.row_number().over(w).cast("long")
    )
    offsets = (
        ranked.groupBy("_shard")
        .agg(F.count("*").alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_shard").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).cast("long"),
        )
        .select("_shard", "_offset")
    )
    return (
        ranked.join(F.broadcast(offsets), on="_shard")
        .withColumn("shuffle_rank", (F.col("_local_rank") + F.col("_offset")).cast("long"))
        .drop("_shard", "_local_rank", "_offset")
    )


def pack_documents(
    df: DataFrame,
    token_budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_digits: int = 1,
    with_offsets: bool = False,
) -> DataFrame:
    """Boundary sequence packing: pack ``p`` in a shard holds the
    documents whose preceding-token running sum falls in
    [p*budget, (p+1)*budget) — the standard single-window formulation
    (documents are never split; a pack can overflow by at most the one
    straddling document; true close-on-overflow packing is a recursive
    cumsum no fixed window expresses, and at training scale the
    boundary form is what pipelines ship).

    Shard-local by construction: documents land on 16**shard_digits
    shards by their first md5 hex digit(s) and packs never cross
    shards, so the only shuffle is the shard window and parallelism is
    constant in corpus size. ``shard_digits`` sizes that parallelism:
    the default 1 (16 shards) is the HISTORICAL pack identity — pack
    membership is shard-tied, so widening CHANGES every (shard,
    pack_id) and is a caller decision, never a silent default flip.
    Measured on the composed epoch path (SCALE.md r11): 16 shards put
    ~625k drawn docs in one sort task at a 10^7-doc epoch; 3 digits
    (4096 shards, the corpus_shuffle width) keeps sort groups at
    epoch/4096. Output adds (shard, pack_id, n_tokens).

    ``with_offsets=True`` also emits ``tok_start`` — the document's
    token start offset WITHIN its pack (cum_before − pack_id·budget,
    exact integer arithmetic), the number a sequence-pack writer and
    the attention-mask / doc-boundary-reset machinery consume.
    Invariant: 0 ≤ tok_start < budget (floor definition); the one
    straddling document per pack may have tok_start + n_tokens >
    budget — boundary packing overflows rather than splits. Same
    single window (Catalyst collapses the identical frame), zero
    extra shuffle."""
    from flyq_spark.operators.text import token_count

    if not 1 <= int(shard_digits) <= 8:
        raise ValueError(f"shard_digits must be in 1..8, got {shard_digits}")
    toks = token_count(F.col(text_col))
    h = _id_hash(id_col)
    w = Window.partitionBy("shard").orderBy(h, F.col(id_col))
    cum_before = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    out = (
        df.withColumn("n_tokens", toks)
        .withColumn("shard", F.substring(h, 1, int(shard_digits)))
        .withColumn("pack_id", F.floor(cum_before / token_budget).cast("long"))
    )
    if with_offsets:
        out = out.withColumn(
            "tok_start",
            (cum_before - F.col("pack_id") * F.lit(int(token_budget)))
            .cast("long"),
        )
    return out


def _word_ngrams(words: Column, n: int) -> Column:
    """All word ``n``-grams of an array column as space-joined strings
    (empty array when the document has fewer than ``n`` words — the
    guard matters because ``F.sequence`` with stop < start would emit a
    DESCENDING index range, not an empty one).

    ``words`` is bound ONCE through a single-element-array lambda
    before anything references it: the naive form references the input
    four times (size twice, the index sequence, the slice), and
    higher-order functions are CodegenFallback — each reference
    re-evaluates the child expression per row, which turns an
    expensive ``words`` child (e.g. split-of-normalized-text) into a
    measured 4x: 16.3 s vs 4.2 s single-evaluation on the sf0.1
    normalized-decontamination path. Inside the lambda, ``w`` is a
    bound variable — every reference is free."""

    def body(w: Column) -> Column:
        idx = F.when(
            F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(idx, lambda i: F.array_join(F.slice(w, i, n), " "))

    return F.get(F.transform(F.array(words), body), 0)


def contamination_ngrams(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    test_prefix_below: str = "0d",
) -> DataFrame:
    """Train/test decontamination check: for every TEST document, how
    many of its distinct word ``n``-grams also appear anywhere in the
    TRAIN split. The standard eval-leakage test (n=8 is the usual
    shingle size) expressed as one distinct-deduped equi-join:

      test side:  (doc_id, ngram) distinct  — per-doc shingle set
      train side: (ngram) distinct          — global train shingle set
      left join on the ngram, count hits per test doc

    Output: (doc_id, n_ngrams, n_contaminated) as exact BIGINTs — the
    caller derives the contamination ratio; emitting integers keeps the
    result engine-hash-exact.

    Scale shape: shingle explode is a narrow projection; both sides
    dedup with map-side partial aggregation BEFORE the join, so the
    join is |distinct shingles| not |token positions|; the join itself
    is a plain equi sort-merge/hash join on the shingle key — never a
    corpus x corpus comparison. The key is the shingle's md5-derived
    60-BIT INTEGER, not the string: an 8-byte key instead of a ~70-byte
    8-gram cuts shuffle/dedup bytes ~8x, replays bit-exactly on any
    engine with md5 (the oracle computes the identical hash), and a
    2^-60 collision merely merges two shingles on BOTH engines
    identically (reported contamination shifts by ~0). Documents with
    < n words have no shingles and drop out, identically on both
    engines."""
    from flyq_spark.operators.util import fan_out

    # words-array projection barrier before _word_ngrams — see
    # split_shingled for the per-ngram re-evaluation rationale
    base = (
        train_test_split(
            fan_out(df.select(id_col, text_col)), id_col, test_prefix_below
        )
        .withColumn("_w", F.split(F.col(text_col), " "))
        .withColumn("_ng", _word_ngrams(F.col("_w"), n))
        .drop("_w")
    )
    h60 = lambda c: F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")  # noqa: E731
    test_ng = (
        base.where(F.col("split") == "test")
        .select(id_col, F.explode("_ng").alias("_g"))
        .select(F.col(id_col), h60(F.col("_g")).alias("_g"))
        .distinct()
    )
    train_ng = (
        base.where(F.col("split") == "train")
        .select(F.explode("_ng").alias("_g"))
        .select(h60(F.col("_g")).alias("_g"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        test_ng.join(train_ng, on="_g", how="left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_ngrams"),
            F.count("_hit").cast("long").alias("n_contaminated"),
        )
    )


def three_way_split(
    df: DataFrame,
    id_col: str = "doc_id",
    test_prefix_below: str = "0d",
    val_prefix_below: str = "1a",
) -> DataFrame:
    """Append a deterministic 3-way ``split`` column: 'test' iff the
    md5 hex prefix of the id sorts below ``test_prefix_below``, 'val'
    iff below ``val_prefix_below``, else 'train' — the
    :func:`train_test_split` rule extended with a validation band.
    Membership is a pure function of the id (stable across runs,
    engines, partitionings, corpus growth). Both thresholds must be
    the same length (they cut the SAME prefix) and test < val, or the
    bands would overlap silently."""
    if len(test_prefix_below) != len(val_prefix_below):
        raise ValueError(
            "prefix thresholds must be the same length: "
            f"{test_prefix_below!r} vs {val_prefix_below!r}"
        )
    if not test_prefix_below < val_prefix_below:
        raise ValueError(
            "test_prefix_below must sort strictly below val_prefix_below: "
            f"{test_prefix_below!r} >= {val_prefix_below!r}"
        )
    p = F.substring(_id_hash(id_col), 1, len(test_prefix_below))
    return df.withColumn(
        "split",
        F.when(p < F.lit(test_prefix_below), F.lit("test"))
        .when(p < F.lit(val_prefix_below), F.lit("val"))
        .otherwise(F.lit("train")),
    )


def _h60(c: Column) -> Column:
    """First 60 bits of md5 as a BIGINT — the shared shingle/coin key
    (8-byte join keys instead of ~70-byte n-gram strings; replays
    bit-exactly in any engine with md5)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _norm_text(c: Column) -> Column:
    """Canonical decontamination normalization: lowercase, every
    non-[a-z0-9 ] character (punctuation, digits stay) to a space,
    collapse space runs, trim. Each step is a codegen'd regexp in the
    Java∩RE2∩DuckDB common dialect (plain character classes and
    ``' +'`` — never ``\\s``/POSIX classes, whose semantics drift
    between engines), so an oracle replays the identical bytes with
    ``lower`` + two ``regexp_replace(..., 'g')`` + ``trim``. Order is
    part of the contract: lowering first makes the single class
    ``[^a-z0-9 ]`` complete; collapsing last erases the runs the strip
    step creates."""
    c = F.lower(c)
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def split_shingled(
    df: DataFrame,
    n: int,
    id_col: str,
    text_col: str,
    test_prefix_below: str,
    val_prefix_below: str,
    normalize: bool = False,
) -> DataFrame:
    """Shared front half of the decontamination family: 3-way
    deterministic split + the ``_ng`` word-n-gram array column. Both
    the batch :func:`contamination_report` and the streaming
    ``contamination_monitor_sink`` MUST tokenize/split/hash
    identically for their documented parity contract — this is the
    single definition they share (hash the ``_ng`` entries with
    :func:`_h60`). ``normalize=True`` runs :func:`_norm_text` before
    tokenizing (same flag on both halves, same parity reasoning)."""
    from flyq_spark.operators.util import fan_out

    text = F.col(text_col)
    if normalize:
        text = _norm_text(text)
    # Materialize the words ARRAY as its own projection before
    # shingling: _word_ngrams references its input three times, once
    # inside a per-element lambda where a non-attribute child is
    # re-evaluated PER NGRAM — inlining the 3-regexp normalization
    # there measured 8x at bench sf0.1 (35.2 s vs ~4.4 s). As a
    # multiply-referenced non-cheap alias, CollapseProject keeps this
    # projection a real barrier, so the split (and any normalization)
    # runs once per row.
    return (
        three_way_split(
            fan_out(df.select(id_col, text_col)),
            id_col,
            test_prefix_below,
            val_prefix_below,
        )
        .withColumn("_w", F.split(text, " "))
        .withColumn("_ng", _word_ngrams(F.col("_w"), n))
        .drop("_w")
    )


def contamination_report(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    test_prefix_below: str = "0d",
    val_prefix_below: str = "1a",
    normalize: bool = False,
) -> DataFrame:
    """Per-SPLIT train-leakage report — the release audit composing
    :func:`three_way_split` with :func:`contamination_ngrams`'s shingle
    join: for every val/test document, how many of its distinct word
    ``n``-grams appear anywhere in the TRAIN split, rolled up to one
    row per eval split: (split, n_docs, n_contaminated_docs, n_ngrams,
    n_hits). A release gate reads it directly: n_contaminated_docs
    must be ~0 before an eval score is trustworthy.

    ``normalize=True`` shingles :func:`_norm_text`-canonicalized text
    instead of raw bytes: exact 8-gram matching is brittle to
    case/punctuation edits (an UPPER-cased or comma-injected copy of a
    test doc sails through the exact screen), and the normalized
    variant catches exactly those — run both; the exact one stays the
    byte-level contract. Note the per-doc shingle COUNTS can shift
    under normalization (collapsed runs change tokenization), so the
    two reports' totals are not comparable row-for-row.

    Same scale shape as contamination_ngrams (distinct-deduped 60-bit
    shingle-key equi-join — never corpus x corpus); documents with
    < n words have no shingles and are absent from n_docs, identically
    on both engines (documented, not silent)."""
    base = split_shingled(
        df, n, id_col, text_col, test_prefix_below, val_prefix_below,
        normalize=normalize,
    )
    eval_ng = (
        base.where(F.col("split") != "train")
        .select("split", F.col(id_col), F.explode("_ng").alias("_g"))
        .select("split", F.col(id_col), _h60(F.col("_g")).alias("_g"))
        .distinct()
    )
    train_ng = (
        base.where(F.col("split") == "train")
        .select(F.explode("_ng").alias("_g"))
        .select(_h60(F.col("_g")).alias("_g"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    per_doc = (
        eval_ng.join(train_ng, on="_g", how="left")
        .groupBy("split", id_col)
        .agg(
            F.count("*").cast("long").alias("_n_ng"),
            F.count("_hit").cast("long").alias("_n_hit"),
        )
    )
    return per_doc.groupBy("split").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("_n_hit") > 0).cast("long"))
        .cast("long")
        .alias("n_contaminated_docs"),
        F.sum("_n_ng").cast("long").alias("n_ngrams"),
        F.sum("_n_hit").cast("long").alias("n_hits"),
    )


def unit_contamination(
    df: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
    test_prefix_below: str = "0d",
    val_prefix_below: str = "1a",
    normalize: bool = False,
) -> DataFrame:
    """Unit-granularity (paragraph/line) train-leakage report — the
    audit gap between :func:`contamination_report` (whole-document
    shingles) and boilerplate removal: a train document that QUOTES a
    single eval paragraph shows near-zero whole-doc overlap ratio, and
    whole-doc shingles straddling unit boundaries never match a
    quoted fragment's shingles at all (the raw text tokenizes the
    delimiter INTO words: ``'end\\nStart'`` is one token). Splitting
    BOTH sides into units first (``dedup.split_units`` semantics —
    same literal-delimiter quoting) makes a quoted unit's shingles
    byte-identical wherever it appears.

    Composition: units → 3-way deterministic split (a pure function of
    the id, so re-deriving it on the unit rows costs no join) →
    distinct unit shingles per side → the 60-bit shingle-key equi-join
    of contamination_report → per-split rollup over UNITS:
    (split, n_docs, n_units, n_contaminated_units, n_ngrams, n_hits),
    where n_docs counts eval documents with >= 1 scored unit and
    n_contaminated_units those units with >= 1 train hit. A smaller
    default ``n`` (5) reflects that units are shorter than documents;
    units with < n words have no shingles and are absent, identically
    on both engines. ``normalize=True`` canonicalizes each UNIT with
    :func:`_norm_text` before shingling.

    Scale shape unchanged from contamination_report: the explode is a
    narrow projection, both sides dedup with map-side partials before
    the join, and the join is |distinct unit shingles| — never
    corpus x corpus."""
    from flyq_spark.operators.dedup import split_units
    from flyq_spark.operators.util import fan_out

    units = split_units(
        fan_out(df.select(id_col, text_col)), text_col, id_col, delim
    )
    unit_text = F.col("unit")
    if normalize:
        unit_text = _norm_text(unit_text)
    # words-array projection barrier before _word_ngrams — see
    # split_shingled for the per-ngram re-evaluation rationale
    base = (
        three_way_split(units, id_col, test_prefix_below, val_prefix_below)
        .withColumn("_w", F.split(unit_text, " "))
        .withColumn("_ng", _word_ngrams(F.col("_w"), n))
        .drop("_w")
    )
    eval_ng = (
        base.where(F.col("split") != "train")
        .select(
            "split", F.col(id_col), "unit_pos", F.explode("_ng").alias("_g")
        )
        .select(
            "split", F.col(id_col), "unit_pos", _h60(F.col("_g")).alias("_g")
        )
        .distinct()
    )
    train_ng = (
        base.where(F.col("split") == "train")
        .select(F.explode("_ng").alias("_g"))
        .select(_h60(F.col("_g")).alias("_g"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    per_unit = (
        eval_ng.join(train_ng, on="_g", how="left")
        .groupBy("split", id_col, "unit_pos")
        .agg(
            F.count("*").cast("long").alias("_n_ng"),
            F.count("_hit").cast("long").alias("_n_hit"),
        )
    )
    return per_unit.groupBy("split").agg(
        F.count_distinct(F.col(id_col)).cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_units"),
        F.sum((F.col("_n_hit") > 0).cast("long"))
        .cast("long")
        .alias("n_contaminated_units"),
        F.sum("_n_ng").cast("long").alias("n_ngrams"),
        F.sum("_n_hit").cast("long").alias("n_hits"),
    )


def release_audit(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    test_prefix_below: str = "0d",
    val_prefix_below: str = "1a",
) -> DataFrame:
    """One-row-per-split release QA table — the numbers a dataset
    release signs off on, composed from the already-proven pieces so
    the whole report shares their semantics: per split,

    - ``n_docs``: document count (:func:`three_way_split` membership);
    - ``n_dup_docs``: within-split EXACT duplicates, n_docs − distinct
      texts (NULL texts are not counted distinct and therefore count
      as duplicates of each other only via the count difference —
      the fixture has none; byte-level dedup is the floor, the
      near-dup family refines it);
    - ``n_quality_bad``: documents failing the composed Gopher rules
      (text.quality_filter, first-failing-rule semantics);
    - ``n_contaminated_docs``: eval documents with >= 1 train 8-gram
      hit (:func:`contamination_report`'s per-doc join), 0 for train
      by definition.

    Everything is an exact BIGINT. Plan: one split projection feeding
    three independent aggregations (split counts; quality verdicts
    joined back on the id; the shingle join), stitched on the 3-row
    split key — the stitching joins are 3-row broadcasts, so the cost
    is exactly the sum of the component passes."""
    from flyq_spark.operators.text import quality_filter

    split = three_way_split(
        df.select(id_col, text_col), id_col, test_prefix_below,
        val_prefix_below,
    )
    per_split = split.groupBy("split").agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.count("*") - F.count_distinct(F.col(text_col)))
        .cast("long")
        .alias("n_dup_docs"),
    )
    # null-keys-impossible: id_col is the row identity
    bad = (
        split.select("split", F.col(id_col))
        .join(
            quality_filter(df, id_col, text_col)
            .where(~F.col("keep"))
            .select(F.col(id_col)),
            on=id_col,
        )
        .groupBy("split")
        .agg(F.count("*").cast("long").alias("n_quality_bad"))
    )
    contam = contamination_report(
        df, n=n, id_col=id_col, text_col=text_col,
        test_prefix_below=test_prefix_below,
        val_prefix_below=val_prefix_below,
    ).select("split", "n_contaminated_docs")
    return (
        per_split
        # null-keys-impossible: split is a non-null literal
        .join(F.broadcast(bad), on="split", how="left")
        # null-keys-impossible: split is a non-null literal
        .join(F.broadcast(contam), on="split", how="left")
        .select(
            "split",
            "n_docs",
            "n_dup_docs",
            F.coalesce(F.col("n_quality_bad"), F.lit(0))
            .cast("long")
            .alias("n_quality_bad"),
            F.coalesce(F.col("n_contaminated_docs"), F.lit(0))
            .cast("long")
            .alias("n_contaminated_docs"),
        )
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff the first 4 md5
    hex digits of its id fall below the stratum's threshold (fraction ×
    65536, i.e. ~2.4 significant hex digits of resolution). Unlike
    ``DataFrame.sampleBy`` (seeded RNG over partition iteration order,
    engine-specific), membership is a pure function of (id, stratum
    fraction): reproducible across engines and partitionings, and a row
    never flips in or out when other rows change. Zero shuffles."""
    h4 = F.conv(F.substring(_id_hash(id_col), 1, 4), 16, 10).cast("long")
    thresholds = F.create_map(
        *[
            x
            for kv in fractions.items()
            for x in (F.lit(kv[0]), F.lit(int(round(kv[1] * 65536))))
        ]
    )
    thr = F.coalesce(
        thresholds.getItem(F.col(strata_col)),
        F.lit(int(round(default_fraction * 65536))),
    )
    return df.where(h4 < thr)


def source_composition(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-source corpus composition — the statistics a mixture-weighting
    step consumes (how many docs/tokens each domain contributes, how
    monolingual it is, how long its longest document runs) before
    choosing per-source sampling rates for ``stratified_sample``.

    One hash-groupBy on the source key with map-side partial
    aggregation; token counts are the length-arithmetic projection from
    ``text.token_count`` (no split/explode — the scan never materializes
    token arrays). All outputs are exact BIGINTs; callers derive shares
    so the result stays engine-hash-exact.

    Output: (source, n_docs, n_tokens, n_langs, max_doc_tokens)."""
    from flyq_spark.operators.text import token_count

    toks = token_count(F.col(text_col))
    return (
        df.withColumn("_t", toks)
        .groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_t").cast("long").alias("n_tokens"),
            F.countDistinct(lang_col).cast("long").alias("n_langs"),
            F.max("_t").cast("long").alias("max_doc_tokens"),
        )
    )


def upsample_strata(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic mixture UPWEIGHTING: replicate each row
    ``rate[stratum]`` times in expectation, where the fractional part is
    resolved per row by the same md5 threshold ``stratified_sample``
    uses (rate 2.3 → every row appears twice, and the deterministic
    ~30% of rows whose 4-hex-digit id hash falls below 0.3·65536 appear
    a third time). Together the two operators give full mixture control:
    rates < 1 thin a stratum, rates > 1 repeat it — epoch weighting for
    high-quality sources without materializing copies upstream.

    Membership is a pure function of (id, stratum rate): reproducible
    across engines/partitionings, rows never flip when other rows
    change. Replication is a ``sequence``+``explode`` projection — no
    shuffle, no RNG, and the output carries ``copy_id`` (1-based) so
    downstream shuffling/packing can separate the copies.

    The ``sequence(1, n)`` guard matters: Spark's sequence with stop <
    start emits a DESCENDING range, so n_copies = 0 must map to an
    empty array, not [1, 0]."""
    h4 = F.conv(F.substring(_id_hash(id_col), 1, 4), 16, 10).cast("long")
    rate_expr = F.lit(float(default_rate))
    for stratum, rate in rates.items():
        rate_expr = F.when(
            F.col(strata_col) == stratum, F.lit(float(rate))
        ).otherwise(rate_expr)
    whole = F.floor(rate_expr).cast("long")
    frac_thresh = F.round((rate_expr - whole) * 65536).cast("long")
    n_copies = whole + (h4 < frac_thresh).cast("long")
    idx = F.when(
        n_copies >= 1, F.sequence(F.lit(1).cast("long"), n_copies)
    ).otherwise(F.array().cast("array<long>"))
    return df.withColumn("copy_id", F.explode(idx))


def length_percentiles(
    df: DataFrame,
    group_col: str = "lang",
    value_col: str = "n_chars",
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """EXACT per-group percentiles of an integer metric (doc-length
    profiling for corpus QA): the value at 1-based rank ``ceil(p * n)``
    in ascending order — the inverted-CDF definition, chosen because it
    is a pure integer-rank selection every engine computes identically
    (interpolating definitions average two values and reopen float
    territory).

    Plan: the rank selection runs over the DISTINCT (group, value)
    table — one (group, value) groupBy, then the per-group distributed
    prefix-sum primitive (operators/ranking.py): a rank window keyed by
    the group column would sort N/|groups| rows in ONE task when the
    group is low-cardinality (lang ≈ tens of values over billions of
    docs), while the counted-distinct form moves only distinct values
    through a balanced range exchange. The value at rank r is the
    distinct value whose rank interval (cum−cnt, cum] covers r — ties
    collapse into the interval, so the selection is tie-order-free by
    construction.

    Output: (group, n_docs, p50, p90, ... as BIGINT)."""
    from flyq_spark.operators.ranking import grouped_prefix_sums
    from flyq_spark.operators.util import exact_ceil_frac

    counted = (
        df.select(F.col(group_col), F.col(value_col))
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    cums = grouped_prefix_sums(
        counted,
        [group_col],
        [F.col(value_col).asc()],
        {"_cum": F.col("_c")},
        totals={"_cum": "_n"},
    )
    def covers(p):
        r = exact_ceil_frac(F.col("_n"), p)
        return (F.col("_cum") - F.col("_c") < r) & (r <= F.col("_cum"))
    sels = [
        F.max(F.when(covers(p), F.col(value_col)))
        .cast("long")
        .alias("p" + str(p).replace("0.", "").ljust(2, "0"))
        for p in percentiles
    ]
    return cums.groupBy(group_col).agg(
        F.max("_n").cast("long").alias("n_docs"), *sels
    )


def quality_weighted_sample(
    df: DataFrame,
    weight_col: Column | str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Independent per-row Bernoulli sampling with row-specific keep
    probability — the DCLM/FineWeb-style quality-weighted mixing
    primitive (keep high-quality documents with probability ~1, noisy
    ones with probability ~their score) made DETERMINISTIC: the coin is
    the first 15 md5 hex digits of the id as a 60-bit uniform, kept iff
    ``hash < weight * 2^60``. Membership is a pure function of
    (id, weight): reproducible across engines, partitionings, and runs;
    a row never flips when other rows change; and the identical
    expression replays in ANSI SQL, so the gate can hash-compare it.

    Weights clamp to [0, 1]. Pure projection + filter — zero shuffles,
    zero state, shard-parallel at any corpus size."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = F.least(F.greatest(w.cast("double"), F.lit(0.0)), F.lit(1.0))
    h60 = F.conv(F.substring(_id_hash(id_col), 1, 15), 16, 10).cast("long")
    return df.where(h60 < (w * F.lit(float(1 << 60))).cast("long"))


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking — the context-window splitter
    RAG indexing and long-document training both need (``pack_documents``
    concatenates SHORT docs up to a budget; this splits LONG docs down
    to one): chunk c covers tokens [c*stride+1, c*stride+chunk_tokens]
    with stride = chunk_tokens - overlap, so consecutive chunks share
    ``overlap`` tokens and no token is lost. The final chunk is the
    (possibly short) remainder; a doc shorter than ``chunk_tokens``
    yields exactly one chunk of itself.

    Pure projection — token array → ``sequence`` of chunk starts →
    ``transform``/``slice``/``array_join`` — no shuffle beyond the
    ``fan_out`` input guard (a no-op once data arrives as many splits;
    without it a single-row-group fixture pins the slicing onto one
    core), zero Python; at 100 TB this is a narrow map over the corpus
    scan, and the output explode is bounded by total-token volume, not
    doc count squared.

    Output: (id, chunk_id, chunk_text, n_tokens), chunk_id 0-based."""
    from flyq_spark.operators.util import fan_out

    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap={overlap} must satisfy 0 <= overlap < "
            f"chunk_tokens={chunk_tokens} (a negative overlap would "
            "silently skip tokens between chunks)"
        )
    df = fan_out(df)
    stride = chunk_tokens - overlap
    words = F.array_remove(F.split(F.col(text_col), "\\s+"), "")
    n = F.size(words)
    # number of chunks: 1 + ceil(max(0, n - chunk_tokens) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - F.lit(chunk_tokens), F.lit(0)) / F.lit(stride)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda c: F.struct(
            c.cast("long").alias("chunk_id"),
            F.array_join(
                F.slice(words, c * stride + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens), n - c * stride
            ).cast("long").alias("n_tokens"),
        ),
    )
    return (
        df.where(n > 0)
        .select(F.col(id_col), F.explode(chunks).alias("_c"))
        .select(id_col, "_c.chunk_id", "_c.chunk_text", "_c.n_tokens")
    )


def winnowing_fingerprints(
    df: DataFrame,
    k: int = 5,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every word k-gram, then keep each window-of-w
    consecutive hashes' MINIMUM (rightmost position on ties — the
    paper's robust-winnowing tie-break). Guarantees every shared
    substring of length >= w+k-1 words contributes at least one
    matching fingerprint while storing ~2/(w+1) of the hashes — the
    sub-linear overlap/plagiarism index (``contamination_ngrams`` keeps
    FULL shingle sets; winnowing is the sketch that makes the index
    fit at corpus scale).

    Min-with-rightmost-tie-break is ONE frame aggregate via key
    packing: key = h36 * 2^24 + (2^24 - 1 - pos), so minimizing the
    key minimizes the 36-bit gram hash and, among ties, maximizes the
    position — no nested window functions (Spark forbids them), no
    self-join. Positions cap at 2^24 - 1 k-grams (a 16M-word document);
    grams past the cap are EXPLICITLY truncated by a filter both
    engines apply identically (chunk such documents first — nothing at
    that length should be fingerprinted whole anyway).

    Plan: narrow position-tagged k-gram projection → ONE doc-key
    window (RANGE frame of w positions) → distinct. Skew is bounded by
    document length; the window key is the doc, never a gram. All
    arithmetic is md5 + integer ops the oracle replays exactly.

    Output: (id, pos, gram_hash) — selected fingerprints, pos = the
    1-based k-gram position, gram_hash = the winnowed 36-bit hash."""
    from flyq_spark.operators.util import fan_out

    pos_bits = 24
    pos_cap = (1 << pos_bits) - 1
    df = fan_out(df)
    words = F.split(F.col(text_col), " ")
    idx = F.when(
        F.size(words) >= k, F.sequence(F.lit(1), F.size(words) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = (
        df.select(
            F.col(id_col),
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        i.cast("long").alias("pos"),
                        F.conv(
                            F.substring(
                                F.md5(F.array_join(F.slice(words, i, k), " ")),
                                1,
                                9,
                            ),
                            16,
                            10,
                        ).cast("long").alias("h"),
                    ),
                )
            ).alias("_g"),
        )
        .select(id_col, "_g.pos", "_g.h")
        .where(F.col("pos") <= pos_cap)
    )
    key = F.col("h") * F.lit(1 << pos_bits) + (F.lit(pos_cap) - F.col("pos"))
    fr = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rangeBetween(-(window - 1), 0)
    )
    return (
        grams.withColumn("_km", F.min(key).over(fr))
        .where(F.col("pos") >= F.lit(window))  # complete windows only
        .select(
            F.col(id_col),
            (F.lit(pos_cap) - F.col("_km").bitwiseAND(F.lit(pos_cap)))
            .cast("long")
            .alias("pos"),
            F.shiftrightunsigned(F.col("_km"), pos_bits)
            .cast("long")
            .alias("gram_hash"),
        )
        .distinct()
    )


def sample_k_per_group(
    df: DataFrame,
    group_cols: tuple[str, ...],
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic exact-k sample per group — eval/debug-set
    construction ("k examples per (source, lang) cell"): rank rows
    within each group by (md5(id), id) and keep the first k. The hash
    order is a reproducible pseudo-random draw — engine-, partitioning-
    and run-independent, unlike ``sampleBy`` (RNG + partition-order
    dependent), and exact-k unlike the fraction-based
    ``stratified_sample``; both matter when the eval set must be
    re-derivable from the corpus forever.

    Plan: the within-group rank rides the distributed grouped
    row_number (operators/ranking.py — a window keyed by the group
    columns puts N/|groups| rows in ONE sort task when the cells are
    few, the straggler shape at corpus scale; the md5 order makes the
    range exchange perfectly balanced by construction), then the ≤k
    filter. Output: input columns + ``sample_rank`` (1..k).

    Group-cardinality regime: the grouped primitive force-broadcasts a
    ≤(P + |groups|)-row offset table — right for the LOW-cardinality
    cells this targets ((source, lang) grids); for millions of tiny
    groups a plain group-keyed ``row_number`` window is already
    balanced and is the right tool (operators/ranking.py regime
    note)."""
    from flyq_spark.operators.ranking import grouped_row_number

    h = _id_hash(id_col)
    ranked = grouped_row_number(
        df.withColumn("_skh", h),
        list(group_cols),
        [F.col("_skh").asc(), F.col(id_col).asc()],
        rank_col="sample_rank",
    )
    return ranked.where(F.col("sample_rank") <= k).drop("_skh")


def negative_samples(
    df: DataFrame, k: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    document draws ``k`` pseudo-uniform OTHER documents, reproducible
    forever and identical on every engine/partitioning (the property
    RNG-based samplers lack — a resumed or re-sharded job must pair the
    same negatives or contrastive batches silently change).

    Construction: rank every id on a reproducible md5 ring
    (``corpus_shuffle``'s shard-parallel rank — no single-partition
    window), then negative i of document d is the document at ring
    position ``(rank(d) - 1 + o) mod N + 1`` where
    ``o = 1 + (md5_60("neg:d:i") mod (N-1))`` ∈ [1, N-1] — never 0 mod
    N, so a document can never draw itself, with no rejection loop.

    Plan: the ring ranking's bounded shuffles (persisted — count,
    probes, and rank lookup all consume it) + ONE equi-join on the
    uniform rank key (|corpus|·k probe rows against |corpus| ring rows,
    no skew by construction). The corpus size N is a driver-side scalar
    off the cached ring (model-sized, like a Bloom bitmap).
    Output: (id, slot, neg_<id>) — raises on N < 2."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # three consumers (count, probes, rank lookup) — persist or the
    # 2-shuffle shard-ranked permutation recomputes per branch
    ring = corpus_shuffle(df.select(id_col), id_col=id_col, seed="negring").persist()
    n_total = ring.count()  # materializes the cache; model-sized scalar
    if n_total < 2:
        raise ValueError(
            f"negative sampling needs >= 2 documents, got {n_total}"
        )
    h60 = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit("neg"),
                    F.col(id_col).cast("string"),
                    F.col("slot").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    N = F.lit(n_total).cast("long")
    probes = (
        ring.select(
            F.col(id_col),
            F.col("shuffle_rank").alias("_r"),
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("slot"),
        )
        .withColumn("_off", F.lit(1) + F.pmod(h60, N - 1))
        .withColumn("_nr", F.pmod(F.col("_r") - 1 + F.col("_off"), N) + 1)
    )
    lookup = ring.select(
        F.col("shuffle_rank").alias("_nr"),
        F.col(id_col).alias(f"neg_{id_col}"),
    )
    return probes.join(lookup, on="_nr").select(
        id_col, F.col("slot").cast("long").alias("slot"), f"neg_{id_col}"
    )


def _isqrt_exact(x: Column) -> Column:
    """Exact integer floor(sqrt(x)) for non-negative BIGINT or
    DECIMAL(p,0) columns with x <= ~10^31.

    IEEE double sqrt is correctly rounded but floor(sqrt(CAST(x AS
    DOUBLE))) can still land ±1 off the true integer root (the cast
    loses low bits past 2^53, and the boundary x = s² ± ε rounds
    either way), so the candidate is corrected with EXACT arithmetic —
    the result is engine-independent even though the intermediate
    double is not guaranteed to be.

    The correction squares run in DECIMAL(38,0) so they stay exact far
    past the int64 line (the old BIGINT multiply overflowed for
    x > 2^63, i.e. n_docs > ~9.22M on the n·10¹² temperature path).
    Domain bound: the double candidate's relative error is
    <= 1.5·2⁻⁵³, so its ABSOLUTE error is < 0.6 while sqrt(x) <=
    ~3.2·10¹⁵ (x <= ~10^31) — within the ±1 correction window. Above
    that the candidate itself can drift further than ±1, so callers
    must keep x <= 10^31 (n_docs <= ~10¹⁹ on the n·10¹² path)."""
    xd = x.cast("decimal(38,0)")
    s0 = F.floor(F.sqrt(xd.cast("double"))).cast("long")
    s0d = s0.cast("decimal(19,0)")
    one = F.lit(1).cast("decimal(19,0)")
    return (
        F.when((s0d + one) * (s0d + one) <= xd, s0 + 1)
        .when(s0d * s0d > xd, s0 - 1)
        .otherwise(s0)
    )


def temperature_mix(
    df: DataFrame,
    source_col: str = "source",
    alpha_permille: int = 500,
    budget: int = 10_000,
) -> DataFrame:
    """α-temperature source mixing (the mT5/XLM-R/CC-mix sampling rule
    p_i ∝ n_i^α): flatten the source (or language) distribution so
    head sources stop drowning the tail, and apportion an EXACT
    integer document quota per source for a target sample budget —
    the planning half of dataset mixing, feeding ``stratified_sample``
    / ``upsample_mixture`` with per-source rates.

    Exact-integer discipline: α is restricted to the canonical
    temperatures {1000, 500, 250}‰ (α=1 passthrough, α=1/2, α=1/4) so
    weights are integer roots — w = n, w = isqrt(n·10⁶) (= ⌊1000·√n⌋),
    w = isqrt(isqrt(n·10¹²)) (= ⌊1000·n^¼⌋) — via the
    multiply-corrected isqrt (no engine-dependent float survives).
    Quotas use LARGEST-REMAINDER apportionment: base = ⌊B·w/W⌋, the
    L = B − Σbase leftover seats go to the largest remainders
    (B·w mod W), ties to the smaller source name — deterministic, and
    Σ quota = B exactly (the theorem the gate pins; naive rounding
    misses the budget by up to |sources|/2).

    Scale shape: one groupBy to |sources| rows; everything after
    (scalar total, remainder rank, quota) runs on that human-scale
    table — the remainder rank's partition-less window is bounded by
    |sources|, never data. Output: (source, n_docs, weight, quota).
    """
    counts = df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return temperature_mix_from_counts(
        counts, source_col, "n_docs", alpha_permille, budget
    )


def temperature_mix_from_counts(
    counts: DataFrame,
    source_col: str = "source",
    n_col: str = "n_docs",
    alpha_permille: int = 500,
    budget: int = 10_000,
) -> DataFrame:
    """``temperature_mix`` over a pre-aggregated (source, n_docs) table
    — the same weight/quota math without re-counting, for callers that
    already hold per-source counts (catalog stats, a prior groupBy) and
    for testing the corpus-scale n_docs regime without materializing
    billions of rows.

    All overflow-prone intermediates run in DECIMAL: the α=1/4 weight
    root computes n·10¹² in DECIMAL(33,0) (the old BIGINT multiply
    overflowed for n_docs > ~9.22M — exactly the head-source regime
    the operator targets), and the quota products B·w run in
    DECIMAL(38,0) (BIGINT wrapped once budget·weight passed 2^63).
    Exactness bounds: n_docs <= ~10¹⁹ (the _isqrt_exact ±1-correction
    domain) and budget·max_weight < 10³⁸ — both astronomically past
    any real corpus."""
    if alpha_permille not in (1000, 500, 250):
        raise ValueError(
            f"alpha_permille must be one of (1000, 500, 250): {alpha_permille}"
        )
    if budget < 0:
        raise ValueError(f"budget must be >= 0: {budget}")
    n = F.col(n_col).cast("long")
    nd = n.cast("decimal(19,0)")
    if alpha_permille == 1000:
        w = n
    elif alpha_permille == 500:
        w = _isqrt_exact(nd * F.lit(1_000_000).cast("decimal(7,0)"))
    else:
        w = _isqrt_exact(
            _isqrt_exact(nd * F.lit(1_000_000_000_000).cast("decimal(13,0)"))
        )
    weighted = counts.select(
        F.col(source_col), n.alias("n_docs")
    ).withColumn("weight", w.cast("long"))
    return _apportion(weighted, budget, source_col)


def _apportion(
    weighted: DataFrame, budget: int, source_col: str
) -> DataFrame:
    """LARGEST-REMAINDER apportionment of ``budget`` over a
    (source, n_docs, weight) table: base = ⌊B·w/W⌋, the L = B − Σbase
    leftover seats go to the largest remainders (B·w mod W), ties to
    the smaller source name — deterministic and Σ quota = B exactly
    (the shared theorem of the mixture family). Returns
    (source, n_docs, weight, quota)."""
    # Σ weights in DECIMAL(38,0): weights are bounded by n_docs (α=1),
    # so a many-source corpus-scale total can pass 2^63 even though
    # each weight fits BIGINT.
    tot = weighted.agg(
        F.sum(F.col("weight").cast("decimal(19,0)")).alias("_w_tot"),
        F.count(F.lit(1)).cast("long").alias("_n_src"),
    )
    b = F.lit(int(budget)).cast("decimal(19,0)")
    bw = b * F.col("weight").cast("decimal(19,0)")
    based = (
        weighted.crossJoin(F.broadcast(tot))
        # IntegralDivide accepts DECIMAL operands and returns BIGINT
        # exactly (the quotient is <= budget); the remainder stays
        # DECIMAL — it is bounded by _w_tot, which may not fit BIGINT.
        .withColumn("_base", F.call_function("div", bw, F.col("_w_tot")))
        .withColumn("_rem", bw % F.col("_w_tot"))
    )
    # leftover seats L = B - sum(base); rank remainders on the
    # |sources|-row table (partition-less window bounded by the source
    # count, never by data — same class as the ranking offset tables)
    w_rank = Window.orderBy(F.col("_rem").desc(), F.col(source_col).asc())
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        based.withColumn("_seat", F.row_number().over(w_rank).cast("long"))
        .withColumn("_left", b - F.sum("_base").over(w_all))
        .select(
            F.col(source_col),
            "n_docs",
            "weight",
            (
                F.col("_base")
                + F.when(F.col("_seat") <= F.col("_left"), 1).otherwise(0)
            ).cast("long").alias("quota"),
        )
    )


def importance_resample(
    df: DataFrame,
    weight_col: Column | str,
    k: int,
    seed: str | int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic importance resampling (the selection half of DSIR,
    Xie et al. 2023): draw EXACTLY ``k`` training examples distributed
    proportionally to a non-negative integer importance weight, with
    multiplicity — the step that turns ``domain_affinity`` scores (or
    any integer weight: quality buckets, temperature quotas) into a
    concrete training set. RNG-based resampling breaks reproducibility
    (a resumed job draws a different corpus); this is systematic
    resampling made a pure function of (seed, ids, weights):

    - Documents are laid on the reproducible md5 ring (``corpus_shuffle``'s
      (md5(seed:id), id) order), each owning a weight-mass interval
      [P_i - w_i, P_i) of the total mass W via an exact prefix sum.
    - ``k`` equally-spaced sample points t_j = (o + j*W) / k (j = 0..k-1,
      offset o = md5_60(seed) mod W) land on the ring; document i is
      drawn once per point in its interval:
      n_copies_i = floor((P_i*k - o - 1)/W) - floor(((P_i-w_i)*k - o - 1)/W).
      Sigma n_copies = k EXACTLY (the gate's theorem), E[n_copies_i] =
      k*w_i/W, and n_copies never deviates from that mean by >= 1 —
      the low-variance guarantee plain multinomial draws lack.
    - All arithmetic is exact: the prefix sum is BIGINT (ANSI crashes
      loudly past 2^63 rather than wrapping); the P*k operands are cast
      DECIMAL(19,0) and Spark's decimal arithmetic promotes their
      product to DECIMAL(38,0); the floor divisions shift by +W so the
      numerator is non-negative — integral ``div`` then agrees with
      floor on every engine. Exactness domain: k*W + W < 10^38 (the +W
      shift rides on top of the product; overflow past it is a LOUD
      ANSI error, never a silent wrap).

    Scale shape (mirrors ``corpus_shuffle``): the prefix sum runs
    shard-parallel — a within-shard cumulative window over the 4096
    first-3-hex-digit shards plus a broadcast ≤4096-row shard-offset
    table (the shard digits are a PREFIX of the ring key, so
    shard-major order IS global ring order; any prefix width yields
    the same prefix sums) — then W and o attach as a 1-row broadcast
    (scalar-subquery shape). No data-sized exchange beyond the one
    shard window; zero driver state.

    Output: (id, weight, n_copies) for drawn documents (n_copies >= 1),
    BIGINTs. Raises loudly on k < 1, any NULL or negative weight, or
    W <= 0."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w_raw = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # NULL or negative weights raise loudly: a NULL would otherwise
    # propagate through the prefix sum and silently drop rows AFTER it
    # on the ring — the worst failure mode for a sampler (membership
    # depends on unrelated rows' hash positions).
    wt = (
        F.when(
            w_raw.cast("long").isNull() | (w_raw.cast("long") < 0),
            F.raise_error(
                F.concat(
                    F.lit(
                        "importance_resample: NULL or negative weight for id "
                    ),
                    F.coalesce(F.col(id_col).cast("string"), F.lit("NULL")),
                )
            ),
        )
        .otherwise(w_raw.cast("long"))
        .alias("weight")
    )
    h = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    base = df.select(F.col(id_col), wt, h.alias("_h"))
    sharded = base.withColumn("_shard", F.substring("_h", 1, 3))
    shard_w = Window.partitionBy("_shard").orderBy("_h", F.col(id_col))
    ranked = sharded.withColumn(
        "_local_p",
        F.sum("weight").over(
            shard_w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"),
    )
    offsets = (
        sharded.groupBy("_shard")
        .agg(F.sum("weight").cast("long").alias("_mass"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_mass").over(
                    Window.orderBy("_shard").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).cast("long"),
        )
        .select("_shard", "_offset")
    )
    total = base.agg(F.sum("weight").cast("long").alias("_t")).select(
        F.when(
            F.coalesce(F.col("_t"), F.lit(0)) <= 0,
            F.raise_error(
                F.lit("importance_resample: total weight mass is 0")
            ),
        )
        .otherwise(F.col("_t"))
        .alias("_w_total")
    )
    h60_seed = F.conv(
        F.substring(F.md5(F.lit(f"resample-offset:{seed}")), 1, 15), 16, 10
    ).cast("long")
    kd = F.lit(int(k)).cast("decimal(19,0)")
    wd = F.col("_w_total").cast("decimal(19,0)")
    od = (h60_seed % F.col("_w_total")).cast("decimal(19,0)")
    p_hi = (F.col("_local_p") + F.col("_offset")).cast("decimal(19,0)")
    p_lo = p_hi - F.col("weight").cast("decimal(19,0)")
    # trunc-div == floor-div because +W keeps both numerators >= 0:
    # P*k - o - 1 + W >= 0 - (W-1) - 1 + W = 0
    hi_q = F.call_function("div", p_hi * kd - od - 1 + wd, wd)
    lo_q = F.call_function("div", p_lo * kd - od - 1 + wd, wd)
    return (
        ranked.join(F.broadcast(offsets), on="_shard")
        .crossJoin(F.broadcast(total))
        .withColumn("n_copies", (hi_q - lo_q).cast("long"))
        .where(F.col("n_copies") >= 1)
        .select(id_col, "weight", "n_copies")
    )


def mixture_build(
    df: DataFrame,
    source_col: str = "source",
    alpha_permille: int = 500,
    budget: int = 10_000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the α-temperature training mixture —
    :func:`temperature_mix` plans integer per-source quotas; this turns
    them into a concrete document list with multiplicity, the missing
    step between "the mixture should be 14% src3" and an actual epoch
    plan. Deterministic and exact:

    - each source's documents rank on the md5 ring (``(md5(id), id)``
      order via the distributed grouped row_number — perfectly balanced
      range exchange, no per-source sort task);
    - quota q spreads by largest-remainder over the ring: every doc
      repeats ``q div n`` times and the first ``q mod n`` ring
      positions take one extra — so Σ n_copies = q per source even
      when q > n (tail-source UPSAMPLING, the mT5 regime temperature
      flattening exists to create), and q ≤ n degrades to a plain
      deterministic top-q selection with n_copies = 1.
    - Σ n_copies over the whole output = budget EXACTLY (both
      apportionment stages are largest-remainder) — the gate theorem.

    Plan: one groupBy to |sources| quota rows (broadcast), one grouped
    row_number over the data (a single range exchange), a broadcast
    join, and a codegen'd projection. Output: (id, source, sample_rank,
    n_copies) for drawn docs (n_copies >= 1).

    Group-cardinality regime: quotas and ranks are per-SOURCE — the
    low-cardinality mixing axis this targets (the grouped primitive's
    broadcast offset table is ≤ P + |sources| rows). For a
    high-cardinality axis, plan with ``temperature_mix_from_counts``
    and sample with ``importance_resample`` instead."""
    mix = temperature_mix(
        df, source_col, alpha_permille=alpha_permille, budget=budget
    ).select(source_col, "n_docs", "quota")
    return _materialize_quotas(df, mix, source_col, id_col)


def mixture_build_epochs(
    df: DataFrame,
    source_col: str = "source",
    alpha_permilles: tuple[int, ...] = (1000, 500, 250),
    budget: int = 10_000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Multi-epoch :func:`mixture_build` in ONE pass — the fused form
    of the annealed temperature schedule (epoch e drawn at
    ``alpha_permilles[e]``). Row-for-row identical to unioning one
    ``mixture_build`` per alpha with an ``epoch`` tag, but the
    expensive pieces are shared instead of repeated (r12 optimization,
    guide §1.2 "don't compute things twice"):

    - the md5-ring ``sample_rank`` is a pure function of
      (id, source) — alpha never enters it — so the grouped
      row_number (the only data-sized range exchange) runs ONCE, not
      once per epoch; the per-alpha union form re-ranked the corpus
      per epoch purely to recompute a number it already had;
    - the per-source counts aggregate ONCE and collect to the driver —
      |sources| rows, the operator's documented low-cardinality mixing
      axis, the same bounded-by-group-count class as the ranking
      family's broadcast offset tables — and the per-epoch quota
      arithmetic (unchanged temperature_mix_from_counts SQL, so the
      decimal-exact weight/apportionment math has one definition) runs
      over the re-localized counts: the quota broadcast builds from a
      LocalTableScan instead of re-scanning the corpus 2x per epoch.
      (Two rejected alternatives, both measured: leaving the counts as
      a shared lazy subtree re-scans the corpus under every consumer
      inside the broadcast build — 6 scans for 3 epochs — and swings
      2.4-18 s at sf0.1; lazily localCheckpoint-ing the counts instead
      serializes checkpoint jobs inside the broadcast subqueries and
      ran 6x slower.);
    - the quota join broadcasts the (epoch, source) quota table —
      |sources| × |epochs| rows — and fans each ranked doc out to its
      per-epoch multiplicity in the same codegen'd projection
      ``mixture_build`` uses.

    Plan: 2 corpus scans + 1 range exchange + 1 broadcast join total,
    versus (2 scans + 1 range exchange + 1 join) PER EPOCH for the
    union form. Σ n_copies = budget still holds per epoch (same
    largest-remainder math on the same counts). Output:
    (epoch, id, source, sample_rank, n_copies), epoch = the 0-based
    index into ``alpha_permilles``."""
    if not alpha_permilles:
        raise ValueError("alpha_permilles must name at least one epoch")
    spark = df.sparkSession
    # bounded collect: |sources| rows (low-cardinality axis by contract)
    counts_rows = (
        df.groupBy(source_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .collect()
    )
    counts = spark.createDataFrame(
        counts_rows,
        df.select(source_col).schema.add("n_docs", "long", False),
    )
    mixes = [
        temperature_mix_from_counts(
            counts, source_col, "n_docs", alpha, budget
        )
        .select(source_col, "n_docs", "quota")
        .withColumn("epoch", F.lit(e).cast("long"))
        for e, alpha in enumerate(alpha_permilles)
    ]
    mix_all = mixes[0]
    for m in mixes[1:]:
        mix_all = mix_all.unionByName(m)
    return _materialize_quotas(
        df, mix_all, source_col, id_col, extra_cols=("epoch",)
    )


def _materialize_quotas(
    df: DataFrame,
    mix: DataFrame,
    source_col: str,
    id_col: str,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Turn a (source, n_docs, quota) plan into the concrete drawn list
    with multiplicity — the shared second half of the mixture family:
    rank each source's docs on the md5 ring (distributed grouped
    row_number, one balanced range exchange), broadcast-join the quota
    table, spread quota q as q div n copies + one extra for the first
    q mod n ring positions (Σ n_copies = q per source). Output:
    (id, source, sample_rank, n_copies) for drawn docs.

    ``extra_cols`` names additional ``mix`` columns carried through to
    the output (e.g. an epoch tag): a mix with several rows per source
    fans each ranked doc out once per row — how
    :func:`mixture_build_epochs` materializes every epoch's quota
    against ONE shared ranking."""
    from flyq_spark.operators.ranking import grouped_row_number

    h = _id_hash(id_col)
    ranked = grouped_row_number(
        df.select(id_col, source_col).withColumn("_mbh", h),
        [source_col],
        [F.col("_mbh").asc(), F.col(id_col).asc()],
        rank_col="sample_rank",
    )
    base = F.call_function("div", F.col("quota"), F.col("n_docs"))
    extra = F.when(
        F.col("sample_rank") <= F.col("quota") % F.col("n_docs"), 1
    ).otherwise(0)
    # Null-SAFE join on the source key: a NULL source is a real group
    # (temperature_mix's groupBy planned it a quota) and a plain
    # on-name join would silently drop its ENTIRE quota, breaking the
    # Σ n_copies = budget theorem (the _restore_all_groups discipline,
    # impute.py). Marker-alias + eqNullSafe + drop keeps one output col.
    mix_m = mix.select(
        F.col(source_col).alias("_mb_src"), "n_docs", "quota", *extra_cols
    )
    return (
        ranked.join(
            F.broadcast(mix_m),
            on=F.col(source_col).eqNullSafe(F.col("_mb_src")),
        )
        .withColumn("n_copies", (base + extra).cast("long"))
        .where(F.col("n_copies") >= 1)
        .select(*extra_cols, id_col, source_col, "sample_rank", "n_copies")
    )


def manual_mixture_build(
    df: DataFrame,
    weights: dict,
    budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hand-specified training mixture (The Pile / LLaMA recipe style:
    "wikipedia 4.5%, code 7%, web 60%" as explicit per-source weights)
    — the editorial sibling of :func:`mixture_build`'s n^α rule. The
    caller's integer ``weights`` dict IS the mixture: budget
    apportions over the listed sources by largest remainder
    (Σ quota = budget exactly, the family theorem), each source's
    quota spreads over its md5 ring with multiplicity (upsampling when
    quota > n_docs, deterministic top-q when quota ≤ n_docs).

    Contract edges, all loud or explicit:
    - sources present in ``df`` but NOT in ``weights`` are EXCLUDED
      (weight 0 is the recipe's statement, not an accident — a recipe
      lists what goes in the pot);
    - a weighted source with NO documents raises in-plan
      (``raise_error``): its quota is undeliverable and silently
      re-apportioning it would train a different mixture than the one
      the recipe states;
    - weights must be non-negative ints, at least one positive;
      a ``None`` key weights the NULL-source group (eqNullSafe joins
      end-to-end, the r11 audit-net discipline).

    Plan: |weights|-row local table broadcast against the |sources|
    counts, the quota math on that human-scale table, then ONE grouped
    row_number range exchange + broadcast quota join over the data —
    identical scale shape to ``mixture_build``. Output: (id, source,
    sample_rank, n_copies), Σ n_copies = budget."""
    if not weights:
        raise ValueError("weights must be a non-empty {source: int} dict")
    for s, wv in weights.items():
        if not isinstance(wv, int) or isinstance(wv, bool) or wv < 0:
            raise ValueError(
                f"weights must be non-negative ints: {s!r}={wv!r}"
            )
    if all(wv == 0 for wv in weights.values()):
        raise ValueError("at least one weight must be positive")
    if budget < 0:
        raise ValueError(f"budget must be >= 0: {budget}")
    spark = df.sparkSession
    pos = [(s, int(wv)) for s, wv in weights.items() if wv > 0]
    wdf = spark.createDataFrame(
        pos, schema=f"`{source_col}` string, weight long"
    )
    counts = df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    ).select(F.col(source_col).alias("_mm_src"), "n_docs")
    # weights LEFT JOIN counts: an unmatched recipe line surfaces as a
    # NULL n_docs — turned into an in-plan raise (quota undeliverable).
    weighted = (
        wdf.join(
            counts,
            on=F.col(source_col).eqNullSafe(F.col("_mm_src")),
            how="left",
        )
        .withColumn(
            "n_docs",
            F.when(
                F.col("n_docs").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "manual_mixture_build: weighted source has no"
                            " documents: "
                        ),
                        F.coalesce(
                            F.col(source_col).cast("string"), F.lit("NULL")
                        ),
                    )
                ).cast("long"),
            ).otherwise(F.col("n_docs")),
        )
        .select(source_col, "n_docs", "weight")
    )
    mix = _apportion(weighted, budget, source_col).select(
        source_col, "n_docs", "quota"
    )
    return _materialize_quotas(df, mix, source_col, id_col)


def chat_turn_offsets(
    df: DataFrame,
    turns_col: str = "turns",
    id_col: str = "doc_id",
    loss_roles: tuple = ("assistant",),
) -> DataFrame:
    """Per-turn token offsets for instruction/SFT data under the
    canonical chat rendering — the LOSS-MASK plumbing: supervised
    fine-tuning trains only on the assistant turns, so the pack writer
    needs every turn's token start and length inside the rendered
    conversation to emit the mask alongside the tokens.

    Rendering contract (deterministic, engine-free): each turn
    contributes n_words(content) + 2 tokens — the ``<|role|>`` open
    tag and the ``<|end|>`` close tag are one token each, words are
    whitespace tokens (empty content still costs the 2 tag tokens).
    ``tok_start`` is the running total of prior turns (0-based), so
    ``zip(tok_start, n_tokens)`` over ``is_loss = 1`` rows IS the loss
    mask, and the last turn's ``tok_start + n_tokens`` is the rendered
    conversation's token length (pack_documents' n_tokens input).

    Plan: one posexplode of the turns array (narrow) and ONE window
    sum partitioned by the conversation id — the high-cardinality key,
    so sort groups are conversation-sized, never data-sized. Output:
    (id, turn_idx, role, n_tokens, tok_start, is_loss) with is_loss a
    BIGINT 0/1 (hash-stable across engines)."""
    ex = df.select(
        F.col(id_col), F.posexplode(F.col(turns_col))
    ).select(
        id_col,
        F.col("pos").cast("long").alias("turn_idx"),
        F.col("col.role").alias("role"),
        F.col("col.content").alias("_content"),
    )
    # NULL content is an empty turn (the 2 tag tokens still render) —
    # without the coalesce a NULL would poison the running offsets of
    # every LATER turn in the conversation
    nt = (
        F.size(
            F.array_remove(
                F.split(F.coalesce(F.col("_content"), F.lit("")), "\\s+"), ""
            )
        )
        + 2
    ).cast("long")
    w = Window.partitionBy(id_col).orderBy("turn_idx")
    return (
        ex.withColumn("n_tokens", nt)
        .withColumn(
            "tok_start",
            F.coalesce(
                F.sum("n_tokens").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn(
            "is_loss",
            F.when(
                F.col("role").isin(list(loss_roles)), 1
            ).otherwise(0).cast("long"),
        )
        .select(id_col, "turn_idx", "role", "n_tokens", "tok_start", "is_loss")
    )


def validate_chat(
    df: DataFrame,
    turns_col: str = "turns",
    id_col: str = "doc_id",
) -> DataFrame:
    """Chat-transcript hygiene validation — the gate an SFT/RLHF ingest
    runs BEFORE chat_turn_offsets renders anything: a conversation
    whose roles do not alternate, that opens mid-dialogue, that ends on
    a user turn, or that carries empty turns produces silently wrong
    loss masks (the assistant span absorbs the next user turn) and is
    cheaper to reject than to debug downstream.

    Policy checked (the common chat-template contract):
    - opens with ``system`` or ``user``;
    - adjacent turns never repeat a role (system/user/assistant
      alternation — the repeat count is reported, not just a flag);
    - closes on an ``assistant`` turn (a trailing user turn trains
      nothing and desyncs pack boundaries);
    - no empty/NULL-content turns (each still renders 2 tag tokens, so
      they silently dilute the loss mask);
    - at least 2 turns (something to learn from).

    Output per conversation: (id, n_turns, n_empty, n_role_repeats,
    starts_ok, ends_ok, is_valid) — counts and 0/1 flags, all BIGINT.
    A NULL turns array is an empty conversation (all counts 0,
    invalid).

    Plan: a pure zero-shuffle projection — every check is a HOF
    (zip_with of the array against its own 1-shift + filter + size)
    over the in-row turns array, entirely evaluated where the row
    already lives. At 100 TB this is a single narrow scan; there is no
    cheaper shape for a per-row audit."""
    turns = F.col(turns_col)
    n = F.size(turns)  # -1 for NULL array
    n_turns = F.when(turns.isNull(), F.lit(0)).otherwise(n).cast("long")
    empty_turn = lambda t: F.trim(F.coalesce(t["content"], F.lit(""))) == ""
    n_empty = F.when(turns.isNull(), F.lit(0)).otherwise(
        F.size(F.filter(turns, empty_turn))
    ).cast("long")
    # adjacent-role repeats: zip turns[0..n-2] with turns[1..n-1]
    repeats = F.size(
        F.filter(
            F.zip_with(
                F.slice(turns, 1, F.greatest(n - 1, F.lit(0))),
                F.slice(turns, 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: a["role"] == b["role"],
            ),
            lambda x: x,
        )
    )
    n_repeats = F.when(turns.isNull() | (n < 2), F.lit(0)).otherwise(
        repeats
    ).cast("long")
    starts_ok = F.when(
        turns.isNull() | (n == 0), F.lit(0)
    ).otherwise(
        turns[0]["role"].isin("system", "user").cast("int")
    ).cast("long")
    ends_ok = F.when(
        turns.isNull() | (n == 0), F.lit(0)
    ).otherwise(
        (F.element_at(turns, -1)["role"] == "assistant").cast("int")
    ).cast("long")
    return df.select(
        F.col(id_col),
        n_turns.alias("n_turns"),
        n_empty.alias("n_empty"),
        n_repeats.alias("n_role_repeats"),
        starts_ok.alias("starts_ok"),
        ends_ok.alias("ends_ok"),
        (
            (n_turns >= 2)
            & (n_empty == 0)
            & (n_repeats == 0)
            & (starts_ok == 1)
            & (ends_ok == 1)
        ).cast("long").alias("is_valid"),
    )


def preference_pairs(
    scored: DataFrame,
    group_cols: tuple,
    id_col: str = "doc_id",
    reward_col: str = "reward",
    min_margin: int = 1,
) -> DataFrame:
    """Preference-pair assembly — the DPO/RLHF data shape: within each
    group (a prompt cluster: responses to the same prompt, docs from
    the same stratum), pair the highest-reward member as ``chosen``
    against the lowest-reward member as ``rejected``, keeping only
    pairs whose reward margin clears ``min_margin`` (near-tie pairs
    teach a preference model noise).

    Determinism contract: the reward must be an exact integer (permille
    a fluency/quality score upstream, as the ppl_select family does);
    ties break by id through lexicographic struct ordering — max takes
    the LARGEST id among reward-tied chosen candidates, min the
    SMALLEST among rejected, so the pair is a pure function of the
    group's contents on any engine/partitioning. Single-member groups
    and groups whose best == worst row drop (no self-pairs).

    Plan: ONE map-side-combined groupBy over the group key carrying two
    struct max/min aggregates — no window, no self-join; at 100 TB the
    shuffle is |groups| rows of fixed width. Output: (*group_cols,
    chosen_id, rejected_id, chosen_reward, rejected_reward, margin)."""
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    if min_margin < 1:
        raise ValueError(f"min_margin must be >= 1, got {min_margin}")
    r = F.col(reward_col).cast("long")
    pair = F.struct(r.alias("r"), F.col(id_col).alias("i"))
    agg = scored.groupBy(*group_cols).agg(
        F.max(pair).alias("_hi"),
        F.min(pair).alias("_lo"),
    )
    return (
        agg.select(
            *group_cols,
            F.col("_hi.i").alias("chosen_id"),
            F.col("_lo.i").alias("rejected_id"),
            F.col("_hi.r").alias("chosen_reward"),
            F.col("_lo.r").alias("rejected_reward"),
            (F.col("_hi.r") - F.col("_lo.r")).alias("margin"),
        )
        .where(
            (F.col("chosen_id") != F.col("rejected_id"))
            & (F.col("margin") >= F.lit(int(min_margin)))
        )
    )


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rate_permille: int = 500,
    seed: str | int = 0,
    prefix_tok: str = "<fim_prefix>",
    suffix_tok: str = "<fim_suffix>",
    middle_tok: str = "<fim_middle>",
) -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al. 2022, "FIM"):
    rewrite a deterministic fraction of documents into the PSM order —
    ``<fim_prefix> P <fim_suffix> S <fim_middle> M`` — so an
    autoregressive model learns to infill. Everything RNG-shaped is a
    pure function of (seed, id), the corpus-prep discipline of this
    module:

    - the apply COIN is the md5 coin: h60(md5("{seed}:fim:" + id))
      mod 1000 < rate_permille — document membership never depends on
      partitioning, other rows, or a resumed job's RNG state;
    - the split points are hash-derived word positions: a =
      h60("{seed}:a:") mod (n+1), b = a + h60("{seed}:b:") mod
      (n−a+1), so 0 ≤ a ≤ b ≤ n and every (prefix, middle, suffix)
      word split — including empty middle/prefix/suffix — occurs;
    - output token count is exactly n + 3 (the three sentinels),
      preserving pack_documents' budget arithmetic predictably.

    Documents with no words, NULL text, or a NULL id pass through
    unchanged (fim_applied = 0; a NULL id has no hash, and the two
    engines disagree on NULL concat — the contract sidesteps it).
    Pure projection: zero shuffles, fully oracle-replayable. Output:
    (id, fim_applied BIGINT 0/1, text_out)."""
    if not 0 <= int(rate_permille) <= 1000:
        raise ValueError(
            f"rate_permille must be in 0..1000, got {rate_permille}"
        )

    def h60(salt: str) -> Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{seed}:{salt}:"), F.col(id_col).cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")

    words = F.array_remove(
        F.split(F.coalesce(F.col(text_col), F.lit("")), "\\s+"), ""
    )
    # bind the words array once (HOF-reference discipline, _word_ngrams)
    out = df.withColumn("_w", words)
    n = F.size(F.col("_w"))
    a = h60("a") % (n.cast("long") + 1)
    b = a + h60("b") % (n.cast("long") - a + 1)
    coin = (h60("fim") % 1000) < F.lit(int(rate_permille))
    apply = (
        F.col(id_col).isNotNull() & (n >= 1) & coin
    )
    psm = F.array_join(
        F.concat(
            F.array(F.lit(prefix_tok)),
            F.slice(F.col("_w"), 1, a.cast("int")),
            F.array(F.lit(suffix_tok)),
            F.slice(
                F.col("_w"), (b + 1).cast("int"), (n.cast("long") - b).cast("int")
            ),
            F.array(F.lit(middle_tok)),
            F.slice(F.col("_w"), (a + 1).cast("int"), (b - a).cast("int")),
        ),
        " ",
    )
    return out.select(
        F.col(id_col),
        F.when(apply, 1).otherwise(0).cast("long").alias("fim_applied"),
        F.when(apply, psm).otherwise(F.col(text_col)).alias("text_out"),
    )
