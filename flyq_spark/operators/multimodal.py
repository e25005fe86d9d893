"""Multimodal (image/audio/video) column handling [EXT].

Driver-mandated extension: treat media as opaque ``binary`` payload
columns with typed metadata, content-addressed by sha256 — the layout a
100 TB multimodal training pipeline wants (payload bytes stay columnar
and prunable; metadata is a narrow struct you can filter on without
touching payloads; the content id deduplicates storage and joins across
modalities).

The decode/feature kernels are Arrow-batched ``mapInPandas`` with real
schemas, partitioning, and batch shapes; the pixel/sample decoding itself
is STUBBED (this container has no image/audio libraries) behind
``_decode_stub`` — a clearly-marked deterministic fake so the Spark-side
plumbing is fully testable. Swapping in PIL/torchaudio is a one-function
change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_KINDS = ("image", "audio", "video", "text")

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("content_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def content_id(payload: Column) -> Column:
    """Content address: sha256 hex of the payload bytes."""
    return F.sha2(payload, 256)


def attach_media(
    df: DataFrame, source_col: str, kind: str = "text", mime: str | None = None
) -> DataFrame:
    """Wrap a column as a multimodal payload: binary bytes + metadata
    struct + content id. Pure projection."""
    if kind not in MEDIA_KINDS:
        raise ValueError(f"kind must be one of {MEDIA_KINDS}")
    payload = F.col(source_col).cast("binary")
    return df.withColumns(
        {
            "payload": payload,
            "media_meta": F.struct(
                F.lit(kind).alias("kind"),
                F.octet_length(payload).cast("long").alias("n_bytes"),
                F.lit(mime).cast("string").alias("mime"),
            ),
            "content_id": content_id(payload),
        }
    )


def dedup_by_content(df: DataFrame, id_col: str) -> DataFrame:
    """Storage-level dedup: one surviving row (min id) per content_id —
    same one-shuffle hash-groupBy shape as text exact dedup."""
    return (
        df.groupBy("content_id")
        .agg(F.min(id_col).alias(id_col))
        .join(df, on=["content_id", id_col], how="left_semi")
    )


# ----------------------------------------------------------------------- #
# decode / feature extraction (Arrow-batched; decode kernel stubbed)
# ----------------------------------------------------------------------- #


def _decode_stub(payload: bytes, kind: str, feature_dim: int) -> dict:
    """STUB decoder — deterministic fake in place of a real media decode.

    A real deployment replaces this body with PIL.Image.open /
    soundfile.read / pyav frame sampling (libraries absent from this
    container). The fake derives stable pseudo-dimensions and a
    pseudo-feature vector from the payload digest so tests can pin exact
    values end-to-end through the Arrow batch path.
    """
    digest = hashlib.sha256(payload).digest()
    width = 1 + digest[0]  # 1..256 — stands in for decoded pixel dims
    height = 1 + digest[1]
    n_frames = 1 + digest[2] % 16 if kind == "video" else 1
    feature = [digest[i % len(digest)] / 255.0 for i in range(feature_dim)]
    return {"width": width, "height": height, "n_frames": n_frames, "feature": feature}


def extract_features(
    df: DataFrame,
    kind: str = "image",
    feature_dim: int = 8,
    batch_size_hint: int = 1024,
) -> DataFrame:
    """Decode + featurize payloads via ``mapInPandas`` (Arrow batches of
    whole payload rows — the right boundary for media kernels: one Python
    call per batch, bytes never row-pickled). Input needs
    payload/content_id (see attach_media). Partition-parallel; no shuffle.
    """
    import pandas as pd  # noqa: F401 (documents the batch type)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for cid, payload in zip(pdf["content_id"], pdf["payload"]):
                d = _decode_stub(bytes(payload), kind, feature_dim)
                out.append(
                    (cid, kind, d["width"], d["height"], d["n_frames"], d["feature"])
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return df.select("content_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 8) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index
    (the decode of each frame is the stubbed kernel above). Demonstrates
    the explode-then-decode layout that keeps per-frame work partition-
    parallel instead of per-video sequential."""
    feats = extract_features(df, kind="video")
    return feats.select(
        "content_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


# ----------------------------------------------------------------------- #
# perceptual near-dup (dHash over the decoded luma grid)
# ----------------------------------------------------------------------- #

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("content_id", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def _luma_grid_stub(payload: bytes, rows: int = 8, cols: int = 9):
    """STUB luma downsample — deterministic, LOCALITY-PRESERVING fake in
    place of a real decode+resize (PIL's ``convert('L').resize((9, 8))``
    in a real deployment). The payload bytes are treated as the decoded
    sample stream and mean-pooled into a rows x cols grid, so payloads
    that differ in a few bytes get nearly identical grids — unlike a
    digest-derived fake, which would avalanche and make "near" vacuous.
    """
    import numpy as np

    raw = np.frombuffer(payload, dtype=np.uint8)
    if raw.size == 0:
        raw = np.zeros(rows * cols, dtype=np.uint8)
    if raw.size < rows * cols:
        raw = np.tile(raw, (rows * cols + raw.size - 1) // raw.size)
    return np.array(
        [c.mean() for c in np.array_split(raw, rows * cols)], dtype=np.float64
    ).reshape(rows, cols)


def perceptual_hash(df: DataFrame) -> DataFrame:
    """64-bit dHash per payload — the perceptual fingerprint image
    pipelines dedup on (difference hash: bit (r, c) = grid[r][c+1] >
    grid[r][c] over an 8x9 luma grid; gradient direction survives
    re-encoding/resizing, which is why dHash/pHash families beat
    content_id sha256 for NEAR-duplicate media). Decode is the stubbed
    kernel above; the Arrow ``mapInPandas`` boundary, schema, and
    partition-parallel batch shape are the real deployment's.

    Input needs (content_id, payload) — see ``attach_media``. One
    Python call per Arrow batch; ``fan_out`` guards the kernel against
    single-row-group inputs (a no-op once data arrives as many splits —
    at any real scale — but without it a one-file corpus pins ALL
    hashing onto one core). Output: (content_id, phash) with phash an
    int64 (bit 63 may set the sign — callers XOR and popcount, they
    never compare magnitudes)."""
    from flyq_spark.operators.util import fan_out

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            hashes = []
            for payload in pdf["payload"]:
                g = _luma_grid_stub(bytes(payload))
                bits = (g[:, 1:] > g[:, :-1]).flatten()
                h = np.uint64(0)
                for b in bits:
                    h = (h << np.uint64(1)) | np.uint64(bool(b))
                hashes.append(np.int64(h))
            yield pd.DataFrame(
                {"content_id": pdf["content_id"], "phash": hashes}
            )

    return fan_out(df.select("content_id", "payload")).mapInPandas(
        run, PHASH_SCHEMA
    )


def phash_neardup_pairs(
    hashes: DataFrame, max_hamming: int = 8, bands: int = 8
) -> DataFrame:
    """Near-duplicate media pairs from 64-bit perceptual hashes: banded
    Hamming LSH (a pair collides when some band's 64/bands bits match
    exactly — by pigeonhole, every pair within ``max_hamming <
    bands`` differing bits is caught by SOME band, so recall is 1.0 in
    that regime, probabilistic above it) + exact popcount verify on
    candidates only. Same banded equi-join shape as SimHash: shuffle
    carries |media| x bands small rows, never n^2 comparisons; all
    bit arithmetic is JVM-side codegen.

    Output: (id_a, id_b, hamming) on content_id, id_a < id_b."""
    if 64 % bands:
        raise ValueError(f"bands={bands} must divide 64")
    width = 64 // bands
    mask = (1 << width) - 1
    banded = hashes.select(
        F.col("content_id"),
        F.col("phash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        (
                            F.shiftrightunsigned(F.col("phash"), i * width)
                            .bitwiseAND(F.lit(mask))
                        ).alias("bits"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("_bb"),
    ).select("content_id", "phash", "_bb.band", "_bb.bits")
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
    return (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bits") == F.col("b.bits"),
                F.col("a.content_id") < F.col("b.content_id"),
            ],
        )
        .select(
            F.col("a.content_id").alias("id_a"),
            F.col("b.content_id").alias("id_b"),
            ham.cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
