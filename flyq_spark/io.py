"""Fixture-table reader with timestamp normalization.

The driver fixtures mix parquet timestamp physical types: ``events.ts``
is TIMESTAMP(NANOS) — which Spark's parquet reader rejects outright
(PARQUET_TYPE_ILLEGAL) — and the TPC-H date columns are TIMESTAMP_NTZ.
Normalize both to session-TZ (UTC) TIMESTAMP at microsecond precision:

- nanos: read as long via ``spark.sql.legacy.parquet.nanosAsLong``, then
  floor-divide to micros with integer DIV (a double division would lose
  precision above 2^53 ns) — the same truncation DuckDB's reader applies,
  so oracle comparisons see identical values;
- ntz: cast to TIMESTAMP under the UTC session zone (identity on the
  wall-clock value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TS_COLS = {"ts", "o_orderdate", "l_shipdate"}


def read_documents(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
) -> DataFrame:
    """Ingest a documents-shaped corpus from any of the supported batch
    formats — real pipelines arrive as JSONL/CSV dumps as often as
    parquet. Schema is explicit (never inferSchema: a schema-inference
    pass doubles the read at 100 TB and can mistype sparse columns).

    Default schema matches the fixture ``documents`` table.
    """
    schema = schema or "doc_id long, text string, lang string, source string, n_chars long"
    if fmt == "parquet":
        return spark.read.schema(schema).parquet(path)
    if fmt in ("json", "jsonl"):
        return spark.read.schema(schema).json(path)
    if fmt == "csv":
        # multiLine: documents legitimately contain newlines; without it
        # a quoted multi-line field silently parses into null rows
        return (
            spark.read.schema(schema)
            .option("header", "true")
            .option("multiLine", "true")
            # distinguish '' from NULL on read: CSV's default collapses
            # an empty field to null, silently turning empty documents
            # into missing ones after a CSV hop.
            # FORMAT BREAK (v0.5): files written before the \N convention
            # encoded NULL as an unquoted empty field; those now read back
            # as '' here. Deliberate — mapping unquoted empty to NULL
            # would re-conflate the two cases this convention separates.
            # Re-export legacy CSV via write_documents once to migrate.
            .option("emptyValue", "")
            .option("nullValue", "\\N")
            .csv(path)
        )
    if fmt == "orc":
        return spark.read.schema(schema).orc(path)
    if fmt == "xml":
        # Spark 4 native XML. Unlike CSV, no null convention is needed:
        # an absent element reads as NULL, an empty element as '' — the
        # distinction survives for free, and <>&-escaping plus embedded
        # newlines round-trip losslessly.
        return (
            spark.read.schema(schema)
            .format("xml")
            .option("rowTag", "doc")
            .load(path)
        )
    raise ValueError(
        f"unsupported format {fmt!r} (parquet|json|jsonl|csv|orc|xml)"
    )


def read_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # NTZ->TIMESTAMP casts interpret wall clocks in the session zone;
        # pin UTC so epoch-micros outputs match the oracle regardless of
        # which session the driver hands us.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    for name, dtype in df.dtypes:
        if name not in TS_COLS:
            continue
        if dtype == "bigint":  # nanos-as-long
            df = df.withColumn(
                name, F.expr(f"timestamp_micros(CAST({name} DIV 1000 AS BIGINT))")
            )
        elif dtype == "timestamp_ntz":
            df = df.withColumn(name, F.col(name).cast("timestamp"))
    return df


def write_documents(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Export a corpus in any supported batch format — the write side of
    ``read_documents`` (training pipelines hand shards to downstream
    consumers as JSONL as often as parquet).

    Scale governance is explicit: ``max_records_per_file`` bounds file
    sizes (the same ``maxRecordsPerFile`` lever the engine's segment
    rotation uses) and ``partition_by`` lays out hive partitions so
    downstream filters prune directories. CSV writes quote/escape
    embedded delimiters and newlines (default Spark CSV options), so
    text round-trips losslessly through every format."""
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "parquet":
        w.parquet(path)
    elif fmt in ("json", "jsonl"):
        w.json(path)
    elif fmt == "csv":
        # emptyValue '""' writes empty strings QUOTED so the reader can
        # tell them from null (unquoted empty / \\N)
        w.option("header", "true").option("emptyValue", '""').option(
            "nullValue", "\\N"
        ).csv(path)
    elif fmt == "orc":
        w.orc(path)
    elif fmt == "xml":
        w.format("xml").option("rowTag", "doc").save(path)
    else:
        raise ValueError(
            f"unsupported format {fmt!r} (parquet|json|jsonl|csv|orc|xml)"
        )


#: widening ladder for unify_schemas — a type unifies to the first
#: entry that both sides reach by PURE widening (no precision loss)
_WIDENING_ORDER = ("tinyint", "smallint", "int", "bigint", "float", "double")


def unify_schemas(dfs: list[DataFrame]) -> DataFrame:
    """Union heterogeneous frames BY NAME with safe type widening — the
    schema-evolution ingest step for a directory of parquet drops whose
    producers added columns / widened ints over time. Columns missing
    from a frame fill as NULL; integer widths widen along the standard
    ladder (tinyint→…→bigint) and int+float unify to double; any other
    type mismatch (string vs int, struct changes) raises with the
    column and both types named — silent casts are how ingest corrupts
    a warehouse.

    Pure projection + unionByName: no shuffle, no data pass beyond the
    union itself; scales as a scan."""
    if not dfs:
        raise ValueError("unify_schemas needs at least one frame")
    target: dict[str, str] = {}
    order: list[str] = []
    for df in dfs:
        for f in df.schema.fields:
            t = f.dataType.simpleString()
            if f.name not in target:
                target[f.name] = t
                order.append(f.name)
                continue
            cur = target[f.name]
            if cur == t:
                continue
            if cur in _WIDENING_ORDER and t in _WIDENING_ORDER:
                hi = max(_WIDENING_ORDER.index(cur), _WIDENING_ORDER.index(t))
                if (cur in _WIDENING_ORDER[4:]) != (t in _WIDENING_ORDER[4:]):
                    # int/float mix: double holds every int up to 2^53,
                    # so int32-and-below widen losslessly — but a BIGINT
                    # side can exceed 2^53 and would round SILENTLY,
                    # exactly the corruption this function refuses
                    if "bigint" in (cur, t):
                        raise ValueError(
                            f"unify_schemas: column {f.name!r} mixes "
                            f"{cur} and {t} — bigint does not fit a "
                            "double losslessly (2^53); cast explicitly "
                            "upstream"
                        )
                    target[f.name] = "double"
                else:
                    target[f.name] = _WIDENING_ORDER[hi]
                continue
            raise ValueError(
                f"unify_schemas: column {f.name!r} is {cur} in one frame "
                f"and {t} in another — not a pure widening; cast "
                "explicitly upstream"
            )
    aligned = [
        df.select(
            *[
                (
                    F.col(name).cast(target[name])
                    if name in df.columns
                    else F.lit(None).cast(target[name])
                ).alias(name)
                for name in order
            ]
        )
        for df in dfs
    ]
    out = aligned[0]
    for nxt in aligned[1:]:
        out = out.unionByName(nxt)
    return out
