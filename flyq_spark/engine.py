"""FlyQEngine — the engine facade (reference: LogEngine,
flyq-server/src/core/log_engine.rs:17-23).

Spark-first restatement of the FlyQ broker:

- one hive-partitioned parquet table per topic
  (``topic_<name>/partition=<id>/*.parquet``); parquet footer min/max
  stats on ``offset`` replace the sparse index
  (flyq-server/src/core/segment.rs:125-154);
- produce = route + dense offset assignment + partitioned append
  (log_engine.rs:60-70, topic.rs:76-88, partition.rs:107-142);
- consume/stream = predicate-pushdown point/range scans
  (log_engine.rs:75-102, partition.rs:144-165);
- consumer-group offsets = small JSON control state (mirrors the
  reference's ``consumer_offsets.json``, offset_tracker.rs:36-54) with
  the topic-scope fix (quirk Q3) and durable-at-commit semantics
  (stronger than the reference's 5 s dirty flush, runtime/flush.rs:9-39);
- watermarks/lag/health = O(1) metadata reads (partition_state.rs:4-8)
  — the scan-based DataFrame forms live in ``operators/watermarks.py``;
- retention = file-granular deletes mirroring FlyQ's segment-granular
  deletes (partition.rs:225-308), keyed on data timestamps (quirk Q5).

Concurrency contract: single writer per topic (the reference is stricter —
one global engine mutex serializes every op, types.rs:4; we only require
produce/retention on the *same topic* not to race). Reads are snapshot-
isolated by Spark's plan-time file listing, the analog of the reference's
Arc-based deferred deletion (segment.rs:336-351).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Iterable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from flyq_spark import storage
from flyq_spark.config import EngineConfig
from flyq_spark.operators.offsets import assign_offsets
from flyq_spark.operators.routing import keyed_partition, route
from flyq_spark.schemas import CONSUMER_OFFSETS_SCHEMA, LOG_SCHEMA, MESSAGE_SCHEMA

_OFFSETS_FILE = "consumer_offsets.json"


class UnknownTopic(KeyError):
    """Commit to a nonexistent topic errors (log_engine.rs:165-170)."""


class FlyQEngine:
    """Engine facade holding a SparkSession + base directory catalog."""

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        config: EngineConfig | None = None,
    ) -> None:
        self.spark = spark
        self.base_dir = base_dir
        self.config = config or EngineConfig()
        os.makedirs(os.path.join(base_dir, storage.META_DIR), exist_ok=True)
        # Startup recovery (log_engine.rs:26-57): control state is two tiny
        # JSON files; log data needs no recovery scan (parquet footers are
        # self-describing).
        self._offsets: dict[str, dict[str, dict[int, int]]] = self._load_offsets()

    # ------------------------------------------------------------------ #
    # topic management
    # ------------------------------------------------------------------ #

    def create_topic(
        self,
        topic: str,
        partitions: int | None = None,
        retention_ms: int | None = None,
        retention_bytes: int | None = None,
    ) -> None:
        """Create a topic directory + meta (log_engine.rs:105-131).
        ``retention_ms`` / ``retention_bytes`` are PER-TOPIC config
        overrides (the Kafka topic-config pattern): persisted in the
        topic meta and preferred over the engine defaults whenever
        retention/maintenance runs without explicit arguments."""
        if partitions is None:
            partitions = self.config.default_partitions
        if self.topic_exists(topic):
            return
        for p in range(partitions):
            os.makedirs(storage.partition_dir(self.base_dir, topic, p), exist_ok=True)
        meta = {
            "partitions": partitions,
            "log_end_offsets": {},
            "low_watermarks": {},
            "rr_cursor": 0,
        }
        config = {}
        if retention_ms is not None:
            config["retention_ms"] = int(retention_ms)
        if retention_bytes is not None:
            config["retention_bytes"] = int(retention_bytes)
        if config:
            meta["config"] = config
        storage.save_topic_meta(self.base_dir, topic, meta)

    def describe_topic(self, topic: str) -> dict:
        """One-call topic summary (the CLI ``describe`` payload):
        partition count, per-partition (low, high, leo), per-topic
        config overrides, and file/byte totals — all from meta + footer
        stats, no data scan."""
        meta = self._meta(topic)
        n = int(meta["partitions"])
        parts = {}
        n_files = 0
        n_bytes = 0
        for p in range(n):
            low, high, leo = self._watermark_from_meta(meta, p)
            stats = storage.partition_file_stats(self.base_dir, topic, p)
            n_files += len(stats)
            n_bytes += sum(st.size_bytes for st in stats)
            parts[p] = {"low": low, "high": high, "log_end_offset": leo,
                        "files": len(stats)}
        return {
            "topic": topic,
            "partitions": n,
            "config": dict(meta.get("config", {})),
            "total_files": n_files,
            "total_bytes": n_bytes,
            "partition_state": parts,
        }

    def topic_exists(self, topic: str) -> bool:
        return storage.load_topic_meta(self.base_dir, topic) is not None

    def list_topics(self) -> list[str]:
        return storage.list_topics(self.base_dir)

    def topic_partitions(self, topic: str) -> int:
        meta = self._meta(topic)
        return int(meta["partitions"])

    def _meta(self, topic: str) -> dict:
        meta = storage.load_topic_meta(self.base_dir, topic)
        if meta is None:
            raise UnknownTopic(topic)
        return meta

    def delete_topic(self, topic: str) -> None:
        if self.topic_exists(topic):
            shutil.rmtree(storage.topic_dir(self.base_dir, topic))

    # ------------------------------------------------------------------ #
    # produce (A1 = A2/A3 routing + A4 offsets + partitioned append)
    # ------------------------------------------------------------------ #

    def produce(
        self,
        topic: str,
        messages: DataFrame | Iterable[dict[str, Any]],
        method: str = "xxhash64",
        collect_acks: bool | None = None,
    ):
        """Append a batch of messages; auto-creates the topic
        (log_engine.rs:60-70, constants.rs:4).

        ``messages``: a DataFrame with columns key/value/timestamp
        [/headers][/seq], or an iterable of dicts (small driver-side
        batches, the reference's per-message produce shape).

        Returns a list of ``(partition, offset)`` acks in seq order when
        ``collect_acks`` (default for list input), else a dict
        ``{partition: (base_offset, new_log_end_offset)}``.
        """
        if not self.topic_exists(topic):
            if not self.config.auto_create_topics:
                raise UnknownTopic(topic)
            self.create_topic(topic)
        meta = self._meta(topic)
        n = int(meta["partitions"])
        prev_leo = {int(k): int(v) for k, v in meta["log_end_offsets"].items()}
        rr_cursor = int(meta.get("rr_cursor", 0))

        # INT96 timestamps (Spark's default parquet output) carry no usable
        # footer min/max stats; retention (quirk Q5) reads them. Harmless
        # no-op when the session factory already set it.
        try:
            self.spark.conf.set(
                "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
            )
        except Exception:
            pass

        df, is_local, n_keyless = self._as_message_df(messages)
        if collect_acks is None:
            collect_acks = is_local
        if "seq" not in df.columns:
            # Arrival order for a DataFrame batch is Spark's scan order.
            # Stamp a DENSE (0..m-1) seq plus the keyless round-robin
            # rank so assignment and cursor advance are bit-exact with
            # the reference (topic.rs:77-87): one tiny per-spark-partition
            # counts job, then a narrow Arrow pass — no shuffle, no window.
            df, _, n_keyless = self._with_dense_seq(df)

        routed = route(df, n, method=method, rr_cursor=rr_cursor)
        assigned = assign_offsets(routed, prev_leo)

        def _write(frame) -> None:
            (
                frame.select([f.name for f in LOG_SCHEMA.fields])
                .repartition(max(1, min(n, 32)), "partition")
                .sortWithinPartitions("partition", "offset")
                .write.mode("append")
                .option("maxRecordsPerFile", str(self.config.max_records_per_file))
                .partitionBy("partition")
                .parquet(storage.topic_dir(self.base_dir, topic))
            )

        acks = None
        if collect_acks:
            # small driver-side batches: materialize acks, then write the
            # (deterministic) plan again for the data files.
            assigned = assigned.persist()
            try:
                counts: dict[int, int] = {}
                acks = []
                for r in (
                    assigned.select("seq", "partition", "offset").orderBy("seq").collect()
                ):
                    p = int(r["partition"])
                    acks.append((p, int(r["offset"])))
                    counts[p] = counts.get(p, 0) + 1
                _write(assigned)
            finally:
                assigned.unpersist()
        elif n <= 64:
            # single pass: per-partition counts ride along with the write
            # action via the Observation API — no separate count job, no
            # persist of the whole batch.
            from pyspark.sql import Observation

            obs = Observation()
            observed = assigned.observe(
                obs,
                *[
                    F.sum(F.when(F.col("partition") == p, 1).otherwise(0)).alias(f"p{p}")
                    for p in range(n)
                ],
            )
            _write(observed)
            got = obs.get
            counts = {
                p: int(got[f"p{p}"] or 0) for p in range(n) if int(got[f"p{p}"] or 0) > 0
            }
        else:  # many-partition topics: one aggregate job + one write job
            assigned = assigned.persist()
            try:
                counts = {
                    int(r["partition"]): int(r["cnt"])
                    for r in assigned.groupBy("partition")
                    .agg(F.count("*").alias("cnt"))
                    .collect()
                }
                _write(assigned)
            finally:
                assigned.unpersist()

        # Commit point: LEO + cursor advance (partition_state.rs:27-29;
        # cursor persistence is stronger than the reference, topic.rs:35).
        # The cursor advances by the KEYLESS row count — the reference
        # increments next_partition only on keyless produces
        # (topic.rs:80-83). Caller-supplied `seq` batches have no keyless
        # rank (n_keyless is None) and use the documented slotted
        # semantics: every row consumes a cycle slot, cursor += total.
        total = 0
        for p, c in counts.items():
            meta["log_end_offsets"][str(p)] = prev_leo.get(p, 0) + c
            total += c
        advance = total if n_keyless is None else n_keyless
        meta["rr_cursor"] = (rr_cursor + advance) % n if n else 0
        storage.save_topic_meta(self.base_dir, topic, meta)
        if collect_acks:
            return acks
        return {
            int(p): (prev_leo.get(int(p), 0), int(meta["log_end_offsets"][str(p)]))
            for p in counts
        }

    def _as_message_df(self, messages) -> tuple[DataFrame, bool, int | None]:
        """Normalize input to a message DataFrame.

        Returns (df, is_local_batch, n_keyless). For local list batches the
        rows carry dense ``seq`` (arrival order) and ``_rr`` (rank among
        KEYLESS rows — the reference's round-robin counter, topic.rs:80-83)
        and ``n_keyless`` is exact. DataFrame input passes through
        (n_keyless=None; produce stamps seq/_rr if absent)."""
        if isinstance(messages, DataFrame):
            df = messages
            for field in ("key", "headers"):
                if field not in df.columns:
                    df = df.withColumn(field, F.lit(None).cast(MESSAGE_SCHEMA[field].dataType))
            return df, False, None
        rows = []
        n_keyless = 0
        for i, m in enumerate(messages):
            ts = m["timestamp"]
            if isinstance(ts, (int, float)):  # epoch millis, the reference unit
                from datetime import datetime, timezone

                ts = datetime.fromtimestamp(ts / 1000.0, tz=timezone.utc)
            key = m.get("key")
            keyless = key is None or len(key) == 0  # quirk Q1: b"" == no key
            rows.append(
                Row(
                    key=key,
                    value=m["value"],
                    timestamp=ts,
                    headers=m.get("headers"),
                    seq=m.get("seq", i),
                    _rr=n_keyless if keyless else None,
                )
            )
            if keyless:
                n_keyless += 1
        from pyspark.sql import types as T

        schema = T.StructType(
            list(MESSAGE_SCHEMA.fields)
            + [
                T.StructField("seq", T.LongType(), False),
                T.StructField("_rr", T.LongType(), True),
            ]
        )
        return self.spark.createDataFrame(rows, schema), True, n_keyless

    def _with_dense_seq(self, df: DataFrame) -> tuple[DataFrame, int, int]:
        """Stamp dense scan-order ``seq`` (0..m-1) and the keyless
        round-robin rank ``_rr`` on a DataFrame batch — the distributed
        restatement of the reference's arrival order + next_partition
        counter (topic.rs:77-87).

        Two narrow passes, NO shuffle and NO window (a 100 TB produce
        batch must not serialize through one reducer):

        1. a per-spark-partition (rows, keyless-rows) count job — the
           collect is O(#partitions) scalars, from which cumulative bases
           are computed on the driver;
        2. ``mapInPandas`` streams each partition's Arrow batches in
           order, stamping ``seq = base[pid] + i`` and, for keyless rows,
           ``_rr = rr_base[pid] + running keyless count``. File-source
           scan order is deterministic, so the two passes agree.

        Returns (stamped_df, total_rows, total_keyless)."""
        import pandas as pd
        from pyspark.sql import types as T

        src = df.drop("_rr").withColumn("_pid", F.spark_partition_id())
        keyless_flag = (
            F.col("key").isNull() | (F.length(F.col("key")) == 0)
        ).cast("long")
        stats = (
            src.groupBy("_pid")
            .agg(F.count("*").alias("_n"), F.sum(keyless_flag).alias("_nk"))
            .collect()
        )
        base: dict[int, int] = {}
        rr_base: dict[int, int] = {}
        acc = kacc = 0
        for r in sorted(stats, key=lambda r: int(r["_pid"])):
            pid = int(r["_pid"])
            base[pid] = acc
            rr_base[pid] = kacc
            acc += int(r["_n"])
            kacc += int(r["_nk"] or 0)

        out_schema = T.StructType(
            [f for f in src.schema.fields]
            + [
                T.StructField("seq", T.LongType(), False),
                T.StructField("_rr", T.LongType(), True),
            ]
        )

        def stamp(batches):
            seq_next = rr_next = None
            for pdf in batches:
                m = len(pdf)
                if m == 0:
                    continue
                pid = int(pdf["_pid"].iloc[0])
                if seq_next is None:
                    seq_next, rr_next = base[pid], rr_base[pid]
                keyless = pdf["key"].map(
                    lambda k: k is None or len(k) == 0
                )
                out = pdf.copy()
                out["seq"] = pd.array(
                    range(seq_next, seq_next + m), dtype="Int64"
                )
                rr_vals = keyless.cumsum() - 1 + rr_next
                out["_rr"] = pd.array(
                    [
                        int(v) if kl else None
                        for v, kl in zip(rr_vals, keyless)
                    ],
                    dtype="Int64",
                )
                seq_next += m
                rr_next += int(keyless.sum())
                yield out

        return src.mapInPandas(stamp, out_schema).drop("_pid"), acc, kacc

    # ------------------------------------------------------------------ #
    # read path (A7/A8/A9 + client stubs A28a-c)
    # ------------------------------------------------------------------ #

    def log(self, topic: str) -> DataFrame:
        """The topic's log table. Partition pruning + footer stats give the
        reference's seek path (partition.rs:148-158) for free.

        The schema is explicit, so an empty topic reads as an empty frame
        without an inference pass — no driver-side directory walk here (a
        pre-listing would double the file-listing cost on object storage
        at scale; Spark's own file index is the only listing)."""
        self._meta(topic)  # raise on unknown topic
        tdir = storage.topic_dir(self.base_dir, topic)
        try:
            df = (
                self.spark.read.schema(LOG_SCHEMA)
                .option("basePath", tdir)
                .parquet(tdir)
            )
            df.schema  # force analysis so path problems surface here
            return df
        except AnalysisException as ex:
            # ONLY the empty-topic case (no files yet) degrades to an
            # empty frame; real read failures (permissions, corrupt
            # listings) must surface, not masquerade as an empty topic
            if "PATH_NOT_FOUND" in str(ex) or "UNABLE_TO_INFER_SCHEMA" in str(ex):
                return self.spark.createDataFrame([], LOG_SCHEMA)
            raise

    def register_views(self, topics: list[str] | None = None) -> list[str]:
        """Expose the broker surface to plain ``spark.sql``: one temp view
        ``flyq_<topic>`` per topic log plus ``flyq_consumer_offsets`` and
        ``flyq_watermarks`` control views — a SQL user can then express
        every read-side client op (point consume, range scan, lag join)
        as a SELECT without touching the Python API. Views are lazy
        DataFrames: the log views inherit partition pruning and footer
        stats, and re-resolve files per query (no snapshot staleness
        beyond Spark's own file-index caching). Topic names may contain
        characters illegal in SQL identifiers ('-', '.'), so view names
        sanitize them to '_' (collisions disambiguate with a numeric
        suffix); a topic whose log fails to register is skipped rather
        than aborting SQL access to every other topic. Returns the view
        names actually registered."""
        import re

        names = []
        registered: list[str] = []
        # Spark temp view names are case-INSENSITIVE by default, so the
        # collision key must be folded — topics 'Events'/'events' would
        # otherwise silently replace each other's views
        taken: set[str] = set()
        for t in topics if topics is not None else self.list_topics():
            name = "flyq_" + re.sub(r"[^A-Za-z0-9_]", "_", t)
            if name.lower() in taken:
                i = 2
                while f"{name}_{i}".lower() in taken:
                    i += 1
                name = f"{name}_{i}"
            try:
                self.log(t).createOrReplaceTempView(name)
            except Exception:
                continue
            taken.add(name.lower())
            names.append(name)
            registered.append(t)
        self.consumer_offsets_df().createOrReplaceTempView("flyq_consumer_offsets")
        names.append("flyq_consumer_offsets")
        # only topics whose log view registered contribute watermark
        # rows — a skipped/vanished topic must not abort the whole call
        # after views were already (partially) registered
        wm_rows = [
            Row(
                topic=t,
                partition=int(p),
                low=int(w[0]),
                high=int(w[1]),
                log_end_offset=int(w[2]),
            )
            for t in registered
            for m in (self._meta(t),)
            for p in range(int(m["partitions"]))
            for w in (self._watermark_from_meta(m, p),)
        ]
        self.spark.createDataFrame(
            wm_rows,
            "topic string, partition int, low long, high long, log_end_offset long",
        ).createOrReplaceTempView("flyq_watermarks")
        names.append("flyq_watermarks")
        return names

    def _clamped_start(self, topic: str, partition: int, offset: int) -> int:
        """Reads clamp at the LOW WATERMARK: ``delete_records`` is a
        LOGICAL truncation (a file straddling the boundary keeps its
        below-cutoff rows on disk until compaction reclaims them), so
        every read path must start at max(offset, low) — otherwise
        truncated records stay readable and contradict the watermark
        triple (Kafka reads below the log start offset are out of
        range; we degrade to clamping, the gentler of the two)."""
        low, _, _ = self.get_watermark(topic, partition)
        return max(int(offset), low)

    def consume(self, topic: str, partition: int, offset: int) -> Row | None:
        """Point read at >= offset; past-end -> None (log_engine.rs:75-102:
        OffsetNotFound degrades to graceful None). Starts no lower than
        the low watermark (see _clamped_start)."""
        offset = self._clamped_start(topic, partition, offset)
        rows = (
            self.log(topic)
            .where((F.col("partition") == partition) & (F.col("offset") >= offset))
            .orderBy("offset")
            .limit(1)
            .collect()
        )
        return rows[0] if rows else None

    # A28a client stub (flyq-client/src/client.rs:181-189)
    consume_from_partition = consume

    def stream_from_offset(self, topic: str, partition: int, offset: int) -> DataFrame:
        """Ordered range scan from offset (partition.rs:144-165); starts
        no lower than the low watermark (see _clamped_start)."""
        offset = self._clamped_start(topic, partition, offset)
        return (
            self.log(topic)
            .where((F.col("partition") == partition) & (F.col("offset") >= offset))
            .orderBy("offset")
        )

    def read_from_offset(
        self, topic: str, partition: int, offset: int, limit: int | None = None
    ) -> list[Row]:
        """Batch materialization of the range scan (partition.rs:166-170)."""
        df = self.stream_from_offset(topic, partition, offset)
        if limit is not None:
            df = df.limit(limit)
        return df.collect()

    def consume_by_key(self, topic: str, key: bytes, method: str = "xxhash64") -> list[Row]:
        """A28b (client.rs:192-199): route the key, then scan only its
        partition (partition pruning) for exact key matches. Routing is
        computed driver-side with the bit-compatible pure-Python XXH64
        (functions/hashing.py, parity-tested against F.xxhash64) — no
        Spark job just to find the partition."""
        n = self.topic_partitions(topic)
        if n == 1:
            p = 0
        elif method == "xxhash64":
            from flyq_spark.functions.hashing import spark_partition_for_key

            p = spark_partition_for_key(key, n)
        else:
            p = int(
                self.spark.range(1)
                .select(keyed_partition(F.lit(key), n, method).alias("p"))
                .collect()[0]["p"]
            )
        low, _, _ = self.get_watermark(topic, p)
        return (
            self.log(topic)
            .where(
                (F.col("partition") == p)
                & (F.col("key") == F.lit(key))
                & (F.col("offset") >= low)
            )
            .orderBy("offset")
            .collect()
        )

    def consume_next(self, topic: str, partition: int, last_seen: int) -> Row | None:
        """A28c (client.rs:202-209): first message strictly after last_seen."""
        return self.consume(topic, partition, last_seen + 1)

    def consume_with_group(
        self, topic: str, partition: int, group: str
    ) -> tuple[int, Row] | None:
        """Read at the committed offset (default 0); does NOT auto-commit
        (log_engine.rs:146-161; committed = next-to-read, quirk Q4)."""
        committed = self.committed_offset(group, topic, partition) or 0
        row = self.consume(topic, partition, committed)
        if row is None:
            return None
        return committed, row

    # ------------------------------------------------------------------ #
    # consumer-group offsets (A11)
    # ------------------------------------------------------------------ #

    def _offsets_path(self) -> str:
        return os.path.join(self.base_dir, storage.META_DIR, _OFFSETS_FILE)

    def _load_offsets(self) -> dict:
        path = self._offsets_path()
        if not os.path.exists(path):
            return {}
        import json

        with open(path) as f:
            raw = json.load(f)
        return {
            g: {t: {int(p): int(o) for p, o in parts.items()} for t, parts in topics.items()}
            for g, topics in raw.items()
        }

    def _save_offsets(self) -> None:
        storage.atomic_write_json(
            self._offsets_path(),
            {
                g: {t: {str(p): o for p, o in parts.items()} for t, parts in topics.items()}
                for g, topics in self._offsets.items()
            },
        )

    def commit_offset(self, group: str, topic: str, partition: int, offset: int) -> None:
        """Upsert; unknown topic errors (log_engine.rs:163-179). Durable at
        commit time — strictly stronger than the reference's 5 s dirty
        flush window (runtime/flush.rs:9-39)."""
        if not self.topic_exists(topic):
            raise UnknownTopic(topic)
        self._offsets.setdefault(group, {}).setdefault(topic, {})[int(partition)] = int(offset)
        self._save_offsets()

    def committed_offset(self, group: str, topic: str, partition: int) -> int | None:
        return self._offsets.get(group, {}).get(topic, {}).get(int(partition))

    def consumer_offsets_df(self) -> DataFrame:
        """Control state as a (broadcastable) DataFrame for join-based lag."""
        rows = [
            Row(group=g, topic=t, partition=int(p), offset=int(o))
            for g, topics in self._offsets.items()
            for t, parts in topics.items()
            for p, o in parts.items()
        ]
        return self.spark.createDataFrame(rows, CONSUMER_OFFSETS_SCHEMA)

    # ------------------------------------------------------------------ #
    # observability (A12/A13/A14)
    # ------------------------------------------------------------------ #

    @staticmethod
    def _watermark_from_meta(meta: dict, partition: int) -> tuple[int, int, int]:
        """Watermark triple from an already-loaded meta dict — loops over
        partitions/topics (describe, lag, views) use this so one
        operation costs ONE meta file read, not one per partition."""
        leo = int(meta["log_end_offsets"].get(str(partition), 0))
        low = int(meta["low_watermarks"].get(str(partition), 0))
        high = leo - 1 if leo > 0 else 0
        return low, high, leo

    def get_watermark(self, topic: str, partition: int) -> tuple[int, int, int]:
        """(low, high, leo) from O(1) metadata (log_engine.rs:133-144).

        Quirk Q6: fresh partition reports (0, 0, 0); after n appends
        (0, n-1, n). LEO survives retention; low advances past deleted
        offsets (partition.rs:285)."""
        return self._watermark_from_meta(self._meta(topic), partition)

    def mirror_topic(self, src: "FlyQEngine", topic: str) -> dict:
        """Replicate a topic from another engine PRESERVING partitions
        and offsets — the MirrorMaker capability (a consumer on the
        mirror resumes at the same committed offsets). One distributed
        read → partitioned write of the source log (no re-routing, no
        offset re-assignment: the columns ARE the layout), then the
        standard crash-recovery path (``repair_topic``) rebuilds
        LEO/low from the copied footers — replication reuses recovery
        instead of a second metadata protocol. Returns the rebuilt
        meta. Idempotence: mirror into a fresh topic (re-mirroring
        appends duplicate files)."""
        src_meta = src._meta(topic)
        if not self.topic_exists(topic):
            self.create_topic(topic, partitions=int(src_meta["partitions"]))
        # same defensive conf produce() sets: an INT96 mirror write
        # would erase footer timestamp stats and kill time retention
        self.spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
        (
            src.log(topic)
            .select([f.name for f in LOG_SCHEMA.fields])
            .repartition(max(1, min(int(src_meta["partitions"]), 32)), "partition")
            .sortWithinPartitions("partition", "offset")
            .write.mode("append")
            .option("maxRecordsPerFile", str(self.config.max_records_per_file))
            .partitionBy("partition")
            .parquet(storage.topic_dir(self.base_dir, topic))
        )
        meta = self.repair_topic(topic)
        # footers alone cannot rebuild everything: per-topic config
        # overrides, the round-robin cursor, and the LEO/low of a
        # partition whose files were fully truncated at the source
        # (zero files but a live watermark triple consumers depend on).
        # Merge those from the SOURCE meta — offsets-preserved means the
        # whole triple, not just what the copied data implies.
        if src_meta.get("config"):
            meta["config"] = dict(src_meta["config"])
        meta["rr_cursor"] = int(src_meta.get("rr_cursor", 0))
        for p in range(int(src_meta["partitions"])):
            key = str(p)
            meta["log_end_offsets"][key] = max(
                int(meta["log_end_offsets"].get(key, 0)),
                int(src_meta["log_end_offsets"].get(key, 0)),
            )
            meta["low_watermarks"][key] = max(
                int(meta["low_watermarks"].get(key, 0)),
                int(src_meta["low_watermarks"].get(key, 0)),
            )
        storage.save_topic_meta(self.base_dir, topic, meta)
        return meta

    def offsets_for_times(self, topic: str, ts_millis: int) -> dict[int, int | None]:
        """Kafka ``offsetsForTimes``: per partition, the earliest offset
        whose timestamp is >= ``ts_millis`` (None when no such record —
        Kafka's null). One pruned scan + tiny partition-key aggregation
        (operators/watermarks.py:offsets_for_times is the dataflow
        form); the timestamp filter prunes row groups via footer
        stats."""
        from pyspark.sql import functions as F

        rows = (
            self.log(topic)
            .where(F.col("timestamp") >= F.timestamp_millis(F.lit(int(ts_millis))))
            .groupBy("partition")
            .agg(F.min("offset").alias("first_offset"))
            .collect()
        )
        found = {int(r["partition"]): int(r["first_offset"]) for r in rows}
        return {
            p: found.get(p) for p in range(self.topic_partitions(topic))
        }

    def get_consumer_lag(self, group: str, topic: str | None = None) -> dict:
        """lag = max(0, high_watermark - committed) per partition, summed —
        the reference formula exactly (log_engine.rs:209:
        hw.saturating_sub(committed), pinned by tests/watermark_apis.rs:
        67-92: 20 msgs at committed=0 -> 19, commit 10 -> 9, commit 19 ->
        0; quirk Q4: hw is the last offset, so this undercounts unread-by-
        one at committed=0 — inherited deliberately). Metadata-side math —
        the scan/join DataFrame form is operators.watermarks.consumer_lag."""
        topics = [topic] if topic is not None else self.list_topics()
        parts_out = []
        total = 0
        for t in topics:
            meta = self._meta(t)
            for p in range(int(meta["partitions"])):
                _, high, leo = self._watermark_from_meta(meta, p)
                committed = self.committed_offset(group, t, p) or 0
                lag = max(0, high - committed)
                total += lag
                parts_out.append(
                    {
                        "topic": t,
                        "partition": p,
                        "committed_offset": committed,
                        "high_watermark": high,
                        "log_end_offset": leo,
                        "lag": lag,
                    }
                )
        return {"group": group, "total_lag": total, "partitions": parts_out}

    def get_partition_health(self, topic: str, partition: int) -> dict:
        """segment_count/size/watermarks (log_engine.rs:226-256;
        last_cleanup is always None in the reference, :246)."""
        stats = storage.partition_file_stats(self.base_dir, topic, partition)
        low, high, leo = self.get_watermark(topic, partition)
        return {
            "topic": topic,
            "partition": partition,
            "segment_count": len(stats),
            "total_size_bytes": sum(s.size_bytes for s in stats),
            "low_watermark": low,
            "high_watermark": high,
            "log_end_offset": leo,
            "last_cleanup": None,
        }

    # ------------------------------------------------------------------ #
    # retention (A15 time + A16 size)
    # ------------------------------------------------------------------ #

    def apply_retention(
        self,
        topic: str,
        now_ms: int | None = None,
        retention_ms: int | None = None,
        retention_bytes: int | None = None,
    ) -> list[str]:
        """File-granular retention, the analog of FlyQ's whole-segment
        deletes (partition.rs:225-308): never the newest file; skip if a
        partition has <= 1 file (partition.rs:236-246); time policy keys on
        the data's own timestamps (quirk Q5) with an explicit logical
        ``now``; size policy deletes oldest-first until under the cap
        (partition.rs:262-270). Advances low_watermark past victims
        (partition.rs:285). Returns deleted file paths."""
        import time as _time

        meta = self._meta(topic)
        topic_cfg = meta.get("config", {})
        if retention_ms is None:
            retention_ms = int(topic_cfg.get("retention_ms", self.config.retention_ms))
        if retention_bytes is None:
            retention_bytes = topic_cfg.get(
                "retention_bytes", self.config.retention_bytes
            )
            retention_bytes = None if retention_bytes is None else int(retention_bytes)
        now_ms = int(_time.time() * 1000) if now_ms is None else now_ms
        cutoff = now_ms - retention_ms
        deleted: list[str] = []
        for p in range(int(meta["partitions"])):
            stats = storage.partition_file_stats(self.base_dir, topic, p)
            if len(stats) <= 1:
                continue
            victims = []
            # oldest-first; the newest file is the "active segment" and is
            # never deleted, so iterate over stats[:-1].
            candidates = stats[:-1]
            total = sum(s.size_bytes for s in stats)
            over_cap = (total - retention_bytes) if retention_bytes is not None else 0
            for s in candidates:
                too_old = s.max_timestamp_ms is not None and s.max_timestamp_ms < cutoff
                too_big = over_cap > 0
                if too_old or too_big:
                    victims.append(s)
                    if too_big:
                        over_cap -= s.size_bytes
                else:
                    # contiguity: deletion stops at the first surviving
                    # file (partition.rs:225-308 deletes oldest-first and
                    # breaks at the first keeper) — deleting a LATER
                    # too-old file past a survivor would advance the low
                    # watermark over still-live older offsets
                    break
            if not victims:
                continue
            new_low = max(
                int(meta["low_watermarks"].get(str(p), 0)),
                max(int(s.max_offset) + 1 for s in victims if s.max_offset is not None),
            )
            for s in victims:
                os.remove(s.path)
                deleted.append(s.path)
            meta["low_watermarks"][str(p)] = new_low
        storage.save_topic_meta(self.base_dir, topic, meta)
        return deleted

    def delete_records(self, topic: str, partition: int, before_offset: int) -> list[str]:
        """Kafka AdminClient ``deleteRecords``: logically truncate a
        partition below ``before_offset`` — low_watermark advances to
        ``before_offset`` immediately (reads clamp there), and files
        that lie ENTIRELY below it are physically removed (file-granular
        like retention; a file straddling the boundary stays until
        compaction or later truncation reclaims it, exactly how Kafka
        keeps the straddling segment). ``before_offset`` beyond the log
        end raises, mirroring Kafka's OFFSET_OUT_OF_RANGE for
        deleteRecords past the high watermark — silently clamping would
        let the low watermark pass LEO and corrupt the watermark triple.
        Returns deleted file paths."""
        meta = self._meta(topic)
        leo = int(meta["log_end_offsets"].get(str(int(partition)), 0))
        if before_offset > leo:
            raise ValueError(
                f"before_offset {before_offset} is beyond the log end "
                f"offset {leo} for {topic}/{partition} (OFFSET_OUT_OF_RANGE)"
            )
        stats = storage.partition_file_stats(self.base_dir, topic, partition)
        deleted: list[str] = []
        for st in stats:
            if st.max_offset is not None and st.max_offset < before_offset:
                os.remove(st.path)
                deleted.append(st.path)
        key = str(int(partition))
        meta["low_watermarks"][key] = max(
            int(meta["low_watermarks"].get(key, 0)), int(before_offset)
        )
        storage.save_topic_meta(self.base_dir, topic, meta)
        return deleted

    # ------------------------------------------------------------------ #
    # recovery (A18/A19 analog)
    # ------------------------------------------------------------------ #

    def repair_topic(self, topic: str) -> dict:
        """Rebuild topic metadata from the data files — the recovery path
        for a crash between parquet write and meta commit (the reference
        re-scans segment tails for the same reason, segment.rs:188-237;
        parquet footers make it a metadata-only read here).

        LEO per partition becomes max(meta, max footer offset + 1) — the
        meta value wins when retention has deleted the newest data ever
        written. Low watermark becomes min(footer min offset) when data
        exists (bounded below by the recorded value, which survives
        retention of everything). Discovers partition dirs beyond the
        recorded count (partial create). Returns the repaired meta."""
        meta = self._meta(topic)
        tdir = storage.topic_dir(self.base_dir, topic)
        n = int(meta["partitions"])
        # a crash mid-compaction leaves .compact_old/.compact_tmp dirs;
        # roll those back before trusting the footer scan
        for name in os.listdir(tdir):
            if name.startswith(".compact_old_p") or name.startswith(".compact_tmp_p"):
                try:
                    p = int(name.rsplit("_p", 1)[1])
                except ValueError:
                    continue
                self._recover_compaction(topic, p)
        for name in os.listdir(tdir):
            if name.startswith("partition="):
                try:
                    n = max(n, int(name.split("=", 1)[1]) + 1)
                except ValueError:
                    pass
        meta["partitions"] = n
        for p in range(n):
            stats = storage.partition_file_stats(self.base_dir, topic, p)
            maxo = max(
                (s.max_offset for s in stats if s.max_offset is not None), default=None
            )
            mino = min(
                (s.min_offset for s in stats if s.min_offset is not None), default=None
            )
            leo = int(meta["log_end_offsets"].get(str(p), 0))
            if maxo is not None and maxo + 1 > leo:
                meta["log_end_offsets"][str(p)] = maxo + 1
            low = int(meta["low_watermarks"].get(str(p), 0))
            if mino is not None and mino > low:
                meta["low_watermarks"][str(p)] = mino
        storage.save_topic_meta(self.base_dir, topic, meta)
        return meta

    # ------------------------------------------------------------------ #
    # maintenance: compaction (A5 analog)
    # ------------------------------------------------------------------ #

    def _compact_paths(self, topic: str, partition: int) -> tuple[str, str, str]:
        """(live, tmp, old) dirs for a compaction swap. tmp/old are
        DOT-PREFIXED siblings inside the topic dir: Spark's file index
        skips '.'/'_' names, so a concurrent log() read can never list
        half a rewrite or parse them as a hive partition value."""
        pdir = storage.partition_dir(self.base_dir, topic, partition)
        tdir = storage.topic_dir(self.base_dir, topic)
        tmp = os.path.join(tdir, f".compact_tmp_p{int(partition)}")
        old = os.path.join(tdir, f".compact_old_p{int(partition)}")
        return pdir, tmp, old

    def _recover_compaction(self, topic: str, partition: int) -> None:
        """Roll back a compaction interrupted mid-swap. The swap is
        rename(live→old); rename(tmp→live); rmtree(old) — a crash
        leaves at most: a stale tmp (before the swap: remove it), a
        missing live dir with old present (between the renames: roll
        OLD back — always safe, compaction is re-runnable), or a
        leftover old after the swap (finish the cleanup). Called before
        every compaction and from repair_topic."""
        pdir, tmp, old = self._compact_paths(topic, partition)
        if os.path.isdir(old):
            if not os.path.isdir(pdir):
                os.rename(old, pdir)
            else:
                shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(tmp):
            shutil.rmtree(tmp, ignore_errors=True)

    def _swap_compacted(self, topic: str, partition: int) -> None:
        """Atomic-per-step directory swap installing a finished rewrite;
        see _recover_compaction for the crash analysis."""
        pdir, tmp, old = self._compact_paths(topic, partition)
        os.rename(pdir, old)
        os.rename(tmp, pdir)
        shutil.rmtree(old, ignore_errors=True)

    def maintain_topic(
        self,
        topic: str,
        now_ms: int | None = None,
        retention_ms: int | None = None,
        retention_bytes: int | None = None,
        compact_above_files: int = 16,
    ) -> dict:
        """One maintenance cycle — the body of the reference's cleanup
        loop (runtime/flush.rs:75-107), run on demand instead of a
        daemon: retention first (whole-file deletes), then compaction of
        any partition fragmented beyond ``compact_above_files``."""
        deleted = self.apply_retention(
            topic,
            now_ms=now_ms,
            retention_ms=retention_ms,
            retention_bytes=retention_bytes,
        )
        compacted = {}
        for p in range(self.topic_partitions(topic)):
            stats = storage.partition_file_stats(self.base_dir, topic, p)
            if len(stats) > compact_above_files:
                compacted[p] = self.compact_partition(topic, p)
        return {"deleted_files": deleted, "compacted_partitions": compacted}

    def compact_partition_by_key(self, topic: str, partition: int) -> int:
        """Kafka ``cleanup.policy=compact`` for one partition: rewrite
        keeping only the LATEST record per key (null-key records are
        never compacted away, matching Kafka). Reuses the dataflow
        operator (operators/retention.py:compact_by_key — one window
        shuffle, offsets preserved so consumers seek into the compacted
        log unchanged) and the size-targeted parallel rewrite of
        ``compact_partition``; low watermark and LEO are untouched
        (compaction removes middles, not ends). Returns surviving row
        count. Single-writer contract applies."""
        from flyq_spark.operators.retention import compact_by_key

        self._recover_compaction(topic, partition)
        pdir, tmp, _old = self._compact_paths(topic, partition)
        stats = storage.partition_file_stats(self.base_dir, topic, partition)
        if not stats:
            return 0
        # same defensive conf produce() sets: an INT96 rewrite would
        # erase footer timestamp stats and kill time retention (Q5)
        self.spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
        # a partition-dir read has no hive `partition` column; pin it as
        # a literal for the window key, drop it again before the write
        df = self.spark.read.parquet(pdir).withColumn(
            "partition", F.lit(int(partition))
        )
        compacted = (
            compact_by_key(
                df, part_col="partition", key_col="key", offset_col="offset"
            )
            .drop("partition")
            .persist()
        )
        n_rows = compacted.count()
        total_bytes = sum(s.size_bytes for s in stats)
        n_out = max(1, -(-total_bytes // self.config.segment_max_bytes))
        (
            compacted.repartitionByRange(n_out, "offset")
            .sortWithinPartitions("offset")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", str(self.config.max_records_per_file))
            .parquet(tmp)
        )
        compacted.unpersist()
        self._swap_compacted(topic, partition)
        return n_rows

    def compact_partition(self, topic: str, partition: int) -> int:
        """Rewrite a partition's files into size-targeted files — the
        housekeeping analog of segment rotation (partition.rs:116-127).
        Returns the resulting file count. Single-writer contract applies.

        Parallel rewrite: the output task count is byte-targeted
        (total on-disk size / segment_max_bytes), and
        ``repartitionByRange("offset")`` keeps each output file a
        contiguous offset range (range-partitioned + in-task sort), so an
        over-target partition compacts with N writers instead of the
        single coalesce(1) straggler a 100x partition would hit, while
        offset-ordered point/range reads still prune by footer stats."""
        self._recover_compaction(topic, partition)
        pdir, tmp, _old = self._compact_paths(topic, partition)
        stats = storage.partition_file_stats(self.base_dir, topic, partition)
        if not stats:
            return 0
        self.spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
        total_bytes = sum(s.size_bytes for s in stats)
        n_out = max(1, -(-total_bytes // self.config.segment_max_bytes))
        df = self.spark.read.parquet(pdir)
        (
            df.repartitionByRange(n_out, "offset")
            .sortWithinPartitions("offset")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", str(self.config.max_records_per_file))
            .parquet(tmp)
        )
        self._swap_compacted(topic, partition)
        return len(storage.partition_file_stats(self.base_dir, topic, partition))

    def erase_subject(
        self, subject_keys: list[bytes], topics: list[str] | None = None
    ) -> DataFrame:
        """[EXT] The GDPR right-to-erasure loop as ONE engine call —
        the composition of the three individually-gated halves:
        subject-access report BEFORE (operators/profile.py
        subject_access_report), keyed physical erasure of every topic
        log (operators/pruning.py erase_partition_keys: staged rewrite
        of exactly the flagged partitions, swap commit), and the
        report re-run AFTER, returned side-by-side so the caller holds
        the auditable before → (0, 0, 0) proof in one frame. Reference
        scope: FlyQ deletes whole segments by retention only
        (partition.rs:225-308); keyed erasure is the [EXT] platform
        counterpart every broker operator eventually needs.

        Work-list discipline: per topic, the flagged partition list is
        the DISTINCT partitions actually holding a subject key (one
        broadcast-semi-join scan — at real scale, keyed-produce
        placement or a Bloom file index narrows this further); only
        those directories are rewritten, everything else on disk stays
        byte-identical. Offsets of surviving messages are NOT
        reassigned (erasure leaves offset gaps, exactly like the
        reference's retention deletes and Kafka compaction) so
        committed consumer offsets stay valid.

        Subjects are identified by their message KEY bytes; the report
        keys rows by the md5-derived 60-bit subject id (engine-portable
        — any SQL engine with md5/hex replays it) while the erasure
        anti-join matches the raw bytes (exact, collision-free).

        Returns one row per (topic, subject): (topic, subject_key,
        n_before, xor_before, sum_before, n_after, xor_after,
        sum_after, parts_rewritten, parts_deleted). The before side is
        materialized BEFORE any rewrite (the report is lazy; reading it
        after the swap would see post-erasure files).
        """
        from flyq_spark.operators.profile import subject_access_report
        from flyq_spark.operators.pruning import erase_partition_keys

        if not subject_keys:
            raise ValueError("erase_subject needs at least one subject key")
        names = topics if topics is not None else self.list_topics()
        if not names:
            raise ValueError(
                "erase_subject needs at least one topic (none registered)"
            )
        kdf = self.spark.createDataFrame(
            [(bytes(k),) for k in subject_keys], "kb binary"
        )
        subj_of = lambda c: F.conv(  # noqa: E731 — md5-derived 60-bit id
            F.substring(F.md5(c), 1, 15), 16, 10
        ).cast("long")
        keys_long = kdf.select(subj_of(F.col("kb")).alias("k")).distinct()

        def report() -> DataFrame:
            tables = {
                t: (
                    self.log(t),
                    subj_of(F.col("key")),
                    {
                        "partition": F.col("partition"),
                        "offset": F.col("offset"),
                        "value": F.sha2(F.col("value"), 256),
                    },
                )
                for t in names
            }
            return subject_access_report(tables, keys_long, "k")

        before = report().collect()  # |topics| x |subjects| rows
        stats: dict[str, dict] = {}
        for t in names:
            log = self.log(t)
            flagged = sorted(
                r["partition"]
                for r in log.join(
                    F.broadcast(kdf), log["key"] == kdf["kb"], "left_semi"
                )
                .select("partition")
                .distinct()
                .collect()
            )
            stats[t] = erase_partition_keys(
                self.spark,
                storage.topic_dir(self.base_dir, t),
                "partition",
                flagged,
                kdf,
                "kb",
                "key",
            )
        before_df = self.spark.createDataFrame(
            before,
            "table_name string, subject_key long, n_rows long, "
            "xor_h long, sum_mod long",
        ).select(
            F.col("table_name").alias("topic"),
            "subject_key",
            F.col("n_rows").alias("n_before"),
            F.col("xor_h").alias("xor_before"),
            F.col("sum_mod").alias("sum_before"),
        )
        after_df = report().select(
            F.col("table_name").alias("topic"),
            "subject_key",
            F.col("n_rows").alias("n_after"),
            F.col("xor_h").alias("xor_after"),
            F.col("sum_mod").alias("sum_after"),
        )
        stat_rows = [
            (t, s["files_rewritten"], s["partitions_deleted"])
            for t, s in stats.items()
        ]
        stat_df = self.spark.createDataFrame(
            stat_rows, "topic string, parts_rewritten long, parts_deleted long"
        )
        return (
            before_df.join(after_df, on=["topic", "subject_key"])
            .join(F.broadcast(stat_df), on="topic")
        )

    def assign_partitions(
        self,
        topic: str,
        consumers: list[str],
        strategy: str = "range",
    ) -> dict[str, list[int]]:
        """[EXT] Consumer-group partition assignment — the client-side
        group-coordination step between ``consume_with_group`` calls
        when several consumers share a group. The reference has no
        assignor (its groups are a bare offset map,
        offset_tracker.rs:36-54); these are the two standard Kafka
        strategies, restated deterministically:

        - ``range``: consumers sort lexicographically, partitions
          split into contiguous runs — the first (P mod C) consumers
          take ceil(P/C) partitions, the rest floor(P/C). Contiguity
          preserves key-range locality for keyed topics.
        - ``roundrobin``: partition p goes to sorted consumer
          (p mod C) — maximally balanced when P ≫ C.

        Pure arithmetic over (sorted consumers, partition count): the
        same inputs produce the same assignment on every client, no
        coordinator state — a crashed consumer re-derives its share
        from the member list alone. Returns {consumer: [partitions]}
        (every consumer present, possibly with an empty list)."""
        return assign_partitions(
            self.topic_partitions(topic), consumers, strategy
        )


def assign_partitions(
    n_partitions: int,
    consumers: list[str],
    strategy: str = "range",
) -> dict[str, list[int]]:
    """The pure client-side half of ``FlyQEngine.assign_partitions``:
    deterministic partition assignment from (partition count, member
    list) alone — no engine, no coordinator. Wire clients coordinating
    a shared consumer group (examples/group_consumers.py) call this
    directly: every member that agrees on the sorted member list
    derives the same disjoint, exhaustive assignment independently."""
    if n_partitions < 0:
        raise ValueError(f"n_partitions must be >= 0: {n_partitions}")
    if not consumers:
        raise ValueError("assign_partitions needs at least one consumer")
    if len(set(consumers)) != len(consumers):
        raise ValueError(f"duplicate consumer ids: {consumers}")
    if strategy not in ("range", "roundrobin"):
        raise ValueError(f"unknown strategy {strategy!r}")
    members = sorted(consumers)
    c = len(members)
    out: dict[str, list[int]] = {m: [] for m in members}
    if strategy == "roundrobin":
        for p in range(n_partitions):
            out[members[p % c]].append(p)
        return out
    q, rem = divmod(n_partitions, c)
    start = 0
    for i, m in enumerate(members):
        take = q + (1 if i < rem else 0)
        out[m] = list(range(start, start + take))
        start += take
    return out
