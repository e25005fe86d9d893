"""Message codec (A23) round-trip tests — ports of message.rs:133-183 —
plus TOML config loading (A30)."""

from __future__ import annotations

import struct

import pytest

from flyq_spark.functions.codec import (
    CodecError,
    deserialize_message,
    serialize_message,
)


def test_roundtrip_full_message():
    """message.rs:137-147: key + headers survive exactly."""
    buf = serialize_message(
        b"user-42", b"payload", 1_700_000_000_123, [("trace", b"t1"), ("src", b"unit")]
    )
    m = deserialize_message(buf)
    assert m["key"] == b"user-42"
    assert m["value"] == b"payload"
    assert m["timestamp"] == 1_700_000_000_123
    assert m["headers"] == [("trace", b"t1"), ("src", b"unit")]


def test_roundtrip_no_key_no_headers():
    """message.rs:164-183: None key / None headers encode as zero counts."""
    m = deserialize_message(serialize_message(None, b"v", 7))
    assert m["key"] is None and m["headers"] is None and m["value"] == b"v"


def test_empty_key_decodes_as_none():
    """Quirk Q1 (message.rs:83-92): zero-length key -> None."""
    m = deserialize_message(serialize_message(b"", b"v", 7))
    assert m["key"] is None


def test_wire_layout_is_big_endian_exact():
    """Pin the physical layout (message.rs:1-11): len, ts, key_len..."""
    buf = serialize_message(b"k", b"vv", 0x0102030405060708)
    assert struct.unpack_from(">I", buf, 0)[0] == len(buf) - 4
    assert struct.unpack_from(">Q", buf, 4)[0] == 0x0102030405060708
    assert struct.unpack_from(">I", buf, 12)[0] == 1  # key_len
    assert buf[16:17] == b"k"
    assert struct.unpack_from(">I", buf, 17)[0] == 2  # value_len
    assert buf[21:23] == b"vv"
    assert struct.unpack_from(">I", buf, 23)[0] == 0  # header_count


def test_truncated_buffer_raises():
    buf = serialize_message(b"k", b"v", 1)
    with pytest.raises(CodecError):
        deserialize_message(buf[: len(buf) // 2])


def test_codec_udfs_roundtrip(spark):
    """Arrow-batched encode/decode through Spark columns."""
    from pyspark.sql import functions as F

    from flyq_spark.functions.codec import from_flyq_bytes_udf, to_flyq_bytes_udf

    df = spark.createDataFrame(
        [
            (b"k1", b"v1", 1_700_000_000_001, [{"key": "h", "value": b"x"}]),
            (None, b"v2", 1_700_000_000_002, None),
        ],
        "key binary, value binary, timestamp long, "
        "headers array<struct<key string, value binary>>",
    )
    encoded = df.select(
        to_flyq_bytes_udf()(
            F.col("key"), F.col("value"), F.col("timestamp"), F.col("headers")
        ).alias("b")
    )
    decoded = encoded.select(from_flyq_bytes_udf()(F.col("b")).alias("m")).select("m.*")
    rows = sorted(decoded.collect(), key=lambda r: r["timestamp"])
    assert bytes(rows[0]["key"]) == b"k1"
    assert [(h["key"], bytes(h["value"])) for h in rows[0]["headers"]] == [("h", b"x")]
    assert rows[1]["key"] is None and rows[1]["headers"] is None
    assert bytes(rows[1]["value"]) == b"v2"


def test_config_from_toml(tmp_path):
    from flyq_spark.config import EngineConfig

    p = tmp_path / "flyq.toml"
    p.write_text(
        "segment_max_bytes = 1024\n"
        "retention_secs = 3600\n"
        "retention_bytes = 999\n"
        "cleanup_interval_secs = 5\n"
        "default_partitions = 3\n"
    )
    cfg = EngineConfig.from_toml(str(p))
    assert cfg.segment_max_bytes == 1024
    assert cfg.retention_ms == 3_600_000
    assert cfg.retention_bytes == 999
    assert cfg.cleanup_interval_s == 5
    assert cfg.default_partitions == 3
    # load_or_default falls back to defaults (config.rs:39-51)
    d = EngineConfig.load_or_default(str(tmp_path / "missing.toml"))
    assert d.retention_ms == 7 * 24 * 3600 * 1000


def test_monitor_example_runs(engine, capsys):
    import sys

    sys.path.insert(0, "/root/repo/examples")
    import monitor

    engine.produce("m", [{"key": None, "value": b"x", "timestamp": 1}] * 5)
    engine.commit_offset("g", "m", 0, 2)
    monitor.poll(engine, "g")
    out = capsys.readouterr().out
    assert "watermarks=(0,4,5)" in out
    assert "lag=2" in out
    assert "total_lag=2" in out


def test_xxh64_parity_with_spark(spark):
    """functions/hashing.py must match F.xxhash64 bit-for-bit across all
    tail-length classes (0..33+ bytes) so driver-side routing
    (consume_by_key) and executor-side routing agree."""
    import random

    from pyspark.sql import functions as F

    from flyq_spark.functions.hashing import spark_partition_for_key, xxh64_signed

    random.seed(11)
    keys = [
        bytes(random.randrange(256) for _ in range(length))
        for length in [0, 1, 3, 4, 7, 8, 9, 15, 16, 31, 32, 33, 64, 100]
        for _ in range(3)
    ]
    df = spark.createDataFrame([(k,) for k in keys], "key binary")
    got = [r["h"] for r in df.select(F.xxhash64("key").alias("h")).collect()]
    assert got == [xxh64_signed(k) for k in keys]
    parts = [
        r["p"]
        for r in df.select(
            F.pmod(F.xxhash64("key"), F.lit(8)).cast("int").alias("p")
        ).collect()
    ]
    assert parts == [spark_partition_for_key(k, 8) for k in keys]


def test_cli_surface(engine):
    """CLI dispatch covers the client-binary surface end-to-end."""
    from flyq_spark.cli import build_parser, run

    ap = build_parser()
    base = ["--base-dir", engine.base_dir]
    assert run(ap.parse_args(base + ["create-topic", "t", "-p", "2"]), engine) == {
        "created": "t",
        "partitions": 2,
    }
    ack = run(
        ap.parse_args(base + ["produce", "t", "--key", "k1", "--value", "hello",
                              "--header", "src=cli"]),
        engine,
    )
    assert ack["offset"] == 0
    got = run(ap.parse_args(base + ["consume", "t", str(ack["partition"]), "0"]), engine)
    assert got["message"]["value"] == "hello"
    assert got["message"]["headers"] == [{"key": "src", "value": "cli"}]
    wm = run(ap.parse_args(base + ["watermark", "t", str(ack["partition"])]), engine)
    assert wm == {"low_watermark": 0, "high_watermark": 0, "log_end_offset": 1}
    run(ap.parse_args(base + ["commit", "g", "t", str(ack["partition"]), "1"]), engine)
    lag = run(ap.parse_args(base + ["lag", "g", "--topic", "t"]), engine)
    assert lag["total_lag"] == 0
    # committed == leo -> past end -> graceful None (log_engine.rs:97-101)
    cg = run(ap.parse_args(base + ["consume-group", "t", str(ack["partition"]), "g"]), engine)
    assert cg == {"committed": None, "message": None}
    health = run(ap.parse_args(base + ["health", "t", str(ack["partition"])]), engine)
    assert health["segment_count"] == 1
    assert run(ap.parse_args(base + ["topics"]), engine) == {"topics": ["t"]}


def test_cli_maintain_interval_loop(engine):
    """`maintain --interval` — the scheduled analog of the reference's
    flush/cleanup daemons (runtime/flush.rs:75-107): each tick applies
    retention then compacts fragmented partitions; --ticks bounds the
    loop so schedulers/tests get clean termination."""
    from flyq_spark.cli import build_parser, run
    from tests.conftest import make_messages

    import time as _time

    ap = build_parser()
    base = ["--base-dir", engine.base_dir]
    engine.create_topic("mt", partitions=1)
    now = int(_time.time() * 1000)  # fresh data: default retention keeps it
    for i in range(3):  # 3 produce calls -> >= 3 files in partition 0
        engine.produce("mt", make_messages(2, ts0=now + i * 10))
    out = run(
        ap.parse_args(
            base + ["maintain", "mt", "--interval", "0.05", "--ticks", "2",
                    "--compact-above-files", "2"]
        ),
        engine,
    )
    assert len(out["ticks"]) == 2
    assert out["ticks"][0]["compacted_partitions"].get(0) == 1
    assert out["ticks"][1]["compacted_partitions"] == {}  # already compact
    low, high, leo = engine.get_watermark("mt", 0)
    assert (low, leo) == (0, 6)  # data intact after both cycles


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except Exception:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:

    @settings(max_examples=200, deadline=None)
    @given(
        key=st.one_of(st.none(), st.binary(max_size=64)),
        value=st.binary(max_size=256),
        ts=st.integers(min_value=0, max_value=(1 << 63) - 1),
        headers=st.one_of(
            st.none(),
            st.lists(
                st.tuples(st.text(max_size=16), st.binary(max_size=32)), max_size=4
            ),
        ),
    )
    def test_codec_roundtrip_fuzz(key, value, ts, headers):
        """Property: decode(encode(m)) == m modulo the reference's own
        quirks (empty key -> None, empty headers -> None)."""
        m = deserialize_message(serialize_message(key, value, ts, headers))
        assert m["value"] == value and m["timestamp"] == ts
        assert m["key"] == (key if key else None)
        assert m["headers"] == (headers if headers else None)


def test_read_documents_multi_format(spark, tmp_path):
    """JSONL/CSV/ORC ingestion produces the identical frame as parquet."""
    from flyq_spark.io import read_documents

    src = spark.createDataFrame(
        [(1, "hello world", "en", "s1", 11), (2, "bonjour", "fr", "s2", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    paths = {}
    for fmt, writer in [
        ("parquet", lambda p: src.write.parquet(p)),
        ("jsonl", lambda p: src.write.json(p)),
        ("csv", lambda p: src.write.option("header", "true").csv(p)),
        ("orc", lambda p: src.write.orc(p)),
    ]:
        p = str(tmp_path / fmt)
        writer(p)
        paths[fmt] = p
    expected = sorted(tuple(r) for r in src.collect())
    for fmt, p in paths.items():
        got = sorted(tuple(r) for r in read_documents(spark, p, fmt=fmt).collect())
        assert got == expected, fmt
    import pytest

    with pytest.raises(ValueError, match="unsupported format"):
        read_documents(spark, paths["csv"], fmt="avro")


def test_produce_empty_batch_is_noop(engine):
    """Edge: an empty produce advances nothing and errors nowhere."""
    engine.create_topic("e", partitions=2)
    acks = engine.produce("e", [])
    assert acks == []
    assert engine.get_watermark("e", 0) == (0, 0, 0)
    out = engine.produce("e", [{"key": None, "value": b"x", "timestamp": 1}])
    assert out == [(0, 0)]


def test_shingle_udtf_and_median_udaf(spark):
    from pyspark.sql import functions as F

    from flyq_spark.functions.udtf import ShingleExplode, median_udaf, register_udtfs

    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM shingle_explode('a b c d', 3) ORDER BY pos"
    ).collect()
    assert [(r["pos"], r["shingle"]) for r in rows] == [(0, "a b c"), (1, "b c d")]
    # lateral-join form over a table
    df = spark.createDataFrame([(1, "x y z")], "id long, text string")
    df.createOrReplaceTempView("udtf_docs")
    lat = spark.sql(
        "SELECT id, s.shingle FROM udtf_docs, "
        "LATERAL shingle_explode(text, 2) AS s ORDER BY s.pos"
    ).collect()
    assert [r["shingle"] for r in lat] == ["x y", "y z"]

    ev = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", 100.0), ("b", 7.0)], "k string, v double"
    )
    got = {
        r["k"]: r["med"]
        for r in ev.groupBy("k").agg(median_udaf(F.col("v")).alias("med")).collect()
    }
    assert got == {"a": 3.0, "b": 7.0}


def test_xxh3_64_published_sanity_vectors():
    """Pure-Python XXH3-64 must reproduce the published xxHash sanity
    vectors (xsum_sanity_check.c test buffer: byteGen starts at
    prime32, buf[i] = byteGen >> 56, byteGen *= prime64) across every
    length class — 0-16 / 17-128 / 129-240 / long, seed 0 and seeded.
    This is what makes method='xxh3' routing bit-exact vs the reference
    (topic.rs:90-93) without the optional xxhash C package."""
    from flyq_spark.functions.hashing import flyq_partition_for_key, xxh3_64

    def fill(n: int) -> bytes:
        buf = bytearray(n)
        g = 2654435761
        for i in range(n):
            buf[i] = (g >> 56) & 0xFF
            g = (g * 11400714785074694797) & 0xFFFFFFFFFFFFFFFF
        return bytes(buf)

    p64 = 11400714785074694797
    vectors = [
        (0, 0, 0x2D06800538D394C2),
        (0, p64, 0xA8A6B918B2F0364A),
        (1, 0, 0xC44BDFF4074EECDB),
        (1, p64, 0x032BE332DD766EF8),
        (6, 0, 0x27B56A84CD2D7325),
        (6, p64, 0x84589C116AB59AB9),
        (12, 0, 0xA713DAF0DFBB77E7),
        (12, p64, 0xE7303E1B2336DE0E),
        (24, 0, 0xA3FE70BF9D3510EB),
        (24, p64, 0x850E80FC35BDD690),
        (48, 0, 0x397DA259ECBA1F11),
        (48, p64, 0xADC2CBAA44ACC616),
        (80, 0, 0xBCDEFBBB2C47C90A),
        (80, p64, 0xC6DD0CB699532E73),
        (195, 0, 0xCD94217EE362EC3A),
        (195, p64, 0xBA68003D370CB3D9),
        (403, 0, 0xCDEB804D65C6DEA4),
        (403, p64, 0x6259F6ECFD6443FD),
        (512, 0, 0x617E49599013CB6B),
        (512, p64, 0x3CE457DE14C27708),
        (2048, 0, 0xDD59E2C3A5F038E0),
        (2048, p64, 0x66F81670669ABABC),
    ]
    for n, seed, expect in vectors:
        assert xxh3_64(fill(n), seed) == expect, (n, seed)

    # reference routing formula: (xxh3_64(key) as u32) % n
    assert flyq_partition_for_key(b"", 4) == (0x2D06800538D394C2 & 0xFFFFFFFF) % 4

    # agree with the C extension whenever it IS installed
    try:
        import xxhash
    except ImportError:
        return
    for n in (0, 3, 7, 15, 40, 130, 300, 1000):
        assert xxh3_64(fill(n)) == xxhash.xxh3_64_intdigest(fill(n))


def test_write_documents_roundtrip_all_formats(spark, tmp_path):
    """write_documents -> read_documents round-trips bit-identically in
    every format, including text with embedded delimiters/newlines
    (CSV quoting) and hive partitioning + file-size caps."""
    import glob

    from flyq_spark.io import read_documents, write_documents

    src = spark.createDataFrame(
        [
            (1, "hello, world", "en", "s1", 12),      # embedded comma
            (2, 'quote " and\nnewline', "en", "s2", 19),
            (3, "bonjour", "fr", "s1", 7),
            (4, "hallo welt", "de", "s2", 10),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    expected = sorted(tuple(r) for r in src.collect())
    for fmt in ("parquet", "jsonl", "csv", "orc", "xml"):
        p = str(tmp_path / fmt)
        write_documents(src, p, fmt=fmt)
        got = sorted(tuple(r) for r in read_documents(spark, p, fmt=fmt).collect())
        assert got == expected, fmt

    # partitioned parquet: directory layout prunes + roundtrip intact
    p = str(tmp_path / "part")
    write_documents(src, p, partition_by=("lang",), max_records_per_file=1)
    assert glob.glob(f"{p}/lang=en/*.parquet")
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(p)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect()
    )
    assert got == expected
    # maxRecordsPerFile=1 -> one file per row within each partition
    assert len(glob.glob(f"{p}/lang=en/*.parquet")) == 2


def test_xml_roundtrip_null_vs_empty_and_escaping(spark, tmp_path):
    """The XML hop preserves the '' vs NULL distinction WITHOUT the CSV
    \\N convention (absent element = NULL, empty element = ''), and
    <>&-escaping plus embedded newlines survive bit-exactly."""
    from flyq_spark.io import read_documents, write_documents

    src = spark.createDataFrame(
        [
            (1, "a <b> & 'c' \"d\"", "en", "s1", 15),
            (2, "line1\nline2", "fr", "s1", 11),
            (3, None, "de", "s2", 0),
            (4, "", "en", "s2", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    p = str(tmp_path / "xmlnull")
    write_documents(src, p, fmt="xml")
    got = sorted(tuple(r) for r in read_documents(spark, p, fmt="xml").collect())
    assert got == sorted(tuple(r) for r in src.collect())
    assert got[2][1] is None and got[3][1] == ""
