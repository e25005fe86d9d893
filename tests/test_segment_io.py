"""FlyQ data-directory migration tests: byte-level StoredRecord framing
(stored_record.rs:13-27) and full export -> import roundtrips."""

from __future__ import annotations

import struct

from flyq_spark.functions.segment_io import (
    decode_stored_records,
    encode_stored_record,
)
from tests.conftest import make_messages


def test_stored_record_layout_exact():
    rec = encode_stored_record(7, b"k", b"vv", 1234, [("h", b"x")])
    (rec_len,) = struct.unpack_from(">I", rec, 0)
    assert rec_len == len(rec) - 4
    (offset,) = struct.unpack_from(">Q", rec, 4)
    assert offset == 7
    # wire message starts with the u64 timestamp (no length prefix)
    (ts,) = struct.unpack_from(">Q", rec, 12)
    assert ts == 1234
    got = decode_stored_records(rec)
    assert len(got) == 1
    m = got[0]
    assert (m["offset"], m["key"], m["value"], m["timestamp"]) == (7, b"k", b"vv", 1234)
    assert m["headers"] == [("h", b"x")]


def test_decode_stops_at_torn_tail():
    rec = encode_stored_record(0, None, b"v", 1)
    assert len(decode_stored_records(rec + rec[: len(rec) // 2])) == 1


def test_export_import_roundtrip(engine, spark, tmp_path):
    """engine A -> FlyQ-format dir -> engine B: identical logs, offsets,
    watermarks; keys/headers/timestamps survive byte-exactly."""
    from flyq_spark.engine import FlyQEngine
    from flyq_spark.functions.segment_io import export_topic, import_flyq_dir

    engine.create_topic("mig", partitions=2)
    engine.produce("mig", make_messages(10, key=b"alpha"))
    engine.produce(
        "mig",
        [
            {
                "key": None,
                "value": b"keyless",
                "timestamp": 1_700_000_777_000,
                "headers": [("src", b"migration")],
            }
        ],
    )

    out = str(tmp_path / "flyq_dir")
    written = export_topic(engine, "mig", out)
    assert written and all("segment_" in p and p.endswith(".log") for p in written)

    dest = FlyQEngine(spark, str(tmp_path / "dest"))
    imported = import_flyq_dir(dest, out)
    assert imported == {"mig": 11}
    for p in (0, 1):
        assert dest.get_watermark("mig", p) == engine.get_watermark("mig", p)
        src_rows = engine.read_from_offset("mig", p, 0)
        dst_rows = dest.read_from_offset("mig", p, 0)
        assert [
            (int(r["offset"]), bytes(r["value"]), r["timestamp"]) for r in src_rows
        ] == [(int(r["offset"]), bytes(r["value"]), r["timestamp"]) for r in dst_rows]
    # headers survive
    got = [
        r
        for p in (0, 1)
        for r in dest.read_from_offset("mig", p, 0)
        if bytes(r["value"]) == b"keyless"
    ]
    assert len(got) == 1
    assert [(h["key"], bytes(h["value"])) for h in got[0]["headers"]] == [
        ("src", b"migration")
    ]


def test_import_preserves_offsets_after_retention_gap(engine, spark, tmp_path):
    """Export after retention (low watermark > 0) -> import keeps the
    offset gap instead of renumbering."""
    from flyq_spark.engine import FlyQEngine
    from flyq_spark.functions.segment_io import export_topic, import_flyq_dir

    T0 = 1_700_000_000_000
    DAY = 24 * 3600 * 1000
    for i in range(3):
        engine.produce("gap", make_messages(4, ts0=T0 + i * DAY))
    engine.apply_retention("gap", now_ms=T0 + 2 * DAY + 1, retention_ms=DAY)
    low, high, leo = engine.get_watermark("gap", 0)
    assert low > 0

    out = str(tmp_path / "flyq_dir")
    export_topic(engine, "gap", out)
    dest = FlyQEngine(spark, str(tmp_path / "dest"))
    import_flyq_dir(dest, out)
    assert dest.get_watermark("gap", 0) == (low, high, leo)
    assert [int(r["offset"]) for r in dest.read_from_offset("gap", 0, 0)] == list(
        range(low, leo)
    )


def test_zero_padded_tail_stops_cleanly():
    """A zero-padded torn tail (partial-write artifact) must stop the
    decode at the intact prefix, not crash the import task."""
    from flyq_spark.functions.segment_io import (
        decode_stored_records,
        encode_stored_record,
    )

    rec = encode_stored_record(0, b"k", b"v", 1_700_000_000_000)
    out = decode_stored_records(rec + b"\x00" * 16)
    assert len(out) == 1 and out[0]["offset"] == 0


def test_export_timestamp_exact_millis(engine, tmp_path):
    """Epoch millis are exact through export: 1079337347472 truncates
    1 ms low under float conversion — pinned byte-exact here."""
    from flyq_spark.functions.segment_io import decode_stored_records, export_topic

    ts = 1_079_337_347_472  # int(dt.timestamp()*1000) gives ...471
    engine.produce("tsx", [{"key": None, "value": b"v", "timestamp": ts}])
    export_topic(engine, "tsx", str(tmp_path / "out"))
    seg = next((tmp_path / "out" / "topic_tsx" / "partition_0").glob("*.log"))
    rows = decode_stored_records(seg.read_bytes())
    assert rows[0]["timestamp"] == ts


def test_import_refuses_non_empty_topic(engine, tmp_path):
    """Appending duplicate offsets into a live topic would corrupt the
    log; the import must refuse instead."""
    import pytest as _pt

    from flyq_spark.functions.segment_io import export_topic, import_flyq_dir

    engine.produce("imp", [{"key": None, "value": b"v", "timestamp": 1}])
    export_topic(engine, "imp", str(tmp_path / "d"))
    with _pt.raises(ValueError):
        import_flyq_dir(engine, str(tmp_path / "d"))
