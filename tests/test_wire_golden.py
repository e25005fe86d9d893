"""Golden-frame replay fixtures for the wire protocol (A25-A26).

test_wire_protocol.py pins field-for-field LAYOUTS (mirroring the
reference's unit tests, e.g. request/consume_with_group.rs:63-96,
response/partition_health_response.rs:105-151) and roundtrips; a codec
that drifted symmetrically (encode+decode both wrong) would still pass
those. These literal byte strings — generated once from the live-TCP-
verified codecs and hand-checked field-by-field against the documented
layouts — fail loudly on ANY byte-level drift, in either direction.

Request values reuse the reference tests' own fixtures ("orders",
partition 2, "email-worker"; partition_health_response.rs's "events"
health triple) so a reader can re-derive every byte from the .rs files.
"""

from __future__ import annotations

import pytest

from flyq_spark import wire
from flyq_spark.wire import Frame, FrameType, OpCode

# name -> (golden hex, encode thunk)
GOLDEN = {
    # -- requests (7 ops) -------------------------------------------- #
    "produce_req": (
        "000000066f72646572730000000b68656c6c6f2d776f726c64",
        lambda: wire.encode_produce_request("orders", b"hello-world"),
    ),
    "consume_req": (
        "000000066f726465727300000002000000000000002a",
        lambda: wire.encode_consume_request("orders", 2, 42),
    ),
    "consume_with_group_req": (
        "000000066f7264657273000000020000000c656d61696c2d776f726b6572",
        lambda: wire.encode_consume_with_group_request("orders", 2, "email-worker"),
    ),
    "commit_offset_req": (
        "000000066f7264657273000000020000000c656d61696c2d776f726b65720000000000000064",
        lambda: wire.encode_commit_offset_request("orders", 2, "email-worker", 100),
    ),
    "watermark_req": (
        "000000066576656e747300000000",
        lambda: wire.encode_watermark_request("events", 0),
    ),
    "partition_health_req": (
        "000000066576656e747300000003",
        lambda: wire.encode_partition_health_request("events", 3),
    ),
    "consumer_lag_req_topic": (
        "0000000c656d61696c2d776f726b65720100000001000000066f7264657273",
        lambda: wire.encode_consumer_lag_request("email-worker", ["orders"]),
    ),
    "consumer_lag_req_all": (
        "0000000c656d61696c2d776f726b657200",
        lambda: wire.encode_consumer_lag_request("email-worker", None),
    ),
    # -- responses (5 ops) ------------------------------------------- #
    "produce_ack": (
        "000000030000000000000011",
        lambda: wire.encode_produce_ack(3, 17),
    ),
    "consume_resp": (
        "00000000000000070000011f71fb04cb000000026b3100000007762d62797465"
        "7300000001000000057472616365000000020102",
        lambda: wire.encode_consume_response(
            7, b"k1", b"v-bytes", 1234567890123, [("trace", b"\x01\x02")]
        ),
    ),
    "watermark_resp": (
        "000000000000000000000000000003e800000000000003e9",
        lambda: wire.encode_watermark_response(0, 1000, 1001),
    ),
    "consumer_lag_resp": (
        "0000000c656d61696c2d776f726b65720000000000000005000000020000000"
        "66f726465727300000000000000000000005f000000000000006300000000000"
        "00005000000066f72646572730000000100000000000000320000000000000031"
        "0000000000000000",
        lambda: wire.encode_consumer_lag_response(
            "email-worker",
            5,
            [
                dict(topic="orders", partition=0, committed_offset=95,
                     high_watermark=99, lag=5),
                dict(topic="orders", partition=1, committed_offset=50,
                     high_watermark=49, lag=0),
            ],
        ),
    ),
    "partition_health_resp": (
        "000000066576656e747300000000000000030000000006400000000000000000"
        "000000000000000003e800000000000003e80100000000499602d2",
        lambda: wire.encode_partition_health_response(
            dict(topic="events", partition=0, segment_count=3,
                 total_size_bytes=1024 * 1024 * 100, low_watermark=0,
                 high_watermark=1000, log_end_offset=1000,
                 last_cleanup=1234567890)
        ),
    ),
    "partition_health_resp_nocleanup": (
        "000000046c6f6773000000010000000100000000000004000000000000000000"
        "000000000000000a000000000000000a00",
        lambda: wire.encode_partition_health_response(
            dict(topic="logs", partition=1, segment_count=1,
                 total_size_bytes=1024, low_watermark=0, high_watermark=10,
                 log_end_offset=10, last_cleanup=None)
        ),
    ),
    # -- a full frame: header + opcode byte + payload + xxh32 -------- #
    "frame_consume_req_corr7": (
        "0101000000070000001713f7a16202000000066f726465727300000002000000"
        "000000002a",
        lambda: Frame(
            wire.PROTOCOL_VERSION,
            FrameType.REQUEST,
            7,
            wire.encode_payload(
                OpCode.CONSUME, wire.encode_consume_request("orders", 2, 42)
            ),
        ).encode(),
    ),
}

DECODERS = {
    "produce_req": wire.decode_produce_request,
    "consume_req": wire.decode_consume_request,
    "consume_with_group_req": wire.decode_consume_with_group_request,
    "commit_offset_req": wire.decode_commit_offset_request,
    "watermark_req": wire.decode_watermark_request,
    "partition_health_req": wire.decode_partition_health_request,
    "consumer_lag_req_topic": wire.decode_consumer_lag_request,
    "consumer_lag_req_all": wire.decode_consumer_lag_request,
    "produce_ack": wire.decode_produce_ack,
    "consume_resp": wire.decode_consume_response,
    "watermark_resp": wire.decode_watermark_response,
    "consumer_lag_resp": wire.decode_consumer_lag_response,
    "partition_health_resp": wire.decode_partition_health_response,
    "partition_health_resp_nocleanup": wire.decode_partition_health_response,
}


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_encode_matches_golden_bytes(name):
    hex_bytes, encode = GOLDEN[name]
    assert encode().hex() == hex_bytes, f"codec drift in {name}"


@pytest.mark.parametrize("name", sorted(DECODERS))
def test_decode_golden_bytes_roundtrips(name):
    """Decoding the golden bytes and re-encoding reproduces them exactly
    (replay path: a frame recorded from a reference broker must decode,
    and our re-send of the same logical content must be byte-identical)."""
    hex_bytes, encode = GOLDEN[name]
    decoded = DECODERS[name](bytes.fromhex(hex_bytes))
    assert decoded is not None
    assert encode().hex() == hex_bytes


def test_golden_frame_decodes_and_verifies_checksum():
    hex_bytes, _ = GOLDEN["frame_consume_req_corr7"]
    frame, consumed = wire.decode_frame_at(bytearray(bytes.fromhex(hex_bytes)))
    assert consumed == len(bytes.fromhex(hex_bytes))
    assert frame.version == wire.PROTOCOL_VERSION
    assert frame.frame_type == FrameType.REQUEST
    assert frame.correlation_id == 7
    op, data = wire.decode_payload(frame.payload)
    assert op == OpCode.CONSUME
    assert wire.decode_consume_request(data) == {
        "topic": "orders",
        "partition": 2,
        "offset": 42,
    }
