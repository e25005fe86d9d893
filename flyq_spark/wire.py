"""FlyQ wire protocol (A25/A26): frame + request/response codecs.

Byte-compatible restatement of the reference's protocol crate so a
stock FlyQ client can talk to the Spark engine (flyq_spark.server):

- frame layout (flyq-protocol/src/frame.rs:1-8):
  [version u8][frame_type u8][correlation_id u32][payload_len u32]
  [checksum u32 = xxh32(payload, 0)][payload], all big-endian;
- payload = [op_code u8][op-specific data]
  (flyq-protocol/src/payload.rs:14-28);
- opcodes (flyq-protocol/src/op_code.rs:5-13): Produce=1 Consume=2
  ConsumeWithGroup=3 CommitOffset=4 Watermark=5 GetConsumerLag=13
  GetPartitionHealth=14;
- request/response bodies mirror flyq-protocol/src/request/*.rs and
  response/*.rs field-for-field (length-prefixed UTF-8 strings, u32
  partitions, u64 offsets, option flags as u8 0/1).

Everything here is pure bytes<->dict; no sockets, no Spark. The message
body codec is functions/codec.py (A23) — a consume response is
``offset u64`` + the message body without its length prefix
(message.rs:67-71 serialize_for_wire).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from enum import IntEnum

from flyq_spark.functions.hashing import xxh32

PROTOCOL_VERSION = 1
FRAME_HEADER_LEN = 14


class FrameType(IntEnum):
    REQUEST = 1
    RESPONSE = 2
    ERROR = 3
    HEARTBEAT = 4


class OpCode(IntEnum):
    PRODUCE = 1
    CONSUME = 2
    CONSUME_WITH_GROUP = 3
    COMMIT_OFFSET = 4
    WATERMARK = 5
    GET_CONSUMER_LAG = 13
    GET_PARTITION_HEALTH = 14


class ProtocolError(ValueError):
    """Frame/payload decode failure (mirrors ProtocolError in errors.rs)."""


@dataclass
class Frame:
    version: int
    frame_type: FrameType
    correlation_id: int
    payload: bytes

    def encode(self) -> bytes:
        return (
            struct.pack(
                ">BBIII",
                self.version,
                int(self.frame_type),
                self.correlation_id,
                len(self.payload),
                xxh32(self.payload),
            )
            + self.payload
        )


#: Upper bound on a frame payload this implementation will buffer.
#: The wire format itself allows any u32 length, but waiting for up to
#: 4 GiB that may never arrive (a garbage header that happened to parse)
#: is an unbounded-memory hang — reject early instead. Far above any
#: legitimate payload (single messages; the reference reads are bounded
#: the same way by segment sizes).
MAX_PAYLOAD_LEN = 64 * 1024 * 1024


def decode_frame_at(buf, start: int = 0) -> tuple[Frame | None, int]:
    """Incremental decode (frame.rs:57-97) without copying the tail:
    returns (frame, new_start) or (None, start) when the buffer does not
    yet hold a complete frame after ``start``. Connection loops parse a
    growing buffer with a cursor and compact once per drain — O(bytes)
    total instead of the O(n²) full-tail copy per frame. Checksum
    mismatch, unknown frame types, and payloads beyond MAX_PAYLOAD_LEN
    raise ProtocolError."""
    if len(buf) - start < FRAME_HEADER_LEN:
        return None, start
    version, ftype_raw, corr_id, payload_len, checksum = struct.unpack_from(
        ">BBIII", buf, start
    )
    if payload_len > MAX_PAYLOAD_LEN:
        raise ProtocolError(
            f"payload length {payload_len} exceeds cap {MAX_PAYLOAD_LEN}"
        )
    if len(buf) - start < FRAME_HEADER_LEN + payload_len:
        return None, start
    p0 = start + FRAME_HEADER_LEN
    payload = bytes(buf[p0 : p0 + payload_len])
    actual = xxh32(payload)
    if actual != checksum:
        raise ProtocolError(
            f"checksum mismatch: expected {checksum:#010x}, found {actual:#010x}"
        )
    try:
        ftype = FrameType(ftype_raw)
    except ValueError:
        raise ProtocolError(f"unknown frame type {ftype_raw}") from None
    return Frame(version, ftype, corr_id, payload), p0 + payload_len


def decode_frame(buf: bytes) -> tuple[Frame | None, bytes]:
    """(frame, rest) convenience wrapper over ``decode_frame_at`` —
    codec tests and simple callers; loops should use the cursor form."""
    frame, consumed = decode_frame_at(buf, 0)
    if frame is None:
        return None, buf
    return frame, bytes(buf[consumed:])


# --------------------------------------------------------------------- #
# payload = opcode byte + data
# --------------------------------------------------------------------- #


def encode_payload(op_code: OpCode, data: bytes) -> bytes:
    return bytes([int(op_code)]) + data


def decode_payload(payload: bytes) -> tuple[OpCode, bytes]:
    if not payload:
        raise ProtocolError("empty payload")
    try:
        op = OpCode(payload[0])
    except ValueError:
        raise ProtocolError(f"unknown op code {payload[0]}") from None
    return op, payload[1:]


# --------------------------------------------------------------------- #
# primitive readers (utils.rs:3-11 shape, bounds-checked)
# --------------------------------------------------------------------- #


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def _take(self, n: int) -> bytes:
        if len(self.data) - self.pos < n:
            raise ProtocolError("unexpected EOF in payload")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def u8(self) -> int:
        return self._take(1)[0]

    def u32(self) -> int:
        return struct.unpack(">I", self._take(4))[0]

    def u64(self) -> int:
        return struct.unpack(">Q", self._take(8))[0]

    def lstr(self) -> str:
        n = self.u32()
        try:
            return self._take(n).decode("utf-8")
        except UnicodeDecodeError:
            raise ProtocolError("invalid UTF-8 in string field") from None

    def rest(self) -> bytes:
        out = self.data[self.pos :]
        self.pos = len(self.data)
        return bytes(out)


def _lstr(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">I", len(b)) + b


# --------------------------------------------------------------------- #
# requests (flyq-protocol/src/request/*.rs)
# --------------------------------------------------------------------- #


def encode_produce_request(topic: str, message: bytes) -> bytes:
    """request/produce.rs:11-19: topic + raw message bytes (the
    reference wire produce carries only a VALUE; the server wraps it
    keyless with its own timestamp, listener.rs:89-96)."""
    return _lstr(topic) + struct.pack(">I", len(message)) + message


def decode_produce_request(data: bytes) -> dict:
    r = _Reader(data)
    topic = r.lstr()
    n = r.u32()
    return {"topic": topic, "message": r._take(n)}


def encode_consume_request(topic: str, partition: int, offset: int) -> bytes:
    return _lstr(topic) + struct.pack(">IQ", partition, offset)


def decode_consume_request(data: bytes) -> dict:
    r = _Reader(data)
    return {"topic": r.lstr(), "partition": r.u32(), "offset": r.u64()}


def encode_consume_with_group_request(
    topic: str, partition: int, group: str
) -> bytes:
    return _lstr(topic) + struct.pack(">I", partition) + _lstr(group)


def decode_consume_with_group_request(data: bytes) -> dict:
    r = _Reader(data)
    return {"topic": r.lstr(), "partition": r.u32(), "group": r.lstr()}


def encode_commit_offset_request(
    topic: str, partition: int, group: str, offset: int
) -> bytes:
    return (
        _lstr(topic)
        + struct.pack(">I", partition)
        + _lstr(group)
        + struct.pack(">Q", offset)
    )


def decode_commit_offset_request(data: bytes) -> dict:
    r = _Reader(data)
    return {
        "topic": r.lstr(),
        "partition": r.u32(),
        "group": r.lstr(),
        "offset": r.u64(),
    }


def encode_watermark_request(topic: str, partition: int) -> bytes:
    return _lstr(topic) + struct.pack(">I", partition)


def decode_watermark_request(data: bytes) -> dict:
    r = _Reader(data)
    return {"topic": r.lstr(), "partition": r.u32()}


def encode_consumer_lag_request(
    group: str, topics: list[str] | None = None
) -> bytes:
    """request/consumer_lag.rs: group + option<vec<topic>> (flag u8,
    count u32, length-prefixed strings)."""
    out = _lstr(group)
    if topics is None:
        return out + b"\x00"
    out += b"\x01" + struct.pack(">I", len(topics))
    for t in topics:
        out += _lstr(t)
    return out


def decode_consumer_lag_request(data: bytes) -> dict:
    r = _Reader(data)
    group = r.lstr()
    topics = None
    flag = r.u8()
    if flag not in (0, 1):
        raise ProtocolError(f"invalid option flag {flag}")
    if flag == 1:
        topics = [r.lstr() for _ in range(r.u32())]
    return {"group": group, "topics": topics}


encode_partition_health_request = encode_watermark_request
decode_partition_health_request = decode_watermark_request


# --------------------------------------------------------------------- #
# responses (flyq-protocol/src/response/*.rs)
# --------------------------------------------------------------------- #


def encode_produce_ack(partition: int, offset: int) -> bytes:
    return struct.pack(">IQ", partition, offset)


def decode_produce_ack(data: bytes) -> dict:
    r = _Reader(data)
    return {"partition": r.u32(), "offset": r.u64()}


def encode_consume_response(
    offset: int,
    key: bytes | None,
    value: bytes,
    timestamp_ms: int,
    headers: list[tuple[str, bytes]] | None = None,
) -> bytes:
    """offset u64 + message body WITHOUT its length prefix
    (response/consume_response.rs:21-28 + message.rs:67-71)."""
    from flyq_spark.functions.codec import serialize_message

    return struct.pack(">Q", offset) + serialize_message(
        key, value, timestamp_ms, headers
    )[4:]


def decode_consume_response(data: bytes) -> dict | None:
    """None for the empty not-found payload (listener.rs:134-139)."""
    if not data:
        return None
    from flyq_spark.functions.codec import deserialize_message

    r = _Reader(data)
    offset = r.u64()
    body = r.rest()
    msg = deserialize_message(struct.pack(">I", len(body)) + body)
    msg["offset"] = offset
    return msg


def encode_watermark_response(low: int, high: int, leo: int) -> bytes:
    """Serialized low, high, leo (watermark_response.rs:13-19)."""
    return struct.pack(">QQQ", low, high, leo)


def decode_watermark_response(data: bytes) -> dict:
    r = _Reader(data)
    return {
        "low_watermark": r.u64(),
        "high_watermark": r.u64(),
        "log_end_offset": r.u64(),
    }


def encode_consumer_lag_response(
    group: str, total_lag: int, partitions: list[dict]
) -> bytes:
    out = _lstr(group) + struct.pack(">QI", total_lag, len(partitions))
    for p in partitions:
        out += (
            _lstr(p["topic"])
            + struct.pack(
                ">IQQQ",
                p["partition"],
                p["committed_offset"],
                p["high_watermark"],
                p["lag"],
            )
        )
    return out


def decode_consumer_lag_response(data: bytes) -> dict:
    r = _Reader(data)
    group = r.lstr()
    total = r.u64()
    n = r.u32()
    parts = []
    for _ in range(n):
        parts.append(
            {
                "topic": r.lstr(),
                "partition": r.u32(),
                "committed_offset": r.u64(),
                "high_watermark": r.u64(),
                "lag": r.u64(),
            }
        )
    return {"group": group, "total_lag": total, "partitions": parts}


def encode_partition_health_response(h: dict) -> bytes:
    out = (
        _lstr(h["topic"])
        + struct.pack(
            ">IIQQQQ",
            h["partition"],
            h["segment_count"],
            h["total_size_bytes"],
            h["low_watermark"],
            h["high_watermark"],
            h["log_end_offset"],
        )
    )
    if h.get("last_cleanup") is None:
        return out + b"\x00"
    return out + b"\x01" + struct.pack(">Q", h["last_cleanup"])


def decode_partition_health_response(data: bytes) -> dict:
    r = _Reader(data)
    out = {
        "topic": r.lstr(),
        "partition": r.u32(),
        "segment_count": r.u32(),
        "total_size_bytes": r.u64(),
        "low_watermark": r.u64(),
        "high_watermark": r.u64(),
        "log_end_offset": r.u64(),
        "last_cleanup": None,
    }
    flag = r.u8()
    if flag not in (0, 1):
        raise ProtocolError(f"invalid option flag {flag}")
    if flag == 1:
        out["last_cleanup"] = r.u64()
    return out
