"""FlyQ message wire codec (A23) — byte-exact restatement of
flyq-protocol/src/message.rs.

Layout (message.rs:1-11, all integers big-endian):

    [message_length : u32]      # excludes the length field itself
    [timestamp      : u64]      # epoch millis
    [key_len : u32][key bytes]  # key_len 0 <=> no key
    [value_len : u32][value bytes]
    [header_count : u32][(key_len:u32, key, val_len:u32, val)*]

Decode quirks inherited on purpose (quirk Q1 in SURVEY §1.4):

- a zero-length key decodes as None (message.rs:83-92), so empty key and
  no key are indistinguishable after a round-trip;
- zero headers decode as None (message.rs:124-128).

The engine itself stores struct columns (parquet framing replaces the
wire format — SURVEY A24/A25 are N/A); this codec exists for fixture
parity and for interchange with byte-oriented FlyQ clients. The Spark
entry points are Arrow-batched pandas UDFs (``to_flyq_bytes_udf`` /
``from_flyq_bytes_udf``) so encode/decode runs per batch, not per row.
"""

from __future__ import annotations

import struct

import pandas as pd


class CodecError(ValueError):
    """Decode failure (analog of flyq-protocol DeserializeError)."""


def serialize_message(
    key: bytes | None,
    value: bytes,
    timestamp_ms: int,
    headers: list[tuple[str, bytes]] | None = None,
) -> bytes:
    """message.rs:25-64 (serialize_body), length prefix included."""
    parts = [struct.pack(">Q", timestamp_ms)]
    k = key or b""
    parts.append(struct.pack(">I", len(k)))
    parts.append(k)
    parts.append(struct.pack(">I", len(value)))
    parts.append(value)
    hs = headers or []
    parts.append(struct.pack(">I", len(hs)))
    for hk, hv in hs:
        hkb = hk.encode("utf-8")
        parts.append(struct.pack(">I", len(hkb)))
        parts.append(hkb)
        parts.append(struct.pack(">I", len(hv)))
        parts.append(hv)
    body = b"".join(parts)
    return struct.pack(">I", len(body)) + body


def deserialize_message(buf: bytes) -> dict:
    """message.rs:73-130: returns {key, value, timestamp, headers} with the
    empty-key->None and zero-headers->None quirks."""
    if len(buf) < 4:
        raise CodecError("truncated length prefix")
    (msg_len,) = struct.unpack_from(">I", buf, 0)
    if len(buf) < 4 + msg_len:
        raise CodecError("truncated body")
    pos = 4
    (timestamp_ms,) = struct.unpack_from(">Q", buf, pos)
    pos += 8
    (key_len,) = struct.unpack_from(">I", buf, pos)
    pos += 4
    key = bytes(buf[pos : pos + key_len]) if key_len else None  # Q1
    pos += key_len
    (value_len,) = struct.unpack_from(">I", buf, pos)
    pos += 4
    value = bytes(buf[pos : pos + value_len])
    pos += value_len
    (header_count,) = struct.unpack_from(">I", buf, pos)
    pos += 4
    headers: list[tuple[str, bytes]] | None = None
    if header_count:
        headers = []
        for _ in range(header_count):
            (hk_len,) = struct.unpack_from(">I", buf, pos)
            pos += 4
            hk = bytes(buf[pos : pos + hk_len]).decode("utf-8")
            pos += hk_len
            (hv_len,) = struct.unpack_from(">I", buf, pos)
            pos += 4
            headers.append((hk, bytes(buf[pos : pos + hv_len])))
            pos += hv_len
    return {"key": key, "value": value, "timestamp": timestamp_ms, "headers": headers}


def to_flyq_bytes_udf():
    """pandas UDF: (key, value, timestamp_ms, headers) columns -> wire
    bytes. ``timestamp`` is epoch millis (long)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def encode(
        key: pd.Series, value: pd.Series, timestamp: pd.Series, headers: pd.Series
    ) -> pd.Series:
        out = []
        for k, v, ts, hs in zip(key, value, timestamp, headers):
            hlist = (
                [(h["key"], bytes(h["value"])) for h in hs]
                if hs is not None and len(hs) > 0
                else None
            )
            out.append(
                serialize_message(
                    bytes(k) if k is not None else None, bytes(v), int(ts), hlist
                )
            )
        return pd.Series(out)

    return encode


def from_flyq_bytes_udf():
    """pandas UDF: wire bytes -> struct(key, value, timestamp, headers)."""
    from pyspark.sql.functions import pandas_udf

    out_type = (
        "key binary, value binary, timestamp long, "
        "headers array<struct<key string, value binary>>"
    )

    @pandas_udf(out_type)
    def decode(buf: pd.Series) -> pd.DataFrame:
        rows = []
        for b in buf:
            m = deserialize_message(bytes(b))
            rows.append(
                {
                    "key": m["key"],
                    "value": m["value"],
                    "timestamp": m["timestamp"],
                    "headers": (
                        [{"key": k, "value": v} for k, v in m["headers"]]
                        if m["headers"]
                        else None
                    ),
                }
            )
        return pd.DataFrame(rows)

    return decode
