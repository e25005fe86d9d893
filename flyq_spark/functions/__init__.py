"""Function library: codecs and hashing helpers."""

from flyq_spark.functions.codec import (
    deserialize_message,
    from_flyq_bytes_udf,
    serialize_message,
    to_flyq_bytes_udf,
)

__all__ = [
    "serialize_message",
    "deserialize_message",
    "to_flyq_bytes_udf",
    "from_flyq_bytes_udf",
]
