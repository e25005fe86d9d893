"""Engine configuration, mirroring the reference BrokerConfig.

Reference: flyq-server/src/config.rs:11-23 (fields) and :26-33 (defaults):
``segment_max_bytes = 1 GiB``, ``retention = 7 d``, ``retention_bytes = None``,
``cleanup_interval = 60 s``. FlyQ's segment sizing maps onto Spark file
sizing (``maxRecordsPerFile``); its sparse-index interval
(flyq-server/src/core/constants.rs:3, every 100 records) maps onto parquet
row-group stats granularity and needs no knob of its own.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class EngineConfig:
    # Physical file sizing — analog of FlyQ segment rotation
    # (flyq-server/src/core/partition.rs:116-127). Spark rotates files by
    # record count; at 100 TB the writer should target 128-512 MiB files.
    segment_max_bytes: int = 1 << 30
    max_records_per_file: int = 1_000_000

    # Retention (flyq-server/src/config.rs:26-33). Time retention keys on
    # the data's own `timestamp` column (quirk Q5 in SURVEY §1.4) so it is
    # deterministic and oracle-checkable, unlike the reference's in-memory
    # last-write clock that resets on restart (segment.rs:208).
    retention_ms: int = 7 * 24 * 3600 * 1000
    retention_bytes: int | None = None
    cleanup_interval_s: int = 60

    # Topic defaults (flyq-server/src/core/constants.rs:4-5).
    auto_create_topics: bool = True
    default_partitions: int = 1

    @classmethod
    def from_toml(cls, path: str) -> "EngineConfig":
        """Load from TOML, defaulting missing keys — the analog of
        BrokerConfig::load_or_default (flyq-server/src/config.rs:39-51;
        key names per flyq.toml.example:7-22, durations in seconds)."""
        import tomllib

        with open(path, "rb") as f:
            raw = tomllib.load(f)
        kwargs: dict = {}
        if "segment_max_bytes" in raw:
            kwargs["segment_max_bytes"] = int(raw["segment_max_bytes"])
        if "retention_secs" in raw:
            kwargs["retention_ms"] = int(raw["retention_secs"]) * 1000
        if "retention_bytes" in raw:
            kwargs["retention_bytes"] = int(raw["retention_bytes"])
        if "cleanup_interval_secs" in raw:
            kwargs["cleanup_interval_s"] = int(raw["cleanup_interval_secs"])
        if "max_records_per_file" in raw:
            kwargs["max_records_per_file"] = int(raw["max_records_per_file"])
        if "auto_create_topics" in raw:
            kwargs["auto_create_topics"] = bool(raw["auto_create_topics"])
        if "default_partitions" in raw:
            kwargs["default_partitions"] = int(raw["default_partitions"])
        return cls(**kwargs)

    @classmethod
    def load_or_default(cls, path: str) -> "EngineConfig":
        import os

        return cls.from_toml(path) if os.path.exists(path) else cls()
