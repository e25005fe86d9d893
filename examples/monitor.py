"""Monitor example (A29) — the PySpark analog of
flyq-client/examples/monitor.rs:20-91: poll watermarks + partition health
+ consumer lag for every topic, flagging lag over the reference's alert
thresholds (warn > 1000, notice > 100; monitor.rs:78-81).

Usage:
    python examples/monitor.py <base_dir> <group> [--loop SECONDS]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

WARN_LAG = 1000
NOTICE_LAG = 100


def severity(lag: int) -> str:
    if lag > WARN_LAG:
        return "WARN"
    if lag > NOTICE_LAG:
        return "NOTICE"
    return "ok"


def poll(engine, group: str) -> None:
    for topic in engine.list_topics():
        for p in range(engine.topic_partitions(topic)):
            low, high, leo = engine.get_watermark(topic, p)
            health = engine.get_partition_health(topic, p)
            print(
                f"{topic}[{p}] watermarks=({low},{high},{leo}) "
                f"segments={health['segment_count']} "
                f"size={health['total_size_bytes']}B"
            )
    lag = engine.get_consumer_lag(group)
    for part in lag["partitions"]:
        print(
            f"  group={group} {part['topic']}[{part['partition']}] "
            f"committed={part['committed_offset']} lag={part['lag']} "
            f"[{severity(part['lag'])}]"
        )
    print(f"  total_lag={lag['total_lag']}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("base_dir")
    ap.add_argument("group")
    ap.add_argument("--loop", type=float, default=0, help="poll interval; 0 = once")
    args = ap.parse_args()

    from flyq_spark.engine import FlyQEngine
    from flyq_spark.session import get_spark

    engine = FlyQEngine(get_spark("flyq_monitor"), args.base_dir)
    while True:
        poll(engine, args.group)
        if not args.loop:
            break
        time.sleep(args.loop)


if __name__ == "__main__":
    main()
