"""Monitor over the WIRE protocol — the reference's monitor example
(flyq-client/examples/monitor.rs:20-91) run the way the reference runs
it: a protocol client polling a TCP broker, here the flyq_spark server.

Where examples/monitor.py calls the engine's Python API in-process, this
one exercises the full A25-A27 stack: frame codec -> TCP -> dispatch ->
engine. Same alert thresholds (warn > 1000, notice > 100).

Usage:
    python examples/wire_monitor.py <host> <port> <group> <topic> [topic...]

(The wire protocol has no list-topics op — the reference client names
its topics too — so topics are arguments.)
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

WARN_LAG = 1000
NOTICE_LAG = 100


def severity(lag: int) -> str:
    if lag > WARN_LAG:
        return "WARN"
    if lag > NOTICE_LAG:
        return "NOTICE"
    return "ok"


def poll(cli, group: str, topics: list[str]) -> list[str]:
    """One monitor sweep; returns the printed lines (testable)."""
    lines = []
    for topic in topics:
        p = 0
        while True:
            health = cli.partition_health(topic, p)
            if p > 0 and health["log_end_offset"] == 0 and health["segment_count"] == 0:
                break  # past the last populated partition
            wm = cli.watermark(topic, p)
            lines.append(
                f"{topic}[{p}] watermarks=({wm['low_watermark']},"
                f"{wm['high_watermark']},{wm['log_end_offset']}) "
                f"segments={health['segment_count']} "
                f"size={health['total_size_bytes']}B"
            )
            p += 1
            if p > 1024:
                break
    lag = cli.consumer_lag(group, topics)
    for part in lag["partitions"]:
        lines.append(
            f"  group={group} {part['topic']}[{part['partition']}] "
            f"committed={part['committed_offset']} lag={part['lag']} "
            f"[{severity(part['lag'])}]"
        )
    lines.append(f"  total_lag={lag['total_lag']}")
    return lines


def main() -> None:
    host, port, group, *topics = sys.argv[1:]
    from flyq_spark.server import FlyQWireClient

    with FlyQWireClient(host, int(port)) as cli:
        for line in poll(cli, group, topics):
            print(line)


if __name__ == "__main__":
    main()
