"""Multi-consumer group over the WIRE protocol — the worked sequel to
examples/wire_monitor.py: several protocol clients share one consumer
group by deriving DISJOINT partition assignments client-side
(flyq_spark.engine.assign_partitions — the reference broker has no
coordinator; its groups are a bare offset map, offset_tracker.rs:36-54,
so coordination is the clients' job, exactly like pre-KIP-848 Kafka
clients running client-side assignors).

The demo shows the full lifecycle:

1. N consumers, each on its own TCP connection, agree on the sorted
   member list and independently derive the same assignment — no
   coordinator round-trip, no shared state beyond the member list.
2. Each drains ONLY its partitions via consume_with_group +
   commit_offset(offset + 1), the reference's at-least-once loop.
3. One consumer "crashes". The survivors re-derive the assignment from
   the shrunken member list alone and pick up the orphaned partitions;
   committed offsets make the handoff exactly-once at the group level
   (the new owner resumes where the dead consumer committed).

Usage:
    python examples/group_consumers.py <base_dir> [n_partitions] [n_consumers]
"""

from __future__ import annotations

import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GROUP = "workers"


def drain_partition(cli, topic: str, partition: int, group: str) -> list[bytes]:
    """The reference consume loop: consume_with_group reads at the
    committed offset; committing record.offset + 1 advances past the
    record just read (across truncation gaps too — the server returns
    the record's ACTUAL offset)."""
    out = []
    while True:
        msg = cli.consume_with_group(topic, partition, group)
        if msg is None:
            return out
        out.append(msg["value"])
        cli.commit_offset(topic, partition, group, msg["offset"] + 1)


def run_consumer(
    host: str,
    port: int,
    topic: str,
    me: str,
    members: list[str],
    n_partitions: int,
    strategy: str,
    results: dict,
) -> None:
    """One group member: derive my share from (member list, partition
    count), drain it on my own connection. Thread-safe by construction —
    assignments are disjoint, so members never touch the same
    (partition, group) offset."""
    from flyq_spark.engine import assign_partitions
    from flyq_spark.server import FlyQWireClient

    mine = assign_partitions(n_partitions, members, strategy)[me]
    got: dict[int, list[bytes]] = {}
    with FlyQWireClient(host, port) as cli:
        for p in mine:
            got[p] = drain_partition(cli, topic, p, GROUP)
    results[me] = got


def run_group(
    host: str,
    port: int,
    topic: str,
    n_partitions: int,
    members: list[str],
    strategy: str = "range",
) -> dict[str, dict[int, list[bytes]]]:
    """One assignment generation: every member consumes its share
    concurrently. Returns {member: {partition: [values]}}."""
    results: dict[str, dict[int, list[bytes]]] = {}
    threads = [
        threading.Thread(
            target=run_consumer,
            args=(host, port, topic, m, members, n_partitions, strategy, results),
        )
        for m in members
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return results


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    base_dir = sys.argv[1]
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    n_consumers = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from flyq_spark.engine import FlyQEngine
    from flyq_spark.server import FlyQServer, FlyQWireClient
    from flyq_spark.session import get_spark

    topic = "jobs"
    engine = FlyQEngine(get_spark("group-consumers"), base_dir)
    engine.create_topic(topic, partitions=n_parts)
    members = [f"c{i}" for i in range(n_consumers)]

    with FlyQServer(engine) as srv:
        with FlyQWireClient(srv.host, srv.port) as producer:
            for i in range(n_parts * 4):
                producer.produce(topic, f"job-{i}".encode())

        res = run_group(srv.host, srv.port, topic, n_parts, members)
        for m in sorted(res):
            for p, vals in sorted(res[m].items()):
                print(f"{m} <- {topic}[{p}]: {len(vals)} messages")

        # crash c0; survivors re-derive and pick up its partitions
        with FlyQWireClient(srv.host, srv.port) as producer:
            for i in range(n_parts * 2):
                producer.produce(topic, f"late-{i}".encode())
        survivors = members[1:]
        res2 = run_group(srv.host, srv.port, topic, n_parts, survivors)
        print(f"after {members[0]} crash:")
        for m in sorted(res2):
            for p, vals in sorted(res2[m].items()):
                print(f"{m} <- {topic}[{p}]: {len(vals)} messages")


if __name__ == "__main__":
    main()
