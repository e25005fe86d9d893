"""Command-line client for the engine — the usable form of the
reference's client binary (flyq-client/src/main.rs is a hardcoded
consume demo; flyq-client/src/client.rs:58-291 defines the op surface
this CLI exposes one subcommand each).

    python -m flyq_spark.cli --base-dir /data/logs create-topic events -p 4
    echo -n 'payload' | python -m flyq_spark.cli --base-dir /data/logs \
        produce events --key user-1
    python -m flyq_spark.cli --base-dir /data/logs consume events 0 0
    python -m flyq_spark.cli --base-dir /data/logs lag my-group
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _row_to_dict(row) -> dict:
    d = row.asDict(recursive=True)
    for k, v in list(d.items()):
        if isinstance(v, (bytes, bytearray)):
            d[k] = bytes(v).decode("utf-8", "replace")
    if d.get("headers"):
        d["headers"] = [
            {"key": h["key"], "value": bytes(h["value"]).decode("utf-8", "replace")}
            for h in d["headers"]
        ]
    ts = d.get("timestamp")
    if ts is not None and not isinstance(ts, (int, float, str)):
        d["timestamp"] = ts.isoformat()
    return d


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="flyq-spark")
    ap.add_argument("--base-dir", required=True)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("create-topic", help="create a topic")
    p.add_argument("topic")
    p.add_argument("-p", "--partitions", type=int, default=None)

    p = sub.add_parser("topics", help="list topics")

    p = sub.add_parser("produce", help="append one message (value from --value or stdin)")
    p.add_argument("topic")
    p.add_argument("--key", default=None)
    p.add_argument("--value", default=None)
    p.add_argument("--header", action="append", default=[], metavar="K=V")

    p = sub.add_parser("consume", help="point read")
    p.add_argument("topic")
    p.add_argument("partition", type=int)
    p.add_argument("offset", type=int)

    p = sub.add_parser("consume-group", help="read at the group's committed offset")
    p.add_argument("topic")
    p.add_argument("partition", type=int)
    p.add_argument("group")

    p = sub.add_parser("commit", help="commit a consumer offset")
    p.add_argument("group")
    p.add_argument("topic")
    p.add_argument("partition", type=int)
    p.add_argument("offset", type=int)

    p = sub.add_parser("watermark", help="(low, high, leo) of a partition")
    p.add_argument("topic")
    p.add_argument("partition", type=int)

    p = sub.add_parser("lag", help="consumer lag (all topics or --topic)")
    p.add_argument("group")
    p.add_argument("--topic", default=None)

    p = sub.add_parser("health", help="partition health")
    p.add_argument("topic")
    p.add_argument("partition", type=int)

    p = sub.add_parser("retention", help="apply retention policies now")
    p.add_argument("topic")
    p.add_argument("--retention-ms", type=int, default=None)
    p.add_argument("--retention-bytes", type=int, default=None)

    p = sub.add_parser("repair", help="rebuild topic meta from data files")
    p.add_argument("topic")

    p = sub.add_parser(
        "maintain",
        help="run maintenance cycles (retention + compaction) — the "
        "scheduled analog of the reference's flush/cleanup daemons "
        "(flyq-server/src/runtime/flush.rs:75-107)",
    )
    p.add_argument("topic")
    p.add_argument(
        "--interval", type=float, default=None,
        help="seconds between cycles; omit for a single on-demand cycle",
    )
    p.add_argument(
        "--ticks", type=int, default=None,
        help="stop after N cycles (default: run until interrupted)",
    )
    p.add_argument("--retention-ms", type=int, default=None)
    p.add_argument("--retention-bytes", type=int, default=None)
    p.add_argument("--compact-above-files", type=int, default=16)

    p = sub.add_parser("describe", help="topic summary: partitions, watermarks, config, files")
    p.add_argument("topic")

    p = sub.add_parser("seek", help="earliest offset per partition with ts >= millis")
    p.add_argument("topic")
    p.add_argument("ts_millis", type=int)

    p = sub.add_parser(
        "delete-records",
        help="truncate a partition below an offset (low watermark advances)",
    )
    p.add_argument("topic")
    p.add_argument("partition", type=int)
    p.add_argument("before_offset", type=int)

    p = sub.add_parser(
        "sql",
        help="run a SQL statement over the broker views (flyq_<topic>, "
        "flyq_consumer_offsets, flyq_watermarks)",
    )
    p.add_argument("statement")
    p.add_argument(
        "--limit", type=int, default=100, help="max rows printed (default 100)"
    )
    p = sub.add_parser(
        "files",
        help="per-file parquet footer stats under a path (metadata-only); "
        "optionally a skip report for --column between --lo and --hi",
    )
    p.add_argument("path")
    p.add_argument("--column", default=None)
    p.add_argument("--lo", type=int, default=None)
    p.add_argument("--hi", type=int, default=None)

    p = sub.add_parser(
        "compact-plan",
        help="deterministic FFD small-file merge plan per directory "
        "(metadata-only; execution is `maintain`/compact_partition)",
    )
    p.add_argument("path")
    p.add_argument("--target-bytes", type=int, default=128 * 1024 * 1024)

    p = sub.add_parser(
        "serve",
        help="run the FlyQ wire-protocol TCP server (A27) over this "
        "engine so stock-protocol clients can connect",
    )
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=9092)
    p.add_argument(
        "--ticks",
        type=int,
        default=None,
        help=argparse.SUPPRESS,  # test hook: serve N seconds then exit
    )
    return ap


def run(args, engine) -> dict:
    """Dispatch one parsed command against an engine; returns a JSON-able
    result (separated from main() so tests drive it with a live engine)."""
    if args.cmd == "create-topic":
        engine.create_topic(args.topic, args.partitions)
        return {"created": args.topic, "partitions": engine.topic_partitions(args.topic)}
    if args.cmd == "topics":
        return {"topics": engine.list_topics()}
    if args.cmd == "produce":
        value = args.value.encode() if args.value is not None else sys.stdin.buffer.read()
        headers = []
        for kv in args.header:
            if "=" not in kv:
                raise SystemExit(
                    f"--header {kv!r}: expected KEY=VALUE"
                )
            hk, hv = kv.split("=", 1)
            headers.append((hk, hv.encode()))
        headers = headers or None
        acks = engine.produce(
            args.topic,
            [
                {
                    # `is not None`: --key "" is the EMPTY key (which the
                    # codec conflates with no-key on the wire, quirk Q1,
                    # but routing must still hash it consistently)
                    "key": args.key.encode() if args.key is not None else None,
                    "value": value,
                    "timestamp": int(time.time() * 1000),
                    "headers": headers,
                }
            ],
        )
        return {"partition": acks[0][0], "offset": acks[0][1]}
    if args.cmd == "consume":
        row = engine.consume(args.topic, args.partition, args.offset)
        return {"message": _row_to_dict(row) if row else None}
    if args.cmd == "consume-group":
        got = engine.consume_with_group(args.topic, args.partition, args.group)
        if got is None:
            return {"committed": None, "message": None}
        committed, row = got
        return {"committed": committed, "message": _row_to_dict(row)}
    if args.cmd == "commit":
        engine.commit_offset(args.group, args.topic, args.partition, args.offset)
        return {"committed": args.offset}
    if args.cmd == "watermark":
        low, high, leo = engine.get_watermark(args.topic, args.partition)
        return {"low_watermark": low, "high_watermark": high, "log_end_offset": leo}
    if args.cmd == "lag":
        return engine.get_consumer_lag(args.group, args.topic)
    if args.cmd == "health":
        return engine.get_partition_health(args.topic, args.partition)
    if args.cmd == "retention":
        deleted = engine.apply_retention(
            args.topic,
            retention_ms=args.retention_ms,
            retention_bytes=args.retention_bytes,
        )
        return {"deleted_files": deleted}
    if args.cmd == "describe":
        return engine.describe_topic(args.topic)
    if args.cmd == "seek":
        return {"offsets": engine.offsets_for_times(args.topic, args.ts_millis)}
    if args.cmd == "delete-records":
        return {"deleted": engine.delete_records(args.topic, args.partition, args.before_offset)}
    if args.cmd == "sql":
        engine.register_views()
        rows = engine.spark.sql(args.statement).limit(args.limit).collect()
        return {"rows": [r.asDict(recursive=True) for r in rows]}
    if args.cmd == "repair":
        return {"meta": engine.repair_topic(args.topic)}
    if args.cmd == "files":
        from flyq_spark.operators import pruning

        cols = [args.column] if args.column else []
        st = pruning.file_stats(engine.spark, args.path, cols)
        if args.column and args.lo is not None and args.hi is not None:
            st = pruning.skipping_report(st, args.column, args.lo, args.hi)
        return {"files": [r.asDict() for r in st.orderBy("file").collect()]}
    if args.cmd == "compact-plan":
        from flyq_spark.operators import pruning

        plan = pruning.compaction_plan(
            pruning.file_sizes(engine.spark, args.path), args.target_bytes
        )
        rows = plan.orderBy("dir", "bin_id", "file").collect()
        n_bins = len({(r["dir"], r["bin_id"]) for r in rows})
        return {
            "n_files": len(rows),
            "n_bins": n_bins,
            "plan": [r.asDict() for r in rows],
        }
    if args.cmd == "serve":
        from flyq_spark.server import FlyQServer

        with FlyQServer(engine, host=args.host, port=args.port) as srv:
            if args.ticks is not None:  # test hook: bounded lifetime
                time.sleep(args.ticks)
            else:  # pragma: no cover - interactive path
                try:
                    while True:
                        time.sleep(3600)
                except KeyboardInterrupt:
                    pass
            return {"served": f"{srv.host}:{srv.port}"}
    if args.cmd == "maintain":
        ticks = []
        n = 0
        while True:
            ticks.append(
                engine.maintain_topic(
                    args.topic,
                    retention_ms=args.retention_ms,
                    retention_bytes=args.retention_bytes,
                    compact_above_files=args.compact_above_files,
                )
            )
            n += 1
            if args.interval is None or (args.ticks is not None and n >= args.ticks):
                return {"ticks": ticks}
            time.sleep(args.interval)
    raise SystemExit(f"unknown command {args.cmd}")


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from flyq_spark.engine import FlyQEngine
    from flyq_spark.session import get_spark

    engine = FlyQEngine(get_spark("flyq_cli"), args.base_dir)
    print(json.dumps(run(args, engine), default=str))


if __name__ == "__main__":
    main()
