"""Command-line entry points — the ``ray job submit`` surface.

Usage (each command owns its Ray session; the driver-facing __ray_entry__
module never calls ray.init):

  python -m debezium_connector_db2_ray.cli snapshot \
      --lake /data/lake --out /data/target --snapshot-lsn 1000
  python -m debezium_connector_db2_ray.cli replay \
      --changelog /data/log --out /data/target --to-lsn 500000 --windows 4
  python -m debezium_connector_db2_ray.cli state --out /data/target --dest /data/export
  python -m debezium_connector_db2_ray.cli compact --out /data/target
  python -m debezium_connector_db2_ray.cli metrics --out /data/target

Connector-level surface (one task, many captured tables — the reference's
Db2Connector.java:55-61 single-task model; per-table lakes live under a
shared root):

  python -m debezium_connector_db2_ray.cli connector snapshot \
      --root /data/lakehouse --lake TABLEA=/data/a.parquet \
      --lake TABLEB=/data/b.parquet --snapshot-lsn 1000
  python -m debezium_connector_db2_ray.cli connector replay \
      --root /data/lakehouse --stream /data/stream.parquet --to-lsn 500000 \
      --windows 4 [--lake TABLEA=/data/a.parquet ...]  # lakes enable signals
  python -m debezium_connector_db2_ray.cli connector status --root /data/lakehouse
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False, ignore_reinit_error=True,
            logging_level="ERROR",
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    return ray


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="db2ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("snapshot")
    sp.add_argument("--lake", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--snapshot-lsn", type=int, required=True)
    sp.add_argument("--partitions", type=int, default=32)
    sp.add_argument("--salt", type=int, default=1)
    sp.add_argument("--chunks", type=int, default=0, help=">0: incremental")
    sp.add_argument("--mode", default="initial",
                    help="initial | always | initial_only | no_data | "
                    "schema_only | when_needed | configuration_based")

    rp = sub.add_parser("replay")
    rp.add_argument("--changelog", required=True)
    rp.add_argument("--out", required=True)
    rp.add_argument("--from-lsn", type=int, default=None,
                    help="default: resume from committed watermark")
    rp.add_argument("--to-lsn", type=int, required=True)
    rp.add_argument("--windows", type=int, default=4)
    rp.add_argument("--partitions", type=int, default=32)
    rp.add_argument("--salt", type=int, default=1)
    rp.add_argument("--exchange", choices=("shuffle", "write"), default="shuffle")
    rp.add_argument("--no-validate", action="store_true")
    rp.add_argument("--signal-lake", default=None,
                    help="parquet path of the current source table; enables "
                    "draining the signal channel between windows")

    st = sub.add_parser("state")
    st.add_argument("--out", required=True)
    st.add_argument("--dest", required=True)

    cp = sub.add_parser("compact")
    cp.add_argument("--out", required=True)
    cp.add_argument("--partitions", type=int, default=None,
                    help="default: keep the lake's live partitioning")
    cp.add_argument("--salt", type=int, default=None,
                    help="default: keep the lake's live salt")

    mp = sub.add_parser("metrics")
    mp.add_argument("--out", required=True)

    sg = sub.add_parser("signal", help="enqueue a durable signal; the replay "
                        "loop drains it between windows")
    sg.add_argument("--out", required=True)
    sg.add_argument("--type", required=True,
                    help="execute-snapshot | log | ...")
    sg.add_argument("--data", default="{}", help="JSON payload, e.g. "
                    '\'{"type": "INCREMENTAL", "chunks": 4}\'')

    cn = sub.add_parser("connector", help="multi-table coordinator (one "
                        "task, many captured tables)")
    csub = cn.add_subparsers(dest="ccmd", required=True)

    def _common(cp_):
        cp_.add_argument("--root", required=True)
        cp_.add_argument("--partitions", type=int, default=32)
        cp_.add_argument("--salt", type=int, default=1)
        cp_.add_argument("--include", default=None,
                         help="comma-separated table.include.list")
        cp_.add_argument("--exclude", default="",
                         help="comma-separated table.exclude.list")

    cs = csub.add_parser("snapshot")
    _common(cs)
    cs.add_argument("--lake", action="append", default=[], metavar="TABLE=PATH",
                    required=True)
    cs.add_argument("--snapshot-lsn", type=int, required=True)
    cs.add_argument("--mode", default="initial")

    cr = csub.add_parser("replay")
    _common(cr)
    cr.add_argument("--stream", required=True,
                    help="shared changelog parquet carrying the routing column")
    cr.add_argument("--routing-col", default="src_table")
    cr.add_argument("--from-lsn", type=int, default=None,
                    help="default: resume from the earliest per-table watermark")
    cr.add_argument("--to-lsn", type=int, required=True)
    cr.add_argument("--windows", type=int, default=4)
    cr.add_argument("--exchange", choices=("shuffle", "write"),
                    default="shuffle")
    cr.add_argument("--no-validate", action="store_true")
    cr.add_argument("--lake", action="append", default=[], metavar="TABLE=PATH",
                    help="current source lakes; providing them enables "
                    "draining root + per-table signal channels between windows")

    ct = csub.add_parser("status")
    ct.add_argument("--root", required=True)

    args = p.parse_args(argv)

    from debezium_connector_db2_ray.lsn import Lsn
    from debezium_connector_db2_ray.pipelines.replay import CdcEngine
    from debezium_connector_db2_ray.state.manifest import committed_watermark

    if args.cmd == "signal":
        from debezium_connector_db2_ray.state.signals import send_signal

        sid = send_signal(args.out, args.type, json.loads(args.data))
        print(json.dumps({"signal_id": sid}))
        return 0

    if args.cmd == "metrics":
        from dataclasses import asdict

        from debezium_connector_db2_ray.metrics import catalog, collect_metrics

        m = collect_metrics(args.out)
        print(json.dumps({"metrics": asdict(m), "catalog": catalog(args.out)},
                         default=str, indent=1))
        return 0

    if args.cmd == "connector" and args.ccmd == "status":
        import os

        from debezium_connector_db2_ray.state.manifest import load_manifests

        out = {}
        root = args.root
        if os.path.isdir(root):
            for t in sorted(os.listdir(root)):
                tdir = os.path.join(root, t)
                if not os.path.isdir(os.path.join(tdir, "_manifests")):
                    continue
                wm = committed_watermark(tdir)
                ms = load_manifests(tdir)
                out[t] = {
                    "watermark": wm.to_int() if wm is not None else None,
                    "windows": len(ms),
                    "kinds": sorted({m.kind for m in ms}),
                }
        print(json.dumps({"tables": out}))
        return 0

    ray = _ray_init(args.num_cpus)
    try:
        import ray.data as rd

        if args.cmd == "snapshot":
            eng = CdcEngine(
                out_dir=args.out, num_partitions=args.partitions,
                salt=args.salt,
            )
            lake = rd.read_parquet(args.lake)
            fence = Lsn.from_int(args.snapshot_lsn)
            if args.chunks > 0:
                ms = eng.incremental_snapshot(lake, fence, n_chunks=args.chunks)
            else:
                m = eng.run_snapshot(lake, fence, mode=args.mode)
                ms = [m] if m is not None else []
            print(json.dumps({"committed_windows": [m.window_id for m in ms]}))
        elif args.cmd == "replay":
            eng = CdcEngine(
                out_dir=args.out,
                num_partitions=args.partitions,
                salt=args.salt,
                exchange=args.exchange,
                validate_pairs=not args.no_validate and args.exchange == "shuffle",
            )
            if args.from_lsn is not None:
                from_lsn = Lsn.from_int(args.from_lsn)
            else:
                wm = committed_watermark(args.out)
                if wm is None:
                    print("no committed watermark and no --from-lsn", file=sys.stderr)
                    return 2
                from_lsn = wm
            ms = eng.replay_from_parquet(
                args.changelog, from_lsn, Lsn.from_int(args.to_lsn), args.windows,
                signal_lake=(
                    (lambda: rd.read_parquet(args.signal_lake))
                    if args.signal_lake else None
                ),
            )
            print(json.dumps({"committed_windows": [m.window_id for m in ms]}))
        elif args.cmd == "connector":
            from debezium_connector_db2_ray.connector import CdcConnector

            conn = CdcConnector(
                root_dir=args.root,
                num_partitions=args.partitions,
                salt=args.salt,
                table_include=(
                    tuple(x for x in args.include.split(",") if x)
                    if args.include is not None else None
                ),
                table_exclude=tuple(
                    x for x in args.exclude.split(",") if x
                ),
                **(
                    {"exchange": args.exchange,
                     "validate_pairs": not args.no_validate
                     and args.exchange == "shuffle"}
                    if args.ccmd == "replay" else {}
                ),
            )
            lakes = {}
            for spec in args.lake:
                table, _, path = spec.partition("=")
                if not path:
                    print(f"--lake expects TABLE=PATH, got {spec!r}",
                          file=sys.stderr)
                    return 2
                lakes[table] = (lambda pth=path: rd.read_parquet(pth))
            if args.ccmd == "snapshot":
                snaps = conn.snapshot_all(
                    {t: f() for t, f in lakes.items()},
                    Lsn.from_int(args.snapshot_lsn), mode=args.mode,
                )
                print(json.dumps(
                    {"snapshots": {
                        t: (m.window_id if m is not None else None)
                        for t, m in snaps.items()
                    }}
                ))
            else:  # replay
                conn.routing_col = args.routing_col
                stream = rd.read_parquet(args.stream)
                # discover ONCE (full-stream unique() scan) and pass the list
                # into replay; quiet-but-captured lake tables are unioned in
                # so their heartbeat windows keep advancing their watermarks
                tables = conn.discover_tables(stream)
                if lakes:
                    tables = sorted(
                        set(tables) | {t for t in lakes if conn.captures(t)}
                    )
                if args.from_lsn is not None:
                    from_lsn = Lsn.from_int(args.from_lsn)
                else:
                    wms = [
                        committed_watermark(conn.engine(t).out_dir)
                        for t in tables
                    ]
                    wms = [w for w in wms if w is not None]
                    if not wms:
                        print("no committed watermark and no --from-lsn",
                              file=sys.stderr)
                        return 2
                    from_lsn = min(wms)
                ms = conn.replay(
                    stream, from_lsn, Lsn.from_int(args.to_lsn),
                    args.windows, lakes=lakes or None, tables=tables,
                )
                print(json.dumps(
                    {"streams": {
                        t: [m.window_id for m in mm] for t, mm in ms.items()
                    }}
                ))
        elif args.cmd == "state":
            eng = CdcEngine(out_dir=args.out)
            eng.state_dataset().write_parquet(args.dest)
            print(json.dumps({"dest": args.dest}))
        elif args.cmd == "compact":
            # compact() re-tags rows under the engine's partitioning, so the
            # default must be the lake's LIVE (num_partitions, salt) — not the
            # constructor defaults — or a bare `compact` silently repartitions
            from debezium_connector_db2_ray.state.manifest import (
                live_partitioning,
            )

            live = live_partitioning(args.out) or {}
            kwargs = dict(
                out_dir=args.out,
                num_partitions=args.partitions
                or live.get("num_partitions", 32),
                salt=args.salt or live.get("salt", 1),
            )
            if live.get("key"):
                # a custom-PK lake must compact under ITS key, not the
                # default — collapsing by the wrong key loses data
                kwargs["key_columns"] = tuple(live["key"])
            eng = CdcEngine(**kwargs)
            m = eng.compact()
            print(json.dumps({"compaction_window": m.window_id}))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
