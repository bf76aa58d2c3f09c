"""CLI driver — the analog of the reference's `main(args)` per-file
conversion loop (IfcSpfReader.java:79-161), as a Ray job entry point:

    python -m ifctordf_ray run --input DIR --output DIR [--mode fast|grouped]
        [--from-events] [--parquet] [--partitions N] [--resume]
    python -m ifctordf_ray bench [--sf-dir DIR]

Flags are named honestly (the reference's usage text says
--remove-duplicates but parses --keep-duplicates, IfcSpfReader.java:80,
109-110 — here dedup of the triple set is always on; it is set semantics,
not an option).

This module OWNS a Ray session (scripts do; library code does not).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="ifctordf_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("run", help="transcripts -> KG partitions")
    r.add_argument("--input", required=True, help="transcript parquet dir/file, or sf dir with --from-events")
    r.add_argument("--output", required=True)
    r.add_argument("--mode", choices=["fast", "grouped"], default="fast")
    r.add_argument("--from-events", action="store_true",
                   help="derive transcripts from <input>/events.parquet")
    r.add_argument("--parquet", action="store_true", help="also write bucketed parquet")
    r.add_argument("--turtle", action="store_true",
                   help="also write Turtle (.ttl with @prefix header) beside the N-Triples")
    r.add_argument("--dedup-turns", action="store_true",
                   help="collapse duplicate turns per conversation and redirect #N refs to the keeper")
    r.add_argument("--partitions", type=int, default=0,
                   help=">0: resumable partitioned run over input files")
    r.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    # same memory-bandwidth-aware execution cap the benchmark applies
    # (bench.py sweep history; override per host via GRAFT_EXEC_CPU_CAP)
    from ifctordf_ray import tuning

    cap = int(os.environ.get("GRAFT_EXEC_CPU_CAP", "16"))
    if args.num_cpus > cap:
        tuning.apply_exec_cpu_cap(cap)

    from ifctordf_ray.pipelines import kg

    try:
        if args.partitions > 0:
            files = sorted(
                glob.glob(os.path.join(args.input, "*.parquet"))
            ) or [args.input]
            entries = kg.run_resumable(
                files, args.output, num_partitions=args.partitions, mode=args.mode
            )
            print(json.dumps({
                "partitions": len(entries),
                "n_triples": sum(e.n_triples for e in entries.values()),
                "skipped": sum(1 for e in entries.values() if e.wall_sec == 0.0),
            }))
        else:
            m = kg.run(
                args.input, args.output, mode=args.mode,
                from_events=args.from_events, parquet=args.parquet,
                turtle=args.turtle, dedup_turns=args.dedup_turns,
            )
            print(json.dumps(m))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
