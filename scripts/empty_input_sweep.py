"""Zero-block robustness sweep: run EVERY queries() entry against a
fully-empty copy of the input tables (0-row parquet, same schemas) and
report crashers.

This is the full-coverage sibling of tests/test_empty_input.py (which
keeps only one representative query per fix mechanism — the full sweep
is ~150 pipelines and too slow for the 4-CPU pytest session).  Run it
after touching any Dataset.join / groupby-adjacent plumbing:

    python scripts/empty_input_sweep.py [sf_dir]

Empty inputs are the shape of an all-filtered scan, an empty partition
of a partitioned run, or a new-day incremental batch; before
kernels.safe_join these crashed inside Ray's hash-shuffle join
aggregator (`ArrowInvalid: No match ... FieldRef.Name(...)` — a
zero-BLOCK input gives the shuffle no first block to broadcast a schema
from).
"""
import os
import sys
import traceback

import pyarrow.parquet as pq
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = "/tmp/empty_sf_sweep"
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tab = pq.read_table(os.path.join(src, f"{t}.parquet"))
        pq.write_table(tab.slice(0, 0), os.path.join(dst, f"{t}.parquet"))

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, log_to_driver=False)
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as E

    ok, bad = [], []
    for name, fn in E.queries().items():
        try:
            res = fn(dst)
            n = res.count() if hasattr(res, "count") else len(res)
            ok.append((name, n))
            print(f"OK   {name}: {n}", flush=True)
        except Exception:
            msg = traceback.format_exc().strip().splitlines()[-1]
            bad.append((name, msg))
            print(f"FAIL {name}: {msg}", flush=True)

    print(f"\n=== SUMMARY === ok={len(ok)} fail={len(bad)}")
    for name, msg in bad:
        print(f"  {name}: {msg[:200]}")
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
