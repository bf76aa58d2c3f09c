"""A/B harness: sort-based distinct() vs a custom one-pass range shuffle.

Variant "sort"   — the shipped distinct() (Ray Data sort on the int64
                   first-8-bytes key + per-block adjacent dedup).
Variant "custom" — raw-Ray two-stage shuffle: sample block key ranges,
                   split each extract block by static bounds
                   (searchsorted, no map-side sort), one reduce task per
                   key range doing concat + ONE Arrow multi-column sort +
                   vectorized adjacent dedup.  The exchange moves only
                   (subj, pred_id, obj) — no __k8 column (8 B/row less).

Usage: RAY_GRAFT_CPUS=8 python scripts/exchange_ab.py [sort|custom|both]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "8"))
REP = int(os.environ.get("GRAFT_BENCH_REPLICATE", "20"))
SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
MODE = sys.argv[1] if len(sys.argv) > 1 else "both"


def main() -> None:
    ray.init(
        address="local",
        num_cpus=NCPU,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ifctordf_ray import tuning

    cap = int(os.environ.get("GRAFT_EXEC_CPU_CAP", "16"))
    if NCPU > cap:
        tuning.apply_exec_cpu_cap(cap)

    from ifctordf_ray.sources.transcripts import transcripts_from_events
    from ifctordf_ray.stages import extract as X

    def build():
        tr = transcripts_from_events(SF, replicate=REP, drop_dangling=True)
        return tr.map_batches(
            X.extract_triples_fn, batch_format="pyarrow", batch_size=8192
        )

    # warm page cache + worker pool
    transcripts_from_events(SF).map_batches(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    ).count()

    if MODE in ("sort", "both"):
        t0 = time.time()
        n = X.distinct(build(), X.COMPACT_COLS, int_prefix_key=True).count()
        print(
            json.dumps(
                {"variant": "sort", "sec": round(time.time() - t0, 3), "rows": n}
            ),
            flush=True,
        )

    if MODE in ("custom", "both"):
        t0 = time.time()
        n = X.distinct_onepass(build(), X.COMPACT_COLS).count()
        print(
            json.dumps(
                {"variant": "custom", "sec": round(time.time() - t0, 3), "rows": n}
            ),
            flush=True,
        )

    ray.shutdown()


if __name__ == "__main__":
    main()
