"""Benchmark harness.

Plain run: executes the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32)
and prints ONE JSON line:

    {"metric": "kg_construct_sec", "value": <headline sec>, "unit": "sec",
     "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
     "n_triples": ..., "triples_per_sec": ...}

--scaling: runs the headline pipeline twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same input (sandbox stand-in for N vs
4N nodes) and prints throughput at both plus scaling efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def _run_benchmarks() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from ifctordf_ray.pipelines import kg
    from ifctordf_ray.sources.transcripts import transcripts_from_events
    from ifctordf_ray.stages.canonicalize import canonicalize_mentions
    from ifctordf_ray.stages.extract import extract_errors

    # warm the OS page cache so we measure compute+shuffle, not first read
    transcripts_from_events(sf_dir).count()

    queries: dict[str, float] = {}
    out_dir = f"/tmp/bench_kg_{num_cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)

    # headline: full flagship — derive transcripts, extract, dedup, sort, write
    t0 = time.time()
    metrics = kg.run(sf_dir, out_dir, mode="fast", parquet=False)
    headline = time.time() - t0
    queries["kg_construct"] = round(headline, 3)
    n_triples = metrics["n_triples"]

    t0 = time.time()
    kg.kg_from_events(sf_dir, mode="grouped").count()
    queries["kg_extract_grouped"] = round(time.time() - t0, 3)

    t0 = time.time()
    canonicalize_mentions(transcripts_from_events(sf_dir)).count()
    queries["kg_canonical_mentions"] = round(time.time() - t0, 3)

    t0 = time.time()
    extract_errors(transcripts_from_events(sf_dir)).count()
    queries["kg_errors"] = round(time.time() - t0, 3)

    ray.shutdown()
    return {
        "metric": "kg_construct_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_triples": n_triples,
        "triples_per_sec": round(n_triples / headline, 1),
    }


def _scaling() -> None:
    results = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        results[ncpu] = json.loads(out.strip().splitlines()[-1])
    t8, t32 = results[8]["value"], results[32]["value"]
    tput8 = results[8]["triples_per_sec"]
    tput32 = results[32]["triples_per_sec"]
    eff = (t8 / t32) / (32 / 8)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "sec_8": t8,
                "sec_32": t32,
                "triples_per_sec_8": tput8,
                "triples_per_sec_32": tput32,
                "scaling_efficiency": round(eff, 3),
                "n_triples": results[32]["n_triples"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _scaling()
    else:
        print(json.dumps(_run_benchmarks()))
