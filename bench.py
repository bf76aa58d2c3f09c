"""Benchmark harness.

Plain run: executes the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32)
and prints ONE JSON line:

    {"metric": "kg_construct_sec", "value": <headline sec>, "unit": "sec",
     "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
     "n_triples": ..., "triples_per_sec": ...}

The headline corpus is the sf events table expanded to
$GRAFT_BENCH_REPLICATE (default 10) deterministic replicas with disjoint
conversation-id spaces (sf0.1 -> 1,000,000 turns, ~8.3M triples): at
replicate=1 the job is overhead-dominated (~seconds) and tells you
nothing about the engine.

--scaling: runs the headline pipeline twice in FRESH processes at the two
CPU counts in $GRAFT_SCALE_PAIR (default "2,8") on the same input — the
sandbox stand-in for N vs 4N nodes — and prints throughput at both plus
scaling efficiency.  Why 2/8 and not 8/32: this sandbox's 32 "CPUs" are
overcommitted vCPUs — a pure-CPU burn test yields only ~3.3x total
throughput from 8 -> 32 workers (hardware ceiling 0.83 efficiency), and
memory-bandwidth-bound shuffle stages actually REGRESS beyond ~8 workers
(measured: same sort, same block count: 7.3s at 8 cpus, 18.6s at 32).
The 2 -> 8 pair exercises a genuine 4x parallelism ratio.  Override with
GRAFT_SCALE_PAIR=8,32 to reproduce the hardware-limited pair.
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
    replicate = int(os.environ.get("GRAFT_BENCH_REPLICATE", "10"))
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

    # memory-bandwidth-aware execution cap (see ifctordf_ray/tuning.py):
    # past the memory bus's sustainable stream count more concurrent
    # sort/format tasks REDUCE throughput.  The optimum is
    # CONTENTION-DEPENDENT: a round-2 sweep under a noisy neighbor
    # measured cap 8 -> 21.4-21.6 s, cap 12 -> 24.6 s, cap 16 -> 33.1 s,
    # but a round-3 re-sweep on a quiet box inverted it — cap 16/24 ->
    # 9.9-12.2 s vs cap 8 -> 13.0-14.8 s across 3 alternating pairs
    # (cap 16 won every pair by 20-25%; cap 32 slightly worse than 16).
    # Default follows the quiet-box optimum; override per host via
    # GRAFT_EXEC_CPU_CAP.  Only applied when the session exceeds the cap.
    from ifctordf_ray import tuning

    cap = int(os.environ.get("GRAFT_EXEC_CPU_CAP", "16"))
    if num_cpus > cap:
        tuning.apply_exec_cpu_cap(cap)

    from ifctordf_ray.pipelines import kg
    from ifctordf_ray.sources.transcripts import transcripts_from_events
    from ifctordf_ray.stages.canonicalize import canonicalize_mentions
    from ifctordf_ray.stages.extract import extract_errors

    # warm the OS page cache AND the worker pool (a map_batches forces
    # worker-process spawn + module imports on every slot) so the timed
    # section measures compute+shuffle, not first-touch costs
    transcripts_from_events(sf_dir).map_batches(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    ).count()

    queries: dict[str, float] = {}
    out_dir = f"/tmp/bench_kg_{num_cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)

    # headline: full flagship on the replicated corpus, ONE fused stream —
    # derive+validate transcripts, extract, dedup via sorted shuffle, write
    n_turns = replicate * transcripts_from_events(sf_dir).count()
    # GRAFT_SINK_COMPRESSION=gzip exercises the sink's scale path (13.6x
    # fewer bytes through the one shared disk — see BASELINE.md); default
    # stays uncompressed.
    sink_comp = os.environ.get("GRAFT_SINK_COMPRESSION") or None
    # Flagship materialization: the range-partitioned zstd Parquet graph
    # sink (default as of round 4 — columnar encoding converts the
    # disk-bound text write into CPU work that scales per node; measured
    # 2.0x the .nt wall at 32 CPUs and the better scaling pair, see
    # BASELINE.md).  GRAFT_SINK_FORMAT=nt swaps back to sorted N-Triples
    # text parts; BOTH sanctioned formats are timed every plain run (the
    # non-headline one lands in queries as kg_construct_nt/_parquet).
    # GRAFT_SINK_FORMAT=parquet_fastset: the exchange-light Parquet
    # materialization (same triple SET, only the shared-wrapper ~10%
    # slice through the sorted exchange — kg.materialize_parquet_fastset)
    sink_fmt = os.environ.get("GRAFT_SINK_FORMAT", "parquet")
    t0 = time.time()
    if sink_fmt == "parquet_fastset":
        n_triples = kg.materialize_parquet_fastset(
            sf_dir, out_dir, replicate=replicate
        )
    else:
        triples = kg.kg_from_events(sf_dir, mode="fast", replicate=replicate)
        if sink_fmt == "parquet":
            n_triples = kg.materialize_parquet(triples, out_dir)
        else:
            manifest = kg.materialize(triples, out_dir, compression=sink_comp)
            n_triples = sum(m["n_triples"] for m in manifest)
    headline = time.time() - t0
    queries["kg_construct"] = round(headline, 3)

    # stage isolation for the scaling table (GRAFT_BENCH_STAGES=1):
    # derive+extract+distinct WITHOUT the sink (count-consumed) — the
    # headline minus this is the sink stage's wall.
    if os.environ.get("GRAFT_BENCH_STAGES"):
        t0 = time.time()
        kg.kg_from_events(sf_dir, mode="fast", replicate=replicate).count()
        queries["kg_extract_distinct"] = round(time.time() - t0, 3)

    # compute-bound sub-pipeline (derive + extract, no sorted exchange):
    # isolates software scaling from the single-box memory-bandwidth
    # ceiling that the full sorted-dedup shuffle hits (see BASELINE.md)
    t0 = time.time()
    from ifctordf_ray.stages.extract import extract_compact

    extract_compact(
        transcripts_from_events(sf_dir, replicate=replicate, drop_dangling=True),
        prevalidated=True,
    ).count()
    queries["kg_extract_only"] = round(time.time() - t0, 3)

    if not os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        # the OTHER sanctioned flagship materialization, same corpus: the
        # one not used for the headline above (nt text vs bucketed zstd
        # Parquet graph partitions) so every BENCH round records both.
        alt_dir = f"/tmp/bench_kg_alt_{num_cpus}"
        shutil.rmtree(alt_dir, ignore_errors=True)
        t0 = time.time()
        alt_triples = kg.kg_from_events(sf_dir, mode="fast", replicate=replicate)
        if sink_fmt == "parquet":
            kg.materialize(alt_triples, alt_dir, compression=sink_comp)
            queries["kg_construct_nt"] = round(time.time() - t0, 3)
        else:
            kg.materialize_parquet(alt_triples, alt_dir)
            queries["kg_construct_parquet"] = round(time.time() - t0, 3)

        # secondary pipelines at replicate=1 (operator-level timings)
        t0 = time.time()
        kg.kg_from_events(sf_dir, mode="grouped").count()
        queries["kg_extract_grouped"] = round(time.time() - t0, 3)

        t0 = time.time()
        canonicalize_mentions(transcripts_from_events(sf_dir)).count()
        queries["kg_canonical_mentions"] = round(time.time() - t0, 3)

        t0 = time.time()
        extract_errors(transcripts_from_events(sf_dir)).count()
        queries["kg_errors"] = round(time.time() - t0, 3)

        # representative beyond-reference pipelines (documents table)
        from ifctordf_ray.stages.dedup import near_dup_pairs_minhash
        from ifctordf_ray.stages.textstats import training_funnel

        t0 = time.time()
        near_dup_pairs_minhash(sf_dir).count()
        queries["doc_minhash_near_dups"] = round(time.time() - t0, 3)

        t0 = time.time()
        training_funnel(sf_dir).count()
        queries["doc_training_funnel"] = round(time.time() - t0, 3)

        # training-export last mile: deterministic shard shuffle
        from ifctordf_ray.stages.export import shuffled_export

        t0 = time.time()
        shuffled_export(sf_dir).count()
        queries["doc_shuffled_export"] = round(time.time() - t0, 3)

    ray.shutdown()
    return {
        "metric": "kg_construct_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "sink_format": sink_fmt,
        "num_cpus": num_cpus,
        "replicate": replicate,
        "n_turns": n_turns,
        "n_triples": n_triples,
        "triples_per_sec": round(n_triples / headline, 1),
    }


def _scaling() -> None:
    pair = os.environ.get("GRAFT_SCALE_PAIR", "2,8")
    repeats = int(os.environ.get("GRAFT_SCALE_REPEATS", "2"))
    lo, hi = (int(x) for x in pair.split(","))
    # a larger corpus for the scaling measurement: amortizes the ~10 s of
    # serial driver/setup overhead so the measure reflects the parallel
    # fraction (Amdahl), and same input at both levels
    rep = os.environ.get("GRAFT_BENCH_REPLICATE", "20")

    def run_once(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_REPLICATE=rep,
            GRAFT_BENCH_HEADLINE_ONLY="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # PAIRED repeats (lo then hi, back to back) so each efficiency sample
    # sees a comparable interference window — this sandbox shows 1.5-2x
    # run-to-run noise from host-level contention.  Headline = the MEDIAN
    # pair (unbiased; a best-of-N max would systematically inflate), all
    # samples reported alongside.
    samples = []
    for _ in range(repeats):
        r_lo, r_hi = run_once(lo), run_once(hi)
        e = (r_lo["value"] / r_hi["value"]) / (hi / lo)
        samples.append((e, r_lo, r_hi))
    samples.sort(key=lambda s: s[0])
    # even count: lower-middle (conservative)
    eff, med_lo, med_hi = samples[(len(samples) - 1) // 2]
    results = {lo: med_lo, hi: med_hi}
    t_lo, t_hi = med_lo["value"], med_hi["value"]
    x_lo = results[lo]["queries"].get("kg_extract_only")
    x_hi = results[hi]["queries"].get("kg_extract_only")
    compute_eff = (
        round((x_lo / x_hi) / (hi / lo), 3) if x_lo and x_hi else None
    )
    stage_detail = {}
    if os.environ.get("GRAFT_BENCH_STAGES"):
        stage_detail = {
            f"queries_{lo}": med_lo["queries"],
            f"queries_{hi}": med_hi["queries"],
        }
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "sink_format": os.environ.get("GRAFT_SINK_FORMAT", "parquet"),
                **stage_detail,
                "cpus": [lo, hi],
                f"sec_{lo}": t_lo,
                f"sec_{hi}": t_hi,
                f"triples_per_sec_{lo}": results[lo]["triples_per_sec"],
                f"triples_per_sec_{hi}": results[hi]["triples_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "scaling_efficiency_samples": [round(s[0], 3) for s in samples],
                "compute_scaling_efficiency": compute_eff,
                "n_triples": results[hi]["n_triples"],
                "n_turns": results[hi]["n_turns"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _scaling()
    else:
        print(json.dumps(_run_benchmarks()))
