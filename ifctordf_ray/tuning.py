"""Execution tuning knobs.

`apply_exec_cpu_cap(n)` caps Ray Data's concurrent execution CPUs via
DataContext.execution_options.resource_limits.  Why this exists: the
engine's sorted dedup exchange is memory-bandwidth-bound; past the memory
subsystem's sustainable stream count, adding concurrent sort/shuffle tasks
REDUCES throughput (measured on the dev box at num_cpus=32: uncapped
59-100 s for the 1M-turn flagship vs 39 s capped at 12 — a 1.5-2.5x win
from doing less at once).  This is the per-node shuffle-concurrency
tuning every shuffle engine exposes (cf. Spark's shuffle parallelism
knobs); on a multi-node cluster the cap applies per job there, so choose
it relative to aggregate cluster CPUs, not one node.

The benchmark harness applies GRAFT_EXEC_CPU_CAP (default 16) when the
session has more CPUs than that; library code never sets it implicitly.
"""

from __future__ import annotations

from ray.data import DataContext


def default_join_partitions(cap: int = 64) -> int:
    """Hash-join/shuffle partition count sized to the cluster: ~1x total
    CPUs (each partition gets an aggregator actor — more partitions than
    cores deadlocks tiny sessions and oversubscribes big ones; far fewer
    under-parallelizes the exchange).  `cap` bounds actor count on very
    large clusters; at true multi-node scale pass an explicit value
    (~2-4x aggregate cores) instead."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(2, min(cap, cpus // 2))


def join_kwargs(num_partitions: int | None = None) -> dict:
    """kwargs for Dataset.join sized to the session: partition count from
    default_join_partitions, and aggregator actors budgeted at ~25% of
    cluster CPUs PER JOIN.  Without the cap Ray's fallback reserves 1 CPU
    per partition for the aggregator pool, which starves the upstream map
    tasks on small sessions (observed deadlock at num_cpus=4, worse with
    two chained joins whose aggregator pools coexist)."""
    import ray

    if num_partitions is None:
        num_partitions = default_join_partitions()
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    # floor 0.05 (not 0.125): a 4-CPU session running a chained join at 16
    # partitions must keep its two 16-actor aggregator pools under ~half
    # the CPUs or the upstream map tasks can never schedule (deadlock —
    # seen when the r2 driver-partition-count regression test first ran)
    per_agg = max(0.05, min(1.0, (cpus * 0.25) / num_partitions))
    return {
        "num_partitions": num_partitions,
        "aggregator_ray_remote_args": {"num_cpus": per_agg},
    }


def read_parallelism(mult: int = 3, cap: int = 512) -> int:
    """Block count for the flagship's input read, sized to the session:
    ~3x total CPUs.  Why this matters: Ray's sort/groupby exchanges emit
    num_outputs == num_input_blocks partitions (sort_task_spec:
    num_outputs = num_mappers), so the INPUT read's block count pins the
    parallelism AND the skew granularity of every downstream all-to-all.
    Measured on the 2M-turn flagship: the default read produced 10
    blocks end-to-end — 10 extract tasks and a 10-partition sort with
    12x row skew between output blocks; at 8 CPUs that is two ragged
    waves (~5 effective slots).  3x CPUs gives near-perfect task packing
    at every session size and 3x finer range boundaries.  On a real
    multi-node cluster this scales with aggregate cores automatically;
    `cap` bounds per-task scheduling overhead."""
    import os

    import ray

    env = os.environ.get("GRAFT_READ_BLOCKS")
    if env:
        return int(env)
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    # key off EFFECTIVE exec slots, not raw CPUs: when an exec-CPU cap is
    # applied (bench default 16 on the 32-vCPU box), blocks beyond
    # 3x the cap over-fragment the sort (32-CPU nt headline A/B:
    # 48 blocks 10.9s, 96 blocks 13.3s, 16 blocks 13.0s).
    slots = min(cpus, _EXEC_CPU_CAP) if _EXEC_CPU_CAP else cpus
    return max(8, min(cap, slots * mult))


_EXEC_CPU_CAP: int | None = None


def apply_exec_cpu_cap(max_exec_cpus: int | None) -> None:
    global _EXEC_CPU_CAP
    if not max_exec_cpus:
        return
    _EXEC_CPU_CAP = int(max_exec_cpus)
    from ray.data._internal.execution.interfaces import ExecutionResources

    ctx = DataContext.get_current()
    ctx.execution_options.resource_limits = ExecutionResources(
        cpu=float(max_exec_cpus)
    )
