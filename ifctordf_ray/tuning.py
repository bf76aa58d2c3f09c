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

The benchmark harness applies GRAFT_EXEC_CPU_CAP (default 12) when the
session has more CPUs than that; library code never sets it implicitly.
"""

from __future__ import annotations

from ray.data import DataContext


def apply_exec_cpu_cap(max_exec_cpus: int | None) -> None:
    if not max_exec_cpus:
        return
    from ray.data._internal.execution.interfaces import ExecutionResources

    ctx = DataContext.get_current()
    ctx.execution_options.resource_limits = ExecutionResources(
        cpu=float(max_exec_cpus)
    )
