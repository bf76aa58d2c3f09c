"""Per-partition checkpoint manifest with lineage + metrics.

The reference has nothing to preserve (any error aborts the file,
RDFWriter.java:132-134); at cluster scale a run must be resumable.  The
unit of recovery is an INPUT PARTITION (a group of input files — at 100 TB
the input is always many files).  Each partition's output goes to its own
directory, published atomically (_SUCCESS marker written last), and the
manifest records lineage (input files, row/triple counts, status) so a
rerun skips finished partitions and re-executes only unfinished ones.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field


@dataclass
class PartitionEntry:
    partition_id: int
    input_files: list[str]
    status: str = "pending"  # pending | done
    n_input_rows: int = 0
    n_triples: int = 0
    n_errors: int = 0
    wall_sec: float = 0.0
    output_dir: str = ""
    finished_at: float = 0.0
    extra: dict = field(default_factory=dict)


MANIFEST_NAME = "manifest.json"


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST_NAME)


def load_manifest(out_dir: str) -> dict[int, PartitionEntry]:
    p = manifest_path(out_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        raw = json.load(f)
    return {e["partition_id"]: PartitionEntry(**e) for e in raw["partitions"]}


def save_manifest(out_dir: str, entries: dict[int, PartitionEntry]) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tmp = manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "updated_at": time.time(),
                "partitions": [asdict(e) for e in sorted(entries.values(),
                                                         key=lambda e: e.partition_id)],
            },
            f,
            indent=1,
        )
    os.replace(tmp, manifest_path(out_dir))


def partition_done(out_dir: str, pid: int) -> bool:
    return os.path.exists(os.path.join(out_dir, f"part={pid}", "_SUCCESS"))


def mark_done(out_dir: str, pid: int) -> None:
    d = os.path.join(out_dir, f"part={pid}")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "_SUCCESS"), "w") as f:
        f.write("")


def plan_partitions(input_files: list[str], num_partitions: int) -> list[list[str]]:
    """Deterministic grouping of input files into partitions (round-robin
    over the sorted file list)."""
    files = sorted(input_files)
    num_partitions = max(1, min(num_partitions, len(files)))
    groups: list[list[str]] = [[] for _ in range(num_partitions)]
    for i, fp in enumerate(files):
        groups[i % num_partitions].append(fp)
    return groups
