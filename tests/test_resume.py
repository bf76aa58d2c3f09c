"""Kill/resume contract: per-partition checkpoint manifest with lineage +
metrics; rerun skips finished partitions (BASELINE.md resumability row)."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ifctordf_ray.pipelines import kg
from ifctordf_ray.sources.transcripts import transcripts_table
from ifctordf_ray.state import checkpoint as ckpt


def _write_sharded_transcripts(tmp_path, n_convs=30, shards=6):
    """Transcripts partitioned by conv hash across shard files —
    conversations never span files (the stated partitioning assumption)."""
    rows_by_shard = [[] for _ in range(shards)]
    for c in range(n_convs):
        shard = c % shards
        for i in range(4):
            rows_by_shard[shard].append(
                {"conv_id": f"c{c}", "turn_idx": i, "role": "user",
                 "text": f"msg {c} {i}"}
            )
    paths = []
    for s, rows in enumerate(rows_by_shard):
        p = str(tmp_path / f"shard-{s}.parquet")
        pq.write_table(transcripts_table(rows), p)
        paths.append(p)
    return paths


def test_resumable_run_and_skip(tmp_path):
    files = _write_sharded_transcripts(tmp_path)
    out = str(tmp_path / "out")
    entries = kg.run_resumable(files, out, num_partitions=3)
    assert len(entries) == 3
    assert all(e.status == "done" for e in entries.values())
    total = sum(e.n_triples for e in entries.values())
    assert total > 0
    finished = {pid: e.finished_at for pid, e in entries.items()}
    # lineage recorded
    assert all(e.input_files for e in entries.values())
    assert all(os.path.exists(os.path.join(out, f"part={pid}", "_SUCCESS"))
               for pid in entries)

    # full rerun: everything skipped (timestamps unchanged)
    entries2 = kg.run_resumable(files, out, num_partitions=3)
    assert {p: e.finished_at for p, e in entries2.items()} == finished

    # simulate a crash in partition 1: remove its _SUCCESS -> only it reruns
    os.remove(os.path.join(out, "part=1", "_SUCCESS"))
    entries3 = kg.run_resumable(files, out, num_partitions=3)
    assert entries3[0].finished_at == finished[0]
    assert entries3[2].finished_at == finished[2]
    assert entries3[1].finished_at > finished[1]
    assert entries3[1].n_triples == entries[1].n_triples


def test_plan_partitions_deterministic():
    files = [f"f{i}" for i in range(7)]
    a = ckpt.plan_partitions(files, 3)
    b = ckpt.plan_partitions(list(reversed(files)), 3)
    assert a == b
    assert sum(len(g) for g in a) == 7


def test_interrupted_partition_cleared_before_rerun(tmp_path):
    """A crashed attempt leaves part files but no _SUCCESS; the rerun must
    clear them (sort block splits are not reproducible, so stale
    content-addressed files would otherwise survive and double-count)."""
    files = _write_sharded_transcripts(tmp_path)
    out = str(tmp_path / "out")
    entries = kg.run_resumable(files, out, num_partitions=3)

    # simulate an interrupted attempt: stale part file, no _SUCCESS
    os.remove(os.path.join(out, "part=1", "_SUCCESS"))
    stale = os.path.join(out, "part=1", "nt", "part-deadbeef.nt")
    with open(stale, "w") as f:
        f.write("<stale> <stale> <stale> .\n")

    entries2 = kg.run_resumable(files, out, num_partitions=3)
    assert not os.path.exists(stale)
    assert entries2[1].n_triples == entries[1].n_triples
    # lineage lists exactly the files present
    listed = set(entries2[1].extra["files"])
    on_disk = set(glob.glob(os.path.join(out, "part=1", "nt", "*.nt")))
    assert listed == on_disk
    # total unique triples in the partition match the manifest count
    lines = set()
    for p in on_disk:
        with open(p) as f:
            lines.update(l for l in f.read().splitlines() if l)
    assert len(lines) == entries2[1].n_triples
