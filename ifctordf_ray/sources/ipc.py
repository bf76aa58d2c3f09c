"""Arrow IPC (Feather v2 / .arrow) source and sink for the documents
table — the fourth interchange format next to parquet, JSONL
(sources/jsonl.py) and CSV (sources/csvsrc.py).  IPC is the zero-copy
format: a reader memory-maps record batches with no decode step, which
makes it the right interchange for engine-to-engine handoff on shared
storage (the reference's equivalent surface is its directory-of-files
ingest, IfcSpfReader.java:120-160).

Same directory-of-shards contract as the other sinks: one
content-addressed ``part-<md5>.arrow`` file per block, atomic publish
via rename, rewrite-skip when the same content already exists (resumable
output discipline, like the N-Triples sink in sources/sinks.py).

NULL fidelity: unlike CSV, IPC preserves NULL vs empty-string exactly,
so the round trip needs no convention mapping.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import ray.data

from ifctordf_ray.sources.jsonl import DOCUMENTS_SCHEMA


class _IpcShardWriter:
    """map_batches sink: writes one .arrow (IPC file format) shard per
    batch and emits a one-row manifest.  Content-addressed name ->
    idempotent under task retries and resumed runs."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "path": pa.array([], pa.string()),
                    "n_rows": pa.array([], pa.int64()),
                    "skipped": pa.array([], pa.bool_()),
                }
            )
        os.makedirs(self.out_dir, exist_ok=True)
        batch = pa.table(
            {f.name: batch[f.name].cast(f.type) for f in DOCUMENTS_SCHEMA},
            schema=DOCUMENTS_SCHEMA,
        )
        sink = pa.BufferOutputStream()
        with pa.ipc.new_file(sink, DOCUMENTS_SCHEMA) as w:
            w.write_table(batch)
        buf = sink.getvalue()
        h = hashlib.md5(buf).hexdigest()[:20]
        path = os.path.join(self.out_dir, f"part-{h}.arrow")
        skipped = os.path.exists(path)
        if not skipped:
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(buf)
            os.replace(tmp, path)  # atomic publish
        return pa.table(
            {
                "path": pa.array([path], pa.string()),
                "n_rows": pa.array([batch.num_rows], pa.int64()),
                "skipped": pa.array([skipped], pa.bool_()),
            }
        )


def write_documents_ipc(ds: ray.data.Dataset, out_dir: str) -> "pa.Table":
    """Write the documents dataset as a directory of .arrow shards;
    returns the (shard-count-sized) manifest table."""
    manifest = ds.map_batches(
        _IpcShardWriter(out_dir), batch_format="pyarrow", batch_size=None
    )
    return pa.Table.from_pylist(
        manifest.take_all(),  # manifest is shard-count-sized, not corpus-sized
        schema=pa.schema(
            [("path", pa.string()), ("n_rows", pa.int64()), ("skipped", pa.bool_())]
        ),
    )


def _decode_ipc_batch(batch: pa.Table) -> pa.Table:
    """Decode whole IPC files carried as binary blobs into document rows."""
    tables = []
    for blob in batch["bytes"]:
        reader = pa.ipc.open_file(pa.BufferReader(blob.as_py()))
        t = reader.read_all()
        tables.append(
            pa.table(
                {f.name: t[f.name].cast(f.type) for f in DOCUMENTS_SCHEMA},
                schema=DOCUMENTS_SCHEMA,
            )
        )
    if not tables:
        return DOCUMENTS_SCHEMA.empty_table()
    return pa.concat_tables(tables)


def read_documents_ipc(path: str) -> ray.data.Dataset:
    """Stream a directory of .arrow shards as the canonical documents
    schema.  Each task decodes whole files (IPC decode is a pointer fixup,
    not a parse), so the hot path stays vectorized."""
    ds = ray.data.read_binary_files(path, file_extensions=["arrow"])
    return ds.map_batches(_decode_ipc_batch, batch_format="pyarrow")
