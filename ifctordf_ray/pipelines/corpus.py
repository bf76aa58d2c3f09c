"""End-to-end training-corpus build: the composed pipeline a pretraining
data team actually runs, chaining the already-oracled stages —

    quality/language funnel + exact dedup   (stages/textstats.training_funnel,
                                             with_text=True: the text rides
                                             the funnel's ONE keeper join)
    -> overlapping fixed-window chunking    (stages/chunking.chunk_batch)
    -> bucketed, content-addressed parquet  (resumable sink)

Reference analog: the per-file convert-everything loop of
IfcSpfReader.main (IfcSpfReader.java:79-161) — here the "conversion" is
corpus curation and the unit of resume is the hash bucket, not the file.

Scale notes: the text moves through exactly ONE exchange (the funnel's
keeper join; the keeper groupby runs on a text-free projection); chunk
rows carry md5 fingerprints, not chunk text, so the sink writes
audit-sized rows.  Every stage is a streaming map/aggregate/join;
nothing corpus-sized is materialized or collected.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ifctordf_ray.stages.chunking import chunk_batch, doc_chunks_sql
from ifctordf_ray.stages.textstats import training_funnel, training_funnel_sql

CORPUS_BUCKETS = 16


def corpus_chunks(sf_dir: str, num_partitions: int | None = None) -> ray.data.Dataset:
    """(doc_id, chunk_idx, n_chunk_chars, chunk_fp) for every document
    that survives the training funnel.

    Physical plan: ONE join total — the funnel's internal keeper
    join-back threads the text through (``with_text=True``), so no
    second text join-back exists.  Two chained joins' aggregator pools
    plus the funnel's actor pool deadlock a small session (4-CPU hang,
    round 3) and would double the text exchange at any scale.  The
    chunker runs as a TASK pool (stages/chunking.chunk_batch), not an
    actor pool, so it reserves no CPU alongside the join aggregators.
    """
    surv = training_funnel(sf_dir, num_partitions=num_partitions, with_text=True)
    # task pool, NOT an actor pool: see stages/chunking.chunk_batch
    return surv.map_batches(chunk_batch, batch_format="pyarrow")


def corpus_chunks_sql() -> str:
    return f"""
    WITH surv AS ({training_funnel_sql()}),
    c AS ({doc_chunks_sql()})
    SELECT c.doc_id, c.chunk_idx, c.n_chunk_chars, c.chunk_fp
    FROM c JOIN surv ON c.doc_id = surv.doc_id
    """


def build_corpus(sf_dir: str, out_dir: str) -> dict:
    """Run the full build and write hash-bucketed parquet shards
    (bucket = doc_id % CORPUS_BUCKETS — one directory per bucket, the
    resumable-output layout).  Returns the manifest dict."""
    chunks = corpus_chunks(sf_dir)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.bit_wise_and(t["doc_id"], CORPUS_BUCKETS - 1), pa.int32()
        )
        return t.append_column("bucket", b)

    bucketed = chunks.map_batches(add_bucket, batch_format="pyarrow")
    os.makedirs(out_dir, exist_ok=True)
    bucketed.write_parquet(f"{out_dir}/chunks", partition_cols=["bucket"])

    # manifest from an aggregate over the WRITTEN files (audit = read back)
    back = ray.data.read_parquet(f"{out_dir}/chunks")
    n_chunks = back.count()
    n_docs = (
        back.select_columns(["doc_id"]).groupby("doc_id").count().count()
    )  # distinct via groupby — no driver-side value list
    manifest = {
        "n_chunks": int(n_chunks),
        "n_docs": int(n_docs),
        "buckets": CORPUS_BUCKETS,
        "layout": "chunks/bucket=<doc_id % buckets>/*.parquet",
    }
    tmp = f"{out_dir}/manifest.json.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, f"{out_dir}/manifest.json")
    return manifest
