"""Training-export operators: deterministic corpus shuffle and weighted
source-mixture scheduling.

The last mile of an LLM data pipeline: once documents are filtered /
deduped / packed, they must be (a) SHUFFLED — neighbor documents must
not share provenance or the model sees correlated batches — and (b)
MIXED across sources on a fixed weight schedule.  Both are usually done
with a framework RNG, which is irreproducible across retries and
cluster sizes; here both are pure functions of the md5-derived row hash
(kernels.stable_hash64 == DuckDB's md5_number_upper — the engine-wide
hash spec), so a resumed or re-sharded run emits byte-identical output
and every operator has an exact SQL oracle.

Distributed shape (both operators): the classic TWO-PHASE SCAN this
engine already uses for global ranks (pipelines/relational.py
`_order_rank_scan`, stages/chunking.packed_sequences).  Order within a
shard/source is (hash, doc_id); the top byte of the 64-bit hash is a
RANGE bucket, so bucket order == hash order and no global sort ever
runs.  Phase 1 counts rows per (group, hash-high-byte) bucket — a
#groups x 256-row table on the driver, independent of corpus size;
phase 2 assigns exact in-group positions inside a bucket-keyed
map_groups with a local sort.  At 100 TB the driver state stays a few
thousand rows and skew is bounded by the hash's uniformity (1/256 of a
group per bucket).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ifctordf_ray.sources.transcripts import clean_read_parquet as _clean_read_parquet

EXPORT_SHARDS = 8
# weight per source suffix-mod class (src0..src19 -> id % len(weights));
# integer strides keep the virtual time exact in both engines
MIX_WEIGHTS = (4, 2, 1)
MIX_STRIDE_K = 4  # LCM(weights): stride_s = K // weight_s


def _hash_col(ids: pa.ChunkedArray) -> pa.Array:
    """stable_hash64(str(doc_id)) per row — int64 reinterpretation of the
    little-endian uint64 of the first 8 md5 bytes (== DuckDB's
    md5_number_upper cast to BIGINT, the engine-wide hash spec)."""
    vals = [
        int.from_bytes(
            hashlib.md5(str(v).encode("utf-8")).digest()[:8], "little"
        )
        for v in ids.to_pylist()
    ]
    return pa.array(np.array(vals, dtype=np.uint64).view(np.int64), pa.int64())


def _two_phase_positions(
    narrow: ray.data.Dataset, out_cols: tuple[str, ...], pos_name: str
) -> ray.data.Dataset:
    """Shared phase-2: given (group, bucket, h, doc_id, *out_cols) where
    bucket is already (group, hash-high-byte)-composite and totally
    ordered within each group, count rows per bucket, scan offsets on
    the driver (#buckets rows), and emit the exact 0-based in-group
    position for every row."""
    from ray.data.aggregate import Count as _Count

    counts = narrow.groupby("bucket").aggregate(_Count(alias_name="n")).take_all()
    offsets: dict[int, int] = {}
    running: dict[int, int] = {}
    for row in sorted(counts, key=lambda r: r["bucket"]):
        grp = row["bucket"] >> 8
        offsets[row["bucket"]] = running.get(grp, 0)
        running[grp] = offsets[row["bucket"]] + row["n"]

    def assign(group: pa.Table) -> pa.Table:
        group = group.sort_by([("h", "ascending"), ("doc_id", "ascending")])
        idx = offsets[group["bucket"][0].as_py()] + np.arange(group.num_rows)
        cols = {c: group[c] for c in out_cols}
        cols[pos_name] = pa.array(idx, pa.int64())
        return pa.table(cols)

    return narrow.groupby("bucket").map_groups(assign, batch_format="pyarrow")


def shuffled_export(
    sf_dir: str, shards: int = EXPORT_SHARDS
) -> ray.data.Dataset:
    """(doc_id, shard, pos): deterministic shuffle of the corpus into
    ``shards`` output shards — shard = hash % shards, pos = the doc's
    0-based position inside its shard under (hash, doc_id) order.  A
    training run reads shard files in pos order and sees a fixed,
    provenance-decorrelated permutation regardless of cluster size or
    retries."""
    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def prep(t: pa.Table) -> pa.Table:
        h = _hash_col(t["doc_id"])
        hu = np.asarray(h, dtype=np.int64).view(np.uint64)
        shard = pa.array((hu % np.uint64(shards)).astype(np.int64), pa.int64())
        # bucket = (shard << 8) | hash-high-byte: bucket order == (shard,
        # hash) order, so phase-2's exclusive scan yields exact positions
        hi = (hu >> np.uint64(56)).astype(np.int64)
        bucket = pa.array(
            (np.asarray(shard, dtype=np.int64) << 8) | hi, pa.int64()
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "h": h,
                "shard": shard,
                "bucket": bucket,
            }
        )

    narrow = ds.map_batches(prep, batch_format="pyarrow")
    return _two_phase_positions(narrow, ("doc_id", "shard"), "pos")


def shuffled_export_sql(shards: int = EXPORT_SHARDS) -> str:
    # the Ray side orders by the SIGNED int64 view of the uint64 hash
    # (bucket = high byte of the unsigned value, then signed in-bucket
    # sort gives unsigned order within one high byte — the top bit is
    # constant there), so the SQL arm orders by the unsigned value
    return f"""
    SELECT doc_id,
           CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) % {shards} AS BIGINT) AS shard,
           CAST(row_number() OVER (
               PARTITION BY md5_number_upper(CAST(doc_id AS VARCHAR)) % {shards}
               ORDER BY md5_number_upper(CAST(doc_id AS VARCHAR)), doc_id
           ) - 1 AS BIGINT) AS pos
    FROM documents
    """


def mixture_schedule(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, source, rank_in_source, vtime): weighted source-mixture
    schedule — each source's documents are hash-shuffled internally
    (rank_in_source under (hash, doc_id) order) and assigned an exact
    integer virtual time rank * (K // weight); consuming rows in vtime
    order interleaves sources proportionally to their weights (stride
    scheduling).  Weights cycle by source-id suffix mod len(MIX_WEIGHTS)
    — the deterministic stand-in for a per-source config table."""
    ds = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def prep(t: pa.Table) -> pa.Table:
        h = _hash_col(t["doc_id"])
        hu = np.asarray(h, dtype=np.int64).view(np.uint64)
        # source id suffix ("srcN" -> N) -> weight class
        sid = pc.cast(pc.utf8_slice_codeunits(t["source"], 3, 32), pa.int64())
        hi = (hu >> np.uint64(56)).astype(np.int64)
        bucket = pa.array(
            (np.asarray(sid, dtype=np.int64) << 8) | hi, pa.int64()
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "source": t["source"],
                "sid": sid,
                "h": h,
                "bucket": bucket,
            }
        )

    narrow = ds.map_batches(prep, batch_format="pyarrow")
    ranked = _two_phase_positions(
        narrow, ("doc_id", "source", "sid"), "rank_in_source"
    )

    def vtime(t: pa.Table) -> pa.Table:
        w = np.array(MIX_WEIGHTS, dtype=np.int64)
        stride = MIX_STRIDE_K // w[np.asarray(t["sid"], dtype=np.int64) % len(w)]
        vt = (np.asarray(t["rank_in_source"], dtype=np.int64) + 1) * stride
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "source": t["source"],
                "rank_in_source": t["rank_in_source"],
                "vtime": pa.array(vt, pa.int64()),
            }
        )

    return ranked.map_batches(vtime, batch_format="pyarrow")


def mixture_schedule_sql() -> str:
    w = ", ".join(str(x) for x in MIX_WEIGHTS)
    return f"""
    WITH ranked AS (
        SELECT doc_id, source,
               CAST(substr(source, 4) AS BIGINT) AS sid,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5_number_upper(CAST(doc_id AS VARCHAR)), doc_id
               ) - 1 AS BIGINT) AS rank_in_source
        FROM documents
    )
    SELECT doc_id, source, rank_in_source,
           CAST((rank_in_source + 1)
                * ({MIX_STRIDE_K} // ([{w}])[(sid % {len(MIX_WEIGHTS)}) + 1])
               AS BIGINT) AS vtime
    FROM ranked
    """
