"""Generic size-thresholded dimension attach (star-schema join operator).

The reference always joins its lookup state in-process (IfcSpfReader's
ent/typ HashMaps, IfcSpfReader.java:220-252) because that state is ~MBs.
On a general engine the dimension table can scale with the data, so this
operator picks the physical plan per input:

- dimension row count (parquet metadata only — no data read) at or below
  ``broadcast_max_rows``: the dimension is read once on the driver,
  ``ray.put`` into the object store, and probed per batch by STATELESS
  map tasks with a worker-process cache (fetched + index-sorted once per
  worker, then O(batch * log dim) searchsorted probes) — the fact side
  never shuffles.  Stateless tasks rather than an actor pool on purpose:
  star pipelines chain several attaches, and N actor pools each
  reserving a CPU starve the upstream read on small sessions (the
  aggregator-pool deadlock class documented in tuning.join_kwargs).
- above the threshold: a distributed hash ``Dataset.join`` partitioned
  by the key (both sides stream; no driver-side state).

Both plans implement INNER-join semantics (fact rows without a matching
dimension key are dropped) and return the fact dataset with ``val_cols``
appended.  Keys must be integer-typed (all star keys here are).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

BROADCAST_MAX_ROWS = 2_000_000

# worker-process cache: ObjectRef hex -> (sorted_keys, order, val arrays);
# persists across map tasks scheduled on the same worker process.
_DIM_CACHE: dict = {}


def _dim_entry(dim_ref):
    key = dim_ref.hex()
    ent = _DIM_CACHE.get(key)
    if ent is None:
        keys, vals = ray.get(dim_ref)
        keys_np = np.asarray(keys, dtype=np.int64)
        order = np.argsort(keys_np, kind="stable")
        ent = _DIM_CACHE[key] = (keys_np[order], order, vals)
        if len(_DIM_CACHE) > 8:  # bound worker memory across many queries
            for k in list(_DIM_CACHE)[:-8]:
                del _DIM_CACHE[k]
    return ent


def _probe(batch: pa.Table, *, dim_ref, probe_col: str, val_cols) -> pa.Table:
    import pyarrow.compute as pc

    sorted_keys, order, vals = _dim_entry(dim_ref)
    probes = np.asarray(
        pc.cast(batch[probe_col], pa.int64()).combine_chunks(), dtype=np.int64
    )
    pos = np.searchsorted(sorted_keys, probes)
    pos_c = np.minimum(pos, len(sorted_keys) - 1)
    valid = sorted_keys[pos_c] == probes
    if not valid.all():
        batch = batch.filter(pa.array(valid))
        pos_c = pos_c[valid]
    idx = pa.array(order[pos_c], pa.int64())
    for name, arr in zip(val_cols, vals):
        batch = batch.append_column(name, pc.take(arr, idx))
    return batch


def attach_dimension(
    fact: ray.data.Dataset,
    dim_path: str,
    key_col: str,
    probe_col: str,
    val_cols: list[str],
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    import pyarrow.parquet as pq

    n_dim = pq.ParquetFile(dim_path).metadata.num_rows
    if n_dim <= broadcast_max_rows:
        dim = pq.read_table(dim_path, columns=[key_col, *val_cols])
        ref = ray.put(
            (
                dim[key_col].combine_chunks(),
                [dim[c].combine_chunks() for c in val_cols],
            )
        )
        return fact.map_batches(
            _probe,
            fn_kwargs={
                "dim_ref": ref,
                "probe_col": probe_col,
                "val_cols": list(val_cols),
            },
            batch_format="pyarrow",
        )

    from ifctordf_ray.sources.transcripts import clean_read_parquet
    from ifctordf_ray.tuning import join_kwargs

    dim_ds = clean_read_parquet(dim_path, columns=[key_col, *val_cols])
    joined = fact.join(
        dim_ds,
        join_type="inner",
        on=(probe_col,),
        right_on=(key_col,),
        **join_kwargs(num_partitions),
    )
    # Ray's hash join coalesces the right key into the left key column,
    # so `key_col` does not survive the join — nothing to drop.
    return joined
