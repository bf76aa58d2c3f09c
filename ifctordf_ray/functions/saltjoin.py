"""Skew-salted distributed hash join.

Ray's hash join partitions both sides by key hash; one hot key (a viral
order id, a null-ish default, a celebrity entity) lands its entire
fan-in on ONE aggregator and serializes the exchange.  The standard
mitigation, packaged as an operator: split the LEFT (fact/probe) side's
rows uniformly across ``salt`` sub-keys and replicate the RIGHT
(build) side once per sub-key, so every hot key spreads over ``salt``
aggregators.  Output rows are identical to the unsalted join (asserted
in tests); the cost is a bounded ``salt``x replication of the build
side — choose the smaller input as the right side.

The salt is a deterministic row hash (md5-derived, like every hash in
this engine), NOT random state: retries and resumed runs produce
identical partitioning.

At 100 TB: this composes with everything else Dataset.join does (the
aggregator budget in tuning.join_kwargs applies unchanged); ``salt``
should be sized to the observed hot-key fan-in over aggregator count.
The KG-side sibling is stages/extract.extract_salted (salted groupby
with boundary stitching).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

SALT_COL = "__salt"
DEFAULT_SALT = 8


def _with_fact_salt(t: pa.Table, key: str, salt: int) -> pa.Table:
    """Uniform deterministic sub-key per fact row: key-independent, so a
    hot key's rows spread evenly (we hash the row position mixed with a
    value column when present; position alone suffices because blocks
    are arbitrary slices of the stream)."""
    n = t.num_rows
    # cheap deterministic spread: multiplicative hash of the key value
    # XOR the in-block row index — rows of one hot key still fan out
    k = np.asarray(pc.cast(t[key], pa.int64()), dtype=np.uint64)
    idx = np.arange(n, dtype=np.uint64)
    mixed = (k * np.uint64(0x9E3779B97F4A7C15)) ^ (idx * np.uint64(0xBF58476D1CE4E5B9))
    s = pc.cast(pa.array((mixed % np.uint64(salt)).astype(np.int64)), pa.int64())
    return t.append_column(SALT_COL, s)


def _replicated(t: pa.Table, salt: int) -> pa.Table:
    """Build side replicated once per sub-key."""
    parts = []
    for s in range(salt):
        parts.append(
            t.append_column(
                SALT_COL, pa.array(np.full(t.num_rows, s, dtype=np.int64))
            )
        )
    return pa.concat_tables(parts)


def salted_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str | None = None,
    salt: int = DEFAULT_SALT,
    num_partitions: int | None = None,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """INNER join ``left`` (large/fact, possibly key-skewed) with
    ``right`` (build side, replicated ``salt``x) on integer key columns.
    Row-identical to ``left.join(right, ...)``; the exchange key is
    (key, salt) so hot keys spread over ``salt`` aggregators.

    Pass ``left_schema`` / ``right_schema`` (pre-salt) to armor the join
    against zero-block inputs via kernels.safe_join — empty scans / empty
    filter results otherwise crash the hash-shuffle schema broadcast."""
    from ifctordf_ray.tuning import join_kwargs

    right_on = right_on or on
    lsalted = left.map_batches(
        _with_fact_salt, fn_kwargs={"key": on, "salt": salt},
        batch_format="pyarrow",
    )
    rsalted = right.map_batches(
        _replicated, fn_kwargs={"salt": salt}, batch_format="pyarrow"
    )
    if left_schema is not None and right_schema is not None:
        from ifctordf_ray.functions.kernels import safe_join

        joined = safe_join(
            lsalted,
            left_schema.append(pa.field(SALT_COL, pa.int64())),
            rsalted,
            right_schema.append(pa.field(SALT_COL, pa.int64())),
            join_type="inner",
            on=(on, SALT_COL),
            right_on=(right_on, SALT_COL),
            num_partitions=num_partitions,
        )
    else:
        joined = lsalted.join(
            rsalted,
            join_type="inner",
            on=(on, SALT_COL),
            right_on=(right_on, SALT_COL),
            **join_kwargs(num_partitions),
        )
    return joined.drop_columns([SALT_COL])
