"""Shared scalar/vector kernels used inside map_batches bodies.

These are the engine's 'stateless scalar functions' (the reference's
P2-P5 normalizer family, SURVEY.md §2.2) in vectorized form: every
kernel is either a pyarrow.compute composition or a tight Python loop
over batch-deduplicated values — nothing here is per-row Python in a
hot loop without cause.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def str_concat(*parts) -> pa.Array:
    """Element-wise string concatenation of arrays/scalars (vectorized)."""
    args = [
        p if isinstance(p, (pa.Array, pa.ChunkedArray)) else pa.scalar(p)
        for p in parts
    ]
    return pc.binary_join_element_wise(*args, "")


def ts_lexical(ts_array) -> np.ndarray:
    """timestamp[us] -> verbatim lexical form.  np.datetime_as_string
    (unit='us') yields exactly %Y-%m-%dT%H:%M:%S.%f — the same lexical
    DuckDB strftime produces — at C speed."""
    if isinstance(ts_array, pa.ChunkedArray):
        ts_array = ts_array.combine_chunks()
    return np.datetime_as_string(
        ts_array.to_numpy(zero_copy_only=False).astype("datetime64[us]"),
        unit="us",
    )


def md5_hex(values: list[str]) -> list[str]:
    """md5 hex per value, deduplicated within the batch (no vectorized
    md5 kernel exists in Arrow; the cache keeps repeats off the loop)."""
    cache: dict[str, str] = {}
    out = []
    for v in values:
        h = cache.get(v)
        if h is None:
            h = hashlib.md5(v.encode("utf-8")).hexdigest()
            cache[v] = h
        out.append(h)
    return out


def stable_hash64(s: str) -> int:
    """md5-derived 64-bit hash — deterministic across processes and nodes
    (the engine NEVER uses Python hash(), which is salted per process).
    Spec: little-endian uint64 of the FIRST 8 md5 bytes == DuckDB's
    md5_number_upper(s), so every hash-derived operator (minhash, simhash,
    LSH band hashes) has an exact SQL oracle."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def cents(arr) -> pa.Array:
    """Exact, order-independent money representation: floor(x*100 + 0.5)
    as int64 — identical in numpy/Arrow and DuckDB, unlike distributed
    double summation (order-dependent) or round() (different half-way
    rules between numpy and SQL)."""
    return pc.cast(pc.floor(pc.add(pc.multiply(arr, 100.0), 0.5)), pa.int64())
