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


def join_ready(ds, schema: pa.Schema, sentinel_row: dict | None = None):
    """Make `ds` safe to feed into `Dataset.join` at ANY partition count.

    Why this exists: Ray's groupby/aggregate emits empty partitions as
    zero-COLUMN blocks, and its hash-shuffle join only broadcasts the
    schema to aggregators from the FIRST block it fans out — a fan-out
    that is silently skipped for empty blocks
    (ray/data/_internal/execution/operators/hash_shuffle.py:223).  So if
    the first block of a join input is empty, every aggregator partition
    that receives no rows finalizes an empty-SCHEMA table and pyarrow's
    Acero fails with `ArrowInvalid: No match or multiple matches for key
    field reference FieldRef.Name(...)` (CORRECTNESS_r02
    `doc_verified_near_dups`, 16-partition default on 32 CPUs; passes at
    2 partitions — which is how the 4-CPU test session masked it).

    A schema-pinning `map_batches` alone CANNOT fix this: Ray
    short-circuits zero-row blocks around every map UDF
    (plan_udf_map_op.py:456), so the empty blocks survive untouched.
    The working recipe is:

    1. pin column order/types on the non-empty blocks (so the broadcast
       schema is the canonical one),
    2. optionally union a sentinel row that no real key can produce (so
       the dataset is never entirely empty; an inner join drops it), and
    3. `repartition(k)` — the split-and-merge barrier is the one op that
       absorbs empty blocks into schema-ful ones and puts rows in the
       FIRST output block.  It runs over this (small, post-aggregation)
       stream only, not the corpus.
    """
    from ifctordf_ray.tuning import default_join_partitions

    def _pin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return schema.empty_table()
        return pa.table(
            {f.name: pc.cast(t[f.name], f.type) for f in schema},
            schema=schema,
        )

    import ray.data

    out = ds.map_batches(_pin, batch_format="pyarrow")
    if sentinel_row is not None:
        seed = pa.table(
            {f.name: pa.array([sentinel_row[f.name]], f.type) for f in schema},
            schema=schema,
        )
        out = out.union(ray.data.from_arrow(seed))
    return out.repartition(default_join_partitions())


def digit_runs(text_col) -> tuple[pa.Array, pa.Array]:
    """Vectorized findall(r'\\d+') over a string column: returns
    (parent_row_indices, runs) — every maximal digit run with the row it
    came from.  All C kernels (regex replace -> trim -> split -> flatten),
    no per-row Python: replaces the per-row findall loops in the mention
    stages (MentionOccurrences / MentionSurfaceForms, the r2 hot-loop
    note).  Exactly matches re.findall(NUM_RE) semantics."""
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    t = pc.fill_null(text_col, "")
    # non-digit runs -> single space, so split(" ") yields the digit runs
    cleaned = pc.replace_substring_regex(t, pattern="[^0-9]+", replacement=" ")
    trimmed = pc.utf8_trim(cleaned, " ")
    lists = pc.split_pattern(trimmed, pattern=" ")
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    mask = pc.not_equal(flat, "")  # empty rows produce one "" token
    return parents.filter(mask), flat.filter(mask)


def word_runs(text_col) -> tuple[pa.Array, pa.Array]:
    """Vectorized lowercase word tokenizer: returns (parent_row_indices,
    tokens) — every maximal [a-z0-9]+ run of lower(text) with the row it
    came from.  The sibling of digit_runs, same all-C-kernel shape;
    exactly matches re.findall('[a-z0-9]+', text.lower()) and DuckDB's
    regexp_extract_all(lower(text), '[a-z0-9]+')."""
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    t = pc.utf8_lower(pc.fill_null(text_col, ""))
    cleaned = pc.replace_substring_regex(t, pattern="[^a-z0-9]+", replacement=" ")
    trimmed = pc.utf8_trim(cleaned, " ")
    lists = pc.split_pattern(trimmed, pattern=" ")
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    mask = pc.not_equal(flat, "")
    return parents.filter(mask), flat.filter(mask)


def safe_join(
    left,
    left_schema: pa.Schema,
    right,
    right_schema: pa.Schema,
    *,
    join_type: str,
    on: tuple,
    right_on: tuple,
    sentinel_key: int = -(2**61),
    num_partitions: int | None = None,
):
    """`Dataset.join` that survives ZERO-block inputs (empty filter
    results, empty scans): join_ready's pin/repartition cannot help when
    the upstream yields no blocks at all — nothing flows, so the hash
    shuffle has no first block to broadcast a schema from and every
    aggregator partition finalizes an empty-SCHEMA table (the Acero
    `No match ... FieldRef.Name` crash, reproduced on fully-empty input
    for every chained-join query).

    Recipe: union ONE sentinel row per side whose join key is an
    impossible value (for int64 keys `sentinel_key`, far outside any real
    key domain; for string keys a "\\x00"-prefixed token no tokenizer or
    id generator in this engine can emit; the two sides get different
    values so they can never match each other), so each side always has
    >= 1 real row and the schema broadcast always happens; after the
    join, filter rows carrying the left sentinel key (inner/semi joins
    drop both naturally; anti/outer joins would emit the left sentinel).
    Integer join keys in this engine are int64 ids >= 0, so the int
    sentinel domain is safe by construction.

    Scope: inner / left_semi / left_anti / left_outer only - a FULL
    outer join legitimately emits null left keys, which the sentinel
    strip would also drop."""
    import ray.data

    from ifctordf_ray.tuning import join_kwargs

    lkey, rkey = on[0], right_on[0]
    ktype = left_schema.field(lkey).type
    if pa.types.is_string(ktype) or pa.types.is_large_string(ktype):
        lsent, rsent = "\x00L", "\x00R"
    else:
        lsent, rsent = sentinel_key, sentinel_key + 1

    def _seed(schema: pa.Schema, key: str, val) -> dict:
        row = {}
        for f in schema:
            if f.name == key:
                row[f.name] = val
            elif pa.types.is_integer(f.type) or pa.types.is_floating(f.type):
                row[f.name] = 0
            elif pa.types.is_string(f.type) or pa.types.is_large_string(f.type):
                row[f.name] = ""
            elif pa.types.is_binary(f.type):
                row[f.name] = b""
            elif pa.types.is_boolean(f.type):
                row[f.name] = False
            else:
                row[f.name] = None
        return row

    # the sentinel rides join_ready's own union (BEFORE its repartition):
    # the repartition barrier is what absorbs empty/zero blocks into
    # schema-ful ones, so the seed must precede it
    l = join_ready(left, left_schema, sentinel_row=_seed(left_schema, lkey, lsent))
    r = join_ready(
        right, right_schema, sentinel_row=_seed(right_schema, rkey, rsent)
    )
    joined = l.join(
        r,
        join_type=join_type,
        on=on,
        right_on=right_on,
        **join_kwargs(num_partitions),
    )

    def _strip(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or lkey not in t.schema.names:
            return t
        return t.filter(pc.not_equal(t[lkey], lsent))

    return joined.map_batches(_strip, batch_format="pyarrow")
