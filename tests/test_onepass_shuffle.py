"""distinct_onepass (custom raw-Ray one-pass range shuffle) must be
EXACTLY equivalent to distinct (Ray Data sort + adjacent dedup): same
rows, same global order.  It is the documented alternative exchange
(BASELINE.md round-4 lever table: measured parity with the built-in sort
at 8 and 32 CPUs — kept as the multi-node scale alternative since it
skips the map-side sort and ships 8 B/row less)."""

import pyarrow as pa
import ray.data

from ifctordf_ray.stages import extract as X


def _rows(ds):
    bs = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    if not bs:
        return []
    t = pa.concat_tables(bs)
    return list(zip(*(t[c].to_pylist() for c in t.schema.names)))


def test_onepass_equals_sort_distinct_flagship():
    from ifctordf_ray.sources.transcripts import transcripts_from_events

    tr = transcripts_from_events("/root/testdata/sf0.001", drop_dangling=True)
    triples = tr.map_batches(
        X.extract_triples_fn, batch_format="pyarrow", batch_size=512
    )
    a = _rows(X.distinct(triples, X.COMPACT_COLS, int_prefix_key=True))
    b = _rows(X.distinct_onepass(triples, X.COMPACT_COLS))
    assert a == b  # same set AND same global order


def test_onepass_skewed_duplicates_across_blocks():
    # one hot key dominating + dupes guaranteed to span input blocks
    rows = []
    for rep in range(4):
        rows += [("hot", 1, "x")] * 50
        rows += [(f"k{i:04d}", i % 3, f"v{i % 7}") for i in range(100)]
    t = pa.table(
        {
            "subj": pa.array([r[0] for r in rows], pa.string()),
            "pred_id": pa.array([r[1] for r in rows], pa.int8()),
            "obj": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(8)
    a = _rows(X.distinct(ds, X.COMPACT_COLS, int_prefix_key=True))
    b = _rows(X.distinct_onepass(ds, X.COMPACT_COLS, num_partitions=5))
    assert a == b
    assert len(b) == len(set(rows))


def test_onepass_shared_8byte_prefix_single_bucket():
    """Worst-case skew: EVERY key shares the same 8-byte prefix, so the
    int64 prefix key has a single value, sampling yields at most one
    bound and the whole exchange collapses into one merge bucket.
    Correctness must hold (the merge sorts/dedups on the FULL column
    list, not the prefix key); the perf collapse is documented in
    distinct_onepass's docstring, not worked around."""
    rows = [(f"SAMEPREF-{i % 40:04d}", i % 3, f"v{i % 5}") for i in range(400)]
    t = pa.table(
        {
            "subj": pa.array([r[0] for r in rows], pa.string()),
            "pred_id": pa.array([r[1] for r in rows], pa.int8()),
            "obj": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(6)
    a = _rows(X.distinct(ds, X.COMPACT_COLS, int_prefix_key=True))
    b = _rows(X.distinct_onepass(ds, X.COMPACT_COLS, num_partitions=7))
    assert a == b
    assert len(b) == len(set(rows))


def test_onepass_duplicates_straddling_sampled_bounds():
    """Duplicate rows land in different input blocks AND their key is
    dense enough to be chosen as a range bound: searchsorted(side=right)
    must still map every copy of an equal key into ONE bucket, so the
    adjacent dedup sees all copies."""
    # 16 distinct keys, each duplicated in every one of 8 blocks -> every
    # possible bound value is itself a duplicated key
    rows = [(f"k{i:02d}", 0, "x") for i in range(16)] * 8
    t = pa.table(
        {
            "subj": pa.array([r[0] for r in rows], pa.string()),
            "pred_id": pa.array([r[1] for r in rows], pa.int8()),
            "obj": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(8)
    got = _rows(X.distinct_onepass(ds, X.COMPACT_COLS, num_partitions=16))
    assert got == sorted(set(rows))


def test_onepass_k1_degenerate():
    rows = [(f"s{i % 9}", i % 2, "o") for i in range(50)]
    t = pa.table(
        {
            "subj": pa.array([r[0] for r in rows], pa.string()),
            "pred_id": pa.array([r[1] for r in rows], pa.int8()),
            "obj": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    got = _rows(X.distinct_onepass(ds, X.COMPACT_COLS, num_partitions=1))
    assert got == sorted(set(rows))


def test_onepass_recompute_determinism():
    """Retry safety: Ray reconstructs a lost task output by RE-RUNNING the
    task function on the SAME inputs, so recompute-under-retry is exactly
    a second execution of _shuffle_split/_shuffle_merge with identical
    arguments — which must be bit-identical (stable argsort, static
    bounds, no RNG).  A true worker-kill object-loss test needs a
    multi-node object store (single-node, driver-owned outputs survive
    worker death), so we assert the property reconstruction depends on,
    at the task level, plus global-order stability across full runs."""
    import numpy as np
    import ray

    from ifctordf_ray.sources.transcripts import transcripts_from_events

    # task-level: identical inputs -> identical outputs, twice
    t = pa.table(
        {
            "subj": pa.array([f"s{i % 13:02d}" for i in range(200)], pa.string()),
            "pred_id": pa.array([i % 3 for i in range(200)], pa.int8()),
            "obj": pa.array([f"o{i % 7}" for i in range(200)], pa.string()),
        }
    )
    bounds = np.array(
        [X._sort_key8(pa.array(["s04"]))[0].as_py(),
         X._sort_key8(pa.array(["s09"]))[0].as_py()], dtype=np.int64
    )
    s1 = ray.get(X._shuffle_split.options(num_returns=3).remote(
        t, bounds, 3, X.COMPACT_COLS))
    s2 = ray.get(X._shuffle_split.options(num_returns=3).remote(
        t, bounds, 3, X.COMPACT_COLS))
    assert [p.to_pydict() for p in s1] == [p.to_pydict() for p in s2]
    m1 = ray.get(X._shuffle_merge.remote(X.COMPACT_COLS, *s1))
    m2 = ray.get(X._shuffle_merge.remote(X.COMPACT_COLS, *s2))
    assert m1.to_pydict() == m2.to_pydict()

    # run-level: block boundaries may differ (Ray bundling), but the
    # concatenated global row order is identical run to run
    tr = transcripts_from_events("/root/testdata/sf0.001", drop_dangling=True)
    triples = tr.map_batches(
        X.extract_triples_fn, batch_format="pyarrow", batch_size=512
    )
    r1 = _rows(X.distinct_onepass(triples, X.COMPACT_COLS, num_partitions=9))
    r2 = _rows(X.distinct_onepass(triples, X.COMPACT_COLS, num_partitions=9))
    assert r1 == r2


def test_onepass_empty_and_single_row():
    schema = pa.schema(
        [("subj", pa.string()), ("pred_id", pa.int8()), ("obj", pa.string())]
    )
    empty = ray.data.from_arrow(schema.empty_table())
    assert _rows(X.distinct_onepass(empty, X.COMPACT_COLS)) == []
    one = ray.data.from_arrow(
        pa.table({"subj": ["s"], "pred_id": pa.array([0], pa.int8()), "obj": ["o"]})
    )
    assert _rows(X.distinct_onepass(one, X.COMPACT_COLS)) == [("s", 0, "o")]
