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
