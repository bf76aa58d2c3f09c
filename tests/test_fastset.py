"""Exchange-light Parquet materialization (kg.materialize_parquet_fastset).

Correctness hinges on ONE invariant: after per-batch pre-dedup, only
shared-wrapper subjects (extract.SHARED_SUBJ_WIRE_CODES) can carry
globally-duplicated triples — the conversation-scoped slice is distinct
by construction.  These tests check the invariant directly on the
compact stream, then verify the materialized file set equals the sorted
flagship's triple set exactly.
"""

import collections

import pyarrow as pa

from ifctordf_ray.pipelines import kg
from ifctordf_ray.sources import sinks
from ifctordf_ray.sources.transcripts import transcripts_from_events
from ifctordf_ray.stages import extract

SF = "/root/testdata/sf0.001"


def _rows(ds, cols):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    return list(zip(*(t[c].to_pylist() for c in cols)))


def test_conv_scoped_slice_globally_distinct():
    # THE invariant: every non-shared-subject compact triple appears
    # exactly once across the whole corpus (so skipping the exchange for
    # that slice loses nothing)
    tr = transcripts_from_events(SF, drop_dangling=True)
    compact = extract.extract_compact(tr, prevalidated=True)
    rows = _rows(compact, ("subj", "pred_id", "obj"))
    shared = set(extract.SHARED_SUBJ_WIRE_CODES)
    conv_rows = [r for r in rows if r[0][0] not in shared]
    dup = [r for r, n in collections.Counter(conv_rows).items() if n > 1]
    assert dup == []


def test_shared_slice_duplicates_across_batches():
    # the exchange the shared slice is routed through is load-bearing:
    # force >1 extract batch (batch_size=8192) with one number mentioned
    # in every conversation -> its wrapper triple duplicates across
    # batches, while the conv-scoped slice stays globally distinct
    import ray.data

    from ifctordf_ray.sources.transcripts import transcripts_table

    rows = [
        {"conv_id": f"c{i}", "turn_idx": 0, "role": "user",
         "text": "shared number 7 here"}
        for i in range(10000)
    ]
    compact = extract.extract_compact(
        ray.data.from_arrow(transcripts_table(rows)), prevalidated=True
    )
    out = _rows(compact, ("subj", "pred_id", "obj"))
    shared = set(extract.SHARED_SUBJ_WIRE_CODES)
    shared_rows = [r for r in out if r[0][0] in shared]
    assert len(shared_rows) > len(set(shared_rows))
    conv_rows = [r for r in out if r[0][0] not in shared]
    assert len(conv_rows) == len(set(conv_rows))


def test_fastset_triple_set_equals_sorted_flagship(tmp_path):
    out = str(tmp_path / "fastset")
    n = kg.materialize_parquet_fastset(SF, out)
    got = set(
        _rows(
            sinks.read_graph_parquet(f"{out}/parquet"),
            ("subj", "pred", "obj", "obj_kind"),
        )
    )
    want = set(
        _rows(kg.kg_from_events(SF, mode="fast"), ("subj", "pred", "obj", "obj_kind"))
    )
    assert got == want
    assert n == len(want)  # manifest footer count = set size (no dupes
    # in the files, not just in the unioned set)


def test_fastset_rerun_is_idempotent(tmp_path):
    import glob
    import json

    out = str(tmp_path / "fastset")
    n1 = kg.materialize_parquet_fastset(SF, out)
    files1 = sorted(glob.glob(f"{out}/parquet/part-*.parquet"))
    n2 = kg.materialize_parquet_fastset(SF, out)
    files2 = sorted(glob.glob(f"{out}/parquet/part-*.parquet"))
    assert n1 == n2
    assert files1 == files2  # content-addressed: rerun adds nothing
    man = json.load(open(f"{out}/manifest.json"))
    assert man["n_triples"] == n1
