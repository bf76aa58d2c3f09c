"""Incremental KG construction: delta EXCEPT base + upsert invariants.

The production contract for kg_delta_triples (pipelines/kg.py): with the
graph split into a base partition and a new partition (deterministic
md5-parity on conv_id — the same dataset-level tag the vocab dispatch
uses), the delta must contain exactly the triples the new partition adds
under SET semantics:

    base ∪ delta == full graph        (upserting the delta completes it)
    base ∩ delta == ∅                 (nothing already present re-emitted)

and upserting the delta into a materialized base Parquet graph must
reproduce the full graph's triple set byte-for-byte.
"""

import pyarrow as pa

from ifctordf_ray.pipelines import kg
from ifctordf_ray.sources import sinks

SF = "/root/testdata/sf0.001"


def _tset(ds) -> set[tuple]:
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    return set(zip(*(t[c].to_pylist() for c in ("subj", "pred", "obj", "obj_kind"))))


def _parity_triples(want_new: bool):
    import pyarrow as _pa

    from ifctordf_ray.functions.kernels import md5_hex
    from ifctordf_ray.sources.transcripts import transcripts_from_events
    from ifctordf_ray.stages import extract

    def flt(t):
        hx = md5_hex(t["conv_id"].to_pylist())
        return t.filter(_pa.array([(h >= "8") == want_new for h in hx]))

    tr = transcripts_from_events(SF, drop_dangling=True)
    return extract.extract_fast(
        tr.map_batches(flt, batch_format="pyarrow"), prevalidated=True
    )


def test_delta_union_and_disjoint():
    full = _tset(kg.kg_from_events(SF, mode="fast"))
    base = _tset(_parity_triples(False))
    delta = _tset(kg.kg_delta_triples(SF))
    assert delta, "parity split produced an empty delta — degenerate test"
    assert base | delta == full
    assert not (base & delta)


def test_delta_upsert_into_parquet_graph(tmp_path):
    out = str(tmp_path / "graph")
    sinks.write_graph_parquet(_parity_triples(False), out)
    before = _tset(sinks.read_graph_parquet(out))
    delta = _tset(kg.kg_delta_triples(SF))
    full = _tset(kg.kg_from_events(SF, mode="fast"))
    assert before | delta == full
