"""Corpus-level P/R metric (BASELINE.json: triple-set P/R >= 0.95 vs the
reference oracle) and determinism-under-parallelism (SURVEY.md §5.2)."""

import ray.data

from ifctordf_ray import oracle
from ifctordf_ray.sources.transcripts import transcripts_from_events
from ifctordf_ray.stages import extract


def tset(ds):
    return {(r["subj"], r["pred"], r["obj"], r["obj_kind"]) for r in ds.take_all()}


def test_corpus_precision_recall(sf_small):
    tr = transcripts_from_events(sf_small).materialize()
    exp, _ = oracle.extract_reference(tr.take_all())
    got = tset(extract.extract_fast(tr))
    p, r = oracle.precision_recall(got, exp)
    assert p >= 0.95 and r >= 0.95  # target; in fact exact:
    assert p == 1.0 and r == 1.0


def test_determinism_under_parallelism(sf_small):
    """Identical triple set regardless of block layout / batch shape —
    the determinism contract that content-derived IRIs buy us
    (SURVEY.md §2.6 A1)."""
    tr = transcripts_from_events(sf_small).materialize()
    a = tset(extract.extract_fast(tr))
    # different physical layout: tiny blocks + a different batch size
    tr2 = tr.repartition(13).materialize()
    dangling, _ = extract.resolve_references(tr2)
    import ray as _ray

    d_ref = _ray.put(dangling)
    raw = tr2.map_batches(
        extract.extract_triples_fn,
        fn_kwargs={"dangling_ref": d_ref},
        batch_format="pyarrow",
        batch_size=100,
    )
    b = tset(extract.decode_triples(extract.distinct(raw, extract.COMPACT_COLS)))
    assert a == b
