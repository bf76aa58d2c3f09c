"""Corpus-level parity: Ray fast path == Ray grouped path == pure-Python
oracle == DuckDB SQL oracle on the derived sf0.001 corpus, plus the
determinism-under-parallelism contract (SURVEY.md §5.2)."""

import duckdb
import pytest

from ifctordf_ray import oracle, sql_oracle
from ifctordf_ray.sources.transcripts import transcripts_from_events
from ifctordf_ray.stages import extract
from ifctordf_ray.stages.canonicalize import canonicalize_mentions


@pytest.fixture(scope="module")
def corpus(sf_small):
    tr = transcripts_from_events(sf_small)
    rows = tr.take_all()
    exp_triples, exp_errors = oracle.extract_reference(rows)
    return tr, rows, exp_triples, exp_errors


def tset(ds):
    return {(r["subj"], r["pred"], r["obj"], r["obj_kind"]) for r in ds.take_all()}


def test_fast_path_matches_oracle(corpus):
    tr, _, exp, _ = corpus
    assert tset(extract.extract_fast(tr)) == exp


def test_grouped_path_matches_oracle(corpus):
    tr, _, exp, _ = corpus
    assert tset(extract.extract_grouped(tr)) == exp


def test_sql_oracle_matches_python_oracle(corpus, sf_small):
    _, _, exp, exp_errors = corpus
    con = duckdb.connect()
    con.sql(f"create view events as select * from '{sf_small}/events.parquet'")
    got = set(map(tuple, con.sql(sql_oracle.kg_triples_sql()).fetchall()))
    assert got == exp
    errs = sorted(map(tuple, con.sql(sql_oracle.kg_errors_sql()).fetchall()))
    assert errs == sorted(
        (e["conv_id"], e["turn_idx"], e["code"], e["detail"]) for e in exp_errors
    )


def test_errors_side_output(corpus):
    tr, _, _, exp_errors = corpus
    got = sorted(
        (e["conv_id"], e["turn_idx"], e["code"], e["detail"])
        for e in extract.extract_errors(tr).take_all()
    )
    assert got == sorted(
        (e["conv_id"], e["turn_idx"], e["code"], e["detail"]) for e in exp_errors
    )


def test_canonical_mentions_first_seen(corpus, sf_small):
    tr, _, _, _ = corpus
    got = {
        r["surface_key"]: (r["canonical_id"], r["first_seen"], r["n_mentions"])
        for r in canonicalize_mentions(tr).take_all()
    }
    con = duckdb.connect()
    con.sql(f"create view events as select * from '{sf_small}/events.parquet'")
    exp = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(sql_oracle.kg_canonical_mentions_sql()).fetchall()
    }
    assert got == exp


def test_per_turn_text_equality(corpus):
    """Per-row invariant (BASELINE.json input_hint): every turn's text is
    recoverable verbatim from the graph via hasText -> hasString."""
    tr, rows, exp, _ = corpus
    has_text = {}
    has_string = {}
    for s, p, o, k in exp:
        if p == "ont:hasText":
            has_text[s] = o
        elif p == "ont:hasString":
            has_string[s] = o
    from ifctordf_ray import schema as S

    dangling_convs = {
        e["conv_id"]
        for e in oracle.extract_reference(rows)[1]
        if e["code"] == S.E_DANGLING_REF
    }
    checked = 0
    for r in rows:
        if r["conv_id"] in dangling_convs:
            continue
        t_iri = S.turn_iri(r["conv_id"], r["turn_idx"])
        lex = has_string[has_text[t_iri]]
        assert lex == (r["text"] or "") + "^^xsd:string"
        checked += 1
    assert checked > 500


def test_grouped_segmented_equals_mapgroups(corpus):
    """The segmented (sort + per-block) grouped implementation must equal
    the per-conversation map_groups reference implementation."""
    tr, _, exp, _ = corpus
    assert tset(extract.extract_grouped_mapgroups(tr)) == exp


def test_fast_path_rejects_gapped_turn_idx():
    """ADVICE item: the fast path's dense-0-based turn_idx contract is
    VALIDATED, not assumed — gapped input must raise (pointing at the
    grouped path), never silently emit nextTurn edges to missing turns."""
    import pyarrow as pa
    import pytest
    import ray.data

    from ifctordf_ray.sources.transcripts import transcripts_table
    from ifctordf_ray.stages import extract

    rows = [
        {"conv_id": "g", "turn_idx": 0, "role": "user", "text": "a"},
        {"conv_id": "g", "turn_idx": 2, "role": "user", "text": "b"},  # gap
    ]
    ds = ray.data.from_arrow(transcripts_table(rows))
    with pytest.raises(Exception) as ei:
        extract.extract_fast(ds).take_all()
    assert "grouped" in str(ei.value)

    # duplicated turn_idx with matching count/max is also caught (sum check)
    rows2 = [
        {"conv_id": "h", "turn_idx": 0, "role": "user", "text": "a"},
        {"conv_id": "h", "turn_idx": 1, "role": "user", "text": "b"},
        {"conv_id": "h", "turn_idx": 1, "role": "user", "text": "c"},
        {"conv_id": "h", "turn_idx": 3, "role": "user", "text": "d"},
    ]
    ds2 = ray.data.from_arrow(transcripts_table(rows2))
    with pytest.raises(Exception) as ei2:
        extract.extract_fast(ds2).take_all()
    assert "grouped" in str(ei2.value)

    # the grouped path handles the same inputs fine
    assert extract.extract_grouped(ds).count() > 0
    assert extract.extract_grouped(ds2).count() > 0
