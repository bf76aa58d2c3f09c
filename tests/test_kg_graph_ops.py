"""KG graph ops: RDFS type inference + star-pattern query.

kg_inferred_types must equal the brute-force entailment of the asserted
rdf:type triples under schema.SUBCLASS_OF (transitive, set semantics);
kg_star_pattern must equal the set intersection of the two arms'
subject sets computed independently from the triple stream.
"""

import pyarrow as pa

from ifctordf_ray import schema as S
from ifctordf_ray.pipelines import kg

SF = "/root/testdata/sf0.001"


def _rows(ds, cols):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    return set(zip(*(t[c].to_pylist() for c in cols)))


def test_subclass_closure_transitive_diamond():
    # pure unit test on the closure helper via a local diamond TBox
    import ifctordf_ray.schema as sch

    orig = sch.SUBCLASS_OF
    try:
        sch.SUBCLASS_OF = (
            ("A", "B"),
            ("A", "C"),
            ("B", "D"),
            ("C", "D"),
            ("D", "E"),
        )
        cl = sch.subclass_closure()
        assert cl["A"] == ("B", "C", "D", "E")
        assert cl["B"] == ("D", "E")
        assert cl["D"] == ("E",)
    finally:
        sch.SUBCLASS_OF = orig


def test_inferred_types_equal_bruteforce_entailment():
    triples = _rows(kg.kg_from_events(SF, mode="fast"), ("subj", "pred", "obj"))
    closure = S.subclass_closure()
    want = set()
    for s, p, o in triples:
        if p == S.RDF_TYPE:
            want.add((s, p, o, "uri"))
            for sup in closure.get(o, ()):
                want.add((s, p, sup, "uri"))
    got_ds = kg.kg_inferred_types(SF)
    got_list = []
    for b in got_ds.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        got_list.extend(
            zip(*(t[c].to_pylist() for c in ("subj", "pred", "obj", "obj_kind")))
        )
    assert len(got_list) == len(set(got_list)), "output is not distinct"
    assert set(got_list) == want
    # the TBox actually entailed something beyond the asserted triples
    n_asserted = sum(1 for s, p, o in triples if p == S.RDF_TYPE)
    assert len(want) > n_asserted


def test_star_pattern_equals_arm_intersection():
    triples = _rows(kg.kg_from_events(SF, mode="fast"), ("subj", "pred", "obj"))
    role_subj = {s for s, p, o in triples
                 if p == S.P_HAS_ROLE and o == "ont:role/tool"}
    tool_subj = {s for s, p, o in triples
                 if p == S.P_USED_TOOL and o == "ont:tool/logger"}
    want = role_subj & tool_subj
    got = {r[0] for r in _rows(kg.kg_star_pattern(SF), ("subj",))}
    assert want, "degenerate fixture: no star matches at sf0.001"
    assert got == want


def test_star_pattern_empty_vocab_combo():
    # an out-of-vocab tool yields zero matches but a well-typed result
    ds = kg.kg_star_pattern(SF, role="tool", tool="mailer")
    assert ds.count() == 0
