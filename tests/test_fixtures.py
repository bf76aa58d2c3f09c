"""Fixture-family tests — the analog of the reference's 19 golden pairs
(TestIfcSpfReader.testConvertIFCFileToOutputTTL: convert, assert
triple-set equality).  Each fixture builds a tiny transcript table, runs
the GROUPED (flagship) Ray path and asserts exact triple-set equality
against the pure-Python oracle; semantics-specific assertions check the
feature each fixture targets (FIXTURES.md f01-f19)."""

import datetime as dt

import pytest
import ray.data

from ifctordf_ray import oracle
from ifctordf_ray import schema as S
from ifctordf_ray.sources.transcripts import transcripts_table
from ifctordf_ray.stages import extract


def run_both(rows):
    tbl = transcripts_table(rows)
    ds = ray.data.from_arrow(tbl)
    got = {
        (r["subj"], r["pred"], r["obj"], r["obj_kind"])
        for r in extract.extract_grouped(ds).take_all()
    }
    exp, errs = oracle.extract_reference(tbl.to_pylist())
    assert got == exp, (sorted(got - exp)[:5], sorted(exp - got)[:5])
    return got, errs


def test_f01_basic_edge():
    got, _ = run_both(
        [
            {"conv_id": "c", "turn_idx": 0, "role": "user", "text": "hi"},
            {"conv_id": "c", "turn_idx": 1, "role": "assistant", "text": "hello"},
        ]
    )
    assert ("inst:conv/c", S.P_HAS_TURN, "inst:turn/c/0", "uri") in got
    assert ("inst:turn/c/0", S.P_NEXT_TURN, "inst:turn/c/1", "uri") in got
    assert ("inst:conv/c", S.RDF_TYPE, S.CLS_CONVERSATION, "uri") in got


def test_f02_enum_role_and_tool():
    got, _ = run_both(
        [
            {"conv_id": "c", "turn_idx": 0, "role": "tool", "tool": "search",
             "text": "x"},
        ]
    )
    assert ("inst:turn/c/0", S.P_HAS_ROLE, "ont:role/tool", "uri") in got
    assert ("inst:turn/c/0", S.P_USED_TOOL, "ont:tool/search", "uri") in got


def test_f03_typed_literal_verbatim():
    # '0012' keeps its leading zeros (reference verbatim-lexical contract)
    got, _ = run_both(
        [{"conv_id": "c", "turn_idx": 0, "role": "user", "text": "k 0012"}]
    )
    assert ("inst:num/0012", S.P_HAS_INTEGER, "0012^^xsd:integer", "literal") in got
    assert ("inst:num/12", S.P_HAS_INTEGER, "12^^xsd:integer", "literal") not in got


def test_f04_multi_ref_set():
    got, _ = run_both(
        [
            {"conv_id": "c", "turn_idx": 0, "role": "user", "text": "a"},
            {"conv_id": "c", "turn_idx": 1, "role": "user", "text": "b"},
            {"conv_id": "c", "turn_idx": 2, "role": "assistant",
             "text": "see #0 and #1"},
        ]
    )
    assert ("inst:turn/c/2", S.P_MENTIONS_TURN, "inst:turn/c/0", "uri") in got
    assert ("inst:turn/c/2", S.P_MENTIONS_TURN, "inst:turn/c/1", "uri") in got


def test_f05_string_literal_wrapper():
    got, _ = run_both(
        [{"conv_id": "c", "turn_idx": 0, "role": "user",
          "text": "Ghent University"}]
    )
    w = S.text_wrapper_iri("Ghent University")
    assert ("inst:turn/c/0", S.P_HAS_TEXT, w, "uri") in got
    assert (w, S.P_HAS_STRING, "Ghent University^^xsd:string", "literal") in got


def test_f06_dangling_ref_aborts_conversation():
    got, errs = run_both(
        [
            {"conv_id": "bad", "turn_idx": 0, "role": "user", "text": "see #9"},
            {"conv_id": "ok", "turn_idx": 0, "role": "user", "text": "fine"},
        ]
    )
    # conversation 'bad' contributes NOTHING (reference ERROR 6/7 abort,
    # at conversation granularity); 'ok' is fully present
    assert not any(s.startswith("inst:turn/bad") or s.startswith("inst:conv/bad")
                   for s, _, _, _ in got)
    assert ("inst:conv/ok", S.RDF_TYPE, S.CLS_CONVERSATION, "uri") in got
    assert any(e["code"] == S.E_DANGLING_REF and e["detail"] == "#9" for e in errs)


def test_f07_bad_enum_role():
    got, errs = run_both(
        [{"conv_id": "c", "turn_idx": 0, "role": "usre", "text": "x"}]
    )
    # entity still emitted, enum slot silently absent (golden test7)
    assert ("inst:turn/c/0", S.RDF_TYPE, S.CLS_TURN, "uri") in got
    assert not any(p == S.P_HAS_ROLE for _, p, _, _ in got)
    assert any(e["code"] == S.E_BAD_ROLE and e["detail"] == "usre" for e in errs)


def test_f10_literal_canonicalization():
    # same number mentioned in two turns -> ONE wrapper shared (D3 analog)
    got, _ = run_both(
        [
            {"conv_id": "c", "turn_idx": 0, "role": "user", "text": "x 42"},
            {"conv_id": "c", "turn_idx": 1, "role": "user", "text": "y 42"},
        ]
    )
    wrappers = {o for _, p, o, _ in got if p == S.P_MENTIONS_NUMBER}
    assert wrappers == {"inst:num/42"}
    lits = [t for t in got if t[1] == S.P_HAS_INTEGER]
    assert len(lits) == 1


def test_f12_dup_refs_shared_target():
    got, _ = run_both(
        [
            {"conv_id": "c", "turn_idx": 0, "role": "user", "text": "a"},
            {"conv_id": "c", "turn_idx": 1, "role": "user", "text": "#0 then #0"},
        ]
    )
    # set semantics: duplicate refs collapse to one triple, shared target
    assert ("inst:turn/c/1", S.P_MENTIONS_TURN, "inst:turn/c/0", "uri") in got


def test_f17_quotes_commas_unicode_text_equality():
    text = "it's a 'test', with (parens), ünïcode → and \"quotes\" and \n newline"
    got, _ = run_both(
        [{"conv_id": "c", "turn_idx": 0, "role": "user", "text": text}]
    )
    # per-turn text equality invariant: lexical form preserved verbatim
    assert (S.text_wrapper_iri(text), S.P_HAS_STRING,
            text + "^^xsd:string", "literal") in got


def test_f18_shuffled_physical_order():
    rows = [
        {"conv_id": "c", "turn_idx": 2, "role": "user", "text": "c"},
        {"conv_id": "c", "turn_idx": 0, "role": "user", "text": "a"},
        {"conv_id": "c", "turn_idx": 1, "role": "user", "text": "b"},
    ]
    got, _ = run_both(rows)
    assert ("inst:turn/c/0", S.P_NEXT_TURN, "inst:turn/c/1", "uri") in got
    assert ("inst:turn/c/1", S.P_NEXT_TURN, "inst:turn/c/2", "uri") in got
    assert ("inst:turn/c/0", S.P_NEXT_TURN, "inst:turn/c/2", "uri") not in got


def test_sparse_turn_idx_chains_sorted_successor():
    # gaps: grouped path links true successors (spec), no phantom turns
    rows = [
        {"conv_id": "c", "turn_idx": 0, "role": "user", "text": "a"},
        {"conv_id": "c", "turn_idx": 5, "role": "user", "text": "b"},
    ]
    got, _ = run_both(rows)
    assert ("inst:turn/c/0", S.P_NEXT_TURN, "inst:turn/c/5", "uri") in got
    subs = {s for s, _, _, _ in got}
    assert "inst:turn/c/4" not in subs


def test_f19_skew_giant_conversation():
    n = 2000
    rows = [
        {"conv_id": "giant", "turn_idx": i, "role": "user", "text": f"t {i}"}
        for i in range(n)
    ] + [
        {"conv_id": f"s{j}", "turn_idx": k, "role": "user", "text": "x"}
        for j in range(50) for k in range(2)
    ]
    got, _ = run_both(rows)
    chain = [t for t in got if t[1] == S.P_NEXT_TURN and t[0].startswith("inst:turn/giant")]
    assert len(chain) == n - 1


def test_null_role_and_text():
    import pyarrow as pa
    import datetime as dt

    tbl = pa.table(
        {
            "conv_id": pa.array(["c", "c"], pa.string()),
            "turn_idx": pa.array([0, 1], pa.int32()),
            "role": pa.array([None, "user"], pa.string()),
            "text": pa.array([None, "ok"], pa.string()),
            "tool": pa.array([None, None], pa.string()),
            "ts": pa.array([dt.datetime(2024, 1, 1)] * 2, pa.timestamp("us")),
        }
    )
    ds = ray.data.from_arrow(tbl)
    got = {
        (r["subj"], r["pred"], r["obj"], r["obj_kind"])
        for r in extract.extract_grouped(ds).take_all()
    }
    exp, errs = oracle.extract_reference(tbl.to_pylist())
    assert got == exp
    # null role -> error row with empty detail, turn still emitted
    assert any(e["code"] == S.E_BAD_ROLE and e["detail"] == "" for e in errs)
    assert ("inst:turn/c/0", S.RDF_TYPE, S.CLS_TURN, "uri") in got
    assert not any(p == S.P_HAS_ROLE and s.endswith("/0") for s, p, _, _ in got)
    # null text behaves as empty string (wrapper for "")
    assert (S.text_wrapper_iri(""), S.P_HAS_STRING, "^^xsd:string", "literal") in got


def test_f20_double_verbatim_lexical():
    # reference golden test11 analog: "12." stays "12." (verbatim xsd:double)
    got, _ = run_both(
        [{"conv_id": "c", "turn_idx": 0, "role": "user", "text": "v 12. and 3.14"}]
    )
    assert ("inst:dec/12.", S.P_HAS_DOUBLE, "12.^^xsd:double", "literal") in got
    assert ("inst:turn/c/0", S.P_MENTIONS_DECIMAL, "inst:dec/3.14", "uri") in got
    assert ("inst:dec/3.14", S.P_HAS_DOUBLE, "3.14^^xsd:double", "literal") in got
    # the integer mentions of the digit runs are unchanged (both engines)
    assert ("inst:turn/c/0", S.P_MENTIONS_NUMBER, "inst:num/12", "uri") in got
    assert ("inst:dec/12.0", S.P_HAS_DOUBLE, "12.0^^xsd:double", "literal") not in got


def test_f21_boolean_tool_flag():
    got, _ = run_both(
        [
            {"conv_id": "c", "turn_idx": 0, "role": "tool", "tool": "search", "text": "x"},
            {"conv_id": "c", "turn_idx": 1, "role": "user", "text": "y"},
        ]
    )
    assert ("inst:turn/c/0", S.P_TOOL_FLAG, "true^^xsd:boolean", "literal") in got
    assert ("inst:turn/c/1", S.P_TOOL_FLAG, "false^^xsd:boolean", "literal") in got


def test_f22_logical_individual_three_valued():
    got, _ = run_both(
        [
            {"conv_id": "c", "turn_idx": 0, "role": "user", "text": "hello"},
            {"conv_id": "c", "turn_idx": 1, "role": "assistant", "text": ""},
            {"conv_id": "c", "turn_idx": 2, "role": "user", "text": None},
        ]
    )
    assert ("inst:turn/c/0", S.P_TEXT_PRESENCE, "ont:logical/TRUE", "uri") in got
    assert ("inst:turn/c/1", S.P_TEXT_PRESENCE, "ont:logical/FALSE", "uri") in got
    assert ("inst:turn/c/2", S.P_TEXT_PRESENCE, "ont:logical/UNKNOWN", "uri") in got


def run_both_deduped(rows):
    tbl = transcripts_table(rows)
    ds = ray.data.from_arrow(tbl)
    got = {
        (r["subj"], r["pred"], r["obj"], r["obj_kind"])
        for r in extract.extract_deduped(ds).take_all()
    }
    exp, errs = oracle.extract_reference(tbl.to_pylist(), dedup=True)
    assert got == exp, (sorted(got - exp)[:5], sorted(exp - got)[:5])
    return got, errs


def test_f23_dedup_redirects_mentions_turn():
    # turn 2 duplicates turn 0 (same role/text/tool); a '#2' ref must
    # redirect to the keeper turn 0 (IfcSpfParser.java:184-187 analog)
    got, _ = run_both_deduped(
        [
            {"conv_id": "c", "turn_idx": 0, "role": "user", "text": "same"},
            {"conv_id": "c", "turn_idx": 1, "role": "assistant", "text": "see #2"},
            {"conv_id": "c", "turn_idx": 2, "role": "user", "text": "same"},
            {"conv_id": "c", "turn_idx": 3, "role": "user", "text": "tail"},
        ]
    )
    assert ("inst:turn/c/1", S.P_MENTIONS_TURN, "inst:turn/c/0", "uri") in got
    assert ("inst:turn/c/1", S.P_MENTIONS_TURN, "inst:turn/c/2", "uri") not in got
    # the duplicate turn emits no triples of its own ...
    assert ("inst:turn/c/2", S.RDF_TYPE, S.CLS_TURN, "uri") not in got
    # ... and the nextTurn chain skips it
    assert ("inst:turn/c/1", S.P_NEXT_TURN, "inst:turn/c/3", "uri") in got


def test_f24_dedup_ref_to_dropped_turn_is_not_dangling():
    # '#1' targets a dropped duplicate: valid (resolves through the
    # redirect map), so the conversation is NOT aborted
    got, _ = run_both_deduped(
        [
            {"conv_id": "c", "turn_idx": 0, "role": "user", "text": "dup"},
            {"conv_id": "c", "turn_idx": 1, "role": "user", "text": "dup"},
            {"conv_id": "c", "turn_idx": 2, "role": "assistant", "text": "ref #1"},
        ]
    )
    assert got, "conversation must survive"
    assert ("inst:turn/c/2", S.P_MENTIONS_TURN, "inst:turn/c/0", "uri") in got


def test_f25_nested_list_chain():
    # two-level structured list mention ((1,2),(3,4)) -> outer node chain
    # whose cells are inner-list head nodes; inner chains hold the values
    # (reference test13/test16 _List_List analog)
    got, _ = run_both(
        [{"conv_id": "c", "turn_idx": 0, "role": "user",
          "text": "args ((1,2),(3,4)) end"}]
    )
    o0 = S.list_node_iri("((1,2),(3,4))", 0)
    o1 = S.list_node_iri("((1,2),(3,4))", 1)
    i12_0 = S.list_node_iri("1,2", 0)
    i12_1 = S.list_node_iri("1,2", 1)
    i34_0 = S.list_node_iri("3,4", 0)
    assert ("inst:turn/c/0", S.P_MENTIONS_LIST, o0, "uri") in got
    assert (o0, S.P_HAS_CONTENTS, i12_0, "uri") in got
    assert (o0, S.P_HAS_NEXT, o1, "uri") in got
    assert (o1, S.P_HAS_CONTENTS, i34_0, "uri") in got
    assert (i12_0, S.P_HAS_CONTENTS, "inst:num/1", "uri") in got
    assert (i12_0, S.P_HAS_NEXT, i12_1, "uri") in got
    assert (i12_1, S.P_HAS_CONTENTS, "inst:num/2", "uri") in got
    # no dangling hasNext off the last nodes
    assert (o1, S.P_HAS_NEXT, S.list_node_iri("((1,2),(3,4))", 2), "uri") not in got


def test_f26_cross_sublist_sharing():
    # the same inner list (7,8) appears in two different outer lists and
    # twice in one: content-derived nodes -> ONE shared chain (test13/16
    # cross-sublist literal sharing, idCounter replaced)
    got, _ = run_both(
        [
            {"conv_id": "c", "turn_idx": 0, "role": "user",
             "text": "a ((7,8),(7,8)) b"},
            {"conv_id": "c", "turn_idx": 1, "role": "assistant",
             "text": "c ((7,8),(9))"},
        ]
    )
    i78 = S.list_node_iri("7,8", 0)
    heads = [t for t in got if t[1] == S.P_HAS_CONTENTS and t[2] == i78]
    # three outer cells point at the SAME inner head node
    assert len(heads) == 3
    # and the inner chain exists exactly once (set semantics)
    assert (i78, S.P_HAS_CONTENTS, "inst:num/7", "uri") in got


def test_f27_hexbinary_literal():
    """The last P5 dispatch branch (xsd:hexBinary, RDFWriter.java:678-686):
    even-length hex runs after '0x' become verbatim-case hexBinary
    wrappers; odd-length runs emit nothing (outside the lexical space)."""
    got, _ = run_both(
        [{"conv_id": "c", "turn_idx": 0, "role": "user",
          "text": "blob 0xDEADbeef and bad 0xabc end"}]
    )
    assert ("inst:turn/c/0", S.P_MENTIONS_HEX, "inst:hex/DEADbeef", "uri") in got
    assert ("inst:hex/DEADbeef", S.P_HAS_HEXBINARY,
            "DEADbeef^^xsd:hexBinary", "literal") in got
    # odd-length run: no hex triples at all for it
    assert not any("abc" in t[2] and t[1] == S.P_HAS_HEXBINARY for t in got)
