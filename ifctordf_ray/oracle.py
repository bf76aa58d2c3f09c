"""Single-process pure-Python reference oracle.

Plays the role the Jena golden .ttl files play for the reference
(TestIfcSpfReader.java:102-151: convert, assert triple-set equality):
a deliberately simple, obviously-correct implementation of the triple
spec in stages/extract.py, against which the distributed pipelines are
asserted triple-set-equal (fixtures) / P/R >= 0.95 (corpus).

No Ray, no Arrow tricks — plain dicts and loops.
"""

from __future__ import annotations

import re
from collections import defaultdict

from ifctordf_ray import schema as S

Triple = tuple[str, str, str, str]  # subj, pred, obj, obj_kind


def extract_reference(
    rows: list[dict], dedup: bool = False
) -> tuple[set[Triple], list[dict]]:
    """rows: dicts with conv_id, turn_idx, role, text, tool, ts (datetime).
    Returns (triple set, error rows).  Conversations with any dangling
    '#N' reference contribute no triples at all (per-conversation abort,
    the reference's ERROR 6/7 file-abort at conversation granularity).

    dedup=True collapses in-conversation duplicate turns (first-seen by
    (role, text, tool)) and redirects '#N' refs to dropped turns to their
    keeper; ref validity is judged against the PRE-dedup turn set."""
    num_re = re.compile(S.NUM_RE)
    ref_re = re.compile(S.REF_RE)
    dec_re = re.compile(S.DEC_RE)
    hex_re = re.compile(S.HEX_RE)
    outer_re = re.compile(S.OUTER_LIST_RE)
    inner_re = re.compile(S.INNER_LIST_RE)
    convs: dict[str, list[dict]] = defaultdict(list)
    for r in rows:
        convs[r["conv_id"]].append(r)

    triples: set[Triple] = set()
    errors: list[dict] = []
    for cid, turns in convs.items():
        turns = sorted(turns, key=lambda r: r["turn_idx"])
        turn_set = {r["turn_idx"] for r in turns}
        # vocab errors always recorded
        conv_triples: set[Triple] = set()
        dangling = False
        for r in turns:
            i = r["turn_idx"]
            t_iri = S.turn_iri(cid, i)
            if r["role"] not in S.ROLES:
                errors.append(
                    {"conv_id": cid, "turn_idx": i, "code": S.E_BAD_ROLE,
                     "detail": "" if r["role"] is None else str(r["role"])}
                )
            if r.get("tool") is not None and r["tool"] not in S.TOOLS:
                errors.append(
                    {"conv_id": cid, "turn_idx": i, "code": S.E_BAD_TOOL,
                     "detail": str(r["tool"])}
                )
            text = r.get("text") or ""
            for m in ref_re.findall(text):
                if int(m) not in turn_set:
                    dangling = True
                    errors.append(
                        {"conv_id": cid, "turn_idx": i,
                         "code": S.E_DANGLING_REF, "detail": f"#{m}"}
                    )
        if dangling:
            continue
        redirect: dict[int, int] = {}
        if dedup:
            seen: dict[tuple, int] = {}
            kept = []
            for r in turns:
                key = (r["role"], r.get("text"), r.get("tool"))
                if key in seen:
                    redirect[r["turn_idx"]] = seen[key]
                else:
                    seen[key] = r["turn_idx"]
                    kept.append(r)
            turns = kept
        conv_triples.add((S.conv_iri(cid), S.RDF_TYPE, S.CLS_CONVERSATION, "uri"))
        for k, r in enumerate(turns):
            i = r["turn_idx"]
            t_iri = S.turn_iri(cid, i)
            text = r.get("text") or ""
            conv_triples.add((t_iri, S.RDF_TYPE, S.CLS_TURN, "uri"))
            conv_triples.add((S.conv_iri(cid), S.P_HAS_TURN, t_iri, "uri"))
            conv_triples.add(
                (t_iri, S.P_TURN_INDEX, S.typed_literal(str(i), S.XSD_INTEGER), "literal")
            )
            conv_triples.add(
                (t_iri, S.P_AT_TIME,
                 S.typed_literal(r["ts"].strftime(S.TS_FORMAT), S.XSD_DATETIME),
                 "literal")
            )
            if r["role"] in S.ROLES:
                conv_triples.add((t_iri, S.P_HAS_ROLE, S.role_iri(r["role"]), "uri"))
            if r.get("tool") is not None and r["tool"] in S.TOOLS:
                conv_triples.add((t_iri, S.P_USED_TOOL, S.tool_iri(r["tool"]), "uri"))
            flag = "true" if r.get("tool") is not None else "false"
            conv_triples.add(
                (t_iri, S.P_TOOL_FLAG, S.typed_literal(flag, S.XSD_BOOLEAN), "literal")
            )
            raw_text = r.get("text")
            pres = "UNKNOWN" if raw_text is None else ("FALSE" if raw_text == "" else "TRUE")
            conv_triples.add((t_iri, S.P_TEXT_PRESENCE, S.logical_iri(pres), "uri"))
            w = S.text_wrapper_iri(text)
            conv_triples.add((t_iri, S.P_HAS_TEXT, w, "uri"))
            conv_triples.add(
                (w, S.P_HAS_STRING, S.typed_literal(text, S.XSD_STRING), "literal")
            )
            if k + 1 < len(turns):
                conv_triples.add(
                    (t_iri, S.P_NEXT_TURN, S.turn_iri(cid, turns[k + 1]["turn_idx"]), "uri")
                )
            for m in num_re.findall(text):
                nw = S.num_wrapper_iri(m)
                conv_triples.add((t_iri, S.P_MENTIONS_NUMBER, nw, "uri"))
                conv_triples.add(
                    (nw, S.P_HAS_INTEGER, S.typed_literal(m, S.XSD_INTEGER), "literal")
                )
            for m in dec_re.findall(text):
                dw = S.dec_wrapper_iri(m)
                conv_triples.add((t_iri, S.P_MENTIONS_DECIMAL, dw, "uri"))
                conv_triples.add(
                    (dw, S.P_HAS_DOUBLE, S.typed_literal(m, S.XSD_DOUBLE), "literal")
                )
            for m in hex_re.findall(text):
                if len(m) % 2:  # odd run: outside hexBinary's lexical space
                    continue
                hw = S.hex_wrapper_iri(m)
                conv_triples.add((t_iri, S.P_MENTIONS_HEX, hw, "uri"))
                conv_triples.add(
                    (hw, S.P_HAS_HEXBINARY,
                     S.typed_literal(m, S.XSD_HEXBINARY), "literal")
                )
            for olex in outer_re.findall(text):
                conv_triples.add(
                    (t_iri, S.P_MENTIONS_LIST, S.list_node_iri(olex, 0), "uri")
                )
                inners = inner_re.findall(olex)
                for oi, ilex in enumerate(inners):
                    conv_triples.add(
                        (S.list_node_iri(olex, oi), S.P_HAS_CONTENTS,
                         S.list_node_iri(ilex, 0), "uri")
                    )
                    if oi + 1 < len(inners):
                        conv_triples.add(
                            (S.list_node_iri(olex, oi), S.P_HAS_NEXT,
                             S.list_node_iri(olex, oi + 1), "uri")
                        )
                    cells = ilex.split(",")
                    for j, d in enumerate(cells):
                        conv_triples.add(
                            (S.list_node_iri(ilex, j), S.P_HAS_CONTENTS,
                             S.num_wrapper_iri(d), "uri")
                        )
                        if j + 1 < len(cells):
                            conv_triples.add(
                                (S.list_node_iri(ilex, j), S.P_HAS_NEXT,
                                 S.list_node_iri(ilex, j + 1), "uri")
                            )
            for m in ref_re.findall(text):
                tgt = redirect.get(int(m), int(m))
                conv_triples.add(
                    (t_iri, S.P_MENTIONS_TURN, S.turn_iri(cid, tgt), "uri")
                )
        triples |= conv_triples
    return triples, errors


def precision_recall(actual: set[Triple], expected: set[Triple]) -> tuple[float, float]:
    if not actual or not expected:
        return (float(not expected and not actual),) * 2
    inter = len(actual & expected)
    return inter / len(actual), inter / len(expected)
