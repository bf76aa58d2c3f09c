"""KG query-side ops added round 4: VoID stats, bounded property paths,
SHACL-style shape violations, DESCRIBE serialization.

Each test recomputes the expected result brute-force from the raw triple
stream (driver-side Python over the sf0.001 graph) and asserts set
equality with the distributed pipeline's output.
"""

import pyarrow as pa
import ray.data

from ifctordf_ray import schema as S
from ifctordf_ray.pipelines import kg

SF = "/root/testdata/sf0.001"


def _table(ds) -> pa.Table:
    return pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )


def _triples():
    t = _table(kg.kg_from_events(SF, mode="fast"))
    return list(
        zip(*(t[c].to_pylist() for c in ("subj", "pred", "obj", "obj_kind")))
    )


def test_void_stats_match_bruteforce():
    trips = _triples()
    want = {
        "n_triples": len(set(trips)),
        "n_distinct_subjects": len({s for s, _, _, _ in trips}),
        "n_properties": len({p for _, p, _, _ in trips}),
        "n_distinct_uri_objects": len(
            {o for _, _, o, k in trips if k == "uri"}
        ),
        "n_classes": len({o for _, p, o, _ in trips if p == S.RDF_TYPE}),
    }
    per_class: dict[str, set] = {}
    for s, p, o, _ in trips:
        if p == S.RDF_TYPE:
            per_class.setdefault(o, set()).add(s)
    for cls, subs in per_class.items():
        want[f"class_instances:{cls}"] = len(subs)

    got_t = _table(kg.kg_void_stats(SF))
    got = dict(zip(got_t["stat"].to_pylist(), got_t["n"].to_pylist()))
    assert got == want


def test_property_paths_match_bruteforce_walk():
    trips = _triples()
    nxt = {s: o for s, p, o, _ in trips if p == S.P_NEXT_TURN}
    # nextTurn is max-1 out-degree by shape; the dict comprehension above
    # would silently collapse duplicates, so assert the premise first.
    assert len(nxt) == sum(1 for _, p, _, _ in trips if p == S.P_NEXT_TURN)
    want = set()
    for src in nxt:
        cur = src
        for dist in (1, 2, 3):
            cur = nxt.get(cur)
            if cur is None:
                break
            want.add((src, cur, dist))

    got_t = _table(kg.kg_property_paths(SF))
    got = set(
        zip(*(got_t[c].to_pylist() for c in ("src", "dst", "dist")))
    )
    assert got == want
    assert len(got) == got_t.num_rows  # no duplicate pairs


def test_shape_violations_match_bruteforce():
    trips = _triples()
    counts: dict[tuple[str, str], int] = {}
    shaped = {p: (mn, mx) for p, mn, mx in S.SHAPES}
    for s, p, _, _ in trips:
        if p in shaped:
            counts[(s, p)] = counts.get((s, p), 0) + 1
    want = set()
    for (s, p), n in counts.items():
        mx = shaped[p][1]
        if mx is not None and n > mx:
            want.add((s, p, n, mx, "max"))
    turns = {s for s, p, o, _ in trips if p == S.RDF_TYPE and o == S.CLS_TURN}
    for p, (mn, _mx) in shaped.items():
        if mn >= 1:
            havers = {s for s, pp, _, _ in trips if pp == p}
            for s in turns - havers:
                want.add((s, p, 0, mn, "min"))

    got_t = _table(kg.kg_shape_violations(SF))
    got = set(
        zip(
            *(
                got_t[c].to_pylist()
                for c in ("focus", "pred", "n", "allowed", "kind")
            )
        )
    )
    assert got == want
    # min rows = turns whose role was out-of-vocab (L6 drops the triple
    # into the error side-output, leaving the typed Turn role-less) —
    # the SHACL report surfaces exactly those; max rows = multi-number
    # turns.  Both fire on sf0.001, so the report is non-trivial.
    assert any(k == "min" for *_rest, k in got)
    assert any(k == "max" for *_rest, k in got)


def test_list_members_match_bruteforce_unfold():
    # the sf corpora carry no list mentions, so drive the op with
    # fixture transcripts: nested lists, cross-sublist sharing, and a
    # singleton — the f25/f26 construction cases, now queried back
    import re

    from ifctordf_ray.sources.transcripts import transcripts_table
    from ifctordf_ray.stages import extract

    rows = [
        {"conv_id": "c", "turn_idx": 0, "role": "user",
         "text": "args ((1,2),(3,4)) end"},
        {"conv_id": "c", "turn_idx": 1, "role": "assistant",
         "text": "a ((7,8),(7,8)) b"},
        {"conv_id": "d", "turn_idx": 0, "role": "user",
         "text": "c ((7,8),(9))"},
    ]
    triples = extract.extract_fast(
        ray.data.from_arrow(transcripts_table(rows))
    )
    trips = list(
        zip(
            *(
                _table(triples)[c].to_pylist()
                for c in ("subj", "pred", "obj", "obj_kind")
            )
        )
    )
    rx = re.compile(r"^inst:listn/([0-9a-f]+)/(\d+)$")
    contents, next_pos = [], set()
    for s, p, o, k in trips:
        m = rx.match(s)
        if not m:
            continue
        chain, pos = m.group(1), int(m.group(2))
        if p == S.P_HAS_CONTENTS:
            contents.append((chain, pos, o, k))
        elif p == S.P_HAS_NEXT:
            next_pos.add((chain, pos))
    want = {
        (
            f"inst:listn/{c}/0",
            pos,
            member,
            kind,
            pos == 0 or (c, pos - 1) in next_pos,
        )
        for c, pos, member, kind in contents
    }
    assert want and any(pos > 0 for _, pos, *_r in want)

    got_t = _table(kg.list_members(triples))
    got = set(
        zip(
            *(
                got_t[c].to_pylist()
                for c in ("head", "pos", "member", "member_kind", "linked")
            )
        )
    )
    assert got == want
    # chains are valid-by-construction: every position linked
    assert all(linked for *_rest, linked in got)


def test_kg_list_members_matches_sql_oracle():
    # the driver-checkable gate row: deterministic list injection (a pure
    # function of the input table) -> flagship extraction -> unfold, vs
    # the identical derivation in DuckDB
    import duckdb

    from ifctordf_ray import sql_oracle as O

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    exp = (
        con.execute(O.kg_list_members_sql())
        .fetch_arrow_table()
        .sort_by([(c, "ascending") for c in ("head", "pos", "member")])
    )
    got = (
        _table(kg.kg_list_members(SF))
        .select(exp.column_names)
        .sort_by([(c, "ascending") for c in ("head", "pos", "member")])
    )
    assert got.num_rows == exp.num_rows > 0
    assert got.equals(exp.cast(got.schema))
    # non-trivial structure: multi-position chains with verified links
    assert any(p > 0 for p in got["pos"].to_pylist())
    assert all(got["linked"].to_pylist())


def test_list_members_schema_stable_on_listfree_corpus():
    # the sf corpora carry no list mentions: 0 rows, but the anchor
    # block keeps the contract schema visible to downstream consumers
    ds = kg.list_members(kg.kg_from_events(SF, mode="fast"))
    assert ds.count() == 0
    assert [f.name for f in ds.schema().base_schema] == [
        "head", "pos", "member", "member_kind", "linked",
    ]


def test_predicate_cooccurrence_matches_bruteforce():
    trips = _triples()
    per_subj: dict[str, set] = {}
    for s, p, _, _ in trips:
        per_subj.setdefault(s, set()).add(p)
    want: dict[tuple[str, str], int] = {}
    for preds in per_subj.values():
        sp = sorted(preds)
        for i in range(len(sp)):
            for j in range(i + 1, len(sp)):
                want[(sp[i], sp[j])] = want.get((sp[i], sp[j]), 0) + 1

    got_t = _table(kg.kg_predicate_cooccurrence(SF))
    got = {
        (a, b): n
        for a, b, n in zip(
            *(got_t[c].to_pylist() for c in ("pred_a", "pred_b", "n_subjects"))
        )
    }
    assert got == want


def test_named_graphs_match_bruteforce():
    import re

    trips = _triples()
    conv_rx = re.compile(r"^inst:conv/(.+)$")
    turn_rx = re.compile(r"^inst:turn/(.+)/\d+$")
    want: dict[str, int] = {}
    for s, _, _, _ in trips:
        m = conv_rx.match(s) or turn_rx.match(s)
        g = m.group(1) if m else "shared"
        want[g] = want.get(g, 0) + 1

    got_t = _table(kg.kg_named_graphs(SF))
    got = dict(
        zip(got_t["graph"].to_pylist(), got_t["n_triples"].to_pylist())
    )
    assert got == want
    assert "shared" in got  # canonical wrapper nodes exist


def test_describe_matches_bruteforce_rendering():
    trips = _triples()
    adj: dict[str, list[str]] = {}
    for s, p, o, k in trips:
        item = f"{p} {o}" if k == "uri" else f'{p} "{o}"'
        adj.setdefault(s, []).append(item)
    want = {s: "; ".join(sorted(items)) for s, items in adj.items()}

    got_t = _table(kg.kg_describe(SF))
    got = dict(
        zip(got_t["subj"].to_pylist(), got_t["description"].to_pylist())
    )
    assert got == want
