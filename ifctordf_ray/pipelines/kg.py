"""Flagship pipeline: transcripts -> knowledge graph.

End-to-end shape (SURVEY.md §3.4):

    read_parquet(transcripts)                 # or derive from events
      -> [assembly + extraction]              # groupby(conv_id) flagship,
                                              # or shuffle-free fast path
      -> distinct (s,p,o) via groupby         # set semantics (D2)
      -> sort(subj)                           # final sorted shuffle
      -> N-Triples + bucketed Parquet partitions + lineage manifest

plus side outputs: errors dataset (per-conversation abort granularity) and
the canonical-mention table (groupby-aggregate canonicalization, D3).

`run_resumable` executes the same pipeline per input-file partition with a
checkpoint manifest — kill it at any point and rerun: finished partitions
are skipped (verified by tests/test_resume.py).
"""

from __future__ import annotations

import time

import ray.data

from ifctordf_ray.sources import sinks
from ifctordf_ray.sources.transcripts import read_transcripts, transcripts_from_events
from ifctordf_ray.stages import extract
from ifctordf_ray.stages.canonicalize import canonicalize_mentions
from ifctordf_ray.state import checkpoint as ckpt


def kg_triples(
    transcripts: ray.data.Dataset, mode: str = "fast", dedup_turns: bool = False
) -> ray.data.Dataset:
    """Deduplicated triple set.  mode='fast' (map_batches, shuffle-free,
    dense turn_idx) or 'grouped' (groupby(conv_id) flagship, any layout).
    dedup_turns=True additionally collapses duplicate turns and redirects
    '#N' refs to the keeper (J2; forces the grouped physical plan)."""
    if dedup_turns:
        return extract.extract_deduped(transcripts)
    if mode == "grouped":
        return extract.extract_grouped(transcripts)
    return extract.extract_fast(transcripts)


def kg_from_events(
    sf_dir: str, mode: str = "fast", replicate: int = 1
) -> ray.data.Dataset:
    """Derived-transcript variant.  The fast path derives with
    drop_dangling=True — reference validation happens inside the
    assembly groupby (a user's conversations are complete in-group), so
    the whole pipeline is ONE fused stream: derive -> extract ->
    sorted-dedup -> consume.  No reference-resolution pass, no
    materialize barrier."""
    if mode == "fast":
        tr = transcripts_from_events(sf_dir, replicate=replicate, drop_dangling=True)
        return extract.extract_fast(tr, prevalidated=True)
    tr = transcripts_from_events(sf_dir, replicate=replicate)
    return kg_triples(tr, mode=mode)


def kg_vocab_dispatch(sf_dir: str) -> ray.data.Dataset:
    """Multi-version vocabulary dispatch pipeline (the getExpressSchema
    5-way dispatch analog, IfcSpfReader.java:186-223): transcripts tagged
    with a deterministic dataset-level vocab version (md5-parity — the
    single-table stand-in for the per-file footer sniff exercised by
    sources.read_transcripts_versioned) flow through the SAME flagship
    fast extraction, where role/tool membership is judged per-row against
    that row's vocabulary generation.  Output is projected to the two
    vocabulary-sensitive predicates so the dispatch is directly visible:
    a 'view' role emits a hasRole triple under v2 and nothing under v1."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ifctordf_ray import schema as S
    from ifctordf_ray.sources.transcripts import tag_vocab_by_conv

    tr = tag_vocab_by_conv(
        transcripts_from_events(sf_dir, drop_dangling=True)
    )
    triples = extract.extract_fast(tr, prevalidated=True)
    keep = pa.array([S.P_HAS_ROLE, S.P_USED_TOOL])
    return triples.map_batches(
        lambda t: t.filter(pc.is_in(t["pred"], keep)), batch_format="pyarrow"
    )


def kg_delta_triples(sf_dir: str) -> ray.data.Dataset:
    """Incremental KG construction: the triples contributed ONLY by the
    'new' conversation partition — delta EXCEPT base, the production
    "apply tonight's partition to the graph without re-emitting
    yesterday's triples" operator.  The new/base split is the same
    deterministic md5-parity dataset tag the vocab dispatch uses
    (md5(conv_id) >= '8' -> new).

    Shape at scale: both sides stream through the SAME flagship
    extraction; the EXCEPT is ONE distributed hash anti-join on the full
    (subj, pred, obj, obj_kind) key — no broadcast (both sides are
    graph-sized), no driver state.  Set semantics make the delta
    well-defined: a triple some base conversation already emitted (a
    shared content-derived wrapper, e.g. a number mentioned in both
    halves) is NOT re-emitted; tests/test_incremental.py asserts
    base ∪ delta == full graph and base ∩ delta == ∅."""
    import pyarrow as pa

    from ifctordf_ray.functions.kernels import md5_hex, safe_join

    def _parity(want_new: bool):
        def flt(t: pa.Table) -> pa.Table:
            hx = md5_hex(t["conv_id"].to_pylist())
            return t.filter(pa.array([(h >= "8") == want_new for h in hx]))

        return flt

    tr = transcripts_from_events(sf_dir, drop_dangling=True)
    new_t = extract.extract_fast(
        tr.map_batches(_parity(True), batch_format="pyarrow"), prevalidated=True
    )
    base_t = extract.extract_fast(
        tr.map_batches(_parity(False), batch_format="pyarrow"), prevalidated=True
    )
    tri_schema = pa.schema([(c, pa.string()) for c in extract.TRIPLE_COLS])
    return safe_join(
        new_t,
        tri_schema,
        base_t,
        tri_schema,
        join_type="left_anti",
        on=tuple(extract.TRIPLE_COLS),
        right_on=tuple(extract.TRIPLE_COLS),
    )


def kg_inferred_types(sf_dir: str) -> ray.data.Dataset:
    """RDFS-entailed rdf:type materialization — the runtime-inference
    analog of the reference's readOntology + Jena OntModel pass
    (IfcSpfReader.java: the ifcOWL TBox drives class resolution; here the
    closed TBox lives in schema.SUBCLASS_OF).  For every asserted
    (x, rdf:type, C) triple, emit (x, rdf:type, S) for each S in C's
    transitive superclass closure, plus the asserted triple — DISTINCT
    set semantics (exact under diamond hierarchies too).

    Scale shape: the closure is vocab-sized and precomputed at import
    (no broadcast, no shuffle to build it); the instance pass is one
    vectorized map_batches (per-class filter + constant-column emit);
    the final distinct is over type-triples only."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ifctordf_ray import schema as S

    closure = S.subclass_closure()
    triples = kg_from_events(sf_dir, mode="fast")

    def _const(n: int, v: str) -> pa.Array:
        return pa.nulls(n, pa.string()).fill_null(v)

    def infer(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["pred"], S.RDF_TYPE))
        outs = [t]
        for cls, supers in closure.items():
            sub = t.filter(pc.equal(t["obj"], cls))
            n = sub.num_rows
            if n:
                for sp in supers:
                    outs.append(
                        pa.table(
                            {
                                "subj": sub["subj"],
                                "pred": _const(n, S.RDF_TYPE),
                                "obj": _const(n, sp),
                                "obj_kind": _const(n, "uri"),
                            }
                        )
                    )
        return pa.concat_tables(outs)

    inferred = triples.map_batches(infer, batch_format="pyarrow")
    return extract.distinct(inferred, extract.TRIPLE_COLS)


def kg_star_pattern(
    sf_dir: str, role: str = "tool", tool: str = "logger"
) -> ray.data.Dataset:
    """Graph pattern query over the constructed KG — the SPARQL-style
    2-arm star join  ?t ont:hasRole role/X . ?t ont:usedTool tool/Y  —
    answered in ONE pass: filter the two arms out of the (distinct)
    triple stream, then ONE groupby(subj) counting matched arms (the
    triple set's distinctness guarantees <= 1 row per (subj, arm), so
    count == 2 IS the star match; no self-join, no broadcast)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from ifctordf_ray import schema as S

    role_obj, tool_obj = f"ont:role/{role}", f"ont:tool/{tool}"
    triples = kg_from_events(sf_dir, mode="fast")

    def arms(t: pa.Table) -> pa.Table:
        m = pc.or_(
            pc.and_(
                pc.equal(t["pred"], S.P_HAS_ROLE), pc.equal(t["obj"], role_obj)
            ),
            pc.and_(
                pc.equal(t["pred"], S.P_USED_TOOL), pc.equal(t["obj"], tool_obj)
            ),
        )
        return t.filter(m).select(["subj"])

    hits = triples.map_batches(arms, batch_format="pyarrow")
    both = hits.groupby("subj").aggregate(Count(alias_name="n_arms"))

    def matched(t: pa.Table) -> pa.Table:
        if "n_arms" not in t.schema.names:  # zero-block upstream
            return pa.table({"subj": pa.array([], pa.string())})
        return t.filter(pc.equal(t["n_arms"], 2)).select(["subj"])

    return both.map_batches(matched, batch_format="pyarrow")


def kg_void_stats(sf_dir: str) -> ray.data.Dataset:
    """VoID-style dataset statistics over the constructed graph: triple
    count, distinct subjects / properties / URI objects / classes, and
    per-class instance counts — the descriptive metadata a published KG
    ships alongside its triples.

    Scale shape: ONE vectorized map emits (stat, k) observation pairs
    (the triple's own 4-tuple is its key for n_triples — the graph is a
    SET, so every row is unique by construction), ONE distinct exchange
    over the pairs, then a vocab-sized groupby(stat) count.  No driver
    state, no broadcast.  The \\x1f joint is collision-safe for this
    engine's lexical space and — being constructed identically in the
    SQL oracle — deterministic regardless."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ifctordf_ray import schema as S

    triples = kg_from_events(sf_dir, mode="fast")
    SEP = "\x1f"

    def pairs(t: pa.Table) -> pa.Table:
        parts: list[pa.Table] = []

        def const(n: int, v: str) -> pa.Array:
            return pa.nulls(n, pa.string()).fill_null(v)

        def add(stat_arr, keys):
            parts.append(pa.table({"stat": stat_arr, "k": keys}))

        n = t.num_rows
        add(
            const(n, "n_triples"),
            pc.binary_join_element_wise(
                t["subj"], t["pred"], t["obj"], t["obj_kind"], SEP
            ),
        )
        add(const(n, "n_distinct_subjects"), t["subj"])
        add(const(n, "n_properties"), t["pred"])
        uri = t.filter(pc.equal(t["obj_kind"], "uri"))
        add(const(uri.num_rows, "n_distinct_uri_objects"), uri["obj"])
        ty = t.filter(pc.equal(t["pred"], S.RDF_TYPE))
        add(const(ty.num_rows, "n_classes"), ty["obj"])
        add(
            pc.binary_join_element_wise(
                const(ty.num_rows, "class_instances"), ty["obj"], ":"
            ),
            ty["subj"],
        )
        return pa.concat_tables(parts).combine_chunks()

    from ray.data.aggregate import Count

    obs = triples.map_batches(pairs, batch_format="pyarrow")
    uniq = extract.distinct(obs, ["stat", "k"])
    return uniq.groupby("stat").aggregate(Count(alias_name="n"))


def kg_property_paths(sf_dir: str, max_hops: int = 3) -> ray.data.Dataset:
    """SPARQL property-path analog: nextTurn{1,max_hops} reachability
    pairs (src, dst, dist) — the bounded transitive closure of the
    turn-succession chain, the query-side counterpart of the reference's
    list hasNext chains (T7-T10).

    Scale shape: ONE exchange total.  nextTurn edges never cross a
    conversation (emitted arithmetically inside the per-conversation
    assembly, extract.py — the documented partitioning assumption), so
    the closure is computed per chain: derive the chain key from the
    turn IRI, ONE groupby(chain).map_groups, and inside each group a
    fully vectorized walk — sort edges by turn index, build the
    consecutive-linkage mask (dst[i] == src[i+1], checked, not
    assumed), and hop-k pairs are shifted-array slices guarded by the
    AND of the k-1 intermediate links.  No joins, no driver state, and
    group size is conversation-length-bounded (same bound the assembly
    groupby relies on).  The per-hop hash-join formulation was the
    naive alternative: max_hops-1 all-to-all exchanges, each replaying
    the edge derivation — strictly worse at any scale."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ifctordf_ray import schema as S

    triples = kg_from_events(sf_dir, mode="fast")

    def edges_fn(t: pa.Table) -> pa.Table:
        e = t.filter(pc.equal(t["pred"], S.P_NEXT_TURN))
        # subj is inst:turn/{conv}/{idx}; greedy conv + anchored \d+ idx
        # keeps the split correct even if conv ids ever contain '/'
        m = pc.extract_regex(e["subj"], r"^inst:turn/(?P<chain>.+)/(?P<idx>\d+)$")
        return pa.table(
            {
                "chain": pc.struct_field(m, "chain"),
                "idx": pc.cast(pc.struct_field(m, "idx"), pa.int64()),
                "src": e["subj"],
                "dst": e["obj"],
            }
        )

    edges = triples.map_batches(edges_fn, batch_format="pyarrow")

    def closure(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g["idx"])
        src = g["src"].take(order).to_numpy(zero_copy_only=False)
        dst = g["dst"].take(order).to_numpy(zero_copy_only=False)
        n = len(src)
        # link[i]: edge i's head IS edge i+1's tail (verified, not assumed)
        link = dst[:-1] == src[1:] if n > 1 else np.zeros(0, bool)
        srcs, dsts, dists = [src], [dst], [np.full(n, 1, np.int64)]
        valid = np.ones(max(n - 1, 0), bool)
        for h in range(2, max_hops + 1):
            w = n - (h - 1)
            if w <= 0:
                break
            valid = valid[:w] & link[h - 2 : h - 2 + w]
            srcs.append(src[:w][valid])
            dsts.append(dst[h - 1 :][valid])
            dists.append(np.full(int(valid.sum()), h, np.int64))
        return pa.table(
            {
                "src": pa.array(np.concatenate(srcs), pa.string()),
                "dst": pa.array(np.concatenate(dsts), pa.string()),
                "dist": pa.array(np.concatenate(dists), pa.int64()),
            }
        )

    return edges.groupby("chain").map_groups(closure, batch_format="pyarrow")


def kg_shape_violations(sf_dir: str) -> ray.data.Dataset:
    """SHACL-style cardinality validation report over the constructed
    graph (shapes: schema.SHAPES, targeting ont:Turn instances).  Emits
    one row per violation: (focus, pred, n, allowed, kind) with
    kind='max' (observed n > max_count) or kind='min' (required
    predicate absent, n=0).  Both kinds fire on real corpora: 'min'
    rows are turns whose role was out-of-vocab (L6 routes the triple to
    the error side-output, leaving the typed Turn role-less); 'max'
    rows are multi-number turns.

    Scale shape: max checks are ONE groupby((subj, pred)) count over the
    constrained-predicate slice with a vectorized closed-vocab limit
    lookup (index_in + take — no join, the shape table is schema-sized);
    min checks are ONE distributed anti-join of typed targets against
    the required predicate's subjects."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from ifctordf_ray import schema as S
    from ifctordf_ray.functions.kernels import safe_join

    triples = kg_from_events(sf_dir, mode="fast")
    max_preds = [p for p, _mn, mx in S.SHAPES if mx is not None]
    max_vals = [mx for _p, _mn, mx in S.SHAPES if mx is not None]
    min_preds = [p for p, mn, _mx in S.SHAPES if mn >= 1]

    def constrained(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["pred"], pa.array(max_preds))
        e = t.filter(m)
        return pa.table({"focus": e["subj"], "pred": e["pred"]})

    counts = (
        triples.map_batches(constrained, batch_format="pyarrow")
        .groupby(["focus", "pred"])
        .aggregate(Count(alias_name="n"))
    )

    def over_max(t: pa.Table) -> pa.Table:
        if "n" not in t.schema.names:  # zero-block upstream
            return pa.table(
                {
                    "focus": pa.array([], pa.string()),
                    "pred": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "allowed": pa.array([], pa.int64()),
                    "kind": pa.array([], pa.string()),
                }
            )
        allowed = pc.take(
            pa.array(max_vals, pa.int64()),
            pc.index_in(t["pred"], pa.array(max_preds)),
        )
        t = t.append_column("allowed", allowed)
        v = t.filter(pc.greater(pc.cast(t["n"], pa.int64()), t["allowed"]))
        return pa.table(
            {
                "focus": v["focus"],
                "pred": v["pred"],
                "n": pc.cast(v["n"], pa.int64()),
                "allowed": v["allowed"],
                "kind": pa.nulls(v.num_rows, pa.string()).fill_null("max"),
            }
        )

    viol = counts.map_batches(over_max, batch_format="pyarrow")

    one_schema = pa.schema([("focus", pa.string())])
    for req in min_preds:

        def targets(t: pa.Table, _req=req) -> pa.Table:
            ty = t.filter(
                pc.and_(
                    pc.equal(t["pred"], S.RDF_TYPE),
                    pc.equal(t["obj"], S.CLS_TURN),
                )
            )
            return pa.table({"focus": ty["subj"]})

        def havers(t: pa.Table, _req=req) -> pa.Table:
            h = t.filter(pc.equal(t["pred"], _req))
            return pa.table({"focus": h["subj"]})

        missing = safe_join(
            triples.map_batches(targets, batch_format="pyarrow"),
            one_schema,
            triples.map_batches(havers, batch_format="pyarrow"),
            one_schema,
            join_type="left_anti",
            on=("focus",),
            right_on=("focus",),
        )

        def as_min_rows(t: pa.Table, _req=req) -> pa.Table:
            n = t.num_rows
            return pa.table(
                {
                    "focus": t["focus"],
                    "pred": pa.nulls(n, pa.string()).fill_null(_req),
                    "n": pa.nulls(n, pa.int64()).fill_null(0),
                    "allowed": pa.nulls(n, pa.int64()).fill_null(1),
                    "kind": pa.nulls(n, pa.string()).fill_null("min"),
                }
            )

        viol = viol.union(missing.map_batches(as_min_rows, batch_format="pyarrow"))
    return viol


def kg_describe(sf_dir: str) -> ray.data.Dataset:
    """DESCRIBE-style per-subject serialization: every subject with its
    full (pred, obj) adjacency rendered as ONE deterministic string —
    items sorted bytewise, literals quoted — the grouped-graph analog of
    the reference's per-entity RDF block emission (parseModelToGraph
    renders each instance's statements together).

    Scale shape: groupby(subj) with a custom AggregateFn whose
    accumulator is the subject's item list (degree-bounded: turns have
    closed-vocab + per-turn-mention degree; conversations are bounded by
    conversation length — same bound the assembly groupby already
    relies on); finalize joins the sorted items.  Item rendering is
    vectorized per block before accumulation."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import AggregateFn

    triples = kg_from_events(sf_dir, mode="fast")

    def items_fn(t: pa.Table) -> pa.Table:
        quoted = pc.binary_join_element_wise(
            pa.nulls(t.num_rows, pa.string()).fill_null('"'),
            t["obj"],
            pa.nulls(t.num_rows, pa.string()).fill_null('"'),
            "",
        )
        rendered = pc.if_else(pc.equal(t["obj_kind"], "uri"), t["obj"], quoted)
        item = pc.binary_join_element_wise(t["pred"], rendered, " ")
        return pa.table({"subj": t["subj"], "item": item})

    # accumulator = list of Arrow arrays (one append per block touched,
    # O(1) merge by list concat — never per-row Python); only finalize
    # crosses to Python, on the degree-bounded per-subject item set
    def acc_block(acc: list, block) -> list:
        return acc + [block.column("item").combine_chunks()]

    def fin(chunks: list) -> str:
        items = pa.concat_arrays(chunks) if chunks else pa.array([], pa.string())
        return "; ".join(sorted(items.to_pylist()))

    agg = AggregateFn(
        init=lambda k: [],
        merge=lambda a, b: a + b,
        accumulate_block=acc_block,
        finalize=fin,
        name="description",
    )
    return (
        triples.map_batches(items_fn, batch_format="pyarrow")
        .groupby("subj")
        .aggregate(agg)
    )


def list_members(triples: ray.data.Dataset) -> ray.data.Dataset:
    """Ordered list recovery — the INVERSE of the construction-side
    hasContents/hasNext chain emission (T7–T10, RDFWriter.java:136-137's
    list graphs): for every structured list in the graph, its members in
    position order as (head, pos, member, member_kind, linked), where
    `linked` verifies the chain from the data (the pos-1 node carries a
    hasNext edge; pos 0 is trivially linked) rather than trusting the
    IRI-embedded position.

    Scale shape: one vectorized pass splits the hasContents / hasNext
    predicate slices into tagged (chain, pos) rows; ONE
    groupby(chain).map_groups computes the linked mask in-group with
    np.isin — group size = list length (input-bounded, same bound the
    construction side relies on); no joins, no driver state.  A 0-row
    schema anchor is unioned in so a list-free corpus still yields the
    contract schema (empty groupby output drops it otherwise)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ifctordf_ray import schema as S

    RE = r"^inst:listn/(?P<chain>[0-9a-f]+)/(?P<pos>\d+)$"

    def tagged(t: pa.Table) -> pa.Table:
        def const(n: int, v: str) -> pa.Array:
            return pa.nulls(n, pa.string()).fill_null(v)

        c = t.filter(pc.equal(t["pred"], S.P_HAS_CONTENTS))
        mc = pc.extract_regex(c["subj"], RE)
        nx = t.filter(pc.equal(t["pred"], S.P_HAS_NEXT))
        mn = pc.extract_regex(nx["subj"], RE)
        return pa.concat_tables(
            [
                pa.table(
                    {
                        "chain": pc.struct_field(mc, "chain"),
                        "pos": pc.cast(pc.struct_field(mc, "pos"), pa.int64()),
                        "member": c["obj"],
                        "member_kind": c["obj_kind"],
                        "tag": const(c.num_rows, "c"),
                    }
                ),
                pa.table(
                    {
                        "chain": pc.struct_field(mn, "chain"),
                        "pos": pc.cast(pc.struct_field(mn, "pos"), pa.int64()),
                        "member": pa.nulls(nx.num_rows, pa.string()),
                        "member_kind": pa.nulls(nx.num_rows, pa.string()),
                        "tag": const(nx.num_rows, "n"),
                    }
                ),
            ]
        ).combine_chunks()

    def unfold(g: pa.Table) -> pa.Table:
        chain = g["chain"][0].as_py()
        is_c = pc.equal(g["tag"], "c")
        c = g.filter(is_c)
        npos = g.filter(pc.invert(is_c))["pos"].to_numpy(zero_copy_only=False)
        order = pc.sort_indices(c["pos"])
        c = c.take(order)
        cpos = c["pos"].to_numpy(zero_copy_only=False)
        linked = (cpos == 0) | np.isin(cpos - 1, npos)
        n = c.num_rows
        return pa.table(
            {
                "head": pa.nulls(n, pa.string()).fill_null(
                    f"inst:listn/{chain}/0"
                ),
                "pos": c["pos"],
                "member": c["member"],
                "member_kind": c["member_kind"],
                "linked": pa.array(linked, pa.bool_()),
            }
        )

    out_schema = pa.schema(
        [
            ("head", pa.string()),
            ("pos", pa.int64()),
            ("member", pa.string()),
            ("member_kind", pa.string()),
            ("linked", pa.bool_()),
        ]
    )
    unfolded = (
        triples.map_batches(tagged, batch_format="pyarrow")
        .groupby("chain")
        .map_groups(unfold, batch_format="pyarrow")
    )
    anchor = ray.data.from_arrow(out_schema.empty_table())
    return anchor.union(unfolded)


def kg_list_members(sf_dir: str) -> ray.data.Dataset:
    """Driver-checkable list_members pipeline: the sf corpora carry no
    structured-list text patterns, so this derives them deterministically
    (sources.transcripts.inject_list_mentions — a pure function of the
    input table, mirrored verbatim in the SQL oracle), runs the flagship
    extraction, and recovers every chain's ordered members (the T7-T10
    inverse, RDFWriter.java:707-980)."""
    from ifctordf_ray.sources.transcripts import (
        inject_list_mentions,
        transcripts_from_events,
    )

    tr = inject_list_mentions(
        transcripts_from_events(sf_dir, drop_dangling=True)
    )
    return list_members(extract.extract_fast(tr, prevalidated=True))


def kg_predicate_cooccurrence(sf_dir: str) -> ray.data.Dataset:
    """Subject-profile predicate co-occurrence: for every unordered
    predicate pair (pred_a < pred_b bytewise), the number of subjects
    carrying BOTH — the schema-shape profile a KG publisher reports (and
    the input to characteristic-set cardinality estimation).

    Scale shape: the predicate vocabulary is CLOSED (schema.PRED_TABLE,
    |P| = 21 < 63), so each predicate maps to one bit of an int64 and a
    subject's whole profile is ONE mask: a vectorized shift_left map,
    groupby(subj) with a bitwise-OR AggregateFn (per-block pre-combined
    via np.bitwise_or.reduce), then groupby(mask).count() — whose
    cardinality is bounded by the schema's realizable profiles, NOT the
    data.  Only that tiny mask histogram reaches the driver, where the
    mask→pairs expansion is pure integer arithmetic.  Compare: the naive
    distinct(subj,pred) self-join shuffles the corpus twice."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import AggregateFn, Count

    from ifctordf_ray import schema as S

    vocab = sorted(S.PRED_NAMES)  # bit i = vocab[i]; lex order so bit
    # order IS the pred_a < pred_b output order
    assert len(vocab) < 63
    vocab_arr = pa.array(vocab, pa.string())

    triples = kg_from_events(sf_dir, mode="fast")

    def bits(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["pred"], vocab_arr)  # closed vocab: never null
        return pa.table(
            {
                "subj": t["subj"],
                "bit": pc.shift_left(
                    pa.scalar(1, pa.int64()), pc.cast(idx, pa.int64())
                ),
            }
        )

    def acc_block(acc: int, block) -> int:
        vals = block.column("bit").to_numpy(zero_copy_only=False)
        if not len(vals):
            return acc
        return acc | int(np.bitwise_or.reduce(vals))

    mask_agg = AggregateFn(
        init=lambda k: 0,
        merge=lambda a, b: a | b,
        accumulate_block=acc_block,
        finalize=lambda m: m,
        name="mask",
    )
    masks = (
        triples.map_batches(bits, batch_format="pyarrow")
        .groupby("subj")
        .aggregate(mask_agg)
        .select_columns(["mask"])
        .groupby("mask")
        .aggregate(Count(alias_name="n"))
    )
    # schema-bounded (distinct realizable profiles), never corpus-sized
    hist = masks.take_all()
    acc: dict[tuple[str, str], int] = {}
    for row in hist:
        m, cnt = int(row["mask"]), int(row["n"])
        preds = [vocab[i] for i in range(len(vocab)) if m >> i & 1]
        for i in range(len(preds)):
            for j in range(i + 1, len(preds)):
                key = (preds[i], preds[j])
                acc[key] = acc.get(key, 0) + cnt
    out = pa.table(
        {
            "pred_a": pa.array([k[0] for k in acc], pa.string()),
            "pred_b": pa.array([k[1] for k in acc], pa.string()),
            "n_subjects": pa.array(list(acc.values()), pa.int64()),
        }
    )
    return ray.data.from_arrow(out)


def kg_named_graphs(sf_dir: str) -> ray.data.Dataset:
    """Named-graph partitioning stats: every triple is assigned to its
    provenance graph — the conversation whose subject scope emitted it
    (inst:conv/{c} or inst:turn/{c}/{i} → graph c) or the 'shared'
    default graph for globally-canonical nodes (text/number/decimal/hex
    wrappers, list nodes, ontology individuals — content-derived IRIs
    shared across conversations by design, schema.py A1 note).  Output:
    (graph, n_triples) — the quad-store partition manifest.

    Scale shape: one vectorized regex map + ONE groupby(graph) count
    (Ray pre-combines per block); output is conversation-count-sized."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    triples = kg_from_events(sf_dir, mode="fast")

    def graph_of(t: pa.Table) -> pa.Table:
        conv = pc.extract_regex(t["subj"], r"^inst:conv/(?P<g>.+)$")
        turn = pc.extract_regex(t["subj"], r"^inst:turn/(?P<g>.+)/\d+$")
        g = pc.coalesce(
            pc.struct_field(conv, "g"),
            pc.struct_field(turn, "g"),
            pa.scalar("shared", pa.string()),
        )
        return pa.table({"graph": g})

    return (
        triples.map_batches(graph_of, batch_format="pyarrow")
        .groupby("graph")
        .aggregate(Count(alias_name="n_triples"))
    )


def materialize(
    triples: ray.data.Dataset, out_dir: str, parquet: bool = False,
    turtle: bool = False, compression: str | None = None,
) -> list[dict]:
    """Final sorted-shuffle materialization; returns manifest rows.
    kg_triples output is already subject-sorted (distinct() sorts on
    (subj,pred,obj,obj_kind) as its shuffle) — no second sort.

    A manifest.json is written beside the parts: prefix declarations (the
    S7 header/prefix-emission analog, RDFWriter.java:111-122) plus
    per-file lineage (path, triple count, subject range)."""
    import json
    import os

    manifest = sinks.write_ntriples(
        triples, f"{out_dir}/nt", sort=False, compression=compression
    )
    if parquet:
        sinks.write_graph_parquet(triples, f"{out_dir}/parquet")
    if turtle:
        sinks.write_turtle(triples, f"{out_dir}/ttl", sort=False)
    from ifctordf_ray import schema as S

    os.makedirs(out_dir, exist_ok=True)
    tmp = f"{out_dir}/manifest.json.tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "prefixes": S.PREFIXES,
                "n_triples": sum(m["n_triples"] for m in manifest),
                "files": manifest,
            },
            f,
            indent=1,
            default=str,
        )
    os.replace(tmp, f"{out_dir}/manifest.json")
    return manifest


def _fresh_parts_dir(path: str) -> None:
    """Clear a sink-owned parts directory before writing.  The Parquet
    sinks build their manifest and returned count by globbing the parts
    dir after the write; rerunning into a dir left by an OLDER run (with
    possibly different input) must not fold stale parts into the manifest
    (ADVICE r4).  Clearing happens once on the driver before the pipeline
    runs, so in-run task retries still hit the content-addressed skip
    path — only prior-run leftovers are removed."""
    import os
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)


def materialize_parquet(
    triples: ray.data.Dataset, out_dir: str, compression: str = "zstd"
) -> int:
    """Parquet-only flagship materialization (the north star's sanctioned
    graph output format alongside .nt): bucketed zstd graph partitions +
    a lineage manifest.  Returns the triple count, taken from the written
    file FOOTERS — metadata-only, no second pass over the data.

    Exists as the scale-path sink: the .nt text sink pushes ~120 bytes
    per triple through the one shared disk of a single box; columnar
    dictionary + zstd encoding turns that into CPU work that parallelizes
    with workers (the measured non-scaling residue, BASELINE.md)."""
    import glob
    import json
    import os

    import pyarrow.parquet as _pq

    # RANGE-partitioned layout, not hive buckets: the triple stream is
    # already subject-sorted (the distinct shuffle), so one file per
    # block IS a disjoint subject range — the same prunability the .nt
    # manifest provides, without each task fanning every block out into
    # 16 hive dirs (a small-file explosion at many blocks).  The
    # hive-bucketed layout remains available via sinks.write_graph_parquet
    # for point-lookup workloads (subject_triples).
    _fresh_parts_dir(f"{out_dir}/parquet")
    triples.write_parquet(f"{out_dir}/parquet", compression=compression)
    per_file = []
    for f in sorted(glob.glob(f"{out_dir}/parquet/*.parquet")):
        md = _pq.ParquetFile(f).metadata
        subj_idx = md.schema.to_arrow_schema().get_field_index("subj")
        stats = [
            md.row_group(g).column(subj_idx).statistics
            for g in range(md.num_row_groups)
        ]
        lo = min((s.min for s in stats if s is not None), default=None)
        hi = max((s.max for s in stats if s is not None), default=None)
        per_file.append(
            {"path": f, "n_triples": md.num_rows, "subj_min": lo, "subj_max": hi}
        )
    from ifctordf_ray import schema as S

    os.makedirs(out_dir, exist_ok=True)
    tmp = f"{out_dir}/manifest.json.tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "prefixes": S.PREFIXES,
                "format": f"parquet/{compression}",
                "n_triples": sum(m["n_triples"] for m in per_file),
                "files": per_file,
            },
            f,
            indent=1,
            default=str,
        )
    os.replace(tmp, f"{out_dir}/manifest.json")
    return sum(m["n_triples"] for m in per_file)


def materialize_parquet_fastset(
    sf_dir: str, out_dir: str, replicate: int = 1, compression: str = "zstd"
) -> int:
    """EXCHANGE-LIGHT Parquet flagship: the same triple SET as
    materialize_parquet, with the global sorted-distinct exchange applied
    only to the slice that can actually hold cross-batch duplicates.

    Why this is exact: conversation-scoped triples (inst:conv/…,
    inst:turn/… subjects) are each emitted by exactly ONE transcript row
    and pre-deduplicated per batch, so they are globally distinct by
    construction for the prevalidated dense fast path (the full argument
    + the property test live at extract.SHARED_SUBJ_WIRE_CODES).  Only
    shared content-derived wrapper subjects (text/num/dec/hex/listn —
    ~10% of rows) can repeat across batches, and exactly that slice goes
    through distinct().

    Scale shape: ONE streaming pass — extract batches flow into
    write_fastset_part, which writes the conversation slice directly as
    content-addressed locally-sorted zstd parts (CPU-bound, scales per
    node) and passes ONLY the shared slice to the sorted exchange
    (measured 99.7% of exchange rows were already unique: the full-graph
    exchange existed for the .nt sort contract, which this layout does
    not promise).  The all-to-all volume drops ~10x; nothing is
    materialized mid-pipeline and there is no second pass over the data
    (manifest counts come from file footers).

    Trade-off vs materialize_parquet (documented, intentional): no
    global subject order and no disjoint-range pruning — the sorted
    materializations remain the contract for ordered/prunable output;
    file layout depends on batching (the triple SET is identical and
    verified so by tests/test_fastset.py)."""
    import glob
    import json
    import os

    import pyarrow.parquet as _pq

    from ifctordf_ray.sources.transcripts import transcripts_from_events

    tr = transcripts_from_events(sf_dir, replicate=replicate, drop_dangling=True)
    # deterministic_batches: the content-addressed part-file names below
    # hash batch contents, so rerun-idempotency needs run-to-run stable
    # batch boundaries (see extract_compact's docstring).
    compact = extract.extract_compact(
        tr, prevalidated=True, deterministic_batches=True
    )
    pq_dir = f"{out_dir}/parquet"
    _fresh_parts_dir(pq_dir)
    shared = compact.map_batches(
        sinks.write_fastset_part,
        fn_kwargs={"out_dir": pq_dir, "compression": compression, "split": True},
        batch_format="pyarrow",
        batch_size=None,
    )
    shared_triples = extract.decode_triples(
        extract.distinct(shared, extract.COMPACT_COLS, int_prefix_key=True)
    )
    shared_triples.map_batches(
        sinks.write_fastset_part,
        fn_kwargs={"out_dir": pq_dir, "compression": compression, "split": False},
        batch_format="pyarrow",
        batch_size=None,
    ).count()

    per_file = []
    for f in sorted(glob.glob(f"{pq_dir}/part-*.parquet")):
        md = _pq.ParquetFile(f).metadata
        per_file.append({"path": f, "n_triples": md.num_rows})
    from ifctordf_ray import schema as S

    os.makedirs(out_dir, exist_ok=True)
    tmp = f"{out_dir}/manifest.json.tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "prefixes": S.PREFIXES,
                "format": f"parquet-fastset/{compression}",
                "n_triples": sum(m["n_triples"] for m in per_file),
                "files": per_file,
            },
            f,
            indent=1,
            default=str,
        )
    os.replace(tmp, f"{out_dir}/manifest.json")
    return sum(m["n_triples"] for m in per_file)


def run(
    source: str,
    out_dir: str,
    mode: str = "fast",
    from_events: bool = True,
    parquet: bool = False,
    turtle: bool = False,
    dedup_turns: bool = False,
) -> dict:
    """One-shot (non-partitioned) flagship run.  Returns metrics."""
    t0 = time.time()
    if from_events:
        tr = None
        if dedup_turns:
            from ifctordf_ray.sources.transcripts import transcripts_from_events

            triples = kg_triples(
                transcripts_from_events(source), mode=mode, dedup_turns=True
            )
        else:
            triples = kg_from_events(source, mode=mode)
    else:
        # fast mode has two consumers (resolve pass + extraction); each
        # branch RE-READS the pruned parquet rather than materializing the
        # corpus in the object store — at 100 TB the store cannot hold the
        # input, while a second pruned read is cheap and streaming.
        tr = read_transcripts(source)
        triples = kg_triples(tr, mode=mode, dedup_turns=dedup_turns)
    manifest = materialize(triples, out_dir, parquet=parquet, turtle=turtle)
    n = sum(m["n_triples"] for m in manifest)
    return {
        "n_triples": n,
        "n_files": len(manifest),
        "wall_sec": time.time() - t0,
        "triples_per_sec": n / max(time.time() - t0, 1e-9),
    }


def run_resumable(
    input_files: list[str],
    out_dir: str,
    num_partitions: int = 8,
    mode: str = "fast",
) -> dict[int, ckpt.PartitionEntry]:
    """Partitioned, resumable run over a transcript Parquet file set.

    Each partition (a deterministic group of input files) is processed by
    its own sub-pipeline into out_dir/part=<id>/ with an atomic _SUCCESS
    marker; the manifest carries lineage + metrics.  Rerunning skips
    partitions whose _SUCCESS exists.  Correct because conversations never
    span input files in this layout (the writer partitions transcripts by
    conv hash — see tests/test_resume.py) — stated partitioning assumption.
    """
    import os
    import shutil

    groups = ckpt.plan_partitions(input_files, num_partitions)
    entries = ckpt.load_manifest(out_dir)
    for pid, files in enumerate(groups):
        if pid in entries and entries[pid].status == "done" and ckpt.partition_done(out_dir, pid):
            continue
        t0 = time.time()
        part_dir = f"{out_dir}/part={pid}"
        # An unfinished partition may hold part files from an interrupted
        # attempt; sort block splits are not reproducible across runs, so
        # stale content-addressed files would survive alongside the new
        # ones and double-count.  Clear the directory before reprocessing.
        if os.path.exists(part_dir):
            shutil.rmtree(part_dir)
        tr = read_transcripts(files)
        n_rows = tr.count()
        triples = kg_triples(tr, mode=mode)
        manifest = sinks.write_ntriples(triples, f"{part_dir}/nt", sort=True)
        errors = extract.extract_errors(tr).count()
        entries[pid] = ckpt.PartitionEntry(
            partition_id=pid,
            input_files=files,
            status="done",
            n_input_rows=n_rows,
            n_triples=sum(m["n_triples"] for m in manifest),
            n_errors=errors,
            wall_sec=time.time() - t0,
            output_dir=part_dir,
            finished_at=time.time(),
            # exact output-file lineage: consumers should read only these
            extra={"files": sorted(m["path"] for m in manifest)},
        )
        # persist the manifest entry BEFORE the _SUCCESS marker: a crash
        # between the two leaves the partition "not done" (re-run), never
        # "done with no lineage"
        ckpt.save_manifest(out_dir, entries)
        ckpt.mark_done(out_dir, pid)
    return entries


def kg_side_outputs(transcripts: ray.data.Dataset) -> dict[str, ray.data.Dataset]:
    return {
        "errors": extract.extract_errors(transcripts),
        "canonical_mentions": canonicalize_mentions(transcripts),
    }
