r"""Graph-query composition over the engine's OWN triple output: a
2-hop property path mentionsTurn/nextTurn evaluated as a distributed
self-join of the triple dataset — the SPARQL-property-path shape
(`?s ont:mentionsTurn/ont:nextTurn ?t`) that a KG consumer runs against
the materialized graph.

Scale shape: both sides are predicate-filtered projections of the triple
stream (narrow maps over the same lineage; Ray recomputes each branch as
a stream — nothing is materialized), joined with the hash-shuffle join
on the shared turn IRI.  The join key is a turn IRI, whose fan-in is
bounded by mentions-per-turn (skew-capped upstream by the extractor).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ifctordf_ray import schema as S


def mention_next_hop(sf_dir: str, num_partitions: int | None = None) -> ray.data.Dataset:
    """(subj, via_turn, next_turn): turns whose text mentions a turn,
    composed with that turn's successor — `mentionsTurn/nextTurn`."""
    import pyarrow.compute as pc

    from ifctordf_ray.pipelines import kg

    triples = kg.kg_from_events(sf_dir, mode="fast")

    def side(pred: str, out_subj: str, out_obj: str):
        def f(t: pa.Table) -> pa.Table:
            m = t.filter(pc.equal(t["pred"], pred))
            return pa.table({out_subj: m["subj"], out_obj: m["obj"]})

        return f

    mentions = triples.map_batches(
        side(S.P_MENTIONS_TURN, "subj", "via_turn"), batch_format="pyarrow"
    )
    nexts = triples.map_batches(
        side(S.P_NEXT_TURN, "nt_subj", "next_turn"), batch_format="pyarrow"
    )
    # safe_join: both sides are predicate FILTERS — on empty (or
    # mentions-free) input they emit zero schema-ful blocks
    from ifctordf_ray.functions.kernels import safe_join

    joined = safe_join(
        mentions,
        pa.schema([("subj", pa.string()), ("via_turn", pa.string())]),
        nexts,
        pa.schema([("nt_subj", pa.string()), ("next_turn", pa.string())]),
        join_type="inner",
        on=("via_turn",),
        right_on=("nt_subj",),
        num_partitions=num_partitions,
    )
    return joined.map_batches(
        lambda t: t.select(["subj", "via_turn", "next_turn"]),
        batch_format="pyarrow",
    )


def mention_next_hop_sql() -> str:
    from ifctordf_ray.sql_oracle import kg_triples_sql

    return f"""WITH t AS ({kg_triples_sql()})
SELECT m.subj, m.obj AS via_turn, n.obj AS next_turn
FROM t m JOIN t n ON m.obj = n.subj
WHERE m.pred = '{S.P_MENTIONS_TURN}' AND n.pred = '{S.P_NEXT_TURN}'
"""


# ---------------------------------------------------------------------------
# Mention co-occurrence: unordered pairs of distinct numeric mentions in
# the same turn, counted corpus-wide — the turn-bounded self-join that
# feeds entity-relatedness scoring.  Pair expansion happens INSIDE the
# map (quadratic only in per-turn mentions, capped), so the shuffle moves
# per-batch combiner partials, never per-pair raw rows.
# ---------------------------------------------------------------------------
COOC_CAP = 32  # per-turn distinct-mention cap (skew guard, lexical order)


class _CoocPartials:
    def __init__(self, cap: int):
        import re

        from ifctordf_ray import schema as S

        self.num_re = re.compile(S.NUM_RE)
        self.cap = cap

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter
        from itertools import combinations

        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            ms = sorted(set(self.num_re.findall(t or "")))[: self.cap]
            c.update(combinations(ms, 2))
        return pa.table(
            {
                "m1": pa.array([k[0] for k in c], pa.string()),
                "m2": pa.array([k[1] for k in c], pa.string()),
                "n_turns": pa.array(list(c.values()), pa.int64()),
            }
        )


def cooccurring_mentions(sf_dir: str, cap: int = COOC_CAP) -> ray.data.Dataset:
    """(m1, m2, n_turns): number pairs co-mentioned in a turn (m1 < m2
    lexically), with per-turn mentions deduplicated and capped at ``cap``
    in lexical order (replicated in the SQL oracle via row_number)."""
    from ray.data.aggregate import Sum as _Sum

    from ifctordf_ray.sources.transcripts import transcripts_from_events

    tr = transcripts_from_events(sf_dir)
    return (
        tr.map_batches(
            _CoocPartials,
            fn_constructor_kwargs={"cap": cap},
            batch_format="pyarrow",
            concurrency=(1, 4),
            max_restarts=0,
        )
        .groupby(["m1", "m2"])
        .aggregate(_Sum("n_turns", alias_name="n_turns"))
    )


def cooccurring_mentions_sql(cap: int = COOC_CAP) -> str:
    from ifctordf_ray.sql_oracle import transcripts_cte

    return f"""WITH {transcripts_cte()},
m AS (
    SELECT DISTINCT conv_id, turn_idx, u.m
    FROM transcripts, UNNEST(regexp_extract_all(coalesce(text, ''), '{S.NUM_RE}')) AS u(m)
),
k AS (
    SELECT * FROM (
        SELECT conv_id, turn_idx, m,
               row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY m) AS rn
        FROM m
    ) WHERE rn <= {cap}
)
SELECT a.m AS m1, b.m AS m2, CAST(count(*) AS BIGINT) AS n_turns
FROM k a JOIN k b
  ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx AND a.m < b.m
GROUP BY a.m, b.m"""


# ---------------------------------------------------------------------------
# Triangle enumeration over the mention co-occurrence graph — the
# graph-analytics join pattern (two chained distributed joins over the
# a<b-oriented edge list; orientation means each triangle is emitted
# exactly once, and the per-turn mention cap bounds vertex degree, the
# classic triangle-skew guard).
# ---------------------------------------------------------------------------
def mention_triangles(sf_dir: str, num_partitions: int | None = None) -> ray.data.Dataset:
    """(m_a, m_b, m_c), a < b < c lexically: closed mention triangles."""
    import pyarrow.compute as pc

    from ifctordf_ray.functions.kernels import join_ready
    from ifctordf_ray.tuning import join_kwargs

    # Materialize ONCE: the edge list is aggregate-sized (bounded by the
    # per-turn mention cap), and the three join branches below would each
    # re-execute the whole extraction lineage otherwise (Ray Data plans
    # are trees — no common-subexpression reuse across branches).
    edges = cooccurring_mentions(sf_dir).materialize()

    def project(n1: str, n2: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({n1: t["m1"], n2: t["m2"]})

        return f

    e_schema = lambda n1, n2: pa.schema([(n1, pa.string()), (n2, pa.string())])
    ab = join_ready(
        edges.map_batches(project("a", "b"), batch_format="pyarrow"),
        e_schema("a", "b"),
        sentinel_row={"a": "\x00x", "b": "\x00x"},
    )
    bc = join_ready(
        edges.map_batches(project("b", "c"), batch_format="pyarrow"),
        e_schema("b", "c"),
        sentinel_row={"b": "\x00y", "c": "\x00y"},
    )
    ac = join_ready(
        edges.map_batches(project("a2", "c2"), batch_format="pyarrow"),
        e_schema("a2", "c2"),
        sentinel_row={"a2": "\x00z", "c2": "\x00z"},
    )

    wedges = ab.join(
        bc, join_type="inner", on=("b",), right_on=("b",), **join_kwargs(num_partitions)
    )
    wedges = join_ready(
        wedges,
        pa.schema([("a", pa.string()), ("b", pa.string()), ("c", pa.string())]),
        sentinel_row={"a": "\x00w", "b": "\x00w", "c": "\x00w"},
    )
    tri = wedges.join(
        ac,
        join_type="inner",
        on=("a", "c"),
        right_on=("a2", "c2"),
        **join_kwargs(num_partitions),
    )
    return tri.map_batches(
        lambda t: pa.table({"m_a": t["a"], "m_b": t["b"], "m_c": t["c"]}),
        batch_format="pyarrow",
    )


def mention_triangles_sql() -> str:
    return f"""WITH e AS ({cooccurring_mentions_sql()})
SELECT x.m1 AS m_a, x.m2 AS m_b, y.m2 AS m_c
FROM e x
JOIN e y ON x.m2 = y.m1
JOIN e z ON z.m1 = x.m1 AND z.m2 = y.m2"""


# ---------------------------------------------------------------------------
# One damped PageRank iteration over the undirected, edge-weighted mention
# co-occurrence graph — the iterative-graph-algorithm shape (message
# passing = join contributions to neighbors, re-aggregate).  Per-edge
# contributions are quantized to integers (floor at 1e-12) BEFORE the
# distributed sum, so the result is order-independent and integer-exact
# across engines — the same determinism trick as emb_kmeans_assign /
# emb_label_centroids.  Scale shape: two aggregate-sized joins over the
# edge list (never the corpus), degree skew bounded by the upstream
# per-turn mention cap.
# ---------------------------------------------------------------------------
PR_DAMP_NUM = 0.85  # damping; 1-d mass = 0.15 -> 150_000_000_000 quantized
PR_SCALE = 1e12
PR_BASE_Q = 150_000_000_000  # floor(0.15 * 1e12), exact


def mention_pagerank_step(sf_dir: str, num_partitions: int | None = None) -> ray.data.Dataset:
    """(m, pr_q): rank after ONE damped iteration from a uniform start
    (pr0 = 1 per node), quantized at 1e-12: pr_q = 0.15*1e12 +
    sum_over_in_edges floor(0.85 * w / deg(src) * 1e12)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum as _Sum

    from ifctordf_ray.functions.kernels import join_ready
    from ifctordf_ray.tuning import join_kwargs

    # aggregate-sized; consumed by two branches (degrees + contributions)
    edges = cooccurring_mentions(sf_dir).materialize()

    def undirect(t: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                pa.table({"src": t["m1"], "dst": t["m2"], "w": t["n_turns"]}),
                pa.table({"src": t["m2"], "dst": t["m1"], "w": t["n_turns"]}),
            ]
        )

    und = edges.map_batches(undirect, batch_format="pyarrow")
    deg = (
        und.groupby("src")
        .aggregate(_Sum("w", alias_name="deg"))
        .map_batches(
            lambda t: pa.table({"dm": t["src"], "deg": t["deg"]}),
            batch_format="pyarrow",
        )
    )
    und = join_ready(
        und,
        pa.schema([("src", pa.string()), ("dst", pa.string()), ("w", pa.int64())]),
        sentinel_row={"src": "\x00p", "dst": "\x00p", "w": 0},
    )
    deg = join_ready(
        deg,
        pa.schema([("dm", pa.string()), ("deg", pa.int64())]),
        sentinel_row={"dm": "\x00q", "deg": 1},
    )
    joined = und.join(
        deg, join_type="inner", on=("src",), right_on=("dm",), **join_kwargs(num_partitions)
    )

    def contrib(t: pa.Table) -> pa.Table:
        # expression-tree parity with the SQL arm:
        # floor(((0.85 * w) / deg) * 1e12), all IEEE double, left-assoc
        x = pc.multiply(pa.scalar(PR_DAMP_NUM), pc.cast(t["w"], pa.float64()))
        x = pc.divide(x, pc.cast(t["deg"], pa.float64()))
        x = pc.multiply(x, pa.scalar(PR_SCALE))
        return pa.table(
            {"m": t["dst"], "cq": pc.cast(pc.floor(x), pa.int64())}
        )

    ranked = (
        joined.map_batches(contrib, batch_format="pyarrow")
        .groupby("m")
        .aggregate(_Sum("cq", alias_name="cq"))
    )
    return ranked.map_batches(
        lambda t: pa.table(
            {
                "m": t["m"],
                "pr_q": pc.add(pa.scalar(PR_BASE_Q, pa.int64()), t["cq"]),
            }
        ),
        batch_format="pyarrow",
    )


def mention_pagerank_step_sql() -> str:
    return f"""WITH e AS ({cooccurring_mentions_sql()}),
und AS (
    SELECT m1 AS src, m2 AS dst, n_turns AS w FROM e
    UNION ALL
    SELECT m2 AS src, m1 AS dst, n_turns AS w FROM e
),
deg AS (SELECT src, CAST(sum(w) AS BIGINT) AS deg FROM und GROUP BY src),
c AS (
    SELECT u.dst AS m,
           CAST(floor(CAST({PR_DAMP_NUM} AS DOUBLE) * CAST(u.w AS DOUBLE)
                      / CAST(d.deg AS DOUBLE) * 1e12) AS BIGINT) AS cq
    FROM und u JOIN deg d ON u.src = d.src
)
SELECT m, CAST({PR_BASE_Q} + sum(cq) AS BIGINT) AS pr_q FROM c GROUP BY m"""


# ---------------------------------------------------------------------------
# Ordered string aggregation: per-conversation role path
# ---------------------------------------------------------------------------
def conv_role_sequence(sf_dir: str) -> ray.data.Dataset:
    """(conv_id, role_path, n_turns): the '>'-joined role sequence of
    each conversation in turn order — the ordered string_agg operator
    (SQL: string_agg(role, '>' ORDER BY turn_idx)).  Groups are
    conversations (bounded length), so the per-group join is O(group);
    the exchange is one hash groupby on conv_id carrying 3 narrow
    columns."""
    import pyarrow.compute as pc

    from ifctordf_ray.sources.transcripts import transcripts_from_events

    tr = transcripts_from_events(sf_dir)

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "role": t["role"],
            }
        )

    def seq(g: pa.Table) -> pa.Table:
        g = g.sort_by([("turn_idx", "ascending")])
        path = ">".join(g["role"].to_pylist())
        return pa.table(
            {
                "conv_id": pa.array([g["conv_id"][0].as_py()], pa.string()),
                "role_path": pa.array([path], pa.string()),
                "n_turns": pa.array([g.num_rows], pa.int64()),
            }
        )

    return (
        tr.map_batches(proj, batch_format="pyarrow")
        .groupby("conv_id")
        .map_groups(seq, batch_format="pyarrow")
    )


def conv_role_sequence_sql() -> str:
    from ifctordf_ray.sql_oracle import transcripts_cte

    return f"""WITH {transcripts_cte()}
    SELECT conv_id,
           string_agg(role, '>' ORDER BY turn_idx) AS role_path,
           CAST(count(*) AS BIGINT) AS n_turns
    FROM transcripts GROUP BY conv_id
    """


# ---------------------------------------------------------------------------
# Hub extraction: top-degree subjects' full triple sets (graph point query)
# ---------------------------------------------------------------------------
HUB_TOP_K = 10


def top_hub_triples(sf_dir: str, top_k: int = HUB_TOP_K) -> ray.data.Dataset:
    """(subj, pred, obj, obj_kind): every triple of the ``top_k``
    highest-out-degree subjects — the describe-entity point query a KG
    consumer runs after spotting hubs in the degree histogram.  The
    degree ranking is aggregate-sized (one row per subject, sorted and
    limited to k); the k winners broadcast as a membership filter, so
    the triple stream is filtered in place — no join, no second
    shuffle."""
    import pyarrow.compute as pc

    from ifctordf_ray.pipelines import kg
    from ray.data.aggregate import Count

    triples = kg.kg_from_events(sf_dir, mode="fast")
    hubs = (
        kg.kg_from_events(sf_dir, mode="fast")
        .groupby("subj")
        .aggregate(Count(alias_name="degree"))
        .sort(["degree", "subj"], descending=[True, False])
        .limit(top_k)
        .take_all()
    )  # k rows on the driver — broadcast membership set
    hub_arr = pa.array(sorted(r["subj"] for r in hubs), pa.string())

    def keep_hubs(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["subj"], hub_arr))

    return triples.map_batches(keep_hubs, batch_format="pyarrow")


def top_hub_triples_sql(top_k: int = HUB_TOP_K) -> str:
    from ifctordf_ray.sql_oracle import kg_triples_sql

    return f"""
    WITH t AS ({kg_triples_sql()}),
    hubs AS (
        SELECT subj FROM t GROUP BY subj
        ORDER BY count(*) DESC, subj ASC LIMIT {top_k}
    )
    SELECT t.subj, t.pred, t.obj, t.obj_kind
    FROM t JOIN hubs USING (subj)
    """


# ---------------------------------------------------------------------------
# Connected components over the mention co-occurrence graph — entity-
# community discovery on the KG side (which mention groups form one
# topic/conversation cluster).  Reuses the generic distributed min-label
# propagation kernel (stages/dedup.min_label_components); mention
# strings ride as stable 62-bit hashes so the integer kernel applies,
# and any hash collision hits the Ray side and the SQL oracle
# identically (same md5-derived spec).
# ---------------------------------------------------------------------------
MENT_MOD = 1 << 62


def mention_components(
    sf_dir: str, max_iters: int = 25, num_partitions: int | None = None
) -> ray.data.Dataset:
    """(mention, cluster_h, component_size) for every mention that
    co-occurs with at least one other mention; cluster_h = min mention-
    hash in the component (an opaque but deterministic component id).

    Physical shape: hashed edge list (edge-count-sized, materialized —
    reused every propagation round) -> min-label CC -> two bounded hash
    joins (labels x mention map, labels x size counts)."""
    from ray.data.aggregate import Count as _Count

    from ifctordf_ray.functions.kernels import safe_join, stable_hash64
    from ifctordf_ray.stages.dedup import min_label_components

    cooc = cooccurring_mentions(sf_dir)

    def hash_edges(t: pa.Table) -> pa.Table:
        h1 = pa.array(
            [int(stable_hash64(m) % MENT_MOD) for m in t["m1"].to_pylist()],
            pa.int64(),
        )
        h2 = pa.array(
            [int(stable_hash64(m) % MENT_MOD) for m in t["m2"].to_pylist()],
            pa.int64(),
        )
        return pa.table({"m1": t["m1"], "m2": t["m2"], "h1": h1, "h2": h2})

    he = cooc.map_batches(hash_edges, batch_format="pyarrow").materialize()
    # edge-count-sized; reused by the CC rounds and the node derivation

    nodes = (
        he.map_batches(
            lambda t: pa.table(
                {
                    "mention": pa.concat_arrays(
                        [t["m1"].combine_chunks(), t["m2"].combine_chunks()]
                    ),
                    "h": pa.concat_arrays(
                        [t["h1"].combine_chunks(), t["h2"].combine_chunks()]
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby(["mention", "h"])
        .aggregate(_Count(alias_name="_n"))
        .map_batches(lambda t: t.select(["mention", "h"]), batch_format="pyarrow")
        .materialize()  # distinct-mention-sized; consumed twice
    )
    ids = nodes.map_batches(lambda t: t.select(["h"]), batch_format="pyarrow")
    comps = min_label_components(
        he, "h1", "h2", ids, "h",
        max_iters=max_iters, num_partitions=num_partitions,
    ).materialize()  # node-count-sized; consumed twice + splits join plan

    sizes = (
        comps.groupby("cluster_id")
        .aggregate(_Count(alias_name="component_size"))
        .map_batches(
            lambda t: pa.table(
                {
                    "s_cluster": t["cluster_id"],
                    "component_size": pc.cast(t["component_size"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    comp_schema = pa.schema([("h", pa.int64()), ("cluster_id", pa.int64())])
    node_schema = pa.schema([("mention", pa.string()), ("h", pa.int64())])
    labeled = safe_join(
        comps,
        comp_schema,
        nodes,
        node_schema,
        join_type="inner",
        on=("h",),
        right_on=("h",),
        num_partitions=num_partitions,
    ).materialize()  # node-count-sized; splits the chained-join plan
    lab_schema = pa.schema(
        [("h", pa.int64()), ("cluster_id", pa.int64()), ("mention", pa.string())]
    )
    size_schema = pa.schema([("s_cluster", pa.int64()), ("component_size", pa.int64())])
    out = safe_join(
        labeled,
        lab_schema,
        sizes,
        size_schema,
        join_type="inner",
        on=("cluster_id",),
        right_on=("s_cluster",),
        num_partitions=num_partitions,
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "mention": t["mention"],
                "cluster_h": t["cluster_id"],
                "component_size": t["component_size"],
            }
        ),
        batch_format="pyarrow",
    )


def mention_components_sql(cap: int = COOC_CAP) -> str:
    return f"""WITH RECURSIVE cooc AS ({cooccurring_mentions_sql(cap)}),
hm AS (
    SELECT DISTINCT m FROM (
        SELECT m1 AS m FROM cooc UNION ALL SELECT m2 FROM cooc
    )
),
hh AS (
    SELECT m, CAST(md5_number_upper(m) % {MENT_MOD} AS BIGINT) AS h FROM hm
),
e AS (
    SELECT a.h AS ha, b.h AS hb
    FROM cooc JOIN hh a ON a.m = cooc.m1 JOIN hh b ON b.m = cooc.m2
),
esym AS (SELECT ha AS a, hb AS b FROM e UNION ALL SELECT hb, ha FROM e),
reach(n, lbl) AS (
    SELECT a, a FROM esym
    UNION
    SELECT esym.b, r.lbl FROM reach r JOIN esym ON esym.a = r.n
),
comp AS (SELECT n, min(lbl) AS cluster_h FROM reach GROUP BY n),
sizes AS (SELECT cluster_h, count(*) AS component_size FROM comp GROUP BY 1)
SELECT hh.m AS mention, c.cluster_h,
       CAST(s.component_size AS BIGINT) AS component_size
FROM hh
JOIN comp c ON c.n = hh.h
JOIN sizes s ON s.cluster_h = c.cluster_h"""


# ---------------------------------------------------------------------------
# Structural node similarity over the mention co-occurrence graph:
# neighborhood Jaccard of every mention pair that shares at least one
# neighbor (the classic "similar entities link to the same things"
# signal; the wedge-enumeration shape is the same one SimRank/LSH
# link-prediction pipelines use).  Physical shape: symmetric adjacency
# -> groupby(center).map_groups pair emission (one task per center, work
# bounded by C(degree,2) — degree is tamed upstream by the per-turn
# mention cap, same skew argument as mention_triangles) -> one pair
# groupby -> two bounded joins against the mention-vocab-sized degree
# table.  True (uncapped) Jaccard, so common <= min(deg) and the
# denominator |N(a) u N(b)| is always >= 1.
# ---------------------------------------------------------------------------
def mention_neighbor_jaccard(
    sf_dir: str, num_partitions: int | None = None
) -> ray.data.Dataset:
    """(m1, m2, common_neighbors, deg_m1, deg_m2, jaccard) for mention
    pairs with >= 1 shared co-occurrence neighbor (m1 < m2 lexically)."""
    from ray.data.aggregate import Count as _Count

    from ifctordf_ray.functions.kernels import safe_join

    edges = cooccurring_mentions(sf_dir)

    def sym(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n": pa.concat_arrays(
                    [t["m1"].combine_chunks(), t["m2"].combine_chunks()]
                ),
                "nb": pa.concat_arrays(
                    [t["m2"].combine_chunks(), t["m1"].combine_chunks()]
                ),
            }
        )

    adj = edges.map_batches(sym, batch_format="pyarrow").materialize()
    # adjacency-sized (2x edge count); consumed by wedges AND degrees

    def emit_pairs(g: pa.Table) -> pa.Table:
        from itertools import combinations

        nbs = sorted(g["nb"].to_pylist())
        a, b = [], []
        for x, y in combinations(nbs, 2):
            a.append(x)
            b.append(y)
        return pa.table(
            {"m1": pa.array(a, pa.string()), "m2": pa.array(b, pa.string())}
        )

    common = (
        adj.groupby("n")
        .map_groups(emit_pairs, batch_format="pyarrow")
        .groupby(["m1", "m2"])
        .aggregate(_Count(alias_name="common_neighbors"))
        .map_batches(
            lambda t: pa.table(
                {
                    "m1": t["m1"],
                    "m2": t["m2"],
                    "common_neighbors": pc.cast(t["common_neighbors"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    deg = (
        adj.groupby("n")
        .aggregate(_Count(alias_name="d"))
        .map_batches(
            lambda t: pa.table({"n": t["n"], "d": pc.cast(t["d"], pa.int64())}),
            batch_format="pyarrow",
        )
    )

    pair_schema = pa.schema(
        [("m1", pa.string()), ("m2", pa.string()), ("common_neighbors", pa.int64())]
    )
    deg_schema = pa.schema([("n", pa.string()), ("d", pa.int64())])
    with_da = safe_join(
        common,
        pair_schema,
        deg,
        deg_schema,
        join_type="inner",
        on=("m1",),
        right_on=("n",),
        num_partitions=num_partitions,
    ).map_batches(
        lambda t: pa.table(
            {
                "m1": t["m1"],
                "m2": t["m2"],
                "common_neighbors": t["common_neighbors"],
                "deg_m1": t["d"],
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # pair-count-sized; splits the chained-join plan
    wa_schema = pa.schema(
        [
            ("m1", pa.string()),
            ("m2", pa.string()),
            ("common_neighbors", pa.int64()),
            ("deg_m1", pa.int64()),
        ]
    )
    out = safe_join(
        with_da,
        wa_schema,
        deg,
        deg_schema,
        join_type="inner",
        on=("m2",),
        right_on=("n",),
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        c = pc.cast(t["common_neighbors"], pa.float64())
        union = pc.subtract(
            pc.add(t["deg_m1"], t["d"]), t["common_neighbors"]
        )
        return pa.table(
            {
                "m1": t["m1"],
                "m2": t["m2"],
                "common_neighbors": t["common_neighbors"],
                "deg_m1": t["deg_m1"],
                "deg_m2": t["d"],
                "jaccard": pc.divide(c, pc.cast(union, pa.float64())),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def mention_neighbor_jaccard_sql(cap: int = COOC_CAP) -> str:
    return f"""WITH e AS ({cooccurring_mentions_sql(cap)}),
sym AS (SELECT m1 AS n, m2 AS nb FROM e UNION ALL SELECT m2, m1 FROM e),
deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY n),
p AS (
    SELECT a.nb AS m1, b.nb AS m2, CAST(count(*) AS BIGINT) AS common_neighbors
    FROM sym a JOIN sym b ON a.n = b.n AND a.nb < b.nb
    GROUP BY 1, 2
)
SELECT p.m1, p.m2, p.common_neighbors,
       da.d AS deg_m1, db.d AS deg_m2,
       CAST(p.common_neighbors AS DOUBLE)
           / (da.d + db.d - p.common_neighbors) AS jaccard
FROM p JOIN deg da ON da.n = p.m1 JOIN deg db ON db.n = p.m2"""
