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
import ray.data

from ifctordf_ray import schema as S


def mention_next_hop(sf_dir: str, num_partitions: int | None = None) -> ray.data.Dataset:
    """(subj, via_turn, next_turn): turns whose text mentions a turn,
    composed with that turn's successor — `mentionsTurn/nextTurn`."""
    import pyarrow.compute as pc

    from ifctordf_ray.pipelines import kg
    from ifctordf_ray.tuning import join_kwargs

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
    joined = mentions.join(
        nexts,
        join_type="inner",
        on=("via_turn",),
        right_on=("nt_subj",),
        **join_kwargs(num_partitions),
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
