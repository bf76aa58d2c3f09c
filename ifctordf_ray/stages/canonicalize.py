"""Canonical-ID assignment on surface-form keys.

The distributed replacement for the reference's global literal-wrapper
dedup map (`propertyResourceMap`, RDFWriter.java:79, 807-819, 951-961: one
wrapper instance per (prop, type, lexical) key per file, first-seen wins)
and its global `idCounter` (IfcSpfParser.java:13-14): a groupby-aggregate
over surface-form keys assigns each distinct surface form one canonical
id plus first-seen provenance, shuffle key = surface_key.

Skew note (SURVEY.md §7.3): hot surface forms (e.g. the literal "0.")
all hash to one reducer.  The aggregate here is algebraic (min/count), so
Ray's groupby pre-combines per block before the exchange — the shuffle
moves one partial row per (block, key), not one row per mention.
"""

from __future__ import annotations


import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Min

from ifctordf_ray import schema as S


class MentionSurfaceForms:
    """map_batches stage: flatten numeric mentions to (surface_key, sk)
    rows, sk = the first-seen total-order key.  Fully vectorized
    (kernels.digit_runs + Arrow string kernels — no per-row loop)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ifctordf_ray.functions.kernels import digit_runs

        parents, runs = digit_runs(batch["text"])
        # schema.first_seen_key vectorized: conv_id # zero-padded idx
        sk = pc.binary_join_element_wise(
            pc.take(batch["conv_id"], parents),
            pc.utf8_lpad(
                pc.cast(pc.take(batch["turn_idx"], parents), pa.string()),
                10,
                "0",
            ),
            "#",
        )
        return pa.table({"surface_key": runs, "sk": sk})


def canonicalize_mentions(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """-> Dataset(surface_key, canonical_id, first_seen, n_mentions).

    canonical_id is content-derived (idempotent, retry-safe — SURVEY.md
    §2.6 A1); first_seen = min over the conversation/turn total order
    reproduces the reference's first-seen-wins contract
    (IfcSpfParser.java:147-165) deterministically under any parallelism.
    """
    forms = transcripts.map_batches(
        MentionSurfaceForms, batch_format="pyarrow", concurrency=(1, 8), max_restarts=0
    )
    agg = forms.groupby("surface_key").aggregate(
        Min("sk", alias_name="first_seen"),
        Count(alias_name="n_mentions"),
    )

    def add_canonical(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cid = pc.binary_join_element_wise(
            pa.scalar("inst:num/"), t["surface_key"], ""
        )
        return t.append_column("canonical_id", cid).select(
            ["surface_key", "canonical_id", "first_seen", "n_mentions"]
        )

    return agg.map_batches(add_canonical, batch_format="pyarrow")
