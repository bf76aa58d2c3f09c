"""Entity linking: join canonical IDs back onto mention occurrences.

The M3 stage (SURVEY.md §7.1): after canonicalize.canonicalize_mentions
assigns one canonical id per surface form (groupby-aggregate), this stage
links every mention occurrence to its canonical id + first-seen
provenance — the reference's analog is every literal site reusing the
memoized wrapper Resource (RDFWriter.java:807-819).

Physical shape: a distributed hash join on surface_key.  The canonical
table is one row per DISTINCT surface form — with an unbounded surface
domain (NUM_RE matches any digit string) it grows with the corpus, so a
driver-side take_all + broadcast dict would OOM the driver at scale.
Dataset.join hash-partitions both sides on surface_key; the mention
stream is flattened by a narrow map first so the join moves (occurrence,
key) rows, never raw text.
"""

from __future__ import annotations


import pyarrow as pa
import ray.data

from ifctordf_ray import schema as S


def mention_occurrences(batch: pa.Table) -> pa.Table:
    """map_batches stage: flatten each turn's numeric mentions to one
    (conv_id, turn_idx, surface_key) row per occurrence.  Fully
    vectorized (kernels.digit_runs — no per-row findall loop).

    A TASK-pool function, not an actor class: it is stateless, and this
    stage feeds BOTH sides of the safe_join below — two reserved actor
    pools plus the join's aggregator actors deadlock a small (4-CPU)
    session (same mechanism as pipelines/corpus.py's chunker note)."""
    import pyarrow.compute as pc

    from ifctordf_ray.functions.kernels import digit_runs

    parents, runs = digit_runs(batch["text"])
    return pa.table(
        {
            "conv_id": pc.take(batch["conv_id"], parents),
            "turn_idx": pc.take(batch["turn_idx"], parents).cast(pa.int32()),
            "surface_key": runs,
        }
    )


def link_mentions(
    transcripts: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """mention occurrences + canonical ids, via a hash join on
    surface_key (both sides distributed; nothing on the driver).

    `num_partitions` sizes the join exchange (default: cluster CPUs via
    tuning.default_join_partitions; at multi-node scale pass ~2-4x
    aggregate cores so each aggregator's hash table stays in heap).
    """
    from ray.data.aggregate import Min

    occ = transcripts.map_batches(mention_occurrences, batch_format="pyarrow")

    # ONE extraction pass: the canonical table is DERIVED from the same
    # occurrence stream and self-joined back (the r2 wrapper materialized
    # the whole transcript dataset to feed two separate extractions — a
    # scale-killer at object-store-sized input; each branch here instead
    # re-executes the cheap pruned read, which is the 100-TB answer).
    def _with_sk(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # schema.first_seen_key vectorized: conv_id # zero-padded idx
        sk = pc.binary_join_element_wise(
            t["conv_id"],
            pc.utf8_lpad(pc.cast(t["turn_idx"], pa.string()), 10, "0"),
            "#",
        )
        return pa.table({"surface_key": t["surface_key"], "sk": sk})

    def _finish_canon(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cid = pc.binary_join_element_wise(
            pa.scalar("inst:num/"), t["surface_key"], ""
        )
        return pa.table(
            {
                "surface_key": t["surface_key"],
                "canonical_id": cid,
                "first_seen": t["first_seen"],
            }
        )

    # safe_join: the groupby's empty partitions are zero-column blocks AND
    # an empty transcript table makes the occurrence side ZERO blocks —
    # both lose the join's schema broadcast (see kernels.safe_join).  The
    # string sentinels ("\x00L"/"\x00R") cannot be real surface forms
    # (NUM_RE matches digits only) and are stripped post-join.
    canon = (
        occ.map_batches(_with_sk, batch_format="pyarrow")
        .groupby("surface_key")
        .aggregate(Min("sk", alias_name="first_seen"))
        .map_batches(_finish_canon, batch_format="pyarrow")
    )
    from ifctordf_ray.functions.kernels import safe_join

    joined = safe_join(
        occ,
        pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("surface_key", pa.string()),
            ]
        ),
        canon,
        pa.schema(
            [
                ("surface_key", pa.string()),
                ("canonical_id", pa.string()),
                ("first_seen", pa.string()),
            ]
        ),
        join_type="inner",
        on=("surface_key",),
        right_on=("surface_key",),
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        # pin column order + dtypes (join output order is not guaranteed)
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"].cast(pa.int32()),
                "surface_key": t["surface_key"],
                "canonical_id": t["canonical_id"],
                "first_seen": t["first_seen"],
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def link_mentions_sql() -> str:
    from ifctordf_ray.sql_oracle import transcripts_cte

    return f"""WITH {transcripts_cte()},
m AS (
    SELECT conv_id, turn_idx, u.m AS surface_key,
           printf('%s#%010d', conv_id, turn_idx) AS sk
    FROM transcripts, UNNEST(regexp_extract_all(coalesce(text, ''), '{S.NUM_RE}')) AS u(m)
),
canon AS (
    SELECT surface_key, min(sk) AS first_seen FROM m GROUP BY surface_key
)
SELECT m.conv_id, m.turn_idx, m.surface_key,
       'inst:num/' || m.surface_key AS canonical_id,
       canon.first_seen
FROM m JOIN canon USING (surface_key)"""
