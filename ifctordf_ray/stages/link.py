"""Entity linking: join canonical IDs back onto mention occurrences.

The M3 stage (SURVEY.md §7.1): after canonicalize.canonicalize_mentions
assigns one canonical id per surface form (groupby-aggregate), this stage
links every mention occurrence to its canonical id + first-seen
provenance — the reference's analog is every literal site reusing the
memoized wrapper Resource (RDFWriter.java:807-819).

Physical shape: the canonical table is the SMALL side (one row per
distinct surface form), so the link is a broadcast join — the canonical
dict is ray.put once and loaded per actor in __init__ (L1 pattern); the
big mention stream is mapped without any shuffle.  For a canonical table
too big to broadcast, swap in Dataset.join on surface_key (documented
fallback; same output contract).
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray
import ray.data

from ifctordf_ray import schema as S
from ifctordf_ray.stages.canonicalize import canonicalize_mentions


class MentionLinker:
    """Actor-pool stage: canonical dict loaded once per actor; per batch,
    flatten mention occurrences and attach canonical_id/first_seen."""

    def __init__(self, canon_ref):
        self.num_re = re.compile(S.NUM_RE)
        self.canon = ray.get(canon_ref)  # surface_key -> (canonical_id, first_seen)

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv, idx, key, cid, fs = [], [], [], [], []
        for c, i, t in zip(
            batch["conv_id"].to_pylist(),
            batch["turn_idx"].to_pylist(),
            batch["text"].to_pylist(),
        ):
            if not t:
                continue
            for m in self.num_re.findall(t):
                canonical_id, first_seen = self.canon[m]
                conv.append(c)
                idx.append(i)
                key.append(m)
                cid.append(canonical_id)
                fs.append(first_seen)
        return pa.table(
            {
                "conv_id": pa.array(conv, pa.string()),
                "turn_idx": pa.array(idx, pa.int32()),
                "surface_key": pa.array(key, pa.string()),
                "canonical_id": pa.array(cid, pa.string()),
                "first_seen": pa.array(fs, pa.string()),
            }
        )


def link_mentions(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """mention occurrences + canonical ids.  Two consumers of
    `transcripts`; callers pass a materialized/cheaply-recomputable set."""
    canon_rows = canonicalize_mentions(transcripts).take_all()  # small side
    canon = {
        r["surface_key"]: (r["canonical_id"], r["first_seen"]) for r in canon_rows
    }
    canon_ref = ray.put(canon)
    return transcripts.map_batches(
        MentionLinker,
        fn_constructor_kwargs={"canon_ref": canon_ref},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


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
