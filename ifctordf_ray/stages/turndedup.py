"""Optional exact dedup of turns within a conversation + reference
redirect — the direct analog of the reference's `resolveDuplicates`
(IfcSpfParser.java:147-165: statements with identical content after the
'#N=' are removed, first-seen wins) and its duplicate-redirect map
consulted during reference resolution (`listOfDuplicateLineEntries`,
IfcSpfParser.java:16, 184-187).

Transcript semantics: within one conversation, turns with identical
content key (role, text, tool) — ts excluded, like the reference keying
on the statement text only — collapse to the lowest turn_idx; '#N'
references to a dropped turn resolve to its keeper via the redirect map.

Physical shape: one groupby(conv_id) shuffle; keying, keeping and
redirecting are all in-group (duplicates never cross conversations,
as reference duplicates never cross files).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

_EMPTY_REDIRECTS = pa.table(
    {
        "conv_id": pa.array([], pa.string()),
        "dup_idx": pa.array([], pa.int32()),
        "keep_idx": pa.array([], pa.int32()),
    }
)


def _dedup_group(g: pa.Table) -> pa.Table:
    g = g.sort_by("turn_idx")
    seen: dict[tuple, int] = {}
    keep_rows, dup_idx, keep_idx = [], [], []
    roles = g["role"].to_pylist()
    texts = g["text"].to_pylist()
    tools = g["tool"].to_pylist()
    idxs = g["turn_idx"].to_pylist()
    for i in range(g.num_rows):
        key = (roles[i], texts[i], tools[i])
        if key in seen:
            dup_idx.append(idxs[i])
            keep_idx.append(seen[key])
        else:
            seen[key] = idxs[i]
            keep_rows.append(i)
    return g.take(keep_rows)


def _redirects_group(g: pa.Table) -> pa.Table:
    g = g.sort_by("turn_idx")
    seen: dict[tuple, int] = {}
    conv, dup_idx, keep_idx = [], [], []
    cid = g["conv_id"][0].as_py()
    roles = g["role"].to_pylist()
    texts = g["text"].to_pylist()
    tools = g["tool"].to_pylist()
    idxs = g["turn_idx"].to_pylist()
    for i in range(g.num_rows):
        key = (roles[i], texts[i], tools[i])
        if key in seen:
            conv.append(cid)
            dup_idx.append(idxs[i])
            keep_idx.append(seen[key])
        else:
            seen[key] = idxs[i]
    if not conv:
        return _EMPTY_REDIRECTS
    return pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "dup_idx": pa.array(dup_idx, pa.int32()),
            "keep_idx": pa.array(keep_idx, pa.int32()),
        }
    )


def dedup_turns(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Deduplicated transcripts (first-seen turn kept per content key)."""
    return transcripts.groupby("conv_id").map_groups(
        _dedup_group, batch_format="pyarrow"
    )


def turn_redirects(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """The redirect map: (conv_id, dup_idx -> keep_idx)."""
    return transcripts.groupby("conv_id").map_groups(
        _redirects_group, batch_format="pyarrow"
    )


def dedup_turns_sql() -> str:
    from ifctordf_ray.sql_oracle import transcripts_cte

    return f"""WITH {transcripts_cte()},
keyed AS (
    SELECT *, min(turn_idx) OVER (
        PARTITION BY conv_id, role, coalesce(text, chr(1)),
                     coalesce(tool, chr(1))) AS keep_idx
    FROM transcripts
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM keyed WHERE turn_idx = keep_idx"""


def turn_redirects_sql() -> str:
    from ifctordf_ray.sql_oracle import transcripts_cte

    return f"""WITH {transcripts_cte()},
keyed AS (
    SELECT *, min(turn_idx) OVER (
        PARTITION BY conv_id, role, coalesce(text, chr(1)),
                     coalesce(tool, chr(1))) AS keep_idx
    FROM transcripts
)
SELECT conv_id, turn_idx AS dup_idx, keep_idx
FROM keyed WHERE turn_idx != keep_idx"""
