"""Transcript sources.

The engine's input contract (BASELINE.json `input_hint`) is a Parquet table

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

`read_transcripts` reads such a table directly (the S1/S5 analog —
IfcSpfReader.showFiles + IfcSpfParser.readModel: ray.data.read_parquet
already does recursive discovery and logical-record assembly).

Because the sandbox's driver-generated test data has no transcripts table,
`transcripts_from_events` DERIVES one deterministically from the `events`
table (event_id, ts, user_id, event_type, value, props): each user's
events, ordered by (ts, event_id), are chunked into conversations of
TURNS_PER_CONV turns.  The identical derivation is expressed in ANSI SQL by
`transcripts_from_events_sql()` so the DuckDB oracle sees byte-identical
transcripts — no external data is synthesized.

The per-user ordering + chunking is itself the engine's "conversation
assembly" pattern: groupby(key) + in-group sort — the Ray-Data analog of
the reference's multi-line statement reassembly (IfcSpfParser.java:36-41).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

TURNS_PER_CONV = 8

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

def clean_read_parquet(path, **kwargs) -> "ray.data.Dataset":
    """ray.data.read_parquet with pandas schema metadata stripped.  The
    driver's pandas-written parquet carries b'pandas' schema metadata
    whose nested dict makes pa.Schema unhashable — every downstream
    sort/union then logs 'Failed to hash the schemas (for deduplication)'
    per reduce task (Ray's schema dedup calls set(schemas)).

    Preferred path: pass read_parquet an explicit metadata-free schema
    (projected to `columns`) built from one file footer — zero extra
    stages and even the read op's own schema dedup stays quiet.  Fallback
    (globs/dirs where a footer isn't cheaply resolvable): a strip map
    fused into the first stage."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq
    import ray.data as _rd

    if "schema" not in kwargs:
        probe = path[0] if isinstance(path, (list, tuple)) else path
        f = None
        if isinstance(probe, str) and probe.endswith(".parquet") and _os.path.isfile(probe):
            f = probe
        elif isinstance(probe, str) and _os.path.isdir(probe):
            hits = sorted(_glob.glob(_os.path.join(probe, "*.parquet")))
            f = hits[0] if hits else None
        if f is not None:
            try:
                full = _pq.read_schema(f).remove_metadata()
                cols = kwargs.get("columns")
                schema = (
                    pa.schema([full.field(c) for c in cols]) if cols else full
                )
                return _rd.read_parquet(path, schema=schema, **kwargs)
            except Exception:
                pass  # fall through to the strip map
    return _rd.read_parquet(path, **kwargs).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )


# event_type -> role; unmapped event types pass through verbatim and are
# flagged E_BAD_ROLE downstream (closed-vocab contract, SURVEY.md §2.3 L6).
# 'view' is deliberately unmapped so the derived corpus exercises the
# unknown-enum error path (reference golden test7) at every scale.
ROLE_MAP = {
    "click": "user",
    "purchase": "assistant",
    "signup": "system",
    "error": "tool",
}
# event types that count as tool invocations -> tool name.  'mailer' is
# deliberately OUTSIDE the closed TOOLS vocab -> E_BAD_TOOL path.
TOOL_MAP = {"error": "logger", "signup": "mailer"}

# purchase turns get a ' see #N' back-reference appended to their text:
# turn_idx>0 -> previous turn (always valid); turn_idx==0 -> '#7', valid
# only in full conversations -> partial trailing conversations exercise
# the dangling-reference abort path (reference golden test6/test15).
REF_TARGET_FOR_FIRST_TURN = TURNS_PER_CONV - 1


def read_transcripts(path: str | list[str], **kwargs) -> ray.data.Dataset:
    """Read a transcript Parquet table/directory with column pruning."""
    cols = [f.name for f in TRANSCRIPT_SCHEMA]
    return clean_read_parquet(path, columns=cols, **kwargs)


def _events_group_to_turns(
    group: pa.Table, replicate: int = 1, drop_dangling: bool = False
) -> pa.Table:
    """One user's events -> transcript rows.  Vectorized within the group.

    replicate>1 emits k deterministic copies with disjoint conv-id spaces
    ('r<k>-' prefix) — used by the benchmark to scale the corpus without
    external data; replica 0 keeps unprefixed ids (identical to
    replicate=1).

    drop_dangling=True performs the per-conversation dangling-'#N'
    validation (reference ERROR 6/7 abort, J1) RIGHT HERE: a user's
    conversations are complete within the group, so validity is in-group
    decidable and the downstream pipeline needs no separate
    reference-resolution pass or materialize barrier — the whole
    flagship becomes one fused streaming pipeline."""
    g = group.sort_by([("ts", "ascending"), ("event_id", "ascending")])
    n = g.num_rows
    user_id = g["user_id"][0].as_py()
    rn = np.arange(n, dtype=np.int64)
    conv_seq = rn // TURNS_PER_CONV
    turn_idx = (rn % TURNS_PER_CONV).astype(np.int32)
    etype = g["event_type"].to_pylist()
    role = np.array([ROLE_MAP.get(e, e) for e in etype], dtype=object)
    tool = [TOOL_MAP.get(e) for e in etype]
    props = g["props"].to_pylist()
    text = [
        p + f" see #{t - 1 if t > 0 else REF_TARGET_FOR_FIRST_TURN}"
        if e == "purchase"
        else p
        for p, e, t in zip(props, etype, turn_idx.tolist())
    ]
    keep = None
    if drop_dangling:
        import re as _re

        ref_re = _re.compile(r"#(\d+)")
        n_convs = int(conv_seq[-1]) + 1 if n else 0
        conv_len = np.minimum(
            n - np.arange(n_convs) * TURNS_PER_CONV, TURNS_PER_CONV
        )
        bad = np.zeros(n_convs, dtype=bool)
        for i, t in enumerate(text):
            if t and "#" in t:
                c = conv_seq[i]
                for m in ref_re.findall(t):
                    if int(m) >= conv_len[c]:
                        bad[c] = True
                        break
        keep = ~bad[conv_seq]

    tables = []
    for k in range(replicate):
        prefix = "" if k == 0 else f"r{k}-"
        conv_id = np.array(
            [f"{prefix}c{user_id}-{s}" for s in conv_seq], dtype=object
        )
        t = pa.table(
            {
                "conv_id": pa.array(conv_id, type=pa.string()),
                "turn_idx": pa.array(turn_idx, type=pa.int32()),
                "role": pa.array(role, type=pa.string()),
                "text": pa.array(text, type=pa.string()),
                "tool": pa.array(tool, type=pa.string()),
                "ts": g["ts"].cast(pa.timestamp("us")),
            }
        )
        if keep is not None:
            t = t.filter(pa.array(keep))
        tables.append(t)
    return pa.concat_tables(tables)


def transcripts_from_events(
    sf_dir: str, replicate: int = 1, drop_dangling: bool = False
) -> ray.data.Dataset:
    """events.parquet -> deterministic transcript Dataset.

    Shuffle: one groupby(user_id) (hash exchange); everything inside the
    group is a vectorized sort + arithmetic.  user_id cardinality scales
    with the data (sf0.1: 1500 users) so groups stay small and balanced.

    drop_dangling=True additionally drops conversations with dangling
    '#N' refs in-group (see _events_group_to_turns) — the fused-assembly
    fast path used by the flagship pipeline.
    """
    import functools

    from ifctordf_ray.tuning import read_parallelism

    # block count pins every downstream all-to-all's partition count
    # (Ray sort: num_outputs = num_mappers) — size it to the session so
    # the assembly groupby AND the final distinct sort pack all CPUs
    # (see tuning.read_parallelism; measured 10-block default = 2 ragged
    # waves at 8 CPUs and 12x sort skew).
    ev = clean_read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
        override_num_blocks=read_parallelism(),
    )
    if replicate == 1 and not drop_dangling:
        fn = _events_group_to_turns
    else:
        fn = functools.partial(
            _events_group_to_turns, replicate=replicate, drop_dangling=drop_dangling
        )
    return ev.groupby("user_id").map_groups(fn, batch_format="pyarrow")


def transcripts_from_events_sql() -> str:
    """The identical derivation as a DuckDB CTE body over the registered
    `events` view.  Kept in lock-step with `_events_group_to_turns`."""
    role_case = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in ROLE_MAP.items()
    )
    tool_case = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in TOOL_MAP.items()
    )
    return f"""
        SELECT conv_id, turn_idx, role,
               text0 || CASE WHEN etype = 'purchase'
                    THEN ' see #' || CAST(CASE WHEN turn_idx > 0
                         THEN turn_idx - 1
                         ELSE {REF_TARGET_FOR_FIRST_TURN} END AS VARCHAR)
                    ELSE '' END AS text,
               tool, ts
        FROM (
            SELECT printf('c%d-%d', user_id, (rn - 1) // {TURNS_PER_CONV}) AS conv_id,
                   CAST((rn - 1) % {TURNS_PER_CONV} AS INTEGER) AS turn_idx,
                   CASE event_type {role_case} ELSE event_type END AS role,
                   props AS text0,
                   event_type AS etype,
                   CASE event_type {tool_case} ELSE NULL END AS tool,
                   ts
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS rn
                FROM events
            )
        )
    """


def read_transcripts_versioned(paths: list[str]) -> ray.data.Dataset:
    """Multi-version transcript source — the S2 getExpressSchema analog
    (IfcSpfReader.java:186-223): each input file's vocabulary version is
    sniffed from its Parquet FOOTER key-value metadata (driver-side,
    metadata-only — the FILE_SCHEMA header-line sniff), and its rows are
    tagged with a `vocab_ver` column so downstream extraction validates
    every row against ITS file's vocabulary generation.  One run mixes
    generations freely; an unknown tag aborts at plan time (the
    reference's 'Could not convert file with schema' behavior)."""
    from ifctordf_ray import schema as S

    def tag(v: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "vocab_ver", pa.nulls(t.num_rows, pa.string()).fill_null(v)
            )

        return fn

    parts = [
        read_transcripts(p).map_batches(
            tag(S.sniff_vocab_version(p)), batch_format="pyarrow"
        )
        for p in paths
    ]
    out = parts[0]
    for d in parts[1:]:
        out = out.union(d)
    return out


def tag_vocab_by_conv(tr: ray.data.Dataset) -> ray.data.Dataset:
    """Deterministic dataset-level version tag over a single untagged
    table: the conversation id's md5 parity picks the vocabulary
    generation (md5 >= '8' -> v2, else v1).  The single-table stand-in
    for the per-file footer sniff — shared verbatim with the SQL oracle
    (`CASE WHEN md5(conv_id) >= '8' THEN 'v2' ELSE 'v1' END`)."""
    import hashlib as _hl

    def tag(t: pa.Table) -> pa.Table:
        vv = [
            "v2" if _hl.md5(c.encode("utf-8")).hexdigest() >= "8" else "v1"
            for c in t["conv_id"].to_pylist()
        ]
        return t.append_column("vocab_ver", pa.array(vv, pa.string()))

    return tr.map_batches(tag, batch_format="pyarrow")


# --- structured-list-mention injection (kg_list_members gate row) ---------
# The driver-generated sf corpora contain no '((..),(..))' structured-list
# text patterns, so the T7-T10 inverse (kg.list_members, the ordered list
# recovery of RDFWriter.java:707-980's chains) had no non-trivial oracle.
# This derivation appends one deterministic two-level list mention to every
# (turn_idx % 4 == 1, non-null-text) turn, with cell values computed from
# the turn's own text length — a pure function of the input table,
# expressed identically in SQL (inject_list_mentions_sql) so the DuckDB
# oracle sees byte-identical transcripts.  No external data.
LIST_INJECT_MOD = 4


def inject_list_mentions(tr: ray.data.Dataset) -> ray.data.Dataset:
    """Append ' ((a,b),(c))' to each turn_idx%4==1 turn's text, where
    a = len(text) % 5, b = (len(text)+2) % 7, c = (len(text)*3) % 11
    (character length, matching SQL length())."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        txt = t["text"].combine_chunks()
        L = (
            pc.fill_null(pc.utf8_length(txt), 0)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        tix = np.asarray(t["turn_idx"].combine_chunks(), dtype=np.int64)
        mask = pa.array(
            (tix % LIST_INJECT_MOD == 1)
            & pc.is_valid(txt).to_numpy(zero_copy_only=False)
        )

        def s(x: np.ndarray) -> pa.Array:
            return pc.cast(pa.array(x), pa.string())

        def const(v: str) -> pa.Array:
            return pa.nulls(n, pa.string()).fill_null(v)

        sfx = pc.binary_join_element_wise(
            const(" (("), s(L % 5), const(","), s((L + 2) % 7),
            const("),("), s(L * 3 % 11), const("))"), "",
        )
        new_text = pc.if_else(
            mask, pc.binary_join_element_wise(pc.fill_null(txt, ""), sfx, ""), txt
        )
        return t.set_column(t.schema.get_field_index("text"), "text", new_text)

    return tr.map_batches(fn, batch_format="pyarrow")


def inject_list_mentions_sql(base_sql: str | None = None) -> str:
    """The identical injection over the SQL-derived transcripts."""
    base = base_sql or transcripts_from_events_sql()
    return f"""
        SELECT conv_id, turn_idx, role,
               CASE WHEN text IS NOT NULL AND turn_idx % {LIST_INJECT_MOD} = 1
                    THEN text || ' ((' || CAST(length(text) % 5 AS VARCHAR)
                         || ',' || CAST((length(text) + 2) % 7 AS VARCHAR)
                         || '),(' || CAST(length(text) * 3 % 11 AS VARCHAR)
                         || '))'
                    ELSE text END AS text,
               tool, ts
        FROM ({base})
    """


def transcripts_table(rows: list[dict]) -> pa.Table:
    """Build an in-memory transcript table for tests/fixtures.  Missing
    fields default to: role='user', text='', tool=None, ts derived as
    epoch + conv_ordinal h + turn_idx min (FIXTURES.md)."""
    import datetime as _dt

    conv_ord: dict[str, int] = {}
    out = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for r in rows:
        cid = r["conv_id"]
        conv_ord.setdefault(cid, len(conv_ord))
        out["conv_id"].append(cid)
        out["turn_idx"].append(r["turn_idx"])
        out["role"].append(r.get("role", "user"))
        out["text"].append(r.get("text", ""))
        out["tool"].append(r.get("tool"))
        out["ts"].append(
            r.get(
                "ts",
                _dt.datetime(2024, 1, 1)
                + _dt.timedelta(hours=conv_ord[cid], minutes=r["turn_idx"]),
            )
        )
    return pa.table(
        {
            "conv_id": pa.array(out["conv_id"], pa.string()),
            "turn_idx": pa.array(out["turn_idx"], pa.int32()),
            "role": pa.array(out["role"], pa.string()),
            "text": pa.array(out["text"], pa.string()),
            "tool": pa.array(out["tool"], pa.string()),
            "ts": pa.array(out["ts"], pa.timestamp("us")),
        }
    )
