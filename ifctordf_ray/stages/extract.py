r"""Schema-guided triple extraction — the heart of the engine.

This is the Ray-Data re-expression of the reference's core transform
(RDFWriter.createInstances + fillProperties*, RDFWriter.java:147-628):
for every record, resolve its class, mint an IRI, and emit rdf:type +
attribute/property triples; literal values become canonical wrapper
instances with VERBATIM lexical forms (RDFWriter.java:674-704); unmatched
closed-vocab values emit an error instead of a triple (ERROR 9,
RDFWriter.java:659-672); dangling references abort — here, abort exactly
one conversation to an errors side-output instead of the whole job
(RDFWriter.java:132-134 aborts the whole file; see SURVEY.md §7.3).

Triple spec (one source of truth; oracle.py and the generated SQL mirror it):

per conversation c:
  (inst:conv/c, rdf:type, ont:Conversation)
per turn (c, i, role, text, tool, ts):
  (inst:turn/c/i, rdf:type, ont:Turn)
  (inst:conv/c,  ont:hasTurn,   inst:turn/c/i)
  (inst:turn/c/i, ont:turnIndex, "i"^^xsd:integer)
  (inst:turn/c/i, ont:atTime,    strftime(ts)^^xsd:dateTime)
  (inst:turn/c/i, ont:hasRole,   ont:role/<role>)        if role in ROLES else E_BAD_ROLE
  (inst:turn/c/i, ont:usedTool,  ont:tool/<tool>)        if tool not null; unknown -> E_BAD_TOOL
  (inst:turn/c/i, ont:hasText,   inst:text/md5(text))
  (inst:text/md5(text), ont:hasString, text^^xsd:string)
  (inst:turn/c/p, ont:nextTurn,  inst:turn/c/i)          p = predecessor in turn_idx order
  for m in findall(r'\d+', text):
      (inst:turn/c/i, ont:mentionsNumber, inst:num/m)
      (inst:num/m, ont:hasInteger, m^^xsd:integer)       # verbatim lexical
  for '#N' in text:
      (inst:turn/c/i, ont:mentionsTurn, inst:turn/c/N)   if turn N exists in c
      else: conversation c is DANGLING -> all of c's triples dropped, E_DANGLING_REF

The final triple set has SET semantics: a global distinct over
(subj, pred, obj, obj_kind) — the analog of the reference's
resourceMap/propertyResourceMap memoization (RDFWriter.java:1092-1105).

Two physical plans, same result (asserted by tests):

- `extract_grouped` (flagship): groupby(conv_id).map_groups — each
  conversation assembled and extracted as one ordered Arrow group.
  Handles any turn_idx layout (gaps, unsorted) and does dangling-ref
  validation in-group with zero driver state.  One hash shuffle on
  conv_id.
- `extract_fast`: pure map_batches (no shuffle before the final
  distinct), vectorized row-local emission.  Requires dense 0-based
  turn_idx per conversation (the nextTurn edge is emitted arithmetically
  from turn i to i-1's IRI) — guaranteed by `transcripts_from_events`.
  Cross-turn '#N' references are validated by `resolve_references`: a
  distributed per-batch partial-max combine; only DANGLING conversations
  (error cases, assumed rare) are collected and broadcast.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ifctordf_ray import schema as S
from ifctordf_ray.functions.kernels import md5_hex as _md5_hex
from ifctordf_ray.functions.kernels import str_concat as _str_concat
from ifctordf_ray.functions.kernels import ts_lexical as _ts_lexical

TRIPLE_COLS = ["subj", "pred", "obj", "obj_kind"]   # public schema
COMPACT_COLS = ["subj", "pred_id", "obj"]           # internal wire format

_EMPTY_TRIPLES = pa.table(
    {
        "conv_id": pa.array([], pa.string()),
        "subj": pa.array([], pa.string()),
        "pred_id": pa.array([], pa.int8()),
        "obj": pa.array([], pa.string()),
    }
)

_EMPTY_ERRORS = pa.table(
    {
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int32()),
        "code": pa.array([], pa.string()),
        "detail": pa.array([], pa.string()),
    }
)


_WORKER_STATE: dict = {}


def _compiled() -> dict:
    """Per-worker-process compiled state (regexes, vocab sets).  A plain
    function + module-level cache gives the amortize-setup-once property
    of an actor pool WITHOUT per-stage actor process spawning: stateless
    tasks reuse warm worker processes across stages and pipelines, which
    measurably beats actor pools for cheap-state stages (actor spawn cost
    dominated small-run wall time; heavy-state stages — linker dict,
    query matrix — remain actor pools, SURVEY.md §2.3 L1)."""
    st = _WORKER_STATE.get("c")
    if st is None:
        st = {
            "num_re": re.compile(S.NUM_RE),
            "ref_re": re.compile(S.REF_RE),
            "dec_re": re.compile(S.DEC_RE),
            "hex_re": re.compile(S.HEX_RE),
            "outer_list_re": re.compile(S.OUTER_LIST_RE),
            "inner_list_re": re.compile(S.INNER_LIST_RE),
            "roles": frozenset(S.ROLES),
            "tools": frozenset(S.TOOLS),
        }
        _WORKER_STATE["c"] = st
    return st


def extract_triples_fn(batch: pa.Table, dangling_ref=None) -> pa.Table:
    """Vectorized row-local triple emission (stateless task form; broadcast
    dangling set fetched once per worker from the object store).

    Because every conversation containing ANY invalid '#N' reference is
    dropped wholesale, every surviving reference is valid by construction —
    mentionsTurn triples are emitted unconditionally (ref_targets=None)."""
    st = _compiled()
    if dangling_ref is not None:
        key = ("dangling", getattr(dangling_ref, "hex", lambda: id(dangling_ref))())
        arr = _WORKER_STATE.get(key)
        if arr is None:
            d = ray.get(dangling_ref)
            arr = pa.array(sorted(d)) if d else False
            _WORKER_STATE[key] = arr
        if arr is not False:
            batch = batch.filter(pc.invert(pc.is_in(batch["conv_id"], arr)))
    if batch.num_rows == 0:
        return _EMPTY_TRIPLES
    return extract_batch_triples(
        batch,
        num_re=st["num_re"],
        ref_re=st["ref_re"],
        roles=st["roles"],
        tools=st["tools"],
        ref_targets=None,
    )


class ExtractTriples:
    """Vectorized row-local triple emission (actor-pool stage: regexes are
    compiled once per actor in __init__, the L1 pattern — schema state
    loaded once, read-only per batch).

    `dangling_ref`: ray ObjectRef to a frozenset of conversation ids to
    drop (reference's abort semantics, per-conversation granularity).
    Because every conversation containing ANY invalid '#N' reference is
    dropped wholesale, every reference that survives the filter is valid —
    mentionsTurn triples are emitted unconditionally (ref_targets=None).
    """

    def __init__(self, dangling_ref=None):
        self.num_re = re.compile(S.NUM_RE)
        self.ref_re = re.compile(S.REF_RE)
        self.roles = frozenset(S.ROLES)
        self.tools = frozenset(S.TOOLS)
        self.dangling = (
            frozenset() if dangling_ref is None else ray.get(dangling_ref)
        )
        self._dangling_arr = (
            pa.array(sorted(self.dangling)) if self.dangling else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._dangling_arr is not None:
            keep = pc.invert(pc.is_in(batch["conv_id"], self._dangling_arr))
            batch = batch.filter(keep)
        if batch.num_rows == 0:
            return _EMPTY_TRIPLES
        return extract_batch_triples(
            batch,
            num_re=self.num_re,
            ref_re=self.ref_re,
            roles=self.roles,
            tools=self.tools,
            ref_targets=None,
        )


# composite "version#value" vocab membership keys (multi-version dispatch)
_VOCAB_ROLE_KEYS_ARR = pa.array(S.VOCAB_ROLE_KEYS)
_VOCAB_TOOL_KEYS_ARR = pa.array(S.VOCAB_TOOL_KEYS)

_WIRE_CODES = pa.array([c for c, _ in S.WIRE_PREFIX_TABLE])
_WIRE_PREFIXES = pa.array([x for _, x in S.WIRE_PREFIX_TABLE])


def _decode_wire_uris(arr) -> pa.Array:
    """Vectorized wire-code -> full-prefix expansion for URI terms (one
    slice + dictionary take + join; no per-row Python)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    first = pc.utf8_slice_codeunits(arr, 0, 1)
    rest = pc.utf8_slice_codeunits(arr, 1, 1 << 30)
    idx = pc.index_in(first, _WIRE_CODES).cast(pa.int32())
    prefix = pa.DictionaryArray.from_arrays(idx, _WIRE_PREFIXES).cast(pa.string())
    return pc.binary_join_element_wise(prefix, rest, "")


def decode_compact_batch(t: pa.Table) -> pa.Table:
    """Compact wire format (subj, pred_id, obj) -> public triple schema
    (subj, pred, obj, obj_kind): int8 pred decoded via dictionary take,
    wire prefix codes expanded (subj always; obj only where the
    predicate's object kind is uri — literals are never encoded)."""
    ids = t["pred_id"].combine_chunks() if isinstance(t["pred_id"], pa.ChunkedArray) else t["pred_id"]
    idx = ids.cast(pa.int32())
    pred = pa.DictionaryArray.from_arrays(idx, pa.array(S.PRED_NAMES)).cast(pa.string())
    kind = pa.DictionaryArray.from_arrays(idx, pa.array(S.PRED_KINDS)).cast(pa.string())
    subj = _decode_wire_uris(t["subj"])
    obj_raw = t["obj"].combine_chunks() if isinstance(t["obj"], pa.ChunkedArray) else t["obj"]
    is_uri = pc.equal(kind, "uri")
    obj = pc.if_else(is_uri, _decode_wire_uris(obj_raw), obj_raw)
    return pa.table({"subj": subj, "pred": pred, "obj": obj, "obj_kind": kind})


def decode_triples(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Dataset wrapper over decode_compact_batch — applied AFTER the
    distinct shuffle, so the exchange moves wire-coded bytes."""
    return ds.map_batches(decode_compact_batch, batch_format="pyarrow")


def extract_batch_triples(
    batch: pa.Table,
    num_re,
    ref_re,
    roles: frozenset,
    tools: frozenset,
    ref_targets: dict | None = None,
    conv_type_idx: int = 0,
    conv_type_mask=None,
    ref_redirect: dict | None = None,
) -> pa.Table:
    """One Arrow batch of transcript rows -> Arrow batch of triples in the
    COMPACT wire format, locally deduplicated.  Columns: conv_id, subj,
    pred_id (int8, see schema.PRED_TABLE), obj.  Row-local: valid for
    dense 0-based turn_idx (see module docstring).

    The conversation rdf:type triple is emitted only from the turn with
    turn_idx == conv_type_idx (unique-by-construction instead of
    once-per-turn + global dedup; grouped path passes the group's min).

    `ref_redirect` maps (conv_id, dup_turn_idx) -> keeper_turn_idx: a
    mentionsTurn edge to a dedup-dropped turn is rewritten to its keeper
    (the reference consults listOfDuplicateLineEntries on every #N lookup,
    IfcSpfParser.java:184-187, 213-216, 239-242)."""
    conv = batch["conv_id"].combine_chunks() if isinstance(batch["conv_id"], pa.ChunkedArray) else batch["conv_id"]
    idx = batch["turn_idx"]
    idx_str = pc.cast(idx, pa.string())
    conv_iri = _str_concat(S.W_CONV, conv)
    turn_iri = _str_concat(S.W_TURN, conv, "/", idx_str)
    role = batch["role"]
    tool = batch["tool"]
    text = batch["text"]

    tables: list[pa.Table] = []

    def emit(conv_a, subj_a, pred: str, obj_a, mask=None):
        n = len(conv_a)
        t = pa.table(
            {
                "conv_id": conv_a,
                "subj": subj_a,
                "pred_id": pa.nulls(n, pa.int8()).fill_null(S.PRED_ID[pred]),
                "obj": obj_a,
            }
        )
        if mask is not None:
            t = t.filter(mask)
        tables.append(t)

    # rdf:type triples (T1 analog); conv type once per conversation
    # (conv_type_mask, when given, marks each conversation's first row —
    # used by the segmented grouped path where first turn_idx varies)
    first_mask = (
        conv_type_mask if conv_type_mask is not None else pc.equal(idx, conv_type_idx)
    )
    emit(conv, conv_iri, S.RDF_TYPE,
         pa.nulls(len(conv), pa.string()).fill_null(S.W_CLS_CONV),
         mask=first_mask)
    emit(conv, turn_iri, S.RDF_TYPE,
         pa.nulls(len(conv), pa.string()).fill_null(S.W_CLS_TURN))
    # conv -hasTurn-> turn (SET-valued, T4)
    emit(conv, conv_iri, S.P_HAS_TURN, turn_iri)
    # turnIndex literal
    emit(conv, turn_iri, S.P_TURN_INDEX, _str_concat(idx_str, "^^" + S.XSD_INTEGER))
    # atTime literal (verbatim strftime lexical)
    ts_lex = pa.array(_ts_lexical(batch["ts"]), pa.string())
    emit(conv, turn_iri, S.P_AT_TIME, _str_concat(ts_lex, "^^" + S.XSD_DATETIME))
    # hasRole / usedTool enum individuals — unmatched emits nothing
    # (ERROR 9 contract).  When the batch carries a `vocab_ver` tag (the
    # multi-version source, S2 getExpressSchema analog), membership is
    # judged against THAT row's vocabulary generation: one vectorized
    # is_in over composite "version#value" keys, any number of versions.
    if "vocab_ver" in batch.column_names:
        vv = batch["vocab_ver"]
        role_ok = pc.is_in(
            pc.binary_join_element_wise(vv, pc.fill_null(role, ""), "#"),
            _VOCAB_ROLE_KEYS_ARR,
        )
        tool_in = pc.is_in(
            pc.binary_join_element_wise(vv, pc.fill_null(tool, ""), "#"),
            _VOCAB_TOOL_KEYS_ARR,
        )
        tool_ok = pc.fill_null(pc.and_kleene(pc.is_valid(tool), tool_in), False)
    else:
        role_ok = pc.is_in(role, pa.array(sorted(roles)))
        tool_ok = pc.and_kleene(
            pc.is_valid(tool), pc.is_in(tool, pa.array(sorted(tools)))
        )
        tool_ok = pc.fill_null(tool_ok, False)
    emit(conv, turn_iri, S.P_HAS_ROLE, _str_concat(S.W_ROLE, role), mask=role_ok)
    emit(conv, turn_iri, S.P_USED_TOOL,
         _str_concat(S.W_TOOL, pc.fill_null(tool, "")), mask=tool_ok)
    # hasText -> canonical wrapper + wrapper hasString literal (T11/D3 analog)
    text_py = text.to_pylist()
    text_hash = pa.array(_md5_hex([t if t is not None else "" for t in text_py]), pa.string())
    text_iri = _str_concat(S.W_TEXT, text_hash)
    emit(conv, turn_iri, S.P_HAS_TEXT, text_iri)
    emit(conv, text_iri, S.P_HAS_STRING,
         _str_concat(pc.fill_null(text, ""), "^^" + S.XSD_STRING))
    # nextTurn chain (T7-T10 analog): arithmetic predecessor (dense idx)
    prev_mask = pc.greater(idx, 0)
    prev_iri = _str_concat(
        S.W_TURN, conv, "/", pc.cast(pc.subtract(idx, 1), pa.string())
    )
    emit(conv, prev_iri, S.P_NEXT_TURN, turn_iri, mask=prev_mask)
    # usedToolFlag xsd:boolean literal — tool PRESENCE, vocab-independent
    # (the P5 boolean-dispatch analog, RDFWriter.java:687-695)
    flag = pc.if_else(
        pc.is_valid(tool),
        pa.scalar("true^^" + S.XSD_BOOLEAN),
        pa.scalar("false^^" + S.XSD_BOOLEAN),
    )
    emit(conv, turn_iri, S.P_TOOL_FLAG, flag)
    # textPresence three-valued logical individual (LOGICAL enum analog,
    # RDFWriter.java:696-704): null -> UNKNOWN, '' -> FALSE, else TRUE
    pres = pc.if_else(
        pc.is_valid(text),
        pc.if_else(
            pc.equal(pc.fill_null(text, ""), ""),
            pa.scalar(S.W_LOGICAL + "FALSE"),
            pa.scalar(S.W_LOGICAL + "TRUE"),
        ),
        pa.scalar(S.W_LOGICAL + "UNKNOWN"),
    )
    emit(conv, turn_iri, S.P_TEXT_PRESENCE, pres)

    # mentions — regex over text, flattened with row offsets
    dec_re = _compiled()["dec_re"]
    hex_re = _compiled()["hex_re"]
    conv_py = conv.to_pylist()
    m_conv, m_turn, m_lex = [], [], []
    d_conv, d_turn, d_lex = [], [], []
    h_conv, h_turn, h_lex = [], [], []
    r_conv, r_turn, r_tgt = [], [], []
    for i, t in enumerate(text_py):
        if not t:
            continue
        for m in num_re.findall(t):
            m_conv.append(conv_py[i])
            m_turn.append(i)
            m_lex.append(m)
        if "." in t:
            for m in dec_re.findall(t):
                d_conv.append(conv_py[i])
                d_turn.append(i)
                d_lex.append(m)
        if "0x" in t:
            for m in hex_re.findall(t):
                if len(m) % 2:  # odd run: outside hexBinary's lexical space
                    continue
                h_conv.append(conv_py[i])
                h_turn.append(i)
                h_lex.append(m)
        for m in ref_re.findall(t):
            r_conv.append(conv_py[i])
            r_turn.append(i)
            r_tgt.append(m)
    if m_lex:
        turn_iri_py = turn_iri.to_pylist()
        num_iri = pa.array([S.W_NUM + m for m in m_lex], pa.string())
        src = pa.array([turn_iri_py[i] for i in m_turn], pa.string())
        cv = pa.array(m_conv, pa.string())
        emit(cv, src, S.P_MENTIONS_NUMBER, num_iri)
        emit(cv, num_iri, S.P_HAS_INTEGER,
             pa.array([f"{m}^^{S.XSD_INTEGER}" for m in m_lex], pa.string()))
    if d_lex:
        # decimal mentions: VERBATIM lexical xsd:double ("12." kept as-is,
        # golden test11 analog)
        turn_iri_py = turn_iri.to_pylist()
        dec_iri = pa.array([S.W_DEC + m for m in d_lex], pa.string())
        src = pa.array([turn_iri_py[i] for i in d_turn], pa.string())
        cv = pa.array(d_conv, pa.string())
        emit(cv, src, S.P_MENTIONS_DECIMAL, dec_iri)
        emit(cv, dec_iri, S.P_HAS_DOUBLE,
             pa.array([f"{m}^^{S.XSD_DOUBLE}" for m in d_lex], pa.string()))
    if h_lex:
        # hex mentions: VERBATIM case xsd:hexBinary (the last P5 dispatch
        # branch, RDFWriter.java:678-686)
        turn_iri_py = turn_iri.to_pylist()
        hex_iri = pa.array([S.W_HEX + m for m in h_lex], pa.string())
        src = pa.array([turn_iri_py[i] for i in h_turn], pa.string())
        cv = pa.array(h_conv, pa.string())
        emit(cv, src, S.P_MENTIONS_HEX, hex_iri)
        emit(cv, hex_iri, S.P_HAS_HEXBINARY,
             pa.array([f"{m}^^{S.XSD_HEXBINARY}" for m in h_lex], pa.string()))
    # two-level structured list mentions (the _List_List analog,
    # reference tests 13/16/19): content-derived node chains with
    # hasContents/hasNext; identical (sub)lists share one chain globally
    # via the distinct (cross-sublist sharing, test13/16)
    has_outer = [("((" in t) if t else False for t in text_py]
    if any(has_outer):
        import hashlib as _hl

        outer_re = _compiled()["outer_list_re"]
        inner_re = _compiled()["inner_list_re"]
        l_conv, l_subj, l_pid, l_obj = [], [], [], []

        def node(key: str, pos: int) -> str:
            return f"{S.W_LISTN}{_hl.md5(key.encode()).hexdigest()}/{pos}"

        def add(cv, s_, p_, o_):
            l_conv.append(cv); l_subj.append(s_)
            l_pid.append(S.PRED_ID[p_]); l_obj.append(o_)

        turn_iri_py = turn_iri.to_pylist()
        for i, t in enumerate(text_py):
            if not has_outer[i]:
                continue
            cv = conv_py[i]
            for olex in outer_re.findall(t):
                add(cv, turn_iri_py[i], S.P_MENTIONS_LIST, node(olex, 0))
                inners = inner_re.findall(olex)
                for oi, ilex in enumerate(inners):
                    add(cv, node(olex, oi), S.P_HAS_CONTENTS, node(ilex, 0))
                    if oi + 1 < len(inners):
                        add(cv, node(olex, oi), S.P_HAS_NEXT, node(olex, oi + 1))
                    cells = ilex.split(",")
                    for j, d in enumerate(cells):
                        add(cv, node(ilex, j), S.P_HAS_CONTENTS, S.W_NUM + d)
                        if j + 1 < len(cells):
                            add(cv, node(ilex, j), S.P_HAS_NEXT, node(ilex, j + 1))
        if l_conv:
            tables.append(pa.table(
                {
                    "conv_id": pa.array(l_conv, pa.string()),
                    "subj": pa.array(l_subj, pa.string()),
                    "pred_id": pa.array(l_pid, pa.int8()),
                    "obj": pa.array(l_obj, pa.string()),
                }
            ))
    if r_tgt:
        turn_iri_py = turn_iri.to_pylist()
        keep_c, keep_s, keep_o = [], [], []
        for cv, i, tgt in zip(r_conv, r_turn, r_tgt):
            tgt_i = int(tgt)
            if ref_targets is not None and tgt_i not in ref_targets.get(cv, ()):
                continue  # grouped path: validate against the group's turn set
            if ref_redirect is not None:
                tgt_i = ref_redirect.get((cv, tgt_i), tgt_i)
            keep_c.append(cv)
            keep_s.append(turn_iri_py[i])
            keep_o.append(f"{S.W_TURN}{cv}/{tgt_i}")
        if keep_c:
            emit(
                pa.array(keep_c, pa.string()),
                pa.array(keep_s, pa.string()),
                S.P_MENTIONS_TURN,
                pa.array(keep_o, pa.string()),
            )

    out = pa.concat_tables(tables).combine_chunks()
    # local pre-dedup: shrinks the global distinct shuffle (SURVEY.md §7.3).
    # Keyed on the TRIPLE ONLY (round 4; was conv_id+triple): wrapper
    # triples have content-derived subjects, so identical rows recur
    # across conversations within a batch — set semantics make any one
    # copy sufficient, and the conv_id column is unused downstream of
    # emission (distinct() drops it); a deterministic min is kept for
    # schema compatibility.  Measured: 17% of the flagship's pre-distinct
    # exchange rows were cross-conversation wrapper repeats.
    # select/rename BY NAME (ADVICE r4): pyarrow names the min-aggregate
    # column "conv_id_min"; relying on positional order of group keys vs
    # aggregates would silently mislabel subj/pred_id/obj if a pyarrow
    # upgrade reordered aggregate output.
    agg = out.group_by(COMPACT_COLS).aggregate([("conv_id", "min")])
    return agg.select(["conv_id_min"] + COMPACT_COLS).rename_columns(
        ["conv_id"] + COMPACT_COLS
    )


class ExtractErrors:
    """Side-output error rows (the reference logs + aborts; we emit data —
    SURVEY.md §7.3 abort semantics).  Fully vectorized: two is_in masks +
    filters, no per-row Python."""

    def __init__(self):
        self.roles_arr = pa.array(sorted(S.ROLES))
        self.tools_arr = pa.array(sorted(S.TOOLS))

    def __call__(self, batch: pa.Table) -> pa.Table:
        role = batch["role"]
        tool = batch["tool"]
        # null role is a vocab violation too (detail '')
        bad_role = pc.invert(pc.fill_null(pc.is_in(role, self.roles_arr), False))
        bad_tool = pc.and_(
            pc.is_valid(tool),
            pc.invert(pc.fill_null(pc.is_in(tool, self.tools_arr), False)),
        )

        def rows(mask, code: str, detail_col) -> pa.Table:
            t = pa.table(
                {
                    "conv_id": batch["conv_id"],
                    "turn_idx": pc.cast(batch["turn_idx"], pa.int32()),
                    "code": pa.nulls(batch.num_rows, pa.string()).fill_null(code),
                    "detail": pc.cast(pc.fill_null(detail_col, ""), pa.string()),
                }
            )
            return t.filter(mask)

        return pa.concat_tables(
            [
                rows(bad_role, S.E_BAD_ROLE, role),
                rows(bad_tool, S.E_BAD_TOOL, tool),
            ]
        )


# --------------------------------------------------------------------------
# dangling-reference pre-pass (fast path only)
# --------------------------------------------------------------------------
def _find_refs(batch: pa.Table) -> pa.Table:
    """Rows of '#N' mentions: (conv_id, turn_idx, target)."""
    ref_re = re.compile(S.REF_RE)
    has = pc.match_substring_regex(pc.fill_null(batch["text"], ""), S.REF_RE)
    sub = batch.filter(has)
    conv, idx, tgt, raw = [], [], [], []
    for c, i, t in zip(
        sub["conv_id"].to_pylist(), sub["turn_idx"].to_pylist(), sub["text"].to_pylist()
    ):
        for m in ref_re.findall(t):
            conv.append(c); idx.append(i); tgt.append(int(m)); raw.append(m)
    return pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(idx, pa.int32()),
            "target": pa.array(tgt, pa.int64()),
            "raw": pa.array(raw, pa.string()),
        }
    )


_BIG_IDX = 1 << 62  # min-identity sentinel for ref-only partial rows


def _conv_bounds_partial(batch: pa.Table) -> pa.Table:
    """Per-batch PARTIAL dense-layout stats + max ref target per
    conversation: turn rows contribute (idx stats); '#N' mentions
    contribute max_tgt; a vectorized Arrow group_by collapses to one row
    per conversation per batch.  The partials are combined globally by
    `resolve_references` — the combiner-before-shuffle pattern
    (ray_guide 'Aggregation at scale').  All five stats are associative
    (max/max/sum/min/sum), so partial-of-partials is exact."""
    ref_re = re.compile(S.REF_RE)
    conv_py = batch["conv_id"].to_pylist()
    text_py = batch["text"].to_pylist()
    idxs = batch["turn_idx"].cast(pa.int64()).to_pylist()
    n = len(conv_py)
    conv = list(conv_py)
    tgts = [-1] * n
    n_turns = [1] * n
    min_idx = list(idxs)
    sum_idx = list(idxs)
    for c, t in zip(conv_py, text_py):
        if t and "#" in t:
            for m in ref_re.findall(t):
                conv.append(c)
                idxs.append(-1)
                tgts.append(int(m))
                n_turns.append(0)
                min_idx.append(_BIG_IDX)
                sum_idx.append(0)
    rows = pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "max_idx": pa.array(idxs, pa.int64()),
            "max_tgt": pa.array(tgts, pa.int64()),
            "n_turns": pa.array(n_turns, pa.int64()),
            "min_idx": pa.array(min_idx, pa.int64()),
            "sum_idx": pa.array(sum_idx, pa.int64()),
        }
    )
    part = rows.group_by("conv_id").aggregate(
        [("max_idx", "max"), ("max_tgt", "max"), ("n_turns", "sum"),
         ("min_idx", "min"), ("sum_idx", "sum")]
    )
    return part.rename_columns(
        ["conv_id", "max_idx", "max_tgt", "n_turns", "min_idx", "sum_idx"]
    )


def resolve_references(transcripts: ray.data.Dataset):
    """'#N' reference resolution (the J1 pointer-swizzle analog,
    IfcSpfParser.mapEntries, IfcSpfParser.java:167-259) — distributed.

    DENSE-LAYOUT CONTRACT (fast path): turn_idx is 0-based and contiguous
    per conversation, so a target is valid iff 0 <= target <= max(turn_idx).
    The contract is VALIDATED here, not assumed: per conversation the
    combined stats must satisfy n_turns == max_idx+1, min_idx == 0 and
    sum_idx == max_idx(max_idx+1)/2, else ValueError directs the caller to
    the grouped path (gapped/duplicated turn_idx would silently emit
    nextTurn edges to nonexistent turns otherwise).

    Physical plan: per-block algebraic partials (one row per (block,
    conv)), then a range-sort on conv_id co-locates every conversation's
    partials in one block (same argument as distinct()) where a
    vectorized Arrow group_by finishes the combine — fully distributed,
    no single-task funnel.  Only DANGLING conversations (error cases,
    assumed rare) are collected to the driver and broadcast.

    Returns (dangling_convs: frozenset, dangling_error_rows: list[dict]).
    For sparse/gapped turn_idx use extract_grouped (in-group validation).
    """
    partials = transcripts.map_batches(
        _conv_bounds_partial, batch_format="pyarrow"
    )

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("conv_id").aggregate(
            [("max_idx", "max"), ("max_tgt", "max"), ("n_turns", "sum"),
             ("min_idx", "min"), ("sum_idx", "sum")]
        ).rename_columns(
            ["conv_id", "max_idx", "max_tgt", "n_turns", "min_idx", "sum_idx"]
        )
        dangling = pc.greater(g["max_tgt"], g["max_idx"])
        dense = pc.and_(
            pc.and_(
                pc.equal(g["n_turns"], pc.add(g["max_idx"], 1)),
                pc.equal(g["min_idx"], 0),
            ),
            pc.equal(
                pc.multiply(g["sum_idx"], 2),
                pc.multiply(g["max_idx"], pc.add(g["max_idx"], 1)),
            ),
        )
        bad_layout = pc.and_(pc.invert(dense), pc.invert(dangling))
        out = g.append_column("bad_layout", bad_layout)
        return out.filter(pc.or_(dangling, bad_layout))

    bad = (
        partials.sort("conv_id")
        .map_batches(combine, batch_format="pyarrow", batch_size=None)
        .take_all()
    )  # small: dangling/invalid conversations are error cases
    gapped = [r["conv_id"] for r in bad if r["bad_layout"]]
    if gapped:
        raise ValueError(
            f"extract_fast requires dense 0-based turn_idx per conversation; "
            f"{len(gapped)} conversation(s) violate it (e.g. {gapped[:3]}). "
            "Use mode='grouped' (extract_grouped) for gapped/unsorted input."
        )
    bad = [r for r in bad if not r["bad_layout"]]
    if not bad:
        return frozenset(), []
    dangling = frozenset(r["conv_id"] for r in bad)
    max_idx = {r["conv_id"]: r["max_idx"] for r in bad}
    # second (tiny) pass: per-occurrence error rows, only in dangling convs
    d_arr = pa.array(sorted(dangling))
    err_refs = transcripts.map_batches(
        lambda b: _find_refs(b.filter(pc.is_in(b["conv_id"], d_arr))),
        batch_format="pyarrow",
    ).take_all()
    err_rows = [
        {
            "conv_id": r["conv_id"],
            "turn_idx": r["turn_idx"],
            "code": S.E_DANGLING_REF,
            "detail": f"#{r['raw']}",  # verbatim lexical, leading zeros kept
        }
        for r in err_refs
        if r["target"] > max_idx[r["conv_id"]] or r["target"] < 0
    ]
    return frozenset(dangling), err_rows


# --------------------------------------------------------------------------
# grouped (flagship) path
# --------------------------------------------------------------------------
def extract_conversation_group(group: pa.Table) -> pa.Table:
    """One conversation -> its triples (+tag), assembled in turn order.

    In-group: sort by turn_idx (stable ordering contract — never block
    order), validate '#N' refs against the group's own turn set, chain
    nextTurn between consecutive-sorted turns, drop the whole conversation
    on a dangling ref (reference ERROR 6/7 semantics at conversation
    granularity)."""
    g = group.sort_by("turn_idx")
    ref_re = re.compile(S.REF_RE)
    turn_set = set(g["turn_idx"].to_pylist())
    for t in g["text"].to_pylist():
        if t:
            for m in ref_re.findall(t):
                if int(m) not in turn_set:
                    return _EMPTY_TRIPLES  # conversation aborted
    ref_targets = {g["conv_id"][0].as_py(): frozenset(turn_set)}
    out = extract_batch_triples(
        g,
        num_re=re.compile(S.NUM_RE),
        ref_re=ref_re,
        roles=frozenset(S.ROLES),
        tools=frozenset(S.TOOLS),
        ref_targets=ref_targets,
        conv_type_idx=min(turn_set),  # sparse layouts may lack turn 0
    )
    # fix nextTurn for sparse turn_idx: arithmetic links were emitted for
    # i-1; replace with true sorted-successor links
    idx = g["turn_idx"].to_pylist()
    cid = g["conv_id"][0].as_py()
    nt_id = S.PRED_ID[S.P_NEXT_TURN]
    out = out.filter(pc.invert(pc.equal(out["pred_id"], nt_id)))
    if len(idx) > 1:
        nt = pa.table(
            {
                "conv_id": pa.array([cid] * (len(idx) - 1), pa.string()),
                "subj": pa.array(
                    [f"{S.W_TURN}{cid}/{idx[k]}" for k in range(len(idx) - 1)],
                    pa.string(),
                ),
                "pred_id": pa.array([nt_id] * (len(idx) - 1), pa.int8()),
                "obj": pa.array(
                    [f"{S.W_TURN}{cid}/{idx[k + 1]}" for k in range(len(idx) - 1)],
                    pa.string(),
                ),
            }
        )
        out = pa.concat_tables([out, nt])
    return out


def conversation_errors_group(group: pa.Table) -> pa.Table:
    """One conversation -> its error rows (role/tool vocab + dangling)."""
    g = group.sort_by("turn_idx")
    base = ExtractErrors()(g)
    ref_re = re.compile(S.REF_RE)
    turn_set = set(g["turn_idx"].to_pylist())
    conv, idx, code, detail = [], [], [], []
    for c, i, t in zip(
        g["conv_id"].to_pylist(), g["turn_idx"].to_pylist(), g["text"].to_pylist()
    ):
        if t:
            for m in ref_re.findall(t):
                if int(m) not in turn_set:
                    conv.append(c); idx.append(i)
                    code.append(S.E_DANGLING_REF); detail.append(f"#{m}")
    extra = pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(idx, pa.int32()),
            "code": pa.array(code, pa.string()),
            "detail": pa.array(detail, pa.string()),
        }
    )
    return pa.concat_tables([base, extra])


# --------------------------------------------------------------------------
# public pipelines
# --------------------------------------------------------------------------
def _sort_key8(arr) -> pa.Array:
    """ORDER-PRESERVING int64 sort key from a utf8 column: the first 8
    UTF-8 BYTES big-endian (zero-padded), sign-flipped into int64.  For
    any strings a < b bytewise, key(a) <= key(b), and key(a) == key(b)
    only when they share an 8-byte prefix — so a range exchange on the
    key plus a local (key, col...) sort yields exactly the global
    bytewise order of the column, while the exchange compares 8-byte
    ints instead of variable-length strings."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    b = pc.binary_slice(pc.cast(arr, pa.binary()), 0, 8)
    zeros = pa.nulls(len(arr), pa.binary()).fill_null(b"\x00" * 8)
    fixed = pc.cast(
        pc.binary_slice(pc.binary_join_element_wise(b, zeros, b""), 0, 8),
        pa.binary(8),
    )
    k = np.frombuffer(
        fixed.buffers()[-1], dtype=">u8", count=len(fixed), offset=fixed.offset * 8
    )
    return pa.array((k.astype(np.uint64) ^ np.uint64(1 << 63)).view(np.int64))


def distinct(
    ds: ray.data.Dataset, cols: list[str], int_prefix_key: bool = False
) -> ray.data.Dataset:
    """Global distinct on `cols` — set semantics, the D2 resourceMap analog
    — via SORT + vectorized adjacent-row dedup, NOT groupby-aggregate.

    Why: Ray's groupby().aggregate() pays per-group Python overhead, and a
    distinct has one group per distinct row (~10x slower here, measured
    47s vs 7s at sf0.1).  A range-partitioned sort assigns equal composite
    keys to the same output block (partition choice depends only on the
    key value vs the sampled boundaries), so a per-block adjacent-equality
    mask is an EXACT global distinct with exactly one shuffle — and the
    output is already sorted by the leading column, so the final
    sort-by-subject materialization comes for free.  Upstream stages
    pre-dedup per batch so the shuffle moves mostly-unique rows.

    Refinement: the DISTRIBUTED sort keys only on cols[0] (cheap single
    short-string compares in the exchange); each block then FULLY sorts
    on all cols locally (Arrow C++ sort of an in-memory block) before the
    adjacency mask.  Exact because two equal rows share cols[0], hence
    land in the same range partition.

    int_prefix_key=True (requires cols[0] to be utf8): the exchange keys
    on the ORDER-PRESERVING int64 first-8-bytes key instead of the string
    itself (_sort_key8) — 8-byte integer compares in the sample/partition
    path, measured ~7%% off the flagship exchange wall.  Global bytewise
    order of cols[0] is preserved exactly: equal keys co-locate (8-byte
    prefix groups never split) and the local sort re-orders within a
    block on (key, cols...) == (cols...)."""
    key_col = "__k8" if int_prefix_key else cols[0]
    if int_prefix_key:
        def add_key(t: pa.Table) -> pa.Table:
            return t.select(cols).append_column("__k8", _sort_key8(t[cols[0]]))

        keyed = ds.map_batches(add_key, batch_format="pyarrow")
    else:
        keyed = ds.select_columns(cols)
    sorted_ds = keyed.sort(key_col)
    local_keys = ([("__k8", "ascending")] if int_prefix_key else []) + [
        (c, "ascending") for c in cols
    ]

    def dedup_sorted(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(cols)
        return _dedup_adjacent(t.sort_by(local_keys).select(cols), cols)

    # batch_size=None => one batch per SORTED BLOCK.  Required for
    # exactness: the adjacent-equality mask must see a whole sorted block
    # (equal keys never span blocks — range partitioning assigns a key by
    # value — but they could span a rebatched sub-window).
    return sorted_ds.map_batches(
        dedup_sorted, batch_format="pyarrow", batch_size=None
    )


def _dedup_adjacent(t: pa.Table, cols: list[str]) -> pa.Table:
    """Adjacent-equality distinct over a table ALREADY sorted on `cols`
    (vectorized: one shifted-equality mask per column, AND-combined)."""
    n = t.num_rows
    if n <= 1:
        return t
    keep = np.ones(n, dtype=bool)
    same = np.ones(n - 1, dtype=bool)
    for c in cols:
        col = t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c]
        eq = pc.equal(col.slice(1), col.slice(0, n - 1))
        same &= pc.fill_null(eq, False).to_numpy(zero_copy_only=False)
    keep[1:] = ~same
    return t.filter(pa.array(keep))


# ---- one-pass custom range shuffle (raw-Ray alternative to distinct) ----
@ray.remote
def _shuffle_sample(tbl: pa.Table, key_col: str, n: int = 256) -> np.ndarray:
    """Evenly-spaced int64 key sample from one block (boundary estimation).

    Empty blocks — including the ZERO-COLUMN empty blocks Ray emits for
    empty input bundles without running the map UDF — return an empty
    sample, which the driver also uses to drop them from the exchange
    (a block is empty iff its sample is: any n>=1 rows sample >=1 key)."""
    if tbl.num_columns == 0 or tbl.num_rows == 0:
        return np.empty(0, np.int64)
    k = _sort_key8(tbl[key_col]).to_numpy(zero_copy_only=False)
    step = max(1, len(k) // n)
    return np.sort(k[::step][:n])


@ray.remote
def _shuffle_split(tbl: pa.Table, bounds: np.ndarray, k: int, cols: list[str]):
    """Partition one block into k key ranges WITHOUT sorting it: bucket ids
    via searchsorted on the static bounds, one stable argsort of small
    ints, then zero-copy slices.  Equal keys never split across buckets
    (side='right'), so duplicates always co-locate."""
    tbl = tbl.select(cols)
    if tbl.num_rows == 0:
        return tuple(tbl for _ in range(k)) if k > 1 else tbl
    key = _sort_key8(tbl[cols[0]]).to_numpy(zero_copy_only=False)
    b = np.searchsorted(bounds, key, side="right")
    order = np.argsort(b, kind="stable")
    t2 = tbl.take(pa.array(order))
    bs = b[order]
    offs = np.searchsorted(bs, np.arange(k + 1))
    out = tuple(t2.slice(offs[j], offs[j + 1] - offs[j]) for j in range(k))
    return out if k > 1 else out[0]


@ray.remote
def _shuffle_merge(cols: list[str], *parts: pa.Table) -> pa.Table:
    """One key range: concat its per-block parts, ONE Arrow multi-column
    sort, vectorized adjacent dedup.  No heap merge, no Python rows."""
    t = pa.concat_tables(parts).combine_chunks()
    if t.num_rows == 0:
        return t
    return _dedup_adjacent(t.sort_by([(c, "ascending") for c in cols]), cols)


def distinct_onepass(
    ds: ray.data.Dataset, cols: list[str], num_partitions: int | None = None
) -> ray.data.Dataset:
    """Global distinct + sort via a custom ONE-PASS range shuffle on raw
    Ray tasks — the scale-path alternative to `distinct` (Ray Data sort).

    Why it can beat the built-in sort here: (1) no map-side per-block
    sort — blocks are range-partitioned by searchsorted against static
    sampled bounds (argsort of small ints, zero-copy slices); (2) the
    exchange moves ONLY `cols` — the int64 sort key is recomputed per
    task instead of shipped (8 B/row lighter than distinct()'s __k8
    column); (3) each reduce is one Arrow concat + one multi-column sort
    + a vectorized adjacency mask — no per-run heap merge.  Output
    blocks are globally range-ordered and internally fully sorted, same
    contract as distinct(int_prefix_key=True).

    Partitioning assumption (documented per SURVEY §2 custom-operator
    rule): duplicates co-locate because equal rows share cols[0], hence
    the same 8-byte prefix key, and searchsorted(side='right') maps equal
    keys to one bucket.  On a multi-node cluster the split/merge tasks
    spread across nodes exactly like Ray Data's sort map/reduce tasks.

    Barrier semantics match ds.sort() (a shuffle is a barrier); lineage
    recompute falls back to Ray object reconstruction of task outputs."""
    from ifctordf_ray import tuning

    # empty inputs return a cols-only empty dataset — SAME schema contract
    # as the non-empty path, which projects to `cols` (ADVICE r4: the old
    # `return ds` / `ds.limit(0)` leaked extra input columns like conv_id
    # into the empty-corpus output schema).
    def _empty_cols_only(schema: pa.Schema | None) -> ray.data.Dataset:
        def typ(c: str):
            # A ZERO-BLOCK pipeline may only expose an upstream fallback
            # schema that predates this op's projection; recover the wire
            # type from the compact-triple contract, else string.
            if schema is not None and schema.get_field_index(c) != -1:
                return schema.field(c).type
            if _EMPTY_TRIPLES.schema.get_field_index(c) != -1:
                return _EMPTY_TRIPLES.schema.field(c).type
            return pa.string()

        return ray.data.from_arrow(
            pa.table({c: pa.array([], type=typ(c)) for c in cols})
        )

    refs = ds.to_arrow_refs()
    if not refs:
        sch = ds.schema()
        return _empty_cols_only(getattr(sch, "base_schema", None))
    first_ref = refs[0]
    cpus = int(ray.cluster_resources().get("CPU", 8))
    cap = getattr(tuning, "_EXEC_CPU_CAP", None)
    slots = min(cpus, cap) if cap else cpus
    k = num_partitions or max(8, 2 * slots)
    samples = ray.get([_shuffle_sample.remote(r, cols[0]) for r in refs])
    # drop empty blocks (empty iff empty sample) — they contribute
    # nothing to a distinct and Ray's zero-column empty blocks would
    # poison the merge concat
    refs = [r for r, s in zip(refs, samples) if s.size]
    samples = [s for s in samples if s.size]
    if not refs:
        return _empty_cols_only(ray.get(first_ref).schema)
    allk = np.sort(np.concatenate(samples)) if samples else np.empty(0, np.int64)
    if allk.size:
        cuts = np.linspace(0, allk.size - 1, k + 1).astype(np.int64)[1:-1]
        bounds = np.unique(allk[cuts])
    else:
        bounds = np.empty(0, np.int64)
    k = len(bounds) + 1
    # raw tasks bypass Ray Data's exec-CPU cap (resource_limits applies to
    # Dataset operators only).  Measured at 32 CPUs / cap 16 (2M-turn
    # flagship, Parquet): num_cpus=1 (32 concurrent) 6.1 s, =2 (16
    # concurrent, cap-equivalent) 6.6 s, =4 7.7 s — unlike the built-in
    # sort (which regresses uncapped), this exchange moves ~8 B/row less
    # and does no map-side sort, so full concurrency wins; default stays
    # Ray's num_cpus=1.  GRAFT_ONEPASS_TASK_CPUS overrides for tuning.
    import os as _os

    env_cpus = _os.environ.get("GRAFT_ONEPASS_TASK_CPUS")
    per_task = {"num_cpus": float(env_cpus)} if env_cpus else {}
    if k == 1:
        parts = [
            [p]
            for p in (
                _shuffle_split.options(**per_task).remote(r, bounds, 1, cols)
                for r in refs
            )
        ]
    else:
        parts = [
            _shuffle_split.options(num_returns=k, **per_task).remote(
                r, bounds, k, cols
            )
            for r in refs
        ]
    merged = [
        _shuffle_merge.options(**per_task).remote(
            cols, *[parts[i][j] for i in range(len(parts))]
        )
        for j in range(k)
    ]
    return ray.data.from_arrow_refs(merged)


# Wire codes whose SUBJECTS can carry globally-duplicated triples.
# Everything conversation-scoped (W_CONV, W_TURN subjects) is emitted by
# exactly ONE transcript row: the conversation rdf:type fires only from
# the conv_type_idx row, every turn-subject triple (type/turnIndex/
# atTime/hasRole/usedTool*/textPresence/hasText/mentions*) comes from
# that turn's own row, and nextTurn comes solely from the successor row
# — so after the per-batch triple-keyed pre-dedup (which collapses
# row-LOCAL multiplicity like a number mentioned twice in one text) the
# conversation-scoped slice is globally distinct BY CONSTRUCTION for
# prevalidated dense input (unique (conv_id, turn_idx) rows).  Only
# content-derived shared-wrapper subjects — text/num/dec/hex wrappers
# and list-chain nodes, each emitted once per MENTIONING row — can
# duplicate across batches and need the global distinct exchange.
# tests/test_fastset.py property-checks this invariant.
SHARED_SUBJ_WIRE_CODES = (S.W_DEC, S.W_HEX, S.W_LISTN, S.W_NUM, S.W_TEXT)


EXTRACT_SLICE_ROWS = 8192


def extract_triples_chunked(batch: pa.Table, dangling_ref=None):
    """Generator form of extract_triples_fn: slices the block into
    EXTRACT_SLICE_ROWS-row chunks in-task and yields one compact-triple
    table per chunk.  Yielding (not concat) lets Ray's output buffer cut
    blocks at target_max_block_size, so a large input block never holds
    its full triple expansion in heap at once."""
    n = batch.num_rows
    if n <= EXTRACT_SLICE_ROWS:
        yield extract_triples_fn(batch, dangling_ref=dangling_ref)
        return
    for off in range(0, n, EXTRACT_SLICE_ROWS):
        yield extract_triples_fn(
            batch.slice(off, EXTRACT_SLICE_ROWS), dangling_ref=dangling_ref
        )


def extract_compact(
    transcripts: ray.data.Dataset,
    prevalidated: bool = False,
    deterministic_batches: bool = False,
) -> ray.data.Dataset:
    """The extract_fast MAP stage without the distinct exchange: compact
    wire-format triples (subj, pred_id, obj), per-batch pre-deduplicated.
    Exposed for consumers that settle set semantics themselves —
    kg.materialize_parquet_fastset routes only the shared-wrapper slice
    (SHARED_SUBJ_WIRE_CODES) through the exchange.

    deterministic_batches=True emits one output table per 8192-row input
    batch (a fixed batch_size instead of the generator form), making
    downstream BATCH BOUNDARIES run-to-run deterministic — required by
    batch-content-addressed consumers (the fastset sink names part files
    by batch content hash; with the generator form Ray's output buffer
    cuts blocks by adaptive size estimation, which varies across runs).
    The triple SET is identical either way."""
    if prevalidated:
        fn_kwargs = {}
    else:
        dangling, _ = resolve_references(transcripts)
        fn_kwargs = {"dangling_ref": ray.put(dangling)}
    # batch_size=None + in-task 8192-row slicing (extract_triples_chunked):
    # one task per upstream block, so the task count follows the block
    # count the read/groupby sized to the session.  A batch_size here
    # becomes the fused chain's min_rows_per_bundle, measured in
    # PRE-expansion rows when fused behind the events->turns derivation
    # (20x row explosion) — at batch_size=8192 the 2M-turn flagship
    # collapsed to 10 tasks / 10 sort partitions regardless of CPUs,
    # capping every downstream all-to-all at 10-way parallelism (the
    # measured scaling killer: 10 tasks pack 2 slots perfectly and leave
    # 8 slots in ragged waves).  The 8192-row UDF granularity itself is
    # kept (slice loop below): it bounds the per-batch group_by/mention
    # loops (65536 was ~1.8x slower) and the in-batch pre-dedup still
    # collapses ~99% of duplicate rows before the exchange.  Set output
    # is invariant to slice boundaries — the global distinct settles it.
    if deterministic_batches:
        return transcripts.map_batches(
            extract_triples_fn,
            fn_kwargs=fn_kwargs,
            batch_format="pyarrow",
            batch_size=EXTRACT_SLICE_ROWS,
        )
    return transcripts.map_batches(
        extract_triples_chunked,
        fn_kwargs=fn_kwargs,
        batch_format="pyarrow",
        batch_size=None,
    )


def extract_fast(
    transcripts: ray.data.Dataset, prevalidated: bool = False
) -> ray.data.Dataset:
    """map_batches-only extraction (no shuffle before the final distinct).

    Requires dense 0-based turn_idx per conversation (nextTurn emitted
    arithmetically); '#N' refs validated via the distributed aggregate.

    Stateless tasks (not an actor pool): the per-batch state is two
    compiled regexes + a broadcast set, cached per worker process — task
    pools reuse warm workers and scale elastically with the cluster.

    prevalidated=True asserts dangling conversations were already dropped
    upstream (e.g. transcripts_from_events(drop_dangling=True), where
    validation is in-group decidable) — the reference-resolution pass and
    its barrier are skipped and the pipeline is fully streaming.

    The global distinct goes through the custom one-pass exchange
    (distinct_onepass) rather than Ray Data's sort: same output contract
    (globally range-ordered, internally sorted blocks — set-equality
    property-tested in tests/test_onepass_shuffle.py), one fewer pass
    over the data (no map-side sort, the 8-byte key is recomputed per
    task instead of shipped), measured 16%/9% faster at 8/2 CPUs and the
    difference between 0.74 and 0.80 two-level scaling efficiency on the
    2M-turn flagship (BASELINE.md round-4 campaign)."""
    triples = extract_compact(transcripts, prevalidated=prevalidated)
    return decode_triples(distinct_onepass(triples, COMPACT_COLS))


def extract_grouped_mapgroups(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Reference implementation of the grouped path via
    groupby(conv_id).map_groups — one Python call PER CONVERSATION.
    Kept as the semantics oracle for extract_grouped; ~5x slower at many
    small conversations."""
    triples = transcripts.groupby("conv_id").map_groups(
        extract_conversation_group, batch_format="pyarrow"
    )
    return decode_triples(distinct(triples, COMPACT_COLS, int_prefix_key=True))


def _extract_sorted_block(t: pa.Table, dedup: bool = False) -> pa.Table:
    """One conv-co-located block (sorted so each conversation is
    contiguous): segmented, mostly-vectorized conversation extraction —
    per-conv work is only the '#N' validation loop over rows that contain
    '#'; everything else is one extract_batch_triples call + vectorized
    successor edges.

    dedup=True additionally collapses in-conversation duplicate turns
    (first-seen by (role, text, tool) content key — resolveDuplicates,
    IfcSpfParser.java:147-165) and redirects '#N' references to a dropped
    turn to its keeper (J2, IfcSpfParser.java:184-187).  '#N' validity is
    judged against the PRE-dedup turn set (a ref to a dropped duplicate
    is valid — it resolves through the redirect map)."""
    if t.num_rows == 0:
        return _EMPTY_TRIPLES
    st = _compiled()
    t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    conv = t["conv_id"].to_pylist()
    idx = t["turn_idx"].to_pylist()
    text = t["text"].to_pylist()
    role = t["role"].to_pylist() if dedup else None
    tool = t["tool"].to_pylist() if dedup else None
    n = len(conv)
    ref_re = st["ref_re"]
    keep = np.ones(n, dtype=bool)
    conv_type = np.zeros(n, dtype=bool)
    redirect: dict = {} if dedup else None
    s = 0
    while s < n:
        e = s + 1
        while e < n and conv[e] == conv[s]:
            e += 1
        conv_type[s] = True
        idx_set = None
        ok = True
        for i in range(s, e):
            tx = text[i]
            if tx and "#" in tx:
                if idx_set is None:
                    idx_set = set(idx[s:e])
                for m in ref_re.findall(tx):
                    if int(m) not in idx_set:
                        ok = False
                        break
                if not ok:
                    break
        if not ok:
            keep[s:e] = False
            conv_type[s] = False
        elif dedup:
            seen: dict = {}
            cid = conv[s]
            for i in range(s, e):
                key = (role[i], text[i], tool[i])
                k = seen.get(key)
                if k is None:
                    seen[key] = idx[i]
                else:
                    keep[i] = False
                    redirect[(cid, idx[i])] = k
        s = e
    sub = t.filter(pa.array(keep)) if not keep.all() else t
    if sub.num_rows == 0:
        return _EMPTY_TRIPLES
    ctm = conv_type[keep]
    out = extract_batch_triples(
        sub,
        num_re=st["num_re"],
        ref_re=ref_re,
        roles=st["roles"],
        tools=st["tools"],
        ref_targets=None,  # all surviving refs valid by construction
        conv_type_mask=pa.array(ctm),
        ref_redirect=redirect or None,
    )
    # replace arithmetic nextTurn edges with sorted-successor edges —
    # fully vectorized: adjacent rows of the same conversation
    nt_id = S.PRED_ID[S.P_NEXT_TURN]
    out = out.filter(pc.invert(pc.equal(out["pred_id"], nt_id)))
    if sub.num_rows > 1:
        sconv = sub["conv_id"].combine_chunks() if isinstance(sub["conv_id"], pa.ChunkedArray) else sub["conv_id"]
        sidx = pc.cast(sub["turn_idx"], pa.string())
        t_iri = _str_concat(S.W_TURN, sconv, "/", sidx)
        m = sub.num_rows
        same = pc.equal(sconv.slice(1), sconv.slice(0, m - 1))
        nt = pa.table(
            {
                "conv_id": sconv.slice(0, m - 1),
                "subj": t_iri.slice(0, m - 1),
                "pred_id": pa.nulls(m - 1, pa.int8()).fill_null(nt_id),
                "obj": t_iri.slice(1),
            }
        ).filter(same)
        out = pa.concat_tables([out, nt])
    return out


def extract_grouped(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Flagship grouped path: conversation assembly + extraction for ANY
    turn_idx layout.  Physical plan: range-sort on conv_id (equal keys
    co-locate in one block — the same partitioning argument distinct()
    uses) + per-block segmented vectorized extraction — one Python task
    per BLOCK instead of one call per conversation (~5x faster than
    map_groups at many small conversations, identical output)."""
    triples = transcripts.sort("conv_id").map_batches(
        _extract_sorted_block, batch_format="pyarrow", batch_size=None
    )
    return decode_triples(distinct(triples, COMPACT_COLS, int_prefix_key=True))


def extract_deduped(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Grouped extraction WITH in-conversation turn dedup + reference
    redirect (J2 wired into extraction): duplicate turns (same
    role/text/tool, first-seen wins) emit no triples, and every
    mentionsTurn edge that targeted a dropped turn points at its keeper —
    the reference's resolveDuplicates + listOfDuplicateLineEntries
    consultation (IfcSpfParser.java:147-165, 184-187) as ONE pipeline.
    Same physical plan as extract_grouped (sort + segmented blocks)."""
    triples = transcripts.sort("conv_id").map_batches(
        lambda b: _extract_sorted_block(b, dedup=True),
        batch_format="pyarrow",
        batch_size=None,
    )
    return decode_triples(distinct(triples, COMPACT_COLS, int_prefix_key=True))


# --------------------------------------------------------------------------
# salted-key skew path (north-rule: "skewed conversation lengths via
# explicit repartitioning and salted keys"; SURVEY.md §7.3 "very wide
# records")
# --------------------------------------------------------------------------
def _salt_batch(batch: pa.Table, chunk_size: int) -> pa.Table:
    """Add salt = turn_idx // chunk_size: a 10^5-turn conversation becomes
    many bounded (conv_id, salt) groups instead of one giant group."""
    salt = pc.cast(
        pc.floor(pc.divide(pc.cast(batch["turn_idx"], pa.float64()), chunk_size)),
        pa.int32(),
    )
    return batch.append_column("salt", salt)


def _extract_chunk_group(group: pa.Table) -> pa.Table:
    """One (conv_id, salt) chunk -> its triples.  Like the grouped path but
    per chunk: nextTurn links only WITHIN the chunk; cross-chunk stitch
    edges and the conversation rdf:type come from the follow-up stage.
    Dangling validation is NOT possible per chunk — the salted path
    requires prevalidated input (dense turn_idx, refs resolved upstream),
    which the assembly derivation guarantees."""
    g = group.drop_columns(["salt"]).sort_by("turn_idx")
    idx = g["turn_idx"].to_pylist()
    out = extract_batch_triples(
        g,
        num_re=re.compile(S.NUM_RE),
        ref_re=re.compile(S.REF_RE),
        roles=frozenset(S.ROLES),
        tools=frozenset(S.TOOLS),
        ref_targets=None,
        # conv type only from the true first turn (idx 0); other chunks
        # emit none (mask matches nothing)
        conv_type_idx=0,
    )
    # replace arithmetic nextTurn links with in-chunk sorted-successor
    # links (identical for dense idx; boundary links added by stitching)
    nt_id = S.PRED_ID[S.P_NEXT_TURN]
    out = out.filter(pc.invert(pc.equal(out["pred_id"], nt_id)))
    cid = g["conv_id"][0].as_py()
    if len(idx) > 1:
        nt = pa.table(
            {
                "conv_id": pa.array([cid] * (len(idx) - 1), pa.string()),
                "subj": pa.array(
                    [f"{S.W_TURN}{cid}/{idx[k]}" for k in range(len(idx) - 1)],
                    pa.string(),
                ),
                "pred_id": pa.array([nt_id] * (len(idx) - 1), pa.int8()),
                "obj": pa.array(
                    [f"{S.W_TURN}{cid}/{idx[k + 1]}" for k in range(len(idx) - 1)],
                    pa.string(),
                ),
            }
        )
        out = pa.concat_tables([out, nt])
    return out


def extract_salted(
    transcripts: ray.data.Dataset, chunk_size: int = 1024
) -> ray.data.Dataset:
    """Skew-proof grouped extraction: pre-split giant conversations with a
    salted key (conv_id, turn_idx // chunk_size), extract each bounded
    chunk independently, then stitch the cross-chunk nextTurn edges with a
    small per-chunk boundary aggregate (min/max turn_idx per (conv, salt)
    -> one edge per adjacent chunk pair).

    Output is identical to extract_grouped for dense prevalidated input
    (asserted by tests/test_skew.py).  The boundary stitch is fully
    distributed: per-block (conv, salt) min/max partials are range-sorted
    on conv_id — co-locating each conversation's chunk boundaries in one
    block (the distinct() partitioning argument) — and the cross-chunk
    edges are emitted per block; nothing is collected to the driver.
    """
    salted = transcripts.map_batches(
        _salt_batch, fn_kwargs={"chunk_size": chunk_size}, batch_format="pyarrow"
    )
    triples = salted.groupby(["conv_id", "salt"]).map_groups(
        _extract_chunk_group, batch_format="pyarrow"
    )

    # boundary stitch: per (conv, salt) min/max turn_idx, vectorized partials
    def bounds(b: pa.Table) -> pa.Table:
        t = b.select(["conv_id", "salt", "turn_idx"])
        g = t.group_by(["conv_id", "salt"]).aggregate(
            [("turn_idx", "min"), ("turn_idx", "max")]
        )
        return g.rename_columns(["conv_id", "salt", "lo", "hi"])

    nt_id = S.PRED_ID[S.P_NEXT_TURN]

    def stitch_block(t: pa.Table) -> pa.Table:
        """One conv-co-located block of boundary partials -> cross-chunk
        nextTurn edges (combine partials, then adjacent-chunk pairs)."""
        if t.num_rows == 0:
            return _EMPTY_TRIPLES
        g = t.group_by(["conv_id", "salt"]).aggregate(
            [("lo", "min"), ("hi", "max")]
        ).rename_columns(["conv_id", "salt", "lo", "hi"])
        g = g.sort_by([("conv_id", "ascending"), ("salt", "ascending")])
        n = g.num_rows
        if n < 2:
            return _EMPTY_TRIPLES
        conv = g["conv_id"].combine_chunks() if isinstance(g["conv_id"], pa.ChunkedArray) else g["conv_id"]
        same = pc.equal(conv.slice(1), conv.slice(0, n - 1))
        hi_iri = _str_concat(
            S.W_TURN, conv, "/", pc.cast(g["hi"], pa.string())
        )
        lo_iri = _str_concat(
            S.W_TURN, conv, "/", pc.cast(g["lo"], pa.string())
        )
        return pa.table(
            {
                "conv_id": conv.slice(0, n - 1),
                "subj": hi_iri.slice(0, n - 1),
                "pred_id": pa.nulls(n - 1, pa.int8()).fill_null(nt_id),
                "obj": lo_iri.slice(1),
            }
        ).filter(same)

    stitch = (
        salted.map_batches(bounds, batch_format="pyarrow")
        .sort("conv_id")
        .map_batches(stitch_block, batch_format="pyarrow", batch_size=None)
    )
    return decode_triples(distinct(triples.union(stitch), COMPACT_COLS, int_prefix_key=True))


def extract_errors(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Errors side-output (fast path): vocab violations via map_batches +
    dangling refs from the distributed aggregate."""
    _, dangling_errs = resolve_references(transcripts)
    errs = transcripts.map_batches(ExtractErrors(), batch_format="pyarrow")
    if dangling_errs:
        extra = pa.table(
            {
                "conv_id": pa.array([e["conv_id"] for e in dangling_errs], pa.string()),
                "turn_idx": pa.array([e["turn_idx"] for e in dangling_errs], pa.int32()),
                "code": pa.array([e["code"] for e in dangling_errs], pa.string()),
                "detail": pa.array([e["detail"] for e in dangling_errs], pa.string()),
            }
        )
        errs = errs.union(ray.data.from_arrow(extra))
    return errs
