"""Generated DuckDB oracle SQL for the KG pipelines.

Built from the same constants in ifctordf_ray.schema as the Ray pipeline
and the pure-Python oracle — one spec, three executors.  The driver runs
these against the registered parquet views (`events`, ...) side by side
with the Ray pipelines and hash-compares results (CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from ifctordf_ray import schema as S
from ifctordf_ray.sources.transcripts import transcripts_from_events_sql


def _roles_in() -> str:
    return ", ".join(f"'{r}'" for r in S.ROLES)


def _tools_in() -> str:
    return ", ".join(f"'{t}'" for t in S.TOOLS)


def transcripts_cte(where: str | None = None, base: str | None = None) -> str:
    base = base or transcripts_from_events_sql()
    if where:
        return f"transcripts AS (SELECT * FROM ({base}) WHERE {where})"
    return f"transcripts AS ({base})"


# regex literals escaped for embedding in single-quoted SQL strings
_OUTER_RE_SQL = S.OUTER_LIST_RE.replace("'", "''")
_INNER_RE_SQL = S.INNER_LIST_RE.replace("'", "''")
_HEX_RE_SQL = S.HEX_RE.replace("'", "''")


def kg_transcripts_sql() -> str:
    """The derived transcript table itself (conversation assembly check —
    per-turn text equality under stable turn ordering)."""
    return f"WITH {transcripts_cte()} SELECT * FROM transcripts"


def _live_turn_cte(where: str | None = None, base: str | None = None) -> str:
    """CTEs: transcripts -> refs -> dangling -> live -> turn (adds IRIs)."""
    return f"""{transcripts_cte(where, base)},
refs AS (
    SELECT t.conv_id, t.turn_idx, u.m AS raw, CAST(u.m AS BIGINT) AS target
    FROM transcripts t, UNNEST(regexp_extract_all(t.text, '{S.REF_RE}', 1)) AS u(m)
),
dangling AS (
    SELECT DISTINCT r.conv_id FROM refs r
    WHERE NOT EXISTS (SELECT 1 FROM transcripts t2
                      WHERE t2.conv_id = r.conv_id AND t2.turn_idx = r.target)
),
live AS (
    SELECT * FROM transcripts
    WHERE conv_id NOT IN (SELECT conv_id FROM dangling)
),
turn AS (
    SELECT *,
           'inst:conv/' || conv_id AS c_iri,
           'inst:turn/' || conv_id || '/' || CAST(turn_idx AS VARCHAR) AS t_iri,
           coalesce(text, '') AS txt
    FROM live
)"""


def _turn_triples_unions(mentions_turn_select: str) -> str:
    """The UNION ALL body shared by kg_triples_sql and the deduped
    variant; `mentions_turn_select` supplies the mentionsTurn arm (the
    deduped variant redirects targets through the redirect CTE)."""
    return f"""    SELECT c_iri AS subj, '{S.RDF_TYPE}' AS pred,
           '{S.CLS_CONVERSATION}' AS obj, 'uri' AS obj_kind FROM turn
    UNION ALL
    SELECT t_iri, '{S.RDF_TYPE}', '{S.CLS_TURN}', 'uri' FROM turn
    UNION ALL
    SELECT c_iri, '{S.P_HAS_TURN}', t_iri, 'uri' FROM turn
    UNION ALL
    SELECT t_iri, '{S.P_TURN_INDEX}',
           CAST(turn_idx AS VARCHAR) || '^^{S.XSD_INTEGER}', 'literal' FROM turn
    UNION ALL
    SELECT t_iri, '{S.P_AT_TIME}',
           strftime(ts, '{S.TS_FORMAT}') || '^^{S.XSD_DATETIME}', 'literal' FROM turn
    UNION ALL
    SELECT t_iri, '{S.P_HAS_ROLE}', 'ont:role/' || role, 'uri' FROM turn
    WHERE role IN ({_roles_in()})
    UNION ALL
    SELECT t_iri, '{S.P_USED_TOOL}', 'ont:tool/' || tool, 'uri' FROM turn
    WHERE tool IN ({_tools_in()})
    UNION ALL
    SELECT t_iri, '{S.P_TOOL_FLAG}',
           CASE WHEN tool IS NOT NULL THEN 'true' ELSE 'false' END
           || '^^{S.XSD_BOOLEAN}', 'literal' FROM turn
    UNION ALL
    SELECT t_iri, '{S.P_TEXT_PRESENCE}',
           'ont:logical/' || CASE WHEN text IS NULL THEN 'UNKNOWN'
                                  WHEN text = '' THEN 'FALSE'
                                  ELSE 'TRUE' END, 'uri' FROM turn
    UNION ALL
    SELECT t_iri, '{S.P_HAS_TEXT}', 'inst:text/' || md5(txt), 'uri' FROM turn
    UNION ALL
    SELECT 'inst:text/' || md5(txt), '{S.P_HAS_STRING}',
           txt || '^^{S.XSD_STRING}', 'literal' FROM turn
    UNION ALL
    SELECT prev_iri, '{S.P_NEXT_TURN}', t_iri, 'uri' FROM (
        SELECT t_iri, lag(t_iri) OVER (
            PARTITION BY conv_id ORDER BY turn_idx) AS prev_iri FROM turn
    ) WHERE prev_iri IS NOT NULL
    UNION ALL
    SELECT t_iri, '{S.P_MENTIONS_NUMBER}', 'inst:num/' || u.m, 'uri'
    FROM turn, UNNEST(regexp_extract_all(txt, '{S.NUM_RE}')) AS u(m)
    UNION ALL
    SELECT 'inst:num/' || u.m, '{S.P_HAS_INTEGER}',
           u.m || '^^{S.XSD_INTEGER}', 'literal'
    FROM turn, UNNEST(regexp_extract_all(txt, '{S.NUM_RE}')) AS u(m)
    UNION ALL
    SELECT t_iri, '{S.P_MENTIONS_DECIMAL}', 'inst:dec/' || u.m, 'uri'
    FROM turn, UNNEST(regexp_extract_all(txt, '{S.DEC_RE}')) AS u(m)
    UNION ALL
    SELECT 'inst:dec/' || u.m, '{S.P_HAS_DOUBLE}',
           u.m || '^^{S.XSD_DOUBLE}', 'literal'
    FROM turn, UNNEST(regexp_extract_all(txt, '{S.DEC_RE}')) AS u(m)
    UNION ALL
    SELECT t_iri, '{S.P_MENTIONS_HEX}', 'inst:hex/' || u.m, 'uri'
    FROM turn, UNNEST(regexp_extract_all(txt, '{_HEX_RE_SQL}', 1)) AS u(m)
    WHERE len(u.m) % 2 = 0
    UNION ALL
    SELECT 'inst:hex/' || u.m, '{S.P_HAS_HEXBINARY}',
           u.m || '^^{S.XSD_HEXBINARY}', 'literal'
    FROM turn, UNNEST(regexp_extract_all(txt, '{_HEX_RE_SQL}', 1)) AS u(m)
    WHERE len(u.m) % 2 = 0
    UNION ALL
    -- two-level structured list mentions (T13/_List_List analog)
    SELECT t_iri, '{S.P_MENTIONS_LIST}',
           'inst:listn/' || md5(u.m) || '/0', 'uri'
    FROM turn, UNNEST(regexp_extract_all(txt, '{_OUTER_RE_SQL}')) AS u(m)
    UNION ALL
    SELECT 'inst:listn/' || md5(o.olex) || '/' || CAST(p.i AS VARCHAR),
           '{S.P_HAS_CONTENTS}',
           'inst:listn/' || md5(o.inners[p.i + 1]) || '/0', 'uri'
    FROM (
        SELECT u.m AS olex,
               regexp_extract_all(u.m, '{_INNER_RE_SQL}', 1) AS inners
        FROM turn, UNNEST(regexp_extract_all(txt, '{_OUTER_RE_SQL}')) AS u(m)
    ) o, UNNEST(range(len(o.inners))) AS p(i)
    UNION ALL
    SELECT 'inst:listn/' || md5(o.olex) || '/' || CAST(p.i AS VARCHAR),
           '{S.P_HAS_NEXT}',
           'inst:listn/' || md5(o.olex) || '/' || CAST(p.i + 1 AS VARCHAR), 'uri'
    FROM (
        SELECT u.m AS olex,
               regexp_extract_all(u.m, '{_INNER_RE_SQL}', 1) AS inners
        FROM turn, UNNEST(regexp_extract_all(txt, '{_OUTER_RE_SQL}')) AS u(m)
    ) o, UNNEST(range(len(o.inners) - 1)) AS p(i)
    UNION ALL
    SELECT 'inst:listn/' || md5(q.ilex) || '/' || CAST(p.i AS VARCHAR),
           '{S.P_HAS_CONTENTS}',
           'inst:num/' || q.cells[p.i + 1], 'uri'
    FROM (
        SELECT u2.m AS ilex, str_split(u2.m, ',') AS cells
        FROM turn, UNNEST(regexp_extract_all(txt, '{_OUTER_RE_SQL}')) AS u(m),
             UNNEST(regexp_extract_all(u.m, '{_INNER_RE_SQL}', 1)) AS u2(m)
    ) q, UNNEST(range(len(q.cells))) AS p(i)
    UNION ALL
    SELECT 'inst:listn/' || md5(q.ilex) || '/' || CAST(p.i AS VARCHAR),
           '{S.P_HAS_NEXT}',
           'inst:listn/' || md5(q.ilex) || '/' || CAST(p.i + 1 AS VARCHAR), 'uri'
    FROM (
        SELECT u2.m AS ilex, str_split(u2.m, ',') AS cells
        FROM turn, UNNEST(regexp_extract_all(txt, '{_OUTER_RE_SQL}')) AS u(m),
             UNNEST(regexp_extract_all(u.m, '{_INNER_RE_SQL}', 1)) AS u2(m)
    ) q, UNNEST(range(len(q.cells) - 1)) AS p(i)
    UNION ALL
{mentions_turn_select}"""


def kg_triples_sql(where: str | None = None, base: str | None = None) -> str:
    """The full deduplicated triple set (spec in stages/extract.py).
    `where` filters the derived transcript table (partition predicate);
    `base` substitutes the transcript derivation itself."""
    mentions = f"""    SELECT t_iri, '{S.P_MENTIONS_TURN}',
           'inst:turn/' || conv_id || '/' || CAST(CAST(u.m AS BIGINT) AS VARCHAR),
           'uri'
    FROM turn, UNNEST(regexp_extract_all(txt, '{S.REF_RE}', 1)) AS u(m)"""
    return f"""WITH {_live_turn_cte(where, base)}
SELECT DISTINCT subj, pred, obj, obj_kind FROM (
{_turn_triples_unions(mentions)}
)"""


def kg_list_members_sql() -> str:
    """Ordered list recovery over the list-injected corpus (the
    kg.list_members / T7-T10-inverse gate row): the full triple set is
    built from the inject_list_mentions derivation, then every
    hasContents row unfolds to (head, pos, member, member_kind, linked),
    `linked` checking the pos-1 hasNext edge exists in the data."""
    from ifctordf_ray.sources.transcripts import inject_list_mentions_sql

    node_re = "^inst:listn/([0-9a-f]+)/([0-9]+)$"
    return f"""WITH trip AS ({kg_triples_sql(base=inject_list_mentions_sql())}),
c AS (
    SELECT regexp_extract(subj, '{node_re}', 1) AS chain,
           CAST(regexp_extract(subj, '{node_re}', 2) AS BIGINT) AS pos,
           obj AS member, obj_kind AS member_kind
    FROM trip
    WHERE pred = '{S.P_HAS_CONTENTS}' AND regexp_matches(subj, '{node_re}')
),
nx AS (
    SELECT regexp_extract(subj, '{node_re}', 1) AS chain,
           CAST(regexp_extract(subj, '{node_re}', 2) AS BIGINT) AS pos
    FROM trip
    WHERE pred = '{S.P_HAS_NEXT}' AND regexp_matches(subj, '{node_re}')
)
SELECT 'inst:listn/' || c.chain || '/0' AS head, c.pos, c.member,
       c.member_kind,
       (c.pos = 0 OR EXISTS (
           SELECT 1 FROM nx
           WHERE nx.chain = c.chain AND nx.pos = c.pos - 1)) AS linked
FROM c"""


def kg_triples_deduped_sql() -> str:
    """Triples after in-conversation turn dedup + reference redirect (J2):
    duplicate turns (same role/text/tool, first-seen wins) are dropped;
    '#N' refs to a dropped turn resolve to its keeper — validity is judged
    against the PRE-dedup turn set (IfcSpfParser.java:147-165, 184-187)."""
    mentions = f"""    SELECT tr.t_iri, '{S.P_MENTIONS_TURN}',
           'inst:turn/' || tr.conv_id || '/' ||
           CAST(coalesce(r.keep_idx, tr.target) AS VARCHAR), 'uri'
    FROM turn_refs tr
    LEFT JOIN redirect r
      ON r.conv_id = tr.conv_id AND r.dup_idx = tr.target"""
    return f"""WITH {transcripts_cte()},
refs AS (
    SELECT t.conv_id, t.turn_idx, u.m AS raw, CAST(u.m AS BIGINT) AS target
    FROM transcripts t, UNNEST(regexp_extract_all(t.text, '{S.REF_RE}', 1)) AS u(m)
),
dangling AS (
    SELECT DISTINCT r.conv_id FROM refs r
    WHERE NOT EXISTS (SELECT 1 FROM transcripts t2
                      WHERE t2.conv_id = r.conv_id AND t2.turn_idx = r.target)
),
live AS (
    SELECT * FROM transcripts
    WHERE conv_id NOT IN (SELECT conv_id FROM dangling)
),
keyed AS (
    SELECT *, min(turn_idx) OVER (
        PARTITION BY conv_id, role, coalesce(text, chr(1)),
                     coalesce(tool, chr(1))) AS keep_idx
    FROM live
),
redirect AS (
    SELECT conv_id, CAST(turn_idx AS BIGINT) AS dup_idx,
           CAST(keep_idx AS BIGINT) AS keep_idx
    FROM keyed WHERE turn_idx != keep_idx
),
turn AS (
    SELECT *,
           'inst:conv/' || conv_id AS c_iri,
           'inst:turn/' || conv_id || '/' || CAST(turn_idx AS VARCHAR) AS t_iri,
           coalesce(text, '') AS txt
    FROM keyed WHERE turn_idx = keep_idx
),
turn_refs AS (
    SELECT tn.conv_id, tn.t_iri, CAST(u.m AS BIGINT) AS target
    FROM turn tn, UNNEST(regexp_extract_all(tn.txt, '{S.REF_RE}', 1)) AS u(m)
)
SELECT DISTINCT subj, pred, obj, obj_kind FROM (
{_turn_triples_unions(mentions)}
)"""


def kg_errors_sql() -> str:
    """Errors side-output: vocab violations + dangling refs."""
    return f"""WITH {transcripts_cte()},
refs AS (
    SELECT t.conv_id, t.turn_idx, u.m AS raw, CAST(u.m AS BIGINT) AS target
    FROM transcripts t, UNNEST(regexp_extract_all(t.text, '{S.REF_RE}', 1)) AS u(m)
)
SELECT conv_id, turn_idx, code, detail FROM (
    SELECT conv_id, turn_idx, '{S.E_BAD_ROLE}' AS code,
           coalesce(role, '') AS detail
    FROM transcripts WHERE role IS NULL OR role NOT IN ({_roles_in()})
    UNION ALL
    SELECT conv_id, turn_idx, '{S.E_BAD_TOOL}', tool
    FROM transcripts WHERE tool IS NOT NULL AND tool NOT IN ({_tools_in()})
    UNION ALL
    SELECT r.conv_id, r.turn_idx, '{S.E_DANGLING_REF}', '#' || r.raw
    FROM refs r
    WHERE NOT EXISTS (SELECT 1 FROM transcripts t2
                      WHERE t2.conv_id = r.conv_id AND t2.turn_idx = r.target)
)"""


def kg_canonical_mentions_sql() -> str:
    """Canonical-ID assignment on surface-form keys via GROUP BY —
    first-seen-wins (the D3 propertyResourceMap analog)."""
    return f"""WITH {transcripts_cte()},
m AS (
    SELECT u.m AS surface_key,
           printf('%s#%010d', conv_id, turn_idx) AS sk
    FROM transcripts, UNNEST(regexp_extract_all(coalesce(text, ''), '{S.NUM_RE}')) AS u(m)
)
SELECT surface_key,
       'inst:num/' || surface_key AS canonical_id,
       min(sk) AS first_seen,
       count(*) AS n_mentions
FROM m GROUP BY surface_key"""


def kg_vocab_dispatch_sql() -> str:
    """Multi-version vocabulary dispatch (getExpressSchema analog): the
    md5-parity version tag shared verbatim with tag_vocab_by_conv, then
    role/tool triple arms whose membership test is the composite
    'version#value' key against the full registry — exactly the
    vectorized is_in the Ray extraction runs."""
    role_keys = ", ".join(f"'{k}'" for k in S.VOCAB_ROLE_KEYS)
    tool_keys = ", ".join(f"'{k}'" for k in S.VOCAB_TOOL_KEYS)
    return f"""WITH {_live_turn_cte()},
v AS (
    SELECT *, CASE WHEN md5(conv_id) >= '8' THEN 'v2' ELSE 'v1' END AS vocab_ver
    FROM turn
)
SELECT DISTINCT subj, pred, obj, obj_kind FROM (
    SELECT t_iri AS subj, '{S.P_HAS_ROLE}' AS pred,
           'ont:role/' || role AS obj, 'uri' AS obj_kind
    FROM v WHERE vocab_ver || '#' || coalesce(role, '') IN ({role_keys})
    UNION ALL
    SELECT t_iri, '{S.P_USED_TOOL}', 'ont:tool/' || tool, 'uri'
    FROM v WHERE tool IS NOT NULL
      AND vocab_ver || '#' || tool IN ({tool_keys})
)"""


def kg_delta_triples_sql() -> str:
    """Incremental construction: triples contributed ONLY by the 'new'
    conversation partition (md5-parity split, the same deterministic
    dataset-level tag as the vocab dispatch) — new-partition triples
    EXCEPT the base graph's.  Set semantics make the delta well-defined:
    a triple already emitted by some base conversation (shared
    content-derived wrapper, e.g. a number mentioned in both halves) is
    NOT re-emitted."""
    new = kg_triples_sql(where="md5(conv_id) >= '8'")
    base = kg_triples_sql(where="md5(conv_id) < '8'")
    return f"SELECT * FROM ({new}) EXCEPT SELECT * FROM ({base})"


def kg_inferred_types_sql() -> str:
    """RDFS-entailed rdf:type set: asserted type triples plus one triple
    per transitive superclass (recursive closure over the VALUES TBox —
    the same schema.SUBCLASS_OF constant the Ray pass precomputes)."""
    vals = ", ".join(f"('{c}', '{s}')" for c, s in S.SUBCLASS_OF)
    return f"""WITH RECURSIVE t AS ({kg_triples_sql()}),
sub(c, s) AS (VALUES {vals}),
closure(c, s) AS (
    SELECT c, s FROM sub
    UNION
    SELECT closure.c, sub.s FROM closure JOIN sub ON closure.s = sub.c
),
types AS (SELECT subj, obj FROM t WHERE pred = '{S.RDF_TYPE}')
SELECT DISTINCT subj, '{S.RDF_TYPE}' AS pred, obj, 'uri' AS obj_kind FROM (
    SELECT subj, obj FROM types
    UNION ALL
    SELECT ty.subj, cl.s AS obj FROM types ty JOIN closure cl ON ty.obj = cl.c
)"""


def kg_star_pattern_sql(role: str = "tool", tool: str = "logger") -> str:
    """2-arm star pattern: subjects with BOTH hasRole role/X and usedTool
    tool/Y.  Distinct triples guarantee <= 1 row per (subj, arm), so
    HAVING count(*) = 2 is exactly the star match."""
    return f"""WITH t AS ({kg_triples_sql()})
SELECT subj FROM t
WHERE (pred = '{S.P_HAS_ROLE}' AND obj = 'ont:role/{role}')
   OR (pred = '{S.P_USED_TOOL}' AND obj = 'ont:tool/{tool}')
GROUP BY subj HAVING count(*) = 2"""


def kg_void_stats_sql() -> str:
    """VoID statistics: the same (stat, k) observation-pair construction
    as the Ray pass (chr(31) joint), count(DISTINCT k) per stat."""
    j = " || chr(31) || "
    return f"""WITH t AS ({kg_triples_sql()}),
pairs AS (
    SELECT 'n_triples' AS stat, subj{j}pred{j}obj{j}obj_kind AS k FROM t
    UNION ALL SELECT 'n_distinct_subjects', subj FROM t
    UNION ALL SELECT 'n_properties', pred FROM t
    UNION ALL SELECT 'n_distinct_uri_objects', obj FROM t WHERE obj_kind = 'uri'
    UNION ALL SELECT 'n_classes', obj FROM t WHERE pred = '{S.RDF_TYPE}'
    UNION ALL SELECT 'class_instances:' || obj, subj FROM t WHERE pred = '{S.RDF_TYPE}'
)
SELECT stat, CAST(count(DISTINCT k) AS BIGINT) AS n FROM pairs GROUP BY stat"""


def kg_property_paths_sql(max_hops: int = 3) -> str:
    """nextTurn{{1,max_hops}} reachability: hop k is one self-join of
    hop k-1 against the edge set (chains are simple paths, so UNION ALL
    is already set-valued)."""
    ctes = [
        f"e AS (SELECT subj AS src, obj AS dst FROM t WHERE pred = '{S.P_NEXT_TURN}')",
        "p1 AS (SELECT src, dst FROM e)",
    ]
    sels = ["SELECT src, dst, CAST(1 AS BIGINT) AS dist FROM p1"]
    for h in range(2, max_hops + 1):
        ctes.append(
            f"p{h} AS (SELECT p.src, e.dst FROM p{h - 1} p JOIN e ON p.dst = e.src)"
        )
        sels.append(f"SELECT src, dst, CAST({h} AS BIGINT) AS dist FROM p{h}")
    return (
        f"WITH t AS ({kg_triples_sql()}),\n"
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL ".join(sels)
    )


def kg_shape_violations_sql() -> str:
    """SHACL-style cardinality report: max violations via a per-
    (focus, pred) count joined to the VALUES shape table; min violations
    via NOT EXISTS over ont:Turn targets."""
    max_shapes = [(p, mx) for p, _mn, mx in S.SHAPES if mx is not None]
    min_preds = [p for p, mn, _mx in S.SHAPES if mn >= 1]
    vals = ", ".join(f"('{p}', {mx})" for p, mx in max_shapes)
    inlist = ", ".join(f"'{p}'" for p, _ in max_shapes)
    min_sels = [
        f"""SELECT f.focus, '{req}' AS pred, CAST(0 AS BIGINT) AS n,
       CAST(1 AS BIGINT) AS allowed, 'min' AS kind
FROM turns f WHERE NOT EXISTS (
    SELECT 1 FROM t WHERE t.pred = '{req}' AND t.subj = f.focus)"""
        for req in min_preds
    ]
    return f"""WITH t AS ({kg_triples_sql()}),
shapes(pred, max_count) AS (VALUES {vals}),
counts AS (
    SELECT subj AS focus, pred, CAST(count(*) AS BIGINT) AS n
    FROM t WHERE pred IN ({inlist}) GROUP BY subj, pred
),
turns AS (SELECT subj AS focus FROM t
          WHERE pred = '{S.RDF_TYPE}' AND obj = '{S.CLS_TURN}')
SELECT c.focus, c.pred, c.n, CAST(s.max_count AS BIGINT) AS allowed,
       'max' AS kind
FROM counts c JOIN shapes s ON c.pred = s.pred WHERE c.n > s.max_count
UNION ALL {' UNION ALL '.join(min_sels)}"""


def kg_describe_sql() -> str:
    """DESCRIBE serialization: bytewise-sorted '; '-joined items, quoted
    literals — identical rendering to the Ray AggregateFn."""
    return f"""WITH t AS ({kg_triples_sql()}),
items AS (
    SELECT subj,
           pred || ' ' || CASE WHEN obj_kind = 'uri' THEN obj
                               ELSE '"' || obj || '"' END AS item
    FROM t
)
SELECT subj, string_agg(item, '; ' ORDER BY item) AS description
FROM items GROUP BY subj"""


def kg_predicate_cooccurrence_sql() -> str:
    """Predicate co-occurrence: distinct (subj, pred) self-joined on
    subj with pred_a < pred_b (bytewise — matches the Ray side's
    lex-sorted bit order)."""
    return f"""WITH t AS ({kg_triples_sql()}),
sp AS (SELECT DISTINCT subj, pred FROM t)
SELECT a.pred AS pred_a, b.pred AS pred_b,
       CAST(count(*) AS BIGINT) AS n_subjects
FROM sp a JOIN sp b ON a.subj = b.subj AND a.pred < b.pred
GROUP BY a.pred, b.pred"""


def kg_named_graphs_sql() -> str:
    """Named-graph stats: conversation-scoped subjects map to their conv
    graph (greedy turn split — conv ids may contain '/'); everything
    else is the shared default graph."""
    return f"""WITH t AS ({kg_triples_sql()})
SELECT CASE WHEN subj LIKE 'inst:conv/%' THEN substr(subj, 11)
            WHEN subj LIKE 'inst:turn/%'
                 THEN regexp_extract(subj, '^inst:turn/(.+)/[0-9]+$', 1)
            ELSE 'shared' END AS graph,
       CAST(count(*) AS BIGINT) AS n_triples
FROM t GROUP BY 1"""


def kg_predicate_stats_sql() -> str:
    """Per-predicate triple counts over the deduplicated graph."""
    return f"""WITH t AS ({kg_triples_sql()})
SELECT pred, count(*) AS n_triples FROM t GROUP BY pred"""


def kg_degree_histogram_sql() -> str:
    """Degree distribution of the deduplicated graph: two-level
    aggregation (per-subject out-degree, then subjects-per-degree)."""
    return f"""WITH t AS ({kg_triples_sql()}),
deg AS (SELECT subj, CAST(count(*) AS BIGINT) AS degree FROM t GROUP BY subj)
SELECT degree, CAST(count(*) AS BIGINT) AS n_subjects FROM deg GROUP BY degree"""
