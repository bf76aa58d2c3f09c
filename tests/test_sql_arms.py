"""Cross-engine check of the generated SQL's per-turn emission arms on
inputs the driver corpus never produces (nested lists, decimals, unicode)
— DuckDB run over a synthetic `turn` CTE vs the pure-Python oracle on the
same rows.  Complements the driver gate, which only exercises the arms on
derived-transcript text."""

import datetime as dt

import duckdb

from ifctordf_ray import oracle
from ifctordf_ray import schema as S
from ifctordf_ray.sql_oracle import _turn_triples_unions

TS = dt.datetime(2024, 1, 2, 3, 4, 5, 123456)

ROWS = [
    {"conv_id": "c", "turn_idx": 0, "role": "user", "tool": None,
     "text": "args ((1,2),(3,4)) and ((7,8)) v 12. plus 0012 and #1 0xAb12 0xabc"},
    {"conv_id": "c", "turn_idx": 1, "role": "tool", "tool": "search",
     "text": "((7,8),(9)) café 3.14"},
    {"conv_id": "c", "turn_idx": 2, "role": "assistant", "tool": None,
     "text": ""},
]


def _sql_triples():
    con = duckdb.connect()
    values = ",\n".join(
        "('{c}', {i}, '{r}', {tool}, {text}, TIMESTAMP '{ts}')".format(
            c=r["conv_id"], i=r["turn_idx"], r=r["role"],
            tool="NULL" if r["tool"] is None else f"'{r['tool']}'",
            text="NULL" if r["text"] is None else "'" + r["text"].replace("'", "''") + "'",
            ts=TS.strftime("%Y-%m-%d %H:%M:%S.%f"),
        )
        for r in ROWS
    )
    mentions = f"""    SELECT t_iri, '{S.P_MENTIONS_TURN}',
           'inst:turn/' || conv_id || '/' || CAST(CAST(u.m AS BIGINT) AS VARCHAR),
           'uri'
    FROM turn, UNNEST(regexp_extract_all(txt, '{S.REF_RE}', 1)) AS u(m)"""
    sql = f"""WITH raw(conv_id, turn_idx, role, tool, text, ts) AS (VALUES
{values}
), turn AS (
    SELECT *,
           'inst:conv/' || conv_id AS c_iri,
           'inst:turn/' || conv_id || '/' || CAST(turn_idx AS VARCHAR) AS t_iri,
           coalesce(text, '') AS txt
    FROM raw
)
SELECT DISTINCT subj, pred, obj, obj_kind FROM (
{_turn_triples_unions(mentions)}
)"""
    return {
        (r[0], r[1], r[2], r[3]) for r in con.sql(sql).fetchall()
    }


def test_sql_arms_match_python_oracle():
    rows = [dict(r, ts=TS) for r in ROWS]
    exp, _ = oracle.extract_reference(rows)
    got = _sql_triples()
    assert got == exp, (sorted(got - exp)[:5], sorted(exp - got)[:5])
    # sanity: the nested-list arms actually fired
    assert any(t[1] == S.P_MENTIONS_LIST for t in got)
    assert any(t[1] == S.P_HAS_NEXT for t in got)
