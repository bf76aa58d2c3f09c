"""2-hop property path over the engine's own triples + bigram counts."""

import duckdb
import pandas as pd

from ifctordf_ray.stages.graphq import mention_next_hop, mention_next_hop_sql
from ifctordf_ray.stages.terms import bigram_counts, bigram_counts_sql


def _duck(sf_dir, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _compare(ds, sql, con):
    a = ds.to_pandas()
    b = con.execute(sql).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    for c in cols:
        assert a[c].dtype.kind == b[c].dtype.kind, (c, a[c].dtype, b[c].dtype)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    return a


def test_mention_next_hop_parity_and_path_shape(sf_small):
    con = _duck(sf_small, ["events"])
    a = _compare(mention_next_hop(sf_small), mention_next_hop_sql(), con)
    assert len(a) > 0
    # path semantics: the hop stays inside one conversation (turn IRIs
    # embed the conv id: inst:turn/<conv>/<idx>)
    for _, r in a.head(50).iterrows():
        conv_via = r["via_turn"].rsplit("/", 1)[0]
        conv_next = r["next_turn"].rsplit("/", 1)[0]
        assert conv_via == conv_next
        # successor turn index is via's + 1
        assert int(r["next_turn"].rsplit("/", 1)[1]) == int(
            r["via_turn"].rsplit("/", 1)[1]
        ) + 1


def test_bigram_counts_parity_and_mass(sf_small):
    con = _duck(sf_small, ["documents"])
    a = _compare(bigram_counts(sf_small), bigram_counts_sql(), con)
    # mass balance: total bigrams = sum over docs of max(words - 1, 0)
    expected = con.execute(
        "SELECT sum(greatest(len(regexp_extract_all(lower(coalesce(text,'')),"
        " '[a-z0-9]+')) - 1, 0)) FROM documents"
    ).fetchone()[0]
    assert int(a["n"].sum()) == int(expected)
