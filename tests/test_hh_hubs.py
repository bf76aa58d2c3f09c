"""CMS heavy hitters + top-hub triple extraction parity tests."""

import duckdb
import pandas as pd

from ifctordf_ray.stages.graphq import HUB_TOP_K, top_hub_triples, top_hub_triples_sql
from ifctordf_ray.stages.sketches import HH_MIN_EST, heavy_hitters, heavy_hitters_sql


def _parity(ds, con, sql):
    a = ds.to_pandas()
    b = con.execute(sql).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    an = a[cols].sort_values(cols).reset_index(drop=True)
    bn = b[cols].sort_values(cols).reset_index(drop=True).astype(an.dtypes.to_dict())
    pd.testing.assert_frame_equal(an, bn)
    return a


def test_heavy_hitters(sf_small):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    a = _parity(heavy_hitters(sf_small), con, heavy_hitters_sql())
    assert len(a) > 0
    assert (a["est"] >= HH_MIN_EST).all()
    # CMS only OVERESTIMATES: every word whose TRUE count clears the
    # threshold must be present (no false negatives)
    true_hh = {
        w
        for w, n in con.execute(
            "SELECT w, count(*) FROM (SELECT unnest(regexp_extract_all("
            "lower(coalesce(text,'')), '[a-z0-9]+')) AS w FROM documents) "
            "GROUP BY w"
        ).fetchall()
        if n >= HH_MIN_EST
    }
    assert true_hh <= set(a["word"])


def test_top_hub_triples(sf_small):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_small}/events.parquet')"
    )
    a = _parity(top_hub_triples(sf_small), con, top_hub_triples_sql())
    assert a["subj"].nunique() == HUB_TOP_K
    # hubs really are maximal: every selected subject's triple count is
    # >= the count of any unselected subject (checked via the SQL side)
    degs = dict(
        con.execute(
            f"WITH t AS ({__import__('ifctordf_ray.sql_oracle', fromlist=['kg_triples_sql']).kg_triples_sql()}) "
            "SELECT subj, count(*) FROM t GROUP BY subj"
        ).fetchall()
    )
    selected = set(a["subj"])
    min_sel = min(degs[s] for s in selected)
    max_unsel = max((n for s, n in degs.items() if s not in selected), default=0)
    assert min_sel >= max_unsel
