"""Mention triangles, weighted sampling, hopping windows — new round-3 ops."""

import duckdb
import pandas as pd

from ifctordf_ray.pipelines.relational import (
    events_hopping_window,
    events_hopping_window_sql,
)
from ifctordf_ray.stages.graphq import mention_triangles, mention_triangles_sql
from ifctordf_ray.stages.textstats import weighted_sample, weighted_sample_sql


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
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    return a


def test_mention_triangles_parity_and_orientation(sf_small):
    con = _duck(sf_small, ["events"])
    a = _compare(mention_triangles(sf_small), mention_triangles_sql(), con)
    assert len(a) > 0
    # orientation contract: strictly increasing, no sentinel leakage
    assert (a["m_a"] < a["m_b"]).all() and (a["m_b"] < a["m_c"]).all()
    assert not a["m_a"].str.startswith("\x00").any()


def test_mention_triangles_at_driver_partitioning(sf_small):
    # regression guard for the empty-partition join crash class: run the
    # chained joins at the 32-CPU default partition count
    a = mention_triangles(sf_small, num_partitions=16).to_pandas()
    b = mention_triangles(sf_small).to_pandas()
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_weighted_sample_parity_and_bias(sf_small):
    con = _duck(sf_small, ["documents"])
    a = _compare(weighted_sample(sf_small), weighted_sample_sql(), con)
    assert len(a) == 50
    # priority sampling favors heavier (longer) docs: the sample's mean
    # length exceeds the corpus mean
    corpus_mean = con.execute("SELECT avg(n_chars) FROM documents").fetchone()[0]
    assert a["n_chars"].mean() > corpus_mean


def test_events_hopping_window_parity_and_coverage(sf_small):
    con = _duck(sf_small, ["events"])
    a = _compare(events_hopping_window(sf_small), events_hopping_window_sql(), con)
    # every event lands in exactly 7 windows
    n_events = con.execute("SELECT count(*) FROM events").fetchone()[0]
    assert int(a["n_events"].sum()) == 7 * n_events


def test_unified_corpus_stats_union(sf_small):
    from ifctordf_ray.stages.textstats import (
        unified_corpus_stats,
        unified_corpus_stats_sql,
    )

    con = _duck(sf_small, ["documents", "events"])
    a = _compare(unified_corpus_stats(sf_small), unified_corpus_stats_sql(), con)
    assert set(a["source_kind"]) == {"document", "turn"}
    assert (a["n_rows"] > 0).all()
