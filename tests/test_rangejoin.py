"""Bucketed range join (pipelines/rangejoin.py): the interval-predicate
join as a bounded-replication equi-join — cross-engine parity plus the
bucketing invariant (no follower farther than the window survives)."""

import duckdb
import pandas as pd

from ifctordf_ray.pipelines.rangejoin import (
    purchase_follow_events,
    purchase_follow_events_sql,
)


def _duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    return con


def test_purchase_follow_events_parity(sf_small):
    a = purchase_follow_events(sf_small).to_pandas()
    b = _duck(sf_small).execute(purchase_follow_events_sql()).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    assert (a.n_follow >= 1).all()


def test_purchase_follow_events_high_partitions(sf_small):
    # driver-scale partition count (the empty-block join regression shape)
    a = purchase_follow_events(sf_small, num_partitions=16).to_pandas()
    b = purchase_follow_events(sf_small).to_pandas()
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
