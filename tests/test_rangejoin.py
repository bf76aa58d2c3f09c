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


def test_purchase_follow_events_bucket_boundaries(tmp_path):
    """Hand-built edge cases: follower exactly AT p_ts (excluded), at
    p_ts + 1h (included), 1us past the window (excluded), and a window
    crossing an hour-bucket boundary (must still match via the second
    probe replica)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = dt.datetime(2024, 1, 1, 10, 59, 0)  # 1 min before the hour edge
    rows = [
        # purchase near the end of hour bucket 10
        (1, base, 7, "purchase", 1.0),
        (2, base, 7, "view", 2.0),                              # ts == p_ts -> OUT
        (3, base + dt.timedelta(minutes=5), 7, "click", 3.0),   # next bucket, IN
        (4, base + dt.timedelta(hours=1), 7, "view", 4.0),      # exactly +1h, IN
        (5, base + dt.timedelta(hours=1, microseconds=1), 7, "view", 8.0),  # OUT
        (6, base + dt.timedelta(minutes=30), 99, "view", 16.0),  # other user, OUT
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = purchase_follow_events(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert int(out.event_id.iloc[0]) == 1
    assert int(out.n_follow.iloc[0]) == 2            # events 3 and 4 only
    assert int(out.follow_value_cents.iloc[0]) == 700
