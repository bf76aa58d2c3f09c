"""Q13-style custdist, weekend/weekday set-op cohorts, per-user
inter-arrival stats: cross-engine parity + invariants."""

import duckdb
import pandas as pd

from ifctordf_ray.pipelines.relational import (
    custdist,
    custdist_sql,
    user_interarrival,
    user_interarrival_sql,
    weekend_weekday_cohorts,
    weekend_weekday_cohorts_sql,
)


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


def test_custdist_parity(sf_small):
    con = _duck(sf_small, ["customer", "orders"])
    a = _compare(custdist(sf_small), custdist_sql(), con)
    n_cust = con.execute("SELECT count(*) FROM customer").fetchone()[0]
    assert a["n_customers"].sum() == n_cust  # every customer in exactly one bucket


def test_weekend_cohorts_parity(sf_small):
    con = _duck(sf_small, ["events"])
    a = _compare(
        weekend_weekday_cohorts(sf_small), weekend_weekday_cohorts_sql(), con
    )
    n_users = con.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert a["n_users"].sum() == n_users  # cohorts partition the user set
    assert set(a["cohort"]) <= {"both", "weekday_only", "weekend_only"}


def test_user_interarrival_parity(sf_small):
    con = _duck(sf_small, ["events"])
    a = _compare(user_interarrival(sf_small), user_interarrival_sql(), con)
    n_users = con.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert len(a) == n_users
    m = a["n_gaps"] > 0
    assert (a.loc[m, "max_gap_us"] * a.loc[m, "n_gaps"] >= a.loc[m, "sum_gap_us"]).all()
    assert (a.loc[m, "avg_gap_us"] == a.loc[m, "sum_gap_us"] / a.loc[m, "n_gaps"]).all()
    # n_gaps = user's event count - 1
    per_user = con.execute(
        "SELECT user_id, count(*) - 1 AS g FROM events GROUP BY user_id"
    ).df()
    merged = a.merge(per_user, on="user_id")
    assert (merged["n_gaps"] == merged["g"]).all()


def test_late_events_parity(sf_small):
    from ifctordf_ray.pipelines.relational import late_events, late_events_sql

    con = _duck(sf_small, ["events"])
    a = _compare(late_events(sf_small), late_events_sql(), con)
    n_users = con.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert len(a) == n_users
    assert (a["n_late"] <= a["n_events"] - 1).all()  # the first arrival is never late
    z = a["n_late"] == 0
    assert (a.loc[z, "max_late_us"] == 0).all() and (a.loc[z, "sum_late_us"] == 0).all()
    nz = ~z
    assert (a.loc[nz, "sum_late_us"] >= a.loc[nz, "max_late_us"]).all()
