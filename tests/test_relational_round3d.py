"""Hopping-window distinct users, percent-of-total revenue share, and
the power-iteration step: cross-engine parity + invariants."""

import duckdb
import numpy as np
import pandas as pd

from ifctordf_ray.pipelines.relational import (
    HOP_WINDOW_DAYS,
    hopping_active_users,
    hopping_active_users_sql,
    nation_revenue_share,
    nation_revenue_share_sql,
)
from ifctordf_ray.stages.similarity import power_iteration_step, power_iteration_step_sql


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


def test_hopping_active_users_parity(sf_small):
    con = _duck(sf_small, ["events"])
    a = _compare(hopping_active_users(sf_small), hopping_active_users_sql(), con)
    # a window can never beat the global distinct-user count
    n_users = con.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert (a["n_active_users"] <= n_users).all()
    # window count: one start per day in [min_day - 6, max_day]
    n_days = con.execute(
        "SELECT datediff('day', min(ts), max(ts)) + 1 FROM events"
    ).fetchone()[0]
    assert len(a) == n_days + HOP_WINDOW_DAYS - 1


def test_nation_revenue_share_parity(sf_small):
    con = _duck(sf_small, ["orders", "customer", "nation"])
    a = _compare(nation_revenue_share(sf_small), nation_revenue_share_sql(), con)
    assert abs(a["revenue_share"].sum() - 1.0) < 1e-9
    assert (a["revenue_share"] > 0).all()


def test_power_iteration_parity(sf_small):
    con = _duck(sf_small, ["embeddings"])
    a = _compare(power_iteration_step(sf_small), power_iteration_step_sql(), con)
    # v1 is unit-norm and proportional to w
    assert abs(np.sqrt((a["v1"] ** 2).sum()) - 1.0) < 1e-9
    w = a["w"].to_numpy().astype(float)
    v = a["v1"].to_numpy()
    assert abs(abs(np.dot(w / np.linalg.norm(w), v)) - 1.0) < 1e-9
