"""Left-outer customer order counts, daily active users, event-type
transitions: parity + structural invariants at sf0.001."""

import duckdb
import pandas as pd

from ifctordf_ray.pipelines.relational import (
    customer_order_counts,
    customer_order_counts_sql,
    daily_active_users,
    daily_active_users_sql,
    event_transitions,
    event_transitions_sql,
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
    for c in cols:
        assert a[c].dtype.kind == b[c].dtype.kind, (c, a[c].dtype, b[c].dtype)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    return a


def test_customer_order_counts_parity_left_outer(sf_small):
    con = _duck(sf_small, ["customer", "orders"])
    a = _compare(customer_order_counts(sf_small), customer_order_counts_sql(), con)
    n_cust = con.execute("SELECT count(*) FROM customer").fetchone()[0]
    assert len(a) == n_cust  # every customer present (left outer)
    assert (a.loc[a["n_orders"] == 0, "total_cents"] == 0).all()


def test_daily_active_users_parity(sf_small):
    con = _duck(sf_small, ["events"])
    a = _compare(daily_active_users(sf_small), daily_active_users_sql(), con)
    n_users = con.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert (a["n_active_users"] <= n_users).all()


def test_event_transitions_parity_and_mass(sf_small):
    con = _duck(sf_small, ["events"])
    a = _compare(event_transitions(sf_small), event_transitions_sql(), con)
    # per user: sum of transition counts == n_events - 1
    per_user = a.groupby("user_id")["n"].sum()
    counts = dict(
        con.execute("SELECT user_id, count(*) FROM events GROUP BY user_id").fetchall()
    )
    for uid, s in per_user.items():
        assert s == counts[uid] - 1


def test_winsorized_values(sf_small, ray_session):
    """Quantile clipping: parity + an independent pandas reference of the
    percentile_disc bounds + clip semantics."""
    import duckdb
    import numpy as np
    import pyarrow.parquet as pq

    from ifctordf_ray.pipelines.relational import (
        WINSOR_HI_Q,
        WINSOR_LO_Q,
        winsorized_values,
        winsorized_values_sql,
    )

    eng = winsorized_values(sf_small).to_pandas().sort_values("event_id")
    t = pq.read_table(
        f"{sf_small}/events.parquet", columns=["event_id", "event_type", "value"]
    ).to_pandas()
    t["vc"] = np.floor(t.value * 100.0 + 0.5).astype("int64")

    def disc(vals, q):
        v = np.sort(vals.to_numpy())
        cum = np.arange(1, len(v) + 1)
        i = int(np.searchsorted(cum, q * len(v), side="left"))
        if cum[i] < q * len(v):
            i += 1
        return int(v[i])

    bounds = {
        et: (disc(g.vc, WINSOR_LO_Q), disc(g.vc, WINSOR_HI_Q))
        for et, g in t.groupby("event_type")
    }
    ref = t.sort_values("event_id")
    clipped_any = 0
    for erow, (_, rrow) in zip(eng.itertuples(), ref.iterrows()):
        lo, hi = bounds[rrow.event_type]
        want = min(max(rrow.vc, lo), hi)
        assert erow.clipped_cents == want, erow.event_id
        assert erow.was_clipped == int(rrow.vc < lo or rrow.vc > hi)
        clipped_any += erow.was_clipped
    assert 0 < clipped_any < len(eng)  # the band actually clips a tail

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_small}/events.parquet')"
    )
    sql = con.execute(winsorized_values_sql()).df().sort_values("event_id")
    assert list(eng.clipped_cents) == list(sql.clipped_cents)
