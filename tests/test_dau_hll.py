"""Grouped HLL (per-day distinct-user registers): cross-engine parity,
merge semantics, and estimator accuracy vs the exact per-day counts."""

import duckdb
import pandas as pd

from ifctordf_ray.stages.sketches import (
    HLL_P,
    dau_hll_registers,
    dau_hll_registers_sql,
    hll_estimate,
)


def test_dau_hll(sf_small):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_small}/events.parquet')"
    )
    a = dau_hll_registers(sf_small).to_pandas()
    b = con.execute(dau_hll_registers_sql()).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    an = a[cols].sort_values(cols).reset_index(drop=True)
    bn = b[cols].sort_values(cols).reset_index(drop=True).astype(an.dtypes.to_dict())
    pd.testing.assert_frame_equal(an, bn)

    # registers valid: bucket in [0, 2^P), rank >= 1, one row per (day,bucket)
    assert a["bucket"].between(0, 2**HLL_P - 1).all()
    assert (a["max_rank"] >= 1).all()
    assert not a.duplicated(["day", "bucket"]).any()

    # estimator: per-day estimate within 3 sigma-ish (1.04/sqrt(256) ~ 6.5%)
    truth = {
        pd.Timestamp(d): n
        for d, n in con.execute(
            "SELECT date_trunc('day', ts), count(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    }
    for day, grp in a.groupby("day"):
        est = hll_estimate(list(zip(grp["bucket"], grp["max_rank"])))
        true = truth[pd.Timestamp(day)]
        assert abs(est - true) / true < 0.25, (day, est, true)
