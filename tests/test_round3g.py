"""Round-3g operators: sorted-neighborhood blocking (ER candidate
generation), exact rational OLS trend, 2-D Pareto skyline."""

import duckdb
import pandas as pd

from ifctordf_ray.pipelines.relational import (
    order_skyline,
    order_skyline_sql,
    value_trend,
    value_trend_sql,
)
from ifctordf_ray.stages.dedup import BLOCK_WINDOW, blocking_pairs, blocking_pairs_sql


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


def test_value_trend_parity(sf_small):
    con = _duck(sf_small, ["events"])
    a = _compare(value_trend(sf_small), value_trend_sql(), con)
    assert len(a) > 0
    # den = n*Sxx - Sx^2 >= 0 (Cauchy-Schwarz), 0 only for single-x groups
    assert (a["slope_den"] >= 0).all()
    assert (a["n"] > 1).all()


def test_order_skyline_parity(sf_small):
    con = _duck(sf_small, ["orders"])
    a = _compare(order_skyline(sf_small), order_skyline_sql(), con)
    assert len(a) > 0
    # frontier invariant: sorted by date, prices strictly exceed every
    # strictly-earlier frontier price
    a = a.sort_values(["o_orderdate", "price_cents"]).reset_index(drop=True)
    best = -1
    prev_date = None
    for _, r in a.iterrows():
        if prev_date is not None and r["o_orderdate"] > prev_date:
            assert r["price_cents"] > best
        best = max(best, r["price_cents"])
        prev_date = r["o_orderdate"]


def test_blocking_pairs_parity(sf_small):
    con = _duck(sf_small, ["documents"])
    a = _compare(blocking_pairs(sf_small), blocking_pairs_sql(), con)
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    # exact SNM pair count: every row pairs with its next W successors
    w = BLOCK_WINDOW
    assert len(a) == w * n_docs - w * (w + 1) // 2
    assert not (a["doc_a"] == a["doc_b"]).any()


def test_blocking_pairs_window_1(sf_small):
    """window=1 == adjacent pairs only; exercises the cross-bucket border
    reconstruction with the tightest window."""
    con = _duck(sf_small, ["documents"])
    _compare(blocking_pairs(sf_small, window=1), blocking_pairs_sql(window=1), con)


def test_sft_pairs_parity(sf_small):
    from ifctordf_ray.sources.transcripts import transcripts_from_events
    from ifctordf_ray.stages.chunking import sft_pairs, sft_pairs_sql

    con = _duck(sf_small, ["events"])
    a = _compare(sft_pairs(transcripts_from_events(sf_small)), sft_pairs_sql(), con)
    assert len(a) > 0
    assert (a["prompt_idx"] >= 0).all()


def test_context_windows_parity(sf_small):
    from ifctordf_ray.sources.transcripts import transcripts_from_events
    from ifctordf_ray.stages.chunking import context_windows, context_windows_sql

    con = _duck(sf_small, ["events"])
    a = _compare(
        context_windows(transcripts_from_events(sf_small)),
        context_windows_sql(),
        con,
    )
    assert len(a) > 0
    # a turn_idx>=3 row has exactly 3 context lines; turn 1 exactly one
    k3 = a[a["turn_idx"] >= 3]["context"].str.count("\n")
    assert (k3 == 2).all()
    k1 = a[a["turn_idx"] == 1]["context"].str.count("\n")
    assert (k1 == 0).all()


def test_benford_digits_parity(sf_small):
    from ifctordf_ray.pipelines.relational import benford_digits, benford_digits_sql

    con = _duck(sf_small, ["events"])
    a = _compare(benford_digits(sf_small), benford_digits_sql(), con)
    assert len(a) > 0
    assert a["digit"].between(1, 9).all()
    # partition check: per-type digit counts sum to the positive-cents rows
    total = con.execute(
        "SELECT count(*) FROM events WHERE CAST(floor(value*100+0.5) AS BIGINT) > 0"
    ).fetchone()[0]
    assert a["n"].sum() == total


def test_order_price_band_join_parity(sf_small):
    from ifctordf_ray.pipelines.relational import (
        BAND_DELTA_CENTS,
        order_price_band_join,
        order_price_band_join_sql,
    )

    con = _duck(sf_small, ["orders"])
    a = _compare(
        order_price_band_join(sf_small), order_price_band_join_sql(), con
    )
    assert len(a) > 0
    # band invariant + canonical pair orientation + no self-pairs
    assert (a["diff_cents"] <= BAND_DELTA_CENTS).all()
    assert (a["diff_cents"] == (a["price_a_cents"] - a["price_b_cents"]).abs()).all()
    assert (a["okey_a"] < a["okey_b"]).all()
    # each unordered pair exactly once (the promoted-x-promoted exclusion)
    assert not a.duplicated(["okey_a", "okey_b"]).any()


def test_sft_echo_overlap_parity(sf_small):
    import pyarrow as pa
    import ray.data

    from ifctordf_ray.sources.transcripts import transcripts_from_events
    from ifctordf_ray.stages.chunking import (
        ECHO_MIN_SHARED,
        sft_echo_overlap,
        sft_echo_overlap_sql,
    )

    con = _duck(sf_small, ["events"])
    a = _compare(
        sft_echo_overlap(transcripts_from_events(sf_small)),
        sft_echo_overlap_sql(),
        con,
    )
    assert len(a) > 0
    assert (a["overlap"] <= a[["p_shingles", "r_shingles"]].min(axis=1)).all()
    assert (
        a["is_echo"]
        == ((a["overlap"] >= ECHO_MIN_SHARED) & (2 * a["overlap"] >= a["r_shingles"]))
    ).all()
    # a synthetic verbatim echo is flagged
    tr = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": pa.array(["c"] * 2, pa.string()),
                "turn_idx": pa.array([0, 1], pa.int32()),
                "role": pa.array(["user", "assistant"], pa.string()),
                "text": pa.array(["the quick brown fox jumps high"] * 2),
                "tool": pa.array([None, None], pa.string()),
                "ts": pa.array([0, 1], pa.timestamp("us")),
            }
        )
    )
    e = sft_echo_overlap(tr).to_pandas()
    assert len(e) == 1 and bool(e.is_echo[0])


def test_user_value_mad_parity(sf_small):
    from ifctordf_ray.pipelines.relational import user_value_mad, user_value_mad_sql

    con = _duck(sf_small, ["events"])
    a = _compare(user_value_mad(sf_small), user_value_mad_sql(), con)
    assert len(a) > 0
    assert (a.mad_cents >= 0).all()


def test_user_cusum_changepoint_parity(sf_small):
    import numpy as np

    from ifctordf_ray.pipelines.relational import (
        user_cusum_changepoint,
        user_cusum_changepoint_sql,
    )

    con = _duck(sf_small, ["events"])
    a = _compare(user_cusum_changepoint(sf_small), user_cusum_changepoint_sql(), con)
    assert len(a) > 0
    assert ((a.change_k >= 1) & (a.change_k < a.n_events)).all()
    # synthetic step series: the detector must put the split at the step
    import pyarrow as pa
    from ifctordf_ray.pipelines.relational import _cusum_group

    vals = [1.0] * 5 + [100.0] * 5
    g = pa.table(
        {
            "user_id": pa.array([7] * 10, pa.int64()),
            "event_id": pa.array(list(range(10)), pa.int64()),
            "ts": pa.array(list(range(10)), pa.timestamp("us")),
            "value": pa.array(vals, pa.float64()),
        }
    )
    out = _cusum_group(g)
    assert out["change_k"][0].as_py() == 5


def test_events_window_dedup_parity_and_chain_rule(sf_small):
    import pyarrow as pa

    from ifctordf_ray.pipelines.relational import (
        DEDUP_WINDOW_US,
        _window_dedup_group,
        events_window_dedup,
        events_window_dedup_sql,
    )

    con = _duck(sf_small, ["events"])
    a = _compare(events_window_dedup(sf_small), events_window_dedup_sql(), con)
    assert len(a) > 0
    # chained last-EMITTED semantics: t=0 kept, t=0.5W dropped, t=1.2W
    # KEPT (window anchored at the kept t=0, not the dropped t=0.5W)
    w = DEDUP_WINDOW_US
    g = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([9] * 3, pa.int64()),
            "event_type": pa.array(["click"] * 3, pa.string()),
            "ts": pa.array([0, w // 2, w + w // 5], pa.timestamp("us")),
        }
    )
    out = _window_dedup_group(g)
    assert out["event_id"].to_pylist() == [1, 3]
