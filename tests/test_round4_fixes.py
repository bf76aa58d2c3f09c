"""Round-4 regression tests: the ADVICE/VERDICT hazards.

- context_windows: all-null k-windows must yield NULL context (string_agg
  parity) instead of being DROPPED by binary_join_element_wise(skip) —
  and a conversation whose minimum turn_idx > 0 keeps its first turn.
- uint64 shuffle keys: LSH band hashes / simhash / rank columns that ride
  a groupby are int64 reinterpretations (raw uint64 > 2^63 can crash
  Ray's reduce via int64 inference), and the sign-flip view preserves
  unsigned sort order.
- order_skyline: the "no earlier day" sentinel admits non-positive
  prices, matching the oracle's prevmax IS NULL branch.
- pair_edit_distance: distributed join shape stays oracle-exact.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data


def _cmp(df_a: pd.DataFrame, df_b: pd.DataFrame):
    cols = sorted(df_a.columns)
    assert sorted(df_b.columns) == cols
    a = df_a[cols].sort_values(cols).reset_index(drop=True)
    b = df_b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    return a


def test_context_windows_null_lines_and_nonzero_base():
    from ifctordf_ray.stages.chunking import context_windows

    # c1: turns 1..3 have NULL lines (null role or text) -> turn 4's
    # whole k=3 window is null -> context must be NULL, row KEPT.
    # c2: min turn_idx = 5 (> 0) -> first turn kept with NULL context.
    tr = pa.table(
        {
            "conv_id": ["c1"] * 5 + ["c2"] * 2,
            "turn_idx": pa.array([0, 1, 2, 3, 4, 5, 6], pa.int32()),
            "role": ["user", None, "assistant", None, "user", "user", "assistant"],
            "text": ["hello", "x", None, None, "tail", "first", "second"],
        }
    )
    got = (
        context_windows(ray.data.from_arrow(tr))
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("tr", tr)
    want = con.execute(
        """
        SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
               string_agg(role || ': ' || text, chr(10)) OVER (
                   PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS context,
               text AS target
        FROM tr QUALIFY turn_idx > 0
        """
    ).df()
    a = _cmp(got, want)
    # the all-null-window row survives with NULL context
    r4 = a[(a["conv_id"] == "c1") & (a["turn_idx"] == 4)]
    assert len(r4) == 1 and r4["context"].isna().all()
    # the non-zero-based conversation keeps its first turn, NULL context
    r5 = a[(a["conv_id"] == "c2") & (a["turn_idx"] == 5)]
    assert len(r5) == 1 and r5["context"].isna().all()


def test_lsh_shuffle_keys_are_int64():
    from ifctordf_ray.stages.dedup import MinHasher, _explode_bands

    batch = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": ["alpha beta gamma delta", "alpha beta gamma delta"]})
    bands = _explode_bands(MinHasher()(batch))
    assert bands.schema.field("band_hash").type == pa.int64()


def test_uint64_groupby_roundtrip_over_2_63():
    # the exact hazard: a shuffle key whose value exceeds int64-max.
    # With the signed reinterpret this groupby must be stable; the raw
    # uint64 key was a latent ArrowConversionError in Ray's reduce.
    big = np.array([17617040520133021313, 5, 17617040520133021313], dtype=np.uint64)
    t = pa.table(
        {
            "k": pa.array(big.view(np.int64), pa.int64()),
            "v": pa.array([1, 2, 3], pa.int64()),
        }
    )
    from ray.data.aggregate import Sum

    out = (
        ray.data.from_arrow(t)
        .repartition(4)
        .groupby("k")
        .aggregate(Sum("v", alias_name="s"))
        .take_all()
    )
    got = {r["k"]: r["s"] for r in out}
    key = int(big.view(np.int64)[0])
    assert got[key] == 4 and got[5] == 2


def test_signflip_preserves_unsigned_order():
    rng = np.random.RandomState(7)
    h = rng.randint(0, 1 << 63, size=256, dtype=np.uint64) * 2 + (
        rng.randint(0, 2, size=256).astype(np.uint64)
    )
    flipped = (h ^ np.uint64(1 << 63)).view(np.int64)
    assert (np.argsort(h, kind="stable") == np.argsort(flipped, kind="stable")).all()


def test_order_skyline_nonpositive_price(tmp_path):
    from ifctordf_ray.pipelines.relational import order_skyline, order_skyline_sql

    # earliest-dated order has a NEGATIVE price: prevmax IS NULL keeps it
    # in SQL; a -1 running-max sentinel would have dropped it.
    t = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_orderdate": pa.array(
                pd.to_datetime(
                    ["1995-01-01", "1995-01-01", "1995-01-02", "1995-01-03"]
                ),
                pa.timestamp("us"),
            ),
            "o_totalprice": pa.array([-7.25, -9.5, -1.0, 100.0], pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet")
    got = order_skyline(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{tmp_path}/orders.parquet')"
    )
    want = con.execute(order_skyline_sql()).df()
    a = _cmp(got, want)
    assert 1 in set(a["o_orderkey"])  # the negative-price frontier order


def test_pair_edit_distance_distributed_parity(sf_small):
    from ifctordf_ray.stages.dedup import pair_edit_distance, pair_edit_distance_sql

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{sf_small}/documents.parquet')"
    )
    got = pair_edit_distance(sf_small).to_pandas()
    want = con.execute(pair_edit_distance_sql()).df()
    a = _cmp(got, want)
    assert len(a) > 0
    assert (a["sim_micro"] <= 1_000_000).all()
