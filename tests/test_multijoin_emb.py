"""Star-schema multi-joins, PMI collocations, mention co-occurrence, and
the new embedding linear-algebra ops — cross-engine parity plus physical
-plan checks (broadcast vs distributed-join equivalence)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from ifctordf_ray.pipelines import multijoin
from ifctordf_ray.stages import graphq, similarity, terms


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


def test_promo_revenue_parity(sf_small):
    con = _duck(sf_small, ["lineitem", "part"])
    a = _compare(multijoin.promo_revenue(sf_small), multijoin.promo_revenue_sql(), con)
    assert len(a) > 0
    assert ((a["promo_share"] >= 0) & (a["promo_share"] <= 1)).all()


def test_revenue_rollup_parity_and_totals(sf_small):
    con = _duck(sf_small, ["orders", "customer", "nation", "region"])
    a = _compare(multijoin.revenue_rollup(sf_small), multijoin.revenue_rollup_sql(), con)
    # grand total row equals the sum of the finest level
    finest = a[(a.r_name != "ALL") & (a.n_name != "ALL")]
    total = a[(a.r_name == "ALL") & (a.n_name == "ALL")]
    assert len(total) == 1
    assert int(total.n_orders.iloc[0]) == int(finest.n_orders.sum())
    assert int(total.revenue_cents.iloc[0]) == int(finest.revenue_cents.sum())


def test_local_supplier_volume_parity(sf_small):
    con = _duck(
        sf_small, ["lineitem", "supplier", "orders", "customer", "nation", "region"]
    )
    a = _compare(
        multijoin.local_supplier_volume(sf_small),
        multijoin.local_supplier_volume_sql(),
        con,
    )
    assert len(a) >= 1


def test_attach_dimension_join_path_matches_broadcast(sf_small):
    """The thresholded operator's two physical plans agree (broadcast
    probe vs distributed Dataset.join), including dropped unmatched keys."""
    import pyarrow as pa
    import ray.data

    from ifctordf_ray.functions.dimjoin import attach_dimension

    fact = ray.data.from_arrow(
        pa.table({"pk": pa.array([0, 5, 199, 1000, 5], pa.int64())})
    )
    kw = dict(
        dim_path=f"{sf_small}/part.parquet",
        key_col="p_partkey",
        probe_col="pk",
        val_cols=["p_type", "p_size"],
    )
    bc = attach_dimension(fact, **kw).take_all()
    jn = attach_dimension(fact, broadcast_max_rows=0, **kw).take_all()
    key = lambda r: (r["pk"], r["p_type"], r["p_size"])
    assert sorted(map(key, bc)) == sorted(map(key, jn))
    # pk=1000 has no dimension row -> dropped (inner semantics); dup probes kept
    assert len(bc) == 4


def test_pmi_collocations_parity(sf_small):
    con = _duck(sf_small, ["documents"])
    a = _compare(
        terms.pmi_collocations(sf_small), terms.pmi_collocations_sql(), con
    )
    assert len(a) > 0
    assert (a["n"] >= terms.PMI_MIN_PAIR).all()
    assert (a["lift"] > 0).all()


def test_cooccurring_mentions_parity(sf_small):
    con = _duck(sf_small, ["events"])
    a = _compare(
        graphq.cooccurring_mentions(sf_small), graphq.cooccurring_mentions_sql(), con
    )
    assert len(a) > 0
    # unordered-pair contract: m1 strictly below m2, no self-pairs
    assert (a["m1"] < a["m2"]).all()


def test_mention_components_parity(sf_small):
    con = _duck(sf_small, ["events"])
    a = _compare(
        graphq.mention_components(sf_small), graphq.mention_components_sql(), con
    )
    assert len(a) > 0
    # every component has >= 2 members (nodes come from the edge list)
    assert (a["component_size"] >= 2).all()
    # cluster label is the min mention-hash of the component
    g = a.groupby("cluster_h")["mention"].nunique()
    assert (g >= 1).all()


def test_mention_neighbor_jaccard_parity(sf_small):
    con = _duck(sf_small, ["events"])
    a = _compare(
        graphq.mention_neighbor_jaccard(sf_small),
        graphq.mention_neighbor_jaccard_sql(),
        con,
    )
    assert len(a) > 0
    assert (a["m1"] < a["m2"]).all()
    # true Jaccard bounds: common <= min(deg), 0 < jaccard <= 1
    assert (a["common_neighbors"] <= a[["deg_m1", "deg_m2"]].min(axis=1)).all()
    assert ((a["jaccard"] > 0) & (a["jaccard"] <= 1)).all()


def test_dim_covariance_matches_numpy(sf_small):
    embs = np.asarray(
        pq.read_table(f"{sf_small}/embeddings.parquet", columns=["embedding"])[
            "embedding"
        ].to_pylist(),
        dtype=np.float64,
    )
    q = np.floor(embs * similarity.COV_Q + 0.5).astype(np.int64)
    g = q.T @ q
    rows = similarity.dim_covariance(sf_small).take_all()
    assert len(rows) == similarity.EMB_DIM * (similarity.EMB_DIM + 1) // 2
    for r in rows[:200]:
        assert r["sum_prod"] == g[r["dim_i"], r["dim_j"]]
        assert r["n"] == len(q)
    # diagonal is a sum of squares
    assert all(r["sum_prod"] >= 0 for r in rows if r["dim_i"] == r["dim_j"])


def test_kmeans_assign_matches_numpy(sf_small):
    t = pq.read_table(f"{sf_small}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    embs = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    q = np.floor(embs * similarity.COV_Q + 0.5).astype(np.int64)
    seeds = order[: similarity.KMEANS_K]
    cent = q[seeds]
    d = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    expect = {int(ids[i]): (int(d[i].argmin()), int(d[i].min())) for i in range(len(ids))}
    rows = similarity.kmeans_assign(sf_small).take_all()
    assert len(rows) == len(ids)
    for r in rows:
        cl, dist = expect[r["vec_id"]]
        assert (r["cluster"], r["dist"]) == (cl, dist)
