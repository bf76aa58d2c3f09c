"""Relational pipeline physical-plan checks not covered by the driver
gate (which always runs the default config)."""

from ifctordf_ray.pipelines import relational

SF = "/root/testdata/sf0.001"


def test_nation_revenue_join_path_matches_broadcast():
    """Force the distributed Dataset.join fallback (customer above the
    broadcast threshold) and assert it matches the broadcast plan —
    the r2 scale `weak`: the broadcast path alone builds a driver-side
    array that grows with SF."""
    bc = {
        (r["n_name"], r["n_orders"], r["revenue_cents"])
        for r in relational.nation_revenue(SF).take_all()
    }
    jn = {
        (r["n_name"], r["n_orders"], r["revenue_cents"])
        for r in relational.nation_revenue(SF, broadcast_max_rows=0).take_all()
    }
    assert bc == jn and len(bc) > 0
