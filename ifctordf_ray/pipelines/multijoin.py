"""Multi-table star-schema joins (TPC-H Q5/Q14-style) and ROLLUP.

These compose the generic size-thresholded dimension attach
(functions/dimjoin.py) so that ONLY genuinely large-large joins shuffle:
dimension tables below the broadcast threshold ride the object store and
are probed per batch; the single fact-fact join (lineitem x orders) is a
distributed hash join.  The reference engine's analog is its in-process
lookup state (IfcSpfReader.java:220-252); everything else here is
engine-level operator coverage beyond the reference.

Monetary sums use integer cents for exact cross-engine parity (see
pipelines/relational.py module docstring).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Min, Sum

from ifctordf_ray.functions.dimjoin import attach_dimension
from ifctordf_ray.functions.kernels import cents as _cents
from ifctordf_ray.sources.transcripts import clean_read_parquet as _read


# ---------------------------------------------------------------------------
# Q14-style: promo revenue share per ship month (fact x part dimension)
# ---------------------------------------------------------------------------
def promo_revenue(sf_dir: str) -> ray.data.Dataset:
    """(ship_month, promo_cents, total_cents, promo_share): revenue share
    of PROMO-type parts per month.  part is attached via the thresholded
    dimension operator — broadcast probe at test scale, distributed hash
    join beyond ``BROADCAST_MAX_ROWS``; the lineitem side never shuffles
    until the final per-month aggregate (12ish groups)."""
    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        rev = _cents(
            pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        )
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "ship_month": pc.strftime(t["l_shipdate"], format="%Y-%m"),
                "revenue_cents": rev,
            }
        )

    with_part = attach_dimension(
        li.map_batches(prep, batch_format="pyarrow"),
        f"{sf_dir}/part.parquet",
        key_col="p_partkey",
        probe_col="l_partkey",
        val_cols=["p_type"],
    )

    def split(t: pa.Table) -> pa.Table:
        promo = pc.if_else(
            pc.equal(t["p_type"], "PROMO"),
            t["revenue_cents"],
            pa.scalar(0, pa.int64()),
        )
        return pa.table(
            {
                "ship_month": t["ship_month"],
                "promo_cents": promo,
                "total_cents": t["revenue_cents"],
            }
        )

    agg = (
        with_part.map_batches(split, batch_format="pyarrow")
        .groupby("ship_month")
        .aggregate(
            Sum("promo_cents", alias_name="promo_cents"),
            Sum("total_cents", alias_name="total_cents"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        share = pc.divide(
            pc.cast(t["promo_cents"], pa.float64()),
            pc.cast(t["total_cents"], pa.float64()),
        )
        return t.append_column("promo_share", share)

    return agg.map_batches(finish, batch_format="pyarrow")


def promo_revenue_sql() -> str:
    return """
    SELECT ship_month,
           CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS BIGINT) AS promo_cents,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS DOUBLE)
             / sum(cents) AS promo_share
    FROM (
        SELECT strftime(l.l_shipdate, '%Y-%m') AS ship_month, p.p_type,
               CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5) AS BIGINT) AS cents
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    GROUP BY ship_month
    """


# ---------------------------------------------------------------------------
# Q5-style: local supplier volume inside one region (5-table join)
# ---------------------------------------------------------------------------
REGION = "ASIA"


def local_supplier_volume(sf_dir: str, region: str = REGION) -> ray.data.Dataset:
    """(n_name, revenue_cents): revenue from lineitems whose supplier and
    ordering customer share a nation inside ``region``.  Physical plan:
    ONE distributed fact-fact hash join (lineitem x orders on the order
    key); supplier / customer / nation / region are all thresholded
    dimension attaches (broadcast probes at any realistic dimension
    size), so the big side shuffles exactly once."""
    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def prep(t: pa.Table) -> pa.Table:
        rev = _cents(
            pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "revenue_cents": rev,
            }
        )

    li = attach_dimension(
        li.map_batches(prep, batch_format="pyarrow"),
        f"{sf_dir}/supplier.parquet",
        key_col="s_suppkey",
        probe_col="l_suppkey",
        val_cols=["s_nationkey"],
    )

    orders = _read(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    from ifctordf_ray.functions.kernels import safe_join

    # safe_join: both sides are raw-read lineages — empty tables give
    # ZERO blocks and lose the join's schema broadcast
    joined = safe_join(
        li,
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("revenue_cents", pa.int64()),
                ("s_nationkey", pa.int32()),
            ]
        ),
        orders,
        pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
        join_type="inner",
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    joined = attach_dimension(
        joined,
        f"{sf_dir}/customer.parquet",
        key_col="c_custkey",
        probe_col="o_custkey",
        val_cols=["c_nationkey"],
    )

    def local_only(t: pa.Table) -> pa.Table:
        keep = pc.equal(
            pc.cast(t["s_nationkey"], pa.int64()),
            pc.cast(t["c_nationkey"], pa.int64()),
        )
        t = t.filter(keep)
        return pa.table(
            {"s_nationkey": t["s_nationkey"], "revenue_cents": t["revenue_cents"]}
        )

    local = joined.map_batches(local_only, batch_format="pyarrow")
    local = attach_dimension(
        local,
        f"{sf_dir}/nation.parquet",
        key_col="n_nationkey",
        probe_col="s_nationkey",
        val_cols=["n_name", "n_regionkey"],
    )
    local = attach_dimension(
        local,
        f"{sf_dir}/region.parquet",
        key_col="r_regionkey",
        probe_col="n_regionkey",
        val_cols=["r_name"],
    )
    in_region = local.map_batches(
        lambda t: pa.table(
            {
                "n_name": (f := t.filter(pc.equal(t["r_name"], region)))["n_name"],
                "revenue_cents": f["revenue_cents"],
            }
        ),
        batch_format="pyarrow",
    )
    return in_region.groupby("n_name").aggregate(
        Sum("revenue_cents", alias_name="revenue_cents")
    )


def local_supplier_volume_sql(region: str = REGION) -> str:
    return f"""
    SELECT n.n_name,
           CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE c.c_nationkey = s.s_nationkey AND r.r_name = '{region}'
    GROUP BY n.n_name
    """


# ---------------------------------------------------------------------------
# ROLLUP(r_name, n_name): hierarchical re-aggregation of one finest pass
# ---------------------------------------------------------------------------
ALL = "ALL"


def revenue_rollup(sf_dir: str) -> ray.data.Dataset:
    """(r_name, n_name, n_orders, revenue_cents) at three grouping levels
    — (region, nation), (region, ALL), (ALL, ALL) — computed as ONE
    distributed finest-level aggregate over the fact table, then
    re-aggregated: the coarser levels run over the tiny finest output
    (bounded by #nations), so the fact table is scanned exactly once."""
    orders = _read(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "price_cents": _cents(t["o_totalprice"]),
            }
        )

    fact = attach_dimension(
        orders.map_batches(prep, batch_format="pyarrow"),
        f"{sf_dir}/customer.parquet",
        key_col="c_custkey",
        probe_col="o_custkey",
        val_cols=["c_nationkey"],
    )
    fact = attach_dimension(
        fact,
        f"{sf_dir}/nation.parquet",
        key_col="n_nationkey",
        probe_col="c_nationkey",
        val_cols=["n_name", "n_regionkey"],
    )
    fact = attach_dimension(
        fact,
        f"{sf_dir}/region.parquet",
        key_col="r_regionkey",
        probe_col="n_regionkey",
        val_cols=["r_name"],
    )

    finest = (
        fact.map_batches(
            lambda t: pa.table(
                {
                    "r_name": t["r_name"],
                    "n_name": t["n_name"],
                    "price_cents": t["price_cents"],
                }
            ),
            batch_format="pyarrow",
        )
        .groupby(["r_name", "n_name"])
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("price_cents", alias_name="revenue_cents"),
        )
    )

    level1 = (
        finest.groupby("r_name")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "r_name": t["r_name"],
                    "n_name": pa.array([ALL] * t.num_rows, pa.string()),
                    "n_orders": t["n_orders"],
                    "revenue_cents": t["revenue_cents"],
                }
            ),
            batch_format="pyarrow",
        )
    )
    level0 = level1.map_batches(
        lambda t: pa.table(
            {
                "r_name": pa.array([ALL] * t.num_rows, pa.string()),
                "n_name": pa.array([ALL] * t.num_rows, pa.string()),
                "n_orders": t["n_orders"],
                "revenue_cents": t["revenue_cents"],
            }
        ),
        batch_format="pyarrow",
    ).groupby(["r_name", "n_name"]).aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("revenue_cents", alias_name="revenue_cents"),
    )
    finest_named = finest.map_batches(
        lambda t: pa.table(
            {
                "r_name": t["r_name"],
                "n_name": t["n_name"],
                "n_orders": pc.cast(t["n_orders"], pa.int64()),
                "revenue_cents": t["revenue_cents"],
            }
        ),
        batch_format="pyarrow",
    )
    return finest_named.union(level1).union(level0)


def revenue_rollup_sql() -> str:
    return f"""
    SELECT coalesce(r_name, '{ALL}') AS r_name,
           coalesce(n_name, '{ALL}') AS n_name,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """


# ---------------------------------------------------------------------------
# CUBE(o_orderstatus, o_orderpriority): all four grouping sets from ONE
# finest-level pass (the 2-D sibling of revenue_rollup's hierarchy)
# ---------------------------------------------------------------------------
def order_status_priority_cube(sf_dir: str) -> ray.data.Dataset:
    """(o_orderstatus, o_orderpriority, n_orders, revenue_cents) at all
    FOUR grouping sets of CUBE(status, priority) — (s,p), (s,ALL),
    (ALL,p), (ALL,ALL).  The fact table is aggregated once at the finest
    level (|statuses| x |priorities| rows); every coarser set
    re-aggregates that tiny table, so adding grouping sets costs no
    extra fact scans — the property that makes CUBE affordable at
    100 TB."""
    orders = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "o_orderpriority": t["o_orderpriority"],
                "price_cents": _cents(t["o_totalprice"]),
            }
        )

    finest = (
        orders.map_batches(prep, batch_format="pyarrow")
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("price_cents", alias_name="revenue_cents"),
        )
    )

    def pin(t: pa.Table, status=None, prio=None) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "o_orderstatus": t["o_orderstatus"]
                if status is None
                else pa.array([status] * n, pa.string()),
                "o_orderpriority": t["o_orderpriority"]
                if prio is None
                else pa.array([prio] * n, pa.string()),
                "n_orders": pc.cast(t["n_orders"], pa.int64()),
                "revenue_cents": t["revenue_cents"],
            }
        )

    def reagg(ds: ray.data.Dataset, keys: list[str]) -> ray.data.Dataset:
        return ds.groupby(keys).aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )

    finest_named = finest.map_batches(pin, batch_format="pyarrow")
    by_status = reagg(
        finest_named.map_batches(
            lambda t: pin(t, prio=ALL), batch_format="pyarrow"
        ),
        ["o_orderstatus", "o_orderpriority"],
    )
    by_prio = reagg(
        finest_named.map_batches(
            lambda t: pin(t, status=ALL), batch_format="pyarrow"
        ),
        ["o_orderstatus", "o_orderpriority"],
    )
    grand = reagg(
        finest_named.map_batches(
            lambda t: pin(t, status=ALL, prio=ALL), batch_format="pyarrow"
        ),
        ["o_orderstatus", "o_orderpriority"],
    )

    def repin(t: pa.Table) -> pa.Table:
        return pin(t)

    return (
        finest_named.union(by_status.map_batches(repin, batch_format="pyarrow"))
        .union(by_prio.map_batches(repin, batch_format="pyarrow"))
        .union(grand.map_batches(repin, batch_format="pyarrow"))
    )


def order_status_priority_cube_sql() -> str:
    return f"""
    SELECT coalesce(o_orderstatus, '{ALL}') AS o_orderstatus,
           coalesce(o_orderpriority, '{ALL}') AS o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """


# ---------------------------------------------------------------------------
# Q7-style: volume shipping between two nations, by ship year
# ---------------------------------------------------------------------------
NATION_A = "NATION_18"
NATION_B = "NATION_19"


def volume_shipping(
    sf_dir: str, nation_a: str = NATION_A, nation_b: str = NATION_B
) -> ray.data.Dataset:
    """(supp_nation, cust_nation, ship_year, revenue_cents) for lineitems
    shipped between the two nations, both directions (TPC-H Q7 analog).
    Physical plan: BOTH fact sides are pre-filtered to the two nations
    (selectivity 2/|nations|) via thresholded dimension attaches BEFORE
    the one distributed lineitem x orders hash join — at 100 TB the
    exchange moves ~8% of the rows a join-then-filter plan would."""
    from ifctordf_ray.functions.kernels import join_ready
    from ifctordf_ray.tuning import join_kwargs

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "ship_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                "revenue_cents": _cents(
                    pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
                ),
            }
        )

    li = attach_dimension(
        li.map_batches(prep, batch_format="pyarrow"),
        f"{sf_dir}/supplier.parquet",
        key_col="s_suppkey",
        probe_col="l_suppkey",
        val_cols=["s_nationkey"],
    )
    li = attach_dimension(
        li,
        f"{sf_dir}/nation.parquet",
        key_col="n_nationkey",
        probe_col="s_nationkey",
        val_cols=["n_name"],
    )

    def li_filter(t: pa.Table) -> pa.Table:
        f = t.filter(pc.is_in(t["n_name"], pa.array([nation_a, nation_b])))
        return pa.table(
            {
                "l_orderkey": f["l_orderkey"],
                "supp_nation": f["n_name"],
                "ship_year": f["ship_year"],
                "revenue_cents": f["revenue_cents"],
            }
        )

    # both join inputs are heavily FILTERED (2/|nations| selectivity), so
    # either can emit empty blocks -> join_ready armor with DISTINCT
    # sentinel keys (-1 vs -2: a shared sentinel would join with itself)
    li = join_ready(
        li.map_batches(li_filter, batch_format="pyarrow"),
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("supp_nation", pa.string()),
                ("ship_year", pa.int64()),
                ("revenue_cents", pa.int64()),
            ]
        ),
        sentinel_row={
            "l_orderkey": -1,
            "supp_nation": "",
            "ship_year": 0,
            "revenue_cents": 0,
        },
    )

    orders = _read(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    orders = attach_dimension(
        orders,
        f"{sf_dir}/customer.parquet",
        key_col="c_custkey",
        probe_col="o_custkey",
        val_cols=["c_nationkey"],
    )
    orders = attach_dimension(
        orders,
        f"{sf_dir}/nation.parquet",
        key_col="n_nationkey",
        probe_col="c_nationkey",
        val_cols=["n_name"],
    )

    def o_filter(t: pa.Table) -> pa.Table:
        f = t.filter(pc.is_in(t["n_name"], pa.array([nation_a, nation_b])))
        return pa.table({"o_orderkey": f["o_orderkey"], "cust_nation": f["n_name"]})

    orders = join_ready(
        orders.map_batches(o_filter, batch_format="pyarrow"),
        pa.schema([("o_orderkey", pa.int64()), ("cust_nation", pa.string())]),
        sentinel_row={"o_orderkey": -2, "cust_nation": ""},
    )

    joined = li.join(
        orders,
        join_type="inner",
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        **join_kwargs(),
    )

    def cross_only(t: pa.Table) -> pa.Table:
        keep = pc.or_(
            pc.and_(
                pc.equal(t["supp_nation"], nation_a),
                pc.equal(t["cust_nation"], nation_b),
            ),
            pc.and_(
                pc.equal(t["supp_nation"], nation_b),
                pc.equal(t["cust_nation"], nation_a),
            ),
        )
        f = t.filter(keep)
        return pa.table(
            {
                "supp_nation": f["supp_nation"],
                "cust_nation": f["cust_nation"],
                "ship_year": f["ship_year"],
                "revenue_cents": f["revenue_cents"],
            }
        )

    return (
        joined.map_batches(cross_only, batch_format="pyarrow")
        .groupby(["supp_nation", "cust_nation", "ship_year"])
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )


def volume_shipping_sql(nation_a: str = NATION_A, nation_b: str = NATION_B) -> str:
    return f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    WHERE (ns.n_name = '{nation_a}' AND nc.n_name = '{nation_b}')
       OR (ns.n_name = '{nation_b}' AND nc.n_name = '{nation_a}')
    GROUP BY ns.n_name, nc.n_name, year(l.l_shipdate)
    """


# ---------------------------------------------------------------------------
# Q8-style: target nation's market share of one part type inside a region
# ---------------------------------------------------------------------------
Q8_REGION = "ASIA"
Q8_NATION = "NATION_2"
Q8_PTYPE = "ECONOMY"


def market_share(
    sf_dir: str,
    region: str = Q8_REGION,
    target_nation: str = Q8_NATION,
    ptype: str = Q8_PTYPE,
) -> ray.data.Dataset:
    """(order_year, target_cents, total_cents, mkt_share): the target
    nation's supplier share of revenue for one part type sold into one
    region (TPC-H Q8 analog).  The lineitem side is pruned by the part
    dimension FILTER (p_type) before the fact-fact join; customer/nation/
    region prune the orders side, so the exchange carries only matching
    rows of both facts."""
    from ifctordf_ray.functions.kernels import join_ready
    from ifctordf_ray.tuning import join_kwargs

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_partkey": t["l_partkey"],
                "l_suppkey": t["l_suppkey"],
                "revenue_cents": _cents(
                    pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
                ),
            }
        )

    li = attach_dimension(
        li.map_batches(prep, batch_format="pyarrow"),
        f"{sf_dir}/part.parquet",
        key_col="p_partkey",
        probe_col="l_partkey",
        val_cols=["p_type"],
    )
    def type_filter(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["p_type"], ptype))
        return pa.table(
            {
                "l_orderkey": f["l_orderkey"],
                "l_suppkey": f["l_suppkey"],
                "revenue_cents": f["revenue_cents"],
            }
        )

    li = li.map_batches(type_filter, batch_format="pyarrow")
    li = attach_dimension(
        li,
        f"{sf_dir}/supplier.parquet",
        key_col="s_suppkey",
        probe_col="l_suppkey",
        val_cols=["s_nationkey"],
    )
    li = attach_dimension(
        li,
        f"{sf_dir}/nation.parquet",
        key_col="n_nationkey",
        probe_col="s_nationkey",
        val_cols=["n_name"],
    )
    li = li.map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "supp_nation": t["n_name"],
                "revenue_cents": t["revenue_cents"],
            }
        ),
        batch_format="pyarrow",
    )

    orders = _read(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    orders = attach_dimension(
        orders,
        f"{sf_dir}/customer.parquet",
        key_col="c_custkey",
        probe_col="o_custkey",
        val_cols=["c_nationkey"],
    )
    orders = attach_dimension(
        orders,
        f"{sf_dir}/nation.parquet",
        key_col="n_nationkey",
        probe_col="c_nationkey",
        val_cols=["n_regionkey"],
    )
    orders = attach_dimension(
        orders,
        f"{sf_dir}/region.parquet",
        key_col="r_regionkey",
        probe_col="n_regionkey",
        val_cols=["r_name"],
    )

    def o_filter(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["r_name"], region))
        return pa.table(
            {
                "o_orderkey": f["o_orderkey"],
                "order_year": pc.cast(pc.year(f["o_orderdate"]), pa.int64()),
            }
        )

    # both inputs are filtered (p_type / region) -> join_ready with
    # distinct sentinels (-1 / -2; a shared key would self-join)
    li = join_ready(
        li,
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("supp_nation", pa.string()),
                ("revenue_cents", pa.int64()),
            ]
        ),
        sentinel_row={"l_orderkey": -1, "supp_nation": "", "revenue_cents": 0},
    )
    orders = join_ready(
        orders.map_batches(o_filter, batch_format="pyarrow"),
        pa.schema([("o_orderkey", pa.int64()), ("order_year", pa.int64())]),
        sentinel_row={"o_orderkey": -2, "order_year": 0},
    )

    joined = li.join(
        orders,
        join_type="inner",
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        **join_kwargs(),
    )

    def split(t: pa.Table) -> pa.Table:
        tgt = pc.if_else(
            pc.equal(t["supp_nation"], target_nation),
            t["revenue_cents"],
            pa.scalar(0, pa.int64()),
        )
        return pa.table(
            {
                "order_year": t["order_year"],
                "target_cents": tgt,
                "total_cents": t["revenue_cents"],
            }
        )

    agg = (
        joined.map_batches(split, batch_format="pyarrow")
        .groupby("order_year")
        .aggregate(
            Sum("target_cents", alias_name="target_cents"),
            Sum("total_cents", alias_name="total_cents"),
        )
    )
    return agg.map_batches(
        lambda t: t.append_column(
            "mkt_share",
            pc.divide(
                pc.cast(t["target_cents"], pa.float64()),
                pc.cast(t["total_cents"], pa.float64()),
            ),
        ),
        batch_format="pyarrow",
    )


def market_share_sql(
    region: str = Q8_REGION, target_nation: str = Q8_NATION, ptype: str = Q8_PTYPE
) -> str:
    return f"""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
           CAST(sum(CASE WHEN ns.n_name = '{target_nation}' THEN cents ELSE 0 END) AS BIGINT) AS target_cents,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(sum(CASE WHEN ns.n_name = '{target_nation}' THEN cents ELSE 0 END) AS DOUBLE) / sum(cents) AS mkt_share
    FROM (
        SELECT l_orderkey, l_suppkey,
               CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT) AS cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type = '{ptype}'
    ) l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    JOIN region r   ON nc.n_regionkey = r.r_regionkey
    WHERE r.r_name = '{region}'
    GROUP BY year(o.o_orderdate)
    """


# ---------------------------------------------------------------------------
# Q9-style: product profit by supplier nation and order year
# ---------------------------------------------------------------------------
Q9_NAME_SUBSTR = "red"


def product_profit(sf_dir: str, name_substr: str = Q9_NAME_SUBSTR) -> ray.data.Dataset:
    """(n_name, order_year, profit_cents) for parts whose name contains
    ``name_substr`` (TPC-H Q9 analog; the input hint has no partsupp
    table, so supply cost is taken as p_retailprice — same join/aggregate
    shape, different cost column).  profit = extprice*(1-disc) -
    retailprice*qty, in exact integer cents.  Part prunes the fact before
    the one lineitem x orders exchange."""
    from ifctordf_ray.functions.kernels import join_ready
    from ifctordf_ray.tuning import join_kwargs

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )
    li = attach_dimension(
        li,
        f"{sf_dir}/part.parquet",
        key_col="p_partkey",
        probe_col="l_partkey",
        val_cols=["p_name", "p_retailprice"],
    )

    def prep(t: pa.Table) -> pa.Table:
        f = t.filter(pc.match_substring(t["p_name"], name_substr))
        profit = pc.subtract(
            _cents(pc.multiply(f["l_extendedprice"], pc.subtract(1.0, f["l_discount"]))),
            _cents(pc.multiply(f["p_retailprice"], f["l_quantity"])),
        )
        return pa.table(
            {
                "l_orderkey": f["l_orderkey"],
                "l_suppkey": f["l_suppkey"],
                "profit_cents": profit,
            }
        )

    li = attach_dimension(
        li.map_batches(prep, batch_format="pyarrow"),
        f"{sf_dir}/supplier.parquet",
        key_col="s_suppkey",
        probe_col="l_suppkey",
        val_cols=["s_nationkey"],
    )
    li = attach_dimension(
        li,
        f"{sf_dir}/nation.parquet",
        key_col="n_nationkey",
        probe_col="s_nationkey",
        val_cols=["n_name"],
    )

    # the li side is filtered by part-name substring -> empty blocks
    # possible; project to the join schema and arm it (orders side is an
    # unfiltered map, never empty)
    li = join_ready(
        li.map_batches(
            lambda t: pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "n_name": t["n_name"],
                    "profit_cents": t["profit_cents"],
                }
            ),
            batch_format="pyarrow",
        ),
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("n_name", pa.string()),
                ("profit_cents", pa.int64()),
            ]
        ),
        sentinel_row={"l_orderkey": -1, "n_name": "", "profit_cents": 0},
    )

    orders = _read(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
    # arm the orders side too: "unfiltered" still yields ZERO blocks on a
    # fully-empty table (sentinel -2 never matches li's -1)
    orders = join_ready(
        orders.map_batches(
            lambda t: pa.table(
                {
                    "o_orderkey": t["o_orderkey"],
                    "order_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        pa.schema([("o_orderkey", pa.int64()), ("order_year", pa.int64())]),
        sentinel_row={"o_orderkey": -2, "order_year": 0},
    )
    joined = li.join(
        orders,
        join_type="inner",
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        **join_kwargs(),
    )
    return (
        joined.map_batches(
            lambda t: pa.table(
                {
                    "n_name": t["n_name"],
                    "order_year": t["order_year"],
                    "profit_cents": t["profit_cents"],
                }
            ),
            batch_format="pyarrow",
        )
        .groupby(["n_name", "order_year"])
        .aggregate(Sum("profit_cents", alias_name="profit_cents"))
    )


def product_profit_sql(name_substr: str = Q9_NAME_SUBSTR) -> str:
    return f"""
    SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
           CAST(sum(
             CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5) AS BIGINT)
             - CAST(floor(p.p_retailprice * l.l_quantity * 100.0 + 0.5) AS BIGINT)
           ) AS BIGINT) AS profit_cents
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE contains(p.p_name, '{name_substr}')
    GROUP BY n.n_name, year(o.o_orderdate)
    """


# ---------------------------------------------------------------------------
# Q15-style: top supplier(s) by revenue inside one ship-date quarter
# ---------------------------------------------------------------------------
Q15_START = "1996-01-01"
Q15_END = "1996-04-01"


def top_supplier(
    sf_dir: str, start: str = Q15_START, end: str = Q15_END
) -> ray.data.Dataset:
    """(s_suppkey, s_name, total_revenue_cents) of the supplier(s) whose
    quarterly revenue equals the global max — ties all kept (TPC-H Q15).
    Physical plan: pruned fact scan -> per-supplier groupby (output is
    |supplier|-sized, NOT fact-sized) -> that small aggregate is
    materialized once and reused for the global max + the equality
    filter; supplier names attach via the thresholded dimension probe."""
    import datetime as _dt

    lo = _dt.datetime.fromisoformat(start)
    hi = _dt.datetime.fromisoformat(end)
    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
            pc.less(t["l_shipdate"], pa.scalar(hi)),
        )
        f = t.filter(keep)
        return pa.table(
            {
                "l_suppkey": f["l_suppkey"],
                "revenue_cents": _cents(
                    pc.multiply(f["l_extendedprice"], pc.subtract(1.0, f["l_discount"]))
                ),
            }
        )

    rev = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("revenue_cents", alias_name="total_revenue_cents"))
        .materialize()  # |supplier|-sized (two consumers: max + filter)
    )
    best = rev.max("total_revenue_cents")

    def keep_best(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["total_revenue_cents"], pa.scalar(best, pa.int64())))
        return pa.table(
            {
                "s_suppkey": pc.cast(f["l_suppkey"], pa.int64()),
                "total_revenue_cents": f["total_revenue_cents"],
            }
        )

    out = rev.map_batches(keep_best, batch_format="pyarrow")
    out = attach_dimension(
        out,
        f"{sf_dir}/supplier.parquet",
        key_col="s_suppkey",
        probe_col="s_suppkey",
        val_cols=["s_name"],
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": t["s_suppkey"],
                "s_name": t["s_name"],
                "total_revenue_cents": t["total_revenue_cents"],
            }
        ),
        batch_format="pyarrow",
    )


def top_supplier_sql(start: str = Q15_START, end: str = Q15_END) -> str:
    return f"""
    WITH rev AS (
        SELECT l_suppkey,
               CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_revenue_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{start}' AND l_shipdate < TIMESTAMP '{end}'
        GROUP BY l_suppkey
    )
    SELECT CAST(rev.l_suppkey AS BIGINT) AS s_suppkey, s.s_name, rev.total_revenue_cents
    FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
    WHERE rev.total_revenue_cents = (SELECT max(total_revenue_cents) FROM rev)
    """


# ---------------------------------------------------------------------------
# Q19-style: disjunctive brand/size/quantity predicate revenue
# ---------------------------------------------------------------------------
Q19_BANDS = (
    ("Brand#1", 1, 10, 1.0, 15.0),
    ("Brand#2", 1, 20, 10.0, 25.0),
    ("Brand#3", 1, 30, 20.0, 35.0),
)


def disjunctive_revenue(sf_dir: str, bands=Q19_BANDS):
    """One-row (revenue_cents,) over three OR'd (brand, size range,
    quantity range) predicate bands (TPC-H Q19 analog).  The whole
    disjunction evaluates as vectorized Arrow masks inside one
    map_batches after the part attach; the global sum is an aggregate,
    never a driver-side row loop."""
    import pandas as pd

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    li = attach_dimension(
        li,
        f"{sf_dir}/part.parquet",
        key_col="p_partkey",
        probe_col="l_partkey",
        val_cols=["p_brand", "p_size"],
    )

    def mask(t: pa.Table) -> pa.Table:
        keep = None
        for brand, size_lo, size_hi, qty_lo, qty_hi in bands:
            m = pc.and_(
                pc.and_(
                    pc.equal(t["p_brand"], brand),
                    pc.and_(
                        pc.greater_equal(pc.cast(t["p_size"], pa.int64()), size_lo),
                        pc.less_equal(pc.cast(t["p_size"], pa.int64()), size_hi),
                    ),
                ),
                pc.and_(
                    pc.greater_equal(t["l_quantity"], qty_lo),
                    pc.less_equal(t["l_quantity"], qty_hi),
                ),
            )
            keep = m if keep is None else pc.or_(keep, m)
        f = t.filter(keep)
        return pa.table(
            {
                "revenue_cents": _cents(
                    pc.multiply(f["l_extendedprice"], pc.subtract(1.0, f["l_discount"]))
                )
            }
        )

    total = li.map_batches(mask, batch_format="pyarrow").sum("revenue_cents")
    return pd.DataFrame({"revenue_cents": [int(total or 0)]})


def disjunctive_revenue_sql(bands=Q19_BANDS) -> str:
    ors = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi}"
        f" AND l_quantity BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in bands
    )
    return f"""
    SELECT CAST(coalesce(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)), 0) AS BIGINT) AS revenue_cents
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE {ors}
    """


# ---------------------------------------------------------------------------
# Q16-shaped: distinct-supplier counts per part group, with NOT-IN exclusion
# ---------------------------------------------------------------------------
def part_supplier_counts(sf_dir: str) -> ray.data.Dataset:
    """(p_brand, p_size, supplier_cnt): how many DISTINCT suppliers ship
    each (brand, size) part group, excluding low-balance suppliers —
    TPC-H Q16's shape (count(distinct) + NOT IN subquery), with
    s_acctbal < 1000 standing in for the complaints LIKE filter (this
    schema's lineitem-derived predicates are degenerate: every supplier
    has returned lines, so a fact-side exclusion empties the result).

    Distributed plan: distinct (partkey, suppkey) pairs via one
    pre-combined groupby (the fact table's only shuffle) -> left_anti
    join against the excluded-supplier key set -> broadcast part
    dimension attach -> per-(brand, size) groupby over the
    ALREADY-DISTINCT pair table, so count(*) IS count(distinct)."""
    li = _read(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )

    def pairs(t: pa.Table) -> pa.Table:
        return (
            pa.table({"l_partkey": t["l_partkey"], "l_suppkey": t["l_suppkey"]})
            .group_by(["l_partkey", "l_suppkey"])
            .aggregate([])
        )

    pair_ds = (
        li.map_batches(pairs, batch_format="pyarrow")
        .groupby(["l_partkey", "l_suppkey"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(
            lambda t: t.select(["l_partkey", "l_suppkey"]),
            batch_format="pyarrow",
        )
    )

    supp = _read(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
    )
    bad = supp.map_batches(
        lambda t: pa.table(
            {"bad_suppkey": t.filter(pc.less(t["s_acctbal"], 1000.0))["s_suppkey"]}
        ),
        batch_format="pyarrow",
    )

    from ifctordf_ray.functions.kernels import safe_join

    pair_schema = pa.schema([("l_partkey", pa.int64()), ("l_suppkey", pa.int64())])
    bad_schema = pa.schema([("bad_suppkey", pa.int64())])
    kept = safe_join(
        pair_ds,
        pair_schema,
        bad,
        bad_schema,
        join_type="left_anti",
        on=("l_suppkey",),
        right_on=("bad_suppkey",),
    )

    kept = attach_dimension(
        kept,
        f"{sf_dir}/part.parquet",
        key_col="p_partkey",
        probe_col="l_partkey",
        val_cols=["p_brand", "p_size"],
    )
    # distinct (brand, size, suppkey) first: one supplier shipping several
    # parts of the same group must count once (count(DISTINCT) semantics)
    distinct_supp = (
        kept.map_batches(
            lambda t: pa.table(
                {
                    "p_brand": t["p_brand"],
                    "p_size": t["p_size"],
                    "l_suppkey": t["l_suppkey"],
                }
            )
            .group_by(["p_brand", "p_size", "l_suppkey"])
            .aggregate([]),
            batch_format="pyarrow",
        )
        .groupby(["p_brand", "p_size", "l_suppkey"])
        .aggregate(Count(alias_name="_n"))
    )
    return (
        distinct_supp.map_batches(
            lambda t: pa.table({"p_brand": t["p_brand"], "p_size": t["p_size"]}),
            batch_format="pyarrow",
        )
        .groupby(["p_brand", "p_size"])
        .aggregate(Count(alias_name="supplier_cnt"))
        .map_batches(
            lambda t: pa.table(
                {
                    "p_brand": t["p_brand"],
                    "p_size": pc.cast(t["p_size"], pa.int64()),
                    "supplier_cnt": pc.cast(t["supplier_cnt"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def part_supplier_counts_sql() -> str:
    return """
    SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
    )
    GROUP BY p_brand, p_size
    """


# ---------------------------------------------------------------------------
# Q3-style: shipping priority — top unshipped-revenue orders for one
# market segment.  customer prunes orders via the broadcast dimension
# attach; the single fact-fact exchange is lineitem x (filtered orders),
# both sides pre-filtered and projected at the read.
# ---------------------------------------------------------------------------
Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-01"
Q3_TOP_N = 10


def shipping_priority(
    sf_dir: str,
    segment: str = Q3_SEGMENT,
    cutoff: str = Q3_CUTOFF,
    top_n: int = Q3_TOP_N,
) -> ray.data.Dataset:
    """(l_orderkey, revenue_cents, o_orderdate, o_orderpriority): top
    ``top_n`` orders by pending revenue — ordered before ``cutoff`` by a
    ``segment`` customer, with lineitems shipping after it (TPC-H Q3;
    the input hint has no o_shippriority, so o_orderpriority rides
    along as the priority column)."""
    from ifctordf_ray.functions.kernels import safe_join

    cut = pa.scalar(cutoff).cast(pa.timestamp("us"))

    orders = attach_dimension(
        _read(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        ),
        f"{sf_dir}/customer.parquet",
        key_col="c_custkey",
        probe_col="o_custkey",
        val_cols=["c_mktsegment"],
    )

    def o_filter(t: pa.Table) -> pa.Table:
        f = t.filter(
            pc.and_(
                pc.equal(t["c_mktsegment"], segment),
                pc.less(t["o_orderdate"], cut),
            )
        )
        return pa.table(
            {
                "o_orderkey": f["o_orderkey"],
                "o_orderdate": f["o_orderdate"],
                "o_orderpriority": f["o_orderpriority"],
            }
        )

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def l_filter(t: pa.Table) -> pa.Table:
        f = t.filter(pc.greater(t["l_shipdate"], cut))
        rev = _cents(
            pc.multiply(f["l_extendedprice"], pc.subtract(1.0, f["l_discount"]))
        )
        return pa.table({"l_orderkey": f["l_orderkey"], "rev_cents": rev})

    # per-ORDER pre-aggregate before the exchange (combiner discipline)
    per_order = (
        li.map_batches(l_filter, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("rev_cents", alias_name="revenue_cents"))
    )
    joined = safe_join(
        per_order,
        pa.schema([("l_orderkey", pa.int64()), ("revenue_cents", pa.int64())]),
        orders.map_batches(o_filter, batch_format="pyarrow"),
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
        join_type="inner",
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    return (
        joined.map_batches(
            lambda t: t.select(
                ["l_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority"]
            ),
            batch_format="pyarrow",
        )
        .sort(
            ["revenue_cents", "o_orderdate", "l_orderkey"],
            descending=[True, False, False],
        )
        .limit(top_n)
    )


def shipping_priority_sql(
    segment: str = Q3_SEGMENT, cutoff: str = Q3_CUTOFF, top_n: int = Q3_TOP_N
) -> str:
    return f"""
    SELECT l.l_orderkey,
           CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = '{segment}'
      AND o.o_orderdate < TIMESTAMP '{cutoff}'
      AND l.l_shipdate  > TIMESTAMP '{cutoff}'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_cents DESC, o.o_orderdate ASC, l.l_orderkey ASC
    LIMIT {top_n}
    """


# ---------------------------------------------------------------------------
# Q6-style: forecast revenue change — the pure filter + scalar aggregate
# (no join, no groupby key: one combiner row per block, one global sum).
# ---------------------------------------------------------------------------
Q6_YEAR = 1997
Q6_DISC_LO = 0.04
Q6_DISC_HI = 0.06
Q6_MAX_QTY = 24.0


def forecast_revenue(
    sf_dir: str,
    year: int = Q6_YEAR,
    disc_lo: float = Q6_DISC_LO,
    disc_hi: float = Q6_DISC_HI,
    max_qty: float = Q6_MAX_QTY,
) -> ray.data.Dataset:
    """One row (revenue_cents, n_items): sum of extendedprice*discount
    over the Q6 band — ship year = ``year``, discount in
    [disc_lo, disc_hi], quantity < max_qty.  Everything is a narrow
    streaming filter; the only exchange is the two-scalar reduce."""
    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.equal(pc.year(t["l_shipdate"]), year),
                pc.less(t["l_quantity"], max_qty),
            ),
            pc.and_(
                pc.greater_equal(t["l_discount"], disc_lo),
                pc.less_equal(t["l_discount"], disc_hi),
            ),
        )
        f = t.filter(keep)
        rev = _cents(pc.multiply(f["l_extendedprice"], f["l_discount"]))
        return pa.table(
            {
                "rev": pa.array(
                    [pc.sum(rev).as_py() or 0], pa.int64()
                ),
                "n": pa.array([f.num_rows], pa.int64()),
            }
        )

    agg = li.map_batches(prep, batch_format="pyarrow").aggregate(
        Sum("rev", alias_name="rev"), Sum("n", alias_name="n")
    )
    out = pa.table(
        {
            "revenue_cents": pa.array([agg["rev"] or 0], pa.int64()),
            "n_items": pa.array([agg["n"] or 0], pa.int64()),
        }
    )
    return ray.data.from_arrow(out)


def forecast_revenue_sql(
    year: int = Q6_YEAR,
    disc_lo: float = Q6_DISC_LO,
    disc_hi: float = Q6_DISC_HI,
    max_qty: float = Q6_MAX_QTY,
) -> str:
    return f"""
    SELECT CAST(coalesce(sum(CAST(floor(l_extendedprice * l_discount * 100.0 + 0.5) AS BIGINT)), 0) AS BIGINT) AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE year(l_shipdate) = {year}
      AND l_discount >= {disc_lo} AND l_discount <= {disc_hi}
      AND l_quantity < {max_qty}
    """


# ---------------------------------------------------------------------------
# Q12-style: line-status priority counts — fact x fact join with a
# conditional (CASE WHEN) aggregate.  The input hint has no l_shipmode,
# so l_linestatus plays the mode column; semantics otherwise Q12.
# ---------------------------------------------------------------------------
Q12_YEAR = 1997
Q12_HIGH = ("1-URGENT", "2-HIGH")


def linestatus_priority(
    sf_dir: str, year: int = Q12_YEAR
) -> ray.data.Dataset:
    """(l_linestatus, high_line_count, low_line_count) over lineitems
    shipped in ``year``: how many came from high-priority orders
    (1-URGENT / 2-HIGH) vs the rest (TPC-H Q12 shape)."""
    from ifctordf_ray.functions.kernels import safe_join

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linestatus", "l_shipdate"],
    )

    def l_filter(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(pc.year(t["l_shipdate"]), year))
        return pa.table(
            {"l_orderkey": f["l_orderkey"], "l_linestatus": f["l_linestatus"]}
        )

    orders = _read(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    joined = safe_join(
        li.map_batches(l_filter, batch_format="pyarrow"),
        pa.schema([("l_orderkey", pa.int64()), ("l_linestatus", pa.string())]),
        orders,
        pa.schema([("o_orderkey", pa.int64()), ("o_orderpriority", pa.string())]),
        join_type="inner",
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def split(t: pa.Table) -> pa.Table:
        hi = pc.cast(
            pc.is_in(t["o_orderpriority"], pa.array(list(Q12_HIGH))), pa.int64()
        )
        return pa.table(
            {
                "l_linestatus": t["l_linestatus"],
                "high": hi,
                "low": pc.subtract(1, hi),
            }
        )

    return (
        joined.map_batches(split, batch_format="pyarrow")
        .groupby("l_linestatus")
        .aggregate(
            Sum("high", alias_name="high_line_count"),
            Sum("low", alias_name="low_line_count"),
        )
    )


def linestatus_priority_sql(year: int = Q12_YEAR) -> str:
    hi = ", ".join(f"'{p}'" for p in Q12_HIGH)
    return f"""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ({hi}) THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority IN ({hi}) THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE year(l.l_shipdate) = {year}
    GROUP BY l.l_linestatus
    """


# ---------------------------------------------------------------------------
# Q2-style: minimum-cost supplier per part (argmin join-back).  The
# schema has no partsupp table, so the (part, supplier) supply cost is
# derived from lineitem: min observed unit price in integer cents.  The
# per-part argmin with supplier tiebreak is ONE packed-integer Min
# aggregate (no join-back on float equality, no window shuffle): packed
# = cost_cents * PACK + suppkey, exact in int64 under the asserted
# bounds.
# ---------------------------------------------------------------------------
Q2_SIZE_LO, Q2_SIZE_HI = 10, 20
_Q2_PACK = 10**9  # suppkey < 1e9 and cost_cents < ~9.2e9: packed fits int64


def min_cost_supplier(sf_dir: str) -> ray.data.Dataset:
    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
    )

    def unit(t: pa.Table) -> pa.Table:
        cost = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(
                        pc.divide(t["l_extendedprice"], t["l_quantity"]), 100.0
                    ),
                    0.5,
                )
            ),
            pa.int64(),
        )
        # per-batch pre-combine before the shuffle
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "l_suppkey": t["l_suppkey"],
                "cost_cents": cost,
            }
        ).group_by(["l_partkey", "l_suppkey"]).aggregate(
            [("cost_cents", "min")]
        ).rename_columns(["l_partkey", "l_suppkey", "cost_cents"])

    pairs = (
        li.map_batches(unit, batch_format="pyarrow")
        .groupby(["l_partkey", "l_suppkey"])
        .aggregate(Min("cost_cents", alias_name="min_cost_cents"))
    )

    def pack(t: pa.Table) -> pa.Table:
        import numpy as np

        sk = t["l_suppkey"].to_numpy()
        cc = t["min_cost_cents"].to_numpy()
        if len(sk):
            assert sk.max() < _Q2_PACK and sk.min() >= 0, "suppkey outside pack domain"
            assert cc.max() < (2**63) // _Q2_PACK and cc.min() >= 0, (
                "cost outside pack domain"
            )
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "packed": pa.array(cc * _Q2_PACK + sk, pa.int64()),
            }
        )

    win = (
        pairs.map_batches(pack, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Min("packed", alias_name="packed_min"))
    )

    def unpack(t: pa.Table) -> pa.Table:
        import numpy as np

        packed = t["packed_min"].to_numpy()
        return pa.table(
            {
                "p_partkey": t["l_partkey"],
                "l_suppkey": pa.array(packed % _Q2_PACK, pa.int64()),
                "min_cost_cents": pa.array(packed // _Q2_PACK, pa.int64()),
            }
        )

    winners = win.map_batches(unpack, batch_format="pyarrow")
    winners = attach_dimension(
        winners,
        f"{sf_dir}/part.parquet",
        key_col="p_partkey",
        probe_col="p_partkey",
        val_cols=["p_name", "p_size"],
    )
    winners = winners.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t["p_size"], Q2_SIZE_LO),
                pc.less_equal(t["p_size"], Q2_SIZE_HI),
            )
        ),
        batch_format="pyarrow",
    )
    winners = attach_dimension(
        winners,
        f"{sf_dir}/supplier.parquet",
        key_col="s_suppkey",
        probe_col="l_suppkey",
        val_cols=["s_name"],
    )
    return winners.map_batches(
        lambda t: pa.table(
            {
                "p_partkey": t["p_partkey"],
                "p_name": t["p_name"],
                "s_name": t["s_name"],
                "min_cost_cents": t["min_cost_cents"],
            }
        ),
        batch_format="pyarrow",
    )


def min_cost_supplier_sql() -> str:
    return f"""
    WITH pairs AS (
        SELECT l_partkey, l_suppkey,
               min(CAST(floor(l_extendedprice / l_quantity * 100.0 + 0.5) AS BIGINT))
                   AS min_cost_cents
        FROM lineitem GROUP BY 1, 2
    ), w AS (
        SELECT *, row_number() OVER (
            PARTITION BY l_partkey ORDER BY min_cost_cents, l_suppkey
        ) AS rn
        FROM pairs
    )
    SELECT p.p_partkey, p.p_name, s.s_name, w.min_cost_cents
    FROM w
    JOIN part p ON p.p_partkey = w.l_partkey
    JOIN supplier s ON s.s_suppkey = w.l_suppkey
    WHERE w.rn = 1 AND p.p_size BETWEEN {Q2_SIZE_LO} AND {Q2_SIZE_HI}
    """


# ---------------------------------------------------------------------------
# Q11-style: important parts — per-part value share vs a GLOBAL scalar.
# TPC-H Q11 scales its HAVING fraction by 1/SF; the self-normalizing
# analog keeps parts whose lineitem value exceeds 1.2x the MEAN part
# value, exact in integer arithmetic at every scale (value * n_parts *
# 10 > total * 12).  Distributed plan: one per-part groupby (the only
# corpus shuffle) materialized at part-count size, its global total +
# count reduced distributively, then a broadcast-scalar filter.
# ---------------------------------------------------------------------------
Q11_NUM, Q11_DEN = 12, 10  # keep parts with value > (NUM/DEN) x mean


def important_parts(sf_dir: str) -> ray.data.Dataset:
    li = _read(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_extendedprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "l_partkey": t["l_partkey"],
                    "value_cents": _cents(t["l_extendedprice"]),
                }
            )
            .group_by("l_partkey")
            .aggregate([("value_cents", "sum")])
            .rename_columns(["l_partkey", "value_cents"])
        )

    per_part = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("value_cents", alias_name="value_cents"))
        .materialize()  # part-count-sized; consumed twice (scalars + filter)
    )
    total = per_part.sum("value_cents") or 0
    n_parts = per_part.count()
    if n_parts == 0:
        return per_part  # empty in == empty out, schema preserved
    return per_part.map_batches(
        lambda t: t.filter(
            pc.greater(
                pc.multiply(t["value_cents"], n_parts * Q11_DEN),
                total * Q11_NUM,
            )
        ),
        batch_format="pyarrow",
    )


def important_parts_sql() -> str:
    return f"""
    WITH v AS (
        SELECT l_partkey,
               sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS value_cents
        FROM lineitem GROUP BY 1
    )
    SELECT l_partkey, CAST(value_cents AS BIGINT) AS value_cents FROM v
    WHERE value_cents * (SELECT count(*) FROM v) * {Q11_DEN}
          > (SELECT sum(value_cents) FROM v) * {Q11_NUM}
    """


# ---------------------------------------------------------------------------
# Q20-style: ramping suppliers — correlated 2x-threshold semi-join.  A
# (part, supplier) pair "ramps" when its 1995 shipped quantity exceeds
# half its all-time quantity (Q20's availqty > 0.5 * sum(qty) shape
# without a partsupp table); output is each qualifying supplier with its
# ramping-part count.  ONE fact shuffle: both the windowed and total
# quantity are conditional sums in the same pre-combined groupby.
# ---------------------------------------------------------------------------
Q20_YEAR = 1995


def ramping_suppliers(sf_dir: str) -> ray.data.Dataset:
    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        qc = pc.cast(
            pc.floor(pc.add(pc.multiply(t["l_quantity"], 100.0), 0.5)), pa.int64()
        )
        in_win = pc.equal(pc.year(t["l_shipdate"]), Q20_YEAR)
        q_win = pc.if_else(in_win, qc, pa.scalar(0, pa.int64()))
        return (
            pa.table(
                {
                    "l_partkey": t["l_partkey"],
                    "l_suppkey": t["l_suppkey"],
                    "q_tot": qc,
                    "q_win": q_win,
                }
            )
            .group_by(["l_partkey", "l_suppkey"])
            .aggregate([("q_tot", "sum"), ("q_win", "sum")])
            .rename_columns(["l_partkey", "l_suppkey", "q_tot", "q_win"])
        )

    pairs = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_partkey", "l_suppkey"])
        .aggregate(
            Sum("q_tot", alias_name="q_tot"), Sum("q_win", alias_name="q_win")
        )
    )
    qual = pairs.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater(t["q_win"], 0),
                pc.greater(pc.multiply(t["q_win"], 2), t["q_tot"]),
            )
        ),
        batch_format="pyarrow",
    )
    per_supp = (
        qual.map_batches(
            lambda t: t.select(["l_suppkey"]), batch_format="pyarrow"
        )
        .groupby("l_suppkey")
        .aggregate(Count(alias_name="n_ramping_parts"))
    )
    per_supp = attach_dimension(
        per_supp,
        f"{sf_dir}/supplier.parquet",
        key_col="s_suppkey",
        probe_col="l_suppkey",
        val_cols=["s_name"],
    )
    return per_supp.map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": t["l_suppkey"],
                "s_name": t["s_name"],
                "n_ramping_parts": pc.cast(t["n_ramping_parts"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def ramping_suppliers_sql() -> str:
    return f"""
    WITH pair AS (
        SELECT l_partkey, l_suppkey,
               sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS q_tot,
               sum(CASE WHEN year(l_shipdate) = {Q20_YEAR}
                        THEN CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)
                        ELSE 0 END) AS q_win
        FROM lineitem GROUP BY 1, 2
    ), qual AS (
        SELECT * FROM pair WHERE q_win > 0 AND 2 * q_win > q_tot
    )
    SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS n_ramping_parts
    FROM qual JOIN supplier s ON s.s_suppkey = qual.l_suppkey
    GROUP BY 1, 2
    """
