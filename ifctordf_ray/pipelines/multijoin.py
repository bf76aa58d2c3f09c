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
from ray.data.aggregate import Count, Sum

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
    from ifctordf_ray.tuning import join_kwargs

    joined = li.join(
        orders,
        join_type="inner",
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        **join_kwargs(),
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
