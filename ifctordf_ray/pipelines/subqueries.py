"""Subquery-shaped analytics (TPC-H Q4/Q10/Q17/Q18 analogs) + event funnel.

These cover the decorrelated-subquery operator family the engine had not
exercised yet: EXISTS semi joins (``Dataset.join left_semi``), HAVING
filters over grouped fact aggregates that then re-join the fact table,
and correlated-aggregate comparisons (x < f(avg-over-group)) computed as
aggregate ⋈ fact joins.  The reference engine has no analog (it is a
single-input converter); these are engine-level operator coverage, same
contract as pipelines/multijoin.py.

Scale notes (the 100-TB shape):
- every per-ORDER or per-PART aggregate shrinks the fact table before any
  join — the fact side shuffles at most once, pre-aggregated;
- aggregate-derived join inputs go through ``kernels.join_ready`` (Ray's
  groupby emits empty partitions as zero-COLUMN blocks that crash Acero
  inside Dataset.join — see kernels.join_ready for the full mechanism);
- dimensions (customer / nation) attach via the size-thresholded
  broadcast probe (functions/dimjoin.py), never a shuffle at test scale;
- monetary sums are integer cents, quantity comparisons are exact
  integer cross-multiplications (2*qty*cnt < sum), so every query has a
  bit-exact DuckDB oracle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from ifctordf_ray.functions.dimjoin import attach_dimension
from ifctordf_ray.functions.kernels import cents as _cents
from ifctordf_ray.functions.kernels import join_ready, safe_join
from ifctordf_ray.sources.transcripts import clean_read_parquet as _read
from ifctordf_ray.tuning import join_kwargs

TOP_N_CUSTOMERS = 20
LARGE_ORDER_MIN_QTY = 250  # Q18's "large volume" HAVING threshold


# ---------------------------------------------------------------------------
# Q10-style: returned-item revenue per customer (HAVING-free deep join)
# ---------------------------------------------------------------------------
def returned_item_revenue(
    sf_dir: str, top_n: int = TOP_N_CUSTOMERS
) -> ray.data.Dataset:
    """Top ``top_n`` customers by revenue from RETURNED lineitems
    (l_returnflag = 'R'), with name and nation.  Plan: filter+project at
    the read -> per-ORDER pre-aggregate (shrinks lineitem ~4x before any
    exchange) -> ONE distributed fact-fact join to orders -> per-CUSTOMER
    aggregate -> broadcast dimension attaches -> tiny global sort+limit."""
    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        rev = _cents(
            pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        )
        return pa.table({"l_orderkey": t["l_orderkey"], "rev_cents": rev})

    per_order = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("rev_cents", alias_name="rev_cents"))
    )
    orders = _read(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    # safe_join: per_order's groupby emits zero-column empty partitions;
    # an empty orders table is ZERO blocks on the right
    joined = safe_join(
        per_order,
        pa.schema([("l_orderkey", pa.int64()), ("rev_cents", pa.int64())]),
        orders,
        pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
        join_type="inner",
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    per_cust = joined.groupby("o_custkey").aggregate(
        Sum("rev_cents", alias_name="revenue_cents")
    )
    per_cust = attach_dimension(
        per_cust,
        f"{sf_dir}/customer.parquet",
        key_col="c_custkey",
        probe_col="o_custkey",
        val_cols=["c_name", "c_nationkey"],
    )
    per_cust = attach_dimension(
        per_cust,
        f"{sf_dir}/nation.parquet",
        key_col="n_nationkey",
        probe_col="c_nationkey",
        val_cols=["n_name"],
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "c_name": t["c_name"],
                "n_name": t["n_name"],
                "revenue_cents": t["revenue_cents"],
            }
        )

    return (
        per_cust.map_batches(project, batch_format="pyarrow")
        .sort(["revenue_cents", "o_custkey"], descending=[True, False])
        .limit(top_n)
    )


def returned_item_revenue_sql(top_n: int = TOP_N_CUSTOMERS) -> str:
    return f"""
    SELECT o.o_custkey, c.c_name, n.n_name,
           CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY o.o_custkey, c.c_name, n.n_name
    ORDER BY revenue_cents DESC, o.o_custkey ASC
    LIMIT {top_n}
    """


# ---------------------------------------------------------------------------
# Q18-style: large-volume orders (HAVING over a fact aggregate, re-joined)
# ---------------------------------------------------------------------------
def large_volume_orders(
    sf_dir: str, min_qty: int = LARGE_ORDER_MIN_QTY
) -> ray.data.Dataset:
    """Orders whose TOTAL lineitem quantity exceeds ``min_qty``, with the
    customer name attached (Q18's HAVING sum(l_quantity) > N).  The
    grouped-HAVING survivor set is tiny (~1% of orders at the default
    threshold), so the orders join runs against an aggregate-sized left
    side."""
    li = _read(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "qty": pc.cast(t["l_quantity"], pa.int64()),
            }
        )

    per_order = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("qty", alias_name="total_qty"))
    )

    def having(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["total_qty"], min_qty))

    orders = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    joined = safe_join(
        per_order.map_batches(having, batch_format="pyarrow"),
        pa.schema([("l_orderkey", pa.int64()), ("total_qty", pa.int64())]),
        orders,
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_totalprice", pa.float64()),
            ]
        ),
        join_type="inner",
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    joined = attach_dimension(
        joined,
        f"{sf_dir}/customer.parquet",
        key_col="c_custkey",
        probe_col="o_custkey",
        val_cols=["c_name"],
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "o_custkey": t["o_custkey"],
                "c_name": t["c_name"],
                "total_qty": t["total_qty"],
                "price_cents": _cents(t["o_totalprice"]),
            }
        )

    return joined.map_batches(project, batch_format="pyarrow")


def large_volume_orders_sql(min_qty: int = LARGE_ORDER_MIN_QTY) -> str:
    return f"""
    SELECT o.o_orderkey, o.o_custkey, c.c_name, s.total_qty,
           CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents
    FROM (
        SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS BIGINT)) > {min_qty}
    ) s
    JOIN orders o   ON s.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """


# ---------------------------------------------------------------------------
# Q17-style: small-quantity revenue vs per-part average (correlated agg)
# ---------------------------------------------------------------------------
def small_quantity_revenue(sf_dir: str) -> ray.data.Dataset:
    """One-row summary of lineitems whose quantity is below HALF the
    average quantity for their part (Q17's correlated AVG subquery,
    decorrelated): per-part (sum_qty, cnt) aggregate -> join back to the
    fact table -> exact integer filter 2*qty*cnt < sum_qty -> global sum.
    The per-part aggregate scales with |part| (SF-scaled), so the join
    back is a distributed hash join, NOT a broadcast."""
    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "qty": pc.cast(t["l_quantity"], pa.int64()),
                "price_cents": _cents(t["l_extendedprice"]),
            }
        )

    fact = li.map_batches(prep, batch_format="pyarrow")
    per_part = (
        fact.map_batches(
            lambda t: pa.table({"pk": t["l_partkey"], "qty": t["qty"]}),
            batch_format="pyarrow",
        )
        .groupby("pk")
        .aggregate(Sum("qty", alias_name="sum_qty"), Count(alias_name="cnt"))
    )
    joined = safe_join(
        fact,
        pa.schema(
            [
                ("l_partkey", pa.int64()),
                ("qty", pa.int64()),
                ("price_cents", pa.int64()),
            ]
        ),
        per_part,
        pa.schema(
            [("pk", pa.int64()), ("sum_qty", pa.int64()), ("cnt", pa.int64())]
        ),
        join_type="inner",
        on=("l_partkey",),
        right_on=("pk",),
    )

    def below_half_avg(t: pa.Table) -> pa.Table:
        # qty < 0.5 * (sum_qty / cnt)  <=>  2*qty*cnt < sum_qty (integers)
        lhs = pc.multiply(pc.multiply(t["qty"], pa.scalar(2, pa.int64())), t["cnt"])
        t = t.filter(pc.less(lhs, t["sum_qty"]))
        return pa.table({"price_cents": t["price_cents"]})

    small = joined.map_batches(below_half_avg, batch_format="pyarrow")
    agg = small.aggregate(
        Sum("price_cents", alias_name="sum_price_cents"),
        Count(alias_name="n_items"),
    )
    out = pa.table(
        {
            "sum_price_cents": pa.array(
                [agg["sum_price_cents"] or 0], pa.int64()
            ),
            "n_items": pa.array([agg["n_items"] or 0], pa.int64()),
        }
    )
    return ray.data.from_arrow(out)


def small_quantity_revenue_sql() -> str:
    return """
    SELECT CAST(coalesce(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)), 0) AS BIGINT) AS sum_price_cents,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN (
        SELECT l_partkey AS pk,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY l_partkey
    ) a ON l.l_partkey = a.pk
    WHERE 2 * CAST(l.l_quantity AS BIGINT) * a.cnt < a.sum_qty
    """


# ---------------------------------------------------------------------------
# Q4-style: EXISTS semi join -> priority counts (Dataset.join left_semi)
# ---------------------------------------------------------------------------
def priority_semi_orders(sf_dir: str) -> ray.data.Dataset:
    """Count of orders per o_orderpriority that have AT LEAST ONE returned
    lineitem — Q4's EXISTS subquery as a native ``left_semi``
    Dataset.join (the exact sibling of the Bloom-filter approximate semi
    join in relational.bloom_semi_join).  Both sides are filtered and
    projected at the read; the semi join emits only left columns, so the
    exchange carries 3 narrow columns."""
    orders = _read(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    li = _read(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    )

    def returned_only(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        return pa.table({"l_orderkey": t["l_orderkey"]})

    returned = li.map_batches(returned_only, batch_format="pyarrow")
    semi = safe_join(
        orders,
        pa.schema([("o_orderkey", pa.int64()), ("o_orderpriority", pa.string())]),
        returned,
        pa.schema([("l_orderkey", pa.int64())]),
        join_type="left_semi",
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )
    return semi.groupby("o_orderpriority").aggregate(Count(alias_name="n_orders"))


def priority_semi_orders_sql() -> str:
    return """
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """


# ---------------------------------------------------------------------------
# Event funnel: view -> click -> purchase with strictly increasing time
# ---------------------------------------------------------------------------
FUNNEL = ("view", "click", "purchase")


def event_funnel(sf_dir: str) -> ray.data.Dataset:
    """(stage, n_users) for the 3-stage funnel view -> click -> purchase,
    each later event STRICTLY AFTER the user's earliest previous-stage
    event.  Decorrelated into per-stage min-timestamp aggregates chained
    by joins — every exchange is per-USER aggregate-sized; no per-user
    Python scan, no ordered window state."""
    from ray.data.aggregate import Min

    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"])

    def stage_rows(stage: str):
        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["event_type"], stage))
            return pa.table({"user_id": t["user_id"], "ts": t["ts"]})

        return f

    ts_type = pa.timestamp("us")
    sentinel_ts = pa.scalar(0, ts_type).as_py()

    def min_per_user(ds, colname):
        agg = ds.groupby("user_id").aggregate(Min("ts", alias_name=colname))
        return join_ready(
            agg,
            pa.schema([("user_id", pa.int64()), (colname, ts_type)]),
            sentinel_row={"user_id": -1, colname: sentinel_ts},
        )

    v = min_per_user(ev.map_batches(stage_rows("view"), batch_format="pyarrow"), "t1")

    stage_schema = pa.schema([("user_id", pa.int64()), ("ts", ts_type)])
    clicks = ev.map_batches(stage_rows("click"), batch_format="pyarrow")
    c_joined = safe_join(
        clicks,
        stage_schema,
        v,
        pa.schema([("user_id", pa.int64()), ("t1", ts_type)]),
        join_type="inner",
        on=("user_id",),
        right_on=("user_id",),
    ).map_batches(
        lambda t: pa.table(
            {"user_id": t["user_id"], "ts": t["ts"]}
        ).filter(pc.greater(t["ts"], t["t1"])),
        batch_format="pyarrow",
    )
    c = min_per_user(c_joined, "t2")

    purchases = ev.map_batches(stage_rows("purchase"), batch_format="pyarrow")
    p_joined = safe_join(
        purchases,
        stage_schema,
        c,
        pa.schema([("user_id", pa.int64()), ("t2", ts_type)]),
        join_type="inner",
        on=("user_id",),
        right_on=("user_id",),
    ).map_batches(
        lambda t: pa.table(
            {"user_id": t["user_id"], "ts": t["ts"]}
        ).filter(pc.greater(t["ts"], t["t2"])),
        batch_format="pyarrow",
    )
    p = min_per_user(p_joined, "t3")

    # each stage dataset holds exactly one sentinel row (user_id = -1,
    # unreachable by real users) plus one row per qualifying user, so the
    # stage count is count() - 1 — robust to the zero-row blocks that
    # bypass map UDFs (see kernels.join_ready).
    def count_users(ds) -> int:
        return ds.count() - 1

    rows = pa.table(
        {
            "stage": pa.array(list(FUNNEL), pa.string()),
            "n_users": pa.array(
                [count_users(v), count_users(c), count_users(p)], pa.int64()
            ),
        }
    )
    return ray.data.from_arrow(rows)


def event_funnel_sql() -> str:
    return """
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t2 FROM events e
        JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t3 FROM events e
        JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
    )
    SELECT 'view' AS stage, (SELECT count(*) FROM v) AS n_users
    UNION ALL SELECT 'click', (SELECT count(*) FROM c)
    UNION ALL SELECT 'purchase', (SELECT count(*) FROM p)
    """


# ---------------------------------------------------------------------------
# Q21-shaped sole-blame attribution (multi-level self-aggregation + re-join)
# ---------------------------------------------------------------------------
BLAME_TOPK = 10


def blame_suppliers(sf_dir: str) -> ray.data.Dataset:
    """(s_name, numwait): TPC-H Q21's shape over the columns this schema
    has — suppliers who were the SOLE supplier with a returned ('R')
    line on a multi-supplier order, ranked by how often
    (TPCH-21.sql's waiting-supplier blame, with l_returnflag standing in
    for the receipt>commit lateness predicate this lineitem lacks).

    Distributed shape (the decorrelated form of Q21's EXISTS/NOT
    EXISTS pair): per-(order, supplier) any_r flags via one pre-combined
    groupby -> per-order supplier/blame counts via a second groupby over
    the ALREADY order-supplier-sized table -> hash join back on orderkey
    -> filter (any_r AND n_supp > 1 AND n_r = 1) -> per-supplier count
    -> size-thresholded supplier-name attach -> global top-k.  The fact
    table shuffles once, pre-aggregated; everything after is
    order-supplier-sized or smaller."""
    ds = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_returnflag"],
    )

    def prep(t: pa.Table) -> pa.Table:
        r = pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64())
        # per-block pre-combine: one row per (order, supplier) per block
        return (
            pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "l_suppkey": t["l_suppkey"],
                    "any_r": r,
                }
            )
            .group_by(["l_orderkey", "l_suppkey"])
            .aggregate([("any_r", "max")])
            .rename_columns(["l_orderkey", "l_suppkey", "any_r"])
        )

    from ray.data.aggregate import Max

    os = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_orderkey", "l_suppkey"])
        .aggregate(Max("any_r", alias_name="any_r"))
    )

    ord_stats = (
        os.map_batches(
            lambda t: pa.table({"o_key": t["l_orderkey"], "r": t["any_r"]}),
            batch_format="pyarrow",
        )
        .groupby("o_key")
        .aggregate(Count(alias_name="n_supp"), Sum("r", alias_name="n_r"))
    )

    from ifctordf_ray.functions.kernels import safe_join

    os_schema = pa.schema(
        [("l_orderkey", pa.int64()), ("l_suppkey", pa.int64()), ("any_r", pa.int64())]
    )
    st_schema = pa.schema(
        [("o_key", pa.int64()), ("n_supp", pa.int64()), ("n_r", pa.int64())]
    )
    joined = safe_join(
        os,
        os_schema,
        ord_stats,
        st_schema,
        join_type="inner",
        on=("l_orderkey",),
        right_on=("o_key",),
    )

    def blame(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(pc.equal(t["any_r"], 1), pc.greater(t["n_supp"], 1)),
            pc.equal(t["n_r"], 1),
        )
        return pa.table({"l_suppkey": t.filter(mask)["l_suppkey"]})

    per_supp = (
        joined.map_batches(blame, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Count(alias_name="numwait"))
    )
    named = attach_dimension(
        per_supp,
        f"{sf_dir}/supplier.parquet",
        key_col="s_suppkey",
        probe_col="l_suppkey",
        val_cols=["s_name"],
    ).map_batches(
        lambda t: pa.table(
            {"s_name": t["s_name"], "numwait": pc.cast(t["numwait"], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    return named.sort(
        ["numwait", "s_name"], descending=[True, False]
    ).limit(BLAME_TOPK)


def blame_suppliers_sql(k: int = BLAME_TOPK) -> str:
    return f"""
    WITH os AS (
        SELECT l_orderkey, l_suppkey,
               max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS any_r
        FROM lineitem GROUP BY 1, 2
    ),
    o AS (
        SELECT l_orderkey, count(*) AS n_supp, sum(any_r) AS n_r
        FROM os GROUP BY 1
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM os
    JOIN o USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE any_r = 1 AND n_supp > 1 AND n_r = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT {k}
    """
