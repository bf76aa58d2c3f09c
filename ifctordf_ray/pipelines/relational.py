"""Relational operator coverage over the TPC-H-ish tables.

The reference has no relational operators beyond its maps/joins/dedup
(SURVEY.md §2.8 — no sort/topk/sampling in IFCtoRDF); these pipelines
exercise the engine-level Ray Data operators a user of a general
data-processing engine needs — filter/project at the read, grouped
aggregation with algebraic pre-combine, broadcast hash join, sort/top-k,
and tumbling windows — each with an exact DuckDB oracle.

Float-parity discipline: monetary aggregates are summed as integer cents
(floor(x*100 + 0.5), identical in numpy and DuckDB) because distributed
double summation is order-dependent and would never hash-match the
oracle; averages are ratios of exact integers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ifctordf_ray.sources.transcripts import clean_read_parquet as _clean_read_parquet
from ray.data.aggregate import Count, Max, Min, Sum


from ifctordf_ray.functions.kernels import cents as _cents  # noqa: E402


# ---------------------------------------------------------------------------
# Q1-style pricing summary (filter -> project -> grouped aggregate)
# ---------------------------------------------------------------------------
def pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """Grouped aggregate with column-pruned read + algebraic aggregates
    (pre-combined per block before the shuffle)."""
    ds = _clean_read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        ],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.less_equal(t["l_shipdate"], pa.scalar(pa.scalar("1998-09-02").cast(pa.timestamp("us"))))
        )
        disc_price = pc.multiply(
            t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])
        )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": pc.cast(t["l_quantity"], pa.int64()),
                "base_cents": _cents(t["l_extendedprice"]),
                "disc_cents": _cents(disc_price),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("base_cents", alias_name="sum_base_cents"),
            Sum("disc_cents", alias_name="sum_disc_cents"),
            Count(alias_name="count_order"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        avg_qty = pc.divide(pc.cast(t["sum_qty"], pa.float64()),
                            pc.cast(t["count_order"], pa.float64()))
        return t.append_column("avg_qty", avg_qty)

    return agg.map_batches(finish, batch_format="pyarrow")


def pricing_summary_sql() -> str:
    return """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
           CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
           count(*) AS count_order,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """


# ---------------------------------------------------------------------------
# Broadcast hash join: orders x customer x nation -> revenue per nation
# ---------------------------------------------------------------------------
class JoinOrdersToNation:
    """Actor-pool broadcast join (small-side pattern, ray_guide 'Joins'):
    customer+nation dimension tables are read ONCE per actor in __init__
    from a ray.put handle and probed per batch with a vectorized
    dictionary-take — no shuffle of the big (orders) side."""

    def __init__(self, cust_nation_ref):
        import numpy as np

        cust_key, nation_name = ray.get(cust_nation_ref)
        self.np = np
        # dense custkey -> nation-name index (custkeys are 1..N); empty
        # dimension -> 1-slot all-miss table (probe only runs if orders
        # has rows, and a missing key maps to null)
        self.max_key = int(cust_key.max()) if len(cust_key) else 0
        lookup = np.full(self.max_key + 1, -1, dtype=np.int32)
        lookup[cust_key] = nation_name[1]
        self.lookup = lookup
        self.names = nation_name[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch["o_custkey"].to_numpy()
        nation_idx = self.lookup[keys]
        names = pa.DictionaryArray.from_arrays(
            pa.array(nation_idx, pa.int32()), pa.array(self.names, pa.string())
        ).cast(pa.string())
        return pa.table(
            {
                "n_name": names,
                "price_cents": _cents(batch["o_totalprice"]),
            }
        )


# broadcast the customer dimension only while it fits comfortably in a
# worker heap / the object store; beyond this the driver would build a
# multi-GB dense array (customer grows with SF — the r2 scale `weak`).
BROADCAST_MAX_ROWS = 2_000_000


def nation_revenue(
    sf_dir: str, broadcast_max_rows: int = BROADCAST_MAX_ROWS
) -> ray.data.Dataset:
    """orders x customer x nation revenue rollup with a SIZE-THRESHOLDED
    physical plan: customer below `broadcast_max_rows` (parquet metadata,
    no data read) -> broadcast dense-array probe (no shuffle of orders);
    above it -> distributed Dataset.join orders->customer, with only the
    fixed 25-row nation table broadcast.  The reference always
    dict-looks-up (L1) because its state is ~MBs; customer is the one
    dimension here that scales with the data."""
    import numpy as np
    import pyarrow.parquet as pq

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    n_names = nation["n_name"].to_pylist()
    nat_pos = {k: i for i, k in enumerate(nation["n_nationkey"].to_pylist())}

    orders = _clean_read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    n_cust = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    if n_cust <= broadcast_max_rows:
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        cust_key = cust["c_custkey"].to_numpy()
        cust_nat_pos = np.array(
            [nat_pos[k] for k in cust["c_nationkey"].to_pylist()], dtype=np.int32
        )
        ref = ray.put((cust_key, (n_names, cust_nat_pos)))
        joined = orders.map_batches(
            JoinOrdersToNation,
            fn_constructor_kwargs={"cust_nation_ref": ref},
            max_restarts=0,  # constructor args hold ObjectRefs (ray#53727 warning)
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    else:
        from ifctordf_ray.tuning import join_kwargs

        cust_ds = _clean_read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        big = orders.join(
            cust_ds,
            join_type="inner",
            on=("o_custkey",),
            right_on=("c_custkey",),
            **join_kwargs(),
        )
        # nation stays broadcast: 25 rows, scale-independent
        names_arr = pa.array(n_names, pa.string())
        nat_idx = {k: i for k, i in nat_pos.items()}

        def attach_nation(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            idx = pc.index_in(
                t["c_nationkey"],
                pa.array(list(nat_idx)).cast(t["c_nationkey"].type),
            )
            names = pc.take(names_arr, idx)
            return pa.table(
                {"n_name": names, "price_cents": _cents(t["o_totalprice"])}
            )

        joined = big.map_batches(attach_nation, batch_format="pyarrow")
    return joined.groupby("n_name").aggregate(
        Count(alias_name="n_orders"),
        Sum("price_cents", alias_name="revenue_cents"),
    )


def nation_revenue_sql() -> str:
    return """
    SELECT n.n_name, count(*) AS n_orders,
           CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """


# ---------------------------------------------------------------------------
# Distributed hash join (both sides large): Dataset.join
# ---------------------------------------------------------------------------
def order_lineitem_join(sf_dir: str) -> ray.data.Dataset:
    """Large-large hash join via Dataset.join (hash-partitioned on the
    key), then grouped aggregate: line count + revenue per order priority."""
    orders = _clean_read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    lineitem = _clean_read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"]
    ).map_batches(
        lambda t: pa.table(
            {"l_orderkey": t["l_orderkey"], "price_cents": _cents(t["l_extendedprice"])}
        ),
        batch_format="pyarrow",
    )
    from ifctordf_ray.functions.kernels import safe_join

    joined = safe_join(
        lineitem,
        pa.schema([("l_orderkey", pa.int64()), ("price_cents", pa.int64())]),
        orders,
        pa.schema([("o_orderkey", pa.int64()), ("o_orderpriority", pa.string())]),
        join_type="inner",
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    return joined.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_lines"),
        Sum("price_cents", alias_name="revenue_cents"),
    )


def order_lineitem_join_sql() -> str:
    return """
    SELECT o.o_orderpriority, count(*) AS n_lines,
           CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """


# ---------------------------------------------------------------------------
# Sort / top-k
# ---------------------------------------------------------------------------
def top_orders(sf_dir: str) -> ray.data.Dataset:
    """Global sort (range shuffle) + limit; deterministic tie-break on the
    unique key."""
    ds = _clean_read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    return ds.map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "price_cents": _cents(t["o_totalprice"]),
            }
        ),
        batch_format="pyarrow",
    ).sort(["price_cents", "o_orderkey"], descending=[True, False]).limit(10)


def top_orders_sql() -> str:
    return """
    SELECT o_orderkey, o_custkey,
           CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents
    FROM orders
    ORDER BY price_cents DESC, o_orderkey ASC
    LIMIT 10
    """


# ---------------------------------------------------------------------------
# Tumbling window over the event stream
# ---------------------------------------------------------------------------
def events_daily_window(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1-day window per (user, event_type): floor_temporal inside
    map_batches (no per-row Python), then grouped aggregate — the
    streaming-window analog for a batch log (ray_guide 'Streaming-shaped
    workloads')."""
    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "day": pc.floor_temporal(t["ts"], unit="day"),
                "value_cents": _cents(t["value"]),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["user_id", "event_type", "day"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_cents", alias_name="sum_value_cents"),
            Min("value_cents", alias_name="min_value_cents"),
            Max("value_cents", alias_name="max_value_cents"),
        )
    )

    # Ray's sort-based groupby can round-trip the timestamp key through a
    # coarser physical precision; pin the output dtype to the oracle's
    # (DuckDB date_trunc -> timestamp[us]) so value hashes are bit-stable.
    def pin_day(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("day"),
            "day",
            pc.cast(t["day"], pa.timestamp("us")),
        )

    return agg.map_batches(pin_day, batch_format="pyarrow")


def events_daily_window_sql() -> str:
    return """
    SELECT user_id, event_type, date_trunc('day', ts) AS day,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents,
           min(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS min_value_cents,
           max(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS max_value_cents
    FROM events
    GROUP BY user_id, event_type, date_trunc('day', ts)
    """


# ---------------------------------------------------------------------------
# Sessionization (gap-based windows, per-user ordered state)
# ---------------------------------------------------------------------------
SESSION_GAP_MIN = 30


def _sessionize_group(g: pa.Table) -> pa.Table:
    import numpy as np

    g = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    new_session = np.ones(len(ts), dtype=bool)
    if len(ts) > 1:
        new_session[1:] = (ts[1:] - ts[:-1]) > gap_us
    session_seq = np.cumsum(new_session) - 1
    # vectorized "u{uid}-s{seq}" (the r2 per-row f-string list-comp)
    sid = pc.binary_join_element_wise(
        "u",
        pc.cast(g["user_id"], pa.string()),
        "-s",
        pc.cast(pa.array(session_seq, pa.int64()), pa.string()),
        "",
    )
    out = pa.table({"user_id": g["user_id"], "session_id": sid})
    return (
        out.group_by(["user_id", "session_id"])
        .aggregate([("session_id", "count")])
        .rename_columns(["user_id", "session_id", "n_events"])
    )


def sessionize(sf_dir: str) -> ray.data.Dataset:
    """Gap-based sessionization: groupby(user) + in-group ordered scan —
    the per-key ordered-state pattern (same shuffle shape as conversation
    assembly)."""
    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return ds.groupby("user_id").map_groups(
        _sessionize_group, batch_format="pyarrow"
    )


def sessionize_sql() -> str:
    return f"""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) - 1 AS session_seq
        FROM ordered
    )
    SELECT user_id,
           printf('u%d-s%d', user_id, CAST(session_seq AS BIGINT)) AS session_id,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, session_seq
    """


# ---------------------------------------------------------------------------
# Broadcast anti join (semi/anti pattern: broadcast the key set, filter)
# ---------------------------------------------------------------------------
def orders_without_lineitem(sf_dir: str) -> ray.data.Dataset:
    """Orders with no lineitem rows: distributed ANTI join
    (Dataset.join left_anti, hash-partitioned on the key).  The probe
    side is pre-deduplicated per block (a narrow map) so the exchange
    moves at most one key per (block, key), not the raw fact table.
    At 100x data neither side ever lands on the driver."""
    orders = _clean_read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
    )
    line_keys = _clean_read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    ).map_batches(
        # per-block dedup: shrink the shuffle before the join exchange
        lambda t: pa.table({"l_orderkey": pc.unique(t["l_orderkey"])}),
        batch_format="pyarrow",
    )
    from ifctordf_ray.functions.kernels import safe_join

    anti = safe_join(
        orders,
        pa.schema([("o_orderkey", pa.int64()), ("o_orderstatus", pa.string())]),
        line_keys,
        pa.schema([("l_orderkey", pa.int64())]),
        join_type="left_anti",
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )
    return anti.map_batches(
        lambda t: t.select(["o_orderkey", "o_orderstatus"]),
        batch_format="pyarrow",
    )


def orders_without_lineitem_sql() -> str:
    return """
    SELECT o_orderkey, o_orderstatus FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """


# ---------------------------------------------------------------------------
# Per-group top-k (windowed rank)
# ---------------------------------------------------------------------------
TOPK_PER_CUST = 3


def _top_orders_group(g: pa.Table) -> pa.Table:
    import numpy as np

    g = g.sort_by([("price_cents", "descending"), ("o_orderkey", "ascending")])
    out = g.slice(0, TOPK_PER_CUST)
    return out.append_column(
        "rank", pa.array(np.arange(1, out.num_rows + 1), pa.int64())
    )


def top_orders_per_customer(sf_dir: str) -> ray.data.Dataset:
    """Top-3 orders per customer: groupby(key).map_groups with in-group
    sort — the windowed-rank pattern (row_number() OVER PARTITION BY)."""
    ds = _clean_read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "price_cents": _cents(t["o_totalprice"]),
            }
        ),
        batch_format="pyarrow",
    )
    return ds.groupby("o_custkey").map_groups(
        _top_orders_group, batch_format="pyarrow"
    )


def top_orders_per_customer_sql() -> str:
    return f"""
    SELECT o_custkey, o_orderkey, price_cents, rank FROM (
        SELECT o_custkey, o_orderkey,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) DESC,
                            o_orderkey ASC) AS rank
        FROM orders
    ) WHERE rank <= {TOPK_PER_CUST}
    """


# ---------------------------------------------------------------------------
# Union + global distinct (set operation)
# ---------------------------------------------------------------------------
def active_entity_keys(sf_dir: str) -> ray.data.Dataset:
    """Distinct union of two key streams (customers with orders, suppliers
    with stock): Dataset.union -> sorted-dedup distinct (the engine's D2
    primitive on relational data)."""
    from ifctordf_ray.stages.extract import distinct

    a = _clean_read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    ).map_batches(
        lambda t: pa.table(
            {"kind": pa.nulls(t.num_rows, pa.string()).fill_null("cust"),
             "key": t["o_custkey"]}
        ),
        batch_format="pyarrow",
    )
    b = _clean_read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey"]
    ).map_batches(
        lambda t: pa.table(
            {"kind": pa.nulls(t.num_rows, pa.string()).fill_null("supp"),
             "key": t["s_suppkey"]}
        ),
        batch_format="pyarrow",
    )
    return distinct(a.union(b), ["kind", "key"])


def active_entity_keys_sql() -> str:
    return """
    SELECT DISTINCT kind, key FROM (
        SELECT 'cust' AS kind, o_custkey AS key FROM orders
        UNION ALL
        SELECT 'supp', s_suppkey FROM supplier
    )
    """


# ---------------------------------------------------------------------------
# Ordered running aggregate (cumulative window frame)
# ---------------------------------------------------------------------------
def _running_total_group(g: pa.Table) -> pa.Table:
    import numpy as np

    g = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
    cents = _cents(g["value"]).to_numpy()
    return pa.table(
        {
            "user_id": g["user_id"],
            "event_id": g["event_id"],
            "running_cents": pa.array(np.cumsum(cents), pa.int64()),
        }
    )


def user_running_totals(sf_dir: str) -> ray.data.Dataset:
    """Per-user cumulative spend in event order — the ordered-state /
    running-window pattern (sum() OVER ... ROWS UNBOUNDED PRECEDING):
    groupby(key) + in-group sort + vectorized cumsum.  Exact integer
    arithmetic -> hash-level parity with the SQL window frame."""
    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    return ds.groupby("user_id").map_groups(
        _running_total_group, batch_format="pyarrow"
    )


def user_running_totals_sql() -> str:
    return """
    SELECT user_id, event_id,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
    FROM events
    """


# ---------------------------------------------------------------------------
# Exact distributed quantiles (histogram pre-aggregation, no full sort)
# ---------------------------------------------------------------------------
QUANTILES = (("p50_cents", 0.5), ("p95_cents", 0.95), ("p99_cents", 0.99))


def value_quantiles(sf_dir: str) -> ray.data.Dataset:
    """Exact per-event-type value quantiles (percentile_disc semantics:
    the first value whose cumulative fraction reaches q).

    Physical shape for scale: NOT a per-group sort of raw rows — the
    integer-cents value domain is bounded, so an algebraic
    groupby(event_type, value) count builds a pre-combined histogram
    (the shuffle moves one row per (block, type, distinct value)), and
    the quantile selection walks each type's small histogram.  At 100x
    data the histogram size is unchanged."""
    from ifctordf_ray.sources.transcripts import clean_read_parquet

    ds = clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": t["event_type"], "v": _cents(t["value"])}
        )

    hist = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "v"])
        .aggregate(Count(alias_name="n"))
    )

    def pick(group: pa.Table) -> pa.Table:
        import numpy as np

        g = group.sort_by("v")
        v = g["v"].to_numpy()
        n = g["n"].to_numpy()
        cum = np.cumsum(n)
        total = int(cum[-1])
        row = {"event_type": [g["event_type"][0].as_py()]}
        for name, q in QUANTILES:
            # percentile_disc: first v with cum/total >= q
            i = int(np.searchsorted(cum, q * total, side="left"))
            if cum[i] < q * total:  # float guard
                i += 1
            row[name] = [int(v[i])]
        return pa.table(
            {
                "event_type": pa.array(row["event_type"], pa.string()),
                **{
                    name: pa.array(row[name], pa.int64())
                    for name, _ in QUANTILES
                },
            }
        )

    return hist.groupby("event_type").map_groups(pick, batch_format="pyarrow")


def value_quantiles_sql() -> str:
    cols = ",\n           ".join(
        f"CAST(percentile_disc({q}) WITHIN GROUP (ORDER BY v) AS BIGINT) AS {name}"
        for name, q in QUANTILES
    )
    return f"""
    SELECT event_type,
           {cols}
    FROM (SELECT event_type,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
          FROM events)
    GROUP BY event_type
    """


# ---------------------------------------------------------------------------
# As-of join (the classic custom operator Ray Data lacks): for every
# event, the customer's most recent order at-or-before the event time.
# Composition: union-tag both streams -> groupby(key) -> in-group time
# sort -> forward fill.  ONE shuffle on the join key; no per-event probe.
# ---------------------------------------------------------------------------
def _asof_group(g: pa.Table) -> pa.Table:
    import numpy as np

    g = g.sort_by(
        [("ts", "ascending"), ("kind", "ascending"), ("okey", "ascending")]
    )
    kind = g["kind"].to_numpy()          # 0 = order, 1 = event
    okey = g["okey"].to_numpy()
    n = len(kind)
    idx = np.arange(n)
    last_order = np.maximum.accumulate(np.where(kind == 0, idx, -1))
    matched = np.where(last_order >= 0, okey[np.maximum(last_order, 0)], -1)
    ev = kind == 1
    return pa.table(
        {
            "event_id": pc.filter(g["okey"], pa.array(ev)),  # events carry event_id in okey
            "user_id": pc.filter(g["user_id"], pa.array(ev)),
            "ts": pc.filter(g["ts"], pa.array(ev)),
            "o_orderkey": pa.array(matched[ev], pa.int64()),
        }
    )


def events_asof_orders(sf_dir: str) -> ray.data.Dataset:
    """As-of join events->orders on (user_id ~ o_custkey, ts >=
    o_orderdate); match = the order with the greatest o_orderdate <= ts,
    greatest o_orderkey breaking date ties; -1 when no prior order.

    Tie discipline: the in-group sort is (ts, kind, okey) with orders
    (kind 0) before events (kind 1) at equal ts — so a same-instant
    order matches (>= semantics) — and forward fill takes the LAST order
    row, i.e. max orderkey at the winning date, matching the SQL
    `ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1`."""
    events = _clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "kind": pa.nulls(t.num_rows, pa.int8()).fill_null(1),
                "okey": t["event_id"],   # events carry event_id here
            }
        ),
        batch_format="pyarrow",
    )
    orders = _clean_read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(
        lambda t: pa.table(
            {
                "user_id": t["o_custkey"],
                "ts": t["o_orderdate"],
                "kind": pa.nulls(t.num_rows, pa.int8()).fill_null(0),
                "okey": t["o_orderkey"],
            }
        ),
        batch_format="pyarrow",
    )
    tagged = events.union(orders)
    return tagged.groupby("user_id").map_groups(
        _asof_group, batch_format="pyarrow"
    )


def events_asof_orders_sql() -> str:
    return """
    SELECT e.event_id, e.user_id, e.ts,
           CAST(coalesce(
               (SELECT o.o_orderkey FROM orders o
                WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1),
               -1) AS BIGINT) AS o_orderkey
    FROM events e
    """


# ---------------------------------------------------------------------------
# Range join: events matched to value bands by interval containment.
# Small banded side broadcast; probe = one vectorized searchsorted per
# batch (no shuffle of the fact side) — the banded-range pattern that
# generalizes to any static interval dimension.
# ---------------------------------------------------------------------------
VALUE_BANDS: tuple[tuple[str, float, float], ...] = (
    # (band, lo inclusive, hi exclusive); contiguous so searchsorted works
    ("micro", 0.0, 10.0),
    ("small", 10.0, 50.0),
    ("mid", 50.0, 150.0),
    ("large", 150.0, 400.0),
    ("jumbo", 400.0, float("inf")),
)


def events_value_band_join(sf_dir: str) -> ray.data.Dataset:
    """Range join events.value -> band via containment, then a grouped
    rollup per (band, event_type).  Bands are a static broadcast side;
    each batch probes with one np.searchsorted — a range join without
    any inequality-join shuffle."""
    import numpy as np

    lows = np.array([b[1] for b in VALUE_BANDS], dtype=np.float64)
    names = pa.array([b[0] for b in VALUE_BANDS], pa.string())

    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def band(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy()
        idx = np.searchsorted(lows, v, side="right") - 1
        idx = np.clip(idx, 0, len(lows) - 1)
        return pa.table(
            {
                "band": pc.take(names, pa.array(idx, pa.int32())),
                "event_type": t["event_type"],
                "value_cents": _cents(t["value"]),
            }
        )

    return (
        ds.map_batches(band, batch_format="pyarrow")
        .groupby(["band", "event_type"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_cents", alias_name="sum_value_cents"),
        )
    )


def events_value_band_join_sql() -> str:
    bands = " UNION ALL ".join(
        f"SELECT '{n}' AS band, CAST({lo} AS DOUBLE) AS lo, "
        + (f"CAST({hi} AS DOUBLE) AS hi" if hi != float("inf") else "CAST('inf' AS DOUBLE) AS hi")
        for n, lo, hi in VALUE_BANDS
    )
    return f"""
    WITH bands AS ({bands})
    SELECT b.band, e.event_type, count(*) AS n_events,
           CAST(sum(CAST(floor(e.value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_value_cents
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band, e.event_type
    """


# ---------------------------------------------------------------------------
# Sliding time window (the windowed-aggregate custom operator): per
# event, the rolling 7-day event count + value sum for its user.
# groupby(user) + in-group sort + vectorized two-pointer window — no
# per-event scan, no self-join explosion.
# ---------------------------------------------------------------------------
ROLLING_WINDOW_DAYS = 7


def _rolling_group(g: pa.Table) -> pa.Table:
    import numpy as np

    g = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    cents = g["value_cents"].to_numpy()
    win = ROLLING_WINDOW_DAYS * 86_400_000_000
    # RANGE semantics, both bounds closed: window = [ts_i - 7d, ts_i],
    # INCLUDING peer rows with ts == ts_i that sort after row i (SQL's
    # RANGE ... AND CURRENT ROW counts all ties, not just predecessors)
    left = np.searchsorted(ts, ts - win, side="left")
    right = np.searchsorted(ts, ts, side="right")  # ties included
    csum = np.concatenate(([0], np.cumsum(cents)))
    n_in_win = right - left
    sum_in_win = csum[right] - csum[left]
    return pa.table(
        {
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "ts": g["ts"],
            "n_7d": pa.array(n_in_win, pa.int64()),
            "sum_value_cents_7d": pa.array(sum_in_win, pa.int64()),
        }
    )


def user_rolling_window(sf_dir: str) -> ray.data.Dataset:
    """Rolling [ts-7d, ts] window per user: event count + integer-cents
    value sum.  ONE groupby(user) shuffle; the window itself is a
    cumulative-sum difference between two searchsorted pointers."""
    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    ).map_batches(
        lambda t: pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "value_cents": _cents(t["value"]),
            }
        ),
        batch_format="pyarrow",
    )
    return ds.groupby("user_id").map_groups(_rolling_group, batch_format="pyarrow")


def user_rolling_window_sql() -> str:
    return f"""
    SELECT event_id, user_id, ts,
           CAST(count(*) OVER w AS BIGINT) AS n_7d,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER w AS BIGINT)
               AS sum_value_cents_7d
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts
        RANGE BETWEEN INTERVAL {ROLLING_WINDOW_DAYS} DAYS PRECEDING
                  AND CURRENT ROW
    )
    """


# ---------------------------------------------------------------------------
# Bloom-filter semi join: the broadcast-filter pattern for a selective
# build side.  The Bloom bitmap is built distributed (per-block bit
# positions -> global distinct, <= BLOOM_M rows), broadcast once via
# ray.put, and probed inside map_batches — the fact table never enters
# a join exchange.  False positives are PART OF THE SPEC (deterministic
# md5 positions), so the result — semi-join survivors plus the bloom's
# false positives — is exactly SQL-replicable.
# ---------------------------------------------------------------------------
BLOOM_M = 4096  # bits
BLOOM_K = 3  # hash functions (md5 of key || '|' || seed)


def _bloom_positions(keys, seed: int) -> "pa.Array":
    from ifctordf_ray.functions.kernels import stable_hash64

    return pa.array(
        [stable_hash64(f"{k}|{seed}") % BLOOM_M for k in keys], pa.int64()
    )


def bloom_semi_join(sf_dir: str) -> ray.data.Dataset:
    """Distinct lineitem order keys that pass a Bloom filter built from
    finished orders ('F' status): (l_orderkey, n_lines).  At 100 TB the
    bitmap is BLOOM_M bits however large the build side — the broadcast
    is O(1) — and the probe is a narrow map; only the surviving keys
    (build selectivity x fact keys + false positives) reach the final
    groupby."""
    import numpy as np

    build = _clean_read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
    )

    def build_bits(t: pa.Table) -> pa.Table:
        keys = t.filter(pc.equal(t["o_orderstatus"], "F"))["o_orderkey"].to_pylist()
        pos = set()
        for s in range(BLOOM_K):
            pos.update(_bloom_positions(keys, s).to_pylist())
        return pa.table({"p": pa.array(sorted(pos), pa.int64())})

    # per-block positions -> global distinct (<= BLOOM_M rows) -> driver
    pos_rows = (
        build.map_batches(build_bits, batch_format="pyarrow")
        .groupby("p")
        .aggregate(Count(alias_name="_n"))
        .take_all()
    )
    bits = np.zeros(BLOOM_M, dtype=bool)
    bits[[r["p"] for r in pos_rows]] = True
    bits_ref = ray.put(bits)

    class Probe:
        def __init__(self, ref):
            self.bits = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["l_orderkey"].to_pylist()
            ok = np.ones(len(keys), dtype=bool)
            for s in range(BLOOM_K):
                ok &= self.bits[_bloom_positions(keys, s).to_numpy()]
            return t.filter(pa.array(ok))

    probe = _clean_read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    ).map_batches(
        Probe,
        fn_constructor_args=(bits_ref,),
        batch_format="pyarrow",
        concurrency=(1, 4),
        max_restarts=0,  # constructor args hold ObjectRefs (ray#53727 warning)
    )
    return probe.groupby("l_orderkey").aggregate(Count(alias_name="n_lines"))


def bloom_semi_join_sql() -> str:
    seeds = ", ".join(str(s) for s in range(BLOOM_K))
    return f"""
    WITH pos AS (
        SELECT DISTINCT
               md5_number_upper(CAST(o_orderkey AS VARCHAR) || '|' || s) % {BLOOM_M}
                   AS p
        FROM orders CROSS JOIN (SELECT unnest([{seeds}]) AS s)
        WHERE o_orderstatus = 'F'
    )
    SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    WHERE NOT EXISTS (
        SELECT 1 FROM (SELECT unnest([{seeds}]) AS s) sd
        WHERE md5_number_upper(CAST(l.l_orderkey AS VARCHAR) || '|' || sd.s)
                  % {BLOOM_M}
              NOT IN (SELECT p FROM pos)
    )
    GROUP BY l_orderkey
    """


# ---------------------------------------------------------------------------
# Per-group discrete median (group-wise quantile)
# ---------------------------------------------------------------------------
def _median_group(g: pa.Table) -> pa.Table:
    vals = sorted(g["value"].to_pylist())
    return pa.table(
        {
            "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
            "n_events": pa.array([len(vals)], pa.int64()),
            "median_value": pa.array([vals[(len(vals) - 1) // 2]], pa.float64()),
        }
    )


def user_median_value(sf_dir: str) -> ray.data.Dataset:
    """(user_id, n_events, median_value): per-user discrete median event
    value — the lower-middle element, DuckDB quantile_disc(0.5)
    semantics, so the gated value is an EXISTING double from the data
    (no interpolation, no float-parity risk).  Group-keyed map_groups;
    group size is a user's event count."""
    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )
    return ds.groupby("user_id").map_groups(_median_group, batch_format="pyarrow")


def user_median_value_sql() -> str:
    return """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           quantile_disc(value, 0.5) AS median_value
    FROM events GROUP BY user_id
    """


# ---------------------------------------------------------------------------
# Left-outer dimension join: every customer with their order count and
# total (zero-order customers kept — the join_type="left_outer" path of
# Dataset.join, complementing the inner/anti variants above).
# ---------------------------------------------------------------------------
def customer_order_counts(sf_dir: str) -> ray.data.Dataset:
    """(c_custkey, c_mktsegment, n_orders, total_cents): per customer,
    order count and cents total; customers without orders appear with
    zeros.  The fact side is PRE-AGGREGATED per custkey before the join
    (combiner discipline), so the left-outer exchange moves one row per
    customer-with-orders, not the raw orders table."""
    cust = _clean_read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    per_cust = (
        _clean_read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(
            lambda t: pa.table(
                {"o_custkey": t["o_custkey"], "cents": _cents(t["o_totalprice"])}
            ),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .aggregate(
            Count(alias_name="n_orders"), Sum("cents", alias_name="total_cents")
        )
    )
    from ifctordf_ray.functions.kernels import safe_join

    # safe_join: an empty customer table is ZERO blocks on the left;
    # per_cust's groupby emits zero-column empty partitions
    joined = safe_join(
        cust,
        pa.schema([("c_custkey", pa.int64()), ("c_mktsegment", pa.string())]),
        per_cust,
        pa.schema(
            [
                ("o_custkey", pa.int64()),
                ("n_orders", pa.int64()),
                ("total_cents", pa.int64()),
            ]
        ),
        join_type="left_outer",
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_mktsegment": t["c_mktsegment"],
                "n_orders": pc.fill_null(t["n_orders"], 0),
                "total_cents": pc.fill_null(t["total_cents"], 0),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def customer_order_counts_sql() -> str:
    return """
    SELECT c.c_custkey, c.c_mktsegment,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(coalesce(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)), 0)
                AS BIGINT) AS total_cents
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """


# ---------------------------------------------------------------------------
# Daily active users: two-level distinct aggregation — (day, user)
# distinct first (pre-aggregate, so the second shuffle moves one row per
# ACTIVE (day, user), not per event), then per-day counts.
# ---------------------------------------------------------------------------
def daily_active_users(sf_dir: str) -> ray.data.Dataset:
    ds = _clean_read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.timestamp("us"))
        # per-block (day, user) dedup: shrink the first exchange
        tb = pa.table({"day": day, "user_id": t["user_id"]})
        return tb.group_by(["day", "user_id"]).aggregate([])

    dau = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(
            lambda t: pa.table({"day": pc.cast(t["day"], pa.timestamp("us")),
                                "user_id": t["user_id"]}),
            batch_format="pyarrow",
        )
        .groupby("day")
        .aggregate(Count(alias_name="n_active_users"))
    )
    return dau.map_batches(
        lambda t: pa.table(
            {
                "day": pc.cast(t["day"], pa.timestamp("us")),
                "n_active_users": t["n_active_users"],
            }
        ),
        batch_format="pyarrow",
    )


def daily_active_users_sql() -> str:
    return """
    SELECT date_trunc('day', ts) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_users
    FROM events
    GROUP BY date_trunc('day', ts)
    """


# ---------------------------------------------------------------------------
# Per-user event-type transitions (ordered in-group state: the lag/lead
# window — a first-order Markov transition count table).
# ---------------------------------------------------------------------------
def _transitions_group(g: pa.Table) -> pa.Table:
    g = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
    et = g["event_type"].to_pylist()
    if len(et) < 2:
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "from_type": pa.array([], pa.string()),
                "to_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
    from collections import Counter

    c = Counter(zip(et[:-1], et[1:]))
    uid = g["user_id"][0].as_py()
    return pa.table(
        {
            "user_id": pa.array([uid] * len(c), pa.int64()),
            "from_type": pa.array([k[0] for k in c], pa.string()),
            "to_type": pa.array([k[1] for k in c], pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        }
    )


def event_transitions(sf_dir: str) -> ray.data.Dataset:
    """(user_id, from_type, to_type, n): counts of consecutive
    event-type pairs per user, ordered by (ts, event_id).  Group size is
    one user's event count — the same per-entity-ordered-state contract
    as sessionize/running totals."""
    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type", "ts"]
    )
    return ds.groupby("user_id").map_groups(
        _transitions_group, batch_format="pyarrow"
    )


def event_transitions_sql() -> str:
    return """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    )
    SELECT user_id, prev_type AS from_type, event_type AS to_type,
           CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY user_id, prev_type, event_type
    """


# ---------------------------------------------------------------------------
# Pivot (wide aggregation): per-user event counts as one column per
# event type.  The type vocabulary is CLOSED by spec (the five types the
# generator emits, TESTDATA.md); unseen types land in n_other so the
# operator is total.  Map-side partial pivot (block group_by -> one row
# per (user, block)), then a Sum-per-column groupby — the exchange moves
# pivoted partials, never raw events.
# ---------------------------------------------------------------------------
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_type_pivot(sf_dir: str) -> ray.data.Dataset:
    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def partial_pivot(t: pa.Table) -> pa.Table:
        cols = {"user_id": t["user_id"]}
        known = pa.array([False] * t.num_rows)
        for et in EVENT_TYPES:
            m = pc.equal(t["event_type"], et)
            cols[f"n_{et}"] = pc.cast(m, pa.int64())
            known = pc.or_(known, m)
        cols["n_other"] = pc.cast(pc.invert(known), pa.int64())
        return (
            pa.table(cols)
            .group_by(["user_id"])
            .aggregate([(f"n_{et}", "sum") for et in EVENT_TYPES] + [("n_other", "sum")])
            .rename_columns(
                ["user_id"] + [f"n_{et}" for et in EVENT_TYPES] + ["n_other"]
            )
        )

    aggs = [Sum(f"n_{et}", alias_name=f"n_{et}") for et in EVENT_TYPES]
    aggs.append(Sum("n_other", alias_name="n_other"))
    return (
        ds.map_batches(partial_pivot, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*aggs)
    )


def user_type_pivot_sql() -> str:
    cols = ",\n           ".join(
        f"CAST(count(*) FILTER (WHERE event_type = '{et}') AS BIGINT) AS n_{et}"
        for et in EVENT_TYPES
    )
    types_in = ", ".join(f"'{et}'" for et in EVENT_TYPES)
    return f"""
    SELECT user_id,
           {cols},
           CAST(count(*) FILTER (WHERE event_type NOT IN ({types_in})) AS BIGINT)
               AS n_other
    FROM events GROUP BY user_id
    """


# ---------------------------------------------------------------------------
# Hopping (overlapping) windows: 7-day windows advancing by 1 day — each
# event lands in 7 windows.  The overlap is materialized INSIDE the map
# (bounded 7x row expansion, no self-join), then one grouped aggregate.
# ---------------------------------------------------------------------------
HOP_WINDOW_DAYS = 7
_DAY_US = 86_400_000_000


def events_hopping_window(sf_dir: str) -> ray.data.Dataset:
    """(window_start, n_events, sum_value_cents): 7-day windows hopping
    daily; window [ws, ws+7d) contains every event whose day is in
    [ws, ws+7d)."""
    ds = _clean_read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def expand(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        cents = _cents(t["value"])
        parts = [
            pa.table(
                {
                    "window_start": pc.subtract(
                        day, pa.scalar(i * _DAY_US, pa.duration("us"))
                    ),
                    "value_cents": cents,
                }
            )
            for i in range(HOP_WINDOW_DAYS)
        ]
        return pa.concat_tables(parts)

    agg = (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_cents", alias_name="sum_value_cents"),
        )
    )

    def pin(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("window_start"),
            "window_start",
            pc.cast(t["window_start"], pa.timestamp("us")),
        )

    return agg.map_batches(pin, batch_format="pyarrow")


def events_hopping_window_sql() -> str:
    return f"""
    SELECT date_trunc('day', ts) - to_days(CAST(t.i AS INTEGER)) AS window_start,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
    FROM events CROSS JOIN (SELECT unnest(range({HOP_WINDOW_DAYS})) AS i) t
    GROUP BY 1
    """


# ---------------------------------------------------------------------------
# Full-outer join: per-nation BUILDING-customer counts vs rich-supplier
# counts — both sides pre-aggregated (one row per nation), so the outer
# exchange moves aggregate rows only.  Completes the join-type coverage
# (inner / left-outer / anti / bloom-semi / as-of / range already
# registered).  full_outer keeps unmatched rows from BOTH sides, so the
# join_ready sentinels (which an inner join drops for free) are filtered
# explicitly by their impossible key (-1).
# ---------------------------------------------------------------------------
NCS_SEGMENT = "BUILDING"
NCS_MIN_ACCTBAL = 3500.0


def nation_customer_supplier(sf_dir: str) -> ray.data.Dataset:
    """(nationkey, n_customers, n_suppliers): full-outer of per-nation
    BUILDING-customer counts and suppliers with acctbal > 3500."""
    from ifctordf_ray.functions.kernels import join_ready
    from ifctordf_ray.tuning import join_kwargs

    cust = (
        _clean_read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_mktsegment"]
        )
        .map_batches(
            lambda t: t.filter(
                pc.equal(t["c_mktsegment"], NCS_SEGMENT)
            ).select(["c_nationkey"]),
            batch_format="pyarrow",
        )
        .groupby("c_nationkey")
        .aggregate(Count(alias_name="n_customers"))
    )
    supp = (
        _clean_read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
        )
        .map_batches(
            lambda t: t.filter(
                pc.greater(t["s_acctbal"], NCS_MIN_ACCTBAL)
            ).select(["s_nationkey"]),
            batch_format="pyarrow",
        )
        .groupby("s_nationkey")
        .aggregate(Count(alias_name="n_suppliers"))
    )
    cust = join_ready(
        cust,
        pa.schema([("c_nationkey", pa.int64()), ("n_customers", pa.int64())]),
        sentinel_row={"c_nationkey": -1, "n_customers": 0},
    )
    supp = join_ready(
        supp,
        pa.schema([("s_nationkey", pa.int64()), ("n_suppliers", pa.int64())]),
        sentinel_row={"s_nationkey": -1, "n_suppliers": 0},
    )
    joined = cust.join(
        supp,
        join_type="full_outer",
        on=("c_nationkey",),
        right_on=("s_nationkey",),
        **join_kwargs(),
    )

    def finish(t: pa.Table) -> pa.Table:
        # Ray's full_outer join coalesces right_on into the left key
        # column when the names differ; fall back if both survive
        if "s_nationkey" in t.column_names:
            nk = pc.coalesce(t["c_nationkey"], t["s_nationkey"])
        else:
            nk = t["c_nationkey"]
        out = pa.table(
            {
                "nationkey": pc.cast(nk, pa.int64()),
                "n_customers": pc.fill_null(t["n_customers"], 0),
                "n_suppliers": pc.fill_null(t["n_suppliers"], 0),
            }
        )
        return out.filter(pc.not_equal(out["nationkey"], -1))

    return joined.map_batches(finish, batch_format="pyarrow")


def nation_customer_supplier_sql() -> str:
    return f"""
    WITH c AS (
        SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_customers
        FROM customer WHERE c_mktsegment = '{NCS_SEGMENT}' GROUP BY 1
    ),
    s AS (
        SELECT s_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_suppliers
        FROM supplier WHERE s_acctbal > {NCS_MIN_ACCTBAL} GROUP BY 1
    )
    SELECT CAST(coalesce(c.nk, s.nk) AS BIGINT) AS nationkey,
           CAST(coalesce(c.n_customers, 0) AS BIGINT) AS n_customers,
           CAST(coalesce(s.n_suppliers, 0) AS BIGINT) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """


def order_lineitem_join_salted(sf_dir: str, salt: int = 8) -> ray.data.Dataset:
    """order_lineitem_join with the SKEW-SALTED physical plan
    (functions/saltjoin.py): the lineitem side's rows spread over
    ``salt`` sub-keys and orders replicates salt-x, so one hot order id
    cannot serialize an aggregator.  Logically identical to the unsalted
    join — registered under the SAME SQL oracle, and asserted row-equal
    in tests."""
    from ifctordf_ray.functions.saltjoin import salted_join

    orders = _clean_read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    lineitem = _clean_read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"]
    ).map_batches(
        lambda t: pa.table(
            {"l_orderkey": t["l_orderkey"], "price_cents": _cents(t["l_extendedprice"])}
        ),
        batch_format="pyarrow",
    )
    joined = salted_join(
        lineitem,
        orders,
        on="l_orderkey",
        right_on="o_orderkey",
        salt=salt,
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("price_cents", pa.int64())]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_orderpriority", pa.string())]
        ),
    )
    return joined.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_lines"),
        Sum("price_cents", alias_name="revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Semi-structured extraction: pull the integer field `k` out of the JSON-ish
# `props` column with a vectorized regex (pc.extract_regex — Arrow's RE2, the
# same engine DuckDB uses) and aggregate per event type.  The classic
# "parse a JSON attribute at read time, never materialize the blob
# downstream" shape: the exchange moves per-batch combiner rows only.
# ---------------------------------------------------------------------------
PROPS_K_RE = r'"k": (?P<k>[0-9]+)'


def json_field_stats(sf_dir: str) -> ray.data.Dataset:
    """(event_type, n_events, n_with_k, sum_k, avg_k): stats of the JSON
    props field k.  avg is a quotient of exact integers -> float parity."""
    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def prep(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], pattern=PROPS_K_RE)
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        matched = pc.cast(pc.is_valid(k), pa.int64())
        tb = pa.table(
            {
                "event_type": t["event_type"],
                "_one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "_matched": matched,
                "_k": pc.fill_null(k, 0),
            }
        )
        # per-block combiner: one row per event_type per batch
        return tb.group_by("event_type").aggregate(
            [("_one", "sum"), ("_matched", "sum"), ("_k", "sum")]
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("_one_sum", alias_name="n_events"),
            Sum("_matched_sum", alias_name="n_with_k"),
            Sum("_k_sum", alias_name="sum_k"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_with_k"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["sum_k"].to_numpy(zero_copy_only=False).astype(np.int64)
        den = np.where(n > 0, n, 1).astype(np.float64)
        avg = np.where(n > 0, s.astype(np.float64) / den, 0.0)
        return pa.table(
            {
                "event_type": t["event_type"],
                "n_events": pc.cast(t["n_events"], pa.int64()),
                "n_with_k": pc.cast(t["n_with_k"], pa.int64()),
                "sum_k": pc.cast(t["sum_k"], pa.int64()),
                "avg_k": pa.array(avg, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def json_field_stats_sql() -> str:
    return r"""
    WITH e AS (
        SELECT event_type,
               TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(k) AS BIGINT) AS n_with_k,
           CAST(coalesce(sum(k), 0) AS BIGINT) AS sum_k,
           CASE WHEN count(k) > 0
                THEN CAST(sum(k) AS DOUBLE) / count(k)
                ELSE 0.0 END AS avg_k
    FROM e GROUP BY event_type
    """


# ---------------------------------------------------------------------------
# Monthly order trend: temporal truncation to month + grouped aggregate
# (the time-series rollup every reporting pipeline needs).  Month count is
# bounded (#years x 12) -> the exchange is tiny after per-block combine.
# ---------------------------------------------------------------------------
def monthly_order_stats(sf_dir: str) -> ray.data.Dataset:
    ds = _clean_read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        month = pc.cast(
            pc.floor_temporal(t["o_orderdate"], unit="month"), pa.timestamp("us")
        )
        tb = pa.table({"month": month, "_cents": _cents(t["o_totalprice"])})
        return tb.group_by("month").aggregate([("_cents", "sum"), ("_cents", "count")])

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("month")
        .aggregate(
            Sum("_cents_count", alias_name="n_orders"),
            Sum("_cents_sum", alias_name="revenue_cents"),
        )
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "month": pc.cast(t["month"], pa.timestamp("us")),
                "n_orders": pc.cast(t["n_orders"], pa.int64()),
                "revenue_cents": pc.cast(t["revenue_cents"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def monthly_order_stats_sql() -> str:
    return """
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders GROUP BY 1
    """


# ---------------------------------------------------------------------------
# Day-over-day user retention: the cohort query.  distinct (day, user)
# pairs self-joined one day apart — the join keys are epoch-day INTEGERS
# (timestamps make poor hash keys), both sides are post-aggregation sized
# (days x users upper bound, far below event count), and the final
# day-level join is aggregate-sized.
# ---------------------------------------------------------------------------
def user_retention(sf_dir: str) -> ray.data.Dataset:
    """(day, n_active, n_retained, retention): users active on day d who
    are also active on d+1."""
    from ifctordf_ray.functions.kernels import join_ready
    from ifctordf_ray.tuning import join_kwargs

    ds = _clean_read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        eday = pc.cast(
            pc.cast(
                pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.date32()),
                pa.int32(),
            ),
            pa.int64(),
        )
        tb = pa.table({"eday": eday, "user_id": t["user_id"]})
        return tb.group_by(["eday", "user_id"]).aggregate([])

    du = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["eday", "user_id"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(
            lambda t: pa.table(
                {
                    "eday": pc.cast(t["eday"], pa.int64()),
                    "user_id": pc.cast(t["user_id"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    pair_schema = pa.schema([("eday", pa.int64()), ("user_id", pa.int64())])
    nxt_schema = pa.schema([("eday_m1", pa.int64()), ("user_id_b", pa.int64())])
    a = join_ready(du, pair_schema, sentinel_row={"eday": -1, "user_id": -1})
    b = join_ready(
        du.map_batches(
            lambda t: pa.table(
                {
                    "eday_m1": pc.subtract(t["eday"], 1),
                    "user_id_b": t["user_id"],
                }
            ),
            batch_format="pyarrow",
        ),
        nxt_schema,
        sentinel_row={"eday_m1": -2, "user_id_b": -1},
    )
    retained = (
        a.join(
            b,
            join_type="inner",
            on=("eday", "user_id"),
            right_on=("eday_m1", "user_id_b"),
            **join_kwargs(),
        )
        .groupby("eday")
        .aggregate(Count(alias_name="n_retained"))
    )
    active = du.groupby("eday").aggregate(Count(alias_name="n_active"))
    act = join_ready(
        active,
        pa.schema([("eday", pa.int64()), ("n_active", pa.int64())]),
        sentinel_row={"eday": -1, "n_active": 0},
    )
    ret = join_ready(
        retained.map_batches(
            lambda t: pa.table(
                {
                    "eday_r": pc.cast(t["eday"], pa.int64()),
                    "n_retained": pc.cast(t["n_retained"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        pa.schema([("eday_r", pa.int64()), ("n_retained", pa.int64())]),
        sentinel_row={"eday_r": -1, "n_retained": 0},
    )

    joined = act.join(
        ret,
        join_type="left_outer",
        on=("eday",),
        right_on=("eday_r",),
        **join_kwargs(),
    )

    def finish(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.cast(pc.cast(t["eday"], pa.int32()), pa.date32()), pa.timestamp("us")
        )
        na = pc.fill_null(pc.cast(t["n_active"], pa.int64()), 0)
        nr = pc.fill_null(pc.cast(t["n_retained"], pa.int64()), 0)
        nav = na.to_numpy(zero_copy_only=False).astype(np.int64)
        nrv = nr.to_numpy(zero_copy_only=False).astype(np.int64)
        den = np.where(nav > 0, nav, 1).astype(np.float64)
        retention = np.where(nav > 0, nrv.astype(np.float64) / den, 0.0)
        out = pa.table(
            {
                "day": day,
                "n_active": na,
                "n_retained": nr,
                "retention": pa.array(retention, pa.float64()),
            }
        )
        return out.filter(pc.not_equal(t["eday"], -1))

    return joined.map_batches(finish, batch_format="pyarrow")


def user_retention_sql() -> str:
    return """
    WITH du AS (
        SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    act AS (SELECT day, CAST(count(*) AS BIGINT) AS n_active FROM du GROUP BY day),
    ret AS (
        SELECT a.day, CAST(count(*) AS BIGINT) AS n_retained
        FROM du a JOIN du b
          ON b.user_id = a.user_id AND b.day = a.day + INTERVAL 1 DAY
        GROUP BY a.day
    )
    SELECT act.day,
           act.n_active,
           coalesce(ret.n_retained, 0) AS n_retained,
           CASE WHEN act.n_active > 0
                THEN CAST(coalesce(ret.n_retained, 0) AS DOUBLE) / act.n_active
                ELSE 0.0 END AS retention
    FROM act LEFT JOIN ret ON act.day = ret.day
    """


# ---------------------------------------------------------------------------
# Dense-rank within group: top account holders per nation.  Groups are
# key-bounded (25 nations) but row-unbounded at scale — the per-group
# work is a sort + vectorized dense rank, and only the top RANK_K ranks
# leave the group, so the output (not the input) is bounded.  For
# unbounded single groups the range-sort approach (extract.distinct's
# pattern) is the scale path; nations are safe.
# ---------------------------------------------------------------------------
RANK_K = 10


def _rank_group(g: pa.Table) -> pa.Table:
    bal = g["c_acctbal"].to_numpy(zero_copy_only=False)
    order = np.lexsort((g["c_custkey"].to_numpy(zero_copy_only=False), -bal))
    bal_sorted = bal[order]
    # dense rank: 1 + number of DISTINCT higher balances
    uniq, inv = np.unique(-bal_sorted, return_inverse=True)
    rank = inv + 1  # -bal ascending == bal descending; dense by construction
    keep = rank <= RANK_K
    return pa.table(
        {
            "c_nationkey": pc.cast(g["c_nationkey"], pa.int64()).take(
                pa.array(order[keep])
            ),
            "c_custkey": pc.cast(g["c_custkey"], pa.int64()).take(
                pa.array(order[keep])
            ),
            "c_acctbal": pa.array(bal_sorted[keep], pa.float64()),
            "bal_rank": pa.array(rank[keep].astype(np.int64), pa.int64()),
        }
    )


def customer_rank_in_nation(sf_dir: str) -> ray.data.Dataset:
    """(nationkey, custkey, acctbal, bal_rank): customers whose DENSE rank
    by account balance within their nation is <= RANK_K (ties share a
    rank, so more than RANK_K rows per nation are possible)."""
    ds = _clean_read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )
    return ds.groupby("c_nationkey").map_groups(
        _rank_group, batch_format="pyarrow"
    )


def customer_rank_in_nation_sql() -> str:
    return f"""
    WITH r AS (
        SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
               CAST(c_custkey AS BIGINT) AS c_custkey,
               c_acctbal,
               CAST(dense_rank() OVER (
                   PARTITION BY c_nationkey ORDER BY c_acctbal DESC
               ) AS BIGINT) AS bal_rank
        FROM customer
    )
    SELECT * FROM r WHERE bal_rank <= {RANK_K}
    """


# ---------------------------------------------------------------------------
# Q13-style customer distribution: histogram of customers by order count,
# INCLUDING the zero-order bucket (the left-outer join feeding a second
# aggregate).  Composes customer_order_counts -> one more tiny groupby:
# the exchange after the join moves one row per distinct order count.
# ---------------------------------------------------------------------------
def custdist(sf_dir: str) -> ray.data.Dataset:
    """(n_orders, n_customers): how many customers placed exactly N
    orders (TPC-H Q13 shape)."""
    return (
        customer_order_counts(sf_dir)
        .groupby("n_orders")
        .aggregate(Count(alias_name="n_customers"))
        .map_batches(
            lambda t: pa.table(
                {
                    "n_orders": pc.cast(t["n_orders"], pa.int64()),
                    "n_customers": pc.cast(t["n_customers"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def custdist_sql() -> str:
    return """
    WITH per_cust AS (
        SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
    FROM per_cust GROUP BY n_orders
    """


# ---------------------------------------------------------------------------
# Set-operation cohorts WITHOUT set operations: users active on weekends
# vs weekdays.  INTERSECT / EXCEPT over distinct user sets would cost two
# distinct exchanges plus a join; flag-aggregation (max of two booleans
# per user, then a 3-row groupby) computes the same cohorts in ONE
# exchange of one row per user — the scale-correct plan for set ops whose
# inputs share a key.
# ---------------------------------------------------------------------------
def weekend_weekday_cohorts(sf_dir: str) -> ray.data.Dataset:
    """(cohort, n_users): cohort in {'both', 'weekday_only',
    'weekend_only'} by whether each user has weekday / weekend events."""
    ds = _clean_read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        # Arrow day_of_week: 0=Monday .. 6=Sunday
        dow = pc.day_of_week(t["ts"])
        wknd = pc.cast(pc.greater_equal(dow, 5), pa.int64())
        tb = pa.table(
            {
                "user_id": t["user_id"],
                "_wknd": wknd,
                "_wkdy": pc.subtract(1, wknd),
            }
        )
        return tb.group_by("user_id").aggregate([("_wknd", "max"), ("_wkdy", "max")])

    flags = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Max("_wknd_max", alias_name="has_wknd"),
            Max("_wkdy_max", alias_name="has_wkdy"),
        )
    )

    def label(t: pa.Table) -> pa.Table:
        wk = pc.equal(pc.cast(t["has_wknd"], pa.int64()), 1)
        wd = pc.equal(pc.cast(t["has_wkdy"], pa.int64()), 1)
        cohort = pc.if_else(
            pc.and_(wk, wd),
            pa.scalar("both"),
            pc.if_else(wk, pa.scalar("weekend_only"), pa.scalar("weekday_only")),
        )
        return pa.table({"cohort": cohort})

    return (
        flags.map_batches(label, batch_format="pyarrow")
        .groupby("cohort")
        .aggregate(Count(alias_name="n_users"))
    )


def weekend_weekday_cohorts_sql() -> str:
    return """
    WITH f AS (
        SELECT user_id,
               max(CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END) AS has_wknd,
               max(CASE WHEN isodow(ts) < 6 THEN 1 ELSE 0 END) AS has_wkdy
        FROM events GROUP BY user_id
    )
    SELECT CASE WHEN has_wknd = 1 AND has_wkdy = 1 THEN 'both'
                WHEN has_wknd = 1 THEN 'weekend_only'
                ELSE 'weekday_only' END AS cohort,
           CAST(count(*) AS BIGINT) AS n_users
    FROM f GROUP BY 1
    """


# ---------------------------------------------------------------------------
# Per-user inter-arrival statistics: ordered in-group state where the
# lagged value is ARITHMETIC (time difference), not categorical like
# event_transitions.  Gap sums are exact integer microseconds -> the mean
# is a quotient of exact integers (float parity).
# ---------------------------------------------------------------------------
def _interarrival_group(g: pa.Table) -> pa.Table:
    g = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
    ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    uid = g["user_id"][0].as_py()
    if len(ts) < 2:
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "n_gaps": pa.array([0], pa.int64()),
                "sum_gap_us": pa.array([0], pa.int64()),
                "max_gap_us": pa.array([0], pa.int64()),
                "avg_gap_us": pa.array([0.0], pa.float64()),
            }
        )
    gaps = np.diff(ts)
    n = int(gaps.size)
    s = int(gaps.sum())
    return pa.table(
        {
            "user_id": pa.array([uid], pa.int64()),
            "n_gaps": pa.array([n], pa.int64()),
            "sum_gap_us": pa.array([s], pa.int64()),
            "max_gap_us": pa.array([int(gaps.max())], pa.int64()),
            "avg_gap_us": pa.array([s / n], pa.float64()),
        }
    )


def user_interarrival(sf_dir: str) -> ray.data.Dataset:
    """(user_id, n_gaps, sum_gap_us, max_gap_us, avg_gap_us): statistics
    of the time between a user's consecutive events.  Per-user groups are
    bounded by a user's own event volume; for power-user skew the salted
    pre-split (stages/extract.extract_salted pattern) applies."""
    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return ds.groupby("user_id").map_groups(_interarrival_group, batch_format="pyarrow")


def user_interarrival_sql() -> str:
    return """
    WITH g AS (
        SELECT user_id,
               CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS BIGINT) AS gap_us
        FROM events
    )
    SELECT user_id,
           CAST(count(gap_us) AS BIGINT) AS n_gaps,
           CAST(coalesce(sum(gap_us), 0) AS BIGINT) AS sum_gap_us,
           CAST(coalesce(max(gap_us), 0) AS BIGINT) AS max_gap_us,
           CASE WHEN count(gap_us) > 0
                THEN CAST(sum(gap_us) AS DOUBLE) / count(gap_us)
                ELSE 0.0 END AS avg_gap_us
    FROM g GROUP BY user_id
    """


# ---------------------------------------------------------------------------
# Hopping-window DISTINCT counts: 7-day windows advancing daily, counting
# DISTINCT users per window.  Harder than the hopping SUM
# (events_hopping_window): distinct does not merge across overlaps, so
# the plan dedups (day, user) FIRST (events -> at most days x users
# rows), expands each surviving pair into its <=7 covering windows, and
# dedups (window, user) again — both exchanges move post-dedup rows.
# ---------------------------------------------------------------------------
HOP_WINDOW_DAYS = 7


def hopping_active_users(sf_dir: str) -> ray.data.Dataset:
    """(win_start, n_active_users): distinct users per 7-day hopping
    window advancing daily."""
    ds = _clean_read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        eday = pc.cast(
            pc.cast(
                pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.date32()),
                pa.int32(),
            ),
            pa.int64(),
        )
        tb = pa.table({"eday": eday, "user_id": t["user_id"]})
        return tb.group_by(["eday", "user_id"]).aggregate([])

    du = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["eday", "user_id"])
        .aggregate(Count(alias_name="_n"))
    )

    def expand(t: pa.Table) -> pa.Table:
        eday = pc.cast(t["eday"], pa.int64()).to_numpy(zero_copy_only=False)
        uid = pc.cast(t["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
        k = HOP_WINDOW_DAYS
        starts = np.repeat(eday, k) - np.tile(np.arange(k, dtype=np.int64), len(eday))
        users = np.repeat(uid, k)
        tb = pa.table(
            {
                "win": pa.array(starts, pa.int64()),
                "user_id": pa.array(users, pa.int64()),
            }
        )
        return tb.group_by(["win", "user_id"]).aggregate([])

    wu = (
        du.map_batches(expand, batch_format="pyarrow")
        .groupby(["win", "user_id"])
        .aggregate(Count(alias_name="_n"))
        .groupby("win")
        .aggregate(Count(alias_name="n_active_users"))
    )

    def finish(t: pa.Table) -> pa.Table:
        win_start = pc.cast(
            pc.cast(pc.cast(t["win"], pa.int32()), pa.date32()), pa.timestamp("us")
        )
        return pa.table(
            {
                "win_start": win_start,
                "n_active_users": pc.cast(t["n_active_users"], pa.int64()),
            }
        )

    return wu.map_batches(finish, batch_format="pyarrow")


def hopping_active_users_sql() -> str:
    return f"""
    WITH du AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
        FROM events
    ),
    wu AS (
        SELECT DISTINCT d - CAST(t.i AS INTEGER) AS win_start, user_id
        FROM du CROSS JOIN UNNEST(range({HOP_WINDOW_DAYS})) AS t(i)
    )
    SELECT CAST(win_start AS TIMESTAMP) AS win_start,
           CAST(count(*) AS BIGINT) AS n_active_users
    FROM wu GROUP BY win_start
    """


# ---------------------------------------------------------------------------
# Percent-of-total: each nation's share of global revenue.  The window
# `sum() OVER ()` shape — the distributed plan aggregates per nation
# (25-row result), then computes the global total ON the aggregate-sized
# result in a single final task (never a second pass over the fact
# table).  Shares are ratios of exact integer cents -> float parity.
# ---------------------------------------------------------------------------
def nation_revenue_share(sf_dir: str) -> ray.data.Dataset:
    """(n_name, revenue_cents, revenue_share)."""
    base = nation_revenue(sf_dir)  # (n_name, revenue_cents), hash-green

    def finish(t: pa.Table) -> pa.Table:
        cents = pc.cast(t["revenue_cents"], pa.int64())
        total = pc.sum(cents).as_py() or 0
        c = cents.to_numpy(zero_copy_only=False).astype(np.int64)
        share = (
            c.astype(np.float64) / float(total)
            if total > 0
            else np.zeros_like(c, float)
        )
        return pa.table(
            {
                "n_name": t["n_name"],
                "revenue_cents": cents,
                "revenue_share": pa.array(share, pa.float64()),
            }
        )

    # nation-count-sized: one block is the correct plan for the total
    return base.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


def nation_revenue_share_sql() -> str:
    return f"""
    WITH base AS ({nation_revenue_sql()})
    SELECT n_name, revenue_cents,
           CAST(revenue_cents AS DOUBLE) / sum(revenue_cents) OVER ()
               AS revenue_share
    FROM base
    """


# ---------------------------------------------------------------------------
# Per-user z-score outliers: group statistics joined BACK to the fact
# rows for per-row standardization (the feature-normalization shape every
# ML data pipeline needs).  Moments are exact integer cents through the
# exchange; mean/var/z use the identical IEEE expression tree on both
# engines (var = E[x^2] - E[x]^2 on exact-int-derived doubles), so the
# |z| > threshold boundary is bit-deterministic.
# ---------------------------------------------------------------------------
OUTLIER_Z = 2.0


def value_outliers(sf_dir: str) -> ray.data.Dataset:
    """(event_id, user_id, value_cents, z): events whose value is more
    than OUTLIER_Z population-std-devs from the user's mean."""
    from ifctordf_ray.functions.kernels import join_ready

    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        cents = _cents(t["value"])
        sq = pc.multiply(cents, cents)
        tb = pa.table(
            {"user_id": t["user_id"], "_c": cents, "_c2": sq}
        )
        return tb.group_by("user_id").aggregate(
            [("_c", "sum"), ("_c2", "sum"), ("_c", "count")]
        )

    stats = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Sum("_c_sum", alias_name="sum_c"),
            Sum("_c2_sum", alias_name="sum_c2"),
            Sum("_c_count", alias_name="n"),
        )
    )
    stats = join_ready(
        stats.map_batches(
            lambda t: pa.table(
                {
                    "u_stats": pc.cast(t["user_id"], pa.int64()),
                    "sum_c": pc.cast(t["sum_c"], pa.int64()),
                    "sum_c2": pc.cast(t["sum_c2"], pa.int64()),
                    "n": pc.cast(t["n"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        pa.schema(
            [
                ("u_stats", pa.int64()),
                ("sum_c", pa.int64()),
                ("sum_c2", pa.int64()),
                ("n", pa.int64()),
            ]
        ),
        sentinel_row={"u_stats": -1, "sum_c": 0, "sum_c2": 0, "n": 0},
    )
    fact = ds.map_batches(
        lambda t: pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "value_cents": _cents(t["value"]),
            }
        ),
        batch_format="pyarrow",
    )
    # safe_join: an empty events table makes the fact side ZERO blocks
    from ifctordf_ray.functions.kernels import safe_join

    joined = safe_join(
        fact,
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("user_id", pa.int64()),
                ("value_cents", pa.int64()),
            ]
        ),
        stats,
        pa.schema(
            [
                ("u_stats", pa.int64()),
                ("sum_c", pa.int64()),
                ("sum_c2", pa.int64()),
                ("n", pa.int64()),
            ]
        ),
        join_type="inner",
        on=("user_id",),
        right_on=("u_stats",),
    )

    def score(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n"], pa.float64())
        mean = pc.divide(pc.cast(t["sum_c"], pa.float64()), n)
        ex2 = pc.divide(pc.cast(t["sum_c2"], pa.float64()), n)
        var = pc.subtract(ex2, pc.multiply(mean, mean))
        std = pc.sqrt(var)
        x = pc.cast(t["value_cents"], pa.float64())
        z = pc.divide(pc.subtract(x, mean), std)
        out = pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "value_cents": pc.cast(t["value_cents"], pa.int64()),
                "z": z,
            }
        )
        keep = pc.and_(
            pc.greater(std, 0.0), pc.greater(pc.abs(z), OUTLIER_Z)
        )
        return out.filter(keep)

    return joined.map_batches(score, batch_format="pyarrow")


def value_outliers_sql() -> str:
    return f"""
    WITH f AS (
        SELECT event_id, user_id,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS value_cents
        FROM events
    ),
    s AS (
        SELECT user_id,
               CAST(sum(value_cents) AS BIGINT) AS sum_c,
               CAST(sum(value_cents * value_cents) AS BIGINT) AS sum_c2,
               CAST(count(*) AS BIGINT) AS n
        FROM f GROUP BY user_id
    ),
    z AS (
        SELECT f.event_id, f.user_id, f.value_cents,
               (CAST(f.value_cents AS DOUBLE)
                - CAST(s.sum_c AS DOUBLE) / CAST(s.n AS DOUBLE))
               / sqrt(CAST(s.sum_c2 AS DOUBLE) / CAST(s.n AS DOUBLE)
                      - (CAST(s.sum_c AS DOUBLE) / CAST(s.n AS DOUBLE))
                        * (CAST(s.sum_c AS DOUBLE) / CAST(s.n AS DOUBLE))) AS z,
               sqrt(CAST(s.sum_c2 AS DOUBLE) / CAST(s.n AS DOUBLE)
                    - (CAST(s.sum_c AS DOUBLE) / CAST(s.n AS DOUBLE))
                      * (CAST(s.sum_c AS DOUBLE) / CAST(s.n AS DOUBLE))) AS std
        FROM f JOIN s ON f.user_id = s.user_id
    )
    SELECT event_id, user_id, value_cents, z
    FROM z WHERE std > 0 AND abs(z) > {OUTLIER_Z}
    """


# ---------------------------------------------------------------------------
# Q22-style "idle rich": customers with above-global-average balance and
# no URGENT orders.  Composition of two shapes — a scalar aggregate
# broadcast (the global mean, computed once and closed over, never
# re-scanned) and a distributed LEFT ANTI join against the filtered fact.
# ---------------------------------------------------------------------------
def idle_rich_customers(sf_dir: str) -> ray.data.Dataset:
    """(c_custkey, acctbal_cents): above-average-balance customers with
    no '1-URGENT' order."""
    from ifctordf_ray.functions.kernels import join_ready
    from ifctordf_ray.tuning import join_kwargs

    cust = _clean_read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    )
    # scalar aggregate: exact integer cents -> one (sum, n) pair
    tot = cust.map_batches(
        lambda t: pa.table(
            {
                "s": pa.array(
                    [pc.sum(_cents(t["c_acctbal"])).as_py() or 0], pa.int64()
                ),
                "n": pa.array([t.num_rows], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sum(["s", "n"])
    _s, _n = tot["sum(s)"] or 0, tot["sum(n)"] or 0
    mean = float(_s) / float(_n) if _n else 0.0  # exact ints -> IEEE

    rich = cust.map_batches(
        lambda t: (
            lambda cents: pa.table(
                {
                    "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
                    "acctbal_cents": cents,
                }
            ).filter(pc.greater(pc.cast(cents, pa.float64()), mean))
        )(_cents(t["c_acctbal"])),
        batch_format="pyarrow",
    )
    orderers = (
        _clean_read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
        )
        .map_batches(
            lambda t: t.filter(
                pc.equal(t["o_orderpriority"], "1-URGENT")
            ).select(["o_custkey"]),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .aggregate(Count(alias_name="_n"))
    )
    orderers = join_ready(
        orderers.map_batches(
            lambda t: pa.table({"o_custkey": pc.cast(t["o_custkey"], pa.int64())}),
            batch_format="pyarrow",
        ),
        pa.schema([("o_custkey", pa.int64())]),
        sentinel_row={"o_custkey": -1},
    )
    rich = join_ready(
        rich,
        pa.schema([("c_custkey", pa.int64()), ("acctbal_cents", pa.int64())]),
        sentinel_row={"c_custkey": -2, "acctbal_cents": 0},
    )
    anti = rich.join(
        orderers,
        join_type="left_anti",
        on=("c_custkey",),
        right_on=("o_custkey",),
        **join_kwargs(),
    )
    return anti.map_batches(
        lambda t: t.filter(pc.not_equal(t["c_custkey"], -2)),
        batch_format="pyarrow",
    )


def idle_rich_customers_sql() -> str:
    return """
    WITH c AS (
        SELECT c_custkey,
               CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS acctbal_cents
        FROM customer
    ),
    m AS (
        SELECT CAST(sum(acctbal_cents) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS mean FROM c
    )
    SELECT c.c_custkey, c.acctbal_cents
    FROM c, m
    WHERE CAST(c.acctbal_cents AS DOUBLE) > m.mean
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """


# ---------------------------------------------------------------------------
# FORALL semantics (Q21 family): orders where EVERY lineitem was returned.
# Universal quantification compiles to a grouped MIN over a boolean — one
# combiner-friendly aggregate, no correlated subquery, no double scan.
# ---------------------------------------------------------------------------
def fully_returned_orders(sf_dir: str) -> ray.data.Dataset:
    """(l_orderkey, n_lines): orders whose lineitems ALL have
    l_returnflag = 'R'."""
    li = _clean_read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    )

    def prep(t: pa.Table) -> pa.Table:
        r = pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64())
        tb = pa.table({"l_orderkey": t["l_orderkey"], "_r": r})
        return tb.group_by("l_orderkey").aggregate([("_r", "min"), ("_r", "count")])

    agg = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(
            Min("_r_min", alias_name="all_r"),
            Sum("_r_count", alias_name="n_lines"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "n_lines": pc.cast(t["n_lines"], pa.int64()),
            }
        )
        return out.filter(pc.equal(pc.cast(t["all_r"], pa.int64()), 1))

    return agg.map_batches(finish, batch_format="pyarrow")


def fully_returned_orders_sql() -> str:
    return """
    SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    GROUP BY l_orderkey
    HAVING min(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) = 1
    """


# ---------------------------------------------------------------------------
# Growth accounting: new users per day + cumulative total.  first-seen =
# grouped MIN (one exchange of one row per user); the cumulative sum runs
# over the DAY-count-sized aggregate in one ordered task — running state
# on the aggregate, never on the fact stream.
# ---------------------------------------------------------------------------
def new_users_daily(sf_dir: str) -> ray.data.Dataset:
    """(day, n_new_users, cum_users)."""
    ds = _clean_read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        eday = pc.cast(
            pc.cast(
                pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.date32()),
                pa.int32(),
            ),
            pa.int64(),
        )
        tb = pa.table({"user_id": t["user_id"], "_d": eday})
        return tb.group_by("user_id").aggregate([("_d", "min")])

    per_day = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("_d_min", alias_name="first_day"))
        .groupby("first_day")
        .aggregate(Count(alias_name="n_new_users"))
        .repartition(1)  # day-count-sized
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.sort_by([("first_day", "ascending")])
        n = pc.cast(t["n_new_users"], pa.int64())
        cum = np.cumsum(n.to_numpy(zero_copy_only=False).astype(np.int64))
        day = pc.cast(
            pc.cast(pc.cast(t["first_day"], pa.int32()), pa.date32()),
            pa.timestamp("us"),
        )
        return pa.table(
            {
                "day": day,
                "n_new_users": n,
                "cum_users": pa.array(cum, pa.int64()),
            }
        )

    return per_day.map_batches(finish, batch_format="pyarrow", batch_size=None)


def new_users_daily_sql() -> str:
    return """
    WITH fs AS (
        SELECT user_id, min(date_trunc('day', ts)) AS first_day
        FROM events GROUP BY user_id
    ),
    nd AS (
        SELECT first_day AS day, CAST(count(*) AS BIGINT) AS n_new_users
        FROM fs GROUP BY first_day
    )
    SELECT day, n_new_users,
           CAST(sum(n_new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
    FROM nd
    """


# ---------------------------------------------------------------------------
# Predicate pushdown at the read: the filter travels INTO read_parquet as
# an Arrow dataset expression, so row groups whose l_shipdate statistics
# exclude the range never leave storage — "prune at the read" as a
# first-class operator, not a post-read filter.
# ---------------------------------------------------------------------------
PUSHDOWN_SHIP_FROM = "1995-09-01"
PUSHDOWN_SHIP_TO = "1995-10-01"


def filtered_scan(sf_dir: str) -> ray.data.Dataset:
    """(l_returnflag, n_lines, revenue_cents) for one ship month — the
    filter pushed into the parquet scan."""
    import pyarrow.dataset as pads

    lo = np.datetime64(PUSHDOWN_SHIP_FROM).astype("datetime64[us]")
    hi = np.datetime64(PUSHDOWN_SHIP_TO).astype("datetime64[us]")
    expr = (pads.field("l_shipdate") >= pa.scalar(lo)) & (
        pads.field("l_shipdate") < pa.scalar(hi)
    )
    ds = _clean_read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_shipdate"],
        filter=expr,
    )

    def prep(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "_cents": _cents(t["l_extendedprice"]),
            }
        )
        return tb.group_by("l_returnflag").aggregate(
            [("_cents", "count"), ("_cents", "sum")]
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("_cents_count", alias_name="n_lines"),
            Sum("_cents_sum", alias_name="revenue_cents"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "l_returnflag": t["l_returnflag"],
                    "n_lines": pc.cast(t["n_lines"], pa.int64()),
                    "revenue_cents": pc.cast(t["revenue_cents"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def filtered_scan_sql() -> str:
    return f"""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{PUSHDOWN_SHIP_FROM}'
      AND l_shipdate < TIMESTAMP '{PUSHDOWN_SHIP_TO}'
    GROUP BY l_returnflag
    """


# ---------------------------------------------------------------------------
# Global NTILE via distributed two-phase scan (no global sort barrier)
# ---------------------------------------------------------------------------
NTILE_K = 4
NTILE_BUCKET_CENTS = 500_000_00  # $500k of o_totalprice per range bucket


def _order_rank_scan(sf_dir: str):
    """Shared two-phase global-rank scan over orders: returns
    (narrow_ds[o_orderkey, cents, bucket], bucket->global offset, total
    rows).  Bucket = value range, so inter-bucket order is total and the
    driver only ever holds the #buckets-row count table."""
    from ray.data.aggregate import Count as _Count

    ds = _clean_read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"])
        bucket = pc.cast(
            pc.floor(pc.divide(pc.cast(cents, pa.float64()), NTILE_BUCKET_CENTS)),
            pa.int64(),
        )
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "cents": cents, "bucket": bucket}
        )

    narrow = ds.map_batches(prep, batch_format="pyarrow")

    counts = narrow.groupby("bucket").aggregate(_Count(alias_name="n")).take_all()
    offsets: dict[int, int] = {}
    total = 0
    for row in sorted(counts, key=lambda r: r["bucket"]):
        offsets[row["bucket"]] = total
        total += row["n"]
    return narrow, offsets, total


def order_ntile(sf_dir: str, k: int = NTILE_K) -> ray.data.Dataset:
    """(o_orderkey, tile): NTILE(k) over the GLOBAL ordering
    (o_totalprice, o_orderkey) — the global-rank operator family
    (ntile/percent_rank/row_number over the whole table), which a naive
    engine does with a single-node sort.

    Distributed shape (same two-phase scan as chunking.packed_sequences,
    but bucketed by VALUE RANGE so bucket order == sort order):
      1. narrow map: price -> exact integer cents; bucket = cents //
         NTILE_BUCKET_CENTS (deterministic range partitioning — ordering
         between buckets is total, so no global sort is ever run);
      2. per-bucket row counts via groupby -> tiny driver table
         (#buckets rows) -> exclusive scan = each bucket's global offset
         plus the exact total row count n;
      3. groupby(bucket).map_groups: local (cents, key) sort + the
         bucket's offset -> exact global 0-based rank -> standard NTILE
         fill (first n%k tiles get the extra row).

    At 100 TB only step 2's #buckets-row table touches the driver; skew
    is bounded by the value-range width (tune NTILE_BUCKET_CENTS; a
    pathological single-price corpus degrades to one group, the same
    failure mode as any range partitioner — document, don't hide)."""
    narrow, offsets, total = _order_rank_scan(sf_dir)
    size, rem = divmod(total, k)

    def assign(group: pa.Table) -> pa.Table:
        group = group.sort_by(
            [("cents", "ascending"), ("o_orderkey", "ascending")]
        )
        idx = offsets[group["bucket"][0].as_py()] + np.arange(group.num_rows)
        big_span = rem * (size + 1)
        tile = np.where(
            idx < big_span,
            idx // (size + 1) + 1 if size + 1 > 0 else 1,
            rem + (np.maximum(idx - big_span, 0) // max(size, 1)) + 1,
        )
        return pa.table(
            {
                "o_orderkey": group["o_orderkey"],
                "tile": pa.array(tile, pa.int64()),
            }
        )

    return narrow.groupby("bucket").map_groups(assign, batch_format="pyarrow")


def order_ntile_sql(k: int = NTILE_K) -> str:
    return f"""
    SELECT o_orderkey,
           CAST(NTILE({k}) OVER (
               ORDER BY CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT),
                        o_orderkey) AS BIGINT) AS tile
    FROM orders
    """


def order_global_rank(sf_dir: str) -> ray.data.Dataset:
    """(o_orderkey, rn, pct_rank): global row_number + percent_rank over
    (o_totalprice, o_orderkey) — same two-phase value-range scan as
    order_ntile (one tiny driver count table, no global sort).
    pct_rank = (rn-1)/(n-1) as one exact-int division, bit-identical in
    numpy and DuckDB."""
    narrow, offsets, total = _order_rank_scan(sf_dir)
    denom = max(total - 1, 1)

    def assign(group: pa.Table) -> pa.Table:
        group = group.sort_by(
            [("cents", "ascending"), ("o_orderkey", "ascending")]
        )
        idx = offsets[group["bucket"][0].as_py()] + np.arange(group.num_rows)
        return pa.table(
            {
                "o_orderkey": group["o_orderkey"],
                "rn": pa.array(idx + 1, pa.int64()),
                "pct_rank": pa.array(idx.astype(np.float64) / denom, pa.float64()),
            }
        )

    return narrow.groupby("bucket").map_groups(assign, batch_format="pyarrow")


def order_global_rank_sql() -> str:
    return """
    SELECT o_orderkey,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           percent_rank() OVER w AS pct_rank
    FROM orders
    WINDOW w AS (ORDER BY CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT),
                 o_orderkey)
    """


# ---------------------------------------------------------------------------
# Set operations: INTERSECT / EXCEPT as distinct + hash join
# ---------------------------------------------------------------------------
def _half_user_sets(sf_dir: str):
    """Distinct user_id sets for the early and late halves of the event
    timeline (midpoint = mean of min/max ts, computed by a scalar
    aggregate — never a driver scan)."""
    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
            }
        )

    narrow = ds.map_batches(to_us, batch_format="pyarrow")
    bounds = narrow.aggregate(Min("ts_us"), Max("ts_us"))
    lo, hi = bounds.get("min(ts_us)"), bounds.get("max(ts_us)")
    mid = 0 if lo is None else (lo + hi) // 2  # empty input: sets are empty anyway

    def split(t: pa.Table, early: bool) -> pa.Table:
        mask = (
            pc.less(t["ts_us"], mid) if early else pc.greater_equal(t["ts_us"], mid)
        )
        # per-block distinct: shrink the shuffle before the global dedup
        return pa.table({"user_id": pc.unique(t.filter(mask)["user_id"])})

    def _distinct(early: bool):
        return (
            narrow.map_batches(
                lambda t, e=early: split(t, e), batch_format="pyarrow"
            )
            .groupby("user_id")
            .aggregate(Count(alias_name="_n"))
            .map_batches(
                lambda t: t.select(["user_id"]), batch_format="pyarrow"
            )
        )

    return _distinct(True), _distinct(False)


_SET_SQL_BOUNDS = """
    b AS (SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid FROM events),
    early AS (SELECT DISTINCT user_id FROM events, b WHERE epoch_us(ts) < mid),
    late  AS (SELECT DISTINCT user_id FROM events, b WHERE epoch_us(ts) >= mid)
"""


def users_both_halves(sf_dir: str) -> ray.data.Dataset:
    """INTERSECT: users active in BOTH halves of the timeline.  Set
    intersection = distinct each side (per-block pre-dedup + one
    groupby), then an inner hash join on the key — every stage
    partition-parallel, nothing corpus-sized on the driver."""
    from ifctordf_ray.functions.kernels import safe_join

    early, late = _half_user_sets(sf_dir)
    key_schema = pa.schema([("user_id", pa.int64())])
    joined = safe_join(
        early,
        key_schema,
        late.map_batches(
            lambda t: t.rename_columns(["late_user_id"]), batch_format="pyarrow"
        ),
        pa.schema([("late_user_id", pa.int64())]),
        join_type="inner",
        on=("user_id",),
        right_on=("late_user_id",),
    )
    return joined.map_batches(
        lambda t: t.select(["user_id"]) if "user_id" in t.schema.names
        else key_schema.empty_table(),
        batch_format="pyarrow",
    ).union(ray.data.from_arrow(key_schema.empty_table()))


def users_both_halves_sql() -> str:
    return f"""
    WITH {_SET_SQL_BOUNDS}
    SELECT user_id FROM early INTERSECT SELECT user_id FROM late
    """


def user_days_except(sf_dir: str) -> ray.data.Dataset:
    """EXCEPT: distinct (user_id, day) pairs with ANY event minus pairs
    with a purchase — the general two-dataset set-difference shape
    (distinct each side with per-block pre-dedup, then a left_anti hash
    join on the composite key), kept deliberately as two datasets + anti
    join rather than one groupby so it covers EXCEPT over arbitrary
    inputs.  Days are integer epoch days (exact in both engines)."""

    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    US_PER_DAY = 86_400_000_000

    def days(t: pa.Table, purchases_only: bool) -> pa.Table:
        if purchases_only:
            t = t.filter(pc.equal(t["event_type"], "purchase"))
        # integer division (ts is always positive, so trunc == floor)
        day = pc.divide(pc.cast(t["ts"], pa.int64()), US_PER_DAY)
        # per-block distinct: shrink the shuffle before the global dedup
        return (
            pa.table({"user_id": t["user_id"], "day_id": day})
            .group_by(["user_id", "day_id"])
            .aggregate([])
        )

    def _distinct(purchases_only: bool):
        return (
            ds.map_batches(
                lambda t, p=purchases_only: days(t, p), batch_format="pyarrow"
            )
            .groupby(["user_id", "day_id"])
            .aggregate(Count(alias_name="_n"))
            .map_batches(
                lambda t: t.select(["user_id", "day_id"]), batch_format="pyarrow"
            )
        )

    from ifctordf_ray.functions.kernels import safe_join

    key_schema = pa.schema([("user_id", pa.int64()), ("day_id", pa.int64())])
    rkey_schema = pa.schema([("p_user_id", pa.int64()), ("p_day_id", pa.int64())])
    anti = safe_join(
        _distinct(False),
        key_schema,
        _distinct(True).map_batches(
            lambda t: t.rename_columns(["p_user_id", "p_day_id"]),
            batch_format="pyarrow",
        ),
        rkey_schema,
        join_type="left_anti",
        on=("user_id", "day_id"),
        right_on=("p_user_id", "p_day_id"),
    )
    return anti.map_batches(
        lambda t: t.select(["user_id", "day_id"]), batch_format="pyarrow"
    )


def user_days_except_sql() -> str:
    return """
    WITH a AS (SELECT DISTINCT user_id,
                      epoch_us(ts) // 86400000000 AS day_id FROM events),
         p AS (SELECT DISTINCT user_id,
                      epoch_us(ts) // 86400000000 AS day_id FROM events
               WHERE event_type = 'purchase')
    SELECT user_id, day_id FROM a EXCEPT SELECT user_id, day_id FROM p
    """


# ---------------------------------------------------------------------------
# Cross join (small x small broadcast cartesian)
# ---------------------------------------------------------------------------
def region_nation_cross(sf_dir: str) -> ray.data.Dataset:
    """Every (region, nation) combination + home-region flag: CROSS JOIN
    as a broadcast cartesian — the 5-row region table rides into every
    map task via the closure (constant-sized dimension, same rule as
    nation_revenue's broadcast side), so no shuffle at any scale of the
    streamed side."""
    import pyarrow.parquet as pq

    regions = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )  # 5 rows — constant-sized dimension, never scales with SF
    r_keys = regions["r_regionkey"].to_numpy()
    r_names = regions["r_name"].to_pylist()

    nations = _clean_read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )

    def cartesian(t: pa.Table) -> pa.Table:
        n = t.num_rows
        m = len(r_keys)
        n_name = pc.take(t["n_name"], pa.array(np.repeat(np.arange(n), m)))
        n_region = np.repeat(t["n_regionkey"].to_numpy(), m).astype(np.int64)
        r_name = pa.array(r_names * n, pa.string())
        rk = np.tile(r_keys, n).astype(np.int64)
        return pa.table(
            {
                "r_name": r_name,
                "n_name": n_name,
                "is_home": pa.array((rk == n_region).astype(np.int64), pa.int64()),
            }
        )

    return nations.map_batches(cartesian, batch_format="pyarrow")


def region_nation_cross_sql() -> str:
    return """
    SELECT r_name, n_name,
           CAST(n_regionkey = r_regionkey AS BIGINT) AS is_home
    FROM nation CROSS JOIN region
    """


# ---------------------------------------------------------------------------
# first_value / last_value window frame (per-partition edge picks)
# ---------------------------------------------------------------------------
def _first_last_group(g: pa.Table) -> pa.Table:
    g = g.sort_by([("ts_us", "ascending"), ("event_id", "ascending")])
    return pa.table(
        {
            "user_id": g["user_id"].slice(0, 1),
            "first_type": g["event_type"].slice(0, 1),
            "last_type": g["event_type"].slice(g.num_rows - 1, 1),
            "n_events": pa.array([g.num_rows], pa.int64()),
        }
    )


def user_first_last_event(sf_dir: str) -> ray.data.Dataset:
    """(user_id, first_type, last_type, n_events): the
    first_value/last_value window frame.  Shuffle-thinning: a per-block
    pre-combine keeps only each user's edge rows (argmin/argmax by
    (ts, event_id)) before the groupby, so the exchange moves <=2 rows
    per (block, user) instead of the fact table; the final map_groups
    combines the partials (bounded by #blocks rows per user)."""
    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def edges(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "event_type": t["event_type"],
            }
        ).sort_by([("ts_us", "ascending"), ("event_id", "ascending")])
        uid = tb["user_id"].to_numpy()
        order = np.argsort(uid, kind="stable")
        sorted_uid = uid[order]
        # first/last position of each user in (ts, event_id) order
        firsts = order[np.concatenate(([True], sorted_uid[1:] != sorted_uid[:-1]))]
        lasts = order[np.concatenate((sorted_uid[1:] != sorted_uid[:-1], [True]))]
        counts = tb.group_by(["user_id"]).aggregate([("event_id", "count")])
        keep = np.unique(np.concatenate((firsts, lasts)))
        kept = tb.take(pa.array(keep))
        # carry the per-block count so n_events survives the thinning
        cmap = dict(
            zip(
                counts["user_id"].to_pylist(),
                counts["event_id_count"].to_pylist(),
            )
        )
        # one partial count row per user (attached to its first edge row)
        is_first = np.isin(keep, firsts)
        n_partial = np.where(
            is_first, [cmap[u] for u in kept["user_id"].to_pylist()], 0
        )
        return kept.append_column("n_partial", pa.array(n_partial, pa.int64()))

    def combine(g: pa.Table) -> pa.Table:
        out = _first_last_group(g)
        n = int(pc.sum(g["n_partial"]).as_py() or 0)
        return out.set_column(
            out.schema.get_field_index("n_events"),
            "n_events",
            pa.array([n], pa.int64()),
        )

    return (
        ds.map_batches(edges, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(combine, batch_format="pyarrow")
    )


def user_first_last_event_sql() -> str:
    return """
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_type,
           CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


# ---------------------------------------------------------------------------
# Rolling median over a bounded row frame (6 PRECEDING .. CURRENT ROW)
# ---------------------------------------------------------------------------
ROLLMED_FRAME = 7  # current row + 6 preceding


def _rolling_median_group(g: pa.Table) -> pa.Table:
    g = g.sort_by([("ts_us", "ascending"), ("event_id", "ascending")])
    cents = g["value_cents"].to_numpy().astype(np.float64)
    n = len(cents)
    med = np.empty(n)
    if n >= ROLLMED_FRAME:
        from numpy.lib.stride_tricks import sliding_window_view

        med[ROLLMED_FRAME - 1 :] = np.median(
            sliding_window_view(cents, ROLLMED_FRAME), axis=1
        )
    head = min(n, ROLLMED_FRAME - 1)
    for i in range(head):  # ramp-up rows only: <= 6 per user, not the hot path
        med[i] = np.median(cents[: i + 1])
    return pa.table(
        {
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "rolling_median_cents": pa.array(med, pa.float64()),
        }
    )


def user_rolling_median(sf_dir: str) -> ray.data.Dataset:
    """(event_id, user_id, rolling_median_cents): median(value) over the
    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW frame per user — the
    order-statistic window, which unlike sum/avg has no algebraic
    combiner and therefore NEEDS the per-partition sorted pass.  Values
    are exact integer cents so the only float op is the even-frame
    midpoint average ((a+b)/2 — exact for ints < 2^53, identical in
    numpy and DuckDB's median interpolation).  Scale: one hash exchange
    on user_id; group memory is one user's history (bounded)."""
    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "value_cents": _cents(t["value"]),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(_rolling_median_group, batch_format="pyarrow")
    )


def user_rolling_median_sql() -> str:
    return """
    SELECT event_id, user_id,
           median(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS rolling_median_cents
    FROM events
    """


# ---------------------------------------------------------------------------
# Winsorization (robust feature preprocessing): clip every event value
# to its event-type's exact [P05, P95] band — the outlier-taming step a
# feature pipeline applies before scaling/training.  Same two-phase
# shape as value_quantiles: an algebraic (type, value)-histogram
# pre-combine picks the exact percentile_disc bounds (the histogram is
# value-domain-bounded, never row-count-sized), the bounds table
# (#types rows) is broadcast in the clip map's closure, and the clip
# pass is one narrow row-local map — no corpus-sized join.
# ---------------------------------------------------------------------------
WINSOR_LO_Q = 0.05
WINSOR_HI_Q = 0.95


def winsorized_values(sf_dir: str) -> ray.data.Dataset:
    """(event_id, event_type, value_cents, clipped_cents, was_clipped)."""
    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"], "v": _cents(t["value"])})

    hist = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "v"])
        .aggregate(Count(alias_name="n"))
    )

    def pick(group: pa.Table) -> pa.Table:
        g = group.sort_by("v")
        v = g["v"].to_numpy()
        n = g["n"].to_numpy()
        cum = np.cumsum(n)
        total = int(cum[-1])
        out = {"event_type": [g["event_type"][0].as_py()]}
        for name, q in (("lo", WINSOR_LO_Q), ("hi", WINSOR_HI_Q)):
            # percentile_disc: first v with cum/total >= q
            i = int(np.searchsorted(cum, q * total, side="left"))
            if cum[i] < q * total:  # float guard
                i += 1
            out[name] = [int(v[i])]
        return pa.table(
            {
                "event_type": pa.array(out["event_type"], pa.string()),
                "lo": pa.array(out["lo"], pa.int64()),
                "hi": pa.array(out["hi"], pa.int64()),
            }
        )

    bounds = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in hist.groupby("event_type").map_groups(
            pick, batch_format="pyarrow"
        ).take_all()  # #event-types rows: fixed-size, driver-safe
    }

    def clip(t: pa.Table) -> pa.Table:
        v = _cents(t["value"]).to_numpy()
        types = t["event_type"].to_pylist()
        lo = np.array([bounds[x][0] for x in types], np.int64)
        hi = np.array([bounds[x][1] for x in types], np.int64)
        clipped = np.minimum(np.maximum(v, lo), hi)
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "value_cents": pa.array(v, pa.int64()),
                "clipped_cents": pa.array(clipped, pa.int64()),
                "was_clipped": pa.array(
                    ((v < lo) | (v > hi)).astype(np.int64), pa.int64()
                ),
            }
        )

    return ds.map_batches(clip, batch_format="pyarrow")


def winsorized_values_sql() -> str:
    return f"""
    WITH v AS (
        SELECT event_id, event_type,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
        FROM events
    ),
    b AS (
        SELECT event_type,
               CAST(percentile_disc({WINSOR_LO_Q}) WITHIN GROUP (ORDER BY vc)
                    AS BIGINT) AS lo,
               CAST(percentile_disc({WINSOR_HI_Q}) WITHIN GROUP (ORDER BY vc)
                    AS BIGINT) AS hi
        FROM v GROUP BY 1
    )
    SELECT v.event_id, v.event_type, v.vc AS value_cents,
           least(greatest(v.vc, b.lo), b.hi) AS clipped_cents,
           CAST(CASE WHEN v.vc < b.lo OR v.vc > b.hi THEN 1 ELSE 0 END
                AS BIGINT) AS was_clipped
    FROM v JOIN b USING (event_type)
    """


# ---------------------------------------------------------------------------
# Event-time watermark / late-arrival accounting — the streaming-engine
# out-of-orderness primitive (Flink/Beam watermark semantics): arrival
# order is the ingest sequence (event_id), the per-key watermark is the
# running max EVENT time seen so far, and an event is late iff its event
# time is behind the watermark its key had already advanced to.  Batch
# shape: groupby(key).map_groups with an in-group arrival sort + one
# vectorized running max — the same bounded-group contract as
# user_running_totals (salted pre-split applies for power-user skew).
# ---------------------------------------------------------------------------
def _late_events_group(g: pa.Table) -> pa.Table:
    import numpy as np

    g = g.sort_by([("event_id", "ascending")])
    tu = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    # watermark BEFORE each event: running max shifted by one arrival
    wm = np.maximum.accumulate(tu)
    late = np.zeros(len(tu), dtype=bool)
    lateness = np.zeros(len(tu), dtype=np.int64)
    if len(tu) > 1:
        prev_wm = wm[:-1]
        late[1:] = tu[1:] < prev_wm
        lateness[1:] = np.where(late[1:], prev_wm - tu[1:], 0)
    return pa.table(
        {
            "user_id": g["user_id"][:1],
            "n_events": pa.array([len(tu)], pa.int64()),
            "n_late": pa.array([int(late.sum())], pa.int64()),
            "max_late_us": pa.array([int(lateness.max(initial=0))], pa.int64()),
            "sum_late_us": pa.array([int(lateness.sum())], pa.int64()),
        }
    )


def late_events(sf_dir: str) -> ray.data.Dataset:
    """(user_id, n_events, n_late, max_late_us, sum_late_us): per-user
    out-of-order arrival statistics under per-key watermark semantics."""
    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return ds.groupby("user_id").map_groups(
        _late_events_group, batch_format="pyarrow"
    )


def late_events_sql() -> str:
    return """
    WITH w AS (
        SELECT user_id, epoch_us(ts) AS tu,
               max(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN wm IS NOT NULL AND tu < wm
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(coalesce(max(CASE WHEN wm IS NOT NULL AND tu < wm
                                  THEN wm - tu END), 0) AS BIGINT) AS max_late_us,
           CAST(coalesce(sum(CASE WHEN wm IS NOT NULL AND tu < wm
                                  THEN wm - tu ELSE 0 END), 0) AS BIGINT) AS sum_late_us
    FROM w GROUP BY user_id
    """


# ---------------------------------------------------------------------------
# Exact per-group OLS trend (regression aggregate as integer rationals)
# ---------------------------------------------------------------------------
_TREND_EPOCH = "2024-01-01"  # x origin: keeps x small so n*Sxy stays in int64


def _trend_epoch_day() -> int:
    import datetime

    d = datetime.date.fromisoformat(_TREND_EPOCH)
    return (d - datetime.date(1970, 1, 1)).days


def value_trend(sf_dir: str) -> ray.data.Dataset:
    """(event_type, n, slope_num, slope_den): least-squares slope of
    value (cents) over time (days since 2024-01-01) per event type,
    returned as the EXACT integer rational slope_num/slope_den with
    slope_num = n*Sxy - Sx*Sy and slope_den = n*Sxx - Sx^2 — the
    regression-aggregate operator family (regr_slope), done bit-exact
    so the DuckDB oracle hash-matches (no float summation order issues).

    Shape: one narrow map emits (x, y, xy, xx); ONE groupby computes the
    five algebraic sums (pre-combined per block by Ray's aggregate
    pushdown); a final #groups-row map derives the rational.  Nothing
    driver-side; the only exchange carries one row per (block, type).
    Overflow bound: |n*Sxy| < n^2 * max|x| * max|y| — int64-safe to
    ~10^8 rows/group at this corpus's value range; beyond that, switch
    x to a per-window origin or the sums to two-limb accumulators."""
    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    epoch0 = _trend_epoch_day()

    def prep(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.cast(pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.date32()), pa.int32()),
            pa.int64(),
        )
        x = pc.subtract(day, pa.scalar(epoch0, pa.int64()))
        y = _cents(t["value"])
        return pa.table(
            {
                "event_type": t["event_type"],
                "x": x,
                "y": y,
                "xy": pc.multiply(x, y),
                "xx": pc.multiply(x, x),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("x", alias_name="sx"),
            Sum("y", alias_name="sy"),
            Sum("xy", alias_name="sxy"),
            Sum("xx", alias_name="sxx"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n"], pa.int64())
        num = pc.subtract(pc.multiply(n, t["sxy"]), pc.multiply(t["sx"], t["sy"]))
        den = pc.subtract(pc.multiply(n, t["sxx"]), pc.multiply(t["sx"], t["sx"]))
        return pa.table(
            {
                "event_type": t["event_type"],
                "n": n,
                "slope_num": num,
                "slope_den": den,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def value_trend_sql() -> str:
    return f"""
    WITH e AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '{_TREND_EPOCH}', CAST(ts AS DATE)) AS BIGINT) AS x,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y
        FROM events
    ), s AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM e GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
    FROM s
    """


# ---------------------------------------------------------------------------
# 2-D Pareto frontier (skyline) over orders
# ---------------------------------------------------------------------------
def order_skyline(sf_dir: str) -> ray.data.Dataset:
    """(o_orderkey, o_orderdate, price_cents): the Pareto frontier of
    orders under (earlier date, higher price) — an order is dominated
    iff some STRICTLY earlier-dated order has a STRICTLY higher price.
    The naive skyline is an O(n^2) NOT-EXISTS self-join; the distributed
    shape exploits the 2-D structure: per-date max reduces the frontier
    test to a strict-prefix running max over DATES, so the only global
    state is one row per distinct date.

    Shape: narrow map -> groupby(day).Max (the one exchange, carrying
    per-block pre-combined day maxima) -> #dates-row table on the driver
    (bounded by the date RANGE, not the row count) -> running strict-
    prefix max -> broadcast (closure; `ray.put` once it outgrows a task
    payload) -> vectorized searchsorted filter over the streamed rows."""
    ds = _clean_read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def prep(t: pa.Table) -> pa.Table:
        od = pc.cast(t["o_orderdate"], pa.timestamp("us"))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_orderdate": od,
                "day_us": pc.cast(od, pa.int64()),
                "price_cents": _cents(t["o_totalprice"]),
            }
        )

    narrow = ds.map_batches(prep, batch_format="pyarrow")

    daymax = (
        narrow.select_columns(["day_us", "price_cents"])
        .groupby("day_us")
        .aggregate(Max("price_cents", alias_name="m"))
        .take_all()
    )
    daymax.sort(key=lambda r: r["day_us"])
    days = np.array([r["day_us"] for r in daymax], dtype=np.int64)
    prev = np.empty(len(daymax), dtype=np.int64)
    # "no earlier day" == int64 min, NOT -1: the SQL oracle keeps an
    # earliest-date order whenever prevmax IS NULL, regardless of sign,
    # so a -1 sentinel would wrongly drop non-positive prices.
    run = np.iinfo(np.int64).min
    for i, r in enumerate(daymax):
        prev[i] = run
        run = max(run, r["m"])

    def keep(t: pa.Table) -> pa.Table:
        d = t["day_us"].to_numpy(zero_copy_only=False)
        pm = prev[np.searchsorted(days, d)]
        out = t.filter(pa.array(t["price_cents"].to_numpy(zero_copy_only=False) > pm))
        return pa.table(
            {
                "o_orderkey": out["o_orderkey"],
                "o_orderdate": out["o_orderdate"],
                "price_cents": out["price_cents"],
            }
        )

    return narrow.map_batches(keep, batch_format="pyarrow")


def order_skyline_sql() -> str:
    return """
    WITH o AS (
        SELECT o_orderkey, o_orderdate,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents
        FROM orders
    ), d AS (
        SELECT o_orderdate, max(price_cents) AS m FROM o GROUP BY o_orderdate
    ), r AS (
        SELECT o_orderdate,
               max(m) OVER (ORDER BY o_orderdate
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS prevmax
        FROM d
    )
    SELECT o.o_orderkey, o.o_orderdate, o.price_cents
    FROM o JOIN r USING (o_orderdate)
    WHERE r.prevmax IS NULL OR o.price_cents > r.prevmax
    """


# ---------------------------------------------------------------------------
# Benford first-significant-digit audit (data-quality / forensics family)
# ---------------------------------------------------------------------------
def benford_digits(sf_dir: str) -> ray.data.Dataset:
    """(event_type, digit, n): first-significant-digit distribution of
    value_cents per event type — the Benford's-law data-audit operator a
    pipeline runs to flag fabricated or truncated numeric feeds.  Exact
    integer path: cents -> decimal string -> first char, so no float log
    and the DuckDB oracle matches bit-for-bit.  One pre-combined groupby
    on (type, digit) <= 9 rows per type; scale-free."""
    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        cents = _cents(t["value"])
        keep = pc.greater(cents, 0)
        tt = pa.table({"event_type": t["event_type"], "cents": cents}).filter(keep)
        digit = pc.cast(
            pc.utf8_slice_codeunits(pc.cast(tt["cents"], pa.string()), 0, 1),
            pa.int64(),
        )
        return pa.table({"event_type": tt["event_type"], "digit": digit})

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "digit"])
        .aggregate(Count(alias_name="n"))
    )


def benford_digits_sql() -> str:
    return """
    WITH c AS (
        SELECT event_type,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    )
    SELECT event_type,
           CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
           CAST(count(*) AS BIGINT) AS n
    FROM c WHERE cents > 0
    GROUP BY event_type, digit
    """


# ---------------------------------------------------------------------------
# Band (inequality) join: |price_a - price_b| <= delta
# ---------------------------------------------------------------------------
BAND_DELTA_CENTS = 1000  # $10 band


def order_price_band_join(
    sf_dir: str, delta: int = BAND_DELTA_CENTS
) -> ray.data.Dataset:
    """(okey_a, okey_b, price_a_cents, price_b_cents, diff_cents): every
    unordered pair of distinct orders whose total prices lie within
    `delta` cents of each other — a BAND JOIN (inequality theta-join),
    the non-equi join class Ray Data's join() cannot express.

    Custom-operator shape (SURVEY §2 rule — composition of map_batches +
    one sorted exchange): bucket each row at b = price//delta and emit a
    second PROMOTED copy at b+1; any qualifying pair (|dp| <= delta =>
    |db| <= 1) then co-locates in exactly one bucket, and is counted
    exactly once by the in-bucket rule "native x native (same bucket) +
    promoted x native (adjacent buckets)" — promoted x promoted pairs
    are the previous bucket's native pairs and are excluded.  ONE range
    sort on the int64 bucket key co-locates whole buckets per block
    (equal keys never split across range partitions — same contract the
    distinct exchange relies on, extract.distinct); pair generation is a
    per-block vectorized sorted-window searchsorted + repeat/arange
    expansion, no per-group Python and no driver state.

    Partitioning assumption documented: pair volume per bucket is
    bounded by the local price density within one delta-band; a price
    hot-spot (many equal prices) concentrates pairs in one bucket — at
    that point salt the bucket and run the promoted trick per salt, as
    rel_order_lineitem_join_salted does for hot keys.

    Oracle: the naive inequality self-join (DuckDB IEJoin)."""
    ds = _clean_read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def bucketize(t: pa.Table) -> pa.Table:
        p = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        b = np.floor_divide(p, delta)
        return pa.table(
            {
                "bucket": pa.array(np.concatenate([b, b + 1]), pa.int64()),
                "okey": pa.array(np.concatenate([k, k]), pa.int64()),
                "price": pa.array(np.concatenate([p, p]), pa.int64()),
                "native": pa.array(
                    np.concatenate(
                        [np.ones(len(k), bool), np.zeros(len(k), bool)]
                    )
                ),
            }
        )

    def block_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "okey_a": pa.array([], pa.int64()),
                "okey_b": pa.array([], pa.int64()),
                "price_a_cents": pa.array([], pa.int64()),
                "price_b_cents": pa.array([], pa.int64()),
                "diff_cents": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0 or "bucket" not in t.schema.names:
            return empty
        t = t.sort_by(
            [("bucket", "ascending"), ("price", "ascending"), ("okey", "ascending")]
        )
        bkt = t["bucket"].to_numpy(zero_copy_only=False)
        p = t["price"].to_numpy(zero_copy_only=False)
        k = t["okey"].to_numpy(zero_copy_only=False)
        nat = t["native"].to_numpy(zero_copy_only=False)
        n = len(p)
        # window end per row: last index j (within the same bucket) with
        # p[j] <= p[i] + delta.  One GLOBAL searchsorted via a composite
        # key: rel = p - bucket*delta is bucket-relative and bounded in
        # [-delta, delta) (native rows land in [0, delta), promoted ones
        # in [-delta, 0)), so c = bucket*4*delta + rel + delta lives in
        # [4db, 4db + 2d) — monotone in (bucket, p) with a >delta gap to
        # the next bucket, hence c_i + delta never crosses buckets
        bucket_end = np.searchsorted(bkt, bkt, side="right")
        c = bkt * (4 * delta) + (p - bkt * delta) + delta
        win_end = np.minimum(
            np.searchsorted(c, c + delta, side="right"), bucket_end
        )
        counts = win_end - np.arange(n) - 1
        counts = np.maximum(counts, 0)
        total = int(counts.sum())
        if total == 0:
            return empty
        i_idx = np.repeat(np.arange(n), counts)
        # j runs i+1 .. win_end-1: flat arange minus per-i offsets
        offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
        j_idx = np.arange(total) - np.repeat(offs, counts) + i_idx + 1
        keep = nat[i_idx] | nat[j_idx]  # drop promoted x promoted
        # drop self-pairs (the same order's native and promoted copies
        # never share a bucket, but two DISTINCT source rows could carry
        # the same orderkey only if the input had duplicates — guard)
        keep &= k[i_idx] != k[j_idx]
        i_idx, j_idx = i_idx[keep], j_idx[keep]
        ka, kb = k[i_idx], k[j_idx]
        pa_, pb = p[i_idx], p[j_idx]
        swap = ka > kb
        ka2 = np.where(swap, kb, ka)
        kb2 = np.where(swap, ka, kb)
        pa2 = np.where(swap, pb, pa_)
        pb2 = np.where(swap, pa_, pb)
        return pa.table(
            {
                "okey_a": pa.array(ka2, pa.int64()),
                "okey_b": pa.array(kb2, pa.int64()),
                "price_a_cents": pa.array(pa2, pa.int64()),
                "price_b_cents": pa.array(pb2, pa.int64()),
                "diff_cents": pa.array(np.abs(pb2 - pa2), pa.int64()),
            }
        )

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")
    # ONE range exchange on the bucket key; whole buckets per block
    return bucketed.sort("bucket").map_batches(
        block_pairs, batch_format="pyarrow", batch_size=None
    )


def order_price_band_join_sql(delta: int = BAND_DELTA_CENTS) -> str:
    return f"""
    WITH o AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS p
        FROM orders
    )
    SELECT a.k AS okey_a, b.k AS okey_b,
           a.p AS price_a_cents, b.p AS price_b_cents,
           abs(a.p - b.p) AS diff_cents
    FROM o a JOIN o b
      ON a.k < b.k AND b.p BETWEEN a.p - {delta} AND a.p + {delta}
    """


# ---------------------------------------------------------------------------
# Robust dispersion: per-user median absolute deviation (MAD)
# ---------------------------------------------------------------------------
def _mad_group(g: pa.Table) -> pa.Table:
    c = np.sort(_cents(g["value"]).to_numpy(zero_copy_only=False))
    n = len(c)
    med = int(c[(n - 1) // 2])
    dev = np.sort(np.abs(c - med))
    return pa.table(
        {
            "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
            "n_events": pa.array([n], pa.int64()),
            "median_cents": pa.array([med], pa.int64()),
            "mad_cents": pa.array([int(dev[(n - 1) // 2])], pa.int64()),
        }
    )


def user_value_mad(sf_dir: str) -> ray.data.Dataset:
    """(user_id, n_events, median_cents, mad_cents): per-user median
    absolute deviation of event value — the robust dispersion measure
    outlier gates should use instead of stddev (one wild event moves a
    stddev band, not a MAD band).  Exact integer cents, discrete
    lower-middle quantile both passes (quantile_disc semantics, as
    user_median_value).  One group-keyed map_groups computes both order
    statistics in-group — group size is a user's event count, no second
    exchange."""
    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )
    return ds.groupby("user_id").map_groups(_mad_group, batch_format="pyarrow")


def user_value_mad_sql() -> str:
    return """
    WITH c AS (
        SELECT user_id,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    m AS (
        SELECT user_id, quantile_disc(cents, 0.5) AS med,
               count(*) AS n
        FROM c GROUP BY user_id
    )
    SELECT c.user_id,
           CAST(m.n AS BIGINT) AS n_events,
           CAST(m.med AS BIGINT) AS median_cents,
           CAST(quantile_disc(abs(c.cents - m.med), 0.5) AS BIGINT) AS mad_cents
    FROM c JOIN m USING (user_id)
    GROUP BY c.user_id, m.n, m.med
    """


# ---------------------------------------------------------------------------
# CUSUM change-point detection over each user's event-value series
# ---------------------------------------------------------------------------
def _cusum_group(g: pa.Table) -> pa.Table:
    t = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
    c = _cents(t["value"]).to_numpy(zero_copy_only=False)
    n = len(c)
    if n < 2:
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "peak_dev": pa.array([], pa.int64()),
                "change_k": pa.array([], pa.int64()),
            }
        )
    sk = np.cumsum(c)
    sn = int(sk[-1])
    k = np.arange(1, n, dtype=np.int64)  # split points 1..n-1
    dev = np.abs(k * sn - n * sk[:-1])
    best = int(np.argmax(dev))  # first max = smallest k, the tie rule
    return pa.table(
        {
            "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
            "n_events": pa.array([n], pa.int64()),
            "peak_dev": pa.array([int(dev[best])], pa.int64()),
            "change_k": pa.array([best + 1], pa.int64()),
        }
    )


def user_cusum_changepoint(sf_dir: str) -> ray.data.Dataset:
    """(user_id, n_events, peak_dev, change_k): CUSUM change-point scan
    per user — the split k maximizing the mean-shift statistic
    |k*S_n - n*S_k| over the (ts, event_id)-ordered value series (the
    integer-scaled form of max |S_k - k/n * S_n|, so the whole scan is
    exact int64, no float drift).  The drift detector a per-key metric
    stream needs before alerting on behavior change; single-event users
    have no split and emit nothing.  Ties -> smallest k.

    Shape: one group-keyed map_groups (vectorized cumsum in-group);
    group size is a user's event count — same partitioning contract as
    every per-user window op here."""
    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "value"],
    )
    return ds.groupby("user_id").map_groups(_cusum_group, batch_format="pyarrow")


def user_cusum_changepoint_sql() -> str:
    return """
    WITH c AS (
        SELECT user_id, event_id, ts,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    w AS (
        SELECT user_id,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS k,
               sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sk,
               count(*) OVER (PARTITION BY user_id) AS n,
               sum(cents) OVER (PARTITION BY user_id) AS sn
        FROM c
    ),
    d AS (
        SELECT user_id, n, k, abs(k * sn - n * sk) AS dev,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY abs(k * sn - n * sk) DESC, k ASC) AS rn
        FROM w WHERE k < n
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           CAST(dev AS BIGINT) AS peak_dev, CAST(k AS BIGINT) AS change_k
    FROM d WHERE rn = 1
    """


# ---------------------------------------------------------------------------
# Stream-ingestion idempotency dedup: same (user, type) within a window
# ---------------------------------------------------------------------------
DEDUP_WINDOW_US = 6 * 3600 * 1_000_000  # 6 hours


def _window_dedup_group(g: pa.Table) -> pa.Table:
    t = g.sort_by(
        [("event_type", "ascending"), ("ts", "ascending"), ("event_id", "ascending")]
    )
    ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    et = np.asarray(t["event_type"].to_pylist(), dtype=object)
    n = len(ts)
    keep = np.ones(n, dtype=bool)
    if n > 1:
        same_type = et[1:] == et[:-1]
        # chained rule: an event is a dup of the previous KEPT event of
        # its type; a dropped event does not extend the window (exactly
        # the LAG-less "last emitted" semantics of an ingest dedup)
        last_ts = ts[0]
        for i in range(1, n):
            if same_type[i - 1] and ts[i] - last_ts <= DEDUP_WINDOW_US:
                keep[i] = False
            else:
                last_ts = ts[i]
    return t.filter(pa.array(keep)).select(["event_id", "user_id", "event_type", "ts"])


def events_window_dedup(sf_dir: str) -> ray.data.Dataset:
    """(event_id, user_id, event_type, ts): the event stream after
    idempotency-window dedup — an event is dropped when the previous
    EMITTED event of the same (user_id, event_type) is within
    DEDUP_WINDOW_US (chained last-emitted semantics, what an ingest
    dedup actor keyed on (user, type) actually does; retries and
    double-sends collapse, genuinely-new activity survives).

    Shape: one groupby(user_id).map_groups; per-group work is a sort +
    a short Python chain over same-type runs (group = one user's
    events).  The chained rule is deliberately NOT a LAG filter — a
    dropped event must not extend the suppression window — which is
    also why the SQL oracle needs a recursive per-run walk rather than
    a window function."""
    ds = _clean_read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"],
    )
    return ds.groupby("user_id").map_groups(
        _window_dedup_group, batch_format="pyarrow"
    )


def events_window_dedup_sql() -> str:
    return f"""
    WITH RECURSIVE o AS (
        SELECT event_id, user_id, event_type, ts,
               CAST(epoch_us(ts) AS BIGINT) AS tus,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    walk (user_id, event_type, rn, event_id, ts, tus, last_emit, kept) AS (
        SELECT user_id, event_type, rn, event_id, ts, tus, tus, TRUE
        FROM o WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.event_type, o.rn, o.event_id, o.ts, o.tus,
               CASE WHEN o.tus - w.last_emit <= {DEDUP_WINDOW_US}
                    THEN w.last_emit ELSE o.tus END,
               o.tus - w.last_emit > {DEDUP_WINDOW_US}
        FROM o JOIN walk w
          ON o.user_id = w.user_id AND o.event_type = w.event_type
         AND o.rn = w.rn + 1
    )
    SELECT event_id, user_id, event_type, ts FROM walk WHERE kept
    """
