"""Reshape operators: UNPIVOT (wide -> long melt) and grouped argmax
(per-group mode).

UNPIVOT is the inverse of the partial-pivot operator
(pipelines/relational.py user_type_pivot): each wide row explodes into
one (key, name, value) row per value column.  The melt is a pure
row-local map — six zero-copy column selections concatenated per batch,
no shuffle beyond what the upstream pivot already did — so at 100 TB it
adds no exchange of its own.

Grouped mode (argmax) composes two aggregates: a distributed
(key, value) count groupby (bounded by the value-domain product, tiny),
then a per-key argmax over that SMALL table via map_groups.  The fact
table is scanned once; the argmax never sees it.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count

from ifctordf_ray.pipelines.relational import EVENT_TYPES, user_type_pivot
from ifctordf_ray.pipelines.relational import user_type_pivot_sql
from ifctordf_ray.sources.transcripts import clean_read_parquet as _read

UNPIVOT_NAMES = tuple(EVENT_TYPES) + ("other",)


def user_type_unpivot(sf_dir: str) -> ray.data.Dataset:
    """(user_id, event_type, n): the melted form of user_type_pivot's
    wide output — one row per (user, type name) including zeros, the
    lossless inverse of the pivot."""
    wide = user_type_pivot(sf_dir)

    def melt(t: pa.Table) -> pa.Table:
        parts = [
            pa.table(
                {
                    "user_id": t["user_id"],
                    "event_type": pa.nulls(t.num_rows, pa.string()).fill_null(name),
                    "n": pc.cast(t[f"n_{name}"], pa.int64()),
                }
            )
            for name in UNPIVOT_NAMES
        ]
        return pa.concat_tables(parts)

    return wide.map_batches(melt, batch_format="pyarrow")


def user_type_unpivot_sql() -> str:
    arms = "\n    UNION ALL\n".join(
        f"    SELECT user_id, '{name}' AS event_type, n_{name} AS n FROM wide"
        for name in UNPIVOT_NAMES
    )
    return f"""
    WITH wide AS ({user_type_pivot_sql()})
{arms}
    """


def nation_priority_mode(sf_dir: str) -> ray.data.Dataset:
    """(c_nationkey, o_orderpriority, n_orders): each nation's MOST
    COMMON order priority (grouped mode; ties -> lexicographically
    smallest priority).  Physical plan: one distributed
    (nation, priority) count groupby over the fact table -> per-nation
    argmax via map_groups over the |nations| x |priorities| result."""
    from ifctordf_ray.functions.dimjoin import attach_dimension

    orders = _read(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"])
    fact = attach_dimension(
        orders,
        f"{sf_dir}/customer.parquet",
        key_col="c_custkey",
        probe_col="o_custkey",
        val_cols=["c_nationkey"],
    )
    counts = (
        fact.map_batches(
            lambda t: pa.table(
                {
                    "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
                    "o_orderpriority": t["o_orderpriority"],
                }
            ),
            batch_format="pyarrow",
        )
        .groupby(["c_nationkey", "o_orderpriority"])
        .aggregate(Count(alias_name="n_orders"))
    )

    def argmax(group: pa.Table) -> pa.Table:
        n = pc.cast(group["n_orders"], pa.int64())
        # max count, then smallest priority among the tied rows
        best = group.filter(pc.equal(n, pc.max(n)))
        order = pc.sort_indices(best["o_orderpriority"])
        top = best.take(order[:1])
        return pa.table(
            {
                "c_nationkey": top["c_nationkey"],
                "o_orderpriority": top["o_orderpriority"],
                "n_orders": pc.cast(top["n_orders"], pa.int64()),
            }
        )

    return counts.groupby("c_nationkey").map_groups(argmax, batch_format="pyarrow")


def nation_priority_mode_sql() -> str:
    return """
    WITH counts AS (
        SELECT c.c_nationkey, o.o_orderpriority, count(*) AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, o.o_orderpriority
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY c_nationkey
            ORDER BY n_orders DESC, o_orderpriority ASC) AS rk
        FROM counts
    )
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, o_orderpriority,
           CAST(n_orders AS BIGINT) AS n_orders
    FROM ranked WHERE rk = 1
    """
