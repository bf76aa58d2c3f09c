"""Bucketed range join: the interval-predicate join Ray Data has no
native operator for, expressed as a bounded-replication EQUI-join.

The textbook scale trap with `a JOIN b ON a.key = b.key AND b.ts BETWEEN
a.ts AND a.ts + W` is to equi-join on the key alone and post-filter —
per-key row blowup is |a_per_key| x |b_per_key|, quadratic on hot keys.
The operator here co-partitions BOTH sides by (key, time_bucket) with
bucket width = the window W, replicating only the LEFT (probe) side into
the ceil(W/bucket)+1 = 2 buckets its window can touch.  Replication is a
constant 2x of the probe side regardless of data size or key skew; the
exact interval predicate is then a vectorized in-batch filter.  This is
the same decomposition the reference applies to its line-number
re-chaining (sequential windows over a sorted stream,
IfcSpfReader.java:220-252) — here generalized to time intervals.

Partitioning assumption (documented per the custom-operator contract):
events within one (user, hour) pair co-locate after the hash exchange;
no assumption about global time order or per-user row counts.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from ifctordf_ray.functions.kernels import cents as _cents
from ifctordf_ray.functions.kernels import join_ready
from ifctordf_ray.sources.transcripts import clean_read_parquet as _read

HOUR_US = 3_600 * 1_000_000
TRIGGER_TYPE = "purchase"


def _hour_bucket(ts: pa.ChunkedArray) -> pa.ChunkedArray:
    # timestamp[us] -> epoch hour index (timestamps are positive, so
    # integer division == floor)
    return pc.divide(pc.cast(ts, pa.int64()), pa.scalar(HOUR_US, pa.int64()))


def purchase_follow_events(
    sf_dir: str, num_partitions: int | None = None
) -> ray.data.Dataset:
    """(event_id, n_follow, follow_value_cents): for every ``purchase``
    event, the count and value sum of SAME-USER events in the hour after
    it (exclusive of the purchase instant).  Inner semantics — purchases
    with no follower emit no row."""
    from ifctordf_ray.tuning import join_kwargs

    ev = _read(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def probes(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["event_type"], TRIGGER_TYPE))
        base = _hour_bucket(f["ts"])
        parts = [
            pa.table(
                {
                    "p_user": f["user_id"],
                    "p_bucket": pc.add(base, pa.scalar(i, pa.int64())),
                    "p_id": f["event_id"],
                    "p_ts_us": pc.cast(f["ts"], pa.int64()),
                }
            )
            for i in (0, 1)  # a 1h window touches at most 2 hour buckets
        ]
        return pa.concat_tables(parts)

    def followers(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "f_user": t["user_id"],
                "f_bucket": _hour_bucket(t["ts"]),
                "f_ts_us": pc.cast(t["ts"], pa.int64()),
                "f_value_cents": _cents(t["value"]),
            }
        )

    jk = join_kwargs(num_partitions)
    # the probe side is filtered (one event type) -> join_ready armor;
    # sentinel keys (-1) can't collide with follower buckets because the
    # follower sentinel uses -2 (a shared key would self-join)
    left = join_ready(
        ev.map_batches(probes, batch_format="pyarrow"),
        pa.schema(
            [
                ("p_user", pa.int64()),
                ("p_bucket", pa.int64()),
                ("p_id", pa.int64()),
                ("p_ts_us", pa.int64()),
            ]
        ),
        sentinel_row={"p_user": -1, "p_bucket": -1, "p_id": -1, "p_ts_us": 0},
    )
    right = join_ready(
        ev.map_batches(followers, batch_format="pyarrow"),
        pa.schema(
            [
                ("f_user", pa.int64()),
                ("f_bucket", pa.int64()),
                ("f_ts_us", pa.int64()),
                ("f_value_cents", pa.int64()),
            ]
        ),
        sentinel_row={"f_user": -2, "f_bucket": -2, "f_ts_us": 0, "f_value_cents": 0},
    )
    joined = left.join(
        right,
        join_type="inner",
        on=("p_user", "p_bucket"),
        right_on=("f_user", "f_bucket"),
        **jk,
    )

    def in_window(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater(t["f_ts_us"], t["p_ts_us"]),
            pc.less_equal(t["f_ts_us"], pc.add(t["p_ts_us"], pa.scalar(HOUR_US))),
        )
        f = t.filter(keep)
        return pa.table(
            {"event_id": f["p_id"], "follow_value_cents": f["f_value_cents"]}
        )

    return (
        joined.map_batches(in_window, batch_format="pyarrow")
        .groupby("event_id")
        .aggregate(
            Count(alias_name="n_follow"),
            Sum("follow_value_cents", alias_name="follow_value_cents"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "event_id": t["event_id"],
                    "n_follow": pc.cast(t["n_follow"], pa.int64()),
                    "follow_value_cents": t["follow_value_cents"],
                }
            ),
            batch_format="pyarrow",
        )
    )


def purchase_follow_events_sql() -> str:
    return f"""
    SELECT p.event_id,
           count(*) AS n_follow,
           CAST(sum(CAST(floor(e.value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS follow_value_cents
    FROM events p
    JOIN events e
      ON e.user_id = p.user_id
     AND e.ts >  p.ts
     AND e.ts <= p.ts + INTERVAL 1 HOUR
    WHERE p.event_type = '{TRIGGER_TYPE}'
    GROUP BY p.event_id
    """
