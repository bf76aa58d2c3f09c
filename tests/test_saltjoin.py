"""Skew-salted join: row-identical to the plain hash join, including
under a pathologically hot key."""

import pandas as pd
import pyarrow as pa
import ray.data

from ifctordf_ray.functions.saltjoin import salted_join
from ifctordf_ray.pipelines.relational import (
    order_lineitem_join,
    order_lineitem_join_salted,
)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_salted_equals_plain_hot_key():
    # one hot key (90% of fact rows) + a long tail; duplicate build rows
    # exercise the multiset semantics of the replicated side
    fact = pa.table(
        {
            "k": [7] * 90 + list(range(10)),
            "v": list(range(100)),
        }
    )
    build = pa.table({"bk": [7, 7, 3, 5, 42], "w": [1, 2, 3, 4, 5]})
    plain = (
        ray.data.from_arrow(fact)
        .join(
            ray.data.from_arrow(build),
            join_type="inner",
            on=("k",),
            right_on=("bk",),
            num_partitions=4,
        )
        .to_pandas()
    )
    salted = salted_join(
        ray.data.from_arrow(fact),
        ray.data.from_arrow(build),
        on="k",
        right_on="bk",
        salt=4,
    ).to_pandas()
    pd.testing.assert_frame_equal(_norm(plain), _norm(salted))
    # the hot key produced (90 hot + 1 tail) * 2 build rows in both
    assert (salted["k"] == 7).sum() == 182
    assert (plain["k"] == 7).sum() == 182


def test_order_lineitem_join_salted_equals_plain(sf_small):
    a = _norm(order_lineitem_join(sf_small).to_pandas())
    b = _norm(order_lineitem_join_salted(sf_small).to_pandas())
    pd.testing.assert_frame_equal(a, b)
