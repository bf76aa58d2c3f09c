"""Zero-block robustness: every safe_join-backed query must survive a
FULLY EMPTY input (0-row tables) — the shape of an empty partition, an
all-filtered scan, or a new-day incremental run.  Before kernels.safe_join
these crashed inside Ray's hash-shuffle join aggregator with
`ArrowInvalid: No match ... FieldRef.Name(...)` because a zero-BLOCK
input gives the shuffle no first block to broadcast a schema from."""

import os

import pyarrow.parquet as pq
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory, sf_small):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        tab = pq.read_table(os.path.join(sf_small, f"{t}.parquet"))
        pq.write_table(tab.slice(0, 0), str(d / f"{t}.parquet"))
    return str(d)


EMPTY_SAFE_QUERIES = [
    "rel_order_lineitem_join",
    "rel_orders_without_lineitem",
    "rel_users_both_halves",
    "rel_user_days_except",
    "rel_blame_suppliers",
    "rel_part_supplier_counts",
    "rel_order_ntile",
    "doc_source_quota",
    "rel_value_hist_quantiles",
    "doc_feature_hashing",
    "mm_image_histograms",
    "kg_triples",
    "kg_errors",
    "doc_minhash_near_dups",
    "emb_near_dup_pairs_lsh",
]


@pytest.mark.parametrize("name", EMPTY_SAFE_QUERIES)
def test_query_survives_empty_input(empty_sf, name):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    ds = E.queries()[name](empty_sf)
    n = ds.count() if hasattr(ds, "count") else len(ds)
    assert n == 0
