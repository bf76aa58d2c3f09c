"""PageRank step over the mention graph + CSV source round trip."""

import duckdb
import pandas as pd
import pyarrow.parquet as pq

from ifctordf_ray.stages.graphq import (
    PR_BASE_Q,
    mention_pagerank_step,
    mention_pagerank_step_sql,
)


def _duck(sf_dir, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_pagerank_parity_and_invariants(sf_small):
    con = _duck(sf_small, ["events"])
    a = mention_pagerank_step(sf_small).to_pandas()
    b = con.execute(mention_pagerank_step_sql()).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    # every rank >= the teleport mass; no node exceeds total graph mass
    assert (a["pr_q"] >= PR_BASE_Q).all()
    # damped mass conservation: total rank ~= n_nodes * 1e12 (floor
    # truncation loses < 1 unit per in-edge)
    n = len(a)
    total = int(a["pr_q"].sum())
    assert total <= n * 10**12
    assert total > n * 10**12 - n * 10**6  # generous floor-loss bound


def test_csv_round_trip_and_downstream(sf_small, tmp_path):
    import ray.data

    from ifctordf_ray.sources.csvsrc import read_documents_csv, write_documents_csv
    from ifctordf_ray.sources.jsonl import DOCUMENTS_SCHEMA

    orig = pq.read_table(f"{sf_small}/documents.parquet").select(
        [f.name for f in DOCUMENTS_SCHEMA]
    )
    out = str(tmp_path / "docs_csv")
    write_documents_csv(
        ray.data.from_arrow(orig).map_batches(lambda t: t, batch_format="pyarrow"),
        out,
    )
    back = read_documents_csv(out).to_pandas()
    a = orig.to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = back.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # downstream stage compatibility: the token-count stage runs
    # unchanged on the CSV-sourced dataset
    from ifctordf_ray.stages.textstats import TokenCounter

    tc = (
        read_documents_csv(out)
        .map_batches(TokenCounter, batch_format="pyarrow", concurrency=(1, 2))
        .to_pandas()
    )
    assert len(tc) == len(a)
