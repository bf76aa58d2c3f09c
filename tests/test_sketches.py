"""HLL registers, label token stats, degree histogram: semantics +
cross-engine parity (the driver-gate compare) at sf0.001."""

import duckdb
import pandas as pd

import pyarrow as pa

from ifctordf_ray.stages import sketches
from ifctordf_ray.stages.sketches import HLL_P, _rank, hll_estimate
from ifctordf_ray.stages.similarity import label_token_stats, label_token_stats_sql


def _duck(sf_dir, tables=("documents", "embeddings")):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _compare(ds, sql, con):
    a = ds.to_pandas()
    b = con.execute(sql).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    for c in cols:
        assert a[c].dtype.kind == b[c].dtype.kind, (c, a[c].dtype, b[c].dtype)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    return a


def test_rank_spec():
    # bucket = top-8 bits; rank = 56-bit leading zeros + 1
    assert _rank(0) == (0, 57)  # all-zero remainder
    assert _rank(1) == (0, 56)  # lowest bit set -> 55 leading zeros
    assert _rank((1 << 56) - 1) == (0, 1)  # top remainder bit set
    assert _rank(255 << 56) == (255, 57)
    assert 1 << HLL_P == 256


def test_hll_registers_parity_and_estimate(sf_small):
    con = _duck(sf_small, tables=("documents",))
    regs = _compare(sketches.hll_registers(sf_small), sketches.hll_registers_sql(), con)
    # estimate from the gated registers is close to the true count
    true_n = con.execute(
        "SELECT count(DISTINCT w) FROM (SELECT unnest(regexp_extract_all("
        "lower(coalesce(text,'')), '[a-z0-9]+')) AS w FROM documents)"
    ).fetchone()[0]
    est = hll_estimate(list(zip(regs["bucket"], regs["max_rank"])))
    assert abs(est - true_n) / true_n < 0.25  # ~1.04/sqrt(256) HLL error regime


def test_hll_registers_merge_invariance(sf_small):
    """Registers are max-mergeable: recomputing from per-doc singleton
    batches gives the identical register table (reaggregation safety)."""
    import ray

    docs = ray.data.read_parquet(f"{sf_small}/documents.parquet").repartition(13)
    from ray.data.aggregate import Max

    alt = (
        docs.map_batches(
            sketches._RegisterPartials, batch_format="pyarrow", batch_size=7,
            concurrency=(1, 2),
        )
        .groupby("bucket")
        .aggregate(Max("max_rank", alias_name="max_rank"))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    base = (
        sketches.hll_registers(sf_small)
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(alt, base)


def test_label_token_stats_parity(sf_small):
    con = _duck(sf_small)
    a = _compare(label_token_stats(sf_small), label_token_stats_sql(), con)
    assert (a["n_docs"] > 0).all()
    # avg is the exact quotient of the gated integers
    assert (a["avg_tokens"] == a["sum_tokens"] / a["n_docs"]).all()


def test_degree_histogram_mass_balance(sf_small):
    """sum(degree * n_subjects) == total triples in the deduped graph."""
    import __ray_entry__ as E

    h = E.queries()["kg_degree_histogram"](sf_small).to_pandas()
    total = int((h["degree"] * h["n_subjects"]).sum())
    n_triples = E.queries()["kg_triples"](sf_small).count()
    assert total == n_triples


def test_cms_parity_and_point_queries(sf_small):
    import duckdb
    import pandas as pd

    from ifctordf_ray.stages.sketches import cms_estimate, cms_registers, cms_registers_sql

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    a = cms_registers(sf_small).to_pandas()
    b = con.execute(cms_registers_sql()).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a2 = a[cols].sort_values(cols).reset_index(drop=True)
    b2 = b[cols].sort_values(cols).reset_index(drop=True).astype(a2.dtypes.to_dict())
    pd.testing.assert_frame_equal(a2, b2)

    # CMS guarantee: estimate >= true count, and per-row mass == corpus mass
    from ifctordf_ray.stages.textstats import WORD_RE

    true = con.execute(
        f"""SELECT word, count(*) AS n FROM (
            SELECT unnest(regexp_extract_all(lower(coalesce(text,'')), '{WORD_RE}')) AS word
            FROM documents) GROUP BY word ORDER BY n DESC LIMIT 20"""
    ).df()
    cells = list(a.itertuples(index=False, name=None))
    total_mass = int(true_n := con.execute(
        f"""SELECT count(*) FROM (
            SELECT unnest(regexp_extract_all(lower(coalesce(text,'')), '{WORD_RE}')) AS word
            FROM documents)"""
    ).fetchone()[0])
    per_row = a.groupby("sketch_row")["total"].sum()
    assert (per_row == total_mass).all()
    for _, r in true.iterrows():
        assert cms_estimate(cells, r["word"]) >= r["n"]


def test_table_checksum_parity_and_merge(sf_small):
    """Audit checksum matches DuckDB exactly, covers every row once, and
    is invariant to input partitioning (merge of modular sums)."""
    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    from ifctordf_ray.stages.sketches import table_checksum, table_checksum_sql

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    a = table_checksum(sf_small).to_pandas()
    b = con.execute(table_checksum_sql()).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    n_docs = pq.ParquetFile(f"{sf_small}/documents.parquet").metadata.num_rows
    assert int(a.n_rows.sum()) == n_docs
