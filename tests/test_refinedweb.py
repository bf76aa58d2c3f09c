"""RefinedWeb rule-table filters: cross-engine parity, an independent
pure-Python reference, and non-degeneracy of the rules on this corpus."""

import re

import duckdb
import pyarrow.parquet as pq

from ifctordf_ray.stages.textstats import (
    RW_MIN_STOP,
    RW_MIN_WORDS,
    RW_MWL_HI,
    RW_MWL_LO,
    STOPWORDS,
    refinedweb_filters,
    refinedweb_filters_sql,
)


def _py_reference(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = {}
    for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        ws = re.findall(r"[a-z0-9]+", (x or "").lower())
        n, sl = len(ws), sum(len(w) for w in ws)
        ns = len({w for w in ws if w in STOPWORDS})
        pw = int(RW_MIN_WORDS <= n <= 100_000)
        pm = int(RW_MWL_LO * n <= sl <= RW_MWL_HI * n)
        ps = int(ns >= RW_MIN_STOP)
        out[d] = (n, sl, ns, pw, pm, ps, int(pw and pm and ps and n > 0))
    return out


def test_refinedweb_filters(sf_small, ray_session):
    ref = _py_reference(sf_small)
    eng = refinedweb_filters(sf_small).to_pandas()
    assert len(eng) == len(ref)
    for r in eng.itertuples():
        assert (
            r.n_words,
            r.sum_word_len,
            r.n_stopwords,
            r.pass_words,
            r.pass_mwl,
            r.pass_stop,
            r.keep,
        ) == ref[r.doc_id], r.doc_id
    # the rules must discriminate on this corpus (not dead weight)
    assert 0 < eng.keep.sum() < len(eng)
    assert eng.pass_words.sum() < len(eng)
    assert eng.pass_stop.sum() < len(eng)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    sql = con.execute(refinedweb_filters_sql()).df().sort_values("doc_id")
    a = eng.sort_values("doc_id")
    for col in ("n_words", "sum_word_len", "n_stopwords", "keep"):
        assert list(a[col]) == list(sql[col]), col


def test_source_datasheet(sf_small, ray_session):
    """Datasheet rollup: consistency with the flat per-doc passes plus
    cross-engine parity."""
    import duckdb
    import pyarrow.parquet as pq

    from ifctordf_ray.stages.textstats import (
        refinedweb_filters,
        source_datasheet,
        source_datasheet_sql,
    )

    sheet = source_datasheet(sf_small).to_pandas().set_index("source")
    flags = refinedweb_filters(sf_small).to_pandas().set_index("doc_id")
    t = pq.read_table(
        f"{sf_small}/documents.parquet", columns=["doc_id", "source", "lang", "n_chars"]
    ).to_pandas()
    t["keep"] = t.doc_id.map(flags.keep)
    t["n_words"] = t.doc_id.map(flags.n_words)
    ref = t.groupby("source").agg(
        n_docs=("doc_id", "size"),
        n_langs=("lang", "nunique"),
        sum_words=("n_words", "sum"),
        sum_chars=("n_chars", "sum"),
        n_keep=("keep", "sum"),
    )
    assert len(sheet) == len(ref)
    for src, row in ref.iterrows():
        got = sheet.loc[src]
        for col in ref.columns:
            assert int(got[col]) == int(row[col]), (src, col)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    sql = con.execute(source_datasheet_sql()).df().set_index("source")
    for src in ref.index:
        assert int(sheet.loc[src].n_keep) == int(sql.loc[src].n_keep)
