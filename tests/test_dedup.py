"""Dedup operators: MinHash estimates vs exact Jaccard (pure-Python
oracle), SimHash locality, exact-dedup first-seen semantics."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ifctordf_ray.stages import dedup


def test_minhash_estimates_jaccard():
    mh = dedup.MinHasher()
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "the quick brown fox jumps over the lazy cat again and again"
    c = "completely different words entirely unrelated content here now"
    sa, sb, sc = mh.signature(a), mh.signature(b), mh.signature(c)
    ja = len(dedup.shingles(a) & dedup.shingles(b)) / len(
        dedup.shingles(a) | dedup.shingles(b)
    )
    est = float(np.mean(sa == sb))
    assert abs(est - ja) < 0.25  # 64 perms -> ~1/sqrt(64) error
    assert float(np.mean(sa == sc)) < 0.2
    # determinism across instances (seeded spec, never Python hash())
    assert np.array_equal(sa, dedup.MinHasher().signature(a))


def test_simhash_locality():
    sh = dedup.SimHasher()
    a = sh.simhash("the quick brown fox jumps over the lazy dog " * 5)
    b = sh.simhash("the quick brown fox jumps over the lazy cat " * 5)
    c = sh.simhash("entirely unrelated totally different text body " * 5)
    ham_ab = bin(a ^ b).count("1")
    ham_ac = bin(a ^ c).count("1")
    assert ham_ab < ham_ac


def _docs_ds(tmp_path, texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["t"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    import pyarrow.parquet as pq

    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    return str(tmp_path / "docs")


def test_lsh_pipeline_finds_planted_near_dups(tmp_path):
    base = "spark group query row data slow small filter customer line batch value " * 3
    texts = [f"unique document number {i} with its own words {i * 7} " * 4 for i in range(20)]
    texts += [base, base + " tiny change"]  # planted near-dup pair: ids 20, 21
    sf = _docs_ds(tmp_path, texts)
    pairs = dedup.near_dup_pairs_minhash(sf, threshold=0.5).take_all()
    assert any(p["doc_a"] == 20 and p["doc_b"] == 21 for p in pairs)
    verified = dedup.verified_near_dups(sf, threshold=0.5).take_all()
    got = {(p["doc_a"], p["doc_b"]): p["jaccard"] for p in verified}
    assert (20, 21) in got
    sa, sb = dedup.shingles(texts[20]), dedup.shingles(texts[21])
    assert got[(20, 21)] == pytest.approx(len(sa & sb) / len(sa | sb))


def test_minhash_pair_shapes_agree(tmp_path):
    # ship_sigs=True (sig rides every band row) and ship_sigs=False
    # (lean band rows + sig join onto surviving pairs) are two physical
    # plans for the same operator: identical output required
    base = "spark group query row data slow small filter customer line batch value " * 3
    texts = [f"unique document number {i} with its own words {i * 7} " * 4 for i in range(12)]
    texts += [base, base + " tiny change", base + " another tweak"]
    sf = _docs_ds(tmp_path, texts)

    def key(rows):
        return sorted((r["doc_a"], r["doc_b"], round(r["est_jaccard"], 9)) for r in rows)

    heavy = key(dedup.near_dup_pairs_minhash(sf, threshold=0.3, ship_sigs=True).take_all())
    lean = key(dedup.near_dup_pairs_minhash(sf, threshold=0.3, ship_sigs=False).take_all())
    assert heavy == lean and len(heavy) > 0


def test_band_hash_polynomial_spec():
    # the vectorized band hash must equal the scalar spec: per-term mod,
    # 4-term sum, + band id, mod M61 (the arithmetic the SQL oracle runs)
    from ifctordf_ray.stages.dedup import (
        _BAND_COEF, _M61, NUM_BANDS, ROWS_PER_BAND, MinHasher, _explode_bands,
    )

    batch = pa.table(
        {
            "doc_id": pa.array([7, 8], pa.int64()),
            "text": ["alpha beta gamma delta epsilon zeta", "other words entirely here now ok"],
        }
    )
    sigs = MinHasher()(batch)
    bands = _explode_bands(sigs)
    got = {
        (r["doc_id"], r["band_id"]): r["band_hash"] for r in bands.to_pylist()
    }
    for row in sigs.to_pylist():
        sig = row["sig"]
        for b in range(NUM_BANDS):
            chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
            want = (
                sum((int(v) * c) % _M61 for v, c in zip(chunk, _BAND_COEF)) + b
            ) % _M61
            assert got[(row["doc_id"], b)] == want


def test_exact_duplicates_first_seen(tmp_path):
    texts = ["same  TEXT here", "same text HERE", "other", "same text here"]
    sf = _docs_ds(tmp_path, texts)
    rows = dedup.exact_duplicates(sf).take_all()
    by_n = {r["n_docs"]: r for r in rows}
    # whitespace-collapsed lowercase canonical form: docs 0,1,3 are one group
    assert by_n[3]["keep_doc_id"] == 0  # first-seen (min doc_id) wins
    assert by_n[1]["keep_doc_id"] == 2


def test_verified_near_dups_at_driver_scale_partitions(tmp_path):
    """Regression for the r2 driver failure: verified_near_dups crashed
    with ArrowInvalid when the join ran at the 32-CPU default partition
    count (16) because empty join partitions finalized with an
    empty-schema table (kernels.join_ready docstring).  The 4-CPU test
    session uses 2 partitions and masked it — so force 16 here, with a
    candidate set far smaller than the partition count."""
    base = "spark group query row data slow small filter customer line batch value " * 3
    texts = [f"unique document number {i} with its own words {i * 7} " * 4 for i in range(20)]
    texts += [base, base + " tiny change"]
    sf = _docs_ds(tmp_path, texts)
    verified = dedup.verified_near_dups(sf, threshold=0.5, num_partitions=16).take_all()
    got = {(p["doc_a"], p["doc_b"]) for p in verified}
    assert (20, 21) in got


def test_containment_asymmetric_quote(tmp_path):
    """A short doc fully quoted inside a long one: containment of the
    short side is ~1.0 while Jaccard is low — the asymmetric score must
    catch it from the quoted direction."""
    # Tail tuned so the pair deterministically collides in one LSH band
    # (md5-derived permutations are fixed) at Jaccard 0.40 — BELOW the
    # verified_near_dups 0.5 bar — while containment_ab is exactly 1.0.
    quote = (
        "the quick brown fox jumps over the lazy dog near the river bank today "
        "while birds sing softly above the quiet meadow and wind moves through tall grass "
        "carrying seeds across the open field toward distant hills under a pale morning sky"
    )
    long_doc = quote + " " + " ".join(
        f"tail4 word {i} extra {i * 3 + 4}" for i in range(12)
    )
    texts = [f"unrelated filler document {i} with words {i * 11} " * 4 for i in range(10)]
    texts += [quote, long_doc]  # ids 10 (short), 11 (long)
    sf = _docs_ds(tmp_path, texts)
    rows = dedup.containment_scores(sf, threshold=0.6, num_partitions=8).take_all()
    got = {(r["doc_a"], r["doc_b"]): r for r in rows}
    assert (10, 11) in got
    r = got[(10, 11)]
    sa, sb = dedup.shingles(texts[10]), dedup.shingles(texts[11])
    assert r["containment_ab"] == pytest.approx(len(sa & sb) / len(sa))
    assert r["containment_ab"] == 1.0
    assert r["containment_ba"] == pytest.approx(len(sa & sb) / len(sb))
    assert r["containment_ba"] < 0.5
    # symmetric Jaccard verify at its default 0.5 threshold misses it
    ver = dedup.verified_near_dups(sf, threshold=0.5, num_partitions=8).take_all()
    assert (10, 11) not in {(v["doc_a"], v["doc_b"]) for v in ver}


def test_verified_near_dups_no_candidates(tmp_path):
    """All-unique corpus: the candidate set is EMPTY — the join must
    return zero rows, not crash (sentinel-row path in join_ready)."""
    texts = [f"totally distinct content {i} nothing shared {i * 13} " * 3 for i in range(8)]
    sf = _docs_ds(tmp_path, texts)
    assert dedup.verified_near_dups(sf, threshold=0.5, num_partitions=8).count() == 0


def test_minhash_bucket_cap_matches_sql(tmp_path):
    """A hot bucket (60 identical docs > MAX_BUCKET=50) must produce the
    SAME pair set in the engine and the SQL oracle — the r2 ADVICE
    divergence: the engine caps buckets, the SQL previously did not."""
    import duckdb

    texts = ["the same repeated document body here again " * 5] * 60
    texts += [f"unique filler document {i} unrelated content {i * 3} " * 3 for i in range(5)]
    sf = _docs_ds(tmp_path, texts)
    got = {
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in dedup.near_dup_pairs_minhash(sf, threshold=0.5).take_all()
    }
    assert len(got) == 50 * 49 // 2  # capped pair count, not C(60,2)
    con = duckdb.connect()
    con.sql(f"create view documents as select * from '{sf}/documents.parquet'")
    exp = {
        (a, b, est)
        for a, b, est in con.sql(
            dedup.near_dup_pairs_minhash_sql(threshold=0.5)
        ).fetchall()
    }
    assert got == exp


def test_simhash_near_dup_pairs(tmp_path):
    """Banded simhash pairs == all-pairs Hamming scan (banding is
    lossless at radius BANDS-1), and == the SQL oracle."""
    import duckdb

    base = "spark group query row data slow small filter customer line batch value " * 4
    texts = [f"doc {i} totally different words {i * 11} content body {i * 7} " * 4 for i in range(15)]
    texts += [base, base + " tweak", base + " other tweak"]
    sf = _docs_ds(tmp_path, texts)
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.near_dup_pairs_simhash(sf).take_all()
    }
    # brute-force oracle
    sh = dedup.SimHasher()
    hashes = [sh.simhash(t) for t in texts]
    exp = set()
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            ham = (hashes[a] ^ hashes[b]).bit_count()
            if ham <= dedup.SIMHASH_MAX_HAMMING:
                exp.add((a, b, ham))
    assert got == exp and len(exp) > 0
    con = duckdb.connect()
    con.sql(f"create view documents as select * from '{sf}/documents.parquet'")
    sql = {(a, b, h) for a, b, h in con.sql(dedup.near_dup_pairs_simhash_sql()).fetchall()}
    assert got == sql


def test_near_dup_clusters_transitive(tmp_path):
    """Connected components must close over CHAINS: A~B and B~C place
    A, B, C in one cluster even when A and C are not a verified pair."""
    mid = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    texts = [f"filler document {i} with its own unrelated words {i * 9} " * 4 for i in range(10)]
    a = len(texts); texts.append(mid + "tail one two three four five six seven eight nine")
    b = len(texts); texts.append(mid)  # similar to both neighbors
    c = len(texts); texts.append("head one two three four five six seven eight nine " + mid)
    sf = _docs_ds(tmp_path, texts)
    rows = dedup.near_dup_clusters(sf, threshold=0.4).take_all()
    by_doc = {r["doc_id"]: r["cluster_id"] for r in rows}
    assert len(rows) == len(texts)
    assert by_doc[a] == by_doc[b] == by_doc[c] == a  # min-id labeling
    # singletons label themselves
    assert by_doc[0] == 0
    # applied dedup keeps exactly one of the chain
    kept = {r["doc_id"] for r in dedup.near_dedup_doc_ids(sf, threshold=0.4).take_all()}
    assert kept & {a, b, c} == {a}
    assert 0 in kept


def test_min_label_components_long_chain():
    """Direct unit for the iterative engine: a 10-node PATH graph
    (diameter 9 — needs multiple propagation rounds, unlike the tiny
    cliques real near-dup data produces) collapses to one cluster."""
    import pyarrow as pa
    import ray.data

    pairs = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(list(range(9)), pa.int64()),
                "b": pa.array(list(range(1, 10)), pa.int64()),
            }
        )
    )
    ids = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(list(range(12)), pa.int64())})
    )
    rows = dedup.min_label_components(pairs, "a", "b", ids, "doc_id").take_all()
    by = {r["doc_id"]: r["cluster_id"] for r in rows}
    assert all(by[i] == 0 for i in range(10))   # whole path -> min id 0
    assert by[10] == 10 and by[11] == 11        # singletons untouched


def test_decontaminate_parity_and_membership(sf_small):
    import duckdb
    import pandas as pd

    from ifctordf_ray.stages.dedup import (
        DECON_EVAL_MOD,
        decontaminate,
        decontaminate_sql,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    a = decontaminate(sf_small).to_pandas()
    b = con.execute(decontaminate_sql()).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    # only corpus docs are flagged, never eval docs; every hit count >= 1
    assert (a["doc_id"] % DECON_EVAL_MOD != 0).all()
    assert (a["n_hits"] >= 1).all()


def test_decontaminate_at_driver_partitioning(sf_small):
    # empty-partition join regression guard at the 32-CPU default
    import pandas as pd

    from ifctordf_ray.stages.dedup import decontaminate

    a = decontaminate(sf_small, num_partitions=16).to_pandas()
    b = decontaminate(sf_small).to_pandas()
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_dup_span_stats(sf_small):
    """Engine vs SQL oracle vs an independent dict-based reference for
    the grid-approximated duplicated-span counters."""
    import duckdb
    import pyarrow.parquet as pq

    from ifctordf_ray.stages.dedup import (
        SPAN_LEN,
        SPAN_STRIDE,
        dup_span_stats,
        dup_span_stats_sql,
    )

    got = (
        dup_span_stats(sf_small)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )

    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from "
        f"'{sf_small}/documents.parquet'"
    )
    exp = con.sql(dup_span_stats_sql()).df().sort_values(
        "doc_id", ignore_index=True
    )
    assert got.equals(exp)

    # independent reference: dict of window -> set(docs), per-doc counts
    t = pq.read_table(
        f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
    )
    windows: dict = {}
    per_doc: dict = {}
    for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        x = x or ""
        spans = [
            x[p : p + SPAN_LEN]
            for p in range(0, len(x) - SPAN_LEN + 1, SPAN_STRIDE)
        ]
        if not spans:
            continue
        per_doc[d] = spans
        for s in spans:
            windows.setdefault(s, set()).add(d)
    ref = {
        d: (len(spans), sum(1 for s in spans if len(windows[s]) >= 2))
        for d, spans in per_doc.items()
    }
    got_map = {
        r.doc_id: (r.n_grid, r.n_dup_grid)
        for r in got.itertuples(index=False)
    }
    assert got_map == ref
    # the synthetic corpus is repetitive enough that the operator must
    # actually find cross-doc duplicated spans
    assert sum(v[1] for v in ref.values()) > 0


def test_cluster_keepers(sf_small, ray_session):
    """Quality-argmax keeper per near-dup cluster: cross-engine parity +
    consistency with the flat clusters/scores passes + the property that
    quality-argmax actually diverges from first-seen-wins somewhere."""
    import duckdb

    from ifctordf_ray.stages.dedup import (
        cluster_keepers,
        cluster_keepers_sql,
        near_dup_clusters,
    )
    from ifctordf_ray.stages.textstats import model_scores

    keep = cluster_keepers(sf_small).to_pandas().set_index("cluster_id")
    cl = near_dup_clusters(sf_small).to_pandas()
    sc = model_scores(sf_small).to_pandas().set_index("doc_id").score_micro
    assert len(keep) == cl.cluster_id.nunique()
    diverged = 0
    for cid, g in cl.groupby("cluster_id"):
        members = sorted(g.doc_id)
        best = min(members, key=lambda d: (-sc[d], d))
        row = keep.loc[cid]
        assert row.keeper_doc_id == best, cid
        assert row.n_members == len(members)
        assert row.keeper_score_micro == sc[best]
        if len(members) > 1 and best != members[0]:
            diverged += 1
    assert diverged >= 1  # argmax != first-seen at least once

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    sql = con.execute(cluster_keepers_sql()).df().set_index("cluster_id")
    assert sorted(keep.index) == sorted(sql.index)
    for cid in keep.index:
        assert keep.loc[cid].keeper_doc_id == sql.loc[cid].keeper_doc_id


def test_pair_edit_distance(sf_small, ray_session):
    """Levenshtein verify of minhash candidates: parity + the DP itself
    against known distances + byte-level semantics."""
    import duckdb

    from ifctordf_ray.stages.dedup import (
        _lev_bytes,
        pair_edit_distance,
        pair_edit_distance_sql,
    )

    # pinned DP cases (incl. the UTF-8 byte semantics DuckDB uses)
    assert _lev_bytes(b"kitten", b"sitting") == 3
    assert _lev_bytes(b"", b"abc") == 3
    assert _lev_bytes("café".encode(), "cafe".encode()) == 2
    assert _lev_bytes(b"same", b"same") == 0

    eng = (
        pair_edit_distance(sf_small)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert len(eng) > 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    sql = (
        con.execute(pair_edit_distance_sql())
        .df()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert list(eng.lev_dist) == list(sql.lev_dist)
    assert list(eng.sim_micro) == list(sql.sim_micro)
    # exact-duplicate prefixes score 1e6; others less
    assert (eng.sim_micro <= 1_000_000).all()
    assert (eng.lev_dist >= 0).all()


def test_paragraph_dedup_crafted(tmp_path):
    """Doc 2 = 2 segments copied from doc 0 + 2 unique segments ->
    dup_ratio exactly 0.5 and keep=False at the 0.5 bar; fully-unique
    docs score 0.0; an exact duplicate pair scores 1.0 both sides."""
    segA = [f"alpha{i} " * dedup.SEG_WORDS for i in range(4)]  # 4 x 10 words
    seg0 = " ".join(f"w{i}x{j}" for i in range(4) for j in range(dedup.SEG_WORDS))
    shared = " ".join(f"s{j}" for j in range(2 * dedup.SEG_WORDS))
    uniq2 = " ".join(f"u{j}" for j in range(2 * dedup.SEG_WORDS))
    doc0 = shared + " " + " ".join(f"z{j}" for j in range(2 * dedup.SEG_WORDS))
    doc2 = shared + " " + uniq2
    texts = [doc0, seg0, doc2, "twin doc " * 7, "twin doc " * 7]
    sf = _docs_ds(tmp_path, texts)
    rows = {r["doc_id"]: r for r in dedup.paragraph_dedup(sf).take_all()}
    assert len(rows) == 5
    assert rows[0]["n_segments"] == 4 and rows[0]["n_dup_segments"] == 2
    assert rows[0]["dup_ratio"] == pytest.approx(0.5) and not rows[0]["keep"]
    assert rows[2]["dup_ratio"] == pytest.approx(0.5) and not rows[2]["keep"]
    assert rows[1]["n_dup_segments"] == 0 and rows[1]["keep"]
    # exact twins: every segment (incl. ragged tail) duplicated
    assert rows[3]["dup_ratio"] == 1.0 and rows[4]["dup_ratio"] == 1.0


def test_paragraph_dedup_driver_scale_partitions(tmp_path):
    """Regression shape from round 2's verified_near_dups crash: the
    chained joins must survive partition counts far above the candidate
    block count (empty-schema partitions)."""
    texts = [f"solo doc {i} " * 12 for i in range(6)]
    sf = _docs_ds(tmp_path, texts)
    rows = dedup.paragraph_dedup(sf, num_partitions=16).take_all()
    assert len(rows) == 6
    assert all(r["n_dup_segments"] == 0 and r["keep"] for r in rows)


def test_ngram_novelty_parity_and_invariants(sf_small, tmp_path):
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    a = dedup.ngram_novelty(sf_small).to_pandas()
    b = con.execute(dedup.ngram_novelty_sql()).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_novel"] <= a["n_shingles"]).all()
    assert ((a["novelty"] >= 0) & (a["novelty"] <= 1)).all()

    # crafted: doc 1 copies doc 0 verbatim -> 0 novel; doc 2 is fresh -> 1.0
    texts = ["one two three four five six", "one two three four five six",
             "seven eight nine ten eleven twelve"]
    sf = _docs_ds(tmp_path, texts)
    rows = {r["doc_id"]: r for r in dedup.ngram_novelty(sf).take_all()}
    assert rows[0]["novelty"] == 1.0 and rows[0]["n_shingles"] == 4
    assert rows[1]["novelty"] == 0.0 and rows[1]["n_novel"] == 0
    assert rows[2]["novelty"] == 1.0


def test_dup_span_exact(sf_small):
    """Exact tier (stride-1 grams): engine vs SQL oracle vs an
    independent brute-force reference, plus the exactness guarantee the
    grid screen lacks — a doc has n_dup_grams > 0 IFF it shares a
    >= span_len char span with another doc at ANY offset."""
    import duckdb
    import pyarrow.parquet as pq

    from ifctordf_ray.stages.dedup import (
        SPAN_LEN,
        dup_span_exact,
        dup_span_exact_sql,
    )

    got = (
        dup_span_exact(sf_small)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from "
        f"'{sf_small}/documents.parquet'"
    )
    exp = con.sql(dup_span_exact_sql()).df().sort_values(
        "doc_id", ignore_index=True
    )
    assert got.equals(exp)

    # independent reference: dict gram -> docs, distinct-gram counts
    t = pq.read_table(
        f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
    )
    gram_docs: dict = {}
    per_doc: dict = {}
    for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        x = x or ""
        grams = {
            x[i : i + SPAN_LEN] for i in range(len(x) - SPAN_LEN + 1)
        }
        if grams:
            per_doc[d] = grams
            for g in grams:
                gram_docs.setdefault(g, set()).add(d)
    ref = {
        d: (len(gs), sum(1 for g in gs if len(gram_docs[g]) >= 2))
        for d, gs in per_doc.items()
    }
    mine = {
        r.doc_id: (r.n_grams, r.n_dup_grams) for r in got.itertuples()
    }
    assert mine == ref


def test_dup_span_exact_cross_offset(tmp_path):
    """The case the stride grid misses: identical 24-char span at
    offsets 0 and 2 (offset difference not a multiple of SPAN_STRIDE=4
    plus misaligned); the exact tier must flag both docs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ifctordf_ray.stages.dedup import dup_span_exact

    span = "abcdefghijklmnopqrstuvwx"  # 24 chars
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                span + " tail one",
                "zq" + span + " other tail",
                "completely unrelated text here",
            ],
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = (
        dup_span_exact(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")["n_dup_grams"]
        .to_dict()
    )
    assert got[1] > 0 and got[2] > 0 and got[3] == 0
