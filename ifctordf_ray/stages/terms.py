r"""Term statistics and PII screening over the documents table.

- ``tfidf_top_terms``: per-document top-K terms by an exact-parity
  tf-idf score.  The full multi-stage distributed shape: map-side
  per-doc term counts (combiner — one row per DISTINCT (doc, word)),
  a document-frequency groupby over the same rows, a distributed join
  tf⋈df keyed on word, and a per-doc top-K ``map_groups``.
- ``pii_screen``: vectorized regex detection counts (emails, URLs,
  phone-like runs) plus the md5 of the redacted text — the audit row a
  corpus build records before/after scrubbing.  Pure narrow map.

Exact-parity notes: the tf-idf score is ``tf * N / df`` computed as one
IEEE double division of exactly-representable integers (a transcendental
``ln`` would not hash-match across libm implementations); regexes are
RE2-safe and shared verbatim with the SQL oracles (both Python ``re``
and DuckDB use leftmost-first, non-overlapping scans for these
alternation-simple patterns).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import ray.data

from ifctordf_ray.sources.transcripts import clean_read_parquet as _clean_read_parquet
from ifctordf_ray.stages.textstats import WORD_RE

TFIDF_TOP_K = 5

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
URL_RE = r"https?://[^\s]+"
PHONE_RE = r"\+?[0-9][0-9() .-]{6,}[0-9]"


class TermCounter:
    """map_batches combiner: one (doc_id, word, tf) row per distinct
    word per doc — the shuffle moves distinct-term rows, never one row
    per token occurrence."""

    def __init__(self):
        self.word_re = re.compile(WORD_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        doc_ids, words, tfs = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            c = Counter(self.word_re.findall((t or "").lower()))
            for w, n in c.items():
                doc_ids.append(d)
                words.append(w)
                tfs.append(n)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "word": pa.array(words, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
            }
        )


def tfidf_top_terms(
    sf_dir: str, top_k: int = TFIDF_TOP_K, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Per doc, the `top_k` terms by score = tf * N / df (ties broken by
    word ASC).  N (total docs) is the one driver-side scalar — a parquet
    metadata count, O(#files) not O(rows).

    Scale shape: tf rows are combiner output (distinct terms per doc);
    df is a word-keyed groupby over those rows (vocab-sized result); the
    tf⋈df join is a distributed hash join on word (the df side descends
    from a groupby, so it goes through join_ready — see
    functions/kernels.py for the empty-block contract); the final top-K
    is a doc-keyed map_groups, bounded by terms-per-doc."""
    from ray.data.aggregate import Count as _Count

    from ifctordf_ray.functions.kernels import safe_join

    docs = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n_docs = docs.count()  # parquet metadata count, no scan
    tf = docs.map_batches(TermCounter, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0)
    df = (
        tf.groupby("word")
        .aggregate(_Count(alias_name="df"))
        .map_batches(
            lambda t: pa.table({"w": t["word"], "df": t["df"]}),
            batch_format="pyarrow",
        )
    )
    joined = safe_join(
        tf,
        pa.schema(
            [("doc_id", pa.int64()), ("word", pa.string()), ("tf", pa.int64())]
        ),
        df,
        pa.schema([("w", pa.string()), ("df", pa.int64())]),
        join_type="inner",
        on=("word",),
        right_on=("w",),
        num_partitions=num_partitions,
    )

    def score(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = pc.divide(
            pc.cast(pc.multiply(t["tf"], n_docs), pa.float64()),
            pc.cast(t["df"], pa.float64()),
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "word": t["word"],
                "tf": t["tf"],
                "df": t["df"],
                "score": s,
            }
        )

    def head_k(g: pa.Table) -> pa.Table:
        order = [("score", "descending"), ("word", "ascending")]
        return g.sort_by(order).slice(0, top_k)

    return (
        joined.map_batches(score, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(head_k, batch_format="pyarrow")
    )


def tfidf_top_terms_sql(top_k: int = TFIDF_TOP_K) -> str:
    return f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(coalesce(text, '')), '{WORD_RE}'))
                   AS word
        FROM documents
    ),
    tf AS (
        SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, word
    ),
    df AS (
        SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM tok GROUP BY word
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.word, tf.tf, df.df,
               CAST(tf.tf * n.n AS DOUBLE) / CAST(df.df AS DOUBLE) AS score
        FROM tf JOIN df USING (word) CROSS JOIN n
    )
    SELECT doc_id, word, tf, df, score
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, word ASC) AS rn
        FROM scored
    ) WHERE rn <= {top_k}
    """


class PiiScreen:
    """map_batches stage: detection counts per category + md5 of the
    text with every match replaced by a fixed tag (email -> url ->
    phone, in that order, global replace — the order is part of the
    spec and shared with the SQL oracle)."""

    def __init__(self):
        self.email_re = re.compile(EMAIL_RE)
        self.url_re = re.compile(URL_RE)
        self.phone_re = re.compile(PHONE_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_email, n_url, n_phone, fps = [], [], [], []
        for t in batch["text"].to_pylist():
            t = t or ""
            n_email.append(len(self.email_re.findall(t)))
            red = self.email_re.sub("<EMAIL>", t)
            n_url.append(len(self.url_re.findall(red)))
            red = self.url_re.sub("<URL>", red)
            n_phone.append(len(self.phone_re.findall(red)))
            red = self.phone_re.sub("<PHONE>", red)
            fps.append(hashlib.md5(red.encode("utf-8")).hexdigest())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_emails": pa.array(n_email, pa.int64()),
                "n_urls": pa.array(n_url, pa.int64()),
                "n_phones": pa.array(n_phone, pa.int64()),
                "redacted_fp": pa.array(fps, pa.string()),
            }
        )


def pii_screen(sf_dir: str) -> ray.data.Dataset:
    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(PiiScreen, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0)


def pii_screen_sql() -> str:
    email = EMAIL_RE.replace("'", "''")
    url = URL_RE.replace("'", "''")
    phone = PHONE_RE.replace("'", "''")
    return rf"""
    SELECT doc_id,
           len(regexp_extract_all(coalesce(text, ''), '{email}')) AS n_emails,
           len(regexp_extract_all(
               regexp_replace(coalesce(text, ''), '{email}', '<EMAIL>', 'g'),
               '{url}')) AS n_urls,
           len(regexp_extract_all(
               regexp_replace(regexp_replace(coalesce(text, ''),
                   '{email}', '<EMAIL>', 'g'), '{url}', '<URL>', 'g'),
               '{phone}')) AS n_phones,
           md5(regexp_replace(regexp_replace(regexp_replace(coalesce(text, ''),
               '{email}', '<EMAIL>', 'g'), '{url}', '<URL>', 'g'),
               '{phone}', '<PHONE>', 'g')) AS redacted_fp
    FROM documents
    """


# ---------------------------------------------------------------------------
# Inverted index: word -> document-frequency + a bounded posting list.
# The postings string carries the first POSTINGS_CAP doc_ids in doc_id
# order — bounded per word BY DESIGN (a stopword's full posting list is
# corpus-sized at 100 TB; df still counts every doc).  Hot-key safety:
# the posting list is built by a CUSTOM bounded AggregateFn, so the
# accumulator is O(cap) at every stage — per-block partials, cross-block
# merges, and the final row — even when a stopword's df is corpus-sized.
# (A map_groups formulation would funnel one row per matching doc into a
# single group for hot words; the aggregate keeps hot keys flat.)
# ---------------------------------------------------------------------------
POSTINGS_CAP = 50


def _postings_agg(cap: int):
    """AggregateFn: capped sorted set of the smallest doc_ids per word."""
    from ray.data.aggregate import AggregateFn

    def acc_block(acc: list, block: pa.Table) -> list:
        merged = sorted(set(acc) | set(block["doc_id"].to_pylist()))
        return merged[:cap]

    return AggregateFn(
        init=lambda k: [],
        merge=lambda a, b: sorted(set(a) | set(b))[:cap],
        accumulate_block=acc_block,
        finalize=lambda ids: ",".join(str(i) for i in ids),
        name="postings",
    )


def posting_lists(sf_dir: str, cap: int = POSTINGS_CAP) -> ray.data.Dataset:
    """(word, df, postings): document frequency and the comma-joined
    first `cap` doc_ids per word."""
    from ray.data.aggregate import Count as _Count

    docs = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = docs.map_batches(TermCounter, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0)
    return pairs.groupby("word").aggregate(
        _Count(alias_name="df"), _postings_agg(cap)
    )


def posting_lists_sql(cap: int = POSTINGS_CAP) -> str:
    return f"""
    WITH pairs AS (
        SELECT DISTINCT doc_id, word FROM (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(coalesce(text, '')), '{WORD_RE}'))
                       AS word
            FROM documents
        )
    ),
    ranked AS (
        SELECT word, doc_id,
               row_number() OVER (PARTITION BY word ORDER BY doc_id) AS rn,
               count(*) OVER (PARTITION BY word) AS df
        FROM pairs
    )
    SELECT word, CAST(any_value(df) AS BIGINT) AS df,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
    FROM ranked WHERE rn <= {cap}
    GROUP BY word
    """


# ---------------------------------------------------------------------------
# Bigram language-model counts: corpus-wide (w1, w2) -> n over
# consecutive word pairs within each document.  Same combiner discipline
# as vocabulary(): each batch ships one row per DISTINCT bigram in the
# batch, so the exchange moves combiner output, never per-token rows.
# ---------------------------------------------------------------------------
class _BigramPartials:
    def __init__(self):
        self.word_re = re.compile(WORD_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            ws = self.word_re.findall((t or "").lower())
            c.update(zip(ws[:-1], ws[1:]))
        return pa.table(
            {
                "w1": pa.array([k[0] for k in c], pa.string()),
                "w2": pa.array([k[1] for k in c], pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )


def bigram_counts(sf_dir: str) -> ray.data.Dataset:
    from ray.data.aggregate import Sum as _Sum

    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return (
        ds.map_batches(
            _BigramPartials,
            batch_format="pyarrow",
            concurrency=(1, 4),
            max_restarts=0,  # silence ray#53727 actor-restart warning
        )
        .groupby(["w1", "w2"])
        .aggregate(_Sum("n", alias_name="n"))
    )


def bigram_counts_sql() -> str:
    return f"""
    WITH wl AS (
        SELECT regexp_extract_all(lower(coalesce(text, '')), '{WORD_RE}') AS ws
        FROM documents
    ),
    b AS (
        SELECT ws[CAST(t.i + 1 AS INTEGER)] AS w1,
               ws[CAST(t.i + 2 AS INTEGER)] AS w2
        FROM wl CROSS JOIN UNNEST(range(greatest(len(ws) - 1, 0))) AS t(i)
    )
    SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY w1, w2
    """


# ---------------------------------------------------------------------------
# PMI collocations: bigram lift vs independent unigrams.  The classic
# aggregate-join-aggregate composition: two combiner-style corpus
# aggregates (bigram and unigram counts) joined on BOTH bigram slots,
# scored against corpus totals from a third streaming pass.
# ---------------------------------------------------------------------------
PMI_MIN_PAIR = 3


class _TokenTotals:
    """One (nu, nb) partial row per batch: corpus token and bigram
    position totals (the PMI denominators)."""

    def __init__(self):
        self.word_re = re.compile(WORD_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        nu = nb = 0
        for t in batch["text"].to_pylist():
            k = len(self.word_re.findall((t or "").lower()))
            nu += k
            nb += max(k - 1, 0)
        return pa.table(
            {"nu": pa.array([nu], pa.int64()), "nb": pa.array([nb], pa.int64())}
        )


def pmi_collocations(
    sf_dir: str, min_pair: int = PMI_MIN_PAIR
) -> ray.data.Dataset:
    """(w1, w2, n, c1, c2, lift): bigrams seen >= ``min_pair`` times with
    their unigram counts and the PMI lift ratio
    ``(n/Nb) / ((c1/Nu)*(c2/Nu))`` (the log is monotone in it, and a
    ratio of exactly-representable values hash-matches across engines
    where a transcendental would not).

    Scale shape: unigram counts are vocab-sized (sub-linear in corpus)
    and materialized because they are consumed by BOTH slot joins; the
    bigram table streams through two hash joins.  All three join inputs
    descend from groupbys, so each goes through ``join_ready``
    (empty-partition schema pinning — see functions/kernels.py)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum as _Sum

    from ifctordf_ray.functions.kernels import join_ready
    from ifctordf_ray.stages.textstats import WordPartialCounts
    from ifctordf_ray.tuning import join_kwargs

    docs = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    tot = docs.map_batches(
        _TokenTotals, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0
    ).aggregate(_Sum("nu", alias_name="nu"), _Sum("nb", alias_name="nb"))
    # empty corpus: Ray's aggregate returns None — any value works, every
    # real row is already gone by the time these scalars are used
    nu = float(tot["nu"] or 0)
    nb = float(tot["nb"] or 0)

    uni = (
        docs.map_batches(WordPartialCounts, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0)
        .groupby("word")
        .aggregate(_Sum("n", alias_name="c"))
        .materialize()  # vocab-sized (not corpus-sized); consumed twice
    )

    big = (
        docs.map_batches(_BigramPartials, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0)
        .groupby(["w1", "w2"])
        .aggregate(_Sum("n", alias_name="n"))
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["n"], min_pair)),
            batch_format="pyarrow",
        )
    )

    big = join_ready(
        big,
        pa.schema([("w1", pa.string()), ("w2", pa.string()), ("n", pa.int64())]),
        sentinel_row={"w1": "\x00big", "w2": "\x00big", "n": 0},
    )
    uni1 = join_ready(
        uni.map_batches(
            lambda t: pa.table({"word": t["word"], "c1": t["c"]}),
            batch_format="pyarrow",
        ),
        pa.schema([("word", pa.string()), ("c1", pa.int64())]),
        sentinel_row={"word": "\x00uni", "c1": 0},
    )
    uni2 = join_ready(
        uni.map_batches(
            lambda t: pa.table({"word": t["word"], "c2": t["c"]}),
            batch_format="pyarrow",
        ),
        pa.schema([("word", pa.string()), ("c2", pa.int64())]),
        sentinel_row={"word": "\x00uni", "c2": 0},
    )

    # Ray's hash join coalesces the right key into the left key column,
    # so no 'word' column survives the join.
    j1 = big.join(
        uni1, join_type="inner", on=("w1",), right_on=("word",), **join_kwargs()
    )
    j1 = join_ready(
        j1,
        pa.schema(
            [
                ("w1", pa.string()),
                ("w2", pa.string()),
                ("n", pa.int64()),
                ("c1", pa.int64()),
            ]
        ),
        sentinel_row={"w1": "\x00big", "w2": "\x00big", "n": 0, "c1": 0},
    )
    j2 = j1.join(
        uni2, join_type="inner", on=("w2",), right_on=("word",), **join_kwargs()
    )

    def score(t: pa.Table) -> pa.Table:
        n_d = pc.cast(t["n"], pa.float64())
        num = pc.multiply(pc.multiply(n_d, nu), nu)
        den = pc.multiply(
            pc.multiply(nb, pc.cast(t["c1"], pa.float64())),
            pc.cast(t["c2"], pa.float64()),
        )
        lift = pc.divide(num, den)
        return pa.table(
            {
                "w1": t["w1"],
                "w2": t["w2"],
                "n": t["n"],
                "c1": t["c1"],
                "c2": t["c2"],
                "lift": lift,
            }
        )

    return j2.map_batches(score, batch_format="pyarrow")


def pmi_collocations_sql(min_pair: int = PMI_MIN_PAIR) -> str:
    # lift mirrors the engine's exact IEEE expression tree:
    # ((n*Nu)*Nu) / ((Nb*c1)*c2) with every operand cast to DOUBLE first.
    return f"""
    WITH wl AS (
        SELECT regexp_extract_all(lower(coalesce(text, '')), '{WORD_RE}') AS ws
        FROM documents
    ),
    tot AS (
        SELECT CAST(sum(len(ws)) AS BIGINT) AS nu,
               CAST(sum(greatest(len(ws) - 1, 0)) AS BIGINT) AS nb
        FROM wl
    ),
    uc AS (
        SELECT word, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(ws) AS word FROM wl)
        GROUP BY word
    ),
    bc AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
        FROM (
            SELECT ws[CAST(t.i + 1 AS INTEGER)] AS w1,
                   ws[CAST(t.i + 2 AS INTEGER)] AS w2
            FROM wl CROSS JOIN UNNEST(range(greatest(len(ws) - 1, 0))) AS t(i)
        )
        GROUP BY w1, w2
        HAVING count(*) >= {min_pair}
    )
    SELECT bc.w1, bc.w2, bc.n, u1.c AS c1, u2.c AS c2,
           ((CAST(bc.n AS DOUBLE) * CAST(t.nu AS DOUBLE)) * CAST(t.nu AS DOUBLE))
           / ((CAST(t.nb AS DOUBLE) * CAST(u1.c AS DOUBLE)) * CAST(u2.c AS DOUBLE)) AS lift
    FROM bc
    CROSS JOIN tot t
    JOIN uc u1 ON bc.w1 = u1.word
    JOIN uc u2 ON bc.w2 = u2.word
    """


# ---------------------------------------------------------------------------
# Keyword search over the corpus: rank documents by total term frequency
# of a fixed query-term set — the inverted-index probe shape, executed
# as a scatter-gather top-k (per-block bottom-k, then a tiny global
# sort+limit; the corpus itself never shuffles).
# ---------------------------------------------------------------------------
SEARCH_TERMS = ("window", "vector", "batch")
SEARCH_TOP_K = 20


class _SearchScore:
    def __init__(self, terms: tuple[str, ...]):
        self.word_re = re.compile(WORD_RE)
        self.terms = set(terms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids, scores, matched = [], [], []
        for doc_id, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            c = Counter(self.word_re.findall((t or "").lower()))
            s = sum(c[w] for w in self.terms)
            if s > 0:
                ids.append(doc_id)
                scores.append(s)
                matched.append(sum(1 for w in self.terms if c[w] > 0))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "score": pa.array(scores, pa.int64()),
                "matched_terms": pa.array(matched, pa.int64()),
            }
        )


def keyword_search(
    sf_dir: str,
    terms: tuple[str, ...] = SEARCH_TERMS,
    top_k: int = SEARCH_TOP_K,
) -> ray.data.Dataset:
    """(doc_id, score, matched_terms): top-K docs by summed term
    frequency of ``terms`` (ties broken by doc_id ASC — deterministic
    total order)."""
    ds = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    scored = ds.map_batches(
        _SearchScore,
        fn_constructor_kwargs={"terms": terms},
        batch_format="pyarrow",
        concurrency=(1, 4),
        max_restarts=0,
    )
    # per-block top-k prune, then the global sort runs over k rows/block
    pruned = scored.map_batches(
        lambda t: t.sort_by(
            [("score", "descending"), ("doc_id", "ascending")]
        ).slice(0, top_k),
        batch_format="pyarrow",
    )
    return pruned.sort(["score", "doc_id"], descending=[True, False]).limit(top_k)


def keyword_search_sql(
    terms: tuple[str, ...] = SEARCH_TERMS, top_k: int = SEARCH_TOP_K
) -> str:
    lits = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')), '{WORD_RE}')) AS w
        FROM documents
    ),
    hits AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS score,
               CAST(count(DISTINCT w) AS BIGINT) AS matched_terms
        FROM tok WHERE w IN ({lits})
        GROUP BY doc_id
    )
    SELECT doc_id, score, matched_terms FROM hits
    ORDER BY score DESC, doc_id ASC LIMIT {top_k}
    """


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (Okapi BM25, k1=1.2 b=0.75) over the documents table
# ---------------------------------------------------------------------------
BM25_K1 = 1.2
BM25_B = 0.75

# NOTE on ln: unlike tf-idf above (which avoids transcendentals), BM25's
# idf keeps the real ln — pyarrow, CPython math.log and DuckDB ln all
# resolve to the same libm in this container (verified bit-identical over
# the idf domain), and the full score expression tree is written in the
# SAME order in both engines, so doubles hash-match end to end.


def _bm25_stats_partial(t: pa.Table, *, terms) -> pa.Table:
    """Per-batch partial for the corpus-stats pass: one row with
    (n_docs, sum_dl, df_<i> per term).  Summed by Dataset.aggregate —
    the classic map-side combiner, so the driver only ever sees one
    tiny row per batch."""
    import numpy as np
    import pyarrow.compute as pc

    from ifctordf_ray.functions.kernels import word_runs

    parents, flat = word_runs(t["text"])
    n = t.num_rows
    par = np.asarray(parents, dtype=np.int64) if len(parents) else np.zeros(0, np.int64)
    row = {
        "n_docs": pa.array([n], pa.int64()),
        "sum_dl": pa.array([int(par.size)], pa.int64()),
    }
    for i, term in enumerate(terms):
        m = pc.equal(flat, term)
        hit_docs = np.unique(par[np.asarray(m, dtype=bool)]) if len(flat) else []
        row[f"df_{i}"] = pa.array([int(len(hit_docs))], pa.int64())
    return pa.table(row)


def _bm25_score_batch(
    t: pa.Table, *, terms, idfs, avgdl, top_k
) -> pa.Table:
    import numpy as np
    import pyarrow.compute as pc

    from ifctordf_ray.functions.kernels import word_runs

    k1, b = BM25_K1, BM25_B
    parents, flat = word_runs(t["text"])
    n = t.num_rows
    par = np.asarray(parents, dtype=np.int64) if len(parents) else np.zeros(0, np.int64)
    dl = np.bincount(par, minlength=n).astype(np.float64)
    norm = k1 * ((1.0 - b) + b * (dl / avgdl))
    score = np.zeros(n, np.float64)
    matched = np.zeros(n, np.int64)
    for term, idf in zip(terms, idfs):
        m = np.asarray(pc.equal(flat, term), dtype=bool) if len(flat) else np.zeros(0, bool)
        tf = np.bincount(par[m], minlength=n).astype(np.float64)
        sat = (tf * (k1 + 1.0)) / (tf + norm)
        score = score + idf * sat  # fixed term order == SQL ((e1+e2)+e3)
        matched += tf > 0
    keep = matched > 0
    out = pa.table(
        {
            "doc_id": pc.cast(t["doc_id"], pa.int64()).filter(pa.array(keep)),
            "score": pa.array(score[keep], pa.float64()),
            "matched_terms": pa.array(matched[keep], pa.int64()),
        }
    )
    # per-block top-k prune: the global sort below runs over k rows/block
    return out.sort_by(
        [("score", "descending"), ("doc_id", "ascending")]
    ).slice(0, top_k)


def bm25_search(
    sf_dir: str,
    terms: tuple[str, ...] = SEARCH_TERMS,
    top_k: int = SEARCH_TOP_K,
) -> ray.data.Dataset:
    """(doc_id, score, matched_terms): top-K documents by Okapi BM25 for
    the fixed query ``terms`` — the ranked sibling of keyword_search.
    Two streaming passes over the pruned (doc_id, text) read: pass 1 is
    a map-side-combined corpus-stats aggregate (N, total token count,
    per-term document frequency — a handful of scalars on the driver);
    pass 2 scores each batch against those broadcast scalars, prunes to
    top-K per block, and finishes with a k-rows-per-block global sort.
    Nothing corpus-sized ever leaves the workers."""
    import math

    from ray.data.aggregate import Sum

    ds = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    stats = ds.map_batches(
        _bm25_stats_partial, fn_kwargs={"terms": tuple(terms)},
        batch_format="pyarrow",
    ).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_dl", alias_name="sum_dl"),
        *[Sum(f"df_{i}", alias_name=f"df_{i}") for i in range(len(terms))],
    )
    n_docs = int(stats["n_docs"] or 0)
    sum_dl = int(stats["sum_dl"] or 0)
    # empty corpus: avgdl is never consumed (no rows to score) — any
    # non-zero value avoids the 0/0
    avgdl = float(sum_dl) / float(n_docs) if n_docs else 1.0
    idfs = []
    for i in range(len(terms)):
        df = int(stats[f"df_{i}"] or 0)
        idfs.append(
            math.log(1.0 + (float(n_docs - df) + 0.5) / (float(df) + 0.5))
        )
    scored = ds.map_batches(
        _bm25_score_batch,
        fn_kwargs={
            "terms": tuple(terms),
            "idfs": tuple(idfs),
            "avgdl": avgdl,
            "top_k": top_k,
        },
        batch_format="pyarrow",
    )
    return scored.sort(["score", "doc_id"], descending=[True, False]).limit(top_k)


def bm25_search_sql(
    terms: tuple[str, ...] = SEARCH_TERMS, top_k: int = SEARCH_TOP_K
) -> str:
    """Mirrors the engine's exact IEEE expression tree: idf = ln(1 +
    (N - df + 0.5)/(df + 0.5)), saturation denominator k1*((1-b) +
    b*(dl/avgdl)), per-term parts summed left to right."""
    k1, b = BM25_K1, BM25_B
    tf_cols = ",\n           ".join(
        f"CAST(count(*) FILTER (WHERE w = '{t}') AS BIGINT) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"CAST(count(*) FILTER (WHERE tf_{i} > 0) AS BIGINT) AS df_{i}"
        for i in range(len(terms))
    )
    coal = ", ".join(
        f"coalesce(t.tf_{i}, 0) AS tf_{i}" for i in range(len(terms))
    )
    norm = f"{k1} * ((1.0 - {b}) + {b} * (CAST(dl AS DOUBLE) / avgdl))"
    parts = [
        f"(ln(1.0 + (CAST(n_docs - df_{i} AS DOUBLE) + 0.5) / (CAST(df_{i} AS DOUBLE) + 0.5))"
        f" * ((CAST(tf_{i} AS DOUBLE) * ({k1} + 1.0)) / (CAST(tf_{i} AS DOUBLE) + {norm})))"
        for i in range(len(terms))
    ]
    score = parts[0]
    for p in parts[1:]:
        score = f"({score} + {p})"
    matched = " + ".join(
        f"(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(terms))
    )
    any_tf = " + ".join(f"tf_{i}" for i in range(len(terms)))
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')), '{WORD_RE}')) AS w
        FROM documents
    ),
    dl AS (
        SELECT d.doc_id, CAST(count(t.w) AS BIGINT) AS dl
        FROM documents d LEFT JOIN tok t ON d.doc_id = t.doc_id
        GROUP BY d.doc_id
    ),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
        FROM dl
    ),
    tf AS (
        SELECT doc_id,
           {tf_cols}
        FROM tok GROUP BY doc_id
    ),
    df AS (SELECT {df_cols} FROM tf),
    scored AS (
        SELECT l.doc_id, l.dl, s.n_docs, f.*, {coal},
               CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE) AS avgdl
        FROM dl l LEFT JOIN tf t ON l.doc_id = t.doc_id
        CROSS JOIN stats s CROSS JOIN df f
    )
    SELECT doc_id, {score} AS score,
           CAST({matched} AS BIGINT) AS matched_terms
    FROM scored
    WHERE {any_tf} > 0
    ORDER BY score DESC, doc_id ASC
    LIMIT {top_k}
    """


# ---------------------------------------------------------------------------
# Bigram-LM document scoring: corpus-conditional log-probability per doc
# ---------------------------------------------------------------------------
QLOG_SCALE = 1000000.0  # micro-nats: integer-quantized so sums are
# order-independent (float addition is not associative; a distributed sum
# and DuckDB's aggregate order would otherwise drift)


def _doc_bigram_counts(t: pa.Table) -> pa.Table:
    """(doc_id, w1, w2, cnt) per document — fully combined in-batch (a
    document lives in one row, so its bigrams never split across
    batches).  All-C path: word_runs tokenizer, slice-shift adjacency,
    Arrow group_by."""
    import numpy as np
    import pyarrow.compute as pc

    from ifctordf_ray.functions.kernels import word_runs

    parents, flat = word_runs(t["text"])
    if len(flat) < 2:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    par = np.asarray(parents, dtype=np.int64)
    same = pa.array(par[:-1] == par[1:])
    n = len(flat)
    w1 = flat.slice(0, n - 1).filter(same)
    w2 = flat.slice(1, n - 1).filter(same)
    doc_pos = pa.array(par[:-1][np.asarray(same)], pa.int64())
    doc_id = pc.cast(t["doc_id"], pa.int64()).take(doc_pos)
    raw = pa.table({"doc_id": doc_id, "w1": w1, "w2": w2})
    g = raw.group_by(["doc_id", "w1", "w2"]).aggregate([([], "count_all")])
    return g.rename_columns(["doc_id", "w1", "w2", "cnt"]).set_column(
        3, "cnt", pc.cast(g.column(3), pa.int64())
    )


def lm_bigram_scores(sf_dir: str, num_partitions: int | None = None) -> ray.data.Dataset:
    """(doc_id, n_bigrams, sum_qlogp): each document scored under the
    corpus's own bigram language model — sum over the doc's bigram
    positions of ln P(w2|w1), quantized to integer micro-nats
    (P(w2|w1) = c(w1,w2) / sum_w c(w1,w)).  The per-token average
    (sum_qlogp / n_bigrams) is the fluency/quality signal a training
    pipeline thresholds on.

    Scale shape: the corpus bigram table is vocab²-bounded
    (sub-corpus-sized) and materialized because two consumers need it
    (the w1-marginal aggregate and the probability join); the per-doc
    bigram side is combined IN BATCH (no corpus-sized shuffle) and then
    hash-joined once on (w1, w2).  Documents with < 2 tokens have no
    bigram positions and are absent, matching the SQL inner join."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum as _Sum

    from ifctordf_ray.functions.kernels import join_ready
    from ifctordf_ray.tuning import join_kwargs

    jk = join_kwargs(num_partitions)
    big = bigram_counts(sf_dir).materialize()  # vocab²-sized, 2 consumers
    w1tot = join_ready(
        big.groupby("w1").aggregate(_Sum("n", alias_name="c1")),
        pa.schema([("w1", pa.string()), ("c1", pa.int64())]),
        sentinel_row={"w1": "\x00", "c1": 1},
    )
    big_j = join_ready(
        big,
        pa.schema([("w1", pa.string()), ("w2", pa.string()), ("n", pa.int64())]),
        sentinel_row={"w1": "\x00", "w2": "\x00", "n": 1},
    )
    bp = big_j.join(w1tot, join_type="inner", on=("w1",), **jk)

    def qlog(t: pa.Table) -> pa.Table:
        p = np.asarray(t["n"], dtype=np.float64) / np.asarray(
            t["c1"], dtype=np.float64
        )
        ql = np.floor(np.log(p) * QLOG_SCALE + 0.5).astype(np.int64)
        return pa.table(
            {"w1": t["w1"], "w2": t["w2"], "qlogp": pa.array(ql, pa.int64())}
        )

    # materialize: vocab²-bounded like `big` above, and it SPLITS the
    # plan — without it both chained joins' aggregator pools are live in
    # one execution and deadlock a small (4-CPU) session (the
    # pipelines/corpus.py mechanism)
    probs = bp.map_batches(qlog, batch_format="pyarrow").materialize()

    docs = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    docbig = docs.map_batches(_doc_bigram_counts, batch_format="pyarrow")
    # safe_join: docbig is ZERO blocks on an empty documents table
    from ifctordf_ray.functions.kernels import safe_join

    scored = safe_join(
        docbig,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("w1", pa.string()),
                ("w2", pa.string()),
                ("cnt", pa.int64()),
            ]
        ),
        probs,
        pa.schema(
            [("w1", pa.string()), ("w2", pa.string()), ("qlogp", pa.int64())]
        ),
        join_type="inner",
        on=("w1", "w2"),
        right_on=("w1", "w2"),
        num_partitions=num_partitions,
    )

    def weight(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "cnt": t["cnt"],
                "wq": pc.multiply(t["cnt"], t["qlogp"]),
            }
        )

    return (
        scored.map_batches(weight, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            _Sum("cnt", alias_name="n_bigrams"),
            _Sum("wq", alias_name="sum_qlogp"),
        )
    )


def lm_bigram_scores_sql() -> str:
    return f"""
    WITH tok AS (
        SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '{WORD_RE}') AS ws
        FROM documents
    ),
    db AS (
        SELECT doc_id,
               ws[CAST(t.i + 1 AS INTEGER)] AS w1,
               ws[CAST(t.i + 2 AS INTEGER)] AS w2
        FROM tok CROSS JOIN UNNEST(range(greatest(len(ws) - 1, 0))) AS t(i)
    ),
    bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM db GROUP BY w1, w2),
    w1t AS (SELECT w1, CAST(sum(n) AS BIGINT) AS c1 FROM bc GROUP BY w1),
    probs AS (
        SELECT b.w1, b.w2,
               CAST(floor(ln(CAST(b.n AS DOUBLE) / CAST(t.c1 AS DOUBLE)) * {QLOG_SCALE} + 0.5) AS BIGINT) AS qlogp
        FROM bc b JOIN w1t t ON b.w1 = t.w1
    ),
    dbc AS (
        SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS cnt
        FROM db GROUP BY doc_id, w1, w2
    )
    SELECT d.doc_id,
           CAST(sum(d.cnt) AS BIGINT) AS n_bigrams,
           CAST(sum(d.cnt * p.qlogp) AS BIGINT) AS sum_qlogp
    FROM dbc d JOIN probs p ON d.w1 = p.w1 AND d.w2 = p.w2
    GROUP BY d.doc_id
    """


# ---------------------------------------------------------------------------
# Fuzzy vocabulary linkage: edit-distance-1 word pairs via SymSpell
# deletion-key blocking (the record-linkage / blocking-join shape)
# ---------------------------------------------------------------------------
FUZZY_MIN_LEN = 3  # short words pair promiscuously; SymSpell floor
FUZZY_MAX_DIST = 2  # SymSpell guarantee: dist<=D pairs share a <=D-delete


def _deletion_keys(words: pa.Array, max_deletes: int = FUZZY_MAX_DIST) -> pa.Table:
    """(w, k) rows: each word keyed by itself and every distinct
    <=``max_deletes``-deletion variant.  Vocab-sized input, so the
    per-word Python expansion is off the corpus hot path by
    construction."""
    ws, ks = [], []
    for w in words.to_pylist():
        frontier = {w}
        keys = {w}
        for _ in range(max_deletes):
            frontier = {
                v[:i] + v[i + 1 :] for v in frontier for i in range(len(v))
            }
            keys |= frontier
        for k in sorted(keys):
            ws.append(w)
            ks.append(k)
    return pa.table(
        {"w": pa.array(ws, pa.string()), "k": pa.array(ks, pa.string())}
    )


def _levenshtein(a: str, b: str) -> int:
    """Standard Levenshtein DP (unit costs) — matches DuckDB's
    levenshtein().  Only ever called on the blocked candidate set."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != b[j - 1])
            )
        prev = cur
    return prev[lb]


def fuzzy_word_pairs(
    sf_dir: str,
    min_len: int = FUZZY_MIN_LEN,
    max_dist: int = FUZZY_MAX_DIST,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """(w_a, w_b, dist): all pairs of corpus vocabulary words (length
    >= ``min_len``) within edit distance ``max_dist`` — the
    blocking-join / record-linkage shape: candidate generation by
    SymSpell deletion keys (words within distance D always share a
    <=D-deletion variant), a distributed self-join on the key, then
    exact Levenshtein verification on the blocked candidates only.

    Scale shape: everything downstream of the first groupby is
    VOCAB-sized (sub-linear in corpus); the key table is vocab x
    O(len^D) rows; the self-join is one hash exchange on the deletion
    key whose fan-in is bounded by vocabulary, not corpus."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count as _Count

    from ifctordf_ray.functions.kernels import join_ready, word_runs
    from ifctordf_ray.tuning import join_kwargs

    jk = join_kwargs(num_partitions)
    docs = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def batch_words(t: pa.Table) -> pa.Table:
        _, flat = word_runs(t["text"])
        flat = flat.filter(
            pc.greater_equal(pc.utf8_length(flat), min_len)
        )
        return pa.table({"word": flat}).group_by(["word"]).aggregate([])

    vocab = (
        docs.map_batches(batch_words, batch_format="pyarrow")
        .groupby("word")
        .aggregate(_Count(alias_name="_n"))
    )
    keys = vocab.map_batches(
        lambda t: _deletion_keys(t["word"].combine_chunks(), max_dist),
        batch_format="pyarrow",
    )
    left = join_ready(
        keys.map_batches(
            lambda t: pa.table({"w_a": t["w"], "k": t["k"]}),
            batch_format="pyarrow",
        ),
        pa.schema([("w_a", pa.string()), ("k", pa.string())]),
        sentinel_row={"w_a": "\x00", "k": "\x00"},
    )
    right = join_ready(
        keys.map_batches(
            lambda t: pa.table({"w_b": t["w"], "kb": t["k"]}),
            batch_format="pyarrow",
        ),
        pa.schema([("w_b", pa.string()), ("kb", pa.string())]),
        sentinel_row={"w_b": "\x01", "kb": "\x01"},
    )
    cand = left.join(right, join_type="inner", on=("k",), right_on=("kb",), **jk)

    def orient(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["w_a"], t["w_b"]))
        return pa.table({"w_a": t["w_a"], "w_b": t["w_b"]})

    distinct_pairs = (
        cand.map_batches(orient, batch_format="pyarrow")
        .groupby(["w_a", "w_b"])
        .aggregate(_Count(alias_name="_c"))
    )

    def verify(t: pa.Table) -> pa.Table:
        a_list = t["w_a"].to_pylist()
        b_list = t["w_b"].to_pylist()
        dists = [_levenshtein(a, b) for a, b in zip(a_list, b_list)]
        keep = pa.array([1 <= d <= max_dist for d in dists])
        out = pa.table(
            {
                "w_a": t["w_a"],
                "w_b": t["w_b"],
                "dist": pa.array(dists, pa.int64()),
            }
        ).filter(keep)
        return out

    verified = distinct_pairs.map_batches(verify, batch_format="pyarrow")
    # schema anchor: a legitimately-empty result (no close pairs in the
    # vocabulary) must still present (w_a, w_b, dist) to consumers —
    # empty groupby partitions carry no schema (see kernels.join_ready)
    anchor = ray.data.from_arrow(
        pa.schema(
            [("w_a", pa.string()), ("w_b", pa.string()), ("dist", pa.int64())]
        ).empty_table()
    )
    return verified.union(anchor)


def fuzzy_word_pairs_sql(
    min_len: int = FUZZY_MIN_LEN, max_dist: int = FUZZY_MAX_DIST
) -> str:
    assert max_dist == 2  # the CTE chain below is the 2-delete expansion
    return f"""
    WITH words AS (
        SELECT DISTINCT
               unnest(regexp_extract_all(lower(coalesce(text, '')), '{WORD_RE}')) AS w
        FROM documents
    ),
    vocab AS (SELECT w FROM words WHERE length(w) >= {min_len}),
    d1 AS (
        SELECT w,
               substr(w, 1, CAST(t.i AS INTEGER)) || substr(w, CAST(t.i + 2 AS INTEGER)) AS k
        FROM vocab CROSS JOIN UNNEST(range(length(w))) AS t(i)
    ),
    d2 AS (
        SELECT w,
               substr(k, 1, CAST(t.i AS INTEGER)) || substr(k, CAST(t.i + 2 AS INTEGER)) AS k
        FROM d1 CROSS JOIN UNNEST(range(length(k))) AS t(i)
    ),
    keys AS (
        SELECT DISTINCT w, k FROM (
            SELECT w, w AS k FROM vocab
            UNION ALL SELECT w, k FROM d1
            UNION ALL SELECT w, k FROM d2
        )
    ),
    cand AS (
        SELECT DISTINCT a.w AS w_a, b.w AS w_b
        FROM keys a JOIN keys b ON a.k = b.k AND a.w < b.w
    )
    SELECT w_a, w_b, CAST(levenshtein(w_a, w_b) AS BIGINT) AS dist
    FROM cand
    WHERE levenshtein(w_a, w_b) BETWEEN 1 AND {max_dist}
    """


# ---------------------------------------------------------------------------
# Feature hashing (the "hashing trick" vectorizer): hashed bag-of-words
# ---------------------------------------------------------------------------
FEATHASH_DIM = 32


def feature_hashing(sf_dir: str, dim: int = FEATHASH_DIM) -> ray.data.Dataset:
    """(doc_id, bucket, n): fixed-``dim`` hashed bag-of-words — the
    vectorizer that needs NO vocabulary pass (bucket =
    stable_hash64(word) % dim), so it is one narrow map + one
    (doc, bucket)-keyed combine; the shuffle moves <= dim rows per doc
    however large the vocabulary.  The md5 hash spec keeps it exactly
    SQL-replicable (DuckDB md5_number_upper)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum as _Sum

    from ifctordf_ray.functions.kernels import stable_hash64, word_runs

    docs = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def hash_counts(t: pa.Table) -> pa.Table:
        parents, flat = word_runs(t["text"])
        # per-actor-process cache would need an actor; per-batch dict
        # over UNIQUE words keeps md5 calls at vocab-per-batch, not tokens
        uniq = pc.unique(flat)
        bmap = {w: stable_hash64(w) % dim for w in uniq.to_pylist()}
        buckets = pa.array(
            [bmap[w] for w in flat.to_pylist()], pa.int64()
        )
        doc_ids = pc.take(t["doc_id"], parents)
        # per-block pre-combine before the global groupby
        return (
            pa.table({"doc_id": doc_ids, "bucket": buckets})
            .group_by(["doc_id", "bucket"])
            .aggregate([([], "count_all")])
            .rename_columns(["doc_id", "bucket", "n"])
        )

    return (
        docs.map_batches(hash_counts, batch_format="pyarrow")
        .groupby(["doc_id", "bucket"])
        .aggregate(_Sum("n", alias_name="n"))
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"],
                    "bucket": t["bucket"],
                    "n": pc.cast(t["n"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def feature_hashing_sql(dim: int = FEATHASH_DIM) -> str:
    return f"""
    WITH w AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(coalesce(text, '')),
                                         '[a-z0-9]+')) AS word
        FROM documents
    )
    SELECT doc_id,
           CAST(md5_number_upper(word) % {dim} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM w GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# Per-source quota enforcement (the web-curation per-domain cap staple)
# ---------------------------------------------------------------------------
SOURCE_QUOTA = 10  # max docs kept per source


def source_quota_sample(sf_dir: str, quota: int = SOURCE_QUOTA) -> ray.data.Dataset:
    """(doc_id, source): the documents KEPT after capping every source at
    ``quota`` docs (first-N by doc_id — deterministic, so re-runs and
    retries keep the same set).  This is the per-domain/per-source quota
    a web corpus applies against over-represented hosts.  One hash
    exchange on source; each group processes only its own rows and emits
    at most ``quota``.  Skew note: a corpus-dominating source makes one
    big group — cap the group input with a per-block pre-truncation
    (each block keeps its ``quota`` smallest doc_ids per source, which
    is a superset of the global answer), so group fan-in is bounded by
    blocks x quota."""
    import pyarrow.compute as pc

    ds = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def pretrunc(t: pa.Table) -> pa.Table:
        t = t.sort_by([("source", "ascending"), ("doc_id", "ascending")])
        # keep each source's first `quota` rows within the block
        src = t["source"].to_numpy(zero_copy_only=False)
        import numpy as np

        new_grp = np.concatenate(([True], src[1:] != src[:-1]))
        grp_id = np.cumsum(new_grp) - 1
        starts = np.flatnonzero(new_grp)
        rank_in_grp = np.arange(len(src)) - starts[grp_id]
        return t.filter(pa.array(rank_in_grp < quota))

    def cap(g: pa.Table) -> pa.Table:
        g = g.sort_by([("doc_id", "ascending")])
        return g.slice(0, quota)

    return (
        ds.map_batches(pretrunc, batch_format="pyarrow")
        .groupby("source")
        .map_groups(cap, batch_format="pyarrow")
    )


def source_quota_sample_sql(quota: int = SOURCE_QUOTA) -> str:
    return f"""
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn <= {quota}
    """


# ---------------------------------------------------------------------------
# BPE tokenizer training: learn the first N merge rules from the corpus.
# The heavy stage is the distributed word-frequency scan (map-side
# combiner -> one groupby); the merge loop then iterates over the
# word-frequency TABLE (vocabulary-bounded, never corpus-bounded) with
# one tiny pair-count shuffle per merge, mirroring how production BPE
# trainers operate on the word-count dictionary rather than raw text.
#
# Cross-engine parity trick: a word's symbol sequence is encoded as a
# string with every symbol wrapped in double spaces ("  a  b  c  ").
# Applying merge (l, r) is then the literal replacement
# " l  r " -> " lr ": because matched text always ends one space BEFORE
# the next symbol's own leading space, left-to-right non-overlapping
# replacement — the shared semantics of Python str.replace, Arrow
# pc.replace_substring and DuckDB replace() — is exactly canonical
# greedy BPE pair merging, including on runs ("a a a a" -> "aa aa").
# Symbols are [a-z0-9]+ concatenations (WORD_RE), so they never collide
# with the space delimiters.
# ---------------------------------------------------------------------------
BPE_N_MERGES = 6


def _bpe_seq0(t: pa.Table) -> pa.Table:
    """word -> '  c1  c2  ...  ' initial character segmentation."""
    import pyarrow.compute as pc

    body = pc.replace_substring_regex(t["word"], pattern="(.)", replacement=r"  \1")
    seq = pc.binary_join_element_wise(body, "  ", "")
    return pa.table({"n": t["n"], "seq": seq})


def _bpe_pair_partials(t: pa.Table) -> pa.Table:
    """Per-block adjacent-pair counts weighted by word frequency.
    Python loop is fine here: the input is the vocabulary table (one row
    per DISTINCT word), not the corpus."""
    from collections import Counter

    cnt: Counter = Counter()
    for n, seq in zip(
        t["n"].to_pylist(), t["seq"].to_pylist()
    ):
        syms = seq.strip().split("  ")
        for a, b in zip(syms, syms[1:]):
            cnt[(a, b)] += n
    ls, rs, ns = [], [], []
    for (a, b), c in cnt.items():
        ls.append(a)
        rs.append(b)
        ns.append(c)
    return pa.table(
        {
            "lhs": pa.array(ls, pa.string()),
            "rhs": pa.array(rs, pa.string()),
            "pair_count": pa.array(ns, pa.int64()),
        }
    )


def bpe_merges(sf_dir: str, n_merges: int = BPE_N_MERGES) -> ray.data.Dataset:
    """(merge_rank, lhs, rhs, pair_count): the first ``n_merges`` BPE
    merge rules learned from the corpus, each with the (frequency-
    weighted, overlap-counted) adjacent-pair count that won it.  Ties
    break by (lhs ASC, rhs ASC).  Reference analog: the engine's other
    iterative trainer, kmeans_train (similarity.py) — per round one
    distributed pass + a driver-held O(1) update, nothing corpus-sized
    on the driver."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum as _Sum

    from ifctordf_ray.stages.textstats import WordPartialCounts

    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    words = (
        ds.map_batches(
            WordPartialCounts,
            batch_format="pyarrow",
            concurrency=(1, 4),
            max_restarts=0,  # stateless pool; silences ray#53727 warning
        )
        .groupby("word")
        .aggregate(_Sum("n", alias_name="n"))
    )
    # vocabulary-sized (distinct words), consumed once per merge round
    seqs = words.map_batches(_bpe_seq0, batch_format="pyarrow").materialize()

    out = {"merge_rank": [], "lhs": [], "rhs": [], "pair_count": []}
    for rank in range(1, n_merges + 1):
        best = (
            seqs.map_batches(_bpe_pair_partials, batch_format="pyarrow")
            .groupby(["lhs", "rhs"])
            .aggregate(_Sum("pair_count", alias_name="pair_count"))
            .sort(
                ["pair_count", "lhs", "rhs"], descending=[True, False, False]
            )
            .limit(1)
            .take_all()
        )  # exactly one row reaches the driver per round
        if not best:
            break
        b = best[0]
        out["merge_rank"].append(rank)
        out["lhs"].append(b["lhs"])
        out["rhs"].append(b["rhs"])
        out["pair_count"].append(int(b["pair_count"]))
        pat = f" {b['lhs']}  {b['rhs']} "
        rep = f" {b['lhs']}{b['rhs']} "

        def apply_merge(t: pa.Table, pat=pat, rep=rep) -> pa.Table:
            return pa.table(
                {
                    "n": t["n"],
                    "seq": pc.replace_substring(
                        t["seq"], pattern=pat, replacement=rep
                    ),
                }
            )

        seqs = seqs.map_batches(
            apply_merge, batch_format="pyarrow"
        ).materialize()

    return ray.data.from_arrow(
        pa.table(
            {
                "merge_rank": pa.array(out["merge_rank"], pa.int64()),
                "lhs": pa.array(out["lhs"], pa.string()),
                "rhs": pa.array(out["rhs"], pa.string()),
                "pair_count": pa.array(out["pair_count"], pa.int64()),
            }
        )
    )


def bpe_merges_sql(n_merges: int = BPE_N_MERGES) -> str:
    """Unrolled merge trajectory: seq_0 = per-character segmentation;
    per round t, p_t counts weighted adjacent pairs, b_t picks the
    winner, seq_t applies the literal ' l  r ' -> ' lr ' replacement
    (same left-to-right non-overlap semantics as the engine)."""
    parts = [
        f"""wc AS (
        SELECT word, CAST(count(*) AS BIGINT) AS n
        FROM (
            SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
                                             '{WORD_RE}')) AS word
            FROM documents
        )
        GROUP BY word
    )""",
        r"""seq_0 AS (
        SELECT n, regexp_replace(word, '(.)', '  \1', 'g') || '  ' AS seq
        FROM wc
    )""",
    ]
    for t in range(1, n_merges + 1):
        prev = f"seq_{t - 1}"
        parts.append(
            f"""p_{t} AS (
        SELECT ws[CAST(i + 1 AS INTEGER)] AS lhs,
               ws[CAST(i + 2 AS INTEGER)] AS rhs,
               CAST(sum(n) AS BIGINT) AS pair_count
        FROM (SELECT n, string_split(trim(seq), '  ') AS ws FROM {prev}) s,
             UNNEST(range(CAST(len(s.ws) AS BIGINT) - 1)) AS u(i)
        GROUP BY 1, 2
    )""")
        parts.append(
            f"""b_{t} AS (
        SELECT lhs, rhs, pair_count FROM p_{t}
        ORDER BY pair_count DESC, lhs, rhs LIMIT 1
    )""")
        parts.append(
            f"""seq_{t} AS (
        SELECT s.n,
               replace(s.seq, ' ' || b.lhs || '  ' || b.rhs || ' ',
                       ' ' || b.lhs || b.rhs || ' ') AS seq
        FROM {prev} s CROSS JOIN b_{t} b
    )""")
    unions = "\n        UNION ALL\n        ".join(
        f"SELECT CAST({t} AS BIGINT) AS merge_rank, lhs, rhs, pair_count"
        f" FROM b_{t}"
        for t in range(1, n_merges + 1)
    )
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT merge_rank, lhs, rhs, pair_count FROM (
        {unions}
    ) ORDER BY merge_rank
    """


def _bpe_doc_seq(t: pa.Table) -> pa.Table:
    """text -> the double-space symbol stream of the whole document:
    words are reduced to their [a-z0-9] character runs, non-word runs
    collapse to a single '|' separator symbol (never part of any learned
    merge, so merges cannot bridge word boundaries), and EVERY symbol is
    wrapped in double spaces — the same encoding invariant the trainer
    uses, so the same literal replacements apply."""
    import pyarrow.compute as pc

    lx = pc.utf8_lower(pc.fill_null(t["text"], ""))
    ws = pc.replace_substring_regex(lx, pattern="[^a-z0-9]+", replacement="|")
    ws = pc.utf8_trim(ws, characters="|")
    spread = pc.replace_substring_regex(ws, pattern="(.)", replacement=r"  \1")
    seq = pc.binary_join_element_wise(spread, "  ", "")
    return pa.table({"doc_id": t["doc_id"], "seq": seq})


def bpe_encode(
    sf_dir: str, n_merges: int = BPE_N_MERGES
) -> ray.data.Dataset:
    """(doc_id, n_bpe_tokens): each document's token count under the
    BPE merges learned from this corpus by ``bpe_merges`` — the trained
    tokenizer APPLIED, train->encode as one chained pipeline.  The
    merge table is O(n_merges) rows (driver-tiny, inlined into the map
    closure); encoding is n_merges vectorized Arrow literal replaces
    per batch, no per-row Python."""
    import pyarrow.compute as pc

    merges = bpe_merges(sf_dir, n_merges).take_all()  # n_merges rows
    merges.sort(key=lambda r: r["merge_rank"])
    rules = [(r["lhs"], r["rhs"]) for r in merges]

    ds = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def encode(t: pa.Table) -> pa.Table:
        t = _bpe_doc_seq(t)
        seq = t["seq"]
        for l, r in rules:
            seq = pc.replace_substring(
                seq, pattern=f" {l}  {r} ", replacement=f" {l}{r} "
            )
        trimmed = pc.utf8_trim_whitespace(seq)
        n_syms = pc.list_value_length(
            pc.split_pattern(trimmed, pattern="  ")
        ).cast(pa.int64())
        n_sep = pc.count_substring(trimmed, pattern="|").cast(pa.int64())
        n_tok = pc.if_else(
            pc.equal(trimmed, ""), pa.scalar(0, pa.int64()),
            pc.subtract(n_syms, n_sep),
        )
        return pa.table({"doc_id": t["doc_id"], "n_bpe_tokens": n_tok})

    return ds.map_batches(encode, batch_format="pyarrow")


def bpe_encode_sql(n_merges: int = BPE_N_MERGES) -> str:
    """Same b_t merge CTEs as ``bpe_merges_sql``, then the document
    stream is built with the identical encoding and the merges applied
    as nested literal replaces (scalar subqueries; COALESCE keeps a
    missing round — degenerate/empty corpus — a no-op via a chr(1)
    pattern that never occurs in the stream)."""
    train = bpe_merges_sql(n_merges)
    ctes = train.split("WITH ", 1)[1].rsplit("SELECT merge_rank", 1)[0]
    ctes = ctes.rstrip().rstrip(",")
    expr = "d.seq"
    for t in range(1, n_merges + 1):
        pat = (
            f"coalesce((SELECT ' ' || lhs || '  ' || rhs || ' ' FROM b_{t}),"
            f" chr(1))"
        )
        rep = f"coalesce((SELECT ' ' || lhs || rhs || ' ' FROM b_{t}), '')"
        expr = f"replace({expr}, {pat}, {rep})"
    return f"""
    WITH {ctes},
    doc_seq AS (
        SELECT doc_id,
               CASE WHEN ws = '' THEN ''
                    ELSE regexp_replace(ws, '(.)', '  \\1', 'g') || '  '
               END AS seq
        FROM (
            SELECT doc_id,
                   trim(regexp_replace(lower(coalesce(text, '')),
                                       '[^a-z0-9]+', '|', 'g'), '|') AS ws
            FROM documents
        )
    ),
    enc AS (SELECT doc_id, {expr} AS seq FROM doc_seq d)
    SELECT doc_id,
           CASE WHEN trim(seq) = '' THEN CAST(0 AS BIGINT)
                ELSE CAST(len(string_split(trim(seq), '  ')) AS BIGINT)
                     - CAST(len(seq) - len(replace(seq, '|', '')) AS BIGINT)
           END AS n_bpe_tokens
    FROM enc
    """


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023, "Data Selection for Language
# Models via Importance Resampling"): hashed-unigram bag features, a
# target-vs-raw bucket distribution pair, and a per-document log
# importance weight.  The curation staple for "select web data that
# looks like my target domain".  No reference analog (engine-addition
# family, like feature_hashing above, whose md5 bucket spec it reuses).
#
# Scale shape: pass 1 is a narrow map + a DIM-row groupby (the bucket
# table is fixed-size, never corpus-sized); the log-ratio table is
# broadcast via ray.put and pass 2 scores every document row-locally —
# no corpus-sized shuffle anywhere.  Log-ratios are quantized to integer
# micro-nats (QLOG_SCALE) so per-doc sums are order-independent and
# exactly SQL-replicable.
# ---------------------------------------------------------------------------
DSIR_DIM = 256  # hashed feature buckets
DSIR_TARGET_SOURCE = "src0"  # the "target domain" sample


class _DsirScorer:
    """Actor: holds the broadcast per-bucket quantized log-ratio table."""

    def __init__(self, qlam_ref, dim: int):
        import ray as _ray

        self.qlam = _ray.get(qlam_ref)  # np.int64[dim]
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        from ifctordf_ray.functions.kernels import stable_hash64, word_runs

        parents, flat = word_runs(batch["text"])
        uniq = pc.unique(flat)
        bmap = {w: stable_hash64(w) % self.dim for w in uniq.to_pylist()}
        buckets = np.fromiter(
            (bmap[w] for w in flat.to_pylist()), np.int64, count=len(flat)
        )
        par = parents.to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch.num_rows
        nw = np.bincount(par, minlength=n).astype(np.int64)
        logw = np.zeros(n, np.int64)
        np.add.at(logw, par, self.qlam[buckets])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(nw, pa.int64()),
                "logw_micro": pa.array(logw, pa.int64()),
            }
        )


def dsir_weights(
    sf_dir: str, dim: int = DSIR_DIM, target_source: str = DSIR_TARGET_SOURCE
) -> ray.data.Dataset:
    """(doc_id, n_words, logw_micro): per-document DSIR importance
    weight in integer micro-nats — sum over the doc's hashed-unigram
    occurrences of ln(p_target(bucket)/p_raw(bucket)), add-1 smoothed,
    each bucket's log-ratio quantized once (floor(x*1e6 + 0.5)).
    Wordless documents score (0, 0)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray as _ray
    from ray.data.aggregate import Sum as _Sum

    from ifctordf_ray.functions.kernels import stable_hash64, word_runs

    docs = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def bucket_partial(t: pa.Table) -> pa.Table:
        parents, flat = word_runs(t["text"])
        uniq = pc.unique(flat)
        bmap = {w: stable_hash64(w) % dim for w in uniq.to_pylist()}
        buckets = np.fromiter(
            (bmap[w] for w in flat.to_pylist()), np.int64, count=len(flat)
        )
        is_t = (
            pc.take(pc.equal(t["source"], target_source), parents)
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        nt = np.bincount(buckets[is_t], minlength=dim).astype(np.int64)
        nr = np.bincount(buckets[~is_t], minlength=dim).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(np.arange(dim, dtype=np.int64)),
                "nt": pa.array(nt),
                "nr": pa.array(nr),
            }
        )

    counts = (
        docs.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(_Sum("nt", alias_name="nt"), _Sum("nr", alias_name="nr"))
        .take_all()
    )  # <= dim rows: fixed-size, driver-safe
    nt = np.zeros(dim, np.float64)
    nr = np.zeros(dim, np.float64)
    for r in counts:
        nt[r["bucket"]] = float(r["nt"])
        nr[r["bucket"]] = float(r["nr"])
    ntot, nrot = nt.sum(), nr.sum()
    # expression tree mirrored VERBATIM in the SQL oracle (ln of one
    # double division per side) so libm results agree bit-for-bit
    qlam = np.floor(
        (np.log((nt + 1.0) / (ntot + dim)) - np.log((nr + 1.0) / (nrot + dim)))
        * QLOG_SCALE
        + 0.5
    ).astype(np.int64)
    qlam_ref = _ray.put(qlam)  # dim-sized broadcast, shipped once per actor
    return docs.drop_columns(["source"]).map_batches(
        _DsirScorer,
        batch_format="pyarrow",
        concurrency=(1, 4),
        fn_constructor_args=(qlam_ref, dim),
        max_restarts=0,
    )


def dsir_weights_sql(
    dim: int = DSIR_DIM, target_source: str = DSIR_TARGET_SOURCE
) -> str:
    return f"""
    WITH b AS (
        SELECT doc_id, source,
               CAST(md5_number_upper(word) % {dim} AS BIGINT) AS bucket
        FROM (
            SELECT doc_id, source,
                   unnest(regexp_extract_all(lower(coalesce(text, '')),
                                             '{WORD_RE}')) AS word
            FROM documents
        )
    ),
    counts AS (
        SELECT bucket,
               CAST(sum(CASE WHEN source = '{target_source}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS nt,
               CAST(sum(CASE WHEN source <> '{target_source}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS nr
        FROM b GROUP BY bucket
    ),
    tot AS (
        SELECT CAST(sum(nt) AS DOUBLE) AS ntot, CAST(sum(nr) AS DOUBLE) AS nrot
        FROM counts
    ),
    lam AS (
        SELECT bucket,
               CAST(floor((ln((CAST(nt AS DOUBLE) + 1.0) / (t.ntot + {dim}))
                           - ln((CAST(nr AS DOUBLE) + 1.0) / (t.nrot + {dim})))
                          * {QLOG_SCALE} + 0.5) AS BIGINT) AS qlam
        FROM counts, tot t
    ),
    db AS (
        SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS n
        FROM b GROUP BY 1, 2
    ),
    scored AS (
        SELECT d.doc_id,
               CAST(sum(d.n) AS BIGINT) AS n_words,
               CAST(sum(d.n * l.qlam) AS BIGINT) AS logw_micro
        FROM db d JOIN lam l USING (bucket) GROUP BY 1
    )
    SELECT doc.doc_id,
           coalesce(s.n_words, 0) AS n_words,
           coalesce(s.logw_micro, 0) AS logw_micro
    FROM documents doc LEFT JOIN scored s USING (doc_id)
    """


# ---------------------------------------------------------------------------
# CCNet-style perplexity buckets (Wenzek et al. 2020): rank every scored
# document by its per-token LM log-prob (the bigram model above) and
# split the corpus into head / middle / tail terciles — the quality
# stratification CCNet applies before choosing which slice to train on.
#
# Scale shape: the global tercile is the NTILE family, done with the
# same two-phase VALUE-RANGE scan as relational.order_ntile (bucket =
# range of the avg score, so inter-bucket order is total): one narrow
# map, one #buckets-row count table on the driver, one
# groupby(bucket).map_groups — never a global sort barrier.
# ---------------------------------------------------------------------------
PPL_NTILE = 3
PPL_BUCKET_W = 10_000.0  # micro-nats of avg log-prob per range bucket
PPL_LABELS = ("head", "middle", "tail")


def ppl_buckets(sf_dir: str, num_partitions: int | None = None) -> ray.data.Dataset:
    """(doc_id, avg_qlogp, tile, bucket_label): tercile of the per-token
    bigram log-prob, head = most fluent (highest avg log-prob, i.e.
    lowest perplexity).  Only documents with >= 1 bigram position are
    scored (matching lm_bigram_scores).  avg_qlogp is ONE exact IEEE
    division of int64 operands — bit-identical in numpy and DuckDB."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Count as _Count

    scores = lm_bigram_scores(sf_dir, num_partitions)

    def prep(t: pa.Table) -> pa.Table:
        avg = pc.divide(
            pc.cast(t["sum_qlogp"], pa.float64()),
            pc.cast(t["n_bigrams"], pa.float64()),
        )
        neg = pc.negate(avg)  # ascending neg == avg DESC (head first)
        bucket = pc.cast(
            pc.floor(pc.divide(neg, PPL_BUCKET_W)), pa.int64()
        )
        return pa.table(
            {"doc_id": t["doc_id"], "avg_qlogp": avg, "neg": neg, "bucket": bucket}
        )

    narrow = scores.map_batches(prep, batch_format="pyarrow")
    counts = narrow.groupby("bucket").aggregate(_Count(alias_name="n")).take_all()
    offsets: dict[int, int] = {}
    total = 0
    for row in sorted(counts, key=lambda r: r["bucket"]):
        offsets[row["bucket"]] = total
        total += row["n"]
    size, rem = divmod(total, PPL_NTILE)
    labels = pa.array(PPL_LABELS, pa.string())

    def assign(group: pa.Table) -> pa.Table:
        group = group.sort_by(
            [("neg", "ascending"), ("doc_id", "ascending")]
        )
        idx = offsets[group["bucket"][0].as_py()] + np.arange(group.num_rows)
        big_span = rem * (size + 1)
        tile = np.where(
            idx < big_span,
            idx // (size + 1) + 1,
            rem + (np.maximum(idx - big_span, 0) // max(size, 1)) + 1,
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": group["doc_id"],
                "avg_qlogp": group["avg_qlogp"],
                "tile": pa.array(tile, pa.int64()),
                "bucket_label": pc.take(labels, pa.array(tile - 1)),
            }
        )

    return narrow.groupby("bucket").map_groups(assign, batch_format="pyarrow")


def ppl_buckets_sql() -> str:
    return f"""
    WITH s AS ({lm_bigram_scores_sql()}),
    t AS (
        SELECT doc_id,
               CAST(sum_qlogp AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS avg_qlogp,
               CAST(NTILE({PPL_NTILE}) OVER (
                   ORDER BY CAST(sum_qlogp AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
                            DESC, doc_id) AS BIGINT) AS tile
        FROM s
    )
    SELECT doc_id, avg_qlogp, tile,
           CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket_label
    FROM t
    """


# ---------------------------------------------------------------------------
# Split-drift monitor: Jensen-Shannon divergence between the hashed
# unigram distributions of a deterministic train/validation split — the
# distribution-shift check a pipeline runs before trusting a held-out
# set (a high-JS bucket means the split leaked a topic/source).  Split =
# md5(doc_id) parity (the sample_docs hash contract); features = the
# DSIR hashed-unigram buckets; the divergence is computed per bucket
# with add-1 smoothing and quantized to integer nano-nats with an
# expression tree shared verbatim with the SQL oracle.
#
# Scale shape: one narrow map + one DRIFT_DIM-row groupby; the finish
# step runs on the fixed-size bucket table (driver-safe), so the corpus
# is scanned exactly once whatever its size.
# ---------------------------------------------------------------------------
DRIFT_DIM = 64
JS_SCALE = 1_000_000_000.0  # nano-nats: per-bucket contributions are tiny


def split_drift(sf_dir: str, dim: int = DRIFT_DIM) -> ray.data.Dataset:
    """(bucket, n_train, n_valid, js_nano): per-bucket JS-divergence
    contribution between the two split halves' unigram distributions
    (all `dim` buckets emitted; smoothing gives empty buckets a defined
    contribution too)."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum as _Sum

    from ifctordf_ray.functions.kernels import stable_hash64, word_runs

    docs = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def bucket_partial(t: pa.Table) -> pa.Table:
        parents, flat = word_runs(t["text"])
        uniq = pc.unique(flat)
        bmap = {w: stable_hash64(w) % dim for w in uniq.to_pylist()}
        buckets = np.fromiter(
            (bmap[w] for w in flat.to_pylist()), np.int64, count=len(flat)
        )
        side_doc = np.fromiter(
            (stable_hash64(str(d)) % 2 for d in t["doc_id"].to_pylist()),
            np.int64,
            count=t.num_rows,
        )
        par = parents.to_numpy(zero_copy_only=False).astype(np.int64)
        is_v = side_doc[par] == 1
        n0 = np.bincount(buckets[~is_v], minlength=dim).astype(np.int64)
        n1 = np.bincount(buckets[is_v], minlength=dim).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(np.arange(dim, dtype=np.int64)),
                "n_train": pa.array(n0),
                "n_valid": pa.array(n1),
            }
        )

    counts = (
        docs.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            _Sum("n_train", alias_name="n_train"),
            _Sum("n_valid", alias_name="n_valid"),
        )
        .take_all()
    )  # <= dim rows: fixed-size, driver-safe
    n0 = np.zeros(dim, np.int64)
    n1 = np.zeros(dim, np.int64)
    for r in counts:
        n0[r["bucket"]] = r["n_train"]
        n1[r["bucket"]] = r["n_valid"]
    t0, t1 = float(n0.sum()), float(n1.sum())
    # expression tree mirrored VERBATIM in SQL (same +1.0 smoothing, same
    # division/ln/multiply order)
    p = (n0 + 1.0) / (t0 + dim)
    q = (n1 + 1.0) / (t1 + dim)
    m = (p + q) / 2.0
    js = 0.5 * p * np.log(p / m) + 0.5 * q * np.log(q / m)
    js_nano = np.floor(js * JS_SCALE + 0.5).astype(np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "bucket": pa.array(np.arange(dim, dtype=np.int64)),
                "n_train": pa.array(n0),
                "n_valid": pa.array(n1),
                "js_nano": pa.array(js_nano),
            }
        )
    )


def split_drift_sql(dim: int = DRIFT_DIM) -> str:
    return f"""
    WITH w AS (
        SELECT CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) % 2 AS BIGINT)
                   AS side,
               CAST(md5_number_upper(word) % {dim} AS BIGINT) AS bucket
        FROM (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(coalesce(text, '')),
                                             '{WORD_RE}')) AS word
            FROM documents
        )
    ),
    c AS (
        SELECT bucket,
               CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        FROM w GROUP BY bucket
    ),
    allb AS (
        SELECT CAST(t.b AS BIGINT) AS bucket,
               coalesce(c.n0, 0) AS n0, coalesce(c.n1, 0) AS n1
        FROM (SELECT unnest(range({dim})) AS b) t
        LEFT JOIN c ON c.bucket = t.b
    ),
    tot AS (
        SELECT CAST(sum(n0) AS DOUBLE) AS t0, CAST(sum(n1) AS DOUBLE) AS t1
        FROM allb
    ),
    jsd AS (
        SELECT bucket, n0, n1,
               (CAST(n0 AS DOUBLE) + 1.0) / (t.t0 + {dim}) AS p,
               (CAST(n1 AS DOUBLE) + 1.0) / (t.t1 + {dim}) AS q
        FROM allb, tot t
    )
    SELECT bucket, n0 AS n_train, n1 AS n_valid,
           CAST(floor((0.5 * p * ln(p / ((p + q) / 2.0))
                       + 0.5 * q * ln(q / ((p + q) / 2.0)))
                      * {JS_SCALE} + 0.5) AS BIGINT) AS js_nano
    FROM jsd
    """
