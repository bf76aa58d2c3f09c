r"""Text analysis over the documents table: token counting, quality
scoring, language ID, document fingerprinting.

All metrics are defined with exact DuckDB-parity semantics (RE2-safe
regexes, integer counts, md5 fingerprints) so each operator has a SQL
oracle.  Stages are actor pools: regexes compile once per actor
(__init__), batches are processed vectorized-per-batch with compiled
patterns (the stateful-stage pattern, SURVEY.md §2.3).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray.data
from ifctordf_ray.sources.transcripts import clean_read_parquet as _clean_read_parquet

# token = maximal run of non-whitespace
TOKEN_RE = r"\S+"
# word = maximal run of ascii alnum, lowercased text
WORD_RE = r"[a-z0-9]+"
DIGIT_RE = r"[0-9]"
PUNCT_RE = r"[.,;:!?]"
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")
STOP_RE = r"\b(?:" + "|".join(STOPWORDS) + r")\b"

# language markers: per-language word sets; lang = first language (in
# LANGS order) whose marker-hit count is maximal (deterministic tie-break).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "en": ("the", "and", "is", "of", "to", "in"),
    "es": ("el", "la", "los", "y", "es", "de"),
    "fr": ("le", "la", "les", "et", "est", "de"),
}
LANGS = tuple(sorted(LANG_MARKERS))
FALLBACK_LANG = "und"  # no marker hit at all


class TokenCounter:
    def __init__(self, keep_text: bool = False):
        self.keep_text = keep_text
        self.token_re = re.compile(TOKEN_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(
                    [len(self.token_re.findall(t or "")) for t in texts], pa.int64()
                ),
                "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
            }
        )


def token_counts(sf_dir: str) -> ray.data.Dataset:
    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(TokenCounter, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0)


def token_counts_sql() -> str:
    return rf"""
    SELECT doc_id,
           len(regexp_extract_all(coalesce(text, ''), '{TOKEN_RE}')) AS n_tokens,
           length(coalesce(text, '')) AS n_chars
    FROM documents
    """


class QualityScorer:
    """Quality heuristics: token/digit/punct/stopword counts + ratios.
    Ratios are quotients of identical integers on both sides -> exact
    float parity."""

    def __init__(self, keep_text: bool = False):
        self.keep_text = keep_text
        self.token_re = re.compile(TOKEN_RE)
        self.digit_re = re.compile(DIGIT_RE)
        self.punct_re = re.compile(PUNCT_RE)
        self.stop_re = re.compile(STOP_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch["text"].to_pylist()]
        n_tok = [len(self.token_re.findall(t)) for t in texts]
        n_stop = [len(self.stop_re.findall(t.lower())) for t in texts]
        n_digit = [len(self.digit_re.findall(t)) for t in texts]
        n_punct = [len(self.punct_re.findall(t)) for t in texts]
        stop_ratio = [s / t if t else 0.0 for s, t in zip(n_stop, n_tok)]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_stopwords": pa.array(n_stop, pa.int64()),
                "n_digits": pa.array(n_digit, pa.int64()),
                "n_punct": pa.array(n_punct, pa.int64()),
                "stop_ratio": pa.array(stop_ratio, pa.float64()),
            }
        )


def quality_scores(sf_dir: str) -> ray.data.Dataset:
    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(QualityScorer, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0)


def quality_scores_sql() -> str:
    return rf"""
    SELECT doc_id,
           len(regexp_extract_all(coalesce(text, ''), '{TOKEN_RE}')) AS n_tokens,
           len(regexp_extract_all(lower(coalesce(text, '')), '{STOP_RE}')) AS n_stopwords,
           len(regexp_extract_all(coalesce(text, ''), '{DIGIT_RE}')) AS n_digits,
           len(regexp_extract_all(coalesce(text, ''), '{PUNCT_RE}')) AS n_punct,
           CASE WHEN len(regexp_extract_all(coalesce(text, ''), '{TOKEN_RE}')) = 0
                THEN 0.0
                ELSE CAST(len(regexp_extract_all(lower(coalesce(text, '')), '{STOP_RE}')) AS DOUBLE)
                     / len(regexp_extract_all(coalesce(text, ''), '{TOKEN_RE}'))
           END AS stop_ratio
    FROM documents
    """


class LangId:
    """n-gram-free marker-word language ID (deterministic, closed-form;
    a real model would be an actor-pool stage with the model loaded in
    __init__ — same plumbing)."""

    def __init__(self):
        self.markers = {
            lang: re.compile(r"\b(?:" + "|".join(ws) + r")\b")
            for lang, ws in LANG_MARKERS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch["text"].to_pylist()]
        out = []
        for t in texts:
            low = t.lower()
            scores = {lang: len(rx.findall(low)) for lang, rx in self.markers.items()}
            best = max(scores.values())
            out.append(
                FALLBACK_LANG
                if best == 0
                else next(l for l in LANGS if scores[l] == best)
            )
        return pa.table(
            {"doc_id": batch["doc_id"], "pred_lang": pa.array(out, pa.string())}
        )


def lang_id(sf_dir: str) -> ray.data.Dataset:
    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0)


def lang_id_sql() -> str:
    score = {
        lang: rf"len(regexp_extract_all(lower(coalesce(text, '')), '\b(?:{'|'.join(ws)})\b'))"
        for lang, ws in LANG_MARKERS.items()
    }
    # first lang (alphabetical) whose score >= all others; 'und' if all 0
    cases = []
    for lang in LANGS:
        conds = [f"s_{lang} >= s_{other}" for other in LANGS if other != lang]
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case_sql = " ".join(cases)
    scores_sql = ", ".join(f"{expr} AS s_{lang}" for lang, expr in score.items())
    return f"""
    SELECT doc_id,
           CASE WHEN {' + '.join('s_' + l for l in LANGS)} = 0 THEN '{FALLBACK_LANG}'
                {case_sql}
                ELSE '{FALLBACK_LANG}' END AS pred_lang
    FROM (SELECT doc_id, {scores_sql} FROM documents)
    """


class Fingerprinter:
    """Document fingerprint: md5 of lowercased, whitespace-collapsed text
    (canonical-form dedup key; the D1 fullLineAfterNum analog,
    IfcSpfParser.java:62)."""

    def __init__(self):
        self.ws_re = re.compile(r"\s+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch["text"].to_pylist()]
        fps = [
            hashlib.md5(self.ws_re.sub(" ", t.lower()).encode("utf-8")).hexdigest()
            for t in texts
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "fingerprint": pa.array(fps, pa.string())}
        )


def fingerprints(sf_dir: str) -> ray.data.Dataset:
    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(Fingerprinter, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0)


def fingerprints_sql() -> str:
    return r"""
    SELECT doc_id,
           md5(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')) AS fingerprint
    FROM documents
    """


SAMPLE_PCT = 10  # deterministic 10% sample


def sample_docs(sf_dir: str, pct: int = SAMPLE_PCT) -> ray.data.Dataset:
    """Deterministic hash-based sampling: keep doc_id iff
    stable_hash64(str(doc_id)) % 100 < pct.  Unlike Dataset.random_sample
    this is reproducible across runs/cluster sizes and exactly
    SQL-replicable (md5_number_upper) — the sampling contract a
    training-data pipeline needs for auditable subsets.  Pure narrow map:
    no shuffle, scales with the read."""
    from ifctordf_ray.functions.kernels import stable_hash64

    ds = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def pick(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pa.array(
            [stable_hash64(str(d)) % 100 < pct for d in t["doc_id"].to_pylist()]
        )
        return t.filter(keep)

    return ds.map_batches(pick, batch_format="pyarrow")


def sample_docs_sql(pct: int = SAMPLE_PCT) -> str:
    return f"""
    SELECT doc_id, n_chars FROM documents
    WHERE md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 < {pct}
    """


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer et al. rolling-hash document
# fingerprinting): word k-gram hashes -> sliding-window minima set.
# Local-document computation (narrow map, no shuffle); the md5 hash spec
# makes it exactly SQL-replicable like the minhash family.
# ---------------------------------------------------------------------------
WINNOW_K = 3   # word k-grams
WINNOW_W = 4   # window width (guarantee: any match >= K+W-1 words shares a fp)
_WINNOW_WORD_RE = r"[a-z0-9]+"


class WinnowFingerprinter:
    """map_batches stage: one (doc_id, fp) row per selected window-min
    k-gram hash.  Spec shared with the SQL oracle: grams are word
    K-grams (a single whole-text gram for docs shorter than K words),
    fp set = distinct minima of all width-W windows (full windows only;
    one whole-list window when fewer than W grams)."""

    def __init__(self):
        self.word_re = re.compile(_WINNOW_WORD_RE)

    def fingerprints(self, text: str) -> list[int]:
        from ifctordf_ray.functions.kernels import stable_hash64

        words = self.word_re.findall((text or "").lower())
        if not words:
            return []
        if len(words) < WINNOW_K:
            grams = [" ".join(words)]
        else:
            grams = [
                " ".join(words[i : i + WINNOW_K])
                for i in range(len(words) - WINNOW_K + 1)
            ]
        h = np.array([stable_hash64(g) for g in grams], dtype=np.uint64)
        if len(h) <= WINNOW_W:
            sel = {int(h.min())}
        else:
            win = np.lib.stride_tricks.sliding_window_view(h, WINNOW_W)
            sel = set(int(x) for x in win.min(axis=1))
        return sorted(sel)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, fps = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for fp in self.fingerprints(t):
                doc_ids.append(d)
                fps.append(fp)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "fp": pa.array(fps, pa.uint64()),
            }
        )


def winnow_fingerprints(sf_dir: str) -> ray.data.Dataset:
    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        WinnowFingerprinter, batch_format="pyarrow", concurrency=(1, 4)
    )


def winnow_fingerprints_sql() -> str:
    k, w = WINNOW_K, WINNOW_W
    return f"""
WITH wl AS (
    SELECT doc_id,
           regexp_extract_all(lower(coalesce(text, '')), '{_WINNOW_WORD_RE}') AS ws
    FROM documents
),
g AS (
    SELECT doc_id, CAST(t.i AS BIGINT) AS i,
           md5_number_upper(array_to_string(ws[t.i + 1 : t.i + {k}], ' ')) AS h
    FROM wl CROSS JOIN UNNEST(range(greatest(len(ws) - {k - 1}, 1))) AS t(i)
    WHERE len(ws) > 0
),
win AS (
    SELECT doc_id, i,
           min(h) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS m,
           count(*) OVER (PARTITION BY doc_id) AS n
    FROM g
)
SELECT DISTINCT doc_id, m AS fp
FROM win WHERE i <= greatest(n - {w}, 0)
"""


# ---------------------------------------------------------------------------
# Training-data funnel: the composed pipeline a pretraining corpus build
# actually runs — quality filter -> language filter -> exact dedup of
# the survivors — fused into ONE text pass + one keeper groupby/join.
# ---------------------------------------------------------------------------
FUNNEL_MIN_TOKENS = 20
FUNNEL_MIN_STOP_RATIO = 0.02
FUNNEL_LANG = "en"


class FunnelScorer:
    """One fused pass over text: token count, stopword ratio, language
    id and the canonical fingerprint — four operators' worth of state
    compiled once per worker, one traversal per batch."""

    def __init__(self, keep_text: bool = False):
        self.keep_text = keep_text
        self.token_re = re.compile(TOKEN_RE)
        self.stop_re = re.compile(STOP_RE)
        self.ws_re = re.compile(r"\s+")
        self.lang_res = {
            lang: re.compile(r"\b(?:" + "|".join(ws) + r")\b")
            for lang, ws in LANG_MARKERS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch["text"].to_pylist()]
        n_tok, ratios, langs, fps = [], [], [], []
        for t in texts:
            low = t.lower()
            nt = len(self.token_re.findall(t))
            ns = len(self.stop_re.findall(low))
            n_tok.append(nt)
            ratios.append(ns / nt if nt else 0.0)
            scores = {l: len(r.findall(low)) for l, r in self.lang_res.items()}
            best = max(scores.values())
            langs.append(
                FALLBACK_LANG if best == 0
                else min(l for l, s in scores.items() if s == best)
            )
            fps.append(
                hashlib.md5(self.ws_re.sub(" ", low).encode("utf-8")).hexdigest()
            )
        cols = {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "stop_ratio": pa.array(ratios, pa.float64()),
            "pred_lang": pa.array(langs, pa.string()),
            "fingerprint": pa.array(fps, pa.string()),
        }
        if self.keep_text:
            cols["text"] = batch["text"]
        return pa.table(cols)


def training_funnel(
    sf_dir: str,
    min_tokens: int = FUNNEL_MIN_TOKENS,
    min_stop_ratio: float = FUNNEL_MIN_STOP_RATIO,
    lang: str = FUNNEL_LANG,
    num_partitions: int | None = None,
    with_text: bool = False,
) -> ray.data.Dataset:
    """(doc_id, n_tokens[, text]) of the docs that survive the funnel: quality
    (token count + stopword ratio) AND language AND exact dedup among
    the filtered survivors (keeper = min doc_id per fingerprint —
    dedup runs AFTER filtering, as a real corpus build orders it).
    Physical shape: fused scoring map -> filter -> keeper groupby ->
    join back (join_ready-armored; the groupby side can emit
    empty-schema partitions).

    ``with_text=True`` threads the document TEXT through the ONE
    existing join instead of letting callers add a second text
    join-back: two chained joins' aggregator pools plus this stage's
    autoscaling actor pool pin every CPU of a small session and
    deadlock it (observed at num_cpus=4 in the corpus build) — and at
    any scale one exchange of the text is strictly cheaper than two.
    The keeper groupby always runs on a text-FREE projection."""
    from ray.data.aggregate import Min as _Min

    ds = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    scored = ds.map_batches(
        FunnelScorer,
        fn_constructor_kwargs={"keep_text": with_text},
        batch_format="pyarrow",
        concurrency=(1, 4),
        max_restarts=0,
    )

    def flt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(
            pc.and_(
                pc.greater_equal(t["n_tokens"], min_tokens),
                pc.greater_equal(t["stop_ratio"], min_stop_ratio),
            ),
            pc.equal(t["pred_lang"], lang),
        )
        cols = ["doc_id", "n_tokens", "fingerprint"]
        if with_text:
            cols.append("text")
        return t.filter(keep).select(cols)

    survivors = scored.map_batches(flt, batch_format="pyarrow")
    # keeper groupby over a text-free projection (never shuffle text here)
    keeper_in = survivors.map_batches(
        lambda t: t.select(["doc_id", "fingerprint"]), batch_format="pyarrow"
    )
    keepers = keeper_in.groupby("fingerprint").aggregate(
        _Min("doc_id", alias_name="keep_doc_id")
    ).map_batches(
        lambda t: pa.table(
            {"fp": t["fingerprint"], "keep_doc_id": t["keep_doc_id"]}
        ),
        batch_format="pyarrow",
    )
    # safe_join: survivors can be ZERO blocks (everything filtered out /
    # empty input); keepers' groupby emits zero-column empty partitions
    from ifctordf_ray.functions.kernels import safe_join

    surv_fields = [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("fingerprint", pa.string()),
    ]
    if with_text:
        surv_fields.append(("text", pa.string()))
    joined = safe_join(
        survivors,
        pa.schema(surv_fields),
        keepers,
        pa.schema([("fp", pa.string()), ("keep_doc_id", pa.int64())]),
        join_type="inner",
        on=("fingerprint",),
        right_on=("fp",),
        num_partitions=num_partitions,
    )

    def keep_first(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = ["doc_id", "n_tokens"]
        if with_text:
            cols.append("text")
        return t.filter(pc.equal(t["doc_id"], t["keep_doc_id"])).select(cols)

    return joined.map_batches(keep_first, batch_format="pyarrow")


def training_funnel_sql(
    min_tokens: int = FUNNEL_MIN_TOKENS,
    min_stop_ratio: float = FUNNEL_MIN_STOP_RATIO,
    lang: str = FUNNEL_LANG,
) -> str:
    return rf"""
    WITH q AS ({quality_scores_sql()}),
    l AS ({lang_id_sql()}),
    f AS (
        SELECT doc_id,
               md5(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')) AS fingerprint
        FROM documents
    ),
    surv AS (
        SELECT q.doc_id, q.n_tokens, f.fingerprint
        FROM q JOIN l USING (doc_id) JOIN f USING (doc_id)
        WHERE q.n_tokens >= {min_tokens}
          AND q.stop_ratio >= {min_stop_ratio}
          AND l.pred_lang = '{lang}'
    )
    SELECT doc_id, n_tokens FROM (
        SELECT doc_id, n_tokens,
               min(doc_id) OVER (PARTITION BY fingerprint) AS keep
        FROM surv
    ) WHERE doc_id = keep
    """


# ---------------------------------------------------------------------------
# BPE-ish token counting: a GPT-2-style pre-tokenizer regex (ASCII
# variant — contractions, letter runs, digit runs, punctuation runs),
# RE2-compatible so Python re and DuckDB produce identical splits.
# ---------------------------------------------------------------------------
BPE_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"


class BpeTokenCounter:
    """map_batches stage: whitespace tokens AND BPE-ish pre-tokens per
    doc (the two token-count flavors a data pipeline budgets with)."""

    def __init__(self):
        self.ws_re = re.compile(TOKEN_RE)
        self.bpe_re = re.compile(BPE_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_ws_tokens": pa.array(
                    [len(self.ws_re.findall(t)) for t in texts], pa.int64()
                ),
                "n_bpe_tokens": pa.array(
                    [len(self.bpe_re.findall(t)) for t in texts], pa.int64()
                ),
            }
        )


def bpe_token_counts(sf_dir: str) -> ray.data.Dataset:
    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(BpeTokenCounter, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0)


def bpe_token_counts_sql() -> str:
    bpe = BPE_RE.replace("'", "''")
    return rf"""
    SELECT doc_id,
           len(regexp_extract_all(coalesce(text, ''), '{TOKEN_RE}')) AS n_ws_tokens,
           len(regexp_extract_all(coalesce(text, ''), '{bpe}')) AS n_bpe_tokens
    FROM documents
    """


# ---------------------------------------------------------------------------
# Vocabulary building: global word counts -> top-K.  The canonical
# pre-aggregate pattern: each batch emits one (word, partial count) row
# per DISTINCT word in the batch, so the wide groupby moves combiner
# output, never one row per token occurrence.
# ---------------------------------------------------------------------------
VOCAB_TOP_K = 100


class WordPartialCounts:
    """map_batches combiner: batch text -> (word, n) partials."""

    def __init__(self):
        self.word_re = re.compile(WORD_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            c.update(self.word_re.findall((t or "").lower()))
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )


def vocabulary(sf_dir: str, top_k: int = VOCAB_TOP_K) -> ray.data.Dataset:
    """Top-K corpus vocabulary by total count (count DESC, word ASC
    deterministic tie-break).  Shuffle volume = distinct words per
    batch, not token occurrences (the combiner runs inside the map)."""
    from ray.data.aggregate import Sum as _Sum

    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    totals = (
        ds.map_batches(WordPartialCounts, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0)
        .groupby("word")
        .aggregate(_Sum("n", alias_name="n"))
    )
    # top-K: global sort + limit over the (already small) distinct-word table
    return totals.sort(["n", "word"], descending=[True, False]).limit(top_k)


def vocabulary_sql(top_k: int = VOCAB_TOP_K) -> str:
    return f"""
    SELECT word, CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '{WORD_RE}')) AS word
        FROM documents
    )
    GROUP BY word
    ORDER BY n DESC, word ASC
    LIMIT {top_k}
    """


# ---------------------------------------------------------------------------
# Stratified sampling: a deterministic per-language quota (the auditable
# per-group subset a corpus build needs; the group key shuffles once).
# ---------------------------------------------------------------------------
STRATA_K = 25


def stratified_sample(sf_dir: str, per_group: int = STRATA_K) -> ray.data.Dataset:
    """Per detected language, the `per_group` docs with the smallest
    md5-rank (deterministic, reproducible across runs and cluster
    sizes; rank key = md5 of the doc id, tie-broken by doc_id)."""
    from ifctordf_ray.functions.kernels import stable_hash64

    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    langs = ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0)

    def with_rank(t: pa.Table) -> pa.Table:
        # sign-flip map uint64 -> int64 (x ^ 2^63): ORDER-preserving, so
        # the per-group ascending sort still matches the oracle's
        # unsigned md5 order, while the column that rides the groupby
        # shuffle is int64 (raw uint64 > 2^63 can crash Ray's reduce).
        h = np.array(
            [stable_hash64(str(d)) for d in t["doc_id"].to_pylist()],
            dtype=np.uint64,
        )
        rk = pa.array((h ^ np.uint64(1 << 63)).view(np.int64), pa.int64())
        return t.append_column("rk", rk)

    def head_k(g: pa.Table) -> pa.Table:
        g = g.sort_by([("rk", "ascending"), ("doc_id", "ascending")])
        return g.slice(0, per_group).select(["doc_id", "pred_lang"])

    return (
        langs.map_batches(with_rank, batch_format="pyarrow")
        .groupby("pred_lang")
        .map_groups(head_k, batch_format="pyarrow")
    )


def stratified_sample_sql(per_group: int = STRATA_K) -> str:
    return f"""
    WITH l AS ({lang_id_sql()}),
    ranked AS (
        SELECT doc_id, pred_lang,
               row_number() OVER (
                   PARTITION BY pred_lang
                   ORDER BY md5_number_upper(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM l
    )
    SELECT doc_id, pred_lang FROM ranked WHERE rn <= {per_group}
    """


# ---------------------------------------------------------------------------
# Deterministic WEIGHTED sampling (A-ES priority sampling): priority =
# hash(doc_id) / weight; the K smallest priorities win, so heavier docs
# are proportionally favored — reproducible across runs AND cluster
# sizes (unlike Dataset.random_sample), and exactly SQL-replicable.
# Scatter-gather shape: narrow priority map, per-block top-K prune,
# tiny global sort+limit.
# ---------------------------------------------------------------------------
WEIGHTED_SAMPLE_K = 50


def weighted_sample(sf_dir: str, k: int = WEIGHTED_SAMPLE_K) -> ray.data.Dataset:
    """(doc_id, n_chars, priority): the K docs with smallest
    hash/weight priority (weight = max(n_chars, 1))."""
    from ifctordf_ray.functions.kernels import stable_hash64

    ds = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def prio(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        h = pa.array(
            [float(stable_hash64(str(d))) for d in t["doc_id"].to_pylist()],
            pa.float64(),
        )
        w = pc.cast(
            pc.max_element_wise(t["n_chars"], pa.scalar(1, pa.int64())),
            pa.float64(),
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": t["n_chars"],
                "priority": pc.divide(h, w),
            }
        )

    pruned = ds.map_batches(prio, batch_format="pyarrow").map_batches(
        lambda t: t.sort_by(
            [("priority", "ascending"), ("doc_id", "ascending")]
        ).slice(0, k),
        batch_format="pyarrow",
    )
    return pruned.sort(["priority", "doc_id"]).limit(k)


def weighted_sample_sql(k: int = WEIGHTED_SAMPLE_K) -> str:
    return f"""
    SELECT doc_id, n_chars,
           CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS DOUBLE)
             / CAST(greatest(n_chars, 1) AS DOUBLE) AS priority
    FROM documents
    ORDER BY priority ASC, doc_id ASC LIMIT {k}
    """


# ---------------------------------------------------------------------------
# Dataset.union across heterogeneous corpora: documents text UNION ALL
# transcript turn text, tagged by source kind, one grouped aggregate on
# the tag.  The union is streaming (no barrier — Ray interleaves blocks
# from both lineages); each side is pre-projected to the narrow shared
# schema so the combined exchange moves 2 columns.
# ---------------------------------------------------------------------------
def unified_corpus_stats(sf_dir: str) -> ray.data.Dataset:
    """(source_kind, n_rows, total_chars): size stats over the union of
    the documents corpus and the derived transcript turns."""
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Sum as _Sum

    from ifctordf_ray.sources.transcripts import transcripts_from_events

    def tag(kind: str, col: str):
        def f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            n = pc.fill_null(
                pc.utf8_length(pc.cast(t[col], pa.string())), 0
            )
            return pa.table(
                {
                    "source_kind": pa.array([kind] * t.num_rows, pa.string()),
                    "n_chars_row": pc.cast(n, pa.int64()),
                }
            )

        return f

    docs = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    ).map_batches(tag("document", "text"), batch_format="pyarrow")
    turns = transcripts_from_events(sf_dir).map_batches(
        tag("turn", "text"), batch_format="pyarrow"
    )
    return (
        docs.union(turns)
        .groupby("source_kind")
        .aggregate(
            _Count(alias_name="n_rows"),
            _Sum("n_chars_row", alias_name="total_chars"),
        )
    )


def unified_corpus_stats_sql() -> str:
    from ifctordf_ray.sql_oracle import transcripts_cte

    return f"""
    WITH {transcripts_cte()},
    u AS (
        SELECT 'document' AS source_kind,
               CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars_row
        FROM documents
        UNION ALL
        SELECT 'turn' AS source_kind,
               CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars_row
        FROM transcripts
    )
    SELECT source_kind, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(n_chars_row) AS BIGINT) AS total_chars
    FROM u GROUP BY source_kind
    """


# ---------------------------------------------------------------------------
# Gopher-style intra-document repetition signals (Rae et al. 2021, "Scaling
# Language Models: ... Gopher" table A1): fraction of word occurrences that
# are repeats, top-word mass, fraction of duplicated bigrams.  Purely
# row-local (no exchange) -> embarrassingly parallel at any scale; fractions
# are quotients of identical integers on both engines -> exact float parity.
# ---------------------------------------------------------------------------
class RepetitionScorer:
    def __init__(self):
        self.word_re = re.compile(WORD_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_words, n_distinct, top_tf, n_big, n_big_distinct = [], [], [], [], []
        for t in batch["text"].to_pylist():
            ws = self.word_re.findall((t or "").lower())
            n = len(ws)
            n_words.append(n)
            if n:
                _, counts = np.unique(ws, return_counts=True)
                n_distinct.append(int(counts.size))
                top_tf.append(int(counts.max()))
            else:
                n_distinct.append(0)
                top_tf.append(0)
            bigs = list(zip(ws[:-1], ws[1:]))
            n_big.append(len(bigs))
            n_big_distinct.append(len(set(bigs)))
        nw = np.asarray(n_words, dtype=np.int64)
        nd = np.asarray(n_distinct, dtype=np.int64)
        tp = np.asarray(top_tf, dtype=np.int64)
        nb = np.asarray(n_big, dtype=np.int64)
        nbd = np.asarray(n_big_distinct, dtype=np.int64)
        # CASE WHEN n>0 THEN CAST(a AS DOUBLE)/n ELSE 0.0 END, bit-identical
        # to the SQL arm (IEEE double quotient of the same exact integers).
        wden = np.where(nw > 0, nw, 1).astype(np.float64)
        bden = np.where(nb > 0, nb, 1).astype(np.float64)
        dup_word = np.where(nw > 0, (nw - nd).astype(np.float64) / wden, 0.0)
        top_word = np.where(nw > 0, tp.astype(np.float64) / wden, 0.0)
        dup_big = np.where(nb > 0, (nb - nbd).astype(np.float64) / bden, 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(nw, pa.int64()),
                "n_distinct_words": pa.array(nd, pa.int64()),
                "dup_word_frac": pa.array(dup_word, pa.float64()),
                "top_word_frac": pa.array(top_word, pa.float64()),
                "dup_bigram_frac": pa.array(dup_big, pa.float64()),
            }
        )


def repetition_scores(sf_dir: str) -> ray.data.Dataset:
    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        RepetitionScorer, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0
    )


def repetition_scores_sql() -> str:
    return f"""
    WITH wl AS (
        SELECT doc_id,
               regexp_extract_all(lower(coalesce(text, '')), '{WORD_RE}') AS ws
        FROM documents
    ),
    wc AS (
        SELECT doc_id, w, count(*) AS tf
        FROM (SELECT doc_id, unnest(ws) AS w FROM wl)
        GROUP BY doc_id, w
    ),
    wagg AS (
        SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_words,
               CAST(count(*) AS BIGINT) AS n_distinct_words,
               CAST(max(tf) AS BIGINT) AS top_tf
        FROM wc GROUP BY doc_id
    ),
    b AS (
        SELECT doc_id,
               ws[CAST(t.i + 1 AS INTEGER)] || ' ' || ws[CAST(t.i + 2 AS INTEGER)] AS bg
        FROM wl CROSS JOIN UNNEST(range(greatest(len(ws) - 1, 0))) AS t(i)
    ),
    bagg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(count(DISTINCT bg) AS BIGINT) AS n_distinct_bigrams
        FROM b GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(wagg.n_words, 0) AS n_words,
           coalesce(wagg.n_distinct_words, 0) AS n_distinct_words,
           CASE WHEN coalesce(wagg.n_words, 0) > 0
                THEN CAST(wagg.n_words - wagg.n_distinct_words AS DOUBLE) / wagg.n_words
                ELSE 0.0 END AS dup_word_frac,
           CASE WHEN coalesce(wagg.n_words, 0) > 0
                THEN CAST(wagg.top_tf AS DOUBLE) / wagg.n_words
                ELSE 0.0 END AS top_word_frac,
           CASE WHEN coalesce(bagg.n_bigrams, 0) > 0
                THEN CAST(bagg.n_bigrams - bagg.n_distinct_bigrams AS DOUBLE) / bagg.n_bigrams
                ELSE 0.0 END AS dup_bigram_frac
    FROM documents d
    LEFT JOIN wagg ON d.doc_id = wagg.doc_id
    LEFT JOIN bagg ON d.doc_id = bagg.doc_id
    """


# ---------------------------------------------------------------------------
# Out-of-vocabulary rate against the corpus's own top-K vocabulary: the
# tokenizer-coverage audit.  Two-phase derived-broadcast shape: phase 1
# computes the top-K vocabulary (combiner groupby + tiny sort/limit),
# phase 2 broadcasts that K-row result via ray.put and scores every doc
# row-locally — the classic "aggregate once, enrich everywhere" plan that
# replaces a corpus-sized join with a K-sized broadcast.
# ---------------------------------------------------------------------------
OOV_VOCAB_K = 24


class OovScorer:
    def __init__(self, vocab_ref):
        import ray as _ray

        self.vocab = frozenset(_ray.get(vocab_ref))
        self.word_re = re.compile(WORD_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_words, n_oov = [], []
        for t in batch["text"].to_pylist():
            ws = self.word_re.findall((t or "").lower())
            n_words.append(len(ws))
            n_oov.append(sum(1 for w in ws if w not in self.vocab))
        nw = np.asarray(n_words, dtype=np.int64)
        no = np.asarray(n_oov, dtype=np.int64)
        den = np.where(nw > 0, nw, 1).astype(np.float64)
        rate = np.where(nw > 0, no.astype(np.float64) / den, 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(nw, pa.int64()),
                "n_oov": pa.array(no, pa.int64()),
                "oov_rate": pa.array(rate, pa.float64()),
            }
        )


def oov_rate(sf_dir: str, top_k: int = OOV_VOCAB_K) -> ray.data.Dataset:
    """(doc_id, n_words, n_oov, oov_rate) vs the corpus top-`top_k`
    vocabulary (count DESC, word ASC tie-break — deterministic)."""
    import ray as _ray

    vocab = [r["word"] for r in vocabulary(sf_dir, top_k=top_k).take_all()]
    vocab_ref = _ray.put(vocab)  # K-sized broadcast, shipped once per actor
    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        OovScorer,
        batch_format="pyarrow",
        concurrency=(1, 4),
        fn_constructor_args=(vocab_ref,),
        max_restarts=0,
    )


def oov_rate_sql(top_k: int = OOV_VOCAB_K) -> str:
    return f"""
    WITH v AS ({vocabulary_sql(top_k=top_k)}),
    w AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(coalesce(text, '')), '{WORD_RE}'))
                   AS word
        FROM documents
    ),
    a AS (
        SELECT w.doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_oov
        FROM w LEFT JOIN v ON w.word = v.word
        GROUP BY w.doc_id
    )
    SELECT d.doc_id,
           coalesce(a.n_words, 0) AS n_words,
           coalesce(a.n_oov, 0) AS n_oov,
           CASE WHEN coalesce(a.n_words, 0) > 0
                THEN CAST(a.n_oov AS DOUBLE) / a.n_words
                ELSE 0.0 END AS oov_rate
    FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
    """


# ---------------------------------------------------------------------------
# Percentile-cutoff selection: statistic -> broadcast threshold -> filter.
# The "keep the top decile" corpus-curation shape: the cutoff is computed
# from a pre-combined value HISTOGRAM (one row per distinct token count —
# bounded by max doc length, NOT corpus-sized), collected once to the
# driver, and applied as a broadcast filter in a second streaming pass.
# ---------------------------------------------------------------------------
TOP_DECILE_Q = 0.9


def quality_top_decile(sf_dir: str, q: float = TOP_DECILE_Q) -> ray.data.Dataset:
    """(doc_id, n_tokens) of docs at or above the corpus p90 token count
    (percentile_disc semantics: first value whose cumulative fraction
    reaches q)."""
    import numpy as np
    from ray.data.aggregate import Count as _Count

    tc = token_counts(sf_dir)
    hist = (
        tc.map_batches(
            lambda t: pa.table({"n_tokens": t["n_tokens"]}), batch_format="pyarrow"
        )
        .groupby("n_tokens")
        .aggregate(_Count(alias_name="n"))
        .take_all()  # histogram-sized (distinct token counts), not corpus-sized
    )
    vals = np.array(sorted(r["n_tokens"] for r in hist), dtype=np.int64)
    cnts = np.array(
        [n for _, n in sorted((r["n_tokens"], r["n"]) for r in hist)],
        dtype=np.int64,
    )
    cum = np.cumsum(cnts)
    if len(cum) == 0:  # empty corpus: no cutoff, nothing to keep anyway
        cutoff = 0
    else:
        total = int(cum[-1])
        i = int(np.searchsorted(cum, q * total, side="left"))
        if cum[i] < q * total:
            i += 1
        cutoff = int(vals[i])

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        f = t.filter(pc.greater_equal(t["n_tokens"], cutoff))
        return pa.table({"doc_id": f["doc_id"], "n_tokens": f["n_tokens"]})

    return token_counts(sf_dir).map_batches(keep, batch_format="pyarrow")


def quality_top_decile_sql(q: float = TOP_DECILE_Q) -> str:
    return f"""
    WITH tc AS ({token_counts_sql()})
    SELECT doc_id, n_tokens FROM tc
    WHERE n_tokens >= (
        SELECT percentile_disc({q}) WITHIN GROUP (ORDER BY n_tokens) FROM tc
    )
    """


# ---------------------------------------------------------------------------
# Grouped exact quantiles: per-language token-count percentiles via the
# same pre-combined histogram trick (shuffle moves one row per
# (lang, distinct count), never raw docs).
# ---------------------------------------------------------------------------
LANG_QUANTILES = (("p25", 0.25), ("p50", 0.5), ("p90", 0.9))


def lang_token_quantiles(sf_dir: str) -> ray.data.Dataset:
    """(pred_lang, p25, p50, p90) of n_tokens per predicted language."""
    from ray.data.aggregate import Count as _Count

    tc = token_counts(sf_dir)
    li = lang_id(sf_dir)
    from ifctordf_ray.functions.kernels import safe_join

    li2 = li.map_batches(
        lambda t: pa.table({"lid": t["doc_id"], "pred_lang": t["pred_lang"]}),
        batch_format="pyarrow",
    )
    # safe_join: both sides are plain maps over the documents read — an
    # empty table gives ZERO blocks on either side
    joined = safe_join(
        tc,
        pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64())]),
        li2,
        pa.schema([("lid", pa.int64()), ("pred_lang", pa.string())]),
        join_type="inner",
        on=("doc_id",),
        right_on=("lid",),
    )
    hist = (
        joined.map_batches(
            lambda t: pa.table(
                {"pred_lang": t["pred_lang"], "n_tokens": t["n_tokens"]}
            ),
            batch_format="pyarrow",
        )
        .groupby(["pred_lang", "n_tokens"])
        .aggregate(_Count(alias_name="n"))
    )

    def pick(group: pa.Table) -> pa.Table:
        import numpy as np

        g = group.sort_by("n_tokens")
        v = g["n_tokens"].to_numpy()
        n = g["n"].to_numpy()
        cum = np.cumsum(n)
        total = int(cum[-1])
        row = {"pred_lang": pa.array([g["pred_lang"][0].as_py()], pa.string())}
        for name, q in LANG_QUANTILES:
            i = int(np.searchsorted(cum, q * total, side="left"))
            if cum[i] < q * total:
                i += 1
            row[name] = pa.array([int(v[i])], pa.int64())
        return pa.table(row)

    return hist.groupby("pred_lang").map_groups(pick, batch_format="pyarrow")


def lang_token_quantiles_sql() -> str:
    cols = ",\n           ".join(
        f"CAST(percentile_disc({q}) WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS {name}"
        for name, q in LANG_QUANTILES
    )
    return f"""
    WITH tc AS ({token_counts_sql()}), li AS ({lang_id_sql()})
    SELECT li.pred_lang,
           {cols}
    FROM tc JOIN li ON tc.doc_id = li.doc_id
    GROUP BY li.pred_lang
    """


# ---------------------------------------------------------------------------
# Batched model inference: linear quality model with broadcast weights
# ---------------------------------------------------------------------------
# fixed "trained" weights in micro-units: bias + w·(n_chars, n_tokens,
# n_digits).  Integers end to end, so inference is bit-exact in SQL.
MODEL_WEIGHTS = {"bias": 5_000_000, "n_chars": -3, "n_tokens": 700, "n_digits": -41}


class LinearScorer:
    """Actor-pool inference stage: weights arrive as ONE ray.put object
    and are fetched per ACTOR in __init__ (the broadcast-model pattern —
    at 100 TB the weight blob ships once per worker, never per batch);
    __call__ is a vectorized dot product over integer feature columns."""

    def __init__(self, weights_ref):
        import ray as _ray

        self.w = (
            _ray.get(weights_ref)
            if not isinstance(weights_ref, dict)
            else weights_ref
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ifctordf_ray.functions.kernels import word_runs

        text = pc.fill_null(t["text"], "")
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        parents, _ = word_runs(t["text"])
        n_tokens = np.zeros(t.num_rows, np.int64)
        if len(parents):
            np.add.at(n_tokens, np.asarray(parents), 1)
        digits_only = pc.replace_substring_regex(text, pattern="[^0-9]", replacement="")
        n_digits = pc.cast(pc.utf8_length(digits_only), pa.int64())
        w = self.w
        score = (
            w["bias"]
            + w["n_chars"] * n_chars.to_numpy()
            + w["n_tokens"] * n_tokens
            + w["n_digits"] * n_digits.to_numpy()
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "score_micro": pa.array(score, pa.int64()),
            }
        )


def model_scores(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, score_micro): linear quality-model inference over integer
    text features — the batched-model-scoring shape (weights broadcast
    once via ray.put, actor pool holds them, per-batch vectorized dot
    product)."""
    import ray as _ray

    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ref = _ray.put(dict(MODEL_WEIGHTS))
    return ds.map_batches(
        LinearScorer,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=(1, 4),
        max_restarts=0,  # constructor args hold ObjectRefs (ray#53727 warning)
    )


def model_scores_sql() -> str:
    w = MODEL_WEIGHTS
    return f"""
    SELECT doc_id,
           CAST({w['bias']}
                + {w['n_chars']} * length(coalesce(text, ''))
                + {w['n_tokens']} * len(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+'))
                + {w['n_digits']} * length(regexp_replace(coalesce(text, ''), '[^0-9]', '', 'g'))
                AS BIGINT) AS score_micro
    FROM documents
    """

# ---------------------------------------------------------------------------
# RefinedWeb-style document filters (Penedo et al. 2023, §3; the same
# family as C4/Gopher rules): word-count bounds, mean-word-length
# bounds, and stop-word presence — the per-document rule table a web
# corpus build evaluates before anything expensive runs.  Counters are
# emitted alongside the verdict so a curation run can audit WHY a
# document was dropped.  Pure narrow map; every comparison is integer
# (mean word length is checked by cross-multiplication, no division).
# ---------------------------------------------------------------------------
RW_MIN_WORDS = 30
RW_MAX_WORDS = 100_000
RW_MWL_LO = 2   # mean word length bounds (cross-multiplied)
RW_MWL_HI = 10
RW_MIN_STOP = 2  # distinct stopwords required


def _rw_flags_batch(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    from ifctordf_ray.functions.kernels import word_runs

    parents, flat = word_runs(t["text"])
    par = parents.to_numpy(zero_copy_only=False).astype(np.int64)
    n = t.num_rows
    n_words = np.bincount(par, minlength=n).astype(np.int64)
    wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    sum_len = np.zeros(n, np.int64)
    np.add.at(sum_len, par, wlen)

    stop_arr = pa.array(list(STOPWORDS), pa.string())
    is_stop = pc.is_in(flat, value_set=stop_arr).to_numpy(zero_copy_only=False)
    stop_idx = pc.index_in(flat, value_set=stop_arr).to_numpy(zero_copy_only=False)
    pairs = np.unique(
        np.stack([par[is_stop], stop_idx[is_stop].astype(np.int64)], axis=1), axis=0
    )
    n_stop = np.bincount(pairs[:, 0], minlength=n).astype(np.int64)

    pass_words = (n_words >= RW_MIN_WORDS) & (n_words <= RW_MAX_WORDS)
    # RW_MWL_LO <= sum_len/n_words <= RW_MWL_HI, integer-exact
    pass_mwl = (sum_len >= RW_MWL_LO * n_words) & (sum_len <= RW_MWL_HI * n_words)
    pass_stop = n_stop >= RW_MIN_STOP
    keep = pass_words & pass_mwl & pass_stop & (n_words > 0)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_words": pa.array(n_words, pa.int64()),
            "sum_word_len": pa.array(sum_len, pa.int64()),
            "n_stopwords": pa.array(n_stop, pa.int64()),
            "pass_words": pa.array(pass_words.astype(np.int64), pa.int64()),
            "pass_mwl": pa.array(pass_mwl.astype(np.int64), pa.int64()),
            "pass_stop": pa.array(pass_stop.astype(np.int64), pa.int64()),
            "keep": pa.array(keep.astype(np.int64), pa.int64()),
        }
    )


def refinedweb_filters(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_words, sum_word_len, n_stopwords, pass_*, keep): the
    RefinedWeb rule-table audit row per document."""
    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(_rw_flags_batch, batch_format="pyarrow")


def refinedweb_filters_sql() -> str:
    stoplist = ",".join(f"'{w}'" for w in STOPWORDS)
    return f"""
    WITH w AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(coalesce(text, '')),
                                         '{WORD_RE}')) AS word
        FROM documents
    ),
    agg AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(len(word)) AS BIGINT) AS sum_word_len,
               CAST(count(DISTINCT CASE WHEN word IN ({stoplist})
                          THEN word END) AS BIGINT) AS n_stopwords
        FROM w GROUP BY 1
    )
    SELECT d.doc_id,
           coalesce(a.n_words, 0) AS n_words,
           coalesce(a.sum_word_len, 0) AS sum_word_len,
           coalesce(a.n_stopwords, 0) AS n_stopwords,
           CAST(CASE WHEN coalesce(a.n_words, 0) >= {RW_MIN_WORDS}
                      AND coalesce(a.n_words, 0) <= {RW_MAX_WORDS}
                THEN 1 ELSE 0 END AS BIGINT) AS pass_words,
           CAST(CASE WHEN coalesce(a.sum_word_len, 0)
                          >= {RW_MWL_LO} * coalesce(a.n_words, 0)
                      AND coalesce(a.sum_word_len, 0)
                          <= {RW_MWL_HI} * coalesce(a.n_words, 0)
                THEN 1 ELSE 0 END AS BIGINT) AS pass_mwl,
           CAST(CASE WHEN coalesce(a.n_stopwords, 0) >= {RW_MIN_STOP}
                THEN 1 ELSE 0 END AS BIGINT) AS pass_stop,
           CAST(CASE WHEN coalesce(a.n_words, 0) >= {RW_MIN_WORDS}
                      AND coalesce(a.n_words, 0) <= {RW_MAX_WORDS}
                      AND coalesce(a.sum_word_len, 0)
                          >= {RW_MWL_LO} * coalesce(a.n_words, 0)
                      AND coalesce(a.sum_word_len, 0)
                          <= {RW_MWL_HI} * coalesce(a.n_words, 0)
                      AND coalesce(a.n_stopwords, 0) >= {RW_MIN_STOP}
                      AND coalesce(a.n_words, 0) > 0
                THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """


# ---------------------------------------------------------------------------
# Per-source corpus datasheet ("Datasheets for Datasets", Gebru et al.
# 2021; the per-source summary card a corpus release ships): document
# count, token and char volume, language spread, and how many documents
# survive the RefinedWeb rule table — per `source`.
#
# Scale shape: ONE narrow per-doc map reusing the rule-table pass, a
# (source, lang)-level combine (bounded by |sources| x |langs|, never
# corpus-sized), then a per-source map_groups rollup over that tiny
# table.  No join anywhere.
# ---------------------------------------------------------------------------
def source_datasheet(sf_dir: str) -> ray.data.Dataset:
    """(source, n_docs, n_langs, sum_words, sum_chars, n_keep)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Sum as _Sum

    ds = _clean_read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "source", "lang", "n_chars"],
    )

    def per_doc(t: pa.Table) -> pa.Table:
        flags = _rw_flags_batch(t)
        return pa.table(
            {
                "source": t["source"],
                "lang": t["lang"],
                "n_words": flags["n_words"],
                "n_chars": pc.cast(t["n_chars"], pa.int64()),
                "keep": flags["keep"],
            }
        )

    fine = (
        ds.map_batches(per_doc, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(
            _Count(alias_name="n_docs"),
            _Sum("n_words", alias_name="sum_words"),
            _Sum("n_chars", alias_name="sum_chars"),
            _Sum("keep", alias_name="n_keep"),
        )
    )

    def rollup(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": g["source"][:1],
                "n_docs": pa.array([pc.sum(g["n_docs"]).as_py()], pa.int64()),
                "n_langs": pa.array([g.num_rows], pa.int64()),
                "sum_words": pa.array([pc.sum(g["sum_words"]).as_py()], pa.int64()),
                "sum_chars": pa.array([pc.sum(g["sum_chars"]).as_py()], pa.int64()),
                "n_keep": pa.array([pc.sum(g["n_keep"]).as_py()], pa.int64()),
            }
        )

    return fine.groupby("source").map_groups(rollup, batch_format="pyarrow")


def source_datasheet_sql() -> str:
    return f"""
    WITH w AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(coalesce(text, '')),
                                         '{WORD_RE}')) AS word
        FROM documents
    ),
    per_doc AS (
        SELECT d.doc_id, d.source, d.lang, d.n_chars,
               coalesce(a.n_words, 0) AS n_words,
               coalesce(a.n_stop, 0) AS n_stop,
               coalesce(a.sum_word_len, 0) AS sum_word_len
        FROM documents d LEFT JOIN (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
                   CAST(sum(len(word)) AS BIGINT) AS sum_word_len,
                   CAST(count(DISTINCT CASE WHEN word IN
                        ({",".join(f"'{w}'" for w in STOPWORDS)})
                        THEN word END) AS BIGINT) AS n_stop
            FROM w GROUP BY 1
        ) a USING (doc_id)
    ),
    flagged AS (
        SELECT source, lang, n_words, n_chars,
               CASE WHEN n_words >= {RW_MIN_WORDS} AND n_words <= {RW_MAX_WORDS}
                     AND sum_word_len >= {RW_MWL_LO} * n_words
                     AND sum_word_len <= {RW_MWL_HI} * n_words
                     AND n_stop >= {RW_MIN_STOP} AND n_words > 0
                    THEN 1 ELSE 0 END AS keep
        FROM per_doc
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(sum(n_words) AS BIGINT) AS sum_words,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(keep) AS BIGINT) AS n_keep
    FROM flagged GROUP BY source
    """


# ---------------------------------------------------------------------------
# Temperature-scaled language mixture (the multilingual sampling recipe
# of mBERT/XLM-R/mT5: p_i ∝ n_i^alpha with alpha < 1, upweighting
# low-resource languages): per-language corpus counts -> temperature
# weights -> exact integer mixture shares.  Complements export's
# mixture_schedule (which CONSUMES fixed weights; this DERIVES them).
#
# Parity notes: DuckDB's exp/ln match Python's math.exp/math.log
# bit-for-bit on this platform while numpy's SIMD exp differs in the
# last ulp (measured) — so the #langs-sized finish uses math.*; the
# share is then an exact BIGINT division, order-independent.
# ---------------------------------------------------------------------------
MIX_ALPHA = 0.3
MIX_SCALE = 1_000_000


def lang_temperature_mix(sf_dir: str, alpha: float = MIX_ALPHA) -> ray.data.Dataset:
    """(lang, n_docs, w_micro, share_micro): temperature-weighted
    sampling shares per language; share_micro = w_micro * 1e6 // sum(w)."""
    import math

    from ray.data.aggregate import Count as _Count

    counts = (
        _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
        .groupby("lang")
        .aggregate(_Count(alias_name="n_docs"))
        .take_all()
    )  # #langs rows: fixed-size, driver-safe
    langs = sorted(r["lang"] for r in counts)
    n = {r["lang"]: int(r["n_docs"]) for r in counts}
    w = {
        lg: int(math.floor(math.exp(alpha * math.log(float(n[lg]))) * MIX_SCALE + 0.5))
        for lg in langs
    }
    tot = sum(w.values())
    return ray.data.from_arrow(
        pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "n_docs": pa.array([n[lg] for lg in langs], pa.int64()),
                "w_micro": pa.array([w[lg] for lg in langs], pa.int64()),
                "share_micro": pa.array(
                    [w[lg] * MIX_SCALE // tot for lg in langs], pa.int64()
                ),
            }
        )
    )


def lang_temperature_mix_sql(alpha: float = MIX_ALPHA) -> str:
    return f"""
    WITH c AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1
    ),
    w AS (
        SELECT lang, n_docs,
               CAST(floor(exp({alpha} * ln(CAST(n_docs AS DOUBLE)))
                          * {MIX_SCALE} + 0.5) AS BIGINT) AS w_micro
        FROM c
    ),
    t AS (SELECT CAST(sum(w_micro) AS BIGINT) AS tot FROM w)
    SELECT lang, n_docs, w_micro,
           CAST((w_micro * {MIX_SCALE}) // t.tot AS BIGINT) AS share_micro
    FROM w, t
    """


# ---------------------------------------------------------------------------
# Language-ID evaluation: confusion matrix against the labeled column
# ---------------------------------------------------------------------------
def lang_confusion(sf_dir: str) -> ray.data.Dataset:
    """(lang_true, pred_lang, n_docs): confusion matrix of the n-gram
    lang-id heuristic against the table's labeled `lang` column — the
    eval every language filter needs before its predictions gate a
    corpus mixture (a filter that misroutes one language starves that
    slice of the training mix).  Shape: one scoring map (LangId actor
    pool, text column only) + a label-cardinality groupby; the matrix
    is |langs|^2 rows regardless of corpus size."""
    from ray.data.aggregate import Count

    ds = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    class _LangWithLabel(LangId):
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = super().__call__(batch.select(["doc_id", "text"]))
            return out.append_column("lang_true", batch["lang"])

    preds = ds.map_batches(
        _LangWithLabel, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0
    )
    return preds.groupby(["lang_true", "pred_lang"]).aggregate(
        Count(alias_name="n_docs")
    )


def lang_confusion_sql() -> str:
    return f"""
    WITH p AS ({lang_id_sql()})
    SELECT d.lang AS lang_true, p.pred_lang,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents d JOIN p USING (doc_id)
    GROUP BY 1, 2
    """
