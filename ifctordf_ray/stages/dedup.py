"""Deduplication operators over the documents table.

The reference's dedup inventory (SURVEY.md §2.5): exact statement dedup
keyed on full content (`resolveDuplicates`, IfcSpfParser.java:147-165,
first-seen wins) and global wrapper dedup (D3).  Scaled up for a
training-data pipeline this becomes:

- exact dedup: content fingerprint -> hash-partitioned groupby ->
  keep min doc_id (deterministic first-seen analog).  SQL oracle.
- MinHash + LSH near-dup: word-shingle -> P minhashes -> B bands ->
  groupby(band, band_hash) -> candidate pairs -> verify by signature
  similarity.  All hashes are md5-derived (deterministic across
  processes/nodes — never Python hash()).
- SimHash: 64-bit fingerprint, near-dup = small Hamming distance.
- n-gram Jaccard verify: exact similarity for candidate pairs, via a
  distributed hash join of the pair stream against the per-doc shingle
  dataset (nothing corpus-sized ever lands on the driver).

Hash spec (shared with the DuckDB oracles, so every operator here is
driver-checkable):
- stable_hash64(s) = little-endian uint64 of the FIRST 8 md5 bytes —
  exactly DuckDB's `md5_number_upper(s)`.
- minhash permutation h -> (a*h + b) mod p with p = 2^31 - 1 and
  a, b, h < p: the product stays below 2^62, so the arithmetic is exact
  in uint64 numpy AND in DuckDB BIGINT (no silent mod-2^64 wraparound —
  a larger prime would overflow numpy's uint64 multiply).
- LSH band hash: fixed-coefficient polynomial over the band's minhash
  values mod 2^61-1 (_BAND_COEF/_M61) — vectorizable (no per-row string
  build) and BIGINT-exact in the oracle.

Scale notes: the LSH explode emits B rows/doc; the bucket groupby is the
only shuffle; bucket sizes are capped (MAX_BUCKET) to bound pair blowup
on degenerate buckets (skew guard) — capping is logged per batch in the
output (`truncated` flag) rather than silent.
"""

from __future__ import annotations

import re
from itertools import combinations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ifctordf_ray.sources.transcripts import clean_read_parquet as _clean_read_parquet
from ray.data.aggregate import Count, Min

WORD_RE = r"[a-z0-9]+"
SHINGLE_K = 3           # word 3-grams
NUM_PERM = 64           # minhash permutations
NUM_BANDS = 16          # LSH bands (4 rows/band)
ROWS_PER_BAND = NUM_PERM // NUM_BANDS
MAX_BUCKET = 50         # skew guard: max docs per LSH bucket expanded to pairs
_P31 = (1 << 31) - 1    # Mersenne-31: a*h < 2^62 fits uint64 exactly
# Band-hash spec (vectorized): a band's key is a fixed-coefficient
# polynomial over its ROWS_PER_BAND minhash values mod M61, plus the band
# id.  Equality semantics are the same as hashing the joined value string
# (buckets = docs whose band VECTORS agree, up to ~2^-61 collisions), but
# the arithmetic is 4 vectorized multiply-adds per doc instead of a
# Python string build + md5 per (doc, band) — and the identical
# arithmetic runs in the DuckDB oracle (all quantities < 2^63: values
# < 2^31, coefficients < 2^30, per-term mod, 4-term sum < 2^63).
_M61 = (1 << 61) - 1
_BAND_COEF = (1000000007, 998244353, 754974721, 167772161)
assert ROWS_PER_BAND <= len(_BAND_COEF)


from ifctordf_ray.functions.kernels import stable_hash64 as _stable_hash64  # noqa: E402


def _perm_params(num_perm: int = NUM_PERM) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(42)  # fixed seed: signatures are part of the spec
    a = rng.randint(1, _P31, size=num_perm).astype(np.uint64)
    b = rng.randint(0, _P31, size=num_perm).astype(np.uint64)
    return a, b


def shingles(text: str, k: int = SHINGLE_K) -> set[str]:
    words = re.findall(WORD_RE, (text or "").lower())
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


class MinHasher:
    """Actor-pool stage: permutation params + regex compiled once per
    actor; emits one signature row per doc."""

    def __init__(self, num_perm: int = NUM_PERM):
        self.a, self.b = _perm_params(num_perm)
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        sh = shingles(text)
        if not sh:
            # sentinel above every real value (< p): empty docs collide
            # only with other empty docs
            return np.full(self.num_perm, _P31, dtype=np.uint64)
        h = np.array([_stable_hash64(s) % _P31 for s in sh], dtype=np.uint64)
        # (a*h + b) mod p, all permutations x all shingles, min over
        # shingles; exact: a, h < 2^31 so a*h + b < 2^62 < 2^64
        vals = (h[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(_P31)
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
            }
        )


_WORKER_STATE: dict = {}


def _minhash_fn(batch: pa.Table) -> pa.Table:
    """Stateless-task form of MinHasher: perm params cached per worker
    process (cheap state -> task pool, not actor pool: tasks release
    their CPU between batches, so they coexist with join aggregator
    pools on small sessions; see stages/extract._compiled)."""
    mh = _WORKER_STATE.get("mh")
    if mh is None:
        mh = MinHasher()
        _WORKER_STATE["mh"] = mh
    return mh(batch)


def minhash_signatures(sf_dir: str) -> ray.data.Dataset:
    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(_minhash_fn, batch_format="pyarrow")


def _sig_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<uint64> signature column -> (n, NUM_PERM) uint64 matrix,
    zero-copy on the flattened values (no per-element Python boxing)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(arr), NUM_PERM)


def _explode_bands(batch: pa.Table, with_sig: bool = True) -> pa.Table:
    """signature row -> NUM_BANDS (band_id, band_hash, doc_id[, sig]) rows.

    Fully vectorized: the fixed-length sig column reshapes to an
    (n, NUM_BANDS, ROWS_PER_BAND) view and the band hash is the
    _BAND_COEF polynomial mod _M61 (see header) — no per-row Python.
    with_sig=False ships lean (band_hash, doc_id) rows only (the
    candidate-join pair shape, NUM_BANDS x lighter through the bucket
    shuffle); with_sig=True replicates the signature into every band row
    so buckets can estimate Jaccard without a join."""
    n = batch.num_rows
    sig_col = batch["sig"].combine_chunks()
    vals = _sig_matrix(sig_col).reshape(n, NUM_BANDS, ROWS_PER_BAND)
    coef = np.array(_BAND_COEF[:ROWS_PER_BAND], dtype=np.uint64)
    m = np.uint64(_M61)
    # per-term mod keeps every intermediate < 2^63 (same arithmetic as
    # the BIGINT SQL oracle); 4-term sum < 2^63 fits uint64 trivially
    acc = ((vals * coef[None, None, :]) % m).sum(axis=2, dtype=np.uint64)
    bh = (acc + np.arange(NUM_BANDS, dtype=np.uint64)[None, :]) % m
    doc_rep = batch["doc_id"].combine_chunks().take(
        pa.array(np.repeat(np.arange(n, dtype=np.int64), NUM_BANDS))
    )
    cols = {
        "band_id": pa.array(np.tile(np.arange(NUM_BANDS, dtype=np.int32), n)),
        # band_hash < 2^61 so the int64 cast is lossless (shuffle keys
        # stay int64: uint64 > 2^63 can crash Ray's groupby reduce)
        "band_hash": pa.array(bh.reshape(-1).astype(np.int64)),
        "doc_id": doc_rep,
    }
    if with_sig:
        cols["sig"] = sig_col.take(
            pa.array(np.repeat(np.arange(n, dtype=np.int64), NUM_BANDS))
        )
    return pa.table(cols)


def _bucket_docs(group: pa.Table) -> tuple[np.ndarray, bool]:
    """Shared bucket prep: doc ids sorted ascending, MAX_BUCKET skew cap
    applied (lowest doc_ids kept — deterministic), truncation flag."""
    docs = group["doc_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(docs, kind="stable")
    truncated = len(docs) > MAX_BUCKET
    return order[:MAX_BUCKET], truncated


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """One LSH bucket -> candidate pairs with signature-estimated Jaccard.
    Buckets larger than MAX_BUCKET are truncated (flagged, not silent).
    Vectorized: one (m, m, NUM_PERM) equality reduction for the whole
    bucket (m <= MAX_BUCKET bounds the intermediate)."""
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "est_jaccard": pa.array([], pa.float64()),
            "truncated": pa.array([], pa.bool_()),
        }
    )
    if group.num_rows < 2:
        return empty
    order, truncated = _bucket_docs(group)
    docs = group["doc_id"].to_numpy(zero_copy_only=False)[order]
    sig = _sig_matrix(group["sig"])[order]
    m = len(docs)
    iu, ju = np.triu_indices(m, k=1)
    keep = docs[iu] != docs[ju]
    iu, ju = iu[keep], ju[keep]
    if not len(iu):
        return empty
    est = (sig[iu] == sig[ju]).mean(axis=1)
    da, db = docs[iu], docs[ju]
    return pa.table(
        {
            "doc_a": pa.array(np.minimum(da, db), pa.int64()),
            "doc_b": pa.array(np.maximum(da, db), pa.int64()),
            "est_jaccard": pa.array(est, pa.float64()),
            "truncated": pa.array(np.full(len(iu), truncated)),
        }
    )


def _bucket_pairs_lean(group: pa.Table) -> pa.Table:
    """Lean bucket expansion: (doc_a, doc_b) only — signatures are joined
    onto the SURVIVING distinct pairs downstream instead of riding every
    band row through the bucket shuffle."""
    if group.num_rows < 2:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    order, _truncated = _bucket_docs(group)
    docs = group["doc_id"].to_numpy(zero_copy_only=False)[order]
    m = len(docs)
    iu, ju = np.triu_indices(m, k=1)
    keep = docs[iu] != docs[ju]
    da, db = docs[iu[keep]], docs[ju[keep]]
    return pa.table(
        {
            "doc_a": pa.array(np.minimum(da, db), pa.int64()),
            "doc_b": pa.array(np.maximum(da, db), pa.int64()),
        }
    )


def near_dup_pairs_minhash(
    sf_dir: str, threshold: float = 0.5, ship_sigs: bool | None = None
) -> ray.data.Dataset:
    """MinHash-LSH near-duplicate candidate pairs (est_jaccard >=
    threshold), deduplicated across bands via groupby(doc_a, doc_b).

    Two physical shapes, same result (A/B table in BASELINE.md §band-
    shape):
    - ship_sigs=True: every band row carries the full signature, est
      computed inside the bucket groupby (1 shuffle, NUM_BANDS x sig
      volume through it).
    - ship_sigs=False (default — candidates << docs x bands at real
      thresholds, so joining sigs onto SURVIVING distinct pairs moves
      fewer bytes): lean (band_hash, doc_id) band rows -> bucket pairs ->
      distinct -> two hash joins against the signature table -> est.
    Override per-run via GRAFT_MINHASH_SHIP_SIGS=1."""
    import os

    if ship_sigs is None:
        ship_sigs = os.environ.get("GRAFT_MINHASH_SHIP_SIGS") == "1"
    sigs = minhash_signatures(sf_dir)
    thresh = threshold
    if ship_sigs:
        bands = sigs.map_batches(_explode_bands, batch_format="pyarrow")
        pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
            _bucket_pairs, batch_format="pyarrow"
        )

        def flt(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater_equal(t["est_jaccard"], thresh))

        filtered = pairs.map_batches(flt, batch_format="pyarrow")
        return filtered.groupby(["doc_a", "doc_b"]).aggregate(
            Min("est_jaccard", alias_name="est_jaccard")
        )

    from ifctordf_ray.functions.kernels import safe_join
    from ifctordf_ray.tuning import default_join_partitions

    import functools

    bands = sigs.map_batches(
        functools.partial(_explode_bands, with_sig=False), batch_format="pyarrow"
    )
    cand = (
        bands.groupby(["band_id", "band_hash"])
        .map_groups(_bucket_pairs_lean, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="_nb"))
        .map_batches(
            lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow"
        )
    )
    pair_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    nparts = default_join_partitions()
    SIGBIN = pa.binary(8 * NUM_PERM)

    def _sig_side(name: str):
        # pack the signature into one fixed-size binary cell: Acero hash
        # joins reject list<> payload columns, and the packed form is
        # also lighter through the exchange (no offsets vector)
        def pack(t: pa.Table, n=name) -> pa.Table:
            mat = _sig_matrix(t["sig"])
            packed = pa.Array.from_buffers(
                SIGBIN, len(mat), [None, pa.py_buffer(np.ascontiguousarray(mat).tobytes())]
            )
            return pa.table({"sid": t["doc_id"], n: packed})

        return sigs.map_batches(pack, batch_format="pyarrow")

    def _sig_schema(name: str) -> pa.Schema:
        return pa.schema([("sid", pa.int64()), (name, SIGBIN)])

    j1 = safe_join(
        cand, pair_schema, _sig_side("sig_a"), _sig_schema("sig_a"),
        join_type="inner", on=("doc_a",), right_on=("sid",),
        num_partitions=nparts,
    )
    j2 = safe_join(
        j1,
        pair_schema.append(pa.field("sig_a", SIGBIN)),
        _sig_side("sig_b"), _sig_schema("sig_b"),
        join_type="inner", on=("doc_b",), right_on=("sid",),
        num_partitions=nparts,
    )

    def _unpack(col) -> np.ndarray:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if arr.type != SIGBIN:
            arr = arr.cast(SIGBIN)
        buf = arr.buffers()[1]
        off = arr.offset * 8 * NUM_PERM
        return np.frombuffer(
            buf, dtype=np.uint64, count=len(arr) * NUM_PERM, offset=off
        ).reshape(len(arr), NUM_PERM)

    def est_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "est_jaccard": pa.array([], pa.float64()),
                }
            )
        est = (_unpack(t["sig_a"]) == _unpack(t["sig_b"])).mean(axis=1)
        out = pa.table(
            {
                "doc_a": t["doc_a"],
                "doc_b": t["doc_b"],
                "est_jaccard": pa.array(est, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out["est_jaccard"], thresh))

    return j2.map_batches(est_fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SQL oracle building blocks (exact DuckDB replicas of the hash spec)
# ---------------------------------------------------------------------------
def _shingle_cte() -> str:
    """CTEs: documents -> distinct word-3-gram shingles per doc (sh) and
    their mod-p hashes (hv).  Mirrors shingles()/stable_hash64 exactly."""
    return f"""wl AS (
    SELECT doc_id,
           regexp_extract_all(lower(coalesce(text, '')), '{WORD_RE}') AS ws
    FROM documents
),
sh AS (
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               CASE WHEN len(ws) >= {SHINGLE_K}
                    THEN list_transform(range(len(ws) - {SHINGLE_K - 1}),
                         i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])
                    WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
                    ELSE [] END AS shl
        FROM wl
    ), UNNEST(shl) AS u(shingle)
),
hv AS (
    SELECT doc_id, CAST(md5_number_upper(shingle) % {_P31} AS BIGINT) AS h
    FROM sh
)"""


def _sig_cte() -> str:
    """CTE `sig`: per (doc_id, pid) minhash value, sentinel p for docs
    with no shingles (same as MinHasher.signature)."""
    a, b = _perm_params()
    perm_rows = ",".join(
        f"({i},{int(a[i])},{int(b[i])})" for i in range(NUM_PERM)
    )
    return f"""perm(pid, a, b) AS (VALUES {perm_rows}),
sigp AS (
    SELECT doc_id, pid, min((a * h + b) % {_P31}) AS v
    FROM hv CROSS JOIN perm GROUP BY doc_id, pid
),
sig AS (
    SELECT d.doc_id, p.pid, coalesce(s.v, {_P31}) AS v
    FROM (SELECT doc_id FROM documents) d
    CROSS JOIN perm p
    LEFT JOIN sigp s ON s.doc_id = d.doc_id AND s.pid = p.pid
)"""


def _candidates_cte() -> str:
    """CTEs band/cand/est: banded LSH candidate pairs + signature-estimated
    Jaccard (replicates _explode_bands/_bucket_pairs INCLUDING the
    MAX_BUCKET skew cap: only the lowest-{MAX_BUCKET} doc_ids of a bucket
    form pairs, matching argsort(docs)[:MAX_BUCKET])."""
    coef_case = " ".join(
        f"WHEN {j} THEN {c}" for j, c in enumerate(_BAND_COEF[:ROWS_PER_BAND])
    )
    return f"""band AS (
    -- polynomial band hash, same arithmetic as _explode_bands: per-term
    -- mod keeps products < 2^61 and the {ROWS_PER_BAND}-term sum < 2^63 (BIGINT-safe)
    SELECT doc_id, pid // {ROWS_PER_BAND} AS band_id,
           (sum((v * CASE pid % {ROWS_PER_BAND} {coef_case} END) % {_M61})
            + pid // {ROWS_PER_BAND}) % {_M61} AS band_hash
    FROM sig GROUP BY doc_id, pid // {ROWS_PER_BAND}
),
bandr AS (
    SELECT doc_id, band_id, band_hash,
           row_number() OVER (PARTITION BY band_id, band_hash
                              ORDER BY doc_id) AS rk
    FROM band
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bandr a JOIN bandr b
      ON a.band_id = b.band_id AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
     AND a.rk <= {MAX_BUCKET} AND b.rk <= {MAX_BUCKET}
),
est AS (
    SELECT c.doc_a, c.doc_b,
           sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) / {float(NUM_PERM)} AS est_jaccard
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b AND sb.pid = sa.pid
    GROUP BY c.doc_a, c.doc_b
)"""


def near_dup_pairs_minhash_sql(threshold: float = 0.5) -> str:
    return f"""WITH {_shingle_cte()},
{_sig_cte()},
{_candidates_cte()}
SELECT doc_a, doc_b, est_jaccard FROM est WHERE est_jaccard >= {threshold}"""


class SimHasher:
    """64-bit SimHash over word hashes; near-dups have small Hamming
    distance.  Deterministic md5-derived word hashes; the per-word md5 is
    cached across the actor's lifetime and the bit tally is one
    vectorized matmul-free reduction per doc."""

    def __init__(self):
        self.word_re = re.compile(WORD_RE)
        self._cache: dict[str, int] = {}
        self._bit_idx = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        words = self.word_re.findall((text or "").lower())
        if not words:
            return 0
        cache = self._cache
        hs = np.empty(len(words), dtype=np.uint64)
        for i, w in enumerate(words):
            h = cache.get(w)
            if h is None:
                h = _stable_hash64(w)
                cache[w] = h
            hs[i] = h
        # (n_words, 64) sign matrix in one shot, then column tally
        bits = (hs[:, None] >> self._bit_idx[None, :]) & np.uint64(1)
        counts = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        sel = np.nonzero(counts > 0)[0]
        return int(np.sum(np.uint64(1) << sel.astype(np.uint64)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [self.simhash(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(hs, pa.uint64()),
            }
        )


def _simhash_fn(batch: pa.Table) -> pa.Table:
    sh = _WORKER_STATE.get("sh")
    if sh is None:
        sh = SimHasher()
        _WORKER_STATE["sh"] = sh
    return sh(batch)


def simhash_fingerprints(sf_dir: str) -> ray.data.Dataset:
    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(_simhash_fn, batch_format="pyarrow")


def simhash_fingerprints_sql() -> str:
    return f"""WITH w AS (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(coalesce(text, '')), '{WORD_RE}')) AS word
    FROM documents
),
h AS (SELECT doc_id, md5_number_upper(word) AS hw FROM w),
bits AS (SELECT unnest(range(64)) AS bit),
cnt AS (
    SELECT doc_id, bit,
           sum(CASE WHEN (hw >> CAST(bit AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS c
    FROM h CROSS JOIN bits GROUP BY doc_id, bit
),
simh AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN c > 0
                         THEN CAST(1 AS UBIGINT) << CAST(bit AS INTEGER)
                         ELSE 0 END) AS UBIGINT) AS simhash
    FROM cnt GROUP BY doc_id
)
SELECT d.doc_id, CAST(coalesce(s.simhash, 0) AS UBIGINT) AS simhash
FROM documents d LEFT JOIN simh s USING (doc_id)"""


# ---------------------------------------------------------------------------
# SimHash near-dup pairs: band the 64-bit fingerprint, verify Hamming
# ---------------------------------------------------------------------------
SIMHASH_BANDS = 4                 # 4 bands x 16 bits
SIMHASH_BAND_BITS = 64 // SIMHASH_BANDS
SIMHASH_MAX_HAMMING = 3           # pigeonhole: hamming <= BANDS-1 always
                                  # shares at least one identical band


def _simhash_bucket_pairs(group: pa.Table) -> pa.Table:
    """One band bucket -> pairs with exact Hamming distance <=
    SIMHASH_MAX_HAMMING.  Same MAX_BUCKET skew cap as the minhash path
    (lowest doc_ids kept)."""
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int64()),
        }
    )
    if group.num_rows < 2:
        return empty
    docs = group["doc_id"].to_pylist()
    hashes = group["simhash"].to_pylist()
    order = sorted(range(len(docs)), key=lambda i: docs[i])[:MAX_BUCKET]
    a_l, b_l, h_l = [], [], []
    for x, y in combinations(order, 2):
        da, db = docs[x], docs[y]
        if da == db:
            continue
        # mask to 64 bits: hashes may arrive as the signed int64 VIEW of
        # the uint64 fingerprint (negative Python ints sign-extend, and
        # int.bit_count() counts |x|'s bits — both wrong unmasked).
        ham = ((hashes[x] ^ hashes[y]) & 0xFFFFFFFFFFFFFFFF).bit_count()
        if ham <= SIMHASH_MAX_HAMMING:
            a_l.append(min(da, db))
            b_l.append(max(da, db))
            h_l.append(ham)
    if not a_l:
        return empty
    return pa.table(
        {
            "doc_a": pa.array(a_l, pa.int64()),
            "doc_b": pa.array(b_l, pa.int64()),
            "hamming": pa.array(h_l, pa.int64()),
        }
    )


def near_dup_pairs_simhash(sf_dir: str) -> ray.data.Dataset:
    """Banded SimHash near-dup pairs: explode each fingerprint into
    SIMHASH_BANDS (band_id, band_key) rows, group same-key buckets, emit
    pairs with exact Hamming <= SIMHASH_MAX_HAMMING, dedup across bands.
    Guarantee: banding is LOSSLESS for this radius (a pair with <= 3
    differing bits cannot differ in all 4 bands), so this equals the
    all-pairs O(n^2) scan at sub-quadratic cost — the scale path for
    simhash dedup, one bucket shuffle."""
    fps = simhash_fingerprints(sf_dir)

    def explode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parts = []
        for b in range(SIMHASH_BANDS):
            shifted = pc.bit_wise_and(
                pc.shift_right(
                    t["simhash"], pa.scalar(b * SIMHASH_BAND_BITS, pa.uint64())
                ),
                pa.scalar((1 << SIMHASH_BAND_BITS) - 1, pa.uint64()),
            )
            # int64 reinterpret for everything that crosses the shuffle:
            # band_key is the groupby key and simhash rides along — raw
            # uint64 values > 2^63 can crash Ray's reduce (int64
            # inference).  band_key < 2^16 so the cast is value-exact;
            # simhash is a signed VIEW, undone bitwise in the bucket fn.
            parts.append(
                pa.table(
                    {
                        "band_id": pa.nulls(t.num_rows, pa.int32()).fill_null(b),
                        "band_key": shifted.cast(pa.int64()),
                        "doc_id": t["doc_id"],
                        "simhash": pa.array(
                            t["simhash"]
                            .to_numpy(zero_copy_only=False)
                            .astype(np.uint64)
                            .view(np.int64),
                            pa.int64(),
                        ),
                    }
                )
            )
        return pa.concat_tables(parts)

    pairs = fps.map_batches(explode, batch_format="pyarrow").groupby(
        ["band_id", "band_key"]
    ).map_groups(_simhash_bucket_pairs, batch_format="pyarrow")
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


def near_dup_pairs_simhash_sql() -> str:
    """Exact replica: simhash CTE (shared spec), band explode via bit
    ops, per-bucket MAX_BUCKET rank cap, xor-popcount Hamming verify."""
    simhash_body = simhash_fingerprints_sql()
    return f"""WITH fps AS ({simhash_body}),
bands AS (
    SELECT doc_id, simhash, CAST(b.b AS INTEGER) AS band_id,
           (simhash >> CAST({SIMHASH_BAND_BITS} * b.b AS INTEGER))
               & {(1 << SIMHASH_BAND_BITS) - 1} AS band_key
    FROM fps CROSS JOIN (SELECT unnest(range({SIMHASH_BANDS})) AS b) b
),
ranked AS (
    SELECT doc_id, simhash, band_id, band_key,
           row_number() OVER (PARTITION BY band_id, band_key
                              ORDER BY doc_id) AS rk
    FROM bands
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM ranked a JOIN ranked b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
     AND a.rk <= {MAX_BUCKET} AND b.rk <= {MAX_BUCKET}
)
SELECT doc_a, doc_b, hamming FROM cand
WHERE hamming <= {SIMHASH_MAX_HAMMING}"""


# ---------------------------------------------------------------------------
# exact Jaccard verify: distributed hash join against the shingle dataset
# ---------------------------------------------------------------------------
SHINGLE_SEP = "\x1f"  # unit separator: can't appear in [a-z0-9 ] shingles


class ShingleSets:
    """map_batches stage: one (doc_id, sh: string) row per doc — the
    doc's distinct word-shingle set, sorted and SHINGLE_SEP-joined into a
    single string (Arrow's hash join doesn't carry list<> payload
    columns, and a flat binary column shuffles cheaper anyway)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        sets = [SHINGLE_SEP.join(sorted(shingles(t))) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sh": pa.array(sets, pa.string()),
            }
        )


def _candidate_shingle_pairs(
    sf_dir: str, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Shared verify-stage input: every MinHash candidate pair joined to
    BOTH members' shingle sets -> (doc_a, doc_b, est_jaccard, sh_a,
    sh_b).  Two chained safe_joins; exchanges stay proportional to the
    candidate count at any corpus size."""
    from ifctordf_ray.functions.kernels import safe_join

    # safe_join armors BOTH sides of each chained join: the candidate
    # stream's groupby.aggregate emits empty partitions as EMPTY-SCHEMA
    # blocks (the r2 16-partition failure), and a fully-empty documents
    # table yields ZERO blocks on the shingle side — either crashes Acero
    # inside Dataset.join when a hash partition gets only those.
    cand_schema = pa.schema(
        [
            ("doc_a", pa.int64()),
            ("doc_b", pa.int64()),
            ("est_jaccard", pa.float64()),
        ]
    )
    docs = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    sh = docs.map_batches(ShingleSets(), batch_format="pyarrow")

    sh_a = sh.map_batches(
        lambda t: pa.table({"da": t["doc_id"], "sh_a": t["sh"]}),
        batch_format="pyarrow",
    )
    sh_b = sh.map_batches(
        lambda t: pa.table({"db": t["doc_id"], "sh_b": t["sh"]}),
        batch_format="pyarrow",
    )
    j1 = safe_join(
        near_dup_pairs_minhash(sf_dir, threshold=0.0),
        cand_schema,
        sh_a,
        pa.schema([("da", pa.int64()), ("sh_a", pa.string())]),
        join_type="inner",
        on=("doc_a",),
        right_on=("da",),
        num_partitions=num_partitions,
    )
    j2 = safe_join(
        j1,
        cand_schema.append(pa.field("sh_a", pa.string())),
        sh_b,
        pa.schema([("db", pa.int64()), ("sh_b", pa.string())]),
        join_type="inner",
        on=("doc_b",),
        right_on=("db",),
        num_partitions=num_partitions,
    )
    return j2


def verified_near_dups(
    sf_dir: str, threshold: float = 0.5, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Full near-dup pipeline: LSH candidates -> exact n-gram Jaccard.

    The candidate pair stream is hash-joined (Dataset.join) against the
    per-doc shingle dataset twice (doc_a side, doc_b side); the corpus is
    never collected to the driver or broadcast whole — at 100x data both
    joins stay partitioned exchanges proportional to the candidate count.
    """
    j2 = _candidate_shingle_pairs(sf_dir, num_partitions)
    thresh = threshold

    def verify(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        jac = []
        for la, lb in zip(t["sh_a"].to_pylist(), t["sh_b"].to_pylist()):
            sa = set(la.split(SHINGLE_SEP)) if la else set()
            sb = set(lb.split(SHINGLE_SEP)) if lb else set()
            u = len(sa | sb)
            jac.append(len(sa & sb) / u if u else 0.0)
        out = pa.table(
            {
                "doc_a": t["doc_a"],
                "doc_b": t["doc_b"],
                "est_jaccard": t["est_jaccard"],
                "jaccard": pa.array(jac, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out["jaccard"], thresh))

    return j2.map_batches(verify, batch_format="pyarrow")


def containment_scores(
    sf_dir: str, threshold: float = 0.6, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Broder containment over the MinHash candidate pairs (quote /
    subset detection): C(A,B) = |A∩B| / |A|.  Unlike Jaccard, containment
    is asymmetric — a short document fully quoted inside a long one has
    C(short,long) ≈ 1 but low Jaccard — so both directions are emitted
    and pairs are kept when max(C_ab, C_ba) >= threshold.

    Same physical shape as verified_near_dups: the candidate stream is
    joined twice against the distributed shingle dataset; nothing
    corpus-sized touches the driver."""
    j2 = _candidate_shingle_pairs(sf_dir, num_partitions)
    thresh = threshold

    def score(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c_ab, c_ba = [], []
        for la, lb in zip(t["sh_a"].to_pylist(), t["sh_b"].to_pylist()):
            sa = set(la.split(SHINGLE_SEP)) if la else set()
            sb = set(lb.split(SHINGLE_SEP)) if lb else set()
            ninter = len(sa & sb)
            c_ab.append(ninter / len(sa) if sa else 0.0)
            c_ba.append(ninter / len(sb) if sb else 0.0)
        out = pa.table(
            {
                "doc_a": t["doc_a"],
                "doc_b": t["doc_b"],
                "containment_ab": pa.array(c_ab, pa.float64()),
                "containment_ba": pa.array(c_ba, pa.float64()),
            }
        )
        return out.filter(
            pc.greater_equal(
                pc.max_element_wise(out["containment_ab"], out["containment_ba"]),
                thresh,
            )
        )

    return j2.map_batches(score, batch_format="pyarrow")


def minhash_estimate_quality(
    sf_dir: str, num_partitions: int | None = None
) -> ray.data.Dataset:
    """(doc_a, doc_b, est_matches, exact_inter, exact_union): estimation
    quality of the MinHash sketch, per LSH candidate pair — the dedup
    index's analog of knn_recall: est_matches/NUM_PERM is the sketch's
    Jaccard estimate, exact_inter/exact_union the truth it estimates.
    The operator every production near-dedup needs when tuning NUM_PERM
    / band shape: plot |est - exact| against union size before betting a
    corpus-wide dedup threshold on the sketch.

    All columns integer-exact (est_jaccard is m/64 with 64 a power of
    two, so *NUM_PERM round-trips through float64 losslessly).  Same
    scale shape as verified_near_dups: two candidate-count-proportional
    hash joins, nothing corpus-sized on the driver."""
    import pyarrow.compute as pc

    j2 = _candidate_shingle_pairs(sf_dir, num_partitions)

    def score(t: pa.Table) -> pa.Table:
        inter, uni = [], []
        for la, lb in zip(t["sh_a"].to_pylist(), t["sh_b"].to_pylist()):
            sa = set(la.split(SHINGLE_SEP)) if la else set()
            sb = set(lb.split(SHINGLE_SEP)) if lb else set()
            inter.append(len(sa & sb))
            uni.append(len(sa | sb))
        est_m = pc.cast(
            pc.round(pc.multiply(t["est_jaccard"], float(NUM_PERM))),
            pa.int64(),
        )
        return pa.table(
            {
                "doc_a": t["doc_a"],
                "doc_b": t["doc_b"],
                "est_matches": est_m,
                "exact_inter": pa.array(inter, pa.int64()),
                "exact_union": pa.array(uni, pa.int64()),
            }
        )

    return j2.map_batches(score, batch_format="pyarrow")


def minhash_estimate_quality_sql() -> str:
    return f"""WITH {_shingle_cte()},
{_sig_cte()},
{_candidates_cte()},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS ninter
    FROM cand c
    JOIN sh s1 ON s1.doc_id = c.doc_a
    JOIN sh s2 ON s2.doc_id = c.doc_b AND s2.shingle = s1.shingle
    GROUP BY c.doc_a, c.doc_b
)
SELECT e.doc_a, e.doc_b,
       CAST(round(e.est_jaccard * {NUM_PERM}) AS BIGINT) AS est_matches,
       CAST(coalesce(i.ninter, 0) AS BIGINT) AS exact_inter,
       CAST(coalesce(na.n, 0) + coalesce(nb.n, 0)
            - coalesce(i.ninter, 0) AS BIGINT) AS exact_union
FROM est e
LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
LEFT JOIN sizes na ON na.doc_id = e.doc_a
LEFT JOIN sizes nb ON nb.doc_id = e.doc_b"""


def containment_scores_sql(threshold: float = 0.6) -> str:
    return f"""WITH {_shingle_cte()},
{_sig_cte()},
{_candidates_cte()},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS ninter
    FROM cand c
    JOIN sh s1 ON s1.doc_id = c.doc_a
    JOIN sh s2 ON s2.doc_id = c.doc_b AND s2.shingle = s1.shingle
    GROUP BY c.doc_a, c.doc_b
),
cont AS (
    SELECT e.doc_a, e.doc_b,
           CASE WHEN coalesce(na.n, 0) = 0 THEN 0.0
                ELSE coalesce(i.ninter, 0) * 1.0 / na.n END AS containment_ab,
           CASE WHEN coalesce(nb.n, 0) = 0 THEN 0.0
                ELSE coalesce(i.ninter, 0) * 1.0 / nb.n END AS containment_ba
    FROM est e
    LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
    LEFT JOIN sizes na ON na.doc_id = e.doc_a
    LEFT JOIN sizes nb ON nb.doc_id = e.doc_b
)
SELECT doc_a, doc_b, containment_ab, containment_ba
FROM cont
WHERE greatest(containment_ab, containment_ba) >= {threshold}"""


def verified_near_dups_sql(threshold: float = 0.5) -> str:
    return f"""WITH {_shingle_cte()},
{_sig_cte()},
{_candidates_cte()},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS ninter
    FROM cand c
    JOIN sh s1 ON s1.doc_id = c.doc_a
    JOIN sh s2 ON s2.doc_id = c.doc_b AND s2.shingle = s1.shingle
    GROUP BY c.doc_a, c.doc_b
),
jac AS (
    SELECT e.doc_a, e.doc_b, e.est_jaccard,
           CASE WHEN coalesce(na.n, 0) + coalesce(nb.n, 0) - coalesce(i.ninter, 0) = 0
                THEN 0.0
                ELSE coalesce(i.ninter, 0) * 1.0 /
                     (coalesce(na.n, 0) + coalesce(nb.n, 0) - coalesce(i.ninter, 0))
           END AS jaccard
    FROM est e
    LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
    LEFT JOIN sizes na ON na.doc_id = e.doc_a
    LEFT JOIN sizes nb ON nb.doc_id = e.doc_b
)
SELECT doc_a, doc_b, est_jaccard, jaccard FROM jac WHERE jaccard >= {threshold}"""


# ---------------------------------------------------------------------------
# exact dedup (SQL-oracle-able)
# ---------------------------------------------------------------------------
def exact_duplicates(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup groups by canonical fingerprint: keeper = min doc_id
    (first-seen-wins analog of resolveDuplicates)."""
    from ifctordf_ray.stages.textstats import Fingerprinter

    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    fps = ds.map_batches(Fingerprinter, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0)
    return fps.groupby("fingerprint").aggregate(
        Min("doc_id", alias_name="keep_doc_id"),
        Count(alias_name="n_docs"),
    )


def deduped_doc_ids(sf_dir: str, num_partitions: int | None = None) -> ray.data.Dataset:
    """The APPLIED exact dedup: the surviving doc ids after dropping every
    non-first duplicate — what a training-data pipeline actually feeds
    downstream.  Physical shape: fingerprint map -> groupby(min) keepers
    -> hash join back on fingerprint -> keep rows where doc_id is the
    keeper.  Both sides distributed; no driver state."""
    from ifctordf_ray.stages.textstats import Fingerprinter

    ds = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    fps = ds.map_batches(Fingerprinter, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0)
    from ifctordf_ray.functions.kernels import safe_join

    # safe_join: keepers is a groupby output (empty partitions are
    # zero-column blocks) and a fully-empty documents table makes the fps
    # side ZERO blocks — both crash the join's schema broadcast unarmored.
    keepers = fps.groupby("fingerprint").aggregate(
        Min("doc_id", alias_name="keep_doc_id")
    ).map_batches(
        lambda t: pa.table(
            {"fp": t["fingerprint"], "keep_doc_id": t["keep_doc_id"]}
        ),
        batch_format="pyarrow",
    )
    joined = safe_join(
        fps,
        pa.schema([("doc_id", pa.int64()), ("fingerprint", pa.string())]),
        keepers,
        pa.schema([("fp", pa.string()), ("keep_doc_id", pa.int64())]),
        join_type="inner",
        on=("fingerprint",),
        right_on=("fp",),
        num_partitions=num_partitions,
    )

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["doc_id"], t["keep_doc_id"])).select(["doc_id"])

    return joined.map_batches(keep, batch_format="pyarrow")


def deduped_doc_ids_sql() -> str:
    return r"""
    SELECT doc_id FROM (
        SELECT doc_id, min(doc_id) OVER (
            PARTITION BY md5(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g'))
        ) AS keep
        FROM documents
    ) WHERE doc_id = keep
    """


def exact_duplicates_sql() -> str:
    return r"""
    SELECT md5(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')) AS fingerprint,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_docs
    FROM documents
    GROUP BY 1
    """


# ---------------------------------------------------------------------------
# Near-dup clustering: connected components over the verified pair graph
# (distributed min-label propagation — the iterative operator Ray Data
# has no primitive for), plus the APPLIED cluster-keeper dedup.
# ---------------------------------------------------------------------------
_LAB_SCHEMA = pa.schema([("doc", pa.int64()), ("label", pa.int64())])


def min_label_components(
    pairs: ray.data.Dataset,
    a_col: str,
    b_col: str,
    ids: ray.data.Dataset,
    id_col: str,
    max_iters: int = 25,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Generic distributed connected components over an undirected pair
    graph: -> (id_col, cluster_id) for EVERY row of `ids` (singletons
    label themselves).  Iterative min-label propagation; per round one
    edges-x-labels hash join + a groupby(min); converged when the exact
    integer label sum is unchanged (labels only decrease).  Edge/label
    state is O(pair endpoints) — legitimate iterative state, never
    corpus-sized; `ids` is touched once by the final left join."""
    from ifctordf_ray.functions.kernels import join_ready
    from ifctordf_ray.tuning import join_kwargs

    jk = join_kwargs(num_partitions)

    def sym(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [t[a_col].combine_chunks().cast(pa.int64()),
                     t[b_col].combine_chunks().cast(pa.int64())]
                ),
                "dst": pa.concat_arrays(
                    [t[b_col].combine_chunks().cast(pa.int64()),
                     t[a_col].combine_chunks().cast(pa.int64())]
                ),
            }
        )

    edges = join_ready(
        pairs.map_batches(sym, batch_format="pyarrow"),
        pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
        sentinel_row={"src": -1, "dst": -1},
    ).materialize()  # O(pairs), reused every round

    labels = join_ready(
        edges.map_batches(
            lambda t: pa.table({"doc": t["src"], "label": t["src"]}),
            batch_format="pyarrow",
        )
        .groupby("doc")
        .aggregate(Min("label", alias_name="label")),
        _LAB_SCHEMA,
        sentinel_row={"doc": -1, "label": -1},
    ).materialize()

    def _part_sums(t: pa.Table) -> pa.Table:
        # exact per-block Python-int partial sums shipped as DECIMAL
        # STRINGS: md5-derived int64 labels overflow int64 under Sum()
        # (Ray's reduce then falls back to pickled-object blocks — seen
        # as 'sum(label)' ArrowConversion noise in gate logs); Python
        # ints are arbitrary-precision, so the exact-sum convergence
        # invariant is preserved with block-count-sized driver state.
        vals = t["label"].to_numpy(zero_copy_only=False)
        total = int(vals.astype(object).sum()) if len(vals) else 0
        return pa.table({"s": pa.array([str(total)], pa.string())})

    def _exact_sum(ds: ray.data.Dataset) -> int:
        parts = ds.map_batches(_part_sums, batch_format="pyarrow").take_all()
        return sum(int(r["s"]) for r in parts)

    prev_sum: int | None = None
    for _ in range(max_iters):
        cand = edges.join(
            labels, join_type="inner", on=("src",), right_on=("doc",), **jk
        ).map_batches(
            lambda t: pa.table({"doc": t["dst"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        new_labels = join_ready(
            labels.union(cand).groupby("doc").aggregate(
                Min("label", alias_name="label")
            ),
            _LAB_SCHEMA,
            sentinel_row={"doc": -1, "label": -1},
        ).materialize()
        s = _exact_sum(new_labels)
        labels = new_labels
        if s == prev_sum:
            break
        prev_sum = s

    # safe_join: `ids` is a raw parquet read — a fully-empty table yields
    # ZERO blocks, which loses the join's schema broadcast (kernels.safe_join)
    from ifctordf_ray.functions.kernels import safe_join

    joined = safe_join(
        ids,
        pa.schema([(id_col, pa.int64())]),
        labels,
        _LAB_SCHEMA,
        join_type="left_outer",
        on=(id_col,),
        right_on=("doc",),
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cid = pc.coalesce(t["label"], t[id_col]).cast(pa.int64())
        return pa.table({id_col: t[id_col], "cluster_id": cid})

    return joined.map_batches(finish, batch_format="pyarrow")


def near_dup_clusters(
    sf_dir: str,
    threshold: float = 0.5,
    max_iters: int = 25,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """(doc_id, cluster_id) for every document; cluster_id = min doc_id
    of the doc's connected component in the verified-near-dup graph
    (singletons map to themselves).

    Physical shape: iterative min-label propagation — per round one
    hash join (edges x labels) + a groupby(min) — until the label sum is
    a fixed point (labels only decrease, so an unchanged exact integer
    sum IS convergence).  Rounds needed = graph diameter; near-dup
    components are tiny cliques in practice, so 2-4 rounds.

    Scale notes: see min_label_components (shared with the embedding
    variant, similarity.near_dup_clusters_emb)."""
    pairs = verified_near_dups(sf_dir, threshold=threshold)
    docs = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return min_label_components(
        pairs, "doc_a", "doc_b", docs, "doc_id",
        max_iters=max_iters, num_partitions=num_partitions,
    )


def near_dup_clusters_sql(threshold: float = 0.5) -> str:
    """Oracle: transitive closure via WITH RECURSIVE (min reachable
    label per node), singletons filled by a left join."""
    return f"""WITH RECURSIVE v AS ({verified_near_dups_sql(threshold)}),
e AS (
    SELECT doc_a AS a, doc_b AS b FROM v
    UNION ALL
    SELECT doc_b, doc_a FROM v
),
reach(doc, lbl) AS (
    SELECT a, a FROM e
    UNION
    SELECT e.b, r.lbl FROM reach r JOIN e ON e.a = r.doc
),
comp AS (SELECT doc, min(lbl) AS cluster_id FROM reach GROUP BY doc)
SELECT d.doc_id, CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
FROM documents d LEFT JOIN comp c ON c.doc = d.doc_id"""


def near_dedup_doc_ids(
    sf_dir: str, threshold: float = 0.5
) -> ray.data.Dataset:
    """APPLIED near-dup dedup: the surviving doc ids — one keeper (the
    min doc_id) per near-dup cluster, all singletons kept."""
    clusters = near_dup_clusters(sf_dir, threshold=threshold)

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["doc_id"], t["cluster_id"])).select(["doc_id"])

    return clusters.map_batches(keep, batch_format="pyarrow")


def near_dedup_doc_ids_sql(threshold: float = 0.5) -> str:
    return (
        near_dup_clusters_sql(threshold)
        .replace(
            "SELECT d.doc_id, CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id",
            "SELECT d.doc_id",
        )
        + "\nWHERE coalesce(c.cluster_id, d.doc_id) = d.doc_id"
    )


# ---------------------------------------------------------------------------
# Duplicate-rate report by language: the corpus-quality dashboard number
# a dedup pass is judged by.  Two chained aggregations — (lang, fp)
# group sizes, then per-lang totals — no join: the second groupby runs
# over the (already aggregated) distinct-fingerprint table.
# ---------------------------------------------------------------------------
class _LangFingerprint:
    """(lang, fingerprint) per doc — same canonical form as
    textstats.Fingerprinter (md5 of lowercased, whitespace-collapsed)."""

    def __init__(self):
        import re as _re

        self.ws_re = _re.compile(r"\s+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib as _hl

        fps = [
            _hl.md5(self.ws_re.sub(" ", (t or "").lower()).encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {"lang": batch["lang"], "fingerprint": pa.array(fps, pa.string())}
        )


def dup_rate_by_lang(sf_dir: str) -> ray.data.Dataset:
    """(lang, n_docs, dup_docs, dup_excess, dup_rate): within-language
    exact-duplicate statistics.  dup_docs counts every member of a
    multi-doc fingerprint group; dup_excess counts the removable copies;
    dup_rate = dup_docs / n_docs (single IEEE division)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum as _Sum

    ds = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )
    groups = (
        ds.map_batches(_LangFingerprint, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0)
        .groupby(["lang", "fingerprint"])
        .aggregate(Count(alias_name="n"))
    )

    def widen(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n"], pa.int64())
        is_dup = pc.greater(n, 1)
        zero = pa.scalar(0, pa.int64())
        return pa.table(
            {
                "lang": t["lang"],
                "n_docs": n,
                "dup_docs": pc.if_else(is_dup, n, zero),
                "dup_excess": pc.if_else(is_dup, pc.subtract(n, 1), zero),
            }
        )

    agg = (
        groups.map_batches(widen, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            _Sum("n_docs", alias_name="n_docs"),
            _Sum("dup_docs", alias_name="dup_docs"),
            _Sum("dup_excess", alias_name="dup_excess"),
        )
    )

    def rate(t: pa.Table) -> pa.Table:
        return t.append_column(
            "dup_rate",
            pc.divide(
                pc.cast(t["dup_docs"], pa.float64()),
                pc.cast(t["n_docs"], pa.float64()),
            ),
        )

    return agg.map_batches(rate, batch_format="pyarrow")


def dup_rate_by_lang_sql() -> str:
    return r"""
    WITH g AS (
        SELECT lang,
               md5(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')) AS fp,
               CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY lang, fp
    )
    SELECT lang,
           CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS dup_docs,
           CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT) AS dup_excess,
           CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS DOUBLE)
             / CAST(sum(n) AS DOUBLE) AS dup_rate
    FROM g GROUP BY lang
    """


# ---------------------------------------------------------------------------
# Benchmark decontamination: flag corpus docs sharing any word-shingle
# with a held-out eval set — the contamination screen every training-data
# pipeline runs before a model sees the corpus.  Eval membership here is
# deterministic (doc_id % DECON_EVAL_MOD == 0), standing in for an
# external fixed benchmark; by definition that side is tiny relative to
# the corpus, but the join is fully distributed anyway (shingle-level
# inner join, one groupby), so the operator does not depend on the eval
# set fitting anywhere.  Each side reads + shingles only its own docs
# (no shared-lineage double execution).
# ---------------------------------------------------------------------------
DECON_EVAL_MOD = 50


class _ShingleRows:
    """Actor-pool stage: per-doc DISTINCT word-k-shingles as flat
    (doc_id, shingle) rows — regex compiled once per actor."""

    def __init__(self):
        self.k = SHINGLE_K

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, shs = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for s in shingles(t, self.k):
                ids.append(d)
                shs.append(s)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "shingle": pa.array(shs, pa.string())}
        )


def decontaminate(sf_dir: str, num_partitions: int | None = None) -> ray.data.Dataset:
    """(doc_id, n_hits): corpus docs (doc_id % 50 != 0) that share >= 1
    distinct shingle with the eval set (doc_id % 50 == 0); n_hits =
    number of distinct shared shingles."""
    import pyarrow.compute as pc

    from ifctordf_ray.functions.kernels import join_ready
    from ifctordf_ray.tuning import join_kwargs

    def side(keep_eval: bool):
        ds = _clean_read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )

        def filt(t: pa.Table) -> pa.Table:
            # doc_id % MOD via truncating integer divide (pyarrow has no
            # modulo kernel); doc_id >= 0 so truncation == floor
            d = t["doc_id"]
            q = pc.multiply(pc.divide(d, DECON_EVAL_MOD), DECON_EVAL_MOD)
            m = pc.equal(pc.subtract(d, q), 0)
            return t.filter(m if keep_eval else pc.invert(m))

        return ds.map_batches(filt, batch_format="pyarrow").map_batches(
            _ShingleRows, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0
        )

    ev = (
        side(keep_eval=True)
        .groupby("shingle")
        .aggregate(Count(alias_name="_n"))
        .map_batches(
            lambda t: pa.table({"ev_shingle": t["shingle"]}), batch_format="pyarrow"
        )
    )
    ev = join_ready(
        ev,
        pa.schema([("ev_shingle", pa.string())]),
        sentinel_row={"ev_shingle": "\x00decon"},
    )
    co = join_ready(
        side(keep_eval=False),
        pa.schema([("doc_id", pa.int64()), ("shingle", pa.string())]),
        sentinel_row={"doc_id": -1, "shingle": "\x00decon2"},
    )
    hits = co.join(
        ev,
        join_type="inner",
        on=("shingle",),
        right_on=("ev_shingle",),
        **join_kwargs(num_partitions),
    )
    return (
        hits.groupby("doc_id")
        .aggregate(Count(alias_name="n_hits"))
        .map_batches(
            lambda t: t.filter(pc.not_equal(t["doc_id"], -1)),
            batch_format="pyarrow",
        )
    )


def decontaminate_sql() -> str:
    return f"""WITH {_shingle_cte()},
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {DECON_EVAL_MOD} = 0),
co AS (SELECT doc_id, shingle FROM sh WHERE doc_id % {DECON_EVAL_MOD} <> 0)
SELECT co.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM co JOIN ev USING (shingle)
GROUP BY co.doc_id"""


# ---------------------------------------------------------------------------
# Duplicated-SPAN measurement: the ExactSubstr-dedup shape ("Deduplicating
# Training Data Makes Language Models Better", Lee et al. 2022), in TWO
# tiers:
#
# - dup_span_stats (below): the cheap stride-grid SCREEN — duplicated
#   spans are detected only when aligned to the stride grid in both
#   copies (misses cross-offset duplicates), at 1/stride of the rows.
# - dup_span_exact (further below): the EXACT tier — stride-1 L-grams.
#   A character span of length >= L duplicated between two documents
#   always contains a duplicated L-gram in BOTH copies, so per-doc
#   duplicated-gram counts (and "has any duplicated span >= L") are
#   exact, with ONE corpus-sized groupby exchange and no global suffix
#   structure (Lee et al. pay a shared suffix array for the same
#   guarantee; the distributed trade is rows = total chars).
#
# Emits per-doc counters a curation pass thresholds on
# (n_dup / n_total = duplicated-text fraction).
#
# Both engines slice by CODEPOINT (pyarrow utf8_slice_codeunits on a
# utf8 array, DuckDB substr on VARCHAR), so parity holds on non-ASCII
# text too.
# ---------------------------------------------------------------------------
SPAN_LEN = 16
SPAN_STRIDE = 4


def _span_grid(t: pa.Table, span_len: int, stride: int) -> pa.Table:
    """(doc_id, sh): every span_len-char window at stride positions.
    One vectorized full-column slice per grid offset (max_len/stride
    kernel calls per batch), never a per-row Python loop.  Plain task
    fn (stateless) — keeps the stage a task pool, which composes safely
    with the downstream join aggregators in small sessions."""
    import pyarrow.compute as pc

    txt = t["text"].combine_chunks()
    n = pc.utf8_length(txt)
    max_len = pc.max(n).as_py() or 0
    parts = []
    k = 0
    while k * stride + span_len <= max_len:
        start = k * stride
        mask = pc.greater_equal(n, start + span_len)
        sub = pc.utf8_slice_codeunits(
            txt, start=start, stop=start + span_len
        )
        parts.append(
            pa.table(
                {
                    "doc_id": t["doc_id"].filter(mask),
                    "sh": sub.filter(mask),
                }
            )
        )
        k += 1
    if not parts:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "sh": pa.array([], pa.string()),
            }
        )
    return pa.concat_tables(parts)


def dup_span_stats(
    sf_dir: str,
    span_len: int = SPAN_LEN,
    stride: int = SPAN_STRIDE,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """(doc_id, n_grid, n_dup_grid): per document, how many of its grid
    windows also occur VERBATIM in at least one other document.  Docs
    shorter than span_len have no grid and are absent (same WHERE in the
    oracle).  The grid stream is consumed via lineage recompute (three
    consumers), never materialized — it is corpus-sized."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum as _Sum

    from ifctordf_ray.functions.kernels import safe_join

    ds = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pos = ds.map_batches(
        _span_grid,
        fn_kwargs={"span_len": span_len, "stride": stride},
        batch_format="pyarrow",
    )
    # one row per DISTINCT (window, doc) + its in-doc occurrence count
    pairs = pos.groupby(["sh", "doc_id"]).aggregate(
        Count(alias_name="npos")
    )
    pair_schema = pa.schema(
        [("sh", pa.string()), ("doc_id", pa.int64()), ("npos", pa.int64())]
    )

    # windows shared by >= 2 distinct docs
    dup_sh = (
        pairs.groupby("sh")
        .aggregate(Count(alias_name="ndocs"))
        .map_batches(
            lambda t: pa.table(
                {"shd": t.filter(pc.greater_equal(t["ndocs"], 2))["sh"]}
            ),
            batch_format="pyarrow",
        )
    )

    total = pairs.groupby("doc_id").aggregate(
        _Sum("npos", alias_name="n_grid")
    )
    dup_per_doc = (
        safe_join(
            pairs,
            pair_schema,
            dup_sh,
            pa.schema([("shd", pa.string())]),
            join_type="inner",
            on=("sh",),
            right_on=("shd",),
            num_partitions=num_partitions,
        )
        .groupby("doc_id")
        .aggregate(_Sum("npos", alias_name="n_dup_grid"))
        .materialize()  # doc-count-sized; splits the chained-join plan
    )
    res = safe_join(
        total,
        pa.schema([("doc_id", pa.int64()), ("n_grid", pa.int64())]),
        dup_per_doc.map_batches(
            lambda t: pa.table(
                {"did": t["doc_id"], "n_dup_grid": t["n_dup_grid"]}
            ),
            batch_format="pyarrow",
        ),
        pa.schema([("did", pa.int64()), ("n_dup_grid", pa.int64())]),
        join_type="left_outer",
        on=("doc_id",),
        right_on=("did",),
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_grid": t["n_grid"],
                "n_dup_grid": pc.fill_null(
                    t["n_dup_grid"], pa.scalar(0, pa.int64())
                ),
            }
        )

    return res.map_batches(finish, batch_format="pyarrow")


def dup_span_exact(
    sf_dir: str,
    span_len: int = SPAN_LEN,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """(doc_id, n_grams, n_dup_grams): EXACT duplicated-span measurement —
    per document, how many of its DISTINCT span_len-char grams (stride 1)
    also occur verbatim in at least one other document.

    Exactness argument: any character span of length >= span_len shared
    verbatim by two documents contains, in each copy, every one of its
    stride-1 grams — in particular its first span_len-gram — so a doc
    has n_dup_grams > 0 IFF it shares a span >= span_len with another
    doc, with no alignment blind spot (the stride-grid sibling above
    misses duplicates whose copies sit at different offsets mod stride).

    Physical shape (all streaming, one corpus-sized exchange):
    stride-1 _span_grid -> distinct (gram, doc) via groupby -> gram
    doc-frequency -> semi-join back -> per-doc counts.  The exchange
    moves ~one (16-char gram, doc_id) row per character of text — the
    honest cost of exactness; run the grid screen first and this tier
    only on the screened-in partition when 16x row volume matters."""
    import pyarrow.compute as pc

    from ifctordf_ray.functions.kernels import safe_join

    ds = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pos = ds.map_batches(
        _span_grid,
        fn_kwargs={"span_len": span_len, "stride": 1},
        batch_format="pyarrow",
    )
    # distinct (gram, doc) — Count is unused, the groupby IS the distinct
    pairs = pos.groupby(["sh", "doc_id"]).aggregate(Count(alias_name="npos"))
    pair_schema = pa.schema(
        [("sh", pa.string()), ("doc_id", pa.int64()), ("npos", pa.int64())]
    )
    dup_sh = (
        pairs.groupby("sh")
        .aggregate(Count(alias_name="ndocs"))
        .map_batches(
            lambda t: pa.table(
                {"shd": t.filter(pc.greater_equal(t["ndocs"], 2))["sh"]}
            ),
            batch_format="pyarrow",
        )
    )
    total = pairs.groupby("doc_id").aggregate(Count(alias_name="n_grams"))
    dup_per_doc = (
        safe_join(
            pairs,
            pair_schema,
            dup_sh,
            pa.schema([("shd", pa.string())]),
            join_type="inner",
            on=("sh",),
            right_on=("shd",),
            num_partitions=num_partitions,
        )
        .groupby("doc_id")
        .aggregate(Count(alias_name="n_dup_grams"))
        .materialize()  # doc-count-sized; splits the chained-join plan
    )
    res = safe_join(
        total,
        pa.schema([("doc_id", pa.int64()), ("n_grams", pa.int64())]),
        dup_per_doc.map_batches(
            lambda t: pa.table(
                {"did": t["doc_id"], "n_dup_grams": t["n_dup_grams"]}
            ),
            batch_format="pyarrow",
        ),
        pa.schema([("did", pa.int64()), ("n_dup_grams", pa.int64())]),
        join_type="left_outer",
        on=("doc_id",),
        right_on=("did",),
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_grams": t["n_grams"],
                "n_dup_grams": pc.fill_null(
                    t["n_dup_grams"], pa.scalar(0, pa.int64())
                ),
            }
        )

    return res.map_batches(finish, batch_format="pyarrow")


def dup_span_exact_sql(span_len: int = SPAN_LEN) -> str:
    return f"""
    WITH g AS (
        SELECT DISTINCT doc_id,
               substr(text, CAST(k + 1 AS INTEGER), {span_len}) AS sh
        FROM (
            SELECT doc_id, coalesce(text, '') AS text FROM documents
        ), UNNEST(range(CAST(length(text) - {span_len} AS BIGINT) + 1)) AS u(k)
    ),
    dup AS (
        SELECT sh FROM (SELECT sh, count(*) AS c FROM g GROUP BY sh)
        WHERE c >= 2
    ),
    total AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
        FROM g GROUP BY doc_id
    ),
    dupd AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams
        FROM g WHERE sh IN (SELECT sh FROM dup)
        GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_grams,
           coalesce(d.n_dup_grams, CAST(0 AS BIGINT)) AS n_dup_grams
    FROM total t LEFT JOIN dupd d USING (doc_id)
    """


def dup_span_stats_sql(
    span_len: int = SPAN_LEN, stride: int = SPAN_STRIDE
) -> str:
    return f"""
    WITH g AS (
        SELECT doc_id,
               substr(text, CAST(k * {stride} + 1 AS INTEGER),
                      {span_len}) AS sh
        FROM (
            SELECT doc_id, coalesce(text, '') AS text FROM documents
        ), UNNEST(range(
            CAST(floor((length(text) - {span_len}) / {stride}.0)
                 AS BIGINT) + 1
        )) AS u(k)
    ),
    pairs AS (
        SELECT sh, doc_id, CAST(count(*) AS BIGINT) AS npos
        FROM g GROUP BY sh, doc_id
    ),
    dup AS (
        SELECT sh FROM (SELECT sh, count(*) AS c FROM pairs GROUP BY sh)
        WHERE c >= 2
    ),
    total AS (
        SELECT doc_id, CAST(sum(npos) AS BIGINT) AS n_grid
        FROM pairs GROUP BY doc_id
    ),
    dupd AS (
        SELECT doc_id, CAST(sum(npos) AS BIGINT) AS n_dup_grid
        FROM pairs WHERE sh IN (SELECT sh FROM dup)
        GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_grid,
           coalesce(d.n_dup_grid, CAST(0 AS BIGINT)) AS n_dup_grid
    FROM total t LEFT JOIN dupd d USING (doc_id)
    """


# ---------------------------------------------------------------------------
# Quality-aware cluster keepers: instead of first-seen-wins, keep the
# BEST document of every near-dup cluster by model quality score — the
# curation upgrade most production dedup passes apply (e.g. keep the
# longest/cleanest copy of a boilerplate family).  Deterministic:
# argmax(score_micro), ties to the lowest doc_id.
#
# Scale shape: clusters come from the iterative min-label components
# (already join-based and bounded); the score side is a narrow
# broadcast-weight inference map; ONE safe_join on doc_id (clusters
# materialized first — doc-count-sized — to split the chained-join
# plan, the same recipe as dup_span_stats above) and ONE
# groupby(cluster) whose groups are near-dup cliques (tiny).
# ---------------------------------------------------------------------------
def cluster_keepers(
    sf_dir: str,
    threshold: float = 0.5,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """(cluster_id, keeper_doc_id, keeper_score_micro, n_members): the
    quality-argmax representative of every near-dup cluster."""
    from ifctordf_ray.functions.kernels import safe_join
    from ifctordf_ray.stages.textstats import model_scores

    clusters = near_dup_clusters(
        sf_dir, threshold=threshold, num_partitions=num_partitions
    ).materialize()  # doc-count-sized; splits the chained-join plan
    scores = model_scores(sf_dir)
    joined = safe_join(
        clusters,
        pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())]),
        scores.map_batches(
            lambda t: pa.table(
                {"sdoc": t["doc_id"], "score_micro": t["score_micro"]}
            ),
            batch_format="pyarrow",
        ),
        pa.schema([("sdoc", pa.int64()), ("score_micro", pa.int64())]),
        join_type="inner",
        on=("doc_id",),
        right_on=("sdoc",),
        num_partitions=num_partitions,
    )

    def pick(g: pa.Table) -> pa.Table:
        doc = g["doc_id"].to_numpy()
        sc = g["score_micro"].to_numpy()
        best = np.lexsort((doc, -sc))[0]
        return pa.table(
            {
                "cluster_id": g["cluster_id"][:1],
                "keeper_doc_id": pa.array([int(doc[best])], pa.int64()),
                "keeper_score_micro": pa.array([int(sc[best])], pa.int64()),
                "n_members": pa.array([g.num_rows], pa.int64()),
            }
        )

    return joined.groupby("cluster_id").map_groups(pick, batch_format="pyarrow")


def cluster_keepers_sql(threshold: float = 0.5) -> str:
    from ifctordf_ray.stages.textstats import model_scores_sql

    return f"""
    WITH clusters AS ({near_dup_clusters_sql(threshold)}),
    scores AS ({model_scores_sql()}),
    j AS (
        SELECT c.cluster_id, c.doc_id, s.score_micro
        FROM clusters c JOIN scores s USING (doc_id)
    ),
    r AS (
        SELECT *, row_number() OVER (
            PARTITION BY cluster_id
            ORDER BY score_micro DESC, doc_id ASC) AS rn,
               count(*) OVER (PARTITION BY cluster_id) AS n_members
        FROM j
    )
    SELECT cluster_id, doc_id AS keeper_doc_id,
           score_micro AS keeper_score_micro,
           CAST(n_members AS BIGINT) AS n_members
    FROM r WHERE rn = 1
    """


# ---------------------------------------------------------------------------
# Edit-distance verification of near-dup candidates: the second-stage
# verifier a dedup pipeline runs when Jaccard is too coarse (boilerplate
# with small patches) — exact Levenshtein distance over a bounded text
# prefix for every MinHash-LSH candidate pair, plus an exact-integer
# normalized similarity.  Byte-level DP (DuckDB's levenshtein() counts
# UTF-8 BYTES, measured: levenshtein('café','cafe') = 2).
#
# Scale shape: candidates are the banded-LSH output (pair-bounded, never
# corpus-sized); the texts of the involved docs are fetched by one
# streaming is_in scan (bounded by 2x pairs); the DP itself is
# pair-sized work, O(prefix^2) per pair.
# ---------------------------------------------------------------------------
LEV_PREFIX = 200  # chars of text compared (cost cap per pair)


def _lev_bytes(a: bytes, b: bytes) -> int:
    """Unit-cost Levenshtein over byte strings (two-row DP)."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
            )
        prev = cur
    return prev[-1]


def pair_edit_distance(
    sf_dir: str,
    threshold: float = 0.5,
    prefix: int = LEV_PREFIX,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """(doc_a, doc_b, lev_dist, sim_micro): exact prefix Levenshtein for
    every MinHash candidate pair; sim_micro = (max_len - d) * 1e6 //
    max_len (exact integers, 1e6 = identical prefixes).

    Fully distributed (the verified_near_dups shape): the candidate pair
    stream is hash-joined against the per-doc text-prefix dataset twice
    (doc_a side, doc_b side), then the O(prefix^2) DP runs inside
    map_batches.  Nothing pair-count- or corpus-sized ever touches the
    driver — at web scale the near-dup pair count is unbounded, so a
    take_all() of the pairs (the r3 shape) is not.
    """
    from ifctordf_ray.functions.kernels import safe_join

    cand_schema = pa.schema(
        [
            ("doc_a", pa.int64()),
            ("doc_b", pa.int64()),
            ("est_jaccard", pa.float64()),
        ]
    )

    def prefixes(side: str, key: str):
        def fn(t: pa.Table) -> pa.Table:
            pfx = [
                (x or "")[:prefix].encode("utf-8") for x in t["text"].to_pylist()
            ]
            return pa.table(
                {key: t["doc_id"], f"pfx_{side}": pa.array(pfx, pa.binary())}
            )

        return fn

    docs = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pfx_a = docs.map_batches(prefixes("a", "da"), batch_format="pyarrow")
    pfx_b = docs.map_batches(prefixes("b", "db"), batch_format="pyarrow")
    j1 = safe_join(
        near_dup_pairs_minhash(sf_dir, threshold=threshold),
        cand_schema,
        pfx_a,
        pa.schema([("da", pa.int64()), ("pfx_a", pa.binary())]),
        join_type="inner",
        on=("doc_a",),
        right_on=("da",),
        num_partitions=num_partitions,
    )
    j2 = safe_join(
        j1,
        cand_schema.append(pa.field("pfx_a", pa.binary())),
        pfx_b,
        pa.schema([("db", pa.int64()), ("pfx_b", pa.binary())]),
        join_type="inner",
        on=("doc_b",),
        right_on=("db",),
        num_partitions=num_partitions,
    )

    def lev(t: pa.Table) -> pa.Table:
        out_d, out_s = [], []
        for a, b in zip(t["pfx_a"].to_pylist(), t["pfx_b"].to_pylist()):
            a = a or b""
            b_ = b or b""
            d = _lev_bytes(a, b_)
            ml = max(len(a), len(b_))
            out_d.append(d)
            out_s.append((ml - d) * 1_000_000 // ml if ml else 1_000_000)
        return pa.table(
            {
                "doc_a": t["doc_a"],
                "doc_b": t["doc_b"],
                "lev_dist": pa.array(out_d, pa.int64()),
                "sim_micro": pa.array(out_s, pa.int64()),
            }
        )

    return j2.map_batches(lev, batch_format="pyarrow")


def pair_edit_distance_sql(threshold: float = 0.5, prefix: int = LEV_PREFIX) -> str:
    return f"""
    WITH cand AS ({near_dup_pairs_minhash_sql(threshold)}),
    d AS (
        SELECT c.doc_a, c.doc_b,
               CAST(levenshtein(substr(coalesce(ta.text, ''), 1, {prefix}),
                                substr(coalesce(tb.text, ''), 1, {prefix}))
                    AS BIGINT) AS lev_dist,
               CAST(greatest(
                   strlen(substr(coalesce(ta.text, ''), 1, {prefix})),
                   strlen(substr(coalesce(tb.text, ''), 1, {prefix})))
                    AS BIGINT) AS max_len  -- strlen() = BYTE length
        FROM cand c
        JOIN documents ta ON ta.doc_id = c.doc_a
        JOIN documents tb ON tb.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, lev_dist,
           CAST(CASE WHEN max_len = 0 THEN 1000000
                ELSE (max_len - lev_dist) * 1000000 // max_len
                END AS BIGINT) AS sim_micro
    FROM d
    """


# ---------------------------------------------------------------------------
# Paragraph-level (sub-document) dedup: C4/RefinedWeb-style duplicate-
# segment accounting.  Doc-level dedup (exact_duplicates /
# verified_near_dups above) misses boilerplate shared BETWEEN otherwise-
# distinct documents; this operator segments every doc into fixed
# SEG_WORDS-word windows, hashes each, and scores each doc by the share
# of its segments that also appear in at least one OTHER document.
# Reference analog: per-statement (not per-file) dedup granularity of
# resolveDuplicates (IfcSpfParser.java:147-165).
# ---------------------------------------------------------------------------
SEG_WORDS = 10
_SEG_MOD = (1 << 63) - 1  # fits BIGINT both engines; any collision hits
#                           both sides identically (same hash spec)
PARA_MAX_RATIO = 0.5


def _segments_fn(batch: pa.Table) -> pa.Table:
    """Explode docs into (doc_id, seg_h) rows — one per consecutive
    SEG_WORDS-word window (ragged tail kept, same as the SQL arm).
    Per-doc Python segmentation, same convention as MinHasher."""
    doc_ids: list[int] = []
    hashes: list[int] = []
    for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        words = re.findall(WORD_RE, (text or "").lower())
        for i in range(0, len(words), SEG_WORDS):
            doc_ids.append(did)
            hashes.append(
                int(_stable_hash64(" ".join(words[i : i + SEG_WORDS])) % _SEG_MOD)
            )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "seg_h": pa.array(hashes, pa.int64()),
        }
    )


def paragraph_dedup(
    sf_dir: str, max_ratio: float = PARA_MAX_RATIO, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Per-doc duplicate-paragraph ratio + keep flag (ratio < max_ratio).

    A segment INSTANCE counts as duplicated iff its hash occurs in >1
    DISTINCT document (within-doc repetition alone is repetition_scores'
    job, not dedup).  Distributed plan: explode -> one (seg_h, doc_id)
    groupby (the only corpus-sized shuffle) -> bounded seg_h-keyed
    dup-key set -> two doc-count-sized joins back onto documents.  The
    (seg_h, doc_id)-distinct table is materialized because it feeds two
    consumers AND splits the chained-join plan (see module head / Ray
    deadlock note); at extreme scale the alternative is re-deriving it
    per consumer from the source read."""
    from ray.data.aggregate import Sum

    from ifctordf_ray.functions.kernels import safe_join

    seg = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_segments_fn, batch_format="pyarrow")

    inst = (
        seg.groupby(["seg_h", "doc_id"])
        .aggregate(Count(alias_name="n_inst"))
        .materialize()  # distinct-(seg,doc)-sized; consumed twice
    )
    dup_keys = (
        inst.groupby("seg_h")
        .aggregate(Count(alias_name="n_docs"))
        .map_batches(
            lambda t: pa.table(
                {"dup_seg_h": t.filter(pc.greater(t["n_docs"], 1))["seg_h"]}
            ),
            batch_format="pyarrow",
        )
    )
    inst_schema = pa.schema(
        [("seg_h", pa.int64()), ("doc_id", pa.int64()), ("n_inst", pa.int64())]
    )
    dup_schema = pa.schema([("dup_seg_h", pa.int64())])
    dup_per_doc = (
        safe_join(
            inst,
            inst_schema,
            dup_keys,
            dup_schema,
            join_type="inner",
            on=("seg_h",),
            right_on=("dup_seg_h",),
            num_partitions=num_partitions,
        )
        .groupby("doc_id")
        .aggregate(Sum("n_inst", alias_name="n_dup_segments"))
        .materialize()  # doc-count-sized; splits the chained-join plan
    )
    totals = (
        inst.groupby("doc_id")
        .aggregate(Sum("n_inst", alias_name="n_segments"))
        .map_batches(
            lambda t: pa.table(
                {"t_doc_id": t["doc_id"], "n_segments": t["n_segments"]}
            ),
            batch_format="pyarrow",
        )
    )
    docs = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    docs_schema = pa.schema([("doc_id", pa.int64())])
    tot_schema = pa.schema([("t_doc_id", pa.int64()), ("n_segments", pa.int64())])
    r1 = safe_join(
        docs,
        docs_schema,
        totals,
        tot_schema,
        join_type="left_outer",
        on=("doc_id",),
        right_on=("t_doc_id",),
        num_partitions=num_partitions,
    ).materialize()  # doc-count-sized; splits the chained-join plan
    # Dataset.join coalesces the right key column away: r1 blocks carry
    # only (doc_id, n_segments)
    r1_schema = pa.schema([("doc_id", pa.int64()), ("n_segments", pa.int64())])
    dup_named = dup_per_doc.map_batches(
        lambda t: pa.table(
            {"d_doc_id": t["doc_id"], "n_dup_segments": t["n_dup_segments"]}
        ),
        batch_format="pyarrow",
    )
    dpd_schema = pa.schema([("d_doc_id", pa.int64()), ("n_dup_segments", pa.int64())])
    r2 = safe_join(
        r1,
        r1_schema,
        dup_named,
        dpd_schema,
        join_type="left_outer",
        on=("doc_id",),
        right_on=("d_doc_id",),
        num_partitions=num_partitions,
    )

    mr = max_ratio

    def finish(t: pa.Table) -> pa.Table:
        n_seg = pc.coalesce(t["n_segments"], pa.scalar(0, pa.int64()))
        n_dup = pc.coalesce(t["n_dup_segments"], pa.scalar(0, pa.int64()))
        ratio = pc.if_else(
            pc.equal(n_seg, 0),
            pa.scalar(0.0, pa.float64()),
            pc.divide(pc.cast(n_dup, pa.float64()), pc.cast(n_seg, pa.float64())),
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_segments": n_seg,
                "n_dup_segments": n_dup,
                "dup_ratio": ratio,
                "keep": pc.less(ratio, mr),
            }
        )

    return r2.map_batches(finish, batch_format="pyarrow")


def paragraph_dedup_sql(max_ratio: float = PARA_MAX_RATIO) -> str:
    return f"""WITH wl AS (
    SELECT doc_id,
           regexp_extract_all(lower(coalesce(text, '')), '{WORD_RE}') AS ws
    FROM documents
),
seg AS (
    SELECT doc_id,
           CAST(md5_number_upper(array_to_string(ws[i*{SEG_WORDS}+1 : i*{SEG_WORDS}+{SEG_WORDS}], ' '))
                % {_SEG_MOD} AS BIGINT) AS seg_h
    FROM wl, UNNEST(range(CAST(ceil(len(ws) / {SEG_WORDS}.0) AS BIGINT))) AS t(i)
    WHERE len(ws) > 0
),
inst AS (SELECT doc_id, seg_h, count(*) AS n_inst FROM seg GROUP BY 1, 2),
nd AS (SELECT seg_h FROM inst GROUP BY seg_h HAVING count(*) > 1),
tot AS (SELECT doc_id, sum(n_inst) AS n_segments FROM inst GROUP BY 1),
dup AS (
    SELECT i.doc_id, sum(i.n_inst) AS n_dup
    FROM inst i JOIN nd USING (seg_h) GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(t.n_segments, 0) AS BIGINT) AS n_segments,
       CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup_segments,
       CASE WHEN coalesce(t.n_segments, 0) = 0 THEN 0.0
            ELSE coalesce(p.n_dup, 0) * 1.0 / t.n_segments END AS dup_ratio,
       (CASE WHEN coalesce(t.n_segments, 0) = 0 THEN 0.0
             ELSE coalesce(p.n_dup, 0) * 1.0 / t.n_segments END) < {max_ratio} AS keep
FROM documents d
LEFT JOIN tot t USING (doc_id)
LEFT JOIN dup p USING (doc_id)"""


# ---------------------------------------------------------------------------
# First-occurrence n-gram novelty — the curation signal "how much of
# this document's content has never been seen in any EARLIER document"
# (doc_id order = ingest order; Gopher/RefinedWeb-style freshness
# weighting uses exactly this shape).  A shingle instance is novel in
# the doc that owns its corpus-wide MIN doc_id.  Distributed plan: per-
# doc shingle-hash sets (map) -> one corpus-sized groupby(min) for the
# first-owner table -> one hash join back -> doc-sized rollup + a
# doc-count-sized left join onto documents.
# ---------------------------------------------------------------------------
class _DocShingleHashes:
    """Per-doc DISTINCT shingle hashes (mod-p, same spec as minhash —
    collisions hit the Ray side and the SQL oracle identically)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hs = [], []
        for i, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for h in {_stable_hash64(s) % _P31 for s in shingles(t)}:
                ids.append(i)
                hs.append(h)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "sh_h": pa.array(hs, pa.int64())}
        )


def ngram_novelty(sf_dir: str, num_partitions: int | None = None) -> ray.data.Dataset:
    """(doc_id, n_shingles, n_novel, novelty) for EVERY document;
    novelty = share of the doc's distinct shingles whose corpus-wide
    first owner (min doc_id) is this doc; shingle-free docs are
    vacuously novel (1.0)."""
    from ray.data.aggregate import Sum

    from ifctordf_ray.functions.kernels import safe_join

    inst = (
        _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(
            _DocShingleHashes, batch_format="pyarrow", concurrency=(1, 4),
            max_restarts=0,
        )
        .materialize()  # distinct-(doc,shingle)-sized; consumed twice
    )
    first = inst.groupby("sh_h").aggregate(Min("doc_id", alias_name="first_doc"))

    inst_schema = pa.schema([("doc_id", pa.int64()), ("sh_h", pa.int64())])
    first_schema = pa.schema([("sh_h", pa.int64()), ("first_doc", pa.int64())])
    per_doc = (
        safe_join(
            inst,
            inst_schema,
            first,
            first_schema,
            join_type="inner",
            on=("sh_h",),
            right_on=("sh_h",),
            num_partitions=num_partitions,
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"],
                    "one": pa.array(np.ones(len(t), np.int64)),
                    "novel": pc.cast(
                        pc.equal(t["doc_id"], t["first_doc"]), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("doc_id")
        .aggregate(
            Sum("one", alias_name="n_shingles"), Sum("novel", alias_name="n_novel")
        )
        .materialize()  # doc-count-sized; splits the chained-join plan
    )

    docs = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    docs_schema = pa.schema([("doc_id", pa.int64())])
    per_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_shingles", pa.int64()), ("n_novel", pa.int64())]
    )
    out = safe_join(
        docs,
        docs_schema,
        per_doc,
        per_schema,
        join_type="left_outer",
        on=("doc_id",),
        right_on=("doc_id",),
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        ns = pc.coalesce(t["n_shingles"], pa.scalar(0, pa.int64()))
        nv = pc.coalesce(t["n_novel"], pa.scalar(0, pa.int64()))
        novelty = pc.if_else(
            pc.greater(ns, 0),
            pc.divide(pc.cast(nv, pa.float64()), pc.cast(ns, pa.float64())),
            pa.scalar(1.0, pa.float64()),
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_shingles": pc.cast(ns, pa.int64()),
                "n_novel": pc.cast(nv, pa.int64()),
                "novelty": novelty,
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def ngram_novelty_sql() -> str:
    return f"""WITH {_shingle_cte()},
d AS (SELECT DISTINCT doc_id, h FROM hv),
f AS (SELECT h, min(doc_id) AS first_doc FROM d GROUP BY h),
per AS (
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN d.doc_id = f.first_doc THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel
    FROM d JOIN f ON d.h = f.h GROUP BY d.doc_id
)
SELECT doc.doc_id,
       coalesce(per.n_shingles, 0) AS n_shingles,
       coalesce(per.n_novel, 0) AS n_novel,
       CASE WHEN coalesce(per.n_shingles, 0) > 0
            THEN CAST(per.n_novel AS DOUBLE) / per.n_shingles
            ELSE 1.0 END AS novelty
FROM documents doc LEFT JOIN per ON per.doc_id = doc.doc_id"""


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking (entity-resolution candidate generation)
# ---------------------------------------------------------------------------
BLOCK_KEY_LEN = 12   # blocking key: first 12 normalized chars
BLOCK_WINDOW = 3     # each row pairs with the next 3 rows in sorted order
BLOCK_BUCKET_CHARS = 2  # range-partition prefix (lexicographic bucket order)

_BLOCK_PAIR_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("same_key", pa.bool_())]
)


def _blocking_narrow(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, bkey, bucket): blocking key = first BLOCK_KEY_LEN chars of
    the lowercased text with everything outside [a-z0-9 ] stripped; bucket
    = the key's BLOCK_BUCKET_CHARS-char prefix.  Keys are pure ASCII after
    the strip, so codeunit slicing == character slicing and the bucket
    order matches DuckDB's binary collation exactly."""
    ds = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def prep(t: pa.Table) -> pa.Table:
        key = pc.utf8_slice_codeunits(
            pc.replace_substring_regex(
                pc.utf8_lower(t["text"]), pattern="[^a-z0-9 ]", replacement=""
            ),
            0,
            BLOCK_KEY_LEN,
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bkey": key,
                "bucket": pc.utf8_slice_codeunits(key, 0, BLOCK_BUCKET_CHARS),
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow")


def blocking_pairs(sf_dir: str, window: int = BLOCK_WINDOW) -> ray.data.Dataset:
    """(doc_a, doc_b, same_key): sorted-neighborhood blocking (SNM, the
    classic entity-resolution candidate generator — Hernandez & Stolfo's
    merge/purge): sort all docs by (blocking key, doc_id) and emit every
    pair within a `window`-row sliding window of the GLOBAL sorted order.
    The reference's dedup is exact-key only (resolveDuplicates,
    IfcSpfParser.java:147-165); SNM is its fuzzy-blocking scale-up — near
    keys pair even when no shingle/band collides.

    Distributed shape (no global sort is ever materialized): docs are
    range-partitioned by key prefix; ONE groupby(bucket).map_groups both
    emits each bucket's border rows (first/last `window`, with in-bucket
    rank + bucket size) and is the driver's only collect — O(#buckets *
    window) rows, never corpus-sized.  The driver prefix-sums bucket
    sizes into global offsets, reconstructs the cross-boundary pairs from
    border rows alone (any pair spanning buckets has both ends within
    `window` of its bucket edge — gap arithmetic stays exact across
    EMPTY-middle and tiny buckets because offsets count all rows), and a
    second groupby(bucket).map_groups emits the in-bucket pairs fully in
    parallel.  Skew bound: one bucket = one task (same contract as every
    range partitioner here; widen BLOCK_BUCKET_CHARS for hot prefixes)."""
    narrow = _blocking_narrow(sf_dir)

    def borders(group: pa.Table) -> pa.Table:
        g = group.sort_by([("bkey", "ascending"), ("doc_id", "ascending")])
        n = g.num_rows
        idx = sorted(set(range(min(window, n))) | set(range(max(0, n - window), n)))
        sub = g.take(idx)
        return pa.table(
            {
                "doc_id": sub["doc_id"],
                "bkey": sub["bkey"],
                "bucket": sub["bucket"],
                "rank": pa.array(idx, pa.int64()),
                "bucket_n": pa.array([n] * len(idx), pa.int64()),
            }
        )

    border_rows = (
        narrow.groupby("bucket").map_groups(borders, batch_format="pyarrow").take_all()
    )

    # exclusive prefix sum of bucket sizes -> each bucket's global offset
    sizes = {r["bucket"]: r["bucket_n"] for r in border_rows}
    offsets: dict[str, int] = {}
    total = 0
    for b in sorted(sizes):
        offsets[b] = total
        total += sizes[b]

    ranked = sorted(
        border_rows, key=lambda r: offsets[r["bucket"]] + r["rank"]
    )
    doc_a, doc_b, same = [], [], []
    for i, ri in enumerate(ranked):
        gi = offsets[ri["bucket"]] + ri["rank"]
        for rj in ranked[i + 1 :]:
            gj = offsets[rj["bucket"]] + rj["rank"]
            if gj - gi > window:
                break
            if rj["bucket"] != ri["bucket"]:  # in-bucket pairs come from map_groups
                doc_a.append(ri["doc_id"])
                doc_b.append(rj["doc_id"])
                same.append(ri["bkey"] == rj["bkey"])
    cross = pa.table(
        {
            "doc_a": pa.array(doc_a, pa.int64()),
            "doc_b": pa.array(doc_b, pa.int64()),
            "same_key": pa.array(same, pa.bool_()),
        },
        schema=_BLOCK_PAIR_SCHEMA,
    )

    def in_bucket(group: pa.Table) -> pa.Table:
        g = group.sort_by([("bkey", "ascending"), ("doc_id", "ascending")])
        ids = g["doc_id"].combine_chunks()
        keys = g["bkey"].combine_chunks()
        n = len(ids)
        parts = []
        for w in range(1, window + 1):
            if n <= w:
                break
            parts.append(
                pa.table(
                    {
                        "doc_a": ids.slice(0, n - w),
                        "doc_b": ids.slice(w),
                        "same_key": pc.equal(keys.slice(0, n - w), keys.slice(w)),
                    },
                    schema=_BLOCK_PAIR_SCHEMA,
                )
            )
        if not parts:
            return _BLOCK_PAIR_SCHEMA.empty_table()
        return pa.concat_tables(parts)

    in_pairs = narrow.groupby("bucket").map_groups(in_bucket, batch_format="pyarrow")
    return in_pairs.union(ray.data.from_arrow(cross))


def blocking_pairs_sql(window: int = BLOCK_WINDOW) -> str:
    return f"""
    WITH k AS (
        SELECT doc_id,
               substr(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                      1, {BLOCK_KEY_LEN}) AS bkey
        FROM documents
    ), s AS (
        SELECT doc_id, bkey,
               row_number() OVER (ORDER BY bkey, doc_id) AS rn
        FROM k
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           (a.bkey = b.bkey) AS same_key
    FROM s a JOIN s b ON b.rn > a.rn AND b.rn <= a.rn + {window}
    """


# ---------------------------------------------------------------------------
# Punctuation-blind (aggressive-canonical) exact dedup
# ---------------------------------------------------------------------------
def normalized_duplicates(sf_dir: str) -> ray.data.Dataset:
    """(fingerprint, keep_doc_id, n_docs): exact dedup groups under the
    AGGRESSIVE canonical form — lowercase, every non-alphanumeric run
    collapsed to one space, trimmed — the C4/CCNet-style normalization
    that catches near-verbatim copies differing only in punctuation,
    quoting or casing, which the whitespace-only fingerprint
    (exact_duplicates) keeps apart.  Keeper = min doc_id, same
    first-seen-wins analog of resolveDuplicates.

    Vectorized Arrow canonicalization (lower + regex-replace + trim);
    md5 is the engine-wide content-hash spec (per-value, batch-cached);
    one hash-groupby exchange moving (hash, id) rows only."""
    import pyarrow.compute as pc

    from ifctordf_ray.functions.kernels import md5_hex

    ds = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def fp(t: pa.Table) -> pa.Table:
        norm = pc.utf8_trim(
            pc.replace_substring_regex(
                pc.utf8_lower(pc.fill_null(t["text"], "")),
                "[^a-z0-9]+",
                " ",
            ),
            " ",
        )
        return pa.table(
            {
                "fingerprint": pa.array(md5_hex(norm.to_pylist()), pa.string()),
                "doc_id": t["doc_id"],
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow").groupby(
        "fingerprint"
    ).aggregate(
        Min("doc_id", alias_name="keep_doc_id"),
        Count(alias_name="n_docs"),
    )


def normalized_duplicates_sql() -> str:
    return r"""
    SELECT md5(trim(regexp_replace(lower(coalesce(text, '')),
                                   '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_docs
    FROM documents
    GROUP BY 1
    """
