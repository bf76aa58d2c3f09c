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
- n-gram Jaccard verify: exact similarity for candidate pairs.

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
import ray.data
from ray.data.aggregate import Count, Min

WORD_RE = r"[a-z0-9]+"
SHINGLE_K = 3           # word 3-grams
NUM_PERM = 64           # minhash permutations
NUM_BANDS = 16          # LSH bands (4 rows/band)
ROWS_PER_BAND = NUM_PERM // NUM_BANDS
MAX_BUCKET = 50         # skew guard: max docs per LSH bucket expanded to pairs
_MERSENNE = (1 << 61) - 1


from ifctordf_ray.functions.kernels import stable_hash64 as _stable_hash64  # noqa: E402


def _perm_params(num_perm: int = NUM_PERM) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(42)  # fixed seed: signatures are part of the spec
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
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
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        h = np.array([_stable_hash64(s) for s in sh], dtype=np.uint64)
        # (a*h + b) mod p, all permutations x all shingles, min over shingles
        vals = (h[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
            }
        )


def minhash_signatures(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(MinHasher, batch_format="pyarrow", concurrency=(1, 8))


def _explode_bands(batch: pa.Table) -> pa.Table:
    """signature row -> NUM_BANDS (band_id, band_hash, doc_id, sig) rows."""
    doc_ids, band_ids, band_hashes, sigs = [], [], [], []
    for doc, sig in zip(batch["doc_id"].to_pylist(), batch["sig"].to_pylist()):
        for b in range(NUM_BANDS):
            chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
            band_hashes.append(_stable_hash64(f"{b}:" + ",".join(map(str, chunk))))
            band_ids.append(b)
            doc_ids.append(doc)
            sigs.append(sig)
    return pa.table(
        {
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.uint64()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "sig": pa.array(sigs, pa.list_(pa.uint64())),
        }
    )


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """One LSH bucket -> candidate pairs with signature-estimated Jaccard.
    Buckets larger than MAX_BUCKET are truncated (flagged, not silent)."""
    n = group.num_rows
    if n < 2:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "est_jaccard": pa.array([], pa.float64()),
                "truncated": pa.array([], pa.bool_()),
            }
        )
    docs = group["doc_id"].to_pylist()
    sigs = group["sig"].to_pylist()
    order = np.argsort(docs)
    truncated = n > MAX_BUCKET
    order = order[:MAX_BUCKET]
    a_l, b_l, est_l = [], [], []
    for i, j in combinations(order, 2):
        da, db = docs[i], docs[j]
        if da == db:
            continue
        sa, sb = np.asarray(sigs[i]), np.asarray(sigs[j])
        est = float(np.mean(sa == sb))
        a_l.append(min(da, db))
        b_l.append(max(da, db))
        est_l.append(est)
    return pa.table(
        {
            "doc_a": pa.array(a_l, pa.int64()),
            "doc_b": pa.array(b_l, pa.int64()),
            "est_jaccard": pa.array(est_l, pa.float64()),
            "truncated": pa.array([truncated] * len(a_l), pa.bool_()),
        }
    )


def near_dup_pairs_minhash(
    sf_dir: str, threshold: float = 0.5
) -> ray.data.Dataset:
    """MinHash-LSH near-duplicate candidate pairs (est_jaccard >=
    threshold), deduplicated across bands via groupby(doc_a, doc_b)."""
    sigs = minhash_signatures(sf_dir)
    bands = sigs.map_batches(_explode_bands, batch_format="pyarrow")
    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pyarrow"
    )
    thresh = threshold

    def flt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["est_jaccard"], thresh))

    filtered = pairs.map_batches(flt, batch_format="pyarrow")
    return filtered.groupby(["doc_a", "doc_b"]).aggregate(
        Min("est_jaccard", alias_name="est_jaccard")
    )


class SimHasher:
    """64-bit SimHash over word hashes; near-dups have small Hamming
    distance.  Deterministic md5-derived word hashes."""

    def __init__(self):
        self.word_re = re.compile(WORD_RE)

    def simhash(self, text: str) -> int:
        counts = np.zeros(64, dtype=np.int64)
        for w in self.word_re.findall((text or "").lower()):
            h = _stable_hash64(w)
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            counts += np.where(bits.astype(bool), 1, -1)
        out = 0
        for i in range(64):
            if counts[i] > 0:
                out |= 1 << i
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [self.simhash(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(hs, pa.uint64()),
            }
        )


def simhash_fingerprints(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=(1, 8))


class JaccardVerifier:
    """Exact n-gram Jaccard for candidate pairs.  The docs' shingle sets
    are broadcast via ray.put (small side); at larger scale this becomes
    a hash join of pairs against the shingle dataset (documented)."""

    def __init__(self, docs_ref):
        import ray

        texts = ray.get(docs_ref)
        self.sh = {d: shingles(t) for d, t in texts.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_pylist()
        b = batch["doc_b"].to_pylist()
        jac = []
        for x, y in zip(a, b):
            sa, sb = self.sh.get(x, set()), self.sh.get(y, set())
            u = len(sa | sb)
            jac.append(len(sa & sb) / u if u else 0.0)
        return batch.append_column("jaccard", pa.array(jac, pa.float64()))


def verified_near_dups(sf_dir: str, threshold: float = 0.5) -> ray.data.Dataset:
    """Full near-dup pipeline: LSH candidates -> exact Jaccard verify."""
    import pyarrow.parquet as pq
    import ray

    cand = near_dup_pairs_minhash(sf_dir, threshold=0.0)
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs_ref = ray.put(dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())))
    verified = cand.map_batches(
        JaccardVerifier,
        fn_constructor_kwargs={"docs_ref": docs_ref},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    thresh = threshold

    def flt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["jaccard"], thresh))

    return verified.map_batches(flt, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact dedup (SQL-oracle-able)
# ---------------------------------------------------------------------------
def exact_duplicates(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup groups by canonical fingerprint: keeper = min doc_id
    (first-seen-wins analog of resolveDuplicates)."""
    from ifctordf_ray.stages.textstats import Fingerprinter

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    fps = ds.map_batches(Fingerprinter, batch_format="pyarrow", concurrency=(1, 4))
    return fps.groupby("fingerprint").aggregate(
        Min("doc_id", alias_name="keep_doc_id"),
        Count(alias_name="n_docs"),
    )


def exact_duplicates_sql() -> str:
    return r"""
    SELECT md5(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')) AS fingerprint,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_docs
    FROM documents
    GROUP BY 1
    """
