"""Similarity search over the embeddings table (vec_id, embedding:
list<float>, label).

- `knn_brute_force`: exact cosine top-k per query — the baseline: the
  query matrix is broadcast once (ray.put), each batch does one float64
  numpy matmul against it.  No shuffle; scales linearly in corpus size.
- `knn_lsh`: random-hyperplane LSH bucketing — the scale path: corpus and
  queries are bucketed by sign-pattern hash; only same-bucket (plus
  multi-probe) candidates are scored.  Returns the same schema; recall
  depends on nbits/nprobes.

Float-parity discipline for the SQL oracle: similarities are computed in
float64 and ROUNDED to 6 decimals; ranking is (rounded sim DESC, vec_id
ASC) so ordering never depends on sub-1e-6 float noise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

DEFAULT_K = 10
DEFAULT_NQ = 5  # queries = the NQ lowest vec_ids
ROUND_DP = 6


def _load_queries(sf_dir: str, nq: int) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    order = np.argsort(t["vec_id"].to_numpy())[:nq]
    ids = t["vec_id"].to_numpy()[order]
    mat = np.stack(
        [np.asarray(t["embedding"][int(i)].as_py(), dtype=np.float64) for i in order]
    )
    return ids, mat


class CosineScorer:
    """Actor-pool stage: query matrix fetched once per actor; per batch a
    single (batch x dim) @ (dim x nq) float64 matmul."""

    def __init__(self, queries_ref):
        self.q_ids, q = ray.get(queries_ref)
        self.qn = q / np.linalg.norm(q, axis=1, keepdims=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(embs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (embs / norms) @ self.qn.T  # (batch, nq)
        vec_ids = batch["vec_id"].to_numpy()
        nq = len(self.q_ids)
        n = len(vec_ids)
        return pa.table(
            {
                "query_id": pa.array(np.repeat(self.q_ids, n), pa.int64()),
                "neighbor_id": pa.array(np.tile(vec_ids, nq), pa.int64()),
                "sim": pa.array(np.round(sims.T.ravel(), ROUND_DP), pa.float64()),
            }
        )


def _topk_per_query(group: pa.Table, k: int) -> pa.Table:
    g = group.sort_by([("sim", "descending"), ("neighbor_id", "ascending")])
    out = g.slice(0, k)
    rank = pa.array(np.arange(1, out.num_rows + 1), pa.int64())
    return out.append_column("rank", rank)


def knn_brute_force(
    sf_dir: str, k: int = DEFAULT_K, nq: int = DEFAULT_NQ
) -> ray.data.Dataset:
    """Exact cosine top-k (self-match included: it ranks first by
    construction, a useful sanity anchor)."""
    q_ref = ray.put(_load_queries(sf_dir, nq))
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    scored = ds.map_batches(
        CosineScorer,
        fn_constructor_kwargs={"queries_ref": q_ref},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )
    # per-query top-k: nq groups, each tiny after per-batch scoring
    return scored.groupby("query_id").map_groups(
        lambda g: _topk_per_query(g, k), batch_format="pyarrow"
    )


def knn_brute_force_sql(k: int = DEFAULT_K, nq: int = DEFAULT_NQ) -> str:
    return f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings ORDER BY vec_id LIMIT {nq}
    ), scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               round(list_cosine_similarity(
                   CAST(e.embedding AS DOUBLE[]),
                   CAST(q.qe AS DOUBLE[])), {ROUND_DP}) AS sim
        FROM embeddings e, q
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# LSH-bucketed variant (the scale path)
# ---------------------------------------------------------------------------
NBITS = 8


def _hyperplanes(dim: int, nbits: int = NBITS) -> np.ndarray:
    rng = np.random.RandomState(7)
    return rng.standard_normal((nbits, dim))


class LshBucketer:
    def __init__(self, planes_ref):
        self.planes = ray.get(planes_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        signs = (embs @ self.planes.T) > 0
        codes = signs @ (1 << np.arange(self.planes.shape[0]))
        return batch.append_column("bucket", pa.array(codes.astype(np.int64)))


def knn_lsh(
    sf_dir: str, k: int = DEFAULT_K, nq: int = DEFAULT_NQ, nprobe_bits: int = 2
) -> ray.data.Dataset:
    """Approximate top-k: score only vectors whose hyperplane sign-code is
    within `nprobe_bits` Hamming distance of the query's code.  Bucketing
    is a narrow map; candidate scoring reuses CosineScorer semantics on
    the filtered corpus."""
    import pyarrow.parquet as pq_mod

    ids, qmat = _load_queries(sf_dir, nq)
    dim = qmat.shape[1]
    planes = _hyperplanes(dim)
    q_codes = ((qmat @ planes.T) > 0) @ (1 << np.arange(NBITS))
    # probe set: all codes within hamming distance nprobe_bits of any query
    from itertools import combinations

    probe: set[int] = set()
    for c in q_codes.astype(int):
        probe.add(c)
        for d in range(1, nprobe_bits + 1):
            for bits in combinations(range(NBITS), d):
                flip = 0
                for b in bits:
                    flip |= 1 << b
                probe.add(c ^ flip)
    probe_arr = pa.array(sorted(probe), pa.int64())

    planes_ref = ray.put(planes)
    q_ref = ray.put((ids, qmat))
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    bucketed = ds.map_batches(
        LshBucketer,
        fn_constructor_kwargs={"planes_ref": planes_ref},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def keep_probed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t["bucket"], probe_arr)).drop_columns(["bucket"])

    candidates = bucketed.map_batches(keep_probed, batch_format="pyarrow")
    scored = candidates.map_batches(
        CosineScorer,
        fn_constructor_kwargs={"queries_ref": q_ref},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    return scored.groupby("query_id").map_groups(
        lambda g: _topk_per_query(g, k), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs
# ---------------------------------------------------------------------------
NEAR_DUP_THRESHOLD = 0.45


class PairScorer:
    """Actor-pool stage: the full (normalized, float64) corpus matrix is
    broadcast once; each batch computes its block of the similarity matrix
    and emits pairs (a < b) above threshold.  O(n^2/batches) brute force —
    the exact baseline; the LSH-bucketed variant (knn_lsh's bucketer)
    bounds candidates at scale."""

    def __init__(self, corpus_ref, threshold):
        ids, mat = ray.get(corpus_ref)
        self.ids = ids
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        self.mat = mat / norms
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        vec_ids = batch["vec_id"].to_numpy()
        embs = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(embs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = np.round((embs / norms) @ self.mat.T, ROUND_DP)
        rows_a, rows_b, out_sim = [], [], []
        for i, a in enumerate(vec_ids):
            hits = np.where(sims[i] >= self.threshold)[0]
            for j in hits:
                b = self.ids[j]
                if a < b:  # each unordered pair once, no self-pairs
                    rows_a.append(int(a))
                    rows_b.append(int(b))
                    out_sim.append(float(sims[i, j]))
        return pa.table(
            {
                "vec_a": pa.array(rows_a, pa.int64()),
                "vec_b": pa.array(rows_b, pa.int64()),
                "sim": pa.array(out_sim, pa.float64()),
            }
        )


def near_dup_pairs_cosine(
    sf_dir: str, threshold: float = NEAR_DUP_THRESHOLD
) -> ray.data.Dataset:
    """All embedding pairs with cosine similarity >= threshold."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    corpus_ref = ray.put((ids, mat))
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ds.map_batches(
        PairScorer,
        fn_constructor_kwargs={"corpus_ref": corpus_ref, "threshold": threshold},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 8),
    )


def near_dup_pairs_cosine_sql(threshold: float = NEAR_DUP_THRESHOLD) -> str:
    return f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(
               CAST(a.embedding AS DOUBLE[]),
               CAST(b.embedding AS DOUBLE[])), {ROUND_DP}) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(
        CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), {ROUND_DP})
        >= {threshold}
    """
