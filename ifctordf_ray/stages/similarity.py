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
from ifctordf_ray.sources.transcripts import clean_read_parquet as _clean_read_parquet

DEFAULT_K = 10
DEFAULT_NQ = 5  # queries = the NQ lowest vec_ids
ROUND_DP = 6
EMB_DIM = 64    # embedding width (TESTDATA.md); SQL oracles embed plane
                # literals of this width — runtime asserts agreement


def _emb_matrix(col, dtype=np.float64) -> np.ndarray:
    """list<float> column -> (n, dim) matrix with NO per-element Python
    objects (VERDICT r4 #2: the to_pylist path boxed every float of every
    batch in every emb_ stage): flatten the list child buffer straight to
    numpy and reshape.  float32 -> float64 widening is exact, so results
    are bit-identical to the old to_pylist path.  Embeddings are non-null
    fixed-width by contract; ragged input is a hard error, not a silent
    mis-alignment.  n == 0 returns the same (0,)-shaped array the old
    path produced (call-site empty guards unchanged)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.asarray([], dtype=dtype)
    widths = np.diff(col.offsets.to_numpy())
    if (widths != widths[0]).any():
        raise ValueError("ragged embedding column")
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(dtype, copy=False).reshape(n, int(widths[0]))


def _load_queries(sf_dir: str, nq: int) -> tuple[np.ndarray, np.ndarray]:
    """Pick the NQ lowest vec_ids + their embeddings WITHOUT collecting
    the corpus: per-block bottom-k on the narrow id column (tree-reduce),
    then a filtered fetch of just those nq rows."""
    import pyarrow.compute as pc

    ds = _clean_read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
    partial = ds.map_batches(
        lambda t: t.sort_by("vec_id").slice(0, nq), batch_format="pyarrow"
    )
    # nq rows per block -> tiny global sort+limit
    id_rows = partial.sort("vec_id").limit(nq).take(nq)
    ids = np.array(sorted(r["vec_id"] for r in id_rows), dtype=np.int64)
    id_arr = pa.array(ids)

    emb = _clean_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(
        lambda t: t.filter(pc.is_in(t["vec_id"], id_arr)), batch_format="pyarrow"
    )
    rows = emb.take_all()  # exactly nq rows
    if not rows:  # empty corpus: no queries, downstream emits 0 rows
        return ids, np.zeros((0, EMB_DIM), dtype=np.float64)
    rows.sort(key=lambda r: r["vec_id"])
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    assert mat.shape[1] == EMB_DIM, f"embedding dim {mat.shape[1]} != {EMB_DIM}"
    return ids, mat


class CosineScorer:
    """Actor-pool stage: query matrix fetched once per actor; per batch a
    single (batch x dim) @ (dim x nq) float64 matmul."""

    def __init__(self, queries_ref):
        self.q_ids, q = ray.get(queries_ref)
        self.qn = q / np.linalg.norm(q, axis=1, keepdims=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = _emb_matrix(batch["embedding"])
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
    ds = _clean_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    scored = ds.map_batches(
        CosineScorer,
        fn_constructor_kwargs={"queries_ref": q_ref},
        max_restarts=0,  # constructor args hold ObjectRefs (ray#53727 warning)
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
        embs = _emb_matrix(batch["embedding"])
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
    ds = _clean_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    bucketed = ds.map_batches(
        LshBucketer,
        fn_constructor_kwargs={"planes_ref": planes_ref},
        max_restarts=0,  # constructor args hold ObjectRefs (ray#53727 warning)
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
        max_restarts=0,  # constructor args hold ObjectRefs (ray#53727 warning)
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    return scored.groupby("query_id").map_groups(
        lambda g: _topk_per_query(g, k), batch_format="pyarrow"
    )


def knn_lsh_sql(
    k: int = DEFAULT_K, nq: int = DEFAULT_NQ, nprobe_bits: int = 2
) -> str:
    """Exact DuckDB replica of knn_lsh: the hyperplane matrix is embedded
    as double literals (repr() round-trips bit-exactly), codes/probe
    expansion are computed IN SQL from the data, so the oracle string is
    data-independent.  Sign margins are ~1e-4 vs ~1e-15 cross-engine dot
    drift (measured), so code agreement is robust."""
    from itertools import combinations as _comb

    planes = _hyperplanes(EMB_DIM)
    dot_cols = ",\n           ".join(
        "list_dot_product(CAST(embedding AS DOUBLE[]), ["
        + ",".join(repr(x) for x in planes[i])
        + f"]) AS d{i}"
        for i in range(NBITS)
    )
    code_expr = " + ".join(
        f"(CASE WHEN d{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(NBITS)
    )
    masks = [0]
    for d in range(1, nprobe_bits + 1):
        for bits in _comb(range(NBITS), d):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    mask_rows = ",".join(f"({m})" for m in sorted(masks))
    return f"""
    WITH dots AS (
        SELECT vec_id, embedding,
           {dot_cols}
        FROM embeddings
    ), codes AS (
        SELECT vec_id, embedding, {code_expr} AS code FROM dots
    ), q AS (
        SELECT vec_id AS query_id, embedding AS qe, code AS qcode
        FROM codes ORDER BY vec_id LIMIT {nq}
    ), masks(m) AS (VALUES {mask_rows}),
    probe AS (SELECT DISTINCT xor(qcode, m) AS pcode FROM q, masks),
    cands AS (
        SELECT vec_id, embedding FROM codes
        WHERE code IN (SELECT pcode FROM probe)
    ), scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               round(list_cosine_similarity(
                   CAST(c.embedding AS DOUBLE[]),
                   CAST(q.qe AS DOUBLE[])), {ROUND_DP}) AS sim
        FROM cands c, q
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# banded hyperplane LSH near-dup pairs (sub-quadratic scale path for the
# exact tiled all-pairs operator)
# ---------------------------------------------------------------------------
PAIR_LSH_TABLES = 4   # L hash tables ...
PAIR_LSH_BITS = 4     # ... of b hyperplane bits each (planes 0..L*b-1)
PAIR_MAX_BUCKET = 200


def near_dup_pairs_lsh(
    sf_dir: str, threshold: float = 0.45,
    tables: int = PAIR_LSH_TABLES, bits: int = PAIR_LSH_BITS,
) -> ray.data.Dataset:
    """Approximate embedding near-dup pairs: candidates = pairs sharing
    at least one of L hyperplane sign-codes (banded LSH — each table is
    an independent b-bit code), verified by exact cosine >= threshold
    inside the bucket, deduplicated across tables by a groupby.

    This is the sub-quadratic scale path next to the exact tiled
    `near_dup_pairs_cosine`: the only shuffle is the bucket groupby
    (L rows/vector), and compute is bounded by bucket sizes (capped).
    Deterministic (seeded planes) and exactly replicated in SQL."""
    planes = _hyperplanes(EMB_DIM, nbits=tables * bits)
    planes_ref = ray.put(planes)

    def bucketize(t: pa.Table) -> pa.Table:
        # fully vectorized (VERDICT r4): per-table codes via one reshaped
        # matmul; row replication across tables via Arrow take (no Python
        # list extends).  Output row order identical to the old loop:
        # for each table index in order, all rows in batch order.
        pl = ray.get(planes_ref)
        embs = _emb_matrix(t["embedding"])
        n = t.num_rows
        signs = (embs @ pl.T) > 0  # (n, L*b)
        w = 1 << np.arange(bits)
        codes = np.concatenate(
            [signs[:, ti * bits : (ti + 1) * bits] @ w for ti in range(tables)]
        )
        rep = t.select(["vec_id", "embedding"]).take(
            pa.array(np.tile(np.arange(n, dtype=np.int64), tables))
        )
        return pa.table(
            {
                "vec_id": rep["vec_id"].cast(pa.int64()),
                "tbl": pa.array(
                    np.repeat(np.arange(tables, dtype=np.int32), n), pa.int32()
                ),
                "code": pa.array(codes.astype(np.int64), pa.int64()),
                "embedding": rep["embedding"],
            }
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        empty = pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
        if n < 2:
            return empty
        ids = g["vec_id"].to_numpy().astype(np.int64, copy=False)
        order = np.argsort(ids)[:PAIR_MAX_BUCKET]
        ids = ids[order]
        embs = _emb_matrix(g["embedding"])[order]
        norms = np.linalg.norm(embs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        embs = embs / norms
        sims = np.round(embs @ embs.T, ROUND_DP)
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sims[ii, jj] >= threshold
        ii, jj = ii[keep], jj[keep]
        a, b = ids[ii], ids[jj]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "vec_a": pa.array(lo, pa.int64()),
                "vec_b": pa.array(hi, pa.int64()),
                "sim": pa.array(sims[ii, jj], pa.float64()),
            }
        )

    ds = _clean_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    buckets = ds.map_batches(bucketize, batch_format="pyarrow")
    pairs = buckets.groupby(["tbl", "code"]).map_groups(
        bucket_pairs, batch_format="pyarrow"
    )
    from ray.data.aggregate import Min

    return pairs.groupby(["vec_a", "vec_b"]).aggregate(
        Min("sim", alias_name="sim")
    )


def near_dup_pairs_lsh_sql(
    threshold: float = 0.45,
    tables: int = PAIR_LSH_TABLES, bits: int = PAIR_LSH_BITS,
) -> str:
    planes = _hyperplanes(EMB_DIM, nbits=tables * bits)
    dot_cols = ",\n           ".join(
        "list_dot_product(CAST(embedding AS DOUBLE[]), ["
        + ",".join(repr(x) for x in planes[i])
        + f"]) AS d{i}"
        for i in range(tables * bits)
    )
    code_selects = []
    for ti in range(tables):
        expr = " + ".join(
            f"(CASE WHEN d{ti * bits + j} > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(bits)
        )
        code_selects.append(
            f"SELECT vec_id, embedding, {ti} AS tbl, {expr} AS code FROM dots"
        )
    codes_union = "\n        UNION ALL\n        ".join(code_selects)
    return f"""
    WITH dots AS (
        SELECT vec_id, embedding,
           {dot_cols}
        FROM embeddings
    ), codes AS (
        {codes_union}
    ), codes_r AS (
        -- replicate the engine's PAIR_MAX_BUCKET skew cap: only the
        -- lowest-{PAIR_MAX_BUCKET} vec_ids of a bucket form pairs
        SELECT vec_id, tbl, code,
               row_number() OVER (PARTITION BY tbl, code ORDER BY vec_id) AS rk
        FROM codes
    ), cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM codes_r a JOIN codes_r b
          ON a.tbl = b.tbl AND a.code = b.code AND a.vec_id < b.vec_id
         AND a.rk <= {PAIR_MAX_BUCKET} AND b.rk <= {PAIR_MAX_BUCKET}
    )
    SELECT c.vec_a, c.vec_b,
           round(list_cosine_similarity(
               CAST(ea.embedding AS DOUBLE[]),
               CAST(eb.embedding AS DOUBLE[])), {ROUND_DP}) AS sim
    FROM cand c
    JOIN embeddings ea ON ea.vec_id = c.vec_a
    JOIN embeddings eb ON eb.vec_id = c.vec_b
    WHERE round(list_cosine_similarity(
        CAST(ea.embedding AS DOUBLE[]),
        CAST(eb.embedding AS DOUBLE[])), {ROUND_DP}) >= {threshold}
    """


# ---------------------------------------------------------------------------
# IVF-style ANN (coarse quantizer buckets; the other classic scale path)
# ---------------------------------------------------------------------------
IVF_NC = 16      # number of coarse centroids
IVF_NPROBE = 4   # probed centroids per query


class IvfAssigner:
    """Actor-pool stage: assign each vector to its nearest centroid
    (cosine, 6-dp rounded, tie -> lowest centroid id).  Centroid matrix
    fetched once per actor."""

    def __init__(self, centroids_ref):
        self.c_ids, c = ray.get(centroids_ref)
        self.cn = c / np.linalg.norm(c, axis=1, keepdims=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = _emb_matrix(batch["embedding"])
        norms = np.linalg.norm(embs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = np.round((embs / norms) @ self.cn.T, ROUND_DP)
        # argmax returns the FIRST max -> lowest centroid id (ids sorted)
        assign = self.c_ids[np.argmax(sims, axis=1)]
        return batch.append_column("centroid", pa.array(assign, pa.int64()))


def knn_ivf(
    sf_dir: str, k: int = DEFAULT_K, nq: int = DEFAULT_NQ,
    nc: int = IVF_NC, nprobe: int = IVF_NPROBE,
) -> ray.data.Dataset:
    """IVF-bucketed approximate top-k: a deterministic coarse quantizer
    (centroids = the NC lowest vec_ids' embeddings — data-derived yet
    SQL-replicable, standing in for trained k-means centroids) assigns
    every vector to its nearest centroid; each query probes its NPROBE
    nearest centroids and only vectors in probed buckets are scored.
    At cluster scale the assignment is a narrow map and the probe filter
    drops (1 - nprobe/nc) of the corpus before any scoring."""
    c_ids, cmat = _load_queries(sf_dir, nc)  # NC lowest ids as centroids
    cn = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    q_ids, qmat = _load_queries(sf_dir, nq)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    qsims = np.round(qn @ cn.T, ROUND_DP)  # (nq, nc)
    probe: set[int] = set()
    for row in qsims:
        # rank centroids by (sim DESC, centroid id ASC)
        order = sorted(range(len(c_ids)), key=lambda j: (-row[j], c_ids[j]))
        probe.update(int(c_ids[j]) for j in order[:nprobe])
    probe_arr = pa.array(sorted(probe), pa.int64())

    cent_ref = ray.put((c_ids, cmat))
    q_ref = ray.put((q_ids, qmat))
    ds = _clean_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    assigned = ds.map_batches(
        IvfAssigner,
        fn_constructor_kwargs={"centroids_ref": cent_ref},
        max_restarts=0,  # constructor args hold ObjectRefs (ray#53727 warning)
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def keep_probed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t["centroid"], probe_arr)).drop_columns(
            ["centroid"]
        )

    candidates = assigned.map_batches(keep_probed, batch_format="pyarrow")
    scored = candidates.map_batches(
        CosineScorer,
        fn_constructor_kwargs={"queries_ref": q_ref},
        max_restarts=0,  # constructor args hold ObjectRefs (ray#53727 warning)
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    return scored.groupby("query_id").map_groups(
        lambda g: _topk_per_query(g, k), batch_format="pyarrow"
    )


def knn_ivf_sql(
    k: int = DEFAULT_K, nq: int = DEFAULT_NQ,
    nc: int = IVF_NC, nprobe: int = IVF_NPROBE,
) -> str:
    """Exact DuckDB replica of knn_ivf: centroids, assignment, probing and
    scoring all computed IN SQL (data-independent oracle string)."""
    return f"""
    WITH cent AS (
        SELECT vec_id AS cid, embedding AS ce
        FROM embeddings ORDER BY vec_id LIMIT {nc}
    ), assign_ranked AS (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       CAST(c.ce AS DOUBLE[])), {ROUND_DP}) DESC, c.cid ASC
               ) AS rn
        FROM embeddings e, cent c
    ), assigned AS (
        SELECT vec_id, embedding, cid AS centroid FROM assign_ranked WHERE rn = 1
    ), q AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings ORDER BY vec_id LIMIT {nq}
    ), probe_ranked AS (
        SELECT q.query_id, c.cid,
               row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY round(list_cosine_similarity(
                       CAST(q.qe AS DOUBLE[]),
                       CAST(c.ce AS DOUBLE[])), {ROUND_DP}) DESC, c.cid ASC
               ) AS rn
        FROM q, cent c
    ), probe AS (
        SELECT DISTINCT cid FROM probe_ranked WHERE rn <= {nprobe}
    ), cands AS (
        SELECT vec_id, embedding FROM assigned
        WHERE centroid IN (SELECT cid FROM probe)
    ), scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               round(list_cosine_similarity(
                   CAST(c.embedding AS DOUBLE[]),
                   CAST(q.qe AS DOUBLE[])), {ROUND_DP}) AS sim
        FROM cands c, q
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs
# ---------------------------------------------------------------------------
NEAR_DUP_THRESHOLD = 0.45
PAIR_CHUNK = 1024  # corpus rows per tile side


def near_dup_pairs_cosine(
    sf_dir: str, threshold: float = NEAR_DUP_THRESHOLD, chunk_size: int = PAIR_CHUNK
) -> ray.data.Dataset:
    """All embedding pairs with cosine similarity >= threshold — EXACT,
    via a tiled distributed self-join: the corpus is hashed into C
    chunks (vec_id % C); each row is replicated to the C tiles it
    participates in; groupby(tile) computes that tile's block of the
    similarity matrix.  Each unordered pair lives in exactly one tile, so
    no dedup pass is needed; no task ever holds more than 2*chunk_size
    vectors and nothing corpus-sized touches the driver.  Exact all-pairs
    is inherently O(n^2) compute — the sub-quadratic scale path is LSH
    candidate generation + verify (see stages.dedup's banded pattern and
    knn_lsh's bucketer)."""
    ds = _clean_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    n = ds.count()  # parquet metadata only
    C = max(1, -(-n // chunk_size))

    def to_tiles(t: pa.Table) -> pa.Table:
        nrows = t.num_rows
        chunk = (t["vec_id"].to_numpy() % C).astype(np.int64)
        rep = np.repeat(np.arange(nrows), C)
        j = np.tile(np.arange(C, dtype=np.int64), nrows)
        c = chunk[rep]
        ti = np.minimum(c, j)
        tj = np.maximum(c, j)
        out = t.take(pa.array(rep))
        out = out.append_column("chunk", pa.array(c, pa.int64()))
        return out.append_column("tile_id", pa.array(ti * C + tj, pa.int64()))

    def tile_pairs(g: pa.Table) -> pa.Table:
        tile_id = g["tile_id"][0].as_py()
        ti, tj = tile_id // C, tile_id % C
        vec_ids = g["vec_id"].to_numpy()
        chunk = g["chunk"].to_numpy()
        embs = _emb_matrix(g["embedding"])
        norms = np.linalg.norm(embs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        embs = embs / norms

        def emit(ids_a, mat_a, ids_b, mat_b, same):
            sims = np.round(mat_a @ mat_b.T, ROUND_DP)
            if same:
                # upper triangle only: each unordered pair once
                ii, jj = np.triu_indices(len(ids_a), k=1)
            else:
                ii, jj = np.where(sims >= -2.0)  # all cross cells
                ii, jj = ii.ravel(), jj.ravel()
            keep = sims[ii, jj] >= threshold
            ii, jj = ii[keep], jj[keep]
            a, b = ids_a[ii], ids_b[jj]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            return lo, hi, sims[ii, jj]

        if ti == tj:
            lo, hi, s = emit(vec_ids, embs, vec_ids, embs, same=True)
        else:
            ma = chunk == ti
            mb = chunk == tj
            if not ma.any() or not mb.any():
                lo = hi = np.array([], dtype=np.int64)
                s = np.array([], dtype=np.float64)
            else:
                lo, hi, s = emit(
                    vec_ids[ma], embs[ma], vec_ids[mb], embs[mb], same=False
                )
        return pa.table(
            {
                "vec_a": pa.array(lo, pa.int64()),
                "vec_b": pa.array(hi, pa.int64()),
                "sim": pa.array(s, pa.float64()),
            }
        )

    tiles = ds.map_batches(to_tiles, batch_format="pyarrow")
    return tiles.groupby("tile_id").map_groups(tile_pairs, batch_format="pyarrow")


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


# ---------------------------------------------------------------------------
# Embedding near-dup clusters: connected components over the banded-LSH
# cosine pair graph (shared min-label propagation with the doc variant)
# ---------------------------------------------------------------------------
def near_dup_clusters_emb(
    sf_dir: str, threshold: float = 0.45, num_partitions: int | None = None
) -> ray.data.Dataset:
    """(vec_id, cluster_id) for every embedding; cluster = connected
    component of the cosine-near-dup pair graph (near_dup_pairs_lsh),
    cluster_id = min vec_id in the component, singletons label
    themselves.  Same iterative min-label propagation as the document
    variant (dedup.min_label_components)."""
    from ifctordf_ray.stages.dedup import min_label_components

    pairs = near_dup_pairs_lsh(sf_dir, threshold=threshold)
    ids = _clean_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    )
    return min_label_components(
        pairs, "vec_a", "vec_b", ids, "vec_id",
        num_partitions=num_partitions,
    )


def near_dup_clusters_emb_sql(threshold: float = 0.45) -> str:
    return f"""WITH RECURSIVE v AS ({near_dup_pairs_lsh_sql(threshold)}),
e AS (
    SELECT vec_a AS a, vec_b AS b FROM v
    UNION ALL
    SELECT vec_b, vec_a FROM v
),
reach(vec, lbl) AS (
    SELECT a, a FROM e
    UNION
    SELECT e.b, r.lbl FROM reach r JOIN e ON e.a = r.vec
),
comp AS (SELECT vec, min(lbl) AS cluster_id FROM reach GROUP BY vec)
SELECT m.vec_id, CAST(coalesce(c.cluster_id, m.vec_id) AS BIGINT) AS cluster_id
FROM embeddings m LEFT JOIN comp c ON c.vec = m.vec_id"""


# ---------------------------------------------------------------------------
# Per-label centroids: group-wise vector mean with EXACT cross-engine
# parity — each vector is quantized to integer micro-units first, so the
# distributed sum is order-independent (float summation order would
# never hash-match an oracle).  Combiner pattern: each batch pre-sums
# per (label, dim) before the groupby.
# ---------------------------------------------------------------------------
CENTROID_Q = 1_000_000  # micro-unit quantization


def label_centroids(sf_dir: str) -> ray.data.Dataset:
    """(label, dim, centroid): per-label mean embedding, one row per
    dimension.  Shuffle volume = (labels x dims) partials per batch."""
    from ray.data.aggregate import Sum as _Sum

    ds = _clean_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def partials(t: pa.Table) -> pa.Table:
        embs = _emb_matrix(t["embedding"])
        q = np.floor(embs * CENTROID_Q + 0.5).astype(np.int64)  # (n, d)
        labels = t["label"].to_numpy().astype(np.int64, copy=False)
        uniq = np.unique(labels)
        d = q.shape[1]
        out_label, out_dim, out_sum, out_n = [], [], [], []
        for lb in uniq:
            m = labels == lb
            s = q[m].sum(axis=0)
            n = int(m.sum())
            out_label.extend([int(lb)] * d)
            out_dim.extend(range(d))
            out_sum.extend(int(x) for x in s)
            out_n.extend([n] * d)
        return pa.table(
            {
                "label": pa.array(out_label, pa.int64()),
                "dim": pa.array(out_dim, pa.int64()),
                "sum_q": pa.array(out_sum, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(_Sum("sum_q", alias_name="sum_q"), _Sum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = pc.divide(
            pc.divide(
                pc.cast(t["sum_q"], pa.float64()), pc.cast(t["n"], pa.float64())
            ),
            float(CENTROID_Q),
        )
        return pa.table(
            {"label": t["label"], "dim": t["dim"], "centroid": c}
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def label_centroids_sql() -> str:
    return f"""
    SELECT label, CAST(i AS BIGINT) AS dim,
           CAST(sum(q) AS DOUBLE) / count(*) / {float(CENTROID_Q)} AS centroid
    FROM (
        SELECT CAST(label AS BIGINT) AS label, t.i,
               CAST(floor(CAST(embedding[CAST(t.i + 1 AS INTEGER)] AS DOUBLE)
                          * {CENTROID_Q} + 0.5) AS BIGINT) AS q
        FROM embeddings CROSS JOIN (SELECT unnest(range({EMB_DIM})) AS i) t
    )
    GROUP BY label, i
    """


# ---------------------------------------------------------------------------
# Cross-table join: documents ⋈ embeddings (doc_id = vec_id) -> per-label
# token statistics.  The multimodal-metadata join shape: a text-derived
# feature table joined to the embedding table's typed metadata on the
# shared row id, then a label-keyed aggregate.
# ---------------------------------------------------------------------------
def label_token_stats(sf_dir: str, num_partitions: int | None = None):
    """(label, n_docs, sum_tokens, sum_chars, avg_tokens): per embedding
    label, token/char totals of the joined documents.  Distributed hash
    join on the row id (both sides are plain reads — no groupby ancestry,
    so no join_ready armor needed), then a label groupby over integer
    partials; avg is one exact IEEE division of the gated integers."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Sum as _Sum

    from ifctordf_ray.stages.textstats import TokenCounter

    docs = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    tokens = docs.map_batches(TokenCounter, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0)
    labels = _clean_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    ).map_batches(
        lambda t: pa.table(
            {
                "vec_id": pc.cast(t["vec_id"], pa.int64()),
                "label": pc.cast(t["label"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    # safe_join: "plain reads" still yield ZERO blocks on fully-empty
    # tables, which loses the join's schema broadcast
    from ifctordf_ray.functions.kernels import safe_join

    joined = safe_join(
        tokens,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_tokens", pa.int64()),
                ("n_chars", pa.int64()),
            ]
        ),
        labels,
        pa.schema([("vec_id", pa.int64()), ("label", pa.int64())]),
        join_type="inner",
        on=("doc_id",),
        right_on=("vec_id",),
        num_partitions=num_partitions,
    )
    agg = joined.groupby("label").aggregate(
        _Count(alias_name="n_docs"),
        _Sum("n_tokens", alias_name="sum_tokens"),
        _Sum("n_chars", alias_name="sum_chars"),
    )

    def finish(t: pa.Table) -> pa.Table:
        avg = pc.divide(
            pc.cast(t["sum_tokens"], pa.float64()),
            pc.cast(t["n_docs"], pa.float64()),
        )
        return pa.table(
            {
                "label": t["label"],
                "n_docs": t["n_docs"],
                "sum_tokens": t["sum_tokens"],
                "sum_chars": t["sum_chars"],
                "avg_tokens": avg,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def label_token_stats_sql() -> str:
    from ifctordf_ray.stages.textstats import token_counts_sql

    return f"""
    WITH tc AS ({token_counts_sql()}),
    e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(label AS BIGINT) AS label
          FROM embeddings)
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(CAST(sum(n_tokens) AS BIGINT) AS DOUBLE) / count(*) AS avg_tokens
    FROM tc JOIN e ON tc.doc_id = e.vec_id
    GROUP BY label
    """


# ---------------------------------------------------------------------------
# Embedding quantization: per-dimension global min/max scaling to uint8
# codes — the int8-style compression step a vector store applies before
# indexing.  Two-phase: per-block (dim, min, max) partials -> tiny
# groupby (EMB_DIM rows) -> driver collect + broadcast -> vectorized
# quantize map.  All quantize arithmetic is elementwise IEEE double
# (sub/div/mul/floor — no summation), so codes are bit-identical in
# numpy and DuckDB.
# ---------------------------------------------------------------------------
def quantized_codes(sf_dir: str) -> ray.data.Dataset:
    """(vec_id, sum_code, code_fp): per vector, the sum of its uint8
    codes and the md5 of the comma-joined code string (dim order).
    q_d(x) = floor((x - min_d) / (max_d - min_d) * 255 + 0.5); a
    degenerate dimension (max == min) codes to 0."""
    import hashlib

    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Min as _Min

    ds = _clean_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def ranges(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t["embedding"])
        return pa.table(
            {
                "dim": pa.array(range(m.shape[1]), pa.int64()),
                "lo": pa.array(m.min(axis=0), pa.float64()),
                "hi": pa.array(m.max(axis=0), pa.float64()),
            }
        )

    rows = (
        ds.map_batches(ranges, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(_Min("lo", alias_name="lo"), _Max("hi", alias_name="hi"))
        .take_all()
    )  # EMB_DIM rows — driver-safe by construction
    lo = np.empty(EMB_DIM)
    hi = np.empty(EMB_DIM)
    for r in rows:
        lo[r["dim"]] = r["lo"]
        hi[r["dim"]] = r["hi"]
    span = hi - lo
    degenerate = span == 0.0
    span[degenerate] = 1.0  # avoid div-by-zero; those dims code to 0
    lo_ref, span_ref, degen_ref = ray.put(lo), ray.put(span), ray.put(degenerate)

    class Quantize:
        def __init__(self, lo_r, span_r, degen_r):
            self.lo = ray.get(lo_r)
            self.span = ray.get(span_r)
            self.degen = ray.get(degen_r)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _emb_matrix(t["embedding"])
            q = np.floor((m - self.lo) / self.span * 255.0 + 0.5).astype(np.int64)
            q[:, self.degen] = 0
            fps = [
                hashlib.md5(",".join(str(c) for c in row).encode()).hexdigest()
                for row in q
            ]
            return pa.table(
                {
                    "vec_id": t["vec_id"],
                    "sum_code": pa.array(q.sum(axis=1), pa.int64()),
                    "code_fp": pa.array(fps, pa.string()),
                }
            )

    return ds.map_batches(
        Quantize,
        fn_constructor_args=(lo_ref, span_ref, degen_ref),
        batch_format="pyarrow",
        concurrency=(1, 4),
        max_restarts=0,  # constructor args hold ObjectRefs (ray#53727 warning)
    )


def quantized_codes_sql() -> str:
    return f"""
    WITH x AS (
        SELECT vec_id, CAST(t.i AS BIGINT) AS dim,
               CAST(embedding[CAST(t.i + 1 AS INTEGER)] AS DOUBLE) AS v
        FROM embeddings CROSS JOIN (SELECT unnest(range({EMB_DIM})) AS i) t
    ),
    r AS (SELECT dim, min(v) AS lo, max(v) AS hi FROM x GROUP BY dim),
    q AS (
        SELECT x.vec_id, x.dim,
               CASE WHEN r.hi = r.lo THEN 0
                    ELSE CAST(floor((x.v - r.lo) / (r.hi - r.lo) * 255.0 + 0.5)
                              AS BIGINT)
               END AS code
        FROM x JOIN r USING (dim)
    )
    SELECT vec_id,
           CAST(sum(code) AS BIGINT) AS sum_code,
           md5(string_agg(CAST(code AS VARCHAR), ',' ORDER BY dim)) AS code_fp
    FROM q GROUP BY vec_id
    """


# ---------------------------------------------------------------------------
# Dimension Gram/covariance matrix: X^T X over quantized embeddings via
# map-side partial matmuls.  The canonical "small-output, huge-input"
# linear-algebra reduction: each block contributes one d x d int64 matrix
# (d*(d+1)/2 upper-triangle rows), so the shuffle moves O(blocks * d^2)
# partials regardless of corpus size.
# ---------------------------------------------------------------------------
COV_Q = 1024  # quantization for exact int64 sums: products <= ~2^20,
              # so overflow needs > ~2^43 rows — safe past 100 TB


def dim_covariance(sf_dir: str) -> ray.data.Dataset:
    """(dim_i, dim_j, sum_prod, n, gram) for i <= j: exact int64 Gram
    sums of COV_Q-quantized embeddings plus the float Gram value
    (sum/n)/Q^2 (same IEEE expression tree as the SQL oracle)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum as _Sum

    ds = _clean_read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    iu = np.triu_indices(EMB_DIM)

    def partials(t: pa.Table) -> pa.Table:
        embs = _emb_matrix(t["embedding"])
        q = np.floor(embs * COV_Q + 0.5).astype(np.int64)
        g = q.T @ q  # (d, d) int64 — one BLAS-like reduction per block
        return pa.table(
            {
                "dim_i": pa.array(iu[0], pa.int64()),
                "dim_j": pa.array(iu[1], pa.int64()),
                "sum_prod": pa.array(g[iu], pa.int64()),
                "n": pa.array(np.full(len(iu[0]), len(q), np.int64), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["dim_i", "dim_j"])
        .aggregate(
            _Sum("sum_prod", alias_name="sum_prod"), _Sum("n", alias_name="n")
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        gram = pc.divide(
            pc.divide(
                pc.cast(t["sum_prod"], pa.float64()), pc.cast(t["n"], pa.float64())
            ),
            float(COV_Q) * float(COV_Q),
        )
        return t.append_column("gram", gram)

    return agg.map_batches(finish, batch_format="pyarrow")


def dim_covariance_sql() -> str:
    return f"""
    WITH q AS (
        SELECT vec_id, CAST(t.i AS BIGINT) AS i,
               CAST(floor(CAST(embedding[CAST(t.i + 1 AS INTEGER)] AS DOUBLE)
                          * {COV_Q} + 0.5) AS BIGINT) AS qv
        FROM embeddings CROSS JOIN (SELECT unnest(range({EMB_DIM})) AS i) t
    )
    SELECT a.i AS dim_i, b.i AS dim_j,
           CAST(sum(a.qv * b.qv) AS BIGINT) AS sum_prod,
           CAST(count(*) AS BIGINT) AS n,
           (CAST(sum(a.qv * b.qv) AS DOUBLE) / CAST(count(*) AS DOUBLE))
             / {float(COV_Q) * float(COV_Q)} AS gram
    FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY a.i, b.i
    """


# ---------------------------------------------------------------------------
# One Lloyd (k-means) assignment step from deterministic seeds: the K
# lowest vec_ids are the centroids; every vector is assigned to its
# nearest centroid in exact quantized-integer squared distance.  The
# iterative-ML shape: broadcast centroids, narrow assignment map; the
# update step is label_centroids() keyed on `cluster`.
# ---------------------------------------------------------------------------
KMEANS_K = 8


class _KmeansAssign:
    def __init__(self, cent_ref):
        ids, mat = ray.get(cent_ref)
        self.cent_q = np.floor(mat * COV_Q + 0.5).astype(np.int64)  # (K, d)

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = _emb_matrix(batch["embedding"])
        q = np.floor(embs * COV_Q + 0.5).astype(np.int64)  # (n, d)
        # exact int64 distances; argmin ties -> lowest cluster index
        d = ((q[:, None, :] - self.cent_q[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "cluster": pa.array(assign.astype(np.int64), pa.int64()),
                "dist": pa.array(d[np.arange(len(q)), assign], pa.int64()),
            }
        )


def kmeans_assign(sf_dir: str, k: int = KMEANS_K) -> ray.data.Dataset:
    """(vec_id, cluster, dist): nearest-seed assignment; seeds are the K
    lowest vec_ids (cluster = rank of seed id)."""
    ids, mat = _load_queries(sf_dir, k)
    ref = ray.put((ids, mat))
    ds = _clean_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ds.map_batches(
        _KmeansAssign,
        fn_constructor_kwargs={"cent_ref": ref},
        max_restarts=0,  # ObjectRef constructor arg (ray#53727 warning)
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def kmeans_assign_sql(k: int = KMEANS_K) -> str:
    return f"""
    WITH q AS (
        SELECT vec_id, CAST(t.i AS BIGINT) AS i,
               CAST(floor(CAST(embedding[CAST(t.i + 1 AS INTEGER)] AS DOUBLE)
                          * {COV_Q} + 0.5) AS BIGINT) AS qv
        FROM embeddings CROSS JOIN (SELECT unnest(range({EMB_DIM})) AS i) t
    ),
    seeds AS (
        SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cluster
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
    ),
    cent AS (
        SELECT s.cluster, q.i, q.qv FROM seeds s JOIN q ON q.vec_id = s.vec_id
    ),
    d AS (
        SELECT q.vec_id, c.cluster,
               CAST(sum((q.qv - c.qv) * (q.qv - c.qv)) AS BIGINT) AS dist
        FROM q JOIN cent c ON q.i = c.i
        GROUP BY q.vec_id, c.cluster
    ),
    r AS (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
        FROM d
    )
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, dist FROM r WHERE rn = 1
    """


# ---------------------------------------------------------------------------
# Product quantization: the vector-compression scale path (PQ codes are
# what a 100-TB ANN index stores instead of raw floats).  M subspaces,
# K deterministic seed centroids each (sub-vectors of the K lowest
# vec_ids); assignment in exact quantized-integer distance.
# ---------------------------------------------------------------------------
PQ_M = 8    # subspaces (EMB_DIM / PQ_M dims each)
PQ_K = 16   # codebook size per subspace


class _PQAssign:
    def __init__(self, cent_ref):
        ids, mat = ray.get(cent_ref)
        q = np.floor(mat * COV_Q + 0.5).astype(np.int64)  # (K, d)
        # explicit subdim (not -1): a 0-row codebook can't infer it
        self.cent = q.reshape(q.shape[0], PQ_M, EMB_DIM // PQ_M)  # (K, M, d/M)

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = _emb_matrix(batch["embedding"])
        n = len(embs)
        q = np.floor(embs * COV_Q + 0.5).astype(np.int64).reshape(n, PQ_M, -1)
        # (n, K, M): exact int64 squared distance per subspace
        d = ((q[:, None, :, :] - self.cent[None, :, :, :]) ** 2).sum(axis=3)
        code = d.argmin(axis=1)  # (n, M) — first min = lowest code index
        dist = d.min(axis=1)
        vec_ids = batch["vec_id"].to_numpy()
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(vec_ids, PQ_M), pa.int64()),
                "subspace": pa.array(
                    np.tile(np.arange(PQ_M, dtype=np.int64), n), pa.int64()
                ),
                "code": pa.array(code.astype(np.int64).ravel(), pa.int64()),
                "dist": pa.array(dist.ravel(), pa.int64()),
            }
        )


def pq_codes(sf_dir: str, k: int = PQ_K) -> ray.data.Dataset:
    """(vec_id, subspace, code, dist): per-subspace nearest-centroid code
    (M codes per vector — the compressed representation)."""
    ids, mat = _load_queries(sf_dir, k)
    ref = ray.put((ids, mat))
    ds = _clean_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ds.map_batches(
        _PQAssign,
        fn_constructor_kwargs={"cent_ref": ref},
        max_restarts=0,  # ObjectRef constructor arg (ray#53727 warning)
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def pq_codes_sql(k: int = PQ_K) -> str:
    sub_d = EMB_DIM // PQ_M
    return f"""
    WITH q AS (
        SELECT vec_id, CAST(t.i AS BIGINT) AS i,
               CAST(t.i AS BIGINT) // {sub_d} AS subspace,
               CAST(floor(CAST(embedding[CAST(t.i + 1 AS INTEGER)] AS DOUBLE)
                          * {COV_Q} + 0.5) AS BIGINT) AS qv
        FROM embeddings CROSS JOIN (SELECT unnest(range({EMB_DIM})) AS i) t
    ),
    seeds AS (
        SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS code
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
    ),
    cent AS (
        SELECT s.code, q.i, q.subspace, q.qv
        FROM seeds s JOIN q ON q.vec_id = s.vec_id
    ),
    d AS (
        SELECT q.vec_id, q.subspace, c.code,
               CAST(sum((q.qv - c.qv) * (q.qv - c.qv)) AS BIGINT) AS dist
        FROM q JOIN cent c ON q.i = c.i
        GROUP BY q.vec_id, q.subspace, c.code
    ),
    r AS (
        SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
                                     ORDER BY dist, code) AS rn
        FROM d
    )
    SELECT vec_id, subspace, CAST(code AS BIGINT) AS code, dist
    FROM r WHERE rn = 1
    """


class _PQAdcScorer:
    """ADC (asymmetric distance computation) scorer — the PQ search side:
    per actor, precompute the query LUT[nq, M, K] of exact int64 squared
    distances between each query's quantized sub-vector and each codebook
    centroid (nq*M*K entries — tiny); per batch, encode the batch with
    the same nearest-centroid rule as pq_codes and sum M LUT lookups per
    (query, vector).  This is how a 100-TB ANN index scans: the corpus is
    touched only through its M-byte codes, never the raw floats (Jégou et
    al., "Product Quantization for Nearest Neighbor Search", TPAMI 2011).
    """

    def __init__(self, state_ref, k: int):
        (q_ids, qmat), (_, cmat) = ray.get(state_ref)
        self.q_ids = q_ids
        self.k = k
        cq = np.floor(cmat * COV_Q + 0.5).astype(np.int64)
        self.cent = cq.reshape(cq.shape[0], PQ_M, EMB_DIM // PQ_M)  # (K, M, sd)
        qq = np.floor(qmat * COV_Q + 0.5).astype(np.int64)
        qq = qq.reshape(qq.shape[0], PQ_M, EMB_DIM // PQ_M)  # (nq, M, sd)
        # (nq, K, M) -> (nq, M, K)
        self.lut = (
            ((qq[:, None, :, :] - self.cent[None, :, :, :]) ** 2)
            .sum(axis=3)
            .transpose(0, 2, 1)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        nq = len(self.q_ids)
        if n == 0 or nq == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "adc_dist": pa.array([], pa.int64()),
                }
            )
        embs = _emb_matrix(batch["embedding"])
        q = np.floor(embs * COV_Q + 0.5).astype(np.int64).reshape(n, PQ_M, -1)
        d = ((q[:, None, :, :] - self.cent[None, :, :, :]) ** 2).sum(axis=3)
        code = d.argmin(axis=1)  # (n, M); first min = lowest code, as SQL
        # lut[:, m, code[:, m]] summed over m -> (nq, n)
        adc = self.lut[:, np.arange(PQ_M)[None, :], code].sum(axis=2)
        vec_ids = batch["vec_id"].to_numpy()
        # per-batch pre-top-k UNDER THE GLOBAL TOTAL ORDER (adc_dist,
        # neighbor_id) — lexsort, not bare argsort, so boundary ties
        # keep exactly the rows the global rule would: the global top-k
        # of a union is a subset of the union of per-batch top-ks only
        # when every batch ranks by the same total order
        kk = min(self.k, n)
        idx = np.stack(
            [np.lexsort((vec_ids, adc[i]))[:kk] for i in range(nq)]
        )
        rows_q = np.repeat(self.q_ids, kk)
        rows_n = vec_ids[idx.ravel()]
        rows_d = np.take_along_axis(adc, idx, axis=1).ravel()
        return pa.table(
            {
                "query_id": pa.array(rows_q, pa.int64()),
                "neighbor_id": pa.array(rows_n.astype(np.int64), pa.int64()),
                "adc_dist": pa.array(rows_d.astype(np.int64), pa.int64()),
            }
        )


def _adc_topk(group: pa.Table, k: int) -> pa.Table:
    g = group.sort_by(
        [("adc_dist", "ascending"), ("neighbor_id", "ascending")]
    ).slice(0, k)
    return g.append_column(
        "rank", pa.array(np.arange(1, g.num_rows + 1), pa.int64())
    )


def pq_adc_search(
    sf_dir: str, k: int = DEFAULT_K, nq: int = DEFAULT_NQ
) -> ray.data.Dataset:
    """(query_id, neighbor_id, adc_dist, rank): PQ asymmetric-distance
    top-k — the search operator over the pq_codes representation.  Exact
    integer arithmetic end to end (same COV_Q quantization as pq_codes),
    so the DuckDB oracle reproduces it bit-for-bit; ties broken
    (adc_dist, neighbor_id).

    Scale shape: codebook + query LUT broadcast once (ray.put); corpus
    streamed with per-batch encode + LUT-sum + per-batch top-k under the
    global (adc_dist, neighbor_id) total order (so the final exact top-k
    over nq tiny groups sees #batches*k rows per query, never the
    corpus).  No shuffle of corpus-sized data."""
    state_ref = ray.put(
        (_load_queries(sf_dir, nq), _load_queries(sf_dir, PQ_K))
    )
    ds = _clean_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    scored = ds.map_batches(
        _PQAdcScorer,
        fn_constructor_kwargs={"state_ref": state_ref, "k": k},
        max_restarts=0,  # ObjectRef constructor arg (ray#53727 warning)
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    return scored.groupby("query_id").map_groups(
        lambda g: _adc_topk(g, k), batch_format="pyarrow"
    )


def pq_adc_search_sql(k: int = DEFAULT_K, nq: int = DEFAULT_NQ) -> str:
    sub_d = EMB_DIM // PQ_M
    return f"""
    WITH e AS (
        SELECT vec_id, CAST(t.i AS BIGINT) AS i,
               CAST(t.i AS BIGINT) // {sub_d} AS subspace,
               CAST(floor(CAST(embedding[CAST(t.i + 1 AS INTEGER)] AS DOUBLE)
                          * {COV_Q} + 0.5) AS BIGINT) AS qv
        FROM embeddings CROSS JOIN (SELECT unnest(range({EMB_DIM})) AS i) t
    ),
    seeds AS (
        SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS code
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {PQ_K})
    ),
    cent AS (
        SELECT s.code, e.i, e.subspace, e.qv
        FROM seeds s JOIN e ON e.vec_id = s.vec_id
    ),
    codes AS (
        SELECT vec_id, subspace, code FROM (
            SELECT e.vec_id, e.subspace, c.code,
                   row_number() OVER (
                       PARTITION BY e.vec_id, e.subspace
                       ORDER BY sum((e.qv - c.qv) * (e.qv - c.qv)), c.code
                   ) AS rn
            FROM e JOIN cent c ON e.i = c.i
            GROUP BY e.vec_id, e.subspace, c.code
        ) WHERE rn = 1
    ),
    queries AS (
        SELECT vec_id AS query_id FROM embeddings ORDER BY vec_id LIMIT {nq}
    ),
    lut AS (
        SELECT q.query_id, c.subspace, c.code,
               CAST(sum((eq.qv - c.qv) * (eq.qv - c.qv)) AS BIGINT) AS d
        FROM queries q
        JOIN e eq ON eq.vec_id = q.query_id
        JOIN cent c ON c.i = eq.i
        GROUP BY q.query_id, c.subspace, c.code
    ),
    adc AS (
        SELECT l.query_id, cd.vec_id AS neighbor_id,
               CAST(sum(l.d) AS BIGINT) AS adc_dist
        FROM codes cd
        JOIN lut l ON l.subspace = cd.subspace AND l.code = cd.code
        GROUP BY l.query_id, cd.vec_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rank
        FROM adc
    )
    SELECT query_id, neighbor_id, adc_dist, rank FROM ranked WHERE rank <= {k}
    """


class _IvfPqScorer:
    """IVF-ADC scan stage: per actor, the query LUTs (as _PQAdcScorer)
    plus each query's probed coarse-centroid set; per batch (which
    carries the IvfAssigner 'centroid' column), encode once and rank
    each query only over its probed rows."""

    def __init__(self, state_ref, k: int):
        (q_ids, qmat), (_, cmat), probe_lists = ray.get(state_ref)
        self.q_ids = q_ids
        self.k = k
        self.probes = [np.array(sorted(s), dtype=np.int64) for s in probe_lists]
        cq = np.floor(cmat * COV_Q + 0.5).astype(np.int64)
        self.cent = cq.reshape(cq.shape[0], PQ_M, EMB_DIM // PQ_M)
        qq = np.floor(qmat * COV_Q + 0.5).astype(np.int64)
        qq = qq.reshape(qq.shape[0], PQ_M, EMB_DIM // PQ_M)
        self.lut = (
            ((qq[:, None, :, :] - self.cent[None, :, :, :]) ** 2)
            .sum(axis=3)
            .transpose(0, 2, 1)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "adc_dist": pa.array([], pa.int64()),
            }
        )
        n = batch.num_rows
        nq = len(self.q_ids)
        if n == 0 or nq == 0:
            return empty
        embs = _emb_matrix(batch["embedding"])
        q = np.floor(embs * COV_Q + 0.5).astype(np.int64).reshape(n, PQ_M, -1)
        d = ((q[:, None, :, :] - self.cent[None, :, :, :]) ** 2).sum(axis=3)
        code = d.argmin(axis=1)
        adc = self.lut[:, np.arange(PQ_M)[None, :], code].sum(axis=2)  # (nq, n)
        vec_ids = batch["vec_id"].to_numpy()
        cents = batch["centroid"].to_numpy()
        out_q, out_n, out_d = [], [], []
        for qi in range(nq):
            sel = np.flatnonzero(np.isin(cents, self.probes[qi]))
            if sel.size == 0:
                continue
            sub_ids = vec_ids[sel]
            sub_d = adc[qi, sel]
            kk = min(self.k, sel.size)
            top = np.lexsort((sub_ids, sub_d))[:kk]
            out_q.append(np.full(kk, self.q_ids[qi], dtype=np.int64))
            out_n.append(sub_ids[top])
            out_d.append(sub_d[top])
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(
                    np.concatenate(out_n).astype(np.int64), pa.int64()
                ),
                "adc_dist": pa.array(
                    np.concatenate(out_d).astype(np.int64), pa.int64()
                ),
            }
        )


def ivf_pq_search(
    sf_dir: str,
    k: int = DEFAULT_K,
    nq: int = DEFAULT_NQ,
    nc: int = IVF_NC,
    nprobe: int = IVF_NPROBE,
) -> ray.data.Dataset:
    """(query_id, neighbor_id, adc_dist, rank): the composed billion-scale
    ANN architecture — IVF coarse probing x PQ asymmetric-distance scan
    (IVFADC, Jégou et al. 2011).  Each query ranks ONLY the vectors whose
    coarse centroid is in that query's nprobe probe set (per-query sets,
    stricter than knn_ivf's union-probe), scored through the M-byte PQ
    codes via the broadcast LUT — at scale the corpus contributes a
    (nprobe/nc) slice of code reads per query and no raw floats.

    Exact-integer ADC (COV_Q quantization) + 6-dp-rounded cosine probing,
    both SQL-replicated, ties (adc_dist, neighbor_id)."""
    c_ids, cmat = _load_queries(sf_dir, nc)
    q_ids, qmat = _load_queries(sf_dir, nq)
    if len(q_ids) == 0 or len(c_ids) == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "adc_dist": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        )
    cn = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    qsims = np.round(qn @ cn.T, ROUND_DP)
    probe_lists = []
    for row in qsims:
        order = sorted(range(len(c_ids)), key=lambda j: (-row[j], c_ids[j]))
        probe_lists.append({int(c_ids[j]) for j in order[:nprobe]})
    union = pa.array(sorted(set().union(*probe_lists)), pa.int64())

    cent_ref = ray.put((c_ids, cmat))
    state_ref = ray.put(
        ((q_ids, qmat), _load_queries(sf_dir, PQ_K), probe_lists)
    )
    ds = _clean_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    assigned = ds.map_batches(
        IvfAssigner,
        fn_constructor_kwargs={"centroids_ref": cent_ref},
        max_restarts=0,  # ObjectRef constructor arg (ray#53727 warning)
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def keep_union(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t["centroid"], union))

    scored = assigned.map_batches(keep_union, batch_format="pyarrow").map_batches(
        _IvfPqScorer,
        fn_constructor_kwargs={"state_ref": state_ref, "k": k},
        max_restarts=0,  # ObjectRef constructor arg (ray#53727 warning)
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    return scored.groupby("query_id").map_groups(
        lambda g: _adc_topk(g, k), batch_format="pyarrow"
    )


def ivf_pq_search_sql(
    k: int = DEFAULT_K,
    nq: int = DEFAULT_NQ,
    nc: int = IVF_NC,
    nprobe: int = IVF_NPROBE,
) -> str:
    sub_d = EMB_DIM // PQ_M
    return f"""
    WITH e AS (
        SELECT vec_id, CAST(t.i AS BIGINT) AS i,
               CAST(t.i AS BIGINT) // {sub_d} AS subspace,
               CAST(floor(CAST(embedding[CAST(t.i + 1 AS INTEGER)] AS DOUBLE)
                          * {COV_Q} + 0.5) AS BIGINT) AS qv
        FROM embeddings CROSS JOIN (SELECT unnest(range({EMB_DIM})) AS i) t
    ),
    seeds AS (
        SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS code
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {PQ_K})
    ),
    centpq AS (
        SELECT s.code, e.i, e.subspace, e.qv
        FROM seeds s JOIN e ON e.vec_id = s.vec_id
    ),
    codes AS (
        SELECT vec_id, subspace, code FROM (
            SELECT e.vec_id, e.subspace, c.code,
                   row_number() OVER (
                       PARTITION BY e.vec_id, e.subspace
                       ORDER BY sum((e.qv - c.qv) * (e.qv - c.qv)), c.code
                   ) AS rn
            FROM e JOIN centpq c ON e.i = c.i
            GROUP BY e.vec_id, e.subspace, c.code
        ) WHERE rn = 1
    ),
    cent AS (
        SELECT vec_id AS cid, embedding AS ce
        FROM embeddings ORDER BY vec_id LIMIT {nc}
    ),
    assigned AS (
        SELECT vec_id, cid AS centroid FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]),
                           CAST(c.ce AS DOUBLE[])), {ROUND_DP}) DESC, c.cid ASC
                   ) AS rn
            FROM embeddings e, cent c
        ) WHERE rn = 1
    ),
    q AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings ORDER BY vec_id LIMIT {nq}
    ),
    probe AS (
        SELECT query_id, cid FROM (
            SELECT q.query_id, c.cid,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round(list_cosine_similarity(
                           CAST(q.qe AS DOUBLE[]),
                           CAST(c.ce AS DOUBLE[])), {ROUND_DP}) DESC, c.cid ASC
                   ) AS rn
            FROM q, cent c
        ) WHERE rn <= {nprobe}
    ),
    lut AS (
        SELECT qq.query_id, c.subspace, c.code,
               CAST(sum((eq.qv - c.qv) * (eq.qv - c.qv)) AS BIGINT) AS d
        FROM q qq
        JOIN e eq ON eq.vec_id = qq.query_id
        JOIN centpq c ON c.i = eq.i
        GROUP BY qq.query_id, c.subspace, c.code
    ),
    adc AS (
        SELECT l.query_id, cd.vec_id AS neighbor_id,
               CAST(sum(l.d) AS BIGINT) AS adc_dist
        FROM codes cd
        JOIN assigned a ON a.vec_id = cd.vec_id
        JOIN probe p ON p.cid = a.centroid
        JOIN lut l ON l.query_id = p.query_id
               AND l.subspace = cd.subspace AND l.code = cd.code
        GROUP BY l.query_id, cd.vec_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rank
        FROM adc
    )
    SELECT query_id, neighbor_id, adc_dist, rank FROM ranked WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# ANN quality evaluation: recall@k of the LSH index vs exact brute force
# ---------------------------------------------------------------------------
def knn_recall(
    sf_dir: str, k: int = DEFAULT_K, nq: int = DEFAULT_NQ
) -> ray.data.Dataset:
    """(query_id, k_bf, n_matched, recall): per-query recall@k of the
    hyperplane-LSH index against the exact cosine top-k — the evaluation
    operator every ANN deployment needs next to the index itself.

    Join-free plan: tag the two result sets (bf=1, lsh=2), UNION them,
    and sum tags per (query_id, neighbor_id) — a pair with tag-sum 3 is
    a hit.  Both inputs are nq*k rows (aggregate-sized), so the two
    groupbys move trivially small data and there is no join to arm
    against empty partitions."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def tagged(ds: ray.data.Dataset, tag: int) -> ray.data.Dataset:
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "query_id": pc.cast(t["query_id"], pa.int64()),
                    "neighbor_id": pc.cast(t["neighbor_id"], pa.int64()),
                    "tag": pa.array([tag] * t.num_rows, pa.int64()),
                }
            )

        return ds.map_batches(f, batch_format="pyarrow")

    # materialize each branch BEFORE the union: both results are nq*k
    # rows (aggregate-sized, scale-independent), and executing the two
    # index pipelines sequentially avoids their actor pools coexisting —
    # under a lazy union both pools plus the map_groups sort sampler
    # contend for CPU slots and can starve each other on small sessions
    # (observed livelock at num_cpus=4).
    pairs = (
        tagged(knn_brute_force(sf_dir, k, nq), 1)
        .materialize()
        .union(tagged(knn_lsh(sf_dir, k, nq), 2).materialize())
    )
    per_pair = pairs.groupby(["query_id", "neighbor_id"]).aggregate(
        Sum("tag", alias_name="t")
    )

    def split(t: pa.Table) -> pa.Table:
        in_bf = pc.cast(
            pc.equal(pc.bit_wise_and(t["t"], 1), 1), pa.int64()
        )
        both = pc.cast(pc.equal(t["t"], 3), pa.int64())
        return pa.table(
            {"query_id": t["query_id"], "in_bf": in_bf, "both": both}
        )

    per_q = (
        per_pair.map_batches(split, batch_format="pyarrow")
        .groupby("query_id")
        .aggregate(
            Sum("in_bf", alias_name="k_bf"), Sum("both", alias_name="n_matched")
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        recall = pc.divide(
            pc.cast(t["n_matched"], pa.float64()),
            pc.cast(t["k_bf"], pa.float64()),
        )
        return t.append_column("recall", recall)

    return per_q.map_batches(finish, batch_format="pyarrow")


def knn_recall_sql(k: int = DEFAULT_K, nq: int = DEFAULT_NQ) -> str:
    """LEFT-join formulation over the two registered oracles (each a
    self-contained statement, nested as derived tables)."""
    return f"""
    SELECT b.query_id,
           CAST(count(*) AS BIGINT) AS k_bf,
           CAST(count(a.neighbor_id) AS BIGINT) AS n_matched,
           CAST(count(a.neighbor_id) AS DOUBLE) / count(*) AS recall
    FROM ({knn_brute_force_sql(k, nq)}) b
    LEFT JOIN ({knn_lsh_sql(k, nq)}) a
      ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
    GROUP BY b.query_id
    """


# ---------------------------------------------------------------------------
# One power-iteration step toward the top eigenvector of the (quantized)
# Gram matrix: w = C @ v0 with v0 = ones, v1 = w / ||w||.  The iterative
# numeric-linear-algebra shape done scale-correctly: C @ ones collapses
# to sum_v q_v * (q_v . 1), so each block ships d int64 partials (never a
# d x d matrix per row), one tiny groupby sums them, and the normalization
# runs on the d-row result.  Integers are exact end-to-end; the norm is
# an exact arbitrary-precision sum of squares (HUGEINT in the SQL arm,
# Python int here) cast to double once -> bit-identical v1.
# ---------------------------------------------------------------------------
def power_iteration_step(sf_dir: str) -> ray.data.Dataset:
    """(dim, w, v1): one power-iteration step from v0 = ones over the
    COV_Q-quantized embedding Gram matrix."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum as _Sum

    ds = _clean_read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partials(t: pa.Table) -> pa.Table:
        embs = _emb_matrix(t["embedding"])
        q = np.floor(embs * COV_Q + 0.5).astype(np.int64)
        s = q.sum(axis=1)  # q_v . ones
        w = (q * s[:, None]).sum(axis=0)  # == (q^T q) @ ones, exact int64
        return pa.table(
            {
                "dim": pa.array(np.arange(EMB_DIM), pa.int64()),
                "w": pa.array(w, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(_Sum("w", alias_name="w"))
        .repartition(1)  # d rows — the one place a single block is correct
    )

    def finish(t: pa.Table) -> pa.Table:
        w = pc.cast(t["w"], pa.int64()).to_numpy(zero_copy_only=False)
        # exact big-int sum of squares, ONE rounding at the double cast
        norm2 = sum(int(x) * int(x) for x in w)
        denom = float(np.sqrt(float(norm2)))
        v1 = w.astype(np.float64) / denom if denom > 0 else np.zeros_like(w, float)
        return pa.table(
            {
                "dim": pc.cast(t["dim"], pa.int64()),
                "w": pa.array(w, pa.int64()),
                "v1": pa.array(v1, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def power_iteration_step_sql() -> str:
    return f"""
    WITH q AS (
        SELECT vec_id, CAST(t.i AS BIGINT) AS i,
               CAST(floor(CAST(embedding[CAST(t.i + 1 AS INTEGER)] AS DOUBLE)
                          * {COV_Q} + 0.5) AS BIGINT) AS qv
        FROM embeddings CROSS JOIN (SELECT unnest(range({EMB_DIM})) AS i) t
    ),
    s AS (SELECT vec_id, sum(qv) AS sv FROM q GROUP BY vec_id),
    w AS (
        SELECT q.i AS dim, CAST(sum(q.qv * s.sv) AS BIGINT) AS w
        FROM q JOIN s ON q.vec_id = s.vec_id
        GROUP BY q.i
    ),
    n AS (
        SELECT sqrt(CAST(sum(CAST(w AS HUGEINT) * w) AS DOUBLE)) AS nrm FROM w
    )
    SELECT dim, w,
           CASE WHEN (SELECT nrm FROM n) > 0
                THEN CAST(w AS DOUBLE) / (SELECT nrm FROM n)
                ELSE 0.0 END AS v1
    FROM w
    """


# ---------------------------------------------------------------------------
# Pairwise cosine similarity between label centroids: the small cross
# product of a DERIVED aggregate (labels x labels, after the per-label
# reduction — never vectors x vectors).  The mean's 1/n cancels in
# cosine, so everything is computed from the exact int64 quantized sums:
# cos = <sa, sb> / (||sa|| ||sb||), integer numerators/norms, one float
# rounding per sqrt/divide — bit-identical to the SQL arm.
# ---------------------------------------------------------------------------
def centroid_similarity(sf_dir: str) -> ray.data.Dataset:
    """(label_a, label_b, cosine) for label_a < label_b."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum as _Sum

    ds = _clean_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def partials(t: pa.Table) -> pa.Table:
        embs = _emb_matrix(t["embedding"])
        q = np.floor(embs * CENTROID_Q + 0.5).astype(np.int64)
        labels = t["label"].to_numpy().astype(np.int64, copy=False)
        uniq = np.unique(labels)
        d = q.shape[1]
        out_label, out_dim, out_sum = [], [], []
        for lb in uniq:
            s = q[labels == lb].sum(axis=0)
            out_label.extend([int(lb)] * d)
            out_dim.extend(range(d))
            out_sum.extend(int(x) for x in s)
        return pa.table(
            {
                "label": pa.array(out_label, pa.int64()),
                "dim": pa.array(out_dim, pa.int64()),
                "sum_q": pa.array(out_sum, pa.int64()),
            }
        )

    sums = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(_Sum("sum_q", alias_name="sum_q"))
        .repartition(1)  # labels x dims rows — aggregate-sized
    )

    def finish(t: pa.Table) -> pa.Table:
        labels = pc.cast(t["label"], pa.int64()).to_numpy(zero_copy_only=False)
        dims = pc.cast(t["dim"], pa.int64()).to_numpy(zero_copy_only=False)
        sq = pc.cast(t["sum_q"], pa.int64()).to_numpy(zero_copy_only=False)
        uniq = np.unique(labels)
        d = int(dims.max()) + 1 if len(dims) else 0
        mat = {}
        for lb in uniq:
            m = labels == lb
            row = np.zeros(d, dtype=np.int64)
            row[dims[m]] = sq[m]
            mat[int(lb)] = row
        la, lb_, cos = [], [], []
        for i, a in enumerate(sorted(mat)):
            for b in sorted(mat)[i + 1:]:
                va, vb = mat[a], mat[b]
                # exact big-int dot/norms; ONE rounding at each float step
                dot = sum(int(x) * int(y) for x, y in zip(va, vb))
                na2 = sum(int(x) * int(x) for x in va)
                nb2 = sum(int(y) * int(y) for y in vb)
                denom = float(np.sqrt(float(na2))) * float(np.sqrt(float(nb2)))
                la.append(a)
                lb_.append(b)
                cos.append(float(dot) / denom if denom > 0 else 0.0)
        return pa.table(
            {
                "label_a": pa.array(la, pa.int64()),
                "label_b": pa.array(lb_, pa.int64()),
                "cosine": pa.array(cos, pa.float64()),
            }
        )

    return sums.map_batches(finish, batch_format="pyarrow", batch_size=None)


def centroid_similarity_sql() -> str:
    return f"""
    WITH q AS (
        SELECT label, CAST(t.i AS BIGINT) AS dim,
               CAST(floor(CAST(embedding[CAST(t.i + 1 AS INTEGER)] AS DOUBLE)
                          * {CENTROID_Q} + 0.5) AS BIGINT) AS qv
        FROM embeddings CROSS JOIN (SELECT unnest(range({EMB_DIM})) AS i) t
    ),
    s AS (
        SELECT label, dim, CAST(sum(qv) AS BIGINT) AS sum_q
        FROM q GROUP BY label, dim
    ),
    p AS (
        SELECT CAST(a.label AS BIGINT) AS label_a,
               CAST(b.label AS BIGINT) AS label_b,
               CAST(sum(CAST(a.sum_q AS HUGEINT) * b.sum_q) AS DOUBLE) AS dot,
               sqrt(CAST(sum(CAST(a.sum_q AS HUGEINT) * a.sum_q) AS DOUBLE)) AS na,
               sqrt(CAST(sum(CAST(b.sum_q AS HUGEINT) * b.sum_q) AS DOUBLE)) AS nb
        FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
        GROUP BY a.label, b.label
    )
    SELECT label_a, label_b,
           CASE WHEN na * nb > 0 THEN dot / (na * nb) ELSE 0.0 END AS cosine
    FROM p
    """


# ---------------------------------------------------------------------------
# Iterative k-means (Lloyd) training: the distributed ML training loop.
# Each round is one streaming pass over the corpus (assign + per-cluster
# partial sums fused in ONE map stage, then a k-row groupby); the only
# driver-side state is the k x d centroid matrix (re-broadcast via
# ray.put each round).  Centroids are re-QUANTIZED to integers after
# every mean so distances stay exact int64 and the unrolled SQL oracle
# reproduces the whole trajectory bit-for-bit (sum(qv) < 2^53 is exact
# in DOUBLE, so floor(sum/cnt + 0.5) matches numpy's identical
# expression).  Empty clusters keep their previous centroid in BOTH
# engines (COALESCE arm in the SQL).
# ---------------------------------------------------------------------------
KMEANS_ITERS = 2


class _KmeansPartials:
    """Fused assign + combine: per batch, per-cluster qv sums and counts
    (k x (d+1) partial rows) — the map-side pre-aggregation that keeps
    the per-round exchange k-sized instead of corpus-sized."""

    def __init__(self, cent_ref):
        self.cent_q = ray.get(cent_ref)  # (K, d) int64

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = _emb_matrix(batch["embedding"])
        q = np.floor(embs * COV_Q + 0.5).astype(np.int64)
        d = ((q[:, None, :] - self.cent_q[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        k = self.cent_q.shape[0]
        onehot = np.zeros((len(q), k), dtype=np.int64)
        onehot[np.arange(len(q)), assign] = 1
        sums = onehot.T @ q                      # (K, d)
        cnts = onehot.sum(axis=0)                # (K,)
        cols = {"cluster": pa.array(np.arange(k, dtype=np.int64), pa.int64())}
        for i in range(q.shape[1]):
            cols[f"s{i}"] = pa.array(sums[:, i], pa.int64())
        cols["cnt"] = pa.array(cnts, pa.int64())
        return pa.table(cols)


def kmeans_train(
    sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> ray.data.Dataset:
    """(vec_id, cluster, dist): assignment after ``iters`` Lloyd centroid
    updates from the deterministic seeds (k lowest vec_ids).  Per round:
    one streaming corpus pass -> k partial rows per block -> Sum groupby
    -> driver updates the k x d integer centroid matrix.  Nothing
    corpus-sized ever reaches the driver."""
    from ray.data.aggregate import Sum as _Sum

    ids, mat = _load_queries(sf_dir, k)
    cent_q = np.floor(mat * COV_Q + 0.5).astype(np.int64)

    for _ in range(iters):
        ref = ray.put(cent_q)
        ds = _clean_read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        partials = ds.map_batches(
            _KmeansPartials,
            fn_constructor_kwargs={"cent_ref": ref},
            max_restarts=0,  # ObjectRef constructor arg (ray#53727 warning)
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        aggs = [_Sum(f"s{i}", alias_name=f"s{i}") for i in range(EMB_DIM)]
        aggs.append(_Sum("cnt", alias_name="cnt"))
        rows = partials.groupby("cluster").aggregate(*aggs).take_all()  # k rows
        new_q = cent_q.copy()
        for r in rows:
            c, n = int(r["cluster"]), int(r["cnt"])
            if n == 0:
                continue  # empty cluster keeps its previous centroid
            s = np.array([r[f"s{i}"] for i in range(EMB_DIM)], dtype=np.float64)
            new_q[c] = np.floor(s / n + 0.5).astype(np.int64)
        cent_q = new_q

    ref = ray.put((ids.astype(np.float64), cent_q.astype(np.float64) / COV_Q))
    ds = _clean_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ds.map_batches(
        _KmeansAssign,
        fn_constructor_kwargs={"cent_ref": ref},
        max_restarts=0,
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def kmeans_train_sql(k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    """Unrolled Lloyd trajectory: cent_0 = quantized seeds; per round t,
    a_{t} assigns against cent_{t-1} and cent_t re-quantizes the cluster
    means (COALESCE keeps empty clusters' previous centroids)."""
    parts = [
        f"""q AS (
        SELECT vec_id, CAST(t.i AS BIGINT) AS i,
               CAST(floor(CAST(embedding[CAST(t.i + 1 AS INTEGER)] AS DOUBLE)
                          * {COV_Q} + 0.5) AS BIGINT) AS qv
        FROM embeddings CROSS JOIN (SELECT unnest(range({EMB_DIM})) AS i) t
    )""",
        f"""seeds AS (
        SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cluster
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
    )""",
        """cent_0 AS (
        SELECT s.cluster, q.i, q.qv FROM seeds s JOIN q ON q.vec_id = s.vec_id
    )""",
    ]
    for t in range(1, iters + 1):
        prev = f"cent_{t - 1}"
        parts.append(
            f"""d_{t} AS (
        SELECT q.vec_id, c.cluster,
               CAST(sum((q.qv - c.qv) * (q.qv - c.qv)) AS BIGINT) AS dist
        FROM q JOIN {prev} c ON q.i = c.i
        GROUP BY q.vec_id, c.cluster
    )""")
        parts.append(
            f"""a_{t} AS (
        SELECT vec_id, cluster FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY dist, cluster) AS rn
            FROM d_{t}
        ) WHERE rn = 1
    )""")
        parts.append(
            f"""m_{t} AS (
        SELECT a.cluster, q.i,
               CAST(floor(CAST(sum(q.qv) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
                   AS qc
        FROM a_{t} a JOIN q ON q.vec_id = a.vec_id
        GROUP BY a.cluster, q.i
    )""")
        parts.append(
            f"""cent_{t} AS (
        SELECT c.cluster, c.i, COALESCE(m.qc, c.qv) AS qv
        FROM {prev} c LEFT JOIN m_{t} m
          ON m.cluster = c.cluster AND m.i = c.i
    )""")
    final = iters + 1
    parts.append(
        f"""d_{final} AS (
        SELECT q.vec_id, c.cluster,
               CAST(sum((q.qv - c.qv) * (q.qv - c.qv)) AS BIGINT) AS dist
        FROM q JOIN cent_{iters} c ON q.i = c.i
        GROUP BY q.vec_id, c.cluster
    )""")
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, dist FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist, cluster) AS rn
        FROM d_{final}
    ) WHERE rn = 1
    """


# ---------------------------------------------------------------------------
# Filtered ANN: top-k restricted to a metadata predicate (label match) —
# the "filtered vector search" shape.  The predicate prunes the corpus
# INSIDE the scoring map (before any matmul), so selectivity directly
# reduces compute; queries stay the global nq lowest vec_ids.
# ---------------------------------------------------------------------------
FILTER_LABEL = 1


def knn_filtered(
    sf_dir: str,
    k: int = DEFAULT_K,
    nq: int = DEFAULT_NQ,
    label: int = FILTER_LABEL,
) -> ray.data.Dataset:
    """(query_id, neighbor_id, sim, rank): exact cosine top-k among
    corpus vectors with ``label == label`` only."""
    import pyarrow.compute as pc

    q_ref = ray.put(_load_queries(sf_dir, nq))
    ds = _clean_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    filtered = ds.map_batches(
        lambda t: t.filter(
            pc.equal(pc.cast(t["label"], pa.int64()), label)
        ).select(["vec_id", "embedding"]),
        batch_format="pyarrow",
    )
    scored = filtered.map_batches(
        CosineScorer,
        fn_constructor_kwargs={"queries_ref": q_ref},
        max_restarts=0,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )
    return scored.groupby("query_id").map_groups(
        lambda g: _topk_per_query(g, k), batch_format="pyarrow"
    )


def knn_filtered_sql(
    k: int = DEFAULT_K, nq: int = DEFAULT_NQ, label: int = FILTER_LABEL
) -> str:
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
        WHERE e.label = {label}
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= {k}
    """


def dim_minmax(sf_dir: str) -> ray.data.Dataset:
    """(dim, min_val, max_val): per-dimension min-max scaling parameters
    — the normalization-stats pass a feature pipeline runs before
    quantization.  Map-side combine: each block emits EMB_DIM partial
    rows (np.min/np.max columnwise), the groupby merges by Min/Max —
    mergeable under any partitioning, register table is EMB_DIM rows at
    any corpus size.  Min/max PICK existing float values (no arithmetic),
    so parity with SQL is exact."""
    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Min as _Min

    ds = _clean_read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partials(t: pa.Table) -> pa.Table:
        embs = _emb_matrix(t["embedding"])
        return pa.table(
            {
                "dim": pa.array(np.arange(EMB_DIM), pa.int64()),
                "min_val": pa.array(embs.min(axis=0), pa.float64()),
                "max_val": pa.array(embs.max(axis=0), pa.float64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(
            _Min("min_val", alias_name="min_val"),
            _Max("max_val", alias_name="max_val"),
        )
    )


def dim_minmax_sql() -> str:
    return f"""
    SELECT CAST(t.i AS BIGINT) AS dim,
           min(CAST(embedding[CAST(t.i + 1 AS INTEGER)] AS DOUBLE)) AS min_val,
           max(CAST(embedding[CAST(t.i + 1 AS INTEGER)] AS DOUBLE)) AS max_val
    FROM embeddings CROSS JOIN (SELECT unnest(range({EMB_DIM})) AS i) t
    GROUP BY t.i
    """


# ---------------------------------------------------------------------------
# Contrastive-triplet mining: (query, positive, negative) rows for a
# contrastive/embedding trainer.  Positive = the top cosine neighbor
# with the SELF match excluded; negative = a deterministic pseudo-random
# corpus vector outside the query's top-K (a "true negative"), chosen as
# the argmin of an arithmetic pair hash so the pick is reproducible
# across runs, cluster sizes and engines:
#
#   h(q, v) = (NEG_A * (q mod P) + NEG_B * (v mod P)) mod P,
#   P = 2^31 - 1  (products stay < 2^62: exact in numpy int64 AND in
#   DuckDB BIGINT — the same overflow-free spec as the minhash
#   permutations in stages/dedup.py), ties broken by vec_id ASC.
#
# Scale shape: one streaming knn pass (positives + exclusion sets,
# nq x k rows), then one streaming hash-argmin pass with the exclusion
# table broadcast (nq-bounded) and a per-block partial argmin — nothing
# corpus-sized leaves the map stage.
# ---------------------------------------------------------------------------
NEG_A = 48271
NEG_B = 16807
NEG_P = 2**31 - 1


class _NegHashMin:
    """Per-block partial: for each query, the excluded-set-masked
    hash-argmin candidate (one row per query per block)."""

    def __init__(self, state_ref):
        self.q_ids, self.excl = ray.get(state_ref)  # (nq,), list[np.ndarray]

    def __call__(self, t: pa.Table) -> pa.Table:
        vids = np.asarray(t["vec_id"], dtype=np.int64)
        qs, cands, hs = [], [], []
        vm = vids % NEG_P
        for qid, excl in zip(self.q_ids, self.excl):
            h = (NEG_A * (int(qid) % NEG_P) + NEG_B * vm) % NEG_P
            mask = np.isin(vids, excl)
            if mask.all():
                continue
            h = np.where(mask, NEG_P, h)  # NEG_P > any real hash value
            order = np.lexsort((vids, h))
            best = order[0]
            qs.append(int(qid))
            cands.append(int(vids[best]))
            hs.append(int(h[best]))
        return pa.table(
            {
                "query_id": pa.array(qs, pa.int64()),
                "neg_id": pa.array(cands, pa.int64()),
                "h": pa.array(hs, pa.int64()),
            }
        )


def contrastive_triplets(
    sf_dir: str, k: int = DEFAULT_K, nq: int = DEFAULT_NQ
) -> ray.data.Dataset:
    """(query_id, pos_id, neg_id): one triplet per query vector."""
    import pyarrow.compute as pc

    # phase 1: top-k (includes self) -> positives + exclusion sets.
    # nq x k rows — query-sized, never corpus-sized.
    topk = knn_brute_force(sf_dir, k=k, nq=nq).take_all()
    by_q: dict = {}
    for r in topk:
        by_q.setdefault(r["query_id"], []).append(r)
    q_ids, pos, excl = [], {}, []
    for qid in sorted(by_q):
        rows = sorted(by_q[qid], key=lambda r: r["rank"])
        p = next(
            (r["neighbor_id"] for r in rows if r["neighbor_id"] != qid),
            None,
        )
        if p is None:
            continue  # degenerate: the query's only neighbor is itself
        q_ids.append(qid)
        pos[qid] = p
        excl.append(
            np.unique(
                np.array([qid] + [r["neighbor_id"] for r in rows], np.int64)
            )
        )
    if not q_ids:
        return ray.data.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "pos_id": pa.array([], pa.int64()),
                    "neg_id": pa.array([], pa.int64()),
                }
            )
        )

    # phase 2: streaming hash-argmin over the corpus
    state_ref = ray.put((np.array(q_ids, np.int64), excl))
    ds = _clean_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    )
    partials = ds.map_batches(
        _NegHashMin,
        fn_constructor_kwargs={"state_ref": state_ref},
        max_restarts=0,  # ObjectRef constructor arg (ray#53727)
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def final_min(g: pa.Table) -> pa.Table:
        g = g.sort_by([("h", "ascending"), ("neg_id", "ascending")])
        qid = g["query_id"][0].as_py()
        return pa.table(
            {
                "query_id": pa.array([qid], pa.int64()),
                "pos_id": pa.array([pos[qid]], pa.int64()),
                "neg_id": pa.array([g["neg_id"][0].as_py()], pa.int64()),
            }
        )

    return partials.groupby("query_id").map_groups(
        final_min, batch_format="pyarrow"
    )


def contrastive_triplets_sql(k: int = DEFAULT_K, nq: int = DEFAULT_NQ) -> str:
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
    ), topk AS (
        SELECT query_id, neighbor_id FROM ranked WHERE rank <= {k}
    ), pos AS (
        SELECT query_id, neighbor_id AS pos_id FROM (
            SELECT query_id, neighbor_id, row_number() OVER (
                PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id ASC) AS rn
            FROM scored WHERE neighbor_id != query_id
        ) WHERE rn = 1
    ), neg AS (
        SELECT query_id, vec_id AS neg_id FROM (
            SELECT q.query_id, e.vec_id,
                   ({NEG_A} * (q.query_id % {NEG_P})
                    + {NEG_B} * (e.vec_id % {NEG_P})) % {NEG_P} AS h,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY ({NEG_A} * (q.query_id % {NEG_P})
                                 + {NEG_B} * (e.vec_id % {NEG_P}))
                                % {NEG_P} ASC,
                                e.vec_id ASC) AS rn
            FROM embeddings e, q
            WHERE e.vec_id != q.query_id
              AND NOT EXISTS (
                  SELECT 1 FROM topk t
                  WHERE t.query_id = q.query_id
                    AND t.neighbor_id = e.vec_id
              )
        ) WHERE rn = 1
    )
    SELECT p.query_id, p.pos_id, n.neg_id
    FROM pos p JOIN neg n USING (query_id)
    """


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
# web-scale through semantic deduplication"): k-means-cluster the
# embedding space, then dedup WITHIN each cluster — a vector is dropped
# when another cluster member with a LOWER vec_id sits above the cosine
# threshold (deterministic keep-lowest-id, the same first-seen-wins rule
# as exact dedup).  Cross-cluster near-dups are intentionally not
# compared — that is the paper's approximation that turns O(n^2) into
# sum-of-cluster-size^2, the semantic-dedup scale path.
#
# Scale shape: the assignment pass is the broadcast-centroid narrow map
# (shared _KmeansAssign), and the dedup is ONE groupby(cluster) whose
# group size is n/k on average — k scales with the corpus in a real
# deployment, keeping groups bounded (the same partitioning assumption
# as the paper's 50k-cluster config).
# ---------------------------------------------------------------------------
SEMDEDUP_TAU = 0.45  # shared with the near-dup family


def semdedup(
    sf_dir: str, k: int = KMEANS_K, tau: float = SEMDEDUP_TAU
) -> ray.data.Dataset:
    """(vec_id, cluster, kept): kept=0 iff a same-cluster vector with a
    lower vec_id has rounded cosine similarity >= tau."""
    ids, mat = _load_queries(sf_dir, k)
    ref = ray.put((ids, mat))
    ds = _clean_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    class _AssignKeepEmb(_KmeansAssign):
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = super().__call__(batch)
            return out.drop_columns(["dist"]).append_column(
                "embedding", batch["embedding"]
            )

    assigned = ds.map_batches(
        _AssignKeepEmb,
        fn_constructor_kwargs={"cent_ref": ref},
        max_restarts=0,  # ObjectRef constructor arg (ray#53727 warning)
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def dedup_group(g: pa.Table) -> pa.Table:
        vids = g["vec_id"].to_numpy()
        embs = _emb_matrix(g["embedding"])
        norms = np.linalg.norm(embs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        embs = embs / norms
        sims = np.round(embs @ embs.T, ROUND_DP)
        lower = vids[None, :] < vids[:, None]  # [i, j]: j precedes i
        drop = ((sims >= tau) & lower).any(axis=1)
        return pa.table(
            {
                "vec_id": pa.array(vids, pa.int64()),
                "cluster": g["cluster"],
                "kept": pa.array((~drop).astype(np.int64), pa.int64()),
            }
        )

    return assigned.groupby("cluster").map_groups(
        dedup_group, batch_format="pyarrow"
    )


def semdedup_sql(k: int = KMEANS_K, tau: float = SEMDEDUP_TAU) -> str:
    return f"""
    WITH assign AS ({kmeans_assign_sql(k)}),
    dropped AS (
        SELECT a.vec_id
        FROM assign a
        JOIN assign b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
        JOIN embeddings ea ON ea.vec_id = a.vec_id
        JOIN embeddings eb ON eb.vec_id = b.vec_id
        WHERE round(list_cosine_similarity(
                  CAST(ea.embedding AS DOUBLE[]),
                  CAST(eb.embedding AS DOUBLE[])), {ROUND_DP}) >= {tau}
        GROUP BY a.vec_id
    )
    SELECT a.vec_id, a.cluster,
           CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
    FROM assign a LEFT JOIN dropped d ON d.vec_id = a.vec_id
    """


# ---------------------------------------------------------------------------
# MMR diversified retrieval (Carbonell & Goldstein 1998, "maximal
# marginal relevance"): re-rank each query's candidate pool so the
# selected set trades relevance against redundancy — the diversity-aware
# top-k a retrieval/RAG pipeline applies after ANN candidate generation.
# score(d) = lambda*sim(q,d) - (1-lambda)*max_{s in selected} sim(d,s),
# greedy, ties to the lowest vec_id.
#
# Scale shape: candidate generation is the streaming knn pass; the MMR
# selection itself is QUERY-sized (nq x pool^2), never corpus-sized —
# like contrastive_triplets, the driver only ever holds the nq*pool
# candidate rows and their vectors (no join near the scorer actor pool).
# SELECT count is fixed so the SQL oracle unrolls the greedy iterations
# exactly (the kmeans_train pattern).
# ---------------------------------------------------------------------------
MMR_LAMBDA = 0.5  # exact in binary: lambda-weighting stays bit-identical
MMR_SELECT = 3


def mmr_topk(
    sf_dir: str, pool: int = DEFAULT_K, nq: int = DEFAULT_NQ
) -> ray.data.Dataset:
    """(query_id, sel_rank, vec_id, score): MMR_SELECT diverse picks per
    query from its top-``pool`` cosine candidates (self excluded)."""
    import pyarrow.compute as pc

    topk = knn_brute_force(sf_dir, k=pool, nq=nq).take_all()  # nq*pool rows
    by_q: dict = {}
    cand_ids: set = set()
    for r in topk:
        if r["neighbor_id"] == r["query_id"]:
            continue
        by_q.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["sim"])
        )
        cand_ids.add(r["neighbor_id"])

    # fetch ONLY the candidate vectors (<= nq*pool rows), streaming scan
    idarr = pa.array(sorted(cand_ids), pa.int64())
    rows = (
        _clean_read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(
            lambda t: t.filter(pc.is_in(t["vec_id"], value_set=idarr)),
            batch_format="pyarrow",
        )
        .take_all()
    )
    vecs = {}
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        n = np.linalg.norm(v)
        vecs[r["vec_id"]] = v / (n if n else 1.0)

    out_q, out_r, out_v, out_s = [], [], [], []
    for qid in sorted(by_q):
        cands = sorted(by_q[qid])  # by cand_id: deterministic layout
        ids = np.array([c[0] for c in cands], np.int64)
        simq = np.array([c[1] for c in cands], np.float64)
        mat = np.stack([vecs[i] for i in ids])
        sims = np.round(mat @ mat.T, ROUND_DP)
        avail = np.ones(len(ids), bool)
        # max-over-selected penalty: cosine sims can be NEGATIVE, so the
        # one-element max must be the raw sim, not max(0, sim)
        penalty = np.full(len(ids), -np.inf)
        for r in range(1, MMR_SELECT + 1):
            if not avail.any():
                break
            if r == 1:
                score = MMR_LAMBDA * simq  # no selected set yet
            else:
                score = MMR_LAMBDA * simq - (1.0 - MMR_LAMBDA) * penalty
            live = np.flatnonzero(avail)
            pick = live[np.lexsort((ids[live], -score[live]))[0]]
            out_q.append(qid)
            out_r.append(r)
            out_v.append(ids[pick])
            out_s.append(score[pick])
            avail[pick] = False
            penalty = np.maximum(penalty, sims[:, pick])
    return ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "sel_rank": pa.array(out_r, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )
    )


def mmr_topk_sql(pool: int = DEFAULT_K, nq: int = DEFAULT_NQ) -> str:
    lam, mu = MMR_LAMBDA, 1.0 - MMR_LAMBDA
    return f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings ORDER BY vec_id LIMIT {nq}
    ), scored AS (
        SELECT q.query_id, e.vec_id AS cand_id,
               round(list_cosine_similarity(
                   CAST(e.embedding AS DOUBLE[]),
                   CAST(q.qe AS DOUBLE[])), {ROUND_DP}) AS simq
        FROM embeddings e, q
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY simq DESC, cand_id ASC) AS rank
        FROM scored
    ), cand AS (
        SELECT query_id, cand_id, simq FROM ranked
        WHERE rank <= {pool} AND cand_id != query_id
    ), cc AS (
        SELECT c1.query_id, c1.cand_id AS a, c2.cand_id AS b,
               round(list_cosine_similarity(
                   CAST(ea.embedding AS DOUBLE[]),
                   CAST(eb.embedding AS DOUBLE[])), {ROUND_DP}) AS s
        FROM cand c1
        JOIN cand c2 ON c1.query_id = c2.query_id AND c1.cand_id != c2.cand_id
        JOIN embeddings ea ON ea.vec_id = c1.cand_id
        JOIN embeddings eb ON eb.vec_id = c2.cand_id
    ), s1 AS (
        SELECT query_id, cand_id AS v1, {lam} * simq AS sc1 FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY {lam} * simq DESC, cand_id) AS rn
            FROM cand) WHERE rn = 1
    ), p2 AS (
        SELECT c.query_id, c.cand_id, c.simq, cc.s AS pen
        FROM cand c
        JOIN s1 ON s1.query_id = c.query_id AND c.cand_id != s1.v1
        JOIN cc ON cc.query_id = c.query_id AND cc.a = c.cand_id
               AND cc.b = s1.v1
    ), s2 AS (
        SELECT query_id, cand_id AS v2, sc2 FROM (
            SELECT query_id, cand_id,
                   {lam} * simq - {mu} * pen AS sc2,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY {lam} * simq - {mu} * pen DESC, cand_id) AS rn
            FROM p2) WHERE rn = 1
    ), p3 AS (
        SELECT c.query_id, c.cand_id, c.simq, greatest(ca.s, cb.s) AS pen
        FROM cand c
        JOIN s1 ON s1.query_id = c.query_id
        JOIN s2 ON s2.query_id = c.query_id
        JOIN cc ca ON ca.query_id = c.query_id AND ca.a = c.cand_id
                  AND ca.b = s1.v1
        JOIN cc cb ON cb.query_id = c.query_id AND cb.a = c.cand_id
                  AND cb.b = s2.v2
        WHERE c.cand_id != s1.v1 AND c.cand_id != s2.v2
    ), s3 AS (
        SELECT query_id, cand_id AS v3, sc3 FROM (
            SELECT query_id, cand_id,
                   {lam} * simq - {mu} * pen AS sc3,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY {lam} * simq - {mu} * pen DESC, cand_id) AS rn
            FROM p3) WHERE rn = 1
    )
    SELECT query_id, CAST(1 AS BIGINT) AS sel_rank, v1 AS vec_id, sc1 AS score
    FROM s1
    UNION ALL
    SELECT query_id, CAST(2 AS BIGINT), v2, sc2 FROM s2
    UNION ALL
    SELECT query_id, CAST(3 AS BIGINT), v3, sc3 FROM s3
    """


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection: the dimensionality-reduction
# sketch a 100-TB pipeline applies before storing/shuffling embeddings
# (project 64 -> RP_DIM dims against a fixed Gaussian plane matrix).
# Both the vectors AND the planes are quantized to COV_Q integer units
# first, so the projection is EXACT int64 arithmetic — order-independent
# and bit-identical across engines (a float dot product would drift
# ~1e-15 between numpy's pairwise and SQL's sequential summation).
# ---------------------------------------------------------------------------
RP_DIM = 16


def _rp_planes_q() -> np.ndarray:
    """(RP_DIM, EMB_DIM) quantized int64 Gaussian planes, fixed seed."""
    rng = np.random.RandomState(11)
    planes = rng.standard_normal((RP_DIM, EMB_DIM))
    return np.floor(planes * COV_Q + 0.5).astype(np.int64)


class _RandomProject:
    def __init__(self, planes_ref):
        self.planes_q = ray.get(planes_ref)  # (RP_DIM, EMB_DIM) int64

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = _emb_matrix(batch["embedding"])
        q = np.floor(embs * COV_Q + 0.5).astype(np.int64)  # (n, d)
        proj = q @ self.planes_q.T  # exact int64 (n, RP_DIM)
        n = len(q)
        vec_ids = batch["vec_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(vec_ids, RP_DIM), pa.int64()),
                "j": pa.array(
                    np.tile(np.arange(RP_DIM, dtype=np.int64), n), pa.int64()
                ),
                "qproj": pa.array(proj.reshape(-1), pa.int64()),
            }
        )


def random_projection(sf_dir: str) -> ray.data.Dataset:
    """(vec_id, j, qproj): the RP_DIM-dim JL sketch of every embedding in
    COV_Q^2-scaled integer units; one broadcast + one narrow map."""
    ref = ray.put(_rp_planes_q())
    ds = _clean_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ds.map_batches(
        _RandomProject,
        fn_constructor_kwargs={"planes_ref": ref},
        max_restarts=0,  # ObjectRef constructor arg (ray#53727 warning)
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def random_projection_sql() -> str:
    planes_q = _rp_planes_q()
    vals = ",".join(
        f"({j},{i},{int(planes_q[j, i])})"
        for j in range(RP_DIM)
        for i in range(EMB_DIM)
    )
    return f"""
    WITH q AS (
        SELECT vec_id, CAST(t.i AS BIGINT) AS i,
               CAST(floor(CAST(embedding[CAST(t.i + 1 AS INTEGER)] AS DOUBLE)
                          * {COV_Q} + 0.5) AS BIGINT) AS qv
        FROM embeddings CROSS JOIN (SELECT unnest(range({EMB_DIM})) AS i) t
    ),
    planes(j, i, qp) AS (VALUES {vals})
    SELECT q.vec_id, CAST(p.j AS BIGINT) AS j,
           CAST(sum(q.qv * p.qp) AS BIGINT) AS qproj
    FROM q JOIN planes p ON p.i = q.i
    GROUP BY 1, 2
    """
