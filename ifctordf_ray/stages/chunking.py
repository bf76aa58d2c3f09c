r"""Document chunking and sequence packing — the two structural
transforms a pretraining corpus build runs after filtering/dedup:

- ``doc_chunks``: split each document into fixed-size character windows
  with overlap (the flat_map shape: one input row -> many output rows,
  no shuffle, scales with the read).
- ``packed_sequences``: concat-and-split packing — documents in a
  deterministic global order are laid head-to-tail and cut into
  SEQ_LEN-token training sequences.  The global running total is the
  interesting distributed part: a two-phase prefix sum (per-bucket
  partial sums -> tiny driver-side exclusive scan -> broadcast offsets
  -> per-bucket local cumsum), so no corpus-sized state ever sits on
  the driver and no global sort is needed.

Both are defined with exact DuckDB-parity semantics (character
windows / integer cumulative sums), like the rest of the textstats
family.  Reference analog: the reference's output stream is similarly
re-segmented into bounded parts (RDFWriter.java parseModelToOutputStream
via sinks.write_ntriples); chunking applies the same bounded-window
discipline to document text itself.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import ray.data

from ifctordf_ray.sources.transcripts import clean_read_parquet as _clean_read_parquet

CHUNK_SIZE = 200  # characters per chunk
CHUNK_STRIDE = 160  # start-to-start distance => 40-char overlap

SEQ_LEN = 512  # tokens per packed training sequence
PACK_BUCKET = 4096  # doc_ids per prefix-sum bucket (bounds group size)


class Chunker:
    """map_batches stage: one row per (doc, window).  Windows start at
    0, STRIDE, 2*STRIDE, ... while start < len(text); the last window
    may be short.  Empty/null text emits no chunks.  Output carries the
    chunk md5 (not the text) so downstream dedup/audit is cheap."""

    def __init__(self, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE):
        self.size = size
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, idxs, lens, fps = [], [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            t = t or ""
            for ci, start in enumerate(range(0, len(t), self.stride)):
                chunk = t[start : start + self.size]
                doc_ids.append(d)
                idxs.append(ci)
                lens.append(len(chunk))
                fps.append(hashlib.md5(chunk.encode("utf-8")).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "chunk_idx": pa.array(idxs, pa.int64()),
                "n_chunk_chars": pa.array(lens, pa.int64()),
                "chunk_fp": pa.array(fps, pa.string()),
            }
        )


_TASK_CHUNKER = Chunker()


def chunk_batch(t: pa.Table) -> pa.Table:
    """Task-pool form of Chunker (stateless default geometry): use in
    pipelines that already hold actor pools + join aggregators, where one
    more RESERVED actor CPU would deadlock a small session (the 4-CPU
    corpus-build hang: 2 join aggregator pools + FunnelScorer + a Chunker
    actor pinned every CPU, leaving none for the map tasks feeding
    them)."""
    return _TASK_CHUNKER(t)


def doc_chunks(sf_dir: str) -> ray.data.Dataset:
    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(Chunker, batch_format="pyarrow", concurrency=(1, 4))


def doc_chunks_sql(size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE) -> str:
    # range(0, length, stride) per doc; substring is 1-based in DuckDB.
    return f"""
    SELECT doc_id,
           CAST(t.s / {stride} AS BIGINT) AS chunk_idx,
           CAST(length(substring(text, CAST(t.s AS INTEGER) + 1, {size})) AS BIGINT)
               AS n_chunk_chars,
           md5(substring(text, CAST(t.s AS INTEGER) + 1, {size})) AS chunk_fp
    FROM documents
    CROSS JOIN UNNEST(range(0, greatest(length(coalesce(text, '')), 0), {stride}))
        AS t(s)
    """


# ---------------------------------------------------------------------------
# Concat-and-split sequence packing via distributed prefix sum
# ---------------------------------------------------------------------------
_TOKEN_RE = r"\S+"


class _BucketTokenCounter:
    """(doc_id, text) -> (doc_id, bucket, n_tokens); narrow map."""

    def __init__(self, bucket: int = PACK_BUCKET):
        self.token_re = re.compile(_TOKEN_RE)
        self.bucket = bucket

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n_tok = pa.array(
            [len(self.token_re.findall(t or "")) for t in batch["text"].to_pylist()],
            pa.int64(),
        )
        bucket = pc.cast(
            pc.floor(pc.divide(pc.cast(batch["doc_id"], pa.float64()), self.bucket)),
            pa.int64(),
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "bucket": bucket, "n_tokens": n_tok}
        )


def packed_sequences(
    sf_dir: str, seq_len: int = SEQ_LEN, bucket: int = PACK_BUCKET
) -> ray.data.Dataset:
    """(doc_id, n_tokens, seq_id): documents in doc_id order laid
    head-to-tail and cut into `seq_len`-token sequences; seq_id =
    floor(tokens_before_this_doc / seq_len).

    Distributed shape (the classic two-phase scan):
      1. narrow map: per-doc token counts tagged with bucket =
         doc_id // PACK_BUCKET (deterministic ranges, no sort needed);
      2. per-bucket token sums via groupby — a table of n_docs/PACK_BUCKET
         rows, the ONLY thing the driver ever holds;
      3. driver exclusive scan over sorted bucket sums -> offsets dict,
         broadcast once via the groupby closure;
      4. groupby(bucket).map_groups: local doc_id-sorted cumsum + the
         bucket's offset.  Each group is <= PACK_BUCKET docs, so group
         memory is bounded regardless of corpus size.

    At 100 TB: step 2's shuffle moves one row per DOC (not per token),
    and the driver table is ~n_docs/4096 rows; raise PACK_BUCKET to keep
    it small.  No stage materializes the corpus."""
    from ray.data.aggregate import Sum as _Sum

    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    counted = ds.map_batches(
        _BucketTokenCounter,
        fn_constructor_kwargs={"bucket": bucket},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    # Phase 1+2: per-bucket sums (small) -> driver exclusive scan.
    bucket_sums = (
        counted.groupby("bucket")
        .aggregate(_Sum("n_tokens", alias_name="bucket_tokens"))
        .take_all()
    )  # n_docs / PACK_BUCKET rows — driver-safe by construction
    offsets: dict[int, int] = {}
    running = 0
    for row in sorted(bucket_sums, key=lambda r: r["bucket"]):
        offsets[row["bucket"]] = running
        running += row["bucket_tokens"]

    # Phase 3: per-bucket local cumsum + broadcast offset.
    def assign(group: pa.Table) -> pa.Table:
        import numpy as np

        group = group.sort_by([("doc_id", "ascending")])
        n = group["n_tokens"].to_numpy(zero_copy_only=False)
        before = offsets[group["bucket"][0].as_py()] + np.concatenate(
            ([0], np.cumsum(n)[:-1])
        )
        return pa.table(
            {
                "doc_id": group["doc_id"],
                "n_tokens": group["n_tokens"],
                "seq_id": pa.array(before // seq_len, pa.int64()),
            }
        )

    return counted.groupby("bucket").map_groups(assign, batch_format="pyarrow")


def packed_sequences_sql(seq_len: int = SEQ_LEN) -> str:
    return rf"""
    WITH tc AS (
        SELECT doc_id,
               len(regexp_extract_all(coalesce(text, ''), '{_TOKEN_RE}'))
                   AS n_tokens
        FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST((sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens) // {seq_len}
                AS BIGINT) AS seq_id
    FROM tc
    """
