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

    _EMPTY = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("chunk_idx", pa.int64()),
            ("n_chunk_chars", pa.int64()),
            ("chunk_fp", pa.string()),
        ]
    )

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Vectorized windowing (the dedup._span_grid shape): ONE
        # full-column slice kernel per grid offset — max_len/stride calls
        # per batch — instead of a per-row Python loop.  Only the md5
        # stays per-chunk (the engine-wide hash spec is inherently
        # per-value).
        import pyarrow.compute as pc

        txt = pc.fill_null(
            pc.cast(batch["text"].combine_chunks(), pa.string()), ""
        )
        n = pc.utf8_length(txt)
        max_len = pc.max(n).as_py() if batch.num_rows else None
        parts = []
        start, k = 0, 0
        while max_len and start < max_len:
            mask = pc.greater(n, start)
            sub = pc.utf8_slice_codeunits(
                txt, start=start, stop=start + self.size
            ).filter(mask)
            chunk_strs = sub.to_pylist()
            parts.append(
                pa.table(
                    {
                        "doc_id": pc.cast(
                            batch["doc_id"].combine_chunks().filter(mask),
                            pa.int64(),
                        ),
                        "chunk_idx": pa.array([k] * len(chunk_strs), pa.int64()),
                        "n_chunk_chars": pc.cast(pc.utf8_length(sub), pa.int64()),
                        "chunk_fp": pa.array(
                            [
                                hashlib.md5(s.encode("utf-8")).hexdigest()
                                for s in chunk_strs
                            ],
                            pa.string(),
                        ),
                    },
                    schema=self._EMPTY,
                )
            )
            k += 1
            start = k * self.stride
        if not parts:
            return self._EMPTY.empty_table()
        return pa.concat_tables(parts)


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
    return ds.map_batches(Chunker, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0)


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
        max_restarts=0,
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


# ---------------------------------------------------------------------------
# Dialogue training-data shaping over TRANSCRIPTS: SFT prompt/response
# pair extraction and rolling conversation-context windows.
# ---------------------------------------------------------------------------
CTX_K = 3  # context window: up to 3 preceding turns


def sft_pairs(tr: ray.data.Dataset, num_partitions: int | None = None) -> ray.data.Dataset:
    """(conv_id, prompt_idx, prompt, response): supervised-fine-tuning
    pairs — every user turn whose IMMEDIATE successor (turn_idx+1, same
    conversation) is an assistant turn.  The reference's analogous move
    is the turn->turn successor edge (nextTurn, T7-T10 list chains);
    here the successor is materialized as training rows.

    Distributed shape: NO per-conversation grouping at all — the
    successor lookup is a hash self-join on the composite key
    conv_id#turn_idx (user side keyed at turn_idx+1), so the stage is
    two narrow filtered maps + one safe_join; skewed conversation
    lengths are irrelevant because the join key is per-TURN."""
    import pyarrow.compute as pc

    from ifctordf_ray.functions.kernels import safe_join

    def prep_user(t: pa.Table) -> pa.Table:
        s = t.filter(pc.equal(t["role"], "user"))
        nxt = pc.add(pc.cast(s["turn_idx"], pa.int64()), 1)
        return pa.table(
            {
                "pkey": pc.binary_join_element_wise(
                    s["conv_id"], pc.cast(nxt, pa.string()), "#"
                ),
                "conv_id": s["conv_id"],
                "prompt_idx": pc.cast(s["turn_idx"], pa.int64()),
                "prompt": s["text"],
            }
        )

    def prep_assistant(t: pa.Table) -> pa.Table:
        s = t.filter(pc.equal(t["role"], "assistant"))
        return pa.table(
            {
                "akey": pc.binary_join_element_wise(
                    s["conv_id"],
                    pc.cast(pc.cast(s["turn_idx"], pa.int64()), pa.string()),
                    "#",
                ),
                "response": s["text"],
            }
        )

    left = tr.map_batches(prep_user, batch_format="pyarrow")
    right = tr.map_batches(prep_assistant, batch_format="pyarrow")
    j = safe_join(
        left,
        pa.schema(
            [
                ("pkey", pa.string()),
                ("conv_id", pa.string()),
                ("prompt_idx", pa.int64()),
                ("prompt", pa.string()),
            ]
        ),
        right,
        pa.schema([("akey", pa.string()), ("response", pa.string())]),
        join_type="inner",
        on=("pkey",),
        right_on=("akey",),
        num_partitions=num_partitions,
    )
    return j.map_batches(
        lambda t: pa.table(
            {
                "conv_id": t["conv_id"],
                "prompt_idx": t["prompt_idx"],
                "prompt": t["prompt"],
                "response": t["response"],
            }
        ),
        batch_format="pyarrow",
    )


def sft_pairs_sql() -> str:
    from ifctordf_ray.sources.transcripts import transcripts_from_events_sql

    return f"""
    WITH tr AS ({transcripts_from_events_sql()})
    SELECT u.conv_id, CAST(u.turn_idx AS BIGINT) AS prompt_idx,
           u.text AS prompt, a.text AS response
    FROM tr u JOIN tr a
      ON a.conv_id = u.conv_id AND a.turn_idx = u.turn_idx + 1
    WHERE u.role = 'user' AND a.role = 'assistant'
    """


def context_windows(tr: ray.data.Dataset, k: int = CTX_K) -> ray.data.Dataset:
    """(conv_id, turn_idx, context, target): rolling dialogue context —
    for every non-first turn, `context` is the newline-joined "role:
    text" lines of up to `k` preceding turns (oldest first) and `target`
    is the turn's own text: the canonical next-turn-prediction training
    layout.

    In-group vectorized: lines via ONE binary_join_element_wise, the k
    shifted copies via null-padded slices, and the rolling join via
    binary_join_element_wise(null_handling='skip') — no per-row Python.
    Grouping is per conversation (bounded by TURNS_PER_CONV, so group
    skew is structurally capped).

    Null parity with string_agg: a line is null when role or text is
    null (SQL `role || ': ' || text`); string_agg SKIPS nulls and
    returns NULL for an all-null/empty frame.  The skip-join kernel
    instead DROPS rows whose inputs are ALL null (verified: it shortens
    the output), so the join runs only over rows with >=1 valid shifted
    value and NULL context is scattered back for the rest."""
    import numpy as np
    import pyarrow.compute as pc

    _schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int64()),
            ("context", pa.string()),
            ("target", pa.string()),
        ]
    )

    def per_conv(g: pa.Table) -> pa.Table:
        g = g.sort_by([("turn_idx", "ascending")])
        n = g.num_rows
        if n == 0:
            return _schema.empty_table()
        lines = pc.binary_join_element_wise(
            g["role"], g["text"], ": "
        ).combine_chunks()
        # One shifted copy per window slot: shifted[s][i] = lines[i-s].
        # Length n (NOT n-1): the SQL oracle keeps every turn_idx > 0
        # row, including a conversation's FIRST row when its turn_idx
        # happens to be > 0 (empty frame -> NULL context) — a positional
        # g.slice(1) would silently drop it.
        shifted = [
            pa.concat_arrays(
                [pa.nulls(min(s, n), pa.string()), lines.slice(0, max(n - s, 0))]
            )
            for s in range(k, 0, -1)
        ]
        valid = pc.is_valid(shifted[0])
        for arr in shifted[1:]:
            valid = pc.or_(valid, pc.is_valid(arr))
        vmask = valid.to_numpy(zero_copy_only=False)
        if vmask.all():
            ctx = pc.binary_join_element_wise(*shifted, "\n", null_handling="skip")
        elif not vmask.any():
            ctx = pa.nulls(n, pa.string())
        else:
            idx = pa.array(np.flatnonzero(vmask))
            joined = pc.binary_join_element_wise(
                *[a.take(idx) for a in shifted], "\n", null_handling="skip"
            )
            assert len(joined) == len(idx)  # skip-join drops ONLY all-null rows
            ctx = pc.replace_with_mask(pa.nulls(n, pa.string()), valid, joined)
        out = pa.table(
            {
                "conv_id": g["conv_id"],
                "turn_idx": pc.cast(g["turn_idx"], pa.int64()),
                "context": ctx,
                "target": g["text"],
            },
            schema=_schema,
        )
        return out.filter(pc.greater(out["turn_idx"], 0))

    return tr.groupby("conv_id").map_groups(per_conv, batch_format="pyarrow")


def context_windows_sql(k: int = CTX_K) -> str:
    from ifctordf_ray.sources.transcripts import transcripts_from_events_sql

    return f"""
    WITH tr AS ({transcripts_from_events_sql()})
    SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
           string_agg(role || ': ' || text, chr(10)) OVER (
               PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN {k} PRECEDING AND 1 PRECEDING) AS context,
           text AS target
    FROM tr
    QUALIFY turn_idx > 0
    """


# ---------------------------------------------------------------------------
# SFT echo / leakage screen: prompt-response n-gram overlap
# ---------------------------------------------------------------------------
ECHO_MIN_SHARED = 2  # pairs sharing fewer shingles are never flagged


def sft_echo_overlap(
    tr: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """(conv_id, prompt_idx, p_shingles, r_shingles, overlap, is_echo):
    word-3-gram overlap between each SFT pair's prompt and response —
    the echo/leakage screen a dialogue-SFT corpus needs before training
    (a response that mostly restates its prompt teaches copying; a
    response that quotes the prompt verbatim can leak injected context).
    is_echo flags pairs where >= half the response's distinct shingles
    come from the prompt (and at least ECHO_MIN_SHARED are shared).

    Distributed shape: rides sft_pairs' per-turn hash join (no
    per-conversation grouping), then one stateless vectorized-per-row
    scoring map; integer-exact columns so the SQL oracle is bit-equal."""
    import numpy as np

    from ifctordf_ray.stages.dedup import shingles

    pairs = sft_pairs(tr, num_partitions=num_partitions)

    def score(t: pa.Table) -> pa.Table:
        pn, rn, ov = [], [], []
        for p, r in zip(t["prompt"].to_pylist(), t["response"].to_pylist()):
            sp = shingles(p)
            sr = shingles(r)
            pn.append(len(sp))
            rn.append(len(sr))
            ov.append(len(sp & sr))
        pn = np.array(pn, dtype=np.int64)
        rn = np.array(rn, dtype=np.int64)
        ov = np.array(ov, dtype=np.int64)
        echo = (ov >= ECHO_MIN_SHARED) & (2 * ov >= rn)
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "prompt_idx": t["prompt_idx"],
                "p_shingles": pa.array(pn, pa.int64()),
                "r_shingles": pa.array(rn, pa.int64()),
                "overlap": pa.array(ov, pa.int64()),
                "is_echo": pa.array(echo),
            }
        )

    return pairs.map_batches(score, batch_format="pyarrow")


def sft_echo_overlap_sql() -> str:
    from ifctordf_ray.stages.dedup import SHINGLE_K, WORD_RE

    shingle_expr = (
        f"""CASE WHEN len(ws) >= {SHINGLE_K}
                 THEN list_transform(range(len(ws) - {SHINGLE_K - 1}),
                      i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])
                 WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
                 ELSE [] END"""
    )
    return f"""
    WITH pairs AS ({sft_pairs_sql()}),
    pw AS (
        SELECT conv_id, prompt_idx,
               regexp_extract_all(lower(coalesce(prompt, '')), '{WORD_RE}') AS ws
        FROM pairs
    ),
    rw AS (
        SELECT conv_id, prompt_idx,
               regexp_extract_all(lower(coalesce(response, '')), '{WORD_RE}') AS ws
        FROM pairs
    ),
    psh AS (
        SELECT DISTINCT conv_id, prompt_idx, shingle
        FROM (SELECT conv_id, prompt_idx, {shingle_expr} AS shl FROM pw),
             UNNEST(shl) AS u(shingle)
    ),
    rsh AS (
        SELECT DISTINCT conv_id, prompt_idx, shingle
        FROM (SELECT conv_id, prompt_idx, {shingle_expr} AS shl FROM rw),
             UNNEST(shl) AS u(shingle)
    ),
    sizes AS (
        SELECT p.conv_id, p.prompt_idx,
               coalesce(pn.n, 0) AS p_shingles, coalesce(rn.n, 0) AS r_shingles
        FROM pairs p
        LEFT JOIN (SELECT conv_id, prompt_idx, count(*) AS n FROM psh
                   GROUP BY 1, 2) pn USING (conv_id, prompt_idx)
        LEFT JOIN (SELECT conv_id, prompt_idx, count(*) AS n FROM rsh
                   GROUP BY 1, 2) rn USING (conv_id, prompt_idx)
    ),
    inter AS (
        SELECT p.conv_id, p.prompt_idx, count(*) AS ov
        FROM psh p JOIN rsh r
          ON r.conv_id = p.conv_id AND r.prompt_idx = p.prompt_idx
         AND r.shingle = p.shingle
        GROUP BY 1, 2
    )
    SELECT s.conv_id, s.prompt_idx,
           CAST(s.p_shingles AS BIGINT) AS p_shingles,
           CAST(s.r_shingles AS BIGINT) AS r_shingles,
           CAST(coalesce(i.ov, 0) AS BIGINT) AS overlap,
           (coalesce(i.ov, 0) >= {ECHO_MIN_SHARED}
            AND 2 * coalesce(i.ov, 0) >= s.r_shingles) AS is_echo
    FROM sizes s LEFT JOIN inter i USING (conv_id, prompt_idx)
    """
