r"""Distributed sketches: HyperLogLog registers for approximate
distinct-word counting over the corpus.

The register table IS the sketch: one (bucket, max_rank) row per
non-empty bucket, built with the canonical map-side-combine shape —
each batch emits at most 2^P partial-register rows regardless of batch
token count, so the groupby moves combiner output.  Registers are pure
integers (md5-derived hashes shared with DuckDB's ``md5_number_upper``),
so the sketch has an exact SQL oracle; the float estimator is kept OUT
of the gated row set (``hll_estimate`` computes it from the registers
with a fixed summation order, tested against the true distinct count in
pytest, not hash-gated — cross-libm float parity is the one thing md5
can't buy).

At 100 TB: registers are mergeable state — per-batch partials merge by
MAX under any partitioning, the classic reaggregation-safe sketch; the
final table is <= 2^P rows however large the corpus.
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray.data

from ifctordf_ray.sources.transcripts import clean_read_parquet as _clean_read_parquet
from ifctordf_ray.stages.textstats import WORD_RE

HLL_P = 8  # 2^8 = 256 buckets
_REM_BITS = 64 - HLL_P
_REM_MASK = (1 << _REM_BITS) - 1


def _rank(h: int) -> tuple[int, int]:
    """hash -> (bucket, rank): bucket = top P bits; rank = leading-zero
    count of the remaining 56 bits + 1 (57 when the remainder is 0)."""
    bucket = h >> _REM_BITS
    rem = h & _REM_MASK
    return bucket, (_REM_BITS + 1) if rem == 0 else (_REM_BITS + 1 - rem.bit_length())


class _RegisterPartials:
    """map_batches combiner: batch text -> per-bucket max rank."""

    def __init__(self):
        self.word_re = re.compile(WORD_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ifctordf_ray.functions.kernels import stable_hash64

        regs: dict[int, int] = {}
        for t in batch["text"].to_pylist():
            for w in set(self.word_re.findall((t or "").lower())):
                b, r = _rank(stable_hash64(w))
                if r > regs.get(b, 0):
                    regs[b] = r
        return pa.table(
            {
                "bucket": pa.array(list(regs.keys()), pa.int64()),
                "max_rank": pa.array(list(regs.values()), pa.int64()),
            }
        )


def hll_registers(sf_dir: str) -> ray.data.Dataset:
    """(bucket, max_rank) HLL registers over the corpus's word stream."""
    from ray.data.aggregate import Max as _Max

    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return (
        ds.map_batches(_RegisterPartials, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0)
        .groupby("bucket")
        .aggregate(_Max("max_rank", alias_name="max_rank"))
    )


def hll_registers_sql() -> str:
    rem_bits, mask = _REM_BITS, _REM_MASK
    return f"""
    WITH w AS (
        SELECT DISTINCT
               unnest(regexp_extract_all(lower(coalesce(text, '')), '{WORD_RE}'))
                   AS word
        FROM documents
    ),
    h AS (SELECT md5_number_upper(word) AS h FROM w),
    r AS (
        SELECT CAST(h >> {rem_bits} AS BIGINT) AS bucket,
               CASE WHEN (h & {mask}) = 0 THEN {rem_bits + 1}
                    ELSE {rem_bits + 1} - length(bin(h & {mask}))
               END AS rank
        FROM h
    )
    SELECT bucket, CAST(max(rank) AS BIGINT) AS max_rank
    FROM r GROUP BY bucket
    """


def hll_estimate(registers: list[tuple[int, int]], p: int = HLL_P) -> float:
    """Standard HLL estimator (Flajolet et al. 2007) with small-range
    linear-counting correction, summed in bucket order (deterministic)."""
    import math

    m = 1 << p
    regs = dict(registers)
    zeros = m - len(regs)
    s = 0.0
    for b in range(m):
        s += 2.0 ** -regs.get(b, 0)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / s
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return est


# ---------------------------------------------------------------------------
# Count-min sketch: approximate word-frequency table (the heavy-hitter
# companion to HLL's distinct count).  Same mergeable-state discipline:
# each batch emits at most DEPTH x WIDTH partial-counter rows regardless
# of token volume, partials merge by SUM under any partitioning, and the
# final sketch is <= DEPTH x WIDTH rows however large the corpus.  Hashes
# are md5-derived (row-salted), so the sketch has an exact SQL oracle;
# the point-estimate (min over rows) lives in ``cms_estimate`` and is
# tested against true counts in pytest.
# ---------------------------------------------------------------------------
CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_bucket(row: int, word: str) -> int:
    from ifctordf_ray.functions.kernels import stable_hash64

    return stable_hash64(f"{row}:{word}") % CMS_WIDTH


class _CmsPartials:
    """map_batches combiner: batch text -> per-(row, bucket) count sums
    (word multiplicity INCLUDED — frequency, not distinct)."""

    def __init__(self):
        self.word_re = re.compile(WORD_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        wc: Counter = Counter()
        for t in batch["text"].to_pylist():
            wc.update(self.word_re.findall((t or "").lower()))
        cells: dict[tuple[int, int], int] = {}
        for w, n in wc.items():
            for d in range(CMS_DEPTH):
                key = (d, _cms_bucket(d, w))
                cells[key] = cells.get(key, 0) + n
        return pa.table(
            {
                "sketch_row": pa.array([k[0] for k in cells], pa.int64()),
                "bucket": pa.array([k[1] for k in cells], pa.int64()),
                "total": pa.array(list(cells.values()), pa.int64()),
            }
        )


def cms_registers(sf_dir: str) -> ray.data.Dataset:
    """(sketch_row, bucket, total): count-min sketch of the corpus word
    stream."""
    from ray.data.aggregate import Sum as _Sum

    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return (
        ds.map_batches(
            _CmsPartials, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0
        )
        .groupby(["sketch_row", "bucket"])
        .aggregate(_Sum("total", alias_name="total"))
    )


def cms_registers_sql() -> str:
    return f"""
    WITH w AS (
        SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '{WORD_RE}'))
                   AS word
        FROM documents
    ),
    c AS (SELECT word, count(*) AS n FROM w GROUP BY word),
    d AS (SELECT unnest(range({CMS_DEPTH})) AS sketch_row),
    b AS (
        SELECT d.sketch_row,
               CAST(md5_number_upper(CAST(d.sketch_row AS VARCHAR) || ':' || c.word)
                    % {CMS_WIDTH} AS BIGINT) AS bucket,
               c.n
        FROM c CROSS JOIN d
    )
    SELECT CAST(sketch_row AS BIGINT) AS sketch_row, bucket,
           CAST(sum(n) AS BIGINT) AS total
    FROM b GROUP BY sketch_row, bucket
    """


def cms_estimate(cells: list[tuple[int, int, int]], word: str) -> int:
    """Point query: min over rows of the word's cell — the classic CMS
    overestimate-only guarantee."""
    table = {(r, b): t for r, b, t in cells}
    return min(
        table.get((d, _cms_bucket(d, word)), 0) for d in range(CMS_DEPTH)
    )


# ---------------------------------------------------------------------------
# Grouped HLL: per-day distinct-user registers (mergeable sketch per group)
# ---------------------------------------------------------------------------
class _DauRegisterPartials:
    """map_batches combiner for the GROUPED sketch: batch events ->
    per-(day, bucket) max rank.  Each batch emits at most
    groups_in_batch * 2^P rows however many events it holds; user-id
    hashes are cached per actor (ids repeat across batches)."""

    def __init__(self):
        self._hash_cache: dict[int, tuple[int, int]] = {}

    def _bucket_rank(self, uid: int) -> tuple[int, int]:
        br = self._hash_cache.get(uid)
        if br is None:
            from ifctordf_ray.functions.kernels import stable_hash64

            br = _rank(stable_hash64(str(uid)))
            if len(self._hash_cache) > 1_000_000:  # bound actor memory
                self._hash_cache.clear()
            self._hash_cache[uid] = br
        return br

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # day handled as int64 epoch-micros inside the combiner (no
        # datetime<->pylist precision round-trips); the pipeline pins it
        # back to timestamp[us] after the groupby
        day = pc.cast(
            pc.cast(pc.floor_temporal(batch["ts"], unit="day"), pa.timestamp("us")),
            pa.int64(),
        )
        dedup = (
            pa.table({"day_us": day, "user_id": batch["user_id"]})
            .group_by(["day_us", "user_id"])
            .aggregate([])
        )
        regs: dict[tuple, int] = {}
        for d, uid in zip(dedup["day_us"].to_pylist(), dedup["user_id"].to_pylist()):
            b, r = self._bucket_rank(uid)
            key = (d, b)
            if r > regs.get(key, 0):
                regs[key] = r
        days, buckets, ranks = [], [], []
        for (d, b), r in regs.items():
            days.append(d)
            buckets.append(b)
            ranks.append(r)
        return pa.table(
            {
                "day_us": pa.array(days, pa.int64()),
                "bucket": pa.array(buckets, pa.int64()),
                "max_rank": pa.array(ranks, pa.int64()),
            }
        )


def dau_hll_registers(sf_dir: str) -> ray.data.Dataset:
    """(day, bucket, max_rank): per-DAY HyperLogLog registers over
    distinct user ids — the grouped-sketch shape: partial registers
    combine map-side per (day, bucket), the groupby moves at most
    days * 2^P combiner rows, and per-day registers stay MAX-mergeable
    under any repartitioning (the mergeability daily_active_users's
    exact two-level distinct cannot offer at 100 TB).  The float
    estimate derives from the registers via hll_estimate, out of the
    hash gate like the global sketch."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max as _Max

    ds = _clean_read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    out = (
        ds.map_batches(
            _DauRegisterPartials,
            batch_format="pyarrow",
            concurrency=(1, 4),
            max_restarts=0,  # silence ray#53727 actor-restart warning
        )
        .groupby(["day_us", "bucket"])
        .aggregate(_Max("max_rank", alias_name="max_rank"))
    )
    # restore the day dtype from the combiner's epoch-micros key
    return out.map_batches(
        lambda t: pa.table(
            {
                "day": pc.cast(t["day_us"], pa.timestamp("us")),
                "bucket": t["bucket"],
                "max_rank": t["max_rank"],
            }
        ),
        batch_format="pyarrow",
    )


def dau_hll_registers_sql() -> str:
    rem_bits, mask = _REM_BITS, _REM_MASK
    return f"""
    WITH du AS (
        SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    h AS (SELECT day, md5_number_upper(CAST(user_id AS VARCHAR)) AS h FROM du),
    r AS (
        SELECT day,
               CAST(h >> {rem_bits} AS BIGINT) AS bucket,
               CASE WHEN (h & {mask}) = 0 THEN {rem_bits + 1}
                    ELSE {rem_bits + 1} - length(bin(h & {mask}))
               END AS rank
        FROM h
    )
    SELECT day, bucket, CAST(max(rank) AS BIGINT) AS max_rank
    FROM r GROUP BY day, bucket
    """


# ---------------------------------------------------------------------------
# Heavy hitters: the CMS consumed as a query (sketch -> candidate filter)
# ---------------------------------------------------------------------------
HH_MIN_EST = 100


def heavy_hitters(sf_dir: str, min_est: int = HH_MIN_EST) -> ray.data.Dataset:
    """(word, est): vocabulary words whose count-min point estimate is at
    least ``min_est`` — the sketch-query composition: the DEPTHxWIDTH
    register table (<= 1024 rows however large the corpus) is built by
    cms_registers, broadcast once, and probed per vocabulary word in a
    streaming map.  CMS only overestimates, so the filter never loses a
    true heavy hitter (the guarantee tested in test_sketches)."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count as _Count

    cells = [
        (r["sketch_row"], r["bucket"], r["total"])
        for r in cms_registers(sf_dir).take_all()  # sketch-sized: <= D*W rows
    ]
    table = {(r, b): t for r, b, t in cells}
    cms_ref = ray.put(table)

    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def batch_vocab(t: pa.Table) -> pa.Table:
        from ifctordf_ray.functions.kernels import word_runs

        _, flat = word_runs(t["text"])
        return pa.table({"word": flat}).group_by(["word"]).aggregate([])

    vocab = (
        ds.map_batches(batch_vocab, batch_format="pyarrow")
        .groupby("word")
        .aggregate(_Count(alias_name="_n"))
    )

    def probe(t: pa.Table, *, ref) -> pa.Table:
        tab = ray.get(ref)
        words = t["word"].to_pylist()
        ests = [
            min(tab.get((d, _cms_bucket(d, w)), 0) for d in range(CMS_DEPTH))
            for w in words
        ]
        out = pa.table(
            {"word": t["word"], "est": pa.array(ests, pa.int64())}
        )
        return out.filter(pc.greater_equal(out["est"], min_est))

    return vocab.map_batches(
        probe, fn_kwargs={"ref": cms_ref}, batch_format="pyarrow"
    )


def heavy_hitters_sql(min_est: int = HH_MIN_EST) -> str:
    return f"""
    WITH w AS (
        SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '{WORD_RE}'))
                   AS word
        FROM documents
    ),
    c AS (SELECT word, count(*) AS n FROM w GROUP BY word),
    d AS (SELECT unnest(range({CMS_DEPTH})) AS sketch_row),
    b AS (
        SELECT d.sketch_row,
               CAST(md5_number_upper(CAST(d.sketch_row AS VARCHAR) || ':' || c.word)
                    % {CMS_WIDTH} AS BIGINT) AS bucket,
               c.n
        FROM c CROSS JOIN d
    ),
    cells AS (
        SELECT sketch_row, bucket, CAST(sum(n) AS BIGINT) AS total
        FROM b GROUP BY sketch_row, bucket
    ),
    probes AS (
        SELECT c.word, d.sketch_row,
               CAST(md5_number_upper(CAST(d.sketch_row AS VARCHAR) || ':' || c.word)
                    % {CMS_WIDTH} AS BIGINT) AS bucket
        FROM c CROSS JOIN d
    ),
    est AS (
        SELECT p.word, CAST(min(cl.total) AS BIGINT) AS est
        FROM probes p JOIN cells cl
          ON p.sketch_row = cl.sketch_row AND p.bucket = cl.bucket
        GROUP BY p.word
    )
    SELECT word, est FROM est WHERE est >= {min_est}
    """


# ---------------------------------------------------------------------------
# Table-audit checksum: the cross-replica content-verification fingerprint
# (how two 100-TB copies on different clusters are compared without moving
# either).  Per-row stable hash -> 256 audit buckets -> per-bucket
# (row count, modular hash sum).  Order-independent (sums commute),
# mergeable across any partitioning, and corruption LOCALIZES to a
# bucket so only 1/256 of the table needs re-shipping on mismatch.
# ---------------------------------------------------------------------------
AUDIT_BUCKETS = 256
_AUDIT_P = 1_000_000_007  # keeps per-bucket sums < 2^63 up to ~9e9 rows/bucket
_AUDIT_SEP = "\x1f"
_AUDIT_NULL = "\x00"


class _AuditHasher:
    """Actor-pool stage: per-row md5-derived hash (same md5_number_upper
    spec as every hash operator here) -> per-batch per-bucket partial
    (n_rows, hash_sum) — the map-side combine that keeps the exchange at
    256 rows per block."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from ifctordf_ray.functions.kernels import stable_hash64

        buckets = np.zeros(AUDIT_BUCKETS, dtype=np.int64)
        sums = np.zeros(AUDIT_BUCKETS, dtype=np.int64)
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            key = f"{did}{_AUDIT_SEP}{_AUDIT_NULL if text is None else text}"
            h = stable_hash64(key)
            b = h % AUDIT_BUCKETS
            buckets[b] += 1
            sums[b] = (sums[b] + (h // AUDIT_BUCKETS) % _AUDIT_P) % _AUDIT_P
        return pa.table(
            {
                "bucket": pa.array(np.arange(AUDIT_BUCKETS, dtype=np.int64)),
                "n_rows": pa.array(buckets),
                "hash_sum": pa.array(sums),
            }
        )


def table_checksum(sf_dir: str) -> ray.data.Dataset:
    """(bucket, n_rows, hash_sum) x 256 over the documents table.  The
    modular per-bucket sum folds under the final Sum groupby exactly
    because (a+b) mod P folds — re-applied once more after the global
    sum for the canonical value."""
    from ray.data.aggregate import Sum as _Sum

    ds = _clean_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    partials = ds.map_batches(
        _AuditHasher, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0
    )
    agg = partials.groupby("bucket").aggregate(
        _Sum("n_rows", alias_name="n_rows"),
        _Sum("hash_sum", alias_name="hash_sum"),
    )

    def fold(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # drop never-hit buckets (the SQL arm only emits buckets with rows)
        t = t.filter(pc.greater(t["n_rows"], 0))
        hs = pc.cast(t["hash_sum"], pa.int64())
        p = pa.scalar(_AUDIT_P, pa.int64())
        # h mod P via trunc-divide (all values non-negative)
        hmod = pc.subtract(hs, pc.multiply(pc.divide(hs, p), p))
        return pa.table(
            {
                "bucket": t["bucket"],
                "n_rows": pc.cast(t["n_rows"], pa.int64()),
                "hash_sum": hmod,
            }
        )

    return agg.map_batches(fold, batch_format="pyarrow")


def table_checksum_sql() -> str:
    return f"""
    SELECT CAST(h % {AUDIT_BUCKETS} AS BIGINT) AS bucket,
           count(*) AS n_rows,
           CAST(sum((h // {AUDIT_BUCKETS}) % {_AUDIT_P}) % {_AUDIT_P} AS BIGINT)
               AS hash_sum
    FROM (
        SELECT md5_number_upper(
                   CAST(doc_id AS VARCHAR) || chr(31)
                   || coalesce(text, chr(0))) AS h
        FROM documents
    )
    GROUP BY h % {AUDIT_BUCKETS}
    """


# ---------------------------------------------------------------------------
# Mergeable fixed-bin histogram sketch -> grouped approximate quantiles
# ---------------------------------------------------------------------------
HIST_BIN_CENTS = 500  # $5-wide value bins


def hist_quantiles(sf_dir: str, bin_cents: int = HIST_BIN_CENTS) -> ray.data.Dataset:
    """(event_type, total, p50_bin, p90_bin): per-group approximate
    quantiles from a MERGEABLE fixed-width histogram — the
    t-digest/KLL-family answer for quantiles over data too large to
    sort, reduced to its deterministic core so it has an exact SQL
    oracle.  Registers are (group, bin) counts: per-block partial
    histograms merge by SUM under any partitioning (reaggregation-safe,
    like the HLL/CMS registers above); the register table is
    #groups x #bins however large the input.  pXX_bin = first bin whose
    cumulative count reaches the rank (integer cross-multiplication, no
    floats anywhere)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum as _Sum

    from ifctordf_ray.functions.kernels import cents as _cents

    ev = _clean_read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial_hist(t: pa.Table) -> pa.Table:
        bins = pc.divide(_cents(t["value"]), bin_cents)  # int division
        return (
            pa.table({"event_type": t["event_type"], "bin": bins})
            .group_by(["event_type", "bin"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "bin", "n"])
        )

    registers = (
        ev.map_batches(partial_hist, batch_format="pyarrow")
        .groupby(["event_type", "bin"])
        .aggregate(_Sum("n", alias_name="n"))
    )

    def quantiles(g: pa.Table) -> pa.Table:
        import numpy as np

        g = g.sort_by([("bin", "ascending")])
        n = g["n"].to_numpy().astype(np.int64)
        bins = g["bin"].to_numpy().astype(np.int64)
        cum = np.cumsum(n)
        total = int(cum[-1])
        p50 = int(bins[np.argmax(cum * 2 >= total)])
        p90 = int(bins[np.argmax(cum * 10 >= total * 9)])
        return pa.table(
            {
                "event_type": g["event_type"].slice(0, 1),
                "total": pa.array([total], pa.int64()),
                "p50_bin": pa.array([p50], pa.int64()),
                "p90_bin": pa.array([p90], pa.int64()),
            }
        )

    return registers.groupby("event_type").map_groups(
        quantiles, batch_format="pyarrow"
    )


def hist_quantiles_sql(bin_cents: int = HIST_BIN_CENTS) -> str:
    return f"""
    WITH b AS (
        SELECT event_type,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) // {bin_cents} AS bin,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    c AS (
        SELECT event_type, bin, n,
               sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
               sum(n) OVER (PARTITION BY event_type) AS total
        FROM b
    )
    SELECT event_type,
           CAST(max(total) AS BIGINT) AS total,
           CAST(min(CASE WHEN cum * 2 >= total THEN bin END) AS BIGINT) AS p50_bin,
           CAST(min(CASE WHEN cum * 10 >= total * 9 THEN bin END) AS BIGINT) AS p90_bin
    FROM c GROUP BY event_type
    """
