"""Multimodal columns: opaque binary payloads + typed metadata, with REAL
dependency-free decoders.

Images/audio are carried as `binary` columns with a sidecar metadata
struct (media_type, codec, dims).  Decode is real for one trivial format
per modality — no codec libraries needed:

- image: binary PPM (P6) — header `P6\\n<w> <h>\\n255\\n` + raw RGB bytes,
  parsed with a header regex + np.frombuffer.
- audio: canonical 44-byte RIFF/WAV header, 16-bit mono PCM — parsed with
  struct.unpack + np.frombuffer('<i2').

The engine's media table is DERIVED deterministically from the documents
table (payload bytes come from the document text), so the whole
decode -> feature path has an exact DuckDB oracle: every feature below is
an INTEGER statistic (sums, counts, extrema) — exact in numpy int64 and
DuckDB BIGINT alike, no float summation-order hazard.

Scale notes: binary rows are large, so these stages use SMALL batch
sizes (default 64) and actor pools sized so batch x concurrency fits the
worker heap; blocks of binary columns flow with batch_format="pyarrow"
(pandas would copy to object dtype).

Reference analog: the typed-literal decode dispatch of RDFWriter.java:
674-704 — here the "schema" is the media container header and the typed
output is the feature row; golden-style certification mirrors
TestIfcSpfReader.java:102-151 via the SQL oracle + fixture round-trips.
"""

from __future__ import annotations

import hashlib
import re
import struct

import numpy as np
import pyarrow as pa
import ray.data
from ifctordf_ray.sources.transcripts import clean_read_parquet as _clean_read_parquet

MEDIA_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("media_type", pa.string()),   # "image" | "audio"
        ("payload", pa.binary()),
        ("meta", pa.string()),         # JSON sidecar (codec, dims, ...)
    ]
)

EMBED_DIM = 16

# --- payload geometry (fixed-shape derived media; see media_from_documents)
PPM_W = PPM_H = 8
N_PIX_BYTES = PPM_W * PPM_H * 3          # 192 RGB bytes
_PPM_HEADER = b"P6\n%d %d\n255\n" % (PPM_W, PPM_H)   # 11 bytes
WAV_SR = 8000
WAV_N = 128                              # samples
PAD_BYTE = 0x20                          # pad short docs with ' '

_PPM_HEAD_RE = re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s")
_NON_PRINTABLE = re.compile(r"[^ -~]")   # canonicalize to printable ASCII


# ---------------------------------------------------------------------------
# real codecs (encode for the derived table, decode for the feature stage)
# ---------------------------------------------------------------------------
def encode_ppm(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM (P6) bytes."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (H, W, 3) uint8.  Real parse: header fields are
    read from the payload, not assumed."""
    m = _PPM_HEAD_RE.match(payload)
    if not m:
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    body = payload[m.end() : m.end() + need]
    if len(body) != need:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(body, np.uint8).reshape(h, w, 3)


_WAV_HDR = struct.Struct("<4sI4s4sIHHIIHH4sI")  # canonical 44-byte header


def encode_wav(samples: np.ndarray, sample_rate: int = WAV_SR) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM bytes (canonical header)."""
    data = samples.astype("<i2").tobytes()
    hdr = _WAV_HDR.pack(
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 mono -> (sample_rate, int16 samples).  Real parse
    with container validation."""
    if len(payload) < _WAV_HDR.size:
        raise ValueError("truncated WAV header")
    (riff, _size, wave, fmt_tag, fmt_size, audio_fmt, n_ch, sr,
     _brate, _align, bits, data_tag, dlen) = _WAV_HDR.unpack(
        payload[: _WAV_HDR.size]
    )
    if riff != b"RIFF" or wave != b"WAVE" or fmt_tag != b"fmt ":
        raise ValueError("not a RIFF/WAVE payload")
    if (audio_fmt, n_ch, bits, data_tag) != (1, 1, 16, b"data"):
        raise ValueError("only 16-bit mono PCM with a canonical header is supported")
    body = payload[_WAV_HDR.size : _WAV_HDR.size + dlen]
    if len(body) != dlen:
        raise ValueError("truncated WAV sample data")
    return sr, np.frombuffer(body, "<i2")


# ---------------------------------------------------------------------------
# feature extraction (integer-exact -> SQL-oracle-able)
# ---------------------------------------------------------------------------
FEATURE_FIELDS = [
    ("item_id", pa.int64()),
    ("media_type", pa.string()),
    ("payload_bytes", pa.int64()),
    # generic slots (image / audio semantics):
    ("dim_a", pa.int64()),   # width           / sample_rate
    ("dim_b", pa.int64()),   # height          / n_samples
    ("sum_a", pa.int64()),   # sum of R bytes  / sum |s|
    ("sum_b", pa.int64()),   # sum of G bytes  / sum s^2
    ("sum_c", pa.int64()),   # sum of B bytes  / zero crossings
    ("v_min", pa.int64()),   # min byte        / min sample
    ("v_max", pa.int64()),   # max byte        / max sample
]


def image_features(payload: bytes) -> tuple[int, ...]:
    img = decode_ppm(payload)
    h, w, _ = img.shape
    i64 = img.astype(np.int64)
    ch = i64.sum(axis=(0, 1))
    return (w, h, int(ch[0]), int(ch[1]), int(ch[2]),
            int(i64.min()), int(i64.max()))


def audio_features(payload: bytes) -> tuple[int, ...]:
    sr, s = decode_wav(payload)
    s64 = s.astype(np.int64)
    neg = s64 < 0
    zc = int(np.count_nonzero(neg[1:] != neg[:-1]))
    return (sr, len(s64), int(np.abs(s64).sum()), int((s64 * s64).sum()),
            zc, int(s64.min()), int(s64.max()))


class MediaFeaturizer:
    """Actor-pool stage: REAL container decode (PPM / WAV) -> integer
    feature row.  One actor per pool member; batches stay Arrow."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {n: [] for n, _ in FEATURE_FIELDS}
        for item, mtype, payload in zip(
            batch["item_id"].to_pylist(),
            batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if mtype == "image":
                feats = image_features(payload)
            elif mtype == "audio":
                feats = audio_features(payload)
            else:
                raise ValueError(f"unknown media_type {mtype!r}")
            row = (item, mtype, len(payload), *feats)
            for (name, _), v in zip(FEATURE_FIELDS, row):
                cols[name].append(v)
        return pa.table(
            {name: pa.array(cols[name], typ) for name, typ in FEATURE_FIELDS}
        )


def featurize_media(
    media: ray.data.Dataset,
    batch_size: int = 64,
    concurrency=(1, 4),
    max_restarts=0,
) -> ray.data.Dataset:
    """media Dataset (MEDIA_SCHEMA) -> feature Dataset.  Small batches:
    binary payloads are large; batch x concurrency must fit worker heap."""
    return media.map_batches(
        MediaFeaturizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        max_restarts=0,
    )


# ---------------------------------------------------------------------------
# derived media table (real payloads, deterministic, no external inputs)
# ---------------------------------------------------------------------------
def _canon_bytes(text: str | None) -> bytes:
    """Printable-ASCII canonical bytes of a document's text — the same
    char-wise transform the SQL oracle applies (regexp_replace to ' ')."""
    return _NON_PRINTABLE.sub(" ", text or "").encode("ascii")


def text_to_ppm(text: str | None) -> bytes:
    b = _canon_bytes(text)
    buf = (b + bytes([PAD_BYTE]) * N_PIX_BYTES)[:N_PIX_BYTES]
    return encode_ppm(np.frombuffer(buf, np.uint8).reshape(PPM_H, PPM_W, 3))


def text_to_wav(text: str | None) -> bytes:
    b = _canon_bytes(text)
    buf = (b + bytes([PAD_BYTE]) * WAV_N)[:WAV_N]
    # center around 'a' (0x61) and scale into int16 range
    samples = (np.frombuffer(buf, np.uint8).astype(np.int64) - 0x61) * 256
    return encode_wav(samples.astype(np.int16))


def synthetic_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic REAL media payloads for tests: random pixel images
    (PPM) and random-walk waveforms (WAV)."""
    rng = np.random.RandomState(seed)
    items, types, payloads, metas = [], [], [], []
    for i in range(n):
        if i % 2 == 0:
            img = rng.randint(0, 256, size=(PPM_H, PPM_W, 3), dtype=np.uint8)
            payloads.append(encode_ppm(img))
            types.append("image")
            metas.append('{"codec": "ppm", "w": %d, "h": %d}' % (PPM_W, PPM_H))
        else:
            samples = np.cumsum(rng.randint(-500, 501, size=WAV_N)).astype(np.int16)
            payloads.append(encode_wav(samples))
            types.append("audio")
            metas.append('{"codec": "pcm16", "sr": %d}' % WAV_SR)
        items.append(i)
    return pa.table(
        {
            "item_id": pa.array(items, pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, pa.string()),
        }
    )


def media_from_documents(sf_dir: str) -> ray.data.Dataset:
    """Deterministic media table DERIVED from the real documents table:
    even doc_id -> an 8x8 binary PPM whose pixel bytes are the document's
    printable-ASCII text (padded with spaces), odd doc_id -> a 128-sample
    16-bit PCM WAV whose samples are text-byte-derived.  Payloads are
    REAL container files (decodable by any PPM/WAV reader), derived with
    no external inputs so the decode path has an exact SQL oracle."""
    ds = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def to_media(t: pa.Table) -> pa.Table:
        doc_id = t["doc_id"]
        texts = t["text"].to_pylist()
        ids = doc_id.to_pylist()
        payloads, kinds, metas = [], [], []
        for i, s in zip(ids, texts):
            if i % 2 == 0:
                payloads.append(text_to_ppm(s))
                kinds.append("image")
                metas.append('{"codec": "ppm", "w": %d, "h": %d}' % (PPM_W, PPM_H))
            else:
                payloads.append(text_to_wav(s))
                kinds.append("audio")
                metas.append('{"codec": "pcm16", "sr": %d}' % WAV_SR)
        return pa.table(
            {
                "item_id": doc_id,
                "media_type": pa.array(kinds, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "meta": pa.array(metas, pa.string()),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow")


def media_features(sf_dir: str) -> ray.data.Dataset:
    """queries() entry: real PPM/WAV decode + integer feature extraction
    over the derived media table — exact DuckDB oracle
    (media_features_sql)."""
    return featurize_media(media_from_documents(sf_dir))


_IMG_PAYLOAD_BYTES = len(_PPM_HEADER) + N_PIX_BYTES   # 203
_WAV_PAYLOAD_BYTES = _WAV_HDR.size + 2 * WAV_N        # 300


def media_features_sql() -> str:
    """Exact replica: reconstruct the payload byte streams from the text
    (the same canonicalization + padding), aggregate the same integer
    features.  DuckDB sum() returns HUGEINT — cast back to BIGINT."""
    return f"""
WITH t AS (
    SELECT doc_id,
           regexp_replace(coalesce(text, ''), '[^ -~]', ' ', 'g') AS txt
    FROM documents
),
ib AS (
    SELECT doc_id, i,
           CASE WHEN i <= length(txt) THEN unicode(substr(txt, i, 1))
                ELSE {PAD_BYTE} END AS b
    FROM t CROSS JOIN (SELECT unnest(range(1, {N_PIX_BYTES + 1})) AS i)
    WHERE doc_id % 2 = 0
),
img AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN (i-1) % 3 = 0 THEN b ELSE 0 END) AS BIGINT) AS sum_a,
           CAST(sum(CASE WHEN (i-1) % 3 = 1 THEN b ELSE 0 END) AS BIGINT) AS sum_b,
           CAST(sum(CASE WHEN (i-1) % 3 = 2 THEN b ELSE 0 END) AS BIGINT) AS sum_c,
           CAST(min(b) AS BIGINT) AS v_min,
           CAST(max(b) AS BIGINT) AS v_max
    FROM ib GROUP BY doc_id
),
ab AS (
    SELECT doc_id, i,
           (CASE WHEN i <= length(txt) THEN unicode(substr(txt, i, 1))
                 ELSE {PAD_BYTE} END - {0x61}) * 256 AS s
    FROM t CROSS JOIN (SELECT unnest(range(1, {WAV_N + 1})) AS i)
    WHERE doc_id % 2 = 1
),
aw AS (
    SELECT doc_id, i, s,
           lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS ls
    FROM ab
),
aud AS (
    SELECT doc_id,
           CAST(sum(abs(s)) AS BIGINT) AS sum_a,
           CAST(sum(s * s) AS BIGINT) AS sum_b,
           CAST(sum(CASE WHEN ls IS NOT NULL AND (s < 0) != (ls < 0)
                         THEN 1 ELSE 0 END) AS BIGINT) AS sum_c,
           CAST(min(s) AS BIGINT) AS v_min,
           CAST(max(s) AS BIGINT) AS v_max
    FROM aw GROUP BY doc_id
)
SELECT doc_id AS item_id, 'image' AS media_type,
       CAST({_IMG_PAYLOAD_BYTES} AS BIGINT) AS payload_bytes,
       CAST({PPM_W} AS BIGINT) AS dim_a, CAST({PPM_H} AS BIGINT) AS dim_b,
       sum_a, sum_b, sum_c, v_min, v_max
FROM img
UNION ALL
SELECT doc_id, 'audio',
       CAST({_WAV_PAYLOAD_BYTES} AS BIGINT),
       CAST({WAV_SR} AS BIGINT), CAST({WAV_N} AS BIGINT),
       sum_a, sum_b, sum_c, v_min, v_max
FROM aud
"""


class MediaStats:
    """Actor-pool stage over the binary media table: per-item byte count
    + content digest — the decode-free half of the multimodal plumbing,
    exactly SQL-replicable.  The digest is md5 over the LOWERCASE HEX of
    the payload (not the raw bytes): DuckDB's md5() only accepts VARCHAR
    and raw media bytes aren't valid UTF-8, so both engines hash the same
    faithful text encoding of the bytes instead."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        return pa.table(
            {
                "item_id": batch["item_id"],
                "media_type": batch["media_type"],
                "payload_bytes": pa.array([len(p) for p in payloads], pa.int64()),
                "payload_md5": pa.array(
                    [hashlib.md5(p.hex().encode()).hexdigest() for p in payloads],
                    pa.string(),
                ),
            }
        )


def media_stats(sf_dir: str, batch_size: int = 64) -> ray.data.Dataset:
    """queries() entry: binary-column stats over the derived media table
    (small batches — binary rows are large)."""
    return media_from_documents(sf_dir).map_batches(
        MediaStats, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, 4),
        max_restarts=0,
    )


def media_stats_sql() -> str:
    """The digest is over the REAL container bytes (as lowercase hex —
    see MediaStats), so the oracle reconstructs those bytes in SQL: PPM
    header || padded text bytes for images; for audio the 44-byte header
    + little-endian int16 sample bytes are hex-built from the text the
    same way the engine builds them."""
    hdr_hex = _PPM_HEADER.hex()
    wav_hdr_hex = encode_wav(np.zeros(WAV_N, np.int16))[:44].hex()
    return f"""
WITH t AS (
    SELECT doc_id,
           regexp_replace(coalesce(text, ''), '[^ -~]', ' ', 'g') AS txt
    FROM documents
),
ibh AS (
    -- image pixel bytes as lowercase hex, in order
    SELECT doc_id, i,
           lpad(lower(to_hex(CASE WHEN i <= length(txt)
                                  THEN unicode(substr(txt, i, 1))
                                  ELSE {PAD_BYTE} END)), 2, '0') AS hx
    FROM t CROSS JOIN (SELECT unnest(range(1, {N_PIX_BYTES + 1})) AS i)
    WHERE doc_id % 2 = 0
),
img AS (
    SELECT doc_id,
           md5('{hdr_hex}' || string_agg(hx, '' ORDER BY i)) AS payload_md5
    FROM ibh GROUP BY doc_id
),
ab AS (
    SELECT doc_id, i,
           (CASE WHEN i <= length(txt) THEN unicode(substr(txt, i, 1))
                 ELSE {PAD_BYTE} END - {0x61}) * 256 AS s
    FROM t CROSS JOIN (SELECT unnest(range(1, {WAV_N + 1})) AS i)
    WHERE doc_id % 2 = 1
),
awb AS (
    -- int16 little-endian bytes of each sample (two's complement) as hex
    SELECT doc_id, i,
           lpad(lower(to_hex(((s + 65536) % 65536) % 256)), 2, '0') ||
           lpad(lower(to_hex(((s + 65536) % 65536) // 256)), 2, '0') AS hx
    FROM ab
),
wav AS (
    SELECT doc_id,
           md5('{wav_hdr_hex}' || string_agg(hx, '' ORDER BY i)) AS payload_md5
    FROM awb GROUP BY doc_id
)
SELECT doc_id AS item_id, 'image' AS media_type,
       CAST({_IMG_PAYLOAD_BYTES} AS BIGINT) AS payload_bytes, payload_md5
FROM img
UNION ALL
SELECT doc_id, 'audio', CAST({_WAV_PAYLOAD_BYTES} AS BIGINT), payload_md5
FROM wav
"""


# ---------------------------------------------------------------------------
# Media transforms (resize / sample): REAL transformations over decoded
# containers, re-encoded to real containers.  Actor-pool map stage.
# ---------------------------------------------------------------------------
RESIZE_FACTOR = 2


def resize_image_nn(img: np.ndarray, factor: int = RESIZE_FACTOR) -> np.ndarray:
    """Nearest-neighbor downsample (keep every `factor`-th row/col)."""
    return img[::factor, ::factor, :]


def downsample_audio(samples: np.ndarray, factor: int = RESIZE_FACTOR) -> np.ndarray:
    """Frame-sample: keep every `factor`-th sample."""
    return samples[::factor]


class MediaTransformer:
    """Actor-pool stage: decode -> transform (thumbnail / frame-sample)
    -> re-encode to a REAL container; emits byte count + content digest
    (md5 of lowercase hex, the SQL-checkable digest of MediaStats)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        items, kinds, nbytes, digests = [], [], [], []
        for item, mtype, payload in zip(
            batch["item_id"].to_pylist(),
            batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if mtype == "image":
                out = encode_ppm(resize_image_nn(decode_ppm(payload)))
            elif mtype == "audio":
                sr, s = decode_wav(payload)
                out = encode_wav(downsample_audio(s), sr)
            else:
                raise ValueError(f"unknown media_type {mtype!r}")
            items.append(item)
            kinds.append(mtype)
            nbytes.append(len(out))
            digests.append(hashlib.md5(out.hex().encode()).hexdigest())
        return pa.table(
            {
                "item_id": pa.array(items, pa.int64()),
                "media_type": pa.array(kinds, pa.string()),
                "out_bytes": pa.array(nbytes, pa.int64()),
                "out_md5": pa.array(digests, pa.string()),
            }
        )


def media_thumbnails(sf_dir: str, batch_size: int = 64) -> ray.data.Dataset:
    """queries() entry: decode -> nearest-neighbor thumbnail (images) /
    2x frame-sample (audio) -> re-encode, over the derived media table."""
    return media_from_documents(sf_dir).map_batches(
        MediaTransformer, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, 4),
        max_restarts=0,
    )


def media_thumbnails_sql() -> str:
    """Oracle: rebuild the TRANSFORMED container bytes from the text.
    Image: thumbnail pixel j (of 4x4x3=48 bytes, row-major) comes from
    source pixel (2*(j//12), 2*((j%12)//3)) channel j%3 -> source byte
    position p = (2*(j//12)*{PPM_W} + 2*((j%12)//3))*3 + j%3 + 1.
    Audio: output sample t' (of {WAV_N}//2) = source byte at p = 2*t'+1.
    """
    f = RESIZE_FACTOR
    tw, th = PPM_W // f, PPM_H // f           # 4x4 thumb
    n_out_pix = tw * th * 3                   # 48 bytes
    thumb_hdr = (b"P6\n%d %d\n255\n" % (tw, th)).hex()
    n_out_samp = WAV_N // f
    wav_hdr = encode_wav(np.zeros(n_out_samp, np.int16))[:44].hex()
    img_bytes = len(b"P6\n%d %d\n255\n" % (tw, th)) + n_out_pix
    wav_bytes = 44 + 2 * n_out_samp
    return f"""
WITH t AS (
    SELECT doc_id,
           regexp_replace(coalesce(text, ''), '[^ -~]', ' ', 'g') AS txt
    FROM documents
),
ij AS (
    SELECT doc_id, j,
           ({f} * (j // {tw * 3}) * {PPM_W} + {f} * ((j % {tw * 3}) // 3)) * 3
               + (j % 3) + 1 AS p
    FROM t CROSS JOIN (SELECT unnest(range({n_out_pix})) AS j)
    WHERE doc_id % 2 = 0
),
ih AS (
    SELECT doc_id, j,
           lpad(lower(to_hex(CASE WHEN p <= length(txt)
                                  THEN unicode(substr(txt, CAST(p AS INTEGER), 1))
                                  ELSE {PAD_BYTE} END)), 2, '0') AS hx
    FROM ij JOIN t USING (doc_id)
),
img AS (
    SELECT doc_id,
           md5('{thumb_hdr}' || string_agg(hx, '' ORDER BY j)) AS out_md5
    FROM ih GROUP BY doc_id
),
aj AS (
    SELECT doc_id, j, {f} * j + 1 AS p
    FROM t CROSS JOIN (SELECT unnest(range({n_out_samp})) AS j)
    WHERE doc_id % 2 = 1
),
ah AS (
    SELECT doc_id, j,
           ((CASE WHEN p <= length(txt)
                  THEN unicode(substr(txt, CAST(p AS INTEGER), 1))
                  ELSE {PAD_BYTE} END - {0x61}) * 256) AS s
    FROM aj JOIN t USING (doc_id)
),
awb AS (
    SELECT doc_id, j,
           lpad(lower(to_hex(((s + 65536) % 65536) % 256)), 2, '0') ||
           lpad(lower(to_hex(((s + 65536) % 65536) // 256)), 2, '0') AS hx
    FROM ah
),
wav AS (
    SELECT doc_id,
           md5('{wav_hdr}' || string_agg(hx, '' ORDER BY j)) AS out_md5
    FROM awb GROUP BY doc_id
)
SELECT doc_id AS item_id, 'image' AS media_type,
       CAST({img_bytes} AS BIGINT) AS out_bytes, out_md5
FROM img
UNION ALL
SELECT doc_id, 'audio', CAST({wav_bytes} AS BIGINT), out_md5
FROM wav
"""


# ---------------------------------------------------------------------------
# frame sampling: audio -> fixed windows, per-frame integer stats
# ---------------------------------------------------------------------------
FRAME_LEN = 32
N_FRAMES = WAV_N // FRAME_LEN  # 4


class AudioFramer:
    """Actor-pool frame-sample stage: REAL WAV decode -> reshape into
    N_FRAMES fixed windows -> one row per (item, frame) with exact
    integer stats (sum|s|, peak |s|, in-frame zero crossings).  The
    frame-sample analog for video keyframe extraction on the audio
    modality; binary batches stay small (see module scale notes)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        items, frames, sums, peaks, zcs = [], [], [], [], []
        for item, payload in zip(
            batch["item_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            _, s = decode_wav(payload)
            f = s.astype(np.int64).reshape(N_FRAMES, FRAME_LEN)
            neg = f < 0
            zc_per = (neg[:, 1:] != neg[:, :-1]).sum(axis=1)
            a = np.abs(f)
            for k in range(N_FRAMES):
                items.append(item)
                frames.append(k)
                sums.append(int(a[k].sum()))
                peaks.append(int(a[k].max()))
                zcs.append(int(zc_per[k]))
        return pa.table(
            {
                "item_id": pa.array(items, pa.int64()),
                "frame_idx": pa.array(frames, pa.int64()),
                "sum_abs": pa.array(sums, pa.int64()),
                "peak": pa.array(peaks, pa.int64()),
                "n_zero_cross": pa.array(zcs, pa.int64()),
            }
        )


def audio_frames(sf_dir: str, batch_size: int = 64) -> ray.data.Dataset:
    """queries() entry: frame-sample every derived audio item (odd
    doc_id) into N_FRAMES windows with exact per-frame integer stats."""
    media = media_from_documents(sf_dir)

    def audio_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["media_type"], "audio"))

    return media.map_batches(audio_only, batch_format="pyarrow").map_batches(
        AudioFramer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
        max_restarts=0,  # silence ray#53727 actor-restart warning
    )


def audio_frames_sql() -> str:
    """Exact replica: rebuild the sample stream from text (same canon +
    padding + center/scale as text_to_wav), window by (i-1) / FRAME_LEN,
    count in-frame sign changes with a per-(doc, frame) lag."""
    return f"""
WITH t AS (
    SELECT doc_id,
           regexp_replace(coalesce(text, ''), '[^ -~]', ' ', 'g') AS txt
    FROM documents
),
ab AS (
    SELECT doc_id, i,
           CAST((i - 1) // {FRAME_LEN} AS BIGINT) AS frame_idx,
           (CASE WHEN i <= length(txt) THEN unicode(substr(txt, i, 1))
                 ELSE {PAD_BYTE} END - {0x61}) * 256 AS s
    FROM t CROSS JOIN (SELECT unnest(range(1, {WAV_N + 1})) AS i)
    WHERE doc_id % 2 = 1
),
aw AS (
    SELECT doc_id, frame_idx, s,
           lag(s) OVER (PARTITION BY doc_id, frame_idx ORDER BY i) AS ls
    FROM ab
)
SELECT doc_id AS item_id, frame_idx,
       CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
       CAST(max(abs(s)) AS BIGINT) AS peak,
       CAST(sum(CASE WHEN ls IS NOT NULL AND (s < 0) != (ls < 0)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross
FROM aw GROUP BY doc_id, frame_idx
"""


# ---------------------------------------------------------------------------
# Image histograms: per-image 4-bin byte-luminance distribution
# ---------------------------------------------------------------------------
HIST_BINS = 4  # byte >> 6


class ImageHistogram:
    """Actor-pool stage: decode PPM -> 4-bin histogram of pixel byte
    values (bin = byte // 64) — the color/brightness-profile feature a
    vision-data pipeline computes before filtering/stratifying.  One
    np.bincount per image (vectorized over the decoded buffer); output
    is (item_id, bin, n_bytes) long form, exact integers."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, bins, counts = [], [], []
        for item_id, payload in zip(
            batch["item_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            img = decode_ppm(payload)
            hist = np.bincount(img.ravel() >> 6, minlength=HIST_BINS)
            ids.extend([item_id] * HIST_BINS)
            bins.extend(range(HIST_BINS))
            counts.extend(hist.tolist())
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "bin": pa.array(bins, pa.int64()),
                "n_bytes": pa.array(counts, pa.int64()),
            }
        )


def image_histograms(sf_dir: str, batch_size: int = 64) -> ray.data.Dataset:
    """queries() entry: 4-bin luminance histograms of every image item
    (small batches; image rows only are decoded)."""
    media = media_from_documents(sf_dir)

    def images_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["media_type"], "image"))

    return media.map_batches(images_only, batch_format="pyarrow").map_batches(
        ImageHistogram, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, 4),
        max_restarts=0,
    )


def image_histograms_sql() -> str:
    """Oracle reconstructs each pixel byte from the document text the
    same way media_from_documents does (printable-canon text, PAD for
    short docs), then bins byte // 64."""
    return f"""
WITH t AS (
    SELECT doc_id,
           regexp_replace(coalesce(text, ''), '[^ -~]', ' ', 'g') AS txt
    FROM documents
),
b AS (
    SELECT doc_id,
           (CASE WHEN i <= length(txt) THEN unicode(substr(txt, CAST(i AS INTEGER), 1))
                 ELSE {PAD_BYTE} END) // 64 AS bin
    FROM t CROSS JOIN (SELECT unnest(range(1, {N_PIX_BYTES + 1})) AS i)
    WHERE doc_id % 2 = 0
),
g AS (
    SELECT doc_id, bin, count(*) AS n FROM b GROUP BY 1, 2
),
bins AS (SELECT unnest(range({HIST_BINS})) AS bin),
ids AS (SELECT DISTINCT doc_id FROM b)
SELECT ids.doc_id AS item_id, CAST(bins.bin AS BIGINT) AS bin,
       CAST(coalesce(g.n, 0) AS BIGINT) AS n_bytes
FROM ids CROSS JOIN bins
LEFT JOIN g ON g.doc_id = ids.doc_id AND g.bin = bins.bin
"""


# ---------------------------------------------------------------------------
# Audio spectral energy: a REAL DSP kernel over the WAV decode path — a
# K-bin DFT (re, im, energy per analysis frequency), the feature an
# audio curation pipeline thresholds on (speech/tone/silence balance).
# The twiddle tables are quantized to TRIG_Q integer units, so the whole
# transform is exact order-independent int64 arithmetic: numpy computes
# it as an integer matmul, and the SQL oracle carries the SAME quantized
# tables as literal rows (no libm anywhere near the comparison).
# Magnitudes: |s| <= 16640, so |re| <= 128*16640*TRIG_Q ~= 1.1e9 and
# energy <= 2.4e18 < int64 max — TRIG_Q=512 is chosen for that headroom.
# ---------------------------------------------------------------------------
TRIG_Q = 512
SPECTRAL_BINS = (1, 2, 4, 8)  # DFT bin indices over the WAV_N window


def _dft_tables_q() -> tuple[np.ndarray, np.ndarray]:
    """Quantized (len(SPECTRAL_BINS), WAV_N) int64 cos/sin tables."""
    i = np.arange(WAV_N)
    ks = np.array(SPECTRAL_BINS, np.float64)
    ang = 2.0 * np.pi * np.outer(ks, i) / WAV_N
    c = np.floor(np.cos(ang) * TRIG_Q + 0.5).astype(np.int64)
    s = np.floor(np.sin(ang) * TRIG_Q + 0.5).astype(np.int64)
    return c, s


class AudioSpectral:
    """Actor-pool stage: WAV decode -> integer DFT at SPECTRAL_BINS."""

    def __init__(self):
        self.cos_q, self.sin_q = _dft_tables_q()

    def __call__(self, batch: pa.Table) -> pa.Table:
        items, bins, res, ims, ens = [], [], [], [], []
        for item, payload in zip(
            batch["item_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            _, s = decode_wav(payload)
            s64 = s.astype(np.int64)
            re = self.cos_q @ s64  # exact int64
            im = self.sin_q @ s64
            en = re * re + im * im
            for k, bk in enumerate(SPECTRAL_BINS):
                items.append(item)
                bins.append(bk)
                res.append(int(re[k]))
                ims.append(int(im[k]))
                ens.append(int(en[k]))
        return pa.table(
            {
                "item_id": pa.array(items, pa.int64()),
                "bin_k": pa.array(bins, pa.int64()),
                "re_q": pa.array(res, pa.int64()),
                "im_q": pa.array(ims, pa.int64()),
                "energy_q": pa.array(ens, pa.int64()),
            }
        )


def audio_spectral(sf_dir: str, batch_size: int = 64) -> ray.data.Dataset:
    """queries() entry: K-bin integer DFT energies for every derived
    audio item (odd doc_id)."""
    media = media_from_documents(sf_dir)

    def audio_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["media_type"], "audio"))

    return media.map_batches(audio_only, batch_format="pyarrow").map_batches(
        AudioSpectral,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
        max_restarts=0,  # silence ray#53727 actor-restart warning
    )


def audio_spectral_sql() -> str:
    """Oracle: rebuild the sample stream from text (same canon/pad/scale
    as text_to_wav) and apply the SAME quantized twiddle tables as
    literal rows — exact integer equality, no transcendentals in SQL."""
    cos_q, sin_q = _dft_tables_q()
    vals = ",".join(
        f"({bk},{i},{int(cos_q[k, i])},{int(sin_q[k, i])})"
        for k, bk in enumerate(SPECTRAL_BINS)
        for i in range(WAV_N)
    )
    return f"""
WITH t AS (
    SELECT doc_id,
           regexp_replace(coalesce(text, ''), '[^ -~]', ' ', 'g') AS txt
    FROM documents
),
ab AS (
    SELECT doc_id, i,
           (CASE WHEN i <= length(txt) THEN unicode(substr(txt, CAST(i AS INTEGER), 1))
                 ELSE {PAD_BYTE} END - {0x61}) * 256 AS s
    FROM t CROSS JOIN (SELECT unnest(range(1, {WAV_N + 1})) AS i)
    WHERE doc_id % 2 = 1
),
trig(k, i, c, sn) AS (VALUES {vals}),
d AS (
    SELECT ab.doc_id, trig.k,
           CAST(sum(ab.s * trig.c) AS BIGINT) AS re_q,
           CAST(sum(ab.s * trig.sn) AS BIGINT) AS im_q
    FROM ab JOIN trig ON trig.i = ab.i - 1
    GROUP BY 1, 2
)
SELECT doc_id AS item_id, CAST(k AS BIGINT) AS bin_k, re_q, im_q,
       CAST(re_q * re_q + im_q * im_q AS BIGINT) AS energy_q
FROM d
"""


# ---------------------------------------------------------------------------
# Image edge energy: integer Sobel gradients over the real PPM decode —
# the sharpness/texture feature an image curation pass thresholds on
# (blank/flat images score ~0).  Luminance = R+G+B per pixel (exact
# int), Sobel on the interior grid, all arithmetic int64 — the SQL
# oracle reconstructs the pixel grid from text (like image_histograms)
# and applies the same 3x3 weights via a 9-row literal stencil join.
# ---------------------------------------------------------------------------
class ImageEdges:
    """Actor-pool stage: PPM decode -> Sobel |gx|+|gy| stats."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        items, energies, maxes, interiors = [], [], [], []
        for item, payload in zip(
            batch["item_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            img = decode_ppm(payload).astype(np.int64)
            lum = img.sum(axis=2)  # (H, W) in [0, 765]
            # Sobel, interior only ([y, x] indexing)
            gx = (
                (lum[0:-2, 2:] + 2 * lum[1:-1, 2:] + lum[2:, 2:])
                - (lum[0:-2, 0:-2] + 2 * lum[1:-1, 0:-2] + lum[2:, 0:-2])
            )
            gy = (
                (lum[2:, 0:-2] + 2 * lum[2:, 1:-1] + lum[2:, 2:])
                - (lum[0:-2, 0:-2] + 2 * lum[0:-2, 1:-1] + lum[0:-2, 2:])
            )
            mag = np.abs(gx) + np.abs(gy)
            items.append(item)
            energies.append(int(mag.sum()))
            maxes.append(int(mag.max()))
            interiors.append(int(mag.size))
        return pa.table(
            {
                "item_id": pa.array(items, pa.int64()),
                "edge_energy": pa.array(energies, pa.int64()),
                "max_grad": pa.array(maxes, pa.int64()),
                "n_interior": pa.array(interiors, pa.int64()),
            }
        )


def image_edges(sf_dir: str, batch_size: int = 64) -> ray.data.Dataset:
    """queries() entry: Sobel edge-energy stats for every image item."""
    media = media_from_documents(sf_dir)

    def images_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["media_type"], "image"))

    return media.map_batches(images_only, batch_format="pyarrow").map_batches(
        ImageEdges,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
        max_restarts=0,
    )


def image_edges_sql() -> str:
    """Oracle: byte grid from text (image_histograms recipe), luminance
    = R+G+B per pixel, Sobel via a 9-row stencil join on (dx, dy)."""
    return f"""
WITH t AS (
    SELECT doc_id,
           regexp_replace(coalesce(text, ''), '[^ -~]', ' ', 'g') AS txt
    FROM documents
),
b AS (
    SELECT doc_id, i,
           CASE WHEN i <= length(txt) THEN unicode(substr(txt, CAST(i AS INTEGER), 1))
                ELSE {PAD_BYTE} END AS v
    FROM t CROSS JOIN (SELECT unnest(range(1, {N_PIX_BYTES + 1})) AS i)
    WHERE doc_id % 2 = 0
),
px AS (
    SELECT doc_id,
           ((i - 1) // 3) % {PPM_W} AS x,
           (i - 1) // {3 * PPM_W} AS y,
           CAST(sum(v) AS BIGINT) AS lum
    FROM b GROUP BY 1, 2, 3
),
w(dx, dy, wx, wy) AS (VALUES
    (-1,-1,-1,-1),(0,-1,0,-2),(1,-1,1,-1),
    (-1, 0,-2, 0),(0, 0,0, 0),(1, 0,2, 0),
    (-1, 1,-1, 1),(0, 1,0, 2),(1, 1,1, 1)),
g AS (
    SELECT c.doc_id, c.x, c.y,
           CAST(sum(n.lum * w.wx) AS BIGINT) AS gx,
           CAST(sum(n.lum * w.wy) AS BIGINT) AS gy
    FROM px c
    CROSS JOIN w
    JOIN px n ON n.doc_id = c.doc_id AND n.x = c.x + w.dx AND n.y = c.y + w.dy
    WHERE c.x BETWEEN 1 AND {PPM_W - 2} AND c.y BETWEEN 1 AND {PPM_H - 2}
    GROUP BY 1, 2, 3
)
SELECT doc_id AS item_id,
       CAST(sum(abs(gx) + abs(gy)) AS BIGINT) AS edge_energy,
       CAST(max(abs(gx) + abs(gy)) AS BIGINT) AS max_grad,
       CAST(count(*) AS BIGINT) AS n_interior
FROM g GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Video: multi-frame container + frame sampling.  The "video" is a REAL
# (if minimal) container — back-to-back binary PPM (P6) frames, the
# moral equivalent of MJPEG's concatenated-JPEG stream — so the decode
# is a genuine repeated container parse (header regex per frame, frame
# count discovered from the payload, trailing-garbage detection), not a
# fixed-offset slice.  Frame-sample = keep every FRAME_STEP-th frame,
# per-frame integer luminance (BT.709 integer weights, exact in SQL).
# ---------------------------------------------------------------------------
FRAME_STEP = 2
VID_MAX_FRAMES = 4                     # n_frames(doc) = 1 + doc_id % 4
_LUMA_W = (2126, 7152, 722)            # BT.709 x 10000, integer-exact
# _PPM_HEAD_RE is ^-anchored ('^' never matches at pos>0 under
# Pattern.match(s, pos)); mid-stream frame headers need the unanchored
# form (match() itself pins the match to pos).
_PPM_FRAME_RE = re.compile(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s")


def video_n_frames(doc_id: int) -> int:
    return 1 + doc_id % VID_MAX_FRAMES


def text_to_video(text: str | None, n_frames: int) -> bytes:
    """Deterministic multi-frame PPM stream: frame f's 192 pixel bytes
    are the document's printable-ASCII bytes [f*192, (f+1)*192), space-
    padded — same canonicalization as every other media oracle here."""
    b = _canon_bytes(text)
    frames = []
    for f in range(n_frames):
        chunk = b[f * N_PIX_BYTES : (f + 1) * N_PIX_BYTES]
        buf = (chunk + bytes([PAD_BYTE]) * N_PIX_BYTES)[:N_PIX_BYTES]
        frames.append(
            encode_ppm(np.frombuffer(buf, np.uint8).reshape(PPM_H, PPM_W, 3))
        )
    return b"".join(frames)


def decode_video_ppm(payload: bytes) -> list[np.ndarray]:
    """REAL multi-frame parse: at each offset, parse a P6 header (regex,
    whitespace-tolerant), compute that frame's byte length from its OWN
    header fields, slice + decode, advance.  Raises on truncation or
    trailing garbage — the frame count is a property of the bytes."""
    frames: list[np.ndarray] = []
    off = 0
    n = len(payload)
    while off < n:
        m = _PPM_FRAME_RE.match(payload, off)
        if not m:
            raise ValueError(f"not a P6 frame header at offset {off}")
        w, h, maxval = (int(m.group(i)) for i in (1, 2, 3))
        if maxval != 255:
            raise ValueError(f"unsupported PPM maxval {maxval}")
        end = m.end() + w * h * 3
        if end > n:
            raise ValueError("truncated video frame")
        frames.append(decode_ppm(payload[off:end]))
        off = end
    return frames


def video_from_documents(sf_dir: str) -> ray.data.Dataset:
    """Derived video table: EVERY document becomes a 1-4 frame PPM
    stream (frame count varies by doc_id so the sampler's ragged-output
    path is exercised); payloads are real decodable containers."""
    ds = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def to_video(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        payloads = [text_to_video(s, video_n_frames(i)) for i, s in zip(ids, texts)]
        return pa.table(
            {
                "item_id": t["doc_id"],
                "media_type": pa.array(["video"] * len(ids), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "meta": pa.array(
                    ['{"codec": "ppm-stream", "w": %d, "h": %d}' % (PPM_W, PPM_H)]
                    * len(ids),
                    pa.string(),
                ),
            }
        )

    return ds.map_batches(to_video, batch_format="pyarrow")


class VideoFrameSampler:
    """Actor-pool stage: repeated-container decode -> keep every
    FRAME_STEP-th frame -> integer BT.709 luminance sum per kept frame.
    flat_map-shaped (one input row -> ceil(n_frames/step) output rows)."""

    def __init__(self, step: int = FRAME_STEP):
        self.step = step
        self.w = np.array(_LUMA_W, np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        items, fidx, nfr, luma = [], [], [], []
        for item, payload in zip(
            batch["item_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            frames = decode_video_ppm(payload)
            for f in range(0, len(frames), self.step):
                rgb = frames[f].astype(np.int64)
                items.append(item)
                fidx.append(f)
                nfr.append(len(frames))
                luma.append(int((rgb * self.w).sum()))
        return pa.table(
            {
                "item_id": pa.array(items, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int64()),
                "n_frames": pa.array(nfr, pa.int64()),
                "luma_sum": pa.array(luma, pa.int64()),
            }
        )


def video_frame_sample(sf_dir: str, batch_size: int = 64) -> ray.data.Dataset:
    """queries() entry: video decode + frame-sample + per-frame integer
    luminance over the derived video table — exact DuckDB oracle
    (video_frame_sample_sql).  Small batches: payload rows are large."""
    return video_from_documents(sf_dir).map_batches(
        VideoFrameSampler, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, 4),
        max_restarts=0,  # silence ray#53727 actor-restart warning
    )


def video_frame_sample_sql() -> str:
    """Exact replica: frame f's pixel byte i (1-based within the frame)
    is text byte f*{N_PIX}+i (space-padded past the end); channel weight
    from (i-1)%3 (R,G,B row-major)."""
    wr, wg, wb = _LUMA_W
    return f"""
WITH t AS (
    SELECT doc_id,
           regexp_replace(coalesce(text, ''), '[^ -~]', ' ', 'g') AS txt,
           1 + doc_id % {VID_MAX_FRAMES} AS n_frames
    FROM documents
),
fr AS (
    SELECT doc_id, n_frames, unnest(range(0, n_frames, {FRAME_STEP})) AS frame_idx
    FROM t
),
px AS (
    SELECT fr.doc_id, fr.n_frames, fr.frame_idx, i,
           CASE WHEN fr.frame_idx * {N_PIX_BYTES} + i <= length(t.txt)
                THEN unicode(substr(t.txt,
                         CAST(fr.frame_idx * {N_PIX_BYTES} + i AS INTEGER), 1))
                ELSE {PAD_BYTE} END AS b
    FROM fr JOIN t USING (doc_id)
    CROSS JOIN (SELECT unnest(range(1, {N_PIX_BYTES + 1})) AS i)
)
SELECT doc_id AS item_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(n_frames AS BIGINT) AS n_frames,
       CAST(sum(b * (CASE (i - 1) % 3 WHEN 0 THEN {wr} WHEN 1 THEN {wg}
                     ELSE {wb} END)) AS BIGINT) AS luma_sum
FROM px GROUP BY doc_id, frame_idx, n_frames
"""


# ---------------------------------------------------------------------------
# Video shot-boundary detection: adjacent-frame absolute pixel difference
# ---------------------------------------------------------------------------
SHOT_DIFF_THRESHOLD = 6000  # sum of |byte delta| over the 192-byte frame


class ShotBoundaryDetector:
    """Actor-pool stage: decode the frame stream once, score every
    ADJACENT frame pair by the L1 pixel delta (integer-exact), flag
    pairs above SHOT_DIFF_THRESHOLD — the classical pixel-difference
    shot-boundary detector, the first stage of any video-curation
    pipeline (scene dedup, clip segmentation for captioning).
    flat_map-shaped: one row per consecutive frame pair."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        items, fidx, diffs = [], [], []
        for item, payload in zip(
            batch["item_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            frames = decode_video_ppm(payload)
            for f in range(len(frames) - 1):
                a = frames[f].astype(np.int64)
                b = frames[f + 1].astype(np.int64)
                items.append(item)
                fidx.append(f + 1)  # index of the LATER frame
                diffs.append(int(np.abs(a - b).sum()))
        d = np.array(diffs, dtype=np.int64)
        return pa.table(
            {
                "item_id": pa.array(items, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int64()),
                "diff_sum": pa.array(d, pa.int64()),
                "is_boundary": pa.array(d > SHOT_DIFF_THRESHOLD),
            }
        )


def video_shot_boundaries(sf_dir: str, batch_size: int = 64) -> ray.data.Dataset:
    """queries() entry: video decode + adjacent-frame L1 delta + boundary
    flag; single-frame videos emit no rows.  Exact DuckDB oracle
    (video_shot_boundaries_sql)."""
    return video_from_documents(sf_dir).map_batches(
        ShotBoundaryDetector, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, 4),
        max_restarts=0,  # silence ray#53727 actor-restart warning
    )


def video_shot_boundaries_sql() -> str:
    """Exact replica: frame f's pixel byte i is text byte f*N_PIX+i
    (space-padded), so the pair (f, f+1) differences two text windows."""
    return f"""
WITH t AS (
    SELECT doc_id,
           regexp_replace(coalesce(text, ''), '[^ -~]', ' ', 'g') AS txt,
           1 + doc_id % {VID_MAX_FRAMES} AS n_frames
    FROM documents
),
pairs AS (
    SELECT doc_id, n_frames, unnest(range(1, n_frames)) AS frame_idx
    FROM t WHERE n_frames >= 2
),
px AS (
    SELECT p.doc_id, p.frame_idx,
           CASE WHEN (p.frame_idx - 1) * {N_PIX_BYTES} + i <= length(t.txt)
                THEN unicode(substr(t.txt,
                         CAST((p.frame_idx - 1) * {N_PIX_BYTES} + i AS INTEGER), 1))
                ELSE {PAD_BYTE} END AS b_prev,
           CASE WHEN p.frame_idx * {N_PIX_BYTES} + i <= length(t.txt)
                THEN unicode(substr(t.txt,
                         CAST(p.frame_idx * {N_PIX_BYTES} + i AS INTEGER), 1))
                ELSE {PAD_BYTE} END AS b_cur
    FROM pairs p JOIN t USING (doc_id)
    CROSS JOIN (SELECT unnest(range(1, {N_PIX_BYTES + 1})) AS i)
)
SELECT doc_id AS item_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(sum(abs(b_cur - b_prev)) AS BIGINT) AS diff_sum,
       CAST(sum(abs(b_cur - b_prev)) > {SHOT_DIFF_THRESHOLD} AS BOOLEAN)
           AS is_boundary
FROM px GROUP BY doc_id, frame_idx
"""
