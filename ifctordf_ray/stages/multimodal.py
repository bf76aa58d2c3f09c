"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a sidecar
metadata struct (media_type, width/height or sample_rate, codec).  The
decode/feature kernels themselves are STUBBED — the image/audio libraries
are not in this container — behind `_decode_image` / `_decode_audio`,
which raise NotImplementedError unless `deterministic_fake=True`, where a
seeded, content-derived fake is produced instead.  Everything Ray-side is
real and tested: schema, actor-pool stage shape, batch sizing for large
binary rows, and output layout.

Scale notes: binary rows are large, so these stages use SMALL batch
sizes (default 64) and actor pools sized so batch x concurrency fits the
worker heap; blocks of binary columns should flow with
batch_format="pyarrow" (pandas would copy to object dtype).
"""

from __future__ import annotations

import hashlib

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


def _decode_image(payload: bytes, deterministic_fake: bool) -> np.ndarray:
    """-> HxWx3 uint8.  STUB: no image codec libs in this container."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires an image codec library (not installed); "
            "run with deterministic_fake=True for plumbing tests"
        )
    h = hashlib.md5(payload).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    return rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)


def _decode_audio(payload: bytes, deterministic_fake: bool) -> np.ndarray:
    """-> float32 mono samples.  STUB: no audio codec libs installed."""
    if not deterministic_fake:
        raise NotImplementedError(
            "audio decode requires an audio codec library (not installed); "
            "run with deterministic_fake=True for plumbing tests"
        )
    h = hashlib.md5(payload).digest()
    rng = np.random.RandomState(int.from_bytes(h[4:8], "big"))
    return rng.standard_normal(128).astype(np.float32)


class MediaFeaturizer:
    """Actor-pool stage: decode -> fixed-dim feature vector.  One actor
    holds the (stub) decoder; batches stay Arrow end to end."""

    def __init__(self, deterministic_fake: bool = False):
        self.fake = deterministic_fake

    def _features(self, media_type: str, payload: bytes) -> np.ndarray:
        if media_type == "image":
            img = _decode_image(payload, self.fake).astype(np.float64)
            v = img.mean(axis=(0, 1))  # per-channel means
            out = np.zeros(EMBED_DIM)
            out[: len(v)] = v
            return out
        if media_type == "audio":
            sig = _decode_audio(payload, self.fake).astype(np.float64)
            spec = np.abs(np.fft.rfft(sig))[:EMBED_DIM]
            out = np.zeros(EMBED_DIM)
            out[: len(spec)] = spec
            return out
        raise ValueError(f"unknown media_type {media_type!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._features(m, p)
            for m, p in zip(
                batch["media_type"].to_pylist(), batch["payload"].to_pylist()
            )
        ]
        return pa.table(
            {
                "item_id": batch["item_id"],
                "media_type": batch["media_type"],
                "payload_bytes": pa.array(
                    [len(p) for p in batch["payload"].to_pylist()], pa.int64()
                ),
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float64(), EMBED_DIM)
                ),
            }
        )


def featurize_media(
    media: ray.data.Dataset,
    deterministic_fake: bool = False,
    batch_size: int = 64,
    concurrency=(1, 4),
) -> ray.data.Dataset:
    """media Dataset (MEDIA_SCHEMA) -> features Dataset.  Small batches:
    binary payloads are large; batch x concurrency must fit worker heap."""
    return media.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"deterministic_fake": deterministic_fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synthetic_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic opaque payloads for plumbing tests (NOT real media)."""
    rng = np.random.RandomState(seed)
    items, types, payloads, metas = [], [], [], []
    for i in range(n):
        kind = "image" if i % 2 == 0 else "audio"
        size = int(rng.randint(200, 2000))
        items.append(i)
        types.append(kind)
        payloads.append(rng.bytes(size))
        metas.append('{"codec": "fake", "bytes": %d}' % size)
    return pa.table(
        {
            "item_id": pa.array(items, pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, pa.string()),
        }
    )


def media_from_documents(sf_dir: str) -> ray.data.Dataset:
    """Deterministic opaque media table DERIVED from the real documents
    table (payload = utf-8 bytes of text; media_type alternates by
    doc_id) — exercises the full binary-column plumbing against real
    driver-generated data with no external inputs."""
    ds = _clean_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def to_media(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        doc_id = t["doc_id"]
        texts = [s or "" for s in t["text"].to_pylist()]
        kind = pc.if_else(
            pc.equal(pc.bit_wise_and(doc_id, 1), 0),
            pa.scalar("image"),
            pa.scalar("audio"),
        )
        return pa.table(
            {
                "item_id": doc_id,
                "media_type": kind.cast(pa.string()),
                "payload": pa.array([s.encode("utf-8") for s in texts], pa.binary()),
                "meta": pa.array(
                    ['{"codec": "fake"}'] * len(texts), pa.string()
                ),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow")


def media_features(sf_dir: str) -> ray.data.Dataset:
    """queries() entry: decode-stub featurization over the derived media
    table (rows-only check: the fake decode is outside SQL's reach, but
    determinism is asserted by tests)."""
    return featurize_media(media_from_documents(sf_dir), deterministic_fake=True)


class MediaStats:
    """Actor-pool stage over the binary media table: per-item byte count
    + content digest — the decode-free half of the multimodal plumbing,
    exactly SQL-replicable (hash-green driver oracle, unlike the stubbed
    decode path)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ifctordf_ray.functions.kernels import md5_hex

        payloads = batch["payload"].to_pylist()
        return pa.table(
            {
                "item_id": batch["item_id"],
                "media_type": batch["media_type"],
                "payload_bytes": pa.array([len(p) for p in payloads], pa.int64()),
                "payload_md5": pa.array(
                    [hashlib.md5(p).hexdigest() for p in payloads], pa.string()
                ),
            }
        )


def media_stats(sf_dir: str, batch_size: int = 64) -> ray.data.Dataset:
    """queries() entry: binary-column stats over the derived media table
    (small batches — binary rows are large)."""
    return media_from_documents(sf_dir).map_batches(
        MediaStats, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, 4),
    )


def media_stats_sql() -> str:
    return """
    SELECT doc_id AS item_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
           octet_length(encode(coalesce(text, ''))) AS payload_bytes,
           md5(coalesce(text, '')) AS payload_md5
    FROM documents
    """
