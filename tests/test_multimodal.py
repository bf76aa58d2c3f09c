import numpy as np
import pytest
import ray.data

from ifctordf_ray.stages import multimodal


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        multimodal._decode_image(b"xx", deterministic_fake=False)
    with pytest.raises(NotImplementedError):
        multimodal._decode_audio(b"xx", deterministic_fake=False)


def test_featurize_plumbing_deterministic():
    t = multimodal.synthetic_media_table(32)
    ds = ray.data.from_arrow(t)
    out = multimodal.featurize_media(ds, deterministic_fake=True).take_all()
    assert len(out) == 32
    by_id = {r["item_id"]: r for r in out}
    assert all(len(r["features"]) == multimodal.EMBED_DIM for r in out)
    assert by_id[0]["media_type"] == "image" and by_id[1]["media_type"] == "audio"
    # content-derived fake decode => rerun is bit-identical (idempotent tasks)
    out2 = multimodal.featurize_media(ds, deterministic_fake=True).take_all()
    by_id2 = {r["item_id"]: r for r in out2}
    for i in by_id:
        assert np.allclose(by_id[i]["features"], by_id2[i]["features"])
    # payload byte accounting survives the arrow round trip
    src = {r["item_id"]: len(r["payload"]) for r in t.to_pylist()}
    assert all(by_id[i]["payload_bytes"] == src[i] for i in by_id)
