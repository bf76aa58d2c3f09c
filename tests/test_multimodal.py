"""Real dependency-free media codecs (PPM P6 / WAV PCM16) + the integer
feature stage over them."""

import numpy as np
import pytest
import ray.data

from ifctordf_ray.stages import multimodal


def test_ppm_round_trip():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    payload = multimodal.encode_ppm(img)
    assert payload.startswith(b"P6\n8 8\n255\n")
    back = multimodal.decode_ppm(payload)
    assert np.array_equal(back, img)


def test_ppm_golden_decode():
    """Handcrafted golden: a 2x1 image, red then green pixel."""
    payload = b"P6\n2 1\n255\n" + bytes([255, 0, 0, 0, 255, 0])
    img = multimodal.decode_ppm(payload)
    assert img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [0, 255, 0]


def test_wav_round_trip():
    samples = (np.sin(np.linspace(0, 20, 128)) * 20000).astype(np.int16)
    payload = multimodal.encode_wav(samples, 8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    sr, back = multimodal.decode_wav(payload)
    assert sr == 8000
    assert np.array_equal(back, samples)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        multimodal.decode_ppm(b"not a ppm")
    with pytest.raises(ValueError):
        multimodal.decode_wav(b"RIFFxxxxWAVEgarbage" + b"\x00" * 40)


def test_featurize_real_decode():
    t = multimodal.synthetic_media_table(32)
    ds = ray.data.from_arrow(t)
    out = multimodal.featurize_media(ds).take_all()
    assert len(out) == 32
    by_id = {r["item_id"]: r for r in out}
    assert by_id[0]["media_type"] == "image" and by_id[1]["media_type"] == "audio"
    # image features match a direct decode of the same payload
    payloads = {r["item_id"]: r["payload"] for r in t.to_pylist()}
    img = multimodal.decode_ppm(payloads[0]).astype(np.int64)
    assert by_id[0]["sum_a"] == int(img[:, :, 0].sum())
    assert by_id[0]["dim_a"] == 8 and by_id[0]["dim_b"] == 8
    # audio features match a direct decode
    sr, s = multimodal.decode_wav(payloads[1])
    s64 = s.astype(np.int64)
    assert by_id[1]["dim_a"] == sr and by_id[1]["dim_b"] == len(s)
    assert by_id[1]["sum_b"] == int((s64 * s64).sum())
    # payload byte accounting survives the arrow round trip
    assert all(by_id[i]["payload_bytes"] == len(payloads[i]) for i in by_id)
    # rerun is bit-identical (idempotent tasks)
    out2 = multimodal.featurize_media(ds).take_all()
    assert sorted(map(tuple, (r.values() for r in out))) == sorted(
        map(tuple, (r.values() for r in out2))
    )


def test_text_payload_builders_are_real_containers():
    ppm = multimodal.text_to_ppm("hello world " * 30)
    img = multimodal.decode_ppm(ppm)
    assert img.shape == (8, 8, 3)
    assert img.reshape(-1)[0] == ord("h")
    wav = multimodal.text_to_wav("abc")
    sr, s = multimodal.decode_wav(wav)
    assert sr == multimodal.WAV_SR and len(s) == multimodal.WAV_N
    # 'a' - 0x61 == 0, 'b' -> 256, 'c' -> 512, padding ' ' -> (32-97)*256
    assert s[0] == 0 and s[1] == 256 and s[2] == 512
    assert s[3] == (0x20 - 0x61) * 256


def test_media_transform_real_containers():
    """Thumbnail / frame-sample produce REAL re-encoded containers with
    the expected content."""
    import hashlib

    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    thumb = multimodal.resize_image_nn(img)
    assert thumb.shape == (4, 4, 3)
    assert np.array_equal(thumb, img[::2, ::2, :])
    ppm = multimodal.encode_ppm(thumb)
    assert multimodal.decode_ppm(ppm).shape == (4, 4, 3)

    s = np.arange(128, dtype=np.int16)
    down = multimodal.downsample_audio(s)
    assert np.array_equal(down, s[::2])

    t = multimodal.synthetic_media_table(4)
    import ray.data

    out = {r["item_id"]: r
           for r in ray.data.from_arrow(t).map_batches(
               multimodal.MediaTransformer(), batch_format="pyarrow"
           ).take_all()}
    # image 0: digest matches a direct recompute
    payload = t.to_pylist()[0]["payload"]
    exp = multimodal.encode_ppm(
        multimodal.resize_image_nn(multimodal.decode_ppm(payload))
    )
    assert out[0]["out_bytes"] == len(exp)
    assert out[0]["out_md5"] == hashlib.md5(exp.hex().encode()).hexdigest()


def test_audio_frames_parity(sf_small):
    import duckdb
    import pandas as pd

    from ifctordf_ray.stages.multimodal import (
        FRAME_LEN,
        N_FRAMES,
        audio_frames,
        audio_frames_sql,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    a = audio_frames(sf_small).to_pandas()
    b = con.execute(audio_frames_sql()).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    # every audio item emits exactly N_FRAMES frames, peaks bounded by int16 scale
    assert (a.groupby("item_id").frame_idx.count() == N_FRAMES).all()
    assert (a.peak <= 32768).all() and (a.n_zero_cross < FRAME_LEN).all()


def test_image_histograms_parity(sf_small):
    import duckdb
    import pandas as pd

    from ifctordf_ray.stages.multimodal import (
        HIST_BINS,
        N_PIX_BYTES,
        image_histograms,
        image_histograms_sql,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    a = image_histograms(sf_small).to_pandas()
    b = con.execute(image_histograms_sql()).df()
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    # every image's bins sum to the full pixel-byte count
    sums = a.groupby("item_id")["n_bytes"].sum()
    assert (sums == N_PIX_BYTES).all()
    assert a["bin"].between(0, HIST_BINS - 1).all()


def test_audio_spectral(sf_small, ray_session):
    """Integer DFT bins: cross-engine parity + an independent float-FFT
    reference (the quantized integer transform must agree with numpy's
    rfft to within the quantization error bound)."""
    import duckdb
    import numpy as np

    from ifctordf_ray.stages.multimodal import (
        SPECTRAL_BINS,
        TRIG_Q,
        WAV_N,
        audio_spectral,
        audio_spectral_sql,
        decode_wav,
        media_from_documents,
    )

    eng = (
        audio_spectral(sf_small)
        .to_pandas()
        .sort_values(["item_id", "bin_k"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    sql = (
        con.execute(audio_spectral_sql())
        .df()
        .sort_values(["item_id", "bin_k"])
        .reset_index(drop=True)
    )
    assert len(eng) == len(sql) and len(eng) > 0
    for col in ("re_q", "im_q", "energy_q"):
        assert list(eng[col]) == list(sql[col]), col

    # independent reference: float FFT within quantization error.
    # |re_q/TRIG_Q - re_float| <= sum|s| * (0.5/TRIG_Q)
    media = {
        r["item_id"]: r["payload"]
        for r in media_from_documents(sf_small).take_all()
        if r["media_type"] == "audio"
    }
    checked = 0
    for item_id, g in eng.groupby("item_id"):
        _, s = decode_wav(media[item_id])
        spec = np.fft.rfft(s.astype(np.float64))
        bound = np.abs(s).sum() * (0.5 / TRIG_Q) + 1.0
        for r in g.itertuples():
            k = r.bin_k
            assert abs(r.re_q / TRIG_Q - spec[k].real) <= bound
            # numpy rfft uses exp(-i...): sign convention differs from
            # the sin table (which is +sin), so compare magnitudes
            assert abs(abs(r.im_q) / TRIG_Q - abs(spec[k].imag)) <= bound
        checked += 1
        if checked >= 20:
            break


def test_image_edges(sf_small, ray_session):
    """Sobel edge energy: cross-engine parity + an independent scipy-free
    convolution reference on a few items, + a synthetic sanity pair
    (flat image scores 0, a vertical step scores > 0)."""
    import duckdb
    import numpy as np

    from ifctordf_ray.stages.multimodal import (
        ImageEdges,
        decode_ppm,
        encode_ppm,
        image_edges,
        image_edges_sql,
        media_from_documents,
    )

    eng = image_edges(sf_small).to_pandas().sort_values("item_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    sql = con.execute(image_edges_sql()).df().sort_values("item_id").reset_index(drop=True)
    assert len(eng) == len(sql) and len(eng) > 0
    for col in ("edge_energy", "max_grad", "n_interior"):
        assert list(eng[col]) == list(sql[col]), col

    # independent per-pixel loop reference on a handful of items
    media = {
        r["item_id"]: r["payload"]
        for r in media_from_documents(sf_small).take_all()
        if r["media_type"] == "image"
    }
    KX = [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]
    for item_id in list(sorted(media))[:5]:
        lum = decode_ppm(media[item_id]).astype(np.int64).sum(axis=2)
        total = 0
        for y in range(1, lum.shape[0] - 1):
            for x in range(1, lum.shape[1] - 1):
                gx = sum(
                    KX[dy + 1][dx + 1] * lum[y + dy, x + dx]
                    for dy in (-1, 0, 1)
                    for dx in (-1, 0, 1)
                )
                gy = sum(
                    KX[dx + 1][dy + 1] * lum[y + dy, x + dx]
                    for dy in (-1, 0, 1)
                    for dx in (-1, 0, 1)
                )
                total += abs(gx) + abs(gy)
        assert total == int(eng[eng.item_id == item_id].edge_energy.iloc[0])

    # synthetic sanity: flat -> 0; vertical step -> positive
    flat = encode_ppm(np.full((8, 8, 3), 100, np.uint8))
    step_img = np.full((8, 8, 3), 0, np.uint8)
    step_img[:, 4:, :] = 255
    step = encode_ppm(step_img)
    import pyarrow as pa

    out = ImageEdges()(
        pa.table(
            {
                "item_id": pa.array([1, 2], pa.int64()),
                "payload": pa.array([flat, step], pa.binary()),
            }
        )
    )
    assert out["edge_energy"][0].as_py() == 0
    assert out["edge_energy"][1].as_py() > 0


def test_video_frame_sample_parity(sf_small):
    import duckdb
    import numpy as np
    import pandas as pd

    from ifctordf_ray.stages.multimodal import (
        FRAME_STEP,
        VID_MAX_FRAMES,
        _LUMA_W,
        decode_video_ppm,
        text_to_video,
        video_frame_sample,
        video_frame_sample_sql,
    )

    # real multi-frame container: roundtrip + truncation/garbage rejection
    payload = text_to_video("frame bytes " * 80, 3)
    frames = decode_video_ppm(payload)
    assert len(frames) == 3 and frames[0].shape == (8, 8, 3)
    for bad in (payload[:-1], payload + b"X"):
        try:
            decode_video_ppm(bad)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    a = video_frame_sample(sf_small).to_pandas()
    b = con.execute(video_frame_sample_sql()).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    # sampling contract: frame_idx hits 0, step, ... below n_frames
    assert ((a.frame_idx % FRAME_STEP) == 0).all()
    assert (a.frame_idx < a.n_frames).all()
    assert a.n_frames.between(1, VID_MAX_FRAMES).all()
    # per-doc output row count == ceil(n_frames / step)
    g = a.groupby("item_id").agg(n=("frame_idx", "count"), nf=("n_frames", "max"))
    assert (g.n == -(-g.nf // FRAME_STEP)).all()
    # luminance bounded by all-255 pixels
    assert (a.luma_sum <= 255 * 64 * sum(_LUMA_W)).all() and (a.luma_sum >= 0).all()


def test_video_shot_boundaries_parity(sf_small):
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ifctordf_ray.stages.multimodal import (
        SHOT_DIFF_THRESHOLD,
        ShotBoundaryDetector,
        text_to_video,
        video_n_frames,
        video_shot_boundaries,
        video_shot_boundaries_sql,
    )

    # unit: identical frames -> diff 0, not a boundary; disjoint text
    # windows -> large diff
    same = text_to_video("x" * 192, 2)  # frame 1 fully padded vs 'x' bytes
    det = ShotBoundaryDetector()
    out = det(
        pa.table(
            {
                "item_id": pa.array([1], pa.int64()),
                "payload": pa.array([same], pa.binary()),
            }
        )
    )
    assert out.num_rows == 1
    assert out["diff_sum"][0].as_py() == 192 * abs(ord("x") - ord(" "))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    a = video_shot_boundaries(sf_small).to_pandas()
    b = con.execute(video_shot_boundaries_sql()).df()
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    # one row per adjacent pair of every multi-frame video
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{sf_small}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_pylist()
    want = sum(max(0, video_n_frames(i) - 1) for i in ids)
    assert len(a) == want
    assert (a.is_boundary == (a.diff_sum > SHOT_DIFF_THRESHOLD)).all()
