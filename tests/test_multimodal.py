"""Multimodal decode: pure-numpy PPM/WAV codecs and the actor-pool
feature/frame stages (real decode end-to-end, golden values)."""

import json

import numpy as np
import pyarrow as pa
import pytest

from geo_inference_ray.multimodal import (AudioFrameSampler, DecodeUnavailable,
                                          MediaFeatures, decode_ppm,
                                          decode_wav, encode_ppm, encode_wav,
                                          media_features, media_frames,
                                          synth_media_batch)


def test_ppm_roundtrip():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    buf = encode_ppm(px)
    out = decode_ppm(buf)
    assert out.shape == (5, 7, 3)
    np.testing.assert_array_equal(out, px)


def test_ppm_header_comments_and_pgm():
    # PGM (P5) with a comment in the header
    buf = b"P5\n# a comment\n3 2\n255\n" + bytes(range(6))
    out = decode_ppm(buf)
    assert out.shape == (2, 3)
    assert out.tolist() == [[0, 1, 2], [3, 4, 5]]


def test_ppm_rejects_compressed():
    with pytest.raises(DecodeUnavailable):
        decode_ppm(b"\xff\xd8\xff\xe0JFIF...")  # jpeg magic


def test_wav_roundtrip():
    s = (np.sin(np.linspace(0, 20, 300)) * 10000).astype(np.int16)
    buf = encode_wav(s, rate=16000)
    rate, out = decode_wav(buf)
    assert rate == 16000
    np.testing.assert_array_equal(out, s)


def test_wav_rejects_nonpcm():
    with pytest.raises(DecodeUnavailable):
        decode_wav(b"OggS" + b"\x00" * 40)


def test_media_features_golden():
    """A constant-color PPM decodes to a constant feature grid; a
    constant-amplitude WAV decodes to a constant envelope."""
    px = np.full((16, 16, 3), 128, dtype=np.uint8)
    wav = encode_wav(np.full(512, 1000, dtype=np.int16))
    batch = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "kind": pa.array(["image", "audio"]),
        "payload": pa.array([encode_ppm(px), wav], pa.binary()),
        "meta": pa.array([json.dumps({"codec": "ppm"}),
                          json.dumps({"codec": "wav"})]),
    })
    out = MediaFeatures(out_size=4)(batch)
    f_img = np.asarray(out["feature"][0].as_py())
    f_aud = np.asarray(out["feature"][1].as_py())
    np.testing.assert_allclose(f_img, 128 / 255.0, rtol=1e-6)
    np.testing.assert_allclose(f_aud, 1000 / 32768.0, rtol=1e-6)


def test_audio_frames_are_decoded_samples():
    s = np.arange(256, dtype=np.int16)
    batch = pa.table({
        "id": pa.array([7], pa.int64()),
        "kind": pa.array(["audio"]),
        "payload": pa.array([encode_wav(s)], pa.binary()),
        "meta": pa.array([json.dumps({"codec": "wav"})]),
    })
    out = AudioFrameSampler(frame_len=64, every_k=2)(batch)
    assert out["frame_idx"].to_pylist() == [0, 2]
    first = np.frombuffer(out["frame"][0].as_py(), dtype="<i2")
    np.testing.assert_array_equal(first, s[:64])


def test_synth_media_payloads_are_real_formats():
    batch = pa.table({"doc_id": pa.array(list(range(12)), pa.int64())})
    media = synth_media_batch(batch)
    for kind, payload in zip(media["kind"].to_pylist(),
                             media["payload"].to_pylist()):
        if kind == "image":
            assert payload[:2] == b"P6"
            decode_ppm(payload)
        elif kind == "audio":
            rate, samples = decode_wav(payload)
            assert rate == 8000 and len(samples) >= 256


def test_media_pipelines_end_to_end(ray_session, sf_dir):
    feats = media_features(sf_dir).to_pandas()
    assert {"id", "kind", "feature"} <= set(feats.columns)
    assert len(feats) == 500
    assert all(len(f) == 64 for f in feats["feature"])
    frames = media_frames(sf_dir)
    assert frames.count() > 0


def test_image_thumbs_pixel_values(ray_session, sf_dir):
    """NN thumbnail values equal a driver-side re-decode + NN sample
    (and hence the deterministic red channel of the synthetic PPM)."""
    import numpy as np

    from geo_inference_ray.multimodal import (THUMB_SIZE, decode_ppm,
                                              image_thumbs, media_dataset)

    out = image_thumbs(sf_dir).to_pandas()
    assert set(out["py"]) == set(range(THUMB_SIZE))
    med = media_dataset(sf_dir).to_pandas()
    med = med[med["kind"] == "image"].set_index("id")
    for iid, grp in out.groupby("id"):
        px = decode_ppm(med.loc[iid, "payload"])
        h, w = px.shape[:2]
        for _, row in grp.iterrows():
            sy = int(row["py"]) * h // THUMB_SIZE
            sx = int(row["px"]) * w // THUMB_SIZE
            assert row["r"] == int(px[sy, sx, 0])
        break  # one image is enough for the per-pixel loop
    # every image contributes exactly size^2 rows
    assert (out.groupby("id").size() == THUMB_SIZE ** 2).all()
    assert set(out["id"]) == set(med.index)


def test_image_dhash_known_gradient(ray_session, tmp_path):
    """dHash of the seeded gradient: adjacent sampled columns of
    r(y, x) = (y*7 + x*3 + id) % 256 rise by 3*(sx'-sx) except at the
    mod-256 wrap — recompute the expected bits directly from the
    formula and compare both halves."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geo_inference_ray.multimodal import (DHASH_COLS, DHASH_ROWS,
                                              image_dhash)

    d = tmp_path / "dh"
    d.mkdir()
    ids = [0, 3, 6, 9, 12]  # doc_id % 3 == 0 -> image rows
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(["x"] * len(ids)),
        "lang": pa.array(["en"] * len(ids)),
        "source": pa.array(["s"] * len(ids)),
        "n_chars": pa.array([1] * len(ids), pa.int64()),
    }), d / "documents.parquet")
    out = image_dhash(str(d)).to_pandas().set_index("id").sort_index()
    for i in ids:
        w, h = 16 + i % 16, 16 + i % 8
        gy, gx = np.mgrid[0:DHASH_ROWS, 0:DHASH_COLS]
        sy = gy * h // DHASH_ROWS
        sx = gx * w // DHASH_COLS
        g = (sy * 7 + sx * 3 + i) % 256
        bits = (g[:, :-1] < g[:, 1:]).astype(np.uint64)
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64)
                   .reshape(8, 8))
        dh = int((bits * weights).sum())
        assert out.loc[i, "dhash_lo"] == dh & 0xFFFFFFFF, i
        assert out.loc[i, "dhash_hi"] == dh >> 32, i
