"""Multimodal: WAV/PPM decode for real (pure-numpy codecs), fake fallback
for absent codecs, Arrow batch shape and partition-independence."""

import numpy as np
import pytest

from ariadna_spark.operators.multimodal import (
    FEATURE_DIM,
    MediaDecodeUnavailable,
    decode_png,
    decode_ppm,
    decode_real,
    decode_wav,
    encode_png,
    encode_ppm,
    encode_wav,
    extract_features,
    sample_frames,
    synth_media,
)


def test_absent_codecs_raise_explicitly():
    with pytest.raises(MediaDecodeUnavailable):
        decode_real(b"\xff\xd8\xff\xe0", "image/jpeg")
    with pytest.raises(MediaDecodeUnavailable):
        decode_real(b"\x00\x00\x00 ftypmp42", "video/mp4")


def test_wav_roundtrip_and_golden():
    samples = (np.sin(np.linspace(0, 20, 800)) * 10000).astype(np.int16)
    payload = encode_wav(samples, rate=8000)
    rate, channels, got = decode_wav(payload)
    assert (rate, channels) == (8000, 1)
    assert np.array_equal(got, samples)
    # golden: hand-assembled minimal file, 2 samples [1, -2] @ 4 Hz
    golden = (
        b"RIFF\x28\x00\x00\x00WAVE"
        b"fmt \x10\x00\x00\x00\x01\x00\x01\x00\x04\x00\x00\x00\x08\x00\x00\x00\x02\x00\x10\x00"
        b"data\x04\x00\x00\x00\x01\x00\xfe\xff"
    )
    rate, channels, got = decode_wav(golden)
    assert rate == 4 and channels == 1
    assert got.tolist() == [1, -2]
    assert decode_real(golden, "audio/wav")[0] == 4
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")


def test_ppm_roundtrip_and_comment_header():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # golden with a comment and odd whitespace: 1x2, red then green
    golden = b"P6 # a comment\n2\t1\n# more\n255\n" + bytes([255, 0, 0, 0, 255, 0])
    got = decode_ppm(golden)
    assert got.shape == (1, 2, 3)
    assert got[0, 0].tolist() == [255, 0, 0] and got[0, 1].tolist() == [0, 255, 0]
    assert decode_real(golden, "image/x-portable-pixmap").shape == (1, 2, 3)
    with pytest.raises(ValueError):
        decode_ppm(b"P3\n1 1\n255\n1 2 3")


def test_extract_features_real_and_fake(spark):
    media = synth_media(spark, n=30)
    f1 = extract_features(media).orderBy("asset_id").collect()
    f2 = extract_features(media.repartition(7)).orderBy("asset_id").collect()
    assert len(f1) == 30
    assert all(len(r["feature"]) == FEATURE_DIM for r in f1)
    for a, b in zip(f1, f2):
        assert a["asset_id"] == b["asset_id"]
        assert np.allclose(a["feature"], b["feature"])  # partition-independent
    by_kind = {}
    for r in f1:
        by_kind.setdefault(r["kind"], []).append(r["feature"])
    # real paths carry their modality tag in feature[0]
    assert all(f[0] == 1.0 for f in by_kind["audio"])
    assert all(f[0] == 2.0 for f in by_kind["image"])
    # audio rms of a 12000-amplitude sine ~ 12000/32768/sqrt(2)
    assert by_kind["audio"][0][5] == pytest.approx(12000 / 32768 / np.sqrt(2), rel=0.01)
    # video has no codec -> deterministic fake in [-1, 1)
    vid = np.array(by_kind["video"])
    assert (vid >= -1).all() and (vid < 1).all()


def test_sample_frames_explode_shape(spark):
    media = synth_media(spark, n=30)
    frames = sample_frames(media, every_ms=1000).collect()
    vids = {r["asset_id"]: r["duration_ms"] for r in media.filter("kind = 'video'").collect()}
    got = {}
    for r in frames:
        got.setdefault(r["asset_id"], []).append(r["frame_no"])
    assert set(got) == set(vids)
    for aid, fnos in got.items():
        expect = max(1, vids[aid] // 1000)
        assert sorted(fnos) == list(range(expect))


def test_png_roundtrip_all_filters():
    """encode->decode identity for every PNG filter type and channel
    count (gray, gray+alpha, RGB, RGBA) — the unfilter math is exact."""
    rng = np.random.default_rng(11)
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(13, 9, ch), dtype=np.uint8)
        for ft in range(5):
            got = decode_png(encode_png(img, filter_type=ft))
            assert got.shape == (13, 9, ch), (ch, ft)
            assert np.array_equal(got, img), (ch, ft)


def test_png_golden_and_errors():
    # 2x2 RGB golden: fixed pixels survive the full chunk/zlib path
    img = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8
    )
    got = decode_real(encode_png(img, filter_type=4), "image/png")
    assert np.array_equal(got, img)
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\nnot-a-chunk")
    with pytest.raises(ValueError):
        decode_png(b"GIF89a")


def test_png_features_match_ppm_features(spark):
    """The same raster through either codec yields identical real image
    features — so media_features' png rows are codec-grounded, not fake."""
    from ariadna_spark.operators.multimodal import real_or_fake_features

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    f_png = real_or_fake_features(encode_png(img, filter_type=2), "image/png")
    f_ppm = real_or_fake_features(encode_ppm(img), "image/x-portable-pixmap")
    assert np.allclose(f_png, f_ppm)
    assert f_png[0] == 2.0  # image modality tag, not the fake fallback


def test_real_decode_coverage_at_least_90pct(spark):
    """VERDICT r3 #6: >= 90% of the synthetic media corpus must take a
    REAL codec path (modality tag 1.0 audio / 2.0 image in feature[0]);
    the fake fallback is confined to the explicit unknown-mime rows."""
    media = synth_media(spark, n=100)
    mimes = {r["asset_id"]: r["mime"] for r in media.select("asset_id", "mime").collect()}
    feats = extract_features(media).collect()
    real = [r for r in feats if r["feature"][0] in (1.0, 2.0)]
    assert len(real) >= 90
    fake_ids = {r["asset_id"] for r in feats if r["feature"][0] not in (1.0, 2.0)}
    assert all(mimes[a] == "video/mp4" for a in fake_ids)  # only explicit unknowns


def test_per_format_feature_goldens():
    """Hand-computed feature goldens per real codec: the features are
    grounded in the decoded signal, not hashes."""
    from ariadna_spark.operators.multimodal import real_or_fake_features

    # PPM: 1x2 image, pixels (255,0,0) and (255,0,0) -> channel means exact
    img = np.full((1, 2, 3), 0, dtype=np.uint8)
    img[..., 0] = 255
    f = real_or_fake_features(encode_ppm(img), "image/x-portable-pixmap")
    assert f[0] == 2.0
    assert f[1] == pytest.approx(2 / 1024) and f[2] == pytest.approx(1 / 1024)
    assert f[3] == pytest.approx(2.0)  # aspect
    assert f[4] == pytest.approx(1.0) and f[5] == 0.0 and f[6] == 0.0  # means
    assert f[7] == pytest.approx(np.sqrt(2 / 9))  # std of {1,1,0,0,0,0}
    # PNG of the same raster must yield the identical features
    f2 = real_or_fake_features(encode_png(img, filter_type=4), "image/png")
    assert np.allclose(f, f2)
    # WAV: constant amplitude A -> mean = rms = peak = A/32768, zc = 0
    a = np.full(1000, 16384, dtype=np.int16)
    fw = real_or_fake_features(encode_wav(a, 16000), "audio/wav")
    assert fw[0] == 1.0 and fw[1] == pytest.approx(16000 / 48000)
    assert fw[4] == pytest.approx(0.5) and fw[5] == pytest.approx(0.5)
    assert fw[6] == pytest.approx(0.5) and fw[7] == 0.0
