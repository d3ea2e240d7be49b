"""Multimodal plumbing: schema, Arrow batch shape, determinism — decode is
a documented stub (no codecs in this container), the Spark side is real."""

import numpy as np
import pytest

from ariadna_spark.operators.multimodal import (
    FEATURE_DIM,
    MediaDecodeUnavailable,
    decode_real,
    extract_features,
    sample_frames,
    synth_media,
)


def test_real_decode_is_explicit_stub():
    with pytest.raises(MediaDecodeUnavailable):
        decode_real(b"\x89PNG", "image/png")


def test_extract_features_schema_and_determinism(spark):
    media = synth_media(spark, n=30)
    f1 = extract_features(media).orderBy("asset_id").collect()
    f2 = extract_features(media.repartition(7)).orderBy("asset_id").collect()
    assert len(f1) == 30
    assert all(len(r["feature"]) == FEATURE_DIM for r in f1)
    for a, b in zip(f1, f2):
        assert a["asset_id"] == b["asset_id"]
        assert np.allclose(a["feature"], b["feature"])  # partition-independent
    vals = np.array([r["feature"] for r in f1])
    assert (vals >= -1).all() and (vals < 1).all()


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
