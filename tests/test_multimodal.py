"""Multimodal stages: real Ray plumbing over fake decoders.

The decoders are deterministic fakes (no PIL/soundfile in this
container), so tests assert the STAGE contract: schema, payload
immutability, determinism across runs, 1->n frame expansion."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from pyrosm_ray.stages.multimodal import AudioFeatureExtractor, \
    extract_audio_features, extract_image_features, sample_frames


def _media(n=12, media_type="image"):
    rng = np.random.default_rng(4)
    payloads = [rng.bytes(100 + 137 * i) for i in range(n)]
    return pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array([media_type] * n, pa.string()),
        "meta": pa.array([[("k", "v")]] * n,
                         pa.map_(pa.string(), pa.string())),
    })


def test_image_features_contract(ray_session):
    t = _media()
    out = extract_image_features(rd.from_arrow(t), resize_to=16,
                                 batch_size=4).to_pandas()
    assert len(out) == len(t)
    for c in ("height", "width", "mean_intensity", "decoded"):
        assert c in out.columns
    assert (out["height"] > 0).all() and (out["width"] > 0).all()
    # payload passes through byte-identical (the url/text invariant analog)
    assert [bytes(p) for p in out["payload"]] == \
        t["payload"].to_pylist()
    # thumbnails are resize_to^2 * 3 bytes
    assert all(len(d) == 16 * 16 * 3 for d in out["decoded"])
    # deterministic across runs
    out2 = extract_image_features(rd.from_arrow(t), resize_to=16,
                                  batch_size=4).to_pandas()
    assert out["mean_intensity"].tolist() == \
        out2["mean_intensity"].tolist()


def test_frame_sampler_expansion(ray_session):
    t = _media(media_type="video")
    out = sample_frames(rd.from_arrow(t), every=2).to_pandas()
    # every payload yields >= 1 frame; frame indices step by `every`
    assert set(out["id"]) == set(range(len(t)))
    assert (out["frame_index"] % 2 == 0).all()
    # payload 11 is 100 + 137*11 = 1607 bytes -> 6 frame blocks of 256;
    # sampling every 2nd frame keeps indices 0, 2, 4
    one = out[out["id"] == 11]
    assert sorted(one["frame_index"]) == [0, 2, 4]


def test_audio_features(ray_session):
    t = _media(media_type="audio")
    out = extract_audio_features(rd.from_arrow(t),
                                 batch_size=4).to_pandas()
    for c in ("duration_s", "rms", "zero_crossing_rate"):
        assert c in out.columns
    assert (out["duration_s"] > 0).all()
    assert (out["rms"] > 0).all()
    assert out["zero_crossing_rate"].between(0, 1).all()
    # longer payloads decode to longer fake waveforms
    assert out.sort_values("id")["duration_s"].is_monotonic_increasing


def test_audio_extractor_unit():
    ex = AudioFeatureExtractor()
    wav, rate = ex._decode(b"hello audio payload")
    assert rate == 16_000 and wav.dtype == np.float32 and len(wav)
    wav2, _ = ex._decode(b"hello audio payload")
    assert np.array_equal(wav, wav2)
