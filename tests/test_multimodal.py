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


# ---------------------------------------------------------------------------
# image dHash near-dup (real PNG decode path)
# ---------------------------------------------------------------------------

def _png_media(imgs):
    from pyrosm_ray.stages import codecs
    return pa.table({
        "id": pa.array(np.arange(len(imgs)), pa.int64()),
        "payload": pa.array([codecs.encode_png(im) for im in imgs],
                            pa.binary()),
        "media_type": pa.array(["image"] * len(imgs), pa.string()),
        "meta": pa.array([[]] * len(imgs),
                         pa.map_(pa.string(), pa.string())),
    })


def _grad(h, w, phase=0, noise=0):
    """Horizontal gradient image; dHash is driven by left-right luma
    deltas, so gradients give stable non-trivial hashes."""
    x = (np.arange(w) * 4 + phase) % 256
    img = np.repeat(x[None, :], h, axis=0).astype(np.uint8)
    if noise:
        rng = np.random.default_rng(noise)
        img = (img.astype(np.int64)
               + rng.integers(-2, 3, size=img.shape)).clip(0, 255) \
            .astype(np.uint8)
    return np.stack([img, img, img], axis=2)


def test_dhash64_numpy_twin():
    """dHash recomputed from first principles on the raw pixels."""
    from pyrosm_ray.stages.multimodal import dhash64
    img = _grad(20, 30, phase=3)
    h, w = img.shape[:2]
    luma = ((299 * img[:, :, 0].astype(np.int64)
             + 587 * img[:, :, 1].astype(np.int64)
             + 114 * img[:, :, 2].astype(np.int64)) // 1000)
    yi = (np.arange(8) * h // 8).clip(0, h - 1)
    xi = (np.arange(9) * w // 9).clip(0, w - 1)
    g = luma[np.ix_(yi, xi)]
    want = 0
    for k, bit in enumerate((g[:, 1:] > g[:, :-1]).ravel()):
        want |= int(bit) << k
    assert dhash64(img) == want


def test_image_near_dup_pairs(ray_session):
    """ids 0/1 identical, 2 a lightly-noised copy (small hamming), 3/4
    reversed-gradient + flat (far)."""
    from pyrosm_ray.stages.multimodal import dhash64, image_near_dup
    base = _grad(32, 32)
    far = np.stack([np.full((32, 32), 128, np.uint8)] * 3, axis=2)
    rev = base[:, ::-1].copy()
    imgs = [base, base.copy(), _grad(32, 32, noise=7), rev, far]
    t = _png_media(imgs)
    got = image_near_dup(rd.from_arrow(t), max_hamming=8,
                         batch_size=2).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    # exact-oracle twin: all-pairs popcount on driver-side dhashes
    hs = [dhash64(im) for im in imgs]
    want = sorted((a, b) for a in range(5) for b in range(a + 1, 5)
                  if bin(hs[a] ^ hs[b]).count("1") <= 8)
    assert list(zip(got["a"], got["b"])) == want
    assert (0, 1) in want            # identical images always pair
    pair_ham = dict(zip(zip(got["a"], got["b"]), got["hamming"]))
    assert pair_ham[(0, 1)] == 0


def test_image_dhash_deterministic(ray_session):
    from pyrosm_ray.stages.multimodal import image_dhash
    t = _png_media([_grad(16 + i, 20 + i, phase=i) for i in range(6)])
    a = image_dhash(rd.from_arrow(t)).to_pandas().sort_values("id")
    b = image_dhash(rd.from_arrow(t).repartition(3)).to_pandas() \
        .sort_values("id")
    assert a["dhash"].tolist() == b["dhash"].tolist()


# ---------------------------------------------------------------------------
# audio envelope fingerprint near-dup (real WAV decode path)
# ---------------------------------------------------------------------------

def _wav_media(waves, rate=8000):
    from pyrosm_ray.stages import codecs
    return pa.table({
        "id": pa.array(np.arange(len(waves)), pa.int64()),
        "payload": pa.array([codecs.encode_wav_pcm16(w, rate)
                             for w in waves], pa.binary()),
        "media_type": pa.array(["audio"] * len(waves), pa.string()),
        "meta": pa.array([[]] * len(waves),
                         pa.map_(pa.string(), pa.string())),
    })


def _tone(n=4000, freq=3.0, amp=0.5, seed=None):
    """Amplitude-modulated tone: the envelope (not the carrier) drives
    the fingerprint, so copies at other LEVELS stay close."""
    t = np.linspace(0, 1, n, endpoint=False)
    env = 0.5 + 0.45 * np.sin(2 * np.pi * freq * t)
    wav = amp * env * np.sin(2 * np.pi * 440 * t)
    if seed is not None:
        rng = np.random.default_rng(seed)
        wav = wav + rng.normal(0, 1e-3, n)
    return np.clip(wav, -1, 1)


def test_audio_fingerprint_properties(ray_session):
    from pyrosm_ray.stages.multimodal import (audio_fingerprint64,
                                              audio_fingerprints)
    a = _tone()
    same_level_shift = _tone(amp=0.25)       # same envelope shape
    different = _tone(freq=11.0)              # different envelope
    fa = audio_fingerprint64(a)
    fb = audio_fingerprint64(same_level_shift)
    fc = audio_fingerprint64(different)
    assert fa == fb                            # scale-invariant shape
    assert bin(fa ^ fc).count("1") > 8
    # stage output matches the scalar function through the WAV codec
    # (16-bit quantisation may flip boundary bits on the noised copy,
    # so pin the exact clip only)
    t = _wav_media([a, different])
    got = audio_fingerprints(rd.from_arrow(t)).to_pandas() \
        .sort_values("id")
    from pyrosm_ray.stages import codecs
    dec_a, _ = codecs.decode_wav(codecs.encode_wav_pcm16(a, 8000))
    assert np.uint64(got["afp"].iloc[0]) == \
        np.uint64(audio_fingerprint64(dec_a))


def test_audio_near_dup_pairs(ray_session):
    from pyrosm_ray.stages.multimodal import (audio_fingerprints,
                                              audio_near_dup)
    waves = [_tone(), _tone(amp=0.3), _tone(seed=5),
             _tone(freq=11.0), _tone(freq=23.0, amp=0.9)]
    t = _wav_media(waves)
    got = audio_near_dup(rd.from_arrow(t), max_hamming=6,
                         batch_size=2).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    # driver oracle: all-pairs popcount over the stage's own signatures
    fp = audio_fingerprints(rd.from_arrow(t)).to_pandas() \
        .sort_values("id")["afp"].to_numpy(np.int64).view(np.uint64)
    want = sorted((a, b) for a in range(5) for b in range(a + 1, 5)
                  if bin(int(fp[a] ^ fp[b])).count("1") <= 6)
    assert list(zip(got["a"], got["b"])) == want
    assert (0, 1) in want and (0, 2) in want   # envelope copies pair up
    assert (0, 3) not in want                  # different envelope apart
