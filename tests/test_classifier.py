"""Trained text classifier (stages/classifier.py): single-block training
is bit-identical to a plain numpy twin; block-split invariance holds to
float associativity; the learned model separates the synthetic en/de
corpus."""

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from pyrosm_ray.stages import classifier as cl


def _corpus(n=240, seed=9):
    rng = np.random.RandomState(seed)
    en = ["the", "cat", "sat", "on", "a", "mat", "and", "ran"]
    de = ["der", "hund", "lief", "im", "park", "und", "dann", "schnell"]
    texts, langs = [], []
    for i in range(n):
        lang = "en" if i % 2 else "de"
        pool = en if lang == "en" else de
        texts.append(" ".join(pool[j] for j in
                              rng.randint(0, len(pool),
                                          rng.randint(4, 12))))
        langs.append(lang)
    return pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                     "text": pa.array(texts, pa.string()),
                     "lang": pa.array(langs, pa.string())})


def _naive_train(t, buckets, iters, lr):
    """Independent twin: dense X built per doc with hashlib md5 hashing,
    plain full-batch GD."""
    def bucket(word):
        h = int.from_bytes(hashlib.md5(word.encode()).digest()[8:],
                           "little")
        return h % buckets

    texts = t["text"].to_pylist()
    y = np.array([1.0 if v == "en" else 0.0
                  for v in t["lang"].to_pylist()])
    X = np.zeros((len(texts), buckets + 1))
    for i, txt in enumerate(texts):
        for wd in set(txt.lower().split()):
            X[i, bucket(wd)] = 1.0
        X[i, buckets] = 1.0
    w = np.zeros(buckets + 1)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = w - lr * (X.T @ (p - y)) / len(texts)
    return w, X, y


def test_single_block_bit_identical(ray_session):
    t = _corpus(120)
    B, iters, lr = 512, 8, 1.0
    got = cl.train_text_classifier(rd.from_arrow(t), feature_buckets=B,
                                   iters=iters, lr=lr)
    want, _, _ = _naive_train(t, B, iters, lr)
    # same hashing, same feature scaling, one block -> same float ops
    # per doc; the twin's dense X@w accumulates in a different order, so
    # pin to near-machine-epsilon rather than bitwise
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_split_invariance_and_separation(ray_session):
    t = _corpus(240)
    B, iters, lr = 1024, 15, 2.0
    w1 = cl.train_text_classifier(rd.from_arrow(t), feature_buckets=B,
                                  iters=iters, lr=lr)
    w2 = cl.train_text_classifier(rd.from_arrow(t).repartition(7),
                                  feature_buckets=B, iters=iters, lr=lr)
    np.testing.assert_allclose(w1, w2, rtol=1e-9, atol=1e-9)
    scored = cl.score_text_classifier(
        rd.from_arrow(t), w1).to_pandas().sort_values("doc_id")
    langs = t["lang"].to_pylist()
    acc = np.mean([(p >= 0.5) == (lg == "en")
                   for p, lg in zip(scored.prob, langs)])
    assert acc > 0.95
    # flag column consistent with prob
    assert all((scored.prob >= 0.5) == scored.is_target)
