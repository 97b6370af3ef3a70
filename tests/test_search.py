import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pyrosm_ray.stages import search


def _corpus():
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "hash join over sorted runs with hash buckets",
            "merge join beats hash join on presorted inputs",
            "window functions and aggregates",
            "",                       # empty doc: counted in N, never matches
            "the quick brown fox",    # no query terms
        ], pa.string()),
    })


def _brute_bm25(tbl, query, k1=1.2, b=0.75):
    terms = sorted(set(query.lower().split()))
    docs = {i: (t or "").lower().split()
            for i, t in zip(tbl["doc_id"].to_pylist(),
                            tbl["text"].to_pylist())}
    n = len(docs)
    toks = sum(len(ws) for ws in docs.values())
    avgdl = toks / n
    out = {}
    for t in terms:
        df = sum(1 for ws in docs.values() if t in ws)
        if not df:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for i, ws in docs.items():
            tf = ws.count(t)
            if not tf:
                continue
            contrib = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(ws) / avgdl))
            out[i] = out.get(i, 0) + int(np.trunc(contrib * 1e6 + 0.5))
    return out


def test_bm25_score_matches_brute_force(ray_session):
    tbl = _corpus()
    got = search.bm25_score(rd.from_arrow(tbl), "hash join").to_pandas()
    expect = _brute_bm25(tbl, "hash join")
    assert dict(zip(got.doc_id, got.score_micro)) == expect
    # doc 1 has tf(hash)=2: must outscore doc 3/4/5 (absent entirely)
    assert set(got.doc_id) == {1, 2}


def test_bm25_topk_order_and_ties(ray_session):
    tbl = _corpus()
    top = search.bm25_topk(rd.from_arrow(tbl), "hash join",
                           k=1).to_pandas()
    expect = _brute_bm25(tbl, "hash join")
    best = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    assert list(zip(top.doc_id, top.score_micro)) == [best]


def test_bm25_no_matching_terms(ray_session):
    got = search.bm25_score(rd.from_arrow(_corpus()),
                            "zzz qqq").to_pandas()
    assert len(got) == 0
    top = search.bm25_topk(rd.from_arrow(_corpus()), "zzz", k=5) \
        .to_pandas()
    assert len(top) == 0


def test_build_postings(ray_session):
    post = search.build_postings(rd.from_arrow(_corpus())).to_pandas()
    m = {(t, d): f for t, d, f in zip(post.term, post.doc_id, post.tf)}
    assert m[("hash", 1)] == 2
    assert m[("join", 2)] == 2
    assert m[("merge", 2)] == 1
    assert ("", 4) not in m
    # every (term, doc) pair appears once; tf sums to the token count
    assert len(m) == len(post)
    toks = sum(len((t or "").split())
               for t in _corpus()["text"].to_pylist())
    assert int(post.tf.sum()) == toks


def test_postings_index_roundtrip_and_prune(ray_session, tmp_path):
    tbl = _corpus()
    idx = str(tmp_path / "idx")
    meta = search.write_postings(rd.from_arrow(tbl), idx, num_buckets=8)
    assert meta["n_docs"] == 5
    got = search.bm25_topk_from_postings(idx, "hash join",
                                         k=5).to_pandas()
    direct = search.bm25_topk(rd.from_arrow(tbl), "hash join",
                              k=5).to_pandas()
    assert list(zip(got.doc_id, got.score_micro)) == \
        list(zip(direct.doc_id, direct.score_micro))
    # partition pruning: only the buckets the query terms hash into read
    import os

    from pyrosm_ray.stages.hashing import stable64_many
    want = {int(x) for x in stable64_many(["hash", "join"]) % 8}
    have = {int(d.split("=")[1]) for d in os.listdir(idx)
            if d.startswith("bucket=")}
    assert want <= have


def test_postings_resume_skips_existing(ray_session, tmp_path):
    import os
    tbl = _corpus()
    idx = str(tmp_path / "idx2")
    search.write_postings(rd.from_arrow(tbl), idx, num_buckets=4)
    f = None
    for d in sorted(os.listdir(idx)):
        if d.startswith("bucket="):
            f = os.path.join(idx, d, "part.parquet")
            break
    mtime = os.path.getmtime(f)
    search.write_postings(rd.from_arrow(tbl), idx, num_buckets=4,
                          resume=True)
    assert os.path.getmtime(f) == mtime  # untouched on resume
    search.write_postings(rd.from_arrow(tbl), idx, num_buckets=4)
    assert os.path.getmtime(f) >= mtime  # rewritten without resume


def test_postings_resume_after_midwrite_kill(ray_session, tmp_path):
    """A build killed mid-write leaves complete buckets (os.replace is
    atomic), maybe a dangling .tmp, and no _meta.json. A resume run must
    complete ONLY the missing buckets, clean the orphan .tmp, write the
    manifest, and serve queries identically to a never-killed build."""
    import json
    import os
    import shutil

    tbl = _corpus()
    fresh = str(tmp_path / "fresh")
    meta_fresh = search.write_postings(rd.from_arrow(tbl), fresh,
                                       num_buckets=4)
    want = search.bm25_topk_from_postings(fresh, "hash join", k=5) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    # simulate the killed run: 2 of 4 buckets landed, one has a stale
    # half-written .tmp, no _meta.json
    killed = str(tmp_path / "killed")
    os.makedirs(killed)
    done = [d for d in sorted(os.listdir(fresh))
            if d.startswith("bucket=")][:2]
    for d in done:
        shutil.copytree(os.path.join(fresh, d), os.path.join(killed, d))
    stale = os.path.join(killed, done[0], "part.parquet.tmp")
    with open(stale, "wb") as fh:
        fh.write(b"half-written garbage")
    mtimes = {d: os.path.getmtime(os.path.join(killed, d, "part.parquet"))
              for d in done}

    meta2 = search.write_postings(rd.from_arrow(tbl), killed,
                                  num_buckets=4, resume=True)
    assert meta2["n_docs"] == meta_fresh["n_docs"]
    # completed buckets untouched, orphan cleaned, all buckets present
    for d in done:
        assert os.path.getmtime(
            os.path.join(killed, d, "part.parquet")) == mtimes[d]
    assert not os.path.exists(stale)
    assert sorted(d for d in os.listdir(killed)
                  if d.startswith("bucket=")) == \
        sorted(d for d in os.listdir(fresh) if d.startswith("bucket="))
    assert json.load(open(os.path.join(killed, "_meta.json"))) \
        == json.load(open(os.path.join(fresh, "_meta.json")))
    got = search.bm25_topk_from_postings(killed, "hash join", k=5) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.score_micro) == list(want.score_micro)
