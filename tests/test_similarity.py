"""Similarity search: brute-force truth + metadata-filtered variant."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from pyrosm_ray.stages.similarity import filtered_topk_cosine, topk_cosine


def _vecs(n=40, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim))
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "embedding": pa.array(list(m.astype(np.float64))),
    }), m


def _truth_topk(m, q, k, allowed=None):
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sim = qn @ mn.T
    ids = np.arange(m.shape[0])
    if allowed is not None:
        mask = np.isin(ids, allowed)
        sim, ids = sim[:, mask], ids[mask]
    out = []
    for qi in range(len(q)):
        order = np.lexsort((ids, -sim[qi]))[:k]
        out.append(ids[order].tolist())
    return out


def test_topk_cosine_matches_numpy(ray_session):
    t, m = _vecs()
    q = m[:2]
    got = topk_cosine(rd.from_arrow(t), q, k=5).to_pandas()
    truth = _truth_topk(m, q, 5)
    for qi in range(2):
        g = got[got.query_id == qi].sort_values("rank")
        assert list(g.vec_id) == truth[qi]


def test_filtered_topk_restricts_to_allowed_ids(ray_session):
    t, m = _vecs()
    q = m[:2]
    allowed_ids = np.arange(0, 40, 3, dtype=np.int64)  # every 3rd vector
    allowed = pa.table({"doc_id": pa.array(allowed_ids, pa.int64())})
    got = filtered_topk_cosine(rd.from_arrow(t), rd.from_arrow(allowed),
                               q, k=5).to_pandas()
    truth = _truth_topk(m, q, 5, allowed=allowed_ids)
    assert set(got.vec_id).issubset(set(allowed_ids.tolist()))
    for qi in range(2):
        g = got[got.query_id == qi].sort_values("rank")
        assert list(g.vec_id) == truth[qi]


def test_filtered_topk_empty_filter(ray_session):
    t, m = _vecs(n=10)
    allowed = pa.table({"doc_id": pa.array([], pa.int64())})
    got = filtered_topk_cosine(rd.from_arrow(t), rd.from_arrow(allowed),
                               m[:1], k=3).to_pandas()
    assert len(got) == 0
