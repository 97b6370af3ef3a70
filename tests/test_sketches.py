"""Heavy hitters (stages/sketches.py): soundness under real summary
truncation, exactness vs DuckDB."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from pyrosm_ray.stages.sketches import heavy_hitters, heavy_hitters_sql


def _zipf_corpus(n_docs=400, vocab=2000, seed=9):
    """Zipf-ish corpus with a vocabulary far larger than the summary
    budget m, so the Misra-Gries truncation actually fires."""
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1)
    p = (1.0 / ranks) / (1.0 / ranks).sum()
    texts = [" ".join(f"w{t}" for t in
                      rng.choice(vocab, size=rng.integers(30, 80), p=p))
             for _ in range(n_docs)]
    return pa.table({"doc_id": pa.array(range(n_docs), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _oracle(t, phi):
    con = duckdb.connect()
    con.register("documents", t)
    return con.execute(heavy_hitters_sql("documents", phi)).fetch_df()


def test_heavy_hitters_exact_vs_duckdb_with_truncation(ray_session):
    t = _zipf_corpus()
    phi = 0.01
    # default m = 200 counters vs 2000-word vocabulary: batches truncate
    got = heavy_hitters(rd.from_arrow(t), phi=phi)
    want = _oracle(t, phi)
    assert got["word"].tolist() == want["word"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    assert len(got) > 0


def test_heavy_hitters_tiny_budget_still_exact(ray_session):
    # m forced far below the soundness default: the candidate superset
    # grows but the verify pass keeps the OUTPUT exact as long as
    # m >= 2/phi is violated only via the explicit override... so use
    # the smallest still-sound budget and a split dataset (per-block
    # summaries merge across blocks)
    t = _zipf_corpus(n_docs=300, vocab=500, seed=4)
    a, b = t.slice(0, 150), t.slice(150)
    ds = rd.from_arrow(a).union(rd.from_arrow(b))
    phi = 0.02
    got = heavy_hitters(ds, phi=phi)  # m = 100
    want = _oracle(t, phi)
    assert got["word"].tolist() == want["word"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_heavy_hitters_empty_and_validation(ray_session):
    t = pa.table({"text": pa.array([], pa.string())})
    out = heavy_hitters(rd.from_arrow(t), phi=0.5)
    assert len(out) == 0
    import pytest
    with pytest.raises(ValueError):
        heavy_hitters(rd.from_arrow(t), phi=0.0)


def test_hll_registers_exact_and_estimate(ray_session):
    import duckdb

    from pyrosm_ray.stages.sketches import (hll_estimate, hll_registers,
                                            hll_registers_sql)

    # large-distinct corpus: ~30k unique synthetic tokens
    rng = np.random.RandomState(8)
    texts = [" ".join(f"tok{rng.randint(0, 30000)}" for _ in range(40))
             for _ in range(2000)]
    t = pa.table({"doc_id": pa.array(np.arange(2000), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = hll_registers(rd.from_arrow(t))
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(hll_registers_sql()).fetchdf()
    assert list(got.reg) == list(want.reg)
    assert list(got.rho) == list(want.rho)
    true_distinct = con.execute(
        """SELECT COUNT(DISTINCT w) FROM (SELECT
           unnest(regexp_extract_all(lower(text), '\\S+')) AS w
           FROM documents)""").fetchone()[0]
    est = hll_estimate(got)
    assert abs(est - true_distinct) / true_distinct < 0.05
    # small-range regime (the fixture corpus shape): linear counting
    small = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "text": pa.array(["a b c", "b c d e"])})
    sgot = hll_registers(rd.from_arrow(small))
    sest = hll_estimate(sgot)
    assert abs(sest - 5) < 1.0
    # blocking invariance: identical registers under any partitioning
    again = hll_registers(rd.from_arrow(t).repartition(7))
    assert list(again.reg) == list(got.reg)
    assert list(again.rho) == list(got.rho)
