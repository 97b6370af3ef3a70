"""Benchmark decontamination (stages/decontam.py) + corpus vocabulary
(text.vocab_topk) — each pinned against its DuckDB twin on the sf0.001
documents fixture and hand-built edge cases."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from pyrosm_ray.stages import decontam, text

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _oracle(sql: str, table: pa.Table):
    con = duckdb.connect()
    con.register("documents", table)
    return con.execute(sql).fetchdf()


def test_decontaminate_matches_sql_twin(ray_session):
    t = pq.read_table(DOCS)
    got = decontam.decontaminate(rd.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _oracle(decontam.decontaminate_sql(), t)
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.n_hits) == list(want.n_hits)
    assert list(got.contaminated) == list(want.contaminated)
    # fixture is non-degenerate: some sources, and every source doc's own
    # prefix matches itself
    assert got.contaminated.sum() > 0
    src = got[got.doc_id % decontam.DEFAULT_SNIPPET_MOD == 0]
    assert (src.n_hits >= 1).all()


def test_decontaminate_external_benchmark(ray_session):
    # an explicit benchmark: grams from a text that appears verbatim
    # inside doc A but not doc B
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta epsilon zeta eta theta iota",
            "one two three four five six seven eight nine",
        ]),
    })
    bench = decontam.eval_gram_hashes(
        ["beta gamma delta epsilon zeta eta theta iota"], k=8)
    out = decontam.decontaminate(rd.from_arrow(t), eval_grams=bench) \
        .to_pandas().sort_values("doc_id")
    assert list(out.contaminated) == [True, False]
    assert list(out.n_hits) == [1, 0]


def test_decontaminate_short_docs_and_empty(ray_session):
    # docs below k words carry zero grams; empty text doesn't crash
    t = pa.table({
        "doc_id": pa.array([0, 3], pa.int64()),  # 0 % 29 == 0: a source
        "text": pa.array(["too short", ""]),
    })
    out = decontam.decontaminate(rd.from_arrow(t)).to_pandas() \
        .sort_values("doc_id")
    assert list(out.n_hits) == [0, 0]
    assert not out.contaminated.any()


def test_unigram_logprob_matches_sql_twin(ray_session):
    t = pq.read_table(DOCS)
    got = text.unigram_logprob(rd.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _oracle(text.unigram_logprob_sql(), t)
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.n_tokens) == list(want.n_tokens)
    assert list(got.sum_logprob_micro) == list(want.sum_logprob_micro)
    # every value is a negative log-prob sum (all words occur >=1 time,
    # none occur `total` times in a multi-doc corpus)
    assert (got.sum_logprob_micro < 0).all()


def test_unigram_logprob_empty_and_unseen(ray_session):
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["", "aa bb aa"]),
    })
    out = text.unigram_logprob(rd.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out.n_tokens) == [0, 3]
    assert out.sum_logprob_micro[0] == 0
    # aa: 2/3, bb: 1/3 -> micro-nat quantised sum
    exact = 2 * np.trunc(np.log(2 / 3) * 1e6 - 0.5) \
        + np.trunc(np.log(1 / 3) * 1e6 - 0.5)
    assert out.sum_logprob_micro[1] == int(exact)


def test_vocab_topk_matches_sql_twin(ray_session):
    t = pq.read_table(DOCS)
    got = text.vocab_topk(rd.from_arrow(t), k=25).to_pandas()
    want = _oracle(text.vocab_topk_sql(k=25), t)
    assert list(got.word) == list(want.word)
    assert list(got.n) == list(want.n)
    # ordered best-first with the ascending-word tiebreak
    pairs = list(zip(got.n, got.word))
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_bigram_logprob_matches_sql_twin(ray_session):
    t = pq.read_table(DOCS)
    got = text.bigram_logprob(rd.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _oracle(text.bigram_logprob_sql(), t)
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.n_bigrams) == list(want.n_bigrams)
    assert list(got.sum_logprob_micro) == list(want.sum_logprob_micro)
    # conditional log-probs are <= 0; some transition must be ambiguous
    assert (got.sum_logprob_micro <= 0).all()
    assert (got.sum_logprob_micro < 0).any()


def test_bigram_logprob_edges(ray_session):
    # one-word and empty docs carry zero bigrams; a deterministic
    # transition (cp == c) scores exactly 0 micro-nats
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["solo", "", "x y x y", "x y"]),
    })
    out = text.bigram_logprob(rd.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out.n_bigrams) == [0, 0, 3, 1]
    assert out.sum_logprob_micro[0] == 0 and out.sum_logprob_micro[1] == 0
    # corpus bigrams: "x y" x3, "y x" x1 -> p(y|x)=1, p(x|y)=1 -> all 0
    assert out.sum_logprob_micro[2] == 0
    assert out.sum_logprob_micro[3] == 0


def test_pmi_topk_matches_sql_twin(ray_session):
    t = pq.read_table(DOCS)
    got = text.pmi_topk(rd.from_arrow(t), k=20,
                        min_count=3).to_pandas()
    want = _oracle(text.pmi_topk_sql(k=20, min_count=3), t)
    assert got.reset_index(drop=True).equals(
        want.astype(got.dtypes.to_dict()).reset_index(drop=True))
    assert (got.n >= 3).all()


def test_pmi_topk_values(ray_session):
    # 'a b' always adjacent; 'x'/'y' never adjacent to each other
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["a b x", "a b y", "a b x", "a b y",
                          "a b x"], pa.string()),
    })
    out = text.pmi_topk(rd.from_arrow(t), k=10,
                        min_count=2).to_pandas()
    pairs = list(zip(out.w1, out.w2))
    assert ("a", "b") in pairs
    assert ("x", "y") not in pairs and ("y", "x") not in pairs
    # bigrams: (a,b)x5, (b,x)x3, (b,y)x2; T=10, cf(a)=5, cs(b)=5
    import math
    expect_ab = int(np.trunc(math.log((5 * 10) / (5 * 5)) * 1e6 + 0.5))
    got_ab = int(out[(out.w1 == "a") & (out.w2 == "b")]
                 .pmi_micro.iloc[0])
    assert got_ab == expect_ab
