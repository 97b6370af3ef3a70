"""BPE vocabulary learning / encoding (stages/bpe.py): the distributed
trainer is pinned against an independent naive reference implementation
(full recount every round, plain string rewrites) — the merge table must
match exactly, including tie-breaks, and the encode stage's token counts
must match a from-scratch greedy apply."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from pyrosm_ray.stages import bpe


def _corpus(n=90):
    rng = np.random.RandomState(3)
    pool = ["lower", "lowest", "newer", "newest", "wider", "widest",
            "low", "new", "wide", "slow", "slower", "slowest"]
    texts = [" ".join(pool[j] for j in rng.randint(0, len(pool),
                                                   rng.randint(2, 9)))
             for _ in range(n)]
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def _naive_learn(texts, num_merges):
    """Independent reference: dict word counts, full pair recount every
    round, greedy left-to-right rewrite."""
    wc = {}
    for t in texts:
        for w in t.lower().split():
            wc[w] = wc.get(w, 0) + 1
    seqs = {w: list(w) + [bpe.END] for w in wc}
    merges = []
    for rank in range(num_merges):
        pairs = {}
        for w, seq in seqs.items():
            for j in range(len(seq) - 1):
                p = (seq[j], seq[j + 1])
                pairs[p] = pairs.get(p, 0) + wc[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        if n < 2:
            break
        for w, seq in seqs.items():
            out, j = [], 0
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == l and seq[j + 1] == r:
                    out.append(l + r)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seqs[w] = out
        merges.append((rank, l, r, n))
    return merges, seqs, wc


def test_bpe_learn_matches_naive(ray_session):
    t = _corpus()
    got = bpe.bpe_learn(rd.from_arrow(t), num_merges=40)
    want, _, _ = _naive_learn(t["text"].to_pylist(), 40)
    rows = list(zip(got["rank"].to_pylist(), got["left"].to_pylist(),
                    got["right"].to_pylist(),
                    got["pair_count"].to_pylist()))
    assert rows == want
    assert got["merged"].to_pylist() == [l + r for _, l, r, _ in want]
    # learning is deterministic across partitionings
    again = bpe.bpe_learn(rd.from_arrow(t).repartition(7), num_merges=40)
    assert again.equals(got)


def test_bpe_encode_matches_naive_apply(ray_session):
    t = _corpus(50)
    merges = bpe.bpe_learn(rd.from_arrow(t), num_merges=25)
    out = bpe.bpe_encode(rd.from_arrow(t), merges,
                         concurrency=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # naive apply: replay merges in rank order on every word
    _, seqs, _ = _naive_learn(t["text"].to_pylist(), 25)
    for _, row in out.iterrows():
        text = t["text"][int(row.doc_id)].as_py()
        ws = text.lower().split()
        assert row.n_words == len(ws)
        assert row.n_bpe_tokens == sum(len(seqs[w]) for w in ws)


def test_bpe_learn_max_words_and_empty(ray_session):
    t = _corpus(30)
    full = bpe.bpe_learn(rd.from_arrow(t), num_merges=10)
    pruned = bpe.bpe_learn(rd.from_arrow(t), num_merges=10, max_words=3)
    assert pruned.num_rows <= full.num_rows or \
        not pruned.equals(full)  # pruning changes the learned table
    # empty-vocab contract at the unit level (a fully-empty Dataset
    # can't cross Ray 2.49's hash shuffle — zero-row blocks skip map
    # UDFs and stay schema-less; stages/blocks.py documents the guard)
    empty = bpe.merges_from_counts([], np.empty(0, np.int64),
                                   num_merges=5)
    assert empty.num_rows == 0
    assert empty.schema.names == list(bpe.MERGES_SCHEMA.names)
    # single-word corpus: merges happen within the one word
    one = bpe.merges_from_counts(["aaaa"], np.array([3], np.int64), 10)
    assert one.num_rows > 0
    assert one["left"][0].as_py() == "a"
