"""Bounded-memory heavy hitters over a token stream.

``heavy_hitters`` finds every word whose corpus frequency is at least
``phi * N`` (N = total token count) WITHOUT ever materialising the full
vocabulary — the aggregate you need when the corpus is 100 TB and the
long-tail vocabulary (URLs, typos, hashes) is itself too large to
shuffle. vocab_topk (stages/text.py) is the exact-vocabulary twin for
when the vocabulary fits; this is the bounded-state contract beyond it.

Two passes, and the OUTPUT is exact (the sketch only proposes):

1. **Summary pass** — each batch folds its token stream to exact local
   word counts (one ``np.unique``), then truncates to a Misra-Gries
   style summary of at most ``m`` counters: subtract the (m+1)-largest
   count from the survivors and record that deduction as the batch's
   error bound ``e_b`` (Misra-Gries 1982; summary mergeability per
   Agarwal et al. 2012, "Mergeable Summaries"). Any word's true count
   is ≤ its summed summary count + Σe_b, and Σe_b ≤ N/(m+1) — so with
   ``m ≥ 2/phi`` every true heavy hitter survives the candidate cut.
   Summaries are ≤ m rows per batch; a tiny keyed groupby sums them.
2. **Verify pass** — the candidate set (≤ ~2/phi words, broadcast via
   ``ray.put``) gets EXACT counts in one more stateless scan + tiny
   groupby; the final filter ``count >= ceil(phi * N)`` therefore
   matches the plain SQL ``GROUP BY word HAVING count(*) >= t`` oracle
   bit-for-bit.

Scale shape: two corpus scans, shuffle bytes bounded by
``m × #batches`` (pass 1) and ``#candidates × #batches`` (pass 2) —
independent of vocabulary size. No driver state beyond the candidate
list.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _batch_words(batch: pa.Table, text_col: str) -> np.ndarray:
    toks = pc.list_flatten(pc.split_pattern_regex(
        pc.fill_null(batch[text_col], ""), r"\s+"))
    w = np.asarray(toks.to_numpy(zero_copy_only=False), dtype=object)
    return w[w != ""]


def heavy_hitters(ds, text_col: str = "text", phi: float = 0.01,
                  m: int | None = None):
    """-> pandas DataFrame (word, n) of every whitespace token with
    exact corpus count ``n >= ceil(phi * N)``, found with O(m) state
    per batch. ``m`` defaults to ``ceil(2/phi)`` (the soundness bound);
    raising it only tightens the candidate set."""
    import ray

    if not (0.0 < phi <= 1.0):
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    m = m or math.ceil(2.0 / phi)

    def summarize(batch: pa.Table) -> pa.Table:
        import uuid
        words = _batch_words(batch, text_col)
        uniq, counts = np.unique(words, return_counts=True)
        total = int(counts.sum())
        if len(uniq) > m:
            order = np.argsort(counts)[::-1]
            cut = int(counts[order[m]])  # the (m+1)-largest count
            keep = order[:m]
            uniq, counts = uniq[keep], counts[keep] - cut
            pos = counts > 0
            uniq, counts = uniq[pos], counts[pos]
        else:
            cut = 0
        # one marker row (word=null) per batch carries the batch totals,
        # keyed by a unique batch id so driver-side recovery of N and
        # Σe_b never collapses two batches with identical totals
        bid = uuid.uuid4().int & ((1 << 63) - 1)
        n_rows = len(uniq) + 1
        return pa.table({
            "word": pa.array(list(uniq) + [None], pa.string()),
            "c": pa.array(list(counts.astype(np.int64)) + [0], pa.int64()),
            "e": pa.array(np.full(n_rows, cut, np.int64), pa.int64()),
            "n_batch": pa.array(np.full(n_rows, total, np.int64),
                                pa.int64()),
            "bid": pa.array(np.full(n_rows, bid, np.int64), pa.int64()),
        })

    summaries = ds.map_batches(summarize, batch_format="pyarrow") \
        .to_pandas()
    if summaries.empty:
        import pandas as pd
        return pd.DataFrame({"word": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    per_batch = summaries.drop_duplicates(subset=["bid"])
    total_n = int(per_batch["n_batch"].sum())
    err_sum = int(per_batch["e"].sum())
    summaries = summaries[summaries["word"].notna()]
    threshold = math.ceil(phi * total_n)
    sums = summaries.groupby("word", sort=False)["c"].sum()
    cand = sums[sums + err_sum >= threshold].index.to_numpy(object)
    if len(cand) == 0:
        import pandas as pd
        return pd.DataFrame({"word": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    cand_ref = ray.put(np.sort(cand))

    def exact_counts(batch: pa.Table) -> pa.Table:
        cs = ray.get(cand_ref)
        words = _batch_words(batch, text_col)
        hit = words[np.isin(words, cs)]
        uniq, counts = np.unique(hit, return_counts=True)
        return pa.table({"word": pa.array(uniq, pa.string()),
                         "n": pa.array(counts.astype(np.int64),
                                       pa.int64())})

    exact = ds.map_batches(exact_counts, batch_format="pyarrow") \
        .to_pandas()
    out = exact.groupby("word", sort=False, as_index=False)["n"].sum()
    out = out[out["n"] >= threshold].sort_values("word") \
        .reset_index(drop=True)
    return out


def heavy_hitters_sql(doc_table: str, phi: float,
                      text_expr: str = "text") -> str:
    """The exact twin: explode whitespace tokens, GROUP BY, HAVING
    count >= ceil(phi * total tokens)."""
    return f"""
        WITH w AS (
          SELECT unnest(regexp_extract_all({text_expr}, '\\S+')) AS word
          FROM {doc_table}
        ), t AS (SELECT CAST(CEIL({phi!r} * COUNT(*)) AS BIGINT) AS thr
                 FROM w)
        SELECT word, COUNT(*) AS n FROM w, t
        GROUP BY word, t.thr HAVING COUNT(*) >= t.thr
        ORDER BY word"""
