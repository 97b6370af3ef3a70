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


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch
# ---------------------------------------------------------------------------

HLL_P = 12                      # 2^12 = 4096 registers (the classic size)


def _bitlen_u64(w: np.ndarray) -> np.ndarray:
    """Exact integer bit length per element (position of highest set
    bit), via a branch-free binary reduction — no float log2, so the
    SQL twin (an integer CASE ladder) matches bit-for-bit."""
    w = w.astype(np.uint64)
    bl = np.zeros(len(w), np.int64)
    cur = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = cur >= (np.uint64(1) << np.uint64(s))
        bl[big] += s
        cur[big] >>= np.uint64(s)
    return bl + (w > 0)


def hll_registers(ds, text_col: str = "text", p: int = HLL_P):
    """HyperLogLog registers for the corpus's DISTINCT WORD count
    (Flajolet et al. 2007 — the canonical distributed distinct sketch):
    per word, register ``h % m`` records the max of
    ``rho = (64 - p) - bitlen(h // m) + 1`` (leading-zero rank of the
    remaining bits).

    Scale shape: every batch reduces to ≤ m partial-register rows; the
    register domain is FIXED at m = 2^p, so the driver merge
    (elementwise max — associative, commutative, ORDER-FREE, hence
    deterministic under any blocking) is bounded at any corpus size.
    Nothing shuffles, ever — the sketch is the textbook one-pass
    mergeable aggregate.

    All arithmetic is integer (md5-tail hash + integer bit length), so
    :func:`hll_registers_sql` reproduces the register table exactly.
    Returns a pandas DataFrame ``(reg, rho)`` over non-empty registers,
    ascending reg.
    """
    import pandas as pd

    m = 1 << p

    from pyrosm_ray.stages.hashing import stable64_many

    def partial(batch: pa.Table) -> pa.Table:
        low = pa.table({text_col: pc.utf8_lower(
            pc.fill_null(batch[text_col], ""))})
        words = _batch_words(low, text_col)
        if not len(words):
            return pa.table({"reg": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        h = stable64_many(list(words))
        reg = (h % np.uint64(m)).astype(np.int64)
        w = (h // np.uint64(m)).astype(np.uint64)
        rho = np.where(w > 0, (64 - p) - _bitlen_u64(w) + 1,
                       np.int64(64 - p + 1)).astype(np.int64)
        best = np.zeros(m, np.int64)
        np.maximum.at(best, reg, rho)
        nz = np.flatnonzero(best)
        return pa.table({"reg": pa.array(nz, pa.int64()),
                         "rho": pa.array(best[nz], pa.int64())})

    best = np.zeros(m, np.int64)
    for b in ds.map_batches(partial,
                            batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        reg = np.asarray(b["reg"].to_numpy(zero_copy_only=False),
                         np.int64)
        rho = np.asarray(b["rho"].to_numpy(zero_copy_only=False),
                         np.int64)
        np.maximum.at(best, reg, rho)
    nz = np.flatnonzero(best)
    return pd.DataFrame({"reg": nz.astype(np.int64),
                         "rho": best[nz].astype(np.int64)})


def hll_estimate(registers, p: int = HLL_P) -> float:
    """The standard HLL estimator over a ``(reg, rho)`` register table:
    harmonic-mean raw estimate with the small-range linear-counting
    correction (the float math lives HERE, outside the oracle-compared
    register table)."""
    m = 1 << p
    rho = np.zeros(m, np.float64)
    rho[np.asarray(registers["reg"], np.int64)] = \
        np.asarray(registers["rho"], np.float64)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.power(2.0, -rho))
    zeros = m - len(registers)
    if raw <= 2.5 * m and zeros > 0:
        return m * float(np.log(m / zeros))
    return float(raw)


def hll_registers_sql(doc_table: str = "documents",
                      text_col: str = "text", p: int = HLL_P) -> str:
    """DuckDB twin of :func:`hll_registers` — integer bit length as a
    CASE ladder over exact power-of-two thresholds."""
    m = 1 << p
    cases = " ".join(
        f"WHEN w >= {1 << (k - 1)} THEN {k}"
        for k in range(64 - p, 0, -1))
    return f"""
        WITH wd AS (SELECT unnest(regexp_extract_all(lower({text_col}),
                                                     '\\S+')) AS word
                    FROM {doc_table}),
        h AS (SELECT md5_number_lower(word) AS hv FROM wd),
        rr AS (SELECT CAST(hv % {m} AS BIGINT) AS reg,
                      CAST(hv // {m} AS BIGINT) AS w
               FROM h),
        sc AS (SELECT reg,
                      CASE WHEN w = 0 THEN {64 - p + 1}
                           ELSE {64 - p} - (CASE {cases} ELSE 0 END) + 1
                      END AS rho
               FROM rr)
        SELECT reg, CAST(MAX(rho) AS BIGINT) AS rho
        FROM sc GROUP BY reg ORDER BY reg"""
