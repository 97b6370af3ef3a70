"""Per-source corpus report card — the "what is in this corpus" summary
a curation pipeline runs before and after every filtering stage.

One row per source: document count, whitespace-token count, character
sum, distinct languages, distinct exact contents (md5 of the raw text,
the :mod:`hashing` oracle contract) and the implied exact-dup count.

Scale shape: every statistic is computed as a per-batch PARTIAL first
(batch-local pandas groupby — one partial row per (batch, key)), so the
shuffles carry aggregates, never documents. Distinct-content counting
shuffles (source, hash, partial_count) rows — bounded by the document
count, content never moves. The final per-source join runs on the
driver because a per-source report is inherently tiny (#sources rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pyrosm_ray.stages.hashing import stable64_many
from pyrosm_ray.stages.text import _count_re


def _partial_stats(batch: pa.Table, source_col: str, text_col: str,
                   lang_col: str) -> pa.Table:
    """(source, n_docs, n_tokens, sum_chars) partials per batch."""
    import pyarrow.compute as pc
    df = pd.DataFrame({
        "__s": batch[source_col].to_pylist(),
        "__nt": _count_re(batch[text_col], r"\S+"),
        "__nc": np.asarray(pc.utf8_length(batch[text_col])
                           .to_numpy(zero_copy_only=False), np.int64),
    })
    g = df.groupby("__s", sort=False).agg(
        n_docs=("__nt", "size"), n_tokens=("__nt", "sum"),
        sum_chars=("__nc", "sum")).reset_index()
    return pa.table({"__s": pa.array(g["__s"], pa.string()),
                     "n_docs": pa.array(g["n_docs"], pa.int64()),
                     "n_tokens": pa.array(g["n_tokens"], pa.int64()),
                     "sum_chars": pa.array(g["sum_chars"], pa.int64())})


def _partial_langs(batch: pa.Table, source_col: str,
                   lang_col: str) -> pa.Table:
    """Distinct (source, lang) pairs per batch."""
    df = pd.DataFrame({"__s": batch[source_col].to_pylist(),
                       "__l": batch[lang_col].to_pylist()})
    u = df.drop_duplicates()
    return pa.table({"__s": pa.array(u["__s"], pa.string()),
                     "__l": pa.array(u["__l"], pa.string())})


def _partial_hashes(batch: pa.Table, source_col: str,
                    text_col: str) -> pa.Table:
    """(source, content-hash, partial occurrence count) per batch."""
    # int64 VIEW of the uint64 hash: Ray's hash shuffle round-trips
    # uint64 through pandas as object and falls back to pickling
    hs = stable64_many(batch[text_col].to_pylist()).view(np.int64)
    df = pd.DataFrame({"__s": batch[source_col].to_pylist(), "__h": hs})
    g = df.groupby(["__s", "__h"], sort=False).size().reset_index(name="c")
    return pa.table({"__s": pa.array(g["__s"], pa.string()),
                     "__h": pa.array(g["__h"], pa.int64()),
                     "c": pa.array(g["c"], pa.int64())})


def corpus_report(ds, source_col: str = "source", text_col: str = "text",
                  lang_col: str = "lang") -> pd.DataFrame:
    """-> one pandas row per source: ``n_docs, n_tokens, sum_chars,
    n_langs, n_distinct, n_dups`` (n_dups = docs minus distinct raw
    contents). Small by definition — the only driver-side state is the
    final #sources-row merge."""
    from ray.data.aggregate import Count, Sum
    from pyrosm_ray.stages.blocks import groupby_partitions

    stats = ds.map_batches(
        lambda b: _partial_stats(b, source_col, text_col, lang_col),
        batch_format="pyarrow").groupby("__s").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_tokens", alias_name="n_tokens"),
        Sum("sum_chars", alias_name="sum_chars")).to_pandas()

    langs = ds.map_batches(
        lambda b: _partial_langs(b, source_col, lang_col),
        batch_format="pyarrow").groupby(["__s", "__l"]).count() \
        .groupby("__s").count().to_pandas() \
        .rename(columns={"count()": "n_langs"})[["__s", "n_langs"]]

    def fold(b: pa.Table) -> pa.Table:
        # one (source, hash) row with its total count -> per-source
        # distinct/dup partials; hashes never reach the driver
        c = np.asarray(b["c"].to_numpy(zero_copy_only=False), np.int64)
        df = pd.DataFrame({"__s": b["__s"].to_pylist(),
                           "d": np.ones(len(c), np.int64), "x": c - 1})
        g = df.groupby("__s", sort=False).sum().reset_index()
        return pa.table({"__s": pa.array(g["__s"], pa.string()),
                         "n_distinct": pa.array(g["d"], pa.int64()),
                         "n_dups": pa.array(g["x"], pa.int64())})

    dups = ds.map_batches(
        lambda b: _partial_hashes(b, source_col, text_col),
        batch_format="pyarrow").groupby(
        ["__s", "__h"], num_partitions=groupby_partitions()).aggregate(
        Sum("c", alias_name="c")).map_batches(
        fold, batch_format="pyarrow").groupby("__s").aggregate(
        Sum("n_distinct", alias_name="n_distinct"),
        Sum("n_dups", alias_name="n_dups")).to_pandas()

    out = stats.merge(langs, on="__s").merge(dups, on="__s")
    out = out.rename(columns={"__s": source_col})
    for c in ["n_docs", "n_tokens", "sum_chars", "n_langs",
              "n_distinct", "n_dups"]:
        out[c] = out[c].astype("int64")
    return out.sort_values(source_col).reset_index(drop=True)
