"""Gopher-style document-quality rule battery.

The heuristic filter set popularised by the public Gopher paper (Rae et
al. 2021, "Scaling Language Models") and reused by Dolma/RefinedWeb-class
web curation: reject documents that are too short/long, have degenerate
word shapes, are symbol soup, are mostly bullet lists, or trail off in
ellipses. Every metric here is a stateless vectorised RE2 scan
(``pyarrow.compute.count_substring_regex``) with a DuckDB
``regexp_extract_all`` twin pinned to the same pattern — so the driver
oracle replicates each metric AND each pass flag bit-for-bit. Ratios
round to 6 decimals BEFORE threshold comparison on both sides, making
the flags float-stable.

Scale shape: pure ``map_batches`` over the text column — no state, no
shuffle, no driver data; the canonical 100-TB-safe filter stage. Flags
are emitted as int64 0/1 (not bool) so the driver's value-hash compare
sees one dtype on both sides.

No reference equivalent (pyrosm has no document-quality operators —
SURVEY.md §2.8 lists only string/geo scalars); the rule thresholds are
the public Gopher defaults, overridable per call.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pyrosm_ray.stages.text import STOPWORD_RE, _count_re

_WORD_RE = r"\S+"
_WS_RE = r"\s"
_SYMBOL_RE = r"(#|\.\.\.|…)"
_ALPHA_WORD_RE = r"\S*[A-Za-z]\S*"
_BULLET_RE = r"(?m)^[-*]\s"
_ELLIPSIS_RE = r"(?m)(\.\.\.|…)$"

DEFAULT_RULES = {
    "min_words": 50,
    "max_words": 100_000,
    "min_word_len": 3.0,
    "max_word_len": 10.0,
    "max_symbol_ratio": 0.1,
    "min_alpha_ratio": 0.8,
    "max_bullet_ratio": 0.9,
    "max_ellipsis_ratio": 0.3,
    "min_stop_hits": 2,
}


def gopher_stats_batch(batch: pa.Table, text_col: str = "text",
                       **rules) -> pa.Table:
    """Append the Gopher metric and 0/1 pass-flag columns to a batch."""
    cfg = {**DEFAULT_RULES, **rules}
    t = batch[text_col]
    n_words = _count_re(t, _WORD_RE)
    safe_w = np.maximum(n_words, 1).astype(np.float64)
    n_chars = np.asarray(pc.utf8_length(t).to_numpy(zero_copy_only=False),
                         np.int64)
    n_ws = _count_re(t, _WS_RE)
    n_lines = _count_re(t, r"\n") + 1
    mean_word_len = np.round((n_chars - n_ws) / safe_w, 6)
    symbol_ratio = np.round(_count_re(t, _SYMBOL_RE) / safe_w, 6)
    alpha_ratio = np.round(_count_re(t, _ALPHA_WORD_RE) / safe_w, 6)
    bullet_ratio = np.round(
        _count_re(t, _BULLET_RE) / n_lines.astype(np.float64), 6)
    ellipsis_ratio = np.round(
        _count_re(t, _ELLIPSIS_RE) / n_lines.astype(np.float64), 6)
    stop_hits = _count_re(t, STOPWORD_RE)
    flags = {
        "pass_n_words": (n_words >= cfg["min_words"])
        & (n_words <= cfg["max_words"]),
        "pass_word_len": (mean_word_len >= cfg["min_word_len"])
        & (mean_word_len <= cfg["max_word_len"]),
        "pass_symbol": symbol_ratio <= cfg["max_symbol_ratio"],
        "pass_alpha": alpha_ratio >= cfg["min_alpha_ratio"],
        "pass_bullet": bullet_ratio <= cfg["max_bullet_ratio"],
        "pass_ellipsis": ellipsis_ratio <= cfg["max_ellipsis_ratio"],
        "pass_stop": stop_hits >= cfg["min_stop_hits"],
    }
    gopher_pass = np.ones(len(batch), dtype=bool)
    for name, f in flags.items():
        batch = batch.append_column(
            name, pa.array(f.astype(np.int64), pa.int64()))
        gopher_pass &= f
    for name, arr in [("n_words", n_words),
                      ("mean_word_len", mean_word_len),
                      ("symbol_ratio", symbol_ratio),
                      ("alpha_ratio", alpha_ratio),
                      ("bullet_ratio", bullet_ratio),
                      ("ellipsis_ratio", ellipsis_ratio),
                      ("stop_hits", stop_hits)]:
        typ = pa.int64() if arr.dtype == np.int64 else pa.float64()
        batch = batch.append_column(name, pa.array(arr, typ))
    return batch.append_column(
        "gopher_pass", pa.array(gopher_pass.astype(np.int64), pa.int64()))


def gopher_stats(ds, text_col: str = "text", **rules):
    """Metrics + flags for every document (stateless map_batches)."""
    return ds.map_batches(
        lambda b: gopher_stats_batch(b, text_col, **rules),
        batch_format="pyarrow")


def gopher_filter(ds, text_col: str = "text", **rules):
    """Keep only documents passing every Gopher rule; metric columns
    are computed transiently and dropped."""
    in_cols = ds.schema().names

    def pick(batch: pa.Table) -> pa.Table:
        out = gopher_stats_batch(batch, text_col, **rules)
        keep = pc.equal(out["gopher_pass"], 1)
        return out.filter(keep).select(in_cols)

    return ds.map_batches(pick, batch_format="pyarrow")


def gopher_stats_sql(text_expr: str = "text", **rules) -> dict[str, str]:
    """DuckDB twins: a dict of column name -> SQL expression replicating
    :func:`gopher_stats_batch` bit-for-bit (same RE2 patterns, same
    round-before-compare rule). Compose into a SELECT yourself."""
    cfg = {**DEFAULT_RULES, **rules}

    def cnt(pattern: str) -> str:
        # DuckDB single-quoted strings are escape-free: the regex goes in
        # verbatim (backslashes single), only quotes double
        sql_pat = pattern.replace("'", "''")
        return (f"CAST(len(regexp_extract_all({text_expr}, '{sql_pat}')) "
                f"AS BIGINT)")

    n_words = cnt(_WORD_RE)
    safe_w = f"GREATEST(CAST({n_words} AS DOUBLE), 1.0)"
    n_lines = f"CAST({cnt(chr(92) + 'n')} + 1 AS DOUBLE)"
    m = {
        "n_words": n_words,
        "mean_word_len": (f"ROUND((length({text_expr}) - {cnt(_WS_RE)}) "
                          f"/ {safe_w}, 6)"),
        "symbol_ratio": f"ROUND({cnt(_SYMBOL_RE)} / {safe_w}, 6)",
        "alpha_ratio": f"ROUND({cnt(_ALPHA_WORD_RE)} / {safe_w}, 6)",
        "bullet_ratio": f"ROUND({cnt(_BULLET_RE)} / {n_lines}, 6)",
        "ellipsis_ratio": f"ROUND({cnt(_ELLIPSIS_RE)} / {n_lines}, 6)",
        "stop_hits": cnt(STOPWORD_RE),
    }
    f = {
        "pass_n_words": (f"({m['n_words']} >= {cfg['min_words']} AND "
                         f"{m['n_words']} <= {cfg['max_words']})"),
        "pass_word_len": (f"({m['mean_word_len']} >= {cfg['min_word_len']!r}"
                          f" AND {m['mean_word_len']} <= "
                          f"{cfg['max_word_len']!r})"),
        "pass_symbol": f"({m['symbol_ratio']} <= {cfg['max_symbol_ratio']!r})",
        "pass_alpha": f"({m['alpha_ratio']} >= {cfg['min_alpha_ratio']!r})",
        "pass_bullet": f"({m['bullet_ratio']} <= {cfg['max_bullet_ratio']!r})",
        "pass_ellipsis": (f"({m['ellipsis_ratio']} <= "
                          f"{cfg['max_ellipsis_ratio']!r})"),
        "pass_stop": f"({m['stop_hits']} >= {cfg['min_stop_hits']})",
    }
    out = {k: f"CAST({v} AS BIGINT)" for k, v in f.items()}
    out.update(m)
    out["gopher_pass"] = ("CAST((" + " AND ".join(f.values())
                          + ") AS BIGINT)")
    return out
