"""Text repetition signals: handcrafted truth + DuckDB oracle parity."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from pyrosm_ray.stages.text import repetition_stats

DOCS = [
    "a b a b a b",            # bigrams: (a,b)x3 (b,a)x2 -> top 3/5
    "one two three four",     # all distinct -> 1/3
    "x",                      # <2 tokens -> 0.0
    "",                       # empty -> 0.0
    "l1\nl2\nl1\nl3",         # 3 distinct of 4 lines -> dup 1/4
    "same\nsame\nsame",       # 1 distinct of 3 -> dup 2/3
    "Mixed CASE mixed case",  # lowercased: (mixed,case)x2 of 3 -> 2/3
]


def _table():
    return pa.table({
        "doc_id": pa.array(range(len(DOCS)), pa.int64()),
        "text": pa.array(DOCS, pa.string()),
    })


def test_repetition_handcrafted(ray_session):
    out = repetition_stats(rd.from_arrow(_table())).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # doc 5: \s+ tokenization crosses newlines -> (same,same)x2 of 2 -> 1.0
    assert out["top_bigram_frac"].tolist() == [
        3 / 5, 1 / 3, 0.0, 0.0, 1 / 3, 1.0, 2 / 3]
    assert out["dup_line_frac"].tolist() == [
        0.0, 0.0, 0.0, 0.0, 1 - 3 / 4, 1 - 1 / 3, 0.0]


def test_repetition_matches_duckdb_oracle(ray_session):
    import __ray_entry__ as e
    sql = e.oracle_sql()["q_repetition"]
    con = duckdb.connect()
    con.register("documents", _table())
    ora = con.execute(sql).fetch_df().sort_values("doc_id") \
        .reset_index(drop=True)
    got = repetition_stats(rd.from_arrow(_table())).to_pandas()[
        ["doc_id", "dup_line_frac", "top_bigram_frac"]] \
        .sort_values("doc_id").reset_index(drop=True)
    assert np.array_equal(got["dup_line_frac"].values,
                          ora["dup_line_frac"].values)
    assert np.array_equal(got["top_bigram_frac"].values,
                          ora["top_bigram_frac"].values)


def test_corpus_report_counts(ray_session):
    from pyrosm_ray.stages.report import corpus_report
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a b c", "a b c", "x  y", "solo doc here",
                          "unico"]),
        "lang": pa.array(["en", "en", "fr", "en", "es"]),
        "source": pa.array(["s1", "s1", "s1", "s2", "s2"]),
    })
    out = corpus_report(rd.from_arrow(t)).set_index("source")
    assert out.loc["s1"].n_docs == 3
    assert out.loc["s1"].n_tokens == 3 + 3 + 2
    assert out.loc["s1"].sum_chars == 5 + 5 + 4
    assert out.loc["s1"].n_langs == 2
    # docs 0 and 1 are byte-identical -> 2 distinct contents, 1 dup
    assert out.loc["s1"].n_distinct == 2 and out.loc["s1"].n_dups == 1
    assert out.loc["s2"].n_docs == 2 and out.loc["s2"].n_dups == 0
    assert out.loc["s2"].n_langs == 2


# ---------------------------------------------------------------------------
# normalize_text: adversarial unicode battery vs the live DuckDB chain
# ---------------------------------------------------------------------------

NASTY = [
    "éà plain accents",
    "İstanbul ŞEHİRLERİ",          # dotted I: simple-lower divergence trap
    "Σ ΣΟΦΟΣ",                     # final sigma: full-casemap trap
    "ḝ x̣ stacked marks",           # multi-mark decompositions
    "Ω Å ﬁ compat singletons",     # NFC singletons, ligature untouched
    "한국어 조합",                  # precomposed Hangul
    "한 vs 한",  # precomposed vs decomposed jamo
    "  a\t\tb\nc  ",               # whitespace collapse + trim
    "ǅungla ß ẞ",                  # titlecase digraph, sharp s
    "ñoño — café nbsp",       # nbsp must NOT collapse (RE2 \s is ASCII)
    "",
    "plain ascii stays put",
]


def test_normalize_text_matches_duckdb(ray_session):
    from pyrosm_ray.stages.text import normalize_text, normalize_text_sql
    tbl = pa.table({
        "doc_id": pa.array(range(len(NASTY)), pa.int64()),
        "text": pa.array(NASTY, pa.string()),
    })
    got = normalize_text(rd.from_arrow(tbl)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("docs", tbl)
    ora = con.execute(
        f"SELECT doc_id, {normalize_text_sql('text')} FROM docs "
        "ORDER BY doc_id").fetch_df()
    assert got["text_norm"].tolist() == ora["text_norm"].tolist()


def test_normalize_text_block_split_invariant(ray_session):
    """Same output whether the table arrives as 1 block or 6."""
    from pyrosm_ray.stages.text import normalize_text
    tbl = pa.table({
        "doc_id": pa.array(range(len(NASTY)), pa.int64()),
        "text": pa.array(NASTY, pa.string()),
    })
    one = normalize_text(rd.from_arrow(tbl)).to_pandas() \
        .sort_values("doc_id")["text_norm"].tolist()
    many = normalize_text(
        rd.from_arrow(tbl).repartition(6)).to_pandas() \
        .sort_values("doc_id")["text_norm"].tolist()
    assert one == many


def test_slice_divergence_exact_and_orders(ray_session):
    """A drifted slice must carry higher KL than an on-distribution one,
    and the integer micro-nat sums must match the DuckDB twin exactly."""
    import duckdb
    import ray.data as rd

    from pyrosm_ray.stages.report import (slice_divergence,
                                          slice_divergence_sql)

    rng = np.random.RandomState(5)
    base = ["alpha", "beta", "gamma", "delta"]
    drift = ["zzz", "qqq", "alpha"]
    rows, srcs = [], []
    for i in range(150):
        src = "weird" if i % 5 == 0 else f"src{i % 2}"
        pool = drift if src == "weird" else base
        rows.append(" ".join(pool[j] for j in
                             rng.randint(0, len(pool), rng.randint(3, 9))))
        srcs.append(src)
    t = pa.table({"doc_id": pa.array(np.arange(150), pa.int64()),
                  "text": pa.array(rows, pa.string()),
                  "source": pa.array(srcs, pa.string())})
    got = slice_divergence(rd.from_arrow(t))
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(slice_divergence_sql()).fetchdf()
    assert list(got.source) == list(want.source)
    assert list(got.kl_token_micro) == list(want.kl_token_micro)
    assert list(got.n_tokens) == list(want.n_tokens)
    assert list(got.n_distinct_words) == list(want.n_distinct_words)
    g = got.set_index("source")
    # normalised KL: the drifted slice dominates
    kl = g.kl_token_micro / g.n_tokens
    assert kl["weird"] > kl["src0"] and kl["weird"] > kl["src1"]
    # partitioning invariance
    again = slice_divergence(rd.from_arrow(t).repartition(6))
    assert again.equals(got)


def test_slice_divergence_rejects_separator_in_slice(ray_session):
    """A slice value containing U+001F would corrupt the compound key —
    the stage must reject it instead of misattributing counts."""
    import pytest
    import ray.data as rd

    from pyrosm_ray.stages.report import slice_divergence

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["alpha beta", "gamma"], pa.string()),
                  "source": pa.array(["ok", "bad\x1fslice"], pa.string())})
    with pytest.raises(Exception, match="U\\+001F|separator"):
        slice_divergence(rd.from_arrow(t))
