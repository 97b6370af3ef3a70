"""Gopher-rule battery (stages/gopher.py): adversarial corpus where every
rule bites, with a DuckDB twin built from gopher_stats_sql."""

import duckdb
import pyarrow as pa
import ray.data as rd

from pyrosm_ray.stages import gopher as G

DOCS = [
    # 0: healthy prose — passes everything
    "the quick brown fox jumps over a lazy dog and runs to the hills "
    "where everything is calm and the day of rest begins " * 2,
    # 1: too short
    "tiny doc of the a in",
    # 2: symbol soup (# everywhere)
    "the # of # things # is # unknown # here # and # the # list # goes "
    "# on # and # on # with # hashes # in # every # gap # of # the # "
    "text # so # symbol # ratio # explodes # now # more # words # to # "
    "clear # the # word # floor # easily # done # here # now # yes # ok",
    # 3: bullet list
    "- the first point of the list\n- a second point in the list\n"
    "- the third point is here\n- a fourth point to end it",
    # 4: trailing ellipses on every line
    "the story starts here...\nand it keeps going…\nnever finishing...",
    # 5: numeric soup (alpha ratio fails)
    "11 22 33 44 55 66 77 88 99 00 " * 8 + "the a of and to in is go up",
    # 6: no stopwords at all
    "zebra quokka wombat lemur panda koala otter badger ferret stoat "
    * 5,
]


def _rules():
    return dict(min_words=20, max_words=200, min_word_len=2.0,
                max_word_len=8.0, min_stop_hits=2)


def test_gopher_flags_bite_per_rule(ray_session):
    t = pa.table({"doc_id": pa.array(range(len(DOCS)), pa.int64()),
                  "text": pa.array(DOCS, pa.string())})
    out = G.gopher_stats(rd.from_arrow(t), **_rules()).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["gopher_pass"].tolist() == [1, 0, 0, 0, 0, 0, 0]
    assert out["pass_n_words"].tolist()[1] == 0          # too short
    assert out["pass_symbol"].tolist()[2] == 0           # hash soup
    assert out["pass_bullet"].tolist()[3] == 0           # bullet list
    assert out["pass_ellipsis"].tolist()[4] == 0         # ellipsis lines
    assert out["pass_alpha"].tolist()[5] == 0            # numeric soup
    assert out["pass_stop"].tolist()[6] == 0             # no stopwords
    # each failing doc fails for its intended reason and no "healthy"
    # metric is corrupted: doc 0 passes each individual rule
    flag_cols = [c for c in out.columns if c.startswith("pass_")]
    assert all(out.loc[0, c] == 1 for c in flag_cols)


def test_gopher_duckdb_twin_bit_exact(ray_session):
    t = pa.table({"doc_id": pa.array(range(len(DOCS)), pa.int64()),
                  "text": pa.array(DOCS, pa.string())})
    got = G.gopher_stats(rd.from_arrow(t), **_rules()).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    sql = G.gopher_stats_sql("text", **_rules())
    con = duckdb.connect()
    con.register("docs", t)
    want = con.execute(
        "SELECT doc_id, "
        + ", ".join(f"{expr} AS {name}" for name, expr in sql.items())
        + " FROM docs ORDER BY doc_id").fetch_df()
    for col in sql:
        assert got[col].tolist() == want[col].tolist(), col


def test_gopher_filter_drops_and_keeps_schema(ray_session):
    t = pa.table({"doc_id": pa.array(range(len(DOCS)), pa.int64()),
                  "text": pa.array(DOCS, pa.string())})
    out = G.gopher_filter(rd.from_arrow(t), **_rules()).to_pandas()
    assert out["doc_id"].tolist() == [0]
    assert list(out.columns) == ["doc_id", "text"]
