"""HTML -> text extraction: contract pins + the input_hint invariant
(extracted text byte-identical to the fixture's stored text column)."""

import pyarrow.parquet as pq
import ray.data as rd

from pyrosm_ray.stages.extract import extract_html_text, extract_text


def test_entities_decode():
    assert extract_html_text("<p>a&#32;b&amp;c&lt;d&nbsp;e</p>") \
        == "a b&c<d e"


def test_script_style_head_dropped():
    h = ("<html><head><title>T</title><style>p{}</style></head>"
         "<body><script>var x='<p>no</p>';</script><p>yes</p>"
         "<noscript>off</noscript></body></html>")
    assert extract_html_text(h) == "yes"


def test_blocks_join_with_newline_inline_tags_pass():
    h = "<div>one <b>bold</b> word</div><p>two</p><br>three"
    assert extract_html_text(h) == "one bold word\ntwo\nthree"


def test_whitespace_collapse_and_empty_blocks():
    h = "<p>  a\n\t b  </p><div>   </div><p>c</p>"
    assert extract_html_text(h) == "a b\nc"


def test_comments_dropped_mid_text():
    assert extract_html_text("<p>a <!-- x --> b</p>") == "a b"


def test_nested_skip_depth():
    h = "<script><script></script>still junk</script><p>ok</p>"
    # stdlib parser treats the inner tags as CDATA until the first
    # close; the outer close then re-enables text — guard keeps >= 0
    assert "ok" in extract_html_text(h)


def test_bytes_input():
    assert extract_html_text(b"<p>caf\xc3\xa9</p>") == "café"


def test_dataset_stage_and_fixture_invariant(ray_session):
    """The north-rule input_hint contract: extraction over the html
    BINARY column reproduces the stored text column byte for byte,
    across all four fixture html variants."""
    from pyrosm_ray.fixtures import ensure_fixtures
    fx = ensure_fixtures("sf0.001")
    t = pq.read_table(str(fx / "pages.parquet"),
                      columns=["url", "html", "text"])
    ds = rd.from_arrow(t.select(["url", "html"]))
    got = extract_text(ds, out_col="extracted").to_pandas() \
        .sort_values("url").reset_index(drop=True)
    want = t.select(["url", "text"]).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert len(got) == len(want) >= 200
    assert (got["extracted"].to_numpy() == want["text"].to_numpy()).all()


def test_html_stats_counts(ray_session):
    import duckdb
    import pyarrow as pa

    from pyrosm_ray.stages.extract import html_stats, html_stats_sql
    html1 = (b"<html><body><a href='/x'>one</a><A HREF='/y'>two</A>"
             b"<script>var a=1;</script><p>hello world</p></body></html>")
    html2 = b"<div><p>plain</p></div>"
    t = pa.table({
        "url": pa.array(["a://1", "a://2"], pa.string()),
        "html": pa.array([html1, html2], pa.binary()),
        "text": pa.array(["one two hello world", "plain"], pa.string()),
    })
    got = html_stats(rd.from_arrow(t)).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert list(got.n_links) == [2, 0]          # <a and <A both count
    assert list(got.n_scripts) == [1, 0]
    assert got.n_tags[0] > got.n_tags[1] > 0    # closers count too
    assert list(got.html_bytes) == [len(html1), len(html2)]
    # integer ratio rule
    assert got.text_ratio_micro[0] == (1_000_000 * 19) // len(html1)
    # DuckDB twin agrees bit-for-bit
    con = duckdb.connect()
    con.register("pages_t", t)
    odf = con.execute(html_stats_sql("pages_t")).fetchdf()
    assert got.equals(odf.astype(got.dtypes.to_dict()))
