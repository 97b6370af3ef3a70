"""HTML -> text extraction over the pages table's ``html:binary`` column.

This is the north-rule input contract made executable: BASELINE.json's
input_hint pins "byte-identical extracted text per url" as the per-row
invariant, so the extractor's output over the fixture corpus must equal
the stored ``text`` column byte for byte — and the driver oracle for
``q_extract_text`` asserts exactly that (the SQL twin simply selects the
stored column; the Ray side never reads it).

Extraction contract (the classic lynx/html2text-lite reduction, stdlib
``html.parser`` only — no lxml/selectolax in this container):

* content inside ``<script> <style> <head> <template> <noscript>`` is
  dropped (including everything nested under them);
* comments, processing instructions and declarations are dropped;
* character references (named and numeric) are decoded
  (``convert_charrefs`` semantics);
* block-level tags (``p div li h1..h6 ul ol table tr br title body
  article section header footer blockquote pre``) delimit text blocks;
  inline tags (``b i em span a strong code ...``) do not;
* within a block, runs of whitespace collapse to a single space and the
  block is stripped; empty blocks vanish;
* blocks join with a single ``\\n``.

Scale shape: one stateless ``map_batches`` pass; the ``html`` payload
column is read zero-copy from the object store and never shuffles. The
per-document parse is necessarily a Python loop (HTML is not a
vectorisable grammar; production pipelines bind a C parser here — the
honest stand-in is the stdlib parser, same plumbing). Everything around
it — batch sizing, column pruning at the read, streaming backpressure —
is the part that must hold at 10^12 documents, and does: the stage adds
one fixed-width string column per row and carries no state.
"""

from __future__ import annotations

from html.parser import HTMLParser

import numpy as np
import pyarrow as pa

_SKIP = {"script", "style", "head", "template", "noscript"}
_BLOCK = {"p", "div", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5",
          "h6", "table", "tr", "br", "title", "body", "html", "article",
          "section", "header", "footer", "blockquote", "pre", "main",
          "nav", "aside", "figure", "figcaption", "hr", "dt", "dd",
          "dl", "form", "fieldset", "address"}


class _TextExtractor(HTMLParser):
    """One-document extractor; instantiate per document (stdlib
    HTMLParser keeps internal feed state that a reset would have to
    chase — construction is cheap)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._buf: list[str] = []
        self._blocks: list[str] = []

    def _flush(self) -> None:
        if self._buf:
            block = " ".join("".join(self._buf).split())
            self._buf.clear()
            if block:
                self._blocks.append(block)

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip += 1
        elif tag in _BLOCK:
            self._flush()

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self._skip = max(0, self._skip - 1)
        elif tag in _BLOCK:
            self._flush()

    def handle_data(self, data):
        if not self._skip and data:
            self._buf.append(data)

    def text(self) -> str:
        self._flush()
        return "\n".join(self._blocks)


def extract_html_text(html: bytes | str) -> str:
    """Extract visible text from one HTML document per the module
    contract. Accepts bytes (utf-8, errors replaced) or str."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return p.text()


def extract_text(ds, html_col: str = "html", out_col: str = "text"):
    """Dataset stage: add ``out_col`` — the extracted visible text of
    ``html_col`` — to every row (replacing an existing column of that
    name). Stateless map_batches; the html column should be the only
    payload column carried to this stage (prune at the read)."""
    def run(batch: pa.Table) -> pa.Table:
        texts = pa.array(
            [extract_html_text(h) for h in batch[html_col].to_pylist()],
            pa.string())
        if out_col in batch.column_names:
            batch = batch.drop_columns([out_col])
        return batch.append_column(out_col, texts)

    return ds.map_batches(run, batch_format="pyarrow")


class _LinkCollector(HTMLParser):
    """Collect every ``<a href>`` value in document order."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)


def extract_page_links(html: bytes | str) -> list[str]:
    """All ``<a href>`` values of one document (real HTML parse — quote
    styles, attribute order and charrefs handled, unlike a regex)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _LinkCollector()
    p.feed(html)
    p.close()
    return p.hrefs


def extract_links(ds, html_col: str = "html", url_col: str = "url"):
    """Dataset stage: explode each page into its outlinks —
    (url, href) rows, one per ``<a href>`` occurrence in document
    order. Same scale shape as :func:`extract_text` (stateless
    map_batches; html never shuffles; the parse is the honest stdlib
    stand-in for a C parser)."""
    def run(batch: pa.Table) -> pa.Table:
        urls_out: list = []
        hrefs: list[str] = []
        urls = batch[url_col].to_pylist()
        for u, h in zip(urls, batch[html_col].to_pylist()):
            for href in extract_page_links(h):
                urls_out.append(u)
                hrefs.append(href)
        return pa.table({
            url_col: pa.array(urls_out, pa.string()),
            "href": pa.array(hrefs, pa.string()),
        })

    return ds.map_batches(run, batch_format="pyarrow")


# markup-structure feature patterns (RE2 — identical semantics in
# pyarrow's count_substring_regex and DuckDB's regexp_extract_all)
_TAG_RE = r"<[a-zA-Z/!]"
_LINK_RE = r"<[aA][ >]"
_SCRIPT_RE = r"<script"


def html_stats(ds, html_col: str = "html", text_col: str = "text",
               url_col: str = "url"):
    """Markup-structure features per page — the boilerplate-filter
    family (jusText/trafilatura-style link-density and text-ratio
    gates hang off these).

    -> (url, n_tags, n_links, n_scripts, html_bytes, text_chars,
    text_ratio_micro). One stateless vectorised pass: RE2 counts over
    the raw markup (zero-copy from the object store), byte/char
    lengths, and the text-to-markup ratio as an exact integer —
    ``(10⁶ · text_chars) // html_bytes`` — so the DuckDB twin matches
    bit-for-bit (no float division on either side)."""
    import pyarrow.compute as pc

    def run(batch: pa.Table) -> pa.Table:
        html_s = pc.cast(batch[html_col], pa.string())
        hb = pc.cast(pc.binary_length(batch[html_col]), pa.int64())
        tc = pc.cast(pc.utf8_length(batch[text_col]), pa.int64())
        hb_np = np.asarray(hb.to_numpy(zero_copy_only=False), np.int64)
        tc_np = np.asarray(tc.to_numpy(zero_copy_only=False), np.int64)
        ratio = np.where(hb_np > 0, (1_000_000 * tc_np)
                         // np.maximum(hb_np, 1), 0)
        return pa.table({
            url_col: batch[url_col],
            "n_tags": pc.cast(
                pc.count_substring_regex(html_s, _TAG_RE), pa.int64()),
            "n_links": pc.cast(
                pc.count_substring_regex(html_s, _LINK_RE), pa.int64()),
            "n_scripts": pc.cast(
                pc.count_substring_regex(html_s, _SCRIPT_RE),
                pa.int64()),
            "html_bytes": hb,
            "text_chars": tc,
            "text_ratio_micro": pa.array(ratio, pa.int64()),
        })

    return ds.map_batches(run, batch_format="pyarrow")


def html_stats_sql(pages_expr: str, html_col: str = "html",
                   text_col: str = "text", url_col: str = "url") -> str:
    """DuckDB twin of :func:`html_stats` (``pages_expr`` is a table or
    read_parquet expression)."""
    h = f"decode({html_col})"
    return f"""
        SELECT {url_col},
               CAST(len(regexp_extract_all({h}, '{_TAG_RE}')) AS BIGINT)
                   AS n_tags,
               CAST(len(regexp_extract_all({h}, '{_LINK_RE}')) AS BIGINT)
                   AS n_links,
               CAST(len(regexp_extract_all({h}, '{_SCRIPT_RE}'))
                   AS BIGINT) AS n_scripts,
               CAST(octet_length({html_col}) AS BIGINT) AS html_bytes,
               CAST(length({text_col}) AS BIGINT) AS text_chars,
               CAST(CASE WHEN octet_length({html_col}) > 0
                    THEN (1000000 * length({text_col}))
                         // octet_length({html_col})
                    ELSE 0 END AS BIGINT) AS text_ratio_micro
        FROM {pages_expr} ORDER BY {url_col}"""
