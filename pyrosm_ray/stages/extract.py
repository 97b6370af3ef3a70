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
