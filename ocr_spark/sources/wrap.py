"""Deterministic payload wrappers: turn a plain-text table into
Common-Crawl-shaped payloads (HTML or PDF) so the extraction pipeline
can run against ANY text corpus — including the driver's reduced-shape
``documents(doc_id, text, ...)`` testdata — with a SQL-expressible
oracle: by construction, ``extract(wrap(text)) == normalize_ws(text)``
(single whitespace rule, textops.normalize_ws), which DuckDB states as
``regexp_replace(trim(text), '\\s+', ' ', 'g')``.

The wrap is NOT a no-op for the extractor: the HTML wrapper buries the
text in the same boilerplate skeleton the corpus generator uses
(nav/header/sidebar/footer/script), so the round-trip exercises real
boilerplate classification; the PDF wrapper emits a real
flate-compressed content stream the parser must actually parse.
"""

from __future__ import annotations

import html as _htmllib
import zlib
from typing import Iterator, List

import pandas as pd

_HTML_TEMPLATE_HEAD = (
    "<!DOCTYPE html>\n<html><head><title>wrapped</title>"
    "<style>body { margin:0 }</style>"
    "<script>var nothing = '<p>decoy</p>';</script></head>\n<body>"
    '<header class="masthead"><nav><ul>'
    '<li><a href="/home">Home</a></li><li><a href="/about">About</a></li>'
    '<li><a href="/docs">Docs</a></li></ul></nav></header>'
    '<aside class="sidebar"><a href="/t/a">a</a> <a href="/t/b">b</a></aside>'
    "<main><article>"
)
_HTML_TEMPLATE_TAIL = (
    "</article></main>"
    '<footer><p>footer boilerplate text for every page</p></footer>'
    "</body></html>"
)


def wrap_text_html(text: str) -> bytes:
    """Text -> boilerplate-wrapped HTML page whose main content is the
    (escaped) text in a single paragraph."""
    escaped = _htmllib.escape(text)
    return (
        _HTML_TEMPLATE_HEAD + "<p>" + escaped + "</p>" + _HTML_TEMPLATE_TAIL
    ).encode("utf-8")


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _build_pdf(page_texts: List[str]) -> bytes:
    """Minimal deterministic PDF: one single-line flate-compressed
    content stream per page, correct xref."""
    objects: List[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"",  # pages dict placeholder (index 1)
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    first_page = 4
    kids = " ".join(f"{first_page + 2 * i} 0 R" for i in range(len(page_texts)))
    objects[1] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_texts)} >>".encode()
    )
    for i, page_text in enumerate(page_texts):
        content_num = first_page + 2 * i + 1
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {content_num} 0 R >>"
            ).encode()
        )
        content = (
            f"BT\n/F1 12 Tf\n72 720 Td\n({_pdf_escape(page_text)}) Tj\nET"
        ).encode("latin-1", errors="replace")
        comp = zlib.compress(content, 6)
        objects.append(
            (f"<< /Length {len(comp)} /Filter /FlateDecode >>\nstream\n").encode()
            + comp
            + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


def wrap_text_pdf(text: str) -> bytes:
    """Text -> one-page PDF with the normalized text as a single Tj
    run in a flate-compressed content stream."""
    return _build_pdf([" ".join(text.split())])


# Words per page for the multi-page wrapper; the SQL oracle states the
# identical chunking, so keep them in lockstep.
PAGE_WORDS = 60


def wrap_text_pdf_pages(text: str, page_words: int = PAGE_WORDS) -> bytes:
    """Text -> multi-page PDF, ``page_words`` words per page.  By
    construction ``assemble(extract_pages(wrap)) ==`` the pages'
    normalized texts joined with '\\n\\n' — the flagship fan-out +
    assembly round trip, stated in SQL by the oracle."""
    words = text.split()
    n_pages = max(1, (len(words) + page_words - 1) // page_words)
    chunks = [
        " ".join(words[j * page_words : (j + 1) * page_words])
        for j in range(n_pages)
    ]
    return _build_pdf(chunks)


def sql_wrapped_html(text_expr: str) -> str:
    """DuckDB expression for ``wrap_text_html(text)`` as a VARCHAR —
    the byte-exact SQL restatement (html.escape's replacement order:
    ``&`` first, then ``<``, ``>``, ``\"``, ``'``) used by the WARC
    roundtrip oracle to verify payload bytes end-to-end."""
    escaped = text_expr
    for src, dst in [
        ("&", "&amp;"),
        ("<", "&lt;"),
        (">", "&gt;"),
        ('"', "&quot;"),
        ("'", "&#x27;"),
    ]:
        sq_src = src.replace("'", "''")
        escaped = f"replace({escaped}, '{sq_src}', '{dst}')"
    head = _HTML_TEMPLATE_HEAD.replace("'", "''")
    tail = _HTML_TEMPLATE_TAIL.replace("'", "''")
    return f"('{head}' || '<p>' || {escaped} || '</p>' || '{tail}')"


_WRAPPERS = {
    "html": wrap_text_html,
    "pdf": wrap_text_pdf,
    "pdf_pages": wrap_text_pdf_pages,
}


def _wrap_batches(kind: str):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        wrapper = _WRAPPERS[kind]
        for pdf_batch in batches:
            yield pd.DataFrame(
                {
                    "url": pdf_batch["url"],
                    "html": [wrapper(t or "") for t in pdf_batch["text"]],
                }
            )

    return fn


def wrap_as_html(df, url_col: str = "url", text_col: str = "text"):
    """DataFrame(text) -> DataFrame(url, html binary) of wrapped pages."""
    from pyspark.sql import functions as F

    narrowed = df.select(
        F.col(url_col).cast("string").alias("url"), F.col(text_col).alias("text")
    )
    return narrowed.mapInPandas(_wrap_batches("html"), "url string, html binary")


def wrap_as_pdf(df, url_col: str = "url", text_col: str = "text"):
    from pyspark.sql import functions as F

    narrowed = df.select(
        F.col(url_col).cast("string").alias("url"), F.col(text_col).alias("text")
    )
    return narrowed.mapInPandas(_wrap_batches("pdf"), "url string, html binary")


def wrap_as_pdf_pages(df, url_col: str = "url", text_col: str = "text"):
    """Multi-page PDF payloads (PAGE_WORDS words per page)."""
    from pyspark.sql import functions as F

    narrowed = df.select(
        F.col(url_col).cast("string").alias("url"), F.col(text_col).alias("text")
    )
    return narrowed.mapInPandas(
        _wrap_batches("pdf_pages"), "url string, html binary"
    )
