"""Extractor correctness: HTML boilerplate stripping and PDF parsing
must reproduce the corpus generator's ground-truth text byte-for-byte
(the BASELINE.json per-row invariant), plus behavior on edge inputs."""

import random

import pytest

from ocr_spark import corpus
from ocr_spark.html_extract import html_extract, tokenize_blocks
from ocr_spark.pdf_extract import pdf_extract, pdf_extract_pages, pdf_page_count


class TestHtmlExtract:
    def test_simple_article(self):
        html = b"""<!DOCTYPE html><html><head><title>T</title>
        <script>var x = '<p>fake</p>';</script></head>
        <body><nav><a href="/">Home</a><a href="/a">About</a></nav>
        <article><h1>Real Title</h1>
        <p>First paragraph with enough words here.</p>
        <p>Second paragraph also has many words.</p></article>
        <footer><p>Copyright footer text here always</p></footer>
        </body></html>"""
        out = html_extract(html)
        assert out.text == (
            "Real Title\n\nFirst paragraph with enough words here."
            "\n\nSecond paragraph also has many words."
        )

    def test_link_dense_block_dropped(self):
        html = (
            b"<body><p><a href='/1'>one</a> <a href='/2'>two</a> "
            b"<a href='/3'>three</a></p>"
            b"<p>real content paragraph with words</p></body>"
        )
        out = html_extract(html)
        assert out.text == "real content paragraph with words"

    def test_boiler_class_subtree_dropped(self):
        html = (
            b"<body><div class='sidebar'><p>tag cloud words many words</p></div>"
            b"<p>keep this paragraph text</p></body>"
        )
        assert html_extract(html).text == "keep this paragraph text"

    def test_entities_decoded(self):
        html = b"<body><p>fish &amp; chips &lt;tag&gt; &quot;quoted&quot;</p></body>"
        assert html_extract(html).text == 'fish & chips <tag> "quoted"'

    def test_whitespace_collapsed(self):
        html = b"<body><p>a\n\t  b   <b>c</b>\nd</p></body>"
        assert html_extract(html).text == "a b c d"

    def test_inline_markup_preserved_text(self):
        html = b"<body><p>one <b>two</b> <em>three</em> <code>four</code> five</p></body>"
        assert html_extract(html).text == "one two three four five"

    def test_comment_skipped(self):
        html = b"<body><!-- <p>ghost content</p> --><p>visible words here</p></body>"
        assert html_extract(html).text == "visible words here"

    def test_style_script_skipped(self):
        html = (
            b"<body><style>p { color: red }</style>"
            b"<script>document.write('<p>no</p>')</script>"
            b"<p>yes content here</p></body>"
        )
        assert html_extract(html).text == "yes content here"

    def test_spans_cover_text(self):
        html = b"<body><h1>Head</h1><p>body paragraph words</p></body>"
        out = html_extract(html)
        assert len(out.spans) == 2
        for span in out.spans:
            seg = out.text[span["start"] : span["start"] + span["length"]]
            assert seg and "\n" not in seg
        assert out.spans[0]["kind"] == "heading"

    def test_empty_and_garbage(self):
        assert html_extract(b"").text == ""
        assert html_extract(b"<><<>>").text == ""
        # unterminated tag — must not raise
        html_extract(b"<body><p>abc")

    def test_nested_div_blocks(self):
        html = (
            b"<body><div><div><p>inner paragraph has words</p></div>"
            b"<p>outer paragraph has words</p></div></body>"
        )
        out = html_extract(html)
        assert out.text == "inner paragraph has words\n\nouter paragraph has words"

    def test_utf8_content(self):
        html = "<body><p>数据 管道 提取 引擎 分析</p></body>".encode("utf-8")
        assert html_extract(html).text == "数据 管道 提取 引擎 分析"

    def test_block_count_metrics(self):
        html = b"<body><nav><a href='/'>Home</a></nav><p>content words here</p></body>"
        out = html_extract(html)
        assert out.metrics["n_content_blocks"] == 1
        assert out.metrics["n_boiler_blocks"] >= 1


class TestPdfExtract:
    def test_roundtrip_single_page(self):
        rng = random.Random(7)
        pdf, truth = corpus.make_pdf(rng, n_pages=1)
        assert pdf_extract(pdf).text == truth

    def test_roundtrip_multi_page(self):
        rng = random.Random(11)
        pdf, truth = corpus.make_pdf(rng, n_pages=4)
        out = pdf_extract(pdf)
        assert out.text == truth
        assert out.metrics["n_pages"] == 4

    def test_page_count(self):
        rng = random.Random(3)
        pdf, _ = corpus.make_pdf(rng, n_pages=3)
        assert pdf_page_count(pdf) == 3

    def test_pages_in_order(self):
        rng = random.Random(5)
        pdf, truth = corpus.make_pdf(rng, n_pages=2)
        pages = pdf_extract_pages(pdf)
        assert "\n\n".join(pages) == truth

    def test_escapes(self):
        # hand-built content with escaped parens and backslash
        import zlib

        content = rb"BT /F1 12 Tf 72 720 Td (a \(b\) c\\d) Tj ET"
        comp = zlib.compress(content)
        pdf = (
            b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
            b"4 0 obj\n<< /Length "
            + str(len(comp)).encode()
            + b" /Filter /FlateDecode >>\nstream\n"
            + comp
            + b"\nendstream\nendobj\n"
        )
        assert pdf_extract(pdf).text == "a (b) c\\d"

    def test_garbage_returns_empty(self):
        assert pdf_extract(b"%PDF-1.4 garbage").text == ""
        assert pdf_page_count(b"not a pdf") == 0

    def test_many_seeds_roundtrip(self):
        for seed in range(40):
            rng = random.Random(1000 + seed)
            pdf, truth = corpus.make_pdf(rng)
            assert pdf_extract(pdf).text == truth, f"seed {seed}"


class TestCorpusRoundtrip:
    """The central contract: extractor(payload) == ground truth text,
    byte-for-byte, for every generated row."""

    def test_roundtrip_500_rows(self):
        from ocr_spark.textops import sniff_kind

        n_checked = {"html": 0, "pdf": 0}
        for row in corpus.generate_rows(500, seed=42):
            kind = sniff_kind(row["html"])
            if kind == "pdf":
                got = pdf_extract(row["html"]).text
            else:
                got = html_extract(row["html"]).text
            assert got == row["text"], f"mismatch at {row['url']} ({kind})"
            n_checked[kind] += 1
        assert n_checked["html"] > 300
        assert n_checked["pdf"] > 20

    def test_determinism(self):
        a = list(corpus.generate_rows(50, seed=9))
        b = list(corpus.generate_rows(50, seed=9))
        assert a == b

    def test_zipf_host_skew(self):
        from collections import Counter

        hosts = Counter(
            row["url"].split("/")[2] for row in corpus.generate_rows(2000, seed=1)
        )
        top = hosts.most_common(1)[0][1]
        assert top > 2000 * 0.05  # head host dominates
        assert len(hosts) > 50  # but there is a long tail
