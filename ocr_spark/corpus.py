"""Seeded synthetic corpus generator for the full input shape
``documents(url, warc_ts, html, text, lang)`` (BASELINE.json input_hint).

Generates Common-Crawl-style pages: ~90% templated HTML (boilerplate
nav/header/sidebar/footer/scripts around known main content) and ~10%
synthetic PDFs written by this module's own minimal PDF writer
(flate-compressed content streams, Tj/TJ/Td text operators) — mirroring
the reference's image/PDF dual pipeline (reference models/database.py:21-24).

The ``text`` column is the ground truth the extractors must reproduce
byte-for-byte.  Hostnames are Zipf-skewed so a handful of hosts
dominate, exercising url-hash salting (SURVEY.md §4).

Everything is driven by a single seed — same seed, same bytes.
"""

from __future__ import annotations

import datetime as _dt
import random
import zlib
from typing import Iterator, List, Optional, Tuple

_WORDS_EN = (
    "analysis apparatus balance basin bridge canvas carbon cellar chapter "
    "circuit climate cluster column comet copper current dynamo engine "
    "fabric filter forest furnace galaxy garden glacier granite harbor "
    "helium imprint island jigsaw journal kernel lantern lattice ledger "
    "magnet marble meadow mirror module motive needle nickel orbit oxide "
    "packet parcel pillar piston planet prism pulley quartz radius reactor "
    "ribbon rocket saddle sensor signal silver socket spiral spring stable "
    "stream summit tandem tanker tariff temple tensor thread timber tunnel "
    "turbine valley vapor vector vessel violet voltage walnut window zenith"
).split()

_WORDS_ZH = list("机器学习数据管道分析引擎查询计划分布式系统内容提取网页文档处理批量计算")

_BOILER_LINKS = (
    "Home About Products Pricing Careers Blog Contact Login Signup Docs "
    "Support Terms Privacy Sitemap Press Partners"
).split()

_HOST_COUNT = 1000
_LANGS = ["en", "en", "en", "en", "en", "en", "de", "fr", "es", "zh"]

# HTML entities the generator injects: (entity-in-html, decoded char).
_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"')]


def _hosts() -> List[str]:
    return [f"site-{i:04d}.example.org" for i in range(_HOST_COUNT)]


def _zipf_weights(n: int, s: float = 1.2) -> List[float]:
    return [1.0 / ((i + 1) ** s) for i in range(n)]


def _sentence(rng: random.Random, words: List[str], n: int) -> str:
    picked = [rng.choice(words) for _ in range(n)]
    picked[0] = picked[0].capitalize()
    return " ".join(picked) + rng.choice([".", ".", ".", "?", "!"])


def _paragraph_parts(
    rng: random.Random, words: List[str]
) -> Tuple[str, str]:
    """Build one paragraph simultaneously as (html_inner, plain_text).

    Inline markup (<b>/<em>/<code>/<a>) and HTML entities are injected
    into the html form; the plain form carries the visible text after
    entity decoding and whitespace normalization.
    """
    html_parts: List[str] = []
    text_parts: List[str] = []
    n_sentences = rng.randint(1, 4)
    for _ in range(n_sentences):
        sent = _sentence(rng, words, rng.randint(4, 14))
        roll = rng.random()
        if roll < 0.15:
            tag = rng.choice(["b", "em", "strong", "i", "code"])
            html_parts.append(f"<{tag}>{sent}</{tag}>")
            text_parts.append(sent)
        elif roll < 0.25:
            # short inline link: link text stays well under 1/3 of the
            # block so the paragraph survives the link-density rule.
            anchor = rng.choice(words)
            filler = _sentence(rng, words, rng.randint(10, 16))
            html_parts.append(
                f'{sent} <a href="/ref/{anchor}">{anchor}</a> {filler}'
            )
            text_parts.append(f"{sent} {anchor} {filler}")
        elif roll < 0.35:
            ent, ch = rng.choice(_ENTITIES)
            left = _sentence(rng, words, rng.randint(3, 8))
            right = _sentence(rng, words, rng.randint(3, 8))
            html_parts.append(f"{left} {ent} {right}")
            text_parts.append(f"{left} {ch} {right}")
        elif roll < 0.45:
            # whitespace noise in markup: newlines/tabs collapse to one
            # space under the engine's single normalization rule.
            a = _sentence(rng, words, rng.randint(3, 9))
            b = _sentence(rng, words, rng.randint(3, 9))
            html_parts.append(f"{a}\n\t   {b}")
            text_parts.append(f"{a} {b}")
        else:
            html_parts.append(sent)
            text_parts.append(sent)
    return " ".join(html_parts), " ".join(text_parts)


def make_html(
    rng: random.Random, lang: str, paras: Tuple[int, int] = (1, 8)
) -> Tuple[bytes, str]:
    """One synthetic page: returns (html_bytes, ground_truth_text).

    ``paras`` bounds the main-content paragraph count — (1, 8) yields
    ~2.5 KB pages (unit-test sized); (30, 80) yields ~25-60 KB pages,
    the realistic Common-Crawl regime for throughput measurement.
    """
    words = _WORDS_ZH if lang == "zh" else _WORDS_EN
    title = _sentence(rng, words, rng.randint(3, 7)).rstrip(".?!")
    n_paras = rng.randint(*paras)
    paras = [_paragraph_parts(rng, words) for _ in range(n_paras)]
    n_headings = rng.randint(0, 2)
    heading_at = sorted(rng.sample(range(n_paras), min(n_headings, n_paras)))
    headings = {
        pos: _sentence(rng, words, rng.randint(2, 5)).rstrip(".?!")
        for pos in heading_at
    }

    nav_links = "".join(
        f'<li><a href="/{l.lower()}">{l}</a></li>'
        for l in rng.sample(_BOILER_LINKS, 6)
    )
    sidebar_links = "".join(
        f'<a href="/t/{w}">{w}</a> ' for w in rng.sample(words, 8)
    )
    footer_text = _sentence(rng, words, 8)
    comment_text = _sentence(rng, words, 12)

    body_main: List[str] = [f"<h1>{title}</h1>"]
    extra_truth: dict = {}  # idx -> list of truth blocks appended after para idx
    for idx, (p_html, _) in enumerate(paras):
        if idx in headings:
            body_main.append(f"<h2>{headings[idx]}</h2>")
        body_main.append(f"<p>{p_html}</p>")
        # Structural constructs after some paragraphs. Each li/td/
        # blockquote is a block tag, so each becomes its own extracted
        # block (joined '\n\n'); the truth mirrors that exactly.
        roll = rng.random()
        if roll < 0.12:
            items = [
                _sentence(rng, words, rng.randint(2, 6))
                for _ in range(rng.randint(2, 5))
            ]
            body_main.append(
                "<ul>" + "".join(f"<li>{it}</li>" for it in items) + "</ul>"
            )
            extra_truth[idx] = list(items)
        elif roll < 0.2:
            cells = [
                [_sentence(rng, words, rng.randint(2, 5)) for _ in range(2)]
                for _ in range(2)
            ]
            body_main.append(
                "<table>"
                + "".join(
                    "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>"
                    for row in cells
                )
                + "</table>"
            )
            extra_truth[idx] = [c for row in cells for c in row]
        elif roll < 0.26:
            quote = _sentence(rng, words, rng.randint(4, 10))
            body_main.append(f"<blockquote>{quote}</blockquote>")
            extra_truth[idx] = [quote]

    html_doc = f"""<!DOCTYPE html>
<html lang="{lang}">
<head>
<meta charset="utf-8">
<title>{title} — site</title>
<style>body {{ margin: 0; }} .x > a {{ color: red }}</style>
<script>var cfg = {{"a": 1, "html": "<p>not content</p>"}};</script>
</head>
<body>
<header class="masthead"><div class="logo">ExampleSite</div>
<nav><ul>{nav_links}</ul></nav>
</header>
<!-- layout: {rng.randint(0, 99999)} -->
<div class="container">
<aside class="sidebar"><h3>Tags</h3><div class="widget">{sidebar_links}</div></aside>
<main>
<article>
{chr(10).join(body_main)}
</article>
<div class="comments"><h3>Comments</h3><p>{comment_text}</p></div>
</main>
</div>
<div class="share-buttons"><a href="#tw">Tweet</a> <a href="#fb">Share</a></div>
<footer><p>{footer_text}</p><p class="copyright">© 2025 ExampleSite</p></footer>
<script src="/static/app.js"></script>
</body>
</html>"""

    truth_blocks: List[str] = [title]
    for idx, (_, p_text) in enumerate(paras):
        if idx in headings:
            truth_blocks.append(headings[idx])
        truth_blocks.append(p_text)
        truth_blocks.extend(extra_truth.get(idx, []))
    truth = "\n\n".join(truth_blocks)
    return html_doc.encode("utf-8"), truth


# ---------------------------------------------------------------------------
# Minimal deterministic PDF writer (the corpus's own, no libs).
# ---------------------------------------------------------------------------


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _page_content_stream(lines: List[str], rng: random.Random) -> bytes:
    """Content stream for one page; exercises Td-relative moves, Tm,
    T*, TJ arrays and split runs so the parser's clustering is real."""
    ops: List[str] = ["BT", "/F1 12 Tf", "14 TL", "72 720 Td"]
    y = 720
    first = True
    for line in lines:
        if not first:
            y -= 14
            style = rng.random()
            if style < 0.5:
                ops.append("0 -14 Td")
            elif style < 0.8:
                ops.append("T*")
            else:
                ops.append(f"1 0 0 1 72 {y} Tm")
        first = False
        roll = rng.random()
        if roll < 0.6 or len(line) < 8:
            ops.append(f"({_pdf_escape(line)}) Tj")
        elif roll < 0.85:
            cut = rng.randint(1, len(line) - 1)
            ops.append(
                f"[({_pdf_escape(line[:cut])}) -20 ({_pdf_escape(line[cut:])})] TJ"
            )
        else:
            cut = rng.randint(1, len(line) - 1)
            ops.append(f"({_pdf_escape(line[:cut])}) Tj")
            # second run on the same line, to the right
            ops.append(f"200 0 Td ({_pdf_escape(line[cut:])}) Tj")
            ops.append("-200 0 Td")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def make_pdf(rng: random.Random, n_pages: Optional[int] = None) -> Tuple[bytes, str]:
    """A complete 1-5-page PDF; returns (pdf_bytes, ground_truth_text).

    Structure: catalog(1) -> pages(2) -> [page obj, flate content obj]
    per page + font obj, plus a correct xref table.
    """
    if n_pages is None:
        n_pages = rng.randint(1, 5)
    pages_lines: List[List[str]] = []
    for _ in range(n_pages):
        n_lines = rng.randint(2, 12)
        pages_lines.append(
            [_sentence(rng, _WORDS_EN, rng.randint(3, 10)) for _ in range(n_lines)]
        )

    objects: List[bytes] = []  # bodies, object number = index + 1
    font_num = 3
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    first_page_num = 4
    kids = " ".join(
        f"{first_page_num + 2 * i} 0 R" for i in range(n_pages)
    )
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # 2
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )  # 3
    for i, lines in enumerate(pages_lines):
        page_num = first_page_num + 2 * i
        content_num = page_num + 1
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
                f"/Contents {content_num} 0 R >>"
            ).encode()
        )
        raw = _page_content_stream(lines, rng)
        compressed = zlib.compress(raw, 6)
        objects.append(
            (
                f"<< /Length {len(compressed)} /Filter /FlateDecode >>\n"
                "stream\n"
            ).encode()
            + compressed
            + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()

    truth = "\n\n".join("\n".join(lines) for lines in pages_lines)
    return bytes(out), truth


# ---------------------------------------------------------------------------
# Corpus assembly
# ---------------------------------------------------------------------------

_EPOCH = _dt.datetime(2025, 1, 1, 0, 0, 0)


def generate_rows(
    n_docs: int,
    seed: int = 42,
    pdf_fraction: float = 0.1,
    paras: Tuple[int, int] = (1, 8),
    pdf_pages: Optional[Tuple[int, int]] = None,
) -> Iterator[dict]:
    """Deterministic rows of the full documents shape."""
    rng = random.Random(seed)
    hosts = _hosts()
    weights = _zipf_weights(len(hosts))
    host_choices = rng.choices(range(len(hosts)), weights=weights, k=n_docs)
    for i in range(n_docs):
        row_rng = random.Random((seed << 20) ^ i)
        host = hosts[host_choices[i]]
        url = f"https://{host}/page/{i:08d}"
        ts = _EPOCH + _dt.timedelta(seconds=row_rng.randint(0, 30 * 86400 - 1))
        if row_rng.random() < pdf_fraction:
            n_pages = row_rng.randint(*pdf_pages) if pdf_pages else None
            payload, truth = make_pdf(row_rng, n_pages=n_pages)
            lang = "en"
        else:
            lang = row_rng.choice(_LANGS)
            payload, truth = make_html(row_rng, lang, paras=paras)
        yield {
            "url": url,
            "warc_ts": ts,
            "html": payload,
            "text": truth,
            "lang": lang,
        }


_CORPUS_SCHEMA_FIELDS = (
    ("url", "string"),
    ("warc_ts", "timestamp"),
    ("html", "binary"),
    ("text", "string"),
    ("lang", "string"),
)


def _arrow_schema():
    import pyarrow as pa

    mapping = {
        "string": pa.string(),
        "timestamp": pa.timestamp("us"),
        "binary": pa.binary(),
    }
    return pa.schema(
        [pa.field(name, mapping[kind]) for name, kind in _CORPUS_SCHEMA_FIELDS]
    )


def write_corpus(
    path: str,
    n_docs: int,
    seed: int = 42,
    pdf_fraction: float = 0.1,
    n_files: int = 1,
    paras: Tuple[int, int] = (1, 8),
    pdf_pages: Optional[Tuple[int, int]] = None,
) -> int:
    """Write the corpus as parquet; returns row count.

    ``n_files=1`` writes a single file at ``path`` (test fixtures).
    ``n_files>1`` writes ``path`` as a directory of part files so a
    Spark scan parallelizes across input splits — the shape a real
    crawl table has (many files), and what the bench needs so the
    scan stage isn't a single serial task.
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = list(
        generate_rows(
            n_docs,
            seed=seed,
            pdf_fraction=pdf_fraction,
            paras=paras,
            pdf_pages=pdf_pages,
        )
    )
    schema = _arrow_schema()
    if n_files <= 1:
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), path)
        return len(rows)
    os.makedirs(path, exist_ok=True)
    per = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = rows[i * per : (i + 1) * per]
        if not chunk:
            break
        pq.write_table(
            pa.Table.from_pylist(chunk, schema=schema),
            os.path.join(path, f"part-{i:05d}.parquet"),
        )
    return len(rows)
