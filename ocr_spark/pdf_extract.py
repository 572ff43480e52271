"""Pure-Python PDF text extraction (no external libs, no rasterizing).

Replaces the reference's render-page-to-PNG-then-OCR path
(/root/reference/main.py:590-633 pdf_to_images_generator;
core/page_processor.py:502-626 _process_single_page) with direct layout
parsing of the PDF: an object scanner finds indirect objects, the page
tree (/Root -> /Pages -> /Kids) gives page order, content streams are
flate-decoded and tokenized (BT/ET, Td/TD/Tm/T*, Tj/'/TJ), and text
runs are clustered by y into lines, sorted by x within a line.

Per-page text joins lines with '\\n'; the document joins pages with
'\\n\\n' — the reference's assembly separator (core/task_manager.py:542).

Scope is honest (SURVEY.md §7): flate or plain streams, literal/hex
strings, standard simple fonts with latin-1-ish byte mapping — the
profile the corpus generator emits — not arbitrary wild PDFs; anything
unparseable degrades to skipped objects, never an exception.
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Optional, Tuple

from .html_extract import Extracted

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")
_TYPE_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_TYPE_PAGES_RE = re.compile(rb"/Type\s*/Pages\b")
_TYPE_CATALOG_RE = re.compile(rb"/Type\s*/Catalog\b")
_KIDS_RE = re.compile(rb"/Kids\s*\[([^\]]*)\]")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[([^\]]*)\]")
_PAGES_REF_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")
_FLATE_RE = re.compile(rb"/Filter\s*/FlateDecode\b")

_LINE_Y_TOLERANCE = 0.5


def _scan_objects(pdf: bytes) -> Dict[int, Tuple[bytes, Optional[bytes]]]:
    """Map object number -> (dict/body bytes, raw stream bytes or None).

    A linear scan for ``N G obj`` is more robust than trusting the xref
    table and is O(file size).
    """
    objects: Dict[int, Tuple[bytes, Optional[bytes]]] = {}
    for m in _OBJ_RE.finditer(pdf):
        num = int(m.group(1))
        start = m.end()
        end = pdf.find(b"endobj", start)
        if end == -1:
            end = len(pdf)
        body = pdf[start:end]
        stream_data: Optional[bytes] = None
        sm = _STREAM_RE.search(body)
        if sm:
            data_start = sm.end()
            lm = _LENGTH_RE.search(body[: sm.start()])
            if lm:
                length = int(lm.group(1))
                stream_data = body[data_start : data_start + length]
            else:
                send = body.find(b"endstream", data_start)
                if send == -1:
                    send = len(body)
                stream_data = body[data_start:send].rstrip(b"\r\n")
            body = body[: sm.start()]
        objects[num] = (body, stream_data)
    return objects


def _page_order(objects: Dict[int, Tuple[bytes, Optional[bytes]]]) -> List[int]:
    """Page object numbers in document order via the /Pages tree; falls
    back to file order of /Type /Page objects."""
    catalog_pages: Optional[int] = None
    for num, (body, _) in objects.items():
        if _TYPE_CATALOG_RE.search(body):
            pm = _PAGES_REF_RE.search(body)
            if pm:
                catalog_pages = int(pm.group(1))
            break

    ordered: List[int] = []

    def walk(node: int, depth: int = 0) -> None:
        if depth > 32 or node not in objects:
            return
        body, _ = objects[node]
        if _TYPE_PAGES_RE.search(body):
            km = _KIDS_RE.search(body)
            if km:
                for rm in _REF_RE.finditer(km.group(1)):
                    walk(int(rm.group(1)), depth + 1)
        elif _TYPE_PAGE_RE.search(body):
            ordered.append(node)

    if catalog_pages is not None:
        walk(catalog_pages)
    if not ordered:
        for num in sorted(objects):
            if _TYPE_PAGE_RE.search(objects[num][0]):
                ordered.append(num)
    return ordered


def _content_streams(
    page_body: bytes, objects: Dict[int, Tuple[bytes, Optional[bytes]]]
) -> List[bytes]:
    refs: List[int] = []
    m = _CONTENTS_RE.search(page_body)
    if m:
        refs.append(int(m.group(1)))
    else:
        am = _CONTENTS_ARR_RE.search(page_body)
        if am:
            refs.extend(int(r.group(1)) for r in _REF_RE.finditer(am.group(1)))
    streams = []
    for ref in refs:
        if ref not in objects:
            continue
        body, data = objects[ref]
        if data is None:
            continue
        if _FLATE_RE.search(body):
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        streams.append(data)
    return streams


_ESCAPES = {
    b"n"[0]: "\n",
    b"r"[0]: "\r",
    b"t"[0]: "\t",
    b"b"[0]: "\b",
    b"f"[0]: "\f",
    b"("[0]: "(",
    b")"[0]: ")",
    b"\\"[0]: "\\",
}


# Bytes needing per-char handling inside a literal string; everything
# between them is consumed in bulk (latin-1 decode of a byte run is
# byte-identical to per-char chr()).
_PLAIN_RUN_RE = re.compile(rb"[^\\()]+")


def _parse_literal_string(data: bytes, i: int) -> Tuple[str, int]:
    """Parse a ``(...)`` literal string starting at the '('; returns
    (text, index just past the closing paren)."""
    out: List[str] = []
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth > 0:
        c = data[i]
        if c not in (0x5C, 0x28, 0x29):
            run = _PLAIN_RUN_RE.match(data, i)
            out.append(run.group().decode("latin-1"))
            i = run.end()
            continue
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal \ddd (1-3 digits)
                digits = chr(e)
                i += 1
                while i < n and len(digits) < 3 and 0x30 <= data[i] <= 0x37:
                    digits += chr(data[i])
                    i += 1
                out.append(chr(int(digits, 8) & 0xFF))
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(chr(e))
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth > 0:
                out.append(")")
            i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out), i


def _parse_hex_string(data: bytes, i: int) -> Tuple[str, int]:
    end = data.find(b">", i + 1)
    if end == -1:
        return "", len(data)
    hexdigits = re.sub(rb"\s", b"", data[i + 1 : end])
    if len(hexdigits) % 2:
        hexdigits += b"0"
    try:
        raw = bytes.fromhex(hexdigits.decode("ascii"))
    except ValueError:
        raw = b""
    return raw.decode("latin-1"), end + 1


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _tokenize_content(data: bytes):
    """Yield ('str', text) | ('num', float) | ('op', name) | ('arr', list)."""
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c in b" \t\r\n\x00":
            i += 1
        elif c == 0x28:  # (
            s, i = _parse_literal_string(data, i)
            yield ("str", s)
        elif c == 0x3C:  # <
            if i + 1 < n and data[i + 1] == 0x3C:  # << dict — skip to >>
                depth = 1
                i += 2
                while i < n and depth:
                    if data.startswith(b"<<", i):
                        depth += 1
                        i += 2
                    elif data.startswith(b">>", i):
                        depth -= 1
                        i += 2
                    else:
                        i += 1
            else:
                s, i = _parse_hex_string(data, i)
                yield ("str", s)
        elif c == 0x5B:  # [
            arr: List = []
            i += 1
            while i < n and data[i] != 0x5D:
                if data[i] in b" \t\r\n":
                    i += 1
                elif data[i] == 0x28:
                    s, i = _parse_literal_string(data, i)
                    arr.append(("str", s))
                elif data[i] == 0x3C:
                    s, i = _parse_hex_string(data, i)
                    arr.append(("str", s))
                else:
                    m = _NUM_RE.match(data, i)
                    if m:
                        arr.append(("num", float(m.group(0))))
                        i = m.end()
                    else:
                        i += 1
            i += 1
            yield ("arr", arr)
        elif c == 0x2F:  # /Name
            m = re.compile(rb"/[^\s()<>\[\]{}/%]*").match(data, i)
            i = m.end() if m else i + 1
            yield ("name", data[m.start() : m.end()].decode("latin-1") if m else "/")
        elif c == 0x25:  # % comment
            nl = data.find(b"\n", i)
            i = n if nl == -1 else nl + 1
        else:
            m = _NUM_RE.match(data, i)
            if m:
                yield ("num", float(m.group(0)))
                i = m.end()
                continue
            m = _OP_RE.match(data, i)
            if m:
                yield ("op", m.group(0).decode("latin-1"))
                i = m.end()
            else:
                i += 1


def _extract_runs(stream: bytes) -> List[Tuple[float, float, str]]:
    """Text runs (x, y, text) from one content stream."""
    runs: List[Tuple[float, float, str]] = []
    stack: List = []
    # Text line matrix origin (tx, ty) — full matrix not needed for the
    # translate/scale-free transforms the corpus profile uses.
    lx = ly = 0.0
    cx = cy = 0.0
    leading = 0.0
    in_text = False

    for kind, value in _tokenize_content(stream):
        if kind in ("str", "num", "arr", "name"):
            stack.append((kind, value))
            continue
        op = value
        try:
            if op == "BT":
                in_text = True
                lx = ly = cx = cy = 0.0
            elif op == "ET":
                in_text = False
            elif op in ("Td", "TD"):
                ty = stack[-1][1] if stack else 0.0
                tx = stack[-2][1] if len(stack) > 1 else 0.0
                lx += tx
                ly += ty
                cx, cy = lx, ly
                if op == "TD":
                    leading = -ty
            elif op == "Tm":
                if len(stack) >= 2:
                    ly = stack[-1][1]
                    lx = stack[-2][1]
                cx, cy = lx, ly
            elif op == "T*":
                ly -= leading
                cx, cy = lx, ly
            elif op == "TL":
                leading = stack[-1][1] if stack else 0.0
            elif op == "Tj":
                if in_text and stack and stack[-1][0] == "str":
                    runs.append((cx, cy, stack[-1][1]))
            elif op == "'":
                ly -= leading
                cx, cy = lx, ly
                if in_text and stack and stack[-1][0] == "str":
                    runs.append((cx, cy, stack[-1][1]))
            elif op == '"':
                ly -= leading
                cx, cy = lx, ly
                if in_text and stack and stack[-1][0] == "str":
                    runs.append((cx, cy, stack[-1][1]))
            elif op == "TJ":
                if in_text and stack and stack[-1][0] == "arr":
                    text = "".join(v for k, v in stack[-1][1] if k == "str")
                    if text:
                        runs.append((cx, cy, text))
        finally:
            stack.clear()
    return runs


def _runs_to_text(runs: List[Tuple[float, float, str]]) -> str:
    """Cluster runs into lines by y (tolerance), sort lines top-down and
    runs left-to-right, join runs with '' and lines with '\\n'."""
    if not runs:
        return ""
    lines: List[Tuple[float, List[Tuple[float, str]]]] = []
    for x, y, text in runs:
        for ly, items in lines:
            if abs(ly - y) <= _LINE_Y_TOLERANCE:
                items.append((x, text))
                break
        else:
            lines.append((y, [(x, text)]))
    lines.sort(key=lambda item: -item[0])
    out_lines = []
    for _, items in lines:
        items.sort(key=lambda it: it[0])
        out_lines.append("".join(text for _, text in items))
    return "\n".join(out_lines)


def pdf_page_count(pdf: bytes) -> int:
    """Page count probe — the admission-control analog of the
    reference's check_pdf_info (main.py:571-588)."""
    try:
        return len(_page_order(_scan_objects(pdf)))
    except Exception:
        return 0


def pdf_extract_pages(pdf: bytes) -> List[str]:
    """Per-page extracted text, in document page order."""
    objects = _scan_objects(pdf)
    pages = []
    for page_num in _page_order(objects):
        body, _ = objects[page_num]
        runs: List[Tuple[float, float, str]] = []
        for stream in _content_streams(body, objects):
            runs.extend(_extract_runs(stream))
        pages.append(_runs_to_text(runs))
    return pages


def pdf_extract(pdf: bytes, url: Optional[str] = None) -> Extracted:
    """Extract a PDF document: pages joined with '\\n\\n' (assembly rule
    A1, reference core/task_manager.py:542), with per-page spans."""
    pages = pdf_extract_pages(pdf)
    spans = []
    offset = 0
    non_empty = [(i + 1, p) for i, p in enumerate(pages) if p]
    for idx, (page_no, page_text) in enumerate(non_empty):
        spans.append(
            {
                "page": page_no,
                "start": offset,
                "length": len(page_text),
                "kind": "page",
            }
        )
        offset += len(page_text) + (2 if idx < len(non_empty) - 1 else 0)
    text = "\n\n".join(p for _, p in non_empty)
    metrics = {
        "n_pages": len(pages),
        "n_empty_pages": sum(1 for p in pages if not p),
        "chars_out": len(text),
    }
    return Extracted(text=text, spans=spans, metrics=metrics)
