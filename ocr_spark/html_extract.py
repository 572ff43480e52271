"""Pure-Python HTML main-content extraction (no external parsing libs).

Replaces the reference's per-page vision-model call
(/root/reference/core/page_processor.py:883-989) with deterministic
in-process extraction: a hand-written HTML tokenizer feeds a flat block
builder; each block carries text length, link-text length, heading flag
and a boilerplate-ancestry flag; a text-density / link-density
classifier (Boilerpipe/trafilatura-style) keeps content blocks, which
are joined with '\\n\\n' (the reference's page-assembly separator,
core/task_manager.py:542).

Runs identically in the pytest oracle and inside Arrow-batched pandas
UDFs on executors — determinism and byte-identity are owned end-to-end.
"""

from __future__ import annotations

import html as _htmllib
import re
from dataclasses import dataclass, field
from typing import List, Optional

# Tags that start/end a text block.
_BLOCK_TAGS = frozenset(
    """p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd td th tr table thead tbody
    article section main aside nav header footer form blockquote pre figure
    figcaption details summary hr br title body html""".split()
)

_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# Elements whose entire subtree is never content.
_SKIP_SUBTREE_TAGS = frozenset(
    "script style noscript template textarea svg head iframe object".split()
)

# Structural containers that are boilerplate by role.
_BOILER_CONTAINER_TAGS = frozenset("nav header footer aside form".split())

_VOID_TAGS = frozenset(
    "br hr img meta link input area base col embed source track wbr param".split()
)

# class/id fragments that mark an element (and its subtree) boilerplate.
_BOILER_ATTR_RE = re.compile(
    r"(?:^|[\s_-])(nav|navbar|menu|footer|header|masthead|sidebar|side-bar|"
    r"comment|comments|share|social|banner|breadcrumb|breadcrumbs|cookie|"
    r"copyright|widget|promo|related|advert|advertisement|ads|ad|sponsor|"
    r"pagination|pager|byline|meta|tags|toolbar|dropdown)(?:$|[\s_-])",
    re.IGNORECASE,
)

_TAG_NAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9:-]*")
_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*("[^"]*"|'[^']*'|[^\s>]*))?"""
)

# Minimum word count for a non-heading block to count as content, and the
# maximum fraction of a block's characters allowed to sit inside links.
MIN_CONTENT_WORDS = 2
MAX_LINK_DENSITY = 1.0 / 3.0


@dataclass
class Block:
    text: str
    tag: str
    chars: int
    link_chars: int
    words: int
    heading: bool
    boiler: bool

    @property
    def link_density(self) -> float:
        return (self.link_chars / self.chars) if self.chars else 0.0


@dataclass
class Extracted:
    """Extraction result: assembled text + per-block spans + metrics."""

    text: str
    spans: List[dict] = field(default_factory=list)
    metrics: dict = field(default_factory=dict)


def _decode(payload: bytes) -> str:
    if isinstance(payload, str):
        return payload
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        return payload.decode("utf-8", errors="replace")


class _BlockBuilder:
    """Accumulates text runs and finalizes them into Blocks at
    block-tag boundaries."""

    def __init__(self) -> None:
        self.blocks: List[Block] = []
        self._parts: List[str] = []
        self._link_chars = 0
        self._chars = 0
        self._tag = "p"
        self._heading = False
        self._boiler = False

    def set_context(self, tag: str, heading: bool, boiler: bool) -> None:
        if not self._parts:
            self._tag = tag
            self._heading = heading
            self._boiler = boiler
        else:
            # A block spanning contexts inherits the "worst" flags.
            self._heading = self._heading or heading
            self._boiler = self._boiler or boiler

    def add_text(self, text: str, in_link: bool, boiler: bool) -> None:
        if not text:
            return
        self._parts.append(text)
        stripped_len = len(text.strip())
        self._chars += stripped_len
        if in_link:
            self._link_chars += stripped_len
        self._boiler = self._boiler or boiler

    def flush(self) -> None:
        # Empty flushes (most block-tag boundaries) still reset the
        # context flags — a heading/boiler context must not leak into
        # bare text that follows a closed empty element.
        if self._parts:
            raw = "".join(self._parts)
            words = raw.split()
            if words:
                text = " ".join(words)
                self.blocks.append(
                    Block(
                        text=text,
                        tag=self._tag,
                        chars=self._chars,
                        link_chars=self._link_chars,
                        words=len(words),
                        heading=self._heading,
                        boiler=self._boiler,
                    )
                )
            self._parts = []
            self._link_chars = 0
            self._chars = 0
        self._heading = False
        self._boiler = False


# Parsed-tag memo: raw tag slice -> (closing, tag, self_closing,
# is_boiler, is_skip). Tag markup repeats heavily (every <p>, </p>,
# </a>… is the same string), so parsing each distinct slice once
# roughly halves tokenizer time; entries are pure functions of the
# slice, so the cache never changes results. Bounded to keep unique
# attr-bearing tags (hrefs) from growing it without limit.
_TAG_CACHE: dict = {}
_TAG_CACHE_MAX = 100_000


def _parse_tag(raw_tag: str):
    closing = raw_tag.startswith("/")
    body = raw_tag[1:] if closing else raw_tag
    m = _TAG_NAME_RE.match(body.strip())
    if not m:
        parsed = None
    else:
        tag = m.group(0).lower()
        self_closing = body.rstrip().endswith("/") or tag in _VOID_TAGS
        attrs_text = body[m.end() :]
        is_boiler = tag in _BOILER_CONTAINER_TAGS
        if not is_boiler and ("class" in attrs_text or "id" in attrs_text):
            for attr_m in _ATTR_RE.finditer(attrs_text):
                name = attr_m.group(1).lower()
                if name in ("class", "id", "role"):
                    value = (attr_m.group(2) or "").strip("\"'")
                    if value and _BOILER_ATTR_RE.search(value):
                        is_boiler = True
                        break
        parsed = (closing, tag, self_closing, is_boiler, tag in _SKIP_SUBTREE_TAGS)
    if len(_TAG_CACHE) >= _TAG_CACHE_MAX:
        _TAG_CACHE.clear()
    _TAG_CACHE[raw_tag] = parsed
    return parsed


def tokenize_blocks(html_text: str) -> List[Block]:
    """Single forward scan over the markup producing flat text blocks."""
    builder = _BlockBuilder()
    n = len(html_text)
    lower_text = html_text.lower()  # computed once; raw-text skips search it
    i = 0
    link_depth = 0
    skip_depth = 0  # inside script/style/head/...
    boiler_depth = 0  # inside nav/footer/... or boiler-classed subtree
    heading_depth = 0
    # Stack of (tag, was_boiler, was_skip, was_heading) for close matching.
    stack: List[tuple] = []

    while i < n:
        lt = html_text.find("<", i)
        if lt == -1:
            if skip_depth == 0:
                builder.add_text(
                    _htmllib.unescape(html_text[i:]), link_depth > 0, boiler_depth > 0
                )
            break
        if lt > i and skip_depth == 0:
            builder.add_text(
                _htmllib.unescape(html_text[i:lt]), link_depth > 0, boiler_depth > 0
            )
        # Comment / declaration / processing instruction.
        if html_text.startswith("<!--", lt):
            end = html_text.find("-->", lt + 4)
            i = n if end == -1 else end + 3
            continue
        if lt + 1 < n and html_text[lt + 1] in "!?":
            end = html_text.find(">", lt + 1)
            i = n if end == -1 else end + 1
            continue

        gt = html_text.find(">", lt + 1)
        if gt == -1:
            break
        raw_tag = html_text[lt + 1 : gt]
        i = gt + 1

        parsed = _TAG_CACHE.get(raw_tag, False)
        if parsed is False:
            parsed = _parse_tag(raw_tag)
        if parsed is None:
            continue
        closing, tag, self_closing, is_boiler, is_skip = parsed

        if closing:
            if tag in _BLOCK_TAGS:
                builder.flush()
            if tag == "a" and link_depth > 0:
                link_depth -= 1
            # Unwind the stack to the nearest matching open tag.
            for idx in range(len(stack) - 1, -1, -1):
                if stack[idx][0] == tag:
                    for _ in range(len(stack) - idx):
                        popped, p_boiler, p_skip, p_heading = stack.pop()
                        if p_boiler:
                            boiler_depth -= 1
                        if p_skip:
                            skip_depth -= 1
                        if p_heading:
                            heading_depth -= 1
                    break
            continue

        # Opening tag.
        if tag in _BLOCK_TAGS:
            builder.flush()
            if not self_closing and tag not in ("br", "hr"):
                builder.set_context(
                    tag,
                    heading=(tag in _HEADING_TAGS or heading_depth > 0),
                    boiler=(is_boiler or boiler_depth > 0),
                )

        if tag == "a" and not self_closing:
            link_depth += 1

        if is_skip and tag in ("script", "style", "textarea", "title"):
            # Raw-text elements: skip straight to the closing tag.
            close = lower_text.find(f"</{tag}", i)
            i = n if close == -1 else html_text.find(">", close) + 1
            if i == 0:
                i = n
            continue

        if not self_closing:
            if is_boiler:
                boiler_depth += 1
            if is_skip:
                skip_depth += 1
            if tag in _HEADING_TAGS:
                heading_depth += 1
            stack.append((tag, is_boiler, is_skip, tag in _HEADING_TAGS))

    builder.flush()
    return builder.blocks


def classify(blocks: List[Block]) -> List[Block]:
    """Keep content blocks: not boilerplate-rooted, link density below
    1/3, and either a heading or at least MIN_CONTENT_WORDS words."""
    content = []
    for b in blocks:
        if b.boiler or b.tag == "title":
            continue
        if b.link_density > MAX_LINK_DENSITY:
            continue
        if not b.heading and b.words < MIN_CONTENT_WORDS:
            continue
        content.append(b)
    return content


def html_extract(payload: bytes, url: Optional[str] = None) -> Extracted:
    """Extract main content from an HTML payload.

    Returns text = content blocks joined with '\\n\\n' (reference
    assembly rule A1), spans locating each block in the output, and
    extraction metrics.
    """
    html_text = _decode(payload)
    blocks = tokenize_blocks(html_text)
    content = classify(blocks)

    spans = []
    offset = 0
    for idx, b in enumerate(content):
        spans.append(
            {
                "page": 1,
                "start": offset,
                "length": len(b.text),
                "kind": "heading" if b.heading else "text",
            }
        )
        offset += len(b.text) + (2 if idx < len(content) - 1 else 0)

    text = "\n\n".join(b.text for b in content)
    metrics = {
        "n_blocks": len(blocks),
        "n_content_blocks": len(content),
        "n_boiler_blocks": sum(1 for b in blocks if b.boiler),
        "chars_out": len(text),
    }
    return Extracted(text=text, spans=spans, metrics=metrics)
