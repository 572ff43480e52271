"""Byte-identity unit tests for the deterministic text semantics.

Cases lifted from the reference's parse branches
(/root/reference/core/page_processor.py:1088-1155,
core/task_manager.py:41-65, main.py:649-656) — the FIXTURES.md §4
raw_responses corpus.
"""

import json

from ocr_spark import textops


class TestParseModelResponse:
    def test_json_plain(self):
        raw = json.dumps({"content": "# Title\n\nBody text."})
        assert textops.parse_model_response(raw) == "# Title\n\nBody text."

    def test_json_fenced(self):
        raw = '```\n{"content": "hello world"}\n```'
        assert textops.parse_model_response(raw) == "hello world"

    def test_json_fenced_prefixed(self):
        raw = '```json\n{"content": "fenced json value"}\n```'
        assert textops.parse_model_response(raw) == "fenced json value"

    def test_json_fenced_prefixed_uppercase(self):
        raw = '```JSON\n{"content": "upper"}\n```'
        assert textops.parse_model_response(raw) == "upper"

    def test_text_field_fallback(self):
        raw = json.dumps({"text": "from text field"})
        assert textops.parse_model_response(raw) == "from text field"

    def test_content_preferred_over_text(self):
        raw = json.dumps({"content": "A", "text": "B"})
        assert textops.parse_model_response(raw) == "A"

    def test_empty_content_falls_to_text(self):
        # dict.get('content') or dict.get('text') — falsy content skipped
        raw = json.dumps({"content": "", "text": "B"})
        assert textops.parse_model_response(raw) == "B"

    def test_json_string_scalar(self):
        raw = json.dumps("just a string")
        assert textops.parse_model_response(raw) == "just a string"

    def test_marker_this_is_the_content(self):
        raw = "Sure! This is the content: extracted body here"
        assert textops.parse_model_response(raw) == "extracted body here"

    def test_marker_with_end(self):
        raw = (
            "This is the content: body text this is the end of the content trailing"
        )
        assert textops.parse_model_response(raw) == "body text"

    def test_marker_case_variants(self):
        assert textops.parse_model_response("Output: abc") == "abc"
        assert textops.parse_model_response("Result: xyz") == "xyz"

    def test_skip_pattern_lines(self):
        raw = "I'm sorry but here goes\nactual line one\nAs an AI I note\nline two"
        assert textops.parse_model_response(raw) == "actual line one\nline two"

    def test_fence_markdown_strip_when_all_filtered(self):
        # all lines hit skip patterns -> fence-strip path
        raw = "```markdown\nHere is everything\n```"
        # strip('`') removes the fences, 'markdown' survives (not json);
        # 'Here is' hits a skip pattern, leaving only 'markdown'
        out = textops.parse_model_response(raw)
        assert out == "markdown"

    def test_empty(self):
        assert textops.parse_model_response("") == ""
        assert textops.parse_model_response(None) == ""

    def test_whitespace_only(self):
        assert textops.parse_model_response("   \n  ") == ""

    def test_non_dict_json_falls_through(self):
        # JSON list parses but is neither dict nor str -> fallback path
        raw = '["a", "b"]'
        assert textops.parse_model_response(raw) == '["a", "b"]'


class TestJoinContentBlocks:
    def test_string_passthrough(self):
        assert textops.join_content_blocks("plain") == "plain"

    def test_multiblock_join(self):
        blocks = [
            {"type": "text", "text": "part1 "},
            {"type": "output_text", "text": "part2"},
            {"type": "image", "text": "ignored"},
            "not a dict",
            {"type": "text", "text": 5},
        ]
        assert textops.join_content_blocks(blocks) == "part1 part2"

    def test_empty_list_is_none(self):
        assert textops.join_content_blocks([]) is None
        assert textops.join_content_blocks([{"type": "image"}]) is None

    def test_other_types_none(self):
        assert textops.join_content_blocks(42) is None
        assert textops.join_content_blocks(None) is None


class TestLegacyDelimiterParse:
    def test_cut_between_markers(self):
        raw = "This is the content: ```markdown\n# A\n``` this is the end of the content"
        assert textops.legacy_delimiter_parse(raw) == "# A"

    def test_no_end_marker(self):
        raw = "This is the content: body"
        assert textops.legacy_delimiter_parse(raw) == "body"

    def test_missing_marker(self):
        assert textops.legacy_delimiter_parse("nothing here") is None

    def test_empty_cut(self):
        assert textops.legacy_delimiter_parse("This is the content: ```") is None


class TestAssemblePages:
    def _page(self, n, status="completed", content="", error=""):
        return {
            "page_number": n,
            "status": status,
            "content": content,
            "error_message": error,
        }

    def test_ordering_and_join(self):
        pages = [
            self._page(2, content="second"),
            self._page(1, content="first"),
            self._page(3, content="third"),
        ]
        assert textops.assemble_pages(pages) == "first\n\nsecond\n\nthird"

    def test_moderation_filter(self):
        pages = [
            self._page(1, content="ok"),
            self._page(
                2,
                status="cancelled",
                content="blocked content",
                error=textops.MODERATION_BLOCKED_MESSAGE,
            ),
            self._page(3, content="also ok"),
        ]
        assert textops.assemble_pages(pages) == "ok\n\nalso ok"

    def test_cancelled_other_reason_kept_if_content(self):
        # only the moderation sentinel is filtered; other cancelled rows
        # pass the status check and are kept when content is non-empty
        pages = [
            self._page(1, status="cancelled", content="kept", error="user cancel"),
            self._page(2, content="tail"),
        ]
        assert textops.assemble_pages(pages) == "kept\n\ntail"

    def test_empty_pages_skipped(self):
        pages = [
            self._page(1, content="a"),
            self._page(2, content=""),
            self._page(3, content="c"),
        ]
        assert textops.assemble_pages(pages) == "a\n\nc"

    def test_all_empty(self):
        assert textops.assemble_pages([self._page(1), self._page(2)]) == ""

    def test_no_pages(self):
        assert textops.assemble_pages([]) == ""


class TestPageStats:
    def test_empty(self):
        stats = textops.page_stats([])
        assert stats["total_pages"] == 0
        assert stats["success_rate"] == 0

    def test_mixed(self):
        pages = [
            {"status": "completed", "content_length": 10, "processing_time": 2.0},
            {"status": "completed", "content_length": 30, "processing_time": 4.0},
            {"status": "failed"},
            {"status": "processing"},
            {"status": "pending"},
            {},  # defaults to pending
        ]
        stats = textops.page_stats(pages)
        assert stats["total_pages"] == 6
        assert stats["completed_pages"] == 2
        assert stats["failed_pages"] == 1
        assert stats["processing_pages"] == 1
        assert stats["pending_pages"] == 2
        assert stats["total_content_length"] == 40
        assert stats["average_processing_time"] == 3.0
        assert abs(stats["success_rate"] - 100 * 2 / 6) < 1e-9


class TestSniffKind:
    def test_pdf(self):
        assert textops.sniff_kind(b"%PDF-1.4\nrest") == "pdf"

    def test_pdf_leading_ws(self):
        assert textops.sniff_kind(b"\n  %PDF-1.7") == "pdf"

    def test_html_doctype(self):
        assert textops.sniff_kind(b"<!DOCTYPE html><html></html>") == "html"

    def test_html_fragment(self):
        assert textops.sniff_kind(b"<div>x</div>") == "html"

    def test_unknown(self):
        assert textops.sniff_kind(b"\x00\x01binary") == "unknown"
        assert textops.sniff_kind(b"") == "unknown"
        assert textops.sniff_kind(None) == "unknown"


class TestHashes:
    def test_sha256_text(self):
        import hashlib

        assert (
            textops.sha256_text("abc")
            == hashlib.sha256(b"abc").hexdigest()
        )

    def test_content_hash_order_insensitive(self):
        a = textops.content_hash_of(["h1", "h2", "h3"])
        b = textops.content_hash_of(["h3", "h1", "h2"])
        assert a == b

    def test_normalize_ws(self):
        assert textops.normalize_ws("  a \t b\n\nc  ") == "a b c"
