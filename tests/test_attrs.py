"""Golden tokenizer/parser cases ported from cmdline/attrs/attrs_test.go:10-59."""

import pytest

from bbcrawl_ray.cli.attrs import (
    TOKEN_ESCAPE,
    TOKEN_SPLIT,
    TOKEN_TEXT,
    AttrsError,
    parse_tokens,
    split_segments,
    tokenize,
)

TOKENIZER_CASES = {
    "": [],
    "test/split/end/": [TOKEN_TEXT, TOKEN_SPLIT, TOKEN_TEXT, TOKEN_SPLIT, TOKEN_TEXT, TOKEN_SPLIT],
    "/test/split/end": [TOKEN_SPLIT, TOKEN_TEXT, TOKEN_SPLIT, TOKEN_TEXT, TOKEN_SPLIT, TOKEN_TEXT],
    "\\\\test\\/123/456": [TOKEN_ESCAPE, TOKEN_TEXT, TOKEN_ESCAPE, TOKEN_TEXT, TOKEN_SPLIT, TOKEN_TEXT],
}


@pytest.mark.parametrize("inp,expected", TOKENIZER_CASES.items())
def test_tokenizer_golden(inp, expected):
    assert [t for t, _ in tokenize(inp)] == expected


PARSER_CASES = {
    "test/split/end/": ["test", "split", "end", ""],
    "/test/split/end": ["", "test", "split", "end"],
    "/test/split/end/": ["", "test", "split", "end", ""],
    "///s///": ["", "", "", "s", "", "", ""],
    "///////": ["", "", "", "", "", "", "", ""],
    "\\\\/test\\/test/2": ["\\", "test/test", "2"],
    "\\/\\/\\/": ["///"],
}


@pytest.mark.parametrize("inp,expected", PARSER_CASES.items())
def test_parser_golden(inp, expected):
    assert parse_tokens(tokenize(inp)) == expected


def test_dangling_escape_is_error():
    with pytest.raises(AttrsError):
        tokenize("abc\\")


def test_split_segments_roundtrip():
    assert split_segments("a=1/b=2,3") == ["a=1", "b=2,3"]
