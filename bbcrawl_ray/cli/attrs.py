"""Tokenizer + parser for the ``-attrs`` flag grammar.

Parity with /root/reference/cmdline/attrs/attrs.go:118-192 (tokenizer)
and :35-116 (parser); grammar spec at /root/reference/docs/attr_spec.txt.
Golden-tested against cmdline/attrs/attrs_test.go:10-59.

Grammar: segments separated by ``split`` (default '/'), ``escape``
(default '\\') escapes any single following character. The parser keeps
the reference's empty-segment semantics exactly: a leading separator, a
trailing separator, and each separator directly following another all
contribute an empty segment.
"""

from __future__ import annotations

TOKEN_TEXT = "text"
TOKEN_SPLIT = "split"
TOKEN_ESCAPE = "escape"


class AttrsError(ValueError):
    """Tokenizer/parser error (reference returns error only on dangling escape)."""


def tokenize(s: str, split: str = "/", escape: str = "\\") -> list[tuple[str, str]]:
    """Split input into (token_type, value) pairs."""
    toks: list[tuple[str, str]] = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == split:
            toks.append((TOKEN_SPLIT, c))
            i += 1
        elif c == escape:
            if i + 1 >= n:
                raise AttrsError(f"Index {i + 1}: Unexpected EOF after escape character")
            toks.append((TOKEN_ESCAPE, s[i + 1]))
            i += 2
        else:
            j = i
            while j < n and s[j] != split and s[j] != escape:
                j += 1
            toks.append((TOKEN_TEXT, s[i:j]))
            i = j
    return toks


def parse_tokens(toks: list[tuple[str, str]]) -> list[str]:
    """Token stream → list of segments (reference Parser.Parse semantics)."""
    out: list[str] = []
    i = 0
    n = len(toks)
    while i < n:
        kind = toks[i][0]
        if kind in (TOKEN_TEXT, TOKEN_ESCAPE):
            buf: list[str] = []
            while i < n and toks[i][0] in (TOKEN_TEXT, TOKEN_ESCAPE):
                buf.append(toks[i][1])
                i += 1
            out.append("".join(buf))
        else:  # split
            if i == 0 or toks[i - 1][0] == TOKEN_SPLIT:
                out.append("")
            if i + 1 == n:
                out.append("")
            i += 1
    return out


def split_segments(s: str, split: str = "/", escape: str = "\\") -> list[str]:
    """Tokenize + parse in one call."""
    return parse_tokens(tokenize(s, split, escape))
