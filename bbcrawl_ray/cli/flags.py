"""Flag value types with the reference's exact accept/reject behavior.

Parity with /root/reference/cmdline/flags.go (one function/class per Go
flag type); unit-test parity against cmdline/flags_test.go:12-198.
"""

from __future__ import annotations

import os
from urllib.parse import urlsplit

from .attrs import split_segments


class FlagError(ValueError):
    """Invalid flag value (the reference returns an error from Set)."""


def parse_boolean(s: str) -> bool:
    """Strict true/false, case-insensitive (flags.go:17-37)."""
    lower = s.lower()
    if lower == "true":
        return True
    if lower == "false":
        return False
    raise FlagError(f"Invalid input for Boolean flag: {s!r}")


def parse_int(s: str) -> int:
    """Go ``strconv.Atoi``: base-10, optional sign, no whitespace/underscores."""
    t = s[1:] if s[:1] in "+-" else s
    if not t or not t.isascii() or not t.isdigit():
        raise FlagError(f"invalid integer: {s!r}")
    return int(s)


def parse_start_page(s: str) -> int:
    """Integer >= 1 (flags.go:39-58)."""
    num = parse_int(s)
    if num < 1:
        raise FlagError(f"{num} is an invalid start page.")
    return num


def parse_end_page(s: str, start: int) -> int:
    """Integer >= 1 and >= start (flags.go:60-89)."""
    num = parse_int(s)
    if num < 1:
        raise FlagError(f"{num} is an invalid start page.")
    if num < start:
        raise FlagError(f"End ({num}) is greater than start ({start}).")
    return num


def parse_url_collection(s: str) -> list[str]:
    """Comma-separated URL list (flags.go:92-125). Go ``url.Parse`` accepts
    nearly anything, so items are kept as strings after a parse check."""
    items = s.split(",")
    for raw in items:
        try:
            urlsplit(raw)
        except ValueError as e:
            raise FlagError(str(e)) from None
    return items


def parse_single_url(s: str) -> str:
    """One URL (flags.go:127-145)."""
    try:
        urlsplit(s)
    except ValueError as e:
        raise FlagError(str(e)) from None
    return s


def parse_int_range(s: str) -> tuple[int, int]:
    """Exactly two comma-separated ints, second >= first (flags.go:147-171).
    Whitespace around each int is trimmed."""
    parts = s.split(",")
    if len(parts) != 2:
        raise FlagError("IntRange needs 2 values")
    nums = [parse_int(p.strip()) for p in parts]
    if nums[1] < nums[0]:
        raise FlagError("the second integer must be greater or equal than the first")
    return nums[0], nums[1]


def parse_int_tuple(s: str) -> list[int]:
    """Comma-separated ints, any count (flags.go:173-195)."""
    return [parse_int(p.strip()) for p in s.split(",")]


def parse_fs_directory(s: str) -> str:
    """Absolute path of an existing directory (flags.go:197-227)."""
    p = os.path.abspath(s)
    if not os.path.exists(p):
        raise FlagError(f"cannot open {p!r}")
    if not os.path.isdir(p):
        raise FlagError(f'File "{p}" is not a directory!')
    return p


def parse_attrs(s: str) -> dict[str, list[str]]:
    """'/'-separated ``key=v1,v2`` pairs with '\\' escapes (flags.go:229-283).

    Each segment must contain '='; duplicate keys are an error; values
    split on ','.
    """
    out: dict[str, list[str]] = {}
    for pair in split_segments(s, "/", "\\"):
        kv = pair.split("=", 1)
        if len(kv) != 2:
            raise FlagError(f"Substring {pair!r}: Less or more than one equal sign")
        key, raw_vals = kv
        if key in out:
            raise FlagError(f"Key {key!r} used twice")
        out[key] = raw_vals.split(",")
    return out


def parse_string_whitelist(s: str, whitelist: list[str], delim: str = ",") -> list[str]:
    """Delimited list where every element must be whitelisted (flags.go:285-322)."""
    elems = s.split(delim)
    for name in elems:
        if name not in whitelist:
            raise FlagError(
                f'String "{name}" not in whitelist. Valid values are {", ".join(whitelist)}'
            )
    return elems
