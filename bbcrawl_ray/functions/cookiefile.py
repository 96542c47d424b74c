"""Netscape/curl cookie-file loading (the reference's ``-cookie-file``).

The reference loads cookies with the external ``jwdev42/cookiefile``
package and seeds the client jar once, scoped to the first page's base
URL (crawlers.go:96-111, api.go:68-74). Here the parsed cookies become
broadcast Fetcher config keyed by domain.

Format (curl "Netscape" jar): 7 TAB-separated fields per line —
domain, include-subdomains flag, path, secure flag, expiry, name,
value. Lines starting with '#' (except ``#HttpOnly_`` prefixes) and
blank lines are ignored.
"""

from __future__ import annotations


class CookieFileError(ValueError):
    pass


def parse_cookie_lines(lines: list[str]) -> dict[str, dict[str, str]]:
    """→ {domain: {name: value}} (domain lowercased, leading '.' kept off)."""
    out: dict[str, dict[str, str]] = {}
    for i, raw in enumerate(lines, start=1):
        line = raw.rstrip("\n")
        if line.startswith("#HttpOnly_"):
            line = line[len("#HttpOnly_") :]
        elif not line.strip() or line.startswith("#"):
            continue
        fields = line.split("\t")
        if len(fields) != 7:
            raise CookieFileError(f"line {i}: expected 7 tab-separated fields, got {len(fields)}")
        domain, _flag, _path, _secure, _expiry, name, value = fields
        host = domain.lower().lstrip(".")
        out.setdefault(host, {})[name] = value
    return out


def load_cookie_file(path: str) -> dict[str, dict[str, str]]:
    with open(path) as f:
        return parse_cookie_lines(f.readlines())
