"""Cookie domain scoping with a minimal public-suffix guard.

The reference builds its cookie jar with ``publicsuffix.List``
(/root/reference/libcrawl/crawlers.go:96-111): a cookie set for
``forum.example.com`` applies to ``www.forum.example.com``, but a
cookie can never scope to a public suffix (``com``, ``co.uk``).

No network in this environment, so instead of the full Mozilla PSL
this ships a SMALL builtin suffix set covering the common TLD families;
the matching rule (walk parent domains, stop at a public suffix) is
the same. Swap ``PUBLIC_SUFFIXES`` for the full list in production.
"""

from __future__ import annotations

_GENERIC = {
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz", "io",
    "co", "me", "app", "dev", "xyz", "site", "online", "example", "test",
    "invalid", "localhost", "us", "uk", "de", "fr", "jp", "cn", "ru", "br",
    "in", "au", "ca", "nl", "it", "es", "se", "no", "pl", "ch", "at", "be",
    "eu", "kr", "tw", "mx", "ar", "cl", "nz", "za", "tv", "cc", "ws",
}
_MULTI = {
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "co.nz", "net.nz", "org.nz", "co.za", "org.za", "co.kr", "or.kr",
    "com.mx", "com.ar", "com.tw",
}
PUBLIC_SUFFIXES = _GENERIC | _MULTI


def is_public_suffix(domain: str) -> bool:
    return domain.lower() in PUBLIC_SUFFIXES


def cookie_domains(host: str) -> list[str]:
    """Candidate cookie domains for ``host``, most specific first,
    stopping BEFORE any public suffix: ``www.forum.example.com`` →
    [www.forum.example.com, forum.example.com, example.com].

    The EXACT host is always a candidate — even when it is itself a
    public-suffix label (``localhost``, dev/test single-label hosts):
    the suffix rule exists to stop cookies scoping to PARENT domains,
    not to strip a host's own cookies."""
    host = (host or "").lower().strip(".")
    if not host:
        return []
    labels = host.split(".")
    out = [host]
    for i in range(1, len(labels)):
        cand = ".".join(labels[i:])
        if is_public_suffix(cand):
            break
        out.append(cand)
    return out
