"""Pager expansion: one blueprint URL → the deterministic page-URL sequence.

The reference models pagers as stateful pull iterators
(`/root/reference/libcrawl/api.go:33-38`); here each pager is a pure
expansion function — the whole page sequence for a seed is computed in
one vectorized shot inside ``map_batches`` (stateless tasks), which is
the Ray-Data-native shape: seeds are rows, expansion is a flat map.

Parity sources:
- QueryPager      — /root/reference/libcrawl/pagers.go:21-101
- URLCuttingPager — /root/reference/libcrawl/pagers.go:104-209
  (golden-tested against pagers_test.go:49-61)
- VB4Pager        — /root/reference/libcrawl/pagers.go:211-281

Each expansion yields ``(page_num, url)`` pairs where ``page_num``
replicates the reference's ``PageNum()`` at dispatch time (the value
the crawler observes while handling that URL) — all output naming
derives from it, so it is the engine's ordering/naming key.
"""

from __future__ import annotations

from typing import Iterator
from urllib.parse import parse_qsl, quote_plus, urlsplit

import pyarrow as pa

from ..functions.urlfns import UrlError, canonicalize_url, hash64_batch, host_of, url_for_pager

PAGER_QUERY = "query"
PAGER_URLCUT = "cutter"
PAGER_VB4 = "vb4"


class PagerError(ValueError):
    """Raised on invalid pager options/URL (reference SetOptions/SetUrl errors)."""


def _validate_blueprint(addr: str) -> str:
    try:
        return url_for_pager(addr)
    except UrlError as e:
        raise PagerError(str(e)) from None


def _go_query_encode(pairs: dict[str, list[str]]) -> str:
    """Go ``url.Values.Encode()``: keys sorted, values in insertion order,
    QueryEscape on both (space → '+')."""
    out = []
    for k in sorted(pairs):
        ek = quote_plus(k)
        for v in pairs[k]:
            out.append(f"{ek}={quote_plus(v)}")
    return "&".join(out)


def expand_query(
    blueprint_url: str, start: int, end: int, name: str = "page"
) -> Iterator[tuple[int, str]]:
    """QueryPager: set query var ``name`` to start..end (inclusive), re-encode.

    PageNum = the counter value just emitted (pagers.go:50-52).
    """
    if start < 1:
        raise PagerError("Start page not set")
    if end < start:
        raise PagerError("End page not set")
    if not name:
        raise PagerError("Page identifier not set")
    parts = blueprint_url.split("?", 1)
    base = parts[0]
    q_str = parts[1] if len(parts) == 2 else ""
    _validate_blueprint(base)
    pairs: dict[str, list[str]] = {}
    for k, v in parse_qsl(q_str, keep_blank_values=True):
        pairs.setdefault(k, []).append(v)
    for page in range(start, end + 1):
        pairs[name] = [str(page)]
        yield page, f"{base}?{_go_query_encode(pairs)}"


def expand_cutter(
    blueprint_url: str,
    start: int,
    end: int,
    cut_index: int,
    cut_len: int,
    step: int = 1,
    digits: int = 0,
    adjust: int = 0,
    startpage: str = "",
) -> Iterator[tuple[int, str]]:
    """URLCuttingPager: splice ``page*step`` (zero-padded to ``digits``)
    into the blueprint at 1-indexed ``cut_index`` (negative = from end),
    replacing ``cut_len`` characters.

    PageNum = counter + adjust (pagers.go:133-135); the optional
    ``startpage`` URL is emitted first without consuming a counter value,
    so it observes PageNum = start - 1 + adjust (pagers.go:116-120).
    """
    if start < 0:
        raise PagerError("start not set or set to an illegal value")
    if start > end:
        raise PagerError("end must not be smaller than start")
    if step < 1:
        raise PagerError("step set to an illegal value")
    if cut_index == 0:
        raise PagerError("cut: first argument cannot be 0")
    if cut_len < 0:
        raise PagerError("cut: cannot cut out a negative amount of characters")
    if digits > 0 and digits < len(str(end)):
        raise PagerError("digits: not enough space to hold the desired page numbers")

    addr = blueprint_url
    _validate_blueprint(addr)
    ci = cut_index
    if ci < 0:
        ci = len(addr) + ci + 1
    if len(addr) <= ci - 1 or ci < 1:
        raise PagerError("cutoff index out of range")
    left = addr[: ci - 1]
    right = addr[ci - 1 + cut_len :] if len(addr) > ci - 1 + cut_len else ""

    if startpage:
        yield start - 1 + adjust, startpage
    for page in range(start, end + 1):
        num = page * step
        mid = f"{num:0{digits}d}" if digits > 0 else str(num)
        yield page + adjust, f"{left}{mid}{right}"


def expand_vb4(blueprint_url: str, start: int, end: int) -> Iterator[tuple[int, str]]:
    """VB4Pager: page 1 → thread URL verbatim; page n>1 → thread[/]pageN."""
    if start < 1:
        raise PagerError("Start page not set")
    if end < start:
        raise PagerError("End page not set")
    thread = _validate_blueprint(blueprint_url)
    sep = "" if thread.endswith("/") else "/"
    for page in range(start, end + 1):
        if page == 1:
            yield page, thread
        else:
            yield page, f"{thread}{sep}page{page}"


_EXPANDERS = {
    PAGER_QUERY: lambda r: expand_query(
        r["blueprint_url"], r["start"], r["end"], r.get("name") or "page"
    ),
    PAGER_URLCUT: lambda r: expand_cutter(
        r["blueprint_url"],
        r["start"],
        r["end"],
        r["cut_index"],
        r["cut_len"],
        r.get("step") or 1,
        r.get("digits") or 0,
        r.get("adjust") or 0,
        r.get("startpage") or "",
    ),
    PAGER_VB4: lambda r: expand_vb4(r["blueprint_url"], r["start"], r["end"]),
}


def register_pager(name: str, expander) -> None:
    """User-extension surface (reference registry, api.go:21-25):
    ``expander(seed_row) -> iterable[(page_num, url)]``. Registered
    pagers are picked up by ``expand_seed`` / the crawl pipeline via the
    seeds-table ``pager`` column."""
    _EXPANDERS[name] = expander


def expand_seed(seed_row: dict) -> list[tuple[int, str]]:
    """Expand one seeds-table row (FIXTURES.md §F1) into (page_num, url) pairs."""
    pager = seed_row["pager"]
    try:
        expander = _EXPANDERS[pager]
    except KeyError:
        raise PagerError(f"Pager not found: {pager!r}") from None
    return list(expander(seed_row))


def expand_seeds_batch(batch: pa.Table) -> pa.Table:
    """map_batches fn: seeds table → frontier table (schemas.FRONTIER).

    Stateless expansion — each seed row fans out to its full page
    sequence; Ray Data splits oversized output blocks dynamically, so a
    seed with millions of pages streams rather than materializing.
    """
    from .. import schemas

    urls: list[str] = []
    page_nums: list[int] = []
    seed_ids: list[str] = []
    for row in batch.to_pylist():
        for page_num, url in expand_seed(row):
            urls.append(url)
            page_nums.append(page_num)
            seed_ids.append(row["seed_id"])
    canon = [canonicalize_url(u) for u in urls]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "canon_url": pa.array(canon, pa.string()),
            "host": pa.array([host_of(u) for u in urls], pa.string()),
            "page_num": pa.array(page_nums, pa.int64()),
            # lower page number = higher urgency; priority is a max-heap key
            "priority": pa.array([-p for p in page_nums], pa.int64()),
            "depth": pa.array([0] * len(urls), pa.int32()),
            "seed_id": pa.array(seed_ids, pa.string()),
            "url_hash": pa.array(
                hash64_batch(canon) if urls else [], pa.uint64()
            ),
            "discovered_from": pa.array([""] * len(urls), pa.string()),
            "epoch": pa.array([0] * len(urls), pa.int32()),
        },
        schema=schemas.FRONTIER,
    )
