"""Command-line partition grammar and pipeline-spec binding.

Grammar (EBNF at /root/reference/docs/cli_spec.txt):
    global* -pager P pagerflags* -crawler C crawlerflags* URL

``partition`` replicates /root/reference/cmdline/partition.go:45-101
(golden-tested against cmdline/partition_test.go:12-53); the spec
builders replicate each pager/crawler's ``SetOptions`` flag binding
(pagers.go:54-77,137-190,253-270; crawlers.go:150-165,225-245;
crawler_src.go:88-111) on top of a Go-``flag``-style parser.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from . import flags as F


class PartitionError(ValueError):
    """Command line does not match the grammar."""


@dataclass
class Product:
    global_flags: list[str] = field(default_factory=list)
    pager: str = ""
    pager_flags: list[str] = field(default_factory=list)
    crawler: str = ""
    crawler_flags: list[str] = field(default_factory=list)
    url: str = ""

    def __str__(self) -> str:
        parts = list(self.global_flags)
        if self.pager:
            parts += ["-pager", self.pager, *self.pager_flags]
        if self.crawler:
            parts += ["-crawler", self.crawler, *self.crawler_flags]
        parts.append(self.url)
        return " ".join(parts)


def partition(cmdln: list[str]) -> Product:
    """Split argv into the grammar's sections (partition.go:45-101)."""
    if len(cmdln) < 2:
        raise PartitionError("Empty command line")
    product = Product()
    args = cmdln[1:]

    try:
        index = args.index("-pager")
    except ValueError:
        raise PartitionError("No pager found") from None
    if index + 1 >= len(args):
        raise PartitionError("No pager found")
    product.global_flags = args[:index]
    product.pager = args[index + 1]

    if index + 2 >= len(args):
        raise PartitionError(f'Unexpected EOS after "{product.pager}"')
    args = args[index + 2 :]

    try:
        index = args.index("-crawler")
    except ValueError:
        raise PartitionError("No crawler found") from None
    if index + 1 >= len(args):
        raise PartitionError("No crawler found")
    product.pager_flags = args[:index]
    product.crawler = args[index + 1]

    if index + 2 >= len(args):
        raise PartitionError(f'Unexpected EOS after "{product.crawler}"')
    args = args[index + 2 :]

    if len(args) == 1:
        product.url = args[0]
    else:
        product.crawler_flags = args[:-1]
        product.url = args[-1]
    return product


def parse_flagset(args: list[str], setters: dict[str, Callable[[str], Any]]) -> dict[str, Any]:
    """Minimal Go-``flag``-compatible parser: ``-name value`` / ``-name=value``
    / ``--name ...``; stops at the first non-flag argument; unknown flag
    is an error. Every flag in the reference takes a value."""
    out: dict[str, Any] = {}
    i = 0
    while i < len(args):
        arg = args[i]
        if not arg.startswith("-") or arg == "-" or arg == "--":
            break
        name = arg.lstrip("-")
        if "=" in name:
            name, value = name.split("=", 1)
        else:
            if i + 1 >= len(args):
                raise F.FlagError(f"flag needs an argument: -{name}")
            value = args[i + 1]
            i += 1
        if name not in setters:
            raise F.FlagError(f"flag provided but not defined: -{name}")
        out[name] = setters[name](value)
        i += 1
    return out


# --- pager option binding ----------------------------------------------------


@dataclass
class PagerSpec:
    """Validated pager options — maps 1:1 onto a seeds-table row."""

    pager: str
    blueprint_url: str
    start: int = 0
    end: int = 0
    name: str = "page"  # query pager
    cut_index: int = 0  # cutter
    cut_len: int = 0
    step: int = 1
    digits: int = 0
    adjust: int = 0
    startpage: str = ""

    def seed_row(self, seed_id: str) -> dict:
        return {
            "seed_id": seed_id,
            "pager": self.pager,
            "blueprint_url": self.blueprint_url,
            "start": self.start,
            "end": self.end,
            "name": self.name,
            "cut_index": self.cut_index,
            "cut_len": self.cut_len,
            "step": self.step,
            "digits": self.digits,
            "adjust": self.adjust,
            "startpage": self.startpage,
        }


def bind_pager(pager: str, pager_flags: list[str], url: str) -> PagerSpec:
    """Replicates each pager's SetOptions validation + SetUrl."""
    if pager in ("query", "vb4"):
        vals = parse_flagset(
            pager_flags,
            {"start": F.parse_int, "end": F.parse_int, "name": str},
        )
        start = vals.get("start", 0)
        if start < 1:
            raise F.FlagError("Start page not set")
        end = vals.get("end", 0)
        if end < start:
            raise F.FlagError("End page not set")
        name = vals.get("name", "page")
        if pager == "query" and not name:
            raise F.FlagError("Page identifier not set")
        if pager == "vb4" and "name" in vals:
            raise F.FlagError("flag provided but not defined: -name")
        return PagerSpec(pager=pager, blueprint_url=url, start=start, end=end, name=name)
    if pager == "cutter":
        vals = parse_flagset(
            pager_flags,
            {
                "adjust": F.parse_int,
                "start": F.parse_int,
                "end": F.parse_int,
                "step": F.parse_int,
                "digits": F.parse_int,
                "startpage": str,
                "cut": F.parse_int_tuple,
            },
        )
        start = vals.get("start", -1)
        end = vals.get("end", -1)
        cut = vals.get("cut", [])
        if start < 0:
            raise F.FlagError("start not set or set to an illegal value")
        if start > end:
            raise F.FlagError("end must not be smaller than start")
        step = vals.get("step", 1)
        if step < 1:
            raise F.FlagError("step set to an illegal value")
        if not cut or cut[0] == 0:
            raise F.FlagError("cut: first argument cannot be 0")
        if len(cut) != 2:
            raise F.FlagError("cut needs 2 integers")
        if cut[1] < 0:
            raise F.FlagError("cut: cannot cut out a negative amount of characters")
        digits = vals.get("digits", 0)
        if digits > 0 and digits < len(str(end)):
            raise F.FlagError("digits: not enough space to hold the desired page numbers")
        return PagerSpec(
            pager=pager,
            blueprint_url=url,
            start=start,
            end=end,
            cut_index=cut[0],
            cut_len=cut[1],
            step=step,
            digits=digits,
            adjust=vals.get("adjust", 0),
            startpage=vals.get("startpage", ""),
        )
    raise PartitionError(f"Pager not found: {pager!r}")


# --- crawler option binding --------------------------------------------------


@dataclass
class CrawlerSpec:
    """Validated crawler options (crawlers.go:378-391 + per-crawler flags)."""

    crawler: str
    exclude: list[str] = field(default_factory=list)
    allow_redirect: bool = True
    debug: bool = False
    # src crawler
    tags: list[str] = field(default_factory=list)
    attrs: dict[str, list[str]] = field(default_factory=dict)
    # vb-attachments crawler
    names_from_header: bool = False


_COMMON = {
    "exclude": F.parse_url_collection,
    "redirect": F.parse_boolean,
    "debug": F.parse_boolean,
}


def bind_crawler(crawler: str, crawler_flags: list[str]) -> CrawlerSpec:
    if crawler == "file":
        vals = parse_flagset(crawler_flags, dict(_COMMON))
    elif crawler == "src":
        vals = parse_flagset(
            crawler_flags,
            {
                **_COMMON,
                "attrs": F.parse_attrs,
                "tags": lambda s: F.parse_string_whitelist(s, ["audio", "img", "video"]),
            },
        )
        if not vals.get("tags"):
            raise F.FlagError('No html tag specified with "-tags"')
    elif crawler == "vb-attachments":
        vals = parse_flagset(
            crawler_flags, {**_COMMON, "names-from-header": F.parse_boolean}
        )
    else:
        raise PartitionError(f"Crawler not found: {crawler!r}")
    return CrawlerSpec(
        crawler=crawler,
        exclude=vals.get("exclude", []),
        allow_redirect=vals.get("redirect", True),
        debug=vals.get("debug", False),
        tags=vals.get("tags", []),
        attrs=vals.get("attrs", {}),
        names_from_header=vals.get("names-from-header", False),
    )


@dataclass
class PipelineSpec:
    """A full crawl job: pager + crawler + global options."""

    pager: PagerSpec
    crawler: CrawlerSpec
    output_dir: str = ""
    cookie_file: str = ""
    loglevel: str = "error"

    @classmethod
    def from_argv(cls, argv: list[str]) -> "PipelineSpec":
        product = partition(argv)
        gvals = parse_flagset(
            product.global_flags,
            {"o": F.parse_fs_directory, "cookie-file": str, "loglevel": str},
        )
        return cls(
            pager=bind_pager(product.pager, product.pager_flags, product.url),
            crawler=bind_crawler(product.crawler, product.crawler_flags),
            output_dir=gvals.get("o", ""),
            cookie_file=gvals.get("cookie-file", ""),
            loglevel=gvals.get("loglevel", "error"),
        )
