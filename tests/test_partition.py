"""CLI grammar parity, ported from cmdline/partition_test.go:12-53."""

import pytest

from bbcrawl_ray.cli import flags as F
from bbcrawl_ray.cli.partition import (
    PartitionError,
    PipelineSpec,
    bind_crawler,
    bind_pager,
    partition,
)

ERROR_LINES = [
    "",
    "bbcrawl",
    "bbcrawl -pager testpager http://www.example.net",
    "bbcrawl -crawler testcrawler -pager testpager http://www.example.net",
    "bbcrawl -pager testpager -crawler testcrawler",
]


@pytest.mark.parametrize("line", ERROR_LINES)
def test_partition_errors(line):
    with pytest.raises(PartitionError):
        partition(line.split(" "))


POSITIVE_LINES = [
    "bbcrawl -arg1 yes -arg2 no -pager testpager -arg3 hello -arg4 there -crawler testcrawler -depth deep -height high http://example.net",
    "bbcrawl -pager testpager 1 2 3 -crawler testcrawler 4 5 6 http://example.net",
    "bbcrawl -pager testpager -crawler testcrawler 4 5 6 http://example.net",
    "bbcrawl -pager testpager 1 2 3 -crawler testcrawler http://example.net",
    "bbcrawl -pager testpager -crawler testcrawler http://example.net",
    "bbcrawl -pager testpager -crawler testcrawler http://example.net http://example.net/2",
]


@pytest.mark.parametrize("line", POSITIVE_LINES)
def test_partition_roundtrip(line):
    product = partition(line.split(" "))
    assert f"bbcrawl {product}" == line


def test_bind_pager_query():
    spec = bind_pager("query", ["-start", "1", "-end", "5", "-name", "p"], "http://x.example/t")
    assert (spec.start, spec.end, spec.name) == (1, 5, "p")
    with pytest.raises(F.FlagError):
        bind_pager("query", ["-end", "5"], "http://x.example/t")
    with pytest.raises(F.FlagError):
        bind_pager("query", ["-start", "3", "-end", "2"], "http://x.example/t")


def test_bind_pager_cutter():
    spec = bind_pager(
        "cutter",
        ["-start", "1", "-end", "100", "-cut", "24,1", "-digits", "5"],
        "http://www.example.net/1/test",
    )
    assert (spec.cut_index, spec.cut_len, spec.digits) == (24, 1, 5)
    with pytest.raises(F.FlagError):
        bind_pager("cutter", ["-start", "1", "-end", "10"], "http://x/1")  # no cut


def test_bind_crawler_src():
    spec = bind_crawler("src", ["-tags", "img,video", "-attrs", "class=big", "-redirect", "false"])
    assert spec.tags == ["img", "video"]
    assert spec.attrs == {"class": ["big"]}
    assert spec.allow_redirect is False
    with pytest.raises(F.FlagError):
        bind_crawler("src", [])  # -tags required


def test_pipeline_spec_from_argv():
    argv = (
        "bbcrawl -pager query -start 1 -end 3 -crawler src -tags img "
        "http://forum.example/t?x=1"
    ).split(" ")
    spec = PipelineSpec.from_argv(argv)
    assert spec.pager.pager == "query"
    assert spec.crawler.crawler == "src"
    assert spec.pager.blueprint_url == "http://forum.example/t?x=1"
