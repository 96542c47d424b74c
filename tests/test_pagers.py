"""Golden pager-sequence parity tests.

The URLCuttingPager cases are ported 1:1 from the reference's
libcrawl/pagers_test.go:49-61 (test harness :12-47); query/vb4 cases
derive from the semantics at libcrawl/pagers.go:36-52,223-252.
"""

import pytest

from bbcrawl_ray.sources.pagers import (
    PagerError,
    expand_cutter,
    expand_query,
    expand_seed,
    expand_vb4,
)


def run_cutter(addr: str, cmdline: str):
    """Drive expand_cutter through CLI-style options like the Go test does."""
    opts = {}
    toks = cmdline.split(" ")
    i = 0
    while i < len(toks):
        key = toks[i].lstrip("-")
        val = toks[i + 1]
        opts[key] = val
        i += 2
    kwargs = dict(
        start=int(opts["start"]),
        end=int(opts["end"]),
        cut_index=int(opts["cut"].split(",")[0]),
        cut_len=int(opts["cut"].split(",")[1]),
    )
    if "digits" in opts:
        kwargs["digits"] = int(opts["digits"])
    if "step" in opts:
        kwargs["step"] = int(opts["step"])
    if "adjust" in opts:
        kwargs["adjust"] = int(opts["adjust"])
    if "startpage" in opts:
        kwargs["startpage"] = opts["startpage"]
    return list(expand_cutter(addr, **kwargs))


GOLDEN_CUTTER = [
    # (addr, addrfmt, cmdline) — pagers_test.go:50-60
    ("http://www.example.net/1/test", "http://www.example.net/{}/test", "-start 1 -end 100 -cut 24,1", ""),
    ("http://www.example.net/1/test", "http://www.example.net/{}/test", "-start 1 -end 100 -cut -6,1", ""),
    ("http://www.example.net/666/test", "http://www.example.net/{}/test", "-start 1 -end 100 -cut 24,3", ""),
    ("http://www.example.net/666/test", "http://www.example.net/{}/test", "-start 1 -end 100 -cut -8,3", ""),
    ("http://www.example.net/1/test", "http://www.example.net/{:05d}/test", "-start 1 -end 100 -cut 24,1 -digits 5", ""),
    ("http://www.example.net/1", "http://www.example.net/{}", "-start 1 -end 100 -cut 24,1", ""),
    ("http://www.example.net/1", "http://www.example.net/{}", "-start 1 -end 100 -cut -1,1", ""),
    ("http://www.example.net/page/", "http://www.example.net/page{}/", "-start 1 -end 100 -cut 28,0", ""),
    ("http://www.example.net/1", "http://www.example.net/{:05d}", "-start 1 -end 100 -cut 24,1 -digits 5", ""),
    ("http://www.example.net/1/", "http://www.example.net/{}/", "-start 1 -end 100 -cut 24,1", ""),
    (
        "http://www.example.net/1/",
        "http://www.example.net/{}/",
        "-startpage http://www.example.net -start 1 -end 100 -cut 24,1",
        "http://www.example.net",
    ),
]


@pytest.mark.parametrize("addr,addrfmt,cmdline,startpage", GOLDEN_CUTTER)
def test_cutter_golden(addr, addrfmt, cmdline, startpage):
    out = run_cutter(addr, cmdline)
    expect_urls = [addrfmt.format(i) for i in range(1, 101)]
    if startpage:
        assert out[0] == (0, startpage)
        out = out[1:]
    assert [u for _, u in out] == expect_urls
    # PageNum() parity: counter + adjust, observed after Next()
    assert [p for p, _ in out] == list(range(1, 101))


def test_cutter_step_and_adjust():
    out = list(
        expand_cutter("http://h.example/1/x", 2, 4, cut_index=18, cut_len=1, step=3, adjust=10)
    )
    assert out == [
        (12, "http://h.example/6/x"),
        (13, "http://h.example/9/x"),
        (14, "http://h.example/12/x"),
    ]


def test_cutter_validation_errors():
    with pytest.raises(PagerError):
        list(expand_cutter("http://x/1", -1, 5, 1, 1))  # start not set
    with pytest.raises(PagerError):
        list(expand_cutter("http://x/1", 5, 1, 1, 1))  # end < start
    with pytest.raises(PagerError):
        list(expand_cutter("http://x/1", 1, 5, 0, 1))  # cut0 == 0
    with pytest.raises(PagerError):
        list(expand_cutter("http://x/1", 1, 5, 1, -1))  # negative cut len
    with pytest.raises(PagerError):
        list(expand_cutter("http://x/1", 1, 5, 1, 1, step=0))  # bad step
    with pytest.raises(PagerError):
        list(expand_cutter("http://x/1", 1, 500, 9, 1, digits=2))  # digits too small
    with pytest.raises(PagerError):
        list(expand_cutter("http://x/1", 1, 5, 99, 1))  # cut index out of range
    with pytest.raises(PagerError):
        list(expand_cutter("ftp://x/1", 1, 5, 1, 1))  # scheme validation


def test_query_pager_sets_and_sorts_query():
    # url.Values.Encode() sorts keys — pagers.go:42-45
    out = list(expand_query("http://ex.net/t?z=9&a=1", 2, 4))
    assert out == [
        (2, "http://ex.net/t?a=1&page=2&z=9"),
        (3, "http://ex.net/t?a=1&page=3&z=9"),
        (4, "http://ex.net/t?a=1&page=4&z=9"),
    ]


def test_query_pager_custom_name_and_override():
    out = list(expand_query("http://ex.net/t?page=77", 1, 2))
    assert [u for _, u in out] == ["http://ex.net/t?page=1", "http://ex.net/t?page=2"]
    out2 = list(expand_query("http://ex.net/t", 1, 1, name="p"))
    assert out2 == [(1, "http://ex.net/t?p=1")]


def test_query_pager_errors():
    with pytest.raises(PagerError):
        list(expand_query("http://x/t", 0, 5))
    with pytest.raises(PagerError):
        list(expand_query("http://x/t", 3, 2))
    with pytest.raises(PagerError):
        list(expand_query("http://x/t", 1, 2, name=""))


def test_vb4_pager():
    # page 1 verbatim; n>1 → thread/pageN — pagers.go:223-248
    out = list(expand_vb4("http://f.example/thread", 1, 3))
    assert out == [
        (1, "http://f.example/thread"),
        (2, "http://f.example/thread/page2"),
        (3, "http://f.example/thread/page3"),
    ]
    # trailing slash aware — pagers.go:236-241
    out2 = list(expand_vb4("http://f.example/thread/", 2, 3))
    assert out2 == [
        (2, "http://f.example/thread/page2"),
        (3, "http://f.example/thread/page3"),
    ]


def test_expand_seed_dispatch():
    row = {
        "seed_id": "s1",
        "pager": "vb4",
        "blueprint_url": "http://f.example/t",
        "start": 1,
        "end": 2,
    }
    assert expand_seed(row) == [(1, "http://f.example/t"), (2, "http://f.example/t/page2")]
    with pytest.raises(PagerError):
        expand_seed({**row, "pager": "nope"})
