"""State-layer tests: seen shards, politeness/skew, cookie file, robots."""

import numpy as np
import pyarrow as pa
import pytest

from bbcrawl_ray.functions.cookiefile import CookieFileError, parse_cookie_lines
from bbcrawl_ray.stages.fetch import RobotsRules
from bbcrawl_ray.state.seen import _BloomSeen, _CuckooSeen


def test_bloom_fp_rate_reasonable():
    b = _BloomSeen(capacity=10_000, bits_per_key=10, num_hashes=7)
    rng = np.random.default_rng(3)
    first = rng.integers(0, 2**63, size=10_000, dtype=np.int64).astype(np.uint64)
    b.check_and_add(first)
    probe = rng.integers(0, 2**63, size=10_000, dtype=np.int64).astype(np.uint64)
    fresh = np.setdiff1d(probe, first)
    is_new = b.check_and_add(fresh)
    fp_rate = 1.0 - is_new.mean()
    assert fp_rate < 0.03  # theoretical ~1% at 10 bits/key


def test_cuckoo_insert_and_lookup():
    c = _CuckooSeen(capacity=5_000)
    rng = np.random.default_rng(9)
    keys = np.unique(rng.integers(0, 2**63, size=4_000, dtype=np.int64).astype(np.uint64))
    new = c.check_and_add(keys)
    assert new.sum() >= len(keys) * 0.99  # fp collisions possible, rare
    again = c.check_and_add(keys)
    assert not again.any()


def test_seen_shard_pool_routing(ray_session):
    from bbcrawl_ray.state.seen import SeenSet

    seen = SeenSet(num_shards=3, mode="exact")
    urls = [f"http://h/{i}" for i in range(100)]
    hashes = np.arange(100, dtype=np.uint64)
    first = seen.check_and_add_batch(hashes, urls)
    assert first.all()
    second = seen.check_and_add_batch(hashes, urls)
    assert not second.any()
    assert sum(seen.sizes()) == 100


def test_budget_frontier_skew_split(ray_session):
    import ray.data as rd

    from bbcrawl_ray.sources.pagers import expand_seeds_batch
    from bbcrawl_ray.state.politeness import budget_frontier

    seeds = pa.Table.from_pylist(
        [
            {
                "seed_id": "hot",
                "pager": "query",
                "blueprint_url": "http://hot.example/t",
                "start": 1,
                "end": 90,
                "name": "page",
                "cut_index": 0,
                "cut_len": 0,
                "step": 1,
                "digits": 0,
                "adjust": 0,
                "startpage": "",
            },
            {
                "seed_id": "cold",
                "pager": "query",
                "blueprint_url": "http://cold.example/t",
                "start": 1,
                "end": 5,
                "name": "page",
                "cut_index": 0,
                "cut_len": 0,
                "step": 1,
                "digits": 0,
                "adjust": 0,
                "startpage": "",
            },
        ]
    )
    frontier = rd.from_arrow(expand_seeds_batch(seeds))
    out = budget_frontier(frontier, per_host_budget=60, skew_split_threshold=20).to_pandas()
    hot = out[out.host == "hot.example"]
    cold = out[out.host == "cold.example"]
    # budget: 60 of 90 selected, best-priority (lowest pages) first
    assert hot.selected.sum() == 60
    assert set(hot[hot.selected].page_num) == set(range(1, 61))
    assert cold.selected.all()
    # skew split: hot host fans into ceil(60/20)=3 sub-shards
    assert hot.host_shard.nunique() == 3
    assert cold.host_shard.nunique() == 1
    # sub-shards share the ONE budget chosen before the split
    assert hot[hot.selected].host_shard.nunique() == 3


def test_cookie_file_parse():
    lines = [
        "# Netscape HTTP Cookie File",
        "",
        ".forum.example\tTRUE\t/\tFALSE\t0\tsession\tabc123",
        "#HttpOnly_www.other.example\tFALSE\t/\tTRUE\t0\ttok\txyz",
    ]
    jar = parse_cookie_lines(lines)
    assert jar == {
        "forum.example": {"session": "abc123"},
        "www.other.example": {"tok": "xyz"},
    }
    with pytest.raises(CookieFileError):
        parse_cookie_lines(["bad\tline"])


def test_robots_crawl_delay(ray_session):
    """A host whose robots.txt declares Crawl-delay gets that spacing even
    when the configured floor is lower."""
    import time

    import pyarrow as pa

    from bbcrawl_ray.sources.corpus import Response
    from bbcrawl_ray.stages.fetch import FetchConfig, Fetcher

    import ray

    pages = {
        "http://slow.example/robots.txt": Response(
            200, {"Content-Type": ["text/plain"]}, b"User-agent: *\nCrawl-delay: 0.1\n"
        ),
        "http://slow.example/a": Response(200, {"Content-Type": ["text/html"]}, b"<p>a</p>"),
        "http://slow.example/b": Response(200, {"Content-Type": ["text/html"]}, b"<p>b</p>"),
    }
    cfg = FetchConfig(transport="mapping", pages_ref=ray.put(pages), obey_robots=True)
    f = Fetcher(cfg)
    batch = pa.table(
        {
            "url": ["http://slow.example/a", "http://slow.example/b"],
            "host": ["slow.example", "slow.example"],
            "seed_id": ["s", "s"],
            "page_num": [1, 2],
        }
    )
    t0 = time.monotonic()
    out = f(batch)
    assert list(out["error"].to_pylist()) == ["", ""]
    assert time.monotonic() - t0 >= 0.1  # robots delay enforced between fetches


def test_robots_rules():
    r = RobotsRules("User-agent: *\nDisallow: /private/\nDisallow: /tmp\n")
    assert not r.allowed("/private/x")
    assert not r.allowed("/tmpfile")
    assert r.allowed("/public")
    other = RobotsRules("User-agent: googlebot\nDisallow: /\n")
    assert other.allowed("/anything")  # rules scoped to other agents ignored
    d = RobotsRules("User-agent: *\nCrawl-delay: 2.5\n")
    assert d.crawl_delay == 2.5


def test_fetcher_robots_and_politeness(ray_session):
    """obey_robots blocks /private/ pages; cookies reach the transport."""
    import time

    from bbcrawl_ray.stages.fetch import FetchConfig, Fetcher

    cfg = FetchConfig(transport="synthetic", obey_robots=True, min_host_delay_s=0.05)
    f = Fetcher(cfg)
    batch = pa.table(
        {
            "url": ["http://h.example/private/x", "http://h.example/t", "http://h.example/t2"],
            "host": ["h.example", "h.example", "h.example"],
            "seed_id": ["s", "s", "s"],
            "page_num": [1, 2, 3],
        }
    )
    t0 = time.monotonic()
    out = f(batch)
    elapsed = time.monotonic() - t0
    errs = out["error"].to_pylist()
    assert errs[0] == "blocked by robots.txt"
    assert errs[1] == "" and errs[2] == ""
    # min-delay enforced between the two same-host page fetches
    assert elapsed >= 0.05
