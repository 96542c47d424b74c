"""Coverage for the remaining §2 surface: exclusion, strict errors,
debug dumps, custom-pager registry, charset decode, tag+attrs query."""

import glob
import os
import shutil
import tempfile

import pytest

from bbcrawl_ray.cli.partition import CrawlerSpec
from bbcrawl_ray.functions.htmldom import elements_by_tag_and_attrs, parse_html
from bbcrawl_ray.sources.corpus import Response
from bbcrawl_ray.sources.pagers import expand_seed, register_pager


@pytest.fixture()
def tmp_root():
    d = tempfile.mkdtemp(prefix="bbray_misc_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_elements_by_tag_and_attrs():
    root = parse_html('<div a="1" b="2">x</div><div a="1">y</div><span a="1" b="2"></span>')
    hits = elements_by_tag_and_attrs(root, "div", [("a", "1"), ("b", "2")])
    assert len(hits) == 1
    assert elements_by_tag_and_attrs(root, "div", []) and len(
        elements_by_tag_and_attrs(root, "div", [])
    ) == 2  # empty attr set matches every div


def test_custom_pager_registry():
    def evens(row):
        for p in range(row["start"], row["end"] + 1):
            yield p, f"{row['blueprint_url']}/e{2 * p}"

    register_pager("evens", evens)
    rows = expand_seed(
        {"seed_id": "x", "pager": "evens", "blueprint_url": "http://h.example/t", "start": 1, "end": 3}
    )
    assert rows == [
        (1, "http://h.example/t/e2"),
        (2, "http://h.example/t/e4"),
        (3, "http://h.example/t/e6"),
    ]


def _one_page_crawl(tmp_root, pages, crawler, **cfg_kw):
    from bbcrawl_ray.pipelines.crawl import CrawlConfig, run_crawl

    cfg = CrawlConfig(
        crawler=crawler,
        seeds=[{"seed_id": "m", "pager": "vb4", "blueprint_url": "http://m.example/t", "start": 1, "end": 1}],
        output_root=tmp_root,
        transport="mapping",
        pages=pages,
        **cfg_kw,
    )
    return run_crawl(cfg)


HTML_ONE_IMG = b'<html><body><img src="/i/a.jpg"><img src="http://m.example/i/b.jpg"></body></html>'
PAGE_OK = {
    "http://m.example/t": Response(
        200, {"Content-Type": ["text/html; charset=utf-8"]}, HTML_ONE_IMG
    )
}


def test_exclude_list_marks_rows(ray_session, tmp_root):
    """-exclude is ENFORCED here (the reference parses but never applies
    it — crawler_src.go:215-222 has no callers; documented divergence)."""
    res = _one_page_crawl(
        tmp_root,
        PAGE_OK,
        CrawlerSpec(crawler="src", tags=["img"], exclude=["http://m.example/i/a.jpg"]),
    )
    man = res.manifest.to_pandas()
    by_ref = dict(zip(man["media_ref"], man["status"]))
    assert by_ref["http://m.example/i/a.jpg"] == "excluded"
    assert by_ref["http://m.example/i/b.jpg"] == "pending"


def test_strict_errors_aborts(ray_session, tmp_root):
    """Reference parity: a page FETCH error aborts the run (api.go:104-113).
    Note: a non-2xx response with a Content-Type is NOT a fetch error —
    Go's client.Do succeeds on 404/500 and the body is parsed; the
    BodyUTF8 missing-Content-Type error is what kills the reference."""
    pages = {"http://m.example/t": Response(200, {}, b"<html></html>")}
    with pytest.raises(Exception, match="page fetch failed|No Content-Type|RayTaskError"):
        res = _one_page_crawl(
            tmp_root, pages, CrawlerSpec(crawler="src", tags=["img"]), strict_errors=True
        )
        res.documents.to_pandas()


def test_non_2xx_body_is_parsed(ray_session, tmp_root):
    """A 404 WITH Content-Type parses like any page (Go client.Do parity)."""
    pages = {
        "http://m.example/t": Response(
            404,
            {"Content-Type": ["text/html; charset=utf-8"]},
            b'<html><body>gone <img src="/x/a.jpg"></body></html>',
        )
    }
    res = _one_page_crawl(tmp_root, pages, CrawlerSpec(crawler="src", tags=["img"]))
    docs = res.documents.to_pandas()
    assert len(docs) == 1
    kinds = [s["kind"] for s in docs.iloc[0]["spans"]]
    assert "img" in kinds


def test_debug_header_dumps(ray_session, tmp_root):
    res = _one_page_crawl(
        tmp_root, PAGE_OK, CrawlerSpec(crawler="src", tags=["img"], debug=True)
    )
    res.documents.to_pandas()
    dumps = sorted(glob.glob(f"{tmp_root}/debug/*.txt"))
    assert any("Request Header" in d for d in dumps)
    assert any("Response Header" in d for d in dumps)
    resp_dump = [d for d in dumps if "Response Header" in d][0]
    assert "Content-Type:\ttext/html; charset=utf-8" in open(resp_dump).read()


def test_non_utf8_charset_decode(ray_session, tmp_root):
    """BodyUTF8 parity: charset from Content-Type drives the decode."""
    body = '<html><body><p>café motor</p><img src="/x.jpg"></body></html>'.encode(
        "iso-8859-1"
    )
    pages = {
        "http://m.example/t": Response(
            200, {"Content-Type": ["text/html; charset=ISO-8859-1"]}, body
        )
    }
    res = _one_page_crawl(tmp_root, pages, CrawlerSpec(crawler="src", tags=["img"]))
    docs = res.documents.to_pandas()
    texts = [s["text"] for s in docs.iloc[0]["spans"] if s["kind"] == "text"]
    assert "café motor" in texts


def test_custom_extractor_registry_e2e(ray_session, tmp_root):
    """A driver-registered extractor must reach worker processes (shipped
    by value through the stage constructors) and dedup metrics must count
    re-offered URLs."""
    from bbcrawl_ray.pipelines.crawl import CrawlConfig, run_crawl
    from bbcrawl_ray.stages.parse import ManifestRow, register_extractor

    def first_img_only(url, page_num, root, spec):
        from bbcrawl_ray.functions.htmldom import attr_val, elements_by_tag
        from bbcrawl_ray.functions.urlfns import resolve_link

        for n in elements_by_tag(root, "img"):
            src = attr_val(n, "src")
            if src:
                return [
                    ManifestRow(resolve_link(url, src), out_name=f"first-{page_num}.img")
                ]
        return []

    register_extractor("first-img-test", first_img_only)
    seeds = [
        {"seed_id": "a", "pager": "vb4", "blueprint_url": "http://forum.example/t", "start": 1, "end": 3},
        {"seed_id": "b", "pager": "vb4", "blueprint_url": "http://forum.example/t", "start": 1, "end": 3},
    ]
    res = run_crawl(
        CrawlConfig(
            crawler=CrawlerSpec(crawler="first-img-test"), seeds=seeds, output_root=tmp_root
        )
    )
    man = res.manifest.to_pandas()
    assert sorted(man["out_name"]) == ["first-1.img", "first-2.img", "first-3.img"]
    m = res.metrics[0]
    assert m["frontier_selected"] == 6 and m["dedup_hits"] == 3 and m["pages_parsed"] == 3


def test_loglevel_parse_and_filtering():
    import logging

    import pytest

    from bbcrawl_ray.functions.loglevels import LEVELS, configure, parse_loglevel

    assert parse_loglevel("ERROR") == "error"
    with pytest.raises(ValueError):
        parse_loglevel("chatty")
    # syslog severity ordering
    assert LEVELS["panic"] > LEVELS["error"] > LEVELS["notice"] > LEVELS["debug"]

    log = configure("error")
    child = logging.getLogger("bbcrawl_ray.pipelines.crawl")
    assert not child.isEnabledFor(logging.WARNING)  # warning < error: filtered
    assert child.isEnabledFor(logging.ERROR)
    configure("debug")
    assert child.isEnabledFor(logging.DEBUG)
    configure("error")  # restore default for other tests
    assert log is logging.getLogger("bbcrawl_ray")


def test_download_error_bodies_knob(ray_session, tmp_path):
    """Default: non-200 download is an error row, no file. error_bodies=True
    restores reference behavior (downloader.go:277-317): body written."""
    import pyarrow as pa
    import ray

    from bbcrawl_ray.sources.corpus import Response
    from bbcrawl_ray.stages.download import Downloader
    from bbcrawl_ray.stages.fetch import FetchConfig

    pages = {
        "http://h.example/gone.jpg": Response(
            404, {"Content-Type": ["text/html"]}, b"<h1>not found</h1>"
        )
    }
    fcfg = FetchConfig(transport="mapping", pages_ref=ray.put(pages))
    batch = pa.table(
        {
            "media_ref": ["http://h.example/gone.jpg"],
            "out_name": ["gone.jpg"],
            "out_dir": [""],
            "status": ["pending"],
            "error": [""],
            "bytes": [0],
            "post_id": [""],
            "att_ordinal": [0],
            "header_filename": [""],
        }
    )
    d1 = Downloader(fcfg, str(tmp_path / "a"))
    r1 = d1(batch).to_pylist()[0]
    assert r1["status"] == "error" and "404" in r1["error"]
    assert not (tmp_path / "a" / "gone.jpg").exists()

    d2 = Downloader(fcfg, str(tmp_path / "b"), error_bodies=True)
    r2 = d2(batch).to_pylist()[0]
    assert r2["status"] == "ok" and "404" in r2["error"]
    assert (tmp_path / "b" / "gone.jpg").read_bytes() == b"<h1>not found</h1>"


def test_review_fix_regressions(ray_session):
    """Round-2 review fixes: bytes-codec charset labels error instead of
    crashing; single-label hosts keep their own cookies; asof_join
    refuses silently-corrupting >2^53 int payloads."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from bbcrawl_ray.functions.charsets import decode_body
    from bbcrawl_ray.functions.publicsuffix import cookie_domains
    from bbcrawl_ray.pipelines.relops import asof_join

    # hex/zlib/base64 are bytes codecs Python knows — must be an error
    # row, not a LookupError escaping the parse stage
    for label in ("hex", "zlib_codec", "base64", "rot13"):
        txt, err = decode_body(b"<html>", label)
        assert err, label
    # the exact host is always a cookie candidate, even when it is a
    # public-suffix label (localhost, dev hosts)
    assert cookie_domains("localhost") == ["localhost"]
    assert cookie_domains("test") == ["test"]
    assert cookie_domains("example.com")[0] == "example.com"

    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1], pa.int64()),
                "t": pa.array([pd.Timestamp("2024-01-02")]),
                "big_id": pa.array([2**62 + 1], pa.int64()),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1], pa.int64()),
                "rt": pa.array([pd.Timestamp("2024-01-01")]),
                "v": pa.array([7], pa.int64()),
            }
        )
    )
    with pytest.raises(Exception, match="2\\^53"):
        asof_join(
            left, right, key="k", left_time="t", right_time="rt", value_cols=["v"]
        ).to_pandas()
