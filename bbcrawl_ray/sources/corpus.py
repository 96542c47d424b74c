"""Deterministic synthetic bulletin-board corpus + transports.

No network exists in this sandbox (and tests must be hermetic), so the
Fetcher's transport is pluggable:

- ``SyntheticTransport`` — generates a vBulletin-like thread page as a
  pure function of the URL (seeded by ``hash64(url)``), so ANY actor
  can serve any URL with zero data shipping and the corpus scales to a
  10^10-URL frontier for free. Media URLs return deterministic bytes;
  /attach/ URLs carry Content-Disposition (names-from-header path);
  /redirect/ URLs produce redirect hops; /robots.txt serves a
  deterministic politeness ruleset.
- ``MappingTransport`` — an explicit {url: Response} dict for golden
  tests (broadcast once via ray.put).
- ``HttpTransport`` — a real urllib-based client (cookie jar +
  redirect policy handled by the Fetcher); unused in the sandbox.

The page markup deliberately exercises every reference extraction path
(FIXTURES.md §F2): posts matching ^post_?[0-9]+$ inside id="posts",
attachments matching ^attachment[0-9]+$ with relative+absolute hrefs,
img/audio/video with 0/1/many source/track children, filename
collisions for the avTag dedup path, and non-RFC-3986 relative URLs.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from urllib.parse import urlsplit

from ..functions.urlfns import hash64


@dataclass
class Response:
    status: int = 200
    headers: dict[str, list[str]] = field(default_factory=dict)
    body: bytes = b""
    redirect_to: str = ""

    def content_type(self) -> str:
        vals = self.headers.get("Content-Type") or self.headers.get("content-type")
        return vals[0] if vals else ""


@dataclass
class CorpusConfig:
    seed: int = 42
    posts_per_page: int = 4
    images_per_post: int = 2
    attachments_per_post: int = 1
    av_every: int = 3  # every Nth post carries an audio/video element
    media_bytes: int = 2048
    link_next_pages: int = 2  # pagination links for frontier discovery
    charset: str = "utf-8"


_WORDS = (
    "forum thread reply quote user media stream batch arrow shard frontier "
    "fetch parse span crawl politeness budget epoch checkpoint lineage"
).split()


# Deterministic sentence pools, one per length used by the generator:
# picking a prebuilt sentence with ONE rng draw replaces n draws + a
# join per sentence (the generator was ~15% of the fused fetch+parse
# wall in the bench profile). Pages remain a pure function of
# (url, cfg.seed); only the sentence text differs from the draw-per-
# word scheme, which nothing golden-pins.
_SENTENCE_POOL: dict[int, list[str]] = {}


def _sentence_pool(n: int) -> list[str]:
    pool = _SENTENCE_POOL.get(n)
    if pool is None:
        r = random.Random(0xC0FFEE ^ n)
        pool = [" ".join(r.choice(_WORDS) for _ in range(n)) for _ in range(256)]
        _SENTENCE_POOL[n] = pool
    return pool


def _sentence(rng: random.Random, n: int = 8) -> str:
    pool = _sentence_pool(n)
    return pool[rng.randrange(len(pool))]


def synth_thread_html(url: str, cfg: CorpusConfig) -> str:
    """The deterministic thread page for ``url`` (same url → same bytes)."""
    s = urlsplit(url)
    rng = random.Random(hash64(url) ^ cfg.seed)
    page_token = hash64(url) % 10_000_000
    parts = [
        "<html><head><title>thread</title></head><body>",
        f"<h1>Thread at {s.path}</h1>",
        f"<p>{_sentence(rng)}</p>",
        '<div id="posts">',
    ]
    for i in range(cfg.posts_per_page):
        post_num = page_token * 100 + i
        underscore = "_" if rng.random() < 0.5 else ""
        parts.append(f'<div id="post{underscore}{post_num}">')
        parts.append(f"<p>{_sentence(rng, 12)}</p>")
        for j in range(cfg.images_per_post):
            # mix of relative and absolute srcs; relative exercises rel2abs
            if rng.random() < 0.5:
                src = f"/img/p{post_num}-{j}.jpg"
            else:
                src = f"http://cdn.{s.hostname}/img/p{post_num}-{j}.jpg"
            parts.append(f'<img src="{src}" class="post-image">')
        if cfg.av_every and i % cfg.av_every == cfg.av_every - 1:
            # multi-source video exercises scrapeAV + avTag dedup
            parts.append(f'<video src="/media/v{post_num}.mp4">')
            parts.append(f'<source src="/media/v{post_num}.webm">')
            parts.append(f'<track src="/media/v{post_num}.vtt">')
            parts.append("</video>")
        for j in range(cfg.attachments_per_post):
            att_id = post_num * 10 + j
            parts.append(
                f'<a id="attachment{att_id}" href="/attach/f{att_id}.zip">attachment {j}</a>'
            )
        parts.append(f"<p>{_sentence(rng, 6)}</p>")
        parts.append("</div>")
    parts.append("</div>")
    # pagination links (engine frontier-discovery extension)
    base = f"{s.scheme}://{s.netloc}{s.path}"
    for k in range(1, cfg.link_next_pages + 1):
        parts.append(f'<a class="pagenav" href="{base}/next{k}">next {k}</a>')
    parts.append("</body></html>")
    return "\n".join(parts)


def synth_media_bytes(url: str, cfg: CorpusConfig) -> bytes:
    rng = random.Random(hash64(url) ^ cfg.seed ^ 0xBEEF)
    return rng.randbytes(cfg.media_bytes)


ROBOTS_TXT = "User-agent: *\nDisallow: /private/\nCrawl-delay: 0\n"


class SyntheticTransport:
    """Deterministic URL → Response; pure function of (url, cfg)."""

    def __init__(self, cfg: CorpusConfig | None = None):
        self.cfg = cfg or CorpusConfig()

    def get(self, url: str, headers: dict | None = None) -> Response:
        cfg = self.cfg
        s = urlsplit(url)
        path = s.path or "/"
        if path == "/robots.txt":
            return Response(
                200, {"Content-Type": ["text/plain; charset=utf-8"]}, ROBOTS_TXT.encode()
            )
        if path.startswith("/private/"):
            return Response(403, {"Content-Type": ["text/html; charset=utf-8"]}, b"forbidden")
        if path.startswith("/redirect/"):
            # /redirect/N/... hops down to /redirect/N-1/... then the target
            rest = path[len("/redirect/") :]
            n_str, _, tail = rest.partition("/")
            n = int(n_str) if n_str.isdigit() else 1
            target = (
                f"{s.scheme}://{s.netloc}/redirect/{n - 1}/{tail}"
                if n > 1
                else f"{s.scheme}://{s.netloc}/{tail}"
            )
            return Response(302, {"Location": [target]}, b"", redirect_to=target)
        if path.startswith("/img/") or path.startswith("/media/"):
            kind = path.rsplit(".", 1)[-1]
            ctype = {"jpg": "image/jpeg", "mp4": "video/mp4", "webm": "video/webm", "vtt": "text/vtt"}.get(
                kind, "application/octet-stream"
            )
            return Response(200, {"Content-Type": [ctype]}, synth_media_bytes(url, cfg))
        if path.startswith("/attach/"):
            fname = path.rsplit("/", 1)[-1]
            return Response(
                200,
                {
                    "Content-Type": ["application/octet-stream"],
                    "Content-Disposition": [f'attachment; filename="hdr-{fname}"'],
                },
                synth_media_bytes(url, cfg),
            )
        if path == "/missing-content-type":
            return Response(200, {}, b"<html></html>")
        html = synth_thread_html(url, cfg)
        return Response(
            200,
            {"Content-Type": [f"text/html; charset={cfg.charset}"]},
            html.encode(cfg.charset),
        )


class MappingTransport:
    """Explicit page map for golden tests. ``pages``: {url: Response}."""

    def __init__(self, pages: dict[str, Response]):
        self.pages = pages

    def get(self, url: str, headers: dict | None = None) -> Response:
        resp = self.pages.get(url)
        if resp is None:
            return Response(404, {"Content-Type": ["text/html; charset=utf-8"]}, b"not found")
        return resp


class HttpTransport:
    """Real HTTP GET via urllib (no redirects followed here — the Fetcher
    implements the redirect policy). Not exercised in the sandbox."""

    def __init__(self, timeout: float = 30.0, user_agent: str = "bbcrawl-ray/0.1"):
        self.timeout = timeout
        self.user_agent = user_agent

    def _open(self, url: str, headers: dict | None):
        """Open the request WITHOUT reading the body; returns
        (Response with empty body, open file-like reader). The caller
        owns the reader (must close it)."""
        import urllib.error
        import urllib.request

        req_headers = {"User-Agent": self.user_agent, **(headers or {})}
        req = urllib.request.Request(url, headers=req_headers)

        class _NoRedirect(urllib.request.HTTPRedirectHandler):
            def redirect_request(self, req, fp, code, msg, headers, newurl):
                return None

        opener = urllib.request.build_opener(_NoRedirect)
        try:
            resp = opener.open(req, timeout=self.timeout)
            hdrs: dict[str, list[str]] = {}
            for k, v in resp.headers.items():
                hdrs.setdefault(k, []).append(v)
            return Response(resp.status, hdrs, b""), resp
        except urllib.error.HTTPError as e:
            # HTTPError IS the open file-like body (non-2xx bodies parse
            # like any other — api.go:101-114: Go's client.Do does not
            # error on 404)
            loc = e.headers.get("Location", "") if e.headers else ""
            hdrs = {}
            for k, v in (e.headers or {}).items():
                hdrs.setdefault(k, []).append(v)  # repeats survive
            return Response(e.code, hdrs, b"", loc), e

    def get(self, url: str, headers: dict | None = None) -> Response:
        meta, reader = self._open(url, headers)
        try:
            body = reader.read()
        except Exception:  # noqa: BLE001 — connection died mid-body
            body = b""
        finally:
            try:
                reader.close()
            except Exception:  # noqa: BLE001
                pass
        return Response(meta.status, meta.headers, body, meta.redirect_to)

    def get_stream(self, url: str, headers: dict | None = None):
        """Reference ``io.Copy`` parity (downloader.go:308): the body
        stays on the wire — the caller pulls it in chunks and closes
        the reader. GB-scale media never materializes in worker heap."""
        return self._open(url, headers)


def make_transport(kind: str, cfg=None, pages=None):
    if kind == "synthetic":
        return SyntheticTransport(cfg)
    if kind == "mapping":
        return MappingTransport(pages or {})
    if kind == "http":
        return HttpTransport()
    raise ValueError(f"unknown transport {kind!r}")
