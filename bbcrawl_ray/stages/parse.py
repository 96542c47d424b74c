"""HTML → interleaved span documents + download-manifest rows.

Stateless ``map_batches`` stage (pyarrow in/out): one fetched page row
in, one documents row (the ``input_hint`` span shape) plus N manifest
rows out. Regexes are module-level compiled constants, so stateless
tasks pay no per-batch setup.

Semantics parity (see SURVEY.md §2.3):
- src crawler        — /root/reference/libcrawl/crawler_src.go:36-86
- scrapeAV           — crawler_src.go:140-186
- vb-attachments     — /root/reference/libcrawl/crawlers.go:247-374
- file crawler       — crawlers.go:182-212
- per-page ``fileid`` (reset to 1, crawler_src.go:38) and per-post
  ``attid`` (increments on failures too, crawlers.go:268-308) are
  derived from DOM order within the row — no shared state.

The documents table carries the FULL interleaved representation
(text + every media kind, in DOM order); the manifest carries only
what the configured crawler would download.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyarrow as pa

from .. import schemas
from ..cli.partition import CrawlerSpec
from ..functions import naming
from ..functions.htmldom import (
    Node,
    attr_val,
    element_by_id,
    elements_by_attr_match,
    elements_by_tag,
    match_attrs,
    parse_html,
    walk,
)
from ..functions.urlfns import file_name_from_url, resolve_link

VB4_POST_ID = re.compile(r"^post_?[0-9]+$")
VB4_ATTACHMENT_ID = re.compile(r"^attachment[0-9]+$")
_DIGITS = re.compile(r"[0-9]+")

MEDIA_TAGS = ("img", "audio", "video", "source", "track")


@dataclass
class Span:
    kind: str
    text: str = ""
    media_ref: str = ""

    def as_dict(self, offset: int) -> dict:
        return {
            "kind": self.kind,
            "text": self.text,
            "media_ref": self.media_ref,
            "offset": offset,
        }


@dataclass
class ManifestRow:
    media_ref: str
    out_dir: str = ""
    out_name: str = ""
    post_id: str = ""
    att_ordinal: int = 0
    status: str = "pending"
    error: str = ""


def extract_spans(page_url: str, root: Node) -> list[Span]:
    """Full interleaved span sequence in DOM pre-order (FIXTURES.md §F3).

    - text nodes → kind=text (stripped, empty skipped)
    - img/audio/video/source/track with src → media span
    - any element with id ~ ^attachment[0-9]+$ and href → kind=attachment
    """
    spans: list[Span] = []
    for n in walk(root):
        if n.tag is None:
            t = n.text.strip()
            if t:
                spans.append(Span("text", text=t))
            continue
        node_id = attr_val(n, "id")
        if node_id and VB4_ATTACHMENT_ID.match(node_id):
            href = attr_val(n, "href")
            if href:
                spans.append(Span("attachment", media_ref=resolve_link(page_url, href)))
            continue
        if n.tag in MEDIA_TAGS:
            src = attr_val(n, "src")
            if src:
                spans.append(Span(n.tag, media_ref=resolve_link(page_url, src)))
    return spans


# ---------------------------------------------------------------------------
# src crawler manifest


def src_crawler_manifest(
    page_url: str, page_num: int, root: Node, spec: CrawlerSpec
) -> list[ManifestRow]:
    """Replicates SrcCrawler.Crawl + scrapeAV + uniqueName semantics."""
    attrs_filter = [(k, v) for k, vals in spec.attrs.items() for v in vals]
    wanted = set(spec.tags)
    rows: list[ManifestRow] = []
    fileid = 1  # reset per page — crawler_src.go:38

    def resolve(link: str) -> tuple[str, str]:
        try:
            return resolve_link(page_url, link), ""
        except ValueError as e:
            return link, str(e)

    for n in elements_by_tag(root, "audio", "img", "video"):
        if n.tag not in wanted or not match_attrs(n, attrs_filter):
            continue
        if n.tag == "img":
            link = attr_val(n, "src")
            if not link:
                continue
            try:
                name = naming.unique_name(page_num, fileid, link)
            except naming.NamingError as e:
                rows.append(ManifestRow(link, status="error", error=str(e)))
                continue
            fileid += 1  # consumed only on success — crawler_src.go:195-203
            ref, err = resolve(link)
            rows.append(
                ManifestRow(ref, out_name=name, status="error" if err else "pending", error=err)
            )
        else:  # audio / video → scrapeAV (crawler_src.go:140-186)
            downloads: list[str] = []
            own = attr_val(n, "src")
            if own:
                downloads.append(own)
            for child in elements_by_tag(n, "source", "track"):
                link = attr_val(child, "src")
                if link:
                    downloads.append(link)
            if not downloads:
                continue
            if len(downloads) == 1:
                try:
                    name = naming.unique_name(page_num, fileid, downloads[0])
                except naming.NamingError as e:
                    rows.append(ManifestRow(downloads[0], status="error", error=str(e)))
                    continue
                fileid += 1
                ref, err = resolve(downloads[0])
                rows.append(
                    ManifestRow(
                        ref, out_name=name, status="error" if err else "pending", error=err
                    )
                )
            else:
                subdir = f"{page_num}-{fileid}"
                fileid += 1  # dir consumes the fileid — crawler_src.go:166-168
                names, name_errors = naming.av_tag_names(downloads)
                for bad_src, msg in name_errors:
                    rows.append(ManifestRow(bad_src, status="error", error=msg))
                for link, name in names.items():
                    ref, err = resolve(link)
                    rows.append(
                        ManifestRow(
                            ref,
                            out_dir=subdir,
                            out_name=name,
                            status="error" if err else "pending",
                            error=err,
                        )
                    )
    return rows


# ---------------------------------------------------------------------------
# vb-attachments crawler manifest


def vb_post_id(node: Node) -> str:
    """First digit-run of the matching id attr (crawlers.go:334-342)."""
    for k, v in node.attrs:
        if k == "id" and VB4_POST_ID.match(v):
            m = _DIGITS.search(v)
            return m.group(0) if m else ""
    return ""


def vb_attachments_manifest(
    page_url: str, page_num: int, root: Node, spec: CrawlerSpec
) -> list[ManifestRow]:
    """Replicates VBAttachmentCrawler.Crawl (crawlers.go:247-312)."""
    rows: list[ManifestRow] = []
    posts_container = element_by_id(root, "posts")
    posts = (
        elements_by_attr_match(posts_container, "id", VB4_POST_ID)
        if posts_container is not None
        else []
    )
    if not posts:
        # reference logs an error and continues (crawlers.go:263-265)
        rows.append(
            ManifestRow("", status="error", error=f'No posts found at page "{page_url}"')
        )
        return rows
    for post in posts:
        postid = vb_post_id(post)
        attid = 1
        for att in elements_by_attr_match(post, "id", VB4_ATTACHMENT_ID):
            href = attr_val(att, "href")
            if not href:
                # reference would nil-deref here; engine records an error row.
                # attid increments on failures too (crawlers.go:268-272,308)
                rows.append(
                    ManifestRow(
                        "",
                        post_id=postid,
                        att_ordinal=attid,
                        status="error",
                        error="attachment without href",
                    )
                )
                attid += 1
                continue
            try:
                ref = resolve_link(page_url, href)
            except ValueError as e:
                rows.append(
                    ManifestRow(
                        href, post_id=postid, att_ordinal=attid, status="error", error=str(e)
                    )
                )
                attid += 1
                continue
            if spec.names_from_header:
                # name resolved post-download from Content-Disposition with
                # prefix "{postid}-{attid}" (crawlers.go:295-298)
                rows.append(
                    ManifestRow(
                        ref,
                        post_id=postid,
                        att_ordinal=attid,
                        out_name="",
                        status="pending",
                    )
                )
            else:
                name = file_name_from_url(ref)
                if not name:
                    rows.append(
                        ManifestRow(
                            ref,
                            post_id=postid,
                            att_ordinal=attid,
                            status="error",
                            error="no basename in attachment URL",
                        )
                    )
                    attid += 1
                    continue
                rows.append(
                    ManifestRow(
                        ref,
                        post_id=postid,
                        att_ordinal=attid,
                        out_name=f"{postid}-{attid}-{name}",
                        status="pending",
                    )
                )
            attid += 1
    return rows


def file_crawler_manifest(url: str, page_num: int) -> list[ManifestRow]:
    """file crawler: the paged URL IS the download (crawlers.go:182-212)."""
    name = naming.file_crawler_name(page_num, url)
    return [ManifestRow(url, out_name=name, status="pending")]


# user-extension surface (reference crawler registry, api.go:27-31):
# extractor(page_url, page_num, dom_root, spec) -> list[ManifestRow]
EXTRACTORS = {
    "src": src_crawler_manifest,
    "vb-attachments": vb_attachments_manifest,
}


def register_extractor(name: str, fn) -> None:
    """Register a custom crawler's manifest extractor; referenced by the
    CrawlerSpec.crawler name in any CrawlConfig."""
    EXTRACTORS[name] = fn


# ---------------------------------------------------------------------------
# batch function


class ParsePages:
    """map_batches fn: PAGES rows → (documents_full ⊕ manifest) rows.

    Emits a two-part output keyed by ``record_kind`` so one pass over the
    body produces both tables; the pipeline splits them downstream with a
    cheap vectorized filter. Bodies are dropped here — the earliest
    point possible — to keep blocks small (SURVEY.md §4 memory row).
    """

    def __init__(
        self,
        spec: CrawlerSpec,
        strict_errors: bool = False,
        discover_links: bool = False,
        extractor=None,
    ):
        self.spec = spec
        self.strict_errors = strict_errors
        self.discover_links = discover_links
        # resolve the extractor HERE (usually on the driver) so custom
        # registry entries travel by value to worker processes — a
        # worker's module-level EXTRACTORS dict never sees driver-side
        # register_extractor() calls
        self.extractor = extractor if extractor is not None else EXTRACTORS.get(spec.crawler)

    def _links(self, page_url: str, root: Node) -> list[str]:
        """Frontier-discovery extension (no reference counterpart): hrefs of
        non-attachment anchors, absolutized."""
        out = []
        for n in elements_by_tag(root, "a"):
            node_id = attr_val(n, "id")
            if node_id and VB4_ATTACHMENT_ID.match(node_id):
                continue
            href = attr_val(n, "href")
            if href:
                try:
                    out.append(resolve_link(page_url, href))
                except ValueError:
                    pass
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        # column-wise extraction: the headers map and any column the
        # parser never touches stay in Arrow (never converted to Python)
        urls = batch["url"].to_pylist()
        seed_ids = batch["seed_id"].to_pylist()
        page_nums = batch["page_num"].to_pylist()
        errors_in = batch["error"].to_pylist() if "error" in batch.column_names else [""] * len(urls)
        encodings = (
            batch["encoding"].to_pylist() if "encoding" in batch.column_names else ["utf-8"] * len(urls)
        )
        bodies = batch["body"].to_pylist() if "body" in batch.column_names else [b""] * len(urls)

        doc_rows: list[tuple] = []  # (doc_id, seed_id, page_num, url)
        # spans as flat arrays + per-doc lengths → ListArray.from_arrays
        span_kind: list[str] = []
        span_text: list[str] = []
        span_ref: list[str] = []
        span_off: list[int] = []
        span_lens: list[int] = []
        man_rows: list[tuple] = []  # (doc_id, seed_id, page_num, url, ManifestRow)

        for url, seed_id, page_num, err, enc, body in zip(
            urls, seed_ids, page_nums, errors_in, encodings, bodies
        ):
            doc_id = f"{seed_id}/{page_num}"
            if err:
                if self.strict_errors:
                    # reference aborts the whole run on page errors (api.go:104-113)
                    raise RuntimeError(f"page fetch failed: {url}: {err}")
                man_rows.append(
                    (doc_id, seed_id, page_num, url, ManifestRow("", status="error", error=err))
                )
                continue
            if self.spec.crawler == "file":
                doc_rows.append((doc_id, seed_id, page_num, url))
                span_lens.append(0)
                for m in file_crawler_manifest(url, page_num):
                    man_rows.append((doc_id, seed_id, page_num, url, m))
                continue
            from ..functions.charsets import decode_body

            text, enc_err = decode_body(body, enc or "utf-8")
            if enc_err:
                # BodyUTF8 parity (encoding.go:10-16): an unsupported
                # charset is an error, never a silent utf-8 mangle
                if self.strict_errors:
                    raise RuntimeError(f"page decode failed: {url}: {enc_err}")
                man_rows.append(
                    (doc_id, seed_id, page_num, url, ManifestRow("", status="error", error=enc_err))
                )
                continue
            root = parse_html(text)
            spans = extract_spans(url, root)
            doc_rows.append((doc_id, seed_id, page_num, url))
            span_lens.append(len(spans))
            for i, s in enumerate(spans):
                span_kind.append(s.kind)
                span_text.append(s.text)
                span_ref.append(s.media_ref)
                span_off.append(i)
            if self.discover_links:
                for link in self._links(url, root):
                    man_rows.append(
                        (doc_id, seed_id, page_num, url, ManifestRow(link, status="", error="link"))
                    )
            manifest = (
                self.extractor(url, page_num, root, self.spec) if self.extractor else []
            )
            for m in manifest:
                man_rows.append((doc_id, seed_id, page_num, url, m))

        excluded = set(self.spec.exclude)
        n_docs = len(doc_rows)
        import numpy as np

        offsets = np.zeros(n_docs + 1, dtype=np.int32)
        np.cumsum(span_lens, out=offsets[1:])
        span_struct = pa.StructArray.from_arrays(
            [
                pa.array(span_kind, pa.string()),
                pa.array(span_text, pa.string()),
                pa.array(span_ref, pa.string()),
                pa.array(span_off, pa.int32()),
            ],
            fields=list(schemas.SPAN),
        )
        spans_col = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), span_struct)
        docs_tbl = pa.table(
            {
                "record_kind": pa.array(["doc"] * n_docs, pa.string()),
                "doc_id": pa.array([d for d, _, _, _ in doc_rows], pa.string()),
                "spans": spans_col,
                "seed_id": pa.array([s for _, s, _, _ in doc_rows], pa.string()),
                "page_num": pa.array([p for _, _, p, _ in doc_rows], pa.int64()),
                "url": pa.array([u for _, _, _, u in doc_rows], pa.string()),
                "media_ref": pa.array([""] * n_docs, pa.string()),
                "out_dir": pa.array([""] * n_docs, pa.string()),
                "out_name": pa.array([""] * n_docs, pa.string()),
                "post_id": pa.array([""] * n_docs, pa.string()),
                "att_ordinal": pa.array([0] * n_docs, pa.int32()),
                "status": pa.array([""] * n_docs, pa.string()),
                "error": pa.array([""] * n_docs, pa.string()),
                "bytes": pa.array([0] * n_docs, pa.int64()),
                "header_filename": pa.array([""] * n_docs, pa.string()),
            }
        )
        n_man = len(man_rows)
        empty_spans = pa.ListArray.from_arrays(
            pa.array(np.zeros(n_man + 1, dtype=np.int32), pa.int32()),
            span_struct.slice(0, 0),
        )
        man_tbl = pa.table(
            {
                "record_kind": pa.array(
                    ["link" if m.error == "link" else "manifest" for *_, m in man_rows],
                    pa.string(),
                ),
                "doc_id": pa.array([d for d, *_ in man_rows], pa.string()),
                "spans": empty_spans,
                "seed_id": pa.array([s for _, s, *_ in man_rows], pa.string()),
                "page_num": pa.array([p for _, _, p, _, _ in man_rows], pa.int64()),
                "url": pa.array([u for _, _, _, u, _ in man_rows], pa.string()),
                "media_ref": pa.array([m.media_ref for *_, m in man_rows], pa.string()),
                "out_dir": pa.array([m.out_dir for *_, m in man_rows], pa.string()),
                "out_name": pa.array([m.out_name for *_, m in man_rows], pa.string()),
                "post_id": pa.array([m.post_id for *_, m in man_rows], pa.string()),
                "att_ordinal": pa.array([m.att_ordinal for *_, m in man_rows], pa.int32()),
                "status": pa.array(
                    [
                        "excluded" if m.media_ref in excluded and m.status == "pending" else m.status
                        for *_, m in man_rows
                    ],
                    pa.string(),
                ),
                "error": pa.array(
                    ["" if m.error == "link" else m.error for *_, m in man_rows],
                    pa.string(),
                ),
                "bytes": pa.array([0] * n_man, pa.int64()),
                "header_filename": pa.array([""] * n_man, pa.string()),
            }
        )
        return pa.concat_tables([docs_tbl, man_tbl])
