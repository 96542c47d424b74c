"""Flagship pipeline for the driver's smoke check (``__ray_entry__.entry``)."""

from __future__ import annotations

import tempfile


def flagship(sf_dir: str):
    """The full bbcrawl-parity crawl over the deterministic synthetic
    corpus: seeds → pager expansion → host-budgeted frontier → URL-seen
    dedup (sharded actors) → fetch (actor pool) → HTML parse →
    interleaved span documents. Returns the documents Dataset
    (input_hint shape + crawl lineage columns), ordered by
    (seed_id, page_num) for determinism.

    ``sf_dir`` is unused (the crawl's input is the synthetic corpus);
    it is accepted for driver-contract symmetry.
    """
    from ..cli.partition import CrawlerSpec
    from .crawl import CrawlConfig, run_crawl

    # per-invocation root: a fixed path would let a second flagship()
    # call clear checkpoints a previously returned LAZY Dataset still
    # references (Datasets read their parquet at consumption time)
    root = tempfile.mkdtemp(prefix="bbray_entry_")
    cfg = CrawlConfig(
        crawler=CrawlerSpec(crawler="src", tags=["img", "audio", "video"]),
        seeds=[
            {
                "seed_id": "s1",
                "pager": "vb4",
                "blueprint_url": "http://forum.example/threads/1",
                "start": 1,
                "end": 20,
            },
            {
                "seed_id": "s2",
                "pager": "query",
                "blueprint_url": "http://board.example/t?view=flat",
                "start": 1,
                "end": 20,
            },
        ],
        output_root=root,
        per_host_budget=None,
        seen_shards=2,
    )
    res = run_crawl(cfg)
    return res.documents.sort(["seed_id", "page_num"])
