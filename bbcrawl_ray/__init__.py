"""bbcrawl_ray — a Ray-Data-native bulletin-board crawl / data-processing engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference crawler (jwdev42/bbcrawl, a serial Go CLI
that walks forum-thread pages and downloads media), lifted to a
streaming URL-frontier pipeline on ray.data.Dataset:

- pagers (query / cutter / vb4) expand seed URLs into a frontier table
  (`sources.pagers`),
- fetch + parse run as ``map_batches`` over zero-copy Arrow batches with
  stateful actor pools for the HTTP/cookie/politeness state
  (`stages.fetch`, `stages.parse`),
- documents are emitted as interleaved text+media span rows
  (``doc_id, spans: list<struct<kind,text,media_ref,offset>>``),
- URL-seen membership lives in sharded filter actors (`state.seen`),
  per-host politeness budgets in `state.politeness`,
- checkpointed, resumable epoch execution in `pipelines.crawl`,
- generic relational operators for the driver contract in
  `pipelines.relops`, and large-scale training-data operators
  (dedup / similarity / text analysis) under `stages/`.

Nothing in this package calls ``ray.init``; callers own the Ray session.
"""

__version__ = "0.1.0"
