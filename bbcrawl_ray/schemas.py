"""Arrow schemas for every table the engine moves between stages.

The reference engine (Go, jwdev42/bbcrawl) has no tables at all — one
URL at a time flows through a pull loop (`libcrawl/api.go:101-114`).
Here every intermediate is a columnar table so Ray Data can stream
Arrow blocks through ``map_batches`` stages with backpressure.

Schema sources (see SURVEY.md §1):
- frontier: the pager output + engine-added scheduling columns.
- pages: fetched HTTP responses (body kept as large_binary, dropped as
  early as possible after parsing).
- documents: the BASELINE.json ``input_hint`` shape — interleaved
  text + media spans per crawled page, spans in DOM order.
- media_manifest: one row per media download job, deterministic
  ``out_name`` replicating the reference's naming (FIXTURES.md §F4).
"""

from __future__ import annotations

import pyarrow as pa

# --- seeds (pager blueprints; FIXTURES.md §F1) -------------------------------
SEEDS = pa.schema(
    [
        ("seed_id", pa.string()),
        ("pager", pa.string()),  # query | cutter | vb4
        ("blueprint_url", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("name", pa.string()),  # query pager page variable (default "page")
        ("cut_index", pa.int32()),
        ("cut_len", pa.int32()),
        ("step", pa.int32()),
        ("digits", pa.int32()),
        ("adjust", pa.int32()),
        ("startpage", pa.string()),  # "" if unset
    ]
)

# --- frontier ----------------------------------------------------------------
FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("canon_url", pa.string()),
        ("host", pa.string()),
        ("page_num", pa.int64()),
        ("priority", pa.int64()),
        ("depth", pa.int32()),
        ("seed_id", pa.string()),
        ("url_hash", pa.uint64()),
        ("discovered_from", pa.string()),
        ("epoch", pa.int32()),
    ]
)

# --- fetched pages -----------------------------------------------------------
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("seed_id", pa.string()),
        ("page_num", pa.int64()),
        ("status", pa.int32()),
        ("content_type", pa.string()),
        ("body", pa.large_binary()),
        ("encoding", pa.string()),
        ("redirect_chain", pa.list_(pa.string())),
        ("headers", pa.map_(pa.string(), pa.string())),
        ("error", pa.string()),  # "" = ok
    ]
)

# --- documents (the input_hint shape) ----------------------------------------
SPAN = pa.struct(
    [
        ("kind", pa.string()),  # text|img|audio|video|source|track|attachment
        ("text", pa.string()),  # "" for media spans
        ("media_ref", pa.string()),  # absolutized src/href; "" for text spans
        ("offset", pa.int32()),  # 0-based span ordinal within the doc
    ]
)

DOCUMENTS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN)),
    ]
)

# documents with crawl lineage attached (superset of the input_hint shape)
DOCUMENTS_FULL = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN)),
        ("seed_id", pa.string()),
        ("page_num", pa.int64()),
        ("url", pa.string()),
        ("epoch", pa.int32()),
    ]
)

# --- media manifest (download sink rows; FIXTURES.md §F4) --------------------
MEDIA_MANIFEST = pa.schema(
    [
        ("doc_id", pa.string()),
        ("seed_id", pa.string()),
        ("page_num", pa.int64()),
        ("media_ref", pa.string()),
        ("out_dir", pa.string()),  # "" = output root, else "{page}-{fileid}" subdir
        ("out_name", pa.string()),
        ("post_id", pa.string()),  # "" unless vb-attachments
        ("att_ordinal", pa.int32()),  # per-post 1-based; increments on failures too
        ("status", pa.string()),  # ok | error | skipped_exists | pending
        ("error", pa.string()),
        ("bytes", pa.int64()),
        ("header_filename", pa.string()),
    ]
)


# --- combined parse-stage output (documents ⊕ manifest ⊕ links) -------------
# One pass over each fetched body yields all three record kinds; the
# pipeline splits them downstream with a cheap vectorized filter on
# ``record_kind`` (doc | manifest | link).
PARSED = pa.schema(
    [
        ("record_kind", pa.string()),
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN)),
        ("seed_id", pa.string()),
        ("page_num", pa.int64()),
        ("url", pa.string()),
        ("media_ref", pa.string()),
        ("out_dir", pa.string()),
        ("out_name", pa.string()),
        ("post_id", pa.string()),
        ("att_ordinal", pa.int32()),
        ("status", pa.string()),
        ("error", pa.string()),
        ("bytes", pa.int64()),
        ("header_filename", pa.string()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    """An empty Arrow table with the given schema."""
    return schema.empty_table()
