"""Explicit Arrow schemas for every logical table.

The reference's schemas are implicit fixed record widths passed to
byte-array sorts (/root/reference/Indexer/Program.cs:232,566,898 — 8- and
16-byte records); here every table gets an explicit pyarrow schema
(SURVEY.md §1.2).
"""

from __future__ import annotations

import pyarrow as pa

# Field codes (reference runs the whole indexer twice, once over titles.txt
# and once over wikitext.txt — /root/reference/Engine/Engine/Engine.cs:100-122.
# Here a field is a uint8 code on the postings rows.)
FIELD_BODY = 0
FIELD_TITLE = 1
FIELD_NAMES = {FIELD_BODY: "body", FIELD_TITLE: "title"}
FIELD_CODES = {v: k for k, v in FIELD_NAMES.items()}

# Primary input (BASELINE.json input_hint).
PAGES = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.large_string()),
        pa.field("lang", pa.string()),
    ]
)

# Document metadata (analog of titles.txt + wikitext.index,
# /root/reference/Indexer/Repository/Program.cs:136-143).
DOCS = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("url", pa.string()),
        pa.field("title", pa.string()),
    ]
)

# Flat postings (analog of forward_index.bin exploded,
# /root/reference/Indexer/Program.cs:299-331). `dl` is the kept-token count
# of (doc, field) — the reference recovers doc length the same way
# (SURVEY.md §1.3.3).
POSTINGS = pa.schema(
    [
        pa.field("part", pa.uint32()),
        pa.field("field", pa.uint8()),
        pa.field("term_hash", pa.int64()),
        pa.field("doc_id", pa.int64()),
        pa.field("tf", pa.uint32()),
        pa.field("dl", pa.uint32()),
    ]
)

# With BuildConfig.store_positions: per-posting varbyte-encoded token
# positions (delta-coded; enables phrase queries).
POSTINGS_POS = POSTINGS.append(pa.field("positions", pa.large_binary()))

# Global lexicon (merges the reference's lexicon.txt / frequency.bin /
# wordscount.bin families — /root/reference/Indexer/Program.cs:131-138,458-467).
LEXICON = pa.schema(
    [
        pa.field("field", pa.uint8()),
        pa.field("term_hash", pa.int64()),
        pa.field("df", pa.int64()),
        pa.field("cf", pa.int64()),
    ]
)

# Per-partition segment: local doc table ...
SEGMENT_DOCS = pa.schema(
    [
        pa.field("doc_id", pa.int64()),  # ascending; row index == local ordinal
        pa.field("dl_body", pa.uint32()),
        pa.field("dl_title", pa.uint32()),
    ]
)

# ... and per-(field, term) compressed posting lists with block metadata
# (the rebuild analog of reverse_index_sorted.bin,
# /root/reference/Indexer/Program.cs:583-761; block-max layout per the
# north star).
SEGMENT_POSTINGS = pa.schema(
    [
        pa.field("field", pa.uint8()),
        pa.field("term_hash", pa.int64()),
        pa.field("df", pa.uint32()),  # local df (list length in this partition)
        pa.field("cf", pa.int64()),  # local sum of tf
        pa.field("ords", pa.large_binary()),  # varbyte deltas of local ordinals, per block
        pa.field("tfs", pa.large_binary()),  # varbyte of tf-1, per block
        pa.field("blk_first", pa.list_(pa.uint32())),  # first ordinal per block
        pa.field("blk_last", pa.list_(pa.uint32())),  # last ordinal per block
        pa.field("blk_max_tf", pa.list_(pa.uint32())),
        pa.field("blk_min_dl", pa.list_(pa.uint32())),
        pa.field("blk_off_ords", pa.list_(pa.uint32())),  # byte offset of block start in `ords`
        pa.field("blk_off_tfs", pa.list_(pa.uint32())),
    ]
)
