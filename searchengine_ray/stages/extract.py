"""HTML -> text extraction (reference analog: taking the raw <text> element
of a ns==0 page and appending "\\n", /root/reference/Indexer/Repository/Program.cs:128-143).

The rebuild's per-row invariant (BASELINE.json input_hint): the extracted
text must be BYTE-IDENTICAL to the golden `text` column per url. Both
paths are single RE2 kernels over the whole Arrow batch:

- fast path: <title ...>..</title> then a <body ...> payload (attributes
  and self-closing tags tolerated); paragraph boundaries become newlines,
  remaining tags are dropped.
- fallback (rows without a title/body pair — arbitrary web HTML): a
  vectorized whole-document tag strip over JUST the missed rows
  (filter -> kernel -> replace_with_mask); no per-row Python loop.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Fast path: <title ...>..</title> anywhere, then the <body ...> payload.
_EXTRACT_PATTERN = (
    r"(?s)<title[^>]*>(?P<title>.*?)</title>.*?<body[^>]*>(?P<body>.*)</body>"
)
_TAG_PATTERN = r"(?s)<[^>]*>"


def extract_text(html: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, pa.Array]:
    """Extract (title, text) from an html binary column, vectorized.

    text := title + "\\n" + stripped_body + "\\n"  (the reference appends
    "\\n" to both titles and contents, Repository/Program.cs:131,137).
    """
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    as_str = html.cast(pa.string())
    parts = pc.extract_regex(as_str, pattern=_EXTRACT_PATTERN)
    titles = pc.struct_field(parts, "title")
    bodies = pc.struct_field(parts, "body")
    # Vectorized body strip: </p><p> -> \n, then remove tags.
    bodies = pc.replace_substring_regex(bodies, pattern=r"</p>\s*<p[^>]*>", replacement="\n")
    bodies = pc.replace_substring_regex(bodies, pattern=_TAG_PATTERN, replacement="")
    # join([title, body, ""], sep="\n") == title + "\n" + body + "\n"
    text = pc.binary_join_element_wise(titles, bodies, pa.scalar(""), "\n")
    # Fallback for rows the fast path missed (no <title>/<body> pair):
    # whole-document tag strip + "\n", computed ONLY over the missed rows
    # and scattered back — same RE2 kernels, no Python row loop.
    if titles.null_count > 0:
        miss = pc.is_null(titles)
        sub = as_str.filter(miss)
        stripped = pc.replace_substring_regex(sub, pattern=_TAG_PATTERN, replacement="")
        fb_text = pc.binary_join_element_wise(stripped, pa.scalar(""), "\n")
        empty = pa.nulls(len(sub), pa.string()).fill_null("")
        titles = pc.replace_with_mask(titles, miss, empty)
        text = pc.replace_with_mask(text, miss, fb_text)
    return titles, text.cast(pa.large_string())
