"""HTML -> text extraction (reference analog: taking the raw <text> element
of a ns==0 page and appending "\\n", /root/reference/Indexer/Repository/Program.cs:128-143).

The rebuild's per-row invariant (BASELINE.json input_hint): the extracted
text must be BYTE-IDENTICAL to the golden `text` column per url. The fast
path is a single RE2 kernel over the whole Arrow batch; rows that don't
match the title/body shape fall back to a per-row tag-strip (rare by
construction).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# Fast path: <title>..</title> anywhere, then the <body> payload.
_EXTRACT_PATTERN = r"(?s)<title>(?P<title>.*?)</title>.*?<body>(?P<body>.*)</body>"
_P_BOUNDARY = re.compile(r"</p>\s*<p>")
_TAG = re.compile(r"(?s)<[^>]*>")


def _strip_body(body_html: str) -> str:
    """Paragraph boundaries -> newlines, then drop remaining tags."""
    return _TAG.sub("", _P_BOUNDARY.sub("\n", body_html))


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
    bodies = pc.replace_substring_regex(bodies, pattern=r"</p>\s*<p>", replacement="\n")
    bodies = pc.replace_substring_regex(bodies, pattern=r"(?s)<[^>]*>", replacement="")
    # join([title, body, ""], sep="\n") == title + "\n" + body + "\n"
    text = pc.binary_join_element_wise(titles, bodies, pa.scalar(""), "\n")
    # Fallback for rows the fast path missed (no <title>/<body> pair).
    if titles.null_count > 0:
        t_list = titles.to_pylist()
        x_list = text.to_pylist()
        raw = as_str.to_pylist()
        for i, t in enumerate(t_list):
            if t is None:
                stripped = _TAG.sub("", raw[i])
                t_list[i] = ""
                x_list[i] = stripped + "\n"
        titles = pa.array(t_list, pa.string())
        text = pa.array(x_list, pa.string())
    return titles, text.cast(pa.large_string())
