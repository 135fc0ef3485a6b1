from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from searchengine_ray.stages.extract import extract_text
from searchengine_ray.synth import make_pages_table


def test_invariant_on_fixture():
    """Per-row invariant (BASELINE.json input_hint): extract(html) == text,
    byte-identical per url."""
    t = make_pages_table(0, 300)
    titles, text = extract_text(t.column("html"))
    assert text.to_pylist() == t.column("text").to_pylist()
    # titles are the fixture titles (text starts with title + "\n")
    for ti, tx in zip(titles.to_pylist(), t.column("text").to_pylist()):
        assert tx.startswith(ti + "\n")


def test_fallback_path():
    html = pa.array([b"<div>no title here</div>", b"plain text"], pa.binary())
    _, text = extract_text(html)
    assert text.to_pylist() == ["no title here\n", "plain text\n"]


def test_multi_paragraph():
    html = pa.array([b"<html><head><title>T</title></head><body><p>a</p> <p>b</p></body></html>"])
    _, text = extract_text(html)
    assert text.to_pylist() == ["T\na\nb\n"]


def test_messy_html_attributes_and_fallback():
    """Round-2 hardening: attributes on <title>/<body>/<p> are tolerated by
    the fast path; rows with no title/body pair take the VECTORIZED
    whole-document tag-strip fallback (no Python row loop)."""
    import pyarrow as pa

    from searchengine_ray.stages.extract import extract_text

    rows = [
        # attributes + self-closing tags
        '<html><head><title lang="en">T1</title></head>'
        '<body class="a"><p id="x">alpha</p> <p>beta</p><br/></body></html>',
        # no <body> at all -> fallback tag strip
        "<div><span>plain</span> text <b>here</b></div>",
        # fixture shape unchanged
        "<title>T3</title><body><p>gamma</p><p>delta</p></body>",
        # empty doc
        "",
    ]
    titles, text = extract_text(pa.array([r.encode() for r in rows], pa.binary()))
    assert titles.to_pylist() == ["T1", "", "T3", ""]
    got = text.to_pylist()
    assert got[0] == "T1\nalpha\nbeta\n"      # <br/> dropped, </p><p ...> -> \n
    assert got[1] == "plain text here\n"      # fallback: strip + trailing \n
    assert got[2] == "T3\ngamma\ndelta\n"
    assert got[3] == "\n"
