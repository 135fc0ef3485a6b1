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
