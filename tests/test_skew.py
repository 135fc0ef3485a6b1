"""Skew stress: corpora engineered to break naive partitioning.

The doc-bucketed layout must keep partitions uniform even when a single
term dominates the collection (the 'salted hot posting list' concern in
the north rule) and when document lengths are wildly skewed."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from searchengine_ray.pipelines.build import BuildConfig, build_index
from searchengine_ray.schemas import FIELD_BODY, PAGES
from searchengine_ray.state.shards import Lexicon, LocalIndex, make_term_specs


def _pages(rows):
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([0] * len(rows), pa.timestamp("us")),
            "html": pa.array([r[1].encode() for r in rows], pa.binary()),
            "text": pa.array([r[2] for r in rows], pa.large_string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        },
        schema=PAGES,
    )


def test_hot_term_in_every_doc(tmp_path, ray_session):
    """'stopword' appears ~50x in EVERY doc — a term-partitioned layout
    would put its whole posting list (== the whole corpus) in one
    partition; doc-bucketing must stay uniform."""
    g = np.random.default_rng(3)
    rows = []
    for i in range(1200):
        body = " ".join(["stopword"] * 50 + [f"uniq{i}x"] + list(g.choice(["aa", "bb", "cc"], 10)))
        html = f"<html><head><title>t{i}</title></head><body><p>{body}</p></body></html>"
        rows.append((f"u://{i}", html, f"t{i}\n{body}\n"))
    pq.write_table(_pages(rows), str(tmp_path / "p.parquet"))
    idx = str(tmp_path / "idx")
    m = build_index(str(tmp_path), idx, BuildConfig(num_partitions=8), source="pages")
    seg = m["segments"]
    mean = seg["n_postings"] / seg["n_parts_built"]
    assert seg["max_part_postings"] < 1.35 * mean
    assert seg["min_part_postings"] > 0.65 * mean
    # the hot term is queryable and df == N
    index = LocalIndex(idx)
    lex = Lexicon(idx)
    specs = make_term_specs("stopword", lex, index.n_docs, (FIELD_BODY,), "bm25")
    docs, scores = index.topk(specs, 10)
    assert len(docs) == 10
    # df(stopword) == every doc
    from searchengine_ray.functions.hashing import hash64

    df, cf = lex.get(FIELD_BODY, hash64("stopword"))
    assert df == 1200 and cf == 1200 * 50


def test_doc_length_skew(tmp_path, ray_session):
    """One megadoc (50k tokens) among tiny docs — partitions stay bounded
    because a doc's postings are list-of-DISTINCT-terms, and the build
    must not choke on the outlier."""
    g = np.random.default_rng(4)
    # letters-only vocab (digits would split under the reference tokenizer)
    L = "abcdefghijklmnopqrstuvwxyz"
    vocab = ["w" + L[j // 676] + L[(j // 26) % 26] + L[j % 26] for j in range(3000)]
    rows = []
    mega = " ".join(g.choice(vocab, 50_000))
    rows.append(("u://mega", f"<html><head><title>m</title></head><body><p>{mega}</p></body></html>", f"m\n{mega}\n"))
    for i in range(300):
        body = " ".join(g.choice(vocab, 20))
        rows.append((f"u://{i}", f"<html><head><title>t{i}</title></head><body><p>{body}</p></body></html>", f"t{i}\n{body}\n"))
    pq.write_table(_pages(rows), str(tmp_path / "p.parquet"))
    idx = str(tmp_path / "idx")
    m = build_index(str(tmp_path), idx, BuildConfig(num_partitions=4), source="pages")
    assert m["n_docs"] == 301
    # the megadoc ranks first for a term it saturates (high tf, but bm25
    # length-normalizes; just assert it's retrievable and scores are finite)
    index = LocalIndex(idx)
    lex = Lexicon(idx)
    specs = make_term_specs(vocab[0], lex, index.n_docs, (FIELD_BODY,), "bm25")
    docs, scores = index.topk(specs, 5)
    assert len(docs) > 0 and np.isfinite(scores).all()


def test_hot_term_90pct(tmp_path, ray_session):
    """Round-4 regression twin of scripts/skew_stress.py: one term with
    tf=20 in 90% of docs (measured at 1M docs: spread ±1.4%, BASELINE.md).
    At this scale (10k docs, P=8) hash noise dominates the skew itself;
    ±10% bounds it with margin while still failing hard if the layout ever
    regresses to term-partitioning (hot partition would be ~5x mean)."""
    g = np.random.default_rng(11)
    L = "abcdefghijklmnopqrstuvwxyz"
    vocab = ["w" + L[j // 676] + L[(j // 26) % 26] + L[j % 26] for j in range(2000)]
    rows = []
    for i in range(10_000):
        body = " ".join(g.choice(vocab, 12))
        if i % 10 < 9:  # hot term in 90% of docs, tf=20
            body = " ".join(["stopword"] * 20) + " " + body
        html = f"<html><head><title>t{i}</title></head><body><p>{body}</p></body></html>"
        rows.append((f"u://{i}", html, f"t{i}\n{body}\n"))
    pq.write_table(_pages(rows), str(tmp_path / "p.parquet"))
    idx = str(tmp_path / "idx")
    m = build_index(str(tmp_path), idx, BuildConfig(num_partitions=8), source="pages")
    seg = m["segments"]
    mean = seg["n_postings"] / seg["n_parts_built"]
    assert seg["max_part_postings"] < 1.10 * mean, seg
    assert seg["min_part_postings"] > 0.90 * mean, seg
