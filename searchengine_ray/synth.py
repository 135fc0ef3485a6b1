"""Deterministic synthetic fixtures (FIXTURES.md §1-2).

Generates the Common-Crawl-style `pages` table mandated by
BASELINE.json's input_hint and a `queries` table, fully determined by
(row index, seed) — independent of file split and parallelism, so golden
outputs are stable and a bench corpus can be generated in parallel.

Content is Zipf(s=1.1) over a 10,000-term vocabulary so head-term skew is
real at every scale (the reference's Wikipedia corpus has the same shape).
Edge-token rows exercise the tokenizer's reference semantics
(/root/reference/Indexer/Program.cs:97-121).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schemas import PAGES

SEED = 42
VOCAB_SIZE = 10_000
ZIPF_S = 1.1
EDGE_EVERY = 997  # rows i with i % EDGE_EVERY == 0 get the edge-token suffix
EDGE_SUFFIX = (
    "naïve abcdefghijklmnopqrstu abcdefghijklmnopqrst Mixed-CASE don't 12345 ... endtoken"
)

_LETTERS = "abcdefghijklmnopqrstuvwxyz"


def _word(i: int) -> str:
    """Purely alphabetic vocab word (digits are not letters, so a vocab like
    'w0042' would collapse to the single token 'w' under the reference
    tokenizer — the vocab must survive tokenization unchanged)."""
    return "t" + _LETTERS[i // 676] + _LETTERS[(i // 26) % 26] + _LETTERS[i % 26]


VOCAB = np.array([_word(i) for i in range(VOCAB_SIZE)])
# Zipf inverse-CDF table (shared, deterministic).
_weights = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1, dtype=np.float64), ZIPF_S)
_CDF = np.cumsum(_weights / _weights.sum())


def _row(i: int) -> tuple[str, str, str, str]:
    """(title, body, lang, url) for row i — pure function of i."""
    g = np.random.Generator(np.random.PCG64(SEED * (2**32) + i))
    n_title = int(g.integers(2, 9))
    n_body = int(g.integers(50, 401))
    title_idx = np.searchsorted(_CDF, g.random(n_title))
    body_idx = np.searchsorted(_CDF, g.random(n_body))
    title = " ".join(VOCAB[title_idx])
    body = " ".join(VOCAB[body_idx])
    if i % EDGE_EVERY == 0:
        body = body + " " + EDGE_SUFFIX
    r = g.random()
    lang = "en" if r < 0.95 else ("de" if r < 0.975 else "xx")
    url = f"https://example.org/wiki/Doc_{i:08d}"
    return title, body, lang, url


def make_pages_table(start: int, stop: int) -> pa.Table:
    """Rows [start, stop) of the pages fixture as one Arrow table."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    base_ts = np.datetime64("2026-01-01T00:00:00", "us")
    for i in range(start, stop):
        title, body, lang, url = _row(i)
        urls.append(url)
        tss.append(base_ts + np.timedelta64(i, "s"))
        htmls.append(
            (
                "<html><head><title>"
                + title
                + "</title></head><body><p>"
                + body
                + "</p></body></html>"
            ).encode("utf-8")
        )
        texts.append(title + "\n" + body + "\n")
        langs.append(lang)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES,
    )


def write_pages(out_dir: str, n_rows: int, n_files: int = 8, parallel: bool = True) -> str:
    """Write the pages fixture as multi-file Parquet; returns out_dir.

    Idempotent: skips generation when the directory already holds the
    expected files (a _SYNTH_DONE marker records n_rows/n_files).
    """
    marker = os.path.join(out_dir, "_SYNTH_DONE")
    tag = f"v2:{n_rows}:{n_files}:{SEED}"  # bump v on any content-model change
    if os.path.exists(marker) and open(marker).read().strip() == tag:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    # a mismatched marker means a DIFFERENT (n_rows, n_files, version)
    # layout lives here: regenerating in place would leave the old layout's
    # extra part files behind (measured: a 32-file 2000-row dir rewritten
    # as 4 files kept parts 4..31 -> a 3750-row corpus with duplicate urls
    # that silently broke BM25 rank-identity). Clear the old layout first.
    if os.path.exists(marker):
        os.remove(marker)
    for f in os.listdir(out_dir):
        if f.startswith("part-") and f.endswith(".parquet"):
            os.remove(os.path.join(out_dir, f))
    bounds = np.linspace(0, n_rows, n_files + 1, dtype=np.int64)
    spans = [(int(bounds[k]), int(bounds[k + 1]), os.path.join(out_dir, f"part-{k:04d}.parquet"))
             for k in range(n_files) if bounds[k] < bounds[k + 1]]
    if parallel and n_rows >= 20_000:
        import ray

        @ray.remote
        def _gen(start: int, stop: int, path: str) -> None:
            pq.write_table(make_pages_table(start, stop), path)

        ray.get([_gen.remote(*s) for s in spans])
    else:
        for start, stop, path in spans:
            pq.write_table(make_pages_table(start, stop), path)
    with open(marker, "w") as f:
        f.write(tag)
    return out_dir


QUERY_SEED = 43
N_QUERIES = 200
_OOV = ["zzzzunknown", "naïve", "abcdefghijklmnopqrstuvwxyz", "Éclair"]


def make_queries_table(n_queries: int = N_QUERIES) -> pa.Table:
    """Reference query set (FIXTURES.md §2): head/mid/tail terms, repeats
    (multiplicity weighting, /root/reference/Engine/Engine/Engine.cs:128-139),
    OOV and non-ASCII words that must contribute zero."""
    g = np.random.Generator(np.random.PCG64(QUERY_SEED))
    rows = []
    for qid in range(n_queries):
        n_terms = int(g.integers(1, 6))
        words = []
        for _ in range(n_terms):
            bucket = g.random()
            if bucket < 0.35:
                words.append(VOCAB[int(g.integers(0, 10))])
            elif bucket < 0.70:
                words.append(VOCAB[int(g.integers(10, 1000))])
            elif bucket < 0.90:
                words.append(VOCAB[int(g.integers(1000, VOCAB_SIZE))])
            else:
                words.append(_OOV[int(g.integers(0, len(_OOV)))])
        if n_terms >= 2 and g.random() < 0.3:  # force a repeated term
            words.append(words[0])
        rows.append((qid, " ".join(words), 10))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "query": pa.array([r[1] for r in rows], pa.string()),
            "k": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
