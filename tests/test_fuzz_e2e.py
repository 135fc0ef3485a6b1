"""Randomized end-to-end: random tiny corpora -> full build -> every query
mode compared against the brute-force oracle. Catch-all for interactions
the targeted tests miss (weird token mixes, tiny partitions, tf extremes).
Seeds are fixed -> deterministic."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.functions.hashing import hash64
from searchengine_ray.oracle import brute_phrase_topk, brute_topk, build_brute_index
from searchengine_ray.pipelines.build import BuildConfig, build_index
from searchengine_ray.schemas import FIELD_BODY, FIELD_TITLE, PAGES
from searchengine_ray.state.shards import Lexicon, LocalIndex, make_term_specs

VOCAB = (
    "alpha beta gamma delta epsilon zeta the of and a to in on "
    "abcdefghijklmnopqrst x y zz"
).split()
EDGE = ["naïve", "abcdefghijklmnopqrstu", "Mixed-CASE", "don't", "12345", "..."]


def _random_corpus(seed: int, n_docs: int):
    g = np.random.default_rng(seed)
    rows = []
    for i in range(n_docs):
        n_title = int(g.integers(1, 4))
        n_body = int(g.integers(3, 60))
        title_words = list(g.choice(VOCAB, n_title))
        body_words = list(g.choice(VOCAB, n_body))
        # sprinkle edge tokens
        for _ in range(int(g.integers(0, 3))):
            body_words.insert(int(g.integers(0, len(body_words) + 1)), EDGE[int(g.integers(0, len(EDGE)))])
        # occasional pathological repeats (tf spikes)
        if g.random() < 0.2:
            body_words += [body_words[0]] * int(g.integers(5, 40))
        title = " ".join(title_words)
        body = " ".join(body_words)
        html = (
            "<html><head><title>" + title + "</title></head><body><p>" + body + "</p></body></html>"
        ).encode()
        rows.append((f"u://{seed}/{i}", html, title + "\n" + body + "\n", "en"))
    return rows


def _random_queries(seed: int, n: int):
    g = np.random.default_rng(seed + 1)
    qs = []
    pool = VOCAB + EDGE + ["missingword"]
    for _ in range(n):
        words = list(g.choice(pool, int(g.integers(1, 5))))
        if g.random() < 0.3:
            words.append(words[0])
        qs.append(" ".join(words))
    return qs


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_fuzz_rank_identity(seed, tmp_path, ray_session):
    rows = _random_corpus(seed, 150)
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([0] * len(rows), pa.timestamp("us")),
            "html": pa.array([r[1] for r in rows], pa.binary()),
            "text": pa.array([r[2] for r in rows], pa.large_string()),
            "lang": pa.array([r[3] for r in rows], pa.string()),
        },
        schema=PAGES,
    )
    pq.write_table(t, str(tmp_path / "pages.parquet"))
    idx_dir = str(tmp_path / "idx")
    build_index(str(tmp_path), idx_dir, BuildConfig(num_partitions=3, block_size=16, store_positions=True), source="pages")

    brute = build_brute_index(
        [(hash64(r[0]), r[2], r[2].split("\n", 1)[0] + "\n") for r in rows]
    )
    index = LocalIndex(idx_dir)
    lex = Lexicon(idx_dir)

    for q in _random_queries(seed, 25):
        for mode, fields in (("bm25", (FIELD_BODY, FIELD_TITLE)), ("bm25", (FIELD_BODY,)), ("reference", (FIELD_BODY, FIELD_TITLE))):
            specs = make_term_specs(q, lex, index.n_docs, fields, mode)
            got_d, got_s = index.topk(specs, 10, mode)
            want = brute_topk(brute, q, k=10, mode=mode, fields=fields)
            assert got_d.tolist() == [d for d, _ in want], (q, mode, fields)
            assert got_s.tolist() == [s for _, s in want], (q, mode, fields)
        # bmw (single field) and conjunctive
        specs_b = make_term_specs(q, lex, index.n_docs, (FIELD_BODY,), "bm25")
        d1, s1 = index.topk(specs_b, 10, "bm25", algo="bmw")
        want_b = brute_topk(brute, q, k=10, mode="bm25", fields=(FIELD_BODY,))
        assert d1.tolist() == [d for d, _ in want_b], (q, "bmw")
        dc, sc = index.topk(specs_b, 10, "bm25", conjunctive=True)
        want_c = brute_topk(brute, q, k=10, mode="bm25", fields=(FIELD_BODY,), conjunctive=True)
        assert dc.tolist() == [d for d, _ in want_c], (q, "conjunctive")
        assert sc.tolist() == [s for _, s in want_c], (q, "conjunctive scores")

    # phrase queries: random 2-3 word phrases vs the phrase oracle
    g = np.random.default_rng(seed + 7)
    for _ in range(15):
        words = list(g.choice(VOCAB, int(g.integers(2, 4))))
        phrase = " ".join(words)
        specs = make_term_specs(phrase, lex, index.n_docs, (FIELD_BODY,), "bm25")
        if len(specs) < len(set(words)):
            continue  # engine API requires all words known (coordinator filters)
        got_d, got_s = index.phrase_topk(words, specs, 10, FIELD_BODY)
        want = brute_phrase_topk(brute, phrase, k=10, field=FIELD_BODY)
        assert got_d.tolist() == [d for d, _ in want], (phrase, "phrase")
        assert got_s.tolist() == [s for _, s in want], (phrase, "phrase scores")
        # ordered proximity at a random slop
        slop = int(g.integers(1, 4))
        gd, gs = index.phrase_topk(words, specs, 10, FIELD_BODY, slop=slop)
        ws = brute_phrase_topk(brute, phrase, k=10, field=FIELD_BODY, slop=slop)
        assert gd.tolist() == [d for d, _ in ws], (phrase, slop, "slop")
        assert gs.tolist() == [s for _, s in ws], (phrase, slop, "slop scores")
