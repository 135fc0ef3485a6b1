"""Dedup operators on a corpus with INJECTED duplicates (the testdata
documents table has none, so these tests synthesize their own sf_dir)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.pipelines import dedup as dd

BASE_DOCS = [
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "spark streams shuffle large batches of rows through columnar memory quickly",
    "a search engine builds an inverted index from tokens and posting lists",
    "vector embeddings capture semantic similarity between documents and queries",
    "window functions aggregate values over ordered partitions of event data",
]


@pytest.fixture(scope="module")
def dup_dir(tmp_path_factory):
    """documents.parquet with: exact dup pairs, near-dup pairs (one word
    changed), and unique filler docs."""
    d = tmp_path_factory.mktemp("dupdata")
    rows = []
    i = 0
    for base in BASE_DOCS:
        rows.append((i, base)); i += 1
        rows.append((i, base)); i += 1  # exact duplicate
        words = base.split()
        words[3] = "CHANGED"
        rows.append((i, " ".join(words))); i += 1  # near duplicate
    g = np.random.default_rng(5)
    vocab = sorted({w for b in BASE_DOCS for w in b.split()})
    for _ in range(30):  # unique filler
        rows.append((i, " ".join(g.choice(vocab, 12)))); i += 1
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["t"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_exact_duplicates(dup_dir, ray_session):
    df = dd.exact_duplicates(dup_dir).to_pandas().sort_values("doc_id")
    # each base doc: rows 3j (canonical), 3j+1 (exact dup), 3j+2 (near dup = canonical of itself)
    for j in range(len(BASE_DOCS)):
        assert bool(df[df.doc_id == 3 * j].is_canonical.iloc[0]) is True
        assert bool(df[df.doc_id == 3 * j + 1].is_canonical.iloc[0]) is False
        assert bool(df[df.doc_id == 3 * j + 2].is_canonical.iloc[0]) is True
    assert df.is_canonical.sum() == len(df) - len(BASE_DOCS)


def test_minhash_finds_exact_and_near(dup_dir, ray_session):
    pairs = dd.minhash_lsh_pairs(dup_dir, threshold=0.5).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    for j in range(len(BASE_DOCS)):
        assert (3 * j, 3 * j + 1) in got  # exact dup always collides
    # exact dups estimate jaccard 1.0
    full = pairs[(pairs.doc_a % 3 == 0) & (pairs.doc_b == pairs.doc_a + 1)]
    assert (full.est_jaccard == 1.0).all()


def test_ngram_jaccard_verifies(dup_dir, ray_session):
    pairs = dd.ngram_jaccard_pairs(dup_dir, threshold=0.5).to_pandas()
    got = {(int(a), int(b)): j for a, b, j in zip(pairs.doc_a, pairs.doc_b, pairs.jaccard)}
    for j in range(len(BASE_DOCS)):
        assert got.get((3 * j, 3 * j + 1)) == 1.0  # exact dup -> true jaccard 1
    # near dup pairs (word changed) have 0.5 <= J < 1 when they survive
    for (a, b), jac in got.items():
        assert 0.5 <= jac <= 1.0


def test_components(dup_dir, ray_session):
    comp = dd.dedup_components(dup_dir, threshold=0.5).to_pandas().set_index("doc_id")[
        "component_id"
    ]
    for j in range(len(BASE_DOCS)):
        # exact dup joins its canonical's component (id = min of cluster)
        assert comp[3 * j + 1] == comp[3 * j] == 3 * j
    # filler docs are singletons
    fillers = [i for i in comp.index if i >= 3 * len(BASE_DOCS)]
    assert all(comp[i] == i for i in fillers)


def test_simhash_near_dup_hamming(dup_dir, ray_session):
    df = dd.simhash(dup_dir).to_pandas().set_index("doc_id")["simhash"]

    def ham(a, b):
        return bin((int(a) ^ int(b)) & 0xFFFFFFFFFFFFFFFF).count("1")

    for j in range(len(BASE_DOCS)):
        assert ham(df[3 * j], df[3 * j + 1]) == 0  # exact dup -> same simhash
        assert ham(df[3 * j], df[3 * j + 2]) <= 16  # near dup -> close
    # unrelated docs differ substantially
    assert ham(df[0], df[3]) > 10
