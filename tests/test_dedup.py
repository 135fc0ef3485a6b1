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
        assert ham(df[3 * j], df[3 * j + 2]) <= 24  # near dup -> close
        # (one changed word in a ~13-token doc; expected hamming for
        #  UNRELATED docs is 32, so <= 24 still separates)
    # unrelated docs differ substantially
    assert ham(df[0], df[3]) > 10


def test_components_propagate_equals_unionfind(dup_dir, ray_session):
    a = (
        dd.dedup_components(dup_dir, threshold=0.5, method="propagate")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        dd.dedup_components(dup_dir, threshold=0.5, method="unionfind")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_ngram_verify_subset_of_exact(dup_dir, ray_session):
    exact = dd.ngram_jaccard_pairs(dup_dir, threshold=0.5).to_pandas()
    ver = dd.ngram_jaccard_verify(dup_dir, threshold=0.5).to_pandas()
    ex = {(int(a), int(b)): j for a, b, j in zip(exact.doc_a, exact.doc_b, exact.jaccard)}
    vv = {(int(a), int(b)): j for a, b, j in zip(ver.doc_a, ver.doc_b, ver.jaccard)}
    # verify-tier pairs are a subset of the exact pairs with IDENTICAL values
    for k, j in vv.items():
        assert ex[k] == j
    # and LSH candidates cover every exact dup pair on this corpus
    for j in range(len(BASE_DOCS)):
        assert (3 * j, 3 * j + 1) in vv


def test_minhash_fallback_budget_equivalent(dup_dir, ray_session):
    """All three signature-fetch paths return identical pairs:
    (a) broadcast est (default), (b) distributed attach with the candidate
    id filter (sig_broadcast_bytes=0), (c) distributed attach over the
    unfiltered signature table (cand_budget=0 — the >budget scale path)."""
    import pandas as pd

    fast = (
        dd.minhash_lsh_pairs(dup_dir, threshold=0.5)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    mid = (
        dd.minhash_lsh_pairs(dup_dir, threshold=0.5, sig_broadcast_bytes=0)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    slow = (
        dd.minhash_lsh_pairs(dup_dir, threshold=0.5, cand_budget=0)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, mid)
    pd.testing.assert_frame_equal(fast, slow)
    assert len(fast) > 0


def test_verify_fallback_budget_equivalent(dup_dir, ray_session):
    """pair_budget=0 forces the distributed coarse-bucket pair semi-join
    (the duplicate-heavy-crawl path where candidate pairs must never land
    on the driver); result identical to the broadcast fast path. dup_dir
    is dense: every base doc contributes exact+near duplicate pairs."""
    fast = (
        dd.ngram_jaccard_verify(dup_dir, threshold=0.5)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    slow = (
        dd.ngram_jaccard_verify(dup_dir, threshold=0.5, pair_budget=0)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(fast, slow)
    assert len(fast) >= len(BASE_DOCS)  # every exact-dup pair verified


def test_minhash_short_docs_emit_no_pairs(tmp_path, ray_session):
    """ADVICE fix: docs with < SHINGLE_K tokens must not collide via the
    all-sentinel signature."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [(0, "hi"), (1, "yo"), (2, "ok go"), (3, "the quick brown fox jumps far")]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["t"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    pairs = dd.minhash_lsh_pairs(str(tmp_path), threshold=0.5).to_pandas()
    assert len(pairs) == 0


def test_embedding_bucketed_path_matches_exact_at_high_threshold(ray_session):
    """Force the scale path (broadcast_limit=0) and compare against the
    exact broadcast path: near-identical vectors share sign buckets, so
    recall at a high threshold is ~1 on clustered data."""
    sf = "/root/testdata/sf0.001"
    exact = dd.embedding_dup_pairs(sf, threshold=0.4).to_pandas()
    # planes sized to the threshold: pairs at cos>=t have expected sign
    # hamming ~= planes * arccos(t)/pi and must land <= 2 to meet; 4 planes
    # suits t=0.4 the way the default 12 suits near-dup t~0.95
    bucketed = dd.embedding_dup_pairs(
        sf, threshold=0.4, broadcast_limit=0, planes=4
    ).to_pandas()
    ex = {(int(a), int(b)) for a, b in zip(exact.id_a, exact.id_b)}
    bu = {(int(a), int(b)) for a, b in zip(bucketed.id_a, bucketed.id_b)}
    assert bu <= ex  # no false positives: same sims, same threshold
    if ex:
        assert len(bu & ex) / len(ex) >= 0.5  # usable recall on random vectors
    # sims agree on the intersection
    exm = {(int(a), int(b)): s for a, b, s in zip(exact.id_a, exact.id_b, exact.sim)}
    bum = {(int(a), int(b)): s for a, b, s in zip(bucketed.id_a, bucketed.id_b, bucketed.sim)}
    for k in bu & ex:
        assert abs(exm[k] - bum[k]) < 1e-9


def test_skewed_duplicate_mass_capped(tmp_path, ray_session):
    """A degenerate corpus (hundreds of identical docs) must not blow up:
    per-shingle fan-out and LSH buckets are capped deterministically, the
    pipelines finish, and the surviving pairs are correct."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n_same = 300  # > MAX_BUCKET and > MAX_SHINGLE_DF
    texts = ["the quick brown fox jumps over the lazy dog again and again"] * n_same
    # letter-only variation: the tokenizer drops digits, so use distinct WORDS
    texts += [
        "filler %s %s document body with several distinct tokens %s"
        % ("w" + chr(97 + i) * 3, "x" + chr(97 + i) * 2, "z" + chr(97 + i))
        for i in range(20)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["t"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    pairs = dd.ngram_jaccard_pairs(sf, threshold=0.5).to_pandas()
    capped = dd.MAX_SHINGLE_DF
    assert len(pairs) == capped * (capped - 1) // 2  # triu of the capped prefix
    assert (pairs.jaccard == 1.0).all()
    assert pairs.doc_a.max() < capped and pairs.doc_b.max() < capped  # doc_id-order cap

    mh = dd.minhash_lsh_pairs(sf, threshold=0.5).to_pandas()
    mb = dd.MAX_BUCKET
    assert len(mh) == mb * (mb - 1) // 2
    assert (mh.est_jaccard == 1.0).all()

    comp = dd.dedup_components(sf, threshold=0.5).to_pandas().set_index("doc_id")["component_id"]
    # every doc inside the capped prefix clusters to 0; fillers are singletons
    assert (comp.loc[range(capped)] == 0).all()
    assert (comp.loc[range(n_same, n_same + 20)] == list(range(n_same, n_same + 20))).all()


def test_dup_window_stats_crafted(tmp_path, ray_session):
    """Window duplication at 5-gram granularity: hand-computable cases."""
    rows = [
        # 1 and 2 identical, 8 tokens -> 4 windows each, all duplicated
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
        # shares ONE 5-gram with 1/2 (first five tokens), rest unique
        (3, "alpha beta gamma delta epsilon quux corge grault"),
        # internal repetition only: "x y x y x y x y" has windows
        # (xyxyx, yxyxy, xyxyx, yxyxy) -> every window duplicated IN-DOC
        (4, "x y x y x y x y"),
        # too short for any window
        (5, "just four tokens here"),
        (6, ""),
        # unique 5 tokens -> 1 window, not duplicated
        (7, "uno dos tres cuatro cinco"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["t"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = dd.dup_window_stats(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[1].tolist() == [4, 4, 1.0]
    assert out.loc[2].tolist() == [4, 4, 1.0]
    assert out.loc[3].tolist() == [4, 1, 0.25]
    assert out.loc[4].tolist() == [4, 4, 1.0]
    assert out.loc[5].tolist() == [0, 0, 0.0]
    assert out.loc[6].tolist() == [0, 0, 0.0]
    assert out.loc[7].tolist() == [1, 0, 0.0]


def test_decontaminate_flags_benchmark_overlap(ray_session, tmp_path):
    """A training doc copying a benchmark doc's text (doc_id % 97 == 0) is
    contaminated; an unrelated doc is not; benchmark docs are excluded
    from the output; short (<5-token) docs are clean by construction."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.dedup import decontaminate

    bench_text = "alpha beta gamma delta epsilon zeta eta"
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    bench_text,  # benchmark (0 % 97 == 0)
                    "totally different words here nothing shared at all",
                    "prefix words then " + bench_text,  # contains bench 5-grams
                    "tiny doc",  # < 5 tokens -> no shingles
                ]
            ),
        }
    )
    d = str(tmp_path)
    pq.write_table(tbl, f"{d}/documents.parquet")
    out = decontaminate(d).to_pandas().set_index("doc_id").sort_index()
    assert list(out.index) == [1, 2, 3]  # benchmark doc excluded
    assert not out.loc[1, "contaminated"]
    assert out.loc[2, "contaminated"] and out.loc[2, "n_overlap"] == 3
    assert out.loc[3, "n_shingles"] == 0 and not out.loc[3, "contaminated"]


def test_strip_dup_spans_crafted(ray_session, tmp_path):
    """ExactSubstr policy semantics on crafted docs: (a) two docs sharing a
    5-gram lose BOTH copies plus every position the window covers; (b) a
    doc with no duplicated window is untouched; (c) a doc shorter than the
    window passes through; (d) in-doc repetition (same 5-gram twice in one
    doc) strips both occurrences."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.dedup import strip_dup_spans

    shared = "alpha beta gamma delta epsilon"
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    f"one two {shared} three four",
                    f"five six {shared} seven eight",
                    "nothing duplicated in here at all really truly",
                    "tiny doc",
                    f"{shared} pad {shared}",  # in-doc repeat
                ]
            ),
        }
    )
    d = str(tmp_path)
    pq.write_table(tbl, f"{d}/documents.parquet")
    out = strip_dup_spans(d).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[1, "text_clean"] == "one two three four"
    assert out.loc[1, "n_removed"] == 5
    assert out.loc[2, "text_clean"] == "five six seven eight"
    assert out.loc[3, "n_removed"] == 0
    assert out.loc[3, "text_clean"] == "nothing duplicated in here at all really truly"
    assert out.loc[4, "text_clean"] == "tiny doc" and out.loc[4, "n_removed"] == 0
    assert out.loc[5, "text_clean"] == "pad" and out.loc[5, "n_removed"] == 10


def test_canonical_representatives(dup_dir, ray_session):
    out = dd.dedup_canonical(dup_dir, threshold=0.5).to_pandas()
    assert len(out) == out["doc_id"].nunique()  # one row per doc
    # exactly one keeper per component
    per = out.groupby("component_id")["keep"].sum()
    assert (per == 1).all()
    # within each component the keeper has the max token count, tie -> min id
    for _, grp in out.groupby("component_id"):
        grp = grp.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
        keeper = grp.iloc[0]["doc_id"]
        assert set(grp[grp["keep"]]["doc_id"]) == {keeper}
    # singleton fillers are all kept
    comp_sizes = out.groupby("component_id")["doc_id"].count()
    singles = comp_sizes[comp_sizes == 1].index
    assert out[out["component_id"].isin(singles)]["keep"].all()


def test_incremental_flags_corpus_dups(dup_dir, ray_session):
    out = (
        dd.dedup_incremental(dup_dir, mod=2)
        .to_pandas()
        .set_index("doc_id")["is_dup_of_corpus"]
    )
    # only new (odd) docs are reported
    assert all(i % 2 == 1 for i in out.index)
    # each exact-dup pair (3j, 3j+1) spans the old/new split: whichever
    # member is odd must be flagged as already-in-corpus
    flagged = 0
    for j in range(len(BASE_DOCS)):
        for cand in (3 * j, 3 * j + 1):
            if cand % 2 == 1:
                assert out[cand], cand
                flagged += 1
    assert flagged >= len(BASE_DOCS)
    # near-dups (one word changed) are NOT exact dups: never flagged
    for j in range(len(BASE_DOCS)):
        nd = 3 * j + 2
        if nd % 2 == 1:
            assert not out[nd]


def test_decontaminate_fallback_budget_equivalent(dup_dir, ray_session):
    """bench_budget=0 forces the distributed coarse-bucket shingle
    semi-join (the corpus-fraction-benchmark path where the bench shingle
    set must never land on the driver); identical output to the broadcast
    fast path, including zero-shingle training docs."""
    import pandas as pd

    fast = (
        dd.decontaminate(dup_dir)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    slow = (
        dd.decontaminate(dup_dir, bench_budget=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, slow)
    assert len(fast) > 0


def test_verify_id_allowlist_fallback_equivalent(dup_dir, ray_session):
    """id_budget=0 forces the allowlist to stay a Dataset (distributed
    doc-bucket semi-join into the exact tier) — the duplicate-saturated
    crawl path where even the doc-id union must not land on the driver;
    result identical to the broadcast allowlist."""
    import pandas as pd

    fast = (
        dd.ngram_jaccard_verify(dup_dir, threshold=0.5)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    slow = (
        dd.ngram_jaccard_verify(dup_dir, threshold=0.5, id_budget=0)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, slow)
    assert len(fast) >= len(BASE_DOCS)


def test_similar_docs_multifile_dir(tmp_path, ray_session):
    """similar_docs must not read the documents table through a single
    driver-side file read: the same corpus split across a documents.parquet
    DIRECTORY of part files yields identical results (the query shingle
    table is built by a distributed scan; round-4 verdict ask #1)."""
    import pandas as pd

    texts = {
        0: "the quick brown fox jumps over the lazy dog near the river",
        1: "the quick brown fox jumps over the lazy dog near the shore",
        2: "vector embeddings capture semantic similarity between long documents",
        3: "spark streams shuffle large batches of rows through memory",
        101: "vector embeddings capture semantic similarity between short documents",
        102: "window functions aggregate values over ordered partitions today",
    }

    def tbl(ids):
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[i] for i in ids], pa.string()),
                "lang": pa.array(["en"] * len(ids), pa.string()),
                "source": pa.array(["t"] * len(ids), pa.string()),
                "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
            }
        )

    single = tmp_path / "single"
    single.mkdir()
    pq.write_table(tbl(sorted(texts)), str(single / "documents.parquet"))

    multi = tmp_path / "multi"
    (multi / "documents.parquet").mkdir(parents=True)
    pq.write_table(tbl([0, 1, 2]), str(multi / "documents.parquet" / "part-0.parquet"))
    pq.write_table(tbl([3, 101, 102]), str(multi / "documents.parquet" / "part-1.parquet"))

    a = (
        dd.similar_docs(str(single), k=3)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    b = (
        dd.similar_docs(str(multi), k=3)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # queries 0 and 101 both exist and 0's top hit is its near-dup 1
    assert set(a["query_id"]) == {0, 101}
    top0 = a[(a.query_id == 0) & (a["rank"] == 1)]["doc_id"].iloc[0]
    assert top0 == 1


def test_ngram_novelty_crafted(tmp_path, ray_session):
    """First-seen shingles belong to the min doc_id: a verbatim copy of an
    earlier doc scores novelty 0, the original 1e6, a half-copied doc in
    between; short docs (< 3 tokens) are absent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    a = "alpha beta gamma delta epsilon zeta"
    b = "eta theta iota kappa"
    rows = [
        (0, a),                       # original: all shingles first-seen
        (1, a),                       # verbatim copy -> novelty 0
        (2, b + " " + a),             # prefix fresh, suffix stale
        (3, "hi"),                    # < 3 tokens -> no row
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["t"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = (
        dd.ngram_novelty(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [0, 1, 2]
    assert out.loc[0, "n_shingles"] == 4 and out.loc[0, "novelty_e6"] == 1_000_000
    assert out.loc[1, "n_stale"] == 4 and out.loc[1, "novelty_e6"] == 0
    # doc 2: 10 tokens -> 8 shingles; the 4 shingles fully inside the "a"
    # suffix are stale (first seen in doc 0), the 2 bridge shingles and the
    # 2 b-only shingles are fresh
    assert out.loc[2, "n_shingles"] == 8 and out.loc[2, "n_stale"] == 4
    assert out.loc[2, "novelty_e6"] == 500_000
