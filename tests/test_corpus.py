"""Corpus-statistics operators on crafted inputs: exact repetition fractions,
n-gram counts, PMI ordering, TF-IDF ranks. DuckDB parity over the sf fixture
is covered by tests/test_contract.py; these pin the SEMANTICS on inputs where
the expected values are hand-computable."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from searchengine_ray.pipelines import corpus


def _write_documents(tmp_path, rows):
    """rows: (doc_id, text)."""
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["t"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_repetition_scores_crafted(tmp_path, ray_session):
    rows = [
        # "a b a b a b": bigrams = ab,ba,ab,ba,ab -> n=5, top(ab)=3
        # trigrams = aba,bab,aba,bab -> 4 occurrences, 2 distinct -> dup 2/4
        (1, "a b a b a b"),
        # all-distinct tokens: every bigram/trigram unique
        (2, "alpha beta gamma delta"),
        # single token: no bigrams, no trigrams -> zeros
        (3, "solo"),
        # empty text
        (4, ""),
        # same token repeated: one distinct bigram/trigram
        (5, "x x x x"),
    ]
    d = _write_documents(tmp_path, rows)
    out = (
        corpus.repetition_scores(d).to_pandas().sort_values("doc_id").set_index("doc_id")
    )
    assert out.loc[1, "n_bigrams"] == 5
    assert out.loc[1, "top_bigram_frac"] == 0.6
    assert out.loc[1, "dup_trigram_frac"] == 0.5
    assert out.loc[2, "n_bigrams"] == 3
    assert out.loc[2, "top_bigram_frac"] == np.floor(1 / 3 * 1e6 + 0.5) / 1e6
    assert out.loc[2, "dup_trigram_frac"] == 0.0
    assert (out.loc[[3, 4]][["n_bigrams", "top_bigram_frac", "dup_trigram_frac"]] == 0).all().all()
    assert out.loc[5, "n_bigrams"] == 3
    assert out.loc[5, "top_bigram_frac"] == 1.0  # "x x" is every bigram
    assert out.loc[5, "dup_trigram_frac"] == 0.5  # 2 occurrences, 1 distinct


def test_ngram_counts_crafted(tmp_path, ray_session):
    rows = [
        (1, "a b c"),
        (2, "a b"),
        (3, "b c a b"),
    ]
    d = _write_documents(tmp_path, rows)
    out = corpus.ngram_counts(d, k=10).to_pandas()
    got = list(zip(out["ngram"], out["count"]))
    # counts: "a b" x3, "b c" x2, "c a" x1; order (count desc, ngram asc)
    assert got == [("a b", 3), ("b c", 2), ("c a", 1)]
    # k truncates in the same order
    out1 = corpus.ngram_counts(d, k=1).to_pandas()
    assert list(zip(out1["ngram"], out1["count"])) == [("a b", 3)]


def test_bigram_pmi_crafted(tmp_path, ray_session):
    # "zq xw" always co-occur (pointwise surprise high); "the cat" with
    # 'the' everywhere scores lower. min_count=2 keeps both.
    rows = [
        (1, "zq xw the cat the dog the cow"),
        (2, "zq xw the cat the bird"),
        (3, "the fish zq xw"),
    ]
    d = _write_documents(tmp_path, rows)
    out = corpus.bigram_pmi(d, min_count=2, k=10).to_pandas()
    assert list(out["ngram"])[0] == "zq xw"  # perfect collocation ranks first
    pmis = dict(zip(out["ngram"], out["pmi"]))
    assert pmis["zq xw"] > pmis["the cat"]
    # PMI definition check for the perfect pair: B=3, Ua=Ub=3
    n_tokens = sum(len(r[1].split()) for r in rows)
    n_bigrams = sum(len(r[1].split()) - 1 for r in rows)
    expect = np.log((3 / n_bigrams) / ((3 / n_tokens) * (3 / n_tokens)))
    assert abs(pmis["zq xw"] - expect) < 2e-6


def test_tfidf_topk_crafted(tmp_path, ray_session):
    rows = [
        (1, "rare common common"),
        (2, "common common unique"),
        (3, "common filler"),
    ]
    d = _write_documents(tmp_path, rows)
    out = corpus.tfidf_topk(d, k=2).to_pandas().sort_values(["doc_id", "rank"])
    by_doc = {g: list(t["term"]) for g, t in out.groupby("doc_id")}
    # 'common' has df=3 -> idf=ln(1)=0 -> never outranks a rarer term
    assert by_doc[1][0] == "rare"
    assert by_doc[2][0] == "unique"
    # ranks are 1-based, dense, and capped at k
    assert out.groupby("doc_id")["rank"].apply(
        lambda s: list(s) == list(range(1, len(s) + 1))
    ).all()
    assert (out["rank"] <= 2).all()
    # idf=0 -> tfidf exactly 0 for 'common' regardless of tf
    assert (out.loc[out["term"] == "common", "tfidf"] == 0).all()


def test_doc_entropy_crafted(tmp_path, ray_session):
    import math

    rows = [
        (1, "a a a a"),  # single type: entropy exactly 0
        (2, "a b c d"),  # uniform over 4 types: ln(4), integerized
        (3, ""),  # empty: zeros
        (4, "a a b"),  # H = (2*e6(ln 3/2) + 1*e6(ln 3)) / 3e6
    ]
    d = _write_documents(tmp_path, rows)
    out = corpus.doc_entropy(d).to_pandas().sort_values("doc_id").set_index("doc_id")
    assert out.loc[1, "n_tokens"] == 4 and out.loc[1, "n_distinct"] == 1
    assert out.loc[1, "entropy"] == 0.0
    e6_ln4 = math.floor(math.log(4.0) * 1e6 + 0.5)
    assert out.loc[2, "entropy"] == math.floor((4 * e6_ln4) / (4 * 1e6) * 1e6 + 0.5) / 1e6
    assert out.loc[3, "n_tokens"] == 0 and out.loc[3, "entropy"] == 0.0
    e6_32 = math.floor(math.log(3 / 2) * 1e6 + 0.5)
    e6_3 = math.floor(math.log(3.0) * 1e6 + 0.5)
    want = math.floor((2 * e6_32 + e6_3) / (3 * 1e6) * 1e6 + 0.5) / 1e6
    assert out.loc[4, "entropy"] == want


def test_suggest_terms_crafted(tmp_path, ray_session):
    from searchengine_ray.pipelines import textops as tx

    rows = [
        (1, "apple apple apple apricot banana"),
        (2, "apple apricot avocado avocado"),
        (3, "banana apex"),
    ]
    d = _write_documents(tmp_path, rows)
    out = (
        tx.suggest_terms(d, prefixes=("ap", "b"), k=2)
        .to_pandas()
        .sort_values(["prefix_id", "rank"])
        .reset_index(drop=True)
    )
    # cf: apple 4, apricot 2, avocado 2, banana 2, apex 1
    ap = out[out.prefix_id == 0]
    assert list(ap["term"]) == ["apple", "apricot"]  # cf desc, term asc tie-break
    assert list(ap["cf"]) == [4, 2]
    b = out[out.prefix_id == 1]
    assert list(b["term"]) == ["banana"] and list(b["cf"]) == [2]


def test_ed1_checker():
    from searchengine_ray.pipelines.textops import _ed1
    from itertools import product

    # brute-force DP oracle over a small alphabet, all strings len<=3
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    strs = [""]
    for n in (1, 2, 3):
        strs += ["".join(p) for p in product("abc", repeat=n)]
    for a in strs:
        for b in strs:
            assert _ed1(a, b) == (lev(a, b) <= 1), (a, b)


def test_spell_suggest_crafted(tmp_path, ray_session):
    from searchengine_ray.pipelines import textops as tx

    rows = [(1, "banana banana banana bananas panana orange")]
    d = _write_documents(tmp_path, rows)
    out = (
        tx.spell_suggest(d, words=("bananna", "oranje", "zzz"))
        .to_pandas()
        .set_index("word")
    )
    # bananna: lev1 to banana (cf 3); bananas is lev2 from bananna
    assert out.loc["bananna", "suggestion"] == "banana" and out.loc["bananna", "cf"] == 3
    assert out.loc["oranje", "suggestion"] == "orange"
    assert "zzz" not in out.index


def test_spell_suggest_symspell_equivalence(tmp_path, ray_session):
    """The SymSpell deletion-index path returns exactly what the band-scan
    path returns (round-4): every ed<=1 shape — substitution, insertion,
    deletion, exact hit — plus over-generation traps (transposes share a
    deletion key but are ed=2 and must be verify-rejected)."""
    from searchengine_ray.pipelines import textops as tx

    rows = [
        (1, "banana banana banana bananas panana orange data dta ab ba"),
        (2, "scan scans scaan query quer qury mergeable merge merged"),
    ]
    d = _write_documents(tmp_path, rows)
    words = (
        "bananna",  # substitution+insertion candidates
        "oranje",   # substitution
        "dta",      # exact vocab hit
        "ab",       # 'ba' is a transpose (ed=2): deletion keys collide, must lose to 'ab' itself
        "scaan",    # exact hit beats 'scan' (deletion) only via cf/term rule
        "quer",     # insertion ('query' is ed=2 from quer? q-u-e-r vs q-u-e-r-y: ed=1)
        "zzz",      # no neighbor
    )
    a = (
        tx.spell_suggest(d, words=words, mode="scan")
        .to_pandas().sort_values("word_id").reset_index(drop=True)
    )
    b = (
        tx.spell_suggest(d, words=words, mode="symspell")
        .to_pandas().sort_values("word_id").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    assert "zzz" not in set(a["word"])


def test_vocab_budget_fallbacks_equivalent(tmp_path, ray_session):
    """vocab_budget=0 forces the distributed coarse_key_attach fallbacks
    (round-4: no driver-side vocabulary); results must equal the broadcast
    fast paths bit-for-bit on all three vocabulary-probing ops."""
    import pandas as pd

    from searchengine_ray.pipelines import corpus as C

    rows = [
        (1, "the cat sat on the mat while the dog ran far away today"),
        (2, "the cat sat on the mat while the dog slept near home"),
        (3, "big data engines shuffle rows the cat sat on columns daily"),
        (4, "big data engines stream batches of the mat and the dog"),
        (5, ""),  # zero-token doc must appear in per-doc outputs with zeros
    ]
    d = _write_documents(tmp_path, rows)
    cases = [
        ("unigram_logprob", lambda b: C.unigram_logprob(d, vocab_budget=b)),
        ("tfidf_topk", lambda b: C.tfidf_topk(d, k=3, vocab_budget=b)),
        ("bigram_pmi", lambda b: C.bigram_pmi(d, min_count=2, k=20, vocab_budget=b)),
    ]
    for name, fn in cases:
        a = fn(10**9).to_pandas()
        b = fn(0).to_pandas()
        cols = sorted(a.columns)
        a = a[cols].sort_values(cols).reset_index(drop=True)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        assert len(a) > 0, name


def test_skipgram_counts_crafted(tmp_path, ray_session):
    """Forward window-3 pairs: 'a b c d' yields d=1: ab,bc,cd; d=2: ac,bd;
    d=3: ad. Counts aggregate over distances; doc boundaries respected."""
    rows = [(1, "a b c d"), (2, "a b")]
    d = _write_documents(tmp_path, rows)
    out = corpus.skipgram_counts(d, window=3, k=50).to_pandas()
    got = dict(zip(out["pair"], out["count"]))
    assert got == {
        "a b": 2,  # doc1 d=1 + doc2 d=1
        "b c": 1, "c d": 1, "a c": 1, "b d": 1, "a d": 1,
    }
    # ordering: count desc then pair asc
    assert list(out["pair"])[0] == "a b"
    assert list(out["pair"])[1:] == sorted(list(out["pair"])[1:])
