"""Text-analysis operators over a documents table (doc_id:int64, text:string).

These generalize the reference's Lexicon/WordsCount stages
(/root/reference/Indexer/Program.cs:68-224,417-558) into the standalone
operators a training-data pipeline needs: lexicon df/cf, per-doc token
stats, flat postings, top terms, quality scoring, language-ID heuristic and
document fingerprints. All are map_batches-vectorized; only lexicon/top_terms
shuffle (a pre-aggregated groupby).

Every operator here has a DuckDB oracle in __ray_entry__.oracle_sql() —
column names and rounding are part of the contract.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from ..functions.runtime import cap_worker_threads
from ..functions.scoring import round6
from ..functions.tokenize import tokenize_flat
from ..sources.tables import read_documents

# Shared stopword profiles (kept tiny and fixed: the contract is
# determinism, not linguistic accuracy). Mirrored literally in oracle SQL.
STOPWORDS = {
    "en": ("the", "and", "of", "a", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es": ("el", "la", "los", "y", "es", "un", "una"),
    "fr": ("le", "la", "les", "et", "est", "un", "une"),
}
STOPWORDS_FLAT = tuple(sorted({w for ws in STOPWORDS.values() for w in ws}))


def _tokens_per_row(t: pa.Table) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """(row_indices, tokens, tokens_per_row) for a documents batch."""
    cap_worker_threads()
    texts = t.column("text").combine_chunks()
    parents, tokens = tokenize_flat(texts)
    counts = np.bincount(parents, minlength=t.num_rows)
    return parents, tokens, counts


def lexicon(sf_dir: str) -> rd.Dataset:
    """(term, df, cf) — global document/collection frequency per term
    (reference A2/A3, Indexer/Program.cs:458-467). Pre-aggregated per batch
    (one row per term per batch) before the groupby shuffle."""

    def partial(t: pa.Table) -> pa.Table:
        parents, tokens, _ = _tokens_per_row(t)
        if len(tokens) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "df_p": pa.array([], pa.int64()),
                 "cf_p": pa.array([], pa.int64())}
            )
        pairs = pa.table({"i": pa.array(parents, pa.int64()), "term": tokens})
        per_doc = (
            pairs.group_by(["i", "term"])
            .aggregate([([], "count_all")])
            .select(["i", "term", "count_all"])  # name-based: key/agg order varies
            .rename_columns(["i", "term", "tf"])
        )
        agg = per_doc.group_by("term").aggregate([("tf", "sum"), ([], "count_all")])
        return pa.table(
            {
                "term": agg.column("term"),
                "df_p": agg.column("count_all"),
                "cf_p": agg.column("tf_sum"),
            }
        )

    return (
        read_documents(sf_dir, columns=["text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("df_p", alias_name="df"), Sum("cf_p", alias_name="cf"))
    )


def doc_token_stats(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_tokens, n_distinct) — per-doc, no shuffle."""

    def fn(t: pa.Table) -> pa.Table:
        parents, tokens, counts = _tokens_per_row(t)
        distinct = np.zeros(t.num_rows, dtype=np.int64)
        if len(tokens):
            pairs = pa.table({"i": pa.array(parents, pa.int64()), "term": tokens})
            per_doc = pairs.group_by(["i", "term"]).aggregate([([], "count_all")])
            ii = per_doc.column("i").to_numpy(zero_copy_only=False)
            distinct = np.bincount(ii, minlength=t.num_rows)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(counts.astype(np.int64), pa.int64()),
                "n_distinct": pa.array(distinct.astype(np.int64), pa.int64()),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def postings(sf_dir: str) -> rd.Dataset:
    """(term, doc_id, tf) — the exploded forward index (reference M5/A4)."""

    def fn(t: pa.Table) -> pa.Table:
        parents, tokens, _ = _tokens_per_row(t)
        doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        if len(tokens) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "doc_id": pa.array([], pa.int64()),
                 "tf": pa.array([], pa.int64())}
            )
        pairs = pa.table({"i": pa.array(parents, pa.int64()), "term": tokens})
        g = pairs.group_by(["i", "term"]).aggregate([([], "count_all")])
        ii = g.column("i").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "term": g.column("term"),
                "doc_id": pa.array(doc_ids[ii], pa.int64()),
                "tf": g.column("count_all"),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def top_terms(sf_dir: str, k: int = 50) -> rd.Dataset:
    """Top-k terms by cf (cf desc, term asc) — reference O-class sort+limit."""
    return lexicon(sf_dir).sort(["cf", "term"], descending=[True, False]).limit(k)


def quality_scores(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_chars, n_tokens, mean_token_len, stopword_ratio, alpha_ratio)
    — length/punctuation/stopword quality heuristics, all rounded to 6."""

    def fn(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        texts = t.column("text").combine_chunks()
        parents, tokens = tokenize_flat(texts)
        n = t.num_rows
        n_tok = np.bincount(parents, minlength=n).astype(np.float64)
        tok_len = pc.utf8_length(tokens).to_numpy(zero_copy_only=False)
        sum_len = np.bincount(parents, weights=tok_len, minlength=n)
        stop_mask = pc.is_in(tokens, value_set=pa.array(STOPWORDS_FLAT)).to_numpy(
            zero_copy_only=False
        )
        n_stop = np.bincount(parents, weights=stop_mask.astype(np.float64), minlength=n)
        n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.float64)
        n_alpha = pc.count_substring_regex(texts, "[A-Za-z]").to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        safe_tok = np.maximum(n_tok, 1.0)
        safe_chars = np.maximum(n_chars, 1.0)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_chars": pa.array(n_chars.astype(np.int64), pa.int64()),
                "n_tokens": pa.array(n_tok.astype(np.int64), pa.int64()),
                "mean_token_len": pa.array(round6(sum_len / safe_tok), pa.float64()),
                "stopword_ratio": pa.array(round6(n_stop / safe_tok), pa.float64()),
                "alpha_ratio": pa.array(round6(n_alpha / safe_chars), pa.float64()),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def lang_id(sf_dir: str) -> rd.Dataset:
    """(doc_id, lang_pred) — stopword-profile language ID. Deterministic rule:
    most stoplist hits wins; ties broken alphabetically; zero hits -> 'und'."""
    langs = sorted(STOPWORDS)  # alphabetical == tie-break order

    def fn(t: pa.Table) -> pa.Table:
        parents, tokens, _ = _tokens_per_row(t)
        n = t.num_rows
        hits = np.zeros((len(langs), n), dtype=np.int64)
        for li, lang in enumerate(langs):
            m = pc.is_in(tokens, value_set=pa.array(STOPWORDS[lang])).to_numpy(
                zero_copy_only=False
            )
            hits[li] = np.bincount(parents, weights=m.astype(np.float64), minlength=n)
        best = np.argmax(hits, axis=0)  # first (alphabetical) max wins
        zero = hits.max(axis=0) == 0
        pred = np.array(langs, dtype=object)[best]
        pred[zero] = "und"
        return pa.table(
            {"doc_id": t.column("doc_id"), "lang_pred": pa.array(pred.tolist(), pa.string())}
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


# GPT2-style pre-tokenizer shape (RE2-compatible: no lookahead); counts
# "BPE-ish" word pieces: contractions, letter runs, digit runs, symbol runs.
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\pL+| ?\pN+| ?[^\s\pL\pN]+"
WS_PATTERN = r"[^\s]+"


def token_counts(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_ws, n_bpe, n_ref) — token counts under three tokenizers:
    whitespace, a BPE-ish regex (GPT2-shaped, RE2-compatible), and the
    reference letters-only tokenizer. One vectorized count kernel each."""

    def fn(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        texts = t.column("text").combine_chunks()
        n_ws = pc.count_substring_regex(texts, WS_PATTERN)
        n_bpe = pc.count_substring_regex(texts, BPE_PATTERN)
        parents, _ = tokenize_flat(texts)
        n_ref = np.bincount(parents, minlength=t.num_rows).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_ws": pc.cast(n_ws, pa.int64()),
                "n_bpe": pc.cast(n_bpe, pa.int64()),
                "n_ref": pa.array(n_ref, pa.int64()),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def fingerprints(sf_dir: str) -> rd.Dataset:
    """(doc_id, fp) — md5 hex of the normalized token stream (' '-joined).
    The per-row digest is inherently scalar; the join is vectorized and the
    digest loop is C-speed hashlib over short strings."""

    def fn(t: pa.Table) -> pa.Table:
        parents, tokens, counts = _tokens_per_row(t)
        offsets = np.zeros(t.num_rows + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), tokens)
        joined = pc.binary_join(lists, " ").to_pylist()
        fps = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in joined]
        return pa.table({"doc_id": t.column("doc_id"), "fp": pa.array(fps, pa.string())})

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def topk_per_group(sf_dir: str, k: int = 5) -> rd.Dataset:
    """(lang, source, rank, doc_id, n_chars) — top-k docs per (lang, source)
    by (n_chars desc, doc_id asc): the distributed ROW_NUMBER()<=k window
    shape.

    Scale discipline: each batch emits at most k rows PER GROUP (vectorized
    partial top-k — lexsort + run slicing, no Python per-group loop), so the
    shuffle moves <= k * n_groups * n_batches rows regardless of input size;
    one groupby finishes with the same kernel. Partitioning assumption: the
    GROUP COUNT is small (lang x source here). For high-cardinality keys,
    hash the key into coarse buckets first (events.sessionize pattern) —
    the per-batch partial already makes the exchange cheap either way.
    """

    def partial_topk(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        cols = ["lang", "source", "doc_id", "n_chars"]
        if t.num_rows == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "source": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "n_chars": pa.array([], pa.int64()),
                }
            )
        t = t.select(cols)
        lang = t.column("lang")
        src = t.column("source")
        _, lcode = np.unique(np.asarray(lang.to_pylist(), dtype=object), return_inverse=True)
        _, scode = np.unique(np.asarray(src.to_pylist(), dtype=object), return_inverse=True)
        key = lcode.astype(np.int64) * (scode.max() + 1) + scode
        nch = t.column("n_chars").to_numpy(zero_copy_only=False)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -nch, key))
        sk = key[order]
        new = np.empty(len(sk), dtype=bool)
        new[0] = True
        new[1:] = sk[1:] != sk[:-1]
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        pos = np.arange(len(sk)) - starts[run_id]
        keep = order[pos < k]
        return t.take(pa.array(np.sort(keep)))

    def finalize(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "source": pa.array([], pa.string()),
                    "rank": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "n_chars": pa.array([], pa.int64()),
                }
            )
        nch = group.column("n_chars").to_numpy(zero_copy_only=False)
        did = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -nch))[:k]
        g = group.take(pa.array(order))
        return pa.table(
            {
                "lang": g.column("lang"),
                "source": g.column("source"),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
                "doc_id": g.column("doc_id"),
                "n_chars": g.column("n_chars"),
            }
        )

    return (
        read_documents(sf_dir, columns=["doc_id", "lang", "source", "n_chars"])
        .map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "source"])
        .map_groups(finalize, batch_format="pyarrow")
    )


def suggest_terms(
    sf_dir: str, prefixes: tuple[str, ...] = ("qu", "me", "da", "s", "jo"), k: int = 5
) -> rd.Dataset:
    """(prefix_id, rank, term, cf) — query autocomplete: the top-k lexicon
    completions per prefix by collection frequency (cf desc, term asc).

    Scale shape: rides the lexicon's partial/combine groupby; the prefix
    probe is one vectorized pc.starts_with pass per block emitting at most
    |prefixes| x k rows per block (local top-k BEFORE any movement), then a
    single small repartition(1) merge — the suggestion table that reaches
    the driver is bounded at |prefixes| x k."""
    lex = lexicon(sf_dir)

    _O = pa.schema(
        [
            ("prefix_id", pa.int64()),
            ("rank", pa.int64()),
            ("term", pa.string()),
            ("cf", pa.int64()),
        ]
    )

    def local_topk(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _O.empty_table()
        terms = t.column("term").combine_chunks()
        cf = t.column("cf").to_numpy(zero_copy_only=False).astype(np.int64)
        out_p, out_t, out_c = [], [], []
        for pid, pref in enumerate(prefixes):
            m = pc.starts_with(terms, pref).to_numpy(zero_copy_only=False)
            idx = np.flatnonzero(m)
            if len(idx) == 0:
                continue
            sub_t = terms.take(pa.array(idx))
            sub_c = cf[idx]
            order = np.lexsort((sub_t.to_numpy(zero_copy_only=False), -sub_c))[:k]
            out_p.append(np.full(len(order), pid, np.int64))
            out_t.append(sub_t.take(pa.array(order)))
            out_c.append(sub_c[order])
        if not out_p:
            return _O.empty_table()
        return pa.table(
            {
                "prefix_id": pa.array(np.concatenate(out_p), pa.int64()),
                "rank": pa.array(np.zeros(sum(map(len, out_p)), np.int64)),
                "term": pa.concat_arrays(
                    [x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x for x in out_t]
                ),
                "cf": pa.array(np.concatenate(out_c), pa.int64()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return _O.empty_table()
        pidv = group.column("prefix_id").to_numpy(zero_copy_only=False)
        terms = group.column("term").combine_chunks()
        cf = group.column("cf").to_numpy(zero_copy_only=False)
        order = np.lexsort((terms.to_numpy(zero_copy_only=False), -cf))[:k]
        return pa.table(
            {
                "prefix_id": pa.array(pidv[order], pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "term": terms.take(pa.array(order)),
                "cf": pa.array(cf[order], pa.int64()),
            }
        )

    return (
        lex.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)  # <= |prefixes| x k rows per upstream block
        .groupby("prefix_id")
        .map_groups(merge, batch_format="pyarrow")
    )


def sample_stratified(sf_dir: str, k: int = 20, group_col: str = "lang") -> rd.Dataset:
    """(group_col, doc_id, sample_rank) — a deterministic k-per-group sample
    (default per lang; group_col="source" gives the per-domain CAP a crawl
    pipeline applies): docs ranked by (md5(doc_id-as-string) hex, doc_id)
    within each group,
    first k kept. The hash order is a fixed pseudo-random permutation, so
    the sample is stable across runs/cluster sizes AND recomputable in SQL
    (md5 contract, like the dedup ops) — the property a reproducible
    training-data subset needs.

    Same scale shape as topk_per_group: per-batch partial top-k per group
    caps the shuffle at k rows per group per batch; md5-per-row is C-speed
    hashlib (contract-mandated, same trade as fingerprints)."""

    def partial(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "h": pa.array([], pa.string()),
                }
            )
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        hs = np.asarray(
            [hashlib.md5(str(d).encode()).hexdigest() for d in did], dtype=object
        )
        _, lcode = np.unique(
            np.asarray(t.column(group_col).to_pylist(), dtype=object), return_inverse=True
        )
        order = np.lexsort((did, hs, lcode))
        lc = lcode[order]
        new = np.empty(len(lc), dtype=bool)
        new[0] = True
        new[1:] = lc[1:] != lc[:-1]
        starts = np.flatnonzero(new)
        pos = np.arange(len(lc)) - starts[np.cumsum(new) - 1]
        keep = order[pos < k]
        keep.sort()
        return pa.table(
            {
                group_col: t.column(group_col).take(pa.array(keep)),
                "doc_id": pa.array(did[keep], pa.int64()),
                "h": pa.array(hs[keep], pa.string()),
            }
        )

    def finalize(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "sample_rank": pa.array([], pa.int64()),
                }
            )
        did = group.column("doc_id").to_numpy(zero_copy_only=False)
        hs = np.asarray(group.column("h").to_pylist(), dtype=object)
        order = np.lexsort((did, hs))[:k]
        g = group.take(pa.array(order))
        return pa.table(
            {
                group_col: g.column(group_col),
                "doc_id": g.column("doc_id"),
                "sample_rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            }
        )

    # partial() caps the shuffle at k rows per lang per batch, so the
    # pre-groupby dataset is tiny by construction; coalesce to one block to
    # avoid empty schema-less sort blocks (groups << blocks), same as
    # length_quantiles below.
    return (
        read_documents(sf_dir, columns=["doc_id", group_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .groupby(group_col)
        .map_groups(finalize, batch_format="pyarrow")
    )


def sample_weighted(sf_dir: str, full_tokens: int = 64) -> rd.Dataset:
    """(doc_id, weight) — deterministic Bernoulli subsample with per-doc
    keep probability proportional to length quality:
    weight = round6(min(1, n_kept_tokens / full_tokens)); a doc is kept iff
    md5frac(doc_id) < weight (the split_assign hash contract, so the keep
    decision is reproducible at any scale / cluster size / insertion order
    AND recomputable in SQL). The CCNet/GPT-3-style quality-reweighting
    primitive: short boilerplate is downsampled, full-length docs always
    kept. Pure map_batches — no shuffle."""

    def fn(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        parents, _tokens = tokenize_flat(t.column("text").combine_chunks())
        n_tok = np.bincount(parents, minlength=t.num_rows).astype(np.float64)
        w = round6(np.minimum(1.0, n_tok / full_tokens))
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        frac = (
            np.fromiter(
                (
                    int.from_bytes(hashlib.md5(str(int(d)).encode()).digest()[:8], "big")
                    for d in did
                ),
                dtype=np.uint64,
                count=len(did),
            ).astype(np.float64)
            / 2.0**64
        )
        keep = frac < w
        return pa.table(
            {
                "doc_id": pa.array(did[keep], pa.int64()),
                "weight": pa.array(w[keep], pa.float64()),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def _ed1(a: str, b: str) -> bool:
    """True iff levenshtein(a, b) <= 1 (two-pointer check, no DP)."""
    la, lb = len(a), len(b)
    if a == b:
        return True
    if abs(la - lb) > 1:
        return False
    if la == lb:  # exactly one substitution allowed
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b is a+1 char: one skip in b allowed
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


SPELL_WORDS = ("qeury", "mergee", "dta", "jion", "scaan")


def spell_suggest(
    sf_dir: str, words: tuple[str, ...] = SPELL_WORDS, mode: str = "scan"
) -> rd.Dataset:
    """(word_id, word, suggestion, cf) — "did you mean": for each query
    word, the vocabulary term within levenshtein distance 1 with the
    highest collection frequency (cf desc, term asc tie-break). Words with
    no distance-1 neighbor are absent.

    Two equivalent per-block candidate generators (round-3 verdict ask #8):
      mode="scan"     — |len-1| band pre-filter (vectorized) then the O(len)
                        two-pointer distance check on every band term:
                        O(vocab-band) per query word. The oracle path.
      mode="symspell" — SymSpell deletion-neighborhood index: each block
                        indexes term + all 1-deletions of terms whose
                        length can possibly match (O(vocab·len) build, ONCE
                        per block regardless of |words|); a probe is
                        O(len(w)²) dict hits + an _ed1 verify on the tiny
                        candidate set. The web-vocabulary path — probe cost
                        is independent of vocabulary size.
    Both keep only the LOCAL best per word (one row/word/block through the
    bounded merge), so the exchange shape is identical; equivalence is
    pinned by tests/test_contract.py (both modes against one SQL oracle)
    and a direct scan==symspell property test."""
    assert mode in ("scan", "symspell")
    lex = lexicon(sf_dir)
    wl = [(i, w) for i, w in enumerate(words)]

    _O = pa.schema(
        [
            ("word_id", pa.int64()),
            ("word", pa.string()),
            ("suggestion", pa.string()),
            ("cf", pa.int64()),
        ]
    )

    def _emit(out: list) -> pa.Table:
        if not out:
            return _O.empty_table()
        return pa.table(
            {
                "word_id": pa.array([o[0] for o in out], pa.int64()),
                "word": pa.array([o[1] for o in out], pa.string()),
                "suggestion": pa.array([o[2] for o in out], pa.string()),
                "cf": pa.array([o[3] for o in out], pa.int64()),
            }
        )

    def local_best(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _O.empty_table()
        terms = t.column("term").combine_chunks()
        cf = t.column("cf").to_numpy(zero_copy_only=False).astype(np.int64)
        tlen = pc.utf8_length(terms).to_numpy(zero_copy_only=False)
        out = []
        for wid, w in wl:
            band = np.flatnonzero(np.abs(tlen - len(w)) <= 1)
            best = None  # (-cf, term)
            for j in band:
                term = terms[j].as_py()
                if _ed1(w, term):
                    key = (-int(cf[j]), term)
                    if best is None or key < best:
                        best = key
            if best is not None:
                out.append((wid, w, best[1], -best[0]))
        return _emit(out)

    def local_best_symspell(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _O.empty_table()
        terms = np.asarray(t.column("term").to_pylist(), dtype=object)
        cf = t.column("cf").to_numpy(zero_copy_only=False).astype(np.int64)
        tlen = np.fromiter((len(s) for s in terms), dtype=np.int64, count=len(terms))
        # index only lengths reachable from some query word (ed<=1 bound)
        wanted = sorted({len(w) + d for _, w in wl for d in (-1, 0, 1)})
        idxs = np.flatnonzero(np.isin(tlen, wanted))
        index: dict[str, list[int]] = {}
        for j in idxs:
            term = terms[j]
            index.setdefault(term, []).append(j)
            for i in range(len(term)):
                index.setdefault(term[:i] + term[i + 1 :], []).append(j)
        out = []
        for wid, w in wl:
            cand: set[int] = set()
            for key in {w, *(w[:i] + w[i + 1 :] for i in range(len(w)))}:
                cand.update(index.get(key, ()))
            # deletion keys over-generate (e.g. same-length transposes share
            # a deletion) — _ed1 verifies every candidate, standard SymSpell
            best = None  # (-cf, term)
            for j in cand:
                term = terms[j]
                if _ed1(w, term):
                    key = (-int(cf[j]), term)
                    if best is None or key < best:
                        best = key
            if best is not None:
                out.append((wid, w, best[1], -best[0]))
        return _emit(out)

    def merge(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return _O.empty_table()
        cf = group.column("cf").to_numpy(zero_copy_only=False)
        sug = group.column("suggestion").combine_chunks()
        best = np.lexsort((sug.to_numpy(zero_copy_only=False), -cf))[0]
        return group.select(["word_id", "word", "suggestion", "cf"]).take(
            pa.array([best])
        )

    gen = local_best if mode == "scan" else local_best_symspell
    return (
        lex.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)  # <= |words| rows per upstream block
        .groupby("word_id")
        .map_groups(merge, batch_format="pyarrow")
    )


def mix_corpus(sf_dir: str) -> rd.Dataset:
    """(doc_id, source, rate) — deterministic data-mixing sampler: each
    source domain gets a reproducible target rate (derived here as
    (1 + md5u64(source) %% 9) / 10 -> 0.1..0.9; in production the rate map
    is the mixing config) and each doc is kept iff md5frac(doc_id) < rate
    — the split_assign hash contract, so the mix is identical at any
    scale, cluster size, or insertion order AND recomputable in SQL. The
    source-weighted corpus-mixing primitive (e.g. up/down-weighting web
    vs reference text for a training run). Pure map_batches, no shuffle."""

    def fn(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        src = t.column("source").combine_chunks()
        # rates amortized over distinct sources per batch
        dic = pc.dictionary_encode(src)
        uniq = dic.dictionary.to_pylist()
        u_rate = np.fromiter(
            (
                (1 + int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") % 9)
                / 10.0
                for s in uniq
            ),
            dtype=np.float64,
            count=len(uniq),
        )
        rate = u_rate[dic.indices.to_numpy(zero_copy_only=False)]
        frac = (
            np.fromiter(
                (
                    int.from_bytes(hashlib.md5(str(int(d)).encode()).digest()[:8], "big")
                    for d in did
                ),
                dtype=np.uint64,
                count=len(did),
            ).astype(np.float64)
            / 2.0**64
        )
        keep = frac < rate
        return pa.table(
            {
                "doc_id": pa.array(did[keep], pa.int64()),
                "source": src.filter(pa.array(keep)),
                "rate": pa.array(rate[keep], pa.float64()),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "source"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def length_quantiles(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99)) -> rd.Dataset:
    """(lang, p50, p90, p99) — EXACT discrete quantiles of n_chars per lang
    (percentile_disc semantics: the value at 1-based sorted index
    ceil(q*n)), computed as a distributed histogram: each batch emits
    per-(lang, n_chars) partial counts, one groupby(lang) merges and takes
    the quantiles from the cumulative counts. The shuffle moves value
    DISTRIBUTIONS, never rows — exact quantiles without a sort of the data
    (n_chars cardinality is the bound, not corpus size)."""

    def partial(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "n_chars": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        return (
            t.select(["lang", "n_chars"])
            .group_by(["lang", "n_chars"])
            .aggregate([("n_chars", "count")])
            .rename_columns(["lang", "n_chars", "cnt"])
        )

    def finalize(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return pa.table(
                {"lang": pa.array([], pa.string())}
                | {f"p{int(q * 100)}": pa.array([], pa.int64()) for q in qs}
            )
        merged = (
            group.select(["lang", "n_chars", "cnt"])
            .group_by(["lang", "n_chars"])
            .aggregate([("cnt", "sum")])
        )
        vals = merged.column("n_chars").to_numpy(zero_copy_only=False)
        cnts = merged.column("cnt_sum").to_numpy(zero_copy_only=False)
        o = np.argsort(vals, kind="stable")
        vals, cnts = vals[o], cnts[o]
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        row = {"lang": pa.array([group.column("lang")[0].as_py()], pa.string())}
        for q in qs:
            r = max(1, int(np.ceil(q * n)))
            i = int(np.searchsorted(cum, r, side="left"))
            row[f"p{int(q * 100)}"] = pa.array([int(vals[i])], pa.int64())
        return pa.table(row)

    # partial() collapsed the corpus to per-(lang, n_chars) distribution rows
    # (bounded by lang x value cardinality, not corpus size), so coalescing to
    # one block before the groupby is safe at any scale — and it stops the
    # sort exchange from emitting empty schema-less blocks (groups << blocks).
    return (
        read_documents(sf_dir, columns=["lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .groupby("lang")
        .map_groups(finalize, batch_format="pyarrow")
    )


SPLIT_WEIGHTS: tuple[tuple[str, float], ...] = (
    ("train", 0.8),
    ("val", 0.1),
    ("test", 0.1),
)


def split_assign(
    sf_dir: str, weights: tuple[tuple[str, float], ...] = SPLIT_WEIGHTS
) -> rd.Dataset:
    """(doc_id, split) — deterministic train/val/test assignment by hashed
    doc_id, NOT by position: the same document lands in the same split at
    any scale, any partitioning, any cluster size, and adding/removing
    other documents never reshuffles existing assignments (the property a
    training pipeline actually needs; a `random_shuffle().split()` has
    neither).

    Contract (mirrored by the SQL oracle): frac = (md5-derived unsigned
    64-bit hash of str(doc_id)) / 2^64; cumulative-weight thresholds in
    `weights` order. Pure map_batches — embarrassingly parallel, no
    shuffle."""
    names = [n for n, _ in weights]
    cuts = np.cumsum([w for _, w in weights])
    if not np.isclose(cuts[-1], 1.0):
        raise ValueError("split weights must sum to 1")
    cuts = cuts[:-1]  # last split takes the remainder

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        frac = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(str(int(d)).encode()).digest()[:8], "big"
                )
                for d in ids
            ),
            dtype=np.uint64,
            count=len(ids),
        ).astype(np.float64) / float(2**64)
        idx = np.searchsorted(cuts, frac, side="right")
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "split": pa.array(np.asarray(names, dtype=object)[idx], pa.string()),
            }
        )

    return read_documents(sf_dir, columns=["doc_id"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


KWIC_TERMS = ("data", "search", "query", "table")


def kwic_snippets(
    sf_dir: str,
    terms: tuple[str, ...] = KWIC_TERMS,
    before: int = 2,
    after: int = 2,
) -> rd.Dataset:
    """(term_id, doc_id, pos, snippet) — keyword-in-context snippet
    extraction, the SERP display primitive the reference's Engine lacks
    (it renders titles only, Engine.cs:182-207): for each fixed term, every
    doc containing it emits the token window around the FIRST occurrence,
    inclusive [pos-before, pos+after] clipped to the doc, joined by ' '.
    `pos` is the 1-based first-occurrence index (== SQL list_position).

    Scale shape: one shuffle-free map_batches scan; the per-hit snippet
    join is a Python loop bounded by HIT count (in production this op runs
    over a top-k result set, not the corpus — here the corpus-wide scan is
    what makes the SQL oracle total)."""
    _O = pa.schema(
        [
            ("term_id", pa.int64()),
            ("doc_id", pa.int64()),
            ("pos", pa.int64()),
            ("snippet", pa.string()),
        ]
    )

    def fn(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _O.empty_table()
        doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        parents, tokens = tokenize_flat(t.column("text").combine_chunks())
        if len(parents) == 0:
            return _O.empty_table()
        n = t.num_rows
        L = np.bincount(parents, minlength=n).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(L)[:-1]))
        tid_p, doc_p, pos_p, lo_p, hi_p = [], [], [], [], []
        for tid, term in enumerate(terms):
            eq = pc.equal(tokens, term).to_numpy(zero_copy_only=False)
            idx = np.flatnonzero(eq)
            if len(idx) == 0:
                continue
            # first occurrence per doc: idx ascends, parents non-decreasing
            hit_docs, first = np.unique(parents[idx], return_index=True)
            flat = idx[first]
            p0 = flat - starts[hit_docs]  # 0-based in-doc position
            tid_p.append(np.full(len(flat), tid, np.int64))
            doc_p.append(doc[hit_docs])
            pos_p.append(p0 + 1)
            lo_p.append(flat - np.minimum(p0, before))
            hi_p.append(np.minimum(flat + after + 1, starts[hit_docs] + L[hit_docs]))
        if not tid_p:
            return _O.empty_table()
        lo = np.concatenate(lo_p)
        hi = np.concatenate(hi_p)
        # one Arrow take over all window positions, joined per window —
        # never a Python materialization of the whole token stream
        lens = hi - lo
        offs = np.concatenate(([0], np.cumsum(lens)))
        flat_idx = np.repeat(lo, lens) + (
            np.arange(int(offs[-1]), dtype=np.int64) - np.repeat(offs[:-1], lens)
        )
        window_toks = tokens.take(pa.array(flat_idx, pa.int64()))
        windows = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()),
            window_toks.combine_chunks()
            if isinstance(window_toks, pa.ChunkedArray)
            else window_toks,
        )
        return pa.table(
            {
                "term_id": pa.array(np.concatenate(tid_p), pa.int64()),
                "doc_id": pa.array(np.concatenate(doc_p), pa.int64()),
                "pos": pa.array(np.concatenate(pos_p), pa.int64()),
                "snippet": pc.binary_join(windows, " "),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )
