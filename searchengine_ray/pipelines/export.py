"""Training-shard export: the corpus -> N deterministic, resumable parquet
shards ready for a training loader.

The write-side counterpart of textops.split_assign: shard membership is a
pure function of doc_id (md5-derived u64 hash % n_shards — the same hash
family as split_assign, so assignments are stable under any partitioning,
any cluster size, and any insertion order). Each shard directory is written
ATOMICALLY (tmp+rename, mirroring pipelines/build.make_segment_writer) with
a per-shard manifest recording the input fingerprint — a rerun after a
crash skips completed shards entirely (their rows are filtered out BEFORE
the shuffle, so resume cost is one column-pruned read of the survivors,
not a rewrite). Rows within a shard are doc_id-sorted, so a resumed export
is byte-identical to an uninterrupted one (tested).

At 100 TB: n_shards is sized so one shard ~ one loader file target
(e.g. 10^12 docs / 10^5 shards); the shuffle moves each row once, keyed by
shard — the same single-exchange discipline as the index build.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..functions.hashing import hash64, md5h64_array
from ..functions.runtime import cap_worker_threads
from ..functions.tokenize import tokenize_flat
from ..sources.tables import read_documents
from ..state import manifest as mf

EXPORT_COLUMNS = ["doc_id", "text", "lang", "source", "n_chars"]


def shard_of(ids: np.ndarray, n_shards: int) -> np.ndarray:
    """md5-derived u64 of str(doc_id) % n_shards (contract mirrored by the
    shard_stats SQL oracle and by textops.split_assign's hash)."""
    h = np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(int(d)).encode()).digest()[:8], "big")
            for d in ids
        ),
        dtype=np.uint64,
        count=len(ids),
    )
    return (h % np.uint64(n_shards)).astype(np.int64)


def _export_fingerprint(sf_dir: str, n_shards: int) -> str:
    src = os.path.join(sf_dir, "documents.parquet")
    body = json.dumps(
        {"src": os.path.basename(src), "size": os.path.getsize(src), "n": n_shards, "v": 1}
    )
    return f"{hash64(body) & 0xFFFFFFFFFFFFFFFF:016x}"


def _shard_name(s: int) -> str:
    return f"shard-{s:05d}"


def completed_shards(out_dir: str, fingerprint: str) -> set[int]:
    d = os.path.join(out_dir, "_manifest")
    done: set[int] = set()
    if not os.path.isdir(d):
        return done
    for fn in os.listdir(d):
        if not (fn.startswith("shard-") and fn.endswith(".json")):
            continue
        with open(os.path.join(d, fn)) as fh:
            m = json.load(fh)
        if m.get("fingerprint") == fingerprint:
            done.add(int(fn[len("shard-") : -len(".json")]))
    return done


def export_shards(sf_dir: str, out_dir: str, n_shards: int = 8) -> dict:
    """Write the documents table as `n_shards` doc_id-hashed parquet shards
    under out_dir/shard-NNNNN/part.parquet. Returns {n_docs, n_shards,
    skipped} where `skipped` counts resume-skipped shards."""
    fingerprint = _export_fingerprint(sf_dir, n_shards)
    done = completed_shards(out_dir, fingerprint)
    os.makedirs(out_dir, exist_ok=True)

    done_ref = ray.put(np.asarray(sorted(done), dtype=np.int64))

    def assign(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sh = shard_of(ids, n_shards)
        d = ray.get(done_ref)
        if len(d):  # resume: finished shards never enter the shuffle
            t = t.filter(pa.array(~np.isin(sh, d)))
            if t.num_rows == 0:
                return t.append_column("shard", pa.array([], pa.int64()))
            sh = shard_of(t.column("doc_id").to_numpy(zero_copy_only=False), n_shards)
        return t.append_column("shard", pa.array(sh, pa.int64()))

    _M = pa.schema([("shard", pa.int64()), ("n_docs", pa.int64())])

    def write_shard(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return _M.empty_table()
        s = int(group.column("shard")[0].as_py())
        body = group.drop_columns(["shard"])
        order = pa.array(
            np.argsort(body.column("doc_id").to_numpy(zero_copy_only=False), kind="stable")
        )
        body = body.take(order)  # doc_id-sorted: resumed == full, byte-for-byte
        shard_dir = os.path.join(out_dir, _shard_name(s))
        tmp = shard_dir + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(body, os.path.join(tmp, "part.parquet"))
        if os.path.isdir(shard_dir):  # stale partial from a killed run
            import shutil

            shutil.rmtree(shard_dir)
        os.rename(tmp, shard_dir)
        mf.write_json_atomic(
            os.path.join(out_dir, "_manifest", _shard_name(s) + ".json"),
            {"fingerprint": fingerprint, "n_docs": body.num_rows},
        )
        return pa.table(
            {"shard": pa.array([s], pa.int64()), "n_docs": pa.array([body.num_rows], pa.int64())}
        )

    written = (
        read_documents(sf_dir, columns=EXPORT_COLUMNS)
        .map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(write_shard, batch_format="pyarrow")
        .to_pandas()  # n_shards metric rows — metadata, not data
    )
    n_new = int(written["n_docs"].sum()) if len(written) else 0
    prior = sum(
        json.load(open(os.path.join(out_dir, "_manifest", _shard_name(s) + ".json")))["n_docs"]
        for s in done
    )
    return {
        "n_docs": n_new + prior,
        "n_shards": n_shards,
        "skipped": len(done),
        "fingerprint": fingerprint,
    }


def shard_stats(sf_dir: str, n_shards: int = 8) -> rd.Dataset:
    """(shard, n_docs, n_chars) — the export's shard balance report as a
    queryable op (and the SQL-oracle hook for the export's hash contract).
    Pure map_batches partials + one n_shards-row groupby."""

    def partial(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sh = shard_of(ids, n_shards)
        nc = t.column("n_chars").to_numpy(zero_copy_only=False)
        docs = np.bincount(sh, minlength=n_shards).astype(np.int64)
        chars = np.bincount(sh, weights=nc, minlength=n_shards).astype(np.int64)
        return pa.table(
            {
                "shard": pa.array(np.arange(n_shards), pa.int64()),
                "d_p": pa.array(docs, pa.int64()),
                "c_p": pa.array(chars, pa.int64()),
            }
        )

    return (
        read_documents(sf_dir, columns=["doc_id", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .aggregate(Sum("d_p", alias_name="n_docs"), Sum("c_p", alias_name="n_chars"))
    )


_PACK_BUCKETS = 64


def pack_sequences(sf_dir: str, seq_len: int = 512) -> rd.Dataset:
    """(doc_id, n_tokens, tok_start, seq_first, seq_last) — concat-and-chunk
    sequence packing: documents are concatenated in doc_id order and cut
    into fixed seq_len training sequences; each doc reports its global
    token offset and the [first, last] sequence index it lands in (a doc
    spanning a boundary appears in both — the standard causal-LM loader
    layout). Zero-token docs are absent (they contribute no positions).

    This is a global ORDERED prefix-sum — the one shape groupby cannot
    express directly — implemented as the classic two-phase scan:
      1. one shuffle-free map_batches pass emits (doc_id, n_tokens);
      2. monotone equal-width doc_id buckets (order-preserving, unlike a
         hash); per-bucket token totals via groupby-sum (B rows) give the
         driver an exclusive bucket-offset table, broadcast via ray.put;
      3. per-bucket map_groups sorts by doc_id and does a vectorized
         cumsum + bucket offset — every row's GLOBAL offset with only
         B-row driver state.
    At 10^12 docs the counts table is rebuilt per phase from a pruned read
    (cheaper than holding it); here it is materialized once. Skew bound:
    equal-width buckets over hash-distributed doc_ids are uniform; over
    adversarial id clumps raise _PACK_BUCKETS or swap in sampled quantile
    boundaries (sort()'s own strategy)."""
    _C = pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64())])

    def count(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _C.empty_table()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        parents, _ = tokenize_flat(t.column("text").combine_chunks())
        n_tok = np.bincount(parents, minlength=t.num_rows).astype(np.int64)
        keep = n_tok > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "n_tokens": pa.array(n_tok[keep], pa.int64()),
            }
        )

    counts = (
        read_documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(count, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()  # reused by both scan phases; 16 B/doc, not the corpus
    )
    _O_EARLY = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("tok_start", pa.int64()),
            ("seq_first", pa.int64()),
            ("seq_last", pa.int64()),
        ]
    )
    if counts.count() == 0:
        # every doc tokenized to zero tokens: Min/Max below would aggregate
        # to None (round-3 ADVICE) — the packed corpus is simply empty
        return rd.from_arrow(_O_EARLY.empty_table())
    lohi = counts.aggregate(rd.aggregate.Min("doc_id"), rd.aggregate.Max("doc_id"))
    lo, hi = int(lohi["min(doc_id)"]), int(lohi["max(doc_id)"])
    span = float(hi - lo) + 1.0

    def bucket_of(ids: np.ndarray) -> np.ndarray:
        # float64 int64->double is monotone, so bucket order == doc_id order
        b = np.floor((ids - lo).astype(np.float64) * (_PACK_BUCKETS / span))
        return np.clip(b, 0, _PACK_BUCKETS - 1).astype(np.int64)

    def tag(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(bucket_of(ids), pa.int64()))

    tagged = counts.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    totals = tagged.groupby("bucket").aggregate(Sum("n_tokens", alias_name="tot")).to_pandas()
    off = np.zeros(_PACK_BUCKETS, np.int64)
    tot = np.zeros(_PACK_BUCKETS, np.int64)
    tot[totals["bucket"].to_numpy()] = totals["tot"].to_numpy()
    off[1:] = np.cumsum(tot)[:-1]  # exclusive prefix: bucket b starts at off[b]
    off_ref = ray.put(off)

    _O = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("tok_start", pa.int64()),
            ("seq_first", pa.int64()),
            ("seq_last", pa.int64()),
        ]
    )

    def scan(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return _O.empty_table()
        ids = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = group.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, n = ids[order], n[order]
        base = int(ray.get(off_ref)[int(group.column("bucket")[0].as_py())])
        start = base + np.cumsum(n) - n
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "tok_start": pa.array(start, pa.int64()),
                "seq_first": pa.array(start // seq_len, pa.int64()),
                "seq_last": pa.array((start + n - 1) // seq_len, pa.int64()),
            }
        )

    return tagged.groupby("bucket").map_groups(scan, batch_format="pyarrow")


def chunk_spans(sf_dir: str, chunk: int = 128, overlap: int = 16) -> rd.Dataset:
    """(doc_id, chunk_id, tok_start, n_tokens) — long-document chunking
    with overlap: chunk i covers token offsets [i*(chunk-overlap),
    i*(chunk-overlap) + chunk) within the doc; the last chunk is clipped.
    A doc with n <= chunk tokens is one chunk; zero-token docs are absent.
    The RAG/context-window preprocessing primitive.

    Scale shape: within-row arithmetic only — one shuffle-free
    map_batches pass (per-doc chunk counts expanded vectorized, no Python
    loop over docs)."""
    assert 0 <= overlap < chunk
    stride = chunk - overlap
    _O = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("chunk_id", pa.int64()),
            ("tok_start", pa.int64()),
            ("n_tokens", pa.int64()),
        ]
    )

    def fn(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _O.empty_table()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        parents, _ = tokenize_flat(t.column("text").combine_chunks())
        n = np.bincount(parents, minlength=t.num_rows).astype(np.int64)
        keep = n > 0
        ids, n = ids[keep], n[keep]
        n_chunks = np.where(n <= chunk, 1, (n - chunk + stride - 1) // stride + 1)
        total = int(n_chunks.sum())
        if total == 0:
            return _O.empty_table()
        doc_rep = np.repeat(ids, n_chunks)
        n_rep = np.repeat(n, n_chunks)
        starts = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
        cid = np.arange(total, dtype=np.int64) - np.repeat(starts, n_chunks)
        tok_start = cid * stride
        n_tok = np.minimum(chunk, n_rep - tok_start)
        return pa.table(
            {
                "doc_id": pa.array(doc_rep, pa.int64()),
                "chunk_id": pa.array(cid, pa.int64()),
                "tok_start": pa.array(tok_start, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


_CKSUM_MOD = 1_000_000_007  # checksum field, applied per term before the sum


def tokenize_ids(
    sf_dir: str, vocab_budget: int = 2_000_000
) -> rd.Dataset:
    """(doc_id, n_tokens, ids_checksum) — the tokenizer-export step: encode
    every doc into dense vocab ids (id = frequency rank: cf DESC, term ASC,
    starting at 0) and prove the ORDER-SENSITIVE encoding with a positional
    checksum, Σ pos·(id+1) mod 1e9+7 over 1-based positions. Two docs with
    the same token multiset but different order get different checksums, so
    the oracle pins the full (position → id) encoding, not just the bag.

    Scale shape: the vocab is built by the lexicon's partial/combine
    groupby. Under `vocab_budget` rows it is collected once (the
    unigram_logprob broadcast pattern: md5-u64-sorted probe table via
    ray.put) and the encode pass is one shuffle-free map_batches. Above
    the budget (round-3 ask #4) the frequency rank itself is assigned
    DISTRIBUTED — a distinct-cf histogram gives per-cf rank offsets (tiny:
    O(distinct cf), Zipf-bounded), a coarse cf-bucket groupby ranks equal-cf
    terms by term asc, and per-(doc, term) position sums attach ids via
    coarse_key_attach — no driver-side vocabulary. Per-term mod keeps
    every intermediate in int64 regardless of doc length."""
    from .textops import lexicon

    lex_ds = lexicon(sf_dir).materialize()  # (term, df, cf)
    n_vocab = lex_ds.count()
    if n_vocab > vocab_budget:
        return _tokenize_ids_attach(sf_dir, lex_ds, n_vocab, vocab_budget)

    vocab = lex_ds.to_pandas()  # bounded by vocab_budget rows
    order = np.lexsort(
        (vocab["term"].to_numpy(), -vocab["cf"].to_numpy())
    )  # cf desc, term asc (lowercase-ASCII terms: byte order == SQL ASC)
    ids = np.empty(len(vocab), np.int64)
    ids[order] = np.arange(len(vocab), dtype=np.int64)
    hashes = md5h64_array(list(vocab["term"]))
    horder = np.argsort(hashes)
    ref = ray.put((hashes[horder], ids[horder]))

    _O = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("ids_checksum", pa.int64())]
    )

    def encode(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _O.empty_table()
        doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        parents, tokens = tokenize_flat(t.column("text").combine_chunks())
        n = t.num_rows
        n_tok = np.zeros(n, np.int64)
        cks = np.zeros(n, np.int64)
        if len(parents):
            hs, vids = ray.get(ref)
            tid = vids[np.searchsorted(hs, md5h64_array(tokens))]
            n_tok = np.bincount(parents, minlength=n).astype(np.int64)
            # 1-based position within the doc: global index minus doc start
            starts = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
            pos = np.arange(len(parents), dtype=np.int64) - starts[parents] + 1
            term_c = (pos % _CKSUM_MOD) * ((tid + 1) % _CKSUM_MOD) % _CKSUM_MOD
            # exact: per-term values < 1e9+7; float64 bincount would round,
            # so sum in int64 via add.at-free segmented reduceat
            csum = np.concatenate([[0], np.cumsum(term_c)])
            ends = starts + n_tok
            cks = (csum[ends] - csum[starts]) % _CKSUM_MOD
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "ids_checksum": pa.array(cks, pa.int64()),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True
    )


def _tokenize_ids_attach(
    sf_dir: str, lex_ds: "rd.Dataset", n_vocab: int, vocab_budget: int
) -> rd.Dataset:
    """Over-budget path for tokenize_ids: the frequency rank (cf DESC,
    term ASC, 0-based) is computed without any driver-side vocabulary.

      1. distinct-cf histogram (O(distinct cf) rows — Zipf-bounded, far
         smaller than the vocab; size is logged) -> exclusive rank offsets
         per cf value, broadcast via ray.put;
      2. coarse cf-bucket groupby (equal cf co-locates) ranks each cf run's
         terms ascending: id = offset[cf] + position-in-run;
      3. per-(doc, term) position sums attach ids via coarse_key_attach;
         checksum contributions reduce with one native per-doc groupby-sum.
    All arithmetic is mod 1e9+7 per term, so the checksum equals the
    broadcast path's bit-for-bit."""
    from ray.data.aggregate import Sum as _Sum

    from .exchange import N_ATTACH_BUCKETS, coarse_key_attach

    print(
        f"[tokenize_ids] vocab {n_vocab} rows > budget {vocab_budget}; "
        "distributed frequency-rank assignment (no driver-side vocabulary)"
    )

    # --- 1. per-cf rank offsets ---
    def cf_partials(t: pa.Table) -> pa.Table:
        cf = t.column("cf").to_numpy(zero_copy_only=False).astype(np.int64)
        u, counts = np.unique(cf, return_counts=True)
        return pa.table(
            {"cf": pa.array(u, pa.int64()), "n_p": pa.array(counts, pa.int64())}
        )

    hist = (
        lex_ds.map_batches(cf_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cf")
        .aggregate(_Sum("n_p", alias_name="n"))
        .to_pandas()  # O(distinct cf) rows
    )
    print(f"[tokenize_ids] distinct-cf histogram: {len(hist)} rows on the driver")
    cfv = hist["cf"].to_numpy().astype(np.int64)
    cnt = hist["n"].to_numpy().astype(np.int64)
    order = np.argsort(-cfv)  # cf desc = rank order
    cfv_d, cnt_d = cfv[order], cnt[order]
    off_d = np.concatenate(([0], np.cumsum(cnt_d)[:-1]))  # exclusive offsets
    asc = np.argsort(cfv_d)
    off_ref = ray.put((cfv_d[asc], off_d[asc]))  # cf-ascending probe table

    # --- 2. rank equal-cf terms by term asc within coarse cf buckets ---
    def cf_bucket(t: pa.Table) -> pa.Table:
        cf = t.column("cf").to_numpy(zero_copy_only=False)
        b = (cf.view(np.uint64) % np.uint64(N_ATTACH_BUCKETS)).astype(np.int32)
        return t.append_column("_cb", pa.array(b, pa.int32()))

    _V = pa.schema([("key", pa.int64()), ("val", pa.int64())])

    def assign_ids(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _V.empty_table()
        cf = group.column("cf").to_numpy(zero_copy_only=False).astype(np.int64)
        terms = np.asarray(group.column("term").to_pylist(), dtype=object)
        order = np.lexsort((terms, -cf))
        cf_s, terms_s = cf[order], terms[order]
        new = np.r_[True, cf_s[1:] != cf_s[:-1]]
        starts = np.flatnonzero(new)
        within = np.arange(len(cf_s)) - np.repeat(
            starts, np.diff(np.append(starts, len(cf_s)))
        )
        cfa, offa = ray.get(off_ref)
        ids = offa[np.searchsorted(cfa, cf_s)] + within
        return pa.table(
            {
                "key": pa.array(md5h64_array(list(terms_s)), pa.int64()),
                "val": pa.array(ids, pa.int64()),
            }
        )

    id_vals = (
        lex_ds.map_batches(cf_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_cb")
        .map_groups(assign_ids, batch_format="pyarrow")
    )

    # --- 3. per-(doc, term) position sums -> attach id -> per-doc sum ---
    _L = pa.schema(
        [("key", pa.int64()), ("doc_id", pa.int64()), ("psum", pa.int64()),
         ("tf", pa.int64())]
    )

    def doc_rows(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _L.empty_table()
        doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        parents, tokens = tokenize_flat(t.column("text").combine_chunks())
        if len(parents) == 0:
            return _L.empty_table()
        n_tok = np.bincount(parents, minlength=t.num_rows).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
        pos = np.arange(len(parents), dtype=np.int64) - starts[parents] + 1
        per = (
            pa.table(
                {
                    "i": pa.array(parents, pa.int64()),
                    "key": pa.array(md5h64_array(tokens), pa.int64()),
                    "p": pa.array(pos % _CKSUM_MOD, pa.int64()),
                }
            )
            .group_by(["i", "key"])
            .aggregate([("p", "sum"), ([], "count_all")])
        )
        rows = per.column("i").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": per.column("key"),
                "doc_id": pa.array(doc[rows], pa.int64()),
                "psum": per.column("p_sum").cast(pa.int64()),
                "tf": per.column("count_all").cast(pa.int64()),
            }
        )

    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    rows = docs.map_batches(doc_rows, batch_format="pyarrow", zero_copy_batch=True)
    attached = coarse_key_attach(rows, id_vals, _L, pa.int64(), val="id")

    def contrib(t: pa.Table) -> pa.Table:
        ps = t.column("psum").to_numpy(zero_copy_only=False) % _CKSUM_MOD
        vid = t.column("id").to_numpy(zero_copy_only=False)
        c = ps * ((vid + 1) % _CKSUM_MOD) % _CKSUM_MOD
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "c_p": pa.array(c, pa.int64()),
                "n_p": t.column("tf"),
            }
        )

    def zero_rows(t: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
        return pa.table({"doc_id": t.column("doc_id"), "c_p": z, "n_p": z})

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
        .aggregate(_Sum("c_p", alias_name="s"), _Sum("n_p", alias_name="n"))
    )

    _O = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("ids_checksum", pa.int64())]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _O.empty_table()
        s = t.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": t.column("n").cast(pa.int64()),
                "ids_checksum": pa.array(s % _CKSUM_MOD, pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
