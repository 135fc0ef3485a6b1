"""Deduplication operators (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine) — first-class components for a training-data pipeline.

Shuffle discipline:
- exact dedup: content-hash per batch (vectorized md5) -> ONE groupby on
  the hash (standard hash-partitioned exact dedup; identical texts
  co-locate, everything else stays put).
- MinHash-LSH: shingle->minhash per batch (no shuffle) -> explode to
  (band_id, band_hash, doc_id) -> groupby band bucket (the only shuffle;
  bucket sizes are bounded by collision rate, and a cap guards degenerate
  buckets) -> candidate pairs -> signature-verify.
- SimHash: pure map_batches, no shuffle (pairing via prefix groupby).
- embedding near-dup: block-wise cosine against a broadcast normalized
  matrix (ray.put once; never re-shipped per batch).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.hashing import hash64_array
from ..functions.runtime import cap_worker_threads
from ..functions.scoring import round6
from ..functions.tokenize import tokenize_flat
from ..sources.tables import read_documents, read_embeddings

MINHASH_PERMS = 64
LSH_BANDS = 16  # 4 rows per band
SHINGLE_K = 3
_MERSENNE = (1 << 61) - 1
MAX_BUCKET = 64  # cap candidate generation per LSH bucket (skew guard)


def _minhash_params(num_perm: int = MINHASH_PERMS, seed: int = 12345):
    g = np.random.Generator(np.random.PCG64(seed))
    a = g.integers(1, _MERSENNE, num_perm, dtype=np.int64)
    b = g.integers(0, _MERSENNE, num_perm, dtype=np.int64)
    return a, b


def _doc_shingle_hashes(t: pa.Table, k: int = SHINGLE_K):
    """Per-row k-gram shingle hash sets (int64). Vectorized rolling hash
    over the flat token stream; shingles crossing row boundaries masked."""
    cap_worker_threads()
    texts = t.column("text").combine_chunks()
    parents, tokens = tokenize_flat(texts)
    th = hash64_array(tokens)
    n = len(th)
    out_rows: np.ndarray
    if n < k:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    # rolling combine of k consecutive token hashes (order-sensitive)
    acc = th[: n - k + 1].copy()
    for j in range(1, k):
        acc = acc * np.int64(1099511628211) + th[j : n - k + 1 + j]
    valid = parents[: n - k + 1] == parents[k - 1 :]
    return parents[: n - k + 1][valid], acc[valid]


def exact_duplicates(sf_dir: str) -> rd.Dataset:
    """(doc_id, is_canonical) — exact text dedup via content hash; the
    canonical survivor of a duplicate group is the min doc_id (reference
    analog: A1 first-seen distinct, /root/reference/Indexer/Program.cs:110-116)."""

    def add_hash(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        fps = [
            hashlib.md5(s.encode("utf-8")).hexdigest() for s in t.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": t.column("doc_id"), "text_md5": pa.array(fps, pa.string())}
        )

    def mark(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": group.column("doc_id"),
                "is_canonical": pa.array(ids == ids.min(), pa.bool_()),
            }
        )

    return (
        read_documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text_md5")
        .map_groups(mark, batch_format="pyarrow")
    )


def minhash_signatures(ds: rd.Dataset, num_perm: int = MINHASH_PERMS) -> rd.Dataset:
    """(doc_id, sig:list<int64>[num_perm]) MinHash signatures."""
    a, b = _minhash_params(num_perm)

    def fn(t: pa.Table) -> pa.Table:
        rows, sh = _doc_shingle_hashes(t)
        n = t.num_rows
        sigs = np.full((n, num_perm), _MERSENNE, dtype=np.int64)
        if len(sh):
            pos = (sh.view(np.uint64) % np.uint64(_MERSENNE)).astype(np.int64)
            # (S, P) permuted values; reduce min per row via sorted segments
            order = np.argsort(rows, kind="stable")
            r_s, p_s = rows[order], pos[order]
            starts = np.flatnonzero(np.diff(r_s, prepend=-1))
            hv = (p_s[:, None] * a[None, :] + b[None, :]) % _MERSENNE
            mins = np.minimum.reduceat(hv, starts, axis=0)
            sigs[r_s[starts]] = mins
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1), pa.int64()), num_perm
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def minhash_lsh_pairs(
    sf_dir: str,
    num_perm: int = MINHASH_PERMS,
    bands: int = LSH_BANDS,
    threshold: float = 0.5,
) -> rd.Dataset:
    """(doc_a, doc_b, est_jaccard) near-duplicate candidate pairs.

    shingle -> minhash -> band buckets (groupby shuffle) -> pairs ->
    signature-estimated Jaccard >= threshold. Bucket size capped at
    MAX_BUCKET (a degenerate bucket of B docs would emit B^2 pairs)."""
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(read_documents(sf_dir, columns=["doc_id", "text"]), num_perm)

    def to_bands(t: pa.Table) -> pa.Table:
        n = t.num_rows
        sig = (
            t.column("sig").combine_chunks().flatten().to_numpy(zero_copy_only=False)
        ).reshape(n, num_perm)
        band_vals = sig.reshape(n, bands, rows_per_band)
        bh = band_vals[:, :, 0].copy()
        for j in range(1, rows_per_band):
            bh = bh * np.int64(1099511628211) + band_vals[:, :, j]
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n), pa.int32()),
                "bh": pa.array(bh.reshape(-1), pa.int64()),
                "doc_id": pa.array(np.repeat(doc, bands), pa.int64()),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.repeat(sig, bands, axis=0).reshape(-1), pa.int64()), num_perm
                ),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        m = min(group.num_rows, MAX_BUCKET)
        if group.num_rows > MAX_BUCKET:
            # no silent caps: a degenerate bucket got truncated — surface it
            print(
                f"[minhash_lsh] bucket truncated: {group.num_rows} docs > "
                f"MAX_BUCKET={MAX_BUCKET}; pairs beyond the first {MAX_BUCKET} "
                "docs (doc_id order) are not emitted"
            )
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        sig = (
            group.column("sig").combine_chunks().flatten().to_numpy(zero_copy_only=False)
        ).reshape(group.num_rows, num_perm)
        order = np.argsort(doc, kind="stable")  # sort BEFORE capping: the
        doc, sig = doc[order][:m], sig[order][:m]  # truncation is then deterministic
        ai, bi = np.triu_indices(m, k=1)
        if len(ai) == 0:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                 "est_jaccard": pa.array([], pa.float64())}
            )
        est = (sig[ai] == sig[bi]).mean(axis=1)
        keep = est >= threshold
        return pa.table(
            {
                "doc_a": pa.array(doc[ai[keep]], pa.int64()),
                "doc_b": pa.array(doc[bi[keep]], pa.int64()),
                "est_jaccard": pa.array(round6(est[keep]), pa.float64()),
            }
        )

    pairs = (
        sigs.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "bh"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    # a pair can surface from several bands -> dedup
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


def simhash(sf_dir: str) -> rd.Dataset:
    """(doc_id, simhash) — 64-bit SimHash over token hashes weighted by tf
    (here: every occurrence contributes, which equals tf-weighting)."""

    def fn(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        texts = t.column("text").combine_chunks()
        parents, tokens = tokenize_flat(texts)
        th = hash64_array(tokens)
        n = t.num_rows
        out = np.zeros(n, dtype=np.int64)
        if len(th):
            bits = np.unpackbits(th.view(np.uint64).view(np.uint8).reshape(-1, 8), axis=1)
            contrib = bits.astype(np.int32) * 2 - 1  # (T, 64) in {-1, +1}
            sums = np.zeros((n, 64), dtype=np.int64)
            np.add.at(sums, parents, contrib)
            packed = np.ascontiguousarray(np.packbits((sums > 0).astype(np.uint8), axis=1))
            out = packed.view(np.int64).reshape(-1)
        return pa.table({"doc_id": t.column("doc_id"), "simhash": pa.array(out, pa.int64())})

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5) -> rd.Dataset:
    """(doc_a, doc_b, jaccard) EXACT n-gram Jaccard for LSH candidate pairs.

    Verification stage after minhash_lsh_pairs: recompute true shingle-set
    Jaccard for each candidate. The shingle sets of candidates are fetched
    via a broadcast dict (candidates are few by construction; at larger
    scale this becomes a hash-join of candidates against the shingle table)."""
    cands = minhash_lsh_pairs(sf_dir, threshold=max(0.3, threshold - 0.2)).to_pandas()

    def shingle_sets(t: pa.Table) -> pa.Table:
        rows, sh = _doc_shingle_hashes(t)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {"doc_id": pa.array(doc[rows], pa.int64()), "shingle": pa.array(sh, pa.int64())}
        )

    need = set(cands.doc_a) | set(cands.doc_b)
    sh_tbl = (
        read_documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(shingle_sets, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    sh_tbl = sh_tbl[sh_tbl.doc_id.isin(need)]
    sets = {d: set(g) for d, g in sh_tbl.groupby("doc_id")["shingle"]}
    out_a, out_b, out_j = [], [], []
    for a, b in zip(cands.doc_a, cands.doc_b):
        sa, sb = sets.get(a, set()), sets.get(b, set())
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out_a.append(int(a))
            out_b.append(int(b))
            out_j.append(float(round6(j)))
    return rd.from_arrow(
        pa.table(
            {"doc_a": pa.array(out_a, pa.int64()), "doc_b": pa.array(out_b, pa.int64()),
             "jaccard": pa.array(out_j, pa.float64())}
        )
    )


def dedup_components(sf_dir: str, threshold: float = 0.5) -> rd.Dataset:
    """(doc_id, component_id) — near-duplicate clusters: LSH candidate pairs
    -> connected components; component_id = min doc_id of the cluster.
    Docs with no near-dup pair form singleton components (their own id).

    Components here run as union-find over the COLLECTED pair list — pairs
    are few by construction (LSH threshold + bucket caps bound them). At
    10^12-doc scale this becomes a few rounds of min-label propagation:
    explode pairs to (node, neighbor_label) rows, groupby(node).min, join
    back, repeat until no label changes — same result, all shuffles."""
    pairs = minhash_lsh_pairs(sf_dir, threshold=threshold).to_pandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for a, b in zip(pairs.doc_a, pairs.doc_b):
        parent.setdefault(int(a), int(a))
        parent.setdefault(int(b), int(b))
        union(int(a), int(b))
    labels = {x: find(x) for x in parent}
    ref = ray.put(labels)

    def fn(t: pa.Table) -> pa.Table:
        lab = ray.get(ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        comp = np.array([lab.get(int(d), int(d)) for d in ids], dtype=np.int64)
        return pa.table(
            {"doc_id": t.column("doc_id"), "component_id": pa.array(comp, pa.int64())}
        )

    return read_documents(sf_dir, columns=["doc_id"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.95) -> rd.Dataset:
    """(id_a, id_b, sim) — embedding-cosine near-duplicates. The (small)
    normalized matrix is broadcast once via ray.put; each batch does one
    matmul against it. At 10^12 scale the broadcast side becomes the
    IVF/LSH-bucketed path (pipelines/ann.py)."""
    ref_tbl = read_embeddings(sf_dir, columns=["vec_id", "embedding"]).to_pandas()
    ids = ref_tbl["vec_id"].to_numpy()
    mat = np.stack(ref_tbl["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def fn(t: pa.Table) -> pa.Table:
        r_ids, r_mat = ray.get(ref)
        my_ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        emb = t.column("embedding").combine_chunks()
        m = np.asarray(emb.flatten().to_numpy(zero_copy_only=False), dtype=np.float64).reshape(
            len(my_ids), -1
        )
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ r_mat.T
        bi, ri = np.nonzero(sims >= threshold)
        a = my_ids[bi]
        b = r_ids[ri]
        keep = a < b  # dedup ordered pairs + drop self
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
                "sim": pa.array(round6(sims[bi, ri][keep]), pa.float64()),
            }
        )

    return read_embeddings(sf_dir, columns=["vec_id", "embedding"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )
