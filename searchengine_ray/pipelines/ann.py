"""Similarity search over an embedding column (vec_id:int64,
embedding:list<float>).

- `ann_brute_topk`: exact cosine top-k. The query matrix is normalized
  once on the driver and broadcast with ray.put (read in every task, never
  re-shipped per batch); each batch contributes one numpy matmul and only
  its LOCAL top-k per query leaves the task. The global merge is a
  DISTRIBUTED groupby(query_id) reduce (one group per query, each bounded
  by n_blocks * k rows) — only the final q * k ranked rows ever reach the
  driver, regardless of corpus size.
- `ann_lsh_topk`: a scale path — random-hyperplane LSH buckets; only
  vectors whose bucket matches a query bucket (within `probe` bit flips)
  are scored. Recall measured against brute force in tests.
- `ann_ivf_topk`: the other classic scale path — IVF-flat: a coarse
  quantizer of `n_lists` centroids partitions the corpus into inverted
  lists; queries probe the `nprobe` nearest lists and score only those
  vectors. With train_iters=0 the quantizer is the DETERMINISTIC first
  n_lists vectors by vec_id, which makes the whole operator
  SQL-oracle-checkable; train_iters>0 runs distributed Lloyd rounds
  (assignment in map_batches, centroid update as a groupby-mean) for the
  production-quality quantizer (recall tested vs brute).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.runtime import cap_worker_threads
from ..functions.scoring import round6, topk_by_score
from ..sources.tables import read_embeddings


def _load_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """The query vectors are a SMALL SIDE INPUT (like parsed query terms on
    the BM25 side), so this is a direct predicate-pushdown parquet point
    read — row-group stats skip everything but the matching groups. A full
    Dataset pass here cost ~2 s of fixed pipeline overhead per ANN call at
    sf0.1 and would scan the whole table at 100 TB."""
    import pyarrow.parquet as pq

    q = (
        pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "<", n_queries)],
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    ids = q["vec_id"].to_numpy()
    mat = np.stack(q["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    return ids, mat


def _batch_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    cap_worker_threads()
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    emb = t.column("embedding").combine_chunks()
    m = np.asarray(emb.flatten().to_numpy(zero_copy_only=False), dtype=np.float64).reshape(
        len(ids), -1
    )
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    return ids, m


_CAND_SCHEMA = pa.schema(
    [("query_id", pa.int64()), ("neighbor_id", pa.int64()), ("sim", pa.float64())]
)
_MERGE_FANIN = 32  # blocks in the intermediate combine level


def _partial_topk(t: pa.Table, k: int) -> pa.Table:
    """Per-query top-k WITHIN one table of (query_id, neighbor_id, sim)
    candidate rows. Top-k with the (sim desc, neighbor_id asc) tie-break is
    associative and each neighbor appears at most once per query across the
    whole candidate set (the vector table is partitioned), so applying this
    at every tree level is exact regardless of how rows are distributed."""
    cap_worker_threads()
    if t.num_rows == 0:
        return _CAND_SCHEMA.empty_table()
    qids = t.column("query_id").to_numpy(zero_copy_only=False)
    nids = t.column("neighbor_id").to_numpy(zero_copy_only=False)
    sims = t.column("sim").to_numpy(zero_copy_only=False)
    order = np.lexsort((nids, -sims, qids))
    qs, ns, ss = qids[order], nids[order], sims[order]
    new = np.empty(len(qs), bool)
    new[0] = True
    new[1:] = qs[1:] != qs[:-1]
    starts = np.flatnonzero(new)
    pos = np.arange(len(qs)) - np.repeat(starts, np.diff(np.append(starts, len(qs))))
    keep = pos < k
    return pa.table(
        {
            "query_id": pa.array(qs[keep], pa.int64()),
            "neighbor_id": pa.array(ns[keep], pa.int64()),
            "sim": pa.array(ss[keep], pa.float64()),
        }
    )


def _distributed_merge(cands: rd.Dataset, k: int) -> rd.Dataset:
    """Candidate rows -> tree-combine per-query top-k -> deterministic
    (query_id, rank) order. Replaces (a) the round-2 driver-side
    .to_pandas() merge (scale-killer at ~10^6 blocks) and (b) the first
    round-3 groupby(query_id)+sort version, whose two all-to-all exchanges
    cost ~6 s of fixed overhead at sf0.1 for a merge of a few thousand
    rows. Shape: repartition to _MERGE_FANIN blocks, reduce each to q*k
    rows (associative partial top-k — see _partial_topk), coalesce to one
    block of <= _MERGE_FANIN*q*k rows, final rank. No shuffle of keyed
    data at any level; every stage's input is candidate-sized (n_blocks *
    q * k rows max), never vector data."""

    out_schema = pa.schema(
        [
            ("query_id", pa.int64()),
            ("rank", pa.int32()),
            ("neighbor_id", pa.int64()),
            ("sim", pa.float64()),
        ]
    )

    def final_rank(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return out_schema.empty_table()
        t = _partial_topk(t, k)
        qids = t.column("query_id").to_numpy(zero_copy_only=False)
        sims = t.column("sim").to_numpy(zero_copy_only=False)
        # _partial_topk emits groups already (sim desc, neighbor asc)
        # within query and query-ascending overall
        new = np.empty(len(qids), bool)
        new[0] = True
        new[1:] = qids[1:] != qids[:-1]
        starts = np.flatnonzero(new)
        rank = (
            np.arange(len(qids)) - np.repeat(starts, np.diff(np.append(starts, len(qids)))) + 1
        )
        return pa.table(
            {
                "query_id": t.column("query_id"),
                "rank": pa.array(rank.astype(np.int32), pa.int32()),
                "neighbor_id": t.column("neighbor_id"),
                "sim": pa.array(
                    np.asarray(round6(sims), dtype=np.float64), pa.float64()
                ),
            }
        )

    return (
        cands.repartition(_MERGE_FANIN)
        .map_batches(
            lambda t: _partial_topk(t, k), batch_format="pyarrow", zero_copy_batch=True
        )
        .repartition(1)
        # batch_size=None: the whole (single) block as ONE batch — a split
        # batch would rank each fragment independently
        .map_batches(
            final_rank, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    )


def ann_brute_topk(sf_dir: str, n_queries: int = 8, k: int = 10) -> rd.Dataset:
    """(query_id, rank, neighbor_id, sim) exact cosine top-k; sim rounded 6;
    tie-break sim desc, neighbor_id asc. Self-matches included (oracle SQL
    does the same)."""
    q_ids, q_mat = _load_queries(sf_dir, n_queries)
    ref = ray.put((q_ids, q_mat))

    def local_topk(t: pa.Table) -> pa.Table:
        r_ids, r_mat = ray.get(ref)
        ids, m = _batch_matrix(t)
        sims = m @ r_mat.T  # (batch, q)
        kk = min(k, len(ids))
        out = []
        for qi in range(len(r_ids)):
            d, s = topk_by_score(ids.astype(np.int64), sims[:, qi], kk)
            out.append(
                pa.table(
                    {
                        "query_id": pa.array(np.full(len(d), r_ids[qi]), pa.int64()),
                        "neighbor_id": pa.array(d, pa.int64()),
                        "sim": pa.array(s, pa.float64()),
                    }
                )
            )
        return pa.concat_tables(out)

    cands = read_embeddings(sf_dir, columns=["vec_id", "embedding"]).map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    return _distributed_merge(cands, k)


def ann_lsh_topk(
    sf_dir: str, n_queries: int = 8, k: int = 10, planes: int = 12, probe: int = 1, seed: int = 777
) -> rd.Dataset:
    """Approximate cosine top-k: score only vectors in the query's LSH
    bucket or any bucket within `probe` Hamming bits. Same output schema as
    ann_brute_topk."""
    q_ids, q_mat = _load_queries(sf_dir, n_queries)
    dim = q_mat.shape[1]
    g = np.random.Generator(np.random.PCG64(seed))
    hyper = g.standard_normal((dim, planes))
    pow2 = (1 << np.arange(planes, dtype=np.int64))[::-1]

    def buckets_of(m: np.ndarray) -> np.ndarray:
        return ((m @ hyper) > 0).astype(np.int64) @ pow2

    q_buckets = buckets_of(q_mat)
    allowed: list[np.ndarray] = []
    for qb in q_buckets:
        s = [int(qb)]
        if probe >= 1:
            s += [int(qb) ^ (1 << j) for j in range(planes)]
        allowed.append(np.unique(np.asarray(s, dtype=np.int64)))
    ref = ray.put((q_ids, q_mat, allowed))

    def local_topk(t: pa.Table) -> pa.Table:
        r_ids, r_mat, allow = ray.get(ref)
        ids, m = _batch_matrix(t)
        b = buckets_of(m)
        out = []
        for qi in range(len(r_ids)):
            # vectorized membership over the int64 bucket codes (the
            # per-row `int(x) in set` loop was a per-query Python scan)
            mask = np.isin(b, allow[qi])
            if not mask.any():
                continue
            sims = m[mask] @ r_mat[qi]
            d, s = topk_by_score(ids[mask].astype(np.int64), sims, min(k, mask.sum()))
            out.append(
                pa.table(
                    {
                        "query_id": pa.array(np.full(len(d), r_ids[qi]), pa.int64()),
                        "neighbor_id": pa.array(d, pa.int64()),
                        "sim": pa.array(s, pa.float64()),
                    }
                )
            )
        if not out:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        return pa.concat_tables(out)

    cands = read_embeddings(sf_dir, columns=["vec_id", "embedding"]).map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    return _distributed_merge(cands, k)


def _ivf_centroids(
    sf_dir: str, n_lists: int, train_iters: int, seed: int = 0
) -> np.ndarray:
    """Coarse quantizer centroids, L2-normalized, shape (n_lists, dim).

    Init: the first n_lists vectors by vec_id — deterministic and
    oracle-reproducible (ANSI SQL can select them). Each Lloyd round is
    one distributed pass: per-batch assignment (matmul against the
    broadcast centroids) + partial sums, then a driver-side reduce of the
    n_lists x dim partials (tiny; the DATA never leaves the map tasks).
    Empty lists keep their previous centroid."""
    import pyarrow.parquet as pq

    # small side input: predicate-pushdown point read (see _load_queries)
    init = (
        pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "<", n_lists)],
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    cent = np.stack(init["embedding"].to_numpy()).astype(np.float64)
    cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    for _ in range(train_iters):
        ref = ray.put(cent)

        def partials(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            _ids, m = _batch_matrix(t)
            assign = np.argmax(m @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=len(c)).astype(np.int64)
            return pa.table(
                {
                    "list_id": pa.array(np.arange(len(c)), pa.int64()),
                    "vec_sum": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums.reshape(-1), pa.float64()), c.shape[1]
                    ),
                    "n": pa.array(counts, pa.int64()),
                }
            )

        agg = (
            read_embeddings(sf_dir, columns=["vec_id", "embedding"])
            .map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
            .to_pandas()
        )  # n_batches * n_lists tiny partial rows — metadata, not data
        sums = np.zeros_like(cent)
        counts = np.zeros(len(cent), dtype=np.int64)
        for lid, vs, n in zip(agg["list_id"], agg["vec_sum"], agg["n"]):
            sums[lid] += np.asarray(vs, dtype=np.float64)
            counts[lid] += int(n)
        nonempty = counts > 0
        cent[nonempty] = sums[nonempty] / counts[nonempty, None]
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent


def ann_ivf_topk(
    sf_dir: str,
    n_queries: int = 8,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    train_iters: int = 0,
) -> rd.Dataset:
    """IVF-flat approximate cosine top-k (module docstring). Output schema
    matches ann_brute_topk; queries score only vectors whose assigned
    list is among the query's `nprobe` closest centroids. Assignment and
    probe ties break toward the LOWER list id (np.argmax / stable sort),
    which the SQL oracle mirrors with row_number ordering."""
    q_ids, q_mat = _load_queries(sf_dir, n_queries)
    cent = _ivf_centroids(sf_dir, n_lists, train_iters)
    q_sims = q_mat @ cent.T
    # nprobe lists per query, ties toward lower list id (stable mergesort)
    probed = [
        np.sort(np.argsort(-q_sims[qi], kind="stable")[:nprobe])
        for qi in range(len(q_ids))
    ]
    ref = ray.put((q_ids, q_mat, cent, probed))

    def local_topk(t: pa.Table) -> pa.Table:
        r_ids, r_mat, c, probe_lists = ray.get(ref)
        ids, m = _batch_matrix(t)
        assign = np.argmax(m @ c.T, axis=1)
        out = []
        for qi in range(len(r_ids)):
            mask = np.isin(assign, probe_lists[qi])
            if not mask.any():
                continue
            sims = m[mask] @ r_mat[qi]
            d, s = topk_by_score(ids[mask].astype(np.int64), sims, min(k, int(mask.sum())))
            out.append(
                pa.table(
                    {
                        "query_id": pa.array(np.full(len(d), r_ids[qi]), pa.int64()),
                        "neighbor_id": pa.array(d, pa.int64()),
                        "sim": pa.array(s, pa.float64()),
                    }
                )
            )
        if not out:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        return pa.concat_tables(out)

    cands = read_embeddings(sf_dir, columns=["vec_id", "embedding"]).map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    return _distributed_merge(cands, k)


def embedding_outliers(sf_dir: str, k: int = 5) -> rd.Dataset:
    """(label, rank, vec_id, dist2_e12) — the `k` vectors FARTHEST from
    their label's centroid, per label (embedding-space outlier pruning, the
    centroid-distance curation filter for embedding-labeled corpora).

    Exact integer contract (bit-equal to the SQL oracle, no float-sum
    order sensitivity anywhere):
      v_e6       = floor(float64(v) * 1e6 + 0.5)            per element
      c_e6       = floor(sum(v_e6) / n + 0.5)               per (label, dim)
      dist2_e12  = sum_dims (v_e6 - c_e6)^2                 int64
    rank = (dist2_e12 desc, vec_id asc), kept while rank <= k.
    Magnitudes: |v| <= ~2 -> |v_e6| <= ~2e6, dist2_e12 <= 64 * 1.6e13
    ~= 1e15; centroid sums stay < 2^53 to ~4e9 vectors/label.

    Scale shape: stage 1 is a per-batch combiner (one (label, sum-vector,
    count) row per label per block) into a label-cardinality groupby;
    centroids broadcast via ray.put; stage 2 is one shuffle-free scan with
    per-(block, label) local top-k, merged by a label groupby whose input
    is <= n_blocks * k rows per label."""
    _P = pa.schema(
        [("label", pa.int64()), ("n_p", pa.int64()), ("sums", pa.list_(pa.int64()))]
    )

    def partial(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _P.empty_table()
        lab = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        emb = t.column("embedding").combine_chunks()
        m = np.asarray(
            emb.flatten().to_numpy(zero_copy_only=False), dtype=np.float64
        ).reshape(len(lab), -1)
        e6 = np.floor(m * 1e6 + 0.5).astype(np.int64)
        u, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(u), e6.shape[1]), np.int64)
        np.add.at(sums, inv, e6)
        return pa.table(
            {
                "label": pa.array(u, pa.int64()),
                "n_p": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "sums": pa.array(list(sums), pa.list_(pa.int64())),
            }
        )

    # label-cardinality-sized partials -> driver merge -> broadcast
    parts = (
        read_embeddings(sf_dir, columns=["label", "embedding"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    labels = np.sort(parts["label"].unique()).astype(np.int64)
    cent = {}
    for lb in labels:
        g = parts[parts["label"] == lb]
        n = int(g["n_p"].sum())
        s = np.sum(np.stack(g["sums"].to_numpy()), axis=0)
        cent[int(lb)] = np.floor(s / n + 0.5).astype(np.int64)
    c_mat = np.stack([cent[int(lb)] for lb in labels])
    ref = ray.put((labels, c_mat))

    _O = pa.schema(
        [("label", pa.int64()), ("vec_id", pa.int64()), ("dist2_e12", pa.int64())]
    )

    def local_topk(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _O.empty_table()
        labs, c = ray.get(ref)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        emb = t.column("embedding").combine_chunks()
        m = np.asarray(
            emb.flatten().to_numpy(zero_copy_only=False), dtype=np.float64
        ).reshape(len(ids), -1)
        e6 = np.floor(m * 1e6 + 0.5).astype(np.int64)
        d = e6 - c[np.searchsorted(labs, lab)]
        dist2 = np.sum(d * d, axis=1)
        # local per-label top-k caps the merge exchange at k rows/label/block
        order = np.lexsort((ids, -dist2, lab))
        lab_s, ids_s, d_s = lab[order], ids[order], dist2[order]
        pos_in_label = np.arange(len(lab_s)) - np.maximum.accumulate(
            np.where(np.r_[True, lab_s[1:] != lab_s[:-1]], np.arange(len(lab_s)), 0)
        )
        keep = pos_in_label < k
        return pa.table(
            {
                "label": pa.array(lab_s[keep], pa.int64()),
                "vec_id": pa.array(ids_s[keep], pa.int64()),
                "dist2_e12": pa.array(d_s[keep], pa.int64()),
            }
        )

    _R = pa.schema(
        [
            ("label", pa.int64()),
            ("rank", pa.int32()),
            ("vec_id", pa.int64()),
            ("dist2_e12", pa.int64()),
        ]
    )

    def merge(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return _R.empty_table()
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        d2 = group.column("dist2_e12").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -d2))[:k]
        return pa.table(
            {
                "label": pa.array(
                    np.full(len(order), group.column("label")[0].as_py(), np.int64)
                ),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32)),
                "vec_id": pa.array(ids[order], pa.int64()),
                "dist2_e12": pa.array(d2[order], pa.int64()),
            }
        )

    return (
        read_embeddings(sf_dir, columns=["vec_id", "label", "embedding"])
        .map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)  # <= n_blocks*k*|labels| rows: one block, clean groupby
        .groupby("label")
        .map_groups(merge, batch_format="pyarrow")
    )
