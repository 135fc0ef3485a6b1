"""Link-graph analytics: distributed PageRank.

The reference implements the indexing/serving half of "The Anatomy of a
Large-Scale Hypertextual Web Search Engine" (README.md:3-9); the paper's
OTHER half is link analysis. The reference repo has no link table and the
sandbox corpus has no html anchors, so the link graph is DERIVED
deterministically from doc_ids (the same derived-payload contract as the
media ops): node u has out-edges v_j = (h*(h + j)) % n with
h = u % 1000003, j = 1..k — the quadratic map is non-injective, so
in-degrees are skewed (hubs), giving real rank diversity; edges are kept
only when v_j is an existing doc_id (mass over dropped/dangling edges
leaks, the standard simplification; divisor is always k). The prime
reduction keeps h*(h+k) < ~1e12, safe in int64 for any doc_id.

Determinism contract: ranks are integer MICRO-units. r_0 = 1_000_000;
r_{t+1}(v) = 150_000 + (damping · Σ_{u→v} (r_t(u) // k)) // 100 with
damping = 85 — floor divisions exactly as written, so sums are
order-independent integer adds and the unrolled DuckDB oracle reproduces
every iteration bit-for-bit.

Scale shape (one exchange per iteration, no join): edges are ARITHMETIC,
so each rank row GENERATES its out-contributions inside map_batches —
no edge table is ever stored or shuffled. Per iteration: rank rows emit k
contribution rows plus one marker row carrying their own identity; a
coarse node-bucket groupby co-locates each node's marker with its inbound
contributions; a vectorized run-scan re-derives the node's next rank.
Contributions to non-existent nodes die in the scan (no marker in their
run). At 10^12 nodes this is the same per-round discipline as
dedup._components_propagate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.runtime import cap_worker_threads
from ..sources.tables import read_documents

N_NODE_BUCKETS = 256
_R0 = 1_000_000
_BASE = 150_000
_DAMP = 85


def pagerank(sf_dir: str, iters: int = 3, k: int = 4) -> rd.Dataset:
    """(doc_id, rank_micro) — integer-micro-unit PageRank after `iters`
    power-iteration rounds over the derived doc_id link graph."""
    n_docs = read_documents(sf_dir, columns=["doc_id"]).count()

    _S = pa.schema(
        [("node", pa.int64()), ("contrib", pa.int64()), ("is_node", pa.bool_())]
    )

    def spread(t: pa.Table) -> pa.Table:
        """rank rows -> k contribution rows + 1 marker row each."""
        cap_worker_threads()
        if t.num_rows == 0:
            return _S.empty_table()
        u = t.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        r = t.column("contrib").to_numpy(zero_copy_only=False).astype(np.int64)
        share = r // k
        h = u % 1000003
        vs = [(h * (h + j)) % n_docs for j in range(1, k + 1)]
        return pa.table(
            {
                "node": pa.array(np.concatenate([u] + vs), pa.int64()),
                "contrib": pa.array(
                    np.concatenate([r] + [share] * k), pa.int64()
                ),
                "is_node": pa.array(
                    np.concatenate(
                        [np.ones(len(u), bool), np.zeros(len(u) * k, bool)]
                    ),
                    pa.bool_(),
                ),
            }
        )

    def node_bucket(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        b = (node.view(np.uint64) % np.uint64(N_NODE_BUCKETS)).astype(np.int32)
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def reduce_ranks(group: pa.Table) -> pa.Table:
        """one coarse group = many nodes: marker row keeps the node alive,
        inbound contributions sum per run; contributions to non-nodes die."""
        cap_worker_threads()
        if group.num_rows == 0:
            return pa.schema([("node", pa.int64()), ("contrib", pa.int64())]).empty_table()
        node = group.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        c = group.column("contrib").to_numpy(zero_copy_only=False).astype(np.int64)
        isn = group.column("is_node").to_numpy(zero_copy_only=False)
        order = np.argsort(node, kind="stable")
        node, c, isn = node[order], c[order], isn[order]
        new = np.r_[True, node[1:] != node[:-1]]
        run_id = np.cumsum(new) - 1
        n_runs = int(run_id[-1]) + 1
        has_node = np.zeros(n_runs, bool)
        np.logical_or.at(has_node, run_id, isn)
        insum = np.zeros(n_runs, np.int64)
        np.add.at(insum, run_id[~isn], c[~isn])
        keep = has_node
        run_nodes = node[new]
        r_next = _BASE + (_DAMP * insum) // 100
        return pa.table(
            {
                "node": pa.array(run_nodes[keep], pa.int64()),
                "contrib": pa.array(r_next[keep], pa.int64()),
            }
        )

    def init(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(ids, pa.int64()),
                "contrib": pa.array(np.full(len(ids), _R0, np.int64), pa.int64()),
            }
        )

    ranks = read_documents(sf_dir, columns=["doc_id"]).map_batches(
        init, batch_format="pyarrow", zero_copy_batch=True
    )
    for _ in range(iters):
        ranks = (
            ranks.map_batches(spread, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(node_bucket, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(reduce_ranks, batch_format="pyarrow")
        )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t.column("node"), "rank_micro": t.column("contrib")}
        )

    return ranks.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
