"""Alias (redirect) handling — reference analog: redirects.bin, built and
sorted by the Repository but never queried by the Engine
(/root/reference/Indexer/Repository/Program.cs:149-152, SURVEY.md §2.4 J3).

Here the capability is exercised: an `aliases` table (alias_id ->
target_id) rewrites doc ids by a BROADCAST semi-join inside map_batches —
the small side is put in the object store once, never shuffled, never
re-shipped per batch. Chains (a -> b -> c) are collapsed on the driver
before broadcast (the aliases table is small by definition; a chain deeper
than ~50 is treated as a cycle and left unresolved)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def collapse_chains(alias_ids: np.ndarray, target_ids: np.ndarray, max_depth: int = 50):
    """Resolve alias chains to final targets. Returns (alias_ids, finals)."""
    m = dict(zip(alias_ids.tolist(), target_ids.tolist()))
    finals = []
    for a in alias_ids.tolist():
        seen = 0
        t = m[a]
        while t in m and seen < max_depth:
            t = m[t]
            seen += 1
        finals.append(a if (t in m and seen >= max_depth) else t)
    return alias_ids, np.array(finals, dtype=np.int64)


def resolve_aliases(ds: rd.Dataset, aliases: pa.Table, column: str = "doc_id") -> rd.Dataset:
    """Rewrite `column` through the alias map (broadcast join, no shuffle)."""
    a = aliases.column("alias_id").to_numpy(zero_copy_only=False).astype(np.int64)
    t = aliases.column("target_id").to_numpy(zero_copy_only=False).astype(np.int64)
    a, t = collapse_chains(a, t)
    order = np.argsort(a, kind="stable")
    ref = ray.put((a[order], t[order]))

    def fn(batch: pa.Table) -> pa.Table:
        keys, vals = ray.get(ref)
        ids = batch.column(column).to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(keys, ids)
        pos = np.clip(pos, 0, len(keys) - 1)
        hit = keys[pos] == ids if len(keys) else np.zeros(len(ids), dtype=bool)
        out = np.where(hit, vals[pos] if len(keys) else ids, ids)
        idx = batch.schema.get_field_index(column)
        return batch.set_column(idx, column, pa.array(out, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
