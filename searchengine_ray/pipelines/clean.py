"""Composed corpus-cleaning pipeline — the canonical pre-training data
shape: language filter -> quality heuristics -> exact dedup (keep-first),
with a per-document verdict and first-failed reason code.

Composition is IN-PIPELINE, not a driver loop: one vectorized map_batches
computes every per-doc signal (reason precedence is deterministic), then a
single coarse-bucket groupby resolves exact-duplicate canonicals among the
surviving docs only (md5 contract shared with pipelines/dedup.py so the
DuckDB oracle recomputes the whole pipeline bit-exactly).

Scale: the only shuffle is the dedup groupby, and it moves one small row
per PASSING doc (doc_id + 32-byte hex + reason), bucketed by the leading
md5 byte — text never crosses the wire. Failed docs short-circuit before
hashing, mirroring what a 100-TB cleaning run must do (hash only what
survives the cheap filters).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.runtime import cap_worker_threads
from ..functions.tokenize import tokenize_flat
from ..sources.tables import read_documents
from .textops import STOPWORDS_FLAT

KEEP_LANG = "en"
MIN_TOKENS = 10
MIN_ALPHA_RATIO = 0.5
MIN_STOPWORD_RATIO = 0.01

_VERDICT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("keep", pa.bool_()),
        ("reason", pa.string()),
    ]
)


def clean_corpus(sf_dir: str) -> rd.Dataset:
    """(doc_id, keep, reason) for every document. reason is the FIRST
    failed check in fixed precedence: 'lang' -> 'short' -> 'alpha' ->
    'stopword' -> 'dup' -> '' (kept). The duplicate canonical is the min
    doc_id among docs that pass every quality check."""

    def verdicts(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int32()),
                    "doc_id": pa.array([], pa.int64()),
                    "reason": pa.array([], pa.string()),
                    "text_md5": pa.array([], pa.string()),
                }
            )
        texts = t.column("text").combine_chunks()
        lang = t.column("lang")
        n = t.num_rows
        parents, tokens = tokenize_flat(texts)
        n_tok = np.bincount(parents, minlength=n).astype(np.float64)
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

        is_lang = pc.equal(lang, KEEP_LANG).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        reasons = np.full(n, "", dtype=object)
        reasons[(n_stop / safe_tok) < MIN_STOPWORD_RATIO] = "stopword"
        reasons[(n_alpha / safe_chars) < MIN_ALPHA_RATIO] = "alpha"
        reasons[n_tok < MIN_TOKENS] = "short"
        reasons[~is_lang] = "lang"  # highest precedence written last

        # hash only the survivors (the expensive step at scale). Passing
        # docs bucket by the leading md5 byte (equal hashes co-locate);
        # failed docs spread by doc_id so no bucket becomes a mega-group
        # even when most of the corpus fails a filter.
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        bucket = (did.view(np.uint64) % np.uint64(256)).astype(np.int32)
        passing = np.flatnonzero(reasons == "")
        fps = np.full(n, "", dtype=object)
        if len(passing):
            sub = texts.take(pa.array(passing)).to_pylist()
            for i, s in zip(passing, sub):
                d = hashlib.md5(s.encode("utf-8")).digest()
                fps[i] = d.hex()
                bucket[i] = d[0]
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int32()),
                "doc_id": t.column("doc_id"),
                "reason": pa.array(reasons, pa.string()),
                "text_md5": pa.array(fps, pa.string()),
            }
        )

    def resolve(group: pa.Table) -> pa.Table:
        # a bucket holds failed rows (final verdicts) AND passing rows
        # (dedup among them); both vectorized
        cap_worker_threads()
        if group.num_rows == 0:
            return _VERDICT_SCHEMA.empty_table()
        reasons = np.asarray(group.column("reason").to_pylist(), dtype=object)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        failed = reasons != ""
        out_ids = [ids[failed]]
        out_keep = [np.zeros(int(failed.sum()), dtype=bool)]
        out_reason = [reasons[failed]]
        passing = np.flatnonzero(~failed)
        if len(passing):
            md5s = group.column("text_md5").take(pa.array(passing))
            pids = ids[passing]
            order = np.lexsort((pids, md5s.to_numpy(zero_copy_only=False)))
            ids_s = pids[order]
            md5_s = md5s.take(pa.array(order))
            new = np.empty(len(ids_s), dtype=bool)
            new[0] = True
            if len(ids_s) > 1:
                neq = pc.not_equal(md5_s.slice(1), md5_s.slice(0, len(ids_s) - 1))
                new[1:] = neq.to_numpy(zero_copy_only=False)
            run_id = np.cumsum(new) - 1
            canonical = ids_s == ids_s[new][run_id]
            out_ids.append(ids_s)
            out_keep.append(canonical)
            out_reason.append(np.where(canonical, "", "dup").astype(object))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_ids), pa.int64()),
                "keep": pa.array(np.concatenate(out_keep), pa.bool_()),
                "reason": pa.array(np.concatenate(out_reason), pa.string()),
            }
        )

    return (
        read_documents(sf_dir, columns=["doc_id", "text", "lang"])
        .map_batches(verdicts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pyarrow")
    )


def prepare_corpus(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_tokens, n_removed, text_clean) for every SURVIVING doc —
    the composed training-data preparation flagship:

      1. clean_corpus      lang / length / alpha / stopword / exact-dup
      2. decontaminate     drop docs sharing a 5-gram with the benchmark
                           subset (benchmark docs themselves are dropped)
      3. strip_dup_spans   remove corpus-duplicated 5-gram spans from the
                           survivors' text (ExactSubstr policy)

    Every stage is the already-oracle-checked op; the composition wires
    them with two native hash joins on doc_id (all sides are corpus-scale
    map_batches outputs, schema-stable). The SQL oracle nests the three
    stage oracles verbatim, so the composition is hash-checked end-to-end
    too. Note the span-strip statistics are computed over the WHOLE corpus
    (the measurement is corpus-global) while only survivors are emitted —
    same contract as running the policy op before filtering."""
    from . import dedup as dedup_ops  # runtime import: avoids module cycle

    kept = clean_corpus(sf_dir).map_batches(
        lambda t: t.filter(t.column("keep")).select(["doc_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    clean_train = dedup_ops.decontaminate(sf_dir).map_batches(
        lambda t: t.filter(
            pc.invert(t.column("contaminated"))
        ).select(["doc_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    stripped = dedup_ops.strip_dup_spans(sf_dir)
    survivors = kept.join(
        clean_train, "inner", num_partitions=16, on=("doc_id",)
    )
    return stripped.join(
        survivors, "inner", num_partitions=16, on=("doc_id",)
    ).map_batches(
        lambda t: t.select(["doc_id", "n_tokens", "n_removed", "text_clean"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
