"""Offline/batched query evaluation as a Ray Data pipeline.

The reference serves one query per HTTP request from static in-RAM arrays
(/root/reference/Engine/Engine/Engine.cs:37-95). The rebuild's batch path
evaluates a whole `queries` Dataset with an ACTOR POOL: each actor loads
the index once in __init__ (stateful stage, SURVEY.md §2.3 T4) and scores
its batches vectorized. Queries are the partitioned axis; the index is the
broadcast state.

Scale note: actors here load all partitions (index << RAM at test scale).
At 10^12 docs an actor pool of `SearchEngine` coordinators scatter-gathers
shard actors instead (state/shards.py); the output schema is identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.runtime import cap_worker_threads, pool_kwargs
from ..functions.tokenize import parse_query_prefix, parse_query_signed
from ..schemas import FIELD_BODY, FIELD_TITLE
from ..state.shards import (
    MAX_EXPAND,
    Lexicon,
    LocalIndex,
    TermStrings,
    make_term_specs,
    make_term_specs_from_counts,
    make_term_specs_scoped,
    parse_scoped_counts,
    with_ref_cutoffs,
)


class QueryEvalActor:
    """map_batches callable class: (query_id, query, k) -> top-k rows."""

    def __init__(
        self,
        index_dir: str,
        mode: str = "bm25",
        fields: tuple[int, ...] = (FIELD_BODY, FIELD_TITLE),
        default_k: int = 10,
        conjunctive: bool = False,
        negation: bool = False,
        prefix: bool = False,
        scoping: bool = False,
    ):
        cap_worker_threads()
        self.index = LocalIndex(index_dir)
        self.lexicon = Lexicon(index_dir)
        self.mode = mode
        self.fields = fields
        self.default_k = default_k
        self.conjunctive = conjunctive
        # negation=True parses `-word` as an exclusion (parse_query_signed);
        # kept opt-in so the default path stays byte-compatible with the
        # reference parser, where '-foo' is the positive word '-foo'
        self.negation = negation
        # prefix=True parses `word*` as a vocabulary prefix expansion (up
        # to MAX_EXPAND terms, ascending — needs the term-strings sidecar)
        self.prefix = prefix
        # scoping=True parses `title:word` / `body:word` as a single-field
        # restriction (make_term_specs_scoped contract: intersect with the
        # served fields; unknown prefixes stay literal tokens)
        self.scoping = scoping
        if prefix:
            self.term_strings = TermStrings(index_dir)
        self._cutoff_cache: dict = {}  # reference-mode truncation memo

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch.column("query_id").to_numpy(zero_copy_only=False)
        queries = batch.column("query").to_pylist()
        ks = (
            batch.column("k").to_numpy(zero_copy_only=False)
            if "k" in batch.column_names
            else np.full(len(qids), self.default_k)
        )
        out_qid: list[int] = []
        out_rank: list[int] = []
        out_doc: list[int] = []
        out_score: list[float] = []
        for qid, query, k in zip(qids, queries, ks):
            exclude = None
            if self.prefix:
                from collections import Counter

                lit, pre = parse_query_prefix(query)
                expanded: Counter[str] = Counter(lit)
                for p, qtf in pre.items():
                    for term in self.term_strings.prefix_terms(p, MAX_EXPAND):
                        expanded[term] += qtf
                specs = make_term_specs_from_counts(
                    expanded, self.lexicon, self.index.n_docs, self.fields, self.mode
                )
            elif self.negation:
                pos, neg = parse_query_signed(query)
                specs = make_term_specs_from_counts(
                    pos, self.lexicon, self.index.n_docs, self.fields, self.mode
                )
                if neg:
                    from collections import Counter

                    exclude = make_term_specs_from_counts(
                        Counter(neg), self.lexicon, self.index.n_docs,
                        self.fields, self.mode,
                    )
            elif self.scoping:
                specs = make_term_specs_scoped(
                    parse_scoped_counts(query), self.lexicon,
                    self.index.n_docs, self.fields, self.mode,
                )
            else:
                specs = make_term_specs(
                    query, self.lexicon, self.index.n_docs, self.fields, self.mode
                )
            if not specs:
                continue
            if self.mode == "reference":
                # global top-1000-postings-by-tf truncation (this actor
                # holds ALL partitions, so its candidates are global)
                specs = with_ref_cutoffs(
                    specs, self.index.tf_doc_candidates, cache=self._cutoff_cache
                )
            docs, scores = self.index.topk(
                specs, int(k), self.mode, conjunctive=self.conjunctive,
                exclude=exclude,
            )
            for r, (d, s) in enumerate(zip(docs, scores), start=1):
                out_qid.append(int(qid))
                out_rank.append(r)
                out_doc.append(int(d))
                out_score.append(float(s))
        return pa.table(
            {
                "query_id": pa.array(out_qid, pa.int64()),
                "rank": pa.array(out_rank, pa.int32()),
                "doc_id": pa.array(out_doc, pa.int64()),
                "score": pa.array(out_score, pa.float64()),
            }
        )


def evaluate_queries(
    queries_ds: rd.Dataset,
    index_dir: str,
    mode: str = "bm25",
    fields: tuple[int, ...] = (FIELD_BODY, FIELD_TITLE),
    concurrency: int = 2,
    batch_size: int = 256,
    conjunctive: bool = False,
    negation: bool = False,
    prefix: bool = False,
    scoping: bool = False,
) -> rd.Dataset:
    return queries_ds.map_batches(
        QueryEvalActor,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "mode": mode,
            "fields": fields,
            "conjunctive": conjunctive,
            "negation": negation,
            "prefix": prefix,
            "scoping": scoping,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        **pool_kwargs(concurrency),
    )
