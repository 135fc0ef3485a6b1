"""searchengine_ray — a Ray-Data-native full-text index build + BM25 query engine.

A from-scratch rebuild of the *capability* of ZdsAlpha/SearchEngine
(reference at /root/reference: Wikipedia XML -> inverted index -> ranked
keyword queries, see SURVEY.md) re-architected for Ray Data:

- input: Common-Crawl-style Parquet ``pages`` table
  (url:string, warc_ts:timestamp[us], html:binary, text:large_string, lang:string)
- build: ``read_parquet`` -> zero-copy Arrow ``map_batches`` (extract ->
  tokenize -> per-doc tf) -> flat postings -> ONE explicit shuffle
  (``groupby(part)``, doc-bucketed) -> per-partition compressed segments
  (local doc ordinals, delta+varbyte, block-max metadata) + manifests.
- serve: document-partitioned ``IndexShardActor`` pool; per-shard exact
  BM25 top-k (vectorized TAAT or block-max WAND) + coordinator merge.

Partitioning note (skew): partitions are keyed by a hash of doc_id, not
term_hash. This is the "salted repartition of hot posting lists" taken to
its limit: every term's posting list is split across all P partitions in
proportion to its length, so a Zipf head term (df ~ N) can never make one
partition larger than total_postings/P + epsilon. It also makes serving
document-partitioned, which is what allows per-shard top-k pruning
(block-max WAND) to be exact — a term-partitioned layout cannot prune
safely because a doc's score is spread across shards.
"""

__version__ = "0.1.0"
