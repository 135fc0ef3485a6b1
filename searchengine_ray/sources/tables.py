"""Dataset sources (reference analogs: the XML page reader and the
indexed-payload readers, SURVEY.md §2.1 S1/S3 — here both are just
column-pruned Parquet reads; Parquet row-group metadata replaces the
hand-rolled (key,pos,len) side index)."""

from __future__ import annotations

import ray.data as rd


def read_pages(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Common-Crawl-style pages table (BASELINE.json input_hint schema)."""
    return rd.read_parquet(path, columns=columns)


def read_documents(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    """Driver testdata `documents` table
    (doc_id:int64, text:string, lang:string, source:string, n_chars:int64)."""
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def read_embeddings(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    """Driver testdata `embeddings` table (vec_id:int64, embedding:list<float>, label:int32)."""
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=columns)
